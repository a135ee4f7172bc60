package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** EAD/METS XML as DataFrames via Spark 4's native XML source
  * (SURVEY §2.1 S1/S2, §2.1 S16).
  *
  * The reference parses EAD with libxml2 + XPath (`bin/main.py:122-140`)
  * and surgically rewrites attributes in place (`bin/main.py:498-532`).
  * Here a document is exploded into a components TABLE (one row per
  * component, dao attributes as columns), transformations are ordinary
  * relational ops, and "writeback" is a join + document re-serialization
  * (`.write.format("xml")`) — SURVEY §7.3's explode-with-position +
  * reconstruct strategy.
  *
  * Attribute columns carry the source's `_` prefix (Spark's
  * attributePrefix default); namespaced attributes like `xlink:href`
  * surface as `_xlink:href`.
  */
object EadXml {

  /** One row per `rowTag` element (default: EAD component `c`). */
  def read(spark: SparkSession, path: String, rowTag: String = "c"): DataFrame =
    spark.read.format("xml")
      .option("rowTag", rowTag)
      .load(path)

  /** Serialize rows back to a single XML document tree. */
  def write(df: DataFrame, path: String, rowTag: String = "c",
      rootTag: String = "ead"): Unit =
    df.coalesce(1).write.mode("overwrite").format("xml")
      .option("rowTag", rowTag)
      .option("rootTag", rootTag)
      .save(path)

  /** Recursive EAD components table: real EADs nest `<c>` inside `<c>`
    * arbitrarily deep, and the reference captures each dao's HOST
    * component as `pdf_dao.parent.parent.prop('id')` (`bin/main.py:168`)
    * and targets writeback at `//ead:c[@id=sub]/ead:did`
    * (`bin/publish.rb:126-128`) — i.e. every row needs its ancestor
    * context carried down through the nesting.
    *
    * Read the `<dsc>` container (so top-level `<c>` siblings arrive as
    * one array with deterministic positions), then flatten level by
    * level: each level posexplodes the previous level's `c` children,
    * carrying `parent_id`, the full `ancestry` id path, `depth`, and the
    * 1-based sibling `pos`. The loop is driven by the SCHEMA (descend
    * while the struct still has a nested `c` field) — no driver-side
    * data action per level, and inference bounds the depth at the
    * deepest document in the corpus. Each level is one narrow
    * projection; the union is linear in depth, not in rows.
    *
    * Output: id, parent_id, ancestry (slash-joined ancestor ids,
    * root-first), depth, pos, title (did/unittitle), dao_href, dao_show
    * (null where the did has no dao — the F1 filter runs downstream).
    */
  def componentsTree(spark: SparkSession, path: String): DataFrame = {
    val dsc = read(spark, path, rowTag = "dsc")
    var frontier = dsc
      .select(posexplode(asArray(col("c"), dsc.schema("c").dataType)).as(Seq("p", "c")))
      .select(col("c"), (col("p") + 1).cast("long").as("pos"),
        lit(null).cast("string").as("parent_id"),
        lit(null).cast("string").as("ancestry"),
        lit(0L).as("depth"))
    var levels = Vector.empty[DataFrame]
    var descend = true
    while (descend) {
      val cType = frontier.schema("c").dataType.asInstanceOf[StructType]
      levels = levels :+ frontier.select(
        getOpt(col("c"), cType, Seq("_id")).as("id"),
        col("parent_id"), col("ancestry"), col("depth"), col("pos"),
        getOpt(col("c"), cType, Seq("did", "unittitle")).as("title"),
        getOpt(col("c"), cType, Seq("did", "dao", "_xlink:href")).as("dao_href"),
        getOpt(col("c"), cType, Seq("did", "dao", "_xlink:show")).as("dao_show"))
      if (cType.fieldNames.contains("c")) {
        val selfId = getOpt(col("c"), cType, Seq("_id"))
        frontier = frontier
          .select(
            selfId.as("next_parent"),
            when(col("ancestry").isNull, selfId)
              .otherwise(concat_ws("/", col("ancestry"), selfId)).as("next_ancestry"),
            (col("depth") + 1L).as("next_depth"),
            posexplode(asArray(col("c").getField("c"), cType("c").dataType))
              .as(Seq("p", "c")))
          .select(col("c"), (col("p") + 1).cast("long").as("pos"),
            col("next_parent").as("parent_id"),
            col("next_ancestry").as("ancestry"),
            col("next_depth").as("depth"))
          // childless components surface a NULL child struct when the
          // schema's `c` field is a bare struct (single-child corpus)
          .filter(col("c").isNotNull)
      } else descend = false
    }
    levels.reduce(_ unionByName _)
  }

  /** `<c>` children arrive as array<struct> when a document has several
    * and bare struct when every document has one — normalize to array. */
  private def asArray(c: Column, dt: DataType): Column = dt match {
    case _: ArrayType => c
    case _ => array(c)
  }

  /** Nested struct field access that degrades to NULL when the field is
    * absent from the inferred schema (e.g. no component at this depth
    * carries a dao anywhere in the corpus). */
  private def getOpt(c: Column, t: StructType, path: Seq[String]): Column = {
    var cur: DataType = t
    var out = c
    for (f <- path) cur match {
      case st: StructType if st.fieldNames.contains(f) =>
        out = out.getField(f)
        cur = st(f).dataType
      case _ => return lit(null).cast("string")
    }
    out.cast("string")
  }

  /** The F1 dao-candidate predicate (`bin/main.py:133-140`) over a
    * components table with columns (id, href, show, role): keep PDF
    * links, exclude accessions, exclude suppressed and already-harvested
    * entries. */
  def daoCandidates(components: DataFrame, href: String = "href",
      show: String = "show", role: String = "role"): DataFrame =
    components.filter(
      col(href).contains(".pdf")
        && !col(href).contains("/Accessions/")
        && (col(show).isNull || col(show) =!= "none")
        && (col(role).isNull || col(role) =!= "http://www.loc.gov/METS/"))
}
