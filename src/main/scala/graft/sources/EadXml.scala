package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
