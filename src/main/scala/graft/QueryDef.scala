package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-visible query: a Spark implementation plus (where the
  * semantics are ANSI-SQL-expressible) a DuckDB oracle equivalent.
  *
  * Contract (builder prompt + SURVEY.md §5.1):
  *   - `fn(spark, sfDir)` reads only the driver parquet tables under sfDir;
  *   - result column names match the oracle's aliases exactly;
  *   - result ends in a deterministic total `orderBy` mirrored by the
  *     oracle's `ORDER BY`;
  *   - doubles/longs are produced through cross-engine-exact expressions
  *     (see [[graft.functions.Scalars]]).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

object QueryDef {
  def oracle(name: String, sql: String, doc: String = "")(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(sql.stripMargin.trim), doc)

  def rowsOnly(name: String, doc: String = "")(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None, doc)
}
