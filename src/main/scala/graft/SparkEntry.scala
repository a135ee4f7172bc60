package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are registered by module ([[queries.CoreQueries]],
  * [[queries.StreamingQueries]], …); each carries its own DuckDB oracle SQL
  * where the semantics are ANSI-expressible.
  */
object SparkEntry {

  private def modules: Seq[QueryDef] =
    CoreQueries.defs ++ StreamingQueries.defs ++ NorthStarQueries.defs ++
      DocQueries.defs ++ JdbcQueries.defs ++ ClusterQueries.defs ++
      CorpusQueries.defs ++ RefineQueries.defs ++ DatasheetQueries.defs

  /** Flagship on /root/testdata/sf0.001; driver smoke-checks rows > 0.
    *
    * The harvest-candidate-selection spine (SURVEY §3.1 stage 2) restated:
    * scan → compound predicate filter (F1) → broadcast title join (J1) →
    * per-group sibling index (A2/W3) → deterministic order.
    */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val o = spark.read.parquet(s"$d/orders.parquet")
    val c = spark.read.parquet(s"$d/customer.parquet")
    val n = spark.read.parquet(s"$d/nation.parquet")
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    o.filter(col("o_orderpriority").contains("-")
        && !col("o_orderpriority").contains("NOT")
        && col("o_totalprice") > 5000.0)
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .select(col("o_orderkey"), col("o_custkey"),
        concat_ws(", ", col("c_name"), col("n_name")).as("title"),
        (row_number().over(w).cast("long") - 1).as("pdf_idx"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
