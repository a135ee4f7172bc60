package graft.queries

import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.QueryDef.oracle
import graft.sources.{JdbcWorkQueue, Tables}

/** S12: the DB-driven work-queue family (`bin/pulfarize.rb:99-106`) made
  * driver-checkable end-to-end: the `nation` table is loaded into an
  * embedded Derby database as an `ImageDirs`-shaped queue (a `note`
  * status column flags unclaimed rows with a single space), then scanned
  * back through Spark's JDBC source with the `note = ' '` predicate
  * pushed down to the database. The oracle replays the same selection on
  * the source parquet — so the check covers the full JDBC round-trip:
  * type mapping, identifier case, predicate pushdown, value fidelity. */
object JdbcQueries {

  val defs: Seq[QueryDef] = Seq(

    oracle(
      "q51_jdbc_workqueue",
      """SELECT n_nationkey, n_name, n_regionkey, ' ' AS note
        |FROM nation WHERE n_regionkey = 2
        |ORDER BY n_nationkey""",
      "SURVEY §2.1 S12: JDBC work-queue scan with pushed status predicate") { (s, d) =>
      val url = JdbcWorkQueue.derbyMemUrl("graft_q51")
      val queue = Tables(s, d, "nation")
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"),
          when(col("n_regionkey") === 2, lit(" ")).otherwise(lit("done")).as("note"))
      JdbcWorkQueue.seed(queue, url, "ImageDirs")
      JdbcWorkQueue.pending(s, url, "ImageDirs", noteCol = "note")
        .orderBy("n_nationkey")
    })
}
