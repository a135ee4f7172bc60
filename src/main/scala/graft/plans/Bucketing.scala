package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (pre-partitioned) tables: the co-located-join scale strategy.
  *
  * At 100 TB the dominant cost of a fact-fact join (e.g. orders ⋈
  * lineitem) is shuffling both sides on the key. Writing both tables
  * bucketed by that key with the same bucket count makes the join
  * shuffle-FREE forever after: each task reads matching buckets from both
  * sides (Spark plans SortMergeJoin with no Exchange). The write pays the
  * shuffle once; every downstream join/aggregation on the key rides it.
  *
  * The reference's analog is its canonical directory layout keyed by call
  * number/component (`bin/pulfarize.rb:27-78`) — data placed by key once,
  * consumed by key forever.
  */
object Bucketing {

  /** Save `df` as a bucketed managed table (sorted within buckets for
    * merge-join readiness). Drops any prior table AND its leftover
    * warehouse location — a location orphaned by a previous session makes
    * saveAsTable fail with LOCATION_ALREADY_EXISTS even under overwrite. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int = 8): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket key. With equal bucket
    * counts the plan contains no Exchange on either side. */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** True iff the physical plan contains a shuffle exchange — the spec
    * asserts this is false for bucketed joins and true for plain ones.
    * String-based because AQE's AdaptiveSparkPlanExec hides its inner
    * plan from TreeNode traversal until execution. */
  def hasShuffle(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
