package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * One parquet file per table under `sfDir`. At cluster scale these would be
  * partitioned directories; the API is path-shaped so nothing changes when
  * they are. Mirrors the reference's checkpoint-table slurp
  * (`bin/main.py:71-97`, S3) with declared-schema parquet instead of
  * `%%`-delimited text.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects outright. Read it as raw nanos (legacy conf) and
    * convert to a microsecond TimestampType column — the same truncation
    * DuckDB's TIMESTAMP (µs) applies, so oracle comparisons stay aligned.
    * The session timezone is pinned to UTC (build.sbt / Verify), making
    * instant → wall-clock conversion the identity. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Incremental events scan: rows at/after `sinceMicros` with the
    * predicate applied to the RAW nanos column, BEFORE the
    * timestamp_micros conversion. A filter above the conversion is not
    * pushable (Catalyst won't invert the arithmetic), which at 100 TB
    * means a full scan; filtering the raw column pushes to parquet and
    * prunes row groups by min/max stats. The conversion is monotonic, so
    * the two phrasings select identical rows. */
  def eventsSince(spark: SparkSession, sfDir: String, sinceMicros: Long): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    spark.read.parquet(s"$sfDir/events.parquet")
      .filter(col("ts") >= lit(sinceMicros * 1000L))
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
