package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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

  /** Per-session RELATION cache (round 15, guide §1.2 driver-side cost):
    * every `spark.read.parquet(path)` resolves the relation anew —
    * file-status listing plus a parquet footer read for schema inference,
    * all single-threaded driver work paid per call. A bench/verify session
    * loads the same ten tables thousands of times (175 queries × reps ×
    * 1–4 tables each), so the resolution is cached per (session, path).
    * This caches the LOGICAL RELATION only — the analyzed plan object —
    * never data or results: every action still scans the parquet files.
    * It is the same reuse a production session gets from a catalog table
    * (resolve once at registration, scan per query).
    *
    * Staleness guard: the cache key carries the path's lastModified stamp,
    * so a test fixture that overwrites its parquet dir between reads gets
    * a fresh relation (WeakHashMap on the session keeps stopped test
    * sessions collectable). */
  private val relCache =
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[(String, Long), DataFrame]]()

  private def cachedRead(spark: SparkSession, path: String)
      (load: => DataFrame): DataFrame = {
    val m = relCache.synchronized {
      var mm = relCache.get(spark)
      if (mm == null) {
        mm = new java.util.concurrent.ConcurrentHashMap[(String, Long), DataFrame]()
        relCache.put(spark, mm)
      }
      mm
    }
    m.computeIfAbsent((path, new java.io.File(path).lastModified()),
      _ => load)
  }

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else {
      val p = s"$sfDir/$name.parquet"
      cachedRead(spark, p)(spark.read.parquet(p))
    }

  /** Scan pre-partitioned by the caller's trailing total-order key
    * (round 15, guide §2.4 "remove shuffles outright"): a scan-rooted
    * per-row chain ending in `orderBy(keys)` pays the chain TWICE — the
    * final range exchange samples its child to compute partition bounds,
    * re-executing every projection below it — and on a single-split
    * local file runs it serially. Range-partitioning the RAW rows by the
    * same keys moves the one unavoidable exchange below the chain
    * (identical row count, narrower rows: raw columns instead of raw +
    * derived), satisfies the trailing sort's OrderedDistribution (the
    * sort keeps no exchange of its own and adds only a per-partition
    * sort), and lets the bound-sampling pass read the bare scan instead
    * of the chain. Result-identical: same rows, same final total order.
    * Measured on the q156 ortho chain (sf0.1, local[32]): wall 8.08 →
    * 0.71, task 5.74 → 0.42 (isolated session; the in-bench effect is
    * ~2× wall / ~2× task — OPTIMIZATION_r15.md). */
  def byOrder(spark: SparkSession, sfDir: String, name: String,
      keys: String*): DataFrame =
    apply(spark, sfDir, name).repartitionByRange(keys.map(col): _*)

  /** `events.ts` has shipped in two physical vintages: parquet
    * TIMESTAMP(NANOS) (which Spark's vectorized reader rejects unless
    * loaded as raw int64 via the legacy conf) and plain TIMESTAMP(MICROS)
    * with isAdjustedToUTC=false (which Spark loads as TIMESTAMP_NTZ).
    * Rather than hard-code one vintage and break on the next data
    * regeneration, switch on the dataType Spark actually loaded and
    * normalize every vintage to a microsecond TimestampType column — the
    * same precision DuckDB's TIMESTAMP (µs) uses, so oracle comparisons
    * stay aligned. The session timezone is pinned to UTC (build.sbt /
    * Verify), making the NTZ wall-clock → instant cast the identity. */
  private[graft] def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => df
      case other => throw new IllegalArgumentException(
        s"events.ts: unsupported physical type $other " +
          "(expected int64 nanos, TIMESTAMP_NTZ, or TIMESTAMP)")
    }

  /** Predicate `ts >= sinceMicros` phrased against the RAW column type so
    * it pushes to the parquet scan (row-group min/max pruning) instead of
    * sitting above the normalization cast, which Catalyst won't invert. */
  private[graft] def tsAtLeast(tsType: DataType, sinceMicros: Long): Column =
    tsType match {
      case LongType         => col("ts") >= lit(sinceMicros * 1000L)
      case TimestampNTZType =>
        // UTC-pinned session: the NTZ wall-clock literal for this instant
        val ldt = java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(sinceMicros, 1000000L),
          (Math.floorMod(sinceMicros, 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC)
        col("ts") >= lit(ldt)
      case TimestampType    => col("ts") >= timestamp_micros(lit(sinceMicros))
      case other => throw new IllegalArgumentException(
        s"events.ts: unsupported physical type $other")
    }

  // A scale-adaptive post-scan `spread` repartition (guide §2.5 "input
  // skew": the test tables are single-row-group parquet, so scan-stage
  // per-row CPU runs serially) lived here for part of round 14 and was
  // REMOVED on its own A/B evidence: with the census work gone native
  // (graft.functions.SubstrCensus) the downstream 32-task stage paid
  // ~0.15 s/task of fixed overhead twice (the trailing total order's
  // range-sampling pass re-executes the projection), i.e. task-seconds
  // 0.7 → 7–12 for a ~0.1 s wall win — a 10× real-CPU regression that
  // would only ever fire on single-split local inputs. At corpus scale
  // scans are already parallel and the exchange would be identity-but-
  // planned; the honest shape is the shuffle-free scan.

  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val p = s"$sfDir/events.parquet"
    normalizeTs(cachedRead(spark, p)(spark.read.parquet(p)))
  }

  /** Incremental events scan: rows at/after `sinceMicros` with the
    * predicate applied to the RAW ts column, BEFORE normalization. A
    * filter above the conversion is not pushable, which at 100 TB means a
    * full scan; filtering the raw column pushes to parquet and prunes row
    * groups by min/max stats. The normalization is monotonic for every
    * vintage, so the two phrasings select identical rows. */
  def eventsSince(spark: SparkSession, sfDir: String, sinceMicros: Long): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val p = s"$sfDir/events.parquet"
    val raw = cachedRead(spark, p)(spark.read.parquet(p))
    normalizeTs(raw.filter(tsAtLeast(raw.schema("ts").dataType, sinceMicros)))
  }
}
