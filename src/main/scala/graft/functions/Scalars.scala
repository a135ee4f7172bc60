package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar / aggregate helpers shared by every operator.
  *
  * Two design rules, both driven by the DuckDB-oracle differential gate
  * (SURVEY.md §5.1):
  *
  *  1. **Exact money math.** Double-typed measures are summed through
  *     `DECIMAL(38,6)` and cast back to double. Decimal addition is exact and
  *     associative, so the result is bit-identical no matter how Spark
  *     partitions the aggregation — and bit-identical to DuckDB computing
  *     `CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE)`. A raw double sum
  *     would differ in the low bits per partitioning. (The reference is
  *     stringly-typed and has no such guarantee at all —
  *     `bin/main.py:63-69`.)
  *
  *  2. **Cross-engine deterministic hashing.** `h60` maps a string to a
  *     non-negative int64 by taking the first 15 hex digits (60 bits) of its
  *     MD5. Both Spark (`conv(substring(md5(s),1,15),16,10)`) and DuckDB
  *     (`('0x' || substr(md5(s),1,15))::BIGINT`) compute the identical
  *     value, which lets minhash / LSH / fingerprint operators be
  *     oracle-checked instead of merely row-counted. Mirrors the
  *     reference's use of content hashing for identity (SHA-1 at
  *     `bin/dao.py:12-17`; MD5 here because DuckDB 1.0 lacks sha1).
  */
object Scalars {

  val Money: DecimalType = DecimalType(38, 6)

  /** Exact, partitioning-independent sum of a double column (see above). */
  def decSum(c: Column): Column = sum(c.cast(Money)).cast(DoubleType)

  /** Exact average: exact decimal sum divided (in double) by the count. */
  def decAvg(c: Column): Column = decSum(c) / count(c)

  /** DuckDB SQL fragment equivalent to [[decSum]]. */
  def decSumSql(x: String): String =
    s"CAST(SUM(CAST($x AS DECIMAL(38,6))) AS DOUBLE)"

  /** DuckDB SQL fragment equivalent to [[decAvg]]. */
  def decAvgSql(x: String): String = s"${decSumSql(x)} / COUNT($x)"

  /** 60-bit deterministic string hash, identical in Spark and DuckDB. */
  def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** DuckDB SQL fragment equivalent to [[h60]]. */
  def h60Sql(x: String): String = s"('0x' || substr(md5($x), 1, 15))::BIGINT"

  /** Driver-side JVM implementation of the same hash — for deriving plan
    * constants (e.g. MinHash coefficients) that must agree with what the
    * SQL expression and the DuckDB oracle compute. */
  def h60Jvm(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16)
  }

  /** Seeded variant: h60(seed || ':' || s); one hash family per seed. */
  def h60Seeded(seed: Column, c: Column): Column =
    h60(concat(seed.cast(StringType), lit(":"), c))

  def h60SeededSql(seed: String, x: String): String =
    h60Sql(s"$seed::VARCHAR || ':' || $x")

  /** Timestamp → `yyyy-MM-dd HH:mm:ss` string. Formatting to seconds is the
    * oracle-safe way to emit timestamps: it sidesteps parquet ns/us
    * physical-type differences between the engines (events.ts is
    * timestamp[ns]; Spark truncates to micros). */
  def fmtTs(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** DuckDB SQL fragment equivalent to [[fmtTs]]. */
  def fmtTsSql(x: String): String = s"strftime($x, '%Y-%m-%d %H:%M:%S')"

  /** Whitespace-normalize: strip + collapse runs to one space.
    * Reference: `clean_up_white_space`, `bin/main.py:40-43` (F12). */
  def normWs(c: Column): Column = trim(regexp_replace(c, "\\s+", " "))

  def normWsSql(x: String): String =
    s"trim(regexp_replace($x, '\\s+', ' ', 'g'))"

  /** Zero-padded 8-digit page name. Reference: `zfill(8)` / `%08d`
    * (`bin/main.py:281`, `bin/pulfarize.rb:73`, `bin/dirtopdf.sh:98`; F19). */
  def pageName(c: Column): Column = format_string("%08d", c)

  def pageNameSql(x: String): String = s"printf('%08d', $x)"

  /** All-rows-constant but NON-FOLDABLE window partition key. A handful of
    * windows run deliberately on a BOUNDED row set (a k-row sample, ≤11
    * histogram deciles, 4 funnel tiers) where a global window is correct by
    * construction — but an empty `partitionBy` makes WindowExec log its
    * single-partition WARN on every execution, polluting the bench stdout
    * the driver machine-parses (round-7 verdict items 2–3). A bare
    * `lit(0)` doesn't work: Catalyst's `EliminateWindowPartitions` strips
    * foldable partition expressions and the WARN returns; `xxhash64(c)*0`
    * doesn't either — Spark 4.1's arithmetic simplification rewrites
    * multiply-by-zero-literal and the spec empties the same way (probed
    * empirically: of {x*0, pmod(x,1), x&0, x div MaxLong, x%1} only x*0
    * collapses). `xxhash64(c) & 0` is 0 for every row (xxhash64 never
    * returns null) yet survives optimization, and the `ScaleSpec`
    * no-empty-partition-spec pin guards it staying that way across Spark
    * upgrades. Planner cost: the window's
    * requirement becomes `ClusteredDistribution` instead of `AllTuples` —
    * satisfied for free by an already-single-partition child (q128's
    * TakeOrderedAndProject), and elsewhere a hash exchange over the same
    * bounded rows the old SinglePartition exchange moved. */
  def constPartitionKey(c: Column): Column = xxhash64(c).bitwiseAND(lit(0L))
}
