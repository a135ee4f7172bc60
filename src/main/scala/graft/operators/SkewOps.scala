package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-management primitives for 100 TB joins/aggregations.
  *
  * First line of defense is AQE (`spark.sql.adaptive.skewJoin.enabled`,
  * on by default): it splits oversized shuffle partitions at runtime.
  * Salting is the explicit fallback for pathological keys AQE can't fix —
  * e.g., an LSH bucket holding a constant-content crawl cluster, or the
  * empty-shingle sentinel bucket.
  */
object SkewOps {

  /** Salted equi-join of a skewed `big` side against a smaller `dim`
    * side: big rows get a deterministic salt in [0, salts) derived from a
    * stable row expression, dim rows are replicated once per salt, and
    * the join keys on (key, salt) — spreading a hot key over `salts`
    * shuffle partitions. Semantics identical to `big.join(dim, key)`.
    *
    * `saltExpr` must be deterministic per row (e.g. a hash of a unique
    * column) — never rand(), which breaks retry/replay semantics. */
  def saltedJoin(big: DataFrame, dim: DataFrame, key: String,
      saltExpr: String, salts: Int = 8): DataFrame = {
    val salted = big.withColumn("_salt",
      expr(s"pmod(hash($saltExpr), $salts)"))
    val replicated = dim.withColumn("_salt",
      explode(expr(s"sequence(0, ${salts - 1})")))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-level aggregation for skewed group keys: partial aggregate on
    * (key, salt), then merge per key. Use for algebraic aggregates
    * (sum/count/min/max) when one key dominates the shuffle.
    * `aggs` maps output column name → (partial SQL over input, merge SQL
    * over the partial column). */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
      saltExpr: String, salts: Int = 8): DataFrame =
    df.withColumn("_salt", expr(s"pmod(hash($saltExpr), $salts)"))
      .groupBy(col(key), col("_salt"))
      .agg(sum(col(valueCol)).as("_s"), count(lit(1)).as("_c"))
      .groupBy(col(key))
      .agg(sum(col("_s")).as(s"sum_$valueCol"), sum(col("_c")).as("n"))
}
