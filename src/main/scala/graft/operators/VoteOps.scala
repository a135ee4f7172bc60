package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The orientation vote (`bin/orient_image.sh:30-80`) as a generic
  * two-stage top-k → argmin operator — the reference's most analytic
  * query (SURVEY §2.5 A4/A5/T1/T2): per group, prune to the k candidates
  * with the best cheap score, then pick the argmin of a costlier score.
  *
  * Both stages are window functions over the group key: at scale this is
  * one shuffle on the (high-cardinality) group key, and Spark 4 plans
  * rank-filters as WindowGroupLimit — the per-group limit is applied
  * map-side before the shuffle, so the exchange carries ≤ k rows per
  * group, not the whole fan-out.
  */
object VoteOps {

  /** candidates: one row per (group, candidate) with both score columns
    * populated. Returns one winner row per group. Ties break by
    * `candCol` ascending — deterministic total order. */
  def vote(candidates: DataFrame, groupCol: String, candCol: String,
      cheapScore: String, costlyScore: String, k: Int = 2): DataFrame = {
    val w1 = Window.partitionBy(groupCol).orderBy(col(cheapScore).asc, col(candCol).asc)
    val w2 = Window.partitionBy(groupCol).orderBy(col(costlyScore).asc, col(candCol).asc)
    candidates
      .withColumn("cheap_rank", row_number().over(w1))
      .filter(col("cheap_rank") <= k)
      .withColumn("final_rank", row_number().over(w2))
      .filter(col("final_rank") === 1)
      .drop("cheap_rank", "final_rank")
  }

  /** Rotation fan-out (A4 shape): explode each item into the four
    * orientation candidates — `explode(array(0, 90, 180, 270))`. */
  def rotationCandidates(items: DataFrame): DataFrame =
    items.withColumn("rotation", explode(expr("array(0, 90, 180, 270)")))
}
