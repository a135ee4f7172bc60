package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, reproducible sampling for training-data pipelines.
  *
  * `df.sample()` is the wrong tool at 100 TB: it is seeded per-RDD so
  * membership changes when partitioning changes, and it cannot give a
  * per-stratum rate. Hash-gate sampling fixes both: a row is kept iff
  * `h60(salt:key) mod 10⁶ < rate·10⁶` — membership is a pure function of
  * the row key and the salt, so it is stable across runs, partitionings,
  * engines (the DuckDB oracle replays it bit-for-bit), and INCREMENTAL
  * re-runs (a doc sampled today stays sampled after the corpus grows —
  * the F7 idempotence semantic applied to sampling). Per-row, no
  * shuffle, codegen'd.
  */
object SampleOps {

  /** Keep each row iff its key hash-gates below the stratum's rate.
    * `rates` maps stratum values to [0,1] rates; everything else gets
    * `defaultRate`. Rates quantize to millionths (exact integer compare
    * — no float boundary drift between engines). */
  def stratifiedSample(df: DataFrame, strataCol: String,
      rates: Map[String, Double], defaultRate: Double,
      keyCol: String, salt: String = "smp"): DataFrame = {
    def ppm(r: Double): Long = {
      require(r >= 0.0 && r <= 1.0, s"rate must be in [0,1], got $r")
      math.round(r * 1e6)
    }
    val gate: Column = rates.foldLeft(lit(ppm(defaultRate))) {
      case (acc, (stratum, r)) =>
        when(col(strataCol) === stratum, lit(ppm(r))).otherwise(acc)
    }
    // Column API end to end — splicing salt/keyCol into a SQL string
    // would break (or silently alter the hashed expression) on quotes
    // or non-identifier column names (reviewed round 3)
    val h = graft.functions.Scalars.h60(
      concat(lit(s"$salt:"), col(keyCol).cast("string")))
    df.filter((h % 1000000L) < gate)
  }

  /** Per-source quota cap — the data-MIXING half of sampling: each
    * source contributes at most `quota` documents, chosen by hash rank
    * rather than arrival order, so the selection is a deterministic
    * pure function of (source, key) — stable across runs, partitionings,
    * and corpus growth in every source that is already at quota (a new
    * doc can displace the highest-ranked member only within its own
    * source). The mixing-weights table of a training run is exactly a
    * per-source quota/rate vector; this is the quota form, with
    * [[stratifiedSample]] the rate form.
    *
    * Shape at 100 TB: one window partitioned by source (high fan-out
    * strata assumed; a single mega-source is the skew case — pre-gate it
    * with [[stratifiedSample]] to bound the window's input).
    *
    * CONTRACT: `keyCol` must be a UNIQUE, NON-NULL key (it is a key).
    * Under that contract ties cannot happen — the hash is salted with
    * the key and the key itself is the final tiebreak. NULL keys would
    * hash to NULL, tie with each other, and order differently across
    * engines (Spark NULLS FIRST vs DuckDB NULLS LAST) — exactly the
    * nondeterminism this operator exists to prevent. */
  def sourceQuota(df: DataFrame, sourceCol: String, keyCol: String,
      quota: Long, salt: String = "mix"): DataFrame = {
    require(quota >= 0L, s"quota must be >= 0, got $quota")
    val h = graft.functions.Scalars.h60(
      concat(lit(s"$salt:"), col(keyCol).cast("string")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol)).orderBy(h.asc, col(keyCol).asc)
    df.withColumn("mix_rank", row_number().over(w).cast("long"))
      .filter(col("mix_rank") <= quota)
  }

  /** Temperature-scaled source mixing weights — the standard LLM
    * data-mixing reweighting (multinomial sampling with temperature,
    * the α-scaling of Conneau & Lample, "Cross-lingual Language Model
    * Pretraining", 2019 §3.1, used by every multi-source pretraining
    * recipe since): `w_s ∝ share_s^α` normalized over sources, which
    * up-weights minority sources relative to their natural share.
    * One row per source: `n_docs, share, weight, boost` (boost =
    * weight / share, the factor to apply to a source's natural
    * sampling rate).
    *
    * α is FIXED at 0.5 — not a parameter — because `sqrt` is the one
    * power IEEE 754 requires correctly rounded, so both engines produce
    * the identical double; `pow(x, 0.5)` or any other α is
    * library-dependent in the last ulp and would break the bit-exact
    * oracle. (If a deployment needs another α, the operator is the
    * template; the oracle then becomes tolerance-based.)
    *
    * Cross-engine determinism: the normalization denominator is a sum
    * of doubles — order-dependent — so it folds SEQUENTIALLY over the
    * source list sorted by source name (one tiny array row, the packed
    * discipline of [[graft.operators.ClusterOps]]); the DuckDB oracle
    * replays the same ordered `list_reduce`.
    *
    * Shape at 100 TB: one partial-agg count per source (|sources| keys,
    * map-side collapse), then everything happens on |sources| rows in
    * one packed array — nothing downstream grows with the corpus. */
  def temperatureMixWeights(documents: DataFrame,
      sourceCol: String = "source"): DataFrame =
    tempWeights(documents.groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs")))

  /** The α=0.5 weight computation over any per-source count table
    * `(source, n_docs)` — shared by [[temperatureMixWeights]] (doc
    * counts) and [[dataRecipe]] (token counts). */
  private def tempWeights(counts: DataFrame): DataFrame = {
    val packed = counts
      .agg(sort_array(collect_list(struct(col("source"), col("n_docs"))))
        .as("ss"))
    packed
      .withColumn("total", expr("aggregate(ss, 0L, (a, x) -> a + x.n_docs)"))
      .withColumn("denom", expr(
        """aggregate(ss, CAST(0.0 AS DOUBLE),
          |  (a, x) -> a + sqrt(CAST(x.n_docs AS DOUBLE) / CAST(total AS DOUBLE)))""".stripMargin))
      .select(explode(col("ss")).as("s"), col("total"), col("denom"))
      .select(col("s.source").as("source"), col("s.n_docs").as("n_docs"),
        expr("CAST(s.n_docs AS DOUBLE) / CAST(total AS DOUBLE)").as("share"),
        expr("sqrt(CAST(s.n_docs AS DOUBLE) / CAST(total AS DOUBLE)) / denom")
          .as("weight"))
      .withColumn("boost", expr("weight / share"))
  }

  /** The data-recipe table every multi-source pretraining run pins down
    * before training: per source, its TOKEN count, its temperature
    * weight ([[temperatureMixWeights]]'s α=0.5 formula over token
    * shares rather than doc counts — tokens are what the budget buys),
    * the planned token allocation `floor(budget · weight)`, and
    * `epochs_ppm = (planned · 1e6) div n_tokens` — how many times the
    * source repeats to fill its allocation (above 1e6 ⇒ the source is
    * over-sampled/repeated, the signal to cap or collect more data).
    *
    * Cross-engine determinism: the weight is the q79 bit-exact sqrt
    * formula; `floor(double)` of the identical product is identical;
    * everything after is BIGINT arithmetic.
    *
    * Shape at 100 TB: one explode + per-source partial-agg token count
    * (|sources| keys), then |sources|-row arithmetic in one packed
    * array — the q79 shape over token counts. */
  def dataRecipe(documents: DataFrame, budget: Long): DataFrame = {
    require(budget >= 0L, s"budget must be >= 0, got $budget")
    val tokCounts = TextOps.tokenized(documents)
      .select(col("source"), explode(col("tk")).as("t"))
      .groupBy("source").agg(count(lit(1)).as("n_docs"))
    tempWeights(tokCounts)
      .select(col("source"), col("n_docs").as("n_tokens"), col("weight"),
        expr(s"CAST(floor(CAST($budget AS DOUBLE) * weight) AS BIGINT)")
          .as("planned_tokens"))
      .withColumn("epochs_ppm", expr("(planned_tokens * 1000000L) div n_tokens"))
  }

  /** Fixed-SIZE uniform sample via bottom-k hashing: rank every row by a
    * seeded content-free hash of its key and keep the k smallest — the
    * distributed, deterministic replacement for reservoir sampling
    * (Cohen & Kaplan, "Summarizing data using bottom-k sketches", PODC
    * 2007). [[stratifiedSample]] fixes a RATE; eval-set construction and
    * debugging fix a COUNT, which a rate can't promise. The hash order
    * also makes the sample NESTED: the bottom-1000 is a superset of the
    * bottom-100 under the same seed, so growing an eval set never
    * invalidates a smaller published one, and two corpora's bottom-k
    * sets support unbiased Jaccard estimation between them.
    *
    * Output: the k sampled rows as `(doc_id, sample_rank)`, rank 1-based
    * in hash order (ties by doc_id — exact across engines).
    *
    * Shape at 100 TB: the ranked limit plans as TakeOrderedAndProject —
    * a per-partition k-heap plus ONE k-row merge on the driver; the
    * corpus is never globally sorted and never shuffled. The final
    * rank window runs on k rows in a single partition. */
  def bottomKSample(df: DataFrame, keyCol: String, k: Int,
      seed: String = "rsv"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    // constPartitionKey: the rank window runs on the k post-limit rows —
    // already a single partition (TakeOrderedAndProject), so this adds no
    // exchange; it only keeps WindowExec's single-partition WARN out of
    // the bench stdout (see Scalars.constPartitionKey).
    val w = Window
      .partitionBy(graft.functions.Scalars.constPartitionKey(col(keyCol)))
      .orderBy(col("h").asc, col(keyCol).asc)
    df.select(col(keyCol),
        graft.functions.Scalars.h60Seeded(lit(seed), col(keyCol).cast("string"))
          .as("h"))
      .orderBy(col("h").asc, col(keyCol).asc)
      .limit(k)
      .withColumn("sample_rank", row_number().over(w).cast("long"))
      .select(col(keyCol), col("sample_rank"))
  }
}
