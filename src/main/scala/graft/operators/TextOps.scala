package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * tokenization, shingling, language-ID heuristic, quality scoring,
  * document fingerprinting.
  *
  * All expressions are Catalyst built-ins / higher-order functions (no
  * UDFs): they stay inside whole-stage codegen and are embarrassingly
  * parallel — per-document narrow transforms, no shuffle, so they scale
  * linearly with input splits at 100 TB.
  *
  * The HOF-heavy expressions are written as Spark SQL expression strings
  * (still the DataFrame API via `expr`) so each has a structurally
  * identical DuckDB oracle; the deterministic-hash discipline comes from
  * [[graft.functions.Scalars]] (md5-based h60).
  */
object TextOps {

  /** Spark SQL fragment: 60-bit md5 hash of expression `x` (Scalars.h60). */
  def h60x(x: String): String =
    s"CAST(CONV(SUBSTRING(MD5($x), 1, 15), 16, 10) AS BIGINT)"

  /** DuckDB fragment equivalent to [[h60x]]. */
  def h60d(x: String): String = s"('0x' || substr(md5($x), 1, 15))::BIGINT"

  /** documents + `tk` (token array). Whitespace tokenization — the
    * reference's texts are single-space separated. */
  def tokenized(documents: DataFrame): DataFrame =
    documents.withColumn("tk", split(col("text"), " "))

  /** documents + `sh`: the DISTINCT n-gram shingle set as an array column,
    * built by the native [[graft.functions.NgramShingles]] expression —
    * per-row, codegen'd, shuffle-free (see its scaladoc for why both
    * built-in formulations lose: interpreted HOF lambdas vs a corpus-wide
    * window shuffle). Docs with < n tokens get an empty array. */
  def shingled(documents: DataFrame, n: Int = 3): DataFrame = {
    graft.functions.NgramShingles.register(documents.sparkSession)
    tokenized(documents)
      .withColumn("sh", expr(s"array_distinct(ngram_shingles(tk, $n))"))
      .drop("tk")
  }

  /** One row per DISTINCT (doc_id, shingle): a plain explode of
    * [[shingled]] — distinctness is already local (array_distinct), so
    * this adds no shuffle. */
  def shingleRows(documents: DataFrame, n: Int = 3): DataFrame =
    shingled(documents, n)
      .select(col("doc_id"), explode(col("sh")).as("g"))

  /** Per-token-set language scores + argmax guess. Heuristic stopword
    * vote (the vocabulary here is synthetic, so the en-profile dominates;
    * the operator shape is what matters: per-doc set-membership counts +
    * deterministic CASE argmax, no shuffle). */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and"),
    "es" -> Seq("el", "la", "de", "los"),
    "de" -> Seq("der", "die", "und", "das"))

  def langScored(documents: DataFrame): DataFrame = {
    val scored = langProfiles.foldLeft(tokenized(documents)) {
      case (df, (lang, words)) =>
        df.withColumn(s"s_$lang", expr(
          s"CAST(size(filter(tk, t -> array_contains(array(${words.map(w => s"'$w'").mkString(",")}), t))) AS BIGINT)"))
    }
    scored.withColumn("lang_guess", expr(
      """CASE WHEN s_en >= s_es AND s_en >= s_de THEN 'en'
        |     WHEN s_es >= s_de THEN 'es' ELSE 'de' END""".stripMargin))
  }

  /** Quality score in [0,1]: type-token ratio, stopword penalty, mean
    * token length — the length/punct/stopword-ratio family of heuristics.
    * Fixed evaluation order so the doubles match the oracle bit-for-bit. */
  def qualityScored(documents: DataFrame): DataFrame =
    tokenized(documents)
      .withColumn("n_tokens", expr("CAST(size(tk) AS BIGINT)"))
      .withColumn("n_distinct", expr("CAST(size(array_distinct(tk)) AS BIGINT)"))
      .withColumn("n_stop", expr(
        "CAST(size(filter(tk, t -> array_contains(array('the','a','of','and'), t))) AS BIGINT)"))
      .withColumn("sum_len", expr(
        "aggregate(tk, 0L, (acc, t) -> acc + CAST(length(t) AS BIGINT))"))
      .withColumn("ttr", expr("CAST(n_distinct AS DOUBLE) / n_tokens"))
      .withColumn("stop_ratio", expr("CAST(n_stop AS DOUBLE) / n_tokens"))
      .withColumn("mean_len", expr("CAST(sum_len AS DOUBLE) / n_tokens"))
      .withColumn("quality", expr(
        "0.5 * ttr + 0.3 * (1.0 - stop_ratio) + 0.2 * least(mean_len / 8.0, 1.0)"))

  /** Per-stratum length-window filter: keep documents whose `n_chars`
    * lies within the [pLo, pHi] exact interpolated percentiles of their
    * stratum — the outlier trim every corpus pipeline runs (truncated
    * fragments at the bottom, concatenation blobs at the top), with
    * cutoffs that adapt per language instead of one global constant.
    *
    * Shape at 100 TB: the cutoffs are one tiny per-stratum aggregate
    * (as many rows as strata) BROADCAST back over the corpus — the
    * corpus itself never shuffles; the filter is a per-row comparison.
    * (`percentile` is a full-sort-per-group aggregate on the agg side;
    * for extreme cardinality swap in `percentile_approx` — cutoffs, not
    * memberships, change.) */
  def lengthWindowFilter(documents: DataFrame, strataCol: String = "lang",
      pLo: Double = 0.05, pHi: Double = 0.95): DataFrame = {
    val cuts = documents.groupBy(strataCol)
      .agg(expr(s"percentile(n_chars, ${pLo}D)").as("len_lo"),
        expr(s"percentile(n_chars, ${pHi}D)").as("len_hi"))
    documents.join(broadcast(cuts), Seq(strataCol))
      .filter(col("n_chars") >= col("len_lo") && col("n_chars") <= col("len_hi"))
  }

  /** Per-document top-token share — the repetition/boilerplate signal of
    * the Gopher-style quality filters (a doc whose most frequent token
    * dominates is list/boilerplate-shaped). Shape at 100 TB: explode →
    * two partial-agg groupBys on doc-bounded keys (no window, no
    * collect) — the (doc_id, token) fan-out shuffles once and reduces
    * map-side. */
  def topTokenShare(documents: DataFrame): DataFrame =
    tokenized(documents)
      .select(col("doc_id"), explode(col("tk")).as("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        max("c").as("top_cnt"),
        sum("c").as("n_tokens"))
      .withColumn("top_share", expr("CAST(top_cnt AS DOUBLE) / n_tokens"))
      .select("doc_id", "n_tokens", "top_cnt", "top_share")

  /** Split each document's token stream into fixed-size chunks with a
    * fixed stride (overlap = chunkSize − stride) — the context-window
    * chunking step before tokenized training data is packed. One output
    * row per (doc, chunk). Per-row narrow fan-out (posexplode over the
    * arithmetic start sequence + slice), no shuffle — scales with input
    * splits. */
  def chunked(documents: DataFrame, chunkSize: Int = 64,
      stride: Int = 48): DataFrame = {
    require(chunkSize >= 1 && stride >= 1 && stride <= chunkSize,
      s"need 1 <= stride <= chunkSize, got stride=$stride chunkSize=$chunkSize")
    tokenized(documents)
      .select(col("doc_id"), col("tk"),
        posexplode(expr(s"sequence(0, greatest(size(tk) - 1, 0), $stride)"))
          .as(Seq("chunk_idx", "start")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        expr(s"slice(tk, start + 1, $chunkSize)").as("chunk"))
      .select(col("doc_id"), col("chunk_idx"),
        size(col("chunk")).cast("long").as("n_chunk_tokens"),
        array_join(col("chunk"), " ").as("chunk_text"))
  }

  /** Greedy sequence packing: stream each language's documents in
    * doc_id order and assign every document the training bin it starts
    * in, given a token budget per bin — the exclusive running token sum
    * divided by the budget (the standard concat-then-chunk packing:
    * documents may straddle bins; `bin_offset` says where each starts).
    *
    * Scale shape: ONE window per language partition (running sum over a
    * distributed partitioning — not a global single-partition window).
    * Parallelism is bounded by the stratum count; at corpus scale,
    * packing runs over (lang, shard) sub-streams — add a deterministic
    * shard key (e.g. `doc_id div shardSpan`) to the partition spec and
    * each shard packs independently, which is exactly how distributed
    * packing jobs ship. Integer-exact in both engines. */
  def packSequences(documents: DataFrame, tokenBudget: Long = 512L): DataFrame =
    tokenized(documents)
      .select(col("doc_id"), col("lang"), size(col("tk")).cast("long").as("n_tokens"))
      .withColumn("cum_excl",
        expr("""sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
               |ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)""".stripMargin))
      .withColumn("cum_excl", coalesce(col("cum_excl"), lit(0L)))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        expr(s"cum_excl div ${tokenBudget}L").as("bin"),
        expr(s"cum_excl % ${tokenBudget}L").as("bin_offset"))

  /** Rolling polynomial fingerprint over the token stream (order-
    * sensitive, init 7, mod 1e9+7). Cross-engine-exact: all int64 ops. */
  def fingerprinted(documents: DataFrame): DataFrame =
    tokenized(documents).withColumn("fingerprint", expr(
      s"""aggregate(transform(tk, t -> ${h60x("t")} % 1000003L),
         |  7L, (acc, x) -> (acc * 31L + x) % 1000000007L)""".stripMargin))

  /** SimHash over the distinct-token set: per bit, a ±1 vote from each
    * token's h60; bit set iff the vote sum is non-negative. `nBits` up to
    * 60 — the h60 token hash carries exactly 60 meaningful bits, so
    * every voted bit position can actually vary (bits ≥ 60 of a 64-bit
    * variant would be constant-0 dead weight).
    *
    * The bit-vote runs in the native codegen'd
    * [[graft.functions.SimHashBits]] expression (exact integer replay of
    * the nested-aggregate formulation the DuckDB oracle keeps). The
    * round-1 nested HOF was the worst query in the honest bench (~12 s at
    * sf0.1): interpreted lambdas, and CollapseProject re-inlined the `hs`
    * md5 column into all 32 bit lambdas — md5 × 32 per token. Here md5
    * runs once per distinct token and the nBits×n vote is a fused loop. */
  def simhashed(documents: DataFrame, nBits: Int = 32): DataFrame = {
    require(nBits >= 1 && nBits <= 60,
      s"nBits must be in [1,60] (h60 hashes have 60 meaningful bits), got $nBits")
    graft.functions.SimHashBits.register(documents.sparkSession)
    tokenized(documents)
      .withColumn("simhash", expr(
        s"simhash_bits(transform(array_distinct(tk), t -> ${h60x("t")}), $nBits)"))
  }
}
