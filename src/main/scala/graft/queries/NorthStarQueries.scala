package graft.queries

import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.QueryDef.oracle
import graft.functions.HllSketch
import graft.operators.{DedupOps, SimOps, TextOps}
import graft.sources.Tables

/** North-star extension surface: dedup, similarity search, text analysis
  * (builder prompt; BASELINE.json north_star). Every query here is
  * oracle-checked — including MinHash signatures, LSH candidate pairs,
  * SimHash, hyperplane buckets and cosine top-k — because every hash and
  * every floating-point fold is engineered to be cross-engine-exact
  * (see [[graft.functions.Scalars]], [[graft.operators.TextOps]]).
  *
  * DuckDB-side notes mirrored from the Spark operators:
  *   - Spark `aggregate(arr, init, f)` ≙ DuckDB `list_reduce([init] || arr, f)`;
  *   - Spark `sequence(1, n)` ≙ DuckDB `range(1, n+1)`; both 1-index arrays;
  *   - Spark `slice(a, s, len)` ≙ DuckDB `a[s : s+len-1]`.
  */
object NorthStarQueries {

  import TextOps.h60d

  /** q31's multilingual augmentation: doc_id % [[langAugMod]] → a
    * 20-function-word snippet appended to the text (the q71
    * fabricated-PII discipline — the synthetic corpus is monolingual, so
    * the multilingual signal is planted deterministically and the oracle
    * plants the identical one). Snippets are drawn from
    * [[TextOps.langProfiles]] so they outscore the base text's ~3
    * incidental English function words — including against the
    * same-script siblings (a planted pt snippet scores 20 for pt but
    * only its 6-word overlap for es, so the argmax distinguishes them).
    * doc_id % 10 ∈ {0, 8, 9} stays unaugmented: mostly 'en', with
    * zero-function-word docs classifying 'und'. Round 8 extends the
    * planting to pt/nl/sv (verdict item 7, the §8.10 same-script
    * limit). */
  private[queries] val langAugMod = 10
  private[queries] val langAugSnippets: Seq[(Int, String)] = {
    val byLang = TextOps.langProfiles.toMap
    // derived from the profiles themselves (not hand-copied) so a
    // profile edit can never leave the planted corpus signal voting for
    // a stale word set (reviewed round 5)
    Seq("es", "de", "fr", "it", "pt", "nl", "sv").zipWithIndex.map {
      case (l, i) => (i + 1) -> byLang(l).mkString(" ")
    }
  }

  /** DuckDB CTE fragments shared by the text queries. */
  private[queries] val TK = "SELECT doc_id, lang, n_chars, string_split(text, ' ') AS tk FROM documents"
  private[queries] val SH =
    s"""SELECT doc_id, lang, n_chars,
       |  CASE WHEN len(tk) >= 3 THEN
       |    list_distinct(list_transform(range(1, len(tk) - 1),
       |      i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))
       |  ELSE CAST([] AS VARCHAR[]) END AS sh
       |FROM ($TK)""".stripMargin
  /** `from` overrides the shingle source (default: the uncapped [[SH]]
    * derivation) — q83 points it at its df-capped `sh` CTE. */
  private[queries] def SIG(k: Int = 16, from: String = s"($SH)") =
    s"""SELECT doc_id, sh, list_transform(range(0, $k), j ->
       |  coalesce(list_min(list_transform(hs, h ->
       |    ((${h60d("'a:' || j::VARCHAR")} % 1000000006 + 1) * h
       |      + ${h60d("'b:' || j::VARCHAR")} % 1000000007)
       |    % 1000000007)), -1)) AS sig
       |FROM (SELECT doc_id, sh,
       |        list_transform(sh, g -> ${h60d("g")} % 1000000007) AS hs
       |      FROM $from)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    oracle(
      "q30_token_stats",
      s"""SELECT doc_id, n_tokens, n_distinct, n_stop,
         |  CAST(n_distinct AS DOUBLE) / n_tokens AS ttr
         |FROM (SELECT doc_id,
         |        CAST(len(tk) AS BIGINT) AS n_tokens,
         |        CAST(len(list_distinct(tk)) AS BIGINT) AS n_distinct,
         |        CAST(len(list_filter(tk,
         |          t -> list_contains(['the','a','of','and'], t))) AS BIGINT) AS n_stop
         |      FROM ($TK))
         |ORDER BY doc_id""",
      "Text analysis: token counting (whitespace tokenizer + stopword count)") { (s, d) =>
      TextOps.qualityScored(Tables.byOrder(s, d, "documents", "doc_id"))
        .select(col("doc_id"), col("n_tokens"), col("n_distinct"), col("n_stop"),
          col("ttr"))
        .orderBy("doc_id")
    },

    oracle(
      "q31_lang_id",
      {
        val scoreCols = TextOps.langProfiles.map { case (l, ws) =>
          s"CAST(len(list_filter(tk, t -> list_contains([${ws.map(w => s"'$w'").mkString(",")}], t))) AS BIGINT) AS s_$l"
        }.mkString(",\n  ")
        val augCase = NorthStarQueries.langAugSnippets.map { case (m, snip) =>
          s"WHEN doc_id % ${NorthStarQueries.langAugMod} = $m THEN ' $snip'"
        }.mkString(" ")
        s"""SELECT doc_id, ${TextOps.langProfiles.map(p => s"s_${p._1}").mkString(", ")},
           |  ${TextOps.langGuessSql} AS lang_guess
           |FROM (SELECT doc_id,
           |  $scoreCols
           |  FROM (SELECT doc_id, string_split(
           |          concat(coalesce(text, ''), CASE $augCase ELSE '' END),
           |          ' ') AS tk
           |        FROM documents))
           |ORDER BY doc_id""".stripMargin
      },
      "Text analysis: function-word-profile language-ID over a multilingual corpus") { (s, d) =>
      // the synthetic corpus is monolingual; like q71's fabricated PII,
      // deterministic per-doc_id snippets make it genuinely multilingual
      // so the classifier's output is non-degenerate (round-4 verdict
      // item 6) — docs with no function words at all classify 'und'
      val aug = Tables.byOrder(s, d, "documents", "doc_id").select(col("doc_id"),
        concat(coalesce(col("text"), lit("")),
          NorthStarQueries.langAugSnippets.foldLeft(
            when(lit(false), lit(""))) { case (w, (m, snip)) =>
            w.when(col("doc_id") % NorthStarQueries.langAugMod === m,
              lit(s" $snip"))
          }.otherwise(lit(""))).as("text"))
      val outCols =
        "doc_id" +: TextOps.langProfiles.map(p => s"s_${p._1}") :+ "lang_guess"
      TextOps.langScored(aug)
        .select(outCols.head, outCols.tail: _*)
        .orderBy("doc_id")
    },

    oracle(
      "q32_quality_score",
      s"""SELECT doc_id, n_tokens,
         |  CAST(n_distinct AS DOUBLE) / n_tokens AS ttr,
         |  CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio,
         |  CAST(sum_len AS DOUBLE) / n_tokens AS mean_len,
         |  0.5 * (CAST(n_distinct AS DOUBLE) / n_tokens)
         |    + 0.3 * (1.0 - CAST(n_stop AS DOUBLE) / n_tokens)
         |    + 0.2 * least((CAST(sum_len AS DOUBLE) / n_tokens) / 8.0, 1.0) AS quality
         |FROM (SELECT doc_id,
         |        CAST(len(tk) AS BIGINT) AS n_tokens,
         |        CAST(len(list_distinct(tk)) AS BIGINT) AS n_distinct,
         |        CAST(len(list_filter(tk,
         |          t -> list_contains(['the','a','of','and'], t))) AS BIGINT) AS n_stop,
         |        list_reduce([0::BIGINT] || list_transform(tk,
         |          t -> CAST(len(t) AS BIGINT)), (acc, x) -> acc + x) AS sum_len
         |      FROM ($TK))
         |ORDER BY doc_id""",
      "Text analysis: quality scoring (length/stopword/type-token ratios)") { (s, d) =>
      TextOps.qualityScored(Tables.byOrder(s, d, "documents", "doc_id"))
        .select("doc_id", "n_tokens", "ttr", "stop_ratio", "mean_len", "quality")
        .orderBy("doc_id")
    },

    oracle(
      "q33_fingerprint",
      s"""SELECT doc_id,
         |  list_reduce([7::BIGINT] || list_transform(tk,
         |    t -> ${h60d("t")} % 1000003),
         |    (acc, x) -> (acc * 31 + x) % 1000000007) AS fingerprint
         |FROM ($TK) ORDER BY doc_id""",
      "Text analysis: order-sensitive rolling-hash document fingerprint") { (s, d) =>
      TextOps.fingerprinted(Tables.byOrder(s, d, "documents", "doc_id"))
        .select("doc_id", "fingerprint")
        .orderBy("doc_id")
    },

    oracle(
      "q34_dedup_exact",
      """SELECT md5(array_to_string(string_split(text, ' ')[1:3], ' ')) AS dedup_key,
        |  min(doc_id) AS keeper_doc_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY 1""",
      "Dedup: exact hash-groupBy (first-occurrence-wins keeper)") { (s, d) =>
      DedupOps.exactDupGroups(Tables(s, d, "documents"),
          "md5(array_join(slice(split(text, ' '), 1, 3), ' '))")
        .orderBy("dedup_key")
    },

    oracle(
      "q35_minhash_sig",
      s"""SELECT doc_id, array_to_string(sig, ',') AS sig_str
         |FROM (${SIG()}) ORDER BY doc_id""",
      "Dedup: 16-hash MinHash signature over 3-gram shingles") { (s, d) =>
      DedupOps.minhashSigned(Tables.byOrder(s, d, "documents", "doc_id"))
        .selectExpr("doc_id",
          "array_join(transform(sig, x -> cast(x AS string)), ',') AS sig_str")
        .orderBy("doc_id")
    },

    oracle(
      "q36_minhash_lsh_pairs",
      s"""WITH sh AS ($SH),
         |sig AS (${SIG()}),
         |bands AS (
         |  SELECT doc_id, unnest(range(0, 4)) AS band,
         |    unnest(list_transform(range(0, 4), b ->
         |      ${h60d("b::VARCHAR || '|' || array_to_string(sig[b*4+1 : b*4+4], ',')")})) AS bucket
         |  FROM sig WHERE sig[1] <> -1),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         |  FROM bands x JOIN bands y ON x.band = y.band AND x.bucket = y.bucket
         |  WHERE x.doc_id < y.doc_id)
         |SELECT a, b,
         |  CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
         |    / len(list_distinct(sa.sh || sb.sh)) AS jaccard
         |FROM cand
         |JOIN sh sa ON sa.doc_id = a
         |JOIN sh sb ON sb.doc_id = b
         |ORDER BY a, b""",
      "Dedup: MinHash+LSH banding → bucket-join candidates → true Jaccard") { (s, d) =>
      DedupOps.minhashCandidatePairs(Tables(s, d, "documents"))
        .orderBy("a", "b")
    },

    oracle(
      "q37_simhash",
      s"""SELECT doc_id,
         |  list_reduce([0::BIGINT] || list_transform(range(0, 32), b ->
         |    CASE WHEN list_reduce([0::BIGINT] || list_transform(hs,
         |           h -> ((h // CAST(power(2.0, b) AS BIGINT)) % 2) * 2 - 1),
         |           (acc, x) -> acc + x) >= 0
         |         THEN CAST(power(2.0, b) AS BIGINT) ELSE 0 END),
         |    (acc, x) -> acc + x) AS simhash
         |FROM (SELECT doc_id, list_transform(list_distinct(tk),
         |        t -> ${h60d("t")}) AS hs
         |      FROM ($TK))
         |ORDER BY doc_id""",
      "Dedup: 32-bit SimHash bit-vote over distinct tokens") { (s, d) =>
      TextOps.simhashed(Tables.byOrder(s, d, "documents", "doc_id"))
        .select("doc_id", "simhash")
        .orderBy("doc_id")
    },

    // The registered entry runs the df-cap FOR REAL (round-6 verdict
    // item 4): a shingle in more than 25 documents is corpus
    // boilerplate with no dedup signal but df² fan-out in the
    // (g, lang, blk) key — the exact pair-growth that made the
    // uncapped q38 6.37× wall / 69× task at the 10× smoke. The bound
    // is ABSOLUTE (see dfCappedShingles: a fractional cap weakens as
    // the corpus grows — pruning must depend on a shingle's own df,
    // which is what drives its cost). The oracle mirrors the cap: df
    // per shingle over the exploded rows, hot set = df > 25, Jaccard
    // on the CAPPED sets (meta/nsh recomputed post-prune, identical to
    // Spark's array_except path — arrays are distinct by construction).
    oracle(
      "q38_jaccard_blocked",
      s"""WITH sh AS ($SH),
         |shx AS (SELECT doc_id, lang, unnest(sh) AS g FROM sh),
         |hot AS (SELECT g FROM shx GROUP BY g HAVING COUNT(*) > 25),
         |shr0 AS (SELECT * FROM shx WHERE g NOT IN (SELECT g FROM hot)),
         |meta AS (SELECT doc_id, lang,
         |           CAST(length(to_base(COUNT(*), 5)) AS BIGINT) AS blk,
         |           CAST(COUNT(*) AS BIGINT) AS nsh FROM shr0 GROUP BY 1, 2),
         |shr AS (SELECT s.doc_id, s.lang, m.blk,
         |          ('0x' || substr(md5(s.g), 1, 15))::BIGINT AS g
         |        FROM shr0 s JOIN meta m ON s.doc_id = m.doc_id),
         |cnt AS (SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS c
         |        FROM shr x
         |        JOIN (SELECT doc_id, lang, g, blk + off AS blk
         |              FROM shr CROSS JOIN (SELECT unnest([-1, 0, 1]) AS off) o) y
         |          ON x.g = y.g AND x.lang = y.lang AND x.blk = y.blk
         |        WHERE x.doc_id < y.doc_id GROUP BY 1, 2)
         |SELECT a, b, CAST(c AS DOUBLE) / (ma.nsh + mb.nsh - c) AS jaccard
         |FROM cnt
         |JOIN meta ma ON ma.doc_id = a
         |JOIN meta mb ON mb.doc_id = b
         |WHERE least(ma.nsh, mb.nsh) >= 0.2 * greatest(ma.nsh, mb.nsh)
         |  AND CAST(c AS DOUBLE) / (ma.nsh + mb.nsh - c) >= 0.2
         |ORDER BY a, b""",
      "Dedup: blocked n-gram Jaccard (df-capped, lang × size-bucket blocking)") { (s, d) =>
      DedupOps.blockedJaccardPairs(Tables(s, d, "documents"),
        maxShingleDf = Some(25L))
        .orderBy("a", "b")
    },

    oracle(
      "q39_cosine_topk",
      """WITH e AS (
        |  SELECT vec_id, embedding,
        |    sqrt(list_reduce([0.0::DOUBLE] || list_transform(range(1, len(embedding)+1),
        |      i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE), (acc,x) -> acc + x)) AS norm
        |  FROM embeddings),
        |scored AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
        |    list_reduce([0.0::DOUBLE] || list_transform(range(1, len(q.embedding)+1),
        |      i -> q.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE), (acc,x) -> acc + x)
        |      / (q.norm * c.norm) AS cosine
        |  FROM e q JOIN e c ON q.vec_id < 50 AND q.vec_id <> c.vec_id),
        |ranked AS (
        |  SELECT q_id, n_id, cosine,
        |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) AS rank
        |  FROM scored)
        |SELECT q_id, n_id, rank, cosine FROM ranked WHERE rank <= 5
        |ORDER BY q_id, rank""",
      "Similarity: brute-force cosine top-k (bounded probe set × corpus)") { (s, d) =>
      SimOps.cosineTopK(Tables(s, d, "embeddings"))
        .orderBy("q_id", "rank")
    },

    oracle(
      "q40_hyperplane_buckets",
      s"""SELECT vec_id,
         |  list_reduce([0::BIGINT] || list_transform(range(0, 12), j ->
         |    CASE WHEN list_reduce([0.0::DOUBLE] ||
         |           list_transform(range(1, len(embedding)+1),
         |             i -> embedding[i]::DOUBLE
         |                  * ((${h60d("i::VARCHAR || '_' || j::VARCHAR")} % 2001 - 1000) / 1000.0)),
         |           (acc, x) -> acc + x) >= 0.0
         |         THEN CAST(power(2.0, j) AS BIGINT) ELSE 0 END),
         |    (acc, x) -> acc + x) AS bucket
         |FROM embeddings ORDER BY vec_id""",
      "Similarity: random-hyperplane LSH bucket assignment (ANN scale path)") { (s, d) =>
      SimOps.hyperplaneBuckets(Tables(s, d, "embeddings"))
        .select("vec_id", "bucket")
        .orderBy("vec_id")
    },

    oracle(
      "q41_bucketed_neighbors",
      s"""WITH e AS (
         |  SELECT vec_id, embedding,
         |    sqrt(list_reduce([0.0::DOUBLE] || list_transform(range(1, len(embedding)+1),
         |      i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE), (acc,x) -> acc + x)) AS norm,
         |    list_reduce([0::BIGINT] || list_transform(range(0, 12), j ->
         |      CASE WHEN list_reduce([0.0::DOUBLE] ||
         |             list_transform(range(1, len(embedding)+1),
         |               i -> embedding[i]::DOUBLE
         |                    * ((${h60d("i::VARCHAR || '_' || j::VARCHAR")} % 2001 - 1000) / 1000.0)),
         |             (acc, x) -> acc + x) >= 0.0
         |           THEN CAST(power(2.0, j) AS BIGINT) ELSE 0 END),
         |      (acc, x) -> acc + x) AS bucket
         |  FROM embeddings)
         |SELECT l.bucket AS bucket, l.vec_id AS a, r.vec_id AS b,
         |  list_reduce([0.0::DOUBLE] || list_transform(range(1, len(l.embedding)+1),
         |    i -> l.embedding[i]::DOUBLE * r.embedding[i]::DOUBLE), (acc,x) -> acc + x)
         |    / (l.norm * r.norm) AS cosine
         |FROM e l JOIN e r ON l.bucket = r.bucket AND l.vec_id < r.vec_id
         |ORDER BY 1, 2, 3""",
      "Similarity: LSH bucket-join ANN with exact cosine re-scoring") { (s, d) =>
      SimOps.bucketedNeighbors(Tables(s, d, "embeddings"))
        .orderBy("bucket", "a", "b")
    },

    // Embedding-cosine near-dup (the dedup-mode list's last entry):
    // bucketed pairs above a cosine threshold resolve to min-id keepers.
    // Threshold 0.1 is calibrated to the synthetic corpus (cosines land
    // in [-0.25, 0.31]); the cosine itself is bit-exact cross-engine, so
    // the threshold comparison is boundary-safe.
    oracle(
      "q54_cosine_neardup",
      s"""WITH e AS (
         |  SELECT vec_id, embedding,
         |    sqrt(list_reduce([0.0::DOUBLE] || list_transform(range(1, len(embedding)+1),
         |      i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE), (acc,x) -> acc + x)) AS norm,
         |    list_reduce([0::BIGINT] || list_transform(range(0, 12), j ->
         |      CASE WHEN list_reduce([0.0::DOUBLE] ||
         |             list_transform(range(1, len(embedding)+1),
         |               i -> embedding[i]::DOUBLE
         |                    * ((${h60d("i::VARCHAR || '_' || j::VARCHAR")} % 2001 - 1000) / 1000.0)),
         |             (acc, x) -> acc + x) >= 0.0
         |           THEN CAST(power(2.0, j) AS BIGINT) ELSE 0 END),
         |      (acc, x) -> acc + x) AS bucket
         |  FROM embeddings),
         |p AS (
         |  SELECT l.vec_id AS a, r.vec_id AS b
         |  FROM e l JOIN e r ON l.bucket = r.bucket AND l.vec_id < r.vec_id
         |  WHERE list_reduce([0.0::DOUBLE] || list_transform(range(1, len(l.embedding)+1),
         |          i -> l.embedding[i]::DOUBLE * r.embedding[i]::DOUBLE), (acc,x) -> acc + x)
         |        / (l.norm * r.norm) >= 0.1),
         |n AS (SELECT a AS vec_id, b AS nbr FROM p
         |      UNION ALL SELECT b AS vec_id, a AS nbr FROM p)
         |SELECT v.vec_id,
         |  least(v.vec_id, coalesce(min(n.nbr), v.vec_id)) AS keeper_id,
         |  CAST(count(n.nbr) AS BIGINT) AS n_nbrs
         |FROM embeddings v LEFT JOIN n ON n.vec_id = v.vec_id
         |GROUP BY v.vec_id ORDER BY v.vec_id""",
      "Dedup: embedding-cosine near-dup via bucketed ANN + min-id keeper") { (s, d) =>
      SimOps.cosineNearDupKeepers(Tables(s, d, "embeddings"), minCosine = 0.1)
        .orderBy("vec_id")
    },

    // SimHash as an actual dedup pairing (q37 only computes the hash):
    // 60-bit SimHash, four 15-bit bands (32,768 buckets/band — scales
    // with the hash width, not a fixed 256) → candidate equi-join →
    // exact Hamming verify. 4 bands guarantee recall for Hamming ≤ 3 by
    // pigeonhole; 60 bits because h60 token hashes carry exactly 60
    // meaningful bits (see DedupOps.simhashCandidatePairs scaladoc).
    oracle(
      "q59_simhash_neardup",
      s"""WITH sim AS (
         |  SELECT doc_id,
         |    list_reduce([0::BIGINT] || list_transform(range(0, 60), b ->
         |      CASE WHEN list_reduce([0::BIGINT] || list_transform(hs,
         |             h -> ((h // CAST(power(2.0, b) AS BIGINT)) % 2) * 2 - 1),
         |             (acc, x) -> acc + x) >= 0
         |           THEN CAST(power(2.0, b) AS BIGINT) ELSE 0 END),
         |      (acc, x) -> acc + x) AS simhash
         |  FROM (SELECT doc_id, list_transform(list_distinct(tk),
         |          t -> ${h60d("t")}) AS hs
         |        FROM ($TK))),
         |banded AS (
         |  SELECT doc_id, simhash, unnest(range(0, 4)) AS band,
         |    unnest(list_transform(range(0, 4), b ->
         |      (simhash // CAST(power(2.0, b * 15) AS BIGINT)) % 32768)) AS bucket
         |  FROM sim),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
         |    x.simhash AS sh_a, y.simhash AS sh_b
         |  FROM banded x JOIN banded y
         |    ON x.band = y.band AND x.bucket = y.bucket
         |  WHERE x.doc_id < y.doc_id)
         |SELECT a, b, CAST(bit_count(xor(sh_a, sh_b)) AS BIGINT) AS hamming
         |FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= 3
         |ORDER BY a, b""",
      "Dedup: SimHash banding → candidate pairs → exact Hamming verify") { (s, d) =>
      DedupOps.simhashCandidatePairs(Tables(s, d, "documents"))
        .orderBy("a", "b")
    },

    // BPE-ish regex tokenization (the second half of the token-counting
    // bullet; q30 is the whitespace half): GPT-2-style alternation —
    // contraction suffixes, space-prefixed letter/digit runs, punctuation
    // runs — without lookarounds, so Java regex (Spark) and RE2 (DuckDB)
    // agree: both use leftmost-first alternation with greedy runs.
    oracle(
      "q58_bpe_tokens",
      """SELECT doc_id,
        |  CAST(len(bt) AS BIGINT) AS n_bpe_tokens,
        |  CAST(len(list_distinct(bt)) AS BIGINT) AS n_distinct_bpe,
        |  CASE WHEN len(bt) = 0 THEN NULL ELSE
        |    CAST(list_reduce([0::BIGINT] || list_transform(bt,
        |           t -> CAST(length(t) AS BIGINT)), (acc, x) -> acc + x) AS DOUBLE)
        |      / len(bt) END AS mean_bpe_len
        |FROM (SELECT doc_id, regexp_extract_all(coalesce(text, ''),
        |        '''s|''t|''re|''ve|''m|''ll|''d| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+') AS bt
        |      FROM documents)
        |ORDER BY doc_id""",
      "Text analysis: BPE-style regex tokenizer stats") { (s, d) =>
      // coalesce + zero-guard keep parity total: Spark size(NULL) is -1
      // (legacy sizeOfNull) where DuckDB len(NULL) is NULL, and the
      // engines disagree on 0/0 doubles — NULL text and token-less text
      // must hit neither
      Tables.byOrder(s, d, "documents", "doc_id")
        .withColumn("bt", regexp_extract_all(coalesce(col("text"), lit("")),
          lit("'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"), lit(0)))
        .select(col("doc_id"),
          size(col("bt")).cast("long").as("n_bpe_tokens"),
          size(array_distinct(col("bt"))).cast("long").as("n_distinct_bpe"),
          when(size(col("bt")) === 0, lit(null))
            .otherwise(
              expr("aggregate(bt, 0L, (acc, t) -> acc + CAST(length(t) AS BIGINT))")
                .cast("double") / size(col("bt"))).as("mean_bpe_len"))
        .orderBy("doc_id")
    },

    // Transitive-closure dedup: LSH candidate pairs (Jaccard-verified
    // ≥ 0.5) become edges; iterative min-label propagation collapses
    // whole components to one keeper — upgrading the single-hop
    // first-occurrence-wins semantic. The oracle computes the identical
    // closure with a recursive CTE (min reachable id per node).
    oracle(
      "q57_transitive_keepers",
      s"""WITH RECURSIVE sh AS ($SH),
         |sig AS (${SIG()}),
         |bands AS (
         |  SELECT doc_id, unnest(range(0, 4)) AS band,
         |    unnest(list_transform(range(0, 4), b ->
         |      ${h60d("b::VARCHAR || '|' || array_to_string(sig[b*4+1 : b*4+4], ',')")})) AS bucket
         |  FROM sig WHERE sig[1] <> -1),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         |  FROM bands x JOIN bands y ON x.band = y.band AND x.bucket = y.bucket
         |  WHERE x.doc_id < y.doc_id),
         |verified AS (
         |  SELECT a, b FROM cand
         |  JOIN sh sa ON sa.doc_id = a
         |  JOIN sh sb ON sb.doc_id = b
         |  WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
         |          / len(list_distinct(sa.sh || sb.sh)) >= 0.5),
         |edges AS (SELECT a AS u, b AS v FROM verified
         |          UNION SELECT b AS u, a AS v FROM verified),
         |reach(id, r) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.u, reach.r FROM edges e JOIN reach ON reach.id = e.v),
         |final AS (SELECT id AS doc_id, min(r) AS keeper_doc_id
         |          FROM reach GROUP BY id)
         |SELECT f.doc_id, f.keeper_doc_id, CAST(c.n AS BIGINT) AS component_size
         |FROM final f
         |JOIN (SELECT keeper_doc_id, count(*) AS n FROM final GROUP BY 1) c
         |  USING (keeper_doc_id)
         |ORDER BY f.doc_id""",
      "Dedup: transitive-closure keepers (iterative connected components)") { (s, d) =>
      val docs = Tables(s, d, "documents")
      val pairs = DedupOps.minhashCandidatePairs(docs)
        .filter(col("jaccard") >= 0.5).select("a", "b")
      val labels = DedupOps.componentKeepers(pairs)
        .withColumnRenamed("id", "doc_id")
      val keepers = docs.select("doc_id")
        .join(labels, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("label"), col("doc_id")).as("keeper_doc_id"))
      keepers.join(
          keepers.groupBy(col("keeper_doc_id"))
            .agg(count(lit(1)).as("component_size")),
          Seq("keeper_doc_id"))
        .select("doc_id", "keeper_doc_id", "component_size")
        .orderBy("doc_id")
    },

    // IVF with sampled centroids — the coarse-quantizer ANN alternative
    // to hyperplane LSH (q40/q41): the first 16 vectors are the cell
    // centroids (deterministic, hence oracle-replayable; trained
    // centroids would converge engine-dependently), every vector joins
    // its max-cosine cell, probes rank exact cosine within their cell.
    oracle(
      "q56_ivf_neighbors",
      s"""WITH e AS (
         |  SELECT vec_id, embedding,
         |    sqrt(list_reduce([0.0::DOUBLE] || list_transform(range(1, len(embedding)+1),
         |      i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE), (acc,x) -> acc + x)) AS norm
         |  FROM embeddings),
         |c AS (SELECT vec_id AS cent_id, embedding AS cent_emb, norm AS cent_norm
         |      FROM e WHERE vec_id < 16),
         |scored AS (
         |  SELECT v.vec_id, c.cent_id,
         |    ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
         |      list_reduce([0.0::DOUBLE] || list_transform(range(1, len(v.embedding)+1),
         |        i -> v.embedding[i]::DOUBLE * c.cent_emb[i]::DOUBLE), (acc,x) -> acc + x)
         |        / (v.norm * c.cent_norm) DESC, c.cent_id) AS rn
         |  FROM e v CROSS JOIN c),
         |cell AS (SELECT vec_id, cent_id AS cell FROM scored WHERE rn = 1),
         |pairs AS (
         |  SELECT q.vec_id AS q_id, n.vec_id AS n_id,
         |    list_reduce([0.0::DOUBLE] || list_transform(range(1, len(q.embedding)+1),
         |      i -> q.embedding[i]::DOUBLE * n.embedding[i]::DOUBLE), (acc,x) -> acc + x)
         |      / (q.norm * n.norm) AS cosine
         |  FROM (SELECT e.*, cell.cell FROM e JOIN cell USING (vec_id)) q
         |  JOIN (SELECT e.*, cell.cell FROM e JOIN cell USING (vec_id)) n
         |    ON q.cell = n.cell AND q.vec_id < 25 AND q.vec_id <> n.vec_id),
         |ranked AS (
         |  SELECT q_id, n_id, cosine,
         |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) AS rank
         |  FROM pairs)
         |SELECT q_id, n_id, rank, cosine FROM ranked WHERE rank <= 3
         |ORDER BY q_id, rank""",
      "Similarity: IVF (sampled centroids) single-probe ANN") { (s, d) =>
      SimOps.ivfNeighbors(Tables(s, d, "embeddings"))
        .orderBy("q_id", "rank")
    },

    // Custom TypedImperativeAggregate showcase (SURVEY §4 deferred item):
    // HLL register state from the shared h60 hash, so the ORACLE CHECKS
    // THE SKETCH ITSELF — DuckDB rebuilds the identical 64 registers in
    // plain SQL and the register summary + raw estimate hash-match.
    // exact_distinct sits alongside so the estimate's error is visible.
    oracle(
      "q53_hll_distinct",
      s"""WITH h AS (
         |  SELECT event_type,
         |         ${h60d("CAST(user_id AS VARCHAR)")} AS hv
         |  FROM events),
         |r AS (
         |  SELECT event_type, hv % 64 AS reg,
         |         CASE WHEN hv // 64 = 0 THEN 55
         |              ELSE 55 - length(bin(hv // 64)) END AS rho
         |  FROM h),
         |mx AS (SELECT event_type, reg, max(rho) AS m FROM r GROUP BY 1, 2),
         |fr AS (
         |  SELECT g.event_type, rr.reg, coalesce(mx.m, 0) AS m
         |  FROM (SELECT DISTINCT event_type FROM events) g
         |  CROSS JOIN (SELECT unnest(range(0, 64)) AS reg) rr
         |  LEFT JOIN mx ON mx.event_type = g.event_type AND mx.reg = rr.reg),
         |agg AS (
         |  SELECT event_type,
         |    CAST(sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_zero,
         |    CAST(max(m) AS BIGINT) AS mmax
         |  FROM fr GROUP BY 1),
         |nm AS (
         |  SELECT f.event_type,
         |    CAST(sum(CAST(1 AS BIGINT) << (a.mmax - f.m)) AS BIGINT) AS num
         |  FROM fr f JOIN agg a ON a.event_type = f.event_type
         |  GROUP BY 1),
         |ex AS (SELECT event_type,
         |         CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
         |       FROM events GROUP BY 1)
         |SELECT a.event_type, a.v_zero, a.mmax, n.num,
         |  ${HllSketch.estimateSql("a.mmax", "n.num")} AS estimate,
         |  ${HllSketch.correctedSql("a.v_zero",
              HllSketch.estimateSql("a.mmax", "n.num"))} AS hll_corrected,
         |  ex.exact_distinct
         |FROM agg a
         |JOIN nm n ON n.event_type = a.event_type
         |JOIN ex ON ex.event_type = a.event_type
         |ORDER BY a.event_type""",
      "Custom TypedImperativeAggregate: oracle-replayable HLL sketch") { (s, d) =>
      HllSketch.register(s)
      Tables(s, d, "events")
        .groupBy("event_type")
        .agg(expr("hll_sketch(CAST(user_id AS STRING))").as("sk"),
          countDistinct(col("user_id")).cast("long").as("exact_distinct"))
        .select(col("event_type"),
          col("sk.v_zero").as("v_zero"),
          col("sk.mmax").as("mmax"),
          col("sk.num").as("num"),
          expr(HllSketch.estimateSql("sk.mmax", "sk.num")).as("estimate"),
          expr(HllSketch.correctedSql("sk.v_zero",
            HllSketch.estimateSql("sk.mmax", "sk.num"))).as("hll_corrected"),
          col("exact_distinct"))
        .orderBy("event_type")
    },

    // Deterministic hash-gate sampling with per-stratum rates: membership
    // is a pure function of (salt, doc_id), so it is stable across runs,
    // partitionings, engines, and corpus growth — df.sample() is none of
    // those. Rates quantize to millionths for exact integer comparison.
    oracle(
      "q60_stratified_sample",
      s"""SELECT doc_id, lang FROM documents
         |WHERE ${h60d("'smp:' || CAST(doc_id AS VARCHAR)")} % 1000000 <
         |  CASE WHEN lang = 'en' THEN 100000
         |       WHEN lang = 'zh' THEN 250000 ELSE 500000 END
         |ORDER BY doc_id""",
      "Sampling: deterministic per-stratum hash-gate (10% en, 25% zh, 50% rest)") { (s, d) =>
      graft.operators.SampleOps.stratifiedSample(
          Tables(s, d, "documents"), strataCol = "lang",
          rates = Map("en" -> 0.1, "zh" -> 0.25), defaultRate = 0.5,
          keyCol = "doc_id")
        .select("doc_id", "lang")
        .orderBy("doc_id")
    },

    // Top-token share — the Gopher-style repetition/boilerplate quality
    // signal: the most frequent token's count over the token total.
    oracle(
      "q61_top_token_share",
      s"""SELECT doc_id,
         |  CAST(n_tokens AS BIGINT) AS n_tokens,
         |  CAST(top_cnt AS BIGINT) AS top_cnt,
         |  CAST(top_cnt AS DOUBLE) / n_tokens AS top_share
         |FROM (SELECT doc_id, max(c) AS top_cnt, sum(c) AS n_tokens
         |      FROM (SELECT doc_id, t, count(*) AS c
         |            FROM (SELECT doc_id, unnest(tk) AS t FROM ($TK))
         |            GROUP BY doc_id, t)
         |      GROUP BY doc_id)
         |ORDER BY doc_id""",
      "Text analysis: top-token share (repetition/boilerplate signal)") { (s, d) =>
      TextOps.topTokenShare(Tables(s, d, "documents"))
        .orderBy("doc_id")
    },

    // Benchmark decontamination: docs with id < 25 stand in for the
    // benchmark/eval set; every remaining doc is screened for shared
    // 3-gram shingles. The probe side is bounded by construction →
    // broadcast join, corpus never shuffles (one partial-agg count).
    oracle(
      "q62_decontamination",
      s"""WITH sh AS ($SH),
         |probes AS (SELECT DISTINCT unnest(sh) AS g FROM sh WHERE doc_id < 25),
         |corpus AS (SELECT doc_id, unnest(sh) AS g FROM sh WHERE doc_id >= 25),
         |hits AS (SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_hit_shingles
         |         FROM corpus c JOIN probes p ON p.g = c.g GROUP BY 1)
         |SELECT d.doc_id,
         |  coalesce(h.n_hit_shingles, 0) AS n_hit_shingles,
         |  coalesce(h.n_hit_shingles, 0) > 0 AS contaminated
         |FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
         |WHERE d.doc_id >= 25
         |ORDER BY d.doc_id""",
      "Dedup: benchmark decontamination (broadcast probe shingles, corpus unshuffled)") { (s, d) =>
      val docs = Tables(s, d, "documents")
      DedupOps.decontaminate(
          corpus = docs.filter(col("doc_id") >= 25),
          probes = docs.filter(col("doc_id") < 25))
        .orderBy("doc_id")
    },

    // Context-window chunking: fixed 64-token chunks at stride 48
    // (16-token overlap), one row per chunk — per-row narrow fan-out,
    // no shuffle. DuckDB range(start, stop, step) is end-EXCLUSIVE vs
    // Spark sequence's inclusive end, hence the len(tk) bound (start
    // values are identical: multiples of 48 strictly below len(tk),
    // plus the degenerate 0 for empty token lists).
    oracle(
      "q63_token_chunks",
      s"""SELECT doc_id,
         |  CAST(start // 48 AS BIGINT) AS chunk_idx,
         |  CAST(len(tk[start + 1 : start + 64]) AS BIGINT) AS n_chunk_tokens,
         |  array_to_string(tk[start + 1 : start + 64], ' ') AS chunk_text
         |FROM (SELECT doc_id, tk,
         |        unnest(range(0, greatest(len(tk), 1), 48)) AS start
         |      FROM ($TK))
         |ORDER BY doc_id, chunk_idx""",
      "Chunking: fixed-size token windows with stride (context-window prep)") { (s, d) =>
      TextOps.chunked(Tables(s, d, "documents"), chunkSize = 64, stride = 48)
        .orderBy("doc_id", "chunk_idx")
    },

    // Greedy sequence packing per language stream: exclusive running
    // token sum div budget = the bin each document STARTS in (documents
    // straddle bins, the concat-then-chunk packing). One distributed
    // window per lang partition; all-integer arithmetic.
    oracle(
      "q64_sequence_packing",
      s"""SELECT doc_id, lang,
         |  CAST(len(tk) AS BIGINT) AS n_tokens,
         |  CAST(cum_excl // 512 AS BIGINT) AS bin,
         |  CAST(cum_excl % 512 AS BIGINT) AS bin_offset
         |FROM (SELECT doc_id, lang, tk,
         |        coalesce(sum(len(tk)) OVER (PARTITION BY lang ORDER BY doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_excl
         |      FROM ($TK))
         |ORDER BY doc_id""",
      "Packing: greedy token-budget binning per language stream") { (s, d) =>
      TextOps.packSequences(Tables(s, d, "documents"), tokenBudget = 512L)
        .orderBy("doc_id")
    },

    // Segment-level exact dedup: non-overlapping 8-token segments,
    // corpus-wide first occurrence (by doc_id, position) wins, docs
    // re-assemble from survivors — fixed-granularity exact-substring
    // dedup (~5% of sf0.01 segments are repeats).
    oracle(
      "q65_segment_dedup",
      s"""WITH seg AS (
         |  SELECT doc_id, CAST(s // 8 AS BIGINT) AS idx,
         |         array_to_string(tk[s + 1 : s + 8], ' ') AS seg
         |  FROM (SELECT doc_id, tk,
         |          unnest(range(0, greatest(len(tk), 1), 8)) AS s
         |        FROM ($TK))),
         |rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY seg
         |         ORDER BY doc_id, idx) AS rk FROM seg),
         |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept_segments,
         |          string_agg(seg, ' ' ORDER BY idx) AS kept_text
         |        FROM rk WHERE rk = 1 GROUP BY doc_id)
         |SELECT d.doc_id,
         |  coalesce(a.n_kept_segments, 0) AS n_kept_segments,
         |  coalesce(a.kept_text, '') AS kept_text
         |FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
         |ORDER BY d.doc_id""",
      "Dedup: segment-level exact dedup (first occurrence wins, doc re-assembly)") { (s, d) =>
      DedupOps.segmentDedup(Tables(s, d, "documents"), segTokens = 8)
        .orderBy("doc_id")
    },

    // Per-language length-window trim: keep docs inside their stratum's
    // [p05, p95] exact percentiles. The cutoffs table (one row per
    // lang) broadcasts back over the corpus — the corpus never
    // shuffles. Spark percentile ≙ DuckDB quantile_cont (the q50
    // pattern: identical interpolated doubles).
    oracle(
      "q66_length_window",
      """WITH cuts AS (
        |  SELECT lang, quantile_cont(n_chars, 0.05) AS len_lo,
        |         quantile_cont(n_chars, 0.95) AS len_hi
        |  FROM documents GROUP BY 1)
        |SELECT d.doc_id, d.lang, d.n_chars
        |FROM documents d JOIN cuts c USING (lang)
        |WHERE d.n_chars >= c.len_lo AND d.n_chars <= c.len_hi
        |ORDER BY d.doc_id""",
      "Quality: per-stratum length-window filter (adaptive percentile trim)") { (s, d) =>
      TextOps.lengthWindowFilter(Tables(s, d, "documents"))
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    },

    // The full orientation vote as a driver-checked query
    // (bin/orient_image.sh:55-80; round-3 verdict item 8): explode 4
    // rotation candidates per page → OCR → cheap word-count score →
    // bottom-2 survivors → costly misspelled-count score (survivors
    // ONLY) → argmin winner. Pages fabricate deterministic content from
    // doc_id, so the stub OCR adapter's scores are pure functions of the
    // same 32-bit polynomial hash in both engines: the oracle replays
    // h = fold(31·h + byte) over the content bytes with list_reduce
    // (mask & 4294967295 keeps Java's int wraparound; all downstream
    // uses are & 3 / & 7 / & 15, which agree between floorMod and
    // two's-complement masking), derives each rotation's (wc,
    // misspelled) from the rotation-offset class k = (r/90 − (h&3)) & 3
    // — k=0 clean 9-word text (0 misspelled), k=2 same-length garble
    // (4), sideways junk 16/16 — and runs the identical two-window
    // prune-then-argmin. The costly score never touching pruned rows is
    // the operator's contract (OrientOpsSpec proves survivors-only).
    oracle(
      "q67_orientation_vote",
      """WITH pages AS (
        |  SELECT doc_id AS page_id, 'pg' || doc_id AS s FROM documents),
        |hashed AS (
        |  SELECT page_id, list_reduce(
        |      [CAST(17 AS BIGINT)] || list_transform(range(1, length(s) + 1),
        |        i -> CAST(ascii(substr(s, CAST(i AS INT), 1)) AS BIGINT)),
        |      (a, b) -> (a * 31 + b) & 4294967295) AS h
        |  FROM pages),
        |scored AS (
        |  SELECT page_id, CAST(r AS BIGINT) AS rotation,
        |    CASE ((r // 90) - (h & 3)) & 3 WHEN 0 THEN 9 WHEN 2 THEN 9
        |         ELSE 16 END AS wc,
        |    CASE ((r // 90) - (h & 3)) & 3 WHEN 0 THEN 0 WHEN 2 THEN 4
        |         ELSE 16 END AS misspelled
        |  FROM hashed CROSS JOIN (SELECT unnest([0, 90, 180, 270]) AS r)),
        |surv AS (
        |  SELECT * FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY page_id
        |           ORDER BY wc, rotation) AS cr FROM scored)
        |  WHERE cr <= 2),
        |win AS (
        |  SELECT * FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY page_id
        |           ORDER BY misspelled, wc, rotation) AS fr FROM surv)
        |  WHERE fr = 1)
        |SELECT page_id, rotation, CAST(wc AS BIGINT) AS wc,
        |  CAST(misspelled AS BIGINT) AS misspelled
        |FROM win ORDER BY page_id""",
      "SURVEY §2.4 A4/A5 + §2.5 T1/T2: staged orientation vote end-to-end") { (s, d) =>
      val pages = Tables(s, d, "documents").select(
        col("doc_id").as("page_id"),
        concat(lit("pg"), col("doc_id")).cast("binary").as("content"))
      graft.operators.OrientOps.orientationVote(pages, Seq("page_id"))
        .select(col("page_id"), col("rotation").cast("long").as("rotation"),
          col("wc"), col("misspelled"))
        .orderBy("page_id")
    },

    // Duplicated-n-gram fraction (Gopher-style repetition filter): the
    // share of each doc's 3-gram OCCURRENCES whose gram repeats within
    // the doc. All-integer counts + one double division; docs with < 3
    // tokens appear with zero counts and a NULL ratio.
    oracle(
      "q68_dup_ngrams",
      s"""WITH g AS (
         |  SELECT doc_id, unnest(CASE WHEN len(tk) >= 3 THEN
         |      list_transform(range(1, len(tk) - 1),
         |        i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
         |    ELSE CAST([] AS VARCHAR[]) END) AS g
         |  FROM ($TK)),
         |cnt AS (SELECT doc_id, g, count(*) AS c FROM g GROUP BY 1, 2),
         |agg AS (
         |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS a_grams,
         |    CAST(sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT) AS a_dup
         |  FROM cnt GROUP BY 1)
         |SELECT d.doc_id,
         |  coalesce(a.a_grams, 0) AS n_grams,
         |  coalesce(a.a_dup, 0) AS n_dup_grams,
         |  CASE WHEN a.a_grams > 0 THEN CAST(a.a_dup AS DOUBLE) / a.a_grams
         |       END AS dup_ratio
         |FROM documents d LEFT JOIN agg a USING (doc_id)
         |ORDER BY d.doc_id""",
      "Quality: duplicated-n-gram fraction (repetition filter)") { (s, d) =>
      TextOps.dupNgramStats(Tables(s, d, "documents")).orderBy("doc_id")
    },

    // Rare-term salience: per-doc top-3 terms by tf·N/df (TF-IDF's rank
    // without ln — not bit-stable cross-engine; one integer product +
    // one double division is). Ties (score desc, term asc).
    oracle(
      "q69_rare_terms",
      s"""WITH tf AS (
         |  SELECT doc_id, unnest(tk) AS t FROM ($TK)),
         |tfc AS (SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf
         |        FROM tf GROUP BY 1, 2),
         |dfc AS (SELECT t, CAST(count(*) AS BIGINT) AS df FROM tfc GROUP BY 1),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
         |scored AS (
         |  SELECT doc_id, t, tf, df,
         |    CAST(tf * n_docs AS DOUBLE) / df AS score
         |  FROM tfc JOIN dfc USING (t) CROSS JOIN n),
         |rk AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
         |         ORDER BY score DESC, t) AS BIGINT) AS rk FROM scored)
         |SELECT doc_id, rk, t, tf, df, score FROM rk WHERE rk <= 3
         |ORDER BY doc_id, rk""",
      "Text analysis: per-doc top-k rare-term salience (log-free TF-IDF rank)") { (s, d) =>
      TextOps.rareTerms(Tables(s, d, "documents")).orderBy("doc_id", "rk")
    },

    // Per-source quota cap — the mixing-weights half of sampling: each
    // source contributes its `quota` lowest-hash documents, a pure
    // function of (source, doc_id) — stable across runs, partitionings,
    // and corpus growth in at-quota sources.
    oracle(
      "q70_source_quota",
      s"""WITH rk AS (
         |  SELECT doc_id, source,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY source
         |      ORDER BY ${h60d("'mix:' || doc_id")}, doc_id) AS BIGINT) AS mix_rank
         |  FROM documents)
         |SELECT doc_id, source, mix_rank FROM rk WHERE mix_rank <= 10
         |ORDER BY doc_id""",
      "Sampling: deterministic per-source quota cap (data mixing)") { (s, d) =>
      graft.operators.SampleOps.sourceQuota(
          Tables(s, d, "documents"), "source", "doc_id", quota = 10L)
        .select("doc_id", "source", "mix_rank")
        .orderBy("doc_id")
    },

    // PII redaction: emails then long digit runs, with per-pattern
    // counts. Every 7th doc gets deterministic fabricated PII appended
    // so the patterns actually fire; the oracle fabricates and redacts
    // identically (Java ≡ RE2 on the lookaround-free common subset).
    oracle(
      "q71_pii_redaction",
      """WITH aug AS (
        |  SELECT doc_id,
        |    coalesce(text, '') || CASE WHEN doc_id % 7 = 0
        |      THEN ' contact user' || doc_id || '@mail.example ref '
        |           || (doc_id * 37 + 1000000)
        |      ELSE '' END AS text
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
        |    AS n_emails,
        |  -- counts-as-seen: the number pass counts over the
        |  -- email-redacted text, so counts always equal placements
        |  CAST(len(regexp_extract_all(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '[0-9]{6,}')) AS BIGINT) AS n_long_numbers,
        |  regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '[0-9]{6,}', '<NUM>', 'g') AS redacted_text
        |FROM aug ORDER BY doc_id""",
      "Quality: ordered PII-pattern redaction with per-pattern counts") { (s, d) =>
      val aug = Tables.byOrder(s, d, "documents", "doc_id").select(col("doc_id"),
        concat(coalesce(col("text"), lit("")),
          when(col("doc_id") % 7 === 0,
            concat(lit(" contact user"), col("doc_id"),
              lit("@mail.example ref "), col("doc_id") * 37 + 1000000L))
            .otherwise(lit(""))).as("text"))
      TextOps.redacted(aug)
        .select("doc_id", "n_emails", "n_long_numbers", "redacted_text")
        .orderBy("doc_id")
    },

    // Symmetric int8 embedding quantization: per-vector max-abs/127
    // scale, clamp(floor(x/scale + 0.5), ±127) codes (one deterministic
    // formula — engine round() tie semantics differ), sequential-fold
    // reconstruction MSE. q_codes serializes EVERY code in position
    // order, so the hash compare pins each quantized value exactly
    // (sum_q_abs alone is permutation/compensation-blind); mse pins the
    // double arithmetic.
    oracle(
      "q72_int8_quant",
      """SELECT vec_id,
        |  CAST(len(embedding) AS BIGINT) AS n_dims,
        |  qscale,
        |  array_to_string(qvec, ',') AS q_codes,
        |  CAST(list_reduce([0] || list_transform(qvec, q -> abs(q)),
        |    (a, q) -> a + q) AS BIGINT) AS sum_q_abs,
        |  CASE WHEN len(embedding) = 0 THEN NULL ELSE
        |    list_reduce([CAST(0.0 AS DOUBLE)] ||
        |      list_transform(range(1, len(embedding) + 1), i ->
        |        (CAST(embedding[CAST(i AS INT)] AS DOUBLE) - qvec[CAST(i AS INT)] * qscale)
        |          * (CAST(embedding[CAST(i AS INT)] AS DOUBLE) - qvec[CAST(i AS INT)] * qscale)),
        |      (a, e) -> a + e) / len(embedding)
        |  END AS mse
        |FROM (
        |  SELECT vec_id, embedding, qscale,
        |    CASE WHEN qscale = 0.0 THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
        |    ELSE list_transform(embedding, x ->
        |      CAST(greatest(-127.0, least(127.0,
        |        floor(CAST(x AS DOUBLE) / qscale + 0.5))) AS BIGINT)) END AS qvec
        |  FROM (
        |    SELECT vec_id, embedding,
        |      list_reduce([CAST(0.0 AS DOUBLE)] ||
        |        list_transform(embedding, x -> abs(CAST(x AS DOUBLE))),
        |        (a, b) -> greatest(a, b)) / CAST(127.0 AS DOUBLE) AS qscale
        |    FROM embeddings))
        |ORDER BY vec_id""",
      "Embeddings: symmetric int8 quantization with exact reconstruction MSE") { (s, d) =>
      SimOps.int8Quantized(Tables.byOrder(s, d, "embeddings", "vec_id"))
        .withColumn("q_codes", array_join(col("qvec"), ","))
        .select("vec_id", "n_dims", "qscale", "q_codes", "sum_q_abs", "mse")
        .orderBy("vec_id")
    })
}
