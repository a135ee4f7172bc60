package graft.queries

import org.apache.spark.sql.functions.{coalesce, col, concat, expr, lit, when}

import graft.QueryDef, QueryDef.oracle
import graft.functions.CmsSketch
import graft.operators.{CurateOps, DedupOps, SampleOps, SimOps, TextOps}
import graft.sources.Tables
import TextOps.h60d

/** Corpus-curation additions: published quality-rule filters and the
  * ANN-quality evaluation loop. */
object CorpusQueries {

  /** DuckDB mirror of the q40/q41 norm + hyperplane-bucket CTE, with the
    * plane count as a parameter (q41 evaluates the production 12-bit
    * config; the recall eval intentionally runs a coarser one). */
  private def bucketCte(nBits: Int): String =
    s"""e AS (
       |  SELECT vec_id, embedding,
       |    sqrt(list_reduce([0.0::DOUBLE] || list_transform(range(1, len(embedding)+1),
       |      i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE), (acc,x) -> acc + x)) AS norm,
       |    list_reduce([0::BIGINT] || list_transform(range(0, $nBits), j ->
       |      CASE WHEN list_reduce([0.0::DOUBLE] ||
       |             list_transform(range(1, len(embedding)+1),
       |               i -> embedding[i]::DOUBLE
       |                    * ((${h60d("i::VARCHAR || '_' || j::VARCHAR")} % 2001 - 1000) / 1000.0)),
       |             (acc, x) -> acc + x) >= 0.0
       |           THEN CAST(power(2.0, j) AS BIGINT) ELSE 0 END),
       |      (acc, x) -> acc + x) AS bucket
       |  FROM embeddings)""".stripMargin

  /** DuckDB mirror of the native `winnow_fingerprints(tk, 3, 4)` scan:
    * CTEs ending in `fp(doc_id, spos, h)` \u2014 every k-gram hash, the
    * rightmost-min pick per w-window, distinct selected positions
    * (shared by q95's census and q98's containment pairs). */
  private def winnowCte: String =
    s"""tkx AS (
       |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       |hx AS (
       |  SELECT doc_id, tk, CAST(len(tk) AS BIGINT) AS n FROM tkx),
       |hh AS (
       |  SELECT doc_id, CAST(pos AS BIGINT) AS pos,
       |    ${h60d("array_to_string(tk[pos:pos+2], ' ')")} AS h
       |  FROM (SELECT doc_id, tk, unnest(range(1, n - 1)) AS pos
       |        FROM hx WHERE n >= 3)),
       |sel AS (
       |  SELECT doc_id, spos, h FROM (
       |    SELECT a.doc_id, b.pos AS spos, b.h,
       |      ROW_NUMBER() OVER (PARTITION BY a.doc_id, a.pos
       |        ORDER BY b.h ASC, b.pos DESC) AS rn
       |    FROM hh a JOIN hh b ON b.doc_id = a.doc_id
       |      AND b.pos BETWEEN a.pos - 3 AND a.pos
       |    WHERE a.pos >= 4) WHERE rn = 1),
       |fp AS (SELECT DISTINCT doc_id, spos, h FROM sel)""".stripMargin

  def defs: Seq[QueryDef] = Seq(

    oracle(
      "q75_gopher_rules",
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |base AS (
        |  SELECT doc_id, tk,
        |    CAST(len(tk) AS BIGINT) AS n_tokens,
        |    CAST(len(list_distinct(tk)) AS BIGINT) AS n_distinct,
        |    CAST(list_reduce([0::BIGINT] || list_transform(tk,
        |      t -> CAST(length(t) AS BIGINT)), (acc, t) -> acc + t) AS BIGINT) AS sum_len
        |  FROM tk),
        |w AS (SELECT doc_id, unnest(tk) AS t FROM tk),
        |wc AS (SELECT doc_id, t, count(*) AS c FROM w GROUP BY 1, 2),
        |topw AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS top_w FROM wc GROUP BY 1),
        |bgr AS (SELECT doc_id,
        |          unnest(list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])) AS g
        |        FROM tk),
        |bgc AS (SELECT doc_id, g, count(*) AS c FROM bgr GROUP BY 1, 2),
        |topb AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS top_b FROM bgc GROUP BY 1),
        |j AS (
        |  SELECT b.doc_id, b.n_tokens,
        |    1.0::DOUBLE - CAST(b.n_distinct AS DOUBLE) / CAST(b.n_tokens AS DOUBLE) AS dup_word_frac,
        |    CAST(tw.top_w AS DOUBLE) / CAST(b.n_tokens AS DOUBLE) AS top_word_share,
        |    CASE WHEN b.n_tokens > 1
        |         THEN CAST(coalesce(tb.top_b, 0) AS DOUBLE) / CAST(b.n_tokens - 1 AS DOUBLE)
        |         ELSE 0.0::DOUBLE END AS top_bigram_share,
        |    CAST(b.sum_len AS DOUBLE) / CAST(b.n_tokens AS DOUBLE) AS mean_word_len
        |  FROM base b JOIN topw tw USING (doc_id) LEFT JOIN topb tb USING (doc_id))
        |SELECT doc_id, n_tokens, dup_word_frac, top_word_share, top_bigram_share,
        |  mean_word_len,
        |  (mean_word_len >= 3.0::DOUBLE AND mean_word_len <= 10.0::DOUBLE
        |   AND dup_word_frac <= 0.6::DOUBLE AND top_word_share <= 0.125::DOUBLE
        |   AND top_bigram_share <= 0.06::DOUBLE) AS keep
        |FROM j ORDER BY doc_id""",
      "Quality: Gopher-style repetition rules + conjunctive keep flag") { (s, d) =>
      TextOps.gopherStats(Tables(s, d, "documents"))
        .orderBy("doc_id")
    },

    oracle(
      "q76_ann_recall",
      s"""WITH ${bucketCte(4)},
         |truth AS (
         |  SELECT q_id, n_id FROM (
         |    SELECT q.vec_id AS q_id, c.vec_id AS n_id,
         |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
         |        list_reduce([0.0::DOUBLE] || list_transform(range(1, len(q.embedding)+1),
         |          i -> q.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE), (acc,x) -> acc + x)
         |          / (q.norm * c.norm) DESC, c.vec_id) AS rank
         |    FROM e q JOIN e c ON q.vec_id < 50 AND q.vec_id <> c.vec_id)
         |  WHERE rank <= 5),
         |cand AS (
         |  SELECT l.vec_id AS q_id, r.vec_id AS n_id
         |  FROM e l JOIN e r ON l.bucket = r.bucket AND l.vec_id <> r.vec_id
         |  WHERE l.vec_id < 50),
         |hits AS (
         |  SELECT t.q_id, CAST(count(*) AS BIGINT) AS n_hits
         |  FROM truth t JOIN cand c ON t.q_id = c.q_id AND t.n_id = c.n_id
         |  GROUP BY 1),
         |tt AS (SELECT q_id, CAST(count(*) AS BIGINT) AS n_truth FROM truth GROUP BY 1)
         |SELECT tt.q_id, tt.n_truth, coalesce(h.n_hits, 0)::BIGINT AS n_hits,
         |  CAST(coalesce(h.n_hits, 0) AS DOUBLE) / CAST(tt.n_truth AS DOUBLE) AS recall
         |FROM tt LEFT JOIN hits h USING (q_id)
         |ORDER BY tt.q_id""",
      "Similarity: LSH candidate recall@k vs exact brute-force top-k") { (s, d) =>
      // 4 bits (16 buckets): the coarse config whose recall is actually
      // informative on the near-orthogonal synthetic corpus \u2014 at 12 bits
      // no probe shares a bucket with any true neighbor and the eval
      // measures nothing but zero
      SimOps.annRecallAtK(Tables(s, d, "embeddings"), nBits = 4)
        .orderBy("q_id")
    },

    oracle(
      "q77_pair_calibration",
      s"""WITH sh AS (${NorthStarQueries.SH}),
         |sig AS (${NorthStarQueries.SIG()}),
         |bands AS (
         |  SELECT doc_id, unnest(range(0, 4)) AS band,
         |    unnest(list_transform(range(0, 4), b ->
         |      ${h60d("b::VARCHAR || '|' || array_to_string(sig[b*4+1 : b*4+4], ',')")})) AS bucket
         |  FROM sig WHERE sig[1] <> -1),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         |  FROM bands x JOIN bands y ON x.band = y.band AND x.bucket = y.bucket
         |  WHERE x.doc_id < y.doc_id),
         |pj AS (
         |  SELECT a, b,
         |    CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
         |      / len(list_distinct(sa.sh || sb.sh)) AS jaccard
         |  FROM cand
         |  JOIN sh sa ON sa.doc_id = a
         |  JOIN sh sb ON sb.doc_id = b),
         |g AS (
         |  SELECT CAST(floor(jaccard * 10.0::DOUBLE) AS BIGINT) AS bucket,
         |    CAST(count(*) AS BIGINT) AS n_pairs
         |  FROM pj GROUP BY 1)
         |SELECT bucket, n_pairs,
         |  CAST(sum(n_pairs) OVER (ORDER BY bucket DESC) AS BIGINT) AS cum_pairs
         |FROM g ORDER BY bucket""",
      "Dedup governance: Jaccard decile histogram over LSH candidates") { (s, d) =>
      DedupOps.pairCalibrationHistogram(Tables(s, d, "documents"))
        .orderBy("bucket")
    },

    oracle(
      "q78_source_overlap",
      s"""WITH sh AS (${NorthStarQueries.SH}),
         |sig AS (${NorthStarQueries.SIG()}),
         |bands AS (
         |  SELECT doc_id, unnest(range(0, 4)) AS band,
         |    unnest(list_transform(range(0, 4), b ->
         |      ${h60d("b::VARCHAR || '|' || array_to_string(sig[b*4+1 : b*4+4], ',')")})) AS bucket
         |  FROM sig WHERE sig[1] <> -1),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         |  FROM bands x JOIN bands y ON x.band = y.band AND x.bucket = y.bucket
         |  WHERE x.doc_id < y.doc_id),
         |pj AS (
         |  SELECT a, b,
         |    CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
         |      / len(list_distinct(sa.sh || sb.sh)) AS jaccard
         |  FROM cand
         |  JOIN sh sa ON sa.doc_id = a
         |  JOIN sh sb ON sb.doc_id = b)
         |SELECT least(da.source, db.source) AS source_lo,
         |  greatest(da.source, db.source) AS source_hi,
         |  CAST(count(*) AS BIGINT) AS n_pairs
         |FROM pj
         |JOIN documents da ON da.doc_id = pj.a
         |JOIN documents db ON db.doc_id = pj.b
         |WHERE jaccard >= 0.5::DOUBLE
         |GROUP BY 1, 2
         |ORDER BY 1, 2""",
      "Dedup governance: cross-source near-duplicate overlap matrix") { (s, d) =>
      DedupOps.sourceOverlapMatrix(Tables(s, d, "documents"))
        .orderBy("source_lo", "source_hi")
    },

    oracle(
      "q79_source_temperature",
      """WITH c AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs
        |  FROM documents GROUP BY 1),
        |t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total FROM c),
        |d AS (
        |  SELECT list_reduce(
        |    [0.0::DOUBLE] || list(sqrt(CAST(c.n_docs AS DOUBLE) / CAST(t.total AS DOUBLE))
        |      ORDER BY c.source),
        |    (a, x) -> a + x) AS denom
        |  FROM c, t)
        |SELECT c.source, c.n_docs,
        |  CAST(c.n_docs AS DOUBLE) / CAST(t.total AS DOUBLE) AS share,
        |  sqrt(CAST(c.n_docs AS DOUBLE) / CAST(t.total AS DOUBLE)) / d.denom AS weight,
        |  (sqrt(CAST(c.n_docs AS DOUBLE) / CAST(t.total AS DOUBLE)) / d.denom)
        |    / (CAST(c.n_docs AS DOUBLE) / CAST(t.total AS DOUBLE)) AS boost
        |FROM c, t, d
        |ORDER BY c.source""",
      "Mixing: temperature-scaled (alpha=0.5) source sampling weights") { (s, d) =>
      SampleOps.temperatureMixWeights(Tables(s, d, "documents"))
        .orderBy("source")
    },

    oracle(
      "q80_unigram_rarity",
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |w AS (SELECT doc_id, unnest(tk) AS t FROM tk),
        |tf AS (SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf FROM w GROUP BY 1, 2),
        |dft AS (SELECT t, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        |agg AS (
        |  SELECT tf.doc_id,
        |    CAST(sum(tf.tf * dft.df) AS BIGINT) AS sum_df,
        |    CAST(sum(tf.tf) AS BIGINT) AS n_tokens
        |  FROM tf JOIN dft USING (t) GROUP BY 1)
        |SELECT a.doc_id, a.n_tokens, a.sum_df,
        |  CAST(a.sum_df AS DOUBLE)
        |    / (CAST(a.n_tokens AS DOUBLE) * CAST(nd.n_docs AS DOUBLE)) AS mean_df_rate
        |FROM agg a, nd
        |ORDER BY a.doc_id""",
      "Quality: unigram-rarity score (log-free LM-perplexity surrogate)") { (s, d) =>
      TextOps.unigramRarity(Tables(s, d, "documents"))
        .orderBy("doc_id")
    },

    oracle(
      "q81_knn_graph",
      s"""WITH ${bucketCte(12)},
         |pairs AS (
         |  SELECT l.vec_id AS a, r.vec_id AS b,
         |    list_reduce([0.0::DOUBLE] || list_transform(range(1, len(l.embedding)+1),
         |      i -> l.embedding[i]::DOUBLE * r.embedding[i]::DOUBLE), (acc, x) -> acc + x)
         |      / (l.norm * r.norm) AS cosine
         |  FROM e l JOIN e r ON l.bucket = r.bucket AND l.vec_id < r.vec_id),
         |bi AS (
         |  SELECT a AS q_id, b AS n_id, cosine FROM pairs
         |  UNION ALL
         |  SELECT b AS q_id, a AS n_id, cosine FROM pairs)
         |SELECT q_id, n_id, cosine, rank FROM (
         |  SELECT q_id, n_id, cosine,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id
         |      ORDER BY cosine DESC, n_id) AS BIGINT) AS rank
         |  FROM bi)
         |WHERE rank <= 3
         |ORDER BY q_id, rank""",
      "Similarity: per-vector approximate KNN graph (LSH buckets, exact cosine)") { (s, d) =>
      SimOps.knnGraph(Tables(s, d, "embeddings"))
        .orderBy("q_id", "rank")
    },

    oracle(
      "q82_contamination_report",
      s"""WITH sh AS (${NorthStarQueries.SH}),
         |p AS (SELECT doc_id AS probe_id, unnest(sh) AS g FROM sh WHERE doc_id < 25),
         |c AS (SELECT s.doc_id, d.source, unnest(s.sh) AS g
         |      FROM sh s JOIN documents d USING (doc_id) WHERE s.doc_id >= 25)
         |SELECT p.probe_id, c.source,
         |  CAST(count(DISTINCT c.doc_id) AS BIGINT) AS n_docs_hit,
         |  CAST(count(*) AS BIGINT) AS n_hit_shingles
         |FROM c JOIN p USING (g)
         |GROUP BY 1, 2
         |ORDER BY 1, 2""",
      "Governance: per-(benchmark, source) contamination matrix") { (s, d) =>
      val docs = Tables(s, d, "documents")
      DedupOps.contaminationReport(
          corpus = docs.filter(col("doc_id") >= 25),
          probes = docs.filter(col("doc_id") < 25))
        .orderBy("probe_id", "source")
    },

    // The end-to-end curation decision: every rule's verdict per
    // document plus the conjunctive keep. The oracle is the four
    // already-proven rule oracles' CTEs assembled over one scan.
    oracle(
      "q83_curation_report",
      {
        val scoreCols = TextOps.langProfiles.map { case (l, ws) =>
          s"CAST(len(list_filter(tk, t -> list_contains([${ws.map(w => s"'$w'").mkString(",")}], t))) AS BIGINT) AS s_$l"
        }.mkString(",\n  ")
        s"""WITH RECURSIVE tkt AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
           |lang AS (
           |  SELECT doc_id, ${TextOps.langGuessSql} AS lang_guess FROM (
           |    SELECT doc_id, $scoreCols FROM tkt)),
           |base AS (
           |  SELECT doc_id, tk,
           |    CAST(len(tk) AS BIGINT) AS n_tokens,
           |    CAST(len(list_distinct(tk)) AS BIGINT) AS n_distinct,
           |    CAST(list_reduce([0::BIGINT] || list_transform(tk,
           |      t -> CAST(length(t) AS BIGINT)), (acc, t) -> acc + t) AS BIGINT) AS sum_len
           |  FROM tkt),
           |w AS (SELECT doc_id, unnest(tk) AS t FROM tkt),
           |wc AS (SELECT doc_id, t, count(*) AS c FROM w GROUP BY 1, 2),
           |topw AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS top_w FROM wc GROUP BY 1),
           |bgr AS (SELECT doc_id,
           |          unnest(list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])) AS g
           |        FROM tkt),
           |bgc AS (SELECT doc_id, g, count(*) AS c FROM bgr GROUP BY 1, 2),
           |topb AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS top_b FROM bgc GROUP BY 1),
           |gop AS (
           |  SELECT b.doc_id,
           |    (CAST(b.sum_len AS DOUBLE) / CAST(b.n_tokens AS DOUBLE) >= 3.0::DOUBLE
           |     AND CAST(b.sum_len AS DOUBLE) / CAST(b.n_tokens AS DOUBLE) <= 10.0::DOUBLE
           |     AND 1.0::DOUBLE - CAST(b.n_distinct AS DOUBLE) / CAST(b.n_tokens AS DOUBLE) <= 0.6::DOUBLE
           |     AND CAST(tw.top_w AS DOUBLE) / CAST(b.n_tokens AS DOUBLE) <= 0.125::DOUBLE
           |     AND (CASE WHEN b.n_tokens > 1
           |               THEN CAST(coalesce(tb.top_b, 0) AS DOUBLE) / CAST(b.n_tokens - 1 AS DOUBLE)
           |               ELSE 0.0::DOUBLE END) <= 0.06::DOUBLE) AS gopher_ok
           |  FROM base b JOIN topw tw USING (doc_id) LEFT JOIN topb tb USING (doc_id)),
           |cuts AS (
           |  SELECT lang, quantile_cont(n_chars, 0.05) AS len_lo,
           |         quantile_cont(n_chars, 0.95) AS len_hi
           |  FROM documents GROUP BY 1),
           |lenok AS (
           |  SELECT d.doc_id,
           |    (d.n_chars >= c.len_lo AND d.n_chars <= c.len_hi) AS length_ok
           |  FROM documents d JOIN cuts c USING (lang)),
           |sh0 AS (${NorthStarQueries.SH}),
           |shx AS (SELECT doc_id, unnest(sh) AS g FROM sh0),
           |hotg AS (SELECT g FROM shx GROUP BY g HAVING COUNT(*) > 25),
           |hotl AS (SELECT coalesce(list(g), CAST([] AS VARCHAR[])) AS hot
           |         FROM hotg),
           |sh AS (SELECT s.doc_id,
           |         list_filter(s.sh, g -> NOT list_contains(h.hot, g)) AS sh
           |       FROM sh0 s CROSS JOIN hotl h),
           |sig AS (${NorthStarQueries.SIG(16, "sh")}),
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
           |fin AS (SELECT id AS doc_id, min(r) AS keeper FROM reach GROUP BY id)
           |SELECT d.doc_id,
           |  l.lang_guess <> 'und' AS lang_ok,
           |  g.gopher_ok,
           |  coalesce(lo.length_ok, false) AS length_ok,
           |  (coalesce(f.keeper, d.doc_id) = d.doc_id) AS dedup_keeper,
           |  (l.lang_guess <> 'und' AND g.gopher_ok
           |   AND coalesce(lo.length_ok, false)
           |   AND coalesce(f.keeper, d.doc_id) = d.doc_id) AS kept
           |FROM documents d
           |JOIN lang l USING (doc_id)
           |JOIN gop g USING (doc_id)
           |LEFT JOIN lenok lo USING (doc_id)
           |LEFT JOIN fin f USING (doc_id)
           |ORDER BY d.doc_id""".stripMargin
      },
      "Curation: end-to-end per-rule verdicts + conjunctive keep") { (s, d) =>
      CurateOps.curationReport(Tables(s, d, "documents"),
        maxShingleDf = Some(25L))
        .orderBy("doc_id")
    },

    oracle(
      "q84_lsh_bucket_stats",
      s"""WITH sh AS (${NorthStarQueries.SH}),
         |sig AS (${NorthStarQueries.SIG()}),
         |bands AS (
         |  SELECT doc_id, unnest(range(0, 4)) AS band,
         |    unnest(list_transform(range(0, 4), b ->
         |      ${h60d("b::VARCHAR || '|' || array_to_string(sig[b*4+1 : b*4+4], ',')")})) AS bucket
         |  FROM sig WHERE sig[1] <> -1),
         |bc AS (SELECT band, bucket, CAST(count(*) AS BIGINT) AS c
         |       FROM bands GROUP BY 1, 2)
         |SELECT band, CAST(count(*) AS BIGINT) AS n_buckets,
         |  CAST(sum(c) AS BIGINT) AS n_docs,
         |  CAST(max(c) AS BIGINT) AS max_bucket,
         |  CAST(sum((c * (c - 1)) // 2) AS BIGINT) AS n_cand_pairs
         |FROM bc GROUP BY 1
         |ORDER BY band""",
      "Governance: per-band LSH bucket-health stats (hot-bucket early warning)") { (s, d) =>
      DedupOps.lshBucketStats(Tables(s, d, "documents"))
        .orderBy("band")
    },

    oracle(
      "q85_packing_report",
      """WITH tk AS (SELECT doc_id, lang, string_split(text, ' ') AS tk FROM documents),
        |p AS (
        |  SELECT doc_id, lang, CAST(len(tk) AS BIGINT) AS n_tokens,
        |    CAST(coalesce(sum(len(tk)) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) % 512 AS BIGINT) AS bin_offset
        |  FROM tk),
        |a AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |    CAST(max(n_tokens) AS BIGINT) AS max_doc_tokens,
        |    CAST(sum(CASE WHEN bin_offset + n_tokens > 512 THEN 1 ELSE 0 END) AS BIGINT) AS n_split_docs,
        |    CAST(sum(CASE WHEN n_tokens > 512 THEN 1 ELSE 0 END) AS BIGINT) AS n_over_budget
        |  FROM p GROUP BY 1)
        |SELECT lang, n_docs, total_tokens, max_doc_tokens, n_split_docs,
        |  n_over_budget,
        |  CAST((total_tokens + 511) // 512 AS BIGINT) AS n_bins,
        |  CAST(total_tokens AS DOUBLE)
        |    / (CAST((total_tokens + 511) // 512 AS DOUBLE) * CAST(512 AS DOUBLE)) AS fill_rate
        |FROM a ORDER BY lang""",
      "Packing: per-stream bin utilization + boundary-split report") { (s, d) =>
      TextOps.packingReport(Tables(s, d, "documents"))
        .orderBy("lang")
    },

    // Same probe/corpus split and EXACT same semantics as q62 \u2014 the
    // oracle is q62's SQL \u2014 but the Spark plan is the bloom-prefilter
    // scale path: the only thing broadcast is the 2 K-long bitset row,
    // the raw probe-shingle set never broadcasts, and false positives
    // die in the exact verify join (which is what keeps this
    // hash-checkable against an exact oracle).
    oracle(
      "q86_bloom_decontaminate",
      s"""WITH sh AS (${NorthStarQueries.SH}),
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
      "Dedup: bloom-prefilter decontamination (bitset broadcast, exact verify)") { (s, d) =>
      val docs = Tables(s, d, "documents")
      DedupOps.bloomDecontaminate(
          corpus = docs.filter(col("doc_id") >= 25),
          probes = docs.filter(col("doc_id") < 25))
        .orderBy("doc_id")
    },

    // DSIR-style data selection: src0 plays the curated target sample,
    // every other source is the raw corpus being scored. All-BIGINT
    // sufficient statistics; the one double expression runs in the
    // identical op order in both engines.
    oracle(
      "q87_target_affinity",
      s"""WITH tk AS (SELECT doc_id, source, string_split(text, ' ') AS tk FROM documents),
         |feats AS (
         |  SELECT doc_id, source, unnest(tk || CASE WHEN len(tk) > 1
         |      THEN list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])
         |      ELSE CAST([] AS VARCHAR[]) END) AS f
         |  FROM tk),
         |fb AS (SELECT doc_id, source, ${h60d("f")} % 4096 AS b FROM feats),
         |db AS (SELECT doc_id, b, CAST(count(*) AS BIGINT) AS c
         |       FROM fb WHERE source <> 'src0' GROUP BY 1, 2),
         |rb AS (SELECT b, CAST(sum(c) AS BIGINT) AS r FROM db GROUP BY 1),
         |tb AS (SELECT b, CAST(count(*) AS BIGINT) AS t
         |       FROM fb WHERE source = 'src0' GROUP BY 1),
         |tot AS (SELECT (SELECT CAST(sum(t) AS BIGINT) FROM tb) AS tot_t,
         |               (SELECT CAST(sum(r) AS BIGINT) FROM rb) AS tot_r),
         |agg AS (
         |  SELECT db.doc_id, CAST(sum(db.c) AS BIGINT) AS n_feats,
         |    CAST(sum(db.c * coalesce(tb.t, 0)) AS BIGINT) AS sum_ct,
         |    CAST(sum(db.c * rb.r) AS BIGINT) AS sum_cr
         |  FROM db LEFT JOIN tb USING (b) JOIN rb USING (b) GROUP BY 1)
         |SELECT a.doc_id, a.n_feats, a.sum_ct, a.sum_cr,
         |  (CAST(a.sum_ct AS DOUBLE) * CAST(tot.tot_r AS DOUBLE))
         |    / (CAST(a.sum_cr AS DOUBLE) * CAST(tot.tot_t AS DOUBLE)) AS affinity
         |FROM agg a, tot ORDER BY a.doc_id""",
      "Selection: DSIR-style hashed unigram+bigram target-affinity score") { (s, d) =>
      val docs = Tables(s, d, "documents")
      TextOps.targetAffinity(
          corpus = docs.filter(col("source") =!= "src0"),
          target = docs.filter(col("source") === "src0"))
        .orderBy("doc_id")
    },

    // Integer fixed-point PageRank over q81's KNN graph, two unrolled
    // iterations. Everything in the iteration is BIGINT (// division,
    // exact sums), so the oracle replays it bit-for-bit; dangling mass
    // is dropped by both engines identically.
    oracle(
      "q89_knn_pagerank",
      s"""WITH ${bucketCte(12)},
         |pairs AS (
         |  SELECT l.vec_id AS a, r.vec_id AS b,
         |    list_reduce([0.0::DOUBLE] || list_transform(range(1, len(l.embedding)+1),
         |      i -> l.embedding[i]::DOUBLE * r.embedding[i]::DOUBLE), (acc, x) -> acc + x)
         |      / (l.norm * r.norm) AS cosine
         |  FROM e l JOIN e r ON l.bucket = r.bucket AND l.vec_id < r.vec_id),
         |bi AS (
         |  SELECT a AS q_id, b AS n_id, cosine FROM pairs
         |  UNION ALL
         |  SELECT b AS q_id, a AS n_id, cosine FROM pairs),
         |knn AS (
         |  SELECT q_id AS src, n_id AS dst FROM (
         |    SELECT q_id, n_id,
         |      ROW_NUMBER() OVER (PARTITION BY q_id
         |        ORDER BY cosine DESC, n_id) AS rank
         |    FROM bi)
         |  WHERE rank <= 3),
         |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM knn GROUP BY 1),
         |n AS (SELECT vec_id FROM embeddings),
         |r0 AS (SELECT vec_id, CAST(1000000 AS BIGINT) AS r FROM n),
         |i1 AS (SELECT k.dst, CAST(sum(r.r // d.outdeg) AS BIGINT) AS inflow
         |       FROM knn k JOIN deg d USING (src) JOIN r0 r ON r.vec_id = k.src
         |       GROUP BY 1),
         |r1 AS (SELECT n.vec_id,
         |         CAST(150000 + (85 * coalesce(i1.inflow, 0)) // 100 AS BIGINT) AS r
         |       FROM n LEFT JOIN i1 ON i1.dst = n.vec_id),
         |i2 AS (SELECT k.dst, CAST(sum(r.r // d.outdeg) AS BIGINT) AS inflow
         |       FROM knn k JOIN deg d USING (src) JOIN r1 r ON r.vec_id = k.src
         |       GROUP BY 1),
         |r2 AS (SELECT n.vec_id,
         |         CAST(150000 + (85 * coalesce(i2.inflow, 0)) // 100 AS BIGINT) AS r
         |       FROM n LEFT JOIN i2 ON i2.dst = n.vec_id)
         |SELECT vec_id, r AS pagerank_micro,
         |  CAST(r AS DOUBLE) / 1000000.0::DOUBLE AS pagerank
         |FROM r2 ORDER BY vec_id""",
      "Graph: integer fixed-point PageRank over the KNN graph") { (s, d) =>
      graft.operators.GraphOps.knnPageRank(Tables(s, d, "embeddings"))
        .orderBy("vec_id")
    },

    // MMDS s-curve planner over q77's measured decile histogram. The
    // powers are sequential multiplication folds and the per-config
    // total folds deciles in bucket order \u2014 identical double op order
    // in both engines, so even the rates hash-match.
    oracle(
      "q90_banding_planner",
      s"""WITH sh AS (${NorthStarQueries.SH}),
         |sig AS (${NorthStarQueries.SIG()}),
         |bands AS (
         |  SELECT doc_id, unnest(range(0, 4)) AS band,
         |    unnest(list_transform(range(0, 4), b ->
         |      ${h60d("b::VARCHAR || '|' || array_to_string(sig[b*4+1 : b*4+4], ',')")})) AS bucket
         |  FROM sig WHERE sig[1] <> -1),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         |  FROM bands x JOIN bands y ON x.band = y.band AND x.bucket = y.bucket
         |  WHERE x.doc_id < y.doc_id),
         |pj AS (
         |  SELECT a, b,
         |    CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
         |      / len(list_distinct(sa.sh || sb.sh)) AS jaccard
         |  FROM cand
         |  JOIN sh sa ON sa.doc_id = a
         |  JOIN sh sb ON sb.doc_id = b),
         |g AS (
         |  SELECT CAST(floor(jaccard * 10.0::DOUBLE) AS BIGINT) AS bucket,
         |    CAST(count(*) AS BIGINT) AS n_pairs
         |  FROM pj GROUP BY 1),
         |cfg AS (SELECT * FROM (VALUES (1, 16), (2, 8), (4, 4), (8, 2), (16, 1))
         |        AS t(bands, rows_per_band)),
         |x AS (
         |  SELECT g.bucket, g.n_pairs, c.bands, c.rows_per_band,
         |    least(CAST(2 * g.bucket + 1 AS DOUBLE) / CAST(20 AS DOUBLE),
         |      1.0::DOUBLE) AS s
         |  FROM g CROSS JOIN cfg c),
         |y AS (
         |  SELECT bucket, n_pairs, bands, rows_per_band,
         |    1.0::DOUBLE - list_reduce([1.0::DOUBLE] ||
         |      list_transform(range(1, bands + 1), i -> 1.0::DOUBLE -
         |        list_reduce([1.0::DOUBLE] ||
         |          list_transform(range(1, rows_per_band + 1), j -> s),
         |          (a2, z) -> a2 * z)),
         |      (acc, w) -> acc * w) AS p_detect
         |  FROM x),
         |z AS (SELECT bucket, n_pairs, bands, rows_per_band,
         |        CAST(n_pairs AS DOUBLE) * p_detect AS ed FROM y),
         |f AS (
         |  SELECT bands, rows_per_band, CAST(sum(n_pairs) AS BIGINT) AS n_pairs,
         |    list_reduce([0.0::DOUBLE] || list(ed ORDER BY bucket),
         |      (acc, v) -> acc + v) AS expected_detected
         |  FROM z GROUP BY 1, 2)
         |SELECT bands, rows_per_band, n_pairs, expected_detected,
         |  expected_detected / CAST(n_pairs AS DOUBLE) AS detect_rate
         |FROM f ORDER BY bands, rows_per_band""",
      "Dedup governance: s-curve banding planner over the measured histogram") { (s, d) =>
      DedupOps.bandingPlanner(Tables(s, d, "documents"))
        .orderBy("bands", "rows_per_band")
    },

    // Content-defined chunking: boundary after token i when the md5
    // hash of the trailing 4-token window divides 8. DuckDB's seg_idx
    // (unfiltered k with a WHERE) may skip the one empty span a
    // boundary-at-n leaves, vs Spark's contiguous posexplode index \u2014
    // seg_idx only ORDERS (tie-break + reassembly), never outputs, and
    // relative order is identical, so results hash-match.
    oracle(
      "q91_cdc_segment_dedup",
      s"""WITH tks AS (SELECT doc_id, tk, len(tk) AS n FROM (${NorthStarQueries.TK})),
         |b AS (
         |  SELECT doc_id, tk, n,
         |    list_filter(range(4, n + 1),
         |      i -> (${h60d("array_to_string(tk[i-3:i], ' ')")}) % 8 = 0) AS bnd
         |  FROM tks),
         |sp AS (
         |  SELECT doc_id, tk,
         |    [1] || list_transform(bnd, x -> x + 1) AS starts,
         |    bnd || [n] AS ends
         |  FROM b),
         |sg AS (
         |  SELECT doc_id, k AS seg_idx,
         |    array_to_string(tk[starts[k]:ends[k]], ' ') AS seg_text
         |  FROM (SELECT doc_id, tk, starts, ends,
         |          unnest(range(1, len(starts) + 1)) AS k
         |        FROM sp)
         |  WHERE starts[k] <= ends[k]),
         |dd AS (
         |  SELECT doc_id, seg_idx, seg_text,
         |    ROW_NUMBER() OVER (PARTITION BY seg_text
         |      ORDER BY doc_id, seg_idx) AS rk
         |  FROM sg),
         |kp AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept_segments,
         |    string_agg(seg_text, ' ' ORDER BY seg_idx) AS kept_text
         |  FROM dd WHERE rk = 1 GROUP BY 1),
         |tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segments
         |        FROM sg GROUP BY 1)
         |SELECT d.doc_id,
         |  coalesce(t.n_segments, 0) AS n_segments,
         |  coalesce(k.n_kept_segments, 0) AS n_kept_segments,
         |  coalesce(k.kept_text, '') AS kept_text
         |FROM documents d
         |LEFT JOIN tot t ON t.doc_id = d.doc_id
         |LEFT JOIN kp k ON k.doc_id = d.doc_id
         |ORDER BY d.doc_id""",
      "Dedup: content-defined-chunking segment dedup (insertion-robust)") { (s, d) =>
      DedupOps.cdcSegmentDedup(Tables(s, d, "documents"))
        .orderBy("doc_id")
    },

    // Neighborhood label audit: each embedding's KNN neighbors vote
    // with their documents' lang labels (vec_id \u2261 doc_id in the driver
    // tables); a vector whose own label loses the vote is a
    // mislabel/outlier lead. Majority ties break by label ascending \u2014
    // bit-deterministic, and NULL (not false) when a vector has no
    // bucket neighbors.
    oracle(
      "q92_label_coherence",
      s"""WITH ${bucketCte(12)},
         |pairs AS (
         |  SELECT l.vec_id AS a, r.vec_id AS b,
         |    list_reduce([0.0::DOUBLE] || list_transform(range(1, len(l.embedding)+1),
         |      i -> l.embedding[i]::DOUBLE * r.embedding[i]::DOUBLE), (acc, x) -> acc + x)
         |      / (l.norm * r.norm) AS cosine
         |  FROM e l JOIN e r ON l.bucket = r.bucket AND l.vec_id < r.vec_id),
         |bi AS (
         |  SELECT a AS q_id, b AS n_id, cosine FROM pairs
         |  UNION ALL
         |  SELECT b AS q_id, a AS n_id, cosine FROM pairs),
         |knn AS (
         |  SELECT q_id AS src, n_id AS dst FROM (
         |    SELECT q_id, n_id,
         |      ROW_NUMBER() OVER (PARTITION BY q_id
         |        ORDER BY cosine DESC, n_id) AS rank
         |    FROM bi)
         |  WHERE rank <= 3),
         |lb AS (
         |  SELECT e.vec_id, d.lang AS label
         |  FROM (SELECT DISTINCT vec_id FROM embeddings) e
         |  JOIN documents d ON d.doc_id = e.vec_id),
         |v AS (SELECT k.src AS q_id, l.label AS n_label,
         |        CAST(count(*) AS BIGINT) AS c
         |      FROM knn k JOIN lb l ON l.vec_id = k.dst GROUP BY 1, 2),
         |mj AS (SELECT q_id, n_label AS majority_label FROM (
         |        SELECT q_id, n_label,
         |          ROW_NUMBER() OVER (PARTITION BY q_id
         |            ORDER BY c DESC, n_label) AS rn
         |        FROM v) WHERE rn = 1),
         |st AS (SELECT v.q_id,
         |         CAST(sum(v.c) AS BIGINT) AS nn,
         |         CAST(sum(CASE WHEN v.n_label = o.label THEN v.c ELSE 0 END)
         |           AS BIGINT) AS na
         |       FROM v JOIN lb o ON o.vec_id = v.q_id GROUP BY 1)
         |SELECT l.vec_id, l.label,
         |  coalesce(s.nn, 0) AS n_neighbors,
         |  coalesce(s.na, 0) AS n_agree,
         |  m.majority_label,
         |  l.label = m.majority_label AS coherent
         |FROM lb l
         |LEFT JOIN st s ON s.q_id = l.vec_id
         |LEFT JOIN mj m ON m.q_id = l.vec_id
         |ORDER BY l.vec_id""",
      "Graph: KNN neighborhood label-coherence audit (mislabel leads)") { (s, d) =>
      val docs = Tables(s, d, "documents")
      val emb = Tables(s, d, "embeddings")
      graft.operators.GraphOps.labelCoherence(emb,
          emb.select("vec_id").distinct()
            .join(docs.select(col("doc_id").as("vec_id"), col("lang").as("label")), Seq("vec_id")))
        .orderBy("vec_id")
    },

    // Hard-negative mining: for each probe, the m highest-cosine vectors
    // with a DIFFERENT label \u2014 q39's bounded-probe-broadcast shape plus
    // the label guard (which also subsumes q_id <> n_id).
    oracle(
      "q94_hard_negatives",
      """WITH e AS (
        |  SELECT vec_id, embedding, label,
        |    sqrt(list_reduce([0.0::DOUBLE] || list_transform(range(1, len(embedding)+1),
        |      i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE), (acc,x) -> acc + x)) AS norm
        |  FROM embeddings),
        |scored AS (
        |  SELECT q.vec_id AS q_id, q.label AS q_label,
        |    c.vec_id AS n_id, c.label AS n_label,
        |    list_reduce([0.0::DOUBLE] || list_transform(range(1, len(q.embedding)+1),
        |      i -> q.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE), (acc,x) -> acc + x)
        |      / (q.norm * c.norm) AS cosine
        |  FROM e q JOIN e c ON q.vec_id < 50 AND c.label <> q.label),
        |ranked AS (
        |  SELECT q_id, q_label, n_id, n_label, cosine,
        |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) AS rank
        |  FROM scored)
        |SELECT q_id, q_label, n_id, n_label, rank, cosine
        |FROM ranked WHERE rank <= 5
        |ORDER BY q_id, rank""",
      "Similarity: hard-negative mining (top-m confusable different-label)") { (s, d) =>
      SimOps.hardNegatives(Tables(s, d, "embeddings"))
        .orderBy("q_id", "rank")
    },

    // Winnowed fingerprint census (k=3 token-grams, w=4 hash windows):
    // the oracle replays the selection relationally \u2014 every k-gram hash,
    // a w-window rightmost-min pick per window position, distinct
    // selected positions. bit_xor is the order-free set checksum.
    oracle(
      "q95_winnow_fingerprints",
      s"""WITH $winnowCte,
         |ag AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fp,
         |    min(h) AS fp_min, max(h) AS fp_max, bit_xor(h) AS fp_xor
         |  FROM fp GROUP BY 1),
         |base AS (
         |  SELECT doc_id, greatest(n - 2, CAST(0 AS BIGINT)) AS n_kgrams FROM hx)
         |SELECT b.doc_id, b.n_kgrams,
         |  coalesce(a.n_fp, 0) AS n_fp, a.fp_min, a.fp_max, a.fp_xor,
         |  CASE WHEN b.n_kgrams > 0
         |    THEN coalesce(a.n_fp, 0) * 1000000 // b.n_kgrams
         |    ELSE 0 END AS density_ppm
         |FROM base b LEFT JOIN ag a USING (doc_id)
         |ORDER BY b.doc_id""",
      "Dedup: winnowed fingerprint census (SIGMOD'03 local fingerprinting)") { (s, d) =>
      DedupOps.winnowStats(Tables(s, d, "documents"))
        .orderBy("doc_id")
    },

    // Bigram-surprise LM scoring: per-occurrence surprise is the integer
    // ratio of the first word's corpus count to the bigram's corpus
    // count (micro-units, floored); the doc score is the integer mean.
    oracle(
      "q96_bigram_surprise",
      """WITH tkx AS (
        |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |bg AS (
        |  SELECT doc_id, tk[i] AS w1, tk[i+1] AS w2
        |  FROM (SELECT doc_id, tk, unnest(range(1, len(tk))) AS i
        |        FROM tkx WHERE len(tk) > 1)),
        |c2 AS (
        |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2 FROM bg GROUP BY 1, 2),
        |c1 AS (
        |  SELECT t, CAST(count(*) AS BIGINT) AS c1
        |  FROM (SELECT unnest(tk) AS t FROM tkx) GROUP BY 1),
        |sc AS (
        |  SELECT b.doc_id, (c1.c1 * 1000000) // c2.c2 AS s
        |  FROM bg b
        |  JOIN c2 ON c2.w1 = b.w1 AND c2.w2 = b.w2
        |  JOIN c1 ON c1.t = b.w1),
        |ag AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |    CAST(sum(s) AS BIGINT) AS ss
        |  FROM sc GROUP BY 1)
        |SELECT d.doc_id, coalesce(a.n_bigrams, 0) AS n_bigrams,
        |  CASE WHEN a.n_bigrams > 0 THEN a.ss // a.n_bigrams ELSE 0 END
        |    AS surprise_fp
        |FROM documents d LEFT JOIN ag a USING (doc_id)
        |ORDER BY d.doc_id""",
      "Text: bigram-surprise LM quality score (log-free fixed point)") { (s, d) =>
      TextOps.bigramSurprise(Tables(s, d, "documents"))
        .orderBy("doc_id")
    },

    // Per-source total-variation drift from the corpus unigram
    // distribution; absent-term mass reconstructed via the corpus
    // constant Q instead of a |vocab| x |sources| join.
    oracle(
      "q97_source_drift",
      """WITH st AS (
        |  SELECT source, t, CAST(count(*) AS BIGINT) AS st
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS t
        |        FROM documents) GROUP BY 1, 2),
        |ct AS (SELECT t, CAST(sum(st) AS BIGINT) AS ct FROM st GROUP BY 1),
        |tot AS (SELECT CAST(sum(ct) AS BIGINT) AS tt FROM ct),
        |qf AS (SELECT t, (ct * 1000000) // tt AS q_fp FROM ct CROSS JOIN tot),
        |qq AS (SELECT CAST(sum(q_fp) AS BIGINT) AS qq FROM qf),
        |ss AS (SELECT source, CAST(sum(st) AS BIGINT) AS s_tokens
        |       FROM st GROUP BY 1),
        |pc AS (
        |  SELECT st.source, ss.s_tokens,
        |    abs((st.st * 1000000) // ss.s_tokens - qf.q_fp) AS a,
        |    qf.q_fp
        |  FROM st JOIN qf USING (t) JOIN ss USING (source)),
        |ag AS (
        |  SELECT source, max(s_tokens) AS n_tokens,
        |    CAST(sum(a) AS BIGINT) AS sum_abs, CAST(sum(q_fp) AS BIGINT) AS sum_q
        |  FROM pc GROUP BY 1)
        |SELECT a.source, a.n_tokens,
        |  (a.sum_abs + (q.qq - a.sum_q)) // 2 AS tv_ppm
        |FROM ag a CROSS JOIN qq q
        |ORDER BY a.source""",
      "Text: per-source total-variation drift vs corpus unigram distribution") { (s, d) =>
      TextOps.sourceDrift(Tables(s, d, "documents"))
        .orderBy("source")
    },

    // Near-containment pairs: docs sharing >= 2 winnowed fingerprints
    // (set semantics), with per-side containment in micro-units \u2014 the
    // asymmetric signal symmetric Jaccard misses.
    oracle(
      "q98_winnow_containment",
      s"""WITH $winnowCte,
         |fps AS (SELECT DISTINCT doc_id, h FROM fp),
         |nfp AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fp FROM fps GROUP BY 1),
         |pairs AS (
         |  SELECT x.doc_id AS a, y.doc_id AS b, CAST(count(*) AS BIGINT) AS shared
         |  FROM fps x JOIN fps y ON x.h = y.h AND x.doc_id < y.doc_id
         |  GROUP BY 1, 2
         |  HAVING count(*) >= 2)
         |SELECT p.a, p.b, p.shared, na.n_fp AS n_fp_a, nb.n_fp AS n_fp_b,
         |  (p.shared * 1000000) // na.n_fp AS cont_a_ppm,
         |  (p.shared * 1000000) // nb.n_fp AS cont_b_ppm
         |FROM pairs p
         |JOIN nfp na ON na.doc_id = p.a
         |JOIN nfp nb ON nb.doc_id = p.b
         |ORDER BY p.a, p.b""",
      "Dedup: winnow-fingerprint near-containment pairs (asymmetric overlap)") { (s, d) =>
      DedupOps.winnowContainmentPairs(Tables(s, d, "documents"))
        .orderBy("a", "b")
    },

    // Feature-hashed doc vectors (dim=16): signed occurrence sums per
    // hashed dimension, stringified per the q35 array convention.
    oracle(
      "q99_hashed_doc_vectors",
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
         |sj AS (
         |  SELECT doc_id,
         |    ${h60d("t")} % 16 AS j,
         |    1 - 2 * (${h60d("'s_' || t")} % 2) AS sgn
         |  FROM tok),
         |ag AS (
         |  SELECT doc_id, j, CAST(sum(sgn) AS BIGINT) AS v,
         |    CAST(count(*) AS BIGINT) AS c
         |  FROM sj GROUP BY 1, 2),
         |nt AS (
         |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens FROM ag GROUP BY 1),
         |grid AS (
         |  SELECT d.doc_id, g.j FROM (SELECT DISTINCT doc_id FROM documents) d
         |  CROSS JOIN (SELECT unnest(range(0, 16)) AS j) g),
         |vec AS (
         |  SELECT g.doc_id, g.j, coalesce(a.v, 0) AS v
         |  FROM grid g LEFT JOIN ag a ON a.doc_id = g.doc_id AND a.j = g.j)
         |SELECT n.doc_id, n.n_tokens,
         |  (SELECT string_agg(v.v::VARCHAR, ',' ORDER BY v.j)
         |   FROM vec v WHERE v.doc_id = n.doc_id) AS vec_str
         |FROM nt n
         |ORDER BY n.doc_id""",
      "Text: feature-hashed doc vectors (ICML'09 hashing trick)") { (s, d) =>
      TextOps.hashedDocVector(Tables(s, d, "documents"))
        .orderBy("doc_id")
    },

    // The pretraining data-recipe table: token-share temperature
    // weights, planned allocation of a 1M-token budget, repeat factor.
    oracle(
      "q100_data_recipe",
      """WITH c AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_tokens
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS t
        |        FROM documents) GROUP BY 1),
        |t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total FROM c),
        |d AS (
        |  SELECT list_reduce(
        |    [0.0::DOUBLE] || list(sqrt(CAST(c.n_tokens AS DOUBLE) / CAST(t.total AS DOUBLE))
        |      ORDER BY c.source),
        |    (a, x) -> a + x) AS denom
        |  FROM c, t),
        |w AS (
        |  SELECT c.source, c.n_tokens,
        |    sqrt(CAST(c.n_tokens AS DOUBLE) / CAST(t.total AS DOUBLE)) / d.denom AS weight
        |  FROM c, t, d),
        |p AS (
        |  SELECT source, n_tokens, weight,
        |    CAST(floor(CAST(1000000 AS DOUBLE) * weight) AS BIGINT) AS planned_tokens
        |  FROM w)
        |SELECT source, n_tokens, weight, planned_tokens,
        |  (planned_tokens * 1000000) // n_tokens AS epochs_ppm
        |FROM p
        |ORDER BY source""",
      "Mixing: pretraining data-recipe table (token budget 1M)") { (s, d) =>
      SampleOps.dataRecipe(Tables(s, d, "documents"), budget = 1000000L)
        .orderBy("source")
    },

    // Exact duplicated-span census (Lee et al. 2022 EXACTSUBSTR): every
    // 10-token window hashed; occurrences of a corpus-duplicated window
    // other than its canonical first (min (doc_id, pos)) mark their
    // positions; marked windows merge into maximal spans
    // (gaps-and-islands). All-integer counts + one double division.
    oracle(
      "q101_dup_spans",
      s"""WITH tkx AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
         |base AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens, tk FROM tkx),
         |wins AS (
         |  SELECT doc_id, CAST(pos AS BIGINT) AS pos,
         |    ${h60d("array_to_string(tk[pos:pos+9], ' ')")} AS h
         |  FROM (SELECT doc_id, tk, unnest(range(1, len(tk) - 8)) AS pos
         |        FROM base WHERE len(tk) >= 10)),
         |occ AS (
         |  SELECT doc_id, pos,
         |    ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn,
         |    COUNT(*) OVER (PARTITION BY h) AS cnt
         |  FROM wins),
         |flagged AS (SELECT doc_id, pos FROM occ WHERE cnt >= 2 AND rn > 1),
         |isl AS (
         |  SELECT doc_id, pos,
         |    SUM(CASE WHEN prev IS NOT NULL AND pos - prev > 10 THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY doc_id ORDER BY pos) AS island
         |  FROM (SELECT doc_id, pos,
         |          lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
         |        FROM flagged)),
         |spans AS (
         |  SELECT doc_id, island, COUNT(*) AS n_wins,
         |    MAX(pos) + 10 - MIN(pos) AS span_tokens
         |  FROM isl GROUP BY 1, 2),
         |perdoc AS (
         |  SELECT doc_id, CAST(SUM(n_wins) AS BIGINT) AS n_dup_windows,
         |    CAST(COUNT(*) AS BIGINT) AS n_spans,
         |    CAST(SUM(span_tokens) AS BIGINT) AS dup_tokens,
         |    CAST(MAX(span_tokens) AS BIGINT) AS max_span
         |  FROM spans GROUP BY 1)
         |SELECT b.doc_id, b.n_tokens,
         |  coalesce(p.n_dup_windows, 0) AS n_dup_windows,
         |  coalesce(p.n_spans, 0) AS n_spans,
         |  coalesce(p.dup_tokens, 0) AS dup_tokens,
         |  coalesce(p.max_span, 0) AS max_span,
         |  CAST(coalesce(p.dup_tokens, 0) AS DOUBLE) / b.n_tokens AS dup_frac
         |FROM base b LEFT JOIN perdoc p USING (doc_id)
         |ORDER BY b.doc_id""",
      "Dedup: exact duplicated-span census (EXACTSUBSTR, canonical-first)") { (s, d) =>
      DedupOps.dupSpanStats(Tables(s, d, "documents"), w = 10)
        .orderBy("doc_id")
    },

    // The EXACTSUBSTR removal itself (round 10): q101's census acted on
    // — non-canonical duplicated windows mark their positions, covered
    // tokens drop, the remainder reassembles in position order
    // (sorted_multi_concat — the q52 allocation discipline). The full
    // rewritten corpus hash-checks cross-engine, byte for byte.
    oracle(
      "q137_dup_span_excise",
      s"""WITH tkx AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
         |base AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens, tk FROM tkx),
         |wins AS (
         |  SELECT doc_id, CAST(pos AS BIGINT) AS pos,
         |    ${h60d("array_to_string(tk[pos:pos+9], ' ')")} AS h
         |  FROM (SELECT doc_id, tk, unnest(range(1, len(tk) - 8)) AS pos
         |        FROM base WHERE len(tk) >= 10)),
         |occ AS (
         |  SELECT doc_id, pos,
         |    ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn,
         |    COUNT(*) OVER (PARTITION BY h) AS cnt
         |  FROM wins),
         |flagged AS (SELECT doc_id, pos FROM occ WHERE cnt >= 2 AND rn > 1),
         |cov AS (
         |  SELECT DISTINCT doc_id, CAST(pos + g AS BIGINT) AS p
         |  FROM (SELECT doc_id, pos, unnest(range(0, 10)) AS g FROM flagged)),
         |tokp AS (
         |  SELECT doc_id, CAST(p AS BIGINT) AS p, tk[p] AS tok
         |  FROM (SELECT doc_id, tk, unnest(range(1, len(tk) + 1)) AS p FROM base)),
         |keep AS (
         |  SELECT t.doc_id, t.p, t.tok FROM tokp t
         |  WHERE NOT EXISTS (SELECT 1 FROM cov c
         |                    WHERE c.doc_id = t.doc_id AND c.p = t.p)),
         |reb AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS kept_tokens,
         |    string_agg(tok, ' ' ORDER BY p) AS text_clean
         |  FROM keep GROUP BY 1)
         |SELECT b.doc_id, b.n_tokens,
         |  coalesce(r.kept_tokens, 0) AS kept_tokens,
         |  b.n_tokens - coalesce(r.kept_tokens, 0) AS dropped_tokens,
         |  coalesce(r.text_clean, '') AS text_clean
         |FROM base b LEFT JOIN reb r USING (doc_id)
         |ORDER BY b.doc_id""",
      "Dedup: EXACTSUBSTR span removal (rewritten corpus, canonical kept)") { (s, d) =>
      DedupOps.dupSpanExcise(Tables(s, d, "documents"), w = 10)
        .orderBy("doc_id")
    },

    // Distributed BPE merge induction: 4 rounds of count-adjacent-pairs
    // \u2192 argmax (count desc, pair asc) \u2192 greedy-leftmost merge. The
    // oracle replays the marker-wrap replace chain verbatim.
    oracle(
      "q102_bpe_merges",
      bpeCte(4),
      "Tokenizer training: distributed BPE merge induction (4 rounds)") { (s, d) =>
      TextOps.bpeMerges(Tables(s, d, "documents"), rounds = 4)
        .withColumnRenamed("round", "merge_round")
        .orderBy("merge_round")
    },

    // Count-Min heavy-hitter census: exact token top-20 vs the 8-KiB
    // mergeable sketch's point estimates (min over 4 seeded-h60 rows of
    // 256 counters). The oracle replays the counter table as a GROUP BY
    // over the same seeded buckets and takes the same min \u2014 estimates
    // hash-check exactly, not just row counts.
    oracle(
      "q103_cms_heavy_hitters",
      s"""WITH tkx AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
         |w AS (SELECT unnest(tk) AS t FROM tkx),
         |ds AS (SELECT unnest(range(0, ${CmsSketch.D})) AS d),
         |cells AS (
         |  SELECT ds.d, (${h60d("ds.d::VARCHAR || ':' || w.t")}) % ${CmsSketch.W} AS b,
         |    CAST(count(*) AS BIGINT) AS c
         |  FROM w CROSS JOIN ds GROUP BY 1, 2),
         |top AS (
         |  SELECT t, CAST(count(*) AS BIGINT) AS exact_c FROM w GROUP BY 1
         |  ORDER BY exact_c DESC, t LIMIT 20),
         |est AS (
         |  SELECT tp.t, tp.exact_c, CAST(min(ce.c) AS BIGINT) AS cms_est
         |  FROM top tp CROSS JOIN ds
         |  JOIN cells ce ON ce.d = ds.d
         |    AND ce.b = (${h60d("ds.d::VARCHAR || ':' || tp.t")}) % ${CmsSketch.W}
         |  GROUP BY 1, 2)
         |SELECT t, exact_c, cms_est, cms_est - exact_c AS overcount
         |FROM est ORDER BY exact_c DESC, t""",
      "Sketch: Count-Min heavy-hitter census, oracle-replayed estimates") { (s, d) =>
      TextOps.cmsTokenCensus(Tables(s, d, "documents"), topK = 20)
    },

    // Encoding hygiene: U+FFFD / C0-control / mojibake-signature counts
    // + character-class ratios + conjunctive keep. The regex classes are
    // LITERAL characters shared byte-for-byte with the Spark plan
    // (TextOps.ctrlClass/asciiClass); DuckDB counts matches via
    // len(regexp_extract_all(...)) \u2014 same RE2-compatible classes.
    oracle(
      "q104_encoding_quality",
      encodingQualityOracle,
      "Quality: encoding/mojibake hygiene flags (U+FFFD, C0, \u00c3/\u00e2\u20ac)") { (s, d) =>
      TextOps.encodingQuality(Tables.byOrder(s, d, "documents", "doc_id"))
        .orderBy("doc_id")
    },

    // Johnson\u2013Lindenstrauss sign projection 64 \u2192 8 dims + the norm
    // preservation readout. The \u00b11 matrix is h60-derived plan-time
    // literals (the MinHash-coefficient discipline) \u2014 both engines
    // embed the same 512 constants and every coordinate is an exact
    // integer sum.
    oracle(
      "q106_jl_projection",
      jlProjectionOracle(64, 8),
      "ANN: JL random sign projection with norm-preservation readout") { (s, d) =>
      SimOps.randomProjection(Tables(s, d, "embeddings"), dim = 64, outDim = 8)
        .orderBy("vec_id")
    },

    // Recall@5 of brute-force top-k in the 8-dim JL space vs exact
    // top-k in the original 64-dim space \u2014 both rankings are integer L2
    // on micro-units with id tie-breaks, so ranks replay exactly.
    oracle(
      "q107_jl_recall",
      jlRecallOracle(64, 8, nQueries = 50, k = 5),
      "ANN: JL-projected top-k recall vs exact full-dim L2") { (s, d) =>
      SimOps.jlRecallAtK(Tables(s, d, "embeddings"), nQueries = 50, k = 5)
        .orderBy("q_id")
    },

    // Triangle census over the undirected KNN graph: id-ordered wedge
    // join + closing semi-join (each triangle counted once at x<y<z),
    // per-vertex counts, Watts\u2013Strogatz local clustering coefficient.
    oracle(
      "q108_knn_triangles",
      s"""WITH ${bucketCte(12)},
         |pairs AS (
         |  SELECT l.vec_id AS a, r.vec_id AS b,
         |    list_reduce([0.0::DOUBLE] || list_transform(range(1, len(l.embedding)+1),
         |      i -> l.embedding[i]::DOUBLE * r.embedding[i]::DOUBLE), (acc, x) -> acc + x)
         |      / (l.norm * r.norm) AS cosine
         |  FROM e l JOIN e r ON l.bucket = r.bucket AND l.vec_id < r.vec_id),
         |bi AS (
         |  SELECT a AS q_id, b AS n_id, cosine FROM pairs
         |  UNION ALL
         |  SELECT b AS q_id, a AS n_id, cosine FROM pairs),
         |knn AS (
         |  SELECT q_id, n_id FROM (
         |    SELECT q_id, n_id,
         |      ROW_NUMBER() OVER (PARTITION BY q_id
         |        ORDER BY cosine DESC, n_id) AS rank
         |    FROM bi)
         |  WHERE rank <= 3),
         |ed AS (
         |  SELECT DISTINCT least(q_id, n_id) AS a, greatest(q_id, n_id) AS b
         |  FROM knn),
         |deg AS (
         |  SELECT v, CAST(count(*) AS BIGINT) AS degree
         |  FROM (SELECT unnest([a, b]) AS v FROM ed) GROUP BY 1),
         |tri AS (
         |  SELECT w.x, w.y, w.z FROM (
         |    SELECT e1.a AS x, e1.b AS y, e2.b AS z
         |    FROM ed e1 JOIN ed e2 ON e1.b = e2.a) w
         |  WHERE EXISTS (SELECT 1 FROM ed e WHERE e.a = w.x AND e.b = w.z)),
         |tv AS (
         |  SELECT v, CAST(count(*) AS BIGINT) AS n_triangles
         |  FROM (SELECT unnest([x, y, z]) AS v FROM tri) GROUP BY 1)
         |SELECT d.v AS vec_id, d.degree,
         |  coalesce(t.n_triangles, 0)::BIGINT AS n_triangles,
         |  CASE WHEN d.degree >= 2
         |   THEN CAST(2 * coalesce(t.n_triangles, 0) AS DOUBLE)
         |        / (CAST(d.degree AS DOUBLE) * CAST(d.degree - 1 AS DOUBLE))
         |   ELSE CAST(0.0 AS DOUBLE) END AS clustering_coef
         |FROM deg d LEFT JOIN tv t ON t.v = d.v
         |ORDER BY vec_id""",
      "Graph: KNN triangle census + local clustering coefficient") { (s, d) =>
      graft.operators.GraphOps.knnTriangles(Tables(s, d, "embeddings"))
        .orderBy("vec_id")
    },

    // Script-census lang-ID: closes SURVEY \u00a78.10's "lang-ID answers und
    // on CJK" limit. The corpus is augmented with deterministic
    // zh/ja/ko snippets (doc_id % 11 \u2208 {1,2,3} \u2014 the q31/q71 planted-
    // signal discipline) so the script ladder has real positives; the
    // remaining docs exercise the function-word fallback including its
    // own planted multilingual signal absence (mostly 'en'/'und').
    oracle(
      "q109_cjk_langid",
      {
        val scoreCols = TextOps.langProfiles.map { case (l, ws) =>
          s"CAST(len(list_filter(tk, t -> list_contains([${ws.map(w => s"'$w'").mkString(",")}], t))) AS BIGINT) AS s_$l"
        }.mkString(",\n  ")
        def census(cls: String) =
          s"CAST(length(text) - length(regexp_replace(text, '$cls', '', 'g')) AS BIGINT)"
        val augCase = cjkSnippets.map { case (m, _, snip) =>
          s"WHEN doc_id % 11 = $m THEN ' $snip'"
        }.mkString(" ")
        s"""SELECT doc_id, n_han, n_kana, n_hangul,
           |  CASE WHEN n_hangul >= 4 THEN 'ko'
           |       WHEN n_kana >= 4 THEN 'ja'
           |       WHEN n_han >= 4 THEN 'zh'
           |       ELSE ${TextOps.langGuessSql} END AS lang_guess
           |FROM (SELECT doc_id,
           |  $scoreCols,
           |  ${census(TextOps.hanClass)} AS n_han,
           |  ${census(TextOps.kanaClass)} AS n_kana,
           |  ${census(TextOps.hangulClass)} AS n_hangul
           |  FROM (SELECT doc_id, text, string_split(text, ' ') AS tk
           |        FROM (SELECT doc_id,
           |                concat(coalesce(text, ''), CASE $augCase ELSE '' END) AS text
           |              FROM documents)))
           |ORDER BY doc_id""".stripMargin
      },
      "Text: script-census CJK lang-ID (Hangul\u2192ko, Kana\u2192ja, Han\u2192zh, function-word fallback)") { (s, d) =>
      val aug = Tables.byOrder(s, d, "documents", "doc_id").select(col("doc_id"),
        concat(coalesce(col("text"), lit("")),
          cjkSnippets.foldLeft(when(lit(false), lit(""))) {
            case (w, (m, _, snip)) => w.when(col("doc_id") % 11 === m, lit(s" $snip"))
          }.otherwise(lit(""))).as("text"))
      TextOps.scriptLangId(aug)
        .select("doc_id", "n_han", "n_kana", "n_hangul", "lang_guess")
        .orderBy("doc_id")
    },

    // CCNet-style boilerplate line removal. The newline-free corpus gets
    // its line structure from linesOf (8-token windows) plus planted
    // boilerplate lines: a per-source share-footer (df = docs-per-source)
    // and an every-other-doc promo line \u2014 both cross the df >= 5 bar and
    // are stripped; organic word-salad windows stay unique and survive.
    oracle(
      "q110_boilerplate_lines",
      """WITH tkx AS (
        |  SELECT doc_id, source, string_split(text, ' ') AS tk FROM documents),
        |dl AS (
        |  SELECT doc_id,
        |    (CASE WHEN len(tk) = 0 THEN CAST([] AS VARCHAR[])
        |     ELSE list_transform(range(0, CAST(ceil(len(tk) / 8.0) AS BIGINT)),
        |       i -> array_to_string(tk[i*8+1 : i*8+8], ' ')) END)
        |    || ['share this page from ' || source]
        |    || (CASE WHEN doc_id % 2 = 0
        |        THEN ['subscribe to our newsletter today']
        |        ELSE CAST([] AS VARCHAR[]) END) AS lines
        |  FROM tkx),
        |ex AS (
        |  SELECT doc_id, unnest(range(0, len(lines))) AS pos,
        |    unnest(lines) AS line
        |  FROM dl),
        |bp AS (
        |  SELECT line FROM (
        |    SELECT line, count(DISTINCT doc_id) AS df FROM ex GROUP BY 1)
        |  WHERE df >= 5),
        |kept AS (
        |  SELECT e.doc_id, CAST(count(*) AS BIGINT) AS n_kept,
        |    string_agg(e.line, chr(10) ORDER BY e.pos) AS clean_text
        |  FROM ex e
        |  WHERE NOT EXISTS (SELECT 1 FROM bp WHERE bp.line = e.line)
        |  GROUP BY 1),
        |base AS (SELECT doc_id, CAST(len(lines) AS BIGINT) AS n_lines FROM dl)
        |SELECT b.doc_id, b.n_lines,
        |  coalesce(k.n_kept, 0)::BIGINT AS n_kept,
        |  b.n_lines - coalesce(k.n_kept, 0)::BIGINT AS n_dropped,
        |  coalesce(k.clean_text, '') AS clean_text
        |FROM base b LEFT JOIN kept k ON b.doc_id = k.doc_id
        |ORDER BY b.doc_id""",
      "Text: CCNet line-level boilerplate strip (df-census + anti-join)") { (s, d) =>
      val docs = Tables(s, d, "documents")
      val dl = TextOps.linesOf(docs, lineTokens = 8, keep = Seq("source"))
        .select(col("doc_id"), expr(
          """concat(lines,
            |  array(concat('share this page from ', source)),
            |  CASE WHEN doc_id % 2 = 0
            |    THEN array('subscribe to our newsletter today')
            |    ELSE CAST(array() AS ARRAY<STRING>) END)""".stripMargin).as("lines"))
      TextOps.stripBoilerplateLines(dl, minDf = 5).orderBy("doc_id")
    },

    // Seed-set expansion ("more documents like these"): exact BIGINT
    // centroid of the seeds' hashed doc vectors, dot-product affinity
    // rank over the rest of the corpus, top-20.
    oracle(
      "q111_seed_expansion",
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
         |sj AS (
         |  SELECT doc_id,
         |    ${h60d("t")} % 16 AS j,
         |    1 - 2 * (${h60d("'s_' || t")} % 2) AS sgn
         |  FROM tok),
         |ag AS (
         |  SELECT doc_id, j, CAST(sum(sgn) AS BIGINT) AS v
         |  FROM sj GROUP BY 1, 2),
         |cen AS (
         |  SELECT j, CAST(sum(v) AS BIGINT) AS cj
         |  FROM ag WHERE doc_id % 17 = 0 GROUP BY 1),
         |sc AS (
         |  SELECT a.doc_id,
         |    CAST(sum(a.v * coalesce(c.cj, 0)) AS BIGINT) AS affinity
         |  FROM ag a LEFT JOIN cen c ON a.j = c.j
         |  WHERE a.doc_id % 17 <> 0 GROUP BY 1),
         |top AS (
         |  SELECT doc_id, affinity,
         |    CAST(ROW_NUMBER() OVER (ORDER BY affinity DESC, doc_id) AS BIGINT) AS rank
         |  FROM sc)
         |SELECT rank, doc_id, affinity FROM top WHERE rank <= 20 ORDER BY rank""",
      "Similarity: seed-centroid retrieval over exact hashed doc vectors") { (s, d) =>
      TextOps.seedCentroidTopK(Tables(s, d, "documents"),
        seedMod = 17, dim = 16, k = 20)
    },

    // BPE encode: the application pass of q102's induced merges — every
    // document rewritten with all 4 learned merges plus the
    // vocabulary-commit readout (symbol counts, compression ppm). The
    // oracle replays the identical marker-wrap replace chain and
    // reconstructs n_tokens from the '~' joiners.
    oracle(
      "q112_bpe_encode",
      bpeCte(4, applyAll = true),
      "Tokenizer: BPE encode (induce 4 merges + apply, compression readout)") { (s, d) =>
      TextOps.bpeEncode(Tables(s, d, "documents"), rounds = 4)
        .orderBy("doc_id")
    },

    // Quality-threshold calibration: survivors at each candidate cutoff
    // — the q77 read-the-threshold-off-the-volume discipline applied to
    // the q32 quality score.
    oracle(
      "q113_quality_threshold_sweep",
      s"""WITH q AS (
         |  SELECT doc_id, n_tokens,
         |    0.5 * (CAST(n_distinct AS DOUBLE) / n_tokens)
         |      + 0.3 * (1.0 - CAST(n_stop AS DOUBLE) / n_tokens)
         |      + 0.2 * least((CAST(sum_len AS DOUBLE) / n_tokens) / 8.0, 1.0)
         |      AS quality
         |  FROM (SELECT doc_id,
         |          CAST(len(tk) AS BIGINT) AS n_tokens,
         |          CAST(len(list_distinct(tk)) AS BIGINT) AS n_distinct,
         |          CAST(len(list_filter(tk,
         |            t -> list_contains(['the','a','of','and'], t))) AS BIGINT) AS n_stop,
         |          list_reduce([0::BIGINT] || list_transform(tk,
         |            t -> CAST(len(t) AS BIGINT)), (acc, x) -> acc + x) AS sum_len
         |        FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents))),
         |tot AS (
         |  SELECT CAST(count(*) AS BIGINT) AS total_docs,
         |    CAST(sum(n_tokens) AS BIGINT) AS total_tokens
         |  FROM q),
         |sw AS (
         |  SELECT CAST(s.step AS DOUBLE) / 10.0 AS tau,
         |    CAST(sum(CASE WHEN q.quality >= CAST(s.step AS DOUBLE) / 10.0
         |      THEN 1 ELSE 0 END) AS BIGINT) AS kept_docs,
         |    CAST(sum(CASE WHEN q.quality >= CAST(s.step AS DOUBLE) / 10.0
         |      THEN q.n_tokens ELSE 0 END) AS BIGINT) AS kept_tokens
         |  FROM q CROSS JOIN (SELECT unnest(range(0, 10)) AS step) s
         |  GROUP BY 1)
         |SELECT sw.tau, sw.kept_docs, sw.kept_tokens,
         |  (sw.kept_docs * 1000000) // tot.total_docs AS docs_ppm,
         |  (sw.kept_tokens * 1000000) // tot.total_tokens AS tokens_ppm
         |FROM sw CROSS JOIN tot
         |ORDER BY sw.tau""",
      "Quality: threshold-calibration sweep (survivors per cutoff, ppm)") { (s, d) =>
      TextOps.qualityThresholdSweep(Tables(s, d, "documents"), steps = 10)
    })

  /** Deterministic CJK snippets planted by q109 (mod-11 gate, lang,
    * text): Chinese runs space-free Han (exercising the per-codepoint
    * tokenizer branch), Japanese mixes Kana and Kanji, Korean is
    * space-separated Hangul. */
  private[queries] val cjkSnippets: Seq[(Int, String, String)] = Seq(
    (1, "zh", "\u6570\u636e\u5904\u7406\u5f15\u64ce\u5728\u5927\u89c4\u6a21\u96c6\u7fa4\u4e0a\u8fd0\u884c\u5206\u5e03\u5f0f\u67e5\u8be2\u8ba1\u5212"),
    (2, "ja", "\u30c7\u30fc\u30bf\u51e6\u7406\u30a8\u30f3\u30b8\u30f3\u306f\u5927\u898f\u6a21\u30af\u30e9\u30b9\u30bf\u3067\u52d5\u4f5c\u3057\u307e\u3059"),
    (3, "ko", "\ub370\uc774\ud130 \ucc98\ub9ac \uc5d4\uc9c4 \uc740 \ub300\uaddc\ubaa8 \ud074\ub7ec\uc2a4\ud130 \uc5d0\uc11c \uc2e4\ud589 \ub429\ub2c8\ub2e4"))

  /** DuckDB mirror of [[SimOps.jlRecallAtK]]. */
  private def jlRecallOracle(dim: Int, outDim: Int,
      nQueries: Int, k: Int): String = {
    val d64 = (1 to dim)
      .map(i => s"((a.mvec[$i] - b.mvec[$i]) * (a.mvec[$i] - b.mvec[$i]))")
      .mkString(" + ")
    val dp = (0 until outDim)
      .map(j => s"((a.p$j - b.p$j) * (a.p$j - b.p$j))")
      .mkString(" + ")
    s"""WITH $mvCte,
       |${pjCte(dim, outDim)},
       |t AS (
       |  SELECT q_id, n_id FROM (
       |    SELECT q_id, n_id,
       |      ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY d, n_id) AS rn
       |    FROM (
       |      SELECT a.vec_id AS q_id, b.vec_id AS n_id, $d64 AS d
       |      FROM mv a JOIN mv b
       |        ON a.vec_id < $nQueries AND a.vec_id <> b.vec_id))
       |  WHERE rn <= $k),
       |c AS (
       |  SELECT q_id, n_id FROM (
       |    SELECT q_id, n_id,
       |      ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY d, n_id) AS rn
       |    FROM (
       |      SELECT a.vec_id AS q_id, b.vec_id AS n_id, $dp AS d
       |      FROM pj a JOIN pj b
       |        ON a.vec_id < $nQueries AND a.vec_id <> b.vec_id))
       |  WHERE rn <= $k),
       |hits AS (
       |  SELECT t.q_id, CAST(count(*) AS BIGINT) AS n_hits
       |  FROM t JOIN c ON t.q_id = c.q_id AND t.n_id = c.n_id
       |  GROUP BY 1),
       |tt AS (SELECT q_id, CAST(count(*) AS BIGINT) AS n_truth FROM t GROUP BY 1)
       |SELECT tt.q_id, tt.n_truth, coalesce(h.n_hits, 0)::BIGINT AS n_hits,
       |  CAST(coalesce(h.n_hits, 0) AS DOUBLE) / CAST(tt.n_truth AS DOUBLE) AS recall
       |FROM tt LEFT JOIN hits h USING (q_id)
       |ORDER BY tt.q_id""".stripMargin
  }

  /** DuckDB CTE: `mv(vec_id, mvec)` \u2014 embeddings quantized to micro-unit
    * BIGINT lists (the fixed-point discipline shared with the kmeans
    * oracles). */
  private val mvCte: String =
    """mv AS (
      |  SELECT vec_id,
      |    list_transform(embedding, x ->
      |      CAST(floor(CAST(x AS DOUBLE) * 1000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT)) AS mvec
      |  FROM embeddings)""".stripMargin

  /** DuckDB CTE continuing [[mvCte]]: `pj(vec_id, p0..p{outDim-1})` \u2014
    * the JL sign projection with the same h60-derived literal matrix as
    * [[SimOps.randomProjection]]. */
  private def pjCte(dim: Int, outDim: Int): String = {
    val signs = SimOps.jlSigns(dim, outDim)
    val projs = (0 until outDim).map { j =>
      (1 to dim).map(i => s"(${signs(j)(i - 1)} * mvec[$i])").mkString(" + ") +
        s" AS p$j"
    }
    s"pj AS (SELECT vec_id, ${projs.mkString(", ")} FROM mv)"
  }

  /** DuckDB mirror of [[SimOps.randomProjection]] \u2014 identical h60-derived
    * sign literals, micro-unit BIGINT arithmetic, cast-DOUBLE ratio. */
  private def jlProjectionOracle(dim: Int, outDim: Int): String = {
    val orig2 = (1 to dim).map(i => s"(mvec[$i] * mvec[$i])").mkString(" + ")
    val proj2 = (0 until outDim).map(j => s"(p$j * p$j)").mkString(" + ")
    val ps = (0 until outDim).map(j => s"p$j").mkString(", ")
    s"""WITH $mvCte,
       |${pjCte(dim, outDim)},
       |o AS (SELECT vec_id, $orig2 AS orig2 FROM mv),
       |q AS (SELECT vec_id, $ps, orig2, $proj2 AS proj2
       |      FROM pj JOIN o USING (vec_id))
       |SELECT vec_id, $ps, orig2, proj2,
       |  CASE WHEN orig2 > 0
       |   THEN CAST(proj2 AS DOUBLE) / (CAST($outDim.0 AS DOUBLE) * CAST(orig2 AS DOUBLE))
       |   ELSE CAST(0.0 AS DOUBLE) END AS norm_ratio
       |FROM q ORDER BY vec_id""".stripMargin
  }

  /** DuckDB mirror of [[TextOps.encodingQuality]] \u2014 identical literal
    * classes and explicitly-cast DOUBLE ratios; only the match-count
    * spelling differs (`len(regexp_extract_all(...))` for Spark's
    * `regexp_count`). */
  private def encodingQualityOracle: String = {
    val n = "CAST(length(text) AS BIGINT)"
    val repl = s"$n - CAST(length(replace(text, '\ufffd', '')) AS BIGINT)"
    val moji =
      s"($n - CAST(length(replace(text, '\u00c3', '')) AS BIGINT))" +
        s" + ($n - CAST(length(replace(text, '\u00e2\u20ac', '')) AS BIGINT)) / 2"
    val ctrl = s"CAST(len(regexp_extract_all(text, '[${TextOps.ctrlClass}]')) AS BIGINT)"
    val nonAscii = s"CAST(len(regexp_extract_all(text, '[^${TextOps.asciiClass}]')) AS BIGINT)"
    val digits = s"CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT)"
    val spaces = s"$n - CAST(length(replace(text, ' ', '')) AS BIGINT)"
    def ratio(c: String) =
      s"CASE WHEN $n > 0 THEN CAST($c AS DOUBLE) / CAST($n AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END"
    s"""SELECT doc_id,
       |  $n AS n_chars_text,
       |  $repl AS repl_chars,
       |  $ctrl AS ctrl_chars,
       |  CAST($moji AS BIGINT) AS mojibake_hits,
       |  $nonAscii AS non_ascii,
       |  ${ratio(nonAscii)} AS non_ascii_ratio,
       |  ${ratio(spaces)} AS ws_ratio,
       |  ${ratio(digits)} AS digit_ratio,
       |  ($repl = 0 AND $ctrl = 0 AND CAST($moji AS BIGINT) = 0
       |   AND ${ratio(nonAscii)} <= CAST(0.5 AS DOUBLE)) AS keep
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** DuckDB mirror of [[TextOps.bpeMerges]]: a `rounds`-deep CTE chain \u2014
    * pair count \u2192 1-row argmax \u2192 marker-wrapped greedy replace \u2014 ending
    * in the union of the per-round winners. */
  private[queries] def bpeCte(rounds: Int, applyAll: Boolean = false): String = {
    val sb = new StringBuilder("WITH t0 AS (SELECT doc_id, text FROM documents)")
    for (r <- 1 to rounds) {
      sb.append(s""",
         |p$r AS (SELECT tk[i] AS lhs, tk[i+1] AS rhs, count(*) AS cnt
         |        FROM (SELECT tk, unnest(range(1, len(tk))) AS i
         |              FROM (SELECT string_split(text, ' ') AS tk FROM t${r - 1}))
         |        GROUP BY 1, 2),
         |b$r AS (SELECT CAST($r AS BIGINT) AS merge_round, lhs, rhs,
         |          CAST(cnt AS BIGINT) AS cnt
         |        FROM p$r ORDER BY cnt DESC, lhs, rhs LIMIT 1)""".stripMargin)
      if (r < rounds || applyAll) sb.append(s""",
         |t$r AS (SELECT doc_id,
         |          replace(replace('\u00b7' || replace(t.text, ' ', '\u00b7 \u00b7') || '\u00b7',
         |            '\u00b7' || b.lhs || '\u00b7 \u00b7' || b.rhs || '\u00b7',
         |            '\u00b7' || b.lhs || '~' || b.rhs || '\u00b7'), '\u00b7', '') AS text
         |        FROM t${r - 1} t CROSS JOIN b$r b)""".stripMargin)
    }
    if (applyAll)
      sb.append(s"""
         |SELECT t.doc_id,
         |  list_reduce([0::BIGINT] || list_transform(string_split(t.text, ' '),
         |    x -> CAST(len(string_split(x, '~')) AS BIGINT)), (a, x) -> a + x)
         |    AS n_tokens,
         |  CAST(len(string_split(t.text, ' ')) AS BIGINT) AS n_symbols,
         |  CAST(len(list_filter(string_split(t.text, ' '),
         |    x -> contains(x, '~'))) AS BIGINT) AS n_merged,
         |  (CAST(len(string_split(t.text, ' ')) AS BIGINT) * 1000000)
         |    // list_reduce([0::BIGINT] || list_transform(string_split(t.text, ' '),
         |         x -> CAST(len(string_split(x, '~')) AS BIGINT)), (a, x) -> a + x)
         |    AS compression_ppm,
         |  t.text AS encoded_text
         |FROM t$rounds t ORDER BY t.doc_id""".stripMargin)
    else
      sb.append("\n" +
        (1 to rounds).map(r => s"SELECT * FROM b$r").mkString(" UNION ALL ") +
        " ORDER BY merge_round")
    sb.toString
  }
}
