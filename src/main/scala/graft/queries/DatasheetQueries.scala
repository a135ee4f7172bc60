package graft.queries

import org.apache.spark.sql.functions._

import graft.QueryDef, QueryDef.oracle
import graft.operators.{RefineOps, SimOps, TextOps}
import graft.sources.Tables

/** Corpus-datasheet / global-census query family (q146+): the readouts
  * that treat the corpus as ONE object — cross-document paragraph
  * dedup, embedding-space decontamination, the Zipf/Heaps frequency
  * spectrum, and the per-document novelty curve.
  *
  * Oracle discipline unchanged from the rest of the registry: doubles
  * are exact single division chains replayed verbatim (cosine), all
  * other ratios are integer ppm, and the log₂ bucket is the binary
  * digit count — never a floating log.
  */
object DatasheetQueries {

  /** DuckDB fragment: `(doc_id, lines)` fixed-width token windows —
    * the [[graft.operators.TextOps.linesOf]] mirror (q110/q115 form). */
  private def linesCte(lt: Int): String =
    s"""SELECT doc_id,
       |    (CASE WHEN len(tk) = 0 THEN CAST([] AS VARCHAR[])
       |     ELSE list_transform(range(0, CAST(ceil(len(tk) / $lt.0) AS BIGINT)),
       |       i -> array_to_string(tk[i*$lt+1 : i*$lt+$lt], ' ')) END) AS lines
       |  FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents)""".stripMargin

  /** DuckDB fragment: sequential double dot of two list columns (the
    * q39/q56 mirror of the native `dot_product`). */
  private def dotD(a: String, b: String): String =
    s"list_reduce([0.0::DOUBLE] || list_transform(range(1, len($a)+1), " +
      s"i -> $a[i]::DOUBLE * $b[i]::DOUBLE), (acc, x) -> acc + x)"

  val defs: Seq[QueryDef] = Seq(

    // Cross-document paragraph dedup: global first occurrence (by
    // doc_id, pos) of each distinct 4-token paragraph wins; corpus is
    // rewritten from the survivors. The oracle replays the winner rule
    // as a window (fine at sf0.01); the Spark side is the skew-proof
    // min(struct) census — same winner by definition of min.
    oracle(
      "q146_paragraph_dedup",
      s"""WITH dl AS (${linesCte(4)}),
         |ex AS (
         |  SELECT doc_id, unnest(range(0, len(lines))) AS pos,
         |    unnest(lines) AS line
         |  FROM dl),
         |r AS (
         |  SELECT doc_id, pos, line,
         |    ROW_NUMBER() OVER (PARTITION BY ${graft.functions.Scalars.h60Sql("line")}
         |      ORDER BY doc_id, pos) AS rk
         |  FROM ex),
         |kept AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
         |    string_agg(line, chr(10) ORDER BY pos) AS clean_text
         |  FROM r WHERE rk = 1 GROUP BY 1)
         |SELECT d.doc_id, CAST(len(d.lines) AS BIGINT) AS n_lines,
         |  coalesce(k.n_kept, 0)::BIGINT AS n_kept,
         |  CAST(len(d.lines) AS BIGINT) - coalesce(k.n_kept, 0)::BIGINT AS n_dropped,
         |  coalesce(k.clean_text, '') AS clean_text
         |FROM dl d LEFT JOIN kept k USING (doc_id)
         |ORDER BY d.doc_id""",
      "Refine: CROSS-document paragraph dedup with corpus rewrite (Dolma pass)") { (s, d) =>
      RefineOps.dedupParagraphsAcrossDocs(
          TextOps.linesOf(Tables(s, d, "documents"), lineTokens = 4))
        .orderBy("doc_id")
    },

    // Embedding-space decontamination: every train vector scored by its
    // nearest eval vector (vec_id < 50 stands in for the benchmark set,
    // the q39/q62 probe convention), flagged at cosine >= 0.8.
    oracle(
      "q147_semantic_decontamination",
      s"""WITH e AS (
         |  SELECT vec_id, embedding,
         |    sqrt(${dotD("embedding", "embedding")}) AS norm
         |  FROM embeddings),
         |scored AS (
         |  SELECT t.vec_id AS vec_id, v.vec_id AS eval_id,
         |    CASE WHEN t.norm * v.norm = 0 THEN 0.0
         |         ELSE ${dotD("t.embedding", "v.embedding")} / (t.norm * v.norm)
         |    END AS cosine
         |  FROM e t JOIN e v ON t.vec_id >= 50 AND v.vec_id < 50),
         |r AS (
         |  SELECT vec_id, eval_id, cosine,
         |    ROW_NUMBER() OVER (PARTITION BY vec_id
         |      ORDER BY cosine DESC, eval_id) AS rk
         |  FROM scored)
         |SELECT vec_id, eval_id, cosine, cosine >= 0.8 AS contaminated
         |FROM r WHERE rk = 1 ORDER BY vec_id""",
      "Similarity: embedding-space decontamination (nearest eval vector per train vector)") { (s, d) =>
      SimOps.semanticDecontamination(Tables(s, d, "embeddings"))
        .orderBy("vec_id")
    },

    // Zipf/Heaps datasheet: distinct types and token mass per
    // floor(log2 frequency) bucket, corpus totals on every row. The
    // bucket is the binary digit count — exact integers both engines.
    oracle(
      "q148_zipf_spectrum",
      """WITH tf AS (
        |  SELECT t, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
        |  GROUP BY 1),
        |tot AS (
        |  SELECT CAST(sum(c) AS BIGINT) AS total_tokens,
        |    CAST(count(*) AS BIGINT) AS total_types
        |  FROM tf)
        |SELECT CAST(length(format('{:b}', c)) - 1 AS BIGINT) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_types,
        |  CAST(sum(c) AS BIGINT) AS n_occ,
        |  tot.total_tokens, tot.total_types,
        |  (CAST(sum(c) AS BIGINT) * 1000000) // tot.total_tokens AS occ_share_ppm
        |FROM tf CROSS JOIN tot
        |GROUP BY 1, tot.total_tokens, tot.total_types
        |ORDER BY bucket""",
      "Text analysis: Zipf/Heaps frequency spectrum (exact log2 buckets)") { (s, d) =>
      TextOps.zipfSpectrum(Tables(s, d, "documents"))
        .orderBy("bucket")
    },

    // Per-document 3-gram novelty in corpus (doc_id) order: what each
    // document adds that no earlier document contained. n_grams reads
    // the per-row array size; the winner census runs over h60(gram)
    // longs — both engines hash identically (the q38 discipline).
    oracle(
      "q149_ngram_novelty",
      s"""WITH sh AS (${NorthStarQueries.SH}),
         |ng AS (SELECT doc_id, CAST(len(sh) AS BIGINT) AS n_grams FROM sh),
         |rows_ AS (SELECT doc_id,
         |    ${graft.functions.Scalars.h60Sql("unnest(sh)")} AS g FROM sh),
         |nn AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_novel
         |       FROM (SELECT g, min(doc_id) AS doc_id FROM rows_ GROUP BY 1)
         |       GROUP BY 1)
         |SELECT ng.doc_id, ng.n_grams,
         |  coalesce(nn.n_novel, 0)::BIGINT AS n_novel,
         |  CASE WHEN ng.n_grams = 0 THEN 0
         |       ELSE (coalesce(nn.n_novel, 0) * 1000000) // ng.n_grams
         |  END::BIGINT AS novelty_ppm
         |FROM ng
         |LEFT JOIN nn ON nn.doc_id = ng.doc_id
         |ORDER BY ng.doc_id""",
      "Text analysis: per-document n-gram novelty curve (first-occurrence attribution)") { (s, d) =>
      TextOps.ngramNovelty(Tables(s, d, "documents"))
        .orderBy("doc_id")
    },

    // Per-language tokenizer parity under the shared 4-merge BPE
    // vocabulary: corpus-level compression and bytes-per-symbol. The
    // oracle nests q112's proven merge-induction CTE chain as a
    // subquery and rolls it up by language.
    oracle(
      "q150_bpe_lang_fertility",
      s"""SELECT d.lang,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(e.n_tokens) AS BIGINT) AS n_tokens,
         |  CAST(sum(e.n_symbols) AS BIGINT) AS n_symbols,
         |  CAST(sum(e.n_merged) AS BIGINT) AS n_merged,
         |  CAST(sum(octet_length(encode(d.text))) AS BIGINT) AS n_bytes,
         |  CASE WHEN CAST(sum(e.n_tokens) AS BIGINT) = 0 THEN 0
         |       ELSE (CAST(sum(e.n_symbols) AS BIGINT) * 1000000)
         |            // CAST(sum(e.n_tokens) AS BIGINT)
         |  END::BIGINT AS compression_ppm,
         |  CASE WHEN CAST(sum(e.n_symbols) AS BIGINT) = 0 THEN 0
         |       ELSE (CAST(sum(octet_length(encode(d.text))) AS BIGINT) * 1000000)
         |            // CAST(sum(e.n_symbols) AS BIGINT)
         |  END::BIGINT AS bytes_per_symbol_ppm
         |FROM (${CorpusQueries.bpeCte(4, applyAll = true)}) e
         |JOIN documents d ON d.doc_id = e.doc_id
         |GROUP BY 1 ORDER BY 1""",
      "Tokenizer: per-language BPE fertility/parity datasheet (shared vocabulary)") { (s, d) =>
      TextOps.bpeLangFertility(Tables(s, d, "documents"), rounds = 4)
        .orderBy("lang")
    },

    // Decontamination by EXCISION: q62's benchmark screen (docs < 25 =
    // the eval set), but the ACT — every corpus token covered by a
    // 10-token window appearing anywhere in the eval set is removed and
    // the document re-assembled (the GPT-3/Pile span-removal step; q137
    // is the within-corpus sibling). No canonical exemption.
    oracle(
      "q151_decontaminate_excise",
      s"""WITH tkx AS (SELECT doc_id, string_split(text, ' ') AS tk
         |            FROM documents WHERE doc_id >= 25),
         |base AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens, tk FROM tkx),
         |pw AS (
         |  SELECT DISTINCT ${TextOps.h60d("array_to_string(tk[pos:pos+9], ' ')")} AS h
         |  FROM (SELECT tk, unnest(range(1, len(tk) - 8)) AS pos
         |        FROM (SELECT string_split(text, ' ') AS tk
         |              FROM documents WHERE doc_id < 25)
         |        WHERE len(tk) >= 10)),
         |wins AS (
         |  SELECT doc_id, CAST(pos AS BIGINT) AS pos,
         |    ${TextOps.h60d("array_to_string(tk[pos:pos+9], ' ')")} AS h
         |  FROM (SELECT doc_id, tk, unnest(range(1, len(tk) - 8)) AS pos
         |        FROM base WHERE len(tk) >= 10)),
         |flagged AS (SELECT w.doc_id, w.pos FROM wins w JOIN pw USING (h)),
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
      "Dedup: decontamination by span excision (eval-matching runs removed, corpus rewritten)") { (s, d) =>
      val docs = Tables(s, d, "documents")
      graft.operators.DedupOps.decontaminateExcise(
          corpus = docs.filter(col("doc_id") >= 25),
          probes = docs.filter(col("doc_id") < 25), w = 10)
        .orderBy("doc_id")
    },

    // Classifier TRAINING (q138 is the inference half): batch
    // perceptron over h60-hashed bag-of-words, label lang='en'. All
    // integers, so the oracle replays the full 3-epoch weight
    // trajectory as unrolled CTE rounds (the q102/q112 discipline);
    // epoch 1 is the closed form (w0 = 0 -> every margin ties at 0 ->
    // w1 = sum of y*x over the corpus).
    oracle(
      "q153_perceptron_train",
      {
        val b = 64
        def epoch(prev: String, cur: String): String =
          s"""s$cur AS (
             |  SELECT fy.doc_id, max(fy.y) AS y,
             |    CAST(sum(fy.cnt * e$prev.w) AS BIGINT) AS s
             |  FROM fy JOIN e$prev USING (bucket) GROUP BY 1),
             |m$cur AS (SELECT doc_id FROM s$cur WHERE y * s <= 0),
             |d$cur AS (
             |  SELECT bucket, CAST(sum(y * cnt) AS BIGINT) AS dw
             |  FROM fy WHERE doc_id IN (SELECT doc_id FROM m$cur)
             |  GROUP BY 1),
             |e$cur AS (
             |  SELECT e$prev.bucket, e$prev.w + coalesce(d$cur.dw, 0) AS w
             |  FROM e$prev LEFT JOIN d$cur USING (bucket))""".stripMargin
        s"""WITH fy AS (
           |  SELECT doc_id, y, (${graft.operators.TextOps.h60d("t")} % $b) AS bucket,
           |    CAST(count(*) AS BIGINT) AS cnt
           |  FROM (SELECT doc_id,
           |          CASE WHEN lang = 'en' THEN 1 ELSE -1 END::BIGINT AS y,
           |          unnest(string_split(text, ' ')) AS t
           |        FROM documents)
           |  GROUP BY 1, 2, 3),
           |e1 AS (SELECT bucket, CAST(sum(y * cnt) AS BIGINT) AS w
           |       FROM fy GROUP BY 1),
           |${epoch("1", "2")},
           |${epoch("2", "3")}
           |SELECT e1.bucket, e1.w AS w1, e2.w AS w2, e3.w AS w3
           |FROM e1 JOIN e2 USING (bucket) JOIN e3 USING (bucket)
           |ORDER BY e1.bucket""".stripMargin
      },
      "Quality: batch-perceptron classifier training (hashed bag-of-words, 3-epoch weight trajectory)") { (s, d) =>
      TextOps.perceptronTrain(Tables(s, d, "documents"), buckets = 64, epochs = 3)
        .orderBy("bucket")
    })
}
