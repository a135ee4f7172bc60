package graft

import org.apache.spark.sql.functions._

import graft.operators.{RefineOps, SimOps, TextOps}

/** Behavioural pins for the corpus-datasheet family (q146–q149):
  * cross-document paragraph dedup winner rule + rewrite order,
  * embedding-space decontamination argmax/tie-break and its bounded
  * broadcast plan, exact log₂ bucketing at power-of-two boundaries, and
  * first-occurrence novelty attribution. Cross-engine bit-equality is
  * the oracles' job; these pin semantics on constructed fixtures plus
  * the plan shapes that are each operator's scale argument. */
class DatasheetSpec extends SparkSpec {
  import spark.implicits._

  test("dedupParagraphsAcrossDocs: global first occurrence wins, rewrite keeps order") {
    val lines = Seq(
      // doc 1 owns "a b" (pos 0) and "c d" (pos 1); its own repeat of
      // "a b" at pos 2 must ALSO drop (global rule subsumes within-doc)
      (1L, Seq("a b", "c d", "a b", "e f")),
      // doc 2 repeats doc 1's content + contributes one new line
      (2L, Seq("c d", "x y", "a b")),
      // doc 3 is entirely derivative
      (3L, Seq("a b", "c d")),
      // empty doc survives to the output
      (4L, Seq.empty[String])
    ).toDF("doc_id", "lines").repartition(3) // winners cross partitions
    val out = RefineOps.dedupParagraphsAcrossDocs(lines)
      .orderBy("doc_id").collect()
    assert(out.length === 4)
    assert(out(0).getLong(1) === 4L && out(0).getLong(2) === 3L)
    assert(out(0).getString(4) === "a b\nc d\ne f")
    assert(out(1).getLong(2) === 1L && out(1).getString(4) === "x y")
    assert(out(2).getLong(2) === 0L && out(2).getString(4) === "")
    assert(out(3).getLong(1) === 0L && out(3).getString(4) === "")
  }

  test("dedupParagraphsAcrossDocs: census is an aggregation, not a line-keyed window") {
    // The scale argument: the winner census must be min(struct) partial
    // agg (map-side combine on hot boilerplate lines), never a window
    // partitioned on the line text.
    val lines = Seq((1L, Seq("a b", "c d"))).toDF("doc_id", "lines")
    val plan = RefineOps.dedupParagraphsAcrossDocs(lines)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      "winner selection must be a partial agg, not a row_number window")
    assert(!plan.contains("CartesianProduct"))
  }

  test("semanticDecontamination: nearest eval vector, deterministic ties, threshold flag") {
    // 2-D unit-ish vectors; eval = ids 0/1, train = ids 50/51/52
    // (evalMax 50). Train 50 aligns with eval 0 exactly (cos 1 ≥ 0.8);
    // train 51 aligns with eval 1 (cos 1); train 52 sits at 45° from
    // BOTH evals (cos ≈ 0.707 < 0.8, tie → eval 0).
    val vecs = Seq(
      (0L, Seq(1f, 0f), 0), (1L, Seq(0f, 1f), 0),
      (50L, Seq(2f, 0f), 0), (51L, Seq(0f, 3f), 0), (52L, Seq(1f, 1f), 0)
    ).toDF("vec_id", "embedding", "label")
    val out = SimOps.semanticDecontamination(vecs)
      .orderBy("vec_id").collect()
    assert(out.length === 3)
    assert(out(0).getLong(1) === 0L && out(0).getBoolean(3))
    assert(out(1).getLong(1) === 1L && out(1).getBoolean(3))
    assert(out(2).getLong(1) === 0L, "equal-cosine tie must pick the smaller eval id")
    assert(math.abs(out(2).getDouble(2) - math.sqrt(0.5)) < 1e-9)
    assert(!out(2).getBoolean(3))
  }

  test("semanticDecontamination: eval side broadcasts, train side never shuffles for scoring") {
    val vecs = Seq(
      (0L, Seq(1f, 0f), 0), (50L, Seq(0f, 1f), 0)
    ).toDF("vec_id", "embedding", "label")
    val plan = SimOps.semanticDecontamination(vecs)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "bounded probe set must broadcast; the corpus streams")
    assert(!plan.contains("CartesianProduct"))
  }

  test("zipfSpectrum: exact log2 buckets at power-of-two boundaries") {
    // counts: a=1 (bucket 0), b=2 (bucket 1), c=3 (bucket 1), d=4
    // (bucket 2) — the c=4 boundary is exactly where a floating log2
    // could misbucket; length(bin(c))-1 cannot.
    val docs = Seq(
      (1L, "a b b c c c d d"),
      (2L, "d d")
    ).toDF("doc_id", "text")
    val out = TextOps.zipfSpectrum(docs).orderBy("bucket").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq((0L, 1L, 1L), (1L, 2L, 5L), (2L, 1L, 4L)))
    // Heaps point constants on every row; ppm is floor division
    assert(out.forall(r => r.getLong(3) === 10L && r.getLong(4) === 4L))
    assert(out.map(_.getLong(5)).toSeq === Seq(100000L, 500000L, 400000L))
  }

  test("ngramNovelty: first-occurrence attribution in doc order") {
    val docs = Seq(
      // doc 1: grams {a b c, b c d} — both novel (first doc)
      (1L, "a b c d"),
      // doc 2: repeats doc 1's text exactly — zero novelty
      (2L, "a b c d"),
      // doc 3: one shared gram (b c d via "b c d e"→{b c d, c d e}) —
      // half novel
      (3L, "b c d e"),
      // doc 4: too short for a 3-gram — 0/0 → ppm 0
      (4L, "x y")
    ).toDF("doc_id", "text")
    val out = TextOps.ngramNovelty(docs).orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ===
      Seq((2L, 2L, 1000000L), (2L, 0L, 0L), (2L, 1L, 500000L), (0L, 0L, 0L)))
  }

  test("bpeLangFertility: rollup reproduces the per-doc census exactly (incl. floor div)") {
    // The BPE induction itself is DupSpanBpeSpec's job; this pins the
    // per-language rollup against a hand aggregation of bpeEncode's own
    // per-doc output — corpus-level ratios, not means of per-doc ratios.
    val docs = Seq(
      (1L, "aa bb aa bb cc", "xx"),
      (2L, "aa bb aa bb", "xx"),
      (3L, "dd ee dd ee dd", "yy"),
      (4L, "", "yy")
    ).toDF("doc_id", "text", "lang")
    val perDoc = TextOps.bpeEncode(docs, rounds = 2)
      .select("doc_id", "n_tokens", "n_symbols", "n_merged")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val bytes = Map(1L -> 14L, 2L -> 11L, 3L -> 14L, 4L -> 0L)
    val out = TextOps.bpeLangFertility(docs, rounds = 2)
      .orderBy("lang").collect()
    assert(out.map(_.getString(0)).toSeq === Seq("xx", "yy"))
    Seq("xx" -> Seq(1L, 2L), "yy" -> Seq(3L, 4L)).zip(out).foreach {
      case ((_, ids), row) =>
        val t = ids.map(perDoc(_)._1).sum
        val s = ids.map(perDoc(_)._2).sum
        val m = ids.map(perDoc(_)._3).sum
        val b = ids.map(bytes).sum
        assert(row.getLong(1) === ids.size.toLong)
        assert((row.getLong(2), row.getLong(3), row.getLong(4), row.getLong(5))
          === ((t, s, m, b)))
        assert(row.getLong(6) === s * 1000000L / t)
        assert(row.getLong(7) === b * 1000000L / s)
    }
  }

  test("decontaminateExcise: eval-matching spans drop with no canonical exemption") {
    import graft.operators.DedupOps
    val evalRun = "e1 e2 e3 e4 e5 e6 e7 e8 e9 e10"
    val probes = Seq((1L, s"intro words $evalRun closing words"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      // leaked run mid-document: exactly those 10 tokens excise, the
      // flanks survive — and there is NO canonical copy kept (unlike
      // dupSpanExcise, the corpus's only copy still drops)
      (100L, s"keep one $evalRun keep two"),
      // clean document: byte-identical passthrough
      (101L, "totally clean text with nothing shared at all today"),
      // pure contamination: collapses to the empty string
      (102L, evalRun)
    ).toDF("doc_id", "text")
    val out = DedupOps.decontaminateExcise(corpus, probes, w = 10)
      .orderBy("doc_id").collect()
    assert(out(0).getString(4) === "keep one keep two")
    assert(out(0).getLong(1) === 14L && out(0).getLong(3) === 10L)
    assert(out(1).getString(4) ===
      "totally clean text with nothing shared at all today")
    assert(out(1).getLong(3) === 0L)
    assert(out(2).getString(4) === "" && out(2).getLong(2) === 0L)
  }

  test("ngramNovelty: no gram-level join back to the corpus") {
    // The scale argument: n_grams is per-row (size of the shingle
    // array, never an explode re-aggregation); the winner census
    // re-aggregates by its own winner column. Exactly ONE join may
    // appear — the narrow doc-keyed novel-count join.
    val docs = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val plan = TextOps.ngramNovelty(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    val sortJoins = "SortMergeJoin".r.findAllIn(plan).length
    val hashJoins = "HashJoin".r.findAllIn(plan).length
    assert(sortJoins + hashJoins <= 1,
      s"expected only the doc-keyed count join, got $sortJoins SMJ + $hashJoins HJ:\n$plan")
  }
}
