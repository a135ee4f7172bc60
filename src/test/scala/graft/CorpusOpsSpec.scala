package graft

import org.apache.spark.sql.functions._

import graft.operators.{CurateOps, DedupOps, SampleOps, SimOps, TextOps}

/** Behavioural pins for the corpus-curation additions: Gopher repetition
  * rules ([[TextOps.gopherStats]]) and ANN recall evaluation
  * ([[SimOps.annRecallAtK]]). Bit-level cross-engine equality is
  * q75/q76's oracle job; this spec pins the rule semantics on
  * constructed fixtures. */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  test("gopherStats: repetition and word-length rules fire as published") {
    val docs = Seq(
      // varied text, sane word lengths → keeps (20 tokens: at 10 a
      // unique bigram is already 1/9 > 0.06, the short-doc edge)
      (1L, "alpha bravo charlie delta echo foxtrot golf hotel india " +
        "juliet kilo lima mike november oscar papa quebec romeo sierra tango"),
      // one token dominates → top_word_share and dup_word_frac both fail
      (2L, "spam spam spam spam spam spam spam spam spam ham"),
      // 1-char tokens → mean_word_len < 3 fails
      (3L, "a b c d e f g h i j"),
      // repeated bigram loop: distinct words but one dominating bigram
      (4L, "on and on and on and on and on and on and off")
    ).toDF("doc_id", "text")
    val out = TextOps.gopherStats(docs).orderBy("doc_id").collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap

    assert(byId(1L).getBoolean(6), "varied doc must keep")
    assert(byId(1L).getDouble(2) === 0.0) // all-distinct → dup frac 0

    assert(!byId(2L).getBoolean(6), "spam doc must drop")
    assert(byId(2L).getDouble(3) === 0.9) // top word 9/10

    assert(!byId(3L).getBoolean(6), "1-char tokens fail mean length")
    assert(byId(3L).getDouble(5) === 1.0)

    assert(!byId(4L).getBoolean(6), "bigram loop must drop")
    // "on and" appears 6 times among 12 bigrams
    assert(byId(4L).getDouble(4) === 0.5)
  }

  test("temperatureMixWeights: sqrt-share weights, minority boosted, weights sum to 1") {
    // 90/10 split: share 0.9/0.1 -> weight sqrt(.9)/(sqrt(.9)+sqrt(.1)) ~= 0.75
    val d = ((1 to 90).map(i => (i.toLong, "web")) ++
      (1 to 10).map(i => (100L + i, "books")))
      .toDF("doc_id", "source")
    val rows = SampleOps.temperatureMixWeights(d)
      .orderBy("source").collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("books", "web"))
    val books = rows(0); val web = rows(1)
    assert(books.getLong(1) === 10L && web.getLong(1) === 90L)
    val denom = math.sqrt(0.9) + math.sqrt(0.1)
    assert(math.abs(web.getDouble(3) - math.sqrt(0.9) / denom) < 1e-15)
    assert(math.abs(books.getDouble(3) - math.sqrt(0.1) / denom) < 1e-15)
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-12)
    // temperature flattens: minority boosted above its share, majority damped
    assert(books.getDouble(4) > 1.0 && web.getDouble(4) < 1.0)
  }

  test("unigramRarity: common-vocabulary docs score above rare-vocabulary docs") {
    val d = Seq(
      (1L, "the cat and the dog"),     // shares vocabulary with doc 2
      (2L, "the dog and the bird"),
      (3L, "zyx qwv jkl mnp ssst"))    // tokens appearing nowhere else
      .toDF("doc_id", "text")
    val rows = TextOps.unigramRarity(d).orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // doc 3: every token df=1, n_tokens=5 -> sum_df=5, rate 5/(5*3)=1/3
    assert(rows(3L) === ((5L, 5L, 5.0 / 15.0)))
    // docs 1/2 share 'the'(df2 twice), 'and'(df2), 'dog'(df2): rate > doc 3's
    assert(rows(1L)._3 > rows(3L)._3 && rows(2L)._3 > rows(3L)._3)
    // every doc appears exactly once
    assert(rows.keySet === Set(1L, 2L, 3L))
  }

  test("bigramSurprise: formulaic continuations score the floor; one-off continuations spike") {
    val d = Seq(
      (1L, "a b a b a b"),   // 'a b' and 'b a' are the ONLY continuations
      (2L, "a b a b a c"),   // one surprising 'a c' at the end
      (3L, "x"))             // single token: no bigram
      .toDF("doc_id", "text")
    val rows = TextOps.bigramSurprise(d).orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.keySet === Set(1L, 2L, 3L))
    assert(rows(3L) === ((0L, 0L)), "bigram-less doc scores 0, not NULL")
    // corpus: c1(a)=6, c2(a,b)=5 -> surprise(a,b)=1200000;
    // c1(b)=5, c2(b,a)=4 -> surprise(b,a)=1250000;
    // c2(a,c)=1 -> surprise(a,c)=6000000 — doc 2's mean must exceed doc 1's
    assert(rows(1L)._1 === 5L && rows(2L)._1 === 5L)
    assert(rows(1L)._2 === (1200000L * 3 + 1250000L * 2) / 5)
    assert(rows(2L)._2 > rows(1L)._2, "the one-off continuation raises the mean")
  }

  test("sourceDrift: a vocabulary-disjoint source drifts to ~1e6 ppm, clones sit near 0") {
    val d = Seq(
      (1L, "the cat sat", "web"),
      (2L, "the cat sat", "mirror"),    // identical distribution to web
      (3L, "zzq wvx plk", "spam"))      // fully disjoint vocabulary
      .toDF("doc_id", "text", "source")
    val rows = TextOps.sourceDrift(d).orderBy("source").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.keySet === Set("web", "mirror", "spam"))
    assert(rows("spam")._1 === 3L)
    // spam shares NO terms: TV approaches 1 (floor bias trims a few ppm)
    assert(rows("spam")._2 > 600000L, s"disjoint source must drift, got $rows")
    // web ≡ mirror: identical p, so both sit at the same (small) distance
    assert(rows("web")._2 === rows("mirror")._2)
    assert(rows("web")._2 < rows("spam")._2)
  }

  test("hashedDocVector: identical docs map identically; component sums count signed tokens") {
    val d = Seq(
      (1L, "alpha beta gamma alpha"),
      (2L, "alpha beta gamma alpha"),  // identical text → identical vector
      (3L, "delta"))
      .toDF("doc_id", "text")
    val rows = TextOps.hashedDocVector(d, dim = 8).orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(rows(1L) === rows(2L))
    assert(rows(1L)._1 === 4L && rows(3L)._1 === 1L)
    val vec1 = rows(1L)._2.split(",").map(_.toLong)
    assert(vec1.length === 8, "dense dim-length vector, absent dims zero-filled")
    // hand-checked via python md5: alpha/beta/gamma ALL land in dim 3
    // with signs +1/−1/−1 — so alpha·2 + beta + gamma cancels to the
    // zero vector. That cancellation is the PROOF the sums are signed
    // (an unsigned count would read 4 at dim 3).
    assert(vec1.forall(_ === 0L), s"expected exact sign cancellation, got ${rows(1L)._2}")
    val vec3 = rows(3L)._2.split(",").map(_.toLong)
    assert(vec3(1) === 1L && vec3.map(math.abs).sum === 1L,
      "delta lands in dim 1 with sign +1 (hand-checked)")
  }

  test("dataRecipe: allocations follow sqrt token shares; epochs flag over-sampling") {
    val d = Seq(
      (1L, (1 to 90).map(i => s"w$i").mkString(" "), "big"),
      (2L, (1 to 10).map(i => s"v$i").mkString(" "), "small"))
      .toDF("doc_id", "text", "source")
    val rows = SampleOps.dataRecipe(d, budget = 1000L).orderBy("source").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows.keySet === Set("big", "small"))
    val (bigN, bigW, bigP, bigE) = rows("big")
    val (smallN, smallW, smallP, smallE) = rows("small")
    assert(bigN === 90L && smallN === 10L)
    // α=0.5: weights ∝ sqrt(0.9):sqrt(0.1) = 3:1
    assert(math.abs(bigW / smallW - 3.0) < 1e-12)
    assert(bigP === math.floor(1000.0 * bigW).toLong)
    assert(bigP + smallP <= 1000L, "plans never overshoot the budget")
    // small source must repeat (~25× its 10 tokens): epochs ≫ 1e6;
    // big source undershoots its 90 tokens: epochs < 1e7
    assert(smallE > 1000000L * 20L && bigE > 1000000L * 5L)
    assert(smallE > bigE, "the minority source repeats more")
  }

  test("knnGraph: identical vectors rank first both ways, k bounds each list") {
    val d = Seq(
      (1L, Array(1.0f, 0f, 0f, 0f)),
      (2L, Array(1.0f, 0f, 0f, 0f)),      // identical to 1
      (3L, Array(0.9f, 0.1f, 0f, 0f)),    // close to 1/2
      (4L, Array(0.85f, 0.15f, 0f, 0f)))  // same half-space bucket family
      .toDF("vec_id", "embedding")
    val g = SimOps.knnGraph(d, k = 2, nBits = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    // symmetric: every directed edge has its reverse somewhere in the pair set
    val perQ = g.groupBy(_._1)
    perQ.foreach { case (_, rows) => assert(rows.length <= 2, s"k=2 violated: ${rows.toSeq}") }
    // identical vectors are each other's rank-1 with cosine exactly 1.0
    val r1 = g.find(e => e._1 == 1L && e._4 == 1L).get
    assert(r1._2 === 2L && r1._3 === 1.0)
    val r2 = g.find(e => e._1 == 2L && e._4 == 1L).get
    assert(r2._2 === 1L && r2._3 === 1.0)
  }

  test("contaminationReport: per-(probe, source) doc and shingle counts are exact") {
    val probe = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon", "web"),   // 2 hit shingles (abc, bcd... with n=3: shingles of probe: [abg? no—
      (2L, "alpha beta gamma zeta eta theta", "web"),  // shares shingle (alpha,beta,gamma)
      (3L, "one two three four five six", "books"))    // no overlap
      .toDF("doc_id", "text", "source")
    val rows = DedupOps.contaminationReport(corpus, probe)
      .orderBy("probe_id", "source").collect()
    // probe shingles (n=3): (alpha beta gamma), (beta gamma delta)
    // doc 1 contains both; doc 2 contains the first only; books never hit
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getLong(0) === 100L && r.getString(1) === "web")
    assert(r.getLong(2) === 2L)  // two distinct web docs hit
    assert(r.getLong(3) === 3L)  // three hit shingle occurrences (2 + 1)
  }

  test("curationReport: each rule vetoes independently; dup family keeps its first id") {
    // all 25 words distinct (top-word share 0.04, unique bigrams) with
    // two 'en' function words so every gopher rule AND lang-ID pass
    val fluent = "the quick brown fox jumps over a lazy dog and runs far away " +
      "beyond quiet green hills where old river bends south again toward sunset"
    val d = Seq(
      (1L, fluent, "en"),
      (2L, fluent + " indeed", "en"),                  // near-dup of 1 -> loses to lower id
      (3L, ("zz " * 40).trim, "en"),                   // repetition junk: gopher veto
      (4L, "9 9 9 9 9 9 9 9 9 9 9 9 9 9 9 9 9 9 9 9", "en"))
      .toDF("doc_id", "text", "lang")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val rep = CurateOps.curationReport(d).orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2), r.getBoolean(4), r.getBoolean(5))).toMap
    // doc 1 keeps; doc 2 is the near-dup family's higher id -> dedup_keeper false, kept false
    assert(rep(1L)._3 === true && rep(1L)._4 === true, s"doc 1 must keep: $rep")
    assert(rep(2L)._3 === false && rep(2L)._4 === false, s"doc 2 must lose dedup: $rep")
    // doc 4 is pure repetition: gopher rule vetoes (and lang 'und' too)
    assert(rep(4L)._2 === false && rep(4L)._4 === false)
  }

  test("packingReport: bins, splits, and over-budget docs tie out exactly") {
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val d = Seq(
      (1L, words(300), "en"),   // bin 0, offset 0
      (2L, words(300), "en"),   // starts at 300, crosses the 512 boundary
      (3L, words(600), "fr"))   // alone: over budget AND split
      .toDF("doc_id", "text", "lang")
    val rep = TextOps.packingReport(d, tokenBudget = 512L)
      .orderBy("lang").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5), r.getLong(6), r.getDouble(7))).toMap
    val (enDocs, enTok, enSplit, enOver, enBins, enFill) = rep("en")
    assert(enDocs === 2L && enTok === 600L && enBins === 2L)
    assert(enSplit === 1L && enOver === 0L)
    assert(math.abs(enFill - 600.0 / 1024.0) < 1e-15)
    val (frDocs, frTok, frSplit, frOver, frBins, _) = rep("fr")
    assert(frDocs === 1L && frTok === 600L && frBins === 2L)
    assert(frSplit === 1L && frOver === 1L)
  }

  test("targetAffinity: target-vocab docs outscore off-vocab docs; feature counts tie out") {
    val target = Seq((100L, "alpha beta gamma alpha beta", "t"))
      .toDF("doc_id", "text", "lang")
    val corpus = Seq(
      (1L, "alpha beta gamma", "c"),       // pure target vocabulary
      (2L, "delta epsilon zeta", "c"),     // disjoint vocabulary
      (3L, "alpha beta epsilon zeta", "c")) // mixed
      .toDF("doc_id", "text", "lang")
    val rows = TextOps.targetAffinity(corpus, target)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(4))).toMap
    // n_feats = tokens + bigrams = 2n - 1
    assert(rows(1L)._1 === 5L && rows(2L)._1 === 5L && rows(3L)._1 === 7L)
    // disjoint vocab never hits a target bucket (4096 buckets, ~no collisions)
    assert(rows(2L)._2 === 0L && rows(2L)._3 === 0.0)
    // pure target vocab strictly outscores mixed, mixed outscores disjoint
    assert(rows(1L)._3 > rows(3L)._3 && rows(3L)._3 > rows(2L)._3)
  }

  test("annRecallAtK: identical vectors recall 1.0; n_truth caps at corpus") {
    // 6 copies of the same vector: every probe's true top-k IS its bucket
    val same = (0L to 5L)
      .map(i => (i, Array(1.0f, 2.0f, 3.0f, 4.0f)))
      .toDF("vec_id", "embedding")
    val out = SimOps.annRecallAtK(same, nQueries = 3, k = 5, nBits = 4)
      .orderBy("q_id").collect()
    assert(out.length === 3)
    out.foreach { r =>
      assert(r.getLong(1) === 5L, "top-k of 6-row corpus is the other 5")
      assert(r.getLong(2) === 5L)
      assert(r.getDouble(3) === 1.0)
    }
  }

  test("pairCalibrationHistogram: buckets split by similarity, cum runs high-to-low") {
    // two exact-dup groups (J=1 → bucket 10) and one partial overlap
    // high enough for LSH to surface
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val docs = Seq(
      (1L, base), (2L, base),                       // J = 1.0
      (3L, s"$base kilo"), (4L, s"$base lima"),      // J = 8/10 vs each other
      (5L, "uno dos tres cuatro cinco seis siete ocho nueve diez")
    ).toDF("doc_id", "text")
    val out = graft.operators.DedupOps.pairCalibrationHistogram(docs)
      .orderBy("bucket").collect()
    val byBucket = out.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byBucket.contains(10L), "exact dups land in bucket 10 (J = 1.0)")
    // cum_pairs at the LOWEST bucket equals the total pair count
    val total = out.map(_.getLong(1)).sum
    assert(out.head.getLong(2) === total)
    // cum is non-increasing as buckets rise
    val cums = out.map(_.getLong(2))
    assert(cums.zip(cums.tail).forall { case (lo, hi) => lo >= hi })
  }

  test("sourceOverlapMatrix: planted cross-source dups count once per unordered pair") {
    val a = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val b = "kilo lima mike november oscar papa quebec romeo sierra tango"
    val docs = Seq(
      (1L, a, "srcA"), (2L, a, "srcB"),   // cross-source dup
      (3L, b, "srcB"), (4L, b, "srcB"),   // within-source dup
      (5L, "solo words nothing like the others at all here now", "srcC")
    ).toDF("doc_id", "text", "source")
    val out = graft.operators.DedupOps.sourceOverlapMatrix(docs, minJaccard = 0.9)
      .orderBy("source_lo", "source_hi").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq === Seq(("srcA", "srcB", 1L), ("srcB", "srcB", 1L)))
  }

  test("annRecallAtK: probes with no bucket-mates recall 0, never NULL") {
    // opposite-signed vectors land in different half-spaces for any
    // plane that separates them; with 1 bit the two groups split and a
    // probe's true nearest (the opposite vector) may be unreachable —
    // either way every probe row must exist with a defined recall
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(-1.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f)), (3L, Array(-0.9f, -0.1f))
    ).toDF("vec_id", "embedding")
    val out = SimOps.annRecallAtK(vecs, nQueries = 4, k = 2, nBits = 1)
      .orderBy("q_id").collect()
    assert(out.length === 4, "one row per probe even at zero hits")
    out.foreach { r =>
      assert(!r.isNullAt(3))
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
  }

  test("bottomKSample: nested under the seed, dense ranks, sort-free plan") {
    val docs = (0L until 200L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val df = SampleOps.bottomKSample(docs, "doc_id", 20)
    val s20 = df.collect()
    assert(s20.length === 20)
    assert(s20.map(_.getAs[Long]("sample_rank")).sorted.toSeq ===
      (1L to 20L).toSeq, "ranks are dense 1..k")
    // nestedness: the bottom-5 is exactly the rank<=5 prefix of bottom-20
    val s5 = SampleOps.bottomKSample(docs, "doc_id", 5).collect()
      .map(_.getLong(0)).toSet
    assert(s5 === s20.filter(_.getAs[Long]("sample_rank") <= 5L)
      .map(_.getLong(0)).toSet)
    // partition-layout invariance: same sample from a reshuffled input
    val again = SampleOps.bottomKSample(docs.repartition(7), "doc_id", 20)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("sample_rank")).toMap
    assert(s20.map(r => r.getLong(0) -> r.getAs[Long]("sample_rank")).toMap
      === again)
    // the scale claim: a per-partition heap + k-row merge, never a
    // global Sort+Exchange over the corpus
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      "bottom-k must plan TakeOrderedAndProject, not a global sort")
  }

  test("embeddingHealth: orthogonal pair diagnostics exact; zero vector excluded") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f)),
      (2L, Array(0.0f, 0.0f))        // degenerate: NULL cosine, still counted
    ).toDF("vec_id", "embedding")
    val r = SimOps.embeddingHealth(emb).collect().head
    assert(r.getAs[Long]("n_vecs") === 3L)
    // centroid = (1e6+0+0, 0+1e6+0)/3; norm = sqrt(2)/3 * 1e6
    val cv = 1000000.0 / 3.0
    val c2 = cv * cv + cv * cv
    assert(r.getAs[Long]("centroid_norm_micro") ===
      math.floor(math.sqrt(c2)).toLong)
    // avg norm: (1e6 + 1e6 + 0) / 3 — integer division
    assert(r.getAs[Long]("avg_norm_micro") === 2000000L / 3L)
    // both live vectors share the same cosine to the diagonal centroid
    val cos = (1000000.0 * cv) / (1000000.0 * math.sqrt(c2))
    assert(r.getAs[Long]("avg_cos_centroid_ppm") ===
      math.floor(cos * 1000000.0).toLong)
    assert(r.getAs[Long]("neg_cos_ppm") === 0L)
  }
}
