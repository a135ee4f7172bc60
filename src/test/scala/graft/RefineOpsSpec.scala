package graft

import org.apache.spark.sql.functions._

import graft.operators.{RefineOps, SimOps, TextOps}

/** Behavioural pins for the corpus-refinement family
  * ([[graft.operators.RefineOps]], [[graft.operators.SimOps.ivfNprobeRecall]]):
  * keeper policy, intra-doc dedup order, leakage censuses, TF-IDF ranks,
  * ROI accounting, and nprobe-recall monotonicity. Cross-engine
  * bit-equality is the q114–q119 oracles' job; this spec pins semantics
  * on constructed fixtures plus the zero-shuffle plan property that is
  * q115's whole scale argument. */
class RefineOpsSpec extends SparkSpec {
  import spark.implicits._

  private val keyExpr = "md5(array_join(slice(split(text, ' '), 1, 3), ' '))"

  test("qualityKeeperDedup: the cleanest copy wins, not the first") {
    val docs = Seq(
      // cluster A (same 3-token prefix): doc 1 is degenerate repetition
      // (low TTR), doc 2 is varied — the LATER, higher-quality doc must
      // win, which is exactly where first-occurrence-wins differs.
      (1L, "shared key prefix spam spam spam spam spam spam spam"),
      (2L, "shared key prefix alpha bravo charlie delta echo foxtrot golf"),
      // singleton cluster: its own keeper
      (3L, "lone document here with some more varied tokens")
    ).toDF("doc_id", "text")
    val out = RefineOps.qualityKeeperDedup(docs, keyExpr)
      .orderBy("doc_id").collect()
    assert(out.length === 3)
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getLong(3) === 2L, "cluster keeper must be the varied doc")
    assert(!byId(1L).getBoolean(4))
    assert(byId(2L).getLong(3) === 2L)
    assert(byId(2L).getBoolean(4))
    assert(byId(3L).getLong(3) === 3L)
    assert(byId(3L).getBoolean(4))
    // keeper has the max quality in its cluster
    assert(byId(2L).getDouble(2) > byId(1L).getDouble(2))
  }

  test("dedupLinesWithinDoc: first occurrence survives in order; plan is shuffle-free") {
    val lines = Seq(
      (1L, Seq("a b", "c d", "a b", "e f", "c d")),
      (2L, Seq("x y")),
      (3L, Seq.empty[String])
    ).toDF("doc_id", "lines")
    val df = RefineOps.dedupLinesWithinDoc(lines)
    val out = df.orderBy("doc_id").collect()
    assert(out(0).getLong(1) === 5L && out(0).getLong(2) === 3L &&
      out(0).getLong(3) === 2L)
    assert(out(0).getString(4) === "a b\nc d\ne f",
      "survivors keep original order")
    assert(out(1).getString(4) === "x y" && out(1).getLong(3) === 0L)
    assert(out(2).getLong(1) === 0L && out(2).getString(4) === "")
    // the scale argument: intra-doc dedup is per-row — NO exchange
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      "within-doc dedup must not shuffle — it is a per-row computation")
  }

  test("sourceLeakageMatrix: shared segments counted once, containment exact") {
    // 8-token docs → each doc is exactly one segment; s1 and s2 share
    // one segment text (via duplicate docs), s3 is disjoint.
    val seg1 = "one two three four five six seven eight"
    val seg2 = "alpha bravo charlie delta echo foxtrot golf hotel"
    val docs = Seq(
      (1L, seg1, "s1"), (2L, seg2, "s1"),   // s1: 2 distinct segs
      (3L, seg1, "s2"),                     // s2: 1 distinct seg
      (4L, "nine ten eleven twelve thirteen fourteen fifteen sixteen", "s3")
    ).toDF("doc_id", "text", "source")
    val out = RefineOps.sourceLeakageMatrix(docs, segTokens = 8).collect()
    assert(out.length === 1, "only the overlapping pair appears")
    val r = out.head
    assert(r.getAs[String]("source_a") === "s1" &&
      r.getAs[String]("source_b") === "s2")
    assert(r.getAs[Long]("shared_segs") === 1L)
    assert(r.getAs[Long]("n_segs_a") === 2L && r.getAs[Long]("n_segs_b") === 1L)
    // containment = 1/min(2,1) = 1 → 1_000_000 ppm
    assert(r.getAs[Long]("containment_ppm") === 1000000L)
  }

  test("tfidfKeywords: a source-exclusive term outranks a ubiquitous one") {
    val docs = Seq(
      (1L, "the the the quantum quantum flux", "phys"),
      (2L, "the the sonnet sonnet meter", "lit"),
      (3L, "the the sonnet ballad rhyme", "lit")
    ).toDF("doc_id", "text", "source")
    val out = RefineOps.tfidfKeywords(docs, topK = 1).orderBy("source").collect()
    // lit: 'sonnet' tf=3 · idf 3/2 = 4.5 beats 'the' tf=4 · idf 1 = 4;
    // phys: 'quantum' tf=2 · idf 3 = 6 beats 'the' tf=3 · idf 1 = 3
    assert(out(0).getAs[String]("source") === "lit" &&
      out(0).getAs[String]("term") === "sonnet")
    assert(out(1).getAs[String]("source") === "phys" &&
      out(1).getAs[String]("term") === "quantum")
    assert(out(1).getAs[Double]("score") === 6.0)
  }

  test("dedupYieldCurve: removable mass excludes exactly one keeper per cluster") {
    val docs = Seq(
      // one size-2 cluster (chars 100 + 60; keeper = doc 1 → 60 removable)
      (1L, "dup key here tail one", 100L),
      (2L, "dup key here tail two", 60L),
      // one singleton (nothing removable)
      (3L, "solo text entirely different", 40L)
    ).toDF("doc_id", "text", "n_chars")
    val out = RefineOps.dedupYieldCurve(docs, keyExpr)
      .orderBy("cluster_size").collect()
    assert(out.length === 2)
    assert(out(0).getAs[Long]("cluster_size") === 1L &&
      out(0).getAs[Long]("n_clusters") === 1L &&
      out(0).getAs[Long]("removable_chars") === 0L)
    assert(out(1).getAs[Long]("cluster_size") === 2L &&
      out(1).getAs[Long]("bucket_chars") === 160L &&
      out(1).getAs[Long]("removable_chars") === 60L)
    // ppm of the 200-char corpus: 60 * 1e6 div 200 = 300000
    assert(out(1).getAs[Long]("removable_ppm") === 300000L)
  }

  test("ivfNprobeRecall: recall is monotone in nprobe and complete at k cells") {
    val emb = Tables.embeddings(spark)
    val out = SimOps.ivfNprobeRecall(emb, k = 4, nQueries = 10, topK = 3,
      sweep = Seq(1, 2, 4)).collect()
    assert(out.map(_.getAs[Long]("nprobe")).toSeq === Seq(1L, 2L, 4L))
    val truths = out.map(_.getAs[Long]("n_truth")).distinct
    assert(truths.length === 1, "n_truth is the same denominator per row")
    val recalls = out.map(_.getAs[Long]("recall_ppm"))
    assert(recalls.sliding(2).forall(p => p(0) <= p(1)),
      "searching more cells can only add candidates")
    // probing ALL cells makes every home cell reachable → recall 1
    assert(recalls.last === 1000000L,
      "nprobe = k must recover the exact top-k")
  }

  private object Tables {
    def embeddings(s: org.apache.spark.sql.SparkSession) =
      s.read.parquet(sf("sf0.001") + "/embeddings.parquet")
  }

  test("leakageSafeSplit: cluster members never straddle a split") {
    val docs = Seq(
      (1L, "shared key prefix one"), (2L, "shared key prefix two"),
      (3L, "another cluster here alpha"), (4L, "another cluster here beta"),
      (5L, "lone wolf document text")
    ).toDF("doc_id", "text")
    val out = RefineOps.leakageSafeSplit(docs, keyExpr).collect()
    assert(out.length === 5)
    val byId = out.map(r => r.getLong(0) -> r).toMap
    // cluster members share keeper AND split
    assert(byId(1L).getLong(1) === 1L && byId(2L).getLong(1) === 1L)
    assert(byId(1L).getString(2) === byId(2L).getString(2))
    assert(byId(3L).getString(2) === byId(4L).getString(2))
    assert(out.forall(r => Set("train", "val", "test")(r.getString(2))))
    // determinism: same input → identical assignment
    val again = RefineOps.leakageSafeSplit(docs, keyExpr).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out.map(r => r.getLong(0) -> r.getString(2)).toMap === again)
  }

  test("incrementalDedup: batch docs match the index side only") {
    val base = "one two three four five six seven eight nine ten"
    val docs = Seq(
      // index side (ids not ≡ 0 mod 5)
      (1L, base),                                        // index original
      (2L, "completely different index content words entirely unrelated here"),
      // batch side (ids ≡ 0 mod 5)
      (5L, base.replace("ten", "eleven")),               // near-dup of doc 1
      (10L, base.replace("ten", "eleven")),              // near-dup of doc 5 AND doc 1
      (15L, "unique batch document with fresh never seen tokens")
    ).toDF("doc_id", "text")
    val out = RefineOps.incrementalDedup(docs, "doc_id % 5 = 0",
      minJaccard = 0.5).orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(5L, 10L, 15L))
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(byId(5L).getBoolean(1) && byId(5L).getLong(2) === 1L,
      "batch doc must match its index near-dup")
    // doc 10 is IDENTICAL to batch doc 5 — but batch-batch matches are
    // out of contract; it must resolve against the INDEX side only
    assert(byId(10L).getBoolean(1) && byId(10L).getLong(2) === 1L,
      "batch-batch pairing must not occur; index match expected")
    assert(!byId(15L).getBoolean(1) && byId(15L).getLong(2) === -1L &&
      byId(15L).getDouble(3) === 0.0)
  }

  test("corpusDiff: added / removed / modified classified; unchanged silent") {
    val v1 = Seq((1L, "same text"), (2L, "will change"), (3L, "will vanish"))
      .toDF("doc_id", "text")
    val v2 = Seq((1L, "same text"), (2L, "has changed"), (4L, "brand new"))
      .toDF("doc_id", "text")
    val out = RefineOps.corpusDiff(v1, v2).orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(out.toSeq === Seq(2L -> "modified", 3L -> "removed", 4L -> "added"))
  }

  test("dedupFunnel: each tier removes its own class of duplicate") {
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val docs = Seq(
      (0L, base, 100L),
      (1L, base, 100L),                         // exact copy → tier 1
      (2L, base.replace("juliet", "kilo"), 90L), // near-dup → tier 2
      (3L, "entirely different words nothing shared with the others at all", 80L),
      (4L, "another fully distinct document with its own vocabulary set", 70L)
    ).toDF("doc_id", "text", "n_chars")
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(1.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f)), (3L, Array(0.0f, 1.0f)),
      (4L, Array(0.9f, 0.05f))                  // cosine ≈ 0.998 to doc 0 → tier 3
    ).toDF("vec_id", "embedding")
    val out = RefineOps.dedupFunnel(docs, emb, "md5(text)",
      minJaccard = 0.5, minCosine = 0.9, k = 2).collect()
    val byTier = out.map(r => r.getString(0) -> r).toMap
    assert(byTier("0_all").getLong(2) === 5L)
    assert(byTier("1_exact").getLong(3) === 1L, "exact copy removed in tier 1")
    assert(byTier("2_minhash").getLong(3) === 1L, "near-dup removed in tier 2")
    assert(byTier("3_semantic").getLong(3) === 1L, "semantic dup removed in tier 3")
    assert(byTier("3_semantic").getLong(2) === 2L &&
      byTier("3_semantic").getLong(4) === 180L, "docs 0 and 3 survive")
    // ppm of the 5-doc corpus: each tier removed 1 doc = 200000 ppm
    assert(byTier("2_minhash").getLong(5) === 200000L)
  }

  test("ivfPqAdc: exact when vectors sit on their codewords; ranks dense") {
    // Two exact point masses per subspace: codebook centroids collapse
    // onto the data, so ADC equals the true squared micro-unit distance.
    // A = (1,1) at ids 0/2/4, B = (9,9) at ids 1/3/5; one coarse cell.
    val emb = Seq(
      (0L, Array(1.0f, 1.0f)), (1L, Array(9.0f, 9.0f)),
      (2L, Array(1.0f, 1.0f)), (3L, Array(9.0f, 9.0f)),
      (4L, Array(1.0f, 1.0f)), (5L, Array(9.0f, 9.0f))
    ).toDF("vec_id", "embedding")
    val out = SimOps.ivfPqAdc(emb, kCells = 1, m = 2, kCodes = 2,
      rounds = 2, nQueries = 1, topK = 3)
      .orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("rank")).toSeq === Seq(1L, 2L, 3L))
    // same-codeword neighbors score 0 and outrank the far mass
    assert(out(0).getAs[Long]("n_id") === 2L &&
      out(0).getAs[Long]("adc_dist2") === 0L)
    assert(out(1).getAs[Long]("n_id") === 4L &&
      out(1).getAs[Long]("adc_dist2") === 0L)
    // (9e6 − 1e6)² per dimension × 2 dims = 1.28e14 micro-units²
    assert(out(2).getAs[Long]("n_id") === 1L &&
      out(2).getAs[Long]("adc_dist2") === 128000000000000L)
  }

  test("sourceEmbeddingAffinity: parallel sources 1e6 ppm, orthogonal 0") {
    val docs = Seq(
      (0L, "s1"), (1L, "s1"), (2L, "s2"), (3L, "s3")
    ).toDF("doc_id", "source")
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f)), (3L, Array(1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = RefineOps.sourceEmbeddingAffinity(docs, emb)
      .orderBy("source_a", "source_b").collect()
    assert(out.length === 3)
    val m = out.map(r => (r.getString(0), r.getString(1)) ->
      r.getAs[Long]("cosine_ppm")).toMap
    assert(m(("s1", "s2")) === 0L, "orthogonal centroids")
    assert(m(("s1", "s3")) === 1000000L, "identical centroids")
    assert(m(("s2", "s3")) === 0L)
    val r12 = out.find(r => r.getString(0) == "s1" && r.getString(1) == "s2").get
    assert(r12.getAs[Long]("n_docs_a") === 2L &&
      r12.getAs[Long]("n_docs_b") === 1L)
  }

  test("trainingShards: hash-stable shards, dense positions, append-stable") {
    val docs = (0L until 40L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val out = RefineOps.trainingShards(docs, nShards = 4).collect()
    assert(out.length === 40)
    // shard is the content-free h60 of the id — recomputable
    out.foreach { r =>
      val expect = graft.functions.Scalars.h60Jvm(s"shard:${r.getLong(0)}") % 4
      assert(r.getAs[Long]("shard") === expect)
    }
    // positions are dense 0..n-1 within each shard
    out.groupBy(_.getAs[Long]("shard")).foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Long]("pos")).sorted.toSeq ===
        (0L until rows.length.toLong).toSeq)
    }
    // append stability: adding docs never moves an existing doc's shard
    val more = (0L until 60L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val again = RefineOps.trainingShards(more, nShards = 4).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("shard")).toMap
    out.foreach(r => assert(again(r.getLong(0)) === r.getAs[Long]("shard")))
  }

  test("budgetSelection: kept is a best-first prefix, boundary is the first unaffordable bucket") {
    // three quality strata: unique-word docs (high ttr), half-repeated,
    // stopword-heavy — distinct buckets by construction
    val docs = (
      (1L to 3L).map(i => (i, s"alpha$i beta$i gamma$i delta$i epsilon$i zeta$i")) ++
      (4L to 6L).map(i => (i, s"rep$i rep$i rep$i rep$i other$i other$i")) ++
      (7L to 9L).map(i => (i, "the a of and the a of and the a of and"))
    ).toDF("doc_id", "text")
    def run(budget: Long) = RefineOps.budgetSelection(docs, budget)
      .orderBy(col("bucket").desc).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getBoolean(4), r.getBoolean(5)))
    val all = run(1000L) // >= total tokens (54): everything kept
    assert(all.length >= 3, "strata must land in distinct buckets")
    assert(all.forall(_._4) && all.forall(!_._5), "budget >= corpus: all kept, no boundary")
    assert(all.map(_._3).toSeq === all.map(_._3).sorted.toSeq, "cum_tokens monotone")
    val none = run(0L)
    assert(none.forall(!_._4), "budget 0 keeps nothing")
    assert(none.head._5 && none.count(_._5) === 1, "best bucket is the boundary")
    // budget = exactly the best bucket's mass: prefix property + boundary
    val firstMass = all.head._2
    val part = run(firstMass)
    assert(part.head._4, "the best bucket is affordable exactly")
    val keptFlags = part.map(_._4).toSeq
    assert(keptFlags === keptFlags.sorted.reverse, "kept is a prefix best-first")
    val bIdx = part.indexWhere(_._5)
    assert(bIdx === keptFlags.count(identity),
      "boundary sits immediately after the kept prefix")
    assert(part.count(_._5) === 1)
  }

  test("dedupWeightedMass: cluster members split unit mass; singletons keep it whole") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val docs = Seq(
      1L -> base,
      2L -> base.replace("sigma", "sygma"),        // near-dup of 1
      3L -> base.replace("upsilon", "ypsilon"),    // near-dup of 1 and 2
      4L -> (1 to 20).map(i => s"unique$i").mkString(" ")
    ).toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val out = RefineOps.dedupWeightedMass(docs)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    // the triple collapses to one cluster keyed by its min id
    for (id <- Seq(1L, 2L, 3L)) {
      val (cid, size, w, n, wm) = out(id)
      assert(cid === 1L && size === 3L && w === 333333L)
      assert(wm === n * 1000000L / 3L, s"doc $id weighted mass")
    }
    val (cid4, size4, w4, n4, wm4) = out(4L)
    assert(cid4 === 4L && size4 === 1L && w4 === 1000000L && wm4 === n4 * 1000000L)
    // total weighted mass ≈ one copy of the cluster + the singleton:
    // count-once in expectation (floor slack < cluster_size ppm)
    val clusterTokens = out(1L)._4
    val weighted = Seq(1L, 2L, 3L).map(out(_)._5).sum
    assert(weighted <= clusterTokens * 1000000L &&
      weighted > (clusterTokens - 1) * 1000000L - 3L,
      "cluster mass sums to ~one copy")
  }
}
