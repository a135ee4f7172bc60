package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.{col, size, split}

import graft.operators.{DedupOps, TextOps}

/** Hand-computed cases for the round-6 additions: exact duplicated-span
  * census (q101, Lee et al. EXACTSUBSTR) and distributed BPE merge
  * induction (q102). */
class DupSpanBpeSpec extends SparkSpec {
  import spark.implicits._

  test("dupSpanStats: canonical-first, within-doc repeats, span merging") {
    // w=3. "a b c"/"b c d" occur in docs 1+2 (canonical doc1);
    // doc 3 is "z"x7 (within-doc repeated window, canonical pos 1);
    // doc 9 has "k k k" at pos 1,2,9,10 — canonical pos 1, flagged
    // {2, 9, 10} merge into TWO islands (gap 9-2=7 > w).
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d x y"),
      (3L, "z z z z z z z"),
      (9L, "k k k k z1 z2 z3 z4 k k k k")
    ).toDF("doc_id", "text")
    val out = DedupOps.dupSpanStats(docs, w = 3).orderBy("doc_id").collect()

    // doc_id, n_tokens, n_dup_windows, n_spans, dup_tokens, max_span
    val ints = out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(ints === Array(
      (1L, 6L, 0L, 0L, 0L, 0L),   // canonical occurrences: never flagged
      (2L, 6L, 2L, 1L, 4L, 4L),   // pos 1,2 merge: span tokens 1..4
      (3L, 7L, 4L, 1L, 6L, 6L),   // pos 2..5 one island: tokens 2..7
      (9L, 12L, 3L, 2L, 7L, 4L))) // islands {2} (3 tk) + {9,10} (4 tk)
    val fracs = out.map(_.getDouble(6))
    assert(fracs(0) === 0.0 && fracs(1) === 4.0 / 6 &&
      fracs(2) === 6.0 / 7 && fracs(3) === 7.0 / 12)
  }

  test("dupSpanExcise: drops covered tokens, keeps canonical copies byte-exact") {
    // same fixture as the census test (w=3); expectations derived from
    // the flagged sets asserted there: doc2 covers pos 1..4, doc3 pos
    // 2..7 (canonical window pos 1 keeps token 1), doc9 pos {2..4, 9..12}
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d x y"),
      (3L, "z z z z z z z"),
      (9L, "k k k k z1 z2 z3 z4 k k k k")
    ).toDF("doc_id", "text")
    val out = DedupOps.dupSpanExcise(docs, w = 3).orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getString(4))) === Array(
      (1L, 6L, 6L, 0L, "a b c d e f"),
      (2L, 6L, 2L, 4L, "x y"),
      (3L, 7L, 1L, 6L, "z"),
      (9L, 12L, 5L, 7L, "k z1 z2 z3 z4")))
  }

  test("dupSpanExcise: pure duplicate collapses to empty; partition-invariant") {
    val rows = Seq(
      (1L, "p q r s t u"),  // canonical — survives byte-exact
      (5L, "p q r s t u"),  // full duplicate — every position covered
      (7L, "m m m"))        // single unique window — untouched
    def run(parts: Int) = DedupOps
      .dupSpanExcise(rows.toDF("doc_id", "text").repartition(parts), w = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getString(4))).toSeq
    val one = run(1)
    assert(one === Seq((1L, 6L, "p q r s t u"), (5L, 0L, ""), (7L, 3L, "m m m")))
    assert(run(7) === one, "excision must not depend on partitioning")
  }

  test("dupSpanStats: docs shorter than w emit zero windows, never join") {
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a b c")).toDF("doc_id", "text")
    // identical 2-token docs share NO 3-token window — all zeros
    val out = DedupOps.dupSpanStats(docs, w = 3).orderBy("doc_id").collect()
    assert(out.forall(r => r.getLong(2) == 0L && r.getLong(4) == 0L))
  }

  test("bpeMerges: greedy-leftmost merges and merge hierarchy") {
    val docs = Seq((1L, "a b a b c"), (2L, "a b c c")).toDF("doc_id", "text")
    val out = TextOps.bpeMerges(docs, rounds = 3).collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getString(2),
      r.getLong(3))) === Array(
      (1L, "a", "b", 3L),         // "a b" x3 across both docs
      (2L, "a~b", "c", 2L),       // after merge: a~b precedes c twice
      (3L, "a~b", "a~b~c", 1L)))  // tie (both pairs x1) breaks by lhs asc
  }

  test("bpeMerges: self-pair merges greedy-leftmost (a a a -> a~a a)") {
    val docs = Seq((1L, "x x x")).toDF("doc_id", "text")
    val out = TextOps.bpeMerges(docs, rounds = 2).collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getString(2),
      r.getLong(3))) === Array(
      (1L, "x", "x", 2L),     // both adjacent pairs counted pre-merge
      (2L, "x~x", "x", 1L)))  // greedy leftmost: first two merged, not last
  }

  test("bpeEncode: applies every learned merge incl. the last round, exact readout") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b a b"),
      (2L, "a b c")
    ).toDF("doc_id", "text")
    // round 1: (a,b) count 4 -> merge; round 2: (a~b,a~b) count 2 -> merge
    val out = TextOps.bpeEncode(docs, rounds = 2).orderBy("doc_id")
      .select("doc_id", "n_tokens", "n_symbols", "n_merged",
        "compression_ppm", "encoded_text")
      .as[(Long, Long, Long, Long, Long, String)].collect()
    assert(out(0) == ((1L, 6L, 2L, 2L, 333333L, "a~b~a~b a~b")),
      s"doc1 read ${out(0)}")
    assert(out(1) == ((2L, 3L, 2L, 1L, 666666L, "a~b c")),
      s"doc2 read ${out(1)}")
  }

  test("bpeEncode: n_tokens reconstruction matches the original token count") {
    import spark.implicits._
    val docs = Seq(
      (1L, "u v w u v w u v"),
      (2L, "solo")
    ).toDF("doc_id", "text")
    val orig = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n0"))
    val enc = TextOps.bpeEncode(docs, rounds = 3)
    val joined = enc.join(orig, "doc_id")
      .select("doc_id", "n_tokens", "n0").as[(Long, Long, Long)].collect()
    assert(joined.forall { case (_, nt, n0) => nt == n0 },
      s"reconstructed counts drifted: ${joined.toSeq}")
  }

  test("qualityThresholdSweep: exact survivors at every cutoff, monotone, ppm") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x x x x"),                 // quality 0.45
      (2L, "alpha beta gamma delta")   // quality 0.91875
    ).toDF("doc_id", "text")
    val out = TextOps.qualityThresholdSweep(docs, steps = 10)
      .select("tau", "kept_docs", "kept_tokens", "docs_ppm", "tokens_ppm")
      .as[(Double, Long, Long, Long, Long)].collect()
    assert(out.length == 10)
    assert(out.map(_._1).toSeq == (0 until 10).map(_ / 10.0))
    out.foreach { case (tau, kd, kt, dp, tp) =>
      if (tau <= 0.4) assert((kd, kt, dp, tp) == ((2L, 8L, 1000000L, 1000000L)),
        s"tau=$tau read ${(kd, kt, dp, tp)}")
      else assert((kd, kt, dp, tp) == ((1L, 4L, 500000L, 500000L)),
        s"tau=$tau read ${(kd, kt, dp, tp)}")
    }
    val kds = out.map(_._2)
    assert(kds.zip(kds.tail).forall { case (a, b) => a >= b }, "monotone in tau")
  }
}
