package graft

import graft.functions.Scalars
import graft.operators.{DedupOps, RefineOps, SimOps, TextOps}

/** Behavioural pins for the round-13 capability families: watermark
  * detection (q170), char-level Levenshtein near-dup (q171), int8
  * scalar-quantization recall (q172), and DPO preference-pair
  * construction (q173). Cross-engine bit-equality is the oracles' job;
  * these pin the semantics — detector thresholds, blocking contracts,
  * tie rules — on constructed fixtures. */
class Round13FamiliesSpec extends SparkSpec {
  import spark.implicits._

  // Independent green-count expectation via the JVM-side h60 (the same
  // md5 math the Catalyst expression implements, through a different
  // code path).
  private def greens(text: String): (Long, Long) = {
    val tk = text.split(" ", -1)
    if (tk.length < 2) (0L, 0L)
    else {
      val g = tk.sliding(2).count {
        case Array(a, b) => Scalars.h60Jvm(s"$a|$b") % 2 == 0
        case _ => false
      }
      ((tk.length - 1).toLong, g.toLong)
    }
  }

  test("watermarkScan: planted green run flags, natural text does not") {
    val natural =
      "the quick brown fox jumps over the lazy dog again and again today"
    val docs = Seq(
      (1L, s"lead tokens ${TextOps.WmPlant}"),
      (2L, natural),
      (3L, ""),
      (4L, "one")).toDF("doc_id", "text")
    val out = TextOps.watermarkScan(docs).orderBy("doc_id").collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    // exact counts match the independent JVM-side expectation
    Seq(1L -> s"lead tokens ${TextOps.WmPlant}", 2L -> natural).foreach {
      case (id, text) =>
        val (t, g) = greens(text)
        assert(byId(id).getLong(1) === t, s"doc $id t_scored")
        assert(byId(id).getLong(2) === g, s"doc $id green_cnt")
    }
    // the planted run clears z >= 4; natural text must not
    assert(byId(1L).getBoolean(4), "planted doc must flag")
    assert(!byId(2L).getBoolean(4), "natural text must not flag")
    // degenerate docs: zero scored tokens, never flagged
    Seq(3L, 4L).foreach { id =>
      assert(byId(id).getLong(1) === 0L)
      assert(byId(id).getLong(2) === 0L)
      assert(byId(id).getLong(3) === 0L)
      assert(!byId(id).getBoolean(4), s"doc $id must not flag on t=0")
    }
  }

  test("levNearDupPairs: edits caught, blocking contract enforced") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zetb"), // one char edit
      (3L, "alpha beta gamma delta epsilon zeta"), // exact dup of 1
      (4L, "omega beta gamma delta epsilon zeta"), // prefix differs -> out of block
      (5L, "alpha beta gamma " + "x" * 60) // same block, length window excludes
    ).toDF("doc_id", "text")
    val out = DedupOps.levNearDupPairs(docs).orderBy("a_id", "b_id").collect()
    val pairs = out.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L), (1L, 3L), (2L, 3L)))
    val byPair = out.map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    val len = "alpha beta gamma delta epsilon zeta".length.toLong
    // exact dup: lev 0, sim 1e6
    assert(byPair((1L, 3L)).getLong(2) === 0L)
    assert(byPair((1L, 3L)).getLong(4) === 1000000L)
    // one edit: lev 1, sim = ((len-1)*1e6) div len
    assert(byPair((1L, 2L)).getLong(2) === 1L)
    assert(byPair((1L, 2L)).getLong(4) === (len - 1) * 1000000L / len)
  }

  test("levNearDupPairs: multi-byte text runs the same codepoint DP (unicode pin)") {
    // r13 ADVICE: the scaladoc's "same classic DP over codepoints" claim
    // was only hash-proven on effectively-ASCII candidates. This fixture
    // plants accented near-dups and pins the Spark result to an
    // independent JVM codepoint DP — if either engine's levenshtein or
    // length ever counts bytes instead of codepoints on multi-byte
    // UTF-8, this fails loudly instead of surfacing on a real corpus.
    val a = "café au lait crème brûlée naïveté søster grüße"
    val b = "café au lait crème brulée naïveté søster grüße" // û -> u
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val out = DedupOps.levNearDupPairs(docs, simMinPpm = 0L).collect()
    assert(out.length === 1)
    def dp(x: String, y: String): Int = {
      val xs = x.codePoints.toArray; val ys = y.codePoints.toArray
      val d = Array.tabulate(xs.length + 1, ys.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to xs.length; j <- 1 to ys.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (xs(i - 1) == ys(j - 1)) 0 else 1))
      d(xs.length)(ys.length)
    }
    val r = out.head
    assert(r.getLong(2) === dp(a, b).toLong, "lev over codepoints")
    val maxLen = math.max(a.codePointCount(0, a.length),
      b.codePointCount(0, b.length)).toLong
    assert(r.getLong(3) === maxLen, "max_len counts codepoints, not bytes")
    assert(r.getLong(4) === (maxLen - dp(a, b)) * 1000000L / maxLen)
  }

  test("sq8Recall: quantization-preserving fixture reads full recall") {
    // No zero vector here: the float TRUTH pass (cosineTopK, the q39
    // contract) requires nonzero norms — the ss=0 guard inside the code
    // ranking is pure division protection, not an input class.
    val e = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.99f, 0.01f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.0f, 0.99f, 0.01f))
    ).toDF("vec_id", "embedding")
    val out = SimOps.sq8Recall(e, nQueries = 2, k = 1)
      .orderBy("q_id").collect()
    assert(out.length === 2)
    out.foreach { r =>
      assert(r.getLong(1) === 1L, s"probe ${r.getLong(0)} must keep its true neighbor")
      assert(r.getLong(2) === 1000000L)
    }
  }

  test("phraseMatch: overlapping occurrences counted, positions 1-based exact") {
    val docs = Seq(
      (1L, "a b a b a"), // phrase "a b a" at 1 and 3 — overlap counts twice
      (2L, "a b c"),
      (3L, "x a b a y"),
      (4L, "a b") // shorter than the phrase
    ).toDF("doc_id", "text")
    val out = TextOps.phraseMatch(docs, Seq("a", "b", "a"))
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 3L))
    assert(out(0).getLong(1) === 2L)
    assert(out(0).getLong(2) === 1L)
    assert(out(0).getString(3) === "1,3")
    assert(out(1).getLong(1) === 1L)
    assert(out(1).getLong(2) === 2L)
    assert(out(1).getString(3) === "2")
  }

  test("nearDupFusion: exact dups carry all three signals; token reorder drops only Levenshtein") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, base),
      (2L, base), // exact dup of 1: every detector fires -> mask 7
      // same token SET as 1 but fully reordered: SimHash (an
      // order-free token-set sketch) reads it IDENTICAL (hamming 0);
      // MinHash's 3-gram shingles share nothing, Levenshtein's chars
      // are scrambled -> mask 2, the blind-spot matrix in one pair
      (3L, "kappa iota theta eta zeta epsilon delta gamma beta alpha"),
      (4L, "one totally unrelated document about something else entirely here")
    ).toDF("doc_id", "text")
    val out = DedupOps.nearDupFusion(docs)
      .orderBy("a", "b").collect()
    val byPair = out.map(r => (r.getLong(0), r.getLong(1)) ->
      (r.getLong(2), r.getLong(3))).toMap
    assert(byPair((1L, 2L)) === ((7L, 3L)), "exact dup: all three detectors")
    assert(byPair((1L, 3L)) === ((2L, 1L)),
      "full reorder: SimHash only — set sketch fires, shingles and chars cannot")
    assert(!byPair.keySet.exists { case (a, b) => a == 4L || b == 4L },
      "unrelated doc pairs with nothing")
  }

  test("preferencePairs: tie goes to the earlier event, flat groups drop") {
    val events = Seq(
      // user 1 task a: top value tied between 10 and 11 -> chosen 10
      (10L, 1L, "a", 5.0),
      (11L, 1L, "a", 5.0),
      (12L, 1L, "a", 1.0),
      // user 1 task b: singleton -> dropped
      (20L, 1L, "b", 3.0),
      // user 2 task a: all equal -> no positive gap -> dropped
      (30L, 2L, "a", 2.0),
      (31L, 2L, "a", 2.0),
      // user 2 task b: bottom value tied between 41 and 42 -> rejected 41
      (40L, 2L, "b", 9.0),
      (41L, 2L, "b", 4.0),
      (42L, 2L, "b", 4.0)
    ).toDF("event_id", "user_id", "event_type", "value")
    val out = RefineOps.preferencePairs(events)
      .orderBy("user_id", "event_type").collect()
    assert(out.length === 2)
    val r1 = out(0)
    assert((r1.getLong(0), r1.getString(1)) === ((1L, "a")))
    assert(r1.getLong(3) === 10L, "chosen tie -> earlier event id")
    assert(r1.getLong(4) === 12L)
    assert(r1.getDouble(7) === 4.0)
    val r2 = out(1)
    assert((r2.getLong(0), r2.getString(1)) === ((2L, "b")))
    assert(r2.getLong(3) === 40L)
    assert(r2.getLong(4) === 41L, "rejected tie -> earlier event id")
    assert(r2.getDouble(7) === 5.0)
  }
}
