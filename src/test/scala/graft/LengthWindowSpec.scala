package graft

import graft.operators.TextOps

/** The `approx = true` at-scale path of [[TextOps.lengthWindowFilter]]
  * (round-5 verdict item 7): the documented percentile_approx swap must
  * be exercised code with its drift pinned, not a scaladoc promise. The
  * DuckDB oracle can't replay the sketch, so this spec is the check —
  * recorded decision, allowed by the item. */
class LengthWindowSpec extends SparkSpec {
  import spark.implicits._

  // two strata plus a NULL stratum; lengths are a 1..200 ramp so the
  // exact interpolated cutoffs (10.95 / 190.05 at 5/95%) sit between
  // integers while approx returns actual data values nearby
  private def fixture = {
    val en = (1 to 200).map(i => (i.toLong, "en", i.toLong))
    val fr = (1 to 100).map(i => (1000L + i, "fr", (i * 3).toLong))
    val nul = (1 to 50).map(i => (2000L + i, null: String, (i * 2).toLong))
    (en ++ fr ++ nul).toDF("doc_id", "lang", "n_chars")
  }

  test("approx path runs, is deterministic, and keeps the exact path's schema") {
    val exact = TextOps.lengthWindowFilter(fixture)
    val approx = TextOps.lengthWindowFilter(fixture, approx = true)
    assert(approx.schema.map(f => (f.name, f.dataType)) ===
      exact.schema.map(f => (f.name, f.dataType)))
    val a1 = approx.select("doc_id").collect().map(_.getLong(0)).toSet
    val a2 = TextOps.lengthWindowFilter(fixture, approx = true)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a1 === a2, "sketch cutoffs must be deterministic run-to-run")
  }

  test("exact-vs-approx membership drift is boundary-only") {
    val exact = TextOps.lengthWindowFilter(fixture)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val approx = TextOps.lengthWindowFilter(fixture, approx = true)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // at accuracy 10000 on a 350-row fixture the sketch is lossless; the
    // only divergence is interpolation (exact returns 10.95, approx an
    // actual element) — at most one element per cutoff per stratum
    val drift = (exact diff approx) ++ (approx diff exact)
    assert(drift.size <= 6, s"drift ${drift.size} exceeds boundary tolerance: $drift")
    // and every drifted doc sits AT a stratum boundary, not mid-window:
    // its n_chars is within one ramp step of an exact cutoff
    val cuts = Map("en" -> (10.95, 190.05), "fr" -> (17.85, 286.15),
      " " -> (5.9, 97.1))
    val rows = fixture.collect()
      .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse(" "), r.getLong(2)))
      .filter(t => drift(t._1))
    rows.foreach { case (id, lang, n) =>
      val (lo, hi) = cuts(lang)
      val step = lang match { case "fr" => 3.0; case " " => 2.0; case _ => 1.0 }
      assert(math.abs(n - lo) <= step || math.abs(n - hi) <= step,
        s"doc $id (stratum $lang, n_chars $n) drifted but is not at a boundary")
    }
  }

  test("a NULL stratum still trims through the approx path") {
    val approx = TextOps.lengthWindowFilter(fixture, approx = true)
    val nullKept = approx.filter(col("lang").isNull).count()
    assert(nullKept >= 40 && nullKept < 50,
      s"NULL stratum must trim its own window, kept $nullKept of 50")
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)
}
