package graft

import graft.operators.TextOps

class EncodingQualitySpec extends SparkSpec {
  import spark.implicits._

  private def row(text: String) =
    TextOps.encodingQuality(Seq((1L, text)).toDF("doc_id", "text")).head

  test("clean ASCII text keeps: zero flags, sane ratios") {
    val r = row("a clean doc with 3 digits 42")
    assert(r.getAs[Long]("repl_chars") === 0L)
    assert(r.getAs[Long]("ctrl_chars") === 0L)
    assert(r.getAs[Long]("mojibake_hits") === 0L)
    assert(r.getAs[Long]("non_ascii") === 0L)
    assert(r.getAs[Double]("digit_ratio") === 3.0 / 28.0)
    assert(r.getAs[Boolean]("keep"))
  }

  test("U+FFFD replacement characters are counted and gate keep") {
    val r = row("bad � decode � here")
    assert(r.getAs[Long]("repl_chars") === 2L)
    assert(!r.getAs[Boolean]("keep"))
  }

  test("C0 control characters flag binary contamination; tab/newline do not") {
    val dirty = row("a\u0001b\u0007c")
    assert(dirty.getAs[Long]("ctrl_chars") === 2L)
    assert(!dirty.getAs[Boolean]("keep"))
    val legit = row("a\tb\nc\rd")
    assert(legit.getAs[Long]("ctrl_chars") === 0L)
    assert(legit.getAs[Boolean]("keep"))
  }

  test("mojibake signatures: UTF-8-as-Latin-1 lead bytes and mangled punctuation") {
    // "café" double-decoded reads "cafÃ©"; a right single quote U+2019
    // double-decoded reads "â€™" — both must trip the gate
    val r = row("cafÃ© said â€™hello")
    assert(r.getAs[Long]("mojibake_hits") === 2L)
    assert(!r.getAs[Boolean]("keep"))
  }

  test("legitimate non-Latin text is NOT flagged as mojibake, ratio gates extremes") {
    // real Cyrillic: no Ã/â€ signatures, no controls — only the
    // non-ASCII ratio gate applies (here > 0.5 → drop, by design the
    // conservative ASCII-corpus default)
    val r = row("привет мир")
    assert(r.getAs[Long]("mojibake_hits") === 0L)
    assert(r.getAs[Long]("ctrl_chars") === 0L)
    assert(r.getAs[Long]("non_ascii") === 9L)
    assert(!r.getAs[Boolean]("keep"))
    // mostly-ASCII with a few accents passes
    val ok = row("a naive cafe facade with one é only here")
    assert(ok.getAs[Boolean]("keep"))
  }

  test("ws and digit ratios divide as doubles") {
    val r = row("ab 12")
    assert(r.getAs[Double]("ws_ratio") === 1.0 / 5.0)
    assert(r.getAs[Double]("digit_ratio") === 2.0 / 5.0)
    assert(r.getAs[Long]("n_chars_text") === 5L)
  }
}
