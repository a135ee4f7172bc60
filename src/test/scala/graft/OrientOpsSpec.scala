package graft

import org.apache.spark.sql.functions._

import graft.operators.OrientOps
import graft.plans.HarvestPipeline

/** A4/A5/T1/T2 end-to-end on media rows: the orientation vote with its
  * OCR + spellcheck adapter boundaries, standalone and as a
  * HarvestPipeline stage. */
class OrientOpsSpec extends SparkSpec {
  import spark.implicits._

  private def pages = Seq(
    ("doc1", "00000001.tif", Array[Byte](1, 2, 3)),
    ("doc1", "00000002.tif", Array[Byte](4, 5, 6)),
    ("doc2", "00000001.tif", Array[Byte](7, 8, 9)))
    .toDF("id", "page_name", "content")

  private def correctRotation(bytes: Array[Byte]): Int =
    math.floorMod(bytes.foldLeft(17)(31 * _ + _), 4) * 90

  test("vote picks the stub's true orientation for every page") {
    val winners = OrientOps.orientationVote(pages, Seq("id", "page_name"))
      .select("id", "page_name", "rotation").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getInt(2)).toMap
    val expected = pages.collect()
      .map(r => (r.getString(0), r.getString(1)) -> correctRotation(r.getAs[Array[Byte]](2)))
      .toMap
    assert(winners === expected)
    // and the winner's text is the clean dictionary sentence
    val texts = OrientOps.orientationVote(pages, Seq("id", "page_name"))
      .select("ocr_text", "misspelled").collect()
    texts.foreach { r =>
      assert(r.getString(0) === "the quick brown fox jumps over the lazy dog")
      assert(r.getLong(1) === 0L)
    }
  }

  test("wordlist adapter: aspell-list semantics on the resource dictionary") {
    val sp = OrientOps.WordlistSpellAdapter.en
    assert(sp.misspelled("the quick brown fox jumps over the lazy dog") === 0L)
    // case-insensitive, punctuation stripped at token edges
    assert(sp.misspelled("The QUICK brown fox, jumps!") === 0L)
    // digit-only tokens emit nothing from `aspell list`
    assert(sp.misspelled("42 1901 --- the") === 0L)
    // real misspellings count once per token
    assert(sp.misspelled("teh qiuck brown fox") === 2L)
    // OCR junk (the stub's sideways output) is all misspelled
    assert(sp.misspelled("zx3q zx7q zx11q") === 3L)
  }

  test("vote with the wordlist adapter picks the same winners as the stub") {
    val stub = OrientOps.orientationVote(pages, Seq("id", "page_name"))
      .select("id", "page_name", "rotation").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getInt(2)).toMap
    val wl = OrientOps.orientationVote(pages, Seq("id", "page_name"),
        spell = OrientOps.WordlistSpellAdapter.en)
      .select("id", "page_name", "rotation", "misspelled").collect()
    assert(wl.map(r => (r.getString(0), r.getString(1)) -> r.getInt(2)).toMap
      === stub)
    // the winner under a REAL dictionary still has zero misspellings
    wl.foreach(r => assert(r.getLong(3) === 0L))
  }

  test("costly spellcheck runs only on the bottom-2 survivors (T1 before A5)") {
    // count spell invocations through a counting adapter: 4 rotations
    // per page fan out, but only 2 per page may reach the spell stage
    val counter = new OrientOps.SpellAdapter {
      def misspelled(text: String): Long = {
        OrientOpsSpec.spellCalls.incrementAndGet()
        OrientOps.StubSpellAdapter.misspelled(text)
      }
    }
    OrientOpsSpec.spellCalls.set(0)
    val n = OrientOps.orientationVote(pages, Seq("id", "page_name"), spell = counter)
      .count()
    assert(n === 3L)
    val calls = OrientOpsSpec.spellCalls.get()
    assert(calls <= 2L * 3L * 2L, // ≤ 2 per page, allow one retry/stage re-run
      s"spellcheck ran $calls times for 3 pages - bottom-2 pruning not applied")
  }

  test("orientation vote runs as a HarvestPipeline stage (e2e on media rows)") {
    // c.pdf / d.pdf stub-fetch to status 200, so pages actually fan out
    val components = Seq(
      ("c001", "http://x/docs/c.pdf", null, null, "Folder C"),
      ("c002", "http://x/docs/d.pdf", null, null, "Folder D"))
      .toDF("id", "href", "show", "role", "title")
    val root = tmpDir("orient_pipeline")
    HarvestPipeline.run(spark, components, root)
    // the orient checkpoint holds one oriented winner per fetched page
    val oriented = spark.read.parquet(s"$root/03_orient")
    val pageRows = oriented.filter(col("page").isNotNull)
    assert(pageRows.count() > 0)
    assert(pageRows.filter(col("orientation").isNull).count() === 0,
      "every page must carry a voted orientation")
    assert(pageRows.filter(!col("orientation").isin(0, 90, 180, 270)).count() === 0)
    // deterministic stub: winners carry zero misspellings
    assert(pageRows.filter(col("misspelled") =!= 0L).count() === 0)
  }
  // ---- GlyphOcrAdapter: the REAL decode path (round-7 item 9) ----

  private def pngBytes(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    bos.toByteArray
  }

  test("glyph OCR decodes its own rendering, and reads rotation-paired junk upside-down") {
    import OrientOps.GlyphOcrAdapter
    val text = "sound box up now"
    val png = pngBytes(GlyphOcrAdapter.render(text))
    assert(GlyphOcrAdapter.ocr(png, 0) === text)
    // 180°: reversed cell order, every glyph read as its rotation pair
    // (s↔s, o↔o, u↔n, d↔p, b↔q, x↔x, w↔m) — same word count, zero
    // dictionary hits: the real reason upside-down pages fail aspell
    assert(GlyphOcrAdapter.ocr(png, 180) === "mou dn xoq punos")
    assert(OrientOps.WordlistSpellAdapter.en.misspelled(
      GlyphOcrAdapter.ocr(png, 180)) === 4L)
    assert(OrientOps.WordlistSpellAdapter.en.misspelled(text) === 0L)
    // 90°/270°: cells tile across glyph stripes — junk tokens, MORE of
    // them than real words (the wc -w prune signal)
    Seq(90, 270).foreach { r =>
      val junk = GlyphOcrAdapter.ocr(png, r)
      val wc = junk.trim.split("\\s+").count(_.nonEmpty)
      assert(wc > 4, s"rotation $r produced only $wc tokens: '$junk'")
      assert(junk !== text)
    }
  }

  test("vote with the REAL glyph OCR + wordlist spellcheck recovers every planted rotation") {
    import OrientOps.GlyphOcrAdapter
    val text = "sound box up now"
    // page k is stored rotated clockwise by k quarter-turns; the vote
    // must pick the rotation that makes the decode read cleanly — the
    // complementary (4-k)%4 quarter-turns
    val fixture = (0 to 3).map { k =>
      (s"p$k", pngBytes(GlyphOcrAdapter.rotateCw(GlyphOcrAdapter.render(text), k)),
        ((4 - k) % 4) * 90)
    }
    val pagesDf = fixture.map { case (id, b, _) => (id, b) }.toDF("id", "content")
    val got = OrientOps.orientationVote(pagesDf, Seq("id"),
        ocr = GlyphOcrAdapter, spell = OrientOps.WordlistSpellAdapter.en)
      .select("id", "rotation", "ocr_text", "misspelled").collect()
      .map(r => r.getString(0) -> ((r.getInt(1), r.getString(2), r.getLong(3))))
      .toMap
    fixture.foreach { case (id, _, want) =>
      val (rot, ocrText, miss) = got(id)
      assert(rot === want, s"$id: picked $rot, planted $want")
      assert(ocrText === text)
      assert(miss === 0L)
    }
  }
}

object OrientOpsSpec {
  val spellCalls = new java.util.concurrent.atomic.AtomicLong(0)
}
