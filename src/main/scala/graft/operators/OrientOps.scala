package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The orientation vote end-to-end (`bin/orient_image.sh:1-81`), with the
  * external-tool boundaries as adapter traits (mirroring
  * [[MultimodalOps.ImageAdapter]]):
  *
  *   1. fan out 4 rotation candidates per page (A4 shape,
  *      `orient_image.sh:41-45`);
  *   2. OCR each candidate ([[OcrAdapter]] ≙ `ocrad`,
  *      `orient_image.sh:53-56`);
  *   3. cheap score: OCR word count — least whitespace junk
  *      (`wc -w`, `orient_image.sh:58-63`);
  *   4. T1: keep the bottom 2 (`sort -n | head -2`,
  *      `orient_image.sh:65-67`);
  *   5. costly score, survivors ONLY: misspelled-word count
  *      ([[SpellAdapter]] ≙ `aspell list | wc -w`,
  *      `orient_image.sh:69-74`);
  *   6. T2: argmin winner (`sort -n | head -1`, `orient_image.sh:76-80`).
  *
  * The two-phase shape matters: the costly spellcheck runs on 2 rows per
  * page, not 4 — at 100 TB the pruning IS the optimization, and Spark 4
  * plans the rank-filter as WindowGroupLimit (per-group limit applied
  * map-side, so the exchange after scoring carries ≤ 2 rows per page).
  *
  * The adapters here are scoring callbacks (inherently non-codegen), so
  * they bind as Scala UDFs; a heavyweight OCR engine with per-executor
  * model state would move to the `mapPartitions` batch shape of
  * [[MultimodalOps.probeMedia]] — same trait, same plan around it.
  * The stubs are deterministic stand-ins (no OCR/dictionary tooling in
  * this container): the stub's "true orientation" derives from the image
  * bytes, its OCR emits clean dictionary text at the true rotation, junk
  * WITH MORE TOKENS at ±90°, and same-length misspelled text at 180° —
  * reproducing the real signal (sideways text OCRs to whitespace junk;
  * upside-down text OCRs to plausible-length garbage words) so the
  * bottom-2-then-spellcheck logic is genuinely exercised.
  */
object OrientOps {

  /** OCR boundary (`ocrad`): page bytes at a rotation → extracted text. */
  trait OcrAdapter extends Serializable {
    def ocr(content: Array[Byte], rotation: Int): String
  }

  /** Spellcheck boundary (`aspell list`): text → misspelled-word count. */
  trait SpellAdapter extends Serializable {
    def misspelled(text: String): Long
  }

  object StubOcrAdapter extends OcrAdapter {
    def ocr(content: Array[Byte], rotation: Int): String = {
      val h = content.foldLeft(17)(31 * _ + _)
      val correct = math.floorMod(h, 4) * 90
      math.floorMod(rotation - correct, 360) / 90 match {
        case 0 => "the quick brown fox jumps over the lazy dog"
        case 2 => s"the xu${h & 7}q brown qox jumps ovre the lazy bog"
        case _ => (1 to 16).map(i => s"zx${(h + i) & 15}q").mkString(" ")
      }
    }
  }

  object StubSpellAdapter extends SpellAdapter {
    private val dict = Set("the", "quick", "brown", "fox", "jumps",
      "over", "lazy", "dog")
    def misspelled(text: String): Long =
      text.trim.split("\\s+").count(w => w.nonEmpty && !dict(w.toLowerCase))
  }

  /** Dictionary-backed spellchecker mirroring `aspell -l en list | wc -w`
    * (`bin/orient_image.sh:69-74`): count tokens carrying letters that
    * are not in the wordlist. The list ships as a JVM resource (a common
    * English word list — public knowledge), loaded once per JVM and
    * closed over by the scoring UDF exactly like the stub; aspell's
    * behaviors mirrored here are case-insensitive lookup and skipping
    * tokens with no letters (digits/punctuation emit nothing from
    * `aspell list`). Swap the resource to change language — the `-l en`
    * flag's analog. */
  final class WordlistSpellAdapter(resource: String = "/graft/wordlist_en.txt")
      extends SpellAdapter {
    @transient private lazy val dict: Set[String] = {
      val in = getClass.getResourceAsStream(resource)
      require(in != null, s"wordlist resource not found: $resource")
      try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().map(_.trim.toLowerCase).filter(_.nonEmpty).toSet
      finally in.close()
    }
    def misspelled(text: String): Long =
      text.trim.split("\\s+").iterator
        .map(_.replaceAll("^[^\\p{L}]+|[^\\p{L}]+$", ""))
        .filter(_.exists(_.isLetter))
        .count(w => !dict(w.toLowerCase))
  }

  object WordlistSpellAdapter {
    /** Shared default-resource instance (dictionary loads once per JVM). */
    val en: WordlistSpellAdapter = new WordlistSpellAdapter()
  }

  /** One winner row per page (`keyCols`): the input row at the chosen
    * rotation, with `rotation`, `ocr_text`, `wc`, `misspelled` attached.
    * Requires a binary `content` column. Ties break (misspelled, wc,
    * rotation) ascending — the shell's `sort -n` made total. */
  def orientationVote(pages: DataFrame, keyCols: Seq[String],
      ocr: OcrAdapter = StubOcrAdapter,
      spell: SpellAdapter = StubSpellAdapter): DataFrame = {
    val ocrUdf = udf((content: Array[Byte], rotation: Int) => ocr.ocr(content, rotation))
    val spellUdf = udf((t: String) => spell.misspelled(t))
    val keys = keyCols.map(col)
    val wCheap = Window.partitionBy(keys: _*).orderBy(col("wc").asc, col("rotation").asc)
    val wFinal = Window.partitionBy(keys: _*)
      .orderBy(col("misspelled").asc, col("wc").asc, col("rotation").asc)
    VoteOps.rotationCandidates(pages)
      .withColumn("ocr_text", ocrUdf(col("content"), col("rotation")))
      .withColumn("wc",
        when(length(trim(col("ocr_text"))) === 0, 0L)
          .otherwise(size(split(trim(col("ocr_text")), "\\s+")).cast("long")))
      .withColumn("cheap_rank", row_number().over(wCheap))
      .filter(col("cheap_rank") <= 2)
      .withColumn("misspelled", spellUdf(col("ocr_text")))
      .withColumn("final_rank", row_number().over(wFinal))
      .filter(col("final_rank") === 1)
      .drop("cheap_rank", "final_rank")
  }
}
