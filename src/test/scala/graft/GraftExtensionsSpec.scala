package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The `spark.sql.extensions` deployment path: a session built with
  * `GraftExtensions` must resolve every native function with no
  * per-session `register` calls — this is how a cluster user gets the
  * engine's expressions (`--conf spark.sql.extensions=graft.GraftExtensions`).
  *
  * All suites share one forked JVM, and `getOrCreate` would silently
  * return an earlier suite's session (ignoring `withExtensions`), so
  * this spec clears the active/default session, builds a FRESH session
  * (sharing the SparkContext — extensions are per-SparkSession state),
  * and restores the previous session afterwards. */
class GraftExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    // sbt may run suites in parallel threads of this JVM, so the global
    // default-session slot is cleared only for the instant of session
    // construction and restored immediately — the new session keeps
    // working regardless of which session is "default" afterwards.
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      spark = SparkSession.builder()
        .master("local[2]")
        .appName("GraftExtensionsSpec")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prior.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }

  override def afterAll(): Unit = ()

  test("all native functions resolve through SparkSessionExtensions") {
    // guard against getOrCreate having silently reused a prior session
    assert(spark.sessionState.functionRegistry
      .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("hll_sketch")),
      "extensions did not apply — session was reused, not created")
    val row = spark.sql(
      """SELECT
        |  ngram_shingles(array('a', 'b', 'c', 'd'), 3) AS sh,
        |  dot_product(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |              array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS dot,
        |  simhash_bits(array(5L, 9L), 4) AS sim
        |""".stripMargin).head
    assert(row.getSeq[String](0) === Seq("a b c", "b c d"))
    assert(row.getDouble(1) === 11.0)
    // bits of 5 (0101) and 9 (1001): bit0 +2 → set; bit1 −2 → clear;
    // bits 2 and 3 each split +1/−1 → 0 ≥ 0 → set. 1 + 4 + 8 = 13.
    assert(row.getLong(2) === 13L)
    val agg = spark.range(100)
      .selectExpr("hll_sketch(CAST(id AS STRING)) AS sk")
      .selectExpr("sk.v_zero", "sk.mmax", "sk.num").head
    assert(agg.getLong(0) >= 0L && agg.getLong(2) > 0L)
    // the round-5/6 expressions ship through the same deployment path
    val row2 = spark.sql(
      """SELECT
        |  poly_fingerprint(array('a', 'b')) AS fp,
        |  int8_quant(array(CAST(1.0 AS FLOAT), CAST(-0.5 AS FLOAT))).qscale AS qs,
        |  lang_scores(array('the', 'el', 'zzz')) AS ls
        |""".stripMargin).head
    assert(row2.getLong(0) > 0L)
    assert(row2.getDouble(1) > 0.0)
    // one slot per profile, in LangScores.profiles order: 'the' scores
    // en, 'el' scores es, 'zzz' nothing (profile count derived, not
    // hardcoded — round 8 extended the profiles to pt/nl/sv)
    assert(row2.getSeq[Long](2) ===
      graft.functions.LangScores.profiles.map { case (_, ws) =>
        Seq("the", "el", "zzz").count(ws.contains).toLong
      })
    // cdc_boundaries: n < window → empty; divisor 1 → every position
    val row3 = spark.sql(
      """SELECT
        |  cdc_boundaries(array('a'), 4, 8L) AS short,
        |  cdc_boundaries(array('a', 'b', 'c'), 2, 1L) AS all_pos
        |""".stripMargin).head
    assert(row3.getSeq[Long](0) === Seq.empty[Long])
    assert(row3.getSeq[Long](1) === Seq(2L, 3L))
    // cms_sketch: counter table sums to D * n_values
    val cms = spark.range(10)
      .selectExpr("cms_sketch(CAST(id AS STRING)) AS cms").head.getSeq[Long](0)
    assert(cms.length === graft.functions.CmsSketch.D * graft.functions.CmsSketch.W)
    assert(cms.sum === graft.functions.CmsSketch.D * 10L)
    // round-9 expressions: h60_array element-maps h60; sorted_multi_concat
    // joins values in key order with the aggregate, not a chain
    val row4 = spark.sql("SELECT h60_array(array('a', 'b')) AS ha").head
    assert(row4.getSeq[Long](0) ===
      Seq("a", "b").map(s => graft.functions.PolyFingerprint.h60(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))))
    val smc = spark.createDataFrame(Seq((1, "b", "Y"), (1, "a", "X")))
      .toDF("g", "k", "v")
      .selectExpr("g", "k", "v")
      .groupBy("g").agg(org.apache.spark.sql.functions.expr(
        "sorted_multi_concat(k, v).c0").as("s")).head
    assert(smc.getString(1) === "XY")
    // round-10 expression: minhash_sig equals the coefficient formula
    val ms = spark.sql("SELECT minhash_sig(array('a b c'), 4) AS s").head
      .getSeq[Long](0)
    val h = graft.functions.PolyFingerprint.h60(
      org.apache.spark.unsafe.types.UTF8String.fromString("a b c")) % 1000000007L
    assert(ms === graft.functions.MinhashSig.coefficients(4).toSeq
      .map { case (a, b) => (a * h + b) % 1000000007L })
    assert(spark.sql(
      "SELECT minhash_sig(CAST(array() AS ARRAY<STRING>), 4) AS s").head
      .getSeq[Long](0) === Seq.fill(4)(-1L), "empty array yields the sentinel")
    assert(spark.sql("SELECT nfc_normalize('cafe\u0301')").head.getString(0)
      === "caf\u00e9", "nfc_normalize resolves and composes through extensions")
  }
}
