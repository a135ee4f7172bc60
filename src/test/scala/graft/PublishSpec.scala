package graft

import org.apache.spark.sql.functions._

import graft.plans.PublishPipeline

/** §3.2 publish flow end-to-end: F6 dot filter, F7 anti-join, title
  * lookup with quote stripping, page numbering in path order, grouped
  * METS, dao insertion attributes — and stage-checkpoint resume. */
class PublishSpec extends SparkSpec {
  import spark.implicits._

  private def components = Seq(
    ("MC001_c01", "c01"),
    ("MC001_c02", "c02"),
    ("MC001_c03", "c03"),        // already published → F7 excluded
    ("MC001_bad", "c04.tmp"))    // dotted name → F6 excluded
    .toDF("component_id", "name")

  private def existing = Seq(Tuple1("MC001_c03")).toDF("component_id")

  private def titles = Seq(
    ("MC001_c01", "Letters, \"personal\"", "1901"),
    ("MC001_c02", "Notebooks", "1902"))
    .toDF("component_id", "unittitle", "unitdate")

  private def pages = Seq(
    ("MC001_c01", "/s/MC001/c01/zz_last.tif"),
    ("MC001_c01", "/s/MC001/c01/aa_first.tif"),
    ("MC001_c02", "/s/MC001/c02/only.tif"))
    .toDF("component_id", "path")

  test("publish pipeline composes F6/F7/titles/METS/dao end-to-end and resumes") {
    val root = tmpDir("publish")
    val out = PublishPipeline.run(spark, components, existing, titles, pages, root)
      .orderBy("component_id").collect()
    assert(out.map(_.getString(0)).toSeq === Seq("MC001_c01", "MC001_c02"))
    val byId = out.map(r => r.getString(0) -> r).toMap
    // F13 quote-strip + F14 concat
    assert(byId("MC001_c01").getAs[String]("title") === "Letters, personal, 1901")
    // W1 numbering follows lexicographic path order: aa_first → seq 1
    val mets01 = byId("MC001_c01").getAs[String]("mets")
    assert(mets01.indexOf("seq=\"1\"") < mets01.indexOf("seq=\"2\""))
    assert(byId("MC001_c01").getAs[Long]("n_pages") === 2L)
    // J3/F11 dao attributes
    assert(byId("MC001_c02").getAs[String]("dao_href")
      === "http://store/MC001/c02.pdf")
    assert(out.forall(_.getAs[String]("dao_show") === "new"))
    // resume: identical output, stages skipped
    val again = PublishPipeline.run(spark, components, existing, titles, pages, root)
      .orderBy("component_id").collect()
    assert(again.map(_.toString).toSeq === out.map(_.toString).toSeq)
  }
}
