package graft

import org.apache.spark.sql.functions._

import graft.sources.JdbcWorkQueue

/** S12: JDBC work-queue source against embedded Derby — round-trip
  * fidelity and, critically, that the status predicate is PUSHED into
  * the database query (the reference embeds `WHERE Note=" "` in its
  * SQLite query, `bin/pulfarize.rb:101`; a post-scan filter would drag
  * the whole queue across the wire). */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private val url = JdbcWorkQueue.derbyMemUrl("graft_spec")

  private def fixture() = {
    val df = Seq(
      (1L, "/store/MC001/c001", " "),
      (2L, "/store/MC001/c002", "done"),
      (3L, "/store/MC002/c001", " "),
      (4L, "/store/MC002/c002", "error"))
      .toDF("id", "dir", "Note")
    JdbcWorkQueue.seed(df, url, "ImageDirs")
  }

  test("seed + scan round-trips values, types, and column case") {
    fixture()
    val back = JdbcWorkQueue.scan(spark, url, "ImageDirs")
    assert(back.schema.fieldNames.toSeq === Seq("id", "dir", "Note"))
    assert(back.schema("id").dataType.typeName === "long")
    val rows = back.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(rows.toSeq === Seq(
      (1L, "/store/MC001/c001", " "), (2L, "/store/MC001/c002", "done"),
      (3L, "/store/MC002/c001", " "), (4L, "/store/MC002/c002", "error")))
  }

  test("pending selects only unclaimed rows (Note = single space)") {
    fixture()
    val ids = JdbcWorkQueue.pending(spark, url, "ImageDirs")
      .orderBy("id").collect().map(_.getLong(0))
    assert(ids.toSeq === Seq(1L, 3L))
  }

  test("the status predicate is pushed down into the database query") {
    fixture()
    val plan = JdbcWorkQueue.pending(spark, url, "ImageDirs")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(Note, )"),
      s"expected EqualTo(Note, ' ') in PushedFilters, plan:\n$plan")
  }

  test("seed is idempotent (drop + recreate, no duplicate rows)") {
    fixture(); fixture()
    assert(JdbcWorkQueue.scan(spark, url, "ImageDirs").count() === 4L)
  }

  test("seed refuses a corpus-sized input (the collect() guard)") {
    val big = spark.range(JdbcWorkQueue.MaxSeedRows + 1)
      .select(col("id"), concat(lit("/d/"), col("id")).as("dir"),
        lit(" ").as("Note"))
    val ex = intercept[IllegalArgumentException] {
      JdbcWorkQueue.seed(big, url, "TooBig")
    }
    assert(ex.getMessage.contains("work-queue contract"))
  }
}
