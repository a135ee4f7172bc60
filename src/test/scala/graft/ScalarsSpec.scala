package graft

import org.apache.spark.sql.functions._

import graft.functions.Scalars

class ScalarsSpec extends SparkSpec {
  import spark.implicits._

  test("h60 matches the cross-engine reference value") {
    // DuckDB: SELECT ('0x' || substr(md5('tok'), 1, 15))::BIGINT → 435407939895074749
    val got = Seq("tok").toDF("s").select(Scalars.h60(col("s"))).head.getLong(0)
    assert(got === 435407939895074749L)
  }

  test("h60 is non-negative and stable") {
    val vals = Seq("a", "b", "", "Zürich", "a b c").toDF("s")
      .select(Scalars.h60(col("s")).as("h")).collect().map(_.getLong(0))
    assert(vals.forall(_ >= 0L))
    val again = Seq("a", "b", "", "Zürich", "a b c").toDF("s")
      .select(Scalars.h60(col("s")).as("h")).collect().map(_.getLong(0))
    assert(vals.toSeq === again.toSeq)
  }

  test("decSum is exact and partitioning-independent") {
    val xs = (1 to 10000).map(i => i * 0.01)
    val expected = BigDecimal(xs.map(BigDecimal(_)).sum.toDouble).toDouble
    for (parts <- Seq(1, 3, 17)) {
      val got = xs.toDF("x").repartition(parts)
        .agg(Scalars.decSum(col("x"))).head.getDouble(0)
      assert(got === expected, s"parts=$parts")
    }
  }

  test("normWs strips and collapses whitespace (F12)") {
    val got = Seq("  a \t b\n\nc ").toDF("s")
      .select(Scalars.normWs(col("s"))).head.getString(0)
    assert(got === "a b c")
  }

  test("pageName zero-pads to 8 digits (F19)") {
    val got = Seq(42).toDF("n").select(Scalars.pageName(col("n"))).head.getString(0)
    assert(got === "00000042")
  }
}
