package graft

import org.apache.spark.sql.functions._

import graft.functions.{HllSketch, Scalars}

class HllSketchSpec extends SparkSpec {
  import spark.implicits._

  private def sketch(df: org.apache.spark.sql.DataFrame, colName: String) = {
    HllSketch.register(spark)
    df.agg(expr(s"hll_sketch(CAST($colName AS STRING))").as("sk"))
      .select("sk.v_zero", "sk.mmax", "sk.num", "sk.registers")
      .head
  }

  test("registers match a JVM reference implementation (h60-derived, deterministic)") {
    val values = (1 to 500).map(_.toString)
    val expected = new Array[Long](64)
    values.foreach { v =>
      val h = Scalars.h60Jvm(v)
      val idx = (h % 64).toInt
      val w = h / 64
      val rho = if (w == 0L) 55L else 55L - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > expected(idx)) expected(idx) = rho
    }
    val row = sketch(values.toDF("v"), "v")
    assert(row.getSeq[Long](3).toArray.toSeq === expected.toSeq)
    assert(row.getLong(0) === expected.count(_ == 0L).toLong)
    assert(row.getLong(1) === expected.max)
  }

  test("merge across partitionings is exact: 1 partition == 16 partitions") {
    val df = (1 to 2000).map(i => s"user$i").toDF("v")
    val one = sketch(df.coalesce(1), "v")
    val many = sketch(df.repartition(16), "v")
    assert(one.toString === many.toString)
  }

  test("duplicates do not move the sketch; estimate tracks distinct count") {
    val distinct = (1 to 1000).map(i => s"u$i")
    val withDups = distinct ++ distinct ++ distinct.take(300)
    val a = sketch(distinct.toDF("v"), "v")
    val b = sketch(withDups.toDF("v"), "v")
    assert(a.toString === b.toString, "duplicate values must not change registers")
    // raw HLL with m=64: standard error ~13%; allow 3 sigma
    val est = 0.7213 / (1.0 + 1.079 / 64.0) * 4096.0 *
      math.pow(2.0, a.getLong(1).toDouble) / a.getLong(2).toDouble
    assert(math.abs(est - 1000.0) / 1000.0 < 0.4, s"estimate $est too far from 1000")
  }

  test("estimates are within tolerance on real grouped data (vs exact)") {
    HllSketch.register(spark)
    val rows = graft.sources.Tables(spark, sf("sf0.01"), "events")
      .groupBy("event_type")
      .agg(expr("hll_sketch(CAST(user_id AS STRING))").as("sk"),
        countDistinct(col("user_id")).as("exact"))
      .select(col("event_type"),
        expr(HllSketch.estimateSql("sk.mmax", "sk.num")).as("est"),
        col("exact").cast("double"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (est, exact) = (r.getDouble(1), r.getDouble(2))
      assert(math.abs(est - exact) / exact < 0.4,
        s"${r.getString(0)}: estimate $est vs exact $exact")
    }
  }
}
