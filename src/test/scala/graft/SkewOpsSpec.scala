package graft

import org.apache.spark.sql.functions._

import graft.operators.SkewOps

class SkewOpsSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join on skewed data") {
    // one hot key with 10k rows, many cold keys
    val big = ((1 to 10000).map(i => ("hot", i.toLong)) ++
      (1 to 100).map(i => (s"k$i", i.toLong))).toDF("key", "v")
    val dim = (Seq("hot") ++ (1 to 100).map(i => s"k$i"))
      .zipWithIndex.map { case (k, i) => (k, s"dim$i") }.toDF("key", "label")
    val plain = big.join(dim, Seq("key"))
      .groupBy("key").agg(count(lit(1)).as("n"), sum("v").as("s"))
    val salted = SkewOps.saltedJoin(big, dim, "key", "v", salts = 8)
      .groupBy("key").agg(count(lit(1)).as("n"), sum("v").as("s"))
    assert(plain.exceptAll(salted).count() === 0)
    assert(salted.exceptAll(plain).count() === 0)
  }

  test("salted two-level aggregation equals direct aggregation") {
    val df = ((1 to 5000).map(_ => ("hot", 1.0)) ++
      (1 to 50).map(i => (s"k$i", i.toDouble))).toDF("key", "v")
    val direct = df.groupBy("key")
      .agg(sum("v").as("sum_v"), count(lit(1)).as("n"))
    val salted = SkewOps.saltedSumCount(df, "key", "v", "v")
    assert(direct.exceptAll(salted).count() === 0)
    assert(salted.exceptAll(direct).count() === 0)
  }
}
