package graft

import org.apache.spark.sql.functions._

import graft.functions.{DotProduct, SimHashBits}
import graft.operators.TextOps

class VectorExprsSpec extends SparkSpec {
  import spark.implicits._

  private def registerAll(): Unit = {
    DotProduct.register(spark)
    SimHashBits.register(spark)
  }

  /** The round-1 interpreted HOF formulation dot_product must replay
    * bit-for-bit (same products, same left fold from 0.0). */
  private val hofDot =
    """aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
      |  CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin

  test("dot_product is bit-identical to the aggregate(zip_with) fold on real embeddings") {
    registerAll()
    val e = graft.sources.Tables(spark, sf("sf0.001"), "embeddings")
    // every unordered pair of the first 40 vectors, both float arrays
    val l = e.filter(col("vec_id") < 40).select(col("vec_id").as("ia"), col("embedding").as("a"))
    val r = e.filter(col("vec_id") < 40).select(col("vec_id").as("ib"), col("embedding").as("b"))
    val both = l.crossJoin(r)
      .selectExpr("ia", "ib", "dot_product(a, b) AS fast", s"$hofDot AS slow")
      .collect()
    assert(both.length === 1600)
    both.foreach { row =>
      val (fast, slow) = (row.getDouble(2), row.getDouble(3))
      assert(java.lang.Double.doubleToRawLongBits(fast)
          === java.lang.Double.doubleToRawLongBits(slow),
        s"pair (${row.get(0)}, ${row.get(1)}): $fast != $slow")
    }
  }

  test("dot_product handles mixed float/double arrays and mismatched lengths") {
    registerAll()
    val out = Seq((Array(1.0f, 2.0f, 3.0f), Array(0.5, 0.25, 2.0)))
      .toDF("a", "b")
      .selectExpr("dot_product(a, b) AS d").head.getDouble(0)
    assert(out === 1.0 * 0.5 + 2.0 * 0.25 + 3.0 * 2.0)
    val mismatch = Seq((Array(1.0f, 2.0f), Array(1.0f)))
      .toDF("a", "b").selectExpr("dot_product(a, b) AS d").head
    assert(mismatch.isNullAt(0), "length mismatch must yield NULL like zip_with padding")
  }

  test("dot_product interpreted eval and codegen agree") {
    registerAll()
    val df = graft.sources.Tables(spark, sf("sf0.001"), "embeddings")
      .selectExpr("dot_product(embedding, embedding) AS d")
    val codegen = df.agg(sum("d")).head.getDouble(0)
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      assert(df.agg(sum("d")).head.getDouble(0) === codegen)
    }
  }

  test("simhash_bits is identical to the nested-aggregate HOF formulation") {
    registerAll()
    val docs = graft.sources.Tables(spark, sf("sf0.001"), "documents")
    val hs = s"transform(array_distinct(split(text, ' ')), t -> ${TextOps.h60x("t")})"
    val hof = docs.selectExpr("doc_id",
      s"""aggregate(transform(sequence(0, 31), b ->
         |  CASE WHEN aggregate($hs, 0L,
         |         (acc, h) -> acc + ((h div CAST(pow(2.0, b) AS BIGINT)) % 2L) * 2L - 1L) >= 0L
         |       THEN CAST(pow(2.0, b) AS BIGINT) ELSE 0L END),
         |  0L, (acc, x) -> acc + x) AS simhash""".stripMargin)
    val native = docs.selectExpr("doc_id", s"simhash_bits($hs, 32) AS simhash")
    assert(native.exceptAll(hof).count() === 0)
    assert(hof.exceptAll(native).count() === 0)
  }

  test("simhash_bits interpreted eval and codegen agree") {
    registerAll()
    val df = Seq(
      (1L, Array(7L, 12L, 255L, 1023L)),
      (2L, Array(0L, 1L)),
      (3L, Array.empty[Long]))
      .toDF("id", "hs")
      .selectExpr("id", "simhash_bits(hs, 32) AS s")
    val codegen = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // empty array: every bit vote is 0 >= 0, so all 32 bits set
    assert(codegen(3L) === (1L << 32) - 1L)
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val interp = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(interp === codegen)
    }
  }

}
