package graft

/** Driver-contract invariants over the whole query registry. */
class QueryContractSpec extends SparkSpec {

  test("entry returns rows on sf0.001 (t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs on sf0.001 and returns a deterministic result") {
    val dir = sf("sf0.001")
    SparkEntry.queries.foreach { case (name, fn) =>
      val a = fn(spark, dir).collect()
      val b = fn(spark, dir).collect()
      assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq,
        s"$name not deterministic")
    }
  }

  test("oracleSql keys are a subset of queries and non-empty") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.oracleSql.nonEmpty)
    assert(SparkEntry.oracleSql.values.forall(_.trim.nonEmpty))
  }

  test("query names are unique across modules") {
    val names = SparkEntry.queries.keys.toSeq
    assert(names.distinct.size === names.size)
  }

  test("approx_count_distinct tracks exact within HLL tolerance") {
    import org.apache.spark.sql.functions._
    val li = graft.sources.Tables(spark, sf("sf0.001"), "lineitem")
    val r = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), 0.02).as("approx")).head
    val (exact, approx) = (r.getLong(0), r.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.1,
      s"exact=$exact approx=$approx")
  }
}
