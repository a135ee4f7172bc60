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
}
