package graft

import org.apache.spark.sql.functions._

import graft.plans.Bucketing
import graft.sources.Tables

class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join plans without a shuffle exchange") {
    // force sort-merge (tiny test tables would otherwise broadcast, which
    // hides the shuffle this spec contrasts)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val dir = sf("sf0.001")
    val orders = Tables(spark, dir, "orders")
      .select(col("o_orderkey").as("k"), col("o_totalprice"))
    val lineitem = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey").as("k"), col("l_quantity"))

    // plain join: both sides shuffle on the key
    val plain = orders.join(lineitem, "k")
    assert(Bucketing.hasShuffle(plain))

    Bucketing.writeBucketed(orders, "b_orders", "k")
    Bucketing.writeBucketed(lineitem, "b_lineitem", "k")
    val colocated = Bucketing.colocatedJoin(spark, "b_orders", "b_lineitem", "k")
    assert(!Bucketing.hasShuffle(colocated),
      colocated.queryExecution.executedPlan.toString)

    // and the results agree
    val a = plain.agg(count(lit(1)), sum("l_quantity")).head
    val b = colocated.agg(count(lit(1)), sum("l_quantity")).head
    assert(a.getLong(0) === b.getLong(0))
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
