package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad main for plan inspection / stage timing. Not part of the
  * driver contract; contents change freely between investigations. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val orders = graft.sources.Tables(spark, dir, "orders")
      .select(col("o_orderkey").as("k"), col("o_totalprice"))
    val lineitem = graft.sources.Tables(spark, dir, "lineitem")
      .select(col("l_orderkey").as("k"), col("l_quantity"))
    println("[drive] plain join hasShuffle = " +
      graft.plans.Bucketing.hasShuffle(orders.join(lineitem, "k")))
    graft.plans.Bucketing.writeBucketed(orders, "b_orders", "k")
    graft.plans.Bucketing.writeBucketed(lineitem, "b_lineitem", "k")
    val co = graft.plans.Bucketing.colocatedJoin(spark, "b_orders", "b_lineitem", "k")
    println("[drive] bucketed join hasShuffle = " + graft.plans.Bucketing.hasShuffle(co))
    co.explain()
    println("[drive] rows = " + co.count())
    spark.stop()
  }
}
