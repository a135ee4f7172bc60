package graft

import org.apache.spark.sql.SparkSession

/** Dev scratchpad main for plan inspection / stage timing. Not part of the
  * driver contract; contents change freely between investigations. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Tables(spark, "/root/testdata/sf0.01", "documents")
    println("===== shingled plan =====")
    graft.operators.TextOps.shingled(docs).explain()
    spark.stop()
  }
}
