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
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label%-20s ${(System.nanoTime() - t0) / 1e9}%8.2f s  -> $r")
      r
    }
    val d = "/root/testdata/sf0.1"
    for (i <- 1 to 3)
      time(s"q39 run$i")(SparkEntry.queries("q39_cosine_topk")(spark, d).count())
    spark.stop()
  }
}
