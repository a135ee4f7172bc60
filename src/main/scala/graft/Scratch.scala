package graft

import org.apache.spark.sql.SparkSession

/** Dev scratchpad main for plan inspection / stage timing. Not part of the
  * driver contract; contents change freely between investigations. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      .getOrCreate()
    spark.sparkContext.setLogLevel(sys.env.getOrElse("SPARK_GRAFT_LOGLEVEL", "WARN"))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names = sys.env.getOrElse("SPARK_GRAFT_QUERIES", "q92_label_coherence").split(",")
    val time = sys.env.contains("SPARK_GRAFT_TIME")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.executedPlan.toString
      val n = plan.linesIterator.count(_.contains("Exchange"))
      println(s"[plan] $name exchanges=$n")
      if (time) (1 to 4).foreach { i =>
        val t0 = System.nanoTime
        df.write.format("noop").mode("overwrite").save()
        println(f"[time] $name rep$i ${(System.nanoTime - t0) / 1e9}%.2f s")
      }
      else println(plan)
    }
  }
}
