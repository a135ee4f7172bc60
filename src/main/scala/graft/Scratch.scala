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
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    val names = sys.env.getOrElse("SPARK_GRAFT_QUERIES", "q52_mets_full").split(",")
    names.foreach { name =>
      // construction INSIDE the timer — iterative queries (q57) do their
      // fixpoint work eagerly while the DataFrame is being built
      def timed(): Unit = {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      timed(); timed()
      if (sys.env.contains("SPARK_GRAFT_EXPLAIN"))
        SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
