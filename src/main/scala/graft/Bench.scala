package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // collect_list plans ObjectHashAggregate, which abandons hash
      // aggregation after 128 distinct keys per partition and sorts the
      // full payload instead — pathological for the doc-assembly queries
      // (q42/q43/q52 hold 10⁴-10⁵ bounded-size groups per partition that
      // fit in memory trivially). Raise the fallback so hash aggregation
      // actually runs; sort_array keeps results order-deterministic
      // either way.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session once (JIT, codegen cache, file index) so the first
    // timed query doesn't absorb JVM/session startup; queries run in name
    // order for stable, comparable per-query numbers.
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    // Each query runs TWICE (round-2 verdict item 7): the first run pays
    // whole-stage-codegen compilation and JIT warmup, the second is the
    // steady state a long-lived cluster job sees. "queries"/"value" stay
    // first-run so rounds remain comparable; "steady" reports the second
    // run. noop sink both times: every output column is fully computed
    // and serialized (a bare count() lets ColumnPruning/EliminateSorts
    // strip the projections and trailing sort, flattering
    // expression-heavy queries). A query that throws records -1.0.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def timed(): Double = {
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case _: Throwable => false }
        val elapsed = (System.nanoTime() - t0) / 1e9
        if (ok) elapsed else -1.0
      }
      val first = timed()
      val steady = if (first >= 0) timed() else -1.0
      (name, first, steady)
    }
    def jmap(f: ((String, Double, Double)) => Double): String = results
      .map(t => s"\"" + t._1 + "\":" + f(t)).mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val steadyTotal = results.map(_._3).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec",""" +
      s""""queries":${jmap(_._2)},"steady":${jmap(_._3)},""" +
      s""""steady_total":$steadyTotal,"sf":"$sfDir"}""")
    spark.stop()
  }
}
