package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Optimization-round tooling (round 14): Bench-parity timing for a SUBSET
  * of queries in an isolated fresh JVM. [[PlanDump]]'s phase split times
  * only plan + noop-exec of an already-constructed DataFrame, which misses
  * every job the query runs while CONSTRUCTING the frame (the
  * `componentKeepers` fixpoint, `bpeRounds`' per-round checkpoints, k-means
  * iterations, bloom builds — exactly the queries worth A/B-ing). This tool
  * replicates `Bench.timedRun` (unpersist + System.gc before t0; fn() AND
  * the noop sink inside the timed window; task/cpu from a stage listener)
  * for the named queries: one discarded warm run, then
  * SPARK_GRAFT_BENCH_REPS (default 3) steady reps, median printed.
  *
  * Usage: runMain graft.QTime <query ...>   (env: SPARK_GRAFT_SF_DIR/CPUS)
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "262144")
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "10000"))
      .config("spark.sql.codegen.methodSplitThreshold", Bench.methodSplit)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val runMs = new java.util.concurrent.atomic.AtomicLong(0L)
    val cpuMs = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        runMs.addAndGet(m.executorRunTime)
        cpuMs.addAndGet(m.executorCpuTime / 1000000L)
      }
    })
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()

    val qs = SparkEntry.queries
    args.foreach { name =>
      val fn = qs.getOrElse(name,
        throw new IllegalArgumentException(s"unknown query $name"))
      // same env stamps as Bench (load + jit) so a busy-neighbor window
      // or a C2 storm self-identifies instead of corrupting an A/B read
      def jitMs(): Long = {
        val c = java.lang.management.ManagementFactory.getCompilationMXBean
        if (c != null && c.isCompilationTimeMonitoringSupported)
          c.getTotalCompilationTime else 0L
      }
      def load(): Double = java.lang.management.ManagementFactory
        .getOperatingSystemMXBean.getSystemLoadAverage
      def rep(): (Double, Double, Double, Double, Double) = {
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        System.gc()
        runMs.set(0L); cpuMs.set(0L)
        val jit0 = jitMs()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        (wall, runMs.get / 1000.0, cpuMs.get / 1000.0,
          (jitMs() - jit0) / 1000.0, load())
      }
      rep() // warm (codegen + JIT), discarded
      val rs = (1 to reps).map(_ => rep())
      def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
      println(f"[qtime] $name wallMed=${med(rs.map(_._1))}%.2f " +
        f"taskMed=${med(rs.map(_._2))}%.2f cpuMed=${med(rs.map(_._3))}%.2f " +
        rs.map(r => f"(${r._1}%.2f/${r._2}%.2f j${r._4}%.1f l${r._5}%.1f)").mkString(" "))
    }
    spark.stop()
  }
}
