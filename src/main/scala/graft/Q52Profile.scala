package graft

import java.lang.management.ManagementFactory

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** One-query profiling harness (round-3 verdict item 1): where does
  * q52_mets_full's steady-state time actually go? Runs the query once to
  * warm codegen/JIT, then `SPARK_GRAFT_PROFILE_RUNS` (default 3) steady
  * repetitions, capturing per-stage task metrics (executor run/CPU/GC
  * time, shuffle bytes, spill, peak memory) through a SparkListener and
  * whole-JVM GC time through the GC MXBeans. Output is one JSON document
  * per run — committed to `profiles/` so the bench notes can cite a
  * recorded artifact instead of a remembered number.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *        sbt 'runMain graft.Q52Profile [queryName]'
  */
object Q52Profile {

  private final case class StageRow(
      stageId: Int, name: String, tasks: Int, runMs: Long, cpuMs: Long,
      gcMs: Long, shufReadMB: Double, shufWriteMB: Double, spillMB: Double,
      peakMemMB: Double)

  def main(args: Array[String]): Unit = {
    // the f-interpolator formats via the default locale; comma-decimal
    // locales would make the committed profile records invalid JSON
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val queryName = args.headOption.getOrElse("q52_mets_full")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_PROFILE_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "262144")
      // codegen cache sized for a 130-plan session (the round-6 CPU-
      // inflation suspicion this conf carried was closed in round 8:
      // the inflation was G1 — see build.sbt's UseParallelGC note).
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "10000"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stages = ArrayBuffer.empty[StageRow]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        stages.synchronized {
          stages += StageRow(
            si.stageId, si.name.takeWhile(_ != '\n').take(60), si.numTasks,
            m.executorRunTime, m.executorCpuTime / 1000000L, m.jvmGCTime,
            m.shuffleReadMetrics.totalBytesRead / 1048576.0,
            m.shuffleWriteMetrics.bytesWritten / 1048576.0,
            (m.memoryBytesSpilled + m.diskBytesSpilled) / 1048576.0,
            m.peakExecutionMemory / 1048576.0)
        }
      }
    })

    def gcMillis(): Long =
      ManagementFactory.getGarbageCollectorMXBeans.asScala
        .map(_.getCollectionTime).sum

    // JIT evidence (round 10): the 89g reproduction showed single reps
    // at 100x task CPU with ZERO gc time and ZERO new Janino classes —
    // the interpreter multiplier, pointing at JVM-level code-cache /
    // deopt state, not Spark state. Record code-heap occupancy and
    // cumulative JIT compile time per rep so an inflated rep self-
    // identifies: compileMs jumping = recompilation storm; codeMB
    // pinned at the reserve = cache full (compiler disabled).
    def codeCacheMb(): Double =
      ManagementFactory.getMemoryPoolMXBeans.asScala
        .filter(_.getName.startsWith("CodeHeap"))
        .map(_.getUsage.getUsed / 1048576.0).sum
    def jitCompileMs(): Long = {
      val c = ManagementFactory.getCompilationMXBean
      if (c != null && c.isCompilationTimeMonitoringSupported)
        c.getTotalCompilationTime else 0L
    }

    // Janino compile activity (count of compiled classes + total compile
    // ms) — distinguishes "steady run recompiles its codegen" from heap /
    // GC pressure when the in-bench number disagrees with isolated runs
    def codegenStats(): (Long, Double) = {
      import org.apache.spark.metrics.source.CodegenMetrics._
      (METRIC_SOURCE_CODE_SIZE.getCount,
        METRIC_COMPILATION_TIME.getSnapshot.getValues.sum / 1.0)
    }

    // SPARK_GRAFT_PRELOAD=all reproduces the bench session's accumulated
    // state (65 other compiled+run queries) before profiling the target —
    // the isolated-vs-in-bench discrepancy is the round-3 open question
    if (sys.env.get("SPARK_GRAFT_PRELOAD").contains("all")) {
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (n, f) =>
        if (n != queryName)
          try f(spark, sfDir).write.format("noop").mode("overwrite").save()
          catch { case _: Throwable => () }
      }
      println(s"""{"preload":"all","queries":${SparkEntry.queries.size - 1},""" +
        s""""persistentRdds":${spark.sparkContext.getPersistentRDDs.size}}""")
    }

    // SPARK_GRAFT_CLEAN=1 — round-8 hypothesis test: the preloaded
    // queries' localCheckpoint blocks stay pinned in the block manager
    // for the rest of the session, so storage memory is full when the
    // target query runs; its execution-memory requests then evict/churn
    // blocks (CPU inflation) against a near-full heap (GC inflation).
    // Cleaning between queries reproduces what a per-job cluster gives
    // every query: an empty block manager.
    def cleanSession(): Unit =
      if (sys.env.get("SPARK_GRAFT_CLEAN").contains("1")) {
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        spark.catalog.clearCache()
        System.gc()
      }
    cleanSession()

    val fn = SparkEntry.queries(queryName)
    final case class Once(wall: Double, gcDelta: Long, rows: Seq[StageRow],
      cgClasses: Long, jitMs: Long, codeMb: Double)
    def once(): Once = {
      stages.synchronized(stages.clear())
      val (cc0, _) = codegenStats()
      val gc0 = gcMillis()
      val jit0 = jitCompileMs()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      // stage-completed events arrive asynchronously on the listener bus
      // (no public drain API); the job is done, so a short settle window
      // is enough for the tail events to land before the buffer snapshot
      Thread.sleep(1000)
      val (cc1, _) = codegenStats()
      Once(wall, gcMillis() - gc0, stages.synchronized(stages.toVector),
        cc1 - cc0, jitCompileMs() - jit0, codeCacheMb())
    }

    def fmt(runLabel: String, wall: Double, gcDelta: Long, rows: Seq[StageRow]): String = {
      val stageJson = rows.sortBy(-_.runMs).map { r =>
        f"""{"stage":${r.stageId},"tasks":${r.tasks},"runMs":${r.runMs},""" +
          f""""cpuMs":${r.cpuMs},"gcMs":${r.gcMs},"shufReadMB":${r.shufReadMB}%.1f,""" +
          f""""shufWriteMB":${r.shufWriteMB}%.1f,"spillMB":${r.spillMB}%.1f,""" +
          f""""peakMemMB":${r.peakMemMB}%.1f,"name":"${r.name.replace("\"", "'")}"}"""
      }.mkString("[", ",", "]")
      f"""{"run":"$runLabel","wallSec":$wall%.2f,"jvmGcSec":${gcDelta / 1000.0}%.2f,""" +
        f""""sumStageRunSec":${rows.map(_.runMs).sum / 1000.0}%.2f,""" +
        f""""sumStageCpuSec":${rows.map(_.cpuMs).sum / 1000.0}%.2f,""" +
        f""""sumStageGcSec":${rows.map(_.gcMs).sum / 1000.0}%.2f,""" +
        f""""stages":$stageJson}"""
    }

    def emit(label: String, o: Once): Unit =
      println(fmt(label, o.wall, o.gcDelta, o.rows).replace("\"stages\"",
        f""""codegenClasses":${o.cgClasses},"jitCompileSec":${o.jitMs / 1000.0}%.2f,""" +
          f""""codeCacheMB":${o.codeMb}%.1f,"stages""""))
    emit("warm", once())
    (1 to runs).foreach(i => emit(s"steady$i", once()))
    spark.stop()
  }
}
