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
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // Drive the pipeline runner end-to-end: 3 stages over real events data,
    // run twice — second run must resume from checkpoints (no re-execution).
    val root = java.nio.file.Files.createTempDirectory("pipe").toString
    val events = graft.sources.Tables(spark, "/root/testdata/sf0.001", "events")
    val stages = Seq(
      graft.plans.Pipeline.Stage("filter_ok",
        _.filter(col("event_type") =!= "error")),
      graft.plans.Pipeline.Stage("kval",
        _.withColumn("k", get_json_object(col("props"), "$.k").cast("long"))),
      graft.plans.Pipeline.Stage("per_user",
        _.groupBy("user_id").agg(count(lit(1)).as("n"), sum("k").as("sum_k"))))
    val t0 = System.nanoTime()
    val out1 = graft.plans.Pipeline.run(spark, events, root, stages).count()
    val t1 = System.nanoTime()
    val out2 = graft.plans.Pipeline.run(spark, events, root, stages).count()
    val t2 = System.nanoTime()
    println(s"[drive] pipeline run1=$out1 rows (${(t1 - t0) / 1e6}%.0f ms) " +
      s"run2=$out2 rows (${(t2 - t1) / 1e6} ms, resumed from checkpoints)")
    println("[drive] checkpoints: " + new java.io.File(root).list().sorted.mkString(", "))

    // Streaming: AvailableNow over the real events files.
    val stream = graft.streaming.StreamOps.tumblingCounts(
      graft.streaming.StreamOps.eventsStream(spark, "/root/testdata/sf0.001"))
    val sres = graft.streaming.StreamOps.runAvailableNowComplete(spark, stream,
      "drive_tumbling", java.nio.file.Files.createTempDirectory("ck").toString)
    println(s"[drive] streaming tumbling windows: ${sres.count()} rows, sample: " +
      sres.orderBy("window_start", "event_type").head())

    // Multimodal: binaryFile scan of a real directory (the repo's own
    // scripts dir) → probe → derived projections.
    val files = graft.sources.BinaryFiles.scan(spark, "/root/repo/scripts",
      glob = "*.py", withContent = true)
    val meta = graft.operators.MultimodalOps.withJp2Levels(
      graft.operators.MultimodalOps.withResizeTarget(
        graft.operators.MultimodalOps.probeMedia(files).toDF()))
    meta.show(5, truncate = false)
    spark.stop()
  }
}
