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

    // Drive the harvest pipeline end-to-end through the package boundary
    // on a realistic component table synthesized from driver data.
    val comps = graft.sources.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(
        concat(lit("c"), col("doc_id")).as("id"),
        concat(lit("http://store/"), col("source"), lit("/"), col("doc_id"),
          when(col("doc_id") % 7 === 0, ".jpg").otherwise(".pdf")).as("href"),
        when(col("doc_id") % 11 === 0, "none").otherwise(null).cast("string").as("show"),
        lit(null).cast("string").as("role"),
        col("text").substr(1, 20).as("title"))
    val root = java.nio.file.Files.createTempDirectory("harvest").toString
    val out = graft.plans.HarvestPipeline.run(spark, comps, root)
    println("[drive] harvest output:")
    out.groupBy("status", "show").count().orderBy("status").show()
    out.filter(col("status") === 200).select("id", "n_pages", "mets").show(3, 100)
    println("[drive] checkpoints: " +
      new java.io.File(root).list().sorted.mkString(", "))

    // Salted join drive on the driver tables: orders (hot custkey synth) vs customer.
    val plain = graft.sources.Tables(spark, "/root/testdata/sf0.01", "orders")
      .join(graft.sources.Tables(spark, "/root/testdata/sf0.01", "customer")
        .withColumnRenamed("c_custkey", "o_custkey"), Seq("o_custkey"))
      .agg(count(lit(1)), sum("o_totalprice")).collect()(0)
    val salted = graft.operators.SkewOps.saltedJoin(
      graft.sources.Tables(spark, "/root/testdata/sf0.01", "orders"),
      graft.sources.Tables(spark, "/root/testdata/sf0.01", "customer")
        .withColumnRenamed("c_custkey", "o_custkey"),
      "o_custkey", "o_orderkey", salts = 8)
      .agg(count(lit(1)), sum("o_totalprice")).collect()(0)
    println(s"[drive] plain join agg:  $plain")
    println(s"[drive] salted join agg: $salted  (must match)")
    spark.stop()
  }
}
