package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
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
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val docs = graft.sources.Tables(spark, d, "documents")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  -> $r")
      r
    }

    // warm the session
    docs.count(); docs.count()

    // variant A: HOF transform shingles (current)
    val a = graft.operators.TextOps.shingled(docs)
      .select(col("doc_id"), explode(col("sh")).as("g"))
    time("A_hof.count")(a.count())
    time("A_hof.count2")(a.count())

    // variant D: posexplode + window lead (codegen + one sort)
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val dRows = docs
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "t")))
      .withColumn("t1", lead("t", 1).over(w))
      .withColumn("t2", lead("t", 2).over(w))
      .filter(col("t2").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("t"), col("t1"), col("t2")).as("g"))
    time("D_window.count")(dRows.count())
    time("D_window.count2")(dRows.count())

    // variant D + collect_set back to arrays
    val dArr = docs.join(
      dRows.groupBy("doc_id").agg(collect_set(col("g")).as("sh")), Seq("doc_id"), "left")
    time("D_arrays.count")(dArr.selectExpr("sum(size(sh))").collect()(0).toString)
    spark.stop()
  }
}
