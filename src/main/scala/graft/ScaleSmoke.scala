package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 10× scale smoke for the dedup/ANN family (round-4 verdict item 8):
  * the ScaleSpec exchange pins prove the PLANS don't change shape with
  * volume; this main proves the WALL-CLOCK scales ~linearly and catches
  * memory cliffs the pins can't see, with a committed record
  * (`BENCH_SCALE.json`).
  *
  * The 10× slice is synthetic growth of the sf0.1 fixtures, built so the
  * workload's character scales LINEARLY instead of quadratically:
  *
  *  - documents: replica k ≥ 1 suffixes every token with `_k`, so
  *    replicas of the same document share NO shingles — each replica
  *    carries its own copy of the planted dup clusters (clusters × 10,
  *    cluster SIZE unchanged; exact-copy replication would instead grow
  *    every cluster 10× and the in-cluster pair count 100×).
  *  - embeddings: replica k rotates the vector k positions. Rotation is
  *    an isometry — within a replica every dot product, norm, and
  *    neighbor rank is EXACTLY the original structure — while
  *    cross-replica directions decorrelate, so ANN work grows with the
  *    corpus, not with artificial duplicate pileups.
  *
  * Probe-side filters (`vec_id < 50`, `doc_id < 25`) keep selecting only
  * replica-0 ids (replica ids start at k·10⁶): probe sets stay constant
  * while the corpus scales — the 100 TB shape these operators are built
  * for (bounded probe × streaming corpus).
  *
  * Usage: sbt 'runMain graft.ScaleSmoke'
  * (env: SPARK_GRAFT_SF_DIR base dir, SPARK_GRAFT_SCALE_DIR output dir,
  * SPARK_GRAFT_SCALE_FACTOR replicas, default 10) */
object ScaleSmoke {

  /** The dedup/ANN family named by the verdict item, plus q69 — the
    * round-4 scale-killer (df window on the raw term key) whose
    * partial-agg reshape this smoke independently evidences. */
  val targets: Seq[String] = Seq(
    "q34_dedup_exact", "q35_minhash_sig", "q36_minhash_lsh_pairs",
    "q37_simhash", "q38_jaccard_blocked", "q39_cosine_topk",
    "q40_hyperplane_buckets", "q41_bucketed_neighbors",
    "q57_transitive_keepers", "q59_simhash_neardup",
    "q62_decontamination", "q65_segment_dedup", "q69_rare_terms")

  private val Stride = 1000000L

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val scaled = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_scale10")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // a marker records WHAT the cached slice was built from — silently
    // reusing a slice generated at a different factor or from a
    // different base would stamp BENCH_SCALE.json with wrong-scale
    // ratios (reviewed round 5)
    val marker = Paths.get(s"$scaled/_GENERATED_FROM")
    val stamp = s"base=$base factor=$factor"
    val fresh = Files.exists(marker) &&
      new String(Files.readAllBytes(marker), StandardCharsets.UTF_8) == stamp
    if (!fresh) {
      generate(spark, base, scaled, factor)
      Files.createDirectories(marker.getParent)
      Files.write(marker, stamp.getBytes(StandardCharsets.UTF_8))
    }

    def timed(name: String, dir: String): Double = {
      System.gc()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    val rows = targets.map { name =>
      // two runs per scale: the first absorbs codegen/JIT for this query,
      // the second is the comparable number; both are recorded
      val b = Seq(timed(name, base), timed(name, base))
      val x = Seq(timed(name, scaled), timed(name, scaled))
      val ratio = x.last / b.last
      println(f"[scale] $name%-24s base ${b.head}%.2f/${b.last}%.2f s   " +
        f"x$factor ${x.head}%.2f/${x.last}%.2f s   ratio ${ratio}%.1f")
      name -> ((b, x, ratio))
    }

    val totalB = rows.map(_._2._1.last).sum
    val totalX = rows.map(_._2._2.last).sum
    val perQuery = rows.map { case (n, (b, x, r)) =>
      f""""$n":{"base":[${b.head}%.2f,${b.last}%.2f],""" +
        f""""x$factor":[${x.head}%.2f,${x.last}%.2f],"ratio":$r%.2f}"""
    }.mkString(",")
    val json =
      f"""{"factor":$factor,"base":"$base","scaled":"$scaled",""" +
        f""""total_base_sec":$totalB%.2f,"total_x${factor}_sec":$totalX%.2f,""" +
        f""""total_ratio":${totalX / totalB}%.2f,"queries":{$perQuery}}"""
    Files.write(Paths.get("BENCH_SCALE.json"),
      json.getBytes(StandardCharsets.UTF_8))
    println(json)
    spark.stop()
  }

  /** Materialize the `factor`× documents/embeddings slice under `out`. */
  private def generate(spark: SparkSession, base: String, out: String,
      factor: Int): Unit = {
    val reps = spark.range(factor).select(col("id").as("k"))
    val docs = spark.read.parquet(s"$base/documents.parquet")
      .crossJoin(broadcast(reps))
      .withColumn("text",
        when(col("k") === 0L, col("text")).otherwise(expr(
          "array_join(transform(split(text, ' '), t -> concat(t, '_', CAST(k AS STRING))), ' ')")))
      .select(
        (col("doc_id") + col("k") * lit(Stride)).as("doc_id"),
        col("text"), col("lang"), col("source"),
        length(col("text")).cast("long").as("n_chars"))
    docs.repartition(8).write.mode("overwrite")
      .parquet(s"$out/documents.parquet")
    val embSrc = spark.read.parquet(s"$base/embeddings.parquet")
    // rotation by k is only a distinct isometry for k < dims: slice
    // lengths go negative past it and k == dims is the identity (an
    // exact replica-0 duplicate, silently breaking the decorrelation
    // the linear-scaling argument rests on — reviewed round 5)
    val dims = embSrc.select(size(col("embedding"))).head.getInt(0)
    require(factor <= dims,
      s"scale factor $factor exceeds embedding dims $dims — rotation replicas would collide")
    val embs = embSrc
      .crossJoin(broadcast(reps))
      .select(
        (col("vec_id") + col("k") * lit(Stride)).as("vec_id"),
        when(col("k") === 0L, col("embedding")).otherwise(expr(
          """concat(slice(embedding, CAST(k AS INT) + 1, size(embedding) - CAST(k AS INT)),
            |       slice(embedding, 1, CAST(k AS INT)))""".stripMargin))
          .as("embedding"),
        col("label"))
    embs.repartition(8).write.mode("overwrite")
      .parquet(s"$out/embeddings.parquet")
    println(s"[scale] generated ${factor}x slice at $out")
  }
}
