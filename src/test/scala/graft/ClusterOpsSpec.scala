package graft

import org.apache.spark.sql.functions._

import graft.operators.ClusterOps

/** Invariants of the deterministic k-means + SemDeDup family
  * ([[graft.operators.ClusterOps]]). The bit-level oracle check is
  * q73/q74's job; this spec pins the algebraic properties a refactor
  * could silently break. */
class ClusterOpsSpec extends SparkSpec {
  import spark.implicits._

  /** Two well-separated blobs on the first two axes plus their seeds:
    * ids 0..3 near (1,0,…), ids 4..7 near (0,1,…) — with k=2 the seeds
    * are 0 and 1, so after one recentering the blobs must split cleanly
    * along the axis. */
  private def blobs = Seq(
    (0L, Array(1.0f, 0.1f, 0f, 0f)),
    (1L, Array(0.1f, 1.0f, 0f, 0f)),
    (2L, Array(0.9f, 0.0f, 0f, 0f)),
    (3L, Array(1.1f, 0.2f, 0f, 0f)),
    (4L, Array(0.0f, 0.9f, 0f, 0f)),
    (5L, Array(0.2f, 1.1f, 0f, 0f)),
    (6L, Array(0.95f, 0.05f, 0f, 0f)),
    (7L, Array(0.05f, 0.95f, 0f, 0f))
  ).toDF("vec_id", "embedding")

  test("kmeansAssign: total, deterministic, and separates clean blobs") {
    val out = ClusterOps.kmeansAssign(blobs, k = 2, rounds = 2)
      .orderBy("vec_id").collect()
    assert(out.length === 8, "every vector gets exactly one cluster")
    val byId = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val xBlob = Set(0L, 2L, 3L, 6L).map(byId)
    val yBlob = Set(1L, 4L, 5L, 7L).map(byId)
    assert(xBlob.size === 1 && yBlob.size === 1 && xBlob != yBlob,
      s"blobs must separate, got $byId")
    // cluster_size agrees with the assignment itself
    out.groupBy(_.getLong(1)).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(2)).distinct === Array(rows.length.toLong))
    }
    // determinism: a second independent run reproduces the assignment
    val again = ClusterOps.kmeansAssign(blobs, k = 2, rounds = 2)
      .orderBy("vec_id").collect()
    assert(out.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("pqEncode: subspaces code independently; cell census ties out") {
    // 4-dim vectors, m=2 → 2-dim halves. Seeds (k=2) are ids 0/1, far
    // apart in BOTH halves, so each half splits near-seed-0 vs near-seed-1.
    val vecs = Seq(
      (0L, Array(0f, 0f, 0f, 0f)),
      (1L, Array(10f, 10f, 10f, 10f)),
      (2L, Array(0.1f, 0f, 0.2f, 0f)),    // near 0 in both halves
      (3L, Array(9.9f, 10f, 0f, 0.1f)),   // half0 near 1, half1 near 0
      (4L, Array(0f, 0.1f, 10f, 9.9f)))   // half0 near 0, half1 near 1
      .toDF("vec_id", "embedding")
    val out = ClusterOps.pqEncode(vecs, m = 2, k = 2)
      .orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(0L)._1 === out(2L)._1 && out(0L)._2 === out(2L)._2,
      "id 2 shares id 0's cell")
    assert(out(3L)._1 === out(1L)._1 && out(3L)._2 === out(0L)._2,
      "id 3 mixes: half0 with seed 1, half1 with seed 0")
    assert(out(4L)._1 === out(0L)._1 && out(4L)._2 === out(1L)._2,
      "id 4 mixes the other way")
    // cell occupancy: (0,0) holds ids 0+2; every other occupied cell is a singleton
    assert(out(0L)._3 === 2L && out(1L)._3 === 1L
      && out(3L)._3 === 1L && out(4L)._3 === 1L)
  }

  test("kmeansAssign: rounds=1 is pure seed-nearest assignment") {
    val out = ClusterOps.kmeansAssign(blobs, k = 2, rounds = 1)
      .orderBy("vec_id").collect()
    // seed 0 = (1, .1): nearest for the x blob; seed 1 = (.1, 1): y blob
    val byId = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Set(0L, 2L, 3L, 6L).forall(byId(_) == 0L))
    assert(Set(1L, 4L, 5L, 7L).forall(byId(_) == 1L))
  }

  test("kmeansAssign: seeds come from the k lowest ACTUAL ids (non-dense corpora seed fully)") {
    // round-5 advice: with `vec_id < k` seeding, a filtered corpus whose
    // ids all exceed k seeded EMPTY and silently assigned NULL clusters.
    // Shift every blob id by 1000: the k lowest actual ids are 1000/1001,
    // and the assignment must stay total with the same blob split.
    val shifted = blobs.withColumn("vec_id", col("vec_id") + 1000L)
    val out = ClusterOps.kmeansAssign(shifted, k = 2, rounds = 2)
      .orderBy("vec_id").collect()
    assert(out.length === 8, "every vector gets exactly one cluster")
    assert(out.forall(!_.isNullAt(1)), "no NULL clusters from an empty seed set")
    val byId = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val xBlob = Set(1000L, 1002L, 1003L, 1006L).map(byId)
    val yBlob = Set(1001L, 1004L, 1005L, 1007L).map(byId)
    assert(xBlob.size === 1 && yBlob.size === 1 && xBlob != yBlob)
  }

  test("kmeansAssign: hash seeding is deterministic, total, and converges on blobs") {
    // seedMode="hash" picks k lowest by md5(vec_id): pseudo-random but
    // fully deterministic spread. With enough Lloyd rounds the clean
    // blobs must still separate regardless of which side the seeds
    // landed on; two runs must agree bit-for-bit.
    val out = ClusterOps.kmeansAssign(blobs, k = 2, rounds = 5, seedMode = "hash")
      .orderBy("vec_id").collect()
    assert(out.length === 8)
    val byId = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val xBlob = Set(0L, 2L, 3L, 6L).map(byId)
    val yBlob = Set(1L, 4L, 5L, 7L).map(byId)
    assert(xBlob.size === 1 && yBlob.size === 1 && xBlob != yBlob,
      s"hash-seeded blobs must separate, got $byId")
    val again = ClusterOps.kmeansAssign(blobs, k = 2, rounds = 5, seedMode = "hash")
      .orderBy("vec_id").collect()
    assert(out.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("clusterQuality: census ties out against a hand-checkable split") {
    // blobs split cleanly (k=2, rounds=2): one cluster per blob, 4
    // members each. The readout must agree with the assignment.
    val assign = ClusterOps.kmeansAssign(blobs, k = 2, rounds = 2)
      .orderBy("vec_id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val out = ClusterOps.clusterQuality(blobs, k = 2, rounds = 2)
      .orderBy("cluster").collect()
    assert(out.length === 2, "one census row per surviving cluster")
    out.foreach { r =>
      val (cluster, size) = (r.getLong(0), r.getLong(1))
      val members = assign.filter(_._2 == cluster).keySet
      assert(size === members.size.toLong)
      assert(members.contains(r.getLong(3)), "medoid is a member")
      assert(r.getLong(2) >= 0L && r.getLong(4) >= 0L,
        "inertia and spread are non-negative")
      assert(r.getLong(4) * size >= r.getLong(2),
        "inertia cannot exceed size x worst member")
      // two clusters: each other's nearest neighbor
      assert(r.getLong(5) === out.map(_.getLong(0)).filter(_ != cluster).head)
      assert(r.getLong(6) > r.getLong(4),
        "well-separated blobs: inter-centroid gap exceeds within-cluster spread")
    }
    // nn_dist2 is symmetric for k=2 (same pair, same formula)
    assert(out(0).getLong(6) === out(1).getLong(6))
  }

  test("clusterQuality: k=1 has no neighbor columns, inertia still exact") {
    val out = ClusterOps.clusterQuality(blobs, k = 1, rounds = 1).collect()
    assert(out.length === 1)
    assert(out(0).getLong(1) === 8L)
    assert(out(0).isNullAt(5) && out(0).isNullAt(6),
      "nn_cluster/nn_dist2 are NULL when there is no other cluster")
  }

  test("kForCorpus holds expected cluster size at the target") {
    assert(ClusterOps.kForCorpus(0L) === 1)
    assert(ClusterOps.kForCorpus(999L) === 1)
    assert(ClusterOps.kForCorpus(1000000L) === 1000)
    assert(ClusterOps.kForCorpus(1000000L, 100L) === 10000)
  }

  test("semDedupKeepers: first-occurrence-wins within a cluster") {
    // ids 2/3/6 are near-identical to 0 (cosine ≫ 0.99); 4/5/7 to 1.
    val out = ClusterOps.semDedupKeepers(blobs, minCosine = 0.95, k = 2)
      .orderBy("vec_id").collect()
    assert(out.length === 8)
    val kept = out.filter(_.getBoolean(3)).map(_.getLong(0)).toSet
    // the lowest id of each near-dup group survives; every pruned row
    // records at least one lower-id neighbor
    assert(kept.contains(0L) && kept.contains(1L))
    out.filterNot(_.getBoolean(3)).foreach { r =>
      assert(r.getLong(2) >= 1L, s"pruned ${r.getLong(0)} needs a dup count")
    }
    // pruning never orphans: kept + pruned partition the input
    assert(out.map(_.getLong(0)).toSet === (0L to 7L).toSet)
  }

  test("semDedupKeepers: threshold above max cosine keeps everything") {
    val out = ClusterOps.semDedupKeepers(blobs, minCosine = 1.1, k = 2)
      .collect()
    assert(out.forall(_.getBoolean(3)))
    assert(out.forall(_.getLong(2) === 0L))
  }

  test("prototypePruning: ranks by centroid distance, prunes the closest fraction") {
    val out = ClusterOps.prototypePruning(blobs, pruneFrac = 0.25, k = 2)
      .orderBy("vec_id").collect()
    assert(out.length === 8)
    // ranks within each cluster are a permutation of 1..size
    out.groupBy(_.getLong(1)).foreach { case (_, rows) =>
      val ranks = rows.map(_.getAs[Long]("proto_rank")).sorted.toSeq
      assert(ranks === (1L to rows.length.toLong).toSeq)
      assert(rows.map(_.getAs[Long]("cluster_size")).distinct.toSeq
        === Seq(rows.length.toLong))
      // rank order agrees with distance order (ties by vec_id)
      val byRank = rows.sortBy(_.getAs[Long]("proto_rank"))
        .map(r => (r.getAs[Long]("dist2"), r.getLong(0)))
      assert(byRank.toSeq === byRank.sortBy(identity).toSeq)
      // exactly floor(0.25 * size) members prune — the closest ones
      val pruned = rows.filter(_.getAs[Boolean]("pruned"))
      assert(pruned.length === rows.length / 4)
      assert(pruned.map(_.getAs[Long]("proto_rank")).forall(_ <= rows.length / 4))
    }
  }

  test("prototypePruning: fraction 0 prunes nothing, 1 prunes everything") {
    val none = ClusterOps.prototypePruning(blobs, pruneFrac = 0.0, k = 2).collect()
    assert(none.forall(!_.getAs[Boolean]("pruned")))
    val all = ClusterOps.prototypePruning(blobs, pruneFrac = 1.0, k = 2).collect()
    assert(all.forall(_.getAs[Boolean]("pruned")))
  }
}
