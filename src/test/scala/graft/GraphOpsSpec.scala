package graft

import graft.operators.GraphOps

/** Exact-value pins for the integer fixed-point PageRank
  * ([[graft.operators.GraphOps]]). Bit-level cross-engine equality is
  * q89's oracle job; this spec hand-computes the micro-unit arithmetic
  * on a star graph so a refactor can't silently change the fixed-point
  * contract. */
class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank: star hub accumulates; exact micro-unit values; dangling mass drops") {
    // 2,3,4 each point only at 1; 1 is dangling (its mass drops).
    val edges = Seq((2L, 1L), (3L, 1L), (4L, 1L)).toDF("src", "dst")
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("vec_id")
    // iter1: inflow(1) = 3·(1000000 div 1); r(1) = 150000 + (85·3000000) div 100
    // iter2: spokes sat at 150000, so inflow(1) = 450000 → r(1) = 532500
    val out = GraphOps.pageRank(edges, nodes, iters = 2)
      .orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1L)._1 === 532500L)
    Seq(2L, 3L, 4L).foreach { v =>
      assert(out(v)._1 === 150000L, s"spoke $v gets only the base")
    }
    assert(out(1L)._2 === 0.5325)
    // determinism: an independent run reproduces every micro-unit
    val again = GraphOps.pageRank(edges, nodes, iters = 2)
      .orderBy("vec_id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again === out.map { case (k, v) => k -> v._1 })
  }

  test("labelCoherence: minority label in a tight cluster flags incoherent") {
    // four identical vectors share every LSH bucket; labels A,A,A,B.
    // Each vector's 3 neighbors are the other three: the A's see
    // {A,A,B} → majority A, coherent; B sees {A,A,A} → incoherent.
    val vec = Array.tabulate(8)(i => if (i == 0) 1.0f else 0.0f)
    val emb = Seq(0L, 1L, 2L, 3L).map(i => (i, vec)).toDF("vec_id", "embedding")
    val labels = Seq((0L, "A"), (1L, "A"), (2L, "A"), (3L, "B"))
      .toDF("vec_id", "label")
    val out = GraphOps.labelCoherence(emb, labels)
      .orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getString(4), r.getBoolean(5)))
      .toMap
    Seq(0L, 1L, 2L).foreach { v =>
      val (nn, na, mj, ok) = out(v)
      assert(nn === 3L && na === 2L && mj === "A" && ok,
        s"A-labeled $v must be coherent: $out")
    }
    val (nn, na, mj, ok) = out(3L)
    assert(nn === 3L && na === 0L && mj === "A" && !ok,
      "the minority B vector is the mislabel lead")
  }

  test("pageRank: parallel edges split a node's rank across its out-degree") {
    // 2 has TWO edges (both to 1): each carries r div 2 — together the
    // whole (truncated) rank, same as one edge to one target would.
    val edges = Seq((2L, 1L), (2L, 1L)).toDF("src", "dst")
    val nodes = Seq(1L, 2L).toDF("vec_id")
    val out = GraphOps.pageRank(edges, nodes, iters = 1)
      .orderBy("vec_id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // inflow(1) = 2·(1000000 div 2) = 1000000 → r(1) = 150000 + 850000
    assert(out(1L) === 1000000L && out(2L) === 150000L)
  }

  test("knnTriangles: a planted 4-clique scores coefficient 1.0, a planted pair 0") {
    // ids 0–3: near-identical (mutual top-3 → K4); ids 4–5: the
    // antipodal direction (own LSH bucket, a single edge, no triangles)
    val vecs = Seq(
      (0L, Array(1.00f, 0.00f, 0f, 0f)),
      (1L, Array(0.99f, 0.01f, 0f, 0f)),
      (2L, Array(0.98f, 0.02f, 0f, 0f)),
      (3L, Array(0.97f, 0.03f, 0f, 0f)),
      (4L, Array(-1.00f, -0.01f, 0f, 0f)),
      (5L, Array(-0.99f, -0.02f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val out = GraphOps.knnTriangles(vecs).orderBy("vec_id").collect()
      .map(r => r.getLong(0) ->
        (r.getAs[Long]("degree"), r.getAs[Long]("n_triangles"),
          r.getAs[Double]("clustering_coef"))).toMap
    (0L to 3L).foreach { v =>
      assert(out(v) === ((3L, 3L, 1.0)), s"clique vertex $v: ${out(v)}")
    }
    (4L to 5L).foreach { v =>
      assert(out(v) === ((1L, 0L, 0.0)), s"pair vertex $v: ${out(v)}")
    }
  }
}
