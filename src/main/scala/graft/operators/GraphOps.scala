package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph-centrality operators over corpus-derived graphs. The first
  * consumer is graph-based data weighting: PageRank over the approximate
  * KNN graph scores how "central" a document's embedding is in the
  * corpus manifold — hubs are canonical/redundant content, low-rank
  * nodes are outliers — and the score feeds sampling the same way
  * [[TextOps.targetAffinity]] or [[SampleOps]] quotas do.
  *
  * Determinism contract (the q73 fixed-point discipline): ranks live in
  * integer MICRO-UNITS (scale 10⁶) and every update is BIGINT
  * arithmetic — `div` for the per-edge split, exact integer sums for
  * the inflow (integer addition is associative, so shuffle order can't
  * change a result), and a rational damping step
  * `r' = base + (num·inflow) div den`. No floating point exists
  * anywhere in the iteration, so Spark and the DuckDB oracle replay
  * bit-identically; the one double column is a final display division.
  */
object GraphOps {

  val Scale = 1000000L

  /** Deterministic integer PageRank over an explicit edge list.
    *
    * `edges`: (src, dst) rows — parallel edges count twice; a node's
    * out-degree is its edge count. `nodes`: one row per `vec_id`
    * (defines the rank domain; isolated nodes stay at the base).
    * Damping is the rational `dampNum/dampDen` (default 85/100);
    * dangling mass (nodes with no out-edges) is dropped rather than
    * redistributed — the standard simplification when ranks feed a
    * RELATIVE sampling weight, documented here because it means ranks
    * do not sum exactly to N·Scale.
    *
    * Shape at 100 TB: the edge list is degree-joined and
    * localCheckpointed ONCE (it feeds every iteration — the
    * [[DedupOps.componentKeepers]] lineage discipline), each iteration
    * is one narrow equi-join on src plus a partial-agg sum on dst, and
    * each new rank vector localCheckpoints so lineage stays O(1) in
    * the iteration count. Skewed in-degree (a viral hub) is a hot
    * GROUPBY key — partial aggregation absorbs it map-side. */
  def pageRank(edges: DataFrame, nodes: DataFrame, iters: Int = 2,
      dampNum: Long = 85L, dampDen: Long = 100L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(dampDen >= 1L && dampNum >= 0L && dampNum <= dampDen,
      s"damping must satisfy 0 <= num <= den, got $dampNum/$dampDen")
    val base = ((dampDen - dampNum) * Scale) / dampDen
    val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val linked = edges.join(deg, Seq("src")).localCheckpoint()
    val n = nodes.select("vec_id")
    val r0 = n.select(col("vec_id"), lit(Scale).as("r"))
    val ranks = (1 to iters).foldLeft(r0) { (r, _) =>
      val inflow = linked
        .join(r, linked("src") === r("vec_id"))
        .select(col("dst"), expr("r div outdeg").as("c"))
        .groupBy("dst").agg(sum("c").as("inflow"))
      n.join(inflow, n("vec_id") === inflow("dst"), "left")
        .select(col("vec_id"),
          (lit(base) + expr(s"($dampNum * coalesce(inflow, 0L)) div $dampDen"))
            .as("r"))
        .localCheckpoint()
    }
    ranks.select(col("vec_id"), col("r").as("pagerank_micro"),
      (col("r").cast("double") / lit(Scale.toDouble)).as("pagerank"))
  }

  /** Label coherence over the approximate KNN graph — the
    * neighborhood-vote mislabel detector (the k-NN consistency check
    * behind confident-learning-style label auditing): each vector's
    * labeled neighbors vote with THEIR labels; a vector whose own label
    * loses the vote is flagged incoherent (mislabeled, or sitting in
    * another label's embedding region — either way, a curation lead).
    *
    * `labels`: (vec_id, label). All three readouts are over LABELED
    * neighbors (an unlabeled neighbor can't vote, so it doesn't count
    * toward the denominator either). Majority = highest labeled-neighbor
    * count, ties broken by label ascending (bit-deterministic, computed
    * as a struct-min argmax — no rank window). Vectors with NO labeled
    * graph neighbors (alone in their LSH bucket) keep NULL
    * majority/coherent — absence of evidence, distinct from
    * disagreement.
    *
    * Shape at 100 TB: [[SimOps.knnGraph]]'s LSH-bounded build; the
    * label table is localCheckpointed ONCE (narrow (vec_id, label)
    * rows — the q69 tf discipline) so its lineage isn't re-executed per
    * reference; after the single edge⋈label join everything is two
    * per-vector partial aggs over ≤ k·|labels| vote rows and one narrow
    * join-back. */
  def labelCoherence(embeddings: DataFrame, labels: DataFrame,
      k: Int = 3, nBits: Int = 12): DataFrame = {
    val lb = labels.select(col("vec_id"), col("label")).localCheckpoint()
    val edges = SimOps.knnGraph(embeddings, k, nBits)
      .select(col("q_id"), col("n_id")).localCheckpoint()
    val votes = edges
      .join(lb.select(col("vec_id").as("n_id"), col("label").as("n_label")), Seq("n_id"))
      .groupBy("q_id", "n_label").agg(count(lit(1)).as("c"))
    // one pass over the (q_id, n_label, c) votes: degree = Σc, agreement
    // = Σc on the own-label row, majority = argmax by (c desc, label asc)
    // via min(struct(-c, label)) — bit-deterministic, window-free
    val stats = votes
      .join(lb.select(col("vec_id").as("q_id"), col("label").as("own")), Seq("q_id"))
      .groupBy("q_id").agg(
        sum(col("c")).as("nn"),
        sum(when(col("n_label") === col("own"), col("c")).otherwise(lit(0L))).as("na"),
        min(struct((-col("c")).as("nc"), col("n_label").as("l"))).as("mj"))
      .select(col("q_id"), col("nn"), col("na"),
        col("mj").getField("l").as("majority_label"))
    lb.join(stats, lb("vec_id") === stats("q_id"), "left").drop("q_id")
      .select(col("vec_id"), col("label"),
        coalesce(col("nn"), lit(0L)).as("n_neighbors"),
        coalesce(col("na"), lit(0L)).as("n_agree"),
        col("majority_label"),
        (col("label") === col("majority_label")).as("coherent"))
  }

  /** PageRank over the approximate KNN graph ([[SimOps.knnGraph]]):
    * each vector points at its top-k bucket neighbors, and centrality
    * in the resulting directed graph scores manifold-typicality for
    * sampling/weighting. Same LSH-bounded join shapes as q81 for the
    * graph build; [[pageRank]]'s iteration cost is O(E) = O(N·k). */
  def knnPageRank(embeddings: DataFrame, k: Int = 3, nBits: Int = 12,
      iters: Int = 2): DataFrame =
    pageRank(
      SimOps.knnGraph(embeddings, k, nBits)
        .select(col("q_id").as("src"), col("n_id").as("dst")),
      embeddings.select("vec_id"), iters)

  /** Per-vertex triangle count + local clustering coefficient over the
    * undirected KNN graph — the manifold-quality readout PageRank can't
    * give: a vector whose neighbors are ALSO mutual neighbors sits in a
    * dense region (canonical, near-dup-rich), one with a star-shaped
    * neighborhood bridges regions (diverse, keep for coverage).
    * Triangle census is the standard signal (Watts–Strogatz clustering
    * coefficient; 2·T / d(d−1)).
    *
    * Algorithm: orient every undirected edge low-id → high-id, count a
    * triangle once at its id-ordered wedge (x<y<z closed by edge (x,z))
    * — the classic dedup-free distributed formulation (one wedge join +
    * one closing semi-join, both equi-joins on vertex keys).
    *
    * Shape at 100 TB: |edges| ≤ N·k after the distinct; the wedge join
    * fans out as Σ_y deg⁺(y)·deg⁻(y) — bounded in expectation by the
    * KNN out-degree k, but a HUB vector (one appearing in many other
    * top-k lists) makes a hot join key: that is AQE skew-split
    * territory, same answer as the LSH bucket joins. Per-vertex counts
    * are partial-agg explodes; everything integer, coefficient is one
    * final cast-DOUBLE division. */
  def knnTriangles(embeddings: DataFrame, k: Int = 3,
      nBits: Int = 12): DataFrame = {
    val edges = SimOps.knnGraph(embeddings, k, nBits)
      .select(least(col("q_id"), col("n_id")).as("a"),
        greatest(col("q_id"), col("n_id")).as("b"))
      .distinct()
      // feeds the wedge join (both sides), the closing semi-join, and
      // the degree count — materialize once
      .localCheckpoint()
    val deg = edges.select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("degree"))
    val wedges = edges.select(col("a").as("x"), col("b").as("y"))
      .join(edges.select(col("a").as("y"), col("b").as("z")), Seq("y"))
    val tris = wedges
      .join(edges.select(col("a").as("x"), col("b").as("z")),
        Seq("x", "z"), "left_semi")
    val perv = tris.select(explode(array(col("x"), col("y"), col("z"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("n_triangles"))
    deg.join(perv, Seq("v"), "left")
      .select(col("v").as("vec_id"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
      .withColumn("clustering_coef", expr(
        """CASE WHEN degree >= 2
          | THEN CAST(2 * n_triangles AS DOUBLE)
          |      / (CAST(degree AS DOUBLE) * CAST(degree - 1 AS DOUBLE))
          | ELSE CAST(0.0 AS DOUBLE) END""".stripMargin.replace("\n", "")))
  }
}
