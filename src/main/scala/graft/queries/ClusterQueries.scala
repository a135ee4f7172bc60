package graft.queries

import org.apache.spark.sql.functions._

import graft.QueryDef, QueryDef.oracle
import graft.operators.ClusterOps
import graft.sources.Tables

/** Embedding-clustering family: deterministic k-means assignment and the
  * SemDeDup semantic-pruning pass built on it ([[graft.operators.ClusterOps]]).
  *
  * The oracles replay the fixed-point arithmetic verbatim — micro-unit
  * quantization, BIGINT centroid sums, the `v·v + c·c − 2·v·c` distance
  * with sequential double folds — so assignments and prune decisions are
  * bit-identical across engines.
  */
object ClusterQueries {

  /** DuckDB fragment: sequential double dot of two list columns (the
    * list_reduce mirror of [[graft.operators.SimOps.dotX]]). */
  private def dotD(a: String, b: String): String =
    s"list_reduce([0.0::DOUBLE] || list_transform(range(1, len($a)+1), " +
      s"i -> $a[i]::DOUBLE * $b[i]::DOUBLE), (acc, z) -> acc + z)"

  /** Parameterized oracle CTE chain ending in `${p}a2(vec_id, cluster)`
    * — a k-cluster, two-round fixed-point k-means over `src` (a table
    * name or parenthesized subquery yielding (vec_id, embedding)).
    * Prefix `p` namespaces the CTEs so several chains — q88's
    * per-subspace codebooks — can share one WITH clause. The default
    * seed filter `vec_id < k` matches [[ClusterOps.kmeansAssign]]'s
    * lowest-k-ids seeding on the driver tables' DENSE ids; callers
    * clustering a SUBSET (q122's funnel tier 3) pass a rank-based
    * `seedWhere` instead — lowest-k-of-input is the operator's actual
    * contract (`orderBy(vec_id).limit(k)`). */
  private[queries] def kmeansCtesFor(src: String, k: Int, p: String,
      seedWhere: String = ""): String = {
    val seed = if (seedWhere.nonEmpty) seedWhere else s"vec_id < $k"
    s"""${p}m2t AS (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1000000.0::DOUBLE + 0.5::DOUBLE)) AS mvec
       |  FROM $src),
       |${p}mdt AS (
       |  SELECT vec_id, mvec, ${dotD("mvec", "mvec")} AS m2 FROM ${p}m2t),
       |${p}c0 AS (
       |  SELECT vec_id AS cluster, mvec AS cvec, m2 AS c2
       |  FROM ${p}mdt WHERE $seed),
       |${p}s1 AS (
       |  SELECT v.vec_id, c.cluster,
       |    v.m2 + c.c2 - 2.0::DOUBLE * ${dotD("v.mvec", "c.cvec")} AS dist
       |  FROM ${p}mdt v CROSS JOIN ${p}c0 c),
       |${p}a1 AS (
       |  SELECT vec_id, cluster FROM (
       |    SELECT vec_id, cluster,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cluster) AS rn
       |    FROM ${p}s1)
       |  WHERE rn = 1),
       |${p}ex1 AS (
       |  SELECT a.cluster,
       |    unnest(range(1, len(v.mvec)+1)) AS dim,
       |    unnest(list_transform(range(1, len(v.mvec)+1), i -> CAST(v.mvec[i] AS BIGINT))) AS mv
       |  FROM ${p}a1 a JOIN ${p}mdt v USING (vec_id)),
       |${p}u1 AS (
       |  SELECT cluster, dim,
       |    CAST(sum(mv) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS cv
       |  FROM ${p}ex1 GROUP BY 1, 2),
       |${p}c1 AS (
       |  SELECT cluster, list(cv ORDER BY dim) AS cvec FROM ${p}u1 GROUP BY 1),
       |${p}c1n AS (
       |  SELECT cluster, cvec, ${dotD("cvec", "cvec")} AS c2 FROM ${p}c1),
       |${p}s2 AS (
       |  SELECT v.vec_id, c.cluster,
       |    v.m2 + c.c2 - 2.0::DOUBLE * ${dotD("v.mvec", "c.cvec")} AS dist
       |  FROM ${p}mdt v CROSS JOIN ${p}c1n c),
       |${p}a2 AS (
       |  SELECT vec_id, cluster FROM (
       |    SELECT vec_id, cluster,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cluster) AS rn
       |    FROM ${p}s2)
       |  WHERE rn = 1)""".stripMargin
  }

  /** Shared oracle CTE chain ending in `a2(vec_id, cluster)` — the k=8,
    * two-round k-means assignment (q73/q74's surface). */
  private val kmeansCtes: String = kmeansCtesFor("embeddings", 8, "")

  /** Shared continuation of [[kmeansCtes]] ending in `md(vec_id,
    * cluster, dist2)` — FINAL centroids (one recentering past the last
    * assignment) and each member's squared distance to its own centroid
    * (q93's census and q105's prototype ranking both read it). */
  private val finalDistCtes: String =
    s"""fex AS (
       |  SELECT a.cluster,
       |    unnest(range(1, len(v.mvec)+1)) AS dim,
       |    unnest(list_transform(range(1, len(v.mvec)+1), i -> CAST(v.mvec[i] AS BIGINT))) AS mv
       |  FROM a2 a JOIN mdt v USING (vec_id)),
       |fu AS (
       |  SELECT cluster, dim,
       |    CAST(sum(mv) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS cv
       |  FROM fex GROUP BY 1, 2),
       |fc AS (
       |  SELECT cluster, list(cv ORDER BY dim) AS cvec FROM fu GROUP BY 1),
       |fcn AS (
       |  SELECT cluster, cvec, ${dotD("cvec", "cvec")} AS c2 FROM fc),
       |md AS (
       |  SELECT a.vec_id, a.cluster,
       |    v.m2 + c.c2 - 2.0::DOUBLE * ${dotD("v.mvec", "c.cvec")} AS dist2
       |  FROM a2 a JOIN mdt v USING (vec_id) JOIN fcn c USING (cluster))""".stripMargin

  def defs: Seq[QueryDef] = Seq(

    oracle(
      "q73_kmeans_clusters",
      s"""WITH $kmeansCtes,
         |sz AS (
         |  SELECT cluster, CAST(count(*) AS BIGINT) AS cluster_size
         |  FROM a2 GROUP BY 1)
         |SELECT a.vec_id, a.cluster, sz.cluster_size
         |FROM a2 a JOIN sz USING (cluster)
         |ORDER BY a.vec_id""",
      "Clustering: deterministic fixed-point Lloyd k-means (k=8, 2 rounds)") { (s, d) =>
      ClusterOps.kmeansAssign(Tables(s, d, "embeddings"))
        .orderBy("vec_id")
    },

    oracle(
      "q74_semdedup",
      s"""WITH $kmeansCtes,
         |nrm AS (
         |  SELECT vec_id, embedding,
         |    sqrt(${dotD("embedding", "embedding")}) AS norm
         |  FROM embeddings),
         |dups AS (
         |  SELECT cb.vec_id AS vec_id, CAST(count(*) AS BIGINT) AS n_dups
         |  FROM a2 ca JOIN a2 cb
         |    ON ca.cluster = cb.cluster AND ca.vec_id < cb.vec_id
         |  JOIN nrm x ON x.vec_id = ca.vec_id
         |  JOIN nrm y ON y.vec_id = cb.vec_id
         |  WHERE ${dotD("x.embedding", "y.embedding")} / (x.norm * y.norm) >= 0.3
         |  GROUP BY 1)
         |SELECT a.vec_id, a.cluster,
         |  coalesce(p.n_dups, 0)::BIGINT AS n_dups,
         |  p.n_dups IS NULL AS kept
         |FROM a2 a LEFT JOIN dups p USING (vec_id)
         |ORDER BY a.vec_id""",
      "Dedup: SemDeDup — within-k-means-cluster cosine pruning") { (s, d) =>
      ClusterOps.semDedupKeepers(Tables(s, d, "embeddings"), minCosine = 0.3)
        .orderBy("vec_id")
    },

    // Product quantization: m=2 subspaces (integer-div halves of the
    // embedding), k=4 codewords each, the same two-round fixed-point
    // k-means per subspace — two prefixed copies of the kmeans CTE
    // chain over sliced vectors, joined into the code tuple.
    oracle(
      "q88_pq_codes",
      s"""WITH ${kmeansCtesFor(
             "(SELECT vec_id, embedding[1:len(embedding)//2] AS embedding FROM embeddings)",
             4, "x")},
         |${kmeansCtesFor(
             "(SELECT vec_id, embedding[len(embedding)//2+1:len(embedding)] AS embedding FROM embeddings)",
             4, "y")},
         |coded AS (
         |  SELECT x.vec_id, x.cluster AS code_0, y.cluster AS code_1
         |  FROM xa2 x JOIN ya2 y USING (vec_id)),
         |cells AS (
         |  SELECT code_0, code_1, CAST(count(*) AS BIGINT) AS cell_size
         |  FROM coded GROUP BY 1, 2)
         |SELECT c.vec_id, c.code_0, c.code_1, l.cell_size
         |FROM coded c JOIN cells l USING (code_0, code_1)
         |ORDER BY c.vec_id""",
      "ANN: product-quantization codes (m=2, k=4) + cell occupancy") { (s, d) =>
      ClusterOps.pqEncode(Tables(s, d, "embeddings"))
        .orderBy("vec_id")
    },

    // Cluster-quality census: centroids are the means of the FINAL
    // members (one recentering past the last assignment), inertia /
    // spread / inter-centroid distances replay the same fixed-point
    // arithmetic and are floored to BIGINT micro-units² so both engines
    // emit identical integers.
    oracle(
      "q93_cluster_quality",
      s"""WITH $kmeansCtes,
         |$finalDistCtes,
         |st AS (
         |  SELECT cluster, CAST(count(*) AS BIGINT) AS cluster_size,
         |    CAST(sum(CAST(floor(dist2) AS BIGINT)) AS BIGINT) AS inertia,
         |    CAST(floor(max(dist2)) AS BIGINT) AS spread
         |  FROM md GROUP BY 1),
         |med AS (
         |  SELECT cluster, vec_id AS medoid_id FROM (
         |    SELECT cluster, vec_id,
         |      ROW_NUMBER() OVER (PARTITION BY cluster ORDER BY dist2, vec_id) AS rn
         |    FROM md) WHERE rn = 1),
         |nnb AS (
         |  SELECT cluster, nn_cluster, CAST(floor(d) AS BIGINT) AS nn_dist2 FROM (
         |    SELECT a.cluster, b.cluster AS nn_cluster,
         |      a.c2 + b.c2 - 2.0::DOUBLE * ${dotD("a.cvec", "b.cvec")} AS d,
         |      ROW_NUMBER() OVER (PARTITION BY a.cluster
         |        ORDER BY a.c2 + b.c2 - 2.0::DOUBLE * ${dotD("a.cvec", "b.cvec")},
         |          b.cluster) AS rn
         |    FROM fcn a JOIN fcn b ON a.cluster <> b.cluster) WHERE rn = 1)
         |SELECT s.cluster, s.cluster_size, s.inertia, m.medoid_id, s.spread,
         |  n.nn_cluster, n.nn_dist2
         |FROM st s JOIN med m USING (cluster) LEFT JOIN nnb n USING (cluster)
         |ORDER BY s.cluster""",
      "Clustering: per-cluster quality census (inertia/medoid/spread/NN margin)") { (s, d) =>
      ClusterOps.clusterQuality(Tables(s, d, "embeddings"))
        .orderBy("cluster")
    },

    // Prototype-based data pruning (Sorscher et al. 2022): rank members
    // by distance to their FINAL centroid; the closest 25% of each
    // cluster (the most prototypical / least marginal-signal examples)
    // flag `pruned`. Threshold compares integers (rank·10⁶ vs
    // 250000·size) so boundary rows never round differently.
    oracle(
      "q105_prototype_pruning",
      s"""WITH $kmeansCtes,
         |$finalDistCtes,
         |sz AS (
         |  SELECT cluster, CAST(count(*) AS BIGINT) AS cluster_size
         |  FROM a2 GROUP BY 1),
         |rk AS (
         |  SELECT vec_id, cluster, CAST(floor(dist2) AS BIGINT) AS dist2,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY cluster
         |      ORDER BY dist2, vec_id) AS BIGINT) AS proto_rank
         |  FROM md)
         |SELECT r.vec_id, r.cluster, r.dist2, r.proto_rank, s.cluster_size,
         |  r.proto_rank * 1000000 <= 250000 * s.cluster_size AS pruned
         |FROM rk r JOIN sz s USING (cluster)
         |ORDER BY r.vec_id""",
      "Curation: prototype-based data pruning ranking (easy-example drop)") { (s, d) =>
      ClusterOps.prototypePruning(Tables(s, d, "embeddings"), pruneFrac = 0.25)
        .orderBy("vec_id")
    })
}
