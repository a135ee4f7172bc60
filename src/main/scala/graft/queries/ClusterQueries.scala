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

  /** Shared oracle CTE chain ending in `a2(vec_id, cluster)` — the k=8,
    * two-round k-means assignment. */
  private val kmeansCtes: String =
    s"""m2t AS (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1000000.0::DOUBLE + 0.5::DOUBLE)) AS mvec
       |  FROM embeddings),
       |mdt AS (
       |  SELECT vec_id, mvec, ${dotD("mvec", "mvec")} AS m2 FROM m2t),
       |c0 AS (
       |  SELECT vec_id AS cluster, mvec AS cvec, m2 AS c2
       |  FROM mdt WHERE vec_id < 8),
       |s1 AS (
       |  SELECT v.vec_id, c.cluster,
       |    v.m2 + c.c2 - 2.0::DOUBLE * ${dotD("v.mvec", "c.cvec")} AS dist
       |  FROM mdt v CROSS JOIN c0 c),
       |a1 AS (
       |  SELECT vec_id, cluster FROM (
       |    SELECT vec_id, cluster,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cluster) AS rn
       |    FROM s1)
       |  WHERE rn = 1),
       |ex1 AS (
       |  SELECT a.cluster,
       |    unnest(range(1, len(v.mvec)+1)) AS dim,
       |    unnest(list_transform(range(1, len(v.mvec)+1), i -> CAST(v.mvec[i] AS BIGINT))) AS mv
       |  FROM a1 a JOIN mdt v USING (vec_id)),
       |u1 AS (
       |  SELECT cluster, dim,
       |    CAST(sum(mv) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS cv
       |  FROM ex1 GROUP BY 1, 2),
       |c1 AS (
       |  SELECT cluster, list(cv ORDER BY dim) AS cvec FROM u1 GROUP BY 1),
       |c1n AS (
       |  SELECT cluster, cvec, ${dotD("cvec", "cvec")} AS c2 FROM c1),
       |s2 AS (
       |  SELECT v.vec_id, c.cluster,
       |    v.m2 + c.c2 - 2.0::DOUBLE * ${dotD("v.mvec", "c.cvec")} AS dist
       |  FROM mdt v CROSS JOIN c1n c),
       |a2 AS (
       |  SELECT vec_id, cluster FROM (
       |    SELECT vec_id, cluster,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cluster) AS rn
       |    FROM s2)
       |  WHERE rn = 1)""".stripMargin

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
    })
}
