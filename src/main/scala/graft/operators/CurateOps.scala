package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end curation decision — the query a corpus owner actually
  * runs before a training job: every document, every rule's verdict,
  * and the conjunctive keep. Composes the already-oracle-checked rule
  * operators rather than reimplementing them, which is the point: the
  * engine's operators are designed to chain.
  *
  * Rules (each a boolean column, so the report doubles as the
  * per-rule ablation readout):
  *  - `lang_ok`: [[TextOps.langScored]] recognizes a profiled language
  *    (`lang_guess != 'und'`) — zero-function-word junk drops;
  *  - `gopher_ok`: [[TextOps.gopherStats]]' conjunctive repetition keep;
  *  - `length_ok`: membership in [[TextOps.lengthWindowFilter]]'s
  *    per-stratum [p5, p95] window;
  *  - `dedup_keeper`: [[DedupOps.componentKeepers]] over verified
  *    MinHash-LSH pairs at τ = 0.5 elects this doc its near-dup
  *    family's first occurrence (isolated docs keep themselves).
  *
  * Shape at 100 TB: the rule subtrees are the proven shapes (per-row
  * scans, two-level partial aggs, LSH-bounded pair joins, O(log d)
  * contraction); this operator adds only doc-keyed hash joins to
  * assemble the report — no new corpus-scale shuffle beyond its
  * inputs'. */
object CurateOps {

  def curationReport(documents: DataFrame,
      minJaccard: Double = 0.5,
      maxShingleDf: Option[Long] = None): DataFrame = {
    // ONE materialization of the corpus scan (round-6 verdict item 3:
    // the five rule subtrees each re-executed the scan, and the closure
    // re-executed it per round through its pair lineage). localCheckpoint
    // truncates lineage to executor-local blocks — the same mechanism
    // componentKeepers already uses per contraction round.
    // Range-spread by doc_id BEFORE the checkpoint (round 15): the
    // local single-split scan otherwise checkpoints into ONE block, so
    // every per-row rule subtree (langScored, gopher tokenize, the pair
    // shingling) runs serially from it; the checkpoint preserves the
    // partitioning, so all downstream stages fan out. At corpus scale
    // the scan is already parallel and the range exchange replaces the
    // equally-sized exchange the report's doc_id joins need anyway.
    val docs = documents.repartitionByRange(col("doc_id")).localCheckpoint()
    val lang = TextOps.langScored(docs)
      .select(col("doc_id"), col("lang_guess"))
    val gopher = TextOps.gopherStats(docs)
      .select(col("doc_id"), col("keep").as("gopher_ok"))
    val lw = TextOps.lengthWindowFilter(docs)
      .select(col("doc_id"), lit(1).as("_lw"))
    // maxShingleDf bounds the LSH candidate-pair fan-out (hot
    // boilerplate shingles poison the signatures into shared buckets —
    // the superlinear pair growth the 10× smoke measured at 108× task-
    // seconds); pick the cap off the q84 bucket-health readout
    val pairs = DedupOps.minhashCandidatePairs(docs, maxShingleDf)
      .filter(col("jaccard") >= minJaccard).select("a", "b")
    val labels = DedupOps.componentKeepers(pairs)
      .withColumnRenamed("id", "doc_id")
    docs.select("doc_id")
      .join(lang, Seq("doc_id"))
      .join(gopher, Seq("doc_id"))
      .join(lw, Seq("doc_id"), "left")
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (col("lang_guess") =!= "und").as("lang_ok"),
        col("gopher_ok"),
        col("_lw").isNotNull.as("length_ok"),
        (coalesce(col("label"), col("doc_id")) === col("doc_id"))
          .as("dedup_keeper"))
      .withColumn("kept",
        col("lang_ok") && col("gopher_ok") && col("length_ok") &&
          col("dedup_keeper"))
  }
}
