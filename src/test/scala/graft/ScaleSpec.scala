package graft

import org.apache.spark.sql.functions._

import graft.operators.DedupOps

/** Scale-shape assertions (round-1 verdict item 8): the properties that
  * decide whether the dedup/ANN family survives a 100 TB corpus are PLAN
  * properties — no quadratic join shapes, bounded shuffle counts, and a
  * working answer to bucket skew. Timings are the bench's job; this spec
  * pins the shapes. */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("no registered query plans a CartesianProduct") {
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, sf("sf0.001")).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a CartesianProduct — quadratic at scale")
    }
  }

  test("nested-loop joins appear only where the bounded side is broadcast") {
    // q39/q40/q41/q54 intentionally broadcast a BOUNDED side (50-row
    // probe set, 12-row plane table) against the streaming corpus —
    // that is the scale shape, not an accident. Everything else must
    // plan hash/sort-merge equi-joins.
    val bounded = Set("q39_cosine_topk", "q40_hyperplane_buckets",
      "q41_bucketed_neighbors", "q54_cosine_neardup", "q56_ivf_neighbors",
      "q69_rare_terms", // 1-row corpus-count side, broadcast by construction
      "q73_kmeans_clusters", "q74_semdedup", // 1-row packed-centroid broadcast
      "q76_ann_recall", // bounded probe set + plane table broadcasts (q39/q41 shapes)
      "q79_source_temperature", "q80_unigram_rarity", // 1-row corpus-count / packed-weights broadcast
      "q81_knn_graph", // plane-table broadcast (q41's bucket shape)
      "q86_bloom_decontaminate", // 1-row bloom-bitset broadcast (~128 KB at any probe cardinality)
      "q87_target_affinity", // 1-row feature-totals broadcast; bucket tables join hashed on b
      "q90_banding_planner", // |configs|-row planner-grid broadcast (5 rows by default)
      "q93_cluster_quality", // k x k inter-centroid pass: both sides <= k rows by construction
      "q94_hard_negatives", // bounded probe-set broadcast (q39's shape)
      "q97_source_drift", // 1-row corpus-total and Q-constant broadcasts
      "q103_cms_heavy_hitters", // 1-row sketch broadcast (8 KiB at any corpus size)
      "q107_jl_recall", // bounded probe-set broadcast, both rankings (q39's shape)
      "q113_quality_threshold_sweep", // 1-row corpus-totals broadcast
      "q117_tfidf_keywords", // 1-row corpus-doc-count broadcast
      "q118_dedup_yield", // 1-row corpus-totals broadcast (the q113 shape)
      "q119_ivf_nprobe_recall", // k-row centroid + bounded probe-set broadcasts (q56/q76 shapes)
      "q122_dedup_funnel", // 1-row kmeans centroid + 1-row totals broadcasts (q73/q74 shapes)
      "q126_source_affinity", // ≤|sources|-row centroid table vs itself — bounded by construction
      "q129_embedding_health", // 1-row packed-centroid broadcast (the q73/q80 shape)
      "q142_bm25_topk", // 1-row (n_docs, total_len) totals broadcast (the q113/q118 shape)
      "q143_component_histogram", // 1-row (corpus total, max component) broadcast
      "q147_semantic_decontamination", // bounded eval-set broadcast (the q39/q94 probe shape); the train corpus streams
      "q148_zipf_spectrum", // 1-row corpus-totals broadcast onto ≤64 bucket rows
      "q157_rrf_fusion", // 1-row BM25 totals + 1-row probe-vector broadcasts (q142/q39 shapes)
      "q158_margin_mining", // bounded population-B broadcast vs bounded population A (the q39 probe shape both ways)
      "q163_truncation_recall", // bounded probe-set broadcast per evaluated dim (the q39/q107 shape)
      "q164_maxpassage_bm25", // 1-row (n_chunks, total_len) totals broadcast (the q142 shape at chunk granularity)
      "q172_sq8_recall") // bounded probe-set broadcast, float truth + code ranking (the q39/q107 shape)
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, sf("sf0.001")).queryExecution.executedPlan.toString
      if (plan.contains("BroadcastNestedLoopJoin")) {
        assert(bounded(name), s"$name plans an unexpected BroadcastNestedLoopJoin")
        assert(plan.contains("BuildRight") || plan.contains("BuildLeft"))
      }
    }
  }

  test("dedup/ANN shuffle counts stay at their designed bounds") {
    // Exchange count is a plan property, independent of data volume: at
    // 100× the data these queries shuffle the same number of times, just
    // wider. A regression here (an extra groupBy/join/repartition
    // sneaking in) multiplies corpus-scale cost, so the designed counts
    // are pinned exactly.
    val designed = Map(
      "q34_dedup_exact" -> 2,        // hash groupBy + total-order sort
      "q35_minhash_sig" -> 3,        // shingle agg + presence join + sort
      "q36_minhash_lsh_pairs" -> 10, // sig, band self-join, distinct, exploded-shingle verify (merge-hinted a-join + left (b,g)-join + pair agg) + merge-hinted nb join + sort (r5 item 5: shingle VALUES shuffle, not arrays; corpus sides pinned OUT of broadcast)
      "q37_simhash" -> 1,            // per-row, sort only
      "q38_jaccard_blocked" -> 5,    // blocked equi-join + count + 2 size joins + sort (size/block derive from ONE shingle pass — r3 single-pass rewrite)
      "q39_cosine_topk" -> 3,        // broadcast probe (no shuffle), rank window, sort
      "q40_hyperplane_buckets" -> 3, // plane broadcast, bucket agg, sort
      "q41_bucketed_neighbors" -> 7, // buckets twice + bucket self-join + sort
      "q59_simhash_neardup" -> 3,    // band self-join (reused exchange) + distinct + sort
      "q60_stratified_sample" -> 1,  // pure per-row hash gate + sort
      "q61_top_token_share" -> 3,    // token agg + per-doc agg (both partial-agg) + sort
      "q63_token_chunks" -> 1,       // narrow posexplode/slice + sort
      "q64_sequence_packing" -> 2,   // per-lang window + sort
      "q65_segment_dedup" -> 4,      // segment window + re-assembly agg + flag join + sort
      "q66_length_window" -> 3,      // per-stratum cutoffs agg (broadcast back) + sort
      "q67_orientation_vote" -> 2,   // one exchange on the page key feeds both windows + sort
      "q68_dup_ngrams" -> 4,         // gram agg + doc agg + completeness join-back + sort
      "q69_rare_terms" -> 6,         // tf localCheckpointed (agg exchange runs once, off-plan); df groupBy + tf-side join shuffle + corpus-count agg/broadcast + top-k window + sort
      "q70_source_quota" -> 2,       // per-source rank window + sort
      "q71_pii_redaction" -> 1,      // pure per-row regex passes + sort
      "q72_int8_quant" -> 1,         // pure per-row quantization + sort
      "q73_kmeans_clusters" -> 3,    // post-checkpoint: sizes agg + its broadcast + sort (per-round assignment is a map-side 1-row centroid broadcast; recentering exchanges run once inside the checkpoint jobs)
      "q74_semdedup" -> 5,           // post-checkpoint: cluster self-join (2) + dup-count agg + keep-flag join-back + sort
      "q75_gopher_rules" -> 7,       // word + bigram two-level partial aggs (2 each) + two doc_id join-backs + sort
      "q76_ann_recall" -> 12,        // truth checkpointed (brute-force window off-plan); candidate side = q41's bucket-join shape + one exploded direction pass; probe-set semi-join now DERIVED from truth (distinct agg + its broadcast, r5 advice) + hit/truth aggs, join-back, sort
      "q77_pair_calibration" -> 12,  // q36's candidate chain + ≤11-key histogram agg + const-keyed cum window (round 8: hash(const) replaced the SinglePartition exchange, whose output had also satisfied the final sort — the trailing range exchange over the same ≤11 rows is now explicit, hence +1) + sort
      "q78_source_overlap" -> 15,    // q36's candidate chain + two doc→source joins + |sources|²-key agg + sort
      "q79_source_temperature" -> 2, // per-source partial-agg count + 1-row pack; everything after is |sources|-row; sort
      "q80_unigram_rarity" -> 8,     // tf agg + df agg + tf⋈df join + per-doc agg + 1-row corpus-count broadcast + sort (the q69 shape)
      "q81_knn_graph" -> 8,          // q41's bucket self-join + exploded directions + per-vector WindowGroupLimit rank + sort
      "q82_contamination_report" -> 4, // bounded probe-shingle broadcast + (probe, source) agg with exact distinct (2-level) + sort
      "q83_curation_report" -> 15,   // q36's merge-hinted pair chain + gopher two-level aggs + length-window cutoff broadcast + four doc-keyed report joins + sort (closure labels off-plan: componentKeepers checkpoints)
      "q84_lsh_bucket_stats" -> 4,   // sig agg + (band, bucket) agg + <=bands agg (partial-agg collapse) + sort
      "q85_packing_report" -> 2,     // ONE per-lang exchange feeds window + agg (same key), local sort
      "q86_bloom_decontaminate" -> 10, // probe-shingle distinct ×2 (bitset build + verify: two narrow probe scans beat checkpointing a corpus-sized shingle set) + position distinct + densify join + 1-row pack + bitset/verify/hits broadcasts + doc agg + sort
      "q87_target_affinity" -> 15,   // (doc,b) agg + bucket-table aggs/broadcasts (≤numBuckets rows by construction) + two 1-row totals + per-doc agg + sort; docBuckets subtree reuses its exchange
      "q88_pq_codes" -> 15,          // post-checkpoint: 2 subspace chains × (sizes agg + broadcast + code join) + vec_id code join + k^m cell agg/broadcast + sort (per-round centroid work runs inside the checkpoint jobs)
      "q89_knn_pagerank" -> 1,       // sort only: the KNN-graph build and every O(E) iteration run inside localCheckpoint jobs (q57 lineage discipline), so the final plan reads the checkpointed rank vector
      "q90_banding_planner" -> 13,   // q77's LSH-bounded histogram chain + |configs|-row broadcast + ≤11·|configs| planner agg + sort
      "q91_cdc_segment_dedup" -> 4,  // q65's shape over content-defined spans: seg-text window + fused per-doc agg (totals + kept in ONE pass, round-7) + flag-back join + sort (narrow per-row span derivation, no extra shuffle)
      "q92_label_coherence" -> 6,    // post-checkpoint (KNN graph + label table both localCheckpointed): edge⋈label vote agg + own-label join (2 sides) + struct-min argmax agg reusing q_id partitioning + lb join-back + sort
      "q93_cluster_quality" -> 10,   // post-checkpoint: final recentering (posexplode agg ×2 + centroid broadcast) + per-cluster census agg + ≤k-row nn pass (broadcast + agg) + stats⋈nn join + sort — member pass is ONE broadcast join, no corpus self-join
      "q94_hard_negatives" -> 3,     // q39's shape: bounded probe broadcast + per-probe WindowGroupLimit rank + sort; corpus side streams
      "q95_winnow_fingerprints" -> 1, // pure per-row native winnow loop + sort (the q37 shape)
      "q96_bigram_surprise" -> 7,    // q80's shape + one key: bigram agg + unigram agg + bigram-string join + w1 join + per-doc agg + doc join-back + sort; both count tables partial-agg; bigrams are `||` strings (the q87 form — the struct-HOF form profiled ~10× slower)
      "q97_source_drift" -> 7,       // post-checkpoint (st + vocab-share qf): 1-row Q agg/broadcast + term join + ss agg/broadcast + per-source agg + sort; |sources| rows out
      "q98_winnow_containment" -> 7, // post-checkpoint fp set: n_fp agg + fingerprint-hash self-join + pair agg + two n_fp join-backs + sort; winnowing bounds fp rows to ~2/(w+1) of k-grams
      "q99_hashed_doc_vectors" -> 3, // explode + (doc, dim) partial agg + per-doc pack agg + sort; dense fill is dim-bounded per row
      "q100_data_recipe" -> 2,       // per-source token partial agg + 1-row packed-weights row + sort (the q79 shape over token counts)
      "q103_cms_heavy_hitters" -> 4, // exact-top-k token agg (TakeOrderedAndProject, never a global sort) + 1-row count-weighted sketch over the SAME grouped counts (its ReusedExchange marker counts here but moves nothing) + single-partition sketch agg + its broadcast — ONE corpus scan (round-7)
      "q104_encoding_quality" -> 1,  // pure per-row regex/length counts + sort (the q71 shape)
      "q105_prototype_pruning" -> 5, // post-checkpoint: recentering (cluster,dim + cluster aggs) + centroid broadcast + ONE cluster exchange feeding BOTH windows + sort
      "q106_jl_projection" -> 1,     // pure per-row constant-folded linear combinations + sort
      "q107_jl_recall" -> 7,         // truth checkpointed (its window off-plan); cand = probe broadcast + WindowGroupLimit rank + semi/outer probe-bounded joins + aggs + sort
      "q108_knn_triangles" -> 7,     // edges checkpointed (KNN build off-plan): wedge equi-join + closing (x,z) semi-join + degree/triangle partial-agg explodes + join-back + sort
      "q109_cjk_langid" -> 1,        // pure per-row script censuses + native lang_scores + sort (the q31 shape)
      "q110_boilerplate_lines" -> 5, // ONE posexplode feeds line-df census (distinct 2-level: (line,doc) + line) + verdict join + per-doc rebuild agg + sort
      "q111_seed_expansion" -> 5,    // (doc,j) dims aggs (seed branch prunes on the pushed doc_id gate) + ≤dim centroid agg/broadcast + per-doc affinity agg; top-k is TakeOrderedAndProject, never a global sort
      "q112_bpe_encode" -> 1,        // sort only: all 4 merge rounds run inside localCheckpoint jobs (q89 lineage discipline); the final census is per-row
      "q113_quality_threshold_sweep" -> 4, // ×steps narrow fan-out + ≤steps-key agg + 1-row totals agg/broadcast + sort
      "q114_quality_keeper" -> 4,    // ONE dedup_key exchange feeds rank window + keeper join-back + its agg-side + sort
      "q115_within_doc_dedup" -> 1,  // pure per-row first-occurrence HOF + sort — the whole scale argument
      "q116_source_leakage" -> 7,    // post-checkpoint presence table: 2 seg-keyed join sides + pair agg + per-source agg + 2 broadcasts + sort
      "q117_tfidf_keywords" -> 7,    // post-checkpoint (doc,term) counts: tf agg + df agg + term join + 1-row count broadcast + per-source WindowGroupLimit + sort (the q69/q80 shape)
      "q118_dedup_yield" -> 5,       // cluster-key agg + size-bucket agg + 1-row totals agg/broadcast + sort
      "q119_ivf_nprobe_recall" -> 10, // centroid broadcast + home/probe cell windows + truth (q39 shape) + reach joins + sweep agg + sort; probe-side branches pruned by vec_id pushdown
      "q120_incremental_dedup" -> 13, // post-checkpoint banding + batch⋈index bucket join + distinct + merge-hinted verify chain + best-match window + batch join-back + sort; ONE corpus scan in-plan
      "q121_corpus_diff" -> 3,       // two (doc_id, h60) sides into ONE full-outer join + sort; per-row status
      "q122_dedup_funnel" -> 15,     // post-checkpoint tiers (t1/t2/sh/kmeans rounds off-plan): semdedup pair join + removed aggs + 4 bounded tier-row aggs + 4-row lag window + totals broadcast
      "q123_stream_static_enrich" -> 4, // dim build (customer⋈nation broadcasts) + (window, nation) agg + sort; stream form holds only watermarked window state
      "q124_leakage_safe_split" -> 3,   // ONE cluster-key exchange (keeper agg, reused by the join-back) + per-row hash gate + sort
      "q125_ivfpq_adc" -> 5,         // post-checkpoint serve plan (index + LUTs built off-plan): qcell broadcast + 2 LUT broadcasts + rank window + sort; the corpus side streams ONCE as (cell, codes)
      "q126_source_affinity" -> 8,   // docs⋈vectors narrow join + (source,dim) partial agg + per-source pack + ≤|sources|² centroid pass + sort
      "q127_training_shards" -> 2,   // ONE shard exchange (window) + total-order sort — the write-side repartition+sortWithinPartitions shape
      "q128_bottomk_sample" -> 0,    // TakeOrderedAndProject (per-partition k-heap + k-row merge) + k-row single-partition rank window — the corpus never shuffles
      "q129_embedding_health" -> 4,  // per-dim partial agg + 1-row centroid pack/broadcast + single-row final agg; two narrow corpus passes
      "q130_stream_bottomk" -> 1,    // total-order sort only VISIBLE: the group-key exchange into the stateful op sits below the round-15 lazy checkpoint of the bounded sampler output (which stops the sort's bound-sampling pass from re-running the state pass); state O(k) per key
      "q131_ppjoin_pairs" -> 10,     // post-checkpoint hashed-array table (round 9): df agg + doc-key rank window (n from the array, no COUNT window) + prefix self-join + positional-filter pair agg + un-hinted two-side array verify (per-pair array_intersect, no exploded re-join) + sort; candidate keys are each doc's RAREST shingles (inherent anti-skew)
      "q132_image_phash_neardup" -> 3, // per-row dHash (narrow mapPartitions) + 4×16-bit band self-join (1 exchange each side) + pair distinct + sort — the q37/q59 SimHash shape over an image hash; never all-pairs
      "q138_quality_classifier" -> 3, // weight-table broadcast + ONE doc-keyed agg + sort; the explode+score rides inside the scan stage — the model-inference scale shape
      "q133_nordic_langid" -> 1,     // per-row native lang_scores + orthography censuses + sort (the q31/q109 shape)
      "q134_ptgl_langid" -> 1,       // per-row native substr_census + sort (r14: the scan-spread exchange was reverted on task-second evidence; the pair registry is per-row data)
      "q135_hrsr_langid" -> 1,       // same
      "q136_msid_langid" -> 1,       // same
      "q145_cssk_langid" -> 1,       // same
      "q152_bgmk_langid" -> 1,       // same — the Cyrillic pair is still per-row registry data
      "q156_ukru_langid" -> 1,       // same — seventh pair
      "q160_nlaf_langid" -> 1,       // same — eighth pair (respelling census)
      "q166_esca_langid" -> 1,       // same — ninth pair (ñ/y vs ç/l·l census)
      "q137_dup_span_excise" -> 7,   // covered-position explode/distinct + anti join + lpad-position sorted_multi_concat re-assembly + flag join-back + sort
      "q139_stream_neardup_pairs" -> 8, // sig agg + band self-join (2) + pair distinct + two sig join-backs (2) + agreement filter + sort — the batch ground truth of the streaming detector
      "q140_length_quantiles" -> 3,  // (source,len) partial agg + source window + final agg reuses the window partitioning + sort; windows on bounded rows only
      "q141_nfc_normalize" -> 1,     // pure per-row native expression + sort — the whole scale argument
      "q142_bm25_topk" -> 8,         // IN-pruned tf agg + df agg/broadcast + doc-length join + 1-row totals broadcast + doc agg + TakeOrdered (const-key rank on k rows)
      "q143_component_histogram" -> 12, // q57's pair chain + keeper label join + component agg + size histogram agg + 1-row totals broadcast + sort (closure rounds off-plan behind localCheckpoint)
      "q144_budget_selection" -> 3,  // ≤1001-key bucket agg + const-keyed cumulative window + sort — the budget-to-threshold resolution never orders the corpus
      "q146_paragraph_dedup" -> 4,   // winner census (min-struct partial agg, NOT a line window) + un-hinted identity join-back + per-doc rebuild agg + sort; the second corpus scan in the census branch is deliberate — re-scanning columnar parquet beats checkpointing a corpus-sized explode (the q86 reasoning)
      "q147_semantic_decontamination" -> 3, // bounded eval broadcast + vec_id max(struct) agg exchange (PARTIAL — map-side combine ships 1 row per train vector, not |eval|; round-11 item 2 retired the window here) + sort
      "q148_zipf_spectrum" -> 3,     // post-checkpoint ≤64-row spectrum (the vocab agg + bucket agg run once, off-plan): 1-row totals agg + its broadcast + sort — ONE corpus scan total
      "q149_ngram_novelty" -> 4,     // h60-hashed gram-winner census (min partial agg, long keys — the q38 lesson) re-aggregated by winner (2) + ONE doc-keyed join-back onto the per-row size(sh) counts (1) + sort (1); no per-doc explode re-aggregation, no gram-level join back to the corpus
      "q150_bpe_lang_fertility" -> 3, // post-checkpoint encoded text (q112's four merge rounds off-plan): doc-keyed census⋈(lang, bytes) join + |langs|-key partial agg + sort
      "q151_decontaminate_excise" -> 7, // probe-window distinct (2-level) + its broadcast (flagging is a streamed semi-join, no corpus shuffle) + covered-position distinct + anti-join + sorted_multi_concat reassembly + flag join-back + sort — q137's excision tail behind a probe-driven flag set
      "q153_perceptron_train" -> 3,  // post-checkpoint weight trajectory (feature build + per-epoch scoring/update rounds run as localCheckpoint jobs off-plan, the q112 discipline): 2 broadcast epoch-column joins + sort; per-epoch cost lives in the rounds — one doc-keyed agg + one doc_id semi-join + one <=64-key partial agg each
      "q154_audio_fp_neardup" -> 3,  // per-payload fingerprint (narrow mapPartitions over the real WAV parse) + 4×15-bit band self-join (1 exchange each side, one reused) + pair distinct + sort — q132’s image shape on the audio modality; never all-pairs
      "q155_video_frame_jaccard" -> 9,   // post-checkpoint per-video hash-set table (collect_set dedups map-side — no standalone frame-row distinct; the ONE doc-keyed agg runs inside the checkpoint job, N array rows stored, not 20N hash rows): df census over the narrow set-explode + df-cap semi-join + rare-hash candidate self-join + pair distinct + two set join-backs (array_intersect verify) + sort — candidates ONLY from df≤cap frames (the q38 skew valve on the frame axis), never all-pairs
      "q157_rrf_fusion" -> 9,        // the q142 BM25 chain (8) feeding a ≤2·kList-row fusion: full-outer rank join + TakeOrdered const-key rank — both rankings are k-bounded BEFORE any join
      "q158_margin_mining" -> 6,     // round-13: the bounded |A|×|B| ppm pair table localCheckpoints (built once off-plan, not recomputed per consumer — the ADVICE r12 fix); on-plan: two top-km rank windows (a_id/b_id keys, skew-free) + their partial-agg sums (broadcast back) + a_id max(struct) winner agg + sort — the exchange carries |A| rows at the end, never the pair table twice
      "q159_session_assembly" -> 2,  // ONE user-keyed exchange into the session window agg + total-order sort; assembly is a sort_array(collect_list) partial agg, per-session working set only
      "q161_classifier_calibration" -> 4, // weight-table broadcast + ONE doc-keyed agg (label folds into the classifier's own partial agg — no label join) + ≤9-key confusion agg (τ fan-out rides the aggregated doc rows, not the corpus) + sort
      "q162_dedup_weighted_mass" -> 10, // q57's post-checkpoint pair chain + left label join + cluster census agg + census join-back + doc-keyed token join + sort; the weighting arithmetic is per-row — no new corpus-scale shape beyond q57's
      "q163_truncation_recall" -> 19, // truth pass checkpoints off-plan; per evaluated dim (×3): broadcast-probe scan + q_id rank window + k·nQueries-row hits agg + probe left join — only the three rank windows are corpus-scale (one shorter-vector stream per dim, the design); union + sort on 3·nQueries rows
      "q164_maxpassage_bm25" -> 9,   // q142's chain at chunk granularity: IN-pruned (chunk, term) tf agg + chunk-df agg/broadcast + chunk-length join + 1-row totals broadcast + per-chunk sum + per-doc max(struct) winner agg + TakeOrdered const-key rank — one more corpus-keyed partial agg than q142 (the winner), both map-side combine
      "q165_pair_evidence" -> 10,    // round-13 reshape: the q36 candidate/verify chain AND the pair-doc shingle table (`pd`, ONE corpus explode semi-joined to the broadcast pair-doc set) run off-plan behind localCheckpoints; on-plan every exchange carries pair-bounded rows — pd-derived a-join/b-semi-join, shared-shingle distinct, census agg (semi-joined to shared shingles before aggregating; its corpus side is a map-side scan), per-pair rank window, sort. Was 14 exchanges with two corpus-keyed shuffles; the count ROSE 6→10 vs the first reshape because pd's bounded derivations moved on-plan while the second corpus explode left the plan entirely
      "q167_margin_mining_gated" -> 6, // candidate generation (ivfAssign crossJoin w/ k-row centroid broadcast + argmax window + same-cell equi-join) runs off-plan behind the pair localCheckpoint; on-plan: two top-km rank windows + their partial-agg sums joined by SHUFFLE (gated populations may be corpus-sized — q158's broadcast contract lifted) + a_id max(struct) winner agg + sort
      "q168_pii_redaction" -> 1,     // pure per-row codegen'd regex + Luhn HOF arithmetic + sort — the q141 scan shape; the whole scale argument
      "q169_fim_examples" -> 1,      // per-row token arithmetic (h60 split points, slices, md5) + union of the short-doc passthrough + sort — scan-shaped
      "q170_watermark_detect" -> 1,  // per-row green-count fold over the token array (no explode) + union of the short-doc passthrough + sort — the q168/q169 scan shape
      "q171_lev_neardup" -> 2,       // blocked equi-join (BroadcastExchange at spec scale; shuffles on the prefix block key at corpus scale — either way bounded per block) + sort; the O(L^2) DP runs per surviving candidate only
      "q172_sq8_recall" -> 7,        // only the float-truth top-k is localCheckpointed (the quantize scan stays on-plan — its code-table checkpoint was removed per BENCH_NOTES); on-plan: code rank window + truth/code semi-join (2) + per-probe hit agg + probe distinct + join-back + sort — the q107/q163 recall tail
      "q173_preference_pairs" -> 2,  // ONE (user, task) groupBy with max/min(struct) partial aggs + sort — no join, no window
      "q174_phrase_match" -> 1,      // array_contains gate + per-row positional lambda + sort — pure scan shape
      "q175_neardup_fusion" -> 14)   // the three PROVEN detector chains (q36's LSH candidate/verify, q59's Hamming bands, q171's block join — broadcast at spec scale) + pair-keyed fusion agg + sort; every exchange is one of the detectors' designed bounds, fusion adds ONE
    designed.foreach { case (name, expected) =>
      val plan = SparkEntry.queries(name)(spark, sf("sf0.001"))
        .queryExecution.executedPlan.toString
      val n = plan.linesIterator.count(_.contains("Exchange"))
      assert(n === expected,
        s"$name plans $n exchanges, designed $expected — shuffle shape changed")
    }
  }

  test("q69 plans no Window partitioned by the raw term key") {
    // Round-4 verdict item 1: a COUNT window partitioned by the term
    // column put every tf row of a stop-term into ONE window partition
    // (df("the") ≈ N_docs at corpus scale, and AQE cannot split skewed
    // window partitions — that machinery is join-only). df must stay a
    // partial-agg groupBy joined back; only the per-doc top-k window
    // (bounded by WindowGroupLimit) may remain.
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val lp = SparkEntry.queries("q69_rare_terms")(spark, sf("sf0.001"))
      .queryExecution.optimizedPlan
    val termPartitioned = lp.collect {
      case w: LWindow if w.partitionSpec.exists {
        case a: AttributeReference => a.name == "t"
        case _ => false
      } => w
    }
    assert(termPartitioned.isEmpty,
      "q69 plans a Window partitioned by the raw term column — " +
        "stop-term rows would form a single un-splittable partition at scale")
  }

  test("no query plans a Window with an EMPTY partition spec (round-7 item 3)") {
    // Three windows deliberately run GLOBALLY on row sets bounded by
    // construction — q128's rank over the k post-limit sample rows,
    // q77/q90's cumulative sum over ≤ 11 decile buckets, q122's lag over
    // 4 funnel tier rows (each bound is itself oracle-checked via the
    // query's row count). Correct — but an EMPTY partitionBy makes
    // WindowExec log its single-partition WARN on every execution,
    // polluting the bench stdout the driver machine-parses. Those sites
    // now partition by Scalars.constPartitionKey (non-foldable, so
    // EliminateWindowPartitions — which runs before this optimizedPlan
    // snapshot — cannot strip it); this pin keeps every future window
    // either genuinely partitioned or explicitly const-keyed.
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    SparkEntry.queries.foreach { case (name, fn) =>
      val lp = fn(spark, sf("sf0.001")).queryExecution.optimizedPlan
      val bad = lp.collect { case w: LWindow if w.partitionSpec.isEmpty => w }
      assert(bad.isEmpty,
        s"$name plans a Window with an empty partition spec — " +
          "WindowExec's single-partition WARN would pollute bench stdout " +
          "(use Scalars.constPartitionKey for bounded global windows)")
    }
  }

  test("doc-assembly queries shuffle raw columns once — ONE exchange total") {
    // Round-2 verdict item 1, tightened round 4: the raw columns are
    // RANGE-repartitioned on the folder key before any rendering. Range
    // on a subset of the grouping keys satisfies both grouping levels and
    // the ORDER window (clustered distribution) AND the trailing total
    // order (ordered distribution) — so the sort adds no exchange and,
    // critically, no range-sampling pass that re-executes the rendering
    // pipeline (profiles/q52_r4_baseline.jsonl measured that hidden
    // second execution at ~45% of steady-state work). One exchange,
    // carrying fields — never rendered XML.
    val designed = Map(
      "q42_group_doc_nested" -> 1, // raw range repartition; sort is local
      "q43_mets_render" -> 1,      // raw range repartition; sort is local
      "q52_mets_full" -> 1)        // raw range repartition; sort is local
    designed.foreach { case (name, expected) =>
      val df = SparkEntry.queries(name)(spark, sf("sf0.001"))
      val plan = df.queryExecution.executedPlan.toString
      val n = plan.linesIterator.count(_.contains("Exchange"))
      assert(n === expected,
        s"$name plans $n exchanges, designed $expected — shuffle shape changed")
      // the per-row XML rendering must stay inside whole-stage codegen
      // (an interpreted fallback here is the measured-15× HOF trap).
      // Codegen boundaries only appear in the FINAL adaptive plan, so
      // execute this DataFrame before reading it (a count() would plan a
      // separate QueryExecution).
      df.collect()
      val finalPlan = df.queryExecution.executedPlan.toString
      // the final adaptive plan renders codegen spans as "*(n)" markers
      val codegenSpans = """\*\(\d+\)""".r.findAllIn(finalPlan).size
      assert(codegenSpans >= 2,
        s"$name lost whole-stage codegen coverage ($codegenSpans spans)")
    }
  }

  test("decontamination broadcasts the probe set; the corpus scan never shuffles") {
    // q62's scale contract: the benchmark side is bounded by
    // construction, so its shingles broadcast and the corpus-side
    // shingle explosion feeds a BroadcastHashJoin directly — no
    // corpus-wide exchange before the per-doc hit count.
    val plan = SparkEntry.queries("q62_decontamination")(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "probe shingles must broadcast-join the corpus side")
    val n = plan.linesIterator.count(_.contains("Exchange"))
    // exact (round-3 verdict item 7): probe-side shingle prep + hit-count
    // groupBy + flag join + total-order sort (broadcast exchanges counted;
    // the corpus side itself still never hash-shuffles before the join)
    assert(n === 5, s"q62 plans $n exchanges — corpus-side shuffle crept in")
  }

  test("planted hot LSH bucket: AQE splits the skewed candidate self-join") {
    // 600 docs, 120 sharing identical text → one (band, bucket) key per
    // band holds 120 rows on both sides of the candidate self-join.
    // At 100 TB this is the stop-phrase/boilerplate cluster; the engine's
    // answer is AQE skew-split (SkewOps.saltedJoin is the manual
    // fallback). Thresholds are lowered so the tiny fixture trips the
    // same machinery.
    val docs = (1 to 600).map { i =>
      val text =
        if (i <= 120) "common boilerplate header repeated across the corpus verbatim"
        else s"unique document $i with its own words token${i}a token${i}b token${i}c"
      (i.toLong, text)
    }.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    withSQLConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "512b",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val banded = DedupOps.lshBanded(docs)
      val a = banded.select(col("doc_id").as("a"), col("band"), col("bucket"))
      val b = banded.select(col("doc_id").as("b"), col("band"), col("bucket"))
      val joined = a.join(b, Seq("band", "bucket")).filter(col("a") < col("b"))
      // collect THIS DataFrame so its own AdaptiveSparkPlan finalizes
      // (count() would plan a separate QueryExecution)
      val nPairs = joined.collect().length.toLong
      // the hot cluster really is quadratic in CANDIDATES: C(120,2) per
      // band dedups to C(120,2) distinct pairs + a few unique-doc pairs
      assert(nPairs >= 120L * 119L / 2L)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=[true]") || finalPlan.contains("skew=true"),
        s"expected AQE to mark the skewed join, plan:\n${finalPlan.take(4000)}")
    }
  }

}
