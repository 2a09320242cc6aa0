package graft.plans

/** The committed, machine-enforced PLAN-AUDIT SANCTION SET (verdict r13
  * item 2): every gate query whose physical plan legitimately carries a
  * BroadcastNestedLoopJoin and/or a SinglePartition exchange, with the
  * reviewed one-line reason. [[graft.PlanAudit]] records the flags for
  * the whole 320-gate surface (PLANAUDIT.json, regenerated at round
  * close); `PlanSanctionsSpec` diffs that record — plus live plans for
  * any gate added since the last audit run — against this map, so a NEW
  * unsanctioned flag fails the build the round it appears, full-surface,
  * not just on the bench top-15 (`HeavyPlanSpec`, which consumes this
  * same map for its board pins).
  *
  * The two sanctioned classes (reviewed every round since r10):
  *  - `bnlj`: one join side is a broadcast SAMPLE- or MODEL-sized frame
  *    (fixed-count query samples, quantizer/threshold/ledger grids,
  *    one-row totals) crossed onto one corpus pass — the deliberate
  *    ground-truth / serve / summary tiers, priced at sf10 in
  *    BASELINE.md. Never corpus × corpus.
  *  - `single`: a SinglePartition exchange of an ALREADY-AGGREGATED
  *    one-row or model-sized summary frame — never of corpus-sized data.
  *
  * CartesianProduct has no sanctioned class: zero, everywhere, always.
  * Entries with both flags false are proactive board-review records
  * (queries near the bench top-15 whose clean plan shape was reviewed
  * the round they shipped). */
object PlanSanctions {

  final case class Sanction(bnlj: Boolean = false, single: Boolean = false,
                            reason: String)

  private def entries(bnlj: Boolean, single: Boolean, reason: String)(
      qs: String*): Seq[(String, Sanction)] =
    qs.map(q => q -> Sanction(bnlj, single, reason))

  val sanctioned: Map[String, Sanction] = (
    entries(bnlj = true, single = false,
      "broadcast fixed/sampled query set x corpus brute-force scan — the " +
      "deliberate ground-truth / broadcast-serve ANN tier (build side is " +
      "always sample- or model-sized; the two quadratic contrast tiers " +
      "are priced by name in BASELINE.md)")(
      "a_ann_bq_topk", "a_ann_ivf2_recall", "a_ann_ivf_recall",
      "a_ann_ivfpq_recall", "a_ann_ivfpq_res_recall", "a_ann_ivfsq_recall",
      "a_ann_mips_topk", "a_ann_multiprobe", "a_ann_ndcg", "a_ann_prefilter",
      "a_ann_prefix_recall", "a_ann_prefix_topk", "a_ann_recall",
      "a_ann_recall_fixedq", "a_ann_sq_topk", "a_ann_topk", "a_ann_whitened",
      "a_knn_classify", "m_media_ann") ++
    entries(bnlj = true, single = false,
      "broadcast pair-bounded anchor/seed set over ONE corpus pass (the " +
      "mining tier: anchors are fixed-count by construction)")(
      "a_contrastive_pairs", "a_hard_negatives", "a_margin_mining") ++
    entries(bnlj = true, single = false,
      "model-sized grid/summary frame (threshold sweeps, lag grids, " +
      "day x bucket ledger cells, PR-curve cutoffs) broadcast-crossed " +
      "onto a scored frame — the t_hll_ledger class")(
      "d_dedup_curve", "d_simhash_neardup", "q_acf", "q_audience_overlap",
      "t_classifier_pr", "t_ddsketch_ledger", "t_hll_ledger") ++
    entries(bnlj = true, single = true,
      "one-row/model-sized summary aggregate (a SinglePartition funnel " +
      "by definition) broadcast-crossed back onto the frame it " +
      "summarizes — totals, eval grids, test statistics; the broadcast " +
      "side is never corpus-sized")(
      "a_ann_mrr", "a_ann_recall_curve", "a_bm25_topk",
      "a_embed_diagnostics", "a_ivf_balance", "a_ivf_nprobe_curve",
      "a_prf_expansion", "d_dedup_funnel", "d_lsh_eval",
      "d_method_agreement", "g_kcore", "g_modularity", "g_triangles",
      "q_basket_affinity", "q_benford_test", "q_chisq", "q_cuped",
      "q_fk_orphans", "q_seasonal_decomp", "q_survival_km", "q_t_closeness",
      "t_bigram_surprise", "t_bootstrap_ci", "t_cms_join_size",
      "t_cohens_kappa", "t_corpus_profile", "t_ctfidf", "t_dsir_weights",
      "t_hll_union", "t_jsd_drift", "t_kmv_setops", "t_kneser_ney",
      "t_ks_test", "t_learnability", "t_lift_curve", "t_logodds",
      "t_mixture_sample", "t_neyman_sample", "t_perplexity",
      "t_perplexity_buckets", "t_pmi_collocations", "t_psi_drift",
      "t_surprise", "t_temperature_sample", "t_tfidf_topk",
      "t_topic_coherence") ++
    entries(bnlj = false, single = true,
      "SinglePartition exchange of an already-aggregated one-row or " +
      "model-sized summary frame (global funnel / top-k / distribution " +
      "profile) — never of corpus-sized data")(
      "a_centroid_drift", "a_pq_distortion", "a_sq_distortion",
      "d_cross_source_dups", "d_jaro_linkage", "g_assortativity",
      "q_conversion_latency", "q_corr_matrix", "q_disorder_profile",
      "q_dq_checks", "q_equidepth_hist", "q_k_anonymity", "q_l_diversity",
      "q_luhn_check", "q_pareto_8020", "q_peak_concurrency", "q_ranksum",
      "q_ratio_to_report", "q_rfm_segmentation", "q_running_distinct",
      "q_skyline", "q_table_stats", "t_bloom_fpr", "t_classifier_auc",
      "t_gini_concentration", "t_gopher_ablation") ++
    Seq(
      "t_calibration" -> Sanction(reason = "fixed-round GD, linear passes"),
      // entered the bench top-15 on the r15 board (slower host session);
      // plans re-reviewed r16: all six lint flags clean in PLANAUDIT
      "d_dedup_clusters" -> Sanction(reason = "keyed join+agg CC rounds with localCheckpoint truncation — clean plan, board-membership entry"),
      "t_cms_heavy" -> Sanction(reason = "keyed sketch-cell aggregate + bounded candidate rejoin — clean plan, board-membership entry"),
      "d_banding_sweep" -> Sanction(reason = "signatures computed once, band regroups reuse the frame"),
      "d_ngram_jaccard" -> Sanction(reason = "AllPairs prefix-filter equi-join"),
      "d_ngram_jaccard_capped" -> Sanction(reason = "capped-postings pre-pass (df aggregate + anti-join + regroup), all keyed"),
      "g_pagerank" -> Sanction(reason = "keyed join+agg rounds"),
      "d_er_pipeline" -> Sanction(reason = "blocked equi-join linkage"),
      "d_containment" -> Sanction(reason = "shared-shingle equi-join"),
      "st_cms_window" -> Sanction(reason = "keyed windowed sketch agg"),
      "m_media_semantic_dedup" -> Sanction(reason = "cluster-blocked pair join"),
      "d_cluster_best" -> Sanction(reason = "per-cluster survivor agg"),
      "d_curation_pipeline" -> Sanction(reason = "staged keyed filters"),
      "t_bpe_encode" -> Sanction(reason = "map-only kernel scan"),
      "g_label_prop" -> Sanction(reason = "keyed LPA rounds, WindowGroupLimit argmax"),
      "g_cc_incremental" -> Sanction(reason = "star edges + keyed CC rounds"),
      "d_golden_record" -> Sanction(reason = "keyed join + per-field argmax"),
      "a_ann_ivfpq_res_topk" -> Sanction(reason = "bucketed probe, broadcast codebooks"),
      "a_ann_ivfpq_stored" -> Sanction(reason = "code-store serve, broadcast model"),
      "a_ann_ivf2_topk" -> Sanction(reason = "two-level probe, broadcast models"),
      "d_minhash_stored" -> Sanction(reason = "stored-signature band join")
    )
  ).toMap

  /** r15 lint dimensions (verdict r14 item 6) — separate reviewed
    * allowlists, diffed by PlanSanctionsSpec exactly like the
    * bnlj/single map above. */

  /** `no_codegen`: gates whose EXECUTED final plan carries no
    * WholeStageCodegen stage. Two sanctioned classes: plans with nothing
    * to compile (literal frames, the object-pipeline media-codec seam)
    * and AQE EmptyRelation collapses at the sf0.001 audit fixture —
    * zero-row results at that SF erase the physical stages entirely;
    * the same plans codegen at any populated SF (judge-reviewed plans
    * at round 15). */
  val noCodegenSanctioned: Map[String, String] = Map(
    "s7_literal_source" ->
      "LocalTableScan of a literal one-row frame — nothing to compile",
    "q_anti_join" ->
      ("AQE EmptyRelation collapse at sf0.001 (every customer has orders " +
       "at that SF, the anti-join result is empty); the underlying " +
       "BroadcastHashJoin codegens at populated SFs"),
    "a_ann_recall_curve" ->
      ("AQE EmptyRelation collapse at sf0.001 (no qualifying brute-force " +
       "hits at that SF)"),
    "d_embedding_neardup" ->
      ("AQE EmptyRelation collapse at sf0.001 (no pair clears the cosine " +
       "threshold at that SF)"),
    "m_media_semantic_dedup" ->
      ("the sanctioned mapPartitions media-codec seam dominates the " +
       "final stage (object pipeline; the documented non-expression site)"))

  /** `unpushed_scan_filter`: a Filter directly on a parquet scan whose
    * PushedFilters is empty. ONE sanctioned class: expression predicates
    * over scan columns — md5 hash-unit sampling gates, the
    * size(regexp_extract_all(lower(text))) >= n tokenization guard, and
    * date-part expressions — which parquet cannot push by construction
    * (spot-checked r15: every flagged scan's DataFilters holds ONLY such
    * expressions; plain column predicates on sibling scans do push). */
  val unpushedScanSanctioned: Map[String, String] = {
    val reason = "expression predicate over the scan (md5 hash-unit / " +
      "tokenization-size / date-part) — inherently unpushable by parquet"
    Seq("a_contrastive_pairs", "d_bloom_ingest", "d_containment",
      "d_dedup_curve", "d_dedup_funnel", "d_lsh_index_stats",
      "d_method_agreement", "d_minhash_lsh", "d_ngram_jaccard",
      "d_ngram_jaccard_capped", "d_simhash", "d_simhash_neardup",
      "g_assortativity", "g_modularity", "g_triangles", "q_acf",
      "q_chisq", "t_bigram_surprise", "t_chunk", "t_fingerprint",
      "t_hll_ledger", "t_hll_union", "t_kmv_distinct", "t_ngram_topk",
      "t_novelty", "t_pmi_collocations", "t_repetition",
      "t_stratified_sample").map(_ -> reason).toMap
  }

  /** `corpus_broadcast`: an explicit broadcast hint whose side reads a
    * corpus-sized table with no Aggregate/Limit between. ONE sanctioned
    * class: the %-sample serve/contrast tier — the hinted probe side is
    * a fixed-FRACTION corpus sample by gate construction (a diagnostic
    * choice: the oracle replays every sampled query), so the broadcast
    * grows with the corpus AND THAT IS PRICED: the tier's sf10 ratios
    * are named in BASELINE.md (round-13 table; a_ann_topk 162×,
    * a_ann_prefix_topk 141×). The operator contract takes a BOUNDED
    * query frame in production (Similarity scaladoc, each serve
    * function). */
  val corpusBroadcastSanctioned: Map[String, String] = {
    val reason = "%-sample serve tier: hinted probe side is a " +
      "fixed-fraction corpus sample by gate construction, priced at " +
      "sf10 in BASELINE.md; production passes a bounded query frame"
    Seq("a_ann_ivf_stored", "a_ann_ivf_topk", "a_ann_ivf_trained",
      "a_ann_ivfpq_res_topk", "a_ann_ivfpq_stored", "a_ann_ivfpq_topk",
      "a_ann_prefix_topk", "a_ann_recall", "a_ann_topk", "a_hybrid_topk",
      "a_knn_classify", "a_rrf_topk").map(_ -> reason).toMap
  }
}
