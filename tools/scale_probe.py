"""Empirical scaling probe: run representative operators at 1x and Nx data
and report wall-clock ratios.

The N-times corpus is synthesized deterministically from the sf fixtures
(replicas get offset ids and perturbed content so near-dup pair counts grow
linearly with data, as in a real corpus, not quadratically as naive
duplication would cause). An operator whose time ratio tracks the data ratio
is shuffle/partition-healthy; a super-linear ratio exposes a scale bug.

Usage: python tools/scale_probe.py [sf_dir] [factor] [--only a,b,c]
Writes one JSON line: {"factor": N, "queries": {name: {"t1": s, "tN": s,
"ratio": r}}}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pagila_etl_airflow_assignment_spark.registry import queries
from pagila_etl_airflow_assignment_spark.session import build_session
from pagila_etl_airflow_assignment_spark.sources.parquet import load_table

_argv = sys.argv[1:]
ONLY = None
if "--only" in _argv:
    i = _argv.index("--only")
    ONLY = set(_argv[i + 1].split(","))
    _argv = _argv[:i] + _argv[i + 2 :]
SF_DIR = _argv[0] if _argv else "/root/testdata/sf0.1"
FACTOR = int(_argv[1]) if len(_argv) > 1 else 10

# Representative, data-dominated operators (one per scale-critical family).
PROBES = [
    "dedup_exact",
    "dedup_minhash_signatures",
    "dedup_minhash_lsh",
    "text_winnowing",
    "text_tfidf_topk",
    "text_sequence_packing",
    "events_sessionization",
    "asof_click_attribution",
    "events_cohort_retention",
    "ann_bruteforce_topk",
    "embedding_centroid_outliers",
    "events_trailing_window",
    "events_gap_fill_ffill",
    "events_leakage_free_features",
    "embedding_kmeans_step",
    "cdc_orders_snapshot_diff",
    # round-6 continuation additions (L-240..259): sketch set algebra,
    # FIFO window+clamp, capped-block pair scoring, PQ code/LUT joins,
    # term-keyed PMI, char-explode envelopes, banded Hamming, walk joins,
    # wedge-middle sums, ancestor-key rollup, rank selections
    "events_kmv_setops",
    "warehouse_fifo_costing",
    "warehouse_record_linkage",
    "ann_pq_adc_topk",
    "text_collocations_pmi",
    "multimodal_phash_pairs",
    "multimodal_energy_segments",
    "graph_walk_pair_counts",
    "events_conformal_interval",
    "warehouse_bom_rollup",
    "graph_adamic_adar",
    "events_median_ci",
    "ann_ndcg_eval",
    "text_classifier_calibration",
    # round-6 continuation batches N..W (L-260..292)
    "dedup_bcubed_eval",
    "embedding_triplet_mining",
    "cdc_multimaster_lww",
    "events_ipw_ate",
    "embedding_k_selection_elbow",
    "graph_hits_bipartite",
    "warehouse_returns_p_chart",
    "events_anomaly_ensemble",
    "dedup_soft_weights",
    "graph_components",
    "warehouse_junk_dimension",
    "vocab_budget_curve",
    "ann_mips_reduction",
    "graph_square_census",
    "warehouse_compaction_plan",
    "events_churn_labels",
    "events_watermark_skew",
    "events_simpson_check",
    "embedding_isotropy",
    "events_throttle_whatif",
    "events_attribution_shapley",
    "events_bayes_smoothed_ranking",
    "graph_harmonic_centrality",
    "text_textrank_keywords",
    "sampling_pps_systematic",
    "events_overdispersion",
    "events_mutual_information",
    "graph_degree_zipf",
    "multimodal_bitrate_outliers",
    "warehouse_revenue_waterfall",
    "warehouse_price_elasticity",
    "graph_rich_club",
    "vocab_term_burstiness",
    # the 5 most expensive bench queries (r3 plan-audit set): their caps /
    # Expand trade-offs carry the scale story, so their ratios get measured,
    # not argued
    "dedup_cluster_representatives",
    "warehouse_table_profile",
    "dedup_simhash_pairs",
    "dedup_clusters",
    "warehouse_salted_skew_join",
    # round-4 additions
    "dedup_common_substrings",
    "dedup_incremental_bloom",
    "dedup_incremental_minhash",
    "text_repeated_span_coverage",
    "cdc_partition_checksums",
    "warehouse_constraint_checks",
    "dedup_clusters_star",
    # round-4b additions: per-basket bounded self-join, orderkey-grain window,
    # shingle-keyed first-occurrence window, user-sequence windows
    "graph_copurchase_pairs",
    "graph_part_degree",
    "warehouse_sole_final_shipper",
    "warehouse_shipping_priority",
    "text_shingle_novelty",
    "events_type_transitions",
    "events_balance_with_reset",
    # round-4c additions: iterative graph, basket rules, sketch build+probe,
    # session paths (two-window + path aggs)
    "graph_copurchase_pagerank",
    "graph_association_rules",
    "events_cm_sketch",
    "events_cm_estimates",
    "events_session_paths",
    # round-6 additions: LSH x split composition, top-k + broadcast probe,
    # day-partitioned sweep line, bounded-grid pair join, per-source cumsum,
    # lead-window CEP conjunction
    "split_leakage_audit",
    "vocab_oov_rate",
    "events_session_concurrency",
    "text_js_divergence_sources",
    "multimodal_shard_manifest",
    "events_cep_pattern",
    "events_time_weighted_value",
    # round-4d/4e additions: sketch registers, bounded-frame fold, interval
    # attribution, prefix-filter candidates, wedge joins, median passes,
    # zero-shuffle projections
    "events_hll_distinct",
    "events_ewma_value",
    "events_attribution_linear",
    "text_feature_hashing",
    "dedup_prefix_filter_pairs",
    "graph_triangle_census",
    "events_mad_outliers",
    "embedding_random_projection",
    # round-4f additions: stats/CRM/graph/profiling/sketch/LM families
    "events_cuped_adjustment",
    "events_cusum_drift",
    "events_equidepth_histogram",
    "warehouse_golden_records",
    "events_rfm_segments",
    "text_readability",
    "embedding_product_quantization",
    "events_cm_join_size",
    "text_bigram_backoff",
    "events_seasonal_decompose",
    "graph_link_prediction",
    "warehouse_fd_profile",
    "embedding_similarity_profile",
    "warehouse_phonetic_match",
    "graph_bfs_distance",
    # round-4g additions: survival/audience/scorecard, island shapes,
    # attribution variants, BI grids, hybrid dedup, char-grain text
    "events_funnel_latency",
    "events_scd3_user_state",
    "events_psi_drift",
    "warehouse_revenue_growth",
    "warehouse_abc_classification",
    "warehouse_cohort_ltv",
    "events_attribution_position",
    "warehouse_share_shift",
    "warehouse_new_vs_returning",
    "warehouse_discount_lift",
    "dedup_hybrid_pairs",
    "dedup_cross_source_matrix",
    "text_token_fertility",
    "text_char_entropy",
    "events_burst_collapse",
    "events_activity_streaks",
    "events_out_of_order_audit",
    "events_discrete_hazard",
    "events_wau_overlap",
    "events_woe_iv",
    "events_prop_ztest",
    "warehouse_benford_audit",
    "events_daily_percentile_bands",
    # round-5 additions: contrastive mining, semantic dedup, importance
    # weighting, embedding diagnostics, LSH calibration
    "ann_hard_negatives",
    "dedup_semantic_clusters",
    "sampling_importance_dsir",
    "embedding_dimension_stats",
    "dedup_lsh_calibration",
    "events_changepoint",
    "embedding_matryoshka_quality",
    "events_bot_regularity",
    "warehouse_part_skyline",
    "events_dau_mau_stickiness",
    "text_code_detection",
    "text_lm_score_mix",
    "events_throttled",
    "embedding_kmeans_lloyd",
    "graph_personalized_pagerank",
    "text_gopher_rules",
    "sampling_temperature_mixture",
    "ann_ivf_recall_curve",
    "graph_kcore",
    "dedup_containment_pairs",
    "text_boilerplate_filter",
    "text_ngram_diversity",
    "embedding_kcenter_coreset",
    "text_classifier_score",
    "vocab_bpe_merge_step",
    "text_k_anonymity",
    "text_first_occurrence_dedup",
    "graph_label_propagation",
    "text_filter_agreement",
    "events_cumulative_unique_users",
    "multimodal_payload_dedup",
    "warehouse_skew_profile",
    "warehouse_encoding_advisor",
    "warehouse_zorder_layout",
    "events_bitmap_intersections",
    "sampling_doremi_step",
    "events_markov_accuracy",
    "ann_mmr_rerank",
    "incremental_backfill_plan",
    "embedding_cluster_silhouette",
    "text_stopword_discovery",
    "embedding_pca_power_iteration",
    "events_dow_anova",
    "text_bm25_topk",
    "events_kaplan_meier",
    "warehouse_price_volume_mix",
    "events_forecast_backtest",
    "graph_assortativity",
    "text_l_diversity",
    "events_power_analysis",
    "events_daily_peaks",
    "dedup_pipeline_funnel",
    "warehouse_budget_apportionment",
    "events_markov_stationary",
    "warehouse_reorder_points",
    "events_holt_level_trend",
    "warehouse_abc_xyz_matrix",
    # round-6 late batch (L-300..311): pair-graph census, bit-length
    # bucket rollups, quadratic kNN audit, node-keyed triangle closure,
    # brand/month rollups, metadata ladder, isqrt projections, user-lag
    # growth windows, order-grain shipments, rate-grid explode, SRM counts
    "dedup_transitivity_audit",
    "vocab_heaps_law",
    "embedding_knn_hubness",
    "graph_local_clustering",
    "warehouse_promo_cannibalization",
    "multimodal_aspect_buckets",
    "warehouse_eoq_quantity",
    "events_daily_volatility",
    "events_growth_accounting",
    "warehouse_split_shipments",
    "sampling_hash_calibration",
    "events_srm_check",
    "events_error_budget",
    "warehouse_assortment_attrition",
    "embedding_knn_purity",
    "events_autoscale_replay",
    "events_lateness_sweep",
    "warehouse_decile_migration",
    "dedup_mixture_shift",
    "warehouse_basket_profile",
    "events_attribution_time_decay",
    "events_type_affinity",
    "warehouse_snapshot_retention",
    "ann_ivf_balance",
    "sampling_class_balance",
    "events_incident_impact",
    "dedup_length_profile",
    "warehouse_cross_elasticity",
    "dedup_threshold_sweep",
    "sampling_training_manifest",
    "vocab_token_yield",
    "warehouse_returns_by_discount",
    "warehouse_cube_revenue",
    "warehouse_variance_decomposition",
    "warehouse_lorenz_points",
    "events_process_conformance",
    "warehouse_tax_profile",
    "dedup_normalization_impact",
    "warehouse_price_consistency",
    "warehouse_moving_annual_total",
    "graph_support_sweep",
    "embedding_intrinsic_dimension",
    "text_encoding_profile",
    "warehouse_fiscal_445",
    "multimodal_phash_sweep",
    "events_aa_calibration",
    "warehouse_dom_profile",
    "vocab_lang_overlap",
    "events_metric_decomposition",
    "dedup_simhash_balance",
    "events_tenure_value_curve",
    "warehouse_status_mix",
    "warehouse_supplier_switching",
    "events_fatigue_curve",
    "vocab_hapax_profile",
    "events_attribution_window_sweep",
    "dedup_key_policy",
    "events_activation_latency",
    "warehouse_quantity_price_breaks",
    "text_predictability",
    "sampling_temporal_split",
    "warehouse_hhi_trend",
    "events_load_shape",
    "dedup_survivor_audit",
    "multimodal_payload_percentiles",
    "dedup_df_spectrum",
    "embedding_assignment_margin",
    "events_cohort_half_life",
    "graph_brand_conductance",
    "warehouse_rounding_residue",
    "events_conversion_by_depth",
    "events_incident_hotspots",
    # round-7 additions (L-372..377): LSH-blocked levenshtein verify,
    # fingerprint epoch weights, bounded-panel BH/SPRT, dense-grid Croston
    # fold, sampled kNN reciprocity
    "dedup_edit_distance",
    "sampling_dedup_epochs",
    "events_bh_fdr",
    "events_sprt",
    "warehouse_croston",
    "embedding_knn_reciprocity",
    "text_dp_noisy_counts",
    "events_drawdown",
    "cdc_log_compaction",
    "events_velocity_flags",
    "events_dfg_waits",
    "warehouse_demand_classification",
    "warehouse_ss_policy_sim",
    "sampling_purged_kfold",
    "events_ljung_box",
    "events_burn_rate_alerts",
    "rental_update_lag_profile",
    "embedding_norm_clip_threshold",
    "events_interrupted_ts",
    "sampling_ht_estimate",
    "warehouse_shipmode_priority",
    "events_spearman_daily",
    "events_runs_test",
    "events_theil_index",
    "vocab_yule_k",
    "events_evt_return_level",
    "sampling_kish_neff",
    "warehouse_brand_transition",
    "events_poisson_gap_check",
    "events_mann_kendall",
    "events_sen_slope",
    "text_burrows_delta",
    "warehouse_price_index",
    "warehouse_hill_tail_index",
    "vocab_keyness_g2",
    "events_granger_lite",
    "events_brown_forsythe",
    "events_mantel_haenszel",
    "warehouse_theil_decomposition",
    "warehouse_late_order_priority",
    "events_kruskal_wallis",
    "warehouse_measure_correlation",
    "events_cramers_v",
    "events_permutation_entropy",
    "warehouse_bullwhip_ratio",
    # round-9 additions (L-422..L-440): classical tests on the bounded day
    # grid, TPC-H Q5, supply-chain/forecast devices
    "events_jarque_bera",
    "events_durbin_watson",
    "events_grubbs_test",
    "events_levene_test",
    "events_bartlett_test",
    "events_cochran_armitage",
    "events_mcnemar_test",
    "events_cochran_q",
    "events_kpss_test",
    "events_wilcoxon_signed_rank",
    "events_spectral_periodogram",
    "events_hurst_rs",
    "warehouse_local_supplier_volume",
    "warehouse_tracking_signal",
    "warehouse_wilson_ranking",
    "warehouse_otif_fill_rate",
    "warehouse_atkinson_index",
    "warehouse_bass_diffusion",
    "warehouse_theta_forecast",
    # round-9 batches 4-5 (L-441..L-450)
    "events_pacf",
    "events_breusch_pagan",
    "events_sign_test",
    "events_capture_recapture",
    "events_design_effect",
    "events_littles_law",
    "events_tukey_fences",
    "events_cohens_kappa",
    "events_phi_coefficient",
    "events_odds_ratio_ci",
    "graph_eigenvector_centrality",
    "events_transfer_entropy",
    "warehouse_median_polish",
    "events_bowker_symmetry",
    "events_c_chart",
    "events_turning_points",
    "events_mood_median",
    "warehouse_kraljic_matrix",
    "events_ks_uniformity",
    "events_hellinger_hourly",
    "events_cox_stuart",
    "events_page_trend",
    "events_seasonal_mann_kendall",
    "events_updown_runs",
    "events_bartels_rank",
    "events_logrank_test",
    "dedup_lsh_pr_scorecard",
    # round-10
    "warehouse_ivm_outer_join",
    "warehouse_ivm_outer_deltas",
    "events_tdigest_quantiles",
    "events_moments_tail_bounds",
    "events_ar2_forecast",
    "events_cumulative_periodogram",
    "events_rmst",
    "events_jonckheere_terpstra",
    "events_erlang_c",
    "ann_map_eval",
    "text_brier_decomposition",
    "warehouse_hilbert_layout",
    "graph_ktruss",
    "events_ewma_chart",
    "events_siegel_slope",
    "graph_clustering_coefficient",
    "warehouse_fisher_index",
    "events_cliffs_delta",
    "events_james_stein",
    "text_classifier_auc",
    "events_nelson_aalen",
    "events_cross_spectrum",
    "warehouse_risk_pooling",
    "vocab_good_turing",
    # round-10b (L-492..497)
    "events_aalen_johansen",
    "events_gehan_wilcoxon",
    "events_ansari_bradley",
    "events_cvm_two_sample",
    "events_kendall_w",
    "events_quade_test",
    # round-10b time-series (L-498..503)
    "events_lomb_scargle",
    "events_allan_variance",
    "events_arch_lm",
    "events_dfa",
    "events_sample_entropy",
    "events_engle_granger",
    # round-10b calibration/LM (L-504..509)
    "events_isotonic_calibration",
    "events_xbar_r_chart",
    "graph_katz_centrality",
    "text_kneser_ney_bigrams",
    "text_msttr",
    "text_beta_binomial",
    # round-10c additions (L-510..524)
    "events_anderson_darling",
    "events_hodges_lehmann",
    "events_pettitt",
    "events_breslow_day",
    "events_brunner_munzel",
    "events_dunn_posthoc",
    "events_sax_motifs",
    "events_zero_inflation",
    "sampling_raking_ipf",
    "sampling_jackknife_ratio",
    "text_ocr_garbage",
    "text_classifier_pr_auc",
    "warehouse_ivm_minmax",
    "ann_filtered_recall",
    "events_harrell_c",
    "text_krippendorff_alpha",
    "text_naive_bayes_confusion",
    "events_decision_stump",
    "events_regression_discontinuity",
    "events_randomization_inference",
    "events_chatterjee_xi",
    "text_heldout_perplexity",
    "warehouse_wagner_whitin",
    "events_dp_user_level",
    "events_qini_uplift",
    "events_yuen_trimmed",
    "events_wasserstein_hourly",
    "events_energy_distance",
    "warehouse_silver_meal",
    # round-10d cluster-validity / valuation / fusion (L-539..543)
    "embedding_davies_bouldin",
    "embedding_calinski_harabasz",
    "embedding_ari_kmeans",
    "embedding_knn_shapley",
    "ann_rrf_fusion",
    # round-10e causal/fairness devices (L-544..550)
    "events_iv_wald",
    "events_mediation_sobel",
    "events_cooks_distance",
    "events_sinkhorn_ot",
    "warehouse_oaxaca_blinder",
    "text_fairness_audit",
    "text_label_noise",
    # round-10f preference/selection/attribution devices (L-551..555)
    "text_bradley_terry",
    "text_query_likelihood",
    "sampling_unimax",
    "embedding_facility_location",
    "events_attribution_timedecay",
    # round-10g IVM/multimodal/causal devices (L-556..559)
    "warehouse_ivm_topk",
    "multimodal_shot_boundaries",
    "events_qte_deciles",
    "events_fwl_partial_out",
    # round-10h outlier/process/calibration devices (L-560..562)
    "embedding_lof_outliers",
    "events_alpha_footprint",
    "text_temperature_scaling",
    # round-10i normalization/forensics/queueing devices (L-563..565)
    "embedding_quantile_normalize",
    "warehouse_mantissa_arc",
    "events_kingman_vut",
    # round-10j batching/sequential/caching devices (L-566..568)
    "text_padding_waste",
    "events_obrien_fleming",
    "warehouse_cache_hit_curve",
    # round-10k IVM/sketch/stability devices (L-569..572)
    "warehouse_ivm_join_agg",
    "events_ams_f2",
    "events_heavy_hitters",
    "warehouse_topk_stability",
    # round-10l risk/dynamics/graph devices (L-573..575)
    "events_cvar_daily",
    "events_burstiness_memory",
    "graph_simrank",
]


def synthesize(spark, out_dir: str) -> None:
    """FACTOR-times fixtures: replicas with offset ids + perturbed content."""
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    n_events = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    n_vecs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    k = F.explode(F.sequence(F.lit(0), F.lit(FACTOR - 1))).alias("k")

    docs = load_table(spark, SF_DIR, "documents").select("*", k)
    docs.select(
        (F.col("doc_id") + F.col("k") * n_docs).alias("doc_id"),
        # replica text diverges: append a replica-unique token so shingle /
        # signature work grows linearly, not quadratically
        F.concat("text", F.lit(" rep"), F.col("k"), F.lit("x"), F.col("doc_id"))
        .alias("text"),
        "lang",
        "source",
        "n_chars",
    ).write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")

    events_src = load_table(spark, SF_DIR, "events")
    # stride derived from the data: a fixed offset (e.g. 1000) collides with
    # fixtures whose user_id range exceeds it, merging replica users and
    # distorting per-user partition sizes / distinct-user growth
    user_stride = events_src.agg(F.max("user_id")).first()[0] + 1
    events = events_src.select("*", k)
    events.select(
        (F.col("event_id") + F.col("k") * n_events).alias("event_id"),
        (F.col("ts") + F.make_interval(days=F.col("k") * 31)).alias("ts"),
        (F.col("user_id") + F.col("k") * user_stride).alias("user_id"),
        "event_type",
        "value",
        "props",
    ).write.mode("overwrite").parquet(f"{out_dir}/events.parquet")

    vecs = load_table(spark, SF_DIR, "embeddings").select("*", k)
    vecs.select(
        (F.col("vec_id") + F.col("k") * n_vecs).alias("vec_id"),
        F.transform(
            "embedding", lambda x, i: x + (F.col("k") * 0.001) * (i % 3 - 1)
        ).alias("embedding"),
        "label",
    ).write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")

    n_orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").count()
    okey_stride = n_orders * 10
    orders = load_table(spark, SF_DIR, "orders").select("*", k)
    orders.select(
        (F.col("o_orderkey") + F.col("k") * okey_stride).alias("o_orderkey"),
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    ).write.mode("overwrite").parquet(f"{out_dir}/orders.parquet")

    # lineitem replicas keep the orders join consistent: l_orderkey shifts by
    # the SAME stride as o_orderkey, so each replica joins its own orders
    # replica and join fan-out grows linearly with data
    li = load_table(spark, SF_DIR, "lineitem")
    li_rest = [c for c in li.columns if c != "l_orderkey"]
    li.select("*", k).select(
        (F.col("l_orderkey") + F.col("k") * okey_stride).alias("l_orderkey"),
        *li_rest,
    ).write.mode("overwrite").parquet(f"{out_dir}/lineitem.parquet")

    # remaining relational tables pass through untouched (no probe scales them)
    for t in ("region", "nation", "customer", "supplier", "part"):
        shutil.copy(f"{SF_DIR}/{t}.parquet", f"{out_dir}/{t}.parquet")


def _force(df) -> int:
    """Force FULL evaluation and return the row count.

    ``count()`` is the wrong probe action for row-preserving plans: Catalyst
    prunes unreferenced projections AND whole Window nodes under a count-only
    aggregate (verified: the balance-with-reset Window vanishes from the
    count plan), so a windowed query would time as a bare scan. Hashing every
    output column into a checksum keeps every operator in the executed plan.
    """
    agg = df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64(*df.columns)).alias("chk"),
    ).first()
    return agg["n"]


def main() -> None:
    spark = build_session(app_name="scale-probe")
    out_dir = tempfile.mkdtemp(prefix="scaleprobe-")
    synthesize(spark, out_dir)
    qmap = queries()
    results = {}
    for name in PROBES:
        if ONLY is not None and name not in ONLY:
            continue
        fn = qmap[name]
        try:
            _force(fn(spark, SF_DIR))  # warm plan+JVM for this shape
            t0 = time.perf_counter()
            _force(fn(spark, SF_DIR))
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            n = _force(fn(spark, out_dir))
            tn = time.perf_counter() - t0
        except Exception as exc:  # a probe failure is itself the finding
            msg = str(exc).splitlines()[0][:300]
            results[name] = {"error": msg}
            print(f"# {name}: ERROR {msg}", file=sys.stderr)
            continue
        results[name] = {
            "t1": round(t1, 2),
            "tN": round(tn, 2),
            "ratio": round(tn / t1, 1) if t1 > 0 else None,
            "rows_at_N": n,
        }
        print(f"# {name}: {t1:.2f}s -> {tn:.2f}s (x{tn/t1:.1f})", file=sys.stderr)
    shutil.rmtree(out_dir, ignore_errors=True)
    print(json.dumps({"factor": FACTOR, "sf_dir": SF_DIR, "queries": results}))
    spark.stop()


if __name__ == "__main__":
    main()
