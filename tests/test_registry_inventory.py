"""Pin the registry inventory so scripted edits can't silently drop
registrations.

Round-5 incident this guards against: a marker-to-marker block rewrite
of queries_analytics.py deleted the ADJACENT ``psm_caliper_att``
registration; it was caught only by an informal ``len(REGISTRY)``
check at the prompt (restored in commit c83395c).  These counts are
updated DELIBERATELY, one commit per batch of new queries — a
mismatch here means a registration vanished (or appeared) without the
inventory being touched.
"""

from __future__ import annotations

import axolotls_spark.queries  # noqa: F401 — import registers everything
from axolotls_spark.registry import REGISTRY

# Update these two numbers in the same commit that adds/removes
# registered queries.  README.md and SURVEY.md §8 carry the same
# counts for humans; this is the machine-checked copy.
N_EXPECTED = 437  # round 8: +minhash_xxhash_recall_cert (production
#                   query decoupled from its corpus-scaled cert,
#                   VERDICT r7 #1), +multimodal_ingestion (lifecycle
#                   composite trio completed, VERDICT r7 #4)
# round 7: +observed_ingestion_metrics, +observed_join_match_rate,
#                   +vector_index_lifecycle (r6: +daily_ingestion,
#                   +tree_depth2_cart, +epoch_shuffle_order,
#                   +minhash_xxhash_production, +delong_auc_ci,
#                   +rbo_rank_agreement, +ks_two_sample,
#                   +greedy_max_coverage, +multimodal_entropy_quality,
#                   +aipw_doubly_robust_ate, +kappa_filter_agreement,
#                   +rdd_local_linear, +wald_grouping_slope,
#                   +bayes_ab_beta_binomial, +hbos_outlier_scores,
#                   +cka_embedding_alignment, +forecast_backtest_metrics,
#                   +graph_modularity_regions, +rake_keywords,
#                   +quantile_sketch_rollup, +overdispersion_poisson,
#                   +mann_whitney_u, +brown_forsythe_variance,
#                   +mediation_sobel, +dp_noisy_counts,
#                   +alignment_uniformity, +simpsons_paradox_check,
#                   +term_dispersion_dp, +heaps_law_fit,
#                   +embedding_effective_rank, +cluster_label_nmi,
#                   +rmst_retention, +local_dp_randomized_response,
#                   +lm_dirichlet_search, +theil_index_spend,
#                   +graph_assortativity, +burstiness_interevent,
#                   +weighted_median_unit_price, +price_index_fisher,
#                   +capture_recapture_chapman, +markov_entropy_rate,
#                   +hurst_exponent_revenue, +lsh_band_design,
#                   +js_divergence_sources, +permutation_entropy_revenue,
#                   +periodogram_seasonal_power, +expected_calibration_error,
#                   +hill_diversity_profile, +power_analysis_mde,
#                   +cramers_v_association, +cochran_armitage_trend,
#                   +tukey_hsd_pairs, +lift_gain_deciles,
#                   +retrieval_mrr_recall, +mcnemar_gate_flip,
#                   +raking_ipf_weights, +quantile_normalize_chars,
#                   +markov_attribution_removal, +gbdt_boost_rounds,
#                   +hll_intersection_estimate, +ktruss_trade_edges,
#                   +holm_stepdown_nation_tests, +jackknife_ratio_variance,
#                   +chao1_vocab_richness, +bradley_terry_strengths,
#                   +design_effect_kish, +wasserstein_length_shift,
#                   +yuen_trimmed_ttest, +rouge_lead_summary,
#                   +matrix_profile_motif, +tail_dependence_lambda,
#                   +dp_user_level_counts, +evt_hill_tail_index,
#                   +neyman_allocation, +jarque_bera_normality,
#                   +sen_slope_trend, +qq_normality_ppcc,
#                   +spiegelhalter_calibration_z, +median_ci_orderstat,
#                   +bca_bootstrap_ci, +qini_aa_calibration,
#                   +fleiss_kappa_gates
# round 6, third session:
#                   +link_prediction_copurchase, +ams_f2_sketch_merge,
#                   +compaction_bin_packing, +multimodal_scene_changes,
#                   +multimodal_audio_vad, +fd_discovery_audit,
#                   +woe_information_value, +obrien_fleming_looks,
#                   +clustering_coefficient_nodes, +bloom_filter_design,
#                   +reciprocal_best_match, +slo_burn_rate_alerts,
#                   +content_defined_chunks, +voptimal_histogram,
#                   +procrustes_alignment_drift, +heavy_change_detection,
#                   +merkle_tree_levels, +learned_index_audit,
#                   +watermark_delay_design, +late_data_restatement
N_ORACLE = 437

# The deliberate rows-only set: every name here must exist, have no
# oracle, and nothing outside it may lack one.  Empty since round 6:
# the last three (agg_approx_sketches, sketch_mergeable_rollup,
# multimodal_byte_histogram) were promoted to hash-checked via
# accuracy-bound / hex-arithmetic oracles (VERDICT r5 item #2).
ROWS_ONLY: set[str] = set()


def test_registry_total_count():
    assert len(REGISTRY) == N_EXPECTED, (
        f"registry has {len(REGISTRY)} entries, expected {N_EXPECTED}. "
        "If you added/removed queries on purpose, update N_EXPECTED in "
        "the same commit; otherwise a registration was silently dropped "
        "by an edit (see commit c83395c for the failure mode)."
    )


def test_registry_oracle_count():
    with_oracle = {n for n, s in REGISTRY.items() if s.oracle is not None}
    assert len(with_oracle) == N_ORACLE, (
        f"{len(with_oracle)} oracle-checked entries, expected {N_ORACLE}"
    )


def test_rows_only_set_is_exact():
    without_oracle = {n for n, s in REGISTRY.items() if s.oracle is None}
    assert without_oracle == ROWS_ONLY, (
        f"rows-only drift: unexpected={sorted(without_oracle - ROWS_ONLY)} "
        f"missing={sorted(ROWS_ONLY - without_oracle)}"
    )


def test_every_entry_has_callable_and_tags():
    for name, spec in REGISTRY.items():
        assert callable(spec.fn), name
        assert isinstance(spec.tags, tuple) and spec.tags, name


def test_bench_headline_names_resolve():
    """Every bench.py headline name (incl. the frozen CORE and each
    round block) must be a registered query — a renamed/dropped
    registration would otherwise silently shrink the bench set."""
    import bench

    missing = [n for n in bench.HEADLINE if n not in REGISTRY]
    assert not missing, f"bench headliners not in registry: {missing}"
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))
