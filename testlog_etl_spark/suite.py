"""The driver-facing query suite: every implemented operator from
SURVEY.md SS2 gets a named (spark_query, oracle_sql) pair here.

Contract (``__spark_entry__.py``): the driver runs each Spark callable at
sf=0.01 and the oracle SQL in DuckDB over the same parquet, then compares
row-count + schema + order-insensitive value-hash. Determinism rules used
throughout this module:

- every computed column is aliased identically on both sides;
- every floating-point aggregate is rounded (ROUND(x, N)) on BOTH sides:
  double addition is not associative, so Spark's partition-parallel sums
  and DuckDB's sequential sums differ in the last ulps; rounding far above
  ulp scale makes the values bit-identical while still exercising the
  full-precision plan underneath;
- unordered collections (set aggregates) are sorted and joined to strings;
- every query ends in a deterministic total ORDER BY, so row sets are
  stable even if the driver hashes in order.

Registration is declarative so the suite is a data structure the driver,
bench.py, and tests all share.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QueryCase:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check
    doc: str = ""
    bench: bool = False  # include in bench.py headline set
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QueryCase] = {}


def register(
    name: str,
    oracle: str | None,
    doc: str = "",
    bench: bool = False,
    tags: tuple[str, ...] = (),
):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QueryCase(name=name, fn=fn, oracle=oracle, doc=doc, bench=bench, tags=tags)
        return fn

    return deco


# The driver harness verifies the FIRST 50 entries of queries() against the
# DuckDB oracle each round; later entries get no correctness row. The order
# below is a curated verification window, rotated per round so the UNION of
# rounds covers the whole registry (COVERAGE.md tracks the cumulative set).
#
# Round-8 window (VERDICT r07 "next round" items 1+3): a pure DRAIN
# round -- the registry is FROZEN at 526 and the window spends every
# slot on the verification backlog. Slots 1-2 re-sign the two r07
# presentation failures (jx_array_lambdas ARRAY output now joined to a
# string; agg_decimal_exact_revenue DECIMAL sums now rendered as
# strings -- both re-MATCHed locally under default-config + non-UTC
# sessions, and tools/output_type_lint.py now rejects the whole
# hash-unsafe output class registry-wide). Slots 3-50 take the FIRST 48
# of the never-driver-signed backlog in queue order (r07 session-2
# batch, then session-3) -- every one locally MATCHed at registration,
# in the end-of-session full sweeps, and re-swept this round under the
# new output-type lint. After this window the driver-signed union is
# 335/526; the remaining 191 queue below for r09-r12 (~4 windows).
DRIVER_WINDOW: tuple[str, ...] = (
    # -- re-signs: the two r07 driver-hash failures, fixed this round
    "jx_array_lambdas",
    "agg_decimal_exact_revenue",
    # -- backlog drain: first 48 never-driver-signed, queue order
    #    (r07 session-2 batch first, then session-3)
    "events_trigram_paths",
    "agg_mode_deterministic",
    "ts_gap_report",
    "dq_null_matrix",
    "features_woe_encoding",
    "eval_pq_recall",
    "events_bitmap_retention",
    "graph_kcore",
    "asof_nearest_join",
    "events_behavior_entropy",
    "eval_offline_policy_ips",
    "dq_l_diversity",
    "events_trailing_distinct_bitmap",
    "multimodal_audio_windows",
    "join_null_safe_semantics",
    "dq_scd2_integrity",
    "agg_mean_family",
    "text_alphabet_profile",
    "agg_fiscal_445",
    "graph_degree_assortativity",
    "text_char_entropy_rate",
    "join_damerau_fuzzy",
    "agg_rollup_cascade",
    "events_autocorrelation",
    "events_new_vs_returning",
    "orders_cohort_ltv",
    "sample_neyman_allocation",
    "dq_p_chart",
    "agg_to_date_totals",
    "sim_sparse_tfidf_pairs",
    "graph_sssp_weighted",
    "stats_runs_test",
    "dq_sequence_gaps",
    "stats_delta_method_ci",
    "stats_mann_whitney",
    "stats_anova_oneway",
    "stats_spearman_corr",
    "stats_ljung_box",
    "ts_stl_decompose",
    "graph_clustering_coefficient",
    "agg_theil_index",
    "eval_pr_curve",
    "etl_quarantine_badrecords",
    "ts_cusum_drift",
    "ts_theilsen_slope",
    "graph_label_propagation",
    "stats_kendall_tau",
    "stats_benjamini_hochberg",
    # -- BACKLOG QUEUE for r09+ (191 never-driver-signed remain, in
    #    sign-next order; r09-r12 windows take 48-50 each from the
    #    front; registry stays frozen until the union covers all 526):
    #    text_hapax_ratio, dq_dp_noisy_counts, text_js_divergence,
    #    stats_cuped_adjustment, stats_two_proportion_z,
    #    stats_sprt_sequential, agg_kmv_distinct_sketch,
    #    embed_dim_variance_profile, orders_revenue_bridge,
    #    ts_periodogram_weekly, multimodal_image_tiles,
    #    index_trigram_search, graph_transitivity_global,
    #    stats_levene_test, stats_effect_sizes, ts_holt_winters,
    #    stream_topk_maintenance, ts_kalman_level, join_radius_grid,
    #    orders_littles_law_check, events_leaderboard_churn,
    #    ts_lttb_downsample, graph_ppr_single_source,
    #    stats_wasserstein_drift, embed_matryoshka_recall,
    #    sim_matryoshka_rerank, stats_mcnemar, ts_downsample_m4,
    #    eval_cohens_kappa, text_keyphrase_rake,
    #    graph_absorbing_hit_probability, agg_lorenz_deciles,
    #    dq_value_pattern_profile, agg_native_unpivot,
    #    stats_partial_correlation, stats_cramers_v,
    #    ts_pacf_durbin_levinson, stats_durbin_watson,
    #    graph_modularity_lpa, graph_markov_entropy_rate,
    #    stats_hurst_exponent, ts_variance_ratio, agg_share_of_parent,
    #    events_bot_score, dq_pipeline_reconciliation,
    #    orders_discount_elasticity, text_term_burstiness,
    #    events_streak_histogram, orders_abc_migration, sim_topk_filtered,
    #    embed_isotropy_score, stats_ab_srm_check, stats_chow_break_test,
    #    agg_weighted_percentile, events_mde_power, stats_granger_lite,
    #    ts_forecast_backtest, dq_categorical_drift_new_values,
    #    dedup_lsh_parameter_advisor, graph_hits_hubs_authorities,
    #    ts_wavelet_haar_energy, stats_permutation_test,
    #    eval_rocchio_classifier, ts_seasonality_strength,
    #    events_type_coengagement, agg_tukey_median_polish,
    #    events_hazard_rate, stats_fisher_combined, index_proximity_search,
    #    orders_repeat_purchase, stats_bland_altman, graph_reciprocity,
    #    dq_ingestion_order_audit, stats_equivalence_tost,
    #    corpus_uncertainty_sample, layout_partition_planner,
    #    sim_mmr_rerank, stats_cohens_h, events_retention_halflife,
    #    stats_anderson_darling, agg_hodges_lehmann,
    #    graph_markov_stationary, stats_wilcoxon_signed_rank,
    #    eval_knn_classifier, stats_friedman_test,
    #    text_self_similarity_diversity, layout_hilbert_pruning,
    #    dq_functional_dependency, dq_referential_orphans,
    #    dedup_containment_postings, agg_binned_quantile,
    #    corpus_dedup_cascade, funnel_session_scoped,
    #    layout_broadcast_advisor, orders_rfm_segments, sql_shared_text_q1,
    #    source_python_datasource, sql_recursive_cte_ancestors,
    #    sql_shared_text_lateral_topn, source_binary_files,
    #    source_fixed_width_text, ts_sax_motifs, ts_dtw_shape_distance,
    #    stats_empirical_bayes_rates, events_viterbi_engagement,
    #    mv_join_delta_maintenance, dq_primary_key_uniqueness,
    #    dq_generalization_ladder, stream_lambda_backfill_union,
    #    sql_named_parameters, text_unicode_nfc_audit,
    #    attribution_markov_removal, stats_simpsons_paradox_scan,
    #    stats_median_ci_order_stats, stats_diff_in_diff,
    #    ts_peak_detection, text_burrows_delta, dq_inclusion_dependencies,
    #    stats_cochran_armitage_trend, agg_quantile_shift_function,
    #    stats_mann_kendall_trend, stats_jarque_bera, stats_kruskal_wallis,
    #    ts_bollinger_bands, ts_rsi_cutler, stats_bartlett_test,
    #    stats_grubbs_outlier, eval_fleiss_kappa, eval_lift_gains_table,
    #    graph_linkpred_scores, graph_rich_club, orders_price_index_fisher,
    #    stats_capture_recapture, text_collocation_llr,
    #    text_good_turing_mass, stats_logrank_test,
    #    stats_james_stein_means, dq_xmr_control_chart,
    #    stats_poisson_dispersion, embed_kmeans_one_step,
    #    ts_spectral_entropy, sql_pivot_clause, stats_cronbach_alpha,
    #    eval_brier_decomposition, dedup_phonetic_blocking,
    #    ts_croston_intermittent, ts_sample_entropy, multimodal_scene_cuts,
    #    stats_theil_u2_forecast, stats_page_hinkley, graph_katz_bounded,
    #    eval_mrr_retrieval, dq_order_detail_reconciliation,
    #    stats_cochran_q, stats_gini_mean_difference,
    #    stats_seasonal_mann_kendall, sample_systematic_interval,
    #    text_mattr_window, text_yules_k, orders_fill_rate_service_level,
    #    dq_id_time_inversions, eval_bleu_ngram_precision,
    #    sql_union_by_name, graph_avg_neighbor_degree, eval_weighted_kappa,
    #    stats_hill_tail_index, dq_ewma_control_chart,
    #    eval_average_precision, agg_magnitude_histogram,
    #    eval_matthews_correlation, stats_kendall_w, stats_sign_test,
    #    source_csv_dropmalformed, text_ari_readability,
    #    stats_cooks_distance, stats_breusch_pagan, stats_cmh_test,
    #    compliance_subject_access_report, dq_volumetric_anomaly_wow,
    #    stats_distribution_fit_moments, orders_lines_per_order_histogram,
    #    attribution_window_sweep, sql_named_window_clause,
    #    sql_group_by_all, events_position_in_session_ctr,
    #    ts_derivative_profile, embed_cosine_histogram,
    #    stream_histogram_quantile_maintenance,
    #    dq_timestamp_precision_profile, events_tenure_activity_curve,
    #    sample_class_balanced_downsample
)


def _ordered() -> dict[str, QueryCase]:
    _load_all()
    missing = [n for n in DRIVER_WINDOW if n not in REGISTRY]
    if missing:
        raise KeyError(f"DRIVER_WINDOW names not registered: {missing}")
    rest = [n for n in REGISTRY if n not in set(DRIVER_WINDOW)]
    return {n: REGISTRY[n] for n in (*DRIVER_WINDOW, *rest)}


def _pin_session(fn: Callable[[SparkSession, str], DataFrame]) -> Callable[[SparkSession, str], DataFrame]:
    """Pin session confs EVERY query path depends on, in every query path.

    The driver harness builds its own (default-config) SparkSession; before
    r04 only the events loader set these, so timezone-sensitive behavior in
    a non-UTC host session depended on whether an events load ran first
    (ADVICE r03: order-dependent results). Pinning here makes every
    driver-facing callable self-sufficient and order-independent; the set
    in tables.load_table remains as a defensive mirror for direct callers.
    """
    import functools

    @functools.wraps(fn)
    def wrapper(spark: SparkSession, sf_dir: str) -> DataFrame:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return fn(spark, sf_dir)

    return wrapper


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _pin_session(case.fn) for name, case in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    return {name: case.oracle for name, case in _ordered().items() if case.oracle is not None}


def bench_cases() -> dict[str, QueryCase]:
    _load_all()
    return {name: case for name, case in REGISTRY.items() if case.bench}


_LOADED = False


def _load_all() -> None:
    """Import every module that registers query cases (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    # imported for their @register side effects
    from testlog_etl_spark.queries import core  # noqa: F401

    for mod in (
        "jx_ops",
        "aggs",
        "edges_queries",
        "windows_queries",
        "etl_queries",
        "llm_ops",
        "streaming_queries",
        "sources_queries",
        "setops_queries",
        "subqueries",
        "asof_queries",
        "stats_queries",
        "features_queries",
        "profile_queries",
        "index_queries",
    ):
        # No blanket except: a transitive ImportError inside a module would
        # silently drop its whole query family from the driver's view.
        __import__(f"testlog_etl_spark.queries.{mod}")
    _LOADED = True
