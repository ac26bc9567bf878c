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
# Round-6 window: r05 went 50/50 green, so the union of r01-r05 driver rows
# covers 195 of the 230 registered queries. This window takes ALL 35
# remaining never-driver-signed queries (computed from the r01-r05
# CORRECTNESS files vs the registry) -- after this round the union covers
# the ENTIRE registry -- plus 15 anchor slots: first the three queries
# whose code changed this round (abc_pareto's integral-cents grid,
# gini + vocab_growth riding the rewritten operators/scan.py mapInPandas
# scan) and then recurring high-value anchors (flagships, bench set,
# survey hard spots) so regressions in the core surface stay
# driver-visible every round. Anchor slots are swapped for any operator
# added later in r06 so new work lands a first driver row immediately.
# r07 queue (registered late-r06, window full): dedup_source_overlap_matrix,
# corpus_context_window_report, eval_score_calibration -- all locally
# MATCH-verified; sign them in the r07 window together with any r07
# additions.
DRIVER_WINDOW: tuple[str, ...] = (
    # -- changed-code anchors (re-sign after this round's edits)
    "agg_abc_pareto",
    "agg_gini_concentration",
    "text_vocab_growth",
    # -- never-signed: aggregate / seasonal family
    "agg_mom_growth",
    "agg_percentile_contract",
    "agg_seasonal_index",
    "agg_weighted_median",
    "stats_quantile_normalize",
    # -- never-signed: attribution + orders analytics
    "attribution_last_touch",
    "attribution_linear",
    "orders_backlog_aging",
    "orders_cross_sell",
    "orders_duplicate_payments",
    # -- never-signed: events analytics
    "events_dau_mau",
    "events_error_budget",
    "events_inter_arrival",
    "events_seasonality_profile",
    "forecast_seasonal_naive_mape",
    # -- never-signed: corpus / dedup / packing
    "corpus_build_v2",
    "corpus_report_card",
    "corpus_token_budget",
    "dedup_best_exemplar",
    "dedup_containment",
    "dedup_sorted_tokens",
    "dedup_tier_report",
    "pack_length_buckets",
    "join_salted_skew",
    # -- never-signed: text / docs / embeddings
    "docs_template_extraction",
    "text_bigram_lm",
    "text_code_signal",
    "text_readability",
    "text_zipf_fit",
    "embed_norm_outliers",
    "eval_ann_recall",
    "eval_langid_metrics",
    # -- never-signed: quality / graph / sources
    "dq_freshness_report",
    "graph_degree_distribution",
    "source_schema_evolution",
    # -- operators added in r06 (first driver rows)
    "corpus_mixture_weights",
    "embed_random_projection",
    "split_leakage_audit",
    "dq_k_anonymity",
    "topk_global_paging",
    "index_phrase_search",
    "graph_subtree_rollup",
    "join_bloom_prefilter",
    "stream_record_breakers",
    # -- recurring anchors (flagships + bench set)
    "q1_pricing_summary",
    "q21_suppliers_kept_waiting",
    "etl_mozlog_results",
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
