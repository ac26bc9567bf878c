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
# Round-3 window: after r01+r02, 73/107 queries have a green driver row.
#   1-6    the six r02 hash-mismatches (DuckDB HUGEINT sums vs Spark
#          BIGINT -- oracles now CAST ... AS BIGINT; verified locally with
#          the dtype-aware tools/verify_all.py);
#   7-34   every remaining never-driver-checked query (the 28 that have
#          sat beyond the cap in both rounds, incl. the five rows-only
#          ones: sketch/simhash/IVF/LSH/multimodal-features);
#   35-50  anchors re-verified every round: the flagship/bench set plus
#          the big-join and streaming representatives.
# Entries beyond 50 were hash-green in r01 or r02 and are unchanged.
DRIVER_WINDOW: tuple[str, ...] = (
    # -- 1-6: r02 hash-mismatch fixes (oracle dtype casts)
    "etl_props_extract",
    "text_token_counts",
    "split_hash_deterministic",
    "docs_filter_pipeline",
    "sample_stratified",
    "dedup_chunk_crossdoc",
    # -- 7-34: never driver-checked before this round
    "join_semi_anti",
    "topk_union_distinct",
    "join_full_outer_counts",
    "agg_pivot_type_by_day",
    "agg_sketch_rollup",
    "agg_rfm_segments",
    "win_moving_frame",
    "win_ranking",
    "ts_downsample_locf",
    "funnel_view_click_purchase",
    "dedup_simhash",
    "sim_ivf_topk",
    "sim_lsh_topk",
    "multimodal_features",
    "text_pii_scrub",
    "pack_sequences",
    "text_tfidf_topk",
    "corpus_build_e2e",
    "sample_exact_k_per_group",
    "dedup_incremental",
    "text_unigram_ppl",
    "embed_quantize_int8",
    "text_source_kl",
    "text_bpe_pair_mining",
    "sessionize_batch",
    "sessionize_native_window",
    "layout_bucketed_join",
    "agg_salted_skew",
    # -- 35-50: per-round anchors (flagship + bench + join/stream reps),
    # twelve slots rotated to round-3's NEW operators (each displaced
    # anchor was hash-green in r01/r02 and its code is unchanged: q6,
    # q10, q18, q3, dedup_exact, etl_perfherder, jx_deep_query,
    # agg_basic_groupby, edges_set_dense, win_running_sum,
    # sim_topk_cosine, etl_mozlog_results)
    "q1_pricing_summary",
    "text_boilerplate_fraction",
    "q5_local_supplier_volume",
    "sample_mixture_weighted",
    "sim_topk_int8",
    "edges_percentile_cells",
    "cohort_retention",
    "dedup_minhash_lsh",
    "transition_matrix",
    "source_csv_roundtrip",
    "skew_report",
    "index_postings",
    "filter_quality_quantile",
    "win_distribution_ranks",
    "stream_hourly_window",
    "profile_documents",
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
        "asof_queries",
        "profile_queries",
        "index_queries",
    ):
        # No blanket except: a transitive ImportError inside a module would
        # silently drop its whole query family from the driver's view.
        __import__(f"testlog_etl_spark.queries.{mod}")
    _LOADED = True
