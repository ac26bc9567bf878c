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
# DuckDB oracle each round; later entries get no correctness row. So the
# order below is a curated verification window, rotated per round:
#   1-20   the r01 queries blocked by the events nanos-read bug (prove the
#          tables.py fix end-to-end under the driver's own session);
#   21-32  oracle-backed LLM-pipeline / set-op / sources / deep-query
#          entries that fell beyond the cap in r01;
#   33-34  new D4 duration-domain and direct D5 range-domain cubes;
#   35-39  the streaming family (watermark window, stateful sessionize,
#          exactly-once foreachBatch sink);
#   40-50  join/agg anchors whose plans changed this round (q5/q10/q18
#          forced-broadcast removal) plus flagship bench queries.
# Entries beyond 50 were all hash-verified green in round 1 and are
# unchanged; COVERAGE.md marks them as carried, not re-verified.
DRIVER_WINDOW: tuple[str, ...] = (
    # -- 1-20: unblocked by the nanos fix
    "jx_null_semantics",
    "jx_date_relative",
    "jx_full_pipeline",
    "agg_bool_and_or",
    "agg_first_last",
    "edges_set_dense",
    "edges_time_dense",
    "edges_range_fanout",
    # windows family: 4 representatives (moving-frame + ranking rotate
    # to the local differential gate -- same family, plan unchanged)
    "win_running_sum",
    "win_lag_lead",
    "win_frame_median",
    "win_partition_share",
    "etl_props_extract",
    "etl_sessionize",
    "etl_dedup_latest",
    "etl_lineage_stamp",
    "etl_enrich_cached",
    "etl_typed_variant",
    # -- 21-32: beyond-cap families from r01
    "sim_topk_cosine",
    "dedup_embedding_cosine",
    "text_langid",
    "text_quality",
    "text_token_counts",
    "multimodal_frame_sample",
    "setop_rollup",
    "setop_intersect_except",
    "etl_normalize_mapping",
    "etl_coverage_lcov",
    "jx_deep_query",
    "source_jsonl_roundtrip",
    # -- 33-34: new domain coverage
    "edges_duration_histogram",
    "edges_range_direct",
    # -- 35-39: streaming family
    "stream_event_counts",
    "stream_hourly_window",
    "sessionize_stream_stateful",
    "stream_foreachbatch_sink",
    # sessionize_batch rotates out (its oracle/semantics are the
    # stateful twin's); slot goes to the stream-stream join
    "stream_stream_join",
    # -- 40-50: plan-changed joins and new round-2 operators.
    # Rotated out as r01-hash-green AND code-unchanged since (see
    # COVERAGE.md "Driver-cap honesty"): q6, dedup_exact,
    # agg_basic_groupby, q1, q3, dedup_minhash_lsh -- their slots go to
    # the new oracle-backed operators so every new op gets a driver row.
    # q5 stays in as the representative of the forced-broadcast removal
    # (q10/q18 share the same change; covered by the local differential
    # gate + test_plans); join_semi_anti / topk_union_distinct rotate
    # out -- their constituent ops were r01-green as separate queries.
    "q5_local_supplier_volume",
    "decontam_ngram_overlap",
    "split_hash_deterministic",
    "stream_dedup_redelivery",
    "asof_last_purchase",
    "range_join_windows",
    "text_repetition",
    "docs_filter_pipeline",
    "sample_stratified",
    "dedup_chunk_crossdoc",
    "text_vocab_topk",
    # -- new round-2 families: JX scalar-op sweep (E8/E15/E16/E22/E26-E31),
    # duplicate-group connected components
    "jx_scalar_ops",
    "dedup_group_resolve",
)


def _ordered() -> dict[str, QueryCase]:
    _load_all()
    missing = [n for n in DRIVER_WINDOW if n not in REGISTRY]
    if missing:
        raise KeyError(f"DRIVER_WINDOW names not registered: {missing}")
    rest = [n for n in REGISTRY if n not in set(DRIVER_WINDOW)]
    return {n: REGISTRY[n] for n in (*DRIVER_WINDOW, *rest)}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: case.fn for name, case in _ordered().items()}


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
    ):
        # No blanket except: a transitive ImportError inside a module would
        # silently drop its whole query family from the driver's view.
        __import__(f"testlog_etl_spark.queries.{mod}")
    _LOADED = True
