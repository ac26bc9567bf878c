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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {name: case.fn for name, case in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {name: case.oracle for name, case in REGISTRY.items() if case.oracle is not None}


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
    ):
        try:
            __import__(f"testlog_etl_spark.queries.{mod}")
        except ImportError:
            pass  # milestone not built yet
    _LOADED = True
