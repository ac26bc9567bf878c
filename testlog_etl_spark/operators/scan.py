"""Distributed global prefix scan: rank and running sum in an arbitrary
total order WITHOUT a single-partition window.

Spark plans ``Window.orderBy(...)`` with no ``partitionBy`` as ONE task
holding the entire input -- fine over a frame that is bounded by
construction (histogram buckets, top-100 lists), fatal over a grain
that scales with the data (per-customer / per-part rollups are ~billions
of rows at 100 TB TPC-H). This module is the general form of the
hierarchical-scan pattern ``operators/packing.py::with_stream_offsets``
introduced for token streams (reference parity: the reference's
row-at-a-time engines sort-then-scan on one node; Spark-first is a
range shuffle + bounded driver merge):

1. range-partition on the order columns and sort within partitions, so
   partition p holds an order-contiguous, order-sorted slice and
   partition ids increase along the order;
2. one tiny per-partition aggregate (count + sum) -> driver: bounded by
   the PARTITION COUNT, never the data size;
3. exclusive-prefix the per-partition totals on the driver, capture the
   (pid -> rank_offset, sum_offset) map in the scan closure;
4. intra-partition row_number / running sum via a raw-Arrow
   ``mapInArrow`` pass over the already-sorted partitions -- NO second
   exchange. (The first implementation used
   ``Window.partitionBy("_pid")``, which Catalyst satisfies with a full
   hashpartitioning(_pid) Exchange on top of the range shuffle -- two
   full-data shuffles, and 32 pids hashed into 32 reducers collide. The
   r09 form used ``mapInPandas``, whose pandas float64 round trip
   conflates NaN with NULL in pass-through columns -- raw Arrow batches
   keep them distinct and reuse pass-through arrays zero-copy.)

Total cost: ONE full-data range shuffle (plus the 32-row totals agg);
grand totals (row count, value sum) fall out of step 3 for free, so
callers that need ``n`` or ``tot`` alongside the scan pay no extra job.

FP note: the running sum associates as (partition/batch carry) + an
intra-batch sequential cumsum -- the same association family as the
windowed form it replaced (offset + intra-partition fold). Callers that
need ENGINE-EXACT cum boundaries (oracle differential) must snap the
value column to a dyadic grid first (the 2^-20 snap used throughout
queries/), which makes every fold order bit-identical.

Lifetime note: the range-partitioned intermediate is persisted so the
totals job and the main scan see the SAME sampled partition boundaries
(repartitionByRange samples; an unpersisted recompute could re-sample
and mismatch the offset map). The cached blocks are NOT eagerly freed
when the returned plan's action finishes -- they live until Spark's
ContextCleaner garbage-collects the unreferenced RDD (or the session
ends). Callers running many scans in one long session can pass
``persist_handles`` and unpersist after their action.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from testlog_etl_spark.util import persist_once


def global_rank_cumsum(
    df: DataFrame,
    order_by: Sequence[Column],
    val_col: str | None = None,
    rank_out: str = "i",
    cum_out: str = "cum",
    n_out: str | None = None,
    total_out: str | None = None,
    num_parts: int = 32,
    persist_handles: list[DataFrame] | None = None,
) -> DataFrame:
    """Add a global ``rank_out`` = row_number over ``order_by`` (callers
    must make the order TOTAL -- include a unique tie-break column --
    for deterministic output) and, when ``val_col`` is given,
    ``cum_out`` = inclusive running sum of ``val_col`` in that order.
    ``n_out``/``total_out`` optionally attach the global row count and
    value sum as constant columns (free: they are the final driver
    accumulator values). ``order_by`` takes Column sort expressions, so
    descending orders (``F.col("rev").desc()``) work.

    Pass-through columns must be Arrow-convertible (the scan streams
    each partition through ``mapInArrow``); every current caller's are.
    If ``persist_handles`` is given, the persisted range-partitioned
    intermediate is appended so the caller can ``unpersist()`` it after
    its action (see module docstring for why eager unpersist inside
    this function would be unsafe).
    """
    order_by = list(order_by)
    val = F.coalesce(F.col(val_col).cast("double"), F.lit(0.0)) if val_col else F.lit(0.0)
    ranged = persist_once(
        df.withColumn("_val0", val)
        .repartitionByRange(num_parts, *order_by)
        .sortWithinPartitions(*order_by)
        .withColumn("_pid", F.spark_partition_id())
    )
    if persist_handles is not None:
        persist_handles.append(ranged)
    totals = ranged.groupBy("_pid").agg(
        F.count(F.lit(1)).alias("_c"), F.sum("_val0").alias("_s")
    ).collect()
    n_acc, s_acc = 0, 0.0
    off_map: dict[int, tuple[int, float]] = {}
    for row in sorted(totals, key=lambda r: r["_pid"]):
        off_map[row["_pid"]] = (n_acc, s_acc)
        n_acc += row["_c"]
        s_acc += row["_s"] or 0.0

    passthrough = [f for f in ranged.schema.fields if f.name not in ("_pid", "_val0")]
    out_fields = list(passthrough) + [StructField(rank_out, LongType())]
    if val_col:
        out_fields.append(StructField(cum_out, DoubleType()))
    out_schema = StructType(out_fields)
    names = [f.name for f in out_fields]
    keep_names = [f.name for f in passthrough]
    want_cum = bool(val_col)

    # mapInArrow, NOT mapInPandas (r10): pandas float64 has ONE missing
    # marker, so an Arrow->pandas->Arrow round trip silently turns NaN
    # into NULL in every pass-through float column -- a NaN group key
    # (or NaN metric) came out of the r09 scan as a null and merged
    # with the real null group. Raw Arrow batches keep null and NaN
    # distinct (and decimals/timestamps exact); the scan only APPENDS
    # columns, so pass-through arrays are reused zero-copy.
    def scan(batches):
        import numpy as np
        import pyarrow as pa

        roff: int | None = None
        carry = 0.0
        for b in batches:
            if b.num_rows == 0:
                continue
            if roff is None:
                pid = b.column(b.schema.get_field_index("_pid"))[0].as_py()
                roff, carry = off_map.get(int(pid), (0, 0.0))
            n = b.num_rows
            arrays = [b.column(b.schema.get_field_index(c)) for c in keep_names]
            arrays.append(pa.array(np.arange(roff + 1, roff + n + 1, dtype="int64")))
            roff += n
            if want_cum:
                vals = b.column(b.schema.get_field_index("_val0")).to_numpy(
                    zero_copy_only=False
                )
                cs = vals.cumsum() + carry
                carry = float(cs[-1])
                arrays.append(pa.array(cs, type=pa.float64()))
            yield pa.RecordBatch.from_arrays(arrays, names)

    out = ranged.mapInArrow(scan, out_schema)
    if n_out:
        out = out.withColumn(n_out, F.lit(n_acc).cast("long"))
    if total_out:
        out = out.withColumn(total_out, F.lit(s_acc).cast("double"))
    return out


def global_running_max(
    df: DataFrame,
    order_by: Sequence[Column],
    val_col: str,
    out: str = "run_max",
    exclusive: bool = False,
    num_parts: int = 32,
    persist_handles: list[DataFrame] | None = None,
) -> DataFrame:
    """Running maximum of ``val_col`` (double) in an arbitrary total
    order, same shape as ``global_rank_cumsum``: one range shuffle, a
    partition-count-bounded totals collect, then an in-place Arrow
    cummax per already-sorted partition -- no single-partition window.

    ``exclusive=True`` gives each row the max over STRICTLY preceding
    rows (NULL for the global first row) -- the watermark shape: "the
    high-water mark as of just before this row arrived". Max is a
    lattice join, so unlike the cumsum there is no FP-association
    caveat: any grouping of the fold yields the identical result.
    """
    order_by = list(order_by)
    ranged = persist_once(
        df.withColumn("_val0", F.col(val_col).cast("double"))
        .repartitionByRange(num_parts, *order_by)
        .sortWithinPartitions(*order_by)
        .withColumn("_pid", F.spark_partition_id())
    )
    if persist_handles is not None:
        persist_handles.append(ranged)
    totals = ranged.groupBy("_pid").agg(F.max("_val0").alias("_m")).collect()
    carry_map: dict[int, float | None] = {}
    acc: float | None = None
    for row in sorted(totals, key=lambda r: r["_pid"]):
        carry_map[row["_pid"]] = acc
        m = row["_m"]
        if m is not None and (acc is None or m > acc):
            acc = m

    passthrough = [f for f in ranged.schema.fields if f.name not in ("_pid", "_val0")]
    out_schema = StructType(list(passthrough) + [StructField(out, DoubleType())])
    names = [f.name for f in out_schema.fields]
    keep_names = [f.name for f in passthrough]

    # mapInArrow for the same null-vs-NaN fidelity as global_rank_cumsum
    # (see its comment). _val0 nulls surface as NaN via to_numpy and are
    # treated as "no value" exactly as the pandas path did; the OUTPUT
    # NaN marker means "no preceding value" and converts back to NULL
    # (from_pandas=True), preserving the documented exclusive-first-row
    # NULL.
    def scan(batches):
        import numpy as np
        import pyarrow as pa

        init = False
        carry: float | None = None
        for b in batches:
            if b.num_rows == 0:
                continue
            if not init:
                pid = b.column(b.schema.get_field_index("_pid"))[0].as_py()
                carry = carry_map.get(int(pid))
                init = True
            vals = b.column(b.schema.get_field_index("_val0")).to_numpy(
                zero_copy_only=False
            )
            filled = np.where(np.isnan(vals), -np.inf, vals)
            cm = np.maximum.accumulate(filled)
            if carry is not None:
                cm = np.maximum(cm, carry)
            res = np.empty(len(vals))
            if exclusive:
                res[0] = carry if carry is not None else np.nan
                res[1:] = cm[:-1]
            else:
                res = cm
            res = np.where(np.isinf(res), np.nan, res)
            arrays = [b.column(b.schema.get_field_index(c)) for c in keep_names]
            arrays.append(pa.array(res, type=pa.float64(), from_pandas=True))
            carry = float(cm[-1]) if not np.isinf(cm[-1]) else carry
            yield pa.RecordBatch.from_arrays(arrays, names)

    return ranged.mapInArrow(scan, out_schema)


def group_quantile_exact(
    df: DataFrame,
    key: str,
    val: str,
    q: float = 0.5,
    out: str = "q",
    num_parts: int = 32,
) -> DataFrame:
    """Exact per-group linear-interpolated quantile — BIT-IDENTICAL to
    Spark's exact ``percentile(val, q)`` and DuckDB's ``quantile_cont``
    (both compute position ``p = q*(n-1)`` and interpolate with the
    SYMMETRIC form ``v[⌈p⌉]·(p-⌊p⌋) + v[⌊p⌋]·(⌈p⌉-p)``, which rounds
    differently from the naive ``lo + frac·(hi-lo)`` — e.g. q=0.9 over
    {1.0, 3.0} is 2.8000000000000003 under both engines, 2.8 naive) —
    WITHOUT the exact-percentile aggregate's scale hazard:
    ``percentile()`` buffers every group value in its aggregation
    state, so its partial buffers ride the shuffle at the full column
    width and each group's final merge lands on ONE reducer (measured
    80 KB/shuffle-record on stats_levene_test at sf0.1; at 100 TB a
    group's buffer is the group). Here only ``(key, value, count)``
    rollup rows cross one range exchange:

    1. per-(key, value) count rollup (map-side combinable);
    2. ``global_rank_cumsum`` over (key, value) -> global cumulative
       count, range-partitioned — no per-group concentration;
    3. a second, group-rollup-sized scan in the same key order turns
       the per-group totals into rank offsets and target
       order-statistic positions — fully distributed, any key-domain
       cardinality (r10; the r09 version collected the totals and
       walked offsets on the driver);
    4. a null-safe equi-join + filter selects the ≤2 covering value
       rows per group; interpolation is closed-form arithmetic.

    NULL values are ignored (``percentile`` semantics); a group with
    only NULLs yields NO row (vs percentile's NULL row) — callers that
    need the NULL row should left-join this result back to the key
    rollup. Returns a DataFrame (key, out) with ``out`` double.

    Thin wrapper over ``operators/scan_quantile.py::
    group_quantiles_exact`` (the multi-quantile form; full mechanism
    and FP-exactness notes live there).
    """
    from testlog_etl_spark.operators.scan_quantile import group_quantiles_exact

    return group_quantiles_exact(df, key, val, [q], [out], num_parts=num_parts)
