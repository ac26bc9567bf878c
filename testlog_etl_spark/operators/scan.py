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

1. range-partition on the order columns, so partition p holds an
   order-contiguous slice and partition ids increase along the order;
2. one tiny per-partition aggregate (count + sum) -> driver: bounded by
   the PARTITION COUNT, never the data size;
3. exclusive-prefix the per-partition totals on the driver, broadcast
   the (pid, rank_offset, sum_offset) rows back;
4. intra-partition row_number / running sum via an ordinary partitioned
   window, plus the broadcast offset.

Total cost: one range shuffle + one map-side window; grand totals
(row count, value sum) fall out of step 3 for free, so callers that
need ``n`` or ``tot`` alongside the scan pay no extra job.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType


def global_rank_cumsum(
    df: DataFrame,
    order_by: Sequence[Column],
    val_col: str | None = None,
    rank_out: str = "i",
    cum_out: str = "cum",
    n_out: str | None = None,
    total_out: str | None = None,
    num_parts: int = 32,
) -> DataFrame:
    """Add a global ``rank_out`` = row_number over ``order_by`` (callers
    must make the order TOTAL -- include a unique tie-break column --
    for deterministic output) and, when ``val_col`` is given,
    ``cum_out`` = inclusive running sum of ``val_col`` in that order.
    ``n_out``/``total_out`` optionally attach the global row count and
    value sum as constant columns (free: they are the final driver
    accumulator values). ``order_by`` takes Column sort expressions, so
    descending orders (``F.col("rev").desc()``) work.

    The persisted range-partitioned intermediate keeps the totals job
    and the main job on the SAME sampled partition boundaries (same
    contract as with_stream_offsets); it lives only while this plan
    does.
    """
    order_by = list(order_by)
    val = F.coalesce(F.col(val_col).cast("double"), F.lit(0.0)) if val_col else F.lit(0.0)
    ranged = (
        df.withColumn("_val0", val)
        .repartitionByRange(num_parts, *order_by)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    totals = ranged.groupBy("_pid").agg(
        F.count(F.lit(1)).alias("_c"), F.sum("_val0").alias("_s")
    ).collect()
    n_acc, s_acc = 0, 0.0
    offsets = []
    for row in sorted(totals, key=lambda r: r["_pid"]):
        offsets.append((row["_pid"], n_acc, s_acc))
        n_acc += row["_c"]
        s_acc += row["_s"] or 0.0
    off_schema = StructType(
        [
            StructField("_pid", ranged.schema["_pid"].dataType),
            StructField("_roff", LongType()),
            StructField("_soff", DoubleType()),
        ]
    )
    # explicit schema: survives the empty-input case where inference fails
    off = df.sparkSession.createDataFrame(offsets, off_schema)
    w = Window.partitionBy("_pid").orderBy(*order_by)
    out = (
        ranged.join(F.broadcast(off), "_pid")
        .withColumn(rank_out, (F.row_number().over(w) + F.col("_roff")).cast("long"))
    )
    if val_col:
        run = F.sum("_val0").over(w.rowsBetween(Window.unboundedPreceding, 0))
        out = out.withColumn(cum_out, run + F.col("_soff"))
    if n_out:
        out = out.withColumn(n_out, F.lit(n_acc).cast("long"))
    if total_out:
        out = out.withColumn(total_out, F.lit(s_acc).cast("double"))
    return out.drop("_pid", "_roff", "_soff", "_val0")
