"""Incremental materialized-view maintenance: keep a keyed aggregate MV
current by merging DELTA partial aggregates, never rescanning the base.

The trick is algebraic: for decomposable aggregates (sum, count, min,
max -- and avg as sum/count), the MV rows ARE partial aggregates, so
maintenance is `union(mv, aggregate(delta))` re-aggregated on the keys:
one shuffle keyed by the MV key, sized by |delta groups| + |mv|, with
the base data untouched. This is the same partial/final split Spark's
own hash aggregate does (SURVEY A15), lifted to storage.

Precision discipline: partials must stay UNROUNDED until presentation --
rounding inside the merge would make the MV drift from a full recompute
by accumulated rounding, not ulps. The paired driver query rounds only
its output, and its oracle is the full recompute: the differential gate
therefore proves base + delta maintenance lands on the recompute answer
(up to output rounding).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# how to MERGE two partials of each supported aggregate
_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # counts add
    "min": F.min,
    "max": F.max,
}


def aggregate_partials(
    df: DataFrame, keys: list[str], measures: dict[str, tuple[str, Column]]
) -> DataFrame:
    """Build MV-shaped partial aggregates: measures maps output column ->
    (agg_name in {sum,count,min,max}, input Column)."""
    aggs = []
    for out, (how, col) in measures.items():
        if how not in _MERGE:
            raise ValueError(f"non-decomposable aggregate {how!r}")
        fn = F.count if how == "count" else getattr(F, how)
        aggs.append(fn(col).alias(out))
    return df.groupBy(*keys).agg(*aggs)


def merge_mv(mv: DataFrame, delta: DataFrame, keys: list[str], measures: dict[str, str]) -> DataFrame:
    """Merge delta partials into the MV: union + re-aggregate with each
    measure's MERGE function (counts add, mins min, ...). measures maps
    column -> agg_name."""
    merged = mv.unionByName(delta)
    aggs = [_MERGE[how](F.col(c)).alias(c) for c, how in measures.items()]
    return merged.groupBy(*keys).agg(*aggs)
