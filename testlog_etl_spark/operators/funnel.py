"""Ordered-event funnel analysis: how many users completed step 1,
then step 2 AFTER step 1, then step 3 AFTER step 2, within a horizon.

The classic product-analytics sequence query. Spark shape: ONE exchange
on user, reused by every stage -- each stage's timestamp is a
conditional min window over the same user partition, where stage k's
condition references stage k-1's column (strictly-after ordering).
No self-joins (the naive formulation joins the events table once per
stage and explodes), no UDFs, no state: at 100 TB this is one shuffle
of (user, ts, type) triples plus per-partition window math.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def funnel_stage_times(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    horizon_sec: int | None = None,
) -> DataFrame:
    """One row per user with ``t1..tN`` = completion time of each funnel
    step (null = never reached). Step k counts only events strictly
    after step k-1's time; with ``horizon_sec``, the whole funnel must
    complete within that many seconds of step 1."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    w = Window.partitionBy(user_col)
    out = df.select(user_col, ts_col, type_col)
    prev: Column | None = None
    first: Column | None = None
    for i, step in enumerate(steps):
        cond = F.col(type_col) == step
        if prev is not None:
            cond = cond & (F.col(ts_col) > prev)
        if horizon_sec is not None and first is not None:
            cond = cond & (
                F.unix_timestamp(F.col(ts_col)) <= F.unix_timestamp(first) + F.lit(horizon_sec)
            )
        name = f"t{i + 1}"
        out = out.withColumn(name, F.min(F.when(cond, F.col(ts_col))).over(w))
        prev = F.col(name)
        if first is None:
            first = F.col(name)
    stage_cols = [f"t{i + 1}" for i in range(len(steps))]
    return out.select(user_col, *stage_cols).distinct()


def funnel_counts(stages: DataFrame, n_steps: int) -> DataFrame:
    """Collapse per-user stage times to one row of stage-completion
    counts (users reaching step k)."""
    aggs = [
        F.sum(F.col(f"t{i + 1}").isNotNull().cast("long")).alias(f"n_step{i + 1}")
        for i in range(n_steps)
    ]
    return stages.agg(*aggs)
