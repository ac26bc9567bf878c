"""Range (interval) join: points matched to the intervals containing
them, at scale.

Spark plans a plain non-equi condition (`lo <= p AND p < hi`) as
BroadcastNestedLoopJoin / CartesianProduct -- O(|P| x |I|) pairs
regardless of selectivity. The scalable form buckets the number line:

 1. each point gets bucket floor(p / W);
 2. each interval explodes to every bucket it overlaps (sequence of
    floor(lo/W)..floor(hi/W) -- the fan-out is span/W + 1, explicit and
    bounded by the caller's choice of W);
 3. buckets meet via an EQUI-join, then the exact containment predicate
    filters false bucket-mates.

One shuffle on the bucket key; pair volume is proportional to actual
overlap density, never |P| x |I|. Pick W near the median interval span:
wider W = fewer interval duplicates but more false candidates per
bucket, narrower W = the reverse. Same shape as the D6 range-edge
fan-out in operators/edges.py -- the blow-up is explicit in the plan,
not hidden in a join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
) -> DataFrame:
    """Inner join: every (point row, interval row) pair with
    lo <= point < hi (half-open). Output carries all columns of both
    inputs; column names must not collide (alias upstream)."""
    w = float(bucket_width)
    p_b = points.withColumn("__bucket", F.floor(F.col(point_col) / w))
    i_b = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w).cast("long"),
                F.floor(F.col(hi_col) / w).cast("long"),
            )
        ),
    )
    return (
        p_b.join(i_b, "__bucket")
        .filter((F.col(lo_col) <= F.col(point_col)) & (F.col(point_col) < F.col(hi_col)))
        .drop("__bucket")
    )
