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

Skew: when the value domain is narrow or heavy-tailed, a few buckets
hold most rows and the join runs on a few tasks no matter how many
cores exist. AQE's skew split does NOT rescue this case: it triggers on
shuffle-input bytes (default 256 MB), but here the inputs are small and
the cost explodes *inside* the join (pair generation), so the skewed
task is CPU-hot with tiny input. ``salt > 1`` splits every bucket into
``salt`` sub-keys -- points take a deterministic hash-salt, intervals
replicate x ``salt`` -- trading ``salt`` x interval duplication for
``salt`` x parallelism inside hot buckets. Measured on the probe's
narrow-domain workload (22 buckets, 39% of rows in one): salt=32 took
sf0.1 from 4.3 s single-task-bound to sub-second on local[32].
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
    salt: int = 1,
) -> DataFrame:
    """Inner join: every (point row, interval row) pair with
    lo <= point < hi (half-open). Output carries all columns of both
    inputs; column names must not collide (alias upstream).

    ``salt``: sub-split factor per bucket (see module docstring). The
    point side is salted by a hash of ALL its columns, so equal-valued
    points still spread across sub-keys; the interval side replicates
    x ``salt``. Results are identical for any ``salt`` >= 1.
    """
    w = float(bucket_width)
    keys = ["__bucket"]
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
    if salt > 1:
        keys.append("__salt")
        p_b = p_b.withColumn("__salt", F.pmod(F.xxhash64(*points.columns), F.lit(salt)).cast("int"))
        i_b = i_b.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
        # Two pins, both needed (measured: either alone leaves the join
        # ~serial at ~4 s on the probe workload; together ~1.2 s):
        # 1. repartition the probe side by the SALTED keys with an explicit
        #    partition count -- Catalyst/AQE size plans by BYTES, so small
        #    inputs get coalesced into one task even though pair generation
        #    inside the join is CPU-huge; a user repartition survives AQE.
        # 2. force a shuffle-merge join -- a broadcast hash join would put
        #    the bucket's ENTIRE interval chain under every salt key of the
        #    build map, so probe work per point is unchanged by the salt
        #    (x salt build duplication, zero parallelism gain). Merge join
        #    physically splits each bucket's pairs across salt partitions.
        npart = int(points.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))
        p_b = p_b.repartition(npart, *keys)
        i_b = i_b.hint("merge")
    return (
        p_b.join(i_b, keys)
        .filter((F.col(lo_col) <= F.col(point_col)) & (F.col(point_col) < F.col(hi_col)))
        .drop(*keys)
    )
