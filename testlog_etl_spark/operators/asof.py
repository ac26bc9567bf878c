"""As-of (merge) join: for each left row, the latest right row at or
before its timestamp (backward) or the earliest at/after it (forward),
per join key.

Spark has no ASOF JOIN operator (DuckDB/Pandas do); the naive encoding
-- non-equi range join + per-left-row max -- explodes to O(|L| x |R|)
pairs per key. This implementation is the scalable merge form, built
from operators Spark DOES have:

 1. union the two sides (right rows tagged, left rows tagged), with the
    right side's payload columns null on left rows and vice versa;
 2. ONE window over (keys) ordered by (time, side-tag): `last(payload,
    ignorenulls=true)` carries the most recent right payload forward
    onto each left row (backward; forward is the mirrored ordering with
    `first` over the following frame);
 3. filter back to left rows.

Scale shape: exactly one shuffle, on the join keys -- the same cost as
the window family; no pair blow-up, no skew beyond the key distribution
itself. At 1000 executors a hot key salts like any window partition.

Semantics (matching DuckDB `ASOF JOIN ... ON l.k = r.k AND l.t >= r.t`):
inclusive at equal timestamps; unmatched left rows survive with null
payload (left-outer). Right rows must be unique per (key, time) --
enforce upstream (aggregate) or results are tie-arbitrary in ANY asof
engine. Optional `tolerance` (seconds) nulls matches older than
`left_time - tolerance`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left-outer as-of join. Right payload columns (everything except
    `on` + `right_time`) arrive suffixed; the matched right timestamp
    arrives as f"{right_time}{suffix}"."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")

    payload = [c for c in right.columns if c not in (*on, right_time)]
    out_cols = {c: f"{c}{suffix}" for c in (right_time, *payload)}

    l_tag = left.withColumn("__t", F.col(left_time)).withColumn("__is_left", F.lit(1))
    r_tag = right.select(
        *on,
        F.col(right_time).alias(out_cols[right_time]),
        *[F.col(c).alias(out_cols[c]) for c in payload],
    ).withColumn("__t", F.col(out_cols[right_time])).withColumn("__is_left", F.lit(0))

    both = l_tag.unionByName(r_tag, allowMissingColumns=True)

    # at equal __t the right row must be visible to the left row
    # (inclusive match): right sorts first on backward, first on forward
    if direction == "backward":
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("__t").asc(), F.col("__is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carry = {name: F.last(F.col(name), ignorenulls=True).over(w) for name in out_cols.values()}
    else:
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("__t").asc(), F.col("__is_left").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carry = {name: F.first(F.col(name), ignorenulls=True).over(w) for name in out_cols.values()}

    out = both
    for name, expr in carry.items():
        out = out.withColumn(name, expr)
    out = out.filter(F.col("__is_left") == 1).drop("__t", "__is_left")

    if tolerance_seconds is not None:
        ts_match = F.col(out_cols[right_time])
        delta = F.unix_timestamp(F.col(left_time)) - F.unix_timestamp(ts_match)
        if direction == "forward":
            delta = -delta
        keep = ts_match.isNotNull() & (delta <= F.lit(float(tolerance_seconds)))
        for name in out_cols.values():
            out = out.withColumn(name, F.when(keep, F.col(name)))
    return out
