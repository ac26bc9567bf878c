"""Skew-resistant aggregation: explicit two-phase salting.

AQE's skew-join splitting handles skewed JOINS automatically, but a
groupBy over a low-cardinality/hot key still funnels each key's whole
partition through one reducer. Salting splits every hot key across
`n_salt` reducers (phase 1: partial agg on (key, salt); phase 2: final
combine on key). Worth it only when |keys| << cores or key frequency is
heavy-tailed -- exactly the events.event_type shape (4 values).

Only algebraic aggregates (decomposable into partials) are offered;
holistic ones (median, distinct) need different machinery (sketches).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    value: str | Column,
    n_salt: int = 16,
    salt_on: str | Column | None = None,
) -> DataFrame:
    """-> keys + (n, sum_value, min_value, max_value, avg_value).

    `salt_on` should be a high-cardinality column (defaults to the value
    itself) -- the salt only needs to spread rows, not be meaningful."""
    v = F.col(value) if isinstance(value, str) else value
    basis = F.col(salt_on) if isinstance(salt_on, str) else (salt_on if salt_on is not None else v)
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(basis.cast("string")), F.lit(n_salt)))
    partial = salted.groupBy(*keys, "_salt").agg(
        F.count(v).alias("_n"),
        F.sum(v).alias("_s"),
        F.min(v).alias("_mn"),
        F.max(v).alias("_mx"),
    )
    return (
        partial.groupBy(*keys)
        .agg(
            F.sum("_n").alias("n"),
            F.sum("_s").alias("sum_value"),
            F.min("_mn").alias("min_value"),
            F.max("_mx").alias("max_value"),
        )
        .withColumn("avg_value", F.col("sum_value") / F.col("n"))
    )
