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


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    keys: list[str],
    salt_on: str | Column,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Explicit key-salting for a skewed big-big equi-join: every hot
    join key funnels its whole fact-side partition through ONE
    sort-merge task; salting splits it across ``n_salt`` tasks by
    joining on (keys..., salt) with the dim side replicated once per
    salt value (an explode over sequence -- dim grows n_salt-fold, the
    fact side not at all).

    When to reach for this instead of the automatic remedies: AQE's
    skew-join split rebalances by PARTITION BYTES and cannot see
    CPU-bound explosion inside one key, and broadcast is off the table
    by assumption (a dim small enough to broadcast never needs
    salting). The join strategy is pinned to sort-merge for exactly
    that reason -- at sandbox scale Catalyst would broadcast the
    replicated dim and silently un-demonstrate the shape this operator
    exists for (same pin as rangejoin's salted probe).

    ``salt_on`` must be a high-cardinality fact column (a row id) so
    salts spread uniformly; determinism: the salt is a hash, not RNG,
    so re-runs produce identical plans and results.

    ``how`` is restricted to fact-side-preserving join types: with
    ``right``/``full`` outer joins an unmatched dim row would surface
    once PER SALT REPLICA (n_salt duplicate null-extended rows), so the
    equals-the-unsalted-join guarantee below would not hold. For those
    shapes, salt the other side or fall back to AQE skew handling.
    Result equals the unsalted join exactly for every accepted ``how``
    (``test_salted_join_equals_plain``)."""
    allowed = {
        "inner", "left", "leftouter", "left_outer",
        "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti",
    }
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} unsupported -- dim rows are replicated "
            f"n_salt times, so right/full outer joins would emit unmatched dim "
            f"rows once per replica. Use one of inner/left/left_semi/left_anti."
        )
    salt = F.pmod(
        F.xxhash64((F.col(salt_on) if isinstance(salt_on, str) else salt_on).cast("string")),
        F.lit(n_salt),
    ).cast("int")
    f = fact.withColumn("_salt", salt)
    d = dim.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))).withColumn(
        "_salt", F.col("_salt").cast("int")
    )
    return f.join(d.hint("merge"), [*keys, "_salt"], how).drop("_salt")
