"""Ranking-comparison metrics over bounded top-D lists.

Rank-biased overlap (Webber, Moffat & Zobel, "A similarity measure for
indefinite rankings", TOIS'10) compares two rankings by prefix-set
agreement with geometrically decaying depth weights — the standard way
to ask "do these two retrieval runs / scoring functions agree where it
matters (the top)?" without requiring either to be a permutation of the
other.

Scale shape: inputs are top-D lists (the corpus-sized work — the two
TakeOrderedAndProject cuts — happens in the caller), so everything here
runs on <= D rows: one inner join on id, a groupBy on the entry depth
max(rank_a, rank_b), and two running sums over the D-row depth spine.
The unpartitioned windows are bounded by construction (D rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rbo_curve(
    a: DataFrame,
    b: DataFrame,
    id_col: str,
    depth: int,
    p: float = 0.9,
) -> DataFrame:
    """RBO prefix curve to ``depth``: per depth d, ``overlap`` =
    |A_{1..d} ∩ B_{1..d}|, ``agreement`` = overlap/d, and ``rbo_prefix``
    = (1-p) * sum_{e<=d} p^(e-1) * agreement(e) — the truncated RBO
    partial sum ("RBO_min at depth d": the full RBO's lower bound given
    only d observed ranks). ``a`` and ``b`` each carry (id_col, rank)
    with rank a total order 1..depth (duplicate ranks would double-count
    the intersection; callers produce them via row_number).

    An id in both prefixes enters the intersection at
    max(rank_a, rank_b), so the curve is one join + one groupBy + two
    bounded running sums — no per-depth rescan of the lists.

    Floats are UNROUNDED here (agreement/rbo_prefix are exact ratios of
    small integers times geometric weights); presentation layers round.
    """
    if not 0.0 < p < 1.0:
        raise ValueError(f"persistence p must be in (0, 1), got {p}")
    if depth < 1:
        raise ValueError(f"depth must be >= 1, got {depth}")
    ra = a.select(F.col(id_col).alias("_id"), F.col("rank").alias("_ra"))
    rb = b.select(F.col(id_col).alias("_id"), F.col("rank").alias("_rb"))
    entry = (
        ra.join(rb, "_id")
        .where((F.col("_ra") <= depth) & (F.col("_rb") <= depth))
        .select(F.greatest("_ra", "_rb").alias("_m"))
        .groupBy("_m")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    spine = (
        entry.sparkSession.range(1, depth + 1).select(F.col("id").alias("depth"))
    )
    wd = Window.orderBy("depth").rowsBetween(Window.unboundedPreceding, 0)
    return (
        spine.join(entry, spine.depth == entry._m, "left")
        .select("depth", F.coalesce("_c", F.lit(0)).alias("_c"))
        .withColumn("overlap", F.sum("_c").over(wd).cast("long"))
        .withColumn("agreement", F.col("overlap") / F.col("depth"))
        .withColumn(
            "rbo_prefix",
            F.lit(1.0 - p)
            * F.sum(F.pow(F.lit(p), F.col("depth") - 1) * F.col("agreement")).over(wd),
        )
        .select(F.col("depth").cast("int").alias("depth"), "overlap", "agreement", "rbo_prefix")
    )
