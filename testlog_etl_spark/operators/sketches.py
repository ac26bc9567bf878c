"""Mergeable-sketch rollups: pre-aggregate cardinality sketches at
ingest granularity, merge them at query time.

The 100 TB pattern this encodes: a daily job reduces each partition to
one HLL sketch row (bytes, not ids); month/quarter queries then merge a
handful of sketch rows instead of re-scanning the raw corpus. The core
guarantee that makes the pattern sound is MERGE EXACTNESS:
``hll_union_agg`` over per-bucket sketches yields the IDENTICAL
estimate to one ``hll_sketch_agg`` over the unioned raw rows (an HLL
register array is a lattice join -- merge order and grouping cannot
change it). That invariant is pinned in tests; accuracy vs exact
distinct is the usual HLL ~2% at lgConfigK=12.

Built on Spark 4's Apache DataSketches exposure (``hll_sketch_agg`` /
``hll_union_agg`` / ``hll_sketch_estimate``), JVM-side throughout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sketch_by(
    df: DataFrame,
    bucket_cols: list[str],
    value_col: str,
    lg_config_k: int = 12,
) -> DataFrame:
    """One row per bucket: (bucket_cols..., n_rows, sketch bytes).
    This is the ingest-time reduction -- the only pass over raw data."""
    return df.groupBy(*bucket_cols).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.hll_sketch_agg(value_col, F.lit(lg_config_k)).alias("sketch"),
    )


def merge_sketches(
    sketches: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Query-time merge: collapse sketch rows to ``group_cols`` and
    estimate. Touches only sketch bytes -- never the raw table."""
    return sketches.groupBy(*group_cols).agg(
        F.sum("n_rows").alias("n_rows"),
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).cast("long").alias("approx_distinct"),
    )
