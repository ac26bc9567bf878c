"""Deduplication operators (T9 idempotency + the LLM-pipeline dedup
family's exact tier; near-dup tiers live in operators/neardup.py).

Scale notes:
- `exact_dedup` / `latest_by` shuffle once on the key; at 100 TB the key
  should be the natural document key (high cardinality, unskewed);
- `dropDuplicates` keeps an arbitrary row; `latest_by` makes the kept
  row DETERMINISTIC (max by order cols) -- required for oracle parity
  and for idempotent re-runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_by(df: DataFrame, keys: list[str], order: list[Column]) -> DataFrame:
    """Keep exactly one row per key: the first under `order` (pass desc
    columns for 'latest'). One shuffle; the window and the dedup share
    the same exchange."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def exact_dedup(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Exact duplicate removal (hash-groupBy under the hood)."""
    return df.dropDuplicates(cols) if cols else df.dropDuplicates()


def content_hash(col: Column) -> Column:
    """Normalized content fingerprint for exact text dedup: lowercase,
    collapse whitespace, xxhash64 (cheap, partition-order independent)."""
    norm = F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")
    return F.xxhash64(norm)
