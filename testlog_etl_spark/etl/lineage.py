"""T8 `etl` lineage stamping + T9 deterministic ids.

Reference: every document carries a nested `etl` field
{id, source: {...recursive lineage...}, timestamp, revision, machine}
(activedata_etl/transforms/__init__.py::EtlHeadGenerator) and sinks
overwrite by deterministic `_id` so re-runs are idempotent (SS2.8 T9).

Spark-side: the lineage is one nested struct column built from columns
already in flight (no shuffle, stays in codegen); `_id` is the
xxhash64 of the natural-key chain, stable across re-runs and partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def etl_struct(
    doc_id: Column,
    source_name: str,
    stage: str,
    parent: Column | None = None,
    timestamp: Column | None = None,
) -> Column:
    """The nested `etl` lineage struct; `parent` nests the upstream
    stage's struct (the reference's recursive `source` field)."""
    fields = [
        doc_id.cast("long").alias("id"),
        F.lit(source_name).alias("source_name"),
        F.lit(stage).alias("stage"),
    ]
    if parent is not None:
        fields.append(parent.alias("source"))
    if timestamp is not None:
        fields.append(timestamp.cast("timestamp").alias("timestamp"))
    return F.struct(*fields)


def stamp(df: DataFrame, doc_id: str | Column, source_name: str, stage: str) -> DataFrame:
    doc_id = F.col(doc_id) if isinstance(doc_id, str) else doc_id
    parent = F.col("etl") if "etl" in df.columns else None
    return df.withColumn("etl", etl_struct(doc_id, source_name, stage, parent=parent))


def deterministic_id(*key_cols: str | Column) -> Column:
    """Stable `_id` from the natural-key chain (reference: the `etl` key
    chain string a.b.c). xxhash64 is partition-order independent, so
    re-runs produce identical ids -> idempotent sinks."""
    cols = [F.col(c) if isinstance(c, str) else c for c in key_cols]
    return F.xxhash64(*[c.cast("string") for c in cols])
