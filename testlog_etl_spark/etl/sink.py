"""T9/S6/S7: idempotent partitioned sinks.

Reference: documents are bulk-indexed into Elasticsearch with a
deterministic `_id` (the etl key chain), so at-least-once redelivery
plus overwrite-by-id yields exactly-once EFFECT; S3 JSONL blocks are the
inter-stage bus (activedata_etl/sinks/).

Spark realization: deterministic `_id` (lineage.deterministic_id) +
`dropDuplicates(_id)` + dynamic-partition-overwrite parquet. Re-running
a batch rewrites exactly the partitions it touches -- the
`foreachBatch` form of this is the streaming exactly-once story (SS2.9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from testlog_etl_spark.etl.lineage import deterministic_id


def write_idempotent(
    df: DataFrame,
    path: str,
    id_cols: list[str],
    partition_by: list[str] | None = None,
    fmt: str = "parquet",
) -> None:
    """Write with a deterministic `_id`; duplicate ids within the batch
    are dropped (at-least-once -> effectively-once)."""
    spark = df.sparkSession
    out = df.withColumn("_id", deterministic_id(*id_cols)).dropDuplicates(["_id"])
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        w = out.write.mode("overwrite").format(fmt)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.save(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def split_sink(df: DataFrame, writers: list) -> None:
    """S8 Split: fan one transform's output to several sinks. The input
    is cached once so each writer re-reads memory, not the source."""
    df.persist()
    try:
        for w in writers:
            w(df)
    finally:
        df.unpersist()
