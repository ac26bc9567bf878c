"""Small shared utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition up to the cluster's parallelism for CPU-heavy per-row
    operators (hashing, signatures, pairwise math).

    The driver's tables are single small parquet files -> one input
    partition, which would serialize such work on one core. At real
    scale inputs arrive in many splits and this becomes a no-op-ish
    round-robin; the shuffle it costs is proportional to the (small)
    projected columns, not the full table.

    Plan-free by design: probing df.rdd.getNumPartitions() would force an
    RDD conversion / plan analysis on the driver per call. An unconditional
    repartition keeps planning lazy; at real scale AQE coalesces the
    resulting shuffle partitions to the data's actual size anyway.
    """
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(target)
