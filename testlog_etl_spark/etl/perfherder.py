"""T5: PERFHERDER_DATA extraction -> perf documents with replicate stats.

Reference: activedata_etl/transforms/perfherder_logs_to_perf_logs.py
scans raw log text for `PERFHERDER_DATA: {json}` lines, parses the blob
(suites -> subtests -> replicates), and emits one doc per subtest with
moment statistics over the replicate values (vendor/mo_math/stats.py).

Spark realization: filter+substring (codegen) -> from_json with an
explicit schema -> explode suites/subtests (built-in lateral) -> stats
via built-in aggregates over the exploded replicates. The only shuffle
is the final per-subtest aggregate; the scan+parse is embarrassingly
parallel per file split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

_MARKER = "PERFHERDER_DATA: "

PERFHERDER_SCHEMA = StructType(
    [
        StructField("framework", StructType([StructField("name", StringType())])),
        StructField(
            "suites",
            ArrayType(
                StructType(
                    [
                        StructField("name", StringType()),
                        StructField("value", DoubleType()),
                        StructField(
                            "subtests",
                            ArrayType(
                                StructType(
                                    [
                                        StructField("name", StringType()),
                                        StructField("value", DoubleType()),
                                        StructField("replicates", ArrayType(DoubleType())),
                                    ]
                                )
                            ),
                        ),
                    ]
                )
            ),
        ),
    ]
)


def extract_perf(lines: DataFrame, line_col: str = "value", log_col: str = "log_key") -> DataFrame:
    """One row per (framework, suite, subtest) with replicate stats."""
    s = F.col(line_col)
    blobs = (
        lines.filter(s.contains(_MARKER))
        .select(
            F.col(log_col),
            F.from_json(F.substring_index(s, _MARKER, -1), PERFHERDER_SCHEMA).alias("perf"),
        )
        .select(log_col, F.col("perf.framework.name").alias("framework"), F.explode("perf.suites").alias("suite"))
        .select(
            log_col,
            "framework",
            F.col("suite.name").alias("suite"),
            F.col("suite.value").alias("suite_value"),
            F.explode_outer("suite.subtests").alias("subtest"),
        )
    )
    reps = F.col("subtest.replicates")
    n = F.size(reps)
    mean = F.aggregate(reps, F.lit(0.0), lambda acc, x: acc + x) / n
    return blobs.select(
        log_col,
        "framework",
        "suite",
        "suite_value",
        F.col("subtest.name").alias("subtest"),
        F.col("subtest.value").alias("subtest_value"),
        n.alias("replicate_count"),
        mean.alias("replicate_mean"),
        F.array_min(reps).alias("replicate_min"),
        F.array_max(reps).alias("replicate_max"),
    )
