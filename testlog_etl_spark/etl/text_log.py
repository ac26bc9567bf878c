"""T3: raw harness text logs -> step documents.

Reference: activedata_etl/imports/text_log.py regex-scans buildbot-style
text logs for `========= Started/Finished <step> ... =========` markers
and emits one doc per step with its duration and status.

Spark realization: a `regexp_extract` cascade (codegen, no UDF) over the
raw lines, then one groupBy(step_key). At 100 TB the lines arrive as
`spark.read.text(paths)` with one task per file split; the aggregate
shuffles only (log_key, step_order) pairs -- tiny vs the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# buildbot-ish step markers:
#   ========= Started <name> (results: 0, elapsed: 12 secs) (at 2024-01-01 00:00:12.000) =========
_MARK = r"^=+ (Started|Finished) (.*?) \(results: (\d+), elapsed: (\d+) secs\) \(at ([0-9: .-]+)\) =+$"


def parse_steps(lines: DataFrame, line_col: str = "value", log_col: str = "log_key") -> DataFrame:
    """One row per step: name, order, result code, elapsed seconds,
    start/end wall time (string-parsed)."""
    s = F.col(line_col)
    marked = (
        lines.withColumn("_kind", F.regexp_extract(s, _MARK, 1))
        .filter(F.col("_kind") != "")
        .select(
            F.col(log_col),
            F.col("_kind"),
            F.regexp_extract(s, _MARK, 2).alias("step"),
            F.regexp_extract(s, _MARK, 3).cast("int").alias("result_code"),
            F.regexp_extract(s, _MARK, 4).cast("long").alias("elapsed"),
            F.to_timestamp(F.regexp_extract(s, _MARK, 5)).alias("at"),
        )
    )
    return (
        marked.groupBy(log_col, "step")
        .agg(
            F.min(F.when(F.col("_kind") == "Started", F.col("at"))).alias("start_time"),
            F.max(F.when(F.col("_kind") == "Finished", F.col("at"))).alias("end_time"),
            F.max(F.when(F.col("_kind") == "Finished", F.col("result_code"))).alias("result_code"),
            F.max(F.when(F.col("_kind") == "Finished", F.col("elapsed"))).alias("elapsed"),
        )
        .withColumn("ok", F.col("result_code") == 0)
    )
