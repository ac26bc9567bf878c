"""T2 (flagship transform): structured mozlog lines -> per-test result
documents + per-suite summaries.

Reference: activedata_etl/transforms/unittest_logs_to_sink.py streams a
mozlog JSONL artifact through a Python state machine (`accumulate_logs`)
keyed by test name: `test_start` opens, `test_status` lines accumulate
subtest counts, `test_end` closes with the overall status/expected and
the duration.

Spark realization: the "state machine" is order-insensitive once lines
carry their own action + timestamp, so it is ONE hash aggregate
(groupBy test) with conditional aggregates -- no Python boundary, full
codegen, and the same plan serves a 100 TB log corpus: the only shuffle
is on (suite_key, test), which is high-cardinality and unskewed.

Input line schema (mozlog public format): action, time (epoch seconds,
double), test, subtest, status, expected, message, plus a `suite_key`
column identifying the source artifact (the S3 key in the reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def test_results(lines: DataFrame) -> DataFrame:
    """Per-test result docs from raw mozlog lines."""
    a = F.col("action")
    is_status = a == "test_status"
    # mozlog: a missing `expected` on a status/end line means the status
    # itself was expected; unexpected iff expected is present and differs
    unexpected = F.col("status") != F.coalesce(F.col("expected"), F.col("status"))
    return (
        lines.filter(a.isin("test_start", "test_status", "test_end"))
        .groupBy("suite_key", "test")
        .agg(
            F.min(F.when(a == "test_start", F.col("time"))).alias("start_time"),
            F.max(F.when(a == "test_end", F.col("time"))).alias("end_time"),
            F.first(F.when(a == "test_end", F.col("status")), ignorenulls=True).alias("status"),
            F.first(F.when(a == "test_end", F.coalesce(F.col("expected"), F.col("status"))), ignorenulls=True).alias(
                "expected"
            ),
            F.sum(is_status.cast("long")).alias("subtest_count"),
            F.sum((is_status & ~unexpected).cast("long")).alias("subtest_pass"),
            F.sum((is_status & unexpected).cast("long")).alias("subtest_fail"),
            F.max(F.when(a == "test_end", unexpected)).alias("end_unexpected"),
        )
        .withColumn("duration", F.col("end_time") - F.col("start_time"))
        .withColumn(
            "ok",
            # a test is ok iff its end status was expected and no subtest
            # was unexpected (reference: `ok` flag on the test doc)
            (~F.coalesce(F.col("end_unexpected"), F.lit(False))) & (F.col("subtest_fail") == 0),
        )
        .drop("end_unexpected")
    )


def suite_summaries(results: DataFrame) -> DataFrame:
    """Suite-level rollup (the reference emits one summary doc per log)."""
    return results.groupBy("suite_key").agg(
        F.count(F.lit(1)).alias("test_count"),
        F.sum((~F.col("ok")).cast("long")).alias("unexpected_count"),
        F.sum("subtest_count").alias("subtest_count"),
        F.min("start_time").alias("suite_start"),
        F.max("end_time").alias("suite_end"),
        F.sum("duration").alias("total_test_seconds"),
    )
