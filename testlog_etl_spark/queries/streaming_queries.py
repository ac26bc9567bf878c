"""Oracle-paired Structured Streaming queries (SURVEY SS2.9).

Each entry drains the events table as a file-source stream and returns
the sink contents; because the stream is run to completion, the result
equals the equivalent batch aggregate -- which IS the DuckDB oracle. The
streaming machinery (source, trigger, state store, sink commit) is what
is under test; value semantics ride on the already-verified batch ops.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from testlog_etl_spark.streaming import jobs
from testlog_etl_spark.suite import register


@register(
    "stream_event_counts",
    doc="file-source stream -> running groupBy counts -> memory sink "
    "(complete mode); equals the batch aggregate once drained.",
    oracle="""
SELECT event_type, count(*) AS n, ROUND(SUM(value), 4) AS sum_value
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def stream_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = jobs.run_to_completion(jobs.event_type_counts(spark, sf_dir), "stream_event_counts")
    return out.orderBy("event_type")


@register(
    "stream_hourly_window",
    doc="event-time tumbling window + watermark; complete-mode output "
    "over the drained file equals batch date_trunc('hour').",
    oracle="""
SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n
FROM events
GROUP BY 1, 2
ORDER BY hour, event_type
""",
)
def stream_hourly_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = jobs.run_to_completion(jobs.hourly_windowed_counts(spark, sf_dir), "stream_hourly_window")
    return out.orderBy("hour", "event_type")


@register(
    "stream_foreachbatch_sink",
    doc="T9/SS2.9 exactly-once effect: foreachBatch + deterministic-id "
    "dynamic-partition overwrite; sink contents equal the deduped input.",
    oracle="""
SELECT event_id, user_id, event_type, ROUND(value, 4) AS value
FROM events
ORDER BY event_id
""",
)
def stream_foreachbatch_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    out_path = os.path.join(jobs.SCRATCH, "sink", "events_docs")
    # clear: dynamic overwrite rewrites only touched partitions, so a
    # previous run at another scale factor could leave stale days behind
    shutil.rmtree(out_path, ignore_errors=True)
    jobs.foreach_batch_idempotent(spark, sf_dir, out_path, "stream_foreachbatch_sink")
    return (
        spark.read.parquet(out_path)
        .select("event_id", "user_id", "event_type", F.round("value", 4).alias("value"))
        .orderBy("event_id")
    )
