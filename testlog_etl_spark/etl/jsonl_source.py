"""S1/S5 ingestion hardening: tolerant JSONL reads with a quarantine.

Reference behavior: the ETL's JSON-line readers skip unparseable lines
and keep going (a malformed artifact must not kill the worker; bad docs
are logged for backfill). Spark realization: PERMISSIVE mode with a
`_corrupt_record` column -- good rows flow on schema-typed, bad raw
lines land in a dead-letter DataFrame for an S7-style quarantine sink.

Scale: this is scan-time behavior (no extra pass); the one `cache()` is
required by Spark's internal-corrupt-column rule (a query may not
reference ONLY `_corrupt_record` on a raw file scan) and is scoped to
ingestion batches, which are bounded by micro-batch size in streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from testlog_etl_spark.util import persist_once

CORRUPT_COL = "_corrupt_record"


def read_jsonl_tolerant(
    spark: SparkSession, path: str, schema: StructType
) -> tuple[DataFrame, DataFrame]:
    """-> (good_rows, dead_letters). `good_rows` has exactly `schema`'s
    columns; `dead_letters` is one string column of the raw bad lines."""
    full = StructType(schema.fields + [StructField(CORRUPT_COL, StringType())])
    df = persist_once(
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return good, bad
