"""Driver-facing profiling queries (operators/profile.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from testlog_etl_spark.operators.profile import profile
from testlog_etl_spark.suite import register
from testlog_etl_spark.tables import load_tables


def _col_sql(c: str, avg: str) -> str:
    return f"""
SELECT '{c}' AS "column",
       count(*) AS n_rows,
       count(*) - count({c}) AS n_null,
       round((count(*) - count({c})) / count(*), 4) AS null_frac,
       count(DISTINCT {c}) AS n_distinct,
       CAST(min({c}) AS VARCHAR) AS min_value,
       CAST(max({c}) AS VARCHAR) AS max_value,
       {avg} AS avg_metric
FROM documents
"""


@register(
    "profile_documents",
    doc="single-scan data-profile of the documents table: per-column "
    "null/distinct/min/max/mean in ONE aggregate (partial+final, no row "
    "shuffle at any scale).",
    oracle=" UNION ALL ".join(
        _col_sql(c, avg)
        for c, avg in [
            ("doc_id", "round(avg(doc_id), 4)"),
            ("lang", "round(avg(length(lang)), 4)"),
            ("n_chars", "round(avg(n_chars), 4)"),
            ("source", "round(avg(length(source)), 4)"),
            ("text", "round(avg(length(text)), 4)"),
        ]
    )
    + ' ORDER BY "column"',
)
def profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return profile(docs, ["doc_id", "lang", "n_chars", "source", "text"])
