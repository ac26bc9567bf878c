"""Driver-facing inverted-index and quantile-gate queries
(operators/postings.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from testlog_etl_spark.operators import postings, textstats
from testlog_etl_spark.suite import register
from testlog_etl_spark.tables import load_tables


@register(
    "index_postings",
    doc="inverted index over documents: term -> (tf, df, sorted doc-id "
    "postings) in one partial-aggregated shuffle; max_df stopword cutoff "
    "(390) drops corpus-wide terms BEFORE any posting list materializes.",
    oracle="""
WITH t AS (
  SELECT doc_id,
         unnest(list_filter(string_split(trim(text), ' '), x -> x <> '')) AS term
  FROM documents
),
g AS (
  SELECT term, count(*) AS tf, count(DISTINCT doc_id) AS df,
         array_to_string(list_sort(list(DISTINCT doc_id)), ',') AS postings
  FROM t GROUP BY term
)
SELECT term, tf, df, postings FROM g
WHERE df <= 390
ORDER BY term
""",
)
def index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return (
        postings.build_postings(docs, "doc_id", textstats.tokens(F.col("text")), max_df=390)
        # suite convention: collections are stringified (sorted + joined)
        # so the driver's typed value-hash sees identical scalars
        .select("term", "tf", "df", F.array_join("postings", ",").alias("postings"))
        .orderBy("term")
    )


@register(
    "filter_quality_quantile",
    doc="per-source quantile gate: keep docs in the top quarter of "
    "n_chars WITHIN their source. Exact percentile per group (tiny "
    "thresholds frame) broadcast back -- zero corpus shuffles.",
    oracle="""
WITH thr AS (
  SELECT source, quantile_cont(n_chars, 0.75) AS t
  FROM documents GROUP BY source
)
SELECT d.source, count(*) AS n_kept,
       CAST(SUM(d.n_chars) AS BIGINT) AS chars,
       min(d.n_chars) AS min_kept
FROM documents d JOIN thr ON d.source = thr.source
WHERE d.n_chars >= thr.t
GROUP BY d.source
ORDER BY d.source
""",
)
def filter_quality_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    kept = postings.quantile_threshold_filter(
        docs, "source", F.col("n_chars"), quantile=0.75, keep="upper"
    )
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").alias("chars"),
            F.min("n_chars").alias("min_kept"),
        )
        .orderBy("source")
    )
