"""Inverted-index (postings) construction: term -> sorted doc-id list
with corpus statistics, plus a per-source quantile-threshold filter.

Postings are the backbone of exact-match decontamination and corpus
search: build once, then membership checks against eval sets are a
semi-join on term instead of a corpus rescan.

Scale shape:
- ``build_postings`` is explode -> ONE partial-aggregated shuffle keyed
  by term. Map-side combine collapses within-document repeats before the
  shuffle, so what moves is bounded by distinct (term, doc) pairs.
- Stopword-grade terms produce postings proportional to the corpus
  (every doc contains "the"); an uncapped collect would concentrate a
  near-full doc-id list on single reducers. ``max_df`` drops terms whose
  document frequency exceeds the cap BEFORE list materialization --
  exactly the stopword cutoff real IR systems apply -- so no reducer
  ever builds an unbounded list. The df counts themselves come from the
  same single aggregation.
- ``quantile_threshold_filter`` computes per-group score quantiles (one
  tiny thresholds frame, exact `percentile`) and broadcast-joins them
  back: corpus is scanned twice but shuffled never.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def build_postings(
    docs: DataFrame,
    id_col: str,
    terms: Column,
    max_df: int | None = None,
) -> DataFrame:
    """Inverted index: one row per surviving term with
    (df = document frequency, tf = total occurrences, postings = sorted
    distinct doc ids). ``max_df`` is the stopword cutoff: terms present
    in more documents carry no selectivity and would otherwise send a
    corpus-sized list through one reducer."""
    pairs = docs.select(F.col(id_col).alias("_doc"), F.explode(terms).alias("term"))
    # one shuffle: partial counts + partial distinct-accumulation per term
    agg = pairs.groupBy("term").agg(
        F.count(F.lit(1)).alias("tf"),
        F.count_distinct("_doc").alias("df"),
        F.array_sort(F.collect_set("_doc")).alias("postings"),
    )
    if max_df is not None:
        agg = agg.filter(F.col("df") <= max_df)
    return agg


def quantile_threshold_filter(
    df: DataFrame,
    group_col: str,
    score: Column,
    quantile: float,
    keep: str = "upper",
) -> DataFrame:
    """Keep rows whose score clears their group's ``quantile`` threshold
    ("top 20% quality per source" style gates). Exact ``percentile``
    (sort-based aggregate) over the grouped scores yields one threshold
    row per group -- a frame bounded by group cardinality, hence always
    broadcastable; the corpus side is filtered with zero shuffles."""
    scored = df.withColumn("_score", score)
    thresholds = scored.groupBy(group_col).agg(
        F.percentile("_score", F.lit(quantile)).alias("_thr")
    )
    cond = F.col("_score") >= F.col("_thr") if keep == "upper" else F.col("_score") <= F.col("_thr")
    return (
        scored.join(F.broadcast(thresholds), group_col)
        .filter(cond)
        .drop("_thr")
    )
