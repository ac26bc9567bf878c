"""Composite document-filter pipeline: the C4/Gopher-style quality gate
that sits in front of every training-data corpus build.

A filter pipeline is an ORDERED list of (rule_name, fails_predicate)
pairs; a document's verdict is the FIRST failing rule's name, else
``'keep'``. Ordering matters operationally: drop-reason histograms are
how pipeline owners tune thresholds, and a doc failing both "too_short"
and "repetitive" must count under exactly one bucket to keep the
histogram additive.

Scale shape: every rule is a pure Column expression over the text
(token/stopword/repetition signals from operators/textstats.py), so the
whole verdict computes inside the scan's WholeStageCodegen -- zero
shuffles, zero UDFs; the only shuffle is whatever aggregation the
caller puts on top. At 100 TB this is the ideal filter shape: one pass,
predicate-pushdown-friendly, and the verdict column is itself a cheap
partition key for routing kept/dropped docs to different sinks.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from testlog_etl_spark.operators import textstats


def default_rules(col: Column) -> list[tuple[str, Column]]:
    """The stock quality gate (thresholds tuned on the synthetic corpus
    so every rule fires on real rows; production would sweep these).

    Every signal here is an exact integer-ratio double (hits/n), so the
    threshold comparisons are bit-identical across engines -- the DuckDB
    oracle restates them verbatim.
    """
    return [
        # null text would null out every signal below and fall through to
        # 'keep' (CASE treats null conditions as false) -- catch it first
        ("missing", col.isNull()),
        ("too_short", textstats.token_count(col) < 25),
        ("low_stopword", textstats.stopword_ratio(col) < 0.02),
        ("repetitive", textstats.dup_ngram_fraction(col, 2) > 0.05),
        ("bad_shape", ~textstats.mean_token_len(col).between(2.0, 9.0)),
    ]


def filter_verdict(col: Column, rules: list[tuple[str, Column]] | None = None) -> Column:
    """First failing rule's name, else 'keep' (a single chained CASE)."""
    if rules is None:
        rules = default_rules(col)
    out = F.lit("keep")
    # build inside-out so the FIRST rule ends up outermost (first match wins)
    for name, fails in reversed(rules):
        out = F.when(fails, F.lit(name)).otherwise(out)
    return out
