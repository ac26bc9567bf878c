from __future__ import annotations

from pyspark.sql import functions as F

from testlog_etl_spark.operators.postings import build_postings, quantile_threshold_filter


def test_build_postings_counts_and_lists(spark):
    df = spark.createDataFrame(
        [
            (1, "a b a"),
            (2, "a c"),
            (3, "b b"),
        ],
        "doc_id bigint, text string",
    )
    out = build_postings(df, "doc_id", F.split("text", " ")).collect()
    by_term = {r["term"]: r for r in out}
    assert by_term["a"]["tf"] == 3 and by_term["a"]["df"] == 2
    assert by_term["a"]["postings"] == [1, 2]
    assert by_term["b"]["tf"] == 3 and by_term["b"]["df"] == 2
    assert by_term["b"]["postings"] == [1, 3]
    assert by_term["c"]["postings"] == [2]


def test_build_postings_max_df_cutoff(spark):
    df = spark.createDataFrame(
        [(i, "the rare" if i == 0 else "the") for i in range(5)],
        "doc_id bigint, text string",
    )
    out = build_postings(df, "doc_id", F.split("text", " "), max_df=3).collect()
    # 'the' appears in all 5 docs -> dropped by the stopword cap
    assert [r["term"] for r in out] == ["rare"]


def test_quantile_threshold_filter_upper_and_lower(spark):
    rows = [("g1", i) for i in range(1, 11)] + [("g2", i * 10) for i in range(1, 5)]
    df = spark.createDataFrame(rows, "grp string, score bigint")
    up = quantile_threshold_filter(df, "grp", F.col("score"), 0.75, keep="upper")
    got = sorted((r["grp"], r["score"]) for r in up.collect())
    # g1: q75 of 1..10 = 7.75 -> keep 8,9,10; g2: q75 of 10..40 = 32.5 -> keep 40
    assert got == [("g1", 8), ("g1", 9), ("g1", 10), ("g2", 40)]

    low = quantile_threshold_filter(df, "grp", F.col("score"), 0.25, keep="lower")
    got_low = sorted((r["grp"], r["score"]) for r in low.collect())
    assert got_low == [("g1", 1), ("g1", 2), ("g1", 3), ("g2", 10)]


def test_quantile_filter_thresholds_broadcast(spark):
    df = spark.createDataFrame([("g", i) for i in range(100)], "grp string, score bigint")
    plan = (
        quantile_threshold_filter(df, "grp", F.col("score"), 0.5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
