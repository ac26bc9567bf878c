from __future__ import annotations

import pytest

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


def test_bm25_prefers_term_dense_docs(spark):
    from pyspark.sql import functions as F

    from testlog_etl_spark.operators.postings import bm25_topk
    from testlog_etl_spark.operators.textstats import tokens

    df = spark.createDataFrame(
        [
            (1, "spark spark spark join filler filler"),
            (2, "spark filler filler filler filler filler"),
            (3, "nothing relevant here at all ok"),
        ],
        ["doc_id", "text"],
    )
    out = bm25_topk(df, "doc_id", tokens(F.col("text")), ["spark", "join"], k=3)
    rows = sorted(((r["rank"], r["doc_id"]) for r in out.collect()))
    assert [d for _, d in rows] == [1, 2]  # doc 3 never matches
    assert rows[0][1] == 1  # tf-dense + two-term doc wins


@pytest.mark.slow
def test_pagerank_toy_graph(spark):
    from testlog_etl_spark.operators.dupgroups import pagerank

    # star: everyone points at 'hub'; hub points at 'a'
    edges = spark.createDataFrame(
        [("a", "hub", 1.0), ("b", "hub", 1.0), ("c", "hub", 1.0), ("hub", "a", 1.0)],
        ["src", "dst", "w"],
    )
    # hub<->a is a 2-cycle, so ranks OSCILLATE and need ~30 rounds to
    # settle; compare against the analytic fixed point (hub = 0.4797,
    # a = 0.4452, b = c = 0.0375) rather than iteration-parity artifacts
    ranks = {r["node"]: r["rank"] for r in pagerank(edges, "src", "dst", "w", n_iter=30).collect()}
    assert abs(ranks["hub"] - 0.4797) < 0.01
    assert abs(ranks["a"] - 0.4452) < 0.01
    assert abs(ranks["b"] - 0.0375) < 1e-6 and abs(ranks["c"] - 0.0375) < 1e-6
    assert abs(sum(ranks.values()) - 1.0) < 0.01  # no dangling nodes -> mass conserved
