from __future__ import annotations

import pytest

from testlog_etl_spark.operators.profile import profile


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        (1, "aa", 10.0, ["x"]),
        (2, "bbb", None, []),
        (3, None, 4.0, None),
        (4, "aa", 2.0, ["y", "z"]),
    ]
    return spark.createDataFrame(rows, "id bigint, s string, v double, arr array<string>")


def _by_col(out):
    return {r["column"]: r.asDict() for r in out.collect()}


def test_profile_metrics(df):
    p = _by_col(profile(df))
    assert set(p) == {"id", "s", "v", "arr"}
    assert all(r["n_rows"] == 4 for r in p.values())

    assert p["id"]["n_null"] == 0
    assert p["id"]["n_distinct"] == 4
    assert (p["id"]["min_value"], p["id"]["max_value"]) == ("1", "4")
    assert p["id"]["avg_metric"] == 2.5

    assert p["s"]["n_null"] == 1
    assert p["s"]["null_frac"] == 0.25
    assert p["s"]["n_distinct"] == 2  # 'aa' twice, 'bbb'; null excluded
    assert p["s"]["avg_metric"] == round((2 + 3 + 2) / 3, 4)  # mean length

    assert p["v"]["n_null"] == 1
    assert p["v"]["avg_metric"] == round((10.0 + 4.0 + 2.0) / 3, 4)

    # non-numeric, non-string: mean metric is NULL, the rest still real
    assert p["arr"]["avg_metric"] is None
    assert p["arr"]["n_null"] == 1
    assert p["arr"]["n_distinct"] == 3


def test_profile_column_subset_and_missing(df):
    assert {r["column"] for r in profile(df, ["id", "v"]).collect()} == {"id", "v"}
    with pytest.raises(KeyError):
        profile(df, ["nope"])


def test_profile_single_scan(df):
    # all metrics for all columns must come from ONE pass over the input:
    # exactly one scan of the source relation in the optimized plan
    plan = profile(df)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LocalRelation") + plan.count("LogicalRDD") == 1


def test_profile_approx_mode(df):
    p = _by_col(profile(df, ["id", "s"], exact=False))
    # HLL estimates are exact at this cardinality
    assert p["id"]["n_distinct"] == 4
    assert p["s"]["n_distinct"] == 2
