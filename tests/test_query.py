"""Engine-level tests for the JX query runner (semantics; the driver-style
oracle parity lives in test_differential.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from testlog_etl_spark.query import format_cube, format_list, format_table, run_jx


@pytest.fixture(scope="module")
def people(spark):
    rows = [
        ("alice", "eng", 10.0, "2024-01-01 10:00:00"),
        ("bob", "eng", 20.0, "2024-01-02 10:00:00"),
        ("carol", "ops", None, "2024-01-02 12:00:00"),
        ("dave", "", 40.0, "2024-01-03 10:00:00"),
        ("erin", None, 50.0, "2024-01-05 10:00:00"),
    ]
    df = spark.createDataFrame(rows, "name string, dept string, score double, ts string")
    return {"people": df.withColumn("ts", df.ts.cast("timestamp"))}


def test_setop_where_select_sort_limit(spark, people):
    out = run_jx(
        spark,
        {
            "from": "people",
            "where": {"exists": "score"},
            "select": ["name", {"name": "double_score", "value": {"mult": ["score", 2]}}],
            "sort": [{"value": "score", "sort": -1}],
            "limit": 2,
        },
        people,
    )
    assert [tuple(r) for r in out.collect()] == [("erin", 100.0), ("dave", 80.0)]


def test_groupby_aggregates(spark, people):
    out = run_jx(
        spark,
        {
            "from": "people",
            "groupby": "dept",
            "select": [
                {"name": "n", "value": ".", "aggregate": "count"},
                {"name": "total", "value": "score", "aggregate": "sum"},
                {"name": "names", "value": "name", "aggregate": "union"},
            ],
            "sort": "dept",
        },
        people,
    )
    rows = [tuple(r) for r in out.collect()]
    # JX: missing groups by missing; '' dept and NULL dept are distinct keys
    # here (groupby uses raw values) -- reference nuance documented
    assert rows[0][0] is None or rows[0][0] == ""  # nulls sort first
    eng = [r for r in rows if r[0] == "eng"][0]
    assert eng[1] == 2 and eng[2] == 30.0 and eng[3] == ["alice", "bob"]


def test_whole_table_agg_and_stats(spark, people):
    out = run_jx(
        spark,
        {
            "from": "people",
            "select": [
                {"name": "st", "value": "score", "aggregate": "stats"},
                {"name": "card", "value": "dept", "aggregate": "cardinality"},
            ],
        },
        people,
    )
    row = out.collect()[0]
    assert row["st"]["count"] == 4 and row["st"]["min"] == 10.0 and row["st"]["max"] == 50.0
    # '' is missing -> distinct depts are {eng, ops}
    assert row["card"] == 2


def test_edges_set_domain_dense(spark, people):
    out = run_jx(
        spark,
        {
            "from": "people",
            "edges": [
                {
                    "name": "d",
                    "value": "dept",
                    "domain": {"type": "set", "partitions": ["eng", "ops", "hr"]},
                }
            ],
            "select": {"name": "n", "value": ".", "aggregate": "count"},
        },
        people,
    )
    got = {r["d"]: r["n"] for r in out.collect()}
    # hr exists densely with 0; null part collects '', None, non-domain
    assert got == {"eng": 2, "ops": 1, "hr": 0, None: 2}


def test_edges_time_domain(spark, people):
    out = run_jx(
        spark,
        {
            "from": "people",
            "edges": [
                {
                    "name": "day",
                    "value": "ts",
                    "domain": {
                        "type": "time",
                        "min": "2024-01-01",
                        "max": "2024-01-05",
                        "interval": "day",
                    },
                }
            ],
            "select": {"name": "n", "value": ".", "aggregate": "count"},
        },
        people,
    )
    rows = out.collect()
    by_day = {str(r["day"])[:10] if r["day"] else None: r["n"] for r in rows}
    # 4 dense days; Jan 5 row is outside [min,max) -> null part
    assert by_day == {
        "2024-01-01": 1,
        "2024-01-02": 2,
        "2024-01-03": 1,
        "2024-01-04": 0,
        None: 1,
    }


def test_range_edge_fanout(spark):
    df = spark.createDataFrame(
        [(1, 0.0, 25.0), (2, 10.0, 20.0), (3, 95.0, 130.0)],
        "id long, lo double, hi double",
    )
    out = run_jx(
        spark,
        {
            "from": "t",
            "edges": [
                {
                    "name": "bucket",
                    "value": {"range": {"min": "lo", "max": "hi"}},
                    "domain": {"type": "range", "min": 0, "max": 100, "interval": 10},
                    "allowNulls": False,
                }
            ],
            "select": {"name": "n", "value": ".", "aggregate": "count"},
        },
        {"t": df},
    )
    got = {r["bucket"]: r["n"] for r in out.collect()}
    assert len(got) == 10
    # row1 spans [0,30), row2 [10,20), row3 [90,100) clipped
    assert got[0.0] == 1 and got[10.0] == 2 and got[20.0] == 1 and got[90.0] == 1 and got[30.0] == 0


def test_window_running_sum_and_rownum(spark, people):
    out = run_jx(
        spark,
        {
            "from": "people",
            "select": ["name", "dept", "score"],
            "window": [
                {
                    "name": "running",
                    "value": "score",
                    "aggregate": "sum",
                    "edges": ["dept"],
                    "sort": "name",
                },
                {"name": "rn", "aggregate": "rownum", "edges": ["dept"], "sort": "name"},
            ],
            "sort": ["dept", "name"],
        },
        people,
    )
    eng = [(r["name"], r["running"], r["rn"]) for r in out.collect() if r["dept"] == "eng"]
    assert eng == [("alice", 10.0, 1), ("bob", 30.0, 2)]


def test_window_frame_median_and_lag(spark, people):
    out = run_jx(
        spark,
        {
            "from": "people",
            "select": ["name", "score"],
            "window": [
                {
                    "name": "med3",
                    "value": "score",
                    "aggregate": "median",
                    "sort": "name",
                    "range": {"min": -2, "max": 0},
                },
                {"name": "prev", "value": "score", "aggregate": "lag", "sort": "name"},
            ],
            "sort": "name",
        },
        people,
    )
    rows = {r["name"]: (r["med3"], r["prev"]) for r in out.collect()}
    assert rows["carol"] == (15.0, 20.0)  # median(10,20,null)=15; lag=bob's 20
    assert rows["erin"][0] == 45.0  # median(null,40,50)


def test_deep_from_explodes(spark):
    df = spark.createDataFrame(
        [("t1", [{"name": "s1", "ok": True}, {"name": "s2", "ok": False}]), ("t2", None)],
        "test string, subtests array<struct<name string, ok boolean>>",
    )
    out = run_jx(
        spark,
        {
            "from": "results.subtests",
            "select": ["test", {"name": "sub", "value": "subtests.name"}, "subtests.ok"],
            "sort": ["test", "sub"],
        },
        {"results": df},
    )
    rows = [tuple(r) for r in out.collect()]
    assert rows == [("t1", "s1", True), ("t1", "s2", False), ("t2", None, None)]


def test_formats(spark, people):
    q = {
        "from": "people",
        "edges": [{"name": "d", "value": "dept", "domain": {"type": "set", "partitions": ["eng", "ops"]}}],
        "select": {"name": "n", "value": ".", "aggregate": "count"},
    }
    df = run_jx(spark, q, people)
    cube = format_cube(df, ["d"])
    assert cube["edges"][0]["domain"]["partitions"] == ["eng", "ops", None]
    assert cube["data"]["n"] == [2, 1, 2]
    tbl = format_table(df)
    assert tbl["header"] == ["d", "n"]
    lst = format_list(df)
    assert {r["d"]: r["n"] for r in lst} == {"eng": 2, "ops": 1, None: 2}


def test_format_cube_2d_nested_reshape(spark):
    """The reference's signature output (SURVEY SS1.3 format=cube): for N
    edges, data[name] is an N-d nested list indexed data[i][j] by the i-th
    part of edge 0 and j-th part of edge 1, empty cells zero-filled for
    count-like aggregates, null parts LAST on every axis."""
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [
            Row(dept="eng", lvl="sr", ok=True),
            Row(dept="eng", lvl="jr", ok=True),
            Row(dept="ops", lvl="sr", ok=True),
            Row(dept="eng", lvl="sr", ok=True),
            Row(dept=None, lvl="jr", ok=True),
        ]
    )
    q = {
        "from": "t",
        "edges": [
            {"name": "dept", "value": "dept", "domain": {"type": "set", "partitions": ["eng", "ops"]}},
            {"name": "lvl", "value": "lvl", "domain": {"type": "set", "partitions": ["jr", "sr"]}},
        ],
        "select": {"name": "n", "value": ".", "aggregate": "count"},
    }
    out = run_jx(spark, q, {"t": df})
    cube = format_cube(out, ["dept", "lvl"])
    assert [e["name"] for e in cube["edges"]] == ["dept", "lvl"]
    assert cube["edges"][0]["domain"]["partitions"] == ["eng", "ops", None]
    assert cube["edges"][1]["domain"]["partitions"] == ["jr", "sr", None]
    # data["n"][dept_idx][lvl_idx]; dense incl. zero cells, nulls last
    assert cube["data"]["n"] == [
        [1, 2, 0],  # eng: jr=1, sr=2, null-lvl=0
        [0, 1, 0],  # ops
        [1, 0, 0],  # null dept: the lvl='jr' row with missing dept
    ]


def test_window_distribution_ranks(spark, people):
    out = run_jx(
        spark,
        {
            "from": "people",
            "select": ["name", "dept", "score"],
            "window": [
                {"name": "q2", "aggregate": "ntile", "buckets": 2, "edges": ["dept"], "sort": "name"},
                {"name": "pr", "aggregate": "percent_rank", "edges": ["dept"], "sort": "score"},
                {"name": "cd", "aggregate": "cume_dist", "edges": ["dept"], "sort": "score"},
            ],
            "sort": ["dept", "name"],
        },
        people,
    )
    eng = [(r["name"], r["q2"], r["pr"], r["cd"]) for r in out.collect() if r["dept"] == "eng"]
    # eng: alice score 10, bob score 20 -> pr = (rank-1)/(n-1), cd = rank/n
    assert eng == [("alice", 1, 0.0, 0.5), ("bob", 2, 1.0, 1.0)]


def test_window_ntile_requires_sort(spark, people):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="requires `sort`"):
        run_jx(
            spark,
            {"from": "people", "window": [{"name": "b", "aggregate": "ntile", "edges": ["dept"]}]},
            people,
        )


@pytest.mark.slow
def test_edges_default_other_collapses_overflow(spark):
    """D9: over-limit parts collapse into one OTHER row whose aggregates
    are computed over the COLLAPSED rows (avg must be exact, proving
    OTHER is a group in the fact aggregate, not a re-aggregation)."""
    import pytest as _pytest

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 10.0), ("c", 100.0), ("d", 7.0), ("e", 9.0), (None, 5.0)],
        "k string, v double",
    )
    out = run_jx(
        spark,
        {
            "from": "t",
            "edges": [{"name": "k", "value": "k", "limit": 2, "others": True}],
            "select": [
                {"name": "n", "value": ".", "aggregate": "count"},
                {"name": "avg_v", "value": "v", "aggregate": "average"},
            ],
        },
        {"t": df},
    )
    rows = {r["k"]: (r["n"], r["avg_v"]) for r in out.collect()}
    # kept = first 2 parts by value order (a, b); c/d/e collapse
    assert rows["a"] == (2, 2.0)
    assert rows["b"] == (1, 10.0)
    assert rows["OTHER"] == (3, (100.0 + 7.0 + 9.0) / 3)
    assert rows[None] == (1, 5.0)
    assert set(rows) == {"a", "b", "OTHER", None}

    # non-string edges cannot host a synthetic string label
    with _pytest.raises(ValueError, match="others=true needs a string"):
        run_jx(
            spark,
            {
                "from": "t",
                "edges": [{"name": "v", "value": "v", "limit": 2, "others": True}],
                "select": [{"name": "n", "value": ".", "aggregate": "count"}],
            },
            {"t": df},
        ).collect()


def test_queries_are_timezone_independent(spark):
    # ADVICE r03: results must not depend on the host session's zone or
    # on whether an events load ran first. queries() pins UTC per call;
    # this simulates a non-UTC driver session around a tz-sensitive query.
    import __spark_entry__ as entry

    from tests.conftest import SF_SMALL

    qs = entry.queries()
    fn = qs["stream_hourly_window"] if "stream_hourly_window" in qs else qs["edges_time_dense"]
    utc_rows = sorted(map(repr, (tuple(r) for r in fn(spark, SF_SMALL).collect())))
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        ny_rows = sorted(map(repr, (tuple(r) for r in fn(spark, SF_SMALL).collect())))
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    assert utc_rows == ny_rows


# --------------------------------------------------------------------------
# scan-routed quantile aggregates (r09: percentile()/median() buffer every
# group value in their aggregation state, so the groupby/edges/global-agg
# paths compute them by rank selection instead -- operators/scan_quantile.py)
# --------------------------------------------------------------------------


def test_groupby_median_percentile_scan_routed(spark, people):
    out = run_jx(
        spark,
        {
            "from": "people",
            "groupby": "dept",
            "select": [
                {"name": "n", "value": ".", "aggregate": "count"},
                {"name": "med", "value": "score", "aggregate": "median"},
                {"name": "p90", "value": "score", "aggregate": "percentile", "percentile": 0.9},
            ],
        },
        people,
    )
    assert out.columns == ["dept", "n", "med", "p90"]
    got = {r["dept"]: (r["n"], r["med"], r["p90"]) for r in out.collect()}
    # ground truth from the buffering aggregate the scan replaces
    exp = {
        r["dept"]: (r["n"], r["med"], r["p90"])
        for r in people["people"]
        .groupBy("dept")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("percentile(score, 0.5d)").alias("med"),
            F.expr("percentile(score, 0.9d)").alias("p90"),
        )
        .collect()
    }
    assert got == exp
    assert got["ops"] == (1, None, None)  # all-NULL group keeps its NULL quantile
    assert None in got and got[None][1] == 50.0  # NULL group key is first-class
    assert got["eng"] == (2, 15.0, 19.0)


def test_groupby_quantile_only_select(spark, people):
    # no non-quantile aggregates: the placeholder agg must not leak out
    out = run_jx(
        spark,
        {
            "from": "people",
            "groupby": "dept",
            "select": {"name": "med", "value": "score", "aggregate": "median"},
            "sort": "dept",
        },
        people,
    )
    assert out.columns == ["dept", "med"]
    assert {r["dept"]: r["med"] for r in out.collect()}["eng"] == 15.0


def test_global_agg_median_scan_routed(spark, people):
    out = run_jx(
        spark,
        {
            "from": "people",
            "select": [
                {"name": "n", "value": ".", "aggregate": "count"},
                {"name": "med", "value": "score", "aggregate": "median"},
            ],
        },
        people,
    )
    assert out.columns == ["n", "med"]
    row = out.collect()[0]
    assert (row["n"], row["med"]) == (5, 30.0)  # median(10,20,40,50)


def test_edges_median_dense_cells(spark, people):
    out = run_jx(
        spark,
        {
            "from": "people",
            "edges": [
                {
                    "name": "dept",
                    "value": "dept",
                    "domain": {"type": "set", "partitions": ["eng", "ops", "sales"]},
                    "allowNulls": False,
                }
            ],
            "select": [
                {"name": "n", "value": ".", "aggregate": "count"},
                {"name": "med", "value": "score", "aggregate": "median"},
            ],
            "sort": "dept",
        },
        people,
    )
    assert out.columns == ["dept", "n", "med"]
    got = {r["dept"]: (r["n"], r["med"]) for r in out.collect()}
    assert got["eng"] == (2, 15.0)
    assert got["ops"] == (1, None)  # present cell, all-NULL values
    assert got["sales"] == (0, None)  # empty dense cell: count filled, median NULL


def test_group_quantiles_exact_multikey_null_keys(spark):
    from testlog_etl_spark.operators.scan_quantile import group_quantiles_exact

    rows = [
        ("a", None, 1.0), ("a", None, 2.0), ("a", None, 4.0),
        ("a", "x", 10.0), ("b", "x", None),
        (None, "y", 7.0), (None, "y", 9.0), ("b", "y", 3.0),
    ]
    df = spark.createDataFrame(rows, "k1 string, k2 string, v double")
    got = {
        (r["k1"], r["k2"]): (r["med"], r["p25"])
        for r in group_quantiles_exact(df, ["k1", "k2"], "v", [0.5, 0.25], ["med", "p25"], num_parts=3).collect()
    }
    exp = {
        (r["k1"], r["k2"]): (r["med"], r["p25"])
        for r in df.groupBy("k1", "k2")
        .agg(
            F.expr("percentile(v, 0.5d)").alias("med"),
            F.expr("percentile(v, 0.25d)").alias("p25"),
        )
        .collect()
        if r["med"] is not None  # all-NULL groups yield no row from the scan
    }
    assert got == exp
    assert got[("a", None)] == (2.0, 1.5)
    assert got[(None, "y")] == (8.0, 7.5)
    assert ("b", "x") not in got


def test_group_quantiles_exact_nan_group_keys(spark):
    # r10: the distributed offset scan removed the r09 driver walk, and
    # with it the "float keys must not contain NaN" restriction -- both
    # scans use Spark's own ordering (NaN last), so NaN-keyed groups get
    # their exact quantiles. Spark groupBy normalizes NaN into one group.
    from testlog_etl_spark.operators.scan_quantile import group_quantiles_exact

    nan = float("nan")
    rows = [(nan, 1.0), (nan, 3.0), (1.0, 10.0), (1.0, 30.0), (None, 5.0), (-0.0, 7.0)]
    df = spark.createDataFrame(rows, "k double, v double")
    out = group_quantiles_exact(df, "k", "v", [0.5], ["med"], num_parts=3)
    got = {
        ("nan" if r["k"] != r["k"] else r["k"]): r["med"] for r in out.collect()
    }
    exp = {
        ("nan" if r["k"] != r["k"] else r["k"]): r["med"]
        for r in df.groupBy("k").agg(F.expr("percentile(v, 0.5d)").alias("med")).collect()
    }
    assert got == exp
    assert got["nan"] == 2.0 and got[None] == 5.0


def test_attach_group_quantiles_single_scan_for_multiple_exprs(spark, monkeypatch):
    # r10 melt: a JX query with quantile selects over DIFFERENT value
    # expressions (and duplicate builds of the SAME expression) runs
    # exactly ONE group_quantiles_exact scan -- the r09 version paid one
    # full range exchange per Column OBJECT because its dedup key was
    # the py4j object id (r09 advisor finding).
    import testlog_etl_spark.operators.scan_quantile as sq

    calls = []
    real = sq.group_quantiles_exact

    def counting(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(sq, "group_quantiles_exact", counting)
    df = spark.createDataFrame(
        [("a", 1.0, 10.0), ("a", 3.0, 30.0), ("b", 5.0, 50.0)], "k string, x double, y double"
    )
    base = df.groupBy(F.col("k")).agg(F.count(F.lit(1)).alias("n"))
    out = sq.attach_group_quantiles(
        df,
        base,
        [F.col("k")],
        ["k"],
        [
            ("med_x", F.col("x"), 0.5),
            ("p75_x", F.col("x"), 0.75),  # same expr, different Column object
            ("med_y", F.col("y"), 0.5),
        ],
    )
    assert len(calls) == 1, f"expected one melted scan, got {len(calls)}"
    got = {r["k"]: (r["med_x"], r["p75_x"], r["med_y"]) for r in out.collect()}
    assert got == {"a": (2.0, 2.5, 20.0), "b": (5.0, 5.0, 50.0)}


def test_group_quantiles_exact_timestamp_decimal_keys(spark):
    # r10: non-primitive group keys (timestamp, decimal) ride the Arrow
    # scans exactly -- the r09 driver walk ordered keys with PYTHON
    # comparisons, which only coincidentally matched Spark's ordering
    # for these types; both orderings are now Spark's own by
    # construction, so any orderable key type is safe
    import datetime as dt
    from decimal import Decimal

    from testlog_etl_spark.operators.scan_quantile import group_quantiles_exact

    rows = [
        (dt.datetime(2024, 1, 1, 10), Decimal("1.50"), 1.0),
        (dt.datetime(2024, 1, 1, 10), Decimal("1.50"), 3.0),
        (dt.datetime(2024, 1, 2, 10), Decimal("2.25"), 10.0),
        (None, None, 7.0),
        (dt.datetime(2024, 1, 2, 10), Decimal("2.25"), 30.0),
    ]
    df = spark.createDataFrame(rows, "t timestamp, d decimal(10,2), v double")
    got = {
        (r["t"], r["d"]): r["med"]
        for r in group_quantiles_exact(df, ["t", "d"], "v", [0.5], ["med"], num_parts=3).collect()
    }
    exp = {
        (r["t"], r["d"]): r["med"]
        for r in df.groupBy("t", "d").agg(F.expr("percentile(v, 0.5d)").alias("med")).collect()
    }
    assert got == exp
    assert got[(None, None)] == 7.0


def test_group_quantiles_exact_all_null_values_empty_scan(spark):
    # the fully-empty branch of the r10 distributed path: an all-NULL
    # value column yields an empty rollup, empty offsets scan, and an
    # empty result; attach leaves every group's quantile NULL --
    # percentile()'s answer -- without erroring anywhere in the
    # two-scan pipeline
    from testlog_etl_spark.operators.scan_quantile import (
        attach_group_quantiles,
        group_quantiles_exact,
    )

    df = spark.createDataFrame([("a", None), ("b", None)], "k string, v double")
    assert group_quantiles_exact(df, "k", "v", [0.5], ["med"]).collect() == []
    base = df.groupBy(F.col("k")).agg(F.count(F.lit(1)).alias("n"))
    att = attach_group_quantiles(df, base, [F.col("k")], ["k"], [("med", F.col("v"), 0.5)])
    assert sorted(tuple(r) for r in att.collect()) == [("a", 1, None), ("b", 1, None)]


def test_attach_group_quantiles_expr_dedup_key_is_expression_text(spark):
    # two Column OBJECTS for the same expression share one melt slot;
    # different expressions never collide (the dedup key is the rendered
    # expression tree, not object identity)
    from testlog_etl_spark.operators.scan_quantile import _expr_key

    assert _expr_key(F.col("x") + 1) == _expr_key(F.col("x") + 1)
    assert _expr_key(F.col("x")) != _expr_key(F.col("y"))
    assert _expr_key(F.col("x").alias("z")) != _expr_key(F.col("y").alias("z"))


def test_edges_median_null_part_absorbs_out_of_domain(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 5.0), (None, 7.0), (None, 9.0), ("zz", 100.0)],
        "k string, v double",
    )
    out = run_jx(
        spark,
        {
            "from": "t",
            "edges": [
                {"name": "k", "value": "k", "domain": {"type": "set", "partitions": ["a", "b"]}, "allowNulls": True}
            ],
            "select": [
                {"name": "n", "value": ".", "aggregate": "count"},
                {"name": "med", "value": "v", "aggregate": "median"},
            ],
        },
        {"t": df},
    )
    got = {r["k"]: (r["n"], r["med"]) for r in out.collect()}
    # the null part absorbs out-of-domain rows (D2), and its quantile is
    # computed over the SAME absorbed set the count sees
    assert got[None] == (3, 9.0)  # median(7, 9, 100)
    assert got["a"] == (2, 2.0)


@pytest.mark.slow
def test_edges_median_other_part(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 5.0), ("c", 7.0), ("d", 9.0), ("e", 11.0)],
        "k string, v double",
    )
    out = run_jx(
        spark,
        {
            "from": "t",
            "edges": [{"name": "k", "value": "k", "domain": {"type": "default", "limit": 2}, "others": True, "allowNulls": False}],
            "select": [
                {"name": "n", "value": ".", "aggregate": "count"},
                {"name": "med", "value": "v", "aggregate": "median"},
            ],
        },
        {"t": df},
    )
    got = {r["k"]: (r["n"], r["med"]) for r in out.collect()}
    assert got["OTHER"] == (3, 9.0)  # collapsed parts share one quantile cell
    assert got["a"] == (2, 2.0) and got["b"] == (1, 5.0)
