"""asof_join semantics: inclusive backward/forward matches, left-outer
nulls, tolerance window, equal-timestamp visibility."""

from __future__ import annotations

import pytest

import datetime

from pyspark.sql import Row


def _dt(s):
    return datetime.datetime.fromisoformat(s)


def _fixture(spark):
    left = spark.createDataFrame(
        [
            Row(k="a", t=_dt("2024-01-01 10:00:00"), lid=1),
            Row(k="a", t=_dt("2024-01-01 12:00:00"), lid=2),
            Row(k="a", t=_dt("2024-01-01 09:00:00"), lid=3),  # before any right
            Row(k="b", t=_dt("2024-01-01 10:30:00"), lid=4),
            Row(k="c", t=_dt("2024-01-01 10:00:00"), lid=5),  # key with no right rows
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k="a", rt=_dt("2024-01-01 10:00:00"), px=100.0),  # ties lid=1 exactly
            Row(k="a", rt=_dt("2024-01-01 11:00:00"), px=110.0),
            Row(k="b", rt=_dt("2024-01-01 10:00:00"), px=200.0),
            Row(k="b", rt=_dt("2024-01-01 11:00:00"), px=210.0),  # after lid=4
        ]
    )
    return left, right


@pytest.mark.slow
def test_asof_backward_inclusive_and_outer(spark):
    from testlog_etl_spark.operators.asof import asof_join

    left, right = _fixture(spark)
    out = asof_join(left, right, on=["k"], left_time="t", right_time="rt")
    got = {r["lid"]: (r["px_asof"], r["rt_asof"]) for r in out.collect()}
    assert got[1] == (100.0, _dt("2024-01-01 10:00:00"))  # equal ts matches
    assert got[2] == (110.0, _dt("2024-01-01 11:00:00"))  # latest prior
    assert got[3] == (None, None)  # nothing at-or-before
    assert got[4] == (200.0, _dt("2024-01-01 10:00:00"))  # 11:00 not visible backward
    assert got[5] == (None, None)  # key absent from right
    assert len(got) == 5  # left-outer: every left row survives


def test_asof_forward(spark):
    from testlog_etl_spark.operators.asof import asof_join

    left, right = _fixture(spark)
    out = asof_join(left, right, on=["k"], left_time="t", right_time="rt", direction="forward")
    got = {r["lid"]: r["px_asof"] for r in out.collect()}
    assert got[1] == 100.0  # inclusive at equal ts
    assert got[2] is None  # nothing at-or-after 12:00
    assert got[3] == 100.0  # earliest following
    assert got[4] == 210.0


def test_asof_tolerance(spark):
    from testlog_etl_spark.operators.asof import asof_join

    left, right = _fixture(spark)
    out = asof_join(
        left, right, on=["k"], left_time="t", right_time="rt", tolerance_seconds=1800
    )
    got = {r["lid"]: r["px_asof"] for r in out.collect()}
    assert got[1] == 100.0  # 0s old
    assert got[4] == 200.0  # 30min old, inside tolerance
    assert got[2] is None  # 11:00 match is 60min old -> nulled


def test_asof_is_single_shuffle(spark):
    """The merge form must cost exactly one hashpartitioning exchange on
    the join keys -- no range-join pair explosion, no extra shuffles."""
    import contextlib
    import io

    from testlog_etl_spark.operators.asof import asof_join

    left, right = _fixture(spark)
    df = asof_join(left, right, on=["k"], left_time="t", right_time="rt")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="simple")
    plan = buf.getvalue()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "CartesianProduct" not in plan and "Join" not in plan


def test_range_join_is_equi_join_not_bnlj(spark):
    """The whole point of the bucketed form: candidates meet via an
    equi-join on the bucket key, never a nested-loop product."""
    import contextlib
    import io

    from testlog_etl_spark import suite

    suite.queries()
    df = suite.REGISTRY["range_join_windows"].fn(spark, "/root/testdata/sf0.001")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="simple")
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan, plan
    assert "__bucket" in plan


def test_range_join_salt_invariant(spark):
    """salt only changes physical parallelism, never the result set."""
    from pyspark.sql import functions as F

    from testlog_etl_spark.operators.rangejoin import point_in_interval_join

    points = spark.range(200).select(F.col("id").alias("pid"), (F.col("id") % 37 * 1.5).alias("v"))
    ivals = spark.range(50).select(
        (F.col("id") * 1.1).alias("lo"), (F.col("id") * 1.1 + 9).alias("hi")
    )
    rows = lambda salt: sorted(
        map(
            tuple,
            point_in_interval_join(points, ivals, "v", "lo", "hi", 8.0, salt=salt).collect(),
        )
    )
    unsalted = rows(1)
    assert len(unsalted) > 0
    assert rows(16) == unsalted
