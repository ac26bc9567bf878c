"""Unit + plan tests for operators/diff.py (snapshot diff / CDC)."""

from __future__ import annotations

import pytest

from tests.test_plans import plan_of


def _snap(spark, rows):
    return spark.createDataFrame(rows, "k bigint, status string, price double")


def test_diff_classifies_all_three_ops(spark):
    from testlog_etl_spark.operators.diff import snapshot_diff

    old = _snap(spark, [(1, "A", 1.0), (2, "B", 2.0), (3, "C", 3.0)])
    new = _snap(spark, [(2, "B", 2.0), (3, "C", 9.0), (4, "D", 4.0)])
    got = {
        r["k"]: (r["op"], list(r["changed_cols"]))
        for r in snapshot_diff(old, new, ["k"]).collect()
    }
    assert got == {
        1: ("delete", []),
        3: ("update", ["price"]),
        4: ("insert", []),
    }


def test_diff_null_safe_compare(spark):
    from testlog_etl_spark.operators.diff import snapshot_diff

    # null -> null is NOT a change; null -> value and value -> null are
    old = _snap(spark, [(1, None, 1.0), (2, None, 2.0), (3, "C", 3.0)])
    new = _snap(spark, [(1, None, 1.0), (2, "B", 2.0), (3, None, 3.0)])
    got = {r["k"]: r["op"] for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {2: "update", 3: "update"}


def test_diff_identical_snapshots_empty(spark):
    from testlog_etl_spark.operators.diff import snapshot_diff

    old = _snap(spark, [(1, "A", 1.0), (2, "B", 2.0)])
    assert snapshot_diff(old, old, ["k"]).count() == 0


def test_diff_multi_column_update_names_each(spark):
    from testlog_etl_spark.operators.diff import snapshot_diff

    old = _snap(spark, [(1, "A", 1.0)])
    new = _snap(spark, [(1, "Z", 9.0)])
    [row] = snapshot_diff(old, new, ["k"]).collect()
    assert row["op"] == "update"
    assert list(row["changed_cols"]) == ["status", "price"]


def test_diff_rejects_missing_columns(spark):
    from testlog_etl_spark.operators.diff import snapshot_diff

    old = _snap(spark, [(1, "A", 1.0)])
    new = old.select("k", "status")
    with pytest.raises(ValueError, match="absent"):
        snapshot_diff(old, new, ["k"], ["price"])


def test_diff_projects_before_the_join(spark):
    # uncompared wide columns must NOT ride the full-outer exchange:
    # the scan under the join reads only key + compared columns
    from testlog_etl_spark.operators.diff import snapshot_diff

    wide = spark.createDataFrame(
        [(1, "A", "x" * 10)], "k bigint, status string, payload string"
    )
    plan = plan_of(snapshot_diff(wide, wide, ["k"], ["status"]))
    assert "FullOuter" in plan
    # the operator aliases ONLY key + compared columns into the join
    # inputs, so payload never acquires a _diff_ prefix and the
    # pre-join Exchanges carry [k, status] alone
    assert "_diff_old_payload" not in plan and "_diff_new_payload" not in plan
    for seg in plan.split("\n\n"):
        if seg.lstrip().startswith(("(7) Exchange", "Exchange")) or ") Exchange" in seg.split("\n")[0]:
            assert "payload" not in seg, seg
