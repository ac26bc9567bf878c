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


# ---- sweep_concurrency (operators/timeseries.py) ----


def _iv(spark, rows):
    return spark.createDataFrame(rows, "k string, start timestamp, end timestamp")


def test_sweep_peak_and_first_instant(spark):
    from datetime import datetime as dt

    from testlog_etl_spark.operators.timeseries import sweep_concurrency

    t = lambda m: dt(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        ("a", t(0), t(10)),
        ("a", t(5), t(15)),   # overlaps first -> conc 2 at :05
        ("a", t(5), t(8)),    # conc 3 at :05
        ("a", t(20), t(30)),  # isolated
        ("b", t(0), t(1)),
    ]
    got = {r["k"]: (r["peak"], r["first_peak_ts"]) for r in
           sweep_concurrency(_iv(spark, rows), "k", "start", "end").collect()}
    assert got == {"a": (3, t(5)), "b": (1, t(0))}


def test_sweep_half_open_boundaries(spark):
    from datetime import datetime as dt

    from testlog_etl_spark.operators.timeseries import sweep_concurrency

    # [0,10) and [10,20): end == start must NOT count as overlap
    rows = [("a", dt(2024, 1, 1, 0, 0), dt(2024, 1, 1, 0, 10)),
            ("a", dt(2024, 1, 1, 0, 10), dt(2024, 1, 1, 0, 20))]
    [r] = sweep_concurrency(_iv(spark, rows), "k", "start", "end").collect()
    assert r["peak"] == 1


def test_sweep_matches_naive_on_random_intervals(spark):
    from datetime import datetime as dt, timedelta

    from testlog_etl_spark.operators.timeseries import sweep_concurrency

    # deterministic pseudo-random intervals; naive O(n^2) check
    base = dt(2024, 1, 1)
    rows = []
    x = 1
    for i in range(60):
        x = (x * 48271) % 2147483647
        s = x % 500
        d = 1 + (x >> 8) % 50
        rows.append(("k" + str(i % 3), base + timedelta(minutes=s), base + timedelta(minutes=s + d)))
    got = {r["k"]: r["peak"] for r in
           sweep_concurrency(_iv(spark, rows), "k", "start", "end", num_parts=7).collect()}
    for key in {r[0] for r in rows}:
        ivs = [(s, e) for k, s, e in rows if k == key]
        naive = max(sum(1 for s, e in ivs if s <= b < e) for b, _ in ivs)
        assert got[key] == naive, key


def test_sweep_window_method_matches_scan(spark):
    from datetime import datetime as dt, timedelta

    from testlog_etl_spark.operators.timeseries import sweep_concurrency

    base = dt(2024, 1, 1)
    rows, x = [], 7
    for i in range(80):
        x = (x * 48271) % 2147483647
        s = x % 300
        rows.append(("k" + str(i % 5), base + timedelta(minutes=s),
                     base + timedelta(minutes=s + 1 + (x >> 7) % 40)))
    df = _iv(spark, rows)
    a = {tuple(r) for r in sweep_concurrency(df, "k", "start", "end", method="scan").collect()}
    b = {tuple(r) for r in sweep_concurrency(df, "k", "start", "end", method="window").collect()}
    assert a == b


@pytest.mark.slow
def test_snapshot_diff_roundtrip_reconstructs_new(spark):
    # applying the diff to OLD must reproduce NEW exactly: delete the
    # 'delete' keys, upsert the 'insert'/'update' keys from NEW
    from testlog_etl_spark.operators.diff import snapshot_diff

    old = _snap(spark, [(1, "A", 1.0), (2, "B", 2.0), (3, "C", 3.0), (4, "D", 4.0)])
    new = _snap(spark, [(2, "B", 2.0), (3, "X", 3.0), (4, "D", 9.0), (5, "E", 5.0)])
    from testlog_etl_spark.operators.diff import apply_diff

    d = snapshot_diff(old, new, ["k"], include_payload=True)
    rebuilt = apply_diff(old, d, ["k"])  # old + diff ONLY -- no new
    assert {tuple(r.asDict().values()) for r in rebuilt.select("k", "status", "price").collect()} == {
        tuple(r) for r in new.collect()
    }

    import pytest

    with pytest.raises(ValueError, match="payload"):
        apply_diff(old, snapshot_diff(old, new, ["k"]), ["k"])


def test_sweep_scan_handles_empty_and_null_keys(spark):
    from datetime import datetime as dt

    from testlog_etl_spark.operators.timeseries import sweep_concurrency

    empty = _iv(spark, [])
    assert sweep_concurrency(empty, "k", "start", "end").count() == 0

    rows = [
        (None, dt(2024, 1, 1, 0, 0), dt(2024, 1, 1, 0, 10)),
        (None, dt(2024, 1, 1, 0, 5), dt(2024, 1, 1, 0, 15)),
        ("a", dt(2024, 1, 1, 0, 0), dt(2024, 1, 1, 0, 1)),
    ]
    got = {r["k"]: r["peak"] for r in
           sweep_concurrency(_iv(spark, rows), "k", "start", "end").collect()}
    assert got == {None: 2, "a": 1}


def test_snapshot_diff_null_key_rows_classify_by_side(spark):
    from testlog_etl_spark.operators.diff import snapshot_diff

    old = _snap(spark, [(None, "A", 1.0), (1, "B", 2.0)])
    new = _snap(spark, [(1, "B", 2.0)])
    got = [(r["k"], r["op"]) for r in snapshot_diff(old, new, ["k"]).collect()]
    # the null-keyed old row is a DELETE (it exists only on the old
    # side), not a phantom insert
    assert got == [(None, "delete")]


def test_sweep_window_method_keeps_null_keys(spark):
    from datetime import datetime as dt

    from testlog_etl_spark.operators.timeseries import sweep_concurrency

    rows = [
        (None, dt(2024, 1, 1, 0, 0), dt(2024, 1, 1, 0, 10)),
        (None, dt(2024, 1, 1, 0, 5), dt(2024, 1, 1, 0, 15)),
    ]
    got = {r["k"]: r["peak"] for r in
           sweep_concurrency(_iv(spark, rows), "k", "start", "end", method="window").collect()}
    assert got == {None: 2}


def test_lindley_window_form_equals_sequential_fold(spark):
    # property pin for ts_capped_balance's floor-only path: the Lindley
    # restatement b = S - min(0, running_min(S)) must equal the
    # sequential clamp max(0, prev + d) on arbitrary delta sequences
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    x = 123456789
    rows = []
    for key in range(6):
        for i in range(40):
            x = (x * 48271) % 2147483647
            rows.append((key, i, ((x % 2001) - 1000) / 10.0))  # deltas in [-100, 100]
    df = spark.createDataFrame(rows, "k int, i int, d double")
    w = Window.partitionBy("k").orderBy("i").rowsBetween(Window.unboundedPreceding, 0)
    lin = (
        df.withColumn("S", F.sum("d").over(w))
        .withColumn("b", F.col("S") - F.least(F.lit(0.0), F.min("S").over(w)))
        .collect()
    )
    got = {(r["k"], r["i"]): r["b"] for r in lin}
    # sequential reference
    seqs: dict[int, float] = {}
    for key, i, d in rows:
        bal = max(0.0, seqs.get(key, 0.0) + d)
        seqs[key] = bal
        assert abs(got[(key, i)] - bal) < 1e-9, (key, i, got[(key, i)], bal)


# ---------------------------------------------------------------- scan


def test_global_rank_cumsum_matches_naive_window(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from testlog_etl_spark.operators.scan import global_rank_cumsum

    rows = [(i, float((i * 37) % 101)) for i in range(200)]
    df = spark.createDataFrame(rows, "id bigint, v double")
    got = global_rank_cumsum(
        df,
        [F.col("v").desc(), F.col("id").asc()],
        val_col="v",
        rank_out="i",
        cum_out="cum",
        n_out="n",
        total_out="tot",
        num_parts=7,
    )
    w = Window.orderBy(F.col("v").desc(), F.col("id").asc())
    ref = (
        df.withColumn("i", F.row_number().over(w))
        .withColumn("cum", F.sum("v").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    g = {r["id"]: (r["i"], round(r["cum"], 6), r["n"], round(r["tot"], 6)) for r in got.collect()}
    e = {r["id"]: (r["i"], round(r["cum"], 6)) for r in ref.collect()}
    tot = round(sum(v for _, v in rows), 6)
    assert len(g) == 200
    for k, (i, cum, n, t) in g.items():
        assert (i, cum) == e[k]
        assert n == 200 and t == tot


def test_global_rank_cumsum_empty_and_null_vals(spark):
    from pyspark.sql import functions as F

    from testlog_etl_spark.operators.scan import global_rank_cumsum

    empty = spark.createDataFrame([], "id bigint, v double")
    assert global_rank_cumsum(empty, [F.col("id").asc()], val_col="v").count() == 0
    # null values contribute 0 to the running sum, rows still ranked
    df = spark.createDataFrame([(1, None), (2, 5.0), (3, None)], "id bigint, v double")
    got = {r["id"]: (r["i"], r["cum"]) for r in
           global_rank_cumsum(df, [F.col("id").asc()], val_col="v", num_parts=2).collect()}
    assert got == {1: (1, 0.0), 2: (2, 5.0), 3: (3, 5.0)}


@pytest.mark.slow
def test_global_rank_inplan_matches_range_scan(spark):
    """r12: the in-plan bucketed rank (literal boundary/offset fold, one
    exchange, no Python) must agree with the range-shuffle scan it
    replaces on adversarial keys: ties, NULLs, NaNs, both directions,
    degenerate bucket counts (fewer and far more buckets than distinct
    keys)."""
    import random

    from pyspark.sql import functions as F

    from testlog_etl_spark.operators.scan import (
        global_rank_cumsum,
        global_rank_inplan,
    )

    random.seed(7)
    rows = []
    for i in range(800):
        v = random.choice([None, float("nan")] + [float(random.randint(0, 25))] * 18)
        rows.append((i, v, float(random.randint(0, 5))))
    df = spark.createDataFrame(rows, "id long, x double, t double")
    for desc in (False, True):
        for nbk in (2, 5, 64):
            order = [F.col("x").desc() if desc else F.col("x").asc(), F.col("id").asc()]
            old = global_rank_cumsum(
                df, order, val_col="t", rank_out="i", cum_out="c",
                n_out="n", total_out="tt",
            )
            new = global_rank_inplan(
                df, "x", tiebreak=("id",), descending=desc, val_col="t",
                rank_out="i", cum_out="c", n_out="n", total_out="tt",
                num_buckets=nbk,
            )
            assert old.dtypes == new.dtypes
            o = {r["id"]: (r["i"], r["c"], r["n"], r["tt"]) for r in old.collect()}
            nw = {r["id"]: (r["i"], r["c"], r["n"], r["tt"]) for r in new.collect()}
            assert o == nw, (desc, nbk)


def test_global_ranks_inplan_batch_matches_chained(spark):
    """The batched multi-spec form must equal chaining single calls."""
    from pyspark.sql import functions as F

    from testlog_etl_spark.operators.scan import (
        global_rank_inplan,
        global_ranks_inplan,
    )

    rows = [(i, float((i * 37) % 101), float((i * 13) % 17)) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, a double, b double")
    chained = global_rank_inplan(
        df, "a", tiebreak=("id",), descending=True, rank_out="ra", n_out="n",
        num_buckets=6,
    )
    chained = global_rank_inplan(
        chained, "b", tiebreak=("id",), rank_out="rb", num_buckets=6
    )
    batch = global_ranks_inplan(
        df,
        [
            {"key": "a", "tiebreak": ("id",), "descending": True,
             "rank_out": "ra", "n_out": "n"},
            {"key": "b", "tiebreak": ("id",), "rank_out": "rb"},
        ],
        num_buckets=6,
    )
    c = {r["id"]: (r["ra"], r["n"], r["rb"]) for r in chained.collect()}
    g = {r["id"]: (r["ra"], r["n"], r["rb"]) for r in batch.collect()}
    assert c == g


def test_global_ranks_inplan_fold_matches_default(spark):
    """r13: the single-exchange fold_key mode (explode to (metric,
    bucket) rows, one shared window, groupBy re-assembly) must be
    row-identical to the per-spec default on adversarial keys: ties,
    NULLs, NaNs, mixed directions, cumsums, degenerate bucket counts."""
    import random

    from testlog_etl_spark.operators.scan import global_ranks_inplan

    random.seed(13)
    rows = []
    for i in range(600):
        a = random.choice([None, float("nan")] + [float(random.randint(0, 20))] * 8)
        b = float(random.randint(0, 9))
        t = float(random.randint(0, 5))
        rows.append((i, a, b, t))
    df = spark.createDataFrame(rows, "id long, a double, b double, t double")
    specs = [
        {"key": "a", "tiebreak": ("id",), "descending": True, "rank_out": "ra",
         "n_out": "n"},
        {"key": "b", "tiebreak": ("id",), "rank_out": "rb", "val_col": "t",
         "cum_out": "cb", "total_out": "tt"},
        {"key": "b", "tiebreak": ("id",), "descending": True, "rank_out": "rbd"},
    ]
    cols = ("ra", "n", "rb", "cb", "tt", "rbd")
    for nbk in (3, 64):
        dflt = global_ranks_inplan(df, specs, num_buckets=nbk)
        fold = global_ranks_inplan(df, specs, num_buckets=nbk, fold_key="id")
        assert dflt.dtypes == fold.dtypes
        d = {r["id"]: tuple(r[c] for c in cols) for r in dflt.collect()}
        f = {r["id"]: tuple(r[c] for c in cols) for r in fold.collect()}
        assert d == f, nbk


def test_global_rank_inplan_rank_range_prunes_exactly(spark):
    """r13: rank_range bucket pruning must keep EVERY row whose rank
    falls in the page, with the identical rank values the unpruned
    operator assigns -- across ties, desc, and page positions that
    straddle bucket boundaries."""
    from pyspark.sql import functions as F

    from testlog_etl_spark.operators.scan import global_rank_inplan

    rows = [(i, float((i * 37) % 50)) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, v double")
    for desc in (False, True):
        full = global_rank_inplan(
            df, "v", tiebreak=("id",), descending=desc, rank_out="i", num_buckets=8
        )
        want = {r["id"]: r["i"] for r in full.collect() if 101 <= r["i"] <= 150}
        paged = global_rank_inplan(
            df, "v", tiebreak=("id",), descending=desc, rank_out="i",
            num_buckets=8, rank_range=(101, 150),
        )
        got = {r["id"]: r["i"] for r in paged.filter(F.col("i").between(101, 150)).collect()}
        assert got == want, desc
        # pruning must actually drop non-covering buckets' rows
        assert paged.count() < 1000
    # page beyond the data -> empty, not an error
    empty = global_rank_inplan(
        df, "v", tiebreak=("id",), rank_out="i", num_buckets=8,
        rank_range=(5000, 5100),
    )
    assert empty.count() == 0


def test_global_rank_cumsum_inplan_matches_range_scan(spark):
    """r13: the any-type in-plan rank (sampled struct boundaries, one
    hash exchange, zero Python) must agree with the range-shuffle scan
    on adversarial keys: non-ASCII strings, NULLs, ties, composite
    (string, double) orders, cumsums, degenerate bucket counts."""
    import random

    from pyspark.sql import functions as F

    from testlog_etl_spark.operators.scan import (
        global_rank_cumsum,
        global_rank_cumsum_inplan,
    )

    random.seed(29)
    words = ["alpha", "ALPHA", "Ωmega", "déjà", "zzz", "", " ", "naïve", "中文", "a'b"]
    rows = []
    for i in range(700):
        s = random.choice([None] + words * 2)
        x = random.choice([None, float("nan")] + [float(random.randint(0, 9))] * 8)
        rows.append((i, s, x, float(random.randint(0, 5))))
    df = spark.createDataFrame(rows, "id long, s string, x double, t double")
    order = [F.col("s").asc(), F.col("x").asc(), F.col("id").asc()]
    old = global_rank_cumsum(
        df, order, val_col="t", rank_out="i", cum_out="c", n_out="n", total_out="tt"
    )
    for nbk in (2, 5, 64):
        new = global_rank_cumsum_inplan(
            df, ["s", "x", "id"], val_col="t", rank_out="i", cum_out="c",
            n_out="n", total_out="tt", num_buckets=nbk,
        )
        assert old.dtypes == new.dtypes
        o = {r["id"]: (r["i"], r["c"], r["n"], r["tt"]) for r in old.collect()}
        nw = {r["id"]: (r["i"], r["c"], r["n"], r["tt"]) for r in new.collect()}
        assert o == nw, nbk


def test_global_rank_inplan_no_python_single_exchange(spark):
    """Plan pins for the r12 rank: no Python eval node anywhere, and the
    ranked output adds exactly ONE exchange over the (cached) input."""
    from pyspark.sql import functions as F

    from testlog_etl_spark.operators.scan import global_rank_inplan

    df = spark.createDataFrame(
        [(i, float(i % 9)) for i in range(500)], "id long, v double"
    )
    out = global_rank_inplan(df, "v", tiebreak=("id",), rank_out="i", num_buckets=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "MapInArrow" not in plan and "FlatMapGroupsInPandas" not in plan
    assert plan.count("Exchange") == 1, plan


def test_global_rank_cumsum_persist_handles(spark):
    from pyspark.sql import functions as F

    from testlog_etl_spark.operators.scan import global_rank_cumsum

    df = spark.createDataFrame([(i, float(i)) for i in range(10)], "id bigint, v double")
    handles = []
    out = global_rank_cumsum(df, [F.col("id").asc()], val_col="v", persist_handles=handles)
    assert out.count() == 10
    [h] = handles
    assert h.storageLevel.useMemory  # persisted while the plan is live
    h.unpersist(blocking=True)
    assert not h.storageLevel.useMemory


def test_global_running_max_inplan_matches_range_scan(spark):
    """r13: the in-plan bucketed cummax (sampled struct boundaries,
    literal prefix-max carries, one hash exchange, zero Python) must
    agree with the range-shuffle + Arrow scan on adversarial values:
    NULL/NaN/±inf values (the operator's documented missing-value
    quirk), NULL keys, ties, both inclusive and exclusive frames,
    degenerate bucket counts. Also pins the plan: no Python node, and
    exactly one added exchange."""
    import random

    from pyspark.sql import functions as F

    from testlog_etl_spark.operators.scan import (
        global_running_max,
        global_running_max_inplan,
    )

    random.seed(31)
    rows = []
    for i in range(700):
        k = random.choice([None, float("nan")] + [float(random.randint(0, 9))] * 8)
        v = random.choice(
            [None, float("nan"), float("inf"), float("-inf")]
            + [float(random.randint(-5, 5))] * 12
        )
        rows.append((i, k, v))
    df = spark.createDataFrame(rows, "id long, k double, v double")
    for exclusive in (False, True):
        old = global_running_max(
            df, [F.col("k").asc(), F.col("id").asc()], "v", out="m", exclusive=exclusive
        )
        o = {r["id"]: r["m"] for r in old.collect()}
        for nbk in (2, 5, 64):
            new = global_running_max_inplan(
                df, ["k", "id"], "v", out="m", exclusive=exclusive, num_buckets=nbk
            )
            nw = {r["id"]: r["m"] for r in new.collect()}
            assert o == nw, (exclusive, nbk)
    plan = new._jdf.queryExecution().executedPlan().toString()
    assert "MapInArrow" not in plan and "EvalPython" not in plan
