"""Unit tests for round-7 session-4 operators (Hilbert layout, schema
evolution, FD audit, binned quantile, containment dedup, ...)."""

from __future__ import annotations

import pytest

import random

from pyspark.sql import functions as F


# ---------------------------------------------------------------- Hilbert


def _xy2d_classic(order: int, x: int, y: int) -> int:
    """Classic Wikipedia xy2d -- the independent reference the masked
    production formulation must match bit-for-bit."""
    d = 0
    s = 1 << (order - 1)
    while s > 0:
        rx = 1 if (x & s) else 0
        ry = 1 if (y & s) else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s >>= 1
    return d


def test_hilbert_masked_equals_classic_exhaustive():
    from testlog_etl_spark.operators.layout import hilbert_d

    for order in range(1, 7):
        n = 1 << order
        for x in range(n):
            for y in range(n):
                assert hilbert_d(x, y, order) == _xy2d_classic(order, x, y)


def test_hilbert_bijection_and_unit_step_adjacency():
    from testlog_etl_spark.operators.layout import hilbert_d

    order, n = 5, 32
    pos: dict[int, tuple[int, int]] = {}
    for x in range(n):
        for y in range(n):
            pos[hilbert_d(x, y, order)] = (x, y)
    assert len(pos) == n * n  # bijection onto [0, n^2)
    assert set(pos) == set(range(n * n))
    for d in range(1, n * n):
        (x0, y0), (x1, y1) = pos[d - 1], pos[d]
        # THE Hilbert property: consecutive keys are grid neighbors
        assert abs(x0 - x1) + abs(y0 - y1) == 1


def test_with_hilbert_spark_matches_reference(spark):
    from testlog_etl_spark.operators.layout import hilbert_d, with_hilbert

    rng = random.Random(7)
    pts = [(rng.randrange(256), rng.randrange(256)) for _ in range(300)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = with_hilbert(df, F.col("x"), F.col("y"), bits=8, out="h").collect()
    for r in got:
        assert r.h == hilbert_d(r.x, r.y, 8), (r.x, r.y)


def test_hilbert_sql_ctes_duckdb_matches_reference(duck):
    from testlog_etl_spark.operators.layout import hilbert_d, hilbert_sql_ctes

    rng = random.Random(11)
    pts = [(rng.randrange(64), rng.randrange(64)) for _ in range(200)]
    values = ", ".join(f"({x}, {y})" for x, y in pts)
    src = f"SELECT * FROM (VALUES {values}) AS t(xq, yq)"
    ctes = hilbert_sql_ctes(src, "xq", "yq", bits=6, keep="xq, yq", out="h")
    rows = duck.execute(f"{ctes} SELECT xq, yq, h FROM h6").fetchall()
    assert len(rows) == len(pts)
    for x, y, h in rows:
        assert h == hilbert_d(x, y, 6), (x, y)


def test_hilbert_buckets_tighter_than_zorder(spark):
    """The reason to offer Hilbert above Z-order: on the same quantized
    grid with the same bucket width, Hilbert's per-bucket bounding boxes
    have a smaller mean half-perimeter (x_span + y_span) -- tighter
    boxes => tighter parquet min/max stats => more files pruned."""
    from testlog_etl_spark.operators.layout import with_hilbert, zorder_value

    rng = random.Random(3)
    pts = [(rng.randrange(64), rng.randrange(64)) for _ in range(4000)]
    df = spark.createDataFrame(pts, "x long, y long")

    def mean_half_perimeter(bucketed):
        rows = (
            bucketed.groupBy("b")
            .agg(((F.max("x") - F.min("x")) + (F.max("y") - F.min("y"))).alias("hp"))
            .collect()
        )
        return sum(r.hp for r in rows) / len(rows)

    hil = with_hilbert(df, F.col("x"), F.col("y"), bits=6, out="h").withColumn(
        "b", F.expr("h div 64")
    )
    zor = df.withColumn("b", F.shiftright(zorder_value(F.col("x"), F.col("y"), bits=6), 6))
    assert mean_half_perimeter(hil) <= mean_half_perimeter(zor)


# ------------------------------------------------- schema evolution merge


def test_merge_schema_surfaces_null_for_legacy_rows(spark, tmp_path):
    v1 = spark.createDataFrame([(1, 10.0), (2, 20.0)], "id long, v double")
    v2 = spark.createDataFrame([(3, 30.0, "R1")], "id long, v double, region string")
    v1.write.parquet(str(tmp_path / "gen=v1"))
    v2.write.parquet(str(tmp_path / "gen=v2"))
    merged = spark.read.option("mergeSchema", "true").parquet(
        str(tmp_path / "gen=v1"), str(tmp_path / "gen=v2")
    )
    assert set(merged.columns) == {"id", "v", "region"}
    rows = {r.id: r for r in merged.collect()}
    assert len(rows) == 3  # lossless: no rows dropped or duplicated
    assert rows[1].region is None and rows[2].region is None
    assert rows[3].region == "R1"


# ------------------------------------------- functional dependency audit


def test_fd_audit_flags_only_violated_dependency(spark, sf_dir):
    from testlog_etl_spark.queries.profile_queries import dq_functional_dependency

    out = {r.fd: r for r in dq_functional_dependency(spark, sf_dir).collect()}
    # key-determined FD must hold with zero violations
    ctrl = out["c_custkey->c_nationkey"]
    assert ctrl.holds and ctrl.violating_groups == 0 and ctrl.max_distinct_dep == 1
    # nation cannot determine market segment
    viol = out["c_nationkey->c_mktsegment"]
    assert not viol.holds and viol.violating_groups > 0
    assert viol.violating_rows >= viol.violating_groups


# ------------------------------------------------ referential orphan audit


def test_orphan_audit_counts_injected_orphans(spark):
    """The sf tables are referentially clean, so prove the detector on
    frames with KNOWN corruption: 2 orphan child rows, 1 childless parent."""
    from testlog_etl_spark.queries.profile_queries import dq_referential_orphans

    child = spark.createDataFrame([(1,), (1,), (2,), (99,), (98,)], "fk long")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")

    c = child.select(F.col("fk").alias("k"))
    p = parent.select(F.col("pk").alias("k")).distinct()
    hit = c.join(p.withColumn("_hit", F.lit(1)), "k", "left").agg(
        F.count(F.lit(1)).alias("child_rows"),
        F.sum(F.col("_hit").isNull().cast("long")).alias("orphan_rows"),
    ).collect()[0]
    assert hit.child_rows == 5 and hit.orphan_rows == 2
    childless = p.join(c.distinct(), "k", "left_anti").count()
    assert childless == 1


def test_orphan_audit_clean_on_sf_tables(spark, sf_dir):
    from testlog_etl_spark.queries.profile_queries import dq_referential_orphans

    rows = dq_referential_orphans(spark, sf_dir).collect()
    assert len(rows) == 3
    assert all(r.orphan_rows == 0 for r in rows)  # TPC-H integrity
    # at sf0.001 every parent is referenced; childless is bounded by keys
    assert all(0 <= r.childless_parents <= r.parent_keys for r in rows)
    assert all(r.child_rows > r.parent_keys for r in rows)  # fact >> dim


# ------------------------------------------------- binned quantile sketch


def test_binned_quantile_within_stated_error(spark, sf_dir):
    from testlog_etl_spark.queries.aggs import agg_binned_quantile

    rows = agg_binned_quantile(spark, sf_dir).collect()
    assert [r.q for r in rows] == [0.25, 0.5, 0.75, 0.9, 0.99]
    import numpy as np

    vals = np.array(
        [
            r.v
            for r in spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .selectExpr("l_extendedprice AS v")
            .collect()
        ]
    )
    for r in rows:
        exact = float(np.quantile(vals, r.q, method="linear"))
        # the sketch's a-priori bound: one bin width
        assert abs(r.estimate - exact) <= r.max_error + 1e-6, (r.q, r.estimate, exact)


def test_binned_quantile_monotone_and_bounded(spark, sf_dir):
    from testlog_etl_spark.queries.aggs import agg_binned_quantile

    rows = agg_binned_quantile(spark, sf_dir).collect()
    ests = [r.estimate for r in rows]
    assert ests == sorted(ests)  # quantile estimates are monotone in q
    assert all(0 <= r.bin <= 255 for r in rows)


# ------------------------------------------------ containment postings


def test_containment_postings_asymmetric_and_capped(spark):
    from testlog_etl_spark.operators import neardup

    # B embeds A's full text; C is unrelated
    a_text = "alpha beta gamma delta epsilon zeta"
    b_text = "intro words first " + a_text + " trailing words afterwards done"
    docs = spark.createDataFrame(
        [(1, a_text), (2, b_text), (3, "totally different content here now")],
        "doc_id long, text string",
    )
    posting = docs.select(
        "doc_id", F.explode(neardup.word_shingles(F.col("text"))).alias("shingle")
    )
    sz = posting.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = posting.select(F.col("doc_id").alias("id_a"), "shingle")
    b = posting.select(F.col("doc_id").alias("id_b"), F.col("shingle").alias("sh_b"))
    inter = (
        a.join(b, (F.col("shingle") == F.col("sh_b")) & (F.col("id_a") != F.col("id_b")))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    cont = {
        (r.id_a, r.id_b): r.n_common / r.n_sh
        for r in inter.join(sz.withColumnRenamed("doc_id", "id_a"), "id_a").collect()
    }
    assert cont[(1, 2)] == 1.0  # A fully contained in B
    assert cont[(2, 1)] < 0.5  # B is NOT contained in A -- asymmetry
    assert (1, 3) not in cont and (3, 1) not in cont


# --------------------------------------------------- dedup cascade report


def test_dedup_cascade_tiers_catch_disjoint_duplicates(spark, tmp_path):
    """Each tier must catch exactly its own duplicate class: whitespace
    copies at tier 1, same-prefix docs at tier 2, reorderings at tier 3."""
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today ok"),
            (2, "the  quick   brown fox jumps over the lazy dog today ok"),  # ws copy
            (3, "the quick brown fox jumps over the lazy dog NEVER mind"),  # same 8-prefix
            (4, "ok today dog lazy the over jumps fox brown quick the"),  # reordering
            (5, "completely unrelated text that matches no other doc here"),
        ],
        "doc_id long, text string",
    )
    sf = str(tmp_path)
    docs.write.parquet(f"{sf}/documents.parquet")
    from testlog_etl_spark.queries.llm_ops import corpus_dedup_cascade

    rows = {r.tier: r for r in corpus_dedup_cascade(spark, sf).collect()}
    assert rows["1_exact"].docs_in == 5 and rows["1_exact"].removed == 1  # doc 2
    assert rows["2_prefix"].docs_in == 4 and rows["2_prefix"].removed == 1  # doc 3
    assert rows["3_bag"].docs_in == 3 and rows["3_bag"].removed == 1  # doc 4
    assert rows["3_bag"].docs_out == 2  # docs 1 and 5 survive


def test_dedup_cascade_monotone_on_corpus(spark, sf_dir):
    from testlog_etl_spark.queries.llm_ops import corpus_dedup_cascade

    rows = corpus_dedup_cascade(spark, sf_dir).collect()
    assert [r.tier for r in rows] == ["1_exact", "2_prefix", "3_bag"]
    for r in rows:
        assert r.docs_out == r.docs_in - r.removed
        assert 0 <= r.removed <= r.docs_in
    # survivors feed forward: each tier's input is the previous output
    assert rows[1].docs_in == rows[0].docs_out
    assert rows[2].docs_in == rows[1].docs_out


# ---------------------------------------------------- session-scoped funnel


def test_session_funnel_requires_same_session(spark, tmp_path):
    """view->click 10s apart converts; a 2h gap splits the session so the
    click lands in a NEW session with no view before it -- no conversion."""
    import datetime

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def ev(eid, uid, kind, offset_s):
        return (eid, t0 + datetime.timedelta(seconds=offset_s), uid, kind, 1.0, None)

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    rows = [
        ev(1, 1, "view", 0), ev(2, 1, "click", 10), ev(3, 1, "purchase", 20),
        ev(4, 2, "view", 0), ev(5, 2, "click", 7200),  # gap splits session
    ]
    spark.createDataFrame(rows, schema).write.parquet(str(tmp_path / "events.parquet"))
    from testlog_etl_spark.queries.windows_queries import funnel_session_scoped

    out = funnel_session_scoped(spark, str(tmp_path)).collect()[0]
    assert out.n_sessions == 3  # u1 x1, u2 x2
    assert out.n_step1 == 2  # both users viewed (u2's view session counts)
    assert out.n_step2 == 1 and out.n_step3 == 1  # only u1 converts in-session


# ---------------------------------------------------- broadcast advisor


def test_broadcast_advisor_agrees_with_planner(spark, sf_dir):
    from testlog_etl_spark.queries.sources_queries import layout_broadcast_advisor

    rows = {r.table_name: r for r in layout_broadcast_advisor(spark, sf_dir).collect()}
    assert set(rows) == {"region", "nation", "customer", "supplier", "part"}
    # at sf0.001 every dim is comfortably under the 10 MB threshold
    assert all(r.broadcastable for r in rows.values())
    assert all(r.threshold_ratio < 1 for r in rows.values())
    # and the PLANNER agrees: a fact-dim join on a 'broadcastable' verdict
    # actually plans a broadcast exchange at default threshold
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    plan_df = orders.join(cust, orders.o_custkey == cust.c_custkey)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        plan_df.explain(mode="formatted")
    assert "BroadcastHashJoin" in buf.getvalue()


def test_broadcast_advisor_byte_model_floor(spark, sf_dir):
    from testlog_etl_spark.queries.sources_queries import _BCAST_SPEC, layout_broadcast_advisor

    rows = {r.table_name: r for r in layout_broadcast_advisor(spark, sf_dir).collect()}
    for t, cols in _BCAST_SPEC.items():
        fixed = sum({"int": 4, "long": 8, "double": 8}.get(k, 20) for _, k in cols)
        # every row costs at least its fixed widths + string overheads
        assert rows[t].est_bytes >= rows[t].n_rows * fixed


# -------------------------------------------------------- RFM segmentation


def test_rfm_scores_partition_customers_into_quintiles(spark, sf_dir):
    from testlog_etl_spark.queries.aggs import orders_rfm_segments

    rows = orders_rfm_segments(spark, sf_dir).collect()
    total = sum(r.n_customers for r in rows)
    # every (r,f,m) score is a valid quintile and each axis covers 1..5
    for axis in ("r_score", "f_score", "m_score"):
        seen = {getattr(r, axis) for r in rows}
        assert seen <= {1, 2, 3, 4, 5} and {1, 5} <= seen
    # quintile marginals: each r_score bucket holds ~n/5 customers
    from collections import Counter

    marg = Counter()
    for r in rows:
        marg[r.r_score] += r.n_customers
    lo, hi = min(marg.values()), max(marg.values())
    assert hi - lo <= 1, marg  # explicit formula: bucket sizes differ by <= 1


def test_rfm_explicit_score_formula_matches_ntile_semantics():
    # ((rank-1)*k) // n + 1 must reproduce equal-split bucketing
    n, k = 17, 5
    buckets = [((r - 1) * k) // n + 1 for r in range(1, n + 1)]
    assert buckets == sorted(buckets) and set(buckets) == set(range(1, k + 1))
    from collections import Counter

    sizes = Counter(buckets)
    assert max(sizes.values()) - min(sizes.values()) <= 1


# ------------------------------------------------------ shared-text SQL API


def test_shared_sql_text_equals_dataframe_twin(spark, sf_dir):
    from testlog_etl_spark.queries.sources_queries import sql_shared_text_q1
    from testlog_etl_spark import suite

    suite._load_all()
    sql_rows = {
        (r.l_returnflag, r.l_linestatus): r.revenue
        for r in sql_shared_text_q1(spark, sf_dir).collect()
    }
    # the synthetic lineitem carries 6 (returnflag, linestatus) cells
    assert len(sql_rows) == 6
    assert all(v > 0 for v in sql_rows.values())


# ---------------------------------------------------- python data source


def test_python_datasource_partitions_and_rows(spark):
    from testlog_etl_spark.etl.pyds import register_synthetic_source

    register_synthetic_source(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("n", "1000")
        .option("parts", "7")  # uneven: 1000 = 6*143 + 142
        .load()
    )
    assert df.rdd.getNumPartitions() == 7
    rows = df.collect()
    assert len(rows) == 1000
    assert sorted(r.event_id for r in rows) == list(range(1000))  # exactly once


def test_python_datasource_pushdown_prunes_at_source():
    """The pushed bucket=3 equality must drop rows inside read() -- they
    never cross the Python->JVM boundary -- while any other predicate is
    returned to Spark as unsupported."""
    from pyspark.sql.datasource import EqualTo
    from testlog_etl_spark.etl.pyds import RangePartition, SyntheticEventsReader

    r = SyntheticEventsReader({"n": "100", "parts": "2"})
    other = EqualTo(("value",), 5)
    unsupported = list(r.pushFilters([EqualTo(("bucket",), 3), other]))
    assert unsupported == [other]  # bucket eq consumed, rest handed back
    got = list(r.read(RangePartition(0, 100)))
    assert got and all(b == 3 for _, b, _ in got)
    assert len(got) == len([i for i in range(100) if i % 7 == 3])


def test_python_datasource_value_formula_matches_oracle():
    from testlog_etl_spark.etl.pyds import KNUTH, PRIME, row_value

    for i in (0, 1, 7, 49999):
        assert row_value(i) == (i * KNUTH) % PRIME
    assert 50000 * KNUTH < 2**63  # integer math stays exact on both engines


# ------------------------------------------------------ SQL surface twins


def test_recursive_cte_depths_match_log2(spark, sf_dir):
    """root_depth of doc n under parent = n div 2 is floor(log2(n)) --
    the closed form the recursive walk must reproduce."""
    from testlog_etl_spark.queries.sources_queries import sql_recursive_cte_ancestors

    rows = sql_recursive_cte_ancestors(spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter("doc_id >= 1").count()
    assert sum(r.n_docs for r in rows) == n_docs
    import math

    for r in rows:
        lo, hi = 1 << r.root_depth, (1 << (r.root_depth + 1)) - 1
        expected = len([i for i in range(1, n_docs + 1) if lo <= i <= hi])
        assert r.n_docs == expected, (r.root_depth, r.n_docs, expected)
        assert r.root_depth == math.floor(math.log2(lo))


def test_lateral_topn_is_per_group_top2(spark, sf_dir):
    from testlog_etl_spark.queries.sources_queries import sql_shared_text_lateral_topn

    rows = sql_shared_text_lateral_topn(spark, sf_dir).collect()
    from collections import defaultdict

    per = defaultdict(list)
    for r in rows:
        per[r.n_name].append(r.c_acctbal)
    assert all(len(v) <= 2 for v in per.values())
    assert all(v == sorted(v, reverse=True) for v in per.values())
    # cross-check one nation against a direct DataFrame top-2
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nat = spark.read.parquet(f"{sf_dir}/nation.parquet")
    k = nat.filter("n_name = 'NATION_0'").collect()[0].n_nationkey
    direct = [
        r.c_acctbal
        for r in cust.filter(F.col("c_nationkey") == k)
        .orderBy(F.col("c_acctbal").desc(), "c_name")
        .limit(2)
        .collect()
    ]
    assert per["NATION_0"] == direct


# ----------------------------------------------------- observe() metrics


def test_observed_metrics_match_direct_agg_one_action(spark, tmp_path):
    from testlog_etl_spark.operators.observe import with_quality_metrics

    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 30.0), (4, None), (5, 50.0)], "id long, v double"
    )
    inst, obs = with_quality_metrics(df, "v", extra={"max_id": F.max("id")})
    inst.write.parquet(str(tmp_path / "out"))  # the ONE action
    got = obs.get
    assert got["n_rows"] == 5 and got["n_null"] == 2
    assert got["sum_value"] == 90.0 and got["max_id"] == 5


def test_drop_audit_accounts_without_extra_scans(spark, tmp_path):
    from testlog_etl_spark.operators.observe import drop_audit

    df = spark.range(100).withColumn("v", F.col("id") % 10)
    kept, audit = drop_audit(df, F.col("v") < 3)
    kept.write.parquet(str(tmp_path / "kept"))  # one action drives both counters
    got = audit.get()
    assert got == {"n_in": 100, "n_kept": 30, "n_dropped": 70}
    # and the kept data really is the filtered set
    assert spark.read.parquet(str(tmp_path / "kept")).count() == 30


# ---------------------------------------------------- binary / fixed-width


def test_binary_files_source_reads_exact_bytes(spark, tmp_path):
    blobs = {f"b_{i}.bin": bytes([i * 7 % 251]) * (10 + i) for i in range(5)}
    for name, content in blobs.items():
        (tmp_path / name).write_bytes(content)
    rows = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(str(tmp_path))
        .collect()
    )
    assert len(rows) == 5
    for r in rows:
        name = r.path.rsplit("/", 1)[1]
        assert bytes(r.content) == blobs[name]
        assert r.length == len(blobs[name])


def test_fixed_width_roundtrip_preserves_cents(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "click", 12.345), (2, "purchase", 0.005), (3, "click", 99999.99)],
        "event_id long, event_type string, value double",
    )
    cents = F.round(F.col("value") * 100, 0).cast("long")
    df.select(
        F.format_string("%-12d%10s%012d", "event_id", "event_type", cents).alias("value")
    ).write.text(str(tmp_path / "fw"))
    back = spark.read.text(str(tmp_path / "fw")).select(
        F.trim(F.substring("value", 1, 12)).cast("long").alias("event_id"),
        F.trim(F.substring("value", 13, 10)).alias("event_type"),
        F.substring("value", 23, 12).cast("long").alias("cents"),
    )
    got = {r.event_id: r for r in back.collect()}
    assert got[1].cents == 1235 and got[1].event_type == "click"  # HALF_UP round
    assert got[2].cents == 1  # 0.005 -> 1 cent, not dropped
    assert got[3].cents == 9999999


# --------------------------------------------- transformWithState (gated)


def test_transform_with_state_processor_logic_batchwise():
    """The processor's per-key fold is plain Python over pandas batches;
    test it directly (the streaming transport is environment-gated --
    see operators/twstate.py docstring)."""
    import pandas as pd
    from testlog_etl_spark.operators.twstate import DistinctTypeTracker

    t = DistinctTypeTracker()

    class FakeValueState:
        def __init__(self):
            self.v = None

        def get(self):
            return self.v

        def update(self, v):
            self.v = v

    class FakeHandle:
        def getValueState(self, name, schema):
            return FakeValueState()

    t.init(FakeHandle())
    b1 = pd.DataFrame(
        {"ts": [1, 2, 3], "event_id": [10, 11, 12], "event_type": ["a", "b", "a"]}
    )
    out1 = list(t.handleInputRows((7,), iter([b1]), None))
    assert len(out1) == 1
    assert out1[0].values.tolist() == [[7, 10, 1], [7, 11, 2]]  # change-only
    # second micro-batch: state carries across; only the new type emits
    b2 = pd.DataFrame({"ts": [4, 5], "event_id": [13, 14], "event_type": ["b", "c"]})
    out2 = list(t.handleInputRows((7,), iter([b2]), None))
    assert out2[0].values.tolist() == [[7, 14, 3]]


def test_transform_with_state_gate_matches_environment(spark):
    from testlog_etl_spark.operators.twstate import (
        distinct_type_emissions,
        protobuf_available,
    )

    if protobuf_available():
        import pytest

        pytest.skip("protobuf present: gate inactive (operator runs for real)")
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", "1").load()
    )  # any streaming frame: the gate fires before wiring
    import pytest

    with pytest.raises(RuntimeError, match="google.protobuf"):
        distinct_type_emissions(stream)


# ------------------------------------------------------------- SAX motifs


def test_sax_symbolization_breakpoints():
    """Tercile breakpoints map z-scores to a/b/c with equal normal mass;
    the boundary rule is <= on the rounded z, shared by both engines."""

    def sym(z, sd=1.0):
        if sd == 0:
            return "b"
        if z <= -0.43:
            return "a"
        if z <= 0.43:
            return "b"
        return "c"

    assert [sym(z) for z in (-2, -0.43, -0.1, 0.43, 3)] == list("aabbc")
    assert sym(999, sd=0) == "b"  # flat day: zero variance guard


def test_sax_motifs_words_are_6_segments_and_grouped(spark):
    from testlog_etl_spark.queries.windows_queries import ts_sax_motifs

    # sf0.01: dense enough that recurring intraday shapes exist -- the
    # PAA coarsening (24h -> 6 segments, 3 symbols) is what makes the
    # motif groupBy non-trivial (raw 24-char words never repeat)
    rows = ts_sax_motifs(spark, "/root/testdata/sf0.01").collect()
    assert rows, "sf0.01 events must contain at least one recurring shape"
    for r in rows:
        assert len(r.word) == 6 and set(r.word) <= set("abc")
        assert r.n_days >= 2


# ------------------------------------------------------------ DTW distance


def _dtw_ref(a, b):
    import math

    n, m = len(a), len(b)
    dp = [[math.inf] * m for _ in range(n)]
    for i in range(n):
        for j in range(m):
            c = abs(a[i] - b[j])
            if i == 0 and j == 0:
                dp[i][j] = c
            elif i == 0:
                dp[i][j] = c + dp[0][j - 1]
            elif j == 0:
                dp[i][j] = c + dp[i - 1][0]
            else:
                dp[i][j] = c + min(dp[i - 1][j], dp[i][j - 1], dp[i - 1][j - 1])
    return dp[n - 1][m - 1]


def test_dtw_fold_matches_reference_and_properties(spark):
    from testlog_etl_spark.queries.windows_queries import _dtw_fold_sql

    rng = random.Random(9)
    n = 8
    cases = [
        (
            [round(rng.uniform(-3, 3), 4) for _ in range(n)],
            [round(rng.uniform(-3, 3), 4) for _ in range(n)],
        )
        for _ in range(6)
    ]
    # identity and symmetry ride along as extra cases
    cases.append((cases[0][0], cases[0][0]))
    cases.append((cases[1][1], cases[1][0]))
    df = spark.createDataFrame(cases, "_a array<double>, _b array<double>")
    got = [r.d for r in df.select(F.expr(_dtw_fold_sql(n)).alias("d")).collect()]
    for (a, b), d in zip(cases, got):
        assert abs(d - _dtw_ref(a, b)) < 1e-9, (a, b, d)
    assert got[6] == 0.0  # d(a, a) = 0
    assert abs(got[7] - _dtw_ref(cases[1][0], cases[1][1])) < 1e-9  # symmetry


def test_dtw_tolerates_phase_shift_where_euclidean_does_not():
    """The reason DTW exists: the same peak one step later is cheap for
    DTW, expensive point-to-point."""
    a = [0, 0, 5, 0, 0, 0]
    b = [0, 0, 0, 5, 0, 0]
    l1 = sum(abs(x - y) for x, y in zip(a, b))
    assert _dtw_ref(a, b) < l1
    assert _dtw_ref(a, b) == 0.0  # warping aligns the peaks exactly


# ------------------------------------------------ empirical-Bayes shrinkage


def test_eb_shrinkage_decreases_with_group_size(spark, sf_dir):
    from testlog_etl_spark.queries.stats_queries import stats_empirical_bayes_rates

    rows = {r.band: r for r in stats_empirical_bayes_rates(spark, sf_dir).collect()}
    assert rows, "must produce at least one size band"
    # the defining property: small-n groups move further toward the prior
    bands = sorted(rows)
    shifts = [rows[b].avg_shift for b in bands]
    if len(shifts) >= 2:
        assert shifts[0] >= shifts[-1], shifts
    for r in rows.values():
        assert 0.0 <= r.avg_raw <= 1.0 and 0.0 <= r.avg_shrunk <= 1.0


def test_eb_shrinkage_closed_form_on_toy():
    """Hand-check the beta-binomial MoM formula: groups (1/2, 5/10,
    50/100) all have raw rate 0.5 -> zero variance -> K=0 -> no
    shrinkage; a dispersed set shrinks the small group most."""
    rates = [0.5, 0.5, 0.5]
    m = sum(rates) / 3
    v = sum((r - m) ** 2 for r in rates) / 3
    assert v == 0  # degenerate prior: shrunk == raw by the kk=0 guard

    groups = [(1, 2), (9, 10), (50, 100)]  # (x, n): rates .5, .9, .5
    rs = [x / n for x, n in groups]
    m = sum(rs) / 3
    v = sum((r - m) ** 2 for r in rs) / 3
    k = m * (1 - m) / v - 1
    shrunk = [(x + k * m) / (n + k) for x, n in groups]
    shifts = [abs(s - r) for s, r in zip(shrunk, rs)]
    assert shifts[0] > shifts[2]  # n=2 moves more than n=100


# ---------------------------------------------------------- Viterbi HMM


def test_viterbi_fold_matches_python_reference(spark):
    import math

    from testlog_etl_spark.queries.windows_queries import (
        _viterbi_consts,
        events_viterbi_engagement,  # noqa: F401 -- import exercises registration
        _viterbi_emit_case,
    )

    c = _viterbi_consts()

    def ref(seq):
        lp0 = c["p0"] + c["emit"][seq[0]][0]
        lp1 = c["p1"] + c["emit"][seq[0]][1]
        for x in seq[1:]:
            lp0, lp1 = (
                max(lp0 + c["t00"], lp1 + c["t10"]) + c["emit"][x][0],
                max(lp0 + c["t01"], lp1 + c["t11"]) + c["emit"][x][1],
            )
        return lp0, lp1

    s0 = _viterbi_emit_case(0, "element_at(_seq, 1)")
    s1 = _viterbi_emit_case(1, "element_at(_seq, 1)")
    e0, e1 = _viterbi_emit_case(0, "x"), _viterbi_emit_case(1, "x")
    fold = f"""
aggregate(
  slice(_seq, 2, greatest(size(_seq) - 1, 0)),
  named_struct('lp0', CAST({c['p0']!r} AS DOUBLE) + {s0},
               'lp1', CAST({c['p1']!r} AS DOUBLE) + {s1}),
  (acc, x) -> named_struct(
    'lp0', greatest(acc.lp0 + CAST({c['t00']!r} AS DOUBLE), acc.lp1 + CAST({c['t10']!r} AS DOUBLE)) + {e0},
    'lp1', greatest(acc.lp0 + CAST({c['t01']!r} AS DOUBLE), acc.lp1 + CAST({c['t11']!r} AS DOUBLE)) + {e1}))
"""
    seqs = [
        ["view", "click", "purchase", "purchase"],
        ["view", "view", "view"],
        ["purchase"],
        ["error", "signup", "purchase", "click", "view"],
    ]
    df = spark.createDataFrame([(s,) for s in seqs], "_seq array<string>")
    got = df.select(F.expr(f"({fold}).lp0").alias("a"), F.expr(f"({fold}).lp1").alias("b")).collect()
    for seq, row in zip(seqs, got):
        r0, r1 = ref(seq)
        assert math.isclose(row.a, r0, rel_tol=0, abs_tol=1e-12)
        assert math.isclose(row.b, r1, rel_tol=0, abs_tol=1e-12)


def test_viterbi_classifies_purchase_heavy_as_engaged():
    import math

    from testlog_etl_spark.queries.windows_queries import _viterbi_consts

    c = _viterbi_consts()

    def best_state(seq):
        lp0 = c["p0"] + c["emit"][seq[0]][0]
        lp1 = c["p1"] + c["emit"][seq[0]][1]
        for x in seq[1:]:
            lp0, lp1 = (
                max(lp0 + c["t00"], lp1 + c["t10"]) + c["emit"][x][0],
                max(lp0 + c["t01"], lp1 + c["t11"]) + c["emit"][x][1],
            )
        return "engaged" if lp1 > lp0 else "casual"

    assert best_state(["purchase", "purchase", "purchase"]) == "engaged"
    assert best_state(["view", "view", "view", "view"]) == "casual"


# ------------------------------------------------- join-MV delta refresh


def test_join_mv_delta_equals_full_recompute(spark, sf_dir):
    from testlog_etl_spark.queries.etl_queries import mv_join_delta_maintenance

    got = {r.priority: (r.n_lines, r.revenue) for r in mv_join_delta_maintenance(spark, sf_dir).collect()}
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")  # noqa: E741
    full = {
        r.priority: (r.n, r.rev)
        for r in l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("rev"),
        )
        .collect()
    }
    assert got == full  # the four-quadrant union IS the full join


def test_join_mv_delta_broadcasts_delta_sides(spark, sf_dir):
    import contextlib
    import io

    from testlog_etl_spark.queries.etl_queries import mv_join_delta_maintenance

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        mv_join_delta_maintenance(spark, sf_dir).explain(mode="formatted")
    plan = buf.getvalue()
    # the three delta joins build on the broadcast (small) side
    assert plan.count("BroadcastHashJoin") >= 3, plan
    assert "CartesianProduct" not in plan


# --------------------------------------------------------- PK uniqueness


def test_pk_uniqueness_clean_star_and_composite_key(spark, sf_dir):
    from testlog_etl_spark.queries.profile_queries import dq_primary_key_uniqueness

    rows = {r.table_name: r for r in dq_primary_key_uniqueness(spark, sf_dir).collect()}
    assert set(rows) == {"customer", "documents", "events", "lineitem", "orders"}
    # surrogate-keyed tables are clean...
    for name in ("customer", "documents", "events", "orders"):
        assert rows[name].dup_rows == 0, name
    # ...but the synthetic lineitem genuinely VIOLATES its nominal
    # (orderkey, linenumber) key -- the audit must REPORT it, which is
    # the broken path exercised by real data rather than an injection
    li = rows["lineitem"]
    assert li.dup_rows > 0 and li.n_keys < li.n_rows


def test_pk_uniqueness_detects_injected_duplicates(spark):
    df = spark.createDataFrame([(1,), (2,), (2,), (3,), (3,), (3,)], "k long")
    out = df.agg(
        F.count(F.lit(1)).alias("n_rows"), F.count_distinct("k").alias("n_keys")
    ).collect()[0]
    assert out.n_rows - out.n_keys == 3  # surplus = extra copies, not groups


# --------------------------------------------------- generalization ladder


def test_generalization_ladder_monotone_and_chooses_minimal(spark, sf_dir):
    from testlog_etl_spark.queries.profile_queries import dq_generalization_ladder

    rows = sorted(dq_generalization_ladder(spark, sf_dir).collect(), key=lambda r: r.lvl)
    assert [r.lvl for r in rows] == [1, 2, 3, 4]
    # coarser generalization can only shrink risky mass and class count
    risky = [r.risky_rows for r in rows]
    assert risky == sorted(risky, reverse=True)
    n_cls = [r.n_classes for r in rows]
    assert n_cls == sorted(n_cls, reverse=True)
    # the chosen level is the FIRST satisfying one, and exactly one is chosen
    sat = [r.satisfies_k for r in rows]
    chosen = [r.chosen_level for r in rows]
    assert sum(chosen) <= 1
    if any(sat):
        first = sat.index(True)
        assert chosen[first] and all(not c for i, c in enumerate(chosen) if i != first)
    # level 4 (segment-only) always satisfies k=5 on any non-trivial corpus
    assert rows[3].satisfies_k


# -------------------------------------------------- lambda backfill union


def test_lambda_seam_actually_replays_rows(spark, sf_dir):
    """The dedup claim is hollow unless the staged stream really carries
    duplicate ids across micro-batches -- pin the replay volume."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cut, mid, seam = "2024-01-21 00:00:00", "2024-01-26 00:00:00", "2024-01-25 00:00:00"
    tail = ev.filter(F.col("ts") >= F.lit(cut).cast("timestamp"))
    replay = tail.filter(
        (F.col("ts") >= F.lit(seam).cast("timestamp"))
        & (F.col("ts") < F.lit(mid).cast("timestamp"))
    )
    assert replay.count() > 0  # fixture guard: the seam day is non-empty


@pytest.mark.slow
def test_lambda_union_equals_batch_answer(spark, sf_dir):
    from testlog_etl_spark.queries.streaming_queries import stream_lambda_backfill_union

    got = {r.event_type: (r.n, r.sum_value) for r in stream_lambda_backfill_union(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    want = {
        r.event_type: (r.n, r.s)
        for r in ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("s"))
        .collect()
    }
    assert got == want  # served view == single-table batch truth


# ----------------------------------------------------------- NFC audit


def test_nfc_audit_counts_only_decomposed_docs(spark, sf_dir):
    from testlog_etl_spark.queries.llm_ops import text_unicode_nfc_audit

    rows = text_unicode_nfc_audit(spark, sf_dir).collect()
    assert rows
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter("text IS NOT NULL")
    per_source = {
        r.source: r.n
        for r in docs.filter(F.pmod("doc_id", F.lit(3)) == 0)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in rows:
        # exactly the doc_id%3==0 docs are denormalized, one combining
        # mark each; precomposed and clean docs must NOT be flagged
        assert r.n_denormalized == per_source.get(r.source, 0), r
        assert r.codepoints_saved == r.n_denormalized


def test_pyarrow_utf8_normalize_is_broken_here():
    """Document WHY the operator uses unicodedata: this pyarrow build
    decomposes under every form. If this test ever fails, the operator
    can switch to the vectorized kernel."""
    import pyarrow as pa
    import pyarrow.compute as pc

    out = pc.utf8_normalize(pa.array(["café"]), form="NFC").to_pylist()[0]
    assert out != "café"  # broken: returns the DECOMPOSED form
    import unicodedata

    assert unicodedata.normalize("NFC", "café") == "café"  # the fix


# --------------------------------------------- Markov removal attribution


def test_markov_removal_shares_sum_to_one_and_bounds(spark, sf_dir):
    from testlog_etl_spark.queries.etl_queries import attribution_markov_removal

    rows = attribution_markov_removal(spark, sf_dir).collect()
    assert rows, "journeys must produce at least one channel"
    assert all(0.0 <= r.removal_effect <= 1.0 for r in rows)
    assert all(0.0 <= r.p_removed <= r.p_full + 1e-9 for r in rows)
    total_share = sum(r.attribution_share for r in rows)
    assert abs(total_share - 1.0) < 0.01  # shares normalize (4dp rounding slack)


def test_markov_removal_gateway_channel_gets_full_credit(spark):
    """Hand-built chain: every converting journey passes through 'a'
    (START->a->CONV or START->a->b->CONV); removing 'a' kills ALL
    conversion, removing 'b' only some -- a's effect must dominate."""
    import datetime

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows, eid = [], 0

    def journey(uid, kinds, minute_base):
        nonlocal eid
        for i, k in enumerate(kinds):
            rows.append(
                (eid, t0 + datetime.timedelta(minutes=minute_base + i), uid, k, 1.0, None)
            )
            eid += 1

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    for u in range(6):
        journey(u, ["a", "purchase"], 0)  # converts via a alone
    for u in range(6, 10):
        journey(u, ["a", "b", "purchase"], 0)  # converts via a then b
    for u in range(10, 14):
        journey(u, ["b"], 0)  # b-only, no conversion
    import tempfile

    d = tempfile.mkdtemp()
    spark.createDataFrame(rows, schema).write.parquet(f"{d}/events.parquet")
    from testlog_etl_spark.queries.etl_queries import attribution_markov_removal

    out = {r.channel: r for r in attribution_markov_removal(spark, d).collect()}
    # FIRST-ORDER Markov closed form (not path replay): full model
    # p = (10/14)(0.6 + 0.4*0.5) + (4/14)(0.5) = 5/7; removing 'a'
    # leaves START->b->CONV mass = (4/14)(0.5) = 1/7 (the model
    # generalizes b->CONV to b-only journeys -- that is the POINT of
    # Markov attribution vs path counting); removing 'b' leaves
    # (10/14)(0.6) = 3/7.
    assert abs(out["a"].p_full - 5 / 7) < 1e-4
    assert abs(out["a"].p_removed - 1 / 7) < 1e-4
    assert abs(out["b"].p_removed - 3 / 7) < 1e-4
    assert abs(out["a"].removal_effect - 0.8) < 1e-3
    assert abs(out["b"].removal_effect - 0.4) < 1e-3
    assert abs(out["a"].attribution_share - 2 / 3) < 1e-3


# ------------------------------------------- Simpson's paradox + median CI


def test_simpsons_detector_flags_constructed_reversal(spark, tmp_path):
    """Two groups each with NEGATIVE slope whose group means are placed
    to force a POSITIVE pooled slope -- the textbook construction."""
    rows = []
    # group A: x in [0,1], y = 10 - x ; group B: x in [4,5], y = 25 - x
    for i in range(20):
        x = i / 19.0
        rows.append((i, "A", x, 10.0 - x))
        rows.append((100 + i, "B", 4.0 + x, 25.0 - (4.0 + x)))
    df = spark.createDataFrame(rows, "id long, g string, x double, y double")
    m = df.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    p = m.agg(
        F.sum("n").alias("pn"), F.sum("sx").alias("px"),
        F.sum("sy").alias("py"), F.sum("sxy").alias("pxy"),
    ).collect()[0]
    pooled_num = p.pn * p.pxy - p.px * p.py
    group_nums = {r.g: r.n * r.sxy - r.sx * r.sy for r in m.collect()}
    assert pooled_num > 0  # pooled: higher x looks better
    assert all(v < 0 for v in group_nums.values())  # within-group: worse


def test_median_ci_brackets_median_with_exact_order_stats(spark, sf_dir):
    from testlog_etl_spark.queries.stats_queries import stats_median_ci_order_stats

    row = stats_median_ci_order_stats(spark, sf_dir).collect()[0]
    assert row.ci_lo <= row.median <= row.ci_hi
    vals = sorted(
        r.v for r in spark.read.parquet(f"{sf_dir}/orders.parquet")
        .selectExpr("o_totalprice AS v").collect()
    )
    # the bounds ARE order statistics of the data (selection, not estimate)
    assert row.ci_lo in vals and row.ci_hi in vals
    assert vals[row.k_lo - 1] == row.ci_lo and vals[row.k_hi - 1] == row.ci_hi
    import statistics

    assert abs(row.median - statistics.median(vals)) < 1e-6


# ----------------------------------------------------- DiD + peak detect


def test_did_arithmetic_from_cells(spark, sf_dir):
    from testlog_etl_spark.queries.stats_queries import stats_diff_in_diff

    r = stats_diff_in_diff(spark, sf_dir).collect()[0]
    assert r.n_orders == spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert abs(r.did_estimate - ((r.t_post - r.t_pre) - (r.c_post - r.c_pre))) < 1e-6
    assert abs(r.naive_post_gap - (r.t_post - r.c_post)) < 1e-6


def test_peak_detection_finds_known_spike(spark, tmp_path):
    import datetime

    t0 = datetime.datetime(2024, 1, 1)
    rows, eid = [], 0
    # flat 5/hour baseline with one 30-event spike at hour 12
    for h in range(48):
        n = 30 if h == 12 else 5
        for i in range(n):
            rows.append((eid, t0 + datetime.timedelta(hours=h, seconds=i), 1, "view", 1.0, None))
            eid += 1
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    spark.createDataFrame(rows, schema).write.parquet(str(tmp_path / "events.parquet"))
    from testlog_etl_spark.queries.windows_queries import ts_peak_detection

    peaks = ts_peak_detection(spark, str(tmp_path)).collect()
    assert len(peaks) == 1
    assert peaks[0].bucket == "2024-01-01 12:00:00"
    assert peaks[0].n == 30 and peaks[0].prominence == 25


def test_peak_detection_plateau_yields_one_peak(spark, tmp_path):
    import datetime

    t0 = datetime.datetime(2024, 1, 1)
    rows, eid = [], 0
    # two-hour plateau at 30: tie-break (>= left, > right) keeps ONE
    for h in range(24):
        n = 30 if h in (10, 11) else 5
        for i in range(n):
            rows.append((eid, t0 + datetime.timedelta(hours=h, seconds=i), 1, "view", 1.0, None))
            eid += 1
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    spark.createDataFrame(rows, schema).write.parquet(str(tmp_path / "events.parquet"))
    from testlog_etl_spark.queries.windows_queries import ts_peak_detection

    peaks = ts_peak_detection(spark, str(tmp_path)).collect()
    assert len(peaks) == 1 and peaks[0].bucket == "2024-01-01 11:00:00"


# ------------------------------------- stylometry + inclusion dependencies


def test_burrows_delta_separates_styles(spark, tmp_path):
    """Two sources sharing function-word style vs one divergent: the
    like-styled pair must have the smallest Delta."""
    rows = []
    for i in range(30):
        rows.append((i, "s1", "the of and to a in the of and to", "en", 10))
        rows.append((100 + i, "s2", "the of and to a in the of and a", "en", 10))
        rows.append((200 + i, "s3", "zebra quark nebula vortex prism flux gamma delta rho pi", "en", 10))
    spark.createDataFrame(
        rows, "doc_id long, source string, text string, lang string, n_chars int"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    from testlog_etl_spark.queries.llm_ops import text_burrows_delta

    out = {(r.source_a, r.source_b): r.delta for r in text_burrows_delta(spark, str(tmp_path)).collect()}
    assert out[("s1", "s2")] < out[("s1", "s3")]
    assert out[("s1", "s2")] < out[("s2", "s3")]


def test_inclusion_dependencies_separate_fks_from_decoys(spark, sf_dir):
    from testlog_etl_spark.queries.profile_queries import dq_inclusion_dependencies

    rows = {r.candidate: r for r in dq_inclusion_dependencies(spark, sf_dir).collect()}
    assert rows["lineitem.l_orderkey -> orders.o_orderkey"].fk_candidate
    assert rows["orders.o_custkey -> customer.c_custkey"].fk_candidate
    assert rows["lineitem.l_suppkey -> supplier.s_suppkey"].fk_candidate
    # decoys: type-compatible but not containment-complete
    assert not rows["lineitem.l_partkey -> customer.c_custkey"].fk_candidate
    for r in rows.values():
        assert 0.0 <= r.inclusion <= 1.0
        assert r.fk_candidate == (r.inclusion == 1.0)


# ------------------------------------------------ Cochran-Armitage trend


def test_cochran_armitage_closed_form_on_toy():
    """Hand-check the statistic on a textbook dose-response table:
    groups w=1,2,3 with n=100 each and x=10,20,30 -- a perfect trend
    must give a large positive Z."""
    lv = [(1, 100, 10), (2, 100, 20), (3, 100, 30)]
    nn = sum(n for _, n, _ in lv)
    xx = sum(x for _, _, x in lv)
    pbar = xx / nn
    swn = sum(w * n for w, n, _ in lv)
    sw2n = sum(w * w * n for w, n, _ in lv)
    swx = sum(w * x for w, _, x in lv)
    num = swx - swn * xx / nn
    import math

    z = num / math.sqrt(pbar * (1 - pbar) * (sw2n - swn * swn / nn))
    assert z > 3.0  # monotone trend detected
    # flat table: x equal everywhere -> numerator exactly 0
    lv0 = [(1, 100, 20), (2, 100, 20), (3, 100, 20)]
    num0 = sum(w * x for w, _, x in lv0) - sum(w * n for w, n, _ in lv0) * 60 / 300
    assert num0 == 0


def test_cochran_armitage_rates_and_z_consistent(spark, sf_dir):
    from testlog_etl_spark.queries.stats_queries import stats_cochran_armitage_trend

    rows = stats_cochran_armitage_trend(spark, sf_dir).collect()
    assert [r.priority_score for r in rows] == [1, 2, 3, 4, 5]
    zs = {r.trend_z for r in rows}
    assert len(zs) == 1  # the statistic is global, same on every row
    for r in rows:
        assert 0.0 <= r.late_rate <= 1.0
        assert r.n_late <= r.n_lines


# ------------------------------------------------- quantile shift function


def test_quantile_shift_consistency_and_error_bound(spark, sf_dir):
    from testlog_etl_spark.queries.aggs import agg_quantile_shift_function

    rows = agg_quantile_shift_function(spark, sf_dir).collect()
    assert [r.q for r in rows] == [0.1, 0.25, 0.5, 0.75, 0.9]
    import numpy as np

    df = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .selectExpr("year(o_orderdate) AS yr", "o_totalprice AS v")
        .filter("yr IN (1995, 1996)")
        .collect()
    )
    v95 = np.array([r.v for r in df if r.yr == 1995])
    v96 = np.array([r.v for r in df if r.yr == 1996])
    lo = min(v95.min(), v96.min())
    hi = max(v95.max(), v96.max())
    bin_w = (hi - lo) / 256
    for r in rows:
        assert abs(r.shift - (r.q_1996 - r.q_1995)) < 0.02  # arithmetic
        assert abs(r.q_1995 - np.quantile(v95, r.q)) <= bin_w + 1e-6
        assert abs(r.q_1996 - np.quantile(v96, r.q)) <= bin_w + 1e-6


# ------------------------------------------------------- Mann-Kendall


def test_mann_kendall_detects_monotone_and_flat():
    """Closed-form: strictly increasing series -> S = n(n-1)/2 and large
    Z; constant series -> S = 0, tie term kills the variance."""

    def mk(vals):
        n = len(vals)
        s = sum(
            (1 if vals[j] > vals[i] else -1 if vals[j] < vals[i] else 0)
            for i in range(n)
            for j in range(i + 1, n)
        )
        from collections import Counter

        tie = sum(t * (t - 1) * (2 * t + 5) for t in Counter(vals).values() if t > 1)
        var = (n * (n - 1) * (2 * n + 5) - tie) / 18.0
        return s, var

    s, var = mk(list(range(10)))
    assert s == 45 and var > 0  # n(n-1)/2 pairs all positive
    s0, var0 = mk([5.0] * 10)
    assert s0 == 0 and var0 == 0.0  # all ties: variance fully corrected


def test_mann_kendall_on_orders_is_consistent(spark, sf_dir):
    from testlog_etl_spark.queries.stats_queries import stats_mann_kendall_trend

    r = stats_mann_kendall_trend(spark, sf_dir).collect()[0]
    assert r.n_days >= 10  # sf0.001 covers ~half of January 1995's days
    max_s = r.n_days * (r.n_days - 1) // 2
    assert -max_s <= r.s_stat <= max_s
    assert r.var_s > 0
