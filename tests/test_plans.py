"""Physical-plan shape assertions (SURVEY SS4): the scale contract is
that filters/projections reach the parquet scan, small dims broadcast,
top-k avoids a global sort, and repeated window partitionings reuse one
exchange. These are the properties that survive a 100x scale-up; value
correctness alone doesn't prove them."""

from __future__ import annotations

import contextlib
import io

from tests.conftest import SF_SMALL


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def _q(name):
    from testlog_etl_spark import suite

    return suite.REGISTRY[name].fn if name in suite.queries() else None


def test_filter_pushdown_reaches_scan(spark):
    df = _q("q6_forecast_revenue")(spark, SF_SMALL)
    plan = plan_of(df)
    assert "PushedFilters:" in plan
    # the shipdate range predicate must be pushed, not applied post-scan only
    assert "l_shipdate" in plan.split("PushedFilters:")[1].splitlines()[0]


def test_column_pruning_reaches_scan(spark):
    df = _q("q6_forecast_revenue")(spark, SF_SMALL)
    plan = plan_of(df)
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    # Q6 needs only 4 lineitem columns; a full-width scan is a regression
    assert "l_orderkey" not in read_schema and "l_comment" not in read_schema
    assert "l_extendedprice" in read_schema


def test_star_join_broadcasts_dims(spark):
    plan = plan_of(_q("q5_local_supplier_volume")(spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan
    # the two fact tables must NOT be broadcast at scale; their join may be
    # sort-merge or (at this tiny SF, post-AQE estimate) hash -- but the
    # plan must not degenerate to a nested-loop product
    assert "CartesianProduct" not in plan


def test_topk_uses_take_ordered(spark):
    plan = plan_of(_q("topk_orders")(spark, SF_SMALL), mode="simple")
    assert "TakeOrderedAndProject" in plan


def test_window_clauses_share_exchange(spark):
    # two clauses over the same partitioning: one shuffle, not two
    df = _q("win_running_sum")(spark, SF_SMALL)
    plan = plan_of(df, mode="simple")
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges <= 1, f"expected shared window exchange, got {n_exchanges}"


def test_cube_densify_broadcasts_grouped_side(spark):
    plan = plan_of(_q("edges_two_dims")(spark, SF_SMALL), mode="simple")
    assert "BroadcastHashJoin" in plan
    # the fact table is scanned once and aggregated pre-densify
    # (partial+final); densification must not rescan it per domain cell
    assert plan.count("FileScan parquet") == 1
    assert "partial_count" in plan


def test_lsh_carries_no_shingles_through_banding(spark):
    from testlog_etl_spark.operators.neardup import minhash_lsh_pairs
    from testlog_etl_spark.tables import load_tables

    docs = load_tables(spark, SF_SMALL, ("documents",))["documents"]
    plan = plan_of(minhash_lsh_pairs(docs, "doc_id", "text"), mode="simple")
    # the band self-join must be an equi-join (hash or sort-merge), never
    # a product; shingle arrays rejoin only after candidate pruning
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
