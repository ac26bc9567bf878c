"""Guard: the literal date windows baked into oracle-paired queries must
stay NON-TRIVIAL on the current testdata.

Why this exists: testdata regenerates between driver rounds, and r04
found q6/q10 filtering on 1993-94 windows while the regenerated orders
table starts at 1995-01-01 -- both queries went green against their
oracles on EMPTY input, which verifies nothing. A differential match on
zero rows is vacuous; this guard turns that silent decay into a loud
local failure (DuckDB-only, no Spark session, runs in milliseconds).
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_ORACLE


def _li():
    from testlog_etl_spark.tables import table_path

    return table_path(SF_ORACLE, "lineitem")


_LI_PATH = _li()


# (name, table, predicate, minimum matching rows for the check to be
# considered non-vacuous). Keep in sync with the literals in
# testlog_etl_spark/queries/*.py -- the point is that these EXACT windows
# keep selecting data.
WINDOWS = [
    ("q1 shipdate cutoff", "lineitem", "l_shipdate <= TIMESTAMP '1998-09-02'", 1000),
    ("q3 order cutoff", "orders", "o_orderdate < TIMESTAMP '1995-03-15'", 50),
    ("q5 order window", "orders",
     "o_orderdate >= TIMESTAMP '1994-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'", 100),
    ("q6 ship window", "lineitem",
     "l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'", 100),
    ("q10 order quarter", "orders",
     "o_orderdate >= TIMESTAMP '1996-10-01' AND o_orderdate < TIMESTAMP '1997-01-01'", 50),
    ("edges month domain", "orders",
     "o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1995-07-01'", 50),
    ("q20 ship year", "lineitem",
     "l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'", 1000),
    ("rate-limit tercile 1", "events", "ts < TIMESTAMP '2024-01-11'", 100),
    ("temporal-split val side", "events", "ts >= TIMESTAMP '2024-01-24'", 100),
    ("backlog ref date", "orders",
     "o_orderdate <= TIMESTAMP '1996-06-30' AND o_orderkey NOT IN "
     "(SELECT DISTINCT l_orderkey FROM read_parquet('{li}') "
     " WHERE l_shipdate <= TIMESTAMP '1996-06-30')".format(li=_LI_PATH), 100),
    ("rate-limit tercile 2", "events",
     "ts >= TIMESTAMP '2024-01-11' AND ts < TIMESTAMP '2024-01-21'", 100),
    ("rate-limit tercile 3", "events", "ts >= TIMESTAMP '2024-01-21'", 100),
    ("events week window", "events",
     "ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'", 100),
    ("events jx cutoff", "events", "ts < TIMESTAMP '2024-01-25'", 100),
]


@pytest.mark.parametrize("name,table,pred,min_rows", WINDOWS, ids=[w[0] for w in WINDOWS])
def test_window_selects_data(duck, name, table, pred, min_rows):
    from testlog_etl_spark.tables import table_path

    n = duck.execute(
        f"SELECT count(*) FROM read_parquet('{table_path(SF_ORACLE, table)}') WHERE {pred}"
    ).fetchone()[0]
    assert n >= min_rows, (
        f"{name}: only {n} rows match {pred!r} in current {table} testdata "
        f"(need >= {min_rows}); the paired query would verify on (near-)empty "
        f"input -- update the literal window in the query AND its oracle."
    )


# categorical literals baked into queries: regeneration that renames
# these values would leave filters selecting nothing
VALUE_GUARDS = [
    ("nation pair (q7)", "nation", "n_name IN ('NATION_1', 'NATION_2', 'NATION_3')", 3),
    ("region ASIA (q8)", "region", "r_name = 'ASIA'", 1),
    ("p_type PROMO (q8/q14)", "part", "p_type = 'PROMO'", 20),
    ("q19 brands", "part", "p_brand IN ('Brand#12', 'Brand#23', 'Brand#3')", 20),
    ("urgent priority (q12/q22)", "orders", "o_orderpriority = '1-URGENT'", 100),
    ("F status (q21)", "orders", "o_orderstatus = 'F'", 100),
    ("low nationkeys (q22)", "customer", "c_nationkey IN (0,1,2,3,4,5,6)", 50),
    ("bm25 query terms", "documents",
     "len(list_filter(string_split(text, ' '), t -> t IN ('spark','join','window'))) > 0", 50),
    ("stopwords present (quality/model score)", "documents",
     "len(list_filter(string_split(lower(text), ' '), t -> t IN ('the','a','and','of','to'))) > 0", 50),
    ("event types (pagerank/funnel)", "events",
     "event_type IN ('view', 'click', 'purchase')", 100),
    ("region EUROPE (q2)", "region", "r_name = 'EUROPE'", 1),
    ("p_size 15 (q2)", "part", "p_size = 15", 20),
    ("small-name parts (q20)", "part", "p_name LIKE 'small%'", 100),
    ("region-1 suppliers (q20)", "supplier",
     "s_nationkey IN (1, 6, 11, 16, 21)", 10),
]


@pytest.mark.parametrize("name,table,pred,min_rows", VALUE_GUARDS, ids=[w[0] for w in VALUE_GUARDS])
def test_value_domain_selects_data(duck, name, table, pred, min_rows):
    from testlog_etl_spark.tables import table_path

    n = duck.execute(
        f"SELECT count(*) FROM read_parquet('{table_path(SF_ORACLE, table)}') WHERE {pred}"
    ).fetchone()[0]
    assert n >= min_rows, (
        f"{name}: only {n} rows match {pred!r} -- a categorical literal a "
        f"query depends on has drifted out of the regenerated testdata."
    )
