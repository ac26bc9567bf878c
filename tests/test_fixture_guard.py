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
