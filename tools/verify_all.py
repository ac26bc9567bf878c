"""Dress rehearsal of the driver's correctness gate: run EVERY
registered query under a DEFAULT-CONFIG SparkSession (the driver does
not use our tuned session factory -- round 1 failed 20 queries on
exactly that gap) and compare against its DuckDB oracle.

Usage:
    python tools/verify_all.py               # all queries, sf0.01
    python tools/verify_all.py --window      # driver window (first 50) only
    python tools/verify_all.py name [name..] # specific queries

Exit code 0 iff every checked query MATCHes (rows-only queries must
merely run and return rows).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = os.environ.get("SPARK_JX_VERIFY_SF", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main(argv: list[str]) -> int:
    import duckdb
    from pyspark.sql import SparkSession

    # deliberately NOT session.get_spark: mirror the driver's own session
    spark = SparkSession.builder.master("local[8]").appName("verify-all").getOrCreate()
    import __spark_entry__ as entry

    qs, oracles = entry.queries(), entry.oracle_sql()
    from testlog_etl_spark.suite import DRIVER_WINDOW

    if "--window" in argv:
        names = list(DRIVER_WINDOW)
    elif args := [a for a in argv if not a.startswith("-")]:
        names = args
    else:
        names = list(qs)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )

    bad: dict[str, str] = {}
    for name in names:
        try:
            sdf = qs[name](spark, SF)
            s_cols = sorted(sdf.columns)
            s = sorted(map(repr, (tuple(r[c] for c in s_cols) for r in sdf.collect())))
            if name in oracles:
                rel = con.execute(oracles[name])
                raw_cols = [c[0] for c in rel.description]
                d_cols = sorted(raw_cols)
                idx = [raw_cols.index(c) for c in d_cols]
                d = sorted(map(repr, (tuple(r[i] for i in idx) for r in rel.fetchall())))
                ok = s == d and s_cols == d_cols
                status = "MATCH" if ok else "MISMATCH"
                if not ok:
                    bad[name] = status
            else:
                status = f"rows-only({len(s)})"
        except Exception as ex:  # noqa: BLE001 -- report, don't die mid-sweep
            status = f"ERR: {type(ex).__name__}: {str(ex)[:120]}"
            bad[name] = status
        print(f"{name} -> {status}", flush=True)
    print(f"\nTOTAL {len(names)}  BAD {len(bad)}")
    for k, v in bad.items():
        print(" ", k, v)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
