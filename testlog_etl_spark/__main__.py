"""CLI runner: the user-facing surface a reference (ActiveData) user
lands on after switching.

    python -m testlog_etl_spark list                 # registered queries
    python -m testlog_etl_spark run NAME [NAME..]    # run + show results
    python -m testlog_etl_spark jx QUERY.json        # raw JX query dict
    python -m testlog_etl_spark explain NAME         # formatted plan

Options: --sf DIR (default $SPARK_GRAFT_SF_DIR or /root/testdata/sf0.01),
--limit N rows shown (default 20), --json (JSONL to stdout).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _spark():
    from testlog_etl_spark.session import get_spark

    return get_spark("spark-jx-cli")


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="testlog_etl_spark")
    ap.add_argument("cmd", choices=["list", "run", "jx", "explain"])
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--limit", type=int, default=20)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args(argv)

    from testlog_etl_spark import suite

    qs = suite.queries()

    if args.cmd == "list":
        for name, case in suite.REGISTRY.items():
            kind = "oracle" if case.oracle else "rows-only"
            print(f"{name:32s} [{kind}] {case.doc.splitlines()[0][:80]}")
        return 0

    if args.cmd == "jx":
        if len(args.names) != 1:
            ap.error("jx takes exactly one query-JSON path (or '-' for stdin)")
        src = sys.stdin.read() if args.names[0] == "-" else open(args.names[0]).read()
        q = json.loads(src)
        from testlog_etl_spark.query import run_jx
        from testlog_etl_spark.tables import load_tables

        spark = _spark()
        tables = load_tables(spark, args.sf, (q.get("from"),))
        df = run_jx(spark, q, tables)
        _show(df, args)
        return 0

    missing = [n for n in args.names if n not in qs]
    if missing or not args.names:
        ap.error(f"unknown or missing query name(s): {missing or 'none given'}")
    spark = _spark()
    for name in args.names:
        df = qs[name](spark, args.sf)
        if args.cmd == "explain":
            df.explain(mode="formatted")
        else:
            print(f"-- {name}")
            _show(df, args)
    return 0


def _show(df, args) -> None:
    if args.json:
        for row in df.limit(args.limit).toJSON().collect():
            print(row)
    else:
        df.show(args.limit, truncate=40)


if __name__ == "__main__":
    raise SystemExit(main())
