#!/usr/bin/env python3
"""Dump .explain("formatted") for named registered queries to files.

Usage: python tools/explain_dump.py SUFFIX name [name..]
Writes plans/r12/<name>_<SUFFIX>.txt for each query, built at sf0.01
under the default-config session (the driver's shape).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = os.environ.get("SPARK_JX_VERIFY_SF", "/root/testdata/sf0.01")
OUT = os.path.join(REPO, "plans", os.environ.get("SPARK_JX_PLANS_ROUND", "r13"))


def main() -> None:
    suffix, names = sys.argv[1], sys.argv[2:]
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("explain_dump")
        .getOrCreate()
    )
    qs = entry.queries()
    os.makedirs(OUT, exist_ok=True)
    for name in names:
        df = qs[name](spark, SF)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(OUT, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print("wrote", path)


if __name__ == "__main__":
    main()
