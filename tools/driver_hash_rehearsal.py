"""Rehearse the driver's TYPED-VALUE compare, not a proxy of it.

``tools/verify_all.py`` compares Python ``repr`` strings, which is
blind to exactly the layer both CORRECTNESS_r07 failures lived in: the
driver materializes both sides as pandas DataFrames, sorts rows by all
columns (its traceback shows ``sort_values`` -> ``Categorical``
lexsort), and hashes typed values. An ARRAY column makes that sort
raise (unhashable list); a DECIMAL column survives the sort but drifts
through the two engines' different decimal->float64 client coercions.

This tool replays that pipeline as closely as the public evidence
allows, for each query:

1. Spark side: ``toPandas()`` with Arrow enabled (the driver's path).
2. Oracle side: DuckDB ``.df()`` (its pandas client path).
3. Columns sorted by name; integer dtypes widened to int64 (r02
   evidence: int WIDTH differences hash-equal in the driver) and
   nullable pandas dtypes normalized to their numpy forms.
4. Rows sorted by ALL columns with pandas ``sort_values`` -- the exact
   call that raised on r07's list column; anything unsortable fails
   here like it would there.
5. ``pandas.testing.assert_frame_equal`` with ``check_dtype=True`` --
   dtype drift (object-vs-float64, the decimal failure) fails even
   when values print identically. Exact value equality; no tolerance
   (the suite's rounding discipline is supposed to guarantee it).

Usage:
    python tools/driver_hash_rehearsal.py --window      # driver's 50
    python tools/driver_hash_rehearsal.py name [name..]
    python tools/driver_hash_rehearsal.py               # all 526 (slow)

Exit 0 iff every checked oracle-backed query passes.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = os.environ.get("SPARK_JX_VERIFY_SF", "/root/testdata/sf0.01")
def canonicalize(pdf):
    """Sort columns by name, normalize hash-equivalent dtypes, sort rows
    by all columns (the driver's lexsort step)."""
    import numpy as np
    import pandas as pd

    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        dt = pdf[c].dtype
        # int width differences are hash-benign (r02): widen to int64.
        # Nullable pandas ints (DuckDB emits Int64 for nullable cols)
        # normalize to float64 when they hold NULLs, int64 otherwise --
        # mirroring numpy coercion on the Arrow path.
        if pd.api.types.is_integer_dtype(dt):
            if pdf[c].isna().any():
                pdf[c] = pdf[c].astype("float64")
            else:
                pdf[c] = pdf[c].astype("int64")
        elif pd.api.types.is_float_dtype(dt):
            pdf[c] = pdf[c].astype("float64")
        elif isinstance(dt, pd.DatetimeTZDtype):
            # Spark LTZ can come back tz-aware; DuckDB naive. The driver
            # hash-matched this pairing in every events query r02-r07,
            # so normalize both to naive UTC -- AND to us resolution
            # (tz-aware frames arrive ns; the naive branch below casts
            # to us, so without this cast identical values would
            # dtype-mismatch ns-vs-us).
            pdf[c] = (
                pdf[c].dt.tz_convert("UTC").dt.tz_localize(None).astype("datetime64[us]")
            )
        elif pd.api.types.is_datetime64_any_dtype(dt):
            pdf[c] = pdf[c].astype("datetime64[us]")
        elif pd.api.types.is_bool_dtype(dt) and str(dt) == "boolean":
            pdf[c] = pdf[c].astype("bool" if not pdf[c].isna().any() else "object")
    # Unhashable container cells: the driver's multi-column lexsort
    # raises on them, but a SINGLE-column frame takes pandas' argsort
    # path and can sort lists without raising -- reject explicitly so
    # the one-column case cannot silently pass a gate the driver's own
    # compare would fail.
    for c in pdf.columns:
        if pdf[c].dtype == object and pdf[c].map(
            lambda v: isinstance(v, (list, dict, set, bytearray))
        ).any():
            raise TypeError(f"unhashable container values in output column {c!r}")
    # THE driver step that exploded on r07's ARRAY output: let it raise
    pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(drop=True)
    # date columns: DuckDB .df() yields datetime64, Spark yields object
    # dates -- align by round-tripping object date cells
    for c in pdf.columns:
        if pdf[c].dtype == object:
            import datetime

            if pdf[c].map(lambda v: isinstance(v, datetime.date) or v is None).all():
                pdf[c] = pd.to_datetime(pdf[c]).astype("datetime64[us]")
    _ = np  # imported for side-typing clarity
    return pdf


def main(argv: list[str]) -> int:
    import duckdb
    import pandas as pd
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-hash-rehearsal")
        # the driver uses a default session; Arrow collection is the
        # default toPandas path in Spark 4
        .getOrCreate()
    )
    import __spark_entry__ as entry

    qs, oracles = entry.queries(), entry.oracle_sql()
    from testlog_etl_spark.suite import DRIVER_WINDOW

    if "--window" in argv:
        names = list(DRIVER_WINDOW)
    elif args := [a for a in argv if not a.startswith("-")]:
        names = args
    else:
        names = list(qs)

    from testlog_etl_spark.tables import register_duck_views

    con = duckdb.connect()
    register_duck_views(con, SF)

    bad: dict[str, str] = {}
    for name in names:
        if name not in oracles:
            print(f"{name} -> rows-only (skipped)", flush=True)
            continue
        try:
            s = canonicalize(qs[name](spark, SF).toPandas())
            d = canonicalize(con.sql(oracles[name]).df())
            pd.testing.assert_frame_equal(s, d, check_dtype=True, check_exact=True)
            status = "PASS"
        except Exception as ex:  # noqa: BLE001 -- report, don't die mid-sweep
            status = f"FAIL: {type(ex).__name__}: {str(ex)[:200]}"
            bad[name] = status
        print(f"{name} -> {status}", flush=True)
    print(f"\nTOTAL {len(names)}  BAD {len(bad)}")
    for k, v in bad.items():
        print(" ", k, v)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
