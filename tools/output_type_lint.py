"""Driver-hash-safety lint: reject any registered query whose OUTPUT
columns are typed ARRAY / DECIMAL / STRUCT / MAP / BINARY on the Spark
side or LIST / DECIMAL / HUGEINT / STRUCT / MAP / BLOB on the DuckDB
side.

Why (CORRECTNESS_r07 post-mortem): the driver's correctness gate hashes
typed values after a pandas round-trip. Two output-type classes pass
every repr-based local compare yet break that hash:

- ARRAY outputs -> pandas ``sort_values`` on an object column of lists
  raises ``TypeError: unhashable type: 'list'`` (``jx_array_lambdas``);
- DECIMAL outputs -> Spark's Arrow path and DuckDB's client path coerce
  decimal->float64 differently, so digit-identical values hash apart
  (``agg_decimal_exact_revenue``; same class as the six r02 HUGEINT
  losses recorded in ``tools/verify_all.py::_kind``).

The suite rule (suite.py module docstring) is that collections are
sorted AND JOINED TO STRINGS and exact numerics are RENDERED at the
output boundary; this lint makes that rule machine-checked. It is
schema-only (builds each DataFrame plan + DuckDB relation, collects
nothing), so the full 526-query sweep runs in a couple of minutes.

Usage:
    python tools/output_type_lint.py             # whole registry
    python tools/output_type_lint.py --window    # driver window only
    python tools/output_type_lint.py name [...]  # specific queries

Exit 0 iff every checked query is hash-safe.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = os.environ.get("SPARK_JX_VERIFY_SF", "/root/testdata/sf0.01")

# Spark simpleString prefixes that are unsafe as OUTPUT columns. (They
# are fine mid-plan -- the exact-decimal revenue query still sums in
# DECIMAL(38,4); only the final select must render to a safe type.)
SPARK_UNSAFE = ("array", "struct", "map", "binary", "decimal")
# DuckDB relation type names (base, before any "(...)") that are unsafe
# as OUTPUT columns; "TYPE[]" array suffixes are checked separately.
DUCK_UNSAFE = ("list", "struct", "map", "blob", "decimal", "hugeint", "union")


def spark_unsafe_cols(schema) -> dict[str, str]:
    bad = {}
    seen: set[str] = set()
    for f in schema.fields:
        t = f.dataType.simpleString().lower()
        if t.startswith(SPARK_UNSAFE):
            bad[f.name] = t
        # Spark permits duplicate column names; the driver's compare
        # sorts columns BY NAME before hashing, so duplicates scramble
        # the pairing nondeterministically. Reject at lint time.
        if f.name in seen:
            bad[f.name] = f"duplicate column name ({t})"
        seen.add(f.name)
    return bad


def duck_unsafe_cols(rel) -> dict[str, str]:
    bad = {}
    seen: set[str] = set()
    for c, t in zip(rel.columns, rel.types):
        ts = str(t).lower()
        if ts.endswith("[]") or ts.split("(")[0] in DUCK_UNSAFE:
            bad[c] = ts
        # duplicate names scramble a sort-by-name compare (and collapse
        # silently in dict-keyed row access) -- reject on this side too
        if c in seen:
            bad[c] = f"duplicate column name ({ts})"
        seen.add(c)
    return bad


def main(argv: list[str]) -> int:
    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]").appName("output-type-lint").getOrCreate()
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
        try:
            problems = dict(spark_unsafe_cols(qs[name](spark, SF).schema))
            if name in oracles:
                problems.update(
                    {f"duckdb:{c}": t for c, t in duck_unsafe_cols(con.sql(oracles[name])).items()}
                )
            status = "SAFE" if not problems else f"UNSAFE {problems}"
            if problems:
                bad[name] = status
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
