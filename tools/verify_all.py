"""Dress rehearsal of the driver's correctness gate: run EVERY
registered query under a DEFAULT-CONFIG SparkSession (the driver does
not use our tuned session factory -- round 1 failed 20 queries on
exactly that gap) and compare against its DuckDB oracle.

Usage:
    python tools/verify_all.py               # all queries, sf0.01
    python tools/verify_all.py --window      # driver window (first 50) only
    python tools/verify_all.py --since REV   # queries whose defining module
                                             # changed since git REV
    python tools/verify_all.py name [name..] # specific queries

--since caveat: selection is by the query's DEFINING module
(fn.__module__); a changed .py that is NOT a query module (shared
operator/infra code) can affect any query importing it, so --since
falls back to the FULL sweep in that case. Use it for quick
query-file iteration; the full sweep remains the pre-seal gate.

Exit code 0 iff every checked query MATCHes (rows-only queries must
merely run and return rows).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = os.environ.get("SPARK_JX_VERIFY_SF", "/root/testdata/sf0.01")
def _kind(t: str) -> str:
    """Normalize a Spark simpleString / DuckDB type name to a width-aware
    kind tag, so HUGEINT-vs-BIGINT (and any other typed-value drift the
    repr compare can't see) is caught before the driver's hash does."""
    t = t.strip().lower()
    if t.endswith("[]") or t.startswith("array"):
        return "list"
    if t.startswith("struct") or t.startswith("map"):
        return t.split("<")[0]
    if t.startswith("decimal"):
        return "decimal"
    base = t.split("(")[0]
    return {
        "tinyint": "i8", "smallint": "i16", "int": "i32", "integer": "i32",
        "bigint": "i64", "long": "i64", "hugeint": "i128",
        "utinyint": "u8", "usmallint": "u16", "uinteger": "u32", "ubigint": "u64",
        "float": "f32", "real": "f32", "double": "f64",
        "varchar": "str", "string": "str", "text": "str",
        "boolean": "bool", "bool": "bool", "date": "date",
        # Timestamp flavors stay DISTINCT kinds (ADVICE r03): collapsing
        # NTZ / instant / tz-aware into one tag would hide exactly the
        # repr-equal-but-Arrow-dtype-different drift class that cost six
        # queries in r02 (HUGEINT). "timestamp" (Spark LTZ instant /
        # DuckDB naive) is the one empirically hash-green pairing (every
        # events query r02-r03); anything NTZ- or tz-suffixed on either
        # side is new territory and must be flagged, not waved through.
        "timestamp": "ts", "timestamp_ntz": "ts_ntz",
        "timestamp with time zone": "ts_tz", "timestamptz": "ts_tz",
        "blob": "bin", "binary": "bin",
    }.get(base, base)


def _kind_compatible(s: str | None, d: str | None) -> bool:
    """True when the driver's typed-value hash treats the pair as equal.

    Evidence from CORRECTNESS_r02: int WIDTH differences are benign
    (row_number rank: Spark i32 vs DuckDB i64 hash-matched), but
    HUGEINT/DECIMAL are not (pandas/arrow converts them to float64 ->
    6 hash mismatches). So: any int{8..64} ~ any int{8..64}; everything
    else must match exactly.
    """
    if s == d:
        return True
    ints = {"i8", "i16", "i32", "i64"}
    return s in ints and d in ints


def _changed_since(rev: str, qs: dict) -> list[str] | None:
    """Names of queries whose DEFINING module changed since ``rev``.
    Returns None when a changed file under the package is not a query
    module (shared operator/infra code) -- callers should full-sweep."""
    import subprocess

    from testlog_etl_spark.suite import REGISTRY

    out = subprocess.run(
        ["git", "diff", "--name-only", rev, "--", "testlog_etl_spark/", "__spark_entry__.py"],
        capture_output=True, text=True, check=True, cwd=REPO,
    ).stdout.split()
    if not out:
        return []
    mod_file: dict[str, list[str]] = {}
    for name, case in REGISTRY.items():
        mod = sys.modules.get(case.fn.__module__)
        if mod is None or not getattr(mod, "__file__", None):
            return None
        mod_file.setdefault(os.path.relpath(mod.__file__, REPO), []).append(name)
    selected: list[str] = []
    for f in out:
        if f in mod_file:
            selected.extend(mod_file[f])
        else:
            # Any OTHER changed file under the scanned paths is
            # unscopeable: a shared .py can affect any importer, and a
            # non-Python resource (fixture data, .sql/.txt assets) can
            # change behavior without being a query-defining module
            # (r08 advisor: --since used to silently ignore non-.py
            # changes and report "nothing to do").
            return None
    return [n for n in qs if n in set(selected)]


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
    elif "--since" in argv:
        if argv.index("--since") + 1 >= len(argv):
            print("usage: verify_all.py --since GITREV")
            return 2
        rev = argv[argv.index("--since") + 1]
        names = _changed_since(rev, qs)
        if names is None:  # shared-module change: conservative full sweep
            print("--since: a shared (non-query) module changed; sweeping ALL")
            names = list(qs)
        elif not names:
            print(f"--since {rev}: no query-defining modules changed; nothing to do")
            return 0
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
            sdf = qs[name](spark, SF)
            s_cols = sorted(sdf.columns)
            s = sorted(map(repr, (tuple(r[c] for c in s_cols) for r in sdf.collect())))
            s_kinds = {f.name: _kind(f.dataType.simpleString()) for f in sdf.schema.fields}
            if name in oracles:
                rel = con.execute(oracles[name])
                raw_cols = [c[0] for c in rel.description]
                d_cols = sorted(raw_cols)
                idx = [raw_cols.index(c) for c in d_cols]
                rows = rel.fetchall()
                d = sorted(map(repr, (tuple(r[i] for i in idx) for r in rows)))
                # dtype parity: a DuckDB HUGEINT/DECIMAL vs Spark BIGINT has
                # identical Python reprs but hash-mismatches in the driver
                # (it hashes typed Arrow values) -- r02 lost 6 queries to it.
                # DB-API description collapses numerics to 'NUMBER'; the
                # relation API keeps real DuckDB type names.
                drel = con.sql(oracles[name])
                d_kinds = {
                    c: _kind(str(t)) for c, t in zip(drel.columns, drel.types)
                }
                kind_bad = {
                    c: (s_kinds.get(c), d_kinds.get(c))
                    for c in d_cols
                    if not _kind_compatible(s_kinds.get(c), d_kinds.get(c))
                }
                # r07 tripwire: repr-compare is blind to output types the
                # driver's typed-value hash cannot handle (ARRAY -> pandas
                # "unhashable type: 'list'"; DECIMAL/HUGEINT -> float64
                # coercion drift). Fail them here even when reprs match.
                unsafe = {
                    c: k
                    for c, k in {**d_kinds, **s_kinds}.items()
                    if k in ("list", "struct", "map", "bin", "decimal", "i128")
                }
                if unsafe:
                    kind_bad.update({c: ("UNSAFE-OUTPUT", k) for c, k in unsafe.items()})
                # duplicate names: r[c] / raw_cols.index(c) both resolve
                # to the FIRST occurrence, silently skipping the second
                # column's values -- reject rather than false-MATCH
                if len(set(sdf.columns)) != len(sdf.columns) or len(set(raw_cols)) != len(raw_cols):
                    kind_bad["__dup_column_names__"] = (tuple(sdf.columns), tuple(raw_cols))
                ok = s == d and s_cols == d_cols and not kind_bad
                status = "MATCH" if ok else f"MISMATCH {kind_bad or ''}".rstrip()
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
