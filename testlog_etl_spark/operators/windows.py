"""JX `window` clause -> Spark Window functions (SURVEY SS2.6, W1-W10).

Reference semantics (vendor/jx_python/jx.py::window + jx_python/windows.py):
each clause adds ONE column:
  {name, value, aggregate, edges: [partition cols], sort, range: {min,max},
   where}
- `edges` is the PARTITION BY, `sort` the ORDER BY;
- `range` is a ROWS-based frame relative to the current row;
- no range + sort  -> running frame (unbounded preceding .. current);
- no range + no sort -> whole-partition aggregate;
- `where` pre-filters rows entering the aggregate (rows stay, excluded
  values become null inside the frame);
- special aggregates: `rownum` (row_number), `rank`, `dense_rank`,
  `lag`/`lead` (E28 `rows[i]` access), `percentile`/`median` (exact over
  the frame).

Scale: a window clause is exactly one shuffle on its partition keys (or
zero if the upstream is already hash-partitioned on them -- Catalyst
reuses exchanges across clauses with identical partitioning). Exact
median/percentile-over-frame is a sorted collect_list + linear
interpolation (Spark refuses median() with a window frame); the arrays
are bounded by the frame size and stay JVM-side array intrinsics, no
Python boundary.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

from testlog_etl_spark.expressions import JXCompiler

_RANKING = {
    "rownum": F.row_number,
    "row_number": F.row_number,
    "rank": F.rank,
    "dense_rank": F.dense_rank,
    "percent_rank": F.percent_rank,
    "cume_dist": F.cume_dist,
}


def _sort_cols(sort: Any, compiler: JXCompiler) -> list[Column]:
    if sort is None:
        return []
    if not isinstance(sort, list):
        sort = [sort]
    out = []
    for s in sort:
        if isinstance(s, dict) and "value" in s:
            c = compiler.compile(s["value"])
            desc = s.get("sort", 1) in (-1, "desc", "descending")
        else:
            c = compiler.compile(s)
            desc = False
        # JX missing sorts first on asc (deterministic; O1)
        out.append(c.desc_nulls_last() if desc else c.asc_nulls_first())
    return out


def apply_window(df: DataFrame, clause: dict, compiler: JXCompiler) -> DataFrame:
    name = clause["name"]
    agg = (clause.get("aggregate") or "list").lower()
    edges = clause.get("edges") or []
    if not isinstance(edges, list):
        edges = [edges]
    part_cols = [compiler.compile(e) for e in edges]
    sort_cols = _sort_cols(clause.get("sort"), compiler)

    w: WindowSpec = Window.partitionBy(*part_cols) if part_cols else Window.partitionBy(F.lit(1))
    if sort_cols:
        w = w.orderBy(*sort_cols)

    rng = clause.get("range")
    if rng is not None:
        lo = rng.get("min")
        hi = rng.get("max")
        lo = Window.unboundedPreceding if lo is None else int(lo)
        hi = Window.unboundedFollowing if hi is None else int(hi)
        frame = w.rowsBetween(lo, hi)
    elif sort_cols:
        frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    else:
        frame = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)

    if agg in _RANKING:
        if not sort_cols:
            raise ValueError(f"window aggregate {agg!r} requires `sort`")
        return df.withColumn(name, _RANKING[agg]().over(w))

    if agg == "ntile":
        # bucket boundary placement under ties follows row order, so a
        # deterministic result requires a tie-broken (unique) sort
        if not sort_cols:
            raise ValueError("window aggregate 'ntile' requires `sort`")
        return df.withColumn(name, F.ntile(int(clause.get("buckets", 4))).over(w))

    raw = clause.get("value", ".")
    # count over the whole row: "." / "*" means every row contributes
    value = F.lit(1) if raw in (".", "*") else compiler.compile(raw)
    if clause.get("where") is not None:
        # W9: rows failing `where` contribute nothing to the aggregate
        value = F.when(compiler.predicate(clause["where"]), value)

    if agg in ("lag", "lead"):
        # mirror the ranking-path guard: without `sort` Spark raises a deep
        # AnalysisException; a `range` frame on lag/lead would be silently
        # meaningless (offset functions ignore frames)
        if not sort_cols:
            raise ValueError(f"window aggregate {agg!r} requires `sort`")
        if rng is not None:
            raise ValueError(f"window aggregate {agg!r} does not accept `range`")
        n = int(clause.get("offset", 1))
        fn = F.lag if agg == "lag" else F.lead
        return df.withColumn(name, fn(value, n).over(w))

    if agg in ("median", "percentile"):
        # W5 hard spot: Spark refuses median()/percentile() with a window
        # frame. Exact equivalent: collect the frame (bounded by the frame
        # size), sort, linear-interpolate (percentile_cont semantics) --
        # all JVM array intrinsics, no Python boundary.
        p = 0.5 if agg == "median" else float(clause.get("percentile", 0.5))
        arr = F.sort_array(F.collect_list(value.cast("double")).over(frame))
        n = F.size(arr)
        h = (n - F.lit(1)).cast("double") * F.lit(p)
        lo_i = F.floor(h).cast("int")
        lo_v = F.try_element_at(arr, lo_i + F.lit(1))
        hi_v = F.try_element_at(arr, lo_i + F.lit(2))
        interp = lo_v + (h - lo_i) * (F.coalesce(hi_v, lo_v) - lo_v)
        return df.withColumn(name, F.when(n > 0, interp))

    col = _window_agg(agg, value, clause)
    return df.withColumn(name, col.over(frame))


def _window_agg(agg: str, value: Column, clause: dict) -> Column:
    if agg in ("sum",):
        return F.sum(value)
    if agg in ("count",):
        return F.count(value)
    if agg in ("min", "minimum"):
        return F.min(value)
    if agg in ("max", "maximum"):
        return F.max(value)
    if agg in ("average", "avg", "mean"):
        return F.avg(value)
    if agg in ("median",):
        return F.median(value)  # exact; W5
    if agg in ("percentile",):
        return F.percentile(value, F.lit(float(clause.get("percentile", 0.5))))
    if agg in ("first",):
        return F.first(value, ignorenulls=False)
    if agg in ("last",):
        return F.last(value, ignorenulls=False)
    if agg in ("one", "value"):
        return F.first(value, ignorenulls=True)
    if agg in ("union",):
        return F.collect_set(value)
    if agg in ("list",):
        return F.collect_list(value)
    if agg in ("and",):
        return F.bool_and(value.cast("boolean"))
    if agg in ("or",):
        return F.bool_or(value.cast("boolean"))
    raise ValueError(f"unsupported window aggregate {agg!r}")
