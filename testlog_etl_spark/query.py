"""The JX query runner: one JSON query -> one DataFrame plan.

Mirrors the reference lifecycle (SURVEY SS3.1) with Spark in place of all
three backends: normalization here plays `QueryOp.wrap`, the expression
compiler plays `jx_expression`, and the emitted DataFrame plan is the
"backend query" that Catalyst optimizes (the ES-DSL / SQLite-SQL analog).

Clauses: from (incl. deep `table.path` via explode), where, select
(str | dict | list, dot-paths, `a.*` leaves, per-select aggregate),
groupby (sparse groups), edges (dense cube; operators/edges.py), window
(operators/windows.py), sort, limit.

Formats (SS1.3): the DataFrame IS the `table` format; `format_list` /
`format_cube` reshape driver-side -- cube cells are bounded by edge-domain
cardinality, so collecting them is small by construction.

Scale shape of an edges/groupby query: filter (pushed to scan) -> single
hash-aggregate shuffle -> broadcast densify -> optional window (one
shuffle per distinct partitioning) -> sort/limit (TakeOrderedAndProject
when limited).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from testlog_etl_spark.expressions import JXCompiler, is_missing, null_if_missing
from testlog_etl_spark.operators.edges import Edge, cube_aggregate, normalize_edge
from testlog_etl_spark.operators.scan_quantile import attach_group_quantiles
from testlog_etl_spark.operators.windows import apply_window, _sort_cols

_COUNT_LIKE = {"count", "cardinality", "cardinality_approx"}
_QUANTILE_AGGS = {"median", "percentile"}


# --------------------------------------------------------------------------
# select normalization
# --------------------------------------------------------------------------


def _default_name(value: Any) -> str:
    if isinstance(value, str):
        return value.replace(".", "_") if value != "." else "value"
    return "value"


def normalize_selects(select: Any) -> list[dict]:
    """-> [{name, value, aggregate, ...}] (SS2.2 projection normalization)."""
    if select is None:
        return []
    items = select if isinstance(select, list) else [select]
    out = []
    for s in items:
        if isinstance(s, str):
            out.append({"name": _default_name(s), "value": s, "aggregate": None})
        elif isinstance(s, dict):
            d = dict(s)
            d.setdefault("value", ".")
            d.setdefault("name", _default_name(d["value"]))
            d["name"] = d["name"].replace(".", "_")
            d.setdefault("aggregate", None)
            out.append(d)
        else:
            raise ValueError(f"bad select item {s!r}")
    return out


# --------------------------------------------------------------------------
# aggregates (SS2.4 A1-A14)
# --------------------------------------------------------------------------


def agg_column(sel: dict, compiler: JXCompiler) -> Column:
    agg = (sel["aggregate"] or "").lower()
    name = sel["name"]
    raw = sel["value"]
    if agg == "count" and raw in (".", "*"):
        return F.count(F.lit(1)).alias(name)
    v = null_if_missing(compiler.compile(raw))  # JX aggregates skip missing ('' too)
    if agg == "count":
        return F.count(v).alias(name)
    if agg == "sum":
        return F.sum(v).alias(name)
    if agg in ("min", "minimum"):
        return F.min(v).alias(name)
    if agg in ("max", "maximum"):
        return F.max(v).alias(name)
    if agg in ("average", "avg", "mean"):
        return F.avg(v).alias(name)
    if agg == "cardinality":
        # exact here; the reference's ES backend is HLL-approximate -- that
        # variant is `cardinality_approx` (same HLL++ family)
        return F.count_distinct(v).alias(name)
    if agg == "cardinality_approx":
        return F.approx_count_distinct(v).alias(name)
    if agg in _QUANTILE_AGGS:
        # only reachable from the bounded-frame window path (see
        # _split_quantile_selects): the groupby/edges/global-agg paths
        # route these onto the rank-selection scan instead, because
        # percentile()/median() buffer EVERY group value in their
        # aggregation state -- at 100 TB a group's buffer is the group
        # (measured 360 B/shuffle-record on agg_cardinality_median at
        # sf0.1 before the r09 rewire; operators/scan_quantile.py).
        if agg == "median":
            return F.median(v).alias(name)
        return F.percentile(v, F.lit(float(sel.get("percentile", 0.5)))).alias(name)
    if agg == "stats":
        # the reference's Z-moment stats blob (vendor/mo_math/stats.py)
        d = v.cast("double")
        return F.struct(
            F.count(d).alias("count"),
            F.avg(d).alias("mean"),
            F.var_pop(d).alias("variance"),
            F.stddev_pop(d).alias("std"),
            F.skewness(d).alias("skew"),
            F.kurtosis(d).alias("kurtosis"),
            F.min(d).alias("min"),
            F.max(d).alias("max"),
        ).alias(name)
    if agg == "union":
        return F.array_sort(F.collect_set(v)).alias(name)
    if agg == "list":
        return F.collect_list(v).alias(name)
    if agg in ("value", "one"):
        return F.first(v, ignorenulls=True).alias(name)
    if agg == "first":
        return F.first(v, ignorenulls=False).alias(name)
    if agg == "last":
        return F.last(v, ignorenulls=False).alias(name)
    if agg == "and":
        return F.bool_and(v.cast("boolean")).alias(name)
    if agg == "or":
        return F.bool_or(v.cast("boolean")).alias(name)
    raise ValueError(f"unknown aggregate {sel['aggregate']!r}")


def _split_quantile_selects(selects: list[dict]) -> tuple[list[dict], list[dict]]:
    """Separate median/percentile selects from the rest. The quantile
    aggregates are computed by rank selection over the hierarchical scan
    (``operators/scan_quantile.py``) and joined back, NOT by Spark's
    exact ``percentile()``/``median()`` aggregates, whose partial
    buffers hold every group value (the group IS the buffer at scale).
    Values are bit-identical (same symmetric interpolation both ways);
    window-clause quantiles stay on the sorted-frame engine intrinsics
    because their frames are bounded by construction."""
    quants = [s for s in selects if (s["aggregate"] or "").lower() in _QUANTILE_AGGS]
    others = [s for s in selects if (s["aggregate"] or "").lower() not in _QUANTILE_AGGS]
    return others, quants


def quantile_specs(quants: list[dict], compiler: JXCompiler) -> list[tuple[str, Column, float]]:
    """-> [(out_name, value column (missing->null), q)] for the scan."""
    out = []
    for s in quants:
        agg = (s["aggregate"] or "").lower()
        q = 0.5 if agg == "median" else float(s.get("percentile", 0.5))
        out.append((s["name"], null_if_missing(compiler.compile(s["value"])), q))
    return out


# --------------------------------------------------------------------------
# from-clause resolution (incl. deep queries J3)
# --------------------------------------------------------------------------


def resolve_from(frm: Any, tables: dict[str, DataFrame]) -> DataFrame:
    """`"table"` or `"table.nested.path"`: each array-typed step explodes
    (the reference's "deep query" -- jx_sqlite child tables / es52/deep.py);
    parent columns ride along for free."""
    from pyspark.sql.types import ArrayType

    if isinstance(frm, DataFrame):
        return frm
    if frm in tables:
        return tables[frm]
    parts = frm.split(".")
    if parts[0] not in tables:
        raise KeyError(f"unknown table {parts[0]!r}")
    df = tables[parts[0]]
    path_expr = None
    for seg in parts[1:]:
        path_expr = seg if path_expr is None else f"{path_expr}.{seg}"
        dt = df.select(F.col(path_expr).alias("_p")).schema[0].dataType
        if isinstance(dt, ArrayType):
            # each element becomes a row, addressable by the segment name;
            # parent columns ride along (J3: explode IS the lateral join)
            keep = [c for c in df.columns if c != seg]  # replace top-level name
            df = df.select(*keep, F.explode_outer(F.col(path_expr)).alias(seg))
            path_expr = seg
    return df


# --------------------------------------------------------------------------
# the runner
# --------------------------------------------------------------------------


def run_jx(
    spark: SparkSession,
    query: dict,
    tables: dict[str, DataFrame] | None = None,
    now=None,
) -> DataFrame:
    tables = tables or {}
    df = resolve_from(query["from"], tables)
    compiler = JXCompiler(now=now, dtypes=dict(df.dtypes))

    if query.get("where") is not None:
        df = df.filter(compiler.predicate(query["where"]))

    selects = normalize_selects(query.get("select"))
    groupby = query.get("groupby")
    edges_spec = query.get("edges")
    has_agg = any(s["aggregate"] for s in selects)

    if edges_spec is not None:
        edges = [normalize_edge(spark, e, compiler) for e in (edges_spec if isinstance(edges_spec, list) else [edges_spec])]
        others, quants = _split_quantile_selects(selects)
        aggs = [agg_column(s, compiler) for s in others] or [
            F.count(F.lit(1)).alias("count" if not selects else "__qn")
        ]
        count_like = [s["name"] for s in selects if (s["aggregate"] or "") in _COUNT_LIKE] or (
            ["count"] if not selects else []
        )
        df = cube_aggregate(
            spark, df, edges, aggs, count_like,
            quantile_specs=quantile_specs(quants, compiler) if quants else None,
        )
        if quants:
            df = df.select(*[e.name for e in edges], *[s["name"] for s in selects])
    elif groupby is not None:
        keys = groupby if isinstance(groupby, list) else [groupby]
        key_sel = normalize_selects(keys)
        key_cols = [compiler.compile(k["value"]).alias(k["name"]) for k in key_sel]
        others, quants = _split_quantile_selects(selects)
        aggs = [agg_column(s, compiler) for s in others] or [
            F.count(F.lit(1)).alias("count" if not selects else "__qn")
        ]
        grouped = df.groupBy(*key_cols).agg(*aggs)
        if quants:
            key_names = [k["name"] for k in key_sel]
            grouped = attach_group_quantiles(
                df, grouped, key_cols, key_names, quantile_specs(quants, compiler)
            )
            grouped = grouped.select(*key_names, *[s["name"] for s in selects])
        df = grouped
    elif has_agg:
        others, quants = _split_quantile_selects(selects)
        base = df.agg(*([agg_column(s, compiler) for s in others] or [F.count(F.lit(1)).alias("__qn")]))
        if quants:
            # global quantile = one group under a constant key; the scan
            # shape is identical, the key rollup is one row
            base = base.withColumn("__gk", F.lit(1))
            base = attach_group_quantiles(
                df, base, [F.lit(1).alias("__gk")], ["__gk"], quantile_specs(quants, compiler)
            )
            base = base.select(*[s["name"] for s in selects])
        df = base
    elif selects:
        cols = []
        for s in selects:
            if isinstance(s["value"], str) and s["value"].endswith(".*"):
                cols.append(F.col(s["value"]))  # leaves expansion (E25)
            elif s["value"] == ".":
                cols.append(F.col("*"))
            else:
                cols.append(compiler.compile(s["value"]).alias(s["name"]))
        df = df.select(*cols)

    for clause in query.get("window") or []:
        df = apply_window(df, clause, compiler)

    if query.get("sort") is not None:
        df = df.orderBy(*_sort_cols(query["sort"], compiler))

    if query.get("limit") is not None:
        df = df.limit(int(query["limit"]))

    return df


# --------------------------------------------------------------------------
# output formats (SS1.3)
# --------------------------------------------------------------------------


def format_table(df: DataFrame, limit: int | None = None) -> dict:
    rows = df.limit(limit).collect() if limit else df.collect()
    return {"header": df.columns, "data": [list(r) for r in rows]}


def format_list(df: DataFrame, limit: int | None = None) -> list[dict]:
    rows = df.limit(limit).collect() if limit else df.collect()
    return [r.asDict(recursive=True) for r in rows]


def format_cube(df: DataFrame, edge_names: list[str]) -> dict:
    """Densified cube DataFrame -> {edges, data} with N-d nested lists.
    Small by construction: |cells| = product of domain sizes."""
    rows = df.collect()
    value_cols = [c for c in df.columns if c not in edge_names]
    # ordered domains (null part last, matching cube_aggregate's sort)
    domains: list[list] = []
    for e in edge_names:
        seen: list = []
        for r in rows:
            v = r[e]
            if v not in seen:
                seen.append(v)
        domains.append(seen)
    shape = [len(d) for d in domains]

    def empty(dim: int):
        if dim == len(shape):
            return None
        return [empty(dim + 1) for _ in range(shape[dim])]

    data = {c: empty(0) for c in value_cols}
    for r in rows:
        idx = [domains[i].index(r[e]) for i, e in enumerate(edge_names)]
        for c in value_cols:
            cell = data[c]
            for k in idx[:-1]:
                cell = cell[k]
            cell[idx[-1]] = r[c]
    return {
        "edges": [
            {"name": e, "domain": {"type": "set", "partitions": domains[i]}}
            for i, e in enumerate(edge_names)
        ],
        "data": data,
    }
