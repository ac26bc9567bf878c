"""JX `edges` -- the dense datacube GROUP BY (SURVEY SS2.5, D1-D9).

Reference semantics (vendor/jx_base/domains.py, jx_python/cubes/aggs.py,
jx_elasticsearch/es52/agg_op.py): an `edges` query returns one cell per
part of each edge's DOMAIN -- including empty cells (count=0, other
aggregates null) -- plus an optional null part for rows whose edge value
is missing (`allowNulls`, default true).

Spark realization (scale-first):
 1. each row gets a bucket key per edge (a Column expression -- stays in
    whole-stage codegen);
 2. ONE hash-aggregate over the bucket keys (the only shuffle; partial
    aggregation map-side);
 3. the dense frame is the cross-join of the per-edge domain DataFrames --
    EVERY edge is bounded (explicit domains by their part count, default
    domains by limit/DEFAULT_EDGE_LIMIT), so the product has a static cap
    -- LEFT-joined to the aggregated groups. Within MAX_BROADCAST_CELLS
    the join broadcasts (default-domain aggregates are first semi-join
    reduced to the bounded dense frame, so the build side can never grow
    with the data); beyond it, no hints -- AQE picks from runtime sizes.
    Either way densification adds no second shuffle over the fact table.

Range-edge fan-out (D6): a row whose {"range": {min,max}} value spans
several buckets contributes to each -- `explode(sequence(...))` before the
aggregate, i.e. Spark-native interval fan-out; the fan-out factor is
span/interval, bounded by the domain, so worst-case blowup is explicit in
the query, not hidden in a join.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from testlog_etl_spark.expressions import JXCompiler, is_missing

_CAL_INTERVALS = {"month": 1, "year": 12}


def _parse_interval(interval: Any) -> tuple[str, float]:
    """-> ('seconds', n) | ('months', n) for time domains; numbers pass through."""
    if isinstance(interval, (int, float)):
        return ("seconds", float(interval))
    s = str(interval).strip().lower()
    import re

    m = re.match(r"^(\d*\.?\d*)\s*(second|minute|hour|day|week|month|year)s?$", s)
    if not m:
        raise ValueError(f"cannot parse domain interval {interval!r}")
    n = float(m.group(1) or "1")
    unit = m.group(2)
    if unit in _CAL_INTERVALS:
        return ("months", n * _CAL_INTERVALS[unit])
    mult = {"second": 1, "minute": 60, "hour": 3600, "day": 86400, "week": 604800}[unit]
    return ("seconds", n * mult)


# Default part cap for D1 default domains (the reference's ES terms-size
# behavior: a terms aggregation never returns unbounded buckets). High
# enough that small/medium-cardinality cubes are complete, but it makes
# every edge BOUNDED, which is what keeps the densify join broadcastable
# by construction at any data scale.
DEFAULT_EDGE_LIMIT = 10_000

# If the dense frame (product of per-edge part caps, +1 per nullable edge)
# could exceed this many cells, skip all broadcast hints in densification
# and let AQE pick join strategies from runtime sizes.
MAX_BROADCAST_CELLS = 4_000_000


@dataclass
class Edge:
    """A normalized edge: bucket-key expression + dense domain DataFrame."""

    name: str
    key: Column  # per-row bucket key (null => missing part)
    domain: DataFrame | None  # one column named `name`; None => discover from data
    fan_out: Column | None = None  # array of bucket keys (range-edge); overrides key
    limit: int | None = None  # default-domain part cap
    allow_nulls: bool = True
    bound: int = DEFAULT_EDGE_LIMIT  # static worst-case part count
    others: bool = False  # D9: collapse over-limit parts into one OTHER part


OTHERS_LABEL = "OTHER"


def normalize_edge(spark: SparkSession, spec: Any, compiler: JXCompiler) -> Edge:
    if isinstance(spec, str):
        spec = {"value": spec}
    name = spec.get("name") or (spec["value"] if isinstance(spec.get("value"), str) else "edge")
    name = name.replace(".", "_")
    allow_nulls = bool(spec.get("allowNulls", True))
    domain = spec.get("domain") or {}
    dom_type = domain.get("type", "default")

    value = spec.get("value")
    if isinstance(value, dict) and "range" in value and set(value) == {"range"}:
        # D6 range-edge: the row spans every overlapped bucket
        rng = value["range"]
        lo = compiler.compile(rng["min"]).cast("double")
        hi = compiler.compile(rng["max"]).cast("double")
        dmin, dmax, i = float(domain["min"]), float(domain["max"]), float(domain["interval"])
        n_parts = int(-(-(dmax - dmin) // i))  # ceil
        # integer bucket indices relative to domain min (sequence() needs
        # integral steps), then scaled back; overlap-filter handles edges
        k0 = F.greatest(F.floor((lo - dmin) / i).cast("long"), F.lit(0))
        k1 = F.least(F.floor((hi - dmin) / i).cast("long"), F.lit(n_parts - 1))
        buckets = F.when(
            lo.isNotNull() & hi.isNotNull() & (k1 >= k0),
            F.filter(
                F.transform(F.sequence(k0, k1), lambda k: F.lit(dmin) + k * F.lit(i)),
                lambda b: (b < hi) & ((b + F.lit(i)) > lo),
            ),
        )
        dom_df = _numeric_domain_df(spark, name, dmin, dmax, i)
        return Edge(
            name=name, key=F.lit(None), domain=dom_df, fan_out=buckets,
            allow_nulls=allow_nulls, bound=n_parts,
        )

    val_col = compiler.compile(value)

    if dom_type in ("set", "simple_set"):
        parts = domain["partitions"]
        vals = [p["value"] if isinstance(p, dict) else p for p in parts]
        # JVM-side literal frame: createDataFrame would ship a 32-partition
        # Python RDD whose later coalesce(1) replays every Python worker
        # SEQUENTIALLY (~5s of overhead for a 4-row domain, measured)
        dom_df = spark.range(1).select(F.explode(F.array(*[F.lit(v) for v in vals])).alias(name))
        # rows whose value is not in the domain fall into the null part
        key = F.when(val_col.isin(vals), val_col)
        return Edge(name=name, key=key, domain=dom_df, allow_nulls=allow_nulls, bound=len(vals))

    if dom_type == "time":
        unit, n = _parse_interval(domain["interval"])
        dmin = F.lit(str(domain["min"])).cast("timestamp")
        dmax = F.lit(str(domain["max"])).cast("timestamp")
        ts = val_col.cast("timestamp")
        if unit == "months":
            months = int(n)
            # calendar bucketing: month-offset from domain min, floored
            off = (F.months_between(ts, dmin) / months).cast("int") * months
            key = F.to_timestamp(F.add_months(dmin, off))
            dom_df = (
                spark.range(1)
                .select(
                    F.explode(
                        F.sequence(dmin, F.timestamp_add("SECOND", F.lit(-1), dmax), F.expr(f"interval {months} month"))
                    ).alias(name)
                )
            )
        else:
            secs = n
            base = F.unix_timestamp(dmin)
            key = F.timestamp_seconds(
                (F.floor((F.unix_timestamp(ts) - base) / secs) * secs + base)
            )
            dom_df = (
                spark.range(1)
                .select(
                    F.explode(
                        F.sequence(
                            dmin,
                            F.timestamp_add("SECOND", F.lit(-1), dmax),
                            F.expr(f"interval {int(secs)} second"),
                        )
                    ).alias(name)
                )
            )
        in_range = (ts >= dmin) & (ts < dmax)
        return Edge(
            name=name, key=F.when(in_range, key), domain=dom_df,
            allow_nulls=allow_nulls, bound=_time_bound(domain, unit, n),
        )

    if dom_type in ("range", "duration"):
        dmin, dmax, i = float(domain["min"]), float(domain["max"]), float(domain["interval"])
        v = val_col.cast("double")
        key = F.when((v >= dmin) & (v < dmax), F.lit(dmin) + F.floor((v - dmin) / i) * i)
        n_parts = int(-(-(dmax - dmin) // i))
        return Edge(
            name=name, key=key, domain=_numeric_domain_df(spark, name, dmin, dmax, i),
            allow_nulls=allow_nulls, bound=n_parts,
        )

    # default domain: parts discovered from data, capped by limit (D1/D9).
    # An explicit limit wins; otherwise DEFAULT_EDGE_LIMIT applies (the
    # reference's terms aggregations are size-capped the same way), so a
    # default edge is still BOUNDED and the densify join stays broadcastable.
    limit = int(spec.get("limit") or domain.get("limit") or 0) or DEFAULT_EDGE_LIMIT
    others = bool(spec.get("others") or domain.get("others"))
    return Edge(
        name=name,
        key=val_col,
        domain=None,
        limit=limit,
        allow_nulls=allow_nulls,
        bound=limit + (1 if others else 0),
        others=others,
    )


def _time_bound(domain: dict, unit: str, n: float) -> int:
    """Static part count of a time domain (min/max are ISO strings)."""
    from datetime import datetime

    try:
        lo = datetime.fromisoformat(str(domain["min"]))
        hi = datetime.fromisoformat(str(domain["max"]))
    except ValueError:
        return DEFAULT_EDGE_LIMIT
    if unit == "months":
        months = (hi.year - lo.year) * 12 + (hi.month - lo.month)
        return max(1, int(-(-months // n)))
    return max(1, int(-(-(hi - lo).total_seconds() // n)))


def _numeric_domain_df(spark: SparkSession, name: str, dmin: float, dmax: float, i: float) -> DataFrame:
    n_parts = int(-(-(dmax - dmin) // i))  # ceil
    return spark.range(n_parts).select((F.lit(dmin) + F.col("id") * F.lit(i)).alias(name))


def _resolve_others(df: DataFrame, e: Edge) -> Edge:
    """D9 OTHER part: a default domain with ``others: true`` keeps its
    first ``limit`` parts and collapses every over-limit part into one
    synthetic OTHER row instead of dropping those rows.

    Shape: one extra *discovery* aggregate over the (column-pruned) edge
    column finds the kept parts -- bounded by ``limit``, so collecting
    them to the driver is safe by construction -- and the bucket key
    becomes a pure ``isin`` expression. The main fact aggregate then sees
    OTHER as just another group, so EVERY aggregate type (avg, median,
    cardinality...) is computed correctly over the collapsed rows; the
    alternative (re-aggregating the grouped result) would be wrong for
    any non-decomposable aggregate. At scale the discovery pass shuffles
    only map-side-deduped distinct keys, never rows.
    """
    if not e.others:
        return e
    import dataclasses

    dtype = df.select(e.key.alias(e.name)).schema[e.name].dataType.simpleString()
    if dtype != "string":
        raise ValueError(
            f"edge {e.name!r}: others=true needs a string-typed edge "
            f"(got {dtype}) -- the OTHER part is a synthetic label"
        )
    kept = [
        r[e.name]
        for r in df.select(e.key.alias(e.name))
        .where(e.key.isNotNull())
        .distinct()
        .orderBy(e.name)
        .limit(e.limit or DEFAULT_EDGE_LIMIT)
        .collect()
    ]
    key = (
        F.when(e.key.isNull(), F.lit(None).cast("string"))
        .when(e.key.isin(kept) if kept else F.lit(False), e.key)
        .otherwise(F.lit(OTHERS_LABEL))
    )
    dom = df.sparkSession.createDataFrame(
        [(v,) for v in (*kept, OTHERS_LABEL)], f"{e.name} string"
    )
    return dataclasses.replace(e, key=key, domain=dom, bound=len(kept) + 1)


def cube_aggregate(
    spark: SparkSession,
    df: DataFrame,
    edges: list[Edge],
    agg_exprs: list[Column],
    count_like: list[str],
    quantile_specs: list[tuple[str, Column, float]] | None = None,
) -> DataFrame:
    """Dense aggregate over edges; `count_like` aggregate output names are
    default-filled with 0 in empty cells (D8), everything else stays null.

    ``quantile_specs`` are ``(out_name, value column, q)`` median/
    percentile cells, computed by rank selection over the hierarchical
    scan and joined into the sparse cells BEFORE densification (empty
    cells stay NULL -- ``percentile()`` of an empty cell). They are kept
    out of ``agg_exprs`` because the exact percentile aggregate buffers
    every cell value in its shuffle-borne state; the edge-cell count is
    bounded but a cell's size is not (operators/scan_quantile.py)."""
    edges = [_resolve_others(df, e) for e in edges]
    work = df
    key_cols = []
    for e in edges:
        if e.fan_out is not None:
            # D6: one row per overlapped bucket. explode_outer keeps rows
            # with a missing/empty span for the null part.
            work = work.withColumn(e.name, F.explode_outer(e.fan_out))
        else:
            work = work.withColumn(e.name, e.key)
        key_cols.append(e.name)

    grouped = work.groupBy(*key_cols).agg(*agg_exprs)

    # resolve every edge's bounded domain BEFORE the quantile attach:
    # default domains are data-derived and capped here, and the quantile
    # scan must run over the CUT key domain, not the raw one (r09
    # advisor: attaching first ran the scan over every raw edge value --
    # wasted scan work for cells the densify join drops, and under the
    # old driver-walk scan an unbounded driver materialization)
    doms: list[DataFrame] = []
    default_dom = []
    for e in edges:
        dom = e.domain
        is_default = dom is None
        if is_default:
            # default domain discovered from the aggregated result (cheap:
            # already reduced), ordered, always capped (normalize_edge fills
            # DEFAULT_EDGE_LIMIT) so the frame is bounded at any data scale
            dom = grouped.select(F.col(e.name)).where(F.col(e.name).isNotNull()).distinct()
            dom = dom.orderBy(e.name).limit(e.limit or DEFAULT_EDGE_LIMIT)
        doms.append(dom)
        default_dom.append(is_default)

    if quantile_specs:
        from testlog_etl_spark.operators.scan_quantile import attach_group_quantiles

        qwork = work
        for e, dom, is_default in zip(edges, doms, default_dom):
            if not is_default:
                continue  # explicit domains are bounded by construction
            # restrict the scan's rows to the kept (capped) parts; the
            # null part survives iff allowNulls keeps its cell. Each dom
            # is <= limit rows -> broadcast semi-join, a map-side filter.
            cut = dom.withColumnRenamed(e.name, f"__d_{e.name}")
            if e.allow_nulls:
                cut = cut.unionByName(
                    spark.range(1).select(
                        F.lit(None).cast(cut.schema[f"__d_{e.name}"].dataType).alias(f"__d_{e.name}")
                    )
                )
            keep = F.col(e.name).eqNullSafe(F.col(f"__d_{e.name}"))
            qwork = qwork.join(F.broadcast(cut), keep, "left_semi")
        grouped = attach_group_quantiles(
            qwork, grouped, [F.col(n) for n in key_cols], key_cols, quantile_specs
        )

    # build the dense frame: cross-join of per-edge domains
    dense: DataFrame | None = None
    for e, dom in zip(edges, doms):
        if e.allow_nulls:
            dom = dom.unionByName(
                spark.range(1).select(F.lit(None).cast(dom.schema[e.name].dataType).alias(e.name))
            )
        # domains are tiny by construction but inherit defaultParallelism
        # partitions; without this a 2-edge crossJoin schedules |p1|*|p2|
        # (~1000) near-empty tasks
        dense = dom.coalesce(1) if dense is None else dense.crossJoin(dom.coalesce(1))

    # eqNullSafe join on every edge key so the null part matches
    cond = None
    g = grouped
    for e in edges:
        g = g.withColumnRenamed(e.name, f"__g_{e.name}")
    for e in edges:
        c = F.col(e.name).eqNullSafe(F.col(f"__g_{e.name}"))
        cond = c if cond is None else (cond & c)

    # Densify-join sizing, decided STATICALLY from the edge bounds:
    # - `dense` is capped at prod(bound_i + allowNulls_i) cells;
    # - `g` (the aggregated side) is bounded by the domain product for
    #   explicit domains, but for a default domain its cardinality is
    #   data-dependent -- a high-cardinality edge at 100x data would make
    #   broadcast(g) an executor/driver OOM. In that case cut g to the
    #   bounded dense frame with a semi-join FIRST (build side = dense,
    #   which is bounded), after which |g| <= |dense| and broadcasting is
    #   safe again. Dropped rows are exactly the parts beyond the edge
    #   limit -- same semantics the plain left join had.
    # - If the static cell bound itself is huge (multi-edge default cubes),
    #   skip every hint and let AQE choose from runtime sizes.
    cells = 1
    for e in edges:
        cells *= e.bound + (1 if e.allow_nulls else 0)
    if cells > MAX_BROADCAST_CELLS:
        if any(e.domain is None for e in edges):
            g = g.join(dense, cond, "left_semi")
        joined = dense.join(g, cond, "left")
    else:
        if any(e.domain is None for e in edges):
            g = g.join(F.broadcast(dense), cond, "left_semi")
        joined = dense.join(F.broadcast(g), cond, "left")
    joined = joined.drop(*[f"__g_{e.name}" for e in edges])

    fills = {name: 0 for name in count_like}
    if fills:
        joined = joined.fillna(fills)
    return joined.orderBy(*[F.col(e.name).asc_nulls_last() for e in edges])
