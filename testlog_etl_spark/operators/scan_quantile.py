"""Exact distributed quantiles by rank selection (the scale-safe twin
of Spark's exact ``percentile()`` aggregate).

``percentile()`` / ``median()`` (exact, sort-based) buffer EVERY group
value in their aggregation state: the partial buffers ride the shuffle
at full column width and each group's final merge lands on ONE reducer
— measured 80 KB/shuffle-record on ``stats_levene_test`` at sf0.1
before the r09 rewire (tools/shuffle_audit.py); at 100 TB a group's
buffer IS the group. ``percentile_approx`` bounds the state but is not
exact, so it cannot back a hash-compared oracle.

``group_quantiles_exact`` computes the SAME values with rollup-sized
exchanges: a per-(key, value) count rollup, one range-partitioned
global cumulative count (``operators/scan.py::global_rank_cumsum`` —
no per-group concentration anywhere), a driver-side position
computation over the BOUNDED key domain, and a broadcast-join
selection of the ≤2 covering value rows per (group, quantile).

Bit-identical to both engines, including the interpolation: Spark's
``percentile`` and DuckDB's ``quantile_cont`` both compute position
``p = q*(n-1)`` and interpolate with the SYMMETRIC form
``v[⌈p⌉]·(p-⌊p⌋) + v[⌊p⌋]·(⌈p⌉-p)``, which rounds differently from
the naive ``lo + frac·(hi-lo)`` — e.g. q=0.9 over {1.0, 3.0} is
2.8000000000000003 under both engines, 2.8 naive. Fuzzed against both
in ``tests/test_properties.py``.

NULL values are ignored (``percentile`` semantics); a group with only
NULLs yields NO row (vs percentile's NULL row) — callers that need the
NULL row should left-join this result back to the key rollup.

Reference parity note: the reference's row-at-a-time engine sorts each
group in memory for its percentile aggregate (SURVEY.md §2.3 A7); this
module is the Spark-first restatement for grains that do not fit one
node.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, IntegerType, StructField, StructType

from testlog_etl_spark.operators.scan import global_rank_cumsum


def attach_group_quantiles(
    src: DataFrame,
    base: DataFrame,
    key_cols: Sequence[Column],
    key_names: Sequence[str],
    specs: Sequence[tuple[str, Column, float]],
) -> DataFrame:
    """Left-join rank-selection quantiles onto ``base`` (one row per
    group, its key columns already named ``key_names``). ``src`` is the
    pre-aggregation frame; ``key_cols`` re-derive the group keys on it.
    ``specs`` are ``(out_name, value column, q)``; specs sharing one
    value expression share one scan (all their quantiles ride the same
    range exchange). The join is null-safe so NULL-key groups keep
    their values, and a group whose values are all NULL gets NULL --
    exactly ``percentile()``'s answer for it."""
    by_expr: dict[str, tuple[Column, list[tuple[str, float]]]] = {}
    for name, vcol, q in specs:
        k = repr(vcol._jc) if hasattr(vcol, "_jc") else str(vcol)
        by_expr.setdefault(k, (vcol, []))[1].append((name, q))
    key_names = list(key_names)
    for vcol, named_qs in by_expr.values():
        proj = src.select(*key_cols, vcol.cast("double").alias("__qval"))
        qdf = group_quantiles_exact(
            proj, key_names, "__qval", [q for _, q in named_qs], [n for n, _ in named_qs]
        )
        for k in key_names:
            qdf = qdf.withColumnRenamed(k, f"__qk_{k}")
        cond = None
        for k in key_names:
            c = F.col(k).eqNullSafe(F.col(f"__qk_{k}"))
            cond = c if cond is None else (cond & c)
        base = base.join(qdf, cond, "left").drop(*[f"__qk_{k}" for k in key_names])
    return base


def group_quantiles_exact(
    df: DataFrame,
    key: str | Sequence[str],
    val: str,
    qs: Sequence[float],
    outs: Sequence[str],
    num_parts: int = 32,
) -> DataFrame:
    """One row per group with one DOUBLE column per requested quantile
    (``outs`` names them), each bit-identical to
    ``percentile(val, q)`` / ``quantile_cont(val, q)``. The key domain
    must be BOUNDED (a one-row-per-group rollup is collected to compute
    rank offsets); the VALUE grain may scale freely — only
    ``(key, value, count)`` rollup rows cross the single range
    exchange, and every quantile shares that one scan.

    ``key`` may be one column name or a sequence (composite group key).
    NULL group keys are first-class: the driver-side offset walk orders
    them FIRST (matching Spark's asc nulls-first range partitioning)
    and the selection join is null-safe, so a NULL-key group gets its
    quantile exactly like ``percentile()`` gives it. Float keys must
    not contain NaN (Spark orders NaN last; Python can't sort it)."""
    keys = [key] if isinstance(key, str) else list(key)
    if len(qs) != len(outs):
        raise ValueError("qs and outs must have the same length")
    pv = (
        df.filter(F.col(val).isNotNull())
        .select(*[F.col(k) for k in keys], F.col(val).cast("double").alias(val))
        .groupBy(*keys, val)
        .agg(F.count(F.lit(1)).cast("double").alias("_cnt"))
    )
    handles: list[DataFrame] = []
    ranked = global_rank_cumsum(
        pv,
        [F.col(k).asc() for k in keys] + [F.col(val).asc()],
        val_col="_cnt",
        rank_out="_i",
        cum_out="_gcum",
        num_parts=num_parts,
        persist_handles=handles,
    )
    # bounded-by-contract key domain: one row per group. The totals job
    # reads the PERSISTED range-partitioned rollup the scan just built
    # (handles[0]) instead of recomputing pv from the source -- at scale
    # the source scan dominates and must run exactly once. Counts are
    # integer-valued doubles, so the different fold order is exact.
    # The walk order MUST replicate the range partitioning's asc
    # nulls-first order (the offsets index into that global order):
    # (not-null, value) tuples sort None first and only compare
    # same-typed values otherwise.
    totals = handles[0].groupBy(*keys).agg(F.sum("_cnt").alias("_n")).collect()

    def _ord(r):
        return tuple((r[k] is not None, r[k] if r[k] is not None else 0) for k in keys)

    sel_rows = []
    off = 0.0
    for r in sorted(totals, key=_ord):
        n = r["_n"]
        for qi, q in enumerate(qs):
            p = q * (n - 1.0)
            # engine-exact coefficients, computed on the driver with
            # the same IEEE ops both engines use: c_hi = p - floor(p),
            # c_lo = (floor(p)+1) - p (NOT 1 - c_hi, which can round
            # differently)
            sel_rows.append(
                tuple(r[k] for k in keys)
                + (
                    qi,
                    off,
                    math.floor(p) + 1.0,
                    p - math.floor(p),
                    (math.floor(p) + 1.0) - p,
                )
            )
        off += n
    spark = df.sparkSession
    sel_schema = StructType(
        [next(f for f in df.schema.fields if f.name == k) for k in keys]
        + [
            StructField("_qi", IntegerType()),
            StructField("_off", DoubleType()),
            StructField("_lo", DoubleType()),
            StructField("_chi", DoubleType()),
            StructField("_clo", DoubleType()),
        ]
    )
    seldf = spark.createDataFrame(sel_rows, sel_schema)

    # null-safe equi-join so NULL-key groups keep their selection rows
    sel_renamed = seldf
    for k in keys:
        sel_renamed = sel_renamed.withColumnRenamed(k, f"_sk_{k}")
    cond = None
    for k in keys:
        c = F.col(k).eqNullSafe(F.col(f"_sk_{k}"))
        cond = c if cond is None else (cond & c)
    j = ranked.join(F.broadcast(sel_renamed), cond).drop(*[f"_sk_{k}" for k in keys])
    cum_g = F.col("_gcum") - F.col("_off")
    start_g = cum_g - F.col("_cnt")
    lo, hi = F.col("_lo"), F.col("_lo") + F.lit(1.0)
    covers_lo = (lo > start_g) & (lo <= cum_g)
    covers_hi = (hi > start_g) & (hi <= cum_g)
    cand = j.filter(covers_lo | ((F.col("_chi") > 0) & covers_hi))
    aggs = []
    for qi in range(len(qs)):
        is_q = F.col("_qi") == qi
        aggs += [
            F.max(F.when(is_q & covers_lo, F.col(val))).alias(f"_vlo{qi}"),
            F.max(F.when(is_q & covers_hi, F.col(val))).alias(f"_vhi{qi}"),
            F.max(F.when(is_q, F.col("_chi"))).alias(f"_chi{qi}"),
            F.max(F.when(is_q, F.col("_clo"))).alias(f"_clo{qi}"),
        ]
    per_key = cand.groupBy(*keys).agg(*aggs)
    cols = [F.col(k) for k in keys]
    for qi, out in enumerate(outs):
        vlo, vhi = F.col(f"_vlo{qi}"), F.col(f"_vhi{qi}")
        chi, clo = F.col(f"_chi{qi}"), F.col(f"_clo{qi}")
        # the engines' branch: integer position -> the order statistic
        # itself; else the symmetric interpolation, hi-term first
        cols.append(
            F.when(chi == 0, vlo)
            .otherwise(F.coalesce(vhi, vlo) * chi + vlo * clo)
            .alias(out)
        )
    return per_key.select(*cols)
