"""Time-series downsampling with gap fill: bucket an event stream into
fixed intervals per series, aggregate, then fill empty buckets by
carrying the last observation forward (LOCF) -- the hypertable
"time_bucket + locf" rollup shape.

Scale design:

- the bucket aggregate is one keyed shuffle (series, bucket) with
  map-side partial aggregation;
- the dense grid is `explode(sequence(min, max, step))` per series --
  generated, never shuffled; grid size = span/step per series, data-
  independent;
- global span bounds ride a broadcast 1-row aggregate (no driver
  action, no collect);
- LOCF is `last(value, ignoreNulls)` over (series ORDER BY bucket
  ROWS UNBOUNDED PRECEDING): one window per series partition -- state
  is a single value per series, and the partitioning reuses the
  aggregate's exchange when the series key matches (exchange reuse is
  plan-tested for the windows family).

Series with NO observation before the first bucket stay null (LOCF has
nothing to carry) -- same semantics as DuckDB's `last_value IGNORE
NULLS`, which is how the oracle phrases it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from testlog_etl_spark.util import persist_once


def downsample_locf(
    df: DataFrame,
    series_col: str,
    ts_col: str,
    value_col: Column,
    interval_sec: int,
    agg: str = "avg",
    round_to: int | None = 4,
) -> DataFrame:
    """One row per (series, bucket) over the DENSE per-series grid
    spanning the table's global [min, max] event time; ``filled`` =
    bucket aggregate, LOCF-carried across empty buckets.

    Returns columns: series_col, ``bucket`` (timestamp), ``n`` (events
    in bucket, 0 for gaps), ``filled`` (double, null before the first
    observation).
    """
    step = F.lit(int(interval_sec))
    bucket = F.timestamp_seconds((F.unix_timestamp(F.col(ts_col)) / step).cast("long") * step)
    per_bucket = (
        df.select(F.col(series_col).alias("_s"), bucket.alias("bucket"), value_col.alias("_v"))
        .groupBy("_s", "bucket")
        .agg(F.count(F.lit(1)).alias("n"), getattr(F, agg)("_v").alias("_agg"))
    )
    if round_to is not None:
        per_bucket = per_bucket.withColumn("_agg", F.round("_agg", round_to))

    span = df.agg(
        F.min(F.unix_timestamp(F.col(ts_col))).alias("_lo"),
        F.max(F.unix_timestamp(F.col(ts_col))).alias("_hi"),
    )
    grid = (
        per_bucket.select("_s")
        .distinct()
        .join(F.broadcast(span))
        .select(
            "_s",
            F.explode(
                F.sequence(
                    (F.col("_lo") / step).cast("long") * step,
                    (F.col("_hi") / step).cast("long") * step,
                    step,
                )
            ).alias("_b"),
        )
        .select("_s", F.timestamp_seconds(F.col("_b")).alias("bucket"))
    )
    w = Window.partitionBy("_s").orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        grid.join(per_bucket, ["_s", "bucket"], "left")
        .select(
            F.col("_s").alias(series_col),
            "bucket",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.last("_agg", ignorenulls=True).over(w).alias("filled"),
        )
    )


def downsample_interpolate(
    df: DataFrame,
    series_col: str,
    ts_col: str,
    value_col: Column,
    interval_sec: int,
    agg: str = "avg",
    agg_round_to: int | None = 2,
    round_to: int | None = 4,
) -> DataFrame:
    """LOCF's sibling with LINEAR interpolation across gaps: empty
    buckets get prev + (next - prev) * (t - t_prev) / (t_next - t_prev)
    between the surrounding observed buckets; after the last
    observation the fill degrades to LOCF (nothing to interpolate
    toward), before the first it stays null -- the standard
    sensor/metrics resampling contract.

    Same scale shape as downsample_locf (one keyed aggregate shuffle,
    generated grid, broadcast span): the interpolation needs TWO window
    passes over the same (series ORDER BY bucket) sort -- backward
    (last prev value/time) and forward (first next value/time) -- and
    Spark plans both over ONE exchange+sort since the partitioning and
    ordering match (windows-family exchange-reuse plan test).

    Bucket aggregates are rounded to ``agg_round_to`` BEFORE
    interpolating (identical inputs on both engines); the interpolated
    value itself is a fixed four-op expression over those inputs, so it
    is engine-portable, and is rounded to ``round_to`` at the end for
    the oracle compare.
    """
    step = F.lit(int(interval_sec))
    bucket = F.timestamp_seconds((F.unix_timestamp(F.col(ts_col)) / step).cast("long") * step)
    per_bucket = (
        df.select(F.col(series_col).alias("_s"), bucket.alias("bucket"), value_col.alias("_v"))
        .groupBy("_s", "bucket")
        .agg(F.count(F.lit(1)).alias("n"), getattr(F, agg)("_v").alias("_agg"))
    )
    if agg_round_to is not None:
        per_bucket = per_bucket.withColumn("_agg", F.round("_agg", agg_round_to))

    span = df.agg(
        F.min(F.unix_timestamp(F.col(ts_col))).alias("_lo"),
        F.max(F.unix_timestamp(F.col(ts_col))).alias("_hi"),
    )
    grid = (
        per_bucket.select("_s")
        .distinct()
        .join(F.broadcast(span))
        .select(
            "_s",
            F.explode(
                F.sequence(
                    (F.col("_lo") / step).cast("long") * step,
                    (F.col("_hi") / step).cast("long") * step,
                    step,
                )
            ).alias("_b"),
        )
        .select("_s", F.timestamp_seconds(F.col("_b")).alias("bucket"))
    )
    back = Window.partitionBy("_s").orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    fwd = Window.partitionBy("_s").orderBy("bucket").rowsBetween(0, Window.unboundedFollowing)
    b_sec = F.unix_timestamp(F.col("bucket"))
    obs_sec = F.when(F.col("_agg").isNotNull(), b_sec)
    joined = (
        grid.join(per_bucket, ["_s", "bucket"], "left")
        .withColumn("_pv", F.last("_agg", ignorenulls=True).over(back))
        .withColumn("_pt", F.last(obs_sec, ignorenulls=True).over(back))
        .withColumn("_nv", F.first("_agg", ignorenulls=True).over(fwd))
        .withColumn("_nt", F.first(obs_sec, ignorenulls=True).over(fwd))
    )
    interp = (
        F.when(F.col("_agg").isNotNull(), F.col("_agg"))
        .when(F.col("_pv").isNull(), F.lit(None).cast("double"))
        .when(F.col("_nv").isNull(), F.col("_pv"))
        .otherwise(
            F.col("_pv")
            + (F.col("_nv") - F.col("_pv"))
            * (b_sec - F.col("_pt"))
            / (F.col("_nt") - F.col("_pt"))
        )
    )
    if round_to is not None:
        interp = F.round(interp, round_to)
    return joined.select(
        F.col("_s").alias(series_col),
        "bucket",
        F.coalesce("n", F.lit(0)).alias("n"),
        interp.alias("filled"),
    )


def best_changepoint(
    df: DataFrame,
    series_col: str,
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Single best changepoint per series: the split minimizing total
    within-segment SSE (binary segmentation, depth 1 -- the first step
    of PELT/BinSeg) found in CLOSED FORM from running sums, no per-group
    Python and no candidate-split explosion:

        cost(t) = [S2(t) - S1(t)^2/t] + [(T2-S2(t)) - (T1-S1(t))^2/(n-t)]

    with S1/S2 the ordered prefix sums of value and value^2 and T1/T2/n
    the series totals. One (series ORDER BY order) window computes the
    prefixes; totals ride the same partition (whole-partition frame
    reuses the exchange); the argmin is a min-struct aggregate with
    earliest-split tie-break. Prefix sums accumulate in ORDER, so those
    are bit-identical across engines -- but the whole-series totals are
    order-FREE aggregates whose ulp noise (~1e-6 of a ~1e5 cost) must
    never decide a winner, so costs are floor(x+0.5)-snapped to INTEGER
    resolution before the argmin: near-ties become true ties, broken by
    earliest split identically everywhere. SSE at integer resolution
    loses nothing (between-split gaps are orders of magnitude larger).

    Cost per series is O(n) rows through ONE exchange; at 100 TB this is
    the same shape as any per-series window. Returns one row per series:
    n, split (order value of the LAST point of the left segment), left/
    right means, and the SSE drop vs the unsplit segment.
    """
    w = Window.partitionBy("_s").orderBy("_o").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy("_s")
    base = (
        df.select(
            F.col(series_col).alias("_s"), F.col(order_col).alias("_o"), F.col(value_col).alias("_v")
        )
        .withColumn("_t", F.row_number().over(Window.partitionBy("_s").orderBy("_o")))
        .withColumn("_s1", F.sum("_v").over(w))
        .withColumn("_s2", F.sum(F.col("_v") * F.col("_v")).over(w))
        .withColumn("_n", F.count(F.lit(1)).over(wall))
        .withColumn("_t1", F.sum("_v").over(wall))
        .withColumn("_t2", F.sum(F.col("_v") * F.col("_v")).over(wall))
    )
    t, n = F.col("_t"), F.col("_n")
    s1, s2, t1, t2 = F.col("_s1"), F.col("_s2"), F.col("_t1"), F.col("_t2")
    cost = F.floor((s2 - s1 * s1 / t) + ((t2 - s2) - (t1 - s1) * (t1 - s1) / (n - t)) + F.lit(0.5))
    cand = base.filter(t < n).withColumn("_cost", cost)
    best = cand.groupBy("_s").agg(
        F.min(F.struct(F.col("_cost"), F.col("_t"), F.col("_o"), F.col("_s1"), F.col("_n"), F.col("_t1"), F.col("_t2"), F.col("_s2"))).alias("_m")
    )
    m = F.col("_m")
    total_sse = F.floor(m["_t2"] - m["_t1"] * m["_t1"] / m["_n"] + F.lit(0.5))
    return best.select(
        F.col("_s").alias(series_col),
        m["_n"].alias("n"),
        m["_o"].alias("split"),
        (m["_s1"] / m["_t"]).alias("mean_left"),
        ((m["_t1"] - m["_s1"]) / (m["_n"] - m["_t"])).alias("mean_right"),
        (total_sse - m["_cost"]).alias("sse_drop"),
    )


def sweep_concurrency(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
    num_parts: int = 32,
    method: str = "scan",
) -> DataFrame:
    """Interval-overlap sweep line: per key, the peak number of
    simultaneously-open intervals and the first instant it is reached.

    Intervals are half-open [start, end): an interval ending exactly
    when another starts does NOT overlap it, enforced by ordering the
    boundary stream (ts, delta) so -1 sorts before +1 at ties.

    Scale design -- the classic formulation is a per-key ordered prefix
    sum, which is fine when keys are many (each window partition is one
    key's timeline) but collapses few massive keys into single tasks.
    This implementation uses the hierarchical scan from packing.py
    generalized to keyed boundaries, for the LOW-cardinality regime
    (keys <= ~thousands; the driver holds num_parts x n_keys longs):

    1. explode each interval to (+1 at start, -1 at end) -- row-local;
    2. range-partition the boundary stream by (key, ts, delta) so each
       partition holds a contiguous slice of each key's timeline;
    3. per-(partition, key) delta totals -> driver (bounded rows),
       exclusive-prefix-summed per key in partition order;
    4. broadcast offsets back; intra-partition running sum via an
       ordinary partitioned window + offset = exact global prefix sum
       WITHOUT a single-partition window;
    5. peak = max(prefix), first_peak_ts = min ts where prefix == peak
       (tie-order independent: within an equal-(ts,delta) run the max
       is attained at the run's end regardless of intra-run order).

    For high-cardinality keys, pass ``method="window"``: the plain
    per-key ordered window -- one exchange, parallel across keys, each
    key's timeline in one task (fine when no key dominates).
    """
    plus = df.select(
        F.col(key_col).alias("_k"), F.col(start_col).alias("_bt"), F.lit(1).alias("_d")
    )
    minus = df.select(
        F.col(key_col).alias("_k"), F.col(end_col).alias("_bt"), F.lit(-1).alias("_d")
    )
    if method == "window":
        w = Window.partitionBy("_k").orderBy("_bt", "_d")
        conc = plus.unionByName(minus).withColumn("_conc", F.sum("_d").over(w).cast("long"))
        # per-key peak via a whole-partition window over the SAME key
        # partitioning -- reuses the running-sum exchange instead of a
        # groupBy + broadcast-join back (this path is the HIGH-cardinality
        # regime: a forced broadcast of one-row-per-key is O(#keys) driver
        # memory and defeats the point)
        wk = Window.partitionBy("_k")
        return (
            conc.withColumn("peak", F.max("_conc").over(wk))
            .filter(F.col("_conc") == F.col("peak"))
            .groupBy(F.col("_k").alias(key_col), "peak")
            .agg(F.min("_bt").alias("first_peak_ts"))
        )
    if method != "scan":
        raise ValueError(f"method must be 'scan' or 'window', got {method!r}")
    ranged = persist_once(
        plus.unionByName(minus)
        .repartitionByRange(num_parts, F.col("_k"), F.col("_bt"), F.col("_d"))
        .withColumn("_pid", F.spark_partition_id())
    )
    totals = ranged.groupBy("_pid", "_k").agg(F.sum("_d").alias("_t")).collect()
    acc: dict[object, int] = {}
    offsets = []
    # null keys are a group of their own (sorted first via the presence
    # flag -- None is not comparable to str/int)
    for row in sorted(totals, key=lambda r: (r["_k"] is not None, r["_k"] if r["_k"] is not None else 0, r["_pid"])):
        offsets.append((row["_pid"], row["_k"], acc.get(row["_k"], 0)))
        acc[row["_k"]] = acc.get(row["_k"], 0) + (row["_t"] or 0)
    spark = df.sparkSession
    from pyspark.sql.types import LongType, StructField, StructType

    off_schema = StructType(
        [
            StructField("_pid", ranged.schema["_pid"].dataType),
            StructField("_k", ranged.schema["_k"].dataType),
            StructField("_off", LongType()),
        ]
    )
    # explicit schema: survives empty input and all-null keys, where
    # inference would fail
    off = spark.createDataFrame(offsets, off_schema)
    w = Window.partitionBy("_pid", "_k").orderBy("_bt", "_d")
    join_cond = (F.col("_lc._pid") == F.col("_rc._pid")) & F.col("_lc._k").eqNullSafe(
        F.col("_rc._k")
    )
    conc = (
        ranged.withColumn("_local", F.sum("_d").over(w))
        .alias("_lc")
        .join(F.broadcast(off.alias("_rc")), join_cond)
        .select("_lc.*", F.col("_rc._off").alias("_off"))
        .withColumn("_conc", (F.col("_local") + F.col("_off")).cast("long"))
    )
    # ONE aggregation instead of peak-rollup + broadcast-join-back +
    # filter (r13, VERDICT r12 #10): min over (-conc, ts) structs picks
    # the max concurrency and, among its ties, the earliest instant --
    # struct comparison is lexicographic with native type ordering, so
    # no timestamp re-encoding is needed and _conc (long) negates
    # exactly. Differential-pinned against the window form.
    m = F.min(F.struct((-F.col("_conc")).alias("nc"), F.col("_bt").alias("bt")))
    out = (
        conc.groupBy(F.col("_k").alias(key_col))
        .agg(m.alias("_m"))
        .select(
            key_col,
            (-F.col("_m.nc")).cast("long").alias("peak"),
            F.col("_m.bt").alias("first_peak_ts"),
        )
    )
    # materialize the (tiny: one row per key) result so the boundary
    # cache can be released now instead of leaking for the session
    out = persist_once(out)
    out.count()
    ranged.unpersist()
    return out


def coalesce_intervals(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
    num_parts: int = 32,
) -> DataFrame:
    """Merge overlapping-OR-touching half-open ``[start, end)`` intervals
    per key into maximal islands; returns one row per island
    ``(key, island_start, island_end)``.

    Semantics: an interval ending exactly when another starts MERGES
    with it (the complement of sweep_concurrency's tie rule) -- the
    gaps-and-islands contract ``next.start <= running_max(end)``.

    Scale design: boundaries are NETTED per (key, instant) first (one
    keyed rollup; +1 for starts, -1 for ends, simultaneous boundaries
    collapse to one strictly-ordered row per instant -- which is also
    what makes the merge rule order-free: a -1/+1 pair at the same
    instant nets to 0 so coverage never visibly dips), then the running
    coverage count comes from the SAME hierarchical keyed prefix scan
    as sweep_concurrency: range partition by (key, instant),
    per-(partition, key) totals to the driver (bounded rows), exclusive
    offsets broadcast back, intra-partition window. Island boundaries
    are the instants where coverage enters / leaves zero; starts and
    ends strictly alternate per key, so the k-th start joins the k-th
    end by a row_number over the MARKER rows (2 per island, already
    coverage-compressed -- not per interval).
    """
    plus = df.select(F.col(key_col).alias("_k"), F.col(start_col).alias("_bt"), F.lit(1).alias("_d"))
    minus = df.select(F.col(key_col).alias("_k"), F.col(end_col).alias("_bt"), F.lit(-1).alias("_d"))
    net = (
        plus.unionByName(minus)
        .groupBy("_k", "_bt")
        .agg(F.sum("_d").alias("_net"))
        .filter(F.col("_net") != 0)
    )
    ranged = persist_once(
        net.repartitionByRange(num_parts, F.col("_k"), F.col("_bt"))
        .withColumn("_pid", F.spark_partition_id())
    )
    totals = ranged.groupBy("_pid", "_k").agg(F.sum("_net").alias("_t")).collect()
    acc: dict[object, int] = {}
    offsets = []
    for row in sorted(
        totals,
        key=lambda r: (r["_k"] is not None, r["_k"] if r["_k"] is not None else 0, r["_pid"]),
    ):
        offsets.append((row["_pid"], row["_k"], acc.get(row["_k"], 0)))
        acc[row["_k"]] = acc.get(row["_k"], 0) + (row["_t"] or 0)
    spark = df.sparkSession
    from pyspark.sql.types import LongType, StructField, StructType

    off_schema = StructType(
        [
            StructField("_pid", ranged.schema["_pid"].dataType),
            StructField("_k", ranged.schema["_k"].dataType),
            StructField("_off", LongType()),
        ]
    )
    off = spark.createDataFrame(offsets, off_schema)
    w = Window.partitionBy("_pid", "_k").orderBy("_bt")
    join_cond = (F.col("_lc._pid") == F.col("_rc._pid")) & F.col("_lc._k").eqNullSafe(
        F.col("_rc._k")
    )
    conc = (
        ranged.withColumn("_local", F.sum("_net").over(w))
        .alias("_lc")
        .join(F.broadcast(off.alias("_rc")), join_cond)
        .select("_lc.*", F.col("_rc._off").alias("_off"))
        .withColumn("_after", (F.col("_local") + F.col("_off")).cast("long"))
        .withColumn("_before", F.col("_after") - F.col("_net"))
    )
    markers = conc.filter(
        ((F.col("_before") == 0) & (F.col("_after") > 0))
        | ((F.col("_after") == 0) & (F.col("_before") > 0))
    ).select("_k", "_bt", (F.col("_before") == 0).alias("_is_start"))
    mw = Window.partitionBy("_k", "_is_start").orderBy("_bt")
    numbered = markers.withColumn("_rn", F.row_number().over(mw))
    starts = numbered.filter("_is_start").select(
        F.col("_k"), F.col("_rn"), F.col("_bt").alias("island_start")
    )
    ends = numbered.filter(~F.col("_is_start")).select(
        F.col("_k").alias("_k2"), F.col("_rn").alias("_rn2"), F.col("_bt").alias("island_end")
    )
    out = starts.join(
        ends,
        (F.col("_rn") == F.col("_rn2")) & F.col("_k").eqNullSafe(F.col("_k2")),
    ).select(F.col("_k").alias(key_col), "island_start", "island_end")
    out = persist_once(out)
    out.count()
    ranged.unpersist()
    return out


def matrix_profile(
    series: DataFrame,
    m: int,
    excl: int | None = None,
    max_diag: int | None = None,
    series_col: str = "series",
    t_col: str = "t",
    value_col: str = "v",
    round_dp: int | None = None,
) -> DataFrame:
    """Exact z-normalized matrix profile (Yeh et al., ICDM'16) over
    dense long-form series: for every length-``m`` subsequence
    ``T[i..i+m)`` of each series, the minimal z-normalized Euclidean
    distance to any OTHER subsequence of the same series at least
    ``excl`` apart (default m//2, the standard trivial-match exclusion
    zone), plus the argmin index. Input rows are
    ``(series_col, t_col, value_col)`` with ``t`` a dense 0..n-1
    integer grid per series (gaps would silently misalign windows --
    callers fill them first, cf. ``downsample_locf``'s dense grid).
    Output: ``(series_col, t, mp_dist, mp_index)``; a window appears
    iff it has at least one admissible neighbor.

    Construction (relational SCRIMP; no arrays, no UDF): the dot
    product QT(i, i+d) = sum_t T[t]*T[t+d] over t in [i, i+m) is, per
    diagonal d, a length-m sliding sum of the product series
    P_d(t) = T[t]*T[t+d] -- so ONE self-join on the series key with
    ``b.t - a.t > excl`` materializes every diagonal's product series,
    and a single (series, d)-partitioned window turns them all into
    QT values. Window means/stds come from the same sliding-sum shape
    on T itself; both engines then evaluate the identical closed form
    dist^2 = 2m(1 - (QT - m*mu_i*mu_j)/(m*sig_i*sig_j)), correlation
    clamped to [-1, 1]. All sliding sums are over the raw values --
    keep ``value_col`` INTEGRAL for the cross-engine exactness
    contract (integer sums are association-free; float window sums
    are not, cf. ts_dtw_shape_distance's micro-unit note).

    Zero-variance windows (conventional, matches stumpy): both windows
    constant -> 0; exactly one constant -> sqrt(m) (the constant
    window z-normalizes to the zero vector).

    Scale contract: the pair fan-out is Theta(n^2/2) rows PER SERIES
    -- inherent to the exact profile -- but it is series-length-bound,
    NOT corpus-bound (the corpus-sized pass is whatever rollup built
    the series), and its parallel axis is the diagonal: every
    (series, d) partition is an independent O(n) sliding sum, so a
    1000-executor run shards one long series across n-m-excl tasks.
    ``max_diag`` is the documented scale valve (the bounded/local
    matrix profile): restricting |i-j| <= max_diag caps the fan-out at
    O(n * max_diag) and keeps every LOCAL motif; the registered-query
    form keeps it None (exact global profile, the oracle's contract).

    ``round_dp``: when set, distances are rounded to that many
    decimals BEFORE the argmin (tie broken by smaller index) and in
    the output -- the cross-engine determinism knob: two engines'
    IEEE doubles can drift in the last ulp, so ranking on the rounded
    value pins identical (mp_dist, mp_index) on both.
    """
    if m < 2:
        raise ValueError(f"matrix_profile: window m must be >= 2, got {m}")
    if excl is None:
        excl = m // 2
    if excl < 0:
        raise ValueError(f"matrix_profile: excl must be >= 0, got {excl}")
    if max_diag is not None and max_diag <= excl:
        raise ValueError(
            f"matrix_profile: max_diag ({max_diag}) must exceed excl ({excl})"
        )

    s = series.select(
        F.col(series_col).alias("_s"),
        F.col(t_col).cast("long").alias("_t"),
        F.col(value_col).alias("_v"),
    )
    s = persist_once(s)

    fm = float(m)
    ws = Window.partitionBy("_s").orderBy("_t").rowsBetween(0, m - 1)
    stats0 = s.select(
        "_s",
        "_t",
        F.sum("_v").over(ws).alias("_sm"),
        F.sum(F.col("_v") * F.col("_v")).over(ws).alias("_sq"),
        F.count(F.lit(1)).over(ws).alias("_c"),
    ).filter(F.col("_c") == m)
    mu = F.col("_sm").cast("double") / F.lit(fm)
    sig = F.sqrt(
        F.greatest(
            F.col("_sq").cast("double") / F.lit(fm) - mu * mu, F.lit(0.0)
        )
    )
    stats = stats0.select("_s", "_t", mu.alias("_mu"), sig.alias("_sig"))

    if max_diag is None:
        a, b = s.alias("_a"), s.alias("_b")
        diag = F.col("_b._t") - F.col("_a._t")
        cond = (F.col("_a._s") == F.col("_b._s")) & (diag > excl)
        prods = a.join(b, cond).select(
            F.col("_a._s").alias("_s"),
            diag.alias("_d"),
            F.col("_a._t").alias("_t"),
            (F.col("_a._v") * F.col("_b._v")).alias("_p"),
        )
    else:
        # valve mode is a true BAND join (the point_in_interval_join
        # bucketing idiom): a plain range predicate on the series-key
        # join would still ENUMERATE all n^2/2 pairs per series and
        # filter -- flat at n=16k but Theta(n^2) predicate work at
        # corpus-span lengths. Bucket t by width max_diag; a row's
        # admissible partners (t+excl+1 .. t+max_diag) live in its own
        # or the next bucket, so an EQUI-join on (series, bucket) with
        # a 2x left-side fan-out generates <= 2*n*max_diag candidates
        # -- O(n * max_diag) generated, not just retained.
        w_ = int(max_diag)
        a2 = s.select(
            "_s",
            "_t",
            "_v",
            F.explode(
                F.array(
                    F.expr(f"_t div {w_}"), F.expr(f"_t div {w_} + 1")
                )
            ).alias("_jbk"),
        )
        b2 = s.select(
            F.col("_s").alias("_bs"),
            F.col("_t").alias("_bt"),
            F.col("_v").alias("_bv"),
            F.expr(f"_t div {w_}").alias("_bbk"),
        )
        diag = F.col("_bt") - F.col("_t")
        prods = (
            a2.join(
                b2,
                (F.col("_s") == F.col("_bs")) & (F.col("_jbk") == F.col("_bbk")),
            )
            .filter((diag > excl) & (diag <= max_diag))
            .select(
                "_s",
                diag.alias("_d"),
                "_t",
                (F.col("_v") * F.col("_bv")).alias("_p"),
            )
        )
    wq = Window.partitionBy("_s", "_d").orderBy("_t").rowsBetween(0, m - 1)
    qt = (
        prods.select(
            "_s",
            "_d",
            "_t",
            F.sum("_p").over(wq).alias("_qt"),
            F.count(F.lit(1)).over(wq).alias("_c"),
        )
        .filter(F.col("_c") == m)
        .drop("_c")
    )

    si = stats.select(
        F.col("_s").alias("_si_s"), F.col("_t").alias("_si_t"),
        F.col("_mu").alias("_mu_i"), F.col("_sig").alias("_sig_i"),
    )
    sj = stats.select(
        F.col("_s").alias("_sj_s"), F.col("_t").alias("_sj_t"),
        F.col("_mu").alias("_mu_j"), F.col("_sig").alias("_sig_j"),
    )
    # stats is one row per window: n-m+1 rows per series -- broadcast
    # both probes so the only data-scale exchange stays the diagonal
    # window's (series, d) hash partitioning
    joined = qt.join(
        F.broadcast(si),
        (F.col("_s") == F.col("_si_s")) & (F.col("_t") == F.col("_si_t")),
    ).join(
        F.broadcast(sj),
        (F.col("_s") == F.col("_sj_s"))
        & ((F.col("_t") + F.col("_d")) == F.col("_sj_t")),
    )
    corr = (
        F.col("_qt").cast("double") - F.lit(fm) * F.col("_mu_i") * F.col("_mu_j")
    ) / (F.lit(fm) * F.col("_sig_i") * F.col("_sig_j"))
    corr_c = F.least(F.lit(1.0), F.greatest(F.lit(-1.0), corr))
    dist = (
        F.when((F.col("_sig_i") == 0) & (F.col("_sig_j") == 0), F.lit(0.0))
        .when((F.col("_sig_i") == 0) | (F.col("_sig_j") == 0), F.sqrt(F.lit(fm)))
        .otherwise(F.sqrt(F.lit(2.0) * F.lit(fm) * (F.lit(1.0) - corr_c)))
    )
    if round_dp is not None:
        dist = F.round(dist, round_dp)
    # persist the one-directional edge set: the symmetric union below
    # would otherwise re-run the whole Theta(n^2) diagonal pipeline for
    # its second branch
    edges = persist_once(
        joined.select(
            "_s",
            F.col("_t").alias("_w"),
            (F.col("_t") + F.col("_d")).alias("_o"),
            dist.alias("_dist"),
        )
    )
    sym = edges.unionByName(
        edges.select(
            "_s",
            F.col("_o").alias("_w"),
            F.col("_w").alias("_o"),
            "_dist",
        )
    )
    # struct-min = partial-aggregable argmin (map-side combine; no
    # row_number sort shuffle); ties break on the smaller index
    prof = sym.groupBy("_s", "_w").agg(
        F.min(F.struct(F.col("_dist"), F.col("_o"))).alias("_m")
    )
    return prof.select(
        F.col("_s").alias(series_col),
        F.col("_w").alias("t"),
        F.col("_m._dist").alias("mp_dist"),
        F.col("_m._o").alias("mp_index"),
    )


def holt_winters_additive(
    df: DataFrame,
    p: int,
    horizon: int,
    alpha: float = 0.3,
    beta: float = 0.1,
    gamma: float = 0.2,
    series_col: str = "series",
    t_col: str = "t",
    value_col: str = "v",
) -> DataFrame:
    """Additive Holt-Winters (triple exponential smoothing, Winters
    1960) per series, forecast ``horizon`` steps ahead: the classic
    level/trend/seasonal recurrence

        L_t = a*(v_t - S_{t-p}) + (1-a)*(L_{t-1} + B_{t-1})
        B_t = b*(L_t - L_{t-1}) + (1-b)*B_{t-1}
        S_t = g*(v_t - L_t) + (1-g)*S_{t-p}

    seeded by the simple two-season init (L0 = mean of season one,
    B0 = (mean of season two - mean of season one)/p, S_i = v_i - L0)
    and read out as yhat(h) = L_n + h*B_n + S at phase (n-1+h) mod p.
    Input is dense long-form ``(series, t 0..n-1, v)``; series shorter
    than 2p are dropped (not enough data to seed). Output:
    ``(series, h, yhat, level, trend)``, one row per horizon step.

    Like ts_dtw_shape_distance, the strictly-sequential recurrence runs
    as ONE SQL aggregate() fold inside whole-stage codegen — the
    accumulator is (level, trend, seasonal ring of p doubles); no UDF,
    no Python, no shuffle beyond the per-series collect. Cross-engine
    exactness: keep ``value_col`` INTEGRAL (the init means are then
    exact), smoothing constants are injected as repr literals parsed
    identically by both engines, and the oracle's recursive CTE
    executes the same operation order, so outputs match bit-exactly
    before the final rounding.

    Scale contract: one keyed shuffle to assemble each series (the
    per-series array is series-length-bounded — this is a per-entity
    forecaster, not a corpus-length one), then O(n) fold work per
    series with no further exchange; a million entities = a million
    independent constant-size rows.
    """
    if p < 2:
        raise ValueError(f"holt_winters_additive: period p must be >= 2, got {p}")
    if horizon < 1:
        raise ValueError(
            f"holt_winters_additive: horizon must be >= 1, got {horizon}"
        )
    for nm, x in (("alpha", alpha), ("beta", beta), ("gamma", gamma)):
        if not 0.0 < x < 1.0:
            raise ValueError(f"holt_winters_additive: {nm} must be in (0,1), got {x}")

    al, be, ga = repr(float(alpha)), repr(float(beta)), repr(float(gamma))
    oma, omb, omg = (
        repr(1.0 - float(alpha)),
        repr(1.0 - float(beta)),
        repr(1.0 - float(gamma)),
    )
    arrs = (
        df.select(
            F.col(series_col).alias("_s"),
            F.col(t_col).cast("long").alias("_t"),
            F.col(value_col).cast("double").alias("_x"),
        )
        .groupBy("_s")
        .agg(F.array_sort(F.collect_list(F.struct("_t", "_x")))._x.alias("_v"))
        .filter(F.size("_v") >= 2 * p)
    )
    pd_ = f"cast({p} as double)"
    init = arrs.select(
        "_s",
        "_v",
        F.expr(
            f"aggregate(slice(_v, 1, {p}), cast(0.0 as double), (a, x) -> a + x)"
            f" / {pd_}"
        ).alias("_l0"),
    ).select(
        "_s",
        "_v",
        "_l0",
        F.expr(
            f"(aggregate(slice(_v, {p + 1}, {p}), cast(0.0 as double),"
            f" (a, x) -> a + x) / {pd_} - _l0) / {pd_}"
        ).alias("_b0"),
        F.expr(f"transform(slice(_v, 1, {p}), x -> x - _l0)").alias("_ss0"),
    )
    # L_t appears (textually) three times in the step -- SQL lambdas
    # can't bind intermediates -- but an identical expression tree
    # yields the identical double, so this matches the oracle's
    # bound-once form exactly
    lnew = (
        f"({al} * (element_at(_v, t + 1) - element_at(acc.ss, (t % {p}) + 1))"
        f" + {oma} * (acc.lv + acc.tr))"
    )
    fold = f"""
aggregate(
  sequence({p}, size(_v) - 1),
  named_struct('lv', _l0, 'tr', _b0, 'ss', _ss0),
  (acc, t) -> named_struct(
    'lv', {lnew},
    'tr', {be} * ({lnew} - acc.lv) + {omb} * acc.tr,
    'ss', concat(
      slice(acc.ss, 1, t % {p}),
      array({ga} * (element_at(_v, t + 1) - {lnew})
            + {omg} * element_at(acc.ss, (t % {p}) + 1)),
      slice(acc.ss, (t % {p}) + 2, {p}))
  )
)
"""
    fin = init.withColumn("_hw", F.expr(fold))
    return (
        fin.select(
            "_s",
            F.col("_hw.lv").alias("_lv"),
            F.col("_hw.tr").alias("_tr"),
            F.col("_hw.ss").alias("_ss"),
            F.size("_v").alias("_n"),
            F.explode(F.sequence(F.lit(1), F.lit(horizon))).alias("h"),
        )
        .select(
            F.col("_s").alias(series_col),
            F.col("h").cast("int").alias("h"),
            (
                F.col("_lv")
                + F.col("h").cast("double") * F.col("_tr")
                + F.expr(f"element_at(_ss, ((_n - 1 + h) % {p}) + 1)")
            ).alias("yhat"),
            F.col("_lv").alias("level"),
            F.col("_tr").alias("trend"),
        )
    )


def pattern_search(
    series: DataFrame,
    query: DataFrame,
    m: int,
    series_col: str = "series",
    t_col: str = "t",
    value_col: str = "v",
    q_t_col: str = "qt",
    q_value_col: str = "qv",
    top_k: int | None = None,
    round_dp: int | None = None,
) -> DataFrame:
    """Z-normalized subsequence search (the MASS readout, Mueen et al.
    2015): the distance of EVERY length-``m`` window of every series to
    ONE shared query pattern — "where does this shape occur?", the
    query-driven sibling of ``matrix_profile`` (same z-norm distance,
    same zero-variance conventions: both flat -> 0, exactly one flat ->
    sqrt(m)). ``query`` is dense long-form ``(q_t_col 0..m-1,
    q_value_col)``; windows are ranked per series by (distance, t) when
    ``top_k`` is set, else all windows return. Output:
    ``(series, t, dist[, rank])``.

    Construction: QT(i) = sum_k T[i+k]*Q[k] comes from ONE
    broadcast-join of the series against the m-row query (product rows
    keyed by window start i = t - k), one (series, i) rollup — O(n*m)
    work, map-side combined, no window function on the product stream.
    Window stats are the same sliding integer sums as matrix_profile;
    query stats are a broadcast 1-row aggregate. Keep values INTEGRAL
    for the cross-engine exactness contract.

    Scale contract: everything is one pass over the series table plus
    an m-row broadcast — no self-join, no quadratic term; the top-k cut
    is a per-series window over n-m+1 rows (series-length-bounded).
    """
    if m < 2:
        raise ValueError(f"pattern_search: window m must be >= 2, got {m}")
    if top_k is not None and top_k < 1:
        raise ValueError(f"pattern_search: top_k must be >= 1, got {top_k}")

    fm = float(m)
    s = series.select(
        F.col(series_col).alias("_s"),
        F.col(t_col).cast("long").alias("_t"),
        F.col(value_col).alias("_x"),
    )
    q = query.select(
        F.col(q_t_col).cast("long").alias("_k"),
        F.col(q_value_col).alias("_q"),
    )
    # checked, not assumed (1-row bounded guard; collect_lint whitelist):
    # a query with MORE than m rows would otherwise score tail-boundary
    # windows against a products-count coincidence (pc == m met by the
    # wrong m products), and duplicate/missing q_t indexes would
    # double-count or drop products silently
    chk = q.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("_k").alias("nd"),
        F.min("_k").alias("lo"),
        F.max("_k").alias("hi"),
    ).collect()[0]
    if not (chk.n == m and chk.nd == m and chk.lo == 0 and chk.hi == m - 1):
        raise ValueError(
            "pattern_search: query must be dense 0..m-1 with exactly "
            f"m={m} rows (got n={chk.n}, distinct={chk.nd}, "
            f"range=[{chk.lo}, {chk.hi}])"
        )
    qstats = q.agg(
        F.sum("_q").alias("_qs"),
        F.sum(F.col("_q") * F.col("_q")).alias("_qq"),
    )
    qmu = F.col("_qs").cast("double") / F.lit(fm)
    qsig = F.sqrt(
        F.greatest(F.col("_qq").cast("double") / F.lit(fm) - qmu * qmu, F.lit(0.0))
    )

    ws = Window.partitionBy("_s").orderBy("_t").rowsBetween(0, m - 1)
    stats = (
        s.select(
            "_s",
            "_t",
            F.sum("_x").over(ws).alias("_sm"),
            F.sum(F.col("_x") * F.col("_x")).over(ws).alias("_sq"),
            F.count(F.lit(1)).over(ws).alias("_c"),
        )
        .filter(F.col("_c") == m)
        .drop("_c")
    )
    mu = F.col("_sm").cast("double") / F.lit(fm)
    sig = F.sqrt(
        F.greatest(F.col("_sq").cast("double") / F.lit(fm) - mu * mu, F.lit(0.0))
    )

    prods = (
        s.join(F.broadcast(q))
        .select("_s", (F.col("_t") - F.col("_k")).alias("_i"), (F.col("_x") * F.col("_q")).alias("_p"))
        .filter(F.col("_i") >= 0)
        .groupBy("_s", "_i")
        .agg(F.sum("_p").alias("_qt"), F.count(F.lit(1)).alias("_pc"))
        .filter(F.col("_pc") == m)
    )
    joined = (
        prods.join(
            stats.select("_s", F.col("_t").alias("_i"), mu.alias("_mu"), sig.alias("_sig")),
            ["_s", "_i"],
        )
        .crossJoin(F.broadcast(qstats.select(qmu.alias("_qmu"), qsig.alias("_qsig"))))
    )
    corr = (
        F.col("_qt").cast("double") - F.lit(fm) * F.col("_mu") * F.col("_qmu")
    ) / (F.lit(fm) * F.col("_sig") * F.col("_qsig"))
    corr_c = F.least(F.lit(1.0), F.greatest(F.lit(-1.0), corr))
    dist = (
        F.when((F.col("_sig") == 0) & (F.col("_qsig") == 0), F.lit(0.0))
        .when((F.col("_sig") == 0) | (F.col("_qsig") == 0), F.sqrt(F.lit(fm)))
        .otherwise(F.sqrt(F.lit(2.0) * F.lit(fm) * (F.lit(1.0) - corr_c)))
    )
    if round_dp is not None:
        dist = F.round(dist, round_dp)
    out = joined.select(
        F.col("_s").alias(series_col), F.col("_i").alias("t"), dist.alias("dist")
    )
    if top_k is None:
        return out
    wr = Window.partitionBy(series_col).orderBy("dist", "t")
    return (
        out.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= top_k)
        .select(series_col, "t", "dist", F.col("rank").cast("int").alias("rank"))
    )


def matrix_profile_ab(
    series: DataFrame,
    m: int,
    max_diag: int | None = None,
    series_col: str = "series",
    t_col: str = "t",
    value_col: str = "v",
    round_dp: int | None = None,
) -> DataFrame:
    """Matrix-profile AB-join across series (Yeh et al., ICDM'16 §AB):
    for every UNORDERED pair of distinct series in the frame, the
    minimal z-normalized distance between any length-``m`` window of
    one and any window of the other, plus the aligned window starts —
    "which streams share a shape, and exactly where". Same distance and
    zero-variance conventions as ``matrix_profile`` (no exclusion zone:
    cross-series matches are never trivial). Output:
    ``(series_a, series_b, t_a, t_b, dist)`` with series_a < series_b
    and ties broken on (dist, t_a, t_b) after ``round_dp`` rounding.

    Construction: for ORDERED pairs (A, B) and non-negative lags
    d = j - i, QT(i, i+d) is the length-m sliding sum of the product
    series A[t]*B[t+d] — one equi-join of the frame against itself on
    the series-pair inequality plus lag bounds, one
    (A, B, d)-partitioned window; the two orientations of each
    unordered pair cover negative lags by symmetry. Per-window stats
    are computed ONCE per series and broadcast to both probe sides.

    Scale contract: candidates are Theta(n^2/2) per ORDERED series
    pair — series-length-bounded, diagonal-parallel, exactly the
    ``matrix_profile`` story with the pair count as the second explicit
    axis (callers bound which series land in the frame); ``max_diag``
    caps the |lag| between aligned windows and bounds candidates at
    O(n * max_diag) per pair via the same bucketed band join as the
    self-join valve.
    """
    if m < 2:
        raise ValueError(f"matrix_profile_ab: window m must be >= 2, got {m}")
    if max_diag is not None and max_diag < 0:
        raise ValueError(
            f"matrix_profile_ab: max_diag must be >= 0, got {max_diag}"
        )

    fm = float(m)
    s = series.select(
        F.col(series_col).alias("_s"),
        F.col(t_col).cast("long").alias("_t"),
        F.col(value_col).alias("_v"),
    )
    s = persist_once(s)

    ws = Window.partitionBy("_s").orderBy("_t").rowsBetween(0, m - 1)
    stats0 = s.select(
        "_s",
        "_t",
        F.sum("_v").over(ws).alias("_sm"),
        F.sum(F.col("_v") * F.col("_v")).over(ws).alias("_sq"),
        F.count(F.lit(1)).over(ws).alias("_c"),
    ).filter(F.col("_c") == m)
    mu = F.col("_sm").cast("double") / F.lit(fm)
    sig = F.sqrt(
        F.greatest(F.col("_sq").cast("double") / F.lit(fm) - mu * mu, F.lit(0.0))
    )
    stats = stats0.select("_s", "_t", mu.alias("_mu"), sig.alias("_sig"))

    if max_diag is None:
        b2 = s.select(
            F.col("_s").alias("_bs"), F.col("_t").alias("_bt"), F.col("_v").alias("_bv")
        )
        lag = F.col("_bt") - F.col("_t")
        paired = s.join(b2, (F.col("_s") != F.col("_bs")) & (lag >= 0))
    else:
        w_ = max(int(max_diag), 1)
        a2 = s.select(
            "_s",
            "_t",
            "_v",
            F.explode(
                F.array(F.expr(f"_t div {w_}"), F.expr(f"_t div {w_} + 1"))
            ).alias("_jbk"),
        )
        b2 = s.select(
            F.col("_s").alias("_bs"),
            F.col("_t").alias("_bt"),
            F.col("_v").alias("_bv"),
            F.expr(f"_t div {w_}").alias("_bbk"),
        )
        lag = F.col("_bt") - F.col("_t")
        paired = a2.join(
            b2,
            (F.col("_s") != F.col("_bs")) & (F.col("_jbk") == F.col("_bbk")),
        ).filter((lag >= 0) & (lag <= max_diag))
    prods = paired.select(
        "_s",
        "_bs",
        lag.alias("_d"),
        "_t",
        (F.col("_v") * F.col("_bv")).alias("_p"),
    )

    wq = Window.partitionBy("_s", "_bs", "_d").orderBy("_t").rowsBetween(0, m - 1)
    qt = (
        prods.select(
            "_s",
            "_bs",
            "_d",
            "_t",
            F.sum("_p").over(wq).alias("_qt"),
            F.count(F.lit(1)).over(wq).alias("_c"),
        )
        .filter(F.col("_c") == m)
        .drop("_c")
    )
    si = stats.select(
        F.col("_s").alias("_si_s"), F.col("_t").alias("_si_t"),
        F.col("_mu").alias("_mu_i"), F.col("_sig").alias("_sig_i"),
    )
    sj = stats.select(
        F.col("_s").alias("_sj_s"), F.col("_t").alias("_sj_t"),
        F.col("_mu").alias("_mu_j"), F.col("_sig").alias("_sig_j"),
    )
    joined = qt.join(
        F.broadcast(si),
        (F.col("_s") == F.col("_si_s")) & (F.col("_t") == F.col("_si_t")),
    ).join(
        F.broadcast(sj),
        (F.col("_bs") == F.col("_sj_s"))
        & ((F.col("_t") + F.col("_d")) == F.col("_sj_t")),
    )
    corr = (
        F.col("_qt").cast("double") - F.lit(fm) * F.col("_mu_i") * F.col("_mu_j")
    ) / (F.lit(fm) * F.col("_sig_i") * F.col("_sig_j"))
    corr_c = F.least(F.lit(1.0), F.greatest(F.lit(-1.0), corr))
    dist = (
        F.when((F.col("_sig_i") == 0) & (F.col("_sig_j") == 0), F.lit(0.0))
        .when((F.col("_sig_i") == 0) | (F.col("_sig_j") == 0), F.sqrt(F.lit(fm)))
        .otherwise(F.sqrt(F.lit(2.0) * F.lit(fm) * (F.lit(1.0) - corr_c)))
    )
    if round_dp is not None:
        dist = F.round(dist, round_dp)
    # normalize each orientation to (lo, hi) with the window starts
    # following their series; the groupBy min then folds the two
    # orientations of every unordered pair (negative lags by symmetry)
    lo_first = F.col("_s") < F.col("_bs")
    edges = joined.select(
        F.when(lo_first, F.col("_s")).otherwise(F.col("_bs")).alias("_pa"),
        F.when(lo_first, F.col("_bs")).otherwise(F.col("_s")).alias("_pb"),
        F.when(lo_first, F.col("_t")).otherwise(F.col("_t") + F.col("_d")).alias("_ta"),
        F.when(lo_first, F.col("_t") + F.col("_d")).otherwise(F.col("_t")).alias("_tb"),
        dist.alias("_dist"),
    )
    best = edges.groupBy("_pa", "_pb").agg(
        F.min(F.struct(F.col("_dist"), F.col("_ta"), F.col("_tb"))).alias("_m")
    )
    return best.select(
        F.col("_pa").alias("series_a"),
        F.col("_pb").alias("series_b"),
        F.col("_m._ta").alias("t_a"),
        F.col("_m._tb").alias("t_b"),
        F.col("_m._dist").alias("dist"),
    )
