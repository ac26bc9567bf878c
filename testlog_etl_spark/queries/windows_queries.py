"""Oracle-paired `window` clause queries (SURVEY SS2.6 W1-W10) through the
JX runner.

Determinism notes (the driver hashes values order-insensitively, but
window VALUES depend on intra-partition order):

- every ordered window sorts by (ts, event_id) -- event_id is unique, so
  running/moving/positional values are reproducible on both engines;
- ranking-with-ties windows sort by the tied value alone: `rank` /
  `dense_rank` are functions of the VALUE, not the arrival order, so ties
  are safe there (row_number is only used under a unique sort);
- frame median/percentile is exact linear interpolation on both sides
  (Spark: sorted collect_list + interpolate, operators/windows.py W5;
  DuckDB: median/quantile_cont over the frame).

Scale: each distinct (partitionBy, orderBy) pair costs one shuffle; the
engine emits clauses in query order and Catalyst reuses the exchange when
consecutive clauses share partitioning (verified in test_plans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from testlog_etl_spark.query import run_jx
from testlog_etl_spark.suite import register
from testlog_etl_spark.tables import load_tables

R = 4


@register(
    "win_running_sum",
    doc="W1 partition+sort running frame, plus W9 window `where`: rows "
    "failing the predicate stay in the stream but add nothing.",
    oracle=f"""
SELECT event_id,
  ROUND(SUM(value) OVER w, {R}) AS running,
  ROUND(SUM(CASE WHEN value > 100 THEN value END) OVER w, {R}) AS running_big
FROM events
WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY event_id
""",
    bench=True,
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    tables = load_tables(spark, sf_dir, ("events",))
    out = run_jx(
        spark,
        {
            "from": "events",
            "window": [
                {
                    "name": "running",
                    "value": "value",
                    "aggregate": "sum",
                    "edges": ["event_type"],
                    "sort": ["ts", "event_id"],
                },
                {
                    "name": "running_big",
                    "value": "value",
                    "aggregate": "sum",
                    "edges": ["event_type"],
                    "sort": ["ts", "event_id"],
                    "where": {"gt": ["value", {"literal": 100}]},
                },
            ],
            "sort": "event_id",
        },
        tables,
    )
    return out.select("event_id", F.round("running", R).alias("running"), F.round("running_big", R).alias("running_big"))


@register(
    "win_moving_frame",
    doc="W2 rows-based frame {min:-6,max:0}: moving avg/min over the "
    "trailing 7 rows per event_type.",
    oracle=f"""
SELECT event_id,
  ROUND(AVG(value) OVER w, {R}) AS mov_avg,
  ROUND(MIN(value) OVER w, {R}) AS mov_min
FROM events
WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
ORDER BY event_id
""",
)
def win_moving_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    tables = load_tables(spark, sf_dir, ("events",))
    base = {"edges": ["event_type"], "sort": ["ts", "event_id"], "range": {"min": -6, "max": 0}}
    out = run_jx(
        spark,
        {
            "from": "events",
            "window": [
                {"name": "mov_avg", "value": "value", "aggregate": "average", **base},
                {"name": "mov_min", "value": "value", "aggregate": "min", **base},
            ],
            "sort": "event_id",
        },
        tables,
    )
    return out.select("event_id", F.round("mov_avg", R).alias("mov_avg"), F.round("mov_min", R).alias("mov_min"))


@register(
    "win_ranking",
    doc="W7 rownum under a unique sort; W10 rank/dense_rank under a "
    "tie-heavy sort (rank is a function of the value, so ties are "
    "deterministic).",
    oracle="""
SELECT event_id,
  ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS rownum,
  RANK() OVER (PARTITION BY event_type ORDER BY user_id) AS rnk,
  DENSE_RANK() OVER (PARTITION BY event_type ORDER BY user_id) AS drnk
FROM events
ORDER BY event_id
""",
)
def win_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    tables = load_tables(spark, sf_dir, ("events",))
    out = run_jx(
        spark,
        {
            "from": "events",
            "window": [
                {"name": "rownum", "aggregate": "rownum", "edges": ["event_type"], "sort": ["ts", "event_id"]},
                {"name": "rnk", "aggregate": "rank", "edges": ["event_type"], "sort": ["user_id"]},
                {"name": "drnk", "aggregate": "dense_rank", "edges": ["event_type"], "sort": ["user_id"]},
            ],
            "sort": "event_id",
        },
        tables,
    )
    return out.select("event_id", "rownum", "rnk", "drnk")


@register(
    "win_lag_lead",
    doc="W8 / E28 rows[i] neighbor access: per-user previous/next value "
    "and the step delta.",
    oracle=f"""
SELECT event_id,
  ROUND(LAG(value, 1) OVER w, {R}) AS prev_value,
  ROUND(LEAD(value, 1) OVER w, {R}) AS next_value,
  ROUND(value - LAG(value, 1) OVER w, {R}) AS delta
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY event_id
""",
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    tables = load_tables(spark, sf_dir, ("events",))
    out = run_jx(
        spark,
        {
            "from": "events",
            "window": [
                {"name": "prev_value", "value": "value", "aggregate": "lag", "edges": ["user_id"], "sort": ["ts", "event_id"]},
                {"name": "next_value", "value": "value", "aggregate": "lead", "edges": ["user_id"], "sort": ["ts", "event_id"]},
            ],
            "sort": "event_id",
        },
        tables,
    )
    return out.select(
        "event_id",
        F.round("prev_value", R).alias("prev_value"),
        F.round("next_value", R).alias("next_value"),
        F.round(F.col("value") - F.col("prev_value"), R).alias("delta"),
    )


@register(
    "win_frame_median",
    doc="W5 hard spot: exact median + p90 over a sliding 10-row frame. "
    "Engine does sorted collect_list + linear interpolation (JVM array "
    "intrinsics); DuckDB median/quantile_cont interpolate identically.",
    oracle=f"""
SELECT event_id,
  ROUND(median(value) OVER w, {R}) AS med10,
  ROUND(quantile_cont(value, 0.9) OVER w, {R}) AS p90_10
FROM events
WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
             ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
ORDER BY event_id
""",
)
def win_frame_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    tables = load_tables(spark, sf_dir, ("events",))
    base = {"edges": ["event_type"], "sort": ["ts", "event_id"], "range": {"min": -9, "max": 0}}
    out = run_jx(
        spark,
        {
            "from": "events",
            "window": [
                {"name": "med10", "value": "value", "aggregate": "median", **base},
                {"name": "p90_10", "value": "value", "aggregate": "percentile", "percentile": 0.9, **base},
            ],
            "sort": "event_id",
        },
        tables,
    )
    return out.select("event_id", F.round("med10", R).alias("med10"), F.round("p90_10", R).alias("p90_10"))


@register(
    "win_partition_share",
    doc="W3 whole-partition aggregate (no sort, no range): each row's "
    "share of its event_type's total.",
    oracle=f"""
SELECT event_id,
  ROUND(value / SUM(value) OVER (PARTITION BY event_type), 6) AS share,
  COUNT(*) OVER (PARTITION BY event_type) AS part_n
FROM events
ORDER BY event_id
""",
)
def win_partition_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    tables = load_tables(spark, sf_dir, ("events",))
    out = run_jx(
        spark,
        {
            "from": "events",
            "window": [
                {"name": "part_total", "value": "value", "aggregate": "sum", "edges": ["event_type"]},
                {"name": "part_n", "value": ".", "aggregate": "count", "edges": ["event_type"]},
            ],
            "sort": "event_id",
        },
        tables,
    )
    return out.select(
        "event_id",
        F.round(F.col("value") / F.col("part_total"), 6).alias("share"),
        "part_n",
    )


@register(
    "ts_downsample_locf",
    doc="hypertable-style rollup: 15-min time_bucket sum per event_type "
    "over the DENSE per-series grid (explode(sequence), generated not "
    "shuffled), empty buckets gap-filled by last-observation-carried-"
    "forward (last ignoreNulls window, one value of state per series). "
    "Sum rounded at data resolution (2dp) BEFORE the fill so both "
    "engines carry identical values (operators/timeseries.py).",
    oracle="""
WITH b AS (
  SELECT event_type,
         to_timestamp((floor(epoch(ts))::BIGINT // 900) * 900)::TIMESTAMP AS bucket,
         count(*) AS n, ROUND(SUM(value), 2) AS agg
  FROM events GROUP BY 1, 2
),
span AS (
  SELECT (floor(epoch(min(ts)))::BIGINT // 900) * 900 AS lo,
         (floor(epoch(max(ts)))::BIGINT // 900) * 900 AS hi
  FROM events
),
grid AS (
  SELECT t.event_type, to_timestamp(g.s::BIGINT)::TIMESTAMP AS bucket
  FROM (SELECT DISTINCT event_type FROM events) t, span, unnest(range(span.lo, span.hi + 900, 900)) AS g(s)
)
SELECT grid.event_type AS event_type, grid.bucket AS bucket, coalesce(b.n, 0) AS n,
       last_value(b.agg IGNORE NULLS) OVER (
         PARTITION BY grid.event_type ORDER BY grid.bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
FROM grid LEFT JOIN b ON b.event_type = grid.event_type AND b.bucket = grid.bucket
ORDER BY grid.event_type, grid.bucket
""",
)
def ts_downsample_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from testlog_etl_spark.operators.timeseries import downsample_locf

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    out = downsample_locf(
        ev, "event_type", "ts", F.col("value"), interval_sec=900, agg="sum", round_to=2
    )
    return out.orderBy("event_type", "bucket")


@register(
    "funnel_view_click_purchase",
    doc="ordered-event funnel: users completing view -> click (after "
    "the view) -> purchase (after the click), whole funnel within 7 "
    "days of the first view. ONE user exchange reused by all three "
    "conditional-min stage windows -- no per-stage self-joins "
    "(operators/funnel.py). Epoch comparisons floor to seconds on both "
    "engines.",
    oracle="""
WITH s1 AS (
  SELECT user_id, ts, event_type,
         min(CASE WHEN event_type = 'view' THEN ts END)
             OVER (PARTITION BY user_id) AS t1
  FROM events
),
s2 AS (
  SELECT *, min(CASE WHEN event_type = 'click' AND ts > t1
                      AND floor(epoch(ts)) <= floor(epoch(t1)) + 604800 THEN ts END)
                OVER (PARTITION BY user_id) AS t2
  FROM s1
),
s3 AS (
  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t2
                      AND floor(epoch(ts)) <= floor(epoch(t1)) + 604800 THEN ts END)
                OVER (PARTITION BY user_id) AS t3
  FROM s2
),
u AS (SELECT DISTINCT user_id, t1, t2, t3 FROM s3)
SELECT count(t1) AS n_step1, count(t2) AS n_step2, count(t3) AS n_step3
FROM u
""",
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from testlog_etl_spark.operators.funnel import funnel_counts, funnel_stage_times

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    stages = funnel_stage_times(
        ev, "user_id", "ts", "event_type", ["view", "click", "purchase"], horizon_sec=604800
    )
    return funnel_counts(stages, 3)


@register(
    "win_distribution_ranks",
    doc="distribution ranking functions: ntile quartiles (unique "
    "tie-broken sort -- bucket boundaries follow row order), "
    "percent_rank and cume_dist (functions of the VALUE under the tied "
    "sort, so deterministic).",
    oracle=f"""
SELECT event_id,
  NTILE(4) OVER (PARTITION BY event_type ORDER BY value, event_id) AS quartile,
  ROUND(PERCENT_RANK() OVER (PARTITION BY event_type ORDER BY user_id), {R}) AS pr,
  ROUND(CUME_DIST() OVER (PARTITION BY event_type ORDER BY user_id), {R}) AS cd
FROM events
ORDER BY event_id
""",
)
def win_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    tables = load_tables(spark, sf_dir, ("events",))
    out = run_jx(
        spark,
        {
            "from": "events",
            "window": [
                {"name": "quartile", "aggregate": "ntile", "buckets": 4,
                 "edges": ["event_type"], "sort": ["value", "event_id"]},
                {"name": "pr", "aggregate": "percent_rank",
                 "edges": ["event_type"], "sort": ["user_id"]},
                {"name": "cd", "aggregate": "cume_dist",
                 "edges": ["event_type"], "sort": ["user_id"]},
            ],
            "sort": "event_id",
        },
        tables,
    )
    return out.select(
        "event_id", "quartile", F.round("pr", R).alias("pr"), F.round("cd", R).alias("cd")
    )


@register(
    "ts_downsample_interpolate",
    doc="linear-interpolation resampling (LOCF's sibling): 15-min sum "
    "per event_type on the dense grid; gaps get prev + (next-prev) * "
    "(t-t_prev)/(t_next-t_prev) between surrounding observed buckets, "
    "LOCF after the last observation, null before the first. Backward "
    "and forward window passes share ONE exchange+sort (same "
    "partitioning+ordering); bucket sums rounded before interpolating "
    "so both engines interpolate identical inputs "
    "(operators/timeseries.py::downsample_interpolate).",
    oracle="""
WITH b AS (
  SELECT event_type,
         to_timestamp((floor(epoch(ts))::BIGINT // 900) * 900)::TIMESTAMP AS bucket,
         count(*) AS n, ROUND(SUM(value), 2) AS agg
  FROM events GROUP BY 1, 2
),
span AS (
  SELECT (floor(epoch(min(ts)))::BIGINT // 900) * 900 AS lo,
         (floor(epoch(max(ts)))::BIGINT // 900) * 900 AS hi
  FROM events
),
grid AS (
  SELECT t.event_type, to_timestamp(g.s::BIGINT)::TIMESTAMP AS bucket
  FROM (SELECT DISTINCT event_type FROM events) t, span, unnest(range(span.lo, span.hi + 900, 900)) AS g(s)
),
j AS (
  SELECT grid.event_type, grid.bucket, b.n, b.agg,
         epoch(grid.bucket)::BIGINT AS bsec,
         last_value(b.agg IGNORE NULLS) OVER (
           PARTITION BY grid.event_type ORDER BY grid.bucket
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
         last_value(CASE WHEN b.agg IS NOT NULL THEN epoch(grid.bucket)::BIGINT END IGNORE NULLS) OVER (
           PARTITION BY grid.event_type ORDER BY grid.bucket
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
         first_value(b.agg IGNORE NULLS) OVER (
           PARTITION BY grid.event_type ORDER BY grid.bucket
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
         first_value(CASE WHEN b.agg IS NOT NULL THEN epoch(grid.bucket)::BIGINT END IGNORE NULLS) OVER (
           PARTITION BY grid.event_type ORDER BY grid.bucket
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
  FROM grid LEFT JOIN b ON b.event_type = grid.event_type AND b.bucket = grid.bucket
)
SELECT event_type, bucket, coalesce(n, 0) AS n,
  floor((CASE
    WHEN agg IS NOT NULL THEN agg
    WHEN pv IS NULL THEN NULL
    WHEN nv IS NULL THEN pv
    ELSE pv + (nv - pv) * (bsec - pt) / (nt - pt)
  END) * 10000 + 0.5) / 10000 AS filled
FROM j
ORDER BY event_type, bucket
""",
)
def ts_downsample_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from testlog_etl_spark.operators.timeseries import downsample_interpolate

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    out = downsample_interpolate(
        ev, "event_type", "ts", F.col("value"), interval_sec=900, agg="sum", agg_round_to=2, round_to=None
    )
    # floor(x*1e4+0.5)/1e4, not F.round: interpolating 2-dp inputs at
    # rational time fractions lands EXACTLY on 4th-decimal halves, where
    # Spark's and DuckDB's decimal rounding disagree; the floor idiom is
    # the same IEEE ops on the same double on both engines
    # (quantize_int8 precedent).
    half_up = F.floor(F.col("filled") * 10000 + F.lit(0.5)) / 10000
    return out.select(
        "event_type", "bucket", "n", half_up.alias("filled")
    ).orderBy("event_type", "bucket")


@register(
    "ts_changepoint",
    doc="single best changepoint per event_type over the 15-min bucket "
    "series: binary-segmentation depth 1 in CLOSED FORM from ordered "
    "prefix sums (no per-group Python, no split-candidate explosion) -- "
    "operators/timeseries.py::best_changepoint. Costs are floor-rounded "
    "to integers before the argmin: prefix sums accumulate in order on "
    "both engines, but the whole-series totals are order-free aggregates "
    "whose ulp noise (~1e-6 of a ~1e5 cost) must not decide a winner; "
    "integer resolution makes near-ties true ties, broken by earliest "
    "split on both sides.",
    oracle="""
WITH b AS (
  SELECT event_type,
         to_timestamp((floor(epoch(ts))::BIGINT // 900) * 900)::TIMESTAMP AS bucket,
         ROUND(SUM(value), 2) AS agg
  FROM events GROUP BY 1, 2
),
o AS (
  SELECT event_type, bucket, agg,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY bucket) AS t,
         SUM(agg) OVER (PARTITION BY event_type ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS s1,
         SUM(agg * agg) OVER (PARTITION BY event_type ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS s2,
         COUNT(*) OVER (PARTITION BY event_type) AS n,
         SUM(agg) OVER (PARTITION BY event_type) AS t1,
         SUM(agg * agg) OVER (PARTITION BY event_type) AS t2
  FROM b
),
c AS (
  SELECT *, floor(((s2 - s1 * s1 / t) + ((t2 - s2) - (t1 - s1) * (t1 - s1) / (n - t))) + 0.5) AS cost
  FROM o WHERE t < n
),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY cost, t) AS rn FROM c
)
SELECT event_type, n, bucket AS split,
       ROUND(s1 / t, 4) AS mean_left,
       ROUND((t1 - s1) / (n - t), 4) AS mean_right,
       CAST(floor((t2 - t1 * t1 / n) + 0.5) - cost AS BIGINT) AS sse_drop
FROM r WHERE rn = 1
ORDER BY event_type
""",
)
def ts_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    step = 900
    bucket = F.timestamp_seconds((F.unix_timestamp("ts") / step).cast("long") * step)
    b = (
        ev.select(F.col("event_type"), bucket.alias("bucket"), F.col("value"))
        .groupBy("event_type", "bucket")
        .agg(F.round(F.sum("value"), 2).alias("agg"))
    )
    from testlog_etl_spark.operators.timeseries import best_changepoint

    out = best_changepoint(b, "event_type", "bucket", "agg")
    return out.select(
        "event_type",
        "n",
        F.col("split"),
        F.round("mean_left", 4).alias("mean_left"),
        F.round("mean_right", 4).alias("mean_right"),
        "sse_drop",
    ).orderBy("event_type")


@register(
    "ts_rolling_anomaly",
    doc="rolling z-score anomaly flags per event_type: each 15-min "
    "bucket sum scored against the mean/std of the PRIOR 24 full "
    "buckets (ROWS 24 PRECEDING..1 PRECEDING; null until the frame is "
    "full, null when the frame is flat); |z|>3 counts as an anomaly. "
    "One exchange per series shared by all three frame aggregates.",
    oracle="""
WITH b AS (
  SELECT event_type,
         to_timestamp((floor(epoch(ts))::BIGINT // 900) * 900)::TIMESTAMP AS bucket,
         ROUND(SUM(value), 2) AS agg
  FROM events GROUP BY 1, 2
),
z AS (
  SELECT event_type, bucket, agg,
         COUNT(*) OVER w AS cnt,
         AVG(agg) OVER w AS mu,
         STDDEV_SAMP(agg) OVER w AS sd
  FROM b
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
),
s AS (
  SELECT event_type,
         CASE WHEN cnt = 24 AND sd > 1e-12 THEN (agg - mu) / sd END AS zscore
  FROM z
)
SELECT event_type,
       CAST(SUM(CASE WHEN abs(zscore) > 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
       ROUND(MAX(abs(zscore)), 4) AS max_abs_z
FROM s GROUP BY event_type ORDER BY event_type
""",
)
def ts_rolling_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    step = 900
    bucket = F.timestamp_seconds((F.unix_timestamp("ts") / step).cast("long") * step)
    b = (
        ev.select(F.col("event_type"), bucket.alias("bucket"), F.col("value"))
        .groupBy("event_type", "bucket")
        .agg(F.round(F.sum("value"), 2).alias("agg"))
    )
    w = Window.partitionBy("event_type").orderBy("bucket").rowsBetween(-24, -1)
    z = (
        b.withColumn("cnt", F.count(F.lit(1)).over(w))
        .withColumn("mu", F.avg("agg").over(w))
        .withColumn("sd", F.stddev_samp("agg").over(w))
        .withColumn(
            "zscore",
            F.when(
                (F.col("cnt") == 24) & (F.col("sd") > 1e-12),
                (F.col("agg") - F.col("mu")) / F.col("sd"),
            ),
        )
    )
    return (
        z.groupBy("event_type")
        .agg(
            F.sum(F.when(F.abs("zscore") > 3, 1).otherwise(0)).alias("n_anomalies"),
            F.round(F.max(F.abs("zscore")), 4).alias("max_abs_z"),
        )
        .orderBy("event_type")
    )


@register(
    "win_range_time_frame",
    doc="value-based RANGE frame (vs the rows-frame family): per event, "
    "the count and sum of the SAME user's events in the trailing hour "
    "-- ordered by epoch seconds with rangeBetween(-3600, 0), so the "
    "frame is defined by the ORDER VALUE, not row offsets; ragged "
    "event spacing changes frame membership per row. One exchange per "
    "user partition, frame evaluation within the sorted run.",
    oracle="""
SELECT event_id, user_id,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_trailing_hour,
       ROUND(SUM(value) OVER w, 4) AS sum_trailing_hour
FROM (SELECT event_id, user_id, value, floor(epoch(ts))::BIGINT AS tsec FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY tsec RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
ORDER BY event_id
""",
)
def win_range_time_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    w = Window.partitionBy("user_id").orderBy("tsec").rangeBetween(-3600, 0)
    return (
        ev.select("event_id", "user_id", "value", F.unix_timestamp("ts").alias("tsec"))
        .withColumn("n_trailing_hour", F.count(F.lit(1)).over(w))
        .withColumn("sum_trailing_hour", F.round(F.sum("value").over(w), 4))
        .select("event_id", "user_id", "n_trailing_hour", "sum_trailing_hour")
        .orderBy("event_id")
    )


@register(
    "ts_peak_concurrency",
    doc="interval-overlap sweep line (operators/timeseries.py::"
    "sweep_concurrency): peak simultaneously-open 30-minute activity "
    "windows per event_type and the first instant the peak is reached. "
    "Half-open [start, end) intervals; the global ordered prefix sum "
    "uses the packing.py hierarchical scan (range partition + per-"
    "(partition,key) offsets broadcast back), NOT a single-partition "
    "window -- the low-cardinality-key regime where a plain per-key "
    "window would collapse each key's whole timeline into one task.",
    oracle="""
WITH b AS (
  SELECT event_type, ts AS bt, 1 AS d FROM events
  UNION ALL
  SELECT event_type, ts + INTERVAL 30 MINUTE, -1 FROM events
), r AS (
  SELECT event_type, bt, d,
         CAST(SUM(d) OVER (PARTITION BY event_type ORDER BY bt, d
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS conc
  FROM b
), p AS (SELECT event_type, MAX(conc) AS peak FROM r GROUP BY event_type)
SELECT r.event_type AS event_type, p.peak AS peak, strftime(MIN(bt), '%Y-%m-%d %H:%M:%S') AS first_peak_ts
FROM r JOIN p ON r.event_type = p.event_type AND r.conc = p.peak
GROUP BY r.event_type, p.peak
ORDER BY r.event_type
""",
)
def ts_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from testlog_etl_spark.operators.timeseries import sweep_concurrency

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    iv = ev.select(
        "event_type",
        F.col("ts").alias("start"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("end"),
    )
    out = sweep_concurrency(iv, "event_type", "start", "end")
    # first_peak_ts as formatted UTC string -- TZ-proof output (r06)
    return out.select(
        "event_type",
        "peak",
        F.date_format("first_peak_ts", "yyyy-MM-dd HH:mm:ss").alias("first_peak_ts"),
    ).orderBy("event_type")


@register(
    "ts_capped_balance",
    doc="clamped running balances, two flavors. FLOOR-ONLY (credits "
    "minus debits, never below zero) looks non-associative but reduces "
    "EXACTLY via the Lindley identity b_n = S_n - min(0, min_k<=n S_k) "
    "to two running windows over ONE exchange -- no sequential fold "
    "needed. The TWO-SIDED clamp [0, 500] has no such closed form (the "
    "cap destroys the reduction), so it runs as the honest sequential "
    "shape: an applyInPandas fold, sequential within a key, parallel "
    "across keys. The oracle replays both as a recursive CTE. "
    "Restricted to user_id < 30 to keep the recursive replay cheap.",
    oracle="""
WITH RECURSIVE seq AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type = 'purchase' THEN "value"
              WHEN event_type = 'error' THEN -"value" ELSE 0 END AS delta,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events WHERE user_id < 30
),
bal(user_id, rn, balance, cbal, peak) AS (
  SELECT user_id, rn, greatest(0, delta), least(500, greatest(0, delta)),
         greatest(0, delta)
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.user_id, s.rn,
         greatest(0, b.balance + s.delta),
         least(500, greatest(0, b.cbal + s.delta)),
         greatest(b.peak, greatest(0, b.balance + s.delta))
  FROM bal b JOIN seq s ON s.user_id = b.user_id AND s.rn = b.rn + 1
),
last AS (
  SELECT user_id, arg_max(balance, rn) AS final_balance, max(peak) AS peak_balance,
         arg_max(cbal, rn) AS final_capped, max(rn) AS n_events
  FROM bal GROUP BY user_id
)
SELECT user_id, ROUND(final_balance, 4) AS final_balance,
       ROUND(peak_balance, 4) AS peak_balance,
       ROUND(final_capped, 4) AS final_capped,
       CAST(n_events AS BIGINT) AS n_events
FROM last ORDER BY user_id
""",
)
def ts_capped_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from pyspark.sql import Window

    ev = load_tables(spark, sf_dir, ("events",))["events"].filter(F.col("user_id") < 30)
    delta = (
        F.when(F.col("event_type") == "purchase", F.col("value"))
        .when(F.col("event_type") == "error", -F.col("value"))
        .otherwise(F.lit(0.0))
    )
    slim = ev.select("user_id", "ts", "event_id", delta.alias("delta"))

    # floor-only via Lindley: b = S - min(0, running_min(S)); both
    # windows share the one (user ORDER BY ts, event_id) exchange
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    lin = (
        slim.withColumn("S", F.sum("delta").over(w))
        .withColumn("b", F.col("S") - F.least(F.lit(0.0), F.min("S").over(w)))
        .withColumn("rn", F.row_number().over(Window.partitionBy("user_id").orderBy("ts", "event_id")))
    )
    floor_side = lin.groupBy("user_id").agg(
        F.max_by("b", "rn").alias("final_balance_raw"),
        F.max("b").alias("peak_balance_raw"),
        F.max("rn").cast("long").alias("n_events"),
    )

    # two-sided clamp [0, cap]: provably no associative restatement --
    # the honest sequential-within-key fold
    out_schema = "user_id long, final_capped double"

    def fold(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(["ts", "event_id"])
        bal = 0.0
        for d in pdf["delta"]:
            bal = min(500.0, max(0.0, bal + float(d)))
        return pd.DataFrame(
            [(int(pdf["user_id"].iloc[0]), bal)], columns=["user_id", "final_capped"]
        )

    capped = slim.groupBy("user_id").applyInPandas(fold, out_schema)
    return (
        floor_side.join(capped, "user_id")
        .select(
            "user_id",
            F.round("final_balance_raw", 4).alias("final_balance"),
            F.round("peak_balance_raw", 4).alias("peak_balance"),
            F.round("final_capped", 4).alias("final_capped"),
            "n_events",
        )
        .orderBy("user_id")
    )


@register(
    "ts_ewma_hourly",
    doc="exponentially-weighted moving average over trailing 24 hourly "
    "buckets, alpha = 0.5: EWMA weights 2^-j are EXACT doubles, so the "
    "normalized weighted sum is cross-engine deterministic up to one "
    "final rounding (a libm pow(0.8, j) would differ in ulps). "
    "Physically a bounded 24-wide bucket-distance join on the tiny "
    "per-hour rollup -- the raw stream is touched once.",
    oracle="""
WITH b AS (
  SELECT event_type, CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) // 3600 AS h,
         AVG("value") AS m
  FROM events GROUP BY event_type, h
),
pairs AS (
  SELECT cur.event_type, cur.h, prev.m, pow(2.0, -(cur.h - prev.h)) AS w
  FROM b cur JOIN b prev
    ON prev.event_type = cur.event_type
   AND prev.h BETWEEN cur.h - 23 AND cur.h
)
SELECT event_type,
       strftime(make_timestamp(h * 3600 * 1000000), '%Y-%m-%d %H:%M:%S') AS hour,
       ROUND(SUM(m * w) / SUM(w), 4) AS ewma
FROM pairs
GROUP BY event_type, h
ORDER BY event_type, hour
""",
)
def ts_ewma_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    b = ev.groupBy(
        "event_type",
        # floor-divide (matches the oracle's BIGINT //): a plain
        # divide-then-cast truncates toward zero and would shift
        # pre-1970 buckets by one
        F.floor(F.unix_timestamp(F.date_trunc("hour", "ts")) / 3600).cast("long").alias("h"),
    ).agg(F.avg("value").alias("m"))
    cur = b.select("event_type", F.col("h").alias("ch"))
    prev = b.select(
        F.col("event_type").alias("p_type"), F.col("h").alias("ph"), F.col("m").alias("pm")
    )
    pairs = cur.join(
        prev,
        (F.col("p_type") == F.col("event_type"))
        & F.col("ph").between(F.col("ch") - 23, F.col("ch")),
    ).withColumn("w", F.pow(F.lit(2.0), -(F.col("ch") - F.col("ph"))))
    return (
        pairs.groupBy("event_type", "ch")
        .agg(F.round(F.sum(F.col("pm") * F.col("w")) / F.sum("w"), 4).alias("ewma"))
        .select(
            "event_type",
            # hour as formatted UTC string -- TZ-proof output (r06)
            F.date_format(F.timestamp_micros(F.col("ch") * 3600 * 1000000), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "ewma",
        )
        .orderBy("event_type", "hour")
    )


@register(
    "ts_interval_coalesce",
    doc="gaps-and-islands interval coalescing (operators/timeseries.py::"
    "coalesce_intervals): per event_type, 30-minute activity windows "
    "merged into maximal overlapping-or-TOUCHING islands, readout = "
    "island count / covered seconds / longest island. Sibling of "
    "ts_peak_concurrency with the complementary tie rule (end==start "
    "merges), and the same hierarchical keyed prefix scan instead of a "
    "per-key window -- boundaries are netted per (key, instant) first, "
    "which both compresses the scan input and makes the merge rule "
    "order-free. The oracle replays it as the classic running-max "
    "window formulation.",
    oracle="""
WITH iv AS (
  SELECT event_type AS k, ts AS s, ts + INTERVAL 30 MINUTE AS e FROM events
),
o AS (
  SELECT k, s, e,
         max(e) OVER (PARTITION BY k ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
  FROM iv
),
f AS (SELECT k, s, e, CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END AS ni FROM o),
g AS (
  SELECT k, s, e,
         SUM(ni) OVER (PARTITION BY k ORDER BY s, e ROWS UNBOUNDED PRECEDING) AS isl
  FROM f
),
m AS (SELECT k, isl, min(s) AS s, max(e) AS e FROM g GROUP BY k, isl)
SELECT k AS event_type,
       CAST(count(*) AS BIGINT) AS n_islands,
       CAST(SUM(date_diff('second', s, e)) AS BIGINT) AS covered_seconds,
       CAST(MAX(date_diff('second', s, e)) AS BIGINT) AS longest_island_seconds
FROM m GROUP BY k ORDER BY event_type
""",
)
def ts_interval_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    from testlog_etl_spark.operators.timeseries import coalesce_intervals

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    iv = ev.select(
        "event_type",
        F.col("ts").alias("start"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("end"),
    )
    islands = coalesce_intervals(iv, "event_type", "start", "end")
    dur = F.col("island_end").cast("long") - F.col("island_start").cast("long")
    return (
        islands.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_islands"),
            F.sum(dur).alias("covered_seconds"),
            F.max(dur).alias("longest_island_seconds"),
        )
        .orderBy("event_type")
    )


@register(
    "ts_time_weighted_avg",
    doc="time-weighted average (TWAP shape): each event's value holds "
    "until the user's next event; weight = held seconds; last event "
    "carries no weight (no horizon extrapolation). One lead() window "
    "per user partition, integer-second weights, one rollup; users "
    "with a single event (no held segment) drop out, matching the "
    "oracle's HAVING.",
    oracle=f"""
WITH o AS (
  SELECT user_id, "value",
         date_diff('second', ts, lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS w
  FROM events
),
seg AS (SELECT user_id, "value", w::DOUBLE AS w FROM o WHERE w IS NOT NULL)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_segments,
       ROUND(SUM("value" * w) / SUM(w), {R}) AS twa,
       ROUND(AVG("value"), {R}) AS mean_unweighted
FROM seg GROUP BY user_id HAVING SUM(w) > 0 ORDER BY user_id
""",
)
def ts_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.withColumn(
        "w",
        (F.lead("ts").over(w).cast("long") - F.col("ts").cast("long")).cast("double"),
    ).filter(F.col("w").isNotNull())
    return (
        o.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            (F.sum(F.col("value") * F.col("w")) / F.sum("w")).alias("_twa"),
            F.avg("value").alias("_mu"),
            F.sum("w").alias("_sw"),
        )
        .filter(F.col("_sw") > 0)
        .select(
            "user_id",
            "n_segments",
            F.round("_twa", R).alias("twa"),
            F.round("_mu", R).alias("mean_unweighted"),
        )
        .orderBy("user_id")
    )


@register(
    "ts_holt_linear",
    doc="Holt's linear (double-exponential) smoothing, alpha=beta=0.5: "
    "level/trend recursions have NO associative restatement (each step "
    "mixes the previous level into the trend), so this runs as the "
    "honest sequential shape -- an applyInPandas fold, sequential "
    "within a user, parallel across users (the ts_capped_balance "
    "two-sided-clamp playbook). Init l=y1, b=y2-y1; the oracle replays "
    "the identical op order as a recursive CTE, so doubles match "
    "bit-for-bit before the presentation rounding. Restricted to "
    "user_id < 30 to keep the sequential replay cheap.",
    oracle=f"""
WITH RECURSIVE
s AS (
  SELECT user_id, "value" AS y,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS i
  FROM events WHERE user_id < 30
),
n AS (SELECT user_id, max(i) AS n FROM s GROUP BY user_id HAVING max(i) >= 2),
rec AS (
  SELECT n.user_id, 1 AS i, y1.y AS l, y2.y - y1.y AS b
  FROM n
  JOIN s y1 ON y1.user_id = n.user_id AND y1.i = 1
  JOIN s y2 ON y2.user_id = n.user_id AND y2.i = 2
  UNION ALL
  SELECT r.user_id, r.i + 1,
         0.5 * s.y + 0.5 * (r.l + r.b),
         0.5 * ((0.5 * s.y + 0.5 * (r.l + r.b)) - r.l) + 0.5 * r.b
  FROM rec r JOIN s ON s.user_id = r.user_id AND s.i = r.i + 1
)
SELECT r.user_id,
       CAST(n.n AS BIGINT) AS n_events,
       ROUND(r.l, {R}) AS level,
       ROUND(r.b, {R}) AS trend,
       ROUND(r.l + r.b, {R}) AS forecast_next
FROM rec r JOIN n ON n.user_id = r.user_id AND r.i = n.n
ORDER BY r.user_id
""",
)
def ts_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    ev = load_tables(spark, sf_dir, ("events",))["events"].filter(F.col("user_id") < 30)
    slim = ev.select("user_id", "ts", "event_id", "value")
    out_schema = "user_id long, n_events long, _l double, _b double"

    def fold(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(["ts", "event_id"])
        y = [float(v) for v in pdf["value"]]
        if len(y) < 2:
            return pd.DataFrame(columns=["user_id", "n_events", "_l", "_b"])
        l, b = y[0], y[1] - y[0]
        for t in range(1, len(y)):
            nl = 0.5 * y[t] + 0.5 * (l + b)
            b = 0.5 * (nl - l) + 0.5 * b
            l = nl
        return pd.DataFrame(
            [(int(pdf["user_id"].iloc[0]), len(y), l, b)],
            columns=["user_id", "n_events", "_l", "_b"],
        )

    # rounding happens ENGINE-side (F.round = SQL half-away), never in
    # the fold: Python round() is banker's and would diverge at .xxxx5
    return (
        slim.groupBy("user_id")
        .applyInPandas(fold, out_schema)
        .select(
            "user_id",
            "n_events",
            F.round("_l", R).alias("level"),
            F.round("_b", R).alias("trend"),
            F.round(F.col("_l") + F.col("_b"), R).alias("forecast_next"),
        )
        .orderBy("user_id")
    )


@register(
    "ts_gap_report",
    doc="coverage-gap report, the complement of ts_interval_coalesce: "
    "after merging 30-minute activity windows into islands "
    "(operators/timeseries.py::coalesce_intervals, hierarchical keyed "
    "scan), the DOWNTIME between consecutive islands per event_type -- "
    "gap count, total and max gap seconds. The lag window runs over "
    "island rows (coverage-compressed, 2 per island), never raw events.",
    oracle="""
WITH iv AS (
  SELECT event_type AS k, ts AS s, ts + INTERVAL 30 MINUTE AS e FROM events
),
o AS (
  SELECT k, s, e,
         max(e) OVER (PARTITION BY k ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
  FROM iv
),
f AS (SELECT k, s, e, CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END AS ni FROM o),
g AS (
  SELECT k, s, e,
         SUM(ni) OVER (PARTITION BY k ORDER BY s, e ROWS UNBOUNDED PRECEDING) AS isl
  FROM f
),
m AS (SELECT k, isl, min(s) AS s, max(e) AS e FROM g GROUP BY k, isl),
gaps AS (
  SELECT k,
         date_diff('second', lag(e) OVER (PARTITION BY k ORDER BY s), s) AS gap
  FROM m
)
SELECT k AS event_type,
       CAST(count(gap) AS BIGINT) AS n_gaps,
       CAST(COALESCE(SUM(gap), 0) AS BIGINT) AS total_gap_seconds,
       CAST(MAX(gap) AS BIGINT) AS max_gap_seconds
FROM gaps GROUP BY k ORDER BY event_type
""",
)
def ts_gap_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from testlog_etl_spark.operators.timeseries import coalesce_intervals

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    iv = ev.select(
        "event_type",
        F.col("ts").alias("start"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("end"),
    )
    islands = coalesce_intervals(iv, "event_type", "start", "end")
    w = Window.partitionBy("event_type").orderBy("island_start")
    gaps = islands.withColumn(
        "gap",
        F.col("island_start").cast("long") - F.lag(F.col("island_end").cast("long")).over(w),
    )
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count("gap").alias("n_gaps"),
            F.coalesce(F.sum("gap"), F.lit(0)).alias("total_gap_seconds"),
            F.max("gap").alias("max_gap_seconds"),
        )
        .orderBy("event_type")
    )


@register(
    "win_custom_udaf_drawdown",
    doc="custom window-style aggregation as a GROUPED_AGG pandas UDAF "
    "(SURVEY 2.10's 'custom window aggregation classes' row): max "
    "drawdown of value per user -- peak-so-far minus current, maxed "
    "over the (ts, event_id) order. The UDAF receives an Arrow struct "
    "batch per group and sorts internally (GROUPED_AGG gives no order "
    "guarantee); rounding is engine-side. The oracle states the same "
    "quantity as a running-max window -- also the scalable Spark form; "
    "the UDAF exists to pin the API for aggregations that DON'T reduce "
    "to windows.",
    oracle=f"""
WITH r AS (
  SELECT user_id, "value",
         max("value") OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS peak
  FROM events
)
SELECT user_id, ROUND(MAX(peak - "value"), {R}) AS max_drawdown
FROM r GROUP BY user_id ORDER BY user_id
""",
)
def win_custom_udaf_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd
    from pyspark.sql.types import DoubleType

    # explicit functionType: the module's `from __future__ import
    # annotations` stringifies hints, which pandas_udf can't infer here
    @F.pandas_udf(DoubleType(), F.PandasUDFType.GROUPED_AGG)
    def max_drawdown(rows):
        df = pd.DataFrame(list(rows))
        df = df.sort_values(["ts", "event_id"])
        peak = df["value"].cummax()
        return float((peak - df["value"]).max())

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return (
        ev.groupBy("user_id")
        .agg(F.round(max_drawdown(F.struct("ts", "event_id", "value")), R).alias("max_drawdown"))
        .orderBy("user_id")
    )


@register(
    "events_autocorrelation",
    doc="lag-1/lag-7 autocorrelation of the daily event-count series "
    "per event_type: Pearson corr of (count_t, count_{t-k}) over the "
    "lagged pairs -- the persistence/weekly-cycle readout a forecaster "
    "checks before model choice. One daily rollup, two lag() windows "
    "over the same per-type exchange, corr as a single-scan moment "
    "aggregate (the stats_correlation pairing).",
    oracle="""
WITH d AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day, count(*)::DOUBLE AS n
  FROM events GROUP BY event_type, day
),
l AS (
  SELECT event_type, n,
         lag(n, 1) OVER w AS n1,
         lag(n, 7) OVER w AS n7
  FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day)
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_days,
       ROUND(corr(n, n1), 4) AS acf_lag1,
       ROUND(corr(n, n7), 4) AS acf_lag7
FROM l GROUP BY event_type ORDER BY event_type
""",
)
def events_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    d = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    w = Window.partitionBy("event_type").orderBy("day")
    l = d.select(
        "event_type",
        "n",
        F.lag("n", 1).over(w).alias("n1"),
        F.lag("n", 7).over(w).alias("n7"),
    )
    return (
        l.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.round(F.corr("n", "n1"), 4).alias("acf_lag1"),
            F.round(F.corr("n", "n7"), 4).alias("acf_lag7"),
        )
        .orderBy("event_type")
    )


_LB_LAGS = tuple(range(1, 8))
_LB_LAGCOLS = ",\n         ".join(f"lag(n, {k}) OVER w AS l{k}" for k in _LB_LAGS)
_LB_UNION = "\n  UNION ALL ".join(
    f"SELECT event_type, n, {k} AS lag, l{k} AS lx FROM l" for k in _LB_LAGS
)


@register(
    "stats_ljung_box",
    doc="Ljung-Box portmanteau test per event_type: ACF r_k for lags "
    "1..7 of the daily event-count series with the standard "
    "mean-centered estimator (num_k = sum (x_t - xbar)(x_{t-k} - "
    "xbar), den = n var_pop), then the cumulative Q_m = n(n+2) "
    "sum_{k<=m} r_k^2/(n-k) -- the is-this-white-noise screen run "
    "after fitting any forecast model. One daily rollup, ONE lag "
    "window pass producing all 7 lag columns (stack unpivots them), "
    "per-type moments broadcast back; the Q cumsum runs over the "
    "7-row-per-type lag grid (bounded frame).",
    oracle=f"""
WITH d AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day, count(*)::DOUBLE AS n
  FROM events GROUP BY event_type, day
),
m AS (
  SELECT event_type, AVG(n) AS mu, COUNT(*)::DOUBLE AS nd,
         var_pop(n) * COUNT(*) AS den
  FROM d GROUP BY event_type
),
l AS (
  SELECT event_type, n,
         {_LB_LAGCOLS}
  FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day)
),
u AS (
  {_LB_UNION}
),
r AS (
  SELECT u.event_type, u.lag,
         SUM((u.n - m.mu) * (u.lx - m.mu)) / MAX(m.den) AS rk,
         MAX(m.nd) AS nd
  FROM u JOIN m ON m.event_type = u.event_type
  WHERE u.lx IS NOT NULL
  GROUP BY u.event_type, u.lag
)
SELECT event_type, lag,
       ROUND(rk, 4) AS acf,
       ROUND(nd * (nd + 2)
             * SUM(rk * rk / (nd - lag))
               OVER (PARTITION BY event_type ORDER BY lag
                     ROWS UNBOUNDED PRECEDING), 4) AS q_stat
FROM r
ORDER BY event_type, lag
""",
)
def stats_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    d = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    m = d.groupBy("event_type").agg(
        F.avg("n").alias("mu"),
        F.count(F.lit(1)).cast("double").alias("nd"),
        (F.var_pop("n") * F.count(F.lit(1))).alias("den"),
    )
    w = Window.partitionBy("event_type").orderBy("day")
    l = d.select(
        "event_type",
        "n",
        *[F.lag("n", k).over(w).alias(f"l{k}") for k in _LB_LAGS],
    )
    stack_args = ", ".join(f"{k}, l{k}" for k in _LB_LAGS)
    u = l.selectExpr(
        "event_type", "n", f"stack({len(_LB_LAGS)}, {stack_args}) as (lag, lx)"
    ).filter(F.col("lx").isNotNull())
    r = (
        u.join(F.broadcast(m), "event_type")
        .groupBy("event_type", "lag")
        .agg(
            (F.sum((F.col("n") - F.col("mu")) * (F.col("lx") - F.col("mu"))) / F.max("den")).alias("rk"),
            F.max("nd").alias("nd"),
        )
    )
    # the Q cumsum runs over the 7-row-per-type lag grid -- a bounded
    # frame, never the data
    wq = (
        Window.partitionBy("event_type")
        .orderBy("lag")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return r.select(
        "event_type",
        "lag",
        F.round("rk", 4).alias("acf"),
        F.round(
            F.col("nd")
            * (F.col("nd") + 2)
            * F.sum(F.col("rk") * F.col("rk") / (F.col("nd") - F.col("lag"))).over(wq),
            4,
        ).alias("q_stat"),
    ).orderBy("event_type", "lag")


@register(
    "ts_stl_decompose",
    doc="additive trend/seasonal/residual decomposition of the daily "
    "revenue series (STL-lite): trend = centered 7-day moving average "
    "(only days with the full +-3 frame kept), seasonal = per-ISO-dow "
    "mean of the detrended series re-centered to sum to zero over the "
    "week, residual = the rest. The forecasting pre-read beside the "
    "seasonal-index/holt queries. Day grid is calendar-bounded, so "
    "the day-ordered window is a bounded frame; the dow profile is a "
    "7-row broadcast.",
    oracle="""
WITH d AS (
  SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
         SUM(o_totalprice) AS rev
  FROM orders GROUP BY day
),
t AS (
  SELECT day, rev,
         AVG(rev) OVER w AS trend,
         COUNT(*) OVER w AS fw
  FROM d WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
full_t AS (SELECT day, rev, trend, rev - trend AS det FROM t WHERE fw = 7),
s_raw AS (
  SELECT CAST(isodow(day) AS INT) AS dow, AVG(det) AS s0
  FROM full_t GROUP BY dow
),
s AS (SELECT dow, s0 - (SELECT AVG(s0) FROM s_raw) AS seasonal FROM s_raw)
SELECT f.day, ROUND(f.rev, 2) AS rev, ROUND(f.trend, 4) AS trend,
       ROUND(s.seasonal, 4) AS seasonal,
       ROUND(f.det - s.seasonal, 4) AS residual
FROM full_t f JOIN s ON s.dow = CAST(isodow(f.day) AS INT)
ORDER BY f.day
""",
)
def ts_stl_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    d = orders.groupBy(
        F.date_trunc("day", "o_orderdate").cast("date").alias("day")
    ).agg(F.sum("o_totalprice").alias("rev"))
    # calendar-bounded series (one row per day): the day-ordered window
    # is a bounded frame, not data-scaling
    w = Window.orderBy("day").rowsBetween(-3, 3)
    t = d.select(
        "day",
        "rev",
        F.avg("rev").over(w).alias("trend"),
        F.count(F.lit(1)).over(w).alias("fw"),
    )
    full_t = t.filter(F.col("fw") == 7).select(
        "day", "rev", "trend", (F.col("rev") - F.col("trend")).alias("det")
    )
    s_raw = full_t.groupBy(
        F.expr("extract(DAYOFWEEK_ISO FROM day)").cast("int").alias("dow")
    ).agg(F.avg("det").alias("s0"))
    smean = s_raw.agg(F.avg("s0").alias("sm"))
    s = s_raw.crossJoin(F.broadcast(smean)).select(
        "dow", (F.col("s0") - F.col("sm")).alias("seasonal")
    )
    return (
        full_t.withColumn(
            "dow", F.expr("extract(DAYOFWEEK_ISO FROM day)").cast("int")
        )
        .join(F.broadcast(s), "dow")
        .select(
            "day",
            F.round("rev", 2).alias("rev"),
            F.round("trend", 4).alias("trend"),
            F.round("seasonal", 4).alias("seasonal"),
            F.round(F.col("det") - F.col("seasonal"), 4).alias("residual"),
        )
        .orderBy("day")
    )


@register(
    "ts_cusum_drift",
    doc="one-sided tabular CUSUM drift detector per event_type on the "
    "daily value-sum series: s_hi_t = max(0, s_hi_{t-1} + ((x_t - mu) "
    "- k)), s_lo symmetric, slack k = 0.5 sigma, alarm line h = 4 "
    "sigma. The recursion has no associative restatement (the max(0,.) "
    "clamp), so it runs as the honest applyInPandas fold -- "
    "sequential within a type, parallel across types (the holt_linear "
    "playbook); the oracle replays the identical op order as a "
    "recursive CTE. Daily sums are rounded to 6 places and mu/k/h "
    "snapped BEFORE the fold on both engines, so the recursion is "
    "bit-exact cross-engine and alarm counts can never flip on ulps.",
    oracle=f"""
WITH RECURSIVE
d AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         ROUND(SUM("value"), 6) AS x
  FROM events GROUP BY event_type, day
),
s AS (
  SELECT event_type, x,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS i
  FROM d
),
p AS (
  SELECT event_type,
         floor(AVG(x) * 1048576 + 0.5) / 1048576 AS mu,
         floor(stddev_pop(x) * 524288 + 0.5) / 1048576 AS k,
         floor(stddev_pop(x) * 4194304 + 0.5) / 1048576 AS h,
         max(i) AS n
  FROM s GROUP BY event_type
),
rec AS (
  SELECT p.event_type, 1 AS i,
         greatest(0.0, (s.x - p.mu) - p.k) AS s_hi,
         greatest(0.0, (p.mu - s.x) - p.k) AS s_lo,
         CASE WHEN greatest(0.0, (s.x - p.mu) - p.k) > p.h THEN 1 ELSE 0 END AS a_hi,
         CASE WHEN greatest(0.0, (p.mu - s.x) - p.k) > p.h THEN 1 ELSE 0 END AS a_lo
  FROM p JOIN s ON s.event_type = p.event_type AND s.i = 1
  UNION ALL
  SELECT r.event_type, r.i + 1,
         greatest(0.0, r.s_hi + ((s.x - p.mu) - p.k)),
         greatest(0.0, r.s_lo + ((p.mu - s.x) - p.k)),
         r.a_hi + CASE WHEN greatest(0.0, r.s_hi + ((s.x - p.mu) - p.k)) > p.h THEN 1 ELSE 0 END,
         r.a_lo + CASE WHEN greatest(0.0, r.s_lo + ((p.mu - s.x) - p.k)) > p.h THEN 1 ELSE 0 END
  FROM rec r
  JOIN p ON p.event_type = r.event_type
  JOIN s ON s.event_type = r.event_type AND s.i = r.i + 1
)
SELECT r.event_type,
       CAST(p.n AS BIGINT) AS n_days,
       CAST(r.a_hi AS BIGINT) AS n_alarms_hi,
       CAST(r.a_lo AS BIGINT) AS n_alarms_lo,
       ROUND(r.s_hi, {R}) AS final_s_hi,
       ROUND(r.s_lo, {R}) AS final_s_lo
FROM rec r JOIN p ON p.event_type = r.event_type AND r.i = p.n
ORDER BY r.event_type
""",
)
def ts_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    d = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.round(F.sum("value"), 6).alias("x"))
    g = F.lit(float(1 << 20))
    p = d.groupBy("event_type").agg(
        (F.floor(F.avg("x") * g + 0.5) / g).alias("mu"),
        (F.floor(F.stddev_pop("x") * float(1 << 19) + 0.5) / g).alias("k"),
        (F.floor(F.stddev_pop("x") * float(1 << 22) + 0.5) / g).alias("h"),
    )
    slim = d.join(F.broadcast(p), "event_type")
    out_schema = (
        "event_type string, n_days long, n_alarms_hi long, n_alarms_lo long, "
        "_s_hi double, _s_lo double"
    )

    def fold(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("day")
        mu = float(pdf["mu"].iloc[0])
        k = float(pdf["k"].iloc[0])
        h = float(pdf["h"].iloc[0])
        s_hi = s_lo = 0.0
        a_hi = a_lo = 0
        for x in (float(v) for v in pdf["x"]):
            s_hi = max(0.0, s_hi + ((x - mu) - k))
            s_lo = max(0.0, s_lo + ((mu - x) - k))
            if s_hi > h:
                a_hi += 1
            if s_lo > h:
                a_lo += 1
        return pd.DataFrame(
            [(pdf["event_type"].iloc[0], len(pdf), a_hi, a_lo, s_hi, s_lo)],
            columns=[
                "event_type", "n_days", "n_alarms_hi", "n_alarms_lo", "_s_hi", "_s_lo",
            ],
        )

    return (
        slim.groupBy("event_type")
        .applyInPandas(fold, out_schema)
        .select(
            "event_type",
            "n_days",
            "n_alarms_hi",
            "n_alarms_lo",
            F.round("_s_hi", R).alias("final_s_hi"),
            F.round("_s_lo", R).alias("final_s_lo"),
        )
        .orderBy("event_type")
    )


@register(
    "ts_theilsen_slope",
    doc="Theil-Sen robust trend per event_type: median of all pairwise "
    "slopes (x_j - x_i)/(j - i) over the day-indexed daily value-sum "
    "series, intercept = median(x_i - slope * i). The outlier-proof "
    "alternative to stats_ols_trend. The pair self-join is "
    "CALENDAR-bounded (one row per day per type: ~30x30 pairs per "
    "type whatever the row count), daily sums rounded to 6 before "
    "pairing and the slope rounded to 6 before the intercept pass, so "
    "both medians interpolate identical value sets (the certified "
    "percentile<->quantile_cont pairing).",
    oracle="""
WITH d AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         ROUND(SUM("value"), 6) AS x
  FROM events GROUP BY event_type, day
),
s AS (
  SELECT event_type, x,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS i
  FROM d
),
sl AS (
  SELECT a.event_type,
         ROUND(quantile_cont((b.x - a.x) / (b.i - a.i), 0.5), 6) AS slope,
         COUNT(*)::BIGINT AS n_pairs
  FROM s a JOIN s b ON b.event_type = a.event_type AND b.i > a.i
  GROUP BY a.event_type
)
SELECT s.event_type,
       CAST(MAX(s.i) AS BIGINT) AS n_days,
       MAX(sl.n_pairs) AS n_pairs,
       MAX(sl.slope) AS sen_slope,
       ROUND(quantile_cont(s.x - sl.slope * s.i, 0.5), 4) AS sen_intercept
FROM s JOIN sl ON sl.event_type = s.event_type
GROUP BY s.event_type
ORDER BY s.event_type
""",
)
def ts_theilsen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    d = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.round(F.sum("value"), 6).alias("x"))
    s = d.select(
        "event_type",
        "x",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("day"))
        .alias("i"),
    )
    a = s.select(
        F.col("event_type").alias("et"), F.col("x").alias("xa"), F.col("i").alias("ia")
    )
    b = s.select(
        F.col("event_type").alias("et"), F.col("x").alias("xb"), F.col("i").alias("ib")
    )
    sl = (
        a.join(b, "et")
        .filter(F.col("ib") > F.col("ia"))
        .groupBy("et")
        .agg(
            F.round(
                F.expr("percentile((xb - xa) / (ib - ia), 0.5)"), 6
            ).alias("slope"),
            F.count(F.lit(1)).alias("n_pairs"),
        )
    )
    return (
        s.join(F.broadcast(sl), s.event_type == sl.et)
        .groupBy("event_type")
        .agg(
            F.max("i").cast("long").alias("n_days"),
            F.max("n_pairs").alias("n_pairs"),
            F.max("slope").alias("sen_slope"),
            F.round(
                F.expr("percentile(x - slope * i, 0.5)"), 4
            ).alias("sen_intercept"),
        )
        .orderBy("event_type")
    )


@register(
    "ts_periodogram_weekly",
    doc="Goertzel-style periodogram of the daily revenue series over a "
    "fixed period grid p = 2..14 days: power(p) = (sum x~ cos(2 pi "
    "t/p))^2 + (sum x~ sin(2 pi t/p))^2 on the mean-centered series "
    "-- the cycle detector that confirms (or falsifies) the weekly "
    "seasonality the STL/seasonal-index queries assume. The day index "
    "comes from the calendar-bounded rollup; the period grid is a "
    "13-row broadcast; pi is pinned to the same literal on both "
    "engines so cos/sin see identical arguments.",
    oracle="""
WITH d AS (
  SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
         SUM(o_totalprice) AS rev
  FROM orders GROUP BY day
),
s AS (
  SELECT rev, ROW_NUMBER() OVER (ORDER BY day) - 1 AS t FROM d
),
m AS (SELECT AVG(rev) AS mu, COUNT(*)::DOUBLE AS n FROM s),
grid AS (SELECT unnest(range(2, 15)) AS p),
pow AS (
  SELECT grid.p,
         ROUND(SUM((s.rev - m.mu) * cos(2.0 * 3.141592653589793 * s.t / grid.p)), 3) AS c,
         ROUND(SUM((s.rev - m.mu) * sin(2.0 * 3.141592653589793 * s.t / grid.p)), 3) AS sn,
         MAX(m.n) AS n
  FROM grid CROSS JOIN s CROSS JOIN m
  GROUP BY grid.p
)
SELECT CAST(p AS INT) AS period_days,
       ROUND((c * c + sn * sn) / n, 2) AS power
FROM pow ORDER BY period_days
""",
)
def ts_periodogram_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    d = orders.groupBy(
        F.date_trunc("day", "o_orderdate").cast("date").alias("day")
    ).agg(F.sum("o_totalprice").alias("rev"))
    # calendar-bounded day index (one row per day -- runs-test rationale)
    s = d.select(
        "rev", (F.row_number().over(Window.orderBy("day")) - 1).alias("t")
    )
    m = s.agg(F.avg("rev").alias("mu"), F.count(F.lit(1)).cast("double").alias("n"))
    grid = spark.range(2, 15).select(F.col("id").cast("int").alias("p"))
    pi2 = 2.0 * 3.141592653589793
    pow_ = (
        s.crossJoin(F.broadcast(grid))
        .crossJoin(F.broadcast(m))
        .groupBy("p")
        .agg(
            # snap the Fourier sums BEFORE squaring: the +-1e6-term
            # cancellation leaves ~1e-5 cross-engine sum-order wobble
            # that squaring would amplify past any output rounding
            F.round(
                F.sum(
                    (F.col("rev") - F.col("mu"))
                    * F.cos(F.lit(pi2) * F.col("t") / F.col("p"))
                ),
                3,
            ).alias("c"),
            F.round(
                F.sum(
                    (F.col("rev") - F.col("mu"))
                    * F.sin(F.lit(pi2) * F.col("t") / F.col("p"))
                ),
                3,
            ).alias("sn"),
            F.max("n").alias("n"),
        )
    )
    return pow_.select(
        F.col("p").cast("int").alias("period_days"),
        F.round((F.col("c") * F.col("c") + F.col("sn") * F.col("sn")) / F.col("n"), 2).alias(
            "power"
        ),
    ).orderBy("period_days")


@register(
    "ts_holt_winters",
    doc="additive Holt-Winters (level/trend/seasonal, period m=7, "
    "alpha=beta=gamma=0.5) per event_type on the round-6 daily value "
    "sums: l' = 0.5 (y - s_old) + 0.5 (l + b); b' = 0.5 (l' - l) + "
    "0.5 b; s' = 0.5 (y - l') + 0.5 s_old. Like holt_linear the "
    "recursion has no associative restatement, so it runs as the "
    "honest applyInPandas fold (sequential within a type, parallel "
    "across types); the seasonal state is a ROTATING 7-SLOT LIST and "
    "the oracle replays the identical op order as a recursive CTE "
    "carrying the same list (init: l0 = round-6 mean of week one "
    "summed in pinned order, s_i = y_i - l0, b0 = 0). Forecast = "
    "l + b + next day's seasonal slot.",
    oracle="""
WITH RECURSIVE
d AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         ROUND(SUM("value"), 6) AS y
  FROM events GROUP BY event_type, day
),
s AS (
  SELECT event_type, y,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS i
  FROM d
),
n AS (SELECT event_type, max(i) AS n FROM s GROUP BY event_type HAVING max(i) >= 14),
wk AS (
  SELECT s.event_type, list(s.y ORDER BY s.i) AS ys
  FROM s JOIN n ON n.event_type = s.event_type
  WHERE s.i <= 7 GROUP BY s.event_type
),
init AS (
  SELECT event_type,
         floor(((((((ys[1] + ys[2]) + ys[3]) + ys[4]) + ys[5]) + ys[6]) + ys[7]) / 7.0
               * 1000000 + 0.5) / 1000000 AS l0,
         ys
  FROM wk
),
rec AS (
  SELECT i.event_type, 7 AS i, i.l0 AS l, 0.0::DOUBLE AS b,
         [i.ys[1] - i.l0, i.ys[2] - i.l0, i.ys[3] - i.l0, i.ys[4] - i.l0,
          i.ys[5] - i.l0, i.ys[6] - i.l0, i.ys[7] - i.l0] AS sl
  FROM init i
  UNION ALL
  SELECT r.event_type, r.i + 1,
         0.5 * (s.y - r.sl[1]) + 0.5 * (r.l + r.b),
         0.5 * ((0.5 * (s.y - r.sl[1]) + 0.5 * (r.l + r.b)) - r.l) + 0.5 * r.b,
         list_append(r.sl[2:7],
           0.5 * (s.y - (0.5 * (s.y - r.sl[1]) + 0.5 * (r.l + r.b))) + 0.5 * r.sl[1])
  FROM rec r JOIN s ON s.event_type = r.event_type AND s.i = r.i + 1
)
SELECT r.event_type,
       CAST(n.n AS BIGINT) AS n_days,
       ROUND(r.l, 4) AS level,
       ROUND(r.b, 4) AS trend,
       ROUND(r.l + r.b + r.sl[1], 4) AS forecast_next
FROM rec r JOIN n ON n.event_type = r.event_type AND r.i = n.n
ORDER BY r.event_type
""",
)
def ts_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math as _m

    import pandas as pd

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    d = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.round(F.sum("value"), 6).alias("y"))
    out_schema = "event_type string, n_days long, _l double, _b double, _f double"

    def fold(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("day")
        y = [float(v) for v in pdf["y"]]
        if len(y) < 14:
            return pd.DataFrame(
                columns=["event_type", "n_days", "_l", "_b", "_f"]
            )
        # pinned-order week-one mean, floor-snap (NOT python round: banker's)
        l = _m.floor(
            ((((((y[0] + y[1]) + y[2]) + y[3]) + y[4]) + y[5]) + y[6]) / 7.0 * 1000000
            + 0.5
        ) / 1000000
        b = 0.0
        sl = [y[i] - l for i in range(7)]
        for t in range(7, len(y)):
            s_old = sl[0]
            nl = 0.5 * (y[t] - s_old) + 0.5 * (l + b)
            nb = 0.5 * (nl - l) + 0.5 * b
            ns = 0.5 * (y[t] - nl) + 0.5 * s_old
            sl = sl[1:] + [ns]
            l, b = nl, nb
        return pd.DataFrame(
            [(pdf["event_type"].iloc[0], len(y), l, b, l + b + sl[0])],
            columns=["event_type", "n_days", "_l", "_b", "_f"],
        )

    return (
        d.groupBy("event_type")
        .applyInPandas(fold, out_schema)
        .select(
            "event_type",
            "n_days",
            F.round("_l", 4).alias("level"),
            F.round("_b", 4).alias("trend"),
            F.round("_f", 4).alias("forecast_next"),
        )
        .orderBy("event_type")
    )


@register(
    "ts_kalman_level",
    doc="local-level Kalman filter per event_type on the round-6 daily "
    "value sums (process noise q = 100, observation noise r = 2500, "
    "diffuse-ish init P = 1e6, l0 = y1): P' = P + q; K = P'/(P' + r); "
    "l += K (y - l); P = (1 - K) P'. The gain recursion is "
    "non-associative, so it runs as the honest applyInPandas fold "
    "(the holt/cusum playbook) and the oracle replays the identical "
    "op order as a recursive CTE. Output: final level, converged "
    "gain, innovation RMS -- the denoised-level readout beside "
    "EWMA/Holt (Kalman's gain ADAPTS instead of being pinned).",
    oracle="""
WITH RECURSIVE
d AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         ROUND(SUM("value"), 6) AS y
  FROM events GROUP BY event_type, day
),
s AS (
  SELECT event_type, y,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS i
  FROM d
),
n AS (SELECT event_type, max(i) AS n FROM s GROUP BY event_type),
rec AS (
  SELECT s.event_type, 1 AS i, s.y AS l, 1000000.0::DOUBLE AS p,
         0.0::DOUBLE AS k, 0.0::DOUBLE AS ss
  FROM s WHERE s.i = 1
  UNION ALL
  SELECT r.event_type, r.i + 1,
         r.l + ((r.p + 100.0) / ((r.p + 100.0) + 2500.0)) * (s.y - r.l),
         (1.0 - (r.p + 100.0) / ((r.p + 100.0) + 2500.0)) * (r.p + 100.0),
         (r.p + 100.0) / ((r.p + 100.0) + 2500.0),
         r.ss + (s.y - r.l) * (s.y - r.l)
  FROM rec r JOIN s ON s.event_type = r.event_type AND s.i = r.i + 1
)
SELECT r.event_type,
       CAST(n.n AS BIGINT) AS n_days,
       ROUND(r.l, 4) AS level,
       ROUND(r.k, 6) AS gain,
       ROUND(sqrt(r.ss / (n.n - 1)), 4) AS innovation_rms
FROM rec r JOIN n ON n.event_type = r.event_type AND r.i = n.n
ORDER BY r.event_type
""",
)
def ts_kalman_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    d = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.round(F.sum("value"), 6).alias("y"))
    out_schema = "event_type string, n_days long, _l double, _k double, _ss double"

    def fold(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("day")
        y = [float(v) for v in pdf["y"]]
        l, p = y[0], 1000000.0
        k = 0.0
        ss = 0.0
        for t in range(1, len(y)):
            pp = p + 100.0
            k = pp / (pp + 2500.0)
            innov = y[t] - l
            l = l + k * innov
            p = (1.0 - k) * pp
            ss = ss + innov * innov
        return pd.DataFrame(
            [(pdf["event_type"].iloc[0], len(y), l, k, ss)],
            columns=["event_type", "n_days", "_l", "_k", "_ss"],
        )

    return (
        d.groupBy("event_type")
        .applyInPandas(fold, out_schema)
        .select(
            "event_type",
            "n_days",
            F.round("_l", 4).alias("level"),
            F.round("_k", 6).alias("gain"),
            F.round(F.sqrt(F.col("_ss") / (F.col("n_days") - 1)), 4).alias(
                "innovation_rms"
            ),
        )
        .orderBy("event_type")
    )


@register(
    "events_leaderboard_churn",
    doc="week-over-week leaderboard churn: the top-20 users by summed "
    "value are computed per ISO week (TakeOrdered k-frames on the "
    "per-(week, user) rollup -- value desc, user asc total order), "
    "then consecutive weeks compare by set arithmetic: retained / "
    "entered / dropped counts and the Jaccard stability of the top "
    "set. The 'did the heavy hitters move' monitoring readout over "
    "any ranking the heavy-hitter sketches maintain.",
    oracle="""
WITH wk AS (
  SELECT CAST(date_trunc('week', ts) AS DATE) AS week, user_id,
         SUM("value") AS v
  FROM events GROUP BY week, user_id
),
r AS (
  SELECT week, user_id,
         ROW_NUMBER() OVER (PARTITION BY week ORDER BY v DESC, user_id) AS rn
  FROM wk
),
top AS (SELECT week, user_id FROM r WHERE rn <= 20),
pairs AS (
  SELECT a.week AS week_from, b.week AS week_to, a.user_id AS ua, b.user_id AS ub
  FROM top a FULL JOIN top b
    ON b.user_id = a.user_id AND b.week = a.week + INTERVAL 7 DAY
)
SELECT week_cmp.week_from, week_cmp.week_to,
       week_cmp.retained, week_cmp.entered, week_cmp.dropped,
       ROUND(week_cmp.retained * 1.0
             / (week_cmp.retained + week_cmp.entered + week_cmp.dropped), 4) AS jaccard
FROM (
  SELECT w1.week AS week_from, CAST(w1.week + INTERVAL 7 DAY AS DATE) AS week_to,
         (SELECT count(*) FROM top a JOIN top b
            ON b.user_id = a.user_id AND a.week = w1.week
           AND b.week = w1.week + INTERVAL 7 DAY)::BIGINT AS retained,
         (SELECT count(*) FROM top b WHERE b.week = w1.week + INTERVAL 7 DAY
            AND NOT EXISTS (SELECT 1 FROM top a WHERE a.week = w1.week
                            AND a.user_id = b.user_id))::BIGINT AS entered,
         (SELECT count(*) FROM top a WHERE a.week = w1.week
            AND NOT EXISTS (SELECT 1 FROM top b WHERE b.week = w1.week + INTERVAL 7 DAY
                            AND b.user_id = a.user_id))::BIGINT AS dropped
  FROM (SELECT DISTINCT week FROM top) w1
  WHERE EXISTS (SELECT 1 FROM top b WHERE b.week = w1.week + INTERVAL 7 DAY)
) week_cmp
ORDER BY week_from
""",
)
def events_leaderboard_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    wk = ev.groupBy(
        F.date_trunc("week", "ts").cast("date").alias("week"), "user_id"
    ).agg(F.sum("value").alias("v"))
    rn = F.row_number().over(
        Window.partitionBy("week").orderBy(F.desc("v"), F.asc("user_id"))
    )
    top = wk.withColumn("rn", rn).filter(F.col("rn") <= 20).select("week", "user_id")
    a = top.select(F.col("week").alias("week_from"), F.col("user_id").alias("ua"))
    b = top.select(
        (F.col("week") - F.expr("INTERVAL 7 DAY")).cast("date").alias("week_from"),
        F.col("user_id").alias("ub"),
    )
    # label each (week_from, user) by membership on both sides
    au = a.select("week_from", F.col("ua").alias("user_id")).withColumn("fa", F.lit(1))
    bu = b.select("week_from", F.col("ub").alias("user_id")).withColumn("fb", F.lit(1))
    lab = au.join(bu, ["week_from", "user_id"], "full")
    agg = lab.groupBy("week_from").agg(
        F.sum(
            F.when(F.col("fa").isNotNull() & F.col("fb").isNotNull(), 1).otherwise(0)
        ).alias("retained"),
        F.sum(F.when(F.col("fa").isNull(), 1).otherwise(0)).alias("entered"),
        F.sum(F.when(F.col("fb").isNull(), 1).otherwise(0)).alias("dropped"),
    )
    weeks_with_next = (
        a.select("week_from").distinct().join(
            b.select("week_from").distinct(), "week_from", "left_semi"
        )
    )
    return (
        agg.join(weeks_with_next, "week_from", "left_semi")
        .select(
            "week_from",
            F.date_add("week_from", 7).alias("week_to"),
            "retained",
            "entered",
            "dropped",
            F.round(
                F.col("retained")
                * 1.0
                / (F.col("retained") + F.col("entered") + F.col("dropped")),
                4,
            ).alias("jaccard"),
        )
        .orderBy("week_from")
    )


def _lttb_oracle(nb: int = 10) -> str:
    """Chained-CTE replay of the LTTB bucket walk: the selected point in
    bucket b depends on the previous selection, so the steps chain as
    CTEs (the LPA/k-core playbook); bucket means are list_reduce sums
    in pinned day order, snapped to 6 places, so both engines pick
    argmax over identical doubles (tie -> smallest t)."""
    ib = nb - 2  # interior buckets
    head = f"""
WITH d AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         ROUND(SUM("value"), 6) AS y
  FROM events GROUP BY event_type, day
),
sr AS (
  SELECT event_type, day, y,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS t,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM d
),
s AS (
  SELECT event_type, day, y, t, n, CAST(t AS DOUBLE) AS x,
         CASE WHEN t >= 2 AND t <= n - 1
              THEN ((t - 2) * {ib}) // (n - 2) END AS bidx
  FROM sr WHERE n >= {nb}
),
anchors AS (
  SELECT event_type, bidx AS b,
         AVG(x) AS ax,
         floor((list_reduce(list(y ORDER BY t), (a, v) -> a + v)
                / COUNT(*)) * 1000000 + 0.5) / 1000000 AS ay
  FROM s WHERE bidx IS NOT NULL GROUP BY event_type, bidx
),
lastp AS (
  SELECT event_type, x AS ax, y AS ay FROM s WHERE t = n
),
sel0 AS (SELECT event_type, t, x, y FROM s WHERE t = 1)"""
    parts = [head]
    for b in range(ib):
        anchor = (
            f"(SELECT event_type, ax, ay FROM anchors WHERE b = {b + 1})"
            if b < ib - 1
            else "lastp"
        )
        parts.append(
            f""",
cand{b} AS (
  SELECT c.event_type, c.t, c.x, c.y,
         ROW_NUMBER() OVER (
           PARTITION BY c.event_type
           ORDER BY abs((p.x - a.ax) * (c.y - p.y) - (p.x - c.x) * (a.ay - p.y)) DESC,
                    c.t) AS rn
  FROM s c
  JOIN sel{b} p ON p.event_type = c.event_type
  JOIN {anchor} a ON a.event_type = c.event_type
  WHERE c.bidx = {b}
),
sel{b + 1} AS (SELECT event_type, t, x, y FROM cand{b} WHERE rn = 1)"""
        )
    unions = "\n  UNION ALL ".join(
        f"SELECT event_type, t, y FROM sel{b}" for b in range(ib + 1)
    )
    parts.append(
        f"""
SELECT event_type, CAST(t AS BIGINT) AS t, y FROM (
  {unions}
  UNION ALL SELECT event_type, t, y FROM s WHERE t = n
) ORDER BY event_type, t"""
    )
    return "".join(parts)


@register(
    "ts_lttb_downsample",
    doc="Largest-Triangle-Three-Buckets downsampling (Steinarsson's "
    "visualization downsampler) of the daily value-sum series per "
    "event_type to 10 points: first/last pinned, interior points in 8 "
    "equal index buckets, each bucket keeping the point that "
    "maximizes the triangle area with the PREVIOUS selection and the "
    "NEXT bucket's mean -- a sequential dependency, so it runs as the "
    "honest applyInPandas fold (parallel across types) and the oracle "
    "replays the identical walk as chained CTEs. Bucket means are "
    "pinned-order list_reduce sums snapped to 6 places; argmax "
    "tie-breaks to the smallest index on both engines.",
    oracle=_lttb_oracle(),
)
def ts_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math as _m

    import pandas as pd

    nb = 10
    ib = nb - 2
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    d = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.round(F.sum("value"), 6).alias("y"))
    out_schema = "event_type string, t long, y double"

    def fold(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("day")
        ys = [float(v) for v in pdf["y"]]
        n = len(ys)
        if n < nb:
            return pd.DataFrame(columns=["event_type", "t", "y"])
        et = pdf["event_type"].iloc[0]
        # interior bucket membership + pinned-order snapped means
        buckets: list[list[int]] = [[] for _ in range(ib)]
        for t in range(2, n):  # 1-based t in [2, n-1]
            buckets[((t - 2) * ib) // (n - 2)].append(t)
        anchors = []
        for idxs in buckets:
            ax = sum(float(t) for t in idxs) / len(idxs)
            acc = 0.0
            for t in idxs:
                acc = acc + ys[t - 1]
            ay = _m.floor((acc / len(idxs)) * 1000000 + 0.5) / 1000000
            anchors.append((ax, ay))
        sel = [(1, 1.0, ys[0])]
        for b in range(ib):
            px, py = sel[-1][1], sel[-1][2]
            ax, ay = anchors[b + 1] if b < ib - 1 else (float(n), ys[n - 1])
            best = None
            for t in buckets[b]:
                xc, yc = float(t), ys[t - 1]
                area = abs((px - ax) * (yc - py) - (px - xc) * (ay - py))
                if best is None or area > best[0]:
                    best = (area, t, xc, yc)
            sel.append((best[1], best[2], best[3]))
        sel.append((n, float(n), ys[n - 1]))
        return pd.DataFrame(
            [(et, t, y) for t, _, y in sel], columns=["event_type", "t", "y"]
        )

    return (
        d.groupBy("event_type")
        .applyInPandas(fold, out_schema)
        .orderBy("event_type", "t")
    )


@register(
    "ts_downsample_m4",
    doc="M4 downsampling (min/max/first/last per pixel bucket) of the "
    "per-type event value stream into 10 time buckets -- the "
    "error-free line-chart downsampler (Jugel et al.): every bucket "
    "keeps exactly the four points a pixel column can show, as ONE "
    "rollup with min_by/max_by (first/last via the (ts, event_id) "
    "total order). The aggregation-only complement to LTTB's "
    "perceptual walk: no sequential dependency, so it's a plain "
    "shuffle however long the series.",
    oracle="""
WITH b AS (
  SELECT event_type, "value" AS v, ts, event_id,
         least(9, (EXTRACT(day FROM ts) - 1) // 3) AS bucket
  FROM events
)
SELECT event_type, CAST(bucket AS INT) AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       ROUND(MIN(v), 4) AS v_min,
       ROUND(MAX(v), 4) AS v_max,
       ROUND(first(v ORDER BY ts, event_id), 4) AS v_first,
       ROUND(last(v ORDER BY ts, event_id), 4) AS v_last
FROM b GROUP BY event_type, bucket
ORDER BY event_type, bucket
""",
)
def ts_downsample_m4(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    b = ev.select(
        "event_type",
        F.col("value").alias("v"),
        "ts",
        "event_id",
        F.least(F.lit(9), F.expr("(extract(DAY FROM ts) - 1) div 3")).cast("int").alias("bucket"),
    )
    key = F.struct(F.unix_micros("ts").alias("e"), F.col("event_id").alias("i"))
    return (
        b.groupBy("event_type", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("v"), 4).alias("v_min"),
            F.round(F.max("v"), 4).alias("v_max"),
            F.round(F.min_by("v", key), 4).alias("v_first"),
            F.round(F.max_by("v", key), 4).alias("v_last"),
        )
        .orderBy("event_type", "bucket")
    )


_HURST_WINDOWS = (5, 10, 15, 30)


def _hurst_oracle() -> str:
    per_w = "\n  UNION ALL ".join(
        f"""SELECT event_type, {w} AS w, blk, 
         MAX(cum) - MIN(cum) AS r,
         ROUND(stddev_pop(x), 10) AS s,
         COUNT(*) AS bn
  FROM (
    SELECT event_type, x, (t - 1) // {w} AS blk,
           SUM(x - bmu) OVER (PARTITION BY event_type, (t - 1) // {w}
                              ORDER BY t ROWS UNBOUNDED PRECEDING) AS cum
    FROM (
      SELECT event_type, t, x,
             AVG(x) OVER (PARTITION BY event_type, (t - 1) // {w}) AS bmu
      FROM s
    )
  ) GROUP BY event_type, blk"""
        for w in _HURST_WINDOWS
    )
    return f"""
WITH d AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         ROUND(SUM("value"), 6) AS x
  FROM events GROUP BY event_type, day
),
s AS (
  SELECT event_type, x,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS t
  FROM d
),
blocks AS (
  {per_w}
),
rs AS (
  SELECT event_type, w,
         AVG(r / s) AS rs_mean
  FROM blocks WHERE bn = w AND s > 0
  GROUP BY event_type, w
),
ll AS (
  SELECT event_type, ln(w::DOUBLE) AS lx, ln(rs_mean) AS ly FROM rs
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_scales,
       ROUND(covar_pop(lx, ly) / var_pop(lx), 4) AS hurst_h
FROM ll GROUP BY event_type
ORDER BY event_type
""".replace("(t - 1) // {w}", "(t - 1) // {w}")


@register(
    "stats_hurst_exponent",
    doc="Hurst exponent by rescaled-range (R/S) analysis per "
    "event_type: the daily value-sum series is cut into complete "
    "blocks of w in (5, 10, 15, 30) days; per block R = range of the "
    "mean-adjusted cumulative deviation, S = round-10 population "
    "stddev; H = slope of ln E[R/S] on ln w -- the long-memory "
    "diagnostic (H ~ 0.5 random walk, > 0.5 trending). Block cumsums "
    "are bounded w-row frames partitioned by (type, block); the "
    "log-log fit is closed-form over 4 points.",
    oracle=_hurst_oracle(),
)
def stats_hurst_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    d = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.round(F.sum("value"), 6).alias("x"))
    s = d.select(
        "event_type",
        "x",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("day"))
        .alias("t"),
    )
    blocks = None
    for wsz in _HURST_WINDOWS:
        blk = F.expr(f"(t - 1) div {wsz}")
        base = s.withColumn("blk", blk).withColumn(
            "bmu", F.avg("x").over(Window.partitionBy("event_type", "blk"))
        )
        wcum = (
            Window.partitionBy("event_type", "blk")
            .orderBy("t")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        cum = base.withColumn("cum", F.sum(F.col("x") - F.col("bmu")).over(wcum))
        b = cum.groupBy("event_type", "blk").agg(
            (F.max("cum") - F.min("cum")).alias("r"),
            F.round(F.stddev_pop("x"), 10).alias("sd"),
            F.count(F.lit(1)).alias("bn"),
        ).withColumn("w", F.lit(wsz))
        blocks = b if blocks is None else blocks.unionByName(b)
    rs = (
        blocks.filter((F.col("bn") == F.col("w")) & (F.col("sd") > 0))
        .groupBy("event_type", "w")
        .agg(F.avg(F.col("r") / F.col("sd")).alias("rs_mean"))
    )
    ll = rs.select(
        "event_type",
        F.log(F.col("w").cast("double")).alias("lx"),
        F.log("rs_mean").alias("ly"),
    )
    return (
        ll.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_scales"),
            F.round(F.covar_pop("lx", "ly") / F.var_pop("lx"), 4).alias("hurst_h"),
        )
        .orderBy("event_type")
    )


@register(
    "ts_variance_ratio",
    doc="Lo-MacKinlay variance-ratio random-walk test per event_type "
    "on the daily value-sum series: VR(q) = Var(q-day overlapping "
    "differences) / (q Var(1-day differences)) for q in (2, 4, 7) -- "
    "VR ~ 1 under a random walk, < 1 mean-reverting, > 1 trending; "
    "the stationarity screen beside hurst/acf. Differences come from "
    "ONE lag-window pass (var_pop single-scan aggregates).",
    oracle="""
WITH d AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         ROUND(SUM("value"), 6) AS x
  FROM events GROUP BY event_type, day
),
l AS (
  SELECT event_type, x,
         x - lag(x, 1) OVER w AS d1,
         x - lag(x, 2) OVER w AS d2,
         x - lag(x, 4) OVER w AS d4,
         x - lag(x, 7) OVER w AS d7
  FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day)
)
SELECT event_type,
       CAST(SUM(CASE WHEN d1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_diffs,
       ROUND(var_pop(d2) / (2 * var_pop(d1)), 4) AS vr_2,
       ROUND(var_pop(d4) / (4 * var_pop(d1)), 4) AS vr_4,
       ROUND(var_pop(d7) / (7 * var_pop(d1)), 4) AS vr_7
FROM l GROUP BY event_type
ORDER BY event_type
""",
)
def ts_variance_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    d = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.round(F.sum("value"), 6).alias("x"))
    w = Window.partitionBy("event_type").orderBy("day")
    l = d.select(
        "event_type",
        *[
            (F.col("x") - F.lag("x", q).over(w)).alias(f"d{q}")
            for q in (1, 2, 4, 7)
        ],
    )
    return (
        l.groupBy("event_type")
        .agg(
            F.sum(F.col("d1").isNotNull().cast("int")).alias("n_diffs"),
            F.round(F.var_pop("d2") / (2 * F.var_pop("d1")), 4).alias("vr_2"),
            F.round(F.var_pop("d4") / (4 * F.var_pop("d1")), 4).alias("vr_4"),
            F.round(F.var_pop("d7") / (7 * F.var_pop("d1")), 4).alias("vr_7"),
        )
        .orderBy("event_type")
    )


@register(
    "ts_forecast_backtest",
    doc="one-step-ahead forecast BACKTEST per event_type over the last "
    "14 days of the month: seasonal-naive (y_{t-7}) vs persistence/"
    "LOCF (y_{t-1}) on the daily value sums -- MAE and MAPE per "
    "method plus the winner, all from ONE lag-window pass (both "
    "forecasters are window-expressible, so the backtest costs one "
    "shuffle; the method-choice readout feeding holt/kalman model "
    "selection).",
    oracle="""
WITH d AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         ROUND(SUM("value"), 6) AS y,
         EXTRACT(day FROM ts) AS dom
  FROM events GROUP BY event_type, day, dom
),
l AS (
  SELECT event_type, dom, y,
         lag(y, 7) OVER w AS f_seasonal,
         lag(y, 1) OVER w AS f_locf
  FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day)
),
b AS (SELECT * FROM l WHERE dom >= 17 AND f_seasonal IS NOT NULL AND f_locf IS NOT NULL),
agg AS (
  SELECT event_type, COUNT(*)::BIGINT AS n_days,
         ROUND(AVG(abs(y - f_seasonal)), 4) AS mae_seasonal,
         ROUND(AVG(abs(y - f_locf)), 4) AS mae_locf,
         ROUND(AVG(abs(y - f_seasonal) / y), 6) AS mape_seasonal,
         ROUND(AVG(abs(y - f_locf) / y), 6) AS mape_locf
  FROM b GROUP BY event_type
)
SELECT *,
       CASE WHEN mae_seasonal <= mae_locf THEN 'seasonal_naive' ELSE 'locf' END AS winner
FROM agg ORDER BY event_type
""",
)
def ts_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    d = ev.groupBy(
        "event_type",
        F.date_trunc("day", "ts").cast("date").alias("day"),
        F.dayofmonth("ts").alias("dom"),
    ).agg(F.round(F.sum("value"), 6).alias("y"))
    w = Window.partitionBy("event_type").orderBy("day")
    l = d.select(
        "event_type",
        "dom",
        "y",
        F.lag("y", 7).over(w).alias("f_seasonal"),
        F.lag("y", 1).over(w).alias("f_locf"),
    )
    b = l.filter(
        (F.col("dom") >= 17)
        & F.col("f_seasonal").isNotNull()
        & F.col("f_locf").isNotNull()
    )
    agg = b.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(F.avg(F.abs(F.col("y") - F.col("f_seasonal"))), 4).alias("mae_seasonal"),
        F.round(F.avg(F.abs(F.col("y") - F.col("f_locf"))), 4).alias("mae_locf"),
        F.round(F.avg(F.abs(F.col("y") - F.col("f_seasonal")) / F.col("y")), 6).alias(
            "mape_seasonal"
        ),
        F.round(F.avg(F.abs(F.col("y") - F.col("f_locf")) / F.col("y")), 6).alias(
            "mape_locf"
        ),
    )
    return agg.select(
        "*",
        F.when(F.col("mae_seasonal") <= F.col("mae_locf"), "seasonal_naive")
        .otherwise("locf")
        .alias("winner"),
    ).orderBy("event_type")


def _haar_oracle(levels: int = 4) -> str:
    blocks = [
        """d AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         ROUND(SUM("value"), 6) AS v
  FROM events GROUP BY event_type, day
),
s0 AS (
  SELECT event_type, v,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS i
  FROM d QUALIFY i <= 16
)"""
    ]
    for k in range(1, levels + 1):
        blocks.append(
            f"""s{k} AS (
  SELECT event_type, (i - 1) // 2 + 1 AS i,
         (MAX(CASE WHEN i % 2 = 1 THEN v END)
          + MAX(CASE WHEN i % 2 = 0 THEN v END)) / 2 AS v,
         (MAX(CASE WHEN i % 2 = 1 THEN v END)
          - MAX(CASE WHEN i % 2 = 0 THEN v END)) / 2 AS dd
  FROM s{k - 1} GROUP BY event_type, (i - 1) // 2 + 1
)"""
        )
    energies = ",\n       ".join(
        f"ROUND((SELECT SUM(dd * dd) FROM s{k} x WHERE x.event_type = t.event_type), 2) AS energy_l{k}"
        for k in range(1, levels + 1)
    )
    return f"""
WITH {','.join(blocks)}
SELECT event_type,
       {energies}
FROM (SELECT DISTINCT event_type FROM s0) t
ORDER BY event_type
"""


@register(
    "ts_wavelet_haar_energy",
    doc="Haar wavelet energy spectrum per event_type over the first 16 "
    "days of daily value sums: 4 halving levels (smooth = pair mean, "
    "detail = pair half-difference), energy_k = sum of squared "
    "details -- which TIME SCALE carries the variance (daily noise "
    "vs weekly structure), the multiresolution complement to the "
    "periodogram. Every op is a dyadic mean/difference of round-6 "
    "inputs, so both engines are bit-identical with no grid tricks; "
    "each level is one bounded pair rollup.",
    oracle=_haar_oracle(),
)
def ts_wavelet_haar_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    d = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.round(F.sum("value"), 6).alias("v"))
    s = d.select(
        "event_type",
        "v",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("day"))
        .alias("i"),
    ).filter(F.col("i") <= 16)
    energies = []
    for k in range(1, 5):
        odd = F.max(F.when(F.col("i") % 2 == 1, F.col("v")))
        even = F.max(F.when(F.col("i") % 2 == 0, F.col("v")))
        nxt = s.groupBy(
            "event_type", (F.expr("(i - 1) div 2") + 1).alias("i2")
        ).agg(
            ((odd + even) / 2).alias("v"),
            ((odd - even) / 2).alias("dd"),
        )
        energies.append(
            nxt.groupBy("event_type").agg(
                F.round(F.sum(F.col("dd") * F.col("dd")), 2).alias(f"energy_l{k}")
            )
        )
        s = nxt.select("event_type", F.col("i2").alias("i"), "v")
    out = energies[0]
    for e in energies[1:]:
        out = out.join(e, "event_type")
    return out.orderBy("event_type")


@register(
    "ts_seasonality_strength",
    doc="seasonal/trend strength indexes (Hyndman's STL-based F_s = "
    "max(0, 1 - Var(resid)/Var(seasonal + resid)) and F_t analog) for "
    "the daily revenue series -- one-number answers to 'is the weekly "
    "cycle real?' computed from the SAME decomposition lineage as "
    "ts_stl_decompose (centered 7-day MA trend, zero-centered dow "
    "seasonal). Two variance aggregates over the decomposed columns.",
    oracle="""
WITH d AS (
  SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
         SUM(o_totalprice) AS rev
  FROM orders GROUP BY day
),
t AS (
  SELECT day, rev,
         AVG(rev) OVER w AS trend,
         COUNT(*) OVER w AS fw
  FROM d WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
full_t AS (SELECT day, rev, trend, rev - trend AS det FROM t WHERE fw = 7),
s_raw AS (
  SELECT CAST(isodow(day) AS INT) AS dow, AVG(det) AS s0
  FROM full_t GROUP BY dow
),
s AS (SELECT dow, s0 - (SELECT AVG(s0) FROM s_raw) AS seasonal FROM s_raw),
x AS (
  SELECT f.rev, f.trend, s.seasonal, f.det - s.seasonal AS resid
  FROM full_t f JOIN s ON s.dow = CAST(isodow(f.day) AS INT)
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
       ROUND(GREATEST(0.0, 1.0 - var_pop(resid) / var_pop(seasonal + resid)), 4) AS seasonal_strength,
       ROUND(GREATEST(0.0, 1.0 - var_pop(resid) / var_pop(trend + resid)), 4) AS trend_strength
FROM x
""",
)
def ts_seasonality_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    d = orders.groupBy(
        F.date_trunc("day", "o_orderdate").cast("date").alias("day")
    ).agg(F.sum("o_totalprice").alias("rev"))
    # calendar-bounded day grid -- the stl_decompose whitelist rationale
    w = Window.orderBy("day").rowsBetween(-3, 3)
    t = d.select(
        "day",
        "rev",
        F.avg("rev").over(w).alias("trend"),
        F.count(F.lit(1)).over(w).alias("fw"),
    )
    full_t = t.filter(F.col("fw") == 7).select(
        "day", "rev", "trend", (F.col("rev") - F.col("trend")).alias("det")
    )
    s_raw = full_t.groupBy(
        F.expr("extract(DAYOFWEEK_ISO FROM day)").cast("int").alias("dow")
    ).agg(F.avg("det").alias("s0"))
    smean = s_raw.agg(F.avg("s0").alias("sm"))
    s = s_raw.crossJoin(F.broadcast(smean)).select(
        "dow", (F.col("s0") - F.col("sm")).alias("seasonal")
    )
    x = (
        full_t.withColumn(
            "dow", F.expr("extract(DAYOFWEEK_ISO FROM day)").cast("int")
        )
        .join(F.broadcast(s), "dow")
        .select(
            "trend",
            "seasonal",
            (F.col("det") - F.col("seasonal")).alias("resid"),
        )
    )
    return x.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(
            F.greatest(
                F.lit(0.0),
                1.0 - F.var_pop("resid") / F.var_pop(F.col("seasonal") + F.col("resid")),
            ),
            4,
        ).alias("seasonal_strength"),
        F.round(
            F.greatest(
                F.lit(0.0),
                1.0 - F.var_pop("resid") / F.var_pop(F.col("trend") + F.col("resid")),
            ),
            4,
        ).alias("trend_strength"),
    )


@register(
    "funnel_session_scoped",
    doc="session-scoped funnel: view -> click -> purchase must complete "
    "INSIDE one 30-min-gap session, the grain product analytics "
    "actually reports (the user-grain funnel above credits conversions "
    "days apart). Composition of two window passes that share the "
    "user-key exchange: gap sessionization (lag + cumulative break "
    "count, ties broken by event_id on both engines) then the "
    "conditional-min stage windows re-partitioned by (user, session). "
    "Single-row output; NULLIF guards the empty-funnel division "
    "identically in both engines.",
    oracle="""
WITH e AS (
  SELECT user_id, ts, event_type,
         CASE WHEN floor(epoch(ts)) - floor(epoch(
                lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))) > 1800
              THEN 1 ELSE 0 END AS brk
  FROM events
),
s AS (
  SELECT user_id, ts, event_type,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM e
),
f1 AS (
  SELECT *, min(CASE WHEN event_type = 'view' THEN ts END)
              OVER (PARTITION BY user_id, sid) AS t1
  FROM s
),
f2 AS (
  SELECT *, min(CASE WHEN event_type = 'click' AND ts > t1 THEN ts END)
              OVER (PARTITION BY user_id, sid) AS t2
  FROM f1
),
f3 AS (
  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END)
              OVER (PARTITION BY user_id, sid) AS t3
  FROM f2
),
u AS (SELECT DISTINCT user_id, sid, t1, t2, t3 FROM f3)
SELECT count(*) AS n_sessions,
       count(t1) AS n_step1, count(t2) AS n_step2, count(t3) AS n_step3,
       ROUND(count(t2) * 1.0 / NULLIF(count(t1), 0), 4) AS conv_view_click,
       ROUND(count(t3) * 1.0 / NULLIF(count(t2), 0), 4) AS conv_click_purchase
FROM u
""",
)
def funnel_session_scoped(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    brk = (
        F.floor(F.unix_timestamp("ts")) - F.floor(F.unix_timestamp(F.lag("ts").over(wo)))
        > 1800
    ).cast("int")
    s = ev.select(
        "user_id",
        "ts",
        "event_type",
        F.sum(F.coalesce(brk, F.lit(0)))
        .over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("sid"),
    )
    ws = Window.partitionBy("user_id", "sid")
    t1 = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(ws)
    f1 = s.withColumn("t1", t1)
    t2 = F.min(
        F.when((F.col("event_type") == "click") & (F.col("ts") > F.col("t1")), F.col("ts"))
    ).over(ws)
    f2 = f1.withColumn("t2", t2)
    t3 = F.min(
        F.when((F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2")), F.col("ts"))
    ).over(ws)
    f3 = f2.withColumn("t3", t3)
    u = f3.select("user_id", "sid", "t1", "t2", "t3").distinct()
    return u.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.count("t1").alias("n_step1"),
        F.count("t2").alias("n_step2"),
        F.count("t3").alias("n_step3"),
        F.round(F.count("t2") * 1.0 / F.nullif(F.count("t1"), F.lit(0)), 4).alias(
            "conv_view_click"
        ),
        F.round(F.count("t3") * 1.0 / F.nullif(F.count("t2"), F.lit(0)), 4).alias(
            "conv_click_purchase"
        ),
    )


@register(
    "ts_sax_motifs",
    doc="SAX motif discovery (symbolic aggregate approximation, the "
    "standard PAA+quantize pipeline): each (event_type, day) 24-hour "
    "load profile is averaged into 6 four-hour PAA segments, "
    "z-normalized, and quantized into a 3-symbol word via the "
    "normal-tercile breakpoints (+-0.43); identical words across days "
    "are motifs -- recurring intraday shapes, found by an exact "
    "groupBy on the word instead of any pairwise distance scan. "
    "Scale shape: one (type, day, hour) rollup (map-side), a "
    "constant-24 dense grid explode, one segment rollup, one word "
    "rollup -- every exchange is key+word-sized. Sums/means/stds are "
    "rounded to 4dp BEFORE quantizing so both engines symbolize "
    "identical inputs; zero-variance days quantize to all-'b' via the "
    "shared sd=0 guard.",
    oracle="""
WITH hourly AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(extract(hour FROM ts) AS INTEGER) AS hr,
         ROUND(SUM(value), 4) AS v
  FROM events GROUP BY 1, 2, 3
),
grid AS (
  SELECT e.event_type, d.day, h.hr, COALESCE(hourly.v, 0.0) AS v
  FROM (SELECT DISTINCT event_type FROM hourly) e
  CROSS JOIN (SELECT DISTINCT day FROM hourly) d
  CROSS JOIN (SELECT unnest(range(24)) AS hr) h
  LEFT JOIN hourly ON hourly.event_type = e.event_type
                  AND hourly.day = d.day AND hourly.hr = h.hr
),
paa AS (
  SELECT event_type, day, hr // 4 AS seg, ROUND(AVG(v), 4) AS v
  FROM grid GROUP BY 1, 2, 3
),
stats AS (
  SELECT event_type, day,
         ROUND(AVG(v), 4) AS mu,
         ROUND(stddev_pop(v), 4) AS sd
  FROM paa GROUP BY 1, 2
),
sym AS (
  SELECT p.event_type, p.day, p.seg,
         CASE WHEN s.sd = 0 THEN 'b'
              WHEN ROUND((p.v - s.mu) / s.sd, 4) <= -0.43 THEN 'a'
              WHEN ROUND((p.v - s.mu) / s.sd, 4) <= 0.43 THEN 'b'
              ELSE 'c' END AS c
  FROM paa p JOIN stats s ON p.event_type = s.event_type AND p.day = s.day
),
words AS (
  SELECT event_type, day, string_agg(c, '' ORDER BY seg) AS word
  FROM sym GROUP BY event_type, day
)
SELECT event_type, word, count(*) AS n_days,
       CAST(MIN(day) AS VARCHAR) AS first_day
FROM words GROUP BY event_type, word
HAVING count(*) >= 2
ORDER BY event_type, n_days DESC, word
""",
)
def ts_sax_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    hourly = ev.groupBy(
        "event_type",
        F.col("ts").cast("date").alias("day"),
        F.hour("ts").alias("hr"),
    ).agg(F.round(F.sum("value"), 4).alias("v"))
    # dense 24-hour grid per (type, day): hours with no events are 0,
    # generated via one explode of a 24-literal -- no data-scaling join
    days = hourly.select("event_type", "day").distinct()
    grid = days.select(
        "event_type", "day", F.explode(F.sequence(F.lit(0), F.lit(23))).alias("hr")
    ).join(hourly, ["event_type", "day", "hr"], "left").fillna(0.0, ["v"])
    paa = grid.groupBy(
        "event_type", "day", F.expr("hr div 4").alias("seg")
    ).agg(F.round(F.avg("v"), 4).alias("v"))
    stats = paa.groupBy("event_type", "day").agg(
        F.round(F.avg("v"), 4).alias("mu"),
        F.round(F.stddev_pop("v"), 4).alias("sd"),
    )
    z = F.round((F.col("v") - F.col("mu")) / F.col("sd"), 4)
    sym = paa.join(stats, ["event_type", "day"]).select(
        "event_type",
        "day",
        "seg",
        F.when(F.col("sd") == 0, F.lit("b"))
        .when(z <= -0.43, F.lit("a"))
        .when(z <= 0.43, F.lit("b"))
        .otherwise(F.lit("c"))
        .alias("c"),
    )
    words = sym.groupBy("event_type", "day").agg(
        F.array_join(F.array_sort(F.collect_list(F.struct("seg", "c"))).c, "").alias("word")
    )
    return (
        words.groupBy("event_type", "word")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.min("day").cast("string").alias("first_day"),
        )
        .filter(F.col("n_days") >= 2)
        .orderBy("event_type", F.col("n_days").desc(), "word")
    )


def _dtw_fold_sql(n: int) -> str:
    """DTW(nxn) as ONE Spark SQL expression: outer fold over rows i with
    the previous DP row as accumulator, inner fold over j building row i
    left-to-right -- the classic O(n^2) recurrence entirely inside
    whole-stage codegen (no UDF, no Python, no shuffle). Columns `_a`,
    `_b` are the two (already-normalized) length-n double arrays."""
    return f"""
element_at(
  aggregate(sequence(0, {n - 1}),
    cast(array() as array<double>),
    (prev, i) ->
      aggregate(sequence(0, {n - 1}),
        cast(array() as array<double>),
        (cur, j) ->
          cur || array(
            abs(element_at(_a, i+1) - element_at(_b, j+1)) +
            CASE
              WHEN i = 0 AND j = 0 THEN cast(0.0 as double)
              WHEN i = 0 THEN element_at(cur, j)
              WHEN j = 0 THEN element_at(prev, 1)
              ELSE least(element_at(prev, j+1), element_at(cur, j), element_at(prev, j))
            END)
      )
  ), {n})
"""


@register(
    "ts_dtw_shape_distance",
    doc="dynamic time warping between event types' z-normalized "
    "average-day profiles -- the elastic shape distance (tolerates "
    "phase shift) that Euclidean hour-by-hour comparison cannot give, "
    "an operator Spark lacks, built as a COMPOSITION of built-ins: "
    "the full O(24x24) DP recurrence runs as one nested "
    "aggregate()/fold SQL expression inside whole-stage codegen "
    "(_dtw_fold_sql) -- per-pair cost is a constant, the pair frame "
    "is #types^2 (at entity grain you would LSH-prune pairs first, "
    "same valve as the dedup tiers). The oracle replays the identical "
    "DP as a 576-step recursive CTE carrying (prev row, partial row); "
    "inputs are rounded 4dp before the fold and both engines execute "
    "the same operation order, so the distances match bit-exactly.",
    oracle="""
WITH RECURSIVE hourly AS (
  -- integer micro-units: the hour average is an EXACT integer sum over
  -- any partitioning, then one double division identical on both
  -- engines -- float SUM/AVG is association-order-dependent and a
  -- parallel Spark sum near a rounding boundary diverged from DuckDB's
  -- sequential one (caught by the default-session rehearsal)
  SELECT event_type, CAST(extract(hour FROM ts) AS INTEGER) AS hr,
         CAST(ROUND(CAST(SUM(CAST(ROUND(value * 1000000, 0) AS BIGINT)) AS DOUBLE)
                    / count(*) / 100.0, 0) AS BIGINT) AS vq
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT event_type, count(*) AS n,
         CAST(SUM(vq) AS DOUBLE) AS s1,
         CAST(SUM(vq * vq) AS DOUBLE) AS s2
  FROM hourly GROUP BY 1
),
prof AS (
  SELECT h.event_type,
         array_agg(CASE WHEN s.s2 / s.n - (s.s1 / s.n) * (s.s1 / s.n) <= 0 THEN 0.0
                        ELSE ROUND((h.vq - s.s1 / s.n) /
                                   sqrt(s.s2 / s.n - (s.s1 / s.n) * (s.s1 / s.n)), 4)
                   END ORDER BY h.hr) AS p
  FROM hourly h JOIN stats s ON h.event_type = s.event_type
  GROUP BY h.event_type
),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, a.p AS a, b.p AS b
  FROM prof a JOIN prof b ON a.event_type < b.event_type
),
dp AS (
  SELECT type_a, type_b, a, b, 0 AS k,
         CAST([] AS DOUBLE[]) AS prev,
         CAST([abs(a[1] - b[1])] AS DOUBLE[]) AS cur
  FROM pairs
  UNION ALL
  SELECT type_a, type_b, a, b, k + 1,
         CASE WHEN (k + 1) % 24 = 0 THEN cur ELSE prev END,
         CASE WHEN (k + 1) % 24 = 0
              THEN [abs(a[(k + 1) // 24 + 1] - b[1]) + cur[1]]
              ELSE cur || [abs(a[k // 24 + 1] - b[(k + 1) % 24 + 1]) +
                CASE WHEN k // 24 = 0 THEN cur[(k + 1) % 24]
                     ELSE least(prev[(k + 1) % 24 + 1], cur[(k + 1) % 24], prev[(k + 1) % 24])
                END]
         END
  FROM dp WHERE k < 575
)
SELECT type_a, type_b, ROUND(cur[24], 4) AS dtw
FROM dp WHERE k = 575
ORDER BY type_a, type_b
""",
)
def ts_dtw_shape_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    # integer micro-units (see oracle note): exact sums regardless of
    # partitioning, then single divisions both engines execute identically
    micro = F.round(F.col("value") * 1000000, 0).cast("long")
    hourly = ev.groupBy("event_type", F.hour("ts").alias("hr")).agg(
        F.round(F.sum(micro).cast("double") / F.count(F.lit(1)) / 100.0, 0)
        .cast("long")
        .alias("vq")
    )
    stats = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("vq").cast("double").alias("s1"),
        F.sum(F.col("vq") * F.col("vq")).cast("double").alias("s2"),
    )
    mu = F.col("s1") / F.col("n")
    var = F.col("s2") / F.col("n") - mu * mu
    z = F.when(var <= 0, F.lit(0.0)).otherwise(
        F.round((F.col("vq") - mu) / F.sqrt(var), 4)
    )
    prof = (
        hourly.join(stats, "event_type")
        .select("event_type", "hr", z.alias("z"))
        .groupBy("event_type")
        .agg(F.array_sort(F.collect_list(F.struct("hr", "z"))).z.alias("p"))
    )
    a = prof.select(F.col("event_type").alias("type_a"), F.col("p").alias("_a"))
    b = prof.select(F.col("event_type").alias("type_b"), F.col("p").alias("_b"))
    pairs = a.join(b, F.col("type_a") < F.col("type_b"))
    return (
        pairs.withColumn("dtw", F.round(F.expr(_dtw_fold_sql(24)), 4))
        .select("type_a", "type_b", "dtw")
        .orderBy("type_a", "type_b")
    )


def _viterbi_consts() -> dict:
    """HMM parameters as FULL-PRECISION repr literals shared by both
    engines (repr round-trips exactly; both parsers are correctly-
    rounded). Max-product Viterbi in log space uses only + and
    greatest at runtime -- no exp/ln whose libm implementations could
    differ cross-engine by an ulp."""
    import math

    emit = {
        "view": (math.log(0.55), math.log(0.25)),
        "click": (math.log(0.25), math.log(0.30)),
        "purchase": (math.log(0.05), math.log(0.25)),
        "signup": (math.log(0.05), math.log(0.10)),
        "error": (math.log(0.10), math.log(0.10)),
    }
    t = {k: math.log(v) for k, v in {"t00": 0.8, "t01": 0.2, "t10": 0.3, "t11": 0.7}.items()}
    return {"emit": emit, **t, "p0": math.log(0.6), "p1": math.log(0.4)}


def _viterbi_emit_case(state: int, var: str) -> str:
    c = _viterbi_consts()
    whens = " ".join(
        f"WHEN '{k}' THEN CAST({v[state]!r} AS DOUBLE)" for k, v in c["emit"].items()
    )
    return f"(CASE {var} {whens} ELSE CAST(-23.0 AS DOUBLE) END)"


def _viterbi_oracle() -> str:
    c = _viterbi_consts()
    e0, e1 = _viterbi_emit_case(0, "seq[k + 1]"), _viterbi_emit_case(1, "seq[k + 1]")
    s0, s1 = _viterbi_emit_case(0, "seq[1]"), _viterbi_emit_case(1, "seq[1]")
    return f"""
WITH RECURSIVE seqs AS (
  SELECT user_id, array_agg(event_type ORDER BY ts, event_id) AS seq
  FROM events GROUP BY user_id
),
dp AS (
  SELECT user_id, seq, 1 AS k,
         CAST({c['p0']!r} AS DOUBLE) + {s0} AS lp0,
         CAST({c['p1']!r} AS DOUBLE) + {s1} AS lp1
  FROM seqs
  UNION ALL
  SELECT user_id, seq, k + 1,
         greatest(lp0 + CAST({c['t00']!r} AS DOUBLE), lp1 + CAST({c['t10']!r} AS DOUBLE)) + {e0},
         greatest(lp0 + CAST({c['t01']!r} AS DOUBLE), lp1 + CAST({c['t11']!r} AS DOUBLE)) + {e1}
  FROM dp WHERE k < len(seq)
),
fin AS (
  SELECT user_id, len(seq) AS n, lp0, lp1,
         CAST(ROUND(greatest(lp0, lp1) / len(seq) * 10000, 0) AS BIGINT) AS q
  FROM dp WHERE k = len(seq)
)
SELECT CASE WHEN lp1 > lp0 THEN 'engaged' ELSE 'casual' END AS state,
       count(*) AS n_users,
       CAST(SUM(n) AS BIGINT) AS n_events,
       ROUND(SUM(n) * 1.0 / count(*), 2) AS avg_seq_len,
       ROUND(CAST(SUM(q) AS DOUBLE) / count(*) / 10000.0, 4) AS avg_lp_per_event
FROM fin GROUP BY 1 ORDER BY state
"""


@register(
    "events_viterbi_engagement",
    doc="Viterbi decoding of a 2-state engagement HMM over each user's "
    "event sequence -- probabilistic sequence classification as a "
    "pure-codegen fold (the DTW pattern applied to max-product DP): "
    "the accumulator is a named_struct of the two state log-probs, "
    "each step one greatest()+literal-CASE emission, so a user's "
    "WHOLE trellis collapses inside whole-stage codegen with no UDF "
    "and only the (user, sequence) rollup shuffle. Log-space "
    "max-product uses only + and greatest -- deterministic cross-"
    "engine, unlike forward-algorithm log-sum-exp whose exp/ln libm "
    "could drift an ulp. Per-user scores are quantized to integer "
    "1e-4 units before the state rollup so the report averages are "
    "exact under any partitioning. Oracle replays the identical "
    "recurrence as a per-user recursive CTE.",
    oracle=_viterbi_oracle(),
)
def events_viterbi_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _viterbi_consts()
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    seqs = ev.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))).event_type.alias(
            "_seq"
        )
    )
    s0, s1 = _viterbi_emit_case(0, "element_at(_seq, 1)"), _viterbi_emit_case(
        1, "element_at(_seq, 1)"
    )
    e0, e1 = _viterbi_emit_case(0, "x"), _viterbi_emit_case(1, "x")
    fold = f"""
aggregate(
  slice(_seq, 2, greatest(size(_seq) - 1, 0)),
  named_struct(
    'lp0', CAST({c['p0']!r} AS DOUBLE) + {s0},
    'lp1', CAST({c['p1']!r} AS DOUBLE) + {s1}),
  (acc, x) -> named_struct(
    'lp0', greatest(acc.lp0 + CAST({c['t00']!r} AS DOUBLE), acc.lp1 + CAST({c['t10']!r} AS DOUBLE)) + {e0},
    'lp1', greatest(acc.lp0 + CAST({c['t01']!r} AS DOUBLE), acc.lp1 + CAST({c['t11']!r} AS DOUBLE)) + {e1})
)
"""
    scored = seqs.select(
        F.size("_seq").alias("n"), F.expr(fold).alias("v")
    ).select(
        "n",
        F.col("v.lp0").alias("lp0"),
        F.col("v.lp1").alias("lp1"),
        F.round(F.greatest("v.lp0", "v.lp1") / F.col("n") * 10000, 0)
        .cast("long")
        .alias("q"),
    )
    state = F.when(F.col("lp1") > F.col("lp0"), "engaged").otherwise("casual")
    return (
        scored.groupBy(state.alias("state"))
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("n").alias("n_events"),
            F.round(F.sum("n") * 1.0 / F.count(F.lit(1)), 2).alias("avg_seq_len"),
            F.round(F.sum("q").cast("double") / F.count(F.lit(1)) / 10000.0, 4).alias(
                "avg_lp_per_event"
            ),
        )
        .orderBy("state")
    )


@register(
    "ts_peak_detection",
    doc="local-maximum peak detection with PROMINENCE filtering on the "
    "hourly event-count series: a peak is a bucket strictly higher "
    "than its w=3 neighborhood on both sides (ties broken toward the "
    "earlier bucket via >= on the left, > on the right -- plateaus "
    "yield ONE peak), kept only if it rises at least min_prom above "
    "the higher of the two w-window shoulder minima -- the standard "
    "scipy-find_peaks contract restated as window functions. One "
    "(hour-bucket) rollup then one partitioned-by-nothing-free "
    "window pass over the BOUNDED bucket frame (one row per hour of "
    "the month, calendar-bounded).",
    oracle="""
WITH b AS (
  -- naive interval arithmetic, NOT to_timestamp()::TIMESTAMP: the latter
  -- localizes through the process timezone and breaks the TZ sweep when
  -- the bucket is rendered as a string (the formatted-UTC-strings rule)
  SELECT TIMESTAMP '1970-01-01'
           + ((floor(epoch(ts))::BIGINT // 3600) * 3600) * INTERVAL 1 SECOND AS bucket,
         count(*) AS n
  FROM events GROUP BY 1
),
w AS (
  SELECT bucket, n,
         MAX(n) OVER (ORDER BY bucket ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS lmax,
         MAX(n) OVER (ORDER BY bucket ROWS BETWEEN 1 FOLLOWING AND 3 FOLLOWING) AS rmax,
         MIN(n) OVER (ORDER BY bucket ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS lmin,
         MIN(n) OVER (ORDER BY bucket ROWS BETWEEN 1 FOLLOWING AND 3 FOLLOWING) AS rmin
  FROM b
)
SELECT strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket, n,
       CAST(n - GREATEST(COALESCE(lmin, 0), COALESCE(rmin, 0)) AS BIGINT) AS prominence
FROM w
WHERE n >= COALESCE(lmax, -1) AND n > COALESCE(rmax, -1)
  AND n - GREATEST(COALESCE(lmin, 0), COALESCE(rmin, 0)) >= 5
ORDER BY bucket
""",
)
def ts_peak_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    b = ev.groupBy(
        (F.floor(F.unix_timestamp("ts") / 3600) * 3600).cast("timestamp").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy("bucket")
    lmax = F.max("n").over(w.rowsBetween(-3, -1))
    rmax = F.max("n").over(w.rowsBetween(1, 3))
    lmin = F.min("n").over(w.rowsBetween(-3, -1))
    rmin = F.min("n").over(w.rowsBetween(1, 3))
    d = b.select(
        "bucket",
        "n",
        F.coalesce(lmax, F.lit(-1)).alias("lmax"),
        F.coalesce(rmax, F.lit(-1)).alias("rmax"),
        F.greatest(F.coalesce(lmin, F.lit(0)), F.coalesce(rmin, F.lit(0))).alias("shoulder"),
    )
    return (
        d.filter(
            (F.col("n") >= F.col("lmax"))
            & (F.col("n") > F.col("rmax"))
            & (F.col("n") - F.col("shoulder") >= 5)
        )
        .select(
            F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
            "n",
            (F.col("n") - F.col("shoulder")).alias("prominence"),
        )
        .orderBy("bucket")
    )


@register(
    "ts_bollinger_bands",
    doc="Bollinger bands over the daily revenue series: 7-row trailing "
    "mean +/- 2 population sigma, plus %B position. Determinism by "
    "EXACT ARITHMETIC instead of rounding: the series is daily "
    "revenue in integer kilodollars, so every window SUM(v) and "
    "SUM(v*v) is an exact BIGINT in both engines (v^2*7 << 2^53 even "
    "at sf0.1) and mean/sd/bands are IDENTICAL IEEE doubles -- no "
    "ROUND anywhere, hence no half-boundary repr-vs-binary rounding "
    "divergence (a 6-decimal pre-rounded series re-rounded at 4 "
    "mismatched ~1/100 rows; see the v-column note in git history). "
    "Rows with an incomplete 7-day history are dropped (rn >= 7). "
    "Scale: the window runs on the per-day rollup (~365 rows/year), "
    "not the raw fact table; at 100 TB the rollup is the only "
    "shuffle and the window is free.",
    oracle="""
WITH d AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(ROUND(SUM(o_totalprice) / 1000.0, 0) AS BIGINT) AS v
  FROM orders GROUP BY 1
),
w AS (
  SELECT day, v,
         ROW_NUMBER() OVER (ORDER BY day) AS rn,
         SUM(v) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS s1,
         SUM(v * v) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS s2
  FROM d
),
b AS (
  SELECT day, v, s1 / 7.0 AS mid,
         sqrt(GREATEST(s2 / 7.0 - (s1 / 7.0) * (s1 / 7.0), 0.0)) AS sd
  FROM w WHERE rn >= 7
)
SELECT day, v, mid,
       mid + 2 * sd AS upper_band,
       mid - 2 * sd AS lower_band,
       CASE WHEN sd = 0 THEN NULL ELSE (v - (mid - 2 * sd)) / (4 * sd) END AS pct_b
FROM b ORDER BY day
""",
)
def ts_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    d = orders.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.round(F.sum("o_totalprice") / 1000.0, 0).cast("long").alias("v")
    )
    from pyspark.sql import Window as W

    frame = W.orderBy("day").rowsBetween(-6, 0)
    w = d.select(
        "day",
        "v",
        F.row_number().over(W.orderBy("day")).alias("rn"),
        F.sum("v").over(frame).alias("s1"),
        F.sum(F.col("v") * F.col("v")).over(frame).alias("s2"),
    ).filter(F.col("rn") >= 7)
    mid = F.col("s1") / 7.0
    b = w.select(
        "day",
        "v",
        mid.alias("mid"),
        F.sqrt(F.greatest(F.col("s2") / 7.0 - mid * mid, F.lit(0.0))).alias("sd"),
    )
    return b.select(
        "day",
        "v",
        "mid",
        (F.col("mid") + 2 * F.col("sd")).alias("upper_band"),
        (F.col("mid") - 2 * F.col("sd")).alias("lower_band"),
        F.when(F.col("sd") == 0, F.lit(None).cast("double"))
        .otherwise((F.col("v") - (F.col("mid") - 2 * F.col("sd"))) / (4 * F.col("sd")))
        .alias("pct_b"),
    ).orderBy("day")


@register(
    "ts_rsi_cutler",
    doc="Cutler's RSI(14) on the daily revenue series -- the SMA variant "
    "of the relative-strength index (Wilder's recursive smoothing is "
    "an infinite-memory EWMA whose pow(13/14, j) weights differ in "
    "ulps across libm implementations; Cutler's rolling-mean form is "
    "the published alternative that IS cross-engine exact). Same "
    "exact-integer discipline as ts_bollinger_bands: the series is "
    "integer kilodollars, gains/losses are integer diffs, the 14-row "
    "trailing sums are exact BIGINTs, and avg/RS/RSI are identical "
    "IEEE doubles on both engines with NO rounding. The all-gain "
    "day (sum_loss = 0 -> RSI = 100) is pinned. Incomplete histories "
    "dropped (rn >= 15: 14 diffs need 15 days).",
    oracle="""
WITH d AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(ROUND(SUM(o_totalprice) / 1000.0, 0) AS BIGINT) AS v
  FROM orders GROUP BY 1
),
di AS (
  SELECT day, ROW_NUMBER() OVER (ORDER BY day) AS rn,
         v - LAG(v) OVER (ORDER BY day) AS diff
  FROM d
),
g AS (
  SELECT day, rn,
         SUM(GREATEST(diff, 0)) OVER (ORDER BY day ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS sum_gain,
         SUM(GREATEST(-diff, 0)) OVER (ORDER BY day ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS sum_loss
  FROM di WHERE rn >= 2
)
SELECT day, sum_gain / 14.0 AS avg_gain, sum_loss / 14.0 AS avg_loss,
       CASE WHEN sum_loss = 0 THEN 100.0
            ELSE 100.0 - 100.0 / (1.0 + sum_gain * 1.0 / sum_loss) END AS rsi
FROM g WHERE rn >= 15 ORDER BY day
""",
)
def ts_rsi_cutler(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    d = orders.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.round(F.sum("o_totalprice") / 1000.0, 0).cast("long").alias("v")
    )
    from pyspark.sql import Window as W

    seq = W.orderBy("day")
    di = d.select(
        "day",
        F.row_number().over(seq).alias("rn"),
        (F.col("v") - F.lag("v").over(seq)).alias("diff"),
    ).filter(F.col("rn") >= 2)
    frame = W.orderBy("day").rowsBetween(-13, 0)
    g = di.select(
        "day",
        "rn",
        F.sum(F.greatest(F.col("diff"), F.lit(0))).over(frame).alias("sum_gain"),
        F.sum(F.greatest(-F.col("diff"), F.lit(0))).over(frame).alias("sum_loss"),
    ).filter(F.col("rn") >= 15)
    return g.select(
        "day",
        (F.col("sum_gain") / 14.0).alias("avg_gain"),
        (F.col("sum_loss") / 14.0).alias("avg_loss"),
        F.when(F.col("sum_loss") == 0, F.lit(100.0))
        .otherwise(100.0 - 100.0 / (1.0 + F.col("sum_gain") * 1.0 / F.col("sum_loss")))
        .alias("rsi"),
    ).orderBy("day")


@register(
    "ts_spectral_entropy",
    doc="spectral entropy of the daily revenue series over the "
    "ts_periodogram_weekly period grid p = 2..14: normalize the "
    "13 Goertzel powers to a distribution and report "
    "H = -SUM p ln p plus H / ln(13) (1.0 = white noise, 0 = pure "
    "tone) and the dominant period. Same snap-the-Fourier-sums-"
    "before-squaring discipline as the periodogram (the +-1e6-term "
    "cancellation would otherwise amplify past rounding); the "
    "13-term entropy sum is rounded at 4.",
    oracle="""
WITH d AS (
  SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
         SUM(o_totalprice) AS rev
  FROM orders GROUP BY day
),
s AS (SELECT rev, ROW_NUMBER() OVER (ORDER BY day) - 1 AS t FROM d),
m AS (SELECT AVG(rev) AS mu FROM s),
grid AS (SELECT unnest(range(2, 15)) AS p),
pow AS (
  SELECT grid.p,
         ROUND(SUM((s.rev - m.mu) * cos(2.0 * 3.141592653589793 * s.t / grid.p)), 3) AS c,
         ROUND(SUM((s.rev - m.mu) * sin(2.0 * 3.141592653589793 * s.t / grid.p)), 3) AS sn
  FROM grid CROSS JOIN s CROSS JOIN m
  GROUP BY grid.p
),
pw AS (SELECT p, c * c + sn * sn AS power FROM pow),
tot AS (SELECT SUM(power) AS tp FROM pw),
h AS (
  SELECT SUM(CASE WHEN power > 0 THEN -(power / tot.tp) * ln(power / tot.tp) ELSE 0.0 END) AS ent
  FROM pw, tot
),
dom AS (SELECT p FROM pw ORDER BY power DESC, p LIMIT 1)
SELECT CAST(dom.p AS INT) AS dominant_period,
       ROUND(h.ent, 4) AS spectral_entropy,
       ROUND(h.ent / ln(13.0), 4) AS normalized_entropy
FROM h, dom
""",
)
def ts_spectral_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    d = orders.groupBy(
        F.date_trunc("day", "o_orderdate").cast("date").alias("day")
    ).agg(F.sum("o_totalprice").alias("rev"))
    # calendar-bounded day index (one row per day -- runs-test rationale)
    s = d.select("rev", (F.row_number().over(W.orderBy("day")) - 1).alias("t"))
    m = s.agg(F.avg("rev").alias("mu"))
    grid = spark.range(2, 15).select(F.col("id").cast("int").alias("p"))
    pi2 = 2.0 * 3.141592653589793
    pow_ = (
        s.crossJoin(F.broadcast(grid))
        .crossJoin(F.broadcast(m))
        .groupBy("p")
        .agg(
            F.round(
                F.sum((F.col("rev") - F.col("mu")) * F.cos(pi2 * F.col("t") / F.col("p"))), 3
            ).alias("c"),
            F.round(
                F.sum((F.col("rev") - F.col("mu")) * F.sin(pi2 * F.col("t") / F.col("p"))), 3
            ).alias("sn"),
        )
    )
    pw = pow_.select("p", (F.col("c") * F.col("c") + F.col("sn") * F.col("sn")).alias("power"))
    tot = pw.agg(F.sum("power").alias("tp"))
    h = pw.crossJoin(F.broadcast(tot)).agg(
        F.sum(
            F.when(
                F.col("power") > 0,
                -(F.col("power") / F.col("tp")) * F.log(F.col("power") / F.col("tp")),
            ).otherwise(F.lit(0.0))
        ).alias("ent")
    )
    dom = pw.orderBy(F.col("power").desc(), "p").limit(1).select(F.col("p").alias("dominant_period"))
    return h.crossJoin(F.broadcast(dom)).select(
        F.col("dominant_period").cast("int").alias("dominant_period"),
        F.round("ent", R).alias("spectral_entropy"),
        F.round(F.col("ent") / F.log(F.lit(13.0)), R).alias("normalized_entropy"),
    )


@register(
    "ts_croston_intermittent",
    doc="Croston's method for intermittent demand, alpha = 0.5: demand "
    "days for one slow-moving part brand (Brand#13 returns-flagged "
    "lineitems) form an occurrence sequence; the size estimate z and "
    "the inter-arrival estimate p are EWMAs over the LAST 16 "
    "occurrences with exact 2^-j weights (the ts_ewma_hourly "
    "discipline -- libm-pow-free), and the demand-rate forecast is "
    "z/p. Quantities are exact integers and the dyadic weights make "
    "both weighted sums engine-exact before the one final division; "
    "outputs rounded at 4. The occurrence grain is calendar-bounded.",
    oracle="""
WITH d AS (
  SELECT CAST(l.l_shipdate AS DATE) AS day,
         CAST(SUM(l.l_quantity) AS BIGINT) AS q
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_brand = 'Brand#13' AND l.l_returnflag = 'R'
  GROUP BY 1
),
seq AS (
  SELECT day, q, ROW_NUMBER() OVER (ORDER BY day) AS i,
         date_diff('day', LAG(day) OVER (ORDER BY day), day) AS gap
  FROM d
),
tail16 AS (
  SELECT * FROM seq
  WHERE i > (SELECT MAX(i) FROM seq) - 16 AND gap IS NOT NULL
),
w AS (
  SELECT q, gap, pow(2.0, -((SELECT MAX(i) FROM tail16) - i)) AS wt FROM tail16
),
est AS (
  SELECT SUM(q * wt) / SUM(wt) AS z, SUM(gap * wt) / SUM(wt) AS p,
         count(*)::BIGINT AS n_occ
  FROM w
)
SELECT n_occ, ROUND(z, 4) AS size_est, ROUND(p, 4) AS interval_est,
       ROUND(z / p, 4) AS demand_rate
FROM est
""",
)
def ts_croston_intermittent(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    li, part = t["lineitem"], t["part"]
    d = (
        li.join(F.broadcast(part.filter(F.col("p_brand") == "Brand#13")), li["l_partkey"] == part["p_partkey"])
        .filter(F.col("l_returnflag") == "R")
        .groupBy(F.col("l_shipdate").cast("date").alias("day"))
        .agg(F.sum("l_quantity").cast("long").alias("q"))
    )
    seq = d.select(
        "day",
        "q",
        F.row_number().over(W.orderBy("day")).alias("i"),
        F.datediff(F.col("day"), F.lag("day").over(W.orderBy("day"))).alias("gap"),
    )
    mx = seq.agg(F.max("i").alias("mi"))
    tail16 = (
        seq.crossJoin(F.broadcast(mx))
        .filter((F.col("i") > F.col("mi") - 16) & F.col("gap").isNotNull())
    )
    mt = tail16.agg(F.max("i").alias("mt"))
    w = tail16.crossJoin(F.broadcast(mt)).withColumn(
        "wt", F.pow(F.lit(2.0), -(F.col("mt") - F.col("i")))
    )
    est = w.agg(
        (F.sum(F.col("q") * F.col("wt")) / F.sum("wt")).alias("z"),
        (F.sum(F.col("gap") * F.col("wt")) / F.sum("wt")).alias("p"),
        F.count(F.lit(1)).alias("n_occ"),
    )
    return est.select(
        F.col("n_occ").cast("long").alias("n_occ"),
        F.round("z", R).alias("size_est"),
        F.round("p", R).alias("interval_est"),
        F.round(F.col("z") / F.col("p"), R).alias("demand_rate"),
    )


@register(
    "ts_sample_entropy",
    doc="sample entropy (m = 2, r = half the MAD-scaled spread) of the "
    "daily revenue series in integer kilodollars: B = pairs of "
    "2-long templates within Chebyshev distance r, A = same for "
    "3-long, SampEn = -ln(A/B). Template matching is a band "
    "SELF-JOIN on the calendar-bounded day-index rollup (i < j), so "
    "the pair volume is bounded by the calendar span squared, never "
    "by raw rows; the integer series plus an integer threshold make "
    "match predicates exact, A/B an integer ratio, and only the final "
    "ln is rounded.",
    oracle="""
WITH d AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(ROUND(SUM(o_totalprice) / 1000.0, 0) AS BIGINT) AS v
  FROM orders GROUP BY 1
),
s AS (SELECT v, ROW_NUMBER() OVER (ORDER BY day) AS i FROM d),
t AS (
  SELECT a.i, a.v AS v0, b.v AS v1, c.v AS v2
  FROM s a JOIN s b ON b.i = a.i + 1 JOIN s c ON c.i = a.i + 2
),
r AS (
  SELECT CAST(ROUND(0.2 * (MAX(v) - MIN(v)) / 4.0, 0) AS BIGINT) AS thr FROM s
),
pairs AS (
  SELECT (ABS(x.v0 - y.v0) <= r.thr AND ABS(x.v1 - y.v1) <= r.thr) AS m2,
         (ABS(x.v0 - y.v0) <= r.thr AND ABS(x.v1 - y.v1) <= r.thr
          AND ABS(x.v2 - y.v2) <= r.thr) AS m3
  FROM t x JOIN t y ON y.i > x.i CROSS JOIN r
),
agg AS (
  SELECT SUM(CASE WHEN m2 THEN 1 ELSE 0 END)::BIGINT AS b,
         SUM(CASE WHEN m3 THEN 1 ELSE 0 END)::BIGINT AS a
  FROM pairs
)
SELECT a, b, (SELECT thr FROM r) AS threshold,
       ROUND(-ln(a * 1.0 / b), 4) AS sampen
FROM agg
""",
)
def ts_sample_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    d = orders.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.round(F.sum("o_totalprice") / 1000.0, 0).cast("long").alias("v")
    )
    s = d.select("v", F.row_number().over(W.orderBy("day")).alias("i"))
    b1 = s.select(F.col("i").alias("i1"), F.col("v").alias("v1"))
    b2 = s.select(F.col("i").alias("i2"), F.col("v").alias("v2"))
    t = (
        s.join(b1, F.col("i1") == F.col("i") + 1)
        .join(b2, F.col("i2") == F.col("i") + 2)
        .select("i", F.col("v").alias("v0"), "v1", "v2")
    )
    r = s.agg(
        F.round(0.2 * (F.max("v") - F.min("v")) / 4.0, 0).cast("long").alias("thr")
    )
    x = t.select(F.col("i").alias("xi"), F.col("v0").alias("x0"), F.col("v1").alias("x1"), F.col("v2").alias("x2"))
    y = t.select(F.col("i").alias("yi"), F.col("v0").alias("y0"), F.col("v1").alias("y1"), F.col("v2").alias("y2"))
    pairs = (
        x.join(y, F.col("yi") > F.col("xi"))
        .crossJoin(F.broadcast(r))
        .select(
            (
                (F.abs(F.col("x0") - F.col("y0")) <= F.col("thr"))
                & (F.abs(F.col("x1") - F.col("y1")) <= F.col("thr"))
            ).alias("m2"),
            (
                (F.abs(F.col("x0") - F.col("y0")) <= F.col("thr"))
                & (F.abs(F.col("x1") - F.col("y1")) <= F.col("thr"))
                & (F.abs(F.col("x2") - F.col("y2")) <= F.col("thr"))
            ).alias("m3"),
        )
    )
    agg = pairs.agg(
        F.sum(F.when(F.col("m2"), 1).otherwise(0)).alias("b"),
        F.sum(F.when(F.col("m3"), 1).otherwise(0)).alias("a"),
    )
    return agg.crossJoin(F.broadcast(r)).select(
        F.col("a").cast("long").alias("a"),
        F.col("b").cast("long").alias("b"),
        F.col("thr").alias("threshold"),
        F.round(-F.log(F.col("a") * 1.0 / F.col("b")), R).alias("sampen"),
    )


@register(
    "stats_theil_u2_forecast",
    doc="Theil's U2 for the seasonal-naive forecaster (f_t = y_{t-7}) "
    "against the no-change benchmark (y_{t-1}) on the integer-"
    "kilodollar daily revenue series: "
    "U2 = sqrt(SUM ((f_t - y_t)/y_{t-1})^2 / SUM ((y_t - y_{t-1})/"
    "y_{t-1})^2). U2 < 1 means weekly seasonality beats persistence. "
    "Integer lags, double ratios; the two sums reassociate so U2 and "
    "its components are rounded at 4. Windows run on the calendar-"
    "bounded day rollup.",
    oracle="""
WITH d AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(ROUND(SUM(o_totalprice) / 1000.0, 0) AS BIGINT) AS v
  FROM orders GROUP BY 1
),
l AS (
  SELECT day, v,
         LAG(v, 1) OVER (ORDER BY day) AS y1,
         LAG(v, 7) OVER (ORDER BY day) AS y7
  FROM d
),
t AS (
  SELECT ((y7 - v) * 1.0 / y1) AS fe, ((v - y1) * 1.0 / y1) AS ne
  FROM l WHERE y7 IS NOT NULL AND y1 IS NOT NULL AND y1 <> 0
),
agg AS (
  SELECT count(*)::BIGINT AS n, SUM(fe * fe) AS sf, SUM(ne * ne) AS sn FROM t
)
SELECT n, ROUND(sqrt(sf / n), 4) AS rmse_rel_forecast,
       ROUND(sqrt(sn / n), 4) AS rmse_rel_naive,
       ROUND(sqrt(sf / sn), 4) AS theil_u2
FROM agg
""",
)
def stats_theil_u2_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    d = orders.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.round(F.sum("o_totalprice") / 1000.0, 0).cast("long").alias("v")
    )
    seq = W.orderBy("day")
    l = d.select(
        "v",
        F.lag("v", 1).over(seq).alias("y1"),
        F.lag("v", 7).over(seq).alias("y7"),
    )
    t = l.filter(
        F.col("y7").isNotNull() & F.col("y1").isNotNull() & (F.col("y1") != 0)
    ).select(
        ((F.col("y7") - F.col("v")) * 1.0 / F.col("y1")).alias("fe"),
        ((F.col("v") - F.col("y1")) * 1.0 / F.col("y1")).alias("ne"),
    )
    agg = t.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("fe") * F.col("fe")).alias("sf"),
        F.sum(F.col("ne") * F.col("ne")).alias("sn"),
    )
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.round(F.sqrt(F.col("sf") / F.col("n")), R).alias("rmse_rel_forecast"),
        F.round(F.sqrt(F.col("sn") / F.col("n")), R).alias("rmse_rel_naive"),
        F.round(F.sqrt(F.col("sf") / F.col("sn")), R).alias("theil_u2"),
    )


@register(
    "stats_page_hinkley",
    doc="Page-Hinkley drift detector on the integer-kilodollar daily "
    "revenue series: U_t = cumulative (v_i - mean), excursion "
    "PH_t = U_t - min_{s<=t} U_s, alarm when PH_t > lambda = 3 sigma "
    "(population sigma of the day series). The cumsum and running "
    "min run sequentially over the calendar-bounded day rollup on "
    "both engines, so U_t is an identical double; sigma's centered "
    "square sum reassociates, hence the rounded outputs. Summary row "
    "(not per-day) so an alarm-free series still produces one "
    "comparable row.",
    oracle="""
WITH d AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(ROUND(SUM(o_totalprice) / 1000.0, 0) AS BIGINT) AS v
  FROM orders GROUP BY 1
),
m AS (SELECT AVG(v * 1.0) AS mu, count(*)::BIGINT AS n FROM d),
sig AS (SELECT sqrt(SUM((d.v - m.mu) * (d.v - m.mu)) / m.n) AS sigma FROM d, m GROUP BY m.n),
u AS (
  SELECT day,
         SUM(v - m.mu) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS ut
  FROM d, m
),
ph AS (
  SELECT day, ut - MIN(ut) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS exc
  FROM u
),
agg AS (
  SELECT count(*)::BIGINT AS n_days, MAX(exc) AS max_exc,
         SUM(CASE WHEN exc > 3 * sig.sigma THEN 1 ELSE 0 END)::BIGINT AS n_alarms,
         MIN(CASE WHEN exc > 3 * sig.sigma THEN day END) AS first_alarm_day
  FROM ph, sig GROUP BY sig.sigma
)
SELECT agg.n_days, ROUND(agg.max_exc, 4) AS max_excursion,
       ROUND(3 * sig.sigma, 4) AS lambda_threshold,
       agg.n_alarms, agg.first_alarm_day
FROM agg, sig
""",
)
def stats_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    d = orders.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.round(F.sum("o_totalprice") / 1000.0, 0).cast("long").alias("v")
    )
    m = d.agg(F.avg(F.col("v") * 1.0).alias("mu"), F.count(F.lit(1)).alias("n"))
    sig = (
        d.crossJoin(F.broadcast(m))
        .groupBy("n")
        .agg(
            F.sqrt(F.sum((F.col("v") - F.col("mu")) * (F.col("v") - F.col("mu"))) / F.col("n")).alias(
                "sigma"
            )
        )
        .drop("n")
    )
    seq = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    u = d.crossJoin(F.broadcast(m)).select(
        "day", F.sum(F.col("v") - F.col("mu")).over(seq).alias("ut")
    )
    ph = u.select("day", (F.col("ut") - F.min("ut").over(seq)).alias("exc"))
    agg = ph.crossJoin(F.broadcast(sig)).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.max("exc").alias("max_exc"),
        F.sum(F.when(F.col("exc") > 3 * F.col("sigma"), 1).otherwise(0)).alias("n_alarms"),
        F.min(F.when(F.col("exc") > 3 * F.col("sigma"), F.col("day"))).alias("first_alarm_day"),
    )
    return agg.crossJoin(F.broadcast(sig)).select(
        F.col("n_days").cast("long").alias("n_days"),
        F.round("max_exc", 4).alias("max_excursion"),
        F.round(3 * F.col("sigma"), 4).alias("lambda_threshold"),
        F.col("n_alarms").cast("long").alias("n_alarms"),
        "first_alarm_day",
    )


@register(
    "ts_derivative_profile",
    doc="discrete derivative profile of the integer-kilodollar daily "
    "revenue series: central-difference velocity "
    "(v_{t+1} - v_{t-1})/2, second difference acceleration "
    "v_{t+1} - 2 v_t + v_{t-1} (both exact: integer numerators, "
    "dyadic 1/2), plus the summary row counts of inflection points "
    "(acceleration sign changes) and direction reversals (velocity "
    "sign changes). Windows run on the calendar-bounded day grid; "
    "everything is emitted unrounded.",
    oracle="""
WITH d AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(ROUND(SUM(o_totalprice) / 1000.0, 0) AS BIGINT) AS v
  FROM orders GROUP BY 1
),
s AS (
  SELECT day, v,
         LAG(v) OVER (ORDER BY day) AS pv,
         LEAD(v) OVER (ORDER BY day) AS nv
  FROM d
),
dv AS (
  SELECT day, (nv - pv) / 2.0 AS vel, nv - 2 * v + pv AS acc
  FROM s WHERE pv IS NOT NULL AND nv IS NOT NULL
),
sgn AS (
  SELECT day, vel, acc,
         CASE WHEN vel > 0 THEN 1 WHEN vel < 0 THEN -1 ELSE 0 END AS sv,
         CASE WHEN acc > 0 THEN 1 WHEN acc < 0 THEN -1 ELSE 0 END AS sa,
         LAG(CASE WHEN vel > 0 THEN 1 WHEN vel < 0 THEN -1 ELSE 0 END) OVER (ORDER BY day) AS psv,
         LAG(CASE WHEN acc > 0 THEN 1 WHEN acc < 0 THEN -1 ELSE 0 END) OVER (ORDER BY day) AS psa
  FROM dv
)
SELECT count(*)::BIGINT AS n_days,
       SUM(CASE WHEN psv IS NOT NULL AND sv * psv = -1 THEN 1 ELSE 0 END)::BIGINT AS direction_reversals,
       SUM(CASE WHEN psa IS NOT NULL AND sa * psa = -1 THEN 1 ELSE 0 END)::BIGINT AS inflections,
       MAX(ABS(vel)) AS max_abs_velocity,
       MAX(ABS(acc))::BIGINT AS max_abs_acceleration
FROM sgn
""",
)
def ts_derivative_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    d = orders.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.round(F.sum("o_totalprice") / 1000.0, 0).cast("long").alias("v")
    )
    seq = W.orderBy("day")
    s = d.select(
        "day", "v", F.lag("v").over(seq).alias("pv"), F.lead("v").over(seq).alias("nv")
    )
    dv = s.filter(F.col("pv").isNotNull() & F.col("nv").isNotNull()).select(
        "day",
        ((F.col("nv") - F.col("pv")) / 2.0).alias("vel"),
        (F.col("nv") - 2 * F.col("v") + F.col("pv")).alias("acc"),
    )
    sv = F.when(F.col("vel") > 0, 1).when(F.col("vel") < 0, -1).otherwise(0)
    sa = F.when(F.col("acc") > 0, 1).when(F.col("acc") < 0, -1).otherwise(0)
    sgn = dv.select(
        "day",
        "vel",
        "acc",
        sv.alias("sv"),
        sa.alias("sa"),
        F.lag(sv).over(seq).alias("psv"),
        F.lag(sa).over(seq).alias("psa"),
    )
    return sgn.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(
            F.when(F.col("psv").isNotNull() & (F.col("sv") * F.col("psv") == -1), 1).otherwise(0)
        ).cast("long").alias("direction_reversals"),
        F.sum(
            F.when(F.col("psa").isNotNull() & (F.col("sa") * F.col("psa") == -1), 1).otherwise(0)
        ).cast("long").alias("inflections"),
        F.max(F.abs(F.col("vel"))).alias("max_abs_velocity"),
        F.max(F.abs(F.col("acc"))).cast("long").alias("max_abs_acceleration"),
    )
