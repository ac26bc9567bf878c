"""ML feature-preparation queries: the feature-engineering surface a
training platform runs between the corpus and the trainer — trailing
multi-horizon aggregates, leakage-safe categorical encoding, and
temporal split hygiene. All exact aggregate compositions with exact
DuckDB twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from testlog_etl_spark.suite import register
from testlog_etl_spark.tables import load_tables

R = 4


@register(
    "features_trailing_horizons",
    doc="multi-horizon trailing feature matrix: per (user, day), event "
    "counts and value sums over trailing 1/7/28-day RANGE frames. All "
    "three horizons are frames over the SAME (user ORDER BY day) "
    "ordering, so they share ONE exchange (the windows-family "
    "exchange-reuse property); days are first rolled up per user (the "
    "frame then spans at most 28 tiny rows, not raw events).",
    oracle=f"""
WITH d AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         count(*)::BIGINT AS n, SUM("value") AS v
  FROM events GROUP BY user_id, day
),
e AS (SELECT *, CAST(floor(epoch(day)) AS BIGINT) // 86400 AS dnum FROM d)
SELECT user_id, CAST(day AS DATE) AS day,
       CAST(SUM(n) OVER (w RANGE BETWEEN 0 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_1d,
       CAST(SUM(n) OVER (w RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_7d,
       CAST(SUM(n) OVER (w RANGE BETWEEN 27 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_28d,
       ROUND(SUM(v) OVER (w RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), {R}) AS v_7d,
       ROUND(SUM(v) OVER (w RANGE BETWEEN 27 PRECEDING AND CURRENT ROW), {R}) AS v_28d
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY dnum)
ORDER BY user_id, day
""",
)
def features_trailing_horizons(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    d = (
        ev.groupBy("user_id", F.date_trunc("day", "ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
        .withColumn("dnum", (F.floor(F.unix_timestamp("day")) / 86400).cast("long"))
    )
    base = Window.partitionBy("user_id").orderBy("dnum")
    w1 = base.rangeBetween(0, 0)
    w7 = base.rangeBetween(-6, 0)
    w28 = base.rangeBetween(-27, 0)
    return (
        # day as DATE -- TZ-proof output (r06 TZ sweep)
        d.select(
            "user_id",
            F.col("day").cast("date").alias("day"),
            F.sum("n").over(w1).alias("n_1d"),
            F.sum("n").over(w7).alias("n_7d"),
            F.sum("n").over(w28).alias("n_28d"),
            F.round(F.sum("v").over(w7), R).alias("v_7d"),
            F.round(F.sum("v").over(w28), R).alias("v_28d"),
        )
        .orderBy("user_id", "day")
    )


@register(
    "features_target_encoding",
    doc="leave-one-out target encoding of event_type against value: "
    "each row's encoding is the category mean EXCLUDING its own target "
    "((sum - own) / (n - 1)) -- the standard leakage guard. One tiny "
    "per-category rollup broadcast back; the encoding itself is "
    "row-local arithmetic. Reported per (type, day) re-aggregated to "
    "keep the driver compare bounded.",
    oracle=f"""
WITH cat AS (
  SELECT event_type, count(*)::DOUBLE AS n, SUM("value") AS s
  FROM events GROUP BY event_type
)
SELECT e.event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
       count(*)::BIGINT AS n_rows,
       ROUND(AVG((s - "value") / (n - 1)), {R}) AS mean_loo_enc
FROM events e JOIN cat USING (event_type)
GROUP BY e.event_type, day
ORDER BY e.event_type, day
""",
)
def features_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    cat = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"), F.sum("value").alias("s")
    )
    return (
        ev.join(F.broadcast(cat), "event_type")
        .withColumn("_loo", (F.col("s") - F.col("value")) / (F.col("n") - 1))
        # day as DATE -- TZ-proof output (r06 TZ sweep)
        .groupBy("event_type", F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.avg("_loo"), R).alias("mean_loo_enc"),
        )
        .orderBy("event_type", "day")
    )


@register(
    "features_temporal_split",
    doc="temporal train/validation split hygiene report: rows before "
    "the cutoff train, after validate; the report counts per-split "
    "rows, value mass, and the GROUP LEAKAGE surface -- users appearing "
    "on both sides (fine for forecasting, fatal for user-level "
    "generalization claims; the report makes the choice explicit). "
    "Pure filters + one distinct-user rollup per side.",
    oracle=f"""
WITH tr AS (SELECT * FROM events WHERE ts < TIMESTAMP '2024-01-24 00:00:00'),
va AS (SELECT * FROM events WHERE ts >= TIMESTAMP '2024-01-24 00:00:00'),
leak AS (
  SELECT count(*)::BIGINT AS n_leaking FROM (
    SELECT user_id FROM tr INTERSECT SELECT user_id FROM va
  )
)
SELECT (SELECT count(*) FROM tr) AS n_train,
       (SELECT count(*) FROM va) AS n_val,
       (SELECT count(DISTINCT user_id) FROM tr) AS users_train,
       (SELECT count(DISTINCT user_id) FROM va) AS users_val,
       (SELECT n_leaking FROM leak) AS users_leaking,
       ROUND((SELECT SUM("value") FROM va) / (SELECT SUM("value") FROM events), {R}) AS val_value_share
""",
)
def features_temporal_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    cutoff = F.lit("2024-01-24 00:00:00").cast("timestamp")
    tr = ev.filter(F.col("ts") < cutoff)
    va = ev.filter(F.col("ts") >= cutoff)
    leak = tr.select("user_id").intersect(va.select("user_id")).agg(
        F.count(F.lit(1)).alias("users_leaking")
    )
    stats = ev.agg(
        F.sum(F.when(F.col("ts") < cutoff, 1).otherwise(0)).alias("n_train"),
        F.sum(F.when(F.col("ts") >= cutoff, 1).otherwise(0)).alias("n_val"),
        F.count_distinct(F.when(F.col("ts") < cutoff, F.col("user_id"))).alias("users_train"),
        F.count_distinct(F.when(F.col("ts") >= cutoff, F.col("user_id"))).alias("users_val"),
        F.round(
            F.sum(F.when(F.col("ts") >= cutoff, F.col("value"))) / F.sum("value"), R
        ).alias("val_value_share"),
    )
    return stats.crossJoin(F.broadcast(leak)).select(
        "n_train", "n_val", "users_train", "users_val", "users_leaking", "val_value_share"
    )


@register(
    "features_woe_encoding",
    doc="weight-of-evidence bucket encoding + information value, the "
    "credit-scoring sibling of features_target_encoding: order-value "
    "buckets scored by ln(good_share/bad_share) against the "
    "orderstatus='F' target, 0.5-smoothed so empty cells stay finite. "
    "One bucket rollup; marginals ride a broadcast 1-row aggregate; "
    "the IV column is the per-bucket contribution a feature-selection "
    "gate sums.",
    oracle="""
WITH b AS (
  SELECT LEAST(CAST(floor(o_totalprice / 50000) AS BIGINT), 5) AS bucket,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS bad
  FROM orders
),
c AS (
  SELECT bucket,
         SUM(1 - bad)::DOUBLE AS n_good, SUM(bad)::DOUBLE AS n_bad
  FROM b GROUP BY bucket
),
t AS (SELECT SUM(n_good) AS tg, SUM(n_bad) AS tb FROM c)
SELECT c.bucket,
       CAST(c.n_good AS BIGINT) AS n_good,
       CAST(c.n_bad AS BIGINT) AS n_bad,
       ROUND(ln(((c.n_good + 0.5) / t.tg) / ((c.n_bad + 0.5) / t.tb)), 4) AS woe,
       ROUND(((c.n_good + 0.5) / t.tg - (c.n_bad + 0.5) / t.tb)
             * ln(((c.n_good + 0.5) / t.tg) / ((c.n_bad + 0.5) / t.tb)), 6) AS iv_term
FROM c CROSS JOIN t
ORDER BY c.bucket
""",
)
def features_woe_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    b = orders.select(
        F.least(F.floor(F.col("o_totalprice") / 50000).cast("long"), F.lit(5)).alias("bucket"),
        (F.col("o_orderstatus") == "F").cast("int").alias("bad"),
    )
    c = b.groupBy("bucket").agg(
        F.sum(1 - F.col("bad")).cast("double").alias("n_good"),
        F.sum("bad").cast("double").alias("n_bad"),
    )
    t = c.agg(F.sum("n_good").alias("tg"), F.sum("n_bad").alias("tb"))
    gs = (F.col("n_good") + 0.5) / F.col("tg")
    bs = (F.col("n_bad") + 0.5) / F.col("tb")
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "bucket",
            F.col("n_good").cast("long").alias("n_good"),
            F.col("n_bad").cast("long").alias("n_bad"),
            F.round(F.log(gs / bs), 4).alias("woe"),
            F.round((gs - bs) * F.log(gs / bs), 6).alias("iv_term"),
        )
        .orderBy("bucket")
    )
