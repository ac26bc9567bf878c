"""As-of join queries -- oracle is DuckDB's native ASOF JOIN, so the
operator's semantics (inclusive backward match, left-outer, per-key) are
checked against an independent first-class implementation, not a SQL
re-statement of our own plan."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from testlog_etl_spark.operators.asof import asof_join
from testlog_etl_spark.suite import register
from testlog_etl_spark.tables import load_tables

R = 4


@register(
    "asof_last_purchase",
    doc="Merge-asof: each click event joined to the user's most recent "
    "purchase at-or-before it (DuckDB ASOF LEFT JOIN twin). One shuffle "
    "on user_id via the union+window merge in operators/asof.py -- no "
    "range-join pair explosion at any scale.",
    oracle=f"""
WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
p AS (
  SELECT user_id, ts, ROUND(MAX(value), {R}) AS pval
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
)
SELECT c.event_id, c.user_id, strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS ts,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS ts_asof, p.pval AS pval_asof
FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
ORDER BY c.event_id
""",
)
def asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.round(F.max("value"), R).alias("pval"))
    )
    out = asof_join(clicks, purchases, on=["user_id"], left_time="ts", right_time="ts")
    # formatted UTC strings -- TZ-proof output (r06 TZ sweep)
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        F.date_format("ts_asof", "yyyy-MM-dd HH:mm:ss").alias("ts_asof"),
        "pval_asof",
    ).orderBy("event_id")


@register(
    "range_join_windows",
    doc="Bucketed point-in-interval join: click values matched into "
    "[value, value+25) windows opened by purchase events, aggregated per "
    "click. The oracle states the naive inequality join; the engine runs "
    "the bucketed equi-join (operators/rangejoin.py) -- no BNLJ at any "
    "scale (plan-tested).",
    oracle="""
SELECT c.event_id, count(*) AS n_windows, ROUND(SUM(p.value), 2) AS sum_window_lo
FROM (SELECT event_id, value FROM events WHERE event_type = 'click') c
JOIN (SELECT value FROM events WHERE event_type = 'purchase') p
  ON p.value <= c.value AND c.value < p.value + 25
GROUP BY c.event_id
ORDER BY c.event_id
""",
)
def range_join_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from testlog_etl_spark.operators.rangejoin import point_in_interval_join

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "value")
    windows = (
        ev.filter(F.col("event_type") == "purchase")
        .select(F.col("value").alias("lo"), (F.col("value") + 25).alias("hi"))
    )
    # salt=32: events.value is heavy-tailed over ~[0, 560), so /25 buckets
    # collapse to ~22 keys with ~40% of rows in bucket 0 -- salting splits
    # the hot bucket's pair generation across all cores (module docstring)
    pairs = point_in_interval_join(clicks, windows, "value", "lo", "hi", bucket_width=25.0, salt=32)
    # SUM rounded at the data's own 2-decimal resolution, not AVG at 4:
    # values carry exactly 2 decimals, so their mean regularly lands
    # EXACTLY on a 4-decimal rounding boundary (sum/n = x.xxxx5) where
    # ulp-level summation-order noise flips the rounded digit per engine
    return (
        pairs.groupBy("event_id")
        .agg(F.count(F.lit(1)).alias("n_windows"), F.round(F.sum("lo"), 2).alias("sum_window_lo"))
        .orderBy("event_id")
    )


@register(
    "join_scd2_dimension",
    doc="slowly-changing-dimension (SCD Type 2) temporal join: each "
    "event picks the dimension VERSION valid at its event time "
    "(equi-join on the business key + validity-range conjunct -- "
    "Catalyst extracts the equi part, so this is a hash join with the "
    "range as a post-join filter; versions-per-key is small by SCD "
    "construction, so no pair explosion). The versioned dim is derived "
    "deterministically: every user upgrades from bronze at a "
    "per-user-offset promotion date.",
    oracle=f"""
WITH dim AS (
  SELECT user_id,
         'bronze' AS tier,
         TIMESTAMP '2023-12-01 00:00:00' AS valid_from,
         TIMESTAMP '2024-01-01 00:00:00' + INTERVAL 1 DAY * (user_id % 20) AS valid_to
  FROM (SELECT DISTINCT user_id FROM events)
  UNION ALL
  SELECT user_id,
         CASE WHEN user_id % 2 = 0 THEN 'gold' ELSE 'silver' END,
         TIMESTAMP '2024-01-01 00:00:00' + INTERVAL 1 DAY * (user_id % 20),
         TIMESTAMP '2100-01-01 00:00:00'
  FROM (SELECT DISTINCT user_id FROM events)
)
SELECT tier, count(*) AS n, ROUND(SUM(value), {R}) AS sum_value
FROM events e
JOIN dim d ON e.user_id = d.user_id
          AND e.ts >= d.valid_from AND e.ts < d.valid_to
GROUP BY tier
ORDER BY tier
""",
)
def join_scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    users = ev.select("user_id").distinct()
    promo = F.to_timestamp(F.lit("2024-01-01 00:00:00")) + (
        F.col("user_id") % 20
    ) * F.expr("INTERVAL 1 DAY")
    dim = users.select(
        "user_id",
        F.lit("bronze").alias("tier"),
        F.to_timestamp(F.lit("2023-12-01 00:00:00")).alias("valid_from"),
        promo.alias("valid_to"),
    ).unionByName(
        users.select(
            "user_id",
            F.when(F.col("user_id") % 2 == 0, "gold").otherwise("silver").alias("tier"),
            promo.alias("valid_from"),
            F.to_timestamp(F.lit("2100-01-01 00:00:00")).alias("valid_to"),
        )
    )
    d = dim.select(
        F.col("user_id").alias("d_user"), "tier", "valid_from", "valid_to"
    )
    return (
        ev.join(
            d,
            (F.col("user_id") == F.col("d_user"))
            & (F.col("ts") >= F.col("valid_from"))
            & (F.col("ts") < F.col("valid_to")),
        )
        .groupBy("tier")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), R).alias("sum_value"))
        .orderBy("tier")
    )


@register(
    "asof_tolerance_join",
    doc="as-of join with a staleness TOLERANCE (operators/asof.py's "
    "tolerance_seconds): each error event takes the user's most recent "
    "purchase at-or-before it ONLY if it happened within the last 24h "
    "-- older matches null out, the staleness guard every feature-"
    "lookup asof needs. Same one-shuffle union+window merge as "
    "asof_last_purchase; the oracle is DuckDB's ASOF LEFT JOIN with "
    "the tolerance applied as a post-join CASE (nulling both matched "
    "columns), semantically identical to nulling in the carry.",
    oracle=f"""
WITH e AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
p AS (
  SELECT user_id, ts, ROUND(MAX(value), {R}) AS pval
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
),
j AS (
  SELECT e.event_id, e.user_id, e.ts, p.ts AS pts, p.pval
  FROM e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts >= p.ts
)
SELECT event_id, user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
       CASE WHEN pts >= ts - INTERVAL 24 HOURS
            THEN strftime(pts, '%Y-%m-%d %H:%M:%S') END AS ts_asof,
       CASE WHEN pts >= ts - INTERVAL 24 HOURS THEN pval END AS pval_asof
FROM j ORDER BY event_id
""",
)
def asof_tolerance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    errors = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.round(F.max("value"), R).alias("pval"))
    )
    out = asof_join(
        errors,
        purchases,
        on=["user_id"],
        left_time="ts",
        right_time="ts",
        tolerance_seconds=24 * 3600,
    )
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        F.date_format("ts_asof", "yyyy-MM-dd HH:mm:ss").alias("ts_asof"),
        "pval_asof",
    ).orderBy("event_id")


@register(
    "asof_nearest_join",
    doc="NEAREST as-of (both directions + pick the closer, backward "
    "wins ties): each error event takes the user's purchase closest in "
    "time within +-24h -- two one-shuffle asof merges "
    "(operators/asof.py backward + forward, each tolerance-guarded) "
    "and a codegen CASE; no range-join pair explosion. DuckDB twin: "
    "two ASOF joins with the same tie rule.",
    oracle=f"""
WITH e AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
p AS (
  SELECT user_id, ts, ROUND(MAX(value), {R}) AS pval
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
),
bwd AS (
  SELECT e.event_id, p.ts AS bts, p.pval AS bval
  FROM e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts >= p.ts
),
fwd AS (
  SELECT e.event_id, p.ts AS fts, p.pval AS fval
  FROM e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts <= p.ts
),
j AS (
  SELECT e.event_id, e.user_id, e.ts,
         CASE WHEN bwd.bts < e.ts - INTERVAL 24 HOURS THEN NULL ELSE bwd.bts END AS bts,
         CASE WHEN bwd.bts < e.ts - INTERVAL 24 HOURS THEN NULL ELSE bwd.bval END AS bval,
         CASE WHEN fwd.fts > e.ts + INTERVAL 24 HOURS THEN NULL ELSE fwd.fts END AS fts,
         CASE WHEN fwd.fts > e.ts + INTERVAL 24 HOURS THEN NULL ELSE fwd.fval END AS fval
  FROM e
  LEFT JOIN bwd ON bwd.event_id = e.event_id
  LEFT JOIN fwd ON fwd.event_id = e.event_id
),
pick AS (
  SELECT event_id, user_id, ts,
         CASE
           WHEN bts IS NULL AND fts IS NULL THEN NULL
           WHEN fts IS NULL THEN 'b'
           WHEN bts IS NULL THEN 'f'
           WHEN date_diff('second', bts, ts) <= date_diff('second', ts, fts) THEN 'b'
           ELSE 'f'
         END AS side,
         bts, bval, fts, fval
  FROM j
)
SELECT event_id, user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
       CASE side WHEN 'b' THEN strftime(bts, '%Y-%m-%d %H:%M:%S')
                 WHEN 'f' THEN strftime(fts, '%Y-%m-%d %H:%M:%S') END AS ts_nearest,
       CASE side WHEN 'b' THEN bval WHEN 'f' THEN fval END AS pval_nearest,
       CASE side WHEN 'b' THEN CAST(date_diff('second', bts, ts) AS BIGINT)
                 WHEN 'f' THEN CAST(date_diff('second', ts, fts) AS BIGINT) END AS gap_seconds
FROM pick ORDER BY event_id
""",
)
def asof_nearest_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    errors = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.round(F.max("value"), R).alias("pval"))
    )
    bwd = asof_join(
        errors, purchases, on=["user_id"], left_time="ts", right_time="ts",
        direction="backward", tolerance_seconds=24 * 3600, suffix="_b",
    ).select("event_id", "user_id", "ts", F.col("ts_b").alias("bts"), F.col("pval_b").alias("bval"))
    fwd = asof_join(
        errors, purchases, on=["user_id"], left_time="ts", right_time="ts",
        direction="forward", tolerance_seconds=24 * 3600, suffix="_f",
    ).select(F.col("event_id").alias("eid2"), F.col("ts_f").alias("fts"), F.col("pval_f").alias("fval"))
    j = bwd.join(fwd, F.col("event_id") == F.col("eid2"), "left").drop("eid2")
    bgap = F.col("ts").cast("long") - F.col("bts").cast("long")
    fgap = F.col("fts").cast("long") - F.col("ts").cast("long")
    side = (
        F.when(F.col("bts").isNull() & F.col("fts").isNull(), F.lit(None))
        .when(F.col("fts").isNull(), F.lit("b"))
        .when(F.col("bts").isNull(), F.lit("f"))
        .when(bgap <= fgap, F.lit("b"))
        .otherwise(F.lit("f"))
    )
    p = j.withColumn("side", side)
    pick = lambda b, f: F.when(F.col("side") == "b", b).when(F.col("side") == "f", f)  # noqa: E731
    return p.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        pick(
            F.date_format("bts", "yyyy-MM-dd HH:mm:ss"),
            F.date_format("fts", "yyyy-MM-dd HH:mm:ss"),
        ).alias("ts_nearest"),
        pick(F.col("bval"), F.col("fval")).alias("pval_nearest"),
        pick(bgap, fgap).cast("long").alias("gap_seconds"),
    ).orderBy("event_id")
