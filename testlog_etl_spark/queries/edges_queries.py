"""Oracle-paired dense-cube `edges` queries (SURVEY SS2.5 D1-D9).

The oracles rebuild the dense frame in SQL (domain CTE LEFT JOIN groups,
UNION ALL null part) -- i.e. they re-state the cube CONTRACT, while the
engine builds it with one hash-agg shuffle + broadcast densify
(operators/edges.py docstring has the scale argument).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from testlog_etl_spark.query import run_jx
from testlog_etl_spark.suite import register
from testlog_etl_spark.tables import load_tables

R = 4


@register(
    "edges_set_dense",
    doc="D2 explicit set domain + D7 null part + D8 zero-fill: event_type "
    "cube where 'error' rows fall in the null part and absent parts show "
    "count 0.",
    oracle=f"""
WITH dom(event_type) AS (VALUES ('click'), ('view'), ('purchase'), ('signup')),
g AS (
  SELECT event_type, count(*) AS n, ROUND(SUM(value), {R}) AS sum_value
  FROM events GROUP BY event_type
)
SELECT d.event_type, coalesce(g.n, 0) AS n, g.sum_value
FROM dom d LEFT JOIN g USING (event_type)
UNION ALL
SELECT NULL AS event_type,
       (SELECT count(*) FROM events WHERE event_type NOT IN ('click','view','purchase','signup')) AS n,
       (SELECT ROUND(SUM(value), {R}) FROM events
         WHERE event_type NOT IN ('click','view','purchase','signup')) AS sum_value
ORDER BY event_type NULLS LAST
""",
    bench=True,
)
def edges_set_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    tables = load_tables(spark, sf_dir, ("events",))
    out = run_jx(
        spark,
        {
            "from": "events",
            "edges": [
                {
                    "name": "event_type",
                    "value": "event_type",
                    "domain": {"type": "set", "partitions": ["click", "view", "purchase", "signup"]},
                }
            ],
            "select": [
                {"name": "n", "value": ".", "aggregate": "count"},
                {"name": "sum_value", "value": "value", "aggregate": "sum"},
            ],
        },
        tables,
    )
    return out.withColumn("sum_value", F.round("sum_value", R))


@register(
    "edges_time_dense",
    doc="D3 TimeDomain: dense daily buckets over [2024-01-01, 2024-01-08); "
    "out-of-range rows collect in the null part; empty days exist with "
    "count 0.",
    oracle=f"""
WITH dom AS (
  SELECT unnest(range(TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-08', INTERVAL 1 DAY)) AS day
),
g AS (
  SELECT date_trunc('day', ts) AS day, count(*) AS n, ROUND(AVG(value), {R}) AS avg_value
  FROM events
  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
  GROUP BY 1
)
SELECT CAST(d.day AS DATE) AS day, coalesce(g.n, 0) AS n, g.avg_value
FROM dom d LEFT JOIN g USING (day)
UNION ALL
SELECT CAST(NULL AS DATE) AS day, count(*) AS n, ROUND(AVG(value), {R}) AS avg_value
FROM events WHERE ts < TIMESTAMP '2024-01-01' OR ts >= TIMESTAMP '2024-01-08'
ORDER BY day NULLS LAST
""",
)
def edges_time_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    tables = load_tables(spark, sf_dir, ("events",))
    out = run_jx(
        spark,
        {
            "from": "events",
            "edges": [
                {
                    "name": "day",
                    "value": "ts",
                    "domain": {"type": "time", "min": "2024-01-01", "max": "2024-01-08", "interval": "day"},
                }
            ],
            "select": [
                {"name": "n", "value": ".", "aggregate": "count"},
                {"name": "avg_value", "value": "value", "aggregate": "average"},
            ],
        },
        tables,
    )
    # day as DATE -- TZ-proof output (edge buckets are midnight starts)
    return out.withColumn("avg_value", F.round("avg_value", R)).withColumn("day", F.col("day").cast("date"))


@register(
    "edges_month_calendar",
    doc="D3 with calendar-month interval (E24/D3 hard spot: add_months, "
    "not fixed seconds): order volume per month of 1995H1.",
    oracle=f"""
WITH dom AS (
  SELECT unnest(range(TIMESTAMP '1995-01-01', TIMESTAMP '1995-07-01', INTERVAL 1 MONTH)) AS month
),
g AS (
  SELECT date_trunc('month', o_orderdate) AS month, count(*) AS n,
         ROUND(SUM(o_totalprice), {R}) AS total
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1995-07-01'
  GROUP BY 1
)
SELECT CAST(d.month AS DATE) AS month, coalesce(g.n, 0) AS n, g.total
FROM dom d LEFT JOIN g USING (month)
UNION ALL
SELECT CAST(NULL AS DATE) AS month, count(*) AS n, ROUND(SUM(o_totalprice), {R}) AS total
FROM orders WHERE o_orderdate < TIMESTAMP '1995-01-01' OR o_orderdate >= TIMESTAMP '1995-07-01'
ORDER BY month NULLS LAST
""",
)
def edges_month_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    tables = load_tables(spark, sf_dir, ("orders",))
    out = run_jx(
        spark,
        {
            "from": "orders",
            "edges": [
                {
                    "name": "month",
                    "value": "o_orderdate",
                    "domain": {"type": "time", "min": "1995-01-01", "max": "1995-07-01", "interval": "month"},
                }
            ],
            "select": [
                {"name": "n", "value": ".", "aggregate": "count"},
                {"name": "total", "value": "o_totalprice", "aggregate": "sum"},
            ],
        },
        tables,
    )
    # month as DATE -- TZ-proof output (calendar bucket starts)
    return out.withColumn("total", F.round("total", R)).withColumn("month", F.col("month").cast("date"))


@register(
    "edges_range_fanout",
    doc="D6 range-edge fan-out: each event spans [value, value+30) and "
    "lands in every overlapped bucket of 20 across [0, 200). The oracle's "
    "domain-x-overlap LEFT JOIN is the semantic spec; the engine does "
    "explode(sequence(...)) -> ONE aggregate, no O(rows x domain) join.",
    oracle="""
WITH dom AS (SELECT unnest(range(0, 200, 20)) AS bucket)
SELECT CAST(d.bucket AS DOUBLE) AS bucket, count(e.event_id) AS n
FROM dom d
LEFT JOIN events e
  ON d.bucket < e.value + 30 AND d.bucket + 20 > e.value
GROUP BY d.bucket
ORDER BY bucket
""",
)
def edges_range_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    tables = load_tables(spark, sf_dir, ("events",))
    return run_jx(
        spark,
        {
            "from": "events",
            "edges": [
                {
                    "name": "bucket",
                    "value": {"range": {"min": "value", "max": {"add": ["value", {"literal": 30}]}}},
                    "domain": {"type": "range", "min": 0, "max": 200, "interval": 20},
                    "allowNulls": False,
                }
            ],
            "select": [{"name": "n", "value": ".", "aggregate": "count"}],
        },
        tables,
    )


@register(
    "edges_default_limit",
    doc="D1/D9 default domain discovered from data with a part limit; "
    "excluded parts are dropped, the null part stays (empty here).",
    oracle="""
WITH dom AS (SELECT DISTINCT lang FROM documents ORDER BY lang LIMIT 5),
g AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang)
SELECT d.lang, coalesce(g.n, 0) AS n FROM dom d LEFT JOIN g USING (lang)
UNION ALL
SELECT NULL AS lang, 0 AS n
ORDER BY lang NULLS LAST
""",
)
def edges_default_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    tables = load_tables(spark, sf_dir, ("documents",))
    return run_jx(
        spark,
        {
            "from": "documents",
            "edges": [{"name": "lang", "value": "lang", "limit": 5}],
            "select": [{"name": "n", "value": ".", "aggregate": "count"}],
        },
        tables,
    )


@register(
    "edges_default_other",
    doc="D9 OTHER overflow part: default domain capped at 3 parts, "
    "over-limit parts COLLAPSE into a synthetic OTHER row instead of "
    "dropping (SURVEY SS2.5 D9). The avg aggregate proves OTHER is a "
    "real group in the ONE fact aggregate -- non-decomposable "
    "aggregates stay exact, which a post-hoc re-aggregation of kept "
    "parts could not deliver.",
    oracle=f"""
WITH dom AS (
  SELECT DISTINCT lang FROM documents WHERE lang IS NOT NULL ORDER BY lang LIMIT 3
),
b AS (
  SELECT CASE WHEN lang IS NULL THEN NULL
              WHEN lang IN (SELECT lang FROM dom) THEN lang
              ELSE 'OTHER' END AS lang,
         n_chars
  FROM documents
),
g AS (
  SELECT lang, count(*) AS n, ROUND(AVG(n_chars), {R}) AS avg_chars
  FROM b GROUP BY lang
),
full_dom AS (
  SELECT lang FROM dom
  UNION ALL SELECT 'OTHER'
  UNION ALL SELECT NULL
)
SELECT d.lang AS lang, coalesce(g.n, 0) AS n, g.avg_chars
FROM full_dom d LEFT JOIN g ON d.lang IS NOT DISTINCT FROM g.lang
ORDER BY d.lang NULLS LAST
""",
)
def edges_default_other(spark: SparkSession, sf_dir: str) -> DataFrame:
    tables = load_tables(spark, sf_dir, ("documents",))
    out = run_jx(
        spark,
        {
            "from": "documents",
            "edges": [{"name": "lang", "value": "lang", "limit": 3, "others": True}],
            "select": [
                {"name": "n", "value": ".", "aggregate": "count"},
                {"name": "avg_chars", "value": "n_chars", "aggregate": "average"},
            ],
        },
        tables,
    )
    return out.withColumn("avg_chars", F.round("avg_chars", R))


@register(
    "edges_two_dims",
    doc="two-edge dense cube: |domain1| x |domain2| cells incl. zero cells "
    "-- the reference's signature datacube shape.",
    oracle=f"""
WITH dom1(l_returnflag) AS (VALUES ('A'), ('N'), ('R')),
dom2(l_linestatus) AS (VALUES ('F'), ('O')),
g AS (
  SELECT l_returnflag, l_linestatus, count(*) AS n, ROUND(SUM(l_quantity), {R}) AS sum_qty
  FROM lineitem GROUP BY 1, 2
)
SELECT d1.l_returnflag, d2.l_linestatus, coalesce(g.n, 0) AS n, g.sum_qty
FROM dom1 d1 CROSS JOIN dom2 d2
LEFT JOIN g ON g.l_returnflag = d1.l_returnflag AND g.l_linestatus = d2.l_linestatus
ORDER BY d1.l_returnflag, d2.l_linestatus
""",
)
def edges_two_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    tables = load_tables(spark, sf_dir, ("lineitem",))
    out = run_jx(
        spark,
        {
            "from": "lineitem",
            "edges": [
                {"name": "l_returnflag", "value": "l_returnflag",
                 "domain": {"type": "set", "partitions": ["A", "N", "R"]}, "allowNulls": False},
                {"name": "l_linestatus", "value": "l_linestatus",
                 "domain": {"type": "set", "partitions": ["F", "O"]}, "allowNulls": False},
            ],
            "select": [
                {"name": "n", "value": ".", "aggregate": "count"},
                {"name": "sum_qty", "value": "l_quantity", "aggregate": "sum"},
            ],
        },
        tables,
    )
    return out.withColumn("sum_qty", F.round("sum_qty", R))


@register(
    "edges_duration_histogram",
    doc="D4 DurationDomain: events.value read as a duration in seconds, "
    "dense 60s buckets over [0, 300); longer durations collect in the "
    "null part (allowNulls). Same one-shuffle hash-agg + bounded densify "
    "as every other domain -- the domain frame is 5 rows at any SF.",
    oracle=f"""
WITH dom AS (SELECT CAST(unnest(range(0, 300, 60)) AS DOUBLE) AS dur),
g AS (
  SELECT FLOOR(value / 60) * 60 AS dur, count(*) AS n,
         ROUND(SUM(value), {R}) AS sum_secs
  FROM events WHERE value >= 0 AND value < 300 GROUP BY 1
)
SELECT d.dur, coalesce(g.n, 0) AS n, g.sum_secs
FROM dom d LEFT JOIN g USING (dur)
UNION ALL
SELECT NULL AS dur, count(*) AS n, ROUND(SUM(value), {R}) AS sum_secs
FROM events WHERE value IS NULL OR value < 0 OR value >= 300
ORDER BY dur NULLS LAST
""",
)
def edges_duration_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    tables = load_tables(spark, sf_dir, ("events",))
    out = run_jx(
        spark,
        {
            "from": "events",
            "edges": [
                {
                    "name": "dur",
                    "value": "value",
                    "domain": {"type": "duration", "min": 0, "max": 300, "interval": 60},
                }
            ],
            "select": [
                {"name": "n", "value": ".", "aggregate": "count"},
                {"name": "sum_secs", "value": "value", "aggregate": "sum"},
            ],
        },
        tables,
    )
    return out.withColumn("sum_secs", F.round("sum_secs", R))


@register(
    "edges_range_direct",
    doc="D5 RangeDomain on a plain scalar (no D6 fan-out): l_quantity in "
    "dense buckets of 5 over [0, 55). Every part exists even if empty; "
    "the bucket key is a codegen'd floor expression, so the fact scan "
    "stays whole-stage and the only shuffle is the 11-group hash-agg.",
    oracle=f"""
WITH dom AS (SELECT CAST(unnest(range(0, 55, 5)) AS DOUBLE) AS qty_bucket),
g AS (
  SELECT FLOOR(l_quantity / 5) * 5 AS qty_bucket, count(*) AS n,
         ROUND(SUM(l_extendedprice), {R}) AS sum_price
  FROM lineitem WHERE l_quantity >= 0 AND l_quantity < 55 GROUP BY 1
)
SELECT d.qty_bucket, coalesce(g.n, 0) AS n, g.sum_price
FROM dom d LEFT JOIN g USING (qty_bucket)
ORDER BY qty_bucket
""",
)
def edges_range_direct(spark: SparkSession, sf_dir: str) -> DataFrame:
    tables = load_tables(spark, sf_dir, ("lineitem",))
    out = run_jx(
        spark,
        {
            "from": "lineitem",
            "edges": [
                {
                    "name": "qty_bucket",
                    "value": "l_quantity",
                    "domain": {"type": "range", "min": 0, "max": 55, "interval": 5},
                    "allowNulls": False,
                }
            ],
            "select": [
                {"name": "n", "value": ".", "aggregate": "count"},
                {"name": "sum_price", "value": "l_extendedprice", "aggregate": "sum"},
            ],
        },
        tables,
    )
    return out.withColumn("sum_price", F.round("sum_price", R))


@register(
    "edges_percentile_cells",
    doc="percentile aggregates INSIDE cube cells (A6/A7 x D2): exact "
    "median and p90 of event value per event-type part, dense over the "
    "set domain -- pins the percentile path through cube_aggregate.",
    oracle=f"""
WITH dom AS (
  SELECT unnest(['click', 'view', 'purchase', 'signup', 'error']) AS event_type
),
g AS (
  SELECT event_type, count(*) AS n,
         ROUND(median(value), {R}) AS med_value,
         ROUND(quantile_cont(value, 0.9), {R}) AS p90_value
  FROM events
  GROUP BY event_type
)
SELECT d.event_type, coalesce(g.n, 0) AS n, g.med_value, g.p90_value
FROM dom d LEFT JOIN g USING (event_type)
ORDER BY event_type
""",
)
def edges_percentile_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    tables = load_tables(spark, sf_dir, ("events",))
    out = run_jx(
        spark,
        {
            "from": "events",
            "edges": [
                {
                    "name": "event_type",
                    "value": "event_type",
                    "domain": {
                        "type": "set",
                        "partitions": ["click", "view", "purchase", "signup", "error"],
                    },
                    "allowNulls": False,
                }
            ],
            "select": [
                {"name": "n", "value": ".", "aggregate": "count"},
                {"name": "med_value", "value": "value", "aggregate": "median"},
                {"name": "p90_value", "value": "value", "aggregate": "percentile", "percentile": 0.9},
            ],
            "sort": "event_type",
        },
        tables,
    )
    return out.select(
        "event_type", "n", F.round("med_value", R).alias("med_value"), F.round("p90_value", R).alias("p90_value")
    )
