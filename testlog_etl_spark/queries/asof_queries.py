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
SELECT c.event_id, c.user_id, c.ts, p.ts AS ts_asof, p.pval AS pval_asof
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
    return out.select("event_id", "user_id", "ts", "ts_asof", "pval_asof").orderBy("event_id")
