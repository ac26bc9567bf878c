"""Set operations, grouping sets, and skew-resistant aggregation
(SURVEY SS2.7 O4-O6, SS2.4 A16, scale tooling).

The reference has no intersect/except/rollup; these are the noted
Spark-superset pieces a user migrating real workloads expects, each with
a full oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from testlog_etl_spark.suite import register
from testlog_etl_spark.tables import load_tables

R = 4


@register(
    "setop_rollup",
    doc="A16 grouping sets: returnflag x linestatus ROLLUP with subtotal "
    "and grand-total rows (NULL indicators match across engines).",
    oracle=f"""
SELECT l_returnflag, l_linestatus, count(*) AS n, ROUND(SUM(l_quantity), {R}) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS LAST, l_linestatus NULLS LAST
""",
)
def setop_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), R).alias("sum_qty"))
        .orderBy(F.col("l_returnflag").asc_nulls_last(), F.col("l_linestatus").asc_nulls_last())
    )


@register(
    "setop_intersect_except",
    doc="O6 intersect/except: customers ordering in both 1995H1 and "
    "1995H2 vs only-H1, labeled and unioned.",
    oracle="""
WITH h1 AS (SELECT DISTINCT o_custkey FROM orders
            WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1995-07-01'),
h2 AS (SELECT DISTINCT o_custkey FROM orders
            WHERE o_orderdate >= TIMESTAMP '1995-07-01' AND o_orderdate < TIMESTAMP '1996-01-01')
SELECT 'both' AS segment, o_custkey FROM (SELECT o_custkey FROM h1 INTERSECT SELECT o_custkey FROM h2)
UNION ALL
SELECT 'h1_only' AS segment, o_custkey FROM (SELECT o_custkey FROM h1 EXCEPT SELECT o_custkey FROM h2)
ORDER BY segment, o_custkey
""",
)
def setop_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    d = F.col("o_orderdate")
    h1 = o.filter((d >= "1995-01-01") & (d < "1995-07-01")).select("o_custkey").distinct()
    h2 = o.filter((d >= "1995-07-01") & (d < "1996-01-01")).select("o_custkey").distinct()
    both = h1.intersect(h2).select(F.lit("both").alias("segment"), "o_custkey")
    only1 = h1.exceptAll(h2).select(F.lit("h1_only").alias("segment"), "o_custkey")
    return both.unionByName(only1).orderBy("segment", "o_custkey")


@register(
    "agg_salted_skew",
    doc="explicit two-phase salted aggregation over a 4-value hot key "
    "(operators/skew.py): same result as the plain GROUP BY oracle, but "
    "no single reducer owns a whole hot key.",
    oracle=f"""
SELECT event_type,
  count(value) AS n,
  ROUND(SUM(value), {R}) AS sum_value,
  ROUND(MIN(value), {R}) AS min_value,
  ROUND(MAX(value), {R}) AS max_value,
  ROUND(SUM(value) / count(value), {R}) AS avg_value
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    from testlog_etl_spark.operators.skew import salted_agg

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    out = salted_agg(ev, ["event_type"], "value", n_salt=16, salt_on="event_id")
    return out.select(
        "event_type",
        "n",
        F.round("sum_value", R).alias("sum_value"),
        F.round("min_value", R).alias("min_value"),
        F.round("max_value", R).alias("max_value"),
        F.round("avg_value", R).alias("avg_value"),
    ).orderBy("event_type")


from testlog_etl_spark.etl import fixtures

_LCOV = fixtures.fixture_path("lcov.jsonl")


@register(
    "etl_coverage_lcov",
    doc="T6: lcov-ish coverage artifact -> per-file covered/uncovered "
    "line docs. Both engines read tests/data/lcov.jsonl; line lists are "
    "sorted+joined to strings for the cross-engine hash; absolute values "
    "also pinned in tests/test_etl.py.",
    oracle=f"""
WITH lines AS (
  SELECT * FROM read_json('{_LCOV}', format='newline_delimited',
    columns={{log_key:'VARCHAR', line_no:'BIGINT', "value":'VARCHAR'}})
), tagged AS (
  SELECT log_key,
    last_value(CASE WHEN starts_with("value", 'SF:') THEN substr("value", 4) END IGNORE NULLS)
      OVER (PARTITION BY log_key ORDER BY line_no
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS source_file,
    "value"
  FROM lines
), da AS (
  SELECT log_key, source_file,
    CAST(split_part(substr("value", 4), ',', 1) AS INTEGER) AS line,
    CAST(split_part(substr("value", 4), ',', 2) AS BIGINT) AS hits
  FROM tagged
  WHERE starts_with("value", 'DA:')
)
SELECT log_key, source_file,
  COALESCE(string_agg(CAST(line AS VARCHAR), ',' ORDER BY line) FILTER (WHERE hits > 0), '') AS covered_lines,
  COALESCE(string_agg(CAST(line AS VARCHAR), ',' ORDER BY line) FILTER (WHERE hits = 0), '') AS uncovered_lines,
  count(*) AS total_lines,
  CAST(SUM(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS BIGINT) AS covered_count,
  ROUND(SUM(CASE WHEN hits > 0 THEN 1 ELSE 0 END) / count(*), 6) AS coverage_ratio
FROM da
GROUP BY log_key, source_file
ORDER BY log_key, source_file
""",
)
def etl_coverage_lcov(spark: SparkSession, sf_dir: str) -> DataFrame:
    from testlog_etl_spark.etl.coverage import parse_lcov

    lines = fixtures.lcov_file(spark)
    docs = parse_lcov(lines)
    return docs.select(
        "log_key",
        "source_file",
        F.array_join(F.col("covered_lines").cast("array<string>"), ",").alias("covered_lines"),
        F.array_join(F.col("uncovered_lines").cast("array<string>"), ",").alias("uncovered_lines"),
        "total_lines",
        "covered_count",
        "coverage_ratio",
    ).orderBy("log_key", "source_file")
