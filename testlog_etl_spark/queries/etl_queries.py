"""Oracle-paired ETL-transform queries (SURVEY SS2.8 T2-T9).

Two kinds of entries:
- driver-table entries with full DuckDB oracles (props JSON extraction,
  sessionization, idempotent dedup, lineage stamping, log-token explode);
- fixture-driven entries for the transforms whose inputs (mozlog /
  buildbot text / PERFHERDER blobs) don't exist in the driver tables --
  these are deterministic but have no SQL twin, so the driver records
  the weaker rows-only check; their value-level truth is pinned by the
  golden-file tests in tests/test_etl.py (the reference's own strategy,
  SURVEY SS5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from testlog_etl_spark.etl import fixtures
from testlog_etl_spark.etl.lineage import deterministic_id, stamp
from testlog_etl_spark.etl.mozlog import suite_summaries, test_results
from testlog_etl_spark.etl.perfherder import extract_perf
from testlog_etl_spark.etl.text_log import parse_steps
from testlog_etl_spark.operators.dedup import latest_by
from testlog_etl_spark.suite import register
from testlog_etl_spark.tables import load_tables

R = 4


@register(
    "etl_props_extract",
    doc="T4/S5: dynamic JSON props column -> typed field (from_json on "
    "Spark, json_extract on DuckDB) + group rollup.",
    oracle="""
SELECT event_type,
  count(*) AS n,
  SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS sum_k,
  count(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_k
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def etl_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    k = F.from_json("props", "k BIGINT")["k"]
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.count_distinct(F.col("k")).alias("n_k"),
        )
        .orderBy("event_type")
    )


@register(
    "etl_sessionize",
    doc="T2-shaped accumulation over the driver's event stream: per-user "
    "'suite' doc with start/end/duration/volume -- the same one-hash-agg "
    "plan as the mozlog transform, with a SQL twin.",
    oracle=f"""
SELECT user_id,
  count(*) AS n_events,
  min(ts) AS start_ts,
  max(ts) AS end_ts,
  ROUND(epoch(max(ts)) - epoch(min(ts)), 3) AS span_sec,
  ROUND(SUM(value), {R}) AS total_value,
  array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types
FROM events
GROUP BY user_id
ORDER BY user_id
""",
)
def etl_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("start_ts"),
            F.max("ts").alias("end_ts"),
            F.round(F.max("ts").cast("double") - F.min("ts").cast("double"), 3).alias("span_sec"),
            F.round(F.sum("value"), R).alias("total_value"),
            F.array_join(F.array_sort(F.collect_set("event_type")), ",").alias("types"),
        )
        .orderBy("user_id")
    )


@register(
    "etl_dedup_latest",
    doc="T9 idempotency: deterministic keep-latest per (user, type) -- "
    "the overwrite-by-id semantics of the reference's rollover sink.",
    oracle="""
SELECT user_id, event_type, event_id, ts
FROM (
  SELECT user_id, event_type, event_id, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
ORDER BY user_id, event_type
""",
)
def etl_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    kept = latest_by(ev, ["user_id", "event_type"], [F.col("ts").desc(), F.col("event_id").desc()])
    return kept.select("user_id", "event_type", "event_id", "ts").orderBy("user_id", "event_type")


@register(
    "etl_lineage_stamp",
    doc="T8: nested `etl` provenance struct, serialized to JSON so both "
    "engines compare it as a plain string.",
    oracle="""
SELECT event_id,
  '{"id":' || event_id || ',"source_name":"events","stage":"normalize"}' AS etl_json
FROM events
ORDER BY event_id
LIMIT 500
""",
)
def etl_lineage_stamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    stamped = stamp(ev, "event_id", "events", "normalize")
    return (
        stamped.select("event_id", F.to_json("etl").alias("etl_json"))
        .orderBy("event_id")
        .limit(500)
    )


@register(
    "etl_token_explode",
    doc="T3-shaped token extraction: explode whitespace-split log/doc "
    "text and aggregate per token (the explode is Spark's lateral join).",
    oracle="""
SELECT lang, tok, count(*) AS n
FROM (
  SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents
)
WHERE tok <> ''
GROUP BY lang, tok
HAVING count(*) >= 20
ORDER BY lang, tok
""",
)
def etl_token_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return (
        docs.select("lang", F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 20)
        .orderBy("lang", "tok")
    )


@register(
    "etl_enrich_cached",
    doc="J1/J4/S4: enrichment with a broadcast cache dimension + batched "
    "mapInPandas fetch for misses (deterministic fake fetcher; the HTTP "
    "call itself is the only stub). Even user_ids are 'cached', odd ones "
    "resolve through the fetch path.",
    oracle="""
SELECT user_id, count(*) AS n,
       CASE WHEN user_id % 2 = 0 THEN 'cached_' || user_id
            ELSE 'fetched_' || user_id END AS meta
FROM events
GROUP BY user_id
ORDER BY user_id
""",
)
def etl_enrich_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    from testlog_etl_spark.etl.enrichment import enrich_with_cache, fake_fetch

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    cache = (
        ev.select(F.col("user_id").alias("key"))
        .distinct()
        .filter(F.col("key") % 2 == 0)
        .withColumn("meta", F.concat(F.lit("cached_"), F.col("key")))
    )
    enriched = enrich_with_cache(ev, cache, "user_id", fetch=fake_fetch)
    return (
        enriched.groupBy("user_id", "meta")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("user_id", "n", "meta")
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# fixture-driven transforms (no SQL twin; golden-file tests pin values)
# ---------------------------------------------------------------------------


@register(
    "etl_mozlog_results",
    oracle=None,
    doc="T2 flagship: mozlog lines -> per-test result docs (fixture "
    "input; values pinned by tests/test_etl.py golden asserts).",
)
def etl_mozlog_results(spark: SparkSession, sf_dir: str) -> DataFrame:
    lines = fixtures.mozlog_lines(spark)
    return test_results(lines).orderBy("suite_key", "test")


@register(
    "etl_mozlog_suites",
    oracle=None,
    doc="T2 suite-level rollup over the per-test docs.",
)
def etl_mozlog_suites(spark: SparkSession, sf_dir: str) -> DataFrame:
    lines = fixtures.mozlog_lines(spark)
    return suite_summaries(test_results(lines)).orderBy("suite_key")


@register(
    "etl_text_log_steps",
    oracle=None,
    doc="T3: buildbot-style text log -> step docs with durations.",
)
def etl_text_log_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    lines = fixtures.text_log_lines(spark)
    return parse_steps(lines).orderBy("log_key", "step")


@register(
    "etl_perfherder",
    oracle=None,
    doc="T5: PERFHERDER_DATA blobs -> per-subtest replicate stats.",
)
def etl_perfherder(spark: SparkSession, sf_dir: str) -> DataFrame:
    lines = fixtures.perfherder_lines(spark)
    return extract_perf(lines).orderBy("log_key", "suite", "subtest")
