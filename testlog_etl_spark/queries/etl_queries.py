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
  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
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
  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS start_ts,
  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS end_ts,
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
            # formatted UTC strings -- TZ-proof output (r06 TZ sweep);
            # sub-second precision is second-truncated BY DESIGN here
            # (span_sec below carries the exact sub-second arithmetic)
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("start_ts"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("end_ts"),
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
SELECT user_id, event_type, event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts
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
    # ts as formatted UTC string -- TZ-proof output (r06 TZ sweep).
    # Consumers: sub-second precision is second-truncated BY DESIGN at
    # this output boundary (both engines format identically; the full
    # nanos survive in the underlying column and the keep-latest order).
    return kept.select(
        "user_id", "event_type", "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
    ).orderBy("user_id", "event_type")


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
# fixture-driven transforms. The mozlog/buildbot/PERFHERDER inputs don't
# exist in the driver tables, so both engines read the SAME committed
# tests/data/*.jsonl files (Spark via the S1 JSONL source, DuckDB via
# read_json) — full value-hash differential checks; golden-file tests in
# tests/test_etl.py additionally pin absolute values.
# ---------------------------------------------------------------------------

_MOZ = fixtures.fixture_path("mozlog.jsonl")
_MOZ_LINES = f"""
  SELECT * FROM read_json('{_MOZ}', format='newline_delimited',
    columns={{suite_key:'VARCHAR', action:'VARCHAR', "time":'DOUBLE',
             test:'VARCHAR', subtest:'VARCHAR', status:'VARCHAR', expected:'VARCHAR'}})
"""
# the same one-hash-agg state machine as etl.mozlog.test_results
_MOZ_RESULTS = f"""
  SELECT suite_key, test,
    min(CASE WHEN action='test_start' THEN "time" END) AS start_time,
    max(CASE WHEN action='test_end' THEN "time" END) AS end_time,
    max(CASE WHEN action='test_end' THEN status END) AS status,
    max(CASE WHEN action='test_end' THEN COALESCE(expected, status) END) AS expected,
    CAST(SUM(CASE WHEN action='test_status' THEN 1 ELSE 0 END) AS BIGINT) AS subtest_count,
    CAST(SUM(CASE WHEN action='test_status' AND NOT (status <> COALESCE(expected, status)) THEN 1 ELSE 0 END) AS BIGINT) AS subtest_pass,
    CAST(SUM(CASE WHEN action='test_status' AND (status <> COALESCE(expected, status)) THEN 1 ELSE 0 END) AS BIGINT) AS subtest_fail,
    bool_or(CASE WHEN action='test_end' THEN (status <> COALESCE(expected, status)) END) AS end_unexpected
  FROM lines
  WHERE action IN ('test_start', 'test_status', 'test_end')
  GROUP BY suite_key, test
"""
_MOZ_DOCS = """
  SELECT suite_key, test, start_time, end_time, status, expected,
    subtest_count, subtest_pass, subtest_fail,
    end_time - start_time AS duration,
    ((NOT COALESCE(end_unexpected, false)) AND subtest_fail = 0) AS ok
  FROM res
"""


@register(
    "etl_mozlog_results",
    doc="T2 flagship: mozlog lines -> per-test result docs (file-backed "
    "fixture; values also pinned by tests/test_etl.py golden asserts).",
    oracle=f"""
WITH lines AS ({_MOZ_LINES}), res AS ({_MOZ_RESULTS})
{_MOZ_DOCS}
ORDER BY suite_key, test
""",
)
def etl_mozlog_results(spark: SparkSession, sf_dir: str) -> DataFrame:
    lines = fixtures.mozlog_file(spark)
    return test_results(lines).orderBy("suite_key", "test")


@register(
    "etl_mozlog_suites",
    doc="T2 suite-level rollup over the per-test docs.",
    oracle=f"""
WITH lines AS ({_MOZ_LINES}), res AS ({_MOZ_RESULTS}), docs AS ({_MOZ_DOCS})
SELECT suite_key,
  count(*) AS test_count,
  CAST(SUM(CASE WHEN NOT ok THEN 1 ELSE 0 END) AS BIGINT) AS unexpected_count,
  CAST(SUM(subtest_count) AS BIGINT) AS subtest_count,
  min(start_time) AS suite_start,
  max(end_time) AS suite_end,
  SUM(duration) AS total_test_seconds
FROM docs
GROUP BY suite_key
ORDER BY suite_key
""",
)
def etl_mozlog_suites(spark: SparkSession, sf_dir: str) -> DataFrame:
    lines = fixtures.mozlog_file(spark)
    return suite_summaries(test_results(lines)).orderBy("suite_key")


_TEXT = fixtures.fixture_path("text_log.jsonl")
_TEXT_MARK = r"^=+ (Started|Finished) (.*?) \(results: (\d+), elapsed: (\d+) secs\) \(at ([0-9: .-]+)\) =+$"


@register(
    "etl_text_log_steps",
    doc="T3: buildbot-style text log -> step docs with durations "
    "(regexp_extract cascade on both engines).",
    oracle=f"""
WITH lines AS (
  SELECT * FROM read_json('{_TEXT}', format='newline_delimited',
    columns={{log_key:'VARCHAR', "value":'VARCHAR'}})
), marked AS (
  SELECT log_key,
    regexp_extract("value", '{_TEXT_MARK}', 1) AS _kind,
    regexp_extract("value", '{_TEXT_MARK}', 2) AS step,
    CAST(regexp_extract("value", '{_TEXT_MARK}', 3) AS INTEGER) AS result_code,
    CAST(regexp_extract("value", '{_TEXT_MARK}', 4) AS BIGINT) AS elapsed,
    CAST(regexp_extract("value", '{_TEXT_MARK}', 5) AS TIMESTAMP) AS at
  FROM lines
  WHERE regexp_matches("value", '{_TEXT_MARK}')
)
SELECT log_key, step,
  strftime(min(CASE WHEN _kind = 'Started' THEN at END), '%Y-%m-%d %H:%M:%S') AS start_time,
  strftime(max(CASE WHEN _kind = 'Finished' THEN at END), '%Y-%m-%d %H:%M:%S') AS end_time,
  max(CASE WHEN _kind = 'Finished' THEN result_code END) AS result_code,
  max(CASE WHEN _kind = 'Finished' THEN elapsed END) AS elapsed,
  (max(CASE WHEN _kind = 'Finished' THEN result_code END) = 0) AS ok
FROM marked
GROUP BY log_key, step
ORDER BY log_key, step
""",
)
def etl_text_log_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    lines = fixtures.text_log_file(spark)
    out = parse_steps(lines)
    # formatted UTC strings -- TZ-proof output (r06 TZ sweep);
    # sub-second precision is second-truncated BY DESIGN at this output
    # boundary (elapsed carries the exact duration)
    return out.withColumn(
        "start_time", F.date_format("start_time", "yyyy-MM-dd HH:mm:ss")
    ).withColumn("end_time", F.date_format("end_time", "yyyy-MM-dd HH:mm:ss")).orderBy("log_key", "step")


_PERF = fixtures.fixture_path("perfherder.jsonl")
_PERF_STRUCT = (
    '{{"framework": {{"name": "VARCHAR"}},'
    ' "suites": [{{"name": "VARCHAR", "value": "DOUBLE",'
    ' "subtests": [{{"name": "VARCHAR", "value": "DOUBLE", "replicates": ["DOUBLE"]}}]}}]}}'
).format()


@register(
    "etl_perfherder",
    doc="T5: PERFHERDER_DATA blobs -> per-subtest replicate stats "
    "(from_json+explode on Spark, json_transform+unnest on DuckDB).",
    oracle=f"""
WITH lines AS (
  SELECT * FROM read_json('{_PERF}', format='newline_delimited',
    columns={{log_key:'VARCHAR', "value":'VARCHAR'}})
), blobs AS (
  SELECT log_key,
    json_transform(split_part("value", 'PERFHERDER_DATA: ', 2),
                   '{_PERF_STRUCT}') AS perf
  FROM lines
  WHERE contains("value", 'PERFHERDER_DATA: ')
), suites AS (
  SELECT log_key, perf.framework.name AS framework, unnest(perf.suites) AS suite
  FROM blobs
), subs AS (
  SELECT log_key, framework, suite.name AS suite_name,
         suite."value" AS suite_value, unnest(suite.subtests) AS st
  FROM suites
)
SELECT log_key, framework, suite_name AS suite, suite_value,
  st.name AS subtest,
  st."value" AS subtest_value,
  CAST(len(st.replicates) AS INTEGER) AS replicate_count,
  list_aggregate(st.replicates, 'sum') / len(st.replicates) AS replicate_mean,
  list_aggregate(st.replicates, 'min') AS replicate_min,
  list_aggregate(st.replicates, 'max') AS replicate_max
FROM subs
ORDER BY log_key, suite, subtest
""",
)
def etl_perfherder(spark: SparkSession, sf_dir: str) -> DataFrame:
    lines = fixtures.perfherder_file(spark)
    return extract_perf(lines).orderBy("log_key", "suite", "subtest")


@register(
    "etl_typed_variant",
    doc="SS1.2 typed-JSON analog on the dynamic props column: parse to "
    "VARIANT once, extract $.k as per-type variants gated on "
    "schema_of_variant (the ~n~/~s~/~b~/~e~ encoding as a struct); "
    "oracle uses DuckDB json_type the same way.",
    oracle="""
SELECT event_type,
  count(*) AS n,
  CAST(SUM(CASE WHEN json_extract(props, '$.k') IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_exists,
  CAST(SUM(CASE WHEN json_type(props, '$.k') IN ('UBIGINT','BIGINT','DOUBLE','HUGEINT') THEN 1 ELSE 0 END) AS BIGINT) AS n_number,
  CAST(SUM(CASE WHEN json_type(props, '$.k') = 'VARCHAR' THEN 1 ELSE 0 END) AS BIGINT) AS n_string,
  SUM(CASE WHEN json_type(props, '$.k') IN ('UBIGINT','BIGINT','DOUBLE','HUGEINT')
           THEN CAST(json_extract_string(props, '$.k') AS DOUBLE) END) AS sum_k
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def etl_typed_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    from testlog_etl_spark.operators.typedjson import parse_variant, typed_field

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    k = typed_field(parse_variant(F.col("props")), "$.k")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("k.e").cast("long")).alias("n_exists"),
            F.count("k.n").alias("n_number"),
            F.count("k.s").alias("n_string"),
            F.sum("k.n").alias("sum_k"),
        )
        .orderBy("event_type")
    )


@register(
    "cohort_retention",
    doc="cohort retention matrix: users bucketed by signup week, counted "
    "distinct-active per week offset. Three partial-agg shuffles, all on "
    "user_id or the (small) cohort keys; the user-grain join reuses the "
    "user_id partitioning from the signup rollup.",
    oracle="""
WITH signup AS (
  SELECT user_id,
         CAST(floor(epoch(min(ts))) AS BIGINT) // 604800 AS cohort_week
  FROM events WHERE event_type = 'signup'
  GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch(ts)) AS BIGINT) // 604800 AS week
  FROM events
)
SELECT s.cohort_week, a.week - s.cohort_week AS week_offset,
       count(DISTINCT s.user_id) AS n_users
FROM signup s JOIN activity a ON s.user_id = a.user_id
WHERE a.week >= s.cohort_week
GROUP BY s.cohort_week, week_offset
ORDER BY cohort_week, week_offset
""",
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    week = lambda c: F.floor(F.floor(F.unix_timestamp(c)) / 604800).cast("bigint")  # noqa: E731
    signup = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(week(F.min("ts")).alias("cohort_week"))
    )
    activity = ev.select("user_id", week(F.col("ts")).alias("week")).distinct()
    return (
        signup.join(activity, "user_id")
        .filter(F.col("week") >= F.col("cohort_week"))
        .withColumn("week_offset", F.col("week") - F.col("cohort_week"))
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


@register(
    "transition_matrix",
    doc="event-type transition matrix (Markov bigrams): lag over each "
    "user's unique-sorted event stream, rolled up to (prev, next) "
    "counts. One user-keyed window shuffle + one partial-agg shuffle on "
    "the (tiny) type-pair keys.",
    oracle="""
SELECT prev_type, event_type AS next_type, count(*) AS n
FROM (
  SELECT event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
)
WHERE prev_type IS NOT NULL
GROUP BY prev_type, next_type
ORDER BY prev_type, next_type
""",
)
def transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("prev_type", "next_type")
    )


@register(
    "skew_report",
    doc="key-skew diagnosis (what you run BEFORE deciding to salt): "
    "top-10 heaviest user_ids with share of total. Partial-agg per key, "
    "TakeOrdered for the top-k (no global sort), one-row total "
    "broadcast.",
    oracle="""
WITH c AS (SELECT user_id, count(*) AS n FROM events GROUP BY user_id),
t AS (SELECT count(*) AS total FROM events),
r AS (
  SELECT user_id, n, ROW_NUMBER() OVER (ORDER BY n DESC, user_id) AS rank
  FROM c
)
SELECT r.user_id, r.n, ROUND(r.n / t.total, 4) AS share, r.rank
FROM r, t
WHERE r.rank <= 10
ORDER BY r.rank
""",
)
def skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    counts = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    top = counts.orderBy(F.desc("n"), "user_id").limit(10)
    total = ev.agg(F.count(F.lit(1)).alias("total"))
    # rank window runs over the already-limited 10 rows -- single tiny task
    w = Window.orderBy(F.desc("n"), "user_id")
    return (
        top.crossJoin(F.broadcast(total))
        .withColumn("share", F.round(F.col("n") / F.col("total"), 4))
        .withColumn("rank", F.row_number().over(w))
        .select("user_id", "n", "share", "rank")
        .orderBy("rank")
    )


@register(
    "join_salted_skew",
    doc="salted big-big join on a HOT key (operators/skew.py::"
    "salted_join -- the join sibling of agg_salted_skew): events join "
    "their per-type average on event_type, a 4-value key that would "
    "funnel each type's whole partition through one sort-merge task; "
    "the salt spreads every type over 16 reducers (plan-pinned: join "
    "keys include _salt, strategy pinned merge so sandbox-scale AQE "
    "can't broadcast away the demonstrated shape). Threshold is the "
    "ROUNDED per-type average so the boundary compare is exact on both "
    "engines. Result provably equals the unsalted join.",
    oracle="""
WITH d AS (
  SELECT event_type, ROUND(AVG(value), 2) AS type_avg FROM events GROUP BY event_type
)
SELECT e.event_type,
       CAST(SUM(CASE WHEN e.value > d.type_avg THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
       count(*) AS n,
       ROUND(any_value(d.type_avg), 2) AS type_avg
FROM events e JOIN d ON e.event_type = d.event_type
GROUP BY e.event_type
ORDER BY e.event_type
""",
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    from testlog_etl_spark.operators.skew import salted_join

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    dim = ev.groupBy("event_type").agg(F.round(F.avg("value"), 2).alias("type_avg"))
    joined = salted_join(
        ev.select("event_id", "event_type", "value"), dim, ["event_type"], salt_on="event_id"
    )
    return (
        joined.groupBy("event_type")
        .agg(
            F.sum((F.col("value") > F.col("type_avg")).cast("long")).alias("n_above"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.any_value("type_avg"), 2).alias("type_avg"),
        )
        .orderBy("event_type")
    )


def _pagerank_oracle(n_iter: int = 5, d: float = 0.85, bits: int = 30) -> str:
    """DuckDB twin of dupgroups.pagerank over the event-transition graph:
    the same grid-snapped iterations as chained CTEs (the kmeans/IVF
    restatement playbook); ranks are bit-identical by construction, so
    the compare is exact with no output rounding."""
    g = 1 << bits

    def snap(x: str) -> str:
        return f"floor(({x}) * {g} + 0.5) / {g}"

    blocks = [
        f"""edges AS (
  SELECT prev_type AS src, event_type AS dst, count(*)::DOUBLE AS w
  FROM (
    SELECT event_type,
           lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
    FROM events
  )
  WHERE prev_type IS NOT NULL
  GROUP BY src, dst
),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
nf AS (SELECT count(*) AS n FROM nodes),
ow AS (SELECT src, SUM(w) AS ow FROM edges GROUP BY src),
e AS (SELECT edges.src, edges.dst, edges.w / ow.ow AS frac FROM edges JOIN ow ON ow.src = edges.src),
r0 AS (SELECT node, {snap('1.0 / nf.n')} AS rank FROM nodes, nf)"""
    ]
    for i in range(1, n_iter + 1):
        blocks.append(
            f"""i{i} AS (
  SELECT e.dst AS node, SUM(r.rank * e.frac) AS inb
  FROM e JOIN r{i - 1} r ON r.node = e.src GROUP BY e.dst
),
r{i} AS (
  SELECT nodes.node, {snap(f'(1 - {d}) / nf.n + {d} * coalesce(i{i}.inb, 0.0)')} AS rank
  FROM nodes LEFT JOIN i{i} ON i{i}.node = nodes.node, nf
)"""
        )
    body = ",\n".join(blocks)
    return f"""
WITH {body}
SELECT node, rank FROM r{n_iter} ORDER BY node
"""


@register(
    "graph_pagerank",
    oracle=_pagerank_oracle(),
    doc="weighted PageRank over the event-type transition graph "
    "(operators/dupgroups.py::pagerank): 5 damped iterations as an "
    "iterative DataFrame loop -- per round a broadcast edges><ranks "
    "join plus one (node, double) sum shuffle. Exactly oracled via the "
    "kmeans/IVF playbook: ranks grid-snapped to 2^-30 each round, so "
    "inbound-sum addition order can never accumulate and the chained-"
    "CTE replay is bit-identical (no output rounding needed).",
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from testlog_etl_spark.operators.dupgroups import pagerank

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy(F.col("prev_type").alias("src"), F.col("event_type").alias("dst"))
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    return pagerank(edges, "src", "dst", "w", n_iter=5, damping=0.85).select(
        "node", "rank"
    ).orderBy("node")


@register(
    "snapshot_diff_orders",
    doc="snapshot diff / CDC extraction (operators/diff.py): version N+1 "
    "of orders is derived from version N by deterministic md5-bucket "
    "slices (bucket 0 deleted, 1 status-updated, 2 price-updated, 3 "
    "re-keyed copies inserted), then diffed back against N. ONE "
    "full-outer shuffle on the key; change detection is null-safe "
    "codegen compares; changed_cols names the differing columns. The "
    "oracle rebuilds the same version and diffs with FULL JOIN + IS "
    "DISTINCT FROM.",
    oracle="""
WITH old AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority FROM orders
),
b AS (
  SELECT *, try_cast(('0x' || substr(md5(o_orderkey::VARCHAR || ':d'), 1, 15)) AS BIGINT) % 10 AS bkt
  FROM old
),
new AS (
  SELECT o_orderkey,
         CASE WHEN bkt = 1 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
         CASE WHEN bkt = 2 THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice,
         o_orderpriority
  FROM b WHERE bkt <> 0
  UNION ALL
  SELECT o_orderkey + 10000000, o_orderstatus, o_totalprice, o_orderpriority
  FROM b WHERE bkt = 3
)
SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
       CASE WHEN o.o_orderkey IS NULL THEN 'insert'
            WHEN n.o_orderkey IS NULL THEN 'delete'
            ELSE 'update' END AS op,
       concat_ws(',',
         CASE WHEN o.o_orderkey IS NOT NULL AND n.o_orderkey IS NOT NULL
               AND o.o_orderstatus IS DISTINCT FROM n.o_orderstatus THEN 'o_orderstatus' END,
         CASE WHEN o.o_orderkey IS NOT NULL AND n.o_orderkey IS NOT NULL
               AND o.o_totalprice IS DISTINCT FROM n.o_totalprice THEN 'o_totalprice' END,
         CASE WHEN o.o_orderkey IS NOT NULL AND n.o_orderkey IS NOT NULL
               AND o.o_orderpriority IS DISTINCT FROM n.o_orderpriority THEN 'o_orderpriority' END
       ) AS changed
FROM old o FULL JOIN new n ON o.o_orderkey = n.o_orderkey
WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
   OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
   OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
   OR o.o_orderpriority IS DISTINCT FROM n.o_orderpriority
ORDER BY op, o_orderkey
""",
)
def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from testlog_etl_spark.operators.diff import snapshot_diff
    from testlog_etl_spark.operators.sampling import hash_bucket

    orders = load_tables(spark, sf_dir, ("orders",))["orders"].select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )
    b = orders.withColumn("_bkt", hash_bucket(F.col("o_orderkey"), 10, "d"))
    new = (
        b.filter(F.col("_bkt") != 0)
        .select(
            "o_orderkey",
            F.when(F.col("_bkt") == 1, F.lit("X")).otherwise(F.col("o_orderstatus")).alias("o_orderstatus"),
            F.when(F.col("_bkt") == 2, F.col("o_totalprice") + F.lit(1.0))
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),
            "o_orderpriority",
        )
        .unionByName(
            b.filter(F.col("_bkt") == 3).select(
                (F.col("o_orderkey") + F.lit(10_000_000)).alias("o_orderkey"),
                "o_orderstatus",
                "o_totalprice",
                "o_orderpriority",
            )
        )
    )
    d = snapshot_diff(orders, new, ["o_orderkey"], ["o_orderstatus", "o_totalprice", "o_orderpriority"])
    return d.select(
        "o_orderkey", "op", F.array_join("changed_cols", ",").alias("changed")
    ).orderBy("op", "o_orderkey")


@register(
    "events_cep_pattern",
    doc="sequence-pattern detection (MATCH_RECOGNIZE / CEP shape): per "
    "user, the ordered event-initial string is scanned for the "
    "conversion pattern v+c+p (views then clicks then purchase) with "
    "greedy non-overlapping regex semantics -- identical in Java regex "
    "and RE2 for this alphabet. One groupBy shuffle builds each user's "
    "sequence (array_sort over (ts, event_id) structs -- order is "
    "enforced inside the aggregate, not assumed from input order); the "
    "regex scan is row-local codegen.",
    oracle="""
SELECT user_id,
       CAST(len(seq) AS INT) AS seq_len,
       CAST(len(regexp_extract_all(seq, 'v+c+p')) AS INT) AS conversions
FROM (
  SELECT user_id, string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS seq
  FROM events GROUP BY user_id
)
ORDER BY user_id
""",
)
def events_cep_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    seq = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct("ts", "event_id", F.substring("event_type", 1, 1).alias("i"))
                )
            ),
            lambda x: x["i"],
        ),
        "",
    )
    return (
        ev.groupBy("user_id")
        .agg(seq.alias("seq"))
        .select(
            "user_id",
            F.length("seq").cast("int").alias("seq_len"),
            F.regexp_count("seq", F.lit("v+c+p")).cast("int").alias("conversions"),
        )
        .orderBy("user_id")
    )


@register(
    "graph_market_basket",
    doc="market-basket association mining over the user x event-type "
    "bipartite graph: support, confidence, and lift for every ordered "
    "type pair co-occurring in a user's history. Distinct (user, type) "
    "first (one dedup shuffle carrying two small columns), pairs via "
    "self-join on user (bounded: types-per-user <= 5 here; in general "
    "cap the basket with a max-basket filter, the postings max_df "
    "move), then one rollup + broadcast of the tiny per-type counts.",
    oracle="""
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
n AS (SELECT CAST(count(DISTINCT user_id) AS DOUBLE) AS n_users FROM events),
tc AS (SELECT event_type, count(*) AS n_t FROM ut GROUP BY event_type),
pairs AS (
  SELECT a.event_type AS ante, b.event_type AS cons, count(*) AS n_ab
  FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.event_type <> b.event_type
  GROUP BY ante, cons
)
SELECT ante, cons, n_ab,
       ROUND(n_ab / n_users, 4) AS support,
       ROUND(n_ab / ta.n_t, 4) AS confidence,
       ROUND((n_ab / n_users) / ((ta.n_t / n_users) * (tb.n_t / n_users)), 4) AS lift
FROM pairs
JOIN tc ta ON ta.event_type = ante
JOIN tc tb ON tb.event_type = cons
CROSS JOIN n
ORDER BY ante, cons
""",
)
def graph_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    ut = ev.select("user_id", "event_type").distinct()
    n = ev.agg(F.count_distinct("user_id").cast("double").alias("n_users"))
    tc = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_t"))
    a = ut.select("user_id", F.col("event_type").alias("ante"))
    b = ut.select("user_id", F.col("event_type").alias("cons"))
    pairs = (
        a.join(b, "user_id")
        .filter(F.col("ante") != F.col("cons"))
        .groupBy("ante", "cons")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    ta = tc.select(F.col("event_type").alias("ante"), F.col("n_t").alias("n_a"))
    tb = tc.select(F.col("event_type").alias("cons"), F.col("n_t").alias("n_b"))
    return (
        pairs.join(F.broadcast(ta), "ante")
        .join(F.broadcast(tb), "cons")
        .crossJoin(F.broadcast(n))
        .select(
            "ante",
            "cons",
            "n_ab",
            F.round(F.col("n_ab") / F.col("n_users"), R).alias("support"),
            F.round(F.col("n_ab") / F.col("n_a"), R).alias("confidence"),
            F.round(
                (F.col("n_ab") / F.col("n_users"))
                / ((F.col("n_a") / F.col("n_users")) * (F.col("n_b") / F.col("n_users"))),
                R,
            ).alias("lift"),
        )
        .orderBy("ante", "cons")
    )


@register(
    "graph_triangles",
    doc="triangle count per node on the undirected event-transition "
    "graph: canonical a<b<c ordered two-path + closing-edge semi "
    "check, so each triangle is generated exactly once and the join "
    "never enumerates a pair twice -- the standard distributed "
    "formulation (node-order degeneracy would cap fan-out on skewed "
    "graphs; the transition graph is tiny, the SHAPE is what scales).",
    oracle="""
WITH raw AS (
  SELECT prev_type AS a, event_type AS b FROM (
    SELECT event_type,
           lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
    FROM events
  ) WHERE prev_type IS NOT NULL AND prev_type <> event_type
),
e AS (
  SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v FROM raw
),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM e e1
  JOIN e e2 ON e2.u = e1.v
  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
)
SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
FROM (SELECT a AS node FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri)
GROUP BY node
ORDER BY node
""",
)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    raw = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull() & (F.col("prev_type") != F.col("event_type")))
        .select(
            F.least("prev_type", "event_type").alias("u"),
            F.greatest("prev_type", "event_type").alias("v"),
        )
        .distinct()
    )
    e1 = raw.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = raw.select(F.col("u").alias("b2"), F.col("v").alias("c"))
    e3 = raw.select(F.col("u").alias("a3"), F.col("v").alias("c3"))
    tri = (
        e1.join(e2, F.col("b") == F.col("b2"))
        .join(e3, (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")), "left_semi")
        .select("a", "b", "c")
    )
    nodes = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
    )
    return nodes.groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles")).orderBy("node")


@register(
    "agg_survival_curve",
    doc="user survival curve (churn analysis): S(t) = share of users "
    "whose activity span (first to last event) reaches >= t days, for "
    "t = 0..30. One per-user span rollup -> integral span-day "
    "histogram -> suffix cumulative over the 31-row grid (a window "
    "over the HISTOGRAM, never the users) -> share of the broadcast "
    "user total.",
    oracle="""
WITH spans AS (
  SELECT user_id,
         CAST(floor(epoch(max(ts)) / 86400) - floor(epoch(min(ts)) / 86400) AS BIGINT) AS span_days
  FROM events GROUP BY user_id
),
n AS (SELECT count(*)::DOUBLE AS n_users FROM spans),
grid AS (SELECT unnest(range(0, 31)) AS t),
h AS (SELECT span_days, count(*)::BIGINT AS c FROM spans GROUP BY span_days)
SELECT t, CAST(COALESCE(SUM(c) FILTER (h.span_days >= t), 0) AS BIGINT) AS n_surviving,
       ROUND(COALESCE(SUM(c) FILTER (h.span_days >= t), 0) / n.n_users, 4) AS survival
FROM grid CROSS JOIN n LEFT JOIN h ON TRUE
GROUP BY t, n.n_users
ORDER BY t
""",
)
def agg_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    spans = ev.groupBy("user_id").agg(
        (
            F.floor(F.unix_timestamp(F.max("ts")) / 86400)
            - F.floor(F.unix_timestamp(F.min("ts")) / 86400)
        ).alias("span_days")
    )
    n = spans.agg(F.count(F.lit(1)).cast("double").alias("n_users"))
    h = spans.groupBy("span_days").agg(F.count(F.lit(1)).alias("c"))
    grid = spark.range(0, 31).select(F.col("id").alias("t"))
    # suffix sum over the tiny histogram: surviving at t = sum of counts
    # with span >= t; the join is grid x histogram (31 x <=31 rows)
    joined = grid.join(F.broadcast(h), F.lit(True), "left").withColumn(
        "_hit", F.when(F.col("span_days") >= F.col("t"), F.col("c")).otherwise(F.lit(0))
    )
    # LEFT join on TRUE (not crossJoin): an empty histogram must keep
    # all 31 grid rows with zero counts, as the oracle's LEFT JOIN does
    return (
        joined.groupBy("t")
        .agg(F.coalesce(F.sum("_hit"), F.lit(0)).alias("n_surviving"))
        .crossJoin(F.broadcast(n))
        .select(
            "t",
            "n_surviving",
            F.round(F.col("n_surviving") / F.col("n_users"), 4).alias("survival"),
        )
        .orderBy("t")
    )


@register(
    "funnel_latency_quantiles",
    doc="funnel TIME-TO-CONVERT: each user's first view paired with "
    "the first subsequent purchase via operators/funnel.py::"
    "funnel_stage_times (chained conditional-min windows over ONE user "
    "exchange -- the same operator win_funnel_conversion uses, not a "
    "per-stage join-back), then exact median/p90 latency over the "
    "small converted-users frame plus the conversion share.",
    oracle="""
WITH v AS (
  SELECT user_id, min(ts) AS first_view FROM events WHERE event_type = 'view' GROUP BY user_id
),
p AS (
  SELECT v.user_id, v.first_view, min(e.ts) AS first_purchase
  FROM v JOIN events e ON e.user_id = v.user_id
   AND e.event_type = 'purchase' AND e.ts > v.first_view
  GROUP BY v.user_id, v.first_view
)
SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS n_viewers,
       CAST(count(*) AS BIGINT) AS n_converted,
       ROUND(count(*) / (SELECT count(*)::DOUBLE FROM v), 4) AS conversion,
       ROUND(median(epoch(first_purchase) - epoch(first_view)) / 3600, 4) AS median_hours,
       ROUND(quantile_cont(epoch(first_purchase) - epoch(first_view), 0.9) / 3600, 4) AS p90_hours
FROM p
""",
)
def funnel_latency_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from testlog_etl_spark.operators.funnel import funnel_stage_times

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    st = (
        funnel_stage_times(ev, "user_id", "ts", "event_type", ["view", "purchase"])
        .select("user_id", "t1", "t2")
        .distinct()
    )
    n_viewers = st.filter(F.col("t1").isNotNull()).agg(F.count(F.lit(1)).alias("n_viewers"))
    lat = st.filter(F.col("t2").isNotNull()).select(
        F.lit(1).alias("_g"),
        ((F.unix_micros("t2") - F.unix_micros("t1")).cast("double") / 1e6).alias("lat_sec"),
    )
    # rank-selection quantiles over the converted-users grain (scales
    # with users, so the exact median()/percentile() buffers would hold
    # it all on one reducer -- operators/scan_quantile.py)
    from testlog_etl_spark.operators.scan_quantile import group_quantiles_exact

    qs = group_quantiles_exact(lat, "_g", "lat_sec", [0.5, 0.9], ["_med", "_p90"])
    return (
        lat.agg(F.count(F.lit(1)).alias("n_converted"))
        .crossJoin(F.broadcast(qs))
        .select(
            "n_converted",
            F.round(F.col("_med") / 3600, 4).alias("median_hours"),
            F.round(F.col("_p90") / 3600, 4).alias("p90_hours"),
        )
        .crossJoin(F.broadcast(n_viewers))
        .select(
            "n_viewers",
            "n_converted",
            F.round(F.col("n_converted") / F.col("n_viewers").cast("double"), 4).alias("conversion"),
            "median_hours",
            "p90_hours",
        )
    )


@register(
    "compliance_delete_sweep",
    doc="right-to-be-forgotten cascade: a deterministic md5-slice of "
    "customers (bucket 0 of 20) is the deletion list; the sweep "
    "cascades customer -> their orders -> those orders' lineitems via "
    "left_semi probes carrying KEYS ONLY, and reports per-table "
    "affected/remaining counts -- the audit record a deletion job "
    "must emit. At scale each anti/semi join is one keyed shuffle "
    "(or broadcast: the deletion list is usually tiny).",
    oracle="""
WITH del AS (
  SELECT c_custkey FROM customer
  WHERE try_cast(('0x' || substr(md5(c_custkey::VARCHAR || ':gdpr'), 1, 15)) AS BIGINT) % 20 = 0
),
del_orders AS (SELECT o_orderkey FROM orders WHERE o_custkey IN (SELECT c_custkey FROM del)),
del_li AS (SELECT 1 FROM lineitem WHERE l_orderkey IN (SELECT o_orderkey FROM del_orders))
SELECT * FROM (
  SELECT 'customer' AS tbl, (SELECT count(*) FROM del) AS n_deleted,
         (SELECT count(*) FROM customer) - (SELECT count(*) FROM del) AS n_remaining
  UNION ALL
  SELECT 'lineitem', (SELECT count(*) FROM del_li),
         (SELECT count(*) FROM lineitem) - (SELECT count(*) FROM del_li)
  UNION ALL
  SELECT 'orders', (SELECT count(*) FROM del_orders),
         (SELECT count(*) FROM orders) - (SELECT count(*) FROM del_orders)
)
ORDER BY tbl
""",
)
def compliance_delete_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from testlog_etl_spark.operators.sampling import hash_bucket

    t = load_tables(spark, sf_dir, ("customer", "orders", "lineitem"))
    cust, orders, li = t["customer"], t["orders"], t["lineitem"]
    del_c = cust.filter(hash_bucket(F.col("c_custkey"), 20, "gdpr") == 0).select("c_custkey")
    del_o = orders.join(
        del_c, F.col("o_custkey") == F.col("c_custkey"), "left_semi"
    ).select("o_orderkey")
    del_l = li.join(del_o, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")

    def row(tbl: str, full: DataFrame, deleted: DataFrame) -> DataFrame:
        return deleted.agg(F.count(F.lit(1)).alias("n_deleted")).crossJoin(
            F.broadcast(full.agg(F.count(F.lit(1)).alias("_n_all")))
        ).select(
            F.lit(tbl).alias("tbl"),
            "n_deleted",
            (F.col("_n_all") - F.col("n_deleted")).alias("n_remaining"),
        )

    return (
        row("customer", cust, del_c)
        .unionByName(row("lineitem", li, del_l))
        .unionByName(row("orders", orders, del_o))
        .orderBy("tbl")
    )


@register(
    "orders_duplicate_payments",
    doc="duplicate-transaction detection (fraud/ops hygiene): order "
    "pairs from the same customer with the SAME total within 24h of "
    "each other. Blocking is the (custkey, totalprice) equi-join -- "
    "exact-amount duplicates are the candidate set, the time band is a "
    "post-join filter; no all-pairs scan, and the shuffle carries "
    "(cust, amount, key, ts) only.",
    oracle="""
SELECT a.o_orderkey AS a_key, b.o_orderkey AS b_key, a.o_custkey AS custkey,
       ROUND(a.o_totalprice, 4) AS amount,
       CAST(abs(CAST(floor(epoch(b.o_orderdate)) AS BIGINT)
                - CAST(floor(epoch(a.o_orderdate)) AS BIGINT)) AS BIGINT) AS gap_sec
FROM orders a
JOIN orders b
  ON a.o_custkey = b.o_custkey
 AND a.o_totalprice = b.o_totalprice
 AND a.o_orderkey < b.o_orderkey
 AND abs(epoch(b.o_orderdate) - epoch(a.o_orderdate)) <= 86400
ORDER BY a_key, b_key
""",
)
def orders_duplicate_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    a = orders.select(
        F.col("o_orderkey").alias("a_key"),
        F.col("o_custkey").alias("custkey"),
        F.col("o_totalprice").alias("amount"),
        F.col("o_orderdate").alias("a_ts"),
    )
    b = orders.select(
        F.col("o_orderkey").alias("b_key"),
        F.col("o_custkey").alias("b_cust"),
        F.col("o_totalprice").alias("b_amt"),
        F.col("o_orderdate").alias("b_ts"),
    )
    return (
        a.join(
            b,
            (F.col("custkey") == F.col("b_cust"))
            & (F.col("amount") == F.col("b_amt"))
            & (F.col("a_key") < F.col("b_key")),
        )
        .withColumn(
            "gap_sec",
            F.abs(F.unix_timestamp("b_ts") - F.unix_timestamp("a_ts")).cast("long"),
        )
        .filter(F.col("gap_sec") <= 86400)
        .select("a_key", "b_key", "custkey", F.round("amount", 4).alias("amount"), "gap_sec")
        .orderBy("a_key", "b_key")
    )


@register(
    "agg_mom_growth",
    doc="month-over-month growth per event type: monthly rollup, lag "
    "window over the tiny (type, month) frame, percent change vs the "
    "prior month (null for each type's first month).",
    oracle="""
WITH m AS (
  SELECT event_type, CAST(date_trunc('month', ts) AS DATE) AS month,
         count(*)::BIGINT AS n, ROUND(SUM("value"), 4) AS revenue
  FROM events GROUP BY event_type, month
)
SELECT event_type, month, n, revenue,
       ROUND(100.0 * (revenue - lag(revenue) OVER w) / lag(revenue) OVER w, 4) AS revenue_mom_pct
FROM m
WINDOW w AS (PARTITION BY event_type ORDER BY month)
ORDER BY event_type, month
""",
)
def agg_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    # month as DATE: a timestamp output renders through the COLLECTING
    # process's OS timezone (pyspark collect uses fromtimestamp), so a
    # non-UTC harness would shift the instant; calendar dates are
    # TZ-independent (r06 TZ=America/New_York sweep caught this)
    m = ev.groupBy("event_type", F.date_trunc("month", "ts").cast("date").alias("month")).agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("revenue")
    )
    w = Window.partitionBy("event_type").orderBy("month")
    prev = F.lag("revenue").over(w)
    return (
        m.withColumn("revenue_mom_pct", F.round(100.0 * (F.col("revenue") - prev) / prev, 4))
        .orderBy("event_type", "month")
    )


@register(
    "attribution_last_touch",
    doc="last-touch attribution: each purchase credited to the user's "
    "most recent PRIOR non-purchase event (channel = event type) -- the "
    "as-of join reused as a marketing-attribution model "
    "(operators/asof.py: union + per-user window merge, ONE shuffle, "
    "no pair explosion). Revenue per channel out; purchases with no "
    "prior touch fall into the 'organic' bucket.",
    oracle="""
WITH purchases AS (
  SELECT user_id, ts, event_id, "value" FROM events WHERE event_type = 'purchase'
),
touches AS (
  SELECT user_id, ts, event_id, event_type FROM events WHERE event_type <> 'purchase'
),
last_touch AS (
  SELECT p.user_id, p.ts, p.event_id, p."value",
         (SELECT t.event_type FROM touches t
          WHERE t.user_id = p.user_id AND (t.ts < p.ts OR (t.ts = p.ts AND t.event_id < p.event_id))
          ORDER BY t.ts DESC, t.event_id DESC LIMIT 1) AS channel
  FROM purchases p
)
SELECT COALESCE(channel, 'organic') AS channel,
       CAST(count(*) AS BIGINT) AS n_purchases,
       ROUND(SUM("value"), 4) AS revenue
FROM last_touch
GROUP BY 1 ORDER BY channel
""",
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    # asof merge inlined on the union (same shape as operators/asof.py):
    # one user shuffle; last non-purchase value carried forward onto
    # each purchase row
    tagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        "event_type",
        F.when(F.col("event_type") != "purchase", F.col("event_type")).alias("_touch"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    attributed = (
        tagged.withColumn("channel", F.last("_touch", ignorenulls=True).over(w))
        .filter(F.col("event_type") == "purchase")
    )
    return (
        attributed.groupBy(F.coalesce("channel", F.lit("organic")).alias("channel"))
        .agg(F.count(F.lit(1)).alias("n_purchases"), F.round(F.sum("value"), 4).alias("revenue"))
        .orderBy("channel")
    )


@register(
    "attribution_linear",
    doc="linear multi-touch attribution: each purchase's value split "
    "equally across the user's touches in the prior 7 days; credit "
    "rollup per channel. The pairing is a user equi-join with the "
    "lookback as a post-join band filter (per-user touch lists are "
    "bounded by the horizon, so the fan-out is horizon-bounded, not "
    "quadratic); per-purchase touch counts come from one window over "
    "the joined frame.",
    oracle="""
WITH purchases AS (
  SELECT user_id, ts, event_id, "value" FROM events WHERE event_type = 'purchase'
),
touches AS (
  SELECT user_id, ts AS t_ts, event_id AS t_id, event_type AS channel
  FROM events WHERE event_type <> 'purchase'
),
pairs AS (
  SELECT p.user_id, p.ts, p.event_id, p."value", t.channel,
         count(*) OVER (PARTITION BY p.user_id, p.event_id) AS n_touches
  FROM purchases p
  JOIN touches t
    ON t.user_id = p.user_id
   AND (t.t_ts < p.ts OR (t.t_ts = p.ts AND t.t_id < p.event_id))
   AND t.t_ts >= p.ts - INTERVAL 7 DAY
)
SELECT channel, ROUND(SUM("value" / n_touches), 4) AS credited_revenue,
       CAST(count(*) AS BIGINT) AS n_credits
FROM pairs GROUP BY channel ORDER BY channel
""",
)
def attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    touches = ev.filter(F.col("event_type") != "purchase").select(
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("t_ts"),
        F.col("event_id").alias("t_id"),
        F.col("event_type").alias("channel"),
    )
    # same simultaneity rule as attribution_last_touch: a touch sharing
    # the purchase's timestamp (lower event_id) counts -- the two
    # attribution models must agree on WHICH touches influenced a
    # purchase, differing only in how credit is split
    pairs = purchases.join(
        touches,
        (F.col("user_id") == F.col("t_user"))
        & (
            (F.col("t_ts") < F.col("ts"))
            | ((F.col("t_ts") == F.col("ts")) & (F.col("t_id") < F.col("event_id")))
        )
        & (F.col("t_ts") >= F.col("ts") - F.expr("INTERVAL 7 DAYS")),
    )
    w = Window.partitionBy("user_id", "event_id")
    credited = pairs.withColumn("n_touches", F.count(F.lit(1)).over(w))
    return (
        credited.groupBy("channel")
        .agg(
            F.round(F.sum(F.col("value") / F.col("n_touches")), 4).alias("credited_revenue"),
            F.count(F.lit(1)).alias("n_credits"),
        )
        .orderBy("channel")
    )


@register(
    "events_seasonality_profile",
    doc="activity seasonality: hour-of-day x day-of-week profile per "
    "event type (the heatmap feed), plus each type's peak cell via "
    "max_by over the tiny profile frame. One rollup shuffle carrying "
    "(type, dow, hour) keys; UTC-pinned session makes hour/dow "
    "deterministic.",
    oracle="""
WITH p AS (
  SELECT event_type, CAST(isodow(ts) AS INT) AS dow, CAST(hour(ts) AS INT) AS hod,
         count(*)::BIGINT AS n, ROUND(SUM("value"), 4) AS sum_value
  FROM events GROUP BY event_type, dow, hod
)
SELECT event_type, dow, hod, n, sum_value
FROM p ORDER BY event_type, dow, hod
""",
)
def events_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return (
        ev.groupBy(
            "event_type",
            # ISO day-of-week on BOTH engines (Mon=1..Sun=7): Spark's
            # dayofweek is Sun=1, DuckDB's is Sun=0 -- either mix shifts
            # every row's bucket
            F.expr("extract(DAYOFWEEK_ISO FROM ts)").cast("int").alias("dow"),
            F.hour("ts").cast("int").alias("hod"),
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .orderBy("event_type", "dow", "hod")
    )


@register(
    "orders_backlog_aging",
    doc="backlog aging report: orders with NO line shipped by the "
    "reference date, bucketed by age (anti join against the shipped-"
    "by-ref projection -- keys only through the probe -- then an "
    "integral-day age histogram).",
    oracle="""
WITH shipped AS (
  SELECT DISTINCT l_orderkey FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '1996-06-30 00:00:00'
),
backlog AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(floor(epoch(TIMESTAMP '1996-06-30 00:00:00') - epoch(o_orderdate)) AS BIGINT) // 86400 AS age_days
  FROM orders
  WHERE o_orderdate <= TIMESTAMP '1996-06-30 00:00:00'
    AND o_orderkey NOT IN (SELECT l_orderkey FROM shipped)
)
SELECT o_orderpriority,
       CAST(CASE WHEN age_days < 30 THEN 0 WHEN age_days < 90 THEN 30
                 WHEN age_days < 180 THEN 90 ELSE 180 END AS INT) AS age_bucket,
       CAST(count(*) AS BIGINT) AS n_orders
FROM backlog
GROUP BY o_orderpriority, age_bucket
ORDER BY o_orderpriority, age_bucket
""",
)
def orders_backlog_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    ref = F.lit("1996-06-30 00:00:00").cast("timestamp")
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    shipped = (
        t["lineitem"].filter(F.col("l_shipdate") <= ref).select("l_orderkey").distinct()
    )
    backlog = (
        t["orders"]
        .filter(F.col("o_orderdate") <= ref)
        .join(shipped, F.col("o_orderkey") == F.col("l_orderkey"), "left_anti")
        .withColumn(
            "age_days",
            (F.floor(F.unix_timestamp(ref) - F.unix_timestamp("o_orderdate")) / 86400).cast(
                "long"
            ),
        )
    )
    bucket = (
        F.when(F.col("age_days") < 30, 0)
        .when(F.col("age_days") < 90, 30)
        .when(F.col("age_days") < 180, 90)
        .otherwise(180)
        .cast("int")
    )
    return (
        backlog.groupBy("o_orderpriority", bucket.alias("age_bucket"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority", "age_bucket")
    )


@register(
    "events_inter_arrival",
    doc="inter-arrival analysis: per-user event gap seconds via one lag "
    "window, then exact per-type median/p90 of the gaps -- the "
    "traffic-model readout (burstiness shows as p90 >> median).",
    oracle="""
WITH g AS (
  SELECT event_type,
         (epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)))::DOUBLE / 1000000 AS gap_sec
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_gaps,
       ROUND(median(gap_sec), 4) AS median_gap_sec,
       ROUND(quantile_cont(gap_sec, 0.9), 4) AS p90_gap_sec
FROM g WHERE gap_sec IS NOT NULL
GROUP BY event_type ORDER BY event_type
""",
)
def events_inter_arrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    micros = F.unix_micros("ts")
    g = ev.withColumn(
        "gap_sec", (micros - F.lag(micros).over(w)).cast("double") / 1e6
    ).filter(F.col("gap_sec").isNotNull())
    # rank-selection quantiles, not the exact median()/percentile()
    # aggregates whose buffers hold every gap of a type on one reducer
    # (operators/scan_quantile.py); one extra rollup-sized exchange
    from testlog_etl_spark.operators.scan_quantile import group_quantiles_exact

    qs = group_quantiles_exact(
        g.select("event_type", "gap_sec"),
        "event_type",
        "gap_sec",
        [0.5, 0.9],
        ["_med", "_p90"],
    )
    counts = g.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_gaps"))
    return (
        counts.join(qs, "event_type")
        .select(
            "event_type",
            "n_gaps",
            F.round(F.col("_med"), 4).alias("median_gap_sec"),
            F.round(F.col("_p90"), 4).alias("p90_gap_sec"),
        )
        .orderBy("event_type")
    )


@register(
    "agg_seasonal_index",
    doc="seasonal index per (event_type, month): month mean value over "
    "the type's grand mean (index 1.0 = typical month). Two rollups "
    "over one scan lineage joined on the tiny type key.",
    oracle="""
WITH m AS (
  SELECT event_type, CAST(date_trunc('month', ts) AS DATE) AS month,
         AVG("value") AS month_mean
  FROM events GROUP BY event_type, month
),
g AS (SELECT event_type, AVG("value") AS grand_mean FROM events GROUP BY event_type)
SELECT m.event_type AS event_type, month,
       ROUND(month_mean, 4) AS month_mean,
       ROUND(month_mean / grand_mean, 4) AS seasonal_index
FROM m JOIN g ON g.event_type = m.event_type
ORDER BY event_type, month
""",
)
def agg_seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    # month as DATE -- TZ-independent output (see agg_mom_growth note)
    m = ev.groupBy("event_type", F.date_trunc("month", "ts").cast("date").alias("month")).agg(
        F.avg("value").alias("month_mean")
    )
    g = ev.groupBy(F.col("event_type").alias("et")).agg(F.avg("value").alias("grand_mean"))
    return (
        m.join(F.broadcast(g), F.col("event_type") == F.col("et"))
        .select(
            "event_type",
            "month",
            F.round("month_mean", 4).alias("month_mean"),
            F.round(F.col("month_mean") / F.col("grand_mean"), 4).alias("seasonal_index"),
        )
        .orderBy("event_type", "month")
    )


@register(
    "dq_freshness_report",
    doc="data-freshness readout (the DQ suite's temporal sibling): per "
    "time-bearing table, row count, latest timestamp, and staleness "
    "hours vs each table's own reference horizon -- the page an "
    "on-call loads first. One metadata-light aggregate per table, "
    "unioned.",
    oracle="""
SELECT * FROM (
  SELECT 'events' AS tbl, CAST(count(*) AS BIGINT) AS n_rows,
         strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS latest,
         CAST(floor((epoch(TIMESTAMP '2024-02-01 00:00:00') - epoch(max(ts))) / 3600) AS BIGINT) AS staleness_h
  FROM events
  UNION ALL
  SELECT 'lineitem', count(*), strftime(max(l_shipdate), '%Y-%m-%d %H:%M:%S'),
         CAST(floor((epoch(TIMESTAMP '2002-01-01 00:00:00') - epoch(max(l_shipdate))) / 3600) AS BIGINT)
  FROM lineitem
  UNION ALL
  SELECT 'orders', count(*), strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S'),
         CAST(floor((epoch(TIMESTAMP '2002-01-01 00:00:00') - epoch(max(o_orderdate))) / 3600) AS BIGINT)
  FROM orders
)
ORDER BY tbl
""",
)
def dq_freshness_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("events", "lineitem", "orders"))

    def row(name: str, df: DataFrame, ts_col: str, ref: str) -> DataFrame:
        ref_c = F.lit(ref).cast("timestamp")
        return df.agg(
            F.lit(name).alias("tbl"),
            F.count(F.lit(1)).alias("n_rows"),
            # latest rendered as a UTC string: a raw timestamp output
            # re-renders through the collecting process's OS timezone
            # (r06 TZ sweep); the formatted wall time is TZ-independent
            F.date_format(F.max(ts_col), "yyyy-MM-dd HH:mm:ss").alias("latest"),
            F.floor(
                (F.unix_timestamp(ref_c) - F.unix_timestamp(F.max(ts_col))) / 3600
            ).cast("long").alias("staleness_h"),
        )

    return (
        row("events", t["events"], "ts", "2024-02-01 00:00:00")
        .unionByName(row("lineitem", t["lineitem"], "l_shipdate", "2002-01-01 00:00:00"))
        .unionByName(row("orders", t["orders"], "o_orderdate", "2002-01-01 00:00:00"))
        .orderBy("tbl")
    )


@register(
    "events_dau_mau",
    doc="DAU/MAU engagement: per month, the average daily-active count "
    "over the monthly-active count (the stickiness ratio). Per-(user, "
    "day) dedup first so every later count is a cheap rollup -- no "
    "windowed COUNT DISTINCT anywhere.",
    oracle="""
WITH ud AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(date_trunc('month', ts) AS DATE) AS month
  FROM events
),
dau AS (SELECT month, day, count(*)::DOUBLE AS dau FROM ud GROUP BY month, day),
mau AS (SELECT month, count(DISTINCT user_id)::BIGINT AS mau FROM ud GROUP BY month)
SELECT mau.month AS month, mau.mau,
       ROUND(AVG(dau.dau), 4) AS avg_dau,
       ROUND(AVG(dau.dau) / mau.mau, 4) AS stickiness
FROM dau JOIN mau ON mau.month = dau.month
GROUP BY mau.month, mau.mau
ORDER BY month
""",
)
def events_dau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    # day/month as DATE -- TZ-independent output (see agg_mom_growth note)
    ud = ev.select(
        "user_id",
        F.date_trunc("day", "ts").cast("date").alias("day"),
        F.date_trunc("month", "ts").cast("date").alias("month"),
    ).distinct()
    dau = ud.groupBy("month", "day").agg(F.count(F.lit(1)).cast("double").alias("dau"))
    mau = ud.select("month", "user_id").distinct().groupBy(F.col("month").alias("m")).agg(
        F.count(F.lit(1)).alias("mau")
    )
    return (
        dau.join(F.broadcast(mau), F.col("month") == F.col("m"))
        .groupBy("month", "mau")
        .agg(
            F.round(F.avg("dau"), 4).alias("avg_dau"),
            F.round(F.avg("dau") / F.any_value("mau"), 4).alias("stickiness"),
        )
        .select("month", "mau", "avg_dau", "stickiness")
        .orderBy("month")
    )


@register(
    "orders_cross_sell",
    doc="cross-sell matrix: part-type pairs bought in the SAME order, "
    "top 20 by co-occurrence. The self-join is order-local (fan-out "
    "bounded by lines-per-order), distinct types per order FIRST so a "
    "multi-line type counts once, part attributes broadcast.",
    oracle="""
WITH ot AS (
  SELECT DISTINCT l_orderkey, p_type
  FROM lineitem JOIN part ON p_partkey = l_partkey
),
pairs AS (
  SELECT a.p_type AS type_a, b.p_type AS type_b, count(*)::BIGINT AS n_orders
  FROM ot a JOIN ot b ON a.l_orderkey = b.l_orderkey AND a.p_type < b.p_type
  GROUP BY type_a, type_b
)
SELECT type_a, type_b, n_orders
FROM pairs
ORDER BY n_orders DESC, type_a, type_b
LIMIT 20
""",
)
def orders_cross_sell(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    ot = (
        t["lineitem"]
        .join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
        .select("l_orderkey", "p_type")
        .distinct()
    )
    a = ot.select(F.col("l_orderkey").alias("ok"), F.col("p_type").alias("type_a"))
    b = ot.select(F.col("l_orderkey").alias("ok2"), F.col("p_type").alias("type_b"))
    return (
        a.join(b, (F.col("ok") == F.col("ok2")) & (F.col("type_a") < F.col("type_b")))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), "type_a", "type_b")
        .limit(20)
    )


@register(
    "events_error_budget",
    doc="SLO error-budget burn: hourly error share vs a 1% budget, the "
    "burn-rate multiplier, and per-day budget consumption -- the "
    "alerting arithmetic behind multiwindow burn alerts, as one "
    "hourly rollup plus a daily re-aggregate.",
    oracle="""
WITH h AS (
  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
         count(*)::DOUBLE AS n,
         SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::DOUBLE AS errs
  FROM events GROUP BY hour
)
SELECT CAST(date_trunc('day', hour) AS DATE) AS day,
       CAST(SUM(n) AS BIGINT) AS n_events,
       CAST(SUM(errs) AS BIGINT) AS n_errors,
       ROUND(SUM(errs) / SUM(n), 4) AS error_rate,
       ROUND((SUM(errs) / SUM(n)) / 0.01, 4) AS burn_rate,
       ROUND(MAX(errs / n) / 0.01, 4) AS worst_hour_burn
FROM h GROUP BY day ORDER BY day
""",
)
def events_error_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    h = ev.groupBy(F.date_trunc("hour", "ts").alias("hour")).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("double")
        .alias("errs"),
    )
    return (
        # day as DATE -- TZ-independent output (see agg_mom_growth note)
        h.groupBy(F.date_trunc("day", "hour").cast("date").alias("day"))
        .agg(
            F.sum("n").cast("long").alias("n_events"),
            F.sum("errs").cast("long").alias("n_errors"),
            F.round(F.sum("errs") / F.sum("n"), 4).alias("error_rate"),
            F.round((F.sum("errs") / F.sum("n")) / 0.01, 4).alias("burn_rate"),
            F.round(F.max(F.col("errs") / F.col("n")) / 0.01, 4).alias("worst_hour_burn"),
        )
        .orderBy("day")
    )


@register(
    "forecast_seasonal_naive_mape",
    doc="forecast backtest: seasonal-naive model (per-type same-ISO-dow "
    "mean daily volume from the training window) evaluated on the "
    "final week with MAPE and bias -- the evaluation harness matters "
    "more than the model, and it is all exact rollups: train/test "
    "split by date, per-(type, dow) training means broadcast onto "
    "test days.",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(isodow(ts) AS INT) AS dow, count(*)::DOUBLE AS n
  FROM events GROUP BY event_type, day, dow
),
train AS (
  SELECT event_type, dow, AVG(n) AS pred
  FROM daily WHERE day < TIMESTAMP '2024-01-24 00:00:00' GROUP BY event_type, dow
),
test AS (SELECT * FROM daily WHERE day >= TIMESTAMP '2024-01-24 00:00:00')
SELECT test.event_type AS event_type,
       CAST(count(*) AS BIGINT) AS n_test_days,
       ROUND(AVG(abs(n - pred) / n), 4) AS mape,
       ROUND(AVG(pred - n), 4) AS mean_bias
FROM test JOIN train ON train.event_type = test.event_type AND train.dow = test.dow
GROUP BY test.event_type ORDER BY event_type
""",
)
def forecast_seasonal_naive_mape(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    cutoff = F.lit("2024-01-24 00:00:00").cast("timestamp")
    daily = ev.groupBy(
        "event_type",
        F.date_trunc("day", "ts").alias("day"),
        F.expr("extract(DAYOFWEEK_ISO FROM ts)").cast("int").alias("dow"),
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    train = (
        daily.filter(F.col("day") < cutoff)
        .groupBy(F.col("event_type").alias("et"), F.col("dow").alias("dw"))
        .agg(F.avg("n").alias("pred"))
    )
    test = daily.filter(F.col("day") >= cutoff)
    return (
        test.join(
            F.broadcast(train),
            (F.col("event_type") == F.col("et")) & (F.col("dow") == F.col("dw")),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_test_days"),
            F.round(F.avg(F.abs(F.col("n") - F.col("pred")) / F.col("n")), 4).alias("mape"),
            F.round(F.avg(F.col("pred") - F.col("n")), 4).alias("mean_bias"),
        )
        .orderBy("event_type")
    )


@register(
    "graph_degree_distribution",
    doc="degree distribution of the undirected event-transition graph "
    "(completes the graph-stats set beside components / PageRank / "
    "triangles): per-node degree from the deduped edge list, then the "
    "(degree, #nodes) histogram.",
    oracle="""
WITH raw AS (
  SELECT prev_type AS a, event_type AS b FROM (
    SELECT event_type,
           lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
    FROM events
  ) WHERE prev_type IS NOT NULL AND prev_type <> event_type
),
e AS (SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v FROM raw),
deg AS (
  SELECT node, count(*)::BIGINT AS degree FROM (
    SELECT u AS node FROM e UNION ALL SELECT v FROM e
  ) GROUP BY node
)
SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes
FROM deg GROUP BY degree ORDER BY degree
""",
)
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull() & (F.col("prev_type") != F.col("event_type")))
        .select(
            F.least("prev_type", "event_type").alias("u"),
            F.greatest("prev_type", "event_type").alias("v"),
        )
        .distinct()
    )
    nodes = e.select(F.col("u").alias("node")).unionAll(e.select(F.col("v").alias("node")))
    deg = nodes.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
    return (
        deg.groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .orderBy("degree")
    )


@register(
    "graph_subtree_rollup",
    doc="hierarchical (recursive-CTE) subtree rollup over the implicit "
    "binary doc hierarchy (parent = doc_id div 2): per ancestor, the "
    "proper-descendant count and subtree char mass. Spark-first "
    "restatement of WITH RECURSIVE: pointer DOUBLING closes depth 32 "
    "in 5 equi-join+distinct rounds -- log2(depth) jobs instead of a "
    "depth-long dependent chain (operators/hierarchy.py; the same "
    "doubling that drives dupgroups' connected components). Closure "
    "rows are 16-byte id pairs; the rollup is one hash aggregate.",
    oracle="""
WITH RECURSIVE anc(node, anc) AS (
  SELECT doc_id, doc_id // 2 FROM documents WHERE doc_id > 0
  UNION ALL
  SELECT node, anc // 2 FROM anc WHERE anc > 0
)
SELECT a.anc AS ancestor,
       count(*) AS n_desc,
       CAST(SUM(d.n_chars) AS BIGINT) AS subtree_value
FROM anc a JOIN documents d ON d.doc_id = a.node
GROUP BY a.anc
ORDER BY ancestor
""",
)
def graph_subtree_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from testlog_etl_spark.operators.hierarchy import subtree_rollup

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    out = subtree_rollup(
        docs,
        "doc_id",
        # integral division: `/` is double true-division, exact only for
        # ids < 2^53 -- `div` matches the oracle's `//` at any id scale
        parent=F.expr("doc_id div 2"),
        value=F.col("n_chars"),
        rounds=5,
    )
    return out.orderBy("ancestor")


@register(
    "etl_erasure_cascade",
    doc="right-to-erasure cascade audit (the governance delete every "
    "production pipeline needs): erasure set = customers with "
    "c_acctbal < -900; orders of those customers and lineitems of "
    "those orders purge transitively. Output: per-entity purged/kept "
    "counts -- the audit record a deletion job must emit. Scale "
    "shape: the erasure keyset is a tiny filtered dimension -- both "
    "cascades are BROADCAST semi/anti joins against it, so the fact "
    "tables never shuffle; at 100 TB this is one scan per table.",
    oracle="""
WITH erased AS (SELECT c_custkey FROM customer WHERE c_acctbal < -900),
eo AS (SELECT o_orderkey FROM orders WHERE o_custkey IN (SELECT c_custkey FROM erased)),
rows_ AS (
  SELECT 'customer' AS entity,
         (SELECT count(*) FROM erased) AS purged,
         (SELECT count(*) FROM customer) - (SELECT count(*) FROM erased) AS kept
  UNION ALL
  SELECT 'orders',
         (SELECT count(*) FROM eo),
         (SELECT count(*) FROM orders) - (SELECT count(*) FROM eo)
  UNION ALL
  SELECT 'lineitem',
         (SELECT count(*) FROM lineitem WHERE l_orderkey IN (SELECT o_orderkey FROM eo)),
         (SELECT count(*) FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM eo))
)
SELECT entity, purged, kept FROM rows_ ORDER BY entity
""",
)
def etl_erasure_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer", "orders", "lineitem"))
    cust, orders, li = t["customer"], t["orders"], t["lineitem"]
    erased = cust.where(F.col("c_acctbal") < -900).select("c_custkey")
    eo = orders.join(
        F.broadcast(erased), orders["o_custkey"] == erased["c_custkey"], "left_semi"
    ).select("o_orderkey")
    n_cust = cust.count()
    n_erased = erased.count()
    n_orders = orders.count()
    n_eo = eo.count()
    # the order keyset of an erasure batch is bounded (it is the fan-out
    # of a human-scale request set), so broadcasting it is the plan you
    # want at any fact-table size
    li_purged = li.join(
        F.broadcast(eo), li["l_orderkey"] == eo["o_orderkey"], "left_semi"
    ).count()
    n_li = li.count()
    rows = [
        ("customer", n_erased, n_cust - n_erased),
        ("orders", n_eo, n_orders - n_eo),
        ("lineitem", li_purged, n_li - li_purged),
    ]
    out = spark.createDataFrame(rows, "entity string, purged long, kept long")
    return out.orderBy("entity")


@register(
    "events_retention_cohorts",
    doc="cohort retention matrix: users cohorted by the week of their "
    "first event (integer week index from the 2024-01-01 Monday "
    "anchor -- no engine week-numbering conventions in play), then "
    "for each (cohort, week-offset) the share of the cohort active "
    "that week. Two rollups over one distinct (user, week) activity "
    "frame + a broadcast-sized cohort dimension join -- the weekly "
    "grain frame is |users|x|weeks|, already reduced before any join. "
    "The product-analytics readout behind every growth dashboard.",
    oracle="""
WITH act AS (
  SELECT DISTINCT user_id,
         datediff('day', DATE '2024-01-01', ts::DATE) // 7 AS week
  FROM events
),
cohort AS (SELECT user_id, MIN(week) AS cw FROM act GROUP BY user_id),
size_ AS (SELECT cw, count(*) AS n_cohort FROM cohort GROUP BY cw),
ret AS (
  SELECT c.cw AS cohort_week, a.week - c.cw AS week_offset,
         count(*) AS n_active
  FROM act a JOIN cohort c USING (user_id)
  GROUP BY c.cw, a.week - c.cw
)
SELECT r.cohort_week, r.week_offset, r.n_active,
       ROUND(r.n_active * 1.0 / s.n_cohort, 4) AS retention
FROM ret r JOIN size_ s ON s.cw = r.cohort_week
ORDER BY cohort_week, week_offset
""",
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    act = ev.select(
        "user_id",
        F.floor(
            F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")) / 7
        ).cast("long").alias("week"),
    ).distinct()
    cohort = act.groupBy("user_id").agg(F.min("week").alias("cw"))
    size = cohort.groupBy("cw").agg(F.count(F.lit(1)).alias("n_cohort"))
    ret = (
        act.join(cohort, "user_id")
        .groupBy(F.col("cw").alias("cohort_week"), (F.col("week") - F.col("cw")).alias("week_offset"))
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    return (
        ret.join(
            F.broadcast(size), ret["cohort_week"] == size["cw"]
        )
        .select(
            "cohort_week",
            "week_offset",
            "n_active",
            F.round(F.col("n_active") / F.col("n_cohort"), 4).alias("retention"),
        )
        .orderBy("cohort_week", "week_offset")
    )


@register(
    "graph_bfs_reach",
    doc="iterative multi-source BFS (operators/dupgroups.py::bfs_levels) "
    "-- Spark's restatement of the recursive CTE it lacks. Graph: the "
    "doc_id binary tree (i -> 2i, 2i+1, the subtree-rollup hierarchy) "
    "plus +37 skip links, undirected, so minimum-hop levels genuinely "
    "require BFS (skips beat tree paths for far nodes). Seed: doc 1, "
    "12-round cap. The oracle replays it as WITH RECURSIVE enumerating "
    "all paths up to the cap and taking min(lvl) -- exact on integer "
    "levels, proving frontier expansion visits each node at its true "
    "minimum distance. Per round: one frontier><edges equi-join (AQE "
    "broadcasts the frontier while it fits) + one anti-join; driver "
    "sees only the emptiness bit.",
    oracle="""
WITH RECURSIVE
mx AS (SELECT max(doc_id) AS m FROM documents),
e0 AS (
  SELECT doc_id AS src, doc_id * 2 AS dst FROM documents
  WHERE doc_id >= 1 AND doc_id * 2 <= (SELECT m FROM mx)
  UNION ALL
  SELECT doc_id, doc_id * 2 + 1 FROM documents
  WHERE doc_id >= 1 AND doc_id * 2 + 1 <= (SELECT m FROM mx)
  UNION ALL
  SELECT doc_id, doc_id + 37 FROM documents
  WHERE doc_id + 37 <= (SELECT m FROM mx)
),
e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
r AS (
  SELECT CAST(1 AS BIGINT) AS node, 0 AS lvl
  UNION
  SELECT e.dst, r.lvl + 1 FROM r JOIN e ON e.src = r.node WHERE r.lvl < 12
)
SELECT node, CAST(min(lvl) AS INT) AS lvl FROM r GROUP BY node ORDER BY node
""",
)
def graph_bfs_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    from testlog_etl_spark.operators.dupgroups import bfs_levels

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    ids = docs.select("doc_id")
    mx = ids.agg(F.max("doc_id").alias("_m"))
    base = ids.crossJoin(F.broadcast(mx))
    e0 = (
        base.filter((F.col("doc_id") >= 1) & (F.col("doc_id") * 2 <= F.col("_m")))
        .select(F.col("doc_id").alias("src"), (F.col("doc_id") * 2).alias("dst"))
        .union(
            base.filter((F.col("doc_id") >= 1) & (F.col("doc_id") * 2 + 1 <= F.col("_m")))
            .select(F.col("doc_id").alias("src"), (F.col("doc_id") * 2 + 1).alias("dst"))
        )
        .union(
            base.filter(F.col("doc_id") + 37 <= F.col("_m"))
            .select(F.col("doc_id").alias("src"), (F.col("doc_id") + 37).alias("dst"))
        )
    )
    edges = e0.union(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct()
    seeds = ids.filter(F.col("doc_id") == 1).select(F.col("doc_id").alias("node"))
    return bfs_levels(edges, seeds, max_iter=12).orderBy("node")


@register(
    "events_longest_streak",
    doc="longest consecutive-active-day streak per user: the classic "
    "gaps-and-islands shape -- per-(user, day) dedup, then day_index "
    "minus ROW_NUMBER as the island key (constant within a run of "
    "consecutive days), one rollup per island, max per user with the "
    "EARLIEST streak start as the deterministic tiebreak. All windows "
    "partitioned by user_id; integer day arithmetic end to end.",
    oracle="""
WITH d AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day FROM events
),
g AS (
  SELECT user_id, day,
         date_diff('day', DATE '2024-01-01', day)
           - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS isl
  FROM d
),
s AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS len, min(day) AS start_day
  FROM g GROUP BY user_id, isl
)
SELECT user_id, len AS longest_streak, start_day AS streak_start
FROM (
  SELECT user_id, len, start_day,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY len DESC, start_day) AS rn
  FROM s
) WHERE rn = 1
ORDER BY user_id
""",
)
def events_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    d = ev.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    g = d.withColumn(
        "isl",
        F.datediff("day", F.lit("2024-01-01").cast("date")) - F.row_number().over(w),
    )
    s = g.groupBy("user_id", "isl").agg(
        F.count(F.lit(1)).alias("len"), F.min("day").alias("start_day")
    )
    pick = Window.partitionBy("user_id").orderBy(F.desc("len"), "start_day")
    return (
        s.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("len").alias("longest_streak"),
            F.col("start_day").alias("streak_start"),
        )
        .orderBy("user_id")
    )


def _jaro_winkler_oracle() -> str:
    from testlog_etl_spark import oracles as _osql

    h = _osql.xxh64_sql("p_name || ':jw'")
    return f"""
WITH names AS (SELECT DISTINCT p_name FROM part WHERE p_name IS NOT NULL),
dirty AS (
  SELECT p_name AS orig_name,
         CASE WHEN (({h}) % 2 + 2) % 2 = 0
              THEN substr(p_name, 1, length(p_name) - 1)
              ELSE substr(p_name, 1, 2) || substr(p_name, 4, 1)
                   || substr(p_name, 3, 1) || substr(p_name, 5)
         END AS dirty_name
  FROM names
)
SELECT d.orig_name, d.dirty_name, c.p_name AS clean_name,
       ROUND(jaro_winkler_similarity(d.dirty_name, c.p_name), 4) AS jw
FROM dirty d JOIN names c ON substr(d.dirty_name, 1, 2) = substr(c.p_name, 1, 2)
WHERE jaro_winkler_similarity(d.dirty_name, c.p_name) >= 0.9
ORDER BY orig_name, clean_name
"""


@register(
    "join_jaro_winkler",
    doc="fuzzy string matching for entity resolution "
    "(operators/strsim.py::jaro_winkler, Arrow-batched pandas UDF "
    "implementing the standard Winkler-boosted Jaro -- bit-compatible "
    "with DuckDB's builtin, the oracle engine scores with "
    "jaro_winkler_similarity while Spark scores in the UDF and the "
    "driver hash requires identical decisions at the 0.9 threshold). "
    "A deterministically corrupted catalog (drop-last-char or "
    "swap-chars-3-4 by hash parity; first 2 chars always preserved) is "
    "matched back to the clean name list, BLOCKED on first-2-char "
    "equality -- the standard trade: the UDF scores block candidates, "
    "never the crossjoin, and the join is lossless exactly because the "
    "corruption model preserves the block key.",
    oracle=None,  # generated below: needs the xxh64 SQL twin
)
def join_jaro_winkler(spark: SparkSession, sf_dir: str) -> DataFrame:
    from testlog_etl_spark.operators.strsim import jaro_winkler

    part = load_tables(spark, sf_dir, ("part",))["part"]
    names = part.filter(F.col("p_name").isNotNull()).select("p_name").distinct()
    even = F.pmod(F.xxhash64(F.concat(F.col("p_name"), F.lit(":jw"))), F.lit(2)) == 0
    dirty = names.select(
        F.col("p_name").alias("orig_name"),
        F.when(
            even, F.expr("substring(p_name, 1, length(p_name) - 1)")
        )
        .otherwise(
            F.concat(
                F.substring("p_name", 1, 2),
                F.substring("p_name", 4, 1),
                F.substring("p_name", 3, 1),
                F.expr("substring(p_name, 5)"),
            )
        )
        .alias("dirty_name"),
    )
    clean = names.select(F.col("p_name").alias("clean_name"))
    cand = dirty.join(
        clean,
        F.substring("dirty_name", 1, 2) == F.substring("clean_name", 1, 2),
    ).withColumn("jw", jaro_winkler(F.col("dirty_name"), F.col("clean_name")))
    return (
        cand.filter(F.col("jw") >= 0.9)
        .select("orig_name", "dirty_name", "clean_name", F.round("jw", 4).alias("jw"))
        .orderBy("orig_name", "clean_name")
    )


from testlog_etl_spark.suite import REGISTRY as _ETL_REG  # noqa: E402

_ETL_REG["join_jaro_winkler"].oracle = _jaro_winkler_oracle()


@register(
    "events_trigram_paths",
    doc="top user-journey trigrams: consecutive event_type triples per "
    "user (two leads over ONE per-user exchange), counted corpus-wide, "
    "top 15 with (count desc, path) determinism -- the Sankey/flow "
    "readout beside transition_matrix's bigram stationary view.",
    oracle="""
WITH t AS (
  SELECT user_id, event_type,
         lead(event_type, 1) OVER w AS e2,
         lead(event_type, 2) OVER w AS e3
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT event_type || '>' || e2 || '>' || e3 AS path, count(*)::BIGINT AS n
FROM t WHERE e3 IS NOT NULL
GROUP BY path ORDER BY n DESC, path LIMIT 15
""",
)
def events_trigram_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e3").isNotNull())
    return (
        t.select(F.concat_ws(">", "event_type", "e2", "e3").alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "path")
        .limit(15)
    )


@register(
    "events_cooccurrence_pmi",
    doc="pointwise mutual information of event-type pairs co-occurring "
    "in the same user-day: the association readout between "
    "transition_matrix (sequential) and stats_mutual_info (global). "
    "Per-(user, day) distinct types first, order-canonical pairs "
    "(a < b), marginals off the same rollup; pmi = log2(p_ab/(p_a "
    "p_b)) with all probabilities over the user-day universe.",
    oracle="""
WITH ud AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day, event_type
  FROM events
),
n AS (SELECT count(DISTINCT (user_id, day)) ::DOUBLE AS n FROM ud),
m AS (SELECT event_type, count(*)::DOUBLE AS n_t FROM ud GROUP BY event_type),
p AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, count(*)::DOUBLE AS n_ab
  FROM ud a JOIN ud b
    ON a.user_id = b.user_id AND a.day = b.day AND a.event_type < b.event_type
  GROUP BY type_a, type_b
)
SELECT p.type_a, p.type_b, CAST(p.n_ab AS BIGINT) AS n_ab,
       ROUND(ln((p.n_ab / n.n) / ((ma.n_t / n.n) * (mb.n_t / n.n))) / ln(2.0), 4) AS pmi
FROM p
JOIN m ma ON ma.event_type = p.type_a
JOIN m mb ON mb.event_type = p.type_b
CROSS JOIN n
ORDER BY type_a, type_b
""",
)
def events_cooccurrence_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    ud = ev.select(
        "user_id",
        F.date_trunc("day", "ts").cast("date").alias("day"),
        "event_type",
    ).distinct()
    n = ud.select("user_id", "day").distinct().agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    m = ud.groupBy("event_type").agg(F.count(F.lit(1)).cast("double").alias("n_t"))
    a = ud.select("user_id", "day", F.col("event_type").alias("type_a"))
    b = ud.select(
        F.col("user_id").alias("u2"), F.col("day").alias("d2"), F.col("event_type").alias("type_b")
    )
    p = (
        a.join(
            b,
            (F.col("user_id") == F.col("u2"))
            & (F.col("day") == F.col("d2"))
            & (F.col("type_a") < F.col("type_b")),
        )
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("double").alias("n_ab"))
    )
    ma = m.select(F.col("event_type").alias("_ta"), F.col("n_t").alias("na"))
    mb = m.select(F.col("event_type").alias("_tb"), F.col("n_t").alias("nb"))
    pmi = (
        F.log((F.col("n_ab") / F.col("n")) / ((F.col("na") / F.col("n")) * (F.col("nb") / F.col("n"))))
        / F.log(F.lit(2.0))
    )
    return (
        p.join(F.broadcast(ma), F.col("type_a") == F.col("_ta"))
        .join(F.broadcast(mb), F.col("type_b") == F.col("_tb"))
        .crossJoin(F.broadcast(n))
        .select(
            "type_a",
            "type_b",
            F.col("n_ab").cast("long").alias("n_ab"),
            F.round(pmi, 4).alias("pmi"),
        )
        .orderBy("type_a", "type_b")
    )


@register(
    "udtf_token_chunks",
    doc="Python UDTF surface (Spark 4 @udtf, SURVEY 2.10): a table "
    "function chunking each doc into 40-token pieces with index and "
    "length, invoked via SQL LATERAL -- the arbitrary-Python-transform "
    "escape hatch when array intrinsics won't do (here they would: "
    "text_chunk_overlap is the intrinsic twin; this pins the UDTF "
    "API). Tokenization matches textstats.tokens (trimmed whitespace "
    "split, empty-free) so the DuckDB unnest-range twin is exact.",
    oracle="""
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') AS w
  FROM documents WHERE text IS NOT NULL
),
c AS (
  SELECT doc_id, i AS chunk_idx,
         array_to_string(w[(i * 40 + 1):((i + 1) * 40)], ' ') AS chunk_text,
         len(w[(i * 40 + 1):((i + 1) * 40)])::BIGINT AS n_tok
  FROM t, LATERAL (SELECT unnest(range(0, CAST(ceil(len(w) / 40.0) AS BIGINT))) AS i)
)
SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx, n_tok, chunk_text
FROM c ORDER BY doc_id, chunk_idx
""",
)
def udtf_token_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, n_tok long, chunk_text string")
    class TokenChunker:
        def eval(self, text: str):
            if text is None:
                return
            toks = text.strip().split()
            for i in range(0, len(toks), 40):
                piece = toks[i : i + 40]
                yield i // 40, len(piece), " ".join(piece)

    spark.udtf.register("token_chunker", TokenChunker)
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    docs.createOrReplaceTempView("_udtf_docs")
    out = spark.sql(
        """
        SELECT doc_id, c.chunk_idx, c.n_tok, c.chunk_text
        FROM _udtf_docs, LATERAL token_chunker(text) c
        WHERE text IS NOT NULL
        """
    )
    return out.orderBy("doc_id", "chunk_idx")


@register(
    "events_bitmap_retention",
    doc="week-over-week retention WITHOUT a distinct join: weekly user "
    "bitmaps (operators/sketches.py::bitmap_words, exact for dense int "
    "ids), consecutive weeks intersected by word-aligned AND + "
    "popcount. Raw rows are touched once to build sketches; the "
    "retention matrix is sketch-row joins -- occupancy-bounded, the "
    "readout pattern that makes N-week retention O(weeks^2 * words), "
    "never O(weeks^2 * users). Oracle recomputes exact distinct "
    "intersections the row way.",
    oracle="""
WITH d AS (
  SELECT datediff('day', DATE '2024-01-01', CAST(date_trunc('day', ts) AS DATE)) // 7 AS week,
         user_id
  FROM events
),
u AS (SELECT DISTINCT week, user_id FROM d),
base AS (SELECT week, count(*) AS n FROM u GROUP BY week),
ret AS (
  SELECT a.week AS week, count(*) AS n_ret
  FROM u a JOIN u b ON b.user_id = a.user_id AND b.week = a.week + 1
  GROUP BY a.week
)
SELECT base.week AS week,
       CAST(base.n AS BIGINT) AS n_active,
       CAST(COALESCE(ret.n_ret, 0) AS BIGINT) AS n_retained_next,
       ROUND(COALESCE(ret.n_ret, 0) / base.n::DOUBLE, 4) AS retention_next_week
FROM base LEFT JOIN ret ON ret.week = base.week
ORDER BY week
""",
)
def events_bitmap_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    from testlog_etl_spark.operators.sketches import bitmap_merge_distinct, bitmap_words

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    wk = ev.select(
        F.expr(
            "datediff(CAST(date_trunc('day', ts) AS DATE), DATE '2024-01-01') div 7"
        ).alias("week"),
        "user_id",
    )
    words = bitmap_words(wk, ["week"], "user_id")
    base = bitmap_merge_distinct(words, ["week"], out="n_active")
    a = words.select("week", "_w", F.col("_bits").alias("b1"))
    b = words.select((F.col("week") - 1).alias("wk2"), F.col("_w").alias("w2"), F.col("_bits").alias("b2"))
    inter = (
        a.join(b, (F.col("week") == F.col("wk2")) & (F.col("_w") == F.col("w2")))
        .select("week", F.bit_count(F.col("b1").bitwiseAND(F.col("b2"))).alias("c"))
        .groupBy("week")
        .agg(F.sum("c").cast("long").alias("n_ret"))
    )
    return (
        base.join(inter, "week", "left")
        .select(
            "week",
            "n_active",
            F.coalesce("n_ret", F.lit(0)).alias("n_retained_next"),
            F.round(
                F.coalesce("n_ret", F.lit(0)) / F.col("n_active").cast("double"), 4
            ).alias("retention_next_week"),
        )
        .orderBy("week")
    )


def _kcore_oracle(k: int = 4, n_rounds: int = 5) -> str:
    blocks = [
        """mx AS (SELECT max(doc_id) AS m FROM documents),
e_raw AS (
  SELECT doc_id AS src, doc_id * 2 AS dst FROM documents
  WHERE doc_id >= 1 AND doc_id * 2 <= (SELECT m FROM mx)
  UNION ALL
  SELECT doc_id, doc_id * 2 + 1 FROM documents
  WHERE doc_id >= 1 AND doc_id * 2 + 1 <= (SELECT m FROM mx)
  UNION ALL
  SELECT doc_id, doc_id + 37 FROM documents
  WHERE doc_id + 37 <= (SELECT m FROM mx)
),
e0 AS (SELECT src, dst FROM e_raw UNION SELECT dst, src FROM e_raw)"""
    ]
    for i in range(1, n_rounds + 1):
        prev = f"e{i - 1}"
        blocks.append(
            f"""d{i} AS (SELECT src, count(*) AS deg FROM {prev} GROUP BY src),
a{i} AS (SELECT src AS node FROM d{i} WHERE deg >= {k}),
e{i} AS (
  SELECT e.src, e.dst FROM {prev} e
  JOIN a{i} s ON s.node = e.src
  JOIN a{i} t ON t.node = e.dst
)"""
        )
    body = ",\n".join(blocks)
    return f"""
WITH {body}
SELECT src AS node, count(*)::BIGINT AS deg
FROM e{n_rounds} GROUP BY src HAVING count(*) >= {k}
ORDER BY node
"""


@register(
    "graph_kcore",
    doc="k-core decomposition by bounded peeling (operators/dupgroups"
    ".py::kcore_peel): 5 rounds of drop-degree<4 / restrict-edges over "
    "the doc-tree + skip-link graph (the graph_bfs_reach edge set) -- "
    "the iterative-cascade sibling of BFS, replayed exactly by chained "
    "CTEs (fixed rounds, so the oracle IS the computation). Per round "
    "one node-keyed degree aggregate + two semi-joins; survivor count "
    "is monotone decreasing so round cost burns down with the cascade.",
    oracle=_kcore_oracle(),
)
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from testlog_etl_spark.operators.dupgroups import kcore_peel

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    ids = docs.select("doc_id")
    mx = ids.agg(F.max("doc_id").alias("_m"))
    base = ids.crossJoin(F.broadcast(mx))
    e0 = (
        base.filter((F.col("doc_id") >= 1) & (F.col("doc_id") * 2 <= F.col("_m")))
        .select(F.col("doc_id").alias("src"), (F.col("doc_id") * 2).alias("dst"))
        .union(
            base.filter((F.col("doc_id") >= 1) & (F.col("doc_id") * 2 + 1 <= F.col("_m")))
            .select(F.col("doc_id").alias("src"), (F.col("doc_id") * 2 + 1).alias("dst"))
        )
        .union(
            base.filter(F.col("doc_id") + 37 <= F.col("_m"))
            .select(F.col("doc_id").alias("src"), (F.col("doc_id") + 37).alias("dst"))
        )
    )
    edges = e0.union(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct()
    return kcore_peel(edges, k=4, n_rounds=5).select(
        "node", F.col("deg").cast("long").alias("deg")
    ).orderBy("node")


@register(
    "events_behavior_entropy",
    doc="behavioral entropy per user (Shannon, bits, over the user's "
    "event-type mix) rolled into a 0.25-wide histogram -- the "
    "user-diversity readout beside DAU/MAU. Two keyed rollups "
    "((user, type) then user) + one tiny histogram aggregate; entropy "
    "terms are exact count ratios so both engines compute identical "
    "sums before the presentation round.",
    oracle="""
WITH c AS (
  SELECT user_id, event_type, count(*)::DOUBLE AS n
  FROM events GROUP BY user_id, event_type
),
t AS (SELECT user_id, SUM(n) AS tot FROM c GROUP BY user_id),
h AS (
  SELECT c.user_id,
         -SUM((c.n / t.tot) * ln(c.n / t.tot) / ln(2.0)) AS ent
  FROM c JOIN t ON t.user_id = c.user_id
  GROUP BY c.user_id
)
SELECT CAST(floor(ent / 0.25) AS BIGINT) AS bucket,
       count(*)::BIGINT AS n_users,
       ROUND(AVG(ent), 4) AS avg_entropy
FROM h GROUP BY bucket ORDER BY bucket
""",
)
def events_behavior_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    c = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).cast("double").alias("n"))
    t = c.groupBy(F.col("user_id").alias("_u")).agg(F.sum("n").alias("tot"))
    p = F.col("n") / F.col("tot")
    h = (
        c.join(t, F.col("user_id") == F.col("_u"))
        .groupBy("user_id")
        .agg((-F.sum(p * F.log(p) / F.log(F.lit(2.0)))).alias("ent"))
    )
    return (
        h.groupBy(F.floor(F.col("ent") / 0.25).cast("long").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.round(F.avg("ent"), 4).alias("avg_entropy"),
        )
        .orderBy("bucket")
    )


@register(
    "eval_offline_policy_ips",
    doc="offline policy evaluation by inverse propensity scoring: "
    "logged (event_type = action, value = reward) pairs score three "
    "candidate always-X policies -- IPS value = mean(reward * "
    "1[a = pi(x)] / p_behavior(a)) with the behavior propensity "
    "estimated as the global action share from the SAME log. The "
    "counterfactual readout an ML platform runs before an online "
    "test; exact count-ratio arithmetic, one log scan + a broadcast "
    "3-row propensity table.",
    oracle="""
WITH p AS (
  SELECT event_type, count(*)::DOUBLE / (SELECT count(*) FROM events) AS prop
  FROM events GROUP BY event_type
),
pol AS (SELECT unnest(['view', 'click', 'purchase']) AS policy),
s AS (
  SELECT pol.policy,
         SUM(CASE WHEN e.event_type = pol.policy THEN e."value" / p.prop ELSE 0 END) AS ips_sum,
         SUM(CASE WHEN e.event_type = pol.policy THEN 1 ELSE 0 END)::BIGINT AS n_matched,
         SUM(CASE WHEN e.event_type = pol.policy THEN e."value" ELSE 0 END) AS r_sum,
         count(*)::DOUBLE AS n
  FROM events e JOIN p ON p.event_type = e.event_type CROSS JOIN pol
  GROUP BY pol.policy
)
SELECT policy, n_matched,
       ROUND(ips_sum / n, 4) AS ips_value,
       ROUND(r_sum / greatest(n_matched, 1), 4) AS matched_mean_reward
FROM s ORDER BY policy
""",
)
def eval_offline_policy_ips(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    tot = ev.agg(F.count(F.lit(1)).cast("double").alias("_tot"))
    p = (
        ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("double").alias("_c"))
        .crossJoin(F.broadcast(tot))
        .select("event_type", (F.col("_c") / F.col("_tot")).alias("prop"))
    )
    pol = ev.sparkSession.createDataFrame(
        [("view",), ("click",), ("purchase",)], "policy string"
    )
    s = (
        ev.join(F.broadcast(p), "event_type")
        .crossJoin(F.broadcast(pol))
        .groupBy("policy")
        .agg(
            F.sum(
                F.when(F.col("event_type") == F.col("policy"), F.col("value") / F.col("prop")).otherwise(0.0)
            ).alias("ips_sum"),
            F.sum(
                F.when(F.col("event_type") == F.col("policy"), 1).otherwise(0)
            ).cast("long").alias("n_matched"),
            F.sum(
                F.when(F.col("event_type") == F.col("policy"), F.col("value")).otherwise(0.0)
            ).alias("r_sum"),
            F.count(F.lit(1)).cast("double").alias("n"),
        )
    )
    return s.select(
        "policy",
        "n_matched",
        F.round(F.col("ips_sum") / F.col("n"), 4).alias("ips_value"),
        F.round(F.col("r_sum") / F.greatest(F.col("n_matched").cast("double"), F.lit(1.0)), 4).alias(
            "matched_mean_reward"
        ),
    ).orderBy("policy")


@register(
    "events_trailing_distinct_bitmap",
    doc="trailing-7-day DISTINCT users per day -- the windowed COUNT "
    "DISTINCT that defeats plain windows at scale (distinct doesn't "
    "decompose) -- solved with the mergeable bitmap sketch: daily user "
    "bitmaps built once (one occupancy-bounded exchange), then each "
    "day ORs its 7 trailing days' WORDS and popcounts. Work is "
    "O(days x 7 x occupied words), independent of raw row count after "
    "the sketch pass; the oracle recomputes each window's exact "
    "distinct the row way.",
    oracle="""
WITH d AS (
  SELECT datediff('day', DATE '2024-01-01', CAST(date_trunc('day', ts) AS DATE)) AS day,
         user_id
  FROM events
),
u AS (SELECT DISTINCT day, user_id FROM d),
days AS (SELECT DISTINCT day FROM u)
SELECT days.day,
       (SELECT count(DISTINCT u.user_id) FROM u
        WHERE u.day BETWEEN days.day - 6 AND days.day)::BIGINT AS trailing7_distinct
FROM days ORDER BY day
""",
)
def events_trailing_distinct_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from testlog_etl_spark.operators.sketches import bitmap_words

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    d = ev.select(
        F.datediff(
            F.date_trunc("day", "ts").cast("date"), F.lit("2024-01-01").cast("date")
        ).alias("day"),
        "user_id",
    )
    words = bitmap_words(d, ["day"], "user_id")
    days = words.select("day").distinct()
    # day joins its 7 trailing sketch days: a range join on the tiny
    # (day, word) sketch frame, never on raw rows
    w2 = words.select(
        F.col("day").alias("sday"), F.col("_w"), F.col("_bits")
    )
    merged = (
        days.join(
            w2,
            (F.col("sday") >= F.col("day") - 6) & (F.col("sday") <= F.col("day")),
        )
        .groupBy("day", "_w")
        .agg(F.bit_or("_bits").alias("_m"))
        .groupBy("day")
        .agg(F.sum(F.bit_count("_m")).cast("long").alias("trailing7_distinct"))
    )
    return merged.orderBy("day")


@register(
    "join_null_safe_semantics",
    doc="null-safe vs standard equi-join, the semantic trap spelled "
    "out: a derived nullable key (NULLIF(lang, 'de')) joins two corpus "
    "halves under `=` (SQL 3VL -- NULL keys match NOTHING, rows "
    "silently drop) and under `<=>` / IS NOT DISTINCT FROM (NULL is a "
    "join value). The per-key match counts differ exactly on the NULL "
    "row; at scale the null-safe form also concentrates every NULL in "
    "one shuffle partition -- the skew note callers need.",
    oracle="""
WITH a AS (
  SELECT doc_id, NULLIF(lang, 'de') AS k FROM documents WHERE doc_id % 2 = 0
),
b AS (
  SELECT doc_id, NULLIF(lang, 'de') AS k FROM documents WHERE doc_id % 2 = 1
),
std AS (SELECT a.k AS k, count(*) AS n FROM a JOIN b ON a.k = b.k GROUP BY a.k),
ns AS (
  SELECT a.k AS k, count(*) AS n
  FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k GROUP BY a.k
)
SELECT ns.k AS join_key,
       CAST(coalesce(std.n, 0) AS BIGINT) AS n_standard,
       CAST(ns.n AS BIGINT) AS n_null_safe
FROM ns LEFT JOIN std ON std.k IS NOT DISTINCT FROM ns.k
ORDER BY join_key NULLS FIRST
""",
)
def join_null_safe_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    k = F.expr("NULLIF(lang, 'de')")
    a = docs.filter(F.col("doc_id") % 2 == 0).select(k.alias("ka"))
    b = docs.filter(F.col("doc_id") % 2 == 1).select(k.alias("kb"))
    std = (
        a.join(b, F.col("ka") == F.col("kb"))
        .groupBy(F.col("ka").alias("k1"))
        .agg(F.count(F.lit(1)).alias("n_std"))
    )
    ns = (
        a.join(b, F.col("ka").eqNullSafe(F.col("kb")))
        .groupBy(F.col("ka").alias("k2"))
        .agg(F.count(F.lit(1)).alias("n_ns"))
    )
    return (
        ns.join(std, F.col("k2").eqNullSafe(F.col("k1")), "left")
        .select(
            F.col("k2").alias("join_key"),
            F.coalesce("n_std", F.lit(0)).alias("n_standard"),
            F.col("n_ns").alias("n_null_safe"),
        )
        .orderBy(F.col("join_key").asc_nulls_first())
    )


@register(
    "graph_degree_assortativity",
    doc="degree assortativity of the doc-tree + skip-link graph "
    "(the graph_bfs_reach edge set): Pearson correlation of endpoint "
    "degrees over edges -- do high-degree nodes link to high-degree "
    "nodes? One degree rollup joined back to both endpoints (the "
    "degree table is |V| rows of two longs; AQE broadcasts it), corr "
    "via the same single-scan moment aggregate as stats_correlation.",
    oracle="""
WITH mx AS (SELECT max(doc_id) AS m FROM documents),
e_raw AS (
  SELECT doc_id AS src, doc_id * 2 AS dst FROM documents
  WHERE doc_id >= 1 AND doc_id * 2 <= (SELECT m FROM mx)
  UNION ALL
  SELECT doc_id, doc_id * 2 + 1 FROM documents
  WHERE doc_id >= 1 AND doc_id * 2 + 1 <= (SELECT m FROM mx)
  UNION ALL
  SELECT doc_id, doc_id + 37 FROM documents
  WHERE doc_id + 37 <= (SELECT m FROM mx)
),
e AS (SELECT src, dst FROM e_raw UNION SELECT dst, src FROM e_raw),
d AS (SELECT src AS node, count(*)::DOUBLE AS deg FROM e GROUP BY src)
SELECT count(*)::BIGINT AS n_edges,
       ROUND(AVG(ds.deg), 4) AS mean_src_deg,
       ROUND(corr(ds.deg, dd.deg), 4) AS assortativity
FROM e JOIN d ds ON ds.node = e.src JOIN d dd ON dd.node = e.dst
""",
)
def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    ids = docs.select("doc_id")
    mx = ids.agg(F.max("doc_id").alias("_m"))
    base = ids.crossJoin(F.broadcast(mx))
    e0 = (
        base.filter((F.col("doc_id") >= 1) & (F.col("doc_id") * 2 <= F.col("_m")))
        .select(F.col("doc_id").alias("src"), (F.col("doc_id") * 2).alias("dst"))
        .union(
            base.filter((F.col("doc_id") >= 1) & (F.col("doc_id") * 2 + 1 <= F.col("_m")))
            .select(F.col("doc_id").alias("src"), (F.col("doc_id") * 2 + 1).alias("dst"))
        )
        .union(
            base.filter(F.col("doc_id") + 37 <= F.col("_m"))
            .select(F.col("doc_id").alias("src"), (F.col("doc_id") + 37).alias("dst"))
        )
    )
    e = e0.union(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct()
    d = e.groupBy(F.col("src").alias("node")).agg(F.count(F.lit(1)).cast("double").alias("deg"))
    ds = d.select(F.col("node").alias("_s"), F.col("deg").alias("sdeg"))
    dd = d.select(F.col("node").alias("_d"), F.col("deg").alias("ddeg"))
    return (
        e.join(ds, F.col("src") == F.col("_s"))
        .join(dd, F.col("dst") == F.col("_d"))
        .agg(
            F.count(F.lit(1)).alias("n_edges"),
            F.round(F.avg("sdeg"), 4).alias("mean_src_deg"),
            F.round(F.corr("sdeg", "ddeg"), 4).alias("assortativity"),
        )
    )


def _damerau_oracle() -> str:
    from testlog_etl_spark import oracles as _osql

    h = _osql.xxh64_sql("p_name || ':dl'")
    return f"""
WITH names AS (SELECT DISTINCT p_name FROM part WHERE p_name IS NOT NULL),
dirty AS (
  SELECT p_name AS orig_name,
         CASE WHEN (({h}) % 2 + 2) % 2 = 0
              THEN substr(p_name, 1, 2) || substr(p_name, 4, 1)
                   || substr(p_name, 3, 1) || substr(p_name, 5)
              ELSE substr(p_name, 1, 4) || 'x' || substr(p_name, 5)
         END AS dirty_name
  FROM names
)
SELECT d.orig_name, d.dirty_name, c.p_name AS clean_name,
       CAST(damerau_levenshtein(d.dirty_name, c.p_name) AS BIGINT) AS dl
FROM dirty d JOIN names c ON substr(d.dirty_name, 1, 2) = substr(c.p_name, 1, 2)
WHERE damerau_levenshtein(d.dirty_name, c.p_name) <= 1
ORDER BY orig_name, clean_name
"""


@register(
    "join_damerau_fuzzy",
    doc="transposition-aware fuzzy join: TRUE Damerau-Levenshtein "
    "(operators/strsim.py::damerau_levenshtein, the alphabet-indexed "
    "DP -- probe-verified against DuckDB's builtin including the "
    "CA->ABC=2 case OSA scores 3) matches a corrupted catalog "
    "(adjacent-char swap OR one inserted char, both distance 1, both "
    "first-2-char-preserving) back to clean names at dl <= 1, blocked "
    "on the 2-char prefix. The integer-distance sibling of "
    "join_jaro_winkler -- Spark scores in an Arrow UDF, DuckDB with "
    "its builtin, and the driver hash requires identical decisions.",
    oracle=None,  # generated below: needs the xxh64 SQL twin
)
def join_damerau_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from testlog_etl_spark.operators.strsim import damerau_levenshtein

    part = load_tables(spark, sf_dir, ("part",))["part"]
    names = part.filter(F.col("p_name").isNotNull()).select("p_name").distinct()
    even = F.pmod(F.xxhash64(F.concat(F.col("p_name"), F.lit(":dl"))), F.lit(2)) == 0
    dirty = names.select(
        F.col("p_name").alias("orig_name"),
        F.when(
            even,
            F.concat(
                F.substring("p_name", 1, 2),
                F.substring("p_name", 4, 1),
                F.substring("p_name", 3, 1),
                F.expr("substring(p_name, 5)"),
            ),
        )
        .otherwise(
            F.concat(F.substring("p_name", 1, 4), F.lit("x"), F.expr("substring(p_name, 5)"))
        )
        .alias("dirty_name"),
    )
    clean = names.select(F.col("p_name").alias("clean_name"))
    cand = dirty.join(
        clean, F.substring("dirty_name", 1, 2) == F.substring("clean_name", 1, 2)
    ).withColumn("dl", damerau_levenshtein(F.col("dirty_name"), F.col("clean_name")))
    return (
        cand.filter(F.col("dl") <= 1)
        .select("orig_name", "dirty_name", "clean_name", "dl")
        .orderBy("orig_name", "clean_name")
    )


from testlog_etl_spark.suite import REGISTRY as _ETL_REG2  # noqa: E402

_ETL_REG2["join_damerau_fuzzy"].oracle = _damerau_oracle()


@register(
    "events_new_vs_returning",
    doc="daily new-vs-returning user split: first-seen day per user "
    "(one rollup) broadcast-joined back to the per-(user, day) "
    "activity -- new on the first-seen day, returning after. The "
    "growth-accounting readout beside DAU/MAU; integer day keys, "
    "DATE output.",
    oracle="""
WITH ud AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day FROM events
),
fs AS (SELECT user_id, min(day) AS first_day FROM ud GROUP BY user_id)
SELECT ud.day,
       CAST(SUM(CASE WHEN ud.day = fs.first_day THEN 1 ELSE 0 END) AS BIGINT) AS new_users,
       CAST(SUM(CASE WHEN ud.day > fs.first_day THEN 1 ELSE 0 END) AS BIGINT) AS returning_users,
       ROUND(SUM(CASE WHEN ud.day > fs.first_day THEN 1 ELSE 0 END)::DOUBLE
             / count(*), 4) AS returning_share
FROM ud JOIN fs ON fs.user_id = ud.user_id
GROUP BY ud.day ORDER BY ud.day
""",
)
def events_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    ud = ev.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).distinct()
    fs = ud.groupBy(F.col("user_id").alias("_u")).agg(F.min("day").alias("first_day"))
    j = ud.join(fs, F.col("user_id") == F.col("_u"))
    is_new = (F.col("day") == F.col("first_day")).cast("int")
    is_ret = (F.col("day") > F.col("first_day")).cast("int")
    return (
        j.groupBy("day")
        .agg(
            F.sum(is_new).cast("long").alias("new_users"),
            F.sum(is_ret).cast("long").alias("returning_users"),
            F.round(F.sum(is_ret).cast("double") / F.count(F.lit(1)), 4).alias(
                "returning_share"
            ),
        )
        .orderBy("day")
    )


@register(
    "orders_cohort_ltv",
    doc="cohort lifetime value: customers grouped by FIRST-order month, "
    "revenue accumulated by month offset since the cohort month -- the "
    "cumulative-LTV curve per acquisition cohort (the revenue sibling "
    "of events_retention_cohorts' activity matrix). Month offsets as "
    "integer month arithmetic from DATE parts (no engine interval "
    "conventions); the cumulative sum runs per cohort over the "
    "offset-bounded rollup frame.",
    oracle="""
WITH o AS (
  SELECT o_custkey,
         (EXTRACT(year FROM o_orderdate) * 12 + EXTRACT(month FROM o_orderdate))::BIGINT AS m,
         o_totalprice
  FROM orders
),
c AS (SELECT o_custkey, min(m) AS cm FROM o GROUP BY o_custkey),
r AS (
  -- per-cell revenue SNAPPED to the 2^-20 binary grid: the running sum
  -- then adds exact multiples of 2^-20 (exact in double up to 2^53),
  -- so the cumulative value cannot drift across engines before the
  -- presentation rounding (5 boundary rows flipped without this)
  SELECT c.cm AS cohort_m, o.m - c.cm AS offset_m,
         floor(SUM(o.o_totalprice) * 1048576 + 0.5) / 1048576 AS rev,
         count(*) AS n_orders
  FROM o JOIN c ON c.o_custkey = o.o_custkey
  GROUP BY c.cm, o.m - c.cm
),
sz AS (SELECT cm AS cohort_m, count(*)::DOUBLE AS n_cust FROM c GROUP BY cm)
SELECT CAST(r.cohort_m AS BIGINT) AS cohort_month_index,
       CAST(r.offset_m AS BIGINT) AS month_offset,
       CAST(r.n_orders AS BIGINT) AS n_orders,
       ROUND(SUM(r.rev) OVER (PARTITION BY r.cohort_m ORDER BY r.offset_m
                              ROWS UNBOUNDED PRECEDING) / sz.n_cust, 2) AS cum_ltv_per_customer
FROM r JOIN sz ON sz.cohort_m = r.cohort_m
ORDER BY cohort_month_index, month_offset
""",
)
def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    o = orders.select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).cast("long").alias("m"),
        "o_totalprice",
    )
    c = o.groupBy(F.col("o_custkey").alias("_ck")).agg(F.min("m").alias("cm"))
    r = (
        o.join(c, F.col("o_custkey") == F.col("_ck"))
        .groupBy(F.col("cm").alias("cohort_m"), (F.col("m") - F.col("cm")).alias("offset_m"))
        .agg(
            (F.floor(F.sum("o_totalprice") * 1048576 + 0.5) / 1048576).alias("rev"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    sz = c.groupBy(F.col("cm").alias("_cm")).agg(F.count(F.lit(1)).cast("double").alias("n_cust"))
    w = Window.partitionBy("cohort_m").orderBy("offset_m").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        r.join(F.broadcast(sz), F.col("cohort_m") == F.col("_cm"))
        .select(
            F.col("cohort_m").alias("cohort_month_index"),
            F.col("offset_m").alias("month_offset"),
            F.col("n_orders").cast("long").alias("n_orders"),
            F.round(F.sum("rev").over(w) / F.col("n_cust"), 2).alias("cum_ltv_per_customer"),
        )
        .orderBy("cohort_month_index", "month_offset")
    )


def _sssp_oracle(n_rounds: int = 6) -> str:
    blocks = [
        """mx AS (SELECT max(doc_id) AS m FROM documents),
e_raw AS (
  SELECT doc_id AS src, doc_id * 2 AS dst FROM documents
  WHERE doc_id >= 1 AND doc_id * 2 <= (SELECT m FROM mx)
  UNION ALL
  SELECT doc_id, doc_id * 2 + 1 FROM documents
  WHERE doc_id >= 1 AND doc_id * 2 + 1 <= (SELECT m FROM mx)
  UNION ALL
  SELECT doc_id, doc_id + 37 FROM documents
  WHERE doc_id + 37 <= (SELECT m FROM mx)
),
und AS (SELECT src, dst FROM e_raw UNION SELECT dst, src FROM e_raw),
e AS (SELECT src, dst, (src + dst) % 7 + 1 AS w FROM und),
d0 AS (SELECT CAST(1 AS BIGINT) AS node, CAST(0 AS BIGINT) AS dist)"""
    ]
    for i in range(1, n_rounds + 1):
        prev = f"d{i - 1}"
        blocks.append(
            f"""d{i} AS (
  SELECT node, MIN(dist) AS dist FROM (
    SELECT node, dist FROM {prev}
    UNION ALL
    SELECT e.dst AS node, {prev}.dist + e.w AS dist
    FROM {prev} JOIN e ON e.src = {prev}.node
  ) GROUP BY node
)"""
        )
    body = ",\n".join(blocks)
    return f"""
WITH {body}
SELECT node, dist FROM d{n_rounds} ORDER BY node
"""


@register(
    "graph_sssp_weighted",
    doc="weighted single-source shortest paths by bounded Bellman-Ford "
    "(operators/dupgroups.py::sssp_bellman_ford, 6 rounds) over the "
    "doc-tree + skip graph with integer weights (src+dst) mod 7 + 1 -- "
    "the MIN-PLUS-semiring sibling of BFS's hop counting (a weighted "
    "path can beat a shorter-hop path, which the oracle's replay "
    "proves the relaxation order can't miss: min is a lattice join). "
    "Per round one node-keyed join + one min-combine; integer "
    "distances end to end.",
    oracle=_sssp_oracle(),
)
def graph_sssp_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from testlog_etl_spark.operators.dupgroups import sssp_bellman_ford

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    ids = docs.select("doc_id")
    mx = ids.agg(F.max("doc_id").alias("_m"))
    base = ids.crossJoin(F.broadcast(mx))
    e0 = (
        base.filter((F.col("doc_id") >= 1) & (F.col("doc_id") * 2 <= F.col("_m")))
        .select(F.col("doc_id").alias("src"), (F.col("doc_id") * 2).alias("dst"))
        .union(
            base.filter((F.col("doc_id") >= 1) & (F.col("doc_id") * 2 + 1 <= F.col("_m")))
            .select(F.col("doc_id").alias("src"), (F.col("doc_id") * 2 + 1).alias("dst"))
        )
        .union(
            base.filter(F.col("doc_id") + 37 <= F.col("_m"))
            .select(F.col("doc_id").alias("src"), (F.col("doc_id") + 37).alias("dst"))
        )
    )
    und = e0.union(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct()
    edges = und.withColumn("w", F.pmod(F.col("src") + F.col("dst"), F.lit(7)) + 1)
    seeds = ids.filter(F.col("doc_id") == 1).select(F.col("doc_id").alias("node"))
    out = sssp_bellman_ford(edges, seeds, n_rounds=6)
    return out.select("node", F.col("dist").cast("long").alias("dist")).orderBy("node")


@register(
    "graph_clustering_coefficient",
    doc="local clustering coefficient per node on the undirected "
    "event-transition graph: cc(v) = 2 T(v) / (deg(v) (deg(v)-1)), "
    "triangles from the canonical a<b<c ordered two-path + closing "
    "semi check (the graph_triangles construction -- each triangle "
    "generated once), degree from the distinct edge set, nodes with "
    "deg < 2 or zero triangles kept at cc = 0 via the left join. The "
    "community-structure readout beside degree assortativity.",
    oracle="""
WITH raw AS (
  SELECT prev_type AS a, event_type AS b FROM (
    SELECT event_type,
           lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
    FROM events
  ) WHERE prev_type IS NOT NULL AND prev_type <> event_type
),
e AS (
  SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v FROM raw
),
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS degree
  FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
  GROUP BY node
),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM e e1
  JOIN e e2 ON e2.u = e1.v
  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
),
tc AS (
  SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
  FROM (SELECT a AS node FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri)
  GROUP BY node
)
SELECT deg.node, deg.degree,
       COALESCE(tc.n_triangles, 0) AS n_triangles,
       ROUND(CASE WHEN deg.degree < 2 THEN 0.0
                  ELSE 2.0 * COALESCE(tc.n_triangles, 0)
                       / (deg.degree * (deg.degree - 1)) END, 4) AS clustering_coeff
FROM deg LEFT JOIN tc ON tc.node = deg.node
ORDER BY deg.node
""",
)
def graph_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNotNull()
            & (F.col("prev_type") != F.col("event_type"))
        )
        .select(
            F.least("prev_type", "event_type").alias("u"),
            F.greatest("prev_type", "event_type").alias("v"),
        )
        .distinct()
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    e1 = e.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = e.select(F.col("u").alias("b2"), F.col("v").alias("c"))
    e3 = e.select(F.col("u").alias("a3"), F.col("v").alias("c3"))
    tri = (
        e1.join(e2, F.col("b") == F.col("b2"))
        .join(e3, (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")), "left_semi")
        .select("a", "b", "c")
    )
    tc = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return (
        deg.join(tc, "node", "left")
        .select(
            "node",
            "degree",
            F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
            F.round(
                F.when(F.col("degree") < 2, F.lit(0.0)).otherwise(
                    2.0
                    * F.coalesce("n_triangles", F.lit(0))
                    / (F.col("degree") * (F.col("degree") - 1))
                ),
                4,
            ).alias("clustering_coeff"),
        )
        .orderBy("node")
    )


@register(
    "etl_quarantine_badrecords",
    doc="rules-engine row routing (the quarantine half of a "
    "validate-then-load ETL): each event is checked against three "
    "declarative rules (value spike > 450, props.k >= 90, weekend "
    "purchase); rows firing ANY rule are quarantined with their full "
    "sorted reason set. The driver-facing readout aggregates the "
    "quarantine by reason combination (bounded: 2^3 combos) with an "
    "offender sample; at 100 TB the same lineage writes the "
    "quarantined rows to a side sink instead -- the rule columns are "
    "pure codegen, one scan, no shuffle before the tiny rollup.",
    oracle="""
WITH flags AS (
  SELECT event_id,
         CASE WHEN "value" > 450 THEN 1 ELSE 0 END AS r_spike,
         CASE WHEN CAST(json_extract_string(props, 'k') AS BIGINT) >= 90 THEN 1 ELSE 0 END AS r_k,
         CASE WHEN event_type = 'purchase' AND isodow(CAST(ts AS DATE)) >= 6 THEN 1 ELSE 0 END AS r_wknd
  FROM events
),
q AS (
  SELECT event_id,
         array_to_string(list_filter(
           [CASE WHEN r_spike = 1 THEN 'value_spike' END,
            CASE WHEN r_k = 1 THEN 'props_k_high' END,
            CASE WHEN r_wknd = 1 THEN 'weekend_purchase' END], x -> x IS NOT NULL), ',') AS reasons
  FROM flags WHERE r_spike + r_k + r_wknd > 0
)
SELECT reasons, CAST(count(*) AS BIGINT) AS n_rows,
       MIN(event_id) AS sample_event_id
FROM q GROUP BY reasons ORDER BY reasons
""",
)
def etl_quarantine_badrecords(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    r_spike = F.when(F.col("value") > 450, F.lit("value_spike"))
    r_k = F.when(
        F.get_json_object("props", "$.k").cast("long") >= 90, F.lit("props_k_high")
    )
    r_wknd = F.when(
        (F.col("event_type") == "purchase")
        & (F.expr("extract(DAYOFWEEK_ISO FROM CAST(ts AS DATE))") >= 6),
        F.lit("weekend_purchase"),
    )
    q = (
        ev.select(
            "event_id",
            F.array_compact(F.array(r_spike, r_k, r_wknd)).alias("fired"),
        )
        .filter(F.size("fired") > 0)
        .select("event_id", F.array_join("fired", ",").alias("reasons"))
    )
    return (
        q.groupBy("reasons")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("event_id").alias("sample_event_id"),
        )
        .orderBy("reasons")
    )


def _lpa_oracle(rounds: int = 3) -> str:
    """Chained-CTE replay of the synchronous deterministic LPA rounds:
    each round re-labels every node with its neighbors' most frequent
    label, ties broken by MIN label -- same tie rule both engines."""
    parts = [
        """
WITH raw AS (
  SELECT prev_type AS a, event_type AS b FROM (
    SELECT event_type,
           lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
    FROM events
  ) WHERE prev_type IS NOT NULL AND prev_type <> event_type
),
e AS (SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v FROM raw),
ed AS (SELECT u AS src, v AS dst FROM e UNION ALL SELECT v, u FROM e),
l0 AS (SELECT DISTINCT src AS node, src AS label FROM ed)"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f""",
c{r} AS (
  SELECT ed.dst AS node, l.label, count(*) AS c
  FROM ed JOIN l{r - 1} l ON l.node = ed.src
  GROUP BY ed.dst, l.label
),
l{r} AS (
  SELECT node, label FROM (
    SELECT node, label,
           ROW_NUMBER() OVER (PARTITION BY node ORDER BY c DESC, label) AS rn
    FROM c{r}
  ) WHERE rn = 1
)"""
        )
    parts.append(
        f"""
SELECT node, label AS community FROM l{rounds} ORDER BY node"""
    )
    return "".join(parts)


@register(
    "graph_label_propagation",
    doc="deterministic synchronous label propagation (3 rounds) on the "
    "undirected event-transition graph: every node re-labels to its "
    "neighbors' most frequent label, ties broken by MIN label -- the "
    "standard LPA community heuristic made replayable (no random "
    "visit order). Each round is one (dst, label) count shuffle + a "
    "degree-bounded per-node pick window; rounds chain as plan "
    "lineage, no driver loop state. Oracle replays the identical "
    "rounds as chained CTEs.",
    oracle=_lpa_oracle(),
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNotNull()
            & (F.col("prev_type") != F.col("event_type"))
        )
        .select(
            F.least("prev_type", "event_type").alias("u"),
            F.greatest("prev_type", "event_type").alias("v"),
        )
        .distinct()
    )
    ed = e.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionAll(
        e.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )
    labels = ed.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    wp = Window.partitionBy("node").orderBy(F.desc("c"), F.asc("label"))
    for _ in range(3):
        cnt = (
            ed.join(labels, ed.src == labels.node)
            .groupBy(F.col("dst").alias("n2"), "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        labels = (
            cnt.select(F.col("n2").alias("node"), "label", "c")
            .withColumn("rn", F.row_number().over(wp))
            .filter(F.col("rn") == 1)
            .select("node", "label")
        )
    return labels.select("node", F.col("label").alias("community")).orderBy("node")


@register(
    "graph_transitivity_global",
    doc="global transitivity of the event-transition graph: C = 3 T / "
    "sum_v C(deg_v, 2) -- closed triads over connected triples, the "
    "one-number community summary beside the per-node clustering "
    "coefficient (whose weighted mean this is). Triangles via the "
    "canonical once-per-triangle a<b<c join; triads from the degree "
    "rollup in closed form.",
    oracle="""
WITH raw AS (
  SELECT prev_type AS a, event_type AS b FROM (
    SELECT event_type,
           lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
    FROM events
  ) WHERE prev_type IS NOT NULL AND prev_type <> event_type
),
e AS (SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v FROM raw),
deg AS (
  SELECT node, count(*)::BIGINT AS d
  FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
  GROUP BY node
),
tri AS (
  SELECT count(*)::BIGINT AS t
  FROM e e1
  JOIN e e2 ON e2.u = e1.v
  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
)
SELECT CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes,
       CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
       tri.t AS n_triangles,
       CAST((SELECT SUM(d * (d - 1) / 2) FROM deg) AS BIGINT) AS n_triads,
       ROUND(3.0 * tri.t / (SELECT SUM(d * (d - 1) / 2) FROM deg), 4) AS transitivity
FROM tri
""",
)
def graph_transitivity_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNotNull()
            & (F.col("prev_type") != F.col("event_type"))
        )
        .select(
            F.least("prev_type", "event_type").alias("u"),
            F.greatest("prev_type", "event_type").alias("v"),
        )
        .distinct()
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    e1 = e.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = e.select(F.col("u").alias("b2"), F.col("v").alias("c"))
    e3 = e.select(F.col("u").alias("a3"), F.col("v").alias("c3"))
    tri = (
        e1.join(e2, F.col("b") == F.col("b2"))
        .join(e3, (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")), "left_semi")
        .agg(F.count(F.lit(1)).alias("t"))
    )
    stats = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(F.expr("d * (d - 1) div 2")).alias("n_triads"),
    )
    ne = e.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        tri.crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(ne))
        .select(
            "n_nodes",
            "n_edges",
            F.col("t").alias("n_triangles"),
            "n_triads",
            F.round(3.0 * F.col("t") / F.col("n_triads"), 4).alias("transitivity"),
        )
    )


def _ppr_oracle(src: str = "view", n_iter: int = 5, d: float = 0.85, bits: int = 30) -> str:
    g = 1 << bits

    def snap(x: str) -> str:
        return f"floor(({x}) * {g} + 0.5) / {g}"

    blocks = [
        f"""edges AS (
  SELECT prev_type AS src, event_type AS dst, count(*)::DOUBLE AS w
  FROM (
    SELECT event_type,
           lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
    FROM events
  )
  WHERE prev_type IS NOT NULL
  GROUP BY src, dst
),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
ow AS (SELECT src, SUM(w) AS ow FROM edges GROUP BY src),
e AS (SELECT edges.src, edges.dst, edges.w / ow.ow AS frac FROM edges JOIN ow ON ow.src = edges.src),
r0 AS (SELECT node, CASE WHEN node = '{src}' THEN 1.0 ELSE 0.0 END AS rank FROM nodes)"""
    ]
    for i in range(1, n_iter + 1):
        blocks.append(
            f"""i{i} AS (
  SELECT e.dst AS node, SUM(r.rank * e.frac) AS inb
  FROM e JOIN r{i - 1} r ON r.node = e.src GROUP BY e.dst
),
r{i} AS (
  SELECT nodes.node,
         {snap(f"(CASE WHEN nodes.node = '{src}' THEN {1 - d} ELSE 0.0 END) + {d} * coalesce(i{i}.inb, 0.0)")} AS rank
  FROM nodes LEFT JOIN i{i} ON i{i}.node = nodes.node
)"""
        )
    body = ",\n".join(blocks)
    return f"""
WITH {body}
SELECT node, rank FROM r{n_iter} ORDER BY node
"""


@register(
    "graph_ppr_single_source",
    oracle=_ppr_oracle(),
    doc="personalized PageRank from the 'view' node over the weighted "
    "event-transition graph: same damped power iteration as "
    "graph_pagerank but ALL restart mass returns to the source -- the "
    "'related to X' relevance vector recommender systems read off. 5 "
    "iterations, ranks grid-snapped to 2^-30 each round (the "
    "pagerank/kmeans playbook), chained-CTE replay bit-identical with "
    "no output rounding. Per round: broadcast edges><ranks join + one "
    "(node, double) sum shuffle.",
)
def graph_ppr_single_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    src, n_iter, d, bits = "view", 5, 0.85, 30
    g = float(1 << bits)
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy(F.col("prev_type").alias("src"), F.col("event_type").alias("dst"))
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    ow = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    e = edges.join(ow, "src").select(
        "src", "dst", (F.col("w") / F.col("ow")).alias("frac")
    )
    ranks = nodes.select(
        "node",
        F.when(F.col("node") == src, F.lit(1.0)).otherwise(F.lit(0.0)).alias("rank"),
    )
    for _ in range(n_iter):
        inb = (
            e.join(ranks, e.src == ranks.node)
            .groupBy(F.col("dst").alias("n2"))
            .agg(F.sum(F.col("rank") * F.col("frac")).alias("inb"))
        )
        ranks = (
            nodes.join(inb, nodes.node == F.col("n2"), "left")
            .select(
                "node",
                (
                    F.floor(
                        (
                            F.when(F.col("node") == src, F.lit(1 - d)).otherwise(0.0)
                            + d * F.coalesce(F.col("inb"), F.lit(0.0))
                        )
                        * g
                        + 0.5
                    )
                    / g
                ).alias("rank"),
            )
        )
    return ranks.select("node", "rank").orderBy("node")


def _absorb_oracle(target: str = "purchase", n_iter: int = 6, bits: int = 30) -> str:
    g = 1 << bits

    def snap(x: str) -> str:
        return f"floor(({x}) * {g} + 0.5) / {g}"

    blocks = [
        f"""edges AS (
  SELECT prev_type AS src, event_type AS dst, count(*)::DOUBLE AS w
  FROM (
    SELECT event_type,
           lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
    FROM events
  )
  WHERE prev_type IS NOT NULL
  GROUP BY src, dst
),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
ow AS (SELECT src, SUM(w) AS ow FROM edges GROUP BY src),
e AS (SELECT edges.src, edges.dst, edges.w / ow.ow AS frac FROM edges JOIN ow ON ow.src = edges.src),
p0 AS (SELECT node, CASE WHEN node = '{target}' THEN 1.0 ELSE 0.0 END AS p FROM nodes)"""
    ]
    for i in range(1, n_iter + 1):
        blocks.append(
            f"""s{i} AS (
  SELECT e.src AS node, SUM(e.frac * p.p) AS np
  FROM e JOIN p{i - 1} p ON p.node = e.dst GROUP BY e.src
),
p{i} AS (
  SELECT nodes.node,
         CASE WHEN nodes.node = '{target}' THEN 1.0
              ELSE {snap(f'coalesce(s{i}.np, 0.0)')} END AS p
  FROM nodes LEFT JOIN s{i} ON s{i}.node = nodes.node
)"""
        )
    body = ",\n".join(blocks)
    return f"""
WITH {body}
SELECT node, p AS p_hit FROM p{n_iter} ORDER BY node
"""


@register(
    "graph_absorbing_hit_probability",
    oracle=_absorb_oracle(),
    doc="absorbing-Markov conversion probability: for every state of "
    "the event-transition chain, the probability of REACHING "
    "'purchase' within 6 steps (purchase absorbing at p = 1; "
    "p_{{k+1}}(s) = sum_t T(s,t) p_k(t) elsewhere) -- the "
    "finite-horizon answer to 'how close is each behavior state to "
    "converting', the funnel/transition-matrix family's forward "
    "closure. Per round one edges><p join + (node, double) sum "
    "shuffle, grid-snapped (pagerank playbook), chained-CTE replay "
    "bit-identical.",
)
def graph_absorbing_hit_probability(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    target, n_iter, bits = "purchase", 6, 30
    g = float(1 << bits)
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy(F.col("prev_type").alias("src"), F.col("event_type").alias("dst"))
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    ow = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    e = edges.join(ow, "src").select(
        "src", "dst", (F.col("w") / F.col("ow")).alias("frac")
    )
    p = nodes.select(
        "node",
        F.when(F.col("node") == target, F.lit(1.0)).otherwise(F.lit(0.0)).alias("p"),
    )
    for _ in range(n_iter):
        s = (
            e.join(p, e.dst == p.node)
            .groupBy(F.col("src").alias("n2"))
            .agg(F.sum(F.col("frac") * F.col("p")).alias("np"))
        )
        p = nodes.join(s, nodes.node == F.col("n2"), "left").select(
            "node",
            F.when(F.col("node") == target, F.lit(1.0))
            .otherwise(
                F.floor(F.coalesce(F.col("np"), F.lit(0.0)) * g + 0.5) / g
            )
            .alias("p"),
        )
    return p.select("node", F.col("p").alias("p_hit")).orderBy("node")


def _modularity_oracle(rounds: int = 3) -> str:
    lpa = _lpa_oracle(rounds)
    # reuse the LPA chained CTEs up to l{rounds}, then score the partition
    body = lpa[lpa.index("WITH") + 5 : lpa.rindex("SELECT node")]
    return f"""
WITH {body.rstrip()},
final AS (SELECT node, label AS community FROM l{rounds}),
m AS (SELECT count(*)::DOUBLE AS m FROM e),
intra AS (
  SELECT fa.community, count(*)::DOUBLE AS ec
  FROM e JOIN final fa ON fa.node = e.u
         JOIN final fb ON fb.node = e.v AND fb.community = fa.community
  GROUP BY fa.community
),
degc AS (
  SELECT f.community, SUM(d.d)::DOUBLE AS dc
  FROM (SELECT node, count(*)::DOUBLE AS d
        FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
        GROUP BY node) d
  JOIN final f ON f.node = d.node
  GROUP BY f.community
)
SELECT degc.community,
       CAST(coalesce(intra.ec, 0) AS BIGINT) AS intra_edges,
       CAST(degc.dc AS BIGINT) AS total_degree,
       ROUND(coalesce(intra.ec, 0) / m.m - pow(degc.dc / (2 * m.m), 2), 6) AS q_contrib
FROM degc LEFT JOIN intra ON intra.community = degc.community
CROSS JOIN m
ORDER BY degc.community
"""


@register(
    "graph_modularity_lpa",
    oracle=_modularity_oracle(),
    doc="Newman modularity scorecard of the 3-round LPA partition "
    "(graph_label_propagation's output judged on its own graph): per "
    "community, intra-community edges e_c, total degree d_c, and the "
    "contribution Q_c = e_c/m - (d_c/2m)^2 -- sum over rows is the "
    "partition's Q. The detect-then-score pair every community "
    "pipeline runs; shares the LPA chained-CTE lineage so both "
    "engines score the IDENTICAL partition.",
)
def graph_modularity_lpa(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNotNull()
            & (F.col("prev_type") != F.col("event_type"))
        )
        .select(
            F.least("prev_type", "event_type").alias("u"),
            F.greatest("prev_type", "event_type").alias("v"),
        )
        .distinct()
    )
    ed = e.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionAll(
        e.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )
    labels = ed.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    wp = Window.partitionBy("node").orderBy(F.desc("c"), F.asc("label"))
    for _ in range(3):
        cnt = (
            ed.join(labels, ed.src == labels.node)
            .groupBy(F.col("dst").alias("n2"), "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        labels = (
            cnt.select(F.col("n2").alias("node"), "label", "c")
            .withColumn("rn", F.row_number().over(wp))
            .filter(F.col("rn") == 1)
            .select("node", "label")
        )
    final = labels.select("node", F.col("label").alias("community"))
    m = e.agg(F.count(F.lit(1)).cast("double").alias("m"))
    fa = final.select(F.col("node").alias("u"), F.col("community").alias("ca"))
    fb = final.select(F.col("node").alias("v"), F.col("community").alias("cb"))
    intra = (
        e.join(fa, "u")
        .join(fb, "v")
        .filter(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("community"))
        .agg(F.count(F.lit(1)).cast("double").alias("ec"))
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("double").alias("d"))
    )
    degc = (
        deg.join(final, "node")
        .groupBy("community")
        .agg(F.sum("d").alias("dc"))
    )
    return (
        degc.join(intra, "community", "left")
        .crossJoin(F.broadcast(m))
        .select(
            "community",
            F.coalesce("ec", F.lit(0.0)).cast("long").alias("intra_edges"),
            F.col("dc").cast("long").alias("total_degree"),
            F.round(
                F.coalesce("ec", F.lit(0.0)) / F.col("m")
                - F.pow(F.col("dc") / (2 * F.col("m")), 2),
                6,
            ).alias("q_contrib"),
        )
        .orderBy("community")
    )


@register(
    "graph_markov_entropy_rate",
    doc="entropy rate of the event-transition Markov chain: per state, "
    "the conditional next-step entropy H(next | s) = -sum_t T(s,t) "
    "log2 T(s,t), plus each state's EMPIRICAL visit share pi(s) (from "
    "the same transition counts) and its contribution pi(s) H(s) -- "
    "sum of the contribution column is the chain's empirical entropy "
    "rate, the behavioral-predictability number (0 bits = "
    "deterministic next step). One (src, dst) count rollup, "
    "everything downstream is closed-form on the tiny state space.",
    oracle="""
WITH edges AS (
  SELECT prev_type AS src, event_type AS dst, count(*)::DOUBLE AS w
  FROM (
    SELECT event_type,
           lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
    FROM events
  )
  WHERE prev_type IS NOT NULL
  GROUP BY src, dst
),
ow AS (SELECT src, SUM(w) AS ow FROM edges GROUP BY src),
tot AS (SELECT SUM(w) AS tot FROM edges),
h AS (
  SELECT e.src,
         -SUM((e.w / o.ow) * log2(e.w / o.ow)) AS h_next
  FROM edges e JOIN ow o ON o.src = e.src
  GROUP BY e.src
)
SELECT h.src AS state,
       ROUND(ow.ow / tot.tot, 6) AS visit_share,
       ROUND(h.h_next, 4) AS h_next_bits,
       ROUND((ow.ow / tot.tot) * h.h_next, 6) AS rate_contrib
FROM h JOIN ow ON ow.src = h.src CROSS JOIN tot
ORDER BY state
""",
)
def graph_markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy(F.col("prev_type").alias("src"), F.col("event_type").alias("dst"))
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    ow = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    tot = edges.agg(F.sum("w").alias("tot"))
    h = (
        edges.join(F.broadcast(ow), "src")
        .groupBy("src")
        .agg(
            (-F.sum((F.col("w") / F.col("ow")) * F.log2(F.col("w") / F.col("ow")))).alias(
                "h_next"
            )
        )
    )
    return (
        h.join(ow, "src")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("src").alias("state"),
            F.round(F.col("ow") / F.col("tot"), 6).alias("visit_share"),
            F.round("h_next", 4).alias("h_next_bits"),
            F.round((F.col("ow") / F.col("tot")) * F.col("h_next"), 6).alias(
                "rate_contrib"
            ),
        )
        .orderBy("state")
    )


@register(
    "events_bot_score",
    doc="bot-likelihood composite per user: three deterministic "
    "signals -- events/day rate, inter-arrival regularity (1/(1+CV) "
    "of gap seconds: clockwork emitters score high), and behavioral "
    "narrowness (1 - type-entropy/log2(5)) -- each min-max normalized "
    "over the user population (broadcast extremes; identical "
    "normalization both engines), averaged into one score; top 20 "
    "users by (score desc, user asc). One per-user rollup + one lag "
    "window; the abuse-triage readout the events family feeds.",
    oracle="""
WITH g AS (
  SELECT user_id, ts,
         (epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)))::DOUBLE / 1000000 AS gap
  FROM events
),
u AS (
  SELECT e.user_id,
         COUNT(*)::DOUBLE AS n,
         COUNT(*)::DOUBLE / GREATEST(date_diff('day', MIN(CAST(e.ts AS DATE)), MAX(CAST(e.ts AS DATE))) + 1, 1) AS rate
  FROM events e GROUP BY e.user_id
),
cv AS (
  SELECT user_id,
         CASE WHEN AVG(gap) > 0 THEN stddev_pop(gap) / AVG(gap) ELSE 0.0 END AS cv
  FROM g WHERE gap IS NOT NULL GROUP BY user_id
),
ent AS (
  SELECT user_id,
         1.0 - COALESCE(-SUM(p * log2(p)), 0.0) / log2(5.0) AS narrow
  FROM (
    SELECT user_id, count(*)::DOUBLE / SUM(count(*)) OVER (PARTITION BY user_id) AS p
    FROM events GROUP BY user_id, event_type
  ) GROUP BY user_id
),
j AS (
  SELECT u.user_id, u.n, ROUND(u.rate, 8) AS rate,
         ROUND(1.0 / (1.0 + COALESCE(cv.cv, 0.0)), 8) AS reg,
         ROUND(ent.narrow, 8) AS narrow
  FROM u JOIN ent ON ent.user_id = u.user_id
  LEFT JOIN cv ON cv.user_id = u.user_id
),
mm AS (
  SELECT MIN(rate) AS r0, MAX(rate) AS r1, MIN(reg) AS g0, MAX(reg) AS g1,
         MIN(narrow) AS e0, MAX(narrow) AS e1
  FROM j
)
SELECT user_id, CAST(n AS BIGINT) AS n_events,
       ROUND(((rate - r0) / NULLIF(r1 - r0, 0)
              + (reg - g0) / NULLIF(g1 - g0, 0)
              + (narrow - e0) / NULLIF(e1 - e0, 0)) / 3.0, 6) AS bot_score
FROM j CROSS JOIN mm
ORDER BY bot_score DESC, user_id
LIMIT 20
""",
)
def events_bot_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select(
        "user_id",
        (
            (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).cast("double")
            / 1000000
        ).alias("gap"),
    )
    u = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        (
            F.count(F.lit(1)).cast("double")
            / F.greatest(
                F.datediff(F.max(F.col("ts").cast("date")), F.min(F.col("ts").cast("date"))) + 1,
                F.lit(1),
            )
        ).alias("rate"),
    )
    cv = (
        g.filter(F.col("gap").isNotNull())
        .groupBy("user_id")
        .agg(
            F.when(F.avg("gap") > 0, F.stddev_pop("gap") / F.avg("gap"))
            .otherwise(0.0)
            .alias("cv")
        )
    )
    p = (
        ev.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
        .withColumn("p", F.col("c") / F.sum("c").over(Window.partitionBy("user_id")))
    )
    ent = p.groupBy("user_id").agg(
        (
            1.0
            - F.coalesce(-F.sum(F.col("p") * F.log2("p")), F.lit(0.0))
            / F.log2(F.lit(5.0))
        ).alias("narrow")
    )
    j = (
        u.join(ent, "user_id")
        .join(cv, "user_id", "left")
        .select(
            "user_id",
            "n",
            F.round("rate", 8).alias("rate"),
            F.round(1.0 / (1.0 + F.coalesce(F.col("cv"), F.lit(0.0))), 8).alias("reg"),
            F.round("narrow", 8).alias("narrow"),
        )
    )
    mm = j.agg(
        F.min("rate").alias("r0"), F.max("rate").alias("r1"),
        F.min("reg").alias("g0"), F.max("reg").alias("g1"),
        F.min("narrow").alias("e0"), F.max("narrow").alias("e1"),
    )
    norm = (
        (F.col("rate") - F.col("r0")) / F.nullif(F.col("r1") - F.col("r0"), F.lit(0.0))
        + (F.col("reg") - F.col("g0")) / F.nullif(F.col("g1") - F.col("g0"), F.lit(0.0))
        + (F.col("narrow") - F.col("e0")) / F.nullif(F.col("e1") - F.col("e0"), F.lit(0.0))
    ) / 3.0
    return (
        j.crossJoin(F.broadcast(mm))
        .select(
            "user_id",
            F.col("n").cast("long").alias("n_events"),
            F.round(norm, 6).alias("bot_score"),
        )
        .orderBy(F.desc("bot_score"), F.asc("user_id"))
        .limit(20)
    )


@register(
    "dq_pipeline_reconciliation",
    doc="row-count reconciliation ledger across derivation stages (the "
    "audit a pipeline owner signs before publishing): raw events -> "
    "typed (props.k parses) -> valued (value > 0) -> deduplicated "
    "(first per (user_id, ts)) -> final, one row per stage with rows "
    "kept, rows dropped AT that stage, and the drop reason. Stage "
    "predicates are cumulative single-scan flags; the dedup stage is "
    "the only shuffle. At 100 TB the same flags feed a metrics sink "
    "instead of a SELECT.",
    oracle="""
WITH f AS (
  SELECT *,
         CASE WHEN try_cast(json_extract_string(props, 'k') AS BIGINT) IS NOT NULL THEN 1 ELSE 0 END AS ok_typed,
         CASE WHEN "value" > 0 THEN 1 ELSE 0 END AS ok_val
  FROM events
),
d AS (
  SELECT ok_typed, ok_val,
         ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id) AS rn
  FROM f WHERE ok_typed = 1 AND ok_val = 1
),
c AS (
  SELECT (SELECT count(*) FROM f) AS n_raw,
         (SELECT count(*) FROM f WHERE ok_typed = 1) AS n_typed,
         (SELECT count(*) FROM f WHERE ok_typed = 1 AND ok_val = 1) AS n_valued,
         (SELECT count(*) FROM d WHERE rn = 1) AS n_final
)
SELECT stage, rows_kept, rows_dropped, reason FROM (
  SELECT 1 AS ord, 'raw' AS stage, n_raw AS rows_kept, 0::BIGINT AS rows_dropped, 'source' AS reason FROM c
  UNION ALL SELECT 2, 'typed', n_typed, n_raw - n_typed, 'props.k unparseable' FROM c
  UNION ALL SELECT 3, 'valued', n_valued, n_typed - n_valued, 'non-positive value' FROM c
  UNION ALL SELECT 4, 'deduped', n_final, n_valued - n_final, 'duplicate (user_id, ts)' FROM c
) ORDER BY ord
""",
)
def dq_pipeline_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    f = ev.select(
        "*",
        F.get_json_object("props", "$.k").cast("long").isNotNull().cast("int").alias("ok_typed"),
        (F.col("value") > 0).cast("int").alias("ok_val"),
    )
    d = (
        f.filter((F.col("ok_typed") == 1) & (F.col("ok_val") == 1))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id", "ts").orderBy("event_id")
            ),
        )
    )
    c = f.agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.sum("ok_typed").alias("n_typed"),
        F.sum(F.col("ok_typed") * F.col("ok_val")).alias("n_valued"),
    ).crossJoin(
        F.broadcast(d.filter(F.col("rn") == 1).agg(F.count(F.lit(1)).alias("n_final")))
    )
    rows = c.selectExpr(
        "stack(4, "
        "1, 'raw', n_raw, CAST(0 AS BIGINT), 'source', "
        "2, 'typed', n_typed, n_raw - n_typed, 'props.k unparseable', "
        "3, 'valued', n_valued, n_typed - n_valued, 'non-positive value', "
        "4, 'deduped', n_final, n_valued - n_final, 'duplicate (user_id, ts)'"
        ") as (ord, stage, rows_kept, rows_dropped, reason)"
    )
    return rows.select("stage", "rows_kept", "rows_dropped", "reason").orderBy("ord")


@register(
    "events_streak_histogram",
    doc="distribution of consecutive-active-day run lengths across all "
    "users (the engagement-persistence histogram behind "
    "events_longest_streak's per-user max): active days per user -> "
    "gaps-and-islands (date - dense day-rank stays constant within a "
    "run) -> run lengths -> corpus histogram with user-reach per "
    "length. Windows partition by user; the histogram is a tiny "
    "rollup.",
    oracle="""
WITH d AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
  FROM events
),
r AS (
  SELECT user_id, day,
         day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS INT) AS grp
  FROM d
),
runs AS (
  SELECT user_id, grp, COUNT(*)::BIGINT AS len
  FROM r GROUP BY user_id, grp
)
SELECT len AS streak_days,
       CAST(COUNT(*) AS BIGINT) AS n_streaks,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM runs GROUP BY len
ORDER BY streak_days
""",
)
def events_streak_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    d = ev.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).distinct()
    r = d.select(
        "user_id",
        "day",
        F.date_sub(
            "day",
            F.row_number().over(Window.partitionBy("user_id").orderBy("day")),
        ).alias("grp"),
    )
    runs = r.groupBy("user_id", "grp").agg(F.count(F.lit(1)).alias("len"))
    return (
        runs.groupBy(F.col("len").alias("streak_days"))
        .agg(
            F.count(F.lit(1)).alias("n_streaks"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("streak_days")
    )


def _hits_oracle(n_iter: int = 5, bits: int = 30) -> str:
    g = 1 << bits

    def snap(x: str) -> str:
        return f"floor(({x}) * {g} + 0.5) / {g}"

    blocks = [
        """edges AS MATERIALIZED (
  SELECT prev_type AS src, event_type AS dst, count(*)::DOUBLE AS w
  FROM (
    SELECT event_type,
           lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
    FROM events
  )
  WHERE prev_type IS NOT NULL
  GROUP BY src, dst
),
nodes AS MATERIALIZED (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
h0 AS (SELECT node, 1.0 AS h FROM nodes),
a0 AS (SELECT node, 1.0 AS a FROM nodes)"""
    ]
    for i in range(1, n_iter + 1):
        blocks.append(
            f"""ar{i} AS MATERIALIZED (
  SELECT e.dst AS node, SUM(h.h * e.w) AS v
  FROM edges e JOIN h{i - 1} h ON h.node = e.src GROUP BY e.dst
),
an{i} AS MATERIALIZED (SELECT SUM(v) AS s FROM ar{i}),
a{i} AS MATERIALIZED (
  SELECT nodes.node, {snap('coalesce(ar.v, 0.0) / an.s')} AS a
  FROM nodes LEFT JOIN ar{i} ar ON ar.node = nodes.node, an{i} an
),
hr{i} AS MATERIALIZED (
  SELECT e.src AS node, SUM(a.a * e.w) AS v
  FROM edges e JOIN a{i} a ON a.node = e.dst GROUP BY e.src
),
hn{i} AS MATERIALIZED (SELECT SUM(v) AS s FROM hr{i}),
h{i} AS MATERIALIZED (
  SELECT nodes.node, {snap('coalesce(hr.v, 0.0) / hn.s')} AS h
  FROM nodes LEFT JOIN hr{i} hr ON hr.node = nodes.node, hn{i} hn
)"""
        )
    body = ",\n".join(blocks)
    return f"""
WITH {body}
SELECT h{n_iter}.node AS node, h{n_iter}.h AS hub, a{n_iter}.a AS authority
FROM h{n_iter} JOIN a{n_iter} ON a{n_iter}.node = h{n_iter}.node
ORDER BY h{n_iter}.node
"""


@register(
    "graph_hits_hubs_authorities",
    oracle=_hits_oracle(),
    doc="HITS hubs & authorities on the weighted event-transition "
    "graph: 5 mutual-reinforcement rounds (authority <- inbound hub "
    "mass, hub <- outbound authority mass), L1-normalized and "
    "grid-snapped to 2^-30 each half-round (the pagerank playbook), "
    "chained-CTE replay bit-identical. Hub-heavy states FEED journeys "
    "(browse), authority-heavy states ABSORB them (purchase) -- the "
    "directed complement to PageRank's single score.",
)
def graph_hits_hubs_authorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    n_iter, bits = 5, 30
    g = float(1 << bits)
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy(F.col("prev_type").alias("src"), F.col("event_type").alias("dst"))
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    # pin the edge rollup + node set ONCE: every round joins them twice,
    # and an unchecked lineage would replay the lag-window shuffle 10+
    # times (and hang a default-config 200-partition session)
    edges = edges.localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .coalesce(1)
        .localCheckpoint(eager=True)
    )

    def snap(col):
        return F.floor(col * g + 0.5) / g

    h = nodes.select("node", F.lit(1.0).alias("h"))
    a = None
    for _ in range(n_iter):
        ar = (
            edges.join(h, edges.src == h.node)
            .groupBy(F.col("dst").alias("n2"))
            .agg(F.sum(F.col("h") * F.col("w")).alias("v"))
        )
        an = ar.agg(F.sum("v").alias("s"))
        a = (
            nodes.join(ar, nodes.node == F.col("n2"), "left")
            .crossJoin(F.broadcast(an))
            .select(
                "node", snap(F.coalesce("v", F.lit(0.0)) / F.col("s")).alias("a")
            )
        )
        # checkpoint BEFORE h consumes a: rebinding after h is built would
        # leave h's lineage holding the unchecked a-plan and the tree
        # still doubles per round
        a = a.coalesce(1).localCheckpoint(eager=True)
        hr = (
            edges.join(a, edges.dst == a.node)
            .groupBy(F.col("src").alias("n2"))
            .agg(F.sum(F.col("a") * F.col("w")).alias("v"))
        )
        hn = hr.agg(F.sum("v").alias("s"))
        h = (
            nodes.join(hr, nodes.node == F.col("n2"), "left")
            .crossJoin(F.broadcast(hn))
            .select(
                "node", snap(F.coalesce("v", F.lit(0.0)) / F.col("s")).alias("h")
            )
        )
        # truncate lineage each round (the bfs_levels playbook): the two
        # mutual joins per round would otherwise double the plan tree
        # per half-round -- 2^10 subtrees by round five
        # rank frames are node-count-sized: collapse to one partition so
        # the checkpoint doesn't materialize 200 near-empty shuffle files
        # per round under a default-config session
        h = h.coalesce(1).localCheckpoint(eager=True)
    return (
        h.join(a.withColumnRenamed("node", "node_a"), h.node == F.col("node_a"))
        .select("node", F.col("h").alias("hub"), F.col("a").alias("authority"))
        .orderBy("node")
    )


@register(
    "events_type_coengagement",
    doc="co-engagement matrix over event types: for every unordered "
    "type pair, users doing BOTH, Jaccard of the user sets, and the "
    "conditional reach P(also B | did A-or-B pairwise symmetrized) -- "
    "which behaviors share an audience (the cross-feature adoption "
    "readout). One distinct (user, type) rollup, pair counts via a "
    "type-keyed self-join on user, set algebra from per-type totals.",
    oracle="""
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
tot AS (SELECT event_type, count(*)::BIGINT AS n FROM ut GROUP BY event_type),
pair AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         count(*)::BIGINT AS n_both
  FROM ut a JOIN ut b ON b.user_id = a.user_id AND b.event_type > a.event_type
  GROUP BY type_a, type_b
)
SELECT p.type_a, p.type_b, p.n_both,
       ROUND(p.n_both * 1.0 / (ta.n + tb.n - p.n_both), 4) AS user_jaccard
FROM pair p
JOIN tot ta ON ta.event_type = p.type_a
JOIN tot tb ON tb.event_type = p.type_b
ORDER BY type_a, type_b
""",
)
def events_type_coengagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    ut = ev.select("user_id", "event_type").distinct()
    tot = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    pair = (
        a.join(b, "user_id")
        .filter(F.col("type_b") > F.col("type_a"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    ta = tot.select(F.col("event_type").alias("type_a"), F.col("n").alias("na"))
    tb = tot.select(F.col("event_type").alias("type_b"), F.col("n").alias("nb"))
    return (
        pair.join(F.broadcast(ta), "type_a")
        .join(F.broadcast(tb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_both",
            F.round(
                F.col("n_both") * 1.0 / (F.col("na") + F.col("nb") - F.col("n_both")),
                4,
            ).alias("user_jaccard"),
        )
        .orderBy("type_a", "type_b")
    )


@register(
    "graph_reciprocity",
    doc="weighted reciprocity of the directed event-transition graph: "
    "per edge (a -> b), is the reverse transition also observed, and "
    "the global weighted reciprocity sum(min(w_ab, w_ba)) / sum(w) -- "
    "the back-and-forth vs one-way-funnel structure number. One "
    "(src, dst) rollup full-outer-joined with its own transpose.",
    oracle="""
WITH edges AS (
  SELECT prev_type AS src, event_type AS dst, count(*)::DOUBLE AS w
  FROM (
    SELECT event_type,
           lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
    FROM events
  )
  WHERE prev_type IS NOT NULL AND prev_type <> event_type
  GROUP BY src, dst
),
j AS (
  SELECT e.src, e.dst, e.w, COALESCE(r.w, 0.0) AS wr
  FROM edges e LEFT JOIN edges r ON r.src = e.dst AND r.dst = e.src
)
SELECT CAST(count(*) AS BIGINT) AS n_directed_edges,
       CAST(SUM(CASE WHEN wr > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_reciprocated,
       ROUND(SUM(LEAST(w, wr)) / SUM(w), 4) AS weighted_reciprocity
FROM j
""",
)
def graph_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNotNull()
            & (F.col("prev_type") != F.col("event_type"))
        )
        .groupBy(F.col("prev_type").alias("src"), F.col("event_type").alias("dst"))
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    r = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), F.col("w").alias("wr")
    )
    j = edges.join(r, ["src", "dst"], "left").select(
        "w", F.coalesce("wr", F.lit(0.0)).alias("wr")
    )
    return j.agg(
        F.count(F.lit(1)).alias("n_directed_edges"),
        F.sum((F.col("wr") > 0).cast("int")).alias("n_reciprocated"),
        F.round(F.sum(F.least("w", "wr")) / F.sum("w"), 4).alias(
            "weighted_reciprocity"
        ),
    )


def _stationary_oracle(n_iter: int = 8, bits: int = 30) -> str:
    g = 1 << bits

    def snap(x: str) -> str:
        return f"floor(({x}) * {g} + 0.5) / {g}"

    blocks = [
        """edges AS MATERIALIZED (
  SELECT prev_type AS src, event_type AS dst, count(*)::DOUBLE AS w
  FROM (
    SELECT event_type,
           lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
    FROM events
  )
  WHERE prev_type IS NOT NULL
  GROUP BY src, dst
),
nodes AS MATERIALIZED (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
ow AS MATERIALIZED (SELECT src, SUM(w) AS ow FROM edges GROUP BY src),
e AS MATERIALIZED (SELECT edges.src, edges.dst, edges.w / ow.ow AS frac FROM edges JOIN ow ON ow.src = edges.src),
emp AS MATERIALIZED (
  SELECT ow.src AS node, ow.ow / (SELECT SUM(ow) FROM ow) AS share FROM ow
),
p0 AS (SELECT node, 1.0 / nn.n AS p FROM nodes, nn)"""
    ]
    for i in range(1, n_iter + 1):
        blocks.append(
            f"""s{i} AS MATERIALIZED (
  SELECT e.dst AS node, SUM(p.p * e.frac) AS np
  FROM e JOIN p{i - 1} p ON p.node = e.src GROUP BY e.dst
),
p{i} AS MATERIALIZED (
  SELECT nodes.node, {snap(f'coalesce(s{i}.np, 0.0)')} AS p
  FROM nodes LEFT JOIN s{i} ON s{i}.node = nodes.node
)"""
        )
    body = ",\n".join(blocks)
    return f"""
WITH {body}
SELECT p.node, p.p AS stationary_p,
       ROUND(coalesce(emp.share, 0.0), 6) AS empirical_share,
       ROUND(abs(p.p - coalesce(emp.share, 0.0)), 6) AS gap
FROM p{n_iter} p LEFT JOIN emp ON emp.node = p.node
ORDER BY p.node
"""


@register(
    "graph_markov_stationary",
    oracle=_stationary_oracle(),
    doc="stationary distribution of the event-transition chain by 8 "
    "grid-snapped power-iteration rounds from the uniform start, "
    "reported against the EMPIRICAL visit shares the entropy-rate "
    "query uses -- the gap column audits whether the observed mix "
    "has mixed to equilibrium (a large gap flags non-stationary "
    "behavior). Same per-round join/sum shape and chained-"
    "MATERIALIZED-CTE replay as pagerank/PPR/absorbing.",
)
def graph_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    n_iter, bits = 8, 30
    g = float(1 << bits)
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy(F.col("prev_type").alias("src"), F.col("event_type").alias("dst"))
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    ).localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .coalesce(1)
        .localCheckpoint(eager=True)
    )
    nn = nodes.count()
    ow = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    e = edges.join(ow, "src").select(
        "src", "dst", (F.col("w") / F.col("ow")).alias("frac")
    ).localCheckpoint(eager=True)
    tot = ow.agg(F.sum("ow").alias("t"))
    emp = ow.crossJoin(F.broadcast(tot)).select(
        F.col("src").alias("node"), (F.col("ow") / F.col("t")).alias("share")
    )
    p = nodes.select("node", F.lit(1.0 / nn).alias("p"))
    for _ in range(n_iter):
        s = (
            e.join(p, e.src == p.node)
            .groupBy(F.col("dst").alias("n2"))
            .agg(F.sum(F.col("p") * F.col("frac")).alias("np"))
        )
        p = (
            nodes.join(s, nodes.node == F.col("n2"), "left")
            .select(
                "node",
                (F.floor(F.coalesce("np", F.lit(0.0)) * g + 0.5) / g).alias("p"),
            )
            .coalesce(1)
            .localCheckpoint(eager=True)
        )
    return (
        p.join(emp, "node", "left")
        .select(
            "node",
            F.col("p").alias("stationary_p"),
            F.round(F.coalesce("share", F.lit(0.0)), 6).alias("empirical_share"),
            F.round(F.abs(F.col("p") - F.coalesce("share", F.lit(0.0))), 6).alias("gap"),
        )
        .orderBy("node")
    )


@register(
    "mv_join_delta_maintenance",
    doc="incremental maintenance of a JOIN materialized view (the delta "
    "rule, completing mv_incremental_maintain's aggregate-MV story): "
    "with base tables split into (old, delta) by key hash, the "
    "refreshed join MV is MV_old UNION dA>|<B_old UNION A_old>|<dB "
    "UNION dA>|<dB -- three delta joins whose SMALL sides broadcast "
    "(plan-tested), instead of re-joining two full tables. At 100 TB "
    "this is the difference between shuffling the facts nightly and "
    "shuffling 5%% deltas; the splits partition the key space, so the "
    "union is exactly the full join (THE correctness claim, proved "
    "against the full-join oracle). Readout aggregates the maintained "
    "MV per order priority.",
    oracle="""
SELECT o.o_orderpriority AS priority,
       count(*) AS n_lines,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY 1 ORDER BY priority
""",
)
def mv_join_delta_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from testlog_etl_spark.tables import load_tables

    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    o = t["orders"].select("o_orderkey", "o_orderpriority")
    l = t["lineitem"].select(  # noqa: E741
        F.col("l_orderkey").alias("o_orderkey"), "l_extendedprice", "l_discount"
    )
    # "yesterday's" base vs "today's" arrivals: ~5% of each side lands in
    # the delta (independent key-hash splits; together they PARTITION the
    # key space so the four-way union is exactly the full join)
    o_new = F.pmod(F.xxhash64("o_orderkey"), F.lit(20)) == 0
    l_new = F.pmod(F.xxhash64("o_orderkey", F.lit(1)), F.lit(20)) == 0
    o0, do = o.filter(~o_new), o.filter(o_new)
    l0, dl = l.filter(~l_new), l.filter(l_new)

    mv_old = l0.join(o0, "o_orderkey")
    # delta joins: the delta side is small by construction -> broadcast it,
    # the big side never shuffles
    d1 = l0.join(F.broadcast(do), "o_orderkey")
    d2 = dl.join(F.broadcast(o0.join(F.broadcast(dl.select("o_orderkey").distinct()), "o_orderkey", "left_semi")), "o_orderkey")
    d3 = dl.join(F.broadcast(do), "o_orderkey")
    # d2's build side: only the old-order rows whose keys appear in dl --
    # semi-pruned BEFORE broadcasting, the standard delta-join trick
    refreshed = mv_old.unionByName(d1).unionByName(d2).unionByName(d3)
    return (
        refreshed.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            ),
        )
        .orderBy("priority")
    )


def _markov_attr_oracle(n_iter: int = 8, bits: int = 30) -> str:
    g = 1 << bits

    def snap(x: str) -> str:
        return f"floor(({x}) * {g} + 0.5) / {g}"

    blocks = [
        f"""e0 AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN floor(epoch(ts)) - floor(epoch(
                lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))) > 1800
              THEN 1 ELSE 0 END AS brk
  FROM events
),
s AS (
  SELECT user_id, ts, event_id, event_type,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM e0
),
tp AS (
  SELECT user_id, sid, MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_conv
  FROM s GROUP BY user_id, sid
),
touch AS (
  SELECT s.user_id, s.sid, s.ts, s.event_id, s.event_type, tp.t_conv
  FROM s JOIN tp ON tp.user_id = s.user_id AND tp.sid = s.sid
  WHERE s.event_type != 'purchase' AND (tp.t_conv IS NULL OR s.ts < tp.t_conv)
),
ord AS (
  SELECT *, row_number() OVER (PARTITION BY user_id, sid ORDER BY ts, event_id) AS rn,
         lead(event_type) OVER (PARTITION BY user_id, sid ORDER BY ts, event_id) AS nxt
  FROM touch
),
raw_edges AS (
  SELECT 'START' AS src, event_type AS dst FROM ord WHERE rn = 1
  UNION ALL
  SELECT event_type,
         COALESCE(nxt, CASE WHEN t_conv IS NOT NULL THEN 'CONV' ELSE 'LOST' END)
  FROM ord
  UNION ALL
  SELECT 'START', 'CONV' FROM tp t
  WHERE t.t_conv IS NOT NULL AND NOT EXISTS (
    SELECT 1 FROM touch WHERE touch.user_id = t.user_id AND touch.sid = t.sid)
),
edges AS (SELECT src, dst, count(*)::DOUBLE AS w FROM raw_edges GROUP BY src, dst),
ow AS (SELECT src, SUM(w) AS ow FROM edges GROUP BY src),
ef AS (SELECT edges.src, edges.dst, edges.w / ow.ow AS frac
       FROM edges JOIN ow ON ow.src = edges.src),
channels AS (SELECT DISTINCT event_type AS ch FROM touch),
scen AS (SELECT 'full' AS scen UNION ALL SELECT ch FROM channels),
se AS (
  SELECT scen.scen, ef.src,
         CASE WHEN ef.dst = scen.scen THEN 'LOST' ELSE ef.dst END AS dst,
         SUM(ef.frac) AS frac
  FROM scen CROSS JOIN ef
  WHERE ef.src != scen.scen
  GROUP BY scen.scen, ef.src, 3
),
states AS (
  SELECT ch AS node FROM channels
  UNION ALL SELECT 'START' UNION ALL SELECT 'CONV' UNION ALL SELECT 'LOST'
),
sn AS (SELECT scen.scen, states.node FROM scen CROSS JOIN states),
p0 AS (SELECT scen, node, CASE WHEN node = 'CONV' THEN 1.0 ELSE 0.0 END AS p FROM sn)"""
    ]
    for i in range(1, n_iter + 1):
        blocks.append(
            f"""s{i} AS (
  SELECT se.scen, se.src AS node, SUM(se.frac * p.p) AS np
  FROM se JOIN p{i - 1} p ON p.scen = se.scen AND p.node = se.dst
  GROUP BY se.scen, se.src
),
p{i} AS (
  SELECT sn.scen, sn.node,
         CASE WHEN sn.node = 'CONV' THEN 1.0
              WHEN sn.node = 'LOST' THEN 0.0
              ELSE {snap(f'coalesce(s{i}.np, 0.0)')} END AS p
  FROM sn LEFT JOIN s{i} ON s{i}.scen = sn.scen AND s{i}.node = sn.node
)"""
        )
    body = ",\n".join(blocks)
    return f"""
WITH {body},
res AS (SELECT scen, p FROM p{n_iter} WHERE node = 'START'),
base AS (SELECT p AS pf FROM res WHERE scen = 'full'),
eff AS (
  SELECT res.scen AS channel, res.p AS p_removed,
         GREATEST(1 - res.p / NULLIF(base.pf, 0), 0) AS removal_effect
  FROM res, base WHERE res.scen != 'full'
),
tot AS (SELECT SUM(removal_effect) AS te FROM eff)
SELECT channel,
       ROUND((SELECT pf FROM base), 6) AS p_full,
       ROUND(p_removed, 6) AS p_removed,
       ROUND(removal_effect, 4) AS removal_effect,
       ROUND(removal_effect / NULLIF(tot.te, 0), 4) AS attribution_share
FROM eff, tot
ORDER BY channel
"""


@register(
    "attribution_markov_removal",
    oracle=_markov_attr_oracle(),
    doc="Markov removal-effect attribution, the model-based member of "
    "the attribution family (last-touch and linear are positional): "
    "session journeys (30-min gaps, touches before first purchase) "
    "build a START/channels/CONV/LOST transition chain, and each "
    "channel's credit is its REMOVAL EFFECT -- how much the START->"
    "CONV absorption probability (8-step horizon, grid-snapped "
    "pagerank playbook) drops when visits to that channel are "
    "redirected to LOST. All five scenarios (full + one removal per "
    "channel) solve in ONE joint iteration over the (scenario, node) "
    "frame -- the scenario dimension rides the same tiny-join loop, "
    "not five separate passes. Data-scale work is only the journey "
    "edge rollup; the chain frame is (channels+3) x scenarios rows. "
    "CONTRACT: the channel taxonomy must be bounded -- a transition "
    "frame past 4096 edges (~61 channels) RAISES rather than silently "
    "degrading; attribution credit is not meaningful under an ad-hoc "
    "tail collapse, so bucketing wide taxonomies (e.g. to OTHER via "
    "the edges _resolve_others idiom) is an explicit upstream modeling "
    "decision, not something this operator does behind your back.",
)
def attribution_markov_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from testlog_etl_spark.tables import load_tables

    n_iter, bits = 8, 30
    g = float(1 << bits)
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    brk = (
        F.floor(F.unix_timestamp("ts")) - F.floor(F.unix_timestamp(F.lag("ts").over(wo)))
        > 1800
    ).cast("int")
    s = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.sum(F.coalesce(brk, F.lit(0)))
        .over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("sid"),
    )
    tp = s.groupBy("user_id", "sid").agg(
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_conv")
    )
    touch = s.join(tp, ["user_id", "sid"]).filter(
        (F.col("event_type") != "purchase")
        & (F.col("t_conv").isNull() | (F.col("ts") < F.col("t_conv")))
    )
    ws = Window.partitionBy("user_id", "sid").orderBy("ts", "event_id")
    ordd = touch.withColumn("rn", F.row_number().over(ws)).withColumn(
        "nxt", F.lead("event_type").over(ws)
    )
    start_edges = ordd.filter(F.col("rn") == 1).select(
        F.lit("START").alias("src"), F.col("event_type").alias("dst")
    )
    step_edges = ordd.select(
        F.col("event_type").alias("src"),
        F.coalesce(
            "nxt", F.when(F.col("t_conv").isNotNull(), "CONV").otherwise("LOST")
        ).alias("dst"),
    )
    bare_conv = (
        tp.filter(F.col("t_conv").isNotNull())
        .join(touch.select("user_id", "sid").distinct(), ["user_id", "sid"], "left_anti")
        .select(F.lit("START").alias("src"), F.lit("CONV").alias("dst"))
    )
    edges = (
        start_edges.unionByName(step_edges)
        .unionByName(bare_conv)
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    ow = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    ef = edges.join(ow, "src").select("src", "dst", (F.col("w") / F.col("ow")).alias("frac"))

    # chain solve: the transition frame is (channels+3)^2 <= ~50 rows
    # BY CONSTRUCTION, so it collects to the driver (the k-means/D9
    # bounded-collect rule) and the 8-round x 5-scenario fold runs in
    # exact Python -- the same snap arithmetic as the CTE replay. The
    # first cut of this operator looped DataFrame joins with eager
    # localCheckpoints instead: a checkpoint under an unexecuted
    # broadcast exchange stalls until spark.sql.broadcastTimeout (300 s)
    # and the unpersisted 8-round lineage blew the default session's
    # heap -- measured, hence this shape.
    import math

    # the bound is CHECKED, not assumed (r10, same policy as the
    # distributed quantile rewrite): the channel domain is the data's
    # event_type domain, and nothing upstream enforces its size -- a
    # scaling domain raises instead of silently walking an unbounded
    # frame on the driver. 4096 = (channels+3)^2 at ~61 channels, far
    # above any real channel taxonomy, still trivially driver-sized.
    _EDGE_CAP = 4096
    collected = ef.limit(_EDGE_CAP + 1).collect()
    if len(collected) > _EDGE_CAP:
        raise ValueError(
            "attribution_markov_removal: transition-edge frame exceeds "
            f"{_EDGE_CAP} rows -- the channel (event_type) domain scales "
            "with the data; bucket channels upstream before the chain solve"
        )
    frac_rows = [(r.src, r.dst, float(r.frac)) for r in collected]
    chans = sorted({s for s, _, _ in frac_rows if s != "START"})
    def solve(removed):
        edges_s = {}
        for s_, d_, f_ in sorted(frac_rows):
            if s_ == removed:
                continue
            d2 = "LOST" if d_ == removed else d_
            edges_s.setdefault(s_, []).append((d2, f_))
        nodes = set(edges_s) | {d for outs in edges_s.values() for d, _ in outs}
        pv = {n: (1.0 if n == "CONV" else 0.0) for n in nodes | {"CONV", "LOST", "START"}}
        for _ in range(n_iter):
            nxt = {}
            for n in pv:
                if n == "CONV":
                    nxt[n] = 1.0
                elif n == "LOST":
                    nxt[n] = 0.0
                else:
                    acc = 0.0
                    for d2, f_ in edges_s.get(n, ()):  # sorted fold order
                        acc += f_ * pv.get(d2, 0.0)
                    nxt[n] = math.floor(acc * g + 0.5) / g
            pv = nxt
        return pv.get("START", 0.0)

    p_full = solve(None)
    effs = []
    for ch in chans:
        p_rem = solve(ch)
        effect = max(1.0 - (p_rem / p_full), 0.0) if p_full else 0.0
        effs.append((ch, p_rem, effect))
    te = sum(e for _, _, e in effs)
    out_rows = [
        (
            ch,
            round(p_full, 6),
            round(p_rem, 6),
            round(e, 4),
            round(e / te, 4) if te else None,
        )
        for ch, p_rem, e in effs
    ]
    return spark.createDataFrame(
        out_rows,
        "channel string, p_full double, p_removed double, "
        "removal_effect double, attribution_share double",
    ).orderBy("channel")


_DOC_GRAPH_SQL = """mx AS (SELECT max(doc_id) AS m FROM documents),
e_raw AS (
  SELECT doc_id AS src, doc_id * 2 AS dst FROM documents
  WHERE doc_id >= 1 AND doc_id * 2 <= (SELECT m FROM mx)
  UNION ALL
  SELECT doc_id, doc_id * 2 + 1 FROM documents
  WHERE doc_id >= 1 AND doc_id * 2 + 1 <= (SELECT m FROM mx)
  UNION ALL
  SELECT doc_id, doc_id + 37 FROM documents
  WHERE doc_id + 37 <= (SELECT m FROM mx)
),
und AS (SELECT src, dst FROM e_raw UNION SELECT dst, src FROM e_raw),
deg AS (SELECT src AS node, count(*)::BIGINT AS deg FROM und GROUP BY src)"""


def _doc_graph(spark: SparkSession, sf_dir: str):
    """The doc-tree + skip-link graph (graph_bfs_reach / kcore / sssp
    edge set) as (und directed-both-ways, deg) DataFrames."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    ids = docs.select("doc_id")
    mx = ids.agg(F.max("doc_id").alias("_m"))
    base = ids.crossJoin(F.broadcast(mx))
    e0 = (
        base.filter((F.col("doc_id") >= 1) & (F.col("doc_id") * 2 <= F.col("_m")))
        .select(F.col("doc_id").alias("src"), (F.col("doc_id") * 2).alias("dst"))
        .union(
            base.filter((F.col("doc_id") >= 1) & (F.col("doc_id") * 2 + 1 <= F.col("_m")))
            .select(F.col("doc_id").alias("src"), (F.col("doc_id") * 2 + 1).alias("dst"))
        )
        .union(
            base.filter(F.col("doc_id") + 37 <= F.col("_m"))
            .select(F.col("doc_id").alias("src"), (F.col("doc_id") + 37).alias("dst"))
        )
    )
    und = e0.union(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct()
    deg = und.groupBy(F.col("src").alias("node")).agg(F.count(F.lit(1)).alias("deg"))
    return und, deg


@register(
    "graph_linkpred_scores",
    doc="link-prediction scores on the doc-tree + skip-link graph "
    "(the bfs/kcore/sssp edge set): for every NON-adjacent pair "
    "(u < v) sharing at least one neighbor, common-neighbor count, "
    "Jaccard cn/(deg_u + deg_v - cn), and Adamic-Adar "
    "SUM 1/ln(deg_w) over the shared neighbors w. Wedge enumeration "
    "through the common endpoint is the standard distributed "
    "formulation; fan-out is bounded by the max degree (5 here: "
    "parent, two children, two skip links), so the pair explosion is "
    "O(E * maxdeg), not quadratic. cn/jaccard are exact-integer "
    "derived (unrounded, identical doubles); only the transcendental "
    "AA sum is rounded.",
    oracle=f"""
WITH {_DOC_GRAPH_SQL},
wedge AS (
  SELECT a.dst AS u, b.dst AS v, a.src AS w
  FROM und a JOIN und b ON a.src = b.src AND a.dst < b.dst
),
cand AS (
  SELECT u, v, count(*)::BIGINT AS cn,
         SUM(1.0 / ln(deg.deg)) AS aa
  FROM wedge JOIN deg ON deg.node = wedge.w
  GROUP BY u, v
),
nonadj AS (
  SELECT cand.* FROM cand
  WHERE NOT EXISTS (SELECT 1 FROM und WHERE und.src = cand.u AND und.dst = cand.v)
)
SELECT n.u, n.v, n.cn,
       n.cn * 1.0 / (du.deg + dv.deg - n.cn) AS jaccard,
       ROUND(n.aa, 4) AS adamic_adar
FROM nonadj n
JOIN deg du ON du.node = n.u
JOIN deg dv ON dv.node = n.v
ORDER BY n.u, n.v
""",
)
def graph_linkpred_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    und, deg = _doc_graph(spark, sf_dir)
    a = und.select(F.col("src").alias("w"), F.col("dst").alias("u"))
    b = und.select(F.col("src").alias("w"), F.col("dst").alias("v"))
    wedge = a.join(b, "w").filter(F.col("u") < F.col("v"))
    cand = (
        wedge.join(deg.select(F.col("node").alias("w"), F.col("deg").alias("degw")), "w")
        .groupBy("u", "v")
        .agg(
            F.count(F.lit(1)).alias("cn"),
            F.sum(1.0 / F.log("degw")).alias("aa"),
        )
    )
    nonadj = cand.join(
        und.select(F.col("src").alias("u"), F.col("dst").alias("v")),
        ["u", "v"],
        "left_anti",
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("deg_v"))
    return (
        nonadj.join(du, "u")
        .join(dv, "v")
        .select(
            "u",
            "v",
            "cn",
            (F.col("cn") * 1.0 / (F.col("deg_u") + F.col("deg_v") - F.col("cn"))).alias("jaccard"),
            F.round("aa", 4).alias("adamic_adar"),
        )
        .orderBy("u", "v")
    )


@register(
    "graph_rich_club",
    doc="rich-club coefficient phi(k) = 2 E_k / (N_k (N_k - 1)) on the "
    "doc-tree + skip-link graph: for each degree threshold k, the "
    "density of the subgraph induced by nodes with degree > k. One "
    "degree rollup, one canonical-edge (u < v) table, a tiny "
    "threshold grid broadcast against both -- all integer counts, so "
    "phi is an identical-double integer ratio on both engines "
    "(unrounded). Thresholds with fewer than two qualifying nodes "
    "are dropped (phi undefined).",
    oracle=f"""
WITH {_DOC_GRAPH_SQL},
uv AS (SELECT src AS u, dst AS v FROM und WHERE src < dst),
grid AS (SELECT k FROM (SELECT unnest(range(0, 10)) AS k)),
nk AS (
  SELECT g.k, count(*)::BIGINT AS n_nodes
  FROM grid g JOIN deg d ON d.deg > g.k GROUP BY g.k
),
ek AS (
  SELECT g.k, count(*)::BIGINT AS n_edges
  FROM grid g
  JOIN uv ON TRUE
  JOIN deg du ON du.node = uv.u AND du.deg > g.k
  JOIN deg dv ON dv.node = uv.v AND dv.deg > g.k
  GROUP BY g.k
)
SELECT nk.k::BIGINT AS k, nk.n_nodes, COALESCE(ek.n_edges, 0) AS n_edges,
       2.0 * COALESCE(ek.n_edges, 0) / (nk.n_nodes * (nk.n_nodes - 1)) AS phi
FROM nk LEFT JOIN ek USING (k)
WHERE nk.n_nodes >= 2
ORDER BY k
""",
)
def graph_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    und, deg = _doc_graph(spark, sf_dir)
    uv = und.filter(F.col("src") < F.col("dst")).select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    )
    grid = spark.range(0, 10).select(F.col("id").alias("k"))
    nk = (
        F.broadcast(grid)
        .join(deg, deg["deg"] > F.col("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("deg_v"))
    euv = uv.join(du, "u").join(dv, "v")
    ek = (
        F.broadcast(grid)
        .join(euv, (F.col("deg_u") > F.col("k")) & (F.col("deg_v") > F.col("k")))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_edges"))
    )
    return (
        nk.join(ek, "k", "left")
        .select(
            F.col("k").cast("long").alias("k"),
            "n_nodes",
            F.coalesce(F.col("n_edges"), F.lit(0)).alias("n_edges"),
            (
                2.0 * F.coalesce(F.col("n_edges"), F.lit(0))
                / (F.col("n_nodes") * (F.col("n_nodes") - 1))
            ).alias("phi"),
        )
        .filter(F.col("n_nodes") >= 2)
        .orderBy("k")
    )


@register(
    "graph_katz_bounded",
    doc="Katz centrality truncated at 4 hops on the doc-tree + "
    "skip-link graph, alpha = 1/8: c_i = SUM_k alpha^k w_k(i) where "
    "w_k = A w_{k-1} counts length-k walks ending at i (A symmetric "
    "here). Walk counts are exact integers and the dyadic alpha^k "
    "weights are exact doubles, so c is engine-identical before one "
    "presentation rounding. Fixed rounds -> the DuckDB oracle IS the "
    "computation (chained CTEs, the kcore pattern); per round one "
    "node-keyed join + aggregate, frontier volume bounded by "
    "E * maxdeg^k with maxdeg 5.",
    oracle=f"""
WITH {_DOC_GRAPH_SQL},
w0 AS (SELECT node, 1::BIGINT AS w FROM deg),
w1 AS (
  SELECT und.dst AS node, SUM(w0.w)::BIGINT AS w
  FROM und JOIN w0 ON w0.node = und.src GROUP BY und.dst
),
w2 AS (
  SELECT und.dst AS node, SUM(w1.w)::BIGINT AS w
  FROM und JOIN w1 ON w1.node = und.src GROUP BY und.dst
),
w3 AS (
  SELECT und.dst AS node, SUM(w2.w)::BIGINT AS w
  FROM und JOIN w2 ON w2.node = und.src GROUP BY und.dst
),
w4 AS (
  SELECT und.dst AS node, SUM(w3.w)::BIGINT AS w
  FROM und JOIN w3 ON w3.node = und.src GROUP BY und.dst
)
SELECT deg.node,
       COALESCE(w1.w, 0) * 0.125::DOUBLE
     + COALESCE(w2.w, 0) * 0.015625::DOUBLE
     + COALESCE(w3.w, 0) * 0.001953125::DOUBLE
     + COALESCE(w4.w, 0) * 0.000244140625::DOUBLE AS katz
FROM deg
LEFT JOIN w1 ON w1.node = deg.node
LEFT JOIN w2 ON w2.node = deg.node
LEFT JOIN w3 ON w3.node = deg.node
LEFT JOIN w4 ON w4.node = deg.node
ORDER BY deg.node
""",
)
def graph_katz_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    und, deg = _doc_graph(spark, sf_dir)
    w = deg.select("node", F.lit(1).cast("long").alias("w"))
    rounds = []
    for _ in range(4):
        w = (
            und.join(w, und["src"] == w["node"])
            .groupBy(und["dst"].alias("node"))
            .agg(F.sum("w").alias("w"))
        )
        rounds.append(w)
    out = deg.select("node")
    alphas = [0.125, 0.015625, 0.001953125, 0.000244140625]
    for i, (wk, a) in enumerate(zip(rounds, alphas)):
        out = out.join(
            wk.select(F.col("node"), F.col("w").alias(f"w{i}")), "node", "left"
        )
    katz = sum(
        F.coalesce(F.col(f"w{i}"), F.lit(0)) * F.lit(a) for i, a in enumerate(alphas)
    )
    return out.select("node", katz.alias("katz")).orderBy("node")


@register(
    "graph_avg_neighbor_degree",
    doc="degree-correlation profile k_nn(k) on the doc-tree + "
    "skip-link graph: for each degree class k, the mean over nodes "
    "of that degree of their mean neighbor degree -- the local view "
    "whose slope sign graph_degree_assortativity summarizes as one "
    "r. Two node-keyed joins over the shared edge set; per-node "
    "mean neighbor degree is an exact integer ratio, and the final "
    "per-class mean reassociates over class members, rounded at 4.",
    oracle=f"""
WITH {_DOC_GRAPH_SQL},
nbr AS (
  SELECT und.src AS node, SUM(d2.deg)::BIGINT AS nbr_deg_sum
  FROM und JOIN deg d2 ON d2.node = und.dst
  GROUP BY und.src
),
pern AS (
  SELECT deg.node, deg.deg, nbr.nbr_deg_sum * 1.0 / deg.deg AS mean_nbr_deg
  FROM deg JOIN nbr ON nbr.node = deg.node
)
SELECT deg AS k, count(*)::BIGINT AS n_nodes,
       ROUND(AVG(mean_nbr_deg), 4) AS k_nn
FROM pern GROUP BY deg ORDER BY k
""",
)
def graph_avg_neighbor_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    und, deg = _doc_graph(spark, sf_dir)
    d2 = deg.select(F.col("node").alias("dst"), F.col("deg").alias("ddeg"))
    nbr = und.join(d2, "dst").groupBy(F.col("src").alias("node")).agg(
        F.sum("ddeg").alias("nbr_deg_sum")
    )
    pern = deg.join(nbr, "node").select(
        "deg", (F.col("nbr_deg_sum") * 1.0 / F.col("deg")).alias("mean_nbr_deg")
    )
    return (
        pern.groupBy(F.col("deg").alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.round(F.avg("mean_nbr_deg"), 4).alias("k_nn"),
        )
        .orderBy("k")
    )


@register(
    "compliance_subject_access_report",
    doc="right-of-access (GDPR Art. 15) export manifest for a panel of "
    "data subjects: for each subject (customers 1, 7, 42 -- the "
    "compliance_delete_sweep panel shape), one row per table holding "
    "their records with counts and first/last record timestamps -- "
    "orders by custkey, line items through the order join, events by "
    "user_id. The manifest is what an access-request pipeline "
    "actually ships; at 100 TB each per-table probe is a semi-join "
    "on the subject panel (broadcast), never a full scan of "
    "unrelated subjects' data. Timestamps render as UTC strings "
    "(TZ-proof).",
    oracle="""
WITH panel AS (SELECT unnest([1, 7, 42]) AS subject_id),
o AS (
  SELECT o_custkey AS subject_id, 'orders' AS table_name,
         count(*)::BIGINT AS n_records,
         strftime(MIN(o_orderdate), '%Y-%m-%d %H:%M:%S') AS first_record,
         strftime(MAX(o_orderdate), '%Y-%m-%d %H:%M:%S') AS last_record
  FROM orders JOIN panel ON panel.subject_id = o_custkey
  GROUP BY o_custkey
),
l AS (
  SELECT o.o_custkey AS subject_id, 'lineitem' AS table_name,
         count(*)::BIGINT AS n_records,
         strftime(MIN(li.l_shipdate), '%Y-%m-%d %H:%M:%S') AS first_record,
         strftime(MAX(li.l_shipdate), '%Y-%m-%d %H:%M:%S') AS last_record
  FROM lineitem li
  JOIN orders o ON o.o_orderkey = li.l_orderkey
  JOIN panel ON panel.subject_id = o.o_custkey
  GROUP BY o.o_custkey
),
e AS (
  SELECT user_id AS subject_id, 'events' AS table_name,
         count(*)::BIGINT AS n_records,
         strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS first_record,
         strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS last_record
  FROM events JOIN panel ON panel.subject_id = user_id
  GROUP BY user_id
)
SELECT * FROM o UNION ALL SELECT * FROM l UNION ALL SELECT * FROM e
ORDER BY subject_id, table_name
""",
)
def compliance_subject_access_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders", "lineitem", "events"))
    panel = spark.createDataFrame([(1,), (7,), (42,)], "subject_id long")
    fmt = "yyyy-MM-dd HH:mm:ss"

    def manifest(df, key, table, ts_col):
        return (
            df.join(F.broadcast(panel), df[key] == panel["subject_id"])
            .groupBy("subject_id")
            .agg(
                F.count(F.lit(1)).alias("n_records"),
                F.date_format(F.min(ts_col), fmt).alias("first_record"),
                F.date_format(F.max(ts_col), fmt).alias("last_record"),
            )
            .select(
                "subject_id",
                F.lit(table).alias("table_name"),
                "n_records",
                "first_record",
                "last_record",
            )
        )

    o = manifest(t["orders"], "o_custkey", "orders", "o_orderdate")
    li = t["lineitem"].join(
        t["orders"].select("o_orderkey", "o_custkey"),
        t["lineitem"]["l_orderkey"] == F.col("o_orderkey"),
    )
    l = manifest(li, "o_custkey", "lineitem", "l_shipdate")
    e = manifest(t["events"], "user_id", "events", "ts")
    return o.unionAll(l).unionAll(e).orderBy("subject_id", "table_name")


@register(
    "events_position_in_session_ctr",
    doc="position-in-session behavior decay: sessionize each user's "
    "events with the standard 30-minute gap rule (one user-keyed "
    "exchange shared by the gap lag, the session-id running sum, and "
    "the position row_number -- the sessionize_batch plan shape), "
    "then report, per within-session position bucket (1, 2, 3, 4-5, "
    "6-10, 11+), event counts and the purchase share at that "
    "position -- the engagement-decay curve. Counts integral; the "
    "share is an exact integer ratio emitted unrounded.",
    oracle="""
WITH seq AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN floor(epoch(ts)) - floor(epoch(LAG(ts) OVER
              (PARTITION BY user_id ORDER BY ts, event_id))) > 1800
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sess AS (
  SELECT user_id, ts, event_id, event_type,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM seq
),
pos AS (
  SELECT event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id, session_id ORDER BY ts, event_id) AS p
  FROM sess
),
b AS (
  SELECT CASE WHEN p = 1 THEN '1' WHEN p = 2 THEN '2' WHEN p = 3 THEN '3'
              WHEN p <= 5 THEN '4-5' WHEN p <= 10 THEN '6-10' ELSE '11+' END AS position_bucket,
         (event_type = 'purchase')::INT AS y
  FROM pos
)
SELECT position_bucket, count(*)::BIGINT AS n_events,
       SUM(y)::BIGINT AS n_purchases,
       SUM(y) * 1.0 / count(*) AS purchase_share
FROM b GROUP BY position_bucket ORDER BY position_bucket
""",
)
def events_position_in_session_ctr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    u = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(u)
    new_session = F.when(
        prev.isNull()
        | ((F.floor(F.unix_timestamp("ts")) - F.floor(F.unix_timestamp(prev))) > 1800),
        1,
    ).otherwise(0)
    sess = ev.withColumn("new_session", new_session).withColumn(
        "session_id",
        F.sum("new_session").over(u.rowsBetween(W.unboundedPreceding, 0)),
    )
    pos = sess.withColumn(
        "p",
        F.row_number().over(
            W.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
        ),
    )
    bucket = (
        F.when(F.col("p") == 1, "1")
        .when(F.col("p") == 2, "2")
        .when(F.col("p") == 3, "3")
        .when(F.col("p") <= 5, "4-5")
        .when(F.col("p") <= 10, "6-10")
        .otherwise("11+")
    )
    b = pos.select(
        bucket.alias("position_bucket"),
        (F.col("event_type") == "purchase").cast("int").alias("y"),
    )
    return (
        b.groupBy("position_bucket")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("y").cast("long").alias("n_purchases"))
        .select(
            "position_bucket",
            "n_events",
            "n_purchases",
            (F.col("n_purchases") * 1.0 / F.col("n_events")).alias("purchase_share"),
        )
        .orderBy("position_bucket")
    )


@register(
    "events_tenure_activity_curve",
    doc="activity-by-tenure decay curve: for each user, tenure week = "
    "epoch-week of the event minus epoch-week of the user's FIRST "
    "event; per tenure week, active-user count, events, and events "
    "per active user -- the engagement-decay companion to "
    "events_retention_cohorts (that one asks 'did they return', this "
    "one 'how hard do they use it'). Two user-keyed rollups (first "
    "event, then per-(user, tenure) counts); the week key is "
    "epoch-day div 7, TZ-proof. Counts integral, ratio exact.",
    oracle="""
WITH e AS (
  SELECT user_id, CAST(floor(epoch(ts) / 86400) AS BIGINT) // 7 AS wk
  FROM events
),
f AS (SELECT user_id, MIN(wk) AS first_wk FROM e GROUP BY 1),
t AS (
  SELECT e.user_id, e.wk - f.first_wk AS tenure_wk
  FROM e JOIN f USING (user_id)
),
g AS (
  SELECT tenure_wk, count(*)::BIGINT AS n_events,
         count(DISTINCT user_id)::BIGINT AS n_users
  FROM t GROUP BY tenure_wk
)
SELECT tenure_wk, n_users, n_events,
       n_events * 1.0 / n_users AS events_per_user
FROM g ORDER BY tenure_wk
""",
)
def events_tenure_activity_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    e = ev.select(
        "user_id",
        F.floor(F.floor(F.unix_timestamp("ts") / 86400) / 7).cast("long").alias("wk"),
    )
    f = e.groupBy("user_id").agg(F.min("wk").alias("first_wk"))
    t = e.join(f, "user_id").select("user_id", (F.col("wk") - F.col("first_wk")).alias("tenure_wk"))
    g = t.groupBy("tenure_wk").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )
    return g.select(
        "tenure_wk",
        "n_users",
        "n_events",
        (F.col("n_events") * 1.0 / F.col("n_users")).alias("events_per_user"),
    ).orderBy("tenure_wk")
