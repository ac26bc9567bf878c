"""Oracle-paired queries exercising the JX expression compiler THROUGH the
query runner (SURVEY SS2.2 E1-E31): every case here runs `run_jx` on the
driver's parquet and the oracle SQL spells out the same JX semantics
(missing = null-or-empty, null-skipping arithmetic, clamped string ops)
in portable ANSI SQL for DuckDB.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from testlog_etl_spark.query import run_jx
from testlog_etl_spark.suite import register
from testlog_etl_spark.tables import load_tables

R = 4


@register(
    "jx_setop_strings",
    doc="JX setop: where/select/sort/limit with clamped string ops "
    "(left, find, between, concat, length) over documents.text. "
    "All ops stay in whole-stage codegen; filter pushes to the scan.",
    oracle="""
SELECT
  doc_id,
  substr(text, 1, 12) AS head,
  CASE WHEN instr(text, 'data') > 0 THEN instr(text, 'data') - 1 END AS pos_data,
  nullif(
    CASE WHEN instr(text, 'fast') > 0 THEN
      (CASE WHEN instr(substr(text, instr(text, 'fast') + 4), 'slow') > 0
            THEN substr(substr(text, instr(text, 'fast') + 4), 1,
                        instr(substr(text, instr(text, 'fast') + 4), 'slow') - 1)
       END)
    END, '') AS fast_slow,
  concat_ws('-', nullif(lang, ''), nullif(source, '')) AS lang_source,
  length(text) AS text_len
FROM documents
WHERE lang = 'es' AND length(text) > 150
ORDER BY doc_id
""",
)
def jx_setop_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    tables = load_tables(spark, sf_dir, ("documents",))
    return run_jx(
        spark,
        {
            "from": "documents",
            "where": {"and": [{"eq": {"lang": "es"}}, {"gt": [{"length": "text"}, 150]}]},
            "select": [
                "doc_id",
                {"name": "head", "value": {"left": ["text", {"literal": 12}]}},
                {"name": "pos_data", "value": {"find": ["text", {"literal": "data"}]}},
                {"name": "fast_slow", "value": {"between": "text", "prefix": "fast", "suffix": "slow"}},
                {"name": "lang_source", "value": {"concat": ["lang", "source"], "separator": "-"}},
                {"name": "text_len", "value": {"length": "text"}},
            ],
            "sort": "doc_id",
        },
        tables,
    )


@register(
    "jx_null_semantics",
    doc="JX null/missing semantics over synthesized sparse columns: "
    "eq(missing,missing)=true, null-skipping add, coalesce, scalar count. "
    "The oracle spells each shim out in SQL (IS NOT DISTINCT FROM etc).",
    oracle="""
WITH t AS (
  SELECT event_id,
         CASE WHEN value > 120 THEN value END AS a,
         CASE WHEN event_type = 'purchase' THEN value END AS b
  FROM events
)
SELECT
  event_id,
  (a IS NOT DISTINCT FROM b) AS eq_ab,
  CASE WHEN a IS NULL AND b IS NULL THEN NULL
       ELSE coalesce(a, 0) + coalesce(b, 0) END AS add_ab,
  coalesce(a, b, -1.0) AS first_ab,
  (CASE WHEN a IS NOT NULL THEN 1 ELSE 0 END
   + CASE WHEN b IS NOT NULL THEN 1 ELSE 0 END) AS n_present
FROM t
ORDER BY event_id
""",
)
def jx_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    tables = load_tables(spark, sf_dir, ("events",))
    a = {"when": {"gt": ["value", 120]}, "then": "value"}
    b = {"when": {"eq": {"event_type": "purchase"}}, "then": "value"}
    return run_jx(
        spark,
        {
            "from": "events",
            "select": [
                "event_id",
                {"name": "eq_ab", "value": {"eq": [a, b]}},
                {"name": "add_ab", "value": {"add": [a, b]}},
                {"name": "first_ab", "value": {"coalesce": [a, b, {"literal": -1.0}]}},
                {"name": "n_present", "value": {"count": [a, b]}},
            ],
            "sort": "event_id",
        },
        tables,
    )


@register(
    "jx_arith_floor_bucket",
    doc="JX floor(value, interval) as a computed groupby edge (A14) plus "
    "null-safe div/mod in aggregate position. One hash-agg shuffle.",
    oracle=f"""
SELECT
  floor(l_extendedprice / 5000) * 5000 AS price_bucket,
  count(*) AS n,
  ROUND(SUM(l_quantity), {R}) AS sum_qty,
  ROUND(SUM(l_extendedprice * (1 - l_discount) / 10), {R}) AS sum_tenth
FROM lineitem
GROUP BY 1
ORDER BY price_bucket
""",
)
def jx_arith_floor_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    tables = load_tables(spark, sf_dir, ("lineitem",))
    out = run_jx(
        spark,
        {
            "from": "lineitem",
            "groupby": {"name": "price_bucket", "value": {"floor": ["l_extendedprice", {"literal": 5000}]}},
            "select": [
                {"name": "n", "value": ".", "aggregate": "count"},
                {"name": "sum_qty", "value": "l_quantity", "aggregate": "sum"},
                {
                    "name": "sum_tenth",
                    "value": {"div": [{"mult": ["l_extendedprice", {"sub": [{"literal": 1}, "l_discount"]}]}, {"literal": 10}]},
                    "aggregate": "sum",
                },
            ],
            "sort": "price_bucket",
        },
        tables,
    )
    return out.select("price_bucket", "n", F.round("sum_qty", R).alias("sum_qty"), F.round("sum_tenth", R).alias("sum_tenth"))


@register(
    "jx_when_case_in",
    doc="JX when/case/in conditionals grouped and counted.",
    oracle="""
SELECT
  CASE WHEN o_orderstatus = 'F' THEN 'finished'
       WHEN o_orderstatus = 'O' THEN 'open'
       ELSE 'other' END AS status_label,
  (o_orderpriority IN ('1-URGENT', '2-HIGH')) AS is_hot,
  count(*) AS n,
  ROUND(SUM(o_totalprice), 4) AS total
FROM orders
GROUP BY 1, 2
ORDER BY status_label, is_hot
""",
)
def jx_when_case_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    tables = load_tables(spark, sf_dir, ("orders",))
    out = run_jx(
        spark,
        {
            "from": "orders",
            "groupby": [
                {
                    "name": "status_label",
                    "value": {
                        "case": [
                            {"when": {"eq": {"o_orderstatus": "F"}}, "then": {"literal": "finished"}},
                            {"when": {"eq": {"o_orderstatus": "O"}}, "then": {"literal": "open"}},
                            {"literal": "other"},
                        ]
                    },
                },
                {"name": "is_hot", "value": {"in": ["o_orderpriority", {"literal": ["1-URGENT", "2-HIGH"]}]}},
            ],
            "select": [
                {"name": "n", "value": ".", "aggregate": "count"},
                {"name": "total", "value": "o_totalprice", "aggregate": "sum"},
            ],
            "sort": ["status_label", "is_hot"],
        },
        tables,
    )
    return out.select("status_label", "is_hot", "n", F.round("total", 4).alias("total"))


@register(
    "jx_casts_regex",
    doc="JX lenient casts (number/string round-trip) and full-match regex.",
    oracle="""
SELECT
  regexp_full_match(lang, '[a-f].*') AS lang_af,
  count(*) AS n,
  SUM(CAST(CAST(n_chars AS VARCHAR) AS DOUBLE)) AS sum_roundtrip
FROM documents
GROUP BY 1
ORDER BY lang_af
""",
)
def jx_casts_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    tables = load_tables(spark, sf_dir, ("documents",))
    return run_jx(
        spark,
        {
            "from": "documents",
            "groupby": {"name": "lang_af", "value": {"regex": {"lang": "[a-f].*"}}},
            "select": [
                {"name": "n", "value": ".", "aggregate": "count"},
                {"name": "sum_roundtrip", "value": {"number": {"string": "n_chars"}}, "aggregate": "sum"},
            ],
            "sort": "lang_af",
        },
        tables,
    )


@register(
    "jx_date_relative",
    doc="JX relative-date literal (today-week against a pinned `now`) in a "
    "time filter; min/max timestamp aggregates.",
    oracle="""
SELECT
  event_type,
  count(*) AS n,
  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_ts
FROM events
WHERE ts < TIMESTAMP '2024-01-25 00:00:00'
GROUP BY event_type
ORDER BY event_type
""",
)
def jx_date_relative(spark: SparkSession, sf_dir: str) -> DataFrame:
    tables = load_tables(spark, sf_dir, ("events",))
    return run_jx(
        spark,
        {
            "from": "events",
            "where": {"lt": ["ts", {"date": {"literal": "today-week"}}]},
            "groupby": "event_type",
            "select": [
                {"name": "n", "value": ".", "aggregate": "count"},
                {"name": "first_ts", "value": "ts", "aggregate": "min"},
                {"name": "last_ts", "value": "ts", "aggregate": "max"},
            ],
            "sort": "event_type",
        },
        tables,
        now=datetime(2024, 2, 1),
    ).select(
        "event_type",
        "n",
        # formatted UTC strings -- TZ-proof output (r06 TZ sweep)
        F.date_format("first_ts", "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
        F.date_format("last_ts", "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
    )


@register(
    "jx_full_pipeline",
    doc="every clause of one JX query through run_jx: where -> groupby -> "
    "two window clauses (whole-partition grand total, rownum under a "
    "desc sort) -> sort -> limit. Totals are far apart, so ordering by "
    "the unrounded sum is stable across engines; output rounds for the "
    "hash.",
    oracle="""
WITH g AS (
  SELECT event_type, count(*) AS n, SUM(value) AS total
  FROM events WHERE value IS NOT NULL GROUP BY event_type
), w AS (
  SELECT event_type, n, total,
         SUM(total) OVER () AS grand,
         ROW_NUMBER() OVER (ORDER BY total DESC, event_type) AS rn
  FROM g
)
SELECT event_type, n, ROUND(total, 4) AS total, ROUND(grand, 4) AS grand, rn
FROM w ORDER BY rn LIMIT 5
""",
)
def jx_full_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    tables = load_tables(spark, sf_dir, ("events",))
    out = run_jx(
        spark,
        {
            "from": "events",
            "where": {"exists": "value"},
            "groupby": "event_type",
            "select": [
                {"name": "n", "value": ".", "aggregate": "count"},
                {"name": "total", "value": "value", "aggregate": "sum"},
            ],
            "window": [
                {"name": "grand", "value": "total", "aggregate": "sum"},
                {
                    "name": "rn",
                    "value": "total",
                    "aggregate": "rownum",
                    "sort": [{"value": "total", "sort": -1}, {"value": "event_type"}],
                },
            ],
            "sort": "rn",
            "limit": 5,
        },
        tables,
    )
    return out.select(
        "event_type", "n", F.round("total", 4).alias("total"), F.round("grand", 4).alias("grand"), "rn"
    )


@register(
    "jx_scalar_ops",
    doc="JX scalar-op sweep through run_jx: E8 prefix/suffix, E15 "
    "max/min, E16 abs, E22 split, E26 tuple, E27 get, E29 script SQL "
    "escape hatch, E30 union (sorted for cross-engine order), E31 "
    "scalar count of non-missing (find-miss contributes 0). All pure "
    "codegen; the where (prefix) pushes to the scan.",
    oracle="""
SELECT doc_id,
  (source LIKE '%1') AS src_is1,
  greatest(length(text), n_chars * 2)::DOUBLE AS hi,
  least(n_chars, 500)::DOUBLE AS lo,
  abs(n_chars - 300)::DOUBLE AS mag,
  string_split(text, ' ')[1] AS w0,
  concat_ws(',', lang, source) AS pair,
  array_to_string(list_sort(list_distinct(list_concat([lang], [source]))), ',') AS nset,
  (CASE WHEN nullif(lang, '') IS NULL THEN 0 ELSE 1 END
   + CASE WHEN instr(text, 'zzzz') > 0 THEN 1 ELSE 0 END) AS nn,
  length(text) % 7 AS scripted
FROM documents
WHERE lang LIKE 'f%'
ORDER BY doc_id
""",
)
def jx_scalar_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    tables = load_tables(spark, sf_dir, ("documents",))
    out = run_jx(
        spark,
        {
            "from": "documents",
            "where": {"prefix": {"lang": "f"}},
            "select": [
                "doc_id",
                {"name": "src_is1", "value": {"suffix": {"source": "1"}}},
                {"name": "hi", "value": {"max": [{"length": "text"}, {"mult": ["n_chars", {"literal": 2}]}]}},
                {"name": "lo", "value": {"min": ["n_chars", {"literal": 500}]}},
                {"name": "mag", "value": {"abs": {"sub": ["n_chars", {"literal": 300}]}}},
                {"name": "w0", "value": {"get": [{"split": ["text", {"literal": " "}]}, {"literal": 0}]}},
                {"name": "pair", "value": {"concat": ["lang", "source"], "separator": ","}},
                {"name": "nset", "value": {"union": [{"tuple": ["lang"]}, {"tuple": ["source"]}]}},
                {"name": "nn", "value": {"count": ["lang", {"find": ["text", {"literal": "zzzz"}]}]}},
                {"name": "scripted", "value": {"script": "length(text) % 7"}},
            ],
            "sort": "doc_id",
        },
        tables,
    )
    # cross-engine canonical form for the set-valued column
    return out.withColumn("nset", F.array_join(F.array_sort("nset"), ","))


@register(
    "jx_array_lambdas",
    doc="higher-order array-lambda surface: transform / filter / "
    "aggregate(reduce) / array_distinct+sort over the per-doc token "
    "array, all pure codegen (no UDF, no explode -- the array never "
    "leaves its row, so the scan is the only data movement). Per doc: "
    "long-token count (filter+size), total characters (aggregate "
    "fold), the sorted distinct-length set (transform->distinct->"
    "sort, an ARRAY output column), and mean token length off the "
    "fold. DuckDB twins: list_filter / list_transform / reduce / "
    "list_sort(list_distinct()).",
    oracle=f"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split(trim(text), ' '), x -> x <> '') AS lt
  FROM documents
)
SELECT doc_id,
       len(lt)::BIGINT AS n_tokens,
       len(list_filter(lt, x -> length(x) > 6))::BIGINT AS n_long,
       reduce(list_prepend(0::BIGINT, list_transform(lt, x -> length(x))),
              (a, x) -> a + x)::BIGINT AS total_chars,
       array_to_string(list_sort(list_distinct(list_transform(lt, x -> length(x)))), ',') AS length_set,
       ROUND(reduce(list_prepend(0::BIGINT, list_transform(lt, x -> length(x))),
                    (a, x) -> a + x)::DOUBLE / greatest(len(lt), 1), {R}) AS mean_len
FROM t ORDER BY doc_id
""",
)
def jx_array_lambdas(spark: SparkSession, sf_dir: str) -> DataFrame:
    from testlog_etl_spark.operators.textstats import tokens

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    lt = tokens(F.col("text"))
    total = F.aggregate(
        F.transform(lt, lambda x: F.length(x).cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    return docs.select(
        "doc_id",
        F.size(lt).cast("long").alias("n_tokens"),
        F.size(F.filter(lt, lambda x: F.length(x) > 6)).cast("long").alias("n_long"),
        total.alias("total_chars"),
        # joined to a string (r07 driver lesson: raw ARRAY output columns are
        # unhashable in the driver's typed-value compare; suite.py header rule
        # says unordered collections are sorted AND joined).
        F.array_join(
            F.transform(
                F.array_sort(F.array_distinct(F.transform(lt, lambda x: F.length(x).cast("long")))),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("length_set"),
        F.round(
            total.cast("double") / F.greatest(F.size(lt), F.lit(1)), R
        ).alias("mean_len"),
    ).orderBy("doc_id")
