"""Source/sink and join-pattern queries (SURVEY SS2.1, SS2.3).

- S1/S7: JSONL block source/sink round-trip (the reference's S3 JSONL
  inter-stage bus) -- write a filtered block, read it back, aggregate;
- J2/T4: normalization against a small literal mapping dimension via
  broadcast join (the buildbot platform/suite mapping tables);
- J3: the deep query -- nested array-of-struct documents queried at the
  inner path with parent fields riding along (explode IS the reference's
  parent/child lateral).
"""

from __future__ import annotations

import datetime
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from testlog_etl_spark.query import run_jx
from testlog_etl_spark.suite import register
from testlog_etl_spark.tables import load_tables

R = 4


@register(
    "source_jsonl_roundtrip",
    doc="S1/S7: gzip JSONL block sink then source (the inter-stage bus); "
    "aggregate over the round-tripped block equals the direct aggregate.",
    oracle=f"""
SELECT event_type, count(*) AS n, ROUND(SUM(value), {R}) AS sum_value
FROM events
WHERE value > 50
GROUP BY event_type
ORDER BY event_type
""",
)
def source_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from testlog_etl_spark.streaming.jobs import fresh_scratch_dir

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    # per-invocation unique block dir with stale-sibling TTL sweep
    # (ADVICE r03 + r04): a fixed shared path races under concurrent
    # harness runs; uuid dirs without a sweep grow the scratch area
    # without bound. fresh_scratch_dir gives both guarantees.
    block_path = fresh_scratch_dir("jsonl")
    # timestamps serialize as ISO strings; this block only needs the
    # filtered analytical columns (the reference's blocks are projected
    # transform outputs, not raw table dumps)
    (
        ev.filter(F.col("value") > 50)
        .select("event_id", "event_type", "value")
        .write.option("compression", "gzip")
        .json(block_path)
    )
    back = spark.read.json(block_path)
    return (
        back.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), R).alias("sum_value"))
        .orderBy("event_type")
    )


@register(
    "etl_normalize_mapping",
    doc="T4/J2: normalize raw type codes against a small literal mapping "
    "dimension (broadcast join; the buildbot platform-table analog). "
    "Unmapped codes keep a default, like the reference's passthrough.",
    oracle=f"""
SELECT CASE event_type
         WHEN 'click' THEN 'interaction'
         WHEN 'view' THEN 'impression'
         WHEN 'purchase' THEN 'conversion'
         ELSE 'other' END AS category,
       count(*) AS n,
       ROUND(SUM(value), {R}) AS sum_value
FROM events
GROUP BY 1
ORDER BY category
""",
)
def etl_normalize_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    mapping = [("click", "interaction"), ("view", "impression"), ("purchase", "conversion")]
    # literal dimension built JVM-side, explicitly broadcast (J1/J2 shape:
    # at 100 TB the dim is a few-thousand-row table, the fact never moves)
    dim = spark.range(1).select(
        F.explode(
            F.array(*[F.struct(F.lit(k).alias("event_type"), F.lit(v).alias("category")) for k, v in mapping])
        ).alias("m")
    ).select("m.*")
    return (
        ev.join(F.broadcast(dim), "event_type", "left")
        .withColumn("category", F.coalesce(F.col("category"), F.lit("other")))
        .groupBy("category")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), R).alias("sum_value"))
        .orderBy("category")
    )


@register(
    "jx_deep_query",
    doc="J3 deep query: orders nested with their lineitem array, queried "
    "FROM the inner path with parent (order) fields in select/groupby -- "
    "the jx_sqlite child-table / es52 nested-path semantics as explode.",
    oracle=f"""
SELECT o.o_orderpriority AS priority,
       count(*) AS n_lines,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), {R}) AS revenue
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderstatus = 'O'
GROUP BY 1
ORDER BY priority
""",
)
def jx_deep_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    # build the nested shape the reference stores (denormalized parent +
    # array-of-child-structs), then deep-query it
    lines = t["lineitem"].groupBy("l_orderkey").agg(
        F.collect_list(F.struct("l_extendedprice", "l_discount", "l_quantity")).alias("lines")
    )
    nested = t["orders"].join(lines, t["orders"].o_orderkey == lines.l_orderkey, "inner").drop("l_orderkey")
    out = run_jx(
        spark,
        {
            "from": "orders_nested.lines",
            "where": {"eq": ["o_orderstatus", {"literal": "O"}]},
            "groupby": [{"name": "priority", "value": "o_orderpriority"}],
            "select": [
                {"name": "n_lines", "value": ".", "aggregate": "count"},
                {
                    "name": "revenue",
                    "value": {"mult": ["lines.l_extendedprice", {"sub": [{"literal": 1}, "lines.l_discount"]}]},
                    "aggregate": "sum",
                },
            ],
            "sort": "priority",
        },
        {"orders_nested": nested},
    )
    return out.withColumn("revenue", F.round("revenue", R))


@register(
    "layout_bucketed_join",
    doc="100TB layout: orders and lineitem co-bucketed on orderkey join "
    "with ZERO runtime exchange (plan-asserted in tests/test_plans.py); "
    "at scale this turns the recurring fact-fact join from a full "
    "shuffle into a per-bucket local merge.",
    oracle="""
SELECT o_orderpriority, count(*) AS n, ROUND(SUM(l_quantity), 4) AS sum_qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def layout_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from testlog_etl_spark.layout import bucketed_join, write_bucketed
    from testlog_etl_spark.streaming.jobs import SCRATCH

    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    base = os.path.join(SCRATCH, "bucketed", os.path.basename(sf_dir.rstrip("/")))
    write_bucketed(
        t["orders"].select("o_orderkey", "o_orderpriority"),
        "bq_orders", os.path.join(base, "orders"), ["o_orderkey"], 8, ["o_orderkey"],
    )
    write_bucketed(
        t["lineitem"].select(F.col("l_orderkey").alias("o_orderkey"), "l_quantity"),
        "bq_lineitem", os.path.join(base, "lineitem"), ["o_orderkey"], 8, ["o_orderkey"],
    )
    return (
        bucketed_join(spark, "bq_lineitem", "bq_orders", ["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 4).alias("sum_qty"))
        .orderBy("o_orderpriority")
    )


@register(
    "source_csv_roundtrip",
    doc="S1/S7 sibling: CSV block sink then schema'd source with "
    "PERMISSIVE bad-record quarantine wired (header, explicit schema -- "
    "streaming/batch CSV cannot infer at scale; one shuffle-free "
    "write + read, aggregate equals the direct one).",
    oracle=f"""
SELECT event_type, count(*) AS n, ROUND(SUM(value), {R}) AS sum_value
FROM events
WHERE event_type IN ('click', 'view')
GROUP BY event_type
ORDER BY event_type
""",
)
def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from testlog_etl_spark.streaming.jobs import fresh_scratch_dir

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    # unique per invocation + TTL sweep -- see source_jsonl_roundtrip
    block_path = fresh_scratch_dir("csv")
    (
        ev.filter(F.col("event_type").isin("click", "view"))
        .select("event_id", "event_type", "value")
        .write.option("header", True)
        .option("compression", "gzip")
        .csv(block_path)
    )
    back = spark.read.schema("event_id bigint, event_type string, value double, _corrupt string").option(
        "header", True
    ).option("mode", "PERMISSIVE").option("columnNameOfCorruptRecord", "_corrupt").csv(block_path)
    return (
        back.filter(F.col("_corrupt").isNull())
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), R).alias("sum_value"))
        .orderBy("event_type")
    )


@register(
    "source_schema_evolution",
    doc="S1/S5 hardening: schema evolution across ingest blocks -- an "
    "early block written WITHOUT the value column and a later block "
    "WITH it are read back as one dataset via mergeSchema (the "
    "100 TB ingest reality: producers add fields mid-stream; a reader "
    "pinned to either block's schema would drop data or crash). "
    "Missing columns surface as NULL, so count(value) < count(*) "
    "exactly on the old block's rows; the aggregate proves both "
    "blocks' rows and the evolved column survive.",
    oracle=f"""
WITH unioned AS (
  SELECT event_id, event_type, CAST(NULL AS DOUBLE) AS value
  FROM events WHERE event_id % 2 = 0
  UNION ALL
  SELECT event_id, event_type, value FROM events WHERE event_id % 2 = 1
)
SELECT event_type,
       count(*) AS n_rows,
       count(value) AS n_with_value,
       ROUND(SUM(value), {R}) AS sum_value
FROM unioned GROUP BY event_type ORDER BY event_type
""",
)
def source_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from testlog_etl_spark.streaming.jobs import fresh_scratch_dir

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    block_path = fresh_scratch_dir("evolve")
    # block 0: early producer, no value column yet
    (
        ev.filter(F.col("event_id") % 2 == 0)
        .select("event_id", "event_type")
        .write.parquet(os.path.join(block_path, "b0"))
    )
    # block 1: evolved producer adds value
    (
        ev.filter(F.col("event_id") % 2 == 1)
        .select("event_id", "event_type", "value")
        .write.parquet(os.path.join(block_path, "b1"))
    )
    back = spark.read.option("mergeSchema", True).parquet(
        os.path.join(block_path, "b0"), os.path.join(block_path, "b1")
    )
    return (
        back.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("value").alias("n_with_value"),
            F.round(F.sum("value"), R).alias("sum_value"),
        )
        .orderBy("event_type")
    )


@register(
    "source_orc_roundtrip",
    doc="S7 sibling, third columnar format: ORC block sink then source "
    "(Spark-native writer/reader, zlib). Written partitioned by "
    "event_type so the read-back filter becomes PARTITION PRUNING, not "
    "a scan filter; the aggregate over the round-trip equals the "
    "direct aggregate. Timestamps survive ORC's own epoch encoding "
    "(a storage-flavor check parquet alone can't give).",
    oracle=f"""
SELECT event_type, count(*) AS n, ROUND(SUM(value), {R}) AS sum_value,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_ts
FROM events
WHERE event_type IN ('purchase', 'signup')
GROUP BY event_type
ORDER BY event_type
""",
)
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from testlog_etl_spark.streaming.jobs import fresh_scratch_dir

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    # unique per invocation + TTL sweep -- see source_jsonl_roundtrip
    block_path = fresh_scratch_dir("orc")
    (
        ev.select("event_id", "event_type", "value", "ts")
        .write.partitionBy("event_type")
        .option("compression", "zlib")
        .orc(block_path)
    )
    back = spark.read.orc(block_path).filter(F.col("event_type").isin("purchase", "signup"))
    return (
        back.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), R).alias("sum_value"),
            # formatted UTC strings -- TZ-proof output (r06 TZ sweep)
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
        )
        .orderBy("event_type")
    )


@register(
    "layout_zorder_pruning",
    doc="Z-order (Morton) clustering readout: orders quantized to an "
    "8-bit (custkey, epoch-day) grid, bit-interleaved into a 16-bit "
    "z-value (operators/layout.py::zorder_value -- unrolled codegen "
    "shift/or, engine-portable), then bucketed by the top 8 z bits. "
    "Per-bucket bounding boxes stay tight on BOTH dimensions -- the "
    "property that makes z-ordered file layout prune 2-D predicates "
    "from parquet min/max stats where single-column clustering serves "
    "only one dimension. Spans are the data-skipping figure of merit: "
    "writing files by z-bucket gives each file a (x_span+1)x(y_span+1) "
    "tile, so a point predicate on either dimension reads only "
    "buckets whose span covers it.",
    oracle=None,  # filled below: shares the generated z-value SQL
)
def layout_zorder_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    from testlog_etl_spark.operators.layout import zorder_value

    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    xq = F.pmod(F.col("o_custkey"), F.lit(256)).cast("long")
    yq = F.pmod(F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")), F.lit(256)).cast("long")
    z = zorder_value(xq, yq, bits=8)
    g = (
        orders.select(xq.alias("xq"), yq.alias("yq"), z.alias("z"))
        .withColumn("bucket", F.shiftright(F.col("z"), 8))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.max("xq") - F.min("xq")).alias("x_span"),
            (F.max("yq") - F.min("yq")).alias("y_span"),
        )
    )
    return g.orderBy("bucket")


def _zorder_oracle() -> str:
    from testlog_etl_spark.operators.layout import zorder_sql

    x = "(o_custkey % 256 + 256) % 256"
    y = "(datediff('day', DATE '1970-01-01', o_orderdate::DATE) % 256 + 256) % 256"
    z = zorder_sql(x, y, bits=8)
    return f"""
WITH q AS (
  SELECT {x} AS xq, {y} AS yq, {z} AS z FROM orders
)
SELECT z // 256 AS bucket, count(*) AS n_rows,
       max(xq) - min(xq) AS x_span, max(yq) - min(yq) AS y_span
FROM q GROUP BY bucket ORDER BY bucket
"""


@register(
    "layout_rle_runs",
    doc="sort-order compressibility report: exact run counts of three "
    "low-cardinality lineitem columns under the natural (orderkey, "
    "linenumber) layout vs a (returnflag, linestatus, ship-month) "
    "clustered layout -- the run count IS the parquet RLE page cost, "
    "so this readout chooses the writer's sort order. Distributed "
    "form (operators/layout.py::rle_runs): one range shuffle per "
    "ordering, one Arrow summary ROW per partition, boundary stitch "
    "on the driver (collect bounded by partition count). Oracle "
    "recomputes runs via lag() windows.",
    oracle="""
WITH nat AS (
  SELECT l_returnflag AS rf, l_linestatus AS ls,
         strftime(l_shipdate, '%Y-%m') AS sm,
         row_number() OVER (ORDER BY l_orderkey, l_linenumber) AS rn
  FROM lineitem
),
srt AS (
  SELECT l_returnflag AS rf, l_linestatus AS ls,
         strftime(l_shipdate, '%Y-%m') AS sm,
         row_number() OVER (
           ORDER BY l_returnflag, l_linestatus, strftime(l_shipdate, '%Y-%m'),
                    l_orderkey, l_linenumber) AS rn
  FROM lineitem
),
runs AS (
  SELECT 'natural' AS ordering, 'l_returnflag' AS col, count(*) AS n_runs
  FROM (SELECT rf AS v, lag(rf) OVER (ORDER BY rn) AS pv FROM nat)
  WHERE v IS DISTINCT FROM pv
  UNION ALL
  SELECT 'natural' AS ordering, 'l_linestatus' AS col, count(*) AS n_runs
  FROM (SELECT ls AS v, lag(ls) OVER (ORDER BY rn) AS pv FROM nat)
  WHERE v IS DISTINCT FROM pv
  UNION ALL
  SELECT 'natural' AS ordering, 'ship_month' AS col, count(*) AS n_runs
  FROM (SELECT sm AS v, lag(sm) OVER (ORDER BY rn) AS pv FROM nat)
  WHERE v IS DISTINCT FROM pv
  UNION ALL
  SELECT 'clustered' AS ordering, 'l_returnflag' AS col, count(*) AS n_runs
  FROM (SELECT rf AS v, lag(rf) OVER (ORDER BY rn) AS pv FROM srt)
  WHERE v IS DISTINCT FROM pv
  UNION ALL
  SELECT 'clustered' AS ordering, 'l_linestatus' AS col, count(*) AS n_runs
  FROM (SELECT ls AS v, lag(ls) OVER (ORDER BY rn) AS pv FROM srt)
  WHERE v IS DISTINCT FROM pv
  UNION ALL
  SELECT 'clustered' AS ordering, 'ship_month' AS col, count(*) AS n_runs
  FROM (SELECT sm AS v, lag(sm) OVER (ORDER BY rn) AS pv FROM srt)
  WHERE v IS DISTINCT FROM pv
),
n AS (SELECT count(*) AS n_rows FROM lineitem)
SELECT ordering, col, (SELECT n_rows FROM n) AS n_rows, n_runs,
       ROUND((SELECT n_rows FROM n) * 1.0 / n_runs, 2) AS rows_per_run
FROM runs
ORDER BY ordering, col
""",
)
def layout_rle_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from testlog_etl_spark.operators.layout import rle_runs

    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    proj = li.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        "l_linestatus",
        F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"),
    )
    cols = ["l_returnflag", "l_linestatus", "ship_month"]
    natural = rle_runs(proj, [F.col("l_orderkey"), F.col("l_linenumber")], cols)
    clustered = rle_runs(
        proj,
        [
            F.col("l_returnflag"),
            F.col("l_linestatus"),
            F.col("ship_month"),
            F.col("l_orderkey"),
            F.col("l_linenumber"),
        ],
        cols,
    )
    n_rows = li.count()
    rows = [("natural", c, n_rows, natural[c]) for c in cols] + [
        ("clustered", c, n_rows, clustered[c]) for c in cols
    ]
    out = spark.createDataFrame(
        rows, "ordering string, col string, n_rows long, n_runs long"
    )
    # ratio rounded ENGINE-side (Spark HALF_UP == DuckDB ROUND; Python's
    # round() is banker's and could diverge on a .xx5 boundary)
    out = out.withColumn(
        "rows_per_run", F.round(F.col("n_rows") / F.col("n_runs"), 2)
    )
    return out.orderBy("ordering", "col")


from testlog_etl_spark.suite import REGISTRY as _REG2  # noqa: E402

_REG2["layout_zorder_pruning"].oracle = _zorder_oracle()


@register(
    "layout_hilbert_pruning",
    bench=True,
    doc="Hilbert-curve clustering readout, the locality-tighter sibling "
    "of layout_zorder_pruning: the SAME (custkey, epoch-day) 8-bit "
    "grid, linearized by the Hilbert index instead of Morton. "
    "operators/layout.py::with_hilbert unrolls the xy2d fold as a "
    "ladder of chained projections (linear plan size; a single "
    "expression tree would grow ~3^bits nodes) that stays inside one "
    "WholeStageCodegen span -- no shuffle, no UDF. The oracle replays "
    "the identical fold as generated chained CTEs (hilbert_sql_ctes), "
    "so the index is bit-exact across engines. Buckets are the top 8 "
    "of 16 index bits = 256-key curve segments; per-bucket bounding "
    "boxes are the data-skipping figure of merit, and Hilbert's "
    "unit-step adjacency (consecutive keys are grid neighbors -- "
    "property-tested) keeps them tighter than Z-order's quadrant "
    "jumps, which is why Delta/Iceberg offer it for file clustering.",
    oracle=None,  # filled below: shares the generated fold SQL
)
def layout_hilbert_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    from testlog_etl_spark.operators.layout import with_hilbert

    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    xq = F.pmod(F.col("o_custkey"), F.lit(256)).cast("long")
    yq = F.pmod(
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")),
        F.lit(256),
    ).cast("long")
    base = orders.select(xq.alias("xq"), yq.alias("yq"))
    h = with_hilbert(base, F.col("xq"), F.col("yq"), bits=8, out="h")
    g = (
        h.withColumn("bucket", F.expr("h div 256"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.max("xq") - F.min("xq")).alias("x_span"),
            (F.max("yq") - F.min("yq")).alias("y_span"),
        )
    )
    return g.orderBy("bucket")


def _hilbert_oracle() -> str:
    from testlog_etl_spark.operators.layout import hilbert_sql_ctes

    src = (
        "SELECT (o_custkey % 256 + 256) % 256 AS xq, "
        "(datediff('day', DATE '1970-01-01', o_orderdate::DATE) % 256 + 256) % 256 AS yq "
        "FROM orders"
    )
    ctes = hilbert_sql_ctes(src, "xq", "yq", bits=8, keep="xq, yq", out="h")
    return f"""
{ctes}
SELECT h // 256 AS bucket, count(*) AS n_rows,
       max(xq) - min(xq) AS x_span, max(yq) - min(yq) AS y_span
FROM h8 GROUP BY bucket ORDER BY bucket
"""


_REG2["layout_hilbert_pruning"].oracle = _hilbert_oracle()


@register(
    "layout_dictionary_estimate",
    doc="dictionary-encoding advisor for the writer: per candidate "
    "string column of lineitem, cardinality vs row count and the "
    "estimated plain- vs dict-encoded byte footprint (4-byte codes + "
    "one dictionary copy of each distinct value) -- the layout "
    "decision parquet writers make per row group, surfaced as a "
    "query. ONE aggregate computes every column's stats (the "
    "profile/dq_constraint fuse-into-one-scan rule); integer byte "
    "arithmetic so both engines agree exactly.",
    oracle="""
WITH s AS (
  SELECT
    count(*) AS n,
    count(DISTINCT l_returnflag) AS d_rf, SUM(length(l_returnflag)) AS b_rf,
    count(DISTINCT l_linestatus) AS d_ls, SUM(length(l_linestatus)) AS b_ls,
    count(DISTINCT l_shipdate)   AS d_sd, SUM(10)                   AS b_sd
  FROM lineitem
),
u AS (
  SELECT 'l_returnflag' AS "column", n, d_rf AS n_distinct, b_rf AS plain_bytes FROM s
  UNION ALL SELECT 'l_linestatus', n, d_ls, b_ls FROM s
  UNION ALL SELECT 'l_shipdate', n, d_sd, b_sd FROM s
),
-- ALL-INTEGER dict estimate (4-byte codes + floor-avg-len dictionary):
-- float-cast rounding differs across engines, integer div does not
e AS (
  SELECT "column", n, n_distinct, plain_bytes,
         4 * n + (plain_bytes // n) * n_distinct AS dict_bytes
  FROM u
)
SELECT "column",
       CAST(n AS BIGINT) AS n_rows,
       CAST(n_distinct AS BIGINT) AS n_distinct,
       CAST(plain_bytes AS BIGINT) AS plain_bytes,
       CAST(dict_bytes AS BIGINT) AS dict_bytes,
       ROUND(dict_bytes::DOUBLE / plain_bytes, 4) AS ratio,
       dict_bytes < plain_bytes AS dict_wins
FROM e ORDER BY "column"
""",
)
def layout_dictionary_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    s = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("l_returnflag").alias("d_rf"),
        F.sum(F.length("l_returnflag")).alias("b_rf"),
        F.count_distinct("l_linestatus").alias("d_ls"),
        F.sum(F.length("l_linestatus")).alias("b_ls"),
        F.count_distinct("l_shipdate").alias("d_sd"),
        F.sum(F.lit(10)).alias("b_sd"),
    )
    rows = []
    for col, d, b in (
        ("l_returnflag", "d_rf", "b_rf"),
        ("l_linestatus", "d_ls", "b_ls"),
        ("l_shipdate", "d_sd", "b_sd"),
    ):
        dict_bytes = 4 * F.col("n") + F.expr(f"({b} div n) * {d}")
        rows.append(
            s.select(
                F.lit(col).alias("column"),
                F.col("n").alias("n_rows"),
                F.col(d).cast("long").alias("n_distinct"),
                F.col(b).cast("long").alias("plain_bytes"),
                dict_bytes.cast("long").alias("dict_bytes"),
                F.round(dict_bytes.cast("double") / F.col(b), 4).alias("ratio"),
                (dict_bytes < F.col(b)).alias("dict_wins"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("column")


@register(
    "layout_partition_planner",
    doc="writer partition-size planner: per order-date month, row "
    "count, estimated serialized bytes (integer per-row footprint "
    "from column widths -- the dictionary-advisor arithmetic), target "
    "file count at a 256 KiB target, and a skew flag when a month "
    "needs > 2x the median file count -- the small-files/giant-files "
    "advisor a compaction job reads before writing a date-partitioned "
    "tree. One rollup; the median is over the ~80-month frame.",
    oracle="""
WITH m AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         count(*)::BIGINT AS n_rows,
         count(*)::BIGINT * 64 AS est_bytes
  FROM orders GROUP BY month
),
f AS (
  SELECT month, n_rows, est_bytes,
         CAST(ceil(est_bytes / 262144.0) AS BIGINT) AS n_files
  FROM m
),
med AS (SELECT quantile_cont(n_files, 0.5) AS mf FROM f)
SELECT f.month, f.n_rows, f.est_bytes, f.n_files,
       f.n_files > 2 * med.mf AS skew_flag
FROM f CROSS JOIN med
ORDER BY month
""",
)
def layout_partition_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    m = orders.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month")
    ).agg(F.count(F.lit(1)).alias("n_rows"))
    f = m.select(
        "month",
        "n_rows",
        (F.col("n_rows") * 64).alias("est_bytes"),
        F.ceil(F.col("n_rows") * 64 / 262144.0).cast("long").alias("n_files"),
    )
    med = f.agg(F.expr("percentile(n_files, 0.5)").alias("mf"))
    return (
        f.crossJoin(F.broadcast(med))
        .select(
            "month",
            "n_rows",
            "est_bytes",
            "n_files",
            (F.col("n_files") > 2 * F.col("mf")).alias("skew_flag"),
        )
        .orderBy("month")
    )


# one spec drives BOTH engines' byte model: fixed widths for numerics,
# length+20 for strings (UTF8String object overhead, the driver-memory
# quantity Spark's own SizeEstimator approximates for broadcast sizing)
_BCAST_SPEC: dict[str, list[tuple[str, str]]] = {
    "region": [("r_regionkey", "int"), ("r_name", "str")],
    "nation": [("n_nationkey", "int"), ("n_name", "str"), ("n_regionkey", "int")],
    "customer": [
        ("c_custkey", "long"),
        ("c_name", "str"),
        ("c_nationkey", "int"),
        ("c_acctbal", "double"),
        ("c_mktsegment", "str"),
    ],
    "supplier": [
        ("s_suppkey", "long"),
        ("s_name", "str"),
        ("s_nationkey", "int"),
        ("s_acctbal", "double"),
    ],
    "part": [
        ("p_partkey", "long"),
        ("p_name", "str"),
        ("p_brand", "str"),
        ("p_type", "str"),
        ("p_size", "int"),
        ("p_retailprice", "double"),
    ],
}
_BCAST_THRESHOLD = 10 * 1024 * 1024  # spark.sql.autoBroadcastJoinThreshold default


def _bcast_oracle() -> str:
    width = {"int": "4", "long": "8", "double": "8"}
    selects = []
    for t, cols in _BCAST_SPEC.items():
        expr = " + ".join(
            width[k] if k != "str" else f"(COALESCE(length({c}), 0) + 20)" for c, k in cols
        )
        selects.append(
            f"SELECT '{t}' AS table_name, count(*) AS n_rows, "
            f"CAST(SUM({expr}) AS BIGINT) AS est_bytes FROM {t}"
        )
    u = " UNION ALL ".join(selects)
    return f"""
SELECT table_name, n_rows, est_bytes,
       est_bytes < {_BCAST_THRESHOLD} AS broadcastable,
       ROUND(est_bytes / {_BCAST_THRESHOLD}.0, 4) AS threshold_ratio
FROM ({u}) ORDER BY table_name
"""


@register(
    "layout_broadcast_advisor",
    doc="join-strategy advisor: per dimension table, the estimated "
    "in-memory byte footprint against the 10 MB "
    "autoBroadcastJoinThreshold default -- the number that decides "
    "whether a star join plans as BroadcastHashJoin (dim ships to "
    "every executor, fact never shuffles) or falls back to a "
    "sort-merge exchange of the FACT side, the single most expensive "
    "planning miss at 100 TB. One byte-model spec (fixed numeric "
    "widths, length+20 per string) generates BOTH engines' "
    "arithmetic, and a plan test pins that Spark's actual planner "
    "agrees with the advisor's verdict on the small dims. Per-table "
    "cost: one count/sum aggregate -- the scan is column-pruned to "
    "the string columns.",
    oracle=_bcast_oracle(),
)
def layout_broadcast_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, tuple(_BCAST_SPEC))
    width = {"int": 4, "long": 8, "double": 8}
    outs = []
    for name, cols in _BCAST_SPEC.items():
        per_row = None
        for c, k in cols:
            b = (
                F.lit(width[k])
                if k != "str"
                else F.coalesce(F.length(F.col(c)), F.lit(0)) + 20
            )
            per_row = b if per_row is None else per_row + b
        outs.append(
            t[name].agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(per_row).cast("long").alias("est_bytes"),
            ).select(F.lit(name).alias("table_name"), "n_rows", "est_bytes")
        )
    import functools

    u = functools.reduce(lambda a, b: a.unionByName(b), outs)
    return u.select(
        "table_name",
        "n_rows",
        "est_bytes",
        (F.col("est_bytes") < _BCAST_THRESHOLD).alias("broadcastable"),
        F.round(F.col("est_bytes") / float(_BCAST_THRESHOLD), 4).alias("threshold_ratio"),
    ).orderBy("table_name")


# ONE dialect-neutral SQL text executed verbatim by BOTH engines: the
# API-surface proof that the engine's SQL front door (temp views +
# spark.sql) accepts the portable ANSI subset the suite's oracles are
# written in -- not just the DataFrame DSL the other queries use.
_SHARED_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       count(*) AS n_lines,
       ROUND(SUM(l_quantity), 4) AS sum_qty,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       ROUND(AVG(l_discount), 6) AS avg_disc
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register(
    "sql_shared_text_q1",
    doc="SQL API surface: the pricing-summary query as ONE shared ANSI "
    "text -- registered as the oracle verbatim AND executed by "
    "spark.sql over a temp view, so the front-door SQL parser, the "
    "view resolution path, and Catalyst's SQL->plan pipeline are all "
    "under the differential (the DataFrame twin q1_pricing_summary "
    "covers the DSL path). Same plan as the DSL form: pushed shipdate "
    "filter, partial+final agg.",
    oracle=_SHARED_Q1_SQL,
)
def sql_shared_text_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    li.createOrReplaceTempView("lineitem")
    return spark.sql(_SHARED_Q1_SQL)


@register(
    "source_python_datasource",
    doc="SURVEY S-surface: a custom PYTHON DATA SOURCE (Spark 4 "
    "DataSource API, etl/pyds.py) -- the connector a user writes for "
    "a system Spark has no built-in reader for. partitions() splits "
    "the key range into 8 independent input partitions (real scan "
    "parallelism, one Python worker each, Arrow-batched to the JVM); "
    "pushFilters accepts the bucket=3 equality so non-matching rows "
    "are dropped AT GENERATION and never cross the Python->JVM "
    "boundary (unit-tested). Rows are a pure integer function of the "
    "row id, so DuckDB replays the entire source from range(n) "
    "exactly.",
    oracle=f"""
SELECT i % 7 AS bucket, count(*) AS n,
       CAST(SUM((i * 2654435761) % 1000003) AS BIGINT) AS sum_value,
       CAST(MIN((i * 2654435761) % 1000003) AS BIGINT) AS min_value,
       CAST(MAX((i * 2654435761) % 1000003) AS BIGINT) AS max_value
FROM range(50000) t(i)
WHERE i % 7 = 3
GROUP BY 1 ORDER BY 1
""",
)
def source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    from testlog_etl_spark.etl.pyds import register_synthetic_source

    register_synthetic_source(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("n", "50000")
        .option("parts", "8")
        .load()
        .filter(F.col("bucket") == 3)
    )
    return (
        df.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .orderBy("bucket")
    )


# Shared ANSI text #2: WITH RECURSIVE (new engine surface in Spark 4) --
# the binary doc hierarchy walked to the root per document. Integer
# division is spelled CAST((cur - cur % 2) / 2 AS BIGINT): both engines'
# `/` yields double, but the value is exactly integral so the cast is
# exact -- the dialect-portable spelling of `div` / `//` (and immune to
# the double-truncation hazard ADVICE flagged for plain (x/2)::long,
# which is only exact below 2^53 WITH a fractional part; here there is
# none by construction).
_SHARED_RECURSIVE_SQL = """
WITH RECURSIVE walk(leaf, cur, depth) AS (
  SELECT doc_id, doc_id, 0 FROM documents WHERE doc_id >= 1
  UNION ALL
  SELECT leaf, CAST((cur - (cur % 2)) / 2 AS BIGINT), depth + 1
  FROM walk WHERE cur > 1
),
j AS (
  SELECT w.leaf, w.depth, COALESCE(d.n_chars, 0) AS nc
  FROM walk w JOIN documents d ON d.doc_id = w.cur
),
p AS (
  SELECT leaf, MAX(depth) AS root_depth, SUM(nc) AS path_chars
  FROM j GROUP BY leaf
)
SELECT root_depth, count(*) AS n_docs,
       CAST(SUM(path_chars) AS BIGINT) AS sum_path_chars
FROM p GROUP BY root_depth ORDER BY root_depth
"""


@register(
    "sql_recursive_cte_ancestors",
    doc="SQL API surface #2: WITH RECURSIVE executed as ONE shared ANSI "
    "text by spark.sql and the oracle -- Spark 4's recursive-CTE "
    "front door under the differential. Walks every document's "
    "parent chain (parent = child div 2, the graph_subtree_rollup "
    "hierarchy inverted: per-LEAF path rollup instead of per-ancestor "
    "subtree rollup) accumulating chars along the root path; "
    "iteration count is log2(max id), each round one equi-join "
    "against the previous frontier -- the same log-round contract as "
    "the pointer-jumping connected components.",
    oracle=_SHARED_RECURSIVE_SQL,
)
def sql_recursive_cte_ancestors(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    docs.createOrReplaceTempView("documents")
    return spark.sql(_SHARED_RECURSIVE_SQL)


# Shared ANSI text #3: correlated LATERAL subquery with per-row ORDER BY
# + LIMIT -- the SQL spelling of grouped top-k. Values pass through from
# parquet untouched (no float arithmetic), so no rounding is needed.
_SHARED_LATERAL_SQL = """
SELECT n.n_name, t.c_name, t.c_acctbal
FROM nation n, LATERAL (
  SELECT c_name, c_acctbal FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_name LIMIT 2
) t
ORDER BY n.n_name, t.c_acctbal DESC, t.c_name
"""


@register(
    "sql_shared_text_lateral_topn",
    doc="SQL API surface #3: correlated LATERAL subquery (per-nation "
    "top-2 customers by balance) as ONE shared ANSI text on both "
    "engines -- the declarative twin of topk_per_group_agg's "
    "Arrow-pruned plan. Catalyst decorrelates the lateral into a "
    "ranked window join rather than re-running the subquery per row; "
    "ties broken by name so the LIMIT is total-order deterministic.",
    oracle=_SHARED_LATERAL_SQL,
)
def sql_shared_text_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("nation", "customer"))
    t["nation"].createOrReplaceTempView("nation")
    t["customer"].createOrReplaceTempView("customer")
    return spark.sql(_SHARED_LATERAL_SQL)


@register(
    "source_binary_files",
    doc="S-surface: the binaryFile source -- how image/audio dirs enter "
    "Spark at scale (one row per file: path, length, raw bytes; the "
    "multimodal decode UDFs downstream consume exactly this shape). "
    "Stages 24 deterministic blobs (content = repeated xor-pattern of "
    "the file index, staged once per invocation under a fresh scratch "
    "dir), reads them back as binary rows, and audits length + "
    "byte-sum + first/last byte per size class. At 100 TB the "
    "pathGlobFilter/recursiveFileLookup options prune the listing "
    "driver-side before any read. Oracle replays the blob definition "
    "from range(24) -- integer math only.",
    oracle="""
SELECT i % 3 AS size_class, count(*) AS n_files,
       CAST(SUM(100 + (i % 3) * 50) AS BIGINT) AS total_bytes,
       CAST(SUM((100 + (i % 3) * 50) * ((i * 37) % 251)) AS BIGINT) AS byte_sum,
       CAST(MIN((i * 37) % 251) AS BIGINT) AS min_fill,
       CAST(MAX((i * 37) % 251) AS BIGINT) AS max_fill
FROM range(24) t(i)
GROUP BY 1 ORDER BY 1
""",
)
def source_binary_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    from testlog_etl_spark.streaming.jobs import fresh_scratch_dir

    root = fresh_scratch_dir("binfiles")
    os.makedirs(root, exist_ok=True)  # writers mkdir; plain open() won't
    # blob i: (100 + (i%3)*50) bytes, every byte = (i*37) % 251
    for i in range(24):
        size = 100 + (i % 3) * 50
        fill = (i * 37) % 251
        with open(os.path.join(root, f"blob_{i:03d}.bin"), "wb") as fh:
            fh.write(bytes([fill]) * size)
    files = spark.read.format("binaryFile").option("pathGlobFilter", "*.bin").load(root)
    parsed = files.select(
        F.regexp_extract(F.col("path"), r"blob_(\d+)\.bin$", 1).cast("long").alias("i"),
        F.col("length"),
        # first byte == fill byte (uniform content); hex->dec keeps the
        # extraction JVM-side and valid for any byte value (a utf8 cast
        # would mangle bytes >= 0x80)
        F.conv(F.hex(F.substring(F.col("content"), 1, 1)), 16, 10)
        .cast("long")
        .alias("fill"),
    )
    return (
        parsed.withColumn("size_class", F.pmod("i", F.lit(3)))
        .groupBy("size_class")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("length").alias("total_bytes"),
            F.sum(F.col("length") * F.col("fill")).alias("byte_sum"),
            F.min("fill").alias("min_fill"),
            F.max("fill").alias("max_fill"),
        )
        .orderBy("size_class")
    )


@register(
    "source_fixed_width_text",
    doc="S-surface: fixed-width text ingest (the mainframe/legacy-export "
    "format every ETL system eventually meets). Sink: events rendered "
    "as 34-char records via ONE codegen'd format_string (id right-"
    "padded 12, type left-padded 10, value*100 zero-padded 12 as "
    "integer cents -- floats never round-trip through decimal text "
    "unrounded). Source: spark.read.text + substr/trim/cast slicing, "
    "the whole parse staying inside WholeStageCodegen -- no Python, "
    "no regex. The aggregate over the round-trip equals the direct "
    "one; cents stay integers end-to-end on both engines.",
    oracle=f"""
SELECT event_type, count(*) AS n,
       CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events
WHERE event_type IN ('click', 'purchase')
GROUP BY event_type
ORDER BY event_type
""",
)
def source_fixed_width_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    from testlog_etl_spark.streaming.jobs import fresh_scratch_dir

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    root = fresh_scratch_dir("fixedwidth")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    lines = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        F.format_string("%-12d%10s%012d", F.col("event_id"), F.col("event_type"), cents).alias(
            "value"
        )
    )
    lines.write.text(root)

    raw = spark.read.text(root)
    parsed = raw.select(
        F.trim(F.substring("value", 1, 12)).cast("long").alias("event_id"),
        F.trim(F.substring("value", 13, 10)).alias("event_type"),
        F.substring("value", 23, 12).cast("long").alias("cents"),
    )
    return (
        parsed.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("sum_cents"))
        .orderBy("event_type")
    )


@register(
    "sql_named_parameters",
    doc="SQL API surface #4: PARAMETERIZED spark.sql -- named ':param' "
    "markers bound via args (Spark 4's injection-safe front door; "
    "values are bound as literals by the parser, never string-"
    "spliced). The query itself is the pricing cut by a parameterized "
    "date + discount band; the oracle carries the same statement with "
    "the literals inlined, which is exactly the binding contract "
    "being asserted.",
    oracle="""
SELECT l_returnflag,
       count(*) AS n,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1997-06-30 00:00:00'
  AND l_discount BETWEEN 0.02 AND 0.05
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def sql_named_parameters(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    li.createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag,
               count(*) AS n,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
        FROM lineitem
        WHERE l_shipdate <= :ship_cut
          AND l_discount BETWEEN :lo AND :hi
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """,
        args={
            "ship_cut": datetime.datetime(1997, 6, 30),
            "lo": 0.02,
            "hi": 0.05,
        },
    )



@register(
    "sql_pivot_clause",
    doc="native SQL PIVOT surface: orders count and rounded revenue "
    "pivoted by order priority per year -- Spark's FROM ... PIVOT "
    "(agg FOR col IN (...)) clause (Catalyst rewrites it to the same "
    "hash aggregate a manual conditional-agg would give; the clause "
    "is the API-parity point). The DuckDB twin spells the identical "
    "contingency with conditional aggregates -- pivot semantics, not "
    "pivot syntax, is the contract. Priorities are a fixed 5-value "
    "enum, so the pivoted row is bounded.",
    oracle="""
SELECT EXTRACT(year FROM o_orderdate)::INT AS yr,
       COALESCE(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END), 0)::BIGINT AS n_urgent,
       COALESCE(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END), 0)::BIGINT AS n_high,
       COALESCE(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END), 0)::BIGINT AS n_medium,
       ROUND(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice ELSE 0 END), 4) AS rev_urgent,
       ROUND(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN o_totalprice ELSE 0 END), 4) AS rev_high,
       ROUND(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN o_totalprice ELSE 0 END), 4) AS rev_medium
FROM orders
GROUP BY 1 ORDER BY yr
""",
)
def sql_pivot_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    orders.createOrReplaceTempView("orders_pivot_src")
    return spark.sql(
        """
        SELECT yr,
               COALESCE(`1-URGENT_n`, 0) AS n_urgent,
               COALESCE(`2-HIGH_n`, 0) AS n_high,
               COALESCE(`3-MEDIUM_n`, 0) AS n_medium,
               ROUND(COALESCE(`1-URGENT_rev`, 0.0), 4) AS rev_urgent,
               ROUND(COALESCE(`2-HIGH_rev`, 0.0), 4) AS rev_high,
               ROUND(COALESCE(`3-MEDIUM_rev`, 0.0), 4) AS rev_medium
        FROM (
          SELECT CAST(year(o_orderdate) AS INT) AS yr, o_orderpriority, o_totalprice
          FROM orders_pivot_src
        )
        PIVOT (
          count(*) AS n, SUM(o_totalprice) AS rev
          FOR o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM')
        )
        ORDER BY yr
        """
    )


@register(
    "sql_union_by_name",
    doc="unionByName with allowMissingColumns -- the schema-drift "
    "append surface (two extract versions of the orders feed, one "
    "missing the priority column, one carrying a new channel "
    "column): Spark aligns by NAME and null-fills the gaps (a "
    "positional UNION would silently mis-bind columns). The DuckDB "
    "twin is UNION ALL BY NAME. Readout aggregates the combined "
    "feed per column-provenance flag so the null-fill semantics are "
    "what gets hashed.",
    oracle="""
WITH v1 AS (
  SELECT o_orderkey, o_totalprice, o_orderpriority
  FROM orders WHERE o_orderkey % 2 = 0
),
v2 AS (
  SELECT o_orderkey, o_totalprice, 'web' AS channel
  FROM orders WHERE o_orderkey % 2 = 1
),
u AS (SELECT * FROM v1 UNION ALL BY NAME SELECT * FROM v2)
SELECT COALESCE(o_orderpriority, '<missing>') AS o_orderpriority,
       COALESCE(channel, '<missing>') AS channel,
       count(*)::BIGINT AS n,
       ROUND(SUM(o_totalprice), 2) AS revenue
FROM u
GROUP BY 1, 2 ORDER BY 1, 2
""",
)
def sql_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    v1 = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    v2 = orders.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_totalprice", F.lit("web").alias("channel")
    )
    u = v1.unionByName(v2, allowMissingColumns=True)
    return (
        u.groupBy(
            F.coalesce(F.col("o_orderpriority"), F.lit("<missing>")).alias("o_orderpriority"),
            F.coalesce(F.col("channel"), F.lit("<missing>")).alias("channel"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy("o_orderpriority", "channel")
    )


@register(
    "source_csv_dropmalformed",
    doc="CSV parse-mode surface beyond source_csv_roundtrip's "
    "PERMISSIVE: a crafted block with three malformed rows (wrong "
    "arity, non-numeric value, bare garbage) interleaved with good "
    "rows, read under mode=DROPMALFORMED so bad rows vanish at the "
    "parser (etl_quarantine_badrecords is the keep-and-route "
    "sibling). Rows are WRITTEN as text lines so the corruption "
    "survives the writer; the oracle reads the same scratch files "
    "with DuckDB's ignore_errors. Readout: per-type counts + value "
    "sums over the surviving rows; the oracle recomputes the expected "
    "survivor set straight from the events table (the three crafted "
    "rows are non-surviving by construction, so survivors == the "
    "good rows).",
    oracle="""
SELECT event_type, count(*)::BIGINT AS n, ROUND(SUM("value"), 4) AS sum_value
FROM events
WHERE event_type IN ('click', 'view')
GROUP BY event_type ORDER BY event_type
""",
)
def source_csv_dropmalformed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from testlog_etl_spark.streaming.jobs import fresh_scratch_dir

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    path = fresh_scratch_dir("csvbad")
    good = ev.filter(F.col("event_type").isin("click", "view")).select(
        F.concat_ws(",", "event_id", "event_type", F.col("value").cast("string")).alias("line")
    )
    bad = spark.createDataFrame(
        [("1,click",), ("2,view,not_a_number",), ("garbage line with no commas",)],
        "line string",
    )
    good.unionAll(bad).coalesce(4).write.mode("overwrite").text(path)
    back = (
        spark.read.schema("event_id bigint, event_type string, value double")
        .option("mode", "DROPMALFORMED")
        .csv(path)
    )
    return (
        back.filter(F.col("value").isNotNull() & F.col("event_id").isNotNull())
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), R).alias("sum_value"))
        .orderBy("event_type")
    )


@register(
    "sql_named_window_clause",
    doc="named WINDOW clause surface: one window spec (per-customer "
    "order sequence) declared once and shared by row_number, a lag "
    "diff, and a running sum -- the ANSI spelling both engines parse "
    "natively (Catalyst expands every reference to the same spec, so "
    "the plan carries ONE exchange). The running sum uses the DEFAULT "
    "ordered frame on both engines -- RANGE UNBOUNDED PRECEDING to "
    "CURRENT ROW, equal to the ROWS frame because the ordering is "
    "made unique by the o_orderkey tie-break. Day arithmetic is "
    "integral.",
    oracle="""
SELECT o_custkey, o_orderkey,
       ROW_NUMBER() OVER w AS order_seq,
       date_diff('day', LAG(CAST(o_orderdate AS DATE)) OVER w,
                 CAST(o_orderdate AS DATE)) AS days_since_prev,
       ROUND(SUM(o_totalprice) OVER w, 4) AS lifetime_spend
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, order_seq
""",
)
def sql_named_window_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    orders.createOrReplaceTempView("orders_named_window_src")
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey,
               ROW_NUMBER() OVER w AS order_seq,
               datediff(CAST(o_orderdate AS DATE),
                        LAG(CAST(o_orderdate AS DATE)) OVER w) AS days_since_prev,
               ROUND(SUM(o_totalprice) OVER w, 4) AS lifetime_spend
        FROM orders_named_window_src
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        ORDER BY o_custkey, order_seq
        """
    )


@register(
    "sql_group_by_all",
    doc="GROUP BY ALL surface (Spark 3.4+ / DuckDB): every non-"
    "aggregate select item becomes a grouping key -- the dialect "
    "shorthand that removes the classic stale-GROUP-BY-list bug when "
    "a dimension is added to the select. Readout: revenue by "
    "(year, priority, returnflag-free orders grain).",
    oracle="""
SELECT EXTRACT(year FROM o_orderdate)::INT AS yr, o_orderpriority,
       count(*)::BIGINT AS n, ROUND(SUM(o_totalprice), 4) AS revenue
FROM orders
GROUP BY ALL
ORDER BY yr, o_orderpriority
""",
)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    orders.createOrReplaceTempView("orders_gba_src")
    return spark.sql(
        """
        SELECT CAST(year(o_orderdate) AS INT) AS yr, o_orderpriority,
               count(*) AS n, ROUND(SUM(o_totalprice), 4) AS revenue
        FROM orders_gba_src
        GROUP BY ALL
        ORDER BY yr, o_orderpriority
        """
    )
