"""Core relational queries: the flagship pricing summary plus the join
surface (SURVEY SS2.3 -- a deliberate superset of the reference, which has
no general join; its enrichment lookups J1/J2 are the broadcast joins
here).

Scale notes per query are in each docstring: what shuffles, what
broadcasts, and why the plan survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from testlog_etl_spark.suite import register
from testlog_etl_spark.tables import load_table, load_tables

# Rounding scale for float aggregates: far above double ulp noise at these
# magnitudes, far below data resolution (prices have 2 decimals).
R = 4


@register(
    "q1_pricing_summary",
    doc="TPC-H Q1 shape: scan-heavy groupBy with 8 aggregates. "
    "Flagship: one wide scan, partial aggregation map-side, tiny shuffle "
    "(4 groups); at 100 TB the plan is scan-bound and embarrassingly "
    "parallel. Reference analog: JX groupby+aggregates on the ES backend "
    "(SURVEY SS2.4, vendor/jx_elasticsearch/es52/agg_op.py).",
    oracle=f"""
SELECT
  l_returnflag,
  l_linestatus,
  ROUND(SUM(l_quantity), {R}) AS sum_qty,
  ROUND(SUM(l_extendedprice), {R}) AS sum_base_price,
  ROUND(SUM(l_extendedprice * (1 - l_discount)), {R}) AS sum_disc_price,
  ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), {R}) AS sum_charge,
  ROUND(AVG(l_quantity), {R}) AS avg_qty,
  ROUND(AVG(l_extendedprice), {R}) AS avg_price,
  ROUND(AVG(l_discount), {R}) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
    bench=True,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), R).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), R).alias("sum_base_price"),
            F.round(F.sum(disc_price), R).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), R).alias("sum_charge"),
            F.round(F.avg("l_quantity"), R).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), R).alias("avg_price"),
            F.round(F.avg("l_discount"), R).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q3_shipping_priority",
    doc="TPC-H Q3 shape: selective filters on both fact sides, then "
    "orders><lineitem join on orderkey. customer scales with SF so its "
    "join is AQE-selected (broadcast at runtime while it fits, shuffle "
    "beyond); orders-lineitem is the one real shuffle, both sides "
    "pre-filtered so AQE sizes it; top-10 is TakeOrderedAndProject "
    "(no global sort materialization).",
    oracle=f"""
SELECT
  l_orderkey,
  ROUND(SUM(l_extendedprice * (1 - l_discount)), {R}) AS revenue,
  CAST(o_orderdate AS DATE) AS o_orderdate,
  o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
""",
    bench=True,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1995-03-15 00:00:00").cast("timestamp")
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        # customer scales linearly with SF -- no forced broadcast; AQE
        # converts to broadcast at runtime while the side still fits
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), R).alias("revenue"))
        # output as DATE: TZ- and storage-flavor-proof -- an instant
        # output re-renders through the collecting process's OS timezone
        # (r06 TZ=America/New_York sweep), while the calendar date is
        # identical under instant/UTC-session and NTZ storage alike (the
        # filter above stays on the raw column, so pushdown is unaffected)
        .select("l_orderkey", "revenue", F.col("o_orderdate").cast("date").alias("o_orderdate"), "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    doc="TPC-H Q5 shape: star join lineitem><orders + four dims. Only the "
    "fixed-cardinality dims (nation=25, region=5) carry broadcast hints; "
    "customer/supplier scale with SF and are AQE-selected. The reference's "
    "enrichment joins (J1/J2: hg-revision and buildbot mapping lookups) "
    "are the fixed-dim pattern: fact stream x small cached dimension -> "
    "broadcast hash join, zero extra shuffle at any scale.",
    oracle=f"""
SELECT
  n_name,
  ROUND(SUM(l_extendedprice * (1 - l_discount)), {R}) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""",
    bench=True,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1994-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    # r12 (guide 3.2 "reduce the big side before shuffling it"): the
    # region restriction reaches customer/supplier only through the
    # final nation/region joins, which Catalyst cannot push below the
    # fact joins on its own. Resolving the 5-nation Asia set FIRST and
    # applying it to both scaling dims BEFORE they meet the facts cuts
    # their join input 5x -- a broadcast-bytes saving here, a 5x
    # shuffle-bytes saving at the 100x scale where customer/supplier
    # stop broadcasting. The identical broadcast subtree serves the
    # supplier inner join and the customer semi join (ReusedExchange).
    # A customer row dropped by the semi join is exactly one the old
    # plan discarded later at the s_nationkey = c_nationkey condition,
    # so the result is unchanged.
    asian = nation.join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    cust_asia = cust.join(
        F.broadcast(asian), F.col("c_nationkey") == F.col("n_nationkey"), "left_semi"
    )
    supp_asia = supp.join(
        F.broadcast(asian), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        # customer and supplier scale linearly with SF: forcing a broadcast
        # OOMs executors at the 100x target. Only the fixed-cardinality dims
        # (nation=25, region=5) keep explicit hints; AQE broadcasts the
        # others at runtime for as long as they actually fit.
        .join(cust_asia, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            supp_asia,
            (F.col("l_suppkey") == F.col("s_suppkey")) & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), R).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@register(
    "q6_forecast_revenue",
    doc="TPC-H Q6 shape: pure scan+filter+global agg. Verifies predicate "
    "pushdown to the parquet scan (PushedFilters in .explain); at 100 TB "
    "with date-partitioned layout this is partition-pruned to 1 year.",
    oracle=f"""
SELECT ROUND(SUM(l_extendedprice * l_discount), {R}) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    bench=True,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), R).alias("revenue"))
    )


@register(
    "join_semi_exists",
    doc="EXISTS via left-semi join: orders that have at least one high-"
    "quantity lineitem. Semi-join never widens rows, so shuffle payload "
    "is keys only -- the scale-correct EXISTS plan.",
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 49
)
ORDER BY o_orderkey
""",
)
def join_semi_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 49)
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    )


@register(
    "join_anti_not_exists",
    doc="NOT EXISTS via left-anti join: customers with no orders.",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
ORDER BY c_custkey
""",
)
def join_anti_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "topk_orders",
    doc="ORDER BY + LIMIT (JX sort+limit, SURVEY SS2.7 O3). Catalyst plans "
    "TakeOrderedAndProject: per-partition heap of k, then k-way driver "
    "merge -- no global sort at any scale.",
    oracle="""
SELECT o_orderkey, o_totalprice, CAST(o_orderdate AS DATE) AS o_orderdate
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 25
""",
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        # DATE output -- TZ-proof rendering, see q3_shipping_priority
        orders.select("o_orderkey", "o_totalprice", F.col("o_orderdate").cast("date").alias("o_orderdate"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(25)
    )


@register(
    "union_distinct_sources",
    doc="Union of heterogeneous sources + distinct (SURVEY SS2.7 O4/O5: "
    "ConcatSources / groupby-all-cols). unionByName tolerates schema "
    "drift between blocks, dropDuplicates is a hash-agg shuffle on the "
    "deduped key only.",
    oracle="""
SELECT nationkey, name FROM (
  SELECT n_nationkey AS nationkey, n_name AS name FROM nation
  UNION
  SELECT c_nationkey AS nationkey, 'customer-nation' AS name FROM customer
)
ORDER BY nationkey, name
""",
)
def union_distinct_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nationkey"), F.col("n_name").alias("name")
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer-nation").alias("name")
    )
    return nation.unionByName(cust).dropDuplicates().orderBy("nationkey", "name")


@register(
    "q10_returned_items",
    doc="TPC-H Q10 shape: selective fact filters (quarter + returnflag) "
    "feeding a 3-way join, grouped per customer -- CBO/AQE pick broadcast "
    "for customer/nation; the top-20 is ordered by the ROUNDED revenue on "
    "both engines so the cut line is deterministic.",
    oracle=f"""
SELECT c_custkey, c_name, n_name,
  ROUND(SUM(l_extendedprice * (1 - l_discount)), {R}) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        # customer grows with SF: AQE-selected join, hint only the fixed dim
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), R).alias("revenue"))
        .select("c_custkey", "c_name", "n_name", "revenue")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q18_large_orders",
    doc="TPC-H Q18 shape: join against an aggregated subquery (orders "
    "whose lineitems sum past a volume threshold) -- the filtered agg "
    "side is tiny, so AQE converts the join to broadcast at runtime; "
    "quantities are integral so the HAVING threshold is exact on both "
    "engines.",
    oracle=f"""
WITH big AS (
  SELECT l_orderkey, ROUND(SUM(l_quantity), {R}) AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 300
)
SELECT c_custkey, c_name, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
       ROUND(o_totalprice, {R}) AS total_price, sum_qty
FROM big
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY o_orderkey
""",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_q"))
        .filter(F.col("_q") > 300)
        .select("l_orderkey", F.round("_q", R).alias("sum_qty"))
    )
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        # no forced hint: customer scales with SF, and the doc above already
        # relies on AQE runtime conversion for the tiny aggregated side
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            # DATE output -- TZ-proof rendering, see q3_shipping_priority
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            F.round("o_totalprice", R).alias("total_price"),
            "sum_qty",
        )
        .orderBy("o_orderkey")
    )


@register(
    "join_semi_anti",
    doc="Combined J5 semi/anti verification in one driver slot: EXISTS "
    "(orders with a high-quantity lineitem) UNION ALL NOT EXISTS "
    "(customers with no orders), tagged by mode. Both legs shuffle keys "
    "only -- the scale-correct EXISTS/NOT-EXISTS plans; the union is "
    "plan-level concat, no extra exchange.",
    oracle="""
SELECT mode, k, label FROM (
  SELECT 'semi' AS mode, o_orderkey AS k, CAST(o_totalprice AS VARCHAR) AS label
  FROM orders
  WHERE EXISTS (
    SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 49
  )
  UNION ALL
  SELECT 'anti' AS mode, c_custkey AS k, c_name AS label
  FROM customer
  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
)
ORDER BY mode, k
""",
)
def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 49)
    cust = load_table(spark, sf_dir, "customer")
    semi = (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .select(
            F.lit("semi").alias("mode"),
            F.col("o_orderkey").alias("k"),
            F.col("o_totalprice").cast("string").alias("label"),
        )
    )
    anti = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select(
            F.lit("anti").alias("mode"),
            F.col("c_custkey").alias("k"),
            F.col("c_name").alias("label"),
        )
    )
    return semi.unionByName(anti).orderBy("mode", "k")


@register(
    "topk_union_distinct",
    doc="Combined O2-O5 verification in one driver slot: union of "
    "heterogeneous sources, distinct, then top-k. dropDuplicates is one "
    "hash-agg shuffle on the key; the limit after sort still plans "
    "TakeOrderedAndProject over the deduped set (per-partition heaps, "
    "k-way driver merge -- no global sort at any scale).",
    oracle="""
SELECT nationkey, name FROM (
  SELECT DISTINCT nationkey, name FROM (
    SELECT n_nationkey AS nationkey, n_name AS name FROM nation
    UNION ALL
    SELECT c_nationkey AS nationkey, 'customer-nation' AS name FROM customer
  )
)
ORDER BY nationkey DESC, name
LIMIT 30
""",
)
def topk_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nationkey"), F.col("n_name").alias("name")
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer-nation").alias("name")
    )
    return (
        nation.unionByName(cust)
        .dropDuplicates()
        .orderBy(F.col("nationkey").desc(), "name")
        .limit(30)
    )


@register(
    "join_full_outer_counts",
    doc="full-outer join accounting: customers <> orders with "
    "match/customer-only/order-only tallies -- the J-superset member "
    "without a prior driver query. One sort-merge (AQE may pick "
    "broadcast at this SF); null-side counts are exact ints.",
    oracle="""
SELECT count(CASE WHEN c.c_custkey IS NOT NULL AND o.o_orderkey IS NOT NULL THEN 1 END) AS n_matched,
       count(CASE WHEN o.o_orderkey IS NULL THEN 1 END) AS n_customer_only,
       count(CASE WHEN c.c_custkey IS NULL THEN 1 END) AS n_order_only
FROM customer c FULL OUTER JOIN orders o ON c.c_custkey = o.o_custkey
""",
)
def join_full_outer_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    j = cust.join(orders, cust.c_custkey == orders.o_custkey, "full_outer")
    return j.agg(
        F.count(F.when(F.col("c_custkey").isNotNull() & F.col("o_orderkey").isNotNull(), 1)).alias("n_matched"),
        F.count(F.when(F.col("o_orderkey").isNull(), 1)).alias("n_customer_only"),
        F.count(F.when(F.col("c_custkey").isNull(), 1)).alias("n_order_only"),
    )


@register(
    "agg_pivot_type_by_day",
    doc="pivot surface: events pivoted to one column per event type "
    "(explicit value list -- no extra distinct pass, deterministic "
    "schema) with daily counts; oracle restates as conditional "
    "aggregation.",
    oracle="""
SELECT ts::DATE AS day,
       count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
       count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
       count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
       count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
       count(CASE WHEN event_type = 'view' THEN 1 END) AS view
FROM events GROUP BY 1 ORDER BY day
""",
)
def agg_pivot_type_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("day", F.to_date("ts"))
        .groupBy("day")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        .orderBy("day")
    )


@register(
    "join_bloom_prefilter",
    doc="big-big join with a codegen Bloom semi-prefilter (operators/"
    "bloom.py): the selective build side (urgent finished orders, ~7% "
    "of orders) renders its key set as a literal 2^20-bit filter; the "
    "probe side (lineitem) drops non-members inside its SCAN stage -- "
    "before the join exchange -- so ~93% of probe shuffle bytes never "
    "move. False positives only; the real join re-verifies, so results "
    "are identical to the plain join (property-tested no-false-"
    "negatives). Merge strategy pinned to keep the probe exchange "
    "visible at sandbox scale (AQE would broadcast the small build "
    "side and hide the effect this operator exists for at 100 TB).",
    oracle="""
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n_items,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem JOIN orders ON o_orderkey = l_orderkey
WHERE o_orderpriority = '1-URGENT' AND o_orderstatus = 'F'
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from testlog_etl_spark.operators.bloom import bloom_prefiltered_join

    t = load_tables(spark, sf_dir, ("lineitem", "orders"))
    build = (
        t["orders"]
        .filter((F.col("o_orderpriority") == "1-URGENT") & (F.col("o_orderstatus") == "F"))
        .select(F.col("o_orderkey").alias("l_orderkey"))
        .hint("merge")
    )
    joined = bloom_prefiltered_join(t["lineitem"], build, ["l_orderkey"])
    return (
        joined.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"),
        )
        .orderBy("l_returnflag")
    )
