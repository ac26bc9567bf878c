"""r14 registration pack: new operators landed during the r12 freeze,
each wrapped in its driver-shape query callable ``(spark, sf_dir) ->
DataFrame`` with a DuckDB oracle twin — **deliberately UNREGISTERED**
(this module is NOT in ``suite._load_all``'s import list; the registry
stays frozen at 526 through the r12 drain window per COVERAGE.md's
rotation policy, and the r13 slots are already taken by
``queries/r13_pack.py``'s five).

Registration (r14, or r13 if window capacity allows) is mechanical:
add ``"r14_pack"`` to ``_load_all``, replace the plain ``def``s with
``@register`` carrying the same (name, oracle, doc). Every pair here
has a passing local differential test (tests/test_r14_pack.py) running
the Spark callable and the oracle SQL side by side at sf=0.01 — the
same compare tools/verify_all.py performs.

Suite determinism rules apply throughout (suite.py module docstring):
identical aliases both sides, rounded float aggregates, total ORDER BY,
no ARRAY/STRUCT/DECIMAL output columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from testlog_etl_spark.tables import load_tables

# ---------------------------------------------------------------------------
# 1. eval_rank_biased_overlap — RBO between two document rankings
# ---------------------------------------------------------------------------

_RBO_D = 50
_RBO_P = 0.9


def eval_rank_biased_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap (Webber, Moffat & Zobel, TOIS'10) between two
    corpus rankings — by byte length vs by whitespace-token count —
    reported as the full prefix curve to depth D=50: per depth d, the
    intersection size of the two d-prefixes, the agreement |A_d ∩ B_d|/d,
    and the truncated RBO partial sum (1-p) * sum_{e<=d} p^(e-1)*agree(e)
    at persistence p=0.9 (the paper's "RBO_min at depth d": what the
    full RBO is bounded below by given only d ranks).

    Shape (operators/rankeval.py::rbo_curve): a doc enters the
    intersection at depth max(rank_A, rank_B), so the whole curve is
    one inner join of the two top-D lists, a groupBy on that entry
    depth, and two running sums over the D-row depth spine. The only
    corpus-sized work is the two top-D cuts (TakeOrderedAndProject on
    total orders — value DESC, doc_id); every window here runs on <= D
    rows, bounded by construction."""
    from pyspark.sql import Window

    from testlog_etl_spark.operators import textstats
    from testlog_etl_spark.operators.rankeval import rbo_curve

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    base = docs.select(
        "doc_id",
        F.octet_length("text").alias("bl"),
        F.size(textstats.tokens(F.col("text"))).alias("tc"),
    )

    def topd(col: str) -> DataFrame:
        cut = base.orderBy(F.col(col).desc(), "doc_id").limit(_RBO_D)
        w = Window.orderBy(F.col(col).desc(), "doc_id")
        return cut.withColumn("rank", F.row_number().over(w)).select("doc_id", "rank")

    curve = rbo_curve(topd("bl"), topd("tc"), "doc_id", depth=_RBO_D, p=_RBO_P)
    return curve.select(
        "depth",
        "overlap",
        F.round("agreement", 6).alias("agreement"),
        F.round("rbo_prefix", 6).alias("rbo_prefix"),
    ).orderBy("depth")


def rbo_oracle_sql() -> str:
    return f"""
WITH base AS (
  SELECT doc_id, strlen(text) AS bl,
         length(list_filter(string_split(trim(text), ' '), x -> x <> '')) AS tc
  FROM documents
),
a AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY bl DESC, doc_id) AS ra FROM base),
b AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY tc DESC, doc_id) AS rb FROM base),
entry AS (
  SELECT GREATEST(ra, rb) AS m, count(*) AS c
  FROM a JOIN b USING (doc_id)
  WHERE ra <= {_RBO_D} AND rb <= {_RBO_D}
  GROUP BY 1
),
spine AS (SELECT unnest(range(1, {_RBO_D} + 1)) AS depth),
curve AS (
  SELECT spine.depth, COALESCE(entry.c, 0) AS c
  FROM spine LEFT JOIN entry ON entry.m = spine.depth
),
acc AS (
  SELECT depth,
         SUM(c) OVER (ORDER BY depth) AS overlap,
         SUM(c) OVER (ORDER BY depth) * 1.0 / depth AS agreement
  FROM curve
)
SELECT CAST(depth AS INT) AS depth,
       CAST(overlap AS BIGINT) AS overlap,
       ROUND(agreement, 6) AS agreement,
       ROUND((1.0 - {_RBO_P}) * SUM(power({_RBO_P}, depth - 1) * agreement)
             OVER (ORDER BY depth), 6) AS rbo_prefix
FROM acc
ORDER BY depth
"""


# ---------------------------------------------------------------------------
# 2. corpus_dsir_importance — hashed-unigram importance weights
#    (operators/filtering.py::dsir_importance)
# ---------------------------------------------------------------------------

_DSIR_B = 512
_DSIR_K = 25


def corpus_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al., NeurIPS'23): the top-25
    documents by hashed-unigram importance weight toward the lang='en'
    target domain, out of the whole corpus. Weight = per-token-instance
    sum of ln(p_target/p_raw) over Laplace-smoothed 512-bucket
    xxhash64 unigram distributions; the ranking cut uses the ROUNDED
    weight with doc-id ties so it is deterministic cross-engine."""
    from pyspark.sql import Window

    from testlog_etl_spark.operators import textstats
    from testlog_etl_spark.operators.filtering import dsir_importance

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    w = dsir_importance(
        docs.where(F.col("text").isNotNull()),
        "doc_id",
        textstats.tokens(F.col("text")),
        F.col("lang") == "en",
        n_buckets=_DSIR_B,
    )
    cut = w.orderBy(F.col("imp_weight").desc(), "doc_id").limit(_DSIR_K)
    win = Window.orderBy(F.col("imp_weight").desc(), "doc_id")
    return cut.withColumn("rank", F.row_number().over(win)).select(
        "doc_id", "is_target", "n_tokens", "imp_weight", "imp_per_token", "rank"
    ).orderBy("rank")


def dsir_oracle_sql() -> str:
    from testlog_etl_spark.oracles import xxh64_sql

    h = xxh64_sql("term")
    return f"""
WITH toks AS (
  SELECT doc_id, (lang = 'en') AS is_tgt,
         unnest(list_filter(string_split(trim(text), ' '), x -> x <> '')) AS term
  FROM documents WHERE text IS NOT NULL
),
tb AS (
  SELECT doc_id, is_tgt, (({h}) % {_DSIR_B} + {_DSIR_B}) % {_DSIR_B} AS bkt
  FROM toks
),
bc AS (
  SELECT bkt, count(*)::DOUBLE AS raw,
         SUM(CASE WHEN is_tgt THEN 1 ELSE 0 END)::DOUBLE AS tgt
  FROM tb GROUP BY bkt
),
tot AS (SELECT SUM(raw) AS t_raw, SUM(tgt) AS t_tgt FROM bc),
lr AS (
  SELECT bkt, ln((tgt + 1.0) / (t_tgt + {_DSIR_B})) - ln((raw + 1.0) / (t_raw + {_DSIR_B})) AS lr
  FROM bc CROSS JOIN tot
),
w AS (
  SELECT doc_id, is_tgt, count(*) AS n_tokens,
         ROUND(SUM(lr), 4) AS imp_weight,
         ROUND(SUM(lr) / count(*), 6) AS imp_per_token
  FROM tb JOIN lr USING (bkt)
  GROUP BY doc_id, is_tgt
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY imp_weight DESC, doc_id) AS rn FROM w
)
SELECT doc_id, is_tgt AS is_target, n_tokens, imp_weight, imp_per_token,
       CAST(rn AS INT) AS rank
FROM ranked WHERE rn <= {_DSIR_K}
ORDER BY rank
"""


# ---------------------------------------------------------------------------
# 3. search_query_likelihood — Dirichlet-smoothed LM retrieval
#    (operators/postings.py::query_likelihood_topk)
# ---------------------------------------------------------------------------

_QL_TERMS = ["spark", "window", "dup", "zzz_absent"]
_QL_MU = 300.0
_QL_K = 10


def search_query_likelihood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirichlet query-likelihood top-10 (Zhai & Lafferty, SIGIR'01) for
    a mixed-selectivity query — two stopword-grade terms (df~390/500),
    one rare term ('dup', df=25), and one corpus-absent term exercising
    the effective-query contract (zero-cf terms drop, OR-retrieval).
    The LM twin of the registered text_bm25_topk."""
    from testlog_etl_spark.operators import textstats
    from testlog_etl_spark.operators.postings import query_likelihood_topk

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    out = query_likelihood_topk(
        docs, "doc_id", textstats.tokens(F.col("text")), _QL_TERMS, k=_QL_K, mu=_QL_MU
    )
    return out.orderBy("rank")


def query_likelihood_oracle_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in _QL_TERMS)
    return f"""
WITH base AS (
  SELECT doc_id,
         list_filter(string_split(trim(text), ' '), x -> x <> '') AS terms
  FROM documents
),
b2 AS (SELECT doc_id, terms, length(terms) AS len FROM base),
stats AS (SELECT SUM(len)::DOUBLE AS coll FROM b2),
qh AS (
  SELECT doc_id, len, unnest(list_filter(terms, t -> t IN ({terms}))) AS term
  FROM b2
),
cf AS (SELECT term, count(*)::DOUBLE AS cf FROM qh GROUP BY term),
qagg AS (
  SELECT SUM(ln({_QL_MU} * cf / coll)) AS qconst, count(*) AS nq
  FROM cf CROSS JOIN stats
),
hits AS (SELECT doc_id, len, term, count(*) AS tf FROM qh GROUP BY doc_id, len, term),
sc AS (
  SELECT doc_id, len,
         SUM(ln(1.0 + tf * coll / ({_QL_MU} * cf))) AS hitsum,
         count(*) AS n_terms
  FROM hits JOIN cf USING (term) CROSS JOIN stats
  GROUP BY doc_id, len
),
scored AS (
  SELECT doc_id,
         ROUND(qconst - nq * ln(len + {_QL_MU}) + hitsum, 4) AS score,
         n_terms
  FROM sc CROSS JOIN qagg
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rn FROM scored
)
SELECT doc_id, score, CAST(n_terms AS BIGINT) AS n_terms, CAST(rn AS INT) AS rank
FROM ranked WHERE rn <= {_QL_K}
ORDER BY rank
"""


# ---------------------------------------------------------------------------
# 4. agg_skyline_bucketed — the distributed-merge skyline deployment form
#    (operators/skyline.py::pareto_frontier_2d_bucketed, landed r12)
# ---------------------------------------------------------------------------


def agg_skyline_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same rows as the registered agg_skyline_pareto (exact Pareto
    frontier, minimize price / maximize size), computed by the BUCKETED
    form whose merge is a bucket-keyed shuffle plus an n_buckets-row
    running ymax instead of a coalesce(1) task — the shape that holds
    when anti-correlated data makes the frontier itself O(n). The
    oracle states the O(n^2) NOT EXISTS dominance contract directly;
    matching it pins the bucketed merge exact, not approximate."""
    from testlog_etl_spark.operators.skyline import pareto_frontier_2d_bucketed

    part = load_tables(spark, sf_dir, ("part",))["part"]
    pts = part.select("p_partkey", "p_retailprice", "p_size")
    front = pareto_frontier_2d_bucketed(pts, "p_retailprice", "p_size", n_buckets=64)
    return front.select(
        "p_partkey", F.round("p_retailprice", 2).alias("price"), "p_size"
    ).orderBy("p_partkey")


_SKYLINE_ORACLE = """
SELECT a.p_partkey, ROUND(a.p_retailprice, 2) AS price, a.p_size
FROM part a
WHERE NOT EXISTS (
  SELECT 1 FROM part b
  WHERE b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size
    AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size)
)
ORDER BY a.p_partkey
"""


# ---------------------------------------------------------------------------
# 5. dq_benford_first_digit — Benford's-law first-digit conformance check
# ---------------------------------------------------------------------------


def dq_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of order totals vs Benford's
    law (Newcomb 1881 / Benford 1938): per digit 1-9, the observed count
    and share, the expected share log10(1 + 1/d), the chi-square term
    n*(obs-exp)^2/exp toward the 8-df goodness-of-fit statistic, and the
    statistic itself as a constant column — the classic fraud/DQ screen
    over monetary columns. The digit is extracted through an exact
    integer path (floor -> bigint -> leading character), never log10 of
    the value, so boundary values like 1000.0 can't flip digits on libm
    ulps; values < 1 are excluded by contract (none exist in orders).
    Scale shape: one scan, a 9-group aggregate, and 9-row spine joins —
    everything after the scan is constant-sized."""
    from pyspark.sql import Window

    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    v = orders.where(F.col("o_totalprice") >= 1).select(
        F.substring(F.floor("o_totalprice").cast("string"), 1, 1)
        .cast("int")
        .alias("digit")
    )
    obs = v.groupBy("digit").agg(F.count(F.lit(1)).alias("n_d"))
    n = v.agg(F.count(F.lit(1)).cast("double").alias("n"))
    spine = spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    j = (
        spine.join(obs, "digit", "left")
        .select("digit", F.coalesce("n_d", F.lit(0)).alias("n_d"))
        .crossJoin(F.broadcast(n))
        .withColumn("exp_share", F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit")))
        .withColumn(
            "chi2_term",
            F.pow(F.col("n_d") - F.col("n") * F.col("exp_share"), 2)
            / (F.col("n") * F.col("exp_share")),
        )
    )
    wall = Window.orderBy("digit").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return j.select(
        "digit",
        F.col("n_d").cast("long").alias("n_d"),
        F.round(F.col("n_d") / F.col("n"), 6).alias("obs_share"),
        F.round("exp_share", 6).alias("exp_share"),
        F.round("chi2_term", 6).alias("chi2_term"),
        F.round(F.sum("chi2_term").over(wall), 6).alias("chi2_total"),
    ).orderBy("digit")


def benford_oracle_sql() -> str:
    return """
WITH v AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
  FROM orders WHERE o_totalprice >= 1
),
n AS (SELECT count(*)::DOUBLE AS n FROM v),
obs AS (SELECT digit, count(*) AS n_d FROM v GROUP BY digit),
spine AS (SELECT CAST(unnest(range(1, 10)) AS INT) AS digit),
j AS (
  SELECT spine.digit, COALESCE(obs.n_d, 0) AS n_d, n,
         log10(1.0 + 1.0 / spine.digit) AS exp_share
  FROM spine LEFT JOIN obs ON obs.digit = spine.digit CROSS JOIN n
),
t AS (
  SELECT digit, n_d, n, exp_share,
         (n_d - n * exp_share) * (n_d - n * exp_share) / (n * exp_share) AS chi2_term
  FROM j
)
SELECT digit, CAST(n_d AS BIGINT) AS n_d,
       ROUND(n_d / n, 6) AS obs_share,
       ROUND(exp_share, 6) AS exp_share,
       ROUND(chi2_term, 6) AS chi2_term,
       ROUND(SUM(chi2_term) OVER (), 6) AS chi2_total
FROM t
ORDER BY digit
"""


# ---------------------------------------------------------------------------
# 6. ts_matrix_profile — exact z-normalized matrix profile (ICDM'16)
# ---------------------------------------------------------------------------

_MP_M = 24
_MP_EXCL = 12


def _dense_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly event-count series per type: t = days-since-min-date
    * 24 + hour (field extracts only — TZ-shift-free on both engines),
    missing hours filled with count 0, BIGINT values. ONE corpus-sized
    pass: the (type, date, hour) rollup is persisted (bounded: types x
    days x 24), so d0 / max-t / distinct-types all read the tiny rollup,
    not the events scan. Shared by the ts_matrix_profile and
    ts_pattern_search wrappers; the oracle twin is the serie CTE both
    their SQL strings open with."""
    from testlog_etl_spark.util import persist_once

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    daily = persist_once(
        ev.groupBy(
            "event_type",
            F.col("ts").cast("date").alias("d"),
            F.hour("ts").alias("hr"),
        ).agg(F.count(F.lit(1)).alias("v"))
    )
    d0 = daily.agg(F.min("d").alias("d0"))
    hourly = daily.crossJoin(F.broadcast(d0)).select(
        "event_type",
        (F.datediff(F.col("d"), F.col("d0")) * 24 + F.col("hr"))
        .cast("long")
        .alias("t"),
        "v",
    )
    mx = hourly.agg(F.max("t").alias("mt"))
    types = daily.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(mx)).select(
        "event_type",
        F.explode(F.sequence(F.lit(0).cast("long"), F.col("mt"))).alias("t"),
    )
    return spine.join(hourly, ["event_type", "t"], "left").select(
        "event_type", "t", F.coalesce("v", F.lit(0)).cast("long").alias("v")
    )


def ts_matrix_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact z-normalized matrix profile (Yeh et al., ICDM'16) of each
    event type's hourly-count series: for every 24-hour window, the
    distance to the MOST SIMILAR other day-shaped window at least 12
    hours away, plus where it is — the exact-distance sibling of
    ts_sax_motifs (low mp_dist = a motif that recurs somewhere; high
    mp_dist = a discord, THE standard anomaly readout).

    The series is the dense hourly grid: t = days-since-min-date * 24
    + hour (field extracts only — TZ-shift-free on both engines, unlike
    an epoch/3600 bucket), missing hours filled with count 0. Counts
    are BIGINTs, so every sliding sum in the construction
    (operators/timeseries.py::matrix_profile — relational SCRIMP: one
    self-join materializes the per-diagonal product series, one
    (type, diagonal)-partitioned window turns them into dot products)
    is exact on both engines; the closed-form distance is evaluated
    with the identical expression tree and ranked on its 6dp rounding
    (ties to the smaller index). Scale shape: the corpus-sized work is
    the hourly rollup; the Theta(n^2/2) pair fan-out is bounded by the
    SERIES length (720 here), rides id-free (type, d, t, product)
    rows, and parallelizes by diagonal — `max_diag` is the documented
    valve for long series (kept None here: the exact-profile
    contract)."""
    from testlog_etl_spark.operators.timeseries import matrix_profile

    serie = _dense_hourly_counts(spark, sf_dir)
    mp = matrix_profile(
        serie,
        m=_MP_M,
        excl=_MP_EXCL,
        series_col="event_type",
        t_col="t",
        value_col="v",
        round_dp=6,
    )
    return mp.select(
        "event_type",
        F.col("t").cast("long").alias("t"),
        "mp_dist",
        F.col("mp_index").cast("long").alias("mp_index"),
    ).orderBy("event_type", "t")


# DuckDB twin of _dense_hourly_counts, shared by the two oracles below
_SERIE_SQL = """d0 AS (SELECT MIN(CAST(ts AS DATE)) AS d0 FROM events),
hourly AS (
  SELECT event_type,
         CAST(date_diff('day', d0.d0, CAST(ts AS DATE)) * 24
              + extract(hour FROM ts) AS BIGINT) AS t,
         count(*) AS v
  FROM events, d0 GROUP BY 1, 2
),
mx AS (SELECT MAX(t) AS mt FROM hourly),
spine AS (
  SELECT e.event_type, g.t
  FROM (SELECT DISTINCT event_type FROM hourly) e
  CROSS JOIN (SELECT unnest(range(0, mt + 1)) AS t FROM mx) g
),
serie AS (
  SELECT spine.event_type, spine.t, CAST(COALESCE(hourly.v, 0) AS BIGINT) AS v
  FROM spine LEFT JOIN hourly
    ON hourly.event_type = spine.event_type AND hourly.t = spine.t
)"""


def matrix_profile_oracle_sql() -> str:
    return f"""
WITH {_SERIE_SQL},
stats0 AS (
  SELECT event_type, t,
         SUM(v) OVER w AS sm, SUM(v * v) OVER w AS sq, COUNT(*) OVER w AS c
  FROM serie
  WINDOW w AS (PARTITION BY event_type ORDER BY t
               ROWS BETWEEN CURRENT ROW AND {_MP_M - 1} FOLLOWING)
),
stats AS (
  SELECT event_type, t,
         CAST(sm AS DOUBLE) / {_MP_M}.0 AS mu,
         sqrt(GREATEST(CAST(sq AS DOUBLE) / {_MP_M}.0
              - (CAST(sm AS DOUBLE) / {_MP_M}.0) * (CAST(sm AS DOUBLE) / {_MP_M}.0),
              0.0)) AS sig
  FROM stats0 WHERE c = {_MP_M}
),
prods AS (
  SELECT a.event_type, b.t - a.t AS d, a.t AS t, a.v * b.v AS p
  FROM serie a JOIN serie b
    ON a.event_type = b.event_type AND b.t - a.t > {_MP_EXCL}
),
qt0 AS (
  SELECT event_type, d, t, SUM(p) OVER w AS qt, COUNT(*) OVER w AS c
  FROM prods
  WINDOW w AS (PARTITION BY event_type, d ORDER BY t
               ROWS BETWEEN CURRENT ROW AND {_MP_M - 1} FOLLOWING)
),
edges AS (
  SELECT q.event_type, q.t AS w, q.t + q.d AS o,
         CASE WHEN si.sig = 0 AND sj.sig = 0 THEN 0.0
              WHEN si.sig = 0 OR sj.sig = 0 THEN sqrt({_MP_M}.0)
              ELSE sqrt(2.0 * {_MP_M}.0 * (1.0 - LEAST(1.0, GREATEST(-1.0,
                   (CAST(q.qt AS DOUBLE) - {_MP_M}.0 * si.mu * sj.mu)
                   / ({_MP_M}.0 * si.sig * sj.sig)))))
         END AS dist
  FROM (SELECT event_type, d, t, qt FROM qt0 WHERE c = {_MP_M}) q
  JOIN stats si ON si.event_type = q.event_type AND si.t = q.t
  JOIN stats sj ON sj.event_type = q.event_type AND sj.t = q.t + q.d
),
sym AS (
  SELECT event_type, w, o, ROUND(dist, 6) AS dist FROM edges
  UNION ALL
  SELECT event_type, o AS w, w AS o, ROUND(dist, 6) AS dist FROM edges
)
SELECT event_type, CAST(w AS BIGINT) AS t, dist AS mp_dist,
       CAST(o AS BIGINT) AS mp_index
FROM sym
QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type, w ORDER BY dist, o) = 1
ORDER BY event_type, t
"""


# ---------------------------------------------------------------------------
# 7. ts_holt_winters_forecast — additive triple exponential smoothing
# ---------------------------------------------------------------------------

_HW_P = 7
_HW_H = 7
_HW_A, _HW_B, _HW_G = 0.3, 0.1, 0.2


def ts_holt_winters_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive Holt-Winters forecast (Winters 1960) of each event
    type's daily event-count series: level/trend/weekly-seasonal state
    smoothed over the dense 30-day history (missing days count 0),
    read out as a 7-day-ahead forecast plus the final level and trend
    — the seasonal-aware step past q6's linear trend and the EWMA
    control chart's single smoothing.

    Shape (operators/timeseries.py::holt_winters_additive): one keyed
    rollup to (type, day), a dense day spine, one per-series collect
    (series-length-bounded), then the whole strictly-sequential
    recurrence as ONE SQL aggregate() fold in whole-stage codegen with
    a (level, trend, seasonal-ring) accumulator. Counts are integers
    so the two-season init means are exact; smoothing constants enter
    as shared repr literals; the oracle replays the identical
    operation order as a recursive CTE — bit-equal before the 6dp
    output rounding."""
    from testlog_etl_spark.operators.timeseries import holt_winters_additive
    from testlog_etl_spark.util import persist_once

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    daily = persist_once(
        ev.groupBy(
            "event_type", F.col("ts").cast("date").alias("d")
        ).agg(F.count(F.lit(1)).alias("v"))
    )
    d0 = daily.agg(F.min("d").alias("d0"))
    idx = daily.crossJoin(F.broadcast(d0)).select(
        "event_type",
        F.datediff(F.col("d"), F.col("d0")).cast("long").alias("t"),
        "v",
    )
    mx = idx.agg(F.max("t").alias("mt"))
    spine = (
        daily.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(mx))
        .select(
            "event_type",
            F.explode(F.sequence(F.lit(0).cast("long"), F.col("mt"))).alias("t"),
        )
    )
    serie = spine.join(idx, ["event_type", "t"], "left").select(
        "event_type", "t", F.coalesce("v", F.lit(0)).cast("long").alias("v")
    )
    hw = holt_winters_additive(
        serie,
        p=_HW_P,
        horizon=_HW_H,
        alpha=_HW_A,
        beta=_HW_B,
        gamma=_HW_G,
        series_col="event_type",
        t_col="t",
        value_col="v",
    )
    return hw.select(
        "event_type",
        "h",
        F.round("yhat", 6).alias("yhat"),
        F.round("level", 6).alias("level"),
        F.round("trend", 6).alias("trend"),
    ).orderBy("event_type", "h")


def holt_winters_oracle_sql() -> str:
    p = _HW_P
    al, be, ga = repr(float(_HW_A)), repr(float(_HW_B)), repr(float(_HW_G))
    oma, omb, omg = (
        repr(1.0 - float(_HW_A)),
        repr(1.0 - float(_HW_B)),
        repr(1.0 - float(_HW_G)),
    )
    return f"""
WITH RECURSIVE daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS v
  FROM events GROUP BY 1, 2
),
d0 AS (SELECT MIN(d) AS d0 FROM daily),
idx AS (
  SELECT event_type, CAST(date_diff('day', d0.d0, d) AS BIGINT) AS t, v
  FROM daily, d0
),
mx AS (SELECT MAX(t) AS mt FROM idx),
spine AS (
  SELECT e.event_type, g.t
  FROM (SELECT DISTINCT event_type FROM daily) e
  CROSS JOIN (SELECT unnest(range(0, mt + 1)) AS t FROM mx) g
),
serie AS (
  SELECT spine.event_type, spine.t, CAST(COALESCE(idx.v, 0) AS BIGINT) AS v
  FROM spine LEFT JOIN idx
    ON idx.event_type = spine.event_type AND idx.t = spine.t
),
arrs AS (
  SELECT event_type, array_agg(CAST(v AS DOUBLE) ORDER BY t) AS vv
  FROM serie GROUP BY 1
),
init AS (
  SELECT event_type, vv,
         list_sum(vv[:{p}]) / {p}.0 AS l0,
         (list_sum(vv[{p + 1}:{2 * p}]) / {p}.0 - list_sum(vv[:{p}]) / {p}.0)
           / {p}.0 AS b0
  FROM arrs WHERE len(vv) >= {2 * p}
),
hw AS (
  SELECT event_type, vv, {p} AS t, l0 AS lv, b0 AS tr,
         list_transform(vv[:{p}], x -> x - l0) AS ss
  FROM init
  UNION ALL
  SELECT event_type, vv, t + 1,
         lnew,
         {be} * (lnew - lv) + {omb} * tr,
         ss[:(t % {p})]
           || [{ga} * (vv[t + 1] - lnew) + {omg} * ss[(t % {p}) + 1]]
           || ss[(t % {p}) + 2:]
  FROM (
    SELECT *, {al} * (vv[t + 1] - ss[(t % {p}) + 1]) + {oma} * (lv + tr) AS lnew
    FROM hw WHERE t < len(vv)
  )
),
fin AS (SELECT * FROM hw WHERE t = len(vv))
SELECT event_type, CAST(hs.h AS INT) AS h,
       ROUND(lv + hs.h * tr + ss[((len(vv) - 1 + hs.h) % {p}) + 1], 6) AS yhat,
       ROUND(lv, 6) AS level,
       ROUND(tr, 6) AS trend
FROM fin, (SELECT unnest(range(1, {_HW_H + 1})) AS h) hs
ORDER BY event_type, h
"""


# ---------------------------------------------------------------------------
# 8. ts_pattern_search — MASS z-normalized subsequence search
# ---------------------------------------------------------------------------

_PS_M = 24
_PS_K = 5
_PS_QUERY_TYPE = "click"


def ts_pattern_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-normalized subsequence search (the MASS readout, Mueen et al.
    2015): take the 'click' series' FIRST DAY (hours 0-23) as the query
    shape and report, per event type, the 5 windows of its hourly
    series whose shape matches it best — "where does this pattern
    occur?", the query-driven sibling of ts_matrix_profile (same
    distance, same zero-variance conventions; the query type itself
    matches trivially at t=0 with distance 0, a deliberate fixed point
    that pins the identity case).

    Shape (operators/timeseries.py::pattern_search): QT(i) rides one
    broadcast join of the series against the m-row query and one
    (series, i) rollup — O(n*m), map-side combined, no self-join and
    no quadratic term; window stats are the matrix profile's sliding
    integer sums; the top-k cut is a per-series window over n-m+1
    rows. Ranked on the 6dp-rounded distance (ties to the smaller t)
    on both engines."""
    from testlog_etl_spark.operators.timeseries import pattern_search

    serie = _dense_hourly_counts(spark, sf_dir)
    q = serie.filter(
        (F.col("event_type") == _PS_QUERY_TYPE) & (F.col("t") < _PS_M)
    ).select(F.col("t").alias("qt"), F.col("v").alias("qv"))
    out = pattern_search(
        serie,
        q,
        m=_PS_M,
        series_col="event_type",
        t_col="t",
        value_col="v",
        top_k=_PS_K,
        round_dp=6,
    )
    return out.select(
        "event_type",
        F.col("t").cast("long").alias("t"),
        "dist",
        "rank",
    ).orderBy("event_type", "rank")


def pattern_search_oracle_sql() -> str:
    m = _PS_M
    return f"""
WITH {_SERIE_SQL},
q AS (
  SELECT t AS k, v AS qv FROM serie
  WHERE event_type = '{_PS_QUERY_TYPE}' AND t < {m}
),
qs AS (
  SELECT CAST(SUM(qv) AS DOUBLE) / {m}.0 AS qmu,
         sqrt(GREATEST(CAST(SUM(qv * qv) AS DOUBLE) / {m}.0
              - (CAST(SUM(qv) AS DOUBLE) / {m}.0)
                * (CAST(SUM(qv) AS DOUBLE) / {m}.0), 0.0)) AS qsig
  FROM q
),
stats0 AS (
  SELECT event_type, t,
         SUM(v) OVER w AS sm, SUM(v * v) OVER w AS sq, COUNT(*) OVER w AS c
  FROM serie
  WINDOW w AS (PARTITION BY event_type ORDER BY t
               ROWS BETWEEN CURRENT ROW AND {m - 1} FOLLOWING)
),
stats AS (
  SELECT event_type, t,
         CAST(sm AS DOUBLE) / {m}.0 AS mu,
         sqrt(GREATEST(CAST(sq AS DOUBLE) / {m}.0
              - (CAST(sm AS DOUBLE) / {m}.0) * (CAST(sm AS DOUBLE) / {m}.0),
              0.0)) AS sig
  FROM stats0 WHERE c = {m}
),
prods AS (
  SELECT s.event_type, s.t - q.k AS i, SUM(s.v * q.qv) AS qt, COUNT(*) AS pc
  FROM serie s, q WHERE s.t - q.k >= 0
  GROUP BY 1, 2
),
d AS (
  SELECT p.event_type, p.i,
         ROUND(CASE WHEN st.sig = 0 AND qs.qsig = 0 THEN 0.0
                    WHEN st.sig = 0 OR qs.qsig = 0 THEN sqrt({m}.0)
                    ELSE sqrt(2.0 * {m}.0 * (1.0 - LEAST(1.0, GREATEST(-1.0,
                         (CAST(p.qt AS DOUBLE) - {m}.0 * st.mu * qs.qmu)
                         / ({m}.0 * st.sig * qs.qsig)))))
               END, 6) AS dist
  FROM prods p
  JOIN stats st ON st.event_type = p.event_type AND st.t = p.i
  CROSS JOIN qs
  WHERE p.pc = {m}
)
SELECT event_type, CAST(i AS BIGINT) AS t, dist,
       CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY dist, i)
            AS INT) AS rank
FROM d
QUALIFY rank <= {_PS_K}
ORDER BY event_type, rank
"""


# ---------------------------------------------------------------------------
# 9. ts_matrix_profile_ab — cross-series matrix-profile AB-join
# ---------------------------------------------------------------------------


def ts_matrix_profile_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matrix-profile AB-join (Yeh et al., ICDM'16 §AB) across the five
    event types' hourly-count series: for every unordered type pair,
    the closest shared 24-hour shape and exactly where it occurs in
    each stream — the cross-stream motif alignment the self-join
    profile can't give (ts_matrix_profile says "this shape recurs HERE";
    this says "these two streams share a shape, at these offsets").

    Shape (operators/timeseries.py::matrix_profile_ab): ordered-pair
    diagonal product series for non-negative lags + the same
    (pair, lag)-partitioned sliding integer sums, two broadcast stats
    probes, orientation-normalized struct-min argmin (negative lags by
    symmetry). Candidates are Theta(n^2/2) per ordered pair —
    series-length-bounded with the pair count as the second explicit
    axis; `max_diag` (the bucketed band join) is the lag valve, kept
    None here: the exact contract."""
    from testlog_etl_spark.operators.timeseries import matrix_profile_ab

    serie = _dense_hourly_counts(spark, sf_dir)
    ab = matrix_profile_ab(
        serie,
        m=_MP_M,
        series_col="event_type",
        t_col="t",
        value_col="v",
        round_dp=6,
    )
    return ab.select(
        F.col("series_a").alias("type_a"),
        F.col("series_b").alias("type_b"),
        F.col("t_a").cast("long").alias("t_a"),
        F.col("t_b").cast("long").alias("t_b"),
        "dist",
    ).orderBy("type_a", "type_b")


def matrix_profile_ab_oracle_sql() -> str:
    m = _MP_M
    return f"""
WITH {_SERIE_SQL},
stats0 AS (
  SELECT event_type, t,
         SUM(v) OVER w AS sm, SUM(v * v) OVER w AS sq, COUNT(*) OVER w AS c
  FROM serie
  WINDOW w AS (PARTITION BY event_type ORDER BY t
               ROWS BETWEEN CURRENT ROW AND {m - 1} FOLLOWING)
),
stats AS (
  SELECT event_type, t,
         CAST(sm AS DOUBLE) / {m}.0 AS mu,
         sqrt(GREATEST(CAST(sq AS DOUBLE) / {m}.0
              - (CAST(sm AS DOUBLE) / {m}.0) * (CAST(sm AS DOUBLE) / {m}.0),
              0.0)) AS sig
  FROM stats0 WHERE c = {m}
),
prods AS (
  SELECT a.event_type AS sa, b.event_type AS sb, b.t - a.t AS d,
         a.t AS t, a.v * b.v AS p
  FROM serie a JOIN serie b
    ON a.event_type <> b.event_type AND b.t - a.t >= 0
),
qt0 AS (
  SELECT sa, sb, d, t, SUM(p) OVER w AS qt, COUNT(*) OVER w AS c
  FROM prods
  WINDOW w AS (PARTITION BY sa, sb, d ORDER BY t
               ROWS BETWEEN CURRENT ROW AND {m - 1} FOLLOWING)
),
edges AS (
  SELECT CASE WHEN q.sa < q.sb THEN q.sa ELSE q.sb END AS pa,
         CASE WHEN q.sa < q.sb THEN q.sb ELSE q.sa END AS pb,
         CASE WHEN q.sa < q.sb THEN q.t ELSE q.t + q.d END AS ta,
         CASE WHEN q.sa < q.sb THEN q.t + q.d ELSE q.t END AS tb,
         ROUND(CASE WHEN si.sig = 0 AND sj.sig = 0 THEN 0.0
                    WHEN si.sig = 0 OR sj.sig = 0 THEN sqrt({m}.0)
                    ELSE sqrt(2.0 * {m}.0 * (1.0 - LEAST(1.0, GREATEST(-1.0,
                         (CAST(q.qt AS DOUBLE) - {m}.0 * si.mu * sj.mu)
                         / ({m}.0 * si.sig * sj.sig)))))
               END, 6) AS dist
  FROM (SELECT sa, sb, d, t, qt FROM qt0 WHERE c = {m}) q
  JOIN stats si ON si.event_type = q.sa AND si.t = q.t
  JOIN stats sj ON sj.event_type = q.sb AND sj.t = q.t + q.d
)
SELECT pa AS type_a, pb AS type_b, CAST(ta AS BIGINT) AS t_a,
       CAST(tb AS BIGINT) AS t_b, dist
FROM edges
QUALIFY ROW_NUMBER() OVER (PARTITION BY pa, pb ORDER BY dist, ta, tb) = 1
ORDER BY type_a, type_b
"""


# ---------------------------------------------------------------------------
# 10. multimodal_ahash_dedup — perceptual-hash near-dup over media payloads
# ---------------------------------------------------------------------------

_AH_DIST = 14


def multimodal_ahash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-duplicate tier for the multimodal column: the
    classic average hash (aHash — 64 equal-share pixel blocks, bit =
    block mean > global mean) over each media payload, then the
    EXISTING PassJoin pigeonhole Hamming join finds payload pairs
    within distance 14 — image near-dup detection composed from the
    multimodal Arrow plumbing plus the dedup family's blocking join,
    with the decode step the same honest stand-in as
    multimodal_features (bytes AS pixels; a real deployment decodes to
    grayscale first and changes nothing downstream).

    Shape (operators/multimodal.py::average_hash +
    operators/neardup.py::hamming_join): one mapInPandas Arrow pass
    emits a 64-char bit-string per payload (integer block sums, one
    exact double division per mean — engine-portable bits), the bit
    string is an ordinary 64-char key for the chunk-blocked join, so
    nothing goes all-pairs; the oracle states the O(n^2) contract with
    DuckDB's native hamming() over SQL-replayed hashes. Payloads
    shorter than 64 bytes are excluded by contract (no meaningful
    blocks)."""
    from testlog_etl_spark.operators import multimodal, neardup

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    media = multimodal.documents_as_media(docs)
    hashes = multimodal.average_hash(media, bits=64).select(
        F.col("media_id").alias("doc_id"), "ahash"
    )
    out = neardup.hamming_join(hashes, "doc_id", "ahash", length=64, max_dist=_AH_DIST)
    return out.orderBy("a_id", "b_id")


def ahash_oracle_sql() -> str:
    return f"""
WITH bytes AS (
  SELECT doc_id, length(text) AS n,
         [ord(substr(text, i, 1)) for i in range(1, length(text) + 1)] AS bs
  FROM documents WHERE length(text) >= 64
),
hashes AS (
  SELECT doc_id,
         (SELECT string_agg(
            CASE WHEN list_avg(bs[(g.i * n) // 64 + 1 : ((g.i + 1) * n) // 64])
                      > list_avg(bs)
                 THEN '1' ELSE '0' END, '' ORDER BY g.i)
          FROM (SELECT unnest(range(64)) AS i) g) AS h
  FROM bytes
)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       CAST(hamming(a.h, b.h) AS INT) AS dist
FROM hashes a JOIN hashes b ON a.doc_id < b.doc_id
WHERE hamming(a.h, b.h) <= {_AH_DIST}
ORDER BY a_id, b_id
"""


# name -> (query fn, oracle SQL, doc one-liner) — the r14 registration
# reads this mapping verbatim.
R14_PACK: dict[str, tuple] = {
    "eval_rank_biased_overlap": (
        eval_rank_biased_overlap,
        rbo_oracle_sql(),
        "RBO prefix curve between two rankings (Webber et al. TOIS'10)",
    ),
    "corpus_dsir_importance": (
        corpus_dsir_importance,
        dsir_oracle_sql(),
        "DSIR hashed-unigram importance weights toward a target domain",
    ),
    "search_query_likelihood": (
        search_query_likelihood,
        query_likelihood_oracle_sql(),
        "Dirichlet-smoothed query-likelihood retrieval (LM twin of BM25)",
    ),
    "agg_skyline_bucketed": (
        agg_skyline_bucketed,
        _SKYLINE_ORACLE,
        "exact Pareto frontier via the distributed bucketed merge",
    ),
    "dq_benford_first_digit": (
        dq_benford_first_digit,
        benford_oracle_sql(),
        "Benford first-digit conformance with chi-square terms",
    ),
    "ts_matrix_profile": (
        ts_matrix_profile,
        matrix_profile_oracle_sql(),
        "exact z-normalized matrix profile of hourly event series",
    ),
    "ts_holt_winters_forecast": (
        ts_holt_winters_forecast,
        holt_winters_oracle_sql(),
        "additive Holt-Winters weekly-seasonal 7-day forecast",
    ),
    "ts_pattern_search": (
        ts_pattern_search,
        pattern_search_oracle_sql(),
        "MASS z-normalized query-by-shape search over hourly series",
    ),
    "ts_matrix_profile_ab": (
        ts_matrix_profile_ab,
        matrix_profile_ab_oracle_sql(),
        "cross-series matrix-profile AB-join: closest shared shape",
    ),
    "multimodal_ahash_dedup": (
        multimodal_ahash_dedup,
        ahash_oracle_sql(),
        "average-hash perceptual near-dup over media payloads",
    ),
}
