"""Unit tests for round-7 session-5 operators (Jarque-Bera,
Kruskal-Wallis, ...): each statistic is re-derived in pure Python from
first principles and checked closed-form, then the Spark query is run at
sf0.001 and compared against a pandas recomputation of the same formula.
"""

from __future__ import annotations

import math

import pandas as pd

SF_SMALL = "/root/testdata/sf0.001"


# ------------------------------------------------------- Jarque-Bera


def _jb(vals):
    n = len(vals)
    mu = sum(vals) / n
    m2 = sum((x - mu) ** 2 for x in vals) / n
    m3 = sum((x - mu) ** 3 for x in vals) / n
    m4 = sum((x - mu) ** 4 for x in vals) / n
    s = m3 / m2 ** 1.5
    k = m4 / (m2 * m2)
    return s, k, n / 6.0 * (s * s + (k - 3.0) ** 2 / 4.0)


def test_jarque_bera_closed_form_uniform5():
    # [1..5]: symmetric -> skew 0; m2=2, m4=6.8 -> kurt 1.7;
    # JB = 5/6 * (1.3^2/4) = 0.3520833...
    s, k, jb = _jb([1, 2, 3, 4, 5])
    assert abs(s) < 1e-12
    assert abs(k - 1.7) < 1e-12
    assert abs(jb - 5 / 6 * (1.3 ** 2 / 4)) < 1e-12


def test_jarque_bera_spark_matches_pandas(spark):
    from testlog_etl_spark.queries.stats_queries import stats_jarque_bera

    got = {r.o_orderpriority: r for r in stats_jarque_bera(spark, SF_SMALL).collect()}
    pdf = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    for g, grp in pdf.groupby("o_orderpriority"):
        s, k, jb = _jb(list(grp.o_totalprice))
        row = got[g]
        assert row.n == len(grp)
        assert abs(row.skewness - s) < 1e-3
        assert abs(row.kurtosis - k) < 1e-3
        assert abs(row.jb_stat - jb) < max(1e-3, abs(jb) * 1e-6)


# ---------------------------------------------------- Kruskal-Wallis


def _kw(groups):
    """groups: list of lists. Returns tie-corrected H."""
    pooled = sorted(x for g in groups for x in g)
    n = len(pooled)
    # midranks
    rank = {}
    i = 0
    while i < n:
        j = i
        while j < n and pooled[j] == pooled[i]:
            j += 1
        for t in range(i, j):
            rank[pooled[i]] = (i + 1 + j) / 2.0
        i = j
    h = 12.0 / (n * (n + 1)) * sum(
        (sum(rank[x] for x in g)) ** 2 / len(g) for g in groups
    ) - 3.0 * (n + 1)
    from collections import Counter

    ties = sum(t ** 3 - t for t in Counter(pooled).values())
    return h, h / (1.0 - ties / (n ** 3 - n))


def test_kruskal_wallis_closed_form_two_groups():
    # [1,2] vs [3,4]: ranks 1,2 | 3,4 -> H = 12/20*(9/2+49/2)-15 = 2.4
    h, hc = _kw([[1, 2], [3, 4]])
    assert abs(h - 2.4) < 1e-12
    assert abs(hc - 2.4) < 1e-12  # no ties


def test_kruskal_wallis_identical_groups_zero():
    # All values tied: every midrank is (n+1)/2, so the between-group
    # spread (and H) is exactly 0. The tie CORRECTION is undefined here
    # (divisor 1 - ties/(n^3-n) = 0), so only raw H is asserted.
    pooled = [[5, 5, 5], [5, 5, 5]]
    n = 6
    rank = (n + 1) / 2.0
    h = 12.0 / (n * (n + 1)) * sum((rank * len(g)) ** 2 / len(g) for g in pooled) - 3.0 * (n + 1)
    assert abs(h) < 1e-12


def test_kruskal_wallis_spark_matches_pandas(spark):
    from testlog_etl_spark.queries.stats_queries import stats_kruskal_wallis

    row = stats_kruskal_wallis(spark, SF_SMALL).collect()[0]
    pdf = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    groups = [list(g.o_totalprice) for _, g in pdf.groupby("o_orderpriority")]
    h, hc = _kw(groups)
    assert row.n == len(pdf)
    assert row.dof == len(groups) - 1
    assert abs(row.h_stat - h) < 1e-3
    assert abs(row.h_corrected - hc) < 1e-3


# ------------------------------------------------- Bollinger / RSI


def _daily_kdollars(pdf):
    d = (
        pdf.assign(day=pdf.o_orderdate.dt.date)
        .groupby("day")
        .o_totalprice.sum()
        .sort_index()
    )
    return [int(round(x / 1000.0)) for x in d], list(d.index)


def test_bollinger_spark_matches_pandas(spark):
    from testlog_etl_spark.queries.windows_queries import ts_bollinger_bands

    rows = ts_bollinger_bands(spark, SF_SMALL).collect()
    pdf = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    vs, days = _daily_kdollars(pdf)
    got = {r.day: r for r in rows}
    assert len(rows) == len(vs) - 6
    for i in range(6, len(vs)):
        w = vs[i - 6 : i + 1]
        mid = sum(w) / 7.0
        sd = math.sqrt(max(sum(x * x for x in w) / 7.0 - mid * mid, 0.0))
        r = got[days[i]]
        assert r.v == vs[i]
        assert abs(r.mid - mid) < 1e-9
        assert abs(r.upper_band - (mid + 2 * sd)) < 1e-9
        if sd == 0:
            assert r.pct_b is None
        else:
            assert abs(r.pct_b - (vs[i] - (mid - 2 * sd)) / (4 * sd)) < 1e-9


def test_rsi_monotone_series_is_100_closed_form():
    # strictly increasing integer series: every diff is a gain,
    # sum_loss = 0 -> the pinned edge returns exactly 100.
    vs = list(range(1, 20))
    diffs = [b - a for a, b in zip(vs, vs[1:])]
    for i in range(13, len(diffs)):
        sum_loss = sum(max(-d, 0) for d in diffs[i - 13 : i + 1])
        assert sum_loss == 0


def test_rsi_spark_matches_pandas(spark):
    from testlog_etl_spark.queries.windows_queries import ts_rsi_cutler

    rows = ts_rsi_cutler(spark, SF_SMALL).collect()
    pdf = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    vs, days = _daily_kdollars(pdf)
    diffs = [b - a for a, b in zip(vs, vs[1:])]  # diffs[i] belongs to day i+1
    got = {r.day: r for r in rows}
    assert len(rows) == max(0, len(vs) - 14)
    for i in range(13, len(diffs)):
        w = diffs[i - 13 : i + 1]
        sg = sum(max(d, 0) for d in w)
        sl = sum(max(-d, 0) for d in w)
        r = got[days[i + 1]]
        assert abs(r.avg_gain - sg / 14.0) < 1e-12
        assert abs(r.avg_loss - sl / 14.0) < 1e-12
        want = 100.0 if sl == 0 else 100.0 - 100.0 / (1.0 + sg / sl)
        assert abs(r.rsi - want) < 1e-9


# ------------------------------------------------ Bartlett / Grubbs


def _bartlett(groups):
    k = len(groups)
    n = sum(len(g) for g in groups)
    s2 = []
    for g in groups:
        mu = sum(g) / len(g)
        s2.append(sum((x - mu) ** 2 for x in g) / (len(g) - 1))
    sp2 = sum((len(g) - 1) * v for g, v in zip(groups, s2)) / (n - k)
    num = (n - k) * math.log(sp2) - sum(
        (len(g) - 1) * math.log(v) for g, v in zip(groups, s2)
    )
    c = 1.0 + (sum(1.0 / (len(g) - 1) for g in groups) - 1.0 / (n - k)) / (3.0 * (k - 1))
    return sp2, num / c


def test_bartlett_equal_variances_near_zero():
    # identical groups -> every s_i^2 == s_p^2 -> statistic exactly 0
    g = [1.0, 2.0, 3.0, 4.0]
    sp2, b = _bartlett([g, g, g])
    assert abs(b) < 1e-12


def test_bartlett_spark_matches_pandas(spark):
    from testlog_etl_spark.queries.stats_queries import stats_bartlett_test

    row = stats_bartlett_test(spark, SF_SMALL).collect()[0]
    pdf = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    groups = [list(g.o_totalprice) for _, g in pdf.groupby("o_orderpriority")]
    sp2, b = _bartlett(groups)
    assert row.k == len(groups)
    assert abs(row.pooled_var - sp2) < max(1e-3, sp2 * 1e-9)
    assert abs(row.bartlett_stat - b) < 1e-3


def test_grubbs_spark_matches_pandas(spark):
    from testlog_etl_spark.queries.stats_queries import stats_grubbs_outlier

    got = {r.o_orderpriority: r for r in stats_grubbs_outlier(spark, SF_SMALL).collect()}
    pdf = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    for gname, grp in pdf.groupby("o_orderpriority"):
        xs = list(grp.o_totalprice)
        mu = sum(xs) / len(xs)
        sd = math.sqrt(sum((x - mu) ** 2 for x in xs) / (len(xs) - 1))
        g = max(abs(x - mu) / sd for x in xs)
        suspect = max(x for x in xs if abs(abs(x - mu) / sd - g) < 1e-12)
        r = got[gname]
        assert abs(r.g_stat - g) < 1e-3
        assert r.suspect_value == suspect
        assert r.n == len(xs)


# -------------------------------------------- Fleiss kappa / gains


def _fleiss(ratings_by_subject):
    """ratings_by_subject: list of lists of category labels (equal len n)."""
    n = len(ratings_by_subject[0])
    N = len(ratings_by_subject)
    from collections import Counter

    cats = sorted({c for r in ratings_by_subject for c in r})
    pbar = 0.0
    cj = Counter()
    for r in ratings_by_subject:
        cnt = Counter(r)
        cj.update(cnt)
        pbar += (sum(v * v for v in cnt.values()) - n) / (n * (n - 1))
    pbar /= N
    pe = sum((cj[c] / (n * N)) ** 2 for c in cats)
    return pbar, pe, (pbar - pe) / (1 - pe)


def test_fleiss_perfect_agreement_is_one():
    _, _, k = _fleiss([["a", "a", "a"], ["b", "b", "b"], ["a", "a", "a"]])
    assert abs(k - 1.0) < 1e-12


def test_fleiss_kappa_spark_matches_formula(spark):
    from testlog_etl_spark.queries.llm_ops import eval_fleiss_kappa
    from testlog_etl_spark.operators import textstats
    from pyspark.sql import functions as F
    from testlog_etl_spark.tables import load_tables

    row = eval_fleiss_kappa(spark, SF_SMALL).collect()[0]
    docs = load_tables(spark, SF_SMALL, ("documents",))["documents"]
    trip = docs.select(
        F.col("lang").alias("a"),
        textstats.lang_id(F.col("text")).alias("b"),
        F.when(textstats.stopword_ratio(F.col("text"), "en") >= 0.03, F.lit("en"))
        .otherwise(F.lit("und"))
        .alias("c"),
    ).collect()
    pbar, pe, kappa = _fleiss([[t.a, t.b, t.c] for t in trip])
    assert row.n_docs == len(trip) and row.n_raters == 3
    assert abs(row.p_observed - pbar) < 1e-3
    assert abs(row.p_expected - pe) < 1e-3
    assert abs(row.fleiss_kappa - kappa) < 1e-3


def test_gains_table_spark_matches_pandas(spark):
    from testlog_etl_spark.queries.llm_ops import eval_lift_gains_table

    rows = eval_lift_gains_table(spark, SF_SMALL).collect()
    pdf = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    pdf = pdf.sort_values(["n_chars", "doc_id"], ascending=[False, True]).reset_index(drop=True)
    n = len(pdf)
    pdf["y"] = (pdf.lang == "en").astype(int)
    pdf["i"] = range(1, n + 1)
    pdf["decile"] = (pdf.i - 1) * 10 // n + 1
    tp, tn = int(pdf.y.sum()), n
    assert [r.decile for r in rows] == list(range(1, 11))
    cum_n = cum_pos = 0
    for r in rows:
        grp = pdf[pdf.decile == r.decile]
        cum_n += len(grp)
        cum_pos += int(grp.y.sum())
        assert r.n == len(grp) and r.pos == int(grp.y.sum())
        assert r.cum_n == cum_n and r.cum_pos == cum_pos
        assert abs(r.cum_gain - cum_pos / tp) < 1e-12
        assert abs(r.cum_lift - (cum_pos / cum_n) / (tp / tn)) < 1e-12
    # gains table invariants: monotone gain, final gain == 1, final lift == 1
    assert rows[-1].cum_gain == 1.0 and abs(rows[-1].cum_lift - 1.0) < 1e-12


# ---------------------------------------------- link-pred / rich club


def _toy_graph():
    # path 1-2-3 plus edge 3-4: N(1)={2}, N(2)={1,3}, N(3)={2,4}, N(4)={3}
    edges = {(1, 2), (2, 3), (3, 4)}
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return edges, adj


def test_linkpred_closed_form_path_graph():
    edges, adj = _toy_graph()
    # non-adjacent pairs with a common neighbor: (1,3) via 2, (2,4) via 3
    for u, v, w in [(1, 3, 2), (2, 4, 3)]:
        cn = adj[u] & adj[v]
        assert cn == {w}
        jac = len(cn) / (len(adj[u]) + len(adj[v]) - len(cn))
        aa = sum(1.0 / math.log(len(adj[x])) for x in cn)
        assert abs(jac - 1 / 2) < 1e-12
        assert abs(aa - 1.0 / math.log(2)) < 1e-12


def test_linkpred_spark_scores_consistent(spark):
    from testlog_etl_spark.queries.etl_queries import graph_linkpred_scores

    rows = graph_linkpred_scores(spark, SF_SMALL).collect()
    assert rows, "doc graph yields candidate pairs"
    for r in rows[:200]:
        assert r.u < r.v
        assert r.cn >= 1
        assert 0 < r.jaccard <= 1
        # AA of cn neighbors each with deg >= 2: between cn/ln(max_deg) and cn/ln(2)
        assert r.adamic_adar > 0


def test_rich_club_monotone_node_counts(spark):
    from testlog_etl_spark.queries.etl_queries import graph_rich_club

    rows = graph_rich_club(spark, SF_SMALL).collect()
    assert rows and rows[0].k == 0
    # N_k strictly ordered by threshold; phi within [0, 1]
    for a, b in zip(rows, rows[1:]):
        assert b.n_nodes <= a.n_nodes
        assert b.n_edges <= a.n_edges
    for r in rows:
        assert 0.0 <= r.phi <= 1.0
        # density identity re-check
        assert abs(r.phi - 2.0 * r.n_edges / (r.n_nodes * (r.n_nodes - 1))) < 1e-15


# ----------------------------------- price index / capture-recapture


def test_fisher_index_closed_form():
    # one part, p0=2 q0=10, p1=3 q1=5: L = 3*10/(2*10)=1.5,
    # P = 3*5/(2*5)=1.5, Fisher = 1.5
    p0, q0, p1, q1 = 2.0, 10.0, 3.0, 5.0
    L = (p1 * q0) / (p0 * q0)
    P = (p1 * q1) / (p0 * q1)
    assert abs(L - 1.5) < 1e-12 and abs(P - 1.5) < 1e-12
    assert abs(math.sqrt(L * P) - 1.5) < 1e-12


def test_price_index_spark_matches_pandas(spark):
    from testlog_etl_spark.queries.aggs import orders_price_index_fisher

    rows = orders_price_index_fisher(spark, SF_SMALL).collect()
    li = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet")
    li["yr"] = li.l_shipdate.dt.year
    py = li.groupby(["l_partkey", "yr"]).agg(
        ext=("l_extendedprice", "sum"), qty=("l_quantity", "sum")
    )
    py["p"] = py.ext / py.qty
    got = {(r.year0, r.year1): r for r in rows}
    for (y0, y1), r in got.items():
        a = py.xs(y0, level="yr")
        b = py.xs(y1, level="yr")
        common = a.index.intersection(b.index)
        assert r.n_parts == len(common)
        L = (b.p[common] * a.qty[common]).sum() / (a.p[common] * a.qty[common]).sum()
        P = (b.p[common] * b.qty[common]).sum() / (a.p[common] * b.qty[common]).sum()
        assert abs(r.laspeyres - L) < 1e-3
        assert abs(r.paasche - P) < 1e-3
        assert abs(r.fisher - math.sqrt(L * P)) < 1e-3
    # index continuity: every consecutive-year pair in the data appears
    yrs = sorted(py.index.get_level_values("yr").unique())
    expect_pairs = {
        (y, y + 1)
        for y in yrs
        if (y + 1) in yrs
        and len(py.xs(y, level="yr").index.intersection(py.xs(y + 1, level="yr").index)) > 0
    }
    assert set(got) == expect_pairs


def test_capture_recapture_closed_form_and_spark(spark):
    # textbook: n1=100 marked, n2=60 second sample, m=15 recaptured
    # Chapman: 101*61/16 - 1 = 384.0625
    n1, n2, m = 100, 60, 15
    assert abs((n1 + 1) * (n2 + 1) / (m + 1) - 1 - 384.0625) < 1e-12

    from testlog_etl_spark.queries.aggs import stats_capture_recapture

    r = stats_capture_recapture(spark, SF_SMALL).collect()[0]
    pdf = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    h1 = set(pdf[(pdf.o_orderdate >= "1995-01-01") & (pdf.o_orderdate < "1995-07-01")].o_custkey)
    h2 = set(pdf[(pdf.o_orderdate >= "1995-07-01") & (pdf.o_orderdate < "1996-01-01")].o_custkey)
    assert r.n1 == len(h1) and r.n2 == len(h2) and r.m == len(h1 & h2)
    want = (r.n1 + 1) * (r.n2 + 1) / (r.m + 1) - 1
    assert abs(r.n_hat - want) < 1e-9
    # the estimator is bounded below by the union size minus 1 only when
    # overlap is high; at minimum it must be >= max(n1, n2)
    assert r.n_hat >= max(r.n1, r.n2) - 1


# ------------------------------------------ LLR collocations / GT


def _llr(k11, c1, c2, n):
    k12, k21, k22 = c1 - k11, c2 - k11, n - c1 - c2 + k11
    tot = 0.0
    for k, row, col in [
        (k11, c1, c2),
        (k12, c1, n - c2),
        (k21, n - c1, c2),
        (k22, n - c1, n - c2),
    ]:
        if k > 0:
            tot += k * math.log(k * n / (row * col))
    return 2.0 * tot


def test_llr_independence_is_zero():
    # perfectly independent table: k11 = c1*c2/n exactly -> LLR == 0
    assert abs(_llr(10, 100, 100, 1000)) < 1e-12


def test_llr_strong_association_positive():
    assert _llr(50, 60, 55, 10000) > 100


def test_collocation_llr_spark_matches_formula(spark):
    from testlog_etl_spark.queries.llm_ops import text_collocation_llr

    rows = text_collocation_llr(spark, SF_SMALL).collect()
    for r in rows[:100]:
        # recompute from the row's own margins
        n_est = None  # n not emitted; verify monotonic consistency instead
        assert r.k11 >= 10 and r.c1 >= r.k11 and r.c2 >= r.k11
    # ordering is by integer count desc then words
    ks = [r.k11 for r in rows]
    assert ks == sorted(ks, reverse=True)


def test_good_turing_spark_matches_pandas(spark):
    from testlog_etl_spark.queries.llm_ops import text_good_turing_mass
    from collections import Counter

    rows = text_good_turing_mass(spark, SF_SMALL).collect()
    pdf = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    for src, grp in pdf.groupby("source"):
        tf = Counter()
        for t in grp.text:
            if t is None:
                continue
            tf.update(w for w in t.strip().split() if w)
        fof = Counter(tf.values())
        n_tokens = sum(r * n for r, n in fof.items())
        got = {r.r: r for r in rows if r.source == src}
        for r in sorted(fof):
            if r > 5:
                continue
            row = got[r]
            assert row.n_r == fof[r]
            nxt = fof.get(r + 1)
            if nxt is None:
                assert row.r_star is None
            else:
                assert abs(row.r_star - (r + 1) * nxt / fof[r]) < 1e-12
            if 1 in fof:
                assert abs(row.p0_unseen - fof[1] / n_tokens) < 1e-12
            else:
                assert row.p0_unseen is None


# -------------------------------------------- log-rank / James-Stein


def _logrank(subjects):
    """subjects: list of (grp 1|2, t, event 0|1). Returns (o1, e1, v)."""
    times = sorted({t for _, t, _ in subjects})
    o1 = e1 = v = 0.0
    for t in times:
        n1 = sum(1 for g, tt, _ in subjects if g == 1 and tt >= t)
        n2 = sum(1 for g, tt, _ in subjects if g == 2 and tt >= t)
        d1 = sum(1 for g, tt, ev in subjects if g == 1 and tt == t and ev)
        d2 = sum(1 for g, tt, ev in subjects if g == 2 and tt == t and ev)
        n, d = n1 + n2, d1 + d2
        if d == 0 or n <= 1:
            continue
        o1 += d1
        e1 += n1 * d / n
        v += n1 * n2 * d * (n - d) / (n * n * (n - 1))
    return o1, e1, v


def test_logrank_identical_groups_zero():
    # mirror-image groups: every event time contributes E1 = d/2 and
    # O1 accumulates exactly half the events -> chi2 numerator 0
    subj = [(1, 5, 1), (2, 5, 1), (1, 9, 1), (2, 9, 1), (1, 12, 0), (2, 12, 0)]
    o1, e1, v = _logrank(subj)
    assert abs(o1 - e1) < 1e-12


def test_logrank_spark_matches_formula(spark):
    from testlog_etl_spark.queries.stats_queries import stats_logrank_test

    row = stats_logrank_test(spark, SF_SMALL).collect()[0]
    orders = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    cust = pd.read_parquet(f"{SF_SMALL}/customer.parquet")
    seg = dict(zip(cust.c_custkey, cust.c_mktsegment))
    orders["day"] = orders.o_orderdate.dt.date
    last_day = orders.day.max()
    subs = []
    for ck, grp in orders.groupby("o_custkey"):
        ds = sorted(set(grp.day))
        g = 1 if seg[ck] == "BUILDING" else 2
        if len(ds) >= 2:
            subs.append((g, (ds[1] - ds[0]).days, 1))
        else:
            subs.append((g, (last_day - ds[0]).days, 0))
    o1, e1, v = _logrank(subs)
    assert row.o1 == o1
    assert abs(row.e1 - e1) < 1e-3
    assert abs(row.v - v) < 1e-3
    assert abs(row.chi2 - (o1 - e1) ** 2 / v) < 1e-2


def test_james_stein_shrinks_toward_grand_mean(spark):
    from testlog_etl_spark.queries.stats_queries import stats_james_stein_means

    rows = stats_james_stein_means(spark, SF_SMALL).collect()
    cust = pd.read_parquet(f"{SF_SMALL}/customer.parquet")
    g = cust.groupby("c_nationkey").c_acctbal.agg(["mean", "count"])
    mbar = g["mean"].mean()
    w = rows[0].shrink_weight
    assert 0.0 <= w <= 1.0
    for r in rows:
        raw = g.loc[r.c_nationkey, "mean"]
        assert abs(r.raw_mean - raw) < 1e-3
        # shrunk value lies between raw mean and the grand mean of means
        lo, hi = sorted([raw, mbar])
        assert lo - 1e-3 <= r.shrunk_mean <= hi + 1e-3
        # identical shrink weight for every group (equal-variance JS)
        assert abs(r.shrink_weight - w) < 1e-12


# ---------------------------------------------- XmR / dispersion


def test_xmr_limits_formula(spark):
    from testlog_etl_spark.queries.profile_queries import dq_xmr_control_chart

    rows = dq_xmr_control_chart(spark, SF_SMALL).collect()
    pdf = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    vs, days = _daily_kdollars(pdf)
    mrs = [abs(b - a) for a, b in zip(vs, vs[1:])]
    center = sum(vs) / len(vs)
    mrbar = sum(mrs) / len(mrs)
    ucl, lcl = center + 2.66 * mrbar, center - 2.66 * mrbar
    want = {
        days[i]
        for i in range(len(vs))
        if vs[i] > ucl or vs[i] < lcl or (i > 0 and mrs[i - 1] > 3.267 * mrbar)
    }
    assert {r.day for r in rows} == want
    for r in rows:
        assert abs(r.ucl - ucl) < 1e-9 and abs(r.lcl - lcl) < 1e-9
        assert r.out_of_control == (r.v > ucl or r.v < lcl)


def test_poisson_dispersion_matches_pandas(spark):
    from testlog_etl_spark.queries.profile_queries import stats_poisson_dispersion

    rows = {r.event_type: r for r in stats_poisson_dispersion(spark, SF_SMALL).collect()}
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    ev["day"] = ev.ts.dt.date
    for et, grp in ev.groupby("event_type"):
        c = grp.groupby("day").size()
        r = rows[et]
        assert r.n_days == len(c)
        assert abs(r.mean_daily - c.mean()) < 1e-3
        assert abs(r.var_daily - c.var(ddof=1)) < 1e-3
        assert abs(r.dispersion_index - c.var(ddof=1) / c.mean()) < 1e-3
        assert abs(r.chi2 - (len(c) - 1) * c.var(ddof=1) / c.mean()) < 2e-3


# ------------------------------------- kmeans step / spectral entropy


def test_kmeans_step_spark_matches_numpy(spark):
    import numpy as np
    from testlog_etl_spark.queries.llm_ops import embed_kmeans_one_step

    rows = embed_kmeans_one_step(spark, SF_SMALL).collect()
    emb = pd.read_parquet(f"{SF_SMALL}/embeddings.parquet").sort_values("vec_id")
    X = np.stack(emb.embedding.values).astype(np.float64)
    ids = emb.vec_id.values
    C = X[ids < 8]
    d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    assign = d2.argmin(axis=1)  # ties: argmin picks lowest cid, same as (d2, cid)
    got = {}
    for r in rows:
        got.setdefault(r.cid, {})[r.dim] = r
    for cid in sorted(set(assign)):
        mask = assign == cid
        mean = X[mask].mean(axis=0)
        for dim in range(64):
            row = got[cid][dim]
            assert row.n_assigned == int(mask.sum())
            assert abs(row.new_val - mean[dim]) < 1e-5
    # every cluster non-empty covers all 8 seeds (seed is its own nearest)
    assert set(got) == set(range(8))


def test_spectral_entropy_bounds_and_dominant(spark):
    from testlog_etl_spark.queries.windows_queries import ts_spectral_entropy
    import numpy as np

    r = ts_spectral_entropy(spark, SF_SMALL).collect()[0]
    assert 2 <= r.dominant_period <= 14
    assert 0.0 <= r.normalized_entropy <= 1.0 + 1e-9
    assert abs(r.normalized_entropy - r.spectral_entropy / math.log(13)) < 1e-3
    # recompute from pandas
    pdf = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    rev = pdf.assign(day=pdf.o_orderdate.dt.date).groupby("day").o_totalprice.sum().sort_index()
    x = rev.values - rev.values.mean()
    t = np.arange(len(x))
    pows = {}
    for p in range(2, 15):
        c = round((x * np.cos(2 * np.pi * t / p)).sum(), 3)
        s = round((x * np.sin(2 * np.pi * t / p)).sum(), 3)
        pows[p] = c * c + s * s
    tot = sum(pows.values())
    ent = -sum((v / tot) * math.log(v / tot) for v in pows.values() if v > 0)
    assert abs(r.spectral_entropy - ent) < 1e-3
    assert r.dominant_period == min(sorted(pows, key=lambda p: (-pows[p], p))[:1])


# ---------------------------------------------- pivot / cronbach


def test_sql_pivot_matches_conditional_agg(spark):
    from testlog_etl_spark.queries.sources_queries import sql_pivot_clause

    rows = sql_pivot_clause(spark, SF_SMALL).collect()
    pdf = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    pdf["yr"] = pdf.o_orderdate.dt.year
    for r in rows:
        g = pdf[pdf.yr == r.yr]
        for prio, ncol, rcol in [
            ("1-URGENT", "n_urgent", "rev_urgent"),
            ("2-HIGH", "n_high", "rev_high"),
            ("3-MEDIUM", "n_medium", "rev_medium"),
        ]:
            sel = g[g.o_orderpriority == prio]
            assert getattr(r, ncol) == len(sel)
            assert abs(getattr(r, rcol) - sel.o_totalprice.sum()) < 1e-2
    assert {r.yr for r in rows} == set(pdf.yr.unique())


def _cronbach(matrix):
    """matrix: list of per-case lists (cases x items)."""
    import statistics

    k = len(matrix[0])
    items = list(zip(*matrix))
    iv = sum(statistics.variance(col) for col in items)
    tv = statistics.variance([sum(row) for row in matrix])
    return k / (k - 1) * (1 - iv / tv)


def test_cronbach_parallel_items_high_alpha():
    # perfectly correlated items -> alpha == 1 exactly for k=2 identical cols
    m = [[1, 1], [2, 2], [3, 3], [4, 4]]
    assert abs(_cronbach(m) - 1.0) < 1e-12


def test_cronbach_spark_matches_formula(spark):
    from testlog_etl_spark.queries.stats_queries import stats_cronbach_alpha

    r = stats_cronbach_alpha(spark, SF_SMALL).collect()[0]
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    mat = ev.pivot_table(
        index="user_id", columns="event_type", values="event_id", aggfunc="count", fill_value=0
    )
    assert r.n_users == len(mat) and r.k_items == mat.shape[1]
    alpha = _cronbach(mat.values.tolist())
    assert abs(r.alpha - alpha) < 1e-4


# ------------------------------------- Brier / phonetic blocking


def test_brier_decomposition_identity(spark):
    from testlog_etl_spark.queries.llm_ops import eval_brier_decomposition

    r = eval_brier_decomposition(spark, SF_SMALL).collect()[0]
    # Murphy: brier = rel - res + unc + within-bin score variance term;
    # the residual is the mean within-bin variance of s, always >= 0
    residual = r.brier - (r.reliability - r.resolution + r.uncertainty)
    assert residual >= -1e-6
    assert 0 <= r.brier <= 1 and 0 <= r.uncertainty <= 0.25
    assert r.reliability >= 0 and r.resolution >= 0


def test_phonetic_key_blocks_and_verifies(spark):
    from testlog_etl_spark.queries.llm_ops import dedup_phonetic_blocking

    rows = dedup_phonetic_blocking(spark, SF_SMALL).collect()
    pdf = pd.read_parquet(f"{SF_SMALL}/part.parquet")
    import re

    def key(name):
        n = name.strip().lower()
        return n[:1] + re.sub(r"[aeiouy ]", "", n[1:])

    names = dict(zip(pdf.p_partkey, pdf.p_name))
    keys = {pk: key(nm) for pk, nm in names.items()}
    for r in rows:
        assert r.part1 < r.part2
        assert keys[r.part1] == keys[r.part2] == r.pkey
        assert r.lev <= 4
    # completeness: recompute expected pair set within blocks
    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    from collections import defaultdict

    blocks = defaultdict(list)
    for pk, kk in keys.items():
        blocks[kk].append(pk)
    want = set()
    for kk, pks in blocks.items():
        pks.sort()
        for i in range(len(pks)):
            for j in range(i + 1, len(pks)):
                if lev(names[pks[i]], names[pks[j]]) <= 4:
                    want.add((pks[i], pks[j]))
    assert {(r.part1, r.part2) for r in rows} == want


# ---------------------------------------- Croston / sample entropy


def test_croston_spark_matches_formula(spark):
    from testlog_etl_spark.queries.windows_queries import ts_croston_intermittent

    r = ts_croston_intermittent(spark, SF_SMALL).collect()[0]
    li = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet")
    part = pd.read_parquet(f"{SF_SMALL}/part.parquet")
    keys = set(part[part.p_brand == "Brand#13"].p_partkey)
    sel = li[(li.l_partkey.isin(keys)) & (li.l_returnflag == "R")]
    d = sel.assign(day=sel.l_shipdate.dt.date).groupby("day").l_quantity.sum()
    d = d.round().astype(int).sort_index()
    days = list(d.index)
    occ = [(days[k], int(d.iloc[k]), (days[k] - days[k - 1]).days) for k in range(1, len(days))]
    tail = occ[-16:] if len(occ) > 16 else occ
    wts = [2.0 ** -(len(tail) - 1 - j) for j in range(len(tail))]
    z = sum(q * w for (_, q, _), w in zip(tail, wts)) / sum(wts)
    p = sum(g * w for (_, _, g), w in zip(tail, wts)) / sum(wts)
    assert r.n_occ == len(tail)
    assert abs(r.size_est - z) < 1e-3
    assert abs(r.interval_est - p) < 1e-3
    assert abs(r.demand_rate - z / p) < 1e-3


def test_sample_entropy_spark_matches_numpy(spark):
    import numpy as np
    from testlog_etl_spark.queries.windows_queries import ts_sample_entropy

    r = ts_sample_entropy(spark, SF_SMALL).collect()[0]
    pdf = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    vs, _ = _daily_kdollars(pdf)
    v = np.array(vs)
    thr = int(round(0.2 * (v.max() - v.min()) / 4.0))
    T = np.stack([v[:-2], v[1:-1], v[2:]], axis=1)
    n = len(T)
    b = a = 0
    for i in range(n):
        d = np.abs(T[i + 1 :] - T[i]).max(axis=1) if False else None
        diff = np.abs(T[i + 1 :] - T[i])
        m2 = (diff[:, 0] <= thr) & (diff[:, 1] <= thr)
        b += int(m2.sum())
        a += int((m2 & (diff[:, 2] <= thr)).sum())
    assert r.threshold == thr
    assert (r.a, r.b) == (a, b)
    assert abs(r.sampen - (-math.log(a / b))) < 1e-3
    assert r.sampen >= 0


# ------------------------------------- scene cuts / Theil U2


def test_scene_cuts_spark_matches_python(spark):
    from testlog_etl_spark.queries.llm_ops import multimodal_scene_cuts

    rows = multimodal_scene_cuts(spark, SF_SMALL).collect()
    pdf = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    pdf = pdf[(pdf.n_chars > 0) & pdf.text.notna()].sort_values("doc_id").head(500)
    got = {r.media_id: r for r in rows}
    for _, doc in pdf.iterrows():
        payload = doc.text.encode("utf-8")
        dur = doc.n_chars * 10
        n_frames = (dur - 1) // 250 + 1
        prev, n_cuts, first = None, 0, None
        for i in range(n_frames):
            s = payload[(i * 97) % len(payload)]
            if prev is not None and abs(s - prev) > 32:
                n_cuts += 1
                if first is None:
                    first = i
            prev = s
        r = got[doc.doc_id]
        assert (r.n_frames, r.n_cuts, r.first_cut_idx) == (n_frames, n_cuts, first)


def test_theil_u2_spark_matches_pandas(spark):
    from testlog_etl_spark.queries.windows_queries import stats_theil_u2_forecast

    r = stats_theil_u2_forecast(spark, SF_SMALL).collect()[0]
    pdf = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    vs, _ = _daily_kdollars(pdf)
    fe, ne = [], []
    for t in range(7, len(vs)):
        if vs[t - 1] == 0:
            continue
        fe.append((vs[t - 7] - vs[t]) / vs[t - 1])
        ne.append((vs[t] - vs[t - 1]) / vs[t - 1])
    sf, sn = sum(x * x for x in fe), sum(x * x for x in ne)
    assert r.n == len(fe)
    assert abs(r.theil_u2 - math.sqrt(sf / sn)) < 1e-3
    assert abs(r.rmse_rel_forecast - math.sqrt(sf / len(fe))) < 1e-3


# ------------------------------------- Page-Hinkley / Katz


def test_page_hinkley_spark_matches_python(spark):
    from testlog_etl_spark.queries.windows_queries import stats_page_hinkley

    r = stats_page_hinkley(spark, SF_SMALL).collect()[0]
    pdf = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    vs, days = _daily_kdollars(pdf)
    mu = sum(vs) / len(vs)
    sigma = math.sqrt(sum((v - mu) ** 2 for v in vs) / len(vs))
    ut = mn = 0.0
    max_exc, n_alarms, first = 0.0, 0, None
    run = 0.0
    mins = float("inf")
    for day, v in zip(days, vs):
        run += v - mu
        mins = min(mins, run)
        exc = run - mins
        max_exc = max(max_exc, exc)
        if exc > 3 * sigma:
            n_alarms += 1
            if first is None:
                first = day
    assert r.n_days == len(vs)
    assert abs(r.max_excursion - max_exc) < 1e-3
    assert abs(r.lambda_threshold - 3 * sigma) < 1e-3
    assert r.n_alarms == n_alarms and r.first_alarm_day == first


def test_katz_closed_form_path3():
    # path graph 1-2-3, alpha=1/8: walks from ends vs middle
    # w1 = degrees [1,2,1]; w2 = A*w1 = [2,2,2]; w3 = A*w2 = [2,4,2];
    # w4 = [4,4,4]
    import numpy as np

    A = np.array([[0, 1, 0], [1, 0, 1], [0, 1, 0]])
    one = np.ones(3)
    w, acc = one, np.zeros(3)
    for k in range(1, 5):
        w = A @ w
        acc = acc + (0.125 ** k) * w
    assert abs(acc[1] - (2 * 0.125 + 2 * 0.125 ** 2 + 4 * 0.125 ** 3 + 4 * 0.125 ** 4)) < 1e-15


def test_katz_spark_matches_numpy(spark):
    import numpy as np
    from testlog_etl_spark.queries.etl_queries import graph_katz_bounded

    rows = graph_katz_bounded(spark, SF_SMALL).collect()
    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    ids = sorted(docs.doc_id)
    mx = max(ids)
    # build edge set exactly as the query does
    edges = set()
    for n in ids:
        if n >= 1 and 2 * n <= mx:
            edges.add((n, 2 * n))
        if n >= 1 and 2 * n + 1 <= mx:
            edges.add((n, 2 * n + 1))
        if n + 37 <= mx:
            edges.add((n, n + 37))
    und = set()
    for a, b in edges:
        und.add((a, b))
        und.add((b, a))
    nbrs = {}
    for a, b in und:
        nbrs.setdefault(a, []).append(b)
    nodes = sorted(nbrs)
    w = {n: 1 for n in nodes}
    acc = {n: 0.0 for n in nodes}
    for k in range(1, 5):
        nw = {n: 0 for n in nodes}
        for a in nodes:
            for b in nbrs[a]:
                nw[b] += w[a]
        w = nw
        for n in nodes:
            acc[n] += (0.125 ** k) * w[n]
    got = {r.node: r.katz for r in rows}
    assert set(got) == set(nodes)
    for n in nodes:
        assert abs(got[n] - acc[n]) < 1e-9


# ------------------------------------- MRR / reconciliation


def test_mrr_spark_matches_numpy(spark):
    import numpy as np
    from testlog_etl_spark.queries.llm_ops import eval_mrr_retrieval

    r = eval_mrr_retrieval(spark, SF_SMALL).collect()[0]
    emb = pd.read_parquet(f"{SF_SMALL}/embeddings.parquet").sort_values("vec_id")
    X = np.stack(emb.embedding.values).astype(np.float64)
    ids = emb.vec_id.values
    labels = emb.label.values
    norms = np.linalg.norm(X, axis=1)
    rrs, h1, h5 = [], 0, 0
    for qi in np.where(ids < 20)[0]:
        cos = (X @ X[qi]) / (norms * norms[qi])
        order = sorted(
            [(float(-cos[ci]), int(ids[ci])) for ci in range(len(ids)) if ci != qi]
        )
        first = None
        lab = {int(i): int(l) for i, l in zip(ids, labels)}
        for rank, (_, cid) in enumerate(order, 1):
            if lab[cid] == labels[qi]:
                first = rank
                break
        rrs.append(1.0 / first)
        h1 += first == 1
        h5 += first <= 5
    assert r.n_queries == len(rrs)
    assert abs(r.mrr - sum(rrs) / len(rrs)) < 1e-4
    assert (r.hit_at_1, r.hit_at_5) == (h1, h5)


def test_reconciliation_buckets_partition_orders(spark):
    from testlog_etl_spark.queries.profile_queries import dq_order_detail_reconciliation

    rows = dq_order_detail_reconciliation(spark, SF_SMALL).collect()
    pdf = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    assert sum(r.n_orders for r in rows) == len(pdf)
    by = {r.bucket: r for r in rows}
    li = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet")
    det = li.groupby("l_orderkey").l_extendedprice.sum()
    no_detail = (~pdf.o_orderkey.isin(det.index)).sum()
    if no_detail:
        assert by["no_detail"].n_orders == no_detail
        assert by["no_detail"].avg_rel is None
    # bucket min/max ranges nest correctly
    for name, lo, hi in [
        ("within_0.1pct", 1e-9, 0.001),
        ("within_1pct", 0.001, 0.01),
        ("within_10pct", 0.01, 0.1),
    ]:
        if name in by:
            assert lo <= by[name].min_rel + 1e-9 and by[name].max_rel <= hi + 1e-9


# ------------------------------------- Cochran Q / GMD


def test_cochran_q_spark_matches_formula(spark):
    from testlog_etl_spark.queries.stats_queries import stats_cochran_q

    r = stats_cochran_q(spark, SF_SMALL).collect()[0]
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    cell = ev.groupby(["user_id", "event_type"]).size()
    inc = cell[cell >= 10]
    k = ev.event_type.nunique()
    C = inc.groupby("event_type").size()
    R = inc.groupby("user_id").size()
    T = len(inc)
    q = k * (k - 1) * ((C * C).sum() - T * T / k) / (k * T - (R * R).sum())
    assert r.k_items == k and r.grand_total == T
    assert abs(r.q_stat - q) < 1e-3
    assert r.dof == k - 1


def test_gmd_matches_pairwise_definition(spark):
    from testlog_etl_spark.queries.stats_queries import stats_gini_mean_difference

    r = stats_gini_mean_difference(spark, SF_SMALL).collect()[0]
    pdf = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    # Spark ROUND is HALF_UP (python round() is half-even)
    xs = sorted(int(math.floor(x + 0.5)) for x in pdf.o_totalprice)
    n = len(xs)
    # rank formula == mean pairwise |xi - xj| (checked on a prefix for cost)
    import itertools

    sub = xs[:200]
    gmd_pair = sum(abs(a - b) for a, b in itertools.combinations(sub, 2)) / (
        len(sub) * (len(sub) - 1) / 2
    )
    gmd_rank = sum((2 * (i + 1) - len(sub) - 1) * x for i, x in enumerate(sorted(sub))) * 2 / (
        len(sub) * (len(sub) - 1)
    )
    assert abs(gmd_pair - gmd_rank) < 1e-9
    # full-sample rank formula vs spark
    w = sum((2 * (i + 1) - n - 1) * x for i, x in enumerate(xs))
    gmd = 2 * w / (n * (n - 1))
    assert r.n == n
    assert abs(r.gmd - gmd) < 1e-6
    assert abs(r.gini_coefficient - gmd / (2 * sum(xs) / n)) < 1e-9
    assert 0 <= r.gini_coefficient <= 1


# ----------------------------- seasonal MK / systematic sampling


def test_seasonal_mk_strata_cancel_weekly_cycle():
    # a pure weekly cycle (same value every same weekday) gives S = 0
    # in every stratum: all within-stratum pairs are ties
    week = [5, 1, 2, 3, 4, 6, 7]
    series = week * 8
    for dow in range(7):
        vals = series[dow::7]
        s = sum(
            (vals[j] > vals[i]) - (vals[j] < vals[i])
            for i in range(len(vals))
            for j in range(i + 1, len(vals))
        )
        assert s == 0


def test_seasonal_mk_spark_matches_python(spark):
    from testlog_etl_spark.queries.stats_queries import stats_seasonal_mann_kendall
    from collections import Counter

    r = stats_seasonal_mann_kendall(spark, SF_SMALL).collect()[0]
    pdf = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    h1 = pdf[(pdf.o_orderdate >= "1995-01-01") & (pdf.o_orderdate < "1995-07-01")]
    vs_all = (
        h1.assign(day=h1.o_orderdate.dt.date).groupby("day").o_totalprice.sum()
    )
    days = sorted(vs_all.index)
    v = {d: int(math.floor(vs_all[d] / 1000.0 + 0.5)) for d in days}
    s_tot, var_tot = 0, 0.0
    for dow in range(7):
        ds = [d for d in days if d.weekday() == dow]
        vals = [v[d] for d in ds]
        n = len(vals)
        s_tot += sum(
            (vals[j] > vals[i]) - (vals[j] < vals[i])
            for i in range(n)
            for j in range(i + 1, n)
        )
        ties = sum(t * (t - 1) * (2 * t + 5) for t in Counter(vals).values() if t > 1)
        var_tot += (n * (n - 1) * (2 * n + 5) - ties) / 18.0
    assert r.n_days == len(days)
    assert r.s_stat == s_tot
    assert abs(r.var_s - var_tot) < 1e-3
    want_z = 0.0 if s_tot == 0 else (s_tot - (1 if s_tot > 0 else -1) * 1) / math.sqrt(var_tot)
    assert abs(r.z_stat - want_z) < 1e-3


def test_systematic_sample_spacing(spark):
    from testlog_etl_spark.queries.llm_ops import sample_systematic_interval

    rows = sample_systematic_interval(spark, SF_SMALL).collect()
    pdf = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    n = len(pdf)
    want_ranks = list(range(17, n + 1, 100))
    assert [r.i for r in rows] == want_ranks
    # the sampled keys are exactly the ranked rows at those positions
    pdf = pdf.sort_values(["o_orderdate", "o_orderkey"]).reset_index(drop=True)
    for r in rows:
        assert pdf.o_orderkey.iloc[r.i - 1] == r.o_orderkey


# ------------------------------------------- MATTR / Yule's K


def _mattr(tokens, w=50):
    if len(tokens) >= w:
        vals = [
            len(set(tokens[i : i + w])) / w for i in range(len(tokens) - w + 1)
        ]
        return sum(vals) / len(vals)
    return len(set(tokens)) / len(tokens)


def test_mattr_length_invariance_property():
    # repeating a diverse block keeps MATTR stable while TTR collapses
    block = [f"w{i}" for i in range(50)]
    once, many = block, block * 20
    assert abs(_mattr(once) - _mattr(many)) < 1e-9
    ttr_once = len(set(once)) / len(once)
    ttr_many = len(set(many)) / len(many)
    assert ttr_many < ttr_once / 10


def test_mattr_spark_matches_python(spark):
    from testlog_etl_spark.queries.llm_ops import text_mattr_window

    rows = {r.source: r for r in text_mattr_window(spark, SF_SMALL).collect()}
    pdf = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    pdf = pdf[pdf.text.notna() & (pdf.text.str.strip() != "")]
    for src, grp in pdf.groupby("source"):
        ms = [_mattr(t.strip().split()) for t in grp.text]
        r = rows[src]
        assert r.n_docs == len(ms)
        assert abs(r.avg_mattr - sum(ms) / len(ms)) < 1e-3


def test_yules_k_spark_matches_python(spark):
    from collections import Counter
    from testlog_etl_spark.queries.llm_ops import text_yules_k

    rows = {r.source: r for r in text_yules_k(spark, SF_SMALL).collect()}
    pdf = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    for src, grp in pdf.groupby("source"):
        tf = Counter()
        for t in grp.text.dropna():
            tf.update(x for x in t.strip().split() if x)
        n = sum(tf.values())
        s2 = sum(m * m for m in tf.values())
        r = rows[src]
        assert r.n_tokens == n and r.vocab == len(tf)
        assert abs(r.yules_k - 1e4 * (s2 - n) / (n * n)) < 1e-6


# --------------------------------------- fill rate / inversions


def test_fill_rate_spark_matches_pandas(spark):
    from testlog_etl_spark.queries.aggs import orders_fill_rate_service_level

    rows = {r.order_month: r for r in orders_fill_rate_service_level(spark, SF_SMALL).collect()}
    orders = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    li = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet")
    last = li.groupby("l_orderkey").l_shipdate.max().dt.date
    j = orders[orders.o_orderkey.isin(last.index)].copy()
    j["days"] = [
        (last[k] - d.date()).days for k, d in zip(j.o_orderkey, j.o_orderdate)
    ]
    j["mon"] = j.o_orderdate.dt.strftime("%Y-%m")
    for mon, grp in j.groupby("mon"):
        r = rows[mon]
        on_time = (grp.days <= 30).sum()
        assert r.n_orders == len(grp) and r.on_time == on_time
        assert abs(r.fill_rate - on_time / len(grp)) < 1e-12
        assert abs(r.avg_days_to_complete - grp.days.mean()) < 1e-9


def test_id_time_inversions_spark_matches_pandas(spark):
    from testlog_etl_spark.queries.profile_queries import dq_id_time_inversions

    r = dq_id_time_inversions(spark, SF_SMALL).collect()[0]
    pdf = pd.read_parquet(f"{SF_SMALL}/orders.parquet").sort_values("o_orderkey")
    days = list(pdf.o_orderdate.dt.date)
    pairs = list(zip(days, days[1:]))
    inv = [(d0, d1) for d0, d1 in pairs if d1 < d0]
    assert r.n_pairs == len(pairs)
    assert r.n_inversions == len(inv)
    if inv:
        assert r.worst_backward_days == max((d0 - d1).days for d0, d1 in inv)
        from collections import Counter

        months = Counter(d1.strftime("%Y-%m") for _, d1 in inv)
        top = sorted(months.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        assert r.worst_month == top


# --------------------------------------- BLEU / union-by-name


def _bleu2(cand, ref):
    from collections import Counter

    def clipped(c, r):
        cc, rc = Counter(c), Counter(r)
        return sum(min(n, rc[g]) for g, n in cc.items())

    c1 = clipped(cand, ref)
    cg = [f"{a} {b}" for a, b in zip(cand, cand[1:])]
    rg = [f"{a} {b}" for a, b in zip(ref, ref[1:])]
    c2 = clipped(cg, rg)
    p1, p2 = c1 / len(cand), c2 / (len(cand) - 1)
    bp = math.exp(1 - len(ref) / len(cand)) if len(cand) < len(ref) else 1.0
    return p1, p2, bp * math.sqrt(p1 * p2)


def test_bleu_identity_is_one():
    toks = "the cat sat on the mat".split()
    p1, p2, b = _bleu2(toks, toks)
    assert (p1, p2, b) == (1.0, 1.0, 1.0)


def test_bleu_spark_matches_python(spark):
    from testlog_etl_spark.queries.llm_ops import eval_bleu_ngram_precision

    rows = {r.source: r for r in eval_bleu_ngram_precision(spark, SF_SMALL).collect()}
    pdf = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    pdf = pdf[pdf.text.notna() & (pdf.text.str.strip() != "")].sort_values("doc_id")
    for src, grp in pdf.groupby("source"):
        toks = [t.strip().split() for t in grp.text]
        scores = [
            _bleu2(c, r)
            for c, r in zip(toks, toks[1:])
            if len(c) >= 2 and len(r) >= 2
        ]
        if not scores:
            assert src not in rows
            continue
        r = rows[src]
        assert r.n_pairs == len(scores)
        assert abs(r.avg_p1 - sum(s[0] for s in scores) / len(scores)) < 1e-4
        assert abs(r.avg_bleu2 - sum(s[2] for s in scores) / len(scores)) < 1e-4


def test_union_by_name_null_fills(spark):
    from testlog_etl_spark.queries.sources_queries import sql_union_by_name

    rows = sql_union_by_name(spark, SF_SMALL).collect()
    pdf = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    even, odd = pdf[pdf.o_orderkey % 2 == 0], pdf[pdf.o_orderkey % 2 == 1]
    # every even-key row has a priority and a <missing> channel; odd rows invert
    got_missing_channel = sum(r.n for r in rows if r.channel == "<missing>")
    got_missing_prio = sum(r.n for r in rows if r.o_orderpriority == "<missing>")
    assert got_missing_channel == len(even)
    assert got_missing_prio == len(odd)
    assert sum(r.n for r in rows) == len(pdf)


# --------------------------------- neighbor degree / weighted kappa


def test_avg_neighbor_degree_spark_matches_python(spark):
    from testlog_etl_spark.queries.etl_queries import graph_avg_neighbor_degree

    rows = {r.k: r for r in graph_avg_neighbor_degree(spark, SF_SMALL).collect()}
    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    ids, mx = sorted(docs.doc_id), max(docs.doc_id)
    und = set()
    for n in ids:
        for d in ([2 * n, 2 * n + 1] if n >= 1 else []) + [n + 37]:
            if d <= mx:
                und.add((n, d))
                und.add((d, n))
    nbrs = {}
    for a, b in und:
        nbrs.setdefault(a, []).append(b)
    deg = {n: len(v) for n, v in nbrs.items()}
    from collections import defaultdict

    acc = defaultdict(list)
    for n in nbrs:
        acc[deg[n]].append(sum(deg[b] for b in nbrs[n]) / deg[n])
    for k, vals in acc.items():
        r = rows[k]
        assert r.n_nodes == len(vals)
        assert abs(r.k_nn - sum(vals) / len(vals)) < 1e-3


def test_weighted_kappa_perfect_agreement_is_one():
    # identical ordinal raters: every off-diagonal O is 0 ->
    # weighted observed disagreement 0 -> kappa_w = 1
    o = {(i, i): 10 for i in range(5)}
    n = 50
    na = {i: 10 for i in range(5)}
    wo = sum(abs(a - b) / 4 * o.get((a, b), 0) for a in range(5) for b in range(5))
    we = sum(abs(a - b) / 4 * na[a] * na[b] / n for a in range(5) for b in range(5))
    assert wo == 0 and we > 0


def test_weighted_kappa_spark_bounds(spark):
    from testlog_etl_spark.queries.llm_ops import eval_weighted_kappa

    r = eval_weighted_kappa(spark, SF_SMALL).collect()[0]
    # kappa_w in [-1, 1]; observed/expected disagreement non-negative
    assert -1.0 - 1e-9 <= r.weighted_kappa <= 1.0 + 1e-9
    assert r.weighted_observed >= 0 and r.weighted_expected > 0
    assert abs(r.weighted_kappa - (1 - r.weighted_observed / r.weighted_expected)) < 1e-4


# ------------------------------------------- Hill / EWMA chart


def test_hill_pareto_recovers_alpha():
    # exact Pareto(alpha) quantiles: x_i = (i/n)^(-1/alpha) -> Hill ~ alpha
    alpha, n, k = 2.5, 5000, 100
    xs = sorted(((i + 1) / n) ** (-1 / alpha) for i in range(n))[::-1]
    mean_lr = sum(math.log(xs[i] / xs[k]) for i in range(k)) / k
    assert abs(1 / mean_lr - alpha) < 0.15


def test_hill_spark_matches_pandas(spark):
    from testlog_etl_spark.queries.stats_queries import stats_hill_tail_index

    r = stats_hill_tail_index(spark, SF_SMALL).collect()[0]
    pdf = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    top = pdf.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True]).head(101)
    xs = list(top.o_totalprice)
    mean_lr = sum(math.log(x / xs[100]) for x in xs[:100]) / 100
    assert r.k == 100
    assert abs(r.threshold - xs[100]) < 1e-3
    assert abs(r.hill_alpha - 1 / mean_lr) < 1e-3


def test_ewma_chart_spark_matches_python(spark):
    from testlog_etl_spark.queries.profile_queries import dq_ewma_control_chart

    rows = {r.day: r for r in dq_ewma_control_chart(spark, SF_SMALL).collect()}
    pdf = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    vs, days = _daily_kdollars(pdf)
    mu = sum(vs) / len(vs)
    sigma = math.sqrt(sum((v - mu) ** 2 for v in vs) / len(vs))
    flagged = {}
    for t in range(1, len(vs) + 1):
        lo = max(1, t - 31)
        num = sum(2.0 ** -(t - p + 1) * vs[p - 1] for p in range(lo, t + 1))
        den = sum(2.0 ** -(t - p + 1) for p in range(lo, t + 1))
        ewma = num / den
        half = 3 * sigma * math.sqrt((0.5 / 1.5) * (1 - 0.25 ** t))
        if ewma > mu + half or ewma < mu - half:
            flagged[days[t - 1]] = ewma
    assert set(rows) == set(flagged)
    for day, r in rows.items():
        assert abs(r.ewma - flagged[day]) < 1e-3


# --------------------------------- average precision / magnitude hist


def test_average_precision_spark_matches_sklearn_style(spark):
    from testlog_etl_spark.queries.llm_ops import eval_average_precision

    r = eval_average_precision(spark, SF_SMALL).collect()[0]
    # recompute AP from scratch: group by snapped score desc
    from testlog_etl_spark.tables import load_tables
    from testlog_etl_spark.operators import filtering
    from pyspark.sql import functions as F

    docs = load_tables(spark, SF_SMALL, ("documents",))["documents"].filter(
        F.col("text").isNotNull() & (F.trim("text") != "")
    )
    g = F.lit(float(1 << 20))
    score = F.floor(filtering.linear_quality_score(F.col("text")) * g + F.lit(0.5)) / g
    rows = docs.select(score.alias("s"), (F.col("lang") == "en").cast("int").alias("y")).collect()
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0])
    for row in rows:
        agg[row.s][0] += row.y
        agg[row.s][1] += 1
    p_tot = sum(v[0] for v in agg.values())
    cum_p = cum_n = 0
    ap = 0.0
    for s in sorted(agg, reverse=True):
        np_, n_ = agg[s]
        cum_p += np_
        cum_n += n_
        ap += (np_ / p_tot) * (cum_p / cum_n)
    assert r.n_positives == p_tot
    assert r.n_distinct_scores == len(agg)
    assert abs(r.average_precision - ap) < 1e-4
    assert 0 < r.average_precision <= 1


def test_magnitude_histogram_partitions_rows(spark):
    from testlog_etl_spark.queries.aggs import agg_magnitude_histogram

    rows = agg_magnitude_histogram(spark, SF_SMALL).collect()
    li = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet")
    assert sum(r.n_rows for r in rows) == len(li)
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-9
    for r in rows:
        # min/max stay inside the (magnitude, lead_digit) cell bounds
        lo = r.lead_digit * 10 ** (r.magnitude - 1)
        hi = (r.lead_digit + 1) * 10 ** (r.magnitude - 1) - 1
        assert lo <= r.min_cents <= r.max_cents <= hi


# ------------------------------------------------------------- MCC


def test_mcc_spark_matches_sklearn_formula(spark):
    from testlog_etl_spark.queries.llm_ops import eval_matthews_correlation

    r = eval_matthews_correlation(spark, SF_SMALL).collect()[0]
    n = r.tp + r.fp + r.fn + r.tn
    pdf = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    assert n == len(pdf)
    want = (r.tp * r.tn - r.fp * r.fn) / math.sqrt(
        (r.tp + r.fp) * (r.tp + r.fn) * (r.tn + r.fp) * (r.tn + r.fn)
    )
    assert abs(r.mcc - want) < 1e-9
    assert -1 <= r.mcc <= 1


def test_mcc_perfect_classifier_is_one():
    tp, tn, fp, fn = 40, 60, 0, 0
    mcc = (tp * tn - fp * fn) / math.sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
    assert abs(mcc - 1.0) < 1e-12


# -------------------------------------------------- Kendall's W


def _kendall_w(rankings):
    m, n = len(rankings), len(rankings[0])
    rsums = [sum(r[i] for r in rankings) for i in range(n)]
    mean = m * (n + 1) / 2
    s = sum((x - mean) ** 2 for x in rsums)
    return 12 * s / (m * m * (n ** 3 - n))


def test_kendall_w_bounds():
    # identical rankings -> W = 1; reversed pair for m=2 -> W = 0 is
    # only reachable in expectation; check the exact extremes
    assert abs(_kendall_w([[1, 2, 3], [1, 2, 3], [1, 2, 3]]) - 1.0) < 1e-12
    assert _kendall_w([[1, 2, 3], [3, 2, 1]]) < 1e-12


def test_kendall_w_spark_matches_python(spark):
    from testlog_etl_spark.queries.stats_queries import stats_kendall_w

    r = stats_kendall_w(spark, SF_SMALL).collect()[0]
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    m = ev.groupby("event_type").agg(
        n_events=("event_id", "count"),
        total_value=("value", "sum"),
        n_users=("user_id", "nunique"),
    )
    idx = sorted(m.index)

    def ranking(col):
        order = sorted(idx, key=lambda t: (-m.loc[t, col], t))
        return {t: i + 1 for i, t in enumerate(order)}

    rks = [ranking(c) for c in ("n_events", "total_value", "n_users")]
    w = _kendall_w([[rk[t] for t in idx] for rk in rks])
    assert r.n_items == len(idx) and r.n_raters == 3
    assert abs(r.kendall_w - w) < 1e-9
    assert 0 <= r.kendall_w <= 1


# ---------------------------------------------------- sign test


def test_sign_test_spark_matches_python(spark):
    from testlog_etl_spark.queries.stats_queries import stats_sign_test

    r = stats_sign_test(spark, SF_SMALL).collect()[0]
    pdf = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    pdf = pdf[pdf.o_orderdate.dt.year.isin([1995, 1996])]
    d = pdf.assign(
        yr=pdf.o_orderdate.dt.year,
        mo=pdf.o_orderdate.dt.month,
        dy=pdf.o_orderdate.dt.day,
    ).groupby(["yr", "mo", "dy"]).o_totalprice.sum()
    v = {k: int(math.floor(x / 1000.0 + 0.5)) for k, x in d.items()}
    sp = sm = ties = 0
    for (yr, mo, dy), val in v.items():
        if yr != 1995 or (1996, mo, dy) not in v:
            continue
        o = v[(1996, mo, dy)]
        sp += o > val
        sm += o < val
        ties += o == val
    assert (r.s_plus, r.s_minus, r.n_ties) == (sp, sm, ties)
    n = sp + sm
    cc = 0.5 if sp * 2 > n else (-0.5 if sp * 2 < n else 0.0)
    assert abs(r.z_stat - (sp - n / 2 - cc) / math.sqrt(n / 4)) < 1e-3


# ----------------------------------------- DROPMALFORMED / ARI


def test_dropmalformed_survivors_equal_good_rows(spark):
    from testlog_etl_spark.queries.sources_queries import source_csv_dropmalformed

    rows = {r.event_type: r for r in source_csv_dropmalformed(spark, SF_SMALL).collect()}
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    for et in ("click", "view"):
        g = ev[ev.event_type == et]
        assert rows[et].n == len(g)
        assert abs(rows[et].sum_value - g.value.sum()) < 1e-2


def _ari(text):
    import re

    w = [x for x in text.strip().split() if x]
    chars = sum(len(x) for x in w)
    words = max(len(w), 1)
    sents = max(len([s for s in re.split(r"[.!?]+", text) if s.strip()]), 1)
    return 4.71 * chars / words + 0.5 * words / sents - 21.43


def test_ari_known_sentence():
    # single 5-word, 21-letter sentence: ARI = 4.71*21/5 + 0.5*5 - 21.43
    t = "the quick brown fox jumps."
    # chars counts letters incl. trailing period token char ('jumps.')
    got = _ari(t)
    w = ["the", "quick", "brown", "fox", "jumps."]
    want = 4.71 * sum(len(x) for x in w) / 5 + 0.5 * 5 / 1 - 21.43
    assert abs(got - want) < 1e-12


def test_ari_spark_matches_python(spark):
    from testlog_etl_spark.queries.llm_ops import text_ari_readability

    rows = {r.source: r for r in text_ari_readability(spark, SF_SMALL).collect()}
    pdf = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    pdf = pdf[pdf.text.notna() & (pdf.text.str.strip() != "")]
    for src, grp in pdf.groupby("source"):
        vals = [_ari(t) for t in grp.text if t.strip().split()]
        r = rows[src]
        assert r.n_docs == len(vals)
        assert abs(r.avg_ari - sum(vals) / len(vals)) < 1e-3


# ------------------------------------- Cook's distance / BP test


def _simple_ols(xs, ys):
    n = len(xs)
    xbar, ybar = sum(xs) / n, sum(ys) / n
    sxx = sum((x - xbar) ** 2 for x in xs)
    b = sum((x - xbar) * (y - ybar) for x, y in zip(xs, ys)) / sxx
    a = ybar - b * xbar
    return a, b, sxx, xbar


def test_cooks_distance_spark_matches_python(spark):
    from testlog_etl_spark.queries.stats_queries import stats_cooks_distance

    rows = stats_cooks_distance(spark, SF_SMALL).collect()
    pdf = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    ys, days = _daily_kdollars(pdf)
    xs = list(range(len(ys)))
    a, b, sxx, xbar = _simple_ols(xs, ys)
    n = len(xs)
    es = [y - a - b * x for x, y in zip(xs, ys)]
    s2 = sum(e * e for e in es) / (n - 2)
    cooks = {}
    for x, e, day in zip(xs, es, days):
        h = 1 / n + (x - xbar) ** 2 / sxx
        cooks[day] = e * e * h / (2 * s2 * (1 - h) ** 2)
    top = sorted(cooks.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [r.day for r in rows] == [d for d, _ in top]
    for r, (_, want) in zip(rows, top):
        assert abs(r.cooks_d - want) < 1e-4
        assert 0 < r.leverage < 1


def test_breusch_pagan_spark_matches_python(spark):
    from testlog_etl_spark.queries.stats_queries import stats_breusch_pagan

    r = stats_breusch_pagan(spark, SF_SMALL).collect()[0]
    pdf = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    ys, _ = _daily_kdollars(pdf)
    xs = list(range(len(ys)))
    a, b, _, _ = _simple_ols(xs, ys)
    us = [(y - a - b * x) ** 2 for x, y in zip(xs, ys)]
    n = len(xs)
    sxu = sum(x * u for x, u in zip(xs, us)) - sum(xs) * sum(us) / n
    sxx = sum(x * x for x in xs) - sum(xs) ** 2 / n
    suu = sum(u * u for u in us) - sum(us) ** 2 / n
    r2 = (sxu / math.sqrt(sxx * suu)) ** 2
    assert r.n == n
    assert abs(r.r2_aux - r2) < 1e-3
    assert abs(r.lm_stat - n * r2) < 2e-3 * n  # scaled tolerance


# ------------------------------------------------------ CMH test


def test_cmh_spark_matches_python(spark):
    from testlog_etl_spark.queries.stats_queries import stats_cmh_test

    r = stats_cmh_test(spark, SF_SMALL).collect()[0]
    orders = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    li = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet")
    returned = li.groupby("l_orderkey").l_returnflag.apply(lambda s: int((s == "R").any()))
    j = orders.copy()
    j["yr"] = j.o_orderdate.dt.year
    j["exposed"] = j.o_orderpriority.isin(["1-URGENT", "2-HIGH"]).astype(int)
    j["returned"] = j.o_orderkey.map(returned).fillna(0).astype(int)
    sa = se = sv = sad = sbc = 0.0
    strata = 0
    for _, g in j.groupby("yr"):
        a = int(((g.exposed == 1) & (g.returned == 1)).sum())
        b = int(((g.exposed == 1) & (g.returned == 0)).sum())
        c = int(((g.exposed == 0) & (g.returned == 1)).sum())
        d = int(((g.exposed == 0) & (g.returned == 0)).sum())
        T = a + b + c + d
        sa += a
        se += (a + b) * (a + c) / T
        sv += (a + b) * (c + d) * (a + c) * (b + d) / (T * T * (T - 1))
        sad += a * d / T
        sbc += b * c / T
        strata += 1
    assert r.n_strata == strata and r.sum_a == sa
    assert abs(r.expected_a - se) < 1e-3
    assert abs(r.cmh_stat - (abs(sa - se) - 0.5) ** 2 / sv) < 1e-3
    assert abs(r.mh_odds_ratio - sad / sbc) < 1e-3


# ------------------------------------- access report / WoW anomaly


def test_subject_access_report_counts(spark):
    from testlog_etl_spark.queries.etl_queries import compliance_subject_access_report

    rows = compliance_subject_access_report(spark, SF_SMALL).collect()
    orders = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    li = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet")
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    got = {(r.subject_id, r.table_name): r for r in rows}
    for sid in (1, 7, 42):
        o = orders[orders.o_custkey == sid]
        if len(o):
            assert got[(sid, "orders")].n_records == len(o)
            keys = set(o.o_orderkey)
            l = li[li.l_orderkey.isin(keys)]
            if len(l):
                assert got[(sid, "lineitem")].n_records == len(l)
        e = ev[ev.user_id == sid]
        if len(e):
            r = got[(sid, "events")].n_records
            assert r == len(e)
    # no rows for subjects/tables with zero records
    for key, r in got.items():
        assert r.n_records > 0
        assert r.first_record <= r.last_record


def test_wow_anomaly_spark_matches_pandas(spark):
    from testlog_etl_spark.queries.profile_queries import dq_volumetric_anomaly_wow

    rows = {(r.event_type, r.week_index): r for r in dq_volumetric_anomaly_wow(spark, SF_SMALL).collect()}
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    epoch_days = ((ev.ts - pd.Timestamp("1970-01-01")).dt.total_seconds() // 86400).astype(int)
    ev = ev.assign(wk=epoch_days // 7)
    want = {}
    for et, g in ev.groupby("event_type"):
        weekly = g.groupby("wk").size().sort_index()
        for prev_wk, wk in zip(weekly.index, weekly.index[1:]):
            if wk != prev_wk + 1:
                continue
            pct = (weekly[wk] - weekly[prev_wk]) / weekly[prev_wk]
            if abs(pct) > 0.4:
                want[(et, wk)] = pct
    assert set(rows) == set(want)
    for k, pct in want.items():
        assert abs(rows[k].pct_change - pct) < 1e-12


# -------------------------------------------- distribution fits


def test_gamma_mom_recovers_parameters():
    # exact gamma moments: shape k, scale th -> mean k*th, var k*th^2
    k, th = 3.0, 2.5
    mean, var = k * th, k * th * th
    assert abs(mean * mean / var - k) < 1e-12
    assert abs(var / mean - th) < 1e-12


def test_distribution_fit_spark_matches_pandas(spark):
    import numpy as np
    from testlog_etl_spark.queries.stats_queries import stats_distribution_fit_moments

    rows = {r.o_orderpriority: r for r in stats_distribution_fit_moments(spark, SF_SMALL).collect()}
    pdf = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    for g, grp in pdf.groupby("o_orderpriority"):
        x = grp.o_totalprice.values
        mu, var = x.mean(), x.var()
        lx = np.log(x)
        r = rows[g]
        assert abs(r.gamma_shape - mu * mu / var) < 1e-2
        assert abs(r.gamma_scale - var / mu) < 1e-2
        assert abs(r.lognorm_mu - lx.mean()) < 1e-3
        assert abs(r.lognorm_sigma - lx.std()) < 1e-3
        assert r.gamma_logmean_gap >= 0


# -------------------------------- basket histogram / window sweep


def test_basket_histogram_partitions_orders(spark):
    from testlog_etl_spark.queries.aggs import orders_lines_per_order_histogram

    rows = orders_lines_per_order_histogram(spark, SF_SMALL).collect()
    orders = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    li = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet")
    per = li.groupby("l_orderkey").size()
    from collections import Counter

    want = Counter(per.reindex(orders.o_orderkey, fill_value=0))
    got = {r.n_lines: r.n_orders for r in rows}
    assert got == dict(want)
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-12


def test_attribution_sweep_monotone_and_exact(spark):
    from testlog_etl_spark.queries.aggs import attribution_window_sweep

    rows = attribution_window_sweep(spark, SF_SMALL).collect()
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet").sort_values(["user_id", "ts", "event_id"])
    want = {w: 0 for w in (1, 3, 7, 30)}
    n_purch = 0
    for _, g in ev.groupby("user_id"):
        last_click = None
        for _, e in g.iterrows():
            if e.event_type == "purchase":
                n_purch += 1
                if last_click is not None:
                    gap = int(e.ts.timestamp()) - int(last_click.timestamp())
                    for w in want:
                        if gap <= w * 86400:
                            want[w] += 1
            if e.event_type == "click":
                last_click = e.ts
    got = {r.window_days: r for r in rows}
    assert all(got[w].attributed == c for w, c in want.items())
    assert all(got[w].n_purchases == n_purch for w in want)
    # monotone in the window size
    ws = sorted(want)
    assert all(want[a] <= want[b] for a, b in zip(ws, ws[1:]))


# ---------------------------------- named WINDOW / GROUP BY ALL


def test_named_window_clause_values(spark):
    from testlog_etl_spark.queries.sources_queries import sql_named_window_clause

    rows = sql_named_window_clause(spark, SF_SMALL).collect()
    pdf = pd.read_parquet(f"{SF_SMALL}/orders.parquet").sort_values(
        ["o_custkey", "o_orderdate", "o_orderkey"]
    )
    assert len(rows) == len(pdf)
    by_cust = {}
    for r in rows:
        by_cust.setdefault(r.o_custkey, []).append(r)
    for ck, grp in pdf.groupby("o_custkey"):
        got = by_cust[ck]
        assert [g.order_seq for g in got] == list(range(1, len(grp) + 1))
        assert got[0].days_since_prev is None
        run = 0.0
        for g, (_, o) in zip(got, grp.iterrows()):
            run += o.o_totalprice
            assert abs(g.lifetime_spend - run) < 1e-2


def test_group_by_all_matches_explicit(spark):
    from testlog_etl_spark.queries.sources_queries import sql_group_by_all

    rows = sql_group_by_all(spark, SF_SMALL).collect()
    pdf = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    pdf["yr"] = pdf.o_orderdate.dt.year
    want = pdf.groupby(["yr", "o_orderpriority"]).agg(
        n=("o_orderkey", "count"), revenue=("o_totalprice", "sum")
    )
    assert len(rows) == len(want)
    for r in rows:
        w = want.loc[(r.yr, r.o_orderpriority)]
        assert r.n == w.n and abs(r.revenue - w.revenue) < 1e-2


# ----------------------------- position CTR / derivative profile


def test_position_ctr_buckets_cover_all_events(spark):
    from testlog_etl_spark.queries.etl_queries import events_position_in_session_ctr

    rows = events_position_in_session_ctr(spark, SF_SMALL).collect()
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    assert sum(r.n_events for r in rows) == len(ev)
    assert sum(r.n_purchases for r in rows) == (ev.event_type == "purchase").sum()
    for r in rows:
        assert abs(r.purchase_share - r.n_purchases / r.n_events) < 1e-12
    assert {r.position_bucket for r in rows} <= {"1", "2", "3", "4-5", "6-10", "11+"}


def test_derivative_profile_spark_matches_python(spark):
    from testlog_etl_spark.queries.windows_queries import ts_derivative_profile

    r = ts_derivative_profile(spark, SF_SMALL).collect()[0]
    pdf = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    vs, _ = _daily_kdollars(pdf)
    vel = [(vs[i + 1] - vs[i - 1]) / 2.0 for i in range(1, len(vs) - 1)]
    acc = [vs[i + 1] - 2 * vs[i] + vs[i - 1] for i in range(1, len(vs) - 1)]

    def sgn(x):
        return 1 if x > 0 else (-1 if x < 0 else 0)

    rev = sum(
        1 for a, b in zip(vel, vel[1:]) if sgn(a) * sgn(b) == -1
    )
    inf = sum(1 for a, b in zip(acc, acc[1:]) if sgn(a) * sgn(b) == -1)
    assert r.n_days == len(vel)
    assert (r.direction_reversals, r.inflections) == (rev, inf)
    assert abs(r.max_abs_velocity - max(abs(x) for x in vel)) < 1e-12
    assert r.max_abs_acceleration == max(abs(x) for x in acc)


# -------------------------------------------- cosine histogram


def test_cosine_histogram_spark_matches_numpy(spark):
    import numpy as np
    from testlog_etl_spark.queries.llm_ops import embed_cosine_histogram

    rows = embed_cosine_histogram(spark, SF_SMALL).collect()
    emb = pd.read_parquet(f"{SF_SMALL}/embeddings.parquet")
    emb = emb[emb.vec_id < 100].sort_values("vec_id")
    X = np.stack(emb.embedding.values).astype(np.float64)
    n = len(X)
    norms = np.linalg.norm(X, axis=1)
    cos = (X @ X.T) / np.outer(norms, norms)
    iu = np.triu_indices(n, 1)
    vals = cos[iu]
    assert sum(r.n_pairs for r in rows) == n * (n - 1) // 2
    from collections import Counter

    want = Counter(max(min(int(math.floor(c * 10)), 9), -10) for c in vals)
    got = {r.bucket: r.n_pairs for r in rows}
    assert got == dict(want)
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-9


# ----------------------------------- streaming histogram sketch


def test_stream_histogram_sketch_matches_batch(spark):
    from testlog_etl_spark.queries.streaming_queries import (
        stream_histogram_quantile_maintenance,
    )

    rows = {r.event_type: r for r in stream_histogram_quantile_maintenance(spark, SF_SMALL).collect()}
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    sel = ev[(ev.value >= 0) & (ev.value <= 100) & ev.value.notna()]
    for et, g in sel.groupby("event_type"):
        bins = (g.value / 100.0 * 64).apply(math.floor).clip(upper=63).astype(int)
        from collections import Counter

        h = Counter(bins)
        n = len(g)
        cum = 0
        p50 = p90 = None
        for b in sorted(h):
            cum += h[b]
            if p50 is None and cum >= 0.5 * n:
                p50 = b
            if p90 is None and cum >= 0.9 * n:
                p90 = b
        r = rows[et]
        assert r.n == n
        assert abs(r.p50_upper_edge - (p50 + 1) * 100.0 / 64) < 1e-9
        assert abs(r.p90_upper_edge - (p90 + 1) * 100.0 / 64) < 1e-9
        # sketch contract: the true quantile lies within the reported bin
        q50 = g.value.quantile(0.5)
        assert (p50) * 100.0 / 64 - 1e-9 <= q50 <= r.p50_upper_edge + 1e-9


# --------------------------------------- ts precision profile


def test_ts_precision_profile_nesting(spark):
    from testlog_etl_spark.queries.profile_queries import dq_timestamp_precision_profile

    r = dq_timestamp_precision_profile(spark, SF_SMALL).collect()[0]
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    us = ((ev.ts - pd.Timestamp("1970-01-01")).dt.total_seconds() * 1_000_000).round().astype("int64")
    assert r.n == len(ev)
    assert r.sec_aligned == int((us % 1_000_000 == 0).sum())
    assert r.min_aligned == int((us % 60_000_000 == 0).sum())
    # boundary alignments nest
    assert r.day_aligned <= r.hour_aligned <= r.min_aligned <= r.sec_aligned <= r.n


# --------------------------------------- tenure activity curve


def test_tenure_curve_spark_matches_pandas(spark):
    from testlog_etl_spark.queries.etl_queries import events_tenure_activity_curve

    rows = {r.tenure_wk: r for r in events_tenure_activity_curve(spark, SF_SMALL).collect()}
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    wk = ((ev.ts - pd.Timestamp("1970-01-01")).dt.total_seconds() // 86400).astype(int) // 7
    df = pd.DataFrame({"user_id": ev.user_id, "wk": wk})
    first = df.groupby("user_id").wk.min()
    df["tenure"] = df.wk - df.user_id.map(first)
    for ten, g in df.groupby("tenure"):
        r = rows[ten]
        assert r.n_events == len(g)
        assert r.n_users == g.user_id.nunique()
        assert abs(r.events_per_user - len(g) / g.user_id.nunique()) < 1e-12
    # tenure week 0 contains every user by construction
    assert rows[0].n_users == ev.user_id.nunique()


# ---------------------------------------- balanced downsample


def test_balanced_downsample_exact_k_per_class(spark):
    from testlog_etl_spark.queries.llm_ops import sample_class_balanced_downsample

    rows = sample_class_balanced_downsample(spark, SF_SMALL).collect()
    pdf = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    sizes = pdf.groupby("lang").size()
    k = int(sizes.min())
    assert {r.lang for r in rows} == set(sizes.index)
    for r in rows:
        assert r.kept_n == k
        assert r.original_n == sizes[r.lang]
        ids = sorted(pdf[pdf.lang == r.lang].doc_id)[:k]
        assert r.max_kept_doc_id == ids[-1]
