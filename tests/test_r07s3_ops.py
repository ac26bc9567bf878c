"""Invariant tests for the r07 session-3 operators: each statistic is
re-derived by an INDEPENDENT pure-Python brute force over the same
parquet rows (fetched via DuckDB), so a shared-misconception bug in the
Spark query + SQL oracle pair would still be caught here."""

from __future__ import annotations

import math

import pytest

from tests.conftest import SF_SMALL, register_duck_views


def _avg_ranks(values):
    """value -> tie-averaged rank (1-based) over the full list."""
    s = sorted(values)
    ranks = {}
    i = 0
    while i < len(s):
        j = i
        while j < len(s) and s[j] == s[i]:
            j += 1
        ranks[s[i]] = (i + 1 + j) / 2.0
        i = j
    return ranks


def test_mann_whitney_matches_bruteforce(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    rows = duck.execute(
        "SELECT l_returnflag, l_extendedprice, l_orderkey % 2 = 1 FROM lineitem"
    ).fetchall()
    by_flag = {}
    for flag, val, is_a in rows:
        by_flag.setdefault(flag, []).append((val, is_a))
    got = {
        r["flag"]: r
        for r in REGISTRY["stats_mann_whitney"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(by_flag)
    for flag, pairs in by_flag.items():
        ranks = _avg_ranks([v for v, _ in pairs])
        na = sum(1 for _, a in pairs if a)
        nb = len(pairs) - na
        r1 = sum(ranks[v] for v, a in pairs if a)
        u = r1 - na * (na + 1) / 2.0
        n = na + nb
        # tie term over value multiplicities
        from collections import Counter

        ties = sum(c**3 - c for c in Counter(v for v, _ in pairs).values())
        var = na * nb / 12.0 * ((n + 1) - ties / (n * (n - 1)))
        z = (u - na * nb / 2.0) / math.sqrt(var)
        assert got[flag]["n_a"] == na and got[flag]["n_b"] == nb
        assert got[flag]["u_stat"] == pytest.approx(u, abs=0.011)
        assert got[flag]["z"] == pytest.approx(z, abs=1e-3)


def test_anova_matches_bruteforce(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    rows = duck.execute(
        "SELECT o_orderpriority, o_totalprice FROM orders"
    ).fetchall()
    groups = {}
    for g, x in rows:
        groups.setdefault(g, []).append(x)
    k, n = len(groups), len(rows)
    gm = sum(x for xs in groups.values() for x in xs) / n
    ssb = sum(len(xs) * (sum(xs) / len(xs) - gm) ** 2 for xs in groups.values())
    ssw = sum(
        sum((x - sum(xs) / len(xs)) ** 2 for x in xs) for xs in groups.values()
    )
    f = (ssb / (k - 1)) / (ssw / (n - k))
    row = REGISTRY["stats_anova_oneway"].fn(spark, SF_SMALL).collect()[0]
    assert row["k_groups"] == k and row["n"] == n
    # query output is presentation-rounded (4 / 6 places)
    assert row["f_stat"] == pytest.approx(f, abs=6e-5)
    assert row["eta_sq"] == pytest.approx(ssb / (ssb + ssw), abs=6e-7)


def test_spearman_matches_bruteforce(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    rows = duck.execute(
        'SELECT event_type, "value", EXTRACT(hour FROM ts) FROM events'
    ).fetchall()
    by_type = {}
    for et, x, y in rows:
        by_type.setdefault(et, []).append((x, float(y)))
    got = {
        r["event_type"]: r
        for r in REGISTRY["stats_spearman_corr"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(by_type)
    for et, pairs in by_type.items():
        rx = _avg_ranks([x for x, _ in pairs])
        ry = _avg_ranks([y for _, y in pairs])
        xs = [rx[x] for x, _ in pairs]
        ys = [ry[y] for _, y in pairs]
        n = len(pairs)
        mx, my = sum(xs) / n, sum(ys) / n
        cov = sum((a - mx) * (b - my) for a, b in zip(xs, ys))
        sx = math.sqrt(sum((a - mx) ** 2 for a in xs))
        sy = math.sqrt(sum((b - my) ** 2 for b in ys))
        rho = cov / (sx * sy)
        assert got[et]["n"] == n
        assert got[et]["spearman_rho"] == pytest.approx(rho, abs=1e-3)


def test_ljung_box_matches_bruteforce(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    rows = duck.execute(
        "SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d, count(*) "
        "FROM events GROUP BY event_type, d ORDER BY event_type, d"
    ).fetchall()
    series = {}
    for et, _, n in rows:
        series.setdefault(et, []).append(float(n))
    got = {}
    for r in REGISTRY["stats_ljung_box"].fn(spark, SF_SMALL).collect():
        got[(r["event_type"], r["lag"])] = r
    for et, xs in series.items():
        n = len(xs)
        mu = sum(xs) / n
        den = sum((x - mu) ** 2 for x in xs)
        q = 0.0
        for k in range(1, 8):
            num = sum((xs[t] - mu) * (xs[t - k] - mu) for t in range(k, n))
            rk = num / den
            q += rk * rk / (n - k)
            row = got[(et, k)]
            assert row["acf"] == pytest.approx(rk, abs=1e-3)
            assert row["q_stat"] == pytest.approx(n * (n + 2) * q, abs=5e-3)


def test_stl_decompose_identity_and_trend(spark):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    rows = REGISTRY["ts_stl_decompose"].fn(spark, SF_SMALL).collect()
    assert len(rows) > 100
    # additive identity: rev == trend + seasonal + residual (up to rounding)
    for r in rows:
        assert r["rev"] == pytest.approx(
            r["trend"] + r["seasonal"] + r["residual"], abs=2e-3
        )
    # seasonal is a pure function of ISO dow, centered to ~0 over the week
    by_dow = {}
    for r in rows:
        by_dow.setdefault(r["day"].isoweekday(), set()).add(r["seasonal"])
    assert all(len(v) == 1 for v in by_dow.values())
    assert sum(next(iter(v)) for v in by_dow.values()) == pytest.approx(0, abs=4e-3)


def test_clustering_coeff_matches_bruteforce(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    edges = duck.execute(
        """
        WITH raw AS (
          SELECT prev_type AS a, event_type AS b FROM (
            SELECT event_type,
                   lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
            FROM events
          ) WHERE prev_type IS NOT NULL AND prev_type <> event_type
        )
        SELECT DISTINCT least(a,b), greatest(a,b) FROM raw
        """
    ).fetchall()
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    got = {
        r["node"]: r
        for r in REGISTRY["graph_clustering_coefficient"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(adj)
    for node, nbrs in adj.items():
        deg = len(nbrs)
        tri = sum(
            1
            for x in nbrs
            for y in nbrs
            if x < y and y in adj[x]
        )
        cc = 0.0 if deg < 2 else 2.0 * tri / (deg * (deg - 1))
        assert got[node]["degree"] == deg
        assert got[node]["n_triangles"] == tri
        assert got[node]["clustering_coeff"] == pytest.approx(cc, abs=1e-3)


def test_theil_matches_bruteforce(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    rows = duck.execute(
        "SELECT c.c_mktsegment, o.o_custkey, SUM(o.o_totalprice) FROM orders o "
        "JOIN customer c ON c.c_custkey = o.o_custkey GROUP BY 1, 2"
    ).fetchall()
    by_seg = {}
    for seg, _, x in rows:
        by_seg.setdefault(seg, []).append(x)
    got = {
        r["segment"]: r
        for r in REGISTRY["agg_theil_index"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(by_seg)
    for seg, xs in by_seg.items():
        n = len(xs)
        mu = sum(xs) / n
        t = sum((x / mu) * math.log(x / mu) for x in xs) / n
        l = sum(math.log(mu / x) for x in xs) / n
        assert got[seg]["n_customers"] == n
        assert got[seg]["theil_t"] == pytest.approx(t, abs=1e-3)
        assert got[seg]["theil_l"] == pytest.approx(l, abs=1e-3)


def test_pr_curve_invariants(spark):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    rows = REGISTRY["eval_pr_curve"].fn(spark, SF_SMALL).collect()
    assert len(rows) == 19
    recalls = [r["recall"] for r in rows]
    # predicted-positive set shrinks as the threshold rises
    assert recalls == sorted(recalls, reverse=True)
    tps = [r["tp"] for r in rows]
    assert tps == sorted(tps, reverse=True)
    for r in rows:
        assert 0.0 <= r["precision"] <= 1.0
        assert 0.0 <= r["recall"] <= 1.0
        assert 0.0 <= r["f1"] <= 1.0
        # F1 is the harmonic mean of P and R (up to rounding)
        if r["precision"] + r["recall"] > 0:
            want = 2 * r["precision"] * r["recall"] / (r["precision"] + r["recall"])
            assert r["f1"] == pytest.approx(want, abs=2e-3)


def test_quarantine_matches_bruteforce(spark, duck):
    import datetime as dt
    import json

    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    rows = duck.execute(
        'SELECT event_id, "value", props, event_type, CAST(ts AS DATE) FROM events'
    ).fetchall()
    want = {}
    for eid, val, props, et, day in rows:
        fired = []
        if val > 450:
            fired.append("value_spike")
        if json.loads(props).get("k", -1) >= 90:
            fired.append("props_k_high")
        if et == "purchase" and day.isoweekday() >= 6:
            fired.append("weekend_purchase")
        if fired:
            key = ",".join(fired)
            n, s = want.get(key, (0, None))
            want[key] = (n + 1, eid if s is None else min(s, eid))
    got = {
        r["reasons"]: (r["n_rows"], r["sample_event_id"])
        for r in REGISTRY["etl_quarantine_badrecords"].fn(spark, SF_SMALL).collect()
    }
    assert got == want


def _median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2.0


def test_cusum_matches_bruteforce(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    rows = duck.execute(
        "SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d, "
        "ROUND(SUM(\"value\"), 6) FROM events GROUP BY 1, 2 ORDER BY 1, 2"
    ).fetchall()
    series = {}
    for et, _, x in rows:
        series.setdefault(et, []).append(x)
    got = {
        r["event_type"]: r
        for r in REGISTRY["ts_cusum_drift"].fn(spark, SF_SMALL).collect()
    }
    for et, xs in series.items():
        n = len(xs)
        mu0 = sum(xs) / n
        var = sum((x - mu0) ** 2 for x in xs) / n
        sd = math.sqrt(var)
        g = float(1 << 20)
        mu = math.floor(mu0 * g + 0.5) / g
        k = math.floor(sd * (1 << 19) + 0.5) / g
        h = math.floor(sd * (1 << 22) + 0.5) / g
        s_hi = s_lo = 0.0
        a_hi = a_lo = 0
        for x in xs:
            s_hi = max(0.0, s_hi + ((x - mu) - k))
            s_lo = max(0.0, s_lo + ((mu - x) - k))
            a_hi += s_hi > h
            a_lo += s_lo > h
        r = got[et]
        assert r["n_days"] == n
        assert r["n_alarms_hi"] == a_hi and r["n_alarms_lo"] == a_lo
        assert r["final_s_hi"] == pytest.approx(s_hi, abs=1e-3)
        assert r["final_s_lo"] == pytest.approx(s_lo, abs=1e-3)


def test_theilsen_matches_bruteforce(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    rows = duck.execute(
        "SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d, "
        "ROUND(SUM(\"value\"), 6) FROM events GROUP BY 1, 2 ORDER BY 1, 2"
    ).fetchall()
    series = {}
    for et, _, x in rows:
        series.setdefault(et, []).append(x)
    got = {
        r["event_type"]: r
        for r in REGISTRY["ts_theilsen_slope"].fn(spark, SF_SMALL).collect()
    }
    for et, xs in series.items():
        n = len(xs)
        slopes = [
            (xs[j] - xs[i]) / (j - i)
            for i in range(n)
            for j in range(i + 1, n)
        ]
        slope = round(_median(slopes), 6)
        icepts = [xs[i] - slope * (i + 1) for i in range(n)]
        r = got[et]
        assert r["n_days"] == n and r["n_pairs"] == len(slopes)
        assert r["sen_slope"] == pytest.approx(slope, abs=2e-6)
        assert r["sen_intercept"] == pytest.approx(_median(icepts), abs=1e-3)


def test_lpa_matches_bruteforce(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    edges = duck.execute(
        """
        WITH raw AS (
          SELECT prev_type AS a, event_type AS b FROM (
            SELECT event_type,
                   lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
            FROM events
          ) WHERE prev_type IS NOT NULL AND prev_type <> event_type
        )
        SELECT DISTINCT least(a,b), greatest(a,b) FROM raw
        """
    ).fetchall()
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    labels = {n: n for n in adj}
    for _ in range(3):
        new = {}
        for n, nbrs in adj.items():
            counts = {}
            for m in nbrs:
                counts[labels[m]] = counts.get(labels[m], 0) + 1
            best = max(counts.items(), key=lambda kv: (kv[1], [-ord(c) for c in kv[0]]))
            # tie -> min label: max on (count, reverse-lexicographic)
            new[n] = best[0]
        labels = new
    got = {
        r["node"]: r["community"]
        for r in REGISTRY["graph_label_propagation"].fn(spark, SF_SMALL).collect()
    }
    assert got == labels


def test_kendall_tau_matches_bruteforce(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    rows = duck.execute(
        "SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d, "
        "ROUND(SUM(\"value\"), 6), count(*) FROM events GROUP BY 1, 2 ORDER BY 1, 2"
    ).fetchall()
    series = {}
    for et, _, x, y in rows:
        series.setdefault(et, []).append((x, y))
    got = {
        r["event_type"]: r
        for r in REGISTRY["stats_kendall_tau"].fn(spark, SF_SMALL).collect()
    }
    for et, pts in series.items():
        n = len(pts)
        c = d = n1 = n2 = 0
        for i in range(n):
            for j in range(i + 1, n):
                dx = pts[j][0] - pts[i][0]
                dy = pts[j][1] - pts[i][1]
                if dx * dy > 0:
                    c += 1
                elif dx * dy < 0:
                    d += 1
                if dx == 0:
                    n1 += 1
                if dy == 0:
                    n2 += 1
        n0 = n * (n - 1) // 2
        tau = (c - d) / math.sqrt((n0 - n1) * (n0 - n2))
        r = got[et]
        assert r["n_days"] == n
        assert (r["concordant"], r["discordant"]) == (c, d)
        assert r["tau_b"] == pytest.approx(tau, abs=1e-3)


def test_bh_fdr_stepup_invariants(spark):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    rows = REGISTRY["stats_benjamini_hochberg"].fn(spark, SF_SMALL).collect()
    m = len(rows)
    assert m == 5
    by_rank = sorted(rows, key=lambda r: r["p_rank"])
    # p ascending in rank, cutoffs k*q/m, rejection is a prefix of ranks
    ps = [r["p_value"] for r in by_rank]
    assert ps == sorted(ps)
    for r in by_rank:
        assert r["bh_cutoff"] == pytest.approx(r["p_rank"] * 0.10 / m, abs=1e-6)
    km = max((r["p_rank"] for r in by_rank if r["p_value"] <= r["bh_cutoff"]), default=0)
    for r in by_rank:
        assert r["rejected"] == (r["p_rank"] <= km)
    # two-sided p from |z|: sanity against the normal tail at the grid points
    for r in by_rank:
        z = abs(r["z"])
        approx = math.erfc(z / math.sqrt(2.0))
        assert r["p_value"] == pytest.approx(approx, abs=2e-4)


def test_hapax_matches_bruteforce(spark, duck):
    from collections import Counter

    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    rows = duck.execute("SELECT source, text FROM documents").fetchall()
    per_src = {}
    for src, text in rows:
        toks = [t for t in (text or "").strip().lower().split() if t]
        per_src.setdefault(src, Counter()).update(toks)
    got = {
        r["source"]: r
        for r in REGISTRY["text_hapax_ratio"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(per_src)
    for src, cnt in per_src.items():
        vocab = len(cnt)
        hapax = sum(1 for v in cnt.values() if v == 1)
        mass = sum(cnt.values())
        r = got[src]
        assert (r["vocab"], r["hapax"], r["token_mass"]) == (vocab, hapax, mass)
        assert r["hapax_vocab_share"] == pytest.approx(hapax / vocab, abs=1e-3)
        assert r["hapax_token_share"] == pytest.approx(hapax / mass, abs=1e-3)


def test_dp_noise_invariants(spark):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    rows = REGISTRY["dq_dp_noisy_counts"].fn(spark, SF_SMALL).collect()
    rows2 = REGISTRY["dq_dp_noisy_counts"].fn(spark, SF_SMALL).collect()
    # deterministic release: same seed -> identical noise
    assert [tuple(r) for r in rows] == [tuple(r) for r in rows2]
    for r in rows:
        assert r["epsilon"] == 1.0
        # realized noise consistent with the reported magnitude
        assert abs(r["n_noisy"] - r["n_true"]) == pytest.approx(
            r["abs_noise"], abs=2e-4
        )
        # inverse-CDF from a 2^-20-grid uniform bounds |noise| by ln(2^20)/eps
        assert r["abs_noise"] <= math.log(1 << 20) + 1e-6


def test_js_divergence_matches_union_bruteforce(spark, duck):
    from collections import Counter

    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    rows = duck.execute("SELECT source, text FROM documents").fetchall()
    dists = {}
    for src, text in rows:
        toks = [t for t in (text or "").strip().lower().split() if t]
        dists.setdefault(src, Counter()).update(toks)
    probs = {
        s: {t: c / sum(cnt.values()) for t, c in cnt.items()}
        for s, cnt in dists.items()
    }
    got = {
        (r["source_a"], r["source_b"]): r["js_divergence"]
        for r in REGISTRY["text_js_divergence"].fn(spark, SF_SMALL).collect()
    }
    srcs = sorted(probs)
    assert set(got) == {(a, b) for a in srcs for b in srcs if a < b}
    # independent union-vocabulary formulation
    for (a, b), js in got.items():
        pa, pb = probs[a], probs[b]
        want = 0.0
        for t in set(pa) | set(pb):
            p, q = pa.get(t, 0.0), pb.get(t, 0.0)
            m = (p + q) / 2.0
            if p > 0:
                want += 0.5 * p * math.log(p / m)
            if q > 0:
                want += 0.5 * q * math.log(q / m)
        assert js == pytest.approx(want, abs=1e-3)


def test_cuped_matches_bruteforce(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    rows = duck.execute(
        'SELECT user_id, EXTRACT(day FROM ts), "value" FROM events'
    ).fetchall()
    ux, uy = {}, {}
    for uid, day, v in rows:
        if day >= 15:
            uy[uid] = uy.get(uid, 0.0) + v
            ux.setdefault(uid, 0.0)
        else:
            ux[uid] = ux.get(uid, 0.0) + v
            uy.setdefault(uid, 0.0)
    uids = sorted(ux)
    xs = [ux[u] for u in uids]
    ys = [uy[u] for u in uids]
    n = len(uids)
    xbar, ybar = sum(xs) / n, sum(ys) / n
    cov = sum((x - xbar) * (y - ybar) for x, y in zip(xs, ys)) / n
    vx = sum((x - xbar) ** 2 for x in xs) / n
    vy = sum((y - ybar) ** 2 for y in ys) / n
    theta = cov / vx
    ya = {u: uy[u] - theta * (ux[u] - xbar) for u in uids}
    yabar = sum(ya.values()) / n
    vya = sum((v - yabar) ** 2 for v in ya.values()) / n
    r = REGISTRY["stats_cuped_adjustment"].fn(spark, SF_SMALL).collect()[0]
    t = [u for u in uids if u % 2 == 1]
    c = [u for u in uids if u % 2 == 0]
    assert (r["n_treat"], r["n_ctrl"]) == (len(t), len(c))
    assert r["var_reduction"] == pytest.approx(1 - vya / vy, abs=1e-3)
    mt = sum(ya[u] for u in t) / len(t)
    mc = sum(ya[u] for u in c) / len(c)
    assert r["adj_diff"] == pytest.approx(mt - mc, abs=1e-3)
    vt = sum((ya[u] - mt) ** 2 for u in t) / (len(t) - 1)
    vc = sum((ya[u] - mc) ** 2 for u in c) / (len(c) - 1)
    want_z = (mt - mc) / math.sqrt(vt / len(t) + vc / len(c))
    assert r["z_adj"] == pytest.approx(want_z, abs=1e-3)


def test_two_proportion_z_matches_bruteforce(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    rows = duck.execute(
        "SELECT user_id % 2, event_type = 'purchase' FROM events"
    ).fetchall()
    n = {0: 0, 1: 0}
    k = {0: 0, 1: 0}
    for arm, conv in rows:
        n[arm] += 1
        k[arm] += bool(conv)
    r = REGISTRY["stats_two_proportion_z"].fn(spark, SF_SMALL).collect()[0]
    assert (r["n_treat"], r["n_ctrl"]) == (n[1], n[0])
    assert (r["conv_treat"], r["conv_ctrl"]) == (k[1], k[0])
    p1, p0 = k[1] / n[1], k[0] / n[0]
    pp = (k[1] + k[0]) / (n[1] + n[0])
    z = (p1 - p0) / math.sqrt(pp * (1 - pp) * (1 / n[1] + 1 / n[0]))
    assert r["z"] == pytest.approx(z, abs=1e-3)


def test_sprt_matches_bruteforce(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    rows = duck.execute(
        'SELECT event_type, CAST(date_trunc(\'day\', ts) AS DATE) AS d, '
        'SUM(CASE WHEN "value" > 100 THEN 1 ELSE 0 END), COUNT(*) '
        "FROM events GROUP BY 1, 2 ORDER BY 1, 2"
    ).fetchall()
    series = {}
    for et, day, kk, nn in rows:
        series.setdefault(et, []).append((day, kk, nn))
    got = {
        r["event_type"]: r
        for r in REGISTRY["stats_sprt_sequential"].fn(spark, SF_SMALL).collect()
    }
    l1, l0, bound = math.log(0.55 / 0.45), math.log(0.45 / 0.55), math.log(19.0)
    for et, days in series.items():
        llr = 0.0
        hi = lo = None
        for day, kk, nn in days:
            llr += kk * l1 + (nn - kk) * l0
            if llr >= bound and hi is None:
                hi = day
            if llr <= -bound and lo is None:
                lo = day
        r = got[et]
        assert r["n_days"] == len(days)
        assert r["final_llr"] == pytest.approx(llr, abs=1e-3)
        if hi is not None and (lo is None or hi < lo):
            assert r["decision"] == "accept_h1" and r["first_crossing"] == hi
        elif lo is not None:
            assert r["decision"] == "accept_h0"
        else:
            assert r["decision"] == "continue" and r["first_crossing"] is None


def test_kmv_sketch_invariants(spark):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    rows = REGISTRY["agg_kmv_distinct_sketch"].fn(spark, SF_SMALL).collect()
    per = [r for r in rows if r["scope"] != "__union__"]
    un = [r for r in rows if r["scope"] == "__union__"]
    assert len(un) == 1 and len(per) >= 2
    # union exact distinct can never exceed the sum of per-source exacts
    assert un[0]["n_exact"] <= sum(r["n_exact"] for r in per)
    for r in rows:
        # exact fallback when the scope holds < k distinct values
        if r["n_exact"] < 16:
            assert r["kmv_est"] == pytest.approx(r["n_exact"], abs=1e-6)
            assert r["err_pct"] == pytest.approx(0.0, abs=1e-6)
        assert r["kmv_est"] > 0
        # err_pct is computed from the UNROUNDED estimate; recomputing
        # from the round-2 kmv_est wobbles by up to 0.5/n_exact*100
        assert r["err_pct"] == pytest.approx(
            abs(r["kmv_est"] - r["n_exact"]) * 100.0 / r["n_exact"], abs=0.06
        )


def test_dim_variance_matches_bruteforce(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    vecs = [r[0] for r in duck.execute("SELECT embedding FROM embeddings").fetchall()]
    dims = len(vecs[0])
    got = {
        r["dim"]: r
        for r in REGISTRY["embed_dim_variance_profile"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(range(dims))
    tot = 0.0
    per = {}
    for d in range(dims):
        xs = [float(v[d]) for v in vecs]
        mu = sum(xs) / len(xs)
        var = sum((x - mu) ** 2 for x in xs) / len(xs)
        per[d] = (mu, var)
        tot += var
    for d, (mu, var) in per.items():
        assert got[d]["mean"] == pytest.approx(mu, abs=1e-4)
        assert got[d]["var_pop"] == pytest.approx(var, abs=1e-4)
        assert got[d]["var_share"] == pytest.approx(var / tot, abs=1e-4)


def test_revenue_bridge_identity(spark):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    rows = REGISTRY["orders_revenue_bridge"].fn(spark, SF_SMALL).collect()
    assert len(rows) == 5
    for r in rows:
        # decomposition closes exactly: volume + rate == delta
        assert r["volume_effect"] + r["rate_effect"] == pytest.approx(
            r["total_delta"], abs=0.03
        )
        assert r["total_delta"] == pytest.approx(
            r["rev_1996"] - r["rev_1995"], abs=0.02
        )


def test_periodogram_matches_bruteforce(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    rows = duck.execute(
        "SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS d, SUM(o_totalprice) "
        "FROM orders GROUP BY d ORDER BY d"
    ).fetchall()
    xs = [x for _, x in rows]
    n = len(xs)
    mu = sum(xs) / n
    got = {
        r["period_days"]: r["power"]
        for r in REGISTRY["ts_periodogram_weekly"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(range(2, 15))
    for p in range(2, 15):
        c = sum((x - mu) * math.cos(2 * math.pi * t / p) for t, x in enumerate(xs))
        sn = sum((x - mu) * math.sin(2 * math.pi * t / p) for t, x in enumerate(xs))
        want = (c * c + sn * sn) / n
        assert got[p] == pytest.approx(want, rel=1e-6)


def test_image_tiles_matches_bruteforce(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    rows = duck.execute("SELECT source, n_chars FROM documents").fetchall()
    want = {}
    for src, n_chars in rows:
        side = math.isqrt(n_chars or 0)
        g = side // 16
        n, tiled, tot = want.get(src, (0, 0, 0))
        want[src] = (n + 1, tiled + (g >= 1), tot + g * g)
    got = {
        r["source"]: r
        for r in REGISTRY["multimodal_image_tiles"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(want)
    for src, (n, tiled, tot) in want.items():
        r = got[src]
        assert (r["n_images"], r["tileable_images"], r["total_tiles"]) == (n, tiled, tot)
        assert r["mean_tiles_per_image"] == pytest.approx(tot / n, abs=1e-3)
        assert r["explode_matches_formula"] is True


def test_trigram_search_matches_direct_scan(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    want = {}
    for doc_id, text in duck.execute("SELECT doc_id, text FROM documents").fetchall():
        if "hash value" in (text or ""):
            want[doc_id] = text.count("hash value")
    got = {
        r["doc_id"]: r["n_occurrences"]
        for r in REGISTRY["index_trigram_search"].fn(spark, SF_SMALL).collect()
    }
    assert got == want


def test_transitivity_consistent_with_local_cc(spark):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    g = REGISTRY["graph_transitivity_global"].fn(spark, SF_SMALL).collect()[0]
    local = REGISTRY["graph_clustering_coefficient"].fn(spark, SF_SMALL).collect()
    # triangle total: each triangle contributes 3 node-triangle incidences
    assert sum(r["n_triangles"] for r in local) == 3 * g["n_triangles"]
    # triads from degrees
    assert g["n_triads"] == sum(
        r["degree"] * (r["degree"] - 1) // 2 for r in local
    )
    assert g["n_nodes"] == len(local)
    # transitivity equals the degree-weighted mean of local ccs
    want = 3.0 * g["n_triangles"] / g["n_triads"]
    assert g["transitivity"] == pytest.approx(want, abs=1e-3)


def test_levene_matches_bruteforce(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    rows = duck.execute("SELECT o_orderpriority, o_totalprice FROM orders").fetchall()
    groups = {}
    for g, x in rows:
        groups.setdefault(g, []).append(x)
    zs = {}
    for g, xs in groups.items():
        md = _median(xs)
        zs[g] = [abs(x - md) for x in xs]
    k = len(zs)
    n = sum(len(v) for v in zs.values())
    gm = sum(x for v in zs.values() for x in v) / n
    ssb = sum(len(v) * (sum(v) / len(v) - gm) ** 2 for v in zs.values())
    ssw = sum(sum((x - sum(v) / len(v)) ** 2 for x in v) for v in zs.values())
    w = (ssb / (k - 1)) / (ssw / (n - k))
    r = REGISTRY["stats_levene_test"].fn(spark, SF_SMALL).collect()[0]
    assert (r["k_groups"], r["n"]) == (k, n)
    assert r["w_stat"] == pytest.approx(w, abs=6e-5)


def test_effect_sizes_match_bruteforce(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    rows = duck.execute(
        "SELECT l_returnflag, l_extendedprice, l_orderkey % 2 = 1 FROM lineitem"
    ).fetchall()
    by_flag = {}
    for flag, val, is_a in rows:
        by_flag.setdefault(flag, []).append((val, bool(is_a)))
    got = {
        r["flag"]: r
        for r in REGISTRY["stats_effect_sizes"].fn(spark, SF_SMALL).collect()
    }
    for flag, pairs in by_flag.items():
        a = sorted(v for v, t in pairs if t)
        b = sorted(v for v, t in pairs if not t)
        na, nb = len(a), len(b)
        ma, mb = sum(a) / na, sum(b) / nb
        va = sum((x - ma) ** 2 for x in a) / (na - 1)
        vb = sum((x - mb) ** 2 for x in b) / (nb - 1)
        d = (ma - mb) / math.sqrt(((na - 1) * va + (nb - 1) * vb) / (na + nb - 2))
        g = d * (1 - 3 / (4 * (na + nb - 2) - 1))
        # Cliff's delta via direct dominance counting (independent of U):
        # two-pointer over the sorted arrays
        import bisect

        gt = sum(bisect.bisect_left(b, x) for x in a)  # b[j] <  x
        le = sum(bisect.bisect_right(b, x) for x in a)  # b[j] <= x
        lt = na * nb - le  # b[j] > x
        delta = (gt - lt) / (na * nb)
        r = got[flag]
        assert r["cohens_d"] == pytest.approx(d, abs=1e-5)
        assert r["hedges_g"] == pytest.approx(g, abs=1e-5)
        assert r["cliffs_delta"] == pytest.approx(delta, abs=1e-5)


def test_holt_winters_matches_bruteforce(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    rows = duck.execute(
        "SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d, "
        "ROUND(SUM(\"value\"), 6) FROM events GROUP BY 1, 2 ORDER BY 1, 2"
    ).fetchall()
    series = {}
    for et, _, y in rows:
        series.setdefault(et, []).append(y)
    got = {
        r["event_type"]: r
        for r in REGISTRY["ts_holt_winters"].fn(spark, SF_SMALL).collect()
    }
    for et, y in series.items():
        if len(y) < 14:
            assert et not in got
            continue
        l = math.floor(sum(y[:7]) / 7.0 * 1e6 + 0.5) / 1e6
        b = 0.0
        sl = [y[i] - l for i in range(7)]
        for t in range(7, len(y)):
            s_old = sl[0]
            nl = 0.5 * (y[t] - s_old) + 0.5 * (l + b)
            nb = 0.5 * (nl - l) + 0.5 * b
            sl = sl[1:] + [0.5 * (y[t] - nl) + 0.5 * s_old]
            l, b = nl, nb
        r = got[et]
        assert r["n_days"] == len(y)
        assert r["level"] == pytest.approx(l, abs=1e-3)
        assert r["trend"] == pytest.approx(b, abs=1e-3)
        assert r["forecast_next"] == pytest.approx(l + b + sl[0], abs=1e-3)


def test_kalman_matches_bruteforce(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    rows = duck.execute(
        "SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d, "
        "ROUND(SUM(\"value\"), 6) FROM events GROUP BY 1, 2 ORDER BY 1, 2"
    ).fetchall()
    series = {}
    for et, _, y in rows:
        series.setdefault(et, []).append(y)
    got = {
        r["event_type"]: r
        for r in REGISTRY["ts_kalman_level"].fn(spark, SF_SMALL).collect()
    }
    for et, y in series.items():
        l, p, k, ss = y[0], 1e6, 0.0, 0.0
        for t in range(1, len(y)):
            pp = p + 100.0
            k = pp / (pp + 2500.0)
            innov = y[t] - l
            l += k * innov
            p = (1 - k) * pp
            ss += innov * innov
        r = got[et]
        assert r["n_days"] == len(y)
        assert r["level"] == pytest.approx(l, abs=1e-3)
        assert r["gain"] == pytest.approx(k, abs=1e-5)
        assert r["innovation_rms"] == pytest.approx(
            math.sqrt(ss / (len(y) - 1)), abs=1e-3
        )


def test_radius_join_matches_bruteforce(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    pts = duck.execute(
        "SELECT vec_id, embedding[1]::DOUBLE, embedding[2]::DOUBLE FROM embeddings"
    ).fetchall()
    r = 0.02
    want = set()
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            a, b = pts[i], pts[j]
            if (a[1] - b[1]) ** 2 + (a[2] - b[2]) ** 2 <= r * r:
                want.add((min(a[0], b[0]), max(a[0], b[0])))
    got = {
        (row["id_a"], row["id_b"])
        for row in REGISTRY["join_radius_grid"].fn(spark, SF_SMALL).collect()
    }
    assert got == want


def test_stream_topk_equals_batch_topk(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    want = duck.execute(
        'SELECT event_id FROM events ORDER BY "value" DESC, event_id LIMIT 10'
    ).fetchall()
    got = REGISTRY["stream_topk_maintenance"].fn(spark, SF_SMALL).collect()
    assert [r["event_id"] for r in got] == [w[0] for w in want]
    vals = [r["value"] for r in got]
    assert vals == sorted(vals, reverse=True)


def test_littles_law_identity_and_w(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    rows = REGISTRY["orders_littles_law_check"].fn(spark, SF_SMALL).collect()
    assert len(rows) >= 3
    for r in rows:
        # with consistent integral definitions the identity closes exactly
        assert r["littles_ratio"] == pytest.approx(1.0, abs=1e-6)
        # recomposed from round-4 columns: error ~ lambda * 5e-5
        assert r["l_avg_open"] == pytest.approx(
            r["lambda_per_day"] * r["w_clipped_days"], rel=1e-4
        )
        # clipping can only shorten residence
        assert r["w_clipped_days"] <= r["w_naive_days"] + 1e-9


def test_leaderboard_churn_matches_bruteforce(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    rows = duck.execute(
        "SELECT CAST(date_trunc('week', ts) AS DATE), user_id, SUM(\"value\") "
        "FROM events GROUP BY 1, 2"
    ).fetchall()
    byweek = {}
    for wk, uid, v in rows:
        byweek.setdefault(wk, []).append((v, uid))
    tops = {
        wk: {uid for _, uid in sorted(vs, key=lambda p: (-p[0], p[1]))[:20]}
        for wk, vs in byweek.items()
    }
    import datetime as dt

    got = {
        r["week_from"]: r
        for r in REGISTRY["events_leaderboard_churn"].fn(spark, SF_SMALL).collect()
    }
    expect_weeks = {
        wk for wk in tops if (wk + dt.timedelta(days=7)) in tops
    }
    assert set(got) == expect_weeks
    for wk in expect_weeks:
        nxt = wk + dt.timedelta(days=7)
        ret = len(tops[wk] & tops[nxt])
        ent = len(tops[nxt] - tops[wk])
        dro = len(tops[wk] - tops[nxt])
        r = got[wk]
        assert (r["retained"], r["entered"], r["dropped"]) == (ret, ent, dro)
        assert r["jaccard"] == pytest.approx(ret / (ret + ent + dro), abs=1e-3)


def test_lttb_matches_bruteforce(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    rows = duck.execute(
        "SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d, "
        "ROUND(SUM(\"value\"), 6) FROM events GROUP BY 1, 2 ORDER BY 1, 2"
    ).fetchall()
    series = {}
    for et, _, y in rows:
        series.setdefault(et, []).append(y)
    got = {}
    for r in REGISTRY["ts_lttb_downsample"].fn(spark, SF_SMALL).collect():
        got.setdefault(r["event_type"], []).append((r["t"], r["y"]))
    nb, ib = 10, 8
    for et, ys in series.items():
        n = len(ys)
        if n < nb:
            assert et not in got
            continue
        sel = got[et]
        assert len(sel) == nb
        ts = [t for t, _ in sel]
        assert ts[0] == 1 and ts[-1] == n and ts == sorted(ts)
        # independent re-derivation of the walk
        buckets = [[] for _ in range(ib)]
        for t in range(2, n):
            buckets[((t - 2) * ib) // (n - 2)].append(t)
        prev = (1.0, ys[0])
        for b in range(ib):
            if b < ib - 1:
                nxt_idx = buckets[b + 1]
                ax = sum(map(float, nxt_idx)) / len(nxt_idx)
                ay = sum(ys[t - 1] for t in nxt_idx) / len(nxt_idx)
            else:
                ax, ay = float(n), ys[n - 1]
            px, py = prev
            best_t, best_area = None, -1.0
            for t in buckets[b]:
                area = abs((px - ax) * (ys[t - 1] - py) - (px - t) * (ay - py))
                if area > best_area + 1e-9:
                    best_t, best_area = t, area
            # allow exact-tie divergence only (none observed in practice)
            assert ts[b + 1] == best_t
            prev = (float(best_t), ys[best_t - 1])


def test_ppr_matches_bruteforce(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    edges = duck.execute(
        """
        SELECT prev_type, event_type, count(*) FROM (
          SELECT event_type,
                 lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
          FROM events
        ) WHERE prev_type IS NOT NULL GROUP BY 1, 2
        """
    ).fetchall()
    out = {}
    nodes = set()
    for s, dst, w in edges:
        nodes.update((s, dst))
        out.setdefault(s, []).append((dst, float(w)))
    frac = {
        s: [(dst, w / sum(w for _, w in lst)) for dst, w in lst]
        for s, lst in out.items()
    }
    g = float(1 << 30)
    ranks = {n: (1.0 if n == "view" else 0.0) for n in nodes}
    for _ in range(5):
        inb = {n: 0.0 for n in nodes}
        for s, lst in frac.items():
            for dst, fr in lst:
                inb[dst] += ranks[s] * fr
        ranks = {
            n: math.floor(((0.15 if n == "view" else 0.0) + 0.85 * inb[n]) * g + 0.5) / g
            for n in nodes
        }
    got = {
        r["node"]: r["rank"]
        for r in REGISTRY["graph_ppr_single_source"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == nodes
    for n in nodes:
        assert got[n] == pytest.approx(ranks[n], abs=1e-6)


def test_wasserstein_matches_bruteforce(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    rows = duck.execute(
        'SELECT event_type, "value", EXTRACT(day FROM ts) < 16 FROM events'
    ).fetchall()
    series = {}
    for et, v, is_a in rows:
        series.setdefault(et, ([], []))[0 if is_a else 1].append(v)
    got = {
        r["event_type"]: r
        for r in REGISTRY["stats_wasserstein_drift"].fn(spark, SF_SMALL).collect()
    }
    for et, (a, b) in series.items():
        vals = sorted(set(a) | set(b))
        na, nb = len(a), len(b)
        sa, sb = sorted(a), sorted(b)
        import bisect

        w1 = 0.0
        ks = 0.0
        for i in range(len(vals) - 1):
            fa = bisect.bisect_right(sa, vals[i]) / na
            fb = bisect.bisect_right(sb, vals[i]) / nb
            w1 += abs(fa - fb) * (vals[i + 1] - vals[i])
            ks = max(ks, abs(fa - fb))
        r = got[et]
        assert r["w1_distance"] == pytest.approx(w1, abs=1e-4)
        assert r["ks_stat"] == pytest.approx(ks, abs=1e-3)


def test_matryoshka_recall_matches_bruteforce(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    vecs = {
        r[0]: [float(x) for x in r[1]]
        for r in duck.execute("SELECT vec_id, embedding FROM embeddings").fetchall()
    }

    def topk(qid, dims):
        qv = vecs[qid][:dims]
        qn = math.sqrt(sum(x * x for x in qv))
        scored = []
        for cid, cv in vecs.items():
            if cid == qid:
                continue
            c = cv[:dims]
            cn = math.sqrt(sum(x * x for x in c))
            cos = sum(x * y for x, y in zip(qv, c)) / (qn * cn)
            scored.append((-cos, cid))
        scored.sort()
        return {cid for _, cid in scored[:5]}

    got = {
        r["q_id"]: r
        for r in REGISTRY["embed_matryoshka_recall"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(range(20))
    for qid in range(20):
        truth = topk(qid, 64)
        approx = topk(qid, 16)
        hit = len(truth & approx)
        r = got[qid]
        assert r["n_true"] == 5
        assert r["n_hit"] == hit
        assert r["recall"] == pytest.approx(hit / 5, abs=1e-6)


def test_matryoshka_rerank_beats_prefix_only(spark):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    rerank = {
        r["q_id"]: r["recall"]
        for r in REGISTRY["sim_matryoshka_rerank"].fn(spark, SF_SMALL).collect()
    }
    prefix = {
        r["q_id"]: r["recall"]
        for r in REGISTRY["embed_matryoshka_recall"].fn(spark, SF_SMALL).collect()
    }
    assert set(rerank) == set(prefix)
    # reranking top-20 candidates full-width can only find MORE of the
    # true top-5 than taking the prefix tier's top-5 directly
    assert all(rerank[q] >= prefix[q] - 1e-9 for q in rerank)
    assert sum(rerank.values()) >= sum(prefix.values())


def test_mcnemar_matches_bruteforce(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    rows = duck.execute(
        "SELECT user_id, SUM(CASE WHEN EXTRACT(day FROM ts) < 16 THEN 1 ELSE 0 END), "
        "SUM(CASE WHEN EXTRACT(day FROM ts) >= 16 THEN 1 ELSE 0 END) "
        "FROM events GROUP BY user_id"
    ).fetchall()
    n1 = [float(r[1]) for r in rows]
    n2 = [float(r[2]) for r in rows]
    m1, m2 = _median(n1), _median(n2)
    b = sum(1 for a, bb in zip(n1, n2) if a > m1 and bb <= m2)
    c = sum(1 for a, bb in zip(n1, n2) if a <= m1 and bb > m2)
    r = REGISTRY["stats_mcnemar"].fn(spark, SF_SMALL).collect()[0]
    assert r["n_users"] == len(rows)
    assert (r["high_to_low"], r["low_to_high"]) == (b, c)
    assert r["mcnemar_chi2"] == pytest.approx((b - c) ** 2 / (b + c), abs=1e-3)
    assert r["mcnemar_cc"] == pytest.approx(
        (abs(b - c) - 1) ** 2 / (b + c), abs=1e-3
    )


def test_m4_matches_bruteforce(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    rows = duck.execute(
        'SELECT event_type, "value", ts, event_id, EXTRACT(day FROM ts) FROM events'
    ).fetchall()
    cells = {}
    for et, v, ts, eid, day in rows:
        b = min(9, (int(day) - 1) // 3)
        cells.setdefault((et, b), []).append((ts, eid, v))
    got = {
        (r["event_type"], r["bucket"]): r
        for r in REGISTRY["ts_downsample_m4"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(cells)
    for key, pts in cells.items():
        pts.sort()
        vs = [v for _, _, v in pts]
        r = got[key]
        assert r["n"] == len(pts)
        assert r["v_min"] == pytest.approx(min(vs), abs=1e-3)
        assert r["v_max"] == pytest.approx(max(vs), abs=1e-3)
        assert r["v_first"] == pytest.approx(pts[0][2], abs=1e-3)
        assert r["v_last"] == pytest.approx(pts[-1][2], abs=1e-3)


def test_kappa_matches_bruteforce(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    # confusion marginals from the already-verified langid query
    conf = REGISTRY["text_langid"].fn(spark, SF_SMALL).collect()
    n = sum(r["n"] for r in conf)
    pa = sum(r["n"] for r in conf if r["predicted"] == "en")
    pb = sum(r["n"] for r in conf if r["lang"] == "en")
    agree = sum(
        r["n"]
        for r in conf
        if (r["predicted"] == "en") == (r["lang"] == "en")
    )
    po = agree / n
    pe = (pa * pb + (n - pa) * (n - pb)) / (n * n)
    r = REGISTRY["eval_cohens_kappa"].fn(spark, SF_SMALL).collect()[0]
    assert r["n_docs"] == n
    assert r["p_observed"] == pytest.approx(po, abs=1e-3)
    assert r["p_expected"] == pytest.approx(pe, abs=1e-3)
    assert r["kappa"] == pytest.approx((po - pe) / (1 - pe), abs=2e-3)


def test_rake_matches_bruteforce(spark, duck):
    from collections import Counter, defaultdict

    from testlog_etl_spark.operators.textstats import STOPWORDS
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    stops = set(STOPWORDS["en"])
    docs = duck.execute("SELECT doc_id, text FROM documents").fetchall()
    phrases = []  # list of token-lists
    for _, text in docs:
        run = []
        for t in (text or "").strip().lower().split():
            if t in stops:
                if run:
                    phrases.append(run)
                run = []
            else:
                run.append(t)
        if run:
            phrases.append(run)
    freq = Counter()
    deg = Counter()
    for p in phrases:
        for t in p:
            freq[t] += 1
            deg[t] += len(p)
    score = defaultdict(float)
    count = Counter()
    for p in phrases:
        txt = " ".join(p)
        count[txt] += 1
        score[txt] = sum(deg[t] / freq[t] for t in p)
    top = sorted(score.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    got = REGISTRY["text_keyphrase_rake"].fn(spark, SF_SMALL).collect()
    assert len(got) == 15
    for row, (txt, sc) in zip(got, top):
        assert row["phrase"] == txt
        assert row["n_occurrences"] == count[txt]
        assert row["rake_score"] == pytest.approx(sc, abs=1e-3)


def test_absorbing_hit_matches_bruteforce(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    edges = duck.execute(
        """
        SELECT prev_type, event_type, count(*) FROM (
          SELECT event_type,
                 lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
          FROM events
        ) WHERE prev_type IS NOT NULL GROUP BY 1, 2
        """
    ).fetchall()
    out = {}
    nodes = set()
    for s, d, w in edges:
        nodes.update((s, d))
        out.setdefault(s, []).append((d, float(w)))
    frac = {
        s: [(d, w / sum(w for _, w in lst)) for d, w in lst]
        for s, lst in out.items()
    }
    g = float(1 << 30)
    p = {n: (1.0 if n == "purchase" else 0.0) for n in nodes}
    for _ in range(6):
        np_ = {}
        for n in nodes:
            if n == "purchase":
                np_[n] = 1.0
            else:
                acc = sum(fr * p[d] for d, fr in frac.get(n, []))
                np_[n] = math.floor(acc * g + 0.5) / g
        p = np_
    got = {
        r["node"]: r["p_hit"]
        for r in REGISTRY["graph_absorbing_hit_probability"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == nodes
    for n in nodes:
        assert got[n] == pytest.approx(p[n], abs=1e-6)
    # monotone sanity: every probability in [0, 1], target pinned at 1
    assert got["purchase"] == 1.0
    assert all(0.0 <= v <= 1.0 for v in got.values())


def test_lorenz_matches_bruteforce(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    rows = duck.execute(
        "SELECT o_custkey, SUM(o_totalprice) FROM orders GROUP BY 1"
    ).fetchall()
    xs = sorted((x, cust) for cust, x in rows)
    n = len(xs)
    deciles = {}
    for i, (x, _) in enumerate(xs):
        d = (i * 10) // n
        cnt, rev = deciles.get(d, (0, 0.0))
        deciles[d] = (cnt + 1, rev + x)
    tot = sum(rev for _, rev in deciles.values())
    got = {
        r["decile"]: r
        for r in REGISTRY["agg_lorenz_deciles"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(deciles)
    cum = 0.0
    for d in sorted(deciles):
        cnt, rev = deciles[d]
        cum += rev
        r = got[d]
        assert r["n_customers"] == cnt
        assert r["revenue"] == pytest.approx(rev, abs=0.02)
        assert r["rev_share"] == pytest.approx(rev / tot, abs=1e-5)
        assert r["cum_share"] == pytest.approx(cum / tot, abs=1e-5)
    # Lorenz invariants: shares ascend by decile, cum ends at 1
    shares = [got[d]["rev_share"] for d in sorted(got)]
    assert shares == sorted(shares)
    assert got[max(got)]["cum_share"] == pytest.approx(1.0, abs=1e-6)


def test_pattern_profile_matches_bruteforce(spark, duck):
    import re
    from collections import Counter

    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    cols = [
        ("customer.c_name", "SELECT c_name FROM customer"),
        ("orders.o_orderpriority", "SELECT o_orderpriority FROM orders"),
        ("part.p_type", "SELECT p_type FROM part"),
        ("events.props", "SELECT props FROM events"),
    ]
    got = {}
    for r in REGISTRY["dq_value_pattern_profile"].fn(spark, SF_SMALL).collect():
        got.setdefault(r["col"], []).append(r)
    for label, sql in cols:
        vals = [r[0] for r in duck.execute(sql).fetchall()]
        masks = Counter(
            re.sub(r"[0-9]", "9", re.sub(r"[a-z]", "a", re.sub(r"[A-Z]", "A", v)))
            for v in vals
        )
        top = sorted(masks.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        rows = got[label]
        assert len(rows) == min(3, len(masks))
        for row, (mask, cnt) in zip(rows, top):
            assert row["mask"] == mask and row["n"] == cnt
            assert row["share"] == pytest.approx(cnt / len(vals), abs=1e-3)


def test_native_unpivot_shape(spark):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    rows = REGISTRY["agg_native_unpivot"].fn(spark, SF_SMALL).collect()
    prios = {r["prio"] for r in rows}
    assert len(rows) == 3 * len(prios)
    for p in prios:
        ms = {r["metric"]: r["val"] for r in rows if r["prio"] == p}
        assert set(ms) == {"n_orders", "revenue", "avg_ticket"}
        assert ms["avg_ticket"] == pytest.approx(
            ms["revenue"] / ms["n_orders"], rel=1e-4
        )


def test_partial_corr_matches_bruteforce(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    rows = duck.execute(
        'SELECT event_type, "value", EXTRACT(hour FROM ts), EXTRACT(day FROM ts) FROM events'
    ).fetchall()
    by = {}
    for et, x, h, d in rows:
        by.setdefault(et, []).append((x, float(h), float(d)))
    got = {
        r["event_type"]: r
        for r in REGISTRY["stats_partial_correlation"].fn(spark, SF_SMALL).collect()
    }

    def corr(a, b):
        n = len(a)
        ma, mb = sum(a) / n, sum(b) / n
        cov = sum((p - ma) * (q - mb) for p, q in zip(a, b))
        sa = math.sqrt(sum((p - ma) ** 2 for p in a))
        sb = math.sqrt(sum((q - mb) ** 2 for q in b))
        return cov / (sa * sb)

    for et, pts in by.items():
        xs, ys, zs = zip(*pts)
        rxy, rxz, rzy = corr(xs, ys), corr(xs, zs), corr(zs, ys)
        part = (rxy - rxz * rzy) / math.sqrt((1 - rxz**2) * (1 - rzy**2))
        r = got[et]
        assert r["n"] == len(pts)
        assert r["r_xy"] == pytest.approx(rxy, abs=1e-3)
        assert r["r_xy_given_z"] == pytest.approx(part, abs=1e-3)


def test_cramers_v_matches_bruteforce(spark, duck):
    from collections import Counter

    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    cells = Counter(
        (lang, src)
        for lang, src in duck.execute("SELECT lang, source FROM documents").fetchall()
    )
    n = sum(cells.values())
    rows = Counter()
    cols = Counter()
    for (lang, src), c in cells.items():
        rows[lang] += c
        cols[src] += c
    chi2 = sum(
        (c - rows[lang] * cols[src] / n) ** 2 / (rows[lang] * cols[src] / n)
        for (lang, src), c in cells.items()
    )
    md = min(len(rows) - 1, len(cols) - 1)
    r = REGISTRY["stats_cramers_v"].fn(spark, SF_SMALL).collect()[0]
    assert r["n"] == n and r["min_dim"] == md
    assert r["chi2"] == pytest.approx(chi2, abs=1e-3)
    assert r["cramers_v"] == pytest.approx(math.sqrt(chi2 / (n * md)), abs=1e-4)


def test_pacf_matches_yule_walker_solve(spark, duck):
    import numpy as np

    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    rows = duck.execute(
        "SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d, count(*) "
        "FROM events GROUP BY 1, 2 ORDER BY 1, 2"
    ).fetchall()
    series = {}
    for et, _, n in rows:
        series.setdefault(et, []).append(float(n))
    got = {}
    for r in REGISTRY["ts_pacf_durbin_levinson"].fn(spark, SF_SMALL).collect():
        got[(r["event_type"], r["lag"])] = r
    for et, xs in series.items():
        n = len(xs)
        mu = sum(xs) / n
        den = sum((x - mu) ** 2 for x in xs)
        acf = [
            sum((xs[t] - mu) * (xs[t - k] - mu) for t in range(k, n)) / den
            for k in range(0, 8)
        ]
        # INDEPENDENT method: PACF(k) = last coeff of the Yule-Walker
        # Toeplitz solve (numpy), not another Durbin-Levinson pass
        for k in range(1, 8):
            R = np.array([[acf[abs(i - j)] for j in range(k)] for i in range(k)])
            rhs = np.array(acf[1 : k + 1])
            phi = np.linalg.solve(R, rhs)
            row = got[(et, k)]
            assert row["acf"] == pytest.approx(acf[k], abs=1e-3)
            assert row["pacf"] == pytest.approx(phi[-1], abs=1e-3)


def test_durbin_watson_matches_bruteforce(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    rows = duck.execute(
        "SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d, count(*) "
        "FROM events GROUP BY 1, 2 ORDER BY 1, 2"
    ).fetchall()
    series = {}
    for et, _, y in rows:
        series.setdefault(et, []).append(float(y))
    got = {
        r["event_type"]: r
        for r in REGISTRY["stats_durbin_watson"].fn(spark, SF_SMALL).collect()
    }
    for et, ys in series.items():
        n = len(ys)
        ts = list(range(1, n + 1))
        mt, my = sum(ts) / n, sum(ys) / n
        b = sum((t - mt) * (y - my) for t, y in zip(ts, ys)) / sum(
            (t - mt) ** 2 for t in ts
        )
        a = my - b * mt
        e = [y - (a + b * t) for t, y in zip(ts, ys)]
        dw = sum((e[i] - e[i - 1]) ** 2 for i in range(1, n)) / sum(x * x for x in e)
        r = got[et]
        assert r["n_days"] == n
        assert r["durbin_watson"] == pytest.approx(dw, abs=1e-3)
        # DW ~ 2 (1 - acf1): sanity band
        assert 0.0 <= r["durbin_watson"] <= 4.0


def test_modularity_consistent_with_lpa(spark):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    lpa = {
        r["node"]: r["community"]
        for r in REGISTRY["graph_label_propagation"].fn(spark, SF_SMALL).collect()
    }
    rows = REGISTRY["graph_modularity_lpa"].fn(spark, SF_SMALL).collect()
    assert {r["community"] for r in rows} == set(lpa.values())
    tot_deg = sum(r["total_degree"] for r in rows)
    tot_intra = sum(r["intra_edges"] for r in rows)
    # handshake: community degrees sum to 2m; intra edges <= m
    assert tot_deg % 2 == 0
    m = tot_deg // 2
    assert tot_intra <= m
    q = sum(r["q_contrib"] for r in rows)
    assert -0.5 <= q <= 1.0


def test_markov_entropy_matches_bruteforce(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    edges = duck.execute(
        """
        SELECT prev_type, event_type, count(*) FROM (
          SELECT event_type,
                 lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
          FROM events
        ) WHERE prev_type IS NOT NULL GROUP BY 1, 2
        """
    ).fetchall()
    out = {}
    tot = 0.0
    for s, d, w in edges:
        out.setdefault(s, {})[d] = float(w)
        tot += w
    got = {
        r["state"]: r
        for r in REGISTRY["graph_markov_entropy_rate"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(out)
    for s, dsts in out.items():
        ow = sum(dsts.values())
        h = -sum((w / ow) * math.log2(w / ow) for w in dsts.values())
        r = got[s]
        assert r["visit_share"] == pytest.approx(ow / tot, abs=1e-4)
        assert r["h_next_bits"] == pytest.approx(h, abs=1e-3)
        assert r["rate_contrib"] == pytest.approx((ow / tot) * h, abs=1e-4)


def test_hurst_matches_bruteforce(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    rows = duck.execute(
        "SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d, "
        "ROUND(SUM(\"value\"), 6) FROM events GROUP BY 1, 2 ORDER BY 1, 2"
    ).fetchall()
    series = {}
    for et, _, x in rows:
        series.setdefault(et, []).append(x)
    got = {
        r["event_type"]: r
        for r in REGISTRY["stats_hurst_exponent"].fn(spark, SF_SMALL).collect()
    }
    for et, xs in series.items():
        pts = []
        for w in (5, 10, 15, 30):
            rss = []
            for b in range(len(xs) // w):
                blk = xs[b * w : (b + 1) * w]
                mu = sum(blk) / w
                cum, mx, mn = 0.0, -1e18, 1e18
                for v in blk:
                    cum += v - mu
                    mx, mn = max(mx, cum), min(mn, cum)
                sd = math.sqrt(sum((v - mu) ** 2 for v in blk) / w)
                if sd > 0:
                    rss.append((mx - mn) / round(sd, 10))
            if rss:
                pts.append((math.log(w), math.log(sum(rss) / len(rss))))
        n = len(pts)
        mx_ = sum(p[0] for p in pts) / n
        my_ = sum(p[1] for p in pts) / n
        h = sum((a - mx_) * (b - my_) for a, b in pts) / sum(
            (a - mx_) ** 2 for a, _ in pts
        )
        r = got[et]
        assert r["n_scales"] == n
        assert r["hurst_h"] == pytest.approx(h, abs=1e-3)


def test_variance_ratio_matches_bruteforce(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    rows = duck.execute(
        "SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d, "
        "ROUND(SUM(\"value\"), 6) FROM events GROUP BY 1, 2 ORDER BY 1, 2"
    ).fetchall()
    series = {}
    for et, _, x in rows:
        series.setdefault(et, []).append(x)

    def var_pop(v):
        m = sum(v) / len(v)
        return sum((x - m) ** 2 for x in v) / len(v)

    got = {
        r["event_type"]: r
        for r in REGISTRY["ts_variance_ratio"].fn(spark, SF_SMALL).collect()
    }
    for et, xs in series.items():
        diffs = {q: [xs[i] - xs[i - q] for i in range(q, len(xs))] for q in (1, 2, 4, 7)}
        r = got[et]
        assert r["n_diffs"] == len(diffs[1])
        for q in (2, 4, 7):
            want = var_pop(diffs[q]) / (q * var_pop(diffs[1]))
            assert r[f"vr_{q}"] == pytest.approx(want, abs=1e-3)


def test_share_of_parent_sums(spark):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    rows = REGISTRY["agg_share_of_parent"].fn(spark, SF_SMALL).collect()
    by_region = {}
    for r in rows:
        by_region.setdefault(r["region"], []).append(r)
    region_shares = {}
    for reg, rs in by_region.items():
        # nation shares within a region sum to 1
        assert sum(r["share_of_region"] for r in rs) == pytest.approx(1.0, abs=1e-3)
        shares = {r["region_share_of_total"] for r in rs}
        assert len(shares) == 1
        region_shares[reg] = next(iter(shares))
    assert sum(region_shares.values()) == pytest.approx(1.0, abs=1e-3)


def test_bot_score_matches_bruteforce(spark, duck):
    from collections import Counter

    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    rows = duck.execute(
        "SELECT user_id, epoch_us(ts), CAST(ts AS DATE), event_type FROM events "
        "ORDER BY user_id, ts, event_id"
    ).fetchall()
    per = {}
    for uid, us, day, et in rows:
        per.setdefault(uid, []).append((us, day, et))
    sig = {}
    for uid, evs in per.items():
        n = len(evs)
        days = (max(d for _, d, _ in evs) - min(d for _, d, _ in evs)).days + 1
        rate = n / max(days, 1)
        gaps = [(evs[i][0] - evs[i - 1][0]) / 1e6 for i in range(1, n)]
        if gaps:
            mg = sum(gaps) / len(gaps)
            sd = math.sqrt(sum((g - mg) ** 2 for g in gaps) / len(gaps))
            cv = sd / mg if mg > 0 else 0.0
        else:
            cv = 0.0
        cnt = Counter(et for _, _, et in evs)
        ps = [c / n for c in cnt.values()]
        ent = -sum(p * math.log2(p) for p in ps)
        sig[uid] = (
            round(rate, 8),
            round(1 / (1 + cv), 8),
            round(1 - ent / math.log2(5), 8),
            n,
        )
    r0, r1 = min(s[0] for s in sig.values()), max(s[0] for s in sig.values())
    g0, g1 = min(s[1] for s in sig.values()), max(s[1] for s in sig.values())
    e0, e1 = min(s[2] for s in sig.values()), max(s[2] for s in sig.values())
    scores = {
        uid: ((r - r0) / (r1 - r0) + (g - g0) / (g1 - g0) + (e - e0) / (e1 - e0)) / 3
        for uid, (r, g, e, _) in sig.items()
    }
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = REGISTRY["events_bot_score"].fn(spark, SF_SMALL).collect()
    assert [r["user_id"] for r in got] == [u for u, _ in want]
    for row, (uid, sc) in zip(got, want):
        assert row["n_events"] == sig[uid][3]
        assert row["bot_score"] == pytest.approx(sc, abs=1e-5)


def test_reconciliation_ledger_consistency(spark, duck):
    import json

    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    rows = duck.execute(
        'SELECT props, "value", user_id, ts FROM events'
    ).fetchall()
    n_raw = len(rows)
    typed = [r for r in rows if isinstance(json.loads(r[0]).get("k"), int)]
    valued = [r for r in typed if r[1] > 0]
    final = len({(r[2], r[3]) for r in valued})
    got = {r["stage"]: r for r in REGISTRY["dq_pipeline_reconciliation"].fn(spark, SF_SMALL).collect()}
    assert got["raw"]["rows_kept"] == n_raw
    assert got["typed"]["rows_kept"] == len(typed)
    assert got["valued"]["rows_kept"] == len(valued)
    assert got["deduped"]["rows_kept"] == final
    # ledger closes: kept[k] + dropped[k] == kept[k-1]
    order = ["raw", "typed", "valued", "deduped"]
    for prev, cur in zip(order, order[1:]):
        assert got[cur]["rows_kept"] + got[cur]["rows_dropped"] == got[prev]["rows_kept"]


def test_elasticity_matches_bruteforce(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    rows = duck.execute(
        "SELECT l_returnflag, l_discount, l_quantity FROM lineitem WHERE l_quantity > 0"
    ).fetchall()
    by = {}
    for flag, x, q in rows:
        by.setdefault(flag, []).append((x, math.log(q)))
    got = {
        r["flag"]: r
        for r in REGISTRY["orders_discount_elasticity"].fn(spark, SF_SMALL).collect()
    }
    for flag, pts in by.items():
        xs, ys = zip(*pts)
        n = len(pts)
        mx, my = sum(xs) / n, sum(ys) / n
        cov = sum((a - mx) * (b - my) for a, b in pts) / n
        vx = sum((a - mx) ** 2 for a in xs) / n
        vy = sum((b - my) ** 2 for b in ys) / n
        b_ = cov / vx
        r = got[flag]
        assert r["n"] == n
        assert r["semi_elasticity"] == pytest.approx(b_, abs=1e-3)
        assert r["intercept"] == pytest.approx(my - b_ * mx, abs=1e-3)
        assert r["r2"] == pytest.approx(cov * cov / (vx * vy), abs=1e-4)


def test_burstiness_matches_bruteforce(spark, duck):
    from collections import Counter

    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    rows = duck.execute("SELECT doc_id, text FROM documents").fetchall()
    nd = len(rows)
    tf = {}
    for doc_id, text in rows:
        for t, c in Counter((text or "").strip().lower().split()).items():
            tf.setdefault(t, {})[doc_id] = c
    stats = {
        t: (len(d), sum(d.values()), sum(v * v for v in d.values()))
        for t, d in tf.items()
    }
    top = sorted(stats.items(), key=lambda kv: (-kv[1][0], kv[0]))[:50]
    got = {
        r["term"]: r
        for r in REGISTRY["text_term_burstiness"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == {t for t, _ in top}
    for t, (df, s1, s2) in top:
        mean = s1 / nd
        disp = (s2 / nd - mean * mean) / mean
        r = got[t]
        assert r["df"] == df
        assert r["mean_tf"] == pytest.approx(mean, abs=1e-4)
        assert r["dispersion"] == pytest.approx(disp, abs=1e-3)


def test_streak_histogram_matches_bruteforce(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    rows = duck.execute(
        "SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) FROM events"
    ).fetchall()
    per = {}
    for uid, d in rows:
        per.setdefault(uid, []).append(d)
    hist = {}
    for uid, days in per.items():
        days.sort()
        run = 1
        for i in range(1, len(days) + 1):
            if i < len(days) and (days[i] - days[i - 1]).days == 1:
                run += 1
            else:
                n, us = hist.get(run, (0, set()))
                us = us | {uid}
                hist[run] = (n + 1, us)
                run = 1
    got = {
        r["streak_days"]: r
        for r in REGISTRY["events_streak_histogram"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(hist)
    for length, (n, users) in hist.items():
        assert got[length]["n_streaks"] == n
        assert got[length]["n_users"] == len(users)


def test_abc_migration_consistent(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    rows = REGISTRY["orders_abc_migration"].fn(spark, SF_SMALL).collect()
    total = sum(r["n_customers"] for r in rows)

    def classes(year):
        revs = duck.execute(
            f"SELECT o_custkey, ROUND(SUM(o_totalprice) * 100, 0) FROM orders "
            f"WHERE EXTRACT(year FROM o_orderdate) = {year} GROUP BY 1"
        ).fetchall()
        revs.sort(key=lambda r: (-r[1], r[0]))
        tot = sum(r[1] for r in revs)
        out, cum = {}, 0.0
        for cust, rv in revs:
            cum += rv
            out[cust] = "A" if cum / tot <= 0.80 else ("B" if cum / tot <= 0.95 else "C")
        return out
    c95, c96 = classes(1995), classes(1996)
    assert total == len(set(c95) | set(c96))
    want = {}
    for cust in set(c95) | set(c96):
        key = (c95.get(cust, "N"), c96.get(cust, "N"))
        want[key] = want.get(key, 0) + 1
    got = {(r["class_1995"], r["class_1996"]): r["n_customers"] for r in rows}
    assert got == want


def test_topk_filtered_matches_bruteforce(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    vecs = {
        r[0]: ([float(x) for x in r[1]], r[2])
        for r in duck.execute(
            "SELECT vec_id, embedding, label FROM embeddings"
        ).fetchall()
    }
    got = {}
    for r in REGISTRY["sim_topk_filtered"].fn(spark, SF_SMALL).collect():
        got.setdefault(r["q_id"], []).append(r["c_id"])
    for qid in range(20):
        qv, _ = vecs[qid]
        qn = math.sqrt(sum(x * x for x in qv))
        scored = sorted(
            (
                -sum(a * b for a, b in zip(qv, cv)) / (qn * math.sqrt(sum(x * x for x in cv))),
                cid,
            )
            for cid, (cv, lbl) in vecs.items()
            if lbl == 3 and cid != qid
        )
        want = sorted(cid for _, cid in scored[:5])
        assert sorted(got[qid]) == want
        # every result carries the filter label
        assert all(vecs[c][1] == 3 for c in got[qid])


def test_isotropy_consistent_with_variance_profile(spark):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    prof = REGISTRY["embed_dim_variance_profile"].fn(spark, SF_SMALL).collect()
    vs = [r["var_pop"] for r in prof]
    r = REGISTRY["embed_isotropy_score"].fn(spark, SF_SMALL).collect()[0]
    pr = sum(vs) ** 2 / sum(v * v for v in vs)
    assert r["n_dims"] == len(vs)
    # profile vars are round-6; allow the propagated wobble
    assert r["participation_ratio"] == pytest.approx(pr, abs=5e-3)
    assert r["isotropy"] == pytest.approx(pr / len(vs), abs=1e-4)
    assert 1.0 <= r["participation_ratio"] <= r["n_dims"]
    assert r["top_dim_share"] == pytest.approx(max(vs) / sum(vs), abs=1e-4)


def test_srm_check_matches_bruteforce(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    uids = [r[0] for r in duck.execute("SELECT DISTINCT user_id FROM events").fetchall()]
    n1 = sum(1 for u in uids if u % 2 == 1)
    n0 = len(uids) - n1
    e = len(uids) / 2
    chi2 = (n1 - e) ** 2 / e + (n0 - e) ** 2 / e
    r = REGISTRY["stats_ab_srm_check"].fn(spark, SF_SMALL).collect()[0]
    assert (r["n_treat"], r["n_ctrl"]) == (n1, n0)
    assert r["srm_chi2"] == pytest.approx(chi2, abs=1e-4)
    assert r["p_value"] == pytest.approx(math.erfc(math.sqrt(chi2 / 2)), abs=2e-4)
    assert r["srm_alarm"] == (r["p_value"] < 0.001)


def test_chow_matches_bruteforce(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    rows = duck.execute(
        "SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d, "
        "MAX(CASE WHEN EXTRACT(day FROM ts) >= 16 THEN 1 ELSE 0 END), count(*) "
        "FROM events GROUP BY 1, 2 ORDER BY 1, 2"
    ).fetchall()
    series = {}
    for et, _, seg, y in rows:
        series.setdefault(et, []).append((seg, float(y)))

    def ssr(pts):
        n = len(pts)
        ts_, ys = zip(*pts)
        mt, my = sum(ts_) / n, sum(ys) / n
        vt = sum((t - mt) ** 2 for t in ts_) / n
        vy = sum((y - my) ** 2 for y in ys) / n
        cov = sum((t - mt) * (y - my) for t, y in zip(ts_, ys)) / n
        b = round(cov / vt, 10)
        return n * (vy - b * b * vt), b, my

    got = {
        r["event_type"]: r
        for r in REGISTRY["stats_chow_break_test"].fn(spark, SF_SMALL).collect()
    }
    for et, pts in series.items():
        idx = [(float(i + 1), y) for i, (_, y) in enumerate(pts)]
        pre = [(t, y) for (t, y), (s, _) in zip(idx, pts) if s == 0]
        post = [(t, y) for (t, y), (s, _) in zip(idx, pts) if s == 1]
        sp, _, _ = ssr(idx)
        s1, b1, m1 = ssr(pre)
        s2, b2, m2 = ssr(post)
        n = len(idx)
        f = ((sp - s1 - s2) / 2) / ((s1 + s2) / (n - 4))
        r = got[et]
        assert r["n_days"] == n
        assert r["level_delta"] == pytest.approx(m2 - m1, abs=1e-3)
        assert r["slope_delta"] == pytest.approx(b2 - b1, abs=1e-4)
        assert r["chow_f"] == pytest.approx(f, abs=1e-2)


def test_weighted_percentile_matches_bruteforce(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    rows = duck.execute(
        "SELECT l_returnflag, l_extendedprice, CAST(l_quantity AS BIGINT) FROM lineitem"
    ).fetchall()
    per = {}
    for flag, val, w in rows:
        per.setdefault(flag, {}).setdefault(val, 0)
        per[flag][val] += w
    got = {
        r["flag"]: r
        for r in REGISTRY["agg_weighted_percentile"].fn(spark, SF_SMALL).collect()
    }
    for flag, vw in per.items():
        tw = sum(vw.values())
        cum = 0
        want = {}
        for val in sorted(vw):
            cum += vw[val]
            for name, num, den in (("wp25", 1, 4), ("wp50", 1, 2), ("wp90", 9, 10)):
                if name not in want and cum * den >= tw * num:
                    want[name] = val
        r = got[flag]
        for name in ("wp25", "wp50", "wp90"):
            assert r[name] == want[name]


def test_mde_matches_bruteforce(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    rows = duck.execute(
        'SELECT event_type, user_id, AVG("value") FROM events GROUP BY 1, 2'
    ).fetchall()
    per = {}
    for et, uid, m in rows:
        per.setdefault(et, []).append((uid, m))
    got = {
        r["event_type"]: r
        for r in REGISTRY["events_mde_power"].fn(spark, SF_SMALL).collect()
    }
    for et, us in per.items():
        ms = [m for _, m in us]
        n = len(ms)
        mean = sum(ms) / n
        v = sum((m - mean) ** 2 for m in ms) / (n - 1)
        n1 = sum(1 for u, _ in us if u % 2 == 1)
        n0 = n - n1
        mc = sum(m for u, m in us if u % 2 == 0) / n0
        mde = (1.959964 + 0.841621) * math.sqrt(v * (1 / n1 + 1 / n0))
        r = got[et]
        assert (r["n_treat"], r["n_ctrl"]) == (n1, n0)
        assert r["mde_abs"] == pytest.approx(mde, abs=1e-3)
        assert r["mde_rel"] == pytest.approx(mde / mc, abs=1e-4)


def test_granger_matches_bruteforce(spark, duck):
    import numpy as np

    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    rows = duck.execute(
        "SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d, count(*) "
        "FROM events GROUP BY 1, 2 ORDER BY 1, 2"
    ).fetchall()
    series = {}
    for et, day, n in rows:
        series.setdefault(et, {})[day] = float(n)
    got = {
        (r["y_type"], r["x_type"]): r
        for r in REGISTRY["stats_granger_lite"].fn(spark, SF_SMALL).collect()
    }
    types = sorted(series)
    for yt in types:
        for xt in types:
            if xt == yt:
                continue
            days = sorted(set(series[yt]) & set(series[xt]))
            pts = []
            for i, day in enumerate(days):
                if i == 0:
                    continue
                prev = days[i - 1]
                pts.append(
                    (
                        series[yt][day],
                        round(series[yt][prev], 6),
                        round(series[xt][prev], 6),
                    )
                )
            ys = np.array([p[0] for p in pts])
            yl = np.array([p[1] for p in pts])
            xl = np.array([p[2] for p in pts])
            n = len(pts)
            # restricted: OLS y ~ 1 + yl; unrestricted adds xl (numpy lstsq
            # -- an INDEPENDENT solver, not our determinant formula)
            Xr = np.column_stack([np.ones(n), yl])
            Xu = np.column_stack([np.ones(n), yl, xl])
            br, *_ = np.linalg.lstsq(Xr, ys, rcond=None)
            bu, *_ = np.linalg.lstsq(Xu, ys, rcond=None)
            ssr_r = float(((ys - Xr @ br) ** 2).sum())
            ssr_u = float(((ys - Xu @ bu) ** 2).sum())
            f = (ssr_r - ssr_u) / (ssr_u / (n - 3))
            r = got[(yt, xt)]
            assert r["n_days"] == n
            assert r["granger_f"] == pytest.approx(f, abs=5e-3)


def test_forecast_backtest_matches_bruteforce(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    rows = duck.execute(
        "SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d, "
        "ROUND(SUM(\"value\"), 6), MAX(EXTRACT(day FROM ts)) "
        "FROM events GROUP BY 1, 2 ORDER BY 1, 2"
    ).fetchall()
    series = {}
    for et, _, y, dom in rows:
        series.setdefault(et, []).append((y, int(dom)))
    got = {
        r["event_type"]: r
        for r in REGISTRY["ts_forecast_backtest"].fn(spark, SF_SMALL).collect()
    }
    for et, pts in series.items():
        ys = [y for y, _ in pts]
        test = [
            (ys[i], ys[i - 7], ys[i - 1])
            for i in range(7, len(ys))
            if pts[i][1] >= 17
        ]
        mae_s = sum(abs(y - fs) for y, fs, _ in test) / len(test)
        mae_l = sum(abs(y - fl) for y, _, fl in test) / len(test)
        r = got[et]
        assert r["n_days"] == len(test)
        assert r["mae_seasonal"] == pytest.approx(mae_s, abs=1e-3)
        assert r["mae_locf"] == pytest.approx(mae_l, abs=1e-3)
        assert r["winner"] == ("seasonal_naive" if mae_s <= mae_l else "locf")


def test_categorical_drift_matches_bruteforce(spark, duck):
    import json

    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    rows = duck.execute(
        "SELECT event_type, props, EXTRACT(day FROM ts) < 16 FROM events"
    ).fetchall()
    counts = {}
    for et, props, first in rows:
        for col, val in (
            ("event_type", et),
            ("props_k_decile", str(json.loads(props)["k"] // 10)),
        ):
            a, b = counts.get((col, val), (0, 0))
            counts[(col, val)] = (a + (1 if first else 0), b + (0 if first else 1))
    got = {
        (r["col"], r["val"]): r
        for r in REGISTRY["dq_categorical_drift_new_values"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(counts)
    for key, (nf, ns) in counts.items():
        r = got[key]
        assert (r["n_first"], r["n_second"]) == (nf, ns)
        want = "new" if nf == 0 else ("disappeared" if ns == 0 else "stable")
        assert r["status"] == want


def test_lsh_advisor_matches_bruteforce(spark, duck):
    from collections import Counter

    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    rows = duck.execute(
        "SELECT doc_id, text FROM documents WHERE doc_id < 300"
    ).fetchall()
    toks = {d: set((t or "").strip().lower().split()) for d, t in rows}
    ids = sorted(toks)
    sims = []
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(toks[a] & toks[b])
            if inter:
                sims.append(inter / len(toks[a] | toks[b]))
    got = {
        r["bands"]: r
        for r in REGISTRY["dedup_lsh_parameter_advisor"].fn(spark, SF_SMALL).collect()
    }
    for b, rr in ((64, 2), (32, 4), (16, 8), (8, 16)):
        exp = sum(1 - (1 - s**rr) ** b for s in sims)
        r = got[b]
        assert r["rows_per_band"] == rr
        assert r["overlapping_pairs"] == len(sims)
        assert r["s50_threshold"] == pytest.approx((1 / b) ** (1 / rr), abs=1e-4)
        assert r["expected_candidates"] == pytest.approx(exp, abs=0.05)
    # monotone: more, shorter bands catch more pairs
    assert got[64]["expected_candidates"] >= got[8]["expected_candidates"]


@pytest.mark.slow
def test_hits_matches_bruteforce(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    edges = duck.execute(
        """
        SELECT prev_type, event_type, count(*) FROM (
          SELECT event_type,
                 lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
          FROM events
        ) WHERE prev_type IS NOT NULL GROUP BY 1, 2
        """
    ).fetchall()
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    g = float(1 << 30)
    snap = lambda x: math.floor(x * g + 0.5) / g  # noqa: E731
    h = {n: 1.0 for n in nodes}
    a = {}
    for _ in range(5):
        av = {n: 0.0 for n in nodes}
        for s, d, w in edges:
            av[d] += h[s] * w
        tot = sum(av.values())
        a = {n: snap(v / tot) for n, v in av.items()}
        hv = {n: 0.0 for n in nodes}
        for s, d, w in edges:
            hv[s] += a[d] * w
        tot = sum(hv.values())
        h = {n: snap(v / tot) for n, v in hv.items()}
    got = {
        r["node"]: r
        for r in REGISTRY["graph_hits_hubs_authorities"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(nodes)
    for n in nodes:
        assert got[n]["hub"] == pytest.approx(h[n], abs=1e-6)
        assert got[n]["authority"] == pytest.approx(a[n], abs=1e-6)


def test_haar_energy_matches_bruteforce(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    rows = duck.execute(
        "SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d, "
        "ROUND(SUM(\"value\"), 6) FROM events GROUP BY 1, 2 ORDER BY 1, 2"
    ).fetchall()
    series = {}
    for et, _, v in rows:
        series.setdefault(et, []).append(v)
    got = {
        r["event_type"]: r
        for r in REGISTRY["ts_wavelet_haar_energy"].fn(spark, SF_SMALL).collect()
    }
    for et, xs in series.items():
        s = xs[:16]
        for k in range(1, 5):
            det = [(s[2 * i] - s[2 * i + 1]) / 2 for i in range(len(s) // 2)]
            s = [(s[2 * i] + s[2 * i + 1]) / 2 for i in range(len(s) // 2)]
            e = sum(d * d for d in det)
            assert got[et][f"energy_l{k}"] == pytest.approx(e, abs=0.02)
    # Parseval-flavored sanity: total detail energy <= total variance mass
    for et, xs in series.items():
        s16 = xs[:16]
        mu = sum(s16) / 16
        tot_var = sum((x - mu) ** 2 for x in s16)
        e_sum = sum(got[et][f"energy_l{k}"] * (2 ** (k - 1)) for k in range(1, 5))
        assert e_sum <= tot_var * 1.001 + 1e-6


def test_permutation_test_matches_bruteforce(spark):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    r = REGISTRY["stats_permutation_test"].fn(spark, SF_SMALL).collect()[0]
    assert r["n_permutations"] == 64
    assert 0 <= r["n_as_extreme"] <= 64
    assert r["p_value"] == pytest.approx(r["n_as_extreme"] / 64, abs=6e-5)
    # two runs identical (hash-seeded determinism)
    r2 = REGISTRY["stats_permutation_test"].fn(spark, SF_SMALL).collect()[0]
    assert tuple(r) == tuple(r2)


def test_rocchio_matches_bruteforce(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    rows = duck.execute(
        "SELECT vec_id, label, embedding FROM embeddings"
    ).fetchall()
    g = float(1 << 20)
    by_label = {}
    for _, lbl, vec in rows:
        by_label.setdefault(lbl, []).append([float(x) for x in vec])
    cents = {
        lbl: [
            math.floor((sum(v[d] for v in vs) / len(vs)) * g + 0.5) / g
            for d in range(64)
        ]
        for lbl, vs in by_label.items()
    }
    correct = {}
    total = {}
    for _, lbl, vec in rows:
        v = [float(x) for x in vec]
        best = min(
            (round(sum((a - c) ** 2 for a, c in zip(v, cv)), 8) + cl * 1e-10, cl)
            for cl, cv in cents.items()
        )[1]
        total[lbl] = total.get(lbl, 0) + 1
        correct[lbl] = correct.get(lbl, 0) + (best == lbl)
    got = {
        r["label"]: r
        for r in REGISTRY["eval_rocchio_classifier"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(total)
    for lbl in total:
        r = got[lbl]
        assert r["n_vectors"] == total[lbl]
        assert r["n_correct"] == correct[lbl]
        assert r["accuracy"] == pytest.approx(correct[lbl] / total[lbl], abs=1e-4)


def test_seasonality_strength_consistent_with_stl(spark):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    stl = REGISTRY["ts_stl_decompose"].fn(spark, SF_SMALL).collect()
    seas = [r["seasonal"] for r in stl]
    res = [r["residual"] for r in stl]
    trend = [r["trend"] for r in stl]

    def var(v):
        m = sum(v) / len(v)
        return sum((x - m) ** 2 for x in v) / len(v)

    fs = max(0.0, 1 - var(res) / var([s + r for s, r in zip(seas, res)]))
    ft = max(0.0, 1 - var(res) / var([t + r for t, r in zip(trend, res)]))
    got = REGISTRY["ts_seasonality_strength"].fn(spark, SF_SMALL).collect()[0]
    assert got["n_days"] == len(stl)
    # stl output is presentation-rounded; small propagated wobble
    assert got["seasonal_strength"] == pytest.approx(fs, abs=1e-3)
    assert got["trend_strength"] == pytest.approx(ft, abs=1e-3)
    assert 0.0 <= got["seasonal_strength"] <= 1.0


def test_coengagement_matches_bruteforce(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    rows = duck.execute("SELECT DISTINCT user_id, event_type FROM events").fetchall()
    sets = {}
    for uid, et in rows:
        sets.setdefault(et, set()).add(uid)
    types = sorted(sets)
    got = {
        (r["type_a"], r["type_b"]): r
        for r in REGISTRY["events_type_coengagement"].fn(spark, SF_SMALL).collect()
    }
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            both = len(sets[a] & sets[b])
            if both == 0:
                assert (a, b) not in got
                continue
            r = got[(a, b)]
            assert r["n_both"] == both
            assert r["user_jaccard"] == pytest.approx(
                both / len(sets[a] | sets[b]), abs=1e-4
            )


def test_median_polish_matches_bruteforce(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    rows = duck.execute(
        "SELECT CAST(isodow(CAST(date_trunc('day', ts) AS DATE)) AS INT), "
        "CAST(date_trunc('week', ts) AS DATE), ROUND(SUM(\"value\"), 6) "
        "FROM events GROUP BY 1, 2"
    ).fetchall()
    cells = {(d, w): v for d, w, v in rows}
    dows = sorted({d for d, _ in cells})
    weeks = sorted({w for _, w in cells})
    re = {d: 0.0 for d in dows}
    ce = {w: 0.0 for w in weeks}
    m = dict(cells)
    for _ in range(2):
        for d in dows:
            md = _median([m[(d, w)] for w in weeks if (d, w) in m])
            re[d] += md
            for w in weeks:
                if (d, w) in m:
                    m[(d, w)] -= md
        for w in weeks:
            md = _median([m[(d, w)] for d in dows if (d, w) in m])
            ce[w] += md
            for d in dows:
                if (d, w) in m:
                    m[(d, w)] -= md
    got = {
        (r["component"], r["key"]): r["effect"]
        for r in REGISTRY["agg_tukey_median_polish"].fn(spark, SF_SMALL).collect()
    }
    for d in dows:
        assert got[("dow", str(d))] == pytest.approx(re[d], abs=1e-3)
    for w in weeks:
        assert got[("week", w.isoformat())] == pytest.approx(ce[w], abs=1e-3)
    assert got[("residual_abs_sum", "all")] == pytest.approx(
        sum(abs(v) for v in m.values()), abs=0.02
    )


def test_hazard_consistent_with_survival(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    spans = [
        r[0]
        for r in duck.execute(
            "SELECT CAST(floor(epoch(max(ts)) / 86400) - floor(epoch(min(ts)) / 86400) AS BIGINT) "
            "FROM events GROUP BY user_id"
        ).fetchall()
    ]
    got = {
        r["t_days"]: r
        for r in REGISTRY["events_hazard_rate"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(range(31))
    cum = 0.0
    for t in range(31):
        ended = sum(1 for s in spans if s == t)
        at_risk = sum(1 for s in spans if s >= t)
        r = got[t]
        assert r["n_ended"] == ended
        assert r["n_at_risk"] == at_risk
        hz = ended / at_risk if at_risk else 0.0
        cum += hz
        assert r["hazard"] == pytest.approx(hz, abs=1e-4)
        assert r["cum_hazard"] == pytest.approx(cum, abs=1e-3)


def test_fisher_combined_consistent_with_bh(spark):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    bh = REGISTRY["stats_benjamini_hochberg"].fn(spark, SF_SMALL).collect()
    ps = [r["p_value"] for r in bh]
    x = -2 * sum(math.log(p) for p in ps)
    r = REGISTRY["stats_fisher_combined"].fn(spark, SF_SMALL).collect()[0]
    assert r["k_tests"] == len(ps) and r["dof"] == 2 * len(ps)
    assert r["fisher_x"] == pytest.approx(x, abs=1e-3)
    k2 = 2.0 * len(ps)
    z = ((x / k2) ** (1 / 3) - (1 - 2 / (9 * k2))) / math.sqrt(2 / (9 * k2))
    assert r["z_wilson_hilferty"] == pytest.approx(z, abs=1e-3)
    assert r["p_combined"] == pytest.approx(
        math.erfc(max(z, 0.0) / math.sqrt(2)) / 2, abs=2e-4
    )


def test_proximity_matches_bruteforce(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    rows = duck.execute("SELECT doc_id, text FROM documents").fetchall()
    want = {}
    for doc_id, text in rows:
        toks = [t for t in (text or "").strip().split(" ") if t]
        pa = [i for i, t in enumerate(toks) if t == "hash"]
        pb = [i for i, t in enumerate(toks) if t == "merge"]
        pairs = [(x, y) for x in pa for y in pb if abs(x - y) <= 3]
        if pairs:
            want[doc_id] = (len(pairs), min(abs(x - y) for x, y in pairs))
    got = {
        r["doc_id"]: (r["n_pairs"], r["min_distance"])
        for r in REGISTRY["index_proximity_search"].fn(spark, SF_SMALL).collect()
    }
    assert got == want


def test_repeat_purchase_matches_bruteforce(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    rows = duck.execute(
        "SELECT c.c_mktsegment, o.o_custkey, count(*), SUM(o.o_totalprice) "
        "FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey GROUP BY 1, 2"
    ).fetchall()
    per = {}
    for seg, cust, n, rev in rows:
        per.setdefault(seg, []).append((n, rev))
    got = {
        r["segment"]: r
        for r in REGISTRY["orders_repeat_purchase"].fn(spark, SF_SMALL).collect()
    }
    for seg, cs in per.items():
        nrep = sum(1 for n, _ in cs if n >= 2)
        r = got[seg]
        assert r["n_customers"] == len(cs)
        assert r["n_repeat"] == nrep
        assert r["repeat_share"] == pytest.approx(nrep / len(cs), abs=1e-4)
        if nrep:
            assert r["orders_per_repeat"] == pytest.approx(
                sum(n for n, _ in cs if n >= 2) / nrep, abs=1e-3
            )
        assert r["repeat_revenue_share"] == pytest.approx(
            sum(rev for n, rev in cs if n >= 2) / sum(rev for _, rev in cs), abs=1e-4
        )


def test_bland_altman_matches_bruteforce(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    rows = duck.execute("SELECT text FROM documents").fetchall()
    diffs = []
    for (text,) in rows:
        a = len([t for t in (text or "").strip().split(" ") if t])
        b = len(text or "") / 6.0
        diffs.append(a - b)
    n = len(diffs)
    bias = sum(diffs) / n
    sd = math.sqrt(sum((d - bias) ** 2 for d in diffs) / (n - 1))
    lo, hi = bias - 1.96 * sd, bias + 1.96 * sd
    within = sum(1 for d in diffs if lo <= d <= hi) / n
    r = REGISTRY["stats_bland_altman"].fn(spark, SF_SMALL).collect()[0]
    assert r["n_docs"] == n
    assert r["bias"] == pytest.approx(bias, abs=1e-3)
    assert r["loa_low"] == pytest.approx(lo, abs=1e-3)
    assert r["loa_high"] == pytest.approx(hi, abs=1e-3)
    assert r["within_loa_share"] == pytest.approx(within, abs=1e-4)


def test_reciprocity_matches_bruteforce(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    edges = duck.execute(
        """
        SELECT prev_type, event_type, count(*) FROM (
          SELECT event_type,
                 lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
          FROM events
        ) WHERE prev_type IS NOT NULL AND prev_type <> event_type GROUP BY 1, 2
        """
    ).fetchall()
    w = {(s, d): float(c) for s, d, c in edges}
    n_recip = sum(1 for (s, d) in w if (d, s) in w)
    wr = sum(min(c, w.get((d, s), 0.0)) for (s, d), c in w.items()) / sum(w.values())
    r = REGISTRY["graph_reciprocity"].fn(spark, SF_SMALL).collect()[0]
    assert r["n_directed_edges"] == len(w)
    assert r["n_reciprocated"] == n_recip
    assert r["weighted_reciprocity"] == pytest.approx(wr, abs=1e-4)


def test_ingestion_order_matches_bruteforce(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    rows = duck.execute(
        "SELECT user_id, event_id, epoch_us(ts) FROM events ORDER BY user_id, event_id"
    ).fetchall()
    per = {}
    for uid, eid, us in rows:
        per.setdefault(uid, []).append(us)
    n_pairs = inv = 0
    max_reg = 0
    for us in per.values():
        for i in range(1, len(us)):
            n_pairs += 1
            d = us[i] - us[i - 1]
            if d < 0:
                inv += 1
                max_reg = max(max_reg, -d)
    r = REGISTRY["dq_ingestion_order_audit"].fn(spark, SF_SMALL).collect()[0]
    assert r["n_adjacent_pairs"] == n_pairs
    assert r["n_inversions"] == inv
    assert r["inversion_rate"] == pytest.approx(inv / n_pairs, abs=1e-5)
    assert r["max_regression_s"] == pytest.approx(max_reg / 1e6, abs=1e-3)


def test_tost_consistency(spark):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    rows = REGISTRY["stats_equivalence_tost"].fn(spark, SF_SMALL).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["margin"] > 0
        assert 0.0 <= r["p_tost"] <= 0.5 + 1e-9
        assert r["equivalent"] == (r["p_tost"] < 0.05)
        # equivalence requires |diff| inside the margin
        if r["equivalent"]:
            assert abs(r["diff"]) < r["margin"]


def test_uncertainty_sample_is_boundary_closest(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    rows = REGISTRY["corpus_uncertainty_sample"].fn(spark, SF_SMALL).collect()
    assert len(rows) == 25
    gaps = [r["uncertainty_gap"] for r in rows]
    assert gaps == sorted(gaps)
    for r in rows:
        assert r["uncertainty_gap"] == pytest.approx(abs(r["score"] - 0.5), abs=1e-5)


def test_partition_planner_matches_bruteforce(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    rows = duck.execute(
        "SELECT CAST(date_trunc('month', o_orderdate) AS DATE), count(*) "
        "FROM orders GROUP BY 1"
    ).fetchall()
    files = {m: math.ceil(n * 64 / 262144.0) for m, n in rows}
    mf = _median(sorted(files.values()))
    got = {
        r["month"]: r
        for r in REGISTRY["layout_partition_planner"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(files)
    for m, n in rows:
        r = got[m]
        assert r["n_rows"] == n
        assert r["est_bytes"] == n * 64
        assert r["n_files"] == files[m]
        assert r["skew_flag"] == (files[m] > 2 * mf)


@pytest.mark.slow
def test_mmr_matches_bruteforce(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    vecs = {
        r[0]: [float(x) for x in r[1]]
        for r in duck.execute("SELECT vec_id, embedding FROM embeddings").fetchall()
    }

    def cos(a, b):
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return sum(x * y for x, y in zip(a, b)) / (na * nb)

    got = {}
    for r in REGISTRY["sim_mmr_rerank"].fn(spark, SF_SMALL).collect():
        got.setdefault(r["q_id"], []).append((r["rank"], r["c_id"], r["mmr_score"]))
    assert set(got) == set(range(10))
    for qid in range(10):
        qv = vecs[qid]
        scored = sorted(
            ((round(cos(qv, cv), 6), -cid) for cid, cv in vecs.items() if cid != qid),
            reverse=True,
        )[:20]
        cand = {-ncid: rel for rel, ncid in scored}
        sims = {
            (a, b): round(cos(vecs[a], vecs[b]), 6)
            for a in cand
            for b in cand
            if a != b
        }
        selected, expect = [], []
        remaining = dict(cand)
        first = max(remaining.items(), key=lambda kv: (kv[1], -kv[0]))
        selected.append(first[0])
        expect.append((1, first[0], first[1]))
        del remaining[first[0]]
        for rank in range(2, 6):
            best = None
            for c in sorted(remaining):
                ms = max(sims[(c, s)] for s in selected)
                score = 0.7 * remaining[c] - 0.3 * ms
                if best is None or score > best[1]:
                    best = (c, score)
            selected.append(best[0])
            expect.append((rank, best[0], best[1]))
            del remaining[best[0]]
        rows = sorted(got[qid])
        assert [(r, c) for r, c, _ in rows] == [(r, c) for r, c, _ in expect]
        for (_, _, g), (_, _, w) in zip(rows, expect):
            assert g == pytest.approx(w, abs=2e-6)


def test_cohens_h_matches_bruteforce(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    rows = duck.execute(
        "SELECT user_id % 2, event_type = 'purchase' FROM events"
    ).fetchall()
    n = {0: 0, 1: 0}
    k = {0: 0, 1: 0}
    for arm, conv in rows:
        n[arm] += 1
        k[arm] += bool(conv)
    p1, p0 = k[1] / n[1], k[0] / n[0]
    h = 2 * math.asin(math.sqrt(p1)) - 2 * math.asin(math.sqrt(p0))
    r = REGISTRY["stats_cohens_h"].fn(spark, SF_SMALL).collect()[0]
    assert r["rate_treat"] == pytest.approx(p1, abs=1e-5)
    assert r["rate_ctrl"] == pytest.approx(p0, abs=1e-5)
    assert r["cohens_h"] == pytest.approx(h, abs=1e-5)
    band = abs(h)
    want = (
        "negligible" if band < 0.2 else "small" if band < 0.5
        else "medium" if band < 0.8 else "large"
    )
    assert r["magnitude"] == want


def test_retention_halflife_matches_bruteforce(spark, duck):
    import datetime as dt

    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    rows = duck.execute(
        "SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) FROM events"
    ).fetchall()
    byweek = {}
    for uid, wk in rows:
        byweek.setdefault(wk, set()).add(uid)
    pts = []
    for hzn in (1, 2, 3):
        base = retained = 0
        for wk, users in byweek.items():
            tgt = wk + dt.timedelta(days=7 * hzn)
            if tgt in byweek:
                base += len(users)
                retained += len(users & byweek[tgt])
        if retained > 0:
            pts.append((float(hzn), math.log(retained / base)))
    n = len(pts)
    r = REGISTRY["events_retention_halflife"].fn(spark, SF_SMALL).collect()[0]
    assert r["n_points"] == n
    if n < 2:
        assert r["lambda_per_week"] is None
        return
    mx = sum(x for x, _ in pts) / n
    my = sum(y for _, y in pts) / n
    slope = sum((x - mx) * (y - my) for x, y in pts) / sum(
        (x - mx) ** 2 for x, _ in pts
    )
    assert r["lambda_per_week"] == pytest.approx(-slope, abs=1e-4)
    if slope < 0:
        assert r["halflife_weeks"] == pytest.approx(math.log(2) / (-slope), abs=1e-2)
    else:
        # synthetic users return every week at tiny SFs: no decay to fit
        assert r["halflife_weeks"] is None


def test_anderson_darling_matches_bruteforce(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    rows = duck.execute(
        "SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d, "
        "ROUND(SUM(\"value\"), 6) FROM events GROUP BY 1, 2 ORDER BY 1, 2"
    ).fetchall()
    series = {}
    for et, _, x in rows:
        series.setdefault(et, []).append(x)
    got = {
        r["event_type"]: r
        for r in REGISTRY["stats_anderson_darling"].fn(spark, SF_SMALL).collect()
    }
    for et, xs in series.items():
        n = len(xs)
        mu = round(sum(xs) / n, 10)
        sd = round(math.sqrt(sum((x - mu) ** 2 for x in xs) / (n - 1)), 10)
        zs = sorted((x - mu) / sd for x in xs)
        # independent CDF: math.erfc (the A&S approximation is within
        # 2e-4 -- A2 aggregates ~n log terms, so allow a loose band)
        cdf = [1 - math.erfc(z / math.sqrt(2)) / 2 if z >= 0 else math.erfc(-z / math.sqrt(2)) / 2 for z in zs]
        a2 = -n - sum(
            (2 * (i + 1) - 1) * (math.log(cdf[i]) + math.log(1 - cdf[n - 1 - i]))
            for i in range(n)
        ) / n
        r = got[et]
        assert r["n_days"] == n
        assert r["a_squared"] == pytest.approx(a2, abs=0.02)


def test_hodges_lehmann_matches_bruteforce(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    rows = duck.execute(
        "SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d, "
        "ROUND(SUM(\"value\"), 6) FROM events GROUP BY 1, 2 ORDER BY 1, 2"
    ).fetchall()
    series = {}
    for et, _, x in rows:
        series.setdefault(et, []).append(x)
    got = {
        r["event_type"]: r
        for r in REGISTRY["agg_hodges_lehmann"].fn(spark, SF_SMALL).collect()
    }
    for et, xs in series.items():
        walsh = [
            (xs[i] + xs[j]) / 2 for i in range(len(xs)) for j in range(i, len(xs))
        ]
        r = got[et]
        assert r["n_walsh"] == len(walsh)
        assert r["hodges_lehmann"] == pytest.approx(_median(walsh), abs=1e-3)
        assert r["mean"] == pytest.approx(sum(xs) / len(xs), abs=1e-3)
        assert r["median"] == pytest.approx(_median(xs), abs=1e-3)


@pytest.mark.slow
def test_markov_stationary_matches_bruteforce(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    edges = duck.execute(
        """
        SELECT prev_type, event_type, count(*) FROM (
          SELECT event_type,
                 lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
          FROM events
        ) WHERE prev_type IS NOT NULL GROUP BY 1, 2
        """
    ).fetchall()
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    out = {}
    for s, d, w in edges:
        out.setdefault(s, []).append((d, float(w)))
    frac = {
        s: [(d, w / sum(w for _, w in lst)) for d, w in lst]
        for s, lst in out.items()
    }
    g = float(1 << 30)
    p = {n: 1.0 / len(nodes) for n in nodes}
    for _ in range(8):
        np_ = {n: 0.0 for n in nodes}
        for s, lst in frac.items():
            for d, fr in lst:
                np_[d] += p[s] * fr
        p = {n: math.floor(v * g + 0.5) / g for n, v in np_.items()}
    got = {
        r["node"]: r
        for r in REGISTRY["graph_markov_stationary"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(nodes)
    for n in nodes:
        assert got[n]["stationary_p"] == pytest.approx(p[n], abs=1e-6)
        assert got[n]["gap"] == pytest.approx(
            abs(p[n] - got[n]["empirical_share"]), abs=1e-4
        )
    # probabilities stay a distribution after snapping (up to snap error)
    assert sum(r["stationary_p"] for r in got.values()) == pytest.approx(1.0, abs=1e-4)


def test_wilcoxon_matches_bruteforce(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    rows = duck.execute(
        "SELECT SUM(CASE WHEN EXTRACT(day FROM ts) >= 16 THEN 1 ELSE 0 END) "
        "- SUM(CASE WHEN EXTRACT(day FROM ts) < 16 THEN 1 ELSE 0 END) "
        "FROM events GROUP BY user_id"
    ).fetchall()
    ds = [float(r[0]) for r in rows if r[0] != 0]
    ranks = _avg_ranks([abs(d) for d in ds])
    n = len(ds)
    wplus = sum(ranks[abs(d)] for d in ds if d > 0)
    from collections import Counter

    ties = sum(c**3 - c for c in Counter(abs(d) for d in ds).values())
    var = n * (n + 1) * (2 * n + 1) / 24.0 - ties / 48.0
    z = (wplus - n * (n + 1) / 4.0) / math.sqrt(var)
    r = REGISTRY["stats_wilcoxon_signed_rank"].fn(spark, SF_SMALL).collect()[0]
    assert r["n_nonzero"] == n
    assert r["w_plus"] == pytest.approx(wplus, abs=0.011)
    assert r["z"] == pytest.approx(z, abs=1e-3)


@pytest.mark.slow
def test_knn_matches_bruteforce(spark, duck):
    from collections import Counter

    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    rows = duck.execute("SELECT vec_id, label, embedding FROM embeddings").fetchall()
    vecs = {r[0]: ([float(x) for x in r[2]], r[1]) for r in rows}

    def cos(a, b):
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return sum(x * y for x, y in zip(a, b)) / (na * nb)

    correct = Counter()
    total = Counter()
    for qid, (qv, lbl) in vecs.items():
        scored = sorted(
            ((-cos(qv, cv), cid) for cid, (cv, _) in vecs.items() if cid != qid)
        )[:5]
        votes = Counter(vecs[cid][1] for _, cid in scored)
        pred = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        total[lbl] += 1
        correct[lbl] += pred == lbl
    got = {
        r["label"]: r
        for r in REGISTRY["eval_knn_classifier"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(total)
    for lbl in total:
        assert got[lbl]["n_vectors"] == total[lbl]
        assert got[lbl]["n_correct"] == correct[lbl]


def test_friedman_matches_bruteforce(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    rows = duck.execute(
        "SELECT CAST(date_trunc('day', ts) AS DATE), event_type, count(*) "
        "FROM events GROUP BY 1, 2"
    ).fetchall()
    days = {}
    types = set()
    for day, et, n in rows:
        days.setdefault(day, {})[et] = float(n)
        types.add(et)
    k = len(types)
    blocks = [v for v in days.values() if len(v) == k]
    rsum = {t: 0.0 for t in types}
    for blk in blocks:
        ranks = _avg_ranks(list(blk.values()))
        for t, v in blk.items():
            rsum[t] += ranks[v]
    n = len(blocks)
    chi2 = 12.0 / (n * k * (k + 1)) * sum(v * v for v in rsum.values()) - 3 * n * (k + 1)
    r = REGISTRY["stats_friedman_test"].fn(spark, SF_SMALL).collect()[0]
    assert (r["n_blocks"], r["k_treatments"]) == (n, k)
    assert r["friedman_chi2"] == pytest.approx(chi2, abs=1e-3)


def test_self_similarity_matches_bruteforce(spark, duck):
    from testlog_etl_spark.suite import REGISTRY, queries

    queries()
    register_duck_views(duck, SF_SMALL)
    rows = duck.execute(
        "SELECT doc_id, text FROM documents WHERE doc_id < 200"
    ).fetchall()
    toks = {d: set((t or "").strip().lower().split()) for d, t in rows}
    ids = sorted(toks)
    sims = []
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(toks[a] & toks[b])
            if inter:
                sims.append(inter / len(toks[a] | toks[b]))
    n = len(ids)
    tot = n * (n - 1) // 2
    r = REGISTRY["text_self_similarity_diversity"].fn(spark, SF_SMALL).collect()[0]
    assert (r["n_docs"], r["n_pairs"], r["overlapping_pairs"]) == (n, tot, len(sims))
    assert r["mean_jaccard_overlapping"] == pytest.approx(
        sum(sims) / len(sims), abs=1e-4
    )
    assert r["overlap_share"] == pytest.approx(len(sims) / tot, abs=1e-3)
    assert r["near_template_share"] == pytest.approx(
        sum(1 for s in sims if s > 0.5) / tot, abs=1e-4
    )
