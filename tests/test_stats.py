"""Statistics family (ANOVA, log-rank, BH-FDR, ACF/Ljung-Box):
pure-Python/numpy third implementations so the Spark plan and the
DuckDB oracle (which share the scalar formula text) can't share a
misconception about the underlying math."""

from __future__ import annotations

import math

import duckdb
import numpy as np

from axolotls_spark.queries import REGISTRY

SF_DIR = "/root/testdata/sf0.001"


def _rows(spark, name):
    return REGISTRY[name].fn(spark, SF_DIR).collect()


def _duck(sql):
    con = duckdb.connect()
    for t in ("orders", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS FROM '{SF_DIR}/{t}.parquet'"
        )
    return con.execute(sql).fetchall()


def test_anova_vs_numpy():
    groups = _duck(
        """
        SELECT c.c_mktsegment, LIST(o.o_totalprice)
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1
        """
    )
    ys = [np.asarray(v, dtype=np.float64) for _, v in groups]
    allv = np.concatenate(ys)
    grand = allv.mean()
    ssb = sum(len(y) * (y.mean() - grand) ** 2 for y in ys)
    ssw = sum(((y - y.mean()) ** 2).sum() for y in ys)
    k, n = len(ys), len(allv)
    f_ref = (ssb / (k - 1)) / (ssw / (n - k))
    eta_ref = ssb / (ssb + ssw)

    from axolotls_spark.session import get_spark

    r = _rows(get_spark("t", master="local[8]"), "anova_oneway_segments")[0]
    assert r.k_groups == k and r.n_total == n
    assert math.isclose(r.f_stat, f_ref, rel_tol=1e-5)
    assert math.isclose(r.eta_sq, eta_ref, rel_tol=1e-5)


def test_logrank_vs_python(spark):
    from axolotls_spark.queries_analytics import _KM_CHURN_DAYS

    cust = _duck(
        f"""
        WITH g AS (SELECT CAST(MAX(o_orderdate) AS DATE) gmax FROM orders)
        SELECT DATEDIFF('day', CAST(MIN(o.o_orderdate) AS DATE),
                        CAST(MAX(o.o_orderdate) AS DATE)),
               CASE WHEN DATEDIFF('day', CAST(MAX(o.o_orderdate) AS DATE),
                                  (SELECT gmax FROM g)) > {_KM_CHURN_DAYS}
                    THEN 1 ELSE 0 END,
               CASE WHEN MAX(c.c_mktsegment) = 'BUILDING' THEN 1 ELSE 0 END
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY o.o_custkey
        """
    )
    # Textbook log-rank: iterate event times ascending, maintain
    # at-risk sets per group by removing everyone with duration < t.
    durs = sorted({d for d, e, g in cust})
    o1 = e1 = v = 0.0
    for t in durs:
        at = [(d, e, g) for d, e, g in cust if d >= t]
        d_t = sum(e for d, e, g in at if d == t)
        if d_t == 0:
            continue
        n_t = len(at)
        n1_t = sum(g for _, _, g in at)
        d1_t = sum(e for d, e, g in at if d == t and g == 1)
        o1 += d1_t
        e1 += d_t * n1_t / n_t
        if n_t > 1:
            v += (
                d_t
                * (n1_t / n_t)
                * (1 - n1_t / n_t)
                * (n_t - d_t)
                / (n_t - 1)
            )
    r = _rows(spark, "logrank_test_retention")[0]
    assert r.observed_1 == int(o1)
    assert math.isclose(r.expected_1, e1, rel_tol=1e-5)
    assert math.isclose(r.z, (o1 - e1) / math.sqrt(v), rel_tol=1e-4)
    assert math.isclose(r.chi_sq, (o1 - e1) ** 2 / v, rel_tol=1e-4)


def test_fdr_bh_vs_exact_normal(spark):
    """The A&S 26.2.17 polynomial promises |Phi_approx - Phi| <
    7.5e-8; check every p against math.erfc and replay the step-up
    rule on the EXACT p-values — the rejection set must agree (the
    nation z-scores sit far from the q*i/m boundaries)."""
    rows = sorted(_rows(spark, "fdr_bh_nation_tests"), key=lambda r: r.p_rank)
    m = len(rows)
    assert [r.p_rank for r in rows] == list(range(1, m + 1))
    exact = []
    for r in rows:
        p_exact = math.erfc(abs(r.z) / math.sqrt(2.0))
        assert abs(r.p_value - p_exact) < 2e-7
        exact.append(p_exact)
    # p sorted ascending by rank, bh_crit = q*i/m increasing.
    assert exact == sorted(exact)
    imax = max(
        (i for i, p in enumerate(exact, 1) if p <= 0.10 * i / m),
        default=0,
    )
    got = [r.p_rank for r in rows if r.rejected == 1]
    assert got == list(range(1, imax + 1))


def test_acf_ljung_box_vs_numpy(spark):
    daily = _duck(
        """
        SELECT CAST(o_orderdate AS DATE), SUM(o_totalprice)
        FROM orders GROUP BY 1 ORDER BY 1
        """
    )
    days = np.array([(d - daily[0][0]).days for d, _ in daily])
    rev = np.array([v for _, v in daily], dtype=np.float64)
    mu = rev.mean()
    n = len(rev)
    denom = ((rev - mu) ** 2).sum()
    by_day = dict(zip(days.tolist(), (rev - mu).tolist()))
    rs = {}
    for lag in range(1, 15):
        num = sum(
            x * by_day[d + lag] for d, x in zip(days.tolist(),
                                                (rev - mu).tolist())
            if d + lag in by_day
        )
        rs[lag] = num / denom
    got = {r.lag: r for r in _rows(spark, "acf_ljung_box")}
    q = 0.0
    for lag in range(1, 15):
        q += rs[lag] ** 2 / (n - lag)
        assert math.isclose(got[lag].acf, rs[lag], rel_tol=1e-4,
                            abs_tol=1e-7)
        assert math.isclose(
            got[lag].ljung_box_q, n * (n + 2) * q, rel_tol=1e-4
        )


def test_skyline_vs_brute_force(spark):
    """The Spark plan derives the frontier from a prefix-max sweep;
    the oracle uses NOT-EXISTS dominance; this mirror brute-forces
    dominance in Python — three independent derivations."""
    pts = _duck_table(None, "SELECT p_partkey, p_retailprice, p_size"
                               " FROM part")
    sky = set()
    for pk, pr, sz in pts:
        dominated = any(
            (qr <= pr and qs >= sz and (qr < pr or qs > sz))
            for _, qr, qs in pts
        )
        if not dominated:
            sky.add(pk)
    got = {r.p_partkey for r in _rows(spark, "skyline_price_size")}
    assert got == sky


def test_apsp_vs_floyd_warshall(spark):
    """Min-plus squaring (Spark) and unrolled SQL squarings (oracle)
    vs the textbook Floyd-Warshall triple loop."""
    rows = _rows(spark, "apsp_trade_costs")
    nodes = sorted({r.src for r in rows} | {r.dst for r in rows})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    import math as _m

    # Rebuild D0 from the Spark result is circular; rebuild edges
    # from the raw tables instead.
    edges = _duck_table(
        None,
        """
        SELECT sn.n_name, cn.n_name,
               SUM(l.l_extendedprice * (1 - l.l_discount))
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
        GROUP BY 1, 2
        """,
    )
    tw = sum(w for _, _, w in edges)
    INF = float("inf")
    d = [[INF] * n for _ in range(n)]
    for i in range(n):
        d[i][i] = 0.0
    for s, t, w in edges:
        c = _m.log(tw / w)
        i, j = idx[s], idx[t]
        d[i][j] = min(d[i][j], c)
    for k in range(n):
        for i in range(n):
            dik = d[i][k]
            if dik == INF:
                continue
            for j in range(n):
                if dik + d[k][j] < d[i][j]:
                    d[i][j] = dik + d[k][j]
    for r in rows:
        assert math.isclose(
            r.cost, d[idx[r.src]][idx[r.dst]], rel_tol=1e-5, abs_tol=1e-6
        )
    # every reachable pair is present
    assert len(rows) == sum(
        1 for i in range(n) for j in range(n) if d[i][j] < INF
    )


def test_mutual_info_vs_numpy(spark):
    import collections

    rows = _duck_table(
        None,
        "SELECT l_quantity, l_discount, l_tax, l_returnflag FROM lineitem",
    )
    got = {r.feat: r for r in _rows(spark, "mutual_info_features")}
    for fi, feat in enumerate(("l_quantity", "l_discount", "l_tax")):
        xs = np.array([r[fi] for r in rows], dtype=np.float64)
        lbl = [r[3] for r in rows]
        lo, hi = xs.min(), xs.max()
        bins = np.minimum(
            np.floor((xs - lo) / (hi - lo) * 8).astype(int), 7
        )
        joint = collections.Counter(zip(bins.tolist(), lbl))
        nx = collections.Counter(bins.tolist())
        ny = collections.Counter(lbl)
        nn = len(rows)
        mi = sum(
            c / nn * math.log(c * nn / (nx[b] * ny[l]))
            for (b, l), c in joint.items()
        )
        assert math.isclose(got[feat].mi_nats, mi, rel_tol=1e-4,
                            abs_tol=1e-7)
        assert got[feat].n_bins_used == len(nx)


def _duck_table(_unused, sql=None):
    con = duckdb.connect()
    for t in ("orders", "customer", "lineitem", "nation", "supplier",
              "part", "events", "documents"):
        con.execute(f"CREATE VIEW {t} AS FROM '{SF_DIR}/{t}.parquet'")
    return con.execute(sql if sql else f"SELECT * FROM {_unused}").fetchall()


def test_kruskal_wallis_vs_python(spark):
    rows = _duck_table(
        None,
        """SELECT c.c_mktsegment, o.o_totalprice
           FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey""",
    )
    vals = sorted(v for _, v in rows)
    # average rank per value (1-indexed)
    first = {}
    cnt = {}
    for i, v in enumerate(vals, 1):
        first.setdefault(v, i)
        cnt[v] = cnt.get(v, 0) + 1
    ar = {v: first[v] + (cnt[v] - 1) / 2.0 for v in cnt}
    groups = {}
    for s, v in rows:
        groups.setdefault(s, []).append(ar[v])
    n = len(rows)
    srr = sum(sum(g) ** 2 / len(g) for g in groups.values())
    h = 12.0 / (n * (n + 1)) * srr - 3 * (n + 1)
    tie = sum(t**3 - t for t in cnt.values())
    r = _rows(spark, "kruskal_wallis_segments")[0]
    assert r.n_total == n and r.k_groups == len(groups)
    assert math.isclose(r.h_stat, h, rel_tol=1e-5)
    assert math.isclose(r.h_corrected, h / (1 - tie / (n**3 - n)),
                        rel_tol=1e-5)


def test_msprt_vs_python(spark):
    import hashlib

    rows = _duck_table(
        None,
        "SELECT user_id, value FROM events WHERE event_type = 'purchase'",
    )
    arms = {"A": [], "B": []}
    for uid, v in rows:
        h = int(hashlib.md5(str(uid).encode()).hexdigest()[:15], 16)
        arms["A" if h % 2 == 0 else "B"].append(v)
    a, b = np.array(arms["A"]), np.array(arms["B"])
    delta = b.mean() - a.mean()
    v = a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b)
    tau2 = 25.0
    lam = math.sqrt(v / (v + tau2)) * math.exp(
        delta * delta * tau2 / (2 * v * (v + tau2))
    )
    r = _rows(spark, "msprt_always_valid")[0]
    assert r.n_a == len(a) and r.n_b == len(b)
    assert math.isclose(r.delta, delta, rel_tol=1e-5, abs_tol=1e-6)
    assert math.isclose(r["lambda"], lam, rel_tol=1e-4)
    assert math.isclose(r.always_valid_p, min(1.0, 1.0 / lam),
                        rel_tol=1e-4)


def test_stratified_ate_vs_python(spark):
    rows = _duck_table(
        None,
        """SELECT CAST(FLOOR(c.c_acctbal / 1000) AS BIGINT),
                  CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END,
                  o.o_totalprice
           FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey""",
    )
    strata = {}
    for s, t, y in rows:
        strata.setdefault(s, {0: [], 1: []})[t].append(y)
    num = den = used = cov = 0.0
    for s, d in strata.items():
        if d[0] and d[1]:
            ns = len(d[0]) + len(d[1])
            num += ns * (np.mean(d[1]) - np.mean(d[0]))
            den += ns
            used += 1
            cov += ns
    treated = [y for _, t, y in rows if t == 1]
    control = [y for _, t, y in rows if t == 0]
    r = _rows(spark, "stratified_ate_balance")[0]
    assert math.isclose(
        r.ate_raw, np.mean(treated) - np.mean(control), rel_tol=1e-5
    )
    assert math.isclose(r.ate_stratified, num / den, rel_tol=1e-5)
    assert r.n_strata_used == used
    assert math.isclose(r.coverage_frac, cov / len(rows), rel_tol=1e-6)


def test_kneser_ney_vs_python(spark):
    import collections

    docs = _duck_table(None, "SELECT doc_id, text FROM documents")
    toks = {d: t.strip().split() for d, t in docs}
    bgc = collections.Counter(
        (w1, w2)
        for t in toks.values()
        for w1, w2 in zip(t, t[1:])
    )
    cw1 = collections.Counter()
    n1p_fw = collections.Counter()
    n1p_bw = collections.Counter()
    for (w1, w2), c in bgc.items():
        cw1[w1] += c
        n1p_fw[w1] += 1
        n1p_bw[w2] += 1
    T = len(bgc)
    D = 0.75
    got = {r.doc_id: r for r in _rows(spark, "kneser_ney_bigram")}
    for d, t in toks.items():
        pairs = list(zip(t, t[1:]))
        if not pairs:
            assert d not in got
            continue
        lp = np.mean([
            math.log(
                (bgc[p] - D) / cw1[p[0]]
                + D * n1p_fw[p[0]] / cw1[p[0]] * n1p_bw[p[1]] / T
            )
            for p in pairs
        ])
        assert got[d].n_bigrams == len(pairs)
        assert math.isclose(got[d].kn_logprob, lp, rel_tol=1e-5)


def test_spearman_vs_numpy(spark):
    rows = _duck_table(
        None, "SELECT l_quantity, l_extendedprice FROM lineitem"
    )
    x = np.array([r[0] for r in rows], dtype=np.float64)
    y = np.array([r[1] for r in rows], dtype=np.float64)

    def avg_rank(a):
        order = np.argsort(a, kind="stable")
        ranks = np.empty(len(a))
        sa = a[order]
        i = 0
        while i < len(a):
            j = i
            while j < len(a) and sa[j] == sa[i]:
                j += 1
            ranks[order[i:j]] = (i + 1 + j) / 2.0
            i = j
        return ranks

    rx, ry = avg_rank(x), avg_rank(y)
    rho = np.corrcoef(rx, ry)[0, 1]
    r = _rows(spark, "spearman_corr_qty_price")[0]
    assert r.n == len(rows)
    assert math.isclose(r.spearman_rho, rho, rel_tol=1e-5)


def test_chow_vs_numpy(spark):
    rows = _duck_table(
        None,
        """SELECT CASE WHEN l_shipdate < TIMESTAMP '1998-06-01'
                       THEN 0 ELSE 1 END,
                  l_quantity, l_discount, l_extendedprice
           FROM lineitem""",
    )

    def sse(sub):
        X = np.column_stack(
            [np.ones(len(sub))]
            + [np.array([r[i] for r in sub]) for i in (1, 2)]
        )
        yv = np.array([r[3] for r in sub])
        beta, *_ = np.linalg.lstsq(X, yv, rcond=None)
        resid = yv - X @ beta
        return float(resid @ resid)

    pre = [r for r in rows if r[0] == 0]
    post = [r for r in rows if r[0] == 1]
    sse_p = sse(rows)
    sse_s = sse(pre) + sse(post)
    k = 3
    f_ref = ((sse_p - sse_s) / k) / (sse_s / (len(rows) - 2 * k))
    r = _rows(spark, "chow_test_break")[0]
    assert r.n_pre == len(pre) and r.n_post == len(post)
    assert math.isclose(r.sse_pooled, sse_p, rel_tol=1e-4)
    assert math.isclose(r.sse_split, sse_s, rel_tol=1e-4)
    assert math.isclose(r.chow_f, f_ref, rel_tol=1e-3)


def test_ridge_path_vs_numpy(spark):
    rows = _duck_table(
        None,
        "SELECT l_quantity, l_discount, l_extendedprice FROM lineitem",
    )
    X = np.array([[r[0], r[1]] for r in rows], dtype=np.float64)
    y = np.array([r[2] for r in rows], dtype=np.float64)
    xc = X - X.mean(axis=0)
    yc = y - y.mean()
    S = xc.T @ xc
    got = {round(r.lam_frac, 4): r for r in _rows(spark, "ridge_path_lineitem")}
    prev_r2 = None
    for lf in (0.0, 0.01, 0.1, 1.0):
        lam = lf * (S[0, 0] + S[1, 1]) / 2
        beta = np.linalg.solve(S + lam * np.eye(2), xc.T @ yc)
        b0 = y.mean() - beta @ X.mean(axis=0)
        resid = yc - xc @ beta
        r2 = 1 - float(resid @ resid) / float(yc @ yc)
        r = got[lf]
        assert math.isclose(r.b0, b0, rel_tol=1e-4)
        assert math.isclose(r.b1, beta[0], rel_tol=1e-4)
        assert math.isclose(r.b2, beta[1], rel_tol=1e-4, abs_tol=1e-6)
        assert math.isclose(r.r2, r2, rel_tol=1e-4)
        if prev_r2 is not None:
            assert r.r2 <= prev_r2 + 1e-9  # shrinkage can't improve fit
        prev_r2 = r.r2


def test_mips_prunes_and_stays_exact(spark):
    """On a SKEWED-norm corpus (the real MIPS workload: popularity-
    scaled item factors) the Cauchy-Schwarz bound must prune hard
    AND stay exact vs brute force; on the isotropic synthetic
    embeddings the registry query degrades to brute force, which the
    oracle-parity gate already certifies."""
    import numpy as np
    from pyspark.sql import functions as F
    from axolotls_spark.functions.arrays import dot
    from axolotls_spark.operators.similarity import mips_norm_pruned_topk

    rng = np.random.RandomState(7)
    n, d = 2000, 8
    # heavy-tailed norms: a few "popular" long vectors dominate
    vecs = rng.randn(n, d) * (rng.pareto(2.0, size=(n, 1)) + 0.05)
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id INT, embedding ARRAY<FLOAT>",
    )
    q = spark.createDataFrame(
        [(10_000 + j, [float(x) for x in rng.randn(d)]) for j in range(4)],
        "query_id INT, qv ARRAY<FLOAT>",
    )
    got = mips_norm_pruned_topk(q, corpus, k=5, m=100).collect()
    assert len(got) == 4 * 5

    # exactness vs a brute-force numpy mirror (f32 corpus)
    v32 = vecs.astype(np.float32).astype(np.float64)
    for row in q.collect():
        qv = np.array(row.qv, dtype=np.float64)
        scores = v32 @ qv
        order = np.argsort(-scores, kind="stable")[:5]
        mine = sorted(
            [r for r in got if r.query_id == row.query_id],
            key=lambda r: r.rn,
        )
        assert [r.cand_id for r in mine] == order.tolist()

    # the bound must actually prune on this corpus
    norms = np.linalg.norm(v32, axis=1)
    pruned_fracs = []
    for row in q.collect():
        qv = np.array(row.qv, dtype=np.float64)
        qnorm = float(np.linalg.norm(qv))
        top_m = np.argsort(-norms, kind="stable")[:100]
        cand_scores = v32[top_m] @ qv
        tq = float(np.sort(cand_scores)[-5])
        pruned_fracs.append(float((norms * qnorm < tq).mean()))
    assert min(pruned_fracs) > 0.5
