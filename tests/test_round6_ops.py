"""Round-6 operators: independent third implementations so the Spark
plan and the DuckDB oracle (which share formula text) can't share a
misconception — Kendall tau-b against a brute-force O(n^2) numpy pair
count, the depth-2 CART against a straight-line numpy greedy trainer,
plus structural invariants for the epoch shuffle and the xxhash
production MinHash recall gate."""

from __future__ import annotations

import duckdb
import numpy as np

from axolotls_spark.queries import REGISTRY

SF_DIR = "/root/testdata/sf0.001"


def _rows(spark, name):
    return REGISTRY[name].fn(spark, SF_DIR).collect()


def _duck(sql, tables=("lineitem",)):
    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS FROM '{SF_DIR}/{t}.parquet'")
    return con.execute(sql).fetchnumpy()


def test_kendall_tau_vs_bruteforce(spark):
    d = _duck("SELECT l_quantity AS x, l_discount AS y FROM lineitem")
    x = np.asarray(d["x"], dtype=np.float64)
    y = np.asarray(d["y"], dtype=np.float64)
    n = len(x)
    # Brute-force O(n^2) pair census — the definition, not the
    # contingency shortcut the query uses.
    sx = np.sign(x[:, None] - x[None, :])
    sy = np.sign(y[:, None] - y[None, :])
    iu = np.triu_indices(n, k=1)
    prod = sx[iu] * sy[iu]
    conc = int((prod > 0).sum())
    disc = int((prod < 0).sum())
    ties_x = int((sx[iu] == 0).sum())
    ties_y = int((sy[iu] == 0).sum())
    n0 = n * (n - 1) // 2
    tau_ref = (conc - disc) / (
        np.sqrt(float(n0 - ties_x)) * np.sqrt(float(n0 - ties_y))
    )

    r = _rows(spark, "kendall_tau_concordance")[0]
    assert r["n"] == n
    assert r["concordant"] == conc
    assert r["discordant"] == disc
    assert r["ties_x"] == ties_x
    assert r["ties_y"] == ties_y
    assert abs(r["tau_b"] - tau_ref) < 1e-6


def _np_best_split(bins, pos, node=None, nodes=("all",)):
    """Straight-line greedy split search: returns
    {node: (feat_idx, bin, n_left, n_right, pos_left, pos_right)}."""
    n_feats = bins.shape[1]
    out = {}
    for nd in nodes:
        mask = np.ones(len(pos), bool) if node is None else node == nd
        best = None
        for f in range(n_feats):
            b = bins[mask, f]
            p = pos[mask]
            hist_n = np.bincount(b, minlength=16).astype(np.int64)
            hist_p = np.bincount(b, weights=p, minlength=16).astype(np.int64)
            nt, pt = hist_n.sum(), hist_p.sum()
            nl = np.cumsum(hist_n)
            pl = np.cumsum(hist_p)
            for cut in range(16):
                if nl[cut] == 0 or nt - nl[cut] == 0:
                    continue

                def sc(pp, nn):
                    return (pp * pp + (nn - pp) * (nn - pp)) / float(nn)

                gain = (
                    sc(pl[cut], nl[cut])
                    + sc(pt - pl[cut], nt - nl[cut])
                    - sc(pt, nt)
                )
                key = (-gain, f, cut)
                if best is None or key < best[0]:
                    best = (
                        key,
                        (
                            f,
                            cut,
                            int(nl[cut]),
                            int(nt - nl[cut]),
                            int(pl[cut]),
                            int(pt - pl[cut]),
                        ),
                    )
        out[nd] = best[1]
    return out


def test_tree_depth2_vs_numpy(spark):
    feats = ("l_quantity", "l_extendedprice", "l_discount")
    d = _duck(
        "SELECT l_quantity, l_extendedprice, l_discount,"
        " CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS pos"
        " FROM lineitem"
    )
    X = np.column_stack([np.asarray(d[f], dtype=np.float64) for f in feats])
    pos = np.asarray(d["pos"], dtype=np.int64)
    lo, hi = X.min(axis=0), X.max(axis=0)
    bins = np.minimum(
        np.floor((X - lo) / (hi - lo) * 16).astype(np.int64), 15
    )

    root = _np_best_split(bins, pos)["all"]
    node = np.where(bins[:, root[0]] <= root[1], "L", "R")
    children = _np_best_split(bins, pos, node=node, nodes=("L", "R"))

    got = {r["node"]: r for r in _rows(spark, "tree_depth2_cart")}
    for nd, ref in [("root", root), ("L", children["L"]),
                    ("R", children["R"])]:
        r = got[nd]
        assert r["feat"] == feats[ref[0]], (nd, r["feat"])
        assert r["split_bin"] == ref[1], (nd, r["split_bin"])
        assert (r["n_left"], r["n_right"]) == (ref[2], ref[3])
        assert (r["pos_left"], r["pos_right"]) == (ref[4], ref[5])


def test_epoch_shuffle_invariants(spark):
    rows = _rows(spark, "epoch_shuffle_order")
    per_epoch: dict[int, list] = {}
    for r in rows:
        per_epoch.setdefault(r["epoch"], []).append(r)
    assert set(per_epoch) == {0, 1}
    n_total = {e: sum(r["n_docs"] for r in v) for e, v in per_epoch.items()}
    # Both epochs place the identical corpus.
    assert n_total[0] == n_total[1] > 0
    for e, v in per_epoch.items():
        assert len(v) == 16, f"epoch {e}: {len(v)} shards"
        sizes = [r["n_docs"] for r in v]
        # Contiguous-block placement: balanced within one doc.
        assert max(sizes) - min(sizes) <= 1, (e, sizes)
    # Different epoch seeds => different orders (checksums disagree).
    ck0 = {(r["shard"], r["order_checksum"]) for r in per_epoch[0]}
    ck1 = {(r["shard"], r["order_checksum"]) for r in per_epoch[1]}
    assert ck0 != ck1


def test_xxhash_minhash_recall(spark):
    # r8: certification moved to the sampled query (VERDICT r7 #1);
    # the production query now emits the exact-verified pairs.
    r = _rows(spark, "minhash_xxhash_recall_cert")[0]
    assert r["n_true_pairs"] > 0, "threshold too high for this corpus"
    assert r["recall_ok"] == 1
    assert r["recall_floor_ppm"] == 999_755
    pairs = _rows(spark, "minhash_xxhash_production")
    assert pairs, "no exact-verified duplicate pairs on this corpus"
    for p in pairs:
        # exact verify: every emitted pair satisfies J >= 1/2.
        assert p["n_inter"] * 2 >= p["n_union"] * 1
        assert p["doc_a"] < p["doc_b"]


def test_delong_auc_identities(spark):
    """The DeLong placement AUC must equal logreg_auc_roc's trapezoid
    AUC on the identical 64-bin histogram (a nontrivial algebraic
    identity between two different formulas), and the CI must bracket
    the point estimate with a positive width."""
    d = _rows(spark, "delong_auc_ci")[0]
    t = _rows(spark, "logreg_auc_roc")[0]
    assert d["n_pos"] == t["n_pos"] and d["n_neg"] == t["n_neg"]
    assert abs(d["auc"] - t["auc"]) < 1e-6
    assert d["se"] > 0
    assert d["ci_lo"] < d["auc"] < d["ci_hi"]
    assert abs((d["ci_hi"] - d["ci_lo"]) / 2 - 1.959963984540054 * d["se"]) < 1e-6


def test_rbo_vs_numpy(spark):
    d = _duck(
        """
        SELECT YEAR(CAST(o.o_orderdate AS DATE)) AS yr, n.n_name AS nation,
               SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                        AS BIGINT)) AS rev
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE YEAR(CAST(o.o_orderdate AS DATE)) IN (1995, 1996)
        GROUP BY 1, 2
        """,
        tables=("lineitem", "orders", "customer", "nation"),
    )
    by_year: dict[int, list] = {1995: [], 1996: []}
    for yr, nation, rev in zip(d["yr"], d["nation"], d["rev"]):
        by_year[int(yr)].append((-int(rev), str(nation)))
    lists = {yr: [nm for _, nm in sorted(v)] for yr, v in by_year.items()}
    a, b = lists[1995], lists[1996]
    rows = sorted(_rows(spark, "rbo_rank_agreement"),
                  key=lambda r: r["depth"])
    assert len(rows) == len(a)
    rbo_sum = 0.0
    for r in rows:
        depth = r["depth"]
        ref_overlap = len(set(a[:depth]) & set(b[:depth]))
        assert r["overlap"] == ref_overlap, (depth, r["overlap"], ref_overlap)
        assert abs(r["agreement"] - ref_overlap / depth) < 1e-6
        assert abs(r["weight"] - 0.5 ** (depth - 1)) < 1e-9
        rbo_sum += r["contribution"]
    # Truncated RBO (1-p) * sum is a proper agreement in [0, 1].
    assert 0.0 <= (1 - 0.5) * rbo_sum <= 1.0


def test_ks_two_sample_vs_numpy(spark):
    d = _duck(
        """
        SELECT o.o_totalprice AS v, c.c_mktsegment AS seg
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
        """,
        tables=("orders", "customer"),
    )
    v = np.asarray(d["v"], dtype=np.float64)
    seg = np.asarray(d["seg"])
    a = np.sort(v[seg == "BUILDING"])
    b = np.sort(v[seg == "MACHINERY"])
    grid = np.unique(v)
    f1 = np.searchsorted(a, grid, side="right") / len(a)
    f2 = np.searchsorted(b, grid, side="right") / len(b)
    d_ref = float(np.max(np.abs(f1 - f2)))

    r = _rows(spark, "ks_two_sample")[0]
    assert r["n1"] == len(a) and r["n2"] == len(b)
    assert abs(r["ks_d"] - d_ref) < 1e-9
    assert 0.0 < r["p_approx"] <= 2.0  # one-term tail approx can exceed 1


def test_greedy_max_coverage_vs_python(spark):
    d = _duck("SELECT doc_id, text FROM documents", tables=("documents",))
    sets = {}
    for doc_id, text in zip(d["doc_id"], d["text"]):
        toks = str(text).strip().split()
        sh = {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}
        if sh:
            sets[int(doc_id)] = sh
    covered: set = set()
    expect = []
    for _ in range(5):
        best = max(
            sets.items(),
            key=lambda kv: (len(kv[1] - covered), -kv[0]),
        )
        gain = len(best[1] - covered)
        covered |= best[1]
        expect.append((best[0], gain, len(covered)))

    rows = sorted(_rows(spark, "greedy_max_coverage"),
                  key=lambda r: r["round"])
    for r, (doc, gain, cum) in zip(rows, expect):
        assert r["doc_id"] == doc, (r["round"], r["doc_id"], doc)
        assert r["marginal_gain"] == gain
        assert r["covered_cum"] == cum
    uni = len(set().union(*sets.values()))
    assert abs(rows[-1]["coverage_frac"] - expect[-1][2] / uni) < 1e-6


def test_entropy_quality_vs_python(spark):
    import math

    d = _duck("SELECT doc_id, text FROM documents", tables=("documents",))
    ref = {}
    for doc_id, text in zip(d["doc_id"], d["text"]):
        bs = str(text).encode("utf-8")
        counts = [0] * 16
        for byte in bs:
            counts[byte & 0xF] += 1
        n = len(bs)
        h = 0.0
        for c in counts:
            if c > 0:
                h += -(c / n) * math.log2(c / n)
        ref[int(doc_id)] = (n, h)

    rows = _rows(spark, "multimodal_entropy_quality")
    assert len(rows) == len(ref)
    for r in rows:
        n, h = ref[r["doc_id"]]
        assert r["n_bytes"] == n
        assert abs(r["nibble_entropy"] - h) < 1e-5
        if abs(h - 3.5) > 1e-4:  # away from the flag threshold
            assert r["low_entropy_flag"] == int(h < 3.5)


def test_aipw_vs_numpy(spark):
    d = _duck(
        """
        SELECT CAST(c.c_acctbal AS DOUBLE) AS x,
               CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS t,
               COALESCE(s.y, 0.0) AS y
        FROM customer c LEFT JOIN (
            SELECT o_custkey, SUM(o_totalprice) AS y
            FROM orders GROUP BY o_custkey) s
          ON s.o_custkey = c.c_custkey
        """,
        tables=("orders", "customer"),
    )
    x = np.asarray(d["x"]); t = np.asarray(d["t"], dtype=np.float64)
    y = np.asarray(d["y"])

    def ols(xv, yv):
        n = len(xv)
        b = (n * (xv * yv).sum() - xv.sum() * yv.sum()) / (
            n * (xv * xv).sum() - xv.sum() ** 2
        )
        return (yv.sum() - b * xv.sum()) / n, b

    pa, pb = ols(x, t)
    e = np.clip(pa + pb * x, 0.05, 0.95)
    a1, b1 = ols(x[t == 1], y[t == 1])
    a0, b0 = ols(x[t == 0], y[t == 0])
    m1, m0 = a1 + b1 * x, a0 + b0 * x
    aipw_ref = float(np.mean(
        m1 - m0 + t * (y - m1) / e - (1 - t) * (y - m0) / (1 - e)
    ))
    reg_ref = float(np.mean(m1 - m0))
    naive_ref = float(y[t == 1].mean() - y[t == 0].mean())

    r = _rows(spark, "aipw_doubly_robust_ate")[0]
    assert r["n_treated"] == int(t.sum())
    scale = max(1.0, abs(aipw_ref))
    assert abs(r["aipw_ate"] - aipw_ref) / scale < 1e-5
    assert abs(r["reg_ate"] - reg_ref) / scale < 1e-5
    assert abs(r["naive_diff"] - naive_ref) / scale < 1e-5


def test_kappa_vs_python(spark):
    d = _duck("SELECT doc_id, text FROM documents", tables=("documents",))
    n11 = n10 = n01 = n00 = 0
    for text in d["text"]:
        toks = str(text).strip().split()
        nt, nd = len(toks), len(set(toks))
        topc = max(toks.count(t) for t in set(toks))
        ga = int(nd * 100 < nt * 45)
        gb = int(topc * 100 >= nt * 8)
        if ga and gb:
            n11 += 1
        elif ga:
            n10 += 1
        elif gb:
            n01 += 1
        else:
            n00 += 1
    n = n11 + n10 + n01 + n00
    pe_num = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
    kappa_ref = ((n11 + n00) * n - pe_num) / (n * n - pe_num)

    r = _rows(spark, "kappa_filter_agreement")[0]
    assert (r["n11"], r["n10"], r["n01"], r["n00"]) == (n11, n10, n01, n00)
    assert abs(r["kappa"] - kappa_ref) < 1e-6


def test_rdd_local_linear_vs_numpy(spark):
    d = _duck(
        """
        SELECT CAST(c.c_acctbal AS DOUBLE) AS x, COALESCE(s.y, 0.0) AS y
        FROM customer c LEFT JOIN (
            SELECT o_custkey, SUM(o_totalprice) AS y
            FROM orders GROUP BY o_custkey) s
          ON s.o_custkey = c.c_custkey
        WHERE c.c_acctbal >= -1000 AND c.c_acctbal < 1000
        """,
        tables=("orders", "customer"),
    )
    x = np.asarray(d["x"], dtype=np.float64)
    y = np.asarray(d["y"], dtype=np.float64)

    def fit(xs, ys):
        # np.polyfit as the independent solver (QR, not moment algebra)
        b, a = np.polyfit(xs, ys, 1)
        return a, b

    al, bl = fit(x[x < 0], y[x < 0])
    ar, br = fit(x[x >= 0], y[x >= 0])

    r = _rows(spark, "rdd_local_linear")[0]
    assert (r["n_left"], r["n_right"]) == (int((x < 0).sum()),
                                           int((x >= 0).sum()))
    assert abs(r["intercept_left"] - al) / max(1.0, abs(al)) < 1e-5
    assert abs(r["intercept_right"] - ar) / max(1.0, abs(ar)) < 1e-5
    assert abs(r["slope_left"] - bl) / max(1.0, abs(bl)) < 1e-5
    assert abs(r["slope_right"] - br) / max(1.0, abs(br)) < 1e-5
    assert abs(r["rdd_effect"] - (ar - al)) / max(1.0, abs(ar - al)) < 1e-5


def test_wald_grouping_vs_numpy(spark):
    d = _duck("SELECT l_quantity AS x, l_extendedprice AS y FROM lineitem")
    x = np.asarray(d["x"], dtype=np.float64)
    y = np.asarray(d["y"], dtype=np.float64)
    m = np.quantile(x, 0.5, method="linear")
    hi, lo = x > m, x <= m
    wald = (y[hi].mean() - y[lo].mean()) / (x[hi].mean() - x[lo].mean())
    ols = np.polyfit(x, y, 1)[0]

    r = _rows(spark, "wald_grouping_slope")[0]
    assert (r["n_high"], r["n_low"]) == (int(hi.sum()), int(lo.sum()))
    assert abs(r["wald_slope"] - wald) / max(1.0, abs(wald)) < 1e-5
    assert abs(r["ols_slope"] - ols) / max(1.0, abs(ols)) < 1e-5
    assert abs(
        r["wald_intercept"] - (y.mean() - wald * x.mean())
    ) / max(1.0, abs(y.mean())) < 1e-5


def test_bayes_ab_vs_lgamma(spark):
    # Independent special-function path: math.lgamma instead of the
    # query's shared prefix-sum log-factorial relation.
    import math

    r = _rows(spark, "bayes_ab_beta_binomial")[0]
    a1, b1 = r["s_a"] + 1, r["n_a"] - r["s_a"] + 1
    a2, b2 = r["s_b"] + 1, r["n_b"] - r["s_b"] + 1

    def lnb(a, b):
        return math.lgamma(a) + math.lgamma(b) - math.lgamma(a + b)

    p_ref = sum(
        math.exp(
            lnb(a1 + i, b1 + b2)
            - math.log(b2 + i)
            - lnb(1 + i, b2)
            - lnb(a1, b1)
        )
        for i in range(a2)
    )
    assert 0.0 <= r["prob_b_beats_a"] <= 1.0
    assert abs(r["prob_b_beats_a"] - p_ref) < 1e-6


def test_hbos_vs_numpy(spark):
    d = _duck(
        """SELECT l_orderkey, l_linenumber, l_quantity,
                  l_extendedprice, l_discount FROM lineitem"""
    )
    feats = ["l_quantity", "l_extendedprice", "l_discount"]
    cols = {c: np.asarray(d[c], dtype=np.float64) for c in feats}
    n = len(cols[feats[0]])
    bins, counts = {}, {}
    for c in feats:
        x = cols[c]
        mn, mx = x.min(), x.max()
        b = np.minimum(np.floor((x - mn) * 16.0 / (mx - mn)), 15).astype(int)
        bins[c] = b
        counts[c] = np.bincount(b, minlength=16)
    prod = np.ones(n, dtype=np.int64)
    for c in feats:
        prod *= counts[c][bins[c]]
    order = np.lexsort(
        (np.asarray(d["l_linenumber"]), np.asarray(d["l_orderkey"]), prod)
    )[:20]
    ref = sorted(
        (int(prod[i]), int(d["l_orderkey"][i]), int(d["l_linenumber"][i]))
        for i in order
    )
    got = sorted(
        (r["rarity_product"], r["l_orderkey"], r["l_linenumber"])
        for r in _rows(spark, "hbos_outlier_scores")
    )
    assert got == ref
    for r in _rows(spark, "hbos_outlier_scores"):
        score_ref = 3.0 * np.log(n) - sum(
            np.log(counts[c][r[f"bin_{i}"]]) for i, c in enumerate(feats)
        )
        assert abs(r["hbos_score"] - score_ref) < 1e-5


def test_cka_vs_numpy(spark):
    d = _duck(
        "SELECT embedding FROM embeddings ORDER BY vec_id",
        tables=("embeddings",),
    )
    E = np.vstack(d["embedding"]).astype(np.float64)
    X, Y = E[:, :16], E[:, 16:32]
    Xc, Yc = X - X.mean(0), Y - Y.mean(0)
    hxy = np.linalg.norm(Xc.T @ Yc, "fro") ** 2
    hxx = np.linalg.norm(Xc.T @ Xc, "fro") ** 2
    hyy = np.linalg.norm(Yc.T @ Yc, "fro") ** 2
    cka_ref = hxy / np.sqrt(hxx * hyy)

    r = _rows(spark, "cka_embedding_alignment")[0]
    assert r["n_rows"] == E.shape[0]
    assert abs(r["cka_linear"] - cka_ref) < 1e-6


def test_forecast_backtest_vs_numpy(spark):
    d = _duck(
        """SELECT CAST(o_orderdate AS DATE) AS day, SUM(o_totalprice) AS y
           FROM orders GROUP BY 1 ORDER BY 1""",
        tables=("orders",),
    )
    y = np.asarray(d["y"], dtype=np.float64)
    f_naive = y[6:-1]
    f_snaive = y[:-7]
    f_ma7 = np.array(
        [y[max(0, t - 7):t].mean() for t in range(7, len(y))]
    )
    a = y[7:]
    mae_sn = np.abs(a - f_snaive).mean()
    refs = {}
    for name, f in [("naive", f_naive), ("seasonal_naive", f_snaive),
                    ("moving_avg_7", f_ma7)]:
        mae = np.abs(a - f).mean()
        smape = (2 * np.abs(a - f) / (np.abs(a) + np.abs(f))).mean()
        refs[name] = (len(a), mae, smape, mae / mae_sn)
    for r in _rows(spark, "forecast_backtest_metrics"):
        n, mae, smape, mase = refs[r["method"]]
        assert r["n_days"] == n
        assert abs(r["mae"] - mae) / mae < 1e-5
        assert abs(r["smape"] - smape) / smape < 1e-5
        assert abs(r["mase"] - mase) / mase < 1e-5


def test_modularity_vs_numpy(spark):
    d = _duck(
        """
        SELECT ns.n_regionkey AS sr, nc.n_regionkey AS dr,
               SUM(l.l_extendedprice * (1 - l.l_discount)) AS w
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
        GROUP BY 1, 2
        """,
        tables=("lineitem", "orders", "customer", "nation", "supplier"),
    )
    sr = np.asarray(d["sr"]); dr = np.asarray(d["dr"])
    w = np.asarray(d["w"], dtype=np.float64)
    m = w.sum()
    rows = _rows(spark, "graph_modularity_regions")
    # region names sorted lexicographically == regionkey order? map via
    # region table instead.
    reg = _duck("SELECT r_regionkey, r_name FROM region ORDER BY 1",
                tables=("region",))
    name_of = dict(zip(reg["r_regionkey"], reg["r_name"]))
    q_total = 0.0
    for k in name_of:
        internal = w[(sr == k) & (dr == k)].sum()
        outw, inw = w[sr == k].sum(), w[dr == k].sum()
        contrib = internal / m - (outw / m) * (inw / m)
        q_total += contrib
        row = next(r for r in rows if r["region"] == str(name_of[k]))
        assert abs(row["q_contribution"] - contrib) < 1e-6
        assert abs(row["internal_frac"] - internal / m) < 1e-6
    # sanity: Q is bounded
    assert -1.0 <= q_total <= 1.0


def test_rake_vs_python(spark):
    d = _duck("SELECT doc_id, text FROM documents", tables=("documents",))
    stop = {"the", "a", "of", "and", "to", "in", "is", "on"}
    from collections import defaultdict

    phrases = []  # (phrase tuple)
    for text in d["text"]:
        cur = []
        for tok in str(text).strip().split():
            if tok in stop:
                if cur:
                    phrases.append(tuple(cur))
                cur = []
            else:
                cur.append(tok)
        if cur:
            phrases.append(tuple(cur))
    freq, deg = defaultdict(int), defaultdict(int)
    for p in phrases:
        for tok in p:
            freq[tok] += 1
            deg[tok] += len(p)
    from collections import Counter

    occ = Counter(phrases)
    scored = sorted(
        (
            (-sum(deg[t] for t in p), " ".join(p), len(p), c,
             sum(deg[t] for t in p),
             sum(deg[t] / freq[t] for t in p))
            for p, c in occ.items()
        )
    )[:15]
    rows = _rows(spark, "rake_keywords")
    assert len(rows) == 15
    for r, (_, phrase, ln, c, sdeg, score) in zip(rows, scored):
        assert r["phrase"] == phrase
        assert r["n_words"] == ln
        assert r["n_occurrences"] == c
        assert r["sum_deg"] == sdeg
        assert abs(r["rake_score"] - score) < 1e-4


def test_quantile_sketch_vs_python(spark):
    import hashlib

    d = _duck(
        "SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders",
        tables=("orders",),
    )
    keys = d["o_orderkey"]; grps = d["o_orderpriority"]
    vals = np.asarray(d["o_totalprice"], dtype=np.float64)
    h = np.array(
        [int(hashlib.md5(str(k).encode()).hexdigest()[:15], 16)
         for k in keys]
    )
    rows = {r["grp"]: r for r in _rows(spark, "quantile_sketch_rollup")}
    all_pool = []
    for g in sorted(set(map(str, grps))):
        mask = np.array([str(x) == g for x in grps])
        order = np.lexsort((vals[mask], h[mask]))[:1024]
        sample = vals[mask][order]
        all_pool.append((h[mask][order], sample))
        est = np.quantile(np.sort(sample), 0.5, method="linear")
        assert abs(rows[g]["est_median"] - est) / est < 1e-6
        assert rows[g]["sketch_rows"] == len(sample)
        exact = np.quantile(vals[mask], 0.5, method="linear")
        assert abs(rows[g]["exact_median"] - exact) / exact < 1e-6
        assert rows[g]["within_tol"] == int(
            abs(est - exact) * 100 <= 10 * exact
        )
    hs = np.concatenate([p[0] for p in all_pool])
    vs = np.concatenate([p[1] for p in all_pool])
    order = np.lexsort((vs, hs))[:1024]
    est_all = np.quantile(np.sort(vs[order]), 0.5, method="linear")
    assert abs(rows["ALL"]["est_median"] - est_all) / est_all < 1e-6


def test_overdispersion_vs_numpy(spark):
    d = _duck(
        """SELECT c.c_custkey, COUNT(o.o_orderkey) AS y
           FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
           GROUP BY 1""",
        tables=("orders", "customer"),
    )
    y = np.asarray(d["y"], dtype=np.float64)
    n, mean, var = len(y), y.mean(), y.var(ddof=1)
    disp = var / mean
    z = np.sqrt((n - 1) / 2.0) * (disp - 1)
    r = _rows(spark, "overdispersion_poisson")[0]
    assert r["n_customers"] == n
    assert abs(r["mean_orders"] - mean) < 1e-5
    assert abs(r["var_orders"] - var) / var < 1e-5
    assert abs(r["dispersion_index"] - disp) < 1e-5
    assert abs(r["z_score"] - z) < 1e-4
    assert r["overdispersed"] == int(z > 1.6449)


def test_mann_whitney_vs_scipy_formula(spark):
    d = _duck("SELECT l_linestatus AS g, l_extendedprice AS v FROM lineitem")
    g = np.asarray([str(x) for x in d["g"]])
    v = np.asarray(d["v"], dtype=np.float64)
    # Independent midrank path: scipy-free rankdata via argsort
    order = np.argsort(v, kind="stable")
    ranks = np.empty(len(v))
    sv = v[order]
    i = 0
    while i < len(sv):
        j = i
        while j + 1 < len(sv) and sv[j + 1] == sv[i]:
            j += 1
        ranks[order[i:j + 1]] = (i + j) / 2.0 + 1
        i = j + 1
    na, nb = int((g == "F").sum()), int((g != "F").sum())
    ra = ranks[g == "F"].sum()
    u = ra - na * (na + 1) / 2
    _, t = np.unique(v, return_counts=True)
    tie = (t.astype(np.float64) ** 3 - t).sum()
    n = na + nb
    sigma = np.sqrt(na * nb / 12.0 * ((n + 1) - tie / (n * (n - 1))))
    z = (u - na * nb / 2) / sigma

    r = _rows(spark, "mann_whitney_u")[0]
    assert (r["n_a"], r["n_b"]) == (na, nb)
    assert abs(r["u_stat"] - u) / u < 1e-6
    assert abs(r["cles"] - u / (na * nb)) < 1e-6
    assert abs(r["z_score"] - z) < 1e-4


def test_brown_forsythe_vs_numpy(spark):
    d = _duck("SELECT c_mktsegment AS g, c_acctbal AS y FROM customer",
              tables=("customer",))
    g = np.asarray([str(x) for x in d["g"]])
    y = np.asarray(d["y"], dtype=np.float64)
    zs, labels = [], []
    for seg in np.unique(g):
        yy = y[g == seg]
        zs.append(np.abs(yy - np.quantile(yy, 0.5, method="linear")))
        labels.append(np.full(len(yy), seg))
    z = np.concatenate(zs); lab = np.concatenate(labels)
    k, n = len(np.unique(lab)), len(z)
    grand = z.mean()
    ssb = sum(len(z[lab == s]) * (z[lab == s].mean() - grand) ** 2
              for s in np.unique(lab))
    ssw = sum(((z[lab == s] - z[lab == s].mean()) ** 2).sum()
              for s in np.unique(lab))
    f_ref = (ssb / (k - 1)) / (ssw / (n - k))

    r = _rows(spark, "brown_forsythe_variance")[0]
    assert (r["n_total"], r["k_groups"]) == (n, k)
    assert (r["df_between"], r["df_within"]) == (k - 1, n - k)
    assert abs(r["f_stat"] - f_ref) / max(1.0, f_ref) < 1e-5


def test_mediation_vs_numpy(spark):
    d = _duck(
        """SELECT c.c_acctbal AS x, COUNT(o.o_orderkey) AS m,
                  COALESCE(SUM(o.o_totalprice), 0.0) AS y
           FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
           GROUP BY c.c_custkey, c.c_acctbal""",
        tables=("orders", "customer"),
    )
    x = np.asarray(d["x"], dtype=np.float64)
    m = np.asarray(d["m"], dtype=np.float64)
    y = np.asarray(d["y"], dtype=np.float64)
    n = len(x)
    # Independent solver: lstsq on design matrices, not moment algebra
    A1 = np.column_stack([np.ones(n), x])
    a = np.linalg.lstsq(A1, m, rcond=None)[0][1]
    res_a = m - A1 @ np.linalg.lstsq(A1, m, rcond=None)[0]
    se_a = np.sqrt(
        (res_a @ res_a / (n - 2)) / ((x - x.mean()) ** 2).sum()
    )
    A2 = np.column_stack([np.ones(n), x, m])
    coef2, *_ = np.linalg.lstsq(A2, y, rcond=None)
    c_prime, b = coef2[1], coef2[2]
    res2 = y - A2 @ coef2
    sigma2 = res2 @ res2 / (n - 3)
    cov = sigma2 * np.linalg.inv(A2.T @ A2)
    se_b = np.sqrt(cov[2, 2])
    c = np.linalg.lstsq(A1, y, rcond=None)[0][1]
    sobel = a * b / np.sqrt(a * a * se_b**2 + b * b * se_a**2)

    r = _rows(spark, "mediation_sobel")[0]
    assert r["n"] == n
    for k, v in [("a_path", a), ("se_a", se_a), ("b_path", b),
                 ("se_b", se_b), ("total_effect", c),
                 ("direct_effect", c_prime), ("indirect_effect", a * b),
                 ("sobel_z", sobel)]:
        assert abs(r[k] - v) / max(1e-9, abs(v)) < 1e-4, (k, r[k], v)


def test_dp_noisy_counts_vs_python(spark):
    import hashlib, math

    d = _duck(
        "SELECT o_orderpriority AS g, COUNT(*) AS n FROM orders GROUP BY 1",
        tables=("orders",),
    )
    true = dict(zip([str(g) for g in d["g"]], [int(v) for v in d["n"]]))
    true["ALL"] = sum(true.values())
    rows = {r["grp"]: r for r in _rows(spark, "dp_noisy_counts")}
    assert set(rows) == set(true)
    for g, n in true.items():
        h = int(hashlib.md5(f"dp-release-r6|{g}".encode())
                .hexdigest()[:15], 16)
        u = h / 2**60 - 0.5
        lap = -(1 / 0.5) * (1.0 if u >= 0 else -1.0) * math.log(1 - 2 * abs(u))
        r = rows[g]
        assert r["true_count"] == n
        assert abs(r["noisy_count"] - (n + lap)) < 1e-3
        assert abs(r["abs_noise"] - abs(lap)) < 1e-5
        assert r["within_999_bound"] == int(abs(lap) <= 2 * math.log(1000))


def test_alignment_uniformity_vs_numpy(spark):
    import hashlib

    d = _duck(
        "SELECT vec_id, label, embedding FROM embeddings ORDER BY vec_id",
        tables=("embeddings",),
    )
    E = np.vstack(d["embedding"]).astype(np.float64)
    E = E / np.linalg.norm(E, axis=1, keepdims=True)
    labels = np.asarray(d["label"])
    ids = np.asarray(d["vec_id"])
    # positives
    d2s = []
    for lb in np.unique(labels):
        X = E[labels == lb]
        G = X @ X.T
        iu = np.triu_indices(len(X), k=1)
        d2s.append(2 - 2 * G[iu])
    pos = np.concatenate(d2s)
    # uniformity sample: md5 bucket join
    bkt = np.array(
        [int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % 16
         for i in ids]
    )
    u2 = []
    for bk in range(16):
        X = E[bkt == bk]
        G = X @ X.T
        iu = np.triu_indices(len(X), k=1)
        u2.append(2 - 2 * G[iu])
    usamp = np.concatenate(u2)
    r = _rows(spark, "alignment_uniformity")[0]
    assert r["n_vecs"] == len(E)
    assert r["n_pos_pairs"] == len(pos)
    assert r["n_sample_pairs"] == len(usamp)
    assert abs(r["alignment"] - pos.mean()) < 1e-5
    assert abs(r["uniformity"] - np.log(np.exp(-2 * usamp).mean())) < 1e-5


def test_simpsons_check_vs_numpy(spark):
    d = _duck(
        "SELECT l_returnflag AS g, l_quantity AS x, l_extendedprice AS y "
        "FROM lineitem"
    )
    g = np.asarray([str(v) for v in d["g"]])
    x = np.asarray(d["x"], dtype=np.float64)
    y = np.asarray(d["y"], dtype=np.float64)
    pooled = np.polyfit(x, y, 1)[0]
    rows = {r["grp"]: r for r in _rows(spark, "simpsons_paradox_check")}
    assert set(rows) == set(np.unique(g))
    for grp in np.unique(g):
        sl = np.polyfit(x[g == grp], y[g == grp], 1)[0]
        r = rows[str(grp)]
        assert r["n"] == int((g == grp).sum())
        assert abs(r["group_slope"] - sl) / max(1.0, abs(sl)) < 1e-5
        assert abs(r["pooled_slope"] - pooled) / max(1.0, abs(pooled)) < 1e-5
        assert r["sign_reversal"] == int(sl * pooled < 0)


def test_term_dispersion_vs_python(spark):
    from collections import Counter, defaultdict

    d = _duck("SELECT source, text FROM documents", tables=("documents",))
    part = Counter()
    tf = defaultdict(Counter)
    for src, text in zip(d["source"], d["text"]):
        toks = str(text).strip().split()
        part[str(src)] += len(toks)
        tf[str(src)].update(toks)
    T = sum(part.values())
    cf = Counter()
    for src in tf:
        cf.update(tf[src])
    scored = []
    for t, ft in cf.items():
        if ft < 100:
            continue
        num = sum(
            abs(tf[src][t] * T - ft * part[src]) for src in part
        )
        scored.append((num / (2.0 * ft * T), t, ft))
    top = sorted(scored, key=lambda z: (-z[0], z[1]))[:20]
    rows = _rows(spark, "term_dispersion_dp")
    assert len(rows) == len(top)
    for r, (dp, t, ft) in zip(rows, top):
        assert r["term"] == t
        assert r["corpus_freq"] == ft
        assert abs(r["dp"] - dp) < 1e-6


def test_heaps_law_vs_python(spark):
    d = _duck("SELECT doc_id, text FROM documents ORDER BY doc_id",
              tables=("documents",))
    tris_by_doc = []
    for text in d["text"]:
        toks = str(text).strip().split()
        tris_by_doc.append(
            [" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)]
        )
    n = int(max(d["doc_id"])) + 1
    xs, ys = [], []
    # straightforward recompute per cut
    for k in range(1, 33):
        cut = int(np.floor(n * k / 32.0))
        seen = set()
        counts = 0
        for doc_id, tris in zip(d["doc_id"], tris_by_doc):
            if int(doc_id) < cut:
                counts += len(tris)
                seen.update(tris)
        if counts > 0:
            xs.append(np.log(counts))
            ys.append(np.log(len(seen)))
    beta, lnk = np.polyfit(xs, ys, 1)
    r2 = np.corrcoef(xs, ys)[0, 1] ** 2

    r = _rows(spark, "heaps_law_fit")[0]
    assert r["n_points"] == len(xs)
    assert abs(r["beta"] - beta) < 1e-5
    assert abs(r["ln_k"] - lnk) < 1e-4
    assert abs(r["r2"] - r2) < 1e-5
    assert 0.0 < r["beta"] < 1.0


def test_effective_rank_vs_numpy(spark):
    d = _duck("SELECT embedding FROM embeddings ORDER BY vec_id",
              tables=("embeddings",))
    E = np.vstack(d["embedding"]).astype(np.float64)
    C = np.cov(E, rowvar=False, ddof=1)
    lam = np.linalg.eigvalsh(C)
    erank_ref = lam.sum() ** 2 / (lam**2).sum()

    r = _rows(spark, "embedding_effective_rank")[0]
    assert r["n_rows"] == E.shape[0]
    assert r["n_dims"] == E.shape[1]
    assert abs(r["total_variance"] - np.trace(C)) / np.trace(C) < 1e-6
    assert abs(r["effective_rank"] - erank_ref) / erank_ref < 1e-6
    assert abs(r["rank_fraction"] - erank_ref / E.shape[1]) < 1e-6


def test_cluster_label_nmi_vs_numpy(spark):
    # contingency recomputed from the query's OWN assignment relation
    # (the kmeans operator is certified elsewhere); the entropy/MI
    # algebra here is the independent path.
    from axolotls_spark.operators import clustering as CLU
    from axolotls_spark.io.sources import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    assign, _ = CLU.kmeans(emb.select("vec_id", "embedding"), k=8, iters=2)
    rows = (
        assign.select("vec_id", "cid")
        .join(emb.select("vec_id", "label"), "vec_id")
        .collect()
    )
    from collections import Counter

    cont = Counter((r["cid"], r["label"]) for r in rows)
    n = sum(cont.values())
    ni = Counter(); nj = Counter()
    for (c, l), v in cont.items():
        ni[c] += v; nj[l] += v
    mi = sum(
        v / n * np.log(v * n / (ni[c] * nj[l]))
        for (c, l), v in cont.items()
    )
    hc = -sum(v / n * np.log(v / n) for v in ni.values())
    hl = -sum(v / n * np.log(v / n) for v in nj.values())
    r = _rows(spark, "cluster_label_nmi")[0]
    assert r["n_vecs"] == n
    assert (r["n_clusters"], r["n_labels"]) == (len(ni), len(nj))
    assert abs(r["mutual_info"] - mi) < 1e-6
    assert abs(r["nmi"] - mi / np.sqrt(hc * hl)) < 1e-6
    assert 0.0 <= r["nmi"] <= 1.0


def test_rmst_vs_numpy(spark):
    d = _duck(
        """
        WITH g AS (SELECT CAST(MAX(o_orderdate) AS DATE) AS gmax FROM orders)
        SELECT DATEDIFF('day', CAST(MIN(o_orderdate) AS DATE),
                        CAST(MAX(o_orderdate) AS DATE)) AS dur,
               CASE WHEN DATEDIFF('day', CAST(MAX(o_orderdate) AS DATE),
                                  (SELECT gmax FROM g)) > 90
                    THEN 1 ELSE 0 END AS ev
        FROM orders GROUP BY o_custkey
        """,
        tables=("orders",),
    )
    dur = np.asarray(d["dur"]); ev = np.asarray(d["ev"])
    ts = np.unique(dur)
    # straight-line KM + trapezoid-free step integral
    s, rmst, prev_t, n_at_risk = 1.0, 0.0, 0, len(dur)
    for t in ts:
        rmst += s * (t - prev_t)
        dth = int(ev[dur == t].sum())
        s *= max(1 - dth / n_at_risk, 1e-12)
        n_at_risk -= int((dur == t).sum())
        prev_t = t
    r = _rows(spark, "rmst_retention")[0]
    assert r["n_customers"] == len(dur)
    assert r["tau_days"] == int(ts.max())
    assert abs(r["rmst_days"] - rmst) / rmst < 1e-5


def test_randomized_response_vs_python(spark):
    import hashlib

    d = _duck("SELECT c_custkey, c_mktsegment FROM customer",
              tables=("customer",))
    n = nt = nr = 0
    for key, seg in zip(d["c_custkey"], d["c_mktsegment"]):
        truth = int(str(seg) == "BUILDING")
        u1 = int(hashlib.md5(f"rr-release-r6|coin|{key}".encode())
                 .hexdigest()[:15], 16) / 2**60
        rbit = int(hashlib.md5(f"rr-release-r6|bit|{key}".encode())
                   .hexdigest()[:15], 16) % 2
        resp = rbit if u1 < 0.5 else truth
        n += 1; nt += truth; nr += resp
    r = _rows(spark, "local_dp_randomized_response")[0]
    assert (r["n_respondents"], r["n_true_holders"],
            r["n_yes_reports"]) == (n, nt, nr)
    p_deb = (nr / n - 0.25) / 0.5
    assert abs(r["p_debiased"] - p_deb) < 1e-6
    se3 = 3 * np.sqrt((nr / n) * (1 - nr / n) / n) / 0.5
    assert r["within_3se"] == int(abs(p_deb - nt / n) <= se3)


def test_lm_dirichlet_vs_python(spark):
    from collections import Counter, defaultdict

    d = _duck("SELECT doc_id, text FROM documents", tables=("documents",))
    tf = defaultdict(Counter)
    for did, text in zip(d["doc_id"], d["text"]):
        tf[int(did)].update(str(text).strip().split())
    dl = {did: sum(c.values()) for did, c in tf.items()}
    coll = Counter()
    for c in tf.values():
        coll.update(c)
    T = sum(coll.values())
    from axolotls_spark.queries_text import _BM25_QUERIES

    got = defaultdict(list)
    for r in _rows(spark, "lm_dirichlet_search"):
        got[r["query_id"]].append((r["doc_id"], r["score"]))
    for qid, terms in _BM25_QUERIES:
        # terms absent from the collection are dropped by the coll
        # join in both engines; a query with no present terms scores
        # no documents.
        present = [t for t in terms if coll[t] > 0]
        if not present:
            assert got[qid] == []
            continue
        scores = {}
        for did in tf:
            s = 0.0
            for t in present:
                s += np.log(
                    (tf[did][t] + 100.0 * coll[t] / T) / (dl[did] + 100.0)
                )
            scores[did] = s
        top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        assert [g[0] for g in sorted(got[qid],
                                     key=lambda g: (-g[1], g[0]))] == [
            t[0] for t in top
        ]
        for (gd, gs), (td, ts_) in zip(
            sorted(got[qid], key=lambda g: (-g[1], g[0])), top
        ):
            assert abs(gs - ts_) < 1e-5


def test_theil_vs_numpy(spark):
    d = _duck(
        """SELECT c.c_mktsegment AS seg, SUM(o.o_totalprice) AS y
           FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
           GROUP BY o.o_custkey, c.c_mktsegment""",
        tables=("orders", "customer"),
    )
    y = np.asarray(d["y"], dtype=np.float64)
    seg = np.asarray([str(s) for s in d["seg"]])
    mu = y.mean()
    t_total = np.mean((y / mu) * np.log(y / mu))
    t_between = t_within = 0.0
    for s in np.unique(seg):
        yy = y[seg == s]
        mg = yy.mean()
        share = yy.sum() / y.sum()
        t_between += share * np.log(mg / mu)
        t_within += share * np.mean((yy / mg) * np.log(yy / mg))
    r = _rows(spark, "theil_index_spend")[0]
    assert r["n_customers"] == len(y)
    assert abs(r["theil_total"] - t_total) < 1e-6
    assert abs(r["theil_between"] - t_between) < 1e-6
    assert abs(r["theil_within"] - t_within) < 1e-6
    # additive decomposition: total = between + within
    assert abs(r["theil_total"]
               - (r["theil_between"] + r["theil_within"])) < 1e-5


def test_assortativity_vs_numpy(spark):
    d = _duck(
        """
        SELECT ns.n_name AS src, nc.n_name AS dst,
               SUM(l.l_extendedprice * (1 - l.l_discount)) AS w
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
        GROUP BY 1, 2
        """,
        tables=("lineitem", "orders", "customer", "nation", "supplier"),
    )
    src = np.asarray([str(x) for x in d["src"]])
    dst = np.asarray([str(x) for x in d["dst"]])
    w = np.asarray(d["w"], dtype=np.float64)
    outs = {s: w[src == s].sum() for s in np.unique(src)}
    ins = {t: w[dst == t].sum() for t in np.unique(dst)}
    x = np.array([outs[s] for s in src])
    yv = np.array([ins[t] for t in dst])
    sw = w.sum()
    mx, my = (w * x).sum() / sw, (w * yv).sum() / sw
    cov = (w * (x - mx) * (yv - my)).sum()
    vx = (w * (x - mx) ** 2).sum()
    vy = (w * (yv - my) ** 2).sum()
    r_ref = cov / np.sqrt(vx * vy)
    r = _rows(spark, "graph_assortativity")[0]
    assert r["n_edges"] == len(w)
    assert abs(r["assortativity"] - r_ref) < 1e-6
    assert -1.0 <= r["assortativity"] <= 1.0


def test_burstiness_vs_numpy(spark):
    d = _duck(
        "SELECT user_id, ts, event_id FROM events ORDER BY user_id, ts,"
        " event_id",
        tables=("events",),
    )
    from collections import defaultdict

    per = defaultdict(list)
    for u, t in zip(d["user_id"], d["ts"]):
        per[int(u)].append(np.datetime64(t, "s").astype(np.int64))
    bis, mus = [], []
    for u, ts in per.items():
        g = np.diff(np.asarray(sorted(ts), dtype=np.float64))
        if len(g) < 10:
            continue
        mu, sd = g.mean(), g.std(ddof=1)
        mus.append(mu)
        bis.append((sd - mu) / (sd + mu))
    r = _rows(spark, "burstiness_interevent")[0]
    assert r["n_users"] == len(bis)
    assert abs(r["mean_gap_seconds"] - np.mean(mus)) / np.mean(mus) < 1e-5
    assert abs(r["mean_burstiness"] - np.mean(bis)) < 1e-5
    assert abs(r["min_burstiness"] - min(bis)) < 1e-6
    assert abs(r["max_burstiness"] - max(bis)) < 1e-6


def test_weighted_median_vs_numpy(spark):
    d = _duck(
        "SELECT l_extendedprice / l_quantity AS v, l_quantity AS wt"
        " FROM lineitem"
    )
    v = np.asarray(d["v"], dtype=np.float64)
    wt = np.asarray(d["wt"], dtype=np.int64)
    order = np.argsort(v, kind="stable")
    vs, ws = v[order], wt[order]
    cw = np.cumsum(ws)
    wmed = vs[np.searchsorted(2 * cw, ws.sum(), side="left")]
    r = _rows(spark, "weighted_median_unit_price")[0]
    assert r["total_weight"] == int(wt.sum())
    assert abs(r["weighted_median"] - wmed) / wmed < 1e-6
    umed = np.quantile(v, 0.5, method="linear")
    assert abs(r["unweighted_median"] - umed) / umed < 1e-6


def test_price_index_vs_numpy(spark):
    d = _duck(
        """
        SELECT l.l_partkey AS pk, YEAR(CAST(o.o_orderdate AS DATE)) AS yr,
               SUM(l.l_quantity) AS q,
               SUM(l.l_extendedprice) / SUM(l.l_quantity) AS p
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE YEAR(CAST(o.o_orderdate AS DATE)) IN (1995, 1996)
        GROUP BY 1, 2
        """,
        tables=("lineitem", "orders"),
    )
    rows = {}
    for pk, yr, q, p in zip(d["pk"], d["yr"], d["q"], d["p"]):
        rows.setdefault(int(pk), {})[int(yr)] = (float(p), float(q))
    p1q0 = p0q0 = p1q1 = p0q1 = 0.0
    n = 0
    for pk, years in rows.items():
        if 1995 in years and 1996 in years:
            (p0, q0), (p1, q1) = years[1995], years[1996]
            n += 1
            p1q0 += p1 * q0; p0q0 += p0 * q0
            p1q1 += p1 * q1; p0q1 += p0 * q1
    lasp, paas = p1q0 / p0q0, p1q1 / p0q1
    r = _rows(spark, "price_index_fisher")[0]
    assert r["n_parts"] == n
    assert abs(r["laspeyres"] - lasp) < 1e-6
    assert abs(r["paasche"] - paas) < 1e-6
    assert abs(r["fisher"] - np.sqrt(lasp * paas)) < 1e-6


def test_chapman_vs_python(spark):
    d = _duck(
        """SELECT DISTINCT o_custkey, YEAR(CAST(o_orderdate AS DATE)) AS yr
           FROM orders WHERE YEAR(CAST(o_orderdate AS DATE)) IN (1995, 1996)
        """,
        tables=("orders",),
    )
    s1 = {int(k) for k, y in zip(d["o_custkey"], d["yr"]) if y == 1995}
    s2 = {int(k) for k, y in zip(d["o_custkey"], d["yr"]) if y == 1996}
    n1, n2, m = len(s1), len(s2), len(s1 & s2)
    est = (n1 + 1) * (n2 + 1) / (m + 1) - 1
    se = np.sqrt(
        (n1 + 1) * (n2 + 1) * (n1 - m) * (n2 - m)
        / ((m + 1) ** 2 * (m + 2))
    )
    r = _rows(spark, "capture_recapture_chapman")[0]
    assert (r["n_capture_1"], r["n_capture_2"], r["n_recaptured"]) == (
        n1, n2, m,
    )
    assert abs(r["chapman_estimate"] - est) / est < 1e-6
    assert abs(r["chapman_se"] - se) / max(1.0, se) < 1e-5


def test_entropy_rate_vs_python(spark):
    from collections import Counter, defaultdict

    d = _duck(
        "SELECT user_id, event_type, ts, event_id FROM events"
        " ORDER BY user_id, ts, event_id",
        tables=("events",),
    )
    seq = defaultdict(list)
    for u, e in zip(d["user_id"], d["event_type"]):
        seq[int(u)].append(str(e))
    trans = Counter()
    for u, evs in seq.items():
        for a, b in zip(evs, evs[1:]):
            trans[(a, b)] += 1
    tot = sum(trans.values())
    marg = Counter()
    for (a, _), c in trans.items():
        marg[a] += c
    rate = sum(
        (c / tot) * np.log(marg[a] / c) for (a, _), c in trans.items()
    )
    r = _rows(spark, "markov_entropy_rate")[0]
    assert r["n_transitions"] == tot
    assert r["n_states"] == len(marg)
    assert abs(r["entropy_rate_nats"] - rate) < 1e-6
    assert abs(r["normalized_rate"] - rate / np.log(len(marg))) < 1e-6


def test_hurst_vs_numpy(spark):
    d = _duck(
        """SELECT CAST(o_orderdate AS DATE) AS day, SUM(o_totalprice) AS y
           FROM orders GROUP BY 1 ORDER BY 1""",
        tables=("orders",),
    )
    y = np.asarray(d["y"], dtype=np.float64)
    xs, ys, nblocks = [], [], 0
    for n in (8, 16, 32, 64):
        rss = []
        for b in range(len(y) // n):
            seg = y[b * n:(b + 1) * n]
            s = seg.std(ddof=1)
            if s <= 0:
                continue
            cd = np.cumsum(seg - seg.mean())
            rss.append((cd.max() - cd.min()) / s)
        if rss:
            xs.append(np.log(n)); ys.append(np.log(np.mean(rss)))
            nblocks += len(rss)
    h_ref = np.polyfit(xs, ys, 1)[0]
    r = _rows(spark, "hurst_exponent_revenue")[0]
    assert r["n_scales"] == len(xs)
    assert r["n_blocks_total"] == nblocks
    assert abs(r["hurst_exponent"] - h_ref) < 1e-5
    assert 0.0 < r["hurst_exponent"] < 1.0


def test_lsh_band_design_vs_python(spark):
    rows = {r["b"]: r for r in _rows(spark, "lsh_band_design")}
    divisors = [b for b in range(1, 129) if 128 % b == 0]
    assert sorted(rows) == divisors
    for b in divisors:
        r_ = 128 // b
        thr = b ** (-1.0 / r_)
        catch = 1 - (1 - 0.8**r_) ** b
        false = 1 - (1 - 0.5**r_) ** b
        row = rows[b]
        assert row["r"] == r_
        assert abs(row["threshold"] - thr) < 1e-6
        assert abs(row["p_catch_at_tau"] - catch) < 1e-6
        assert abs(row["p_false_at_tau_minus_30"] - false) < 1e-6
        assert row["meets_spec"] == int(catch >= 0.90 and false <= 0.10)
    # b=16, r=8 meets the 90/10 spec for k=128, tau=0.8
    assert any(r["meets_spec"] for r in rows.values())


def test_js_divergence_vs_python(spark):
    from collections import Counter, defaultdict

    d = _duck("SELECT source, text FROM documents", tables=("documents",))
    tf = defaultdict(Counter)
    for src, text in zip(d["source"], d["text"]):
        tf[str(src)].update(str(text).strip().split())
    dist = {
        s: {t: c / sum(cnt.values()) for t, c in cnt.items()}
        for s, cnt in tf.items()
    }
    got = {(r["src_a"], r["src_b"]): r
           for r in _rows(spark, "js_divergence_sources")}
    srcs = sorted(dist)
    assert len(got) == len(srcs) * (len(srcs) - 1) // 2
    for i, sa in enumerate(srcs):
        for sb in srcs[i + 1:]:
            pa, pb = dist[sa], dist[sb]
            js = 0.0
            for t in set(pa) | set(pb):
                p, q = pa.get(t, 0.0), pb.get(t, 0.0)
                m = (p + q) / 2
                if p > 0:
                    js += 0.5 * p * np.log(p / m)
                if q > 0:
                    js += 0.5 * q * np.log(q / m)
            r = got[(sa, sb)]
            assert abs(r["js_divergence"] - js) < 1e-6
            assert 0.0 <= r["js_divergence"] <= np.log(2) + 1e-9


def test_permutation_entropy_vs_numpy(spark):
    d = _duck(
        """SELECT CAST(o_orderdate AS DATE) AS day, SUM(o_totalprice) AS y
           FROM orders GROUP BY 1 ORDER BY 1""",
        tables=("orders",),
    )
    y = np.asarray(d["y"], dtype=np.float64)
    pats = []
    for i in range(len(y) - 2):
        a, b, c = y[i], y[i + 1], y[i + 2]
        if a <= b <= c:
            p = 0
        elif a <= c < b:
            p = 1
        elif b < a <= c:
            p = 2
        elif c < a <= b:
            p = 3
        elif b <= c < a:
            p = 4
        else:
            p = 5
        pats.append(p)
    from collections import Counter

    cnt = Counter(pats)
    t = len(pats)
    h = sum((c / t) * np.log(t / c) for c in cnt.values())
    r = _rows(spark, "permutation_entropy_revenue")[0]
    assert r["n_windows"] == t
    assert r["n_patterns_seen"] == len(cnt)
    assert abs(r["perm_entropy_nats"] - h) < 1e-6
    assert abs(r["normalized"] - h / np.log(6)) < 1e-6


def test_periodogram_vs_numpy(spark):
    d = _duck(
        """SELECT CAST(o_orderdate AS DATE) AS day, SUM(o_totalprice) AS y
           FROM orders GROUP BY 1 ORDER BY 1""",
        tables=("orders",),
    )
    y = np.asarray(d["y"], dtype=np.float64)
    n = len(y)
    t = np.arange(n)
    yc = y - y.mean()
    ss = ((y - y.mean()) ** 2).sum()
    rows = {r["period_days"]: r
            for r in _rows(spark, "periodogram_seasonal_power")}
    assert sorted(rows) == [7, 30, 365]
    for per in (7, 30, 365):
        re = (yc * np.cos(2 * np.pi * t / per)).sum()
        im = (yc * np.sin(2 * np.pi * t / per)).sum()
        share = 2 * (re**2 + im**2) / (ss * n)
        assert abs(rows[per]["power_share"] - share) < 1e-6
        assert 0.0 <= rows[per]["power_share"] <= 1.0 + 1e-9


def test_ece_consistency_with_bins(spark):
    """ECE recomputed from logreg_calibration_bins' own output (the
    two queries share the scoring relation; this pins the summary
    to the diagram)."""
    bins = _rows(spark, "logreg_calibration_bins")
    n = sum(b["n_docs"] for b in bins)
    ece = sum(
        (b["n_docs"] / n) * abs(b["frac_positive"] - b["avg_pred"])
        for b in bins
    )
    mce = max(abs(b["frac_positive"] - b["avg_pred"]) for b in bins)
    r = _rows(spark, "expected_calibration_error")[0]
    assert r["n_docs"] == n
    assert r["n_bins"] == len(bins)
    assert abs(r["ece"] - ece) < 1e-6
    assert abs(r["mce"] - mce) < 1e-6


def test_hill_profile_vs_python(spark):
    from collections import Counter

    d = _duck("SELECT text FROM documents", tables=("documents",))
    cnt = Counter()
    for text in d["text"]:
        cnt.update(str(text).strip().split())
    t = sum(cnt.values())
    p = np.array([c / t for c in cnt.values()])
    shannon = -(p * np.log(p)).sum()
    r = _rows(spark, "hill_diversity_profile")[0]
    assert r["hill_q0"] == len(cnt)
    assert abs(r["hill_q1"] - np.exp(shannon)) / np.exp(shannon) < 1e-5
    assert abs(r["hill_q2"] - 1 / (p**2).sum()) / r["hill_q2"] < 1e-5
    assert abs(r["hill_qinf"] - 1 / p.max()) / r["hill_qinf"] < 1e-6
    assert abs(r["evenness"] - shannon / np.log(len(cnt))) < 1e-6
    # Hill numbers are monotone nonincreasing in q
    assert r["hill_q0"] >= r["hill_q1"] >= r["hill_q2"] >= r["hill_qinf"]


def test_mde_vs_numpy(spark):
    d = _duck(
        """SELECT COALESCE(SUM(o.o_totalprice), 0.0) AS y
           FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
           GROUP BY c.c_custkey""",
        tables=("orders", "customer"),
    )
    y = np.asarray(d["y"], dtype=np.float64)
    n, mu, sd = len(y), y.mean(), y.std(ddof=1)
    mde = (1.959963984540054 + 0.8416212335729143) * sd * np.sqrt(
        2 / (n / 2)
    )
    r = _rows(spark, "power_analysis_mde")[0]
    assert r["n_units"] == n
    assert abs(r["sd_outcome"] - sd) / sd < 1e-6
    assert abs(r["mde_abs"] - mde) / mde < 1e-6
    assert abs(r["mde_rel"] - mde / mu) < 1e-6


def test_cramers_v_vs_numpy(spark):
    d = _duck(
        """SELECT o_orderpriority AS a, o_orderstatus AS b, COUNT(*) AS c
           FROM orders GROUP BY 1, 2""",
        tables=("orders",),
    )
    pris = sorted(set(d["a"]))
    sts = sorted(set(d["b"]))
    tab = np.zeros((len(pris), len(sts)))
    for a, b, c in zip(d["a"], d["b"], d["c"]):
        tab[pris.index(a), sts.index(b)] = c
    n = tab.sum()
    e = np.outer(tab.sum(1), tab.sum(0)) / n
    chi2 = ((tab - e) ** 2 / e).sum()
    r_, c_ = tab.shape
    v = np.sqrt(chi2 / (n * (min(r_, c_) - 1)))
    phi2c = max(0.0, chi2 / n - (r_ - 1) * (c_ - 1) / (n - 1))
    vc = np.sqrt(
        phi2c
        / min(r_ - (r_ - 1) ** 2 / (n - 1), c_ - (c_ - 1) ** 2 / (n - 1))
    )
    row = _rows(spark, "cramers_v_association")[0]
    assert row["n"] == int(n)
    assert abs(row["chi2"] - chi2) < 1e-4
    assert abs(row["cramers_v"] - v) < 1e-5
    assert abs(row["cramers_v_corrected"] - vc) < 1e-5


def test_cochran_armitage_vs_numpy(spark):
    d = _duck(
        """SELECT CAST(SUBSTR(o_orderpriority, 1, 1) AS BIGINT) AS w,
                  COUNT(*) AS n,
                  SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS r
           FROM orders GROUP BY 1""",
        tables=("orders",),
    )
    w = np.asarray(d["w"], dtype=np.float64)
    n = np.asarray(d["n"], dtype=np.float64)
    r = np.asarray(d["r"], dtype=np.float64)
    nn, rr = n.sum(), r.sum()
    pbar = rr / nn
    t = (w * r).sum() - pbar * (w * n).sum()
    var = pbar * (1 - pbar) * ((w * w * n).sum() - (w * n).sum() ** 2 / nn)
    row = _rows(spark, "cochran_armitage_trend")[0]
    assert row["n_total"] == int(nn)
    assert row["n_events"] == int(rr)
    assert abs(row["z_trend"] - t / np.sqrt(var)) < 1e-5


def test_tukey_hsd_vs_numpy(spark):
    d = _duck(
        """SELECT c.c_mktsegment AS seg, o.o_totalprice AS y
           FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey""",
        tables=("orders", "customer"),
    )
    segs = sorted(set(d["seg"]))
    ys = {s: np.asarray(
        [y for g, y in zip(d["seg"], d["y"]) if g == s], dtype=np.float64
    ) for s in segs}
    nn = sum(len(v) for v in ys.values())
    msw = sum(((v - v.mean()) ** 2).sum() for v in ys.values()) / (
        nn - len(segs)
    )
    rows = {(r["seg_a"], r["seg_b"]): r
            for r in _rows(spark, "tukey_hsd_pairs")}
    assert len(rows) == len(segs) * (len(segs) - 1) // 2
    for i, a in enumerate(segs):
        for b in segs[i + 1:]:
            diff = ys[a].mean() - ys[b].mean()
            hsd = 3.858 * np.sqrt(
                msw / 2 * (1 / len(ys[a]) + 1 / len(ys[b]))
            )
            r = rows[(a, b)]
            assert abs(r["mean_diff"] - diff) < 2e-3
            assert abs(r["hsd_threshold"] - hsd) < 2e-3
            assert r["significant"] == int(abs(diff) > hsd)


def test_lift_gain_vs_numpy(spark):
    d = _duck(
        "SELECT doc_id, n_chars, lang FROM documents",
        tables=("documents",),
    )
    order = sorted(
        range(len(d["doc_id"])),
        key=lambda i: (-int(d["n_chars"][i]), int(d["doc_id"][i])),
    )
    pos = np.asarray(
        [1 if d["lang"][i] == "en" else 0 for i in order], dtype=np.int64
    )
    n, p = len(pos), int(pos.sum())
    dec = np.asarray([(k * 10) // n for k in range(n)])
    rows = sorted(_rows(spark, "lift_gain_deciles"),
                  key=lambda r: r["decile"])
    assert len(rows) == 10
    cum = 0
    for r in rows:
        mask = dec == r["decile"]
        nd, pd_ = int(mask.sum()), int(pos[mask].sum())
        cum += pd_
        assert (r["n_docs"], r["positives"]) == (nd, pd_)
        assert abs(r["response_rate"] - pd_ / nd) < 1e-9
        assert abs(r["lift"] - pd_ * n / (nd * p)) < 1e-5
        assert abs(r["cum_gain"] - cum / p) < 1e-9


def test_mcnemar_vs_python(spark):
    d = _duck(
        r"""SELECT n_chars,
                   len(string_split_regex(trim(text), '\s+')) AS nw
            FROM documents""",
        tables=("documents",),
    )
    ga = np.asarray(d["n_chars"]) >= 200
    gb = np.asarray(d["nw"]) >= 36
    b = int((ga & ~gb).sum())
    c = int((~ga & gb).sum())
    row = _rows(spark, "mcnemar_gate_flip")[0]
    assert (row["only_chars"], row["only_words"]) == (b, c)
    assert abs(
        row["mcnemar_chi2"] - (abs(b - c) - 1) ** 2 / (b + c)
    ) < 1e-6


def test_raking_ipf_vs_numpy(spark):
    d = _duck(
        "SELECT lang, source, COUNT(*) AS n FROM documents GROUP BY 1, 2",
        tables=("documents",),
    )
    langs = sorted(set(d["lang"]))
    srcs = sorted(set(d["source"]))
    tab = np.zeros((len(langs), len(srcs)))
    for l, s, n in zip(d["lang"], d["source"], d["n"]):
        tab[langs.index(l), srcs.index(s)] = n
    w = tab.astype(np.float64).copy()
    nn = tab.sum()
    rt, ct = nn / len(langs), nn / len(srcs)
    for _ in range(3):
        w *= rt / w.sum(axis=1, keepdims=True)
        w *= ct / w.sum(axis=0, keepdims=True)
    rows = _rows(spark, "raking_ipf_weights")
    assert len(rows) == int((tab > 0).sum())
    for r in rows:
        i, j = langs.index(r["lang"]), srcs.index(r["source"])
        assert abs(r["raked_mass"] - w[i, j]) < 1e-3
        assert abs(r["unit_weight"] - w[i, j] / tab[i, j]) < 1e-3
    # After 3 sweeps the column margins are EXACT (last sweep scales
    # them) and row margins nearly so — the convergence IPF promises.
    assert np.abs(w.sum(axis=0) - ct).max() < 1e-9
    assert np.abs(w.sum(axis=1) - rt).max() / rt < 0.02


def test_quantile_normalize_vs_numpy(spark):
    d = _duck(
        "SELECT doc_id, lang, n_chars FROM documents",
        tables=("documents",),
    )
    recs = sorted(
        zip(d["lang"], d["n_chars"], d["doc_id"]),
        key=lambda t: (str(t[0]), int(t[1]), int(t[2])),
    )
    bins = {}
    by_lang = {}
    i = 0
    while i < len(recs):
        j = i
        while j < len(recs) and recs[j][0] == recs[i][0]:
            j += 1
        ng = j - i
        for k in range(i, j):
            b = (k - i) * 100 // ng
            bins.setdefault(b, []).append(int(recs[k][1]))
            by_lang.setdefault(str(recs[k][0]), []).append(b)
        i = j
    ref = {b: sum(v) / len(v) for b, v in bins.items()}
    rows = {r["lang"]: r for r in _rows(spark, "quantile_normalize_chars")}
    means = []
    for lang, bl in by_lang.items():
        exp = sum(ref[b] for b in bl) / len(bl)
        assert abs(rows[lang]["mean_normalized"] - exp) < 1e-3
        means.append(exp)
    # Normalized means are pulled together relative to raw means.
    raw = [rows[lg]["mean_raw"] for lg in by_lang]
    assert (max(means) - min(means)) < (max(raw) - min(raw))


def test_retrieval_mrr_vs_numpy(spark):
    d = _duck(
        "SELECT vec_id, embedding, label FROM embeddings",
        tables=("embeddings",),
    )
    ids = np.asarray(d["vec_id"], dtype=np.int64)
    labs = np.asarray([str(x) for x in d["label"]])
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in d["embedding"]])
    mat_n = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    qidx = np.where(ids % 25 == 0)[0]
    mrr, hit, rec, prec = [], [], [], []
    for qi in qidx:
        sims = mat_n @ mat_n[qi]
        mask = ids != ids[qi]
        order = sorted(
            np.where(mask)[0], key=lambda i: (-sims[i], ids[i])
        )[:10]
        rel = [labs[i] == labs[qi] for i in order]
        n_rel = int((labs == labs[qi]).sum()) - 1
        first = next((k + 1 for k, r in enumerate(rel) if r), None)
        mrr.append(1 / first if first else 0.0)
        hit.append(1.0 if first else 0.0)
        rec.append(sum(rel) / min(10, n_rel))
        prec.append(sum(rel) / 10)
    row = _rows(spark, "retrieval_mrr_recall")[0]
    assert row["n_queries"] == len(qidx)
    assert abs(row["mrr_at_10"] - np.mean(mrr)) < 1e-5
    assert abs(row["hit_rate_at_10"] - np.mean(hit)) < 1e-5
    assert abs(row["recall_at_10"] - np.mean(rec)) < 1e-5
    assert abs(row["precision_at_10"] - np.mean(prec)) < 1e-5


def test_markov_attribution_vs_numpy(spark):
    # Independent journey extraction + transition fit in pure Python.
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS FROM '{SF_DIR}/events.parquet'")
    ev = con.execute(
        """SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
                  event_id
           FROM events ORDER BY user_id, ts, event_id"""
    ).fetchall()
    chans = ("click", "signup", "view")
    by_user = {}
    for u, et, ts, eid in ev:
        by_user.setdefault(u, []).append((ts, eid, et))
    trans = {}
    for u, evs in by_user.items():
        p_ts = min(
            (t for t, _, e in evs if e == "purchase"), default=None
        )
        path = [
            e for t, _, e in sorted(evs)
            if e in chans and (p_ts is None or t < p_ts)
        ]
        end = "CONV" if p_ts is not None else "NULL"
        nodes = ["START"] + path + [end]
        for a, b in zip(nodes, nodes[1:]):
            trans[(a, b)] = trans.get((a, b), 0) + 1
    out = {}
    for (a, b), c in trans.items():
        out[a] = out.get(a, 0) + c
    t = {k: c / out[k[0]] for k, c in trans.items()}

    def value_iter(t, removed=None, iters=48):
        keep = [c for c in chans if c != removed]
        v = {c: 0.0 for c in keep}
        for _ in range(iters):
            v = {
                c: t.get((c, "CONV"), 0.0)
                + sum(t.get((c, d), 0.0) * v[d] for d in keep)
                for c in keep
            }
        return t.get(("START", "CONV"), 0.0) + sum(
            t.get(("START", d), 0.0) * v[d] for d in keep
        )

    base = value_iter(t)
    rem = {c: (base - value_iter(t, removed=c)) / base for c in chans}
    tot = sum(rem.values())
    rows = {r["channel"]: r for r in _rows(spark, "markov_attribution_removal")}
    assert set(rows) == set(chans)
    for c in chans:
        assert abs(rows[c]["base_conv_prob"] - base) < 1e-5
        assert abs(rows[c]["removal_effect"] - rem[c]) < 1e-5
        assert abs(rows[c]["attribution_share"] - rem[c] / tot) < 1e-5
    # 48 truncated iterations converged: exact absorbing-chain solve
    # (linear system) agrees to well under the 6dp rounding.
    q = np.zeros((len(chans), len(chans)))
    r_vec = np.zeros(len(chans))
    for i, c in enumerate(chans):
        r_vec[i] = t.get((c, "CONV"), 0.0)
        for j, d in enumerate(chans):
            q[i, j] = t.get((c, d), 0.0)
    v_exact = np.linalg.solve(np.eye(len(chans)) - q, r_vec)
    base_exact = t.get(("START", "CONV"), 0.0) + sum(
        t.get(("START", d), 0.0) * v_exact[j]
        for j, d in enumerate(chans)
    )
    assert abs(base - base_exact) < 1e-6


def test_gbdt_boost_vs_numpy(spark):
    d = _duck(
        """SELECT l_quantity AS q, l_discount AS dd,
                  l_extendedprice * (1 - l_discount) AS y
           FROM lineitem"""
    )
    q = np.asarray(d["q"], dtype=np.float64)
    dd = np.asarray(d["dd"], dtype=np.float64)
    t = np.asarray(d["y"], dtype=np.float64).copy()

    def best(feats, t):
        cands = []
        for name, x in feats:
            for v in np.unique(x)[:-1]:
                m = x <= v
                nl, nr = int(m.sum()), int((~m).sum())
                sl, sr = t[m].sum(), t[~m].sum()
                gain = (
                    sl * sl / nl + sr * sr / nr
                    - (sl + sr) ** 2 / (nl + nr)
                )
                cands.append((round(gain, 4), name, v,
                              sl / nl, sr / nr, gain))
        cands.sort(key=lambda c: (-c[0], c[1], c[2]))
        return cands[0]

    feats = [("l_discount", dd), ("l_quantity", q)]
    rows = sorted(_rows(spark, "gbdt_boost_rounds"),
                  key=lambda r: r["round"])
    assert len(rows) == 2
    prev_rmse = float("inf")
    for r in rows:
        _, name, v, lp, rp, gain = best(feats, t)
        assert r["feat"] == name
        assert abs(r["threshold"] - v) < 1e-6
        assert abs(r["left_pred"] - lp) < 1e-2
        assert abs(r["right_pred"] - rp) < 1e-2
        assert abs(r["gain"] - gain) / gain < 1e-6
        x = dd if name == "l_discount" else q
        t = t - np.where(x <= v, lp, rp)
        rmse = float(np.sqrt((t * t).mean()))
        assert abs(r["rmse_after"] - rmse) < 1e-2
        assert rmse < prev_rmse  # boosting must reduce train error
        prev_rmse = rmse


def test_hll_intersection_vs_python(spark):
    import hashlib

    d = _duck(
        "SELECT o_custkey, o_orderpriority, o_orderstatus FROM orders",
        tables=("orders",),
    )
    m = 64
    seta = {int(k) for k, p in zip(d["o_custkey"], d["o_orderpriority"])
            if p == "1-URGENT"}
    setb = {int(k) for k, s in zip(d["o_custkey"], d["o_orderstatus"])
            if s == "F"}

    def regs(keys):
        r = [0] * m
        for k in keys:
            h = int(hashlib.md5(str(k).encode()).hexdigest()[:15], 16)
            reg, rest = h % m, h >> 6
            rho = 55 if rest == 0 else (rest & -rest).bit_length()
            r[reg] = max(r[reg], rho)
        return r

    def est(r):
        z = sum(2.0 ** -x for x in r)
        zeros = sum(1 for x in r if x == 0)
        raw = 0.709 * m * m / z
        if raw <= 2.5 * m and zeros > 0:
            import math
            return m * math.log(m / zeros)
        return raw

    ra, rb = regs(seta), regs(setb)
    ru = [max(x, y) for x, y in zip(ra, rb)]
    va, vb, vu = est(ra), est(rb), est(ru)
    row = _rows(spark, "hll_intersection_estimate")[0]
    assert row["exact_intersection"] == len(seta & setb)
    assert abs(row["est_a"] - va) < 1e-3
    assert abs(row["est_b"] - vb) < 1e-3
    assert abs(row["est_union"] - vu) < 1e-3
    assert abs(row["est_intersection"] - (va + vb - vu)) < 2e-3
    # Sanity: HLL intersection should land within 50% of truth here.
    assert abs(row["est_intersection"] - len(seta & setb)) \
        <= 0.5 * len(seta & setb)


def test_ktruss_vs_python(spark):
    d = _duck(
        """SELECT DISTINCT LEAST(s_nationkey, c_nationkey) AS a,
                  GREATEST(s_nationkey, c_nationkey) AS b
           FROM lineitem l
           JOIN orders o   ON l.l_orderkey = o.o_orderkey
           JOIN customer c ON o.o_custkey = c.c_custkey
           JOIN supplier s ON l.l_suppkey = s.s_suppkey
           WHERE s_nationkey <> c_nationkey""",
        tables=("lineitem", "orders", "customer", "supplier"),
    )
    edges = {(int(a), int(b)) for a, b in zip(d["a"], d["b"])}
    sup = {}
    for _ in range(3):
        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        sup = {
            (a, b): len(adj[a] & adj[b]) for a, b in edges
        }
        edges = {e for e in edges if sup[e] >= 2}
    names = _duck("SELECT n_nationkey, n_name FROM nation",
                  tables=("nation",))
    nm = dict(zip((int(k) for k in names["n_nationkey"]),
                  (str(v) for v in names["n_name"])))
    rows = {(r["nation_a"], r["nation_b"]): r["support"]
            for r in _rows(spark, "ktruss_trade_edges")}
    assert rows == {(nm[a], nm[b]): sup[(a, b)] for a, b in edges}
    # Every surviving edge really has >= k-2 triangle support.
    assert all(v >= 2 for v in rows.values())


def test_holm_vs_python_and_bh_relation(spark):
    holm = {r["nation"]: r for r in
            _rows(spark, "holm_stepdown_nation_tests")}
    # Step-down recomputed from the emitted p-values alone.
    ps = sorted((r["p_value"], n) for n, r in holm.items())
    m = len(ps)
    rejected = set()
    for idx, (p, nation) in enumerate(ps, start=1):
        if p <= 0.05 / (m - idx + 1):
            rejected.add(nation)
        else:
            break
    for n, r in holm.items():
        assert r["rejected"] == int(n in rejected), n
    # Holm (FWER, alpha=.05) is never more liberal than BH at q=.10
    # on the same family with the same p-values.
    bh = {r["nation"]: r["rejected"]
          for r in _rows(spark, "fdr_bh_nation_tests")}
    assert all(bh[n] == 1 for n in rejected)


def test_jackknife_vs_numpy(spark):
    d = _duck(
        """SELECT n.n_name AS nation, COUNT(*) AS n, SUM(o.o_totalprice) AS s
           FROM orders o
           JOIN customer c ON o.o_custkey = c.c_custkey
           JOIN nation n ON c.c_nationkey = n.n_nationkey
           GROUP BY 1""",
        tables=("orders", "customer", "nation"),
    )
    n = np.asarray(d["n"], dtype=np.float64)
    s = np.asarray(d["s"], dtype=np.float64)
    k = len(n)
    theta = s.sum() / n.sum()
    loo = (s.sum() - s) / (n.sum() - n)
    bc = k * theta - (k - 1) * loo.mean()
    se = np.sqrt((k - 1) / k * ((loo - loo.mean()) ** 2).sum())
    r = _rows(spark, "jackknife_ratio_variance")[0]
    assert r["n_groups"] == k
    # outputs are float32: compare at relative f32 resolution
    assert abs(r["theta"] - theta) / theta < 1e-6
    assert abs(r["theta_jack_bc"] - bc) / abs(bc) < 1e-6
    assert abs(r["se_jack"] - se) / se < 1e-5


def test_chao1_vs_python(spark):
    d = _duck(
        r"""SELECT tok, COUNT(*) AS c FROM (
              SELECT UNNEST(string_split_regex(trim(text), '\s+')) AS tok
              FROM documents) GROUP BY tok""",
        tables=("documents",),
    )
    c = np.asarray(d["c"], dtype=np.int64)
    v, f1, f2 = len(c), int((c == 1).sum()), int((c == 2).sum())
    r = _rows(spark, "chao1_vocab_richness")[0]
    assert (r["vocab_observed"], r["singletons"], r["doubletons"]) == (
        v, f1, f2)
    assert abs(r["chao1"] - (v + f1 * (f1 - 1) / (2 * (f2 + 1)))) < 1e-2
    assert r["chao1"] >= v  # Chao1 is a lower bound ABOVE observed
    assert abs(r["goods_coverage"] - (1 - f1 / c.sum())) < 1e-6


def test_bradley_terry_vs_python(spark):
    d = _duck(
        """WITH lines AS (
               SELECT l.l_orderkey AS ok, p.p_brand AS brand,
                      l.l_extendedprice * (1 - l.l_discount) AS rev
               FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey)
           SELECT a.brand AS wb, b.brand AS lb, COUNT(*) AS n
           FROM lines a JOIN lines b
             ON a.ok = b.ok AND a.brand <> b.brand AND a.rev > b.rev
           GROUP BY 1, 2""",
        tables=("lineitem", "part"),
    )
    wins = {(str(a), str(b)): int(n)
            for a, b, n in zip(d["wb"], d["lb"], d["n"])}
    brands = sorted({a for a, _ in wins} | {b for _, b in wins})
    n = {}
    w = {bd: 0 for bd in brands}
    for (a, b), c in wins.items():
        n[(a, b)] = n.get((a, b), 0) + c
        n[(b, a)] = n.get((b, a), 0) + c
        w[a] += c
    s = {bd: 1.0 / len(brands) for bd in brands}
    for _ in range(4):
        raw = {
            bd: w[bd] / sum(n[(bd, j)] / (s[bd] + s[j])
                            for j in brands if (bd, j) in n)
            for bd in brands
        }
        tot = sum(raw.values())
        s = {bd: v / tot for bd, v in raw.items()}
    rows = {r["brand"]: r for r in _rows(spark, "bradley_terry_strengths")}
    assert set(rows) == set(brands)
    for bd in brands:
        assert rows[bd]["wins"] == w[bd]
        assert abs(rows[bd]["strength"] - s[bd]) < 1e-5
    # BT recovers win-rate order on balanced schedules: the top
    # strength brand is among the top-3 raw win-rate brands.
    wr = {bd: w[bd] / sum(n[(bd, j)] for j in brands if (bd, j) in n)
          for bd in brands}
    top_s = max(brands, key=lambda bd: s[bd])
    assert top_s in sorted(brands, key=lambda bd: -wr[bd])[:3]


def test_design_effect_vs_numpy(spark):
    cells = _duck(
        "SELECT lang, source, COUNT(*) AS n FROM documents GROUP BY 1, 2",
        tables=("documents",),
    )
    langs = sorted(set(cells["lang"]))
    srcs = sorted(set(cells["source"]))
    tab = np.zeros((len(langs), len(srcs)))
    for l, sc, c in zip(cells["lang"], cells["source"], cells["n"]):
        tab[langs.index(l), srcs.index(sc)] = c
    wmat = tab.astype(np.float64).copy()
    nn = tab.sum()
    for _ in range(3):
        wmat *= (nn / len(langs)) / wmat.sum(axis=1, keepdims=True)
        wmat *= (nn / len(srcs)) / wmat.sum(axis=0, keepdims=True)
    uw = np.round(np.where(tab > 0, wmat / np.maximum(tab, 1), 0.0), 4)
    # per-doc weights = cell unit weight repeated n times
    ws = np.repeat(uw[tab > 0], tab[tab > 0].astype(np.int64))
    deff = len(ws) * (ws ** 2).sum() / ws.sum() ** 2
    r = _rows(spark, "design_effect_kish")[0]
    assert r["n_docs"] == int(nn)
    assert abs(r["deff_kish"] - deff) < 1e-4
    assert abs(r["effective_n"] - ws.sum() ** 2 / (ws ** 2).sum()) < 0.05
    assert r["deff_kish"] >= 1.0 - 1e-9  # Kish deff is >= 1


def test_wasserstein_vs_numpy(spark):
    d = _duck("SELECT lang, n_chars FROM documents", tables=("documents",))
    langs = sorted(set(d["lang"]))
    vals = {lg: np.sort(np.asarray(
        [int(v) for l2, v in zip(d["lang"], d["n_chars"]) if l2 == lg],
        dtype=np.float64)) for lg in langs}

    def w1(a, b):
        # exact 1-D EMD via merged-support CDF integral
        grid = np.unique(np.concatenate([a, b]))
        fa = np.searchsorted(a, grid, side="right") / len(a)
        fb = np.searchsorted(b, grid, side="right") / len(b)
        return float((np.abs(fa - fb)[:-1] * np.diff(grid)).sum())

    rows = {r["lang"]: r["w1_vs_en"]
            for r in _rows(spark, "wasserstein_length_shift")}
    assert set(rows) == {lg for lg in langs if lg != "en"}
    for lg, v in rows.items():
        assert abs(v - w1(vals["en"], vals[lg])) < 1e-3, lg
        assert v >= 0


def test_yuen_vs_numpy(spark):
    d = _duck(
        """SELECT c.c_mktsegment AS g, o.o_totalprice AS y,
                  o.o_orderkey AS k
           FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
           WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')""",
        tables=("orders", "customer"),
    )
    stats = {}
    for grp in ("BUILDING", "MACHINERY"):
        ys = sorted(
            (float(y), int(k)) for g, y, k in zip(d["g"], d["y"], d["k"])
            if g == grp
        )
        y = np.asarray([v for v, _ in ys])
        n = len(y)
        g = int(np.floor(0.2 * n))
        h = n - 2 * g
        tmean = y[g:n - g].mean()
        wy = np.clip(y, y[g], y[n - g - 1])
        s2w = wy.var(ddof=1)
        dj = (n - 1) * s2w / (h * (h - 1))
        stats[grp] = (n, h, tmean, dj)
    n1, h1, t1, d1 = stats["BUILDING"]
    n2, h2, t2, d2 = stats["MACHINERY"]
    t = (t1 - t2) / np.sqrt(d1 + d2)
    df = (d1 + d2) ** 2 / (d1 ** 2 / (h1 - 1) + d2 ** 2 / (h2 - 1))
    r = _rows(spark, "yuen_trimmed_ttest")[0]
    assert (r["n_building"], r["n_machinery"]) == (n1, n2)
    assert (r["h_building"], r["h_machinery"]) == (h1, h2)
    assert abs(r["trimmed_mean_building"] - t1) / t1 < 1e-6
    assert abs(r["yuen_t"] - t) < 1e-4
    assert abs(r["df"] - df) / df < 1e-4


def test_rouge_vs_python(spark):
    d = _duck(
        r"""SELECT lang, string_split_regex(trim(text), '\s+') AS toks
            FROM documents
            WHERE len(string_split_regex(trim(text), '\s+')) > 21""",
        tables=("documents",),
    )
    from collections import Counter, defaultdict
    agg = defaultdict(lambda: [0, 0.0, 0.0, 0.0, 0.0])
    for lang, toks in zip(d["lang"], d["toks"]):
        toks = [str(t) for t in toks]
        s, r = toks[:20], toks[20:]
        cs, cr = Counter(s), Counter(r)
        ov = sum(min(cs[w], cr[w]) for w in cs)
        bs = Counter(zip(s, s[1:]))
        br = Counter(zip(r, r[1:]))
        ov2 = sum(min(bs[b], br[b]) for b in bs)
        rr, pp = ov / len(r), ov / 20
        f1 = 2 * rr * pp / (rr + pp) if ov > 0 else 0.0
        a = agg[str(lang)]
        a[0] += 1
        a[1] += rr
        a[2] += pp
        a[3] += f1
        a[4] += ov2 / (len(r) - 1)
    rows = {r["lang"]: r for r in _rows(spark, "rouge_lead_summary")}
    assert set(rows) == set(agg)
    for lang, (n, rr, pp, f1, r2) in agg.items():
        row = rows[lang]
        assert row["n_docs"] == n
        assert abs(row["rouge1_recall"] - rr / n) < 1e-5
        assert abs(row["rouge1_precision"] - pp / n) < 1e-5
        assert abs(row["rouge1_f1"] - f1 / n) < 1e-5
        assert abs(row["rouge2_recall"] - r2 / n) < 1e-5


def test_matrix_profile_vs_numpy(spark):
    d = _duck(
        """SELECT DATE_TRUNC('month', CAST(o_orderdate AS DATE)) AS m,
                  SUM(o_totalprice) AS y
           FROM orders GROUP BY 1 ORDER BY 1""",
        tables=("orders",),
    )
    y = np.asarray(d["y"], dtype=np.float64)
    w = 6
    subs = []
    for i in range(len(y) - w + 1):
        v = y[i:i + w]
        sd = v.std()
        if sd > 0:
            subs.append((i, (v - v.mean()) / sd))
    best = sorted(
        (
            (round(float(((za - zb) ** 2).sum()), 6), ia, ib)
            for ia, za in subs
            for ib, zb in subs
            if ib >= ia + w
        )
    )[:3]
    rows = _rows(spark, "matrix_profile_motif")
    assert len(rows) == 3
    months = [str(m)[:7] for m in d["m"]]
    got = sorted(
        (round(float(r["zdist"]) ** 2, 2), r["month_a"], r["month_b"])
        for r in rows
    )
    exp = sorted(
        (round(d2, 2), months[ia], months[ib]) for d2, ia, ib in best
    )
    assert got == exp


def test_tail_dependence_vs_numpy(spark):
    d = _duck(
        """SELECT o_custkey AS k, SUM(o_totalprice) AS x, COUNT(*) AS y
           FROM orders GROUP BY 1""",
        tables=("orders",),
    )
    k = np.asarray(d["k"], dtype=np.int64)
    x = np.asarray(d["x"], dtype=np.float64)
    yv = np.asarray(d["y"], dtype=np.int64)
    n = len(k)
    rx = np.empty(n, dtype=np.int64)
    ry = np.empty(n, dtype=np.int64)
    rx[sorted(range(n), key=lambda i: (-x[i], k[i]))] = np.arange(1, n + 1)
    ry[sorted(range(n), key=lambda i: (-yv[i], k[i]))] = np.arange(1, n + 1)
    rows = {round(r["quantile"], 2): r
            for r in _rows(spark, "tail_dependence_lambda")}
    for p_ in (90, 95, 99):
        q = p_ / 100.0
        m = ((100 - p_) * n + 99) // 100
        joint = int(((rx <= m) & (ry <= m)).sum())
        r = rows[round(q, 2)]
        assert r["tail_size"] == m
        assert r["joint_exceed"] == joint
        assert abs(r["lambda_u"] - joint / m) < 1e-9


def test_dp_user_level_vs_python(spark):
    import hashlib
    import math

    d = _duck(
        """SELECT event_type, user_id, COUNT(*) AS n
           FROM events GROUP BY 1, 2""",
        tables=("events",),
    )
    agg = {}
    for et, _, n in zip(d["event_type"], d["user_id"], d["n"]):
        t, c, cl = agg.get(str(et), (0, 0, 0))
        agg[str(et)] = (t + int(n), c + min(int(n), 10),
                        cl + (1 if n > 10 else 0))
    rows = {r["event_type"]: r for r in _rows(spark, "dp_user_level_counts")}
    assert set(rows) == set(agg)
    for et, (t, c, cl) in agg.items():
        r = rows[et]
        assert (r["true_count"], r["capped_count"],
                r["clipped_users"]) == (t, c, cl)
        u = int(hashlib.md5(f"udp-release-r6|{et}".encode())
                .hexdigest()[:15], 16) / 1152921504606846976.0 - 0.5
        lap = (10 / 0.5) * (1.0 if u >= 0 else -1.0) * math.log(1 - 2 * abs(u))
        assert abs(r["noisy_count"] - (c - lap)) < 1e-3
        # user-level noise is 20x the event-level scale: bound check
        assert abs(r["noisy_count"] - c) <= (10 / 0.5) * math.log(1e6)


def test_hill_vs_numpy(spark):
    d = _duck(
        "SELECT SUM(o_totalprice) AS x FROM orders GROUP BY o_custkey",
        tables=("orders",),
    )
    x = np.sort(np.asarray(d["x"], dtype=np.float64))[::-1]
    rows = {r["k"]: r for r in _rows(spark, "evt_hill_tail_index")}
    assert set(rows) == {50, 100}
    for k in (50, 100):
        alpha = 1.0 / (np.log(x[:k]).mean() - np.log(x[k]))
        r = rows[k]
        assert abs(r["x_kplus1"] - x[k]) / x[k] < 1e-6
        assert abs(r["hill_alpha"] - alpha) < 1e-4
        assert abs(r["p_double_given_exceed"] - 2.0 ** -alpha) < 1e-5
        assert r["hill_alpha"] > 0


def test_neyman_vs_numpy(spark):
    d = _duck(
        """SELECT c.c_mktsegment AS seg, o.o_totalprice AS y
           FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey""",
        tables=("orders", "customer"),
    )
    segs = sorted(set(d["seg"]))
    ys = {s: np.asarray([y for g, y in zip(d["seg"], d["y"]) if g == s])
          for s in segs}
    nh = {s: len(v) for s, v in ys.items()}
    sg = {s: v.std(ddof=1) for s, v in ys.items()}
    tot_ns = sum(nh[s] * sg[s] for s in segs)
    nn = sum(nh.values())
    rows = {r["seg"]: r for r in _rows(spark, "neyman_allocation")}
    assert set(rows) == set(segs)
    alloc = 0.0
    for s in segs:
        r = rows[s]
        assert r["stratum_size"] == nh[s]
        assert abs(r["stratum_sd"] - sg[s]) / sg[s] < 1e-6
        assert abs(r["n_neyman"] - 1000 * nh[s] * sg[s] / tot_ns) < 0.02
        assert abs(r["n_proportional"] - 1000 * nh[s] / nn) < 0.02
        alloc += r["n_neyman"]
        ratio = (tot_ns / nn) ** 2 / (
            sum(nh[t] * sg[t] ** 2 for t in segs) / nn)
        assert abs(r["neyman_vs_prop_var_ratio"] - ratio) < 1e-5
        assert r["neyman_vs_prop_var_ratio"] <= 1.0 + 1e-9  # Neyman wins
    assert abs(alloc - 1000) < 0.1  # allocations exhaust the budget


def test_jarque_bera_vs_numpy(spark):
    d = _duck(
        "SELECT LN(SUM(o_totalprice)) AS y FROM orders GROUP BY o_custkey",
        tables=("orders",),
    )
    y = np.asarray(d["y"], dtype=np.float64)
    n = len(y)
    m2 = ((y - y.mean()) ** 2).mean()
    m3 = ((y - y.mean()) ** 3).mean()
    m4 = ((y - y.mean()) ** 4).mean()
    s, k = m3 / m2 ** 1.5, m4 / m2 ** 2 - 3
    jb = n / 6 * (s ** 2 + k ** 2 / 4)
    r = _rows(spark, "jarque_bera_normality")[0]
    assert r["n_customers"] == n
    assert abs(r["skewness"] - s) < 1e-4
    assert abs(r["excess_kurtosis"] - k) < 1e-4
    assert abs(r["jb_stat"] - jb) / jb < 1e-3
    assert r["reject_normal_95"] == int(jb > 5.991464547107979)


def test_sen_slope_vs_numpy(spark):
    d = _duck(
        """SELECT DATE_TRUNC('month', CAST(o_orderdate AS DATE)) AS m,
                  SUM(o_totalprice) AS y
           FROM orders GROUP BY 1 ORDER BY 1""",
        tables=("orders",),
    )
    y = np.asarray(d["y"], dtype=np.float64)
    slopes = sorted(
        (y[j] - y[i]) / (j - i)
        for i in range(len(y)) for j in range(i + 1, len(y))
    )
    np_ = len(slopes)
    med = (slopes[(np_ - 1) // 2] + slopes[np_ // 2]) / 2
    r = _rows(spark, "sen_slope_trend")[0]
    assert r["n_pairs"] == np_
    assert abs(r["sen_slope"] - med) < 1e-2


def test_ppcc_vs_scipy_free(spark):
    import math

    d = _duck(
        """SELECT LN(SUM(o_totalprice)) AS y, o_custkey AS k
           FROM orders GROUP BY o_custkey""",
        tables=("orders",),
    )
    recs = sorted(zip(
        np.asarray(d["y"], dtype=np.float64),
        np.asarray(d["k"], dtype=np.int64)))
    y = np.asarray([v for v, _ in recs])
    n = len(y)

    # independent probit: bisection on the error function via
    # math.erf — no shared code with the Acklam macro.
    def probit(p):
        lo, hi = -10.0, 10.0
        for _ in range(80):
            mid = (lo + hi) / 2
            if 0.5 * (1 + math.erf(mid / math.sqrt(2))) < p:
                lo = mid
            else:
                hi = mid
        return (lo + hi) / 2

    q = np.asarray([probit((i + 1 - 0.375) / (n + 0.25))
                    for i in range(n)])
    r_exp = float(np.corrcoef(y, q)[0, 1])
    r = _rows(spark, "qq_normality_ppcc")[0]
    assert r["n_customers"] == n
    # Acklam |rel err| < 1.15e-9: correlation agrees far inside 1e-6
    assert abs(r["ppcc_r"] - r_exp) < 1e-6
    assert abs(r["ppcc_r2"] - r_exp ** 2) < 1e-6


def test_spiegelhalter_consistency(spark):
    # Recompute Z from the emitted Brier + the scored relation the
    # calibration-bins query exposes: with deciles' avg_pred and
    # frac_positive alone Z is not recoverable, so instead verify
    # internal consistency: brier matches brier_decomposition's and
    # |z| is finite, and the flag is exactly |z| > 1.96.
    r = _rows(spark, "spiegelhalter_calibration_z")[0]
    bd = _rows(spark, "brier_decomposition")[0]
    assert abs(r["brier"] - bd["brier"]) < 1e-5
    assert np.isfinite(r["spiegelhalter_z"])
    assert r["miscalibrated_95"] == int(
        abs(r["spiegelhalter_z"]) > 1.959963984540054)
    # Independent recomputation from raw data via the same two-step
    # IRLS (numpy): features mirror _logreg_features.
    from axolotls_spark.queries_lm import _logreg_features
    pdf = _logreg_features(spark, SF_DIR).toPandas()
    x = np.column_stack([np.ones(len(pdf)), pdf["x1"], pdf["x2"]])
    yv = pdf["y"].to_numpy(dtype=np.float64)
    beta = np.zeros(3)
    for _ in range(2):
        eta = x @ beta
        p = 1 / (1 + np.exp(-eta))
        w = p * (1 - p)
        z = eta + (yv - p) / w
        beta = np.linalg.solve(x.T @ (w[:, None] * x), x.T @ (w * z))
    p = 1 / (1 + np.exp(-(x @ beta)))
    num = ((yv - p) * (1 - 2 * p)).sum()
    den = ((1 - 2 * p) ** 2 * p * (1 - p)).sum()
    assert abs(r["spiegelhalter_z"] - num / np.sqrt(den)) < 5e-3


def test_median_ci_vs_numpy(spark):
    d = _duck("SELECT o_totalprice AS y FROM orders", tables=("orders",))
    y = np.sort(np.asarray(d["y"], dtype=np.float64))
    n = len(y)
    l = int(np.floor((n - 1.959963984540054 * np.sqrt(n)) / 2))
    med = (y[(n - 1) // 2] + y[n // 2]) / 2
    r = _rows(spark, "median_ci_orderstat")[0]
    assert r["n_orders"] == n
    assert r["lo_rank"] == l
    assert abs(r["median"] - med) / med < 1e-6
    assert abs(r["ci_lo"] - y[l - 1]) / y[l - 1] < 1e-6
    assert abs(r["ci_hi"] - y[n - l]) / y[n - l] < 1e-6
    assert r["ci_lo"] <= r["median"] <= r["ci_hi"]


def test_bca_vs_python(spark):
    import hashlib
    import math

    d = _duck(
        """SELECT o.o_orderkey AS k, o.o_totalprice AS v,
                  c.c_nationkey AS g
           FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey""",
        tables=("orders", "customer"),
    )
    ks = [str(int(x)) for x in d["k"]]
    v = np.asarray(d["v"], dtype=np.float64)
    g = np.asarray(d["g"], dtype=np.int64)
    n = len(v)
    theta = v.mean()
    # replicate means via the same md5 Poisson ladder
    from axolotls_spark.queries_analytics import _POIS_CDF
    B = 32
    ms = []
    for b in range(B):
        us = np.asarray([
            int(hashlib.md5(f"{k}:{b}".encode()).hexdigest()[:13], 16)
            / 4503599627370496.0 for k in ks])
        w = np.searchsorted(np.asarray(_POIS_CDF), us, side="right")
        ms.append((w * v).sum() / w.sum())
    ms = np.sort(np.asarray(ms))
    frac = min(max((ms < theta).mean(), 1 / (2 * B)), 1 - 1 / (2 * B))

    def probit(p):
        lo, hi = -10.0, 10.0
        for _ in range(80):
            mid = (lo + hi) / 2
            if 0.5 * (1 + math.erf(mid / math.sqrt(2))) < p:
                lo = mid
            else:
                hi = mid
        return (lo + hi) / 2

    z0 = probit(frac)
    # grouped jackknife acceleration
    tot_s, tot_n = v.sum(), n
    ti = np.asarray([
        (tot_s - v[g == gg].sum()) / (tot_n - (g == gg).sum())
        for gg in np.unique(g)])
    a = ((ti.mean() - ti) ** 3).sum() / (
        6 * (((ti.mean() - ti) ** 2).sum()) ** 1.5)

    def phi(z):
        return 0.5 * (1 + math.erf(z / math.sqrt(2)))

    zq = 1.959963984540054
    alo = phi(z0 + (z0 - zq) / (1 - a * (z0 - zq)))
    ahi = phi(z0 + (z0 + zq) / (1 - a * (z0 + zq)))
    rlo = min(max(math.ceil(round(B * alo, 9)), 1), B)
    rhi = min(max(math.ceil(round(B * ahi, 9)), 1), B)
    r = _rows(spark, "bca_bootstrap_ci")[0]
    assert r["n_orders"] == n
    assert abs(r["bias_z0"] - z0) < 1e-4      # Acklam vs erf-bisect
    assert abs(r["accel_a"] - a) < 1e-5
    assert (r["rank_lo"], r["rank_hi"]) == (rlo, rhi)
    assert abs(r["bca_lo"] - ms[rlo - 1]) / ms[rlo - 1] < 1e-6
    assert abs(r["bca_hi"] - ms[rhi - 1]) / ms[rhi - 1] < 1e-6
    assert r["bca_lo"] <= r["point_mean"] <= r["bca_hi"]


def test_qini_aa_vs_python(spark):
    import hashlib

    d = _duck(
        """SELECT o_custkey AS k, SUM(o_totalprice) AS spend,
                  MAX(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS y
           FROM orders GROUP BY o_custkey""",
        tables=("orders",),
    )
    recs = sorted(
        zip(d["spend"], d["k"], d["y"]),
        key=lambda r: (-float(r[0]), int(r[1])),
    )
    n = len(recs)
    rows = sorted(_rows(spark, "qini_aa_calibration"),
                  key=lambda r: r["decile"])
    assert len(rows) == 10
    crt = crc = cnt = cnc = 0
    for dec in range(10):
        nt = nc = rt = rc = 0
        for i, (_, k, y) in enumerate(recs):
            if (i * 10) // n != dec:
                continue
            t = int(hashlib.md5(f"qini-aa-r6|{int(k)}".encode())
                    .hexdigest()[:15], 16) % 2 == 0
            if t:
                nt += 1
                rt += int(y)
            else:
                nc += 1
                rc += int(y)
        r = rows[dec]
        assert (r["nt"], r["nc"], r["rt"], r["rc"]) == (nt, nc, rt, rc)
        crt += rt
        crc += rc
        cnt += nt
        cnc += nc
        assert abs(r["qini"] - (crt - crc * (cnt / cnc))) < 1e-2
        assert abs(r["decile_uplift"] - (rt / nt - rc / nc)) < 1e-5
    # A/A: final qini must be within a 4-sigma binomial noise band.
    p = (crt + crc) / (cnt + cnc)
    import math
    sd = math.sqrt(p * (1 - p) * (cnt + cnc))
    assert abs(rows[-1]["qini"]) < 4 * sd


def test_fleiss_kappa_vs_python(spark):
    d = _duck(
        r"""WITH toks AS (
              SELECT doc_id, n_chars,
                     UNNEST(string_split_regex(trim(text), '\s+')) AS tok
              FROM documents)
            SELECT doc_id, MAX(n_chars) AS n_chars,
                   SUM(c) AS nt, COUNT(*) AS nd, MAX(c) AS topc
            FROM (SELECT doc_id, n_chars, tok, COUNT(*) AS c
                  FROM toks GROUP BY 1, 2, 3)
            GROUP BY doc_id""",
        tables=("documents",),
    )
    from axolotls_spark.queries_text import (
        _KAPPA_DOM, _KAPPA_TTR, _MCNEMAR_CHARS)
    vs = []
    for nc, nt, nd, topc in zip(d["n_chars"], d["nt"], d["nd"], d["topc"]):
        v = (int(nc >= _MCNEMAR_CHARS)
             + int(nd * _KAPPA_TTR[1] < nt * _KAPPA_TTR[0])
             + int(topc * _KAPPA_DOM[1] >= nt * _KAPPA_DOM[0]))
        vs.append(v)
    v = np.asarray(vs, dtype=np.float64)
    n, r_ = len(v), 3
    pi = (v * (v - 1) + (r_ - v) * (r_ - v - 1)) / (r_ * (r_ - 1))
    pbar = pi.mean()
    pp = v.sum() / (r_ * n)
    pe = pp ** 2 + (1 - pp) ** 2
    kappa = (pbar - pe) / (1 - pe)
    row = _rows(spark, "fleiss_kappa_gates")[0]
    assert row["n_docs"] == n
    assert abs(row["p_pass"] - pp) < 1e-5
    assert abs(row["p_bar"] - pbar) < 1e-5
    assert abs(row["fleiss_kappa"] - kappa) < 1e-5


def test_voptimal_dp_vs_exhaustive():
    """The DP's total SSE equals the exhaustive minimum over every
    partition for a small instance, and the boundary invariants hold
    on the query-sized 64/8 instance."""
    from itertools import combinations

    from axolotls_spark.operators.histogram import voptimal_dp

    counts = [5, 7, 7, 1, 30, 31, 2, 2]
    B = 3

    def sse_range(a, b):
        seg = counts[a:b]
        m = sum(seg) / len(seg)
        return sum((c - m) ** 2 for c in seg)

    best = min(
        sse_range(0, k1) + sse_range(k1, k2) + sse_range(k2, len(counts))
        for k1, k2 in combinations(range(1, len(counts)), 2)
    )
    bounds, sses, total = voptimal_dp(counts, B)
    assert abs(total - best) < 1e-9
    assert abs(sum(sses) - total) < 1e-9
    assert bounds[0] == 0 and bounds[-1] == len(counts)
    assert bounds == sorted(bounds)

    # Query-sized instance: optimal beats (or ties) equi-width.
    import random

    rng = random.Random(7)
    big = [rng.randrange(0, 1000) for _ in range(64)]
    bounds64, _, tot64 = voptimal_dp(big, 8)
    equi = sum(
        (lambda seg: sum((c - sum(seg) / len(seg)) ** 2 for c in seg))(
            big[i: i + 8]
        )
        for i in range(0, 64, 8)
    )
    assert tot64 <= equi + 1e-9
    assert len(set(bounds64)) == 9
