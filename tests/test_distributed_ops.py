"""queries_distributed: behaviors the DuckDB oracle can't pin —
estimator accuracy against ground truth, sampling bias direction,
layout-quality separation, and a brute-force Python mirror for the
sweep line (third implementation, so oracle and plan can't share a
misconception)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from axolotls_spark.io.sources import load_table
from axolotls_spark.queries import REGISTRY

SF_DIR = "/root/testdata/sf0.01"


def _rows(spark, name, sf=SF_DIR):
    return REGISTRY[name].fn(spark, sf).collect()


def test_kmv_estimator_accuracy(spark):
    """(k-1)/θ with k=256 has relative standard error ~1/sqrt(k-2) ≈
    6.3%; every segment estimate must sit within 3σ of the exact
    count it audits (and the exact branch must be EXACT)."""
    from axolotls_spark.queries_distributed import _KMV_K

    for r in _rows(spark, "kmv_distinct_by_priority"):
        if r.n_exact < _KMV_K:
            assert r.kmv_est == float(r.n_exact)
        else:
            assert abs(r.kmv_est / r.n_exact - 1) < 3 / math.sqrt(_KMV_K - 2)


def test_kmv_set_algebra_accuracy(spark):
    """Union and intersection estimates within 3σ of the exact
    audits (intersection gets an extra binomial term from the
    Jaccard fraction on top of the union estimate)."""
    from axolotls_spark.queries_distributed import _KMV_K

    sigma = 1 / math.sqrt(_KMV_K - 2)
    (r,) = _rows(spark, "kmv_set_algebra")
    assert abs(r.u_est / r.u_exact - 1) < 3 * sigma
    assert r.i_exact > 0
    assert abs(r.i_est / r.i_exact - 1) < 4 * sigma


def test_exact_quantiles_match_python_disc(spark):
    """Third implementation: percentile_disc = sorted[ceil(q*n)-1]
    computed in plain Python on the collected column."""
    vals = sorted(
        r.o_totalprice
        for r in load_table(spark, SF_DIR, "orders")
        .select("o_totalprice")
        .collect()
    )
    n = len(vals)
    got = {r.q: r.value for r in _rows(spark, "exact_quantiles_totalprice")}
    for q_pm in (250, 500, 750, 900, 990):
        target = (q_pm * n + 999) // 1000
        assert got[q_pm / 1000] == vals[target - 1], q_pm


def test_weighted_sample_is_weight_biased(spark):
    """A-Res with w = o_totalprice must over-represent expensive
    orders: the sample's mean weight far exceeds the corpus mean
    (the point of weighted sampling), and ranks are 1..k dense."""
    rows = _rows(spark, "weighted_sample_orders")
    assert sorted(r.rank for r in rows) == list(range(1, 21))
    sample_mean = sum(r.o_totalprice for r in rows) / len(rows)
    stats = (
        load_table(spark, SF_DIR, "orders")
        .agg(
            F.avg("o_totalprice").alias("m"),
            F.avg(F.col("o_totalprice") * F.col("o_totalprice")).alias("m2"),
        )
        .collect()[0]
    )
    # Weight-proportional inclusion makes the expected sample mean
    # E[w^2]/E[w] = mean*(1+CV^2) — assert we land in that regime,
    # clearly above the unweighted mean.
    expected = stats.m2 / stats.m
    assert sample_mean > 1.1 * stats.m
    assert 0.7 * expected < sample_mean < 1.3 * expected


def test_zorder_beats_linear_on_second_dimension(spark):
    """The measured layout claim: linear (x-prefix) buckets keep x
    tight but leave y at ~full domain width; Z-order buckets bound
    BOTH dimensions, making the second predicate prunable. Linear's
    y-span must be several times Z-order's, and Z-order's span must
    actually bound both dims well below the 256-wide domain."""
    rows = {r.layout: r for r in _rows(spark, "zorder_layout_quality")}
    z, lin = rows["zorder"], rows["linear"]
    assert lin.avg_y_span > 3 * z.avg_y_span
    assert z.avg_x_span < 128 and z.avg_y_span < 128
    assert lin.avg_x_span < z.avg_x_span  # linear IS better on x alone


def test_max_concurrent_matches_bruteforce(spark):
    """Brute-force sweep in Python over the collected boundaries
    (sf0.001 for size): same max and same first-attained time."""
    sf = "/root/testdata/sf0.001"
    ev = (
        load_table(spark, sf, "events")
        .select(F.col("ts").cast("timestamp").alias("ts"), "event_id")
        .collect()
    )
    from datetime import timedelta

    bounds = []
    for r in ev:
        bounds.append((r.ts, 1, r.event_id))
        bounds.append((r.ts + timedelta(seconds=300), -1, r.event_id))
    bounds.sort()
    cur = best = 0
    first_at = None
    for t, d, _ in bounds:
        cur += d
        if cur > best:
            best, first_at = cur, t
    (row,) = _rows(spark, "max_concurrent_events", sf)
    assert row.max_concurrent == best
    assert row.first_at == first_at.strftime("%Y-%m-%d %H:%M:%S")


def test_new_ops_plan_posture(spark):
    """Top-k paths plan TakeOrderedAndProject; no query introduces a
    single-partition window funnel (ranked_cumsum's bounded offsets
    window is marker-exempt)."""
    from axolotls_spark.plans.audit import audit, single_partition_windows

    for name in (
        "kmv_set_algebra",
        "weighted_sample_orders",
        "exact_quantiles_totalprice",
        "max_concurrent_events",
        "zorder_layout_quality",
        "kmv_distinct_by_priority",
    ):
        spark.catalog.clearCache()
        f = audit(REGISTRY[name].fn(spark, "/root/testdata/sf0.001"))
        assert single_partition_windows(f.text) == (), name
        assert "CartesianProduct" not in f.text, name
    for name in ("kmv_set_algebra", "weighted_sample_orders"):
        spark.catalog.clearCache()
        f = audit(REGISTRY[name].fn(spark, "/root/testdata/sf0.001"))
        assert "TakeOrderedAndProject" in f.text, name


def test_zonemap_pruning_zorder_beats_linear(spark):
    """The measured file-skipping claim: with 1/16-area box probes,
    Z-order scans ~the area fraction of buckets while the linear
    layout is stuck at ~its x-selectivity (1/4) — at least a 2x
    separation, and Z-order's rate must be far below linear's
    floor."""
    rows = {r.layout: r for r in _rows(spark, "zonemap_pruning_rate")}
    z, lin = rows["zorder"], rows["linear"]
    assert z.avg_scan_frac < 0.15
    assert lin.avg_scan_frac >= 2 * z.avg_scan_frac


def test_bpe_encode_compresses_and_is_consistent(spark):
    """Applying the learned merges must shrink the symbol stream
    (strictly, since every merge has positive count) and each merge
    round r saves exactly pair_count_r symbols: syms_before −
    syms_after == Σ pair_count over the learned merges."""
    (enc,) = _rows(spark, "bpe_encode_compression")
    assert enc.syms_after < enc.syms_before
    assert 0 < enc.compression < 1
    merges = _rows(spark, "bpe_train_merges")
    saved = sum(r.pair_count for r in merges)
    assert enc.syms_before - enc.syms_after == saved


def test_curation_funnel_is_conservative(spark):
    """Funnel algebra: rows_surviving is non-increasing, every
    dropped_here equals the previous stage's survivors minus this
    stage's, and the final stage equals pipeline_corpus_curation's
    actual output count."""
    rows = sorted(_rows(spark, "curation_funnel_report"),
                  key=lambda r: r.stage_id)
    for prev, cur in zip(rows, rows[1:]):
        assert cur.rows_surviving <= prev.rows_surviving
        assert cur.dropped_here == prev.rows_surviving - cur.rows_surviving
    pipe = REGISTRY["pipeline_corpus_curation"].fn(spark, SF_DIR).count()
    assert rows[-1].rows_surviving == pipe


def test_mixture_waterfill_invariants(spark):
    """Waterfill contract: allocations sum to the budget exactly
    (when the budget is feasible), saturated sources allocate their
    full availability at rate 1.0, unsaturated sources allocate
    water-level * share (equal per unit share), and at least one
    source saturates on this corpus (the redistribution path is
    live)."""
    rows = _rows(spark, "mixture_waterfill_rates")
    avail = sum(r.avail_tokens for r in rows)
    budget = 0.8 * avail
    assert abs(sum(r.alloc_tokens for r in rows) - budget) < 1e-4 * budget
    assert any(r.saturated for r in rows)
    for r in rows:
        if r.saturated:
            assert r.alloc_tokens == float(r.avail_tokens)
            assert r.sample_rate == 1.0
        else:
            assert r.alloc_tokens < r.avail_tokens
    # Unsaturated allocations are proportional to target share.
    unsat = [r for r in rows if not r.saturated]
    levels = {round(r.alloc_tokens / r.target_share, 2) for r in unsat}
    assert len(levels) == 1


def test_join_size_estimate_exact_is_the_real_join(spark):
    """The frequency-product identity: exact_join_rows (computed on
    the key domain, no row-level join) must equal the row count of
    the ACTUAL events-x-orders join; the estimate must equal 8x the
    sampled mass and land within an order of magnitude (1-in-8 key
    sampling over ~150 keys)."""
    r = _rows(spark, "join_size_estimate")[0]
    ev = load_table(spark, SF_DIR, "events")
    od = load_table(spark, SF_DIR, "orders")
    true_rows = ev.join(od, ev.user_id == od.o_custkey).count()
    assert r.exact_join_rows == true_rows
    assert 0 < r.n_sampled_keys < r.n_join_keys
    assert r.est_join_rows % 8 == 0
    assert 0.2 <= r.est_join_rows / r.exact_join_rows <= 5


def test_shapley_efficiency_and_symmetry(spark):
    """Shapley axioms on the attribution credits: efficiency — the
    four channel credits sum exactly to v(N) - v(empty) (conversions
    with at least one pre-purchase channel); and a brute-force
    python mirror over all 4! orderings reproduces each credit."""
    from itertools import permutations

    rows = _rows(spark, "shapley_attribution")
    assert len(rows) == 4
    # rebuild v(S) from the raw events, python-side
    ev = load_table(spark, SF_DIR, "events").collect()
    first_p = {}
    for e in ev:
        if e.event_type == "purchase":
            if e.user_id not in first_p or e.ts < first_p[e.user_id]:
                first_p[e.user_id] = e.ts
    bits = {"click": 1, "error": 2, "signup": 4, "view": 8}
    masks = {u: 0 for u in first_p}
    for e in ev:
        if (
            e.user_id in first_p
            and e.event_type in bits
            and e.ts < first_p[e.user_id]
        ):
            masks[e.user_id] |= bits[e.event_type]
    def v(S):
        return sum(1 for m in masks.values() if m & S == m)
    # efficiency
    got = {r.channel: r.shapley for r in rows}
    assert abs(sum(got.values()) - (v(15) - v(0))) < 1e-4
    assert rows[0].n_conversions == v(15) == len(masks)
    # permutation-form Shapley mirror (marginal contribution of each
    # channel averaged over all arrival orders)
    chans = list(bits)
    acc = {c: 0.0 for c in chans}
    for perm in permutations(chans):
        S = 0
        for c in perm:
            acc[c] += v(S | bits[c]) - v(S)
            S |= bits[c]
    n_perm = 24
    for c in chans:
        assert abs(got[c] - acc[c] / n_perm) < 1e-4, c


def test_ppr_seed_concentration(spark):
    """Random-walk-with-restart invariants: every score in [0, 1],
    the seed holds the maximum (it receives all restart mass), seed
    score >= 1 - damping, and total mass <= 1 (leaks only through
    dangling nodes)."""
    rows = _rows(spark, "ppr_trade_similarity")
    scores = {r.nation: r.ppr for r in rows}
    seed = "NATION_0"
    assert all(0.0 <= v <= 1.0 for v in scores.values())
    assert scores[seed] == max(scores.values())
    assert scores[seed] >= 0.15
    assert sum(scores.values()) <= 1.0 + 1e-6


def test_conformal_interval_contract(spark):
    """Split-conformal invariants: symmetric intervals of constant
    width 2*qhat, the covered flag is exactly lo <= actual <= hi,
    and qhat > 0."""
    rows = _rows(spark, "forecast_conformal_interval")
    assert len(rows) == 7
    widths = [r.hi - r.lo for r in rows]
    # lo/hi emit as f32 (~7 sig digits), so equal double widths may
    # differ by the f32 ulp at this magnitude (~0.25)
    assert max(widths) - min(widths) < 1.0 and min(widths) > 0
    for r in rows:
        assert abs((r.hi + r.lo) / 2 - r.forecast_rev) < 1.0
        assert r.covered == (r.lo <= r.actual_rev <= r.hi)


def test_session_pattern_match_vs_python_re(spark):
    """Python re mirror: rebuild every journey string (ts,
    event_id ordering) and re.search each pattern; counts must match
    exactly."""
    import re

    rows = _rows(spark, "session_pattern_match")
    ev = load_table(spark, SF_DIR, "events").collect()
    init = {"click": "c", "error": "e", "purchase": "p",
            "signup": "s", "view": "v"}
    js: dict[int, list] = {}
    for e in ev:
        js.setdefault(e.user_id, []).append((e.ts, e.event_id, init[e.event_type]))
    seqs = ["".join(i for _, _, i in sorted(v)) for v in js.values()]
    pats = {
        "view_then_purchase": "v[a-z]*p",
        "error_before_purchase": "e[^p]*p",
        "signup_first": "^s",
        "never_purchased": "^[^p]*$",
        "purchase_retention": "p[a-z]*p",
    }
    got = {r.pattern_name: (r.n_matching, r.n_users, r.frac) for r in rows}
    assert set(got) == set(pats)
    for name, pat in pats.items():
        want = sum(1 for s in seqs if re.search(pat, s))
        n_match, n_users, frac = got[name]
        assert n_users == len(seqs)
        assert n_match == want, name
        assert abs(frac - want / len(seqs)) < 1e-6


def test_target_encode_loo_no_self_leakage(spark):
    """LOO contract, python mirror: encoding equals
    (group_sum - own_target + m*prior) / (group_n - 1 + m), and
    perturbing ONLY a row's own target must change its encoding
    (self-exclusion is real, not the plain group mean)."""
    rows = _rows(spark, "target_encode_loo")
    od = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    ).collect()
    import collections

    n = collections.Counter()
    s = collections.defaultdict(float)
    for r in od:
        n[r.o_orderpriority] += 1
        s[r.o_orderpriority] += r.o_totalprice
    mu = sum(s.values()) / sum(n.values())
    by_key = {r.o_orderkey: r for r in od}
    assert len(rows) == 20
    for r in rows:
        o = by_key[r.orderkey]
        want = (s[o.o_orderpriority] - o.o_totalprice + 10.0 * mu) / (
            n[o.o_orderpriority] - 1 + 10.0
        )
        assert abs(r.loo_encoding - want) / want < 1e-5
        plain = s[o.o_orderpriority] / n[o.o_orderpriority]
        assert abs(r.loo_encoding - plain) > 1e-9  # truly leave-one-out


def test_hits_normalization_and_sign(spark):
    """HITS invariants: both score vectors are L1-normalized
    (sum = 1) and non-negative, and the hub/authority rankings are
    not identical (the two roles genuinely separate on a directed
    graph)."""
    rows = _rows(spark, "hits_trade_graph")
    assert abs(sum(r.hub for r in rows) - 1.0) < 1e-5
    assert abs(sum(r.authority for r in rows) - 1.0) < 1e-5
    assert all(r.hub >= 0 and r.authority >= 0 for r in rows)
    hub_rank = [r.nation for r in sorted(rows, key=lambda r: -r.hub)]
    auth_rank = [r.nation for r in sorted(rows, key=lambda r: -r.authority)]
    assert hub_rank != auth_rank


def test_datasheet_consistency(spark):
    """Datasheet metrics must reconcile with direct queries."""
    vals = {r.metric: r.value for r in _rows(spark, "dataset_datasheet")}
    docs = load_table(spark, SF_DIR, "documents")
    assert vals["n_docs"] == docs.count()
    assert vals["n_langs"] == docs.select("lang").distinct().count()
    assert vals["n_sources"] == docs.select("source").distinct().count()
    assert 0.0 <= vals["short_doc_frac"] <= 1.0
    import math

    assert 0.0 <= vals["lang_entropy"] <= math.log(vals["n_langs"]) + 1e-9


def test_stump_split_vs_numpy_exhaustive(spark):
    """Numpy mirror: rebuild the 16-bin histograms and evaluate every
    boundary split exhaustively; the reported best (threshold, gain,
    child sizes) per feature must match, and each gain must be
    non-negative (splitting can never increase SSE)."""
    import numpy as np

    rows = {r.feat: r for r in _rows(spark, "stump_split_search")}
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_quantity", "l_discount", "l_tax", "l_extendedprice"
    ).collect()
    y = np.array([r.l_extendedprice * (1 - r.l_discount) for r in li])
    for feat in ("l_quantity", "l_discount", "l_tax"):
        x = np.array([float(r[feat]) for r in li])
        lo, hi = x.min(), x.max()
        b = np.minimum(
            np.floor((x - lo) / (hi - lo) * 16).astype(int), 15
        )
        best = None
        nt, st, sst = len(y), y.sum(), (y * y).sum()
        for cut in range(16):
            m = b <= cut
            nl = int(m.sum())
            if nl == 0 or nl == nt:
                continue
            sl, ssl = y[m].sum(), (y[m] * y[m]).sum()
            gain = (
                (sst - st * st / nt)
                - (ssl - sl * sl / nl)
                - ((sst - ssl) - (st - sl) ** 2 / (nt - nl))
            )
            if best is None or gain > best[0] + 1e-9:
                best = (gain, cut, nl)
        g = rows[feat]
        assert g.gain >= 0
        assert abs(g.gain - best[0]) < max(1e-3, 1e-9 * abs(best[0]))
        assert g.n_left == best[2]
        want_thr = lo + (best[1] + 1) * (hi - lo) / 16
        assert abs(g.threshold - want_thr) < 1e-6


def test_consistent_hash_minimal_movement(spark):
    """The Karger property, measured: scaling 4 -> 5 nodes moves
    roughly 1/5 of each node's keys (movement only INTO the new
    node's arcs) — far below the ~4/5 a mod-N repartition forces;
    and keys that move can only move to the NEW node (python ring
    mirror double-checks the full assignment)."""
    import hashlib

    rows = _rows(spark, "consistent_hash_movement")
    assert {r.node for r in rows} == {0, 1, 2, 3}
    total = sum(r.n_keys_before for r in rows)
    moved = sum(r.n_moved_away for r in rows)
    assert 0.10 <= moved / total <= 0.35  # ~1/5, hash-draw tolerance
    # python mirror of both ring epochs
    def h(sx):
        return int(hashlib.md5(sx.encode()).hexdigest()[:15], 16)
    ring5 = sorted(
        (h(f"ring:{n}:{r}"), n) for n in range(5) for r in range(32)
    )
    ring4 = [(p, n) for p, n in ring5 if n < 4]
    keys = [
        r.o_orderkey
        for r in load_table(spark, SF_DIR, "orders")
        .select("o_orderkey")
        .collect()
    ]
    def assign(ring, k):
        hk = h(str(k))
        for p, n in ring:
            if p >= hk:
                return n
        return ring[0][1]
    moved_py = sum(
        1 for k in keys if assign(ring4, k) != assign(ring5, k)
    )
    to_new = sum(1 for k in keys if assign(ring5, k) == 4)
    assert moved_py == moved
    assert moved_py == to_new  # movement is ONLY into the new node


def test_offpolicy_ips_vs_python(spark):
    """Python mirror of the whole OPE pipeline plus the estimator
    sanity relations: SNIPS is a weighted mean of rewards (so it
    stays inside the reward range), ess_frac in (0, 1], and both
    estimates match the mirror to 1e-4."""
    import math

    rows = _rows(spark, "offpolicy_ips_estimate")
    assert len(rows) == 1
    g = rows[0]
    ev = load_table(spark, SF_DIR, "events").select(
        "event_type", "value"
    ).collect()
    from collections import defaultdict

    n = defaultdict(int)
    s = defaultdict(float)
    for e in ev:
        n[e.event_type] += 1
        s[e.event_type] += e.value
    nt = sum(n.values())
    mean = {a: s[a] / n[a] for a in n}
    z = sum(math.exp(m / 2.0) for m in mean.values())
    p_tgt = {a: math.exp(mean[a] / 2.0) / z for a in mean}
    wts, wr = [], []
    for e in ev:
        w = p_tgt[e.event_type] / (n[e.event_type] / nt)
        wts.append(w)
        wr.append(w * e.value)
    ips = sum(wr) / nt
    snips = sum(wr) / sum(wts)
    ess = (sum(wts) ** 2 / sum(w * w for w in wts)) / nt
    assert abs(g.ips_value - ips) < 1e-4
    assert abs(g.snips_value - snips) < 1e-4
    assert abs(g.ess_frac - ess) < 1e-4
    lo, hi = min(e.value for e in ev), max(e.value for e in ev)
    assert lo <= g.snips_value <= hi
    assert 0 < g.ess_frac <= 1.0 + 1e-9


def test_bootstrap_ci_poisson_python_mirror(spark):
    """Full pure-Python mirror of the Poisson bootstrap (hashlib md5
    uniforms -> inverse-CDF weights -> replicate means -> rank CI) —
    a third implementation, so the Spark plan and the SQL oracle
    can't share a misconception about the weight ladder."""
    import hashlib
    import statistics

    from axolotls_spark.queries_analytics import _BOOT_B, _POIS_CDF

    g = _rows(spark, "bootstrap_ci_poisson")[0]
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_totalprice"
    ).collect()

    def weight(k: str, b: int) -> int:
        u = int(hashlib.md5(f"{k}:{b}".encode()).hexdigest()[:13], 16)
        u /= 4503599627370496.0
        for i, c in enumerate(_POIS_CDF):
            if u < c:
                return i
        return 7

    means = []
    for b in range(_BOOT_B):
        num = den = 0.0
        for r in orders:
            w = weight(str(r.o_orderkey), b)
            num += w * r.o_totalprice
            den += w
        means.append(num / den)
    means.sort()
    assert g.n_orders == len(orders)
    assert abs(g.boot_mean - statistics.mean(means)) < 1e-2
    assert abs(g.boot_se - statistics.stdev(means)) < 1e-3
    assert abs(g.ci_lo - means[1]) < 1e-2
    assert abs(g.ci_hi - means[_BOOT_B - 2]) < 1e-2
    # The interval must bracket both the point estimate and the
    # bootstrap mean, and weights must average ~1 by construction.
    assert g.ci_lo <= g.point_mean <= g.ci_hi
    assert g.ci_lo <= g.boot_mean <= g.ci_hi
