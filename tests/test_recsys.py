"""Rank-1 ALS: numpy third-implementation mirror of the unrolled
alternating closed forms, plus the must-actually-fit contract."""

from __future__ import annotations

from collections import defaultdict

from axolotls_spark.queries import REGISTRY
from axolotls_spark.queries_recsys import _ALS_LAMBDA, _ratings


def _py_als(rows):
    """Pure-Python unroll of v0=1 -> u1 -> v1 -> u2 (dict algebra,
    no DataFrames)."""
    lam = _ALS_LAMBDA
    by_c, by_p = defaultdict(list), defaultdict(list)
    for c, p, r in rows:
        by_c[c].append((p, r))
        by_p[p].append((c, r))
    u1 = {
        c: sum(r for _, r in items) / (len(items) + lam)
        for c, items in by_c.items()
    }
    v1 = {
        p: sum(r * u1[c] for c, r in users)
        / (sum(u1[c] ** 2 for c, _ in users) + lam)
        for p, users in by_p.items()
    }
    u2 = {
        c: sum(r * v1[p] for p, r in items)
        / (sum(v1[p] ** 2 for p, _ in items) + lam)
        for c, items in by_c.items()
    }
    return u2


def test_als_factors_match_python_mirror(spark, sf_dir):
    rows = [(r.c, r.p, r.r) for r in _ratings(spark, sf_dir).collect()]
    u2 = _py_als(rows)
    got = {
        r.custkey: r.u_factor
        for r in REGISTRY["als_rank1_factors"].fn(spark, sf_dir).collect()
    }
    # the reported top-15 user factors must match the mirror
    for c, u in got.items():
        assert abs(u - u2[c]) < 1e-6, c
    # and they must really be the 15 largest
    top15 = sorted(u2.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    assert set(got) == {c for c, _ in top15}


def test_als_beats_predict_zero_baseline(spark, sf_dir):
    """A fitted rank-1 model must reconstruct better than predicting
    zero everywhere: rmse < rms_rating."""
    r = REGISTRY["als_rank1_factors"].fn(spark, sf_dir).first()
    assert 0 < r.rmse < r.rms_rating


def test_als_recs_exclude_rated_items(spark, sf_dir):
    rated = {
        (r.c, r.p)
        for r in _ratings(spark, sf_dir)
        .filter("c in (1, 2, 4)")
        .collect()
    }
    recs = REGISTRY["als_top_recs"].fn(spark, sf_dir).collect()
    assert len(recs) == 15
    for r in recs:
        assert (r.custkey, r.partkey) not in rated
