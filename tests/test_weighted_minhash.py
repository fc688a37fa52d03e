"""Weighted MinHash (Ioffe consistent weighted sampling) — pure-Python
mirror of the Spark sampler, plus the collision-probability contract.

The mirror re-derives every uniform from md5 exactly as
operators/dedup.py:weighted_minhash_wide does and must reproduce each
document's (term, t_k) samples verbatim over the registered query's
IDF-weighted shingle features — three independent derivations total
(Spark plan, DuckDB oracle replay, this mirror).
"""

from __future__ import annotations

import hashlib
import math

import pytest

from axolotls_spark.io.sources import load_table
from axolotls_spark.operators.dedup import weighted_minhash_sketch
from axolotls_spark.queries_text import _shingle_idf_weights

K = 4
TWO60 = float(1 << 60)


def _u(term: str, i: int, salt: str, start: int) -> float:
    hx = hashlib.md5(f"{term}|{i}|{salt}".encode()).hexdigest()
    h = int(hx[start - 1 : start - 1 + 15], 16)
    return (h + 0.5) / TWO60


def _shingles(text: str) -> set[str]:
    toks = text.strip().split()
    return {" ".join(toks[j : j + 3]) for j in range(len(toks) - 2)}


def _mirror_samples(weights: dict[str, float], k: int = K) -> list[tuple[str, int]]:
    out = []
    for i in range(k):
        best = None
        for term, w in weights.items():
            u1 = _u(term, i, "A", 1)
            u2 = _u(term, i, "A", 16)
            u3 = _u(term, i, "B", 1)
            u4 = _u(term, i, "B", 16)
            beta = _u(term, i, "C", 1)
            r = -(math.log(u1) + math.log(u2))
            c = -(math.log(u3) + math.log(u4))
            t = math.floor(math.log(w) / r + beta)
            ln_a = math.log(c) - r * (t - beta) - r
            key = (ln_a, term, t)
            if best is None or key < best:
                best = key
        out.append((best[1], int(best[2])))
    return out


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    docs = {
        r.doc_id: r.text
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    }
    n = len(docs)
    df: dict[str, int] = {}
    for text in docs.values():
        for s in _shingles(text):
            df[s] = df.get(s, 0) + 1
    idf = {t: math.log((n + 1.0) / c) for t, c in df.items()}
    return docs, idf


def test_sketch_matches_python_mirror(spark, sf_dir, corpus):
    docs, idf = corpus
    got = {
        (r.doc_id, r.i): (r.wmh_term, r.wmh_t)
        for r in weighted_minhash_sketch(
            _shingle_idf_weights(load_table(spark, sf_dir, "documents")),
            k=K,
        ).collect()
    }
    n_with_shingles = sum(1 for t in docs.values() if _shingles(t))
    assert len(got) == K * n_with_shingles
    for doc_id, text in docs.items():
        weights = {s: idf[s] for s in _shingles(text)}
        if not weights:
            continue
        expect = _mirror_samples(weights)
        for i in range(K):
            assert got[(doc_id, i)] == expect[i], (doc_id, i)


def test_identical_weight_vectors_always_collide(corpus):
    """J_w = 1 (same weight vector) must collide on every rep — the
    consistency half of consistent sampling, checked on the mirror
    (Spark equivalence to the mirror is pinned above)."""
    docs, idf = corpus
    text = next(t for t in docs.values() if _shingles(t))
    weights = {s: idf[s] for s in _shingles(text)}
    # Same multiset presented in a different iteration order.
    reordered = dict(sorted(weights.items(), reverse=True))
    assert _mirror_samples(weights) == _mirror_samples(reordered)


def test_collision_rate_tracks_weighted_jaccard(corpus):
    """Across many reps, sample-collision frequency must approximate
    the exact weighted Jaccard (Ioffe's unbiasedness theorem).  Run on
    the mirror with k=96 reps over a perturbed-document pair so the
    truth is mid-range."""
    docs, idf = corpus
    text = next(t for t in docs.values() if len(_shingles(t)) >= 12)
    wa = {s: idf[s] for s in _shingles(text)}
    # Drop a third of the shingles and double the weight of another
    # third — a genuine weighted perturbation.
    items = sorted(wa.items())
    third = len(items) // 3
    wb = dict(items[third:])
    for t, w in items[third : 2 * third]:
        wb[t] = 2.0 * w
    keys = set(wa) | set(wb)
    inter = sum(min(wa.get(t, 0.0), wb.get(t, 0.0)) for t in keys)
    union = sum(max(wa.get(t, 0.0), wb.get(t, 0.0)) for t in keys)
    jw = inter / union
    k = 96
    sa, sb = _mirror_samples(wa, k), _mirror_samples(wb, k)
    est = sum(a == b for a, b in zip(sa, sb)) / k
    sigma = math.sqrt(jw * (1 - jw) / k)
    assert abs(est - jw) <= 4 * sigma + 1e-9, (est, jw)
