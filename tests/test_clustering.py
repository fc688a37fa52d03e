"""Relational k-means: recovers planted clusters, deterministic,
and the distance step never shuffles the long fact side."""

from __future__ import annotations

from pyspark.sql import functions as F

from axolotls_spark.operators import clustering as CLU


def _planted(spark):
    """Two well-separated blobs in 4-d; vec 0 and 1 (the seeds) land
    in different blobs so first-k init starts one seed per blob."""
    rows = []
    for i in range(10):
        base = [10.0, 0.0, 0.0, 0.0] if i % 2 == 0 else [0.0, 10.0, 0.0, 0.0]
        jitter = [((i * 7 + j * 3) % 5) / 10.0 for j in range(4)]
        rows.append((i, [b + e for b, e in zip(base, jitter)]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_kmeans_recovers_planted_clusters(spark):
    emb = _planted(spark)
    assign, cents = CLU.kmeans(emb, k=2, iters=3)
    got = {r.vec_id: r.cid for r in assign.collect()}
    assert len(got) == 10
    evens = {got[i] for i in range(0, 10, 2)}
    odds = {got[i] for i in range(1, 10, 2)}
    assert evens == {0} and odds == {1}
    # Centroids: k x dim rows, near the blob centers.
    cv = {(r.cid, r.pos): r.cval for r in cents.collect()}
    assert len(cv) == 2 * 4
    assert cv[(0, 1)] > 9.0 and cv[(0, 2)] < 1.0
    assert cv[(1, 2)] > 9.0 and cv[(1, 1)] < 1.0


def test_kmeans_deterministic(spark):
    emb = _planted(spark)
    a1, _ = CLU.kmeans(emb, k=2, iters=2)
    a2, _ = CLU.kmeans(emb, k=2, iters=2)
    assert sorted(map(tuple, a1.collect())) == sorted(map(tuple, a2.collect()))


def test_empty_cluster_drops_out(spark):
    """A seed that captures no members after re-average simply
    disappears (k shrinks) rather than erroring — matches the
    unrolled-SQL semantics."""
    rows = [(i, [float(i % 2), 0.0]) for i in range(6)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assign, cents = CLU.kmeans(emb, k=2, iters=2)
    cids = {r.cid for r in assign.collect()}
    assert cids <= {0, 1} and len(cids) >= 1


def test_pq_encode_matches_numpy_mirror(spark):
    """Independent certification of product quantization: a pure
    NumPy mirror of the same algorithm (first-k init, one Lloyd
    refinement per subspace, min-distance/lowest-cid assignment) must
    produce identical codes on a deterministic corpus — this catches
    shared-misconception bugs the same-algebra DuckDB oracle cannot
    (both SQL sides would repeat them)."""
    import numpy as np

    n, dim, m, k = 40, 16, 4, 4
    rng = np.random.default_rng(7)
    X = rng.normal(size=(n, dim)).astype("float64")
    emb = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    got = {
        (r.vec_id, r.sub): r.code
        for r in CLU.pq_encode(emb, m=m, k=k, iters=1, dim=dim).collect()
    }

    d_sub = dim // m
    expected = {}
    for s in range(m):
        sub = X[:, s * d_sub : (s + 1) * d_sub]
        cents = sub[:k].copy()  # first-k init

        def assign(c):
            d2 = ((sub[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            # lowest-cid tiebreak == argmin's first-match semantics
            return d2.argmin(axis=1)

        a1 = assign(cents)
        cents1 = np.stack(
            [
                sub[a1 == c].mean(axis=0) if (a1 == c).any() else None
                for c in sorted(set(a1))
            ]
        )
        cid_map = sorted(set(a1))  # surviving codebook ids
        a2_d2 = ((sub[:, None, :] - cents1[None, :, :]) ** 2).sum(axis=2)
        a2 = a2_d2.argmin(axis=1)
        for i in range(n):
            expected[(i, s)] = cid_map[a2[i]]
    assert got == expected
