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
