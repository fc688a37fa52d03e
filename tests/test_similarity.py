"""Operator tests for similarity search: exactness of brute force
vs numpy, ANN recall vs the exact reference."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from axolotls_spark.io.sources import load_table
from axolotls_spark.operators import similarity as SIM


def test_brute_force_matches_numpy(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    rows = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb.collect()}
    got = SIM.brute_force_topk(emb.filter(F.col("vec_id") == 0), emb, k=3).collect()
    q = rows[0]
    sims = {
        vid: float(q @ v / (np.linalg.norm(q) * np.linalg.norm(v)))
        for vid, v in rows.items()
        if vid != 0
    }
    expect = sorted(sims, key=lambda vid: (-sims[vid], vid))[:3]
    assert [r.cand_id for r in sorted(got, key=lambda r: r.rn)] == expect
    for r in got:
        assert r.sim == pytest.approx(sims[r.cand_id], rel=1e-9)


def test_ann_recall_against_exact(spark, sf_dir):
    """ANN is approximate; 8 tables x 4 planes on this corpus must
    get recall@5 well above random (≈ k/N ≈ 1%)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20)
    exact = SIM.brute_force_topk(q, emb, k=5).collect()
    approx = SIM.lsh_bucketed_topk(q, emb, dim=64, k=5, n_planes=4, n_tables=8).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.cand_id)
    hit = sum(
        1 for r in approx if r.cand_id in exact_sets.get(r.query_id, set())
    )
    total = sum(len(s) for s in exact_sets.values())
    assert hit / total > 0.3, f"recall@5 {hit}/{total} too low"


def test_ivf_recall_against_exact(spark, sf_dir):
    """IVF with 16 cells / nprobe=4 probes 1/4 of the corpus; recall@5
    must beat that scan fraction by a wide margin (similar vectors
    share cells)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20)
    cents = emb.filter(F.col("vec_id") < 16)
    exact = SIM.brute_force_topk(q, emb, k=5).collect()
    approx = SIM.ivf_topk(q, emb, cents, k=5, nprobe=4).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.cand_id)
    hit = sum(
        1 for r in approx if r.cand_id in exact_sets.get(r.query_id, set())
    )
    total = sum(len(s) for s in exact_sets.values())
    assert hit / total > 0.4, f"recall@5 {hit}/{total} too low"


def test_ivf_deterministic(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    cents = emb.filter(F.col("vec_id") < 16)
    r1 = [(r.query_id, r.rn, r.cand_id) for r in SIM.ivf_topk(q, emb, cents).collect()]
    r2 = [(r.query_id, r.rn, r.cand_id) for r in SIM.ivf_topk(q, emb, cents).collect()]
    assert sorted(r1) == sorted(r2)


def test_rp_signature_deterministic(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    s1 = {r.sig_id: r.sig for r in SIM.rp_signature(emb, 64, 8).collect()}
    s2 = {r.sig_id: r.sig for r in SIM.rp_signature(emb, 64, 8).collect()}
    assert s1 == s2
    assert all(len(v) == 8 and set(v) <= {"0", "1"} for v in s1.values())


def test_pq_adc_shortlist_recall(spark, sf_dir):
    """ADC is a shortlist builder: on this near-isotropic synthetic
    corpus (the hard case for PQ — distance concentration), the
    exact euclidean top-10 must land inside the ADC top-20%
    shortlist with recall ≥ 0.7, and ADC distances must correlate
    positively with true distances."""
    from axolotls_spark.operators import clustering as CLU

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    n = emb.count()
    codes, cents = CLU.pq_train(emb, m=8, k=16, iters=1, dim=64)
    qlong = CLU.explode_long(emb.filter(F.col("vec_id") == 0)).select(
        "pos", "val"
    )
    dt = (
        cents.join(F.broadcast(qlong), "pos")
        .groupBy("cid", "sub")
        .agg(
            F.sum(
                (F.col("val") - F.col("cval"))
                * (F.col("val") - F.col("cval"))
            ).alias("pd2")
        )
    )
    adc = (
        codes.filter(F.col("vec_id") != 0)
        .join(F.broadcast(dt), ["sub", "cid"])
        .groupBy("vec_id")
        .agg(F.sum("pd2").alias("adc_d2"))
    )
    qv = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv")
    )
    sq = lambda a, b: (a.cast("double") - b.cast("double")) * (
        a.cast("double") - b.cast("double")
    )
    exact = emb.filter(F.col("vec_id") != 0).crossJoin(
        F.broadcast(qv)
    ).select(
        "vec_id",
        F.aggregate(
            F.zip_with("embedding", "qv", sq),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("d2"),
    )
    exact10 = {r.vec_id for r in exact.orderBy("d2", "vec_id").limit(10).collect()}
    shortlist = {
        r.vec_id
        for r in adc.orderBy("adc_d2", "vec_id").limit(n // 5).collect()
    }
    assert len(shortlist & exact10) / 10 >= 0.7
    assert adc.join(exact, "vec_id").stat.corr("adc_d2", "d2") > 0.4


def test_mmr_matches_python_greedy_mirror(spark, sf_dir):
    """Independent certification of the MMR query: a pure-Python
    greedy over the same top-20 candidate set (0.7·rel −
    0.3·max-sim-to-selected, ties by vec_id) must select the same
    ids in the same order — independent of both Spark algebra and
    the DuckDB oracle."""
    import math

    from axolotls_spark.queries import REGISTRY

    rows = REGISTRY["mmr_diverse_topk"].fn(spark, sf_dir).collect()
    got = [r.vec_id for r in sorted(rows, key=lambda r: r.sel_rank)]

    emb = {
        r.vec_id: r.embedding
        for r in load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    }

    def cos(a, b):
        dot = sum(float(x) * float(y) for x, y in zip(a, b))
        na = math.sqrt(sum(float(x) ** 2 for x in a))
        nb = math.sqrt(sum(float(y) ** 2 for y in b))
        return dot / (na * nb) if na * nb else None

    q = emb[0]
    rel = {i: cos(v, q) for i, v in emb.items() if i != 0}
    cand = sorted(rel, key=lambda i: (-rel[i], i))[:20]
    selected = [min(cand, key=lambda i: (-rel[i], i))]
    while len(selected) < 5:
        best = None
        for i in cand:
            if i in selected:
                continue
            msim = max(cos(emb[i], emb[j]) for j in selected)
            score = 0.7 * rel[i] - 0.3 * msim
            key = (-score, i)
            if best is None or key < best[0]:
                best = (key, i)
        selected.append(best[1])
    assert got == selected


def test_ivf_adc_containment_and_within_cell_shortlist(spark, sf_dir):
    """IVF-ADC contract on the isotropic hard case: (1) every
    returned id lies in the nprobe=4 probed cells (structural
    containment); (2) within those cells ADC is a good SHORTLIST —
    the exact euclidean top-10 restricted to the probed candidates
    sits in the ADC top-20% with recall ≥ 0.6 (absolute recall vs
    the whole corpus is a property of the data's cell structure,
    not of this operator)."""
    from pyspark.sql.window import Window

    from axolotls_spark.operators import clustering as CLU
    from axolotls_spark.operators.clustering import explode_long
    from axolotls_spark.queries import REGISTRY

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    euc2 = lambda a, b: F.aggregate(
        F.zip_with(
            a, b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cents = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("cell"), F.col("embedding").alias("cvec")
    )
    w = Window.partitionBy("cand_id").orderBy("d2c", "cell")
    cc = (
        emb.crossJoin(F.broadcast(cents))
        .select(
            F.col("vec_id").alias("cand_id"),
            "cell",
            euc2(F.col("embedding"), F.col("cvec")).alias("d2c"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("cand_id", "cell")
    )
    probed = (
        emb.filter(F.col("vec_id") == 0)
        .crossJoin(F.broadcast(cents))
        .select("cell", euc2(F.col("embedding"), F.col("cvec")).alias("d2c"))
        .orderBy("d2c", "cell")
        .limit(4)
        .select("cell")
    )
    in_cells = (
        emb.join(cc, emb.vec_id == cc.cand_id)
        .join(probed, "cell")
        .filter(F.col("vec_id") != 0)
    )
    cand_ids = {r.cand_id for r in in_cells.select("cand_id").collect()}
    got = {
        r.vec_id
        for r in REGISTRY["ann_ivf_adc_topk"].fn(spark, sf_dir).collect()
    }
    assert got <= cand_ids  # (1) containment

    qv = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv")
    )
    exact_in = {
        r.vec_id
        for r in in_cells.crossJoin(F.broadcast(qv))
        .select("vec_id", euc2(F.col("embedding"), F.col("qv")).alias("d2"))
        .orderBy("d2", "vec_id")
        .limit(10)
        .collect()
    }
    codes, pq_cents = CLU.pq_train(emb, m=8, k=16, iters=1, dim=64)
    qlong = CLU.explode_long(emb.filter(F.col("vec_id") == 0)).select(
        "pos", "val"
    )
    dt = (
        pq_cents.join(F.broadcast(qlong), "pos")
        .groupBy("cid", "sub")
        .agg(
            F.sum(
                (F.col("val") - F.col("cval"))
                * (F.col("val") - F.col("cval"))
            ).alias("pd2")
        )
    )
    adc = (
        codes.filter(F.col("vec_id") != 0)
        .join(cc, codes.vec_id == cc.cand_id)
        .join(F.broadcast(probed), "cell")
        .join(F.broadcast(dt), ["sub", "cid"])
        .groupBy("vec_id")
        .agg(F.sum("pd2").alias("d"))
    )
    sl = max(1, len(cand_ids) // 5)
    short = {
        r.vec_id for r in adc.orderBy("d", "vec_id").limit(sl).collect()
    }
    assert len(short & exact_in) / 10 >= 0.6  # (2) shortlist recall


def test_hard_negative_mining_vs_numpy(spark, sf_dir):
    """Numpy mirror: for every anchor, the reported negatives must
    be exactly the top-5 different-label vectors by cosine, the
    margin must equal best-same-label-sim minus the negative's sim,
    and `violates` must flag precisely the negatives outscoring the
    best positive."""
    import numpy as np

    from axolotls_spark.queries import REGISTRY

    emb = load_table(spark, sf_dir, "embeddings").collect()
    ids = np.array([r.vec_id for r in emb])
    lbl = np.array([r.label for r in emb])
    V = np.array([r.embedding for r in emb], dtype=np.float64)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    got = REGISTRY["hard_negative_mining"].fn(spark, sf_dir).collect()
    by_anchor: dict[int, list] = {}
    for r in got:
        by_anchor.setdefault(r.anchor_id, []).append(r)
    for a in range(8):
        i = int(np.nonzero(ids == a)[0][0])
        sims = Vn @ Vn[i]
        sims[i] = -np.inf
        neg_mask = lbl != lbl[i]
        pos_sim = sims[(~neg_mask) & (ids != a)].max()
        order = sorted(
            (int(ids[j]) for j in np.nonzero(neg_mask)[0]),
            key=lambda v: (-sims[np.nonzero(ids == v)[0][0]], v),
        )[:5]
        rows = sorted(by_anchor[a], key=lambda r: r.rn)
        assert [r.negative_id for r in rows] == order
        for r in rows:
            j = int(np.nonzero(ids == r.negative_id)[0][0])
            assert abs(r.neg_sim - sims[j]) < 1e-9
            assert abs(r.margin - (pos_sim - sims[j])) < 1e-9
            assert r.violates == bool(sims[j] >= pos_sim)


def test_silhouette_vs_numpy(spark, sf_dir):
    """Numpy mirror: recompute the simplified silhouette from the
    raw embeddings + the certified kmeans outputs; per-cluster means
    must agree and land in [-1, 1]."""
    import numpy as np

    from axolotls_spark.operators import clustering as CLU
    from axolotls_spark.queries import REGISTRY

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    assign, cents = CLU.kmeans(emb, k=8, iters=2)
    acid = {r.vec_id: r.cid for r in assign.collect()}
    crows = cents.collect()
    k = 8
    dim = max(r.pos for r in crows)
    C = np.zeros((k, dim))
    for r in crows:
        C[r.cid, r.pos - 1] = r.cval
    rows = emb.collect()
    by_cluster: dict[int, list[float]] = {}
    for r in rows:
        v = np.array(r.embedding, dtype=np.float64)
        d = np.sqrt(((C - v) ** 2).sum(1))
        a = d[acid[r.vec_id]]
        b = np.min(np.delete(d, acid[r.vec_id]))
        by_cluster.setdefault(acid[r.vec_id], []).append(
            (b - a) / max(a, b)
        )
    got = {
        r.cid: (r.n_members, r.mean_silhouette)
        for r in REGISTRY["silhouette_kmeans"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(by_cluster)
    for cid, (n, ms) in got.items():
        assert n == len(by_cluster[cid])
        assert -1.0 <= ms <= 1.0
        assert abs(ms - float(np.mean(by_cluster[cid]))) < 1e-5
