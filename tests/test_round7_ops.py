"""Round-7 operators: observe/Observation instrumentation pins.

The observe surface's value proposition is METRICS FOR FREE — the
``CollectMetrics`` nodes must ride the pipeline's existing pass
without adding exchanges or extra scans, and the observed counters
must equal a from-scratch recomputation (the DuckDB oracle covers
that; here we cross-check against Spark's own re-aggregation too).
"""

from __future__ import annotations

from axolotls_spark.plans.audit import audit
from axolotls_spark.queries import REGISTRY
from axolotls_spark.queries_observability import observed_screen

SF_DIR = "/root/testdata/sf0.001"


def test_observe_adds_zero_exchanges(spark):
    """The instrumented screen's physical plan must have EXACTLY the
    same exchange count (and no Cartesian/Python-row nodes) as the
    uninstrumented screen — observe is free at 100 TB or it isn't
    worth certifying."""
    plain, _ = observed_screen(spark, SF_DIR, instrument=False)
    instr, obs = observed_screen(spark, SF_DIR, instrument=True)
    assert len(obs) == 4
    fp = audit(plain)
    fi = audit(instr)
    assert fi.n_exchanges == fp.n_exchanges
    assert "CartesianProduct" not in fi.text
    assert "BatchEvalPython" not in fi.text
    # The instrumentation IS in the plan: 4 CollectMetrics nodes,
    # each mentioned twice by explain-formatted (tree + detail
    # section).
    assert fi.text.count("CollectMetrics") == 8
    assert fp.text.count("CollectMetrics") == 0


def test_observed_funnel_matches_recount(spark):
    """Observed counters == a second, independent counting pass over
    the same stage relations (monotone non-increasing funnel)."""
    rows = {
        r["stage"]: r
        for r in REGISTRY["observed_ingestion_metrics"]
        .fn(spark, SF_DIR)
        .collect()
    }
    assert list(rows) == ["batch", "after_exact", "after_near", "admitted"]
    admitted, _ = observed_screen(spark, SF_DIR, instrument=False)
    assert rows["admitted"]["n_docs"] == admitted.count()
    n = [rows[s]["n_docs"] for s in rows]
    assert n[0] >= n[1] >= n[2] >= n[3] > 0
    c = [rows[s]["n_chars"] for s in rows]
    assert c[0] >= c[1] >= c[2] >= c[3] > 0


# --------------------------------------------------------------------------
# vector_index_lifecycle — plan pin + independent NumPy mirror


def test_vector_index_lifecycle_plan(spark):
    """The composite adds exactly THREE wide edges beyond its three
    standalone parts (ivf_cell_balance + ann_ivf_topk's probe shape +
    retrieval_mrr_recall's eval shape): the probe-cost groupBy's
    global avg, the overlap recount's groupBy, and the final
    single-partition assembly — pinned as a DELTA so the shared
    screen's own shape can evolve.  (Was FIVE before the r8
    optimization round pinned `sizes` and `probe_cells`: their
    persists collapse the re-expanded assignment subtrees to
    InMemoryRelations in the static plan.)  The static count remains
    an upper bound on real shuffles."""
    from axolotls_spark.plans.audit import audit

    comp = audit(REGISTRY["vector_index_lifecycle"].fn(spark, SF_DIR))
    bal = audit(REGISTRY["ivf_cell_balance"].fn(spark, SF_DIR))
    ivf = audit(REGISTRY["ann_ivf_topk"].fn(spark, SF_DIR))
    mrr = audit(REGISTRY["retrieval_mrr_recall"].fn(spark, SF_DIR))
    assert "CartesianProduct" not in comp.text
    assert "BatchEvalPython" not in comp.text
    assert comp.n_exchanges == (
        bal.n_exchanges + ivf.n_exchanges + mrr.n_exchanges + 3
    )


def test_vector_index_lifecycle_vs_numpy(spark):
    """Third implementation: straight-line NumPy IVF build + probe +
    recall on the raw parquet — no Spark, no SQL — must agree with
    the registered composite on every output."""
    import duckdb
    import numpy as np

    row = REGISTRY["vector_index_lifecycle"].fn(spark, SF_DIR).collect()[0]
    d = duckdb.connect().execute(
        f"SELECT vec_id, embedding FROM '{SF_DIR}/embeddings.parquet' "
        "ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in d])
    X = np.array([r[1] for r in d], dtype=np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    C = Xn[ids < 16]
    sim = Xn @ C.T  # (n, 16) cosine to each centroid
    # argmax with cell-id tie-break == argmax of (sim, -cell) lexicographic
    assign = sim.argmax(axis=1)
    sizes = np.bincount(assign, minlength=16)
    sizes = sizes[sizes > 0]
    assert row["n_vecs"] == len(ids)
    assert row["n_cells"] == (sizes > 0).sum()
    assert row["max_cell"] == sizes.max()
    np.testing.assert_allclose(
        row["imbalance"], sizes.max() / sizes.mean(), rtol=1e-6
    )
    top4 = np.sort(sizes)[-4:].sum()
    np.testing.assert_allclose(
        row["worst4_scan_frac"], top4 / len(ids), rtol=1e-6
    )
    qmask = ids % 25 == 0
    qidx = np.nonzero(qmask)[0]
    assert row["n_queries"] == len(qidx)
    # probe: top-4 cells per query, tie-break by cell id (stable sort
    # on -sim then cell == lexsort keys (cell, -sim))
    order = np.lexsort((np.tile(np.arange(sim.shape[1]), (len(qidx), 1)),
                        -sim[qidx]), axis=1)
    probes = order[:, :4]
    n_cand = np.array(
        [np.bincount(assign, minlength=16)[p].sum() - 1 for p in probes]
    )
    np.testing.assert_allclose(
        row["avg_probe_frac"],
        round(n_cand.mean() / (len(ids) - 1), 6),
        atol=2e-6,
    )
    full = Xn @ Xn.T
    hits = 0
    for qi, p in zip(qidx, probes):
        s = full[qi].copy()
        s[qi] = -np.inf  # exclude self
        # exact top-10: (-sim, cand_id) lexicographic
        exact = np.lexsort((ids, -s))[:10]
        mask = np.isin(assign, p)
        mask[qi] = False
        cand = np.nonzero(mask)[0]
        ivf = cand[np.lexsort((ids[cand], -s[cand]))][:10]
        hits += len(np.intersect1d(exact, ivf)) / 10.0
    np.testing.assert_allclose(
        row["recall_at_10"], round(hits / len(qidx), 6), atol=2e-6
    )


# --------------------------------------------------------------------------
# Corpus-scaled build sides must never broadcast (r7 sf10 finding)


def test_prefix_jaccard_verify_joins_not_broadcast(spark):
    """The r7 measured-decade sweep caught the planner broadcasting
    the collect_set verify arrays / document-frequency / prefix
    relations (post-agg size estimates undervalue them; the 64 MB
    threshold let them through) — fine at sf0.1, driver-fatal at
    sf10, wrong at 100 TB.  The merge hints in
    operators/dedup.jaccard_prefix_pairs and
    minhash_xxhash_production force sort-merge there; this pin fails
    if a refactor drops them: every doc_id-keyed verify join and the
    sh-keyed candidate joins must be SortMergeJoin, leaving
    BroadcastHashJoin only for genuinely bounded sides."""
    import re

    from axolotls_spark.plans.audit import audit

    # r8: minhash_xxhash_production dropped its corpus-scaled truth
    # join (3 SMJ: band self-join + the two verify-array joins); the
    # full 6-SMJ certification shape lives in the sampled cert query.
    # r8 optimization: jaccard_prefix_pairs now computes document
    # frequency as a count window over the shingle exchange instead
    # of aggregating dfreq separately and merge-joining it back, so
    # its SMJ floor is 3 (prefix self-join + two verify-array joins)
    # — one fewer join, not a join downgraded to broadcast (the
    # doc-keyed broadcast regex below still guards that).
    for name, min_smj in (("jaccard_prefix_join", 3),
                          ("minhash_xxhash_production", 3),
                          ("minhash_xxhash_recall_cert", 6)):
        f = audit(REGISTRY[name].fn(spark, SF_DIR))
        assert f.n_sort_merge_joins >= min_smj, (
            f"{name}: expected >= {min_smj} sort-merge joins "
            f"(corpus-scaled sides), got {f.n_sort_merge_joins}"
        )
        # No broadcast build keyed on doc ids (the verify-array side).
        bad = re.findall(
            r"BroadcastHashJoin \[doc_(?:id|a|b)[^\]]*\]", f.text
        )
        assert not bad, f"{name}: corpus-scaled broadcast {bad}"


def test_observed_join_zero_exchanges_and_broadcast(spark):
    """The join-health observe query: one CollectMetrics node rides a
    broadcast left join's output — no shuffle exchange anywhere (the
    observed aggregates are map-side folds), and the counters equal a
    recount."""
    from axolotls_spark.plans.audit import audit
    from axolotls_spark.io.sources import load_table
    from pyspark.sql import functions as F

    row = REGISTRY["observed_join_match_rate"].fn(spark, SF_DIR).collect()[0]
    assert row["n_fact"] >= row["n_matched"] > 0
    assert abs(row["match_rate"] - row["n_matched"] / row["n_fact"]) < 1e-6
    # recount independently
    li = load_table(spark, SF_DIR, "lineitem")
    part = load_table(spark, SF_DIR, "part")
    n_fact = li.count()
    n_matched = (
        li.join(
            part.filter(F.col("p_size") >= 25).select("p_partkey"),
            li["l_partkey"] == F.col("p_partkey"),
            "left_semi",
        ).count()
    )
    assert row["n_fact"] == n_fact
    assert row["n_matched"] == n_matched
    # plan: broadcast join, zero shuffle exchanges, one CollectMetrics
    from axolotls_spark.queries_observability import (  # noqa: F401
        observed_join_match_rate,
    )
    fact = li.select("l_partkey",
                     F.round(F.col("l_extendedprice") * 100)
                     .cast("long").alias("cents"))
    dim = part.filter(F.col("p_size") >= 25).select("p_partkey")
    from pyspark.sql import Observation
    ob = Observation()
    joined = fact.join(F.broadcast(dim),
                       fact["l_partkey"] == dim["p_partkey"],
                       "left").observe(ob, F.count(F.lit(1)).alias("n"))
    f = audit(joined)
    assert f.n_exchanges == 0
    assert f.n_broadcast_hash_joins >= 1
    assert f.text.count("CollectMetrics") == 2  # 1 node x (tree+detail)
