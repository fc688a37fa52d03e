"""Spatial family: grid-join completeness vs brute force (numpy
third implementation), DBSCAN labeling invariants, and the
no-cartesian plan contract."""

from __future__ import annotations

import numpy as np

from axolotls_spark.io.sources import load_table
from axolotls_spark.queries import REGISTRY
from axolotls_spark.queries_spatial import (
    _DBSCAN_MIN_NBRS,
    _SPATIAL_K,
    _eps_points,
    eps_neighbor_pairs,
)


def _xy_eps(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").collect()
    ids = np.array([r.vec_id for r in emb])
    xy = np.array([[r.embedding[0], r.embedding[1]] for r in emb], dtype=np.float64)
    return ids, xy, _SPATIAL_K / np.sqrt(len(ids))


def test_grid_join_matches_brute_force(spark, sf_dir):
    """The 3x3 grid-probe equi-join must reproduce the quadratic
    ground truth pair-for-pair: no neighbor missed at a cell
    boundary, none invented."""
    ids, xy, eps = _xy_eps(spark, sf_dir)
    d2 = ((xy[:, None, :] - xy[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    ii, jj = np.nonzero(d2 <= eps * eps)
    want = {(int(ids[i]), int(ids[j])) for i, j in zip(ii, jj)}
    pts = _eps_points(spark, sf_dir)
    got = {(r.u, r.v) for r in eps_neighbor_pairs(pts).collect()}
    assert got == want


def test_dbscan_labeling_invariants(spark, sf_dir):
    """Every label checked against numpy-derived ground truth:
    core <=> neighbor count >= minPts; border = non-core with a core
    neighbor, attached to the MIN core-neighbor rep; noise has no
    core neighbor and a NULL rep; all core points sharing an
    eps-edge share a cluster rep; reps are cluster minima."""
    ids, xy, eps = _xy_eps(spark, sf_dir)
    d2 = ((xy[:, None, :] - xy[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    adj = d2 <= eps * eps
    ncount = adj.sum(1)
    is_core = ncount >= _DBSCAN_MIN_NBRS
    rows = {r.vec_id: r for r in
            REGISTRY["dbscan_core_clusters"].fn(spark, sf_dir).collect()}
    assert set(rows) == {int(i) for i in ids}
    by_idx = {int(v): k for k, v in enumerate(ids)}
    for vid, r in rows.items():
        i = by_idx[vid]
        core_nbrs = [int(ids[j]) for j in np.nonzero(adj[i])[0] if is_core[j]]
        if r.role == "core":
            assert is_core[i]
            # rep is a core id no larger than every core neighbor's rep
            assert r.cluster_rep <= vid
            for cn in core_nbrs:
                assert rows[cn].role == "core"
                assert rows[cn].cluster_rep == r.cluster_rep
        elif r.role == "border":
            assert not is_core[i] and core_nbrs
            assert r.cluster_rep == min(
                rows[cn].cluster_rep for cn in core_nbrs
            )
        else:
            assert not is_core[i] and not core_nbrs
            assert r.cluster_rep is None


def test_spatial_plan_no_cartesian(spark, sf_dir):
    """The candidate join is an equi-join on cell coordinates; the
    only nested-loop allowed is the 1-row eps broadcast. Neighbor
    counting must never plan a cartesian over the point relation."""
    from axolotls_spark.plans.audit import audit

    f = audit(REGISTRY["spatial_eps_neighbors"].fn(spark, sf_dir))
    assert "CartesianProduct" not in f.text
