"""Distributed PCA over embedding columns.

Dimensionality reduction for embedding tables (compaction before ANN
indexing, whitening before clustering) — a §2B LLM-pipeline
extension; the reference has no linear algebra beyond element-wise
torch ops.

Scale design (the moment-sketch shape):

1. **Partial Gram matrices map-side.** Each Arrow batch contributes
   (count, sum-vector, X^T·X) — a d + d² fixed-size partial per
   partition, computed vectorized in numpy inside ``mapInPandas``.
   The corpus is read ONCE and never shuffled; only
   O(partitions × d²) floats move.
2. **Tiny exact reduce.** Partials explode to (pos, val) rows and
   sum by position — exact, associative, a few-thousand-row shuffle
   regardless of corpus size.
3. **Eigendecomposition where the data is small.** The d×d
   covariance is one row; ``numpy.linalg.eigh`` runs inside a
   ``mapInPandas`` over that single row (never a driver collect),
   emitting the top-k eigenpairs.
4. **Projection as a relational op.** Components are a (pos, comp,
   weight) relation (d·k rows, broadcast); scores are a join +
   group-by dot product in whole-stage codegen.

Eigenvector sign (and near-degenerate order) is solver-specific, so
the query is rows-only for the oracle; accuracy vs numpy's reference
PCA is pinned in tests/test_pca.py (eigenvalues, orthonormality,
sign-insensitive score match).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gram_moments(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """(n, sum, gram) 1-row relation via map-side numpy partials +
    exact positional reduce. Population moments — covariance uses
    1/n (matched by the tests' numpy reference)."""

    def partials(
        it: Iterator["pd.DataFrame"],  # noqa: F821
    ) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        n = 0
        s = None
        g = None
        for pdf in it:
            x = np.vstack(pdf[vec_col].to_numpy()).astype("float64")
            n += x.shape[0]
            s = x.sum(0) if s is None else s + x.sum(0)
            g = x.T @ x if g is None else g + x.T @ x
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "g": [g.ravel().tolist()]}
            )

    p = emb.select(vec_col).mapInPandas(
        partials, "n BIGINT, s ARRAY<DOUBLE>, g ARRAY<DOUBLE>"
    )
    # Exact reduce: few rows x (d + d^2) values -> positional sums.
    sums = (
        p.select(F.posexplode("s").alias("pos", "v"))
        .groupBy("pos")
        .agg(F.sum("v").alias("v"))
    )
    grams = (
        p.select(F.posexplode("g").alias("pos", "v"))
        .groupBy("pos")
        .agg(F.sum("v").alias("v"))
    )
    n_total = p.agg(F.sum("n").alias("n"))
    # collect_list gives NO cross-partition order guarantee, even after
    # an orderBy (the final agg's merge can interleave) — carry pos in a
    # struct and array_sort, then strip it.  Positional order is load-
    # bearing here: a permutation silently scrambles the covariance.
    _ordered = lambda c: F.transform(  # noqa: E731
        F.array_sort(F.collect_list(F.struct(F.col("pos"), F.col("v")))),
        lambda s: s["v"],
    )
    s_arr = sums.agg(_ordered("s").alias("s"))
    g_arr = grams.agg(_ordered("g").alias("g"))
    return n_total.crossJoin(F.broadcast(s_arr)).crossJoin(F.broadcast(g_arr))


def principal_components(moments: DataFrame, k: int) -> DataFrame:
    """Top-k eigenpairs of the covariance as a (comp, eigenvalue,
    pos, weight) relation — eigh on the 1-row moments inside
    mapInPandas, never a driver-side collect."""

    def eig(
        it: Iterator["pd.DataFrame"],  # noqa: F821
    ) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        for pdf in it:
            for _, row in pdf.iterrows():
                n = float(row["n"])
                s = np.asarray(row["s"], dtype="float64")
                d = s.shape[0]
                g = np.asarray(row["g"], dtype="float64").reshape(d, d)
                mean = s / n
                cov = g / n - np.outer(mean, mean)
                vals, vecs = np.linalg.eigh(cov)
                order = np.argsort(vals)[::-1][:k]
                out = {
                    "comp": [],
                    "eigenvalue": [],
                    "pos": [],
                    "weight": [],
                    "mean_pos": [],
                }
                for ci, ei in enumerate(order):
                    for pos in range(d):
                        out["comp"].append(ci)
                        out["eigenvalue"].append(float(vals[ei]))
                        out["pos"].append(pos)
                        out["weight"].append(float(vecs[pos, ei]))
                        out["mean_pos"].append(float(mean[pos]))
                yield pd.DataFrame(out)

    return moments.mapInPandas(
        eig,
        "comp INT, eigenvalue DOUBLE, pos INT, weight DOUBLE,"
        " mean_pos DOUBLE",
    )


def pca_project(
    emb: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Project every vector onto the top-k principal axes (centered):
    score(v, c) = sum_pos (x[pos] - mean[pos]) * w[c, pos].

    The components relation (d·k rows) broadcasts; the projection is
    an equi-join on pos + hash aggregate — pure codegen over the
    corpus, one shuffle (the groupBy), no Python in the hot path.
    """
    comps = principal_components(gram_moments(emb, vec_col), k)
    long = emb.select(
        id_col, F.posexplode(vec_col).alias("pos", "val_f")
    ).select(id_col, "pos", F.col("val_f").cast("double").alias("val"))
    return (
        long.join(F.broadcast(comps), "pos")
        .groupBy(id_col, "comp")
        .agg(
            F.sum(
                (F.col("val") - F.col("mean_pos")) * F.col("weight")
            ).alias("score"),
            F.first("eigenvalue").alias("eigenvalue"),
        )
    )
