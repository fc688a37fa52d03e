"""Similarity search over embedding columns.

Two tiers, mirroring how ANN works on a cluster:

- ``brute_force_topk``: exact cosine top-k. The query set is small
  and broadcast; every candidate partition scores its local rows and
  a per-query ranking window keeps k. Work is |queries| × |corpus|
  but embarrassingly parallel with NO shuffle of the corpus — only
  the (tiny) scored-and-pre-truncated stream shuffles for ranking.
- ``lsh_bucketed_topk``: approximate — random-hyperplane signatures
  (SimHash for vectors) bucket the corpus; queries only score
  candidates sharing a bucket. This is the 100 TB path: corpus scan
  becomes a bucket-pruned equi-join.

Projection hyperplanes are deterministic literals (seeded off-line)
so runs — and the oracle — are reproducible.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from axolotls_spark.functions.arrays import cosine
from axolotls_spark.io.sources import spread_for_cpu


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of ``corpus`` rows per ``queries`` row."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = spread_for_cpu(corpus, id_col).select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            cosine(F.col("q_vec"), F.col("c_vec")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("cand_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "cand_id", "sim", "rn")
    )


def embedding_dedup(
    df: DataFrame,
    threshold: float,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate removal: drop every row whose
    vector has cosine ≥ threshold with a LOWER-id row in the same
    block (lowest id is the kept representative — deterministic
    without computing full connected components, which would need an
    iterative join loop this engine reserves for GraphFrames-class
    work).

    The pair space is pruned by the block equi-join (at 100 TB:
    block on a coarse clusterer or LSH bucket, same shape); the
    dupe-id set is then a broadcast-able anti-join side.
    """
    a, b = df.alias("a"), df.alias("b")
    dupes = (
        a.join(
            b,
            (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .filter(
            cosine(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")) >= threshold
        )
        .select(F.col(f"b.{id_col}").alias(id_col))
        .distinct()
    )
    return df.join(dupes, id_col, "left_anti")


def rp_signature(df: DataFrame, dim: int, n_planes: int = 8,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 seed: int = 42) -> DataFrame:
    """(id, sig): random-hyperplane sign signature as a bit string.

    sign(v · h_j) per plane; the dot products are JVM-side
    zip_with/aggregate folds over broadcast literal planes.
    """
    planes = _hyperplanes(dim, n_planes, seed)
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    F.col(vec_col),
                    F.array(*[F.lit(x) for x in plane]),
                    lambda v, h: v.cast("double") * h,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            >= 0,
            F.lit("1"),
        )
        .otherwise(F.lit("0"))
        for plane in planes
    ]
    return df.select(
        F.col(id_col).alias("sig_id"), F.concat(*bits).alias("sig")
    )


def _sig_expr(vec_col: str, dim: int, n_planes: int, seed: int):
    """Signature of one table as a single column expression."""
    planes = _hyperplanes(dim, n_planes, seed)
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    F.col(vec_col),
                    F.array(*[F.lit(x) for x in plane]),
                    lambda v, h: v.cast("double") * h,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            >= 0,
            F.lit("1"),
        )
        .otherwise(F.lit("0"))
        for plane in planes
    ]
    return F.concat(*bits)


def _multi_table_signatures(
    df: DataFrame, dim: int, n_planes: int, n_tables: int,
    id_col: str, vec_col: str,
) -> DataFrame:
    """(sig_id, table, sig): one signature per LSH table (each table
    uses an independent hyperplane set via a distinct seed).

    All L tables' signatures are computed in ONE pass as an inline
    explode of (table, sig) structs — a union of per-table
    derivations would re-run the corpus scan (and every upstream
    stage) L times, which is exactly the multi-pass trap the 100 TB
    rules forbid.
    """
    per_table = F.array(
        *[
            F.struct(
                F.lit(t).alias("table"),
                _sig_expr(vec_col, dim, n_planes, seed=1000 + t).alias("sig"),
            )
            for t in range(n_tables)
        ]
    )
    return df.select(
        F.col(id_col).alias("sig_id"), F.explode(per_table).alias("ts")
    ).select("sig_id", F.col("ts.table").alias("table"), F.col("ts.sig").alias("sig"))


def assign_cells(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_best: int = 1,
) -> DataFrame:
    """(id, cell, rn): nearest ``n_best`` centroid cells per vector
    (cosine argmax, centroid-id tie-break → deterministic).

    Centroids are broadcast; the cross join materializes only skinny
    (id, cell, sim) rows — embeddings never fan out K-ways. The
    ranking shuffle moves those skinny rows on id.
    """
    cents = F.broadcast(
        centroids.select(
            F.col(id_col).alias("cell"), F.col(vec_col).alias("cent_vec")
        )
    )
    scored = spread_for_cpu(df, id_col).select(id_col, vec_col).join(cents).select(
        id_col,
        "cell",
        cosine(F.col(vec_col), F.col("cent_vec")).alias("cell_sim"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("cell_sim"), F.asc("cell"))
    return (
        scored.withColumn("cell_rn", F.row_number().over(w))
        .filter(F.col("cell_rn") <= n_best)
        .select(id_col, "cell", "cell_rn")
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: corpus vectors are
    indexed by their nearest centroid cell; each query probes its
    ``nprobe`` nearest cells and scores only vectors in them.

    Unlike LSH this is fully deterministic given the centroid set
    (no random planes), so it IS oracle-checkable. The cell
    assignment is the IVF build (one pass, persistable); the probe
    join is an equi-join on cell — at 100 TB the corpus is
    partitioned by cell on disk and a probe touches nprobe/n_cells
    of the data.
    """
    corpus_cells = assign_cells(corpus, centroids, id_col, vec_col, n_best=1)
    probe_cells = assign_cells(
        queries, centroids, id_col, vec_col, n_best=nprobe
    ).withColumnRenamed(id_col, "query_id")
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("c_vec"))
    cand = (
        corpus_cells.withColumnRenamed(id_col, "cand_id")
        .join(F.broadcast(probe_cells), "cell")
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id")
    )
    scored = (
        cand.join(c, "cand_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "cand_id",
            cosine(F.col("q_vec"), F.col("c_vec")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("cand_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "cand_id", "sim", "rn")
    )


def lsh_bucketed_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 4,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: multi-table LSH (OR-amplification).

    A single signature table has per-plane collision prob
    p = 1 - θ/π, so recall p^planes dies fast for moderate
    similarity; L independent tables recover 1-(1-p^planes)^L.
    Candidates are deduped across tables BEFORE scoring, so each
    (query, candidate) pair is scored exactly once.
    """
    qs = _multi_table_signatures(queries, dim, n_planes, n_tables, id_col, vec_col)
    cs = _multi_table_signatures(corpus, dim, n_planes, n_tables, id_col, vec_col)
    cand = (
        cs.join(
            F.broadcast(qs.withColumnRenamed("sig_id", "query_id")),
            ["table", "sig"],
        )
        .filter(F.col("query_id") != F.col("sig_id"))
        .select("query_id", F.col("sig_id").alias("cand_id"))
        .distinct()
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    c = corpus.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        cand.join(c, "cand_id")
        .join(F.broadcast(q), "query_id")
        .select("query_id", "cand_id", cosine(F.col("q_vec"), F.col("c_vec")).alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("cand_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "cand_id", "sim", "rn")
    )


def mips_norm_pruned_topk(
    q: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    m: int = 200,
) -> DataFrame:
    """EXACT maximum-inner-product top-k with the Cauchy-Schwarz norm
    bound (LEMP/FEXIPRO's first pruning tier).

    ``q``: (query_id, qv) query block (small, broadcast).  ``corpus``:
    (vec_id, embedding).  Phase 1 scores only the ``m`` largest-norm
    vectors (TakeOrderedAndProject) and takes each query's
    provisional k-th best t_q; phase 2 filters the corpus by
    ‖x‖·‖q‖ ≥ t_q before any dot product.  Every true top-k member
    survives (score ≤ ‖x‖‖q‖ and true-kth ≥ t_q), so the output is
    bit-identical to brute force.  Pruning power depends on norm
    skew: heavy-tailed norms (popularity-scaled item factors — the
    MIPS workload) prune hard; isotropic vectors degrade gracefully
    to brute force, never to a wrong answer.

    Exactness preconditions are enforced here, not assumed: the
    provisional phase must yield >= k rows per query for t_q to lower-
    bound the true k-th score, so ``m`` is clamped to ``k + 1`` (the
    ``vec_id != query_id`` self-filter can cost one candidate).  A
    query whose provisional set is still empty (degenerate corpus)
    falls back to brute force via a left join with t_q = -inf instead
    of silently disappearing from the output.
    """
    from axolotls_spark.functions.arrays import dot, norm

    m = max(m, k + 1)
    qn = q.select(
        "query_id", "qv", norm(F.col("qv")).alias("qnorm")
    )
    cn = corpus.select(
        "vec_id", "embedding", norm(F.col("embedding")).alias("xnorm")
    )
    cands = cn.orderBy(F.desc("xnorm"), F.asc("vec_id")).limit(m)
    wq = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("cand_id")
    )
    prov = (
        cands.crossJoin(F.broadcast(qn))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("cand_id"),
            dot(F.col("qv"), F.col("embedding")).alias("score"),
        )
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= k)
    )
    tq = prov.groupBy("query_id").agg(F.min("score").alias("tq"))
    qb = qn.join(F.broadcast(tq), "query_id", "left").withColumn(
        "tq", F.coalesce(F.col("tq"), F.lit(float("-inf")))
    )
    survivors = (
        cn.crossJoin(F.broadcast(qb))
        .filter(F.col("vec_id") != F.col("query_id"))
        .filter(F.col("xnorm") * F.col("qnorm") >= F.col("tq"))
        .select(
            "query_id",
            F.col("vec_id").alias("cand_id"),
            dot(F.col("qv"), F.col("embedding")).alias("score"),
        )
    )
    return (
        survivors.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= k)
    )
