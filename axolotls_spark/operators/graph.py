"""Relational graph analytics — PageRank over an aggregated graph.

The reference has no graph surface (SURVEY §2A: element-wise torch
kernels only); this is a §2B-style extension following the same
design as relational k-means (operators/clustering.py): the
corpus-sized work is ONE aggregation that shrinks 100 TB of facts to
a small weighted graph, after which every Lloyd/power iteration is a
broadcast join over the tiny rank vector — unrolled into a single
lazy Catalyst plan, no driver-side loop state, no collect().

Scale sketch: |nodes| = dimension cardinality (25 nations), |edges|
<= |nodes|^2 — both broadcastable at any fact-table scale. For
graphs where the rank vector itself is huge (billions of nodes) the
same step degrades gracefully to a shuffle hash join on src — the
code is identical, only the broadcast hint goes away.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAMPING = 0.85
ITERS = 5


def pagerank(edges: DataFrame, damping: float = DAMPING,
             iters: int = ITERS) -> DataFrame:
    """Power-iterate PageRank on a weighted edge list (src, dst, w).

    Nodes = union of endpoints; transition weight = w / out-weight
    of src; rank_0 = 1/N; rank_{t+1}(v) = (1-d)/N + d * sum over
    in-edges of rank_t(u) * wn(u,v). Nodes with no out-edges leak
    mass (standard simplification — no dangling redistribution),
    which keeps every step a pure join+aggregate both engines can
    replay. Returns (node, rank) as one unrolled lazy plan.
    """
    # The aggregated graph is tiny (|nodes|^2 rows max) but its
    # lineage is the full fact-table aggregation; every unrolled
    # iteration and every broadcast build would otherwise re-derive
    # that lineage. Persisting the graph relation is the textbook
    # "cache only what is re-used" case: one corpus pass, then all
    # iterations run against the in-memory edge list. The repartition
    # to one partition keeps each 25-row iteration stage from
    # spawning shuffle.partitions near-empty tasks; for a graph with
    # a huge rank vector (billions of nodes) drop the repartition and
    # the same plan degrades gracefully to shuffled joins.
    edges = edges.repartition(1).persist()
    # Eager materialization: the persisted graph fans out to nodes /
    # ow / t, whose lazy cache builds RACE at the first action and
    # each re-runs the full corpus-aggregation lineage (r8 §16). One
    # count() serializes the build; every later pass is in-memory.
    edges.count()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    # 1-row count relation — broadcast, never a driver .count().
    ncnt = nodes.agg(F.count(F.lit(1)).cast("double").alias("n"))
    ow = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    t = edges.join(ow, "src").select(
        "src", "dst", (F.col("w") / F.col("ow")).alias("wn")
    ).persist()
    # (node, n) base relation every iteration rebuilds ranks from.
    # repartition(1): nodes descends from a DISTINCT whose exchange
    # leaves it hash-partitioned at shuffle.partitions — paired with
    # the SinglePartition t, every loop join would re-shuffle one
    # side per iteration.  Collapsing base to SinglePartition (25
    # rows) makes all loop inputs co-partitioned.
    base = nodes.crossJoin(F.broadcast(ncnt)).repartition(1).persist()
    ranks = base.select("node", (F.lit(1.0) / F.col("n")).alias("rank"))
    # Merge-hinted (not broadcast) iteration joins: every relation in
    # the loop is SinglePartition (edges/t/base descend from the
    # repartition(1)), and SinglePartition satisfies any clustered
    # distribution — so SMJ needs NO exchange and the per-node
    # aggregate none either.  The broadcast form cost one broadcast
    # job + one AQE stage per unrolled step, and the driver's ~60 ms
    # re-optimization gap BETWEEN stages dominated the query
    # (measured: 41 jobs, 1.1 cpu_s, 3.3 s wall); the exchange-free
    # loop pipelines all iterations inside a single stage.  For a
    # huge rank vector drop the repartition(1) upstream and the same
    # hints yield ordinary shuffled merge joins.
    for _ in range(iters):
        contrib = (
            t.join(ranks.hint("merge"), t.src == ranks.node)
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("wn")).alias("s"))
        )
        ranks = (
            base.join(contrib.hint("merge"), base.node == contrib.dst, "left")
            .select(
                "node",
                (
                    F.lit(1.0 - damping) / F.col("n")
                    + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("rank"),
            )
        )
    return ranks


def personalized_pagerank(
    edges: DataFrame,
    seed: str,
    damping: float = DAMPING,
    iters: int = ITERS,
) -> DataFrame:
    """Random walk with restart: PageRank whose restart mass all
    returns to ``seed`` instead of spreading uniformly — the
    standard graph-proximity score ("how related is every node to
    the seed"), used for graph-based recommendation and seed
    expansion. Same aggregate-then-iterate shape as ``pagerank``:
    the rank vector stays node-domain-sized and broadcast; only the
    restart vector differs (an indicator on the seed).

    SMALL-GRAPH ASSUMPTION (same contract as ``pagerank`` above): the
    ``repartition(1)`` below deliberately collapses the *aggregated*
    edge relation — tiny here (≤ |nodes|² rows; the 25-nation trade
    graph) — so each unrolled iteration doesn't spawn
    shuffle.partitions near-empty tasks. For a real edge set
    (billions of edges / a huge rank vector) DROP the repartition:
    the identical plan degrades gracefully to shuffled joins with the
    broadcast-ranks build it already uses."""
    edges = edges.repartition(1).persist()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        # SinglePartition so every loop join below is co-partitioned
        # with the SinglePartition t — same exchange-free iteration
        # as pagerank() (the DISTINCT otherwise leaves nodes hash-
        # partitioned and each step re-shuffles one side).
        .repartition(1)
        .persist()
    )
    ow = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    t = edges.join(ow, "src").select(
        "src", "dst", (F.col("w") / F.col("ow")).alias("wn")
    ).persist()
    restart = F.when(F.col("node") == seed, F.lit(1.0)).otherwise(
        F.lit(0.0)
    )
    ranks = nodes.select("node", restart.alias("rank"))
    # Merge-hinted exchange-free iteration — see pagerank() above.
    for _ in range(iters):
        contrib = (
            t.join(ranks.hint("merge"), t.src == ranks.node)
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("wn")).alias("s"))
        )
        ranks = nodes.join(
            contrib.hint("merge"), nodes.node == contrib.dst, "left"
        ).select(
            "node",
            (
                F.lit(1.0 - damping) * restart
                + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
            ).alias("rank"),
        )
    return ranks
