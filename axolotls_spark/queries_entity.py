"""Entity-resolution queries — blocking, best-match, recall, clusters.

Registry entries for operators/entity.py (see that module's
docstring for the scale argument). The dirty side is synthesized
deterministically from ``customer``, so every stage — including
blocking recall against known ground truth — is exactly
DuckDB-oracle-checkable at every scale factor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from axolotls_spark.io.sources import load_table
from axolotls_spark.operators import entity as E
from axolotls_spark.registry import register

# --------------------------------------------------------------------------
# Shared oracle CTEs: dirty synthesis → single-pass multi-key blocking
# → candidate pairs → scored pairs. Mirrors operators/entity.py
# stage for stage (same key families, same weights, same levenshtein).
# --------------------------------------------------------------------------

_ER_CTES = """
    dirty AS (
        SELECT c_custkey + 10000000 AS rec_id,
               substr(c_name, 1, CAST(9 + c_custkey % 8 AS INT))
                 || substr(c_name, CAST(11 + c_custkey % 8 AS INT)) AS name,
               CAST(CASE WHEN c_custkey % 5 = 0
                         THEN (c_nationkey + 1) % 25
                         ELSE c_nationkey END AS INTEGER) AS nationkey,
               c_acctbal AS acctbal,
               c_mktsegment AS mktsegment
        FROM customer
    ),
    clean AS (
        SELECT c_custkey AS key, c_name AS name, c_nationkey AS nationkey,
               c_acctbal AS acctbal, c_mktsegment AS mktsegment
        FROM customer
    ),
    kd AS (
        SELECT rec_id AS id, name, nationkey, acctbal, mktsegment,
               'sfx' AS kt, substr(name, length(name) - 3) AS kv
        FROM dirty
        UNION ALL
        SELECT rec_id, name, nationkey, acctbal, mktsegment,
               'nba',
               CAST(nationkey AS VARCHAR) || '|'
                 || CAST(CAST(ROUND(acctbal * 100) AS BIGINT) AS VARCHAR)
        FROM dirty
    ),
    kc AS (
        SELECT key AS id, name, nationkey, acctbal, mktsegment,
               'sfx' AS kt, substr(name, length(name) - 3) AS kv
        FROM clean
        UNION ALL
        SELECT key, name, nationkey, acctbal, mktsegment,
               'nba',
               CAST(nationkey AS VARCHAR) || '|'
                 || CAST(CAST(ROUND(acctbal * 100) AS BIGINT) AS VARCHAR)
        FROM clean
    ),
    cand AS (
        SELECT DISTINCT
               d.id AS rec_id, c.id AS key,
               d.name AS d_name, c.name AS c_name,
               d.nationkey AS d_nat, c.nationkey AS c_nat,
               d.acctbal AS d_acct, c.acctbal AS c_acct,
               d.mktsegment AS d_seg, c.mktsegment AS c_seg
        FROM kd d JOIN kc c ON d.kt = c.kt AND d.kv = c.kv
    ),
    scored AS (
        SELECT rec_id, key,
               0.5 * (1.0 - levenshtein(d_name, c_name) / 18.0)
             + 0.2 * (CASE WHEN d_acct = c_acct THEN 1.0 ELSE 0.0 END)
             + 0.15 * (CASE WHEN d_nat = c_nat THEN 1.0 ELSE 0.0 END)
             + 0.15 * (CASE WHEN d_seg = c_seg THEN 1.0 ELSE 0.0 END)
               AS score
        FROM cand
    )
"""


@register(
    "er_best_match",
    oracle=f"""
    WITH {_ER_CTES}
    SELECT rec_id,
           key AS matched_key,
           CAST(score AS REAL) AS score,
           (key = rec_id - 10000000) AS is_true_match
    FROM scored
    QUALIFY ROW_NUMBER() OVER (PARTITION BY rec_id
                               ORDER BY score DESC, key) = 1
    """,
    tags=("entity-resolution", "record-linkage", "blocking", "levenshtein"),
)
def er_best_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage: each dirty record's best clean match by the
    weighted agreement score (ties broken by key). Blocking is one
    shuffle for both key families; scoring and ranking add one
    window shuffle on rec_id — O(candidates), never O(N²)."""
    cust = load_table(spark, sf_dir, "customer")
    scored = E.score_pairs(
        E.blocked_candidates(E.synthesize_dirty_customers(cust), _clean(cust))
    )
    w = Window.partitionBy("rec_id").orderBy(F.desc("score"), "key")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "rec_id",
            F.col("key").alias("matched_key"),
            F.col("score").cast("float").alias("score"),
            (F.col("key") == F.col("rec_id") - E.DIRTY_OFFSET).alias(
                "is_true_match"
            ),
        )
    )


def _clean(cust: DataFrame) -> DataFrame:
    return cust.select(
        F.col("c_custkey").alias("key"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_mktsegment").alias("mktsegment"),
    )


@register(
    "er_blocking_recall",
    oracle=f"""
    WITH {_ER_CTES}
    SELECT CAST((SELECT COUNT(*) FROM dirty) AS BIGINT) AS n_records,
           CAST(COUNT(*) AS BIGINT) AS n_candidates,
           CAST(SUM(CASE WHEN key = rec_id - 10000000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_true_blocked,
           CAST(SUM(CASE WHEN key = rec_id - 10000000 THEN 1 ELSE 0 END)
                / (SELECT COUNT(*) FROM dirty) AS REAL) AS recall,
           CAST(COUNT(*) / (SELECT COUNT(*) FROM dirty) AS REAL)
               AS cands_per_record
    FROM cand
    """,
    tags=("entity-resolution", "blocking", "recall", "diagnostics"),
)
def er_blocking_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-quality preflight: pair completeness (recall of true
    matches surviving blocking — measurable here because ground
    truth is synthesized) and candidate fan-out per record, the two
    numbers that decide whether a blocking scheme is usable at
    100 TB BEFORE the O(candidates) scoring job runs. 1-row output:
    the candidate relation aggregates once; the dirty count rides as
    a broadcast scalar."""
    cust = load_table(spark, sf_dir, "customer")
    dirty = E.synthesize_dirty_customers(cust)
    cand = E.blocked_candidates(dirty, _clean(cust))
    n_dirty = dirty.agg(F.count(F.lit(1)).alias("n_records"))
    hit = F.when(
        F.col("key") == F.col("rec_id") - E.DIRTY_OFFSET, 1
    ).otherwise(0)
    stats = cand.agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.sum(hit).alias("n_true_blocked"),
    )
    # try_divide: an empty dirty side (fresh partition, all-filtered
    # backfill) must yield NULL rates, not an ANSI DIVIDE_BY_ZERO —
    # caught by the empty-input matrix (tests/test_empty_inputs.py).
    return stats.crossJoin(F.broadcast(n_dirty)).select(
        "n_records",
        "n_candidates",
        "n_true_blocked",
        F.try_divide(F.col("n_true_blocked"), F.col("n_records"))
        .cast("float")
        .alias("recall"),
        F.try_divide(F.col("n_candidates"), F.col("n_records"))
        .cast("float")
        .alias("cands_per_record"),
    )


@register(
    "er_clusters",
    oracle=f"""
    WITH RECURSIVE {_ER_CTES},
    links AS (SELECT rec_id, key FROM scored WHERE score >= 0.9),
    e AS (
        SELECT rec_id AS u, key AS v FROM links
        UNION
        SELECT key, rec_id FROM links
    ),
    reach(u, v) AS (
        SELECT u, v FROM e
        UNION
        SELECT r.u, e2.v FROM reach r JOIN e e2 ON r.v = e2.u
    ),
    rep AS (SELECT u, MIN(v) AS mn FROM reach GROUP BY u),
    nodes AS (
        SELECT key AS node_id FROM clean
        UNION ALL
        SELECT rec_id FROM dirty
    )
    SELECT n.node_id,
           CASE WHEN rep.mn IS NULL OR rep.mn > n.node_id
                THEN n.node_id ELSE rep.mn END AS cluster_rep
    FROM nodes n LEFT JOIN rep ON n.node_id = rep.u
    """,
    tags=("entity-resolution", "connected-components", "clustering"),
)
def er_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity clusters: connected components (alternating-star,
    O(log²n) rounds) over above-threshold links — every clean and
    dirty record labeled with the minimum id of its entity. The same
    CC operator that clusters near-dup documents resolves entities;
    the oracle pins both to one recursive-closure ground truth."""
    cust = load_table(spark, sf_dir, "customer")
    dirty = E.synthesize_dirty_customers(cust)
    scored = E.score_pairs(E.blocked_candidates(dirty, _clean(cust)))
    links = scored.filter(F.col("score") >= 0.9).select(
        F.col("rec_id").alias("doc_a"), F.col("key").alias("doc_b")
    )
    # Node set = {custkey} ∪ {custkey + OFFSET}: ONE scan + explode,
    # not a union of two customer projections (single-pass rule).
    nodes = cust.select(
        F.explode(
            F.array(
                F.col("c_custkey"),
                F.col("c_custkey") + F.lit(E.DIRTY_OFFSET),
            )
        ).alias("node_id")
    )
    from axolotls_spark.operators.dedup import connected_components_star

    return connected_components_star(
        nodes, links, id_col="node_id"
    ).select("node_id", F.col("group_rep").alias("cluster_rep"))


# --------------------------------------------------------------------------
# Fuzzy string join (edit distance ≤ 1) over document title strings.
# --------------------------------------------------------------------------


@register(
    "fuzzy_join_doc_titles",
    oracle="""
    WITH titles AS (
        SELECT doc_id, substr(text, 1, 40) AS s FROM documents
    ),
    probes AS (
        SELECT doc_id + 10000000 AS probe_id,
               substr(s, 1, CAST(doc_id % 39 AS INT))
                 || substr(s, CAST(doc_id % 39 AS INT) + 2) AS s
        FROM titles WHERE doc_id % 10 = 0
    )
    SELECT p.probe_id, t.doc_id AS match_id,
           CAST(levenshtein(p.s, t.s) AS INT) AS dist
    FROM probes p JOIN titles t
      ON abs(length(p.s) - length(t.s)) <= 1
    WHERE levenshtein(p.s, t.s) <= 1
    """,
    tags=("fuzzy-join", "edit-distance", "pigeonhole", "blocking"),
)
def fuzzy_join_doc_titles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance-≤1 join (operators/fuzzy.py): every 10th
    document's 40-char title, corrupted by one key-derived character
    deletion, matched against ALL titles via pigeonhole prefix/
    suffix blocking — one equi-join, constant keys per string, exact
    levenshtein verify; never all-pairs. The oracle IS all-pairs
    (with a length band): blocking completeness means the two must
    agree exactly, which is the whole point of certifying a
    candidate scheme."""
    from axolotls_spark.operators.fuzzy import edit1_join

    docs = load_table(spark, sf_dir, "documents")
    titles = docs.select("doc_id", F.substring("text", 1, 40).alias("s"))
    probes = titles.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 10000000).alias("probe_id"),
        F.expr(
            "substr(s, 1, CAST(doc_id % 39 AS INT)) || "
            "substr(s, CAST(doc_id % 39 AS INT) + 2)"
        ).alias("s"),
    )
    return edit1_join(probes, titles, "probe_id", "s", "doc_id", "s")


@register(
    "er_golden_records",
    oracle=f"""
    WITH RECURSIVE {_ER_CTES},
    links AS (SELECT rec_id, key FROM scored WHERE score >= 0.9),
    e AS (
        SELECT rec_id AS u, key AS v FROM links
        UNION
        SELECT key, rec_id FROM links
    ),
    reach(u, v) AS (
        SELECT u, v FROM e
        UNION
        SELECT r.u, e2.v FROM reach r JOIN e e2 ON r.v = e2.u
    ),
    rep AS (SELECT u, MIN(v) AS mn FROM reach GROUP BY u),
    members AS (
        SELECT n.node_id,
               CASE WHEN rep.mn IS NULL OR rep.mn > n.node_id
                    THEN n.node_id ELSE rep.mn END AS cluster_rep,
               n.name, n.nationkey, n.acctbal, n.mktsegment
        FROM (
            SELECT key AS node_id, name, nationkey, acctbal, mktsegment
            FROM clean
            UNION ALL
            SELECT rec_id, name, nationkey, acctbal, mktsegment
            FROM dirty
        ) n LEFT JOIN rep ON n.node_id = rep.u
    )
    SELECT cluster_rep,
           CAST(COUNT(*) AS BIGINT) AS n_sources,
           MIN(name) AS name,
           CAST(MIN(nationkey) AS INT) AS nationkey,
           MAX(acctbal) AS acctbal,
           MIN(mktsegment) AS mktsegment
    FROM members
    GROUP BY cluster_rep
    """,
    tags=("entity-resolution", "survivorship", "golden-record", "merge"),
)
def er_golden_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship — the step after clustering that makes ER useful:
    one canonical ('golden') record per entity cluster, fields merged
    by deterministic rules (min name — the lexicographically-first,
    which for this corpus is always the clean full-length spelling;
    min nation, max balance, min segment; source count for lineage).
    One extra aggregate over the (records ⋈ cluster_rep) relation —
    survivorship costs a single shuffle on top of the clustering,
    and the rules are pure aggregates, so they merge associatively
    at any scale."""
    from axolotls_spark.operators.dedup import connected_components_star

    cust = load_table(spark, sf_dir, "customer")
    dirty = E.synthesize_dirty_customers(cust)
    clean = _clean(cust)
    scored = E.score_pairs(E.blocked_candidates(dirty, clean))
    links = scored.filter(F.col("score") >= 0.9).select(
        F.col("rec_id").alias("doc_a"), F.col("key").alias("doc_b")
    )
    members = clean.select(
        F.col("key").alias("node_id"), "name", "nationkey", "acctbal",
        "mktsegment",
    ).unionAll(
        dirty.select(
            F.col("rec_id").alias("node_id"), "name", "nationkey",
            "acctbal", "mktsegment",
        )
    )
    reps = connected_components_star(
        members.select("node_id"), links, id_col="node_id"
    )
    return (
        members.join(reps, "node_id")
        .groupBy(F.col("group_rep").alias("cluster_rep"))
        .agg(
            F.count(F.lit(1)).alias("n_sources"),
            F.min("name").alias("name"),
            F.min("nationkey").cast("int").alias("nationkey"),
            F.max("acctbal").alias("acctbal"),
            F.min("mktsegment").alias("mktsegment"),
        )
    )


#: Hot-block thresholds: the skew report uses a tight cap so the
#: reporting path is exercised at every SF; the capped best-match uses
#: a loose cap (invisible on this synthetic data) — both are mirrored
#: exactly in the oracles, so parity certifies the cap logic itself.
_SKEW_CAP = 2
_MATCH_CAP = 64

_ER_SIZES_CTE = """
    sizes AS (
        SELECT d.kt, d.kv, d.n_d * c.n_c AS pairs
        FROM (SELECT kt, kv, COUNT(*) AS n_d FROM kd GROUP BY 1, 2) d
        JOIN (SELECT kt, kv, COUNT(*) AS n_c FROM kc GROUP BY 1, 2) c
          ON d.kt = c.kt AND d.kv = c.kv
    )
"""


@register(
    "er_blocking_skew",
    oracle=f"""
    WITH {_ER_CTES},
    {_ER_SIZES_CTE}
    SELECT kt AS key_family,
           CAST(COUNT(*) AS BIGINT) AS n_blocks,
           CAST(MAX(pairs) AS BIGINT) AS max_block_pairs,
           CAST(SUM(CASE WHEN pairs > {_SKEW_CAP} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hot_blocks,
           CAST(SUM(CASE WHEN pairs > {_SKEW_CAP} THEN pairs ELSE 0 END)
                AS BIGINT) AS dropped_pairs
    FROM sizes
    GROUP BY kt
    """,
    tags=("entity-resolution", "blocking", "skew", "diagnostics"),
)
def er_blocking_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-size skew profile per key family: how many blocks, the
    worst fan-out, and how many candidate pairs the hot-block cap
    would drop — the preflight that decides whether a blocking
    scheme needs capping BEFORE the candidate join runs. Real-world
    keys are Zipf-hot; ONE runaway block at 100 TB is a quadratic
    task. Cost: two count aggregates over the slim (id, kt, kv)
    relations and a key-sized join — never the candidate join
    itself."""
    cust = load_table(spark, sf_dir, "customer")
    kd = E._block_keys(E.synthesize_dirty_customers(cust), "rec_id")
    kc = E._block_keys(_clean(cust), "key")
    nd = kd.groupBy("kt", "kv").agg(F.count(F.lit(1)).alias("n_d"))
    nc = kc.groupBy("kt", "kv").agg(F.count(F.lit(1)).alias("n_c"))
    sizes = nd.join(nc, ["kt", "kv"]).select(
        "kt", (F.col("n_d") * F.col("n_c")).alias("pairs")
    )
    hot = F.when(F.col("pairs") > _SKEW_CAP, 1).otherwise(0)
    return sizes.groupBy(F.col("kt").alias("key_family")).agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.max("pairs").alias("max_block_pairs"),
        F.sum(hot).alias("n_hot_blocks"),
        F.sum(hot * F.col("pairs")).alias("dropped_pairs"),
    )


@register(
    "er_best_match_capped",
    oracle=f"""
    WITH {_ER_CTES},
    {_ER_SIZES_CTE},
    hot AS (SELECT kt, kv FROM sizes WHERE pairs > {_MATCH_CAP}),
    pairs2 AS (
        SELECT DISTINCT d.id AS rec_id, c.id AS key
        FROM kd d JOIN kc c ON d.kt = c.kt AND d.kv = c.kv
        WHERE NOT EXISTS (SELECT 1 FROM hot h
                          WHERE h.kt = d.kt AND h.kv = d.kv)
    ),
    scored2 AS (
        SELECT p.rec_id, p.key,
               0.5 * (1.0 - levenshtein(d.name, c.name) / 18.0)
             + 0.2 * (CASE WHEN d.acctbal = c.acctbal THEN 1.0 ELSE 0.0 END)
             + 0.15 * (CASE WHEN d.nationkey = c.nationkey
                       THEN 1.0 ELSE 0.0 END)
             + 0.15 * (CASE WHEN d.mktsegment = c.mktsegment
                       THEN 1.0 ELSE 0.0 END) AS score
        FROM pairs2 p
        JOIN dirty d ON d.rec_id = p.rec_id
        JOIN clean c ON c.key = p.key
    )
    SELECT rec_id,
           key AS matched_key,
           CAST(score AS REAL) AS score
    FROM scored2
    QUALIFY ROW_NUMBER() OVER (PARTITION BY rec_id
                               ORDER BY score DESC, key) = 1
    """,
    tags=("entity-resolution", "blocking", "skew-cap", "record-linkage"),
)
def er_best_match_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-match linkage through the hot-block-capped blocking path
    (``blocked_candidates(max_block_pairs=...)``): keys whose fan-out
    exceeds the cap are dropped from both sides via a broadcast
    anti-join BEFORE the candidate join, bounding the largest block's
    quadratic cost. The oracle mirrors the cap exactly (sizes → hot →
    NOT EXISTS), so parity certifies the capped path — not just its
    agreement with the uncapped one on easy data. On this synthetic
    corpus the cap is loose enough to be invisible (asserted in
    tests/test_entity.py), which is precisely the production
    contract: cap the runaways, leave the healthy blocks alone."""
    cust = load_table(spark, sf_dir, "customer")
    scored = E.score_pairs(
        E.blocked_candidates(
            E.synthesize_dirty_customers(cust),
            _clean(cust),
            max_block_pairs=_MATCH_CAP,
        )
    )
    w = Window.partitionBy("rec_id").orderBy(F.desc("score"), "key")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "rec_id",
            F.col("key").alias("matched_key"),
            F.col("score").cast("float").alias("score"),
        )
    )


@register(
    "er_linkage_quality",
    oracle=f"""
    WITH {_ER_CTES},
    flags AS (
        SELECT score,
               CASE WHEN key = rec_id - 10000000 THEN 1 ELSE 0 END AS tp,
               (SELECT COUNT(*) FROM dirty) AS n_true
        FROM scored
    )
    SELECT CAST(t.thr AS DOUBLE) AS thr,
           CAST(SUM(CASE WHEN f.score >= t.thr THEN 1 ELSE 0 END)
                AS BIGINT) AS n_links,
           CAST(SUM(CASE WHEN f.score >= t.thr THEN f.tp ELSE 0 END)
                AS BIGINT) AS n_correct,
           CAST(SUM(CASE WHEN f.score >= t.thr THEN f.tp ELSE 0 END)
                / NULLIF(SUM(CASE WHEN f.score >= t.thr
                             THEN 1 ELSE 0 END), 0) AS REAL) AS precision,
           CAST(SUM(CASE WHEN f.score >= t.thr THEN f.tp ELSE 0 END)
                / MAX(f.n_true) AS REAL) AS recall
    FROM flags f
    CROSS JOIN (SELECT * FROM (VALUES (0.70), (0.80), (0.90), (0.95))
                AS v(thr)) t
    GROUP BY t.thr
    """,
    tags=("entity-resolution", "precision-recall", "threshold-sweep"),
)
def er_linkage_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linkage precision/recall at four decision thresholds in ONE
    pass over the scored candidates — the curve that picks the
    match threshold, computable here because ground truth is
    synthesized. Scale shape: the scored relation is crossed with a
    4-row literal threshold spine (constant-factor replication, the
    same trick as dau_wau_rolling's cover-day explode) and folded in
    a single aggregate; no per-threshold jobs, no second scoring
    pass."""
    cust = load_table(spark, sf_dir, "customer")
    dirty = E.synthesize_dirty_customers(cust)
    scored = E.score_pairs(E.blocked_candidates(dirty, _clean(cust)))
    n_true = dirty.agg(F.count(F.lit(1)).alias("n_true"))
    thr = spark.createDataFrame(
        [(0.70,), (0.80,), (0.90,), (0.95,)], "thr double"
    )
    flags = scored.select(
        "score",
        F.when(F.col("key") == F.col("rec_id") - E.DIRTY_OFFSET, 1)
        .otherwise(0)
        .alias("tp"),
    ).crossJoin(F.broadcast(n_true))
    hit = F.when(F.col("score") >= F.col("thr"), 1).otherwise(0)
    return (
        flags.crossJoin(F.broadcast(thr))
        .groupBy("thr")
        .agg(
            F.sum(hit).alias("n_links"),
            F.sum(hit * F.col("tp")).alias("n_correct"),
            F.try_divide(F.sum(hit * F.col("tp")), F.sum(hit))
            .cast("float")
            .alias("precision"),
            (F.sum(hit * F.col("tp")) / F.max("n_true"))
            .cast("float")
            .alias("recall"),
        )
    )
