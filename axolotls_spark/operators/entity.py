"""Entity resolution / record linkage — blocking, scoring, clustering.

The reference has no ER surface (SURVEY §2A is element-wise tensor
kernels); this is a §2B-class extension: the classic record-linkage
pipeline re-expressed Spark-first, because at 100 TB "find the same
real-world entity across dirty records" IS a blocking problem — the
all-pairs comparison space is N² and the only scalable shape is

    block (equi-join on cheap keys, union of several key families)
    → score candidates (map-only field comparisons, Fellegi–Sunter
      style agreement weights)
    → resolve (best-match ranking per record, or connected
      components over above-threshold links for clusters).

Scale decisions baked in here:

- **Multi-key blocking is ONE shuffle, not one per key family.**
  Both sides explode to (key_type, key_value) rows and meet in a
  single equi-join — the same single-pass trick as the multi-table
  LSH signatures (operators/similarity.py, SCALE.md
  "union-of-derivations") — then pair-distinct. K key families
  never cost K corpus scans.
- **Scoring is map-only.** Every comparison (levenshtein, field
  equality) runs on the already-joined candidate row; no second
  shuffle, no UDF (levenshtein is a JVM builtin).
- **Resolution reuses the CC machinery** (operators/dedup.py
  connected_components_star) — entity clusters are exactly
  near-dup clusters over the link graph.

The synthetic dirty side (``synthesize_dirty_customers``) exists so
the whole pipeline is deterministic and DuckDB-oracle-checkable:
every perturbation (one name-character deletion at a key-derived
position, a nation bump for every 5th record) is reproducible in
ANSI SQL, and the ground truth (dirty record i ↔ clean record i) is
known, which turns blocking recall — normally unknowable — into an
exactly checkable metric.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Offset that turns a clean c_custkey into its dirty record id.
DIRTY_OFFSET = 10_000_000

#: Fellegi–Sunter-ish agreement weights (sum to 1).
W_NAME, W_ACCT, W_NATION, W_SEG = 0.5, 0.2, 0.15, 0.15

#: c_name is 'Customer#' + 9 digits = 18 chars at every SF.
NAME_LEN = 18


def synthesize_dirty_customers(cust: DataFrame) -> DataFrame:
    """Deterministic 'CRM copy' of the customer table: one character
    deleted from the digit region of the name (position
    10 + custkey % 8, 1-indexed), nationkey bumped for every 5th
    record, everything else intact. Map-only projection."""
    return cust.select(
        (F.col("c_custkey") + F.lit(DIRTY_OFFSET)).alias("rec_id"),
        F.concat(
            F.expr("substr(c_name, 1, 9 + c_custkey % 8)"),
            F.expr("substr(c_name, 11 + c_custkey % 8)"),
        ).alias("name"),
        F.when(F.col("c_custkey") % 5 == 0, (F.col("c_nationkey") + 1) % 25)
        .otherwise(F.col("c_nationkey"))
        .cast("int")
        .alias("nationkey"),
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_mktsegment").alias("mktsegment"),
    )


def _block_keys(df: DataFrame, id_col: str) -> DataFrame:
    """Slim ``(id, key_type, key_value)`` relation — one exploded row
    per key family, NO payload columns (round-3 verdict: the blocking
    join and the pair-distinct must shuffle ids and keys only; the
    wide comparison fields re-attach afterwards via narrow id joins):

    - ``sfx``: last 4 name chars (deletion-position-robust for edits
      in the front/middle of the digit region),
    - ``nba``: nationkey + exact account cents (robust to any name
      edit; broken by the nation perturbation).

    Integer cents, never a stringified double: double→VARCHAR
    formatting is engine-specific, ROUND(x*100) of a 2-decimal value
    is not."""
    cents = F.round(F.col("acctbal") * 100).cast("long").cast("string")
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array(
                F.struct(
                    F.lit("sfx").alias("kt"),
                    F.expr("substr(name, length(name) - 3)").alias("kv"),
                ),
                F.struct(
                    F.lit("nba").alias("kt"),
                    F.concat(
                        F.col("nationkey").cast("string"), F.lit("|"), cents
                    ).alias("kv"),
                ),
            )
        ).alias("bk"),
    ).select("id", F.col("bk.kt").alias("kt"), F.col("bk.kv").alias("kv"))


def hot_blocks(
    kd: DataFrame, kc: DataFrame, max_block_pairs: int
) -> DataFrame:
    """Blocking keys whose candidate fan-out ``|dirty block| × |clean
    block|`` exceeds ``max_block_pairs``. Real-world blocking keys are
    Zipf-hot (common name suffixes): ONE hot key at 100 TB is a
    quadratic task, so standard practice is to count block sizes and
    drop (or split) the runaways, accepting the recall cost that
    ``er_blocking_recall`` / ``er_blocking_skew`` make measurable.
    Two count aggregates over the slim key relations + a key-sized
    equi-join; the result is tiny (only the runaways) and is meant to
    be broadcast into an anti-join."""
    nd = kd.groupBy("kt", "kv").agg(F.count(F.lit(1)).alias("n_d"))
    nc = kc.groupBy("kt", "kv").agg(F.count(F.lit(1)).alias("n_c"))
    return (
        nd.join(nc, ["kt", "kv"])
        .filter(F.col("n_d") * F.col("n_c") > max_block_pairs)
        .select("kt", "kv", "n_d", "n_c")
    )


def blocked_candidates(
    dirty: DataFrame,
    clean: DataFrame,
    max_block_pairs: int | None = None,
) -> DataFrame:
    """Candidate (dirty, clean) pairs sharing ≥1 blocking key — one
    equi-join shuffle for ALL key families over the slim (id, kt, kv)
    relations, pair-distinct on the TWO id columns only, then both
    sides' comparison fields re-attached via narrow id joins so
    scoring stays map-only.

    The wide-row shapes this deliberately avoids (round-3 verdict):
    the blocking join and the distinct used to shuffle every
    comparison field per candidate row; at 100 TB the distinct's
    shuffle width dominates ER cost, and the payload is functionally
    dependent on the ids anyway.

    ``max_block_pairs`` enables the hot-block cap: keys whose
    fan-out exceeds it are dropped from BOTH sides via a broadcast
    anti-join before the blocking join (see ``hot_blocks``); recall
    cost is measurable via er_blocking_recall / er_blocking_skew.
    """
    kd = _block_keys(dirty, "rec_id")
    kc = _block_keys(clean, "key")
    if max_block_pairs is not None:
        hot = hot_blocks(kd, kc, max_block_pairs).select("kt", "kv")
        kd = kd.join(F.broadcast(hot), ["kt", "kv"], "left_anti")
        kc = kc.join(F.broadcast(hot), ["kt", "kv"], "left_anti")
    pairs = (
        kd.select("kt", "kv", F.col("id").alias("rec_id"))
        .join(kc.select("kt", "kv", F.col("id").alias("key")), ["kt", "kv"])
        .select("rec_id", "key")
        .distinct()
    )
    d_fields = dirty.select(
        F.col("rec_id"),
        F.col("name").alias("d_name"),
        F.col("nationkey").alias("d_nat"),
        F.col("acctbal").alias("d_acct"),
        F.col("mktsegment").alias("d_seg"),
    )
    c_fields = clean.select(
        F.col("key"),
        F.col("name").alias("c_name"),
        F.col("nationkey").alias("c_nat"),
        F.col("acctbal").alias("c_acct"),
        F.col("mktsegment").alias("c_seg"),
    )
    return (
        pairs.join(d_fields, "rec_id")
        .join(c_fields, "key")
        .select(
            "rec_id", "key", "d_name", "c_name", "d_nat", "c_nat",
            "d_acct", "c_acct", "d_seg", "c_seg",
        )
    )


def score_pairs(cand: DataFrame) -> DataFrame:
    """Weighted agreement score per candidate pair — all JVM builtins
    (levenshtein included), no Python, no extra shuffle."""
    name_sim = F.lit(1.0) - F.levenshtein("d_name", "c_name") / F.lit(
        float(NAME_LEN)
    )
    agree = lambda a, b: F.when(F.col(a) == F.col(b), 1.0).otherwise(0.0)
    score = (
        F.lit(W_NAME) * name_sim
        + F.lit(W_ACCT) * agree("d_acct", "c_acct")
        + F.lit(W_NATION) * agree("d_nat", "c_nat")
        + F.lit(W_SEG) * agree("d_seg", "c_seg")
    )
    return cand.withColumn("score", score)
