"""Fuzzy string join — edit-distance ≤ 1 via pigeonhole blocking.

The scalable shape of a similarity join is always the same: generate
candidates with an equi-joinable signature that has NO false
negatives, then verify exactly. For edit distance this is the
segment/pigeonhole family (PassJoin, Li et al., VLDB'12): split the
indexed string s into d+1 segments; any t within distance d must
contain one segment intact. For d = 1 (two halves) the alignment
collapses to something even cheaper — a single edit falls in one
half, leaving the other half intact AND anchored at its end of the
string:

- edit in the back half  → t starts with s's front half
  (prefix keys align at position 1, immune to the ±1 length shift),
- edit in the front half → t ends with s's back half
  (suffix keys align at the end, same immunity).

So the indexed side emits TWO keys per string — ('p', ceil(L/2),
prefix) and ('s', floor(L/2), suffix) — and the probe side emits the
same two kinds at the three lengths its match could have (|L−L'| ≤ 1
⇒ the needed half-length is one of ceil((L'+δ)/2), δ ∈ {-1,0,1}):
at most 6 exploded rows per probe, constant fan-out. Candidates are
ONE equi-join on (kind, key_len, key); verification is the builtin
``levenshtein`` on the joined row — map-only, no UDF. Nothing here
is ever all-pairs: cost is O(probes + index + candidates), and
candidates are bounded by how discriminative half-strings are — for
natural identifiers (names, titles) that's near the true-match
count.

Distinct from operators/entity.py: ER blocks on *semantic* multi-
field keys with scoring; this is the exact single-field
edit-distance join primitive (the thing you call inside an ER
comparison when the field itself is dirty).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _tiny_key(s, max_len: int):
    """Degenerate-length bucket. The 2-segment pigeonhole needs both
    halves of the INDEXED string non-empty, which fails for length-≤1
    index strings: their back half is empty, so an edit in the front
    half leaves no discriminating key and pairs like ("a", "b"),
    ("", "a"), or ("ab" probe, "b" index) miss every normal key. Any
    distance-1 partner of a length-≤1 string has length ≤ 2, so:
    index strings of length ≤ 1 and probe strings of length ≤ 2 share
    one constant bucket — fan-out bounded by |alphabet|+1 index rows,
    and exact verification prunes the few false candidates."""
    return F.when(
        F.length(s) <= max_len,
        F.struct(
            F.lit("t").alias("kind"),
            F.lit(0).alias("klen"),
            F.lit("").alias("key"),
        ),
    )


def _index_keys(df: DataFrame, id_col: str, str_col: str) -> DataFrame:
    """(id, s, kind, klen, key): the 2 pigeonhole keys of the indexed
    side — front half as prefix key, back half as suffix key — plus
    the degenerate-length bucket."""
    s = F.col(str_col)
    ln = F.length(s)
    h_pre = F.ceil(ln / 2).cast("int")
    h_suf = (ln / 2).cast("int")  # floor
    return (
        df.select(
            F.col(id_col).alias("id"),
            s.alias("s"),
            F.explode(
                F.array_compact(
                    F.array(
                        F.struct(
                            F.lit("p").alias("kind"),
                            h_pre.alias("klen"),
                            F.substring(s, F.lit(1), h_pre).alias("key"),
                        ),
                        F.struct(
                            F.lit("s").alias("kind"),
                            h_suf.alias("klen"),
                            F.substring(s, ln - h_suf + 1, h_suf).alias(
                                "key"
                            ),
                        ),
                        _tiny_key(s, 1),
                    )
                )
            ).alias("k"),
        )
        .filter((F.col("k.kind") == "t") | (F.col("k.klen") >= 1))
        .select("id", "s", "k.kind", "k.klen", "k.key")
    )


def _probe_keys(df: DataFrame, id_col: str, str_col: str) -> DataFrame:
    """(id, s, kind, klen, key): prefix/suffix keys at the three
    half-lengths a distance-1 match could require (its length is
    within ±1 of the probe's) — ≤6 exploded rows per probe, deduped."""
    s = F.col(str_col)
    ln = F.length(s)
    keys = []
    for delta in (-1, 0, 1):
        h_pre = F.ceil((ln + F.lit(delta)) / 2).cast("int")
        h_suf = ((ln + F.lit(delta)) / 2).cast("int")
        keys.append(
            F.struct(
                F.lit("p").alias("kind"),
                h_pre.alias("klen"),
                F.substring(s, F.lit(1), h_pre).alias("key"),
            )
        )
        keys.append(
            F.struct(
                F.lit("s").alias("kind"),
                h_suf.alias("klen"),
                F.substring(s, ln - h_suf + 1, h_suf).alias("key"),
            )
        )
    return (
        df.select(
            F.col(id_col).alias("id"),
            s.alias("s"),
            F.explode(
                F.array_compact(F.array_distinct(F.array(*keys, _tiny_key(s, 2))))
            ).alias("k"),
        )
        .filter(
            (F.col("k.kind") == "t")
            | (
                (F.col("k.klen") >= 1)
                & (F.col("k.klen") <= F.length("s"))
            )
        )
        .select("id", "s", "k.kind", "k.klen", "k.key")
    )


def edit1_join(
    probes: DataFrame,
    index: DataFrame,
    probe_id: str,
    probe_str: str,
    index_id: str,
    index_str: str,
) -> DataFrame:
    """All (probe, index) pairs with levenshtein ≤ 1, as
    (probe_id, match_id, dist). Candidates from one equi-join on the
    pigeonhole keys (complete for d=1 — see module docstring);
    verification exact and map-only."""
    kp = _probe_keys(probes, probe_id, probe_str)
    ki = _index_keys(index, index_id, index_str)
    cand = (
        kp.alias("p")
        .join(ki.alias("i"), ["kind", "klen", "key"])
        .select(
            F.col("p.id").alias("probe_id"),
            F.col("i.id").alias("match_id"),
            F.col("p.s").alias("ps"),
            F.col("i.s").alias("is_"),
        )
        .distinct()
    )
    return (
        cand.withColumn("dist", F.levenshtein("ps", "is_"))
        .filter(F.col("dist") <= 1)
        .select("probe_id", "match_id", F.col("dist").cast("int").alias("dist"))
    )
