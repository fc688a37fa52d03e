"""Round-8 operators: the decoupled production/cert MinHash pair and
the multimodal ingestion lifecycle composite.

Same certification bar as the r6/r7 composites: oracle parity is
covered by the registry-wide suite; here we pin (a) the composite's
plan DELTA against its standalone parts, (b) a third, straight-line
byte-loop implementation that must agree on every output, and (c)
cross-query consistency identities.
"""

from __future__ import annotations

from axolotls_spark.plans.audit import audit
from axolotls_spark.queries import REGISTRY

SF_DIR = "/root/testdata/sf0.001"


def _rows(spark, name):
    return REGISTRY[name].fn(spark, SF_DIR).collect()


# --------------------------------------------------------------------------
# Decoupled MinHash production path vs sampled certification


def test_xxhash_production_subset_of_cert_corpus(spark):
    """The production query's exact-verified pairs restricted to the
    cert sample (both endpoints doc_id % 4 == 0) must be exactly the
    pairs the sampled ground truth counts — found == truth on the
    sample is what recall_ok == 1 certifies, and the production
    emission lets us recheck it pairwise rather than by count."""
    pairs = _rows(spark, "minhash_xxhash_production")
    cert = _rows(spark, "minhash_xxhash_recall_cert")[0]
    in_sample = [
        p for p in pairs if p["doc_a"] % 4 == 0 and p["doc_b"] % 4 == 0
    ]
    assert cert["n_true_pairs"] == len(in_sample)
    assert cert["recall_ok"] == 1
    # Exact verify: emitted stats satisfy the integer threshold.
    for p in pairs:
        assert p["n_inter"] * 2 >= p["n_union"]
        assert 0 < p["n_inter"] <= p["n_union"]


def test_xxhash_production_plan_is_linear_path(spark):
    """The production query must NOT contain the corpus-scaled
    ground-truth join any more (VERDICT r7 item #1): its scan count
    stays at the signature+verify passes, and no document-frequency
    window (the prefix-filter fingerprint) appears in the plan."""
    f = audit(REGISTRY["minhash_xxhash_production"].fn(spark, SF_DIR))
    # jaccard_prefix_pairs' signature: a row_number window over the
    # per-doc (df, sh) order.  The production plan must not have it.
    assert "row_number" not in f.text.lower()
    c = audit(REGISTRY["minhash_xxhash_recall_cert"].fn(spark, SF_DIR))
    assert "row_number" in c.text.lower()  # cert still certifies


# --------------------------------------------------------------------------
# multimodal_ingestion — plan delta pin + byte-loop mirror


def test_multimodal_ingestion_plan(spark):
    """The composite's exchange count, pinned as a DELTA vs its two
    map-only parts (entropy gate and aHash fingerprints are both
    zero-exchange mapInPandas passes) so their shapes can evolve.
    No Cartesian products; the payload bytes never shuffle (only
    integer band keys and doc ids)."""
    comp = audit(REGISTRY["multimodal_ingestion"].fn(spark, SF_DIR))
    ent = audit(REGISTRY["multimodal_entropy_quality"].fn(spark, SF_DIR))
    ah = audit(REGISTRY["image_ahash_fingerprints"].fn(spark, SF_DIR))
    assert "CartesianProduct" not in comp.text
    assert ent.n_exchanges == 0
    assert ah.n_exchanges == 0
    # The load-bearing pin: every doc_id/band-keyed join side is
    # corpus-scaled, so ALL FOUR remaining joins (band self-join,
    # two exact-verify probes, dup-flag join) must be sort-merge and
    # NONE broadcast (r7 sf10 finding).  The r8 fused payload pass
    # removed the survivor semi, metadata and gate-flag joins — the
    # gate verdict and media_type ride the one fused relation.
    assert comp.n_sort_merge_joins == 4
    assert comp.n_broadcast_hash_joins == 0
    # Exchange delta vs the two zero-exchange map-only parts: 4 SMJs
    # + the candidate distinct + the final 3-group rollup.  The
    # static plan re-expands the persisted fused subtree per
    # consumer — runtime InMemoryRelations collapse it, so the
    # static count is an upper bound; the +/-1 band absorbs
    # spread_for_cpu's parallelism-conditional repartition.
    assert 10 <= comp.n_exchanges - ent.n_exchanges - ah.n_exchanges <= 12


def test_multimodal_ingestion_vs_byte_loop(spark):
    """Third implementation: plain Python/numpy loops over the raw
    parquet — no Spark, no SQL — recomputing gate, screen, and
    summary; must agree with the registered composite exactly."""
    import duckdb
    import numpy as np

    rows = {r["media_type"]: r for r in _rows(spark, "multimodal_ingestion")}
    docs = duckdb.connect().execute(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet' "
        "ORDER BY doc_id"
    ).fetchall()

    def entropy_f32(b: np.ndarray) -> np.float32:
        n = float(b.size)
        counts = np.bincount(b & 0xF, minlength=16)[:16]
        acc = 0.0
        for c in counts:           # fixed-order 16-term sum
            c = float(c)
            acc = acc + (-(c / n) * np.log2(c / n) if c > 0 else 0.0)
        return np.float32(acc)

    def ahash(b: np.ndarray) -> list[int]:
        v = b.astype(np.int64)
        n, tot = len(v), int(v.sum())
        bands = [0, 0, 0, 0]
        for k in range(64):
            lo, hi = (k * n) // 64, ((k + 1) * n) // 64
            seg = v[lo:hi]
            if int(seg.sum()) * n > tot * len(seg):
                bands[k // 16] |= 1 << (k % 16)
        return bands

    media = {0: "image", 1: "audio", 2: "video"}
    per = []
    for doc_id, text in docs:
        b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
        per.append(
            (doc_id, media[doc_id % 3], b.size,
             entropy_f32(b) >= np.float32(3.5), ahash(b))
        )
    surv = [p for p in per if p[3]]
    dup_ids = set()
    for i, (bid, _, _, _, hb) in enumerate(surv):
        for aid, _, _, _, ha in surv[:i]:
            if aid >= bid:
                continue
            d = sum(bin(x ^ y).count("1") for x, y in zip(ha, hb))
            if d <= 3:
                dup_ids.add(bid)
                break
    summary = {}
    for doc_id, mt, nbytes, gate_ok, _ in per:
        s = summary.setdefault(
            mt, {"n_total": 0, "n_gate_dropped": 0, "n_dup_dropped": 0,
                 "n_admitted": 0, "admitted_bytes": 0}
        )
        s["n_total"] += 1
        if not gate_ok:
            s["n_gate_dropped"] += 1
        elif doc_id in dup_ids:
            s["n_dup_dropped"] += 1
        else:
            s["n_admitted"] += 1
            s["admitted_bytes"] += int(nbytes)
    assert set(rows) == set(summary)
    for mt, s in summary.items():
        for k, v in s.items():
            assert rows[mt][k] == v, (mt, k, rows[mt][k], v)


def test_multimodal_ingestion_consistent_with_gate(spark):
    """Composite gate drops == the standalone entropy query's flag
    counts per media type (same expression, same threshold)."""
    from pyspark.sql import functions as F

    comp = {r["media_type"]: r for r in _rows(spark, "multimodal_ingestion")}
    ent = REGISTRY["multimodal_entropy_quality"].fn(spark, SF_DIR)
    flags = {
        r["media_type"]: r["n_low"]
        for r in ent.withColumn(
            "media_type",
            F.when(F.col("doc_id") % 3 == 0, "image")
            .when(F.col("doc_id") % 3 == 1, "audio")
            .otherwise("video"),
        )
        .groupBy("media_type")
        .agg(F.sum("low_entropy_flag").alias("n_low"))
        .collect()
    }
    for mt, r in comp.items():
        assert r["n_gate_dropped"] == flags[mt]
        assert (
            r["n_gate_dropped"] + r["n_dup_dropped"] + r["n_admitted"]
            == r["n_total"]
        )


# --------------------------------------------------------------------------
# Alternating-star CC: joinless star rounds (optimization round pin)


def test_altstar_round_plan_is_joinless(spark):
    """Each star step computes the closed-neighborhood min as a
    window over its single hash(u) exchange — the groupBy+self-join
    form it replaced planned two exchanges plus join stages per step.
    Pin: a captured round plan contains window MIN nodes and NO join
    operator of any kind."""
    from axolotls_spark.plans.audit import capture_loop_plans

    with capture_loop_plans() as buf:
        REGISTRY["dedup_groups_altstar"].fn(spark, SF_DIR).write.format(
            "noop"
        ).mode("overwrite").save()
    rounds = [t for label, t in buf if label == "altstar_round"]
    assert rounds, "no altstar round plans captured"
    for text in rounds:
        low = text.lower()
        assert "window" in low
        assert "join" not in low  # SortMergeJoin/BroadcastHashJoin/...
