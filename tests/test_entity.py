"""Entity-resolution unit behavior: ground-truth recovery, blocking
recall bounds, and cluster shapes on the synthesized dirty side."""

from __future__ import annotations

from pyspark.sql import functions as F

from axolotls_spark.io.sources import load_table
from axolotls_spark.operators import entity as E

SF_DIR = "/root/testdata/sf0.001"


def _clean(cust):
    return cust.select(
        F.col("c_custkey").alias("key"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_mktsegment").alias("mktsegment"),
    )


def test_dirty_synthesis_is_one_deletion(spark):
    # Every dirty name is exactly one deletion from its source.
    cust = load_table(spark, SF_DIR, "customer")
    dirty = E.synthesize_dirty_customers(cust).withColumnRenamed(
        "name", "d_name"
    )
    pairs = dirty.withColumn("key", F.col("rec_id") - E.DIRTY_OFFSET).join(
        _clean(cust), "key"
    )
    dists = pairs.select(
        F.levenshtein("d_name", "name").alias("d"),
        (F.length("d_name") - F.length("name")).alias("dl"),
    ).collect()
    assert all(r.d == 1 and r.dl == -1 for r in dists)


def test_blocking_recall_matches_construction(spark):
    """Misses are exactly the records whose deletion hits the last 4
    name chars (suffix block broken) AND whose nation was bumped
    (nation+acctbal block broken)."""
    cust = load_table(spark, SF_DIR, "customer")
    dirty = E.synthesize_dirty_customers(cust)
    cand = E.blocked_candidates(dirty, _clean(cust))
    blocked_true = {
        r.rec_id
        for r in cand.filter(
            F.col("key") == F.col("rec_id") - E.DIRTY_OFFSET
        ).collect()
    }
    def dirty_name(name: str, k: int) -> str:
        pos = 10 + k % 8  # 1-indexed deletion position
        return name[: pos - 1] + name[pos:]

    # Exact Python mirror of the construction: a true pair survives
    # blocking iff the last-4 name suffix is unchanged by the
    # deletion (digit collisions often keep it intact even for late
    # positions) OR the nation+acctbal key holds (nation not bumped).
    expected_miss = {
        r.c_custkey + E.DIRTY_OFFSET
        for r in cust.collect()
        if dirty_name(r.c_name, r.c_custkey)[-4:] != r.c_name[-4:]
        and r.c_custkey % 5 == 0
    }
    all_ids = {r.rec_id for r in dirty.collect()}
    assert all_ids - blocked_true == expected_miss


def test_true_match_wins_best_match(spark):
    """Every blocked true pair must rank first for its record: the
    one-deletion name plus exact acctbal/segment beats any false
    candidate."""
    from axolotls_spark.queries import REGISTRY

    rows = REGISTRY["er_best_match"].fn(spark, SF_DIR).collect()
    blocked = {
        r.rec_id: r for r in rows
    }
    cust = load_table(spark, SF_DIR, "customer")
    for r in cust.collect():
        rec_id = r.c_custkey + E.DIRTY_OFFSET
        if rec_id in blocked and blocked[rec_id].is_true_match:
            assert blocked[rec_id].matched_key == r.c_custkey


def test_clusters_pair_true_matches(spark):
    """Above-threshold links cluster each dirty record with its
    source (when nation agrees); bumped-nation records stay
    singletons at the 0.9 threshold."""
    from axolotls_spark.queries import REGISTRY

    reps = {
        r.node_id: r.cluster_rep
        for r in REGISTRY["er_clusters"].fn(spark, SF_DIR).collect()
    }
    cust = load_table(spark, SF_DIR, "customer")
    for r in cust.collect():
        k, rec = r.c_custkey, r.c_custkey + E.DIRTY_OFFSET
        if k % 5 != 0:
            # nba block holds (nation not bumped) → candidate exists
            # with score 0.5*(17/18)+0.2+0.15+0.15 ≈ 0.972 ≥ 0.9 →
            # dirty record clusters with its source.
            assert reps[rec] == reps[k] == k
        else:
            # nation bumped: even a surviving suffix-block candidate
            # scores 0.822 < 0.9 → both stay singletons.
            assert reps[rec] == rec and reps[k] == k


def test_edit1_join_blocking_is_complete(spark):
    """Pigeonhole candidates must be COMPLETE: compare against an
    in-Spark brute-force cross join (length-banded) at sf0.001 —
    every levenshtein ≤ 1 pair must survive blocking."""
    from axolotls_spark.operators.fuzzy import edit1_join

    docs = load_table(spark, SF_DIR, "documents")
    titles = docs.select("doc_id", F.substring("text", 1, 40).alias("s"))
    probes = titles.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 10_000_000).alias("probe_id"),
        F.expr(
            "substr(s, 1, CAST(doc_id % 39 AS INT)) || "
            "substr(s, CAST(doc_id % 39 AS INT) + 2)"
        ).alias("s"),
    )
    got = {
        (r.probe_id, r.match_id, r.dist)
        for r in edit1_join(
            probes, titles, "probe_id", "s", "doc_id", "s"
        ).collect()
    }
    brute = {
        (r.probe_id, r.doc_id, r.dist)
        for r in probes.alias("p")
        .crossJoin(titles.alias("t"))
        .select(
            "probe_id",
            "doc_id",
            F.levenshtein(F.col("p.s"), F.col("t.s")).alias("dist"),
        )
        .filter(F.col("dist") <= 1)
        .collect()
    }
    assert got == brute
    # Every probe finds its source at distance ≤ 1.
    sources = {p - 10_000_000 for p, _, _ in got}
    probe_ids = {r.probe_id - 10_000_000 for r in probes.collect()}
    matched_self = {
        p - 10_000_000 for p, m, _ in got if m == p - 10_000_000
    }
    assert matched_self == probe_ids, probe_ids - sources


def test_edit1_join_complete_on_degenerate_strings(spark):
    """Exhaustive completeness on the hard shapes the title corpus
    never exercises: EVERY string of length 0..4 over {a, b} as both
    probe and index. Blocking must not miss a single levenshtein ≤ 1
    pair — including the empty string and the length-1 substitutions
    that carry no usable half-key (the degenerate-length bucket
    exists exactly for those)."""
    import itertools

    from axolotls_spark.operators.fuzzy import edit1_join

    strs = [
        "".join(t)
        for n in range(5)
        for t in itertools.product("ab", repeat=n)
    ]

    def lev(a, b):
        d = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, d[0] = d[0], i
            for j, cb in enumerate(b, 1):
                prev, d[j] = d[j], min(
                    d[j] + 1, d[j - 1] + 1, prev + (ca != cb)
                )
        return d[len(b)]

    expected = {
        (i, j, lev(a, b))
        for (i, a), (j, b) in itertools.product(
            enumerate(strs), enumerate(strs)
        )
        if lev(a, b) <= 1
    }
    df = spark.createDataFrame(list(enumerate(strs)), "id long, s string")
    probes = df.select(F.col("id").alias("pid"), "s")
    got = {
        (r.probe_id, r.match_id, r.dist)
        for r in edit1_join(probes, df, "pid", "s", "id", "s").collect()
    }
    assert got == expected


def test_entity_resolution_demo_runs(spark, capsys):
    """demos/entity_resolution.py end-to-end: preflight recall and
    linkage precision both high on the synthesized feed, and
    survivorship consolidates (fewer golden records than sources)."""
    import re
    import runpy
    import sys

    argv = sys.argv
    sys.argv = ["entity_resolution.py", SF_DIR]
    try:
        # The demo builds its own session via get_spark (same JVM).
        runpy.run_path("demos/entity_resolution.py", run_name="__main__")
    finally:
        sys.argv = argv
    out = capsys.readouterr().out
    recall = float(re.search(r"recall (\d+\.\d+)", out).group(1))
    prec = float(re.search(r"\((\d+\.\d+) precision", out).group(1))
    m = re.search(r"(\d+) source rows -> (\d+) golden records", out)
    assert recall > 0.9 and prec > 0.9
    assert int(m.group(2)) < int(m.group(1))


def test_capped_blocking_invisible_on_synthetic(spark):
    """The registry cap (_MATCH_CAP) must be loose enough that the
    capped candidate set IS the uncapped one on the synthetic corpus
    — the production contract: cap the runaways, leave healthy
    blocks alone."""
    from axolotls_spark.queries_entity import _MATCH_CAP

    cust = load_table(spark, SF_DIR, "customer")
    dirty = E.synthesize_dirty_customers(cust)
    plain = {
        (r.rec_id, r.key)
        for r in E.blocked_candidates(dirty, _clean(cust)).collect()
    }
    capped = {
        (r.rec_id, r.key)
        for r in E.blocked_candidates(
            dirty, _clean(cust), max_block_pairs=_MATCH_CAP
        ).collect()
    }
    assert capped == plain


def _er_hot_sides(spark, n=800, hot=400):
    """Synthetic Zipf-hot blocking scenario: ``hot`` records share ONE
    name (one runaway sfx block, fan-out hot^2); every record keeps a
    unique nation|cents key, so identity pairs survive even when the
    hot block is dropped — the realistic multi-key-redundancy case."""
    base = spark.range(n).select(
        F.col("id"),
        F.when(F.col("id") < hot, F.lit("Customer#000HOTHOT"))
        .otherwise(
            F.concat(F.lit("Customer#"), F.format_string("%09d", F.col("id")))
        )
        .alias("name"),
        (F.col("id") % 25).cast("int").alias("nationkey"),
        (F.col("id").cast("double") / 100.0).alias("acctbal"),
        F.lit("AUTOMOBILE").alias("mktsegment"),
    )
    dirty = base.select(
        (F.col("id") + E.DIRTY_OFFSET).alias("rec_id"),
        "name", "nationkey", "acctbal", "mktsegment",
    )
    clean = base.select(
        F.col("id").alias("key"),
        "name", "nationkey", "acctbal", "mktsegment",
    )
    return dirty, clean


def test_hot_block_cap_bounds_candidates(spark):
    """Stress-certify the cap's PERF claim: one hot key owning half
    the records makes the uncapped candidate set quadratic
    (hot^2 + identity pairs); the capped path must (1) detect exactly
    that block, (2) bound every surviving block's fan-out at the cap,
    and (3) keep ALL identity pairs — recall preserved by the second
    key family."""
    n, hot, cap = 800, 400, 1000
    dirty, clean = _er_hot_sides(spark, n, hot)

    uncapped = E.blocked_candidates(dirty, clean)
    # sfx hot block: hot^2 pairs (contains the hot identity pairs);
    # unique-suffix sfx + nba blocks only re-add identity pairs.
    assert uncapped.count() == hot * hot + (n - hot)

    hot_rows = E.hot_blocks(
        E._block_keys(dirty, "rec_id"), E._block_keys(clean, "key"), cap
    ).collect()
    assert len(hot_rows) == 1
    assert hot_rows[0].kt == "sfx"
    assert hot_rows[0].n_d == hot and hot_rows[0].n_c == hot

    capped = E.blocked_candidates(dirty, clean, max_block_pairs=cap)
    got = {(r.rec_id - E.DIRTY_OFFSET, r.key) for r in capped.collect()}
    # Exactly the identity pairs survive: quadratic mass gone, recall
    # intact via the nation|cents key family.
    assert got == {(i, i) for i in range(n)}

    # Surviving blocks all respect the cap (per-block fan-out bound —
    # the max-task guarantee the cap exists for).
    kd = E._block_keys(dirty, "rec_id")
    kc = E._block_keys(clean, "key")
    hotk = E.hot_blocks(kd, kc, cap).select("kt", "kv")
    sizes = (
        kd.join(F.broadcast(hotk), ["kt", "kv"], "left_anti")
        .groupBy("kt", "kv")
        .count()
        .withColumnRenamed("count", "n_d")
        .join(
            kc.join(F.broadcast(hotk), ["kt", "kv"], "left_anti")
            .groupBy("kt", "kv")
            .count()
            .withColumnRenamed("count", "n_c"),
            ["kt", "kv"],
        )
        .select((F.col("n_d") * F.col("n_c")).alias("pairs"))
        .agg(F.max("pairs").alias("mx"))
        .collect()
    )
    assert sizes[0].mx <= cap
