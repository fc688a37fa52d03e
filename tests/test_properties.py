"""Property-based tests (hypothesis) for the custom operators —
random inputs vs simple in-memory reference implementations.

Hypothesis settings: few examples, deterministic derandomization —
each example costs Spark jobs, so we buy breadth (random shapes,
ties, empty sides) not volume.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from axolotls_spark.operators.dedup import shingles_col
from axolotls_spark.operators.temporal_join import asof_join

_SETTINGS = dict(max_examples=12, deadline=None, derandomize=True)

_ts_base = dt.datetime(2024, 1, 1)


def _t(minutes: int) -> dt.datetime:
    return _ts_base + dt.timedelta(minutes=minutes)


@st.composite
def asof_case(draw):
    keys = draw(st.lists(st.integers(0, 2), min_size=1, max_size=4, unique=True))
    left = [
        (k, _t(m))
        for k in keys
        for m in draw(st.lists(st.integers(0, 60), min_size=0, max_size=4))
    ]
    right = [
        (k, _t(m), draw(st.integers(0, 10_000)))
        for k in keys
        for m in draw(st.lists(st.integers(0, 60), min_size=0, max_size=4, unique=True))
    ]
    return left, right


@given(asof_case())
@settings(**_SETTINGS)
def test_asof_join_matches_reference(spark, case):
    left, right = case
    if not left:
        return
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], "k long, ts timestamp, lid long"
    )
    rdf = spark.createDataFrame(right, "k long, rts timestamp, payload long") if right else (
        spark.createDataFrame([], "k long, rts timestamp, payload long")
    )
    got = {
        r.lid: r.payload
        for r in asof_join(
            ldf, rdf, on="k", left_ts="ts", right_ts="rts", right_cols=["payload"]
        ).collect()
    }
    # Reference: latest right row (same key, rts <= ts); ties on rts
    # broken by the larger payload being... there are no rts ties per
    # key (unique=True), so the match is unambiguous.
    for i, (k, t) in enumerate(left):
        cands = [(rt, p) for (rk, rt, p) in right if rk == k and rt <= t]
        expect = max(cands)[1] if cands else None
        assert got[i] == expect


@given(
    st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=30), min_size=1, max_size=6
    )
)
@settings(**_SETTINGS)
def test_shingles_match_reference(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    got = {
        r.id: sorted(r.sh)
        for r in df.select("id", shingles_col(F.col("text"), 3).alias("sh")).collect()
    }
    for i, t in enumerate(texts):
        # F.split(trim(t), '\\s+') yields [""] for whitespace-only input
        toks = t.strip().split() if t.strip() else [""]
        expect = (
            sorted({" ".join(toks[j : j + 3]) for j in range(len(toks) - 2)})
            if len(toks) >= 3
            else []
        )
        assert got[i] == expect


@st.composite
def docs_case(draw):
    texts = draw(
        st.lists(
            st.text(
                alphabet="ab c",  # forces multi-token and empty-ish cases
                min_size=0,
                max_size=120,
            ),
            min_size=1,
            max_size=6,
        )
    )
    return [(i, t) for i, t in enumerate(texts)]


@given(docs_case())
@settings(**_SETTINGS)
def test_chunking_covers_all_tokens(spark, case):
    """Every token of every document appears in ≥1 chunk; consecutive
    chunks overlap by exactly CHUNK-STRIDE tokens (except the tail);
    chunk_idx is dense from 0."""
    from axolotls_spark.queries_llm import _CHUNK, _STRIDE
    from axolotls_spark.operators.dedup import tokens_col

    df = spark.createDataFrame(case, "doc_id long, text string")
    t = df.select(
        "doc_id", tokens_col(F.col("text")).alias("toks")
    ).withColumn("n", F.size("toks"))
    starts = F.sequence(
        F.lit(1), F.greatest(F.col("n"), F.lit(1)), F.lit(_STRIDE)
    )
    chunks = t.select(
        "doc_id",
        "n",
        F.explode(starts).alias("start"),
    ).select(
        "doc_id",
        "n",
        "start",
        ((F.col("start") - 1) / _STRIDE).cast("long").alias("chunk_idx"),
    )
    rows = chunks.collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    toks_by_doc = {
        r.doc_id: r.n for r in t.select("doc_id", "n").collect()
    }
    for doc_id, rs in by_doc.items():
        rs.sort(key=lambda r: r.start)
        n = toks_by_doc[doc_id]
        # Dense chunk ids from 0, starts on the stride grid.
        assert [r.chunk_idx for r in rs] == list(range(len(rs)))
        assert all(r.start == 1 + r.chunk_idx * _STRIDE for r in rs)
        # Coverage: last chunk's window reaches the final token.
        assert rs[-1].start <= n if n > 0 else rs[-1].start == 1
        assert rs[-1].start + _CHUNK - 1 >= n


@given(
    st.lists(st.integers(0, 4000), min_size=1, max_size=40),
    st.integers(1, 8),
)
@settings(**_SETTINGS)
def test_packing_respects_budget_boundaries(spark, token_counts, shards):
    """Contiguous packing invariants vs an in-memory reference: pack
    ids are non-decreasing within a shard, a pack never spans more
    tokens than budget unless a single document alone exceeds it,
    and every document lands in exactly one pack."""
    from pyspark.sql import Window

    budget = 2048
    rows = [(i, i % shards, n) for i, n in enumerate(token_counts)]
    df = spark.createDataFrame(rows, "doc_id long, shard long, n_tokens long")
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    got = (
        df.withColumn("cum", F.sum("n_tokens").over(w))
        .withColumn(
            "pack_id",
            F.floor(
                F.greatest(F.col("cum") - 1, F.lit(0)) / budget
            ).cast("long"),
        )
        .collect()
    )
    # In-memory reference per shard.
    by_shard: dict[int, list] = {}
    for r in sorted(got, key=lambda r: (r.shard, r.doc_id)):
        by_shard.setdefault(r.shard, []).append(r)
    for shard, rs in by_shard.items():
        cum = 0
        prev_pack = 0
        for r in rs:
            cum += r.n_tokens
            assert r.cum == cum
            expect_pack = max(0, (cum - 1)) // budget
            assert r.pack_id == expect_pack
            assert r.pack_id >= prev_pack
            prev_pack = r.pack_id


@st.composite
def funnel_case(draw):
    users = draw(st.lists(st.integers(0, 3), min_size=1, max_size=3, unique=True))
    evs = []
    types = ["view", "click", "purchase", "error"]
    for u in users:
        minutes = draw(
            st.lists(st.integers(0, 500), min_size=0, max_size=8, unique=True)
        )
        for i, m in enumerate(minutes):
            evs.append((u, _t(m), types[draw(st.integers(0, 3))]))
    return evs


def _funnel_ref(evs):
    """Brute-force strict-ordered funnel reference."""
    n_users = len({u for u, _, t in evs if t in ("view", "click", "purchase")})
    by_user: dict[int, list[tuple]] = {}
    for u, ts, t in evs:
        by_user.setdefault(u, []).append((ts, t))
    n1 = n2 = n3 = 0
    for items in by_user.values():
        items.sort()
        t1 = min((ts for ts, t in items if t == "view"), default=None)
        t2 = (
            min((ts for ts, t in items if t == "click" and ts > t1), default=None)
            if t1
            else None
        )
        t3 = (
            min(
                (ts for ts, t in items if t == "purchase" and ts > t2),
                default=None,
            )
            if t2
            else None
        )
        n1 += t1 is not None
        n2 += t2 is not None
        n3 += t3 is not None
    return n_users, n1, n2, n3


@given(funnel_case())
@settings(**_SETTINGS)
def test_funnel_fold_matches_reference(spark, evs):
    """The single-shuffle array fold must equal the brute-force
    strict-ordered funnel on arbitrary event orderings/ties."""
    from axolotls_spark.queries_analytics import funnel_conversion

    evs = [e for e in evs if e[2] in ("view", "click", "purchase")]
    if not evs:
        return
    df = spark.createDataFrame(
        evs, "user_id BIGINT, ts TIMESTAMP_NTZ, event_type STRING"
    )
    per_user = df.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("ts", "event_type"))).alias("evs")
    )
    # Reuse the registered query's fold by running it over a temp
    # view-shaped frame: simplest is to replicate the final agg via
    # the module's internals — call the public query on a fake dir is
    # not possible, so assert via SQL on the same algebra:
    from axolotls_spark import queries_analytics as QA

    # Build the fold exactly as the operator does.
    import pyspark.sql.functions as SF

    null_ts = SF.lit(None).cast("timestamp_ntz")
    fold = SF.aggregate(
        "evs",
        SF.struct(null_ts.alias("t1"), null_ts.alias("t2"), null_ts.alias("t3")),
        QA._funnel_step,
    )
    row = (
        per_user.select(fold.alias("f"))
        .agg(
            SF.count(SF.lit(1)).alias("n_users"),
            SF.count("f.t1").alias("n_view"),
            SF.count("f.t2").alias("n_click"),
            SF.count("f.t3").alias("n_purchase"),
        )
        .collect()[0]
    )
    assert (row.n_users, row.n_view, row.n_click, row.n_purchase) == _funnel_ref(
        evs
    )


@given(
    st.lists(st.integers(-(2**40), 2**40), min_size=1, max_size=50, unique=True),
    st.lists(st.integers(-(2**40), 2**40), min_size=1, max_size=50),
)
@settings(**_SETTINGS)
def test_bloom_bitset_never_false_negative(spark, members, probes):
    """The bit_or bitset construction must NEVER drop a true member
    (false positives allowed, false negatives are corruption)."""
    m_bits = 1 << 12  # small bitset to force collisions
    mdf = spark.createDataFrame([(k,) for k in members], "k BIGINT")
    bloom = (
        mdf.select(F.expr(f"pmod(xxhash64(k), {m_bits}L)").alias("h"))
        .select(
            F.expr("h div 64").alias("wi"),
            F.expr("shiftleft(1L, cast(h % 64 AS INT))").alias("m"),
        )
        .groupBy("wi")
        .agg(F.expr("bit_or(m)").alias("mask"))
    )
    pdf = spark.createDataFrame(
        [(k,) for k in set(members) | set(probes)], "k BIGINT"
    ).withColumn("h", F.expr(f"pmod(xxhash64(k), {m_bits}L)"))
    kept = (
        pdf.join(F.broadcast(bloom), F.expr("h div 64") == F.col("wi"))
        .filter(F.expr("(mask >> cast(h % 64 AS INT)) & 1L = 1L"))
        .select("k")
        .collect()
    )
    kept_keys = {r.k for r in kept}
    assert set(members) <= kept_keys


# --------------------------------------------------------------------------
# Warehouse operator cores vs in-memory references


@st.composite
def change_stream(draw):
    """Random per-key attribute change stream: (key, seq, attr)."""
    n_keys = draw(st.integers(1, 3))
    rows = []
    seq = 0
    for k in range(n_keys):
        for _ in range(draw(st.integers(1, 6))):
            rows.append((k, seq, draw(st.sampled_from("ABC"))))
            seq += 1
    return rows


def _scd2_reference(rows):
    """Python SCD2: collapse runs per key in seq order."""
    out = {}
    by_key = {}
    for k, s, a in sorted(rows):
        by_key.setdefault(k, []).append((s, a))
    for k, evs in by_key.items():
        versions = []
        for s, a in evs:
            if not versions or versions[-1]["attr"] != a:
                versions.append({"attr": a, "eff": s, "n": 1})
            else:
                versions[-1]["n"] += 1
        out[k] = versions
    return out


@given(change_stream())
@settings(**_SETTINGS)
def test_scd2_core_matches_reference(spark, rows):
    from axolotls_spark.operators.warehouse import scd2_history

    df = spark.createDataFrame(rows, "k long, seq long, attr string")
    got = scd2_history(
        df, key="k", order_cols=["seq"], attr="attr", eff_col="seq"
    ).collect()
    ref = _scd2_reference(rows)
    by_key = {}
    for r in got:
        by_key.setdefault(r.k, []).append(r)
    assert set(by_key) == set(ref)
    for k, vs in by_key.items():
        vs.sort(key=lambda r: r.version)
        exp = ref[k]
        assert [v.attr for v in vs] == [e["attr"] for e in exp]
        assert [v.effective_from for v in vs] == [e["eff"] for e in exp]
        assert [v.n_rows for v in vs] == [e["n"] for e in exp]
        assert [v.version for v in vs] == list(range(1, len(exp) + 1))
        assert vs[-1].is_current and vs[-1].effective_to is None
        for a, b in zip(vs, vs[1:]):
            assert a.effective_to == b.effective_from


@st.composite
def cdc_stream(draw):
    n_keys = draw(st.integers(1, 4))
    rows = []
    seq = 0
    for k in range(n_keys):
        for _ in range(draw(st.integers(1, 5))):
            rows.append((k, seq, draw(st.sampled_from(["set", "del"])),
                         draw(st.integers(0, 99))))
            seq += 1
    return rows


@given(cdc_stream())
@settings(**_SETTINGS)
def test_cdc_core_matches_reference(spark, rows):
    from axolotls_spark.operators.warehouse import cdc_latest

    df = spark.createDataFrame(rows, "k long, seq long, op string, val long")
    got = {
        r.k: (r.op, r.val, r.n_changes)
        for r in cdc_latest(
            df,
            key="k",
            ordinal=["seq"],
            payload=["op", "val"],
            tombstone=F.col("op") == "del",
        ).collect()
    }
    ref = {}
    counts = {}
    for k, s, op, val in sorted(rows, key=lambda r: r[1]):
        ref[k] = (op, val)
        counts[k] = counts.get(k, 0) + 1
    expected = {
        k: (op, val, counts[k])
        for k, (op, val) in ref.items()
        if op != "del"
    }
    assert got == expected
