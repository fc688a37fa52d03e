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
