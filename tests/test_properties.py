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
