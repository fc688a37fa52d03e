"""Repetition filters + decontamination: closed-form values on
constructed docs, and the map-only fold matches the relational
definition of top-n-gram fraction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from axolotls_spark.operators import text_analysis as T


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_dup_token_frac_closed_form(spark):
    df = _df(spark, ["a b c d", "a a a a", "a b a b"])
    got = {
        r.doc_id: r.f
        for r in df.select(
            "doc_id", T.dup_token_frac(F.col("text")).alias("f")
        ).collect()
    }
    assert got[0] == 0.0
    assert got[1] == pytest.approx(0.75)
    assert got[2] == pytest.approx(0.5)


def test_top_bigram_frac_closed_form(spark):
    # "x y x y x" bigrams: [x y, y x, x y, y x] -> top 2/4
    # "a a a a"   bigrams: [a a, a a, a a]      -> top 3/3
    # "a b"       bigrams: [a b]                -> top 1/1
    # "a"         no bigram                     -> 0.0 by convention
    df = _df(spark, ["x y x y x", "a a a a", "a b", "a"])
    got = {
        r.doc_id: r.f
        for r in df.select(
            "doc_id", T.top_ngram_frac(F.col("text"), n=2).alias("f")
        ).collect()
    }
    assert got[0] == pytest.approx(0.5)
    assert got[1] == pytest.approx(1.0)
    assert got[2] == pytest.approx(1.0)
    assert got[3] == 0.0


def test_fold_matches_relational_definition(spark):
    """The sorted-array fold must equal explode + GROUP BY max/total
    on arbitrary-ish docs."""
    texts = ["p q r p q r p q", "k k m k m m k", "one two three", "z"]
    df = _df(spark, texts)
    fold = {
        r.doc_id: r.f
        for r in df.select(
            "doc_id", T.top_ngram_frac(F.col("text"), n=2).alias("f")
        ).collect()
    }
    rel = (
        df.select("doc_id", F.explode(T.ngrams_all_col(F.col("text"), 2)).alias("g"))
        .groupBy("doc_id", "g").count()
        .groupBy("doc_id")
        .agg((F.max("count") / F.sum("count")).alias("f"))
    )
    for r in rel.collect():
        assert fold[r.doc_id] == pytest.approx(r.f)
    assert fold[3] == 0.0  # single token: no bigrams, relational side has no row


def test_benchmark_overlap_counts_distinct_shared_ngrams(spark):
    bench = _df(spark, ["the quick brown fox jumps"])
    corpus = spark.createDataFrame(
        [
            # shares 'the quick brown' and 'quick brown fox' (x2 but distinct)
            (10, "the quick brown fox quick brown fox pad the quick brown"),
            (11, "totally different words here"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.n_overlap for r in T.benchmark_ngram_overlap(corpus, bench, 3).collect()}
    # doc 10's distinct 3-grams ∩ bench = {'the quick brown',
    # 'quick brown fox'} — repeats count once; doc 11 has no hit row.
    assert got == {10: 2}
