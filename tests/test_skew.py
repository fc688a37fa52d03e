"""Salting correctness: salted results must equal unsalted ones."""

from __future__ import annotations

from pyspark.sql import functions as F

from axolotls_spark.io.sources import load_table
from axolotls_spark.operators import skew

SF_DIR = "/root/testdata/sf0.001"


def test_salted_aggregate_matches_plain(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    plain = {
        (r.l_returnflag,): (r.n, round(r.s, 6))
        for r in li.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("s"))
        .collect()
    }
    salted = {
        (r.l_returnflag,): (r.n, round(r.s, 6))
        for r in skew.salted_aggregate(
            li,
            ["l_returnflag"],
            partial_aggs={
                "pn": F.count(F.lit(1)),
                "ps": F.sum("l_quantity"),
            },
            merge_aggs={"n": F.sum("pn"), "s": F.sum("ps")},
            n_salts=8,
        ).collect()
    }
    assert salted == plain


def test_salted_broadcast_join_matches_plain(spark):
    orders = load_table(spark, SF_DIR, "orders")
    cust = load_table(spark, SF_DIR, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    plain = orders.join(cust, "o_custkey").count()
    salted = skew.salted_broadcast_join(orders, cust, ["o_custkey"], n_salts=8)
    assert salted.count() == plain
    assert "_salt" not in salted.columns
