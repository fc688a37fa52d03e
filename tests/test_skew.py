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


def _hot_key_df(spark, n=20_000, hot_frac=0.5):
    """Synthetic hot-key table: key 0 owns ``hot_frac`` of all rows,
    the rest are unique keys — the shape AQE can't always save (a
    single giant GROUP) and salting exists for."""
    hot = int(n * hot_frac)
    return spark.range(n).select(
        F.when(F.col("id") < hot, F.lit(0))
        .otherwise(F.col("id"))
        .cast("long")
        .alias("key"),
        (F.col("id") % 97).cast("long").alias("v"),
    )


def test_salted_aggregate_beats_naive_max_task_skew(spark):
    """Stress-certify the PERF claim, not just correctness: with one
    key = 50% of rows, a hash shuffle on the bare key funnels half
    the table into one reduce partition; salting must spread the hot
    key over most of the n_salts shards, capping every phase-1 group
    (and hence every reduce task) near hot/n_salts."""
    n, hot, n_salts = 20_000, 10_000, 16
    df = _hot_key_df(spark, n)

    # Measured signal 1: rows per reduce partition under each
    # partitioning — the actual max-task load of the shuffle.
    def max_partition_rows(d, *cols):
        return max(
            r["count"]
            for r in d.repartition(32, *[F.col(c) for c in cols])
            .groupBy(F.spark_partition_id().alias("p"))
            .count()
            .collect()
        )

    naive_max = max_partition_rows(df, "key")
    salted_max = max_partition_rows(skew.with_salt(df, n_salts), "key", "_salt")
    assert naive_max >= hot  # the hot key IS one task's load
    # Salting must at least halve the max task (16 shards into 32
    # partitions still collide a few shards per bin, so the exact
    # hot/n_salts bound belongs to signal 2 below, which measures
    # per-shard rows directly).
    assert salted_max <= naive_max // 2

    # Measured signal 2: per-salt partial row counts for the hot key
    # — phase 1 must spread key 0 over most salts, each shard holding
    # ~hot/n_salts rows (2x slack for hash unevenness).
    phase1 = (
        skew.with_salt(df, n_salts)
        .groupBy("key", "_salt")
        .count()
        .filter(F.col("key") == 0)
        .collect()
    )
    assert len(phase1) >= n_salts // 2
    assert max(r["count"] for r in phase1) <= (hot // n_salts) * 2

    # And the two-phase result still equals the plain aggregate.
    plain = {
        r.key: (r.n, r.s)
        for r in df.groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    salted = {
        r.key: (r.n, r.s)
        for r in skew.salted_aggregate(
            df,
            ["key"],
            partial_aggs={"pn": F.count(F.lit(1)), "ps": F.sum("v")},
            merge_aggs={"n": F.sum("pn"), "s": F.sum("ps")},
            n_salts=n_salts,
        ).collect()
    }
    assert salted == plain


def test_salted_join_spreads_hot_probe_key(spark):
    """Hot-key probe side: the salted broadcast join must keep the
    per-(key,salt) shard bounded AND return exactly the plain join's
    rows."""
    n, hot, n_salts = 20_000, 10_000, 16
    probe = _hot_key_df(spark, n)
    build = spark.range(200).select(
        F.col("id").cast("long").alias("key"),
        F.concat(F.lit("dim_"), F.col("id")).alias("name"),
    )
    plain = probe.join(build, "key").count()
    salted = skew.salted_broadcast_join(probe, build, ["key"], n_salts=n_salts)
    assert salted.count() == plain
    shards = (
        skew.with_salt(probe, n_salts)
        .join(build, "key")
        .groupBy("key", "_salt")
        .count()
        .filter(F.col("key") == 0)
        .collect()
    )
    assert len(shards) >= n_salts // 2
    assert max(r["count"] for r in shards) <= (hot // n_salts) * 2
