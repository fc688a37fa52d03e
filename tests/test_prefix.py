"""operators/prefix.ranked_cumsum — distributed global rank/cumsum.

Certified three ways: (1) exact equivalence to the unpartitioned-
window reference on data with duplicates in the value column (the
order includes a unique tie-break, as the contract requires); (2)
boundary invariance — results identical for 1, 3 and 40 range
partitions, including n_parts larger than the row count; (3) the plan
contains no single-partition window over the data (the only one is
the <=n_parts-row offsets relation).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from axolotls_spark.operators.prefix import ranked_cumsum
from axolotls_spark.plans.audit import audit, single_partition_windows


def _data(spark):
    # Values collide heavily (id % 7) so the tie-break on id matters.
    return spark.range(500).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )


def _reference(df):
    w = Window.orderBy(F.desc("v"), F.asc("k"))
    return df.select(
        "k",
        F.row_number().over(w).alias("rn"),
        F.sum("v").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "cum"
        ),
    )


def test_matches_unpartitioned_window(spark):
    df = _data(spark)
    got = (
        ranked_cumsum(df, [F.desc("v"), F.asc("k")], "v")
        .select("k", "rn", "cum")
        .orderBy("rn")
        .collect()
    )
    want = _reference(df).orderBy("rn").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_partition_boundary_invariance(spark):
    df = _data(spark)
    outs = []
    for n in (1, 3, 40, 1000):
        rows = (
            ranked_cumsum(df, [F.desc("v"), F.asc("k")], "v", n_parts=n)
            .orderBy("rn")
            .collect()
        )
        outs.append([tuple(r) for r in rows])
    assert outs[0] == outs[1] == outs[2] == outs[3]


def test_no_data_sized_global_window(spark):
    df = _data(spark)
    f = audit(ranked_cumsum(df, [F.desc("v"), F.asc("k")], "v"))
    # The offsets window (over the <=n_parts-row per-partition
    # aggregate) is recognized by its __rcs_part marker and NOT
    # reported as a funnel; nothing else may be one.
    assert single_partition_windows(f.text) == ()
    # Data-sized windows are hash-partitioned on the range-partition id.
    assert "hashpartitioning" in f.text


def test_persisted_input_keeps_ranks_consistent(spark):
    """Regression: a persisted input used to break the Exchange reuse
    between the offsets aggregate and the final join, so the two
    consumers range-SAMPLED different partition boundaries and global
    ranks went wrong by whole partitions (observed on the Mann-Kendall
    pair relation: the rank-m/2 'median' drifted nondeterministically
    across runs). ranked_cumsum now pins one partitioning by
    persisting the ranged relation itself."""
    # A wider relation than _data so multiple range partitions are
    # actually populated, plus a persisted+materialized input.
    df = spark.range(20_000).select(
        F.col("id").alias("k"), (F.col("id") % 997).alias("v")
    ).persist()
    df.count()
    try:
        got = (
            ranked_cumsum(df, [F.desc("v"), F.asc("k")], "v")
            .select("k", "rn", "cum")
            .orderBy("rn")
            .collect()
        )
        want = _reference(df).orderBy("rn").collect()
        assert [tuple(r) for r in got] == [tuple(r) for r in want]
    finally:
        df.unpersist()
        spark.catalog.clearCache()


def test_exclusive_prefix_max_matches_window(spark):
    from axolotls_spark.operators.prefix import exclusive_prefix_max

    df = spark.range(5_000).select(
        F.col("id").alias("k"),
        ((F.col("id") * 37) % 101).alias("v"),
    ).persist()
    df.count()
    try:
        got = (
            exclusive_prefix_max(df, [F.asc("k")], "v", out_name="pm")
            .orderBy("k")
            .select("k", "pm")
            .collect()
        )
        w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
        want = (
            df.select("k", F.max("v").over(w).alias("pm"))
            .orderBy("k")
            .collect()
        )
        assert [tuple(r) for r in got] == [tuple(r) for r in want]
        assert got[0].pm is None
    finally:
        df.unpersist()
        spark.catalog.clearCache()


def test_order_statistic_values_matches_full_rank(spark):
    """order_statistic_values must return exactly the rank-k values a
    global row_number over the value column would — including under
    heavy ties (equal values must land in one range partition) and at
    the first/last ranks."""
    from axolotls_spark.operators.prefix import order_statistic_values

    n = 5_000
    df = spark.range(n).select(
        # non-monotone, with heavy ties (only 211 distinct values)
        ((F.col("id") * 37) % 211).cast("double").alias("v")
    )
    targets = spark.createDataFrame(
        [(1,), (2,), (1234,), (2500,), (2501,), (4999,), (5000,)],
        "target_rn bigint",
    )
    got = {
        r.target_rn: r.value
        for r in order_statistic_values(df, "v", targets).collect()
    }
    want_sorted = sorted(
        r.v for r in df.collect()
    )
    try:
        for k in (1, 2, 1234, 2500, 2501, 4999, 5000):
            assert got[k] == want_sorted[k - 1], (k, got[k])
        assert len(got) == 7
    finally:
        spark.catalog.clearCache()


def test_extra_cums_matches_chained_passes(spark):
    """extra_cums accumulates additional value columns in the SAME
    pass, bit-identically to chaining a second ranked_cumsum over the
    same total order (the r8 ks_two_sample shape: two integer
    cumulants, one range shuffle)."""
    df = _data(spark).withColumn("w", (F.col("k") % 3) + 1)
    one = ranked_cumsum(
        df,
        [F.desc("v"), F.asc("k")],
        "v",
        extra_cums={"w": "cw"},
    ).select("k", "rn", "cum", "cw")
    chained = ranked_cumsum(
        ranked_cumsum(df, [F.desc("v"), F.asc("k")], "v"),
        [F.desc("v"), F.asc("k")],
        "w",
        rank_name="_rn2",
        cum_name="cw",
    ).select("k", "rn", "cum", "cw")
    got = [tuple(r) for r in one.orderBy("rn").collect()]
    want = [tuple(r) for r in chained.orderBy("rn").collect()]
    assert got == want
