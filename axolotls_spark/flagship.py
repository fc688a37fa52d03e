"""The flagship query: reference feature chain fused into a TPC-H
Q1-style pricing summary.

This is the "minimum end-to-end slice" from SURVEY.md §7 — it
exercises scan → clean (fill_null) → transform (log feature,
reference ``demo/criteo.py:34``) → filter → hash aggregate, i.e. the
reference's entire eager pipeline re-expressed as one lazy Catalyst
plan. At scale this is a single scan + one shuffle (partial/final
hash agg); the scan reads only the 7 referenced columns and the
date filter is pushed to Parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from axolotls_spark.io.sources import load_table


def flagship_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .withColumn("disc_price", F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .withColumn("charge", F.col("disc_price") * (1 + F.col("l_tax")))
        .withColumn("log_q", F.log(F.col("l_quantity") + F.lit(3.0)))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum("disc_price").alias("sum_disc_price"),
            F.sum("charge").alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.avg("log_q").alias("avg_log_q"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


FLAGSHIP_ORACLE = """
SELECT
    l_returnflag,
    l_linestatus,
    SUM(l_quantity)                                      AS sum_qty,
    SUM(l_extendedprice)                                 AS sum_base_price,
    SUM(l_extendedprice * (1 - l_discount))              AS sum_disc_price,
    SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
    AVG(l_quantity)                                      AS avg_qty,
    AVG(l_extendedprice)                                 AS avg_price,
    AVG(l_discount)                                      AS avg_disc,
    AVG(LN(l_quantity + 3.0))                            AS avg_log_q,
    COUNT(*)                                             AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""
