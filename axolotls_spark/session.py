"""SparkSession factory with scale-oriented defaults.

The reference (wenleix/Axolotls) is a single-process eager engine
(``axolotls/column_base.py``); its moral equivalents here are Spark
conf knobs rather than code: Arrow exchange (zero-copy interop,
reference ``utils.py:3-10``), whole-stage codegen (vectorized torch
kernels, reference ``numeric_column.py:79``), and AQE (no planner in
the reference at all).

Design notes for 100 TB scale:

- AQE on: runtime partition coalescing, skew-join splitting, and
  dynamic join-strategy switching are the difference between a plan
  that works at sf0.1 and one that works at 1000 executors.
- ``autoBroadcastJoinThreshold`` raised to 64 MB: every dimension
  table in the star schema (region/nation/supplier/customer/part)
  stays broadcast-able far beyond sf0.1, eliminating shuffles on the
  fact-side join input.
- Session timezone pinned to UTC so timestamp semantics agree with
  the DuckDB oracle (naive timestamps) and are cluster-invariant.
- Arrow enabled for any Python exchange (pandas UDFs, toPandas).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Finding 2 (SCALE.md r7): 10x data at a FIXED partition count is
    # 10x per-task partition size — size this with the target SF (the
    # 100 TB rule: partitions stay ~100-250 MB).  Overridable so the
    # sf10 scaling legs can be sized without conflating OOM and slope.
    "spark.sql.shuffle.partitions": os.environ.get(
        "SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"
    ),
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}


def get_spark(
    app_name: str = "axolotls-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` when the env
    var is set, else whatever the environment provides (cluster
    submit, or ``local[*]``).
    """
    builder = SparkSession.builder.appName(app_name)
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master is None and cpus:
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
    conf = dict(DEFAULT_CONF)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
