"""Reusable warehouse-maintenance operator cores.

Extracted from queries_warehouse so the same logic serves the named
queries (driver-oracle-checked on the TPC-H-ish tables) AND the
hypothesis property tests (random change streams vs an in-memory
Python reference, tests/test_properties.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scd2_history(
    df: DataFrame,
    key: str,
    order_cols: list[str],
    attr: str,
    eff_col: str,
) -> DataFrame:
    """Collapse an ordered change stream into SCD Type-2 versioned
    validity intervals.

    One exchange on ``key`` drives everything: the change-detect lag,
    the run-id prefix sum, the per-run aggregate and the effective_to
    lead all share the key partitioning.

    Returns (key, version, attr, effective_from, effective_to,
    n_rows, is_current).
    """
    w = Window.partitionBy(key).orderBy(*order_cols)
    prev = F.lag(attr).over(w)
    chg = df.withColumn(
        "__is_chg",
        F.when(prev.isNull() | (prev != F.col(attr)), 1).otherwise(0),
    )
    runs = chg.withColumn(
        "version",
        F.sum("__is_chg").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    v = runs.groupBy(key, "version").agg(
        F.min(attr).alias(attr),
        F.min(eff_col).alias("effective_from"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    pw = Window.partitionBy(key).orderBy("version")
    nxt = F.lead("effective_from").over(pw)
    return v.select(
        key,
        "version",
        attr,
        "effective_from",
        nxt.alias("effective_to"),
        "n_rows",
        nxt.isNull().alias("is_current"),
    )


def cdc_latest(
    df: DataFrame,
    key: str,
    ordinal: list[str],
    payload: list[str],
    tombstone: Column | None = None,
) -> DataFrame:
    """Latest-change-wins CDC apply as ONE hash aggregate.

    ``max_by`` with a struct ordinal replaces the ROW_NUMBER()=1
    window spelling — no per-key sort of the changelog, map-side
    partial combine. Rows whose final change matches ``tombstone``
    drop out (deletes).

    Returns (key, <payload...>, n_changes).
    """
    latest = df.groupBy(key).agg(
        F.max_by(F.struct(*payload), F.struct(*ordinal)).alias("__s"),
        F.count(F.lit(1)).alias("n_changes"),
    )
    out = latest.select(
        key,
        *[F.col(f"__s.{p}").alias(p) for p in payload],
        "n_changes",
    )
    return out.filter(~tombstone) if tombstone is not None else out
