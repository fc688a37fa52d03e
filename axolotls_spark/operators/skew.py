"""Skew mitigation — salting for hot keys.

AQE's skew-join splitting (on by default, session.py) handles most
skew at runtime; salting is the *plan-level* tool for the cases AQE
can't fix: a skewed **aggregation** (one giant group), or a skewed
join where the hot key's rows must still land on one reducer.

- ``salted_aggregate``: two-phase agg — groupBy (key, salt) first
  (spreads a hot key over ``n_salts`` reducers), then re-aggregate
  by key. Correct for any algebraic aggregate expressed as
  (partial, merge) pairs.
- ``salted_broadcast_join``: replicate the (small) build side per
  salt so the probe side joins on (key, salt) — each hot-key shard
  probes locally. Only sensible when the build side broadcasts;
  for two large skewed sides, prefer AQE skew splitting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, col_name: str = "_salt") -> DataFrame:
    """Uniform deterministic-per-row salt in [0, n_salts) — derived
    from a per-row id via hash, not rand(), so retries/speculative
    tasks recompute identical rows."""
    return df.withColumn(
        col_name,
        F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts)),
    )


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    partial_aggs: dict[str, Column],
    merge_aggs: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``partial_aggs``: name -> aggregate over raw rows (phase 1, on
    keys+salt). ``merge_aggs``: name -> aggregate over the phase-1
    columns (phase 2, on keys). e.g. count: partial count(*) then
    merge sum(partial).
    """
    salted = with_salt(df, n_salts)
    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[c.alias(n) for n, c in partial_aggs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[c.alias(n) for n, c in merge_aggs.items()]
    )


def salted_broadcast_join(
    probe: DataFrame,
    build: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join a skewed probe side to a broadcastable build side with
    per-salt build replication: probe rows scatter over n_salts
    shards per key, build rows replicate to every shard."""
    salted_probe = with_salt(probe, n_salts)
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    replicated = build.select("*", salts).withColumn(
        "_salt", F.col("_salt").cast("long")
    )
    out = salted_probe.join(
        F.broadcast(replicated), [*on, "_salt"], how
    )
    return out.drop("_salt")
