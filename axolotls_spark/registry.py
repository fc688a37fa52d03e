"""Query registry core — name → (PySpark fn, DuckDB oracle, tags).

Separated from the query definitions so each operator family lives
in its own module (queries_relational, queries_temporal, ...) and
registers itself on import.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    fn: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(fn=fn, oracle=oracle, tags=tags)
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {n: s.oracle for n, s in REGISTRY.items() if s.oracle is not None}


def stable_f32(df: DataFrame, *cols: str) -> DataFrame:
    """Cast the named float columns to float32 for oracle-stable output.

    Harness-stability convention (round-2, VERDICT "What's wrong"):
    the driver hashes result values at full precision, so a float
    aggregate whose last ulp depends on reduction order (corr,
    stddev, running SUM(double), log-sums) hash-mismatches DuckDB
    even though both answers are correct.  IEEE double->float32
    rounding is deterministic and identical in the JVM and DuckDB,
    and a <=few-ulp double divergence is ~2^29 away from a float32
    rounding boundary — so casting the *emitted* column to float32
    on BOTH sides (Spark: this helper; oracle: ``CAST(x AS REAL)``)
    makes the hashes agree without touching the computation itself.
    Order-stable outputs (plain COUNT/MIN/MAX, money sums the driver
    already certifies exactly) are left at full precision.
    """
    for c in cols:
        df = df.withColumn(c, df[c].cast("float"))
    return df
