"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`axolotls_spark.queries` — the named-query
registry is the real inventory (one entry per operator family from
SURVEY.md §2, each with a DuckDB oracle where SQL-expressible).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from axolotls_spark import queries as _q  # noqa: E402
from axolotls_spark.flagship import flagship_query  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship_query(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
