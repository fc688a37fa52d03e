"""Differential tests: every registered query vs its DuckDB oracle.

Mirrors the driver's correctness gate (row count + schema +
order-insensitive value compare with float rounding) at sf0.001 so
regressions surface locally before the per-round verify.
"""

from __future__ import annotations

import pytest

from axolotls_spark.queries import REGISTRY
from tools.parity import compare

ALL = sorted(REGISTRY)


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(name, spark, duck, sf_dir):
    ok, msg = compare(name, spark, duck, sf_dir)
    assert ok, f"{name}: {msg}"


def test_every_query_declares_tags():
    for name, spec in REGISTRY.items():
        assert spec.tags, f"{name} has no tags"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())
