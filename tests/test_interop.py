"""Arrow interop round-trips — the reference's from_arrow/to_arrow
semantics (nulls, multi-byte UTF-8, nested lists) on Spark's
toArrow/createDataFrame surface."""

from __future__ import annotations

import pyarrow as pa

from axolotls_spark.interop import arrow_roundtrip


def test_arrow_roundtrip_nulls_and_utf8(spark):
    # Semantics from the reference demos: nullable ints (presence
    # mask ↔ Arrow validity) and multi-byte UTF-8 strings.
    table = pa.table(
        {
            "x": pa.array([1, None, 3], pa.int64()),
            "s": pa.array(["hello", "不只是ascii", "mixed 字"]),
        }
    )
    df = spark.createDataFrame(table)
    back = df.toArrow()
    assert back.column("x").to_pylist() == [1, None, 3]
    assert back.column("s").to_pylist() == ["hello", "不只是ascii", "mixed 字"]


def test_arrow_roundtrip_nested_lists(spark):
    table = pa.table(
        {
            "id": pa.array([1, 2], pa.int64()),
            "arr": pa.array([[1, 2, 3], []], pa.list_(pa.int32())),
        }
    )
    out = arrow_roundtrip(spark.createDataFrame(table))
    got = {r.id: r.arr for r in out.collect()}
    assert got == {1: [1, 2, 3], 2: []}
