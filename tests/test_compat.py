"""Reference-demo parity through the compat veneer: the three demo
scripts (the reference's de-facto test corpus, SURVEY §5) re-run with
the same program shape against Spark, checked against independently
computed expected values.

- criteo chain  ← /root/reference/axolotls/demo/criteo.py
- strings/slices ← /root/reference/axolotls/demo/string_col.py
- arrow round-trip ← /root/reference/axolotls/demo/arrow_interop.py
"""

from __future__ import annotations

import math

import pyarrow as pa
import pytest

from axolotls_spark import compat as ax

# demo/criteo.py:4-12 input columns (None == absent presence bit)
DENSE1 = [1382, 2, 2, None, 3]
DENSE2 = [None, 0, 0, 893, -1]
DENSE3 = [2, 44, 1, None, None]


def _criteo_frame(spark):
    return ax.Frame.from_dict(
        spark, {"dense1": DENSE1, "dense2": DENSE2, "dense3": DENSE3}
    )


def test_criteo_chain(spark):
    """The flagship feature chain (demo/criteo.py:24-51): nested
    clone, fill_null vs fill_null_, (x+3).log(), logit(1/(x+3))."""
    df = _criteo_frame(spark)
    df["dense_grp"] = df.clone()          # demo/criteo.py:24-25
    df["dense1"] = df["dense1"].fill_null(0)   # :30 (immutable+rebind)
    # :31 — in-place fill scoped to the flat columns; the nested
    # clone keeps its snapshot (clone-then-mutate trap, SURVEY §7).
    df.fill_null_(0, cols=["dense2", "dense3"])
    df["f1"] = (df["dense1"] + 3).log()   # :34-35
    df["f3"] = (1 / (df["dense3"] + 3)).logit()  # :51

    rows = df.collect()
    d1 = [r.dense1 for r in rows]
    assert d1 == [1382, 2, 2, 0, 3]
    # dense_grp snapshotted BEFORE the fills — scoped fill leaves the
    # struct's original nulls intact.
    assert [r.dense_grp.dense1 for r in rows] == DENSE1
    for r, x in zip(rows, [1382, 2, 2, 0, 3]):
        assert r.f1 == pytest.approx(math.log(x + 3))
    for r, x in zip(rows, DENSE3):
        x = 0 if x is None else x
        p = 1.0 / (x + 3)
        assert r.f3 == pytest.approx(math.log(p / (1 - p)))
    # Frame-wide fill_null_ recurses into nested frames exactly like
    # StructColumn.fill_null_ (struct_column.py:73-85).
    df.fill_null_(0)
    assert [
        r.dense_grp.dense1 for r in df.collect()
    ] == [1382, 2, 2, 0, 3]


def test_struct_broadcast(spark):
    """(df['dense_grp'] + 3).log() recursive broadcast
    (demo/criteo.py:38-39, struct_column.py:88-105)."""
    df = _criteo_frame(spark)
    df.fill_null_(0)
    df["dense_grp"] = df.clone()
    out = (df + 3).log()
    rows = out.collect()
    for r, x in zip(rows, [1382, 2, 2, 0, 3]):
        assert r.dense1 == pytest.approx(math.log(x + 3))
        assert r.dense_grp.dense1 == pytest.approx(math.log(x + 3))


def test_division_null_semantics_documented_divergence(spark):
    """x/0: torch gives inf (numeric_column.py:94-110); this engine
    follows SQL NULL (SURVEY §7 resolution). Pin the choice."""
    df = ax.Frame.from_dict(spark, {"x": [1.0, 0.0]})
    df["inv"] = 1 / df["x"]
    inv = [r.inv for r in df.collect()]
    assert inv[0] == pytest.approx(1.0)
    assert inv[1] is None


def test_strings_utf8_and_slices(spark):
    """demo/string_col.py: strings from Arrow, slicing, multi-byte
    UTF-8 ("不只是ascii", demo/string_col.py:31)."""
    strs = ["abc", "de", "XYZ", "abcXYZ", "123", "不只是ascii"]
    tbl = pa.table(
        {"row_id": list(range(len(strs))), "s": pa.array(strs, pa.string())}
    )
    df = ax.Frame.from_arrow(spark, tbl)
    sliced = df.slice(2, 5)  # col1[2:] flavor, offsets recomputed
    assert [r.s for r in sliced.collect()] == ["XYZ", "abcXYZ", "123"]
    # character (not byte) length semantics on multi-byte text
    from pyspark.sql import functions as F

    df["n"] = ax.Col(F.length(F.col("s")))
    assert [r.n for r in df.collect()] == [3, 2, 3, 6, 3, 8]


def test_list_transform_keeps_shape(spark):
    """functional.transform (velox.py:11-18): element-wise map over
    ragged lists without exploding — offsets/presence preserved."""
    df = ax.Frame.from_dict(
        spark, {"xs": [[1, 2], [], [3, 4, 5], None]}
    )
    df["ys"] = ax.transform(df["xs"], lambda x: x * 2)
    rows = df.collect()
    assert [r.ys for r in rows] == [[2, 4], [], [6, 8, 10], None]


def test_arrow_round_trip_with_nulls(spark):
    """demo/arrow_interop.py: nullable numeric → Arrow and back;
    presence mask ↔ Arrow validity ↔ Spark nulls."""
    tbl = pa.table(
        {
            "row_id": [0, 1, 2, 3],
            "v": pa.array([1.5, None, 3.0, None], pa.float64()),
        }
    )
    df = ax.Frame.from_arrow(spark, tbl)
    out = df.to_arrow()
    assert out.column("v").to_pylist() == [1.5, None, 3.0, None]
    assert len(df) == 4


def test_logit_eps_clamp(spark):
    """logit(eps): input clamped to [eps, 1-eps]
    (numeric_column.py:118-125 torch.logit semantics)."""
    df = ax.Frame.from_dict(spark, {"p": [0.0, 0.5, 1.0]})
    df["l"] = df["p"].logit(eps=0.01)
    got = [r.l for r in df.collect()]
    lo = math.log(0.01 / 0.99)
    assert got[0] == pytest.approx(lo)
    assert got[1] == pytest.approx(0.0)
    assert got[2] == pytest.approx(-lo)


def test_demo_scripts_run(spark):
    """The three reference demos, re-expressed in demos/, must run
    end-to-end (they create their own local session)."""
    import runpy
    import sys

    for name in ("criteo", "string_col", "arrow_interop"):
        mod = runpy.run_path(f"demos/{name}.py")
        mod["main"]()


def test_point_row_access(spark):
    """frame[i] point access (reference numeric_column.py:24-28,
    struct_column.py:37-38): decoded Python values, None for nulls,
    negative indices, IndexError past the end."""
    df = _criteo_frame(spark)
    r0 = df[0]
    assert r0["dense1"] == 1382 and r0["dense2"] is None and r0["dense3"] == 2
    r3 = df[3]
    assert r3["dense1"] is None and r3["dense2"] == 893
    # negative index = from the end (torch tensor semantics)
    assert df[-1] == df[4]
    with pytest.raises(IndexError):
        df[5]
    with pytest.raises(IndexError):
        df[-6]


def test_slice_getitem_sugar(spark):
    """frame[a:b] sugar over slice(a, b) keeps positional order."""
    df = _criteo_frame(spark)
    part = df[1:3]
    got = [r["dense1"] for r in part.collect()]
    assert got == [2, 2]
    tail = df[3:]
    assert [r["dense2"] for r in tail.collect()] == [893, -1]


def test_repr_grid_and_dtype_footer(spark):
    """Reference display parity (column_base.py:30-40): aligned grid
    of leading rows + dtype/length footer; the internal row_id order
    column never leaks into the user-facing schema."""
    from axolotls_spark import compat as ax

    f = ax.Frame.from_dict(spark, {"a": [1, 2, None], "b": ["x", "y", "z"]})
    s = repr(f)
    assert "a" in s.splitlines()[0] and "b" in s.splitlines()[0]
    assert "length: 3" in s
    assert "row_id" not in repr(f.dtype)
    assert [fld.name for fld in f.dtype.fields] == ["a", "b"]
