"""Reference-API compatibility veneer — the Axolotls user surface
re-expressed over Spark DataFrames.

A user of the reference writes eager, column-at-a-time programs
(``/root/reference/axolotls/demo/criteo.py``):

    df = ax.StructColumn({"dense1": col1, ...})
    df["dense_grp"] = df.clone()
    df["dense1"] = df["dense1"].fill_null(0)
    df["f1"] = (df["dense1"] + 3).log()
    df["f3"] = (1 / (df["dense3"] + 3)).logit()

This module accepts that exact program shape and compiles it to ONE
lazy Catalyst plan — every method builds expressions; nothing
executes until ``collect()``/``to_arrow()``/``show()``. The veneer
maps (SURVEY §1.4):

- ``StructColumn``-as-DataFrame (``struct_column.py:8-19``)  → ``Frame``
  over a ``pyspark.sql.DataFrame``; nested frames are struct columns.
- ``__setitem__`` in-place mutation (``struct_column.py:42-46``) →
  internal rebinding to ``withColumn`` (immutable under the hood, so
  ``clone()`` snapshots are free — no deep copy).
- ``fill_null``/``fill_null_`` (``numeric_column.py:56-73``) →
  ``coalesce``; the in-place variant rebinds.
- null AND-propagation in binary ops (``numeric_column.py:161-168``)
  → Spark's native NULL arithmetic (identical behavior).
- ``+`` / ``/`` incl. reflected forms (``numeric_column.py:76-110``)
  → Column arithmetic. DOCUMENTED DIVERGENCE: torch yields
  ``inf``/``nan`` for x/0 and log(x<=0); this engine follows SQL
  NULL semantics (SURVEY §7 hard parts) — deliberate, not a bug.
- ``log``/``logit(eps)`` (``numeric_column.py:112-125``) → ``F.log``
  and a clamped log-odds composition.
- struct broadcast ``(frame + k).log()`` (``struct_column.py:88-105``)
  → recursive per-field projection.
- ``functional.transform`` (``functional/velox.py:11-18``) →
  ``F.transform`` (operate on values, keep offsets, never explode).
- zero-copy Arrow interop (``string_column.py:89-102``,
  ``numeric_column.py:138-159``) → ``Frame.from_arrow`` /
  ``Frame.to_arrow`` over Spark 4's Arrow exchange.
- positional access ``col[i]`` / slices (``numeric_column.py:24-33``)
  → ``Frame.slice(a, b)`` under the explicit ``row_id`` order (Spark
  DataFrames are unordered; FIXTURES.md cross-cutting rule).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, NumericType, StructType


class Col:
    """A named column expression bound to no frame — composable with
    scalars and other Cols, assignable into a Frame. Mirrors the
    reference's ColumnBase arithmetic surface."""

    def __init__(self, expr: Column):
        self.expr = expr

    # -- arithmetic (reference numeric_column.py:76-110) ------------------
    def __add__(self, other) -> "Col":
        return Col(self.expr + _unwrap(other))

    def __radd__(self, other) -> "Col":
        return Col(_unwrap(other) + self.expr)

    def __sub__(self, other) -> "Col":
        return Col(self.expr - _unwrap(other))

    def __rsub__(self, other) -> "Col":
        return Col(_unwrap(other) - self.expr)

    def __mul__(self, other) -> "Col":
        return Col(self.expr * _unwrap(other))

    __rmul__ = __mul__

    def __truediv__(self, other) -> "Col":
        # try_divide: NULL on /0 under any ANSI setting — the SQL
        # side of the documented torch-inf divergence (SURVEY §7).
        return Col(F.try_divide(self.expr, _lit(other)))

    def __rtruediv__(self, other) -> "Col":
        return Col(F.try_divide(_lit(other), self.expr))

    # -- null handling (numeric_column.py:56-63) --------------------------
    def fill_null(self, value) -> "Col":
        return Col(F.coalesce(self.expr, F.lit(value)))

    # -- math (numeric_column.py:112-125) ---------------------------------
    def log(self) -> "Col":
        return Col(F.log(self.expr))

    def logit(self, eps: float | None = None) -> "Col":
        p = self.expr
        if eps is not None:
            p = F.least(F.greatest(p, F.lit(eps)), F.lit(1.0 - eps))
        return Col(F.log(p / (F.lit(1.0) - p)))

    # -- nested transform (functional/velox.py:11-18) ---------------------
    def transform(self, fn: Callable[[Column], Column]) -> "Col":
        return Col(F.transform(self.expr, fn))


def _unwrap(x):
    return x.expr if isinstance(x, Col) else x


def _lit(x) -> Column:
    return x.expr if isinstance(x, Col) else F.lit(x)


class Frame:
    """StructColumn-as-DataFrame veneer. Mutating methods rebind the
    wrapped immutable DataFrame, so reference programs using
    ``df[...] = ...`` / ``fill_null_`` run unchanged while the
    engine stays lazy + distributed."""

    ORDER = "row_id"

    def __init__(self, df: DataFrame):
        self._df = df

    # -- construction / interop ------------------------------------------
    @classmethod
    def from_dict(cls, spark: SparkSession, data: dict[str, list]) -> "Frame":
        """Columnar dict constructor (reference StructColumn({...}));
        adds the explicit row_id ordering key."""
        n = len(next(iter(data.values())))
        rows = [
            {cls.ORDER: i, **{k: v[i] for k, v in data.items()}}
            for i in range(n)
        ]
        return cls(spark.createDataFrame(rows))

    @classmethod
    def from_arrow(cls, spark: SparkSession, table) -> "Frame":
        """Arrow ingress (reference from_arrow, string_column.py:89-102).
        Spark 4 accepts pyarrow Tables directly; the JVM↔Python hop is
        Arrow IPC — the distributed analogue of the reference's
        zero-copy buffer sharing. The positional order key is attached
        at ingress (monotonically_increasing_id follows (partition,
        row) order, which preserves a local table's row order) so
        ordered slices work on Arrow-born frames too."""
        return cls(
            spark.createDataFrame(table).withColumn(
                cls.ORDER, F.monotonically_increasing_id()
            )
        )

    def to_arrow(self):
        """Arrow egress (reference to_arrow, numeric_column.py:138-159),
        ordered by row_id when present so positional semantics hold."""
        df = self._df
        if self.ORDER in df.columns:
            df = df.orderBy(self.ORDER).drop(self.ORDER)
        return df.toArrow()

    # -- schema surface (struct_column.py:21-35, column_base.py:10-12) ----
    @property
    def columns(self) -> list[str]:
        return [c for c in self._df.columns if c != self.ORDER]

    @property
    def dtype(self) -> StructType:
        """User-facing schema — the internal row_id order column is
        an implementation detail and stays hidden (the reference's
        dtype is the struct of user fields, struct_column.py:15-17).
        """
        return StructType(
            [f for f in self._df.schema.fields if f.name != self.ORDER]
        )

    @property
    def df(self) -> DataFrame:
        return self._df

    def __len__(self) -> int:
        """Row count.  The reference defines ``__len__`` twice in one
        class body (``numeric_column.py:52`` ``len(values)`` is
        shadowed by ``:135`` ``values.numel()``); for the 1-D tensors
        the reference actually constructs the two are identical, and
        this frame follows that shared semantics — the number of
        top-level rows (``count()``), matching ``len(tensor)`` ==
        ``tensor.numel()`` for 1-D."""
        return self._df.count()

    # -- projection / mutation (struct_column.py:33-46) -------------------
    def __getitem__(self, key):
        """``frame[name]`` → column expression; ``frame[i]`` → decoded
        row dict (reference point access: ``numeric_column.py:24-28``,
        ``string_column.py:32-35``, ``struct_column.py:37-38`` return
        the Python scalar / decoded value at position i, None for
        nulls).  A distributed frame has no O(1) row address, so the
        point read is an explicit tiny action: slice(i, i+1) under
        the row_id total order — fine interactively, never in an
        operator path.  Negative indices count from the end."""
        if isinstance(key, int):
            i = key
            if i < 0:
                i += len(self)
                if i < 0:
                    raise IndexError(key)
            rows = self.slice(i, i + 1).collect()
            if not rows:
                raise IndexError(key)
            return rows[0].asDict(recursive=True)
        if isinstance(key, slice):
            if key.step not in (None, 1):
                raise ValueError("slice step is not supported")
            stop = len(self) if key.stop is None else key.stop
            return self.slice(key.start or 0, stop)
        return Col(F.col(key))

    def __setitem__(self, name: str, value) -> None:
        if isinstance(value, Frame):
            # nested-frame assignment (demo/criteo.py:24-25): the
            # sub-frame becomes a struct column of its own fields.
            self._df = self._df.withColumn(
                name, F.struct(*[F.col(c) for c in value.columns])
            )
        else:
            self._df = self._df.withColumn(name, _unwrap(value))

    def clone(self) -> "Frame":
        """Snapshot (numeric_column.py:18-22). Immutability makes this
        free: later mutations of self rebind self._df and can never
        reach the clone's plan."""
        return Frame(self._df)

    def slice(self, start: int, stop: int) -> "Frame":
        """col[a:b] under the explicit row_id order
        (numeric_column.py:30-33; SURVEY §7 order-sensitivity)."""
        return Frame(
            self._df.orderBy(self.ORDER).offset(start).limit(stop - start)
        )

    # -- null handling, recursive (struct_column.py:73-85) ----------------
    def fill_null(self, value, cols: list[str] | None = None) -> "Frame":
        out = self.clone()
        out.fill_null_(value, cols)
        return out

    def fill_null_(self, value, cols: list[str] | None = None) -> None:
        """Recursive null fill — descends into nested struct columns
        (the reference's StructColumn.fill_null_ recursion,
        struct_column.py:73-85; plain fillna would skip nested
        frames). ``cols`` limits the fill to a column subset, the
        veneer spelling of ``df["dense_grp"].fill_null_(0)``."""
        self._df = self._map_numeric(
            lambda c: F.coalesce(c, F.lit(value)), cols
        )._df

    # -- scalar broadcast over numeric fields (struct_column.py:88-105) ---
    def _map_numeric(
        self, fn: Callable[[Column], Column], cols: list[str] | None = None
    ) -> "Frame":
        def rec(col: Column, dt, name: str) -> Column:
            if isinstance(dt, StructType):
                return F.struct(
                    *[
                        rec(col.getField(f.name), f.dataType, f.name).alias(
                            f.name
                        )
                        for f in dt.fields
                    ]
                )
            if isinstance(dt, NumericType):
                return fn(col)
            if isinstance(dt, ArrayType) and isinstance(
                dt.elementType, NumericType
            ):
                return F.transform(col, fn)
            return col

        df = self._df
        targets = (
            set(cols)
            if cols is not None
            else {f.name for f in df.schema.fields if f.name != self.ORDER}
        )
        proj = [
            (
                rec(F.col(f.name), f.dataType, f.name).alias(f.name)
                if f.name in targets
                else F.col(f.name)
            )
            for f in df.schema.fields
            if f.name != self.ORDER
        ]
        keep = [F.col(self.ORDER)] if self.ORDER in df.columns else []
        return Frame(df.select(*keep, *proj))

    def __add__(self, k) -> "Frame":
        return self._map_numeric(lambda c: c + F.lit(k))

    __radd__ = __add__

    def add(self, k, cols: list[str] | None = None) -> "Frame":
        """``(df["dense_grp"] + 3)`` spelling with a column subset —
        the struct-column broadcast of demo/criteo.py:39 scoped to
        one nested frame."""
        return self._map_numeric(lambda c: c + F.lit(k), cols)

    def log(self, cols: list[str] | None = None) -> "Frame":
        return self._map_numeric(F.log, cols)

    # -- display / action --------------------------------------------------
    def collect(self):
        df = self._df
        if self.ORDER in df.columns:
            df = df.orderBy(self.ORDER).drop(self.ORDER)
        return df.collect()

    def show(self, n: int = 20) -> None:
        df = self._df
        if self.ORDER in df.columns:
            df = df.orderBy(self.ORDER).drop(self.ORDER)
        df.show(n)

    _REPR_N = 10

    def __repr__(self) -> str:
        """Aligned-grid preview + dtype footer, mirroring the
        reference's tabulate display (``column_base.py:30-40``: first
        rows in a grid, then ``dtype: ..., length: n``). An explicit
        tiny action (first _REPR_N rows under the row_id order) —
        interactive sugar, never an operator path."""
        head = [
            r.asDict(recursive=True)
            for r in self.slice(0, self._REPR_N).collect()
        ]
        names = self.columns
        cells = [[repr(d.get(c)) for c in names] for d in head]
        widths = [
            max(len(c), *(len(row[i]) for row in cells)) if cells else len(c)
            for i, c in enumerate(names)
        ]
        sep = "  "
        lines = [sep.join(c.ljust(w) for c, w in zip(names, widths))]
        lines += [
            sep.join(v.ljust(w) for v, w in zip(row, widths)) for row in cells
        ]
        n = len(self)
        if n > self._REPR_N:
            lines.append("...")
        lines.append(f"dtype: {self.dtype}, length: {n}")
        return "\n".join(lines)

    __str__ = __repr__


# functional.transform parity (functional/velox.py:11-18): module-level
# alias so `from axolotls_spark import compat as ax; ax.transform(...)`
# reads like `axolotls.functional.velox.transform`.
def transform(col: Col, fn: Callable[[Column], Column]) -> Col:
    return col.transform(fn)
