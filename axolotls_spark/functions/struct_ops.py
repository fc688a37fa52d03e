"""Struct-broadcast helpers — reference StructColumn recursive ops.

The reference's ``StructColumn`` doubles as a DataFrame and
broadcasts scalar ops over every field, recursing into nested
structs (``struct_column.py:73-105``: ``fill_null``, ``__add__``,
``log``). Spark's equivalent is a select-comprehension that rewrites
each field; nested structs are rebuilt with ``F.struct`` so the whole
thing stays one Catalyst projection (CollapseProject folds chains of
these into a single stage — the eager reference materializes each
step).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType, StructType


def _map_field(col: Column, dtype, fn: Callable[[Column], Column]) -> Column:
    if isinstance(dtype, StructType):
        return F.struct(
            *[
                _map_field(col.getField(f.name), f.dataType, fn).alias(f.name)
                for f in dtype.fields
            ]
        )
    if isinstance(dtype, NumericType):
        return fn(col)
    return col


def map_numeric_fields(
    df: DataFrame, fn: Callable[[Column], Column], cols: list[str] | None = None
) -> DataFrame:
    """Apply ``fn`` to every numeric column, recursing into structs.

    Mirrors reference ``StructColumn.__add__``/``log``
    (``struct_column.py:88-105``): non-numeric fields pass through
    unchanged; nested struct fields are transformed recursively
    (the ``dense_grp`` pattern, ``demo/criteo.py:24-39``).
    """
    targets = set(cols) if cols is not None else None
    out = []
    for f in df.schema.fields:
        if targets is not None and f.name not in targets:
            out.append(F.col(f.name))
        else:
            out.append(_map_field(F.col(f.name), f.dataType, fn).alias(f.name))
    return df.select(*out)


def fill_null_frame(df: DataFrame, value, cols: list[str] | None = None) -> DataFrame:
    """Recursive frame-wide null fill — reference
    ``StructColumn.fill_null`` (``struct_column.py:73-85``). Spark's
    ``df.fillna`` does not descend into structs; this does."""
    return map_numeric_fields(df, lambda c: F.coalesce(c, F.lit(value)), cols)
