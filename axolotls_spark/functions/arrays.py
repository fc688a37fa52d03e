"""Array / nested-data functions — reference ListColumn + functional.

The reference's one higher-order op, ``functional.transform``
(``functional/velox.py:11-18``), applies a function to a list
column's flattened child buffer and reuses the offsets — i.e.
element-wise map without exploding. Spark's higher-order functions
(``F.transform`` / ``F.filter`` / ``F.aggregate`` / ``F.zip_with``)
do exactly this inside Catalyst, no Python roundtrip, so they are the
canonical mapping. These helpers add the vector-math compositions the
embeddings workload needs.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def transform(arr: Column, fn: Callable[[Column], Column]) -> Column:
    """Element-wise map over array elements (reference
    ``functional/velox.py:11-18``; in-place ``transform_`` at
    ``:6-8`` has no analogue — rebind)."""
    return F.transform(arr, fn)


def dot(a: Column, b: Column) -> Column:
    """Dot product of two numeric arrays, accumulated in double,
    left-to-right (deterministic per-row order)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    """L2 norm of a numeric array (double)."""
    sq = F.transform(a, lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL when either vector has zero norm
    (SQL-domain semantics, see functions.scalar)."""
    return dot(a, b) / F.nullif(norm(a) * norm(b), F.lit(0.0))
