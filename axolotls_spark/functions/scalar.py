"""Scalar / element-wise function layer — reference-parity ops.

Re-expresses the reference's arithmetic surface
(``numeric_column.py:56-125``: ``fill_null``, ``__add__``,
``__truediv__``, ``log``, ``logit``) as Catalyst Column expressions.
Everything here stays JVM-side inside whole-stage codegen — the
vectorized-kernel property the reference got from torch, Spark gets
from codegen for free, distributed.

Semantic decision (SURVEY.md §7): the reference follows torch
semantics (x/0 → ±inf, log(≤0) → nan/-inf, ``numeric_column.py:94-116``).
We follow SQL semantics (NULL on domain error) because the engine's
correctness oracle is SQL, and inf/nan poisons aggregates at scale.
``safe_div``/``safe_log`` make the guard explicit so oracle SQL can
mirror it with NULLIF/CASE.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def fill_null(col: Column, value) -> Column:
    """Reference ``fill_null`` (``numeric_column.py:56-63``):
    replace NULLs with a constant. The in-place variant
    (``fill_null_``, ``numeric_column.py:65-73``) has no analogue —
    Spark columns are immutable; rebind instead."""
    return F.coalesce(col, F.lit(value))


def safe_div(num: Column, den: Column) -> Column:
    """Division with NULL (not inf/nan) on zero denominator.

    Reference ``__truediv__`` (``numeric_column.py:94-110``) yields
    ±inf / nan via torch; SQL NULL is the distributed-safe choice.
    Oracle mirror: ``num / NULLIF(den, 0)``.
    """
    return num / F.nullif(den, F.lit(0))


def safe_log(col: Column) -> Column:
    """Natural log, NULL outside the domain (reference ``log``,
    ``numeric_column.py:112-116``, returns -inf/nan via torch).
    Spark's built-in F.log already returns NULL for <= 0."""
    return F.log(col)


def logit(col: Column, eps: float | None = None) -> Column:
    """Log-odds ``log(p / (1-p))`` — reference ``logit``
    (``numeric_column.py:118-125``, backed by ``torch.logit``).

    With ``eps``, input is clamped to [eps, 1-eps] exactly like
    torch; without, out-of-domain input yields NULL (torch yields
    nan). Composes entirely from built-ins, so it stays in codegen.
    """
    p = col
    if eps is not None:
        p = F.least(F.greatest(p, F.lit(float(eps))), F.lit(1.0 - eps))
    return F.log(p / (F.lit(1.0) - p))
