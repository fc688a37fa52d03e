"""Arrow interop + Python UDF surface (SURVEY §2A ops 5-9, §2B UDF).

The reference's signature capability is zero-copy Arrow exchange
(``string_column.py:89-102`` from_arrow, ``numeric_column.py:138-159``
to_arrow via ``pa.foreign_buffer`` over tensor pointers) and
vectorized torch kernels over whole buffers (``numeric_column.py:79``).
Spark's equivalents, in the same spirit but distributed:

- ``df.toArrow()`` / ``spark.createDataFrame(pa.Table)`` — Arrow IPC
  across the JVM↔Python boundary (Spark 4 accepts pyarrow natively).
- ``pandas_udf`` — the vectorized-kernel slot: the engine hands the
  kernel whole Arrow batches as pandas/numpy arrays; this is where a
  torch kernel would legitimately live in this architecture.
- ``mapInArrow`` — rawest interop: the function sees
  ``pyarrow.RecordBatch`` directly, zero pandas conversion; the moral
  equivalent of the reference's foreign-buffer export.

All three are the *slow path* relative to codegen'd Column
expressions (pyspark_guide: 10-100× vs row-at-a-time Python, but
still a Python hop) — the engine uses them only where builtin
expressions can't express the kernel.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

_EPS = 1e-6


# NB: typed with a DataType instance, not a DDL string — string types
# are parsed via the active session, which doesn't exist at import.
@pandas_udf(DoubleType())
def logit_kernel(p: pd.Series) -> pd.Series:
    """Vectorized logit with eps clamp — the reference's
    ``logit(eps)`` (``numeric_column.py:118-125``, torch.logit) as a
    pandas/numpy kernel over Arrow batches. Matches the composed
    Column-expression version (functions/scalar.py logit) bit-for-bit
    on doubles in [eps, 1-eps]."""
    import numpy as np

    q = p.clip(_EPS, 1.0 - _EPS)
    return np.log(q / (1.0 - q))


def arrow_scale_batches(df: DataFrame, col: str, factor: float) -> DataFrame:
    """mapInArrow transform: scale ``col`` by ``factor`` operating on
    raw ``pyarrow.RecordBatch``es — no pandas materialization at all.
    """
    import pyarrow as pa

    def run(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        import pyarrow.compute as pc

        for batch in batches:
            t = pa.Table.from_batches([batch])
            scaled = pc.multiply(t.column(col), pa.scalar(factor, pa.float64()))
            t = t.set_column(t.schema.get_field_index(col), col, scaled)
            yield from t.to_batches()

    return df.mapInArrow(run, df.schema)


def arrow_roundtrip(df: DataFrame) -> DataFrame:
    """df → pyarrow.Table → DataFrame (driver-side; interop surface,
    not an operator path — mirrors reference to_arrow/from_arrow)."""
    table = df.toArrow()
    return df.sparkSession.createDataFrame(table)
