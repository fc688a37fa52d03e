"""Arrow interop demo — mirrors
`/root/reference/axolotls/demo/arrow_interop.py:1-12`: a nullable and
a non-null numeric column round-tripped through Arrow, validating
null-mask translation.

The reference hand-translates its byte-per-value presence tensor into
Arrow's validity bitmap (`numeric_column.py:138-159`); Spark's
toArrow()/createDataFrame(pa.Table) do the same translation natively
and batched.
"""

from __future__ import annotations

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import pyarrow as pa

from axolotls_spark.compat import Frame
from axolotls_spark.session import get_spark


def main() -> None:
    spark = get_spark("demo-arrow", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")

    # Nullable column: presence=[T,F,T,T,F,T,T,T] (arrow_interop.py:4-8).
    col = Frame.from_dict(spark, {"x": [1, None, 3, 4, None, 6, 7, 8]})
    out = col.to_arrow().column("x")
    print("nullable ->", out.to_pylist(), "| nulls:", out.null_count)

    # Non-null column (arrow_interop.py:11-12).
    nn = Frame.from_dict(spark, {"x": [1, 2, 3, 4, 5, 6, 7, 8]})
    out2 = nn.to_arrow().column("x")
    print("non-null ->", out2.to_pylist(), "| nulls:", out2.null_count)

    # And the reverse direction: Arrow table -> Frame.
    back = Frame.from_arrow(spark, pa.table({"x": pa.array([10, None, 30])}))
    print("from_arrow:"); back.show()


if __name__ == "__main__":
    main()
