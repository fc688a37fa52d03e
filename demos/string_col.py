"""String columns demo — mirrors
`/root/reference/axolotls/demo/string_col.py:1-44` on the veneer:
strings from Arrow, ordered slices, List[String], multi-byte UTF-8.

The reference stores strings as a uint8 tensor + int32 offsets; Spark
stores UTF8String bytes columnar in Tungsten rows / Arrow batches —
same physical idea, engine-managed. Slicing an unordered distributed
collection needs an explicit order column; the veneer's slice() uses
the construction order it tracks for exactly that reason.
"""

from __future__ import annotations

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import pyarrow as pa

from axolotls_spark.compat import Frame
from axolotls_spark.session import get_spark


def main() -> None:
    spark = get_spark("demo-strings", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")

    # ax.StringColumn.from_arrow (string_col.py:5-6) → zero-copy
    # Arrow ingestion via spark.createDataFrame(pa.Table).
    tbl = pa.table({"s": pa.array(["abc", "de", "XYZ", "abcXYZ", "123"])})
    f = Frame.from_arrow(spark, tbl)
    print("col"); f.show()

    # col1[2:] ordered slice (string_col.py:9).
    print("col[2:]"); f.slice(2, 5).show()

    # Round-trip back to Arrow (string_col.py:13-15).
    print("to_arrow:", f.to_arrow().column("s").to_pylist())

    # List[String] with explicit offsets [0, 2, 3, 5]
    # (string_col.py:21-25) — as an array column.
    lists = spark.createDataFrame(
        [(["abc", "de"],), (["XYZ"],), (["abcXYZ", "123"],)],
        "xs array<string>",
    )
    print("List[String]"); lists.show(truncate=False)

    # Multi-byte UTF-8 (string_col.py:31: "不只是ascii") — Spark
    # strings are UTF-8 end to end; length() counts characters.
    utf = Frame.from_arrow(
        spark, pa.table({"s": pa.array(["abc", "de", "XYZ", "不只是ascii"])})
    )
    print("utf8"); utf.show()
    print("to_arrow:", utf.to_arrow().column("s").to_pylist())


if __name__ == "__main__":
    main()
