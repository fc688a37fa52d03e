"""As-of (temporal) join — Spark lacks it natively; composed from a
union + ignore-nulls window, the scalable idiom.

Semantics: for every left row, attach the payload of the latest
right row with the same key and ``right_ts <= left_ts`` (backward
as-of; ties at equal timestamps match).

Why not a range join: ``l.ts >= r.ts`` non-equi conditions explode
into O(|L|·|R|) per key before the "latest" filter. The union trick
is one shuffle on (key, time): tag both sides, sort-within-partition,
and carry the last-seen right payload forward with
``last(col, ignorenulls=True)`` over an unbounded-preceding row
frame. Cost is a single window over |L|+|R| rows — survives 100×
scale-up wherever a groupBy on the key does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
) -> DataFrame:
    """Backward as-of join; returns all left columns plus
    ``right_cols`` (null where no right row precedes the left row).

    ``on`` key column names must match on both sides (rename first
    if not). ``right_cols`` defaults to every non-key, non-ts right
    column.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in keys and c != right_ts
        ]
    left_cols = [c for c in left.columns]

    # Right payload rides as ONE struct so last(ignorenulls) can never
    # mix columns from different right rows (a per-column carry would,
    # whenever a payload column is legitimately NULL).
    r_struct_t = F.struct(*[F.col(c) for c in right_cols])
    l_tagged = left.select(
        *keys,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),  # left sorts AFTER right at equal ts
        *[F.col(c).alias(f"_l_{c}") for c in left_cols if c not in keys],
        F.lit(None)
        .cast(right.select(r_struct_t.alias("_r")).schema["_r"].dataType)
        .alias("_r"),
    )
    r_tagged = right.select(
        *keys,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
          for c in left_cols if c not in keys],
        r_struct_t.alias("_r"),
    )
    unioned = l_tagged.unionByName(r_tagged)

    w = (
        Window.partitionBy(*keys)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*", F.last("_r", ignorenulls=True).over(w).alias("_m")
    )
    return carried.filter(F.col("_side") == 1).select(
        *keys,
        *[F.col(f"_l_{c}").alias(c) for c in left_cols if c not in keys],
        *[F.col(f"_m.{c}").alias(c) for c in right_cols],
    )
