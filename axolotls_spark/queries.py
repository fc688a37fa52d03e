"""Named query registry — the engine's operator coverage, checkable.

Every operator family from SURVEY.md §2 gets one or more named
queries here. Each entry carries:

- a PySpark callable ``(spark, sf_dir) -> DataFrame`` (the engine),
- optionally a DuckDB-compatible ANSI SQL string (the oracle),
- tags for the operator family it certifies.

``__spark_entry__.py`` re-exports this registry to the driver, which
compares Spark vs DuckDB per query (row-count + schema +
order-insensitive value-hash). Rules enforced here:

- every computed column is aliased identically in Spark and SQL;
- no ``collect()`` anywhere in an operator path (100 TB rule);
- non-SQL-expressible ops omit the oracle → rows-only check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from axolotls_spark.functions import arrays as A
from axolotls_spark.functions import scalar as S
from axolotls_spark.functions.struct_ops import map_numeric_fields
from axolotls_spark.io.sources import load_table
from axolotls_spark.registry import (  # noqa: F401 — re-exported API
    REGISTRY,
    QueryFn,
    QuerySpec,
    oracle_sql,
    queries,
    register,
)


# ---------------------------------------------------------------------------
# Phase 0 — flagship (scan → clean → transform → filter → agg)
# ---------------------------------------------------------------------------

from axolotls_spark.flagship import FLAGSHIP_ORACLE, flagship_query  # noqa: E402

register("q1_pricing_summary", oracle=FLAGSHIP_ORACLE, tags=("agg", "flagship"))(
    flagship_query
)


# ---------------------------------------------------------------------------
# Phase 1 — reference-parity scalar layer (SURVEY §2A ops 19-28)
# ---------------------------------------------------------------------------


@register(
    "ref_feature_chain",
    oracle="""
    SELECT
        l_orderkey,
        l_linenumber,
        COALESCE(NULLIF(l_discount, 0.0), -1.0)       AS disc_filled,
        CAST(LN(l_quantity + 3.0) AS REAL)            AS log_q,
        CAST(LN((1.0 / (l_quantity + 3.0))
           / (1.0 - (1.0 / (l_quantity + 3.0)))) AS REAL) AS logit_q
    FROM lineitem
    """,
    tags=("scalar", "fill_null", "log", "logit", "reference-parity"),
)
def ref_feature_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Criteo feature chain (reference ``demo/criteo.py:30-51``):
    fill_null → (x + k) → log, and logit(1/(x + k)). Pure projection,
    stays in one codegen stage; scan reads only 4 columns."""
    li = load_table(spark, sf_dir, "lineitem")
    p = F.lit(1.0) / (F.col("l_quantity") + F.lit(3.0))
    # LN's last ulp is libm-specific — emit float32 (which also
    # matches the reference's torch-float32 tensors; see stable_f32).
    return li.select(
        "l_orderkey",
        "l_linenumber",
        S.fill_null(F.nullif(F.col("l_discount"), F.lit(0.0)), -1.0).alias(
            "disc_filled"
        ),
        S.safe_log(F.col("l_quantity") + F.lit(3.0)).cast("float").alias("log_q"),
        S.logit(p).cast("float").alias("logit_q"),
    )


@register(
    "ref_struct_broadcast",
    oracle="""
    SELECT
        l_orderkey,
        l_linenumber,
        CAST(LN(l_quantity + 3.0) AS REAL)      AS g_quantity,
        CAST(LN(l_extendedprice + 3.0) AS REAL) AS g_extendedprice,
        CAST(LN(l_tax + 3.0) AS REAL)           AS g_tax
    FROM lineitem
    """,
    tags=("struct", "broadcast-scalar", "reference-parity"),
)
def ref_struct_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct-broadcast ``(frame + k).log()`` (reference
    ``struct_column.py:88-105``, ``demo/criteo.py:39``): build a
    nested struct, map log(x+3) over every numeric field recursively,
    then flatten for the oracle compare."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.struct("l_quantity", "l_extendedprice", "l_tax").alias("grp"),
    )
    mapped = map_numeric_fields(
        li, lambda c: F.log(c + F.lit(3.0)), cols=["grp"]
    )
    return mapped.select(
        "l_orderkey",
        "l_linenumber",
        F.col("grp.l_quantity").cast("float").alias("g_quantity"),
        F.col("grp.l_extendedprice").cast("float").alias("g_extendedprice"),
        F.col("grp.l_tax").cast("float").alias("g_tax"),
    )


@register(
    "ref_transform_array",
    oracle="""
    SELECT
        vec_id,
        len(embedding) AS n_elems,
        list_sum(list_transform(embedding,
                                x -> CAST(x AS DOUBLE) * 2.0 + 1.0)) AS agg_2x1
    FROM embeddings
    """,
    tags=("array", "higher-order", "transform", "reference-parity"),
)
def ref_transform_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Element-wise array map + fold (reference
    ``functional/velox.py:11-18`` transform over the flattened child
    buffer): Spark's F.transform/F.aggregate are the same trick —
    operate on values, keep offsets, never explode."""
    emb = load_table(spark, sf_dir, "embeddings")
    mapped = A.transform(
        F.col("embedding"), lambda x: x.cast("double") * F.lit(2.0) + F.lit(1.0)
    )
    return emb.select(
        "vec_id",
        F.size("embedding").cast("long").alias("n_elems"),
        F.aggregate(mapped, F.lit(0.0), lambda acc, x: acc + x).alias("agg_2x1"),
    )


@register(
    "ref_slice_take",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_orderkey
    LIMIT 10 OFFSET 5
    """,
    tags=("slice", "limit-offset", "reference-parity"),
)
def ref_slice_take(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional slice ``col[a:b]`` (reference
    ``numeric_column.py:30-33`` etc.) — only meaningful under an
    explicit total order in a distributed engine (SURVEY §7)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
        .offset(5)
        .limit(10)
    )


@register(
    "ref_compat_chain",
    oracle="""
    SELECT
        l_orderkey,
        l_linenumber,
        CAST(LN(l_quantity + 3.0) AS REAL)  AS f1,
        CAST(LN((1.0 / (l_quantity + 3.0))
           / (1.0 - (1.0 / (l_quantity + 3.0)))) AS REAL) AS f3
    FROM lineitem
    """,
    tags=("compat", "reference-parity", "scalar"),
)
def ref_compat_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The criteo chain written through the compat veneer
    (axolotls_spark/compat.py) — the reference's eager program shape
    (``df[...] = (df[...] + 3).log()``, ``demo/criteo.py:34-51``)
    compiling to the same single-stage Catalyst projection as the
    expression-level ref_feature_chain."""
    from axolotls_spark import compat as ax

    df = ax.Frame(
        load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_linenumber", "l_quantity"
        )
    )
    df["f1"] = (df["l_quantity"] + 3.0).log()
    df["f3"] = (1.0 / (df["l_quantity"] + 3.0)).logit()
    return df.df.select(
        "l_orderkey",
        "l_linenumber",
        F.col("f1").cast("float").alias("f1"),
        F.col("f3").cast("float").alias("f3"),
    )


# ---------------------------------------------------------------------------
# Operator-family modules — importing registers their queries.
# ---------------------------------------------------------------------------

from axolotls_spark import queries_relational  # noqa: E402,F401
from axolotls_spark import queries_temporal  # noqa: E402,F401
from axolotls_spark import queries_text  # noqa: E402,F401
from axolotls_spark import queries_similarity  # noqa: E402,F401
from axolotls_spark import queries_streaming  # noqa: E402,F401
from axolotls_spark import queries_multimodal  # noqa: E402,F401
from axolotls_spark import queries_udf  # noqa: E402,F401
from axolotls_spark import queries_extended  # noqa: E402,F401
from axolotls_spark import queries_tpch  # noqa: E402,F401
from axolotls_spark import queries_quality  # noqa: E402,F401
from axolotls_spark import queries_llm  # noqa: E402,F401
from axolotls_spark import queries_sql_surface  # noqa: E402,F401
from axolotls_spark import queries_analytics  # noqa: E402,F401
from axolotls_spark import queries_curation  # noqa: E402,F401
from axolotls_spark import queries_warehouse  # noqa: E402,F401
from axolotls_spark import queries_lm  # noqa: E402,F401
