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


@register(
    "ref_point_access",
    oracle="""
    WITH base AS (
        SELECT o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS rid
        FROM orders
    ),
    sliced AS (SELECT * FROM base WHERE rid < 10),
    req AS (
        SELECT * FROM (VALUES (-10, 0), (-1, 9), (0, 0), (4, 4), (9, 9))
        AS t(idx, pos)
    )
    SELECT CAST(req.idx AS BIGINT) AS idx,
           s.o_orderkey,
           s.o_totalprice
    FROM req JOIN sliced s ON s.rid = req.pos
    """,
    tags=("compat", "point-access", "reference-parity"),
)
def ref_point_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point row access ``col[i]`` incl. negative indices (reference
    ``numeric_column.py:24-28``, ``string_column.py:32-35``,
    ``struct_column.py:37-38``): each read is an explicit tiny
    action (slice(i, i+1) under the row_id total order) returning
    the decoded Python row — the veneer's eager interactive surface,
    never an operator path. The query probes 5 positions (two
    negative) of the 10 lowest-orderkey rows and re-lifts the read
    scalars into a DataFrame so the driver can oracle-check them."""
    from pyspark.sql import Window

    from axolotls_spark import compat as ax

    base = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
        .limit(10)
    )
    fr = ax.Frame(
        base.withColumn(
            ax.Frame.ORDER,
            (F.row_number().over(Window.orderBy("o_orderkey")) - 1).cast(
                "long"
            ),
        )
    )
    rows = []
    for idx in (-10, -1, 0, 4, 9):
        d = fr[idx]
        rows.append(
            {
                "idx": idx,
                "o_orderkey": d["o_orderkey"],
                "o_totalprice": d["o_totalprice"],
            }
        )
    return spark.createDataFrame(
        rows, schema="idx long, o_orderkey long, o_totalprice double"
    )


@register(
    "ref_arrow_roundtrip",
    oracle="""
    WITH base AS (
        SELECT o_orderkey, o_orderpriority, o_totalprice
        FROM orders ORDER BY o_orderkey LIMIT 50
    )
    SELECT o_orderkey,
           o_orderpriority,
           CAST(LN(o_totalprice / 1000.0) AS REAL) AS price_k_log,
           CAST(o_totalprice * 0.5 + o_totalprice * 2.0 AS DOUBLE)
               AS arr_sum,
           o_orderkey AS st_key
    FROM base
    """,
    tags=("arrow", "interop", "reference-parity"),
)
def ref_arrow_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow egress + ingress round trip (reference ``from_arrow`` /
    ``to_arrow``, ``string_column.py:89-102``,
    ``numeric_column.py:138-159``, list/struct variants): 50
    deterministic orders rows — numeric, string, list and struct
    columns — leave Spark as a pyarrow Table (``DataFrame.toArrow``),
    re-enter through ``Frame.from_arrow`` (which attaches the
    positional order key), take a veneer computation, and exit again
    through ``Frame.to_arrow`` before being re-lifted for the oracle
    compare. List/struct payloads are folded to scalars at the end
    only so the driver's hasher sees flat columns; the nested types
    themselves make both Arrow hops."""
    import pyarrow as pa

    from axolotls_spark import compat as ax

    base = (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            "o_orderpriority",
            "o_totalprice",
            F.array(
                F.col("o_totalprice") * 0.5, F.col("o_totalprice") * 2.0
            ).alias("arr"),
            F.struct("o_orderkey", "o_totalprice").alias("st"),
        )
        .orderBy("o_orderkey")
        .limit(50)
    )
    tbl = base.toArrow()  # egress: JVM -> pyarrow (ops 6-9)
    assert isinstance(tbl, pa.Table) and tbl.num_rows == 50
    fr = ax.Frame.from_arrow(spark, tbl)  # ingress (op 5)
    fr["price_k_log"] = (fr["o_totalprice"] / 1000.0).log()
    out = ax.Frame.from_arrow(spark, fr.to_arrow())  # egress+ingress again
    return out.df.select(
        "o_orderkey",
        "o_orderpriority",
        F.col("price_k_log").cast("float").alias("price_k_log"),
        F.aggregate(
            F.col("arr"), F.lit(0.0), lambda acc, x: acc + x
        ).alias("arr_sum"),
        F.col("st.o_orderkey").alias("st_key"),
    )


@register(
    "ref_len_count",
    oracle="""
    SELECT (SELECT COUNT(*) FROM lineitem) AS n_lineitem,
           (SELECT COUNT(*)
            FROM (SELECT * FROM orders LIMIT 20 OFFSET 5) t) AS n_slice
    """,
    tags=("compat", "len", "reference-parity"),
)
def ref_len_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``__len__`` (reference ``column_base.py``/``numeric_column.py``
    length surface): len(frame) is an eager distributed count; a
    sliced frame reports the slice length. Both scalars are re-lifted
    into a 1-row DataFrame for the oracle compare."""
    from pyspark.sql import Window

    from axolotls_spark import compat as ax

    n_lineitem = len(
        ax.Frame(load_table(spark, sf_dir, "lineitem").select("l_orderkey"))
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey")
        .withColumn(
            ax.Frame.ORDER,
            (F.row_number().over(Window.orderBy("o_orderkey")) - 1).cast(
                "long"
            ),
        )
    )
    n_slice = len(ax.Frame(o).slice(5, 25))
    return spark.createDataFrame(
        [{"n_lineitem": n_lineitem, "n_slice": n_slice}],
        schema="n_lineitem long, n_slice long",
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
from axolotls_spark import queries_entity  # noqa: E402,F401
from axolotls_spark import queries_distributed  # noqa: E402,F401
from axolotls_spark import queries_spatial  # noqa: E402,F401
from axolotls_spark import queries_recsys  # noqa: E402,F401
from axolotls_spark import queries_observability  # noqa: E402,F401
