"""TPC-H-shaped advanced relational queries (adapted to the driver's
star schema — no partsupp/commitdate/receiptdate/shipmode columns, so
the classic shapes are re-targeted onto the columns that exist).

What this module certifies beyond queries_relational.py:

- correlated EXISTS / NOT EXISTS (Q4, Q21 shapes) — expressed in the
  DataFrame API as semi/anti joins with compound conditions, which is
  exactly how Catalyst de-correlates the SQL form;
- scalar subqueries, both global (Q22's AVG threshold) and correlated
  (above-customer-average) — expressed as a broadcast 1-row join and
  a window average respectively: no driver round-trip, no collect;
- IN <aggregated subquery> (Q18) — a semi join against a HAVING agg;
- disjunctive multi-column join predicates (Q19) — one equi-join key
  plus an OR-of-ANDs residual, so Spark still plans a hash join (not
  a nested loop) with the disjunction as post-join filter;
- group-by-derived-columns over multi-way joins (Q7/Q9 shapes);
- conditional-ratio aggregates producing a single row (Q14).

All dims are broadcast; every fact-side shuffle is on a join or
group key the next operator reuses. At 100 TB the EXISTS rewrites
matter: a correlated subquery executed row-at-a-time would be a
driver loop, while the semi-join form is one co-partitioned shuffle.

Reference has no joins/subqueries at all (SURVEY §2A "ABSENT";
verified against /root/reference — no join/agg identifier exists).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from axolotls_spark.io.sources import load_table
from axolotls_spark.registry import register, stable_f32


@register(
    "q4_late_ship_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY o_orderpriority
    """,
    tags=("subquery", "exists", "semi-join", "agg"),
)
def q4_late_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS → LEFT SEMI join whose
    condition references both sides (shipped >90 days after order).
    Catalyst plans the same co-partitioned shuffle the SQL form
    de-correlates to; no per-row subquery execution."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (li.l_orderkey == o.o_orderkey) & (
        li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 90 DAY")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q6_revenue_delta",
    oracle="""
    SELECT SUM(l_extendedprice * l_discount) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("filter", "pushdown", "agg", "scan-efficiency"),
)
def q6_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-rate query — every predicate is
    pushdown-eligible (PushedFilters on l_shipdate/l_discount/
    l_quantity) and the scan reads 4 columns of 11. The plan is
    scan → filter → partial agg → single-row exchange; at 100 TB
    this is bounded by parquet row-group skip efficiency."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


@register(
    "q7_nation_trade_flow",
    oracle="""
    SELECT
        n1.n_name                         AS supp_nation,
        n2.n_name                         AS cust_nation,
        EXTRACT(YEAR FROM l.l_shipdate)::INT AS ship_year,
        CAST(SUM(l.l_extendedprice * (1 - l.l_discount)) AS REAL) AS revenue
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey  = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey  = o.o_custkey
    JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
    WHERE n1.n_name IN ('NATION_1', 'NATION_2')
      AND n2.n_name IN ('NATION_1', 'NATION_2')
      AND n1.n_name <> n2.n_name
    GROUP BY n1.n_name, n2.n_name, ship_year
    """,
    tags=("join", "multi-join", "broadcast-join", "agg", "derived-group-key"),
)
def q7_nation_trade_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume. supplier+nation and
    customer+nation are both broadcast (pre-filtered to 2 nations),
    so lineitem shuffles only once — for the orders join — and the
    group-by runs on a handful of keys."""
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    supp_n = s.join(
        F.broadcast(n.select(F.col("n_nationkey").alias("sn_key"),
                             F.col("n_name").alias("supp_nation"))),
        s.s_nationkey == F.col("sn_key"),
    ).select("s_suppkey", "supp_nation")
    cust_n = c.join(
        F.broadcast(n.select(F.col("n_nationkey").alias("cn_key"),
                             F.col("n_name").alias("cust_nation"))),
        c.c_nationkey == F.col("cn_key"),
    ).select("c_custkey", "cust_nation")
    return (
        li.join(F.broadcast(supp_n), li.l_suppkey == supp_n.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cust_n), o.o_custkey == cust_n.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("ship_year"),
        )
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .transform(lambda df: stable_f32(df, "revenue"))
    )


@register(
    "q9_product_profit",
    oracle="""
    SELECT
        n.n_name                              AS nation,
        EXTRACT(YEAR FROM o.o_orderdate)::INT AS o_year,
        ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                      * (1 - CAST(l.l_discount AS DECIMAL(18,4)))
                  - CAST(0.6 AS DECIMAL(3,2))
                      * CAST(p.p_retailprice AS DECIMAL(18,4))
                      * CAST(l.l_quantity AS DECIMAL(18,4))), 2) AS profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey  = l.l_partkey
    JOIN supplier s ON s.s_suppkey  = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_type = 'PROMO'
    GROUP BY n.n_name, o_year
    """,
    tags=("join", "multi-join", "agg", "derived-group-key"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (supply cost proxied as 60% of retail price —
    the schema has no partsupp). part/supplier/nation broadcast;
    lineitem↔orders co-shuffle on orderkey is the only wide edge."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem")
    sn = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", "n_name"
    )
    return (
        li.join(F.broadcast(p.select("p_partkey", "p_retailprice")),
                li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(sn), li.l_suppkey == sn.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            # Exact decimal arithmetic: the profit is a large sum of
            # near-cancelling terms, so float64 reorder noise crosses
            # the oracle's 9-sig-digit rounding at bigger SFs; decimal
            # sums are associative and bit-identical on both engines.
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,4)")
                    * (F.lit(1) - F.col("l_discount").cast("decimal(18,4)"))
                    - F.lit(0.6).cast("decimal(3,2)")
                    * F.col("p_retailprice").cast("decimal(18,4)")
                    * F.col("l_quantity").cast("decimal(18,4)")
                ),
                2,
            ).alias("profit")
        )
    )


@register(
    "q10_returned_revenue",
    oracle="""
    SELECT
        c.c_custkey, c.c_name, n.n_name AS nation,
        SUM(l.l_extendedprice * (1 - l.l_discount)) AS revenue
    FROM customer c
    JOIN orders o   ON o.o_custkey  = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("join", "multi-join", "agg", "topk"),
)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: customers ranked by returned-item revenue.
    Returnflag filter pushes to the lineitem scan; customer⋈nation
    broadcast; TakeOrderedAndProject caps the result at 20 rows."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    cn = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        "c_custkey", "c_name", F.col("n_name").alias("nation")
    )
    return (
        li.join(o.select("o_orderkey", "o_custkey"), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cn), F.col("o_custkey") == cn.c_custkey)
        .groupBy("c_custkey", "c_name", "nation")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .select("c_custkey", "c_name", "nation", "revenue")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q12_late_ship_priority_mix",
    oracle="""
    SELECT
        l.l_linestatus,
        CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                 THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                 THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    GROUP BY l.l_linestatus
    """,
    tags=("join", "conditional-agg", "case-when"),
)
def q12_late_ship_priority_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (linestatus stands in for shipmode): pivoted
    conditional counts over a join with a cross-side date predicate."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_linestatus"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q14_promo_revenue_pct",
    oracle="""
    SELECT
        100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                         THEN l.l_extendedprice * (1 - l.l_discount)
                         ELSE 0.0 END)
              / SUM(l.l_extendedprice * (1 - l.l_discount)) AS promo_pct
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
      AND l.l_shipdate <  TIMESTAMP '1996-10-01'
    """,
    tags=("join", "broadcast-join", "conditional-agg", "ratio"),
)
def q14_promo_revenue_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue share — a single-row ratio of two
    conditional sums over a broadcast part join."""
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev)
            ).alias("promo_pct")
        )
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
        SELECT l_suppkey, SUM(l_extendedprice * (1 - l_discount)) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN (
        SELECT l_suppkey, total_revenue,
               RANK() OVER (ORDER BY total_revenue DESC, l_suppkey) AS rk
        FROM rev
    ) r ON r.l_suppkey = s.s_suppkey
    WHERE r.rk <= 5
    """,
    tags=("subquery", "cte", "window", "join"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: revenue 'view' (CTE) → rank → top suppliers.
    Ranking replaces the classic MAX= equality join — same semantics,
    one less pass over the aggregate, and no float-equality join
    (which is fragile across engines)."""
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        )
    )
    # The tiebreak on l_suppkey makes the order total, so RANK() <= 5
    # is exactly the first 5 rows — take them via orderBy+limit
    # (TakeOrderedAndProject, distributed per-partition top-k) instead
    # of an unpartitioned window over the supplier-sized aggregate.
    top = rev.orderBy(F.desc("total_revenue"), F.asc("l_suppkey")).limit(5)
    return (
        F.broadcast(top)
        .join(s, top.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q18_large_volume_orders",
    oracle="""
    SELECT
        c.c_custkey, c.c_name, o.o_orderkey,
        CAST(o.o_orderdate AS DATE) AS orderdate,
        o.o_totalprice,
        SUM(l.l_quantity) AS total_qty
    FROM customer c
    JOIN orders o   ON o.o_custkey  = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(l_quantity) > 250
    )
    GROUP BY c.c_custkey, c.c_name, o.o_orderkey, orderdate, o.o_totalprice
    """,
    tags=("subquery", "in-subquery", "having", "semi-join", "agg"),
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: IN (aggregated HAVING subquery) → LEFT SEMI join
    against the qualifying-order set. The qualifying set is small
    (<1% of orders) so it broadcasts into the semi join; the outer
    agg then reuses the orderkey clustering."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 250)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        o.join(F.broadcast(big), o.o_orderkey == F.col("big_orderkey"), "left_semi")
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.to_date("o_orderdate").alias("orderdate"),
            "o_totalprice",
        )
        .agg(F.sum("l_quantity").alias("total_qty"))
    )


@register(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT CAST(SUM(l.l_extendedprice * (1 - l.l_discount)) AS REAL)
        AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 15)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 25)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 35)
    """,
    tags=("join", "disjunctive-predicate", "agg"),
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: equi-join on partkey + OR-of-ANDs residual mixing
    columns from both sides. Spark keeps the hash join (equi key
    extracted) and evaluates the disjunction post-join — the plan to
    verify is BroadcastHashJoin with a Filter, never a nested loop."""
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    clause = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 15)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 25)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 35)
        )
    )
    return joined.filter(clause).agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .cast("float")
        .alias("revenue")
    )


@register(
    "q21_sole_late_supplier",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
    tags=("subquery", "exists", "not-exists", "multi-join", "agg", "topk"),
)
def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the ONLY late shipper in a
    multi-supplier finished order (late = shipped >90d after order
    date; the schema has no receipt/commit dates).

    The correlated EXISTS/NOT-EXISTS pair is rewritten as one
    per-order aggregate — distinct supplier count and distinct LATE
    supplier count — then a filter (n_supps > 1 AND n_late_supps = 1
    AND this supplier is late). One shuffle on orderkey computes
    both; the row-at-a-time subquery form would be quadratic."""
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")
    lo = li.join(o, li.l_orderkey == o.o_orderkey).withColumn(
        "is_late", late.cast("int")
    )
    # Per-order supplier stats as window aggregates over the same
    # orderkey partitioning the join just produced — one pass, vs a
    # groupBy + semi-join-back that would execute the lineitem⋈orders
    # join twice (Spark shares no subplans across join inputs).
    w = Window.partitionBy("l_orderkey")
    qualifying = (
        lo.withColumn("n_supps", F.size(F.collect_set("l_suppkey").over(w)))
        .withColumn(
            "n_late_supps",
            F.size(
                F.collect_set(
                    F.when(F.col("is_late") == 1, F.col("l_suppkey"))
                ).over(w)
            ),
        )
        .filter(
            (F.col("is_late") == 1)
            & (F.col("n_supps") > 1)
            & (F.col("n_late_supps") == 1)
        )
    )
    return (
        qualifying.join(F.broadcast(s), qualifying.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


@register(
    "q22_idle_rich_customers",
    oracle="""
    SELECT c.c_mktsegment, COUNT(*) AS numcust,
           CAST(SUM(c.c_acctbal) AS REAL) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (
        SELECT AVG(c2.c_acctbal) FROM customer c2 WHERE c2.c_acctbal > 0.0
    )
    AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 350000.0
    )
    GROUP BY c.c_mktsegment
    """,
    tags=("subquery", "scalar-subquery", "not-exists", "anti-join", "agg"),
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: global scalar subquery (average positive
    balance) as a broadcast 1-row cross join — the distributed way to
    thread a scalar through a filter without collect() — then an
    anti join for above-average-balance customers who never placed a
    large (>350k) order. (The synthetic data has no order-less
    customers, so the anti join carries a predicate to stay a real
    filter.)"""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 350000.0
    ).select("o_custkey")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum("c_acctbal").alias("totacctbal"),
        )
        .transform(lambda df: stable_f32(df, "totacctbal"))
    )


@register(
    "q2_min_unit_price_supplier",
    oracle="""
    WITH unit AS (
        SELECT l_partkey, l_suppkey,
               AVG(l_extendedprice / l_quantity) AS unit_price
        FROM lineitem
        GROUP BY l_partkey, l_suppkey
    )
    SELECT l_partkey AS partkey, l_suppkey AS suppkey, unit_price
    FROM (
        SELECT l_partkey, l_suppkey, unit_price,
               ROW_NUMBER() OVER (PARTITION BY l_partkey
                                  ORDER BY unit_price, l_suppkey) AS rn
        FROM unit
    )
    WHERE rn = 1
    """,
    tags=("subquery", "cte", "window", "argmin-per-group"),
)
def q2_min_unit_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (no partsupp → observed unit prices from
    lineitem): cheapest supplier per part, the argmin-per-group
    pattern. A ranking window over the aggregate replaces Q2's
    correlated MIN subquery — one shuffle on partkey serves both the
    aggregate and the window."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    unit = li.groupBy("l_partkey", "l_suppkey").agg(
        F.avg(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price")
    )
    w = Window.partitionBy("l_partkey").orderBy(
        F.asc("unit_price"), F.asc("l_suppkey")
    )
    return (
        unit.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("l_suppkey").alias("suppkey"),
            "unit_price",
        )
    )


@register(
    "subquery_above_cust_avg",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders o
    WHERE o.o_totalprice > (
        SELECT AVG(o2.o_totalprice) FROM orders o2
        WHERE o2.o_custkey = o.o_custkey
    )
    """,
    tags=("subquery", "correlated-scalar-subquery", "window"),
)
def subquery_above_cust_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (orders above their own customer's
    average) — rewritten as a window average, which is Catalyst's own
    de-correlation: one shuffle on custkey instead of a per-row
    subquery. Single-order customers drop out in both engines
    (price = avg exactly, strict > excludes)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    return (
        o.withColumn("cust_avg", F.avg("o_totalprice").over(w))
        .filter(F.col("o_totalprice") > F.col("cust_avg"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@register(
    "q8_national_market_share",
    oracle="""
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_1' THEN rev ELSE 0.0 END)
             / SUM(rev) AS REAL) AS mkt_share
    FROM (
        SELECT EXTRACT(YEAR FROM o.o_orderdate)::INT AS o_year,
               l.l_extendedprice * (1 - l.l_discount) AS rev,
               n2.n_name AS supp_nation
        FROM lineitem l
        JOIN part p     ON p.p_partkey   = l.l_partkey
        JOIN supplier s ON s.s_suppkey   = l.l_suppkey
        JOIN orders o   ON o.o_orderkey  = l.l_orderkey
        JOIN customer c ON c.c_custkey   = o.o_custkey
        JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
        JOIN region r   ON r.r_regionkey  = n1.n_regionkey
        JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
        WHERE r.r_name = 'ASIA' AND p.p_type = 'STANDARD'
    ) t
    GROUP BY o_year
    """,
    tags=("join", "multi-join", "broadcast-join", "conditional-agg", "ratio"),
)
def q8_national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_1's share of STANDARD-part revenue sold
    into ASIA-market customers, by order year. Seven-table join where
    every dimension chain (part; supplier→nation; customer→nation→
    region) collapses to a broadcast, so the fact side shuffles only
    for the lineitem↔orders equi-join — one wide edge at any scale.

    Reference has no joins at all (SURVEY §2A); this certifies the
    deep-snowflake shape Catalyst must reorder + broadcast correctly.
    """
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "STANDARD"
    ).select("p_partkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    # supplier → its nation name (broadcast chain).
    supp_n = s.join(
        F.broadcast(
            n.select(F.col("n_nationkey").alias("sn_key"),
                     F.col("n_name").alias("supp_nation"))
        ),
        s.s_nationkey == F.col("sn_key"),
    ).select("s_suppkey", "supp_nation")
    # customers restricted to the ASIA market (nation⋈region broadcast).
    asia_cust = c.join(
        F.broadcast(
            n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .select(F.col("n_nationkey").alias("cn_key"))
        ),
        c.c_nationkey == F.col("cn_key"),
        "left_semi",
    ).select("c_custkey")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "left_semi")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(asia_cust), o.o_custkey == F.col("c_custkey"), "left_semi")
        .join(F.broadcast(supp_n), li.l_suppkey == supp_n.s_suppkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_1", rev).otherwise(0.0)
                )
                / F.sum(rev)
            ).alias("mkt_share")
        )
        .transform(lambda df: stable_f32(df, "mkt_share"))
    )


@register(
    "q11_important_part_values",
    oracle="""
    WITH val AS (
        SELECT l.l_partkey,
               SUM(l.l_quantity * p.p_retailprice) AS part_value
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey   = l.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        JOIN part p     ON p.p_partkey   = l.l_partkey
        WHERE n.n_regionkey = 2
        GROUP BY l.l_partkey
    )
    SELECT l_partkey AS partkey, part_value
    FROM val
    WHERE part_value > (SELECT SUM(part_value) * 0.001 FROM val)
    """,
    tags=("subquery", "scalar-subquery", "cte", "agg", "having-vs-total"),
)
def q11_important_part_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (no partsupp → inventory value proxied as
    shipped quantity × retail price, scoped to suppliers in region 2):
    parts whose value exceeds 0.1% of the grand total.

    The fraction-of-total scalar subquery becomes a broadcast 1-row
    cross join — the aggregate subtree is evaluated twice (Spark
    shares no subplans across join inputs), which is the right trade
    at scale: the re-scan is embarrassingly parallel, while a global
    window (Window.partitionBy() empty) would funnel every group
    through one partition. On a cluster you'd persist `val` if the
    upstream join were expensive enough to matter."""
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 2)
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    region_supp = s.join(
        F.broadcast(n.select("n_nationkey")),
        s.s_nationkey == F.col("n_nationkey"),
        "left_semi",
    ).select("s_suppkey")
    val = (
        li.join(F.broadcast(region_supp), li.l_suppkey == F.col("s_suppkey"),
                "left_semi")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_quantity") * F.col("p_retailprice")).alias("part_value"))
    )
    threshold = val.agg((F.sum("part_value") * 0.001).alias("threshold"))
    return (
        val.join(F.broadcast(threshold))
        .filter(F.col("part_value") > F.col("threshold"))
        .select(F.col("l_partkey").alias("partkey"), "part_value")
    )


@register(
    "q13_cust_order_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON o.o_custkey = c.c_custkey
         AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    ) t
    GROUP BY c_count
    """,
    tags=("join", "outer-join", "agg", "double-agg", "histogram"),
)
def q13_cust_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of per-customer order counts, keeping
    zero-order customers via a LEFT OUTER join with the filter inside
    the join condition (moving it to WHERE would silently drop the
    NULL-extended rows — the classic outer-join-filter trap).

    Two aggregations: the first shuffles on custkey (same key as the
    join, so AQE reuses the exchange); the second groups on the tiny
    c_count domain — a near-free shuffle at any scale."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderpriority"
    )
    cond = (c.c_custkey == o.o_custkey) & (F.col("o_orderpriority") != "1-URGENT")
    return (
        c.join(o, cond, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@register(
    "q16_supplier_cnt_by_part",
    oracle="""
    SELECT p.p_brand, p.p_size, COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      AND l.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0
      )
    GROUP BY p.p_brand, p.p_size
    """,
    tags=("subquery", "not-in", "anti-join", "count-distinct", "agg"),
)
def q16_supplier_cnt_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers ship each
    qualifying (brand, size) part class, excluding blacklisted
    (negative-balance) suppliers. NOT IN over a non-nullable key →
    LEFT ANTI join (the null-safe rewrite is unnecessary and would
    cost a nested loop). The part-side predicates all push to the
    parquet scan; COUNT(DISTINCT) expands to a two-level aggregate
    (partial distinct per partition, then merge) — no extra code."""
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
    ).select("p_partkey", "p_brand", "p_size")
    bad_supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0.0
    ).select("s_suppkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(bad_supp), li.l_suppkey == F.col("s_suppkey"),
                "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q17_small_qty_revenue",
    oracle="""
    SELECT CAST(SUM(l.l_extendedprice) / 7.0 AS REAL) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3'
      AND l.l_quantity < (
          SELECT 0.2 * AVG(l2.l_quantity)
          FROM lineitem l2
          WHERE l2.l_partkey = l.l_partkey
      )
    """,
    tags=("subquery", "correlated-scalar-subquery", "window", "agg"),
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue from unusually-small orders of one brand's
    parts. The correlated per-part AVG becomes a window average over
    the brand-filtered join — legitimate because the subquery's
    correlation key (partkey) is a subset of the filtered parts, so
    averaging after the broadcast semi-filter sees exactly the same
    lineitem groups. One shuffle (on partkey, for the window)
    replaces a per-row subquery; the driver-side equivalent would be
    quadratic."""
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#3"
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    w = Window.partitionBy("l_partkey")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "left_semi")
        .withColumn("avg_qty", F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg((F.sum("l_extendedprice") / 7.0).alias("avg_yearly"))
        .transform(lambda df: stable_f32(df, "avg_yearly"))
    )


@register(
    "q20_excess_stock_suppliers",
    oracle="""
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = 'NATION_3'
      AND s.s_suppkey IN (
          SELECT l.l_suppkey
          FROM lineitem l
          JOIN part p ON p.p_partkey = l.l_partkey
          WHERE p.p_name LIKE 'large%'
            AND l.l_shipdate >= TIMESTAMP '1996-01-01'
            AND l.l_shipdate <  TIMESTAMP '1997-01-01'
          GROUP BY l.l_suppkey
          HAVING SUM(l.l_quantity) > 100.0
      )
    """,
    tags=("subquery", "in-subquery", "having", "semi-join", "like"),
)
def q20_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (no partsupp → 'heavily shipping' suppliers of
    'large%' parts in 1996 stand in for excess-stock suppliers):
    IN (aggregated HAVING subquery) → LEFT SEMI join. The qualifying
    supplier set is tiny (HAVING prunes it), so it broadcasts; the
    nation filter collapses the outer side before the semi join even
    runs. LIKE 'large%' is a prefix pattern → pushes down as a
    StartsWith parquet filter."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").startswith("large")
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("l_partkey", "l_suppkey", "l_quantity")
    heavy = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 100.0)
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(n.select("n_nationkey")),
               s.s_nationkey == F.col("n_nationkey"), "left_semi")
        .join(F.broadcast(heavy), s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
    )
