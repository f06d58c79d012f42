"""Relational query surface: the aggregation/join/window/set-op operators
the reference delegates to PostgreSQL (SURVEY.md §2.4 marks them absent in
the reference's own code — the reporting consumer uses them), expressed
DataFrame-first over the synthetic TPC-H-ish tables.

Every query here has an ANSI-SQL oracle (ORACLES) that DuckDB runs on the
same parquet; column aliases match exactly and numeric aggregation follows
plans/common.py's exact-arithmetic policy so value hashes match.

Scale notes: joins to region/nation/supplier/part are broadcastable (tiny
dims); fact-fact joins shuffle on their keys; windows partition by key.
All plans stay fully in whole-stage codegen (no Python UDFs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from qucosa_fcrepo_reportingdb_spark.plans.common import (
    DEC,
    DEC_WIDE,
    davg,
    dsum,
    dsum_wide,
    sql_davg,
    sql_dsum,
    sql_dsum_wide,
    t,
)


# --- Q1-style pricing summary: filter + groupBy + many aggregates -----------
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum_wide(disc_price, "sum_disc_price"),
            dsum_wide(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum('l_quantity', 'sum_qty')},
       {sql_dsum('l_extendedprice', 'sum_base_price')},
       {sql_dsum_wide('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
       {sql_dsum_wide('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
       {sql_davg('l_quantity', 'avg_qty')},
       {sql_davg('l_extendedprice', 'avg_price')},
       {sql_davg('l_discount', 'avg_disc')},
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --- Q3-style shipping priority: 3-way join + group + top-k ------------------
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-03-15"))
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1995-03-15"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum_wide(F.col("l_extendedprice") * (1 - F.col("l_discount")),
                       "revenue"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


Q3_SQL = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
       {sql_dsum_wide('l_extendedprice * (1 - l_discount)', 'revenue')}
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# --- Q5-style local supplier volume: 6-way join with broadcast dims ---------
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = t(spark, sf_dir, "nation")
    cust = t(spark, sf_dir, "customer")
    supp = t(spark, sf_dir, "supplier")
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, (li.l_suppkey == supp.s_suppkey)
              & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dsum_wide(F.col("l_extendedprice") * (1 - F.col("l_discount")),
                       "revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


Q5_SQL = f"""
SELECT n_name,
       {sql_dsum_wide('l_extendedprice * (1 - l_discount)', 'revenue')}
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


# --- top-k per group (window ranking) ---------------------------------------
def top3_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), "p_partkey")
    return (
        part.withColumn("rank_in_brand", F.row_number().over(w))
        .filter(F.col("rank_in_brand") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice", "rank_in_brand")
        .orderBy("p_brand", "rank_in_brand")
    )


TOP3_SQL = """
SELECT p_brand, p_partkey, p_retailprice, rank_in_brand
FROM (SELECT p_brand, p_partkey, p_retailprice,
             ROW_NUMBER() OVER (PARTITION BY p_brand
                                ORDER BY p_retailprice DESC, p_partkey)
               AS rank_in_brand
      FROM part)
WHERE rank_in_brand <= 3
ORDER BY p_brand, rank_in_brand
"""


# --- running totals (window frame) ------------------------------------------
def customer_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = (Window.partitionBy("o_custkey")
         .orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(Window.unboundedPreceding, 0))
    return orders.select(
        "o_custkey", "o_orderkey", "o_orderdate",
        F.sum(F.col("o_totalprice").cast(DEC)).over(w)
        .cast("string").cast("double").alias("running_total"),
    ).orderBy("o_custkey", "o_orderkey")


RUNNING_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS VARCHAR) AS DOUBLE) AS running_total
FROM orders WHERE o_custkey < 100
ORDER BY o_custkey, o_orderkey
"""


# --- anti / semi joins --------------------------------------------------------
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


NO_ORDERS_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
ORDER BY c_custkey
"""


def big_spender_customers_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    big = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        cust.join(big, cust.c_custkey == big.o_custkey, "left_semi")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


SEMI_SQL = """
SELECT c_custkey, c_mktsegment
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
ORDER BY c_custkey
"""


# --- rollup ------------------------------------------------------------------
def revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(dsum("l_extendedprice", "sum_price"),
             F.count(F.lit(1)).alias("n_items"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_price", "n_items",
        )
        .orderBy("returnflag", "linestatus")
    )


ROLLUP_SQL = f"""
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       {sql_dsum('l_extendedprice', 'sum_price')},
       COUNT(*) AS n_items
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY returnflag, linestatus
"""


# --- cube --------------------------------------------------------------------
def orders_status_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             dsum("o_totalprice", "sum_price"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("orderpriority"),
            "n_orders", "sum_price",
        )
        .orderBy("orderstatus", "orderpriority")
    )


CUBE_SQL = f"""
SELECT COALESCE(o_orderstatus, 'ALL') AS orderstatus,
       COALESCE(o_orderpriority, 'ALL') AS orderpriority,
       COUNT(*) AS n_orders,
       {sql_dsum('o_totalprice', 'sum_price')}
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY orderstatus, orderpriority
"""


# --- pivot -------------------------------------------------------------------
def order_priority_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    statuses = ["F", "O", "P"]
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", statuses)
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            *[F.coalesce(F.col(s), F.lit(0)).alias(f"n_{s}") for s in statuses],
        )
        .orderBy("o_orderpriority")
    )


PIVOT_SQL = """
SELECT o_orderpriority,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_F,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_O,
       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_P
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --- set operations ----------------------------------------------------------
def segment_customer_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers in AUTOMOBILE segment minus big spenders, plus the
    intersection — exercises EXCEPT and INTERSECT in one result."""
    cust = t(spark, sf_dir, "customer")
    auto = cust.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey")
    big = (t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
           .select(F.col("o_custkey").alias("c_custkey")).distinct())
    only_auto = auto.exceptAll(big).withColumn("bucket", F.lit("auto_only"))
    both = auto.intersect(big).withColumn("bucket", F.lit("auto_big"))
    return only_auto.unionByName(both).orderBy("bucket", "c_custkey")


SETOPS_SQL = """
WITH auto AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'),
     big AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders
             WHERE o_totalprice > 300000)
SELECT c_custkey, 'auto_only' AS bucket FROM (SELECT * FROM auto EXCEPT ALL SELECT * FROM big)
UNION ALL
SELECT c_custkey, 'auto_big' AS bucket FROM (SELECT * FROM auto INTERSECT SELECT * FROM big)
ORDER BY bucket, c_custkey
"""


# --- distinct aggregates ------------------------------------------------------
def supplier_part_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_orderkey").alias("n_orders"),
        )
        .orderBy("l_returnflag")
    )


DISTINCT_SQL = """
SELECT l_returnflag,
       COUNT(DISTINCT l_suppkey) AS n_suppliers,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_orderkey) AS n_orders
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "top3_parts_per_brand": top3_parts_per_brand,
    "customer_running_totals": customer_running_totals,
    "customers_without_orders": customers_without_orders,
    "big_spender_customers_semi": big_spender_customers_semi,
    "revenue_rollup": revenue_rollup,
    "orders_status_cube": orders_status_cube,
    "order_priority_pivot": order_priority_pivot,
    "segment_customer_setops": segment_customer_setops,
    "supplier_part_stats": supplier_part_stats,
}

ORACLES = {
    "q1_pricing_summary": Q1_SQL,
    "q3_shipping_priority": Q3_SQL,
    "q5_local_supplier_volume": Q5_SQL,
    "top3_parts_per_brand": TOP3_SQL,
    "customer_running_totals": RUNNING_SQL,
    "customers_without_orders": NO_ORDERS_SQL,
    "big_spender_customers_semi": SEMI_SQL,
    "revenue_rollup": ROLLUP_SQL,
    "orders_status_cube": CUBE_SQL,
    "order_priority_pivot": PIVOT_SQL,
    "segment_customer_setops": SETOPS_SQL,
    "supplier_part_stats": DISTINCT_SQL,
}


# --- q18-style: customers with very large orders -----------------------------
LARGE_ORDER_QTY = 150


def large_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total lineitem quantity exceeds a
    threshold, joined back to their customers — the aggregate-then-
    semi-join pattern (HAVING over a child aggregation driving a join).

    Scale shape: the lineitem aggregation is map-side combinable on
    l_orderkey; only the (rare) qualifying orders join onward, and the
    customer side is a broadcast. The big table aggregates BEFORE any
    join — the shape that survives a 100x fact-table scale-up."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    big = (li.groupBy("l_orderkey")
           .agg(F.sum(F.col("l_quantity").cast("decimal(28,4)"))
                .alias("total_qty_dec"))
           .filter(F.col("total_qty_dec") > LARGE_ORDER_QTY)
           .selectExpr("l_orderkey",
                       "CAST(CAST(total_qty_dec AS STRING) AS DOUBLE)"
                       " AS total_qty"))
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate",
                "o_totalprice", "total_qty")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
    )


LARGE_ORDER_SQL = f"""
WITH big AS (
  SELECT l_orderkey,
         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS VARCHAR)
              AS DOUBLE) AS total_qty
  FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(28,4))) > {LARGE_ORDER_QTY})
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
       o.o_totalprice, big.total_qty
FROM big
JOIN orders o ON o.o_orderkey = big.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY o.o_totalprice DESC, o.o_orderkey
"""

QUERIES["large_order_customers"] = large_order_customers
ORACLES["large_order_customers"] = LARGE_ORDER_SQL
