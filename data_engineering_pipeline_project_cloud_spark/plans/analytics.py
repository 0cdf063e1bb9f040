"""Analytical benchmark queries (TPC-H-shaped) over the star schema.

These are the headline perf queries bench.py times: scan-heavy grouped
aggregation (q1), join + top-k (q3), and a multi-join volume rollup
(q5) — the canonical shapes a 100 TB batch engine must do well.

Scale notes:
 - filters are plain column predicates → pushed to the parquet scan
   (PushedFilters), row groups skipped via min/max stats;
 - aggregations are hash aggs with map-side partial combine;
 - dims (customer at this ratio, nation, region) broadcast — the only
   unavoidable shuffle is the groupBy key exchange.

Canonical output rule (see plans/parity.py docstring): sums run in
exact DECIMAL, final projection casts to DOUBLE on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import money
from ..sources import load_table


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary: the A1/A3 aggregate family (SUM/AVG/COUNT) in
    one pass, exact-decimal money, shipdate filter pushed to scan."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = money("l_quantity")
    price = money("l_extendedprice")
    disc = money("l_discount")
    tax = money("l_tax")
    disc_price = (price * (F.lit(1) - disc)).cast("decimal(18,4)")
    charge = (disc_price * (F.lit(1) + tax)).cast("decimal(18,6)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(qty).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(price).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            (F.sum(disc).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).cast("long").alias("count_order"),
        )
    )


def q3_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-priority analog: dim-filtered join + grouped revenue +
    deterministic top-10 (global sort + limit — Spark plans TakeOrdered,
    never a full sort, so top-k is cheap at any scale)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    revenue = (money("l_extendedprice") * (F.lit(1) - money("l_discount"))).cast(
        "decimal(18,4)")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust.filter(F.col("c_mktsegment") == "BUILDING")),
              orders["o_custkey"] == F.col("c_custkey"))
        .filter(F.col("o_orderdate") < F.lit("2000-01-01").cast("timestamp"))
        .groupBy(F.col("l_orderkey").alias("order_id"),
                 F.col("o_orderdate").alias("order_date"))
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("order_id").asc())
        .limit(10)
    )


def q5_region_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-supplier-volume analog: 6-way join (lineitem-orders-
    customer-supplier-nation-region) with the customer-nation =
    supplier-nation colocation predicate, revenue per nation."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    revenue = (money("l_extendedprice") * (F.lit(1) - money("l_discount"))).cast(
        "decimal(18,4)")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(supp),
              (li["l_suppkey"] == supp["s_suppkey"])
              & (cust["c_nationkey"] == supp["s_nationkey"]))
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .filter(F.col("r_name") == "ASIA")
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item-revenue analog (q10 shape): filter the fact on
    the return flag, join customer + nation dims, revenue per
    customer, top-20.  The returnflag filter lands in the parquet scan
    before any join."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    revenue = (money("l_extendedprice") * (F.lit(1) - money("l_discount"))).cast(
        "decimal(18,4)")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy(F.col("c_custkey").alias("customer_id"),
                 F.col("c_name").alias("customer_name"),
                 F.col("n_name").alias("nation_name"))
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("customer_id").asc())
        .limit(20)
    )


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume-order analog (q18 shape): HAVING on a grouped sum
    (orders whose total quantity exceeds a threshold), then join the
    qualifying keys back to the order header.  Aggregate-then-semi-join:
    the HAVING runs before any wide join, so only qualifying orders
    reach the join."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    big = (li.groupBy("l_orderkey")
           .agg(F.sum(money("l_quantity")).cast("decimal(18,2)")
                .alias("total_qty"))
           .filter(F.col("total_qty") > 300))
    return (
        orders.join(big, orders["o_orderkey"] == big["l_orderkey"])
        .select(F.col("o_orderkey").alias("order_id"),
                F.col("o_custkey").alias("customer_id"),
                F.col("o_orderdate").alias("order_date"),
                money("o_totalprice").cast("double").alias("total_price"),
                F.col("total_qty").cast("double").alias("total_qty"))
    )


def q12_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-mode priority analog (q12 shape): join + conditional
    counts via CASE inside SUM — the classic pivot-free categorical
    breakdown."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy(F.col("l_linestatus").alias("line_status"))
        .agg(F.sum(F.when(high, 1).otherwise(0)).cast("long")
             .alias("high_priority_count"),
             F.sum(F.when(~high, 1).otherwise(0)).cast("long")
             .alias("low_priority_count"))
    )


def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion-effect analog (q14 shape): LIKE-pattern dim predicate
    feeding a conditional revenue ratio — decimal sums for the parts,
    one double division at the end."""
    li = load_table(spark, sf_dir, "lineitem")
    part = F.broadcast(load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("product_id"), "p_type"))
    revenue = (money("l_extendedprice") * (F.lit(1) - money("l_discount"))).cast(
        "decimal(18,4)")
    joined = li.join(part, li["l_partkey"] == part["product_id"])
    promo = F.when(F.col("p_type").like("PROMO%"), revenue).otherwise(
        F.lit(0).cast("decimal(18,4)"))
    return joined.agg(
        F.sum(promo).cast("double").alias("promo_revenue"),
        F.sum(revenue).cast("double").alias("total_revenue"),
        F.round(F.sum(promo).cast("double") * 100.0
                / F.sum(revenue).cast("double"), 6).alias("promo_pct"),
    )


_MONEY_REV = ("CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * "
              "(1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4))")

ORACLE_SQL: dict[str, str] = {
    "q1_pricing_summary": f"""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
               CAST(SUM({_MONEY_REV}) AS DOUBLE) AS sum_disc_price,
               CAST(SUM(CAST({_MONEY_REV} * (1 + CAST(l_tax AS DECIMAL(12,2))) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
               CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
               CAST(COUNT(*) AS BIGINT) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q3_top_orders": f"""
        SELECT l_orderkey AS order_id, o_orderdate AS order_date,
               CAST(SUM({_MONEY_REV}) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '2000-01-01'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, order_id ASC
        LIMIT 10
    """,
    "q5_region_volume": f"""
        SELECT n_name AS nation_name,
               CAST(SUM({_MONEY_REV}) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name
    """,
    "q10_returned_revenue": f"""
        SELECT c_custkey AS customer_id, c_name AS customer_name,
               n_name AS nation_name,
               CAST(SUM({_MONEY_REV}) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, customer_id ASC
        LIMIT 20
    """,
    "q14_promo_effect": f"""
        SELECT CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN {_MONEY_REV}
                             ELSE CAST(0 AS DECIMAL(18,4)) END)
                    AS DOUBLE) AS promo_revenue,
               CAST(SUM({_MONEY_REV}) AS DOUBLE) AS total_revenue,
               CAST(round(CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN {_MONEY_REV}
                                        ELSE CAST(0 AS DECIMAL(18,4)) END)
                               AS DOUBLE) * 100.0
                          / CAST(SUM({_MONEY_REV}) AS DOUBLE), 6) AS DOUBLE)
                   AS promo_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
    """,
    "q12_priority_by_status": """
        SELECT l_linestatus AS line_status,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_priority_count,
               CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_priority_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY l_linestatus
    """,
    "q18_large_orders": """
        WITH big AS (
            SELECT l_orderkey,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(18,2))
                       AS total_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(18,2)) > 300
        )
        SELECT o_orderkey AS order_id, o_custkey AS customer_id,
               o_orderdate AS order_date,
               CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS total_price,
               CAST(total_qty AS DOUBLE) AS total_qty
        FROM orders JOIN big ON o_orderkey = l_orderkey
    """,
}

QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_top_orders": q3_top_orders,
    "q5_region_volume": q5_region_volume,
    "q10_returned_revenue": q10_returned_revenue,
    "q12_priority_by_status": q12_priority_by_status,
    "q14_promo_effect": q14_promo_effect,
    "q18_large_orders": q18_large_orders,
}
