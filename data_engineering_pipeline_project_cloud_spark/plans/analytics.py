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


def q2_cheapest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-cost-supplier analog (q2 shape): for every LARGE size-15
    part, the cheapest offer observed in the fact table from a EUROPE
    supplier — correlated-min via a per-part argmin window, with the
    deterministic (price, supplier-key) tie-break.  The part/supplier
    predicates prune before the argmin; dims broadcast."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "LARGE"))
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    offers = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .filter(F.col("r_name") == "EUROPE")
        .groupBy(F.col("p_partkey").alias("product_id"),
                 F.col("p_name").alias("product_name"),
                 F.col("s_suppkey").alias("supplier_id"),
                 F.col("s_name").alias("supplier_name"),
                 F.col("n_name").alias("nation_name"))
        .agg(F.min(money("l_extendedprice")).alias("best_price_dec"))
    )
    w = Window.partitionBy("product_id").orderBy(
        F.col("best_price_dec").asc(), F.col("supplier_id").asc())
    return (offers.withColumn("__rn", F.row_number().over(w))
            .filter("__rn = 1")
            .select("product_id", "product_name", "supplier_id",
                    "supplier_name", "nation_name",
                    F.col("best_price_dec").cast("double")
                    .alias("best_price")))


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation-pair trade-volume analog (q7 shape): revenue flowing
    between two named nations in either direction, per ship-year.  The
    nation pair predicate is an OR of two AND arms over the joined
    supplier-nation × customer-nation — a join-then-filter Catalyst
    turns into two residual-filtered broadcast joins."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = F.broadcast(nation.select(F.col("n_nationkey").alias("sn_key"),
                                   F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(nation.select(F.col("n_nationkey").alias("cn_key"),
                                   F.col("n_name").alias("cust_nation")))
    revenue = (money("l_extendedprice") * (F.lit(1) - money("l_discount"))).cast(
        "decimal(18,4)")
    pair = (((F.col("supp_nation") == "NATION_1")
             & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2")
               & (F.col("cust_nation") == "NATION_1")))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(n1, supp["s_nationkey"] == F.col("sn_key"))
        .join(n2, cust["c_nationkey"] == F.col("cn_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").cast("long").alias("ship_year"))
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-share analog (q8 shape): the share of AMERICA-customer
    revenue supplied by NATION_3, per order-year — a conditional-sum
    ratio (two decimal sums, one double division at the end)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    sn = F.broadcast(nation.select(F.col("n_nationkey").alias("sn_key"),
                                   F.col("n_name").alias("supp_nation")))
    revenue = (money("l_extendedprice") * (F.lit(1) - money("l_discount"))).cast(
        "decimal(18,4)")
    target_rev = F.when(F.col("supp_nation") == "NATION_3", revenue).otherwise(
        F.lit(0).cast("decimal(18,4)"))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(sn, supp["s_nationkey"] == F.col("sn_key"))
        .filter(F.col("r_name") == "AMERICA")
        .groupBy(F.year("o_orderdate").cast("long").alias("order_year"))
        .agg(F.sum(target_rev).cast("double").alias("target_revenue"),
             F.sum(revenue).cast("double").alias("total_revenue"))
        .select("order_year", "target_revenue", "total_revenue",
                F.round(F.col("target_revenue") / F.col("total_revenue"), 6)
                .alias("mkt_share"))
    )


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-profit analog (q9 shape): profit per supplier-nation and
    order-year for widget parts.  The source has no partsupp table, so
    unit cost is modeled as 60% of the part's retail price — every
    intermediate stays in exact decimal wide enough that no cast ever
    rounds (0.6 × cents = 3 dp; × quantity = 5 dp ⊂ decimal(18,6)),
    keeping the result bit-stable across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%widget%"))
    revenue = (money("l_extendedprice") * (F.lit(1) - money("l_discount"))).cast(
        "decimal(18,6)")
    unit_cost = (money("p_retailprice") * F.lit("0.6").cast("decimal(2,1)")
                 ).cast("decimal(18,3)")
    line_cost = (unit_cost * money("l_quantity")).cast("decimal(18,6)")
    profit = (revenue - line_cost).cast("decimal(18,6)")
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation_name"),
                 F.year("o_orderdate").cast("long").alias("order_year"))
        .agg(F.sum(profit).cast("double").alias("profit"))
    )


def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-distribution analog (q13 shape): LEFT join customers to
    their non-open orders, count per customer (zero preserved through
    the null-safe count), then the distribution of those counts — the
    double-aggregation shape.  First agg shuffles on custkey, second on
    the tiny count domain."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") != "P")
    per_cust = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("order_count"))
    )
    return (per_cust.groupBy("order_count")
            .agg(F.count(F.lit(1)).cast("long").alias("n_customers")))


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-supplier analog (q15 shape): quarterly revenue per supplier,
    keep every supplier tied at the maximum.  The max-of-aggregate
    comparison happens in exact decimal (a double compare could split
    a genuine tie); the 1-row max broadcasts."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp")))
    supp = load_table(spark, sf_dir, "supplier")
    revenue = (money("l_extendedprice") * (F.lit(1) - money("l_discount"))).cast(
        "decimal(18,4)")
    per_supp = (li.groupBy(F.col("l_suppkey").alias("supplier_id"))
                .agg(F.sum(revenue).alias("total_rev_dec")))
    mx = per_supp.agg(F.max("total_rev_dec").alias("max_rev_dec"))
    return (
        per_supp.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev_dec") == F.col("max_rev_dec"))
        .join(F.broadcast(supp),
              F.col("supplier_id") == supp["s_suppkey"])
        .select("supplier_id", F.col("s_name").alias("supplier_name"),
                F.col("total_rev_dec").cast("double").alias("total_revenue"))
    )


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity-order analog (q17 shape): revenue lost to orders
    below 20% of a part's average quantity, for one brand's SMALL
    parts — the correlated-scalar-subquery shape, decorrelated into an
    agg-below-join on partkey (per-part averages join back to the
    fact rows of the same part)."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#5") & (F.col("p_type") == "SMALL"))
    li = (load_table(spark, sf_dir, "lineitem")
          .join(F.broadcast(part), F.col("l_partkey") == part["p_partkey"]))
    avg_qty = (li.groupBy(F.col("l_partkey").alias("avg_part"))
               .agg((F.sum(money("l_quantity")).cast("double")
                     / F.count(F.lit(1))).alias("avg_quantity")))
    return (
        li.join(F.broadcast(avg_qty), F.col("l_partkey") == F.col("avg_part"))
        .filter(F.col("l_quantity").cast("double")
                < F.lit(0.2) * F.col("avg_quantity"))
        .agg((F.sum(money("l_extendedprice")).cast("double") / F.lit(7.0))
             .alias("avg_yearly"),
             F.count(F.lit(1)).cast("long").alias("n_small_lines"))
    )


def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive-predicate analog (q19 shape): revenue matched by an
    OR of three brand/size/quantity AND-arms — the predicate a
    columnar engine must still push as one scan filter (Catalyst keeps
    the disjunction below the join as a residual on both sides'
    common columns)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    qty = F.col("l_quantity").cast("double")
    arm1 = ((F.col("p_brand") == "Brand#1") & (F.col("p_size").between(1, 10))
            & qty.between(1, 15))
    arm2 = ((F.col("p_brand") == "Brand#2") & (F.col("p_size").between(5, 20))
            & qty.between(10, 25))
    arm3 = ((F.col("p_brand") == "Brand#3") & (F.col("p_size").between(15, 40))
            & qty.between(20, 35))
    revenue = (money("l_extendedprice") * (F.lit(1) - money("l_discount"))).cast(
        "decimal(18,4)")
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .filter(arm1 | arm2 | arm3)
        .agg(F.sum(revenue).cast("double").alias("revenue"),
             F.count(F.lit(1)).cast("long").alias("n_lines"))
    )


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers-who-kept-orders-waiting analog (q21 shape): suppliers
    in one nation that were the SOLE late shipper on a multi-supplier
    order.  The reference shape is EXISTS + NOT EXISTS; decorrelated
    here into one per-order aggregate (distinct suppliers, distinct
    late suppliers, the late supplier when unique) — one shuffle on
    orderkey replaces two correlated subqueries."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    per_order = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy(F.col("l_orderkey").alias("order_id"))
        .agg(F.countDistinct("l_suppkey").cast("long").alias("n_supp"),
             F.countDistinct(F.when(late, F.col("l_suppkey"))).cast("long")
             .alias("n_late_supp"),
             F.min(F.when(late, F.col("l_suppkey"))).alias("late_supp"))
        .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
    )
    return (
        per_order.groupBy(F.col("late_supp").alias("supplier_id"))
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .join(F.broadcast(supp), F.col("supplier_id") == supp["s_suppkey"])
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .filter(F.col("n_name") == "NATION_0")
        .select("supplier_id", F.col("s_name").alias("supplier_name"),
                "numwait")
        .orderBy(F.col("numwait").desc(), F.col("supplier_id").asc())
        .limit(20)
    )


def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global-relation analog (q22 shape): customers with
    above-average positive balance and no RECENT orders (the synthetic
    orders table covers every customer, so "dormant since 1999" plays
    the role of q22's never-ordered set), summarized per nation — a
    scalar aggregate threshold (1-row broadcast) plus an anti join,
    with balances aggregated in exact decimal."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
    nation = load_table(spark, sf_dir, "nation")
    bal = money("c_acctbal")
    thresh = (cust.filter(bal > 0)
              .agg((F.sum(bal).cast("double") / F.count(F.lit(1)))
                   .alias("avg_bal")))
    return (
        cust.crossJoin(F.broadcast(thresh))
        .filter(bal.cast("double") > F.col("avg_bal"))
        .join(orders, cust["c_custkey"] == orders["o_custkey"], "left_anti")
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"),
             F.sum(bal).cast("double").alias("total_balance"))
    )


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Important-stock analog (q11 shape): per-part shipped value for
    one nation's suppliers, keeping parts above a fraction of the
    nation's grand total — the HAVING-against-scalar-subquery shape.
    The grand total is a 1-row broadcast (no second scan shuffle:
    Spark computes it from the same per-part aggregate); value math in
    exact decimal, the threshold compare cast to DOUBLE identically on
    both engines so the cut is engine-stable.
    No partsupp table exists in the fixture, so shipped quantity ×
    retail price plays supplycost × availqty (same plan shape)."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part")
    value = (money("l_quantity") * F.col("p_retailprice")
             .cast("decimal(12,2)")).cast("decimal(18,4)")
    per_part = (
        li.join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .filter(F.col("n_name") == "NATION_0")
        .join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy(F.col("p_partkey").alias("part_id"))
        .agg(F.sum(value).alias("part_value_dec"))
    )
    total = per_part.agg(F.sum("part_value_dec").alias("total_value_dec"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value_dec").cast("double")
                > F.col("total_value_dec").cast("double") * F.lit(0.001))
        .select("part_id",
                F.col("part_value_dec").cast("double").alias("part_value"))
    )


def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier-count analog (q16 shape): distinct suppliers observed
    shipping each (brand, type, size) combination, excluding one brand,
    restricting to a size IN-list, and excluding a NOT-IN supplier set
    (low-balance suppliers play q16's complaint suppliers).  The NOT IN
    becomes a broadcast anti join; COUNT(DISTINCT) expands to a
    two-level agg (partial distinct per partition, then merge)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25))
    bad_supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal").cast("double") < 1000.0).select("s_suppkey")
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(bad_supp),
              li["l_suppkey"] == bad_supp["s_suppkey"], "left_anti")
        .groupBy(F.col("p_brand").alias("brand"),
                 F.col("p_type").alias("part_type"),
                 F.col("p_size").cast("long").alias("part_size"))
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


def q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Excess-inventory analog (q20 shape): suppliers that shipped, in
    1996, more than 8% of some widget part's all-time volume — the
    doubly-nested IN-subquery shape, decorrelated into agg-join-agg +
    a semi join back to supplier.  Per-part totals are an
    agg-below-join (small: |parts|); the qualifying supplier-key set
    is tiny and semi-joins the dim, so no fact re-scan."""
    li = load_table(spark, sf_dir, "lineitem")
    part_sel = (load_table(spark, sf_dir, "part")
                .filter(F.col("p_name").like("%widget%"))
                .select("p_partkey"))
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    widget_li = li.join(F.broadcast(part_sel),
                        li["l_partkey"] == part_sel["p_partkey"], "left_semi")
    per_part_total = (widget_li.groupBy(F.col("l_partkey").alias("tp_key"))
                      .agg(F.sum(money("l_quantity")).alias("total_qty_dec")))
    shipped_1996 = (
        widget_li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp")))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(money("l_quantity")).alias("qty_1996_dec"))
    )
    qualifying = (
        shipped_1996.join(F.broadcast(per_part_total),
                          F.col("l_partkey") == F.col("tp_key"))
        .filter(F.col("qty_1996_dec").cast("double")
                > F.lit(0.08) * F.col("total_qty_dec").cast("double"))
        .select("l_suppkey").distinct()
    )
    return (
        supp.join(qualifying, supp["s_suppkey"] == qualifying["l_suppkey"],
                  "left_semi")
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .select(F.col("s_suppkey").alias("supplier_id"),
                F.col("s_name").alias("supplier_name"),
                F.col("n_name").alias("nation_name"))
    )


def daily_order_ship_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer reconciliation (the one join type the rest of the
    surface lacks): daily order counts vs daily shipped-item counts,
    date-grain FULL OUTER JOIN with null-extension classification —
    the ops report that surfaces days with orders but no shipments and
    vice versa.  Scale shape: both sides partial-aggregate to date
    grain BEFORE the join (agg-below-join), so the full-outer join
    runs on bounded day-grain rows, never fact rows."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    od = (orders.groupBy(F.date_trunc("day", F.col("o_orderdate"))
                         .alias("day"))
          .agg(F.count(F.lit(1)).cast("long").alias("n_orders")))
    sd = (li.groupBy(F.date_trunc("day", F.col("l_shipdate")).alias("day"))
          .agg(F.count(F.lit(1)).cast("long").alias("n_shipped_items")))
    status = (F.when(F.col("o.day").isNotNull() & F.col("s.day").isNotNull(),
                     F.lit("both"))
              .when(F.col("o.day").isNotNull(), F.lit("orders_only"))
              .otherwise(F.lit("ships_only")))
    return (od.alias("o")
            .join(sd.alias("s"), F.col("o.day") == F.col("s.day"), "full_outer")
            .select(
                F.coalesce(F.col("o.day"), F.col("s.day")).alias("day"),
                F.coalesce(F.col("n_orders"), F.lit(0)).cast("long")
                .alias("n_orders"),
                F.coalesce(F.col("n_shipped_items"), F.lit(0)).cast("long")
                .alias("n_shipped_items"),
                status.alias("status"),
            ))


_MONEY_REV = ("CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * "
              "(1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4))")

def trend_orders_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group closed-form linear regression (distributed OLS): the
    daily order-count trend per priority, slope/intercept from the
    textbook normal equations — n, Σx, Σy, Σxy, Σx² are ONE partial-
    aggregating groupBy, so a 100 TB fit is a single scan + a
    |groups|-row reduction (the y = a+bx special case of the
    sufficient-statistics pattern every distributed regression uses).
    x (epoch day) and y (daily count) are integers, so every sum is
    EXACT integer arithmetic — the division to double happens once at
    the end, making the result bit-identical cross-engine (no
    summation-order drift).  The oracle computes the same normal
    equations in SQL."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.datediff(F.col("o_orderdate").cast("date"),
                   F.lit("1970-01-01").cast("date")).cast("long").alias("x"))
    daily = (o.groupBy("o_orderpriority", "x")
             .agg(F.count(F.lit(1)).cast("long").alias("y")))
    s = (daily.groupBy("o_orderpriority")
         .agg(F.count(F.lit(1)).cast("long").alias("n"),
              F.sum("x").cast("long").alias("sx"),
              F.sum("y").cast("long").alias("sy"),
              F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
              F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx")))
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    slope = num.cast("double") / den.cast("double")
    intercept = ((F.col("sy").cast("double")
                  - slope * F.col("sx").cast("double"))
                 / F.col("n").cast("double"))
    return s.select(
        F.col("o_orderpriority").alias("priority"),
        F.col("n").alias("n_days"),
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"))


PR_ITERS = 3
#: Fixed-point rank units: 1 rank = 1e10 units.  The whole iteration is
#: EXACT 64-bit integer arithmetic — contribution = half-up integer
#: division of rank units by degree, damped update = 0.15 + 0.85·S as
#: (15·U/100) + (17·S + 10) DIV 20 — so Spark and the SQL oracle agree
#: bit-for-bit with no float-rounding tie behavior in sight (a
#: round(double) formulation lost one row per 10k to engine tie-break
#: differences at the 10th decimal).
PR_UNIT = 10_000_000_000


def pagerank_part_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative PageRank over the bipartite part–supplier shipment
    graph — the message-passing loop every distributed graph engine
    runs (contrib = rank/degree flows along edges, damped sum per
    node), expressed as ``PR_ITERS`` DataFrame join+agg rounds.  Scale
    shape: per iteration ONE join of the edge list against the
    |nodes|-grain rank table and one partial-aggregating groupBy —
    work is O(edges)/iteration, state is O(nodes); the same loop at
    100 TB keys both tables by node and reuses the partitioning
    across iterations (the dup_clusters localCheckpoint pattern caps
    plan growth for long runs).  Ranks run in exact fixed-point
    integer units (see ``PR_UNIT``), so the unrolled SQL oracle
    matches bit-for-bit."""
    from ..caching import scoped_persist

    o = (load_table(spark, sf_dir, "lineitem")
         .select(F.concat(F.lit("p"),
                          F.col("l_partkey").cast("string")).alias("a"),
                 F.concat(F.lit("s"),
                          F.col("l_suppkey").cast("string")).alias("b"))
         .distinct())
    edges = scoped_persist(
        o.unionAll(o.select(F.col("b").alias("a"), F.col("a").alias("b"))))
    deg = edges.groupBy("a").agg(
        F.count(F.lit(1)).cast("long").alias("deg"))
    state = scoped_persist(
        deg.select("a", F.lit(PR_UNIT).cast("long").alias("r"), "deg"))
    for _ in range(PR_ITERS):
        # half-up integer division r/deg: (2r + deg) DIV 2deg
        contrib = (edges
                   .join(state, "a")
                   .select(F.col("b").alias("node"),
                           F.expr("(2 * r + deg) DIV (2 * deg)")
                           .alias("c")))
        ranks = (contrib.groupBy("node")
                 .agg(F.expr(f"{PR_UNIT} DIV 100 * 15"
                             " + (17 * sum(c) + 10) DIV 20")
                      .cast("long").alias("r")))
        state = scoped_persist(
            ranks.select(F.col("node").alias("a"), "r")
            .join(deg, "a").localCheckpoint(eager=True))
    # r_units < 2^53, so the single double division is exact-input and
    # deterministic in both engines
    return state.select(
        F.col("a").alias("node"),
        (F.col("r").cast("double") / F.lit(float(PR_UNIT))).alias("pr"))


#: Hub-part guard for the co-supply projection: a part shared by d
#: suppliers emits d·(d−1)/2 pairs BEFORE the degree-ordered wedge cap
#: can help, so one 10⁴-degree hub would emit ~5·10⁷ rows from the
#: projection join alone.  Parts above this degree are EXCLUDED from
#: the graph — a part supplied by hundreds of suppliers makes every
#: pair of them "co-suppliers", which is near-clique noise, not
#: signal (the same drop-the-hub trade the dedup family's
#: ``_cap_buckets`` makes).  256 bounds the per-part fan-out at ~32k
#: pairs while sitting far above the test data's max degree (52 at
#: sf0.1), so results are unchanged at every test scale.
TRI_MAX_PART_DEG = 256


def _cosupply_pairs(ps: DataFrame,
                    max_part_deg: int = TRI_MAX_PART_DEG) -> DataFrame:
    """Project (part, supplier) incidences to distinct co-supply
    supplier pairs, dropping hub parts whose supplier degree exceeds
    ``max_part_deg`` BEFORE the pairing self-join — the projection's
    fan-out is then bounded at max_part_deg²/2 rows per part by
    construction, instead of deg² on whatever skew the data has."""
    pdeg = (ps.groupBy("p")
            .agg(F.count(F.lit(1)).alias("__pd"))
            .filter(F.col("__pd") <= max_part_deg)
            .select("p"))
    bounded = ps.join(pdeg, "p")
    b = bounded.select(F.col("p"), F.col("s").alias("s2"))
    return (bounded.join(b, "p")
            .filter(F.col("s") < F.col("s2"))
            .select(F.col("s").alias("u"), F.col("s2").alias("v"))
            .distinct())


def supplier_cosupply_triangles(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Per-node triangle counting on the supplier CO-SUPPLY graph
    (suppliers sharing at least one part, projected from the
    lineitem part–supplier pairs) with DEGREE-ORDERED edge
    orientation — the canonical distributed triangle algorithm
    (MPS/Cohen): every edge is directed from its lower-(degree, id)
    endpoint to the higher, wedges pair a vertex's oriented
    out-neighbors, and one closing-edge join verifies each triangle
    EXACTLY once (apex = the triangle's lowest-rank vertex).  The
    orientation is the scale lever: out-degree is bounded by
    O(√edges) on any graph, so the wedge fan-out — the quadratic
    danger on skewed graphs, where one hub would otherwise generate
    deg² wedges — is capped without sampling.  The projection join
    one step earlier has its own hub guard (``TRI_MAX_PART_DEG``,
    capped-pair-count pytest in tests/test_analytics_caps.py).
    Counts are exact integers, so the identical SQL joins give a
    bit-for-bit oracle."""
    from ..caching import scoped_persist

    ps = (load_table(spark, sf_dir, "lineitem")
          .select(F.col("l_partkey").alias("p"),
                  F.col("l_suppkey").cast("long").alias("s"))
          .distinct())
    pairs = scoped_persist(_cosupply_pairs(ps))
    deg = (pairs.select(F.col("u").alias("n"))
           .unionAll(pairs.select(F.col("v").alias("n")))
           .groupBy("n").agg(F.count(F.lit(1)).cast("long").alias("d")))
    e = (pairs
         .join(deg.select(F.col("n").alias("u"), F.col("d").alias("du")),
               "u")
         .join(deg.select(F.col("n").alias("v"), F.col("d").alias("dv")),
               "v"))
    u_first = (F.col("du") < F.col("dv")) \
        | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
    d = scoped_persist(e.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("ddeg")))
    d1 = d.select(F.col("src"), F.col("dst").alias("b"),
                  F.col("ddeg").alias("db"))
    d2 = d.select(F.col("src"), F.col("dst").alias("c"),
                  F.col("ddeg").alias("dc"))
    rank_lt = (F.col("db") < F.col("dc")) \
        | ((F.col("db") == F.col("dc")) & (F.col("b") < F.col("c")))
    wedges = d1.join(d2, "src").filter(rank_lt)
    closing = d.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    tri = wedges.join(closing, ["b", "c"])
    return (tri.select(F.explode(F.array("src", "b", "c")).alias("s_suppkey"))
            .groupBy("s_suppkey")
            .agg(F.count(F.lit(1)).cast("long").alias("n_triangles")))


#: k-core peel: drop nodes of degree < K, remove their edges, repeat.
KCORE_K = 3
KCORE_ITERS = 4


def kcore_part_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative k-core PEELING on the bipartite part–supplier graph
    (the graph-family's density primitive next to triangles and
    PageRank): each round drops every node whose current degree is
    below ``KCORE_K`` and removes its incident edges — low-degree
    fringes peel away in cascades, leaving the densely-connected
    core.  The face runs exactly ``KCORE_ITERS`` rounds (a fixed
    unrolling, so the SQL oracle is the identical exact computation;
    a production run would iterate to fixpoint with the same loop
    body) and returns each surviving node with its end-state degree.
    Scale shape: per round one degree aggregation over the live edge
    list plus two semi joins against the keep set — O(edges)/round,
    the same join-per-iteration budget as PageRank, shrinking as the
    graph peels."""
    from ..caching import scoped_persist

    ps = (load_table(spark, sf_dir, "lineitem")
          .select(F.concat(F.lit("p"),
                           F.col("l_partkey").cast("string")).alias("a"),
                  F.concat(F.lit("s"),
                           F.col("l_suppkey").cast("string")).alias("b"))
          .distinct())
    return kcore_peel(ps, KCORE_K, KCORE_ITERS)


def kcore_peel(undirected: DataFrame, k: int, iters: int) -> DataFrame:
    """``iters`` rounds of k-core peeling over an undirected edge list
    ``(a, b)`` (one row per edge, either orientation): symmetrize,
    then per round keep only nodes with current degree ≥ ``k`` and the
    edges between them.  Returns ``(node, deg)`` — surviving nodes
    with their end-state degrees."""
    from ..caching import scoped_persist

    edges = scoped_persist(undirected.select("a", "b").unionAll(
        undirected.select(F.col("b").alias("a"), F.col("a").alias("b"))))
    for _ in range(iters):
        deg = edges.groupBy("a").agg(F.count(F.lit(1)).alias("d"))
        keep = deg.filter(F.col("d") >= k).select("a")
        edges = scoped_persist(
            edges.join(keep, "a")
            .join(keep.select(F.col("a").alias("b")), "b")
            .select("a", "b").localCheckpoint(eager=True))
    return (edges.groupBy("a")
            .agg(F.count(F.lit(1)).cast("long").alias("deg"))
            .select(F.col("a").alias("node"), "deg"))


def _kcore_oracle() -> str:
    parts = [
        "WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),",
        "e0 AS (SELECT 'p' || CAST(l_partkey AS VARCHAR) AS a,"
        " 's' || CAST(l_suppkey AS VARCHAR) AS b FROM ps"
        " UNION ALL SELECT 's' || CAST(l_suppkey AS VARCHAR),"
        " 'p' || CAST(l_partkey AS VARCHAR) FROM ps)"]
    for i in range(1, KCORE_ITERS + 1):
        parts.append(
            f", k{i} AS (SELECT a FROM e{i-1} GROUP BY a"
            f" HAVING COUNT(*) >= {KCORE_K})")
        parts.append(
            f", e{i} AS (SELECT e.a, e.b FROM e{i-1} e"
            f" JOIN k{i} x ON x.a = e.a JOIN k{i} y ON y.a = e.b)")
    parts.append(
        f" SELECT a AS node, CAST(COUNT(*) AS BIGINT) AS deg"
        f" FROM e{KCORE_ITERS} GROUP BY a")
    return "\n".join(parts)


_PR_ITER_SQL = """
        {out} AS (
            SELECT e.b AS a,
                   CAST(10000000000 // 100 * 15
                        + (17 * SUM((2 * {prev}.r + deg.deg)
                                    // (2 * deg.deg)) + 10) // 20
                        AS BIGINT) AS r
            FROM e
            JOIN {prev} ON e.a = {prev}.a
            JOIN deg ON e.a = deg.a
            GROUP BY e.b
        )"""


#: BFS exploration cap: the co-supply graph is small-world, so six
#: hops reach everything reachable; the cap also bounds the oracle's
#: recursive CTE on cyclic graphs.
BFS_MAX_HOPS = 6


def bfs_supplier_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS hop distances from the minimum-id supplier over the
    co-supply graph — the reachability/radius primitive the graph
    family lacked next to PageRank, triangles and k-core.  Classic
    distributed frontier expansion: per hop, join the frontier with
    the (hub-capped, both-direction) edge list, anti-join out already
    visited vertices, stamp the hop number — each vertex is therefore
    labeled with its MINIMUM distance the first time it is seen, and
    the loop stops at ``BFS_MAX_HOPS`` (or earlier when the frontier
    empties).  ``localCheckpoint`` truncates the per-iteration lineage
    exactly like the PageRank loop.  O(edges) work per hop; the
    frontier/visited sets shuffle on the vertex key only.  The oracle
    is a recursive CTE over the identical edge list with the same hop
    cap — exact integer distances, bit-for-bit."""
    from ..caching import scoped_persist

    ps = (load_table(spark, sf_dir, "lineitem")
          .select(F.col("l_partkey").alias("p"),
                  F.col("l_suppkey").cast("long").alias("s"))
          .distinct())
    pairs = scoped_persist(_cosupply_pairs(ps))
    edges = scoped_persist(
        pairs.select(F.col("u").alias("a"), F.col("v").alias("b"))
        .unionAll(pairs.select(F.col("v").alias("a"),
                               F.col("u").alias("b"))))
    seed = pairs.agg(F.min("u").alias("s"))
    dist = seed.select("s", F.lit(0).cast("int").alias("dist"))
    dist = dist.localCheckpoint()
    frontier = dist.select("s")
    for hop in range(1, BFS_MAX_HOPS + 1):
        nxt = (frontier.join(edges, frontier["s"] == edges["a"])
               .select(F.col("b").alias("s")).distinct()
               .join(dist.select("s"), "s", "left_anti")
               .select("s", F.lit(hop).cast("int").alias("dist"))
               .localCheckpoint())
        if nxt.isEmpty():
            break
        dist = dist.unionByName(nxt).localCheckpoint()
        frontier = nxt.select("s")
    return dist.select(F.col("s").alias("s_suppkey"), "dist")


ORACLE_SQL: dict[str, str] = {
    "bfs_supplier_distance": f"""
        WITH RECURSIVE ps0 AS (
            SELECT DISTINCT l_partkey AS p,
                   CAST(l_suppkey AS BIGINT) AS s
            FROM lineitem
        ),
        pok AS (
            SELECT p FROM ps0 GROUP BY p HAVING COUNT(*) <= 256
        ),
        ps AS (
            SELECT ps0.p, ps0.s FROM ps0 JOIN pok USING (p)
        ),
        pairs AS (
            SELECT DISTINCT a.s AS u, b.s AS v
            FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s
        ),
        edges AS (
            SELECT u AS a, v AS b FROM pairs
            UNION ALL
            SELECT v AS a, u AS b FROM pairs
        ),
        bfs(s, dist) AS (
            SELECT MIN(u), 0 FROM pairs
            UNION
            SELECT e.b, bfs.dist + 1
            FROM bfs JOIN edges e ON e.a = bfs.s
            WHERE bfs.dist < {BFS_MAX_HOPS}
        )
        SELECT CAST(s AS BIGINT) AS s_suppkey,
               CAST(MIN(dist) AS INT) AS dist
        FROM bfs GROUP BY 1
    """,
    "supplier_cosupply_triangles": """
        WITH ps0 AS (
            SELECT DISTINCT l_partkey AS p,
                   CAST(l_suppkey AS BIGINT) AS s
            FROM lineitem
        ),
        pok AS (
            SELECT p FROM ps0 GROUP BY p HAVING COUNT(*) <= 256
        ),
        ps AS (
            SELECT ps0.p, ps0.s FROM ps0 JOIN pok USING (p)
        ),
        pairs AS (
            SELECT DISTINCT a.s AS u, b.s AS v
            FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s
        ),
        deg AS (
            SELECT n, CAST(COUNT(*) AS BIGINT) AS d
            FROM (SELECT u AS n FROM pairs
                  UNION ALL SELECT v AS n FROM pairs)
            GROUP BY n
        ),
        o AS (
            SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v)
                        THEN u ELSE v END AS src,
                   CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v)
                        THEN v ELSE u END AS dst,
                   CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v)
                        THEN dv.d ELSE du.d END AS ddeg
            FROM pairs
            JOIN deg du ON du.n = u
            JOIN deg dv ON dv.n = v
        ),
        tri AS (
            SELECT d1.src, d1.dst AS b, d2.dst AS c
            FROM o d1
            JOIN o d2 ON d1.src = d2.src
                 AND (d1.ddeg < d2.ddeg
                      OR (d1.ddeg = d2.ddeg AND d1.dst < d2.dst))
            JOIN o d3 ON d3.src = d1.dst AND d3.dst = d2.dst
        )
        SELECT s_suppkey, CAST(COUNT(*) AS BIGINT) AS n_triangles
        FROM (SELECT src AS s_suppkey FROM tri
              UNION ALL SELECT b FROM tri
              UNION ALL SELECT c FROM tri)
        GROUP BY s_suppkey
    """,
    "kcore_part_supplier": _kcore_oracle(),
    "pagerank_part_supplier": """
        WITH e0 AS (
            SELECT DISTINCT 'p' || CAST(l_partkey AS VARCHAR) AS a,
                   's' || CAST(l_suppkey AS VARCHAR) AS b
            FROM lineitem
        ),
        e AS (SELECT a, b FROM e0 UNION ALL SELECT b, a FROM e0),
        deg AS (SELECT a, CAST(COUNT(*) AS BIGINT) AS deg
                FROM e GROUP BY a),
        r0 AS (SELECT a, CAST(10000000000 AS BIGINT) AS r FROM deg),
    """ + _PR_ITER_SQL.format(out="r1", prev="r0") + ","
        + _PR_ITER_SQL.format(out="r2", prev="r1") + ","
        + _PR_ITER_SQL.format(out="r3", prev="r2") + """
        SELECT a AS node,
               CAST(r AS DOUBLE) / 10000000000.0 AS pr
        FROM r3
    """,
    "trend_orders_by_priority": """
        WITH daily AS (
            SELECT o_orderpriority,
                   CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
                        AS BIGINT) AS x,
                   CAST(COUNT(*) AS BIGINT) AS y
            FROM orders GROUP BY 1, 2
        ), s AS (
            SELECT o_orderpriority,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(x * y) AS BIGINT) AS sxy,
                   CAST(SUM(x * x) AS BIGINT) AS sxx
            FROM daily GROUP BY 1
        )
        SELECT o_orderpriority AS priority, n AS n_days,
               round(CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope,
               round((CAST(sy AS DOUBLE)
                      - (CAST(n * sxy - sx * sy AS DOUBLE)
                         / CAST(n * sxx - sx * sx AS DOUBLE))
                        * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6)
                   AS intercept
        FROM s
    """,
    "daily_order_ship_reconciliation": """
        WITH od AS (
            SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
                   CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM orders GROUP BY 1
        ),
        sd AS (
            SELECT CAST(date_trunc('day', l_shipdate) AS TIMESTAMP) AS day,
                   CAST(COUNT(*) AS BIGINT) AS n_shipped_items
            FROM lineitem GROUP BY 1
        )
        SELECT COALESCE(od.day, sd.day) AS day,
               COALESCE(od.n_orders, 0) AS n_orders,
               COALESCE(sd.n_shipped_items, 0) AS n_shipped_items,
               CASE WHEN od.day IS NOT NULL AND sd.day IS NOT NULL THEN 'both'
                    WHEN od.day IS NOT NULL THEN 'orders_only'
                    ELSE 'ships_only' END AS status
        FROM od FULL OUTER JOIN sd ON od.day = sd.day
    """,
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
    "q2_cheapest_supplier": """
        WITH offers AS (
            SELECT p_partkey AS product_id, p_name AS product_name,
                   s_suppkey AS supplier_id, s_name AS supplier_name,
                   n_name AS nation_name,
                   MIN(CAST(l_extendedprice AS DECIMAL(12,2))) AS best_price_dec
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE p_size = 15 AND p_type = 'LARGE' AND r_name = 'EUROPE'
            GROUP BY 1, 2, 3, 4, 5
        ),
        ranked AS (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY product_id
                       ORDER BY best_price_dec ASC, supplier_id ASC) AS rn
            FROM offers
        )
        SELECT product_id, product_name, supplier_id, supplier_name,
               nation_name, CAST(best_price_dec AS DOUBLE) AS best_price
        FROM ranked WHERE rn = 1
    """,
    "q7_volume_shipping": f"""
        SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
               CAST(year(l_shipdate) AS BIGINT) AS ship_year,
               CAST(SUM({_MONEY_REV}) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
           OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
        GROUP BY 1, 2, 3
    """,
    "q8_market_share": f"""
        WITH yr AS (
            SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
                   CAST(SUM(CASE WHEN sn.n_name = 'NATION_3'
                            THEN {_MONEY_REV}
                            ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                       AS target_revenue,
                   CAST(SUM({_MONEY_REV}) AS DOUBLE) AS total_revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation cn ON c_nationkey = cn.n_nationkey
            JOIN region ON cn.n_regionkey = r_regionkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation sn ON s_nationkey = sn.n_nationkey
            WHERE r_name = 'AMERICA'
            GROUP BY 1
        )
        SELECT order_year, target_revenue, total_revenue,
               CAST(round(target_revenue / total_revenue, 6) AS DOUBLE)
                   AS mkt_share
        FROM yr
    """,
    "q9_product_profit": """
        SELECT n_name AS nation_name,
               CAST(year(o_orderdate) AS BIGINT) AS order_year,
               CAST(SUM(CAST(
                   CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (1 - CAST(l_discount AS DECIMAL(12,2)))
                        AS DECIMAL(18,6))
                   - CAST(CAST(CAST(p_retailprice AS DECIMAL(12,2))
                               * CAST(0.6 AS DECIMAL(2,1)) AS DECIMAL(18,3))
                          * CAST(l_quantity AS DECIMAL(12,2))
                          AS DECIMAL(18,6))
                   AS DECIMAL(18,6))) AS DOUBLE) AS profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%widget%'
        GROUP BY 1, 2
    """,
    "q13_order_count_distribution": """
        WITH per_cust AS (
            SELECT c_custkey,
                   CAST(COUNT(o_orderkey) AS BIGINT) AS order_count
            FROM customer
            LEFT JOIN orders ON c_custkey = o_custkey
                            AND o_orderstatus <> 'P'
            GROUP BY c_custkey
        )
        SELECT order_count, CAST(COUNT(*) AS BIGINT) AS n_customers
        FROM per_cust GROUP BY order_count
    """,
    "q15_top_supplier": f"""
        WITH per_supp AS (
            SELECT l_suppkey AS supplier_id,
                   SUM({_MONEY_REV}) AS total_rev_dec
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey
        )
        SELECT supplier_id, s_name AS supplier_name,
               CAST(total_rev_dec AS DOUBLE) AS total_revenue
        FROM per_supp
        JOIN supplier ON supplier_id = s_suppkey
        WHERE total_rev_dec = (SELECT MAX(total_rev_dec) FROM per_supp)
    """,
    "q17_small_quantity_revenue": """
        WITH li AS (
            SELECT l_partkey, l_quantity, l_extendedprice
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            WHERE p_brand = 'Brand#5' AND p_type = 'SMALL'
        ),
        avg_qty AS (
            SELECT l_partkey AS avg_part,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                       / COUNT(*) AS avg_quantity
            FROM li GROUP BY l_partkey
        )
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                   / 7.0 AS avg_yearly,
               CAST(COUNT(*) AS BIGINT) AS n_small_lines
        FROM li JOIN avg_qty ON l_partkey = avg_part
        WHERE CAST(l_quantity AS DOUBLE) < 0.2 * avg_quantity
    """,
    "q19_disjunctive_predicates": f"""
        SELECT CAST(SUM({_MONEY_REV}) AS DOUBLE) AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
               AND CAST(l_quantity AS DOUBLE) BETWEEN 1 AND 15)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 20
               AND CAST(l_quantity AS DOUBLE) BETWEEN 10 AND 25)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 15 AND 40
               AND CAST(l_quantity AS DOUBLE) BETWEEN 20 AND 35)
    """,
    "q21_waiting_suppliers": """
        WITH per_order AS (
            SELECT l_orderkey AS order_id,
                   COUNT(DISTINCT l_suppkey) AS n_supp,
                   COUNT(DISTINCT CASE WHEN l_shipdate > o_orderdate
                         + INTERVAL 60 DAY THEN l_suppkey END) AS n_late_supp,
                   MIN(CASE WHEN l_shipdate > o_orderdate
                       + INTERVAL 60 DAY THEN l_suppkey END) AS late_supp
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY l_orderkey
            HAVING COUNT(DISTINCT l_suppkey) > 1
               AND COUNT(DISTINCT CASE WHEN l_shipdate > o_orderdate
                         + INTERVAL 60 DAY THEN l_suppkey END) = 1
        )
        SELECT late_supp AS supplier_id, s_name AS supplier_name,
               CAST(COUNT(*) AS BIGINT) AS numwait
        FROM per_order
        JOIN supplier ON late_supp = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_0'
        GROUP BY 1, 2
        ORDER BY numwait DESC, supplier_id ASC
        LIMIT 20
    """,
    "q22_idle_customers": """
        WITH thresh AS (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                       / COUNT(*) AS avg_bal
            FROM customer WHERE CAST(c_acctbal AS DECIMAL(12,2)) > 0
        )
        SELECT n_name AS nation_name,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                   AS total_balance
        FROM customer, thresh
        JOIN nation ON c_nationkey = n_nationkey
        WHERE CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) > avg_bal
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '1999-01-01')
        GROUP BY n_name
    """,
    "q11_important_parts": """
        WITH per_part AS (
            SELECT l_partkey AS part_id,
                   CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(12,2)) *
                                 CAST(p_retailprice AS DECIMAL(12,2))
                                 AS DECIMAL(18,4))) AS DECIMAL(38,4))
                       AS part_value_dec
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation   ON s_nationkey = n_nationkey
            JOIN part     ON l_partkey = p_partkey
            WHERE n_name = 'NATION_0'
            GROUP BY l_partkey
        )
        SELECT part_id, CAST(part_value_dec AS DOUBLE) AS part_value
        FROM per_part
        WHERE CAST(part_value_dec AS DOUBLE) >
              (SELECT CAST(SUM(part_value_dec) AS DOUBLE) FROM per_part)
              * 0.001
    """,
    "q16_supplier_part_counts": """
        SELECT p_brand AS brand, p_type AS part_type,
               CAST(p_size AS BIGINT) AS part_size,
               CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1'
          AND p_size IN (1, 5, 10, 15, 20, 25)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                WHERE CAST(s_acctbal AS DOUBLE) < 1000.0)
        GROUP BY 1, 2, 3
    """,
    "q20_excess_shippers": """
        WITH widget_li AS (
            SELECT * FROM lineitem
            WHERE l_partkey IN (SELECT p_partkey FROM part
                                WHERE p_name LIKE '%widget%')
        ), per_part_total AS (
            SELECT l_partkey,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)))
                        AS DECIMAL(38,2)) AS total_qty_dec
            FROM widget_li GROUP BY l_partkey
        ), shipped_1996 AS (
            SELECT l_suppkey, l_partkey,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)))
                        AS DECIMAL(38,2)) AS qty_1996_dec
            FROM widget_li
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1997-01-01'
            GROUP BY l_suppkey, l_partkey
        )
        SELECT s_suppkey AS supplier_id, s_name AS supplier_name,
               n_name AS nation_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        WHERE s_suppkey IN (
              SELECT s.l_suppkey
              FROM shipped_1996 s
              JOIN per_part_total t ON s.l_partkey = t.l_partkey
              WHERE CAST(s.qty_1996_dec AS DOUBLE)
                    > 0.08 * CAST(t.total_qty_dec AS DOUBLE))
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
    "trend_orders_by_priority": trend_orders_by_priority,
    "pagerank_part_supplier": pagerank_part_supplier,
    "kcore_part_supplier": kcore_part_supplier,
    "supplier_cosupply_triangles": supplier_cosupply_triangles,
    "bfs_supplier_distance": bfs_supplier_distance,
    "q1_pricing_summary": q1_pricing_summary,
    "q3_top_orders": q3_top_orders,
    "q5_region_volume": q5_region_volume,
    "q10_returned_revenue": q10_returned_revenue,
    "q12_priority_by_status": q12_priority_by_status,
    "q14_promo_effect": q14_promo_effect,
    "q18_large_orders": q18_large_orders,
    "q2_cheapest_supplier": q2_cheapest_supplier,
    "q7_volume_shipping": q7_volume_shipping,
    "q8_market_share": q8_market_share,
    "q9_product_profit": q9_product_profit,
    "q13_order_count_distribution": q13_order_count_distribution,
    "q15_top_supplier": q15_top_supplier,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q19_disjunctive_predicates": q19_disjunctive_predicates,
    "q21_waiting_suppliers": q21_waiting_suppliers,
    "q22_idle_customers": q22_idle_customers,
    "q11_important_parts": q11_important_parts,
    "q16_supplier_part_counts": q16_supplier_part_counts,
    "q20_excess_shippers": q20_excess_shippers,
    "daily_order_ship_reconciliation": daily_order_ship_reconciliation,
}
