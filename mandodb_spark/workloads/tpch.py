"""TPC-H-style declared queries over the testdata star schema.

The reference has no joins or numeric aggregation (SURVEY.md §2.5) — these
queries prove the engine is a superset, not a port: multi-way joins with
broadcast of small dimensions, partial/final aggregation, sort+limit.

Scale notes: region/nation/customer/supplier are broadcast-joined (small
dims); only orders⋈lineitem shuffles on the join key.  All aggregates are
rounded and counts cast BIGINT for oracle comparability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import load


def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: pricing summary report (scan + partial/final hash agg)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.to_date("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 2
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


TPCH_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(CAST(sum(l_quantity) AS DOUBLE), 2) AS sum_qty,
       round(CAST(sum(l_extendedprice) AS DOUBLE), 2) AS sum_base_price,
       round(CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE), 2) AS sum_disc_price,
       round(CAST(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS DOUBLE), 2) AS sum_charge,
       round(CAST(avg(l_quantity) AS DOUBLE), 4) AS avg_qty,
       round(CAST(avg(l_extendedprice) AS DOUBLE), 4) AS avg_price,
       round(CAST(avg(l_discount) AS DOUBLE), 4) AS avg_disc,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: shipping priority — 3-way join + top-10 with a total order.

    customer is broadcast (small side); the orders⋈lineitem join shuffles
    on orderkey.  The limit's order is fully deterministic:
    (revenue desc, o_orderkey) — required for cross-engine value-hash match.
    """
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(F.to_date("o_orderdate") < F.lit("1996-07-01"))
    li = load(spark, sf_dir, "lineitem").filter(F.to_date("l_shipdate") > F.lit("1996-07-01"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


TPCH_Q3_SQL = """
SELECT o_orderkey, strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS o_orderdate,
       round(CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND CAST(o_orderdate AS DATE) < DATE '1996-07-01'
  AND CAST(l_shipdate AS DATE) > DATE '1996-07-01'
GROUP BY o_orderkey, strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d')
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: local-supplier revenue by nation — 6-way join, all
    dimensions broadcast, one shuffle join on orderkey."""
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders").filter(
        (F.to_date("o_orderdate") >= F.lit("1996-01-01")) & (F.to_date("o_orderdate") < F.lit("1997-01-01"))
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


TPCH_Q5_SQL = """
SELECT n_name,
       round(CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
  AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'
GROUP BY n_name
"""


def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: forecasting revenue change — pure pushed-down filter + agg."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.to_date("l_shipdate") >= F.lit("1996-01-01"))
            & (F.to_date("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount").between(0.02, 0.08))
            & (F.col("l_quantity") < 25)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


TPCH_Q6_SQL = """
SELECT round(CAST(sum(l_extendedprice * l_discount) AS DOUBLE), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
  AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
  AND l_discount BETWEEN 0.02 AND 0.08
  AND l_quantity < 25
"""


def tpch_orders_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-status rollup with exact median — percentile parity check."""
    orders = load(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
        F.round(F.percentile(F.col("o_totalprice"), F.lit(0.5)), 4).alias("median_price"),
    )


TPCH_ORDERS_STATUS_SQL = """
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS total,
       round(CAST(quantile_cont(o_totalprice, 0.5) AS DOUBLE), 4) AS median_price
FROM orders
GROUP BY o_orderstatus
"""


def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4: order-priority checking — EXISTS rewritten as a left-semi
    join (the shipdate>orderdate conjunct rides the join condition, so the
    probe side never materializes matched lineitems)."""
    orders = load(spark, sf_dir, "orders").filter(
        (F.to_date("o_orderdate") >= F.lit("1996-07-01")) & (F.to_date("o_orderdate") < F.lit("1996-10-01"))
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey) & (F.to_date(li.l_shipdate) > F.to_date(orders.o_orderdate)),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


TPCH_Q4_SQL = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders
WHERE CAST(o_orderdate AS DATE) >= DATE '1996-07-01'
  AND CAST(o_orderdate AS DATE) < DATE '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE))
GROUP BY o_orderpriority
"""


def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: volume shipping between two nations — the classic
    multi-role dimension pattern (nation joined twice under different
    aliases), both broadcast; revenue by (supp nation, cust nation, year)."""
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    supp = load(spark, sf_dir, "supplier")
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.to_date("l_shipdate") >= F.lit("1996-01-01")) & (F.to_date("l_shipdate") < F.lit("1998-01-01"))
    )
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2") | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


TPCH_Q7_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(CAST(l_shipdate AS DATE)) AS BIGINT) AS l_year,
       round(CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
  AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY n1.n_name, n2.n_name, year(CAST(l_shipdate AS DATE))
"""


def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: national market share — conditional-aggregation ratio per
    year over a 7-way join (every dimension broadcast, one orderkey
    shuffle)."""
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    supp = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").filter(
        (F.to_date("o_orderdate") >= F.lit("1996-01-01")) & (F.to_date("o_orderdate") < F.lit("1998-01-01"))
    )
    cust = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(region), F.col("c_rk") == region.r_regionkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_1", vol).otherwise(F.lit(0.0))) / F.sum(vol),
                4,
            ).alias("mkt_share")
        )
    )


TPCH_Q8_SQL = """
SELECT CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS o_year,
       round(CAST(sum(CASE WHEN n2.n_name = 'NATION_1'
                           THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
                  / sum(l_extendedprice * (1 - l_discount)) AS DOUBLE), 4) AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
  AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
  AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
GROUP BY year(CAST(o_orderdate AS DATE))
"""


def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: top supplier(s) — revenue view + max-of-aggregate scalar
    subquery (the classic "equal to the max" pattern)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.to_date("l_shipdate") >= F.lit("1996-01-01")) & (F.to_date("l_shipdate") < F.lit("1996-04-01"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("mx"))
    supp = load(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(supp), F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


TPCH_Q15_SQL = """
WITH revenue AS (
    SELECT l_suppkey AS supplier_no,
           round(CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE), 2) AS total_revenue
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
      AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16: supplier count by part attributes — NOT IN anti-join
    against a blacklist subquery + distinct count."""
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & (F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
    )
    # No pre-join (l_partkey, l_suppkey) DISTINCT: the final countDistinct
    # dedups suppliers per group anyway (p_partkey is unique, so the
    # broadcast join cannot multiply pairs) — the spec's inner DISTINCT
    # would shuffle the whole pair relation before the part filter prunes
    # it (measured 2.5× end-to-end at sf0.1).
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    # blacklist: suppliers with below-median account balance (stand-in for
    # the spec's complaint-comment filter, which needs the absent s_comment)
    bad = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


TPCH_Q16_SQL = """
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pl
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: small-quantity-order revenue — correlated scalar subquery
    (per-part average quantity) decorrelated into an aggregate + join, the
    rewrite Catalyst itself performs for correlated subqueries."""
    part = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    li = load(spark, sf_dir, "lineitem")
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap")).agg(
        (F.avg("l_quantity") * 0.8).alias("qty_cut")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(avg_qty, li.l_partkey == F.col("ap"))
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


TPCH_Q17_SQL = """
SELECT round(CAST(sum(l_extendedprice) / 7.0 AS DOUBLE), 2) AS avg_yearly,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem l
JOIN part ON l.l_partkey = p_partkey
WHERE p_brand = 'Brand#3'
  AND l_quantity < (SELECT 0.8 * avg(l_quantity) FROM lineitem
                    WHERE l_partkey = l.l_partkey)
"""


def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: returned-item reporting — revenue lost to returns per
    customer, top 20.  customer+nation broadcast; one shuffle on orderkey."""
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders").filter(
        (F.to_date("o_orderdate") >= F.lit("1996-01-01")) & (F.to_date("o_orderdate") < F.lit("1996-04-01"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            # round(.,1): a sum landing exactly on a .xx5 boundary rounds
            # differently per engine at round(.,2) (hit at sf0.01)
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 1).alias("revenue"),
            F.round(F.first("c_acctbal"), 2).alias("c_acctbal"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


TPCH_Q10_SQL = """
SELECT c_custkey, c_name, n_name,
       round(CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE), 1) AS revenue,
       round(CAST(any_value(c_acctbal) AS DOUBLE), 2) AS c_acctbal
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
  AND CAST(o_orderdate AS DATE) < DATE '1996-04-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: customer order-count distribution — LEFT OUTER join
    (customers with zero orders must survive) + two-level aggregation."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(~F.col("o_orderpriority").startswith("4"))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


TPCH_Q13_SQL = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND NOT starts_with(o_orderpriority, '4')
      GROUP BY c_custkey) c_orders
GROUP BY c_count
"""


def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promotion effect — conditional aggregation over a
    broadcast part join (promo revenue share of one ship-month)."""
    part = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.to_date("l_shipdate") >= F.lit("1996-03-01")) & (F.to_date("l_shipdate") < F.lit("1996-04-01"))
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0.0)))
                / F.sum(disc),
                4,
            ).alias("promo_revenue_pct")
        )
    )


TPCH_Q14_SQL = """
SELECT round(CAST(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                   THEN l_extendedprice * (1 - l_discount)
                                   ELSE 0.0 END)
                  / sum(l_extendedprice * (1 - l_discount)) AS DOUBLE), 4) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE CAST(l_shipdate AS DATE) >= DATE '1996-03-01'
  AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
"""


def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: large-volume customers — HAVING over a grouped subquery,
    re-joined to orders/customer (the classic agg→semi pattern)."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name", "c_custkey", "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"), "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


TPCH_Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey,
       strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS o_orderdate,
       round(CAST(o_totalprice AS DOUBLE), 2) AS o_totalprice, sum_qty
FROM (SELECT l_orderkey, round(CAST(sum(l_quantity) AS DOUBLE), 2) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING round(CAST(sum(l_quantity) AS DOUBLE), 2) > 150) big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: discounted revenue — OR of conjunctive brand/size/qty
    bands; one broadcast join, predicate stays in whole-stage codegen."""
    part = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    band = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size").between(1, 10) & F.col("l_quantity").between(1, 15)))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size").between(1, 20) & F.col("l_quantity").between(10, 25)))
        | ((F.col("p_brand") == "Brand#5") & (F.col("p_size").between(1, 30) & F.col("l_quantity").between(20, 35)))
    )
    return j.filter(band).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


TPCH_Q19_SQL = """
SELECT round(CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 15)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 10 AND 25)
   OR (p_brand = 'Brand#5' AND p_size BETWEEN 1 AND 30 AND l_quantity BETWEEN 20 AND 35)
"""


def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22: global sales opportunity — scalar subquery (avg acctbal)
    broadcast as a 1-row cross join + LEFT ANTI join against orders."""
    cust = load(spark, sf_dir, "customer")
    # "no recent orders" (2000+) — every customer has *some* order at the
    # test SFs, so an unrestricted anti-join would be vacuously empty
    orders = load(spark, sf_dir, "orders").filter(F.to_date("o_orderdate") >= F.lit("2000-01-01"))
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal").alias("avg_bal"))
    rich = cust.join(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("avg_bal"))
    no_orders = rich.join(orders, rich.c_custkey == orders.o_custkey, "left_anti")
    return no_orders.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("numcust"),
        F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
    )


TPCH_Q22_SQL = """
SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
       round(CAST(sum(c_acctbal) AS DOUBLE), 2) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND CAST(o_orderdate AS DATE) >= DATE '2000-01-01')
GROUP BY c_nationkey
"""


def tpch_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window functions (absent in the reference, free in Spark): top-3
    customers per market segment by lifetime order value — join → agg →
    row_number over a partitioned window."""
    from pyspark.sql import Window

    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    totals = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment", "c_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("lifetime_value"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("lifetime_value").desc(), F.col("c_custkey"))
    return totals.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 3)


TPCH_WINDOW_RANK_SQL = """
SELECT * FROM (
  SELECT c_mktsegment, c_custkey,
         round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS lifetime_value,
         CAST(row_number() OVER (PARTITION BY c_mktsegment
                                 ORDER BY round(CAST(sum(o_totalprice) AS DOUBLE), 2) DESC, c_custkey) AS INT) AS rk
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY c_mktsegment, c_custkey
) WHERE rk <= 3
"""


def tpch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregation (absent in the reference): pricing summary with
    subtotals and a grand total; NULL group keys coalesced to 'ALL' so the
    cross-engine hash is stable."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("total_price"), F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("l_linestatus"),
            "total_price", "n",
        )
    )


TPCH_ROLLUP_SQL = """
SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
       coalesce(l_linestatus, 'ALL') AS l_linestatus,
       round(CAST(sum(l_extendedprice) AS DOUBLE), 2) AS total_price,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (adapted): product-type profit by nation and year.

    Deviation: the testdata has no partsupp table, so profit =
    l_extendedprice·(1−l_discount) without the ps_supplycost·l_quantity
    term; the join/aggregation shape (part name filter → 4-way join →
    group by (nation, year) → sort) is the spec's.  part and the
    supplier→nation chain broadcast; only lineitem shuffles.
    """
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year(F.col("l_shipdate")).cast("long").alias("o_year"),
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_profit"
            )
        )
        .orderBy("nation", F.col("o_year").desc())
    )


TPCH_Q9_SQL = """
SELECT n_name AS nation,
       CAST(year(CAST(l_shipdate AS DATE)) AS BIGINT) AS o_year,
       round(CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE), 2) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""


def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (adapted): late-shipment classification by order priority.

    Deviation: lineitem has no l_shipmode/l_commitdate/l_receiptdate, so
    the mode bucket is 'late' = shipped > 90 days after o_orderdate, and
    the priority split keeps the spec's urgent-vs-other conditional
    aggregation.  One orderkey shuffle; the counts are conditional sums
    evaluated map-side.
    """
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    late = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")) > 90
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.when(late, "LATE").otherwise("ONTIME").alias("ship_bucket"))
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(urgent, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
        .orderBy("ship_bucket")
    )


TPCH_Q12_SQL = """
SELECT CASE WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) > 90
            THEN 'LATE' ELSE 'ONTIME' END AS ship_bucket,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
           AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT)
           AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
ORDER BY ship_bucket
"""


def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (adapted): suppliers who alone shipped late on
    multi-supplier orders — the spec's EXISTS / NOT-EXISTS pattern.

    Deviation: 'late' = shipped > 90 days after o_orderdate (no
    l_receiptdate/l_commitdate in the testdata); the relational shape is
    the spec's: a late line l1, EXISTS another supplier's line on the
    same order (left-semi), NOT EXISTS another supplier's late line on
    the same order (left-anti), count by supplier, top 10.  supplier/
    nation broadcast; the semi/anti joins shuffle on orderkey only.
    """
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    s = load(spark, sf_dir, "supplier")
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")) > 90)
        .select("l_orderkey", "l_suppkey", "o_orderdate")
    )
    l1 = late.alias("l1")
    others = li.select("l_orderkey", "l_suppkey").alias("l2")
    other_exists = l1.join(
        others,
        (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
        "left_semi",
    )
    late_others = late.select("l_orderkey", "l_suppkey").alias("l3")
    alone_late = other_exists.join(
        late_others,
        (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
        "left_anti",
    )
    return (
        alone_late.join(F.broadcast(s), F.col("l1.l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.countDistinct("l1.l_orderkey").cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )


TPCH_Q21_SQL = """
WITH late AS (
    SELECT l_orderkey, l_suppkey
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) > 90
)
SELECT s_name, CAST(count(DISTINCT l1.l_orderkey) AS BIGINT) AS numwait
FROM late l1
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
)
AND NOT EXISTS (
    SELECT 1 FROM late l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 10
"""


QUERIES = {
    "tpch_q1": tpch_q1,
    "tpch_q3": tpch_q3,
    "tpch_q5": tpch_q5,
    "tpch_q4": tpch_q4,
    "tpch_q6": tpch_q6,
    "tpch_q7": tpch_q7,
    "tpch_q8": tpch_q8,
    "tpch_q15": tpch_q15,
    "tpch_q16": tpch_q16,
    "tpch_q17": tpch_q17,
    "tpch_q10": tpch_q10,
    "tpch_q13": tpch_q13,
    "tpch_q14": tpch_q14,
    "tpch_q18": tpch_q18,
    "tpch_q19": tpch_q19,
    "tpch_q22": tpch_q22,
    "tpch_q9": tpch_q9,
    "tpch_q12": tpch_q12,
    "tpch_q21": tpch_q21,
    "tpch_window_rank": tpch_window_rank,
    "tpch_rollup": tpch_rollup,
    "tpch_orders_status": tpch_orders_status,
}

ORACLES = {
    "tpch_q1": TPCH_Q1_SQL,
    "tpch_q3": TPCH_Q3_SQL,
    "tpch_q4": TPCH_Q4_SQL,
    "tpch_q5": TPCH_Q5_SQL,
    "tpch_q6": TPCH_Q6_SQL,
    "tpch_q7": TPCH_Q7_SQL,
    "tpch_q8": TPCH_Q8_SQL,
    "tpch_q15": TPCH_Q15_SQL,
    "tpch_q16": TPCH_Q16_SQL,
    "tpch_q17": TPCH_Q17_SQL,
    "tpch_q10": TPCH_Q10_SQL,
    "tpch_q13": TPCH_Q13_SQL,
    "tpch_q14": TPCH_Q14_SQL,
    "tpch_q18": TPCH_Q18_SQL,
    "tpch_q19": TPCH_Q19_SQL,
    "tpch_q22": TPCH_Q22_SQL,
    "tpch_q9": TPCH_Q9_SQL,
    "tpch_q12": TPCH_Q12_SQL,
    "tpch_q21": TPCH_Q21_SQL,
    "tpch_window_rank": TPCH_WINDOW_RANK_SQL,
    "tpch_rollup": TPCH_ROLLUP_SQL,
    "tpch_orders_status": TPCH_ORDERS_STATUS_SQL,
}


#: Columns profiled by the data-quality query (types chosen to render
#: identically as strings in Spark and DuckDB: ints + strings + a double
#: whose values are exact halves).
PROFILE_COLS = ["l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_linestatus"]


def tpch_profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling over lineitem (nulls / exact cardinality / range)
    — the data-quality pass every curation pipeline fronts its tables
    with.  Exact mode plans one column-pruned single-distinct aggregate
    branch per column, unioned (fully parallel two-phase aggs; see
    operators/profile.py for why the one-agg multi-distinct form is a
    serial-reducer trap)."""
    from ..operators.profile import profile_table

    li = load(spark, sf_dir, "lineitem")
    return profile_table(li, PROFILE_COLS)


def _profile_sql() -> str:
    from ..operators.profile import profile_table_sql

    return profile_table_sql("lineitem", PROFILE_COLS)


TPCH_PROFILE_SQL = _profile_sql()

QUERIES["tpch_profile_lineitem"] = tpch_profile_lineitem
ORACLES["tpch_profile_lineitem"] = TPCH_PROFILE_SQL


# ---- round 5: the three partsupp-dependent queries, adapted ----------------
# The testdata has no partsupp table; as with q16, lineitem's
# (l_partkey, l_suppkey) pairs stand in for the part-supplier relation and
# unit price (l_extendedprice / l_quantity) for ps_supplycost.  The SHAPES
# are the spec's — correlated per-part minimum (q2), group-by vs global
# scalar threshold (q11), nested semi-join chain (q20) — and each oracle
# mirrors the adapted semantics exactly.


def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (adapted): minimum-cost supplier per part in EUROPE.

    Cost of a (part, supplier) pair = min unit price across its lineitems;
    keep the pairs achieving their part's EUROPE-wide minimum.  The
    correlated `MIN(ps_supplycost)` subquery becomes: aggregate the pair
    relation once, take the per-part min over it, broadcast-join back
    (the post-part-filter pair table is tiny).  supplier/nation/region are
    broadcast; only the lineitem pair aggregation shuffles.  No LIMIT 100:
    float-cost ties would make the cut nondeterministic across engines."""
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nation = load(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    supp = load(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 10) & (F.col("p_type") == "LARGE")
    )
    li = load(spark, sf_dir, "lineitem")
    pairs = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_partkey", "p_name", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    best = pairs.groupBy(F.col("p_partkey").alias("bp")).agg(
        F.min("cost").alias("min_cost")
    )
    return (
        pairs.join(
            F.broadcast(best),
            (pairs.p_partkey == F.col("bp")) & (pairs.cost == F.col("min_cost")),
        )
        .select(
            # cost stays unrounded: min() of identically-computed doubles is
            # bit-identical across engines, while round() at 4dp diverges on
            # the exact-decimal ties unit-price division produces (Spark
            # rounds the shortest decimal repr, DuckDB the binary value).
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "cost",
        )
    )


TPCH_Q2_SQL = """
WITH pairs AS (
    SELECT p_partkey, p_name, l_suppkey,
           min(l_extendedprice / l_quantity) AS cost
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_size <= 10 AND p_type = 'LARGE'
    GROUP BY p_partkey, p_name, l_suppkey
),
eu AS (
    SELECT s_suppkey, s_name, s_acctbal, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name, cost
FROM pairs JOIN eu ON l_suppkey = s_suppkey
WHERE cost = (
    SELECT min(p2.cost) FROM pairs p2 JOIN eu e2 ON p2.l_suppkey = e2.s_suppkey
    WHERE p2.p_partkey = pairs.p_partkey
)
"""


def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (adapted): important stock — per-part supplied value from
    one nation's suppliers vs a global-threshold scalar.

    Value = sum(l_extendedprice * (1 - l_discount)) over NATION_7's
    suppliers' lineitems; keep parts whose value exceeds twice the
    mean per-part value (scale-invariant where a fixed fraction of the
    total empties out as the part count grows with SF).  The spec's scalar subquery is the classic tiny
    broadcast-nested-loop probe: a 1-row global aggregate joined against
    the per-part aggregate (same deliberate BNLJ pattern the plan audit
    allowlists).  One shuffle for the per-part aggregation; the 1-row
    threshold never shuffles the fact side."""
    nation = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    supp = load(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    li = load(spark, sf_dir, "lineitem")
    # decimal(18,4) accumulation: the products are exact 4dp decimals, so
    # the sum is order-independent and engine-identical — a double sum
    # lands on .005 rounding ties (same exact-decimal-data trap as
    # stream_enrich_dual; see that query's docstring)
    national = li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey).select(
        "l_partkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .cast("decimal(18,4)").alias("val"),
    )
    per_part = national.groupBy("l_partkey").agg(F.sum("val").alias("value"))
    # ADVICE r5: DuckDB's avg over DECIMAL returns DOUBLE, so the inclusion
    # threshold must be compared at the SAME precision on both sides —
    # cast the exact per-part sum and the doubled mean to DOUBLE here,
    # mirroring the oracle's CAST, or a value within double-epsilon of
    # exactly twice the mean could flip inclusion between engines.
    threshold = per_part.agg(
        (F.avg(F.col("value").cast("double")) * 2).alias("thr")
    )
    return (
        per_part.join(F.broadcast(threshold))
        .filter(F.col("value").cast("double") > F.col("thr"))
        .select(
            "l_partkey",
            F.round(F.col("value").cast("double"), 2).alias("value"),
        )
    )


TPCH_Q11_SQL = """
WITH national AS (
    SELECT l_partkey,
           CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS val
    FROM lineitem
    WHERE l_suppkey IN (
        SELECT s_suppkey FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_7'
    )
),
per_part AS (
    SELECT l_partkey, sum(val) AS value FROM national GROUP BY l_partkey
)
SELECT l_partkey, round(CAST(value AS DOUBLE), 2) AS value
FROM per_part
WHERE CAST(value AS DOUBLE) > (SELECT avg(CAST(value AS DOUBLE)) * 2 FROM per_part)
"""


def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (adapted): potential part promotion — ASIA-region suppliers
    who shipped more than 20 units of any 'small *' part in 1996.

    The spec's nested IN-subquery chain (supplier IN partsupp IN part,
    availqty vs half the year's shipments) becomes: part-name filter
    broadcast into the lineitem scan, per-(part, supplier) quantity
    aggregate with a HAVING threshold, then a LEFT SEMI join onto the
    region's suppliers — the fact table is scanned once, filters pushed,
    and no supplier row duplicates.  The absent ps_availqty is replaced
    by the constant threshold 20."""
    part = load(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    li = load(spark, sf_dir, "lineitem").filter(
        (F.to_date("l_shipdate") >= F.lit("1996-01-01"))
        & (F.to_date("l_shipdate") < F.lit("1997-01-01"))
    )
    heavy = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 20)
        .select("l_suppkey")
    )
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    supp = load(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return supp.join(
        heavy, supp.s_suppkey == heavy.l_suppkey, "left_semi"
    ).select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))


TPCH_Q20_SQL = """
SELECT s_name, round(CAST(s_acctbal AS DOUBLE), 2) AS s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_name LIKE 'small%'
        AND CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
        AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
      GROUP BY l_partkey, l_suppkey
      HAVING sum(l_quantity) > 20
  )
"""

QUERIES["tpch_q2"] = tpch_q2
ORACLES["tpch_q2"] = TPCH_Q2_SQL
QUERIES["tpch_q11"] = tpch_q11
ORACLES["tpch_q11"] = TPCH_Q11_SQL
QUERIES["tpch_q20"] = tpch_q20
ORACLES["tpch_q20"] = TPCH_Q20_SQL
