"""Relational coverage, batch 3 — more TPC-H-shaped plans covering the
remaining operator shapes: EXISTS-semi, conditional aggregation,
HAVING, OR-of-conjunctions filters, anti-join + scalar subquery,
range window frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from burla_spark.functions.numeric import dec, money_avg, money_sum
from burla_spark.plans.base import QuerySpec
from burla_spark.sources.tables import load_table

D12 = "decimal(12,4)"


# ---------------------------------------------------------------------------
# q4 shape — order priority checking: EXISTS (semi join) + count.
# ---------------------------------------------------------------------------
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity") > 40
    )
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_quantity > 40)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# q12 shape — conditional aggregation (CASE inside SUM) after a join.
# ---------------------------------------------------------------------------
def q12_priority_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
    ).otherwise(0)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(high).cast("long").alias("high_line_count"),
            F.sum(1 - high).cast("long").alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


Q12_SQL = """
SELECT l_linestatus,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


# ---------------------------------------------------------------------------
# q14 shape — promo revenue share: conditional numerator / total.
# ---------------------------------------------------------------------------
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-06-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    disc_price = F.col("l_extendedprice").cast(D12) * (
        F.lit(1).cast(D12) - F.col("l_discount").cast(D12)
    ).cast(D12)
    promo = F.when(F.col("p_type") == "PROMO", disc_price).otherwise(
        F.lit(0).cast("decimal(25,8)")
    )
    return l.join(p, l.l_partkey == p.p_partkey).agg(
        F.round(F.sum(promo), 2).cast("double").alias("promo_revenue"),
        F.round(F.sum(disc_price), 2).cast("double").alias("total_revenue"),
        (
            F.round(F.sum(promo), 2).cast("double")
            / F.round(F.sum(disc_price), 2).cast("double")
            * 100.0
        ).alias("promo_pct"),
    )


Q14_SQL = """
WITH t AS (
  SELECT
    CASE WHEN p_type = 'PROMO'
         THEN CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)) AS DECIMAL(12,4))
         ELSE CAST(0 AS DECIMAL(25,8)) END AS promo,
    CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)) AS DECIMAL(12,4)) AS dp
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-06-01'
    AND l_shipdate < TIMESTAMP '1997-07-01'
)
SELECT
  CAST(ROUND(SUM(promo), 2) AS DOUBLE) AS promo_revenue,
  CAST(ROUND(SUM(dp), 2) AS DOUBLE) AS total_revenue,
  CAST(ROUND(SUM(promo), 2) AS DOUBLE) / CAST(ROUND(SUM(dp), 2) AS DOUBLE) * 100.0 AS promo_pct
FROM t
"""


# ---------------------------------------------------------------------------
# q18 shape — large-volume customers: HAVING on a grouped join.
# ---------------------------------------------------------------------------
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(money_sum("l_quantity", "total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
        .orderBy(F.desc("total_qty"), "o_orderkey")
        .limit(20)
    )


Q18_SQL = """
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
FROM (
  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) > 150
) big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total_qty DESC, o_orderkey
LIMIT 20
"""


# ---------------------------------------------------------------------------
# q19 shape — OR of conjunctive predicates across a join (tests
# disjunction pushdown / join-condition splitting).
# ---------------------------------------------------------------------------
def q19_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice").cast(D12) * (
        F.lit(1).cast(D12) - F.col("l_discount").cast(D12)
    ).cast(D12)
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size").between(1, 15)) & (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 20))
        | ((F.col("p_brand") == "Brand#12") & (F.col("p_size").between(10, 25)) & (F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 30))
        | ((F.col("p_brand") == "Brand#23") & (F.col("p_size").between(20, 40)) & (F.col("l_quantity") >= 20) & (F.col("l_quantity") <= 50))
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.round(F.sum(disc_price), 2).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


Q19_SQL = """
SELECT
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)) AS DECIMAL(12,4))), 2) AS DOUBLE) AS revenue,
  COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#12' AND p_size BETWEEN 10 AND 25 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 20 AND 40 AND l_quantity BETWEEN 20 AND 50)
"""


# ---------------------------------------------------------------------------
# q22 shape — anti join + scalar subquery (global average).
# ---------------------------------------------------------------------------
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    # "idle" = no premium order (>375k): the synthetic fixture gives
    # every customer at least one order, so the classic Q22 no-orders
    # anti-join is vacuously empty — anti-join a filtered build side
    # instead (same plan shape, non-degenerate answer at every SF).
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 375000)
    # scalar subquery as crossJoin(broadcast(1-row agg)) — one lazy
    # plan, no driver round-trip, and the filter stays pushable.
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        money_avg("c_acctbal", "__avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            money_sum("c_acctbal", "total_bal"),
        )
        .orderBy("c_mktsegment")
    )


Q22_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_bal
FROM customer
WHERE c_acctbal > (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / COUNT(c_acctbal)
    FROM customer WHERE c_acctbal > 0
  )
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 375000)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# range window frames (rangeBetween — value-based, not row-based)
# ---------------------------------------------------------------------------
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders within ±5000 of each order's totalprice (same status):
    value-range frame, the complement of the rows-frame running sum."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    w = (
        Window.partitionBy("o_orderstatus")
        .orderBy(F.col("o_totalprice"))
        .rangeBetween(-5000, 5000)
    )
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.count("*").over(w).alias("n_near_price"),
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("near_price_sum"),
    )


WINDOW_RANGE_SQL = """
SELECT o_orderkey, o_orderstatus, o_totalprice,
  COUNT(*) OVER w AS n_near_price,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE) AS near_price_sum
FROM orders
WHERE o_orderkey < 2000
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice
             RANGE BETWEEN 5000 PRECEDING AND 5000 FOLLOWING)
"""


SPECS: list[QuerySpec] = [
    QuerySpec("q4_order_priority", q4_order_priority, Q4_SQL, ("join", "tpch")),
    QuerySpec("q12_priority_buckets", q12_priority_buckets, Q12_SQL, ("agg", "tpch")),
    QuerySpec("q14_promo_share", q14_promo_share, Q14_SQL, ("agg", "tpch")),
    QuerySpec("q18_large_orders", q18_large_orders, Q18_SQL, ("join", "topk", "tpch")),
    QuerySpec("q19_disjunctive_filter", q19_disjunctive_filter, Q19_SQL, ("filter", "tpch")),
    QuerySpec("q22_idle_customers", q22_idle_customers, Q22_SQL, ("join", "tpch")),
    QuerySpec("window_range_frame", window_range_frame, WINDOW_RANGE_SQL, ("window",)),
]
