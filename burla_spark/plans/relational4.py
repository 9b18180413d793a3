"""Relational coverage, batch 4 — the remaining TPC-H shapes this
schema supports: two-sided dimension filters (q7), multi-join derived
measures (q9), distribution-of-counts with zero groups (q13), scalar-
subquery max (q15), per-group avg threshold subquery (q17).
(q2/q11/q20 need partsupp, q21 needs receipt/commit dates — absent
from the fixture schema.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from burla_spark.functions.numeric import dec, money_sum
from burla_spark.plans.base import QuerySpec
from burla_spark.sources.tables import load_table

D12 = "decimal(12,4)"


def _disc_price():
    return F.col("l_extendedprice").cast(D12) * (
        F.lit(1).cast(D12) - F.col("l_discount").cast(D12)
    ).cast(D12)


SQL_DISC_PRICE = (
    "CAST(l_extendedprice AS DECIMAL(12,4)) * "
    "CAST(CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)) AS DECIMAL(12,4))"
)


# ---------------------------------------------------------------------------
# q7 — volume shipping between two supplier/customer nation pairs.
# ---------------------------------------------------------------------------
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    n1, n2 = 15, 19  # both present among the fixture's supplier nations
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    pair_ok = (
        ((F.col("s_nationkey") == n1) & (F.col("c_nationkey") == n2))
        | ((F.col("s_nationkey") == n2) & (F.col("c_nationkey") == n1))
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .filter(pair_ok)
        .groupBy(
            F.col("s_nationkey").cast("long").alias("supp_nation"),
            F.col("c_nationkey").cast("long").alias("cust_nation"),
            F.year("o_orderdate").cast("long").alias("order_year"),
        )
        .agg(F.round(F.sum(_disc_price()), 2).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "order_year")
    )


Q7_SQL = f"""
SELECT
  CAST(s_nationkey AS BIGINT) AS supp_nation,
  CAST(c_nationkey AS BIGINT) AS cust_nation,
  CAST(YEAR(o_orderdate) AS BIGINT) AS order_year,
  CAST(ROUND(SUM({SQL_DISC_PRICE}), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
WHERE (s_nationkey = 15 AND c_nationkey = 19)
   OR (s_nationkey = 19 AND c_nationkey = 15)
GROUP BY s_nationkey, c_nationkey, YEAR(o_orderdate)
ORDER BY supp_nation, cust_nation, order_year
"""


# ---------------------------------------------------------------------------
# q9 shape — profit by supplier nation × year (derived measure across
# a 4-way join; cost proxy = retailprice·qty·0.2 since the fixture has
# no partsupp table).
# ---------------------------------------------------------------------------
def q9_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("gear"))
    cost = (
        F.col("p_retailprice").cast(D12)
        * F.col("l_quantity").cast(D12)
        * F.lit(0.2).cast("decimal(2,1)")
    )
    amount = F.sum(_disc_price() - cost)
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("order_year"),
        )
        .agg(F.round(amount, 2).cast("double").alias("profit"))
        .orderBy("nation", F.desc("order_year"))
    )


Q9_SQL = f"""
SELECT n_name AS nation,
  CAST(YEAR(o_orderdate) AS BIGINT) AS order_year,
  CAST(ROUND(SUM({SQL_DISC_PRICE}
    - CAST(p_retailprice AS DECIMAL(12,4)) * CAST(l_quantity AS DECIMAL(12,4)) * CAST(0.2 AS DECIMAL(2,1))), 2) AS DOUBLE) AS profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE contains(p_name, 'gear')
GROUP BY n_name, YEAR(o_orderdate)
ORDER BY nation, order_year DESC
"""


# ---------------------------------------------------------------------------
# q13 — customer order-count distribution INCLUDING zero-order
# customers (left join + two-level aggregation).
# ---------------------------------------------------------------------------
def q13_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# ---------------------------------------------------------------------------
# q15 — top supplier(s) by revenue in a window (scalar-subquery max).
# Revenue is an exact decimal, so equality-to-max is well-defined.
# ---------------------------------------------------------------------------
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    revenue = (
        l.groupBy("l_suppkey")
        .agg(F.round(F.sum(_disc_price()), 2).cast("double").alias("total_revenue"))
    )
    # scalar-max as crossJoin(broadcast(1-row agg)): one lazy plan (the
    # revenue exchange is shared via ReuseExchange), no driver round-trip.
    max_rev = revenue.agg(F.max("total_revenue").alias("__max_rev"))
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("__max_rev"))
        .join(s, revenue.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


Q15_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey,
         CAST(ROUND(SUM({SQL_DISC_PRICE}), 2) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


# ---------------------------------------------------------------------------
# q17 — small-quantity revenue: per-part average threshold subquery.
# ---------------------------------------------------------------------------
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    avg_qty = (
        l.groupBy(F.col("l_partkey").alias("pk"))
        .agg((F.sum(dec("l_quantity")).cast("double") / F.count("l_quantity")).alias("avg_qty"))
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(avg_qty, l.l_partkey == avg_qty.pk)
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            (F.sum(dec("l_extendedprice")).cast("double") / 7.0).alias("avg_yearly"),
            F.count("*").alias("n_small"),
        )
    )


Q17_SQL = """
WITH avg_qty AS (
  SELECT l_partkey AS pk,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0 AS avg_yearly,
  COUNT(*) AS n_small
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN avg_qty ON l_partkey = pk
WHERE p_brand = 'Brand#23'
  AND l_quantity < 0.5 * avg_qty
"""


# ---------------------------------------------------------------------------
# q8 — market share: a ratio of conditional revenue within a group
# (two-level aggregation over a 6-way join).
# ---------------------------------------------------------------------------
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    target_nation = 19
    vol = _disc_price()
    target_vol = F.when(F.col("s_nationkey") == target_nation, vol).otherwise(
        F.lit(0).cast("decimal(25,8)")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .groupBy(F.year("o_orderdate").cast("long").alias("order_year"))
        .agg(
            F.round(F.sum(target_vol), 2).cast("double").alias("target_revenue"),
            F.round(F.sum(vol), 2).cast("double").alias("total_revenue"),
            (
                F.round(F.sum(target_vol), 2).cast("double")
                / F.round(F.sum(vol), 2).cast("double")
            ).alias("mkt_share"),
        )
        .orderBy("order_year")
    )


Q8_SQL = f"""
SELECT
  CAST(YEAR(o_orderdate) AS BIGINT) AS order_year,
  CAST(ROUND(SUM(CASE WHEN s_nationkey = 19 THEN {SQL_DISC_PRICE}
                      ELSE CAST(0 AS DECIMAL(25,8)) END), 2) AS DOUBLE) AS target_revenue,
  CAST(ROUND(SUM({SQL_DISC_PRICE}), 2) AS DOUBLE) AS total_revenue,
  CAST(ROUND(SUM(CASE WHEN s_nationkey = 19 THEN {SQL_DISC_PRICE}
                      ELSE CAST(0 AS DECIMAL(25,8)) END), 2) AS DOUBLE)
    / CAST(ROUND(SUM({SQL_DISC_PRICE}), 2) AS DOUBLE) AS mkt_share
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
WHERE r_name = 'EUROPE'
GROUP BY YEAR(o_orderdate)
ORDER BY order_year
"""


SPECS: list[QuerySpec] = [
    QuerySpec("q7_volume_shipping", q7_volume_shipping, Q7_SQL, ("join", "tpch")),
    QuerySpec("q8_market_share", q8_market_share, Q8_SQL, ("join", "agg", "tpch")),
    QuerySpec("q9_profit_by_nation", q9_profit_by_nation, Q9_SQL, ("join", "tpch")),
    QuerySpec("q13_count_distribution", q13_count_distribution, Q13_SQL, ("join", "agg", "tpch")),
    QuerySpec("q15_top_supplier", q15_top_supplier, Q15_SQL, ("agg", "tpch")),
    QuerySpec("q17_small_quantity", q17_small_quantity, Q17_SQL, ("join", "agg", "tpch")),
]
