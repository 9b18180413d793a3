"""Core relational operator surface (SURVEY.md §2.B).

The reference runs these shapes inside user UDFs (its README examples:
"Query 2.4 TB of Parquet" README.md:146, "rank 1.7M Airbnbs"
README.md:147); here they are first-class declarative DataFrame plans so
Catalyst gives pushdown / pruning / broadcast / AQE for free.

Scale notes per query are in the docstrings — every plan was checked
with .explain("formatted") for: filters reaching the parquet scan,
pruned ReadSchema, broadcast of dim tables, and no unnecessary shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from burla_spark.functions.numeric import dec, money_avg, money_sum
from burla_spark.plans.base import QuerySpec
from burla_spark.sources.tables import load_table

# decimal(12,4) keeps the 3-factor charge product inside precision 38
# on both engines (12,4 × 12,4 → 25,8; × 12,4 → 38,12) — fully exact.
# The (1±rate) factors are cast back to (12,4) so the product types stay
# identical (and exact) in Spark and DuckDB.
D12 = "decimal(12,4)"


def _d12(c):
    return F.col(c).cast(D12) if isinstance(c, str) else c.cast(D12)


def _one_minus(col: str):
    return (F.lit(1).cast(D12) - _d12(col)).cast(D12)


def _one_plus(col: str):
    return (F.lit(1).cast(D12) + _d12(col)).cast(D12)


def _disc_price():
    return _d12("l_extendedprice") * _one_minus("l_discount")


# SQL mirrors of the factor expressions (DuckDB side).
SQL_ONE_MINUS_DISC = "CAST(CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)) AS DECIMAL(12,4))"
SQL_ONE_PLUS_TAX = "CAST(CAST(1 AS DECIMAL(12,4)) + CAST(l_tax AS DECIMAL(12,4)) AS DECIMAL(12,4))"
SQL_DISC_PRICE = f"CAST(l_extendedprice AS DECIMAL(12,4)) * {SQL_ONE_MINUS_DISC}"


# ---------------------------------------------------------------------------
# q1 — pricing summary (TPC-H Q1 shape): scan → filter → hash agg → sort.
# Scale: fully pushed-down shipdate filter; two-phase (partial+final)
# hash agg on a 6-value grouping key — no skew possible, one shuffle.
# ---------------------------------------------------------------------------
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = _disc_price()
    charge = disc_price * _one_plus("l_tax")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum("l_quantity", "sum_qty"),
            money_sum("l_extendedprice", "sum_base_price"),
            F.round(F.sum(disc_price), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(charge), 2).cast("double").alias("sum_charge"),
            money_avg("l_quantity", "avg_qty"),
            money_avg("l_extendedprice", "avg_price"),
            money_avg("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)) AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_disc_price,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)) AS DECIMAL(12,4)) * CAST(CAST(1 AS DECIMAL(12,4)) + CAST(l_tax AS DECIMAL(12,4)) AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# q3 — shipping priority (TPC-H Q3 shape): 3-way join → agg → top-k.
# Scale: customer filter prunes before the join; orders⋈lineitem is the
# big shuffle join on orderkey; top-k compiles to TakeOrderedAndProject
# (no global sort materialization).
# ---------------------------------------------------------------------------
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1998-06-15").cast("timestamp")
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    revenue = F.round(F.sum(_disc_price()), 2)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(revenue.cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


Q3_SQL = """
SELECT
  l_orderkey,
  o_orderdate,
  o_orderpriority,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)) AS DECIMAL(12,4))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-15'
  AND l_shipdate > TIMESTAMP '1998-06-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


# ---------------------------------------------------------------------------
# q5 — local supplier volume (TPC-H Q5 shape): 6-way star join.
# Scale: region/nation/supplier are broadcast (fixed-size dims);
# customer⋈orders⋈lineitem shuffles on their keys; the c_nationkey =
# s_nationkey predicate applies post-join (non-equi residual).
# ---------------------------------------------------------------------------
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    revenue = F.round(F.sum(_disc_price()), 2)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(revenue.cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


Q5_SQL = """
SELECT
  n_name,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)) AS DECIMAL(12,4))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


# ---------------------------------------------------------------------------
# q6 — forecast revenue (TPC-H Q6 shape): pure pushed-down filter + agg.
# Scale: every predicate reaches the parquet reader (PushedFilters);
# single-row result, no shuffle beyond the final partial-agg merge.
# ---------------------------------------------------------------------------
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(_d12("l_extendedprice") * _d12("l_discount")), 2)
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


Q6_SQL = """
SELECT
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(l_discount AS DECIMAL(12,4))), 2) AS DOUBLE) AS revenue,
  COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


# ---------------------------------------------------------------------------
# q10 — returned items (TPC-H Q10 shape): join + agg + top-k customers.
# ---------------------------------------------------------------------------
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    revenue = F.round(F.sum(_disc_price()), 2)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(revenue.cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


Q10_SQL = """
SELECT
  c_custkey, c_name, c_acctbal, n_name,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)) AS DECIMAL(12,4))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# ---------------------------------------------------------------------------
# filter predicates: IN / BETWEEN / LIKE / rlike / null-handling — all
# pushed to the scan where the source supports it.
# ---------------------------------------------------------------------------
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return (
        p.filter(
            F.col("p_brand").isin("Brand#1", "Brand#13", "Brand#23", "Brand#7", "Brand#9")
            & F.col("p_size").between(5, 45)
            & F.col("p_type").isin("ECONOMY", "STANDARD", "PROMO")
            & F.col("p_name").rlike("(ring|bolt|gear|widget|gizmo)")
            & F.col("p_retailprice").isNotNull()
        )
        .select("p_partkey", "p_name", "p_brand", "p_type", "p_size")
    )


FILTER_PREDICATES_SQL = """
SELECT p_partkey, p_name, p_brand, p_type, p_size
FROM part
WHERE p_brand IN ('Brand#1', 'Brand#13', 'Brand#23', 'Brand#7', 'Brand#9')
  AND p_size BETWEEN 5 AND 45
  AND p_type IN ('ECONOMY', 'STANDARD', 'PROMO')
  AND regexp_matches(p_name, '(ring|bolt|gear|widget|gizmo)')
  AND p_retailprice IS NOT NULL
"""


def distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select("c_mktsegment", "c_nationkey").distinct()


DISTINCT_SEGMENTS_SQL = "SELECT DISTINCT c_mktsegment, c_nationkey FROM customer"


# ---------------------------------------------------------------------------
# join types: left / semi / anti in one result (tagged union).
# Scale: semi/anti avoid materializing the right side's payload columns;
# all three share the orders build side.
# ---------------------------------------------------------------------------
def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    with_big = c.join(big, c.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", F.lit("has_big_order").alias("tag")
    )
    without_big = c.join(big, c.c_custkey == big.o_custkey, "left_anti").select(
        "c_custkey", F.lit("no_big_order").alias("tag")
    )
    return with_big.unionByName(without_big)


# EXISTS / NOT EXISTS, not IN / NOT IN: NOT IN over a subquery that
# contains a NULL key returns ZERO rows (three-valued logic), whereas
# the operator is Spark's left_anti join, which keeps every
# non-matching row — NULL keys included. NOT EXISTS with a correlated
# equality is the exact anti-join mirror (nullfk-sweep find, round 8).
JOIN_SEMI_ANTI_SQL = """
SELECT c_custkey, 'has_big_order' AS tag FROM customer c
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_totalprice > 300000 AND o_custkey = c.c_custkey)
UNION ALL
SELECT c_custkey, 'no_big_order' AS tag FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_totalprice > 300000 AND o_custkey = c.c_custkey)
"""


def join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join keeping customers with no qualifying orders."""
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "P")
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_pending"),
            money_sum("o_totalprice", "pending_value"),
        )
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey",
        "c_name",
        F.coalesce("n_pending", F.lit(0)).alias("n_pending"),
        F.coalesce("pending_value", F.lit(0.0)).alias("pending_value"),
    )


JOIN_OUTER_SQL = """
SELECT
  c_custkey, c_name,
  COALESCE(n_pending, 0) AS n_pending,
  COALESCE(pending_value, 0.0) AS pending_value
FROM customer
LEFT JOIN (
  SELECT o_custkey, COUNT(*) AS n_pending,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS pending_value
  FROM orders WHERE o_orderstatus = 'P' GROUP BY o_custkey
) p ON c_custkey = p.o_custkey
"""


# ---------------------------------------------------------------------------
# aggregation depth: exact variance/stddev/corr from exact decimal sums
# (order-independent — see functions/numeric.py), count-distinct,
# conditional aggregation.
# ---------------------------------------------------------------------------
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    n = F.count("*").cast("double")
    sx = F.sum(dec("l_quantity")).cast("double")
    sxx = F.round(F.sum(dec("l_quantity") * dec("l_quantity")), 0).cast("double")
    sy = F.sum(dec("l_extendedprice")).cast("double")
    # one factor widened to (19,4): keeps the product exact on both
    # engines (Spark (32,8); DuckDB (31,8)) without tripping Spark's
    # precision-38 loss rule or DuckDB's int64 overflow.
    syy = F.round(
        F.sum(F.col("l_extendedprice").cast("decimal(19,4)") * _d12("l_extendedprice")), 0
    ).cast("double")
    sxy = F.round(F.sum(dec("l_quantity") * dec("l_extendedprice")), 0).cast("double")
    var_q = (sxx - sx * sx / n) / (n - F.lit(1.0))
    corr_qp = (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            var_q.alias("var_qty"),
            F.sqrt(var_q).alias("stddev_qty"),
            corr_qp.alias("corr_qty_price"),
            F.sum(F.when(F.col("l_discount") > 0.05, 1).otherwise(0))
            .cast("long")
            .alias("n_high_discount"),
        )
        .orderBy("l_returnflag")
    )


AGG_STATS_SQL = """
WITH s AS (
  SELECT
    l_returnflag,
    COUNT(*) AS n_rows,
    COUNT(DISTINCT l_suppkey) AS n_suppliers,
    CAST(COUNT(*) AS DOUBLE) AS n,
    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sx,
    CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4))), 0) AS DOUBLE) AS sxx,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sy,
    CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(12,4))), 0) AS DOUBLE) AS syy,
    CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4)) * CAST(l_extendedprice AS DECIMAL(18,4))), 0) AS DOUBLE) AS sxy,
    CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_high_discount
  FROM lineitem GROUP BY l_returnflag
)
SELECT
  l_returnflag, n_rows, n_suppliers,
  (sxx - sx * sx / n) / (n - 1.0) AS var_qty,
  SQRT((sxx - sx * sx / n) / (n - 1.0)) AS stddev_qty,
  (n * sxy - sx * sy) / (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy)) AS corr_qty_price,
  n_high_discount
FROM s
ORDER BY l_returnflag
"""


def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quartiles of integer-valued quantity — the
    quarter fractions make interpolation bit-exact on both engines."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_linestatus")
        .agg(
            F.percentile("l_quantity", 0.25).alias("q25"),
            F.percentile("l_quantity", 0.5).alias("q50"),
            F.percentile("l_quantity", 0.75).alias("q75"),
            F.min("l_quantity").alias("q_min"),
            F.max("l_quantity").alias("q_max"),
        )
        .orderBy("l_linestatus")
    )


AGG_PERCENTILES_SQL = """
SELECT
  l_linestatus,
  quantile_cont(l_quantity, 0.25) AS q25,
  quantile_cont(l_quantity, 0.50) AS q50,
  quantile_cont(l_quantity, 0.75) AS q75,
  MIN(l_quantity) AS q_min,
  MAX(l_quantity) AS q_max
FROM lineitem
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n_rows"), money_sum("l_quantity", "sum_qty"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


AGG_ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
"""


def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"), money_sum("o_totalprice", "total_value"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


AGG_CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""


def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set/list as sorted arrays — sorted so the result is
    deterministic under any partitioning (collect order never is), then
    serialized to a unit-separator-joined string at the query edge so the output
    schema stays atomic (driver canonicalizer sorts columns; arrays are
    unhashable in pandas)."""
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_set("n_name")), "\x1f").alias("nations"),
            F.count("*").cast("long").alias("n_nations"),
        )
        .orderBy("r_name")
    )


AGG_COLLECT_SQL = """
SELECT r_name,
       array_to_string(list_sort(list(DISTINCT n_name)), '\x1f') AS nations,
       COUNT(*) AS n_nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY r_name
"""


# ---------------------------------------------------------------------------
# window functions
# ---------------------------------------------------------------------------
def window_rank_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking inside partitions — the reference's 'rank 1.7M Airbnbs'
    example (README.md:147). One shuffle on the partition key; no global
    sort. Tiebreak on c_custkey makes row_number deterministic."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), "c_custkey")
    wv = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"))
    return (
        c.select(
            "c_custkey",
            "c_nationkey",
            "c_acctbal",
            F.row_number().over(w).alias("rn"),
            F.rank().over(wv).alias("rnk"),
            F.dense_rank().over(wv).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .filter(F.col("rn") <= 5)
    )


WINDOW_RANK_SQL = """
SELECT * FROM (
  SELECT
    c_custkey, c_nationkey, c_acctbal,
    CAST(ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS INT) AS rn,
    CAST(RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS INT) AS rnk,
    CAST(DENSE_RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS INT) AS drnk,
    CAST(NTILE(4) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS INT) AS quartile
  FROM customer
) WHERE rn <= 5
"""


def window_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-customer revenue — rows-frame cumulative sum."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_total"),
        F.row_number()
        .over(Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey"))
        .cast("long")
        .alias("order_seq"),
    )


# NULLS FIRST pinned explicitly: Spark sorts NULLs first ascending,
# DuckDB last — on a nullable sort key the running sums and sequence
# numbers diverge unless one convention is written down (contract
# rule 15; caught by the round-7 NULL-date sweep).
WINDOW_RUNNING_SQL = """
SELECT
  o_custkey, o_orderkey, o_orderdate,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
  ROW_NUMBER() OVER (PARTITION BY o_custkey
                     ORDER BY o_orderdate NULLS FIRST, o_orderkey) AS order_seq
FROM orders
"""


def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.lag("value", 1).over(w).alias("prev_value"),
        F.lead("value", 1).over(w).alias("next_value"),
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w).alias("latest_type"),
    )


WINDOW_LAG_LEAD_SQL = """
SELECT
  event_id, user_id, ts, value,
  LAG(value, 1) OVER w AS prev_value,
  LEAD(value, 1) OVER w AS next_value,
  FIRST_VALUE(event_type) OVER w AS first_type,
  LAST_VALUE(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS latest_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — the scalable per-group top-k pattern
    (window row_number + filter; never a per-group collect)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


TOPK_PER_GROUP_SQL = """
SELECT * FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
"""


def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 — Catalyst compiles orderBy+limit to
    TakeOrderedAndProject (per-partition heap + driver merge), which is
    O(k) memory at any scale; never a full global sort."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), "o_orderkey")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .limit(10)
    )


TOPK_GLOBAL_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


# ---------------------------------------------------------------------------
# set operations — Spark DataFrame set-op semantics mirrored in SQL.
# ---------------------------------------------------------------------------
def set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    machinery = c.filter(F.col("c_mktsegment") == "MACHINERY").select("c_custkey")
    rich = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    union_d = building.union(machinery).distinct()
    inter = union_d.intersect(rich)
    exc = union_d.exceptAll(rich)
    return (
        inter.withColumn("op", F.lit("intersect"))
        .unionByName(exc.withColumn("op", F.lit("except")))
    )


SET_OPERATIONS_SQL = """
WITH u AS (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
  UNION
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
),
rich AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
SELECT c_custkey, 'intersect' AS op FROM (SELECT * FROM u INTERSECT SELECT * FROM rich)
UNION ALL
SELECT c_custkey, 'except' AS op FROM (SELECT * FROM u EXCEPT ALL SELECT * FROM rich)
"""


# ---------------------------------------------------------------------------
# scalar function surface — string / date / math / conditional, all
# JVM-side codegen (no UDFs), each mirrored exactly in DuckDB.
# ---------------------------------------------------------------------------
def scalar_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").cast("long").alias("name_len"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.levenshtein("p_brand", F.lit("Brand#1")).cast("long").alias("brand_dist"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("name_devoweled"),
        F.array_join(F.split(F.col("p_name"), " "), "\x1f").alias("name_tokens"),
        F.trim(F.col("p_name")).alias("name_trim"),
        F.lpad(F.col("p_brand"), 12, "0").alias("brand_padded"),
        F.col("p_name").startswith("a").alias("starts_a"),
        F.col("p_name").contains("scan").alias("has_scan"),
    )


SCALAR_STRING_SQL = """
SELECT
  p_partkey,
  LOWER(p_name) AS name_lower,
  UPPER(p_brand) AS brand_upper,
  SUBSTRING(p_name, 1, 8) AS name_prefix,
  LENGTH(p_name) AS name_len,
  CONCAT_WS('|', p_brand, p_type) AS brand_type,
  levenshtein(p_brand, 'Brand#1') AS brand_dist,
  regexp_replace(p_name, '[aeiou]', '_', 'g') AS name_devoweled,
  array_to_string(string_split(p_name, ' '), '\x1f') AS name_tokens,
  TRIM(p_name) AS name_trim,
  LPAD(p_brand, 12, '0') AS brand_padded,
  starts_with(p_name, 'a') AS starts_a,
  contains(p_name, 'scan') AS has_scan
FROM part
"""


def scalar_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("long").alias("order_day"),
        F.quarter("o_orderdate").cast("long").alias("order_quarter"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("long")
        .alias("days_to_2002"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
        F.last_day(F.col("o_orderdate")).alias("month_end"),
    )


SCALAR_DATE_SQL = """
SELECT
  o_orderkey,
  CAST(YEAR(o_orderdate) AS BIGINT) AS order_year,
  CAST(MONTH(o_orderdate) AS BIGINT) AS order_month,
  CAST(DAY(o_orderdate) AS BIGINT) AS order_day,
  CAST(QUARTER(o_orderdate) AS BIGINT) AS order_quarter,
  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
  datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002,
  CAST(o_orderdate AS DATE) + 30 AS due_date,
  last_day(CAST(o_orderdate AS DATE)) AS month_end
FROM orders
"""


def scalar_math_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil("l_quantity").cast("long").alias("qty_ceil"),
        F.floor(F.col("l_extendedprice") / 1000).cast("long").alias("price_k"),
        # domain-guarded like try_sqrt: a negative quantity (a return /
        # correction line) has no real root — Spark would emit NaN where
        # DuckDB raises, so both sides agree on NULL (extreme sweep).
        F.when(F.col("l_quantity") >= 0, F.sqrt("l_quantity")).alias("qty_sqrt"),
        F.pow(F.col("l_quantity"), 2).alias("qty_sq"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
        F.when(F.col("l_quantity") < 10, "small")
        .when(F.col("l_quantity") < 30, "medium")
        .otherwise("large")
        .alias("qty_bucket"),
        F.signum(F.col("l_discount") - F.col("l_tax")).alias("rate_sign"),
    )


SCALAR_MATH_SQL = """
SELECT
  l_orderkey, l_linenumber,
  ABS(l_discount - 0.05) AS disc_dev,
  CAST(CEIL(l_quantity) AS BIGINT) AS qty_ceil,
  CAST(FLOOR(l_extendedprice / 1000) AS BIGINT) AS price_k,
  CASE WHEN l_quantity >= 0 THEN SQRT(l_quantity) END AS qty_sqrt,
  POW(l_quantity, 2) AS qty_sq,
  GREATEST(l_discount, l_tax) AS max_rate,
  LEAST(l_discount, l_tax) AS min_rate,
  CASE WHEN l_quantity < 10 THEN 'small'
       WHEN l_quantity < 30 THEN 'medium'
       ELSE 'large' END AS qty_bucket,
  -- the final WHEN (not ELSE) lets a NULL rate difference fall
  -- through to NULL, mirroring Spark's signum(NULL) — an ELSE 0.0
  -- silently claims "equal" for quarantined payloads (extreme sweep)
  CASE WHEN l_discount - l_tax > 0 THEN 1.0
       WHEN l_discount - l_tax < 0 THEN -1.0
       WHEN l_discount - l_tax = 0 THEN 0.0 END AS rate_sign
FROM lineitem
"""


def json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-in-string props column (the events fixture exists to
    exercise this — FIXTURES.md). get_json_object stays JVM-side."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.select("event_id", "event_type", "value", k.alias("k"))
        .withColumn("k_bucket", (F.col("k") % 10).cast("long"))
        .groupBy("event_type", "k_bucket")
        .agg(
            F.count("*").alias("n_events"),
            money_sum("value", "total_value"),
            F.max("k").alias("max_k"),
        )
    )


JSON_EXTRACTION_SQL = """
SELECT
  event_type,
  CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value,
  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY event_type, k_bucket
"""


def subquery_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders above their customer's average order value (correlated-
    subquery semantics via join against a pre-aggregated side)."""
    o = load_table(spark, sf_dir, "orders")
    avg_per_cust = o.groupBy("o_custkey").agg(
        money_avg("o_totalprice", "avg_price")
    )
    o2 = o.select("o_orderkey", "o_custkey", "o_totalprice")
    return (
        o2.join(avg_per_cust, "o_custkey")
        .filter(F.col("o_totalprice") > F.col("avg_price"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "avg_price")
    )


SUBQUERY_AGG_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice, avg_price
FROM orders
JOIN (
  SELECT o_custkey AS k,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(o_totalprice) AS avg_price
  FROM orders GROUP BY o_custkey
) a ON o_custkey = a.k
WHERE o_totalprice > avg_price
"""


SPECS: list[QuerySpec] = [
    QuerySpec("q1_pricing_summary", q1_pricing_summary, Q1_SQL, ("agg", "tpch")),
    QuerySpec("q3_shipping_priority", q3_shipping_priority, Q3_SQL, ("join", "topk", "tpch")),
    QuerySpec("q5_local_supplier_volume", q5_local_supplier_volume, Q5_SQL, ("join", "tpch")),
    QuerySpec("q6_forecast_revenue", q6_forecast_revenue, Q6_SQL, ("filter", "agg", "tpch")),
    QuerySpec("q10_returned_items", q10_returned_items, Q10_SQL, ("join", "topk", "tpch")),
    QuerySpec("filter_predicates", filter_predicates, FILTER_PREDICATES_SQL, ("filter",)),
    QuerySpec("distinct_segments", distinct_segments, DISTINCT_SEGMENTS_SQL, ("distinct",)),
    QuerySpec("join_semi_anti", join_semi_anti, JOIN_SEMI_ANTI_SQL, ("join",)),
    QuerySpec("join_outer", join_outer, JOIN_OUTER_SQL, ("join",)),
    QuerySpec("agg_stats", agg_stats, AGG_STATS_SQL, ("agg",)),
    QuerySpec("agg_percentiles", agg_percentiles, AGG_PERCENTILES_SQL, ("agg",)),
    QuerySpec("agg_rollup", agg_rollup, AGG_ROLLUP_SQL, ("agg",)),
    QuerySpec("agg_cube", agg_cube, AGG_CUBE_SQL, ("agg",)),
    QuerySpec("agg_collect", agg_collect, AGG_COLLECT_SQL, ("agg",)),
    QuerySpec("window_rank_customers", window_rank_customers, WINDOW_RANK_SQL, ("window",)),
    QuerySpec("window_running_revenue", window_running_revenue, WINDOW_RUNNING_SQL, ("window",)),
    QuerySpec("window_lag_lead", window_lag_lead, WINDOW_LAG_LEAD_SQL, ("window",)),
    QuerySpec("topk_per_group", topk_per_group, TOPK_PER_GROUP_SQL, ("window", "topk")),
    QuerySpec("topk_global", topk_global, TOPK_GLOBAL_SQL, ("topk",)),
    QuerySpec("set_operations", set_operations, SET_OPERATIONS_SQL, ("setop",)),
    QuerySpec("scalar_string_functions", scalar_string_functions, SCALAR_STRING_SQL, ("scalar",)),
    QuerySpec("scalar_date_functions", scalar_date_functions, SCALAR_DATE_SQL, ("scalar",)),
    QuerySpec("scalar_math_conditional", scalar_math_conditional, SCALAR_MATH_SQL, ("scalar",)),
    QuerySpec("json_extraction", json_extraction, JSON_EXTRACTION_SQL, ("json",)),
    QuerySpec("subquery_aggregation", subquery_aggregation, SUBQUERY_AGG_SQL, ("join", "agg")),
]
