"""Relational coverage, batch 6 — the five remaining TPC-H plan shapes
(q2, q11, q16, q20, q21), adapted to the fixture schema: the testdata
has no ``partsupp`` table and ``lineitem`` has no commit/receipt dates,
so each query keeps its reference plan pattern (correlated-min
subquery, scalar-subquery threshold over a second aggregation of the
same relation, NOT-IN exclusion + distinct count, nested IN chain,
double correlated EXISTS/NOT-EXISTS self-join) on the columns we have.

Scale notes (local[32] now, 1000 executors later):
* q2: the correlated min is a partkey-grouped pre-aggregation joined
  back — one shuffle on l_partkey shared by both sides, no per-row
  subquery execution.
* q11: the "total" scalar subquery is a 1-row aggregate crossJoin
  (broadcast of a single row), not a recompute per group.
* q21: EXISTS/NOT EXISTS become left_semi / left_anti joins on
  l_orderkey — Spark shuffles lineitem on orderkey once per side and
  AQE picks SMJ/SHJ; no nested-loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from burla_spark.functions.numeric import dec, money_sum
from burla_spark.plans.base import QuerySpec
from burla_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# q2 shape — min-cost supplier per part (correlated MIN subquery).
# Reference pattern: TPC-H Q2 over partsupp; here "cost" is the minimum
# observed unit price (l_extendedprice / l_quantity) a supplier charged
# for the part. Per-row division is IEEE-identical on both engines and
# MIN involves no accumulation, so doubles compare exactly.
# ---------------------------------------------------------------------------
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")

    # Filter lineitem by the (tiny, broadcast) part dim BEFORE any
    # aggregation — the correlated min is only needed for filtered
    # parts, so at 100 TB this prunes the scan to the relevant slice.
    unit = l.join(p, l.l_partkey == p.p_partkey).select(
        "l_partkey",
        "l_suppkey",
        "p_partkey",
        "p_type",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
    )
    # One explicit shuffle on l_partkey: HashPartitioning(l_partkey)
    # satisfies the (l_partkey, l_suppkey) groupBy AND the per-part
    # window below, so lineitem is scanned and shuffled exactly once.
    offers = (
        unit.repartition("l_partkey")
        .groupBy("l_partkey", "l_suppkey", "p_partkey", "p_type")
        .agg(F.min("unit_price").alias("min_unit_price"))
    )
    best_w = Window.partitionBy("l_partkey")
    best = offers.withColumn(
        "best_price", F.min("min_unit_price").over(best_w)
    ).filter(F.col("min_unit_price") == F.col("best_price"))
    return (
        best.join(s, best.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            "s_acctbal",
            "s_name",
            F.col("n_name").alias("nation"),
            "p_partkey",
            "p_type",
            F.col("min_unit_price").alias("best_unit_price"),
        )
        .orderBy(
            F.col("s_acctbal").desc(), "nation", "s_name", "p_partkey"
        )
        .limit(100)
    )


Q2_SQL = """
WITH offers AS (
  SELECT l_partkey, l_suppkey,
         MIN(l_extendedprice / l_quantity) AS min_unit_price
  FROM lineitem GROUP BY l_partkey, l_suppkey
), best AS (
  SELECT l_partkey AS bp_partkey, MIN(min_unit_price) AS best_price
  FROM offers GROUP BY l_partkey
)
SELECT s_acctbal, s_name, n_name AS nation, p_partkey, p_type,
       min_unit_price AS best_unit_price
FROM offers
JOIN best ON l_partkey = bp_partkey AND min_unit_price = best_price
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_size = 15 AND p_type = 'STANDARD'
ORDER BY s_acctbal DESC, nation, s_name, p_partkey
LIMIT 100
"""


# ---------------------------------------------------------------------------
# q11 shape — "important stock": per-part value share above a scalar
# threshold computed from the SAME relation (scalar subquery).
# ---------------------------------------------------------------------------
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")

    scoped = (
        l.join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("l_partkey", "l_extendedprice")
    )
    per_part = scoped.groupBy("l_partkey").agg(
        money_sum("l_extendedprice", "part_value")
    )
    total = scoped.agg(
        (F.sum(dec("l_extendedprice")).cast("double") * F.lit(0.0001)).alias(
            "threshold"
        )
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("l_partkey", "part_value")
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


Q11_SQL = """
WITH scoped AS (
  SELECT l_partkey, l_extendedprice
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_7'
)
SELECT l_partkey,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS part_value
FROM scoped
GROUP BY l_partkey
HAVING CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) >
       (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) * 0.0001
        FROM scoped)
ORDER BY part_value DESC, l_partkey
"""


# ---------------------------------------------------------------------------
# q16 shape — supplier-count distribution per part attribute, with a
# NOT IN exclusion subquery (suppliers with negative balance stand in
# for q16's complaint-comment filter).
# ---------------------------------------------------------------------------
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") != "Brand#13")
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select(F.col("s_suppkey").alias("bad_suppkey"))

    # Distinct the NARROW (partkey, suppkey) pairs before touching part:
    # COUNT(DISTINCT suppkey) only needs the pair set, and lineitem
    # holds each pair ~7×, so this swaps the wide 57M-row
    # (brand, size, suppkey) triple shuffle for a 16-byte pair shuffle
    # feeding an 8M-row join. Second-decade effect (sf10, TPCH_CURVE):
    # 28.8 s → 9.6 s, ratio10 22× → ~7 (the triple shuffle was the one
    # stage whose map-side distinct stopped reducing as sf grew).
    pairs = l.select("l_partkey", "l_suppkey").distinct()
    return (
        pairs.join(bad, pairs.l_suppkey == bad.bad_suppkey, "left_anti")
        .join(p, pairs.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_size")
    )


Q16_SQL = """
SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#13'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_size
ORDER BY supplier_cnt DESC, p_brand, p_size
"""


# ---------------------------------------------------------------------------
# q20 shape — suppliers whose shipped volume of a part family exceeds a
# threshold (nested IN chain: part-name filter → grouped lineitem
# having → supplier semi-join → nation filter).
# ---------------------------------------------------------------------------
def q20_heavy_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")

    heavy = (
        l.join(p, l.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(dec("l_quantity")).cast("double").alias("shipped_qty"))
        .filter(F.col("shipped_qty") > 50.0)
        .select("l_suppkey")
    )
    return (
        s.join(heavy, s.s_suppkey == heavy.l_suppkey, "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


Q20_SQL = """
SELECT s_name, s_acctbal
FROM supplier
WHERE s_suppkey IN (
    SELECT l_suppkey FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_name LIKE '%red%'
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_suppkey
    HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) > 50.0
  )
  AND s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_name = 'NATION_3')
ORDER BY s_name
"""


# ---------------------------------------------------------------------------
# q21 shape — double correlated EXISTS / NOT EXISTS self-join on
# lineitem. Reference pattern: suppliers who alone failed a multi-
# supplier order. "Failed" here = returned line (l_returnflag = 'R')
# since the fixture has no receipt/commit dates.
# ---------------------------------------------------------------------------
def q21_sole_failing_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")

    l1 = l.filter(F.col("l_returnflag") == "R").alias("l1")
    l2 = l.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = (
        l.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .alias("l3")
    )

    waiting = (
        l1.join(o, F.col("l1.l_orderkey") == o.o_orderkey, "left_semi")
        .join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
            "left_anti",
        )
    )
    return (
        waiting.join(s, F.col("l1.l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("s_name", F.col("n_name").alias("nation"))
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name", "nation")
        .limit(100)
    )


Q21_SQL = """
SELECT s_name, n_name AS nation, COUNT(*) AS numwait
FROM lineitem l1
JOIN supplier ON l1.l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM orders
              WHERE o_orderkey = l1.l_orderkey AND o_orderstatus = 'F')
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name, n_name
ORDER BY numwait DESC, s_name, n_name
LIMIT 100
"""


SPECS = [
    QuerySpec(
        "q2_min_cost_supplier",
        q2_min_cost_supplier,
        Q2_SQL,
        ("join", "subquery", "tpch"),
        doc="TPC-H Q2 shape: correlated-min subquery as shared pre-agg "
        "(reference README.md:146 parquet-query workload).",
    ),
    QuerySpec(
        "q11_important_stock",
        q11_important_stock,
        Q11_SQL,
        ("agg", "subquery", "tpch"),
        doc="TPC-H Q11 shape: HAVING vs scalar subquery over same relation.",
    ),
    QuerySpec(
        "q16_supplier_part_counts",
        q16_supplier_part_counts,
        Q16_SQL,
        ("agg", "join", "tpch"),
        doc="TPC-H Q16 shape: NOT IN exclusion + COUNT(DISTINCT) per group.",
    ),
    QuerySpec(
        "q20_heavy_shippers",
        q20_heavy_shippers,
        Q20_SQL,
        ("join", "subquery", "tpch"),
        doc="TPC-H Q20 shape: nested IN chain via semi-joins.",
    ),
    QuerySpec(
        "q21_sole_failing_supplier",
        q21_sole_failing_supplier,
        Q21_SQL,
        ("join", "subquery", "tpch"),
        doc="TPC-H Q21 shape: EXISTS + NOT EXISTS self-joins as "
        "left_semi/left_anti on one orderkey shuffle.",
    ),
]
