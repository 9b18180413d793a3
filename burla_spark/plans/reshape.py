"""Reshaping operators (SURVEY.md §2.B long tail): pivot, unpivot/melt,
union-by-name with missing columns, null handling (fillna/coalesce)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from burla_spark.functions.numeric import money_sum
from burla_spark.plans.base import QuerySpec
from burla_spark.sources.tables import load_table


def pivot_status_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders: priority × status count matrix via groupBy().pivot()."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["F", "O", "P"])
        .orderBy("o_orderpriority")
    )


PIVOT_SQL = """
SELECT o_orderpriority,
  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS "F",
  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS "O",
  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS "P"
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem measures → long format (melt): one row per (id, measure)."""
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    return l.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="value",
    )


UNPIVOT_SQL = """
SELECT l_orderkey, l_linenumber, measure, value
FROM (
  SELECT l_orderkey, l_linenumber,
         'l_quantity' AS measure, l_quantity AS value FROM lineitem WHERE l_orderkey < 100
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem WHERE l_orderkey < 100
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem WHERE l_orderkey < 100
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem WHERE l_orderkey < 100
)
"""


def union_by_name_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName with allowMissingColumns: customers carry acctbal,
    suppliers don't — missing side null-fills."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("entity_id"),
        F.col("c_name").alias("name"),
        F.lit("customer").alias("kind"),
        F.col("c_acctbal").alias("acctbal"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("entity_id"),
        F.col("s_name").alias("name"),
        F.lit("supplier").alias("kind"),
    )
    return c.unionByName(s, allowMissingColumns=True)


UNION_BY_NAME_SQL = """
SELECT c_custkey AS entity_id, c_name AS name, 'customer' AS kind, c_acctbal AS acctbal
FROM customer
UNION ALL BY NAME
SELECT s_suppkey AS entity_id, s_name AS name, 'supplier' AS kind
FROM supplier
"""


def null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """na.fill / coalesce / nullif / nvl over left-join-produced nulls."""
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "P")
        .groupBy("o_custkey")
        .agg(money_sum("o_totalprice", "pending"), F.count("*").alias("n_pending"))
    )
    joined = c.join(o, c.c_custkey == o.o_custkey, "left")
    return joined.select(
        "c_custkey",
        F.coalesce("pending", F.lit(-1.0)).alias("pending_or_flag"),
        F.nvl("n_pending", F.lit(0)).alias("n_pending_filled"),
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("segment_nb"),
        F.isnull("pending").alias("never_pending"),
        F.nvl2("pending", F.lit("has"), F.lit("none")).alias("pending_class"),
    )


NULL_HANDLING_SQL = """
SELECT c_custkey,
  COALESCE(pending, -1.0) AS pending_or_flag,
  COALESCE(n_pending, 0) AS n_pending_filled,
  NULLIF(c_mktsegment, 'BUILDING') AS segment_nb,
  pending IS NULL AS never_pending,
  CASE WHEN pending IS NOT NULL THEN 'has' ELSE 'none' END AS pending_class
FROM customer
LEFT JOIN (
  SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS pending,
         COUNT(*) AS n_pending
  FROM orders WHERE o_orderstatus = 'P' GROUP BY o_custkey
) p ON c_custkey = p.o_custkey
"""


# ---------------------------------------------------------------------------
# SCD2 merge emulation (MERGE INTO without Delta): close changed rows,
# append new versions — anti-join + union + version bookkeeping.
# ---------------------------------------------------------------------------
def scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from burla_spark.operators.cdc import scd2_apply
    from burla_spark.functions.numeric import dec

    c = load_table(spark, sf_dir, "customer")
    current = c.select(
        "c_custkey",
        "c_nationkey",
        F.col("c_acctbal").alias("acctbal"),
        F.lit(1).cast("long").alias("version"),
        F.lit(True).alias("is_current"),
    )
    # the "change batch": rich customers get a 10% balance bump
    # (decimal-routed so both engines compute the same new balance)
    updates = (
        c.filter(F.col("c_acctbal") > 5000)
        .select(
            "c_custkey",
            "c_nationkey",
            (dec("c_acctbal") * F.lit(1.1).cast("decimal(2,1)"))
            .cast("double")
            .alias("acctbal"),
            F.lit(1).cast("long").alias("version"),
            F.lit(True).alias("is_current"),
        )
    )
    return scd2_apply(current, updates, "c_custkey")


SCD2_MERGE_SQL = """
WITH current AS (
  SELECT c_custkey, c_nationkey, c_acctbal AS acctbal,
         CAST(1 AS BIGINT) AS version, TRUE AS is_current
  FROM customer
),
updates AS (
  SELECT c_custkey, c_nationkey,
         CAST(CAST(c_acctbal AS DECIMAL(18,4)) * CAST(1.1 AS DECIMAL(2,1)) AS DOUBLE) AS acctbal
  FROM customer WHERE c_acctbal > 5000
)
SELECT c_custkey, c_nationkey, acctbal, version, is_current FROM current
WHERE c_custkey NOT IN (SELECT c_custkey FROM updates)
UNION ALL
SELECT c_custkey, c_nationkey, acctbal, version, FALSE FROM current
WHERE c_custkey IN (SELECT c_custkey FROM updates)
UNION ALL
SELECT u.c_custkey, u.c_nationkey, u.acctbal, CAST(2 AS BIGINT), TRUE
FROM updates u
"""


SPECS: list[QuerySpec] = [
    QuerySpec("pivot_status_matrix", pivot_status_matrix, PIVOT_SQL, ("reshape",)),
    QuerySpec("unpivot_measures", unpivot_measures, UNPIVOT_SQL, ("reshape",)),
    QuerySpec("union_by_name_missing", union_by_name_missing, UNION_BY_NAME_SQL, ("setop", "reshape")),
    QuerySpec("null_handling", null_handling, NULL_HANDLING_SQL, ("scalar",)),
    QuerySpec("scd2_merge", scd2_merge, SCD2_MERGE_SQL, ("cdc", "join")),
]
