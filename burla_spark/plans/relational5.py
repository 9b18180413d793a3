"""Relational coverage, batch 5 — distribution window functions,
date formatting/construction, boolean aggregates, regexp groups, and
the Arrow-native (mapInArrow) Python surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from burla_spark.plans.base import QuerySpec
from burla_spark.sources.tables import load_table


def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist / nth_value — the distribution window
    functions. Both engines compute (rank-1)/(n-1) and peers/n with the
    same integers, so the doubles match exactly."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 500)
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.nth_value("c_custkey", 2).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("second_key"),
    )


WINDOW_DISTRIBUTION_SQL = """
SELECT c_custkey, c_nationkey, c_acctbal,
  PERCENT_RANK() OVER w AS pct_rank,
  CUME_DIST() OVER w AS cume,
  NTH_VALUE(c_custkey, 2) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_key
FROM customer
WHERE c_custkey < 500
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
"""


def scalar_date_functions2(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    return o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM").alias("year_month"),
        F.to_date(F.date_format("o_orderdate", "yyyy-MM-dd")).alias("as_date"),
        F.make_date(F.year("o_orderdate"), F.month("o_orderdate"), F.lit(1)).alias("month_first"),
        F.dayofyear("o_orderdate").cast("long").alias("doy"),
        F.weekofyear("o_orderdate").cast("long").alias("iso_week"),
        F.unix_timestamp("o_orderdate").alias("epoch_secs"),
        F.timestamp_seconds(F.unix_timestamp("o_orderdate")).alias("roundtrip_ts"),
    )


SCALAR_DATE2_SQL = """
SELECT o_orderkey,
  strftime(o_orderdate, '%Y-%m') AS year_month,
  CAST(o_orderdate AS DATE) AS as_date,
  make_date(CAST(YEAR(o_orderdate) AS INT), CAST(MONTH(o_orderdate) AS INT), 1) AS month_first,
  CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
  CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_secs,
  o_orderdate AS roundtrip_ts
FROM orders
WHERE o_orderkey < 1000
"""


def agg_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.bool_and(F.col("l_quantity") > 0).alias("all_positive_qty"),
            F.bool_or(F.col("l_discount") > 0.09).alias("any_big_discount"),
            F.bool_and(F.col("l_tax") < 0.1).alias("all_low_tax"),
            F.count_if(F.col("l_discount") == 0).alias("n_no_discount"),
        )
        .orderBy("l_returnflag")
    )


AGG_BOOLEAN_SQL = """
SELECT l_returnflag,
  bool_and(l_quantity > 0) AS all_positive_qty,
  bool_or(l_discount > 0.09) AS any_big_discount,
  bool_and(l_tax < 0.1) AS all_low_tax,
  CAST(count_if(l_discount = 0) AS BIGINT) AS n_no_discount
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def regexp_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract with capture groups over the brand pattern."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_brand", r"Brand#(\d+)", 1).alias("brand_num_str"),
        F.regexp_extract("p_brand", r"Brand#(\d+)", 1).cast("long").alias("brand_num"),
        F.regexp_extract("p_name", r"^(\w+)\s+(\w+)", 2).alias("second_word"),
        F.regexp_count("p_name", F.lit(r"\ba\w*")).cast("long").alias("n_a_words"),
    )


REGEXP_GROUPS_SQL = r"""
SELECT p_partkey,
  regexp_extract(p_brand, 'Brand#(\d+)', 1) AS brand_num_str,
  CAST(regexp_extract(p_brand, 'Brand#(\d+)', 1) AS BIGINT) AS brand_num,
  regexp_extract(p_name, '^(\w+)\s+(\w+)', 2) AS second_word,
  len(regexp_extract_all(p_name, '\ba\w*')) AS n_a_words
FROM part
"""


def mapinarrow_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow — the zero-copy Arrow RecordBatch surface (one level
    below mapInPandas; no pandas conversion at all)."""
    import pyarrow as pa

    def project(batches):
        for batch in batches:
            ok = batch.column("o_orderkey")
            total = batch.column("o_totalprice")
            cents = pa.compute.round(
                pa.compute.multiply(total, pa.scalar(100.0))
            ).cast(pa.int64())
            yield pa.RecordBatch.from_arrays(
                [ok, cents], names=["o_orderkey", "price_cents"]
            )

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return o.mapInArrow(project, "o_orderkey long, price_cents long")


MAPINARROW_SQL = """
SELECT o_orderkey, CAST(ROUND(o_totalprice * 100.0, 0) AS BIGINT) AS price_cents
FROM orders
"""


def applyinarrow_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped applyInArrow (Spark 4) — the Arrow-native grouped-map
    surface: each group arrives as one pyarrow Table, no pandas
    conversion. Outputs only order-independent stats (count/min/max)
    so the result is deterministic at any partitioning."""
    import pyarrow as pa

    def stats(table: "pa.Table") -> "pa.Table":
        qty = table.column("l_quantity")
        return pa.table(
            {
                "l_returnflag": [table.column("l_returnflag")[0].as_py()],
                "n_rows": [table.num_rows],
                "min_qty": [pa.compute.min(qty).as_py()],
                "max_qty": [pa.compute.max(qty).as_py()],
            }
        )

    l = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity")
    return (
        l.groupBy("l_returnflag")
        .applyInArrow(
            stats, "l_returnflag string, n_rows long, min_qty double, max_qty double"
        )
        .orderBy("l_returnflag")
    )


APPLYINARROW_SQL = """
SELECT l_returnflag, COUNT(*) AS n_rows,
       MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


SPECS: list[QuerySpec] = [
    QuerySpec("window_distribution", window_distribution, WINDOW_DISTRIBUTION_SQL, ("window",)),
    QuerySpec("scalar_date_functions2", scalar_date_functions2, SCALAR_DATE2_SQL, ("scalar",)),
    QuerySpec("agg_boolean", agg_boolean, AGG_BOOLEAN_SQL, ("agg",)),
    QuerySpec("regexp_groups", regexp_groups, REGEXP_GROUPS_SQL, ("scalar",)),
    QuerySpec("mapinarrow_projection", mapinarrow_projection, MAPINARROW_SQL, ("udf",)),
    QuerySpec(
        "applyinarrow_grouped", applyinarrow_grouped, APPLYINARROW_SQL,
        ("udf",),
        doc="Spark 4 grouped applyInArrow (Arrow-native grouped map).",
    ),
]
