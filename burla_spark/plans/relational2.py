"""Relational coverage, batch 2 (SURVEY.md §2.B long tail): theta/range
join, cross join, pure-SQL API, min_by/max_by, array functions, more
string functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from burla_spark.functions.numeric import money_sum
from burla_spark.operators.text import tokens
from burla_spark.plans.base import QuerySpec
from burla_spark.sources.tables import load_table, register_views


# ---------------------------------------------------------------------------
# theta / range join: price-band lookup (non-equi BETWEEN join).
# Scale: the band table is tiny → BroadcastNestedLoop degenerates to a
# broadcast range probe; for big-big range joins the recipe is banding
# to an equi-key first (as ngram_jaccard_pairs does).
# ---------------------------------------------------------------------------
def range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [(i, float(i * 250), float((i + 1) * 250)) for i in range(8)],
        "band_id int, lo double, hi double",
    )
    return (
        p.join(
            F.broadcast(bands),
            (p.p_retailprice >= bands.lo) & (p.p_retailprice < bands.hi),
        )
        .groupBy("band_id", "lo", "hi")
        .agg(
            F.count("*").alias("n_parts"),
            money_sum("p_retailprice", "band_value"),
        )
    )


RANGE_JOIN_SQL = """
WITH bands AS (
  SELECT i AS band_id, i * 250.0 AS lo, (i + 1) * 250.0 AS hi
  FROM (SELECT UNNEST(generate_series(0, 7)) AS i)
)
SELECT CAST(band_id AS INT) AS band_id, lo, hi, COUNT(*) AS n_parts,
       CAST(SUM(CAST(p_retailprice AS DECIMAL(18,4))) AS DOUBLE) AS band_value
FROM part JOIN bands ON p_retailprice >= lo AND p_retailprice < hi
GROUP BY band_id, lo, hi
"""


def cross_join_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cartesian product: region × market segment, annotated
    with actual customer counts (left join onto the matrix)."""
    r = load_table(spark, sf_dir, "region").select("r_name")
    seg = (
        load_table(spark, sf_dir, "customer")
        .select("c_mktsegment")
        .distinct()
    )
    matrix = r.crossJoin(seg)
    counts = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(load_table(spark, sf_dir, "region")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("r_name", "c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )
    return matrix.join(counts, ["r_name", "c_mktsegment"], "left").select(
        "r_name",
        "c_mktsegment",
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
    )


CROSS_JOIN_SQL = """
WITH matrix AS (
  SELECT r_name, c_mktsegment
  FROM (SELECT r_name FROM region), (SELECT DISTINCT c_mktsegment FROM customer)
),
counts AS (
  SELECT r_name, c_mktsegment, COUNT(*) AS n_customers
  FROM customer
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY r_name, c_mktsegment
)
SELECT m.r_name, m.c_mktsegment, COALESCE(c.n_customers, 0) AS n_customers
FROM matrix m LEFT JOIN counts c
  ON m.r_name = c.r_name AND m.c_mktsegment = c.c_mktsegment
"""


# ---------------------------------------------------------------------------
# pure SQL API over registered views — CTE + EXISTS + window in one
# statement (the spark.sql surface, not just the DataFrame DSL).
# ---------------------------------------------------------------------------
SQL_API_TEXT = """
WITH big_items AS (
  SELECT l_orderkey, COUNT(*) AS n_big
  FROM lineitem WHERE l_quantity >= 45
  GROUP BY l_orderkey
)
SELECT o_orderkey, o_orderstatus, n_big,
       ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                          ORDER BY n_big DESC, o_orderkey) AS status_rank
FROM orders JOIN big_items ON o_orderkey = l_orderkey
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
"""


def sql_api_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(SQL_API_TEXT).withColumn(
        "status_rank", F.col("status_rank").cast("long")
    )


LATERAL_TOPN_SQL = """
SELECT n.n_name, c.c_custkey, c.c_acctbal
FROM nation n,
LATERAL (SELECT c_custkey, c_acctbal FROM customer
         WHERE c_nationkey = n.n_nationkey
         ORDER BY c_acctbal DESC, c_custkey LIMIT 3) c
ORDER BY n.n_name, c.c_acctbal DESC, c.c_custkey
"""


def lateral_topn_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with ORDER BY + LIMIT (top-3
    customers per nation) — the SQL-standard alternative to the
    window row_number() top-k recipe; Catalyst decorrelates it into
    a ranked join rather than per-row re-execution."""
    register_views(spark, sf_dir)
    return spark.sql(LATERAL_TOPN_SQL)


# The recursive member generates the month spine (the warehouse date-
# dimension pattern); gaps left-join to zero and the running total is
# decimal-routed so the cumulative double is order-exact on both
# engines. Same text runs on Spark 4 (WITH RECURSIVE landed in 4.0)
# and DuckDB.
RECURSIVE_SPINE_SQL = """
WITH RECURSIVE months(m) AS (
  SELECT CAST('1995-01-01' AS DATE)
  UNION ALL
  SELECT CAST(m + INTERVAL '1' MONTH AS DATE) FROM months
  WHERE m < CAST('2001-11-01' AS DATE)
),
monthly AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS om,
         COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS month_revenue
  FROM orders GROUP BY 1
)
SELECT m AS month,
       COALESCE(n_orders, 0) AS n_orders,
       COALESCE(month_revenue, 0.0) AS month_revenue,
       CAST(SUM(CAST(COALESCE(month_revenue, 0.0) AS DECIMAL(18,4)))
            OVER (ORDER BY m ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS cum_revenue
FROM months LEFT JOIN monthly ON m = om
ORDER BY month
"""


def recursive_month_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4): month-spine generation + gap-filled
    cumulative revenue — recursion builds the dimension, not the fact
    scan, so the recursive part is O(#months) regardless of data
    volume."""
    register_views(spark, sf_dir)
    return spark.sql(RECURSIVE_SPINE_SQL)


# ---------------------------------------------------------------------------
# min_by / max_by (argmin/argmax aggregates)
# ---------------------------------------------------------------------------
def agg_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per order status: the order id holding the extreme price.
    The comparison key packs (price, orderkey) into one BIGINT so ties
    are impossible and both engines agree exactly."""
    o = load_table(spark, sf_dir, "orders")
    packed = (
        F.round(F.col("o_totalprice") * 100, 0).cast("long") * 100_000_000
        + F.col("o_orderkey")
    )
    return (
        o.withColumn("__rankval", packed)
        .groupBy("o_orderstatus")
        .agg(
            F.max_by("o_orderkey", F.col("__rankval")).alias("priciest_order"),
            F.min_by("o_orderkey", F.col("__rankval")).alias("cheapest_order"),
            F.max("o_totalprice").alias("max_price"),
            F.min("o_totalprice").alias("min_price"),
        )
        .orderBy("o_orderstatus")
    )


AGG_MIN_MAX_BY_SQL = """
SELECT o_orderstatus,
  arg_max(o_orderkey, CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) * 100000000 + o_orderkey) AS priciest_order,
  arg_min(o_orderkey, CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) * 100000000 + o_orderkey) AS cheapest_order,
  MAX(o_totalprice) AS max_price,
  MIN(o_totalprice) AS min_price
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


# ---------------------------------------------------------------------------
# array functions over tokenized text
# ---------------------------------------------------------------------------
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    # \x1f separator: tokens are free text, so a printable separator
    # could let distinct arrays serialize to equal strings (see
    # complex_types.US). NULL text excluded on both sides — the engines
    # disagree on NULL-array function semantics.
    d = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 100) & F.col("text").isNotNull()
    )
    toks = tokens(F.col("text"))
    return d.select(
        "doc_id",
        F.array_join(F.slice(toks, 1, 3), "\x1f").alias("first3"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.array_position(toks, "data").cast("long").alias("data_pos"),
        F.array_join(F.array_sort(F.array_distinct(toks)), "\x1f").alias("vocab"),
        F.array_join(F.reverse(toks), "\x1f").alias("reversed_tokens"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.element_at(toks, -1).alias("last_token"),
        F.array_join(F.slice(toks, 1, 2), "_").alias("joined2"),
    )


ARRAY_FUNCTIONS_SQL = r"""
WITH d AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
  FROM documents WHERE doc_id < 100 AND text IS NOT NULL
)
SELECT doc_id,
  array_to_string(toks[1:3], '|') AS first3,
  list_contains(toks, 'spark') AS has_spark,
  COALESCE(list_position(toks, 'data'), 0) AS data_pos,
  array_to_string(list_sort(list_distinct(toks)), '|') AS vocab,
  array_to_string(list_reverse(toks), '|') AS reversed_tokens,
  len(toks) AS n_tokens,
  toks[-1] AS last_token,
  array_to_string(toks[1:2], '_') AS joined2
FROM d
"""
ARRAY_FUNCTIONS_SQL = ARRAY_FUNCTIONS_SQL.replace("'|'", "'\x1f'")


# ---------------------------------------------------------------------------
# string functions, batch 2
# ---------------------------------------------------------------------------
def scalar_string_functions2(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.translate("p_name", "aeiou", "AEIOU").alias("name_translated"),
        # COALESCE(…, 0) on both sides: NULL name → 0, matching the
        # oracle (Spark instr propagates NULL, the not-found case is 0
        # in both engines)
        F.coalesce(F.instr(F.col("p_name"), "scan"), F.lit(0))
        .cast("long")
        .alias("scan_at"),
        F.repeat(F.col("p_brand"), 2).alias("brand_twice"),
        F.reverse(F.col("p_brand")).alias("brand_reversed"),
        F.ascii(F.col("p_name")).cast("long").alias("first_char_code"),
        F.left(F.col("p_name"), F.lit(4)).alias("name_left4"),
        F.right(F.col("p_name"), F.lit(4)).alias("name_right4"),
        F.replace(F.col("p_type"), F.lit("ECONOMY"), F.lit("ECO")).alias("type_short"),
        F.coalesce(F.position(F.lit("#"), F.col("p_brand")), F.lit(0))
        .cast("long")
        .alias("hash_pos"),
    )


SCALAR_STRING2_SQL = """
SELECT
  p_partkey,
  translate(p_name, 'aeiou', 'AEIOU') AS name_translated,
  COALESCE(strpos(p_name, 'scan'), 0) AS scan_at,
  repeat(p_brand, 2) AS brand_twice,
  reverse(p_brand) AS brand_reversed,
  ascii(p_name) AS first_char_code,
  left(p_name, 4) AS name_left4,
  right(p_name, 4) AS name_right4,
  replace(p_type, 'ECONOMY', 'ECO') AS type_short,
  COALESCE(strpos(p_brand, '#'), 0) AS hash_pos
FROM part
"""


# ---------------------------------------------------------------------------
# grouping sets via SQL (beyond rollup/cube)
# ---------------------------------------------------------------------------
def grouping_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


GROUPING_SETS_SQL = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""


SPECS: list[QuerySpec] = [
    QuerySpec("range_join_price_bands", range_join_price_bands, RANGE_JOIN_SQL, ("join",)),
    QuerySpec("cross_join_matrix", cross_join_matrix, CROSS_JOIN_SQL, ("join",)),
    QuerySpec("sql_api_query", sql_api_query, SQL_API_TEXT, ("sql", "window")),
    QuerySpec(
        "lateral_topn_per_nation", lateral_topn_per_nation, LATERAL_TOPN_SQL,
        ("sql", "join"),
        doc="Correlated LATERAL subquery with ORDER BY/LIMIT (top-N per key).",
    ),
    QuerySpec(
        "recursive_month_spine", recursive_month_spine, RECURSIVE_SPINE_SQL,
        ("sql", "window"),
        doc="WITH RECURSIVE month spine + gap-filled cumulative revenue.",
    ),
    QuerySpec("agg_min_max_by", agg_min_max_by, AGG_MIN_MAX_BY_SQL, ("agg",)),
    QuerySpec("array_functions", array_functions, ARRAY_FUNCTIONS_SQL, ("scalar",)),
    QuerySpec("scalar_string_functions2", scalar_string_functions2, SCALAR_STRING2_SQL, ("scalar",)),
    QuerySpec("grouping_sets_agg", grouping_sets_agg, GROUPING_SETS_SQL, ("agg",)),
]
