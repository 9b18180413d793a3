"""Data-quality summary as a registry query — the declarative rule set
from operators/quality.py compiled to one scan + one-row shuffle, then
unpivoted to (check, n_violations, n_rows). The oracle is the same
conditional counts spelled as a wide aggregate + UNION ALL unpivot."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from burla_spark.operators.quality import quality_summary
from burla_spark.plans.base import QuerySpec
from burla_spark.sources.tables import load_table


def data_quality_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    rules = {
        "high_quantity": F.col("l_quantity") > 45,
        "deep_discount": F.col("l_discount") > 0.08,
        "bad_returnflag": ~F.col("l_returnflag").isin("A", "N", "R"),
        "null_shipdate": F.col("l_shipdate").isNull(),
    }
    return quality_summary(l, rules)


DATA_QUALITY_SQL = """
WITH wide AS (
  SELECT COUNT(CASE WHEN l_quantity > 45 THEN 1 END) AS high_quantity,
         COUNT(CASE WHEN l_discount > 0.08 THEN 1 END) AS deep_discount,
         COUNT(CASE WHEN l_returnflag NOT IN ('A','N','R') THEN 1 END)
           AS bad_returnflag,
         COUNT(CASE WHEN l_shipdate IS NULL THEN 1 END) AS null_shipdate,
         COUNT(*) AS n_rows
  FROM lineitem
)
SELECT 'bad_returnflag' AS "check", bad_returnflag AS n_violations, n_rows FROM wide
UNION ALL
SELECT 'deep_discount', deep_discount, n_rows FROM wide
UNION ALL
SELECT 'high_quantity', high_quantity, n_rows FROM wide
UNION ALL
SELECT 'null_shipdate', null_shipdate, n_rows FROM wide
ORDER BY "check"
"""


SPECS = [
    QuerySpec(
        name="data_quality_summary",
        spark=data_quality_summary,
        oracle=DATA_QUALITY_SQL,
        tags=("quality", "agg", "scale"),
        doc="declarative constraint checks in one aggregate pass",
    ),
]
