"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over burla_spark's query registry: every implemented operator
from SURVEY.md §2 is registered in burla_spark/plans/ as a QuerySpec
(Spark builder + DuckDB oracle SQL where SQL-expressible).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from burla_spark.plans import registry  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: TPC-H Q3-shaped join + agg + top-k at sf0.001."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    from burla_spark.plans.relational import q3_shipping_priority

    return q3_shipping_priority(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    base = registry.queries()

    def with_utc(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            return fn(spark, sf_dir)

        return wrapped

    return {name: with_utc(fn) for name, fn in base.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (omitted for hash-based ops whose
    candidate generation has no DuckDB twin — driver does rows-only)."""
    return registry.oracle_sql()
