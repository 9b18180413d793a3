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


def _tune(spark: SparkSession) -> None:
    """Apply the engine's runtime-settable config profile to whatever
    session the driver hands us: UTC semantics (timestamp parity with
    the DuckDB oracle) + the performance profile from
    burla_spark.session (AQE, Arrow, right-sized shuffle width)."""
    for key, value in {
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        "spark.sql.execution.arrow.pyspark.enabled": "true",
    }.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            pass  # static conf on this session — keep the session's value


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: TPC-H Q3-shaped join + agg + top-k at sf0.001."""
    _tune(spark)
    from burla_spark.plans.relational import q3_shipping_priority

    return q3_shipping_priority(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    base = registry.queries()

    def tuned(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            _tune(spark)
            return fn(spark, sf_dir)

        return wrapped

    return {name: tuned(fn) for name, fn in base.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query. Since round 12 EVERY registry spec
    carries one (randomized/trained production configs run behind
    deterministic driver-adjudication modes; see PROPERTIES_r{N})."""
    return registry.oracle_sql()
