from burla_spark.plans.base import QuerySpec
from burla_spark.plans.registry import all_specs, queries, oracle_sql

__all__ = ["QuerySpec", "all_specs", "queries", "oracle_sql"]
