"""Central query registry — the single source the driver contract
(__spark_entry__.py), the test suite, and bench.py all read."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from burla_spark.plans.base import QuerySpec


def all_specs() -> list[QuerySpec]:
    # Imported lazily so a bug in one plan module doesn't take down the
    # whole registry at import time.
    from burla_spark.plans import (
        complex_types,
        llm,
        mlprep,
        quality_queries,
        relational,
        relational2,
        relational3,
        relational4,
        relational5,
        relational6,
        relational7,
        reshape,
        scale_ops,
        streaming_queries,
        timeseries,
        udf_surface,
    )

    specs: list[QuerySpec] = []
    specs += relational.SPECS
    specs += relational2.SPECS
    specs += relational3.SPECS
    specs += relational4.SPECS
    specs += relational5.SPECS
    specs += relational6.SPECS
    specs += relational7.SPECS
    specs += reshape.SPECS
    specs += scale_ops.SPECS
    specs += complex_types.SPECS
    specs += timeseries.SPECS
    specs += llm.SPECS
    specs += mlprep.SPECS
    specs += quality_queries.SPECS
    specs += streaming_queries.SPECS
    specs += udf_surface.SPECS
    names = [s.name for s in specs]
    assert len(names) == len(set(names)), "duplicate query names in registry"
    return specs


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {s.name: s.spark for s in all_specs()}


def oracle_sql() -> dict[str, str]:
    return {s.name: s.oracle for s in all_specs() if s.oracle is not None}
