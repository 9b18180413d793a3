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

    layers: list[list[QuerySpec]] = [
        relational.SPECS,
        relational2.SPECS,
        relational3.SPECS,
        relational4.SPECS,
        relational5.SPECS,
        relational6.SPECS,
        relational7.SPECS,
        reshape.SPECS,
        scale_ops.SPECS,
        complex_types.SPECS,
        timeseries.SPECS,
        llm.SPECS,
        mlprep.SPECS,
        quality_queries.SPECS,
        streaming_queries.SPECS,
        udf_surface.SPECS,
    ]
    # Round-robin interleave across plan modules so ANY prefix of the
    # registry — the driver samples the first 50 specs for its
    # correctness scoreboard — spans every layer (relational,
    # timeseries, LLM/dedup/ANN, ML-prep, quality, streaming, UDF)
    # instead of only the relational modules that happen to sort first.
    specs: list[QuerySpec] = []
    longest = max(len(layer) for layer in layers)
    for i in range(longest):
        for layer in layers:
            if i < len(layer):
                specs.append(layer[i])
    names = [s.name for s in specs]
    assert len(names) == len(set(names)), "duplicate query names in registry"
    return specs


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {s.name: s.spark for s in all_specs()}


def oracle_sql() -> dict[str, str]:
    return {s.name: s.oracle for s in all_specs() if s.oracle is not None}
