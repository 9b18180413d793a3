"""Typed loaders for the fixture tables (see FIXTURES.md).

A thin layer over ``spark.read.parquet`` — declarative scans so Catalyst
gets predicate pushdown / column pruning / partition pruning for free.
At 100 TB these same calls read partitioned datasets from object storage
(GCS/S3 via the hadoop connectors — the reference's shared-bucket
pattern, ``blobstore.py:25,112``); nothing here assumes local files.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables: always broadcast-join these (a few KB..MB even
# at high SF; region/nation are fixed-size in TPC-H-style schemas).
BROADCAST_DIMS = ("region", "nation", "supplier")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a DataFrame."""
    if name not in TABLE_NAMES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS) which Spark's vectorized
        # reader rejects; read the raw int64 nanos and truncate to
        # microseconds — the same ns→us truncation DuckDB applies.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        # re-written copies of the table (sinks/tests/replicas) already
        # store µs timestamps — only the original ns-encoded file needs
        # the truncation.
        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(table_path(sf_dir, name))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql()."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
