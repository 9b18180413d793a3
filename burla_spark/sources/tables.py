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


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize the events ``ts`` column to a session-TZ TIMESTAMP
    regardless of how the runtime surfaced the parquet TIMESTAMP(NANOS)
    physical type — the one ingestion contract batch and stream share.

    - Spark 4.1+: the column loads as TIMESTAMP_NTZ (ns truncated to µs
      by the reader); cast to TIMESTAMP — exact under the session's
      pinned UTC timezone (session.py).
    - Older runtimes with ``spark.sql.legacy.parquet.nanosAsLong=true``:
      the column loads as raw int64 nanos; truncate ns→µs (the same
      truncation DuckDB applies).
    - Re-written copies of the table (sinks/tests/replicas) already
      store µs TIMESTAMP — pass through unchanged.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    dt = df.schema["ts"].dataType
    if isinstance(dt, LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(dt, TimestampNTZType):
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a DataFrame."""
    if name not in TABLE_NAMES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        df = normalize_events_ts(df)
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql()."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
