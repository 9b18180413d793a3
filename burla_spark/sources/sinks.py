"""Sink helpers (SURVEY.md §2.B scans/sources/sinks): parquet / CSV /
JSON writers with the options that matter at 100 TB.

The reference's only sink is the shared bucket written from inside
UDFs (endpoints/storage.py:524-944 manages it); here writes are
engine-level, partitioned, and atomic (Spark's committer), and the
same calls target s3a://, gs://, or abfs:// paths unchanged via the
hadoop connectors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Partitioned parquet write. partition_by columns become hive-style
    directories → downstream scans get partition pruning for free.
    max_records_per_file bounds file sizes (small-file/huge-file both
    hurt at scale; ~128 MB targets are the sweet spot)."""
    w = df.write.mode(mode)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", True).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink — the other columnar format Spark ships natively
    (zlib-compressed, predicate-pushdown-capable like parquet)."""
    df.write.mode(mode).orc(path)


def write_text(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Text sink: one string column → one line per row."""
    df.write.mode(mode).text(path)


def write_xml(
    df: DataFrame, path: str, row_tag: str = "row", mode: str = "overwrite"
) -> None:
    """XML sink (Spark 4 ships spark-xml natively)."""
    df.write.mode(mode).format("xml").option("rowTag", row_tag).save(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    """Bucketed managed table: co-locates rows by key so later joins
    and aggs on bucket_col skip the shuffle entirely (the bucketed-join
    path for repeated big-big joins)."""
    w = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table_name)
