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


def compact_parquet(
    spark,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = 128 << 20,
) -> tuple[int, int]:
    """Rewrite a small-files parquet dataset into ~target-sized files.

    The small-files problem is the canonical table-maintenance job at
    scale: a streaming or per-task writer leaves thousands of KB-sized
    files, and every downstream scan pays per-file open/footer cost.
    This sizes the output from the dataset's actual on-disk bytes and
    round-robin ``repartition``s (even file sizes; ``coalesce`` would
    skew and cap the write parallelism), writing to a NEW path — object
    stores have no atomic in-place rewrite, so callers swap pointers
    (or table metadata) after the write commits.

    Returns (n_files_before, n_files_after), counted via the Hadoop
    FileSystem API so it works on any supported filesystem.
    """
    import math

    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()

    def _stats(path: str) -> tuple[int, int]:
        p = jvm.org.apache.hadoop.fs.Path(path)
        fs = p.getFileSystem(hconf)
        n_files, n_bytes = 0, 0
        it = fs.listFiles(p, True)
        while it.hasNext():
            f = it.next()
            name = f.getPath().getName()
            if name.endswith(".parquet"):
                n_files += 1
                n_bytes += f.getLen()
        return n_files, n_bytes

    n_before, total_bytes = _stats(src_path)
    n_out = max(1, math.ceil(total_bytes / target_file_bytes))
    spark.read.parquet(src_path).repartition(n_out).write.mode("error").parquet(
        dst_path
    )
    n_after, _ = _stats(dst_path)
    return n_before, n_after


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
