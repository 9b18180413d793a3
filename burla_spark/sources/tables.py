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

# Fixed-size dimension tables: safe to broadcast-join at ANY scale
# factor (region/nation have constant cardinality in TPC-H-style
# schemas). customer/part/supplier GROW with SF and must never carry a
# verbatim broadcast hint — AQE decides at runtime (round-10 lint rule,
# tests/test_plan_lint.py::test_no_fact_scaled_broadcast_hints).
BROADCAST_DIMS = ("region", "nation")

# ---------------------------------------------------------------------------
# Declared ingest domains — validated at load, identically on both
# engine sides (every oracle SQL is wrapped with INGEST_CTE, the
# textual mirror of the Spark-side transforms below).
#
# Policy (round-8 `extreme` sweep): a MEASURE payload outside its
# declared domain is NULLED — the row survives, so attribution and
# counts are preserved and the corrupt reading is quarantined exactly
# like a failed try_cast (the reference contract is one attributed
# result per input regardless of payload). An EMBEDDING with a
# non-finite component or zero norm is EXCLUDED — a direction-less
# vector has no geometric meaning in any similarity/cluster operator.
#
# The bounds double as the accumulator-width contract: every decimal
# routing in the plans (DECIMAL(12..18,4) casts, functions/numeric.py)
# is overflow-free for any value inside its column's domain, so the
# ArithmeticException class the sweep found (1e15 quantities, ±1e308
# event values, NaN/Inf payloads blowing up ANSI decimal casts) cannot
# recur. Clean fixtures sit far inside every bound — the gates are
# no-ops on valid data and cost one map-side CASE per gated column.
LINEITEM_QTY_BOUND = 1.0e8  # |l_quantity|  — DECIMAL(12,4) sites safe
LINEITEM_PRICE_BOUND = 1.0e8  # |l_extendedprice|
EVENTS_VALUE_BOUND = 1.0e12  # |value| — DECIMAL(18,4) sites safe

# DuckDB mirror of the load_table gates. Prepended to every oracle SQL
# (plans/registry.py wraps via with_ingest_cte) — CTE names shadow the
# raw views, so the oracle reads exactly what Spark reads. Unused CTEs
# cost nothing (DuckDB only executes referenced CTEs).
INGEST_CTE = (
    "lineitem AS (SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,"
    f" CASE WHEN NOT isnan(l_quantity) AND abs(l_quantity) <= {LINEITEM_QTY_BOUND:.1f}"
    "       THEN l_quantity END AS l_quantity,"
    f" CASE WHEN NOT isnan(l_extendedprice) AND abs(l_extendedprice) <= {LINEITEM_PRICE_BOUND:.1f}"
    "       THEN l_extendedprice END AS l_extendedprice,"
    " CASE WHEN l_discount >= 0 AND l_discount <= 1 THEN l_discount END AS l_discount,"
    " CASE WHEN l_tax >= 0 AND l_tax <= 1 THEN l_tax END AS l_tax,"
    " l_returnflag, l_linestatus, l_shipdate FROM main.lineitem), "
    "events AS (SELECT event_id, ts, user_id, event_type,"
    f" CASE WHEN NOT isnan(value) AND abs(value) <= {EVENTS_VALUE_BOUND:.1f}"
    "       THEN value END AS value,"
    " props FROM main.events), "
    "embeddings AS (SELECT vec_id, embedding, label FROM main.embeddings"
    " WHERE embedding IS NULL OR ("
    "   len(list_filter(embedding, x -> NOT isfinite(x))) = 0"
    "   AND list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x)) > 0))"
)


def with_ingest_cte(sql: str) -> str:
    """Prepend the ingest-domain CTEs to an oracle SQL string, merging
    with an existing WITH / WITH RECURSIVE clause."""
    s = sql.lstrip()
    upper = s.upper()
    if upper.startswith("WITH RECURSIVE"):
        return f"WITH RECURSIVE {INGEST_CTE}, {s[len('WITH RECURSIVE'):].lstrip()}"
    if upper.startswith("WITH"):
        return f"WITH {INGEST_CTE}, {s[len('WITH'):].lstrip()}"
    return f"WITH {INGEST_CTE} {s}"


def _apply_ingest_domains(df: DataFrame, name: str) -> DataFrame:
    """Spark half of the ingest-domain contract (see INGEST_CTE)."""
    from pyspark.sql import functions as F

    def bounded(col: str, bound: float):
        c = F.col(col)
        # NaN fails isnan-guard; ±Inf fails abs<=bound (NaN/Inf compare
        # the same way in both engines here: the WHEN is false → NULL).
        return F.when(~F.isnan(c) & (F.abs(c) <= F.lit(bound)), c)

    def unit_interval(col: str):
        c = F.col(col)
        return F.when((c >= 0) & (c <= 1), c)

    if name == "lineitem":
        return (
            df.withColumn("l_quantity", bounded("l_quantity", LINEITEM_QTY_BOUND))
            .withColumn(
                "l_extendedprice", bounded("l_extendedprice", LINEITEM_PRICE_BOUND)
            )
            .withColumn("l_discount", unit_interval("l_discount"))
            .withColumn("l_tax", unit_interval("l_tax"))
        )
    if name == "events":
        return df.withColumn("value", bounded("value", EVENTS_VALUE_BOUND))
    if name == "embeddings":
        e = F.col("embedding")
        finite = F.forall(
            e, lambda x: ~F.isnan(x) & (F.abs(x) != F.lit(float("inf")))
        )
        norm_sq = F.aggregate(
            e, F.lit(0.0), lambda a, x: a + x.cast("double") * x.cast("double")
        )
        return df.filter(e.isNull() | (finite & (norm_sq > 0)))
    return df


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


# ---------------------------------------------------------------------------
# Write-side fixture validation (round-10): the read-side ingest gate
# above is correct but puts a CASE projection between every measure
# predicate and the parquet scan, killing PushedFilters on
# l_quantity / l_extendedprice / value (ENGINEERING_NOTES "Known
# cost"). The production shape is a one-time VALIDATION JOB at ingest:
# apply the domain once, write a validated copy, and let every query
# scan the validated files with full predicate pushdown. That job is
# below; load_table serves the validated copy for the gated tables.
# The read-side path is kept behind SPARK_GRAFT_READSIDE_GATE=1 — the
# degradation sweeps set it so the per-row gate semantics stay
# exercised against the DuckDB INGEST_CTE mirror.
# ---------------------------------------------------------------------------
_GATED_TABLES = ("lineitem", "events", "embeddings")


def _resolve_validated_root(
    master: str, spill_dir: str | None, checkpoint_dir: str | None
) -> str:
    """Resolve the validated-copy cache root via the SAME shared-storage
    ladder as ``operators/dedup._spill_to_temp_parquet`` — executors do
    the writing, so on a multi-node cluster the root MUST be storage
    every executor AND the driver can reach:

    1. ``SPARK_GRAFT_VALIDATED_DIR`` (explicit override — sweeps/tests),
    2. ``spark.burla.spillDir`` (session conf; a bucket / shared-FS
       path on a real cluster),
    3. the session's checkpoint dir (already required to be shared),
    4. local*-mode only (incl. local-cluster — several JVMs, one
       machine): a per-user home-dir cache (``~/.burla_spark/validated``
       — NOT a predictable world-writable /tmp path another local user
       could pre-seed with a forged ``_VALIDATED`` marker; same
       placement as jobs.DEFAULT_JOURNAL_DIR),
    5. non-local master with no shared dir: refuse rather than serve a
       driver-local path executors can't see."""
    env = os.environ.get("SPARK_GRAFT_VALIDATED_DIR")
    if env:
        return env
    if spill_dir:
        return f"{spill_dir.rstrip('/')}/burla_spark_validated"
    if checkpoint_dir:
        return f"{checkpoint_dir.rstrip('/')}/burla_spark_validated"
    if master.startswith("local"):
        return os.path.expanduser("~/.burla_spark/validated")
    raise RuntimeError(
        "validated-fixture cache requires shared storage on a cluster: "
        "set spark.burla.spillDir (or a checkpoint dir, or "
        "SPARK_GRAFT_VALIDATED_DIR) to a path all executors can reach"
    )


def _validated_root(spark: SparkSession) -> str:
    return _resolve_validated_root(
        spark.conf.get("spark.master", ""),
        spark.conf.get("spark.burla.spillDir", None),
        spark.sparkContext.getCheckpointDir(),
    )


def _readside_gate() -> bool:
    return os.environ.get("SPARK_GRAFT_READSIDE_GATE", "") == "1"


def _fixture_key(sf_dir: str, name: str) -> str:
    """Cache key for one table's validated copy: source path + file
    stats, so a regenerated (sweep-degraded) fixture re-validates.
    Directory-shaped fixtures fold every contained file's (relpath,
    size, mtime) into the key — a part-file rewritten in place changes
    the key even when the directory's own stat doesn't (ADVICE r10)."""
    import hashlib

    path = table_path(sf_dir, name)
    h = hashlib.sha256(os.path.abspath(path).encode())
    if os.path.isdir(path):
        for root, _dirs, files in sorted(os.walk(path)):
            for f in sorted(files):
                fp = os.path.join(root, f)
                st = os.stat(fp)
                rel = os.path.relpath(fp, path)
                h.update(f"|{rel}|{st.st_mtime_ns}|{st.st_size}".encode())
    else:
        st = os.stat(path)
        h.update(f"|{st.st_mtime_ns}|{st.st_size}".encode())
    return h.hexdigest()[:20]


def _hadoop_fs(spark: SparkSession, path_str: str):
    """(FileSystem, Path) for ``path_str`` under the session's Hadoop
    conf — the view the EXECUTORS write through, which on a real
    cluster is not the driver's local POSIX filesystem."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(path_str)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, path


_VALIDATED_MARKER = "_VALIDATED"


def validated_table_path(spark: SparkSession, sf_dir: str, name: str) -> str:
    """Run the one-time validation job for ``name`` if its validated
    copy isn't cached yet; return the validated parquet path. The copy
    is the ingest-domain projection materialized — at 100 TB this is
    the ingest pipeline's validation stage writing the curated layer,
    so analytical scans get parquet min/max pruning and PushedFilters
    on measure columns instead of re-deriving the gate per query.

    Existence checks and the publish go through the Hadoop FileSystem
    (the filesystem Spark actually wrote to), not ``os.path`` — on a
    cluster the two views diverge. Publish protocol: write to a unique
    tmp dir, move it into place, then create an explicit
    ``_VALIDATED`` marker LAST; readers key on the marker, so they see
    absent-or-complete even where the move is a non-atomic object-store
    copy (rename would also be impossible there via os.rename)."""
    import time
    import uuid

    dest = "/".join(
        (_validated_root(spark), _fixture_key(sf_dir, name), f"{name}.parquet")
    )
    fs, dest_path = _hadoop_fs(spark, dest)
    jvm = spark._jvm
    marker = jvm.org.apache.hadoop.fs.Path(f"{dest}/{_VALIDATED_MARKER}")
    if fs.exists(marker):
        return dest
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        df = normalize_events_ts(df)
    df = _apply_ingest_domains(df, name)
    tmp = f"{dest}.tmp-{uuid.uuid4().hex[:12]}"
    df.write.mode("overwrite").parquet(tmp)
    tmp_path = jvm.org.apache.hadoop.fs.Path(tmp)
    fs.mkdirs(dest_path.getParent())
    if fs.rename(tmp_path, dest_path):
        fs.create(marker, True).close()  # marker last: publish complete
    else:
        # a concurrent validator won the move — drop our copy and wait
        # briefly for the winner's marker (its write is already done;
        # only the marker create can still be in flight).
        fs.delete(tmp_path, True)
        for _ in range(100):
            if fs.exists(marker):
                break
            time.sleep(0.1)
    return dest


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a DataFrame."""
    if name not in TABLE_NAMES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name in _GATED_TABLES and not _readside_gate():
        df = spark.read.parquet(validated_table_path(spark, sf_dir, name))
        if name == "events":
            df = normalize_events_ts(df)  # µs passthrough branch
        return df
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        df = normalize_events_ts(df)
    return _apply_ingest_domains(df, name)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql()."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
