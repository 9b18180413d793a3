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


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q2_plan_single_exchange_single_scan(spark, sf_dir):
    """q2's correlated-min rewrite must keep exactly one shuffle and one
    lineitem scan: part filter pushed before the agg (broadcast), window
    min reusing the repartition — a regression here doubles the 100 TB
    scan cost."""
    from burla_spark.plans.relational6 import q2_min_cost_supplier

    plan = _plan(q2_min_cost_supplier(spark, sf_dir))
    assert plan.count("lineitem.parquet") == 1, "lineitem scanned more than once"
    # the only non-broadcast exchange is the explicit repartition
    shuffles = [
        l for l in plan.splitlines()
        if "Exchange hashpartitioning" in l and "Broadcast" not in l
    ]
    assert len(shuffles) == 1, f"expected 1 shuffle, got {len(shuffles)}"
    assert "TakeOrderedAndProject" in plan


def test_q21_plan_semi_anti_no_nested_loop(spark, sf_dir):
    """q21's EXISTS/NOT-EXISTS must compile to semi/anti hash joins,
    never a nested-loop product."""
    from burla_spark.plans.relational6 import q21_sole_failing_supplier

    plan = _plan(q21_sole_failing_supplier(spark, sf_dir))
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_feature_zscore_moments_broadcast(spark, sf_dir):
    """The standardizer's join-back of per-group moments must broadcast
    (a shuffle of the fact table against a 5-row moments table would be
    the wrong plan at any scale)."""
    from burla_spark.plans.mlprep import feature_zscore

    plan = _plan(feature_zscore(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_dynamic_partition_pruning_on_partitioned_fact(spark, sf_dir, tmp_path):
    """Dynamic partition pruning — the feature that makes a 100 TB
    date/priority-partitioned fact table readable through a selective
    dim join: the fact scan's partition filter comes from the OTHER
    side's runtime result, so only matching partitions are read even
    though the literal filter sits on the dim. Asserted in the plan
    (a dynamicpruning subquery on the fact scan)."""
    from burla_spark.sources.tables import load_table

    fact_dir = str(tmp_path / "orders_part")
    load_table(spark, sf_dir, "orders").write.partitionBy(
        "o_orderpriority"
    ).parquet(fact_dir)
    fact = spark.read.parquet(fact_dir)
    dim = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderpriority")
        .distinct()
        .filter(F.col("o_orderpriority").startswith("1-"))
    )
    joined = fact.join(dim.hint("broadcast"), "o_orderpriority").groupBy(
        "o_orderpriority"
    ).count()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    rows = joined.collect()
    assert len(rows) == 1 and rows[0]["o_orderpriority"].startswith("1-")


def test_runtime_bloom_filter_prunes_fact_side(spark, sf_correctness_dir):
    """Runtime row-level filtering (the third pruning lever next to
    static pushdown and dynamic partition pruning): a selective dim
    filter injects a bloom filter into the FACT side's scan, so
    non-matching lineitem rows drop before the shuffle — at 100 TB
    that is the difference between shuffling the whole fact table and
    shuffling the ~selectivity fraction that can possibly join.
    Asserts the might_contain predicate lands in the optimized plan
    AND that results are identical with the filter off."""
    from pyspark.sql import functions as F

    sf = sf_correctness_dir
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force shuffle join
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        # fixture tables are tiny; drop the size gates so the tiny scan
        # qualifies as an "application side" worth protecting
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}

    def build():
        o = spark.read.parquet(f"{sf}/orders.parquet").filter(
            F.col("o_totalprice") > 450000
        )
        li = spark.read.parquet(f"{sf}/lineitem.parquet")
        return (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
            .orderBy("o_orderpriority")
        )

    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        with_bloom = build()
        plan = with_bloom._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan, "bloom filter not injected"
        got = [(r.o_orderpriority, r.n) for r in with_bloom.collect()]
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        baseline = [(r.o_orderpriority, r.n) for r in build().collect()]
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
    assert got == baseline and len(got) > 0
