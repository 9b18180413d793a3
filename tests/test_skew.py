"""Salted aggregation/join equivalence + plan-shape regression tests
(pushdown and broadcast assertions for the headline plans)."""

from __future__ import annotations

from pyspark.sql import functions as F

from burla_spark.functions.numeric import dec
from burla_spark.operators.skew import salted_aggregate, salted_broadcast_left
from burla_spark.sources.tables import load_table


def test_salted_aggregate_matches_plain(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    plain = {
        tuple(r[:1]): (r[1], r[2])
        for r in l.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.sum(dec("l_quantity")).cast("double").alias("qty"),
        )
        .collect()
    }
    salted = {
        tuple(r[:1]): (r[1], r[2])
        for r in salted_aggregate(
            l,
            ["l_returnflag"],
            {"n": F.count("*"), "qty": F.sum(dec("l_quantity"))},
            buckets=16,
            reaggs={"n": F.sum("n"), "qty": F.sum("qty").cast("double")},
        ).collect()
    }
    assert plain == salted


def test_salted_broadcast_join_matches_plain(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_quantity")
    s = load_table(spark, sf_dir, "supplier").withColumnRenamed("s_suppkey", "l_suppkey")
    plain = l.join(s, "l_suppkey").agg(
        F.count("*").alias("n"), F.sum(dec("l_quantity")).cast("double").alias("q")
    ).collect()[0]
    salted = salted_broadcast_left(l, s, "l_suppkey", buckets=8).agg(
        F.count("*").alias("n"), F.sum(dec("l_quantity")).cast("double").alias("q")
    ).collect()[0]
    assert plain.n == salted.n and plain.q == salted.q


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q3_plan_shape(spark, sf_dir):
    from burla_spark.plans.relational import q3_shipping_priority

    df = q3_shipping_priority(spark, sf_dir)
    df.collect()  # let AQE finalize
    plan = _executed_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)" in plan


def test_q1_scan_is_pruned(spark, sf_dir):
    from burla_spark.plans.relational import q1_pricing_summary

    plan = _executed_plan(q1_pricing_summary(spark, sf_dir))
    # only the 7 needed columns are read, and the date filter reached
    # the parquet reader
    assert "l_orderkey" not in plan.split("ReadSchema")[1][:400]
    assert "LessThanOrEqual(l_shipdate" in plan


def test_q5_broadcasts_dims(spark, sf_dir):
    from burla_spark.plans.relational import q5_local_supplier_volume

    plan = _executed_plan(q5_local_supplier_volume(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 3  # supplier, nation, region
    assert "CartesianProduct" not in plan
