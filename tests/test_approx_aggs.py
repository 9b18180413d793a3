"""Approximate aggregates (SURVEY §2.B: approx_count_distinct HLL++,
percentile_approx) — tolerance-checked against exact values. These have
no cross-engine oracle by nature (sketch internals differ), so the gate
is relative error, not hash equality."""

from __future__ import annotations

from pyspark.sql import functions as F

from burla_spark.sources.tables import load_table


def test_approx_count_distinct_within_5pct(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    row = l.agg(
        F.countDistinct("l_orderkey").alias("exact"),
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.05


def test_percentile_approx_close_to_exact(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    row = l.agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.01


def test_approx_quantiles_multi(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    qs = o.stat.approxQuantile("o_totalprice", [0.25, 0.5, 0.75], 0.01)
    assert qs == sorted(qs)
    exact_mid = o.agg(F.expr("percentile(o_totalprice, 0.5)")).collect()[0][0]
    assert abs(qs[1] - exact_mid) / exact_mid < 0.05
