"""operators/quality.py — single-pass rule compilation and
Observation-based zero-extra-pass accounting."""

from __future__ import annotations

from pyspark.sql import functions as F

from burla_spark.operators.quality import observed_counts, quality_summary
from burla_spark.sources.tables import load_table


def test_quality_summary_matches_direct_counts(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    rules = {
        "high_qty": F.col("l_quantity") > 45,
        "never": F.col("l_orderkey") < 0,
    }
    got = {r["check"]: (r.n_violations, r.n_rows) for r in quality_summary(l, rules).collect()}
    n = l.count()
    high = l.filter("l_quantity > 45").count()
    assert got == {"high_qty": (high, n), "never": (0, n)}


def test_quality_summary_is_single_scan(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    rules = {
        "a": F.col("l_quantity") > 45,
        "b": F.col("l_discount") > 0.08,
        "c": F.col("l_tax") > 0.05,
    }
    plan = quality_summary(l, rules)._jdf.queryExecution().executedPlan().toString()
    # all rules fuse into one aggregate over one scan — rule count must
    # not multiply scans (that's the whole point at 100 TB).
    assert plan.count("FileScan parquet") == 1


def test_observed_counts_ride_existing_action(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    df, obs = observed_counts(l, {"high_qty": F.col("l_quantity") > 45})
    # the "existing job": an unrelated aggregation
    total = df.agg(F.sum("l_quantity")).collect()[0][0]
    assert total > 0
    m = obs.get
    assert m["n_rows"] == l.count()
    assert m["high_qty"] == l.filter("l_quantity > 45").count()
