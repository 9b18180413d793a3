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


def test_hll_md5_registers_estimate_tracks_truth(spark, sf_dir):
    """The md5-register companion (plans/ann_oracle.hll_registers_md5)
    is only meaningful if the standard HLL estimator computed FROM
    those registers tracks the true distinct count — this closes the
    loop the oracle row can't (the estimate is driver-side float
    math). p=6 -> 64 registers, rse ~ 1.04/sqrt(64) ~ 13%."""
    from burla_spark.plans.ann_oracle import HLL_P, hll_registers_md5
    from burla_spark.sources.tables import load_table

    m = 1 << HLL_P
    regs = {r["register"]: r["max_rho"] for r in
            hll_registers_md5(spark, sf_dir).collect()}
    rhos = [regs.get(i, 0) for i in range(m)]
    alpha = 0.709  # HLL alpha_64
    raw = alpha * m * m / sum(2.0 ** -r for r in rhos)
    zeros = rhos.count(0)
    import math
    est = m * math.log(m / zeros) if (raw <= 2.5 * m and zeros) else raw
    true = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey").distinct().count()
    )
    assert abs(est - true) / true < 0.4, (est, true)
