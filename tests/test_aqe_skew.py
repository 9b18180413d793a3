"""AQE skew-join evidence: a deliberately skewed join (one hot key
holding ~50% of rows) must either trigger AQE's skew-split or complete
with correct results under the salted fallback — both paths asserted.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from burla_spark.operators.skew import salted_broadcast_left


def _skewed_frames(spark, n=400_000, hot_share=0.5):
    big = spark.range(n).select(
        F.when(F.col("id") < n * hot_share, F.lit(7))
        .otherwise((F.col("id") % 1000).cast("long"))
        .alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("w")
    )
    return big, small


def test_skewed_join_correct_under_aqe(spark):
    big, small = _skewed_frames(spark)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = big.join(small, "k")
        n = joined.count()
        assert n == big.count()  # every k in [0,1000) matches exactly once
        hot = joined.filter(F.col("k") == 7).count()
        # 200k hot rows + the id%1000==7 stragglers from the long tail
        assert hot == 200_000 + 200
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_salted_join_spreads_hot_key(spark):
    big, small = _skewed_frames(spark, n=100_000)
    out = salted_broadcast_left(big, small, "k", buckets=8)
    assert out.count() == 100_000
    # the salt column is dropped and values survive intact
    assert set(out.columns) == {"k", "v", "w"}
    sample = out.filter(F.col("k") == 7).limit(1).collect()[0]
    assert sample.w == 70
