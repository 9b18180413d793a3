"""ML data-prep operators (the training-data-pipeline surface beyond
dedup/similarity): deterministic train/test splitting, feature binning,
z-score standardization, and class weighting.

All four are pure Catalyst plans with exact DuckDB oracles. The split
uses multiplicative hashing on the key instead of ``sample()`` —
Spark's seeded sample is not reproducible across plan rebuilds
(ENGINEERING_NOTES.md), while a hash split is stable across engines,
runs, partitionings, and cluster sizes, which is what a 100 TB
training pipeline actually needs (re-running the pipeline must not
move examples between train and test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from burla_spark.functions.numeric import dec
from burla_spark.plans.base import QuerySpec
from burla_spark.sources.tables import load_table

# Knuth multiplicative hash, then an outer prime mod to keep the
# product inside int64 for keys < ~3.4e9 (mod the key first if keys can
# exceed that). Both engines evaluate this in exact BIGINT arithmetic.
_HASH_MULT = 2654435761
_HASH_MOD = 1000000007


def _split_bucket(key):
    return (key * F.lit(_HASH_MULT)) % F.lit(_HASH_MOD) % F.lit(100)


def train_test_split_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/20 deterministic hash split of orders + per-split label stats.
    The split column is derived, never sampled — identical membership on
    every engine/run/partitioning."""
    o = load_table(spark, sf_dir, "orders")
    split = F.when(_split_bucket(F.col("o_orderkey")) < 80, "train").otherwise("test")
    return (
        o.withColumn("split", split)
        .groupBy("split")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(dec("o_totalprice")).cast("double").alias("total_price"),
            (F.sum(dec("o_totalprice")).cast("double") / F.count("*")).alias(
                "avg_price"
            ),
        )
        .orderBy("split")
    )


TRAIN_TEST_SPLIT_SQL = f"""
SELECT
  CASE WHEN (o_orderkey * {_HASH_MULT}) % {_HASH_MOD} % 100 < 80
       THEN 'train' ELSE 'test' END AS split,
  COUNT(*) AS n_rows,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_price
FROM orders
GROUP BY 1
ORDER BY split
"""


def group_sample_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-per-group sample: rows ordered by a
    multiplicative hash of the key within each group, top 5 kept. The
    "show me a few examples per class" primitive — unlike
    sampleBy()/LIMIT, membership is a pure function of the key, so
    every run, engine, and partitioning picks the SAME rows. One window
    over one shuffle on the group key; at 100 TB the hash order also
    decorrelates the sample from storage order."""
    from pyspark.sql import Window

    c = load_table(spark, sf_dir, "customer")
    hash_order = (F.col("c_custkey") * F.lit(_HASH_MULT)) % F.lit(_HASH_MOD)
    w = Window.partitionBy("c_mktsegment").orderBy(hash_order, "c_custkey")
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("c_mktsegment", "c_custkey", F.col("rn").cast("long").alias("rn"))
        .orderBy("c_mktsegment", "rn")
    )


GROUP_SAMPLE_SQL = f"""
SELECT c_mktsegment, c_custkey, rn FROM (
  SELECT c_mktsegment, c_custkey,
         ROW_NUMBER() OVER (
           PARTITION BY c_mktsegment
           ORDER BY (c_custkey * {_HASH_MULT}) % {_HASH_MOD}, c_custkey
         ) AS rn
  FROM customer
) WHERE rn <= 5
ORDER BY c_mktsegment, rn
"""


def feature_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width feature binning (histogram) of order totals — the
    discretization step of feature engineering. floor(x / width) on
    doubles is IEEE-identical on both engines."""
    o = load_table(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / F.lit(50000.0)).cast("long")
    return (
        o.withColumn("price_bin", bucket)
        .groupBy("price_bin")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("o_totalprice").alias("bin_min"),
            F.max("o_totalprice").alias("bin_max"),
        )
        .orderBy("price_bin")
    )


FEATURE_BINNING_SQL = """
SELECT CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) AS price_bin,
       COUNT(*) AS n_rows,
       MIN(o_totalprice) AS bin_min,
       MAX(o_totalprice) AS bin_max
FROM orders
GROUP BY 1
ORDER BY price_bin
"""


def feature_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row z-score standardization of o_totalprice within each
    order priority: exact decimal moments per group (the agg_stats
    recipe), broadcast back, per-row (x - mean) / sd in pure double
    arithmetic (IEEE-identical on both engines).

    At scale this is the canonical two-pass standardizer: one grouped
    agg over the full table (tiny result — one row per group), one
    map-side broadcast join — no second shuffle of the fact table."""
    o = load_table(spark, sf_dir, "orders")
    n = F.count("*").cast("double")
    sx = F.sum(dec("o_totalprice")).cast("double")
    sxx = F.round(
        F.sum(
            F.col("o_totalprice").cast("decimal(19,4)")
            * F.col("o_totalprice").cast("decimal(12,4)")
        ),
        0,
    ).cast("double")
    moments = o.groupBy(F.col("o_orderpriority").alias("pri")).agg(
        ((sxx - sx * sx / n) / n).alias("var_price"),
        (sx / n).alias("mean_price"),
    )
    return (
        o.filter(F.col("o_orderkey") < 500)
        .join(F.broadcast(moments), o.o_orderpriority == F.col("pri"))
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.round(
                (F.col("o_totalprice") - F.col("mean_price"))
                / F.sqrt(F.col("var_price")),
                6,
            ).alias("z_price"),
        )
        .orderBy("o_orderkey")
    )


FEATURE_ZSCORE_SQL = """
WITH moments AS (
  SELECT o_orderpriority AS pri,
    (CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(19,4)) * CAST(o_totalprice AS DECIMAL(12,4))), 0) AS DOUBLE)
      - CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        * CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
      / CAST(COUNT(*) AS DOUBLE) AS var_price,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_price
  FROM orders GROUP BY 1
)
SELECT o_orderkey, o_orderpriority,
       ROUND((o_totalprice - mean_price) / SQRT(var_price), 6) AS z_price
FROM orders JOIN moments ON o_orderpriority = pri
WHERE o_orderkey < 500
ORDER BY o_orderkey
"""


def class_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-frequency class weights over event types —
    weight = total / (k * count), the standard imbalanced-label
    reweighting. Exact long counts → identical doubles."""
    e = load_table(spark, sf_dir, "events")
    counts = e.groupBy("event_type").agg(F.count("*").alias("n"))
    totals = counts.agg(
        F.sum("n").alias("total"), F.count("*").alias("k")
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "event_type",
            F.col("n").alias("n_rows"),
            (
                F.col("total").cast("double")
                / (F.col("k").cast("double") * F.col("n").cast("double"))
            ).alias("weight"),
        )
        .orderBy("event_type")
    )


CLASS_WEIGHTS_SQL = """
WITH counts AS (
  SELECT event_type, COUNT(*) AS n FROM events GROUP BY 1
), totals AS (
  SELECT SUM(n) AS total, COUNT(*) AS k FROM counts
)
SELECT event_type, n AS n_rows,
       CAST(total AS DOUBLE) / (CAST(k AS DOUBLE) * CAST(n AS DOUBLE)) AS weight
FROM counts, totals
ORDER BY event_type
"""


def temperature_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source-mixture weights — the domain-mixing
    step of a pretraining pipeline: per source, sampling weight
    ∝ n_tokens^alpha (alpha=0.3) normalized over sources, shown next
    to the natural (proportional) weight so the flattening is visible.
    Low temperatures up-sample small high-quality domains exactly this
    way (GPT-3 / The Pile style mixture construction).

    100 TB shape: ONE corpus scan column-pruned to (source, text) →
    a source-cardinality aggregate (tiny); the normalizer is a 1-row
    broadcast. Token counts stay exact BIGINTs; only the final
    weights are doubles (rounded, per the determinism contract)."""
    d = load_table(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(
            F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
        ).alias("n_tokens"),
    )
    per = per.withColumn(
        "w_raw", F.pow(F.col("n_tokens").cast("double"), F.lit(0.3))
    )
    totals = per.agg(
        F.sum("n_tokens").alias("tok_total"), F.sum("w_raw").alias("z")
    )
    return (
        per.crossJoin(F.broadcast(totals))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.round(
                F.col("n_tokens").cast("double")
                / F.col("tok_total").cast("double"),
                6,
            ).alias("natural_weight"),
            F.round(F.col("w_raw") / F.col("z"), 6).alias("mixture_weight"),
        )
        .orderBy("source")
    )


TEMPERATURE_MIXTURE_SQL = r"""
WITH per AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT)
           AS n_tokens
  FROM documents GROUP BY source
), w AS (
  SELECT *, POW(CAST(n_tokens AS DOUBLE), 0.3) AS w_raw FROM per
), totals AS (
  SELECT SUM(n_tokens) AS tok_total, SUM(w_raw) AS z FROM w
)
SELECT source, n_docs, n_tokens,
       ROUND(CAST(n_tokens AS DOUBLE) / CAST(tok_total AS DOUBLE), 6)
         AS natural_weight,
       ROUND(w_raw / z, 6) AS mixture_weight
FROM w, totals
ORDER BY source
"""


SPECS = [
    QuerySpec(
        "train_test_split_stats",
        train_test_split_stats,
        TRAIN_TEST_SPLIT_SQL,
        ("mlprep", "agg"),
        doc="Deterministic multiplicative-hash 80/20 split (stable across "
        "engines/partitionings, unlike sample()).",
    ),
    QuerySpec(
        "feature_binning",
        feature_binning,
        FEATURE_BINNING_SQL,
        ("mlprep", "agg"),
        doc="Equal-width feature discretization histogram.",
    ),
    QuerySpec(
        "feature_zscore",
        feature_zscore,
        FEATURE_ZSCORE_SQL,
        ("mlprep", "agg", "join"),
        doc="Two-pass z-score standardization via exact decimal moments "
        "+ broadcast join-back.",
    ),
    QuerySpec(
        "class_weights",
        class_weights,
        CLASS_WEIGHTS_SQL,
        ("mlprep", "agg"),
        doc="Inverse-frequency class weights for imbalanced labels.",
    ),
    QuerySpec(
        "group_sample_rows",
        group_sample_rows,
        GROUP_SAMPLE_SQL,
        ("mlprep", "sampling", "window"),
        doc="Deterministic hash-ordered k-per-group sample.",
    ),
    QuerySpec(
        "temperature_mixture_weights",
        temperature_mixture_weights,
        TEMPERATURE_MIXTURE_SQL,
        ("mlprep", "agg", "mixture"),
        doc="Temperature-scaled (alpha=0.3) source-mixture sampling weights.",
    ),
]
