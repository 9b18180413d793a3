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

# Knuth multiplicative hash, then an outer prime mod. The key is
# reduced mod the prime BEFORE the multiply (modmul) so the product
# stays under (1e9 * 6.6e8) ≈ 6.6e17 < int64 max for EVERY int64 key —
# the naive (key * MULT) % MOD silently wraps in Spark but raises in
# DuckDB once keys pass ~3.5e9, which a 100 TB doc_id space will.
# For keys below that threshold the modmul is value-identical to the
# naive form, so the hash (and every oracle) is unchanged at test SFs.
_HASH_MULT = 2654435761
_HASH_MOD = 1000000007
_HASH_MULT_RED = _HASH_MULT % _HASH_MOD  # 654435747


def _affine_hash(key):
    """Overflow-safe (key * MULT) % MOD as a Column, exact on both engines."""
    return ((key % F.lit(_HASH_MOD)) * F.lit(_HASH_MULT_RED)) % F.lit(_HASH_MOD)


def _affine_hash_sql(expr: str) -> str:
    """The same modmul as ANSI SQL text for the DuckDB oracle side."""
    return f"((({expr}) % {_HASH_MOD}) * {_HASH_MULT_RED}) % {_HASH_MOD}"


def _split_bucket(key):
    return _affine_hash(key) % F.lit(100)


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
  CASE WHEN {_affine_hash_sql("o_orderkey")} % 100 < 80
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
    hash_order = _affine_hash(F.col("c_custkey"))
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
           ORDER BY {_affine_hash_sql("c_custkey")}, c_custkey
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
            # + 0.0: signed-zero normalization (contract rule 13) — a row
            # whose price sits within 0.5e-6 of the group mean rounds to
            # -0.0 in DuckDB but 0.0 in Spark.
            (
                F.round(
                    (F.col("o_totalprice") - F.col("mean_price"))
                    / F.sqrt(F.col("var_price")),
                    6,
                )
                + F.lit(0.0)
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
       ROUND((o_totalprice - mean_price) / SQRT(var_price), 6) + 0.0 AS z_price
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
    # per-row ROUND of the pow is engine-exact; the normalizer sums the
    # rounded weights through a DECIMAL cast so z is order-independent
    # (contract rule 1 — a raw double SUM could shift by an ULP across
    # partitionings and flip the final ROUND at a 6-dp boundary).
    per = per.withColumn(
        "w_raw", F.round(F.pow(F.col("n_tokens").cast("double"), F.lit(0.3)), 6)
    )
    totals = per.agg(
        F.sum("n_tokens").alias("tok_total"),
        F.sum(F.col("w_raw").cast("decimal(38,6)")).alias("z"),
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
            F.round(
                F.col("w_raw") / F.col("z").cast("double"), 6
            ).alias("mixture_weight"),
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
  SELECT *, ROUND(POW(CAST(n_tokens AS DOUBLE), 0.3), 6) AS w_raw FROM per
), totals AS (
  SELECT SUM(n_tokens) AS tok_total,
         SUM(CAST(w_raw AS DECIMAL(38,6))) AS z
  FROM w
)
SELECT source, n_docs, n_tokens,
       ROUND(CAST(n_tokens AS DOUBLE) / CAST(tok_total AS DOUBLE), 6)
         AS natural_weight,
       ROUND(w_raw / CAST(z AS DOUBLE), 6) AS mixture_weight
FROM w, totals
ORDER BY source
"""


def winsorize_quantity_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization (percentile capping) — the outlier-handling prep
    step: clamp each value to its group's [p05, p95] band and report
    clamp counts and the before/after means. Integer-valued l_quantity
    keeps the threshold comparisons engine-exact: a fractional
    threshold can never equal an integer value, and when the
    interpolation lands exactly on a data point both engines get the
    same integer (see agg_percentiles).

    100 TB shape: one scan builds the per-group thresholds (exact
    percentile — swap in approx_percentile at real scale, same plan),
    broadcast join-back, second scan clamps + aggregates. Both scans
    column-pruned; the only shuffle is group-cardinality."""
    l = load_table(spark, sf_dir, "lineitem")
    bands = l.groupBy("l_linestatus").agg(
        F.percentile("l_quantity", 0.05).alias("lo"),
        F.percentile("l_quantity", 0.95).alias("hi"),
    )
    clamped = F.when(F.col("l_quantity") < F.col("lo"), F.col("lo")).when(
        F.col("l_quantity") > F.col("hi"), F.col("hi")
    ).otherwise(F.col("l_quantity").cast("double"))
    return (
        l.join(F.broadcast(bands), "l_linestatus")
        .groupBy("l_linestatus")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum((F.col("l_quantity") < F.col("lo")).cast("long")).alias(
                "n_clamped_low"
            ),
            F.sum((F.col("l_quantity") > F.col("hi")).cast("long")).alias(
                "n_clamped_high"
            ),
            F.round(
                F.sum(dec("l_quantity")).cast("double") / F.count("*"), 6
            ).alias("mean_before"),
            F.round(
                F.sum(clamped.cast("decimal(18,4)")).cast("double")
                / F.count("*"),
                6,
            ).alias("mean_after"),
        )
        .orderBy("l_linestatus")
    )


WINSORIZE_SQL = """
WITH bands AS (
  SELECT l_linestatus,
         quantile_cont(l_quantity, 0.05) AS lo,
         quantile_cont(l_quantity, 0.95) AS hi
  FROM lineitem GROUP BY l_linestatus
)
SELECT l.l_linestatus,
  CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(SUM(CASE WHEN l_quantity < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_low,
  CAST(SUM(CASE WHEN l_quantity > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_high,
  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 6) AS mean_before,
  ROUND(CAST(SUM(CAST(
      CASE WHEN l_quantity < lo THEN lo
           WHEN l_quantity > hi THEN hi
           ELSE CAST(l_quantity AS DOUBLE) END AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 6) AS mean_after
FROM lineitem l JOIN bands USING (l_linestatus)
GROUP BY l.l_linestatus
ORDER BY l.l_linestatus
"""


def target_encoding_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target (mean) encoding — the categorical-feature
    encoder that replaces each category with the mean target of the
    OTHER rows in its category, preventing the self-leakage plain mean
    encoding has. Sums stay exact DECIMAL; only the final division is
    double (identical operands on both engines → identical bits).

    100 TB shape: category stats are one group-cardinality aggregate,
    broadcast back — each row's encoding is then map-side arithmetic,
    no per-row window needed."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    stats = o.groupBy("o_orderpriority").agg(
        F.sum(dec("o_totalprice")).alias("t_sum"),
        F.count("*").alias("t_n"),
    )
    return (
        o.join(F.broadcast(stats), "o_orderpriority")
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.round(
                (F.col("t_sum") - dec("o_totalprice")).cast("double")
                / F.nullif(F.col("t_n") - 1, F.lit(0)).cast("double"),
                6,
            ).alias("loo_mean_price"),
        )
        .orderBy("o_orderkey")
    )


TARGET_ENCODING_SQL = """
WITH o AS (SELECT * FROM orders WHERE o_orderkey < 2000),
stats AS (
  SELECT o_orderpriority,
         SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS t_sum,
         COUNT(*) AS t_n
  FROM o GROUP BY o_orderpriority
)
SELECT o_orderkey, o.o_orderpriority,
  ROUND(CAST(t_sum - CAST(o_totalprice AS DECIMAL(18,4)) AS DOUBLE)
        / CAST(NULLIF(t_n - 1, 0) AS DOUBLE), 6) AS loo_mean_price
FROM o JOIN stats USING (o_orderpriority)
ORDER BY o_orderkey
"""


def weighted_sample_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis
    A-ES): per order-priority group, keep the top-10 orders by
    A-ES priority u^(1/w), where u is a deterministic hash-uniform and
    w = o_totalprice — ranked in the LOG domain, ln(u)/w, which orders
    identically (ln is monotone, w > 0) but keeps candidate keys
    well-separated doubles: u^(1/w) itself clusters within ~1e-9 of
    1.0 for large weights, where a 1-ulp pow() divergence between
    engines could in principle flip a rank; ln(u)/w gaps are orders of
    magnitude wider. The standard distributed weighted-subsample
    trick: one scan, one top-k per group, NO global sort and no
    rejection loop — and because u comes from the same multiplicative
    hash as the train/test split, the sample is reproducible across
    engines, runs, and partitionings (Spark's seeded sample() is not).

    100 TB shape: priorities are map-side arithmetic; the only shuffle
    is the per-group top-k window (or TakeOrderedAndProject when the
    group count is 1)."""
    # A-ES requires strictly positive weights (u^(1/w) / ln(u)/w are
    # undefined at w <= 0): zero/negative totals — credits, voided
    # orders — are excluded on both engine sides (extreme sweep).
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    # full-range hash-uniform (not _split_bucket's %100 coarsening:
    # sampling needs a dense u, the split only needs percent buckets)
    u = (
        (_affine_hash(F.col("o_orderkey")) + 1)
        .cast("double")
        / F.lit(float(_HASH_MOD + 1))
    )
    priority = F.log(u) / F.col("o_totalprice").cast("double")
    from pyspark.sql import Window

    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("sample_priority"), F.asc("o_orderkey")
    )
    return (
        o.select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            priority.alias("sample_priority"),
        )
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 10)
        .select(
            "o_orderpriority",
            "rank",
            "o_orderkey",
            # + 0.0 normalizes IEEE signed zero: ROUND of a tiny negative
            # yields -0.0 in DuckDB but 0.0 in Spark (determinism contract
            # rule 13); adding positive zero is the identity for every other
            # double and maps -0.0 -> +0.0 in both engines.
            (F.round("sample_priority", 9) + F.lit(0.0)).alias("sample_priority"),
        )
        .orderBy("o_orderpriority", "rank")
    )


WEIGHTED_SAMPLE_SQL = f"""
WITH scored AS (
  SELECT o_orderpriority, o_orderkey,
    LN(CAST({_affine_hash_sql("o_orderkey")} + 1 AS DOUBLE) / {_HASH_MOD + 1}.0)
      / CAST(o_totalprice AS DOUBLE) AS sample_priority
  FROM orders WHERE o_totalprice > 0
), ranked AS (
  SELECT *, CAST(ROW_NUMBER() OVER (
    PARTITION BY o_orderpriority
    ORDER BY sample_priority DESC, o_orderkey ASC) AS BIGINT) AS rank
  FROM scored
)
SELECT o_orderpriority, rank, o_orderkey,
       ROUND(sample_priority, 9) + 0.0 AS sample_priority
FROM ranked WHERE rank <= 10
ORDER BY o_orderpriority, rank
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
    QuerySpec(
        "winsorize_quantity_stats",
        winsorize_quantity_stats,
        WINSORIZE_SQL,
        ("mlprep", "agg", "outliers"),
        doc="Percentile capping at [p05, p95] per group, clamp accounting.",
    ),
    QuerySpec(
        "target_encoding_loo",
        target_encoding_loo,
        TARGET_ENCODING_SQL,
        ("mlprep", "encoding"),
        doc="Leave-one-out mean target encoding via exact DECIMAL sums.",
    ),
    QuerySpec(
        "weighted_sample_orders",
        weighted_sample_orders,
        WEIGHTED_SAMPLE_SQL,
        ("mlprep", "sampling", "window"),
        doc="Efraimidis-Spirakis weighted top-10 sample per group, "
        "hash-deterministic across engines and partitionings.",
    ),
]
