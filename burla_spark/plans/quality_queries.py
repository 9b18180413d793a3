"""Data-quality summary as a registry query — the declarative rule set
from operators/quality.py compiled to one scan + one-row shuffle, then
unpivoted to (check, n_violations, n_rows). The oracle is the same
conditional counts spelled as a wide aggregate + UNION ALL unpivot."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from burla_spark.operators.quality import quality_summary
from burla_spark.plans.base import QuerySpec
from burla_spark.sources.tables import load_table


def data_quality_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    rules = {
        "high_quantity": F.col("l_quantity") > 45,
        "deep_discount": F.col("l_discount") > 0.08,
        "bad_returnflag": ~F.col("l_returnflag").isin("A", "N", "R"),
        "null_shipdate": F.col("l_shipdate").isNull(),
    }
    return quality_summary(l, rules)


DATA_QUALITY_SQL = """
WITH wide AS (
  SELECT COUNT(CASE WHEN l_quantity > 45 THEN 1 END) AS high_quantity,
         COUNT(CASE WHEN l_discount > 0.08 THEN 1 END) AS deep_discount,
         COUNT(CASE WHEN l_returnflag NOT IN ('A','N','R') THEN 1 END)
           AS bad_returnflag,
         COUNT(CASE WHEN l_shipdate IS NULL THEN 1 END) AS null_shipdate,
         COUNT(*) AS n_rows
  FROM lineitem
)
SELECT 'bad_returnflag' AS "check", bad_returnflag AS n_violations, n_rows FROM wide
UNION ALL
SELECT 'deep_discount', deep_discount, n_rows FROM wide
UNION ALL
SELECT 'high_quantity', high_quantity, n_rows FROM wide
UNION ALL
SELECT 'null_shipdate', null_shipdate, n_rows FROM wide
ORDER BY "check"
"""


def table_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column statistics — the optimizer-food pass
    (ndv / null count / min / max per column) a catalog collects so a
    CBO can size joins and pick broadcast sides. One wide aggregate
    over ONE scan (count_distinct + conditional counts fuse into a
    single partial-agg pipeline; no per-column rescans), unpivoted to
    the catalog's (column, n_rows, n_nulls, ndv, min, max) rows.
    min/max stringified so heterogeneous column types share a schema
    (dates render ISO — identical on both engines).

    100 TB shape: exact NDV is a demonstration-scale choice — the same
    wide-agg shape swaps in approx_count_distinct/HLL for production
    (hll_cardinality_sketch covers that path); everything else is a
    map-side conditional count."""
    l = load_table(spark, sf_dir, "lineitem")
    cols = ["l_returnflag", "l_linestatus", "l_linenumber", "l_shipdate"]
    wide = l.agg(
        F.count("*").alias("n_rows"),
        *[
            agg
            for c in cols
            for agg in (
                # count-of-flag, not SUM(CASE): SUM over zero rows is
                # NULL where the oracle's COUNT(CASE..) is 0 — a parity
                # red on an empty table (degraded-sweep shape)
                F.count(F.when(F.col(c).isNull(), True))
                .cast("long")
                .alias(f"{c}__nulls"),
                F.count_distinct(F.col(c)).alias(f"{c}__ndv"),
                F.min(F.col(c)).cast("string").alias(f"{c}__min"),
                F.max(F.col(c)).cast("string").alias(f"{c}__max"),
            )
        ],
    )
    parts = [
        wide.select(
            F.lit(c).alias("column"),
            F.col("n_rows"),
            F.col(f"{c}__nulls").alias("n_nulls"),
            F.col(f"{c}__ndv").alias("ndv"),
            F.col(f"{c}__min").alias("min_value"),
            F.col(f"{c}__max").alias("max_value"),
        )
        for c in cols
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("column")


TABLE_COLUMN_STATS_SQL = """
WITH wide AS (
  SELECT COUNT(*) AS n_rows,
    COUNT(CASE WHEN l_returnflag IS NULL THEN 1 END) AS rf_nulls,
    COUNT(DISTINCT l_returnflag) AS rf_ndv,
    CAST(MIN(l_returnflag) AS VARCHAR) AS rf_min,
    CAST(MAX(l_returnflag) AS VARCHAR) AS rf_max,
    COUNT(CASE WHEN l_linestatus IS NULL THEN 1 END) AS ls_nulls,
    COUNT(DISTINCT l_linestatus) AS ls_ndv,
    CAST(MIN(l_linestatus) AS VARCHAR) AS ls_min,
    CAST(MAX(l_linestatus) AS VARCHAR) AS ls_max,
    COUNT(CASE WHEN l_linenumber IS NULL THEN 1 END) AS ln_nulls,
    COUNT(DISTINCT l_linenumber) AS ln_ndv,
    CAST(MIN(l_linenumber) AS VARCHAR) AS ln_min,
    CAST(MAX(l_linenumber) AS VARCHAR) AS ln_max,
    COUNT(CASE WHEN l_shipdate IS NULL THEN 1 END) AS sd_nulls,
    COUNT(DISTINCT l_shipdate) AS sd_ndv,
    CAST(MIN(l_shipdate) AS VARCHAR) AS sd_min,
    CAST(MAX(l_shipdate) AS VARCHAR) AS sd_max
  FROM lineitem
)
SELECT 'l_linestatus' AS "column", n_rows,
       CAST(ls_nulls AS BIGINT) AS n_nulls, CAST(ls_ndv AS BIGINT) AS ndv,
       ls_min AS min_value, ls_max AS max_value FROM wide
UNION ALL
SELECT 'l_returnflag', n_rows, CAST(rf_nulls AS BIGINT),
       CAST(rf_ndv AS BIGINT), rf_min, rf_max FROM wide
UNION ALL
SELECT 'l_shipdate', n_rows, CAST(sd_nulls AS BIGINT),
       CAST(sd_ndv AS BIGINT), sd_min, sd_max FROM wide
UNION ALL
SELECT 'l_linenumber', n_rows, CAST(ln_nulls AS BIGINT),
       CAST(ln_ndv AS BIGINT), ln_min, ln_max FROM wide
ORDER BY "column"
"""


# ---------------------------------------------------------------------------
# Ingest drift: chi-square contribution report, base vs delta
# ---------------------------------------------------------------------------
DRIFT_BIN = 60  # n_chars bin width
DRIFT_CUT = 0.8  # first 80% of doc_id space = base, rest = delta


def chisq_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor for an ingest boundary: bin the
    document-length distribution, split the corpus into base (first
    DRIFT_CUT of the id space) vs delta (the new batch), and report
    each bin's chi-square contribution — the production gate that
    flags a delta batch whose length profile shifted before it trains.
    Deliberately chi-square and NOT PSI: every quantity here is a
    ratio of exact BIGINTs (one double division per cell, rounded),
    whereas PSI's ln() is libm-implementation-specific and can differ
    between engines at the ULP.

    100 TB shape: one corpus scan into a bounded bin aggregate; the
    id cut and the two totals are 1-row broadcasts; all per-bin math
    is map-side arithmetic on exact counts."""
    d = load_table(spark, sf_dir, "documents")
    cut = d.agg(
        (F.lit(DRIFT_CUT) * (F.max("doc_id") + 1)).cast("long").alias("cut")
    )
    bins = (
        d.crossJoin(F.broadcast(cut))
        .groupBy((F.col("n_chars") / DRIFT_BIN).cast("long").alias("bin"))
        .agg(
            F.sum(F.when(F.col("doc_id") < F.col("cut"), 1).otherwise(0))
            .alias("n_base"),
            F.sum(F.when(F.col("doc_id") >= F.col("cut"), 1).otherwise(0))
            .alias("n_delta"),
        )
    )
    totals = bins.agg(
        F.sum("n_base").alias("t_base"), F.sum("n_delta").alias("t_delta")
    )
    row_total = F.col("n_base") + F.col("n_delta")
    grand = F.col("t_base") + F.col("t_delta")
    # try_divide, not `/`: a bin whose rows are all NULL-doc_id counts
    # into neither side (row_total = 0 → expected = 0), and on 0/0
    # Spark's Divide yields NULL while DuckDB yields NaN — which the
    # harness canonicalizes as a mismatch. Both engines emit NULL now
    # (the SQL mirrors with NULLIF denominators).
    e_base = F.try_divide(
        (row_total * F.col("t_base")).cast("double"), grand.cast("double")
    )
    e_delta = F.try_divide(
        (row_total * F.col("t_delta")).cast("double"), grand.cast("double")
    )
    term = F.try_divide(
        (F.col("n_base") - e_base) * (F.col("n_base") - e_base), e_base
    ) + F.try_divide(
        (F.col("n_delta") - e_delta) * (F.col("n_delta") - e_delta), e_delta
    )
    return (
        bins.crossJoin(F.broadcast(totals))
        .select(
            "bin",
            "n_base",
            "n_delta",
            F.round(term, 6).alias("chisq_term"),
        )
        .orderBy("bin")
    )


CHISQ_DRIFT_SQL = f"""
WITH lim AS (
  SELECT CAST({DRIFT_CUT} * (MAX(doc_id) + 1) AS BIGINT) AS cut FROM documents
),
b AS (
  SELECT n_chars // {DRIFT_BIN} AS bin,
         SUM(CASE WHEN doc_id < cut THEN 1 ELSE 0 END) AS n_base,
         SUM(CASE WHEN doc_id >= cut THEN 1 ELSE 0 END) AS n_delta
  FROM documents, lim GROUP BY 1
),
t AS (SELECT SUM(n_base) AS t_base, SUM(n_delta) AS t_delta FROM b),
e AS (
  -- NULLIF denominators mirror Spark's try_divide: a bin counted into
  -- neither side (all-NULL doc_id) has expected 0 — both engines emit
  -- NULL instead of DuckDB's NaN vs Spark's NULL divergence.
  SELECT bin, n_base, n_delta,
    CAST((n_base + n_delta) * t_base AS DOUBLE) / NULLIF(t_base + t_delta, 0)
      AS e_base,
    CAST((n_base + n_delta) * t_delta AS DOUBLE) / NULLIF(t_base + t_delta, 0)
      AS e_delta
  FROM b, t
)
SELECT bin, CAST(n_base AS BIGINT) AS n_base,
  CAST(n_delta AS BIGINT) AS n_delta,
  ROUND(
    (n_base - e_base) * (n_base - e_base) / NULLIF(e_base, 0)
    + (n_delta - e_delta) * (n_delta - e_delta) / NULLIF(e_delta, 0),
  6) AS chisq_term
FROM e
ORDER BY bin
"""


# ---------------------------------------------------------------------------
# Encoding hygiene (round 11): mojibake / control-char / zero-width
# rates per source — the ingest-time signal that catches a feed whose
# upstream decoder broke (U+FFFD replacement chars), whose scraper left
# terminal control bytes, or whose text carries invisible joiners that
# poison tokenizers. bytes_per_char is the exact corpus-weighted ratio
# of UTF-8 bytes to codepoints (1.0 = pure ASCII; drifting up = more
# multibyte — or mojibake re-encoding). All counts are exact BIGINTs;
# the one division is BIGINT/BIGINT evaluated identically by both
# engines. Char probes use explicit codepoint literals, never unicode
# regex classes (the two engines' regex unicode tables differ —
# ENGINEERING_NOTES unicode-sweep lessons).
# ---------------------------------------------------------------------------
_ZERO_WIDTH = "\u00a0\u200b\u200d\ufeff"  # NBSP, ZWSP, ZWJ, BOM


def encoding_hygiene_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    has_replacement = F.contains(F.col("text"), F.lit("\ufffd"))
    has_control = F.col("text").rlike(r"[\x00-\x08\x0b\x0c\x0e-\x1f]")
    has_zero_width = None
    for ch in _ZERO_WIDTH:
        probe = F.contains(F.col("text"), F.lit(ch))
        has_zero_width = probe if has_zero_width is None else (has_zero_width | probe)
    return (
        d.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(has_replacement.cast("long")).alias("n_replacement_docs"),
            F.sum(has_control.cast("long")).alias("n_control_docs"),
            F.sum(has_zero_width.cast("long")).alias("n_zero_width_docs"),
            # try_divide: an all-empty-text source (trunc-sweep shape)
            # has SUM(length)=0 — ANSI divide would abort the query;
            # both engines emit NULL (SQL mirrors with NULLIF)
            F.round(
                F.try_divide(
                    F.sum(F.octet_length("text")).cast("double"),
                    F.sum(F.length("text")).cast("double"),
                ),
                6,
            ).alias("bytes_per_char"),
        )
        .orderBy("source")
    )


ENCODING_HYGIENE_SQL = r"""
SELECT source,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(COUNT(CASE WHEN strpos(text, chr(65533)) > 0 THEN 1 END) AS BIGINT)
    AS n_replacement_docs,
  CAST(COUNT(CASE WHEN regexp_matches(text,
    '[\x00-\x08\x0b\x0c\x0e-\x1f]') THEN 1 END) AS BIGINT) AS n_control_docs,
  CAST(COUNT(CASE WHEN strpos(text, chr(160)) > 0
                    OR strpos(text, chr(8203)) > 0
                    OR strpos(text, chr(8205)) > 0
                    OR strpos(text, chr(65279)) > 0 THEN 1 END) AS BIGINT)
    AS n_zero_width_docs,
  ROUND(CAST(SUM(strlen(text)) AS DOUBLE)
        / NULLIF(CAST(SUM(length(text)) AS DOUBLE), 0), 6) AS bytes_per_char
FROM documents
WHERE text IS NOT NULL
GROUP BY source
ORDER BY source
"""


# ---------------------------------------------------------------------------
# k-anonymity audit (round 11): quasi-identifier combination sizes —
# the governance check run before releasing a derived dataset: any
# (nation, market-segment) cell with fewer than k members re-identifies
# its customers. k=10 is the common release threshold (and flags real
# cells at every fixture SF; k=5 was vacuous at sf0.01 where the
# smallest cell is exactly 5). One group-cardinality aggregate; at 100 TB the output
# is bounded by the quasi-identifier domain, never the table.
# ---------------------------------------------------------------------------
K_ANONYMITY_K = 10


def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count("*").alias("n_members"))
        .withColumn(
            "risky", (F.col("n_members") < K_ANONYMITY_K).cast("boolean")
        )
        .orderBy("c_nationkey", "c_mktsegment")
    )


K_ANONYMITY_SQL = f"""
SELECT c_nationkey, c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       COUNT(*) < {K_ANONYMITY_K} AS risky
FROM customer
GROUP BY 1, 2
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# l-diversity audit (round 14): k-anonymity's required companion — a
# cell can be k-large yet leak the sensitive attribute anyway if every
# member shares one value (the homogeneity attack). Per quasi-
# identifier cell, over a fixed banded sensitive attribute (account-
# balance tier): distinct-l (how many sensitive values appear) and the
# modal count (how concentrated the cell is); risky = l < 3. All
# exact integers on a deterministic CASE banding, so the oracle is a
# literal replay. 100 TB shape: two stacked aggregations that share
# the (cell, sensitive) grouping — ONE shuffle on the finer key, then
# a map-side-combinable rollup to cells; output bounded by the
# quasi-identifier domain, never the table.
# ---------------------------------------------------------------------------
L_DIVERSITY_L = 3
_ACCTBAL_BANDS_SQL = (
    "CASE WHEN c_acctbal < 0 THEN 'debt' "
    "WHEN c_acctbal < 3000 THEN 'low' "
    "WHEN c_acctbal < 7000 THEN 'mid' "
    "ELSE 'high' END"
)


def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    fine = (
        c.select(
            "c_nationkey",
            "c_mktsegment",
            F.expr(_ACCTBAL_BANDS_SQL).alias("sens"),
        )
        .groupBy("c_nationkey", "c_mktsegment", "sens")
        .agg(F.count("*").alias("cnt"))
    )
    return (
        fine.groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.sum("cnt").cast("long").alias("n_members"),
            F.count("*").cast("long").alias("l_distinct"),
            F.max("cnt").cast("long").alias("modal_count"),
        )
        .withColumn(
            "risky",
            (F.col("l_distinct") < L_DIVERSITY_L).cast("boolean"),
        )
        .orderBy("c_nationkey", "c_mktsegment")
    )


L_DIVERSITY_SQL = f"""
WITH fine AS (
  SELECT c_nationkey, c_mktsegment,
         {_ACCTBAL_BANDS_SQL} AS sens,
         COUNT(*) AS cnt
  FROM customer
  GROUP BY 1, 2, 3
)
SELECT c_nationkey, c_mktsegment,
       CAST(SUM(cnt) AS BIGINT) AS n_members,
       CAST(COUNT(*) AS BIGINT) AS l_distinct,
       CAST(MAX(cnt) AS BIGINT) AS modal_count,
       COUNT(*) < {L_DIVERSITY_L} AS risky
FROM fine
GROUP BY 1, 2
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Cross-source duplication matrix (round 11): the dedup ACCOUNTING
# view a curation team actually reads — for each (source, source)
# pair, how many verified near-dup pairs cross it and how similar they
# are. Consumes the build-once exact pair table (llm.ngram_jaccard
# pairs — same artifact three other specs read), joined back to the
# corpus for attribution; sources are least/greatest-normalized so the
# matrix is upper-triangular. Output is bounded by source-domain².
# ---------------------------------------------------------------------------
def cross_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from burla_spark.plans.llm import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    attributed = (
        pairs.join(
            d.select(F.col("doc_id").alias("id_a"), F.col("source").alias("sa")),
            "id_a",
        )
        .join(
            d.select(F.col("doc_id").alias("id_b"), F.col("source").alias("sb")),
            "id_b",
        )
    )
    return (
        attributed.select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
            "jaccard",
        )
        .groupBy("source_a", "source_b")
        .agg(
            F.count("*").alias("n_dup_pairs"),
            F.round(F.avg("jaccard"), 6).alias("avg_jaccard"),
        )
        .orderBy("source_a", "source_b")
    )


def _cross_source_sql() -> str:
    from burla_spark.plans.llm import NGRAM_JACCARD_SQL

    return f"""
WITH pr AS ({NGRAM_JACCARD_SQL}),
attributed AS (
  SELECT LEAST(da.source, db.source) AS source_a,
         GREATEST(da.source, db.source) AS source_b,
         pr.jaccard
  FROM pr
  JOIN documents da ON da.doc_id = pr.id_a
  JOIN documents db ON db.doc_id = pr.id_b
)
SELECT source_a, source_b,
       CAST(COUNT(*) AS BIGINT) AS n_dup_pairs,
       ROUND(AVG(jaccard), 6) AS avg_jaccard
FROM attributed
GROUP BY 1, 2
ORDER BY 1, 2
"""


CROSS_SOURCE_DUP_SQL = _cross_source_sql()


# ---------------------------------------------------------------------------
# Split-leakage audit (round 11): the dedup-aware twin of
# mlprep.train_test_split_stats — a hash split is leak-free only at
# EXACT granularity; near-duplicate pairs that straddle train/val/test
# are memorization leaks that inflate eval scores. Labels both sides of
# every verified near-dup pair (build-once llm.ngram_jaccard pair
# table) with the same deterministic affine-hash 80/10/10 split used
# for the split itself, normalizes pairs to (earlier-phase,
# later-phase), and reports per split-pair: pair count, distinct
# implicated docs on each side, and mean Jaccard. The
# n_docs_b_implicated column on a cross row IS the remediation list
# size (eval docs to drop). Output bounded by 3×3 split pairs.
# ---------------------------------------------------------------------------
from burla_spark.plans.mlprep import (  # noqa: E402 — same split assignment
    _affine_hash as _split_hash,
    _affine_hash_sql as _split_hash_sql,
)


def _split3(key):
    b = _split_hash(key) % F.lit(100)
    return F.when(b < 80, "train").when(b < 90, "val").otherwise("test")


def _split_ord(split_col):
    return (
        F.when(split_col == "train", 0).when(split_col == "val", 1).otherwise(2)
    )


def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from burla_spark.plans.llm import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(spark, sf_dir)
    labeled = pairs.select(
        "id_a",
        "id_b",
        "jaccard",
        _split3(F.col("id_a")).alias("sa"),
        _split3(F.col("id_b")).alias("sb"),
    )
    swap = _split_ord(F.col("sb")) < _split_ord(F.col("sa"))
    norm = labeled.select(
        F.when(swap, F.col("sb")).otherwise(F.col("sa")).alias("split_a"),
        F.when(swap, F.col("sa")).otherwise(F.col("sb")).alias("split_b"),
        F.when(swap, F.col("id_b")).otherwise(F.col("id_a")).alias("doc_a"),
        F.when(swap, F.col("id_a")).otherwise(F.col("id_b")).alias("doc_b"),
        "jaccard",
    )
    return (
        norm.groupBy("split_a", "split_b")
        .agg(
            F.count("*").alias("n_pairs"),
            F.countDistinct("doc_a").alias("n_docs_a_implicated"),
            F.countDistinct("doc_b").alias("n_docs_b_implicated"),
            (F.round(F.avg("jaccard"), 6) + F.lit(0.0)).alias("avg_jaccard"),
        )
        .withColumn(
            "is_cross_split", (F.col("split_a") != F.col("split_b"))
        )
        .orderBy("split_a", "split_b")
    )


def _split_leakage_sql() -> str:
    from burla_spark.plans.llm import NGRAM_JACCARD_SQL

    bucket_a = f"{_split_hash_sql('id_a')} % 100"
    bucket_b = f"{_split_hash_sql('id_b')} % 100"
    return f"""
WITH pr AS ({NGRAM_JACCARD_SQL}),
lab AS (
  SELECT id_a, id_b, jaccard,
    CASE WHEN {bucket_a} < 80 THEN 'train'
         WHEN {bucket_a} < 90 THEN 'val' ELSE 'test' END AS sa,
    CASE WHEN {bucket_b} < 80 THEN 'train'
         WHEN {bucket_b} < 90 THEN 'val' ELSE 'test' END AS sb
  FROM pr
), ord_lab AS (
  SELECT *,
    CASE sa WHEN 'train' THEN 0 WHEN 'val' THEN 1 ELSE 2 END AS oa,
    CASE sb WHEN 'train' THEN 0 WHEN 'val' THEN 1 ELSE 2 END AS ob
  FROM lab
), norm AS (
  SELECT
    CASE WHEN ob < oa THEN sb ELSE sa END AS split_a,
    CASE WHEN ob < oa THEN sa ELSE sb END AS split_b,
    CASE WHEN ob < oa THEN id_b ELSE id_a END AS doc_a,
    CASE WHEN ob < oa THEN id_a ELSE id_b END AS doc_b,
    jaccard
  FROM ord_lab
)
SELECT split_a, split_b,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(COUNT(DISTINCT doc_a) AS BIGINT) AS n_docs_a_implicated,
       CAST(COUNT(DISTINCT doc_b) AS BIGINT) AS n_docs_b_implicated,
       ROUND(AVG(jaccard), 6) + 0.0 AS avg_jaccard,
       split_a <> split_b AS is_cross_split
FROM norm
GROUP BY split_a, split_b
ORDER BY split_a, split_b
"""


SPLIT_LEAKAGE_SQL = _split_leakage_sql()


# ---------------------------------------------------------------------------
# Dedup threshold sweep (round 11): the tuning view behind "what
# Jaccard cutoff do we dedup at" — one pass over the build-once pair
# table replicated across candidate thresholds reports, per cutoff,
# how many pairs survive, how many distinct documents they implicate,
# and what fraction of the corpus that is. Thresholds below the pair
# table's 0.4 generation floor would under-count, so the sweep starts
# there. Output bounded by the threshold list; the corpus total rides
# a 1-row broadcast.
# ---------------------------------------------------------------------------
SWEEP_THRESHOLDS = (0.4, 0.5, 0.6, 0.7, 0.8, 0.9)


def dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from burla_spark.plans.llm import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(spark, sf_dir)
    p = pairs.select(
        "id_a",
        "id_b",
        "jaccard",
        F.explode(
            F.array(*[F.lit(t) for t in SWEEP_THRESHOLDS])
        ).alias("threshold"),
    ).filter(F.col("jaccard") >= F.col("threshold"))
    stats = p.groupBy("threshold").agg(
        F.count("*").alias("n_pairs"),
        (F.round(F.avg("jaccard"), 6) + F.lit(0.0)).alias("avg_jaccard"),
    )
    docs = (
        p.select(
            "threshold", F.explode(F.array("id_a", "id_b")).alias("doc")
        )
        .groupBy("threshold")
        .agg(F.countDistinct("doc").alias("n_docs_involved"))
    )
    total = load_table(spark, sf_dir, "documents").agg(
        F.count("*").cast("long").alias("n_total")
    )
    return (
        stats.join(docs, "threshold")
        .crossJoin(F.broadcast(total))
        .select(
            "threshold",
            "n_pairs",
            "n_docs_involved",
            (
                F.round(
                    F.col("n_docs_involved").cast("double") / F.col("n_total"),
                    6,
                )
                + F.lit(0.0)
            ).alias("dup_doc_rate"),
            "avg_jaccard",
        )
        .orderBy("threshold")
    )


def _threshold_sweep_sql() -> str:
    from burla_spark.plans.llm import NGRAM_JACCARD_SQL

    th_list = ", ".join(str(t) for t in SWEEP_THRESHOLDS)
    return f"""
WITH pr AS ({NGRAM_JACCARD_SQL}),
th AS (SELECT CAST(UNNEST([{th_list}]) AS DOUBLE) AS threshold),
p AS (
  SELECT th.threshold, pr.id_a, pr.id_b, pr.jaccard
  FROM pr JOIN th ON pr.jaccard >= th.threshold
), stats AS (
  SELECT threshold, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         ROUND(AVG(jaccard), 6) + 0.0 AS avg_jaccard
  FROM p GROUP BY threshold
), docs AS (
  SELECT threshold, CAST(COUNT(DISTINCT doc) AS BIGINT) AS n_docs_involved
  FROM (SELECT threshold, UNNEST([id_a, id_b]) AS doc FROM p)
  GROUP BY threshold
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM documents
)
SELECT s.threshold, s.n_pairs, d.n_docs_involved,
       ROUND(CAST(d.n_docs_involved AS DOUBLE) / t.n_total, 6) + 0.0
         AS dup_doc_rate,
       s.avg_jaccard
FROM stats s JOIN docs d ON s.threshold = d.threshold, tot t
ORDER BY s.threshold
"""


DEDUP_THRESHOLD_SWEEP_SQL = _threshold_sweep_sql()


# ---------------------------------------------------------------------------
# Embedding-feed hygiene (round 11): the OBSERVABILITY twin of the
# ingest gate — sources/tables.py EXCLUDES null/non-finite/zero-norm
# vectors before any similarity operator sees them (a direction-less
# vector has no geometric meaning), so this report deliberately reads
# the RAW pre-gate feed (spark.read.parquet / main.embeddings, NOT
# load_table) and accounts for what the gate admits vs quarantines per
# label. All counts are exact BIGINTs; the one ratio is rounded. At
# 100 TB: one scan, per-row array folds, label-bounded output.
# ---------------------------------------------------------------------------
def embedding_hygiene_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from burla_spark.sources.tables import table_path

    e = spark.read.parquet(table_path(sf_dir, "embeddings"))
    emb = F.col("embedding")
    # NULL COMPONENT is its own defect class: a decoder that dropped a
    # value (pandas→parquet even maps in-list NaN to null). It must be
    # classified BEFORE the float probes — isnan/abs return NULL on a
    # null element and the vector would silently fall out of every
    # bucket.
    has_null_comp = F.exists(emb, lambda x: x.isNull())
    nonfinite = F.exists(
        emb, lambda x: F.isnan(x) | (F.abs(x) == F.lit(float("inf")))
    )
    ss = F.aggregate(
        emb, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x
    )
    per = e.select(
        "label",
        emb.isNull().alias("is_null"),
        F.coalesce(has_null_comp, F.lit(False)).alias("null_comp"),
        F.coalesce(nonfinite, F.lit(False)).alias("nonfinite"),
        ss.alias("ss"),
    )
    whole = ~F.col("is_null") & ~F.col("null_comp")
    ok = whole & ~F.col("nonfinite")
    return (
        per.groupBy("label")
        .agg(
            F.count("*").cast("long").alias("n_vecs"),
            F.sum(F.col("is_null").cast("long")).alias("n_null_vec"),
            F.sum(
                (~F.col("is_null") & F.col("null_comp")).cast("long")
            ).alias("n_null_component"),
            F.sum((whole & F.col("nonfinite")).cast("long")).alias(
                "n_nonfinite"
            ),
            F.sum((ok & (F.col("ss") == 0)).cast("long")).alias("n_zero_norm"),
            F.sum((ok & (F.col("ss") > 0)).cast("long")).alias("n_admitted"),
        )
        .withColumn(
            "admit_rate",
            F.round(
                F.col("n_admitted").cast("double") / F.col("n_vecs"), 6
            )
            + F.lit(0.0),
        )
        .orderBy("label")
    )


# reads main.embeddings: the ingest CTE deliberately does NOT apply —
# the report measures what that gate drops
EMBEDDING_HYGIENE_SQL = """
WITH raw AS (
  SELECT label,
         embedding IS NULL AS is_null,
         CASE WHEN embedding IS NULL THEN FALSE
              ELSE len(list_filter(embedding, x -> x IS NULL)) > 0
         END AS null_comp,
         CASE WHEN embedding IS NULL THEN FALSE
              ELSE len(list_filter(embedding, x -> NOT isfinite(x))) > 0
         END AS nonfinite,
         CASE WHEN embedding IS NULL THEN NULL
              ELSE list_sum(list_transform(embedding,
                     x -> CAST(x AS DOUBLE) * x))
         END AS ss
  FROM main.embeddings
)
SELECT label,
  CAST(COUNT(*) AS BIGINT) AS n_vecs,
  CAST(COUNT(CASE WHEN is_null THEN 1 END) AS BIGINT) AS n_null_vec,
  CAST(COUNT(CASE WHEN NOT is_null AND null_comp THEN 1 END) AS BIGINT)
    AS n_null_component,
  CAST(COUNT(CASE WHEN NOT is_null AND NOT null_comp AND nonfinite THEN 1
    END) AS BIGINT) AS n_nonfinite,
  CAST(COUNT(CASE WHEN NOT is_null AND NOT null_comp AND NOT nonfinite
    AND ss = 0 THEN 1 END) AS BIGINT) AS n_zero_norm,
  CAST(COUNT(CASE WHEN NOT is_null AND NOT null_comp AND NOT nonfinite
    AND ss > 0 THEN 1 END) AS BIGINT) AS n_admitted,
  ROUND(CAST(COUNT(CASE WHEN NOT is_null AND NOT null_comp AND NOT nonfinite
    AND ss > 0 THEN 1 END) AS DOUBLE) / COUNT(*), 6) + 0.0 AS admit_rate
FROM raw
GROUP BY label
ORDER BY label
"""


# ---------------------------------------------------------------------------
# MinHash estimator-quality report (round 12) — the dedup twin of
# ann_recall_report: on the VERIFIED near-dup pair table (which carries
# exact Jaccard), re-derive each pair's signature-agreement estimate
# (matching minhashes / 32) and report, per true-Jaccard band of 0.05,
# the estimator's bias and error. This is the view that answers "are 32
# hashes / 8 bands enough for this corpus" before scaling the index —
# at 100 TB you tune the signature width on a slice with THIS table,
# not by re-running dedup. Signatures are recomputed only for the docs
# implicated in pairs (pair-table-bounded, not corpus-bounded); the
# md5_affine family makes every number DuckDB-replayable.
# ---------------------------------------------------------------------------
def minhash_estimator_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from burla_spark.operators.dedup import (
        MINHASH_AFFINE_P,
        _affine_coeffs,
        char_shingles,
        md5_32bit_hash,
    )
    from burla_spark.plans.llm import _minhash_pairs

    pairs = _minhash_pairs(spark, sf_dir)
    ids = (
        pairs.select(F.col("id_a").alias("doc_id"))
        .union(pairs.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .join(ids, "doc_id", "left_semi")
    )

    def perm(a: int, b: int):
        return lambda x: (F.lit(a) * x + F.lit(b)) % F.lit(MINHASH_AFFINE_P)

    coeffs = _affine_coeffs(32)
    # merge hashed shingles PER doc_id (explode + distinct + regroup)
    # exactly like the oracle's GROUP BY doc_id over unnested hashes —
    # a corpus with duplicated doc_id rows (the dup degradation mode)
    # must yield ONE signature per id on both engines. The shuffle is
    # bounded by pair-implicated docs × shingles, not the corpus.
    merged = (
        d.select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.transform(char_shingles(F.col("text"), 5), md5_32bit_hash)
                )
            ).alias("x"),
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.collect_list("x").alias("hs"))
    )
    sigs = merged.select(
        "doc_id",
        F.array(
            *[F.array_min(F.transform("hs", perm(a, b))) for a, b in coeffs]
        ).alias("sig"),
    )
    est = (
        pairs.join(
            sigs.select(F.col("doc_id").alias("id_a"), F.col("sig").alias("sa")),
            "id_a",
        )
        .join(
            sigs.select(F.col("doc_id").alias("id_b"), F.col("sig").alias("sb")),
            "id_b",
        )
        .select(
            "jaccard",
            F.size(
                F.filter(
                    F.zip_with("sa", "sb", lambda x, y: x == y), lambda v: v
                )
            )
            .cast("long")
            .alias("matches"),
        )
    )
    err = F.abs(F.col("jaccard") - F.col("matches") / F.lit(32.0))
    return (
        est.withColumn(
            "jaccard_band", F.floor(F.col("jaccard") * 20).cast("long")
        )
        .groupBy("jaccard_band")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            (F.round(F.avg("jaccard"), 6) + F.lit(0.0)).alias("mean_true"),
            (
                F.round(
                    F.sum("matches").cast("double")
                    / (F.lit(32.0) * F.count("*")),
                    6,
                )
                + F.lit(0.0)
            ).alias("mean_est"),
            (F.round(F.avg(err), 6) + F.lit(0.0)).alias("mean_abs_err"),
            (F.round(F.max(err), 6) + F.lit(0.0)).alias("max_abs_err"),
        )
        .orderBy("jaccard_band")
    )


def _minhash_estimator_sql() -> str:
    from burla_spark.plans.llm import _minhash_core_ctes

    matches = " + ".join(
        f"CASE WHEN a.s{j} = b.s{j} THEN 1 ELSE 0 END" for j in range(32)
    )
    return f"""
WITH {_minhash_core_ctes()},
est AS (
  SELECT p.jaccard, ({matches}) AS matches
  FROM pairs p
  JOIN sig a ON a.doc_id = p.id_a
  JOIN sig b ON b.doc_id = p.id_b
)
SELECT CAST(FLOOR(jaccard * 20) AS BIGINT) AS jaccard_band,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(AVG(jaccard), 6) + 0.0 AS mean_true,
       ROUND(SUM(matches) / (32.0 * COUNT(*)), 6) + 0.0 AS mean_est,
       ROUND(AVG(ABS(jaccard - matches / 32.0)), 6) + 0.0 AS mean_abs_err,
       ROUND(MAX(ABS(jaccard - matches / 32.0)), 6) + 0.0 AS max_abs_err
FROM est
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Dedup token-savings report (round 12) — the ROI accounting a curation
# team actually reads: per source, how many documents and TOKENS does
# resolving the near-dup components remove (keep the component minimum,
# drop the rest)? Joins the build-once exact component table against
# per-doc token counts; at 100 TB both sides are doc_id-keyed (the
# component table is pair-structure-sized, the token count is one
# map-side projection), so the join shuffles ids + one long, not text.
# ---------------------------------------------------------------------------
def dedup_token_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from burla_spark.plans.llm import _ngram_components

    comps = _ngram_components(spark, sf_dir)
    removed = (
        comps.filter(F.col("node") != F.col("component"))
        .select(F.col("node").alias("doc_id"))
        .withColumn("is_removed", F.lit(True))
    )
    t = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            "source",
            F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias(
                "n_tokens"
            ),
        )
    )
    return (
        t.join(removed, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.when(F.col("is_removed"), 1).otherwise(0))
            .cast("long")
            .alias("n_docs_removed"),
            F.sum("n_tokens").cast("long").alias("tokens_total"),
            F.sum(F.when(F.col("is_removed"), F.col("n_tokens")).otherwise(0))
            .cast("long")
            .alias("tokens_removed"),
        )
        .withColumn(
            "pct_tokens_removed",
            F.round(
                F.col("tokens_removed").cast("double")
                / F.col("tokens_total").cast("double"),
                6,
            )
            + F.lit(0.0),
        )
        .orderBy("source")
    )


def _dedup_token_savings_sql() -> str:
    from burla_spark.plans.llm import DEDUP_COMPONENTS_EXACT_SQL

    return rf"""
WITH comp AS MATERIALIZED ({DEDUP_COMPONENTS_EXACT_SQL}),
removed AS (SELECT node AS doc_id FROM comp WHERE node <> component),
t AS (
  SELECT doc_id, source,
         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
           AS n_tokens
  FROM documents WHERE text IS NOT NULL
)
SELECT source,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(COUNT(r.doc_id) AS BIGINT) AS n_docs_removed,
  CAST(SUM(t.n_tokens) AS BIGINT) AS tokens_total,
  CAST(COALESCE(SUM(CASE WHEN r.doc_id IS NOT NULL THEN t.n_tokens END), 0)
       AS BIGINT) AS tokens_removed,
  ROUND(CAST(COALESCE(SUM(CASE WHEN r.doc_id IS NOT NULL THEN t.n_tokens END),
                      0) AS DOUBLE)
        / SUM(t.n_tokens), 6) + 0.0 AS pct_tokens_removed
FROM t LEFT JOIN removed r ON t.doc_id = r.doc_id
GROUP BY source ORDER BY source
"""


# ---------------------------------------------------------------------------
# Packing-efficiency curve (round 12) — the pad-vs-pack ROI view for
# choosing a training context length: for each candidate length L,
# every doc occupies ceil(n_tokens/L) padded sequences, and utilization
# = real tokens / padded capacity. The curve (one row per L) is what a
# pipeline reads before committing a context length; sequence_packing
# then builds the chosen layout. One corpus scan, a 4-way literal
# explode, integer arithmetic end-to-end.
# ---------------------------------------------------------------------------
_PACK_CTXS = (256, 512, 1024, 2048)


def packing_efficiency_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias(
                "n_tokens"
            )
        )
    )
    per = t.select(
        "n_tokens",
        F.explode(F.array(*[F.lit(c) for c in _PACK_CTXS])).alias("ctx_len"),
    ).withColumn(
        "n_seq", F.expr("(n_tokens + ctx_len - 1) div ctx_len")
    )
    return (
        per.groupBy("ctx_len")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.when(F.col("n_seq") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_multi_seq_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.sum("n_seq").cast("long").alias("n_sequences"),
            (F.sum("n_seq") * F.first("ctx_len")).cast("long").alias(
                "padded_tokens"
            ),
        )
        .withColumn(
            "utilization",
            F.round(
                F.col("total_tokens").cast("double")
                / F.col("padded_tokens").cast("double"),
                6,
            )
            + F.lit(0.0),
        )
        .select(
            F.col("ctx_len").cast("long").alias("ctx_len"),
            "n_docs",
            "n_multi_seq_docs",
            "total_tokens",
            "n_sequences",
            "padded_tokens",
            "utilization",
        )
        .orderBy("ctx_len")
    )


PACKING_EFFICIENCY_SQL = rf"""
WITH t AS (
  SELECT CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
           AS n_tokens
  FROM documents WHERE text IS NOT NULL
), per AS (
  SELECT n_tokens, c.ctx_len,
         (n_tokens + c.ctx_len - 1) // c.ctx_len AS n_seq
  FROM t, (SELECT UNNEST({list(_PACK_CTXS)}) AS ctx_len) c
)
SELECT CAST(ctx_len AS BIGINT) AS ctx_len,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(CASE WHEN n_seq > 1 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_multi_seq_docs,
  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
  CAST(SUM(n_seq) AS BIGINT) AS n_sequences,
  CAST(SUM(n_seq) * ctx_len AS BIGINT) AS padded_tokens,
  ROUND(CAST(SUM(n_tokens) AS DOUBLE) / (SUM(n_seq) * ctx_len), 6) + 0.0
    AS utilization
FROM per
GROUP BY ctx_len ORDER BY ctx_len
"""


# ---------------------------------------------------------------------------
# Ingest-rate anomaly report (round 12) — per event type, the 10-minute
# arrival-rate profile with exact-integer variance: burst/outage
# detection over an ingest feed. The z-score machinery is derived from
# BIGINT (sum, sum-of-squares) aggregates so engine and oracle agree to
# the bit before the final rounded doubles; buckets are epoch-aligned
# integer microsecond division. Output is one row per event type
# (bucket table stays internal), so the report is O(types).
# ---------------------------------------------------------------------------
def ingest_rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull() & F.col("event_type").isNotNull())
    )
    buckets = (
        e.select(
            "event_type", F.expr("unix_micros(ts) div 600000000").alias("b")
        )
        .groupBy("event_type", "b")
        .agg(F.count("*").cast("long").alias("c"))
    )
    stats = buckets.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_buckets"),
        F.sum("c").cast("long").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("ss"),
        F.max("c").cast("long").alias("peak_rate"),
    )
    mean = F.col("s").cast("double") / F.col("n_buckets")
    # population variance from exact integer sums: (ss - s^2/n) / n
    var = (
        F.col("ss").cast("double")
        - F.col("s").cast("double") * F.col("s") / F.col("n_buckets")
    ) / F.col("n_buckets")
    joined = buckets.join(
        stats.select("event_type", "n_buckets", "s", "ss", "peak_rate"),
        "event_type",
    ).withColumn(
        "z",
        F.when(
            var > 0, (F.col("c") - mean) / F.sqrt(var)
        ).otherwise(F.lit(0.0)),
    )
    return (
        joined.groupBy("event_type")
        .agg(
            F.first("n_buckets").alias("n_buckets"),
            (F.round(F.first("s").cast("double") / F.first("n_buckets"), 6)
             + F.lit(0.0)).alias("mean_rate"),
            F.first("peak_rate").alias("peak_rate"),
            F.sum(F.when(F.abs(F.col("z")) >= 3.0, 1).otherwise(0))
            .cast("long")
            .alias("n_anomalous_buckets"),
            (F.round(F.max("z"), 6) + F.lit(0.0)).alias("max_z"),
        )
        .orderBy("event_type")
    )


INGEST_RATE_ANOMALY_SQL = """
WITH buckets AS (
  SELECT event_type, epoch_us(ts) // 600000000 AS b,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE ts IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2
), stats AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_buckets,
         CAST(SUM(c) AS BIGINT) AS s,
         CAST(SUM(c * c) AS BIGINT) AS ss,
         CAST(MAX(c) AS BIGINT) AS peak_rate
  FROM buckets GROUP BY 1
), z AS (
  SELECT b.event_type, s.n_buckets, s.s, s.peak_rate,
         CASE WHEN (CAST(s.ss AS DOUBLE)
                    - CAST(s.s AS DOUBLE) * s.s / s.n_buckets) / s.n_buckets
                   > 0
              THEN (b.c - CAST(s.s AS DOUBLE) / s.n_buckets)
                   / sqrt((CAST(s.ss AS DOUBLE)
                           - CAST(s.s AS DOUBLE) * s.s / s.n_buckets)
                          / s.n_buckets)
              ELSE 0.0 END AS z
  FROM buckets b JOIN stats s ON b.event_type = s.event_type
)
SELECT event_type,
       CAST(MIN(n_buckets) AS BIGINT) AS n_buckets,
       ROUND(CAST(MIN(s) AS DOUBLE) / MIN(n_buckets), 6) + 0.0 AS mean_rate,
       CAST(MIN(peak_rate) AS BIGINT) AS peak_rate,
       CAST(SUM(CASE WHEN ABS(z) >= 3.0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_anomalous_buckets,
       ROUND(MAX(z), 6) + 0.0 AS max_z
FROM z
GROUP BY event_type ORDER BY event_type
"""


SPECS = [
    QuerySpec(
        "embedding_hygiene_report",
        embedding_hygiene_report,
        EMBEDDING_HYGIENE_SQL,
        ("quality", "embeddings", "ingest"),
        doc="Raw embedding-feed hygiene: per-label null/non-finite/"
        "zero-norm vs admitted counts — the observability twin of the "
        "ingest gate, read deliberately PRE-gate (round 11).",
    ),
    QuerySpec(
        "split_leakage_audit",
        split_leakage_audit,
        SPLIT_LEAKAGE_SQL,
        ("quality", "governance", "dedup"),
        doc="Near-dup pairs straddling the deterministic train/val/test "
        "hash split — memorization-leak audit over the build-once pair "
        "table, with per-side implicated-doc counts (round 11).",
    ),
    QuerySpec(
        "dedup_threshold_sweep",
        dedup_threshold_sweep,
        DEDUP_THRESHOLD_SWEEP_SQL,
        ("quality", "dedup", "tuning"),
        doc="Surviving pair / implicated-doc counts per candidate "
        "Jaccard cutoff — the dedup threshold-tuning view over the "
        "build-once pair table (round 11).",
    ),
    QuerySpec(
        "encoding_hygiene_scores",
        encoding_hygiene_scores,
        ENCODING_HYGIENE_SQL,
        ("quality", "text", "documents"),
        doc="Per-source mojibake/control/zero-width rates + exact "
        "bytes-per-char — ingest encoding hygiene (round 11).",
    ),
    QuerySpec(
        "k_anonymity_audit",
        k_anonymity_audit,
        K_ANONYMITY_SQL,
        ("quality", "governance"),
        doc="Quasi-identifier cell sizes with a k<5 re-identification "
        "flag — release-gate governance check (round 11).",
    ),
    QuerySpec(
        "l_diversity_audit",
        l_diversity_audit,
        L_DIVERSITY_SQL,
        ("quality", "governance"),
        doc="Distinct-l and modal concentration of the banded sensitive "
        "attribute per quasi-identifier cell — the homogeneity-attack "
        "audit k-anonymity misses (round 14).",
    ),
    QuerySpec(
        "cross_source_dup_matrix",
        cross_source_dup_matrix,
        CROSS_SOURCE_DUP_SQL,
        ("quality", "dedup", "documents"),
        doc="Upper-triangular source×source near-dup pair matrix over "
        "the build-once exact pair table (round 11).",
    ),
    QuerySpec(
        "chisq_drift_report",
        chisq_drift_report,
        CHISQ_DRIFT_SQL,
        ("quality", "drift", "documents"),
        doc="Per-bin chi-square drift contributions, base vs delta ingest.",
    ),
    QuerySpec(
        name="table_column_stats",
        spark=table_column_stats,
        oracle=TABLE_COLUMN_STATS_SQL,
        tags=("quality", "catalog", "stats"),
        doc="ANALYZE-style per-column stats (nulls/ndv/min/max) in one "
        "fused wide aggregate, unpivoted to catalog rows.",
    ),
    QuerySpec(
        name="data_quality_summary",
        spark=data_quality_summary,
        oracle=DATA_QUALITY_SQL,
        tags=("quality", "agg", "scale"),
        doc="declarative constraint checks in one aggregate pass",
    ),
    QuerySpec(
        "minhash_estimator_quality",
        minhash_estimator_quality,
        _minhash_estimator_sql(),
        ("quality", "dedup", "evaluation"),
        doc="MinHash signature-agreement estimate vs exact Jaccard per "
        "0.05 band over the verified pair table — the signature-width "
        "tuning view (dedup twin of ann_recall_report; round 12).",
    ),
    QuerySpec(
        "dedup_token_savings",
        dedup_token_savings,
        _dedup_token_savings_sql(),
        ("quality", "dedup", "governance"),
        doc="Per-source docs and TOKENS removed by resolving the exact "
        "near-dup components (keep component min) — the dedup ROI "
        "accounting view (round 12).",
    ),
    QuerySpec(
        "packing_efficiency_curve",
        packing_efficiency_curve,
        PACKING_EFFICIENCY_SQL,
        ("quality", "training-prep"),
        doc="Pad-vs-pack utilization per candidate context length "
        "(integer sequence arithmetic; one scan + 4-way explode) — the "
        "context-length ROI curve (round 12).",
    ),
    QuerySpec(
        "ingest_rate_anomaly",
        ingest_rate_anomaly,
        INGEST_RATE_ANOMALY_SQL,
        ("quality", "events", "monitoring"),
        doc="Per-type 10-min arrival-rate profile with exact-integer "
        "variance z-scores; anomalous-bucket counts + peak (round 12).",
    ),
]
