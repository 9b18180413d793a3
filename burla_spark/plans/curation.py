"""Round-5 training-data curation operators — the corpus-hygiene and
layout passes a 100 TB pretraining pipeline runs between ingestion and
tokenization, each with an exact DuckDB oracle:

* Gopher-style repetition filters (top-token fraction, duplicate
  bigram fraction) — the canonical "drop boilerplate/spam" signals
  from the Gopher/MassiveText and C4 cleaning recipes;
* first-event-per-burst throttling (keep the first event of each
  activity burst per user+type — the row-filter twin of sessionize);
* robust outlier detection via exact median/MAD — length-outlier
  removal that, unlike z-scores, one corrupted document can't skew;
* exact equi-depth histogram WITHOUT a global single-partition window
  — boundaries from a cumulative histogram over distinct values, then
  a map-side bucket assignment (the 100 TB shape for exact deciles);
* Z-order (Morton) clustering keys — multi-dimensional layout so a
  sort-before-write co-locates rows for data skipping on BOTH join
  dimensions (what Delta/Iceberg OPTIMIZE ZORDER does).

Determinism: fractions are integer-ratio double divisions (identical
on both engines), medians/MADs interpolate only dyadic rationals over
integer inputs (bit-exact), histogram boundaries are discrete order
statistics (no interpolation at all), and every ranked output carries
a unique total order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from burla_spark.plans.base import QuerySpec
from burla_spark.plans.mlprep import _HASH_MOD, _affine_hash, _affine_hash_sql
from burla_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# Gopher-style repetition filters
# ---------------------------------------------------------------------------
def gopher_repetition_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition signals over the token stream: the
    fraction of tokens that are the single most frequent token, and
    the fraction of bigrams that are repeats (1 - distinct/total) —
    flagged when either crosses the filter threshold.

    100 TB shape: two map-side explodes feeding doc_id-keyed partial
    aggregations (map-side combine, one shuffle each), joined back on
    doc_id — no corpus-wide state, fully linear, all JVM expressions.
    Reference parity: the repetition-filter family of text cleaning
    (SURVEY §2.C text analysis)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    base = d.select(
        "doc_id", "lang", F.split(F.trim("text"), r"\s+").alias("toks")
    ).withColumn("n_tokens", F.size("toks"))
    top = (
        base.select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .count()
        .groupBy("doc_id")
        .agg(F.max("count").alias("top_tok"))
    )
    bg = (
        base.select(
            "doc_id",
            F.explode(
                F.when(
                    F.col("n_tokens") > 1,
                    F.expr(
                        "transform(sequence(1, n_tokens - 1),"
                        " i -> concat(toks[i-1], ' ', toks[i]))"
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("bg"),
        )
        .groupBy("doc_id")
        .agg(
            F.countDistinct("bg").alias("n_distinct_bg"),
            F.count("*").alias("n_bg"),
        )
    )
    return (
        base.join(top, "doc_id")
        .join(bg, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            (F.col("top_tok") / F.col("n_tokens")).alias("top_token_frac"),
            F.coalesce(
                F.lit(1.0) - F.col("n_distinct_bg") / F.col("n_bg"), F.lit(0.0)
            ).alias("dup_bigram_frac"),
        )
        .withColumn(
            "flagged",
            (F.col("top_token_frac") > 0.12) | (F.col("dup_bigram_frac") > 0.55),
        )
        .orderBy("doc_id")
    )


GOPHER_REPETITION_SQL = r"""
WITH base AS (
  SELECT doc_id, lang, regexp_split_to_array(trim(text), '\s+') AS toks
  FROM documents WHERE text IS NOT NULL
), sized AS (
  SELECT doc_id, lang, toks, len(toks) AS n_tokens FROM base
), top AS (
  SELECT doc_id, MAX(c) AS top_tok FROM (
    SELECT doc_id, tok, COUNT(*) AS c
    FROM (SELECT doc_id, unnest(toks) AS tok FROM base) GROUP BY doc_id, tok
  ) GROUP BY doc_id
), bg AS (
  SELECT doc_id, COUNT(DISTINCT b) AS n_distinct_bg, COUNT(*) AS n_bg
  FROM (
    SELECT doc_id, unnest(
      CASE WHEN len(toks) > 1
           THEN list_transform(generate_series(1, len(toks) - 1),
                               i -> toks[i] || ' ' || toks[i + 1])
           ELSE [] END) AS b
    FROM base
  ) GROUP BY doc_id
)
SELECT s.doc_id, s.lang, CAST(s.n_tokens AS BIGINT) AS n_tokens,
       CAST(t.top_tok AS DOUBLE) / s.n_tokens AS top_token_frac,
       COALESCE(1.0 - CAST(b.n_distinct_bg AS DOUBLE) / b.n_bg, 0.0)
         AS dup_bigram_frac,
       (CAST(t.top_tok AS DOUBLE) / s.n_tokens > 0.12
        OR COALESCE(1.0 - CAST(b.n_distinct_bg AS DOUBLE) / b.n_bg, 0.0) > 0.55)
         AS flagged
FROM sized s
JOIN top t USING (doc_id)
LEFT JOIN bg b USING (doc_id)
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# first-event-per-burst throttling
# ---------------------------------------------------------------------------
def burst_first_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep only the FIRST event of each activity burst per
    (user, event_type): an event survives when no previous same-key
    event happened within the 30-minute window — the standard
    notification-throttle / dedup-by-recency row filter (the filter
    twin of sessionize's grouping).

    100 TB shape: one shuffle on (user_id, event_type), one window lag
    per partition, map-side filter — no joins, no state."""
    gap_us = 30 * 60 * 1_000_000
    e = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.withColumn("prev_us", F.lag(F.unix_micros("ts")).over(w))
        .filter(
            F.col("prev_us").isNull()
            | (F.unix_micros("ts") - F.col("prev_us") > gap_us)
        )
        .select("event_id", "user_id", "event_type", "ts")
        .orderBy("event_id")
    )


BURST_FIRST_SQL = """
WITH lagged AS (
  SELECT event_id, user_id, event_type, ts,
         LAG(epoch_us(ts)) OVER (PARTITION BY user_id, event_type
                                 ORDER BY ts, event_id) AS prev_us
  FROM events WHERE ts IS NOT NULL
)
SELECT event_id, user_id, event_type, ts
FROM lagged
WHERE prev_us IS NULL OR epoch_us(ts) - prev_us > 1800000000
ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# robust median/MAD outliers
# ---------------------------------------------------------------------------
def robust_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language document-length outliers by median absolute
    deviation: |n_chars - median| > 1.5 * MAD. Robust statistics are
    the production choice for corpus length filtering — one 10 GB
    pathological document moves a mean/stddev fence but not this one.

    Exactness: Spark ``percentile`` and DuckDB ``quantile_cont`` both
    interpolate, but over BIGINT inputs every interpolated value is a
    dyadic rational (x.5, then x.25 for the MAD) — exact in binary
    floating point on both engines, so even the two-level median is
    hash-exact.

    100 TB shape: exact percentile is a two-pass algorithm by nature;
    each pass is one aggregation, and the per-group medians/MADs join
    back as broadcasts (the group dimension is small). Three scans of
    the fact column total — at production scale you cache/checkpoint
    the projected column between passes."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("n_chars").isNotNull())
    med = d.groupBy("lang").agg(
        F.expr("percentile(n_chars, 0.5)").alias("med")
    )
    dev = d.join(F.broadcast(med), "lang").withColumn(
        "adev", F.abs(F.col("n_chars") - F.col("med"))
    )
    mad = dev.groupBy("lang").agg(F.expr("percentile(adev, 0.5)").alias("mad"))
    return (
        dev.join(F.broadcast(mad), "lang")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("med").alias("median_chars"),
            F.min("mad").alias("mad_chars"),
            F.count(
                F.when(F.col("adev") > 1.5 * F.col("mad"), F.lit(1))
            ).alias("n_outliers"),
        )
        .orderBy("lang")
    )


ROBUST_MAD_SQL = """
WITH med AS (
  SELECT lang, quantile_cont(n_chars, 0.5) AS med
  FROM documents WHERE n_chars IS NOT NULL GROUP BY lang
), dev AS (
  SELECT d.lang, d.n_chars, m.med, ABS(d.n_chars - m.med) AS adev
  FROM documents d JOIN med m USING (lang)
  WHERE d.n_chars IS NOT NULL
), mad AS (
  SELECT lang, quantile_cont(adev, 0.5) AS mad FROM dev GROUP BY lang
)
SELECT dev.lang,
       COUNT(*) AS n_docs,
       MIN(dev.med) AS median_chars,
       MIN(mad.mad) AS mad_chars,
       COUNT(CASE WHEN dev.adev > 1.5 * mad.mad THEN 1 END) AS n_outliers
FROM dev JOIN mad USING (lang)
GROUP BY dev.lang
ORDER BY dev.lang
"""


# ---------------------------------------------------------------------------
# exact equi-depth histogram without a global window
# ---------------------------------------------------------------------------
def equidepth_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 10-bucket equi-depth histogram of lineitem prices — the
    scale-safe way: ``ntile`` over a global ORDER BY collapses to ONE
    window partition (a single-reducer sort — the classic 100 TB
    killer), so instead the decile boundaries come from a cumulative
    histogram over DISTINCT price values (bounded cardinality: 2-dp
    prices in a bounded range), and rows bucket map-side against the
    broadcast boundary array.

    Boundaries are discrete order statistics (smallest value whose
    cumulative count reaches ceil(i*N/10)) — no interpolation, so both
    engines agree bit-for-bit; ties share a bucket by construction
    (same rule both sides), unlike ntile's arbitrary tie splitting."""
    # NULL prices are excluded on both sides: a histogram has no bin
    # for "price unknown", and the cumulative window ORDER BY cents
    # would otherwise place the NULL group at opposite ends (Spark
    # NULLS FIRST, DuckDB NULLS LAST — rule 15), shifting every decile
    # boundary (extreme sweep; same class as compaction_bins).
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_extendedprice").isNotNull())
        .select(F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("cents"))
    )
    hist = li.groupBy("cents").count()
    wcum = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.withColumn("cum", F.sum("count").over(wcum))
    total = li.count()  # one job; at scale this is a cheap count(*) agg
    bounds = (
        cum.crossJoin(
            F.broadcast(
                spark.range(1, 10).select(
                    F.ceil(F.col("id") * total / 10).alias("r")
                )
            )
        )
        .filter(F.col("cum") >= F.col("r"))
        .groupBy("r")
        .agg(F.min("cents").alias("b"))
        .agg(F.sort_array(F.collect_list("b")).alias("bounds"))
    )
    return (
        li.crossJoin(F.broadcast(bounds))
        .select(
            (
                1 + F.size(F.expr("filter(bounds, b -> cents > b)"))
            ).cast("long").alias("decile"),
            "cents",
        )
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
            F.sum("cents").alias("sum_cents"),
        )
        .orderBy("decile")
    )


EQUIDEPTH_SQL = """
WITH pts AS (
  SELECT CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS cents
  FROM lineitem WHERE l_extendedprice IS NOT NULL
), hist AS (
  SELECT cents, COUNT(*) AS c FROM pts GROUP BY cents
), cum AS (
  SELECT cents, SUM(c) OVER (ORDER BY cents
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM hist
), n AS (SELECT COUNT(*) AS total FROM pts),
ranks AS (
  SELECT CAST(CEIL(i * total / 10.0) AS BIGINT) AS r
  FROM (SELECT UNNEST(generate_series(1, 9)) AS i), n
), bounds AS (
  SELECT list_sort(list(b)) AS bounds FROM (
    SELECT r, MIN(cents) AS b FROM cum, ranks WHERE cum >= r GROUP BY r)
)
SELECT CAST(1 + len(list_filter(bounds, b -> cents > b)) AS BIGINT) AS decile,
       COUNT(*) AS n_rows,
       MIN(cents) AS min_cents,
       MAX(cents) AS max_cents,
       CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM pts, bounds
GROUP BY 1
ORDER BY decile
"""


# ---------------------------------------------------------------------------
# CDC changelog collapse (latest-op-wins, deletes drop)
# ---------------------------------------------------------------------------
def cdc_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collapse a CDC changelog to current state — the Debezium-feed
    pattern: per key, the LATEST operation wins and a trailing delete
    removes the key. The events table plays the changelog: 'error' is
    the delete op, anything else upserts (user_id key, (ts, event_id)
    the total-ordered sequence — 30/150 fixture users end deleted).

    100 TB shape: ONE scan, ONE shuffle — the per-key rank and the
    per-key change count are both windows over the same partitioning,
    so they share the exchange (no groupBy join-back, no second
    changelog scan). Each key sorts only its own ops. This is what
    MERGE INTO compiles to when applying a batched changelog to a
    snapshot."""
    e = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    wc = Window.partitionBy("user_id")
    return (
        e.select(
            "user_id",
            F.col("event_type").alias("last_op"),
            F.col("value").alias("last_value"),
            F.col("ts").alias("last_ts"),
            F.row_number().over(w).alias("rn"),
            F.count("*").over(wc).alias("n_changes"),
        )
        .filter((F.col("rn") == 1) & (F.col("last_op") != "error"))
        .drop("rn")
        .orderBy("user_id")
    )


CDC_LATEST_SQL = """
WITH ranked AS (
  SELECT user_id, event_type, value, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n_changes
  FROM events WHERE ts IS NOT NULL
)
SELECT user_id,
       event_type AS last_op,
       value AS last_value,
       ts AS last_ts,
       n_changes
FROM ranked
WHERE rn = 1 AND event_type <> 'error'
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# repeated-ngram coverage (substring-dedup removal accounting)
# ---------------------------------------------------------------------------
def repeated_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document fraction of tokens covered by corpus-repeated
    8-grams — the removal accounting of exact substring deduplication
    (Lee et al. 2021, "Deduplicating Training Data Makes Language
    Models Better"): repeated_ngram_spans finds WHICH grams repeat;
    this computes HOW MUCH of each document they cover, via an exact
    interval union over the matched [start, start+8) spans (window
    running-max of span ends, so overlapping matches never
    double-count a token).

    100 TB shape: gram explode is map-side; the repeated-gram set is
    corpus-sized, so membership is a shuffled semi-join on gram (NOT a
    broadcast); the interval union windows only over each doc's HIT
    positions (hits << tokens); one final doc-keyed join-back."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    base = d.select(
        "doc_id", F.split(F.col("text"), " ", -1).alias("toks")
    ).withColumn("n_tokens", F.size("toks"))
    grams = base.select(
        "doc_id",
        F.posexplode(
            F.when(
                F.col("n_tokens") >= 8,
                F.expr(
                    "transform(sequence(1, n_tokens - 7),"
                    " i -> array_join(slice(toks, i, 8), ' '))"
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("start", "gram"),
    )
    repeated = (
        grams.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gram")
    )
    hits = grams.join(repeated, "gram", "left_semi").select("doc_id", "start")
    w = (
        Window.partitionBy("doc_id")
        .orderBy("start")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    covered = (
        hits.withColumn(
            "prev_end", F.coalesce(F.max(F.col("start") + 8).over(w), F.lit(0))
        )
        .withColumn(
            "newcov",
            F.greatest(
                F.lit(0),
                F.col("start") + 8 - F.greatest(F.col("prev_end"), F.col("start")),
            ),
        )
        .groupBy("doc_id")
        .agg(F.sum("newcov").cast("long").alias("covered_tokens"))
    )
    return (
        base.join(covered, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.coalesce("covered_tokens", F.lit(0)).cast("long").alias(
                "covered_tokens"
            ),
            (
                F.coalesce("covered_tokens", F.lit(0)) / F.col("n_tokens")
            ).alias("coverage_frac"),
        )
        .orderBy("doc_id")
    )


REPEATED_COVERAGE_SQL = """
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS toks
  FROM documents WHERE text IS NOT NULL
), sized AS (
  SELECT doc_id, len(toks) AS n_tokens FROM base
), grams AS (
  SELECT doc_id, i - 1 AS start, array_to_string(toks[i:i+7], ' ') AS gram
  FROM base, LATERAL (SELECT UNNEST(generate_series(1, len(toks) - 7)) AS i)
), repeated AS (
  SELECT gram FROM grams GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2
), hits AS (
  SELECT g.doc_id, g.start FROM grams g JOIN repeated USING (gram)
), unioned AS (
  SELECT doc_id,
         GREATEST(0, start + 8 - GREATEST(
           COALESCE(MAX(start + 8) OVER (PARTITION BY doc_id ORDER BY start
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0),
           start)) AS newcov
  FROM hits
), covered AS (
  SELECT doc_id, CAST(SUM(newcov) AS BIGINT) AS covered_tokens
  FROM unioned GROUP BY doc_id
)
SELECT s.doc_id,
       CAST(s.n_tokens AS BIGINT) AS n_tokens,
       COALESCE(c.covered_tokens, 0) AS covered_tokens,
       CAST(COALESCE(c.covered_tokens, 0) AS DOUBLE) / s.n_tokens
         AS coverage_frac
FROM sized s LEFT JOIN covered c USING (doc_id)
ORDER BY s.doc_id
"""


# ---------------------------------------------------------------------------
# exact-substring dedup as a REMOVAL action (the cleaned corpus)
# ---------------------------------------------------------------------------
def dedup_excise_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring deduplication as the removal ACTION (Lee et al.
    2022 §3, ExactSubstr): emit the CLEANED corpus — every token
    covered by a corpus-repeated 8-gram excised, the survivors
    re-joined in order — plus per-doc accounting whose
    ``removed_tokens`` ties out exactly to repeated_ngram_coverage's
    ``covered_tokens`` (same repeated-gram set, same interval union;
    the coverage spec prices the removal, this one performs it).

    100 TB shape: the gram explode and the repeated-gram semi-join are
    shared with repeated_ngram_coverage (gram-keyed shuffle — the
    repeated set is corpus-sized, never broadcast). The NEW work is
    hit-sized, not corpus-sized: covered positions are an 8-way
    explode of the HITS (hits << tokens) aggregated doc-keyed via
    collect_set, then ONE doc-keyed join back to the corpus; the
    splice itself is a map-side higher-order function
    (array_except over the position sequence → transform → join),
    so no corpus-wide token shuffle ever happens."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    base = d.select(
        "doc_id", F.split(F.col("text"), " ", -1).alias("toks")
    ).withColumn("n_tokens", F.size("toks"))
    grams = base.select(
        "doc_id",
        F.posexplode(
            F.when(
                F.col("n_tokens") >= 8,
                F.expr(
                    "transform(sequence(1, n_tokens - 7),"
                    " i -> array_join(slice(toks, i, 8), ' '))"
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("start", "gram"),
    )
    repeated = (
        grams.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gram")
    )
    hits = grams.join(repeated, "gram", "left_semi").select("doc_id", "start")
    # collect_set dedupes overlapping-span positions — the interval
    # union, as a position set (sorted for a deterministic array)
    cov = (
        hits.select(
            "doc_id",
            F.explode(
                F.sequence(F.col("start"), F.col("start") + F.lit(7))
            ).alias("pos"),
        )
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_set("pos")).alias("cov"))
    )
    return (
        base.join(cov, "doc_id", "left")
        .withColumn(
            "cov", F.coalesce("cov", F.expr("cast(array() as array<int>)"))
        )
        .withColumn(
            # survivors in original order: array_except preserves the
            # order of its first argument (verified Spark 4.x)
            "text_clean",
            F.array_join(
                F.expr(
                    "transform(array_except(sequence(0, n_tokens - 1), cov),"
                    " i -> element_at(toks, i + 1))"
                ),
                " ",
            ),
        )
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.size("cov").cast("long").alias("removed_tokens"),
            (F.col("n_tokens") - F.size("cov")).cast("long").alias(
                "kept_tokens"
            ),
            F.length("text_clean").cast("long").alias("clean_chars"),
            "text_clean",
        )
        .orderBy("doc_id")
    )


# Oracle note: the splice is PER-ROW (list_filter over each base row's
# own token list), NOT a per-doc_id token re-aggregation — a grouped
# string_agg reconstruction silently merges duplicate-doc_id rows
# (dup-ingest battery) and collapses all NULL-doc_id rows into one
# group (nullkey battery), while the Spark side fans out / keeps them
# per input row. Mirrors the operator: join the covered-position LIST
# back, then rebuild each row independently.
DEDUP_EXCISE_SQL = """
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS toks
  FROM documents WHERE text IS NOT NULL
), grams AS (
  SELECT doc_id, i - 1 AS start, array_to_string(toks[i:i+7], ' ') AS gram
  FROM base, LATERAL (SELECT UNNEST(generate_series(1, len(toks) - 7)) AS i)
), repeated AS (
  SELECT gram FROM grams GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2
), hits AS (
  SELECT g.doc_id, g.start FROM grams g JOIN repeated USING (gram)
), cov AS (
  SELECT DISTINCT h.doc_id, h.start + j.j AS pos
  FROM hits h, LATERAL (SELECT UNNEST(generate_series(0, 7)) AS j) j
), covlist AS (
  SELECT doc_id, list(pos ORDER BY pos) AS cov FROM cov GROUP BY doc_id
), built AS (
  SELECT b.doc_id,
         len(b.toks) AS n_tokens,
         COALESCE(len(c.cov), 0) AS removed_tokens,
         array_to_string(
           list_transform(
             list_filter(range(len(b.toks)),
                         i -> NOT list_contains(COALESCE(c.cov, []), i)),
             i -> b.toks[i + 1]),
           ' ') AS text_clean
  FROM base b LEFT JOIN covlist c USING (doc_id)
)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(removed_tokens AS BIGINT) AS removed_tokens,
       CAST(n_tokens - removed_tokens AS BIGINT) AS kept_tokens,
       -- DuckDB array_to_string([]) is NULL where Spark array_join
       -- is '' — a fully-excised doc must read as empty, not NULL
       CAST(length(COALESCE(text_clean, '')) AS BIGINT) AS clean_chars,
       COALESCE(text_clean, '') AS text_clean
FROM built
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Z-order clustering keys
# ---------------------------------------------------------------------------
def _morton_expr(a: str, b: str, bits: int = 16) -> str:
    """Bit-interleave expression (identical Spark SQL / DuckDB SQL):
    even bits from `a`, odd bits from `b` — the Morton code that
    makes one sort key preserve locality in BOTH dimensions."""
    terms = []
    for i in range(bits):
        terms.append(f"(({a} >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"(({b} >> {i}) & 1) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


def zorder_clustered_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over (l_partkey, l_suppkey) —
    what OPTIMIZE ZORDER does in lakehouse table formats: writing the
    fact table sorted by this key co-locates rows that are close in
    EITHER dimension, so min/max file statistics skip files for
    filters on part OR supplier (a plain sort only skips on its
    leading column). The key is pure integer bit arithmetic — JVM
    whole-stage-codegen, no shuffle beyond the final distributed
    range-partition sort a real write would do.

    Returns the first 50 rows of the clustered layout (unique total
    order: zkey, orderkey, linenumber) — the head of the file Spark
    would write."""
    li = load_table(spark, sf_dir, "lineitem")
    zkey = F.expr(
        _morton_expr("(l_partkey & 65535)", "(l_suppkey & 65535)")
    ).cast("long")
    return (
        li.select(
            zkey.alias("zkey"),
            "l_partkey",
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
        )
        # NULLS LAST pinned on every sort key (rule 15): a NULL
        # part/supp key nulls the whole Morton key, and Spark's
        # ascending default (NULLS FIRST) would put those id-less rows
        # at the HEAD of the layout while DuckDB puts them last —
        # flipping the LIMIT-50 head (nullfk-sweep find). Last is also
        # the layout a real Z-order write wants: rows without cluster
        # stats go in the trailing unclustered files.
        .orderBy(
            F.asc_nulls_last("zkey"),
            F.asc_nulls_last("l_orderkey"),
            F.asc_nulls_last("l_linenumber"),
        )
        .limit(50)
    )


ZORDER_SQL = f"""
SELECT CAST({_morton_expr("(l_partkey & 65535)", "(l_suppkey & 65535)")} AS BIGINT)
         AS zkey,
       l_partkey, l_suppkey, l_orderkey, l_linenumber
FROM lineitem
ORDER BY zkey NULLS LAST, l_orderkey NULLS LAST, l_linenumber NULLS LAST
LIMIT 50
"""


def source_frequency_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source frequency capping — the pretraining-mix downsampler:
    over-represented sources (crawl domains, dumps) are capped at a
    fixed number of documents, selected by a DETERMINISTIC hash rank so
    the kept set is reproducible across engines, runs, and
    partitionings (the same multiplicative-hash family as the
    train/test split, mlprep.py; Spark's seeded sample() is neither).
    Output is the per-source accounting row a mix report shows:
    total / kept / dropped plus the smallest kept doc id.

    100 TB shape: rank is a per-source window (shuffle on source —
    the natural partitioning for a per-domain pass; a skewed mega-
    source is exactly the thing being capped, and AQE splits its
    partition), accounting is a map-side combine. At corpus scales
    where doc_id * MULT could overflow BIGINT, swap the rank key for
    xxhash64 — the oracle here keeps the multiplicative form because
    DuckDB must reproduce it."""
    cap = 15
    # NULL doc_id: its hash rank key is NULL and the engines place
    # NULLs on opposite ends of an ascending sort (contract rule 15) —
    # and a capping rank needs an identity anyway (NULL-key sweep).
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull()
    )
    h = _affine_hash(F.col("doc_id"))
    w = Window.partitionBy("source").orderBy(F.asc("h"), F.asc("doc_id"))
    ranked = (
        d.select("source", "doc_id", h.alias("h"))
        .withColumn("rk", F.row_number().over(w))
    )
    return (
        ranked.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.when(F.col("rk") <= cap, 1).otherwise(0))
            .cast("long")
            .alias("n_kept"),
            F.sum(F.when(F.col("rk") > cap, 1).otherwise(0))
            .cast("long")
            .alias("n_dropped"),
            F.min(F.when(F.col("rk") <= cap, F.col("doc_id")))
            .cast("long")
            .alias("first_kept_doc"),
        )
        .orderBy("source")
    )


SOURCE_FREQUENCY_CAP_SQL = f"""
WITH ranked AS (
  SELECT source, doc_id,
    ROW_NUMBER() OVER (
      PARTITION BY source
      ORDER BY {_affine_hash_sql("doc_id")}, doc_id) AS rk
  FROM documents WHERE doc_id IS NOT NULL
)
SELECT source,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(CASE WHEN rk <= 15 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
  CAST(SUM(CASE WHEN rk > 15 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
  CAST(MIN(CASE WHEN rk <= 15 THEN doc_id END) AS BIGINT) AS first_kept_doc
FROM ranked GROUP BY source ORDER BY source
"""


def domain_frequency_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-level curation (round 13, VERDICT r12 #8): common-crawl
    pipelines cap and dedup by REGISTRABLE DOMAIN, not source label —
    ``www.example.com``, ``cdn.example.com:8080`` and
    ``https://user@EXAMPLE.com./page`` are one publisher. Deterministic
    URL-ish strings are synthesized per doc (closed form in doc_id +
    source, exercising scheme/userinfo/port/case/trailing-dot/query/
    fragment and a multi-label ``co.uk`` suffix), canonicalized by the
    REAL operator pair (operators/urls.canonical_host →
    registrable_domain — pure JVM string ops), then frequency-capped
    per domain with the same deterministic affine-hash rank the
    source-level cap uses. The oracle constructs each variant's host
    closed-form, so parity proves the canonicalizer strips every
    component correctly.

    100 TB shape: canonicalization is map-side codegen (no UDF); the
    rank is a per-domain window (shuffle on domain — the natural
    partitioning; a skewed mega-domain is exactly what gets capped and
    AQE splits its partition); accounting is a map-side combine."""
    from burla_spark.operators.urls import canonical_host, registrable_domain

    cap = 2
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull() & F.col("source").isNotNull()
    )
    site = F.concat(F.col("source"), (F.col("doc_id") % 7).cast("string"))
    v = F.col("doc_id") % 6
    url = (
        # v=0 embeds an absolute URL in the query (the redirect/next
        # param shape common in real crawls — ADVICE r13): the
        # canonicalizer must keep the FIRST '://' split, or the host
        # resolves to evil.example and the oracle hash-fails.
        F.when(v == 0, F.concat(F.lit("https://WWW."), site, F.lit(".com/path/page?q="), F.col("doc_id").cast("string"), F.lit("&next=https://evil.example/x")))
        .when(v == 1, F.concat(F.lit("http://cdn."), site, F.lit(".com:8080/assets/img.png")))
        .when(v == 2, F.concat(F.lit("https://user:pw@www."), site, F.lit(".CO.UK/profile")))
        .when(v == 3, F.concat(site, F.lit(".com.")))
        .when(v == 4, F.concat(F.lit("https://api."), site, F.lit(".co.uk?q=1")))
        .otherwise(F.concat(F.lit("http://"), site, F.lit(".COM#frag")))
    )
    host = canonical_host(url)
    parsed = d.select(
        "doc_id",
        host.alias("host"),
        registrable_domain(host).alias("domain"),
    )
    w = Window.partitionBy("domain").orderBy(
        F.asc(_affine_hash(F.col("doc_id"))), F.asc("doc_id")
    )
    ranked = parsed.withColumn("rk", F.row_number().over(w))
    return (
        ranked.groupBy("domain")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.countDistinct("host").cast("long").alias("n_hosts"),
            F.sum(F.when(F.col("rk") <= cap, 1).otherwise(0))
            .cast("long")
            .alias("n_kept"),
            F.sum(F.when(F.col("rk") > cap, 1).otherwise(0))
            .cast("long")
            .alias("n_dropped"),
            F.min(F.when(F.col("rk") <= cap, F.col("doc_id")))
            .cast("long")
            .alias("first_kept_doc"),
        )
        .orderBy("domain")
    )


# the oracle builds each variant's canonical host CLOSED-FORM (what a
# correct canonicalizer must produce), so a Spark-side stripping bug —
# port kept, case kept, userinfo leaking into the host — hash-fails.
DOMAIN_FREQUENCY_CAP_SQL = f"""
WITH parsed AS (
  SELECT doc_id,
    CASE doc_id % 6
      WHEN 0 THEN 'www.' || lower(source || CAST(doc_id % 7 AS VARCHAR)) || '.com'
      WHEN 1 THEN 'cdn.' || lower(source || CAST(doc_id % 7 AS VARCHAR)) || '.com'
      WHEN 2 THEN 'www.' || lower(source || CAST(doc_id % 7 AS VARCHAR)) || '.co.uk'
      WHEN 3 THEN lower(source || CAST(doc_id % 7 AS VARCHAR)) || '.com'
      WHEN 4 THEN 'api.' || lower(source || CAST(doc_id % 7 AS VARCHAR)) || '.co.uk'
      ELSE lower(source || CAST(doc_id % 7 AS VARCHAR)) || '.com'
    END AS host,
    CASE WHEN doc_id % 6 IN (2, 4)
         THEN lower(source || CAST(doc_id % 7 AS VARCHAR)) || '.co.uk'
         ELSE lower(source || CAST(doc_id % 7 AS VARCHAR)) || '.com'
    END AS domain
  FROM documents WHERE doc_id IS NOT NULL AND source IS NOT NULL
), ranked AS (
  SELECT doc_id, host, domain,
    ROW_NUMBER() OVER (
      PARTITION BY domain
      ORDER BY {_affine_hash_sql("doc_id")}, doc_id) AS rk
  FROM parsed
)
SELECT domain,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(COUNT(DISTINCT host) AS BIGINT) AS n_hosts,
  CAST(SUM(CASE WHEN rk <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
  CAST(SUM(CASE WHEN rk > 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
  CAST(MIN(CASE WHEN rk <= 2 THEN doc_id END) AS BIGINT) AS first_kept_doc
FROM ranked GROUP BY domain ORDER BY domain
"""


def url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact URL-level dedup via FULL canonicalization (round 13,
    companion to domain_frequency_cap): the same page crawled as
    ``https://SITE.COM/p?b=2&a=1``, ``…:443/p?a=1&b=2``,
    ``…/p?a=1&utm_source=x&b=2#frag``, ``u:p@site.com./p…``,
    ``…?a=1&b=2&gclid=…``, ``…/p%61ge/…`` (percent-encoded unreserved
    char in the path, round 14) and ``…?%62=2&a=1`` (percent-encoded
    param name) must collapse to ONE canonical URL (host case, default
    port, userinfo, trailing dot, fragment, tracking params,
    percent-encoding, and query-param ORDER all normalized; path case
    and non-default ports preserved — they are identity). Seven such
    variants are synthesized per doc group; the REAL operator
    (operators/urls.canonical_url, pure JVM string/array expressions)
    collapses them and the spec emits per-canonical-URL dedup
    accounting. The oracle constructs the canonical form CLOSED-FORM,
    so parity proves every normalization step.

    100 TB shape: canonicalization is map-side codegen; the group-by
    shuffles on the canonical string — the natural dedup key."""
    from burla_spark.operators.urls import canonical_url

    d = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull() & F.col("source").isNotNull()
    )
    g = F.expr("doc_id div 7").cast("string")
    site = F.concat(F.col("source"), F.expr("(doc_id div 7) % 9").cast("string"))
    page = F.concat(F.lit("/page/"), g)
    v = F.col("doc_id") % 7
    url = (
        F.when(v == 0, F.concat(F.lit("https://"), F.upper(site), F.lit(".COM"), page, F.lit("?b=2&a=1")))
        .when(v == 1, F.concat(F.lit("https://"), site, F.lit(".com:443"), page, F.lit("?a=1&b=2")))
        .when(v == 2, F.concat(F.lit("https://"), site, F.lit(".com"), page, F.lit("?a=1&utm_source=x&b=2#frag")))
        .when(v == 3, F.concat(F.lit("https://u:p@"), site, F.lit(".com."), page, F.lit("?b=2&a=1")))
        .when(v == 4, F.concat(F.lit("https://"), site, F.lit(".com"), page, F.lit("?a=1&b=2&gclid=123")))
        # round 14: percent-encoded unreserved chars — '/p%61ge/' is
        # '/page/' and '?%62=2' is '?b=2' after RFC 3986 normalization
        .when(v == 5, F.concat(F.lit("https://"), site, F.lit(".com/p%61ge/"), g, F.lit("?a=1&b=2")))
        .otherwise(F.concat(F.lit("https://"), site, F.lit(".com"), page, F.lit("?%62=2&a=1")))
    )
    return (
        d.select("doc_id", canonical_url(url).alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            (F.count("*") - 1).cast("long").alias("n_dup_rows"),
            F.min("doc_id").cast("long").alias("first_doc"),
        )
        .orderBy("canonical_url")
    )


# closed-form canonical URLs: a Spark-side normalization bug (port
# kept, params unsorted, tracking param surviving, fragment leaking,
# percent-triplet undecoded) produces a different group key and
# hash-fails.
URL_CANONICAL_DEDUP_SQL = """
WITH parsed AS (
  SELECT doc_id,
         'https://' || lower(source || CAST((doc_id // 7) % 9 AS VARCHAR))
         || '.com/page/' || CAST(doc_id // 7 AS VARCHAR)
         || '?a=1&b=2' AS canonical_url
  FROM documents WHERE doc_id IS NOT NULL AND source IS NOT NULL
)
SELECT canonical_url,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) - 1 AS BIGINT) AS n_dup_rows,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc
FROM parsed GROUP BY canonical_url ORDER BY canonical_url
"""


def importance_acceptance_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probability-proportional acceptance sampling — the corpus
    reweighting move (DCLM/quality-resampling style): keep doc i iff
    u_i < p_i, with u_i a DETERMINISTIC hash-uniform of the doc id and
    p_i proportional to a per-doc weight (here min(1, n_tokens/400) as
    the weight proxy; production swaps in a quality or perplexity
    score). Unlike top-k weighted sampling (weighted_sample_orders),
    acceptance sampling needs no rank, no shuffle on the weight — it
    is a pure map-side filter, which is why it's the default at
    100 TB: each partition decides its own rows, membership is a pure
    function of (id, weight), and re-runs keep the exact same docs.

    Determinism: u is an exact BIGINT ratio, p a ratio of exact ints;
    the comparison is per-row IEEE arithmetic (contract rule 9 —
    identical on both engines). Accounting avoids double accumulation:
    counts are BIGINT, the only other outputs are MIN/MAX."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    n_tokens = F.size(F.split(F.trim("text"), r"\s+"))
    u = (
        _affine_hash(F.col("doc_id"))
        .cast("double")
        / F.lit(float(_HASH_MOD))
    )
    p = F.least(F.lit(1.0), n_tokens.cast("double") / F.lit(400.0))
    return (
        d.select("doc_id", "lang", u.alias("u"), p.alias("p"))
        .withColumn("kept", F.col("u") < F.col("p"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("kept"), 1).otherwise(0)).cast("long").alias("n_kept"),
            F.min(F.when(F.col("kept"), F.col("doc_id"))).cast("long").alias("first_kept"),
            F.max(F.when(F.col("kept"), F.col("doc_id"))).cast("long").alias("last_kept"),
        )
        .orderBy("lang")
    )


IMPORTANCE_SAMPLE_SQL = rf"""
WITH scored AS (
  SELECT doc_id, lang,
    CAST({_affine_hash_sql("doc_id")} AS DOUBLE) / {_HASH_MOD}.0 AS u,
    LEAST(1.0, CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE) / 400.0) AS p
  FROM documents WHERE text IS NOT NULL
)
SELECT lang,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(CASE WHEN u < p THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
  CAST(MIN(CASE WHEN u < p THEN doc_id END) AS BIGINT) AS first_kept,
  CAST(MAX(CASE WHEN u < p THEN doc_id END) AS BIGINT) AS last_kept
FROM scored GROUP BY lang ORDER BY lang
"""


# ---------------------------------------------------------------------------
# incremental (delta-vs-base) dedup
# ---------------------------------------------------------------------------
def incremental_dedup_new_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus dedup — the production shape dedup actually
    runs in: a NEW batch arrives and must dedup (a) against the
    EXISTING corpus and (b) within itself, without rescanning corpus
    text. The batch split here is a deterministic 20 % hash slice of
    doc_id (stand-in for an ingest partition). Rules, applied in
    order: a new doc whose sha256 digest already exists in the base
    corpus is ``dropped_base``; of the remaining new docs sharing a
    digest, the smallest doc_id is ``kept`` and the rest are
    ``dropped_within``. Output is the per-lang ingest report.

    100 TB shape: only DIGESTS move — the base corpus contributes a
    distinct-digest table (in production: the bucketed digest index
    maintained across ingests, so the join is co-located and the new
    batch never touches corpus text); the batch-side dedup is one
    digest-keyed aggregate. Text is scanned exactly once to hash."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    hashed = d.select(
        "doc_id",
        "lang",
        F.sha2(F.col("text"), 256).alias("dig"),
        (
            _affine_hash(F.col("doc_id")) < F.lit(_HASH_MOD // 5)
        ).alias("is_new"),
    )
    base_digs = (
        hashed.filter(~F.col("is_new")).select("dig").distinct()
        .withColumn("in_base", F.lit(True))
    )
    new = hashed.filter(F.col("is_new")).join(base_digs, "dig", "left")
    first_new = Window.partitionBy("dig").orderBy("doc_id")
    status = (
        new.withColumn("rk", F.row_number().over(first_new))
        .select(
            "lang",
            F.when(F.col("in_base"), F.lit("dropped_base"))
            .when(F.col("rk") == 1, F.lit("kept"))
            .otherwise(F.lit("dropped_within"))
            .alias("status"),
        )
    )
    return (
        status.groupBy("lang")
        .agg(
            F.count("*").alias("n_new"),
            F.sum(F.when(F.col("status") == "kept", 1).otherwise(0))
            .cast("long").alias("n_kept"),
            F.sum(F.when(F.col("status") == "dropped_base", 1).otherwise(0))
            .cast("long").alias("n_dropped_base"),
            F.sum(F.when(F.col("status") == "dropped_within", 1).otherwise(0))
            .cast("long").alias("n_dropped_within"),
        )
        .orderBy("lang")
    )


INCREMENTAL_DEDUP_SQL = f"""
WITH hashed AS (
  SELECT doc_id, lang, sha256(text) AS dig,
         {_affine_hash_sql("doc_id")} < {_HASH_MOD // 5} AS is_new
  FROM documents WHERE text IS NOT NULL
), base_digs AS (
  SELECT DISTINCT dig FROM hashed WHERE NOT is_new
), new_marked AS (
  SELECT h.lang, h.doc_id, h.dig, (b.dig IS NOT NULL) AS in_base,
         ROW_NUMBER() OVER (PARTITION BY h.dig ORDER BY h.doc_id) AS rk
  FROM hashed h LEFT JOIN base_digs b ON h.dig = b.dig
  WHERE h.is_new
), status AS (
  SELECT lang,
         CASE WHEN in_base THEN 'dropped_base'
              WHEN rk = 1 THEN 'kept'
              ELSE 'dropped_within' END AS status
  FROM new_marked
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_new,
       CAST(SUM(CASE WHEN status = 'kept' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       CAST(SUM(CASE WHEN status = 'dropped_base' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dropped_base,
       CAST(SUM(CASE WHEN status = 'dropped_within' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dropped_within
FROM status GROUP BY lang ORDER BY lang
"""


# ---------------------------------------------------------------------------
# compaction planning (small-file bin rollup)
# ---------------------------------------------------------------------------
COMPACT_TARGET_BYTES = 256_000  # fixture-scaled stand-in for ~512 MB


def compaction_bins_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction plan — the table-maintenance pass every
    long-lived 100 TB dataset needs: roll many small files into
    target-sized output groups, preserving layout order so data
    skipping keeps working after the rewrite. Documents play the file
    manifest (doc_id = file, n_chars = bytes, source = table
    partition): within each partition, files in layout order are
    assigned to bin floor(cumulative_bytes / target) — the
    deterministic rollup rule (contiguous ranges, no re-sorting, both
    engines agree exactly since everything is BIGINT arithmetic).
    Output: one row per (source, bin) — the rewrite task list with its
    size accounting.

    100 TB shape: the cumulative sum windows per PARTITION (source) —
    the unit a compactor locks and rewrites — never globally; a
    partition's manifest is millions of rows at most, not the table's
    row count. Emitting contiguous [first_doc, last_doc] ranges is
    what lets the rewrite stream each bin without a shuffle.

    NULL-key policy (both sides): doc_id is the layout ORDER key of the
    cumulative window, and the engines disagree on NULL placement in an
    ascending sort (Spark NULLS FIRST, DuckDB NULLS LAST — contract
    rule 15), which would shift every cum past the first NULL. An
    order key needs an identity: id-less manifest rows are excluded
    here and in COMPACTION_BINS_SQL."""
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & F.col("doc_id").isNotNull())
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # integer DIV, not `/` + cast: float division of a huge cumulative
    # byte count would lose exactness past 2^53 (contract rule 4)
    binned = d.select(
        "source", "doc_id", "n_chars", F.sum("n_chars").over(w).alias("cum")
    ).select(
        "source",
        "doc_id",
        "n_chars",
        F.expr(f"cum DIV {COMPACT_TARGET_BYTES}").alias("bin"),
    )
    return (
        binned.groupBy("source", "bin")
        .agg(
            F.count("*").alias("n_files"),
            F.sum("n_chars").alias("n_bytes"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("source", "bin")
    )


COMPACTION_BINS_SQL = f"""
WITH binned AS (
  SELECT source, doc_id, n_chars,
         CAST(SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW)
              // {COMPACT_TARGET_BYTES} AS BIGINT) AS bin
  FROM documents WHERE text IS NOT NULL AND doc_id IS NOT NULL
)
SELECT source, bin,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(n_chars) AS BIGINT) AS n_bytes,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc,
       CAST(MAX(doc_id) AS BIGINT) AS last_doc
FROM binned GROUP BY source, bin ORDER BY source, bin
"""


# ---------------------------------------------------------------------------
# Incremental aggregate maintenance — the materialized-view discipline:
# a standing per-key aggregate (count, sum) is updated by merging a
# DELTA batch's partial aggregate instead of recomputing over the full
# history. COUNT/SUM are self-mergeable, so base ⊕ delta must equal
# the full recompute EXACTLY — which is what the oracle computes, so
# the parity row proves the merge algebra, not just the numbers.
# ---------------------------------------------------------------------------
# mid-range of the fixture's order dates (1995..2001) so BOTH the base
# aggregate and the delta batch are non-trivial (the q9 vacuity lesson)
_INCR_CUTOFF = "1998-01-01"


def incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order count/total maintained incrementally: base
    aggregate (orders before the cutoff) FULL OUTER merged with the
    delta batch's aggregate (orders on/after it); top 25 spenders.

    100 TB shape: the delta aggregate touches ONLY the new partition's
    rows (partition pruning on the date predicate reaches the scan),
    and the merge join is keyed on the aggregate's own grouping key —
    base-side state never rescans history. Sums ride DECIMAL so the
    merged total is bit-equal to a full recompute regardless of
    accumulation order."""
    # NULL-key policy (both sides, nullfk-sweep find): the merge is a
    # FULL OUTER join on the grouping key, and a NULL key never matches
    # itself — base's NULL group and delta's NULL group would surface
    # as TWO unmerged rows where the recompute oracle has one. A merge
    # key needs an identity; key-less orders are excluded on both
    # engine sides (a real MV maintenance job routes them to a
    # dead-letter audit, not into the keyed view).
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_custkey").isNotNull()
    )
    cutoff = F.lit(_INCR_CUTOFF).cast("timestamp")

    def part_agg(df: DataFrame) -> DataFrame:
        return df.groupBy("o_custkey").agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("tot"),
        )

    # every row must land in EXACTLY one partial or the view silently
    # loses it: NULL dates route to the base (matches the oracle's
    # unfiltered full recompute under NULL injection)
    base = part_agg(
        o.filter((F.col("o_orderdate") < cutoff) | F.col("o_orderdate").isNull())
    )
    delta = part_agg(o.filter(F.col("o_orderdate") >= cutoff))
    merged = (
        base.alias("b")
        .join(delta.alias("d"), "o_custkey", "full_outer")
        .select(
            "o_custkey",
            (
                F.coalesce(F.col("b.cnt"), F.lit(0))
                + F.coalesce(F.col("d.cnt"), F.lit(0))
            )
            .cast("long")
            .alias("n_orders"),
            F.coalesce(F.col("d.cnt"), F.lit(0)).cast("long").alias("n_new"),
            (
                F.coalesce(F.col("b.tot"), F.lit(0).cast("decimal(18,4)"))
                + F.coalesce(F.col("d.tot"), F.lit(0).cast("decimal(18,4)"))
            ).alias("tot"),
        )
    )
    return (
        merged.orderBy(F.desc("tot"), F.asc("o_custkey"))
        .limit(25)
        .select(
            "o_custkey",
            "n_orders",
            "n_new",
            F.col("tot").cast("double").alias("total_spent"),
        )
    )


INCREMENTAL_AGG_SQL = f"""
WITH merged AS (
  SELECT o_custkey,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(COUNT(*) FILTER (
           WHERE o_orderdate >= TIMESTAMP '{_INCR_CUTOFF} 00:00:00'
         ) AS BIGINT) AS n_new,
         SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS tot
  FROM orders WHERE o_custkey IS NOT NULL GROUP BY o_custkey
)
SELECT o_custkey, n_orders, n_new, CAST(tot AS DOUBLE) AS total_spent
FROM merged ORDER BY tot DESC, o_custkey LIMIT 25
"""


# ---------------------------------------------------------------------------
# N-gram novelty decay (round 11): the marginal-value-of-more-data
# curve — for each power-of-two document checkpoint along the
# deterministic ingest order, what fraction of 8-gram OCCURRENCES in
# the newly-ingested interval is duplicated text (first seen earlier
# or within the interval)? Fluent fresh sources stay novel; a crawl
# re-visiting the same sites decays fast — this is the "does another
# crawl buy anything after dedup" ROI view (the corpus-growth twin of
# repeated_ngram_coverage's per-doc removal accounting, and the
# occurrence-level twin of mixing.heaps_vocab_growth's vocab fit).
#
# 100 TB shape: an occurrence is novel iff its rank equals its gram's
# first-occurrence rank — so "duplicated fraction per interval" needs
# only the (source, gram) -> min-rank aggregate (map-side partial MIN,
# same cost class as the dedup family's shingle tables) plus two
# docs-bounded per-rank count tables; intervals come from an
# O(log n)-row checkpoint spine, never a corpus-scale window. NULL
# doc_id = no ingest position = excluded, both engines (nullkey rule).
# ---------------------------------------------------------------------------
def ngram_novelty_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_novelty_decay_of(load_table(spark, sf_dir, "documents"))


def ngram_novelty_decay_of(
    corpus: DataFrame, rank_col: str | None = None
) -> DataFrame:
    """Novelty decay over any (source, doc_id, text) corpus frame.

    ``rank_col`` names a column already carrying the 1-based
    per-source ingest rank (a production feed has one natively —
    VERDICT r11 #5: deriving it here is a full per-source sort of the
    corpus at 100 TB). Absent, rank falls back to a row_number window
    over doc_id — the replayable fixture path the oracle uses."""
    d = corpus.filter(F.col("text").isNotNull()).filter(
        F.col("doc_id").isNotNull()
    )
    toks = F.split(F.col("text"), " ", -1).alias("toks")
    if rank_col is not None:
        sized = d.select(
            "source", F.col(rank_col).cast("long").alias("drank"), toks
        )
    else:
        w = Window.partitionBy("source").orderBy("doc_id")
        sized = d.select("source", "doc_id", toks).withColumn(
            "drank", F.row_number().over(w)
        )
    grams8 = F.when(
        F.size("toks") >= 8,
        F.expr(
            "transform(sequence(1, size(toks) - 7),"
            " i -> array_join(slice(toks, i, 8), ' '))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    occ = sized.select("source", "drank", F.explode(grams8).alias("gram"))
    occ_per_rank = occ.groupBy("source", "drank").agg(
        F.count("*").alias("n_occ")
    )
    new_per_rank = (
        occ.groupBy("source", "gram")
        .agg(F.min("drank").alias("r0"))
        .groupBy("source", "r0")
        .agg(F.count("*").alias("n_new"))
    )
    maxr = sized.groupBy("source").agg(F.max("drank").alias("max_rank"))
    cpts = (
        sized.select("source", "drank")
        .join(maxr, "source")
        .filter(
            (F.expr("drank & (drank - 1)") == 0)
            | (F.col("drank") == F.col("max_rank"))
        )
        .select("source", F.col("drank").alias("c"))
        .distinct()
    )
    wc = Window.partitionBy("source").orderBy("c")
    iv = cpts.withColumn(
        "prev_c", F.coalesce(F.lag("c").over(wc), F.lit(0))
    )
    occ_iv = (
        occ_per_rank.join(iv, "source")
        .filter((F.col("drank") > F.col("prev_c")) & (F.col("drank") <= F.col("c")))
        .groupBy("source", "c", "prev_c")
        .agg(F.sum("n_occ").cast("long").alias("n_occurrences"))
    )
    new_iv = (
        new_per_rank.join(iv, "source")
        .filter((F.col("r0") > F.col("prev_c")) & (F.col("r0") <= F.col("c")))
        .groupBy("source", "c")
        .agg(F.sum("n_new").cast("long").alias("n_novel"))
    )
    return (
        occ_iv.join(new_iv, ["source", "c"], "left")
        .select(
            "source",
            F.col("c").cast("long").alias("checkpoint_docs"),
            (F.col("c") - F.col("prev_c")).cast("long").alias("interval_docs"),
            "n_occurrences",
            F.coalesce(F.col("n_novel"), F.lit(0)).cast("long").alias("n_novel"),
            (
                F.round(
                    F.lit(1.0)
                    - F.coalesce(F.col("n_novel"), F.lit(0)).cast("double")
                    / F.col("n_occurrences"),
                    6,
                )
                + F.lit(0.0)
            ).alias("dup_rate"),
        )
        .orderBy("source", "checkpoint_docs")
    )


NGRAM_NOVELTY_SQL = """
WITH sized AS (
  SELECT source, string_split(text, ' ') AS toks,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS drank
  FROM documents WHERE text IS NOT NULL AND doc_id IS NOT NULL
), occ AS (
  SELECT source, drank, array_to_string(toks[i:i+7], ' ') AS gram
  FROM sized, LATERAL (SELECT UNNEST(generate_series(1, len(toks) - 7)) AS i)
  WHERE len(toks) >= 8
), occ_per_rank AS (
  SELECT source, drank, COUNT(*) AS n_occ FROM occ GROUP BY 1, 2
), new_per_rank AS (
  SELECT source, r0, COUNT(*) AS n_new
  FROM (SELECT source, gram, MIN(drank) AS r0 FROM occ GROUP BY 1, 2)
  GROUP BY 1, 2
), maxr AS (
  SELECT source, MAX(drank) AS max_rank FROM sized GROUP BY source
), cpts AS (
  SELECT DISTINCT s.source, s.drank AS c
  FROM sized s JOIN maxr m ON s.source = m.source
  WHERE (s.drank & (s.drank - 1)) = 0 OR s.drank = m.max_rank
), iv AS (
  SELECT source, c,
         COALESCE(LAG(c) OVER (PARTITION BY source ORDER BY c), 0) AS prev_c
  FROM cpts
), occ_iv AS (
  SELECT o.source, i.c, i.prev_c, CAST(SUM(o.n_occ) AS BIGINT) AS n_occurrences
  FROM occ_per_rank o JOIN iv i
    ON o.source = i.source AND o.drank > i.prev_c AND o.drank <= i.c
  GROUP BY 1, 2, 3
), new_iv AS (
  SELECT n.source, i.c, CAST(SUM(n.n_new) AS BIGINT) AS n_novel
  FROM new_per_rank n JOIN iv i
    ON n.source = i.source AND n.r0 > i.prev_c AND n.r0 <= i.c
  GROUP BY 1, 2
)
SELECT o.source AS source,
       CAST(o.c AS BIGINT) AS checkpoint_docs,
       CAST(o.c - o.prev_c AS BIGINT) AS interval_docs,
       o.n_occurrences,
       COALESCE(n.n_novel, 0) AS n_novel,
       ROUND(1.0 - CAST(COALESCE(n.n_novel, 0) AS DOUBLE) / o.n_occurrences, 6)
         + 0.0 AS dup_rate
FROM occ_iv o LEFT JOIN new_iv n ON o.source = n.source AND o.c = n.c
ORDER BY o.source, checkpoint_docs
"""


SPECS: list[QuerySpec] = [
    QuerySpec(
        "ngram_novelty_decay",
        ngram_novelty_decay,
        NGRAM_NOVELTY_SQL,
        ("curation", "dedup", "diagnostics"),
        doc="Per-source duplicated-8-gram-occurrence fraction per "
        "power-of-two ingest interval — the marginal-value-of-more-"
        "data / dedup-ROI curve (round 11).",
    ),
    QuerySpec(
        "incremental_agg_maintenance",
        incremental_agg_maintenance,
        INCREMENTAL_AGG_SQL,
        ("agg", "incremental", "merge"),
        doc="Materialized-view merge: base ⊕ delta equals full recompute.",
    ),
    QuerySpec(
        "compaction_bins_by_source",
        compaction_bins_by_source,
        COMPACTION_BINS_SQL,
        ("layout", "curation", "maintenance"),
        doc="Small-file compaction plan: per-partition cumulative-size "
        "bin rollup into contiguous target-sized rewrite groups.",
    ),
    QuerySpec(
        "incremental_dedup_new_docs",
        incremental_dedup_new_docs,
        INCREMENTAL_DEDUP_SQL,
        ("dedup", "curation", "incremental"),
        doc="Delta-vs-base incremental dedup: new-batch ingest report "
        "(dropped-vs-corpus, deduped-within-batch, kept) on a "
        "digest-only join.",
    ),
    QuerySpec(
        "importance_acceptance_sample",
        importance_acceptance_sample,
        IMPORTANCE_SAMPLE_SQL,
        ("llm", "sampling", "curation"),
        doc="Probability-proportional acceptance sampling (map-side "
        "deterministic corpus reweighting — no rank, no shuffle).",
    ),
    QuerySpec(
        "source_frequency_cap",
        source_frequency_cap,
        SOURCE_FREQUENCY_CAP_SQL,
        ("llm", "sampling", "curation"),
        doc="Per-source frequency capping by deterministic hash rank "
        "(pretraining-mix downsampler).",
    ),
    QuerySpec(
        "gopher_repetition_filters",
        gopher_repetition_filters,
        GOPHER_REPETITION_SQL,
        ("llm", "text", "quality"),
    ),
    QuerySpec(
        "burst_first_events",
        burst_first_events,
        BURST_FIRST_SQL,
        ("window", "filter", "timeseries"),
    ),
    QuerySpec(
        "robust_mad_outliers",
        robust_mad_outliers,
        ROBUST_MAD_SQL,
        ("agg", "quality", "mlprep"),
    ),
    QuerySpec(
        "equidepth_price_histogram",
        equidepth_price_histogram,
        EQUIDEPTH_SQL,
        ("agg", "scale"),
    ),
    QuerySpec(
        "cdc_latest_state",
        cdc_latest_state,
        CDC_LATEST_SQL,
        ("cdc", "window", "merge"),
        doc="changelog collapse: latest-op-wins with trailing-delete drop",
    ),
    QuerySpec(
        "repeated_ngram_coverage",
        repeated_ngram_coverage,
        REPEATED_COVERAGE_SQL,
        ("dedup", "text", "llm"),
        doc="exact substring-dedup removal accounting (interval union)",
    ),
    QuerySpec(
        "dedup_excise_spans",
        dedup_excise_spans,
        DEDUP_EXCISE_SQL,
        ("dedup", "text", "llm", "action"),
        doc="exact substring-dedup REMOVAL: cleaned corpus + accounting",
    ),
    QuerySpec(
        "domain_frequency_cap",
        domain_frequency_cap,
        DOMAIN_FREQUENCY_CAP_SQL,
        ("curation", "text", "llm"),
        doc="URL canonicalization + registrable-domain frequency cap "
        "(oracle hosts are closed-form: parity proves the stripper)",
    ),
    QuerySpec(
        "url_canonical_dedup",
        url_canonical_dedup,
        URL_CANONICAL_DEDUP_SQL,
        ("curation", "dedup", "llm"),
        doc="exact URL dedup via full canonicalization (case/port/"
        "userinfo/fragment/tracking/param-order); closed-form oracle",
    ),
    QuerySpec(
        "zorder_clustered_layout",
        zorder_clustered_layout,
        ZORDER_SQL,
        ("scale", "layout"),
    ),
]
