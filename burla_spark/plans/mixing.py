"""Training-run data-mixing plans: epoch-seeded deterministic
shuffling, token-budget epoch planning, and length-curriculum phasing.

These are the steps BETWEEN a curated corpus and a training run: decide
how often each source repeats under a token budget (the Llama/GPT-style
mixture plan), give every document a reproducible per-epoch shuffle
position, and stage documents into curriculum phases. They complete the
pipeline whose upstream lives in plans/curation.py (filtering/capping)
and plans/llm.py (dedup/packing): reference users run this exact
sequence around remote_parallel_map preprocessing jobs (reference
README.md:146 2.4 TB parquet prep example).

Scale/determinism notes (ENGINEERING_NOTES contract):
* shuffle keys are md5 of a ``doc_id:epoch`` string — identical
  lowercase-hex output on Spark and DuckDB, stable across runs,
  engines, and partitionings (seeded rand() is none of those);
* nothing here sorts globally: batch assignment is a pure map-side
  hash bucket, curriculum boundaries come from a cumulative histogram
  over DISTINCT lengths (the equidepth_price_histogram pattern —
  bounded cardinality, no single-reducer ntile);
* all counts/sums are exact BIGINTs; the only doubles are final
  per-row ratios, rounded (rule 9: per-row IEEE ops are engine-exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from burla_spark.plans.base import QuerySpec
from burla_spark.sources.tables import load_table

_N_TOKENS = r"""len(regexp_split_to_array(trim(text), '\s+'))"""


def _n_tokens_col():
    return F.size(F.split(F.trim("text"), r"\s+")).cast("long")


# ---------------------------------------------------------------------------
# epoch-seeded deterministic shuffle / batch bucketing
# ---------------------------------------------------------------------------
def epoch_batch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch shuffle bucketing — the data-ordering
    step of a training run: every (doc, epoch) gets a reproducible
    shuffle key md5(doc_id:epoch), and its batch bucket is the key's
    first hex digit (16 buckets/epoch here; production uses more
    digits). Reordering per epoch falls out of re-keying, with no
    global sort anywhere: bucket assignment is map-side, so at 100 TB
    this is one corpus scan + a 48-group aggregate, and the bucketed
    write (partitionBy epoch/batch) gives each trainer shard its own
    files. Output is the balance report: docs and exact token counts
    per (epoch, batch) — near-uniform buckets certify the shuffle.

    Determinism: md5 hex strings are identical on both engines; counts
    and token sums are exact BIGINTs (no doubles at all)."""
    d = load_table(spark, sf_dir, "documents").filter(
        # NULL doc_id: concat_ws would SKIP it and hash ':epoch' into a
        # real bucket while the oracle's || nulls the key — and a shuffle
        # key needs an identity anyway (NULL-key sweep find).
        F.col("text").isNotNull() & F.col("doc_id").isNotNull()
    )
    epochs = spark.range(1, 4).select(F.col("id").cast("int").alias("epoch"))
    keyed = (
        d.select("doc_id", _n_tokens_col().alias("n_tokens"))
        .crossJoin(F.broadcast(epochs))
        .select(
            "epoch",
            "doc_id",
            "n_tokens",
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.col("doc_id").cast("string"),
                        F.col("epoch").cast("string"),
                    )
                ),
                1,
                1,
            ).alias("batch_key"),
        )
    )
    return (
        keyed.groupBy("epoch", "batch_key")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("epoch", "batch_key")
    )


EPOCH_BATCH_SHUFFLE_SQL = rf"""
WITH keyed AS (
  SELECT e.epoch, d.doc_id,
         CAST({_N_TOKENS} AS BIGINT) AS n_tokens,
         substr(md5(CAST(d.doc_id AS VARCHAR) || ':' ||
                    CAST(e.epoch AS VARCHAR)), 1, 1) AS batch_key
  FROM documents d,
       (SELECT UNNEST(generate_series(1, 3)) AS epoch) e
  WHERE d.text IS NOT NULL AND d.doc_id IS NOT NULL
)
SELECT CAST(epoch AS INTEGER) AS epoch, batch_key,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc,
       CAST(MAX(doc_id) AS BIGINT) AS last_doc
FROM keyed
GROUP BY epoch, batch_key
ORDER BY epoch, batch_key
"""


# ---------------------------------------------------------------------------
# token-budget epoch planning (mixture → repeat factors)
# ---------------------------------------------------------------------------
def token_budget_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source epoch plan under a token budget — the step after
    temperature mixture weighting (mlprep.temperature_mixture_weights):
    given a total training budget B and temperature-flattened weights
    w_s ∝ n_tokens^0.5, each source's token target is B·w_s and its
    repeat factor (epochs) is target/available, capped at 4 epochs
    (the standard repetition ceiling — data-constrained scaling work
    shows returns decay past ~4 repeats). ``capped`` marks sources the
    budget would over-sample beyond the ceiling; the shortfall is what
    a mix designer re-allocates.

    100 TB shape: one column-pruned corpus scan into a
    source-cardinality aggregate; the normalizer is a 1-row broadcast;
    everything after is arithmetic on a tiny frame. Determinism: the
    per-source weight is the per-row ROUND of a pow (engine-exact),
    and the normalizer sums those through a DECIMAL cast (contract
    rule 1 — a raw double SUM's accumulation order is unspecified and
    a 1-ULP z shift could flip a ROUND boundary downstream)."""
    budget = 2_000_000  # tokens; a fixture-scaled stand-in for 1e13
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    per = d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(_n_tokens_col()).alias("n_tokens"),
    )
    per = per.withColumn(
        "w_raw", F.round(F.pow(F.col("n_tokens").cast("double"), F.lit(0.5)), 6)
    )
    z = per.agg(
        F.sum(F.col("w_raw").cast("decimal(38,6)")).alias("z")
    )
    planned = (
        per.crossJoin(F.broadcast(z))
        .withColumn("weight", F.col("w_raw") / F.col("z").cast("double"))
        .withColumn(
            "target_tokens",
            F.round(F.lit(float(budget)) * F.col("weight"), 0).cast("long"),
        )
        .withColumn(
            "epochs_raw",
            F.col("target_tokens").cast("double")
            / F.col("n_tokens").cast("double"),
        )
    )
    return planned.select(
        "source",
        "n_docs",
        "n_tokens",
        F.round("weight", 6).alias("mixture_weight"),
        "target_tokens",
        F.round(F.least(F.lit(4.0), F.col("epochs_raw")), 4).alias("epochs"),
        (F.col("epochs_raw") > 4.0).alias("capped"),
    ).orderBy("source")


TOKEN_BUDGET_EPOCH_PLAN_SQL = rf"""
WITH per AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM({_N_TOKENS}) AS BIGINT) AS n_tokens
  FROM documents WHERE text IS NOT NULL GROUP BY source
), w AS (
  SELECT *, ROUND(POW(CAST(n_tokens AS DOUBLE), 0.5), 6) AS w_raw FROM per
), z AS (SELECT SUM(CAST(w_raw AS DECIMAL(38,6))) AS z FROM w),
planned AS (
  SELECT source, n_docs, n_tokens,
         w_raw / CAST(z AS DOUBLE) AS weight,
         CAST(ROUND(2000000.0 * (w_raw / CAST(z AS DOUBLE)), 0) AS BIGINT)
           AS target_tokens
  FROM w, z
)
SELECT source, n_docs, n_tokens,
       ROUND(weight, 6) AS mixture_weight,
       target_tokens,
       ROUND(LEAST(4.0, CAST(target_tokens AS DOUBLE)
                         / CAST(n_tokens AS DOUBLE)), 4) AS epochs,
       (CAST(target_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE)) > 4.0
         AS capped
FROM planned
ORDER BY source
"""


# ---------------------------------------------------------------------------
# length-curriculum phases
# ---------------------------------------------------------------------------
def curriculum_length_phases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Short→long length curriculum, exact and single-reducer-free:
    documents train shortest-first, staged into 3 phases holding the
    first 50 %, next 30 %, and last 20 % of total TOKEN mass. A global
    ORDER BY n_tokens + running sum would collapse to one window
    partition (the 100 TB killer), so phase boundaries come from a
    cumulative histogram over DISTINCT token lengths (bounded
    cardinality — the equidepth_price_histogram pattern) and each doc
    buckets map-side against the two broadcast boundary lengths.

    Boundary rule both engines share: a phase boundary is the smallest
    length whose cumulative token mass reaches ceil(share · total);
    all docs of equal length land in the same phase (deterministic,
    unlike row-ordered running sums which split ties arbitrarily)."""
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", _n_tokens_col().alias("len"))
    )
    hist = d.groupBy("len").agg(
        F.count("*").alias("c"), F.sum("len").alias("mass")
    )
    wcum = Window.orderBy("len").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.withColumn("cum", F.sum("mass").over(wcum))
    # one cheap agg job; SUM over zero rows is NULL → 0 keeps the plan
    # well-formed on an empty corpus (result is then empty anyway)
    total = d.agg(F.sum("len")).collect()[0][0] or 0
    bounds = (
        cum.crossJoin(
            F.broadcast(
                spark.createDataFrame(
                    [(1, -(-total * 50 // 100)), (2, -(-total * 80 // 100))],
                    "i int, r long",
                )
            )
        )
        .filter(F.col("cum") >= F.col("r"))
        .groupBy("i")
        .agg(F.min("len").alias("b"))
        .agg(F.sort_array(F.collect_list("b")).alias("bounds"))
    )
    return (
        d.crossJoin(F.broadcast(bounds))
        .select(
            (1 + F.size(F.expr("filter(bounds, b -> len > b)")))
            .cast("int")
            .alias("phase"),
            "len",
            "doc_id",
        )
        .groupBy("phase")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("len").alias("n_tokens"),
            F.min("len").alias("min_len"),
            F.max("len").alias("max_len"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("phase")
    )


CURRICULUM_LENGTH_PHASES_SQL = rf"""
WITH d AS (
  SELECT doc_id, CAST({_N_TOKENS} AS BIGINT) AS len
  FROM documents WHERE text IS NOT NULL
), hist AS (
  SELECT len, COUNT(*) AS c, SUM(len) AS mass FROM d GROUP BY len
), cum AS (
  SELECT len, SUM(mass) OVER (ORDER BY len
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM hist
), n AS (SELECT SUM(len) AS total FROM d),
ranks AS (
  -- exact integer ceil, mirroring the Spark side's -(-total*share//100)
  -- (double CEIL would diverge once total*share exceeds 2^53 — rule 4)
  SELECT i, CAST((total * share + 99) // 100 AS BIGINT) AS r
  FROM (VALUES (1, 50), (2, 80)) AS t(i, share), n
), bounds AS (
  SELECT list_sort(list(b)) AS bounds FROM (
    SELECT i, MIN(len) AS b FROM cum, ranks WHERE cum >= r GROUP BY i)
)
SELECT CAST(1 + len(list_filter(bounds, b -> d.len > b)) AS INTEGER) AS phase,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(d.len) AS BIGINT) AS n_tokens,
       CAST(MIN(d.len) AS BIGINT) AS min_len,
       CAST(MAX(d.len) AS BIGINT) AS max_len,
       CAST(MIN(d.doc_id) AS BIGINT) AS first_doc
FROM d, bounds
GROUP BY 1
ORDER BY phase
"""


# ---------------------------------------------------------------------------
# tokenizer vocabulary coverage (OOV rate)
# ---------------------------------------------------------------------------
VOCAB_K = 500  # top-K corpus tokens play the fixed tokenizer vocabulary


def oov_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer vocabulary-coverage report — the go/no-go check before
    committing a tokenizer to a corpus mix: with a fixed K-entry
    vocabulary (here the corpus's own top-K lowercased tokens by
    frequency, ties broken lexicographically — deterministic on both
    engines), measure per source how many token OCCURRENCES fall
    outside it. High OOV for a source means the tokenizer fragments it
    into bytes/unknowns and its effective token budget silently
    inflates (companion decision input to token_budget_epoch_plan).

    100 TB shape: vocabulary selection is a partial-agg token count +
    a distributed top-K (sort-limit = TakeOrdered — never a global
    sort); the K-row vocab then BROADCASTS into a map-side membership
    flag, so the corpus is scanned twice and shuffled once (token
    counts), with only (source, token-count) rows moving."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = d.select(
        "source",
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("tok"),
    )
    vocab = (
        toks.groupBy("tok")
        .count()
        .orderBy(F.desc("count"), F.asc("tok"))
        .limit(VOCAB_K)
        .select("tok")
        .withColumn("in_vocab", F.lit(True))
    )
    return (
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov"),
        )
        .select(
            "source",
            "n_tokens",
            "n_oov",
            F.round(
                F.col("n_oov").cast("double") / F.col("n_tokens").cast("double"),
                6,
            ).alias("oov_rate"),
        )
        .orderBy("source")
    )


OOV_RATE_SQL = rf"""
WITH toks AS (
  SELECT source,
         UNNEST(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
  FROM documents WHERE text IS NOT NULL
), vocab AS (
  SELECT tok FROM (
    SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok
    ORDER BY c DESC, tok ASC LIMIT {VOCAB_K})
)
SELECT t.source,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_oov,
       ROUND(CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS oov_rate
FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
GROUP BY t.source ORDER BY t.source
"""


def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every
    document by how much more likely its hashed-bigram features are
    under a TARGET distribution than under the RAW corpus —
    log p_target(doc) − log p_raw(doc) in a bag-of-hashed-ngrams
    model with add-1 smoothing. Documents are then resampled
    proportionally to exp(weight); this query emits the weights (the
    expensive distributed part — the resample itself is
    weighted_sample_orders' A-ES kernel). Target = the corpus's
    lang='en' slice (DSIR's target would be Wikipedia/books; the
    fixture's labeled slice is the deterministic stand-in).

    Features are md5-hashed bigrams truncated to 8 hex chars — the
    hashed-feature space DSIR uses to bound the model, replayable
    bit-for-bit in DuckDB (same md5 hex on both engines).

    100 TB shape: the feature table is vocabulary-bounded (zipf — far
    smaller than the corpus); per-doc feature counts partial-aggregate
    map-side; corpus stats derive from those counts (no extra corpus
    scan for the raw side); the two totals ride 1-row broadcasts; the
    score join shuffles on the 8-hex-char key with stop-pair skew left
    to AQE. Smoothing keeps target-absent features finite, so a
    multilingual crawl scores without NULL/−inf rows."""
    from burla_spark.functions.numeric import let

    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = F.split(F.lower(F.trim("text")), r"\s+")
    grams = let(
        toks,
        lambda t: F.when(
            F.size(t) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(t) - 1),
                lambda i: F.substring(
                    F.md5(
                        F.concat_ws(
                            " ", F.element_at(t, i), F.element_at(t, i + 1)
                        )
                    ),
                    1,
                    8,
                ),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    feats = d.select("doc_id", "lang", F.explode(grams).alias("b"))
    dc = feats.groupBy("doc_id", "b").agg(F.count("*").alias("c"))
    raw = dc.groupBy("b").agg(F.sum("c").alias("cr"))
    tgt = feats.filter(F.col("lang") == "en").groupBy("b").agg(
        F.count("*").alias("ct")
    )
    totals = raw.agg(
        F.sum("cr").alias("nr"), F.count("*").alias("fall")
    )
    tt = tgt.agg(F.coalesce(F.sum("ct"), F.lit(0)).alias("nt"))
    dlt = F.log(
        (F.coalesce(F.col("ct"), F.lit(0)) + 1).cast("double")
        / (F.col("nt") + F.col("fall")).cast("double")
    ) - F.log(
        (F.col("cr") + 1).cast("double")
        / (F.col("nr") + F.col("fall")).cast("double")
    )
    stats = (
        raw.join(tgt, "b", "left")
        .crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(tt))
        .select("b", dlt.alias("dlt"))
    )
    return (
        dc.join(stats, "b")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_feats"),
            F.sum("c").cast("long").alias("n_grams"),
            # 6dp round + signed-zero normalization (contract rule 13):
            # the per-bucket delta is bit-identical on both engines up
            # to ln()'s last ULP; the doc sum carries association-order
            # noise ~1e-13, far inside the rounding tolerance.
            (F.round(F.sum(F.col("c") * F.col("dlt")), 6) + F.lit(0.0)).alias(
                "dsir_logweight"
            ),
        )
        .orderBy("doc_id")
    )


def char_entropy_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon entropy of the CHARACTER distribution — the
    compressibility signal quality pipelines use to catch what word
    filters miss: repeated-character spam and boilerplate runs score
    LOW (few symbols dominate), encrypted/binary-garbage paste scores
    HIGH (near-uniform symbols), fluent prose sits in a narrow band.
    Uses the identity H = ln(n) − (Σ c·ln c)/n so one aggregation over
    (doc, char, count) rows yields the entropy — no per-doc second
    pass, no join. The band classification applies to the ROUNDED
    entropy so both engines classify identical values.

    Unicode contract: both engines split by CODEPOINT (Java regex
    split('') and RE2 regexp_split_to_array(text,'') agree, emoji and
    combining marks included — probe-verified), so the distribution is
    over codepoints, not bytes or graphemes.

    100 TB shape: the explode's (doc_id, ch, count) groupBy
    partial-aggregates map-side, so the shuffle carries each doc's
    DISTINCT characters (bounded by charset size, ~10²-10³), not its
    length; the second groupBy reuses the same doc_id partitioning.
    Filters on the output bands push around the projection."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.length("text") > 0)
    )
    cc = (
        d.select("doc_id", F.explode(F.split("text", "")).alias("ch"))
        .groupBy("doc_id", "ch")
        .agg(F.count("*").alias("c"))
    )
    n = F.sum("c").cast("double")
    s = F.sum(F.col("c").cast("double") * F.log(F.col("c").cast("double")))
    ent = F.round(F.log(n) - s / n, 6) + F.lit(0.0)
    return (
        cc.groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_chars"),
            F.count("*").cast("long").alias("distinct_chars"),
            ent.alias("char_entropy"),
        )
        .withColumn(
            "entropy_band",
            F.when(F.col("char_entropy") < 2.0, "low")
            .when(F.col("char_entropy") > 4.7, "high")
            .otherwise("ok"),
        )
        .orderBy("doc_id")
    )


ZIPF_TOP_RANKS = 100  # fit the head of the rank-frequency curve


def zipf_slope_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency fit per source — the corpus-health
    diagnostic behind "does this source look like natural language":
    fluent text follows ln(freq) ≈ a + s·ln(rank) with slope s ≈ −1;
    template/boilerplate farms flatten the head (s → 0 over-represented
    top tokens), ID/hash dumps steepen past −2. The fit is OLS over the
    top-100 ranks (ZIPF_TOP_RANKS; ranks are deterministic: count desc,
    token asc) via the engines' own regr_slope/intercept/r2 — identical
    closed form on both sides, 6dp-rounded at the edge.

    100 TB shape: the token-count table is vocabulary-bounded (zipf —
    the very property being measured), the rank window partitions by
    source over that bounded table (never the corpus), and the
    regression aggregates 100 rows per source."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    counts = (
        d.select(
            "source",
            F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("tok"),
        )
        .groupBy("source", "tok")
        .agg(F.count("*").alias("c"))
    )
    w = Window.partitionBy("source").orderBy(F.desc("c"), F.asc("tok"))
    ranked = counts.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= ZIPF_TOP_RANKS
    )
    x = F.log(F.col("rank").cast("double"))
    y = F.log(F.col("c").cast("double"))
    return (
        ranked.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_ranks"),
            (F.round(F.expr("regr_slope(ln(CAST(c AS DOUBLE)), ln(CAST(rank AS DOUBLE)))"), 6) + F.lit(0.0)).alias("zipf_slope"),
            (F.round(F.expr("regr_intercept(ln(CAST(c AS DOUBLE)), ln(CAST(rank AS DOUBLE)))"), 6) + F.lit(0.0)).alias("zipf_intercept"),
            (F.round(F.expr("regr_r2(ln(CAST(c AS DOUBLE)), ln(CAST(rank AS DOUBLE)))"), 6) + F.lit(0.0)).alias("zipf_r2"),
        )
        .orderBy("source")
    )


ZIPF_SLOPE_SQL = rf"""
WITH toks AS (
  SELECT source,
         UNNEST(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
  FROM documents WHERE text IS NOT NULL
), counts AS (
  SELECT source, tok, COUNT(*) AS c FROM toks GROUP BY source, tok
), ranked AS (
  SELECT source, c,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY c DESC, tok ASC) AS rank
  FROM counts
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_ranks,
       ROUND(regr_slope(ln(CAST(c AS DOUBLE)), ln(CAST(rank AS DOUBLE))), 6)
         + 0.0 AS zipf_slope,
       ROUND(regr_intercept(ln(CAST(c AS DOUBLE)), ln(CAST(rank AS DOUBLE))), 6)
         + 0.0 AS zipf_intercept,
       ROUND(regr_r2(ln(CAST(c AS DOUBLE)), ln(CAST(rank AS DOUBLE))), 6)
         + 0.0 AS zipf_r2
FROM ranked WHERE rank <= {ZIPF_TOP_RANKS}
GROUP BY source ORDER BY source
"""


CHAR_ENTROPY_SQL = """
WITH ch AS (
  SELECT doc_id, UNNEST(regexp_split_to_array(text, '')) AS ch
  FROM documents WHERE text IS NOT NULL AND len(text) > 0
), cc AS (
  SELECT doc_id, ch, COUNT(*) AS c FROM ch GROUP BY doc_id, ch
), agg AS (
  SELECT doc_id,
         CAST(SUM(c) AS BIGINT) AS n_chars,
         CAST(COUNT(*) AS BIGINT) AS distinct_chars,
         ROUND(ln(CAST(SUM(c) AS DOUBLE))
               - SUM(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)))
                 / CAST(SUM(c) AS DOUBLE), 6) + 0.0 AS char_entropy
  FROM cc GROUP BY doc_id
)
SELECT doc_id, n_chars, distinct_chars, char_entropy,
       CASE WHEN char_entropy < 2.0 THEN 'low'
            WHEN char_entropy > 4.7 THEN 'high'
            ELSE 'ok' END AS entropy_band
FROM agg ORDER BY doc_id
"""


DSIR_IMPORTANCE_SQL = r"""
WITH d AS (
  SELECT doc_id, lang, regexp_split_to_array(lower(trim(text)), '\s+') AS t
  FROM documents WHERE text IS NOT NULL
), g AS (
  SELECT doc_id, lang,
         UNNEST(list_transform(generate_series(1, len(t) - 1),
                i -> substr(md5(t[i] || ' ' || t[i + 1]), 1, 8))) AS b
  FROM d WHERE len(t) >= 2
), dc AS (
  SELECT doc_id, b, COUNT(*) AS c FROM g GROUP BY doc_id, b
), rs AS (
  SELECT b, SUM(c) AS cr FROM dc GROUP BY b
), tot AS (
  SELECT SUM(cr) AS nr, COUNT(*) AS fall FROM rs
), ts AS (
  SELECT b, COUNT(*) AS ct FROM g WHERE lang = 'en' GROUP BY b
), tt AS (
  SELECT COALESCE(SUM(ct), 0) AS nt FROM ts
), dl AS (
  SELECT rs.b,
         ln(CAST(COALESCE(ts.ct, 0) + 1 AS DOUBLE)
            / CAST(tt.nt + tot.fall AS DOUBLE))
       - ln(CAST(rs.cr + 1 AS DOUBLE)
            / CAST(tot.nr + tot.fall AS DOUBLE)) AS dlt
  FROM rs LEFT JOIN ts ON rs.b = ts.b, tot, tt
)
SELECT dc.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_feats,
       CAST(SUM(dc.c) AS BIGINT) AS n_grams,
       ROUND(SUM(dc.c * dl.dlt), 6) + 0.0 AS dsir_logweight
FROM dc JOIN dl ON dc.b = dl.b
GROUP BY dc.doc_id ORDER BY dc.doc_id
"""


def heaps_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth fit per source — the companion
    diagnostic to zipf_slope_by_source: natural language grows its
    vocabulary as V(N) ≈ K·N^β with β ≈ 0.4–0.6; template/boilerplate
    farms saturate early (β → 0), ID/hash dumps never repeat (β → 1).
    The growth curve is sampled at power-of-two document checkpoints
    (rank & (rank-1) = 0, plus the final rank) along a deterministic
    ingest order (doc_id asc), then fit by OLS ln V ~ ln N via the
    engines' own regr_* aggregates — identical closed form both sides,
    6dp-rounded at the edge.

    100 TB shape: the only corpus-scale stage is the token explode into
    a (source, token) → min-rank aggregate with map-side partial MIN —
    the first-occurrence table is vocabulary-bounded, so "cumulative
    distinct vocabulary at rank c" becomes a COUNT over r0 <= c instead
    of a running set union. Checkpoints are O(log n_docs) per source,
    so the checkpoint fan-out joins are vocab×log and docs×log rows;
    the regression aggregates ~log n points per source. The per-source
    row_number is an ingest-order attribute (here derived from doc_id
    for replayability; a production feed carries it natively).

    NULL-key contract (nullkey-sweep policy): a document with NULL
    doc_id has no ingest position, so it is excluded from the growth
    curve — stated explicitly on both engine sides because the engines
    disagree on NULL placement in window orderings (Spark sorts NULLS
    FIRST ascending, DuckDB NULLS LAST)."""
    return heaps_vocab_growth_of(load_table(spark, sf_dir, "documents"))


def heaps_vocab_growth_of(
    corpus: DataFrame, rank_col: str | None = None
) -> DataFrame:
    """Heaps'-law growth over any (source, doc_id, text) corpus frame.

    ``rank_col`` names a column that ALREADY carries the 1-based
    per-source ingest rank — the shape a production feed has natively
    (VERDICT r11 #5: deriving it here costs a full per-source sort of
    the corpus at 100 TB). When absent, the rank falls back to a
    row_number window over doc_id — the replayable fixture path the
    registry spec and oracle use."""
    d = corpus.filter(F.col("text").isNotNull()).filter(
        F.col("doc_id").isNotNull()
    )
    toks = F.split(F.lower(F.trim("text")), r"\s+").alias("toks")
    if rank_col is not None:
        sized = d.select(
            "source", F.col(rank_col).cast("long").alias("drank"), toks
        )
    else:
        w = Window.partitionBy("source").orderBy("doc_id")
        sized = d.select("source", "doc_id", toks).withColumn(
            "drank", F.row_number().over(w)
        )
    sized = sized.withColumn("n_toks", F.size("toks").cast("long"))
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
    first_occ = (
        sized.select("source", "drank", F.explode("toks").alias("tok"))
        .groupBy("source", "tok")
        .agg(F.min("drank").alias("r0"))
    )
    vocab_at = (
        first_occ.join(cpts, "source")
        .filter(F.col("r0") <= F.col("c"))
        .groupBy("source", "c")
        .agg(F.count("*").alias("v"))
    )
    ntok_at = (
        sized.select("source", "drank", "n_toks")
        .join(cpts, "source")
        .filter(F.col("drank") <= F.col("c"))
        .groupBy("source", "c")
        .agg(F.sum("n_toks").alias("n"))
    )
    pts = vocab_at.join(ntok_at, ["source", "c"])
    reg = "ln(CAST(v AS DOUBLE)), ln(CAST(n AS DOUBLE))"
    return (
        pts.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_checkpoints"),
            F.max("n").cast("long").alias("total_tokens"),
            F.max("v").cast("long").alias("vocab_size"),
            (F.round(F.expr(f"regr_slope({reg})"), 6) + F.lit(0.0)).alias(
                "heaps_beta"
            ),
            (F.round(F.expr(f"regr_intercept({reg})"), 6) + F.lit(0.0)).alias(
                "heaps_ln_k"
            ),
            (F.round(F.expr(f"regr_r2({reg})"), 6) + F.lit(0.0)).alias("heaps_r2"),
        )
        .orderBy("source")
    )


HEAPS_VOCAB_SQL = r"""
WITH sized AS (
  SELECT source,
         regexp_split_to_array(lower(trim(text)), '\s+') AS toks,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS drank
  FROM documents WHERE text IS NOT NULL AND doc_id IS NOT NULL
), lens AS (
  SELECT source, drank, CAST(len(toks) AS BIGINT) AS n_toks FROM sized
), maxr AS (
  SELECT source, MAX(drank) AS max_rank FROM lens GROUP BY source
), cpts AS (
  SELECT DISTINCT l.source, l.drank AS c
  FROM lens l JOIN maxr m ON l.source = m.source
  WHERE (l.drank & (l.drank - 1)) = 0 OR l.drank = m.max_rank
), first_occ AS (
  SELECT source, tok, MIN(drank) AS r0
  FROM (SELECT source, drank, UNNEST(toks) AS tok FROM sized)
  GROUP BY source, tok
), vocab_at AS (
  SELECT f.source, c.c, COUNT(*) AS v
  FROM first_occ f JOIN cpts c ON f.source = c.source AND f.r0 <= c.c
  GROUP BY 1, 2
), ntok_at AS (
  SELECT l.source, c.c, SUM(l.n_toks) AS n
  FROM lens l JOIN cpts c ON l.source = c.source AND l.drank <= c.c
  GROUP BY 1, 2
), pts AS (
  SELECT va.source, va.c, va.v, na.n
  FROM vocab_at va JOIN ntok_at na ON va.source = na.source AND va.c = na.c
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_checkpoints,
       CAST(MAX(n) AS BIGINT) AS total_tokens,
       CAST(MAX(v) AS BIGINT) AS vocab_size,
       ROUND(regr_slope(ln(CAST(v AS DOUBLE)), ln(CAST(n AS DOUBLE))), 6)
         + 0.0 AS heaps_beta,
       ROUND(regr_intercept(ln(CAST(v AS DOUBLE)), ln(CAST(n AS DOUBLE))), 6)
         + 0.0 AS heaps_ln_k,
       ROUND(regr_r2(ln(CAST(v AS DOUBLE)), ln(CAST(n AS DOUBLE))), 6)
         + 0.0 AS heaps_r2
FROM pts GROUP BY source ORDER BY source
"""


SPECS: list[QuerySpec] = [
    QuerySpec(
        "heaps_vocab_growth",
        heaps_vocab_growth,
        HEAPS_VOCAB_SQL,
        ("llm", "quality", "diagnostics"),
        doc="Heaps'-law vocabulary-growth OLS fit per source "
        "(V ~ K·N^beta over power-of-two document checkpoints along a "
        "deterministic ingest order) — the saturation companion to the "
        "Zipf head fit (round 11).",
    ),
    QuerySpec(
        "zipf_slope_by_source",
        zipf_slope_by_source,
        ZIPF_SLOPE_SQL,
        ("llm", "quality", "diagnostics"),
        doc="Per-source Zipf rank-frequency OLS fit (slope/intercept/r2 "
        "over the deterministic top-100 ranks) — natural-language "
        "health check for a corpus mix.",
    ),
    QuerySpec(
        "char_entropy_report",
        char_entropy_report,
        CHAR_ENTROPY_SQL,
        ("llm", "quality", "entropy"),
        doc="Per-doc Shannon character entropy (codepoint distribution, "
        "H = ln n - (sum c ln c)/n in one aggregation) with low/ok/high "
        "bands on the rounded value.",
    ),
    QuerySpec(
        "dsir_importance_weights",
        dsir_importance_weights,
        DSIR_IMPORTANCE_SQL,
        ("llm", "mixing", "selection"),
        doc="DSIR hashed-bigram importance weights: per-doc "
        "log p_target/p_raw under add-1-smoothed bag-of-hashed-ngrams "
        "models (md5-bucketed features, 1-row total broadcasts).",
    ),
    QuerySpec(
        "oov_rate_by_source",
        oov_rate_by_source,
        OOV_RATE_SQL,
        ("llm", "mixing", "tokenizer"),
        doc="Tokenizer vocabulary-coverage (OOV) report per source with "
        "a deterministic top-K vocabulary (distributed top-K + "
        "broadcast membership).",
    ),
    QuerySpec(
        "epoch_batch_shuffle",
        epoch_batch_shuffle,
        EPOCH_BATCH_SHUFFLE_SQL,
        ("llm", "mixing", "shuffle"),
        doc="Deterministic per-epoch shuffle bucketing (md5 keys, "
        "map-side batch assignment, per-bucket balance report).",
    ),
    QuerySpec(
        "token_budget_epoch_plan",
        token_budget_epoch_plan,
        TOKEN_BUDGET_EPOCH_PLAN_SQL,
        ("llm", "mixing", "sampling"),
        doc="Per-source repeat-factor plan under a token budget with a "
        "4-epoch repetition ceiling.",
    ),
    QuerySpec(
        "curriculum_length_phases",
        curriculum_length_phases,
        CURRICULUM_LENGTH_PHASES_SQL,
        ("llm", "mixing", "curriculum"),
        doc="Short-to-long curriculum phases by cumulative token mass "
        "over distinct lengths (no global sort).",
    ),
]
