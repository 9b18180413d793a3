"""Semantic-curation operator family: SemDeDup-style embedding dedup,
winnowing document fingerprints (the MOSS/Stanford scheme), and
distributed BPE merge training — the three corpus-curation primitives
a training-data pipeline runs between raw ingest and tokenization.

All three are oracle-exact (full DuckDB SQL), following the
plans/ann_oracle.py recipe for pinning the non-SQL degrees of freedom:

* ``semdedup_prune`` — SemDeDup (Abbas et al. 2023): k-means-cluster
  the embedding space, then drop any vector cosine-similar to another
  vector IN THE SAME CLUSTER. The trained centroids are the only
  non-SQL stage, so — exactly like ``kmeans_assign_fixed_centroids`` —
  the centroids are pinned to embeddings vec_id 0..7 and everything
  else (assignment, in-cluster pairing, the drop rule) replays
  bit-for-bit in SQL.
* ``winnowing_fingerprints`` / ``winnowing_contamination_pairs`` —
  winnowing (Schleimer, Wilkerson, Aiken; SIGMOD 2003) selects the
  minimum k-gram hash in every sliding window of ``W`` consecutive
  grams, guaranteeing any shared token run of length >= W + K - 1
  yields a shared fingerprint. Hashes are md5 hex strings (identical
  in both engines), not xxhash, precisely so the oracle can replay
  the selection.
* ``editdist_neardup_pairs`` — the relative-edit-distance near-dup
  tier (catches in-place edits that shift every shingle); the keep
  rule is pure BIGINT arithmetic, so no float contract is needed.
* ``bpe_train_merges`` — byte-pair-encoding merge training: the top-k
  highest-weighted-count adjacent token pairs, merged iteratively over
  the corpus word-frequency table. The token state FRAMES each token
  in SOH/STX control chars (``\\x01tok\\x02``, concatenated), which
  makes non-overlapping left-to-right ``replace`` EQUAL to greedy BPE
  merge application: the frame anchors both token boundaries (a bare
  separator-joined form false-matches token prefixes — 'e t' inside
  'e th') and the pattern consumes no shared separator (a
  single-space joint eats the next occurrence's boundary:
  'a a a a' -> 'aa a a' instead of 'aa aa').

Reference parity: the reference pipes corpus curation through
remote_parallel_map-style user functions (README quickstart); these
specs re-express the same curation stages as declarative plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from burla_spark.functions.numeric import let
from burla_spark.functions.vectors import dot, double_vec, l2_norm
from burla_spark.operators.text import lower_tokens
from burla_spark.plans.base import QuerySpec
from burla_spark.sources.tables import load_table

DIM = 64  # embeddings fixture dimension (TESTDATA.md)
SEM_K = 8  # pinned centroid count (centroids = embeddings vec_id < 8)
SEM_TAU = 0.4  # in-cluster cosine drop threshold (rounded-value compare)

WIN_K = 4  # winnowing k-gram size (tokens)
WIN_W = 5  # winnowing window (consecutive grams)
WIN_MIN_SHARED = 3  # contamination-pair threshold on shared fingerprints

BPE_MERGES = 4  # merge-training iterations
SOH, STX = "\x01", "\x02"  # token frame chars (reserved; not in corpus text)


def _bpe_tokens(ts_col):
    """Token list from the framed state: split on STX, drop the empty
    tail, strip each piece's leading SOH."""
    return F.transform(
        F.filter(F.split(ts_col, STX), lambda x: x != F.lit("")),
        lambda x: x.substr(F.lit(2), F.length(x) - 1),
    )


# ---------------------------------------------------------------------------
# SemDeDup: in-cluster cosine prune with pinned centroids
# ---------------------------------------------------------------------------
def semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup over the embedding column: assign every vector
    to its nearest pinned centroid (squared L2, rounded, ties to the
    smaller centroid id — the ``kmeans_assign_fixed_centroids``
    kernel), then inside each cluster drop every vector that has a
    LOWER-ID neighbor with rounded cosine >= SEM_TAU. One row per
    dropped vector with its smallest dominating neighbor (``dup_of``)
    and that pair's similarity — the per-cluster one-pass variant of
    SemDeDup's keep-one-representative rule, made deterministic by
    the id order.

    100 TB shape: the pair stage joins ON cluster_id, so candidate
    work is sum(cluster_size^2), never corpus^2 — the entire point of
    clustering first (SemDeDup runs k ~ corpus_size/10^4 clusters; the
    8 here is the oracle pin, not the production setting). Centroids
    broadcast; the assignment is one scan; the only shuffles are keyed
    by cluster_id and by the dropped id."""
    from burla_spark.plans.ann_oracle import assign_fixed_centroids

    e = load_table(spark, sf_dir, "embeddings")
    # the SHARED fixed-centroid kernel (plans/ann_oracle.py) — the
    # docstring's "exactly the kmeans assignment" claim is structural.
    assigned = assign_fixed_centroids(e, SEM_K).select(
        "vec_id", "cluster_id", "embedding"
    )
    # per-vector norm computed ONCE (same F.aggregate expression the
    # per-pair form would run, so bit-identical — but 2/3 less work in
    # the pair stage, which dominates: pairs >> vectors).
    vd = double_vec(F.col("embedding"))
    assigned = assigned.select(
        "vec_id", "cluster_id", vd.alias("v"), l2_norm(vd).alias("nrm")
    )
    # pair-stage width: with k=8 pinned clusters the cluster-keyed
    # exchange has 8 byte-tiny partitions and AQE coalesces them to
    # ONE, serializing the O(sum cluster²) interpreted dot products on
    # a single core (measured: 1.7 s single-task stage at sf0.1).
    # Salt the probe side (deterministic pmod of the id — guide rule:
    # never rand()) and explode the build side over the salt domain:
    # the join keys become (cluster_id, salt), an explicit-width
    # repartition pins the width (AQE never coalesces user-numbered
    # exchanges), and every task gets an even slice of the pair work.
    # Pure partitioning — each pair's arithmetic is unchanged.
    n_parts = spark.sparkContext.defaultParallelism
    n_salt = max(1, n_parts // SEM_K) * 4
    a = assigned.select(
        F.col("vec_id").alias("id_a"),
        "cluster_id",
        F.pmod(F.col("vec_id"), F.lit(n_salt)).cast("int").alias("salt"),
        F.col("v").alias("va"),
        F.col("nrm").alias("na"),
    ).repartition(n_parts, "cluster_id", "salt")
    b = assigned.select(
        F.col("vec_id").alias("id_b"),
        "cluster_id",
        F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))).alias("salt"),
        F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    # threshold on the ROUNDED similarity (contract rule 14): a raw
    # float compare could flip at an ULP between engines. try_divide:
    # a zero vector yields NULL (never >= tau), not an ANSI abort.
    sim = (
        F.round(
            F.try_divide(dot(F.col("va"), F.col("vb")), F.col("na") * F.col("nb")),
            6,
        )
        + F.lit(0.0)
    )
    pairs = (
        a.join(b, ["cluster_id", "salt"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("cluster_id", "id_a", "id_b", sim.alias("sim"))
        .filter(F.col("sim") >= SEM_TAU)
    )
    # dup_of = the smallest dominating neighbor; its pair sim rides
    # along in the struct-min (id_a is unique per id_b group).
    best = F.min(F.struct("id_a", "sim"))
    return (
        pairs.groupBy(F.col("id_b").alias("vec_id"), "cluster_id")
        .agg(best.alias("m"))
        .select(
            "vec_id",
            "cluster_id",
            F.col("m.id_a").alias("dup_of"),
            F.col("m.sim").alias("sim"),
        )
        .orderBy("vec_id")
    )


SEMDEDUP_SQL = f"""
WITH i(i) AS (SELECT UNNEST(generate_series(1, {DIM}))),
d2 AS (
  SELECT v.vec_id, c.vec_id AS cluster_id,
    SUM((CAST(v.embedding[i.i] AS DOUBLE) - CAST(c.embedding[i.i] AS DOUBLE))
        * (CAST(v.embedding[i.i] AS DOUBLE) - CAST(c.embedding[i.i] AS DOUBLE))) AS d2
  FROM embeddings v, embeddings c, i
  WHERE c.vec_id < {SEM_K}
  GROUP BY 1, 2
),
assigned AS (
  SELECT vec_id, cluster_id FROM d2
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                             ORDER BY ROUND(d2, 6), cluster_id) = 1
),
p AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.cluster_id,
    SUM(CAST(ea.embedding[i.i] AS DOUBLE) * CAST(eb.embedding[i.i] AS DOUBLE)) AS dot,
    SUM(CAST(ea.embedding[i.i] AS DOUBLE) * CAST(ea.embedding[i.i] AS DOUBLE)) AS aa,
    SUM(CAST(eb.embedding[i.i] AS DOUBLE) * CAST(eb.embedding[i.i] AS DOUBLE)) AS bb
  FROM assigned a
  JOIN assigned b ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
  JOIN embeddings ea ON ea.vec_id = a.vec_id
  JOIN embeddings eb ON eb.vec_id = b.vec_id, i
  GROUP BY 1, 2, 3
),
sims AS (
  -- NULLIF mirrors Spark's try_divide zero-vector guard: on DuckDB
  -- >= 1.1 (ieee_floating_point_ops) a bare 0/0 is NaN, which sorts
  -- ABOVE all numbers and would pass the >= tau filter.
  SELECT id_a, id_b, cluster_id,
         ROUND(dot / NULLIF(SQRT(aa) * SQRT(bb), 0), 6) + 0.0 AS sim
  FROM p
)
SELECT id_b AS vec_id, cluster_id, id_a AS dup_of, sim
FROM sims WHERE sim >= {SEM_TAU}
QUALIFY ROW_NUMBER() OVER (PARTITION BY id_b ORDER BY id_a) = 1
ORDER BY vec_id
"""


# ---------------------------------------------------------------------------
# Winnowing fingerprints (shared derivation for both specs)
# ---------------------------------------------------------------------------
def _winnowed_fps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_grams, fp): distinct winnowed fingerprints per doc.

    k-gram hashes are md5 hex strings (engine-portable, unlike
    xxhash); each full run of WIN_W consecutive gram positions keeps
    its MIN hash. The selection runs ENTIRELY inside the document row
    (array window-mins over the per-doc hash array) — no explode
    before selection, no per-doc window sort, no shuffle until the
    cross-doc join: winnowing is local to a document by definition,
    so the plan should be too (the window-function form measured ~2x
    slower at x10 scale for pure sort/exchange overhead).

    The doc scan is repartitioned first: the CPU-heavy per-doc hash
    stage must fan out across cores even when the source is a single
    small fixture file (a TB-scale scan arrives pre-partitioned) —
    the same rule as minhash_lsh_pairs' signature stage."""
    d = load_table(spark, sf_dir, "documents")
    n_parts = max(spark.sparkContext.defaultParallelism, 8)
    d = d.repartition(n_parts, F.col("doc_id"))
    fps_arr = let(
        lower_tokens(F.col("text")),
        lambda toks: let(
            F.when(
                # guard keeps the sequences ascending: Spark's
                # sequence(1, stop) REVERSES when stop < 1.
                F.size(toks) >= WIN_K,
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - (WIN_K - 1)),
                    lambda i: F.md5(F.array_join(F.slice(toks, i, WIN_K), " ")),
                ),
            ),
            lambda hs: F.when(
                F.size(hs) >= WIN_W,
                F.struct(
                    F.size(hs).cast("long").alias("n_grams"),
                    F.array_distinct(
                        F.transform(
                            F.sequence(F.lit(1), F.size(hs) - (WIN_W - 1)),
                            lambda j: F.array_min(F.slice(hs, j, WIN_W)),
                        )
                    ).alias("fps"),
                ),
            ),
        ),
    )
    # distinct at the fingerprint level: a replayed/duplicated doc row
    # must not double its fingerprint rows (the census would double
    # n_fps and the pair join would 4x n_shared) — the same replayed-
    # ingest rule as prefix_filter_jaccard_join's (pid, gram) distinct.
    return (
        d.select("doc_id", fps_arr.alias("g"))
        .filter(F.col("g").isNotNull())
        .select("doc_id", F.col("g.n_grams").alias("n_grams"),
                F.explode("g.fps").alias("fp"))
        .distinct()
    )


# the same derivation as a SQL prefix both oracles share (list-local,
# mirroring the map-side Spark form).
_WINNOW_FPS_CTE = rf"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
  FROM documents
),
hs AS (
  SELECT doc_id,
         [md5(array_to_string(t[i:i+{WIN_K - 1}], ' '))
          FOR i IN range(1, len(t) - {WIN_K - 1} + 1)] AS hs
  FROM toks WHERE len(t) >= {WIN_K}
),
fps AS (
  SELECT DISTINCT doc_id, n_grams, fp FROM (
    SELECT doc_id, CAST(len(hs) AS BIGINT) AS n_grams,
           UNNEST(list_distinct(
             [list_min(hs[j:j+{WIN_W - 1}])
              FOR j IN range(1, len(hs) - {WIN_W - 1} + 1)])) AS fp
    FROM hs WHERE len(hs) >= {WIN_W}
  )
)
"""


def winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document winnowed fingerprint census: how many k-gram
    positions the document has and how many distinct fingerprints
    winnowing kept (the ~2/(W+1) density the paper proves). The
    fingerprint table this summarizes is the unit of exact-substring
    contamination checking at corpus scale: storage is O(docs x
    density), not O(docs x grams)."""
    fps = _winnowed_fps(spark, sf_dir)
    # group on (doc_id, n_grams), mirroring the oracle exactly: under a
    # replayed id carrying DIFFERENT text the two variants have
    # different n_grams, and a doc_id-only group with first(n_grams)
    # would pick one nondeterministically and pool the fp counts.
    return (
        fps.groupBy("doc_id", "n_grams")
        .agg(F.count("*").alias("n_fps"))
        .select("doc_id", "n_grams", "n_fps")
        .orderBy("doc_id", "n_grams")
    )


WINNOWING_FPS_SQL = (
    _WINNOW_FPS_CTE
    + """
SELECT doc_id, n_grams, CAST(COUNT(*) AS BIGINT) AS n_fps
FROM fps GROUP BY doc_id, n_grams ORDER BY doc_id, n_grams
"""
)


def winnowing_contamination_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document pairs sharing >= WIN_MIN_SHARED winnowed fingerprints —
    the cross-document half of winnowing: a shared fingerprint
    witnesses a shared token run, and any shared run of
    W + K - 1 tokens is GUARANTEED to produce one, so this join finds
    every pair of documents sharing a sufficiently long exact passage
    (eval-set contamination, boilerplate, plagiarism).

    100 TB shape: an equi-join on the fingerprint hash — candidate
    work bounded by per-fingerprint document frequency, never
    corpus^2. A boilerplate fingerprint shared by thousands of docs is
    the same hot-bucket problem LSH bands have; production caps or
    drops top-df fingerprints (cf. minhash_lsh_pairs' opt-in
    max_bucket) — the fixture's df tail needs no cap."""
    fps = _winnowed_fps(spark, sf_dir).select("doc_id", "fp")
    a = fps.select(F.col("doc_id").alias("id_a"), "fp")
    b = fps.select(F.col("doc_id").alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= WIN_MIN_SHARED)
        .orderBy("id_a", "id_b")
    )


WINNOWING_PAIRS_SQL = (
    _WINNOW_FPS_CTE
    + f"""
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared
FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING COUNT(*) >= {WIN_MIN_SHARED}
ORDER BY id_a, id_b
"""
)


# ---------------------------------------------------------------------------
# Distinct-n lexical diversity
# ---------------------------------------------------------------------------
def distinct_ngram_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-1 / distinct-2 lexical diversity per source — the
    standard corpus-health metric (ratio of distinct n-grams to total
    n-grams; collapse toward 0 flags templated/looped text before it
    trains). Counts are exact BIGINTs; each ratio is ONE division of
    two exact integers, so it is bit-identical across engines.

    100 TB shape: the distinct counts are (source, gram)-keyed
    aggregates — the same two-phase hash-agg path as count distinct
    everywhere else; no sketch needed because the output is per-source
    (for per-DOC diversity at scale you'd swap in HLL and accept the
    rse; cf. hll_registers_md5)."""
    d = load_table(spark, sf_dir, "documents")
    toks = let(
        lower_tokens(F.col("text")),
        lambda t: F.struct(
            t.alias("uni"),
            F.when(
                F.size(t) >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size(t) - 1),
                    lambda i: F.concat(
                        F.element_at(t, i), F.lit(" "), F.element_at(t, i + 1)
                    ),
                ),
            ).otherwise(F.array().cast("array<string>")).alias("bi"),
        ),
    )
    g = d.select("source", toks.alias("g"))
    uni = g.select("source", F.explode("g.uni").alias("gram")).groupBy("source").agg(
        F.count("*").alias("n_unigrams"),
        F.countDistinct("gram").alias("n_distinct_unigrams"),
    )
    bi = g.select("source", F.explode("g.bi").alias("gram")).groupBy("source").agg(
        F.count("*").alias("n_bigrams"),
        F.countDistinct("gram").alias("n_distinct_bigrams"),
    )
    # LEFT join: a source whose docs are all single-token has no
    # bigram rows — exactly the degenerate corpus this health metric
    # exists to flag, so it must surface as zeros/NULL ratio, not
    # vanish from the report (try_divide: 0-bigram ratio is NULL).
    return (
        uni.join(bi, "source", "left")
        .select(
            "source",
            "n_unigrams",
            "n_distinct_unigrams",
            (
                F.col("n_distinct_unigrams").cast("double")
                / F.col("n_unigrams").cast("double")
            ).alias("distinct_1"),
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("n_distinct_bigrams", F.lit(0)).alias("n_distinct_bigrams"),
            F.try_divide(
                F.col("n_distinct_bigrams").cast("double"),
                F.col("n_bigrams").cast("double"),
            ).alias("distinct_2"),
        )
        .orderBy("source")
    )


DISTINCT_NGRAM_SQL = r"""
WITH toks AS (
  SELECT source, regexp_split_to_array(trim(lower(text)), '\s+') AS t
  FROM documents
),
uni AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_unigrams,
         CAST(COUNT(DISTINCT g) AS BIGINT) AS n_distinct_unigrams
  FROM toks, UNNEST(t) AS u(g) GROUP BY source
),
bi AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         CAST(COUNT(DISTINCT g) AS BIGINT) AS n_distinct_bigrams
  FROM toks,
       UNNEST([t[i] || ' ' || t[i+1] FOR i IN range(1, len(t))]) AS u(g)
  GROUP BY source
)
SELECT source, n_unigrams, n_distinct_unigrams,
       CAST(n_distinct_unigrams AS DOUBLE) / CAST(n_unigrams AS DOUBLE)
         AS distinct_1,
       COALESCE(n_bigrams, 0) AS n_bigrams,
       COALESCE(n_distinct_bigrams, 0) AS n_distinct_bigrams,
       CAST(n_distinct_bigrams AS DOUBLE)
         / CAST(NULLIF(n_bigrams, 0) AS DOUBLE) AS distinct_2
FROM uni LEFT JOIN bi USING (source)
ORDER BY source
"""


# ---------------------------------------------------------------------------
# Edit-distance near-dup verify tier
# ---------------------------------------------------------------------------
EDIT_REL_DEN = 5  # keep pairs with lev * 5 <= max(len_a, len_b), i.e. <= 20%


def editdist_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs under RELATIVE EDIT DISTANCE — the metric
    tier between exact dedup and token-set Jaccard: it catches small
    in-place edits (typo/number/date substitutions) that shift every
    overlapping shingle but barely move the edit distance. Candidates
    block on an equal 40-char prefix (the deterministic stand-in for
    LSH-band keys, same as shingle_jaccard_verified_pairs); the keep
    rule ``lev * 5 <= greatest(len_a, len_b)`` is exact BIGINT
    arithmetic — no float path at all, so the oracle is trivially
    bit-exact.

    100 TB shape: equi-join on the block key (bounded buckets, never
    corpus²); levenshtein runs JVM-side per candidate pair only. At
    production lengths, pass Spark's threshold arg
    (``levenshtein(l, r, k)`` early-exits at k) with k = the largest
    absolute distance the relative rule could accept for the block's
    length band.

    UNICODE CONTRACT (round-10): the distance is CHARACTER-based —
    one codepoint is one edit symbol — but DuckDB's ``levenshtein``
    counts UTF-8 BYTES while Spark's counts codepoints (verified:
    'café'→'cafe' is 2 in DuckDB, 1 in Spark). Both engines therefore
    run levenshtein over the same deterministic ASCII projection of
    the text: every non-ASCII codepoint becomes one ``'#'`` (Java
    regex and RE2 both match ``[^\\x00-\\x7F]`` per codepoint,
    including astral-plane emoji). On the projection chars == bytes,
    so the engines agree exactly; distinct non-ASCII codepoints
    conflate under '#', which only ever LOWERS a distance — a
    documented recall-biased degradation for multilingual corpora."""
    d = load_table(spark, sf_dir, "documents")
    proj = lambda c: F.regexp_replace(c, "[^\\x00-\\x7F]", "#")  # noqa: E731
    s = d.select(
        "doc_id",
        proj(F.col("text")).alias("ptext"),
        F.substring("text", 1, 40).alias("pfx"),
        F.length("text").alias("ln"),
    )
    a = s.select(
        F.col("doc_id").alias("id_a"), F.col("ptext").alias("ta"),
        "pfx", F.col("ln").alias("la"),
    )
    b = s.select(
        F.col("doc_id").alias("id_b"), F.col("ptext").alias("tb"),
        "pfx", F.col("ln").alias("lb"),
    )
    lev = F.levenshtein("ta", "tb").cast("long")
    # length-band prefilter: lev(a,b) >= |len_a - len_b| always, so a
    # pair failing |Δlen|·5 <= max(len) can never pass the relative
    # rule — prune it BEFORE the O(len²) levenshtein call (a pure
    # refinement: the result set is unchanged by construction).
    band = (
        F.abs(F.col("la") - F.col("lb")) * EDIT_REL_DEN
        <= F.greatest("la", "lb")
    )
    # distinct: replayed/duplicated doc rows multiply each surviving
    # pair 2x2 through the block join; the duplicate output rows are
    # identical, so a distinct restores exactly-once pairs.
    return (
        a.join(b, "pfx")
        .filter((F.col("id_a") < F.col("id_b")) & band)
        .select("id_a", "id_b", lev.alias("lev"), F.greatest("la", "lb").alias("mx"))
        .filter(F.col("lev") * EDIT_REL_DEN <= F.col("mx"))
        .select("id_a", "id_b", "lev")
        .distinct()
        .orderBy("id_a", "id_b")
    )


# levenshtein runs on the same ASCII projection as the Spark side
# (DuckDB's levenshtein counts UTF-8 bytes; on the projection
# chars == bytes, so the character contract holds in both engines).
EDITDIST_PAIRS_SQL = f"""
WITH d AS (
  SELECT doc_id,
         regexp_replace(text, '[^\\x00-\\x7F]', '#', 'g') AS ptext,
         substr(text, 1, 40) AS pfx,
         CAST(len(text) AS BIGINT) AS ln
  FROM documents
)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(levenshtein(a.ptext, b.ptext) AS BIGINT) AS lev
FROM d a JOIN d b ON a.pfx = b.pfx AND a.doc_id < b.doc_id
  AND abs(a.ln - b.ln) * {EDIT_REL_DEN} <= greatest(a.ln, b.ln)
WHERE levenshtein(a.ptext, b.ptext) * {EDIT_REL_DEN} <= greatest(a.ln, b.ln)
ORDER BY id_a, id_b
"""


# ---------------------------------------------------------------------------
# BPE merge training
# ---------------------------------------------------------------------------
# train-once cache: bpe_train_merges and bpe_encode_token_stats share
# one training run per (application, corpus) — the same build-once /
# reuse shape as llm.py's _MINHASH_PAIRS_CACHE. Keyed by applicationId
# so a dead session's DataFrames are never served to a new one.
_BPE_CACHE: dict[tuple[str, str], tuple[list, DataFrame]] = {}


def _train_bpe(
    spark: SparkSession, sf_dir: str
) -> tuple[list[tuple[int, str, int]], DataFrame]:
    """Shared BPE training loop: returns the learned merge list
    [(step, 'a b', weighted_count)] and the FINAL vocab state
    (word, ts, freq) with all merges applied — the input to encoding.

    The word-frequency base is spilled to a temp parquet (the
    materialize-reused-subplans rule): the loop's argmax probes AND
    any downstream consumer of the returned vocab then read the tiny
    spilled table — the corpus is scanned exactly once, with no cache
    pin leaking past the call."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _BPE_CACHE:
        return _BPE_CACHE[key]
    d = load_table(spark, sf_dir, "documents")
    word = F.explode(lower_tokens(F.col("text"))).alias("word")
    chars = let(
        F.col("word"),
        lambda w: F.transform(
            F.sequence(F.lit(1), F.length(w)), lambda i: w.substr(i, F.lit(1))
        ),
    )
    from burla_spark.operators.dedup import _spill_to_temp_parquet

    framed = F.transform(
        chars, lambda c: F.concat(F.lit(SOH), c, F.lit(STX))
    )
    base = (
        d.select(word)
        .filter(F.length("word") >= 1)
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .select("word", F.array_join(framed, "").alias("ts"), "freq")
    )
    # the only corpus-sized work; every iteration below (and any
    # downstream encoder) re-reads this tiny spilled table.
    vocab = _spill_to_temp_parquet(base, "bpe_vocab")
    merges: list[tuple[int, str, int]] = []
    for step in range(1, BPE_MERGES + 1):
        pair = let(
            _bpe_tokens(F.col("ts")),
            lambda tk: F.when(
                F.size(tk) >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size(tk) - 1),
                    lambda i: F.concat(
                        F.element_at(tk, i), F.lit(" "), F.element_at(tk, i + 1)
                    ),
                ),
            ),
        )
        counts = (
            vocab.select(F.explode(pair).alias("pair"), "freq")
            .groupBy("pair")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("pair"))
            .limit(1)
        )
        top = counts.collect()  # 1-row argmax probe, bounded
        if not top:
            break
        best_pair, cnt = top[0]["pair"], int(top[0]["cnt"])
        merges.append((step, best_pair, cnt))
        t1, t2 = best_pair.split(" ", 1)
        vocab = vocab.withColumn(
            "ts",
            F.replace(
                F.col("ts"),
                F.lit(f"{SOH}{t1}{STX}{SOH}{t2}{STX}"),
                F.lit(f"{SOH}{t1}{t2}{STX}"),
            ),
        )
    _BPE_CACHE[key] = (merges, vocab)
    return merges, vocab


def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the first BPE_MERGES byte-pair-encoding merges over the
    corpus: per iteration, count every adjacent token pair weighted by
    word frequency, pick the max (count DESC, pair ASC), and merge it
    everywhere. Output: (step, pair, weighted_count) — the learned
    merge table a tokenizer trainer persists.

    Token state frames every token in SOH/STX (``\\x01tok\\x02``,
    concatenated): the frame makes each replace occurrence an EXACT
    adjacent-token match — a separator-joined form false-matches
    token prefixes/suffixes across the boundary ('e  t' matches inside
    'e  th', merging a pair that was never learned) — and the pattern
    consumes no shared separator, so non-overlapping left-to-right
    replace equals greedy BPE merge application exactly ('a a a a'
    merges to 'aa aa'). DuckDB's replace() has the same left-to-right
    semantics, which is what makes the oracle exact.

    100 TB shape: pair counting and merging run over the DISTINCT-word
    frequency table, not the corpus — one corpus-sized aggregation up
    front (cached), then each iteration is one tiny vocab-sized
    aggregate plus a 1-row argmax probe (the same bounded driver-probe
    pattern as pagerank's convergence check; the reference trains
    tokenizers by shipping exactly this loop through its parallel-map
    API)."""
    schema = StructType(
        [
            StructField("step", LongType()),
            StructField("pair", StringType()),
            StructField("weighted_count", LongType()),
        ]
    )
    merges, _ = _train_bpe(spark, sf_dir)
    return spark.createDataFrame(merges, schema)


def bpe_encode_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENCODE the corpus under the trained merges — the other half of
    the tokenizer lifecycle: per source, exact word / BPE-token /
    character totals (all BIGINT; tokens < chars once merges apply).
    The final vocab state maps each distinct word to its merged token
    count; corpus totals are frequency-weighted joins against it, so
    the corpus is scanned once and everything else is vocab-sized.

    100 TB shape: the per-(source, word) aggregate is the corpus scan;
    the token-count join is against the tiny vocab table (broadcast);
    no row-level re-tokenization of the corpus ever happens — the
    production reason tokenizers precompute word->tokens maps."""
    _, vocab = _train_bpe(spark, sf_dir)
    tok = vocab.select(
        "word", F.size(_bpe_tokens(F.col("ts"))).cast("long").alias("ntok")
    )
    d = load_table(spark, sf_dir, "documents")
    src_words = (
        d.select(
            "source",
            F.explode(lower_tokens(F.col("text"))).alias("word"),
        )
        .filter(F.length("word") >= 1)
        .groupBy("source", "word")
        .agg(F.count("*").alias("freq"))
    )
    out = (
        src_words.join(F.broadcast(tok), "word")
        .groupBy("source")
        .agg(
            F.sum("freq").alias("n_words"),
            F.sum(F.col("freq") * F.col("ntok")).alias("n_tokens"),
            F.sum(F.col("freq") * F.length("word")).alias("n_chars"),
        )
        .orderBy("source")
    )
    return out


def _bpe_chain_sql() -> str:
    """The shared training chain: v0..v{BPE_MERGES} vocab states, each
    m{n} the step-n winning merge. Carries ``word`` so encoders can
    join the final state back to corpus word frequencies."""
    # chr(1)/chr(2) = the SOH/STX token frame; the replace pattern is
    # COALESCEd to chr(3) (never present) so an exhausted merge step
    # (empty m{n}) leaves the vocab state UNCHANGED instead of
    # NULL-cascading every ts through replace(ts, NULL, NULL).
    head = r"""
WITH words AS (
  SELECT w AS word, COUNT(*) AS freq
  FROM documents,
       UNNEST(regexp_split_to_array(trim(lower(text)), '\s+')) AS u(w)
  WHERE len(w) >= 1 GROUP BY 1
),
v0 AS (
  SELECT word,
         array_to_string([chr(1) || word[i:i] || chr(2)
                          FOR i IN range(1, len(word)+1)], '') AS ts,
         freq
  FROM words
)"""
    step = r""",
pc{n} AS (
  SELECT p AS pair, SUM(freq) AS cnt FROM (
    SELECT UNNEST([tk[i] || ' ' || tk[i+1] FOR i IN range(1, len(tk))]) AS p, freq
    FROM (SELECT [x[2:] FOR x IN string_split(ts, chr(2)) IF x != ''] AS tk,
                 freq
          FROM v{m})
  ) GROUP BY 1
),
m{n} AS (SELECT pair, cnt FROM pc{n} ORDER BY cnt DESC, pair LIMIT 1),
v{n} AS (
  SELECT word,
         replace(ts,
           COALESCE((SELECT chr(1) || replace(pair, ' ', chr(2) || chr(1))
                            || chr(2) FROM m{n}), chr(3)),
           COALESCE((SELECT chr(1) || replace(pair, ' ', '') || chr(2)
                     FROM m{n}), '')) AS ts, freq
  FROM v{m}
)"""
    parts = [head]
    for n in range(1, BPE_MERGES + 1):
        parts.append(step.format(n=n, m=n - 1))
    return "".join(parts)


def _bpe_train_sql() -> str:
    union = "\nUNION ALL\n".join(
        f"SELECT CAST({n} AS BIGINT) AS step, pair, "
        f"CAST(cnt AS BIGINT) AS weighted_count FROM m{n}"
        for n in range(1, BPE_MERGES + 1)
    )
    return _bpe_chain_sql() + "\n" + union + "\nORDER BY step"


BPE_MERGES_SQL = _bpe_train_sql()

BPE_ENCODE_SQL = (
    _bpe_chain_sql()
    + rf""",
src_words AS (
  SELECT source, w AS word, COUNT(*) AS freq
  FROM documents,
       UNNEST(regexp_split_to_array(trim(lower(text)), '\s+')) AS u(w)
  WHERE len(w) >= 1 GROUP BY 1, 2
),
tok AS (
  SELECT word,
         CAST(len([x FOR x IN string_split(ts, chr(2)) IF x != ''])
              AS BIGINT) AS ntok
  FROM v{BPE_MERGES}
)
SELECT source, CAST(SUM(freq) AS BIGINT) AS n_words,
       CAST(SUM(freq * ntok) AS BIGINT) AS n_tokens,
       CAST(SUM(freq * len(word)) AS BIGINT) AS n_chars
FROM src_words JOIN tok USING (word)
GROUP BY source ORDER BY source
"""
)


SPECS: list[QuerySpec] = [
    QuerySpec(
        "semdedup_prune",
        semdedup_prune,
        SEMDEDUP_SQL,
        tags=("semantic", "dedup", "embeddings"),
        doc="SemDeDup in-cluster cosine prune with pinned centroids",
    ),
    QuerySpec(
        "winnowing_fingerprints",
        winnowing_fingerprints,
        WINNOWING_FPS_SQL,
        tags=("semantic", "fingerprint", "documents"),
        doc="per-doc winnowed fingerprint census (SIGMOD'03 winnowing)",
    ),
    QuerySpec(
        "winnowing_contamination_pairs",
        winnowing_contamination_pairs,
        WINNOWING_PAIRS_SQL,
        tags=("semantic", "fingerprint", "dedup", "documents"),
        doc="doc pairs sharing >= 3 winnowed fingerprints",
    ),
    QuerySpec(
        "distinct_ngram_diversity",
        distinct_ngram_diversity,
        DISTINCT_NGRAM_SQL,
        tags=("semantic", "quality", "documents"),
        doc="distinct-1/distinct-2 lexical diversity per source",
    ),
    QuerySpec(
        "editdist_neardup_pairs",
        editdist_neardup_pairs,
        EDITDIST_PAIRS_SQL,
        tags=("semantic", "dedup", "documents"),
        doc="relative-edit-distance near-dup pairs over prefix blocks",
    ),
    QuerySpec(
        "bpe_train_merges",
        bpe_train_merges,
        BPE_MERGES_SQL,
        tags=("semantic", "tokenizer", "documents"),
        doc="first 4 BPE merges trained over the word-frequency table",
    ),
    QuerySpec(
        "bpe_encode_token_stats",
        bpe_encode_token_stats,
        BPE_ENCODE_SQL,
        tags=("semantic", "tokenizer", "documents"),
        doc="per-source word/token/char totals under the trained merges",
    ),
]
