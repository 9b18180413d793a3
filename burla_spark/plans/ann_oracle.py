"""Oracle-checkable companion stages for the no-oracle ANN/dedup/
clustering family (round-6: shrink the driver's gray zone).

The fuzzy operators (MinHash, LSH, IVF, PQ, k-means, near-dup) are
permanently `no_oracle` to the driver: their candidate generation is
xxhash- or k-means-trained and DuckDB cannot reproduce it. But each has
an EXACT sub-computation — the verify/assign/re-rank stage — that IS
SQL-expressible once its inputs are pinned deterministically. These
specs drive exactly those stages with full DuckDB oracles, so the
driver's scoreboard covers the math the fuzzy pipelines rest on:

* ``shingle_jaccard_verified_pairs`` — MinHash's verify stage: exact
  5-gram Jaccard over a deterministic blocked candidate set
  (companion to ``minhash_dedup_pairs``, operators/dedup.py).
* ``neardup_cosine_pairs_exact`` — near-dup's verify stage: exact
  cosine threshold over a bounded-by-construction pair set
  (companion to ``embedding_neardup`` / ``embedding_lsh_topk``).
* ``pq_fixed_codebook_topk`` — PQ's assign + ADC stages with a FIXED
  deterministic codebook (companion to ``embedding_pq_topk`` /
  ``embedding_ivfpq_topk``, whose trained codebooks are the only
  non-SQL part).
* ``kmeans_assign_fixed_centroids`` — k-means' assignment pass with
  fixed centroids (companion to ``kmeans_cluster_sizes``; the trained
  loop is this pass iterated).
* ``mmr_lambda1_topk`` — MMR at lambda=1, which degenerates exactly to
  cosine top-k (companion to ``mmr_diversified_topk``: proves the
  scoring/selection machinery against the exact-retrieval oracle).
* ``lsh_fixed_planes_buckets`` — hyperplane-LSH sign-pattern bucketing
  with FIXED planes (companion to ``embedding_lsh_topk``, whose seeded
  random planes are the only non-SQL part).

Round-7 additions close the two sketch gray zones the same way:

* ``simhash_md5_signatures`` — SimHash's vote/fold/pack math over
  md5-derived 60-bit hashes (companion to ``simhash_dedup_groups``;
  xxhash64 is the only part DuckDB can't replay).
* ``hll_registers_md5`` — HLL's register index + rho + per-register
  MAX merge over md5 hashes (companion to ``hll_cardinality_sketch``;
  the bias-corrected estimate is a driver-side function of these
  registers).

Round 11 closed the ledger the companions were shrinking: every
PRIMARY spec in the fuzzy family now registers a deterministic
driver-adjudication mode with its own full oracle (plans/llm.py,
plans/scale_ops.py), so these companions' role shifted from
"only oracle coverage of the math" to regression anchors for the
exact sub-stages. Still irreducible: compression-ratio (zlib — no SQL
engine exposes it; property-gated via properties_report.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from burla_spark.functions.vectors import dot, double_vec, l2_norm
from burla_spark.operators.text import lower_tokens
from burla_spark.plans.base import QuerySpec
from burla_spark.sources.tables import load_table

DIM = 64  # embeddings fixture dimension (TESTDATA.md)


def load_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings with the NULL-key policy applied: ``vec_id`` is the
    vector's IDENTITY — every spec in this file groups, ranks
    (row_number PARTITION BY), or joins on it, and under NULL ids the
    two engines merge at different stages (DuckDB's GROUP BY collapses
    all NULL-id vectors into one pseudo-vector before the argmin;
    Spark's window partitions collapse after it — the round-8 nullkey
    sweep caught kmeans_assign 75 vs 74 members, lsh_buckets 124 vs
    123 rows). A key needs an identity: id-less vectors are excluded
    on BOTH engine sides (each SQL carries the matching
    ``vec_id IS NOT NULL``)."""
    return load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id").isNotNull()
    )


# ---------------------------------------------------------------------------
# MinHash verify stage: exact shingle Jaccard over blocked candidates
# ---------------------------------------------------------------------------
def shingle_jaccard_verified_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-5-gram Jaccard over prefix-blocked candidate pairs —
    the verify stage every MinHash pipeline ends with (reference
    near-dup flow), on a DETERMINISTIC candidate generator (equal
    40-char prefix) instead of the xxhash LSH bands, so DuckDB can
    replay it bit-for-bit. Jaccard = |∩| / |∪| of distinct shingle
    SETS — a ratio of exact BIGINTs, hash-identical on both engines.

    100 TB shape: the block join is an equi-join on the prefix key
    (shuffle bounded by block sizes, never corpus²); shingling is one
    map-side higher-order-function pass; the set ops run on the joined
    pair only. This is exactly how the production verify stage behaves
    with LSH-band keys in place of the prefix."""
    from burla_spark.functions.numeric import let

    d = load_table(spark, sf_dir, "documents")
    # let-bind the token split: lambdas don't CSE, so an unbound `toks`
    # inside the transform re-splits the whole text once PER GRAM
    # (ENGINEERING_NOTES Catalyst pitfalls — measured 6.2 s -> ~1 s
    # at sf0.1 for this query).
    shingles = let(
        lower_tokens(F.col("text")),
        lambda toks: F.when(
            F.size(toks) >= 5,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - 4),
                    lambda i: F.array_join(F.slice(toks, i, 5), " "),
                )
            ),
        ),
    )
    sh = d.select(
        "doc_id",
        F.substring("text", 1, 40).alias("pfx"),
        shingles.alias("shingles"),
    ).filter(F.col("shingles").isNotNull())
    # probe-side width: the fixture scan is 1-2 splits and the block
    # join's build side broadcasts, so the heavy array_intersect/union
    # verify would inherit 1-2 tasks. An explicit-width repartition on
    # the block key (AQE never coalesces it) spreads the verify across
    # the session's shuffle width; at production scale the scan is
    # already wide and this exchange moves one extra pass of shingles.
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    a = sh.repartition(n_parts, "pfx").select(
        F.col("doc_id").alias("id_a"), F.col("pfx"), F.col("shingles").alias("sh_a")
    )
    b = sh.select(
        F.col("doc_id").alias("id_b"), F.col("pfx"), F.col("shingles").alias("sh_b")
    )
    n_common = F.size(F.array_intersect("sh_a", "sh_b")).cast("long")
    n_union = F.size(F.array_union("sh_a", "sh_b")).cast("long")
    return (
        a.join(b, "pfx")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            n_common.alias("n_common"),
            (n_common.cast("double") / n_union.cast("double")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.5)
        .orderBy("id_a", "id_b")
    )


SHINGLE_JACCARD_SQL = r"""
WITH sh AS (
  SELECT doc_id, substr(text, 1, 40) AS pfx,
         list_distinct([array_to_string(toks[i:i+4], ' ')
                        FOR i IN range(1, len(toks) - 3)]) AS shingles
  FROM (SELECT doc_id, text,
               regexp_split_to_array(trim(lower(text)), '\s+') AS toks
        FROM documents)
  WHERE len(toks) >= 5
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(len(list_intersect(a.shingles, b.shingles)) AS BIGINT) AS n_common,
       CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
         / CAST(len(list_distinct(list_concat(a.shingles, b.shingles))) AS DOUBLE)
         AS jaccard
FROM sh a JOIN sh b ON a.pfx = b.pfx AND a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
        / CAST(len(list_distinct(list_concat(a.shingles, b.shingles))) AS DOUBLE)
      >= 0.5
ORDER BY id_a, id_b
"""


# ---------------------------------------------------------------------------
# near-dup verify stage: exact cosine threshold over a bounded pair set
# ---------------------------------------------------------------------------
def neardup_cosine_pairs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine-threshold pair verification over a
    bounded-by-construction candidate set (right side vec_id < 250) —
    the re-rank/verify half of ``embedding_neardup``, whose LSH bucket
    keys (xxhash) the oracle cannot reproduce. The float path is the
    driver-proven cosine recipe (embedding_cosine_topk, green r4).

    100 TB shape: production feeds this stage LSH-bucketed candidates
    (bounded by bucket size); the exhaustive pairing here exists only
    to make the stage oracle-checkable on the fixture. + 0.0
    normalizes signed zero (contract rule 13)."""
    e = load_vectors(spark, sf_dir)
    # per-vector norms once per side (identical aggregate expression,
    # bit-identical result — 2/3 less work in the pair stage).
    vd = double_vec(F.col("embedding"))
    nrm = l2_norm(vd)
    a = e.select(F.col("vec_id").alias("id_a"), vd.alias("va"), nrm.alias("na"))
    b = e.filter(F.col("vec_id") < 250).select(
        F.col("vec_id").alias("id_b"), vd.alias("vb"), nrm.alias("nb")
    )
    sim = F.try_divide(
        dot(F.col("va"), F.col("vb")), F.col("na") * F.col("nb")
    )
    return (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            (F.round(sim, 6) + F.lit(0.0)).alias("sim"),
            sim.alias("__raw"),
        )
        .filter(F.col("__raw") >= 0.4)
        .drop("__raw")
        .orderBy("id_a", "id_b")
    )


NEARDUP_PAIRS_SQL = f"""
WITH p AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
    SUM(CAST(a.embedding[s.i] AS DOUBLE) * CAST(b.embedding[s.i] AS DOUBLE)) AS dot,
    SUM(CAST(a.embedding[s.i] AS DOUBLE) * CAST(a.embedding[s.i] AS DOUBLE)) AS aa,
    SUM(CAST(b.embedding[s.i] AS DOUBLE) * CAST(b.embedding[s.i] AS DOUBLE)) AS bb
  FROM embeddings a, embeddings b,
       (SELECT UNNEST(generate_series(1, {DIM})) AS i) s
  WHERE a.vec_id < b.vec_id AND b.vec_id < 250
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       ROUND(dot / NULLIF(SQRT(aa) * SQRT(bb), 0), 6) + 0.0 AS sim
FROM p WHERE dot / NULLIF(SQRT(aa) * SQRT(bb), 0) >= 0.4
ORDER BY id_a, id_b
"""


# ---------------------------------------------------------------------------
# PQ assign + ADC with a fixed deterministic codebook
# ---------------------------------------------------------------------------
PQ_M = 4  # subspaces
PQ_SUB = DIM // PQ_M  # dims per subspace
PQ_K = 16  # codewords per subspace = embeddings vec_id 0..15


def pq_fixed_codebook_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization assignment + asymmetric-distance (ADC)
    top-10 with a FIXED codebook — codeword c of subspace s is the
    s-th 16-dim slice of embedding vec_id=c (c < 16). Everything the
    trained ``embedding_pq_topk`` does EXCEPT the k-means fit, which is
    the one non-SQL stage; pinning the codebook makes assign + LUT +
    ADC + rank an exact DuckDB replay (the round-6 gray-zone closer).

    100 TB shape identical to the production PQ path: the codebook
    (64 tiny rows) broadcasts; code assignment is one corpus scan with
    a per-(vector, subspace) argmin; the query LUT (5×4×16 partial
    dots) broadcasts; the ADC scan reads codes, not vectors. Ranks
    carry a unique total order (adc desc, neighbor asc); ties in the
    argmin break to the smaller codeword id on both engines."""
    e = load_vectors(spark, sf_dir)
    subs = spark.range(PQ_M).select(F.col("id").cast("int").alias("s"))

    def subvec(col: str):  # s-th 16-dim slice, elements cast to double
        return F.transform(
            F.slice(F.col(col), F.col("s") * PQ_SUB + 1, PQ_SUB),
            lambda x: x.cast("double"),
        )

    cb = (
        e.filter(F.col("vec_id") < PQ_K)
        .crossJoin(subs)
        .select(F.col("vec_id").alias("c"), "s", subvec("embedding").alias("cvec"))
    )
    corpus = e.crossJoin(subs).select(
        F.col("vec_id").alias("neighbor_id"), "s", subvec("embedding").alias("vvec")
    )
    d2 = F.aggregate(
        F.zip_with("vvec", "cvec", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    # argmin on the ROUNDED distance: raw float sums may differ by an
    # ULP between engines (accumulation order is unspecified), which
    # near a tie would flip the assignment; rounding to 6 dp with the
    # codeword-id tiebreak is engine-stable (same pattern as the ADC
    # rank below and mmr_lambda1_topk).
    w_assign = Window.partitionBy("neighbor_id", "s").orderBy(
        F.asc(F.round("d2", 6)), F.asc("c")
    )
    codes = (
        corpus.join(F.broadcast(cb), "s")
        .select("neighbor_id", "s", "c", d2.alias("d2"))
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("neighbor_id", "s", "c")
    )
    lut = (
        e.filter(F.col("vec_id") < 5)
        .crossJoin(subs)
        .select(F.col("vec_id").alias("query_id"), "s", subvec("embedding").alias("qvec"))
        .join(F.broadcast(cb), "s")
        .select(
            "query_id", "s", "c",
            F.aggregate(
                F.zip_with("qvec", "cvec", lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("pdot"),
        )
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("adc_raw", 6)), F.asc("neighbor_id")
    )
    return (
        codes.join(F.broadcast(lut), ["s", "c"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("pdot").alias("adc_raw"))
        .withColumn("rank", F.row_number().over(w_rank).cast("long"))
        .filter(F.col("rank") <= 10)
        .select(
            "query_id", "neighbor_id", "rank",
            (F.round("adc_raw", 6) + F.lit(0.0)).alias("adc_dot"),
        )
        .orderBy("query_id", "rank")
    )


PQ_FIXED_SQL = f"""
WITH s(s) AS (SELECT UNNEST(generate_series(0, {PQ_M - 1}))),
i(i) AS (SELECT UNNEST(generate_series(1, {PQ_SUB}))),
d2 AS (
  SELECT v.vec_id AS neighbor_id, s.s, cb.vec_id AS c,
    SUM((CAST(v.embedding[s.s * {PQ_SUB} + i.i] AS DOUBLE)
         - CAST(cb.embedding[s.s * {PQ_SUB} + i.i] AS DOUBLE))
        * (CAST(v.embedding[s.s * {PQ_SUB} + i.i] AS DOUBLE)
           - CAST(cb.embedding[s.s * {PQ_SUB} + i.i] AS DOUBLE))) AS d2
  FROM embeddings v, embeddings cb, s, i
  WHERE cb.vec_id < {PQ_K} AND v.vec_id IS NOT NULL
  GROUP BY 1, 2, 3
),
codes AS (
  SELECT neighbor_id, s, c FROM d2
  QUALIFY ROW_NUMBER() OVER (PARTITION BY neighbor_id, s
                             ORDER BY ROUND(d2, 6), c) = 1
),
lut AS (
  SELECT q.vec_id AS query_id, s.s, cb.vec_id AS c,
    SUM(CAST(q.embedding[s.s * {PQ_SUB} + i.i] AS DOUBLE)
        * CAST(cb.embedding[s.s * {PQ_SUB} + i.i] AS DOUBLE)) AS pdot
  FROM embeddings q, embeddings cb, s, i
  WHERE q.vec_id < 5 AND cb.vec_id < {PQ_K}
  GROUP BY 1, 2, 3
),
adc AS (
  SELECT lut.query_id, codes.neighbor_id, SUM(lut.pdot) AS adc_raw
  FROM codes JOIN lut ON codes.s = lut.s AND codes.c = lut.c
  WHERE lut.query_id <> codes.neighbor_id
  GROUP BY 1, 2
)
SELECT query_id, neighbor_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY ROUND(adc_raw, 6) DESC,
                                        neighbor_id) AS BIGINT) AS rank,
       ROUND(adc_raw, 6) + 0.0 AS adc_dot
FROM adc
QUALIFY rank <= 10
ORDER BY query_id, rank
"""


# ---------------------------------------------------------------------------
# k-means assignment pass with fixed centroids
# ---------------------------------------------------------------------------
KM_K = 8  # centroids = embeddings vec_id 0..7


def assign_fixed_centroids(e: DataFrame, k: int) -> DataFrame:
    """THE fixed-centroid assignment kernel: nearest centroid
    (embeddings vec_id < k) by squared L2 on the ROUNDED distance,
    ties to the smaller centroid id. Shared by
    ``kmeans_assign_fixed_centroids`` and ``semdedup_prune`` so the
    'its assignment math is exactly the kmeans kernel' guarantee is
    structural, not a copy that can drift. Returns
    (vec_id, cluster_id, d2, embedding)."""
    cents = e.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cluster_id"), F.col("embedding").alias("cvec")
    )
    d2 = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            F.col("cvec"),
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.asc(F.round("d2", 6)), F.asc("cluster_id")
    )
    return (
        e.crossJoin(F.broadcast(cents))
        .select("vec_id", "embedding", "cluster_id", d2.alias("d2"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cluster_id", "d2", "embedding")
    )


def kmeans_assign_fixed_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One exact k-means ASSIGNMENT pass with fixed centroids
    (embeddings vec_id 0..7): every vector goes to its nearest
    centroid by squared L2, ties to the smaller centroid id. This is
    the per-iteration kernel of ``kmeans_cluster_sizes`` (and IVF's
    cell assignment) with the only non-SQL part — the trained
    centroids — pinned. Output aggregates avoid double accumulation
    (contract rule 8): exact BIGINT counts plus MIN/MAX distances
    (no re-summation), rounded per-row semantics only.

    100 TB shape: centroids broadcast (k rows); one corpus scan; the
    argmin is a per-row reduction over k, no shuffle until the final
    tiny group-by."""
    e = load_vectors(spark, sf_dir)
    assigned = assign_fixed_centroids(e, KM_K)
    return (
        assigned.groupBy("cluster_id")
        .agg(
            F.count("*").alias("n_members"),
            F.round(F.min("d2"), 6).alias("min_d2"),
            F.round(F.max("d2"), 6).alias("max_d2"),
        )
        .orderBy("cluster_id")
    )


KMEANS_ASSIGN_SQL = f"""
WITH i(i) AS (SELECT UNNEST(generate_series(1, {DIM}))),
d2 AS (
  SELECT v.vec_id, c.vec_id AS cluster_id,
    SUM((CAST(v.embedding[i.i] AS DOUBLE) - CAST(c.embedding[i.i] AS DOUBLE))
        * (CAST(v.embedding[i.i] AS DOUBLE) - CAST(c.embedding[i.i] AS DOUBLE))) AS d2
  FROM embeddings v, embeddings c, i
  WHERE c.vec_id < {KM_K} AND v.vec_id IS NOT NULL
  GROUP BY 1, 2
),
assigned AS (
  SELECT vec_id, cluster_id, d2 FROM d2
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                             ORDER BY ROUND(d2, 6), cluster_id) = 1
)
SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members,
       ROUND(MIN(d2), 6) AS min_d2, ROUND(MAX(d2), 6) AS max_d2
FROM assigned GROUP BY cluster_id ORDER BY cluster_id
"""


# ---------------------------------------------------------------------------
# MMR at lambda=1 degenerates to exact cosine top-k
# ---------------------------------------------------------------------------
def mmr_lambda1_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mmr_topk`` with lambda=1: the diversity term vanishes and the
    greedy selection must reproduce exact cosine top-10 — which DuckDB
    CAN compute. Runs the real MMR machinery (pool retrieval +
    per-query pandas greedy loop), so a green row certifies the
    operator's scoring/selection half; the lambda<1 behavior is
    property-tested in pytest (test_operators.py). Ranking follows the
    pool's rounded sims (mmr consumes the retrieval stage's rounded
    scores), so the oracle ranks by ROUND(sim, 6) with the same
    id-asc tiebreak."""
    from burla_spark.operators import similarity as sim

    e = load_vectors(spark, sf_dir)
    q = e.filter(F.col("vec_id") < 5)
    out = sim.mmr_topk(
        q, e, "vec_id", "vec_id", "embedding", "embedding",
        k=10, pool=50, lam=1.0,
    )
    return out.select(
        "query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"),
        (F.round("sim", 6) + F.lit(0.0)).alias("sim"),
    ).orderBy("query_id", "rank")


MMR_LAMBDA1_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
p AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
    SUM(CAST(q.qe[s.i] AS DOUBLE) * CAST(c.embedding[s.i] AS DOUBLE)) AS dot,
    SUM(CAST(q.qe[s.i] AS DOUBLE) * CAST(q.qe[s.i] AS DOUBLE)) AS qq,
    SUM(CAST(c.embedding[s.i] AS DOUBLE) * CAST(c.embedding[s.i] AS DOUBLE)) AS cc
  FROM q, embeddings c, (SELECT UNNEST(generate_series(1, {DIM})) AS i) s
  WHERE q.query_id <> c.vec_id AND c.vec_id IS NOT NULL
  GROUP BY 1, 2
),
scored AS (
  SELECT query_id, neighbor_id, ROUND(dot / (SQRT(qq) * SQRT(cc)), 6) AS rsim
  FROM p
),
ranked AS (
  SELECT query_id, neighbor_id, rsim,
    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY rsim DESC, neighbor_id) AS BIGINT) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, rsim + 0.0 AS sim
FROM ranked WHERE rank <= 10
ORDER BY query_id, rank
"""


# ---------------------------------------------------------------------------
# LSH bucketing with FIXED hyperplanes
# ---------------------------------------------------------------------------
LSH_PLANES = 8  # planes = embeddings vec_id 0..7 → 256 possible buckets


def lsh_fixed_planes_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH bucket assignment with FIXED planes —
    everything ``embedding_lsh_topk`` (operators/similarity.py) does
    to build a table EXCEPT drawing the planes from a seeded RNG,
    which is the one non-SQL stage; pinning plane j to embedding
    vec_id=j makes the sign-pattern bucketing an exact DuckDB replay.
    bit_j = (dot(v, plane_j) >= 0) on the ROUNDED dot (6 dp) — the
    same ULP-stability rule as the PQ/k-means argmins, since the two
    engines' float accumulation orders are unspecified. bucket id is
    the bit-weighted sum, an exact BIGINT.

    100 TB shape identical to the production LSH path: planes (8 tiny
    rows) broadcast; ONE corpus scan computes all 8 dots per vector
    map-side; the only shuffle is the final bucket-cardinality-bounded
    group-by. Output is the bucket occupancy report — the quantity
    that determines LSH recall/candidate cost."""
    e = load_vectors(spark, sf_dir)
    planes = (
        e.filter(F.col("vec_id") < LSH_PLANES)
        .select(F.col("vec_id").alias("j"), F.col("embedding").alias("pvec"))
    )
    dot = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            F.col("pvec"),
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    bits = (
        e.crossJoin(F.broadcast(planes))
        .select("vec_id", "j", F.round(dot, 6).alias("rdot"))
        .groupBy("vec_id")
        .agg(
            F.sum(
                F.when(F.col("rdot") >= 0, F.pow(F.lit(2.0), F.col("j")))
                .otherwise(F.lit(0.0))
                .cast("long")
            ).alias("bucket")
        )
    )
    return (
        bits.groupBy("bucket")
        .agg(
            F.count("*").alias("n_members"),
            F.min("vec_id").alias("first_vec"),
            F.max("vec_id").alias("last_vec"),
        )
        .orderBy("bucket")
    )


LSH_FIXED_PLANES_SQL = f"""
WITH i(i) AS (SELECT UNNEST(generate_series(1, {DIM}))),
dots AS (
  SELECT v.vec_id, p.vec_id AS j,
    ROUND(SUM(CAST(v.embedding[i.i] AS DOUBLE)
              * CAST(p.embedding[i.i] AS DOUBLE)), 6) AS rdot
  FROM embeddings v, embeddings p, i
  WHERE p.vec_id < {LSH_PLANES} AND v.vec_id IS NOT NULL
  GROUP BY 1, 2
),
bits AS (
  SELECT vec_id,
    CAST(SUM(CASE WHEN rdot >= 0 THEN POW(2.0, j) ELSE 0.0 END) AS BIGINT)
      AS bucket
  FROM dots GROUP BY vec_id
)
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(MIN(vec_id) AS BIGINT) AS first_vec,
       CAST(MAX(vec_id) AS BIGINT) AS last_vec
FROM bits GROUP BY bucket ORDER BY bucket
"""


# ---------------------------------------------------------------------------
# SimHash with md5 bits: the sketch's vote/fold math, oracle-exact
# ---------------------------------------------------------------------------
SIMHASH_BITS = 60  # 15 hex chars of md5 -> 60 bits, positive in BIGINT


def simhash_md5_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SimHash fold — per-bit ±1 token votes, strict-majority sign
    — computed over md5-derived 60-bit token hashes instead of
    xxhash64, which is the ONLY part of ``simhash_dedup_groups`` DuckDB
    cannot replay (conv(substr(md5(t),1,15),16,10) is bit-identical in
    both engines). Output: each document's signature plus its bucket
    size — any divergence in the vote counting, majority rule, or bit
    packing flips the signature hash.

    100 TB shape identical to the production operator: one token
    explode fanned ×60 bits map-side, a (doc, bit) partial-sum
    combine, and a doc-keyed re-fold — all shuffles linear in corpus
    size; the bucket census is one more signature-keyed combine."""
    d = load_table(spark, sf_dir, "documents")
    h = F.conv(F.substring(F.md5(F.col("token")), 1, 15), 16, 10).cast("long")
    toks = (
        d.filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            F.explode(lower_tokens(F.col("text"))).alias("token"),
        )
        .select("doc_id", h.alias("h"))
    )
    bits = toks.select(
        "doc_id",
        "h",
        F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))).alias("bit"),
    )
    # F.shiftright/shiftleft take only literal bit counts; the SQL
    # forms accept a column.
    votes = bits.groupBy("doc_id", "bit").agg(
        F.sum(F.expr("shiftright(h, CAST(bit AS INT)) & 1")).alias("ones"),
        F.count("*").alias("n"),
    )
    contrib = F.when(
        F.col("ones") * 2 > F.col("n"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))"),
    ).otherwise(F.lit(0).cast("long"))
    sigs = votes.groupBy("doc_id").agg(F.sum(contrib).alias("simhash"))
    w = Window.partitionBy("simhash")
    return (
        sigs.select("doc_id", "simhash", F.count("*").over(w).alias("bucket_n"))
        .orderBy("doc_id")
    )


SIMHASH_MD5_SQL = rf"""
WITH toks AS (
  SELECT doc_id,
         ('0x' || substr(md5(t), 1, 15))::BIGINT AS h
  FROM documents,
       UNNEST(regexp_split_to_array(trim(lower(text)), '\s+')) AS u(t)
  WHERE text IS NOT NULL
),
votes AS (
  SELECT doc_id, bit,
         SUM((h >> bit) & 1) AS ones, COUNT(*) AS n
  FROM toks, UNNEST(generate_series(0, {SIMHASH_BITS - 1})) AS b(bit)
  GROUP BY 1, 2
),
sigs AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN ones * 2 > n THEN (1::BIGINT << bit) ELSE 0 END)
              AS BIGINT) AS simhash
  FROM votes GROUP BY doc_id
)
SELECT doc_id, simhash,
       CAST(COUNT(*) OVER (PARTITION BY simhash) AS BIGINT) AS bucket_n
FROM sigs ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# HLL registers with md5: the sketch's register math, oracle-exact
# ---------------------------------------------------------------------------
HLL_P = 6  # 2^6 = 64 registers
HLL_REM_BITS = SIMHASH_BITS - HLL_P  # 54 value bits per hash


def hll_registers_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog's register computation — index = top HLL_P hash
    bits, rho = position of the first set bit in the remainder, merged
    by per-register MAX — over md5-derived hashes of the distinct
    customer keys in orders. This is everything
    ``hll_cardinality_sketch`` does except (a) the Spark-internal
    xxhash and (b) the bias-corrected harmonic estimate, which is a
    pure driver-side function OF these registers. rho is exact
    integer-only arithmetic: bin(rem) never has leading zeros, so
    rho = rem_bits - length(bin(rem)) + 1 (all-zero remainder
    saturates at rem_bits + 1, the standard HLL convention).

    100 TB shape: the register table IS the map-side combine — every
    partition reduces to <= 64 (register, max_rho) rows before the
    shuffle, the same mergeability the sketch exists for."""
    o = load_table(spark, sf_dir, "orders")
    h = F.conv(
        F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 15), 16, 10
    ).cast("long")
    hashed = (
        o.select(F.col("o_custkey"))
        .distinct()
        .select(
            (F.shiftright(h, HLL_REM_BITS)).alias("register"),
            (h.bitwiseAND(F.lit((1 << HLL_REM_BITS) - 1))).alias("rem"),
        )
    )
    rho = F.when(F.col("rem") == 0, F.lit(HLL_REM_BITS + 1)).otherwise(
        F.lit(HLL_REM_BITS) - F.length(F.bin("rem")) + 1
    )
    return (
        hashed.select("register", rho.cast("long").alias("rho"))
        .groupBy("register")
        .agg(F.max("rho").alias("max_rho"), F.count("*").alias("n_values"))
        .orderBy("register")
    )


HLL_REGISTERS_SQL = f"""
WITH vals AS (
  SELECT DISTINCT o_custkey FROM orders
),
hashed AS (
  SELECT ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM vals
),
regs AS (
  SELECT h >> {HLL_REM_BITS} AS register,
         h & {(1 << HLL_REM_BITS) - 1} AS rem
  FROM hashed
)
SELECT register,
       CAST(MAX(CASE WHEN rem = 0 THEN {HLL_REM_BITS + 1}
                     ELSE {HLL_REM_BITS} - length(bin(rem)) + 1 END) AS BIGINT)
         AS max_rho,
       CAST(COUNT(*) AS BIGINT) AS n_values
FROM regs GROUP BY register ORDER BY register
"""


# ---------------------------------------------------------------------------
# Hard-negative mining: nearest cross-label neighbor per query
# ---------------------------------------------------------------------------
HN_QUERIES = 50


def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each query vector, its single most similar vector carrying a
    DIFFERENT label — the hard negative a contrastive/embedding trainer
    pairs with each anchor. Exact cosine over the label-filtered
    corpus; rank on the ROUNDED sim with the id tiebreak (rule 14).

    100 TB shape: this is the exact-verify stage; production feeds it
    ANN candidates (IVF/LSH buckets) instead of the full corpus — the
    same contract as neardup_cosine_pairs_exact. The query set
    broadcasts; one corpus scan."""
    e = load_vectors(spark, sf_dir)
    # per-vector norms computed once per side (identical F.aggregate
    # expression the per-pair form would run, so bit-identical to the
    # oracle's per-pair sums — but 2/3 less work in the pair stage).
    vd = double_vec(F.col("embedding"))
    norm = l2_norm(vd)
    q = e.filter(F.col("vec_id") < HN_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("query_label"),
        vd.alias("qv"),
        norm.alias("qn"),
    )
    c = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
        vd.alias("cv"),
        norm.alias("cn"),
    )
    sim = (
        F.round(
            F.try_divide(dot(F.col("qv"), F.col("cv")), F.col("qn") * F.col("cn")),
            6,
        )
        + F.lit(0.0)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc_nulls_last("sim"), F.asc("neighbor_id")
    )
    return (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_label") != F.col("query_label"))
        .select(
            "query_id", "query_label", "neighbor_id", "neighbor_label",
            sim.alias("sim"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
        .orderBy("query_id")
    )


HARD_NEGATIVE_SQL = f"""
WITH i(i) AS (SELECT UNNEST(generate_series(1, {DIM}))),
p AS (
  SELECT q.vec_id AS query_id, q.label AS query_label,
         c.vec_id AS neighbor_id, c.label AS neighbor_label,
    SUM(CAST(q.embedding[i.i] AS DOUBLE) * CAST(c.embedding[i.i] AS DOUBLE)) AS dot,
    SUM(CAST(q.embedding[i.i] AS DOUBLE) * CAST(q.embedding[i.i] AS DOUBLE)) AS qq,
    SUM(CAST(c.embedding[i.i] AS DOUBLE) * CAST(c.embedding[i.i] AS DOUBLE)) AS cc
  FROM embeddings q, embeddings c, i
  WHERE q.vec_id < {HN_QUERIES} AND c.label != q.label AND c.vec_id IS NOT NULL
  GROUP BY 1, 2, 3, 4
),
sims AS (
  SELECT query_id, query_label, neighbor_id, neighbor_label,
         ROUND(dot / NULLIF(SQRT(qq) * SQRT(cc), 0), 6) + 0.0 AS sim
  FROM p
)
SELECT query_id, query_label, neighbor_id, neighbor_label, sim
FROM sims
QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                           ORDER BY sim DESC NULLS LAST, neighbor_id) = 1
ORDER BY query_id
"""


# ---------------------------------------------------------------------------
# Reciprocal-rank fusion of hybrid retrieval (round 14): the standard
# way a RAG/search stack combines a sparse (BM25) and a dense
# (embedding) retriever — fuse the two TOP-N LISTS by
# score(d) = Σ_lists 1/(K + rank_list(d)), K=60 (Cormack et al.).
#
# Exactness discipline: both rankings are INTEGER-keyed so the lists
# (and hence every rank) are engine-identical.
# * dense: int8-style quantized dot product — round(x·64) per
#   component (×64 is a power of two, so x·64 is float-EXACT and its
#   rounding is deterministic on both engines), then a pure BIGINT
#   dot against query vector 0. Quantized retrieval is the production
#   technique, not a test shim.
# * sparse: per-doc BM25 total in fixed point — the already
#   oracle-exact per-(doc, term) bm25 doubles, each independently
#   rounded to a BIGINT at 1e6, then summed exactly (no float
#   association order).
# The fused score adds exactly TWO doubles in one scalar expression
# (no SUM aggregate), so even the float part is bit-identical.
#
# 100 TB shape: each retriever is its own top-N — the dense side is a
# broadcast-query quantized-dot scan into TakeOrderedAndProject (O(N)
# memory, never a global sort); the sparse side inherits bm25_scores'
# single-pruned-scan shape. Fusion then joins two N-row lists — the
# whole RRF stage is bounded by N regardless of corpus size, exactly
# like a production fusion layer over per-retriever candidate lists.
# ---------------------------------------------------------------------------
RRF_K = 60
RRF_POOL = 100  # per-retriever list depth
RRF_TOP = 20
_Q8_SCALE = 64  # power of two: x*64 is exact in binary floating point


def rrf_hybrid_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from burla_spark.plans.llm import bm25_scores

    e = load_vectors(spark, sf_dir)
    quant = lambda col: F.transform(  # noqa: E731
        col, lambda x: F.round(x.cast("double") * _Q8_SCALE).cast("long")
    )
    q = (
        e.filter(F.col("vec_id") == 0)
        .select(quant(F.col("embedding")).alias("qv"))
    )
    dot_q = F.aggregate(
        F.zip_with("cv", "qv", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    dense_top = (
        e.filter(F.col("vec_id") != 0)
        .select(F.col("vec_id").alias("doc_id"), quant(F.col("embedding")).alias("cv"))
        .crossJoin(F.broadcast(q))
        .select("doc_id", dot_q.alias("dense_score"))
        .orderBy(F.desc("dense_score"), F.asc("doc_id"))
        .limit(RRF_POOL)
    )
    wd = Window.orderBy(F.desc("dense_score"), F.asc("doc_id"))
    dense = dense_top.select(
        "doc_id", F.row_number().over(wd).cast("long").alias("dense_rank")
    )
    sparse_top = (
        bm25_scores(spark, sf_dir)
        .select(
            "doc_id",
            F.round(F.col("bm25") * 1_000_000).cast("long").alias("bm25_fp"),
        )
        .groupBy("doc_id")
        .agg(F.sum("bm25_fp").alias("sparse_fp"))
        .orderBy(F.desc("sparse_fp"), F.asc("doc_id"))
        .limit(RRF_POOL)
    )
    ws = Window.orderBy(F.desc("sparse_fp"), F.asc("doc_id"))
    sparse = sparse_top.select(
        "doc_id", F.row_number().over(ws).cast("long").alias("sparse_rank")
    )
    fused = dense.join(sparse, "doc_id", "full_outer")
    rrf = F.coalesce(
        F.lit(1.0) / (F.lit(RRF_K) + F.col("dense_rank")), F.lit(0.0)
    ) + F.coalesce(
        F.lit(1.0) / (F.lit(RRF_K) + F.col("sparse_rank")), F.lit(0.0)
    )
    return (
        fused.select("doc_id", "dense_rank", "sparse_rank", rrf.alias("__rrf"))
        .orderBy(F.desc("__rrf"), F.asc("doc_id"))
        .limit(RRF_TOP)
        .select(
            "doc_id",
            "dense_rank",
            "sparse_rank",
            (F.round(F.col("__rrf"), 6) + F.lit(0.0)).alias("rrf_score"),
        )
    )


def _rrf_sql() -> str:
    from burla_spark.plans.llm import BM25_SQL

    return f"""
WITH i(i) AS (SELECT UNNEST(generate_series(1, {DIM}))),
q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
dense_scored AS (
  SELECT c.vec_id AS doc_id,
    SUM(CAST(ROUND(CAST(q.qe[i.i] AS DOUBLE) * {_Q8_SCALE}) AS BIGINT)
      * CAST(ROUND(CAST(c.embedding[i.i] AS DOUBLE) * {_Q8_SCALE}) AS BIGINT))
      AS dense_score
  FROM embeddings c, q, i
  WHERE c.vec_id IS NOT NULL AND c.vec_id != 0
  GROUP BY 1
),
dense AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY dense_score DESC, doc_id) AS dense_rank
  FROM dense_scored
  ORDER BY dense_score DESC, doc_id LIMIT {RRF_POOL}
),
bm AS ({BM25_SQL}),
sparse_scored AS (
  SELECT doc_id,
         SUM(CAST(ROUND(bm25 * 1000000) AS BIGINT)) AS sparse_fp
  FROM bm GROUP BY 1
),
sparse AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY sparse_fp DESC, doc_id) AS sparse_rank
  FROM sparse_scored
  ORDER BY sparse_fp DESC, doc_id LIMIT {RRF_POOL}
),
fused AS (
  SELECT COALESCE(dense.doc_id, sparse.doc_id) AS doc_id,
         CAST(dense.dense_rank AS BIGINT) AS dense_rank,
         CAST(sparse.sparse_rank AS BIGINT) AS sparse_rank,
         COALESCE(CAST(1 AS DOUBLE) / ({RRF_K} + dense.dense_rank), CAST(0 AS DOUBLE))
           + COALESCE(1.0 / ({RRF_K} + sparse.sparse_rank), 0.0) AS rrf
  FROM dense FULL OUTER JOIN sparse ON dense.doc_id = sparse.doc_id
)
SELECT doc_id, dense_rank, sparse_rank,
       ROUND(rrf, 6) + 0.0 AS rrf_score
FROM fused
ORDER BY rrf DESC, doc_id LIMIT {RRF_TOP}
"""


RRF_SQL = _rrf_sql()


SPECS = [
    QuerySpec(
        "rrf_hybrid_retrieval",
        rrf_hybrid_retrieval,
        RRF_SQL,
        ("ann", "retrieval", "fusion"),
        doc="Reciprocal-rank fusion of an int8-quantized dense top-100 "
        "and a fixed-point BM25 top-100 — engine-exact hybrid "
        "retrieval (round 14).",
    ),
    QuerySpec(
        "hard_negative_mining",
        hard_negative_mining,
        HARD_NEGATIVE_SQL,
        ("similarity", "mlprep", "oracle-companion"),
        doc="Nearest cross-label neighbor per query (contrastive hard "
        "negatives); exact-verify stage of the ANN-fed production path.",
    ),
    QuerySpec(
        "lsh_fixed_planes_buckets",
        lsh_fixed_planes_buckets,
        LSH_FIXED_PLANES_SQL,
        ("similarity", "oracle-companion"),
        doc="Hyperplane-LSH bucket assignment with fixed planes "
        "(companion to embedding_lsh_topk's bucketing stage).",
    ),
    QuerySpec(
        "shingle_jaccard_verified_pairs",
        shingle_jaccard_verified_pairs,
        SHINGLE_JACCARD_SQL,
        ("dedup", "oracle-companion"),
        doc="MinHash verify stage: exact shingle Jaccard over a "
        "deterministic blocked candidate set.",
    ),
    QuerySpec(
        "neardup_cosine_pairs_exact",
        neardup_cosine_pairs_exact,
        NEARDUP_PAIRS_SQL,
        ("similarity", "oracle-companion"),
        doc="Near-dup verify stage: exact cosine threshold pairs.",
    ),
    QuerySpec(
        "pq_fixed_codebook_topk",
        pq_fixed_codebook_topk,
        PQ_FIXED_SQL,
        ("similarity", "oracle-companion"),
        doc="PQ assign + ADC re-rank with a fixed deterministic codebook.",
    ),
    QuerySpec(
        "kmeans_assign_fixed_centroids",
        kmeans_assign_fixed_centroids,
        KMEANS_ASSIGN_SQL,
        ("clustering", "oracle-companion"),
        doc="k-means assignment pass with fixed centroids.",
    ),
    QuerySpec(
        "mmr_lambda1_topk",
        mmr_lambda1_topk,
        MMR_LAMBDA1_SQL,
        ("similarity", "oracle-companion"),
        doc="MMR at lambda=1 == exact cosine top-k (degenerate oracle).",
    ),
    QuerySpec(
        "simhash_md5_signatures",
        simhash_md5_signatures,
        SIMHASH_MD5_SQL,
        ("dedup", "sketch", "oracle-companion"),
        doc="SimHash vote/fold math over md5 bits (companion to "
        "simhash_dedup_groups, whose xxhash bits are the only "
        "non-SQL part).",
    ),
    QuerySpec(
        "hll_registers_md5",
        hll_registers_md5,
        HLL_REGISTERS_SQL,
        ("sketch", "oracle-companion"),
        doc="HLL register computation over md5 hashes (companion to "
        "hll_cardinality_sketch; the estimate is a driver-side "
        "function of these registers).",
    ),
]
