"""Similarity search over embedding columns (SURVEY.md §2.C).

Two tiers:
* ``cosine_topk`` — exact brute-force top-k. The query set broadcasts;
  the corpus streams through one codegen'd projection + per-query
  top-k (window row_number). Right-sized when |queries| is small —
  the corpus is scanned once regardless of corpus size.
* ``lsh_bucketed_topk`` — the scale path: random-hyperplane LSH maps
  every vector to a signature; candidates come from an equi-join on
  (plane-bucket) instead of a cross product, then exact re-rank.
  Deterministic projections (seeded per plane via xxhash64) keep
  results reproducible across runs and cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from burla_spark.functions.vectors import cosine_similarity


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    query_vec: str,
    corpus_vec: str,
    k: int = 10,
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    Output: (query_id, neighbor_id, rank, sim). Rank has a unique total
    order (sim desc, neighbor id asc)."""
    q = queries.select(
        F.col(query_id).alias("query_id"), F.col(query_vec).alias("__qvec")
    )
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"), F.col(corpus_vec).alias("__cvec")
    )
    pairs = c.crossJoin(F.broadcast(q))
    if exclude_self:
        pairs = pairs.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        cosine_similarity(F.col("__qvec"), F.col("__cvec")).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 6).alias("sim"))
    )


def _hyperplane_sign_bits(vec, num_planes: int, table: int = 0) -> "F.Column":
    """LSH signature: sign of <v, h_p> for deterministic pseudo-random
    hyperplanes. h_p[i] = ±1 derived from xxhash64(i, p, table) —
    generated JVM-side, no materialized plane matrix to broadcast."""
    def plane_dot(p: int):
        return F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.size(vec) - 1),
                lambda x, i: F.when(
                    F.xxhash64(i, F.lit(p), F.lit(table)).bitwiseAND(F.lit(1)) == 1,
                    x.cast("double"),
                ).otherwise(-x.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    bits = [
        F.when(plane_dot(p) > 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(
            F.lit(0).cast("long")
        )
        for p in range(num_planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def _lsh_buckets(vec, num_planes: int, num_tables: int) -> "F.Column":
    """Array of (table, bucket) structs — multi-table LSH: a pair is a
    candidate if ANY table buckets them together (recall compounds as
    1-(1-p^k)^L while bucket sizes stay selective)."""
    return F.array(
        *[
            F.struct(
                F.lit(t).alias("table"),
                _hyperplane_sign_bits(vec, num_planes, t).alias("bucket"),
            )
            for t in range(num_tables)
        ]
    )


def lsh_bucketed_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    query_vec: str,
    corpus_vec: str,
    k: int = 10,
    num_planes: int = 4,
    num_tables: int = 8,
) -> DataFrame:
    """Approximate top-k: candidates share a (table, bucket) LSH key
    with the query in ANY of num_tables independent plane sets (equi-
    join on the key — shuffle-friendly, never a cross product), then
    exact cosine re-rank.

    Tuning: recall ≈ 1-(1-p^num_planes)^num_tables (p = collision
    probability per plane); raise num_tables for recall, num_planes
    for selectivity."""
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(query_vec).alias("__qvec"),
        F.explode(_lsh_buckets(F.col(query_vec), num_planes, num_tables)).alias("tb"),
    )
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"),
        F.col(corpus_vec).alias("__cvec"),
        F.explode(_lsh_buckets(F.col(corpus_vec), num_planes, num_tables)).alias("tb"),
    )
    pairs = (
        c.join(q, c["tb"] == q["tb"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "__qvec", "__cvec")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        cosine_similarity(F.col("__qvec"), F.col("__cvec")).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 6).alias("sim"))
    )


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    num_planes: int = 8,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH bucketing + exact
    verify — the embedding analogue of MinHash dedup."""
    sig = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(vec_col).alias("__vec"),
        _hyperplane_sign_bits(F.col(vec_col), num_planes).alias("bucket"),
    )
    l, r = sig.alias("l"), sig.alias("r")
    return (
        l.join(
            r,
            (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("id_a"),
            F.col("r.doc_id").alias("id_b"),
            cosine_similarity(F.col("l.__vec"), F.col("r.__vec")).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", F.round("sim", 6).alias("sim"))
    )
