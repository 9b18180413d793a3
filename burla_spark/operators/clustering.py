"""Clustering over embedding columns (SURVEY.md §2.C — the reference's
arXiv KMeans example, README.md:153) via MLlib.

MLlib KMeans is the distributed path: init + Lloyd iterations run as
Spark jobs, so the same call handles 10^9 vectors. Seeded for
reproducibility (exact assignments can still vary with partitioning —
assignments are quality-tested against label ground truth, not
hash-compared).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kmeans_assign(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    seed: int = 42,
    max_iter: int = 20,
) -> DataFrame:
    """Fit KMeans and return (id, cluster) assignments."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = df.select(
        F.col(id_col),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    model = KMeans(k=k, seed=seed, maxIter=max_iter).fit(feats)
    return model.transform(feats).select(
        F.col(id_col), F.col("prediction").cast("long").alias("cluster")
    )


def cluster_sizes(assignments: DataFrame) -> DataFrame:
    return (
        assignments.groupBy("cluster")
        .agg(F.count("*").alias("n_members"))
        .orderBy("cluster")
    )
