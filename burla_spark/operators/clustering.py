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

    # NULL vectors cannot be assigned (array_to_vector aborts on null)
    feats = df.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    # degrade gracefully on small/filtered inputs: MLlib aborts when
    # the data has fewer rows than k. One metadata-cheap count guards
    # it; n == 0 returns an empty, correctly-typed assignment table.
    n = feats.count()
    if n == 0:
        id_type = dict(df.dtypes)[id_col]
        return df.sparkSession.createDataFrame(
            [], f"{id_col} {id_type}, cluster long"
        )
    try:
        model = KMeans(k=min(k, n), seed=seed, maxIter=max_iter).fit(feats)
    except Exception:  # noqa: BLE001 — degenerate input, not config
        # MLlib also aborts when DISTINCT points < k; only this
        # degraded path pays for the distinct count.
        k2 = max(1, min(k, feats.select("features").distinct().count()))
        model = KMeans(k=k2, seed=seed, maxIter=max_iter).fit(feats)
    return model.transform(feats).select(
        F.col(id_col), F.col("prediction").cast("long").alias("cluster")
    )


def cluster_sizes(assignments: DataFrame) -> DataFrame:
    return (
        assignments.groupBy("cluster")
        .agg(F.count("*").alias("n_members"))
        .orderBy("cluster")
    )
