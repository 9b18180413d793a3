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


# ---------------------------------------------------------------------------
# Deterministic Lloyd's (driver-adjudication mode, round 11): fixed
# seeding + a fixed iteration count + engine-stable rounding make the
# WHOLE training loop replayable by an external SQL oracle — closing
# the kmeans_cluster_sizes no-oracle ledger row. MLlib's kmeans_assign
# above stays the production path (kmeans++ init, convergence stop).
# ---------------------------------------------------------------------------
def _assign_literal_centroids(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    cents: list[tuple[int, list[float]]],
    keep_vec: bool = False,
) -> DataFrame:
    """Nearest-centroid assignment against LITERAL centroids: squared
    L2 on the ROUNDED (6 dp) distance, ties to the smaller cluster id —
    the ULP-stability rule every ann_oracle companion uses (the two
    engines' float accumulation orders are unspecified). The argmin is
    one array_min over (rounded_d2, cluster_id) structs — lexicographic
    struct ordering IS the tiebreak. Centroids broadcast as plan
    literals; one corpus scan, no shuffle until the caller aggregates."""
    def d2(cvec: list[float]):
        return F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.lit(cvec),
                lambda x, c: (x.cast("double") - c) * (x.cast("double") - c),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    best = F.array_min(
        F.array(
            *[
                F.struct(
                    F.round(d2(cvec), 6).alias("d"),
                    F.lit(cid).cast("long").alias("c"),
                )
                for cid, cvec in cents
            ]
        )
    )
    cols = [F.col(id_col), best["c"].alias("cluster"), best["d"].alias("d2")]
    if keep_vec:
        cols.append(F.col(vec_col))
    return df.select(*cols)


def kmeans_lloyd_fixed(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    n_iter: int = 3,
) -> DataFrame:
    """Deterministic distributed Lloyd's: seeds = the k smallest-id
    vectors, exactly ``n_iter`` (assign → mean-update) rounds, final
    assignment against the last centroids. Cluster labels are the seed
    ids. Returns (id, cluster, d2); see
    :func:`kmeans_lloyd_fixed_centroids` for the training half (the
    build-once artifact a caller can cache)."""
    e = df.filter(F.col(id_col).isNotNull() & F.col(vec_col).isNotNull())
    cents = kmeans_lloyd_fixed_centroids(df, id_col, vec_col, k, n_iter)
    if not cents:
        id_type = dict(df.dtypes)[id_col]
        return df.sparkSession.createDataFrame(
            [], f"{id_col} {id_type}, cluster long, d2 double"
        )
    return _assign_literal_centroids(e, id_col, vec_col, cents)


def kmeans_lloyd_fixed_centroids(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    n_iter: int = 3,
) -> list[tuple[int, list[float]]]:
    """The TRAINING half of the deterministic Lloyd's: seeds = the k
    smallest-id vectors, exactly ``n_iter`` (assign → mean-update)
    rounds; returns the final (cluster_id, centroid) list — plain
    driver-side data a caller can cache per corpus (training is a
    build-once indexing job; only the final assignment belongs in the
    query path). Centroid means round to 6 dp each round so engine and
    oracle re-synchronize per iteration; a cluster that loses all
    members is dropped (no reseeding — determinism over quality; the
    production path is MLlib ``kmeans_assign``).

    100 TB shape: centroids ride the plan as literals (k·dim doubles);
    each round is ONE corpus scan + a k-row aggregate (per-dim avg with
    map-side partials — MLlib's own shape); the per-round driver read
    is k·dim doubles, the same bounded-probe contract as the BPE merge
    loop."""
    e = df.filter(F.col(id_col).isNotNull() & F.col(vec_col).isNotNull())
    seeds = (
        e.orderBy(id_col).limit(k).select(F.col(id_col), F.col(vec_col)).collect()
    )
    if not seeds:
        return []
    dim = len(seeds[0][1])
    cents = [(int(r[0]), [float(x) for x in r[1]]) for r in seeds]
    for _ in range(n_iter):
        # assignment is a pure projection — carry the vector through it
        # so the mean-update is scan → map-side-partial agg, no join
        assigned = _assign_literal_centroids(
            e.select(id_col, vec_col), id_col, vec_col, cents, keep_vec=True
        )
        rows = (
            assigned.groupBy("cluster")
            .agg(
                *[
                    F.round(F.avg(F.col(vec_col)[i].cast("double")), 6).alias(
                        f"c{i}"
                    )
                    for i in range(dim)
                ]
            )
            .collect()
        )
        cents = sorted(
            (int(r["cluster"]), [r[f"c{i}"] for i in range(dim)]) for r in rows
        )
    return cents


def kmeans_lloyd_fixed_sql(
    table: str,
    id_col: str,
    vec_col: str,
    k: int,
    dim: int,
    n_iter: int = 3,
) -> str:
    """DuckDB replay of :func:`kmeans_lloyd_fixed` — the iteration
    unroll is GENERATED so engine and oracle can't drift on the loop
    structure, only share it."""
    e = (
        f"(SELECT {id_col}, {vec_col} FROM {table} "
        f"WHERE {id_col} IS NOT NULL AND {vec_col} IS NOT NULL)"
    )
    parts = [
        f"i(i) AS (SELECT UNNEST(generate_series(1, {dim})))",
        (
            "cents0 AS (\n"
            f"  SELECT s.{id_col} AS cluster, i.i,\n"
            f"         CAST(s.{vec_col}[i.i] AS DOUBLE) AS c\n"
            f"  FROM (SELECT * FROM {e} t\n"
            f"        QUALIFY ROW_NUMBER() OVER (ORDER BY {id_col}) <= {k}) s, i\n"
            ")"
        ),
    ]
    for t in range(1, n_iter + 1):
        parts.append(
            f"assign{t} AS (\n"
            f"  SELECT v.{id_col}, c.cluster,\n"
            f"    SUM((CAST(v.{vec_col}[c.i] AS DOUBLE) - c.c)\n"
            f"        * (CAST(v.{vec_col}[c.i] AS DOUBLE) - c.c)) AS d2\n"
            f"  FROM {e} v, cents{t - 1} c\n"
            f"  GROUP BY 1, 2\n"
            f"  QUALIFY ROW_NUMBER() OVER (PARTITION BY v.{id_col}\n"
            f"                             ORDER BY ROUND(d2, 6), c.cluster) = 1\n"
            ")"
        )
        parts.append(
            f"cents{t} AS (\n"
            f"  SELECT a.cluster, i.i,\n"
            f"         ROUND(AVG(CAST(v.{vec_col}[i.i] AS DOUBLE)), 6) AS c\n"
            f"  FROM assign{t} a JOIN {e} v USING ({id_col}), i\n"
            f"  GROUP BY 1, 2\n"
            ")"
        )
    parts.append(
        "final_assign AS (\n"
        f"  SELECT v.{id_col}, c.cluster,\n"
        f"    SUM((CAST(v.{vec_col}[c.i] AS DOUBLE) - c.c)\n"
        f"        * (CAST(v.{vec_col}[c.i] AS DOUBLE) - c.c)) AS d2\n"
        f"  FROM {e} v, cents{n_iter} c\n"
        f"  GROUP BY 1, 2\n"
        f"  QUALIFY ROW_NUMBER() OVER (PARTITION BY v.{id_col}\n"
        f"                             ORDER BY ROUND(d2, 6), c.cluster) = 1\n"
        ")"
    )
    return (
        "WITH " + ",\n".join(parts) + "\n"
        "SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_members\n"
        "FROM final_assign GROUP BY cluster ORDER BY cluster"
    )
