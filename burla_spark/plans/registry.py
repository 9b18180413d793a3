"""Central query registry — the single source the driver contract
(__spark_entry__.py), the test suite, and bench.py all read."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from burla_spark.plans.base import QuerySpec


def all_specs() -> list[QuerySpec]:
    # Imported lazily so a bug in one plan module doesn't take down the
    # whole registry at import time.
    from burla_spark.plans import (
        ann_oracle,
        complex_types,
        curation,
        llm,
        mixing,
        mlprep,
        quality_queries,
        relational,
        relational2,
        relational3,
        relational4,
        relational5,
        relational6,
        relational7,
        reshape,
        scale_ops,
        semantic,
        streaming_queries,
        timeseries,
        udf_surface,
    )

    layers: list[list[QuerySpec]] = [
        ann_oracle.SPECS,
        curation.SPECS,
        relational.SPECS,
        relational2.SPECS,
        relational3.SPECS,
        relational4.SPECS,
        relational5.SPECS,
        relational6.SPECS,
        relational7.SPECS,
        reshape.SPECS,
        scale_ops.SPECS,
        semantic.SPECS,
        complex_types.SPECS,
        timeseries.SPECS,
        llm.SPECS,
        mixing.SPECS,
        mlprep.SPECS,
        quality_queries.SPECS,
        streaming_queries.SPECS,
        udf_surface.SPECS,
    ]
    # Round-robin interleave across plan modules so ANY prefix of the
    # registry — the driver samples the first 50 specs for its
    # correctness scoreboard — spans every layer (relational,
    # timeseries, LLM/dedup/ANN, ML-prep, quality, streaming, UDF)
    # instead of only the relational modules that happen to sort first.
    specs: list[QuerySpec] = []
    longest = max(len(layer) for layer in layers)
    for i in range(longest):
        for layer in layers:
            if i < len(layer):
                specs.append(layer[i])
    # Stable-partition: front-load the specs that most need an external
    # driver verdict (rounds 1-3 sampled 81/130 — the driver takes the
    # first 50 each round): those never sampled, plus the two whose round-3
    # rows need re-greening (pivot_status_matrix oracle cast fix,
    # q9_profit_by_nation non-vacuous filter fix).  The interleave above is
    # preserved inside each partition, so the sampled prefix still spans
    # every layer.
    specs = [s for s in specs if s.name in _DRIVER_PRIORITY] + [
        s for s in specs if s.name not in _DRIVER_PRIORITY
    ]
    names = [s.name for s in specs]
    assert len(names) == len(set(names)), "duplicate query names in registry"
    return specs


# Round-14 rotation (VERDICT r12 #6 discipline: every spec whose
# engine or oracle changed this round front-loads into the driver's
# 50-slot sample).
_DRIVER_PRIORITY = frozenset(
    {
        # round-14 NEW operators — first-ever driver adjudication
        "crossmodal_dup_components",  # 4-modality dup adjudication table
        "crossmodal_dup_summary",  # per-component triage rollup
        "incremental_hamming_neardup",  # batch-vs-persisted-index near-dup
        "image_dhash_neardup_scanned",  # parquet BinaryType round-trip
        # oracle/fixture changed: URL canonicalizer hardened (first-://
        # split, first-? query, percent-encoding normalization; the
        # dedup fixture grew two percent-encoded variants and the
        # domain-cap fixture an embedded-redirect query)
        "url_canonical_dedup", "domain_frequency_cap",
        # engine changed: prefix-filter candidates now carry (source,
        # band) through the verify join (ADVICE r13) — re-green the
        # pair table and every spec built on it
        "ngram_jaccard_pairs", "dedup_components_exact",
        "cross_source_dup_matrix", "split_leakage_audit",
        "dedup_threshold_sweep",
        # engine changed: modality pair tables now session-cached
        # (build-once artifact contract) — re-green all three
        "image_dhash_neardup", "audio_fingerprint_neardup",
        "video_fingerprint_neardup",
    }
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {s.name: s.spark for s in all_specs()}


def oracle_sql() -> dict[str, str]:
    # Every oracle is wrapped with the ingest-domain CTEs so DuckDB
    # reads exactly what load_table serves Spark (sources/tables.py:
    # out-of-domain measures nulled, degenerate embeddings excluded).
    # On clean fixtures the CTEs are identity projections.
    from burla_spark.sources.tables import with_ingest_cte

    return {
        s.name: with_ingest_cte(s.oracle)
        for s in all_specs()
        if s.oracle is not None
    }
