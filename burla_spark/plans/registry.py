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
        complex_types,
        curation,
        llm,
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
        streaming_queries,
        timeseries,
        udf_surface,
    )

    layers: list[list[QuerySpec]] = [
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
        complex_types.SPECS,
        timeseries.SPECS,
        llm.SPECS,
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


# Round-5 rotation, recomputed from CORRECTNESS_r0{1..4}.json: the 24
# specs with no driver row through r04 (closing cumulative coverage at
# 153/153), plus the 6 r04 hash-fail rows whose oracle SQL was fixed
# this round (uncast HUGEINT aggregates -> CAST AS BIGINT) and need a
# fresh driver verdict.  30 priority slots; the driver's 50-slot sample
# fills the rest from the layer-interleaved remainder.
_DRIVER_PRIORITY = frozenset(
    {
        # never sampled r01-r04
        "sql_defined_functions", "stream_timer_sessions",
        "stream_left_outer_join", "pagerank_fixed_point",
        "stream_upsert_user_totals", "temperature_mixture_weights",
        "funnel_conversion", "winsorize_quantity_stats", "cohort_retention",
        "target_encoding_loo", "error_rate_spikes", "weighted_sample_orders",
        "sequence_pattern_match", "embedding_pq_topk",
        "event_transition_matrix", "corpus_curation_pipeline",
        "sequence_packing", "bm25_scores", "decontamination_overlap",
        "unigram_logprob_scores", "bigram_logprob_scores", "pii_redaction",
        "chunk_documents_overlap", "compression_ratio_scores",
        # r04 hash-fail rows re-greened by the oracle BIGINT casts
        "variant_json_agg", "events_sessionize", "process_aggregate_predict",
        "try_arithmetic_nullsafe", "text_token_stats",
        "multimodal_blob_metadata",
        # round-5 additions (plans/curation.py) — never sampled yet
        "gopher_repetition_filters", "burst_first_events",
        "robust_mad_outliers", "equidepth_price_histogram",
        "zorder_clustered_layout", "repeated_ngram_coverage",
        "embedding_ivfpq_topk", "mmr_diversified_topk",
        "stream_static_enrich", "cdc_latest_state",
    }
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {s.name: s.spark for s in all_specs()}


def oracle_sql() -> dict[str, str]:
    return {s.name: s.oracle for s in all_specs() if s.oracle is not None}
