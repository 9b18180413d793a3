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


# Round-7 rotation: all of round 6's 50 sampled rows came back green
# (CORRECTNESS_r06 — zero red, zero errors), so the priority set is
# exactly the rows round 7 ADDED or CHANGED and the driver must
# adjudicate: session 1's mixing/graph/sketch/layout specs and
# rounded-rank rewrites, plus session 2's semantic-curation family,
# sketch-math companions, seasonal/sequence-mining/hard-negative specs,
# and the two oracle rewrites (prefix-filter per-doc gram merge, EWMA
# ascending-last selection). The driver's 50-slot sample fills the
# rest from the layer-interleaved rotation remainder.
_DRIVER_PRIORITY = frozenset(
    {
        # round-7 ULP-stable rounded-rank rewrite (plans/ann_oracle.py)
        "pq_fixed_codebook_topk", "kmeans_assign_fixed_centroids",
        # round-7 new mixing family (plans/mixing.py)
        "epoch_batch_shuffle", "token_budget_epoch_plan",
        "curriculum_length_phases",
        # round-7 stream-join matrix completion
        "stream_full_outer_join",
        # round-7 oracle companion (LSH bucketing with fixed planes)
        "lsh_fixed_planes_buckets",
        # round-7 ingest/tokenizer ops
        "incremental_dedup_new_docs", "oov_rate_by_source",
        # green row whose SQL the rule-1 normalizer sweep changed
        "temperature_mixture_weights",
        # round-7 layout/catalog ops
        "compaction_bins_by_source", "table_column_stats",
        # round-7 graph/sketch/incremental/timeseries additions
        "triangle_counts_part_graph", "heavy_hitter_bigrams",
        "ewma_event_values", "incremental_agg_maintenance",
        # round-7 semantic-curation family (plans/semantic.py)
        "semdedup_prune", "winnowing_fingerprints",
        "winnowing_contamination_pairs", "bpe_train_merges",
        "editdist_neardup_pairs",
        # round-7 sketch-math oracle companions (plans/ann_oracle.py)
        "simhash_md5_signatures", "hll_registers_md5",
        "bpe_encode_token_stats", "distinct_ngram_diversity",
        "seasonal_hourly_profile",
        # round-7 session-2 oracle rewrites the driver must re-adjudicate
        "similarity_join_prefix_filter",
        "frequent_event_sequences", "hard_negative_mining",
        "chisq_drift_report",
        # round-7 NULL-join-key fixes (both engine sides changed)
        "events_asof_join", "sequence_packing", "source_frequency_cap",
    }
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {s.name: s.spark for s in all_specs()}


def oracle_sql() -> dict[str, str]:
    return {s.name: s.oracle for s in all_specs() if s.oracle is not None}
