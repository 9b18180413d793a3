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


# Round-10 rotation: everything the engine OR oracle changed in
# rounds 9-10 that the driver has not yet adjudicated. The round-9
# lang-ID fix (operators/text.py one-arg closure + whole-token oracle
# rewrite) never made the round-9 sample; the round-10 unicode-sweep
# fixes changed both sides of the edit-distance and multimodal
# contracts; the broadcast-hint removals changed 13 TPC-H plans
# (same rows expected — adjudication proves it); the pushdown-fixture
# change rewires load_table for every lineitem consumer. The driver's
# 50-slot sample fills the rest from the layer-interleaved rotation
# remainder.
_DRIVER_PRIORITY = frozenset(
    {
        # round-9 lang fix — engine + both oracles changed, never sampled
        "lang_id_heuristic", "corpus_curation_pipeline",
        # round-10 unicode-contract fixes (both engine sides changed)
        "editdist_neardup_pairs", "multimodal_feature_extract",
        # round-10 fact-scaled broadcast-hint removals (plan change,
        # same rows expected)
        "q2_min_cost_supplier", "q3_shipping_priority",
        "q5_local_supplier_volume", "q7_volume_shipping", "q8_market_share",
        "q9_profit_by_nation", "q14_promo_share", "q15_top_supplier",
        "q16_supplier_part_counts", "q17_small_quantity", "q18_large_orders",
        "q19_disjunctive_filter", "q20_heavy_shippers",
        # round-10 pushdown-fixture rewire: one heavy representative
        # per rewired fact table
        "q1_pricing_summary", "q6_forecast_revenue",
        # round-10 NEW operators — first driver adjudication
        "dsir_importance_weights", "char_entropy_report",
        "zipf_slope_by_source",
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
