"""Fleet-wide physical-plan lint — the 100 TB guardrails, enforced for
EVERY batch query in the registry (not just the hand-picked plan-shape
tests):

* no CartesianProduct, ever — at scale that's corpus² rows;
* BroadcastNestedLoopJoin only where one side is O(1)/query-set-sized
  by construction (whitelisted per query, reviewed);
* every lineitem parquet scan is column-pruned (the fact table is the
  100 TB side; reading all 9 columns for a 3-column query means the
  scan isn't projection-pruned).

Streaming queries are excluded (calling them executes a stream; their
stateful plans are exercised in parity/resilience tests).
"""

from __future__ import annotations

import re

import pytest

from burla_spark.plans.registry import all_specs

# Reviewed BNLJ uses — in each, the broadcast side is tiny BY
# CONSTRUCTION (a 1-row scalar aggregate, a handful of query vectors, a
# fixed band/grid dimension), so the nested loop is the optimal plan:
BNLJ_OK = {
    "range_join_price_bands",  # fixed price-band dim (theta join)
    "cross_join_matrix",  # deliberate small cross join
    "q11_important_stock",  # 1-row scalar-subquery threshold broadcast
    "events_resample_gapfill",  # 1-row (min,max) grid bounds broadcast
    "embedding_cosine_topk",  # 5 query vectors × corpus (exact baseline)
    "embedding_ivf_topk",  # query set × centroid set (both small)
    "class_weights",  # 1-row total-count broadcast join-back
    "q22_idle_customers",  # 1-row global-avg-balance broadcast
    "q15_top_supplier",  # 1-row max-revenue broadcast
    "bm25_scores",  # 1-row (n_docs, avgdl) corpus-stats broadcast
    "rrf_hybrid_retrieval",  # 1-row quantized query vector broadcast
    # (+ inherits bm25_scores' 1-row stats broadcast on its sparse arm)
    "unigram_logprob_scores",  # 1-row total-token-count broadcast
    "temperature_mixture_weights",  # 1-row (tok_total, z) normalizer broadcast
    "embedding_pq_topk",  # query-set LUT broadcast × codes scan (ADC contract)
    "embedding_ivfpq_topk",  # query set × centroid set probe ranking (both small)
    "mmr_diversified_topk",  # 5 query vectors × corpus pool stage (exact baseline)
    "pagerank_fixed_point",  # 1-row node-count broadcast per iteration
    "sql_defined_functions",  # 3-row quantity-band table, theta (BETWEEN) join
    "equidepth_price_histogram",  # 9-row rank targets + 1-row bounds array broadcast
    # round-6 oracle companions (plans/ann_oracle.py): each broadcast
    # side is fixed-size by construction (bounded pair block, 64-row
    # codebook, 8 centroids, 5-query pool) — the exhaustive shapes
    # exist only to make the fuzzy operators' exact stages
    # DuckDB-checkable; production candidates come from the LSH/IVF
    # generators.
    "neardup_cosine_pairs_exact",
    "pq_fixed_codebook_topk",
    "kmeans_assign_fixed_centroids",
    "mmr_lambda1_topk",
    "lsh_fixed_planes_buckets",  # 8-row fixed plane set broadcast
    # round-7 mixing family (plans/mixing.py): every broadcast side is
    # fixed-size by construction — a 3-row epoch dimension, a 1-row
    # weight normalizer, and 2-row rank targets / 1-row bounds array
    # (the equidepth pattern).
    "epoch_batch_shuffle",
    "token_budget_epoch_plan",
    "curriculum_length_phases",
    "heavy_hitter_bigrams",  # 1-row total-gram-count broadcast (threshold)
    # round-7 semantic family: 8-row pinned-centroid broadcast for the
    # assignment pass (the kmeans_assign_fixed_centroids kernel); the
    # in-cluster pair stage below it is a keyed equi-join.
    "semdedup_prune",
    # 50-query broadcast x corpus scan with a label!= theta filter —
    # the exact-verify tier (production feeds ANN candidates instead).
    "hard_negative_mining",
    # two 1-row broadcasts: the id cut and the (t_base, t_delta) totals
    "chisq_drift_report",
    # two 1-row broadcasts: raw-corpus totals (nr, fall) and target
    # total (nt) joined onto the vocab-bounded feature-stats table
    "dsir_importance_weights",
    # the 'ALL' rollup row: 1-row merged-register estimate joined to a
    # 1-row grand-total on a literal key (Catalyst constant-folds the
    # equi-key away, leaving a 1x1 BNLJ)
    "hll_cardinality_sketch",
    # 1-row corpus-total broadcast onto the 6-row threshold stats
    "dedup_threshold_sweep",
    # composes embedding_cosine_topk + ivf/pq (all BNLJ_OK above):
    # each leg is the reviewed 5-query × corpus exact-verify shape
    "ann_recall_report",
    # two 1-row broadcasts (corpus total, in-component count) onto a
    # histogram bounded by the largest cluster size
    "dedup_cluster_size_histogram",
}

BATCH_SPECS = [s for s in all_specs() if not s.name.startswith("stream_")]

# Both parametrizations below inspect the same built DataFrame; some
# specs are plan-time expensive (KMeans fit, label propagation), so
# build each once per session instead of twice.
_DF_CACHE: dict = {}


def _built(spec, spark, sf_dir):
    if spec.name not in _DF_CACHE:
        _DF_CACHE[spec.name] = spec.spark(spark, sf_dir)
    return _DF_CACHE[spec.name]


@pytest.mark.parametrize("spec", BATCH_SPECS, ids=[s.name for s in BATCH_SPECS])
def test_plan_lint(spec, spark, sf_dir):
    plan = (
        _built(spec, spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan, f"{spec.name}: cartesian product"
    if "BroadcastNestedLoopJoin" in plan:
        assert spec.name in BNLJ_OK, (
            f"{spec.name}: unreviewed BroadcastNestedLoopJoin — broadcast "
            "side must be provably tiny; add to BNLJ_OK with a comment "
            "or rewrite as an equi/range join"
        )
    for m in re.finditer(r"FileScan parquet \[([^\]]*)\][^\n]*lineitem", plan):
        n_cols = m.group(1).count(",") + 1 if m.group(1) else 0
        assert n_cols < 9, (
            f"{spec.name}: lineitem scan reads all {n_cols} columns — "
            "projection not pruned"
        )


@pytest.mark.parametrize("spec", BATCH_SPECS, ids=[s.name for s in BATCH_SPECS])
def test_output_schema_atomic(spec, spark, sf_dir):
    """Driver-canon contract: every registry query's output columns must
    be atomic (no array/map/struct) — the driver's canonicalizer
    sort_values-es the pandas frame and array cells are unhashable.
    Serialize complex outputs at the query edge (array_join / to_json)
    with the mirrored DuckDB expression (ENGINEERING_NOTES rule 10)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    schema = _built(spec, spark, sf_dir).schema
    bad = [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, (
        f"{spec.name}: non-atomic output columns {bad} — stringify at the "
        "query edge (array_join/to_json) so the driver canon can hash them"
    )


# Reviewed explicit-broadcast uses whose hinted side READS A FACT-SCALED
# TABLE (customer/part/supplier/orders/lineitem — all grow with scale
# factor; at ~100 TB part alone is ~20 B rows, so a verbatim broadcast
# hint on one of them overrides Spark's size threshold and forces an
# executor OOM). An entry here must be bounded BY CONSTRUCTION despite
# scanning a fact table — in practice a global (groupBy-less) aggregate
# or a LIMIT, never the raw relation:
BROADCAST_FACT_OK: dict[str, str] = {
    "q11_important_stock": "1-row global threshold aggregate",
    "q15_top_supplier": "1-row max(total_revenue) aggregate",
    "q22_idle_customers": "1-row global avg(acctbal) aggregate",
    # bounded by the grouping key, not the fact table: TPC-H has a
    # FIXED set of 5 order priorities at every scale factor, so the
    # broadcast side is <=5 rows at 100 TB. (Surfaced when the round-11
    # detector fix stopped auto-accepting grouped aggregates.)
    "feature_zscore": "per-o_orderpriority moments — 5 groups at any SF",
    "target_encoding_loo": "per-o_orderpriority sums — 5 groups at any SF",
    "winsorize_quantity_stats": (
        "per-l_linestatus percentile bands — l_linestatus has a fixed "
        "2-value domain (O/F) at any SF"
    ),
    "cms_frequency_sketch": (
        "the broadcast side is the count-min sketch itself — grouped "
        "by (hash row, counter index), bounded at d*w = 1024 rows by "
        "construction at any SF"
    ),
}

_HINT_RE = re.compile(r"ResolvedHint \(strategy=broadcast\)")
_FACT_COL_RE = re.compile(
    r"\b(c_custkey|p_partkey|s_suppkey|o_orderkey|l_orderkey)#\d+"
)
def _is_global_aggregate(content: str) -> bool:
    """True only for a groupBy-LESS Aggregate node. Grouped aggregates
    print as ``Aggregate [keys...], [outputs...]`` — two top-level
    bracket lists — while a 1-row global aggregate prints a single
    list. A prefix regex can't tell them apart (both start
    ``Aggregate [<lowercase>``), so bracket-match the first list and
    check whether a second follows."""
    if not content.startswith("Aggregate ["):
        return False
    depth = 0
    for i in range(len("Aggregate "), len(content)):
        c = content[i]
        if c == "[":
            depth += 1
        elif c == "]":
            depth -= 1
            if depth == 0:
                return not content[i + 1:].lstrip().startswith(", [")
    return False  # unbalanced line — treat as not bounding


def _content_start(line: str) -> int:
    i = 0
    while i < len(line) and line[i] in " :+-":
        i += 1
    return i


def _broadcast_fact_hints(plan: str) -> list[str]:
    """Return the subtree text of every broadcast hint whose hinted side
    scans a fact-scaled TPC-H table WITHOUT a bounding global aggregate
    between the hint and the scan."""
    lines = plan.splitlines()
    bad = []
    for i, line in enumerate(lines):
        if not _HINT_RE.search(line):
            continue
        depth = _content_start(line)
        sub = []
        for nxt in lines[i + 1:]:
            if _content_start(nxt) <= depth:
                break
            sub.append(nxt)
        subtree = "\n".join(sub)
        if _FACT_COL_RE.search(subtree):
            # a groupBy-less Aggregate anywhere under the hint bounds
            # the broadcast side to one row regardless of fact size
            bounded = any(
                _is_global_aggregate(s[_content_start(s):]) for s in sub
            )
            if not bounded:
                bad.append(subtree[:400])
    return bad


@pytest.mark.parametrize("spec", BATCH_SPECS, ids=[s.name for s in BATCH_SPECS])
def test_no_fact_scaled_broadcast_hints(spec, spark, sf_dir):
    """Round-10 rule (VERDICT r09 'What's wrong #3'): an explicit
    F.broadcast on a relation derived from customer/part/supplier/
    orders/lineitem pins the plan to a broadcast join at EVERY scale —
    at 100 TB that's an OOM, not an optimization. Drop the hint and let
    AQE broadcast below threshold at runtime. Bounded exceptions
    (1-row global aggregates) are auto-detected; anything else needs a
    reviewed BROADCAST_FACT_OK entry."""
    plan = _built(spec, spark, sf_dir)._jdf.queryExecution().analyzed().toString()
    offenders = _broadcast_fact_hints(plan)
    if offenders:
        assert spec.name in BROADCAST_FACT_OK, (
            f"{spec.name}: explicit broadcast hint over a fact-scaled "
            f"table (first offender subtree):\n{offenders[0]}\n"
            "Drop the hint (AQE auto-broadcasts small sides) or add a "
            "bounded-by-construction BROADCAST_FACT_OK entry."
        )


def test_global_aggregate_detector_rejects_grouped():
    """ADVICE r10: the old prefix regex (^Aggregate \\[[a-z]) matched
    GROUPED aggregates too, so a broadcast hint over a fact-keyed
    groupBy — fact-cardinality at 100 TB, the exact OOM the rule
    targets — was silently auto-accepted as '1-row bounded'."""
    assert _is_global_aggregate("Aggregate [sum(l_quantity#3) AS s#9]")
    assert _is_global_aggregate(
        "Aggregate [max(total_revenue#12) AS max(total_revenue)#30]"
    )
    # the exploit: grouped aggregate, fact-cardinality output
    assert not _is_global_aggregate(
        "Aggregate [l_partkey#1L], [l_partkey#1L, sum(l_quantity#3) AS s#9]"
    )
    assert not _is_global_aggregate(
        "Aggregate [c_custkey#0, c_name#1], [c_custkey#0, count(1) AS n#8L]"
    )
    # nested brackets inside the grouping list must not fool the matcher
    assert not _is_global_aggregate(
        "Aggregate [coalesce(a#1, b[0]#2)], [coalesce(a#1, b[0]#2), count(1) AS n#9L]"
    )
    assert not _is_global_aggregate("Project [a#1]")


def test_driver_priority_names_resolve():
    """Every _DRIVER_PRIORITY entry must name a registry spec — a typo
    or a renamed spec would silently drop the re-adjudication the
    rotation exists to force (the round-9 ledger hole)."""
    from burla_spark.plans.registry import _DRIVER_PRIORITY

    names = {s.name for s in all_specs()}
    missing = _DRIVER_PRIORITY - names
    assert not missing, f"stale _DRIVER_PRIORITY entries: {sorted(missing)}"


def test_measure_predicate_pushes_to_parquet_scan(spark, sf_dir):
    """Round-10 (VERDICT r09 item 5): measure-column predicates must
    reach the parquet scan as PushedFilters. The read-side ingest gate
    used to interpose a CASE projection that blocked pushdown on every
    gated measure; load_table now serves write-side VALIDATED copies
    (sources/tables.py) so the scan itself is filterable — at 100 TB
    that's the difference between row-group pruning and a full read."""
    import pyspark.sql.functions as F

    from burla_spark.sources.tables import load_table

    df = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") < 10.0)
    plan = df._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m and "l_quantity" in m.group(1), (
        f"l_quantity predicate did not reach the scan: "
        f"PushedFilters={m.group(1) if m else None}"
    )
    # and the stream/sweep path still gates read-side
    ev = load_table(spark, sf_dir, "events").filter(F.col("value") > 0.0)
    evplan = ev._jdf.queryExecution().executedPlan().toString()
    m2 = re.search(r"PushedFilters: \[([^\]]*)\]", evplan)
    assert m2 and "value" in m2.group(1)


# Reviewed GLOBAL (empty-partition) windows: each runs over a BOUNDED
# intermediate, never the raw fact table, so the single reducer sees a
# capped row count by construction:
GLOBAL_WINDOW_OK = {
    "equidepth_price_histogram",  # cum-hist over DISTINCT cent values (bounded domain)
    "recursive_month_spine",  # generated month spine (dozens of rows)
    "window_distribution",  # cume_dist/percent_rank demo over a filtered slice
    "unpivot_measures",  # long-format reshape of a 1-row aggregate
    "q13_count_distribution",  # distribution over distinct order counts (bounded)
    "error_rate_spikes",  # trailing-mean frame over 10-min BUCKETED counts (O(time-range))
    "curriculum_length_phases",  # cum-hist over DISTINCT token lengths (bounded domain)
    "rrf_hybrid_retrieval",  # row_number over the two LIMIT-100 retriever lists
}

_GLOBAL_WINDOW_RE = re.compile(
    r"windowspecdefinition\(\s*[a-zA-Z_#0-9]+(?:#\d+)?L?\s+(?:ASC|DESC)"
)


@pytest.mark.parametrize("spec", BATCH_SPECS, ids=[s.name for s in BATCH_SPECS])
def test_no_unreviewed_global_windows(spec, spark, sf_dir):
    """A window with an EMPTY partition spec collapses the whole input
    onto one task — the classic 100 TB killer (the reason the
    equi-depth histogram avoids a global ntile). Every global window
    in the fleet must be reviewed: either the windowed input is
    bounded by construction (GLOBAL_WINDOW_OK) or the plan should
    partition the window."""
    plan = (
        _built(spec, spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    )
    if _GLOBAL_WINDOW_RE.search(plan):
        assert spec.name in GLOBAL_WINDOW_OK, (
            f"{spec.name}: window with empty partition spec (single-task "
            "sort at scale) — partition it, or add to GLOBAL_WINDOW_OK "
            "with a bounded-input justification"
        )
