"""Property-based tests (hypothesis) — the reference has no
property-based coverage (SURVEY §5); these pin the custom operators'
semantics against independent reference implementations on random
inputs.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from burla_spark.operators.asof import asof_join
from burla_spark.operators.skew import salted_aggregate

SLOW = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@st.composite
def asof_case(draw):
    n_keys = draw(st.integers(1, 3))
    left = draw(
        st.lists(
            st.tuples(st.integers(0, n_keys - 1), st.integers(0, 1000)),
            min_size=1, max_size=25,
        )
    )
    right = draw(
        st.lists(
            st.tuples(st.integers(0, n_keys - 1), st.integers(0, 1000)),
            min_size=1, max_size=25,
        )
    )
    # unique (key, ts) on the right so the match is well-defined
    right = list({(k, t) for k, t in right})
    return left, right


@given(asof_case())
@SLOW
def test_asof_join_matches_pandas_merge_asof(spark, case):
    left_rows, right_rows = case
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left_rows)], "k long, lt long, lid long"
    ).select("k", F.timestamp_seconds("lt").alias("lt"), "lid")
    rdf = spark.createDataFrame(
        [(k, t, t * 10 + k) for (k, t) in right_rows], "k long, rt long, rv long"
    ).select("k", F.timestamp_seconds("rt").alias("rt"), "rv")

    got = {
        (r.lid): r.rv
        for r in asof_join(
            ldf, rdf, on="k", left_ts="lt", right_ts="rt", right_cols=("rv",)
        ).collect()
    }

    lp = pd.DataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left_rows)], columns=["k", "t", "lid"]
    ).sort_values("t", kind="mergesort")
    rp = pd.DataFrame(
        [(k, t, t * 10 + k) for (k, t) in right_rows], columns=["k", "t", "rv"]
    ).sort_values("t", kind="mergesort")
    expected_df = pd.merge_asof(lp, rp, on="t", by="k", direction="backward")
    expected = {
        int(row.lid): (None if pd.isna(row.rv) else int(row.rv))
        for row in expected_df.itertuples()
    }
    assert got == expected


@given(
    st.lists(
        st.tuples(st.integers(0, 4), st.integers(-1000, 1000)),
        min_size=1, max_size=50,
    ),
    st.integers(2, 8),
)
@SLOW
def test_salted_aggregate_equals_plain_groupby(spark, rows, buckets):
    df = spark.createDataFrame(rows, "k int, v long")
    plain = {
        (r.k): (r.n, r.s)
        for r in df.groupBy("k").agg(F.count("*").alias("n"), F.sum("v").alias("s")).collect()
    }
    salted = {
        (r.k): (r.n, r.s)
        for r in salted_aggregate(
            df, ["k"], {"n": F.count("*"), "s": F.sum("v")}, buckets=buckets
        ).collect()
    }
    assert plain == salted


@given(
    st.lists(
        st.recursive(
            st.one_of(
                st.integers(-10**9, 10**9),
                st.text(max_size=20),
                st.floats(allow_nan=False, allow_infinity=False),
                st.booleans(),
                st.none(),
            ),
            lambda children: st.one_of(
                st.lists(children, max_size=4),
                st.dictionaries(st.text(max_size=5), children, max_size=3),
            ),
            max_leaves=8,
        ),
        min_size=1, max_size=10,
    )
)
@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow])
def test_rpm_roundtrips_arbitrary_objects(spark, objects):
    from burla_spark import remote_parallel_map

    results = remote_parallel_map(lambda x: x, objects, spark=spark)
    def freeze(o):
        if isinstance(o, list):
            return ("L", tuple(freeze(x) for x in o))
        if isinstance(o, dict):
            return ("D", tuple(sorted((k, freeze(v)) for k, v in o.items())))
        return o
    assert sorted(map(str, map(freeze, results))) == sorted(map(str, map(freeze, objects)))


@given(st.lists(st.text(min_size=0, max_size=30), min_size=2, max_size=10))
@SLOW
def test_jaccard_bounds_and_symmetry(spark, texts):
    from burla_spark.operators.dedup import jaccard, char_shingles

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).select("doc_id", char_shingles(F.col("text"), 3).alias("sh"))
    a = df.alias("a")
    b = df.alias("b")
    pairs = (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            jaccard(F.col("a.sh"), F.col("b.sh")).alias("jab"),
            jaccard(F.col("b.sh"), F.col("a.sh")).alias("jba"),
        )
        .collect()
    )
    for r in pairs:
        if r.jab is not None:
            assert 0.0 <= r.jab <= 1.0
            assert r.jab == r.jba


# ---------------------------------------------------------------------------
# round-5 pure functions: session merge vs brute force, Morton bijection
# ---------------------------------------------------------------------------
@given(
    ts=st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=60),
    gap=st.integers(min_value=1, max_value=2_000),
)
@settings(max_examples=200, deadline=None)
def test_merge_pending_sessions_equals_bruteforce(ts, gap):
    """Incremental interval merge (events arriving in ANY order, one at
    a time) must equal the batch sessionization of the sorted stream —
    the invariant the O(1)-state stream operator rests on."""
    from burla_spark.streaming.events import _merge_pending_sessions

    incremental = []
    for t in ts:  # arbitrary arrival order, one event per "batch"
        incremental = _merge_pending_sessions(incremental, [(t, 1)], gap)

    expected = []
    for t in sorted(ts):  # batch truth: sorted scan with gap splits
        if expected and t - expected[-1][1] <= gap:
            s = expected[-1]
            expected[-1] = (s[0], max(s[1], t), s[2] + 1, s[3] + 1)
        else:
            expected.append((t, t, 1, 1))
    assert incremental == expected


@given(
    a=st.integers(min_value=0, max_value=65535),
    b=st.integers(min_value=0, max_value=65535),
)
@settings(max_examples=300, deadline=None)
def test_morton_key_bijective_and_separable(a, b):
    """The generated Morton expression must encode (a, b) injectively
    with even bits from a and odd bits from b — checked against an
    independent Python bit-interleave."""
    from burla_spark.plans.curation import _morton_expr

    expr = _morton_expr("A", "B")
    z = eval(expr.replace("A", str(a)).replace("B", str(b)))
    back_a = sum(((z >> (2 * i)) & 1) << i for i in range(16))
    back_b = sum(((z >> (2 * i + 1)) & 1) << i for i in range(16))
    assert (back_a, back_b) == (a, b)


@given(
    st.lists(  # partitions of (item_id, count) streams
        st.lists(
            st.tuples(st.integers(0, 400), st.integers(1, 30)),
            min_size=1,
            max_size=60,
        ),
        min_size=1,
        max_size=4,
    ),
    st.integers(8, 64),  # MG capacity (far below the 401-item domain)
)
@settings(max_examples=60, deadline=None)
def test_mg_candidates_no_false_negatives_property(parts, cap):
    """Misra–Gries bound under arbitrary streams and partitionings:
    every item with global count * capacity > n survives SOME
    partition's summary — the invariant heavy_hitter_bigrams' exact
    recount depends on (pure-Python check; no Spark session)."""
    import collections

    import pandas as pd

    from burla_spark.plans import scale_ops

    # monkeypatch-free: drive the generator with a temporary capacity
    orig = scale_ops._MG_CAPACITY
    scale_ops._MG_CAPACITY = cap
    try:
        total = collections.Counter()
        survivors: set = set()
        n = 0
        for part in parts:
            stream = [f"t{i}" for i, c in part for _ in range(c)]
            n += len(stream)
            for i, c in part:
                total[f"t{i}"] += c
            batches = [
                pd.DataFrame({"gram": stream[j : j + 17]})
                for j in range(0, len(stream), 17)
            ]
            for out in scale_ops._mg_candidates(iter(batches)):
                survivors |= set(out["gram"])
        for item, cnt in total.items():
            if cnt * cap > n:
                assert item in survivors, (
                    f"{item} cnt={cnt} n={n} cap={cap} evicted — bound broken"
                )
    finally:
        scale_ops._MG_CAPACITY = orig
