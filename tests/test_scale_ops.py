"""plans/scale_ops.py — properties the oracle can't check: HLL sketch
accuracy + sketch-union consistency, bitmap two-phase plan shape, and
partition-invariance of the deterministic stratified sample."""

from __future__ import annotations

from pyspark.sql import functions as F

from burla_spark.plans.scale_ops import (
    hll_cardinality_sketch,
    hll_native_cardinality_sketch,
    stratified_sample_stats,
)
from burla_spark.sources.tables import load_table


def test_hll_native_estimates_within_5pct_of_exact(spark, sf_dir):
    est = {
        r.o_orderpriority: r.approx_customers
        for r in hll_native_cardinality_sketch(spark, sf_dir).collect()
    }
    o = load_table(spark, sf_dir, "orders")
    exact = {
        r.o_orderpriority: r.exact
        for r in o.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("exact"))
        .collect()
    }
    exact["ALL"] = o.select("o_custkey").distinct().count()
    assert set(est) == set(exact)
    for k, e in exact.items():
        assert abs(est[k] - e) / e < 0.05, (k, est[k], e)


def test_hll_native_all_row_comes_from_sketch_union(spark, sf_dir):
    # the ALL estimate must equal estimating a directly-built global
    # sketch — i.e. union of partial sketches loses nothing.
    rows = hll_native_cardinality_sketch(spark, sf_dir).collect()
    all_row = [r for r in rows if r.o_orderpriority == "ALL"][0]
    direct = (
        load_table(spark, sf_dir, "orders")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg(F.col("o_custkey"), F.lit(14))))
        .collect()[0][0]
    )
    assert all_row.approx_customers == direct


def test_hll_md5_estimates_within_error_bound(spark, sf_dir):
    """The oracle-exact md5-register HLL (m=64 registers) must estimate
    within ~3 standard errors (3·1.04/√64 ≈ 39%) of exact — the
    statistical guarantee the sketch advertises. Exactness of the
    arithmetic itself is the driver oracle's job; this gates the
    ESTIMATOR quality (alpha, linear-counting branch)."""
    est = {
        r.o_orderpriority: r.approx_customers
        for r in hll_cardinality_sketch(spark, sf_dir).collect()
    }
    o = load_table(spark, sf_dir, "orders")
    exact = {
        r.o_orderpriority: r.exact
        for r in o.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("exact"))
        .collect()
    }
    exact["ALL"] = o.select("o_custkey").distinct().count()
    assert set(est) == set(exact)
    for k, e in exact.items():
        assert abs(est[k] - e) / e < 0.39, (k, est[k], e)


def test_hll_md5_all_row_comes_from_register_union(spark, sf_dir):
    """The ALL row must equal the estimate over a directly-built global
    register table — register-MAX union loses nothing (mergeability)."""
    from burla_spark.operators.dedup import md5_60bit_hash
    from burla_spark.plans.scale_ops import (
        _HLL_REM_BITS,
        _hll_estimate,
    )

    rows = hll_cardinality_sketch(spark, sf_dir).collect()
    all_row = [r for r in rows if r.o_orderpriority == "ALL"][0]
    o = load_table(spark, sf_dir, "orders")
    h = md5_60bit_hash(F.col("o_custkey").cast("string"))
    rho = F.when(
        h.bitwiseAND(F.lit((1 << _HLL_REM_BITS) - 1)) == 0,
        F.lit(_HLL_REM_BITS + 1),
    ).otherwise(
        F.lit(_HLL_REM_BITS)
        - F.length(F.bin(h.bitwiseAND(F.lit((1 << _HLL_REM_BITS) - 1))))
        + 1
    )
    direct_regs = (
        o.select(
            F.lit("ALL").alias("g"),
            F.shiftright(h, _HLL_REM_BITS).alias("register"),
            rho.alias("rho"),
        )
        .groupBy("g", "register")
        .agg(F.max("rho").alias("max_rho"))
    )
    direct = _hll_estimate(direct_regs, "g").collect()[0]["approx_customers"]
    assert all_row.approx_customers == direct


def test_bitmap_distinct_plan_is_two_phase(spark, sf_dir):
    from burla_spark.plans.scale_ops import bitmap_distinct_counts

    plan = (
        bitmap_distinct_counts(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # partial bitmap merge must happen map-side before the exchange —
    # that's the whole scale argument (bytes shuffled ∝ buckets, not
    # rows). Spark plans it as a partial SortAggregate.
    assert "partial_bitmap_construct_agg" in plan
    # and the scan must be pruned to exactly the two columns used.
    assert "ReadSchema: struct<l_orderkey:bigint,l_returnflag:string>" in plan


def test_incremental_sketch_rollup(spark, sf_dir, tmp_path):
    """The incremental-pipeline property the sketches exist for: persist
    per-increment (e.g. per-day) sketch state to parquet, then merge
    increments WITHOUT rescanning the source — bitmaps stay exact, HLL
    union equals the single-pass sketch. At 100 TB this is the
    difference between re-aggregating history and a sketch-file merge."""
    o = load_table(spark, sf_dir, "orders")
    month = F.date_trunc("month", F.col("o_orderdate")).alias("month")

    # per-(month, bucket) bitmap state over distinct customers
    per_month = (
        o.groupBy(
            month, F.bitmap_bucket_number(F.col("o_custkey")).alias("bucket")
        )
        .agg(
            F.bitmap_construct_agg(
                F.bitmap_bit_position(F.col("o_custkey"))
            ).alias("bitmap"),
            F.hll_sketch_agg(F.col("o_custkey"), F.lit(14)).alias("hll"),
        )
    )
    state_path = str(tmp_path / "sketch_state")
    per_month.write.parquet(state_path)

    merged = spark.read.parquet(state_path)
    exact_from_bitmaps = (
        merged.groupBy("bucket")
        .agg(F.bitmap_count(F.bitmap_or_agg(F.col("bitmap"))).alias("c"))
        .agg(F.sum("c").cast("long").alias("n"))
        .collect()[0]["n"]
    )
    exact = o.select("o_custkey").distinct().count()
    assert exact_from_bitmaps == exact  # bitmap merge is EXACT

    hll_merged = merged.agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col("hll"))).alias("e")
    ).collect()[0]["e"]
    single_pass = o.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg(F.col("o_custkey"), F.lit(14)))
    ).collect()[0][0]
    assert hll_merged == single_pass  # sketch-of-parts ≡ sketch-of-whole


def test_stratified_sample_partition_invariant(spark, sf_dir):
    a = {tuple(r) for r in stratified_sample_stats(spark, sf_dir).collect()}
    # same query over a repartitioned copy of the table must keep the
    # exact same membership (hash split, not sample()).
    c = load_table(spark, sf_dir, "customer").repartition(13)
    c.createOrReplaceTempView("__strat_cust")
    from burla_spark.plans.mlprep import _affine_hash_sql

    b = {
        tuple(r)
        for r in spark.sql(
            f"""
            SELECT c_mktsegment, COUNT(*) AS n_sampled,
                   CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
                     AS sampled_acctbal
            FROM __strat_cust
            WHERE {_affine_hash_sql("c_custkey")} % 100 <
                  CASE c_mktsegment WHEN 'BUILDING' THEN 10
                                    WHEN 'AUTOMOBILE' THEN 25
                                    ELSE 50 END
            GROUP BY c_mktsegment
            """
        ).collect()
    }
    assert a == b


# ---------------------------------------------------------------------------
# round-7: Misra–Gries heavy hitters + degree-oriented triangles
# ---------------------------------------------------------------------------
def test_mg_candidates_no_false_negatives_under_eviction():
    """The MG guarantee on data that FORCES evictions: vocabulary far
    above capacity, a few genuinely heavy items. Every item with
    global cnt * capacity > n must survive the per-partition sweep —
    that is the property the fixture (vocab 916 vs capacity 700)
    exercises only mildly."""
    import pandas as pd

    from burla_spark.plans import scale_ops

    # 3 "partitions", each a batch iterator; 5000 distinct light grams
    # per partition swamp the capacity; 3 heavy grams dominate.
    heavy = {"h0": 4000, "h1": 2500, "h2": 1200}
    parts = []
    for p in range(3):
        grams = []
        for g, c in heavy.items():
            grams += [g] * (c // 3)
        grams += [f"light_{p}_{i}" for i in range(5000)]
        # deterministic interleave (worst case for MG is heavy-first,
        # light-later evicting them; reverse order stresses that)
        grams.sort()
        parts.append(grams)
    n = sum(len(g) for g in parts)
    cap = scale_ops._MG_CAPACITY
    survivors: set[str] = set()
    for grams in parts:
        batches = [pd.DataFrame({"gram": grams[i : i + 997]}) for i in range(0, len(grams), 997)]
        for out in scale_ops._mg_candidates(iter(batches)):
            survivors |= set(out["gram"])
    for g, c in heavy.items():
        if c * cap > n:
            assert g in survivors, f"heavy gram {g} evicted — MG bound broken"
    # and the summary stayed bounded per partition
    assert len(survivors) <= 3 * cap


def test_triangle_orientation_matches_naive_enumeration(spark):
    """Degree-oriented wedge enumeration on a hand graph (two triangles
    sharing an edge plus a pendant) equals the a<b<c naive count."""
    from pyspark.sql import functions as F

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (1, 4), (4, 5)], ["u", "v"]
    )
    # naive: a<b<c closure
    e = edges
    naive = (
        e.alias("e1")
        .join(e.alias("e2"), F.col("e1.v") == F.col("e2.u"))
        .join(
            e.alias("e3"),
            (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")),
        )
        .count()
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    j = (
        edges.join(deg.select(F.col("node").alias("u"), F.col("d").alias("du")), "u")
        .join(deg.select(F.col("node").alias("v"), F.col("d").alias("dv")), "v")
    )
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    edir = j.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("ddst"),
    )
    x, y = edir.alias("x"), edir.alias("y")
    oriented = (
        x.join(
            y,
            (F.col("x.src") == F.col("y.src"))
            & (
                (F.col("x.ddst") < F.col("y.ddst"))
                | (
                    (F.col("x.ddst") == F.col("y.ddst"))
                    & (F.col("x.dst") < F.col("y.dst"))
                )
            ),
        )
        .join(
            edir.select(F.col("src").alias("zs"), F.col("dst").alias("zd")),
            (F.col("x.dst") == F.col("zs")) & (F.col("y.dst") == F.col("zd")),
        )
        .count()
    )
    assert naive == oriented == 2


def test_ewma_truncated_weights_exact():
    """The dyadic truncated EWMA on a hand series: weights 128..1 over
    the last 8 values, missing lags drop from both sums."""
    vals = [10.0, 20.0, 30.0]  # only 3 events → den = 128+64+32
    num = 30.0 * 128 + 20.0 * 64 + 10.0 * 32
    den = 128 + 64 + 32
    expected = round(num / den, 6)
    import duckdb

    from burla_spark.plans.timeseries import EWMA_SQL

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events AS SELECT * FROM (VALUES "
        + ", ".join(
            f"(1, TIMESTAMP '2024-01-01 00:0{i}:00', {i}, 'view', {v}, NULL)"
            for i, v in enumerate(vals)
        )
        + ") t(user_id, ts, event_id, event_type, value, props)"
    )
    row = con.execute(EWMA_SQL).fetchone()
    assert row == (1, 3, expected)


def test_incremental_agg_pushes_date_filter_to_scan(spark, sf_dir):
    """The delta side's date predicate must reach the orders parquet
    scan (PushedFilters) — at 100 TB that predicate is what makes the
    delta aggregate touch only the new partition's files."""
    from burla_spark.plans.curation import incremental_agg_maintenance

    plan = (
        incremental_agg_maintenance(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    scans = [
        m.group(0)
        for m in re.finditer(r"FileScan parquet[^\n]*orders[^\n]*", plan)
    ]
    assert scans, "no orders scan found in plan"
    assert any("o_orderdate" in s and "PushedFilters: [" in s for s in scans), (
        "date predicate not pushed to the orders scan:\n" + "\n".join(scans)
    )


def test_cms_never_underestimates_and_is_exact_without_collisions(spark, sf_dir):
    """The one-sided CMS error bound, plus an independent (pandas)
    recompute of the full sketch: every reported estimate must equal
    min over the 4 rows of the true counter contents."""
    import pandas as pd

    from burla_spark.plans.mlprep import _HASH_MOD
    from burla_spark.plans.scale_ops import (
        _CMS_COEFFS,
        _CMS_W,
        cms_frequency_sketch,
    )

    rows = cms_frequency_sketch(spark, sf_dir).collect()
    assert rows
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    keys = o["o_custkey"].dropna().astype("int64")
    counts = keys.value_counts()
    sketch = [dict() for _ in _CMS_COEFFS]
    for key, c in counts.items():
        for r, (a, b) in enumerate(_CMS_COEFFS):
            idx = ((int(key) % _HASH_MOD) * a + b) % _HASH_MOD % _CMS_W
            sketch[r][idx] = sketch[r].get(idx, 0) + int(c)
    for row in rows:
        assert row["overestimate"] >= 0
        assert row["cms_estimate"] == row["exact_count"] + row["overestimate"]
        expect = min(
            sketch[r][((row["custkey"] % _HASH_MOD) * a + b) % _HASH_MOD % _CMS_W]
            for r, (a, b) in enumerate(_CMS_COEFFS)
        )
        assert row["cms_estimate"] == expect
        assert row["exact_count"] == int(counts[row["custkey"]])
    # the sketch must actually be in a collision-bearing regime at
    # this domain/width (vacuity guard) — some bucket holds ≥2 keys,
    # even if the top-20 keys' minima all escape (they can at smoke SF)
    n_keys = counts.size
    assert any(len(s) < n_keys for s in sketch)


def test_cms_sketch_counters_merge_across_shards(spark, sf_dir):
    """Counters are plain sums, so per-shard sketches merged by
    addition equal the monolithic sketch — the incremental-pipeline
    property the spec claims (same contract as the bitmap/HLL specs)."""
    import pandas as pd

    from burla_spark.plans.mlprep import _HASH_MOD
    from burla_spark.plans.scale_ops import _CMS_COEFFS, _CMS_W

    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    keys = o["o_custkey"].dropna().astype("int64").tolist()

    def build_exact(ks):
        s = [[0] * _CMS_W for _ in _CMS_COEFFS]
        for key in ks:
            for r, (a, b) in enumerate(_CMS_COEFFS):
                idx = ((key % _HASH_MOD) * a + b) % _HASH_MOD % _CMS_W
                s[r][idx] += 1
        return s

    mid = len(keys) // 2
    full = build_exact(keys)
    sa, sb = build_exact(keys[:mid]), build_exact(keys[mid:])
    merged = [
        [x + y for x, y in zip(ra, rb)] for ra, rb in zip(sa, sb)
    ]
    assert merged == full


def test_adamic_adar_matches_naive_on_fixture(spark, sf_dir):
    """Third-way check: hub-capped fixed-point Adamic-Adar recomputed
    naively in Python from the co-purchase edge set must reproduce the
    spec's top-25 pairs and scores exactly."""
    import math

    import pandas as pd

    from burla_spark.plans.scale_ops import (
        _AA_HUB_CAP,
        _AA_SCALE,
        _AA_TOP,
        adamic_adar_link_scores,
    )

    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")[
        ["l_orderkey", "l_partkey"]
    ].drop_duplicates()
    edges = set()
    for _, g in li.groupby("l_orderkey"):
        ps = sorted(g["l_partkey"].tolist())
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                edges.add((ps[i], ps[j]))
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    scores: dict[tuple[int, int], list[int]] = {}
    for z, nbrs in adj.items():
        if not (2 <= len(nbrs) <= _AA_HUB_CAP):
            continue
        term = round(_AA_SCALE / math.log(len(nbrs)))
        ns = sorted(nbrs)
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                pair = (ns[i], ns[j])
                e = scores.setdefault(pair, [0, 0])
                e[0] += 1
                e[1] += term
    ranked = sorted(
        (
            (-fp, x, y, n)
            for (x, y), (n, fp) in scores.items()
            if (x, y) not in edges
        ),
    )[:_AA_TOP]
    expect = {
        (x, y): (n, round(-negfp / _AA_SCALE, 6))
        for negfp, x, y, n in ranked
    }
    out = adamic_adar_link_scores(spark, sf_dir).collect()
    assert len(out) == len(expect) > 0
    for r in out:
        n, score = expect[(r["part_a"], r["part_b"])]
        assert r["n_common"] == n
        assert abs(r["aa_score"] - score) < 1e-9
    # predictions must be non-edges with real multi-common-neighbor
    # support somewhere (vacuity guard)
    assert max(r["n_common"] for r in out) >= 2
