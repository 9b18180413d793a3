"""sf0.1 → sf1 wall-curve for the relational/TPC-H family.

The ×10 replica harness (scaling_bench.py) gates the text/embedding
operators, but replicated key-shifted fixtures exercise the relational
family only synthetically: every FK fans out inside its replica and
cross-replica selectivity is zero. This harness instead generates REAL
TPC-H data at two scale factors with DuckDB's `tpch` extension
(dbgen, deterministic), projects it onto the fixture schema
(TESTDATA.md columns/types — the queries are written against that
subset), and times every `plans.relational*` spec at sf0.1 vs sf1.
Apples to apples: both scale points come from the same generator, so
the wall ratio isolates PLAN scaling — ~10 is linear, far above it is
the hidden-quadratic alarm.

The non-TPC-H tables (events/documents/embeddings) are copied from
the tiny sf0.001 fixture into BOTH dirs, so the handful of relational
specs that read them (date/scalar demos) see constant input and ratio
≈ 1 — they dilute nothing and the gate is one-sided (≤).

Run: ``python tpch_scaling.py`` — prints one JSON line
{"metric": "tpch_sf_curve", "queries": {name: {"t01": s, "t1": s,
"ratio": r}}, "max_ratio": r, ...}; exits 1 if max_ratio > GATE
(default 15 = linear ×10 + shuffle/AQE slack; override via
BURLA_TPCH_GATE). Fixtures land in ``.scaling/tpch_sf{0.1,1}``
(gitignored, built once, ~2 min).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if REPO_DIR not in sys.path:
    sys.path.insert(0, REPO_DIR)

SMALL_FIXTURE = "/root/testdata/sf0.001"  # constant non-TPC-H tables
GEN_VERSION = "1"
GATE = float(os.environ.get("BURLA_TPCH_GATE", "15"))

# dbgen → fixture-schema projections (TESTDATA.md): the fixture is a
# column/type SUBSET of real TPC-H (DECIMAL→DOUBLE, DATE→TIMESTAMP,
# no comment/address/phone columns, no partsupp).
PROJECTIONS = {
    "region": "SELECT r_regionkey, r_name FROM region",
    "nation": "SELECT n_nationkey, n_name, n_regionkey FROM nation",
    "customer": (
        "SELECT c_custkey, c_name, c_nationkey,"
        " CAST(c_acctbal AS DOUBLE) AS c_acctbal, c_mktsegment FROM customer"
    ),
    "supplier": (
        "SELECT s_suppkey, s_name, s_nationkey,"
        " CAST(s_acctbal AS DOUBLE) AS s_acctbal FROM supplier"
    ),
    "part": (
        "SELECT p_partkey, p_name, p_brand, p_type, p_size,"
        " CAST(p_retailprice AS DOUBLE) AS p_retailprice FROM part"
    ),
    "orders": (
        "SELECT o_orderkey, o_custkey, o_orderstatus,"
        " CAST(o_totalprice AS DOUBLE) AS o_totalprice,"
        " CAST(o_orderdate AS TIMESTAMP) AS o_orderdate,"
        " o_orderpriority FROM orders"
    ),
    "lineitem": (
        "SELECT l_orderkey, l_partkey, l_suppkey,"
        " CAST(l_linenumber AS INTEGER) AS l_linenumber,"
        " CAST(l_quantity AS DOUBLE) AS l_quantity,"
        " CAST(l_extendedprice AS DOUBLE) AS l_extendedprice,"
        " CAST(l_discount AS DOUBLE) AS l_discount,"
        " CAST(l_tax AS DOUBLE) AS l_tax,"
        " l_returnflag, l_linestatus,"
        " CAST(l_shipdate AS TIMESTAMP) AS l_shipdate FROM lineitem"
    ),
}


# The 10 worst steady-state ratios from TPCH_CURVE_r08 (sf0.1→sf1):
# round-10 extends these one more decade (sf1→sf10, ×100 total) to
# confirm sublinearity past the page-cache comfort zone. Run with
# --sf10 (adds ~5 min dbgen + the timed runs). Round 11 (VERDICT r10
# #6): widened from 10 spot specs to the WORST-20 by sf1 ratio in
# TPCH_CURVE_r10 (plus the original 10) — the second decade is where
# sort/shuffle cliffs appear, so the decade gate should watch the
# specs whose first decade already scaled worst, heavy TPC-H joins
# included.
SF10_WORST = (
    # original round-10 spot set
    "window_rank_customers", "scalar_string_functions",
    "window_running_revenue", "applyinarrow_grouped", "topk_per_group",
    "subquery_aggregation", "window_lag_lead", "topk_global",
    "scalar_date_functions", "agg_collect",
    # round-11: worst-20 by sf1 ratio in TPCH_CURVE_r10
    "scalar_string_functions2", "q15_top_supplier",
    "q21_sole_failing_supplier", "q18_large_orders",
    "q12_priority_buckets", "regexp_groups", "q13_count_distribution",
    "q3_shipping_priority", "agg_bitwise_stringagg",
    "q16_supplier_part_counts", "q4_order_priority", "agg_stats",
    "q6_forecast_revenue", "set_operations", "q7_volume_shipping",
)


def _gen_dir(sf: float) -> str:
    return os.path.join(REPO_DIR, ".scaling", f"tpch_sf{sf}")


def generate_fixtures(sf: float) -> str:
    import duckdb

    out_dir = _gen_dir(sf)
    done_marker = os.path.join(out_dir, f".done_v{GEN_VERSION}")
    if os.path.exists(done_marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    print(f"[tpch] dbgen sf={sf} -> {out_dir} ...", file=sys.stderr, flush=True)
    con = duckdb.connect()
    con.execute("LOAD tpch")
    con.execute(f"CALL dbgen(sf={sf})")
    for table, sql in PROJECTIONS.items():
        con.execute(
            f"COPY ({sql}) TO '{out_dir}/{table}.parquet' (FORMAT PARQUET)"
        )
    con.close()
    for t in ("events", "documents", "embeddings"):
        shutil.copy(f"{SMALL_FIXTURE}/{t}.parquet", f"{out_dir}/{t}.parquet")
    with open(done_marker, "w") as fh:
        fh.write(f"v{GEN_VERSION} {time.time()}")
    return out_dir


def main(include_sf10: bool = False) -> dict:
    from scaling_bench import _time_queries

    from burla_spark.plans.registry import all_specs
    from burla_spark.session import get_spark

    d01 = generate_fixtures(0.1)
    d1 = generate_fixtures(1)
    d10 = generate_fixtures(10) if include_sf10 else None
    spark = get_spark(app_name="burla_spark_tpch_scaling")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup

    specs = [
        s for s in all_specs()
        if (getattr(s.spark, "__module__", "") or "").startswith(
            "burla_spark.plans.relational"
        )
    ]
    base = _time_queries(spark, specs, d01)
    scaled = _time_queries(spark, specs, d1)
    queries = {}
    for name in sorted(base):
        (b_cold, b_best), (s_cold, s_best) = base[name], scaled[name]
        queries[name] = {
            "t01": b_best,
            "t1": s_best,
            # 50 ms floor: sub-fixed-cost ratios are noise (same rule
            # as scaling_bench).
            "ratio": round(s_best / max(b_best, 0.05), 2),
        }
    if d10 is not None:
        specs10 = [s for s in specs if s.name in SF10_WORST]
        decade = _time_queries(spark, specs10, d10)
        for name, (c10, t10) in decade.items():
            queries[name]["t10"] = t10
            # decade ratio sf1→sf10: ≈10 is linear; the gate is the
            # same one-sided GATE as the first decade.
            queries[name]["ratio10"] = round(
                t10 / max(queries[name]["t1"], 0.05), 2
            )
    worst_name = max(queries, key=lambda n: queries[n]["ratio"])
    out = {
        "metric": "tpch_sf_curve",
        "sf_points": [0.1, 1, 10] if d10 is not None else [0.1, 1],
        "queries": queries,
        "max_ratio": queries[worst_name]["ratio"],
        "worst_query": worst_name,
        "n_queries": len(queries),
    }
    if d10 is not None:
        w10 = max(
            (n for n in queries if "ratio10" in queries[n]),
            key=lambda n: queries[n]["ratio10"],
        )
        out["max_ratio10"] = queries[w10]["ratio10"]
        out["worst_query10"] = w10
    return out


if __name__ == "__main__":
    real_stdout = sys.stdout
    sys.stdout = sys.stderr
    try:
        result = main(include_sf10="--sf10" in sys.argv)
    finally:
        sys.stdout = real_stdout
    print(json.dumps(result))
    if result["max_ratio"] > GATE or result.get("max_ratio10", 0) > GATE:
        print(
            f"[tpch] GATE FAILED: {result['worst_query']} ratio "
            f"{result['max_ratio']} (sf10: "
            f"{result.get('worst_query10')} {result.get('max_ratio10')}) "
            f"> {GATE} — superlinear relational plan",
            file=sys.stderr,
        )
        sys.exit(1)
