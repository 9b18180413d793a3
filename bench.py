"""Bench harness — times the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with a count()+collect-free action
(write to noop would be ideal; count() exercises the full plan since
every query here aggregates/projects through its operators).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if REPO_DIR not in sys.path:
    sys.path.insert(0, REPO_DIR)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: every registry query; LSH/cross-join-heavy ones are
# still included — they're first-class operators, not demos.
EXCLUDE: set[str] = set()


def main() -> None:
    from burla_spark.plans.registry import all_specs
    from burla_spark.session import get_spark

    spark = get_spark(app_name="burla_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/executor/codegen warmup — excluded from query timings so the
    # numbers reflect steady-state throughput, not one-time JIT cost.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from burla_spark.sources.tables import TABLE_NAMES, load_table

    for t in TABLE_NAMES:
        load_table(spark, SF_DIR, t).selectExpr("count(*)").collect()

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    timings: dict[str, float] = {}
    for spec in all_specs():
        if spec.name in EXCLUDE:
            continue
        t0 = time.perf_counter()
        df = spec.spark(spark, SF_DIR)
        n = df.count()
        timings[spec.name] = round(time.perf_counter() - t0, 3)
        del n

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
