"""Degraded-input sweep: every registry query must COMPLETE (not
necessarily return rows) against zero-row tables — the shape of a
filtered partition, an empty date range, a new tenant. Also asserts the
cache-lifecycle contract: after running the whole registry, no RDD is
left pinned in the session.

(The richer NULL-injected parity sweep runs out-of-band — see
ENGINEERING_NOTES.md; this in-suite version is empty-tables only so it
stays ~1 min.)
"""

from __future__ import annotations

import os

import pytest

from burla_spark.plans.registry import all_specs
from burla_spark.sources.tables import TABLE_NAMES


@pytest.fixture(scope="module")
def empty_sf_dir(spark, sf_dir, tmp_path_factory):
    dst = tmp_path_factory.mktemp("empty_tables")
    for t in TABLE_NAMES:
        df = spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet"))
        df.limit(0).coalesce(1).write.mode("overwrite").parquet(
            str(dst / f"{t}.parquet")
        )
    return str(dst)


def test_every_query_completes_on_empty_tables(spark, empty_sf_dir):
    failures = []
    for spec in all_specs():
        try:
            spec.spark(spark, empty_sf_dir).count()
        except Exception as exc:  # noqa: BLE001 — collect, report all
            failures.append(f"{spec.name}: {type(exc).__name__}: {exc}"[:160])
        finally:
            spark.catalog.clearCache()
    assert not failures, "\n".join(failures)
    # cache-lifecycle contract: a full registry sweep leaves nothing
    # pinned (persisted intermediates must be released by the operator
    # that created them).
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == 0


# Engine-semantics divergence on EMPTY input only: DuckDB emits the
# grand-total grouping-sets row over zero rows (the standard's "the
# () group exists, COUNT=0"), Spark's grouping-sets/rollup/cube emit
# nothing. Real data always has the grand-total row, so the driver's
# sf0.01 compare is unaffected; documented rather than papered over.
_EMPTY_PARITY_DIVERGENT = {
    "grouping_id_flags",
    "grouping_sets_agg",
    "agg_rollup",
    "agg_cube",
}


def test_oracle_parity_on_empty_tables(spark, empty_sf_dir):
    """Zero-row PARITY sweep (not just completion): aggregates over
    empty input are where SUM-vs-COUNT NULL semantics silently split
    the engines (caught live: table_column_stats' n_nulls was
    SUM(CASE..)=NULL on Spark vs COUNT(CASE..)=0 on DuckDB). Every
    oracle-bearing batch spec must hash-match on empty tables too,
    modulo the documented grouping-sets divergence."""
    import duckdb

    from tests.oracle import compare

    con = duckdb.connect()
    try:
        for t in TABLE_NAMES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{empty_sf_dir}/{t}.parquet/*.parquet')"
            )
        failures = []
        for spec in all_specs():
            if (
                spec.oracle is None
                or spec.name.startswith("stream_")
                or spec.name in _EMPTY_PARITY_DIVERGENT
            ):
                continue
            try:
                compare(spec.spark(spark, empty_sf_dir), con, spec.oracle)
            except Exception as exc:  # noqa: BLE001 — collect, report all
                failures.append(f"{spec.name}: {exc}"[:160])
            finally:
                spark.catalog.clearCache()
        assert not failures, "\n".join(failures)
    finally:
        con.close()
