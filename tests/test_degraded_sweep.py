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
