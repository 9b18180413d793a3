"""Fleet-wide non-vacuity lint — the q9 lesson, generalized.

A green parity row proves nothing if the fixture makes the answer
degenerate: q9's original filter matched zero rows, so Spark and the
oracle agreed on an empty result and the driver scoreboard showed a
meaningless green.  Round 5 found two more (filter_predicates' regex
matched no synthetic part names; q22's no-orders anti-join was empty
because every fixture customer has orders).

This lint runs every registered oracle through DuckDB at sf0.01 — the
driver's correctness SF — and fails if any returns zero rows.  The
oracle side suffices: parity tests already force Spark to match it, so
a non-empty oracle means the spec exercises real data on both engines.

Specs without an oracle (streaming replays, zlib scoring, ANN
rows-only) are covered by their own >=1-row assertions in parity and
operator tests.
"""

from __future__ import annotations

import duckdb
import pytest

from burla_spark.plans.registry import all_specs
from burla_spark.sources.tables import TABLE_NAMES, table_path

SF_DIR = "/root/testdata/sf0.01"

ORACLE_SPECS = [s for s in all_specs() if s.oracle is not None]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{table_path(SF_DIR, name)}')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("spec", ORACLE_SPECS, ids=lambda s: s.name)
def test_oracle_nonvacuous_at_driver_sf(duck, spec):
    n = duck.execute(f"SELECT COUNT(*) FROM ({spec.oracle})").fetchone()[0]
    assert n >= 1, (
        f"{spec.name}: oracle returns 0 rows at sf0.01 — a green driver row "
        "for this spec would be vacuous; loosen the fixture predicate"
    )
