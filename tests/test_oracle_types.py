"""Machine-enforced oracle type convention.

The driver's correctness gate fetches both the Spark result and the
DuckDB oracle result through pandas and hashes the stringified values.
DuckDB widens integer aggregates (SUM over BIGINT -> HUGEINT), and
pandas renders HUGEINT as float64, so an uncast oracle aggregate hashes
as "99111.0" against Spark's bigint "99111" — rows_match and
schema_match stay true while hash_match goes red.  This bug class cost
rounds 3 AND 4 (pivot_status_matrix, then six more rows + two latent);
this test makes it structurally impossible to reintroduce:

* DuckDB `DESCRIBE` runs over EVERY registered oracle SQL (plan-only,
  no execution — fast even for the iterative CTE chains);
* any HUGEINT / UHUGEINT output column fails outright — Spark never
  emits a 128-bit integer, so there is no safe pairing;
* any DECIMAL output column must be on the reviewed allowlist below,
  which asserts the Spark side of that column is DOUBLE (both engines
  then land in float64 in the pandas fetch and stringify identically).

Determinism-contract rule 4: computed integers are BIGINT on both
sides; computed reals are DOUBLE on both sides.
"""

from __future__ import annotations

import duckdb
import pytest

from burla_spark.plans.registry import all_specs
from burla_spark.sources.tables import TABLE_NAMES, table_path

SF_DIR = "/root/testdata/sf0.001"

# (spec, column) pairs where the oracle emits DECIMAL and the Spark
# side is DOUBLE — reviewed: DECIMAL and DOUBLE both fetch to pandas
# float64, and the values are exact in binary float at these scales.
DECIMAL_OK = {
    ("process_aggregate_predict", "score"),  # 0.25*n + 1.5*k, exact in fp64
    ("range_join_price_bands", "lo"),  # fixed band bounds (x.0 / x.5)
    ("range_join_price_bands", "hi"),
    ("scalar_math_conditional", "rate_sign"),  # sign() in {-1.0, 0.0, 1.0}
}

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


def _offending_columns(con: duckdb.DuckDBPyConnection, name: str, sql: str):
    desc = con.execute(f"DESCRIBE {sql}").fetchall()
    bad = []
    for col, typ, *_ in desc:
        if "HUGEINT" in typ:
            bad.append((col, typ, "cast to BIGINT in the oracle SQL"))
        elif typ.startswith("DECIMAL") and (name, col) not in DECIMAL_OK:
            bad.append(
                (col, typ, "cast to DOUBLE/BIGINT or add a reviewed DECIMAL_OK entry")
            )
    return bad


@pytest.mark.parametrize("spec", ORACLE_SPECS, ids=lambda s: s.name)
def test_oracle_output_types(duck, spec):
    bad = _offending_columns(duck, spec.name, spec.oracle)
    assert not bad, (
        f"{spec.name}: oracle output columns {bad} will hash-mismatch "
        "against Spark through the driver's pandas fetch"
    )


def test_lint_catches_seeded_regression(duck):
    """The lint must actually fire on the bug class it guards against."""
    seeded = "SELECT l_returnflag, SUM(l_linenumber) AS s FROM lineitem GROUP BY 1"
    bad = _offending_columns(duck, "seeded", seeded)
    assert bad and bad[0][0] == "s" and "HUGEINT" in bad[0][1]
    seeded_dec = "SELECT CAST(1 AS DECIMAL(4,2)) * l_linenumber AS d FROM lineitem"
    bad = _offending_columns(duck, "seeded_dec", seeded_dec)
    assert bad and bad[0][0] == "d"


def test_decimal_allowlist_has_no_stale_entries(duck):
    """Every DECIMAL_OK entry must still correspond to a live DECIMAL
    column — stale entries would silently waive future regressions."""
    live = set()
    by_name = {s.name: s for s in ORACLE_SPECS}
    for name in {n for n, _ in DECIMAL_OK}:
        spec = by_name.get(name)
        assert spec is not None, f"DECIMAL_OK references unknown spec {name}"
        for col, typ, *_ in duck.execute(f"DESCRIBE {spec.oracle}").fetchall():
            if typ.startswith("DECIMAL"):
                live.add((name, col))
    assert DECIMAL_OK == live, f"stale/missing DECIMAL_OK entries: {DECIMAL_OK ^ live}"
