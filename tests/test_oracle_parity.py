"""The correctness gate, locally: every oracle-bearing QuerySpec must
hash-match DuckDB on the smoke fixture. This is exactly what the driver
runs at sf0.01 — keeping it green here keeps CORRECTNESS_r{N}.json green.
"""

from __future__ import annotations

import pytest

from burla_spark.plans.registry import all_specs
from tests.oracle import compare, duck_connection

# queries whose floats take genuinely different association orders in
# the two engines (documented in their specs) get the tiny rel-tol path.
_APPROX = {"embedding_cosine_topk"}

SPECS = [s for s in all_specs() if s.oracle is not None]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("spec", SPECS, ids=[s.name for s in SPECS])
def test_oracle_parity(spec, spark, sf_dir, duck):
    df = spec.spark(spark, sf_dir)
    compare(df, duck, spec.oracle, exact=spec.name not in _APPROX)


@pytest.mark.parametrize(
    "spec",
    [s for s in all_specs() if s.oracle is None],
    ids=[s.name for s in all_specs() if s.oracle is None],
)
def test_rows_only_queries_run(spec, spark, sf_dir):
    df = spec.spark(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0
