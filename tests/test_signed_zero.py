"""Signed-zero parity lint (determinism contract rule 13).

Python's ``-0.0 == 0.0`` let a DuckDB/Spark signed-zero split hide from
``==``-based compares while the driver's typed value hash flagged it red
(round-5 ``weighted_sample_orders``). These tests (a) prove the harness
now catches a seeded ``-0.0`` split, and (b) pin the engine-divergence
fact the rule rests on: Spark ROUND of a tiny negative is ``+0.0`` while
DuckDB's is ``-0.0``, and ``+ 0.0`` normalizes both.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from tests.oracle import compare


def test_compare_rejects_seeded_signed_zero(spark):
    df = spark.createDataFrame([(1, 0.0)], "id bigint, v double")
    con = duckdb.connect()
    try:
        # ROUND of a tiny negative is DuckDB's way of producing -0.0
        # (a bare -0.0 literal parses as DECIMAL and loses the sign)
        with pytest.raises(AssertionError, match="signed-zero"):
            compare(
                df, con, "SELECT CAST(1 AS BIGINT) AS id, ROUND(-1e-12, 9) AS v"
            )
        # and the normalized form passes
        compare(
            df,
            con,
            "SELECT CAST(1 AS BIGINT) AS id, ROUND(-1e-12, 9) + 0.0 AS v",
        )
    finally:
        con.close()


def test_round_divergence_and_normalization(spark):
    """The underlying engine divergence: ROUND(-1e-12, 9) is -0.0 in
    DuckDB, +0.0 in Spark; `+ 0.0` maps both to +0.0."""
    con = duckdb.connect()
    try:
        raw, norm = con.execute(
            "SELECT ROUND(-1e-12, 9), ROUND(-1e-12, 9) + 0.0"
        ).fetchall()[0]
    finally:
        con.close()
    assert raw == 0.0 and math.copysign(1.0, raw) == -1.0  # DuckDB: -0.0
    assert math.copysign(1.0, norm) == 1.0  # normalized: +0.0

    srow = spark.sql(
        "SELECT ROUND(CAST(-1e-12 AS DOUBLE), 9) AS r, "
        "ROUND(CAST(-1e-12 AS DOUBLE), 9) + 0.0d AS n"
    ).collect()[0]
    assert math.copysign(1.0, srow.n) == 1.0
