"""DuckDB oracle harness — mirrors the driver's correctness gate:
run the Spark query and the oracle SQL on the same parquet, compare
row count, schema (column names), and order-insensitive values.

We compare EXACT values (no tolerance): the engine's determinism
contract (decimal-routed sums, integer arithmetic, unique sort keys)
is designed to make Spark and DuckDB agree bit-for-bit, so any
tolerance the driver applies on top only adds slack.
"""

from __future__ import annotations

import math
from datetime import datetime
from decimal import Decimal

import duckdb

from burla_spark.sources.tables import TABLE_NAMES, table_path

# doubles that went through genuinely different float paths (e.g. carry
# different association orders) get a tiny relative tolerance; exact
# types (int/str/bool/timestamp/decimal-routed doubles) must match
# exactly. The default is exact.
REL_TOL = 1e-9


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(sf_dir, name)}')"
        )
    return con


def _canon(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, list):
        return tuple(_canon(x) for x in v)
    if hasattr(v, "isoformat"):  # date
        return v.isoformat()
    if isinstance(v, int):
        return float(v) if abs(v) < 2**52 else v
    return v


def _rows_to_canonical(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(
        (tuple(_canon(r[i]) for i in order) for r in rows),
        key=lambda t: tuple(str(x) for x in t),
    )


def compare(spark_df, con, sql: str, exact: bool = True) -> None:
    spark_rows = [tuple(r) for r in spark_df.collect()]
    spark_cols = spark_df.columns
    duck = con.execute(sql)
    duck_cols = [d[0] for d in duck.description]
    duck_rows = duck.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"column mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    )

    s = _rows_to_canonical(spark_rows, spark_cols)
    d = _rows_to_canonical(duck_rows, duck_cols)
    for i, (sr, dr) in enumerate(zip(s, d)):
        for j, (sv, dv) in enumerate(zip(sr, dr)):
            if isinstance(sv, float) and isinstance(dv, float):
                if sv == dv or (math.isnan(sv) and math.isnan(dv)):
                    # signed-zero strict (determinism contract rule 13):
                    # Python -0.0 == 0.0, but the driver's value hash is
                    # over the typed bytes, so a -0.0/0.0 split is a real
                    # red row. Engines disagree on ROUND of tiny negatives
                    # — queries must normalize with `+ 0.0` on both sides.
                    if sv == 0.0 and math.copysign(1.0, sv) != math.copysign(
                        1.0, dv
                    ):
                        raise AssertionError(
                            f"signed-zero mismatch row {i} col {j}: "
                            f"spark={sv!r} duck={dv!r} — normalize with + 0.0 "
                            "on both sides (contract rule 13)"
                        )
                    continue
                if not exact and math.isclose(sv, dv, rel_tol=REL_TOL, abs_tol=1e-12):
                    continue
                raise AssertionError(
                    f"value mismatch row {i} col {j}: spark={sv!r} duck={dv!r}"
                )
            assert sv == dv, f"value mismatch row {i} col {j}: spark={sv!r} duck={dv!r}"
