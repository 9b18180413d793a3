"""Out-of-band degraded-data parity sweeps (too slow for the suite;
ENGINEERING_NOTES documents them). Copies sf0.01, degrades it, then
runs the FULL oracle comparison on the degraded tables — both engines
read the same files, so any failure is a real cross-engine divergence
in a query.

Two modes:
* ``null`` — NULL a deterministic slice of the nullable string
  columns. Round 4 caught two divergences: Spark instr propagating
  NULL where the oracle coalesced, and format_string rendering NULL
  as 'null' where printf nulls the row.
* ``dup``  — duplicate every 17th row of the fact tables (a replayed
  ingest). Exposes any window/dedup semantics that silently assumed
  unique keys — round 4 caught the stream_watermark_dedup oracle
  relying on fixture-unique event_ids.

Run: python tests/null_sweep.py [null|dup]   (~4 min each)
"""

from __future__ import annotations

import glob
import os
import shutil
import sys

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_DIR not in sys.path:
    sys.path.insert(0, REPO_DIR)

SRC = "/root/testdata/sf0.01"
DST = "/tmp/sfnull"

# deterministic hash-sliced NULLs in every nullable string column the
# queries actually read
INJECT = {
    "documents": (
        "SELECT doc_id,"
        " CASE WHEN hash(doc_id)%13=0 THEN NULL ELSE text END AS text,"
        " CASE WHEN hash(doc_id)%17=0 THEN NULL ELSE lang END AS lang,"
        " source, n_chars FROM t"
    ),
    "part": (
        "SELECT p_partkey,"
        " CASE WHEN hash(p_partkey)%19=0 THEN NULL ELSE p_name END AS p_name,"
        " p_brand,"
        " CASE WHEN hash(p_partkey)%23=0 THEN NULL ELSE p_type END AS p_type,"
        " p_size, p_retailprice FROM t"
    ),
    "customer": (
        "SELECT c_custkey, c_name, c_nationkey, c_acctbal,"
        " CASE WHEN hash(c_custkey)%11=0 THEN NULL ELSE c_mktsegment END"
        " AS c_mktsegment FROM t"
    ),
    # round-7 classes: NULL dates (filter/sort/grouping inputs — Spark
    # sorts NULLS FIRST asc, DuckDB NULLS LAST; any nullable sort key
    # must pin placement explicitly) and NULL numeric agg inputs
    "orders": (
        "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,"
        " CASE WHEN hash(o_orderkey)%29=0 THEN NULL ELSE o_orderdate END"
        " AS o_orderdate, o_orderpriority FROM t"
    ),
    "events": (
        "SELECT event_id, ts, user_id,"
        # round-7 session 2: NULL event types too — concat_ws vs ||
        # NULL semantics fabricated pseudo-sequences in the mining spec
        " CASE WHEN hash(event_id)%37=0 THEN NULL ELSE event_type END"
        " AS event_type,"
        " CASE WHEN hash(event_id)%31=0 THEN NULL ELSE value END AS value,"
        " props FROM t"
    ),
}


# dup mode: duplicate every 17th row (keys included) of the fact-ish
# tables — the shape of a replayed ingest batch.
DUP_TABLES = {"lineitem", "orders", "documents", "events"}


def build_degraded_dir(mode: str) -> str:
    import duckdb

    dst = DST + ("" if mode == "null" else "_dup")
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for f in glob.glob(SRC + "/*.parquet"):
        t = os.path.basename(f)[: -len(".parquet")]
        if mode == "null" and t in INJECT:
            con.execute(f"CREATE OR REPLACE VIEW t AS SELECT * FROM read_parquet('{f}')")
            con.execute(f"COPY ({INJECT[t]}) TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        elif mode == "dup" and t in DUP_TABLES:
            con.execute(f"CREATE OR REPLACE VIEW t AS SELECT * FROM read_parquet('{f}')")
            cols = ", ".join(r[0] for r in con.execute("DESCRIBE t").fetchall())
            con.execute(
                f"COPY (SELECT * FROM t UNION ALL SELECT {cols} FROM "
                f"(SELECT *, row_number() OVER () AS __rn FROM t) x "
                f"WHERE __rn % 17 = 0) TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
            )
        else:
            shutil.copy(f, f"{dst}/{t}.parquet")
    con.close()
    return dst


def main() -> int:
    import __spark_entry__ as em
    from burla_spark.session import get_spark
    from tests.oracle import compare, duck_connection

    mode = sys.argv[1] if len(sys.argv) > 1 else "null"
    assert mode in ("null", "dup"), f"unknown mode {mode!r}"
    dst = build_degraded_dir(mode)
    spark = get_spark(app_name=f"{mode}_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    qs, oracles = em.queries(), em.oracle_sql()
    con = duck_connection(dst)
    fails = []
    for name in sorted(qs):
        try:
            if name in oracles:
                compare(
                    qs[name](spark, dst), con, oracles[name],
                    exact=name != "embedding_cosine_topk",
                )
            else:
                qs[name](spark, dst).count()
        except Exception as exc:  # noqa: BLE001 — report every divergence
            fails.append(name)
            print(f"FAIL {name}: {exc!r}"[:300], file=sys.stderr)
    print(f"{mode}-sweep: {len(qs) - len(fails)}/{len(qs)} pass; fails={fails}",
          file=sys.stderr)
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
