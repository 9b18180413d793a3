"""Out-of-band NULL-injection parity sweep (too slow for the suite;
ENGINEERING_NOTES documents it). Copies sf0.01, NULLs a deterministic
slice of the nullable string columns, then runs the FULL oracle
comparison on the degraded tables — both engines read the same files,
so any failure is a real cross-engine NULL-convention divergence in a
query (round 4 caught two: Spark instr propagating NULL where the
oracle coalesced, and format_string rendering NULL as 'null' where
printf nulls the row).

Run: python tests/null_sweep.py   (~4 min; prints FAIL lines + summary)
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
}


def build_degraded_dir() -> str:
    import duckdb

    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    for f in glob.glob(SRC + "/*.parquet"):
        t = os.path.basename(f)[: -len(".parquet")]
        if t in INJECT:
            con.execute(f"CREATE OR REPLACE VIEW t AS SELECT * FROM read_parquet('{f}')")
            con.execute(f"COPY ({INJECT[t]}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
        else:
            shutil.copy(f, f"{DST}/{t}.parquet")
    con.close()
    return DST


def main() -> int:
    import __spark_entry__ as em
    from burla_spark.session import get_spark
    from tests.oracle import compare, duck_connection

    build_degraded_dir()
    spark = get_spark(app_name="null_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    qs, oracles = em.queries(), em.oracle_sql()
    con = duck_connection(DST)
    fails = []
    for name in sorted(qs):
        try:
            if name in oracles:
                compare(
                    qs[name](spark, DST), con, oracles[name],
                    exact=name != "embedding_cosine_topk",
                )
            else:
                qs[name](spark, DST).count()
        except Exception as exc:  # noqa: BLE001 — report every divergence
            fails.append(name)
            print(f"FAIL {name}: {exc!r}"[:300], file=sys.stderr)
    print(f"null-sweep: {len(qs) - len(fails)}/{len(qs)} pass; fails={fails}",
          file=sys.stderr)
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
