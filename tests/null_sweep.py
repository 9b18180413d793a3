"""Out-of-band degraded-data parity sweeps (too slow for the suite;
ENGINEERING_NOTES documents them). Copies sf0.01, degrades it, then
runs the FULL oracle comparison on the degraded tables — both engines
read the same files, so any failure is a real cross-engine divergence
in a query.

Modes:
* ``null`` — NULL a deterministic slice of the nullable string
  columns. Round 4 caught two divergences: Spark instr propagating
  NULL where the oracle coalesced, and format_string rendering NULL
  as 'null' where printf nulls the row.
* ``dup``  — duplicate every 17th row of the fact tables (a replayed
  ingest). Exposes any window/dedup semantics that silently assumed
  unique keys — round 4 caught the stream_watermark_dedup oracle
  relying on fixture-unique event_ids.
* ``nullkey`` — NULL the JOIN/GROUP keys themselves (events.user_id,
  documents.doc_id, embeddings.vec_id on deterministic hash slices).
  The round-7 round-end run of this recipe found 7 real divergences:
  4 batch (fixed in d7c76ad) + 3 streaming (fixed round 8 —
  stream_upsert_user_totals, stream_full_outer_join,
  stream_timer_sessions). The policy it enforces: a join / group /
  rank / upsert key needs an identity, so every keyed operator must
  state its NULL-key treatment EXPLICITLY and identically on both
  engine sides.
* ``dupdim`` — duplicate every 13th row of the DIMENSION tables
  (nation, region, customer, supplier, part), keys included: the
  shape of a re-ingested dim snapshot. Exercises the join/broadcast
  family the fact-side ``dup`` sweep can't — a duplicated dim key
  fans out every matching fact row identically in both engines, so
  any divergence is a real semantics bug (round-7 VERDICT item #3).
* ``trunc`` — truncate document text mid-codepoint-run (byte-prefix
  at 64 chars on a hash slice, plus empty-string on another): the
  shape of a crawler that cut a record short. Exercises every text
  operator's short/empty-input edge (round-7 VERDICT item #3).
* ``nullfk`` — NULL the TPC-H star-schema join keys (lineitem's
  orderkey/partkey/suppkey, orders' custkey on hash slices): the
  relational twin of ``nullkey``. Equi-joins drop NULL keys
  identically in both engines, but group-bys keep a NULL group and
  sort keys hit rule-15 placement — this probes the whole q1–q22 +
  window family for implicit key-identity assumptions.
* ``extreme`` — value-domain extremes instead of missing values: huge
  (1e15) and negated quantities, out-of-range discounts, zero /
  negated order totals, epoch-start and far-future (2199) order
  dates, NaN / ±Infinity / ±1e308 event values, and zero-norm or
  NaN-component embedding vectors. Probes accumulator width (DECIMAL
  overflow), IEEE-special ordering and grouping, divide-by-zero in
  similarity math, and date-window generation against outlier
  timestamps — the shape of sensor glitches, currency bugs, and
  corrupt float payloads in a real 100 TB feed.

* ``unicode`` — non-ASCII text payloads on hash slices of documents:
  emoji + ZWJ family sequences, CJK, combining diacritics (é as
  e+U+0301), RTL Arabic, and exotic whitespace (tab, NBSP, U+2028
  line separator). Probes codepoint-vs-byte length semantics, case
  mapping, regex \\s/\\w class behavior, and hash/tokenize functions
  across the two engines' unicode libraries (Java vs utf8proc/RE2).

Run: python tests/null_sweep.py
     [null|dup|nullkey|dupdim|trunc|nullfk|extreme|unicode]
(~4 min each)
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

# dupdim mode: duplicate every 13th row of the DIMENSION tables — a
# re-ingested dim snapshot; fans out joins identically in both engines.
DUPDIM_TABLES = {"nation", "region", "customer", "supplier", "part"}

# nullkey mode: NULL the join/group keys themselves on deterministic
# hash slices — the round-7 round-end probe recipe, now permanent.
NULLKEY_INJECT = {
    "events": (
        "SELECT event_id, ts,"
        " CASE WHEN hash(event_id)%41=0 THEN NULL ELSE user_id END AS user_id,"
        " event_type, value, props FROM t"
    ),
    "documents": (
        "SELECT CASE WHEN hash(doc_id)%43=0 THEN NULL ELSE doc_id END AS doc_id,"
        " text, lang, source, n_chars FROM t"
    ),
    "embeddings": (
        "SELECT CASE WHEN hash(vec_id)%47=0 THEN NULL ELSE vec_id END AS vec_id,"
        " embedding, label FROM t"
    ),
}

# nullfk mode: NULL the star-schema join keys on hash slices — the
# relational twin of nullkey (disjoint moduli so slices overlap less).
NULLFK_INJECT = {
    "lineitem": (
        "SELECT CASE WHEN hash(l_orderkey*7+l_linenumber)%53=0 THEN NULL"
        "            ELSE l_orderkey END AS l_orderkey,"
        " CASE WHEN hash(l_partkey)%59=0 THEN NULL ELSE l_partkey END AS l_partkey,"
        " CASE WHEN hash(l_suppkey)%61=0 THEN NULL ELSE l_suppkey END AS l_suppkey,"
        " l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,"
        " l_returnflag, l_linestatus, l_shipdate FROM t"
    ),
    "orders": (
        "SELECT o_orderkey,"
        " CASE WHEN hash(o_orderkey*3)%67=0 THEN NULL ELSE o_custkey END"
        " AS o_custkey,"
        " o_orderstatus, o_totalprice, o_orderdate, o_orderpriority FROM t"
    ),
}

# extreme mode: value-domain extremes on disjoint hash slices. Keys
# stay intact (the null/nullkey/nullfk sweeps own missing-identity);
# this one corrupts the PAYLOADS the way real feeds do — a currency
# bug negates a price, a sensor emits NaN/Inf, an upstream default
# writes epoch-zero, an embedding service returns all-zeros.
EXTREME_INJECT = {
    "lineitem": (
        "SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,"
        " CASE WHEN hash(l_orderkey*13+l_linenumber)%71=0 THEN 1e15"
        "      WHEN hash(l_orderkey*13+l_linenumber)%73=1 THEN -l_quantity"
        "      ELSE l_quantity END AS l_quantity,"
        " CASE WHEN hash(l_orderkey*17+l_linenumber)%79=2 THEN 9.9e12"
        "      ELSE l_extendedprice END AS l_extendedprice,"
        " CASE WHEN hash(l_orderkey*19+l_linenumber)%83=3 THEN 1.5"
        "      ELSE l_discount END AS l_discount,"
        " l_tax, l_returnflag, l_linestatus, l_shipdate FROM t"
    ),
    "orders": (
        "SELECT o_orderkey, o_custkey, o_orderstatus,"
        " CASE WHEN hash(o_orderkey*5)%89=0 THEN 0.0"
        "      WHEN hash(o_orderkey*5)%97=1 THEN -o_totalprice"
        "      ELSE o_totalprice END AS o_totalprice,"
        " CASE WHEN hash(o_orderkey*23)%101=2 THEN TIMESTAMP '2199-12-31 23:59:59'"
        "      WHEN hash(o_orderkey*23)%103=3 THEN TIMESTAMP '1970-01-01 00:00:00'"
        "      ELSE o_orderdate END AS o_orderdate,"
        " o_orderpriority FROM t"
    ),
    "events": (
        "SELECT event_id, ts, user_id, event_type,"
        " CASE WHEN hash(event_id*29)%107=0 THEN 'NaN'::DOUBLE"
        "      WHEN hash(event_id*29)%109=1 THEN 'Infinity'::DOUBLE"
        "      WHEN hash(event_id*29)%113=2 THEN -1e308"
        "      ELSE value END AS value, props FROM t"
    ),
    "embeddings": (
        "SELECT vec_id,"
        " CASE WHEN hash(vec_id*31)%127=0 THEN"
        "      CAST(list_transform(embedding, x -> 0.0) AS FLOAT[])"
        "      WHEN hash(vec_id*31)%131=1 THEN"
        "      CAST(list_transform(embedding, x -> 'NaN'::FLOAT) AS FLOAT[])"
        "      ELSE embedding END AS embedding, label FROM t"
    ),
}

# unicode mode: non-ASCII payloads the way a multilingual crawl looks —
# each slice gets one script/feature family so a failure names its class.
UNICODE_INJECT = {
    "documents": (
        "SELECT doc_id,"
        " CASE WHEN hash(doc_id*37)%41=0 THEN text || ' \U0001F469‍\U0001F469‍\U0001F467‍\U0001F466 \U0001F30D émoji'"
        "      WHEN hash(doc_id*37)%43=1 THEN '漢字テスト中文 ' || text"
        "      WHEN hash(doc_id*37)%47=2 THEN replace(text, 'e', 'é')"
        "      WHEN hash(doc_id*37)%53=3 THEN 'مرحبا بالعالم ' || text"
        "      WHEN hash(doc_id*37)%59=4 THEN text || chr(9) || chr(160) || chr(8232) || 'tail'"
        "      ELSE text END AS text,"
        " lang, source, n_chars FROM t"
    ),
}

# trunc mode: cut document text short — byte-prefix at 64 chars on one
# hash slice, empty string on another (crawler-truncated records).
TRUNC_INJECT = {
    "documents": (
        "SELECT doc_id,"
        " CASE WHEN hash(doc_id)%21=0 THEN ''"
        "      WHEN hash(doc_id)%22=0 THEN substr(text, 1, 64)"
        "      ELSE text END AS text,"
        " lang, source, n_chars FROM t"
    ),
}


def build_degraded_dir(mode: str) -> str:
    import duckdb

    dst = DST + ("" if mode == "null" else f"_{mode}")
    os.makedirs(dst, exist_ok=True)
    inject = {"null": INJECT, "nullkey": NULLKEY_INJECT, "trunc": TRUNC_INJECT,
              "nullfk": NULLFK_INJECT, "extreme": EXTREME_INJECT,
              "unicode": UNICODE_INJECT}.get(mode, {})
    dup_tables, dup_step = (
        (DUP_TABLES, 17) if mode == "dup" else (DUPDIM_TABLES, 13) if mode == "dupdim" else (set(), 0)
    )
    con = duckdb.connect()
    for f in glob.glob(SRC + "/*.parquet"):
        t = os.path.basename(f)[: -len(".parquet")]
        if t in inject:
            con.execute(f"CREATE OR REPLACE VIEW t AS SELECT * FROM read_parquet('{f}')")
            con.execute(f"COPY ({inject[t]}) TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        elif t in dup_tables:
            con.execute(f"CREATE OR REPLACE VIEW t AS SELECT * FROM read_parquet('{f}')")
            cols = ", ".join(r[0] for r in con.execute("DESCRIBE t").fetchall())
            con.execute(
                f"COPY (SELECT * FROM t UNION ALL SELECT {cols} FROM "
                f"(SELECT *, row_number() OVER () AS __rn FROM t) x "
                f"WHERE __rn % {dup_step} = 0) TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
            )
        else:
            shutil.copy(f, f"{dst}/{t}.parquet")
    con.close()
    return dst


def main() -> int:
    import __spark_entry__ as em
    from burla_spark.session import get_spark
    from tests.oracle import compare, duck_connection

    # sweeps exercise the READ-SIDE ingest gate (per-row CASE/filter
    # vs the DuckDB INGEST_CTE mirror); normal operation serves
    # validated-fixture copies instead so measure predicates push down
    # to the parquet scan (sources/tables.py, round-10).
    os.environ["SPARK_GRAFT_READSIDE_GATE"] = "1"
    mode = sys.argv[1] if len(sys.argv) > 1 else "null"
    assert mode in (
        "null", "dup", "nullkey", "dupdim", "trunc", "nullfk", "extreme",
        "unicode",
    ), f"unknown mode {mode!r}"
    dst = build_degraded_dir(mode)
    spark = get_spark(app_name=f"{mode}_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    qs, oracles = em.queries(), em.oracle_sql()
    # optional arg 2: comma-separated spec filter — sweep just the
    # named specs across a mode (new-operator iteration); the printed
    # line is tagged so a filtered run can't masquerade as a battery.
    if len(sys.argv) > 2:
        only = set(sys.argv[2].split(","))
        unknown = only - set(qs)
        assert not unknown, f"unknown spec(s) in filter: {sorted(unknown)}"
        qs = {k: v for k, v in qs.items() if k in only}
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
    tag = f"[filtered:{len(qs)}]" if len(sys.argv) > 2 else ""
    print(f"{mode}-sweep{tag}: {len(qs) - len(fails)}/{len(qs)} pass; "
          f"fails={fails}", file=sys.stderr)
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
