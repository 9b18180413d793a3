"""Relational coverage, batch 7 — bitwise aggregates, ordered string
aggregation (LISTAGG / string_agg), and null-safe ``try_*`` arithmetic
(the ANSI-mode-friendly error-to-NULL path).

Determinism notes (ENGINEERING_NOTES.md contract):
* bit_and/bit_or/bit_xor are order-independent folds — safe under any
  shuffle order on both engines.
* LISTAGG is only deterministic WITH an explicit WITHIN GROUP order and
  DISTINCT elements — both supplied here (Spark 4 LISTAGG ... WITHIN
  GROUP ≡ DuckDB string_agg(... ORDER BY)).
* the try_divide quotient is aggregated with MIN/MAX, never SUM —
  per-row IEEE division is bit-identical on both engines and MIN/MAX
  involve no accumulation (contract rule for q2), whereas summing and
  rounding a double stream hits half-way boundary disagreements. The
  oracle spells try_divide as CASE WHEN denom = 0 THEN NULL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from burla_spark.plans.base import QuerySpec
from burla_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# bitwise aggregates + ordered LISTAGG per group — one pass, all folds
# partial-aggregate map-side (order-independent), so the shuffle
# carries one row per (group) regardless of input size.
# ---------------------------------------------------------------------------
def agg_bitwise_stringagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("__b7_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(bit_and(l_linenumber) AS BIGINT) AS and_linenumber,
               CAST(bit_or(l_linenumber)  AS BIGINT) AS or_linenumber,
               CAST(bit_xor(l_orderkey)   AS BIGINT) AS xor_orderkey,
               listagg(DISTINCT l_linestatus, ',')
                 WITHIN GROUP (ORDER BY l_linestatus) AS statuses
        FROM __b7_lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """
    )


AGG_BITWISE_SQL = """
SELECT l_returnflag,
       CAST(bit_and(l_linenumber) AS BIGINT) AS and_linenumber,
       CAST(bit_or(l_linenumber)  AS BIGINT) AS or_linenumber,
       CAST(bit_xor(l_orderkey)   AS BIGINT) AS xor_orderkey,
       string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus) AS statuses
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# try_* arithmetic — division-by-zero and bad casts become NULLs
# instead of task failures. Under Spark 4's default ANSI mode a single
# malformed row would otherwise kill a 100 TB job at stage 40; the
# try_* family is the production answer, so it's first-class here.
# ---------------------------------------------------------------------------
def try_arithmetic_nullsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    td = F.try_divide(F.col("l_extendedprice"), F.col("l_quantity") - F.lit(30.0))
    cast_probe = F.expr(
        "try_cast(CASE WHEN l_linenumber <= 2 THEN CAST(l_linenumber AS STRING) "
        "ELSE 'not_a_number' END AS INT)"
    )
    return (
        l.select("l_returnflag", td.alias("td"), cast_probe.alias("tc"), "l_linenumber")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.when(F.col("td").isNull(), 1)).alias("n_div_by_zero"),
            F.min("td").alias("min_safe_ratio"),
            F.max("td").alias("max_safe_ratio"),
            F.count("tc").alias("n_cast_ok"),
            F.sum(F.expr("try_add(l_linenumber, 1)")).cast("long").alias("sum_ln1"),
        )
        .orderBy("l_returnflag")
    )


TRY_ARITHMETIC_SQL = """
WITH t AS (
  SELECT l_returnflag,
         CASE WHEN l_quantity = 30 THEN NULL
              ELSE l_extendedprice / (l_quantity - 30.0) END AS td,
         TRY_CAST(CASE WHEN l_linenumber <= 2 THEN CAST(l_linenumber AS VARCHAR)
                       ELSE 'not_a_number' END AS INT) AS tc,
         l_linenumber
  FROM lineitem
)
SELECT l_returnflag,
       COUNT(CASE WHEN td IS NULL THEN 1 END) AS n_div_by_zero,
       MIN(td) AS min_safe_ratio,
       MAX(td) AS max_safe_ratio,
       COUNT(tc) AS n_cast_ok,
       CAST(SUM(l_linenumber + 1) AS BIGINT) AS sum_ln1
FROM t
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# hashing / encoding scalar functions — content addressing and
# fingerprint columns (md5 / sha2-256 / hex / base64 verified
# byte-identical against DuckDB). At scale these are the JVM-side
# fingerprints dedup manifests and cache keys are built from.
# ---------------------------------------------------------------------------
def hash_encoding_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 200)
    return c.select(
        "c_custkey",
        F.md5("c_name").alias("name_md5"),
        F.sha2(F.col("c_name"), 256).alias("name_sha256"),
        F.hex(F.col("c_name")).alias("name_hex"),
        F.base64(F.col("c_name").cast("binary")).alias("name_b64"),
    ).orderBy("c_custkey")


HASH_ENCODING_SQL = """
SELECT c_custkey,
       md5(c_name) AS name_md5,
       sha256(c_name) AS name_sha256,
       hex(c_name) AS name_hex,
       base64(CAST(c_name AS BLOB)) AS name_b64
FROM customer WHERE c_custkey < 200
ORDER BY c_custkey
"""


# ---------------------------------------------------------------------------
# null-safe equality join (<=> / IS NOT DISTINCT FROM): the join
# semantic CDC and dimension-key pipelines need when NULL must match
# NULL. Both sides pre-aggregate to key-cardinality before the join, so
# the null-safe comparison runs on tiny inputs at any scale.
# ---------------------------------------------------------------------------
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    key = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    all_counts = o.groupBy(key.alias("k")).agg(F.count("*").alias("n_all"))
    big_counts = (
        o.filter(F.col("o_totalprice") > 200000.0)
        .groupBy(key.alias("k2"))
        .agg(F.count("*").alias("n_big"))
    )
    return (
        all_counts.join(big_counts, all_counts.k.eqNullSafe(big_counts.k2), "left")
        .select(F.col("k").alias("status_key"), "n_all", "n_big")
        .orderBy(F.asc_nulls_first("status_key"))
    )


JOIN_NULL_SAFE_SQL = """
WITH a AS (
  SELECT NULLIF(o_orderstatus, 'P') AS k, COUNT(*) AS n_all
  FROM orders GROUP BY 1
), b AS (
  SELECT NULLIF(o_orderstatus, 'P') AS k2, COUNT(*) AS n_big
  FROM orders WHERE o_totalprice > 200000.0 GROUP BY 1
)
SELECT a.k AS status_key, n_all, n_big
FROM a LEFT JOIN b ON a.k IS NOT DISTINCT FROM b.k2
ORDER BY status_key NULLS FIRST
"""


# ---------------------------------------------------------------------------
# string padding / printf formatting — fixed-width codes and composed
# identifiers (report keys, file names). format_string ≡ DuckDB printf.
# ---------------------------------------------------------------------------
def string_format_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 300)
    return c.select(
        "c_custkey",
        F.lpad(F.col("c_mktsegment"), 12, "*").alias("seg_padded"),
        F.rpad(F.col("c_name"), 22, ".").alias("name_padded"),
        # coalesce before formatting, mirrored in the SQL: Spark's
        # format_string renders a NULL arg as the string 'null' while
        # DuckDB's printf nulls the whole result — '' on both sides
        # keeps the engines in agreement under NULL segments.
        F.format_string(
            "%s-%05d",
            F.substring(F.coalesce(F.col("c_mktsegment"), F.lit("")), 1, 3),
            F.col("c_custkey"),
        ).alias("report_key"),
        F.repeat(F.lit("-"), 4).alias("rule"),
    ).orderBy("c_custkey")


STRING_FORMAT_SQL = """
SELECT c_custkey,
       lpad(c_mktsegment, 12, '*') AS seg_padded,
       rpad(c_name, 22, '.') AS name_padded,
       printf('%s-%05d', substring(COALESCE(c_mktsegment, ''), 1, 3), c_custkey) AS report_key,
       repeat('-', 4) AS rule
FROM customer WHERE c_custkey < 300
ORDER BY c_custkey
"""


# ---------------------------------------------------------------------------
# to_json write side — struct → JSON string (the serialization twin of
# from_json/get_json_object; what event producers and API sinks emit).
# Output is byte-identical across engines for string/bigint fields;
# doubles are excluded (engines format them differently).
# ---------------------------------------------------------------------------
def to_json_serialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    # ignoreNullFields=false: Spark's to_json DROPS null struct fields
    # by default, while DuckDB's to_json renders "cust":null — a NULL
    # o_custkey (nullfk-sweep find) must serialize identically. The
    # explicit-null form is also what a downstream schema-on-read
    # consumer wants: absent-vs-null is a real distinction.
    payload = F.to_json(
        F.struct(
            F.col("o_orderstatus").alias("status"),
            F.col("o_custkey").alias("cust"),
        ),
        {"ignoreNullFields": "false"},
    )
    return (
        o.select("o_orderkey", payload.alias("payload"))
        .withColumn("rt_status", F.get_json_object("payload", "$.status"))
        .orderBy("o_orderkey")
    )


TO_JSON_SQL = """
SELECT o_orderkey,
       to_json(struct_pack(status := o_orderstatus, cust := o_custkey)) AS payload,
       json_extract_string(
         to_json(struct_pack(status := o_orderstatus, cust := o_custkey)),
         '$.status') AS rt_status
FROM orders WHERE o_orderkey < 500
ORDER BY o_orderkey
"""


# ---------------------------------------------------------------------------
# IGNORE NULLS window carry-forward (LOCF) — the gauge-fill semantic:
# sparse readings (here: value only on 'purchase' events) carried
# forward per user in event-time order. Spark's last(ignorenulls=True)
# ≡ DuckDB's LAST_VALUE(x IGNORE NULLS); the frame must stop at
# CURRENT ROW or the carry looks ahead.
# ---------------------------------------------------------------------------
def window_ignore_nulls_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    sparse = F.when(F.col("event_type") == "purchase", F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        e.select(
            "event_id",
            "user_id",
            "ts",
            F.last(sparse, ignorenulls=True).over(w).alias("last_purchase_value"),
        )
        .filter(F.col("user_id") < 50)
        .orderBy("user_id", "ts", "event_id")
    )


WINDOW_IGNORE_NULLS_SQL = """
SELECT event_id, user_id, ts,
       LAST_VALUE(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS last_purchase_value
FROM events
WHERE user_id < 50
ORDER BY user_id, ts, event_id
"""


# ---------------------------------------------------------------------------
# array set operations — intersect/union/except as element-level set
# algebra (vocabulary overlap per document vs a probe set). Both
# engines dedup; array_sort canonicalizes order so results hash-match.
# ---------------------------------------------------------------------------
def array_set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from burla_spark.operators.text import tokens

    # NULL text excluded on both sides: Spark array_union(NULL, x) is
    # NULL while DuckDB list_concat(NULL, x) is x — pick a convention.
    d = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 50) & F.col("text").isNotNull()
    )
    probe = F.array(*[F.lit(w) for w in ("data", "spark", "big", "fast")])
    vocab = F.array_sort(F.array_distinct(tokens(F.col("text"))))
    return d.select(
        "doc_id",
        F.array_join(F.array_sort(F.array_intersect(vocab, probe)), "\x1f").alias(
            "common_words"
        ),
        F.size(F.array_sort(F.array_union(vocab, probe)))
        .cast("long")
        .alias("n_union"),
        F.size(F.array_except(vocab, probe)).cast("long").alias("n_rest"),
    ).orderBy("doc_id")


ARRAY_SET_OPS_SQL = r"""
WITH d AS (
  SELECT doc_id,
         list_sort(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS vocab
  FROM documents WHERE doc_id < 50 AND text IS NOT NULL
)
SELECT doc_id,
       -- COALESCE to '': DuckDB's list_sort([]) AND array_to_string([])
       -- both return NULL where Spark's array_sort([])/array_join([])
       -- return []/'' — an EMPTY intersect (blank/truncated text,
       -- trunc-sweep find) must render '' in both engines.
       COALESCE(array_to_string(list_sort(list_intersect(vocab, ['data','spark','big','fast'])), chr(31)), '') AS common_words,
       len(list_distinct(list_concat(vocab, ['data','spark','big','fast']))) AS n_union,
       len(list_filter(vocab, x -> NOT list_contains(['data','spark','big','fast'], x))) AS n_rest
FROM d
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# GROUPING() flags over CUBE — disambiguates "NULL because this level
# aggregates the column away" from "NULL data value"; the gid column is
# the canonical level selector downstream BI reads. Same one-pass
# expand+agg plan as any cube.
# ---------------------------------------------------------------------------
_GROUPING_ID_SQL_BODY = """
SELECT CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL'
            ELSE o_orderstatus END AS status,
       CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL'
            ELSE o_orderpriority END AS priority,
       CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT)
         AS gid,
       COUNT(*) AS n_orders
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
ORDER BY gid, status, priority
"""


def grouping_id_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_GROUPING_ID_SQL_BODY)


SPECS = [
    QuerySpec(
        name="string_format_functions",
        spark=string_format_functions,
        oracle=STRING_FORMAT_SQL,
        tags=("scalar", "string"),
        doc="lpad/rpad/repeat/format_string (printf) formatting",
    ),
    QuerySpec(
        name="to_json_serialize",
        spark=to_json_serialize,
        oracle=TO_JSON_SQL,
        tags=("scalar", "json"),
        doc="struct → JSON string serialization (write side)",
    ),
    QuerySpec(
        name="window_ignore_nulls_locf",
        spark=window_ignore_nulls_locf,
        oracle=WINDOW_IGNORE_NULLS_SQL,
        tags=("window", "null"),
        doc="IGNORE NULLS carry-forward (LOCF) window",
    ),
    QuerySpec(
        name="array_set_operations",
        spark=array_set_operations,
        oracle=ARRAY_SET_OPS_SQL,
        tags=("scalar", "array"),
        doc="array intersect/union/except with sorted canonical form",
    ),
    QuerySpec(
        name="grouping_id_flags",
        spark=grouping_id_flags,
        oracle=_GROUPING_ID_SQL_BODY,
        tags=("agg", "cube"),
        doc="GROUPING() level flags over CUBE (same SQL both engines)",
    ),
    QuerySpec(
        name="hash_encoding_functions",
        spark=hash_encoding_functions,
        oracle=HASH_ENCODING_SQL,
        tags=("scalar",),
        doc="md5/sha2/hex/base64 fingerprint columns",
    ),
    QuerySpec(
        name="join_null_safe",
        spark=join_null_safe,
        oracle=JOIN_NULL_SAFE_SQL,
        tags=("join", "null"),
        doc="null-safe equality join (<=> / IS NOT DISTINCT FROM)",
    ),
    QuerySpec(
        name="agg_bitwise_stringagg",
        spark=agg_bitwise_stringagg,
        oracle=AGG_BITWISE_SQL,
        tags=("agg",),
        doc="bit_and/bit_or/bit_xor folds + ordered LISTAGG",
    ),
    QuerySpec(
        name="try_arithmetic_nullsafe",
        spark=try_arithmetic_nullsafe,
        oracle=TRY_ARITHMETIC_SQL,
        tags=("scalar", "null"),
        doc="try_divide/try_cast/try_add error-to-NULL semantics",
    ),
]
