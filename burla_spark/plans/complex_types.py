"""Complex-type surface (SURVEY.md §2.B scalar-functions rows): map
construction/access, higher-order array functions, from_json → struct.
Map results are emitted as (sorted keys, values-by-sorted-key) arrays —
map iteration order is engine-specific, sorted projections are not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from burla_spark.functions.numeric import money_sum
from burla_spark.operators.text import tokens
from burla_spark.plans.base import QuerySpec
from burla_spark.sources.tables import load_table

# Stringified-array separators: ASCII unit/record separators cannot
# appear in the fixture text (tokens are printable), so distinct arrays
# can never serialize to equal strings — '|' could collide with
# punctuation-bearing tokens and weaken the driver's row-hash compare.
US = "\x1f"  # element separator
RS = "\x1e"  # pair separator (nested one level up)


def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a per-user event_type→count map (map_from_entries over a
    sorted collect), then read it back via map_keys/map_values/
    element_at — exercising construction AND access.

    NULL event types are excluded up front: a map cannot hold a NULL
    key — Spark ABORTS with NULL_MAP_KEY the moment one arrives
    (ANSI), while the list-based oracle would happily emit a row — so
    the exclusion is the only semantics both engines can share
    (caught by the round-7 NULL-event_type sweep)."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()
    )
    per_type = e.groupBy("user_id", "event_type").agg(
        F.count("*").alias("n")
    )
    entries = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("event_type", "n")))
        ).alias("type_counts")
    )
    return entries.select(
        "user_id",
        F.array_join(F.map_keys("type_counts"), US).alias("types"),
        F.array_join(
            F.transform(F.map_values("type_counts"), lambda x: x.cast("string")), US
        ).alias("counts"),
        F.coalesce(F.element_at("type_counts", "purchase"), F.lit(0)).alias("n_purchases"),
        F.size("type_counts").cast("long").alias("n_distinct_types"),
    )


MAP_FUNCTIONS_SQL = """
WITH per_type AS (
  SELECT user_id, event_type, COUNT(*) AS n
  FROM events WHERE event_type IS NOT NULL
  GROUP BY user_id, event_type
)
SELECT user_id,
  array_to_string(list_sort(list(event_type)), '|') AS types,
  array_to_string(list_transform(
    list_sort(list({'t': event_type, 'n': n})), x -> CAST(x.n AS VARCHAR)), '|') AS counts,
  COALESCE(MAX(CASE WHEN event_type = 'purchase' THEN n END), 0) AS n_purchases,
  COUNT(*) AS n_distinct_types
FROM per_type
GROUP BY user_id
"""
MAP_FUNCTIONS_SQL = MAP_FUNCTIONS_SQL.replace("'|'", f"'{US}'")


def higher_order_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transform / filter / exists / forall / aggregate over token
    arrays — the lambda-expression surface, all JVM codegen.

    NULL text is excluded on BOTH sides: Spark and DuckDB disagree on
    NULL-array lambda semantics (NULL vs '' propagation), so the
    convention is explicit rather than engine-accidental."""
    d = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 200) & F.col("text").isNotNull()
    )
    toks = tokens(F.col("text"))
    return d.select(
        "doc_id",
        F.array_join(
            F.transform(toks, lambda t: F.length(t).cast("string")), US
        ).alias("token_lengths"),
        F.array_join(F.filter(toks, lambda t: F.length(t) > 5), US).alias(
            "long_tokens"
        ),
        F.exists(toks, lambda t: t == F.lit("spark")).alias("mentions_spark"),
        F.forall(toks, lambda t: F.length(t) < 30).alias("all_short"),
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
        ).alias("total_chars"),
        F.array_join(
            F.zip_with(toks, F.reverse(toks), lambda a, b: F.concat_ws(US, a, b)),
            RS,
        ).alias("palindrome_pairs"),
    )


# COALESCE on every array_to_string: DuckDB returns NULL for an empty
# list where Spark's array_join returns '' (fixture text is never NULL,
# so '' is the one convention both engines can agree on).
HIGHER_ORDER_SQL = r"""
WITH d AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
  FROM documents WHERE doc_id < 200 AND text IS NOT NULL
)
SELECT doc_id,
  COALESCE(array_to_string(list_transform(toks, t -> CAST(LENGTH(t) AS VARCHAR)), '|'), '') AS token_lengths,
  COALESCE(array_to_string(list_filter(toks, t -> LENGTH(t) > 5), '|'), '') AS long_tokens,
  len(list_filter(toks, t -> t = 'spark')) > 0 AS mentions_spark,
  len(list_filter(toks, t -> NOT LENGTH(t) < 30)) = 0 AS all_short,
  CAST(list_sum(list_transform(toks, t -> LENGTH(t))) AS BIGINT) AS total_chars,
  COALESCE(array_to_string(list_transform(generate_series(1, len(toks)),
    i -> toks[i] || '|' || toks[len(toks) - i + 1]), '~'), '') AS palindrome_pairs
FROM d
"""
HIGHER_ORDER_SQL = HIGHER_ORDER_SQL.replace("'|'", f"'{US}'").replace("'~'", f"'{RS}'")


def from_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json with an explicit schema → typed struct column (the
    schema-on-read path; json_extraction covers get_json_object)."""
    e = load_table(spark, sf_dir, "events")
    parsed = e.select(
        "event_id",
        "event_type",
        F.from_json("props", "k int").alias("p"),
    )
    return (
        parsed.select("event_id", "event_type", F.col("p.k").cast("long").alias("k"))
        .filter(F.col("k") % 7 == 0)
    )


FROM_JSON_SQL = """
SELECT event_id, event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) % 7 = 0
"""


def variant_json_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT path: parse_json once into the binary variant
    encoding, typed variant_get extraction, then aggregate.

    At scale VARIANT beats schema-on-read from_json for heterogeneous
    JSON: parsing happens once per row into a compact binary form and
    every later field access is a cheap path lookup, not a re-parse."""
    e = load_table(spark, sf_dir, "events")
    v = e.select(
        "event_type",
        F.parse_json("props").alias("v"),
    ).select(
        "event_type",
        F.variant_get("v", "$.k", "long").alias("k"),
    )
    return (
        v.groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("k_total"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
        .orderBy("event_type")
    )


VARIANT_JSON_SQL = """
SELECT event_type,
       COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_total,
       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_min,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max
FROM events
GROUP BY event_type
ORDER BY event_type
"""


SPECS: list[QuerySpec] = [
    QuerySpec("map_functions", map_functions, MAP_FUNCTIONS_SQL, ("scalar", "map")),
    QuerySpec("higher_order_functions", higher_order_functions, HIGHER_ORDER_SQL, ("scalar",)),
    QuerySpec("from_json_struct", from_json_struct, FROM_JSON_SQL, ("json",)),
    QuerySpec(
        "variant_json_agg",
        variant_json_agg,
        VARIANT_JSON_SQL,
        ("json", "variant"),
        doc="Spark 4 VARIANT: parse once, typed path extraction, agg.",
    ),
]
