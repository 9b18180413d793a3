"""Python UDF / UDAF / UDTF surface (SURVEY.md §2.B "compatibility
heart") — the reference runs arbitrary Python per input (A1); our
engine exposes every Spark Python-execution shape, each verified
against a DuckDB oracle.

Determinism notes: Python float accumulation is made oracle-exact by
(a) math.fsum (correctly-rounded sum) over integer-valued columns, or
(b) per-row arithmetic only (IEEE ops match any engine bit-for-bit).
Arrow batches carry the data — no row-at-a-time pickling anywhere.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from burla_spark.plans.base import QuerySpec
from burla_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# vectorized scalar pandas UDF (Arrow-batched; the fast Python path)
# ---------------------------------------------------------------------------
def pandas_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    @pandas_udf("double")
    def net_price(ext: pd.Series, disc: pd.Series) -> pd.Series:
        # per-row IEEE double ops — bit-identical to the SQL expression
        return ext * (1.0 - disc)

    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.select(
            "l_orderkey",
            "l_linenumber",
            net_price("l_extendedprice", "l_discount").alias("net_price"),
        )
        .filter(F.col("net_price") > 80000.0)
    )


PANDAS_SCALAR_SQL = """
SELECT l_orderkey, l_linenumber, l_extendedprice * (1.0 - l_discount) AS net_price
FROM lineitem
WHERE l_extendedprice * (1.0 - l_discount) > 80000.0
"""


# ---------------------------------------------------------------------------
# grouped-aggregate pandas UDF (UDAF)
# ---------------------------------------------------------------------------
def pandas_udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    @pandas_udf("double")
    def exact_sum(qty: pd.Series) -> float:
        # fsum = correctly-rounded sum; on integer-valued quantities it
        # equals any engine's sum in any order. dropna mirrors SQL SUM
        # (NULL-skipping): a quarantined quantity arrives as NaN and
        # fsum would otherwise poison the whole group (extreme sweep).
        return math.fsum(qty.dropna())

    # grouped-agg pandas UDFs can't mix with JVM aggregates in one agg —
    # the row count is a second pandas UDAF.
    @pandas_udf("long")
    def n_rows_udaf(qty: pd.Series) -> int:
        return len(qty)

    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            exact_sum("l_quantity").alias("sum_qty"),
            n_rows_udaf("l_quantity").alias("n_rows"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


PANDAS_UDAF_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# grouped-map applyInPandas — the reference's "aggregate stage" shape
# (README.md:125): whole group in, whole frame out.
# ---------------------------------------------------------------------------
def applyinpandas_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    def rank_within_nation(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["c_acctbal", "c_custkey"], ascending=[False, True]
        ).reset_index(drop=True)
        pdf["nation_rank"] = range(1, len(pdf) + 1)
        return pdf[pdf["nation_rank"] <= 3][
            ["c_custkey", "c_nationkey", "c_acctbal", "nation_rank"]
        ]

    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").applyInPandas(
        rank_within_nation,
        "c_custkey long, c_nationkey int, c_acctbal double, nation_rank long",
    )


APPLYINPANDAS_SQL = """
SELECT c_custkey, c_nationkey, c_acctbal, nation_rank FROM (
  SELECT c_custkey, c_nationkey, c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal DESC, c_custkey) AS nation_rank
  FROM customer
) WHERE nation_rank <= 3
"""


# ---------------------------------------------------------------------------
# mapInPandas iterator — the reference's "predict stage" shape
# (README.md:126): init once per partition (model load), stream batches.
# ---------------------------------------------------------------------------
def mapinpandas_iterator(spark: SparkSession, sf_dir: str) -> DataFrame:
    def score_batches(batches):
        # expensive init happens ONCE per partition, not per row —
        # stand-in for a model load.
        model_bias = 13

        for batch in batches:
            out = pd.DataFrame(
                {
                    "o_orderkey": batch["o_orderkey"],
                    "score": (batch["o_orderkey"] * 7 + model_bias) % 97,
                }
            )
            yield out

    o = load_table(spark, sf_dir, "orders")
    return o.select("o_orderkey").mapInPandas(
        score_batches, "o_orderkey long, score long"
    )


MAPINPANDAS_SQL = """
SELECT o_orderkey, (o_orderkey * 7 + 13) % 97 AS score FROM orders
"""


# ---------------------------------------------------------------------------
# Python UDTF (1 row → N rows) — token stream with positions
# ---------------------------------------------------------------------------
def python_udtf_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="token: string, pos: long")
    class Tokenize:
        def eval(self, text: str):  # noqa: D401
            if text is None:  # NULL docs produce no tokens, not a crash
                return
            for pos, token in enumerate(text.split(), start=1):
                yield token, pos

    spark.udtf.register("tokenize_udtf", Tokenize)
    load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 50
    ).createOrReplaceTempView("__udtf_docs")
    return spark.sql(
        """
        SELECT doc_id, t.token, t.pos
        FROM __udtf_docs, LATERAL tokenize_udtf(text) AS t
        """
    )


PYTHON_UDTF_SQL = r"""
WITH d AS (
  -- trim(text) <> '' mirrors Python str.split(): blank/whitespace-only
  -- text yields NO tokens, where regexp_split_to_array('') yields ['']
  -- and would emit a phantom ('', 1) row (trunc-sweep find). NULL text
  -- is filtered by the same predicate (NULL <> '' is NULL).
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
  FROM documents WHERE doc_id < 50 AND trim(text) <> ''
),
p AS (SELECT UNNEST(generate_series(1, (SELECT MAX(len(toks)) FROM d))) AS pos)
SELECT doc_id, toks[pos] AS token, pos
FROM d, p WHERE pos <= len(toks)
"""


# ---------------------------------------------------------------------------
# the reference's canonical multi-stage pipeline (README.md:123-127:
# "process data" → "aggregate" → "predict") as one lazy Spark plan:
# mapInPandas parse → groupBy/applyInPandas aggregate → iterator-model
# scoring. The reference runs three remote_parallel_map rounds with
# driver round-trips between them; here the stages fuse into one DAG.
# ---------------------------------------------------------------------------
def process_aggregate_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    # stage 1 — process: per-event feature extraction (Arrow batches)
    def process(batches):
        for b in batches:
            out = pd.DataFrame(
                {
                    "user_id": b["user_id"],
                    "is_purchase": (b["event_type"] == "purchase").astype("int64"),
                    "value": b["value"],
                }
            )
            yield out

    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "value")
    processed = e.mapInPandas(process, "user_id long, is_purchase long, value double")

    # stage 2 — aggregate: per-user features (grouped map)
    def aggregate(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [len(pdf)],
                "n_purchases": [int(pdf["is_purchase"].sum())],
                # dropna: SQL SUM ignores NULLs; fsum would propagate NaN
                "total_value": [math.fsum(pdf["value"].dropna())],
            }
        )

    # explicit-width repartition on the grouping key: the fixture-sized
    # exchange is byte-tiny so AQE coalesces it to ONE partition and
    # the per-user grouped-map calls (~2 ms of worker overhead each)
    # run serially in a single task. The keyed repartition matches the
    # groupBy's required distribution (no extra exchange) and is exempt
    # from AQE coalescing; production-scale exchanges are never tiny.
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    features = (
        processed.repartition(n_parts, "user_id")
        .groupBy("user_id")
        .applyInPandas(
            aggregate,
            "user_id long, n_events long, n_purchases long, total_value double",
        )
    )

    # stage 3 — predict: iterator pattern (model "loads" once/partition)
    def predict(batches):
        weights = (0.25, 1.5)  # the "model"
        for b in batches:
            score = weights[0] * b["n_events"] + weights[1] * b["n_purchases"]
            yield pd.DataFrame(
                {
                    "user_id": b["user_id"],
                    "n_events": b["n_events"],
                    "n_purchases": b["n_purchases"],
                    "total_value": b["total_value"].round(2),
                    "score": score,
                }
            )

    return features.mapInPandas(
        predict,
        "user_id long, n_events long, n_purchases long, total_value double, score double",
    )


PROCESS_AGG_PREDICT_SQL = """
SELECT user_id,
  COUNT(*) AS n_events,
  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_value,
  0.25 * COUNT(*) + 1.5 * SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS score
FROM events
GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# Arrow-optimized regular Python UDF (Spark 4 useArrow=True): the
# row-function API with Arrow transport instead of pickle — the upgrade
# path for legacy @udf code that can't be vectorized. Integer-only
# arithmetic keeps it oracle-exact.
# ---------------------------------------------------------------------------
def arrow_python_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.udf("long", useArrow=True)
    def order_bucket(k: int) -> int:
        return (k * 31 + 7) % 1000

    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(order_bucket("o_orderkey").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("bucket")
    )


ARROW_UDF_SQL = """
SELECT (o_orderkey * 31 + 7) % 1000 AS bucket, COUNT(*) AS n_orders
FROM orders GROUP BY 1 ORDER BY bucket
"""


def sql_defined_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined UDFs (Spark 4 ``CREATE FUNCTION … RETURN expr``):
    a scalar function used inside an aggregate and a table function
    used as a relation. Unlike Python UDFs these are pure Catalyst —
    the body inlines into the plan, stays in WholeStageCodegen, and
    costs nothing over writing the expression by hand; they exist for
    reuse/governance (one vetted money formula shared across queries).

    Decimal discipline mirrors Q1 (DECIMAL(12,4) products, ROUND(…, 2)
    before the DOUBLE cast) so the oracle inlines the same arithmetic."""
    from burla_spark.plans.relational2 import register_views

    register_views(spark, sf_dir)
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION disc_price(p DOUBLE, d DOUBLE)
        RETURNS DECIMAL(12,4)
        RETURN CAST(p AS DECIMAL(12,4))
             * CAST(CAST(1 AS DECIMAL(12,4)) - CAST(d AS DECIMAL(12,4)) AS DECIMAL(12,4))
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION qty_bands()
        RETURNS TABLE(band STRING, lo INT, hi INT)
        RETURN SELECT * FROM VALUES
          ('low', 0, 19), ('mid', 20, 39), ('high', 40, 60) t(band, lo, hi)
        """
    )
    return spark.sql(
        """
        SELECT b.band,
               COUNT(*) AS n_rows,
               CAST(ROUND(SUM(disc_price(l_extendedprice, l_discount)), 2)
                 AS DOUBLE) AS revenue
        FROM lineitem l JOIN qty_bands() b
          ON l.l_quantity BETWEEN b.lo AND b.hi
        GROUP BY b.band
        ORDER BY b.band
        """
    )


SQL_DEFINED_FN_SQL = """
WITH bands(band, lo, hi) AS (
  VALUES ('low', 0, 19), ('mid', 20, 39), ('high', 40, 60)
)
SELECT b.band,
       COUNT(*) AS n_rows,
       CAST(ROUND(SUM(
         CAST(l_extendedprice AS DECIMAL(12,4))
         * CAST(CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)) AS DECIMAL(12,4))
       ), 2) AS DOUBLE) AS revenue
FROM lineitem l JOIN bands b ON l.l_quantity BETWEEN b.lo AND b.hi
GROUP BY b.band
ORDER BY b.band
"""


SPECS: list[QuerySpec] = [
    QuerySpec(
        "sql_defined_functions",
        sql_defined_functions,
        SQL_DEFINED_FN_SQL,
        ("udf", "sql"),
        doc="CREATE FUNCTION scalar + table UDFs, fully Catalyst-inlined",
    ),
    QuerySpec(
        "arrow_python_udf",
        arrow_python_udf,
        ARROW_UDF_SQL,
        ("udf",),
        doc="Arrow-optimized row UDF (useArrow=True)",
    ),
    QuerySpec("pandas_scalar_udf", pandas_scalar_udf, PANDAS_SCALAR_SQL, ("udf",)),
    QuerySpec("pandas_udaf_grouped", pandas_udaf_grouped, PANDAS_UDAF_SQL, ("udf", "agg")),
    QuerySpec("applyinpandas_grouped", applyinpandas_grouped, APPLYINPANDAS_SQL, ("udf", "window")),
    QuerySpec("mapinpandas_iterator", mapinpandas_iterator, MAPINPANDAS_SQL, ("udf",)),
    QuerySpec("python_udtf_tokens", python_udtf_tokens, PYTHON_UDTF_SQL, ("udf",)),
    QuerySpec("process_aggregate_predict", process_aggregate_predict, PROCESS_AGG_PREDICT_SQL, ("udf", "pipeline")),
]
