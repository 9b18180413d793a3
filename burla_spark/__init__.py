"""burla_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of Burla-Cloud/burla
(reference snapshot at /root/reference, v1.6.1) on top of Apache Spark:

* ``remote_parallel_map`` — the reference's single public operator
  (``client/src/burla/_remote_parallel_map.py:457``) re-built on
  ``mapInPandas`` (see :mod:`burla_spark.rpm`).
* A first-class relational operator surface (scan/filter/join/agg/
  window/sort/set-ops) — the queries the reference's documented examples
  run inside user UDFs (``README.md:123-153``), expressed declaratively
  so Catalyst optimizes them (see :mod:`burla_spark.plans`).
* LLM-data-pipeline operators: dedup (exact / MinHash-LSH / SimHash /
  n-gram Jaccard / embedding-cosine), similarity search, text analysis,
  multimodal column plumbing (see :mod:`burla_spark.operators`).
* Structured Streaming pipelines over the events table
  (see :mod:`burla_spark.streaming`).

Design: DataFrame-first, UDF-last. Every operator is written so the
logical plan survives Catalyst optimization (predicate pushdown, column
pruning, broadcast selection, AQE) — built for a 1000-executor cluster
even though tests run on local[32].
"""

from burla_spark.session import get_spark
from burla_spark.sources.tables import TABLE_NAMES, load_table, register_views
from burla_spark.rpm import remote_parallel_map

__version__ = "0.1.0"

__all__ = [
    "get_spark",
    "load_table",
    "register_views",
    "TABLE_NAMES",
    "remote_parallel_map",
]
