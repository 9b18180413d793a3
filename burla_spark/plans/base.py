"""Query-spec plumbing shared by all plan modules.

Every operator we claim in SURVEY.md §2 ships as a ``QuerySpec``:
a named Spark DataFrame builder plus (when SQL-expressible) the exact
ANSI-SQL oracle DuckDB runs on the same parquet files. The driver
hash-compares the two at sf0.01 — so the pair IS the correctness proof.

Determinism contract (both sides must follow it):
* money/double sums go through DECIMAL casts (order-independent);
* computed integers are BIGINT on both sides;
* any top-k / rank has a unique total order (explicit tiebreak keys).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkBuilder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: SparkBuilder
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    tags: tuple[str, ...] = field(default=())
    doc: str = ""
