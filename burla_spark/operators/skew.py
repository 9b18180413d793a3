"""Skew-mitigation operators (SURVEY.md §4 P7-adjacent; the 100 TB
hot-key story).

AQE's skew-join splitting (on in session.py) handles most cases at
runtime; these helpers cover the two patterns AQE can't:

* ``salted_aggregate`` — two-phase agg through an explicit salt for
  hot grouping keys whose PARTIAL aggregation state itself is the
  bottleneck (e.g. collect-like or high-cardinality-per-key state).
* ``salted_broadcast_left`` — replicate-broadcast join where the big
  side's hot keys would overload single reducers in a shuffle join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def with_salt(df: DataFrame, buckets: int) -> DataFrame:
    """Deterministic row salt in [0, buckets): derived from a stable
    hash of the whole row (monotonically_increasing_id would break
    retry determinism).

    Project ``df`` to the columns you actually need FIRST: the salt
    hash reads every column of its input, so salting a wide table
    defeats the scan's projection pruning (tests/test_plan_lint.py
    enforces this on registry queries)."""
    h = F.xxhash64(*[F.col(c) for c in df.columns])
    return df.withColumn(SALT, F.pmod(h, F.lit(buckets)).cast("int"))


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, Column],
    buckets: int = 16,
    reaggs: dict[str, Column] | None = None,
) -> DataFrame:
    """Two-phase aggregation through a salt: groupBy(keys+salt) spreads
    each hot key over `buckets` reducers, then a tiny second agg merges
    per-salt partials.

    ``aggs`` maps output column → phase-1 aggregate expression;
    ``reaggs`` maps the same output column → phase-2 merge expression
    (defaults to SUM for every column — correct for sum/count)."""
    phase1 = (
        with_salt(df, buckets)
        .groupBy(*keys, SALT)
        .agg(*[c.alias(name) for name, c in aggs.items()])
    )
    reaggs = reaggs or {name: F.sum(name) for name in aggs}
    return phase1.groupBy(*keys).agg(
        *[c.alias(name) for name, c in reaggs.items()]
    )


def salted_broadcast_left(
    big: DataFrame,
    small: DataFrame,
    on: str,
    buckets: int = 8,
) -> DataFrame:
    """Join a skewed big side to a small side without shuffling the big
    side's hot keys to single reducers: salt the big side, explode the
    small side ×buckets, equi-join on (key, salt). Falls back to plain
    broadcast semantics — result is identical to big.join(small, on)."""
    big_salted = with_salt(big, buckets)
    small_exploded = small.withColumn(
        SALT, F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    ).withColumn(SALT, F.col(SALT).cast("int"))
    out = big_salted.join(F.broadcast(small_exploded), [on, SALT])
    return out.drop(SALT)
