"""Vector math over ``array<float>`` columns — pure Catalyst expressions.

Everything here stays JVM-side (``F.aggregate`` / ``F.zip_with`` compile
to codegen'd higher-order functions), so similarity scans over billions
of embeddings never cross the Python boundary.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def double_vec(a: Column) -> Column:
    """Element-wise cast to double — the shared first step of every
    precomputed-norm cosine pipeline (cast once per vector, then
    ``l2_norm(vd)`` once per side and ``dot(vd_a, vd_b)`` per pair:
    bit-identical to the per-pair form, 2/3 less work)."""
    return F.transform(a, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<numeric> columns (JVM-side)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity; matches DuckDB list_cosine_similarity on
    non-degenerate vectors. A zero vector yields NULL (ranks last under
    DESC ordering) — under Spark 4's default ANSI mode a plain divide
    would ABORT the whole query with DIVIDE_BY_ZERO the first time a
    zero embedding appears, and real corpora contain them."""
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    return F.try_divide(dot(ad, bd), l2_norm(ad) * l2_norm(bd))
