"""As-of join — Spark has no native ASOF JOIN (SURVEY.md §7.3.6), so we
build it from a union + window carry-forward:

    union(right-tagged, left-tagged)
      → window over (key) ordered by (ts, side, payload-struct)
      → last(right_payload, ignoreNulls) carried onto each left row

Semantics match ``ASOF LEFT JOIN ... ON l.key = r.key AND l.ts >= r.ts``
(equal timestamps match; right row sorts before the left at ties).

Scale: ONE hash shuffle on the key + in-partition sort — O(n log n)
per partition, no cross product, no per-group pandas. This is the
pattern that survives 100 TB where a merge_asof-per-group
(applyInPandas) would OOM on hot keys and a range join would explode.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_PAYLOAD = "__asof_payload"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    direction: str = "backward",
    tolerance: str | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_ts <= left_ts`` (direction='backward') or the earliest with
    ``right_ts >= left_ts`` (direction='forward'), per key.

    ``right_cols`` are the right-side columns to carry (must not clash
    with left column names). ``tolerance`` (an interval literal like
    ``'30 minutes'``) nulls out matches farther than that from the left
    timestamp — pandas merge_asof semantics.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    keys = [on] if isinstance(on, str) else list(on)

    payload = F.struct(*[F.col(c) for c in right_cols])
    r = right.select(
        *keys,
        F.col(right_ts).alias("__asof_ts"),
        payload.alias(_PAYLOAD),
        F.lit(0).alias(_SIDE),
    )
    left_cols = left.columns
    l = left.select(
        *left_cols,
        F.col(left_ts).alias("__asof_ts"),
        F.lit(None).cast(r.schema[_PAYLOAD].dataType).alias(_PAYLOAD),
        F.lit(1).alias(_SIDE),
    )
    # Align the union schema: right side gets nulls for left-only columns.
    for c in left_cols:
        if c not in keys:
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    unioned = r.select(l.columns).unionByName(l)

    # Deterministic tiebreaker: two right rows with equal (key, ts)
    # would otherwise make last(payload) partition-order dependent. The
    # payload struct itself (field-wise comparison) is a total order
    # over the carried columns, so the winner is stable across any
    # repartitioning — no unique-id column required of the caller.
    # (Only compares within side=0; left rows carry a NULL payload but
    # are already separated by the _SIDE key.)
    if direction == "backward":
        # right rows sort before left at equal ts → ties match (>=);
        # among equal-ts right rows the max payload wins.
        w = (
            Window.partitionBy(*keys)
            .orderBy(
                F.col("__asof_ts").asc(),
                F.col(_SIDE).asc(),
                F.col(_PAYLOAD).asc_nulls_first(),
            )
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = F.last(_PAYLOAD, ignorenulls=True).over(w)
    else:
        # among equal-ts right rows the min payload wins.
        w = (
            Window.partitionBy(*keys)
            .orderBy(
                F.col("__asof_ts").desc(),
                F.col(_SIDE).asc(),
                F.col(_PAYLOAD).desc_nulls_first(),
            )
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = F.last(_PAYLOAD, ignorenulls=True).over(w)

    # carry the matched right timestamp alongside the payload so a
    # tolerance bound can be enforced after the carry-forward.
    matched = unioned.withColumn("__asof_match", carried).withColumn(
        "__asof_mts",
        F.last(
            F.when(F.col(_SIDE) == 0, F.col("__asof_ts")), ignorenulls=True
        ).over(w),
    ).filter(F.col(_SIDE) == 1)

    if tolerance is not None:
        distance = F.abs(
            F.unix_micros(F.col("__asof_ts")) - F.unix_micros(F.col("__asof_mts"))
        )
        bound = F.unix_micros(
            F.lit("1970-01-01 00:00:00").cast("timestamp")
            + F.expr(f"INTERVAL {tolerance}")
        )
        matched = matched.withColumn(
            "__asof_match",
            F.when(distance <= bound, F.col("__asof_match")),
        )

    out_cols = [F.col(c) for c in left_cols]
    out_cols += [F.col(f"__asof_match.{c}").alias(c) for c in right_cols]
    return matched.select(*out_cols)
