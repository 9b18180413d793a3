"""CDC / SCD-type-2 merge emulation (no Delta in this image — the
anti-join + union + window recipe, as MERGE INTO would do on a lakehouse
table).

scd2_apply(current, updates, key, compare_cols) →
  * rows untouched by updates pass through,
  * matched rows are CLOSED (is_current=false) and a new open version
    is appended with version = old version + 1.

Scale: one shuffle on the key for the anti/semi joins + the version
window; updates batches are usually tiny, but not BOUNDED by
construction (a backfill can replay a whole table), so the semi join
carries no explicit broadcast hint — AQE broadcasts at runtime when
the batch is under threshold and falls back to a shuffled join when
it isn't (round-10 lint rule, tests/test_plan_lint.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    key: str,
    version_col: str = "version",
    current_col: str = "is_current",
) -> DataFrame:
    """Apply an SCD2 batch: ``updates`` must share the schema of
    ``current`` minus the bookkeeping columns."""
    untouched = current.join(updates, key, "left_anti")

    closed = (
        current.join(updates.select(key), key, "left_semi")
        .withColumn(current_col, F.lit(False))
    )

    max_ver = (
        current.groupBy(key).agg(F.max(version_col).alias("__maxv"))
    )
    opened = (
        updates.join(max_ver, key, "left")
        .withColumn(version_col, F.coalesce(F.col("__maxv"), F.lit(0)) + 1)
        .drop("__maxv")
        .withColumn(current_col, F.lit(True))
    )
    cols = current.columns
    return untouched.select(cols).unionByName(closed.select(cols)).unionByName(
        opened.select(cols)
    )
