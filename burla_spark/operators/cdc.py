"""CDC / SCD-type-2 merge emulation (no Delta in this image — the
anti-join + union + window recipe, as MERGE INTO would do on a lakehouse
table).

scd2_apply(current, updates, key, compare_cols) →
  * rows untouched by updates pass through,
  * matched rows are CLOSED (is_current=false) and a new open version
    is appended with version = old version + 1.

Scale: one shuffle on the key for the anti/semi joins + the version
window; updates are usually tiny → broadcast.
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
        current.join(F.broadcast(updates.select(key)), key, "left_semi")
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
