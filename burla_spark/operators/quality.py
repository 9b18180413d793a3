"""Data-quality operators — constraint checking for 100 TB pipelines.

Two complementary surfaces:

* :func:`quality_summary` — a declarative rule set compiled into ONE
  conditional-count aggregate pass (no per-rule scans, no UDFs). The
  whole rule list becomes a single map-side partial aggregate: at any
  scale the cost is one scan + a one-row shuffle, then the row is
  unpivoted to (check, n_violations, n_rows) long format.
* :func:`observed_counts` — attach a `pyspark.sql.Observation` so an
  EXISTING job reports row/violation counts as a side effect of the
  action it already runs — zero extra passes. This is how a production
  pipeline gets per-stage data-quality accounting without doubling its
  scan bill.

Reference parity: the reference has no quality operators — users
validate inside `remote_parallel_map` functions row-by-row; here the
rules stay declarative so Catalyst fuses them into the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def quality_summary(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Evaluate named boolean violation rules in one aggregate pass.

    ``rules`` maps check-name → Column that is true when a row VIOLATES
    the check. Returns long-format (check, n_violations, n_rows),
    ordered by check name.
    """
    if not rules:
        raise ValueError("quality_summary needs at least one rule")
    aggs = [
        F.count(F.when(cond, 1)).alias(name) for name, cond in sorted(rules.items())
    ] + [F.count(F.lit(1)).alias("__n_rows")]
    wide = df.agg(*aggs)
    stack_expr = ", ".join(f"'{name}', `{name}`" for name in sorted(rules))
    return (
        wide.select(
            F.expr(
                f"stack({len(rules)}, {stack_expr}) AS (check, n_violations)"
            ),
            F.col("__n_rows").alias("n_rows"),
        )
        .orderBy("check")
    )


def observed_counts(
    df: DataFrame, rules: dict[str, Column]
) -> tuple[DataFrame, Observation]:
    """Attach violation counters to ``df`` without an extra pass.

    Returns (df, observation); after ANY action on the returned df,
    ``observation.get`` holds {"n_rows": ..., <check>: ...}. The
    metrics ride the existing job — on a 1000-executor cluster this is
    free accounting, where a separate validation query would re-scan.
    """
    obs = Observation()
    metrics = [F.count(F.lit(1)).alias("n_rows")] + [
        F.count(F.when(cond, 1)).alias(name) for name, cond in sorted(rules.items())
    ]
    return df.observe(obs, *metrics), obs
