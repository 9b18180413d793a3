"""operators/quality.py — single-pass rule compilation and
Observation-based zero-extra-pass accounting."""

from __future__ import annotations

from pyspark.sql import functions as F

from burla_spark.operators.quality import observed_counts, quality_summary
from burla_spark.sources.tables import load_table


def test_quality_summary_matches_direct_counts(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    rules = {
        "high_qty": F.col("l_quantity") > 45,
        "never": F.col("l_orderkey") < 0,
    }
    got = {r["check"]: (r.n_violations, r.n_rows) for r in quality_summary(l, rules).collect()}
    n = l.count()
    high = l.filter("l_quantity > 45").count()
    assert got == {"high_qty": (high, n), "never": (0, n)}


def test_quality_summary_is_single_scan(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    rules = {
        "a": F.col("l_quantity") > 45,
        "b": F.col("l_discount") > 0.08,
        "c": F.col("l_tax") > 0.05,
    }
    plan = quality_summary(l, rules)._jdf.queryExecution().executedPlan().toString()
    # all rules fuse into one aggregate over one scan — rule count must
    # not multiply scans (that's the whole point at 100 TB).
    assert plan.count("FileScan parquet") == 1


def test_observed_counts_ride_existing_action(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    df, obs = observed_counts(l, {"high_qty": F.col("l_quantity") > 45})
    # the "existing job": an unrelated aggregation
    total = df.agg(F.sum("l_quantity")).collect()[0][0]
    assert total > 0
    m = obs.get
    assert m["n_rows"] == l.count()
    assert m["high_qty"] == l.filter("l_quantity > 45").count()


def test_encoding_hygiene_flags_each_defect_class(spark, tmp_path):
    """Round 11: the hygiene scores must actually discriminate — a
    mojibake doc raises n_replacement_docs, a control-byte doc raises
    n_control_docs, invisible-char docs raise n_zero_width_docs, and
    multibyte text pushes bytes_per_char above 1 while tab/newline
    whitespace does NOT count as control."""
    import pandas as pd

    from burla_spark.plans.quality_queries import encoding_hygiene_scores

    docs = pd.DataFrame(
        {
            "doc_id": range(6),
            "source": ["s"] * 6,
            "text": [
                "clean ascii text",
                "broken � decode",
                "bell \x07 byte",
                "tab\tand\nnewline only",  # must NOT count as control
                "nbsp joiner‍",
                "höfn múltibyte",
            ],
            "lang": ["en"] * 6,
            "n_chars": [16] * 6,
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    docs.to_parquet(d / "documents.parquet")
    row = encoding_hygiene_scores(spark, str(d)).collect()[0]
    assert row.n_docs == 6
    assert row.n_replacement_docs == 1
    assert row.n_control_docs == 1, "tab/newline must not flag as control"
    assert row.n_zero_width_docs == 1
    assert row.bytes_per_char > 1.0, "multibyte text must raise the ratio"


def test_k_anonymity_flags_small_cells(spark):
    from burla_spark.plans.quality_queries import (
        K_ANONYMITY_K,
        k_anonymity_audit,
    )

    # pinned to the driver's correctness SF: the k=10 threshold flags
    # 35/125 cells there (every cell at sf0.1 holds 93+ members — a
    # larger release is safer, which is the point of the audit)
    rows = k_anonymity_audit(spark, "/root/testdata/sf0.01").collect()
    assert all((r.n_members < K_ANONYMITY_K) == r.risky for r in rows)
    assert any(r.risky for r in rows), (
        "fixture must contain at least one re-identifiable cell or the "
        "flag is vacuous"
    )
    assert any(not r.risky for r in rows)


def test_cross_source_dup_matrix_is_upper_triangular(spark, sf_dir):
    from burla_spark.plans.quality_queries import cross_source_dup_matrix

    rows = cross_source_dup_matrix(spark, sf_dir).collect()
    assert len(rows) >= 1
    assert all(r.source_a <= r.source_b for r in rows)
    assert all(r.n_dup_pairs >= 1 and 0.0 <= r.avg_jaccard <= 1.0 for r in rows)
