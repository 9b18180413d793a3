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


def _mk_docs_parquet(tmp_path, rows):
    import pandas as pd

    d = tmp_path / "sf"
    d.mkdir()
    pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "source": [r[1] for r in rows],
            "text": [r[2] for r in rows],
            "lang": ["en"] * len(rows),
            "n_chars": [len(r[2]) for r in rows],
        }
    ).to_parquet(d / "documents.parquet")
    return str(d)


def _split_of(doc_id: int) -> str:
    b = (doc_id * 2654435761) % 1000000007 % 100
    return "train" if b < 80 else ("val" if b < 90 else "test")


def test_split_leakage_flags_cross_split_neardups(spark, tmp_path):
    """Round 11: a near-identical doc pair whose hash buckets land in
    train and test must surface as an is_cross_split row with the
    test-side doc counted as implicated; a same-split clone pair must
    surface as a non-cross row."""
    from burla_spark.plans.quality_queries import split_leakage_audit

    train_ids = [i for i in range(200) if _split_of(i) == "train"]
    test_ids = [i for i in range(200) if _split_of(i) == "test"]
    assert len(train_ids) >= 2 and len(test_ids) >= 1
    text = " ".join(f"t{j}" for j in range(17))  # 16 bigrams, band 2
    rows = [
        (train_ids[0], "s", text),
        (test_ids[0], "s", text),  # cross-split exact clone
        (train_ids[1], "s", " ".join(f"u{j}" for j in range(17))),
    ]
    # same-split clone pair on a disjoint vocabulary
    clone2 = [i for i in train_ids[2:] if i != train_ids[1]][0]
    rows.append((clone2, "s", rows[2][2]))
    out = {
        (r.split_a, r.split_b): r
        for r in split_leakage_audit(spark, _mk_docs_parquet(tmp_path, rows)).collect()
    }
    leak = out[("train", "test")]
    assert leak.is_cross_split and leak.n_pairs == 1
    assert leak.n_docs_b_implicated == 1  # the test-side doc to drop
    same = out[("train", "train")]
    assert not same.is_cross_split and same.n_pairs == 1


def test_dedup_threshold_sweep_is_monotone(spark, tmp_path):
    """Round 11: pair/doc counts must be non-increasing in the cutoff,
    and a high-similarity pair must survive cutoffs that an 0.5-ish
    pair does not."""
    from burla_spark.plans.quality_queries import (
        SWEEP_THRESHOLDS,
        dedup_threshold_sweep,
    )

    toks = [f"c{j}" for j in range(17)]
    exact_clone = " ".join(toks)
    # shares 11 of its 16 bigrams with exact_clone -> jaccard ~0.52
    partial = " ".join(toks[:12] + [f"z{j}" for j in range(5)])
    rows = [
        (0, "s", exact_clone),
        (1, "s", exact_clone),
        (2, "s", partial),
    ]
    out = {
        float(r.threshold): r
        for r in dedup_threshold_sweep(spark, _mk_docs_parquet(tmp_path, rows)).collect()
    }
    assert set(out) == set(SWEEP_THRESHOLDS)
    counts = [out[t].n_pairs for t in SWEEP_THRESHOLDS]
    assert counts == sorted(counts, reverse=True)
    assert out[0.4].n_pairs > out[0.9].n_pairs
    assert out[0.9].n_pairs == 1 and out[0.9].n_docs_involved == 2
    assert abs(out[0.9].dup_doc_rate - 2 / 3) < 1e-6
    assert all(0.0 <= out[t].avg_jaccard <= 1.0 for t in SWEEP_THRESHOLDS)


def test_ngram_novelty_decay_separates_fresh_from_recrawl(spark, tmp_path):
    """Round 11: a source that re-ingests the same page decays to
    dup_rate 1.0 after the first interval; a source of entirely fresh
    text stays at 0. Checkpoint spine must be powers of two plus the
    final rank, with contiguous interval accounting."""
    from burla_spark.plans.curation import ngram_novelty_decay

    page = " ".join(f"p{j}" for j in range(12))
    rows = [(i, "recrawl", page) for i in range(8)]
    rows += [
        (100 + i, "fresh", " ".join(f"f{i}_{j}" for j in range(12)))
        for i in range(8)
    ]
    out = ngram_novelty_decay(spark, _mk_docs_parquet(tmp_path, rows)).collect()
    by_src: dict[str, list] = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    for src, rs in by_src.items():
        assert [r.checkpoint_docs for r in rs] == [1, 2, 4, 8]
        assert [r.interval_docs for r in rs] == [1, 1, 2, 4]
        assert sum(r.n_occurrences for r in rs) == 8 * 5  # 12 toks -> 5 grams
    re_rates = [r.dup_rate for r in by_src["recrawl"]]
    assert re_rates[0] == 0.0 and re_rates[1:] == [1.0, 1.0, 1.0]
    assert all(r.dup_rate == 0.0 for r in by_src["fresh"])


def test_ann_recall_report_ranks_methods_sanely(spark):
    """Round 11: the recall report must carry real evaluation signal —
    every row bounded, k = 10 everywhere, and the pinned-IVF path (4 of
    16 cells probed, exact re-rank) beating the coarser paths on
    average at the driver SF."""
    from burla_spark.plans.llm import ann_recall_report

    rows = ann_recall_report(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) == 15  # 3 methods x 5 queries
    assert all(r.k == 10 and 0.0 <= r.recall_at_k <= 1.0 for r in rows)
    mean = {}
    for r in rows:
        mean.setdefault(r.method, []).append(r.recall_at_k)
    mean = {m: sum(v) / len(v) for m, v in mean.items()}
    assert mean["ivf"] >= 0.8, mean
    assert mean["ivf"] >= mean["lsh"] and mean["ivf"] >= mean["pq"], mean
    assert all(v > 0.2 for v in mean.values()), mean


def test_cluster_histogram_partitions_corpus(spark, tmp_path):
    """Round 11: histogram must report the mega-cluster, the pair, and
    the singleton mass — and corpus_frac must partition to 1."""
    from burla_spark.plans.llm import dedup_cluster_size_histogram

    mega = " ".join(f"m{j}" for j in range(17))
    pair = " ".join(f"p{j}" for j in range(17))
    rows = [(i, "s", mega) for i in range(4)]
    rows += [(10, "s", pair), (11, "s", pair)]
    rows += [(20, "s", " ".join(f"u{j}" for j in range(17)))]
    rows += [(21, "s", " ".join(f"v{j}" for j in range(17)))]
    out = {
        r.cluster_size: r
        for r in dedup_cluster_size_histogram(
            spark, _mk_docs_parquet(tmp_path, rows)
        ).collect()
    }
    assert set(out) == {1, 2, 4}
    assert out[4].n_clusters == 1 and out[4].n_docs == 4
    assert out[2].n_clusters == 1 and out[2].n_docs == 2
    assert out[1].n_clusters == 2 and out[1].n_docs == 2
    assert abs(sum(r.corpus_frac for r in out.values()) - 1.0) < 1e-6


def test_embedding_hygiene_counts_each_defect_class(spark, tmp_path):
    """Round 11: the pre-gate hygiene report must count every defect
    class the ingest gate quarantines — null vector, null COMPONENT
    (a decoder-dropped value; pandas even writes in-list NaN this
    way), real NaN, Inf, zero norm — and admit the healthy remainder.
    Fixture written via DuckDB so NaN/Inf survive as float values."""
    import duckdb

    from burla_spark.plans.quality_queries import embedding_hygiene_report

    d = tmp_path / "sf"
    d.mkdir()
    good = "[1.0" + ", 0.0" * 63 + "]"
    zero = "[0.0" + ", 0.0" * 63 + "]"
    nanv = "['NaN'::FLOAT" + ", 0.0" * 63 + "]"
    infv = "['Infinity'::FLOAT" + ", 0.0" * 63 + "]"
    nullc = "[NULL::FLOAT" + ", 0.0" * 63 + "]"
    duckdb.sql(
        f"""COPY (
          SELECT * FROM (VALUES
            (0, CAST({good} AS FLOAT[]), 'a'),
            (1, NULL, 'a'),
            (2, CAST({nanv} AS FLOAT[]), 'a'),
            (3, CAST({infv} AS FLOAT[]), 'a'),
            (4, CAST({zero} AS FLOAT[]), 'a'),
            (5, CAST({nullc} AS FLOAT[]), 'a'),
            (6, CAST({good} AS FLOAT[]), 'b')
          ) t(vec_id, embedding, label)
        ) TO '{d}/embeddings.parquet' (FORMAT PARQUET)"""
    )
    out = {r.label: r for r in embedding_hygiene_report(spark, str(d)).collect()}
    a = out["a"]
    assert a.n_vecs == 6 and a.n_null_vec == 1 and a.n_null_component == 1
    assert a.n_nonfinite == 2 and a.n_zero_norm == 1 and a.n_admitted == 1
    assert abs(a.admit_rate - round(1 / 6, 6)) < 1e-9
    assert out["b"].n_admitted == 1 and out["b"].admit_rate == 1.0


def test_minhash_estimator_tracks_true_jaccard(spark, sf_dir):
    """Round 12: the estimator-quality report must show the signature-
    agreement estimate tracking exact Jaccard — bounded mean absolute
    error per band, bands confined to [threshold*20, 20], and the
    accounting consistent (pair counts positive, means inside the
    band's true-Jaccard range)."""
    from burla_spark.plans.quality_queries import minhash_estimator_quality

    rows = minhash_estimator_quality(spark, sf_dir).collect()
    assert rows, "verified pairs exist at sf0.001"
    for r in rows:
        assert 10 <= r.jaccard_band <= 20
        assert r.n_pairs > 0
        assert 0.0 <= r.mean_est <= 1.0
        # 32 hashes: binomial std ~= sqrt(j(1-j)/32) <= 0.09; the mean
        # over a band must track well within a few sigma
        assert r.mean_abs_err <= 0.15, r
        assert r.max_abs_err <= 0.35, r


def test_dedup_token_savings_accounting_balances(spark, tmp_path):
    """Round 12: savings must equal the tokens of the non-keeper
    component members, and sources without duplicates report zero."""
    from burla_spark.plans.quality_queries import dedup_token_savings

    dup = " ".join(f"d{j}" for j in range(20))
    rows = [(1, "a", dup), (2, "a", dup), (3, "a", dup)]
    rows += [(10, "b", " ".join(f"x{j}" for j in range(12)))]
    out = {
        r.source: r
        for r in dedup_token_savings(
            spark, _mk_docs_parquet(tmp_path, rows)
        ).collect()
    }
    assert out["a"].n_docs == 3 and out["a"].n_docs_removed == 2
    assert out["a"].tokens_total == 60 and out["a"].tokens_removed == 40
    assert abs(out["a"].pct_tokens_removed - 2 / 3) < 1e-6
    assert out["b"].n_docs_removed == 0 and out["b"].tokens_removed == 0


def test_packing_utilization_non_increasing_in_ctx_len(spark, sf_dir):
    """Round 12: padded capacity at context 2L is >= capacity at L for
    every doc (rounding up to a multiple of a larger block), so the
    utilization curve must be non-increasing across the doubling
    lengths — and the sequence accounting must be exact."""
    from burla_spark.plans.quality_queries import packing_efficiency_curve

    rows = sorted(
        packing_efficiency_curve(spark, sf_dir).collect(),
        key=lambda r: r.ctx_len,
    )
    assert [r.ctx_len for r in rows] == [256, 512, 1024, 2048]
    for r in rows:
        assert r.padded_tokens == r.n_sequences * r.ctx_len
        assert r.total_tokens <= r.padded_tokens
    for a, b in zip(rows, rows[1:]):
        assert a.total_tokens == b.total_tokens  # same corpus
        assert b.utilization <= a.utilization + 1e-9


def test_ingest_rate_anomaly_flags_injected_burst(spark, tmp_path):
    """Round 12: a uniform 1-event-per-bucket feed with one 50-event
    burst bucket must flag exactly that bucket (z >> 3) and nothing
    else; a perfectly uniform type has zero variance and no flags."""
    import pandas as pd

    from burla_spark.plans.quality_queries import ingest_rate_anomaly

    base = 1_700_000_000
    ts, types = [], []
    for b in range(40):  # uniform: one event per 10-min bucket
        ts.append(base + b * 600)
        types.append("steady")
    for b in range(40):
        n = 50 if b == 7 else 1  # burst in bucket 7
        for k in range(n):
            ts.append(base + b * 600 + k)
            types.append("bursty")
    d = tmp_path / "sf"
    d.mkdir()
    pd.DataFrame(
        {
            "event_id": range(len(ts)),
            # datetime64[us]: pandas defaults to NANOS, which Spark's
            # vectorized parquet reader rejects outright
            "ts": pd.to_datetime(ts, unit="s").astype("datetime64[us]"),
            "user_id": [1] * len(ts),
            "event_type": types,
            "value": [1.0] * len(ts),
            "props": ["{}"] * len(ts),
        }
    ).to_parquet(d / "events.parquet")
    out = {r.event_type: r for r in ingest_rate_anomaly(spark, str(d)).collect()}
    assert out["steady"].n_anomalous_buckets == 0
    assert out["steady"].max_z == 0.0  # zero variance -> z defined as 0
    assert out["bursty"].n_anomalous_buckets == 1
    assert out["bursty"].max_z > 3.0
    assert out["bursty"].peak_rate == 50


def test_dedup_excise_ties_out_to_coverage(spark, sf_dir):
    """The removal ACTION and the removal ACCOUNTING must agree
    (VERDICT r12 #1): dedup_excise_spans.removed_tokens is the same
    interval union repeated_ngram_coverage prices as covered_tokens —
    a drift between them would mean the engine removes text it did
    not account for (or vice versa). Also: the splice itself is
    internally consistent (kept + removed = total; a doc with zero
    removals keeps its exact original text)."""
    from burla_spark.plans.curation import (
        dedup_excise_spans,
        repeated_ngram_coverage,
    )

    excised = dedup_excise_spans(spark, sf_dir)
    coverage = repeated_ngram_coverage(spark, sf_dir)
    joined = excised.alias("e").join(
        coverage.alias("c"), "doc_id", "inner"
    )
    assert joined.count() == excised.count() == coverage.count()
    assert (
        joined.filter(F.col("e.removed_tokens") != F.col("c.covered_tokens"))
        .count()
        == 0
    ), "excise removal must equal the coverage interval union"
    assert (
        excised.filter(
            F.col("removed_tokens") + F.col("kept_tokens") != F.col("n_tokens")
        ).count()
        == 0
    )
    # zero-removal docs round-trip byte-identically
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    untouched = (
        excised.filter(F.col("removed_tokens") == 0)
        .join(docs, "doc_id")
        .filter(F.col("text_clean") != F.col("text"))
    )
    assert untouched.count() == 0
