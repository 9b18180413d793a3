"""Property/behavior tests for the custom operators that have no SQL
oracle: MinHash recall, LSH top-k recall, SimHash stability, as-of
directions, multimodal plumbing.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from burla_spark.operators import dedup as dd
from burla_spark.operators import multimodal as mm
from burla_spark.operators import similarity as sim
from burla_spark.operators.asof import asof_join
from burla_spark.sources.tables import load_table


def _exact_jaccard_pairs(rows, shingle_size=5, threshold=0.5):
    """Brute-force oracle in plain Python (doc list is small at sf0.001)."""
    shingled = {}
    for doc_id, text in rows:
        t = text.lower()
        if len(t) < shingle_size:
            shingled[doc_id] = {t}
        else:
            shingled[doc_id] = {
                t[i : i + shingle_size] for i in range(len(t) - shingle_size + 1)
            }
    out = set()
    ids = sorted(shingled)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            sa, sb = shingled[a], shingled[b]
            j = len(sa & sb) / len(sa | sb)
            if j >= threshold:
                out.add((a, b))
    return out


def test_minhash_lsh_recall_and_precision(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    got = {
        (r.id_a, r.id_b)
        for r in dd.minhash_lsh_pairs(
            d, "doc_id", "text", num_hashes=32, bands=8, threshold=0.5
        ).collect()
    }
    truth = _exact_jaccard_pairs(
        [(r.doc_id, r.text) for r in d.select("doc_id", "text").collect()]
    )
    # every reported pair is exact-verified → precision is 1.0 by
    # construction; LSH recall at J>=0.7 should be near-perfect.
    assert got <= truth
    strong = _exact_jaccard_pairs(
        [(r.doc_id, r.text) for r in d.select("doc_id", "text").collect()],
        threshold=0.7,
    )
    recall = len(got & strong) / max(len(strong), 1)
    assert recall >= 0.8, f"LSH recall {recall} on strong pairs {len(strong)}"


def test_lsh_topk_recall_vs_bruteforce(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    exact = sim.cosine_topk(q, e, "vec_id", "vec_id", "embedding", "embedding", k=10)
    approx = sim.lsh_bucketed_topk(
        q, e, "vec_id", "vec_id", "embedding", "embedding", k=10, num_planes=4
    )
    exact_sets = {}
    for r in exact.collect():
        exact_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = total = 0
    for r in approx.collect():
        total += 1
        if r.neighbor_id in exact_sets.get(r.query_id, set()):
            hits += 1
    assert total > 0
    assert hits / total >= 0.5, f"LSH precision vs exact top-k: {hits}/{total}"


def test_ivf_topk_recall_vs_bruteforce(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    exact = sim.cosine_topk(q, e, "vec_id", "vec_id", "embedding", "embedding", k=10)
    approx = sim.ivf_topk(
        q, e, "vec_id", "vec_id", "embedding", "embedding",
        k=10, n_clusters=8, n_probe=3,
    )
    exact_sets = {}
    for r in exact.collect():
        exact_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = total = 0
    for r in approx.collect():
        total += 1
        if r.neighbor_id in exact_sets.get(r.query_id, set()):
            hits += 1
    assert total > 0
    assert hits / total >= 0.5, f"IVF precision vs exact top-k: {hits}/{total}"


def test_simhash_identical_docs_collide(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, "the quick brown fox jumps"), (3, "completely different words entirely")],
        "doc_id long, text string",
    )
    groups = dd.simhash_collision_groups(df, "doc_id", "text").collect()
    assert len(groups) == 1
    assert groups[0].member_ids == [1, 2]


def test_exact_dedup_drop(spark):
    df = spark.createDataFrame(
        [(1, "aaa"), (2, "aaa"), (3, "bbb")], "doc_id long, text string"
    )
    kept = dd.drop_exact_duplicates(df, "doc_id", "text")
    assert sorted(r.doc_id for r in kept.collect()) == [1, 3]


def test_asof_forward_direction(spark):
    left = spark.createDataFrame(
        [(1, 10, 100.0)], "k long, t long, lv double"
    ).select("k", F.timestamp_seconds("t").alias("lt"), "lv")
    right = spark.createDataFrame(
        [(1, 5, 1.0), (1, 12, 2.0), (1, 20, 3.0)], "k long, t long, rv double"
    ).select("k", F.timestamp_seconds("t").alias("rt"), "rv")
    fwd = asof_join(
        left, right, on="k", left_ts="lt", right_ts="rt",
        right_cols=("rv",), direction="forward",
    ).collect()
    assert fwd[0].rv == 2.0  # earliest right at or after t=10
    back = asof_join(
        left, right, on="k", left_ts="lt", right_ts="rt",
        right_cols=("rv",), direction="backward",
    ).collect()
    assert back[0].rv == 1.0  # latest right at or before t=10


def test_asof_tolerance(spark):
    left = spark.createDataFrame(
        [(1, 1000, 9.0)], "k long, t long, lv double"
    ).select("k", F.timestamp_seconds("t").alias("lt"), "lv")
    right = spark.createDataFrame(
        [(1, 100, 1.0)], "k long, t long, rv double"
    ).select("k", F.timestamp_seconds("t").alias("rt"), "rv")
    # match is 900s old: admitted at 20 minutes tolerance, nulled at 5
    wide = asof_join(
        left, right, on="k", left_ts="lt", right_ts="rt",
        right_cols=("rv",), tolerance="20 minutes",
    ).collect()
    assert wide[0].rv == 1.0
    narrow = asof_join(
        left, right, on="k", left_ts="lt", right_ts="rt",
        right_cols=("rv",), tolerance="5 minutes",
    ).collect()
    assert narrow[0].rv is None


def test_asof_duplicate_ts_deterministic(spark):
    """Two right rows with identical (key, ts) must yield a stable
    winner regardless of partitioning: the payload-struct tiebreaker
    picks max payload backward / min payload forward."""
    left = spark.createDataFrame(
        [(1, 10, 0.0)], "k long, t long, lv double"
    ).select("k", F.timestamp_seconds("t").alias("lt"), "lv")
    dup_rows = [(1, 10, float(v)) for v in (3, 1, 2)]
    for nparts in (1, 3, 7):
        right = (
            spark.createDataFrame(dup_rows, "k long, t long, rv double")
            .repartition(nparts)
            .select("k", F.timestamp_seconds("t").alias("rt"), "rv")
        )
        back = asof_join(
            left, right, on="k", left_ts="lt", right_ts="rt",
            right_cols=("rv",), direction="backward",
        ).collect()
        assert back[0].rv == 3.0, f"nparts={nparts}"
        fwd = asof_join(
            left, right, on="k", left_ts="lt", right_ts="rt",
            right_cols=("rv",), direction="forward",
        ).collect()
        assert fwd[0].rv == 1.0, f"nparts={nparts}"


def test_asof_no_match_is_null(spark):
    left = spark.createDataFrame([(1, 5, 9.0)], "k long, t long, lv double").select(
        "k", F.timestamp_seconds("t").alias("lt"), "lv"
    )
    right = spark.createDataFrame([(1, 10, 1.0)], "k long, t long, rv double").select(
        "k", F.timestamp_seconds("t").alias("rt"), "rv"
    )
    rows = asof_join(
        left, right, on="k", left_ts="lt", right_ts="rt", right_cols=("rv",)
    ).collect()
    assert rows[0].rv is None


def test_kmeans_beats_random_partition(spark, sf_dir):
    """The fixture's label clusters overlap heavily in euclidean space
    (label-centroid nearest-neighbor only classifies ~37%), so purity
    is not a valid oracle; instead assert KMeans finds real structure:
    silhouette must clearly beat a random 10-way partition."""
    from pyspark.ml.evaluation import ClusteringEvaluator
    from pyspark.ml.functions import array_to_vector

    from burla_spark.operators.clustering import kmeans_assign

    e = load_table(spark, sf_dir, "embeddings")
    feats = e.select(
        "vec_id",
        array_to_vector(F.col("embedding").cast("array<double>")).alias("features"),
    )
    assigned = kmeans_assign(e, "vec_id", "embedding", k=10).join(feats, "vec_id")
    evaluator = ClusteringEvaluator(
        predictionCol="cluster", featuresCol="features",
        metricName="silhouette", distanceMeasure="squaredEuclidean",
    )
    km_score = evaluator.evaluate(assigned)

    random_assigned = feats.withColumn(
        "cluster", (F.xxhash64("vec_id") % 10 + 10) % 10
    ).withColumn("cluster", F.col("cluster").cast("long"))
    rnd_score = evaluator.evaluate(random_assigned)
    assert km_score > rnd_score + 0.03, f"kmeans {km_score:.3f} vs random {rnd_score:.3f}"
    # sanity: all points assigned, exactly k clusters
    assert assigned.select("cluster").distinct().count() == 10


def test_multimodal_pipeline(spark):
    df = spark.createDataFrame(
        [(i, bytes([i % 256] * (256 + i)),) for i in range(20)],
        "blob_id long, payload binary",
    )
    with_meta = mm.attach_blob_metadata(df, "payload", "image/fake")
    meta = with_meta.select("blob_id", "blob_meta.*").collect()
    assert all(m.content_type == "image/fake" for m in meta)
    assert all(m.n_bytes >= 256 for m in meta)

    feats = mm.extract_features(with_meta).collect()
    assert all(len(f.features) == mm.FEATURE_DIM for f in feats)
    assert all(abs(sum(f.features) - 1.0) < 1e-9 for f in feats)
    assert all(f.width >= 16 and f.height >= 16 for f in feats)

    frames = mm.sample_frames(df.select("blob_id", "payload"), every_n_bytes=64)
    per_blob = (
        frames.groupBy("blob_id").count().orderBy("blob_id").collect()
    )
    assert per_blob[0]["count"] == (256 + 0) // 64  # 4 frames for blob 0

    resized = mm.decode_and_resize(df, 32, 32).collect()
    assert all(r.out_w == 32 and len(r.resized) <= 32 * 32 // 8 for r in resized)


def test_text_payload_with_image_magic_skips_header_parse(spark):
    """ADVICE r10: a text/plain payload that happens to START with an
    ASCII image magic ('BM', 'GIF87a' — both legal text) must get the
    deterministic byte-derived dims (16 + byte % 64), never the image
    header parser's width/height — the oracle replays byte arithmetic
    for text and would diverge on header-parsed values."""
    texts = [
        "BM" + "x" * 40,  # BMP magic + >=26 bytes
        "GIF87a loves text",  # GIF magic
        "GIF89a also text",
        "plain text control",
    ]
    df = spark.createDataFrame(
        [(i, t.encode()) for i, t in enumerate(texts)],
        "blob_id long, payload binary",
    )
    feats = mm.extract_features(
        mm.attach_blob_metadata(df, "payload", "text/plain")
    ).collect()
    for r, t in zip(sorted(feats, key=lambda r: r.blob_id), texts):
        b = t.encode()
        assert (r.width, r.height) == (16 + b[0] % 64, 16 + b[1] % 64), (
            f"text payload {t[:10]!r} was header-parsed as an image"
        )
    # and an undeclared (no blob_meta) BMP payload still header-parses
    from burla_spark.operators.imagecodec import image_dims

    bmp_like = texts[0].encode()
    if image_dims(bmp_like) is not None:
        raw = mm.extract_features(df.filter("blob_id = 0")).collect()[0]
        assert (raw.width, raw.height) == image_dims(bmp_like)


def test_connected_components_vs_union_find(spark, sf_dir):
    """Label propagation must equal a driver-side union-find on the
    same edges (transitive closure: A~B, B~C ⇒ A,C share a component
    even with no A~C edge)."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23), (5, 5)],
        "id_a long, id_b long",
    )
    got = {
        (r.node, r.component)
        for r in dd.connected_components(edges).collect()
    }
    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for a, b in [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23), (5, 5)]:
        union(a, b)
    want = {(n, find(n)) for n in parent}
    assert got == want


def test_connected_components_path_graph_log_rounds(spark):
    """Pointer doubling must close a long path graph (worst-case
    diameter) in ~log rounds: a 10k-node path converges within the
    50-round cap — min-label propagation alone would need 10k rounds —
    and every node lands in component 0. Also asserts the scoped cache
    cleanup: no pinned RDDs survive the call."""
    edges = spark.range(9_999).selectExpr("id as id_a", "id + 1 as id_b")
    rows = dd.connected_components(edges).collect()
    assert len(rows) == 10_000
    assert all(r.component == 0 for r in rows)
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == 0


def test_minhash_releases_signature_cache(spark, sf_dir):
    """minhash_lsh_pairs must not leak its persisted signature cache
    into the session (a real leak in long-lived sessions before r3)."""
    d = load_table(spark, sf_dir, "documents")
    pairs = dd.minhash_lsh_pairs(d, "doc_id", "text", threshold=0.5)
    assert pairs.count() >= 0
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == 0


def test_dedup_components_on_minhash_pairs(spark, sf_dir):
    """End-to-end: MinHash pairs → component groups; every group's
    members must be transitively connected and keep_id the minimum."""
    d = load_table(spark, sf_dir, "documents")
    pairs = dd.minhash_lsh_pairs(d, "doc_id", "text", threshold=0.5)
    groups = dd.dedup_component_groups(pairs).collect()
    assert len(groups) > 0
    for g in groups:
        assert g.keep_id == min(g.member_ids)
        assert g.n_members == len(g.member_ids) >= 2


def test_kmeans_and_ivf_degrade_on_small_inputs(spark):
    """MLlib aborts when rows < k; the operators must clamp instead —
    filtered/partitioned inputs with few (or zero) rows are routine."""
    from burla_spark.operators.clustering import cluster_sizes, kmeans_assign
    from burla_spark.operators.similarity import build_ivf_index, ivf_topk

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert kmeans_assign(empty, "vec_id", "embedding", k=10).count() == 0

    three = spark.createDataFrame(
        [(i, [float(i)] * 4) for i in range(3)], "vec_id long, embedding array<float>"
    )
    sizes = cluster_sizes(kmeans_assign(three, "vec_id", "embedding", k=10)).collect()
    assert sum(r.n_members for r in sizes) == 3

    idx_empty = build_ivf_index(empty, "vec_id", "embedding", n_clusters=16)
    out = ivf_topk(three, None, "vec_id", "vec_id", "embedding", "embedding",
                   k=5, index=idx_empty)
    assert out.count() == 0

    idx3 = build_ivf_index(three, "vec_id", "embedding", n_clusters=16)
    out3 = ivf_topk(three, None, "vec_id", "vec_id", "embedding", "embedding",
                    k=5, n_probe=4, index=idx3)
    assert out3.count() > 0


def test_quality_and_cosine_survive_degenerate_rows(spark):
    """Empty text and zero embeddings are routine in real corpora; under
    Spark 4's default ANSI mode a plain division would abort the whole
    query (DIVIDE_BY_ZERO) on the first such row."""
    from burla_spark.functions.vectors import cosine_similarity
    from burla_spark.operators.text import quality_columns, quality_score

    docs = spark.createDataFrame(
        [(1, ""), (2, "a normal sentence with the usual words")],
        "doc_id long, text string",
    )
    rows = docs.select(
        "doc_id",
        quality_score(F.col("text")).alias("q"),
        *[v.alias(k) for k, v in quality_columns(F.col("text")).items()],
    ).orderBy("doc_id").collect()
    assert rows[0].punct_ratio is None  # empty text → NULL ratio, no crash
    assert rows[1].q is not None

    vecs = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 0.0]), (3, [1.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    a = vecs.alias("a")
    b = vecs.alias("b")
    sims = (
        a.crossJoin(b)
        .select(cosine_similarity(F.col("a.embedding"), F.col("b.embedding")).alias("s"))
        .collect()
    )
    assert any(r.s is None for r in sims)  # zero vector → NULL, no crash
    assert any(r.s is not None for r in sims)


def test_lang_id_argmax_tie_und(spark):
    """Direct unit test for the heuristic language ID (the spec-level
    oracle exercises it only through the pipeline): clear-winner
    argmax, tie → alphabetically-earliest language, no-match → 'und',
    CJK → 'zh', and the round-8/9 contract that membership is
    WHOLE-TOKEN — 'qué' is not the stopword 'que', and a multi-arg
    lambda must never shadow the profile tuple (the round-8 arity bug)."""
    from burla_spark.operators.text import lang_id

    docs = spark.createDataFrame(
        [
            (1, "der hund und die katze ist nicht da"),  # clear de
            (2, "und the"),            # de=1, en=1 tie → 'de' (alphabetical)
            (3, "zzz qqq xyzzy"),      # nothing matches → 'und'
            (4, "漢字テスト中文"),        # CJK chars → 'zh'
            (5, "qué tal amigo"), # 'qué' ≠ 'que' → 'und' (whole-token)
            (6, "el que llega es que gana y"),  # clear es
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.lang
        for r in docs.select("doc_id", lang_id(F.col("text")).alias("lang")).collect()
    }
    assert got == {1: "de", 2: "de", 3: "und", 4: "zh", 5: "und", 6: "es"}


def test_operators_ignore_null_inputs(spark):
    """NULL text/payload/embedding rows are routine in real corpora:
    every operator must exclude them (SQL semantics), not crash its
    numpy/pandas worker on len(None)/bytes(None)."""
    from burla_spark.operators.clustering import kmeans_assign
    from burla_spark.operators.similarity import lsh_bucketed_topk

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"), (2, None),
         (3, "alpha beta gamma delta epsilon")],
        "doc_id long, text string",
    )
    pairs = dd.minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(1, 3)}
    groups = dd.simhash_collision_groups(docs, "doc_id", "text").collect()
    assert [g.member_ids for g in groups] == [[1, 3]]

    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]), (2, None), (3, [1.0, 0.1, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    topk = lsh_bucketed_topk(vecs, vecs, "vec_id", "vec_id", "embedding",
                             "embedding", k=2, dim=4).collect()
    assert all(r.neighbor_id != 2 and r.query_id != 2 for r in topk)
    assigned = kmeans_assign(vecs, "vec_id", "embedding", k=2).collect()
    assert sorted(r.vec_id for r in assigned) == [1, 3]

    blobs = spark.createDataFrame(
        [(1, b"\x07\x03payload"), (2, None)], "blob_id long, payload binary"
    )
    feats = mm.extract_features(blobs).collect()
    assert len(feats) == 2  # null payload decodes as empty, no crash
    assert mm.decode_and_resize(blobs, 4, 4).count() == 2
    assert mm.sample_frames(blobs, 4).count() >= 2


def test_pii_redaction_finds_exactly_the_injected_pii(spark, sf_dir):
    """The fixture corpus has no organic PII — every doc gets exactly
    one spliced email/phone/IP, so any count != 1 means the patterns
    over- or under-match (and a vacuous all-zeros run is impossible)."""
    from burla_spark.plans.llm import pii_redaction

    rows = pii_redaction(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert (r.n_emails, r.n_phones, r.n_ips) == (1, 1, 1), r


def test_bigram_scores_are_log_probabilities(spark, sf_dir):
    """MLE bigram scores are means of log p(w2|w1) with p in (0, 1]:
    never positive, and strictly negative for any doc containing a
    bigram whose context has more than one continuation."""
    from burla_spark.plans.llm import bigram_logprob_scores

    rows = bigram_logprob_scores(spark, sf_dir).collect()
    assert rows
    assert all(r.mean_logprob <= 0.0 for r in rows)
    assert any(r.mean_logprob < 0.0 for r in rows)
    assert all(r.n_bigrams >= 1 for r in rows)


def test_temperature_mixture_flattens_toward_uniform(spark, sf_dir):
    """alpha < 1 compresses the source distribution: the largest
    source's mixture weight must not exceed its natural weight, the
    smallest's must not fall below it, and weights stay normalized."""
    from burla_spark.plans.mlprep import temperature_mixture_weights

    rows = temperature_mixture_weights(spark, sf_dir).collect()
    assert len(rows) >= 2
    total = sum(r.mixture_weight for r in rows)
    assert abs(total - 1.0) < 1e-4
    biggest = max(rows, key=lambda r: r.n_tokens)
    smallest = min(rows, key=lambda r: r.n_tokens)
    assert biggest.mixture_weight <= biggest.natural_weight + 1e-9
    assert smallest.mixture_weight >= smallest.natural_weight - 1e-9


def test_pq_topk_recall_vs_bruteforce(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    exact = sim.cosine_topk(q, e, "vec_id", "vec_id", "embedding", "embedding", k=10)
    approx = sim.pq_topk(
        q, e, "vec_id", "vec_id", "embedding", "embedding", k=10, refine=4
    )
    exact_sets = {}
    for r in exact.collect():
        exact_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = total = 0
    for r in approx.collect():
        total += 1
        if r.neighbor_id in exact_sets.get(r.query_id, set()):
            hits += 1
    assert total > 0
    assert hits / total >= 0.5, f"PQ precision vs exact top-k: {hits}/{total}"


def test_pq_index_codes_shape_and_determinism(spark, sf_dir):
    """The code table carries exactly n_subspaces codes in
    [0, n_codes) per vector, and rebuilding with the same seed encodes
    identically (the reproducible-index contract)."""
    e = load_table(spark, sf_dir, "embeddings")
    idx1 = sim.build_pq_index(e, "vec_id", "embedding", n_subspaces=8, n_codes=16)
    rows = idx1.codes.collect()
    assert len(rows) == e.filter(F.col("embedding").isNotNull()).count()
    for r in rows[:50]:
        assert len(r["__code"]) == 8
        assert all(0 <= c < 16 for c in r["__code"])
    idx2 = sim.build_pq_index(e, "vec_id", "embedding", n_subspaces=8, n_codes=16)
    assert {(r.neighbor_id, tuple(r["__code"])) for r in rows} == {
        (r.neighbor_id, tuple(r["__code"])) for r in idx2.codes.collect()
    }


def test_funnel_stages_are_monotone_and_ordered(spark, sf_dir):
    """Stage reach must shrink monotonically and never exceed the
    unordered stage-intersection bound (at sf0.001's 15 dense users
    the ordering constraint happens not to bind, so the bound is <=;
    the oracle-parity row checks the ordered semantics exactly)."""
    from burla_spark.plans.timeseries import funnel_conversion
    from burla_spark.sources.tables import load_table

    row = funnel_conversion(spark, sf_dir).collect()[0]
    assert row.n_viewed >= row.n_clicked_after_view >= row.n_purchased_after_click
    assert row.n_purchased_after_click > 0  # non-vacuous at every fixture SF
    assert row.avg_view_to_click_us > 0 and row.avg_click_to_purchase_us > 0
    e = load_table(spark, sf_dir, "events")
    viewers = {r.user_id for r in e.filter(F.col("event_type") == "view").select("user_id").distinct().collect()}
    clickers = {r.user_id for r in e.filter(F.col("event_type") == "click").select("user_id").distinct().collect()}
    assert row.n_clicked_after_view <= len(viewers & clickers)


def test_compression_ratio_flags_repetition(spark, sf_dir):
    """zlib production mode: a doc made of one repeated token must
    compress far below a varied doc, and the signal must be
    partition-invariant. The ngram8 adjudication mode must flag the
    same repetitive doc (low ratio) so the two signals agree on what
    they exist to detect."""
    from burla_spark.plans.llm import compression_ratio_scores

    rows = compression_ratio_scores(spark, sf_dir, mode="zlib").collect()
    assert rows and all(0 < r.ratio for r in rows if r.n_bytes)
    ratios = {r.doc_id: r.ratio for r in rows}
    df = spark.createDataFrame(
        [(1, "spam " * 200), (2, " ".join(f"w{i}" for i in range(200)))],
        "doc_id long, text string",
    )
    import tempfile, os
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    synth = {
        r.doc_id: r.ratio
        for r in compression_ratio_scores(spark, d, mode="zlib").collect()
    }
    assert synth[1] < synth[2] / 3  # repetition compresses dramatically better
    again = {
        r.doc_id: r.ratio
        for r in compression_ratio_scores(spark, sf_dir, mode="zlib").collect()
    }
    assert again == ratios

    # ngram8 adjudication mode sees the same repetition: the all-"spam"
    # doc collapses to ~one distinct 8-gram (two: the trailing space
    # yields one empty-token window), the varied doc has all-distinct
    # windows (ratio 1.0).
    ng = {
        r.doc_id: r
        for r in compression_ratio_scores(spark, d, mode="ngram8").collect()
    }
    assert ng[1].n_distinct_units <= 2 and ng[1].ratio < 0.02
    assert ng[2].ratio == 1.0


def test_ivfpq_topk_recall_vs_bruteforce(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    exact = sim.cosine_topk(q, e, "vec_id", "vec_id", "embedding", "embedding", k=10)
    # synthetic near-random embeddings are the ANN worst case (no
    # neighborhood structure to learn), so probe/refine sit higher
    # than a real corpus would need
    approx = sim.ivfpq_topk(
        q, e, "vec_id", "vec_id", "embedding", "embedding",
        k=10, n_probe=8, refine=8,
    )
    exact_sets = {}
    for r in exact.collect():
        exact_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = total = 0
    for r in approx.collect():
        total += 1
        if r.neighbor_id in exact_sets.get(r.query_id, set()):
            hits += 1
    assert total > 0
    assert hits / total >= 0.5, f"IVF-PQ precision vs exact top-k: {hits}/{total}"


def test_ivfpq_residuals_beat_raw_pq_quantization_error(spark, sf_dir):
    """The reason the composed index encodes RESIDUALS: after the
    coarse quantizer explains the cell structure, the same code budget
    reconstructs vectors strictly better than PQ over raw vectors.
    Measured as mean squared reconstruction error on the corpus."""
    import numpy as np

    e = load_table(spark, sf_dir, "embeddings")
    ivfpq = sim.build_ivfpq_index(e, "vec_id", "embedding")
    pq = sim.build_pq_index(e, "vec_id", "embedding")
    vecs = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in e.filter(F.col("embedding").isNotNull()).collect()
    }

    def norm(v):
        n = np.linalg.norm(v)
        return v / n if n else v

    dsub = ivfpq.codebooks.shape[2]

    def recon_ivfpq(cell, code):
        res = np.concatenate(
            [ivfpq.codebooks[m][c] for m, c in enumerate(code)]
        )
        return ivfpq.centroids[cell] + res

    def recon_pq(code):
        return np.concatenate([pq.codebooks[m][c] for m, c in enumerate(code)])

    err_ivfpq = [
        float(np.sum((norm(vecs[r.neighbor_id]) - recon_ivfpq(r["__cell"], r["__code"])) ** 2))
        for r in ivfpq.codes.collect()
    ]
    err_pq = [
        float(np.sum((norm(vecs[r.neighbor_id]) - recon_pq(r["__code"])) ** 2))
        for r in pq.codes.collect()
    ]
    assert np.mean(err_ivfpq) < np.mean(err_pq), (
        f"residual coding must reduce error: {np.mean(err_ivfpq):.4f} "
        f"vs raw-PQ {np.mean(err_pq):.4f}"
    )


def test_ivfpq_codes_shape_and_cell_pruning(spark, sf_dir):
    """Each row carries a valid cell id + n_subspaces codes, and the
    probed-cell equi-join really prunes: the ADC stage of a 1-probe
    query touches only that cell's rows."""
    e = load_table(spark, sf_dir, "embeddings")
    idx = sim.build_ivfpq_index(e, "vec_id", "embedding", n_cells=16, n_subspaces=8)
    rows = idx.codes.collect()
    assert len(rows) == e.filter(F.col("embedding").isNotNull()).count()
    n_cells_seen = {r["__cell"] for r in rows}
    assert len(n_cells_seen) > 1 and all(0 <= c < 16 for c in n_cells_seen)
    for r in rows[:50]:
        assert len(r["__code"]) == 8 and all(0 <= c < 16 for c in r["__code"])


def test_mmr_lambda_one_equals_cosine_topk(spark, sf_dir):
    """lam=1 removes the diversity penalty entirely — MMR must then
    reproduce exact cosine top-k, rank for rank."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    plain = sim.cosine_topk(q, e, "vec_id", "vec_id", "embedding", "embedding", k=10)
    mmr = sim.mmr_topk(
        q, e, "vec_id", "vec_id", "embedding", "embedding", k=10, pool=50, lam=1.0
    )
    a = sorted((r.query_id, r.rank, r.neighbor_id) for r in plain.collect())
    b = sorted((r.query_id, r.rank, r.neighbor_id) for r in mmr.collect())
    assert a == b and len(a) == 50


def test_mmr_diversifies_and_keeps_rank_one(spark, sf_dir):
    """With a real penalty: rank 1 is still the nearest neighbor (no
    selection pressure yet), every pick comes from the candidate pool,
    and the selected set's max pairwise similarity does not exceed the
    plain top-k's (the point of MMR)."""
    import numpy as np

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    plain = sim.cosine_topk(q, e, "vec_id", "vec_id", "embedding", "embedding", k=10)
    mmr = sim.mmr_topk(
        q, e, "vec_id", "vec_id", "embedding", "embedding", k=10, pool=50, lam=0.5
    )
    vecs = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in e.collect()
    }

    def norm(v):
        n = np.linalg.norm(v)
        return v / n if n else v

    def max_pairwise(ids):
        vs = [norm(vecs[i]) for i in ids]
        return max(
            float(vs[i] @ vs[j])
            for i in range(len(vs))
            for j in range(i + 1, len(vs))
        )

    plain_sets, mmr_sets, rank1 = {}, {}, {}
    for r in plain.collect():
        plain_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
        if r.rank == 1:
            rank1[r.query_id] = r.neighbor_id
    for r in mmr.collect():
        mmr_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
        if r.rank == 1:
            assert r.neighbor_id == rank1[r.query_id]
    assert set(mmr_sets) == set(plain_sets)
    diversified = 0
    for qid in mmr_sets:
        assert len(mmr_sets[qid]) == 10
        assert max_pairwise(mmr_sets[qid]) <= max_pairwise(plain_sets[qid]) + 1e-9
        if mmr_sets[qid] != plain_sets[qid]:
            diversified += 1
    assert diversified > 0, "penalty never changed a selection — vacuous MMR"


def test_minhash_bucket_cap_is_opt_in_and_observable(spark):
    """ADVICE r6: max_bucket changed recall silently as a default. Now
    (1) the default is None — a large near-dup cluster keeps its pairs;
    (2) an explicit cap that drops oversized buckets emits a warning
    with the dropped-bucket count instead of the pairs just vanishing."""
    import warnings as _warnings

    base = (
        "the quick brown fox jumps over the lazy dog again and again "
        "while the rain in spain stays mainly on the plain "
    )
    # 20 near-identical docs: every band bucket has ~20 members
    docs = spark.createDataFrame(
        [(i, base + f"suffix {i % 2}") for i in range(20)],
        "doc_id long, text string",
    )
    full = dd.minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5)
    n_full = full.count()
    assert n_full >= 150  # ~C(20,2) pairs survive with no cap

    with _warnings.catch_warnings(record=True) as caught:
        _warnings.simplefilter("always")
        capped = dd.minhash_lsh_pairs(
            docs, "doc_id", "text", threshold=0.5, max_bucket=4
        )
        n_capped = capped.count()
    assert n_capped < n_full
    msgs = [str(w.message) for w in caught if "max_bucket" in str(w.message)]
    assert msgs and "dropped" in msgs[0]


def test_prefix_filter_join_complete_vs_bruteforce(spark):
    """Prefix filtering must return EXACTLY the brute-force J >= t pair
    set — including pairs that source/length-band blocking would miss
    (different lengths, no shared block). Synthetic corpus: a template
    cluster, a padded variant crossing length bands, and noise docs."""
    import itertools

    from pyspark.sql import functions as F

    from burla_spark.operators import dedup as dd
    from burla_spark.operators import text as tx

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, base),
        (2, base + " extra"),                        # near-dup, longer
        (3, base + " extra widget gadget gizmo"),     # crosses a length band
        (4, "unrelated words entirely different content here now"),
        (5, "alpha beta totally other tail that dilutes the overlap a lot"),
        (6, base),                                    # exact dup of 1
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    g = docs.select(
        "doc_id", dd.word_ngrams(tx.tokens(F.col("text")), 2).alias("grams")
    )
    t = 0.4
    got = {
        (r.id_a, r.id_b)
        for r in dd.prefix_filter_jaccard_join(g, "doc_id", "grams", t).collect()
    }
    sets = {r.doc_id: set(r.grams) for r in g.collect()}
    want = {
        (a, b)
        for a, b in itertools.combinations(sorted(sets), 2)
        if len(sets[a] & sets[b]) / len(sets[a] | sets[b]) >= t
    }
    assert got == want and (1, 6) in got and len(want) >= 3


def test_neardup_verify_never_broadcasts_the_corpus(spark, sf_dir):
    """The near-dup verify stage joins candidates back to the CORPUS-
    sized vector table; an explicit broadcast hint there builds every
    (id, embedding) on the driver and each executor — the one 100 TB
    scale-killer the round-7 audit flagged. With the auto-broadcast
    threshold disabled, any Broadcast node feeding the verify joins can
    only come from such a hint, so the plan must contain none: the
    join strategy is AQE's size-based choice, not a hard-coded hint."""
    from burla_spark.operators import similarity as sim
    from burla_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        pairs = sim.embedding_neardup_pairs(
            e, "vec_id", "embedding", threshold=0.8, num_tables=2
        )
        plan = pairs._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "BroadcastExchange" not in plan, (
        "verify stage carries a broadcast hint on the corpus-sized "
        "vector relation:\n" + plan[:2000]
    )


def test_affine_hash_is_overflow_safe_and_matches_naive(spark):
    """The split/sample hash is ((key % P) * (MULT % P)) % P — modmul,
    not the naive (key * MULT) % P. Two contracts: (1) for small keys
    the modmul equals the naive form (so every existing oracle is
    unchanged); (2) for keys above ~3.5e9 — where the naive form wraps
    int64 in Spark and raises in DuckDB — Spark and DuckDB agree on
    the modmul value (ADVICE r11: split_leakage_audit divergence)."""
    import duckdb

    from burla_spark.plans.mlprep import (
        _HASH_MOD,
        _HASH_MULT,
        _affine_hash,
        _affine_hash_sql,
    )

    small = [1, 7, 1000003, 3_400_000_000]
    big = [3_500_000_001, 2**40 + 17, 2**62 + 3, 9_223_372_036_854_775_783]
    keys = small + big

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {
        r["k"]: r["h"]
        for r in df.select("k", _affine_hash(F.col("k")).alias("h")).collect()
    }
    # Python ints are arbitrary precision: the true mathematical value.
    for k in keys:
        assert got[k] == (k * _HASH_MULT) % _HASH_MOD, k
    # naive form would have overflowed signed int64 for every big key
    # (sanity on the premise of this test)
    for k in big:
        assert k * _HASH_MULT > 2**63 - 1

    con = duckdb.connect()
    for k in keys:
        # cast: a bare literal parses as INT32 in DuckDB; real call
        # sites always feed a BIGINT column
        (dv,) = con.execute(
            f"SELECT {_affine_hash_sql(f'CAST({k} AS BIGINT)')}"
        ).fetchone()
        assert dv == got[k], k


def test_pq_pinned_empty_corpus_matches_sibling_builders(spark):
    """ADVICE r11: build_ivf_index/build_ivfpq_index got an early
    return for pinned mode on an empty corpus, build_pq_index didn't —
    it relied on the encode UDF never seeing a batch. The guard must be
    symmetric: pinned (8, 0, 8) codebooks on an empty corpus yield an
    empty code table and a 1-codeword placeholder book, and a pq_topk
    over that index returns zero rows instead of raising."""
    import numpy as np

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    books = np.zeros((8, 0, 8))
    idx = sim.build_pq_index(empty, "vec_id", "embedding", codebooks=books)
    assert idx.codes.count() == 0
    assert idx.codebooks.shape == (8, 1, 8)

    q = spark.createDataFrame(
        [(0, [1.0] * 64)], "vec_id long, embedding array<float>"
    )
    out = sim.pq_topk(
        q, empty, "vec_id", "vec_id", "embedding", "embedding", k=5, index=idx
    )
    assert out.count() == 0


# ---------------------------------------------------------------------------
# URL canonicalization (round 13)
# ---------------------------------------------------------------------------
def test_canonical_host_and_registrable_domain(spark):
    from burla_spark.operators.urls import canonical_host, registrable_domain

    cases = [
        ("https://WWW.Example.COM/path?q=1#f", "www.example.com", "example.com"),
        ("http://cdn.example.com:8080/a.png", "cdn.example.com", "example.com"),
        ("https://user:pw@www.Example.CO.UK/x", "www.example.co.uk", "example.co.uk"),
        ("example.com.", "example.com", "example.com"),
        ("EXAMPLE.com...", "example.com", "example.com"),
        ("https://api.shop.example.com.au?q=1", "api.shop.example.com.au", "example.com.au"),
        ("http://example.COM#frag", "example.com", "example.com"),
        ("localhost", "localhost", "localhost"),
        ("https://example.com", "example.com", "example.com"),
        ("ftp://mirror.example.org:21/pub", "mirror.example.org", "example.org"),
        ("sub.host.co.jp/path", "sub.host.co.jp", "host.co.jp"),
        ("  https://padded.example.net/  ", "padded.example.net", "example.net"),
        # ADVICE r13: an embedded absolute URL in the query must not
        # win the scheme split — strip at the FIRST '://'
        (
            "https://a.example/login?next=https://evil.example/",
            "a.example",
            "a.example",
        ),
        ("http://b.example/r?u=http://x.test/p&v=1", "b.example", "b.example"),
        (None, None, None),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _, _) in enumerate(cases)], "i long, url string"
    )
    h = canonical_host(F.col("url"))
    got = {
        r.i: (r.host, r.domain)
        for r in df.select(
            "i", h.alias("host"), registrable_domain(h).alias("domain")
        ).collect()
    }
    for i, (url, want_host, want_domain) in enumerate(cases):
        assert got[i] == (want_host, want_domain), (
            f"url={url!r}: got {got[i]}, want {(want_host, want_domain)}"
        )


def test_canonical_url_normalization(spark):
    from burla_spark.operators.urls import canonical_url

    cases = [
        ("https://Site.COM/Page?b=2&a=1", "https://site.com/Page?a=1&b=2"),
        ("https://site.com:443/p?a=1&b=2", "https://site.com/p?a=1&b=2"),
        ("http://site.com:80/p", "http://site.com/p"),
        ("http://site.com:8080/p", "http://site.com:8080/p"),
        ("https://site.com/p?a=1&utm_source=x&b=2#frag", "https://site.com/p?a=1&b=2"),
        ("https://u:pw@site.com./p?gclid=9", "https://site.com/p"),
        ("site.com", "http://site.com/"),
        ("HTTPS://site.com", "https://site.com/"),
        ("https://site.com/p?utm_a=1&utm_b=2", "https://site.com/p"),
        ("https://site.com/a/b/c?z=1&y=2&x=3", "https://site.com/a/b/c?x=3&y=2&z=1"),
        # ADVICE r13: scheme splits at the FIRST '://' — an embedded
        # absolute URL in the query must not hijack the host...
        (
            "https://a.com/login?next=https://evil.com/",
            "https://a.com/login?next=https://evil.com/",
        ),
        # ...and the query is everything after the FIRST '?' — a
        # literal '?' inside the query (legal per RFC 3986) must not
        # drop the middle segment
        ("https://site.com/p?q=what?&b=2", "https://site.com/p?b=2&q=what?"),
        # percent-encoding normalization (round 14): unreserved decode
        ("https://site.com/p%61ge?a=1", "https://site.com/page?a=1"),
        ("https://site.com/%7Euser/", "https://site.com/~user/"),
        ("https://site.com/%7euser/", "https://site.com/~user/"),
        # reserved stays encoded, hex uppercased
        ("https://site.com/a%2fb?k=%2c", "https://site.com/a%2Fb?k=%2C"),
        # decoded params sort and tracking-filter post-normalization
        ("https://site.com/p?%62=2&a=1", "https://site.com/p?a=1&b=2"),
        ("https://site.com/p?a=1&%75tm_source=x", "https://site.com/p?a=1"),
        # malformed '%' passes through
        ("https://site.com/100%?a=1", "https://site.com/100%?a=1"),
        (None, None),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)], "i long, url string"
    )
    got = {
        r.i: r.cu
        for r in df.select("i", canonical_url(F.col("url")).alias("cu")).collect()
    }
    for i, (url, want) in enumerate(cases):
        assert got[i] == want, f"url={url!r}: got {got[i]!r}, want {want!r}"


def test_pct_normalize_and_idn_fold(spark):
    from burla_spark.operators.urls import idn_fold_host, pct_normalize

    pct_cases = [
        ("%7e%7E%61%41", "~~aA"),      # unreserved decode, both hex cases
        ("%2f%3a%3F", "%2F%3A%3F"),    # reserved: uppercase, keep encoded
        ("a%zzb%", "a%zzb%"),          # malformed: untouched
        ("no-escapes", "no-escapes"),
        ("", ""),
        ("%", "%"),
        ("%%41", "%A"),                 # '%' then a valid triplet
        (None, None),
    ]
    df = spark.createDataFrame(
        [(i, s) for i, (s, _) in enumerate(pct_cases)], "i long, s string"
    )
    got = {
        r.i: r.o for r in df.select("i", pct_normalize(F.col("s")).alias("o")).collect()
    }
    for i, (s, want) in enumerate(pct_cases):
        assert got[i] == want, f"pct {s!r}: got {got[i]!r}, want {want!r}"

    idn_cases = [
        ("münchen.de", "xn--mnchen-3ya.de"),
        ("bücher.example", "xn--bcher-kva.example"),
        ("EXAMPLE.com", "example.com"),       # ASCII folds to lowercase
        ("xn--mnchen-3ya.de", "xn--mnchen-3ya.de"),  # already punycode
        (None, None),
    ]
    df = spark.createDataFrame(
        [(i, s) for i, (s, _) in enumerate(idn_cases)], "i long, h string"
    )
    got = {
        r.i: r.o
        for r in df.select("i", idn_fold_host(F.col("h")).alias("o")).collect()
    }
    for i, (s, want) in enumerate(idn_cases):
        assert got[i] == want, f"idn {s!r}: got {got[i]!r}, want {want!r}"


# ---------------------------------------------------------------------------
# multimodal binary round-trip + incremental Hamming near-dup (round 14)
# ---------------------------------------------------------------------------
def test_scanned_blob_neardup_plan_reads_parquet(spark, sf_dir):
    """VERDICT r13 #5: the scanned variant's signature plan must START
    from a real parquet scan of the BinaryType blob table — no in-plan
    regeneration (MapInPandas) anywhere above it."""
    from burla_spark.operators import multimodal as mm
    from burla_spark.plans import llm

    blobs = llm._image_blobs_scanned(spark, sf_dir)
    sigs = mm.image_dhash_bands(blobs, "doc_id", "payload")
    plan = sigs._jdf.queryExecution().executedPlan().toString()
    assert "burla_spark_image_blobs" in plan, plan
    assert "FileScan parquet" in plan, plan
    assert "ArrowEvalPython" in plan, plan  # the dHash UDF
    assert "MapInPandas" not in plan, plan  # no regeneration


def test_incremental_hamming_never_rehashes_base(spark, sf_dir):
    """VERDICT r13 ordered #2's plan assertion: the incremental run
    hashes ONLY the new batch (the is_new filter sits BELOW the dHash
    UDF, so base payloads never reach Python), and the index side is a
    pure parquet scan of the persisted signature artifact — scanned,
    not rebuilt."""
    from pyspark.sql import functions as F

    from burla_spark.operators import multimodal as mm
    from burla_spark.plans import llm
    from burla_spark.plans.mlprep import _HASH_MOD, _affine_hash

    new = llm._image_blobs_scanned(spark, sf_dir).filter(
        _affine_hash(F.col("doc_id")) < F.lit(_HASH_MOD // 5)
    )
    new_sigs = mm.image_dhash_bands(new, "doc_id", "payload")
    plan = new_sigs._jdf.queryExecution().executedPlan().toString()
    # tree root prints first: the UDF must appear ABOVE the filter —
    # the filter runs before the hash, so only the batch is hashed
    assert "ArrowEvalPython" in plan, plan
    assert plan.index("ArrowEvalPython") < plan.index("Filter"), plan

    idx = llm._hamming_index(spark, sf_dir)
    idx_plan = idx._jdf.queryExecution().executedPlan().toString()
    assert "burla_spark_hamming_index" in idx_plan, idx_plan
    assert "ArrowEvalPython" not in idx_plan, idx_plan  # no re-hash
    assert "MapInPandas" not in idx_plan, idx_plan      # no regeneration

    # the index artifact is built once per corpus: a second spec run
    # reuses the cached handle instead of rebuilding
    llm.incremental_hamming_neardup(spark, sf_dir).count()
    idx2 = llm._hamming_index(spark, sf_dir)
    assert idx2 is idx


def test_incremental_hamming_matches_full_join(spark, sf_dir):
    """The incremental pairs restricted to new-touching membership
    must equal the FULL join's pairs restricted the same way — the
    index shortcut loses nothing (and adds nothing)."""
    from pyspark.sql import functions as F

    from burla_spark.plans import llm
    from burla_spark.plans.mlprep import _HASH_MOD, _affine_hash

    full = llm.image_dhash_neardup(spark, sf_dir)
    is_new = lambda c: _affine_hash(F.col(c)) < F.lit(_HASH_MOD // 5)  # noqa: E731
    want = {
        (r.id_a, r.id_b, r.hamming)
        for r in full.filter(is_new("id_a") | is_new("id_b")).collect()
    }
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in llm.incremental_hamming_neardup(spark, sf_dir).collect()
    }
    assert got == want


def test_crossmodal_components_consistent_with_inputs(spark, sf_dir):
    """crossmodal accounting ties out to its four input pair tables:
    every evidenced node appears, modalities match per-doc incident
    evidence, and components merge exactly the union edge set."""
    from burla_spark.plans import llm

    pair_sets = {
        "text": llm.ngram_jaccard_pairs(spark, sf_dir),
        "image": llm.image_dhash_neardup(spark, sf_dir),
        "audio": llm.audio_fingerprint_neardup(spark, sf_dir),
        "video": llm.video_fingerprint_neardup(spark, sf_dir),
    }
    want_mods: dict[int, set] = {}
    for m, df in pair_sets.items():
        for r in df.select("id_a", "id_b").collect():
            want_mods.setdefault(r.id_a, set()).add(m)
            want_mods.setdefault(r.id_b, set()).add(m)
    rows = llm.crossmodal_dup_components(spark, sf_dir).collect()
    got_mods = {r.node: set(r.modalities.split(",")) for r in rows}
    assert got_mods == want_mods
    for r in rows:
        assert r.n_signals == len(got_mods[r.node])
    # components: two nodes sharing any edge share a component
    comp = {r.node: r.component for r in rows}
    for m, df in pair_sets.items():
        for r in df.select("id_a", "id_b").limit(500).collect():
            assert comp[r.id_a] == comp[r.id_b], (m, r)
