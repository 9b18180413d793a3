"""Algorithm-level tests for the semantic-curation family
(plans/semantic.py) — beyond the registry parity/vacuity/lint gates:

* SemDeDup's drop rule against a numpy brute force (the spec's own
  oracle shares derivation structure with the Spark plan; this check
  does not).
* The winnowing guarantee: two documents sharing a token run of
  W + K - 1 MUST share a fingerprint (the SIGMOD'03 theorem, driven
  on a crafted corpus).
* BPE merge application on an adversarial overlapping-pair corpus —
  the exact case where single-space token joints diverge from greedy
  merge semantics — cross-checked engine-vs-engine AND against
  hand-computed greedy BPE.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from burla_spark.plans import semantic as sem
from tests.oracle import compare

DOC_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


_CRAFT_SEQ = iter(range(10**6))


def _write_docs(tmp_path, texts: list[str]) -> str:
    """Crafted documents.parquet with the fixture schema. Each call
    gets its OWN directory — reusing one path let a second corpus
    silently overwrite the first while earlier DataFrames still
    pointed at the shared path."""
    df = pd.DataFrame(
        {
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["craft"] * len(texts),
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )[DOC_COLS]
    d = tmp_path / f"crafted{next(_CRAFT_SEQ)}"
    d.mkdir(exist_ok=True)
    df.to_parquet(d / "documents.parquet", index=False)
    return str(d)


def _docs_duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    return con


# ---------------------------------------------------------------------------
# SemDeDup vs numpy brute force
# ---------------------------------------------------------------------------
def test_semdedup_matches_bruteforce(spark, sf_dir):
    out = {
        r["vec_id"]: (r["cluster_id"], r["dup_of"])
        for r in sem.semdedup_prune(spark, sf_dir).collect()
    }

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    ids = emb["vec_id"].to_numpy()
    vecs = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    order = np.argsort(ids)
    ids, vecs = ids[order], vecs[order]
    cents = vecs[ids < sem.SEM_K]

    # assignment: rounded squared L2, ties to smaller centroid id
    d2 = np.round(((vecs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2), 6)
    assign = d2.argmin(axis=1)  # argmin takes the first (= smallest id) on ties

    norms = np.sqrt((vecs**2).sum(axis=1))
    sims = np.round(vecs @ vecs.T / np.outer(norms, norms), 6)

    expect: dict[int, tuple[int, int]] = {}
    for j in range(len(ids)):
        dominators = [
            int(ids[i])
            for i in range(j)
            if assign[i] == assign[j] and sims[i, j] >= sem.SEM_TAU and ids[i] < ids[j]
        ]
        if dominators:
            expect[int(ids[j])] = (int(assign[j]), min(dominators))

    assert out == expect
    assert len(out) > 0, "fixture produced no semantic duplicates — vacuous"


# ---------------------------------------------------------------------------
# Winnowing guarantee on a crafted corpus
# ---------------------------------------------------------------------------
def test_winnowing_shared_run_guarantee(spark, tmp_path):
    """Any shared token run of length >= W + K - 1 must yield a shared
    fingerprint; distinct-token docs must share none."""
    run = "zeta yankee xray whiskey victor uniform tango sierra"  # 8 = W+K-1
    texts = [
        f"alpha bravo charlie {run} delta echo foxtrot",
        f"golf hotel india juliett {run} kilo lima",
        "mike november oscar papa quebec romeo one two three four five six",
    ]
    d = _write_docs(tmp_path, texts)
    fps = (
        sem._winnowed_fps(spark, d)
        .select("doc_id", "fp")
        .toPandas()
        .groupby("doc_id")["fp"]
        .apply(set)
    )
    assert fps[0] & fps[1], "docs sharing an 8-token run must share a fingerprint"
    assert not (fps[0] & fps[2]) and not (fps[1] & fps[2])

    # the contamination-pair spec needs >= WIN_MIN_SHARED shared
    # fingerprints — one guaranteed fingerprint per W+K-1 run means a
    # LONG shared passage is what clears it; craft one (3 disjoint
    # guaranteed runs = 24 shared tokens) and assert the pair surfaces.
    long_run = " ".join(f"tok{i}unique" for i in range(24))
    d2 = _write_docs(
        tmp_path,
        [
            f"alpha bravo {long_run} charlie delta",
            f"echo foxtrot golf {long_run} hotel",
            "mike november oscar papa quebec romeo one two three four five six",
        ],
    )
    pairs = sem.winnowing_contamination_pairs(spark, d2).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(0, 1)]
    assert pairs[0]["n_shared"] >= sem.WIN_MIN_SHARED

    # and both winnowing oracles replay the crafted corpora exactly.
    for crafted in (d, d2):
        con = _docs_duck(crafted)
        compare(
            sem.winnowing_fingerprints(spark, crafted),
            con,
            sem.WINNOWING_FPS_SQL,
        )
        compare(
            sem.winnowing_contamination_pairs(spark, crafted),
            con,
            sem.WINNOWING_PAIRS_SQL,
        )
        con.close()


def test_winnowing_density(spark, sf_dir):
    """Winnowing keeps roughly 2/(W+1) of gram positions (SIGMOD'03
    density bound) — and never more than the gram count."""
    rows = sem.winnowing_fingerprints(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_fps"] <= r["n_grams"]
    mean_density = float(np.mean([r["n_fps"] / r["n_grams"] for r in rows]))
    assert 0.1 <= mean_density <= 0.8  # 2/(W+1) = 1/3 on random text


# ---------------------------------------------------------------------------
# BPE: adversarial overlapping pairs
# ---------------------------------------------------------------------------
def test_bpe_overlapping_pairs_greedy_semantics(spark, tmp_path):
    """'aaaa' is the case that breaks single-space merge application:
    greedy BPE merges it to [aa, aa]; a replace over single-space
    joints would yield [aa, a, a]. Step 2's winner frequency proves
    which one the engine computed — and the oracle must agree."""
    # corpus: 'aaaa' x3, 'aaa' x2 (odd run: greedy -> [aa, a]), 'ba' x1
    texts = ["aaaa aaaa", "aaaa aaa", "aaa ba"]
    d = _write_docs(tmp_path, texts)
    rows = sem.bpe_train_merges(spark, d).collect()
    got = [(r["step"], r["pair"], r["weighted_count"]) for r in rows]

    # step 1: pairs of v0 — 'aaaa'(f3): 3x('a','a'); 'aaa'(f2): 2x; 'ba': 1
    # ('a','a') = 3*3 + 2*2 = 13; ('b','a') = 1
    # step 2 (after merging 'a a'): 'aaaa' -> [aa, aa] (GREEDY), so
    # ('aa','aa') = 3; 'aaa' -> [aa, a] -> ('aa','a') = 2; 'ba' -> ('b','a')=1
    # a non-greedy merge would instead leave 'aaaa' as [aa, a, a] and
    # step 2's winner would be ('aa','a') with count 3+2=5.
    assert got[0] == (1, "a a", 13)
    assert got[1] == (2, "aa aa", 3)

    con = _docs_duck(d)
    compare(sem.bpe_train_merges(spark, d), con, sem.BPE_MERGES_SQL)
    con.close()


def test_bpe_merge_count_and_monotone(spark, sf_dir):
    rows = sem.bpe_train_merges(spark, sf_dir).collect()
    assert len(rows) == sem.BPE_MERGES
    counts = [r["weighted_count"] for r in rows]
    # each merge consumes its pair; later winners can't beat an earlier
    # winner's count (the earlier winner was the global max then, and
    # merging only removes occurrences of OTHER pairs adjacent to it).
    assert counts == sorted(counts, reverse=True)
    assert all(c > 0 for c in counts)


def test_bpe_boundary_no_false_merge(spark, tmp_path):
    """The SOH/STX token frame must refuse boundary false-matches: a
    learned merge ('e','t') must NOT fire inside ['e','th'] — a bare
    separator-joined state contains 'e<sep>t' as a substring of
    'e<sep>th' and merges a pair that was never learned. Corpus built
    so merge 2 is exactly that trap; exhausting merges at step 3 also
    drives the empty-m{n} identity guard in the oracle chain."""
    texts = ["th th th th th", "eth", "et et et"]
    d = _write_docs(tmp_path, texts)
    rows = sem.bpe_train_merges(spark, d).collect()
    got = [(r["step"], r["pair"], r["weighted_count"]) for r in rows]
    # freqs: th=5, eth=1, et=3 -> (t,h)=6 wins, then (e,t)=3, and IF
    # 'eth' (now [e, th]) survived merge 2 untouched, (e,th)=1 remains
    # as merge 3; merges exhaust before step 4.
    assert got == [(1, "t h", 6), (2, "e t", 3), (3, "e th", 1)]

    con = _docs_duck(d)
    compare(sem.bpe_train_merges(spark, d), con, sem.BPE_MERGES_SQL)
    compare(sem.bpe_encode_token_stats(spark, d), con, sem.BPE_ENCODE_SQL)
    con.close()


def test_bpe_encode_bounds(spark, sf_dir):
    """Token totals sit strictly between word totals (every word is
    >=1 token) and char totals (4 real merges shrink something)."""
    rows = sem.bpe_encode_token_stats(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_words"] <= r["n_tokens"] < r["n_chars"]


def test_bpe_cache_isolated_per_corpus(spark, tmp_path):
    """The train-once cache keys on (application, sf_dir): two corpora
    in one session must train independently, and re-asking for the
    first corpus must return ITS merges, not the latest."""
    d1 = _write_docs(tmp_path, ["aa aa aa"])
    d2 = _write_docs(tmp_path, ["bb bb"])
    m1 = [(r["pair"], r["weighted_count"])
          for r in sem.bpe_train_merges(spark, d1).collect()]
    m2 = [(r["pair"], r["weighted_count"])
          for r in sem.bpe_train_merges(spark, d2).collect()]
    assert m1[0] == ("a a", 3) and m2[0] == ("b b", 2)
    again = [(r["pair"], r["weighted_count"])
             for r in sem.bpe_train_merges(spark, d1).collect()]
    assert again == m1


def test_bpe_empty_corpus_schema(spark, tmp_path):
    d = _write_docs(tmp_path, [])
    out = sem.bpe_train_merges(spark, d)
    assert out.columns == ["step", "pair", "weighted_count"]
    assert out.count() == 0


def test_rrf_fusion_matches_bruteforce(spark, sf_dir):
    """Third-way check: both retriever rankings and the fused top-20
    recomputed in numpy/pandas — int8-quantized dot, fixed-point BM25
    totals, exact 1/(K+r) fusion."""
    import math

    import numpy as np
    import pandas as pd

    from burla_spark.plans.ann_oracle import (
        RRF_K,
        RRF_POOL,
        RRF_TOP,
        _Q8_SCALE,
        rrf_hybrid_retrieval,
    )
    from burla_spark.plans.llm import BM25_TERMS

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    emb = emb[emb["vec_id"].notna()]
    vecs = {
        int(r.vec_id): np.round(np.array(r.embedding, dtype=np.float64) * _Q8_SCALE).astype(np.int64)
        for r in emb.itertuples()
    }
    qv = vecs[0]
    dense_scores = sorted(
        ((int(np.dot(v, qv)), i) for i, v in vecs.items() if i != 0),
        key=lambda t: (-t[0], t[1]),
    )[:RRF_POOL]
    dense_rank = {i: r + 1 for r, (_, i) in enumerate(dense_scores)}

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    n_docs = len(docs)
    toks = docs["text"].str.strip().str.lower().str.split()
    avgdl = float(np.mean([len(t) for t in docs["text"].str.strip().str.split()]))
    tf: dict[tuple[int, str], int] = {}
    dl: dict[int, int] = {}
    for doc_id, t in zip(docs["doc_id"], toks):
        dl[doc_id] = len(t)
        for term in t:
            if term in BM25_TERMS:
                tf[(doc_id, term)] = tf.get((doc_id, term), 0) + 1
    df_ = {term: sum(1 for (d, tm) in tf if tm == term) for term in BM25_TERMS}
    sparse_fp: dict[int, int] = {}
    for (d, term), f in tf.items():
        idf = math.log(1.0 + (n_docs - df_[term] + 0.5) / (df_[term] + 0.5))
        bm = idf * f * 2.2 / (f + 1.2 * (1.0 - 0.75 + 0.75 * dl[d] / avgdl))
        sparse_fp[d] = sparse_fp.get(d, 0) + round(round(bm, 6) * 1_000_000)
    sparse_top = sorted(sparse_fp.items(), key=lambda t: (-t[1], t[0]))[:RRF_POOL]
    sparse_rank = {d: r + 1 for r, (d, _) in enumerate(sparse_top)}

    fused = {}
    for d in set(dense_rank) | set(sparse_rank):
        fused[d] = (1.0 / (RRF_K + dense_rank[d]) if d in dense_rank else 0.0) + (
            1.0 / (RRF_K + sparse_rank[d]) if d in sparse_rank else 0.0
        )
    expect = sorted(fused.items(), key=lambda t: (-t[1], t[0]))[:RRF_TOP]

    out = rrf_hybrid_retrieval(spark, sf_dir).collect()
    assert len(out) == len(expect) == RRF_TOP
    for r, (d, score) in zip(out, expect):
        assert r["doc_id"] == d
        assert r["dense_rank"] == dense_rank.get(d)
        assert r["sparse_rank"] == sparse_rank.get(d)
        assert abs(r["rrf_score"] - round(score, 6)) < 1e-9
    # fusion must be doing real work: the fused top-20 is not just
    # either single list's top-20 (vacuity guard)
    assert [r["doc_id"] for r in out] != [i for _, i in dense_scores[:RRF_TOP]]
    assert [r["doc_id"] for r in out] != [d for d, _ in sparse_top[:RRF_TOP]]
