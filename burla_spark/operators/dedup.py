"""Deduplication operators (SURVEY.md §2.C): exact, normalized,
MinHash+LSH, SimHash, n-gram Jaccard.

Scale design notes
------------------
* exact/normalized dedup: hash-groupBy on the digest — one shuffle,
  map-side partial agg, no row text ever shuffled (only the digest).
* MinHash LSH: the classic shingle → k minhashes → band → bucket-join
  pipeline. Candidate generation is a self-join on (band_id, band_key)
  — at 100 TB this is the only join and its fan-out is bounded by
  bucket sizes, not corpus size. Signatures are computed with JVM
  higher-order functions (no Python).
* SimHash: 64-bit signature folded JVM-side with aggregate/zip_with;
  identical-signature grouping gives hamming-0 clusters, band tables
  extend to hamming-k.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from burla_spark.functions.numeric import let
from burla_spark.operators.text import normalized


def _spill_to_temp_parquet(df: DataFrame, label: str) -> DataFrame:
    """Materialize ``df`` to a session-temp parquet and read it back.

    Decouples a result from the (persisted) intermediates that produced
    it, so caches can be unpersisted immediately instead of leaking
    into a long-lived session. Distributed write + read — no driver
    round-trip, no pinned RDDs.

    Spill location: executors do the writing, so on a multi-node
    cluster the directory MUST be on shared storage — a driver-local
    tempdir would scatter part files across executor-local disks and
    the read-back would silently drop rows. Resolution order:
    1. ``spark.burla.spillDir`` (session conf; set this to a bucket /
       shared-FS path on a real cluster),
    2. the session's checkpoint dir (already required to be shared),
    3. a driver-local tempdir — ONLY safe in local mode, so raise
       rather than corrupt when the master isn't local."""
    import atexit
    import shutil
    import tempfile
    import uuid

    spark = df.sparkSession
    base = spark.conf.get("spark.burla.spillDir", None)
    if not base:
        base = spark.sparkContext.getCheckpointDir()  # None unless set
    if base:
        out_dir = f"{base.rstrip('/')}/burla_spark_{label}_{uuid.uuid4().hex[:12]}"
    else:
        master = spark.conf.get("spark.master", "")
        if not master.startswith("local"):
            raise RuntimeError(
                "spill requires shared storage on a cluster: set "
                "spark.burla.spillDir (or a checkpoint dir) to a path "
                "all executors can reach"
            )
        out_dir = tempfile.mkdtemp(prefix=f"burla_spark_{label}_")
        atexit.register(shutil.rmtree, out_dir, ignore_errors=True)
    df.write.mode("overwrite").parquet(out_dir)
    return spark.read.parquet(out_dir)


def _spread_for_verify(pairs: DataFrame, *keys: str) -> DataFrame:
    """Re-width a byte-tiny candidate-pair table before a compute-heavy
    verify join. AQE coalesces the candidates' distinct/exchange output
    to ONE partition (the pairs are a few bytes each), and the verify
    joins — whose gram/vector sides broadcast — inherit that probe-side
    partitioning, serializing the exact-similarity arithmetic on one
    core (measured: minhash verify 4.6 s CPU in a single task at
    sf0.1). An explicit-width repartition is exempt from AQE
    coalescing; keyed on the verify join's own keys it also satisfies a
    sort-merge join's distribution requirement, so no second exchange
    appears when the verify side is too big to broadcast. Only the id
    pairs reshuffle — never the gram arrays. Width follows the session
    shuffle conf, so a cluster run keeps its configured scale."""
    n = int(pairs.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return pairs.repartition(n, *keys)


# ---------------------------------------------------------------------------
# exact / normalized dedup
# ---------------------------------------------------------------------------
def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per distinct text: the surviving (minimum) id, the copy
    count, and the content digest. Only the 64-hex digest shuffles."""
    return (
        df.select(F.col(id_col), F.sha2(F.col(text_col), 256).alias("text_sha"))
        .groupBy("text_sha")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_copies"),
        )
    )


def normalized_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Dedup on the canonicalized text (case/punct/whitespace-blind)."""
    return (
        df.select(F.col(id_col), F.sha2(normalized(F.col(text_col)), 256).alias("text_sha"))
        .groupBy("text_sha")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_copies"),
        )
    )


def drop_exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Return df minus non-surviving duplicates (keeps min id per text)."""
    keep = exact_dedup_groups(df, id_col, text_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(keep, id_col, "left_semi")


# ---------------------------------------------------------------------------
# shingling
# ---------------------------------------------------------------------------
def char_shingles(text_col, size: int = 5):
    """Distinct character n-grams, built JVM-side via sequence+substring.
    The lowered text is let-bound so each substring doesn't re-lower the
    whole document (lambdas don't CSE — see functions.numeric.let)."""
    return let(
        F.lower(text_col),
        lambda t: F.when(F.length(t) < size, F.array(t)).otherwise(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.length(t) - (size - 1)),
                    lambda i: t.substr(i, F.lit(size)),
                )
            )
        ),
    )


def word_ngrams(tokens_col, n: int = 2):
    """Distinct word n-grams from a token array (1-based element_at).
    The token array is let-bound: without it every element_at inside the
    transform lambda would re-evaluate the tokenizer per gram."""
    if n == 1:
        return F.array_distinct(tokens_col)

    def build(toks):
        joined = F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(n)]
            ),
        )
        return F.when(F.size(toks) < n, F.array(F.concat_ws(" ", toks))).otherwise(
            F.array_distinct(joined)
        )

    return let(tokens_col, build)


def jaccard(a, b):
    """Exact Jaccard of two distinct-element arrays — JVM-side.
    |A∪B| is derived as |A|+|B|-|A∩B| so only one set op materializes;
    the intersection size is let-bound so it's computed once even when
    the caller uses jaccard in both a projection and a filter."""
    return let(
        F.size(F.array_intersect(a, b)).cast("double"),
        lambda inter: inter / ((F.size(a) + F.size(b)).cast("double") - inter),
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------
def _minhash_seeds(num_hashes: int) -> "np.ndarray":
    import random

    rng = random.Random(42)
    return np.array(
        [rng.getrandbits(64) for _ in range(num_hashes)], dtype=np.uint64
    )


def minhash_signature_udf(num_hashes: int = 32):
    """k minhashes over a PRE-HASHED (long-array) shingle column,
    folded in numpy: the k hash functions are splitmix64(h ^ seed_j)
    — deterministic, vectorized over (total_shingles × k) in one
    matrix pass with a segment-min per document. Callers hash each
    string shingle ONCE JVM-side (xxhash64, stable across cluster
    layouts); this fold is pure arithmetic so signatures are
    reproducible anywhere."""
    from pyspark.sql.functions import pandas_udf

    seeds = _minhash_seeds(num_hashes)

    @pandas_udf("array<long>")
    def fold(shingle_hashes: pd.Series) -> pd.Series:
        lengths = shingle_hashes.map(len).to_numpy(dtype=np.int64)
        n = len(lengths)
        if n == 0:
            return pd.Series([])
        if (lengths == 0).any():  # reduceat breaks on empty segments
            shingle_hashes = shingle_hashes.map(lambda h: h if len(h) else [0])
            lengths = np.maximum(lengths, 1)
        flat = np.concatenate(
            [np.asarray(h, dtype=np.int64) for h in shingle_hashes]
        ).view(np.uint64)
        offsets = np.concatenate(([0], np.cumsum(lengths)[:-1]))
        # splitmix64 finalizer per seed, looped with in-place buffers —
        # a (flat × k) matrix would allocate GBs; this stays in cache.
        c1, c2 = np.uint64(0xBF58476D1CE4E5B9), np.uint64(0x94D049BB133111EB)
        s30, s27, s31 = np.uint64(30), np.uint64(27), np.uint64(31)
        mins = np.empty((n, len(seeds)), dtype=np.uint64)
        z = np.empty_like(flat)
        for j, seed in enumerate(seeds):
            np.bitwise_xor(flat, seed, out=z)
            z ^= z >> s30
            z *= c1
            z ^= z >> s27
            z *= c2
            z ^= z >> s31
            mins[:, j] = np.minimum.reduceat(z, offsets)
        return pd.Series(list(mins.view(np.int64)))

    return fold


MINHASH_AFFINE_P = 4294967311  # smallest prime > 2^32


def _affine_coeffs(num_hashes: int) -> list[tuple[int, int]]:
    """Seeded (a, b) pairs for the universal-hash permutations
    h_j(x) = (a_j·x + b_j) mod P over 32-bit md5 shingle hashes.
    a < 2^30 keeps a·x < 2^62 — exact BIGINT in both engines."""
    import random

    rng = random.Random(7)
    return [
        (rng.randrange(1, 1 << 30), rng.randrange(0, MINHASH_AFFINE_P))
        for _ in range(num_hashes)
    ]


def md5_32bit_hash(col):
    """32-bit integer hash from the first 8 hex chars of md5 — the
    shingle-hash half of the replayable ``md5_affine`` MinHash family
    (DuckDB: ('0x' || substr(md5(s), 1, 8))::BIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_size: int = 5,
    threshold: float = 0.5,
    max_bucket: int | None = None,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Near-duplicate pairs via MinHash LSH, exact-Jaccard verified.

    banding: r = num_hashes/bands rows per band; a pair collides in a
    band iff that band's minhashes all match → candidates; candidates
    are then verified with exact shingle Jaccard >= threshold.
    Output: (id_a, id_b, jaccard) with id_a < id_b.

    ``max_bucket`` (OPT-IN) bounds band-bucket membership: with fixed
    banding the FALSE-POSITIVE collision rate per pair is constant, so
    candidate pairs grow quadratically with the corpus (the round-6
    scaling harness measured the band self-join going from ~12 s at
    5 k docs to minutes at 50 k). A band key shared by more than
    max_bucket docs is usually a boilerplate/templated pattern, not a
    duplicate cluster — those rows are dropped from THAT band (the
    standard production cap), bounding candidates by
    bands × n × max_bucket — linear in corpus size. The cap CHANGES
    RECALL: a pair whose only collision is an oversized bucket is
    lost, and a genuine duplicate cluster larger than the cap (whose
    near-identical signatures oversize EVERY band) vanishes entirely
    unless its members are exact duplicates (those surface through
    exact dedup first). Default is therefore None (exact LSH
    semantics); when a cap is passed, the function reports what it
    dropped via ``warnings.warn`` so the recall change is observable.

    .. versionchanged:: round 7
       ``max_bucket`` default flipped from 128 to None: recall is now
       exact by default, but callers that relied on the old implicit
       cap inherit quadratically growing candidate pairs on
       boilerplate-heavy corpora — re-pin ``max_bucket=128`` (as
       minhash_dedup_pairs in plans/llm.py does) where the linear
       candidate bound matters more than exhaustive recall."""
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    r = num_hashes // bands

    # NULL text carries no content to dedup and would crash the numpy
    # signature fold (len(None)); exclude it up front.
    df = df.filter(F.col(text_col).isNotNull())
    # CPU-heavy per-doc stage: make sure it fans out across cores even
    # when the source is a single small file (a TB-scale scan arrives
    # pre-partitioned; a fixture file does not).
    n_parts = max(df.sparkSession.sparkContext.defaultParallelism, 8)
    shingled = df.repartition(n_parts, F.col(id_col)).select(
        F.col(id_col).alias("doc_id"),
        char_shingles(F.col(text_col), shingle_size).alias("shingles"),
    )
    if hash_family == "md5_affine":
        # Driver-adjudication family (round 11): 32-bit md5 shingle
        # hashes × seeded affine permutations — exact BIGINT arithmetic
        # DuckDB replays bit-for-bit (oracle generated by
        # plans/llm.minhash_pairs_sql from the SAME coefficients). The
        # distinct runs AFTER hashing so 32-bit collision semantics are
        # identical in engine and oracle. Signatures come from one
        # explode + 32 map-side-partial MIN aggregates — no Python.
        coeffs = _affine_coeffs(num_hashes)
        # fully map-side: hash each distinct shingle once, then the 32
        # per-permutation minima are array_min(transform(...)) folds
        # over the hashed array — pure codegen'd projection, NO shuffle
        # (the explode+groupBy form pays a corpus×shingles exchange for
        # the same numbers).
        def perm(a: int, b: int):
            # closure factory: defaults-in-lambda would change the
            # lambda's arity and break Spark's higher-order binding
            return lambda x: (F.lit(a) * x + F.lit(b)) % F.lit(
                MINHASH_AFFINE_P
            )

        sigs = shingled.select(
            "doc_id",
            F.array_distinct(
                F.transform("shingles", md5_32bit_hash)
            ).alias("shingles"),
        ).withColumn(
            "sig",
            F.array(
                *[
                    F.array_min(F.transform("shingles", perm(a, b)))
                    for a, b in coeffs
                ]
            ),
        )

        def band_key(cols):  # replayable: plain string concat
            return F.concat_ws("_", *[c.cast("string") for c in cols])

    elif hash_family == "xxhash64":
        # shingle → hash-to-long once; signatures, banding and the
        # exact-Jaccard verification all work on the long arrays
        # (collision odds ~2^-64 per pair — immaterial for dedup).
        fold = minhash_signature_udf(num_hashes)
        sigs = shingled.select(
            "doc_id",
            F.transform("shingles", lambda s: F.xxhash64(s)).alias("shingles"),
        ).withColumn("sig", fold(F.col("shingles")))

        def band_key(cols):
            return F.xxhash64(*cols)

    else:
        raise ValueError(f"unknown hash_family {hash_family!r}")
    # sigs feeds three plan branches (banding + both verify join-backs);
    # persist so shingling/signatures compute once. At petabyte scale
    # the same role is played by checkpointing sigs to a table.
    sigs = sigs.persist()

    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                band_key(
                    [F.col("sig")[b * r + i] for i in range(r)]
                ).alias("band_key"),
            )
            for b in range(bands)
        ]
    )
    banded = sigs.select(
        "doc_id", F.explode(band_structs).alias("band")
    ).select("doc_id", "band.band_id", "band.band_key")
    capped_banded = None
    if max_bucket is not None:
        import warnings

        from pyspark.sql import Window

        bw = Window.partitionBy("band_id", "band_key")
        # persist WITH the bucket-size column: the dropped-stats job
        # below, and both sides of the candidate self-join, would each
        # recompute the banding + window shuffle otherwise. Small frame
        # (n × bands rows of longs); released after the candidate spill.
        banded = banded.withColumn(
            "__bsz", F.count("*").over(bw)
        ).persist()
        capped_banded = banded
        # the cap is opt-in and changes recall — surface what it
        # dropped (one small job over the now-cached banded frame) so a
        # caller can detect a skipped >cap duplicate cluster instead of
        # its pairs silently vanishing.
        dropped = (
            banded.filter(F.col("__bsz") > max_bucket)
            .agg(
                F.count_distinct("band_id", "band_key").alias("buckets"),
                F.count("*").alias("rows"),
            )
            .collect()[0]
        )
        if dropped["buckets"]:
            warnings.warn(
                f"minhash_lsh_pairs: max_bucket={max_bucket} dropped "
                f"{dropped['buckets']} oversized band buckets "
                f"({dropped['rows']} banded rows); pairs colliding only "
                "in those buckets are lost",
                stacklevel=2,
            )
        banded = banded.filter(F.col("__bsz") <= max_bucket).drop("__bsz")

    if max_bucket is None:
        # capped runs materialize sigs via the dropped-stats collect
        # above; the uncapped path must fill the persist eagerly too,
        # or the self-join + verify branches launch as concurrent jobs
        # that race to compute the signature pipeline several times.
        sigs.count()

    left = banded.alias("l")
    right = banded.alias("r")
    candidates = (
        left.join(
            right,
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("id_a"), F.col("r.doc_id").alias("id_b")
        )
        .distinct()
    )
    # the exact-Jaccard verify below is the expensive stage (set ops
    # over full shingle arrays per candidate); spread the tiny pair
    # table back to full width first or it runs single-task.
    candidates = _spread_for_verify(candidates, "id_a")

    sh = sigs.select("doc_id", "shingles")
    verified = (
        candidates.join(
            sh.select(
                F.col("doc_id").alias("id_a"), F.col("shingles").alias("sh_a")
            ),
            "id_a",
        )
        .join(
            sh.select(
                F.col("doc_id").alias("id_b"), F.col("shingles").alias("sh_b")
            ),
            "id_b",
        )
        .withColumn("jaccard", jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    # Materialize the (duplicate-mass-sized) verified pair set to a
    # session-temp parquet so the signature cache can be released here
    # instead of leaking into a long-lived session — the local twin of
    # the production pattern (write pairs to a table, drop the
    # signature checkpoint). Unlike localCheckpoint this leaves ZERO
    # pinned RDDs behind, and the write/read is distributed, so it
    # holds at any pair volume.
    verified = _spill_to_temp_parquet(verified, "minhash_pairs")
    sigs.unpersist()
    if capped_banded is not None:
        capped_banded.unpersist()
    return verified


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------
def simhash(tokens_col):
    """64-bit SimHash folded in one JVM pass: per token, xxhash64 bits
    vote +1/-1 per position; sign of each column becomes the signature
    bit. No Python, no extra shuffle — a pure projection."""
    # hash each token once (let-bound); per signature bit, an
    # allocation-free popcount aggregate counts set bits across tokens —
    # the bit is 1 when set bits form a strict majority (same as the
    # classic ±1 vote sum being positive).
    def fold(hashes):
        n = F.size(hashes).cast("long")

        def ones(i: int):
            return F.aggregate(
                hashes,
                F.lit(0).cast("long"),
                lambda acc, h: acc + F.shiftright(h, i).bitwiseAND(F.lit(1)),
            )

        # bit 63 as a long literal is the sign bit (1<<63 wraps negative).
        bits = [
            F.when(
                ones(i) * 2 > n,
                F.lit((1 << i) if i < 63 else -(1 << 63)).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
            for i in range(64)
        ]
        out = bits[0]
        for b in bits[1:]:
            out = out.bitwiseOR(b)
        return out

    return let(F.transform(tokens_col, lambda t: F.xxhash64(t)), fold)


def _simhash_fold_udf():
    """Vectorized SimHash fold: token hashes (JVM xxhash64, stable)
    arrive as array<long>; numpy unpacks bits, segment-sums votes and
    packs majority bits — identical signatures to the pure-Catalyst
    :func:`simhash`, ~an order of magnitude less per-row expression
    work at scale."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def fold(hashes: pd.Series) -> pd.Series:
        lengths = hashes.map(len).to_numpy(dtype=np.int64)
        n = len(lengths)
        if n == 0 or lengths.sum() == 0:
            return pd.Series(np.zeros(n, dtype=np.int64))
        flat = np.concatenate([np.asarray(h, dtype=np.int64) for h in hashes])
        bits = (
            (flat.view(np.uint64)[:, None] >> np.arange(64, dtype=np.uint64)) & 1
        ).astype(np.int64)
        if (lengths == 0).any():  # defensive: reduceat breaks on empties
            acc = np.zeros((n, 64), dtype=np.int64)
            np.add.at(acc, np.repeat(np.arange(n), lengths), bits)
        else:
            offsets = np.concatenate(([0], np.cumsum(lengths)[:-1]))
            acc = np.add.reduceat(bits, offsets, axis=0)
        maj = (2 * acc) > lengths[:, None]
        weights = np.left_shift(np.uint64(1), np.arange(64, dtype=np.uint64))
        sig = (maj.astype(np.uint64) * weights).sum(axis=1, dtype=np.uint64)
        return pd.Series(sig.view(np.int64))

    return fold


def md5_60bit_hash(col):
    """60-bit integer hash from the first 15 hex chars of md5 —
    bit-identical in Spark (conv) and DuckDB (('0x'||substr)::BIGINT),
    the replayable hash family every deterministic-mode sketch uses
    (proven by the plans/ann_oracle.py companions since round 7)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def simhash_collision_groups(
    df: DataFrame, id_col: str, text_col: str, token_hash: str = "xxhash64"
) -> DataFrame:
    """Docs sharing an identical 64-bit SimHash (hamming distance 0).
    Output: one row per signature with >1 member.

    ``token_hash`` selects the hash family feeding the vote/fold:
    * ``"xxhash64"`` (default) — Spark's JVM xxhash64: fastest, but not
      replayable by an external SQL oracle;
    * ``"md5_60"`` — 60-bit md5-derived hashes (driver-adjudication
      mode): bit-identical in DuckDB, so the WHOLE operator is
      oracle-exact. Bits 60..63 never vote (always 0) — signatures use
      60 effective bits; collision semantics are unchanged. The fold,
      grouping, and output contract are byte-for-byte the same code
      path for both families.

    A document's identity is its id (the nullkey-sweep rule): replayed
    rows sharing an id merge their token MULTISETS into one vote pool
    before the fold — one signature per document, exactly the oracle's
    GROUP BY doc_id semantics (the round-11 dup sweep caught per-ROW
    signatures diverging on a duplicated ingest). Verbatim duplicates
    double every vote, so the signature is unchanged; the fold is
    vote-count-based and thus order-invariant under collect_list's
    nondeterministic concatenation order."""
    from burla_spark.operators.text import tokens

    fold = _simhash_fold_udf()
    if token_hash == "md5_60":
        hash_one = md5_60bit_hash
    elif token_hash == "xxhash64":
        hash_one = F.xxhash64
    else:
        raise ValueError(f"unknown token_hash {token_hash!r}")
    # NULL text → no signature (and len(None) crashes the numpy fold)
    df = df.filter(F.col(text_col).isNotNull())
    n_parts = max(df.sparkSession.sparkContext.defaultParallelism, 8)
    df = df.repartition(n_parts, F.col(id_col))
    sigs = (
        df.select(
            F.col(id_col),
            F.transform(tokens(F.col(text_col)), lambda t: hash_one(t)).alias(
                "__h"
            ),
        )
        .groupBy(id_col)
        .agg(F.flatten(F.collect_list("__h")).alias("__h"))
        .select(
            F.col(id_col),
            fold(F.col("__h")).alias("simhash"),
        )
    )
    return (
        sigs.groupBy("simhash")
        .agg(
            F.count("*").alias("n_docs"),
            F.min(id_col).alias("keep_id"),
            F.array_sort(F.collect_list(id_col)).alias("member_ids"),
        )
        .filter(F.col("n_docs") > 1)
    )


# ---------------------------------------------------------------------------
# Connected components (dedup-cluster resolution)
# ---------------------------------------------------------------------------
def _pinned_rdd_ids(spark) -> set[int]:
    """Ids of currently persisted/checkpointed RDDs in the context."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in jmap.keySet().toArray()}


def _release_new_pins(spark, before_ids: set[int]) -> None:
    """Unpersist every RDD pinned since ``before_ids`` was captured —
    scoped cleanup for iterative algorithms whose per-round
    localCheckpoints are otherwise unreleasable from the DataFrame
    API. (Assumes no concurrent persist from another driver thread,
    the normal case for a single SparkSession driver.)"""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for k in jmap.keySet().toArray():
        if int(k) not in before_ids:
            jmap.get(k).unpersist(False)


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Resolve pairwise duplicate edges into components: every node
    converges to the smallest id reachable from it. Output:
    (node, component) — component = min member id.

    This is the step after any pair-producing dedup (MinHash / SimHash /
    embedding near-dup): transitive closure picks ONE canonical doc per
    cluster even when A~B and B~C but A~C was never a candidate pair.

    Algorithm: min-label propagation PLUS pointer doubling — each round
    first takes the min over neighbours' labels (hook), then jumps to
    the label's own label (shortcut, L(u) ← L(L(u))). The shortcut
    halves label-chain lengths every round, so convergence is
    O(log diameter) rounds, not O(diameter): a 10k-node path graph
    closes in ~15 rounds instead of 10k. Each round is two
    equi-join+agg shuffles on node id at a width sized from the actual
    edge count — the shape that holds when the corpus is 100 TB but
    duplicate mass is orders of magnitude smaller.

    The per-round action (a sum(label) aggregate, monotonically
    decreasing, equal ⇒ fixpoint) doubles as the materialization of the
    round's lazy localCheckpoint, so each round costs exactly one Spark
    job. All checkpoint pins created here are released before
    returning; the result is spilled to a session-temp parquet (the
    local twin of writing components to a table on a cluster)."""
    spark = edges.sparkSession
    pins_before = _pinned_rdd_ids(spark)
    # persist the raw edge list BEFORE the symmetrize union: both union
    # branches otherwise re-run the whole upstream pair-producing
    # pipeline (for MinHash edges that's the signature computation,
    # twice).
    e0 = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).persist()
    e = (
        e0.union(e0.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .persist()
    )
    # Size the propagation's shuffle width from the ACTUAL edge count:
    # dedup edge sets are bounded by duplicate mass, usually orders of
    # magnitude smaller than the corpus, and running log-many tiny
    # iterations at full fact-table width is pure per-task overhead.
    # (The count also materializes the persist before the loop.)
    n_edges = e.count()
    prev_width = spark.conf.get("spark.sql.shuffle.partitions")
    width = max(2, min(int(prev_width), n_edges // 50_000 + 1))
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(width))
        labels = (
            e.select("a")
            .distinct()
            .select(F.col("a").alias("node"), F.col("a").alias("label"))
            .localCheckpoint(eager=False)
        )
        prev_sum = labels.agg(F.sum("label")).collect()[0][0]
        for _ in range(max_iter):
            # hook: min over own + neighbours' labels
            nbr = (
                e.join(labels, e.b == labels.node)
                .groupBy("a")
                .agg(F.min("label").alias("nbr_label"))
            )
            # lazy checkpoint: the shortcut join below reads hooked on
            # BOTH sides — without this the hook join+agg runs twice per
            # round (measured 40% slower at sf0.1).
            hooked = (
                labels.join(nbr, labels.node == nbr.a, "left")
                .select(
                    "node",
                    F.least(
                        F.col("label"), F.coalesce("nbr_label", "label")
                    ).alias("label"),
                )
                .localCheckpoint(eager=False)
            )
            # shortcut (pointer doubling): L(u) ← min(L(u), L(L(u)))
            parent = hooked.select(
                F.col("node").alias("p_node"), F.col("label").alias("p_label")
            )
            labels = (
                hooked.join(parent, hooked.label == parent.p_node, "left")
                .select(
                    "node",
                    F.least(
                        F.col("label"), F.coalesce("p_label", "label")
                    ).alias("label"),
                )
                .localCheckpoint(eager=False)
            )
            cur_sum = labels.agg(F.sum("label")).collect()[0][0]
            if cur_sum == prev_sum:
                break
            prev_sum = cur_sum
        out = _spill_to_temp_parquet(
            labels.select("node", F.col("label").alias("component")),
            "components",
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_width)
    e0.unpersist()
    e.unpersist()
    _release_new_pins(spark, pins_before)
    return out


def dedup_component_groups(
    edges: DataFrame, src: str = "id_a", dst: str = "id_b"
) -> DataFrame:
    """Components summarized per cluster: canonical keep_id (min),
    member list, size."""
    cc = connected_components(edges, src, dst)
    return (
        cc.groupBy(F.col("component").alias("keep_id"))
        .agg(
            F.count("*").alias("n_members"),
            F.array_sort(F.collect_list("node")).alias("member_ids"),
        )
        .orderBy("keep_id")
    )


def prefix_filter_jaccard_join(
    docs: DataFrame,
    id_col: str,
    grams_col: str,
    threshold: float,
) -> DataFrame:
    """EXACT set-similarity self-join via prefix filtering (the
    AllPairs/PPJoin family) — returns EVERY pair with Jaccard >=
    threshold, with a candidate set that is provably complete: if
    J(A,B) >= t then, under any global total order on grams, the first
    ``|A| - ceil(t*|A|) + 1`` grams of A and of B must share an
    element (otherwise the overlap is too small to reach t). Ordering
    grams rarest-first (document frequency asc, gram asc) makes those
    prefixes hit the LONG TAIL of the gram distribution, so the
    prefix-gram join buckets stay small even when the corpus shares
    hot boilerplate grams — the property banding/LSH only achieve
    probabilistically. A length filter (t*|A| <= |B| <= |A|/t) prunes
    the rest.

    100 TB shape: one explode + one gram-keyed aggregate for document
    frequencies, one equi-join back, per-doc array sort (map-side),
    then an equi-join ON RARE GRAMS ONLY and an exact verify over the
    candidate pairs. No O(n²) stage anywhere; every shuffle is keyed.
    Unlike minhash_lsh_pairs (probabilistic recall) this is the exact
    tier: recall 1.0 by construction.
    """
    cand, ranked = _prefix_filter_candidates(docs, id_col, grams_col, threshold)
    cand = _spread_for_verify(cand, "id_a")
    ga = ranked.select(F.col("pid").alias("id_a"), F.col("grams").alias("ga"))
    gb = ranked.select(F.col("pid").alias("id_b"), F.col("grams").alias("gb"))
    return (
        cand.join(ga, "id_a")
        .join(gb, "id_b")
        .select(
            "id_a",
            "id_b",
            jaccard(F.col("ga"), F.col("gb")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def _prefix_filter_candidates(
    docs: DataFrame,
    id_col: str,
    grams_col: str,
    threshold: float,
    block_cols: tuple[str, ...] = (),
) -> "tuple[DataFrame, DataFrame]":
    """The candidate stage of the AllPairs/PPJoin family, reusable by
    any exact set-similarity operator: returns ``(cand, ranked)`` —
    ``cand`` = DISTINCT (id_a, id_b) pairs PROVABLY containing every
    pair with Jaccard >= threshold (prefix completeness: under any
    global total order, two sets with J >= t must share one of their
    first ``|g| - ceil(t*|g|) + 1`` grams), ``ranked`` = (pid, grams
    rarest-first, n) for callers that verify on the ranked sets.

    ``block_cols`` adds extra equi-join keys (e.g. a source label or a
    length band) when the caller's pair DEFINITION requires them —
    candidates then need the prefix gram AND every block column to
    match, and ``cand`` carries the matched block values so the caller
    can re-apply the equality in its verify join-back (ADVICE r13: a
    doc_id ingested under conflicting block values must not produce
    cross-block row pairs). Completeness is unaffected: a qualifying
    pair shares its own block values by definition. Contract residual:
    duplicate rows of one id WITHIN a block must be exact replicas —
    grams are set-merged per (id, *block_cols), which is exact for
    replicas (the explode is distinct) but would blend genuinely
    different texts under the same (id, block).

    100 TB shape: one explode + gram-keyed df-count aggregate, one
    join back, map-side array sort, then an equi-join ON RARE GRAMS
    (+ block keys) only — bucket sizes ride the df long tail, never a
    block-squared comparison."""
    keep = [F.col(c) for c in block_cols]
    g = docs.select(
        F.col(id_col).alias("pid"), F.col(grams_col).alias("grams"), *keep
    )
    # distinct (pid, gram): a replayed/duplicated doc row must not
    # double its grams in the collected set (array sizes would lie to
    # the Jaccard) nor double-count document frequency
    ex = g.select("pid", F.explode("grams").alias("gram"), *keep).distinct()
    freq = ex.groupBy("gram").agg(F.count("*").alias("df_cnt"))
    ranked = (
        ex.join(freq, "gram")
        .groupBy("pid", *block_cols)
        .agg(
            F.array_sort(F.collect_list(F.struct("df_cnt", "gram"))).alias("sg")
        )
        .select(
            "pid",
            *block_cols,
            F.transform("sg", lambda s: s["gram"]).alias("grams"),
            F.size("sg").alias("n"),
        )
    )
    # ranked fans into FOUR plan branches (both sides of the
    # prefix-gram self-join via ``pre`` + both verify join-backs in
    # every caller), and the branches materialize as independent
    # broadcast-exchange jobs that each recompute the whole
    # explode → df-count → join → sort pipeline (none of the subtrees
    # canonicalize identically, so Catalyst's exchange reuse never
    # fires). Spill-to-parquet computes it once and truncates the
    # lineage — the production shape is writing the ranked-gram table
    # once and letting every consumer scan it — and unlike
    # localCheckpoint leaves ZERO pinned RDDs behind (the consumers are
    # lazy, so a checkpoint pin here is unreleasable by the operator —
    # the r3 leak class the cache-release tests assert against).
    ranked = _spill_to_temp_parquet(ranked, "prefix_ranked")
    # posexplode: the 0-based rank of each prefix gram feeds the PPJoin
    # POSITIONAL filter below (slice() keeps ranked order, so a prefix
    # position is also the position in the full ranked array).
    pre = ranked.select(
        "pid",
        "n",
        *keep,
        F.posexplode(
            F.expr(
                f"slice(grams, 1, size(grams) - cast(ceil({threshold} * size(grams)) as int) + 1)"
            )
        ).alias("pos", "gram"),
    )
    a, b = pre.alias("a"), pre.alias("b")
    # PPJoin positional filter (lossless): a pair with J >= t has
    # overlap >= ceil(t/(1+t) * (|a|+|b|)), and for its FIRST shared
    # gram — ranked position i in a, j in b — every other shared gram
    # sits strictly after both, so overlap <= 1 + min(|a|-i-1, |b|-j-1).
    # Requiring that upper bound to reach the overlap floor therefore
    # keeps at least the first-match row of every qualifying pair (the
    # DISTINCT below only needs one), while pruning the hot-gram
    # candidates the plain AllPairs prefix lets through (measured:
    # 444k candidates -> 256 verified pairs at sf0.1 without it).
    pos_ubound = F.lit(1) + F.least(
        F.col("a.n") - F.col("a.pos") - 1, F.col("b.n") - F.col("b.pos") - 1
    )
    overlap_floor = F.ceil(
        F.lit(threshold / (1.0 + threshold))
        * (F.col("a.n") + F.col("b.n")).cast("double")
    )
    join_cond = (
        (F.col("a.gram") == F.col("b.gram"))
        & (F.col("a.pid") < F.col("b.pid"))
        & (F.col("b.n").cast("double") >= F.col("a.n") * threshold)
        & (F.col("a.n").cast("double") >= F.col("b.n") * threshold)
        & (pos_ubound.cast("long") >= overlap_floor)
    )
    for c in block_cols:
        join_cond = join_cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    cand = (
        a.join(b, join_cond)
        .select(
            F.col("a.pid").alias("id_a"),
            F.col("b.pid").alias("id_b"),
            *[F.col(f"a.{c}").alias(c) for c in block_cols],
        )
        .distinct()
    )
    return cand, ranked.select("pid", "grams", "n")
