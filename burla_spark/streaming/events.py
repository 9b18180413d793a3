"""Structured Streaming pipelines over the events table
(SURVEY.md §2.B streaming rows).

The reference itself is batch-only — its only streaming is result/log
delivery (SURVEY.md §2 A11/A14); the events fixture exists so the
engine exposes real stream processing: windowed aggregation, session
windows, watermarking, stateful dedup.

Tests and the driver gate run hermetically: the parquet file is read
with the file source under ``Trigger.AvailableNow`` into a memory sink,
so a "stream" run is reproducible and comparable to a batch oracle.
In production the same pipeline definitions run unchanged against a
live file/Kafka source — only ``readStream`` options change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from burla_spark.functions.numeric import dec


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet, sharing the batch loader's
    ts-ingestion contract.

    The stream schema is derived from a one-footer batch read (not
    hardcoded) so whatever physical type the runtime surfaces for the
    parquet TIMESTAMP(NANOS) column — TIMESTAMP_NTZ on Spark 4.1+, raw
    int64 nanos on legacy-conf runtimes — is normalized identically to
    ``load_table`` by ``normalize_events_ts``. Batch oracle and stream
    therefore always agree on event time."""
    import os

    from burla_spark.sources.tables import (
        _apply_ingest_domains,
        normalize_events_ts,
        table_path,
    )

    path = table_path(sf_dir, "events")
    schema = spark.read.parquet(path).schema
    if os.path.isdir(path):
        # directory-of-part-files layout (what a 100 TB table actually
        # is): stream the directory itself — a basename glob would
        # match no part file.
        raw = spark.readStream.schema(schema).parquet(path)
    else:
        # single-file fixture layout: glob inside sf_dir (a stream
        # source must be a directory, so filter to the one file).
        raw = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
    # Same ingest-domain contract as the batch loader (value payloads
    # outside the declared domain are nulled) — batch oracle and stream
    # must see identical inputs or every stateful agg diverges the
    # moment a NaN/Inf payload arrives (round-8 extreme sweep).
    return _apply_ingest_domains(normalize_events_ts(raw), "events")


# State-store width for the hermetic single-file replays: each stateful
# operator spins one state store per shuffle partition per side, and that
# fixed cost dominates a small replay (stream-stream join at width 32:
# ~6 s; width 8: ~2 s at sf0.1 — same results, partitioning-invariant by
# the determinism contract). A production stream sizes width to volume
# (and a checkpoint pins it); this knob only scopes the replay runs.
STREAM_REPLAY_SHUFFLE_PARTITIONS = 8


import contextlib


@contextlib.contextmanager
def _replay_width(spark: SparkSession):
    """Narrow the shuffle width for the duration of a hermetic replay
    (state-store-per-partition fixed cost dominates small replays; see
    STREAM_REPLAY_SHUFFLE_PARTITIONS), restoring the session value on
    exit — shared by every replay entry point so the contract lives in
    one place.

    Also disables checkpoint file CHECKSUMS for the replay: Spark
    4.1's ChecksumCheckpointFileManager (on by default) writes a
    checksum sidecar for every state-store delta/offset file and every
    task's store commit BLOCKS awaiting it — thread dumps showed all
    replay tasks parked in ChecksumCancellableFSDataOutputStream.close,
    and the stream-stream join replay ran 2.5-3x slower with it on
    (full-outer 38.5s -> 10.4s measured). These replays write
    throwaway per-run checkpoints whose integrity is verified by the
    batch oracle itself, so the durability sidecar is pure overhead;
    a production stream with a long-lived checkpoint on object storage
    keeps the default."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    prev_ck = spark.conf.get(
        "spark.sql.streaming.checkpoint.fileChecksum.enabled"
    )
    narrow = min(int(prev), STREAM_REPLAY_SHUFFLE_PARTITIONS)
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(narrow))
        spark.conf.set(
            "spark.sql.streaming.checkpoint.fileChecksum.enabled", "false"
        )
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        spark.conf.set(
            "spark.sql.streaming.checkpoint.fileChecksum.enabled", prev_ck
        )


def run_stream_to_table(
    stream_df: DataFrame,
    name: str,
    output_mode: str,
    assert_single_batch: bool = False,
) -> None:
    """Execute a streaming DataFrame to completion into a memory sink.

    ``assert_single_batch`` is for operators whose oracle equivalence
    depends on the replay arriving time-ordered ACROSS micro-batches
    (stream_burst_throttle's last-seen-ts state): it verifies from the
    query's progress history that at most one micro-batch carried rows,
    so a future maxFilesPerTrigger/multi-file change that silently
    splits the replay fails loudly here instead of diverging the
    oracle."""
    with _replay_width(stream_df.sparkSession):
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        if assert_single_batch:
            data_batches = [
                p for p in q.recentProgress if p["numInputRows"] > 0
            ]
            if len(data_batches) > 1:
                raise AssertionError(
                    f"{name}: replay split into {len(data_batches)} "
                    "data-bearing micro-batches; the last-seen-ts state "
                    "contract requires a single ordered batch (see "
                    "stream_burst_throttle docstring)"
                )


def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute tumbling windows with a watermark, run as a stream.

    complete output mode so every window materializes under
    AvailableNow (append would hold back windows the watermark hasn't
    closed when the stream ends)."""
    s = events_stream(spark, sf_dir)
    agg = (
        s.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(dec("value")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("bucket_start"), "event_type", "n_events", "total_value")
    )
    run_stream_to_table(agg, "stream_tumbling_counts", "complete")
    return spark.table("stream_tumbling_counts")


def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STATIC enrichment join — the most common production
    streaming pattern: every micro-batch of events joins the static
    customer dimension (user -> market segment) before aggregating.
    Spark broadcasts the dim per batch (no stream-side state at all,
    unlike stream-stream joins), which is exactly the 100 TB/day
    shape: the dimension is re-read/broadcast per trigger, so slowly-
    changing dims pick up updates between batches for free.

    complete mode per-segment totals; the batch join+group is an exact
    oracle under the engine's decimal-sum contract."""
    from burla_spark.sources.tables import load_table

    s = events_stream(spark, sf_dir)
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    agg = (
        s.join(F.broadcast(dim), "user_id")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(dec("value")).cast("double").alias("total_value"),
        )
    )
    run_stream_to_table(agg, "stream_static_enrich", "complete")
    return spark.table("stream_static_enrich")


def stream_session_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session windows (30-min gap) per user, as a stream.
    session_window merges events closer than the gap — the streaming
    twin of the batch events_sessionize plan."""
    s = events_stream(spark, sf_dir)
    agg = (
        s.withWatermark("ts", "30 minutes")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(dec("value")).cast("double").alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "session_value",
        )
    )
    run_stream_to_table(agg, "stream_session_aggregate", "complete")
    return spark.table("stream_session_aggregate")


def stream_stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary stateful processing (applyInPandasWithState): running
    per-user (event count, value total) kept in explicit state across
    micro-batches. math.fsum keeps the running total correctly rounded
    so the result is reproducible and batch-comparable."""
    import math

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    s = events_stream(spark, sf_dir)

    def update(key, pdfs, state: GroupState):
        if state.exists:
            count, total = state.get
        else:
            count, total = 0, 0.0
        values = []
        for pdf in pdfs:
            count += len(pdf)
            # dropna: SQL SUM ignores NULLs; a NaN would poison the
            # running total (and diverge from the batch oracle)
            values.extend(pdf["value"].dropna().tolist())
        total = math.fsum([total, *values])
        state.update((count, total))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [count],
                "total_value": [round(total, 2)],
            }
        )

    stats = s.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="count long, total double",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    run_stream_to_table(stats, "stream_stateful_user_stats", "append")
    return spark.table("stream_stateful_user_stats")


def stream_burst_throttle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of curation.burst_first_events: keep only the
    FIRST event of each 30-minute activity burst per (user,
    event_type) — the notification-throttle row filter as an online
    operator. Explicit keyed state (applyInPandasWithState) carries the
    last SEEN event's timestamp across micro-batches, so an event
    survives exactly when no previous same-key event fell within the
    window — the identical rule the batch window-lag plan applies,
    which is why the batch SQL is an exact oracle.

    ORDERING CONTRACT (ADVICE r11): the state is only the LAST-SEEN
    timestamp per key, so equivalence to the batch LAG oracle requires
    every micro-batch to arrive in global ts order across batches
    (within a batch the UDF sorts). The hermetic replay guarantees
    this by construction — ``events_stream`` never sets
    ``maxFilesPerTrigger``, so availableNow drains the fixture in ONE
    micro-batch (asserted below via the progress history). A
    production feed with cross-batch out-of-order events needs the
    watermark-buffered variant (hold rows until watermark, emit in ts
    order) — this operator documents that it implements the in-order
    contract, not that one.

    100 TB shape: state is ONE long per live (user, type) key; the
    shuffle is the same single keyed exchange as the batch plan."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = 30 * 60 * 1_000_000
    s = events_stream(spark, sf_dir).filter(F.col("ts").isNotNull())

    import numpy as np

    def throttle(key, pdfs, state: GroupState):
        # this function runs once per KEY (7500 keys of ~13 rows at
        # sf0.1): per-call pandas overhead dominates the stage, so the
        # body is whole-group numpy — no concat for the common single
        # chunk, vectorized sort and gap test instead of a row loop
        # with a pd.Timestamp construction per event. Identical rule:
        # keep an event iff no previous same-key event (kept or not)
        # fell within the gap; last-SEEN ts is the only state.
        last_us = state.get[0] if state.exists else None
        chunks = list(pdfs)
        pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
        ts_us = pdf["ts"].to_numpy().astype("datetime64[us]").view("int64")
        # stable lexsort (ts, then event_id) == sort_values mergesort;
        # NaN event_ids order last under both.
        order = np.lexsort((pdf["event_id"].to_numpy(), ts_us))
        ts_sorted = ts_us[order]
        if len(ts_sorted):
            prev = np.empty_like(ts_sorted)
            prev[1:] = ts_sorted[:-1]
            if last_us is None:
                prev[0] = ts_sorted[0] - gap_us - 1  # always kept
            else:
                prev[0] = last_us
            keep = (ts_sorted - prev) > gap_us
            state.update((int(ts_sorted[-1]),))
            out = pdf.iloc[order[keep]][
                ["event_id", "user_id", "event_type", "ts"]
            ]
        else:
            out = pdf.iloc[:0][["event_id", "user_id", "event_type", "ts"]]
        yield out

    kept = s.groupBy("user_id", "event_type").applyInPandasWithState(
        throttle,
        outputStructType=(
            "event_id long, user_id long, event_type string, ts timestamp"
        ),
        stateStructType="last_us long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    run_stream_to_table(
        kept, "stream_burst_throttle", "append", assert_single_batch=True
    )
    return spark.table("stream_burst_throttle")


def stream_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute windows sliding every 10 — the streaming twin of the
    batch events_sliding_agg plan (each event expands into 3 window
    buckets before the single keyed-state aggregation)."""
    s = events_stream(spark, sf_dir)
    agg = (
        s.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "30 minutes", "10 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(dec("value")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("bucket_start"), "n_events", "total_value")
    )
    run_stream_to_table(agg, "stream_sliding_counts", "complete")
    return spark.table("stream_sliding_counts")


def stream_watermark_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicatesWithinWatermark: dedup state is bounded by the
    watermark horizon instead of growing forever — the only form of
    streaming dedup that survives an unbounded stream. event_id is
    unique in the fixture, so with a horizon covering the replayed
    file the output equals batch DISTINCT (exact oracle); on a live
    stream only duplicates closer than the horizon collapse."""
    s = events_stream(spark, sf_dir)
    deduped = (
        s.select("event_id", "user_id", "event_type", "ts")
        .withWatermark("ts", "31 days")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "user_id", "event_type")
    )
    run_stream_to_table(deduped, "stream_watermark_dedup", "append")
    return spark.table("stream_watermark_dedup")


def stream_click_purchase_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: each click joins same-user
    purchases within the following 30 minutes.

    Both sides carry watermarks and the join condition bounds event
    time on both sides — that's what lets Spark expire join state
    instead of buffering both streams forever (the 100 TB/day
    requirement for stream-stream joins). Inner join + availableNow
    emits every matched pair, so the batch self-join is an exact
    oracle."""
    s = events_stream(spark, sf_dir)
    clicks = (
        s.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        s.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")),
    ).select(
        "user_id",
        "click_id",
        "purchase_id",
        (
            F.unix_micros(F.col("purchase_ts")) - F.unix_micros(F.col("click_ts"))
        ).alias("micros_to_purchase"),
        "purchase_value",
    )
    run_stream_to_table(joined, "stream_click_purchase_join", "append")
    return spark.table("stream_click_purchase_join")


# Sentinel-augmented stream directories, one per sf_dir per process
# (building one copies the 2 MB fixture once, not per run).
_SENTINEL_DIR_CACHE: dict[str, str] = {}


def _events_dir_with_sentinels(spark: SparkSession, sf_dir: str) -> str:
    """Copy the events file into a session-temp stream directory and
    append two sentinel files (a click + purchase pair per file) far
    past the real horizon, with strictly increasing mod-times.

    Purpose: append-mode outer joins hold back unmatched rows until
    the watermark proves no future match can arrive. A finite replay's
    watermark stops 1 h short of the newest real event, so the tail's
    unmatched rows would be silently withheld at termination and the
    result would not equal the batch left join. Replayed with
    ``maxFilesPerTrigger=1`` the sentinels form their own trailing
    micro-batches: the first advances the watermark past every real
    event, the second triggers eviction under that watermark (a batch
    evicts with the watermark derived from the PREVIOUS batch's data).
    Sentinels carry negative event_ids so queries can drop them after
    the stateful operator. Production streams don't need this — data
    keeps arriving; it is the hermetic-replay twin of "the stream
    outlives the watermark delay"."""
    import os
    import shutil
    import tempfile
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from burla_spark.sources.tables import table_path

    import atexit

    cached = _SENTINEL_DIR_CACHE.get(sf_dir)
    if cached is not None and os.path.isdir(cached):
        return cached
    src = table_path(sf_dir, "events")
    tmp = tempfile.mkdtemp(prefix="burla_stream_sentinel_")
    atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    if os.path.isdir(src):
        for i, part in enumerate(sorted(os.listdir(src))):
            if part.endswith(".parquet"):
                shutil.copy(os.path.join(src, part), os.path.join(tmp, f"00_{i}.parquet"))
    else:
        shutil.copy(src, os.path.join(tmp, "00_events.parquet"))

    schema = pq.read_schema(
        os.path.join(tmp, sorted(os.listdir(tmp))[0])
    )
    max_ts = pq.read_table(
        [os.path.join(tmp, f) for f in sorted(os.listdir(tmp))], columns=["ts"]
    )["ts"].to_pandas().max()
    import pandas as _pd

    if _pd.isna(max_ts):  # empty fixture (degraded sweep): any base works
        max_ts = _pd.Timestamp("2024-01-01")
    ts_type = schema.field("ts").type
    import pandas as pd

    def sentinel_file(name: str, ts_value, base_mtime: float) -> None:
        table = pa.Table.from_arrays(
            [
                pa.array([-1, -2], type=schema.field("event_id").type),
                pa.array(
                    pd.Series([ts_value, ts_value]), type=ts_type
                ),
                pa.array([-1, -1], type=schema.field("user_id").type),
                pa.array(["click", "purchase"], type=schema.field("event_type").type),
                pa.array([0.0, 0.0], type=schema.field("value").type),
                pa.array([None, None], type=schema.field("props").type),
            ],
            schema=schema,
        )
        path = os.path.join(tmp, name)
        pq.write_table(table, path)
        os.utime(path, (base_mtime, base_mtime))

    now = time.time()
    for f in os.listdir(tmp):
        os.utime(os.path.join(tmp, f), (now - 120, now - 120))
    sentinel_file("90_sentinel_a.parquet", max_ts + pd.Timedelta(days=3), now - 60)
    sentinel_file("91_sentinel_b.parquet", max_ts + pd.Timedelta(days=6), now - 30)
    _SENTINEL_DIR_CACHE[sf_dir] = tmp
    return tmp


def stream_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: every click emits —
    joined to each same-user purchase in the following 30 minutes, or
    once with NULL purchase columns when the watermark proves no match
    can arrive. The append-mode-holdback semantics (unmatched rows
    wait for watermark passage, not for end-of-input) are exactly what
    an attribution pipeline needs: "clicks that did NOT convert" is
    the interesting set, and it must be emitted incrementally, not
    when the stream ends.

    State stays bounded exactly as in the inner variant: two-sided
    watermarks + both-sided event-time bounds in the condition. The
    sentinel replay mechanics (see _events_dir_with_sentinels) exist
    only to make the finite replay flush its tail so the batch LEFT
    JOIN is an exact oracle."""
    import os

    from burla_spark.sources.tables import (
        _apply_ingest_domains,
        normalize_events_ts,
    )

    stream_dir = _events_dir_with_sentinels(spark, sf_dir)
    schema = spark.read.parquet(stream_dir).schema
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stream_dir)
    )
    s = _apply_ingest_domains(normalize_events_ts(raw), "events")
    clicks = (
        s.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        s.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")),
        "left_outer",
    ).select(
        "user_id",
        "click_id",
        "purchase_id",
        (
            F.unix_micros(F.col("purchase_ts")) - F.unix_micros(F.col("click_ts"))
        ).alias("micros_to_purchase"),
        "purchase_value",
    )
    run_stream_to_table(joined, "stream_left_outer_join", "append")
    return spark.table("stream_left_outer_join").filter(F.col("click_id") >= 0)


def stream_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream FULL OUTER interval join — the attribution view
    from BOTH directions at once: every click emits (with its
    conversions, or NULL purchase columns once the watermark proves no
    match can arrive) AND every orphan purchase emits with NULL click
    columns (purchases with no preceding click inside the 30-minute
    window — the "untracked conversion" set a revenue-integrity
    pipeline reconciles). Completes the stream-stream join-mode matrix
    (inner / left_outer / full_outer) over the same two-sided
    watermark + event-time-bound state contract: the join condition
    bounds each side's event time by the other's, so state for both
    sides evicts as the watermark advances — bounded regardless of
    stream length.

    Sentinel replay mechanics are shared with the left-outer variant
    (_events_dir_with_sentinels): a finite replay's watermark stops
    short of the tail, so two far-future sentinel batches flush it;
    sentinels carry negative event_ids and are dropped below. The
    batch FULL OUTER join over the same predicate is the exact
    oracle.

    NULL-key policy (both sides, matches STREAM_FULL_OUTER_SQL): a NULL
    user_id never satisfies the equi-join predicate, but FULL OUTER
    still emits it unmatched — and Spark's stream-stream state machine
    and the batch oracle disagree on exactly which NULL-key rows
    surface (round-7 probe: 3961 vs 3964 rows). Join keys need an
    identity; both engines exclude NULL keys explicitly, same policy as
    events_asof_join (commit d7c76ad). Sentinels carry user_id = -1, so
    they survive this filter and still flush state."""
    from burla_spark.sources.tables import (
        _apply_ingest_domains,
        normalize_events_ts,
    )

    stream_dir = _events_dir_with_sentinels(spark, sf_dir)
    schema = spark.read.parquet(stream_dir).schema
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stream_dir)
    )
    s = _apply_ingest_domains(normalize_events_ts(raw), "events").filter(
        F.col("user_id").isNotNull()
    )
    clicks = (
        s.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        s.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")),
        "full_outer",
    ).select(
        F.coalesce(F.col("c_user_id"), F.col("p_user_id")).alias("user_id"),
        "click_id",
        "purchase_id",
        (
            F.unix_micros(F.col("purchase_ts")) - F.unix_micros(F.col("click_ts"))
        ).alias("micros_to_purchase"),
        "purchase_value",
    )
    run_stream_to_table(joined, "stream_full_outer_join", "append")
    # drop sentinel-derived rows: sentinels sit past every real event's
    # join window, so they only ever pair with each other or emit
    # unmatched — a NULL-or-negative test on each id removes exactly them.
    t = spark.table("stream_full_outer_join")
    return t.filter(
        (F.col("click_id").isNull() | (F.col("click_id") >= 0))
        & (F.col("purchase_id").isNull() | (F.col("purchase_id") >= 0))
    )


# Multi-file copies of the events fixture, one per sf_dir per process —
# gives maxFilesPerTrigger=1 replays real multi-batch upsert traffic.
_SPLIT_DIR_CACHE: dict[str, str] = {}


def _events_dir_split(spark: SparkSession, sf_dir: str, n_files: int = 4) -> str:
    import os
    import tempfile

    from burla_spark.sources.tables import load_table

    import atexit
    import shutil

    cached = _SPLIT_DIR_CACHE.get(sf_dir)
    if cached is not None and os.path.isdir(cached):
        return cached
    tmp = tempfile.mkdtemp(prefix="burla_stream_split_")
    atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    load_table(spark, sf_dir, "events").repartition(n_files).write.mode(
        "overwrite"
    ).parquet(tmp)
    _SPLIT_DIR_CACHE[sf_dir] = tmp
    return tmp


def _current_snapshot(target_dir: str) -> str | None:
    """Resolve the live snapshot directory via the CURRENT pointer file."""
    import os

    ptr = os.path.join(target_dir, "CURRENT")
    try:
        with open(ptr, encoding="utf-8") as fh:
            name = fh.read().strip()
    except OSError:
        return None
    path = os.path.join(target_dir, name)
    return path if os.path.isdir(path) else None


def read_upsert_table(spark: SparkSession, target_dir: str) -> DataFrame:
    path = _current_snapshot(target_dir)
    if path is None:
        raise FileNotFoundError(f"no committed snapshot under {target_dir}")
    return spark.read.parquet(path)


def _merge_batch_into_dir(batch_df: DataFrame, target_dir: str, key_cols: list[str]) -> None:
    """Keyed upsert of one micro-batch into a parquet 'table' — the
    MERGE INTO pattern without a table format: rows whose key appears
    in the batch are replaced, others kept. Idempotent by construction
    (replaying a batch overwrites the same keys with the same values),
    which is exactly the property foreachBatch needs for its
    at-least-once redelivery to yield exactly-once TABLE contents.

    Commit protocol (how real table formats do it): the new snapshot
    is fully written to its own directory, then a CURRENT pointer file
    flips to it via write-tmp + ``os.replace`` — ONE atomic step, so a
    concurrent reader resolves either the old snapshot or the new one,
    never a missing/torn table (a dir-rename swap has a window where
    no current table exists). A crash before the flip leaves the old
    snapshot live; orphaned snapshots are cleaned after the flip."""
    import os
    import shutil
    import uuid

    spark = batch_df.sparkSession
    prev = _current_snapshot(target_dir)
    if prev is not None:
        merged = (
            spark.read.parquet(prev)
            .join(batch_df.select(*key_cols), key_cols, "left_anti")
            .unionByName(batch_df)
        )
    else:
        merged = batch_df
    snap_name = f"snap_{uuid.uuid4().hex}"
    snap = os.path.join(target_dir, snap_name)
    merged.write.mode("overwrite").parquet(snap)  # materializes BEFORE flip
    ptr_tmp = os.path.join(target_dir, f".CURRENT.{uuid.uuid4().hex}")
    with open(ptr_tmp, "w", encoding="utf-8") as fh:
        fh.write(snap_name)
    os.replace(ptr_tmp, os.path.join(target_dir, "CURRENT"))  # atomic flip
    if prev is not None:
        shutil.rmtree(prev, ignore_errors=True)


def stream_upsert_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming upsert sink: per-user running totals merged into a
    parquet table by key via ``foreachBatch`` — the exactly-once MERGE
    pattern every warehouse-bound stream uses (Delta/Iceberg MERGE
    INTO; emulated here with an atomic snapshot swap since no table
    format ships in this container).

    The replay streams a 4-file copy of the fixture one file per
    micro-batch, so several batches carry overlapping user keys and
    the merge genuinely exercises update-vs-insert paths; update-mode
    aggregation emits cumulative totals, so last-write-wins per key
    equals the batch aggregate — the exact oracle.

    100 TB shape: state is user-cardinality; each batch rewrites only
    its merged snapshot (a real table format makes that delta-sized
    instead of table-sized — swap _merge_batch_into_dir for MERGE INTO
    there; the pipeline definition is unchanged)."""
    import atexit
    import shutil
    import tempfile

    stream_dir = _events_dir_split(spark, sf_dir)
    target_dir = tempfile.mkdtemp(prefix="burla_upsert_target_")
    atexit.register(shutil.rmtree, target_dir, ignore_errors=True)
    return run_upsert_totals(spark, stream_dir, target_dir)


def run_upsert_totals(
    spark: SparkSession,
    stream_dir: str,
    target_dir: str,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Drive the per-user-totals upsert stream over ``stream_dir`` into
    ``target_dir``. With ``checkpoint_dir`` the run is RESUMABLE: a
    restart replays only files the checkpoint has not committed, and
    the keyed merge makes redelivered batches idempotent — together
    that is the exactly-once restart story (test_streaming_late drives
    stop-grow-resume through this entry point)."""
    import os

    from burla_spark.sources.tables import (
        _apply_ingest_domains,
        normalize_events_ts,
    )

    schema = spark.read.parquet(stream_dir).schema
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stream_dir)
    )
    # NULL-key policy (both sides, matches STREAM_UPSERT_SQL): the keyed
    # merge joins existing rows on user_id, and a NULL key never matches
    # itself — so every micro-batch carrying the NULL group appended a
    # FRESH row instead of updating the old one (round-7 probe: 154 vs
    # 151 rows, one extra NULL row per later batch). Upsert keys need an
    # identity; both engines exclude NULL keys explicitly.
    s = _apply_ingest_domains(normalize_events_ts(raw), "events").filter(
        F.col("user_id").isNotNull()
    )
    totals = s.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum(dec("value")).cast("double").alias("total_value"),
    )
    with _replay_width(spark):
        writer = (
            totals.writeStream.outputMode("update")
            .foreachBatch(
                lambda batch_df, batch_id: _merge_batch_into_dir(
                    batch_df, target_dir, ["user_id"]
                )
            )
            .trigger(availableNow=True)
        )
        if checkpoint_dir is not None:
            writer = writer.option("checkpointLocation", checkpoint_dir)
        q = writer.start()
        q.awaitTermination()
    return read_upsert_table(spark, target_dir)


def _scale_decimal4(v) -> int:
    """value -> integer 1e-4 units, exactly as DuckDB/Spark cast DOUBLE
    to DECIMAL(18,4): round half away from zero on the binary double.
    Verified equal to DuckDB's cast on every distinct fixture value."""
    import math

    if v is None or v != v:  # NULL / NaN contribute nothing, like SQL SUM
        return 0
    r = float(v) * 10000.0
    return int(math.copysign(math.floor(abs(r) + 0.5), r))


def _round_decimal4_to_2dp(scaled: int) -> float:
    """ROUND(DECIMAL(18,4) sum, 2) -> DOUBLE, half away from zero —
    integer arithmetic end to end so the stream agrees bit-for-bit with
    the oracle's decimal accumulation (no binary-float drift, no
    banker's rounding)."""
    q, r = divmod(abs(scaled), 100)
    if r >= 50:
        q += 1
    return (q if scaled >= 0 else -q) / 100.0


def _merge_pending_sessions(
    sessions: list[tuple],
    events: list[tuple],
    gap_us: int,
) -> list[tuple]:
    """Merge new (ts_us, *payload) events into the pending-session
    list, each session a (start_us, last_us, *summed_payload) tuple
    (payload fields beyond the span are summed element-wise: event
    count, decimal-scaled sum, non-null count, ...).  Classic interval
    merge with a gap: an event lands in an existing session when it is
    within ``gap_us`` of the session span (including a late in-gap
    arrival that BRIDGES two pending sessions — both collapse into
    one).  Pure function, unit-tested directly."""
    merged: list[tuple] = []
    pending = sorted(sessions + [(e[0], e[0], 1, *e[1:]) for e in events])
    for s in pending:
        if merged and s[0] - merged[-1][1] <= gap_us:
            p = merged[-1]
            merged[-1] = (
                p[0],
                max(p[1], s[1]),
                *(p[i] + s[i] for i in range(2, len(p))),
            )
        else:
            merged.append(s)
    return merged


def stream_timer_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timer-driven sessionization — arbitrary state with
    ``GroupStateTimeout.EventTimeTimeout``: per-key state holds only
    the PENDING sessions (start, last, count, decimal-scaled sum), a
    per-key event-time TIMER is registered past the last activity, and
    a session is emitted exactly when the WATERMARK passes its end +
    gap — not when more data happens to arrive for the key. That timer
    path is what session_window cannot express for custom logic
    (emit-on-inactivity with arbitrary per-session payloads).

    State is O(1) per key, not O(events): each pending session is a
    4-tuple, and the number of pending sessions is bounded by
    (watermark lag / gap) + 1 — with the 10-minute watermark and
    30-minute gap that is at most 2 — because any session whose end
    trails the watermark by more than the gap is closed and emitted.
    Late in-gap arrivals (admitted by the watermark, older than the
    open session's last event) merge into — or bridge — pending
    sessions in _merge_pending_sessions; events late enough to need a
    CLOSED session are dropped by Spark's watermark filter before the
    function sees them, which is exactly the contract that makes
    closing at (end + gap < watermark) safe.

    Sums accumulate as integer 1e-4 units (the oracle's DECIMAL(18,4))
    and round half-away-from-zero at 2 dp, so the stream matches the
    decimal oracle bit-for-bit instead of via float fsum luck.

    The sentinel replay (see _events_dir_with_sentinels) advances the
    final watermark past every real timer, so every real session
    flushes and the batch sessionize aggregation is an exact oracle.
    30-minute gap, same as events_sessionize."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from burla_spark.sources.tables import (
        _apply_ingest_domains,
        normalize_events_ts,
    )

    gap_us = 30 * 60 * 1_000_000
    stream_dir = _events_dir_with_sentinels(spark, sf_dir)
    schema = spark.read.parquet(stream_dir).schema
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stream_dir)
    )
    # NULL-key policy (both sides, matches STREAM_TIMER_SESSIONS_SQL):
    # applyInPandasWithState keys the NULL group like a value, but the
    # output filter user_id >= 0 (which exists to drop the -1 sentinels)
    # is NULL on a NULL key and silently dropped those sessions while
    # the oracle kept its NULL partition (round-7 probe: 9309 vs 9519
    # rows). Session keys need an identity; both engines exclude NULL
    # keys explicitly. Sentinels are user_id = -1 and still flush timers.
    s = (
        _apply_ingest_domains(normalize_events_ts(raw), "events")
        .filter(F.col("user_id").isNotNull())
        .select("user_id", F.unix_micros("ts").alias("ts_us"), "value")
        .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
    )

    out_cols = [
        "user_id",
        "session_start_us",
        "session_end_us",
        "n_events",
        "session_value",
    ]

    def sessionize(key, pdfs, state: GroupState):
        if state.exists:
            starts, lasts, counts, sums, nvals = state.get
            pending = list(zip(starts, lasts, counts, sums, nvals))
        else:
            pending = []
        events: list[tuple[int, int, int]] = []
        if not state.hasTimedOut:
            for pdf in pdfs:
                # rows with NULL ts carry no event time — excluded,
                # like every window/aggregation path treats them
                ok = pdf["ts_us"].notna()
                events.extend(
                    # (ts, decimal-scaled value, non-null flag): an
                    # all-NULL session must emit SQL's SUM = NULL, not
                    # the 0 the scaler maps NULL to (null-sweep catch)
                    (int(t), _scale_decimal4(v), int(v == v and v is not None))
                    for t, v in zip(pdf.loc[ok, "ts_us"], pdf.loc[ok, "value"])
                )
        pending = _merge_pending_sessions(pending, events, gap_us)
        # close every session the watermark has passed: no admissible
        # event (ts >= watermark) can land within its gap anymore
        wm_us = state.getCurrentWatermarkMs() * 1000
        closed = [p for p in pending if p[1] + gap_us < wm_us]
        pending = [p for p in pending if p[1] + gap_us >= wm_us]
        # most (key, batch) invocations close nothing — constructing an
        # empty typed DataFrame per key was ~0.3 ms x 7500 keys x batch
        # count of pure overhead (the grouped-state stage is per-key
        # python; see OPTIMIZATION_r14). Yield only when there are rows,
        # and build by column, not dict-per-row.
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(closed),
                    "session_start_us": [p[0] for p in closed],
                    "session_end_us": [p[1] for p in closed],
                    "n_events": [p[2] for p in closed],
                    "session_value": [
                        _round_decimal4_to_2dp(p[3]) if p[4] > 0 else None
                        for p in closed
                    ],
                },
                columns=out_cols,
            )
        if pending:
            state.update(tuple(list(col) for col in zip(*pending)))
            # fire when the watermark proves the earliest pending
            # session closed (strictly past last + gap)
            state.setTimeoutTimestamp(
                min(p[1] for p in pending) // 1000 + gap_us // 1000 + 1
            )
        else:
            state.remove()

    sessions = (
        s.withWatermark("ts", "10 minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            sessionize,
            outputStructType=(
                "user_id long, session_start_us long, session_end_us long, "
                "n_events long, session_value double"
            ),
            stateStructType=(
                "starts array<long>, lasts array<long>, "
                "counts array<long>, sums array<long>, nvals array<long>"
            ),
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
    run_stream_to_table(sessions, "stream_timer_sessions", "append")
    return (
        spark.table("stream_timer_sessions")
        .filter(F.col("user_id") >= 0)
        .select(
            "user_id",
            F.timestamp_micros(F.col("session_start_us")).alias("session_start"),
            F.timestamp_micros(F.col("session_end_us")).alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def stream_tws_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transformWithStateInPandas (Spark 4's stateful-processor API,
    successor to applyInPandasWithState): per-user event count + exact
    value total kept in typed ValueState across micro-batches.

    Same batch oracle as stream_stateful_user_stats; this variant
    exercises the handle/ValueState lifecycle (init/close, typed state
    schema) that arbitrary operators — counters, sessionizers, CDC
    caches — build on at scale.

    Requires google.protobuf in the Python workers (the TWS state
    protocol is protobuf-encoded) — not present in this container, so
    the operator is gated: it raises a clear error here and runs
    unchanged where protobuf is installed. applyInPandasWithState
    (stream_stateful_user_stats) is the registry-tested equivalent.

    Round-11 vendoring attempt (VERDICT r10 'Next round #7'): a
    filesystem-wide sweep found NO protobuf runtime to ship via
    addPyFile — only typeshed stubs (annotation-only, no runtime) and
    pyspark's protobuf-JAR connector (JVM side only) — and the
    environment forbids installs, so the gate stands; nothing short of
    reimplementing the protobuf wire format would ungate it here."""
    try:
        import google.protobuf  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "transformWithStateInPandas needs google.protobuf on every "
            "Python worker (pip install protobuf); use "
            "stream_stateful_user_stats (applyInPandasWithState) here"
        ) from exc
    import math

    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals", "count long, total double"
            )

        def handleInputRows(self, key, rows, timerValues):
            if self._state.exists():
                count, total = self._state.get()
            else:
                count, total = 0, 0.0
            values = []
            for pdf in rows:
                count += len(pdf)
                values.extend(pdf["value"].tolist())
            total = math.fsum([total, *values])
            self._state.update((count, total))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [count],
                    "total_value": [round(total, 2)],
                }
            )

        def close(self) -> None:
            pass

    s = events_stream(spark, sf_dir)
    stats = s.groupBy("user_id").transformWithStateInPandas(
        UserTotals(),
        outputStructType="user_id long, n_events long, total_value double",
        outputMode="Update",
        timeMode="None",
    )
    run_stream_to_table(stats, "stream_tws_user_totals", "update")
    return spark.table("stream_tws_user_totals")


def stream_key_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming dedup on (user_id, event_type) — keeps the
    first arrival per key, emits the key set (key projection keeps the
    result order-independent and batch-comparable)."""
    s = events_stream(spark, sf_dir)
    deduped = s.select("user_id", "event_type").dropDuplicates(
        ["user_id", "event_type"]
    )
    run_stream_to_table(deduped, "stream_key_dedup", "append")
    return spark.table("stream_key_dedup")
