"""Watermark semantics across real micro-batches (SURVEY §7.1.6).

What Spark actually GUARANTEES (and what we assert): data within the
watermark is aggregated correctly, every append-mode window is emitted
at most once, and state is bounded — the watermark advances with event
time so closed windows never reopen into duplicate emissions.

What Spark does NOT guarantee (so we don't assert it): that data
arriving beyond the watermark is dropped. The engine may still process
a very-late row (observed on 4.1: it becomes its own already-closed
window, emitted once). Pipelines needing hard late-row exclusion filter
explicitly on event time downstream.

Driven as two real micro-batches (maxFilesPerTrigger=1 under
AvailableNow): batch 1 advances the watermark to 10:50, batch 2
delivers a far-late 00:05 event plus an on-time 11:30 event.
"""

from __future__ import annotations

import datetime as dt
import os
import tempfile
import time

from pyspark.sql import functions as F


def test_watermark_bounds_state_and_emits_each_window_once(spark):
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "stream_src")
        os.makedirs(src)

        def write_file(name, rows):
            df = spark.createDataFrame(rows, "ts timestamp, v long")
            stage = os.path.join(tmp, "stage_" + name)
            df.coalesce(1).write.parquet(stage)
            part = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]
            os.rename(os.path.join(stage, part), os.path.join(src, name))
            time.sleep(1.1)  # distinct mtimes → deterministic batch order

        t = lambda h, m: dt.datetime(2024, 1, 1, h, m)  # noqa: E731
        write_file("b1.parquet", [(t(10, 5), 1), (t(10, 40), 1), (t(11, 0), 1)])
        write_file("b2.parquet", [(t(0, 5), 1), (t(11, 30), 1)])

        stream = (
            spark.readStream.schema("ts timestamp, v long")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "30 minutes").alias("w"))
            .agg(F.count("*").alias("n"))
            .select(F.col("w.start").alias("start"), "n")
        )
        q = (
            stream.writeStream.format("memory")
            .queryName("late_test")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

        # it really ran as multiple micro-batches with an advancing
        # watermark — otherwise this test proves nothing
        marks = [
            p["eventTime"].get("watermark")
            for p in q.recentProgress
            if p["numInputRows"] > 0
        ]
        assert len(marks) >= 2
        assert marks[-1] > marks[0]

        rows = spark.table("late_test").collect()
        # append contract: each window emitted AT MOST ONCE
        starts = [r.start for r in rows]
        assert len(starts) == len(set(starts))
        got = {r.start.strftime("%H:%M"): r.n for r in rows}
        # in-watermark data aggregated correctly into closed windows
        assert got.get("10:00") == 1  # 10:05
        assert got.get("10:30") == 1  # 10:40
        # windows not yet passed by the final watermark (11:20) are
        # withheld: 11:00-11:30 and 11:30-12:00 both end after it
        assert "11:00" not in got
        assert "11:30" not in got


def test_stream_left_outer_emits_unmatched_and_matched(spark, sf_dir):
    """Non-vacuity: the left-outer stream join must contain BOTH
    watermark-flushed unmatched clicks (NULL purchase columns) and
    matched pairs — otherwise the oracle row proves nothing beyond the
    inner variant."""
    from pyspark.sql import functions as F

    from burla_spark.streaming.events import stream_left_outer_join

    df = stream_left_outer_join(spark, sf_dir)
    assert df.filter(F.col("purchase_id").isNull()).count() > 0
    assert df.filter(F.col("purchase_id").isNotNull()).count() > 0


def test_foreachbatch_merge_is_idempotent_and_upserts(spark, tmp_path):
    """Replaying a batch must not change the table (at-least-once
    redelivery → exactly-once contents), and a later batch must
    replace matched keys while keeping unmatched ones."""
    from burla_spark.streaming.events import (
        _merge_batch_into_dir,
        read_upsert_table,
    )

    target = str(tmp_path / "target")
    import os

    os.makedirs(target)
    b1 = spark.createDataFrame([(1, 10), (2, 20)], "k int, v int")
    _merge_batch_into_dir(b1, target, ["k"])
    _merge_batch_into_dir(b1, target, ["k"])  # redelivery
    cur = read_upsert_table(spark, target)
    assert sorted((r.k, r.v) for r in cur.collect()) == [(1, 10), (2, 20)]
    b2 = spark.createDataFrame([(2, 99), (3, 30)], "k int, v int")
    _merge_batch_into_dir(b2, target, ["k"])
    cur = read_upsert_table(spark, target)
    assert sorted((r.k, r.v) for r in cur.collect()) == [(1, 10), (2, 99), (3, 30)]
    # commit protocol: exactly one live snapshot + the atomic pointer
    names = sorted(os.listdir(target))
    assert "CURRENT" in names
    assert sum(1 for n in names if n.startswith("snap_")) == 1


def test_upsert_stream_resumes_from_checkpoint(spark, sf_dir, tmp_path):
    """Exactly-once restart: run the upsert stream over half the input
    files with a checkpoint, then add the rest and resume with the SAME
    checkpoint and target — the second run must process only the new
    files (checkpoint offsets) and the final table must equal the full
    batch aggregate (keyed merge idempotency)."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from burla_spark.functions.numeric import dec
    from burla_spark.sources.tables import load_table
    from burla_spark.streaming.events import run_upsert_totals

    src = str(tmp_path / "stream_src")
    load_table(spark, sf_dir, "events").repartition(4).write.parquet(src)
    parts = sorted(f for f in os.listdir(src) if f.endswith(".parquet"))
    assert len(parts) == 4
    held = str(tmp_path / "held")
    os.makedirs(held)
    for f in parts[2:]:
        shutil.move(os.path.join(src, f), os.path.join(held, f))

    target = str(tmp_path / "target")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(target)
    partial = run_upsert_totals(spark, src, target, checkpoint_dir=ckpt)
    partial_counts = {r.user_id: r.n_events for r in partial.collect()}
    assert partial_counts
    # the interesting failure mode is double-counting on resume: if the
    # restart re-read the already-committed files on top of checkpoint
    # state, per-user counts would exceed the batch truth below.
    assert sum(partial_counts.values()) < load_table(spark, sf_dir, "events").count()

    for f in parts[2:]:
        shutil.move(os.path.join(held, f), os.path.join(src, f))
    final = run_upsert_totals(spark, src, target, checkpoint_dir=ckpt)

    expected = {
        (r.user_id, r.n_events, r.total_value)
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(dec("value")).cast("double").alias("total_value"),
        )
        .collect()
    }
    got = {(r.user_id, r.n_events, r.total_value) for r in final.collect()}
    assert got == expected


def test_rocksdb_state_store_provider_matches_default(spark, sf_dir):
    """The production state backend: RocksDB state store (bundled with
    Spark 4) instead of the default HDFS-backed in-memory maps — at
    scale, state spills to local disk instead of capping executor
    heap. Same stateful query, same results, different provider."""
    from burla_spark.streaming.events import stream_stateful_user_stats

    baseline = {
        (r.user_id, r.n_events, r.total_value)
        for r in stream_stateful_user_stats(spark, sf_dir).collect()
    }
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        got = {
            (r.user_id, r.n_events, r.total_value)
            for r in stream_stateful_user_stats(spark, sf_dir).collect()
        }
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    assert got == baseline and len(got) > 0


# ---------------------------------------------------------------------------
# O(1)-state timer sessionization: the state invariants, tested on the
# extracted pure functions (no Spark needed)
# ---------------------------------------------------------------------------
def test_merge_pending_sessions_bounded_state():
    """Pending-session state stays bounded (by watermark-lag/gap + 1,
    here <= 2) no matter how many events flow through a key — the
    round-5 rewrite's contract: state is O(1) per key, not O(events)."""
    from burla_spark.streaming.events import _merge_pending_sessions

    gap = 30 * 60 * 1_000_000
    lag = 10 * 60 * 1_000_000  # watermark delay
    pending, emitted = [], []
    t = 0
    for i in range(5000):
        # bursts of activity separated by > gap every 40 events
        t += gap + 1 if i % 40 == 39 else 60_000_000
        pending = _merge_pending_sessions(pending, [(t, 100)], gap)
        wm = t - lag
        emitted += [p for p in pending if p[1] + gap < wm]
        pending = [p for p in pending if p[1] + gap >= wm]
        assert len(pending) <= 2, f"state grew to {len(pending)} sessions"
    total = sum(p[2] for p in pending) + sum(e[2] for e in emitted)
    assert total == 5000  # no event lost or double-counted


def test_merge_pending_sessions_late_bridge():
    """A late in-gap arrival that lands BETWEEN two pending sessions
    must collapse them into one (the explicit late-arrival case)."""
    from burla_spark.streaming.events import _merge_pending_sessions

    gap = 100
    a = _merge_pending_sessions([], [(0, 1), (50, 2)], gap)
    b = _merge_pending_sessions(a, [(230, 4)], gap)
    assert len(b) == 2  # two sessions: [0,50] and [230] (180 > gap)
    bridged = _merge_pending_sessions(b, [(150, 8)], gap)  # late, bridges
    assert bridged == [(0, 230, 4, 15)]


def test_decimal4_rounding_matches_oracle_semantics():
    """Half-away-from-zero at both the 4-dp cast and the 2-dp round —
    the decimal path DuckDB's DECIMAL(18,4) oracle takes (banker's
    rounding on binary floats was the latent flake ADVICE flagged)."""
    from burla_spark.streaming.events import _round_decimal4_to_2dp, _scale_decimal4

    assert _scale_decimal4(0.00005) == 1  # half away, not half even
    assert _scale_decimal4(-0.00005) == -1
    assert _scale_decimal4(None) == 0 and _scale_decimal4(float("nan")) == 0
    assert _round_decimal4_to_2dp(1250) == 0.13  # 0.1250 -> 0.13
    assert _round_decimal4_to_2dp(-1250) == -0.13
    assert _round_decimal4_to_2dp(26750) == 2.68
    # sum of many 0.01s is exact in scaled ints (would drift in binary)
    assert _round_decimal4_to_2dp(sum([100] * 3)) == 0.03
