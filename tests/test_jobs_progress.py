"""Background jobs (A22/A23 parity) and progress reporting (A31)."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from burla_spark.jobs import BackgroundJob, JobCanceled, submit
from burla_spark.progress import ProgressReporter, progress_snapshot


def _slow_df(spark, n=2_000_000, parts=8, sleep=0.5):
    # sleep-per-partition keeps the job running long enough to observe
    def slow(it):
        time.sleep(sleep)
        yield from it

    return spark.range(n).repartition(parts).rdd.mapPartitions(slow)


def test_background_job_result(spark):
    job = submit(spark, lambda: spark.range(1000).agg(F.sum("id")).collect())
    out = job.result(timeout=60)
    assert out[0][0] == 499500
    assert job.done


def test_background_job_error_propagates(spark):
    def boom():
        raise RuntimeError("nope")

    job = submit(spark, boom)
    with pytest.raises(RuntimeError, match="nope"):
        job.result(timeout=10)


def test_background_job_cancel(spark):
    # 10s/partition: the job is provably still RUNNING at cancel time
    # (cancel-after-complete is a no-op by contract, tested separately)
    rdd = _slow_df(spark, sleep=10.0)
    job = submit(spark, rdd.count)
    time.sleep(1.0)  # let tasks start
    job.cancel()
    with pytest.raises(JobCanceled):
        job.result(timeout=30)


def test_concurrent_jobs(spark):
    jobs = [
        submit(spark, lambda k=k: spark.range(10000 * (k + 1)).count())
        for k in range(4)
    ]
    results = [j.result(timeout=60) for j in jobs]
    assert results == [10000, 20000, 30000, 40000]


def test_progress_reporter_observes_tasks(spark):
    lines: list[str] = []
    with ProgressReporter(spark, interval_sec=0.2, sink=lines.append) as rep:
        _slow_df(spark, parts=4).count()
    assert any(s["active_jobs"] > 0 for s in rep.samples)
    assert any(s["tasks_total"] > 0 for s in rep.samples)
    assert lines  # at least one progress line rendered


def test_progress_snapshot_idle(spark):
    snap = progress_snapshot(spark)
    assert snap["active_jobs"] == 0


def test_sigint_policy_cancel(spark):
    import os
    import signal

    from burla_spark.jobs import sigint_policy

    rdd = _slow_df(spark, sleep=10.0)
    job = submit(spark, rdd.count)
    time.sleep(1.0)
    with sigint_policy(job, on_interrupt="cancel") as policy:
        os.kill(os.getpid(), signal.SIGINT)
        time.sleep(0.3)  # handler runs in main thread between bytecodes
        assert policy.interrupted
    with pytest.raises(JobCanceled):
        job.result(timeout=30)


def test_sigint_policy_detach(spark):
    import os
    import signal

    from burla_spark.jobs import sigint_policy

    job = submit(spark, lambda: spark.range(100000).count())
    with sigint_policy(job, on_interrupt="detach") as policy:
        os.kill(os.getpid(), signal.SIGINT)
        time.sleep(0.3)
        assert policy.interrupted
    # detached: job keeps running to completion
    assert job.result(timeout=60) == 100000


def test_cancel_after_complete_is_noop(spark):
    """A cancel() that arrives after the job finished must not poison
    the already-computed result (cancel-after-complete race)."""
    from burla_spark.jobs import submit

    job = submit(spark, lambda: 42)
    assert job.result(timeout=60) == 42
    job.cancel()
    assert job.result() == 42
