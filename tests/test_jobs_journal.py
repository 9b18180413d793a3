"""Detached-job journal (reference parity: a detached job stays
observable after the submitting client disconnects —
main_service job_watcher.py:259,294-301). A completed detach's results
must be listable and fetchable from a DIFFERENT process with its own
SparkSession; the in-flight-only divergence is documented in jobs.py."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import textwrap

import pytest

from burla_spark import jobs
from burla_spark.rpm import remote_parallel_map


@pytest.fixture()
def journal_dir(spark, tmp_path):
    d = str(tmp_path / "jobs")
    spark.conf.set("spark.burla.jobJournalDir", d)
    yield d
    spark.conf.unset("spark.burla.jobJournalDir")


def test_detach_journals_and_fetches_in_session(spark, journal_dir):
    job = remote_parallel_map(lambda x: x * 10, range(20), spark=spark, detach=True)
    assert sorted(job.result(timeout=120)) == [x * 10 for x in range(20)]
    listed = jobs.list_jobs(spark)
    assert [d["job_id"] for d in listed] == [job.job_id]
    assert listed[0]["status"] == "done"
    assert listed[0]["n_results"] == 20
    fetched = jobs.fetch_results(spark, job.job_id)
    assert sorted(fetched) == [x * 10 for x in range(20)]


def test_journaled_error_rows_rehydrate_on_fetch(spark, journal_dir):
    def boom(x):
        if x == 3:
            raise ValueError("input three is bad")
        return x

    job = remote_parallel_map(boom, range(5), spark=spark, detach=True)
    with pytest.raises(ValueError):
        job.result(timeout=120)
    # the journal still completed (error rows journal too) and a later
    # fetch re-raises with input attribution, like the live call.
    assert jobs.list_jobs(spark)[0]["status"] == "done"
    with pytest.raises(ValueError) as excinfo:
        jobs.fetch_results(spark, job.job_id)
    assert excinfo.value.burla_input_index == 3


def test_fetch_unknown_job_raises_keyerror(spark, journal_dir):
    with pytest.raises(KeyError):
        jobs.fetch_results(spark, "burla-job-nope")


def test_running_manifest_refuses_fetch(spark, journal_dir):
    jobs.journal_start(spark, "burla-job-running", n_inputs=4)
    with pytest.raises(RuntimeError, match="still running"):
        jobs.fetch_results(spark, "burla-job-running")


def test_cross_process_detach_fetch(spark, journal_dir):
    """The contract the journal exists for: a job submitted and
    completed in ANOTHER python process (its own SparkSession, now
    exited) is listed and its results fetched here."""
    child = textwrap.dedent(
        f"""
        import sys
        sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
        from burla_spark.session import get_spark
        from burla_spark.rpm import remote_parallel_map
        spark = get_spark(app_name="journal_child", shuffle_partitions=4)
        spark.conf.set("spark.burla.jobJournalDir", {journal_dir!r})
        job = remote_parallel_map(lambda x: x + 100, range(8), spark=spark, detach=True)
        job.result(timeout=120)
        print("JOB_ID=" + job.job_id)
        spark.stop()
        """
    )
    proc = subprocess.run(
        [sys.executable, "-c", child], capture_output=True, text=True, timeout=300
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    job_id = [
        line.split("=", 1)[1]
        for line in proc.stdout.splitlines()
        if line.startswith("JOB_ID=")
    ][0]
    # submitter process is gone; this session reads the journal.
    assert any(d["job_id"] == job_id and d["status"] == "done" for d in jobs.list_jobs(spark))
    assert sorted(jobs.fetch_results(spark, job_id)) == [x + 100 for x in range(8)]
    with open(os.path.join(journal_dir, job_id, "manifest.json")) as fh:
        assert json.load(fh)["n_results"] == 8


def test_cross_process_observes_running_then_fetches(spark, journal_dir):
    """Round-5 narrowing of the in-flight divergence (reference
    job_watcher.py:259,294-301): the manifest is journaled at SUBMIT
    with state running + a live heartbeat, so a second process can
    observe an in-flight detached job — and fetch its results once the
    submitter finishes."""
    import time

    child = textwrap.dedent(
        f"""
        import sys, time
        sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
        from burla_spark.session import get_spark
        from burla_spark.rpm import remote_parallel_map
        spark = get_spark(app_name="journal_running_child", shuffle_partitions=4)
        spark.conf.set("spark.burla.jobJournalDir", {journal_dir!r})
        def slow(x):
            time.sleep(6)
            return x * 7
        job = remote_parallel_map(slow, range(4), spark=spark, detach=True)
        print("JOB_ID=" + job.job_id, flush=True)
        job.result(timeout=180)
        spark.stop()
        """
    )
    proc = subprocess.Popen(
        [sys.executable, "-c", child], stdout=subprocess.PIPE, text=True
    )
    try:
        job_id = None
        for line in proc.stdout:
            if line.startswith("JOB_ID="):
                job_id = line.strip().split("=", 1)[1]
                break
        assert job_id, "child never printed its job id"
        # observe RUNNING from THIS process while the child still works
        deadline = time.time() + 60
        seen_running = False
        while time.time() < deadline and proc.poll() is None:
            doc = next(
                (d for d in jobs.list_jobs(spark) if d["job_id"] == job_id), None
            )
            if doc and doc["status"] == "running":
                seen_running = True
                assert doc["heartbeat_at"] >= doc["started_at"]
                # a live job must refuse fetch with a live-heartbeat message
                with pytest.raises(RuntimeError, match="still running"):
                    jobs.fetch_results(spark, job_id)
                break
            time.sleep(0.2)
        assert seen_running, "never observed the in-flight running manifest"
        assert proc.wait(timeout=300) == 0
    finally:
        if proc.poll() is None:
            proc.kill()
    assert sorted(jobs.fetch_results(spark, job_id)) == [x * 7 for x in range(4)]


def test_stale_heartbeat_reports_dead_driver(spark, journal_dir):
    """A running manifest whose heartbeat stopped (driver died mid-job)
    must say so instead of claiming the job is still running."""
    jobs.journal_start(spark, "burla-job-orphan", n_inputs=4)
    path = os.path.join(journal_dir, "burla-job-orphan", "manifest.json")
    with open(path) as fh:
        doc = json.load(fh)
    doc["heartbeat_at"] = doc["started_at"] = doc["heartbeat_at"] - 3600
    with open(path, "w") as fh:
        json.dump(doc, fh)
    with pytest.raises(RuntimeError, match="driver likely died"):
        jobs.fetch_results(spark, "burla-job-orphan")


def test_cross_process_cancel_inflight_job(spark, journal_dir):
    """Reference A23 dashboard cancel, cross-process: another process
    flags a running detached job via the journal; the submitting
    driver's heartbeat thread interrupts it within one interval, the
    submitter's result() raises JobCanceled, the manifest flips to
    canceled, and a later fetch raises JobCanceled too."""
    import time

    child = textwrap.dedent(
        f"""
        import sys, time
        sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
        from burla_spark.session import get_spark
        from burla_spark.rpm import remote_parallel_map
        from burla_spark.jobs import JobCanceled
        spark = get_spark(app_name="journal_cancel_child", shuffle_partitions=4)
        spark.conf.set("spark.burla.jobJournalDir", {journal_dir!r})
        def slow(x):
            time.sleep(30)
            return x
        job = remote_parallel_map(slow, range(8), spark=spark, detach=True)
        print("JOB_ID=" + job.job_id, flush=True)
        try:
            job.result(timeout=180)
            print("RESULT_RETURNED", flush=True)
        except JobCanceled:
            print("CANCELED_OK", flush=True)
        spark.stop()
        """
    )
    proc = subprocess.Popen(
        [sys.executable, "-c", child], stdout=subprocess.PIPE, text=True
    )
    try:
        job_id = None
        for line in proc.stdout:
            if line.startswith("JOB_ID="):
                job_id = line.strip().split("=", 1)[1]
                break
        assert job_id
        # wait until the manifest exists, then cancel from THIS process
        deadline = time.time() + 60
        while time.time() < deadline:
            if any(d["job_id"] == job_id for d in jobs.list_jobs(spark)):
                break
            time.sleep(0.2)
        jobs.request_cancel(spark, job_id)
        rest = proc.stdout.read()
        assert proc.wait(timeout=180) == 0
        assert "CANCELED_OK" in rest, rest
    finally:
        if proc.poll() is None:
            proc.kill()
    doc = next(d for d in jobs.list_jobs(spark) if d["job_id"] == job_id)
    assert doc["status"] == "canceled"
    with pytest.raises(jobs.JobCanceled):
        jobs.fetch_results(spark, job_id)


def test_request_cancel_unknown_job_raises(spark, journal_dir):
    with pytest.raises(KeyError):
        jobs.request_cancel(spark, "burla-job-nope")


def test_redrive_orphaned_job_after_driver_death(spark, journal_dir):
    """The deepest A22 narrowing: the submitting driver DIES mid-job
    (killed, not exited cleanly), the manifest is stuck at running
    with a stale heartbeat, and a second process re-drives the
    journaled function+inputs under the SAME job id — results land in
    the journal as if the original driver had finished."""
    import time

    child = textwrap.dedent(
        f"""
        import sys, time
        sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
        from burla_spark.session import get_spark
        from burla_spark.rpm import remote_parallel_map
        spark = get_spark(app_name="journal_orphan_child", shuffle_partitions=4)
        spark.conf.set("spark.burla.jobJournalDir", {journal_dir!r})
        def slow(x):
            time.sleep(15)
            return x * 5
        job = remote_parallel_map(slow, range(6), spark=spark, detach=True)
        print("JOB_ID=" + job.job_id, flush=True)
        job.result(timeout=300)
        """
    )
    proc = subprocess.Popen(
        [sys.executable, "-c", child], stdout=subprocess.PIPE, text=True
    )
    job_id = None
    for line in proc.stdout:
        if line.startswith("JOB_ID="):
            job_id = line.strip().split("=", 1)[1]
            break
    assert job_id
    proc.kill()
    proc.wait(timeout=30)

    # live-heartbeat guard: immediately after the kill the heartbeat is
    # still fresh, so redrive must refuse without force
    with pytest.raises(RuntimeError, match="live heartbeat"):
        jobs.redrive(spark, job_id)

    spark.conf.set("spark.burla.heartbeatStaleS", "3")
    try:
        time.sleep(4)  # let the dead driver's last heartbeat go stale
        doc = next(d for d in jobs.list_jobs(spark) if d["job_id"] == job_id)
        assert doc["status"] == "running" and doc["redrivable"] is True

        # redrive loads the JOURNALED function (15s sleeps included) and
        # re-runs it to completion under the original job id
        bg = jobs.redrive(spark, job_id)
        assert bg.job_id == job_id
        got = bg.result(timeout=300)
        assert sorted(got) == [x * 5 for x in range(6)]
    finally:
        spark.conf.unset("spark.burla.heartbeatStaleS")
    assert next(
        d for d in jobs.list_jobs(spark) if d["job_id"] == job_id
    )["status"] == "done"
    assert sorted(jobs.fetch_results(spark, job_id)) == [x * 5 for x in range(6)]


def test_redrive_refuses_completed_job(spark, journal_dir):
    job = remote_parallel_map(lambda x: x, range(3), spark=spark, detach=True)
    job.result(timeout=120)
    with pytest.raises(RuntimeError, match="not an orphaned running job"):
        jobs.redrive(spark, job.job_id)
