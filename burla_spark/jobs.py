"""Background jobs + cancellation (reference A22 detach / A23 cancel).

The reference detaches jobs so they outlive the client process
(_remote_parallel_map.py:509-511) and cancels them from the dashboard
(endpoints/jobs.py:93-108). Spark jobs live inside the driver, so the
equivalent surface is: run the action on a background thread under a
job TAG, hand back a future-like handle, and cancel by interrupting
the tag (SparkContext-wide, thread-safe). Divergence from the
reference — a Spark job cannot outlive its driver process — is
documented in SURVEY.md §7.3.5; cross-process survival is what the
checkpointed streaming queries in burla_spark/streaming are for.
"""

from __future__ import annotations

import threading
import uuid
from collections.abc import Callable
from typing import Any

from pyspark.sql import SparkSession


class JobCanceled(Exception):
    """Raised when .result() is called on a canceled job (mirrors the
    reference's JobCanceled, head_client.py:62-75)."""


class BackgroundJob:
    """Handle for a detached action: poll .done, await .result(),
    or .cancel() — exactly-one-of result/error/canceled."""

    _UNSET = object()  # distinguishes "no result yet" from a None result

    def __init__(self, spark: SparkSession, tag: str, thread: threading.Thread):
        self._spark = spark
        self._tag = tag
        self._thread = thread
        self._result: Any = BackgroundJob._UNSET
        self._error: BaseException | None = None
        self._canceled = False
        self._finished = threading.Event()

    @property
    def done(self) -> bool:
        return self._finished.is_set()

    def cancel(self) -> None:
        # cancel-after-complete is a no-op: a finished job's result
        # stands (the reference's cancel endpoint likewise only flips
        # RUNNING jobs). Without this, a late cancel() made result()
        # raise JobCanceled for work that had already succeeded.
        if self._finished.is_set():
            return
        self._canceled = True
        # SparkContext-level job tags, NOT SparkSession.interruptTag:
        # session tags only attach to SQL executions, so a raw RDD
        # action (rdd.count) runs untagged and interruptTag is a no-op
        # on it (verified under Spark 4.1). cancelJobsWithTag cancels
        # at the DAGScheduler, which covers every job type.
        self._spark.sparkContext.cancelJobsWithTag(self._tag)

    def result(self, timeout: float | None = None) -> Any:
        if not self._finished.wait(timeout):
            raise TimeoutError(f"job {self._tag} still running")
        # success first: a cancel that lost the race with completion
        # (flag set but the action finished cleanly) reports the result.
        if self._result is not BackgroundJob._UNSET:
            return self._result
        if self._canceled:
            raise JobCanceled(f"job {self._tag} was canceled")
        if self._error is not None:
            raise self._error
        return None  # pragma: no cover — action returned without setting state


class sigint_policy:
    """Ctrl-C handling for long-running jobs (reference behavior:
    SIGINT converts the job into a detach or a cancel instead of
    tearing down mid-flight — _helpers.py:59-109).

    >>> job = submit(spark, action)
    >>> with sigint_policy(job, on_interrupt="cancel"):
    ...     result = job.result()
    ``on_interrupt='detach'`` leaves the job running (handle stays
    valid); ``'cancel'`` interrupts the job's tag. Either way the
    process no longer dies mid-task on the first Ctrl-C (a second
    SIGINT restores default handling)."""

    def __init__(self, job: BackgroundJob, on_interrupt: str = "cancel"):
        if on_interrupt not in ("cancel", "detach"):
            raise ValueError("on_interrupt must be 'cancel' or 'detach'")
        self._job = job
        self._mode = on_interrupt
        self._prev = None
        self.interrupted = False

    def _handler(self, signum, frame):
        import signal

        self.interrupted = True
        if self._mode == "cancel":
            self._job.cancel()
        # detach: leave the job running; either way restore default so
        # a second Ctrl-C behaves normally.
        signal.signal(signal.SIGINT, self._prev)

    def __enter__(self) -> "sigint_policy":
        import signal

        self._prev = signal.getsignal(signal.SIGINT)
        signal.signal(signal.SIGINT, self._handler)
        return self

    def __exit__(self, *exc) -> None:
        import signal

        if signal.getsignal(signal.SIGINT) is self._handler:
            signal.signal(signal.SIGINT, self._prev)


def submit(spark: SparkSession, action: Callable[[], Any], tag: str | None = None) -> BackgroundJob:
    """Run a Spark action in the background under a cancelable tag.

    >>> job = submit(spark, lambda: df.collect())
    >>> job.cancel()            # or: job.result(timeout=60)
    """
    tag = tag or f"burla-job-{uuid.uuid4().hex[:12]}"
    job: BackgroundJob

    def run() -> None:
        try:
            # context-level tag (thread-local): every job this thread
            # submits — SQL or raw RDD — carries it. See cancel().
            spark.sparkContext.addJobTag(tag)
            job._result = action()
        except BaseException as exc:  # noqa: BLE001 — report, don't swallow
            job._error = exc
        finally:
            try:
                spark.sparkContext.removeJobTag(tag)
            except Exception:
                pass
            job._finished.set()

    thread = threading.Thread(target=run, daemon=True)
    job = BackgroundJob(spark, tag, thread)
    thread.start()
    return job
