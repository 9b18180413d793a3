"""Progress reporting (reference A31: `X/N done, R running, ...`
spinner — _reporting.py:164-188) built on Spark's StatusTracker.

The reference pushes progress from nodes to the client 1×/s; Spark's
driver already has authoritative task counts, so this is a thin poll
loop — no custom wire protocol.
"""

from __future__ import annotations

import threading
import time
from collections.abc import Callable

from pyspark.sql import SparkSession


def progress_snapshot(spark: SparkSession) -> dict:
    """One sample of cluster-wide task progress across active stages."""
    tracker = spark.sparkContext.statusTracker()
    total = done = running = 0
    for sid in tracker.getActiveStageIds():
        info = tracker.getStageInfo(sid)
        if info is None:
            continue
        total += info.numTasks
        done += info.numCompletedTasks
        running += info.numActiveTasks
    return {
        "active_jobs": len(tracker.getActiveJobsIds()),
        "tasks_total": total,
        "tasks_done": done,
        "tasks_running": running,
    }


class ProgressReporter:
    """Background progress line, reference-spinner style.

    >>> with ProgressReporter(spark, sink=print):
    ...     df.collect()
    emits lines like ``42/128 done, 32 running, 1 job``.
    """

    def __init__(
        self,
        spark: SparkSession,
        interval_sec: float = 1.0,
        sink: Callable[[str], None] | None = None,
    ):
        self._spark = spark
        self._interval = interval_sec
        self._sink = sink or (lambda line: print(line, flush=True))
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self.samples: list[dict] = []

    def _loop(self) -> None:
        while not self._stop.is_set():
            snap = progress_snapshot(self._spark)
            self.samples.append(snap)
            if snap["active_jobs"]:
                self._sink(
                    f"{snap['tasks_done']}/{snap['tasks_total']} done, "
                    f"{snap['tasks_running']} running, "
                    f"{snap['active_jobs']} job(s)"
                )
            self._stop.wait(self._interval)

    def __enter__(self) -> "ProgressReporter":
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=5)
