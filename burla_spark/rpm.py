"""remote_parallel_map — the reference's single public operator
(reference: client/src/burla/_remote_parallel_map.py:457-756), rebuilt
Spark-first.

Semantics preserved (reference cites in parens):
* unordered results, exactly one result or one attributed error per
  input (_remote_parallel_map.py:519-521; §2 exactly-once contract)
* tuples unpack to *args, lists do not (_remote_parallel_map.py:541)
* empty input short-circuits (_remote_parallel_map.py:542-543)
* function / input size guards (FunctionTooBig / InputTooBig,
  _remote_parallel_map.py:222-224, _node.py:25)
* generator mode streams results as partitions finish
  (_remote_parallel_map.py:703-715; partition-ordered — divergence
  documented in SURVEY.md §7.3.2)
* errors re-raise on the driver with the original type, message, remote
  traceback text and ``burla_input_index`` (_node.py:638-663)
* per-input stdout is captured and surfaced (worker_client.py:154-338;
  arrives with the result, not live — SURVEY.md §7.3.1)

Spark replaces the reference's entire transport/scheduling machinery
(scatter, queues, work stealing, ack/replay, heartbeats — §2
A5-A10/A15/A21) with the DataFrame runtime: inputs become a binary
DataFrame, the function runs under ``mapInPandas`` (Arrow-batched), and
Spark's deterministic task retry provides the exactly-once contract.
At scale the input DataFrame partitions over the cluster exactly like
any other table — a million inputs is a small DataFrame.
"""

from __future__ import annotations

import contextlib
import io
import os
import pickle
import sys
import threading
import traceback
from collections.abc import Callable, Iterable, Iterator
from contextlib import redirect_stdout
from typing import Any

from pyspark.sql import SparkSession

MAX_FUNCTION_SIZE_BYTES = 100_000_000  # 0.1 GB, reference _remote_parallel_map.py:222
MAX_INPUT_SIZE_BYTES = 200_000_000  # 200 MB, reference _node.py:25

RESULT_SCHEMA = (
    "idx long, is_error boolean, payload binary, stdout string, "
    "error_type string, error_msg string, error_tb string, error_pkl binary"
)

# Types whose plain-pickle form is environment-independent (no module
# references that could be missing on the other side of the boundary,
# no by-value class shipping needed). For these, C-speed pickle.dumps
# replaces cloudpickle.dumps — ~12x cheaper per object (measured 0.25 s
# vs 2.97 s per million small ints), and the driver-side input loop is
# SERIAL, so at a million inputs this is seconds of dispatch latency.
_FAST_PICKLE_TYPES = frozenset(
    (int, float, str, bytes, bool, type(None))
)


def _fast_dumps(cp, obj):
    """cloudpickle-compatible dumps with a plain-pickle fast path for
    scalars and flat tuples/lists of scalars. Anything else (closures,
    locally-defined classes, numpy scalars, nested containers) takes
    the cloudpickle path exactly as before — same bytes semantics on
    load, only the serializer speed differs."""
    t = type(obj)
    if t in _FAST_PICKLE_TYPES:
        return pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL)
    if (t is tuple or t is list) and all(
        type(e) in _FAST_PICKLE_TYPES for e in obj
    ):
        return pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL)
    return cp.dumps(obj)


# Rows per wire frame on the completion-order result channel (see
# _stream_results.push_partition's flush policy). Measured at 1M
# results on local[32]: 256-row frames + a 4-deep batch queue stalled
# the single selector thread on queue puts (4.8 s vs 2.2 s at 100k);
# 2048-row frames with a >=2-deep queue hold the per-row driver cost
# to the consumer's own unpickle loop.
_STREAM_BATCH_ROWS = 2048


class _SkipAck(Exception):
    """Internal: abort a partial-ack write (job already terminal)."""


class FunctionTooBig(Exception):
    pass


class InputTooBig(Exception):
    pass


class RpmError(Exception):
    """Re-raised UDF error with input attribution.

    Carries ``burla_input_index`` like the reference (_node.py:652) and
    chains the remote traceback text."""

    def __init__(self, error_type: str, message: str, remote_traceback: str, index: int):
        super().__init__(
            f"{error_type}: {message} (burla_input_index={index})\n"
            f"--- remote traceback ---\n{remote_traceback}"
        )
        self.error_type = error_type
        self.original_message = message
        self.remote_traceback = remote_traceback
        self.burla_input_index = index


def _rehydrate_error(
    error_pkl, error_type: str, error_msg: str, error_tb: str, index: int
) -> RpmError:
    """Reconstruct the remote error with ORIGINAL-type fidelity.

    The reference re-raises the user's actual exception object on the
    client (_node.py:646-663), so ``except ValueError`` works across
    the remote boundary. Spark wraps UDF errors in PythonException; we
    instead ship pickled (class, args, state) in the result row and
    re-raise a dynamic subclass of (original type, RpmError) — both
    ``except ValueError`` and ``except RpmError`` catch it, and the
    instance keeps the original args/state plus burla attribution.
    Falls back to plain RpmError when the object didn't pickle.
    """
    payload = None
    if error_pkl is not None:
        try:
            payload = pickle.loads(bytes(error_pkl))
        except Exception:
            payload = None
    if (
        payload is None
        or not isinstance(payload, tuple)
        or len(payload) != 3
        or not (isinstance(payload[0], type) and issubclass(payload[0], Exception))
        or issubclass(payload[0], RpmError)
    ):
        return RpmError(error_type, error_msg, error_tb, index)
    cls, args, state = payload
    try:
        dyn = type(cls.__name__, (cls, RpmError), {"__module__": cls.__module__})
        exc = dyn.__new__(dyn)
        exc.__dict__.update(state)
        exc.args = args
    except Exception:
        return RpmError(error_type, error_msg, error_tb, index)
    exc.error_type = error_type
    exc.original_message = error_msg
    exc.remote_traceback = error_tb
    exc.burla_input_index = index
    return exc


def _cloudpickle():
    # Spark vendors cloudpickle; fall back to the standalone package.
    try:
        from pyspark import cloudpickle  # type: ignore

        return cloudpickle
    except ImportError:  # pragma: no cover
        import cloudpickle  # type: ignore

        return cloudpickle


@contextlib.contextmanager
def _user_module_by_value(cp, function_: Callable):
    """Ship user-module functions by value, like the reference's
    environment sync does for custom modules
    (_remote_parallel_map.py:560-628: custom modules are cloudpickled
    by value; PyPI packages are assumed installed). Without this, a
    function defined in a non-installed module pickles by reference
    and executors raise ModuleNotFoundError.

    Context manager: the registration is global cloudpickle state, so
    it is unregistered on exit — leaving it would silently switch EVERY
    later pickle of that module (other jobs, Spark's own UDF plumbing)
    to by-value for the life of the process."""
    mod = sys.modules.get(getattr(function_, "__module__", ""), None)
    registered = False
    if mod is not None and mod.__name__ not in ("__main__", "builtins"):
        mod_file = getattr(mod, "__file__", None)
        if mod_file:
            import sysconfig

            installed_roots = {
                sysconfig.get_paths().get("stdlib", ""),
                sysconfig.get_paths().get("purelib", ""),
                sysconfig.get_paths().get("platlib", ""),
            }
            # installed packages are importable on executors → skip
            if not any(r and mod_file.startswith(r) for r in installed_roots):
                try:
                    cp.register_pickle_by_value(mod)
                    registered = True
                except Exception:  # pragma: no cover — best-effort parity
                    pass
    try:
        yield
    finally:
        if registered:
            try:
                cp.unregister_pickle_by_value(mod)
            except Exception:  # pragma: no cover
                pass


def _make_udf(
    function_pkl: bytes,
    capture_stdout: bool,
    log_addr: tuple[str, int, bytes] | None = None,
    partial_dir: str | None = None,
    result_addr: tuple[str, int, bytes] | None = None,
):
    """Build the mapInPandas worker: unpickle once per task, run each
    input, emit (idx, is_error, payload, stdout, error fields).

    With ``log_addr``, each input's stdout is pushed LIVE to the
    driver's log listener the moment the input finishes (reference
    parity: worker_client.py:154-338 streams logs while the job runs);
    a successful push clears the row's stdout so delivery is
    exactly-once, and any push failure falls back to with-result
    delivery.

    With ``partial_dir`` (detached jobs), each batch's completed rows
    are ALSO appended to the job's journal as a uniquely-named pickle
    before being yielded — the ack half of the reference's ack/replay
    contract (_node.py:463-524): if the driver dies mid-job, a redrive
    resumes from the acked set instead of recomputing it. Task retries
    produce duplicate files; the reader dedupes by index, first wins.
    Best-effort: an unwritable dir degrades to restart-style redrive,
    never a failed task. On a real cluster the journal dir must be
    shared storage (documented in jobs.py)."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import os as _os

        import pandas as pd

        # mark this python worker so a NESTED remote_parallel_map call
        # (user function calling rpm again) degrades to the
        # executor-local map instead of failing on a missing session.
        # Scoped try/finally: python workers are REUSED across jobs
        # (spark.python.worker.reuse), so a flag left set process-wide
        # would make a LATER non-rpm code path in the same worker
        # silently degrade its own remote_parallel_map call to a
        # worker-local map instead of raising the guidance error.
        _prior_flag = _os.environ.get("BURLA_SPARK_IN_WORKER")
        _os.environ["BURLA_SPARK_IN_WORKER"] = "1"
        try:

            # results serialize with cloudpickle so locally-defined classes
            # round-trip (by-value), mirroring the input path.
            try:
                from pyspark import cloudpickle as result_pickler  # type: ignore
            except ImportError:  # pragma: no cover
                import cloudpickle as result_pickler  # type: ignore

            log_client = None
            if log_addr is not None:
                try:
                    from burla_spark.logs import LogStreamClient

                    log_client = LogStreamClient(*log_addr)
                except Exception:  # noqa: BLE001 — log channel is best-effort
                    log_client = None

            # generator mode: results are pushed to the driver's stream
            # listener STRAIGHT FROM THIS UDF — the old shape round-
            # tripped the result frame through the JVM and re-pickled
            # every row into a SECOND python worker (foreachPartition)
            # just to do the same socket send (guide §4: each extra
            # JVM<->Python hop re-serializes every payload byte).
            # Unlike the log channel this one is NOT best-effort: a
            # failed construction or send fails the task so Spark
            # retries it (the driver dedups replayed indices).
            res_client = None
            if result_addr is not None:
                from burla_spark.logs import (
                    MessageStreamClient,
                    encode_result_batch,
                )

                res_client = MessageStreamClient(
                    *result_addr, max_msg=MAX_INPUT_SIZE_BYTES + 10_000_000
                )

            fn = pickle.loads(function_pkl)
            for batch in batches:
                out: dict[str, list] = {
                    "idx": [], "is_error": [], "payload": [], "stdout": [],
                    "error_type": [], "error_msg": [], "error_tb": [],
                    "error_pkl": [],
                }
                for idx, blob in zip(batch["idx"], batch["payload"]):
                    arg = pickle.loads(bytes(blob))
                    buf = io.StringIO()
                    try:
                        if capture_stdout:
                            with redirect_stdout(buf):
                                result = fn(*arg) if isinstance(arg, tuple) else fn(arg)
                        else:
                            result = fn(*arg) if isinstance(arg, tuple) else fn(arg)
                        text = buf.getvalue()
                        if log_client is not None and log_client.send(int(idx), text):
                            text = ""  # delivered live — don't re-deliver with the row
                        out["idx"].append(int(idx))
                        out["is_error"].append(False)
                        out["payload"].append(_fast_dumps(result_pickler, result))
                        out["stdout"].append(text)
                        out["error_type"].append(None)
                        out["error_msg"].append(None)
                        out["error_tb"].append(None)
                        out["error_pkl"].append(None)
                    except Exception as exc:  # noqa: BLE001 — user code may raise anything
                        text = buf.getvalue()
                        if log_client is not None and log_client.send(int(idx), text):
                            text = ""
                        out["idx"].append(int(idx))
                        out["is_error"].append(True)
                        out["payload"].append(None)
                        out["stdout"].append(text)
                        out["error_type"].append(type(exc).__name__)
                        out["error_msg"].append(str(exc))
                        out["error_tb"].append(traceback.format_exc())
                        # ship (class, args, state) — NOT the exception
                        # object: pickling an exception replays
                        # ``cls(*args)`` on load, which explodes for custom
                        # __init__ signatures; __new__ + state restore works
                        # for any class. cloudpickle serializes
                        # locally-defined exception classes by value. 1 MB
                        # cap mirrors the reference's result/log response
                        # cap (job_endpoints.py:28-30) — bigger errors fall
                        # back to text-only.
                        try:
                            blob = result_pickler.dumps(
                                (type(exc), exc.args, dict(vars(exc)))
                            )
                            if len(blob) > 1_000_000:
                                blob = None
                        except Exception:
                            blob = None
                        out["error_pkl"].append(blob)
                if partial_dir is not None and out["idx"]:
                    try:
                        import json as _json
                        import os as _os
                        import uuid as _uuid

                        # a task of a canceled/failed job may finish a batch
                        # AFTER the terminal cleanup removed partial/ — skip
                        # the ack once the manifest left 'running' so late
                        # writes don't recreate permanent journal litter.
                        still_running = True
                        manifest = _os.path.join(
                            _os.path.dirname(partial_dir), "manifest.json"
                        )
                        try:
                            with open(manifest) as _fh:
                                still_running = (
                                    _json.load(_fh).get("status") == "running"
                                )
                        except (OSError, ValueError):
                            pass  # unreadable/missing manifest: ack anyway
                        if not still_running:
                            raise _SkipAck()
                        _os.makedirs(partial_dir, exist_ok=True)
                        rows_pkl = pickle.dumps(
                            list(
                                zip(
                                    out["idx"], out["is_error"], out["payload"],
                                    out["stdout"], out["error_type"],
                                    out["error_msg"], out["error_tb"],
                                    out["error_pkl"],
                                )
                            )
                        )
                        path = _os.path.join(
                            partial_dir, f"part-{_uuid.uuid4().hex}.pkl"
                        )
                        with open(path + ".tmp", "wb") as fh:
                            fh.write(rows_pkl)
                        _os.replace(path + ".tmp", path)  # readers never see torn acks
                    except Exception:  # noqa: BLE001 — ack log is best-effort
                        pass
                if res_client is not None:
                    # push this batch's rows now (completion-order
                    # latency: a finished batch is on the wire before
                    # the next one computes), in wire frames bounded by
                    # _STREAM_BATCH_ROWS rows / ~1 MB of payload.
                    buf: list[tuple] = []
                    buf_bytes = 0
                    for rec in zip(
                        out["idx"], out["is_error"], out["payload"],
                        out["stdout"], out["error_type"], out["error_msg"],
                        out["error_tb"], out["error_pkl"],
                    ):
                        buf.append(rec)
                        buf_bytes += (len(rec[2]) if rec[2] else 0) + 64
                        if (
                            len(buf) >= _STREAM_BATCH_ROWS
                            or buf_bytes >= 1_000_000
                        ):
                            if not res_client.send_frame(
                                encode_result_batch(buf)
                            ):
                                raise RuntimeError(
                                    "result-stream push to driver failed; "
                                    "task will retry"
                                )
                            buf, buf_bytes = [], 0
                    if buf and not res_client.send_frame(
                        encode_result_batch(buf)
                    ):
                        raise RuntimeError(
                            "result-stream push to driver failed; "
                            "task will retry"
                        )
                    # rows delivered over the socket — emit no frame
                    # (the JVM side of this stage only drains empties).
                    continue
                yield pd.DataFrame(out)
        finally:
            # close the push sockets even on a mid-batch error: python
            # workers are REUSED across tasks, so an unclosed socket
            # would outlive this task.
            try:
                if res_client is not None:
                    res_client.close()
                if log_client is not None:
                    log_client.close()
            except Exception:  # noqa: BLE001
                pass
            if _prior_flag is None:
                _os.environ.pop("BURLA_SPARK_IN_WORKER", None)
            else:
                _os.environ["BURLA_SPARK_IN_WORKER"] = _prior_flag

    return run


def _nested_local_map(function_, inputs, generator=False, detach=False):
    """Executor-local nested RPM. The reference schedules a nested
    ``remote_parallel_map`` back onto the same cluster
    (node_service/__init__.py:54-55); Spark executors cannot submit
    jobs, so the inner level runs HERE with the same client-observable
    semantics — tuple unpacking, completion-ordered results, and
    input-index error attribution on the ORIGINAL exception (the outer
    worker's error path then ships it to the driver with full
    fidelity). Parallelism is bounded to this worker's threads instead
    of the cluster — the documented residual of SURVEY §7.3.4."""
    if detach:
        raise ValueError(
            "detach=True is not supported inside a nested remote_parallel_map"
        )
    items = list(inputs)
    if not items:
        return iter(()) if generator else []
    from concurrent.futures import ThreadPoolExecutor, as_completed

    def run_one(i, item):
        try:
            return function_(*item) if isinstance(item, tuple) else function_(item)
        except Exception as exc:
            try:
                exc.burla_input_index = i
            except Exception:  # noqa: BLE001 — attribution is best-effort
                pass
            raise

    pool = ThreadPoolExecutor(max_workers=min(len(items), 8))
    futures = [pool.submit(run_one, i, it) for i, it in enumerate(items)]
    if generator:

        def gen():
            try:
                for f in as_completed(futures):
                    yield f.result()
            finally:
                pool.shutdown(wait=False, cancel_futures=True)

        return gen()
    try:
        return [f.result() for f in as_completed(futures)]
    finally:
        # on failure, cancel still-pending siblings so the error
        # reaches the outer worker immediately instead of after every
        # slow input finishes; on success all futures are already done.
        pool.shutdown(wait=False, cancel_futures=True)


def gpu_resource_profile(func_gpu: int, func_cpu: int = 1):
    """Stage-level ResourceProfile for ``func_gpu`` — the Spark
    analogue of the reference routing GPU jobs to GPU machine types
    (providers/catalog.py:31-62,140-160). Task side pins func_gpu GPUs
    + func_cpu cores per input; executor side requests enough device
    slots with the standard nvidia discovery script. Building the
    profile needs no GPUs (it's metadata until applied), so this is
    unit-testable anywhere; applying it happens via
    ``rdd.withResources`` on a cluster that advertises
    spark.executor.resource.gpu.amount."""
    import math

    from pyspark.resource import (
        ExecutorResourceRequests,
        ResourceProfileBuilder,
        TaskResourceRequests,
    )

    treqs = (
        TaskResourceRequests().cpus(max(1, int(func_cpu))).resource("gpu", float(func_gpu))
    )
    ereqs = ExecutorResourceRequests().resource(
        "gpu",
        max(1, int(math.ceil(func_gpu))),
        discoveryScript="/opt/spark/scripts/getGpusResources.sh",
        vendor="nvidia.com",
    )
    return ResourceProfileBuilder().require(treqs).require(ereqs).build


def _cluster_has_gpus(spark: SparkSession) -> bool:
    """Does this cluster advertise GPU executor resources?"""
    try:
        amount = spark.conf.get("spark.executor.resource.gpu.amount", None)
        return amount is not None and float(amount) > 0
    except Exception:  # noqa: BLE001
        return False


def _parse_ram_gb(func_ram) -> float | None:
    """'dynamic' → 4 GB (the reference default); int → GB; strings
    accept '8', '8G', '8GB', '512M'. None/unparseable → None."""
    try:
        if isinstance(func_ram, str):
            s = func_ram.strip().upper()
            if s == "DYNAMIC":
                return 4.0
            if s.endswith("GB") or s.endswith("G"):
                return float(s.rstrip("GB"))
            if s.endswith("MB") or s.endswith("M"):
                return float(s.rstrip("MB")) / 1024
            return float(s)
        return float(func_ram)
    except Exception:  # noqa: BLE001 — sizing is best-effort
        return None


# (timestamp, per-host MemAvailable GiB) per Spark APPLICATION — a
# repack wave loop calls _live_ram_cap every wave; re-launching the
# probe job each time would add a full job round-trip of latency per
# wave for a signal that moves on seconds, not milliseconds. Keyed by
# applicationId, NOT id(spark): CPython id reuse after a session GC
# could serve a dead cluster's readings to a new session. Expired
# entries are pruned on access, bounding growth in session-churning
# processes.
_HOST_PROBE_CACHE: dict[str, tuple[float, dict[str, float]]] = {}
_HOST_PROBE_TTL_S = 15.0


def _probe_host_available_gb(spark: SparkSession) -> dict[str, float] | None:
    """Executor-side OS memory probe: MemAvailable (GiB) per host a
    short sampling job lands on, min-per-host. This sees what the JVM
    signal cannot — PYTHON WORKER memory, where func_ram-sized rpm
    tasks actually live, is off-JVM, so getExecutorMemoryStatus barely
    moves under exactly the pressure ``repack=True`` reacts to.

    Best-effort and advisory: the sampling tasks may land on a SUBSET
    of executor hosts (the caller extrapolates mean-per-host × host
    count rather than treating the sample as the whole cluster),
    /proc/meminfo is Linux-only, and any failure returns None (caller
    falls back to the JVM signal alone). Results are cached for
    ``_HOST_PROBE_TTL_S`` so a wave loop pays one probe job per TTL
    window, not per wave."""
    import time as _time

    now = _time.monotonic()
    for k in [k for k, (ts, _) in _HOST_PROBE_CACHE.items()
              if now - ts >= _HOST_PROBE_TTL_S]:
        _HOST_PROBE_CACHE.pop(k, None)
    try:
        key = spark.sparkContext.applicationId
    except Exception:  # noqa: BLE001 — stopped session: no probe
        return None
    cached = _HOST_PROBE_CACHE.get(key)
    if cached is not None:
        return cached[1] or None
    try:
        sc = spark.sparkContext
        n = max(2, sc.defaultParallelism)

        def probe(_):
            import socket

            avail = None
            try:
                with open("/proc/meminfo") as fh:
                    for line in fh:
                        if line.startswith("MemAvailable:"):
                            avail = int(line.split()[1]) / (1024.0**2)
                            break
            except (OSError, ValueError, IndexError):
                pass
            return (socket.gethostname(), avail)

        per_host: dict[str, float] = {}
        for host, avail in sc.parallelize(range(n), n).map(probe).collect():
            if avail is not None:
                per_host[host] = min(avail, per_host.get(host, float("inf")))
        _HOST_PROBE_CACHE[key] = (_time.monotonic(), per_host)
        return per_host or None
    except Exception:  # noqa: BLE001 — probe is advisory
        _HOST_PROBE_CACHE[key] = (_time.monotonic(), {})
        return None


def _live_ram_cap(spark: SparkSession, func_ram) -> int:
    """RAM cap from LIVE executor memory — the dynamic half of the
    reference's packing rule (worker_client.py:88-151 repacks as
    workers free RAM): how many func_ram-sized tasks fit in the
    cluster's currently-free memory. Two combined signals, the
    narrower wins:

    * JVM block-manager free storage (getExecutorMemoryStatus) — the
      agent-free signal; a heavily-cached/spilling cluster reports
      less free and the next wave narrows. LIMITATION: Python worker
      memory (where func_ram-sized rpm tasks actually live) is
      off-JVM, so this signal alone barely moves when Python workers
      exhaust host RAM.
    * an executor-side OS probe (_probe_host_available_gb) sampling
      /proc/meminfo MemAvailable per host — sees Python-worker
      pressure directly; advisory (None on failure).

    Falls back to the static rule when the JVM call is unavailable."""
    gb = _parse_ram_gb(func_ram)
    if gb is None or gb <= 0:
        return 1 << 30
    probed = _probe_host_available_gb(spark)  # TTL-cached per session

    def _host_cap(n_cluster_hosts: int | None) -> int | None:
        """Extrapolate sampled per-host MemAvailable to the cluster:
        the probe may reach only a subset of hosts, and treating that
        subset as the whole cluster would collapse the wave width to a
        fraction of real capacity."""
        if not probed:
            return None
        mean_gb = sum(probed.values()) / len(probed)
        hosts = max(n_cluster_hosts or 0, len(probed))
        return max(1, int((mean_gb * hosts) // gb))

    try:
        sc = spark.sparkContext
        status = sc._jsc.sc().getExecutorMemoryStatus()
        # the driver's block manager appears in the status map too —
        # counting it would overcommit executors on a real cluster, so
        # exclude it whenever actual executors are present (local mode
        # has only the driver entry, which IS the executor there).
        bmid = sc._jsc.sc().env().blockManager().blockManagerId()
        driver_key = f"{bmid.host()}:{bmid.port()}"
        it = status.iterator()
        free = {}
        while it.hasNext():
            kv = it.next()
            free[kv._1()] = kv._2()._2() / float(1024**3)
        if len(free) > 1:
            free.pop(driver_key, None)
        free_gb = sum(free.values())
        jvm_cap = 1 if free_gb <= 0 else max(1, int(free_gb // gb))
        host_cap = _host_cap(len({k.rsplit(":", 1)[0] for k in free}))
        return min(jvm_cap, host_cap) if host_cap is not None else jvm_cap
    except Exception:  # noqa: BLE001
        host_cap = _host_cap(None)
        if host_cap is not None:
            return min(host_cap, _ram_parallelism_cap(spark, func_ram))
        return _ram_parallelism_cap(spark, func_ram)


def _ram_parallelism_cap(spark: SparkSession, func_ram) -> int:
    """RAM half of the reference's packing rule (catalog.py:94-101):
    how many func_ram-sized tasks fit in ONE executor's memory, times
    the executor count — the reference packs per node
    (a 10-executor × 8 GB cluster at func_ram=4G runs 20 concurrent
    tasks, not 2; spark.executor.instances defaults to 1 which also
    covers local mode). 'dynamic'
    means 4 GB (the reference's default); int means GB; strings accept
    '8', '8G', '8GB', '512M'. Unparseable values fall back to no cap —
    sizing must never fail a job."""
    try:
        if isinstance(func_ram, str):
            s = func_ram.strip().upper()
            if s == "DYNAMIC":
                gb = 4.0
            elif s.endswith("GB") or s.endswith("G"):
                gb = float(s.rstrip("GB"))
            elif s.endswith("MB") or s.endswith("M"):
                gb = float(s.rstrip("MB")) / 1024
            else:
                gb = float(s)
        else:
            gb = float(func_ram)
        if gb <= 0:
            return 1 << 30
        mem = (
            spark.conf.get("spark.executor.memory", None)
            or spark.conf.get("spark.driver.memory", None)
            or "1g"
        ).strip().upper()
        if mem.endswith("G"):
            mem_gb = float(mem[:-1])
        elif mem.endswith("M"):
            mem_gb = float(mem[:-1]) / 1024
        elif mem.endswith("K"):
            mem_gb = float(mem[:-1]) / (1024 * 1024)
        else:
            mem_gb = float(mem) / (1024**3)  # raw bytes
        try:
            n_exec = int(spark.conf.get("spark.executor.instances", "1") or 1)
        except (TypeError, ValueError):
            n_exec = 1  # local mode / dynamic allocation: one JVM
        return max(1, int(mem_gb // gb)) * max(1, n_exec)
    except Exception:  # noqa: BLE001 — sizing is best-effort
        return 1 << 30


def result_table_from_tuples(tuples, schema=None):
    """Build a pyarrow Table in RESULT_SCHEMA column order from raw
    result tuples/Rows (columnar construction — no per-row Spark
    conversion)."""
    import pyarrow as pa

    cols = list(zip(*tuples)) if tuples else [[] for _ in range(8)]
    names = [
        "idx", "is_error", "payload", "stdout",
        "error_type", "error_msg", "error_tb", "error_pkl",
    ]
    if schema is None:
        schema = pa.schema(
            [
                ("idx", pa.int64()),
                ("is_error", pa.bool_()),
                ("payload", pa.binary()),
                ("stdout", pa.string()),
                ("error_type", pa.string()),
                ("error_msg", pa.string()),
                ("error_tb", pa.string()),
                ("error_pkl", pa.binary()),
            ]
        )
    arrays = [
        pa.array(list(col), type=schema.field(name).type)
        for col, name in zip(cols, names)
    ]
    return pa.Table.from_arrays(arrays, schema=schema)


def materialize_results_arrow(tbl, stdout_sink=None, _deliver=None) -> list:
    """Columnar twin of :func:`materialize_results` for results held as
    a pyarrow Table (the collect and journal-fetch paths): identical
    user-facing semantics — per-row stdout delivery in row order,
    first error row re-raised with original-type fidelity, payloads
    unpickled — but the common all-clean case runs as two vectorized
    column scans instead of a million Row-attribute reads."""
    import pyarrow.compute as pc

    n = tbl.num_rows
    if n == 0:
        return []
    has_err = pc.any(tbl.column("is_error")).as_py()
    so = tbl.column("stdout")
    has_stdout = bool(
        pc.any(pc.not_equal(so.fill_null(""), "")).as_py()
    )
    if not has_err and not has_stdout:
        return [pickle.loads(p) for p in tbl.column("payload").to_pylist()]
    if _deliver is not None:
        # live collect path: share the caller's once-per-index sink so
        # row-carried stdout dedups against LIVE TCP deliveries too.
        deliver = _deliver
    else:
        from burla_spark.logs import once_per_index

        sink = stdout_sink if stdout_sink is not None else (
            lambda idx, text: sys.stdout.write(text)
        )
        deliver = once_per_index(sink)
    idxs = tbl.column("idx").to_pylist()
    errs = tbl.column("is_error").to_pylist()
    stdouts = so.to_pylist()
    payloads = tbl.column("payload").to_pylist()
    out = []
    for i in range(n):
        if stdouts[i]:
            deliver(idxs[i], stdouts[i])
        if errs[i]:
            raise _rehydrate_error(
                tbl.column("error_pkl")[i].as_py(),
                tbl.column("error_type")[i].as_py(),
                tbl.column("error_msg")[i].as_py(),
                tbl.column("error_tb")[i].as_py(),
                idxs[i],
            )
        out.append(pickle.loads(payloads[i]))
    return out


def materialize_results(rows, stdout_sink=None) -> list:
    """Turn raw RESULT_SCHEMA rows into the user-facing result list:
    deliver any undelivered stdout (deduped by input index), re-raise
    the first error row with original-type fidelity, unpickle payloads.
    Shared by the live collect path and the detached-job journal fetch
    (jobs.fetch_results), so a second process materializes identically."""
    from burla_spark.logs import once_per_index

    sink = stdout_sink if stdout_sink is not None else (
        lambda idx, text: sys.stdout.write(text)
    )
    deliver = once_per_index(sink)
    out = []
    for row in rows:
        if row.stdout:
            deliver(row.idx, row.stdout)
        if row.is_error:
            raise _rehydrate_error(
                row.error_pkl, row.error_type, row.error_msg, row.error_tb, row.idx
            )
        out.append(pickle.loads(bytes(row.payload)))
    return out


class _ResultRow:
    """Attribute-access adapter for result tuples pushed through the
    completion-order channel (same fields as RESULT_SCHEMA rows)."""

    __slots__ = ("idx", "is_error", "payload", "stdout", "error_type",
                 "error_msg", "error_tb", "error_pkl")

    def __init__(self, tup):
        for name, val in zip(self.__slots__, tup):
            setattr(self, name, val)


def _stream_results(spark, build_result_df, handle, log_server, n_expected):
    """COMPLETION-ordered result generator (reference parity:
    `_remote_parallel_map.py:703-715` yields from a client-side Queue in
    the order results finish).

    The compute UDF itself pushes each finished batch of result rows to
    a driver-side message listener (``build_result_df(addr)`` builds the
    plan with the push address baked in) and the generator yields from
    the receiving queue — a result from a fast task is available while
    slow tasks still run, so first-result latency tracks the fastest
    input, not the slowest partition. Pushing FROM the UDF means result
    payloads never round-trip through the JVM: the old shape shipped
    the result frame JVM-side and re-pickled every row into a second
    python worker (foreachPartition) just to do the same socket send —
    measured 7.5 s -> ~5 s at 1M results (guide §4, fewer
    JVM<->Python crossings). A failed push fails the task (Spark
    retries it; the driver dedups replayed rows by input index,
    mirroring the reference's ack/replay exactly-once contract). The
    action — a noop-sink write that merely drains the (empty) stage
    output — runs under a unique job tag; if the consumer abandons the
    generator or an error row raises, the finally CANCELS the tag
    before closing the listener — otherwise every still-running task's
    push would fail and retry maxFailures times, re-executing user
    code. If the listener cannot even be constructed, falls back to
    the partition-ordered ``toLocalIterator`` path over a plan built
    WITHOUT a push address (rows come back as frames)."""
    import queue as _queue
    import threading
    import uuid

    from burla_spark.logs import MessageStreamServer, decode_result_batch

    try:
        host = spark.conf.get("spark.driver.host", None) or "127.0.0.1"
        # BOUNDED queue (reference parity: the client yields from a
        # SizedQueue) — a slow consumer must stall the pushers, not
        # buffer the whole job on the driver. When it fills, the
        # cooperative put below blocks the selector thread → the
        # listener stops reading → TCP windows close → worker sends
        # block inside their tasks: end-to-end backpressure with no
        # extra protocol. The depth only bounds DRIVER memory;
        # throughput is unaffected while the consumer keeps up.
        # Frames carry BATCHES of rows (up to _STREAM_BATCH_ROWS), so
        # the queue is sized in batches to keep the same row bound.
        depth = int(spark.conf.get("spark.burla.streamQueueDepth", "1024"))
        q: "_queue.Queue" = _queue.Queue(
            maxsize=max(2, depth // _STREAM_BATCH_ROWS)
        )
        res_server: "MessageStreamServer | None" = None

        def sink(frame: bytes) -> None:
            item = decode_result_batch(frame)
            while True:
                try:
                    q.put(item, timeout=0.2)
                    return
                except _queue.Full:
                    if res_server is None or res_server.closed:
                        return  # consumer gone — drop; job is cancelling
        res_server = MessageStreamServer(
            sink,
            host,
            max_msg=MAX_INPUT_SIZE_BYTES + 10_000_000,
        )
    except Exception:  # noqa: BLE001
        res_server = None

    if res_server is None:  # pragma: no cover — no listener: degraded path

        def fallback():
            result_df = build_result_df(None)
            try:
                if log_server is not None:
                    log_server.__enter__()
                for row in result_df.toLocalIterator(prefetchPartitions=True):
                    yield handle(row)
            finally:
                if log_server is not None:
                    log_server.__exit__()

        return fallback()

    result_df = build_result_df(res_server.advertise)
    tag = f"burla-rpm-stream-{uuid.uuid4().hex[:12]}"

    def put_control(msg) -> None:
        # control markers share the bounded queue; if the consumer is
        # gone (server closed) give up instead of parking this thread
        # on a queue nobody drains.
        while True:
            try:
                q.put(msg, timeout=0.2)
                return
            except _queue.Full:
                if res_server.closed:
                    return

    def run_action():
        try:
            # context-level tag (thread-local, like jobs.submit): lets
            # the consumer cancel the action at the DAGScheduler.
            spark.sparkContext.addJobTag(tag)
            # the UDF pushes rows itself and emits no frames; the noop
            # sink just drains the empty stage output inside the JVM —
            # no second python operator, no row re-pickling.
            result_df.write.format("noop").mode("overwrite").save()
            put_control(("__done__", None))
        except BaseException as exc:  # noqa: BLE001 — relay to consumer
            put_control(("__fail__", exc))
        finally:
            try:
                spark.sparkContext.removeJobTag(tag)
            except Exception:  # noqa: BLE001
                pass

    def stream():
        thread = threading.Thread(target=run_action, daemon=True)
        seen: set[int] = set()
        # "__done__" means the ACTION finished, not that every pushed
        # row has been drained: frames can still sit in kernel buffers /
        # the backpressured sink when foreachPartition returns (the
        # bounded queue makes that the common case under a slow
        # consumer). So completion is len(seen) == n_expected; the done
        # marker only switches the q.get to a bounded wait so a truly
        # lost row surfaces as a loud error instead of a hang.
        done = False
        try:
            if log_server is not None:
                log_server.__enter__()
            res_server.__enter__()
            thread.start()
            while len(seen) < n_expected:
                try:
                    msg = q.get(timeout=60.0 if done else None)
                except _queue.Empty:
                    raise RuntimeError(
                        "result stream stalled after job completion: "
                        f"{len(seen)}/{n_expected} results delivered"
                    ) from None
                if not isinstance(msg, list):
                    if msg[0] == "__done__":
                        done = True
                    elif msg[0] == "__fail__":
                        raise msg[1]
                    continue
                for tup in msg:  # one decoded batch frame
                    idx = tup[0]
                    if idx in seen:  # task-retry replay
                        continue
                    seen.add(idx)
                    # fast path for the overwhelmingly common row shape
                    # (no stdout to deliver, no error): skip the
                    # attribute-adapter object and handle()'s branchwork
                    # — at 1M results the per-row object construction
                    # and attribute loads are driver-serial wall time.
                    if not tup[1] and not tup[3]:  # not is_error, no stdout
                        yield pickle.loads(tup[2])
                    else:
                        yield handle(_ResultRow(tup))
        finally:
            # cancel BEFORE tearing down the listener: abandonment or
            # an error row must stop the action, not strand tasks whose
            # pushes now fail into Spark's retry loop.
            if thread.is_alive():
                try:
                    spark.sparkContext.cancelJobsWithTag(tag)
                except Exception:  # noqa: BLE001
                    pass
            res_server.__exit__()
            if log_server is not None:
                log_server.__exit__()

    return stream()


def remote_parallel_map(
    function_: Callable,
    inputs: Iterable[Any],
    func_cpu: int = 1,
    func_ram: str | int = "dynamic",
    func_gpu: int | None = None,
    image: str | None = None,
    grow: bool = True,
    max_parallelism: int | None = None,
    detach: bool | str = False,
    generator: bool = False,
    spinner: bool = False,
    repack: bool = False,
    spark: SparkSession | None = None,
    capture_stdout: bool = True,
    stdout_sink: Callable[[int, str], None] | None = None,
    _job_id: str | None = None,  # internal: jobs.redrive resubmits under the orphan's id
    journal_dir: str | None = None,
    # internal, jobs.redrive resume: pre-pickled (orig_idx, blob) inputs
    # still to run, and already-acked RESULT_SCHEMA tuples to merge.
    _raw_input_rows: list | None = None,
    _done_rows: list | None = None,
):
    """Apply ``function_`` to every input on the cluster; return results
    (unordered list; a generator when ``generator=True``; a
    ``BackgroundJob`` handle when ``detach=True``).

    Full reference signature (_remote_parallel_map.py:457-469) with the
    Spark mapping:
    * func_cpu — width divisor: concurrent tasks ≈ total_cores/func_cpu
      (per-task CPU pinning is spark.task.cpus at session level).
    * func_ram — RAM-aware parallelism cap, the static half of the
      reference's packing rule (catalog.py:94-101:
      ``min(cpus // func_cpu, ram_gb // func_ram)``): concurrent tasks
      are additionally capped at executor_memory_gb // func_ram_gb
      ('dynamic' = 4 GB like the reference). With ``repack=True``
      the job runs in WAVES and the width is recomputed from LIVE
      executor free memory between waves — the dynamic half of the
      reference's rule (worker_client.py:88-151 repacks as workers
      free RAM) at wave granularity, since Spark cannot resize a
      RUNNING stage (the residual §7.3.3 divergence: within one wave
      the width is fixed).
    * func_gpu — stage-level ResourceProfiles on a GPU cluster; raises
      here (no GPUs in this environment).
    * image / grow — container image and autoscaling are cluster-level
      in Spark (spark.kubernetes.container.image, dynamic allocation);
      accepted and ignored.
    * detach — True runs on a background thread under a cancelable job
      tag (burla_spark.jobs); survives until the driver exits, with
      journal/partial-ack recovery after it. detach="process" goes
      further: the job runs under its OWN driver (jobs_runner spawned
      in a new session), so it keeps EXECUTING after this process
      exits — the reference's A22 semantics (job_watcher.py:259,
      294-301) — at the cost of a second JVM and the journal-payload
      size cap (function+inputs must fit spark.burla.
      journalPayloadMaxBytes, since the journal is the only channel
      to the runner).
    * spinner — live ``X/N done`` progress lines (burla_spark.progress).
    """
    spark = spark or SparkSession.getActiveSession()
    if spark is None:
        # The reference supports nested RPM (a UDF calling RPM again —
        # node_service/__init__.py:54-55, scheduled back onto the same
        # cluster). Spark executors cannot submit jobs, so a nested
        # call DEGRADES to an executor-local map with identical
        # semantics (tuple unpacking, completion order, input-index
        # error attribution) — parallelism bounded to this worker
        # instead of the cluster (SURVEY §7.3.4's residual divergence).
        if os.environ.get("BURLA_SPARK_IN_WORKER") == "1":
            return _nested_local_map(
                function_, inputs, generator=generator, detach=detach
            )
        raise RuntimeError(
            "no active SparkSession — call burla_spark.get_spark() first "
            "(or pass spark=...). If this call is inside a Spark worker "
            "(nested RPM in your OWN UDF), executors cannot submit jobs — "
            "either call through burla_spark's remote_parallel_map (whose "
            "workers run nested calls executor-locally) or restructure as "
            "driver-side composition: expand inputs first and run ONE "
            "remote_parallel_map over the expanded list."
        )
    if func_gpu:
        # Build the exact stage-level profile a GPU cluster would run
        # with (reference providers/catalog.py:31-62,140-160 routes
        # func_gpu to GPU machine types), then gate on the cluster
        # actually advertising GPU executor resources — this env has
        # none, so the profile is constructed and verified but the run
        # refuses with the recipe attached.
        if generator:
            raise ValueError(
                "func_gpu with generator=True is not supported — run "
                "detached or collecting (the profile applies to the "
                "collect-path job)"
            )
        profile = gpu_resource_profile(func_gpu, func_cpu=func_cpu)
        if not _cluster_has_gpus(spark):
            err = NotImplementedError(
                "func_gpu maps to a stage-level ResourceProfile "
                f"(task: {func_gpu} gpu + {func_cpu} cpus; executor: gpu "
                "request with nvidia discovery script), but this cluster "
                "advertises no GPU executor resources. On a GPU cluster "
                "set spark.executor.resource.gpu.amount / "
                "spark.task.resource.gpu.amount (or use dynamic "
                "allocation) and the attached .resource_profile is "
                "applied via rdd.withResources()."
            )
            err.resource_profile = profile
            raise err
        gpu_profile = profile
    else:
        gpu_profile = None
    if detach and generator:
        raise ValueError("detach=True and generator=True are mutually exclusive")
    if repack and (detach or generator):
        raise ValueError(
            "repack=True runs the job in resizable waves on the calling "
            "thread — incompatible with detach/generator (whose single "
            "submission the journal and completion-order channel rely on)"
        )

    inputs = list(inputs)
    if not inputs and _raw_input_rows is None:
        # reference short-circuit (_remote_parallel_map.py:542)
        return iter(()) if generator else []

    cp = _cloudpickle()
    with _user_module_by_value(cp, function_):
        function_pkl = cp.dumps(function_)
        if len(function_pkl) > MAX_FUNCTION_SIZE_BYTES:
            raise FunctionTooBig(
                f"pickled function is {len(function_pkl)} bytes "
                f"(max {MAX_FUNCTION_SIZE_BYTES})"
            )

        if _raw_input_rows is not None:
            # redrive resume: inputs were pickled (and size-checked) by
            # the original submission; indices are the ORIGINAL ones so
            # journaled partials and new results key consistently.
            rows = list(_raw_input_rows)
        else:
            rows = []
            for i, item in enumerate(inputs):
                # cloudpickle semantics (inputs may be locally-defined
                # classes/closures, exactly like the reference's input
                # path) with the plain-pickle fast path for scalar
                # payloads — this loop is serial driver work on the
                # dispatch critical path.
                blob = _fast_dumps(cp, item)
                if len(blob) > MAX_INPUT_SIZE_BYTES:
                    raise InputTooBig(
                        f"input {i} pickles to {len(blob)} bytes "
                        f"(max {MAX_INPUT_SIZE_BYTES})"
                    )
                rows.append((i, blob))

    if detach == "process":
        # True cross-process detach (reference A22): the job runs under
        # its OWN driver (burla_spark.jobs_runner) and survives this
        # process exiting. This driver journals the payload and spawns
        # the runner — it does no Spark work for the job at all.
        from burla_spark import jobs

        return jobs.submit_process_detached(
            spark, function_pkl, rows, journal_dir=journal_dir
        )

    cpu_cap = spark.sparkContext.defaultParallelism // max(func_cpu, 1)
    ram_cap = _ram_parallelism_cap(spark, func_ram)
    default_par = max(1, min(cpu_cap, ram_cap))
    # max(1, ..): a redrive whose inputs are all acked submits an empty
    # frame — the trivial job keeps one code path for the merge below.
    n_parts = max(1, min(len(rows), max_parallelism or default_par * 2))

    # Detach decides its job id BEFORE the plan is built so executors
    # can ack per-input results into the job's own journal dir.
    partial_path = None
    jdir = journal_dir
    if detach:
        import uuid as _uuid

        from burla_spark import jobs

        _detach_job_id = _job_id or f"burla-job-{_uuid.uuid4().hex[:12]}"
        partial_path = jobs._partial_dir(jobs._journal_dir(spark, jdir), _detach_job_id)

    # One delivery sink for BOTH channels: the live TCP push (arrives
    # while tasks run) and the with-result fallback. Exactly-once per
    # input — a worker clears row stdout iff its live push succeeded,
    # and the driver additionally dedups by index (first delivery
    # wins; see logs.once_per_index for the retry/speculation races).
    from burla_spark.logs import once_per_index

    def _deliver_raw(idx: int, text: str) -> None:
        if stdout_sink is not None:
            stdout_sink(idx, text)
        else:
            sys.stdout.write(text)

    deliver = once_per_index(_deliver_raw)

    log_server = None
    if capture_stdout:
        try:
            from burla_spark.logs import LogStreamServer

            host = spark.conf.get("spark.driver.host", None) or "127.0.0.1"
            log_server = LogStreamServer(deliver, host)
        except Exception:  # noqa: BLE001 — live logs are best-effort
            log_server = None

    # pandas + Arrow ships the input batch to the JVM ~35% faster than
    # the row-list path (one Arrow buffer vs per-row pickling).
    import pandas as pd

    def _build_result_df(rows_slice, parts, result_addr=None):
        # createDataFrame over a pyarrow Table makes ONE partition per
        # Arrow batch, and the batch size is the session's
        # arrow.maxRecordsPerBatch — so slicing the transfer into
        # exactly ``parts`` batches lands the input frame
        # pre-partitioned at the target width and the old
        # ``.repartition(parts)`` round-robin Exchange (a full shuffle
        # + sort of every payload byte, guide §2.4) disappears.
        # Driver-side contiguous slicing spreads rows evenly by
        # construction. Building the Table directly also skips the
        # pandas object-frame detour (measured 7.3 s of pd.DataFrame
        # construction at 1M inputs). Fall back to the pandas +
        # repartition path only when a chunk would risk oversized
        # Arrow batches (payload-heavy inputs; a plain binary Arrow
        # column caps at 2 GiB).
        n_rows = len(rows_slice)
        chunk = -(-n_rows // max(parts, 1)) if n_rows else 1
        total_bytes = sum(len(r[1]) for r in rows_slice)
        oversized = (
            n_rows > 0
            and (
                (total_bytes / n_rows) * chunk > (1 << 30)
                or total_bytes > int(1.5 * (1 << 30))
            )
        )
        key = "spark.sql.execution.arrow.maxRecordsPerBatch"
        if oversized:
            wave_pdf = pd.DataFrame(
                {
                    "idx": [r[0] for r in rows_slice],
                    "payload": [r[1] for r in rows_slice],
                }
            )
            wave_df = spark.createDataFrame(
                wave_pdf, "idx long, payload binary"
            ).repartition(parts)
        else:
            import pyarrow as pa

            tbl = pa.Table.from_arrays(
                [
                    pa.array([r[0] for r in rows_slice], type=pa.int64()),
                    pa.array([r[1] for r in rows_slice], type=pa.binary()),
                ],
                names=["idx", "payload"],
            )
            prev = spark.conf.get(key)
            try:
                spark.conf.set(key, str(chunk))
                wave_df = spark.createDataFrame(tbl, "idx long, payload binary")
            finally:
                spark.conf.set(key, prev)
        return wave_df.mapInPandas(
            _make_udf(
                function_pkl,
                capture_stdout,
                log_server.advertise if log_server is not None else None,
                partial_dir=partial_path,
                result_addr=result_addr,
            ),
            RESULT_SCHEMA,
        )

    # repack ships inputs per wave — building (and eagerly Arrow-
    # transferring) the full-input frame here would double driver
    # memory and driver->JVM traffic for a plan the wave loop ignores.
    # The generator path builds its own plan (with the result-push
    # address baked into the UDF) inside _stream_results.
    result_df = None if (repack or generator) else _build_result_df(rows, n_parts)

    def handle(row):
        if row.stdout:
            deliver(row.idx, row.stdout)
        if row.is_error:
            raise _rehydrate_error(
                row.error_pkl, row.error_type, row.error_msg, row.error_tb, row.idx
            )
        return pickle.loads(bytes(row.payload))

    if generator:
        return _stream_results(
            spark,
            lambda addr: _build_result_df(rows, n_parts, result_addr=addr),
            handle,
            log_server,
            len(rows),
        )

    # Wave size: WAVES_PER_WIDTH partitions-worth of inputs per wave —
    # wide enough to amortize per-job overhead, narrow enough that a
    # RAM-pressure change takes effect within a couple of waves.
    WAVES_PER_WIDTH = 4

    def _run_collect_waves():
        out = []
        remaining = list(rows)
        while remaining:
            width = max(
                1, min(cpu_cap, _live_ram_cap(spark, func_ram))
            )
            if max_parallelism:
                width = min(width, max_parallelism)
            take = max(1, width * WAVES_PER_WIDTH)
            wave, remaining = remaining[:take], remaining[take:]
            wave_df = _build_result_df(wave, min(len(wave), width))
            if gpu_profile is not None:
                # func_gpu + repack: every wave still runs under the
                # GPU profile — dropping it would schedule more tasks
                # than devices.
                out.extend(wave_df.rdd.withResources(gpu_profile).collect())
            else:
                out.extend(wave_df.collect())
        return out

    def _run_collect():
        if repack:
            return _run_collect_waves()
        if gpu_profile is not None:
            # stage-level scheduling: the single mapInPandas stage runs
            # under the GPU profile (the job is submitted through the
            # RDD so withResources can attach the profile).
            return result_df.rdd.withResources(gpu_profile).collect()
        # Arrow collect (guide §6 "Arrow for driver transfers"): the
        # result frame comes back as columnar batches instead of a
        # million JVM Row -> Python Row conversions; downstream
        # materialization is vectorized (materialize_results_arrow).
        return result_df.toArrow()

    def collect_rows():
        import contextlib as _ctx

        with log_server if log_server is not None else _ctx.nullcontext():
            if spinner:
                from burla_spark.progress import ProgressReporter

                with ProgressReporter(spark):
                    return _run_collect()
            return _run_collect()

    def collect_all():
        out = collect_rows()
        if isinstance(out, list):  # repack / GPU paths still collect rows
            return [handle(row) for row in out]
        return materialize_results_arrow(out, _deliver=deliver)

    if detach:
        # Journal the detached job (reference job_watcher.py:259,294-301
        # keeps a detached job observable after the client disconnects):
        # manifest now, result rows on completion — a SECOND process can
        # jobs.list_jobs / jobs.fetch_results after this driver exits.
        # Journaling is best-effort: an unwritable journal dir degrades
        # to in-process-only detach, never to a failed job.
        from burla_spark import jobs

        job_id = _detach_job_id
        # already-acked rows from a previous run of this job id — merged
        # into the journal and the returned results, never recomputed.
        done_tuples = [tuple(t) for t in (_done_rows or [])]
        try:
            # payload first (function + inputs, size-capped) so the
            # manifest's redrivable flag is truthful from the start —
            # an orphaned job (driver death, stale heartbeat) can then
            # be re-driven by a second process via jobs.redrive.
            # On a redrive RESUME keep the ORIGINAL full payload:
            # overwriting it with only the remaining inputs would make
            # recoverability of the acked inputs depend solely on the
            # partial/ files — a torn ack file after a second driver
            # death would then silently drop them from the job.
            if _raw_input_rows is not None:
                redrivable = True  # redrive loaded it, so it exists
            else:
                redrivable = jobs.journal_payload(
                    spark, job_id, function_pkl, rows, jdir
                )
            jobs.journal_start(
                spark, job_id, len(rows) + len(done_tuples), jdir,
                redrivable=redrivable,
            )
        except Exception:  # noqa: BLE001
            pass

        handle_box: list = []  # filled with the BackgroundJob post-submit

        def journaled_action():
            # heartbeat the RUNNING manifest so a second process can
            # tell a live in-flight job from a dead driver's orphan —
            # and honor a cross-process cancel flag (the reference's
            # dashboard stop endpoint) within one heartbeat interval
            stop_beat = threading.Event()

            def beat():
                while not stop_beat.wait(jobs.HEARTBEAT_INTERVAL_S):
                    try:
                        jobs.journal_heartbeat(spark, job_id, jdir)
                        if jobs.cancel_requested(spark, job_id, jdir) and handle_box:
                            handle_box[0].cancel()
                            return
                    except Exception:  # noqa: BLE001
                        pass

            threading.Thread(target=beat, daemon=True, name=f"{job_id}-beat").start()
            try:
                rows_out = collect_rows()
            except BaseException as exc:
                stop_beat.set()
                try:
                    canceled = (handle_box and handle_box[0]._canceled) or (
                        jobs.cancel_requested(spark, job_id, jdir)
                    )
                    if canceled:
                        jobs.journal_cancel(spark, job_id, jdir)
                    else:
                        jobs.journal_fail(spark, job_id, exc, jdir)
                except Exception:  # noqa: BLE001
                    pass
                raise
            stop_beat.set()
            if isinstance(rows_out, list):  # repack/GPU row path
                all_rows = list(rows_out) + done_tuples
            else:  # pyarrow Table from the Arrow collect
                all_rows = rows_out
                if done_tuples:
                    import pyarrow as pa

                    all_rows = pa.concat_tables(
                        [rows_out, result_table_from_tuples(
                            done_tuples, schema=rows_out.schema
                        )]
                    )
            try:
                # error rows journal too — fetch_results re-raises them
                # with the same fidelity a live call would have.
                jobs.journal_finish(spark, job_id, all_rows, RESULT_SCHEMA, jdir)
            except Exception:  # noqa: BLE001
                pass
            if isinstance(all_rows, list):
                return [
                    handle(row if not isinstance(row, tuple) else _ResultRow(row))
                    for row in all_rows
                ]
            return materialize_results_arrow(all_rows, _deliver=deliver)

        bg = jobs.submit(spark, journaled_action, tag=job_id)
        bg.job_id = job_id
        handle_box.append(bg)
        return bg

    return collect_all()
