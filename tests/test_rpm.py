"""RPM-semantics suite — mirrors the reference's client-observable
contracts (reference tests: client/tests/test_rpm_core.py:23-134,
tests/scenarios/test_large_input_scale.py:24-30; shapes per FIXTURES.md §2).
"""

from __future__ import annotations

import os

import pytest

from burla_spark.rpm import (
    FunctionTooBig,
    InputTooBig,
    RpmError,
    remote_parallel_map,
)


def _print_and_identity(x):
    print("hi")
    return x


def test_roundtrip_unordered(spark):
    results = remote_parallel_map(_print_and_identity, list(range(100)), spark=spark)
    assert len(results) == 100
    assert set(results) == set(range(100))


def test_empty_inputs(spark):
    assert remote_parallel_map(lambda x: x, [], spark=spark) == []
    assert list(remote_parallel_map(lambda x: x, [], spark=spark, generator=True)) == []


def test_tuple_unpacking(spark):
    results = remote_parallel_map(lambda a, b: a + b, [(1, 2), (3, 4), (5, 6)], spark=spark)
    assert sorted(results) == [3, 7, 11]


def test_lists_not_unpacked(spark):
    results = remote_parallel_map(lambda l: sum(l), [[1, 2], [3, 4]], spark=spark)
    assert sorted(results) == [3, 7]


def test_generator_streaming(spark):
    gen = remote_parallel_map(lambda x: x + 10, range(20), spark=spark, generator=True)
    assert sorted(gen) == [x + 10 for x in range(20)]


def test_error_attribution(spark):
    def boom(x):
        if x == 7:
            raise ValueError("x was seven")
        return x

    with pytest.raises(RpmError) as exc_info:
        remote_parallel_map(boom, range(20), spark=spark)
    e = exc_info.value
    assert e.burla_input_index == 7
    assert e.error_type == "ValueError"
    assert "x was seven" in e.original_message
    assert "boom" in e.remote_traceback


def test_stdout_capture(spark):
    captured = []
    remote_parallel_map(
        lambda x: x,
        range(10),
        spark=spark,
        stdout_sink=lambda idx, text: captured.append((idx, text)),
    )
    # identity prints nothing; now with prints:
    captured.clear()

    def loud(x):
        print(f"line-{x}")
        return x

    remote_parallel_map(
        loud, range(10), spark=spark,
        stdout_sink=lambda idx, text: captured.append((idx, text.strip())),
    )
    assert sorted(captured) == [(i, f"line-{i}") for i in range(10)]


def test_large_input_scale(spark):
    results = remote_parallel_map(lambda x: x * 3, range(1000), spark=spark)
    assert sorted(results) == [x * 3 for x in range(1000)]


def test_input_too_big(spark):
    big = b"x" * (200_000_001)
    with pytest.raises(InputTooBig):
        remote_parallel_map(lambda x: len(x), [big], spark=spark)


def test_function_too_big(spark):
    blob = b"y" * 100_000_001

    def closure_heavy(x):
        return len(blob) + x

    with pytest.raises(FunctionTooBig):
        remote_parallel_map(closure_heavy, [1], spark=spark)


def test_detach_returns_background_handle(spark):
    from burla_spark.jobs import BackgroundJob

    job = remote_parallel_map(lambda x: x + 1, range(50), spark=spark, detach=True)
    assert isinstance(job, BackgroundJob)
    assert sorted(job.result(timeout=60)) == list(range(1, 51))


def test_detach_generator_conflict(spark):
    with pytest.raises(ValueError):
        remote_parallel_map(lambda x: x, [1], spark=spark, detach=True, generator=True)


def test_func_gpu_raises_with_profile_attached(spark):
    """GPU-less env: the run refuses, but the EXACT stage-level profile
    a GPU cluster would use is built, attached to the error, and
    carries the requested amounts (reference catalog.py:31-62 GPU
    routing, re-expressed as Spark stage-level scheduling)."""
    with pytest.raises(NotImplementedError) as excinfo:
        remote_parallel_map(lambda x: x, [1], spark=spark, func_gpu=2, func_cpu=3)
    profile = excinfo.value.resource_profile
    assert profile.taskResources["gpu"].amount == 2.0
    assert profile.taskResources["cpus"].amount == 3.0
    ereq = profile.executorResources["gpu"]
    assert ereq.amount == 2
    assert ereq.vendor == "nvidia.com"
    assert "getGpusResources" in ereq.discoveryScript


def test_gpu_resource_profile_builds_without_gpus():
    from burla_spark.rpm import gpu_resource_profile

    p = gpu_resource_profile(1)
    assert p.taskResources["gpu"].amount == 1.0
    assert p.executorResources["gpu"].amount == 1
    # fractional task GPUs (sharing one device across tasks) round the
    # executor request UP to whole devices
    p2 = gpu_resource_profile(0.5)
    assert p2.taskResources["gpu"].amount == 0.5
    assert p2.executorResources["gpu"].amount == 1


def test_func_gpu_generator_conflict(spark):
    with pytest.raises(ValueError, match="generator"):
        remote_parallel_map(
            lambda x: x, [1], spark=spark, func_gpu=1, generator=True
        )


def test_func_cpu_and_spinner(spark):
    results = remote_parallel_map(
        lambda x: x * 2, range(64), spark=spark, func_cpu=4, spinner=True
    )
    assert sorted(results) == [x * 2 for x in range(64)]


def test_nested_rpm_degrades_to_local_map(spark):
    """The reference allows nested RPM (scheduled onto the same
    cluster); Spark executors can't submit jobs, so the inner call
    runs executor-locally with the same semantics (SURVEY §7.3.4) —
    reference code using nested rpm runs unmodified."""

    def outer(x):
        from burla_spark import remote_parallel_map as rpm

        return sorted(rpm(lambda y: y * 2, [x, x + 1]))

    results = remote_parallel_map(outer, [1, 3], spark=spark)
    assert sorted(results) == [[2, 4], [6, 8]]


def test_nested_rpm_tuple_unpack_and_generator(spark):
    def outer(x):
        from burla_spark import remote_parallel_map as rpm

        summed = rpm(lambda a, b: a + b, [(x, 1), (x, 2)])
        gen = rpm(lambda y: y + 10, [x], generator=True)
        return sorted(summed) + list(gen)

    results = remote_parallel_map(outer, [5], spark=spark)
    assert results == [[6, 7, 15]]


def test_nested_rpm_error_attribution(spark):
    """A nested failure carries BOTH input indices: the inner call
    tags the original exception with its index; the outer worker ships
    it with the outer index."""

    def outer(x):
        from burla_spark import remote_parallel_map as rpm

        def inner(y):
            if y == 7:
                raise ValueError("inner seven")
            return y

        return rpm(inner, [x, 7])

    with pytest.raises(RpmError) as exc_info:
        remote_parallel_map(outer, [1], spark=spark)
    e = exc_info.value
    assert e.burla_input_index == 0  # outer input that failed
    assert "inner seven" in e.original_message


def test_nested_rpm_detach_unsupported(spark):
    def outer(x):
        from burla_spark import remote_parallel_map as rpm

        return rpm(lambda y: y, [x], detach=True)

    with pytest.raises(RpmError) as exc_info:
        remote_parallel_map(outer, [1], spark=spark)
    assert "nested" in exc_info.value.original_message.lower()


def test_arbitrary_objects_roundtrip(spark):
    class Thing:
        def __init__(self, v):
            self.v = v

    results = remote_parallel_map(lambda t: t.v * 2, [Thing(i) for i in range(10)], spark=spark)
    assert sorted(results) == [i * 2 for i in range(10)]


def test_local_class_results_roundtrip(spark):
    """Results that are locally-defined class instances must come back
    (worker serializes results with cloudpickle, by value)."""

    class Box:
        def __init__(self, v):
            self.v = v

    results = remote_parallel_map(lambda x: Box(x * 3), range(6), spark=spark)
    assert sorted(r.v for r in results) == [x * 3 for x in range(6)]


def test_live_log_streaming_mid_job(spark):
    """Per-input stdout must surface WHILE the job runs (reference
    parity: live log relay), not only with the results: a straggler
    input holds the job open ~4s; the fast inputs' prints must have
    arrived well before completion, each exactly once."""
    import threading
    import time

    received = []
    lock = threading.Lock()

    def sink(idx, text):
        with lock:
            received.append((idx, text, time.time()))

    def fn(x):
        print(f"msg-{x}")
        if x == 99:
            time.sleep(4)
        return x

    inputs = list(range(8)) + [99]
    res = remote_parallel_map(fn, inputs, spark=spark, stdout_sink=sink)
    t_done = time.time()
    assert sorted(res) == sorted(inputs)
    with lock:
        got = list(received)
    assert sorted(i for i, _, _ in got) == list(range(9))  # exactly once
    for i, text, _ in got:
        assert text == f"msg-{inputs[i]}\n"
    earliest = min(t for _, _, t in got)
    assert t_done - earliest > 2.0, "no stdout arrived before job completion"


def test_generator_completion_order(spark):
    """generator=True must yield in COMPLETION order (reference
    parity): input 0 sleeps 3s — under the old partition-ordered
    iterator it would be yielded first; completion order yields a fast
    input first."""
    import time

    def fn(x):
        if x == 0:
            time.sleep(3)
        return x

    gen = remote_parallel_map(fn, range(10), spark=spark, generator=True)
    first = next(gen)
    assert first != 0, "slowest input yielded first — not completion order"
    rest = list(gen)
    assert sorted([first, *rest]) == list(range(10))


def test_func_ram_caps_parallelism(spark):
    """func_ram applies the reference's static packing rule
    (min(cpus//func_cpu, ram_gb//func_ram)): a huge per-task RAM ask
    must shrink the input partitioning to the RAM cap, and 'dynamic'
    (4 GB) must still run fine."""
    from burla_spark.rpm import _ram_parallelism_cap

    mem = (spark.conf.get("spark.driver.memory", None) or "1g").upper()
    assert _ram_parallelism_cap(spark, "dynamic") >= 1
    # per-task ask = all of executor memory → cap 1
    assert _ram_parallelism_cap(spark, mem.rstrip("GMK")
                                + ("G" if mem.endswith("G") else "M")) >= 1
    big = _ram_parallelism_cap(spark, "100000G")
    assert big == 1
    assert sorted(
        remote_parallel_map(lambda x: x + 1, range(6), func_ram="100000G", spark=spark)
    ) == list(range(1, 7))


def test_generator_abandonment_cancels_job(spark):
    """Closing the generator mid-job must CANCEL the underlying action
    (via its job tag), not strand tasks whose result pushes now fail
    into Spark's retry loop re-running user code (round-3 review)."""
    import time

    def slow(x):
        import time as t

        t.sleep(5)
        return x

    gen = remote_parallel_map(slow, range(64), spark=spark, generator=True)
    next(gen)
    gen.close()  # abandon with most inputs still queued/running
    # Without the tag cancel the action would stay active for the
    # remaining ~2 waves of 5s sleeps (>>6s); with it, active jobs
    # drain almost immediately.
    st = spark.sparkContext.statusTracker()
    deadline = time.time() + 6
    while time.time() < deadline and st.getActiveJobsIds():
        time.sleep(0.2)
    assert not st.getActiveJobsIds(), "job still running after abandonment"


def test_generator_bounded_queue_backpressure(spark):
    """With a tiny stream-queue depth, a slow consumer must still
    receive every result exactly once (pushers stall on TCP instead of
    overflowing driver memory), and abandoning the generator while the
    queue is full must not hang the session."""
    import time

    from burla_spark import remote_parallel_map

    prev = spark.conf.get("spark.burla.streamQueueDepth", "1024")
    spark.conf.set("spark.burla.streamQueueDepth", "4")
    try:
        gen = remote_parallel_map(
            lambda x: x * 2, range(120), spark=spark, generator=True
        )
        out = []
        for v in gen:
            if len(out) < 5:
                time.sleep(0.05)  # slow consumer while tasks are pushing
            out.append(v)
        assert sorted(out) == [x * 2 for x in range(120)]

        gen2 = remote_parallel_map(
            lambda x: x, range(120), spark=spark, generator=True
        )
        next(gen2)
        gen2.close()  # abandon with a full queue → cancel, no hang
    finally:
        spark.conf.set("spark.burla.streamQueueDepth", prev)


def test_repack_waves_complete_and_resize(spark, monkeypatch):
    """A16 dynamic repacking, wave granularity: the job runs in waves
    whose width is recomputed from live executor memory between waves —
    all inputs complete exactly once, and the width probe is consulted
    once per wave."""
    import burla_spark.rpm as rpm_mod

    calls = []
    widths = iter([4, 2, 8, 8, 8, 8, 8, 8])

    def fake_cap(spark_, func_ram):
        w = next(widths)
        calls.append(w)
        return w

    monkeypatch.setattr(rpm_mod, "_live_ram_cap", fake_cap)
    got = remote_parallel_map(
        lambda x: x * 3, range(50), spark=spark, repack=True, func_ram=1
    )
    assert sorted(got) == [x * 3 for x in range(50)]
    # wave sizes: 4*4=16, 2*4=8, then 8*4=32-wide waves drain the rest
    assert len(calls) >= 3


def test_repack_conflicts(spark):
    with pytest.raises(ValueError, match="repack"):
        remote_parallel_map(lambda x: x, [1], spark=spark, repack=True, detach=True)
    with pytest.raises(ValueError, match="repack"):
        remote_parallel_map(
            lambda x: x, [1], spark=spark, repack=True, generator=True
        )


def test_live_ram_cap_positive(spark):
    from burla_spark.rpm import _live_ram_cap

    cap = _live_ram_cap(spark, 1)
    assert isinstance(cap, int) and cap >= 1
    # no RAM request → effectively uncapped
    assert _live_ram_cap(spark, None) >= 1 << 20


def test_repack_stdout_still_delivered(spark):
    lines = []
    got = remote_parallel_map(
        lambda x: print(f"in-{x}") or x,
        range(6),
        spark=spark,
        repack=True,
        stdout_sink=lambda idx, text: lines.append((idx, text.strip())),
    )
    assert sorted(got) == list(range(6))
    assert sorted(lines) == [(i, f"in-{i}") for i in range(6)]


def test_public_api_parity_helpers(spark):
    """Reference client surface beyond rpm (client __init__.py):
    version, config get/set (spark.burla.* namespace), dashboard URL
    (the Spark web UI)."""
    import burla_spark as b

    assert b.version() == b.__version__
    assert b.set_config("jobJournalDir", "/tmp/j1", spark=spark) == "/tmp/j1"
    assert b.get_config("jobJournalDir", spark=spark) == "/tmp/j1"
    # full-prefix keys are accepted too, and the dict view filters to ours
    b.set_config("spark.burla.streamQueueDepth", "64", spark=spark)
    allconf = b.get_config(spark=spark)
    assert allconf["spark.burla.jobJournalDir"] == "/tmp/j1"
    assert allconf["spark.burla.streamQueueDepth"] == "64"
    # dashboard: UI is disabled in the test profile -> None; with UI on
    # this is the Spark web UI URL
    url = b.get_cluster_dashboard_url(spark=spark)
    assert url is None or url.startswith("http")
    spark.conf.unset("spark.burla.jobJournalDir")
    spark.conf.unset("spark.burla.streamQueueDepth")


def test_worker_flag_scoped_to_rpm_udf(spark):
    """The in-worker marker must not outlive the rpm UDF: python
    workers are REUSED across jobs, so a leaked process-wide flag
    would make a LATER non-rpm UDF in the same worker silently degrade
    its own top-level remote_parallel_map to a worker-local map
    instead of raising the missing-session guidance error."""
    import os as _os

    import pandas as pd

    # during an rpm batch, the flag is visible to user code
    seen = remote_parallel_map(
        lambda _: _os.environ.get("BURLA_SPARK_IN_WORKER"), [0, 1], spark=spark
    )
    assert seen == ["1", "1"]

    # a later, non-rpm UDF running in the (reused) workers must NOT
    # see the flag any more
    def check(batches):
        for b in batches:
            yield pd.DataFrame(
                {"flag": [_os.environ.get("BURLA_SPARK_IN_WORKER", "unset")]
                 * len(b)}
            )

    flags = (
        spark.range(8, numPartitions=4)
        .mapInPandas(check, "flag string")
        .collect()
    )
    assert {r.flag for r in flags} == {"unset"}


@pytest.mark.skipif(
    not os.path.exists("/proc/meminfo"),
    reason="probe is Linux-only (documented: returns None elsewhere)",
)
def test_host_memory_probe_positive(spark):
    """The executor-side /proc/meminfo probe must report positive
    per-host available GiB on Linux (it feeds the repack wave width),
    and repeated calls within the TTL must hit the cache."""
    import burla_spark.rpm as rpm_mod

    rpm_mod._HOST_PROBE_CACHE.clear()
    per_host = rpm_mod._probe_host_available_gb(spark)
    assert per_host and all(v > 0 for v in per_host.values())
    # second call inside the TTL returns the cached dict (no new job)
    assert rpm_mod._probe_host_available_gb(spark) == per_host
    assert len(rpm_mod._HOST_PROBE_CACHE) == 1
