"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API) —
the engine's extension point for sources Spark has no built-in reader
for (internal services, proprietary formats, synthetic generators).

The reference's analogue is reading arbitrary data inside RPM UDFs
(its flagship example streams parquet shards into workers,
`README.md:146`); a DataSource moves that code under the scan node so
Catalyst sees a real relation: partition count drives parallelism,
the schema is declared, and everything downstream (pruning, AQE)
applies.

``SyntheticEventsDataSource`` generates deterministic synthetic event
rows — partitioned, seeded per partition, no driver-side data: each
task materializes only its own slice, which is the pattern any custom
connector (API pagination, kafka-like offsets, shard lists) follows at
scale.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def _mix64(x: int) -> int:
    """splitmix64 — deterministic per-row randomness without RNG state."""
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 8))
        self.seed = int(options.get("seed", 42))

    def partitions(self):
        return [InputPartition(i) for i in range(self.n_parts)]

    def read(self, partition):
        pid = partition.value
        lo = self.n_rows * pid // self.n_parts
        hi = self.n_rows * (pid + 1) // self.n_parts
        for i in range(lo, hi):
            h = _mix64(self.seed * 0x100000001 + i)
            yield (
                i,
                h % 1000,
                _EVENT_TYPES[(h >> 10) % len(_EVENT_TYPES)],
                round(((h >> 16) % 10000) / 100.0, 2),
            )


class SyntheticEventsDataSource(DataSource):
    """spark.read.format("synthetic_events").option("rows", N)..."""

    @classmethod
    def name(cls):
        return "synthetic_events"

    def schema(self):
        return "event_id long, user_id long, event_type string, value double"

    def reader(self, schema):
        return SyntheticEventsReader(self.options)

    def streamReader(self, schema):
        return SyntheticEventsStreamReader(self.options)


class _RangePartition(InputPartition):
    def __init__(self, lo: int, hi: int):
        self.lo, self.hi = lo, hi


class SyntheticEventsStreamReader(DataSourceStreamReader):
    """Streaming twin of the batch reader — the full custom-source
    micro-batch protocol: ``initialOffset`` → ``latestOffset`` advance
    per trigger → ``partitions(start, end)`` split planning →
    executor-side ``read`` → ``commit`` when the batch is durable.
    Offsets are just row counts here, but the shape is exactly a
    kafka-like connector's (monotonic positions, planned slices,
    deterministic replay of any [start, end) on retry — rows derive
    from splitmix64(seed, i), so a replayed batch is bit-identical,
    which is what makes the source exactly-once under retries).

    ``rows_per_batch`` bounds each micro-batch; ``max_rows`` bounds the
    stream so availableNow replays terminate."""

    def __init__(self, options):
        self.max_rows = int(options.get("maxRows", 1000))
        self.rows_per_batch = int(options.get("rowsPerBatch", 100))
        self.n_parts = int(options.get("partitions", 4))
        self.seed = int(options.get("seed", 42))
        self._pos = 0  # last offset this reader ADVERTISED (not committed:
        # commit() timing varies by sink; advancing on advertise is the
        # standard rate-source pattern and replay stays deterministic)
        self._committed = 0

    def initialOffset(self):
        return {"pos": 0}

    def latestOffset(self):
        # advance from the furthest position SPARK has shown us
        # (checkpointed starts via partitions(), durable ends via
        # commit()) — a fresh reader after a checkpoint restart must
        # not advertise below the committed start (in-memory _pos
        # alone restarts at 0 and would break exactly-once)
        base = max(self._pos, self._committed)
        self._pos = min(base + self.rows_per_batch, self.max_rows)
        return {"pos": self._pos}

    def partitions(self, start, end):
        lo, hi = start["pos"], end["pos"]
        # rehydrate the cursor from the engine-supplied offsets; if a
        # restarted run's first advertise trailed the checkpointed
        # start, clamp to an EMPTY batch rather than re-reading rows
        # before `start` (replay of committed rows = duplicates)
        self._pos = max(self._pos, lo, hi)
        hi = max(lo, hi)
        span = max(1, (hi - lo + self.n_parts - 1) // self.n_parts)
        return [
            _RangePartition(p, min(p + span, hi))
            for p in range(lo, hi, span)
        ]

    def read(self, partition):
        for i in range(partition.lo, partition.hi):
            h = _mix64(self.seed * 0x100000001 + i)
            yield (
                i,
                h % 1000,
                _EVENT_TYPES[(h >> 10) % len(_EVENT_TYPES)],
                round(((h >> 16) % 10000) / 100.0, 2),
            )

    def commit(self, end):
        self._committed = max(self._committed, end["pos"])
        self._pos = max(self._pos, self._committed)


def register(spark) -> None:
    spark.dataSource.register(SyntheticEventsDataSource)
