"""Custom Python data source (Spark 4 ``pyspark.sql.datasource`` API):
a partitioned JSONL reader with driver-side filter pushdown.

Why it exists: the reference ingests arbitrary user-shaped data inside
``remote_parallel_map`` workers; on Spark the idiomatic equivalent for
a format the built-ins don't cover is a DataSource V2 implementation —
partition planning, schema, and pushdown live WITH the source, so
Catalyst can parallelize and prune it like any table instead of the
job hand-rolling splits. This JSONL source is deliberately simple
(newline-delimited JSON, one partition per file) but carries the full
extension surface: ``partitions()`` for split planning,
``pushFilters()`` (Spark 4.1) so equality/comparison predicates are
applied during the scan instead of a post-filter, and schema-declared
typed output.

At 100 TB: partition-per-file parallelizes across the cluster exactly
like the parquet scans; pushdown drops non-matching rows at parse time
(the JSONL is read line-by-line regardless — the win is not shipping
rows that fail the predicate into the query). Register once per
session::

    spark.dataSource.register(JsonlDataSource)
    df = (spark.read.format("burla_jsonl")
          .schema("doc_id long, text string")
          .option("path", "/data/docs").load())
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    Filter,
    GreaterThan,
    InputPartition,
    LessThan,
    WriterCommitMessage,
)


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _matches(row: dict, pushed: list[tuple[str, str, object]]) -> bool:
    for col, op, val in pushed:
        have = row.get(col)
        if have is None:
            return False
        if op == "=" and not have == val:
            return False
        if op == ">" and not have > val:
            return False
        if op == "<" and not have < val:
            return False
    return True


class JsonlReader(DataSourceReader):
    def __init__(self, schema, options):
        path = options.get("path")
        if not path:
            raise ValueError("burla_jsonl requires .option('path', ...)")
        self._dir = path
        self._fields = [f.name for f in schema.fields]
        self._pushed: list[tuple[str, str, object]] = []

    # -- driver-side planning -------------------------------------------
    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Accept simple comparisons on top-level attributes; everything
        else is returned for Spark to evaluate post-scan (the contract:
        yield the filters you do NOT handle)."""
        for f in filters:
            if isinstance(f, EqualTo) and len(f.attribute) == 1:
                self._pushed.append((f.attribute[0], "=", f.value))
            elif isinstance(f, GreaterThan) and len(f.attribute) == 1:
                self._pushed.append((f.attribute[0], ">", f.value))
            elif isinstance(f, LessThan) and len(f.attribute) == 1:
                self._pushed.append((f.attribute[0], "<", f.value))
            else:
                yield f

    def partitions(self) -> list[InputPartition]:
        files = sorted(
            os.path.join(self._dir, f)
            for f in os.listdir(self._dir)
            if f.endswith((".jsonl", ".json")) and not f.startswith("_")
        )  # underscore-prefixed = uncommitted/staged (Hadoop convention)
        if not files:
            raise FileNotFoundError(f"no .jsonl files under {self._dir}")
        return [_FilePartition(p) for p in files]

    # -- executor-side scan ---------------------------------------------
    def read(self, partition: _FilePartition):
        fields, pushed = self._fields, self._pushed
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                row = json.loads(line)
                if not _matches(row, pushed):
                    continue
                yield tuple(row.get(name) for name in fields)


class JsonlDataSource(DataSource):
    """``format("burla_jsonl")`` — newline-delimited JSON over a
    directory, one partition per file, comparison pushdown."""

    @classmethod
    def name(cls) -> str:
        return "burla_jsonl"

    def schema(self) -> str:
        # schema must come from the caller (.schema(...)); a default
        # single-column passthrough keeps schemaless exploration usable
        return "value string"

    def reader(self, schema) -> JsonlReader:
        return JsonlReader(schema, self.options)

    def writer(self, schema, overwrite: bool) -> "JsonlWriter":
        return JsonlWriter(schema, self.options, overwrite)


class _StagedFile(WriterCommitMessage):
    def __init__(self, path: str):
        self.path = path


class JsonlWriter(DataSourceWriter):
    """Transactional JSONL sink — the two-phase commit every real
    connector needs: each task writes its rows to a STAGED file named
    by a random token (executor-side ``write``), and only the driver's
    ``commit`` renames the staged files to visible ``part-*.jsonl``
    names once every task has succeeded. A reader never sees a partial
    job: failed/duplicate task attempts leave only staged files, which
    ``abort`` (or the next overwrite) sweeps. Speculative/retried
    attempts stage under distinct tokens and only the committed
    attempt's message gets renamed — exactly-once output from
    at-least-once task execution, the same contract as the
    foreachBatch upsert's pointer flip."""

    def __init__(self, schema, options, overwrite: bool):
        path = options.get("path")
        if not path:
            raise ValueError("burla_jsonl requires .option('path', ...)")
        self._dir = path
        self._fields = [f.name for f in schema.fields]
        self._overwrite = overwrite

    def write(self, iterator) -> _StagedFile:
        import uuid

        os.makedirs(self._dir, exist_ok=True)
        staged = os.path.join(self._dir, f"_staged-{uuid.uuid4().hex}")
        with open(staged, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(
                    json.dumps({k: row[k] for k in self._fields}) + "\n"
                )
        return _StagedFile(staged)

    def commit(self, messages) -> None:
        if self._overwrite:
            base = 0
            for f in os.listdir(self._dir):
                if f.startswith("part-") and f.endswith(".jsonl"):
                    os.remove(os.path.join(self._dir, f))
        else:
            # append mode: committed names must never collide with a
            # previous job's part files — start numbering past the
            # highest existing index instead of clobbering from 0
            existing = [
                f
                for f in os.listdir(self._dir)
                if f.startswith("part-") and f.endswith(".jsonl")
            ]
            base = 1 + max(
                (int(f[len("part-") : -len(".jsonl")]) for f in existing),
                default=-1,
            )
        for i, msg in enumerate(messages):
            os.replace(
                msg.path, os.path.join(self._dir, f"part-{base + i:05d}.jsonl")
            )

    def abort(self, messages) -> None:
        for msg in messages:
            if msg is not None:
                try:
                    os.remove(msg.path)
                except OSError:
                    pass
