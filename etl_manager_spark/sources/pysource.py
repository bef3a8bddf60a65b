"""Custom Python data source (Spark 4 ``pyspark.sql.datasource`` API) —
the §2.B escape hatch for formats Spark has no built-in reader for
(bespoke log dialects, internal APIs, test-data generators).

The reference's format surface is a fixed set of SerDe templates
(`/root/reference/etl_manager/specs/*_specific.json`); this is the
extensible successor: a DataSource subclass registered on the session
becomes a first-class ``spark.read.format(...)`` — partition planning on
the driver, per-partition generation/IO on executors, schema declared up
front so Catalyst prunes and plans like any scan.

``SynthLogDataSource`` here is a deterministic generator (md5-derived
fields, striped partitions) so the workload that reads it can be
oracle-checked: DuckDB regenerates the identical rows from ``range()``
with the same md5 arithmetic. The partitioning is value-independent
(row i lives in partition i mod P), so results don't depend on the
parallelism chosen.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

LEVELS = ("DEBUG", "INFO", "WARN", "ERROR")


def _row(i: int) -> tuple:
    """The shared generator: every field a pure function of the line id
    (md5 of ``log:i``), reproducible in any engine with md5 + hex."""
    h = hashlib.md5(f"log:{i}".encode()).hexdigest()
    level = LEVELS[int(h[:2], 16) % 4]
    value = (int(h[2:10], 16) % 10000) / 100.0
    return (i, level, value, f"line-{i}")


class SynthLogReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.parts = int(options.get("parts", 4))

    def partitions(self):
        return [InputPartition(p) for p in range(self.parts)]

    def read(self, partition):
        p = partition.value
        for i in range(p, self.rows, self.parts):
            yield _row(i)


class SynthLogStreamReader(SimpleDataSourceStreamReader):
    """Streaming face of the same generator: offsets are line-id
    watermarks ``{"i": next_line}``, each micro-batch serves
    ``batch`` rows, and ``readBetweenOffsets`` replays any committed
    range exactly (md5 generation is stateless) — which is what makes
    the source replayable/exactly-once under checkpoint recovery.

    Note: Spark's Python micro-batch wrapper does not support
    Trigger.AvailableNow (it falls back to ONE batch), so a bounded
    run that must see every row either sets ``batch`` ≥ ``rows`` or
    uses a processing-time trigger until the offset reaches ``rows``."""

    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.batch = int(options.get("batch", self.rows))

    def initialOffset(self):
        return {"i": 0}

    def read(self, start):
        s = start["i"]
        e = min(s + self.batch, self.rows)
        return (iter([_row(i) for i in range(s, e)]), {"i": e})

    def readBetweenOffsets(self, start, end):
        return iter([_row(i) for i in range(start["i"], end["i"])])


class SynthLogDataSource(DataSource):
    """``spark.read.format("synthlog").option("rows", N)`` (batch) or
    ``spark.readStream.format("synthlog")`` (micro-batch stream) after
    ``spark.dataSource.register(SynthLogDataSource)``."""

    @classmethod
    def name(cls):
        return "synthlog"

    def schema(self):
        return "line_id bigint, level string, value double, msg string"

    def reader(self, schema):
        return SynthLogReader(self.options)

    def simpleStreamReader(self, schema):
        return SynthLogStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration on a session."""
    spark.dataSource.register(SynthLogDataSource)


class _FileCommit(WriterCommitMessage):
    """Per-task commit message: the temp file a task wrote and its row
    count (picklable — travels executor → driver)."""

    def __init__(self, filename: str, rows: int):
        self.filename = filename
        self.rows = rows


def _write_task_tmp(path: str, iterator, writer_id: str) -> "_FileCommit":
    """Shared task body for both JSONL sinks: write the task's rows to a
    temp file scoped by the owning writer's id (creating the output
    directory if needed — built-in formats create fresh paths, so must
    we) and return the commit message. One implementation — the batch
    and streaming sinks must never drift on the temp-file protocol.

    ``writer_id`` is chosen once at writer construction on the driver and
    rides the pickled writer to every task, so a commit-time sweep can
    target exactly this write's orphans: two concurrent jobs writing the
    same path (or a batch append racing the streaming sink) never delete
    each other's in-flight task files."""
    import json as _json
    import os as _os
    import uuid

    from pyspark import TaskContext

    _os.makedirs(path, exist_ok=True)
    ctx = TaskContext.get()
    tmp = _os.path.join(
        path, f"_tmp-{writer_id}-{ctx.partitionId()}-{uuid.uuid4().hex}.jsonl"
    )
    n = 0
    with open(tmp, "w") as fh:
        for row in iterator:
            fh.write(_json.dumps(row.asDict()) + "\n")
            n += 1
    return _FileCommit(tmp, n)


def _remove_message_files(messages) -> None:
    """abort() cleanup: PySpark documents that a FAILED task's slot in
    ``messages`` is None — iterating .filename blindly would crash abort
    itself and mask the original task error."""
    import os as _os

    for m in messages:
        if m is None:
            continue
        try:
            _os.remove(m.filename)
        except OSError:
            pass


class JsonlSinkWriter(DataSourceWriter):
    """Custom sink with the real two-phase commit protocol: each task
    writes to a uniquely-named temp file and returns a commit message;
    only the DRIVER's ``commit`` renames temp files to final part files
    and writes the ``_SUCCESS`` manifest — a failed/speculative task's
    temp file is never visible, and ``abort`` removes stragglers. This is
    the same visibility contract as Hadoop output committers, expressed
    through ``pyspark.sql.datasource``."""

    def __init__(self, options, overwrite: bool):
        import uuid

        self.path = options["path"]
        self.overwrite = overwrite
        self.writer_id = uuid.uuid4().hex[:12]

    def write(self, iterator):
        return _write_task_tmp(self.path, iterator, self.writer_id)

    def commit(self, messages):
        import json as _json
        import os as _os
        import uuid

        # mode semantics honored at publish time: overwrite sweeps the
        # previous write's parts (a smaller re-write used to leave stale
        # part files behind); append publishes under unique names so an
        # earlier write's parts are never clobbered
        if self.overwrite:
            for f in _os.listdir(self.path):
                if f.startswith("part-") and f.endswith(".jsonl") or f == "_SUCCESS":
                    try:
                        _os.remove(_os.path.join(self.path, f))
                    except OSError:
                        pass
        run_id = uuid.uuid4().hex[:8]
        total = 0
        published = 0
        for i, m in enumerate(messages):
            if m is None:
                continue
            suffix = "" if self.overwrite else f"-{run_id}"
            final = _os.path.join(self.path, f"part-{i:05d}{suffix}.jsonl")
            _os.replace(m.filename, final)
            total += m.rows
            published += 1
        # sweep losers of speculative/retried attempts: every committed
        # file is renamed by now, so any _tmp-<this writer's id>-* left is
        # an orphan that a bare *.jsonl glob would double-read. Scoped to
        # THIS writer's id in append mode — a concurrent job's in-flight
        # task files (same path, different writer) must survive their own
        # os.replace. Overwrite mode sweeps EVERY _tmp-* instead: the
        # caller declared the dataset replaced, which also reclaims
        # orphans a hard-crashed previous writer (no abort ran) left.
        sweep_prefix = "_tmp-" if self.overwrite else f"_tmp-{self.writer_id}-"
        for f in _os.listdir(self.path):
            if f.startswith(sweep_prefix) and f.endswith(".jsonl"):
                try:
                    _os.remove(_os.path.join(self.path, f))
                except OSError:
                    pass
        with open(_os.path.join(self.path, "_SUCCESS"), "w") as fh:
            fh.write(_json.dumps({"files": published, "rows": total}))

    def abort(self, messages):
        _remove_message_files(messages)


class JsonlSinkDataSource(DataSource):
    """``df.write.format("jsonlsink").option("path", dir).save()`` after
    registration — the custom-sink face of the Python data source API."""

    @classmethod
    def name(cls):
        return "jsonlsink"

    def writer(self, schema, overwrite):
        return JsonlSinkWriter(self.options, overwrite)


def register_sink(spark) -> None:
    spark.dataSource.register(JsonlSinkDataSource)


class JsonlStreamSinkWriter(DataSourceStreamWriter):
    """Streaming face of the JSONL sink: same task-temp-file discipline,
    but the driver commit is PER MICRO-BATCH — each batch publishes its
    files under a ``batch-<id>`` manifest, which is what lets a restarted
    query treat a re-run of an already-committed batchId as a no-op
    (idempotent sink = exactly-once end-to-end when the source replays
    offsets exactly, see SynthLogStreamReader)."""

    def __init__(self, options):
        import uuid

        self.path = options["path"]
        self.writer_id = uuid.uuid4().hex[:12]

    def write(self, iterator):
        return _write_task_tmp(self.path, iterator, self.writer_id)

    def commit(self, messages, batchId):
        import json as _json
        import os as _os

        manifest = _os.path.join(self.path, f"batch-{batchId}.json")
        if _os.path.exists(manifest):  # replayed batch: already published
            _remove_message_files(messages)
            return
        total = 0
        files = []
        for i, m in enumerate(messages):
            if m is None:
                continue
            final = _os.path.join(self.path, f"batch-{batchId}-part-{i:05d}.jsonl")
            _os.replace(m.filename, final)
            files.append(_os.path.basename(final))
            total += m.rows
        with open(manifest, "w") as fh:
            fh.write(_json.dumps({"files": files, "rows": total}))

    def abort(self, messages, batchId):
        _remove_message_files(messages)


class JsonlStreamSinkDataSource(DataSource):
    """``df.writeStream.format("jsonlstreamsink").option("path", dir)``."""

    @classmethod
    def name(cls):
        return "jsonlstreamsink"

    def streamWriter(self, schema, overwrite):
        return JsonlStreamSinkWriter(self.options)


def register_stream_sink(spark) -> None:
    spark.dataSource.register(JsonlStreamSinkDataSource)
