"""Custom Python DataSource (Spark 4 DataSource API): synthetic events. [EXT]

``spark.read.format("synthetic_events")`` — a deterministic,
partition-parallel event generator for load tests and CI fixtures:

    spark.dataSource.register(SyntheticEventsDataSource)
    df = (spark.read.format("synthetic_events")
          .option("rows", 1_000_000).option("partitions", 64).load())

Every field derives from md5(row-index) — no RNG, no state — so any two
reads (any partitioning, any cluster size) produce byte-identical rows:
the same determinism contract as the engine's samplers
(``operators/sampling.py``). Each ``InputPartition`` carries a disjoint
row range; readers never coordinate, so generation scales linearly with
partitions — the Python-DataSource analogue of ``spark.range``'s
slicing. This is also the template for wrapping any record-yielding
Python client (REST pagination, proprietary SDKs) as a first-class scan:
Spark drives partition planning and schema, the reader only yields rows.
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

_EVENT_TYPES = ("view", "click", "purchase", "signup", "error")
_START = datetime(2024, 1, 1)
_STEP_US = 37_000_000  # ~37s between events — several per hour per user


def _h(i: int) -> int:
    return int.from_bytes(hashlib.md5(str(i).encode()).digest()[:8], "big")


class _Range(InputPartition):
    def __init__(self, lo: int, hi: int) -> None:
        self.lo, self.hi = lo, hi


class _Reader(DataSourceReader):
    def __init__(self, options) -> None:
        self.rows = int(options.get("rows", 10_000))
        self.numparts = int(options.get("partitions", 8))
        self.users = int(options.get("users", 500))

    def partitions(self):
        per = -(-self.rows // self.numparts)
        return [
            _Range(lo, min(lo + per, self.rows))
            for lo in range(0, self.rows, per)
        ]

    def read(self, part: _Range):
        users, types = self.users, _EVENT_TYPES
        for i in range(part.lo, part.hi):
            h = _h(i)
            yield (
                i,
                _START + timedelta(microseconds=i * _STEP_US),
                h % users,
                types[(h >> 16) % len(types)],
                ((h >> 24) % 5000) / 100.0,
            )


class _StreamReader(SimpleDataSourceStreamReader):
    """Offset-based streaming face of the same generator.

    The offset is just the next row index (``{"index": n}``): every
    micro-batch emits the next ``rowsPerBatch`` rows, and
    ``readBetweenOffsets`` replays any committed range deterministically
    (the md5 derivation makes replay free — no source-side buffering),
    which is exactly the exactly-once replay contract a real
    offset-tracking source (Kafka, log tail) must honor.
    """

    def __init__(self, options) -> None:
        self.rows_per_batch = int(options.get("rowsPerBatch", 100))
        self.users = int(options.get("users", 500))

    def initialOffset(self) -> dict:
        return {"index": 0}

    def _rows(self, lo: int, hi: int):
        users, types = self.users, _EVENT_TYPES
        for i in range(lo, hi):
            h = _h(i)
            yield (
                i,
                _START + timedelta(microseconds=i * _STEP_US),
                h % users,
                types[(h >> 16) % len(types)],
                ((h >> 24) % 5000) / 100.0,
            )

    def read(self, start: dict):
        lo = start["index"]
        hi = lo + self.rows_per_batch
        # materialized list, not a generator: the runner's prefetch cache
        # copies the returned iterator (copy.copy), which generators
        # cannot survive
        return list(self._rows(lo, hi)), {"index": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return list(self._rows(start["index"], end["index"]))


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return (
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double"
        )

    def reader(self, schema) -> _Reader:
        return _Reader(self.options)

    def simpleStreamReader(self, schema) -> _StreamReader:
        return _StreamReader(self.options)


# ---------------------------------------------------------------------------
# Python DataSource WRITER: a two-phase-commit JSONL sink.
# ---------------------------------------------------------------------------
#
# ``df.write.format("jsonl_sink").option("path", ...).mode("append").save()``
#
# The writer half of the DataSource API — the template for pushing rows
# into any Python-only client (REST POST, proprietary SDK, message bus)
# with Spark's task-retry semantics intact. The contract demonstrated:
#
# - ``write(iterator)`` runs ON THE EXECUTORS, once per partition, and
#   must stage its output somewhere invisible (here: ``_tmp-*`` files; for
#   a REST client, an idempotency-keyed staging call). A retried task
#   stages a SECOND copy; nothing is lost or doubled because only the
#   winning attempt's commit message reaches the driver.
# - ``commit(messages)`` runs on the driver exactly once, after every
#   partition succeeded, and atomically publishes: temp files are renamed
#   to ``part-*`` and a ``_SUCCESS`` manifest lists them (readers treat
#   manifest-less directories as uncommitted).
# - ``abort(messages)`` tears the staging down when any task ultimately
#   fails — the directory is left with no published files.


class _JsonlCommit(WriterCommitMessage):
    def __init__(self, path: str, rows: int) -> None:
        self.path = path
        self.rows = rows


class _JsonlSinkWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_sink requires .option('path', ...)")
        self.overwrite = overwrite

    def write(self, iterator):
        import json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f"_tmp-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _JsonlCommit(path=tmp, rows=n)

    def commit(self, messages) -> None:
        import json
        import os

        if self.overwrite:
            for name in os.listdir(self.path):
                if name.startswith("part-"):
                    os.unlink(os.path.join(self.path, name))
        published = []
        total = 0
        winners = set()
        for m in messages:
            dest = os.path.join(
                self.path, os.path.basename(m.path).replace("_tmp-", "part-")
            )
            os.replace(m.path, dest)
            published.append(os.path.basename(dest))
            winners.add(os.path.basename(m.path))
            total += m.rows
        # Sweep losing-attempt staging: a task retried-then-succeeded leaves
        # its first attempt's _tmp-* file behind (abort() only runs on JOB
        # failure; commit messages name only winning attempts).
        for name in os.listdir(self.path):
            if name.startswith("_tmp-") and name not in winners:
                os.unlink(os.path.join(self.path, name))
        manifest = os.path.join(self.path, "_SUCCESS")
        if self.overwrite:
            # Overwrite deleted prior part-* files — an appended manifest
            # line would keep naming them. Rewrite the manifest to exactly
            # this commit's files.
            with open(manifest, "w") as f:
                f.write(json.dumps({"files": sorted(published), "rows": total}) + "\n")
        else:
            with open(manifest, "a") as f:
                f.write(json.dumps({"files": sorted(published), "rows": total}) + "\n")

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.unlink(m.path)


class JsonlSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonl_sink"

    def writer(self, schema, overwrite: bool) -> _JsonlSinkWriter:
        return _JsonlSinkWriter(self.options, overwrite)
