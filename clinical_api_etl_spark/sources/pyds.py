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
    InputPartition,
    SimpleDataSourceStreamReader,
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
