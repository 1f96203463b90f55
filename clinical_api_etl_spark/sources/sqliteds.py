"""SQLite table source/sink on the Python DataSource API — pure stdlib. [EXT]

Clinical datasets ship as SQLite files constantly (REDCap exports, device
logs, SQLite-backed registries), and the stdlib ``sqlite3`` module makes a
zero-dependency connector possible next to the Avro OCF / XML / ORC /
JSONL sources. Two shapes are supported:

* **Directory table** (``path`` is a directory): the layout convention of
  the sibling sources — ``part-*.db`` files, each holding the same table;
  writers emit one part per task (SQLite's single-writer lock makes a
  shared file an anti-pattern under parallel tasks), the commit renames
  uuid-named winners FIRST and deletes stale parts after (the Avro/XML
  crash-safe ordering), and an empty directory with a supplied schema is
  an empty scan.
* **Single-file interop** (``path`` is a ``.db``/``.sqlite`` file): the
  "someone handed us a SQLite export" case — read-only, split-parallel by
  ROWID ranges (``splits`` option, default 4): planning reads MIN/MAX
  rowid once, each task scans ``rowid BETWEEN lo AND hi``, so a big
  export parallelizes without any reader coordination. (WITHOUT ROWID
  tables are not supported — ordinary tables all carry rowid.)

Type mapping (explicit read schema required — SQLite type affinity is
advisory, the caller owns the contract): long/int ↔ INTEGER, double ↔
REAL, string ↔ TEXT, binary ↔ BLOB, boolean ↔ INTEGER 0/1, timestamp ↔
TEXT in aware-UTC ISO format (Spark hands Python writers naive
session-local datetimes — ``astimezone(timezone.utc)`` on write,
aware-UTC return on read, the avro.py discipline, so values round-trip
exactly under any session timezone).

A drop-folder streaming face mirrors the XML source: offsets are the
consumed part-file name set; ``read`` returns an iterator over a
materialized list (the round-10 prefetch-cache rule).
"""

from __future__ import annotations

import os
import sqlite3
import uuid
from datetime import datetime, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

_TS_FMT = "%Y-%m-%dT%H:%M:%S.%f%z"

_SQL_TYPES = {
    "bigint": "INTEGER",
    "int": "INTEGER",
    "smallint": "INTEGER",
    "tinyint": "INTEGER",
    "boolean": "INTEGER",
    "double": "REAL",
    "float": "REAL",
    "string": "TEXT",
    "timestamp": "TEXT",
    "binary": "BLOB",
}


def _encode(value, dtype: str):
    if value is None:
        return None
    if dtype == "timestamp":
        return value.astimezone(timezone.utc).strftime(_TS_FMT)
    if dtype == "boolean":
        return 1 if value else 0
    if dtype == "binary":
        return sqlite3.Binary(bytes(value))
    return value


def _decode(value, dtype: str):
    if value is None:
        return None
    if dtype in ("bigint", "int", "long", "integer", "smallint", "tinyint"):
        return int(value)
    if dtype in ("double", "float"):
        return float(value)
    if dtype == "boolean":
        return bool(value)
    if dtype == "timestamp":
        return datetime.strptime(value, _TS_FMT)
    if dtype == "binary":
        return bytes(value)
    return value


def _is_file_table(path: str) -> bool:
    return os.path.isfile(path)


def _part_files(path: str) -> list[str]:
    names = sorted(
        n
        for n in os.listdir(path)
        if n.startswith("part-") and n.endswith(".db")
    )
    return [os.path.join(path, n) for n in names]


class _RowidRange(InputPartition):
    def __init__(self, path: str | None, lo: int = 0, hi: int = 0) -> None:
        self.path = path
        self.lo = lo
        self.hi = hi


class _SqliteReader(DataSourceReader):
    def __init__(self, options, schema) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("sqlitetable requires a path")
        self.table = options.get("table", "data")
        self.splits = int(options.get("splits", "4"))
        self.fields = [(f.name, f.dataType.simpleString()) for f in schema]

    def _ranges(self, path: str) -> list[_RowidRange]:
        con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
        try:
            lo, hi = con.execute(
                f'SELECT MIN(rowid), MAX(rowid) FROM "{self.table}"'
            ).fetchone()
        finally:
            con.close()
        if lo is None:
            return []
        n = max(1, self.splits)
        width = (hi - lo + n) // n
        return [
            _RowidRange(path, a, min(a + width - 1, hi))
            for a in range(lo, hi + 1, max(width, 1))
        ]

    def partitions(self):
        if _is_file_table(self.path):
            parts = self._ranges(self.path)
            return parts or [_RowidRange(None)]
        try:
            files = _part_files(self.path)
        except FileNotFoundError:
            raise ValueError(
                f"sqlitetable path does not exist: {self.path}"
            )
        if not files:
            # empty table directory == empty scan (sentinel partition)
            return [_RowidRange(None)]
        # one partition per part file: parts were written task-sized, so
        # file granularity is the natural parallelism (JSONL posture);
        # rowid splitting is the single-file interop path's job.
        return [_RowidRange(p, 1, 1 << 62) for p in files]

    def read(self, part: _RowidRange):
        if part.path is None:
            return
        cols = ", ".join(f'"{n}"' for n, _ in self.fields)
        con = sqlite3.connect(f"file:{part.path}?mode=ro", uri=True)
        try:
            cur = con.execute(
                f'SELECT {cols} FROM "{self.table}"'
                " WHERE rowid BETWEEN ? AND ? ORDER BY rowid",
                (part.lo, part.hi),
            )
            for row in cur:
                yield tuple(
                    _decode(v, dt) for v, (_, dt) in zip(row, self.fields)
                )
        finally:
            con.close()


class _SqliteCommit(WriterCommitMessage):
    def __init__(self, path: str | None) -> None:
        self.path = path


class _SqliteWriter(DataSourceWriter):
    def __init__(self, options, schema, overwrite: bool) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("sqlitetable requires a path")
        if _is_file_table(self.path):
            raise ValueError(
                "sqlitetable writes a DIRECTORY of part-*.db files "
                "(SQLite's single-writer lock forbids parallel tasks "
                "sharing one file); got an existing file"
            )
        self.table = options.get("table", "data")
        self.fields = [(f.name, f.dataType.simpleString()) for f in schema]
        self.overwrite = overwrite

    def write(self, iterator):
        os.makedirs(self.path, exist_ok=True)
        rows = [
            tuple(_encode(v, dt) for v, (_, dt) in zip(row, self.fields))
            for row in iterator
        ]
        if not rows:
            return _SqliteCommit(None)
        tmp = os.path.join(self.path, f"_tmp-{uuid.uuid4().hex}.db")
        con = sqlite3.connect(tmp)
        try:
            ddl = ", ".join(
                f'"{n}" {_SQL_TYPES.get(dt, "TEXT")}' for n, dt in self.fields
            )
            con.execute(f'CREATE TABLE "{self.table}" ({ddl})')
            ph = ", ".join("?" for _ in self.fields)
            con.executemany(
                f'INSERT INTO "{self.table}" VALUES ({ph})', rows
            )
            con.commit()
        finally:
            con.close()
        return _SqliteCommit(tmp)

    def commit(self, messages) -> None:
        # winners first, stale deletes after (avro.py ordering)
        winners, winner_parts = set(), set()
        for m in messages:
            if m is None or m.path is None:
                continue
            dest = os.path.basename(m.path).replace("_tmp-", "part-")
            os.replace(m.path, os.path.join(self.path, dest))
            winners.add(os.path.basename(m.path))
            winner_parts.add(dest)
        if self.overwrite:
            for name in os.listdir(self.path):
                if (
                    name.startswith("part-")
                    and name.endswith(".db")
                    and name not in winner_parts
                ):
                    os.unlink(os.path.join(self.path, name))
        for name in os.listdir(self.path):
            if name.startswith("_tmp-") and name not in winners:
                os.unlink(os.path.join(self.path, name))

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and m.path and os.path.exists(m.path):
                os.unlink(m.path)


class _SqliteStreamReader(SimpleDataSourceStreamReader):
    """Drop-folder tail for SQLite part directories (the XML/Avro
    streaming face): offset = the consumed part-file name set."""

    def __init__(self, options, schema) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("sqlitetable requires a path")
        self.table = options.get("table", "data")
        self.fields = [(f.name, f.dataType.simpleString()) for f in schema]

    def initialOffset(self) -> dict:
        return {"seen": []}

    def _rows_for(self, names):
        rdr = _SqliteReader.__new__(_SqliteReader)
        rdr.path, rdr.table, rdr.fields = self.path, self.table, self.fields
        rdr.splits = 1
        out = []
        for n in sorted(names):
            p = os.path.join(self.path, n)
            if os.path.exists(p):
                out.extend(rdr.read(_RowidRange(p, 1, 1 << 62)))
        return out

    def _have(self):
        try:
            return {
                n
                for n in os.listdir(self.path)
                if n.startswith("part-") and n.endswith(".db")
            }
        except FileNotFoundError:
            return set()

    def read(self, start: dict):
        seen = set(start.get("seen", []))
        have = self._have()
        new = sorted(have - seen)
        return iter(self._rows_for(new)), {"seen": sorted(have | seen)}

    def readBetweenOffsets(self, start: dict, end: dict):
        new = set(end.get("seen", [])) - set(start.get("seen", []))
        return iter(self._rows_for(sorted(new)))


class SqliteTableDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "sqlitetable"

    def schema(self):
        raise ValueError(
            "sqlitetable requires an explicit schema on read "
            "(.schema('doc_id long, text string')): SQLite type affinity "
            "is advisory, the caller owns the contract"
        )

    def reader(self, schema) -> _SqliteReader:
        return _SqliteReader(self.options, schema)

    def writer(self, schema, overwrite: bool) -> _SqliteWriter:
        return _SqliteWriter(self.options, schema, overwrite)

    def simpleStreamReader(self, schema) -> _SqliteStreamReader:
        return _SqliteStreamReader(self.options, schema)
