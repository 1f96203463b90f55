"""XML table source/sink on the Python DataSource API — pure stdlib. [EXT]

Clinical data exchange is XML-heavy (CDA documents, lab exports), and the
reference's ecosystem ingests CSV precisely because nothing richer was
wired up; this connector adds a first-class XML table format next to the
Avro OCF / ORC / JSONL sources, with zero dependencies beyond
``xml.etree`` (the container ships no lxml/spark-xml — same constraint
that motivated the stdlib Avro implementation, ``sources/avro.py``).

File layout: a table is a directory of ``part-*.xml`` files, each

    <table>
      <row><c n="doc_id">7</c><c n="text">hello &amp; bye</c></row>
      <row><c n="value" null="true"/> ... </row>
    </table>

* Escaping, unicode and embedded newlines are ElementTree's problem —
  round-trip is exact by construction.
* NULLs are explicit (``null="true"``) so empty string and NULL stay
  distinct.
* Timestamps follow the Avro-source discipline: Spark hands the Python
  writer naive SESSION-LOCAL datetimes — ``astimezone(timezone.utc)``
  on write, aware-UTC return on read, so values round-trip exactly
  under any session timezone.
* Reads are split-parallel at FILE granularity (one InputPartition per
  part file — readers never coordinate; at scale, many part files =
  many parallel tasks, the JSONL-source posture).
* Reading an empty/part-free directory with a supplied schema is an
  EMPTY SCAN, not an error (ADVICE r06 avro lesson).
* Overwrite commit renames uuid-named winners FIRST, then deletes stale
  parts — a crash mid-commit leaves old+new coexisting (re-runnable),
  never data loss (same ordering as the Avro sink).

Supported field types: long/int, double/float, string, boolean,
timestamp. The reader requires an explicit schema (XML carries no type
metadata worth trusting; the caller owns the contract).
"""

from __future__ import annotations

import base64
import os
import re
import uuid
import xml.etree.ElementTree as ET
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

#: Characters representable in XML 1.0 element text. \x0D is EXCLUDED on
#: purpose: XML parsers normalize \r and \r\n to \n, which would silently
#: corrupt a round-trip — strings containing \r take the base64 path too.
_XML_OK = re.compile(
    "^[\x09\x0A\x20-\uD7FF\uE000-\uFFFD\U00010000-\U0010FFFF]*$"
)


def _encode(value, dtype: str) -> str:
    if dtype == "timestamp":
        # naive session-local in, aware UTC out (the avro.py discipline)
        return value.astimezone(timezone.utc).strftime(_TS_FMT)
    if dtype == "boolean":
        return "true" if value else "false"
    return str(value)


def _decode(text: str, dtype: str):
    if dtype in ("bigint", "int", "long", "integer", "smallint", "tinyint"):
        return int(text)
    if dtype in ("double", "float"):
        return float(text)
    if dtype == "boolean":
        return text == "true"
    if dtype == "timestamp":
        return datetime.strptime(text, _TS_FMT)
    return text


class _FilePart(InputPartition):
    def __init__(self, path: str | None) -> None:
        self.path = path


class _XmlReader(DataSourceReader):
    def __init__(self, options, schema) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("xmltable requires a path")
        self.fields = [(f.name, f.dataType.simpleString()) for f in schema]

    def partitions(self):
        try:
            names = sorted(
                n
                for n in os.listdir(self.path)
                if n.startswith("part-") and n.endswith(".xml")
            )
        except FileNotFoundError:
            raise ValueError(f"xmltable path does not exist: {self.path}")
        if not names:
            # empty table directory == empty scan (sentinel partition:
            # Spark requires at least one partition object).
            return [_FilePart(None)]
        return [_FilePart(os.path.join(self.path, n)) for n in names]

    def read(self, part: _FilePart):
        if part.path is None:
            return
        tree = ET.parse(part.path)
        for row in tree.getroot().iter("row"):
            cells = {c.get("n"): c for c in row.iter("c")}
            out = []
            for name, dtype in self.fields:
                c = cells.get(name)
                if c is None or c.get("null") == "true":
                    out.append(None)
                else:
                    text = c.text or ""
                    if c.get("e") == "b":
                        text = base64.b64decode(text).decode(
                            "utf-8", "surrogatepass"
                        )
                    out.append(_decode(text, dtype))
            yield tuple(out)


class _XmlCommit(WriterCommitMessage):
    def __init__(self, path: str | None) -> None:
        self.path = path


class _XmlWriter(DataSourceWriter):
    def __init__(self, options, schema, overwrite: bool) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("xmltable requires a path")
        self.fields = [(f.name, f.dataType.simpleString()) for f in schema]
        self.overwrite = overwrite

    def write(self, iterator):
        os.makedirs(self.path, exist_ok=True)
        root = ET.Element("table")
        n = 0
        for row in iterator:
            r = ET.SubElement(root, "row")
            for (name, dtype), value in zip(self.fields, row):
                c = ET.SubElement(r, "c", n=name)
                if value is None:
                    c.set("null", "true")
                else:
                    text = _encode(value, dtype)
                    if _XML_OK.match(text):
                        c.text = text
                    else:
                        # control chars / lone surrogates / \r cannot
                        # survive XML 1.0 text — base64 fallback, flagged
                        c.set("e", "b")
                        c.text = base64.b64encode(
                            text.encode("utf-8", "surrogatepass")
                        ).decode("ascii")
            n += 1
        if n == 0:
            return _XmlCommit(None)
        tmp = os.path.join(self.path, f"_tmp-{uuid.uuid4().hex}.xml")
        ET.ElementTree(root).write(tmp, encoding="utf-8", xml_declaration=True)
        return _XmlCommit(tmp)

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
                    and name.endswith(".xml")
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


class _XmlStreamReader(SimpleDataSourceStreamReader):
    """Drop-folder tail for XML tables (the avro_ocf streaming face):
    offset = the SET of consumed file names; each micro-batch emits the
    not-yet-seen part files in sorted order, and readBetweenOffsets
    replays exactly the set difference — deterministic exactly-once
    under Spark's commit log. read() must return an ITERATOR over a
    MATERIALIZED list (the runner's prefetch cache probes with next()
    and copy.copy's the iterator — the round-10 pyds lesson)."""

    def __init__(self, options, schema) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("xmltable requires a path")
        self.fields = [(f.name, f.dataType.simpleString()) for f in schema]

    def initialOffset(self) -> dict:
        return {"seen": []}

    def _rows_for(self, names):
        rdr = _XmlReader.__new__(_XmlReader)
        rdr.path, rdr.fields = self.path, self.fields
        out = []
        for n in sorted(names):
            p = os.path.join(self.path, n)
            if os.path.exists(p):
                out.extend(rdr.read(_FilePart(p)))
        return out

    def _have(self):
        try:
            return {
                n
                for n in os.listdir(self.path)
                if n.startswith("part-") and n.endswith(".xml")
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


class XmlTableDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "xmltable"

    def schema(self):
        raise ValueError(
            "xmltable requires an explicit schema on read "
            "(.schema('doc_id long, text string')): XML carries no "
            "trustworthy type metadata"
        )

    def reader(self, schema) -> _XmlReader:
        return _XmlReader(self.options, schema)

    def writer(self, schema, overwrite: bool) -> _XmlWriter:
        return _XmlWriter(self.options, schema, overwrite)

    def simpleStreamReader(self, schema) -> _XmlStreamReader:
        return _XmlStreamReader(self.options, schema)
