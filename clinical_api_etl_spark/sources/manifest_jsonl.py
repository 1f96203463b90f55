"""Manifest-committed JSONL sink/source (Python DataSource writer). [EXT]

The write side of the custom-DataSource story (``sources/pyds.py`` is the
read side): tasks write part files under unique names and return commit
messages; only the DRIVER's ``commit`` publishes them by writing
``_manifest.json`` — readers list the manifest, never the directory. That
is the snapshot-commit contract of ``sources/snapshots.py`` reduced to
its minimum: torn writes are invisible (no manifest entry), aborted
attempts leave only unreferenced temp files, and appends replace the
manifest atomically (write-temp + rename).

Scope: flat schemas of atomic types (long/double/string/boolean) — the
JSONL interchange subset; nested/binary data belongs in parquet.

    df.write.format("manifest_jsonl").mode("append").save(path)
    spark.read.format("manifest_jsonl").schema(ddl).load(path)
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

_MANIFEST = "_manifest.json"


class _Committed(WriterCommitMessage):
    def __init__(self, filename: str, rows: int) -> None:
        self.filename, self.rows = filename, rows


class _Writer(DataSourceWriter):
    def __init__(self, path: str, columns: list[str], overwrite: bool) -> None:
        if not path:
            raise ValueError("manifest_jsonl requires a path")
        self.path, self.columns, self.overwrite = path, columns, overwrite

    def write(self, iterator) -> _Committed:
        os.makedirs(self.path, exist_ok=True)
        name = f"part-{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(self.path, name), "w") as f:
            for row in iterator:
                f.write(json.dumps(dict(zip(self.columns, row))) + "\n")
                n += 1
        return _Committed(name, n)

    def commit(self, messages) -> None:
        manifest = {"files": [], "rows": 0}
        mpath = os.path.join(self.path, _MANIFEST)
        if not self.overwrite and os.path.exists(mpath):
            with open(mpath) as f:
                manifest = json.load(f)
        for m in messages:
            if m.rows:
                manifest["files"].append({"name": m.filename, "rows": m.rows})
                manifest["rows"] += m.rows
        tmp = mpath + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, mpath)  # atomic publish

    def abort(self, messages) -> None:
        for m in messages:
            try:
                os.remove(os.path.join(self.path, m.filename))
            except OSError:
                pass


class _FilePart(InputPartition):
    def __init__(self, name: str) -> None:
        self.name = name


class _Reader(DataSourceReader):
    def __init__(self, path: str, schema) -> None:
        self.path = path
        self.fields = [(f.name, f.dataType.simpleString()) for f in schema.fields]

    def partitions(self):
        with open(os.path.join(self.path, _MANIFEST)) as f:
            manifest = json.load(f)
        return [_FilePart(e["name"]) for e in manifest["files"]] or [
            _FilePart("")
        ]

    def read(self, part: _FilePart):
        if not part.name:
            return
        casts = {
            "bigint": int, "int": int, "double": float, "float": float,
            "string": str, "boolean": bool,
        }
        with open(os.path.join(self.path, part.name)) as f:
            for line in f:
                rec = json.loads(line)
                yield tuple(
                    None if rec.get(n) is None else casts.get(t, str)(rec[n])
                    for n, t in self.fields
                )


class ManifestJsonlDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "manifest_jsonl"

    def schema(self) -> str:
        raise NotImplementedError(
            "manifest_jsonl reads need an explicit .schema(ddl) — schema "
            "inference over JSONL is the anti-pattern sources/jsonl.py "
            "exists to prevent"
        )

    def reader(self, schema) -> _Reader:
        return _Reader(self.options.get("path"), schema)

    def writer(self, schema, overwrite: bool) -> _Writer:
        return _Writer(
            self.options.get("path"), [f.name for f in schema.fields], overwrite
        )
