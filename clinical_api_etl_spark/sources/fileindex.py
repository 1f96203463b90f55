"""File-level min/max skipping index over vanilla parquet. [EXT]

Row-group statistics (``sources/layout.py``) prune WITHIN a file the scan
already opened; at 100 TB the bigger lever is never listing the file at
all. Iceberg manifests and the Delta log both carry per-file column
min/max for exactly this reason: the planner intersects the predicate
with file-level ranges and hands the executors only the surviving files.

This module is that manifest for plain parquet directories:

- :func:`build_file_index` reads ONLY parquet footers (metadata-scale:
  a few KB per file regardless of file size) and writes a JSON sidecar
  ``_file_index.json`` with per-file row counts, byte sizes, and per-column
  [min, max] + null counts. Footer reads fan out through
  ``sc.parallelize(files)`` when a SparkSession is supplied — at millions
  of files the index build is itself a distributed job, exactly how
  Iceberg compiles manifests — and run driver-side otherwise.
- :func:`prune` intersects conjunctive closed ranges ``{col: (lo, hi)}``
  — and, when the index carries Bloom bitmaps (``bloom_columns``),
  equality predicates ``{col: value}`` — with the index and returns the
  surviving file list. Files with no usable stats for a referenced
  column are KEPT (pruning must be conservative); all-null files are
  skipped for range predicates (SQL range semantics never match NULL).
  Blooms are the equality complement to min/max: point lookups on
  high-cardinality or unclustered columns rarely prune on ranges, but a
  512 B distinct-value bitmap per file answers "definitely absent" with
  zero false negatives — parquet's own column blooms, hoisted to file
  granularity the way Iceberg puts them in manifests.
- :func:`read_pruned` loads the surviving files and re-applies the
  predicate as a real Filter — file stats are necessary, not sufficient,
  so the residual filter stays (and pushes into the row-group stats of
  the files that do get read, stacking both pruning levels).

The index is advisory: a stale sidecar can only over-include files that
were compacted away (read error surfaces loudly) or miss new files —
rebuild after layout changes, as with any manifest. Works best on data
written by ``layout.write_clustered`` / ``write_zordered``, which make
per-file ranges tight.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

INDEX_NAME = "_file_index.json"

#: Parquet physical types whose min/max round-trip through JSON losslessly.
_INDEXABLE = (int, float, str, bool)

#: Default Bloom geometry: 4096 bits (512 B/column/file), 3 probes. At 500
#: distinct values per file the false-positive rate is ~5% — a false
#: positive only costs reading one extra file, never a wrong answer.
_BLOOM_BITS = 4096
_BLOOM_K = 3


def _bloom_slots(value: Any, bits: int, k: int) -> list[int]:
    """Deterministic md5-derived probe slots for one value.

    Values hash through their string form prefixed with the JSON type tag
    so ``1`` (int) and ``"1"`` (str) occupy different slots — the same
    convention on build and probe.
    """
    import hashlib

    tag = type(value).__name__
    h = hashlib.md5(f"{tag}:{value}".encode()).hexdigest()
    return [int(h[8 * i : 8 * i + 8], 16) % bits for i in range(k)]


def _file_bloom(
    file_path: str, bloom_columns: list[str], bits: int, k: int
) -> dict[str, str]:
    """Per-column Bloom bitmap (hex string) over a file's DISTINCT values.

    Unlike the footer stats this reads the indexed columns' data pages —
    the inherent cost of distinct-value indexes (parquet's own bloom
    writers pay it at write time). Column pruning keeps it one column per
    read; NULLs are excluded (equality never matches NULL).
    """
    import pyarrow.parquet as pq

    out: dict[str, str] = {}
    available = None
    for c in bloom_columns:
        if available is None:
            available = set(pq.ParquetFile(file_path).schema_arrow.names)
        if c not in available:
            continue
        tbl = pq.read_table(file_path, columns=[c])
        bitmap = 0
        for v in tbl.column(c).drop_null().unique().to_pylist():
            if not isinstance(v, _INDEXABLE):
                break
            for s in _bloom_slots(v, bits, k):
                bitmap |= 1 << s
        else:
            out[c] = f"{bitmap:x}"
    return out


def _footer_stats(file_path: str, columns: list[str]) -> dict[str, Any]:
    """Per-file stats from the parquet footer only (no data pages read)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(file_path).metadata
    names = {md.schema.column(i).name: i for i in range(md.num_columns)}
    cols: dict[str, Any] = {}
    for c in columns:
        ci = names.get(c)
        if ci is None:
            continue
        mn: Any = None
        mx: Any = None
        nulls = 0
        usable = True
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            if st is None:
                usable = False
                break
            nulls += st.null_count or 0
            if not st.has_min_max:
                # All-null row group: contributes no range.
                continue
            lo, hi = st.min, st.max
            if not isinstance(lo, _INDEXABLE) or not isinstance(hi, _INDEXABLE):
                usable = False
                break
            mn = lo if mn is None or lo < mn else mn
            mx = hi if mx is None or hi > mx else mx
        if usable:
            cols[c] = {"min": mn, "max": mx, "nulls": nulls}
    return {
        "path": file_path,
        "rows": md.num_rows,
        "bytes": os.path.getsize(file_path),
        "columns": cols,
    }


def _entry(
    file_path: str,
    columns: list[str],
    bloom_columns: list[str],
    bits: int,
    k: int,
) -> dict[str, Any]:
    e = _footer_stats(file_path, columns)
    if bloom_columns:
        e["bloom"] = _file_bloom(file_path, bloom_columns, bits, k)
    return e


def build_file_index(
    data_path: str,
    columns: list[str],
    *,
    spark: SparkSession | None = None,
    bloom_columns: list[str] | None = None,
    bloom_bits: int = _BLOOM_BITS,
    bloom_k: int = _BLOOM_K,
) -> dict[str, Any]:
    """Index every ``*.parquet`` under ``data_path`` and write the sidecar.

    With ``spark`` the footer reads run as a distributed job (one task per
    slice of the file list); without, driver-side. Both produce the same
    index — without blooms the executors only ever read footers.

    ``bloom_columns`` adds per-file Bloom bitmaps over each column's
    distinct values — the equality-predicate complement to min/max ranges
    (a point lookup on a high-cardinality column rarely prunes on ranges,
    but a 512 B bitmap answers "definitely absent" with zero false
    negatives). This reads the indexed columns' data once at build time,
    which is why it rides the same distributed fan-out.
    """
    bloom_columns = list(bloom_columns or [])
    files = sorted(str(p) for p in Path(data_path).rglob("*.parquet"))
    bb, bk = bloom_bits, bloom_k
    if spark is not None and files:
        rdd = spark.sparkContext.parallelize(files, max(1, min(len(files), 64)))
        bc = list(bloom_columns)
        cols = list(columns)
        entries = rdd.map(lambda f: _entry(f, cols, bc, bb, bk)).collect()
        entries.sort(key=lambda e: e["path"])
    else:
        entries = [_entry(f, columns, bloom_columns, bb, bk) for f in files]
    index = {
        "version": 2,
        "root": str(data_path),
        "columns": columns,
        "bloom_columns": bloom_columns,
        "bloom_bits": bloom_bits,
        "bloom_k": bloom_k,
        "files": entries,
    }
    tmp = os.path.join(data_path, INDEX_NAME + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(index, fh)
    os.replace(tmp, os.path.join(data_path, INDEX_NAME))
    return index


def update_file_index(
    data_path: str,
    *,
    spark: SparkSession | None = None,
) -> tuple[dict[str, Any], int]:
    """Incremental sidecar refresh: reuse the existing entry for every
    file whose byte size is unchanged, footer-read only new/changed
    files, drop entries for deleted files. Parquet files are immutable
    in practice (appends add files), so an unchanged (path, bytes) pair
    means unchanged stats — the same contract Iceberg manifests rely on.
    Returns ``(index, n_newly_indexed)``. Cost is O(new files), which is
    what makes per-micro-batch maintenance viable at millions of files.
    """
    old = load_file_index(data_path)
    columns = old["columns"]
    bloom_columns = list(old.get("bloom_columns") or [])
    bb = old.get("bloom_bits", _BLOOM_BITS)
    bk = old.get("bloom_k", _BLOOM_K)
    old_by_path = {e["path"]: e for e in old["files"]}
    files = sorted(str(p) for p in Path(data_path).rglob("*.parquet"))
    entries: list[dict[str, Any]] = []
    fresh: list[str] = []
    for f in files:
        e = old_by_path.get(f)
        if e is not None and e["bytes"] == os.path.getsize(f):
            entries.append(e)
        else:
            fresh.append(f)
    if fresh:
        cols, bc = list(columns), list(bloom_columns)
        if spark is not None:
            rdd = spark.sparkContext.parallelize(
                fresh, max(1, min(len(fresh), 64))
            )
            entries.extend(
                rdd.map(lambda f: _entry(f, cols, bc, bb, bk)).collect()
            )
        else:
            entries.extend(_entry(f, cols, bc, bb, bk) for f in fresh)
    entries.sort(key=lambda e: e["path"])
    index = {
        "version": 2,
        "root": str(data_path),
        "columns": columns,
        "bloom_columns": bloom_columns,
        "bloom_bits": bb,
        "bloom_k": bk,
        "files": entries,
    }
    tmp = os.path.join(data_path, INDEX_NAME + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(index, fh)
    os.replace(tmp, os.path.join(data_path, INDEX_NAME))
    return index, len(fresh)


def load_file_index(data_path: str) -> dict[str, Any]:
    with open(os.path.join(data_path, INDEX_NAME)) as fh:
        return json.load(fh)


def prune(
    index: dict[str, Any],
    ranges: dict[str, tuple[Any, Any]] | None = None,
    equals: dict[str, Any] | None = None,
) -> list[str]:
    """Files whose stats intersect every ``col: (lo, hi)`` closed range
    AND whose Bloom bitmap can contain every ``col: value`` equality.

    ``None`` as lo/hi means unbounded on that side. Conservative: a file
    without usable stats (or without a bloom for an ``equals`` column)
    always survives. Bloom pruning has zero false negatives — the bitmap
    covers every distinct value the file holds — so a dropped file
    definitely lacks the value; a surviving file is only *possible*.
    """
    bits = index.get("bloom_bits", _BLOOM_BITS)
    k = index.get("bloom_k", _BLOOM_K)
    out = []
    for e in index["files"]:
        keep = True
        for col, (lo, hi) in (ranges or {}).items():
            st = e["columns"].get(col)
            if st is None:
                continue  # no stats -> cannot prune
            if st["min"] is None:  # all-null file: range predicates never match
                keep = False
                break
            if (hi is not None and st["min"] > hi) or (
                lo is not None and st["max"] < lo
            ):
                keep = False
                break
        if keep:
            for col, v in (equals or {}).items():
                # min/max still applies to a point predicate. Guard the
                # comparison: a type-mismatched probe (int vs string
                # stats) must conservatively KEEP the file and fall
                # through to the type-tagged bloom check below, not raise.
                st = e["columns"].get(col)
                if st is not None and st["min"] is not None:
                    try:
                        if st["min"] > v or st["max"] < v:
                            keep = False
                            break
                    except TypeError:
                        pass
                hexmap = (e.get("bloom") or {}).get(col)
                if hexmap is None:
                    continue  # no bloom -> cannot prune further
                bitmap = int(hexmap, 16)
                if any(not (bitmap >> s) & 1 for s in _bloom_slots(v, bits, k)):
                    keep = False
                    break
        if keep:
            out.append(e["path"])
    return out


def read_pruned(
    spark: SparkSession,
    data_path: str,
    ranges: dict[str, tuple[Any, Any]] | None = None,
    equals: dict[str, Any] | None = None,
) -> DataFrame:
    """Scan only the files that can satisfy ``ranges`` + ``equals``, with
    the residual predicate re-applied (file pruning is necessary, not
    sufficient — bloom false positives and range gaps remain)."""
    index = load_file_index(data_path)
    files = prune(index, ranges, equals)
    base = (
        spark.read.parquet(*files)
        if files
        # No candidate files: keep the schema, produce zero rows. The
        # lit(False) filter folds to an empty relation before any read.
        else spark.read.parquet(data_path).where(F.lit(False))
    )
    cond = F.lit(True)
    for col, (lo, hi) in (ranges or {}).items():
        if lo is not None:
            cond = cond & (F.col(col) >= F.lit(lo))
        if hi is not None:
            cond = cond & (F.col(col) <= F.lit(hi))
    for col, v in (equals or {}).items():
        cond = cond & (F.col(col) == F.lit(v))
    return base.where(cond)
