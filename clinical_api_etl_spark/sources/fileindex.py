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
  with the index and returns the surviving file list. Files with no
  usable stats for a referenced column are KEPT (pruning must be
  conservative); all-null files are skipped for range predicates (SQL
  range semantics never match NULL).
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


def build_file_index(
    data_path: str,
    columns: list[str],
    *,
    spark: SparkSession | None = None,
) -> dict[str, Any]:
    """Index every ``*.parquet`` under ``data_path`` and write the sidecar.

    With ``spark`` the footer reads run as a distributed job (one task per
    slice of the file list); without, driver-side. Both produce the same
    index — the executors only ever read footers.
    """
    files = sorted(str(p) for p in Path(data_path).rglob("*.parquet"))
    if spark is not None and files:
        rdd = spark.sparkContext.parallelize(files, max(1, min(len(files), 64)))
        entries = rdd.map(lambda f: _footer_stats(f, columns)).collect()
        entries.sort(key=lambda e: e["path"])
    else:
        entries = [_footer_stats(f, columns) for f in files]
    index = {"version": 1, "root": str(data_path), "columns": columns, "files": entries}
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
        if spark is not None:
            rdd = spark.sparkContext.parallelize(
                fresh, max(1, min(len(fresh), 64))
            )
            entries.extend(rdd.map(lambda f: _footer_stats(f, columns)).collect())
        else:
            entries.extend(_footer_stats(f, columns) for f in fresh)
    entries.sort(key=lambda e: e["path"])
    index = {
        "version": 1,
        "root": str(data_path),
        "columns": columns,
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


def prune(index: dict[str, Any], ranges: dict[str, tuple[Any, Any]]) -> list[str]:
    """Files whose stats intersect every ``col: (lo, hi)`` closed range.

    ``None`` as lo/hi means unbounded on that side. Conservative: a file
    without usable stats for a referenced column always survives.
    """
    out = []
    for e in index["files"]:
        keep = True
        for col, (lo, hi) in ranges.items():
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
            out.append(e["path"])
    return out


def read_pruned(
    spark: SparkSession,
    data_path: str,
    ranges: dict[str, tuple[Any, Any]],
) -> DataFrame:
    """Scan only the files that can satisfy ``ranges``, with the residual
    predicate re-applied (file pruning is necessary, not sufficient)."""
    index = load_file_index(data_path)
    files = prune(index, ranges)
    base = (
        spark.read.parquet(*files)
        if files
        # No candidate files: keep the schema, produce zero rows. The
        # lit(False) filter folds to an empty relation before any read.
        else spark.read.parquet(data_path).where(F.lit(False))
    )
    cond = F.lit(True)
    for col, (lo, hi) in ranges.items():
        if lo is not None:
            cond = cond & (F.col(col) >= F.lit(lo))
        if hi is not None:
            cond = cond & (F.col(col) <= F.lit(hi))
    return base.where(cond)
