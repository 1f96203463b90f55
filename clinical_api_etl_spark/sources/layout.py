"""Cluster-sorted parquet layout for row-group data skipping. [EXT]

Parquet stores per-row-group min/max statistics; a scan with a predicate
on column ``c`` can skip every row group whose [min, max] range excludes
the predicate — but only if writes CLUSTER values of ``c``. The driver's
testdata (and most raw landing zones) arrives row-grouped by arrival
order, so every row group spans nearly the full key domain and min/max
prune nothing.

``write_clustered`` is the CLUSTER BY / Delta OPTIMIZE ZORDER analogue
for vanilla parquet: range-repartition on the cluster key (contiguous
key ranges per output file — a range shuffle, one pass) then sort within
partitions (contiguous ranges per row group *inside* each file). After
it, a point or range predicate on the key touches O(1) row groups
instead of all of them. At 100 TB this is the difference between a
selective query reading gigabytes and reading the table; the same
property feeds Spark's own parquet filter pushdown (PushedFilters prune
row groups via exactly these stats).

For multi-column clustering the columns are concatenated
lexicographically (leading column dominates — the ZORDER interleaving
trade-off is documented, not implemented: lexicographic clustering is
strictly better for the leading column and worse for trailing ones).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_by: list[str],
    *,
    num_files: int | None = None,
) -> None:
    """Write ``df`` as parquet range-clustered on ``cluster_by``.

    ``num_files`` bounds the file count (defaults to the session's
    shuffle parallelism via ``repartitionByRange``'s default).
    """
    if not cluster_by:
        raise ValueError("cluster_by must name at least one column")
    parted = (
        df.repartitionByRange(num_files, *cluster_by)
        if num_files is not None
        else df.repartitionByRange(*cluster_by)
    )
    parted.sortWithinPartitions(*cluster_by).write.mode("overwrite").parquet(path)


def row_group_ranges(path: str, column: str) -> list[tuple]:
    """(min, max) of ``column`` per parquet row group under ``path`` —
    the stats a predicate scan prunes against. Driver-side metadata read
    (footers only), used by tests and layout audits."""
    from pathlib import Path

    import pyarrow.parquet as pq

    out = []
    for f in sorted(Path(path).rglob("*.parquet")):
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        ci = names[column]
        for rg in range(md.num_row_groups):
            stats = md.row_group(rg).column(ci).statistics
            if stats is not None and stats.has_min_max:
                out.append((stats.min, stats.max))
    return out


def skipping_ratio(path: str, column: str, value) -> float:
    """Fraction of row groups a ``column = value`` scan can SKIP via
    min/max stats. 0.0 = layout is useless for this predicate; close to
    1.0 = point queries touch O(1) row groups."""
    ranges = row_group_ranges(path, column)
    if not ranges:
        return 0.0
    touched = sum(1 for lo, hi in ranges if lo <= value <= hi)
    return 1.0 - touched / len(ranges)
