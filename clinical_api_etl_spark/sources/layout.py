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

Two multi-column strategies ship:

- lexicographic (``write_clustered``): leading column dominates —
  strictly best for predicates on it, useless for trailing columns;
- Z-order (``write_zordered``): interleave the bits of all cluster
  columns into one Morton code and range-cluster on THAT. Each row group
  then covers a small hyper-rectangle of the key space, so min/max stats
  prune on EVERY clustered column (Delta/Iceberg ``OPTIMIZE ZORDER``
  semantics). The interleave is a branch-free sum of shift-and-mask
  terms — whole-stage-codegen'd, and the identical expression runs on
  DuckDB (`<<`/`>>`/`&` are common SQL), so the codes are oracle-gated.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


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


def morton_interleave(cols: list[Column], bits: int = 16) -> Column:
    """Morton (Z-order) code: interleave the low ``bits`` bits of each
    column (all must be non-negative integers < 2**bits). Branch-free sum
    of shift-mask terms — one codegen'd BIGINT expression, no UDF."""
    n = len(cols)
    terms = []
    for j, c in enumerate(cols):
        c = c.cast("long")
        for i in range(bits):
            terms.append(F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + j))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def morton_interleave_sql(cols: list[str], bits: int = 16) -> str:
    """The identical interleave as engine-portable SQL text (DuckDB oracle
    twin of :func:`morton_interleave`)."""
    n = len(cols)
    terms = [
        f"(((CAST({c} AS BIGINT) >> {i}) & 1) << {i * n + j})"
        for j, c in enumerate(cols)
        for i in range(bits)
    ]
    return " + ".join(terms)


def zorder_frame(
    df: DataFrame,
    zorder_by: list[str],
    *,
    bits: int = 16,
    num_files: int | None = None,
) -> DataFrame:
    """``df`` range-clustered + sorted on the Morton code of ``zorder_by``
    (numeric columns) — ready for any writer (plain parquet, warehouse
    commit dirs). Each column is affinely bucketed to ``[0, 2**bits)``
    from its global min/max (one 1-row aggregate — metadata-scale at any
    corpus size), codes are interleaved, and the helper column is dropped
    after the sort so it never reaches the files.
    """
    if len(zorder_by) < 2:
        raise ValueError("zorder_by needs >= 2 columns (use write_clustered for 1)")
    aggs = []
    for c in zorder_by:
        aggs += [F.min(c).alias(f"mn_{c}"), F.max(c).alias(f"mx_{c}")]
    stats = df.agg(*aggs).collect()[0]
    nb = 1 << bits
    buckets = []
    for c in zorder_by:
        mn, mx = float(stats[f"mn_{c}"]), float(stats[f"mx_{c}"])
        span = (mx - mn) or 1.0
        b = F.least(
            F.lit(nb - 1),
            F.floor((F.col(c).cast("double") - F.lit(mn)) / F.lit(span) * nb).cast(
                "long"
            ),
        )
        buckets.append(F.greatest(F.lit(0), b))
    code = morton_interleave(buckets, bits=bits)
    tagged = df.withColumn("__z", code)
    parted = (
        tagged.repartitionByRange(num_files, "__z")
        if num_files is not None
        else tagged.repartitionByRange("__z")
    )
    return parted.sortWithinPartitions("__z").drop("__z")


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_by: list[str],
    *,
    bits: int = 16,
    num_files: int | None = None,
) -> None:
    """Write ``df`` Z-ordered on ``zorder_by`` (see :func:`zorder_frame`)."""
    zorder_frame(df, zorder_by, bits=bits, num_files=num_files).write.mode(
        "overwrite"
    ).parquet(path)


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
