"""Testdata catalog: parquet loaders + temp-view registration.

The driver materializes a TPC-H-ish star schema plus ``events`` /
``documents`` / ``embeddings`` at ``/root/testdata/sf*/`` (one parquet per
table). All relational query builders load through here so that column
pruning and predicate pushdown reach a single, uniform scan path.

At 100 TB these loaders would point at partitioned parquet/Delta roots; the
API (name -> DataFrame) is unchanged — Catalyst handles partition pruning
from the filters the query builders attach.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Small dimension tables that should always broadcast in joins (the
#: largest, ``part``, is ~2k rows/SF-0.01 and a few hundred MB at SF-1000 —
#: still far below executor memory; at true 100 TB scale ``part`` grows, but
#: region/nation stay trivially broadcastable).
BROADCAST_DIMS = frozenset({"region", "nation", "supplier", "part", "customer"})


#: Fact tables above this on-disk size get re-spread after the scan when the
#: source layout can't parallelize (see _spread). 1 MiB compressed ≈ 50k+
#: rows — enough that a serial scan stalls downstream window/agg stages.
_SPREAD_MIN_BYTES = 1024 * 1024


def _spread(spark: SparkSession, df: DataFrame, path: str, name: str) -> DataFrame:
    """Repartition large fact scans whose file layout defeats parallelism.

    The testdata ships each table as ONE parquet file with ONE row group, so
    the scan — and with it every downstream partial aggregate — runs as a
    single task no matter what ``maxPartitionBytes`` says (byte-range splits
    of a single row group are empty). The same situation arises in real
    deployments after aggressive compaction. A round-robin repartition right
    after the scan restores parallelism; Catalyst still pushes filters and
    column pruning *through* the repartition into the scan, so only
    surviving rows are exchanged. Dimension tables are left alone (they
    broadcast; an exchange would be pure overhead).
    """
    if name in BROADCAST_DIMS:
        return df
    try:
        size = sum(os.path.getsize(p) for p in glob.glob(path) + [path] if os.path.isfile(p))
    except OSError:
        return df
    if size >= _SPREAD_MIN_BYTES:
        return df.repartition(spark.sparkContext.defaultParallelism)
    return df


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        # events.parquet has shipped with two physical encodings for ``ts``:
        # TIMESTAMP(NANOS), which the vectorized reader rejects (read nanos
        # as INT64 and truncate to µs JVM-side — matches DuckDB's ns→µs
        # narrowing), and plain naive µs timestamps, which the NTZ-inferring
        # reader surfaces as TIMESTAMP_NTZ. Normalize both to the session
        # TIMESTAMP type so downstream expressions (unix_millis, windows,
        # watermarks) see one type; the session timezone is pinned to UTC
        # (session.py), so the NTZ cast is value-preserving.
        if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Prefer reading naive µs timestamps as TIMESTAMP at the scan (not
        # NTZ + cast): the filter `ts >= lit` then pushes into parquet.
        if spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled", "true") != "false":
            spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        df = spark.read.parquet(path)
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return _spread(spark, df, path, name)
    return _spread(spark, spark.read.parquet(path), path, name)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for the SQL surface."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
