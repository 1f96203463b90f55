"""Columnar format interop: ORC read/write round-trip. [EXT]

Spark ships the ORC datasource in core (orc-core jars) — the engine
exposes it as a first-class source so a deployment standardized on ORC
(Hive-lineage warehouses) can use every operator unchanged: the scan
node is the only difference, and Catalyst pushes the same filters and
column pruning into ORC readers as parquet (predicate pushdown via ORC
row-group statistics).

Avro lives in :mod:`clinical_api_etl_spark.sources.avro`: the
``spark-avro`` datasource module is a separate artifact not baked into
this environment, so the engine implements the public Avro OCF spec
directly (stdlib ``zlib``/``struct``) on the Python DataSource API —
split-parallel reads on sync markers, two-phase-commit writes,
``src_avro_nation_summary`` hash-gates the seam like the ORC twin below.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_orc(df: DataFrame, path: str, *, partition_by: list[str] | None = None) -> None:
    """Write ``df`` as ORC (overwrite), optionally hive-partitioned."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def orc_roundtrip(spark: SparkSession, df: DataFrame, path: str) -> DataFrame:
    """Write ``df`` to ORC and read it back — the format-interop seam the
    round-trip query and tests pin down (schema + values must survive)."""
    write_orc(df, path)
    return read_orc(spark, path)
