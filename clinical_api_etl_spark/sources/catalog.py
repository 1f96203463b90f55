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


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.parquet carries TIMESTAMP(NANOS) which the vectorized
        # parquet reader rejects; read nanos as INT64 and convert to a
        # microsecond timestamp JVM-side (truncation matches DuckDB's
        # ns→us narrowing). Stays fully distributed — no driver round-trip.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for the SQL surface."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
