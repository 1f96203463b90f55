"""Training-shard publisher: bounded parquet shards + a dataset card.

The LAST step of a training-data pipeline: materialize a curated corpus as
uniformly-sized shards (training loaders stream fixed-size files, not one
giant table) together with a machine-readable dataset card recording what
was published — the artifact a training run pins for provenance.

Shard sizing uses Spark's own ``maxRecordsPerFile`` (row-bounded files
without an extra shuffle beyond the optional spread repartition); the card
is written LAST, so its presence marks a complete publish (the manifest
commit idea from sources/manifest_jsonl.py at dataset granularity —
readers treat card-less directories as in-flight).
"""

from __future__ import annotations

import json
import os
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CARD_NAME = "_dataset_card.json"


def publish_shards(
    df: DataFrame,
    path: str,
    *,
    rows_per_shard: int = 10_000,
    partitions: int | None = None,
    token_col: str | None = None,
    extra_meta: dict | None = None,
) -> dict:
    """Write ``df`` as row-bounded parquet shards + dataset card; returns
    the card. ``token_col``, when given, adds a corpus token total (the
    number a training schedule is planned against)."""
    out = df.repartition(partitions) if partitions else df
    (
        out.write.mode("overwrite")
        .option("maxRecordsPerFile", rows_per_shard)
        .parquet(path)
    )

    import pyarrow.parquet as pq

    shard_rows = {}
    for p in sorted(Path(path).glob("*.parquet")):
        shard_rows[p.name] = pq.ParquetFile(p).metadata.num_rows
    card = {
        "format": "parquet",
        "rows_per_shard_max": rows_per_shard,
        "n_shards": len(shard_rows),
        "n_rows": int(sum(shard_rows.values())),
        "shards": shard_rows,
        "columns": df.columns,
    }
    if token_col is not None:
        total = df.agg(F.sum(token_col).cast("long")).collect()[0][0]
        card["n_tokens"] = int(total or 0)
    if extra_meta:
        card["meta"] = extra_meta
    tmp = os.path.join(path, CARD_NAME + ".tmp")
    with open(tmp, "w") as f:
        json.dump(card, f, indent=2, sort_keys=True)
    os.rename(tmp, os.path.join(path, CARD_NAME))
    return card


def read_published(spark, path: str) -> tuple[DataFrame, dict]:
    """Read a published dataset; raises if the card is missing (publish
    incomplete)."""
    card_path = os.path.join(path, CARD_NAME)
    if not os.path.exists(card_path):
        raise FileNotFoundError(f"no {CARD_NAME} under {path}: publish incomplete")
    with open(card_path) as f:
        card = json.load(f)
    return spark.read.parquet(path), card
