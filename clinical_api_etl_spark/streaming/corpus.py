"""Streaming twin of the training-corpus pipeline. [EXT]

``pipeline_training_corpus`` (plans/extensions.py) curates a corpus in
one batch pass. Real ingestion is continuous: documents land in a drop
folder and must flow through the same gates — dedup, quality filter,
holdout exclusion — into exactly-once published shards. This module
wires the already-tested pieces into ONE checkpointed Structured
Streaming flow:

    drop folder (json)
      → watermark + dropDuplicatesWithinWatermark(doc_id)   [stream dedup]
      → quality gate (token floor + holdout exclusion)      [shared fn]
      → foreachBatch: anti-join vs published corpus         [durable dedup]
        + SnapshotWarehouse.append_once(txn=batch id)       [exactly-once]

Replay posture: the file source's checkpoint makes re-listing idempotent;
``append_once`` makes the SINK idempotent under Spark's re-run-after-
failure batch semantics (same batchId retried); the anti-join makes
cross-run duplicates (same doc re-dropped later, beyond the watermark)
no-ops. All three layers are needed at 100 TB — any one alone leaks
duplicates under some failure timing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clinical_api_etl_spark.functions.text import token_count
from clinical_api_etl_spark.sources.snapshots import SnapshotWarehouse

#: Same curation thresholds as pipeline_training_corpus: ≥20 tokens, and
#: doc_id % 97 == 0 is the held-out benchmark shard (excluded from train).
MIN_TOKENS = 20
HOLDOUT_MOD = 97

DOC_SCHEMA = "doc_id long, text string, ts timestamp"


def corpus_gate(df: DataFrame) -> DataFrame:
    """The shared (batch == stream) curation projection: quality-gated
    training docs with their token counts. Pure column expressions."""
    return (
        df.withColumn("n_tokens", token_count(F.col("text")))
        .filter(
            (F.col("n_tokens") >= MIN_TOKENS)
            & (F.col("doc_id") % HOLDOUT_MOD != 0)
        )
        .select("doc_id", "text", "n_tokens")
    )


def batch_corpus(df: DataFrame) -> DataFrame:
    """Batch reference semantics for a replayed folder: first occurrence
    per doc_id (exact dedup), then the shared gate."""
    return corpus_gate(df.dropDuplicates(["doc_id"]))


def run_corpus_stream(
    spark: SparkSession,
    warehouse: SnapshotWarehouse,
    drop_dir: str,
    checkpoint_dir: str,
    *,
    table: str = "corpus_shards",
    watermark: str = "1 hour",
) -> None:
    """One availableNow pass of the streaming corpus pipeline.

    Call repeatedly with the same checkpoint as new files land — each
    run processes only unseen files (file-source log), drops in-stream
    duplicates inside the watermark, and publishes exactly once.
    """
    from pathlib import Path

    stream = spark.readStream.schema(DOC_SCHEMA).json(drop_dir)
    deduped = stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["doc_id"]
    )
    gated = corpus_gate(deduped)
    # Idempotence tokens are scoped to the CHECKPOINT (Delta's txnAppId
    # convention): batchId alone would collide across unrelated streams
    # feeding one table.
    stream_id = Path(checkpoint_dir).name

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        # Force a full pass over every partition FIRST: if append_once
        # short-circuits on a replayed token, the stateful dedup operator
        # upstream must still have committed its state stores (Spark 4
        # validates per-partition commits after foreachBatch returns).
        batch_df.persist()
        try:
            batch_df.count()
            out = batch_df
            existing = warehouse.read(table)
            if existing is not None:
                # Durable cross-run dedup: a doc re-dropped after its
                # watermark expired is no longer in stream state — the
                # published corpus itself is the authority. The batch is
                # the small side; anti-join leaves the corpus unshuffled.
                out = out.join(existing.select("doc_id"), "doc_id", "left_anti")
            warehouse.append_once(table, out, txn=f"corpus-{stream_id}-{batch_id}")
        finally:
            batch_df.unpersist()

    q = (
        gated.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
