"""Streaming quality-funnel monitor — incremental twin of
``corpus_quality_funnel``. [EXT]

The funnel's per-stage (docs, tokens) counters are PURELY ADDITIVE, so
the incremental decomposition is the simplest of the monitor family
(cf. streaming/drift.py, streaming/datacard.py):

* foreachBatch computes the batch's 6-stage counter rows with the
  REGISTERED batch rules (``plans/extensions.py:funnel_stage_counts`` —
  one shared function, so batch and stream can never drift) and appends
  them exactly-once (``append_once`` keyed by checkpoint + batch id);
* ``snapshot()`` sums the per-batch counters per stage and finishes
  with the identical retained-fraction division — after ANY trigger
  sequence, out-of-order files included, the snapshot equals
  ``quality_funnel_from_docs`` over the union of all dropped documents
  bit for bit (the test gate).

State is O(stages x batches) rows of BIGINT counters, never documents.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clinical_api_etl_spark.sources.snapshots import SnapshotWarehouse

DOC_SCHEMA = "doc_id long, text string, n_chars long, lang string"

T_STAGES = "funnel_stages"


class StreamingFunnelMonitor:
    """Maintains the additive funnel counters from a JSON drop folder
    and serves the full funnel report on demand."""

    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.wh = SnapshotWarehouse(spark, str(Path(root) / "warehouse"))
        self.checkpoint = str(Path(root) / "checkpoint")

    def run_stream(self, drop_dir: str) -> None:
        from clinical_api_etl_spark.plans.extensions import funnel_stage_counts

        stream_id = Path(self.checkpoint).name

        def sink(batch_df: DataFrame, batch_id: int) -> None:
            batch_df.persist()
            try:
                batch_df.count()
                counts = funnel_stage_counts(batch_df)
                self.wh.append_once(
                    T_STAGES, counts, txn=f"qf-{stream_id}-{batch_id}"
                )
            finally:
                batch_df.unpersist()

        q = (
            self.spark.readStream.schema(DOC_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(drop_dir)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", self.checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def snapshot(self) -> DataFrame:
        """The current funnel — summed counters + the batch query's
        exact retained division."""
        state = self.wh.read(T_STAGES)
        if state is None:
            return self.spark.createDataFrame(
                [],
                "stage int, stage_name string, n_docs long,"
                " n_tokens long, retained double",
            )
        stages = state.groupBy("stage", "stage_name").agg(
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
        )
        base = stages.filter(F.col("stage") == 0).select(
            F.col("n_docs").alias("n0")
        )
        return stages.crossJoin(F.broadcast(base)).select(
            "stage",
            "stage_name",
            "n_docs",
            "n_tokens",
            (
                F.col("n_docs").cast("double") / F.col("n0").cast("double")
            ).alias("retained"),
        )
