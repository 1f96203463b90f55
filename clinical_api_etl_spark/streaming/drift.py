"""Streaming Page–Hinkley drift monitor — incremental twin of
``ts_page_hinkley_drift``. [EXT]

Drift detection is only useful if it runs AT INGEST, but the PH
recurrence is day-ordered and files arrive out of order — so the
monitor cannot fold incoming batches directly. The incremental
decomposition (the streaming-data-card pattern):

* foreachBatch maintains the tiny append-only per-(type, day) state of
  exact (cents_sum, count) pairs — the expensive per-event work happens
  once per arriving document batch;
* ``snapshot()`` re-runs the day-ordered PH fold over the aggregated
  state with the batch query's EXACT arithmetic, so after any trigger
  sequence — out-of-order and duplicated files included — the snapshot
  equals ``ts_page_hinkley_drift`` on the same events bit for bit (the
  test gate).

Exactly-once: batches append with ``append_once`` keyed by
(checkpoint, batch id); the per-day state is additive (sums/counts), so
a replayed batch is the only duplication hazard and the txn key kills
it. State size is O(types × days), never events.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clinical_api_etl_spark.sources.snapshots import SnapshotWarehouse

EVENT_SCHEMA = (
    "event_id long, user_id long, event_type string, value double, "
    "ts timestamp"
)

T_DAILY = "ph_daily"


class StreamingDriftMonitor:
    """Maintains per-(type, day) exact aggregates from an event drop
    folder and serves the PH statistic on demand."""

    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.wh = SnapshotWarehouse(spark, str(Path(root) / "warehouse"))
        self.checkpoint = str(Path(root) / "checkpoint")

    def run_stream(self, drop_dir: str) -> None:
        stream_id = Path(self.checkpoint).name

        def sink(batch_df: DataFrame, batch_id: int) -> None:
            batch_df.persist()
            try:
                batch_df.count()
                daily = (
                    batch_df.filter(F.col("value").isNotNull())
                    .groupBy(
                        "event_type",
                        F.expr("unix_millis(ts) div 86400000").alias("d"),
                    )
                    .agg(
                        F.sum(
                            F.expr(
                                "CAST(CAST(value AS DECIMAL(18,2)) * 100"
                                " AS BIGINT)"
                            )
                        )
                        .cast("long")
                        .alias("s"),
                        F.count(F.lit(1)).cast("long").alias("c"),
                    )
                )
                self.wh.append_once(
                    T_DAILY, daily, txn=f"phd-{stream_id}-{batch_id}"
                )
            finally:
                batch_df.unpersist()

        q = (
            self.spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(drop_dir)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", self.checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def snapshot(self) -> DataFrame:
        """The current PH table — ts_page_hinkley_drift's exact
        arithmetic over the aggregated state."""
        state = self.wh.read(T_DAILY)
        if state is None:
            return self.spark.createDataFrame(
                [],
                "event_type string, n_days long, mean_cents double,"
                " m double, m_min double, ph double, drift boolean",
            )
        daily = state.groupBy("event_type", "d").agg(
            F.sum("s").cast("long").alias("s"),
            F.sum("c").cast("long").alias("c"),
        )
        series = daily.groupBy("event_type").agg(
            F.expr(
                "transform(array_sort(collect_list(struct(d,"
                " CAST(s AS DOUBLE) / CAST(c AS DOUBLE) AS xv))), t -> t.xv)"
            ).alias("xs")
        )
        return series.selectExpr(
            "event_type",
            "CAST(size(xs) AS BIGINT) AS n_days",
            """aggregate(
                 xs,
                 named_struct('n', CAST(0.0 AS DOUBLE),
                              's', CAST(0.0 AS DOUBLE),
                              'm', CAST(0.0 AS DOUBLE),
                              'mm', CAST(0.0 AS DOUBLE)),
                 (acc, x) -> named_struct(
                   'n', acc.n + 1,
                   's', acc.s + x,
                   'm', acc.m + (x - (acc.s + x) / (acc.n + 1) - 5.0D),
                   'mm', least(acc.mm,
                               acc.m + (x - (acc.s + x) / (acc.n + 1)
                                        - 5.0D)))
               ) AS st""",
        ).selectExpr(
            "event_type",
            "n_days",
            "st.s / st.n AS mean_cents",
            "st.m AS m",
            "st.mm AS m_min",
            "st.m - st.mm AS ph",
            "(st.m - st.mm > 500.0D) AS drift",
        )
