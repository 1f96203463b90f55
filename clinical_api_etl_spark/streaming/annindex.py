"""Streaming ANN index — an IVF index maintained as an incremental MV. [EXT]

A production 100 TB pipeline re-embeds continuously; rebuilding the whole
IVF index per refresh (the batch ``ann_ivf_topk`` posture) re-scans the
corpus every time. This module keeps a QUERYABLE index current instead
(VERDICT r07 task 3), the IncrementalMV discipline applied to ANN:

* The coarse quantizer (k-means centroids) is trained ONCE — from the
  first micro-batch's vectors, sample-bounded, then persisted next to the
  warehouse — and never retrained. That is the faiss convention: the
  coarse quantizer is a fixed model; vectors stream in against it. A
  restart reloads the persisted model, so every assignment ever made
  stays consistent with it.
* Each micro-batch anti-joins the stored ids (cross-run durable dedup),
  assigns the fresh vectors to cells with the SAME codegen'd argmin used
  by the batch build (``operators/clustering.assign_cells``), and appends
  (vec_id, embedding, cluster) rows to the ``ann_cells`` state table via
  ``append_once`` keyed by (checkpoint, batch) — replayed batches and
  out-of-order file arrivals converge to identical state.
* ``search(queries)`` runs the SAME probe as the batch index
  (``operators/similarity.ivf_probe``) against the state table, so after
  the drop folder drains, stream search == batch search over the same
  corpus under the same model BIT FOR BIT (the test gate): cell
  assignment is a pure per-row map, so arrival order cannot change it.

Cost per refresh: assignment of the BATCH only (map-side argmin over k
literal centroid chains) + one append — never a corpus re-scan; a query
touches ~n_probe/n_clusters of the state via the cluster equi-join.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clinical_api_etl_spark.sources.snapshots import SnapshotWarehouse

VEC_SCHEMA = "vec_id long, embedding array<double>"

T_CELLS = "ann_cells"  # (vec_id, embedding, cluster)


class StreamingAnnIndex:
    """IVF index over a vector drop folder, maintained per micro-batch."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        *,
        n_clusters: int = 8,
        n_probe: int = 2,
        kmeans_iterations: int = 3,
        train_sample: int = 8192,
    ) -> None:
        self.spark = spark
        self.root = Path(root)
        self.wh = SnapshotWarehouse(spark, str(self.root / "warehouse"))
        self.checkpoint = str(self.root / "checkpoint")
        self.n_clusters = n_clusters
        self.n_probe = n_probe
        self.kmeans_iterations = kmeans_iterations
        self.train_sample = train_sample
        self._model_path = self.root / "centroids.json"

    # -- model ------------------------------------------------------------

    def centroids(self) -> list[list[float]] | None:
        """The persisted coarse model, or None before the first batch."""
        if not self._model_path.exists():
            return None
        return json.loads(self._model_path.read_text())["centroids"]

    def _train_once(self, batch: DataFrame) -> list[list[float]]:
        """Train the coarse quantizer from the first batch (sample-bounded,
        deterministic: lowest-id vectors, numpy Lloyd — the kmeans_fit
        path) and persist it atomically (tmp + rename) so restarts and the
        batch twin read the identical model."""
        model = self.centroids()
        if model is not None:
            return model
        from clinical_api_etl_spark.operators.clustering import (
            _lloyd,
            collect_sample,
        )
        from clinical_api_etl_spark.operators.similarity import _prep

        pts = _prep(batch, "vec_id", "embedding", "id", "v").select("id", "v")
        sample = collect_sample(pts, self.train_sample)
        if len(sample) < self.n_clusters:
            raise ValueError(
                f"first batch carries {len(sample)} vectors < "
                f"n_clusters={self.n_clusters}; ingest a larger seed batch"
            )
        model = _lloyd(sample, self.n_clusters, self.kmeans_iterations)
        tmp = self._model_path.with_suffix(".tmp")
        tmp.write_text(json.dumps({"centroids": model}))
        os.replace(tmp, self._model_path)
        return model

    # -- maintenance ------------------------------------------------------

    def run_stream(self, drop_dir: str) -> None:
        """One availableNow pass over unseen files in ``drop_dir``."""
        stream_id = Path(self.checkpoint).name

        def sink(batch_df: DataFrame, batch_id: int) -> None:
            batch_df.persist()
            try:
                if batch_df.isEmpty():
                    return
                model = self._train_once(batch_df)
                fresh = batch_df.dropDuplicates(["vec_id"])
                existing = self.wh.read(T_CELLS)
                if existing is not None:
                    fresh = fresh.join(
                        existing.select("vec_id"), "vec_id", "left_anti"
                    )
                from clinical_api_etl_spark.operators.clustering import (
                    assign_cells,
                )

                v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
                pts = fresh.select(F.col("vec_id").alias("id"), v.alias("v"))
                assigned = assign_cells(pts, model)
                rows = fresh.join(
                    assigned.select(F.col("id").alias("vec_id"), "cluster"),
                    "vec_id",
                ).select("vec_id", "embedding", "cluster")
                self.wh.append_once(
                    T_CELLS, rows, txn=f"ann-{stream_id}-{batch_id}"
                )
                assigned.unpersist()
            finally:
                batch_df.unpersist()

        q = (
            self.spark.readStream.schema(VEC_SCHEMA)
            .json(drop_dir)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", self.checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # -- serving ----------------------------------------------------------

    def state(self) -> DataFrame:
        cells = self.wh.read(T_CELLS)
        if cells is None:
            raise ValueError("no vectors ingested yet")
        return cells

    def search(self, queries: DataFrame, *, k: int = 5) -> DataFrame:
        """IVF top-k against the streamed index — the same probe plan as
        the batch build (``ivf_probe``), reading the maintained state."""
        from clinical_api_etl_spark.operators.similarity import ivf_probe

        model = self.centroids()
        if model is None:
            raise ValueError("no model trained yet")
        cells = self.state()
        assign = cells.select(F.col("vec_id").alias("id"), "cluster")
        return ivf_probe(
            queries,
            cells.select("vec_id", "embedding"),
            assign,
            model,
            k=k,
            n_probe=self.n_probe,
        )
