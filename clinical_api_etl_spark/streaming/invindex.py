"""Streaming inverted index — BM25 search over a drop folder. [EXT]

The batch BM25 ranking (`retrieval_bm25_topk`) re-tokenizes the whole
corpus per run. A production search pipeline ingests documents
continuously; this module maintains the POSTINGS as an incremental MV
(the `streaming/annindex.py` discipline applied to sparse retrieval):

* Each micro-batch dedupes arriving docs, anti-joins the stored doc ids
  (cross-run durable dedup), tokenizes with the SAME whitespace
  tokenizer as the batch ranking (`functions/text.tokens`), and appends
  (doc_id, tok, c) posting rows via ``append_once`` keyed by
  (checkpoint, batch) — replayed batches and out-of-order files
  converge to identical state.
* ``search(q)`` runs the SAME scorer as the batch query
  (`plans/ranking/retrieval.bm25_topk_from_tf`) against the state
  postings; doclen, df, and the power-of-two idf derive from the
  maintained table at query time, so scores track corpus growth with
  no stale-statistics window. After the drop folder drains, stream
  search == batch search over the same corpus BIT FOR BIT (the test
  gate): posting rows are a pure per-doc map, so arrival order cannot
  change them, and the scorer is literally shared code.

Cost per refresh: tokenization of the BATCH only + one append — never a
corpus re-scan; a query touches the postings of its own tokens via the
posting equi-join.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clinical_api_etl_spark.functions.text import tokens
from clinical_api_etl_spark.sources.snapshots import SnapshotWarehouse

DOC_SCHEMA = "doc_id long, text string"

T_POSTINGS = "ii_postings"  # (doc_id, tok, c)


class StreamingInvertedIndex:
    """BM25-searchable posting lists maintained per micro-batch."""

    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = Path(root)
        self.wh = SnapshotWarehouse(spark, str(self.root / "warehouse"))
        self.checkpoint = str(self.root / "checkpoint")

    def run_stream(self, drop_dir: str) -> None:
        """One availableNow pass over unseen doc files in ``drop_dir``."""
        stream_id = Path(self.checkpoint).name

        def sink(batch_df: DataFrame, batch_id: int) -> None:
            batch_df.persist()
            try:
                if batch_df.isEmpty():
                    return
                fresh = batch_df.dropDuplicates(["doc_id"])
                existing = self.wh.read(T_POSTINGS)
                if existing is not None:
                    fresh = fresh.join(
                        existing.select("doc_id").distinct(),
                        "doc_id",
                        "left_anti",
                    )
                rows = (
                    fresh.select(
                        "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
                    )
                    .groupBy("doc_id", "tok")
                    .agg(F.count(F.lit(1)).cast("long").alias("c"))
                )
                self.wh.append_once(
                    T_POSTINGS, rows, txn=f"ii-{stream_id}-{batch_id}"
                )
            finally:
                batch_df.unpersist()

        q = (
            self.spark.readStream.schema(DOC_SCHEMA)
            .json(drop_dir)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", self.checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # -- serving ----------------------------------------------------------

    def postings(self) -> DataFrame:
        tf = self.wh.read(T_POSTINGS)
        if tf is None:
            raise ValueError("no documents ingested yet")
        return tf

    def search(self, queries: DataFrame, *, k: int = 5) -> DataFrame:
        """BM25 top-k for a (q_id, tok) query-token table — the scorer is
        the batch query's own function, reading the maintained state."""
        from clinical_api_etl_spark.plans.ranking.retrieval import (
            bm25_topk_from_tf,
        )

        return bm25_topk_from_tf(self.postings(), queries, k=k)
