"""Streaming near-duplicate admission — MinHash-LSH dedup at ingest. [EXT]

Batch near-dedup (``operators/dedup.py:minhash_lsh_pairs``) assumes the
whole corpus is present and mines pairs. At INGEST time the question
inverts: does this arriving document near-duplicate anything already
admitted to the corpus? This module answers it as a checkpointed
Structured Streaming flow with durable LSH state:

    drop folder (json docs)
      → foreachBatch:
          anti-join vs decided docs                  [cross-run idempotence]
          LSH band join vs ADMITTED-band state       [distributed, the 100 TB path]
          greedy within-batch admission              [driver, micro-batch-bounded]
          append_once bands + decisions              [exactly-once]

Admission semantics (deterministic; order-dependent by construction —
every online dedup is):

* documents are considered in (arrival batch, doc_id) order;
* a doc is ADMITTED iff no LSH band of its MinHash signature collides
  with a band of any previously admitted doc — previous batch (via the
  durable band state) or earlier-in-order doc of the same batch that was
  itself admitted (greedy maximal-independent-set on the batch's
  collision graph);
* docs with fewer than ``n`` tokens carry no shingles, hence no bands,
  and are always admitted (see ``lsh_bands``).

Scale posture: the state collision check is a distributed equi-join on
(band, bucket) against the append-only band table — the same bucketed
shape as the batch miner, never all-pairs. Only the WITHIN-batch
collision edges are collected to the driver: that set is bounded by the
micro-batch size (ingest triggers are tuned to stay small), not by the
corpus. Exactly-once rides ``append_once`` keyed by (checkpoint, batch),
so replayed batches converge to identical state.

This is candidate-level (band-collision) admission — the LSH S-curve
decides, with no exact-Jaccard verify pass: at ingest the admitted docs'
shingle sets are no longer in flight, and re-reading the corpus per
trigger would defeat the point. The batch miner keeps the verify; the
admission stream documents the standard trade (false-collision rate is
the S-curve's, tunable via bands × rows).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clinical_api_etl_spark.operators.dedup import lsh_bands
from clinical_api_etl_spark.sources.snapshots import SnapshotWarehouse

DOC_SCHEMA = "doc_id long, text string, ts timestamp"

T_BANDS = "nd_bands"  # (doc_id, band, bucket) — ADMITTED docs only
T_DECISIONS = "nd_decisions"  # (doc_id, admitted) — every doc ever seen


def greedy_admit(
    ids: list[int], edges: list[tuple[int, int]]
) -> dict[int, bool]:
    """The admission spec on one ordered slate: scan ``ids`` in order,
    admit unless a collision edge links to an already-admitted id.
    Shared by the sink and the test replay — the executable spec."""
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    admitted: set[int] = set()
    out: dict[int, bool] = {}
    for i in sorted(ids):
        ok = not (adj.get(i, set()) & admitted)
        out[i] = ok
        if ok:
            admitted.add(i)
    return out


class StreamingNearDup:
    """Maintains the admitted-corpus LSH state from a drop folder."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        *,
        n: int = 3,
        num_hashes: int = 32,
        bands: int = 8,
    ) -> None:
        self.spark = spark
        self.wh = SnapshotWarehouse(spark, str(Path(root) / "warehouse"))
        self.checkpoint = str(Path(root) / "checkpoint")
        self.n, self.num_hashes, self.bands = n, num_hashes, bands

    def _bands(self, df: DataFrame) -> DataFrame:
        return lsh_bands(
            df,
            "doc_id",
            "text",
            n=self.n,
            num_hashes=self.num_hashes,
            bands=self.bands,
        )

    def run_stream(self, drop_dir: str) -> None:
        """One availableNow pass over unseen files in ``drop_dir``."""
        stream_id = Path(self.checkpoint).name

        def sink(batch_df: DataFrame, batch_id: int) -> None:
            batch_df.persist()
            try:
                batch_df.count()
                fresh = batch_df.dropDuplicates(["doc_id"])
                decided = self.wh.read(T_DECISIONS)
                if decided is not None:
                    fresh = fresh.join(
                        decided.select("doc_id"), "doc_id", "left_anti"
                    )
                fresh = fresh.localCheckpoint(eager=True)
                bt = self._bands(fresh).localCheckpoint(eager=True)
                # distributed: any collision with the admitted state
                # rejects outright (state docs are all admitted).
                state = self.wh.read(T_BANDS)
                if state is not None:
                    hit_state = (
                        bt.join(
                            state.select("band", "bucket").dropDuplicates(),
                            ["band", "bucket"],
                        )
                        .select("doc_id")
                        .distinct()
                    )
                else:
                    hit_state = None
                surv = bt if hit_state is None else bt.join(
                    hit_state, "doc_id", "left_anti"
                )
                # within-batch collision edges among survivors —
                # micro-batch-bounded driver set (see module docstring).
                sa = surv.select(
                    F.col("doc_id").alias("id_a"), "band", "bucket"
                )
                sb = surv.select(
                    F.col("doc_id").alias("id_b"), "band", "bucket"
                )
                edges = [
                    (r["id_a"], r["id_b"])
                    for r in sa.join(sb, ["band", "bucket"])
                    .filter(F.col("id_a") < F.col("id_b"))
                    .select("id_a", "id_b")
                    .distinct()
                    .collect()
                ]
                all_ids = [r["doc_id"] for r in fresh.select("doc_id").collect()]
                state_rejected = (
                    set()
                    if hit_state is None
                    else {r["doc_id"] for r in hit_state.collect()}
                )
                surv_ids = [i for i in all_ids if i not in state_rejected]
                verdict = greedy_admit(surv_ids, edges)
                decisions = [
                    (int(i), bool(verdict.get(i, False)))
                    for i in all_ids
                ]
                dec_df = self.spark.createDataFrame(
                    decisions, "doc_id long, admitted boolean"
                )
                admitted_bands = bt.join(
                    dec_df.filter(F.col("admitted")).select("doc_id"),
                    "doc_id",
                )
                self.wh.append_once(
                    T_BANDS, admitted_bands, txn=f"ndb-{stream_id}-{batch_id}"
                )
                self.wh.append_once(
                    T_DECISIONS, dec_df, txn=f"ndd-{stream_id}-{batch_id}"
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

    def decisions(self) -> DataFrame:
        """All (doc_id, admitted) decisions so far."""
        out = self.wh.read(T_DECISIONS)
        if out is None:
            return self.spark.createDataFrame(
                [], "doc_id long, admitted boolean"
            )
        return out
