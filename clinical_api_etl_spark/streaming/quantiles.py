"""Streaming mergeable quantile state — the KLL MV twin. [EXT]

VERDICT r09 task 7 (streaming face; the batch query is
``plans/sketches.py:sketch_kll_quantiles``). The streaming monitors
(drift, funnel, A/B) carry counts but no quantile state; this MV
maintains per-(day, shard) deterministic-KLL sketches under streaming
event INSERTS:

    drop folder (json events)
      → foreachBatch:
          cents + (day, shard) keys derived IN SPARK     [same exprs as batch]
          per-key ordered fold into the durable sketch   [driver, batch-bounded]
          versioned dir + CURRENT-pointer rename publish [exactly-once]

Bitwise contract: each (day, shard) sketch is the fold of its rows in
arrival order, batches in trigger order, rows within a batch in
(ts, event_id) order — exactly the canonical order the batch build uses
(``operators/kll.py:kll_partial_sketches``). For IN-ORDER arrival the MV
state therefore equals the batch build bit for bit and ``quantiles()``
equals the batch query's estimates exactly; out-of-order arrival keeps
the sketch's RANK-ERROR contract (merges/folds in any order stay valid
KLL states) but not bit-equality — the standard sketch guarantee,
asserted by the tests.

Driver-side work is the batch's rows only (batch-bounded, the
components.py/neardup.py posture); durable state is #partitions · O(k)
bytes. Publish uses the CURRENT-pointer discipline (ADVICE r09): no
crash point ever leaves the state absent.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clinical_api_etl_spark.operators.kll import (
    N_KLL_SHARDS,
    KLLSketch,
    kll_merge_rows,
)

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double"
)

_DAY_MS_I = 86400000


class StreamingQuantiles:
    """Per-(day, shard) deterministic-KLL sketches as an incremental MV."""

    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = Path(root)
        self.checkpoint = str(self.root / "checkpoint")
        self.state = self.root / "sketches"

    # -- state (CURRENT-pointer publish, the components.py discipline) ----

    @property
    def _current_ptr(self) -> Path:
        return self.state / "CURRENT"

    def _data_dir(self) -> Path | None:
        if not self._current_ptr.exists():
            return None
        d = self.state / self._current_ptr.read_text().strip()
        return d if d.exists() else None

    def _load_state(self) -> tuple[dict[tuple[int, int], KLLSketch], set[str]]:
        d = self._data_dir()
        if d is None:
            return {}, set()
        meta = json.loads((d / "_kll_meta.json").read_text())
        sketches = {}
        for r in self.spark.read.parquet(str(d)).collect():
            sketches[(r["day"], r["shard"])] = KLLSketch.from_json(r["sketch"])
        return sketches, set(meta["txns"])

    def _write_state(
        self, sketches: dict[tuple[int, int], KLLSketch], txns: set[str]
    ) -> None:
        self.state.mkdir(parents=True, exist_ok=True)
        new = self.state / f"data_{uuid.uuid4().hex}"
        rows = [
            (day, shard, sk.to_json())
            for (day, shard), sk in sorted(sketches.items())
        ]
        self.spark.createDataFrame(
            rows or [], "day long, shard long, sketch string"
        ).coalesce(1).write.mode("overwrite").parquet(str(new))
        (new / "_kll_meta.json").write_text(json.dumps({"txns": sorted(txns)}))
        ptr_tmp = self.state / f"_ptr_{uuid.uuid4().hex}"
        ptr_tmp.write_text(new.name)
        os.rename(ptr_tmp, self._current_ptr)
        for stale in self.state.glob("data_*"):
            if stale.name != new.name:
                shutil.rmtree(stale, ignore_errors=True)
        for orphan in self.state.glob("_ptr_*"):
            orphan.unlink(missing_ok=True)

    # -- per-batch fold -----------------------------------------------------

    def _apply_batch(self, events: DataFrame, txn: str) -> None:
        sketches, applied = self._load_state()
        if txn in applied:
            return
        keyed = (
            events.filter(F.col("value").isNotNull())
            .select(
                F.expr(f"unix_millis(ts) div {_DAY_MS_I}").alias("day"),
                F.expr(
                    "CAST(conv(substr(md5(CAST(event_id AS STRING)), 1, 4),"
                    f" 16, 10) AS BIGINT) % {N_KLL_SHARDS}"
                ).alias("shard"),
                "ts",
                "event_id",
                (F.col("value").cast("decimal(18,2)") * 100)
                .cast("long")
                .alias("v"),
            )
            .orderBy("day", "shard", "ts", "event_id")
        )
        for r in keyed.collect():  # batch-bounded driver work
            key = (r["day"], r["shard"])
            if key not in sketches:
                sketches[key] = KLLSketch()
            sketches[key].update(r["v"])
        self._write_state(sketches, applied | {txn})

    # -- queries -------------------------------------------------------------

    def quantiles(self, qs: tuple[int, ...] = tuple(range(1, 10))) -> dict:
        """Decile estimates (q/10 → value) off the merged snapshot —
        merge order is canonical (day, shard), matching the batch build."""
        d = self._data_dir()
        if d is None:
            return {}
        rows = self.spark.read.parquet(str(d)).collect()
        merged = kll_merge_rows(rows)
        return {q: merged.quantile(q, 10) for q in qs}

    def snapshot(self) -> DataFrame | None:
        d = self._data_dir()
        if d is None:
            return None
        return self.spark.read.parquet(str(d))

    # -- stream wiring --------------------------------------------------------

    def run_stream(self, drop_dir: str) -> None:
        """One availableNow pass over unseen event files in ``drop_dir``."""
        stream_id = Path(self.checkpoint).name

        def sink(batch_df: DataFrame, batch_id: int) -> None:
            batch_df.persist()
            try:
                # count() fully consumes every partition (isEmpty stops at
                # the first non-empty one — Spark 4 validates state-store
                # commits, so a replayed/empty batch must still be drained;
                # round-9 rule) and doubles as the emptiness probe.
                if batch_df.count() == 0:
                    return
                self._apply_batch(batch_df, f"kll-{stream_id}-{batch_id}")
            finally:
                batch_df.unpersist()

        q = (
            self.spark.readStream.schema(EVENT_SCHEMA)
            .json(drop_dir)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", self.checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
