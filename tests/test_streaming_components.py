"""Streaming connected components (streaming/components.py): the
incrementally maintained (id, component) labels must equal the batch
``connected_components`` labeling over the SAME edge set bit-for-bit —
after any arrival order, across batches that merge previously-disjoint
components, and under replayed files (VERDICT r08 task 5)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from clinical_api_etl_spark.operators.graph import connected_components
from clinical_api_etl_spark.streaming.components import StreamingComponents


def _write_edges(path, rows) -> None:
    with open(path, "w") as f:
        for a, b in rows:
            f.write(json.dumps({"id_a": a, "id_b": b}) + "\n")


def _labels(df) -> dict[int, int]:
    return {r["id"]: r["component"] for r in df.collect()}


def _batch_twin(spark, edges) -> dict[int, int]:
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    return _labels(connected_components(df))


class TestStreamingComponents:
    def test_stream_equals_batch_with_cross_batch_merge(self, spark, tmp_path):
        """Batch 1 builds two disjoint components; batch 2 bridges them
        (the cross-batch merge) and adds a fresh one. After each trigger
        the snapshot equals the batch labeling over edges-so-far."""
        drop = tmp_path / "drop"
        drop.mkdir()
        cc = StreamingComponents(spark, str(tmp_path / "cc"))

        b1 = [(1, 2), (2, 3), (10, 11)]
        _write_edges(drop / "b1.json", b1)
        cc.run_stream(str(drop))
        assert _labels(cc.snapshot()) == _batch_twin(spark, b1)

        # bridge 3-10 merges {1,2,3} with {10,11} -> min label 1 must
        # propagate to the 10/11 side; 20-21 is a brand-new component
        b2 = [(3, 10), (20, 21)]
        _write_edges(drop / "b2.json", b2)
        cc.run_stream(str(drop))
        got = _labels(cc.snapshot())
        assert got == _batch_twin(spark, b1 + b2)
        assert got[11] == 1 and got[21] == 20

    def test_arrival_order_cannot_change_labels(self, spark, tmp_path):
        """Min-id labels are a function of the edge SET: deliver the same
        edges in two different batch partitions/orders and compare."""
        edges = [(5, 9), (9, 2), (30, 31), (31, 2), (40, 41)]
        runs = []
        for name, split in (
            ("fwd", [edges[:2], edges[2:]]),
            ("rev", [edges[3:], edges[1:3], edges[:1]]),
        ):
            drop = tmp_path / f"drop_{name}"
            drop.mkdir()
            cc = StreamingComponents(spark, str(tmp_path / f"cc_{name}"))
            for i, chunk in enumerate(split):
                _write_edges(drop / f"b{i}.json", chunk)
                cc.run_stream(str(drop))
            runs.append(_labels(cc.snapshot()))
        assert runs[0] == runs[1] == _batch_twin(spark, edges)

    def test_replayed_and_duplicate_edges_are_noops(self, spark, tmp_path):
        drop = tmp_path / "drop"
        drop.mkdir()
        cc = StreamingComponents(spark, str(tmp_path / "cc"))
        edges = [(1, 2), (2, 3)]
        _write_edges(drop / "b1.json", edges)
        cc.run_stream(str(drop))
        before = _labels(cc.snapshot())
        # duplicate edge content in a NEW file (stream sees a new batch),
        # plus a replayed txn via a direct re-application
        _write_edges(drop / "b2.json", edges)
        cc.run_stream(str(drop))
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        applied_txn = sorted(cc._applied())[0]
        cc._apply_batch(df, applied_txn)  # replay: must be dropped
        assert _labels(cc.snapshot()) == before == _batch_twin(spark, edges)

    def test_restart_resumes_from_durable_state(self, spark, tmp_path):
        drop = tmp_path / "drop"
        drop.mkdir()
        root = tmp_path / "cc"
        _write_edges(drop / "b1.json", [(7, 8)])
        StreamingComponents(spark, str(root)).run_stream(str(drop))
        # a fresh instance (new process in real life) continues the merge
        _write_edges(drop / "b2.json", [(8, 3)])
        cc2 = StreamingComponents(spark, str(root))
        cc2.run_stream(str(drop))
        assert _labels(cc2.snapshot()) == _batch_twin(
            spark, [(7, 8), (8, 3)]
        )
