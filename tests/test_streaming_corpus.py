"""Streaming corpus pipeline: batch equivalence + exactly-once.

The VERDICT r04 acceptance: a drop folder replayed through the
checkpointed stream must publish exactly the batch-curated corpus, and a
duplicated trigger (Spark's retry-after-failure semantics) must not
double-publish.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from clinical_api_etl_spark.sources.snapshots import SnapshotWarehouse
from clinical_api_etl_spark.streaming.corpus import (
    DOC_SCHEMA,
    batch_corpus,
    run_corpus_stream,
)

LONG = "tok " * 25  # 25 tokens — passes the 20-token floor
SHORT = "too short"


def _drop(dirpath, name, docs):
    dirpath.mkdir(parents=True, exist_ok=True)
    with open(dirpath / name, "w") as f:
        for d in docs:
            f.write(json.dumps(d) + "\n")


def _doc(i, text, ts="2024-01-15T10:00:00"):
    return {"doc_id": i, "text": text, "ts": ts}


@pytest.fixture()
def swh(spark, tmp_path):
    return SnapshotWarehouse(spark, str(tmp_path / "wh"))


class TestStreamingCorpusPipeline:
    def test_stream_equals_batch_on_replayed_folder(self, spark, swh, tmp_path):
        drop = tmp_path / "drop"
        _drop(drop, "a.jsonl", [
            _doc(1, LONG + "alpha"),
            _doc(2, SHORT),                  # fails token floor
            _doc(97, LONG + "holdout"),      # holdout shard: excluded
            _doc(3, LONG + "gamma"),
            _doc(3, LONG + "gamma-dup"),     # in-stream duplicate id
        ])
        _drop(drop, "b.jsonl", [
            _doc(4, LONG + "delta"),
            _doc(1, LONG + "alpha-later"),   # cross-file duplicate id
        ])
        run_corpus_stream(spark, swh, str(drop), str(tmp_path / "ckpt"))

        got = {
            r["doc_id"]: r["n_tokens"]
            for r in swh.read("corpus_shards").collect()
        }
        batch = {
            r["doc_id"]: r["n_tokens"]
            for r in batch_corpus(
                spark.read.schema(DOC_SCHEMA).json(str(drop))
            ).collect()
        }
        assert set(got) == set(batch) == {1, 3, 4}
        # n_tokens agree wherever the surviving duplicate is ambiguous-free
        assert got[4] == batch[4]

    def test_incremental_run_processes_only_new_files(self, spark, swh, tmp_path):
        drop = tmp_path / "drop"
        ckpt = str(tmp_path / "ckpt")
        _drop(drop, "a.jsonl", [_doc(1, LONG)])
        run_corpus_stream(spark, swh, str(drop), ckpt)
        assert swh.read("corpus_shards").count() == 1
        v1 = swh.versions("corpus_shards")[-1]

        _drop(drop, "b.jsonl", [_doc(2, LONG), _doc(1, LONG + " again")])
        run_corpus_stream(spark, swh, str(drop), ckpt)
        rows = {r["doc_id"] for r in swh.read("corpus_shards").collect()}
        # doc 1 is beyond stream state in run 2 — the durable anti-join
        # (published corpus as authority) must still drop it.
        assert rows == {1, 2}
        assert swh.read("corpus_shards").count() == 2
        assert swh.versions("corpus_shards")[-1] > v1

    def test_exactly_once_under_duplicated_trigger(self, spark, swh, tmp_path):
        """Re-running foreachBatch with the SAME batch id (Spark's
        retry-after-failure contract) must not double-publish."""
        drop = tmp_path / "drop"
        _drop(drop, "a.jsonl", [_doc(1, LONG), _doc(2, LONG)])
        batch = batch_corpus(spark.read.schema(DOC_SCHEMA).json(str(drop)))

        landed = swh.append_once("corpus_shards", batch, txn="corpus-batch-0")
        replay = swh.append_once("corpus_shards", batch, txn="corpus-batch-0")
        assert landed is True and replay is False
        assert swh.read("corpus_shards").count() == 2
        assert [h["txn"] for h in swh.history("corpus_shards")] == ["corpus-batch-0"]

    def test_fresh_checkpoint_replay_is_deduped_by_corpus(self, spark, swh, tmp_path):
        """Losing the checkpoint entirely (worst case) re-streams every
        file; the published-corpus anti-join still prevents duplicates —
        only the snapshot log grows."""
        drop = tmp_path / "drop"
        _drop(drop, "a.jsonl", [_doc(1, LONG), _doc(2, LONG)])
        run_corpus_stream(spark, swh, str(drop), str(tmp_path / "ckpt1"))
        run_corpus_stream(spark, swh, str(drop), str(tmp_path / "ckpt2"))
        df = swh.read("corpus_shards")
        assert df.count() == 2
        assert df.groupBy("doc_id").count().filter(F.col("count") > 1).count() == 0


class TestStreamingOhlc:
    def test_stream_equals_batch_daily_bars(self, spark, tmp_path):
        """daily_ohlc under availableNow streaming must produce exactly
        the batch bars — min_by/max_by open/close are mergeable, so the
        same expression is the streaming operator (and its values agree
        with the hash-gated ts_ohlc_daily query's row_number form)."""
        from clinical_api_etl_spark.plans.analytics import ts_ohlc_daily
        from clinical_api_etl_spark.sources.catalog import load
        from clinical_api_etl_spark.streaming.windows import daily_ohlc

        sf = "/root/testdata/sf0.001"
        events = load(spark, sf, "events")
        src_dir = str(tmp_path / "events_parquet")
        events.write.parquet(src_dir)

        batch = {
            (r["day"], r["event_type"]): (
                r["open"], r["high"], r["low"], r["close"], r["volume"], r["total"],
            )
            for r in daily_ohlc(events).collect()
        }
        # Cross-check the two batch formulations (window row_number vs
        # mergeable min_by/max_by) agree before trusting the stream diff.
        query_form = {
            (r["day"], r["event_type"]): (
                r["open"], r["high"], r["low"], r["close"], r["volume"], r["total"],
            )
            for r in ts_ohlc_daily(spark, sf).collect()
        }
        assert batch == query_form

        stream = spark.readStream.schema(events.schema).parquet(src_dir)
        out_rows = []
        q = (
            daily_ohlc(stream, watermark="1 day")
            .writeStream.outputMode("complete")
            .foreachBatch(lambda df, bid: out_rows.extend(df.collect()))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {
            (r["day"], r["event_type"]): (
                r["open"], r["high"], r["low"], r["close"], r["volume"], r["total"],
            )
            for r in out_rows
        }
        assert got == batch
