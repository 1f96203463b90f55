"""Streaming quality-funnel monitor (streaming/funnelmon.py): the
incrementally maintained counters must equal the batch
``quality_funnel_from_docs`` EXACTLY — counts to the integer, retained
fractions to the bit — after out-of-order drops and no-op reruns."""

from __future__ import annotations

import json
import os
import struct

import pytest

from clinical_api_etl_spark.sources.catalog import load
from clinical_api_etl_spark.streaming.funnelmon import StreamingFunnelMonitor

SF = "/root/testdata/sf0.001"


def _write_json(path, rows) -> None:
    with open(path, "w") as f:
        for r in rows:
            f.write(
                json.dumps(
                    {
                        "doc_id": r["doc_id"],
                        "text": r["text"],
                        "n_chars": r["n_chars"],
                        "lang": r["lang"],
                    }
                )
                + "\n"
            )


def _key(rows):
    return {
        r["stage"]: (
            r["stage_name"],
            r["n_docs"],
            r["n_tokens"],
            struct.pack("<d", r["retained"]),
        )
        for r in rows
    }


@pytest.fixture()
def docs(spark):
    return (
        load(spark, SF, "documents")
        .select("doc_id", "text", "n_chars", "lang")
        .orderBy("doc_id")
        .limit(300)
        .collect()
    )


class TestStreamingFunnel:
    def test_stream_equals_batch_out_of_order(self, spark, tmp_path, docs):
        drop = tmp_path / "drop"
        drop.mkdir()
        waves = [
            [r for r in docs if r["doc_id"] % 3 == 2],
            [r for r in docs if r["doc_id"] % 3 == 0],
            [r for r in docs if r["doc_id"] % 3 == 1],
        ]
        mon = StreamingFunnelMonitor(spark, str(tmp_path / "state"))
        for i, wave in enumerate(waves):
            p = drop / f"w{i}.json"
            _write_json(p, wave)
            os.utime(p, (1_000_000.0 + i * 100,) * 2)
            mon.run_stream(str(drop))
        got = _key(mon.snapshot().collect())

        from clinical_api_etl_spark.plans.extensions import (
            quality_funnel_from_docs,
        )

        batch_docs = spark.createDataFrame(
            [
                (r["doc_id"], r["text"], r["n_chars"], r["lang"])
                for r in docs
            ],
            "doc_id long, text string, n_chars long, lang string",
        )
        want = _key(quality_funnel_from_docs(batch_docs).collect())
        assert got == want  # counters exact, retained bit-for-bit

    def test_rerun_without_new_files_is_noop(self, spark, tmp_path, docs):
        drop = tmp_path / "drop"
        drop.mkdir()
        _write_json(drop / "w0.json", docs[:100])
        mon = StreamingFunnelMonitor(spark, str(tmp_path / "state"))
        mon.run_stream(str(drop))
        before = _key(mon.snapshot().collect())
        mon.run_stream(str(drop))  # no new files
        assert _key(mon.snapshot().collect()) == before
        assert before[0][1] == 100  # stage-0 docs == dropped docs
