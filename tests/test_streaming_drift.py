"""Streaming PH drift monitor (streaming/drift.py): the incrementally
maintained statistic must equal the batch ``ts_page_hinkley_drift``
EXACTLY after out-of-order and duplicated drops."""

from __future__ import annotations

import json
import os
import struct

import pytest

from clinical_api_etl_spark.sources.catalog import load
from clinical_api_etl_spark.streaming.drift import StreamingDriftMonitor

SF = "/root/testdata/sf0.001"


def _write_json(path, rows) -> None:
    with open(path, "w") as f:
        for r in rows:
            f.write(
                json.dumps(
                    {
                        "event_id": r["event_id"],
                        "user_id": r["user_id"],
                        "event_type": r["event_type"],
                        "value": r["value"],
                        "ts": r["ts"].isoformat(),
                    }
                )
                + "\n"
            )


def _key(rows):
    out = {}
    for r in rows:
        out[r["event_type"]] = (
            r["n_days"],
            struct.pack("<d", r["mean_cents"]),
            struct.pack("<d", r["m"]),
            struct.pack("<d", r["m_min"]),
            struct.pack("<d", r["ph"]),
            r["drift"],
        )
    return out


@pytest.fixture()
def events(spark):
    return load(spark, SF, "events").orderBy("event_id").limit(600).collect()


class TestStreamingDrift:
    def test_stream_equals_batch_out_of_order(self, spark, tmp_path, events):
        import pandas as pd

        drop = tmp_path / "drop"
        drop.mkdir()
        # out-of-order waves: late days arrive first
        w1 = [r for r in events if r["event_id"] % 3 == 2]
        w2 = [r for r in events if r["event_id"] % 3 == 0]
        w3 = [r for r in events if r["event_id"] % 3 == 1]
        mon = StreamingDriftMonitor(spark, str(tmp_path / "state"))
        for i, wave in enumerate((w1, w2, w3)):
            p = drop / f"w{i}.json"
            _write_json(p, wave)
            os.utime(p, (1_000_000.0 + i * 100, 1_000_000.0 + i * 100))
            mon.run_stream(str(drop))
        # NB: content-level dedup belongs UPSTREAM (streaming/corpus.py,
        # streaming/neardup.py); this monitor's contract is an
        # append-only drop folder of unique files + append_once
        # batch-replay protection — so no duplicate-content wave here.
        got = _key(mon.snapshot().collect())

        # batch twin on exactly the same events
        d = tmp_path / "batch"
        from clinical_api_etl_spark.plans.analytics import ts_page_hinkley_drift

        pdf = pd.DataFrame(
            [
                {
                    "event_id": r["event_id"],
                    "user_id": r["user_id"],
                    "event_type": r["event_type"],
                    "value": r["value"],
                    "ts": r["ts"],
                }
                for r in events
            ]
        )
        spark.createDataFrame(pdf).write.parquet(
            str(d / "events.parquet")
        )
        want = _key(ts_page_hinkley_drift(spark, str(d)).collect())
        assert got == want  # bit-for-bit

    def test_rerun_without_new_files_is_noop(self, spark, tmp_path, events):
        drop = tmp_path / "drop"
        drop.mkdir()
        _write_json(drop / "w.json", events[:200])
        mon = StreamingDriftMonitor(spark, str(tmp_path / "state"))
        mon.run_stream(str(drop))
        before = _key(mon.snapshot().collect())
        mon.run_stream(str(drop))  # no new files
        assert _key(mon.snapshot().collect()) == before
