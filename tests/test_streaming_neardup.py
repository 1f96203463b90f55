"""Streaming MinHash-LSH near-dup admission (streaming/neardup.py): the
checkpointed stream must equal the greedy-admission executable spec
replayed over the same arrival order, decisions must be maximal-
independent-set-shaped, and replays/duplicates must be no-ops."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from clinical_api_etl_spark.operators.dedup import lsh_bands
from clinical_api_etl_spark.streaming.neardup import (
    StreamingNearDup,
    greedy_admit,
)

WORDS = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa", "quebec", "romeo", "sierra", "tango",
]


def _doc(doc_id: int, words: list[str]) -> dict:
    return {"doc_id": doc_id, "text": " ".join(words), "ts": None}


def _mk_corpus() -> tuple[list[dict], list[dict]]:
    """Two arrival waves with planted near-dup families and distinct
    docs. Family texts differ by one word out of 48 (3-shingle Jaccard
    ~0.87 — far up the 8x4 S-curve)."""
    base_a = [WORDS[(i * 3 + i // 7) % 20] for i in range(48)]
    base_b = [WORDS[(i * 7 + 3 + i // 5) % 20] for i in range(48)]
    distinct1 = [WORDS[(i * 11 + 5 + i // 3) % 20] for i in range(48)]
    distinct2 = [WORDS[(i * 13 + 2 + i // 4) % 20] for i in range(48)]
    var = lambda base, k: base[:k] + ["zulu"] + base[k + 1 :]  # noqa: E731
    wave1 = [
        _doc(1, base_a),
        _doc(2, var(base_a, 5)),  # near-dup of 1 → reject
        _doc(3, distinct1),
        _doc(4, ["tiny", "doc"]),  # < 3 tokens → always admitted
    ]
    wave2 = [
        _doc(5, var(base_a, 11)),  # near-dup of admitted 1 → reject
        _doc(6, base_b),
        _doc(7, var(base_b, 2)),  # near-dup of 6 → reject
        _doc(8, distinct2),
    ]
    return wave1, wave2


def _write_wave(drop_dir, name: str, rows, mtime: float) -> None:
    path = os.path.join(drop_dir, name)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps({"doc_id": r["doc_id"], "text": r["text"]}) + "\n")
    os.utime(path, (mtime, mtime))


def _replay(spark, waves) -> dict[int, bool]:
    """The spec: per arrival wave, band-join vs admitted bands, then
    greedy in doc_id order — same lsh_bands expressions as the sink."""
    decided: dict[int, bool] = {}
    admitted_buckets: set[tuple[int, int]] = set()
    for wave in waves:
        fresh = [r for r in wave if r["doc_id"] not in decided]
        df = spark.createDataFrame(
            [(r["doc_id"], r["text"]) for r in fresh],
            "doc_id long, text string",
        )
        bt = [
            (r["doc_id"], r["band"], r["bucket"])
            for r in lsh_bands(df, "doc_id", "text").collect()
        ]
        state_rejected = {
            d for d, band, bucket in bt if (band, bucket) in admitted_buckets
        }
        surv = [r["doc_id"] for r in fresh if r["doc_id"] not in state_rejected]
        by_bucket: dict[tuple[int, int], set[int]] = {}
        for d, band, bucket in bt:
            if d in surv:
                by_bucket.setdefault((band, bucket), set()).add(d)
        edges = sorted(
            {
                (a, b)
                for ids in by_bucket.values()
                for a in ids
                for b in ids
                if a < b
            }
        )
        verdict = greedy_admit(surv, edges)
        for r in fresh:
            decided[r["doc_id"]] = bool(verdict.get(r["doc_id"], False))
        for d, band, bucket in bt:
            if decided.get(d):
                admitted_buckets.add((band, bucket))
    return decided


@pytest.fixture()
def dirs(tmp_path):
    drop = tmp_path / "drop"
    drop.mkdir()
    return str(drop), str(tmp_path / "state")


class TestStreamingNearDup:
    def test_stream_equals_greedy_replay(self, spark, dirs):
        drop, root = dirs
        wave1, wave2 = _mk_corpus()
        nd = StreamingNearDup(spark, root)
        _write_wave(drop, "w1.json", wave1, 1_000_000.0)
        nd.run_stream(drop)
        _write_wave(drop, "w2.json", wave2, 1_000_100.0)
        nd.run_stream(drop)
        got = {
            r["doc_id"]: r["admitted"] for r in nd.decisions().collect()
        }
        want = _replay(spark, [wave1, wave2])
        assert got == want
        # the planted families behave as designed
        assert got[1] and not got[2] and got[3] and got[4]
        assert not got[5] and got[6] and not got[7] and got[8]

    def test_admitted_set_is_maximal_independent(self, spark, dirs):
        drop, root = dirs
        wave1, wave2 = _mk_corpus()
        nd = StreamingNearDup(spark, root)
        _write_wave(drop, "w1.json", wave1, 1_000_000.0)
        _write_wave(drop, "w2.json", wave2, 1_000_100.0)
        nd.run_stream(drop)
        bands = nd.wh.read("nd_bands")
        a = bands.select(F.col("doc_id").alias("ia"), "band", "bucket")
        b = bands.select(F.col("doc_id").alias("ib"), "band", "bucket")
        collisions = (
            a.join(b, ["band", "bucket"]).filter(F.col("ia") < F.col("ib"))
        )
        assert collisions.count() == 0  # no two admitted docs collide
        dec = {r["doc_id"]: r["admitted"] for r in nd.decisions().collect()}
        assert len(dec) == 8

    def test_replays_and_duplicate_docs_are_noops(self, spark, dirs):
        drop, root = dirs
        wave1, wave2 = _mk_corpus()
        nd = StreamingNearDup(spark, root)
        _write_wave(drop, "w1.json", wave1, 1_000_000.0)
        nd.run_stream(drop)
        before = sorted(
            (r["doc_id"], r["admitted"]) for r in nd.decisions().collect()
        )
        # replay with no new files
        nd.run_stream(drop)
        # re-drop the same docs in a new file (beyond-checkpoint dupes)
        _write_wave(drop, "w1_again.json", wave1, 1_000_200.0)
        nd.run_stream(drop)
        after = sorted(
            (r["doc_id"], r["admitted"]) for r in nd.decisions().collect()
        )
        assert before == after
