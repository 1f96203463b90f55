"""Streaming corpus data card (streaming/datacard.py): the incrementally
maintained artifact must equal the batch ``corpus_data_card`` EXACTLY
after any sequence of triggers, out-of-order and duplicated files
included."""

from __future__ import annotations

import json
import struct

import pytest
from pyspark.sql import functions as F

from clinical_api_etl_spark.sources.catalog import load
from clinical_api_etl_spark.streaming.datacard import StreamingDataCard

SF = "/root/testdata/sf0.001"


def _write_json_file(path, rows) -> None:
    with open(path, "w") as f:
        for r in rows:
            f.write(
                json.dumps(
                    {
                        "doc_id": r["doc_id"],
                        "text": r["text"],
                        "lang": r["lang"],
                        "source": r["source"],
                        "n_chars": r["n_chars"],
                    }
                )
                + "\n"
            )


def _card_key(rows):
    # exact comparison incl. the novelty double, bit-for-bit
    out = {}
    for r in rows:
        out[r["lang"]] = (
            r["n_docs"],
            r["n_tokens"],
            r["n_dup_docs"],
            r["n_windows"],
            r["n_shared"],
            struct.pack("<d", r["novelty"]),
            r["n_easy"],
            r["n_hard"],
        )
    return out


def _batch_card(spark, docs_df, tmp_path, name):
    """Run the registry corpus_data_card on exactly ``docs_df``."""
    from clinical_api_etl_spark.plans.registry import all_queries

    d = tmp_path / name
    docs_df.write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return all_queries()["corpus_data_card"].builder(spark, str(d)).collect()


@pytest.fixture()
def docs(spark):
    return (
        load(spark, SF, "documents")
        .orderBy("doc_id")
        .limit(120)
        .collect()
    )


class TestStreamingDataCard:
    def test_stream_equals_batch_after_out_of_order_triggers(
        self, spark, tmp_path, docs
    ):
        drop = tmp_path / "drop"
        drop.mkdir()
        card = StreamingDataCard(spark, str(tmp_path / "dc"))
        # three slices, dropped OUT OF ORDER across three triggers
        slices = [docs[80:120], docs[0:40], docs[40:80]]
        for i, sl in enumerate(slices):
            _write_json_file(drop / f"part-{i}.json", sl)
            card.run_stream(str(drop))
        got = _card_key(card.snapshot().collect())
        want_df = spark.createDataFrame(docs, schema=load(spark, SF, "documents").schema)
        want = _card_key(_batch_card(spark, want_df, tmp_path, "ref"))
        assert got == want

    def test_duplicate_and_replayed_files_are_noops(self, spark, tmp_path, docs):
        drop = tmp_path / "drop2"
        drop.mkdir()
        card = StreamingDataCard(spark, str(tmp_path / "dc2"))
        _write_json_file(drop / "a.json", docs[:60])
        card.run_stream(str(drop))
        snap1 = _card_key(card.snapshot().collect())
        # the same docs again under a new filename + an empty extra run
        _write_json_file(drop / "a-again.json", docs[:60])
        card.run_stream(str(drop))
        card.run_stream(str(drop))
        assert _card_key(card.snapshot().collect()) == snap1

    def test_incremental_growth_matches_batch_each_step(
        self, spark, tmp_path, docs
    ):
        drop = tmp_path / "drop3"
        drop.mkdir()
        card = StreamingDataCard(spark, str(tmp_path / "dc3"))
        schema = load(spark, SF, "documents").schema
        seen = []
        for i, sl in enumerate((docs[:50], docs[50:100])):
            seen += sl
            _write_json_file(drop / f"p{i}.json", sl)
            card.run_stream(str(drop))
            got = _card_key(card.snapshot().collect())
            want = _card_key(
                _batch_card(
                    spark,
                    spark.createDataFrame(seen, schema=schema),
                    tmp_path,
                    f"ref3-{i}",
                )
            )
            assert got == want, f"diverged after trigger {i}"
