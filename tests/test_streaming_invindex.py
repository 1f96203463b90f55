"""Streaming inverted index (streaming/invindex.py): BM25 search over
the incrementally maintained postings must equal the batch
retrieval_bm25_topk over the SAME documents bit-for-bit — after
out-of-order triggers and replayed/duplicate files."""

from __future__ import annotations

import json
import struct

import pytest
from pyspark.sql import functions as F

from clinical_api_etl_spark.sources.catalog import load
from clinical_api_etl_spark.streaming.invindex import StreamingInvertedIndex

SF = "/root/testdata/sf0.001"


def _write_docs(path, rows) -> None:
    with open(path, "w") as f:
        for doc_id, text in rows:
            f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")


def _key(rows):
    """(q, rank) -> (doc, bit-packed score) exact comparison."""
    return {
        (r["q_id"], r["rnk"]): (r["doc_id"], struct.pack("<d", r["score"]))
        for r in rows
    }


@pytest.fixture()
def docs(spark):
    rows = (
        load(spark, SF, "documents")
        .select("doc_id", "text")
        .filter(F.col("text").isNotNull())
        .orderBy("doc_id")
        .limit(60)
        .collect()
    )
    return [(r["doc_id"], r["text"]) for r in rows]


def _batch_twin(spark, index, doc_rows, k=5):
    """The batch scorer over exactly ``doc_rows`` with the same query
    token set the stream search uses."""
    from clinical_api_etl_spark.functions.text import tokens as tok_fn
    from clinical_api_etl_spark.plans.ranking.retrieval import (
        bm25_topk_from_tf,
    )

    df = spark.createDataFrame(doc_rows, "doc_id long, text string")
    tf = (
        df.select("doc_id", F.explode(tok_fn(F.col("text"))).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    q = tf.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("q_id"), "tok"
    )
    return bm25_topk_from_tf(tf, q, k=k)


def _queries(index):
    return (
        index.postings()
        .filter(F.col("doc_id") < 3)
        .select(F.col("doc_id").alias("q_id"), "tok")
    )


class TestStreamingInvertedIndex:
    def test_stream_equals_batch_after_out_of_order_triggers(
        self, spark, tmp_path, docs
    ):
        drop = tmp_path / "drop"
        drop.mkdir()
        ii = StreamingInvertedIndex(spark, str(tmp_path / "ii"))
        # later ids arrive FIRST, query docs arrive last
        _write_docs(drop / "b1.json", docs[30:])
        ii.run_stream(str(drop))
        _write_docs(drop / "b2.json", docs[:30])
        ii.run_stream(str(drop))
        got = _key(ii.search(_queries(ii)).collect())
        want = _key(_batch_twin(spark, ii, docs).collect())
        spark.catalog.clearCache()
        assert got == want

    def test_replayed_and_duplicate_files_are_noops(self, spark, tmp_path, docs):
        drop = tmp_path / "drop"
        drop.mkdir()
        ii = StreamingInvertedIndex(spark, str(tmp_path / "ii"))
        _write_docs(drop / "b1.json", docs[:40])
        ii.run_stream(str(drop))
        n_before = ii.postings().count()
        # identical content in a new file = duplicate doc_ids -> anti-joined
        _write_docs(drop / "b2.json", docs[:40])
        ii.run_stream(str(drop))
        assert ii.postings().count() == n_before
        got = _key(ii.search(_queries(ii)).collect())
        want = _key(_batch_twin(spark, ii, docs[:40]).collect())
        spark.catalog.clearCache()
        assert got == want

    def test_scores_track_corpus_growth(self, spark, tmp_path, docs):
        """df/N/avgdl derive from state at query time — after new docs
        arrive, the search must match a batch build over the GROWN
        corpus (no stale-statistics window)."""
        drop = tmp_path / "drop"
        drop.mkdir()
        ii = StreamingInvertedIndex(spark, str(tmp_path / "ii"))
        _write_docs(drop / "b1.json", docs[:20])
        ii.run_stream(str(drop))
        first = _key(ii.search(_queries(ii)).collect())
        assert first == _key(_batch_twin(spark, ii, docs[:20]).collect())
        _write_docs(drop / "b2.json", docs[20:50])
        ii.run_stream(str(drop))
        second = _key(ii.search(_queries(ii)).collect())
        spark.catalog.clearCache()
        assert second == _key(_batch_twin(spark, ii, docs[:50]).collect())
