"""Training-shard publisher: bounded shards + dataset card as commit mark."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clinical_api_etl_spark.sources.shards import (
    publish_shards,
    read_published,
)


class TestShardPublisher:
    def test_row_bounds_and_card_totals(self, spark, tmp_path):
        df = spark.range(0, 2500).select(
            F.col("id").alias("doc_id"), (F.col("id") % 7 + 1).alias("n_tokens")
        )
        path = str(tmp_path / "ds")
        card = publish_shards(
            df, path, rows_per_shard=400, partitions=2, token_col="n_tokens"
        )
        assert card["n_rows"] == 2500
        assert all(n <= 400 for n in card["shards"].values())
        assert card["n_shards"] >= 7  # ceil(2500/400) across 2 partitions
        expect_tokens = sum((i % 7) + 1 for i in range(2500))
        assert card["n_tokens"] == expect_tokens

        back, card2 = read_published(spark, path)
        assert back.count() == 2500
        assert card2 == card

    def test_missing_card_means_incomplete(self, spark, tmp_path):
        df = spark.range(0, 10).select(F.col("id").alias("doc_id"))
        path = str(tmp_path / "raw")
        df.write.parquet(path)  # no card written
        with pytest.raises(FileNotFoundError, match="incomplete"):
            read_published(spark, path)


class TestPipelinePublish:
    def test_corpus_pipeline_publishes_and_reads_back(self, spark, tmp_path):
        """The whole training-data story end-to-end: curated-corpus query ->
        shard publish -> card totals == query output -> read-back equality."""
        from clinical_api_etl_spark.plans.registry import all_queries

        q = all_queries()["pipeline_training_corpus"]
        out = q.builder(spark, "/root/testdata/sf0.001")
        n = out.count()
        path = str(tmp_path / "published")
        card = publish_shards(out, path, rows_per_shard=50, partitions=2)
        spark.catalog.clearCache()
        assert card["n_rows"] == n
        back, card2 = read_published(spark, path)
        assert back.count() == n
        assert sorted(back.columns) == sorted(out.columns)
