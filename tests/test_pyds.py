"""Custom Python DataSource invariants (sources/pyds.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from clinical_api_etl_spark.sources.pyds import SyntheticEventsDataSource


def _read(spark, **opts):
    spark.dataSource.register(SyntheticEventsDataSource)
    r = spark.read.format("synthetic_events")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


class TestSyntheticEventsSource:
    def test_row_count_and_partitioning(self, spark):
        df = _read(spark, rows=10_000, partitions=16)
        assert df.count() == 10_000
        assert df.rdd.getNumPartitions() == 16
        # disjoint ranges: ids are exactly 0..N-1, once each
        agg = df.agg(
            F.countDistinct("event_id").alias("d"),
            F.min("event_id").alias("lo"),
            F.max("event_id").alias("hi"),
        ).first()
        assert (agg["d"], agg["lo"], agg["hi"]) == (10_000, 0, 9_999)

    def test_deterministic_across_reads_and_partitionings(self, spark):
        a = _read(spark, rows=2_000, partitions=4)
        b = _read(spark, rows=2_000, partitions=13)
        assert a.exceptAll(b).count() == 0
        assert b.exceptAll(a).count() == 0

    def test_field_domains_support_downstream_operators(self, spark):
        df = _read(spark, rows=5_000, partitions=8, users=50)
        assert df.filter(F.col("user_id") >= 50).count() == 0
        assert df.filter((F.col("value") < 0) | (F.col("value") >= 50)).count() == 0
        types = {r["event_type"] for r in df.select("event_type").distinct().collect()}
        assert types <= {"view", "click", "purchase", "signup", "error"}
        # the generated stream feeds the real operators: hourly roll-up runs
        from clinical_api_etl_spark.streaming.windows import hourly_rollup

        assert hourly_rollup(df).count() > 0


class TestSyntheticEventsStream:
    def test_stream_emits_contiguous_deterministic_batches(self, spark, tmp_path):
        import time

        spark.dataSource.register(SyntheticEventsDataSource)
        stream = (
            spark.readStream.format("synthetic_events")
            .option("rowsPerBatch", 50)
            .load()
        )
        out_rows = []
        q = (
            stream.writeStream.foreachBatch(
                lambda df, bid: out_rows.extend(df.collect())
            )
            .option("checkpointLocation", str(tmp_path / "sckpt"))
            .trigger(processingTime="0 seconds")
            .start()
        )
        deadline = time.time() + 60
        while len(out_rows) < 150 and time.time() < deadline:
            time.sleep(0.5)
        q.stop()
        assert len(out_rows) >= 150
        ids = sorted(r["event_id"] for r in out_rows)
        # contiguous from 0, no gaps, no duplicates (offset contract)
        assert ids[:150] == list(range(150))
        # batch contents equal the batch-read rows for the same ids (replay
        # determinism: same md5 derivation on both faces of the source)
        batch = {
            r["event_id"]: (r["user_id"], r["event_type"], r["value"])
            for r in _read(spark, rows=150, partitions=4).collect()
        }
        for r in out_rows:
            if r["event_id"] < 150:
                assert batch[r["event_id"]] == (
                    r["user_id"], r["event_type"], r["value"]
                )


class TestManifestJsonlSink:
    def _register(self, spark):
        from clinical_api_etl_spark.sources.manifest_jsonl import (
            ManifestJsonlDataSource,
        )

        spark.dataSource.register(ManifestJsonlDataSource)

    def test_write_read_roundtrip_via_manifest(self, spark, tmp_path):
        import json

        self._register(spark)
        path = str(tmp_path / "sink")
        src = spark.createDataFrame(
            [(1, "a", 1.5), (2, "b", 2.5), (3, None, None)],
            "id long, s string, v double",
        )
        src.write.format("manifest_jsonl").mode("overwrite").save(path)
        manifest = json.load(open(f"{path}/_manifest.json"))
        assert manifest["rows"] == 3
        back = (
            spark.read.format("manifest_jsonl")
            .schema("id long, s string, v double")
            .load(path)
        )
        assert back.exceptAll(src).count() == 0 and src.exceptAll(back).count() == 0

    def test_unmanifested_files_are_invisible(self, spark, tmp_path):
        self._register(spark)
        path = str(tmp_path / "sink2")
        spark.createDataFrame([(1, "a", 0.1)], "id long, s string, v double") \
            .write.format("manifest_jsonl").mode("overwrite").save(path)
        # a torn write: a part file that never reached the manifest
        with open(f"{path}/part-torn.jsonl", "w") as f:
            f.write('{"id": 99, "s": "ghost", "v": 9.9}\n')
        back = (
            spark.read.format("manifest_jsonl")
            .schema("id long, s string, v double")
            .load(path)
        )
        assert [r["id"] for r in back.collect()] == [1]

    def test_append_merges_manifest(self, spark, tmp_path):
        import json

        self._register(spark)
        path = str(tmp_path / "sink3")
        df = spark.createDataFrame([(1, "a", 0.1)], "id long, s string, v double")
        df.write.format("manifest_jsonl").mode("overwrite").save(path)
        spark.createDataFrame([(2, "b", 0.2)], "id long, s string, v double") \
            .write.format("manifest_jsonl").mode("append").save(path)
        manifest = json.load(open(f"{path}/_manifest.json"))
        assert manifest["rows"] == 2
        back = (
            spark.read.format("manifest_jsonl")
            .schema("id long, s string, v double")
            .load(path)
        )
        assert sorted(r["id"] for r in back.collect()) == [1, 2]


class TestJsonlSinkWriter:
    def test_roundtrip_and_manifest(self, spark, tmp_path):
        import json
        import os

        from clinical_api_etl_spark.sources.pyds import JsonlSinkDataSource

        spark.dataSource.register(JsonlSinkDataSource)
        dest = str(tmp_path / "out")
        df = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "id long, s string"
        ).repartition(3)
        df.write.format("jsonl_sink").option("path", dest).mode("append").save()

        names = sorted(os.listdir(dest))
        assert "_SUCCESS" in names
        parts = [n for n in names if n.startswith("part-")]
        assert parts and not [n for n in names if n.startswith("_tmp-")]
        manifest = json.loads(open(os.path.join(dest, "_SUCCESS")).readline())
        assert manifest["rows"] == 3
        assert sorted(manifest["files"]) == parts

        back = spark.read.json(os.path.join(dest, "part-*"))
        assert {(r.id, r.s) for r in back.collect()} == {
            (1, "a"), (2, "b"), (3, "c"),
        }

    def test_overwrite_replaces_published_files(self, spark, tmp_path):
        import os

        from clinical_api_etl_spark.sources.pyds import JsonlSinkDataSource

        spark.dataSource.register(JsonlSinkDataSource)
        dest = str(tmp_path / "out")
        a = spark.createDataFrame([(1, "a")], "id long, s string")
        b = spark.createDataFrame([(9, "z")], "id long, s string")
        a.write.format("jsonl_sink").option("path", dest).mode("append").save()
        b.write.format("jsonl_sink").option("path", dest).mode(
            "overwrite"
        ).save()
        back = spark.read.json(os.path.join(dest, "part-*"))
        assert [(r.id, r.s) for r in back.collect()] == [(9, "z")]

    def test_overwrite_rewrites_manifest_single_line(self, spark, tmp_path):
        """ADVICE r04: overwrite deletes prior part-* files, so an appended
        manifest would keep naming dead files. After overwrite, _SUCCESS
        must contain exactly one line naming exactly the live files."""
        import json
        import os

        from clinical_api_etl_spark.sources.pyds import JsonlSinkDataSource

        spark.dataSource.register(JsonlSinkDataSource)
        dest = str(tmp_path / "out")
        a = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
        b = spark.createDataFrame([(9, "z")], "id long, s string")
        a.write.format("jsonl_sink").option("path", dest).mode("append").save()
        b.write.format("jsonl_sink").option("path", dest).mode("overwrite").save()
        lines = open(os.path.join(dest, "_SUCCESS")).read().splitlines()
        assert len(lines) == 1
        manifest = json.loads(lines[0])
        live = sorted(n for n in os.listdir(dest) if n.startswith("part-"))
        assert sorted(manifest["files"]) == live and manifest["rows"] == 1

    def test_commit_sweeps_orphaned_tmp_files(self, spark, tmp_path):
        """ADVICE r04: a retried task whose job succeeds leaves its losing
        attempt's _tmp-* staged file — commit() must sweep strays."""
        import os

        from clinical_api_etl_spark.sources.pyds import JsonlSinkDataSource

        spark.dataSource.register(JsonlSinkDataSource)
        dest = tmp_path / "out"
        dest.mkdir()
        (dest / "_tmp-deadbeef.jsonl").write_text('{"id": 0, "s": "lost"}\n')
        df = spark.createDataFrame([(1, "a")], "id long, s string")
        df.write.format("jsonl_sink").option("path", str(dest)).mode("append").save()
        names = os.listdir(dest)
        assert not [n for n in names if n.startswith("_tmp-")]
        assert [n for n in names if n.startswith("part-")]

    def test_failed_job_publishes_nothing(self, spark, tmp_path):
        import os

        from pyspark.sql import functions as F

        from clinical_api_etl_spark.sources.pyds import JsonlSinkDataSource

        spark.dataSource.register(JsonlSinkDataSource)
        dest = str(tmp_path / "out")
        # a poison row: division by zero evaluated task-side mid-write
        df = spark.range(10).select(
            (F.lit(1) / (F.col("id") - 5)).alias("x")
        )
        try:
            df.write.format("jsonl_sink").option("path", dest).mode(
                "append"
            ).save()
        except Exception:
            pass
        if os.path.isdir(dest):
            assert not [
                n for n in os.listdir(dest) if n.startswith("part-")
            ]
            assert "_SUCCESS" not in os.listdir(dest)
