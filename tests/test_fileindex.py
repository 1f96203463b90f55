"""File-level skipping index: pruning correctness + equivalence to full scan."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from clinical_api_etl_spark.sources.catalog import load
from clinical_api_etl_spark.sources.fileindex import (
    build_file_index,
    load_file_index,
    prune,
    read_pruned,
)
from clinical_api_etl_spark.sources.layout import write_clustered

SF = "/root/testdata/sf0.001"


def _clustered_orders(spark, tmp_path) -> str:
    path = str(tmp_path / "orders_clustered")
    orders = load(spark, SF, "orders")
    write_clustered(orders, path, ["o_custkey"], num_files=8)
    return path


class TestPruning:
    def test_point_range_prunes_files(self, spark, tmp_path):
        path = _clustered_orders(spark, tmp_path)
        build_file_index(path, ["o_custkey"])
        idx = load_file_index(path)
        total = len(idx["files"])
        assert total >= 4
        surviving = prune(idx, {"o_custkey": (10, 20)})
        # Range-clustered layout => a narrow key range lives in O(1) files.
        assert 0 < len(surviving) < total / 2

    def test_pruned_read_equals_full_scan(self, spark, tmp_path):
        path = _clustered_orders(spark, tmp_path)
        build_file_index(path, ["o_custkey"])
        got = read_pruned(spark, path, {"o_custkey": (10, 20)})
        full = spark.read.parquet(path).filter(
            (F.col("o_custkey") >= 10) & (F.col("o_custkey") <= 20)
        )
        assert sorted(r.o_orderkey for r in got.collect()) == sorted(
            r.o_orderkey for r in full.collect()
        )
        assert got.count() > 0

    def test_open_ended_ranges(self, spark, tmp_path):
        path = _clustered_orders(spark, tmp_path)
        build_file_index(path, ["o_custkey"])
        hi = read_pruned(spark, path, {"o_custkey": (140, None)})
        full = spark.read.parquet(path).filter(F.col("o_custkey") >= 140)
        assert hi.count() == full.count()

    def test_empty_result_keeps_schema(self, spark, tmp_path):
        path = _clustered_orders(spark, tmp_path)
        build_file_index(path, ["o_custkey"])
        idx = load_file_index(path)
        assert prune(idx, {"o_custkey": (10**9, None)}) == []
        out = read_pruned(spark, path, {"o_custkey": (10**9, None)})
        assert out.count() == 0
        assert "o_orderkey" in out.columns

    def test_distributed_build_matches_driver_build(self, spark, tmp_path):
        path = _clustered_orders(spark, tmp_path)
        driver_idx = build_file_index(path, ["o_custkey"])
        dist_idx = build_file_index(path, ["o_custkey"], spark=spark)
        assert driver_idx == dist_idx

    def test_unindexed_column_is_conservative(self, spark, tmp_path):
        path = _clustered_orders(spark, tmp_path)
        build_file_index(path, ["o_custkey"])
        idx = load_file_index(path)
        # Predicate on a column the index never saw: nothing pruned.
        assert len(prune(idx, {"nonexistent": (0, 1)})) == len(idx["files"])

    def test_all_null_file_pruned_for_range(self, spark, tmp_path):
        path = str(tmp_path / "mixed")
        spark.createDataFrame([(1, 5), (2, 6)], ["id", "k"]).coalesce(1).write.mode(
            "overwrite"
        ).parquet(path)
        spark.createDataFrame(
            [(3, None), (4, None)], "id INT, k INT"
        ).coalesce(1).write.mode("append").parquet(path)
        build_file_index(path, ["k"])
        idx = load_file_index(path)
        assert len(idx["files"]) == 2
        surviving = prune(idx, {"k": (5, 6)})
        assert len(surviving) == 1  # the all-null file can never match
        got = read_pruned(spark, path, {"k": (5, 6)})
        assert sorted(r.id for r in got.collect()) == [1, 2]

    def test_index_stats_match_footers(self, spark, tmp_path):
        path = _clustered_orders(spark, tmp_path)
        idx = build_file_index(path, ["o_custkey"])
        assert sum(e["rows"] for e in idx["files"]) == spark.read.parquet(path).count()
        assert sorted(e["path"] for e in idx["files"]) == sorted(
            glob.glob(f"{path}/*.parquet")
        )
        for e in idx["files"]:
            st = e["columns"]["o_custkey"]
            assert st["min"] <= st["max"] and st["nulls"] == 0


class TestStreamingMaintenance:
    def test_foreachbatch_keeps_index_current(self, spark, tmp_path):
        """A streaming sink that appends parquet and rebuilds the sidecar
        per micro-batch: pruned reads stay exactly equal to full scans
        after every batch — the index is maintainable from foreachBatch
        the same way Delta keeps stats current on write."""
        from clinical_api_etl_spark.sources.catalog import load

        src_dir = str(tmp_path / "src")
        out_dir = tmp_path / "indexed"
        out_dir.mkdir()
        orders = load(spark, SF, "orders").select("o_orderkey", "o_custkey")
        half1 = orders.filter(F.col("o_custkey") < 75)
        half2 = orders.filter(F.col("o_custkey") >= 75)
        half1.write.parquet(f"{src_dir}/b1")

        def sink(df, batch_id):
            # Range-cluster each batch before appending so per-file stats
            # stay tight, then refresh the sidecar (footer-only).
            write_clustered(
                df, str(out_dir / f"batch{batch_id}"), ["o_custkey"], num_files=2
            )
            build_file_index(str(out_dir), ["o_custkey"])

        schema = half1.schema

        def run_stream(checkpoint_suffix):
            q = (
                spark.readStream.schema(schema)
                .parquet(f"{src_dir}/*")
                .writeStream.foreachBatch(sink)
                .option(
                    "checkpointLocation", str(tmp_path / "ck")
                )
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        run_stream("a")
        got1 = read_pruned(spark, str(out_dir), {"o_custkey": (10, 20)})
        want1 = half1.filter(F.col("o_custkey").between(10, 20))
        assert got1.count() == want1.count() > 0

        half2.write.parquet(f"{src_dir}/b2")
        run_stream("b")
        got2 = read_pruned(spark, str(out_dir), {"o_custkey": (70, 80)})
        want2 = orders.filter(F.col("o_custkey").between(70, 80))
        assert got2.count() == want2.count() > 0
        # Pruning still effective: narrow range reads a strict file subset.
        idx = load_file_index(str(out_dir))
        assert 0 < len(prune(idx, {"o_custkey": (10, 20)})) < len(idx["files"])


class TestIncrementalUpdate:
    def test_update_indexes_only_new_files(self, spark, tmp_path):
        from clinical_api_etl_spark.sources.fileindex import update_file_index

        path = _clustered_orders(spark, tmp_path)
        first = build_file_index(path, ["o_custkey"])
        n_before = len(first["files"])
        # No changes: zero fresh reads, identical index.
        idx, fresh = update_file_index(path)
        assert fresh == 0 and idx == first
        # Append a new file: exactly one fresh read; old entries reused
        # verbatim (same dict content incl. stats).
        extra = spark.createDataFrame([(10**7, 1)], "o_orderkey long, o_custkey long")
        extra.coalesce(1).write.mode("append").parquet(path)
        idx2, fresh2 = update_file_index(path)
        assert fresh2 == len(idx2["files"]) - n_before > 0
        old_paths = {e["path"] for e in first["files"]}
        carried = [e for e in idx2["files"] if e["path"] in old_paths]
        assert carried == first["files"]
        # Pruned reads see the new row.
        got = read_pruned(spark, path, {"o_custkey": (1, 1)})
        assert 10**7 in {r.o_orderkey for r in got.collect()}

    def test_update_drops_deleted_files(self, spark, tmp_path):
        import os

        from clinical_api_etl_spark.sources.fileindex import update_file_index

        path = _clustered_orders(spark, tmp_path)
        first = build_file_index(path, ["o_custkey"])
        victim = first["files"][0]["path"]
        os.unlink(victim)
        idx, fresh = update_file_index(path)
        assert fresh == 0
        assert victim not in {e["path"] for e in idx["files"]}
        assert len(idx["files"]) == len(first["files"]) - 1


class TestBloomPruning:
    def _corpus(self, spark, tmp_path) -> str:
        """8 files, each holding a disjoint set of string keys."""
        path = str(tmp_path / "bloomed")
        rows = [(i, f"user-{i:04d}", i % 7) for i in range(400)]
        df = spark.createDataFrame(rows, ["id", "who", "grp"])
        # cluster by id so each file holds a contiguous, disjoint id slice
        # (and therefore a disjoint who-set)
        from clinical_api_etl_spark.sources.layout import write_clustered

        write_clustered(df, path, ["id"], num_files=8)
        return path

    def test_equality_prunes_to_one_file_region(self, spark, tmp_path):
        from clinical_api_etl_spark.sources.fileindex import (
            build_file_index,
            load_file_index,
            prune,
        )

        path = self._corpus(spark, tmp_path)
        build_file_index(path, ["id"], bloom_columns=["who"])
        idx = load_file_index(path)
        total = len(idx["files"])
        assert total >= 4
        surviving = prune(idx, equals={"who": "user-0123"})
        assert 0 < len(surviving) < total / 2

    def test_type_mismatched_probe_keeps_files(self, spark, tmp_path):
        """ADVICE r04: an int probed against a string column's min/max
        must conservatively keep the file (fall through to the
        type-tagged bloom check), not raise TypeError."""
        from clinical_api_etl_spark.sources.fileindex import (
            build_file_index,
            load_file_index,
            prune,
        )

        path = self._corpus(spark, tmp_path)
        build_file_index(path, ["id"], bloom_columns=["who"])
        idx = load_file_index(path)
        surviving = prune(idx, equals={"who": 123})  # int vs string stats
        # min/max can't compare; the bloom (type-tagged) rejects the int.
        assert isinstance(surviving, list)

    def test_no_false_negatives(self, spark, tmp_path):
        from clinical_api_etl_spark.sources.fileindex import (
            build_file_index,
            load_file_index,
            prune,
        )
        import pyarrow.parquet as pq

        path = self._corpus(spark, tmp_path)
        build_file_index(path, ["id"], bloom_columns=["who"])
        idx = load_file_index(path)
        for probe in ("user-0000", "user-0123", "user-0399"):
            surviving = set(prune(idx, equals={"who": probe}))
            # every file that truly contains the value must survive
            for e in idx["files"]:
                vals = set(
                    pq.read_table(e["path"], columns=["who"])
                    .column("who")
                    .to_pylist()
                )
                if probe in vals:
                    assert e["path"] in surviving

    def test_pruned_read_equals_full_scan(self, spark, tmp_path):
        from clinical_api_etl_spark.sources.fileindex import (
            build_file_index,
            read_pruned,
        )
        from pyspark.sql import functions as F

        path = self._corpus(spark, tmp_path)
        build_file_index(path, ["id"], bloom_columns=["who"])
        got = read_pruned(spark, path, equals={"who": "user-0042"})
        full = spark.read.parquet(path).filter(F.col("who") == "user-0042")
        assert sorted(r.id for r in got.collect()) == sorted(
            r.id for r in full.collect()
        )
        assert got.count() == 1

    def test_absent_value_reads_nothing(self, spark, tmp_path):
        from clinical_api_etl_spark.sources.fileindex import (
            build_file_index,
            load_file_index,
            prune,
            read_pruned,
        )

        path = self._corpus(spark, tmp_path)
        build_file_index(path, ["id"], bloom_columns=["who"])
        idx = load_file_index(path)
        # high-probability prune of everything: value never written
        surviving = prune(idx, equals={"who": "user-9999"})
        assert len(surviving) <= 1  # allow one bloom false positive
        assert read_pruned(spark, path, equals={"who": "user-9999"}).count() == 0

    def test_unbloomed_column_is_conservative(self, spark, tmp_path):
        from clinical_api_etl_spark.sources.fileindex import (
            build_file_index,
            load_file_index,
            prune,
        )

        path = self._corpus(spark, tmp_path)
        build_file_index(path, ["id"], bloom_columns=["who"])
        idx = load_file_index(path)
        # grp has neither footer stats requested nor a bloom: keep all
        assert len(prune(idx, equals={"grp": 3})) == len(idx["files"])

    def test_type_tagging_separates_int_and_str(self, spark, tmp_path):
        from clinical_api_etl_spark.sources.fileindex import _bloom_slots

        assert _bloom_slots(1, 4096, 3) != _bloom_slots("1", 4096, 3)

    def test_ranges_and_equals_compose(self, spark, tmp_path):
        from clinical_api_etl_spark.sources.fileindex import (
            build_file_index,
            load_file_index,
            prune,
        )

        path = self._corpus(spark, tmp_path)
        build_file_index(path, ["id"], bloom_columns=["who"])
        idx = load_file_index(path)
        # range keeps the low-id files; equals names a high-id user ->
        # intersection prunes everything
        surviving = prune(idx, {"id": (0, 40)}, {"who": "user-0399"})
        assert surviving == []

    def test_incremental_update_preserves_bloom_config(self, spark, tmp_path):
        from clinical_api_etl_spark.sources.fileindex import (
            build_file_index,
            load_file_index,
            prune,
            update_file_index,
        )

        path = self._corpus(spark, tmp_path)
        build_file_index(path, ["id"], bloom_columns=["who"])
        # append one new file with a brand-new key
        extra = spark.createDataFrame([(1000, "user-1000", 0)], ["id", "who", "grp"])
        extra.coalesce(1).write.mode("append").parquet(path)
        idx, n_new = update_file_index(path)
        assert n_new >= 1
        assert idx["bloom_columns"] == ["who"]
        surviving = prune(idx, equals={"who": "user-1000"})
        assert len(surviving) >= 1
        # the new key lives only in fresh files, old files can prune
        assert len(surviving) < len(idx["files"])
