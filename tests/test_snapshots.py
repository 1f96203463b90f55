"""SnapshotWarehouse: manifest-pinned MVCC over plain parquet.

Inherited merge semantics must match ParquetWarehouse exactly; on top of
that the snapshot log must deliver what directory swaps cannot — readers
isolated from concurrent commits, time travel, file reuse for untouched
partitions, and maintenance (compact/vacuum) that never breaks the live
snapshot.
"""

from __future__ import annotations

import threading
from pathlib import Path

import pytest

from clinical_api_etl_spark.sources.snapshots import SnapshotWarehouse

GOLD_SCHEMA = "study_id string, participant_id string, v double"


@pytest.fixture()
def swh(spark, tmp_path):
    return SnapshotWarehouse(
        spark,
        str(tmp_path / "swh"),
        partitioning={"gold": ["study_id"], "jobs": ["id"]},
    )


class TestInheritedMergeSemantics:
    def test_upsert_last_write_wins(self, spark, swh):
        a = spark.createDataFrame(
            [("s1", "p1", 1.0), ("s1", "p2", 2.0), ("s2", "p1", 3.0)], GOLD_SCHEMA
        )
        b = spark.createDataFrame(
            [("s2", "p1", 30.0), ("s2", "p9", 31.0), ("s3", "p1", 40.0)], GOLD_SCHEMA
        )
        swh.upsert("gold", a, ["study_id", "participant_id"])
        swh.upsert("gold", b, ["study_id", "participant_id"])
        got = {
            (r["study_id"], r["participant_id"]): r["v"]
            for r in swh.read("gold").collect()
        }
        assert got == {
            ("s1", "p1"): 1.0,
            ("s1", "p2"): 2.0,
            ("s2", "p1"): 30.0,
            ("s2", "p9"): 31.0,
            ("s3", "p1"): 40.0,
        }

    def test_asymmetric_aggregation_merge(self, spark, swh):
        cols = (
            "study_id string, measurement_type string, cnt long, avg_num double,"
            " min_num double, max_num double, job_id string"
        )
        j1 = spark.createDataFrame(
            [("s1", "hr", 4, 70.0, 60.0, 80.0, "j1"), ("s2", "hr", 2, 90.0, 85.0, 95.0, "j1")],
            cols,
        )
        j2 = spark.createDataFrame([("s2", "hr", 3, 100.0, 99.0, 101.0, "j2")], cols)
        swh.merge_aggregations("gold", j1, ["study_id", "measurement_type"])
        swh.merge_aggregations("gold", j2, ["study_id", "measurement_type"])
        rows = {r["study_id"]: r for r in swh.read("gold").collect()}
        assert rows["s2"]["cnt"] == 3 and rows["s2"]["avg_num"] == 100.0
        assert rows["s2"]["min_num"] == 85.0 and rows["s2"]["max_num"] == 101.0
        assert rows["s1"]["job_id"] == "j1"

    def test_append_if_absent_idempotent(self, spark, swh):
        df = spark.createDataFrame([("j1", "x"), ("j2", "y")], "id string, p string")
        swh.append_if_absent("jobs", df, ["id"])
        swh.append_if_absent("jobs", df, ["id"])  # re-ingest
        assert swh.read("jobs").count() == 2

    def test_missing_table_reads_none(self, swh):
        assert swh.read("never_written") is None


class TestSnapshotIsolation:
    def test_reader_pinned_across_commit(self, spark, swh):
        """A DataFrame planned against snapshot N keeps returning
        snapshot N's rows after later commits — the property the
        directory-swap design could only approximate with retries."""
        a = spark.createDataFrame([("s1", "p1", 1.0)], GOLD_SCHEMA)
        swh.upsert("gold", a, ["study_id", "participant_id"])
        pinned = swh.read("gold")

        b = spark.createDataFrame([("s1", "p1", 99.0), ("s2", "p1", 2.0)], GOLD_SCHEMA)
        swh.upsert("gold", b, ["study_id", "participant_id"])

        assert [(r["participant_id"], r["v"]) for r in pinned.collect()] == [("p1", 1.0)]
        latest = {(r["study_id"], r["v"]) for r in swh.read("gold").collect()}
        assert latest == {("s1", 99.0), ("s2", 2.0)}

    def test_time_travel_and_history(self, spark, swh):
        v1 = spark.createDataFrame([("s1", "p1", 1.0)], GOLD_SCHEMA)
        v2 = spark.createDataFrame([("s1", "p1", 2.0)], GOLD_SCHEMA)
        swh.upsert("gold", v1, ["study_id", "participant_id"])
        swh.upsert("gold", v2, ["study_id", "participant_id"])
        assert swh.read("gold", version=1).collect()[0]["v"] == 1.0
        assert swh.read("gold", version=2).collect()[0]["v"] == 2.0
        ops = [h["operation"] for h in swh.history("gold")]
        assert ops[0] == "rewrite" and ops[1].startswith("merge[")
        with pytest.raises(ValueError):
            swh.read("gold", version=99)


class TestFileReuse:
    def test_untouched_partition_files_carried_by_path(self, spark, swh):
        a = spark.createDataFrame(
            [("s1", "p1", 1.0), ("s2", "p1", 3.0)], GOLD_SCHEMA
        )
        swh.upsert("gold", a, ["study_id", "participant_id"])
        before = {
            f for f in swh._load_manifest("gold")["files"] if "study_id=s1" in f
        }
        assert before

        b = spark.createDataFrame([("s2", "p1", 30.0)], GOLD_SCHEMA)
        swh.upsert("gold", b, ["study_id", "participant_id"])
        after = {
            f for f in swh._load_manifest("gold")["files"] if "study_id=s1" in f
        }
        # not merely byte-identical: the SAME files, shared across snapshots
        assert after == before


class TestMaintenance:
    def test_compact_single_relation_same_rows(self, spark, swh):
        for i in range(3):
            swh.append(
                "gold",
                spark.createDataFrame([(f"s{i}", "p1", float(i))], GOLD_SCHEMA),
            )
        rows_before = {
            (r["study_id"], r["v"]) for r in swh.read("gold").collect()
        }
        assert len({f.split("/")[0] for f in swh._load_manifest("gold")["files"]}) == 3
        swh.compact("gold")
        m = swh._load_manifest("gold")
        assert len({f.split("/")[0] for f in m["files"]}) == 1
        rows_after = {(r["study_id"], r["v"]) for r in swh.read("gold").collect()}
        assert rows_after == rows_before

    def test_vacuum_drops_only_unreferenced(self, spark, swh):
        v1 = spark.createDataFrame([("s1", "p1", 1.0)], GOLD_SCHEMA)
        v2 = spark.createDataFrame([("s1", "p1", 2.0)], GOLD_SCHEMA)
        swh.upsert("gold", v1, ["study_id", "participant_id"])
        swh.upsert("gold", v2, ["study_id", "participant_id"])
        removed = swh.vacuum("gold", keep_last=1)
        assert removed > 0
        assert swh.versions("gold") == [2]
        assert swh.read("gold").collect()[0]["v"] == 2.0
        data_root = Path(swh.root) / "gold" / "data"
        on_disk = {
            str(p.relative_to(data_root)) for p in data_root.rglob("*.parquet")
        }
        assert on_disk == set(swh._load_manifest("gold")["files"])


class TestWriterSerialization:
    def test_concurrent_upserts_lose_no_rows(self, spark, swh):
        errors: list[Exception] = []

        def work(i: int) -> None:
            try:
                df = spark.createDataFrame(
                    [(f"job-{i}", "done")], "id string, status string"
                )
                swh.upsert("jobs", df, ["id"])
            except Exception as e:  # noqa: BLE001
                errors.append(e)

        threads = [threading.Thread(target=work, args=(i,)) for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert errors == []
        assert swh.read("jobs").count() == 8


class TestIncrementalCorpusDedup:
    def test_append_only_novel_documents(self, spark, tmp_path):
        """Incremental corpus building: each batch appends only documents
        whose content digest is NOT already in the warehouse (anti-join on
        md5 — at 100 TB the digest column is a narrow scan of the corpus
        table, or a bucketed digest index; never a text comparison). The
        corpus stays exactly-once under re-delivered and overlapping
        batches, and history shows one commit per effective append."""
        from pyspark.sql import functions as F

        from clinical_api_etl_spark.sources.snapshots import SnapshotWarehouse

        wh = SnapshotWarehouse(spark, str(tmp_path / "wh"))

        def batch(rows):
            return spark.createDataFrame(rows, "doc_id long, text string")

        def ingest(df):
            with_digest = df.withColumn("digest", F.md5("text"))
            existing = wh.read("corpus")
            novel = (
                with_digest
                if existing is None
                else with_digest.join(
                    F.broadcast(existing.select("digest").distinct()),
                    "digest",
                    "left_anti",
                )
            )
            # within-batch dedup too: first doc_id wins per digest
            novel = (
                novel.withColumn(
                    "rn",
                    F.row_number().over(
                        __import__("pyspark").sql.Window.partitionBy(
                            "digest"
                        ).orderBy("doc_id")
                    ),
                )
                .filter(F.col("rn") == 1)
                .drop("rn")
            )
            if novel.take(1):
                wh.append("corpus", novel)

        ingest(batch([(1, "alpha"), (2, "beta"), (3, "beta")]))  # 3 -> dup of 2
        ingest(batch([(4, "beta"), (5, "gamma")]))  # 4 known, 5 novel
        ingest(batch([(6, "beta"), (7, "alpha")]))  # nothing novel

        got = {
            r["text"]: r["doc_id"] for r in wh.read("corpus").collect()
        }
        assert got == {"alpha": 1, "beta": 2, "gamma": 5}
        # third ingest appended nothing: only 2 commits in history
        assert len(wh.history("corpus")) == 2


class TestDeletionVectors:
    def _mkdocs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_delete_without_rewrite_and_time_travel(self, spark, swh, tmp_path):
        import hashlib

        swh.append("docs", self._mkdocs(spark, [(1, "a"), (2, "b"), (3, "c")]))
        root = swh._data_root("docs")
        before = {
            str(p): hashlib.md5(p.read_bytes()).hexdigest()
            for p in root.rglob("*.parquet")
        }
        n = swh.delete_where("docs", "doc_id = 2", "doc_id")
        assert n == 1
        # data files untouched byte-for-byte (only a tombstone was added)
        after = {
            str(p): hashlib.md5(p.read_bytes()).hexdigest()
            for p in root.rglob("*.parquet")
            if str(p) in before
        }
        assert after == before
        assert {r["doc_id"] for r in swh.read("docs").collect()} == {1, 3}
        # time travel to the pre-delete snapshot still sees the row
        assert {
            r["doc_id"] for r in swh.read("docs", version=1).collect()
        } == {1, 2, 3}
        assert swh.history("docs")[-1]["operation"] == "delete[doc_id]"

    def test_delete_does_not_leak_onto_later_appends(self, spark, swh):
        swh.append("docs", self._mkdocs(spark, [(1, "a"), (2, "b")]))
        swh.delete_where("docs", "doc_id = 2", "doc_id")
        # re-append the same key AFTER the delete: must be visible
        swh.append("docs", self._mkdocs(spark, [(2, "b-v2")]))
        got = {r["doc_id"]: r["text"] for r in swh.read("docs").collect()}
        assert got == {1: "a", 2: "b-v2"}

    def test_compact_materializes_and_clears_vectors(self, spark, swh):
        swh.append("docs", self._mkdocs(spark, [(i, f"t{i}") for i in range(10)]))
        swh.delete_where("docs", "doc_id >= 7", "doc_id")
        swh.compact("docs")
        m = swh._load_manifest("docs")
        assert m["deletes"] == [] and m["operation"] == "rewrite"
        assert {r["doc_id"] for r in swh.read("docs").collect()} == set(range(7))

    def test_vacuum_retains_referenced_tombstones(self, spark, swh):
        swh.append("docs", self._mkdocs(spark, [(1, "a"), (2, "b")]))
        swh.delete_where("docs", "doc_id = 1", "doc_id")
        removed = swh.vacuum("docs", keep_last=1)
        assert removed == 0  # live snapshot references data AND tombstones
        assert {r["doc_id"] for r in swh.read("docs").collect()} == {2}
        # after compaction the tombstone is unreferenced and vacuumable
        swh.compact("docs")
        assert swh.vacuum("docs", keep_last=1) > 0
        assert {r["doc_id"] for r in swh.read("docs").collect()} == {2}

    def test_stacked_deletes(self, spark, swh):
        swh.append("docs", self._mkdocs(spark, [(i, f"t{i}") for i in range(6)]))
        assert swh.delete_where("docs", "doc_id IN (0, 1)", "doc_id") == 2
        assert swh.delete_where("docs", "doc_id = 5", "doc_id") == 1
        # deleting an already-deleted key is a no-op commit
        assert swh.delete_where("docs", "doc_id = 0", "doc_id") == 0
        assert {r["doc_id"] for r in swh.read("docs").collect()} == {2, 3, 4}


class TestChangeDataFeed:
    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_inserts_and_deletes_between_versions(self, spark, swh):
        swh.append("docs", self._docs(spark, [(1, "a"), (2, "b")]))  # v1
        swh.append("docs", self._docs(spark, [(3, "c")]))  # v2
        swh.delete_where("docs", "doc_id = 1", "doc_id")  # v3
        ch = swh.read_changes("docs", 1).collect()
        inserts = {r["doc_id"] for r in ch if r["_change_type"] == "insert"}
        deletes = {r["doc_id"] for r in ch if r["_change_type"] == "delete"}
        assert inserts == {3} and deletes == {1}

    def test_insert_then_delete_within_window_suppressed(self, spark, swh):
        swh.append("docs", self._docs(spark, [(1, "a")]))  # v1
        swh.append("docs", self._docs(spark, [(2, "b")]))  # v2
        swh.delete_where("docs", "doc_id = 2", "doc_id")  # v3
        ch = swh.read_changes("docs", 1).collect()
        # row 2 never survives to the target snapshot: no insert for it
        assert {r["doc_id"] for r in ch if r["_change_type"] == "insert"} == set()
        assert {r["doc_id"] for r in ch if r["_change_type"] == "delete"} == {2}

    def test_applying_feed_reproduces_snapshot(self, spark, swh):
        from pyspark.sql import functions as F

        swh.append("docs", self._docs(spark, [(1, "a"), (2, "b")]))  # v1
        base = swh.read("docs", 1).collect()
        swh.append("docs", self._docs(spark, [(3, "c"), (4, "d")]))  # v2
        swh.delete_where("docs", "doc_id IN (2, 3)", "doc_id")  # v3
        ch = swh.read_changes("docs", 1)
        copy = {r["doc_id"]: r["text"] for r in base}
        for r in ch.collect():
            if r["_change_type"] == "insert":
                copy[r["doc_id"]] = r["text"]
            else:
                copy.pop(r["doc_id"], None)
        want = {r["doc_id"]: r["text"] for r in swh.read("docs").collect()}
        assert copy == want

    def test_rewrite_between_versions_raises(self, spark, swh):
        swh.append("docs", self._docs(spark, [(1, "a")]))
        swh.compact("docs")
        with pytest.raises(ValueError, match="resync"):
            swh.read_changes("docs", 1)

    def test_no_changes_yields_empty_feed(self, spark, swh):
        swh.append("docs", self._docs(spark, [(1, "a")]))
        assert swh.read_changes("docs", 1).count() == 0


class TestPurge:
    """Right-to-be-forgotten: bytes gone from ALL retained history,
    everything else's time travel intact."""

    def _scan_all_values(self, root: Path, col: str) -> set:
        import pyarrow.parquet as pq

        vals: set = set()
        for p in root.rglob("*.parquet"):
            t = pq.read_table(p)
            if col in t.column_names:
                vals.update(t.column(col).to_pylist())
        return vals

    def test_purged_key_gone_from_every_version_and_from_disk(
        self, spark, tmp_path
    ):
        wh = SnapshotWarehouse(spark, str(tmp_path / "wh"))
        s = "user string, v long"
        wh.append("t", spark.createDataFrame([("alice", 1), ("bob", 2)], s))
        wh.append("t", spark.createDataFrame([("alice", 3), ("carol", 4)], s))
        assert len(wh.versions("t")) == 2
        n = wh.purge("t", "user = 'alice'", "user")
        assert n == 1
        # Every historical version readable, alice absent, others intact.
        assert {(r.user, r.v) for r in wh.read("t", 1).collect()} == {("bob", 2)}
        assert {(r.user, r.v) for r in wh.read("t", 2).collect()} == {
            ("bob", 2),
            ("carol", 4),
        }
        assert {(r.user, r.v) for r in wh.read("t").collect()} == {
            ("bob", 2),
            ("carol", 4),
        }
        # No trace in any parquet byte on disk.
        root = Path(str(tmp_path / "wh")) / "t" / "data"
        assert "alice" not in self._scan_all_values(root, "user")
        # The operation is recorded.
        assert wh.history("t")[-1]["operation"] == "purge[user]"

    def test_purge_cleans_tombstones_and_respects_other_dvs(self, spark, tmp_path):
        wh = SnapshotWarehouse(spark, str(tmp_path / "wh"))
        s = "user string, v long"
        wh.append(
            "t",
            spark.createDataFrame(
                [("alice", 1), ("bob", 2), ("carol", 3)], s
            ),
        )
        # DV-delete alice AND bob: tombstone file holds both keys.
        wh.delete_where("t", "user IN ('alice', 'bob')", "user")
        assert {r.user for r in wh.read("t").collect()} == {"carol"}
        n = wh.purge("t", "user = 'alice'", "user")
        assert n == 1  # alice existed in raw files even though DV-hidden
        # bob's tombstone must still hide bob at the latest version.
        assert {r.user for r in wh.read("t").collect()} == {"carol"}
        # Version 1 (pre-delete) shows bob and carol but never alice.
        assert {r.user for r in wh.read("t", 1).collect()} == {"bob", "carol"}
        root = Path(str(tmp_path / "wh")) / "t" / "data"
        vals = self._scan_all_values(root, "user")
        assert "alice" not in vals and "bob" in vals

    def test_purge_partitioned_table_preserves_other_partitions(
        self, spark, swh, tmp_path
    ):
        a = spark.createDataFrame(
            [("s1", "alice", 1.0), ("s1", "bob", 2.0), ("s2", "alice", 3.0)],
            GOLD_SCHEMA,
        )
        b = spark.createDataFrame([("s2", "dora", 9.0)], GOLD_SCHEMA)
        swh.upsert("gold", a, ["study_id", "participant_id"])
        swh.upsert("gold", b, ["study_id", "participant_id"])
        before_v1 = {
            (r.study_id, r.participant_id, r.v)
            for r in swh.read("gold", 1).collect()
        }
        n = swh.purge("gold", "participant_id = 'alice'", "participant_id")
        assert n == 1
        assert {
            (r.study_id, r.participant_id, r.v)
            for r in swh.read("gold").collect()
        } == {("s1", "bob", 2.0), ("s2", "dora", 9.0)}
        # v1 minus alice, partition columns still derived correctly.
        assert {
            (r.study_id, r.participant_id, r.v)
            for r in swh.read("gold", 1).collect()
        } == {t for t in before_v1 if t[1] != "alice"}

    def test_purge_missing_key_is_noop(self, spark, tmp_path):
        wh = SnapshotWarehouse(spark, str(tmp_path / "wh"))
        s = "user string, v long"
        wh.append("t", spark.createDataFrame([("bob", 2)], s))
        files_before = sorted(
            p.name for p in (Path(str(tmp_path / "wh")) / "t").rglob("*.parquet")
        )
        assert wh.purge("t", "user = 'nobody'", "user") == 0
        files_after = sorted(
            p.name for p in (Path(str(tmp_path / "wh")) / "t").rglob("*.parquet")
        )
        assert files_before == files_after
        assert wh.history("t")[-1]["operation"] == "append"

    def test_vacuum_after_purge_leaves_consistent_table(self, spark, tmp_path):
        wh = SnapshotWarehouse(spark, str(tmp_path / "wh"))
        s = "user string, v long"
        wh.append("t", spark.createDataFrame([("alice", 1), ("bob", 2)], s))
        wh.append("t", spark.createDataFrame([("alice", 3)], s))
        wh.purge("t", "user = 'alice'", "user")
        wh.compact("t")
        wh.vacuum("t", keep_last=1)
        assert {(r.user, r.v) for r in wh.read("t").collect()} == {("bob", 2)}


class TestOptimizeZorder:
    def test_zorder_rewrite_enables_two_column_pruning(self, spark, tmp_path):
        from clinical_api_etl_spark.sources.layout import skipping_ratio

        wh = SnapshotWarehouse(spark, str(tmp_path / "wh"))
        # Arrival-order data: both keys span the full domain in every file.
        rows = [(i, (i * 7919) % 1000, (i * 104729) % 1000) for i in range(4000)]
        wh.append(
            "t", spark.createDataFrame(rows, "id long, a long, b long")
        )
        root = Path(str(tmp_path / "wh")) / "t" / "data"
        before_a = skipping_ratio(str(root), "a", 17)
        wh.optimize_zorder("t", ["a", "b"], num_files=8)
        wh.vacuum("t", keep_last=1)
        after_a = skipping_ratio(str(root), "a", 17)
        after_b = skipping_ratio(str(root), "b", 17)
        # Z-order layout prunes on BOTH columns; arrival order pruned ~0.
        assert after_a > before_a and after_a >= 0.5
        assert after_b >= 0.5
        got = {r.id for r in wh.read("t").collect()}
        assert got == {i for i in range(4000)}

    def test_zorder_materializes_deletion_vectors(self, spark, tmp_path):
        wh = SnapshotWarehouse(spark, str(tmp_path / "wh"))
        rows = [(i, i % 50, i % 97) for i in range(500)]
        wh.append("t", spark.createDataFrame(rows, "id long, a long, b long"))
        wh.delete_where("t", "id < 100", "id")
        wh.optimize_zorder("t", ["a", "b"], num_files=4)
        m = wh._load_manifest("t")
        assert m["operation"] == "rewrite" and not m["deletes"]
        assert {r.id for r in wh.read("t").collect()} == set(range(100, 500))


class TestRestore:
    def test_restore_is_a_forward_commit(self, spark, swh):
        a = spark.createDataFrame([("s1", "p1", 1.0)], GOLD_SCHEMA)
        b = spark.createDataFrame([("s1", "p1", 99.0), ("s2", "p1", 2.0)], GOLD_SCHEMA)
        swh.upsert("gold", a, ["study_id", "participant_id"])
        swh.upsert("gold", b, ["study_id", "participant_id"])
        swh.restore("gold", 1)
        got = {(r.study_id, r.participant_id, r.v) for r in swh.read("gold").collect()}
        assert got == {("s1", "p1", 1.0)}
        # the bad version stays reachable (rollback did not erase history)
        assert swh.read("gold", 2).count() == 2
        ops = [h["operation"] for h in swh.history("gold")]
        assert ops[-1] == "restore[v1]"

    def test_restore_carries_deletion_vectors(self, spark, swh):
        df = spark.createDataFrame(
            [("s1", "p1", 1.0), ("s1", "p2", 2.0)], GOLD_SCHEMA
        )
        swh.append("jobsless", df)
        swh.delete_where("jobsless", "participant_id = 'p2'", "participant_id")
        v_del = max(swh.versions("jobsless"))
        extra = spark.createDataFrame([("s9", "p9", 9.0)], GOLD_SCHEMA)
        swh.append("jobsless", extra)
        swh.restore("jobsless", v_del)
        got = {r.participant_id for r in swh.read("jobsless").collect()}
        assert got == {"p1"}  # delete vector still applies, append undone

    def test_restore_refuses_vacuumed_version(self, spark, swh):
        a = spark.createDataFrame([("s1", "p1", 1.0)], GOLD_SCHEMA)
        swh.append("t", a)
        swh.compact("t")  # v2 rewrite
        swh.vacuum("t", keep_last=1)
        # vacuum dropped the v1 manifest entirely
        with pytest.raises(ValueError, match="no snapshot"):
            swh.restore("t", 1)

    def test_restore_refuses_missing_files(self, spark, swh):
        a = spark.createDataFrame([("s1", "p1", 1.0)], GOLD_SCHEMA)
        b = spark.createDataFrame([("s2", "p1", 2.0)], GOLD_SCHEMA)
        swh.append("t", a)
        swh.append("t", b)
        # simulate a partially-damaged retention: v1's data file gone but
        # its manifest still present
        m1 = swh._load_manifest("t", 1)
        root = Path(swh.root) / "t" / "data"
        (root / sorted(m1["files"])[0]).unlink()
        with pytest.raises(ValueError, match="not restorable"):
            swh.restore("t", 1)

    def test_cdf_refuses_restore_window(self, spark, swh):
        a = spark.createDataFrame([("s1", "p1", 1.0)], GOLD_SCHEMA)
        b = spark.createDataFrame([("s2", "p1", 2.0)], GOLD_SCHEMA)
        swh.append("t", a)
        swh.append("t", b)
        swh.restore("t", 1)
        with pytest.raises(ValueError, match="resync"):
            swh.read_changes("t", 1)


class TestClone:
    def test_clone_reads_identically_with_zero_data_copy(self, spark, swh):
        df = spark.createDataFrame(
            [("s1", "p1", 1.0), ("s2", "p1", 2.0)], GOLD_SCHEMA
        )
        swh.upsert("gold", df, ["study_id", "participant_id"])
        swh.clone("gold", "gold_dev")
        src = {(r.study_id, r.participant_id, r.v) for r in swh.read("gold").collect()}
        dst = {(r.study_id, r.participant_id, r.v)
               for r in swh.read("gold_dev").collect()}
        assert src == dst
        # zero-copy: every cloned file shares its inode with the source
        root = Path(swh.root)
        src_inodes = {p.name: p.stat().st_ino
                      for p in (root / "gold" / "data").rglob("*.parquet")}
        for p in (root / "gold_dev" / "data").rglob("*.parquet"):
            assert p.stat().st_ino == src_inodes[p.name]

    def test_clone_isolated_from_source_writes(self, spark, swh):
        df = spark.createDataFrame([("s1", "p1", 1.0)], GOLD_SCHEMA)
        swh.upsert("gold", df, ["study_id", "participant_id"])
        swh.clone("gold", "gold_dev")
        more = spark.createDataFrame([("s1", "p1", 77.0)], GOLD_SCHEMA)
        swh.upsert("gold", more, ["study_id", "participant_id"])
        assert [r.v for r in swh.read("gold_dev").collect()] == [1.0]
        # and the clone can diverge without touching the source
        dev = spark.createDataFrame([("s5", "p5", 5.0)], GOLD_SCHEMA)
        swh.upsert("gold_dev", dev, ["study_id", "participant_id"])
        assert swh.read("gold").count() == 1
        assert swh.read("gold_dev").count() == 2

    def test_clone_survives_source_purge_and_vacuum(self, spark, swh):
        df = spark.createDataFrame(
            [("s1", "p1", 1.0), ("s2", "p2", 2.0)], GOLD_SCHEMA
        )
        swh.append("t", df)
        swh.clone("t", "t_dev")
        swh.purge("t", "participant_id = 'p2'", "participant_id")
        swh.vacuum("t", keep_last=1)
        got = {r.participant_id for r in swh.read("t_dev").collect()}
        assert got == {"p1", "p2"}  # clone kept the purged row's bytes

    def test_clone_carries_deletion_vectors(self, spark, swh):
        df = spark.createDataFrame(
            [("s1", "p1", 1.0), ("s1", "p2", 2.0)], GOLD_SCHEMA
        )
        swh.append("t", df)
        swh.delete_where("t", "participant_id = 'p2'", "participant_id")
        swh.clone("t", "t_dev")
        assert {r.participant_id for r in swh.read("t_dev").collect()} == {"p1"}

    def test_clone_at_version(self, spark, swh):
        a = spark.createDataFrame([("s1", "p1", 1.0)], GOLD_SCHEMA)
        b = spark.createDataFrame([("s2", "p1", 2.0)], GOLD_SCHEMA)
        swh.append("t", a)
        swh.append("t", b)
        swh.clone("t", "t_v1", version=1)
        assert swh.read("t_v1").count() == 1

    def test_clone_refuses_existing_target(self, spark, swh):
        a = spark.createDataFrame([("s1", "p1", 1.0)], GOLD_SCHEMA)
        swh.append("t", a)
        swh.append("u", a)
        with pytest.raises(ValueError, match="already exists"):
            swh.clone("t", "u")


class TestExactlyOnceAppend:
    def test_replayed_txn_is_a_noop(self, spark, swh):
        df = spark.createDataFrame([("s1", "p1", 1.0)], GOLD_SCHEMA)
        assert swh.append_once("t", df, "batch-0") is True
        assert swh.append_once("t", df, "batch-0") is False
        assert swh.read("t").count() == 1
        assert swh.append_once("t", df, "batch-1") is True
        assert swh.read("t").count() == 2
        assert swh.committed_txns("t") == {"batch-0", "batch-1"}

    def test_foreachbatch_replay_stays_exactly_once(self, spark, swh, tmp_path):
        import shutil as _sh

        src = tmp_path / "src"
        src.mkdir()
        spark.createDataFrame(
            [("s1", "p1", 1.0), ("s2", "p2", 2.0)], GOLD_SCHEMA
        ).coalesce(1).write.mode("overwrite").parquet(str(src / "f1"))

        def run(checkpoint):
            stream = (
                spark.readStream.schema(GOLD_SCHEMA)
                .parquet(str(src / "f1"))
                .writeStream.foreachBatch(
                    lambda df, bid: swh.append_once("t", df, f"ing-{bid}")
                )
                .trigger(availableNow=True)
                .option("checkpointLocation", str(tmp_path / checkpoint))
                .start()
            )
            stream.awaitTermination(120)

        run("cp1")
        # simulate a post-sink/pre-checkpoint crash: a fresh checkpoint
        # replays batch 0 with the SAME batchId
        run("cp2")
        assert swh.read("t").count() == 2
        assert len(swh.versions("t")) == 1


class TestTimestampTimeTravel:
    def test_read_as_of_resolves_commit_times(self, spark, swh):
        import time as _time

        a = spark.createDataFrame([("s1", "p1", 1.0)], GOLD_SCHEMA)
        b = spark.createDataFrame([("s2", "p1", 2.0)], GOLD_SCHEMA)
        swh.append("t", a)
        t_after_v1 = int(_time.time() * 1000)
        _time.sleep(0.05)
        swh.append("t", b)
        assert swh.version_as_of("t", t_after_v1) == 1
        assert swh.read_as_of("t", t_after_v1).count() == 1
        now = int(_time.time() * 1000)
        assert swh.version_as_of("t", now) == 2
        assert swh.read_as_of("t", now).count() == 2

    def test_before_first_commit_raises(self, spark, swh):
        a = spark.createDataFrame([("s1", "p1", 1.0)], GOLD_SCHEMA)
        swh.append("t", a)
        first = swh.history("t")[0]["committed_at_ms"]
        with pytest.raises(ValueError, match="no snapshot"):
            swh.version_as_of("t", first - 10_000)

    def test_history_carries_commit_time_and_txn(self, spark, swh):
        a = spark.createDataFrame([("s1", "p1", 1.0)], GOLD_SCHEMA)
        swh.append_once("t", a, "job-42")
        h = swh.history("t")[-1]
        assert h["txn"] == "job-42"
        assert isinstance(h["committed_at_ms"], int)


class TestFilesMetadataTable:
    def test_files_lists_live_snapshot(self, spark, swh):
        df = spark.createDataFrame(
            [("s1", "p1", 1.0), ("s2", "p1", 2.0)], GOLD_SCHEMA
        )
        swh.append("t", df)
        swh.append("t", spark.createDataFrame([("s3", "p3", 3.0)], GOLD_SCHEMA))
        files = swh.files("t").collect()
        m = swh._load_manifest("t")
        assert sorted(r.path for r in files) == sorted(m["files"])
        assert all(r.bytes > 0 for r in files)
        assert len({r.commit_dir for r in files}) == 2  # two commits live

    def test_files_at_version(self, spark, swh):
        swh.append("t", spark.createDataFrame([("s1", "p1", 1.0)], GOLD_SCHEMA))
        swh.append("t", spark.createDataFrame([("s2", "p2", 2.0)], GOLD_SCHEMA))
        v1 = swh.files("t", version=1).count()
        v2 = swh.files("t", version=2).count()
        assert v1 < v2

    def test_small_file_planning_join(self, spark, swh):
        # the ops use-case: find commits whose files are all tiny ->
        # compaction candidates
        from pyspark.sql import functions as F

        for i in range(3):
            swh.append(
                "t", spark.createDataFrame([(f"s{i}", "p", float(i))], GOLD_SCHEMA)
            )
        plan = (
            swh.files("t")
            .groupBy("commit_dir")
            .agg(F.count("*").alias("n"), F.max("bytes").alias("max_b"))
            .filter(F.col("max_b") < 1024 * 1024)
        )
        assert plan.count() == 3  # all three commits are small-file candidates


class TestWriteAuditPublish:
    def test_staged_invisible_until_published(self, spark, swh):
        a = spark.createDataFrame([("s1", "p1", 1.0)], GOLD_SCHEMA)
        swh.append("t", a)
        sid = swh.stage_append(
            "t", spark.createDataFrame([("s2", "p2", 2.0)], GOLD_SCHEMA)
        )
        assert swh.read("t").count() == 1          # not visible
        assert swh.read_staged("t", sid).count() == 2  # audit view
        v = swh.publish_staged("t", sid)
        assert swh.read("t").count() == 2
        assert swh.read("t", v).count() == 2
        ops = [h["operation"] for h in swh.history("t")]
        assert ops[-1] == "append[wap]"
        with pytest.raises(ValueError, match="no staged"):
            swh.read_staged("t", sid)  # consumed

    def test_failed_audit_discards_bytes(self, spark, swh):
        from pyspark.sql import functions as F

        from clinical_api_etl_spark.operators.expectations import (
            in_range,
            violation_counts,
        )

        swh.append("t", spark.createDataFrame([("s1", "p1", 1.0)], GOLD_SCHEMA))
        bad = spark.createDataFrame([("s9", "p9", -5.0)], GOLD_SCHEMA)
        sid = swh.stage_append("t", bad)
        audit = violation_counts(
            swh.read_staged("t", sid), [in_range("v", 0.0, 100.0)]
        )
        n_bad = sum(r.n_violations for r in audit.collect())
        assert n_bad == 1
        swh.discard_staged("t", sid)
        assert swh.read("t").count() == 1
        data_root = Path(swh.root) / "t" / "data"
        live = set(swh._load_manifest("t")["files"])
        on_disk = {
            str(p.relative_to(data_root)) for p in data_root.rglob("*.parquet")
        }
        assert on_disk == live  # staged bytes gone

    def test_publish_preserves_concurrent_commits(self, spark, swh):
        swh.append("t", spark.createDataFrame([("s1", "p1", 1.0)], GOLD_SCHEMA))
        sid = swh.stage_append(
            "t", spark.createDataFrame([("s2", "p2", 2.0)], GOLD_SCHEMA)
        )
        # another writer lands while the audit runs
        swh.append("t", spark.createDataFrame([("s3", "p3", 3.0)], GOLD_SCHEMA))
        swh.publish_staged("t", sid)
        got = {r.participant_id for r in swh.read("t").collect()}
        assert got == {"p1", "p2", "p3"}
