"""Cross-process writer safety for the warehouses.

The reference gets concurrent-upsert safety from Postgres transactions +
``ON CONFLICT`` (etl-service/src/db.py:41-58); plain-parquet warehouses
must supply their own arbiter. Two layers are under test:

* ``ParquetWarehouse._commit_guard`` — an exclusive ``fcntl.flock`` on
  ``<root>/.writer.lock`` serializing writers across threads AND
  processes (kernel-released on process death, no stale lock files).
* ``SnapshotWarehouse._commit`` — the optimistic hard-link claim on the
  next manifest version (+ ``base_version`` check): even a writer that
  bypasses the guard cannot silently lose an update; it either wins the
  atomic ``os.link`` or gets :class:`CommitConflict`.

The multi-process tests run the REAL commit machinery in spawned python
processes with ``_write_commit_files`` overridden to write parquet via
pyarrow (no Spark needed in the workers — the contention is entirely in
the manifest/lock layer). The final state is then verified through the
real Spark reader.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import threading
import uuid
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from clinical_api_etl_spark.sources.snapshots import CommitConflict, SnapshotWarehouse


class PlainSnapshotWarehouse(SnapshotWarehouse):
    """SnapshotWarehouse whose data files are written with pyarrow —
    byte-compatible with the Spark reader, usable without a JVM in
    spawned worker processes."""

    def __init__(self, root: str) -> None:
        super().__init__(None, root)

    def _write_commit_files(self, table: str, df) -> list[str]:
        cid = uuid.uuid4().hex
        dest = self._data_root(table) / cid
        dest.mkdir(parents=True, exist_ok=True)
        pq.write_table(df, dest / "part-00000.parquet")
        return [f"{cid}/part-00000.parquet"]


def _append_worker(root: str, writer_id: int, n_commits: int, q) -> None:
    try:
        wh = PlainSnapshotWarehouse(root)
        for i in range(n_commits):
            batch = pa.table(
                {"writer": [writer_id] * 3, "seq": [i] * 3, "row": [0, 1, 2]}
            )
            wh.append("t", batch)
        q.put(("ok", writer_id))
    except Exception as e:  # pragma: no cover - failure reporting
        q.put(("err", f"{writer_id}: {type(e).__name__}: {e}"))


def _append_once_worker(root: str, writer_id: int, txn: str, q) -> None:
    try:
        wh = PlainSnapshotWarehouse(root)
        batch = pa.table({"writer": [writer_id], "row": [0]})
        landed = wh.append_once("t", batch, txn)
        q.put(("ok", writer_id, landed))
    except Exception as e:  # pragma: no cover
        q.put(("err", f"{writer_id}: {type(e).__name__}: {e}"))


def _spawn(target, args):
    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    procs = [ctx.Process(target=target, args=(*a, q)) for a in args]
    for p in procs:
        p.start()
    results = [q.get(timeout=120) for _ in procs]
    for p in procs:
        p.join(timeout=30)
    return results


class TestCrossProcessAppends:
    def test_two_processes_appending_no_lost_update(self, spark, tmp_path):
        """The verdict's acceptance test: two OS processes append to one
        table concurrently — both commit, history is linear (contiguous
        versions, one op each), and every written row survives."""
        root = str(tmp_path / "wh")
        PlainSnapshotWarehouse(root)  # create root
        n = 5
        results = _spawn(_append_worker, [(root, 1, n), (root, 2, n)])
        assert all(r[0] == "ok" for r in results), results

        wh = SnapshotWarehouse(spark, root)
        hist = wh.history("t")
        versions = [h["version"] for h in hist]
        assert versions == list(range(1, 2 * n + 1)), "history must be linear"
        assert all(h["operation"] == "append" for h in hist)
        # No lost update: all 2*n*3 rows are present, n commits per writer.
        df = wh.read("t")
        assert df.count() == 2 * n * 3
        per_writer = {
            r["writer"]: r["cnt"]
            for r in df.groupBy("writer").count().withColumnRenamed("count", "cnt").collect()
        }
        assert per_writer == {1: n * 3, 2: n * 3}
        # File lists grow monotonically: every commit carried its
        # predecessor's files (the OCC re-derives carried on a lost race).
        n_files = [h["n_files"] for h in hist]
        assert n_files == sorted(n_files) and n_files[-1] == 2 * n

    def test_append_once_exactly_once_across_processes(self, spark, tmp_path):
        """Two processes replaying one idempotence token: exactly one
        append lands (the seen-check is re-run inside the OCC loop)."""
        root = str(tmp_path / "wh")
        PlainSnapshotWarehouse(root)
        results = _spawn(
            _append_once_worker, [(root, 1, "batch-42"), (root, 2, "batch-42")]
        )
        assert all(r[0] == "ok" for r in results), results
        landed = sorted(r[2] for r in results)
        assert landed == [False, True], "exactly one writer must land the txn"
        wh = SnapshotWarehouse(spark, root)
        assert wh.read("t").count() == 1
        assert wh.committed_txns("t") == {"batch-42"}


class TestTwoInstancesOneProcess:
    def test_flock_serializes_independent_instances(self, spark, tmp_path):
        """Two warehouse INSTANCES (separate RLocks, separate flock fds —
        the in-process model of two drivers) appending from two threads:
        flock fds contend even within one process, so history stays
        linear and nothing is lost."""
        root = str(tmp_path / "wh")
        a = SnapshotWarehouse(spark, root)
        b = SnapshotWarehouse(spark, root)
        df = spark.range(3).toDF("id")
        errs: list[Exception] = []

        def run(wh):
            try:
                for _ in range(4):
                    wh.append("t", df)
            except Exception as e:  # pragma: no cover
                errs.append(e)

        ts = [threading.Thread(target=run, args=(w,)) for w in (a, b)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert not errs
        assert [h["version"] for h in a.history("t")] == list(range(1, 9))
        assert a.read("t").count() == 8 * 3


class TestPlainWarehouseCrossInstance:
    def test_concurrent_upserts_both_land(self, spark, tmp_path):
        """Two ParquetWarehouse INSTANCES (separate flock fds) upserting
        different studies concurrently into one partitioned table: the
        directory swaps serialize on the flock, so neither merge's
        partition writes are lost."""
        from clinical_api_etl_spark.sources.sinks import ParquetWarehouse

        root = str(tmp_path / "wh")
        part = {"gold": ["study_id"]}
        a = ParquetWarehouse(spark, root, partitioning=part)
        b = ParquetWarehouse(spark, root, partitioning=part)
        schema = "study_id string, participant_id string, v double"
        errs: list[Exception] = []

        def run(wh, study):
            try:
                for i in range(3):
                    df = spark.createDataFrame(
                        [(study, f"p{j}", float(i)) for j in range(4)], schema
                    )
                    wh.upsert("gold", df, ["study_id", "participant_id"])
            except Exception as e:  # pragma: no cover
                errs.append(e)

        ts = [
            threading.Thread(target=run, args=(w, s))
            for w, s in ((a, "s1"), (b, "s2"))
        ]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert not errs
        rows = a.read("gold").collect()
        got = {(r["study_id"], r["participant_id"]): r["v"] for r in rows}
        assert len(rows) == 8  # 4 participants per study, last write wins
        assert all(got[("s1", f"p{j}")] == 2.0 for j in range(4))
        assert all(got[("s2", f"p{j}")] == 2.0 for j in range(4))


class TestOptimisticBackstop:
    def test_stale_base_version_conflicts(self, spark, tmp_path):
        """A writer that read v1 and tries to publish after the table
        moved to v2 must get CommitConflict, never a silent lost update."""
        wh = SnapshotWarehouse(spark, str(tmp_path / "wh"))
        df = spark.range(2).toDF("id")
        wh.append("t", df)  # v1
        wh.append("t", df)  # v2
        with pytest.raises(CommitConflict):
            wh._commit("t", [], "rewrite", base_version=1)

    def test_version_claim_is_atomic(self, spark, tmp_path):
        """Two commits racing for the same next version: exactly one wins
        the hard link; the loser raises instead of overwriting."""
        wh = SnapshotWarehouse(spark, str(tmp_path / "wh"))
        df = spark.range(2).toDF("id")
        wh.append("t", df)  # v1
        # Simulate the race window: another process publishes v2 after this
        # writer's version scan (freeze the scan at [1]) — the hard link
        # must lose, not overwrite.
        mdir = wh._manifest_dir("t")
        (mdir / "v00000002.json").write_text(
            json.dumps({"version": 2, "operation": "forged", "partitioned": False,
                        "files": [], "deletes": [], "committed_at_ms": 0})
        )
        orig_versions = wh.versions
        wh.versions = lambda table: [1]  # type: ignore[method-assign]
        try:
            with pytest.raises(CommitConflict):
                wh._commit("t", [], "append")
        finally:
            wh.versions = orig_versions  # type: ignore[method-assign]
        # No temp manifests left behind, forged manifest untouched.
        assert not list(mdir.glob(".tmp-*"))
        assert json.loads((mdir / "v00000002.json").read_text())["operation"] == "forged"

    def test_reset_preserves_lock_file_inode(self, spark, tmp_path):
        """reset() must not unlink .writer.lock (the unlink-lockfile race
        would let two processes hold 'the' lock on different inodes)."""
        wh = SnapshotWarehouse(spark, str(tmp_path / "wh"))
        wh.append("t", spark.range(1).toDF("id"))
        lock = Path(wh.root) / ".writer.lock"
        assert lock.exists()
        ino = lock.stat().st_ino
        wh.reset()
        assert lock.exists() and lock.stat().st_ino == ino
        assert not wh.exists("t")


# ---------------------------------------------------------------------------
# Round-6 (VERDICT r05 task 7): two REAL streaming writers in separate OS
# processes — the flock + OCC + txn-token stack under foreachBatch
# concurrency.
# ---------------------------------------------------------------------------


def _json_docs(path: Path, ids) -> None:
    path.mkdir(parents=True, exist_ok=True)
    body = " ".join(f"w{k}" for k in range(25))  # >= MIN_TOKENS
    with open(path / "docs.json", "w") as f:
        for i in ids:
            f.write(
                json.dumps(
                    {"doc_id": i, "text": f"doc {i} {body}",
                     "ts": "2024-01-01T00:00:00Z"}
                )
                + "\n"
            )


def _stream_worker(root: str, drop_dir: str, ckpt: str, q) -> None:
    """One availableNow pass of the REAL streaming corpus pipeline in its
    own JVM (own SparkSession, own checkpoint) against a shared table."""
    try:
        from pyspark.sql import SparkSession

        from clinical_api_etl_spark.streaming.corpus import run_corpus_stream

        spark = (
            SparkSession.builder.master("local[2]")
            .appName(f"xproc-stream-{Path(ckpt).name}")
            .config("spark.sql.shuffle.partitions", "2")
            .config("spark.driver.memory", "1g")
            .config("spark.ui.enabled", "false")
            .config("spark.sql.session.timeZone", "UTC")
            .getOrCreate()
        )
        try:
            wh = SnapshotWarehouse(spark, root)
            run_corpus_stream(spark, wh, drop_dir, ckpt)
        finally:
            spark.stop()
        q.put(("ok", Path(ckpt).name))
    except Exception as e:  # pragma: no cover - failure reporting
        q.put(("err", f"{Path(ckpt).name}: {type(e).__name__}: {e}"))


class TestCrossProcessStreamingWriters:
    def test_two_streams_one_table_exactly_once(self, spark, tmp_path):
        """Two streaming append_once writers (separate spawned processes,
        separate checkpoints, one table): linear history, both streams'
        rows present exactly once; a lost-checkpoint replay of one stream
        lands nothing new (the durable anti-join layer)."""
        root = str(tmp_path / "wh")
        SnapshotWarehouse(None, root)  # create root
        ids_a = list(range(1, 31))      # none % 97 == 0
        ids_b = list(range(101, 131))
        drop_a, drop_b = tmp_path / "dropA", tmp_path / "dropB"
        _json_docs(drop_a, ids_a)
        _json_docs(drop_b, ids_b)

        results = _spawn(
            _stream_worker,
            [
                (root, str(drop_a), str(tmp_path / "ckA")),
                (root, str(drop_b), str(tmp_path / "ckB")),
            ],
        )
        assert all(r[0] == "ok" for r in results), results

        wh = SnapshotWarehouse(spark, root)
        hist = wh.history("corpus_shards")
        versions = [h["version"] for h in hist]
        assert versions == list(range(1, len(hist) + 1)), "linear history"
        txns = wh.committed_txns("corpus_shards")
        assert {"corpus-ckA-0", "corpus-ckB-0"} <= txns
        rows = wh.read("corpus_shards").groupBy("doc_id").count().collect()
        got = {r["doc_id"]: r["count"] for r in rows}
        assert got == {i: 1 for i in ids_a + ids_b}, "each doc exactly once"

        # Lost checkpoint: re-stream drop A from scratch in ANOTHER
        # process. The file source re-lists everything; the published
        # corpus anti-join must land zero new rows.
        results = _spawn(
            _stream_worker, [(root, str(drop_a), str(tmp_path / "ckA2"))]
        )
        assert all(r[0] == "ok" for r in results), results
        wh2 = SnapshotWarehouse(spark, root)
        assert wh2.read("corpus_shards").count() == len(ids_a) + len(ids_b)
