"""Incremental MV maintenance: delta-applied aggregates == full recompute."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clinical_api_etl_spark.operators.mv import IncrementalMV
from clinical_api_etl_spark.sources.snapshots import SnapshotWarehouse


@pytest.fixture()
def swh(spark, tmp_path):
    return SnapshotWarehouse(spark, str(tmp_path / "wh"))


def _rows(spark, rows):
    return spark.createDataFrame(rows, "k string, doc_id long, cents long")


def _recompute(swh, table):
    base = swh.read(table)
    return {
        (r.k): (r.n_rows, r.sum_cents)
        for r in base.groupBy("k")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum("cents").alias("sum_cents"),
        )
        .collect()
    }


def _mv_state(mv):
    return {(r.k): (r.n_rows, r.sum_cents) for r in mv.read().collect()}


class TestIncrementalMV:
    def _mk(self, swh, tmp_path):
        return IncrementalMV(
            swh, "docs", str(tmp_path / "mv"), group_cols=["k"], sum_cols=["cents"]
        )

    def test_initial_build_and_incremental_appends(self, spark, swh, tmp_path):
        swh.append("docs", _rows(spark, [("a", 1, 10), ("a", 2, 20), ("b", 3, 5)]))
        mv = self._mk(swh, tmp_path)
        mv.refresh()
        assert _mv_state(mv) == _recompute(swh, "docs")

        swh.append("docs", _rows(spark, [("a", 4, 40), ("c", 5, 7)]))
        advanced = mv.refresh()
        assert advanced == 1
        assert _mv_state(mv) == _recompute(swh, "docs")

    def test_deletes_decrement_sums(self, spark, swh, tmp_path):
        swh.append("docs", _rows(spark, [("a", 1, 10), ("a", 2, 20), ("b", 3, 5)]))
        mv = self._mk(swh, tmp_path)
        mv.refresh()
        swh.delete_where("docs", "doc_id = 2", "doc_id")
        mv.refresh()
        got = _mv_state(mv)
        assert got == _recompute(swh, "docs")
        assert got["a"] == (1, 10)

    def test_group_leaves_view_at_zero(self, spark, swh, tmp_path):
        swh.append("docs", _rows(spark, [("a", 1, 10), ("b", 2, 20)]))
        mv = self._mk(swh, tmp_path)
        mv.refresh()
        swh.delete_where("docs", "k = 'b'", "doc_id")
        mv.refresh()
        got = _mv_state(mv)
        assert "b" not in got and got == _recompute(swh, "docs")

    def test_insert_then_delete_in_one_window_is_noop(self, spark, swh, tmp_path):
        swh.append("docs", _rows(spark, [("a", 1, 10)]))
        mv = self._mk(swh, tmp_path)
        mv.refresh()
        # both happen between refreshes: the MV must not double-apply
        swh.append("docs", _rows(spark, [("z", 9, 100)]))
        swh.delete_where("docs", "doc_id = 9", "doc_id")
        mv.refresh()
        got = _mv_state(mv)
        assert "z" not in got and got == _recompute(swh, "docs")

    def test_delete_reinsert_delete_sequence(self, spark, swh, tmp_path):
        swh.append("docs", _rows(spark, [("a", 1, 10), ("a", 2, 20)]))
        mv = self._mk(swh, tmp_path)
        mv.refresh()
        swh.delete_where("docs", "doc_id = 1", "doc_id")
        swh.append("docs", _rows(spark, [("a", 1, 11)]))  # re-insert same key
        swh.delete_where("docs", "doc_id = 1", "doc_id")  # delete again
        mv.refresh()
        assert _mv_state(mv) == _recompute(swh, "docs")

    def test_multiple_refresh_cycles_stay_consistent(self, spark, swh, tmp_path):
        swh.append("docs", _rows(spark, [("a", 1, 1)]))
        mv = self._mk(swh, tmp_path)
        mv.refresh()
        for i in range(2, 6):
            swh.append("docs", _rows(spark, [("a", i, i), ("b", 100 + i, 2 * i)]))
            if i % 2 == 0:
                swh.delete_where("docs", f"doc_id = {i - 1}", "doc_id")
            mv.refresh()
            assert _mv_state(mv) == _recompute(swh, "docs"), f"cycle {i}"

    def test_rewrite_requires_rebuild(self, spark, swh, tmp_path):
        swh.append("docs", _rows(spark, [("a", 1, 10)]))
        mv = self._mk(swh, tmp_path)
        mv.refresh()
        swh.append("docs", _rows(spark, [("b", 2, 20)]))
        swh.compact("docs")
        with pytest.raises(ValueError, match="resync"):
            mv.refresh()
        mv.rebuild()
        assert _mv_state(mv) == _recompute(swh, "docs")

    def test_refresh_noop_when_current(self, spark, swh, tmp_path):
        swh.append("docs", _rows(spark, [("a", 1, 10)]))
        mv = self._mk(swh, tmp_path)
        mv.refresh()
        assert mv.refresh() == 0


class TestPreImageFeed:
    def test_delete_rows_carry_values(self, spark, swh, tmp_path):
        swh.append("docs", _rows(spark, [("a", 1, 10), ("b", 2, 20)]))
        swh.delete_where("docs", "doc_id = 2", "doc_id")
        ch = swh.read_changes("docs", 1, pre_image=True).collect()
        dels = [r for r in ch if r["_change_type"] == "delete"]
        assert [(r.k, r.doc_id, r.cents) for r in dels] == [("b", 2, 20)]

    def test_default_mode_unchanged(self, spark, swh, tmp_path):
        swh.append("docs", _rows(spark, [("a", 1, 10)]))
        swh.delete_where("docs", "doc_id = 1", "doc_id")
        ch = swh.read_changes("docs", 1).collect()
        dels = [r for r in ch if r["_change_type"] == "delete"]
        assert len(dels) == 1 and dels[0].k is None and dels[0].doc_id == 1


class TestStreamingMV:
    def test_stream_feeds_warehouse_feeds_mv(self, spark, swh, tmp_path):
        """End-to-end incremental path: a file stream lands micro-batches in
        the SnapshotWarehouse via foreachBatch; after each batch the MV
        refreshes from the change feed. Final view == full recompute —
        stream -> snapshot log -> CDF -> delta-maintained aggregate, with
        no full rescans after the initial build."""
        src = tmp_path / "smv_src"
        src.mkdir()
        schema = "k string, doc_id long, cents long"
        spark.createDataFrame(
            [("a", 1, 10), ("b", 2, 20)], schema
        ).coalesce(1).write.mode("append").parquet(str(src))
        spark.createDataFrame(
            [("a", 3, 30), ("c", 4, 5)], schema
        ).coalesce(1).write.mode("append").parquet(str(src))

        mv = IncrementalMV(
            swh, "docs", str(tmp_path / "smv"), group_cols=["k"], sum_cols=["cents"]
        )

        def land(df, bid):
            swh.append("docs", df)
            mv.refresh()

        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
            .writeStream.foreachBatch(land)
            .option("checkpointLocation", str(tmp_path / "smv_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        assert _mv_state(mv) == _recompute(swh, "docs")
        assert mv.applied_version() == swh.versions("docs")[-1]


def _orders(spark, rows):
    return spark.createDataFrame(rows, "cust string, oid long, cents long")


def _custs(spark, rows):
    return spark.createDataFrame(rows, "cust string, region string")


def _join_recompute(swh):
    j = swh.read("orders").join(swh.read("custs"), "cust")
    return {
        r.region: (r.n_rows, r.sum_cents)
        for r in j.groupBy("region")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum("cents").alias("sum_cents"),
        )
        .collect()
    }


def _join_state(mv):
    return {r.region: (r.n_rows, r.sum_cents) for r in mv.read().collect()}


class TestIncrementalJoinMV:
    def _mk(self, swh, tmp_path):
        from clinical_api_etl_spark.operators.mv import IncrementalJoinMV

        return IncrementalJoinMV(
            swh,
            "orders",
            "custs",
            str(tmp_path / "jmv"),
            on=["cust"],
            group_cols=["region"],
            sum_cols=["cents"],
        )

    def test_build_then_fact_side_appends(self, spark, swh, tmp_path):
        swh.append("custs", _custs(spark, [("c1", "EU"), ("c2", "US")]))
        swh.append("orders", _orders(spark, [("c1", 1, 10), ("c2", 2, 20)]))
        mv = self._mk(swh, tmp_path)
        mv.refresh()
        assert _join_state(mv) == _join_recompute(swh)

        swh.append("orders", _orders(spark, [("c1", 3, 30), ("c2", 4, 4)]))
        assert mv.refresh() == 1
        assert _join_state(mv) == _join_recompute(swh)

    def test_dim_side_append_joins_old_fact_rows(self, spark, swh, tmp_path):
        swh.append("custs", _custs(spark, [("c1", "EU")]))
        # c9's orders dangle until the dim row arrives
        swh.append("orders", _orders(spark, [("c1", 1, 10), ("c9", 2, 99)]))
        mv = self._mk(swh, tmp_path)
        mv.refresh()
        assert _join_state(mv) == {"EU": (1, 10)}

        swh.append("custs", _custs(spark, [("c9", "AP")]))
        mv.refresh()
        assert _join_state(mv) == _join_recompute(swh)
        assert _join_state(mv)["AP"] == (1, 99)

    def test_both_sides_change_in_one_window(self, spark, swh, tmp_path):
        # the ΔA⋈ΔB cross term: new orders for a customer added in the
        # SAME window must count exactly once
        swh.append("custs", _custs(spark, [("c1", "EU")]))
        swh.append("orders", _orders(spark, [("c1", 1, 10)]))
        mv = self._mk(swh, tmp_path)
        mv.refresh()

        swh.append("custs", _custs(spark, [("c2", "US")]))
        swh.append("orders", _orders(spark, [("c2", 5, 50), ("c1", 6, 6)]))
        mv.refresh()
        assert _join_state(mv) == _join_recompute(swh)
        assert _join_state(mv)["US"] == (1, 50)

    def test_deletes_on_both_sides(self, spark, swh, tmp_path):
        swh.append("custs", _custs(spark, [("c1", "EU"), ("c2", "US")]))
        swh.append(
            "orders", _orders(spark, [("c1", 1, 10), ("c1", 2, 20), ("c2", 3, 30)])
        )
        mv = self._mk(swh, tmp_path)
        mv.refresh()

        swh.delete_where("orders", "oid = 2", "oid")
        mv.refresh()
        assert _join_state(mv) == _join_recompute(swh)
        assert _join_state(mv)["EU"] == (1, 10)

        # deleting a dim row removes the whole group
        swh.delete_where("custs", "cust = 'c2'", "cust")
        mv.refresh()
        assert _join_state(mv) == _join_recompute(swh)
        assert "US" not in _join_state(mv)

    def test_rewrite_in_window_requires_rebuild(self, spark, swh, tmp_path):
        swh.append("custs", _custs(spark, [("c1", "EU")]))
        swh.append("orders", _orders(spark, [("c1", 1, 10)]))
        mv = self._mk(swh, tmp_path)
        mv.refresh()
        swh.append("orders", _orders(spark, [("c1", 2, 20)]))
        swh.compact("orders")
        with pytest.raises(ValueError, match="resync"):
            mv.refresh()
        mv.rebuild()
        assert _join_state(mv) == _join_recompute(swh)
