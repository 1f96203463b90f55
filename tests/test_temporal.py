"""Semantics tests for as-of and range joins (operators/temporal.py)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from clinical_api_etl_spark.operators.temporal import asof_join, range_join_bucketed


def _ts(s):
    return datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), "a"),
            (1, _ts("2024-01-01T12:00:00"), "b"),
            (2, _ts("2024-01-01T09:00:00"), "c"),  # before any right row
            (3, _ts("2024-01-01T10:00:00"), "d"),  # key with no right rows
        ],
        "key long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T09:30:00"), 100),
            (1, _ts("2024-01-01T10:00:00"), 200),  # exact tie with left 'a'
            (1, _ts("2024-01-01T11:00:00"), 300),
            (2, _ts("2024-01-01T09:30:00"), 400),
        ],
        "key long, ts timestamp, val long",
    )
    return left, right


class TestAsofJoin:
    def test_backward_semantics(self, spark):
        left, right = _frames(spark)
        out = {
            r["tag"]: r
            for r in asof_join(
                left, right, on=["key"], left_ts="ts", right_ts="ts",
                right_payload=["val"],
            ).collect()
        }
        assert out["a"]["val_matched"] == 200  # tie → <= match
        assert out["b"]["val_matched"] == 300  # latest prior, not first
        assert out["c"]["val_matched"] is None  # right rows all later
        assert out["d"]["val_matched"] is None  # key absent from right
        assert out["b"]["ts_matched"] == _ts("2024-01-01T11:00:00")

    def test_left_rows_preserved(self, spark):
        left, right = _frames(spark)
        out = asof_join(
            left, right, on=["key"], left_ts="ts", right_ts="ts",
            right_payload=["val"],
        )
        assert out.count() == left.count()
        assert set(left.columns) <= set(out.columns)


class TestRangeJoin:
    def test_keyed_range(self, spark):
        left, right = _frames(spark)
        out = range_join_bucketed(
            left, right, left_ts="ts", right_ts="ts", window_seconds=3600,
            on=["key"],
        )
        got = {(r["tag"], r["val_r"]) for r in out.collect()}
        # 'a'@10:00 window [09:00,10:00): only 09:30/100 (10:00 excluded)
        # 'b'@12:00 window [11:00,12:00): only 11:00/300
        # 'c'@09:00 window [08:00,09:00): nothing
        assert got == {("a", 100), ("b", 300)}

    def test_keyless_bucketed_equals_naive(self, spark):
        left, right = _frames(spark)
        out = range_join_bucketed(
            left, right, left_ts="ts", right_ts="ts", window_seconds=3600
        )
        naive = left.join(
            right.select(*[F.col(c).alias(f"{c}_r") for c in right.columns]),
            (F.col("ts_r") >= F.col("ts") - F.expr("INTERVAL 3600 SECONDS"))
            & (F.col("ts_r") < F.col("ts")),
        )
        key = lambda r: (r["key"], r["tag"], r["key_r"], r["val_r"])  # noqa: E731
        assert sorted(map(key, out.collect())) == sorted(map(key, naive.collect()))

    def test_bucket_boundary_inclusion(self, spark):
        # right row exactly at left.ts - window is included; at left.ts excluded
        left = spark.createDataFrame(
            [(1, _ts("2024-01-01T10:00:00"))], "key long, ts timestamp"
        )
        right = spark.createDataFrame(
            [
                (1, _ts("2024-01-01T09:00:00"), "edge_lo"),
                (1, _ts("2024-01-01T10:00:00"), "edge_hi"),
            ],
            "key long, ts timestamp, tag string",
        )
        out = range_join_bucketed(
            left, right, left_ts="ts", right_ts="ts", window_seconds=3600
        )
        assert [r["tag_r"] for r in out.collect()] == ["edge_lo"]


class TestForwardAsof:
    def test_forward_hand_case(self, spark):
        from datetime import datetime

        from clinical_api_etl_spark.operators.temporal import asof_join

        t = lambda s: datetime.fromisoformat(s)  # noqa: E731
        left = spark.createDataFrame(
            [(1, 7, t("2024-01-01T10:00:00")), (2, 7, t("2024-01-01T12:00:00")),
             (3, 8, t("2024-01-01T10:00:00"))],
            "lid long, k long, ts timestamp",
        )
        right = spark.createDataFrame(
            [(100, 7, t("2024-01-01T10:30:00")), (101, 7, t("2024-01-01T11:00:00")),
             (102, 9, t("2024-01-01T09:00:00"))],
            "rid long, k long, rts timestamp",
        )
        out = {
            r.lid: r.rid_matched
            for r in asof_join(
                left, right, on=["k"], left_ts="ts", right_ts="rts",
                right_payload=["rid"], direction="forward",
            ).collect()
        }
        # lid 1: earliest right at-or-after 10:00 is 100 (10:30), not 101.
        # lid 2: nothing after 12:00 -> NULL. lid 3: no key-8 rows -> NULL.
        assert out == {1: 100, 2: None, 3: None}

    def test_forward_inclusive_at_equal_ts(self, spark):
        from datetime import datetime

        from clinical_api_etl_spark.operators.temporal import asof_join

        t = lambda s: datetime.fromisoformat(s)  # noqa: E731
        left = spark.createDataFrame(
            [(1, 7, t("2024-01-01T10:00:00"))], "lid long, k long, ts timestamp"
        )
        right = spark.createDataFrame(
            [(100, 7, t("2024-01-01T10:00:00"))], "rid long, k long, rts timestamp"
        )
        out = asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="rts",
            right_payload=["rid"], direction="forward",
        ).collect()
        assert out[0].rid_matched == 100  # >= includes the equal timestamp

    def test_bad_direction_rejected(self, spark):
        import pytest as _pytest

        from clinical_api_etl_spark.operators.temporal import asof_join

        df = spark.range(1).selectExpr("id", "current_timestamp() AS ts")
        with _pytest.raises(ValueError):
            asof_join(
                df, df, on=["id"], left_ts="ts", right_ts="ts",
                right_payload=["id"], direction="sideways",
            )


class TestAsofNearest:
    def test_hand_built_nearest_picks(self, spark):
        from clinical_api_etl_spark.operators.temporal import asof_join

        left = spark.createDataFrame(
            [(1, "2024-01-01 10:00:00"), (2, "2024-01-01 12:00:00")],
            "k long, lt string",
        ).select("k", F.col("lt").cast("timestamp").alias("lt"))
        right = spark.createDataFrame(
            [
                (1, "2024-01-01 09:00:00", "a"),   # 1h before L1
                (1, "2024-01-01 10:30:00", "b"),   # 30m after L1 -> nearest
                (2, "2024-01-01 09:00:00", "c"),   # 3h before L2 -> nearest
            ],
            "k long, rt string, tag string",
        ).select("k", F.col("rt").cast("timestamp").alias("rt"), "tag")
        out = {
            r.k: r.tag_matched
            for r in asof_join(
                left, right, on=["k"], left_ts="lt", right_ts="rt",
                right_payload=["tag"], direction="nearest",
            ).collect()
        }
        assert out == {1: "b", 2: "c"}

    def test_equidistant_tie_goes_backward(self, spark):
        from clinical_api_etl_spark.operators.temporal import asof_join

        left = spark.createDataFrame(
            [(1, "2024-01-01 10:00:00")], "k long, lt string"
        ).select("k", F.col("lt").cast("timestamp").alias("lt"))
        right = spark.createDataFrame(
            [(1, "2024-01-01 09:00:00", "early"), (1, "2024-01-01 11:00:00", "late")],
            "k long, rt string, tag string",
        ).select("k", F.col("rt").cast("timestamp").alias("rt"), "tag")
        out = asof_join(
            left, right, on=["k"], left_ts="lt", right_ts="rt",
            right_payload=["tag"], direction="nearest",
        ).collect()
        assert out[0].tag_matched == "early"

    def test_equal_timestamp_wins(self, spark):
        from clinical_api_etl_spark.operators.temporal import asof_join

        left = spark.createDataFrame(
            [(1, "2024-01-01 10:00:00")], "k long, lt string"
        ).select("k", F.col("lt").cast("timestamp").alias("lt"))
        right = spark.createDataFrame(
            [(1, "2024-01-01 10:00:00", "same"), (1, "2024-01-01 10:00:01", "next")],
            "k long, rt string, tag string",
        ).select("k", F.col("rt").cast("timestamp").alias("rt"), "tag")
        out = asof_join(
            left, right, on=["k"], left_ts="lt", right_ts="rt",
            right_payload=["tag"], direction="nearest",
        ).collect()
        assert out[0].tag_matched == "same"

    def test_no_match_yields_nulls(self, spark):
        from clinical_api_etl_spark.operators.temporal import asof_join

        left = spark.createDataFrame(
            [(7, "2024-01-01 10:00:00")], "k long, lt string"
        ).select("k", F.col("lt").cast("timestamp").alias("lt"))
        right = spark.createDataFrame(
            [(8, "2024-01-01 10:00:00", "x")], "k long, rt string, tag string"
        ).select("k", F.col("rt").cast("timestamp").alias("rt"), "tag")
        out = asof_join(
            left, right, on=["k"], left_ts="lt", right_ts="rt",
            right_payload=["tag"], direction="nearest",
        ).collect()
        assert out[0].tag_matched is None

    def test_single_exchange_single_sort(self, spark):
        from clinical_api_etl_spark.operators.temporal import asof_join

        left = spark.createDataFrame(
            [(1, "2024-01-01 10:00:00")], "k long, lt string"
        ).select("k", F.col("lt").cast("timestamp").alias("lt"))
        right = spark.createDataFrame(
            [(1, "2024-01-01 09:00:00", "a")], "k long, rt string, tag string"
        ).select("k", F.col("rt").cast("timestamp").alias("rt"), "tag")
        plan = (
            asof_join(
                left, right, on=["k"], left_ts="lt", right_ts="rt",
                right_payload=["tag"], direction="nearest",
            )
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # both window frames must ride one Window node over one
        # exchange + one sort (verified plan shape: a single WindowExec
        # computes __mb and __mf together)
        assert plan.count("Exchange hashpartitioning") == 1
        assert plan.count("Window [") == 1
        assert plan.count("Sort [") == 1
