"""Cluster-sorted layout: row-group min/max stats must actually prune.

Writes the same events twice — arrival order vs range-clustered on
user_id — and compares how many row groups a point predicate can skip
using only parquet footer statistics (exactly what Spark's parquet
filter pushdown prunes with).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clinical_api_etl_spark.sources.catalog import load
from clinical_api_etl_spark.sources.layout import (
    row_group_ranges,
    skipping_ratio,
    write_clustered,
)

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("layout")
    events = load(spark, SF_DIR, "events").select("event_id", "user_id", "event_type")
    raw = str(tmp / "raw")
    clustered = str(tmp / "clustered")
    # arrival order, several files so both layouts have multiple row groups
    events.repartition(8).write.mode("overwrite").parquet(raw)
    write_clustered(events, clustered, ["user_id"], num_files=8)
    return raw, clustered


class TestClusteredLayout:
    def test_point_predicate_skips_most_row_groups(self, layouts):
        raw, clustered = layouts
        # mid-domain key: arrival-order row groups all span it
        assert skipping_ratio(raw, "user_id", 75) == 0.0
        assert skipping_ratio(clustered, "user_id", 75) >= 0.75

    def test_ranges_are_disjoint_after_clustering(self, layouts):
        _, clustered = layouts
        ranges = sorted(row_group_ranges(clustered, "user_id"))
        # contiguous, nearly non-overlapping key ranges (boundary keys may
        # straddle two groups)
        overlaps = sum(
             1 for (l1, h1), (l2, h2) in zip(ranges, ranges[1:]) if h1 > l2
        )
        assert overlaps <= len(ranges) // 4

    def test_same_rows_both_layouts(self, spark, layouts):
        raw, clustered = layouts
        a = spark.read.parquet(raw)
        b = spark.read.parquet(clustered)
        assert a.count() == b.count()
        assert (
            a.agg(F.sum("event_id")).collect()[0][0]
            == b.agg(F.sum("event_id")).collect()[0][0]
        )


class TestZOrderLayout:
    """Z-order: row groups cover hyper-rectangles, so min/max stats prune
    on BOTH clustered columns; lexicographic prunes only the leading one."""

    @pytest.fixture(scope="class")
    def zlayouts(self, spark, tmp_path_factory):
        from clinical_api_etl_spark.sources.layout import write_zordered

        tmp = tmp_path_factory.mktemp("zorder")
        events = (
            load(spark, SF_DIR, "events")
            .filter(F.col("value").isNotNull())
            .select("event_id", "user_id", "value")
        )
        lex = str(tmp / "lex")
        zord = str(tmp / "zord")
        write_clustered(events, lex, ["user_id", "value"], num_files=8)
        write_zordered(events, zord, ["user_id", "value"], num_files=8)
        return lex, zord

    def test_zorder_prunes_on_both_columns(self, spark, zlayouts):
        lex, zord = zlayouts
        ev = spark.read.parquet(zord)
        lo, hi = ev.agg(F.min("value"), F.max("value")).collect()[0]
        mid_value = (lo + hi) / 2
        # leading column: both layouts prune
        assert skipping_ratio(lex, "user_id", 75) > 0.0
        assert skipping_ratio(zord, "user_id", 75) > 0.0
        # trailing column: lexicographic prunes ~nothing, Z-order does
        lex_trailing = skipping_ratio(lex, "value", mid_value)
        z_trailing = skipping_ratio(zord, "value", mid_value)
        assert z_trailing > lex_trailing
        assert z_trailing >= 0.25

    def test_zorder_preserves_rows(self, spark, zlayouts):
        _, zord = zlayouts
        orig = load(spark, SF_DIR, "events").filter(F.col("value").isNotNull())
        back = spark.read.parquet(zord)
        assert back.count() == orig.count()
        assert (
            back.agg(F.sum("event_id")).collect()[0][0]
            == orig.agg(F.sum("event_id")).collect()[0][0]
        )

    def test_morton_interleave_known_values(self, spark):
        from clinical_api_etl_spark.sources.layout import morton_interleave

        df = spark.createDataFrame([(3, 5)], ["x", "y"])
        # x=0b011, y=0b101 -> interleave (y<<1 | x per bit): z = 0b100111 = 39
        got = df.select(
            morton_interleave([F.col("x"), F.col("y")], bits=3).alias("z")
        ).collect()[0].z
        expect = sum(
            (((3 >> i) & 1) << (2 * i)) | (((5 >> i) & 1) << (2 * i + 1))
            for i in range(3)
        )
        assert got == expect == 39
