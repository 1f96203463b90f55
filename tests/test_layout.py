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
