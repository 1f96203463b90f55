"""Equivalence tests for the skew utilities (operators/skew.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clinical_api_etl_spark.operators.skew import (
    count_distinct_spread,
    key_histogram,
    salted_join,
)


@pytest.fixture()
def skewed(spark):
    # 900 rows on key 1 (hot), a few on 2/3; right has multiple rows per key.
    left = spark.range(1000).select(
        F.when(F.col("id") < 900, 1).otherwise((F.col("id") % 3).cast("long") + 2).alias("k"),
        F.col("id").alias("lval"),
    )
    right = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (4, "d")], "k long, rval string"
    )
    return left, right


class TestSaltedJoin:
    def test_inner_equals_plain(self, skewed):
        left, right = skewed
        plain = left.join(right, ["k"]).collect()
        salted = salted_join(left, right, ["k"], salt=4).collect()
        key = lambda r: (r["k"], r["lval"], r["rval"])  # noqa: E731
        assert sorted(map(key, salted)) == sorted(map(key, plain))

    def test_left_preserves_unmatched(self, skewed):
        left, right = skewed
        out = salted_join(left, right, ["k"], salt=4, how="left")
        assert out.count() == left.join(right, ["k"], "left").count()
        assert out.filter(F.col("rval").isNull()).count() > 0

    def test_rejects_unsupported_how(self, skewed):
        left, right = skewed
        with pytest.raises(ValueError):
            salted_join(left, right, ["k"], how="full_outer")


class TestCountDistinctSpread:
    def test_equals_count_distinct(self, spark):
        df = spark.range(500).select(
            (F.col("id") % 5).alias("k"), (F.col("id") % 37).alias("v")
        )
        expect = {
            r["k"]: r["n"]
            for r in df.groupBy("k").agg(F.countDistinct("v").alias("n")).collect()
        }
        got = {
            r["k"]: r["n_distinct"]
            for r in count_distinct_spread(df, ["k"], "v").collect()
        }
        assert got == expect


def test_key_histogram_orders_heaviest_first(skewed):
    left, _ = skewed
    rows = key_histogram(left, ["k"]).collect()
    assert rows[0]["k"] == 1 and rows[0]["rows"] == 900
    assert rows[0]["share"] == pytest.approx(0.9)
    assert [r["rows"] for r in rows] == sorted((r["rows"] for r in rows), reverse=True)
