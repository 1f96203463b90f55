"""Bucketed-layout tests: the orders⋈lineitem join must plan with zero
exchanges when both sides are bucketed on the join key."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clinical_api_etl_spark.sources.bucketed import bucketed_join_ready, write_bucketed


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    orders = spark.range(1000).select(
        F.col("id").alias("o_orderkey"), (F.col("id") % 7).alias("o_flag")
    )
    li = spark.range(4000).select(
        (F.col("id") % 1000).alias("l_orderkey"), F.col("id").alias("l_qty")
    )
    write_bucketed(
        orders, "t_orders_b", str(tmp_path / "ob"),
        bucket_by=["o_orderkey"], buckets=8, sort_by=["o_orderkey"],
    )
    write_bucketed(
        li, "t_lineitem_b", str(tmp_path / "lb"),
        bucket_by=["l_orderkey"], buckets=8, sort_by=["l_orderkey"],
    )
    yield
    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_pair):
    assert bucketed_join_ready(spark, "t_orders_b", "t_lineitem_b")
    o = spark.table("t_orders_b")
    l = spark.table("t_lineitem_b")
    # Disable broadcast so the join exercises the bucketed-shuffle path.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = o.join(l, o.o_orderkey == l.l_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
        assert "Exchange" not in plan, plan
        assert joined.count() == 4000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_bucketed_agg_avoids_shuffle(spark, bucketed_pair):
    l = spark.table("t_lineitem_b")
    plan = (
        l.groupBy("l_orderkey").agg(F.sum("l_qty"))
        ._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    )
    assert "Exchange" not in plan, plan
