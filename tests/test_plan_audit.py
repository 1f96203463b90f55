"""Seeded negative tests for the plan-audit flags: each detector must fire
on a deliberately bad plan and stay silent on the equivalent good plan.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from plan_audit import _dim_smj, _no_pushdown  # noqa: E402

SF = "/root/testdata/sf0.001"


def _root(df):
    return df._jdf.queryExecution().executedPlan()  # noqa: SLF001


class TestDimSMJ:
    def test_fires_on_merge_hinted_dim_join(self, spark):
        nation = spark.read.parquet(f"{SF}/nation.parquet")
        customer = spark.read.parquet(f"{SF}/customer.parquet")
        bad = customer.join(
            nation.hint("merge"), customer.c_nationkey == nation.n_nationkey
        )
        assert _dim_smj(_root(bad))

    def test_silent_on_broadcast_dim_join(self, spark):
        nation = spark.read.parquet(f"{SF}/nation.parquet")
        customer = spark.read.parquet(f"{SF}/customer.parquet")
        good = customer.join(
            F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
        )
        assert not _dim_smj(_root(good))

    def test_silent_on_full_outer_dim_smj(self, spark):
        """j2's shape: FULL OUTER cannot broadcast — SMJ is the only plan."""
        nation = spark.read.parquet(f"{SF}/nation.parquet")
        customer = spark.read.parquet(f"{SF}/customer.parquet")
        fo = customer.join(
            nation, customer.c_nationkey == nation.n_nationkey, "full_outer"
        )
        assert not _dim_smj(_root(fo))

    def test_silent_on_big_big_smj(self, spark):
        """Fact-to-fact SMJ is the correct strategy — never flagged."""
        orders = spark.read.parquet(f"{SF}/orders.parquet").hint("merge")
        lineitem = spark.read.parquet(f"{SF}/lineitem.parquet")
        big = lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        assert not _dim_smj(_root(big))


class TestNoPushdown:
    def test_fires_on_unpushable_scan_filter(self, spark):
        region = spark.read.parquet(f"{SF}/region.parquet")
        # coalesce() defeats parquet pushdown AND implies no IsNotNull,
        # so PushedFilters stays [] while a Filter sits on the scan.
        bad = region.filter(F.coalesce(F.col("r_name"), F.lit("")) != "x")
        assert _no_pushdown(_root(bad))

    def test_silent_on_pushed_filter(self, spark):
        region = spark.read.parquet(f"{SF}/region.parquet")
        good = region.filter(F.col("r_name") == "ASIA")
        assert not _no_pushdown(_root(good))

    def test_silent_on_derived_column_filter(self, spark):
        """A filter above a groupBy (post-shuffle) is not a scan miss."""
        orders = spark.read.parquet(f"{SF}/orders.parquet")
        agg = (
            orders.groupBy("o_custkey")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 3)
        )
        assert not _no_pushdown(_root(agg))


@pytest.mark.slow
class TestRegistryClean:
    def test_audit_detectors_silent_on_registry(self, spark):
        """Every registered query passes both new detectors (allowlists
        applied) — mirrors `python tools/plan_audit.py` staying 0-flagged."""
        from plan_audit import DIM_SMJ_OK, NO_PUSHDOWN_OK

        from clinical_api_etl_spark.plans.registry import all_queries

        for name, q in all_queries().items():
            root = _root(q.builder(spark, SF))
            if name not in DIM_SMJ_OK:
                assert not _dim_smj(root), f"DIM-SMJ fired on {name}"
            if name not in NO_PUSHDOWN_OK:
                assert not _no_pushdown(root), f"NO-PUSHDOWN fired on {name}"


class TestGlobalWindow:
    def test_fires_on_partitionless_window(self, spark):
        from pyspark.sql.window import Window

        from plan_audit import _global_window

        ev = spark.read.parquet(f"{SF}/events.parquet")
        bad = ev.withColumn(
            "rn", F.row_number().over(Window.orderBy("event_id"))
        )
        assert _global_window(_root(bad))

    def test_silent_on_partitioned_window(self, spark):
        from pyspark.sql.window import Window

        from plan_audit import _global_window

        ev = spark.read.parquet(f"{SF}/events.parquet")
        good = ev.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("event_type").orderBy("event_id")
            ),
        )
        assert not _global_window(_root(good))


class TestBroadcastAudit:
    def test_every_broadcast_site_is_documented(self):
        """Every F.broadcast hint must carry a cardinality-boundedness
        justification in BROADCAST_ALLOWLIST.json — an undocumented site
        is the next scale-killing inversion waiting to ship (the r08
        verdict found three). Pure-AST check, no Spark session."""
        import sys

        sys.path.insert(0, "tools")
        import broadcast_audit

        assert broadcast_audit.main() == 0
