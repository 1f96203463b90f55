"""Capture before/after physical plans for the round-11 frontier-broadcast
optimization (plans/r11/).

For the iterative graph family the final returned DataFrame is a union of
checkpointed RDD scans (see *_before.txt), which hides the per-round join
the optimization targets. This tool therefore ALSO captures the per-round
expansion-join plan both ways on the real sf0.01 interaction graph:

- frontier_round_before.txt — the salted shuffle join the loops used when
  the frontier is a stats-less checkpointed RDD (SortMergeJoin + Exchange
  of the persisted edge table EVERY round),
- frontier_round_after.txt  — the driver-count-bounded broadcast join
  (_frontier_expand: BroadcastHashJoin, edge table streamed in place, no
  salt replication).

Usage: PYTHONPATH=. python tools/capture_r11_plans.py [queries...]
With query names, re-captures their final plans into plans/r11/<q>_after.txt.
"""
from __future__ import annotations

import os
import sys

from pyspark.sql import SparkSession, functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r11")


def _spark() -> SparkSession:
    from clinical_api_etl_spark.session import get_spark

    return get_spark()


def capture_round_pair(spark: SparkSession) -> None:
    from clinical_api_etl_spark.operators.graph import (
        _frontier_expand,
        _replicated,
        _salted_edges,
        symmetrize,
    )
    from clinical_api_etl_spark.sources.catalog import load

    li = load(spark, SF_DIR, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    e0 = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    e = _salted_edges(symmetrize(e0), "src", "dst")
    sources = (
        load(spark, SF_DIR, "supplier")
        .filter(F.col("s_suppkey") < 8)
        .select(
            F.concat(F.lit("s"), F.col("s_suppkey").cast("string")).alias("node"),
            F.lit(0).cast("long").alias("dist"),
        )
    )
    # Reproduce ROUND 2's frontier, not the seed: a seed checkpoint
    # retains its origin plan's (tiny) stat estimates, so even the
    # unhinted join broadcasts it. The loops' later frontiers derive from
    # a join + anti-join whose estimates are join-selectivity products —
    # effectively unbounded — which is what pushes AQE to sort-merge.
    seed = sources.localCheckpoint(eager=True)
    sfr = _replicated(seed)
    frontier = (
        e.join(sfr, (e["src"] == sfr["node"]) & (e["_slt"] == sfr["_slt"]))
        .select(F.col("dst").alias("node"), (F.col("dist") + F.lit(1)).alias("dist"))
        .groupBy("node")
        .agg(F.min("dist").alias("dist"))
        .join(seed.select("node"), "node", "left_anti")
        .localCheckpoint(eager=False)
    )
    n = frontier.count()

    fr = _replicated(frontier)
    before = (
        e.join(fr, (e["src"] == fr["node"]) & (e["_slt"] == fr["_slt"]))
        .select(F.col("dst").alias("node"), (F.col("dist") + F.lit(1)).alias("dist"))
        .groupBy("node")
        .agg(F.min("dist").alias("dist"))
    )
    after = (
        _frontier_expand(e, frontier, n)
        .select(F.col("dst").alias("node"), (F.col("dist") + F.lit(1)).alias("dist"))
        .groupBy("node")
        .agg(F.min("dist").alias("dist"))
    )
    with open(os.path.join(OUT, "frontier_round_before.txt"), "w") as f:
        f.write(before._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    with open(os.path.join(OUT, "frontier_round_after.txt"), "w") as f:
        f.write(after._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    print("wrote frontier_round_before/after")


def capture_final(spark: SparkSession, names: list[str]) -> None:
    from clinical_api_etl_spark.plans.registry import all_queries

    qs = all_queries()
    for name in names:
        df = qs[name].builder(spark, SF_DIR)
        path = os.path.join(OUT, f"{name}_after.txt")
        with open(path, "w") as f:
            f.write(df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
        print("wrote", path)


if __name__ == "__main__":
    spark = _spark()
    capture_round_pair(spark)
    if len(sys.argv) > 1:
        capture_final(spark, sys.argv[1:])
