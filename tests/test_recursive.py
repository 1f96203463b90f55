"""Recursive CTE family (plans/recursive.py): python-reference replays,
equivalence with the frontier BFS operator, and executable probes of the
Spark 4.1.2 recursion limitations the module's design depends on."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clinical_api_etl_spark.sources.catalog import load

SF = "/root/testdata/sf0.001"


class TestPartAncestorRollup:
    def test_matches_python_walk(self, spark):
        from clinical_api_etl_spark.plans.recursive import rec_part_ancestor_rollup

        got = {r["p_partkey"]: r for r in rec_part_ancestor_rollup(spark, SF).collect()}
        parts = load(spark, SF, "part").select("p_partkey", "p_retailprice").collect()
        cents = {
            r["p_partkey"]: round(float(r["p_retailprice"]) * 100)
            for r in parts
        }
        assert len(got) == len(cents)
        for k0 in cents:
            k, depth, chain = k0, 0, cents[k0]
            while k > 0:
                k //= 2
                depth += 1
                chain += cents[k]
            g = got[k0]
            assert g["depth_to_root"] == depth
            assert g["chain_cents"] == chain
            assert g["avg_chain_price"] == chain / ((depth + 1) * 1e2)

    def test_depth_is_log2(self, spark):
        from clinical_api_etl_spark.plans.recursive import rec_part_ancestor_rollup

        rows = rec_part_ancestor_rollup(spark, SF).collect()
        for r in rows:
            k = r["p_partkey"]
            expect = 0 if k == 0 else k.bit_length()  # floor(log2 k) + 1
            assert r["depth_to_root"] == expect


class TestRecursiveReachability:
    def test_equals_frontier_bfs_operator(self, spark):
        """The declared recursion and the hand-built frontier loop must
        produce identical BFS distances on the shared probe set."""
        from clinical_api_etl_spark.operators.graph import bfs_hops
        from clinical_api_etl_spark.plans.recursive import (
            _REACH_ITERS,
            rec_reachability_hops,
        )

        rec = {
            (r["node"]): r["dist"] for r in rec_reachability_hops(spark, SF).collect()
        }

        li = load(spark, SF, "lineitem").select("l_orderkey", "l_suppkey")
        orders = load(spark, SF, "orders").select("o_orderkey", "o_custkey")
        e0 = (
            li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
            .select(
                F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
                F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
            )
            .distinct()
        )
        edges = e0.union(
            e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        sources = (
            load(spark, SF, "supplier")
            .filter(F.col("s_suppkey") < 8)
            .select(
                F.concat(F.lit("s"), F.col("s_suppkey").cast("string")).alias("node")
            )
        )
        op = {
            r["node"]: r["dist"]
            for r in bfs_hops(edges, sources, iters=_REACH_ITERS).collect()
        }
        assert rec == op


class TestSparkRecursionLimitsProbes:
    """Executable knowledge: the design rules in plans/recursive.py's
    docstring hold on this pyspark build. If an upgrade lifts either
    limitation, these tests fail and the module can be simplified."""

    def test_union_distinct_recursion_unsupported(self, spark):
        from pyspark.errors.exceptions.captured import AnalysisException

        spark.sql(
            "CREATE OR REPLACE TEMP VIEW __rec_probe_e AS "
            "SELECT * FROM VALUES (1,2),(2,3),(3,1) AS t(src,dst)"
        )
        with pytest.raises(AnalysisException, match="UNION_NOT_SUPPORTED"):
            spark.sql(
                """
                WITH RECURSIVE reach(node) AS (
                  SELECT 1
                  UNION
                  SELECT e.dst FROM reach r JOIN __rec_probe_e e
                  ON e.src = r.node
                ) SELECT * FROM reach
                """
            ).collect()

    def test_unguarded_cycle_hits_level_limit(self, spark):
        with pytest.raises(Exception, match="RECURSION_LEVEL_LIMIT_EXCEEDED"):
            spark.sql(
                """
                WITH RECURSIVE reach(node) AS (
                  SELECT 1
                  UNION ALL
                  SELECT e.dst FROM reach r
                  JOIN __rec_probe_e e ON e.src = r.node
                ) SELECT count(*) AS n FROM reach
                """
            ).collect()

    def test_guarded_recursion_terminates(self, spark):
        rows = spark.sql(
            """
            WITH RECURSIVE t(n) AS (
              SELECT 1 UNION ALL SELECT n + 1 FROM t WHERE n < 5
            ) SELECT n FROM t ORDER BY n
            """
        ).collect()
        assert [r["n"] for r in rows] == [1, 2, 3, 4, 5]


class TestSqlScripting:
    """Spark 4 SQL scripting (BEGIN/WHILE/IF) — the bisection quantile
    query's semantics pinned by python replay."""

    def test_bisect_matches_order_statistic(self, spark):
        from decimal import Decimal

        from clinical_api_etl_spark.plans.relational import (
            sql_scripting_quantile_bisect,
        )
        from clinical_api_etl_spark.sources.catalog import load

        sf = "/root/testdata/sf0.001"
        row = sql_scripting_quantile_bisect(spark, sf).collect()[0]
        ev = load(spark, sf, "events").filter("value is not null").collect()
        cents = sorted(
            int(Decimal(str(r["value"])).quantize(Decimal("0.01")) * 100)
            for r in ev
        )
        n = len(cents)
        k = (9 * n + 9) // 10
        assert row["n"] == n and row["k"] == k
        assert row["p90_cents"] == cents[k - 1]  # k-th order statistic
        assert row["iters"] == 26  # structural constant: log2(2^26)
        # rank property of the type-1 quantile
        assert sum(1 for c in cents if c <= row["p90_cents"]) >= k
        assert sum(1 for c in cents if c < row["p90_cents"]) < k
