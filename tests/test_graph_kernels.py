"""Round-11 driver-kernel fast paths (operators/graphkernel.py) must be
BIT-IDENTICAL to the distributed loops they replace — integer state is
order-free, and the Brandes delta replays the pinned successor-sorted
left fold (reduceat/reduce are PAIRWISE in numpy and would diverge; the
kernel steps positions explicitly)."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

import clinical_api_etl_spark.operators.graph as G


def _bitrows(df):
    """Rows with floats replaced by their IEEE bit patterns."""
    return sorted(
        tuple(
            struct.pack("<d", x).hex() if isinstance(x, float) else x
            for x in r
        )
        for r in df.collect()
    )


def _ab(fn, *args, **kwargs):
    """(fast_rows, slow_rows) — run fn with the driver path, then force
    the distributed fallback."""
    fast = _bitrows(fn(*args, **kwargs))
    orig = G.DRIVER_GRAPH_MAX_EDGES
    G.DRIVER_GRAPH_MAX_EDGES = -1
    try:
        slow = _bitrows(fn(*args, **kwargs))
    finally:
        G.DRIVER_GRAPH_MAX_EDGES = orig
    return fast, slow


@pytest.fixture()
def toy(spark):
    # cycle + DAG tendrils + a node absent from the source side + a
    # multi-parent diamond (sigma > 1) + an unreached island (g-h)
    edges = [
        ("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e"),
        ("b", "d"), ("x", "a"), ("a", "d"), ("g", "h"),
    ]
    return spark.createDataFrame(edges, "src string, dst string")


@pytest.fixture()
def probes(spark):
    # one hub source, one periphery source, one source ABSENT from the
    # edge list (seed-only row semantics)
    return spark.createDataFrame([("a",), ("x",), ("q",)], "node string")


class TestKernelParity:
    def test_bfs_hops(self, spark, toy, probes):
        fast, slow = _ab(G.bfs_hops, toy, probes, iters=3)
        assert fast == slow

    def test_bfs_hops_per_source(self, spark, toy, probes):
        fast, slow = _ab(G.bfs_hops_per_source, toy, probes, iters=3)
        assert fast == slow

    def test_path_counts(self, spark, toy, probes):
        fast, slow = _ab(G.bfs_path_counts, toy, probes, iters=3)
        assert fast == slow

    def test_brandes(self, spark, toy, probes):
        fast, slow = _ab(G.brandes_dependencies, toy, probes, iters=3)
        assert fast == slow

    def test_bellman_ford(self, spark, probes):
        we = spark.createDataFrame(
            [("a", "b", 3), ("b", "c", 1), ("c", "a", 2), ("a", "c", 9),
             ("c", "d", 1), ("x", "a", 1), ("b", "d", 7)],
            "src string, dst string, w long",
        )
        fast, slow = _ab(G.bellman_ford_bounded, we, probes, iters=3)
        assert fast == slow

    def test_temporal(self, spark, probes):
        te = spark.createDataFrame(
            [("a", "b", 1), ("b", "c", 2), ("c", "d", 1), ("a", "c", 5),
             ("x", "a", 3), ("b", "d", 9)],
            "src string, dst string, t long",
        )
        fast, slow = _ab(G.temporal_earliest_arrival, te, probes, iters=3)
        assert fast == slow

    def test_duplicate_sources_fall_back(self, spark, toy):
        # duplicated probe rows must take the distributed path (the
        # loops emit one seed row per OCCURRENCE); the dispatcher
        # detects duplicates and declines
        dup = spark.createDataFrame([("a",), ("a",)], "node string")
        out = _bitrows(G.bfs_hops_per_source(toy, dup, iters=2))
        assert sum(1 for r in out if r[0] == "a" and r[1] == "a") == 2

    def test_brandes_sf0001_bitwise(self, spark):
        """Realistic degree distribution (longer folds) at sf0.001."""
        from clinical_api_etl_spark.sources.catalog import load

        sf = "/root/testdata/sf0.001"
        li = load(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
        orders = load(spark, sf, "orders").select("o_orderkey", "o_custkey")
        e0 = (
            li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
            .select(
                F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
                F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
            )
            .distinct()
        )
        edges = G.symmetrize(e0)
        sources = spark.createDataFrame(
            [("s1",), ("s2",), ("s3",)], "node string"
        )
        fast, slow = _ab(G.brandes_dependencies, edges, sources, iters=4)
        assert fast == slow
        spark.catalog.clearCache()


class TestSeqSegmentSum:
    def test_strict_left_fold(self):
        import numpy as np

        from clinical_api_etl_spark.operators.graphkernel import (
            _seq_segment_sum,
        )

        rng = np.random.default_rng(11)
        terms = rng.random(5000)
        starts = np.sort(
            np.unique(
                np.concatenate(([0], rng.integers(1, 5000, size=40)))
            )
        )
        got = _seq_segment_sum(terms, starts, len(terms))
        ends = np.append(starts[1:], len(terms))
        for i, (a, b) in enumerate(zip(starts, ends)):
            acc = 0.0
            for x in terms[a:b]:
                acc = acc + x
            assert struct.pack("<d", got[i]) == struct.pack("<d", acc)
