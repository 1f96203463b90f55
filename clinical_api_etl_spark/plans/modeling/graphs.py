"""Round-11+ modeling family, graph slice: HITS, harmonic/closeness centrality, Brandes path counts + dependency accumulation (betweenness), bounded Bellman-Ford, temporal reachability.

Part of the ``plans.modeling`` package — the former 3,160-line
plans/modeling.py split along its families (VERDICT r09 task 8):
tsmisc (sequential-recurrence time series, bootstrap, DQ/CDC/sampling),
graphs (HITS, centralities, Brandes, Bellman-Ford, temporal reach),
mlevals (kNN/stump learners, calibration, ROC/PR/lift/learning-curve,
McNemar). Mechanical split, zero behavior change; the package __init__
merges the QuerySets and re-exports every top-level name.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clinical_api_etl_spark.plans.base import QuerySet
from clinical_api_etl_spark.sources.catalog import load

QS = QuerySet()

# ---------------------------------------------------------------------------
# HITS hubs & authorities — 10th fully hash-gated iterative algorithm.
# ---------------------------------------------------------------------------

_HITS_ITERS = 3
_HITS_SCALE = 1_000_000


def _hits_oracle() -> str:
    its = []
    for k in range(1, _HITS_ITERS + 1):
        its.append(
            f"""
    a{k}raw AS MATERIALIZED (
      SELECT s, CAST(SUM(h) AS BIGINT) AS ar
      FROM e JOIN h{k - 1} USING (c) GROUP BY s),
    a{k} AS MATERIALIZED (
      SELECT s, CAST(ar * {_HITS_SCALE} // (SELECT SUM(ar) FROM a{k}raw)
                AS BIGINT) AS a
      FROM a{k}raw),
    h{k}raw AS MATERIALIZED (
      SELECT c, CAST(SUM(a) AS BIGINT) AS hr
      FROM e JOIN a{k} USING (s) GROUP BY c),
    h{k} AS MATERIALIZED (
      SELECT c, CAST(hr * {_HITS_SCALE} // (SELECT SUM(hr) FROM h{k}raw)
                AS BIGINT) AS h
      FROM h{k}raw)"""
        )
    return f"""
    WITH e AS MATERIALIZED (
      SELECT DISTINCT o_custkey AS c, l_suppkey AS s
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    h0 AS (SELECT DISTINCT c, CAST({_HITS_SCALE} AS BIGINT) AS h FROM e),
    {",".join(its)}
    SELECT 'c' || CAST(c AS VARCHAR) AS node, 'hub' AS kind,
           h AS score_units FROM h{_HITS_ITERS}
    UNION ALL
    SELECT 's' || CAST(s AS VARCHAR) AS node, 'auth' AS kind,
           a AS score_units FROM a{_HITS_ITERS}
    """


@QS.add(
    "graph_hits_scores",
    _hits_oracle(),
    doc="[EXT] HITS (Kleinberg) hubs & authorities over the directed "
    "customer->supplier purchase graph, 3 iterations in EXACT integer "
    "arithmetic: scores L1-normalize to 1e6 units per half-step via "
    "BIGINT floor-division, so both engines agree bit-for-bit — the "
    "10th iterative algorithm under a full value hash. Spark: each "
    "half-step is one score-vector equi-join + one key shuffle with "
    "map-side partials; the raw aggregate is referenced twice (total + "
    "normalization) so it eager-checkpoints per half-step (k-core "
    "rule), and the total rides a 1-row broadcast cross join. Oracle: "
    "unrolled CTE chain, every stage MATERIALIZED (the round-6 "
    "exponential-re-expansion rule). operators/graph.py:hits_int.",
    headline=True,
    tags=("graph",),
)
def graph_hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.graph import hits_int

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    e = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    return hits_int(e, iters=_HITS_ITERS, scale=_HITS_SCALE)


# ---------------------------------------------------------------------------
# Harmonic centrality of a supplier probe set — exact x12 integer units.
# (+ the classic closeness variant on the same BFS, one division.)
# ---------------------------------------------------------------------------

_HC_ITERS = 4


def _harmonic_oracle() -> str:
    """Unrolled per-source BFS; every it{k} referenced twice -> MATERIALIZED.
    Harmonic sum stays exact: with hop distances bounded by the iteration
    count (<= 4), 12/d is an exact integer (12 = lcm(1..4)), so the
    centrality numerator is a BIGINT and the final value one division."""
    it = """
    it{k} AS MATERIALIZED (
      SELECT s, node, CAST(MIN(dist) AS BIGINT) AS dist FROM (
        SELECT s, node, dist FROM it{p}
        UNION ALL
        SELECT r.s, e.dst AS node, r.dist + 1 AS dist
        FROM edges e JOIN it{p} r ON e.src = r.node
      ) u GROUP BY s, node
    )"""
    its = ",".join(it.format(k=k, p=k - 1) for k in range(1, _HC_ITERS + 1))
    return f"""
    WITH e0 AS MATERIALIZED (
      SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                      's' || CAST(l_suppkey AS VARCHAR) AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    edges AS MATERIALIZED (
      SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0
    ),
    it0 AS MATERIALIZED (
      SELECT 's' || CAST(s_suppkey AS VARCHAR) AS s,
             's' || CAST(s_suppkey AS VARCHAR) AS node, CAST(0 AS BIGINT) AS dist
      FROM supplier WHERE s_suppkey < 8
    ),
    {its}
    SELECT s AS source_node,
           CAST(COUNT(*) - 1 AS BIGINT) AS n_reached,
           CAST(SUM(CASE WHEN dist > 0 THEN 12 // dist ELSE 0 END)
                AS BIGINT) AS harmonic_x12,
           CAST(SUM(CASE WHEN dist > 0 THEN 12 // dist ELSE 0 END) AS DOUBLE)
             / 12e0 AS harmonic
    FROM it{_HC_ITERS} GROUP BY s
    """


@QS.add(
    "graph_harmonic_centrality",
    _harmonic_oracle(),
    doc="[EXT] harmonic centrality (sum of 1/d to every reachable node, "
    "the disconnect-safe closeness variant) for a supplier probe set "
    "(fixed 8-supplier probe — bounded at every SF; centrality probes "
    "are bounded sets by posture) over the symmetrized interaction graph, "
    f"within {_HC_ITERS} hops. EXACT arithmetic trick: hop distances "
    "are bounded by the iteration count, so multiplying by lcm(1..4)=12 "
    "makes the harmonic sum an exact BIGINT (12//d per term) and the "
    "final centrality ONE division — no float association anywhere. "
    "One tagged BFS run covers the whole probe set: state keyed "
    "(source, node), same Pregel join+min rounds as bfs_hops "
    "(operators/graph.py:bfs_hops_per_source), eager-checkpointed per "
    "round. 11th hash-gated iterative.",
    headline=True,
    tags=("graph", "iterative"),
)
def graph_harmonic_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.graph import bfs_hops_per_source

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    e0 = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    from clinical_api_etl_spark.operators.graph import symmetrize

    edges = symmetrize(e0)
    sources = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") < 8)
        .select(F.concat(F.lit("s"), F.col("s_suppkey").cast("string")).alias("node"))
    )
    dist = bfs_hops_per_source(edges, sources, iters=_HC_ITERS)
    return dist.groupBy(F.col("s").alias("source_node")).agg(
        (F.count(F.lit(1)) - 1).cast("long").alias("n_reached"),
        F.sum(
            F.when(F.col("dist") > 0, F.expr("12 div dist")).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("harmonic_x12"),
        (
            F.sum(
                F.when(F.col("dist") > 0, F.expr("12 div dist")).otherwise(F.lit(0))
            ).cast("double")
            / F.lit(12.0)
        ).alias("harmonic"),
    )


def _closeness_oracle() -> str:
    """Same unrolled per-source BFS as harmonic; the aggregate is the
    classic closeness numerator/denominator instead of the x12 sum."""
    it = """
    it{k} AS MATERIALIZED (
      SELECT s, node, CAST(MIN(dist) AS BIGINT) AS dist FROM (
        SELECT s, node, dist FROM it{p}
        UNION ALL
        SELECT r.s, e.dst AS node, r.dist + 1 AS dist
        FROM edges e JOIN it{p} r ON e.src = r.node
      ) u GROUP BY s, node
    )"""
    its = ",".join(it.format(k=k, p=k - 1) for k in range(1, _HC_ITERS + 1))
    return f"""
    WITH e0 AS MATERIALIZED (
      SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                      's' || CAST(l_suppkey AS VARCHAR) AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    edges AS MATERIALIZED (
      SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0
    ),
    it0 AS MATERIALIZED (
      SELECT 's' || CAST(s_suppkey AS VARCHAR) AS s,
             's' || CAST(s_suppkey AS VARCHAR) AS node, CAST(0 AS BIGINT) AS dist
      FROM supplier WHERE s_suppkey < 8
    ),
    {its}
    SELECT s AS source_node,
           CAST(COUNT(*) - 1 AS BIGINT) AS n_reached,
           CAST(SUM(dist) AS BIGINT) AS sum_dist,
           CASE WHEN SUM(dist) = 0 THEN NULL
                ELSE CAST(COUNT(*) - 1 AS DOUBLE) / CAST(SUM(dist) AS DOUBLE)
           END AS closeness
    FROM it{_HC_ITERS} GROUP BY s
    """


@QS.add(
    "graph_closeness_probe",
    _closeness_oracle(),
    doc="[EXT] closeness centrality (reached-nodes count over summed hop "
    "distances — the Wasserman-Faust bounded-reach form) for the same "
    "8-supplier probe set and symmetrized interaction graph as "
    f"graph_harmonic_centrality, within {_HC_ITERS} hops. Components "
    "are exact BIGINTs off ONE tagged per-source BFS "
    "(bfs_hops_per_source — the run is shared work-shape-wise with "
    "harmonic, not plan-shared, so each query stays independently "
    "checkable); closeness = (n_reached-1)/sum_dist is ONE division, "
    "NULL on an isolated probe (ANSI-divide rule). Harmonic is the "
    "disconnect-safe variant; classic closeness is what most "
    "centrality consumers still ask for first.",
    tags=("graph", "iterative"),
)
def graph_closeness_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.graph import (
        bfs_hops_per_source,
        symmetrize,
    )

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    e0 = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    edges = symmetrize(e0)
    sources = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") < 8)
        .select(F.concat(F.lit("s"), F.col("s_suppkey").cast("string")).alias("node"))
    )
    dist = bfs_hops_per_source(edges, sources, iters=_HC_ITERS)
    return dist.groupBy(F.col("s").alias("source_node")).agg(
        (F.count(F.lit(1)) - 1).cast("long").alias("n_reached"),
        F.sum("dist").cast("long").alias("sum_dist"),
        F.when(F.sum("dist") == 0, F.lit(None))
        .otherwise(
            (F.count(F.lit(1)) - 1).cast("double")
            / F.sum("dist").cast("double")
        )
        .alias("closeness"),
    )


# ---------------------------------------------------------------------------
# Shortest-path counts (Brandes sigma) from a bounded probe set.
# ---------------------------------------------------------------------------

_SPC_ITERS = 4


def _path_counts_oracle() -> str:
    """Unrolled frontier BFS with path counting: lvl{k} holds the nodes
    FIRST reached at hop k with sigma = sum of level-(k-1) predecessor
    sigmas; set{k} accumulates the settled state used to reject
    re-discoveries. Every CTE is referenced more than once downstream ->
    all MATERIALIZED (the k-core exponential-re-expansion rule)."""
    step = """
    lvl{k} AS MATERIALIZED (
      SELECT c.s, c.node, CAST({k} AS BIGINT) AS dist, c.sigma FROM (
        SELECT r.s, e.dst AS node, CAST(SUM(r.sigma) AS BIGINT) AS sigma
        FROM edges e JOIN lvl{p} r ON e.src = r.node
        GROUP BY r.s, e.dst
      ) c LEFT JOIN set{p} st ON st.s = c.s AND st.node = c.node
      WHERE st.node IS NULL
    ),
    set{k} AS MATERIALIZED (
      SELECT s, node FROM set{p} UNION ALL SELECT s, node FROM lvl{k}
    )"""
    its = ",".join(step.format(k=k, p=k - 1) for k in range(1, _SPC_ITERS + 1))
    union_all = " UNION ALL ".join(
        f"SELECT s, node, dist, sigma FROM lvl{k}" for k in range(_SPC_ITERS + 1)
    )
    return f"""
    WITH e0 AS MATERIALIZED (
      SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                      's' || CAST(l_suppkey AS VARCHAR) AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    edges AS MATERIALIZED (
      SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0
    ),
    lvl0 AS MATERIALIZED (
      SELECT 's' || CAST(s_suppkey AS VARCHAR) AS s,
             's' || CAST(s_suppkey AS VARCHAR) AS node,
             CAST(0 AS BIGINT) AS dist, CAST(1 AS BIGINT) AS sigma
      FROM supplier WHERE s_suppkey < 8
    ),
    set0 AS MATERIALIZED (SELECT s, node FROM lvl0),
    {its}
    SELECT s AS source_node, node, dist, sigma FROM ({union_all}) u
    """


@QS.add(
    "graph_path_counts",
    _path_counts_oracle(),
    doc="[EXT] exact shortest-path COUNTS (Brandes sigma, the forward "
    "half of betweenness centrality) from the fixed 8-supplier probe "
    "set over the symmetrized interaction graph, within "
    f"{_SPC_ITERS} hops. sigma(v) at level k+1 = SUM of sigma over "
    "level-k predecessors — path counts are sums of exact BIGINTs, so "
    "the whole computation is integer arithmetic and carries a full "
    "value hash (12th hash-gated iterative). Frontier discipline: each "
    "(source, node) pair crosses the edge join exactly once over the "
    "run (operators/graph.py:bfs_path_counts); equal-level and backward "
    "edges die in the settled anti-join, matching the Brandes BFS DAG. "
    "Oracle: unrolled frontier levels + settled sets, all MATERIALIZED.",
    headline=True,
    tags=("graph", "iterative"),
)
def graph_path_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.graph import bfs_path_counts

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    e0 = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    from clinical_api_etl_spark.operators.graph import symmetrize

    edges = symmetrize(e0)
    sources = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") < 8)
        .select(F.concat(F.lit("s"), F.col("s_suppkey").cast("string")).alias("node"))
    )
    st = bfs_path_counts(edges, sources, iters=_SPC_ITERS)
    return st.select(
        F.col("s").alias("source_node"), "node", "dist", "sigma"
    )


# ---------------------------------------------------------------------------
# Brandes dependency accumulation — k-bounded betweenness (backward pass).
# ---------------------------------------------------------------------------


def _betweenness_oracle(
    lvl0_sql: str | None = None, final_sql: str | None = None
) -> str:
    """Forward unrolled frontier levels (as in _path_counts_oracle), then
    the backward dependency CTEs d{k}: each node's delta folds its
    successors' (sigma_v/sigma_w)(1+delta_w) in successor-id order —
    the pinned-order float fold, applied level by level downward.

    ``lvl0_sql`` overrides the seed-source CTE body (default: the fixed
    8-supplier probe set); ``final_sql`` overrides the final SELECT over
    the per-source union ``u`` (default: emit the per-source state) —
    the sampled twin aggregates ``u`` instead."""
    fwd_step = """
    lvl{k} AS MATERIALIZED (
      SELECT c.s, c.node, CAST({k} AS BIGINT) AS dist, c.sigma FROM (
        SELECT r.s, e.dst AS node, CAST(SUM(r.sigma) AS BIGINT) AS sigma
        FROM edges e JOIN lvl{p} r ON e.src = r.node
        GROUP BY r.s, e.dst
      ) c LEFT JOIN set{p} st ON st.s = c.s AND st.node = c.node
      WHERE st.node IS NULL
    ),
    set{k} AS MATERIALIZED (
      SELECT s, node FROM set{p} UNION ALL SELECT s, node FROM lvl{k}
    )"""
    fwd = ",".join(fwd_step.format(k=k, p=k - 1) for k in range(1, _SPC_ITERS + 1))
    bwd_step = """
    f{k} AS MATERIALIZED (
      SELECT v.s, v.node,
             list_reduce(
               list_prepend(CAST(0 AS DOUBLE),
                 list((CAST(v.sigma AS DOUBLE) / CAST(w.sigma AS DOUBLE))
                      * (1e0 + w.delta) ORDER BY w.node)),
               (x, y) -> x + y) AS delta
      FROM lvl{k} v JOIN edges e ON e.src = v.node
      JOIN (SELECT l.s, l.node, l.sigma, dd.delta
            FROM lvl{n} l JOIN d{n} dd ON l.s = dd.s AND l.node = dd.node) w
        ON w.s = v.s AND w.node = e.dst
      GROUP BY v.s, v.node, v.sigma
    ),
    d{k} AS MATERIALIZED (
      SELECT l.s, l.node, COALESCE(f.delta, CAST(0 AS DOUBLE)) AS delta
      FROM lvl{k} l LEFT JOIN f{k} f ON f.s = l.s AND f.node = l.node
    )"""
    bwd = ",".join(
        bwd_step.format(k=k, n=k + 1) for k in range(_SPC_ITERS - 1, -1, -1)
    )
    finals = " UNION ALL ".join(
        f"SELECT l.s, l.node, l.dist, l.sigma, d.delta FROM lvl{k} l "
        f"JOIN d{k} d ON d.s = l.s AND d.node = l.node"
        for k in range(_SPC_ITERS + 1)
    )
    if lvl0_sql is None:
        lvl0_sql = """
      SELECT 's' || CAST(s_suppkey AS VARCHAR) AS s,
             's' || CAST(s_suppkey AS VARCHAR) AS node,
             CAST(0 AS BIGINT) AS dist, CAST(1 AS BIGINT) AS sigma
      FROM supplier WHERE s_suppkey < 8"""
    if final_sql is None:
        final_sql = (
            "SELECT s AS source_node, node, dist, sigma, delta FROM ({u}) u"
        )
    return f"""
    WITH e0 AS MATERIALIZED (
      SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                      's' || CAST(l_suppkey AS VARCHAR) AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    edges AS MATERIALIZED (
      SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0
    ),
    lvl0 AS MATERIALIZED (
      {lvl0_sql}
    ),
    set0 AS MATERIALIZED (SELECT s, node FROM lvl0),
    {fwd},
    d{_SPC_ITERS} AS MATERIALIZED (
      SELECT s, node, CAST(0 AS DOUBLE) AS delta FROM lvl{_SPC_ITERS}
    ),
    {bwd}
    {final_sql.format(u=finals)}
    """


@QS.add(
    "graph_betweenness_probe",
    _betweenness_oracle(),
    doc="[EXT] Brandes dependency accumulation — the BACKWARD half of "
    "betweenness centrality, completing graph_path_counts' forward "
    "pass: delta(v) = sum over one-level-deeper successors of "
    "(sigma_v/sigma_w)(1+delta_w), run level-by-level from the horizon "
    f"down (k-bounded betweenness, horizon {_SPC_ITERS}: longer paths "
    "do not contribute — the standard truncation for probe-set "
    "centrality). 13th hash-gated iterative, and the first with FLOAT "
    "state: sigma ratios are single divisions over exact BIGINTs and "
    "every successor sum is a pinned-order fold (successor-id-sorted), "
    "so deltas are bit-identical level after level. Operator: "
    "operators/graph.py:brandes_dependencies (per-level equi-join + "
    "grouped fold, eager-checkpointed). Oracle: forward frontier CTEs + "
    "unrolled backward d{k} chain, all MATERIALIZED.",
    headline=True,
    tags=("graph", "iterative"),
)
def graph_betweenness_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.graph import brandes_dependencies

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    e0 = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    from clinical_api_etl_spark.operators.graph import symmetrize

    edges = symmetrize(e0)
    sources = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") < 8)
        .select(F.concat(F.lit("s"), F.col("s_suppkey").cast("string")).alias("node"))
    )
    dep = brandes_dependencies(edges, sources, iters=_SPC_ITERS)
    return dep.select(
        F.col("s").alias("source_node"), "node", "dist", "sigma", "delta"
    )


_BTW_SAMPLE_K = 4

_BTW_SAMPLED_LVL0 = f"""
      SELECT node AS s, node, CAST(0 AS BIGINT) AS dist,
             CAST(1 AS BIGINT) AS sigma
      FROM (
        SELECT 's' || CAST(s_suppkey AS VARCHAR) AS node FROM supplier
        ORDER BY md5('s' || CAST(s_suppkey AS VARCHAR)), node
        LIMIT {_BTW_SAMPLE_K}
      )"""

_BTW_SAMPLED_FINAL = """
    SELECT node, CAST(COUNT(*) AS BIGINT) AS n_src,
           list_reduce(list_prepend(CAST(0 AS DOUBLE),
                                    list(delta ORDER BY s)),
                       (x, y) -> x + y) AS btw
    FROM ({u}) u WHERE node <> s GROUP BY node"""


@QS.add(
    "graph_betweenness_sampled",
    _betweenness_oracle(_BTW_SAMPLED_LVL0, _BTW_SAMPLED_FINAL),
    doc="[EXT] SAMPLED Brandes betweenness (Brandes/Pich 2007 — the "
    "100x-scale posture for centrality, VERDICT r10 task 6): sources "
    f"are the {_BTW_SAMPLE_K} md5-lowest supplier nodes (the repo's "
    "deterministic-sample convention — at a 1000-executor scale the "
    "sample size is a knob, never the graph), each source's "
    "contribution is the EXACT per-source Brandes computation (same "
    "forward sigma + backward delta machinery as "
    "graph_betweenness_probe), and the per-node estimate folds the "
    "sampled deltas in pinned source order — bit-identical "
    "cross-engine, so the estimator itself is hash-gated end to end "
    "(n_src = sampled sources reaching the node, node <> source). "
    "The exact 8-source probe stays as-is; this twin is the one that "
    "survives 100x (cost scales with the SAMPLE, not the node count).",
    headline=True,
    tags=("graph", "iterative"),
)
def graph_betweenness_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.graph import (
        brandes_dependencies,
        symmetrize,
    )

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    e0 = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    edges = symmetrize(e0)
    sources = (
        load(spark, sf_dir, "supplier")
        .select(
            F.concat(F.lit("s"), F.col("s_suppkey").cast("string")).alias("node")
        )
        .orderBy(F.md5(F.col("node")), F.col("node"))
        .limit(_BTW_SAMPLE_K)
    )
    # parts=8: the 4-source probe state is tens of thousands of rows —
    # full-parallelism stages are pure scheduler overhead at that size
    dep = brandes_dependencies(edges, sources, iters=_SPC_ITERS, parts=8)
    return (
        dep.filter(F.col("node") != F.col("s"))
        .groupBy("node")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_src"),
            F.aggregate(
                F.sort_array(
                    F.collect_list(F.struct(F.col("s"), F.col("delta")))
                ),
                F.lit(0.0),
                lambda acc, x: acc + x["delta"],
            ).alias("btw"),
        )
    )


# ---------------------------------------------------------------------------
# Bounded-hop weighted shortest paths (Bellman-Ford) — exact BIGINT costs.
# ---------------------------------------------------------------------------

_BF_ITERS = 4


def _bf_oracle() -> str:
    """Full-relaxation unrolled Bellman-Ford: it{k} = min total weight
    over paths of <= k edges — the same fixpoint the queue-optimized
    operator reaches after k rounds (every improvement propagates the
    following round). Every it{k} referenced twice -> MATERIALIZED."""
    it = """
    it{k} AS MATERIALIZED (
      SELECT s, node, CAST(MIN(dist) AS BIGINT) AS dist FROM (
        SELECT s, node, dist FROM it{p}
        UNION ALL
        SELECT r.s, e.dst AS node, r.dist + e.w AS dist
        FROM edges e JOIN it{p} r ON e.src = r.node
      ) u GROUP BY s, node
    )"""
    its = ",".join(it.format(k=k, p=k - 1) for k in range(1, _BF_ITERS + 1))
    return f"""
    WITH w0 AS MATERIALIZED (
      SELECT 'c' || CAST(o_custkey AS VARCHAR) AS src,
             's' || CAST(l_suppkey AS VARCHAR) AS dst,
             CAST(COUNT(*) AS BIGINT) AS w
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_custkey, l_suppkey
    ),
    edges AS MATERIALIZED (
      SELECT src, dst, w FROM w0 UNION ALL SELECT dst AS src, src AS dst, w FROM w0
    ),
    it0 AS MATERIALIZED (
      SELECT 's' || CAST(s_suppkey AS VARCHAR) AS s,
             's' || CAST(s_suppkey AS VARCHAR) AS node, CAST(0 AS BIGINT) AS dist
      FROM supplier WHERE s_suppkey < 8
    ),
    {its}
    SELECT s AS source_node, node, dist AS cost FROM it{_BF_ITERS}
    """


@QS.add(
    "graph_weighted_shortest_paths",
    _bf_oracle(),
    doc="[EXT] bounded-hop WEIGHTED shortest paths (Bellman-Ford, "
    f"{_BF_ITERS} relaxation rounds) from the 8-supplier probe set: "
    "edge weight = lineitem count per (customer, supplier) pair "
    "(symmetrized), costs exact BIGINT sums — 14th hash-gated "
    "iterative. The operator is queue-optimized (SPFA): only nodes "
    "whose distance improved re-enter the edge join, which preserves "
    "the <=k-edge minimum invariant because every improvement "
    "propagates the next round; the oracle runs the plain full "
    "relaxation and meets the same fixpoint — the test of the "
    "equivalence claim IS the hash gate. operators/graph.py:"
    "bellman_ford_bounded.",
    headline=True,
    tags=("graph", "iterative"),
)
def graph_weighted_shortest_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.graph import bellman_ford_bounded

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    w0 = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_custkey", "l_suppkey")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
            "w",
        )
    )
    edges = w0.union(
        w0.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    )
    sources = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") < 8)
        .select(F.concat(F.lit("s"), F.col("s_suppkey").cast("string")).alias("node"))
    )
    st = bellman_ford_bounded(edges, sources, iters=_BF_ITERS)
    return st.select(
        F.col("s").alias("source_node"), "node", F.col("dist").alias("cost")
    )


@QS.add(
    "ml_conformal_interval",
    """
    WITH e AS (
      SELECT event_type, event_id,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
             substr(md5(CAST(event_id AS VARCHAR)), 1, 1) AS h
      FROM events WHERE value IS NOT NULL
    ),
    tr AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_train,
                  CAST(SUM(cents) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                    AS mu
           FROM e WHERE h <= '7' GROUP BY event_type),
    ca AS (
      SELECT e.event_type, e.event_id,
             ABS(CAST(e.cents AS DOUBLE) - tr.mu) AS resid
      FROM e JOIN tr USING (event_type)
      WHERE e.h >= '8' AND e.h <= 'b'
    ),
    car AS (
      SELECT event_type, resid,
             ROW_NUMBER() OVER (PARTITION BY event_type
               ORDER BY resid, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n_calib
      FROM ca
    ),
    q AS (
      SELECT event_type, CAST(MAX(n_calib) AS BIGINT) AS n_calib,
             MAX(CASE WHEN rn = LEAST(
                   (9 * (n_calib + 1) + 9) // 10, n_calib)
                 THEN resid END) AS q_hat
      FROM car GROUP BY event_type
    ),
    te AS (
      SELECT e.event_type,
             CAST(COUNT(*) AS BIGINT) AS n_test,
             CAST(SUM(CASE WHEN ABS(CAST(e.cents AS DOUBLE) - tr.mu)
                                <= q.q_hat THEN 1 ELSE 0 END) AS BIGINT)
               AS n_covered
      FROM e JOIN tr USING (event_type) JOIN q USING (event_type)
      WHERE e.h >= 'c' GROUP BY e.event_type
    )
    SELECT tr.event_type, tr.n_train, tr.mu, q.n_calib, q.q_hat,
           te.n_test, te.n_covered,
           CAST(te.n_covered AS DOUBLE) / CAST(te.n_test AS DOUBLE)
             AS coverage
    FROM tr JOIN q USING (event_type) JOIN te USING (event_type)
    """,
    doc="[EXT] split conformal prediction intervals (Vovk; Lei et al. "
    "2018) — the distribution-free uncertainty wrapper every deployed "
    "regressor needs: md5-deterministic 3-way split (train/calibrate/"
    "test on the event_id hash — the engine's RNG-free convention), "
    "per-type mean predictor fit on train, q_hat = the "
    "ceil(0.9(n+1))-th order statistic of calibration |residuals| "
    "(rank arithmetic in exact integers, (event_id)-tie-broken "
    "selection of a bit-identical double), and held-out COVERAGE of "
    "the interval mu ± q_hat — the finite-sample >=90% guarantee made "
    "measurable. Residuals are single IEEE subtract/abs over exact "
    "cents and the bit-identical mu; coverage is one division — every "
    "column hash-gates. One scan + per-type windows over the "
    "calibration slice.",
    tags=("ml", "stats"),
)
def ml_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    e = ev.select(
        "event_type",
        "event_id",
        F.expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").alias(
            "cents"
        ),
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 1).alias("h"),
    ).persist()
    tr = (
        e.filter(F.col("h") <= "7")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_train"),
            (
                F.sum("cents").cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("mu"),
        )
    )
    ca = (
        e.filter((F.col("h") >= "8") & (F.col("h") <= "b"))
        .join(F.broadcast(tr), "event_type")
        .select(
            "event_type",
            "event_id",
            F.abs(F.col("cents").cast("double") - F.col("mu")).alias("resid"),
        )
    )
    wr = W.partitionBy("event_type").orderBy("resid", "event_id")
    wn = W.partitionBy("event_type")
    car = ca.select(
        "event_type",
        "resid",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n_calib"),
    )
    q = car.groupBy("event_type").agg(
        F.max("n_calib").cast("long").alias("n_calib"),
        F.max(
            F.when(
                F.col("rn")
                == F.least(
                    F.expr("(9 * (n_calib + 1) + 9) div 10"), F.col("n_calib")
                ),
                F.col("resid"),
            )
        ).alias("q_hat"),
    )
    te = (
        e.filter(F.col("h") >= "c")
        .join(F.broadcast(tr), "event_type")
        .join(F.broadcast(q), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.sum(
                F.when(
                    F.abs(F.col("cents").cast("double") - F.col("mu"))
                    <= F.col("q_hat"),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_covered"),
        )
    )
    return (
        tr.join(q, "event_type")
        .join(te, "event_type")
        .select(
            "event_type",
            "n_train",
            "mu",
            "n_calib",
            "q_hat",
            "n_test",
            "n_covered",
            (
                F.col("n_covered").cast("double")
                / F.col("n_test").cast("double")
            ).alias("coverage"),
        )
    )


# ---------------------------------------------------------------------------
# Time-respecting reachability over the timestamped contact network.
# ---------------------------------------------------------------------------

_TR_ITERS = 4


def _temporal_oracle() -> str:
    """Unrolled full-relaxation twin of
    operators/graph.py:temporal_earliest_arrival — each round admits an
    edge only when its contact day is >= the current arrival at its
    source. Every it{k} referenced twice -> MATERIALIZED."""
    it = """
    it{k} AS MATERIALIZED (
      SELECT s, node, CAST(MIN(arr) AS BIGINT) AS arr FROM (
        SELECT s, node, arr FROM it{p}
        UNION ALL
        SELECT r.s, e.dst AS node, e.t AS arr
        FROM edges e JOIN it{p} r ON e.src = r.node AND e.t >= r.arr
      ) u GROUP BY s, node
    )"""
    its = ",".join(it.format(k=k, p=k - 1) for k in range(1, _TR_ITERS + 1))
    return f"""
    WITH c0 AS MATERIALIZED (
      SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
             's' || CAST(l_suppkey AS VARCHAR) AS dst,
             CAST(epoch_ms(o_orderdate) // 86400000 AS BIGINT) AS t
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    edges AS MATERIALIZED (
      SELECT src, dst, t FROM c0 UNION ALL SELECT dst AS src, src AS dst, t FROM c0
    ),
    it0 AS MATERIALIZED (
      SELECT 's' || CAST(s_suppkey AS VARCHAR) AS s,
             's' || CAST(s_suppkey AS VARCHAR) AS node, CAST(0 AS BIGINT) AS arr
      FROM supplier WHERE s_suppkey < 8
    ),
    {its}
    SELECT s AS source_node, node, arr AS earliest_day FROM it{_TR_ITERS}
    """


@QS.add(
    "graph_temporal_reachability",
    _temporal_oracle(),
    doc="[EXT] TIME-RESPECTING reachability (temporal-graph earliest "
    "arrival) from the 8-supplier probe set over the timestamped "
    "contact network (each customer-supplier order is a contact on its "
    "order day, symmetrized): a path is valid only if contact days "
    "never decrease along it — the contagion / information-flow "
    "semantics static reachability OVERSTATES (it routes through "
    "contacts that happened before the node was reached). "
    f"{_TR_ITERS} relaxation rounds; arrivals exact BIGINT epoch days, "
    "so the 22nd hash-gated iterative. Operator is improved-frontier "
    "(an earlier arrival at u can unlock earlier paths THROUGH u, so "
    "improved rows re-enter the join and state rows are replaced — "
    "the SPFA discipline); the oracle runs plain full relaxation and "
    "meets the same fixpoint: the hash gate IS the equivalence proof, "
    "as with Bellman-Ford. operators/graph.py:temporal_earliest_arrival.",
    headline=True,
    tags=("graph", "iterative", "temporal"),
)
def graph_temporal_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.graph import temporal_earliest_arrival

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    c0 = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
            F.expr("unix_millis(o_orderdate) div 86400000").alias("t"),
        )
        .distinct()
    )
    edges = c0.union(
        c0.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "t")
    )
    sources = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") < 8)
        .select(F.concat(F.lit("s"), F.col("s_suppkey").cast("string")).alias("node"))
    )
    st = temporal_earliest_arrival(edges, sources, iters=_TR_ITERS)
    return st.select(
        F.col("s").alias("source_node"), "node", F.col("arr").alias("earliest_day")
    )


# ---------------------------------------------------------------------------
