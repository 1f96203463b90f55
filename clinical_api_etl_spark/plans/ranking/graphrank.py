"""Graph-ranking family (split from the former plans/ranking.py):
link prediction, clustering coefficients, LPA/modularity, TextRank,
Katz/eigenvector centrality, assortativity, component sizes."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clinical_api_etl_spark.functions.text import tokens
from clinical_api_etl_spark.plans.base import QuerySet
from clinical_api_etl_spark.sources.catalog import load

from ._shared import _N_QUERY_DOCS, _TOKS, _TOP_K, _tf

QS = QuerySet()


# ---------------------------------------------------------------------------
# Link prediction: common neighbors + Jaccard over the co-purchase graph.
# ---------------------------------------------------------------------------

_LP_SUPPORT = 2  # same edge definition as graph_triangle_count
_LP_TOP = 20

_LP_EDGES_SQL = f"""
e0 AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
  HAVING COUNT(*) >= {_LP_SUPPORT}
),
sym AS (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0),
deg AS (SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS d FROM sym GROUP BY u)
"""


@QS.add(
    "graph_linkpred_topk",
    f"""
    WITH {_LP_EDGES_SQL},
    cn AS (
      SELECT s1.v AS a, s2.v AS b, CAST(COUNT(*) AS BIGINT) AS cn
      FROM sym s1 JOIN sym s2 ON s1.u = s2.u AND s1.v < s2.v
      GROUP BY s1.v, s2.v
    ),
    cand AS (
      SELECT cn.a AS u, cn.b AS v, cn.cn,
             da.d AS deg_u, db.d AS deg_v,
             CAST(da.d + db.d - cn.cn AS BIGINT) AS union_size
      FROM cn
      JOIN deg da ON da.node = cn.a
      JOIN deg db ON db.node = cn.b
      WHERE NOT EXISTS (
        SELECT 1 FROM e0 WHERE e0.u = cn.a AND e0.v = cn.b
      )
    )
    SELECT u, v, cn, deg_u, deg_v, union_size,
           CAST(cn AS DOUBLE) / CAST(union_size AS DOUBLE) AS jaccard
    FROM cand
    ORDER BY cn DESC, u, v
    LIMIT {_LP_TOP}
    """,
    doc="[EXT] link prediction over the part co-purchase graph (edge = "
    "co-ordered in >= 2 distinct orders, the graph_triangle_count "
    "definition): top-20 NON-adjacent pairs by common-neighbor count, "
    "with neighborhood-Jaccard as the normalized score — the classic "
    "candidate-generation features for a 'users also bought' recommender. "
    "Wedges come from ONE self-equi-join of the symmetric adjacency on "
    "the shared center (cost = sum of deg^2, bounded by the support "
    "threshold; at 100 TB cap per-node neighbor lists — top-k by edge "
    "weight — before the wedge join, the standard degree-cap mitigation); "
    "adjacent pairs are removed by an anti-join against the edge list; "
    "degree lookups broadcast. |N(u) u N(v)| = d(u)+d(v)-cn exactly "
    "because (u,v) is non-adjacent. Total order (cn DESC, u, v) makes "
    "the LIMIT deterministic; jaccard is the one IEEE division.",
    headline=True,
    tags=("graph",),
)
def graph_linkpred_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    e0 = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .agg(F.count(F.lit(1)).alias("m"))
        .filter(F.col("m") >= _LP_SUPPORT)
        .select("u", "v")
        .coalesce(8)
        .persist()
    )
    sym = e0.unionByName(e0.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = sym.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    s1 = sym.select(F.col("u").alias("w"), F.col("v").alias("a"))
    s2 = sym.select(F.col("u").alias("w"), F.col("v").alias("b"))
    cn = (
        s1.join(s2, "w")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("cn"))
    )
    # non-adjacent only: anti-join against the (u < v)-oriented edge list.
    cand = cn.join(
        e0,
        (F.col("a") == F.col("u")) & (F.col("b") == F.col("v")),
        "left_anti",
    )
    da = deg.select(F.col("node").alias("a"), F.col("d").alias("deg_u"))
    db = deg.select(F.col("node").alias("b"), F.col("d").alias("deg_v"))
    scored = (
        cand.join(F.broadcast(da), "a")
        .join(F.broadcast(db), "b")
        .select(
            F.col("a").alias("u"),
            F.col("b").alias("v"),
            "cn",
            "deg_u",
            "deg_v",
            (F.col("deg_u") + F.col("deg_v") - F.col("cn"))
            .cast("long")
            .alias("union_size"),
        )
        .withColumn(
            "jaccard",
            F.col("cn").cast("double") / F.col("union_size").cast("double"),
        )
    )
    return scored.orderBy(F.desc("cn"), F.asc("u"), F.asc("v")).limit(_LP_TOP)


# ---------------------------------------------------------------------------
# Local clustering coefficients (per-node triangle density).
# ---------------------------------------------------------------------------


@QS.add(
    "graph_clustering_coeff",
    f"""
    WITH {_LP_EDGES_SQL},
    o AS (
      SELECT CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.u ELSE e.v END AS x,
             CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.v ELSE e.u END AS y,
             CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN dv.d ELSE du.d END AS ydeg
      FROM e0 e
      JOIN deg du ON du.node = e.u
      JOIN deg dv ON dv.node = e.v
    ),
    tri AS (
      SELECT e1.x AS n1, e1.y AS n2, e2.y AS n3
      FROM o e1
      JOIN o e2 ON e1.x = e2.x AND (e1.ydeg, e1.y) < (e2.ydeg, e2.y)
      JOIN o e3 ON e3.x = e1.y AND e3.y = e2.y
    ),
    pernode AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS n_tri FROM (
        SELECT n1 AS node FROM tri
        UNION ALL SELECT n2 FROM tri
        UNION ALL SELECT n3 FROM tri
      ) GROUP BY node
    )
    SELECT deg.node, deg.d AS degree,
           COALESCE(pernode.n_tri, CAST(0 AS BIGINT)) AS n_tri,
           CAST(2 * COALESCE(pernode.n_tri, 0) AS DOUBLE)
             / CAST(deg.d * (deg.d - 1) AS DOUBLE) AS coeff
    FROM deg LEFT JOIN pernode ON deg.node = pernode.node
    WHERE deg.d >= 2
    """,
    doc="[EXT] per-node local clustering coefficient over the co-purchase "
    "graph: 2*tri(v) / (d(v)*(d(v)-1)) for every node of degree >= 2 — "
    "the how-clique-ish-is-this-neighborhood feature that separates "
    "bridge hubs from community cores. Triangles are enumerated ONCE via "
    "the same degree-oriented wedge join as graph_triangle_count "
    "(Schank-Wagner: wedge fan-out bounded by degeneracy, not max "
    "degree), then each triangle credits its three vertices through one "
    "union+aggregate. Exact BIGINT counts; coeff is the one IEEE "
    "division. Hash-matched against DuckDB's identical twin.",
    tags=("graph",),
)
def graph_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    e0 = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .agg(F.count(F.lit(1)).alias("m"))
        .filter(F.col("m") >= _LP_SUPPORT)
        .select("u", "v")
        .coalesce(8)
        .persist()
    )
    sym = e0.unionByName(e0.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = sym.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    keyed = e0.join(F.broadcast(du), "u").join(F.broadcast(dv), "v")
    u_first = F.struct(F.col("du"), F.col("u")) < F.struct(F.col("dv"), F.col("v"))
    o = keyed.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("x"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("y"),
        F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("ydeg"),
    ).persist()
    e1, e2, e3 = o.alias("e1"), o.alias("e2"), o.alias("e3")
    tri = (
        e1.join(
            e2,
            (F.col("e1.x") == F.col("e2.x"))
            & (
                F.struct(F.col("e1.ydeg"), F.col("e1.y"))
                < F.struct(F.col("e2.ydeg"), F.col("e2.y"))
            ),
        )
        .join(
            e3,
            (F.col("e1.y") == F.col("e3.x")) & (F.col("e2.y") == F.col("e3.y")),
        )
        .select(
            F.col("e1.x").alias("n1"),
            F.col("e1.y").alias("n2"),
            F.col("e2.y").alias("n3"),
        )
    )
    pernode = (
        tri.select(F.col("n1").alias("node"))
        .unionByName(tri.select(F.col("n2").alias("node")))
        .unionByName(tri.select(F.col("n3").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_tri"))
    )
    return (
        deg.filter(F.col("d") >= 2)
        .join(pernode, "node", "left")
        .select(
            "node",
            F.col("d").alias("degree"),
            F.coalesce("n_tri", F.lit(0)).cast("long").alias("n_tri"),
            (
                (F.lit(2) * F.coalesce("n_tri", F.lit(0))).cast("double")
                / (F.col("d") * (F.col("d") - F.lit(1))).cast("double")
            ).alias("coeff"),
        )
    )


# ---------------------------------------------------------------------------
# Label propagation communities (synchronous, deterministic, unrolled).
# ---------------------------------------------------------------------------

_LPA_ROUNDS = 3


def _lpa_ctes(rounds: int) -> list[str]:
    """Unrolled DuckDB twin: every round's label table MATERIALIZED (the
    k-core finding — DuckDB re-inlines multiply-referenced CTEs and the
    chain re-expands exponentially otherwise)."""
    ctes = [
        f"""e0 AS MATERIALIZED (
          SELECT a.l_partkey AS u, b.l_partkey AS v
          FROM lineitem a JOIN lineitem b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY a.l_partkey, b.l_partkey
          HAVING COUNT(*) >= {_LP_SUPPORT}
        )""",
        "sym AS MATERIALIZED (SELECT u, v FROM e0"
        " UNION ALL SELECT v AS u, u AS v FROM e0)",
        "l0 AS MATERIALIZED (SELECT DISTINCT u AS node, u AS lbl FROM sym)",
    ]
    for i in range(1, rounds + 1):
        ctes.append(
            f"""l{i} AS MATERIALIZED (
              SELECT node, CAST(lbl AS BIGINT) AS lbl FROM (
                SELECT s.u AS node, p.lbl,
                       ROW_NUMBER() OVER (
                         PARTITION BY s.u
                         ORDER BY COUNT(*) DESC, p.lbl) AS rk
                FROM sym s JOIN l{i - 1} p ON s.v = p.node
                GROUP BY s.u, p.lbl
              ) WHERE rk = 1
            )"""
        )
    return ctes


def _lpa_oracle(rounds: int) -> str:
    return (
        "WITH "
        + ",\n".join(_lpa_ctes(rounds))
        + f"\nSELECT node, lbl AS community FROM l{rounds}"
    )


@QS.add(
    "graph_lpa_communities",
    _lpa_oracle(_LPA_ROUNDS),
    doc="[EXT] community detection by synchronous label propagation over "
    "the co-purchase graph (Raghavan'07, the near-linear-time community "
    "baseline) — FIFTH iterative algorithm under a full cross-engine "
    "value hash (cc, pagerank, k-core, BPE). Classic LPA breaks "
    "frequency ties randomly and never converges deterministically; "
    "here the argmax is pinned to (count DESC, label ASC) and rounds "
    "are fixed at 3, so both engines replay the identical trajectory. "
    "Per round: one edges-to-labels equi-join + one grouped argmax "
    "(map-side combinable counts, rank window over the per-node label "
    "histogram — never the raw wedges). Labels start as node ids; "
    "min-ids win ties, so dense cores collapse onto their smallest "
    "member. Oracle = unrolled MATERIALIZED round chain.",
    tags=("graph", "iterative"),
    headline=True,
)
def graph_lpa_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    _e0, labels = _lpa_run(spark, sf_dir)
    return labels.select("node", F.col("lbl").alias("community"))


def _lp_graph(spark: SparkSession, sf_dir: str):
    """Co-purchase graph shared by LPA / modularity / Katz: returns
    (e0 distinct undirected edges u<v, sym both-direction view); both
    persisted."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    e0 = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .agg(F.count(F.lit(1)).alias("m"))
        .filter(F.col("m") >= _LP_SUPPORT)
        .select("u", "v")
        .coalesce(8)
        .persist()
    )
    sym = e0.unionByName(
        e0.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).persist()
    return e0, sym


def _lpa_run(spark: SparkSession, sf_dir: str):
    """Shared LPA trajectory: returns (e0 distinct undirected edges u<v,
    final labels (node, lbl)); both persisted-safe for reuse."""
    e0, sym = _lp_graph(spark, sf_dir)
    labels = sym.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").cast("long").alias("lbl")
    )
    for _ in range(_LPA_ROUNDS):
        hist = (
            sym.join(
                labels.select(F.col("node").alias("v"), F.col("lbl")), "v"
            )
            .groupBy(F.col("u").alias("node"), "lbl")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        # deterministic argmax: (count DESC, label ASC)
        labels = (
            hist.groupBy("node")
            .agg(
                F.min(
                    F.struct((-F.col("c")).alias("nc"), F.col("lbl"))
                ).alias("top")
            )
            .select("node", F.col("top.lbl").cast("long").alias("lbl"))
        )
    return e0, labels


@QS.add(
    "graph_modularity_lpa",
    "WITH "
    + ",\n".join(_lpa_ctes(_LPA_ROUNDS))
    + f""",
    comm AS MATERIALIZED (SELECT node, lbl AS community FROM l{_LPA_ROUNDS}),
    mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM e0),
    deg AS MATERIALIZED (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
        SELECT u AS node FROM e0 UNION ALL SELECT v AS node FROM e0)
      GROUP BY node),
    dc AS (SELECT c.community, CAST(SUM(d) AS BIGINT) AS dsum
           FROM deg JOIN comm c USING (node) GROUP BY c.community),
    mc AS (SELECT a.community, CAST(COUNT(*) AS BIGINT) AS intra
           FROM e0 JOIN comm a ON e0.u = a.node
                   JOIN comm b ON e0.v = b.node
           WHERE a.community = b.community GROUP BY a.community),
    terms AS (
      SELECT dc.community,
             CAST(COALESCE(mc.intra, 0) AS BIGINT) AS intra, dc.dsum,
             CAST(COALESCE(mc.intra, 0) AS DOUBLE)
               / CAST((SELECT m FROM mm) AS DOUBLE)
             - (CAST(dc.dsum AS DOUBLE)
                / CAST(2 * (SELECT m FROM mm) AS DOUBLE))
               * (CAST(dc.dsum AS DOUBLE)
                  / CAST(2 * (SELECT m FROM mm) AS DOUBLE)) AS term
      FROM dc LEFT JOIN mc ON dc.community = mc.community)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_communities,
           CAST((SELECT m FROM mm) AS BIGINT) AS m_edges,
           CAST(SUM(intra) AS BIGINT) AS intra_edges,
           list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list(term ORDER BY community)), (x, y) -> x + y) AS modularity
    FROM terms
    """,
    doc="[EXT] Newman-Girvan modularity Q of the LPA partition — the "
    "standard quality score for a community detection run (did the "
    "labels actually find structure, or collapse?): Q = Σ_c [m_c/m − "
    "(D_c/2m)²] over communities c, with m total undirected edges, m_c "
    "intra-community edges, D_c the community degree sum — all exact "
    "BIGINTs from two equi-joins of the edge table against the final "
    "label table. Each community's term is a fixed IEEE tree (two "
    "correctly-rounded divisions, one multiply, one subtract) over those "
    "exact integers, and the global Q sums terms via the pinned-order "
    "fold (community-id order) — bit-identical cross-engine, so the "
    "evaluation metric for the 5th iterative is itself fully "
    "hash-gated. Replays the identical LPA trajectory (shared CTE "
    "chain / shared Spark helper with graph_lpa_communities).",
    tags=("graph", "iterative"),
)
def graph_modularity_lpa(spark: SparkSession, sf_dir: str) -> DataFrame:
    e0, labels = _lpa_run(spark, sf_dir)
    comm = labels.select(
        "node", F.col("lbl").cast("long").alias("community")
    ).persist()
    mm = e0.agg(F.count(F.lit(1)).cast("long").alias("m"))
    deg = (
        e0.select(F.col("u").alias("node"))
        .unionByName(e0.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    dc = (
        deg.join(comm, "node")
        .groupBy("community")
        .agg(F.sum("d").cast("long").alias("dsum"))
    )
    mc = (
        e0.join(comm.select(F.col("node").alias("u"),
                            F.col("community").alias("cu")), "u")
        .join(comm.select(F.col("node").alias("v"),
                          F.col("community").alias("cv")), "v")
        .filter(F.col("cu") == F.col("cv"))
        .groupBy(F.col("cu").alias("community"))
        .agg(F.count(F.lit(1)).cast("long").alias("intra"))
    )
    terms = (
        dc.join(mc, "community", "left")
        .crossJoin(F.broadcast(mm))
        .select(
            "community",
            F.coalesce(F.col("intra"), F.lit(0)).cast("long").alias("intra"),
            "dsum",
            (
                F.coalesce(F.col("intra"), F.lit(0)).cast("double")
                / F.col("m").cast("double")
                - (
                    F.col("dsum").cast("double")
                    / (F.lit(2) * F.col("m")).cast("double")
                )
                * (
                    F.col("dsum").cast("double")
                    / (F.lit(2) * F.col("m")).cast("double")
                )
            ).alias("term"),
            "m",
        )
    )
    return terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_communities"),
        F.max("m").cast("long").alias("m_edges"),
        F.sum("intra").cast("long").alias("intra_edges"),
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("community", "term"))),
            F.lit(0.0),
            lambda acc, x: acc + x["term"],
        ).alias("modularity"),
    )


# ---------------------------------------------------------------------------
# Connected-component size distribution of the co-purchase graph.
# ---------------------------------------------------------------------------


@QS.add(
    "graph_component_size_dist",
    f"""
    WITH RECURSIVE e0 AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
      HAVING COUNT(*) >= {_LP_SUPPORT}
    ),
    edges AS (SELECT u AS a, v AS b FROM e0
              UNION ALL SELECT v, u FROM e0),
    verts AS (SELECT DISTINCT a AS id FROM edges),
    walk(id, label) AS (
      SELECT id, id FROM verts
      UNION
      SELECT e.a, w.label FROM walk w JOIN edges e ON w.id = e.b
      WHERE w.label < e.a
    ),
    comp AS (SELECT id, MIN(label) AS component FROM walk GROUP BY id),
    sizes AS (
      SELECT component, CAST(COUNT(*) AS BIGINT) AS size
      FROM comp GROUP BY component
    )
    SELECT size, CAST(COUNT(*) AS BIGINT) AS n_components
    FROM sizes GROUP BY size
    """,
    doc="[EXT] component-size distribution of the co-purchase graph — the "
    "is-there-a-giant-component diagnostic that decides whether "
    "graph-wide algorithms need partitioning by component (thousands of "
    "small islands) or degree salting (one giant blob). Components via "
    "the scale-adaptive min-label machinery (operators/graph.py); the "
    "oracle cross-checks with a DuckDB recursive-CTE closure — two "
    "independent transitive-closure formulations compressed to a "
    "(size, count) histogram.",
    tags=("graph",),
)
def graph_component_size_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.graph import connected_components

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    e0 = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .agg(F.count(F.lit(1)).alias("m"))
        .filter(F.col("m") >= _LP_SUPPORT)
        .select(F.col("u").alias("id_a"), F.col("v").alias("id_b"))
    )
    comp = connected_components(e0)
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("size")
    )
    return sizes.groupBy("size").agg(
        F.count(F.lit(1)).cast("long").alias("n_components")
    )


# ---------------------------------------------------------------------------
# Round-5: TextRank keyword extraction (integer PageRank over the word
# co-occurrence graph).
# ---------------------------------------------------------------------------

_TR_ITERS = 3
_TR_MINLEN = 4
_TR_TOPK = 20


def _textrank_oracle() -> str:
    """DuckDB twin: same filtered-adjacency edge derivation, then the
    unrolled integer-PageRank chain (cf. _pagerank_oracle in mlprep)."""
    it = """
    it{k} AS MATERIALIZED (
      SELECT e.dst AS node,
             CAST(150000000000 // n.n + (85 * SUM(r.r // e.deg)) // 100
                  AS BIGINT) AS r
      FROM edeg e JOIN it{p} r ON e.src = r.node, n
      GROUP BY e.dst, n.n
    )"""
    its = ",".join(it.format(k=k, p=k - 1) for k in range(1, _TR_ITERS + 1))
    return f"""
    WITH tok AS (
      SELECT doc_id,
             list_filter({_TOKS}, x -> length(x) >= {_TR_MINLEN}) AS t
      FROM documents
    ),
    pairs AS MATERIALIZED (
      SELECT DISTINCT u.a, u.b FROM (
        SELECT unnest(list_transform(
                 range(1, greatest(len(t), 1)),
                 i -> {{'a': t[i], 'b': t[i + 1]}})) AS u
        FROM tok
      ) WHERE u.a <> u.b
    ),
    edges AS MATERIALIZED (
      SELECT a AS src, b AS dst FROM pairs
      UNION ALL SELECT b AS src, a AS dst FROM pairs
    ),
    deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY src),
    edeg AS MATERIALIZED (
      SELECT e.src, e.dst, d.deg FROM edges e JOIN deg d USING (src)
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
    it0 AS MATERIALIZED (
      SELECT node, CAST(1000000000000 // n.n AS BIGINT) AS r FROM nodes, n
    ),
    {its},
    ranked AS (
      SELECT node AS word, r AS rank_units,
             row_number() OVER (ORDER BY r DESC, node ASC) AS rk
      FROM it{_TR_ITERS}
    )
    SELECT CAST(rk AS BIGINT) AS rk, word, rank_units
    FROM ranked WHERE rk <= {_TR_TOPK}
    """


@QS.add(
    "text_textrank_keywords",
    _textrank_oracle(),
    doc="[EXT] TextRank keyword extraction (Mihalcea & Tarau 2004): build "
    f"the corpus word co-occurrence graph (adjacent tokens of length >= "
    f"{_TR_MINLEN} after filtering, distinct directed pairs symmetrized), "
    f"run {_TR_ITERS} iterations of exact-integer PageRank "
    "(operators/graph.py:pagerank_int), return the top-"
    f"{_TR_TOPK} keywords by (rank, word) — deterministic, fully "
    "value-hash-gated. Graph size scales with VOCABULARY (distinct "
    "adjacent-pair count), not corpus size: the edge derivation is one "
    "explode + distinct, and the rank loop never touches documents "
    "again — the 100 TB shape for corpus-level keyword extraction.",
    tags=("text", "graph", "iterative"),
    headline=True,
)
def text_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.graph import pagerank_int

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        F.filter(tokens(F.col("text")), lambda t: F.length(t) >= _TR_MINLEN).alias(
            "t"
        )
    )
    # Guard size(t) >= 2 BEFORE building the pair index sequence: Spark's
    # sequence(1, 0) defaults step to -1 and yields DESCENDING [1, 0], so a
    # doc with <2 filtered tokens would index t[-1]/t[size] and throw
    # INVALID_ARRAY_INDEX under ANSI mode (the DuckDB oracle's range() is
    # empty for the same doc). Filtered docs contribute no pairs — identical
    # semantics to the oracle.
    pairs = (
        toks.filter(F.size("t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1),"
                    " i -> struct(t[i - 1] AS a, t[i] AS b))"
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    edges = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst")).union(
        pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    ranks = pagerank_int(edges, iters=_TR_ITERS)
    w = Window.orderBy(F.desc("rank_units"), F.asc("node"))
    # NOTE: deliberate GLOBAL window — input is the top of the RANKED
    # VOCABULARY (post-aggregation, orders smaller than the corpus);
    # 'No Partition Defined' is expected here.
    return (
        ranks.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= _TR_TOPK)
        .select("rk", F.col("node").alias("word"), "rank_units")
    )


# ---------------------------------------------------------------------------
# Resource-allocation link prediction (the log-free Adamic-Adar).
# ---------------------------------------------------------------------------


@QS.add(
    "graph_linkpred_resource_alloc",
    f"""
    WITH {_LP_EDGES_SQL},
    wedges AS (
      SELECT s1.v AS a, s2.v AS b, s1.u AS w
      FROM sym s1 JOIN sym s2 ON s1.u = s2.u AND s1.v < s2.v
    ),
    cand AS (
      SELECT wd.a, wd.b, wd.w, dg.d
      FROM wedges wd JOIN deg dg ON dg.node = wd.w
      WHERE NOT EXISTS (SELECT 1 FROM e0 WHERE e0.u = wd.a AND e0.v = wd.b)
    ),
    scored AS (
      SELECT a AS u, b AS v,
             CAST(COUNT(*) AS BIGINT) AS cn,
             list_reduce(
               list_prepend(CAST(0 AS DOUBLE),
                 list(CAST(1 AS DOUBLE) / CAST(d AS DOUBLE) ORDER BY w)),
               (x, y) -> x + y) AS ra
      FROM cand GROUP BY a, b
    )
    SELECT u, v, cn, ra FROM scored
    ORDER BY ra DESC, u, v LIMIT {_LP_TOP}
    """,
    doc="[EXT] resource-allocation link prediction (Zhou-Lu-Zhang RA "
    "index): RA(u,v) = sum over common neighbors w of 1/deg(w) — the "
    "degree-penalized index that outperforms plain common-neighbor "
    "counting (and the log-free stand-in for Adamic-Adar: JVM log != "
    "libm log, so 1/log(deg) could never hash-gate; 1/deg is each a "
    "single correctly-rounded division and the per-pair sum runs the "
    "PINNED-ORDER fold, center-id-sorted — bit-identical). Same wedge "
    "self-join and non-adjacency anti-join as graph_linkpred_topk; "
    "top-20 under the (ra DESC, u, v) total order is deterministic "
    "because the ra doubles are bit-equal across engines.",
    tags=("graph",),
)
def graph_linkpred_resource_alloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    e0 = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .agg(F.count(F.lit(1)).alias("m"))
        .filter(F.col("m") >= _LP_SUPPORT)
        .select("u", "v")
        .coalesce(8)
        .persist()
    )
    sym = e0.unionByName(e0.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = sym.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    s1 = sym.select(F.col("u").alias("w"), F.col("v").alias("a"))
    s2 = sym.select(F.col("u").alias("w"), F.col("v").alias("b"))
    wedges = s1.join(s2, "w").filter(F.col("a") < F.col("b"))
    cand = wedges.join(
        e0,
        (F.col("a") == F.col("u")) & (F.col("b") == F.col("v")),
        "left_anti",
    ).join(F.broadcast(deg.select(F.col("node").alias("w"), "d")), "w")
    scored = cand.groupBy(F.col("a").alias("u"), F.col("b").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("cn"),
        F.aggregate(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("w"),
                        (F.lit(1.0) / F.col("d").cast("double")).alias("term"),
                    )
                )
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["term"],
        ).alias("ra"),
    )
    # keep e0 cached (matching graph_linkpred_topk): an unpersist at
    # plan-build time would void the cache before any action ran and the
    # expensive self-join would recompute for each downstream reference
    return scored.orderBy(F.desc("ra"), "u", "v").limit(_LP_TOP)


_KATZ_ROUNDS = 3
_KATZ_ALPHA = "0.05e0"


def _katz_oracle() -> str:
    ctes = list(_lpa_ctes(0)[:2])  # e0, sym — the shared co-purchase graph
    ctes.append(
        "k0 AS MATERIALIZED (SELECT DISTINCT u AS node,"
        " CAST(1 AS DOUBLE) AS x FROM sym)"
    )
    for i in range(1, _KATZ_ROUNDS + 1):
        ctes.append(
            f"k{i} AS MATERIALIZED (SELECT n.node,"
            " CAST(1 AS DOUBLE) + COALESCE(f.sm, CAST(0 AS DOUBLE)) AS x"
            f" FROM k0 n LEFT JOIN ("
            " SELECT s.v AS node,"
            " list_reduce(list_prepend(CAST(0 AS DOUBLE),"
            f" list({_KATZ_ALPHA} * p.x ORDER BY s.u)), (a, b) -> a + b) AS sm"
            f" FROM sym s JOIN k{i - 1} p ON s.u = p.node"
            " GROUP BY s.v) f USING (node))"
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT node, x AS katz FROM k{_KATZ_ROUNDS}"
    )


@QS.add(
    "graph_katz_centrality",
    _katz_oracle(),
    doc="[EXT] Katz centrality (Katz 1953) over the co-purchase graph — "
    f"x ← 1 + α·Aᵀx with α={_KATZ_ALPHA[:-2]}, {_KATZ_ROUNDS} synchronous "
    "rounds (the truncated geometric attenuation series; α below the "
    "spectral-radius bound for this support-2 graph). 18th hash-gated "
    "iterative: each neighbor term is ONE multiply of a bit-identical "
    "double by the e0-suffixed α literal, per-node sums run as "
    "pinned-order folds (neighbor-id order), and the +1 offset is exact "
    "— the whole float trajectory matches DuckDB bit-for-bit. Per "
    "round: one edges⋈scores equi-join + one grouped fold; node "
    "universe from the shared `_lp_graph` materialization (single-pass "
    "symmetrize discipline). Linear lineage — deliberately NOT "
    "checkpointed (the pagerank finding: eager checkpoints slow linear "
    "chains).",
    headline=True,
    tags=("graph", "iterative"),
)
def graph_katz_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    _e0, sym = _lp_graph(spark, sf_dir)
    nodes = sym.select(F.col("u").alias("node")).distinct()
    x = nodes.select("node", F.lit(1.0).alias("x"))
    for _ in range(_KATZ_ROUNDS):
        f = (
            sym.join(x.select(F.col("node").alias("u"), "x"), "u")
            .select(
                F.col("v").alias("node"),
                F.struct(F.col("u"), (F.lit(0.05) * F.col("x")).alias("term")).alias(
                    "st"
                ),
            )
            .groupBy("node")
            .agg(
                F.aggregate(
                    F.sort_array(F.collect_list("st")),
                    F.lit(0.0),
                    lambda acc, t: acc + t["term"],
                ).alias("sm")
            )
        )
        x = nodes.join(f, "node", "left").select(
            "node",
            (F.lit(1.0) + F.coalesce(F.col("sm"), F.lit(0.0))).alias("x"),
        )
    return x.select("node", F.col("x").alias("katz"))


_EIG_ROUNDS = 3


def _eig_oracle() -> str:
    ctes = list(_lpa_ctes(0)[:2])  # e0, sym
    ctes.append(
        "g0 AS MATERIALIZED (SELECT DISTINCT u AS node,"
        " CAST(1 AS DOUBLE) AS x FROM sym)"
    )
    for i in range(1, _EIG_ROUNDS + 1):
        ctes += [
            f"gs{i} AS MATERIALIZED (SELECT n.node,"
            " COALESCE(f.sm, CAST(0 AS DOUBLE)) AS y"
            f" FROM g0 n LEFT JOIN ("
            " SELECT s.v AS node,"
            " list_reduce(list_prepend(CAST(0 AS DOUBLE),"
            " list(p.x ORDER BY s.u)), (a, b) -> a + b) AS sm"
            f" FROM sym s JOIN g{i - 1} p ON s.u = p.node"
            " GROUP BY s.v) f USING (node))",
            f"gn{i} AS (SELECT sqrt(list_reduce(list_prepend("
            " CAST(0 AS DOUBLE), list(y * y ORDER BY node)),"
            f" (a, b) -> a + b)) AS nrm FROM gs{i})",
            f"g{i} AS MATERIALIZED (SELECT node,"
            f" y / (SELECT nrm FROM gn{i}) AS x FROM gs{i})",
        ]
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT node, x AS eigen FROM g{_EIG_ROUNDS}"
    )


@QS.add(
    "graph_eigenvector_centrality",
    _eig_oracle(),
    doc="[EXT] eigenvector centrality by normalized power iteration "
    f"(x ← Ax / ||Ax||₂, {_EIG_ROUNDS} rounds from the all-ones "
    "vector) over the co-purchase graph — completing the classic "
    "centrality ladder next to degree, harmonic, betweenness, Katz, "
    "pagerank and HITS. 19th hash-gated iterative: neighbor sums are "
    "pinned-order folds, the L2 norm is sqrt (correctly rounded) of a "
    "pinned-order fold of squares (node order), and each node's "
    "normalize is ONE division by that bit-identical norm — the whole "
    "float trajectory matches DuckDB bit-for-bit. Per round: one "
    "edges⋈scores equi-join + one grouped fold + one 1-row norm "
    "aggregate broadcast back. Linear lineage, deliberately NOT "
    "checkpointed.",
    tags=("graph", "iterative"),
)
def graph_eigenvector_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    _e0, sym = _lp_graph(spark, sf_dir)
    nodes = sym.select(F.col("u").alias("node")).distinct()
    x = nodes.select("node", F.lit(1.0).alias("x"))
    for _ in range(_EIG_ROUNDS):
        f = (
            sym.join(x.select(F.col("node").alias("u"), "x"), "u")
            .select(
                F.col("v").alias("node"),
                F.struct(F.col("u"), F.col("x").alias("term")).alias("st"),
            )
            .groupBy("node")
            .agg(
                F.aggregate(
                    F.sort_array(F.collect_list("st")),
                    F.lit(0.0),
                    lambda acc, t: acc + t["term"],
                ).alias("sm")
            )
        )
        y = nodes.join(f, "node", "left").select(
            "node", F.coalesce(F.col("sm"), F.lit(0.0)).alias("y")
        )
        nrm = y.agg(
            F.sqrt(
                F.aggregate(
                    F.sort_array(
                        F.collect_list(
                            F.struct("node", (F.col("y") * F.col("y")).alias("s"))
                        )
                    ),
                    F.lit(0.0),
                    lambda acc, t: acc + t["s"],
                )
            ).alias("nrm")
        )
        x = y.crossJoin(F.broadcast(nrm)).select(
            "node", (F.col("y") / F.col("nrm")).alias("x")
        )
    return x.select("node", F.col("x").alias("eigen"))


@QS.add(
    "graph_degree_assortativity",
    "WITH "
    + ",\n".join(_lpa_ctes(0)[:2])
    + """,
    deg AS MATERIALIZED (
      SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS d
      FROM sym GROUP BY u),
    ed AS (
      SELECT du.d AS j, dv.d AS k
      FROM sym s JOIN deg du ON s.u = du.node
                 JOIN deg dv ON s.v = dv.node),
    sums AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(j) AS BIGINT) AS s1,
             CAST(SUM(j * j) AS BIGINT) AS s2,
             CAST(SUM(j * k) AS BIGINT) AS s3
      FROM ed)
    SELECT m, s1, s2, s3,
           CAST(m * s3 - s1 * s1 AS DOUBLE)
             / CAST(m * s2 - s1 * s1 AS DOUBLE) AS assortativity
    FROM sums
    """,
    doc="[EXT] degree assortativity coefficient (Newman 2002) of the "
    "co-purchase graph — do high-degree nodes attach to high-degree "
    "nodes (social-network-like, r>0) or to leaves (hub-and-spoke/"
    "technological, r<0)? THE summary statistic for whether the "
    "hub-skew posture (EDGE_SALT) matters on a given graph. On the "
    "symmetrized edge list the (j,k) marginals coincide, so Pearson's "
    "r over edge-endpoint degrees collapses to (M·Σjk − (Σj)²) / "
    "(M·Σj² − (Σj)²) — exact BIGINT sums of degree products over the "
    "edge join, ONE division, no sqrt. Cross-product headroom: "
    "M·Σjk ~ degrees²·edges² stays under int64 through ~1e5-edge audit "
    "graphs; shard by component beyond. One degree aggregate + one "
    "edges⋈degrees join, map-side-combinable sums.",
    tags=("graph", "stats"),
)
def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    _e0, sym = _lp_graph(spark, sf_dir)
    deg = sym.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    ed = (
        sym.join(
            deg.select(F.col("node").alias("u"), F.col("d").alias("j")), "u"
        )
        .join(
            deg.select(F.col("node").alias("v"), F.col("d").alias("k")), "v"
        )
        .select("j", "k")
    )
    sums = ed.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum("j").cast("long").alias("s1"),
        F.sum(F.col("j") * F.col("j")).cast("long").alias("s2"),
        F.sum(F.col("j") * F.col("k")).cast("long").alias("s3"),
    )
    return sums.select(
        "m",
        "s1",
        "s2",
        "s3",
        (
            (F.col("m") * F.col("s3") - F.col("s1") * F.col("s1")).cast("double")
            / (F.col("m") * F.col("s2") - F.col("s1") * F.col("s1")).cast(
                "double"
            )
        ).alias("assortativity"),
    )


# ---------------------------------------------------------------------------
# Rich-club coefficient ladder over the co-purchase graph.
# ---------------------------------------------------------------------------

#: Degree thresholds for the rich-club ladder. A literal ladder (not
#: percentile-derived) so the output schema is stable across scale
#: factors; thresholds are powers of two covering the observed degree
#: range at every SF.
_RC_KS = (1, 2, 4, 8, 16, 32)


@QS.add(
    "graph_rich_club",
    "WITH "
    + ",\n".join(_lpa_ctes(0)[:2])
    + f""",
    deg AS MATERIALIZED (
      SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS d
      FROM sym GROUP BY u),
    ks AS (SELECT unnest(ARRAY{list(_RC_KS)}) AS k),
    nk AS (
      SELECT ks.k, CAST(COUNT(deg.node) AS BIGINT) AS n_k
      FROM ks LEFT JOIN deg ON deg.d > ks.k GROUP BY ks.k),
    ek AS (
      SELECT ks.k, CAST(COUNT(ed.dju) AS BIGINT) AS e_k
      FROM ks LEFT JOIN (
        SELECT du.d AS dju, dv.d AS djv
        FROM e0 JOIN deg du ON e0.u = du.node
                JOIN deg dv ON e0.v = dv.node
      ) ed ON ed.dju > ks.k AND ed.djv > ks.k
      GROUP BY ks.k)
    SELECT nk.k, nk.n_k, ek.e_k,
           CASE WHEN nk.n_k < 2 THEN NULL
                ELSE CAST(2 * ek.e_k AS DOUBLE)
                     / CAST(nk.n_k * (nk.n_k - 1) AS DOUBLE)
           END AS phi
    FROM nk JOIN ek ON nk.k = ek.k
    """,
    doc="[EXT] rich-club coefficient ladder (Zhou-Mondragon): for each "
    "degree threshold k, phi(k) = 2*E_k / (N_k*(N_k-1)) where N_k "
    "counts nodes of degree > k and E_k the undirected edges with BOTH "
    "endpoints above threshold — does the high-degree elite form a "
    "densely wired club? Pure BIGINT counts + ONE division per ladder "
    "rung (NULL below 2 club members, never NaN); a literal power-of-"
    "two ladder keeps the schema scale-stable. One degree aggregate + "
    "one edges⋈degrees join feed every rung (the ladder is a 6-row "
    "broadcast); complements graph_degree_assortativity, which "
    "summarizes the same correlation in one number.",
    tags=("graph", "stats"),
)
def graph_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    e0, sym = _lp_graph(spark, sf_dir)
    deg = sym.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    ).coalesce(8).persist()
    ks = e0.sparkSession.createDataFrame([(k,) for k in _RC_KS], "k int")
    nk = (
        ks.join(deg, deg["d"] > ks["k"], "left")
        .groupBy("k")
        .agg(F.count(F.col("node")).cast("long").alias("n_k"))
    )
    ed = (
        e0.join(deg.select(F.col("node").alias("u"), F.col("d").alias("dju")), "u")
        .join(deg.select(F.col("node").alias("v"), F.col("d").alias("djv")), "v")
        .select("dju", "djv")
    )
    ek = (
        ks.join(ed, (ed["dju"] > ks["k"]) & (ed["djv"] > ks["k"]), "left")
        .groupBy("k")
        .agg(F.count(F.col("dju")).cast("long").alias("e_k"))
    )
    j = nk.join(ek, "k")
    return j.select(
        F.col("k").cast("int").alias("k"),
        "n_k",
        "e_k",
        F.when(F.col("n_k") < 2, F.lit(None).cast("double"))
        .otherwise(
            (2 * F.col("e_k")).cast("double")
            / (F.col("n_k") * (F.col("n_k") - 1)).cast("double")
        )
        .alias("phi"),
    )


# ---------------------------------------------------------------------------
# Average neighbor degree by degree class (the knn(k) curve).
# ---------------------------------------------------------------------------


@QS.add(
    "graph_avg_neighbor_degree",
    "WITH "
    + ",\n".join(_lpa_ctes(0)[:2])
    + """,
    deg AS MATERIALIZED (
      SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS d
      FROM sym GROUP BY u),
    ed AS (
      SELECT du.d AS j, dv.d AS k
      FROM sym s JOIN deg du ON s.u = du.node
                 JOIN deg dv ON s.v = dv.node),
    byj AS (
      SELECT j, CAST(SUM(k) AS BIGINT) AS sum_nbr_deg FROM ed GROUP BY j),
    nj AS (
      SELECT d AS j, CAST(COUNT(*) AS BIGINT) AS n_nodes
      FROM deg GROUP BY d)
    SELECT nj.j AS degree, nj.n_nodes, byj.sum_nbr_deg,
           CAST(byj.sum_nbr_deg AS DOUBLE)
             / CAST(nj.j * nj.n_nodes AS DOUBLE) AS knn
    FROM nj JOIN byj ON nj.j = byj.j
    """,
    doc="[EXT] average-neighbor-degree curve knn(k) (Pastor-Satorras "
    "degree-correlation function): for each degree class k, the mean "
    "degree of the neighbors of degree-k nodes = Sum(deg(v) over edges "
    "with deg(u)=k) / (k * N_k) — exact BIGINT sums from one "
    "sym⋈deg⋈deg join, ONE division per class. The full curve behind "
    "graph_degree_assortativity's single r (rising knn = assortative, "
    "falling = hub-and-spoke) and the standard diagnostic plot for "
    "whether EDGE_SALT matters at a given scale.",
    tags=("graph", "stats"),
)
def graph_avg_neighbor_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    _e0, sym = _lp_graph(spark, sf_dir)
    deg = sym.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    ).coalesce(8).persist()
    ed = (
        sym.join(deg.select(F.col("node").alias("u"), F.col("d").alias("j")), "u")
        .join(deg.select(F.col("node").alias("v"), F.col("d").alias("k")), "v")
        .select("j", "k")
    )
    byj = ed.groupBy("j").agg(F.sum("k").cast("long").alias("sum_nbr_deg"))
    nj = deg.groupBy(F.col("d").alias("j")).agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes")
    )
    return nj.join(byj, "j").select(
        F.col("j").alias("degree"),
        "n_nodes",
        "sum_nbr_deg",
        (
            F.col("sum_nbr_deg").cast("double")
            / (F.col("j") * F.col("n_nodes")).cast("double")
        ).alias("knn"),
    )


# ---------------------------------------------------------------------------
# Edge embeddedness spectrum (Granovetter weak ties).
# ---------------------------------------------------------------------------


@QS.add(
    "graph_edge_embeddedness",
    "WITH "
    + ",\n".join(_lpa_ctes(0)[:2])
    + """,
    cn AS (
      SELECT s1.v AS a, s2.v AS b, CAST(COUNT(*) AS BIGINT) AS cn
      FROM sym s1 JOIN sym s2 ON s1.u = s2.u AND s1.v < s2.v
      GROUP BY s1.v, s2.v
    ),
    emb AS (
      SELECT e0.u, e0.v, CAST(COALESCE(cn.cn, 0) AS BIGINT) AS embeddedness
      FROM e0 LEFT JOIN cn ON cn.a = e0.u AND cn.b = e0.v
    )
    SELECT embeddedness, CAST(COUNT(*) AS BIGINT) AS n_edges
    FROM emb GROUP BY embeddedness
    """,
    doc="[EXT] edge-embeddedness spectrum (Granovetter): for every "
    "EDGE of the co-purchase graph, the number of common neighbors of "
    "its endpoints, histogrammed — embeddedness 0 = weak ties/bridges "
    "(the edges whose removal fragments information flow), high "
    "embeddedness = redundant intra-community links. The same wedge "
    "join as graph_linkpred_topk pointed at ADJACENT pairs instead of "
    "non-adjacent ones (one LEFT join of the wedge counts onto the "
    "edge list — edges with no wedge coalesce to 0); pure BIGINT "
    "counts. The spectrum is the standard tie-strength diagnostic "
    "next to the clustering-coefficient and assortativity summaries.",
    tags=("graph", "stats"),
)
def graph_edge_embeddedness(spark: SparkSession, sf_dir: str) -> DataFrame:
    e0, sym = _lp_graph(spark, sf_dir)
    s1 = sym.select(F.col("u").alias("w"), F.col("v").alias("a"))
    s2 = sym.select(F.col("u").alias("w"), F.col("v").alias("b"))
    cn = (
        s1.join(s2, "w")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("cn"))
    )
    emb = e0.join(
        cn,
        (F.col("u") == F.col("a")) & (F.col("v") == F.col("b")),
        "left",
    ).select(F.coalesce("cn", F.lit(0)).cast("long").alias("embeddedness"))
    return emb.groupBy("embeddedness").agg(
        F.count(F.lit(1)).cast("long").alias("n_edges")
    )


# ---------------------------------------------------------------------------
# Neighborhood Jaccard similarity (the normalized common-neighbor score).
# ---------------------------------------------------------------------------

_JS_TOPK = 20


@QS.add(
    "graph_jaccard_similarity_topk",
    f"""
    WITH {_LP_EDGES_SQL},
    cn AS (
      SELECT s1.v AS a, s2.v AS b, CAST(COUNT(*) AS BIGINT) AS cn
      FROM sym s1 JOIN sym s2 ON s1.u = s2.u AND s1.v < s2.v
      GROUP BY s1.v, s2.v
    ),
    scored AS (
      SELECT cn.a AS u, cn.b AS v, cn.cn,
             da.d AS deg_u, db.d AS deg_v,
             EXISTS (SELECT 1 FROM e0
                     WHERE e0.u = cn.a AND e0.v = cn.b) AS adjacent,
             CAST(cn.cn AS DOUBLE)
               / CAST(da.d + db.d - cn.cn AS DOUBLE) AS jaccard
      FROM cn
      JOIN deg da ON da.node = cn.a
      JOIN deg db ON db.node = cn.b
    ),
    r AS (
      SELECT u, v, cn, deg_u, deg_v, adjacent, jaccard,
             CAST(ROW_NUMBER() OVER (
               ORDER BY jaccard DESC, u, v) AS BIGINT) AS rnk
      FROM scored
    )
    SELECT u, v, cn, deg_u, deg_v, adjacent, jaccard, rnk
    FROM r WHERE rnk <= {_JS_TOPK}
    """,
    doc="[EXT] neighborhood Jaccard similarity over the co-purchase "
    "graph's wedge candidates: |N(u) ∩ N(v)| / |N(u) ∪ N(v)| — the "
    "normalized form of the common-neighbor family (linkpred's raw cn, "
    "edge embeddedness) that makes scores comparable across degree "
    "scales. One algebraic subtlety makes the formula UNIFORM: u,v are "
    "never their own neighbors, so the endpoints cancel and "
    "union = deg_u + deg_v - cn holds for adjacent and non-adjacent "
    "pairs alike (the adjacent flag rides along from an EXISTS probe). "
    "cn and the union are exact BIGINTs; jaccard is ONE division — "
    "hash-safe; candidates come from the wedge equi-join, never "
    "all-pairs; output is the deterministic top-20 (the global "
    "ROW_NUMBER sorts only the candidate set and takes a literal "
    "prefix).",
    tags=("graph",),
)
def graph_jaccard_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    e0 = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .agg(F.count(F.lit(1)).alias("m"))
        .filter(F.col("m") >= _LP_SUPPORT)
        .select("u", "v")
        .coalesce(8)
        .persist()
    )
    sym = e0.unionByName(e0.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = sym.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    s1 = sym.select(F.col("u").alias("w"), F.col("v").alias("a"))
    s2 = sym.select(F.col("u").alias("w"), F.col("v").alias("b"))
    cn = (
        s1.join(s2, "w")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("cn"))
    )
    adj = e0.select(
        F.col("u").alias("a"), F.col("v").alias("b"), F.lit(True).alias("adjacent")
    )
    da = deg.select(F.col("node").alias("a"), F.col("d").alias("deg_u"))
    db = deg.select(F.col("node").alias("b"), F.col("d").alias("deg_v"))
    scored = (
        cn.join(da, "a")
        .join(db, "b")
        .join(adj, ["a", "b"], "left")
        .select(
            F.col("a").alias("u"),
            F.col("b").alias("v"),
            "cn",
            "deg_u",
            "deg_v",
            F.coalesce("adjacent", F.lit(False)).alias("adjacent"),
            (
                F.col("cn").cast("double")
                / (F.col("deg_u") + F.col("deg_v") - F.col("cn")).cast("double")
            ).alias("jaccard"),
        )
    )
    # distributed top-k FIRST (TakeOrderedAndProject — no global window
    # over the corpus-scale candidate set); the rank window then sorts
    # exactly k=20 rows (the retrieval_rbo_rankings allowlist pattern).
    top = scored.orderBy(
        F.desc("jaccard"), F.asc("u"), F.asc("v")
    ).limit(_JS_TOPK)
    w = Window.orderBy(F.desc("jaccard"), F.asc("u"), F.asc("v"))
    return top.withColumn("rnk", F.row_number().over(w).cast("long")).select(
        "u", "v", "cn", "deg_u", "deg_v", "adjacent", "jaccard", "rnk"
    )


# ---------------------------------------------------------------------------
# Degree distribution + CCDF (the first chart of any graph analysis).
# ---------------------------------------------------------------------------


@QS.add(
    "graph_degree_distribution",
    f"""
    WITH {_LP_EDGES_SQL},
    hist AS (
      SELECT d AS degree, CAST(COUNT(*) AS BIGINT) AS n_nodes
      FROM deg GROUP BY d
    ),
    tot AS (SELECT CAST(SUM(n_nodes) AS BIGINT) AS n FROM hist),
    walk AS (
      SELECT degree, n_nodes,
             CAST(SUM(n_nodes) OVER (ORDER BY degree DESC) AS BIGINT)
               AS n_at_least
      FROM hist
    )
    SELECT w.degree, w.n_nodes, w.n_at_least,
           CAST(w.n_nodes AS DOUBLE) / CAST(t.n AS DOUBLE) AS pmf,
           CAST(w.n_at_least AS DOUBLE) / CAST(t.n AS DOUBLE) AS ccdf
    FROM walk w CROSS JOIN tot t
    """,
    doc="[EXT] degree distribution of the co-purchase graph: per distinct "
    "degree the node count, the >=-degree tail count (CCDF numerator via "
    "one DESCENDING running sum over the degree HISTOGRAM — bounded by "
    "the degree domain, never |V|), and pmf/ccdf as single divisions of "
    "exact BIGINTs. The CCDF is the power-law/hub diagnostic every graph "
    "analysis starts with (and what the rich-club ladder conditions on).",
    tags=("graph",),
)
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    e0 = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .agg(F.count(F.lit(1)).alias("m"))
        .filter(F.col("m") >= _LP_SUPPORT)
        .select("u", "v")
    )
    sym = e0.unionByName(e0.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = sym.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    hist = deg.groupBy(F.col("d").alias("degree")).agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes")
    )
    tot = hist.agg(F.sum("n_nodes").cast("long").alias("n"))
    w_cum = W.orderBy(F.desc("degree")).rowsBetween(W.unboundedPreceding, 0)
    walk = hist.select(
        "degree",
        "n_nodes",
        F.sum("n_nodes").over(w_cum).cast("long").alias("n_at_least"),
    )
    return walk.crossJoin(F.broadcast(tot)).select(
        "degree",
        "n_nodes",
        "n_at_least",
        (F.col("n_nodes").cast("double") / F.col("n").cast("double")).alias("pmf"),
        (F.col("n_at_least").cast("double") / F.col("n").cast("double")).alias(
            "ccdf"
        ),
    )
