"""Deterministic k-means over embedding columns. [EXT]

The second iterative algorithm in the engine (with connected components,
``operators/graph.py``): Lloyd iterations as pure DataFrame ops —

    assign:  argmin over broadcast centroids (squared L2, fixed fold order)
    update:  groupBy(cluster) → per-dimension mean via ``posexplode`` +
             pivot-free aggregation

Determinism is the design constraint (results must reproduce across runs
and cluster sizes): init = the ``k`` lowest-id vectors, a FIXED iteration
count (no data-dependent convergence races), ties in argmin broken by the
lower centroid id, and all arithmetic in DOUBLE with per-dimension
sequential folds. MLlib's KMeans is the library alternative; this exists
because seeded-random init + early-stop make MLlib runs non-reproducible
across partitionings, which a data-pipeline dedup/bucketing stage can't
tolerate.

Scale: each iteration is one broadcast (k×dim doubles — tiny), one narrow
argmin projection, and one groupBy — shuffle volume is rows×1 cluster id,
never rows×k. Centroid update uses the driver only to hold k centroids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clinical_api_etl_spark.operators.similarity import _parallel


def kmeans(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    iterations: int = 5,
) -> DataFrame:
    """(id, cluster) after ``iterations`` Lloyd steps from deterministic
    init (the k lowest-id vectors, cluster ids 0..k-1 in that order)."""
    out, _ = kmeans_fit(
        df, id_col=id_col, vec_col=vec_col, k=k, iterations=iterations
    )
    return out


def kmeans_fit(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    iterations: int = 5,
) -> tuple[DataFrame, list[list[float]]]:
    """As :func:`kmeans`, also returning the final centroids (the model —
    what IVF search probes against)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    pts = _parallel(
        df.select(F.col(id_col).alias("id"), v.alias("v"))
    ).persist()

    centroids = [
        [float(x) for x in r["v"]]
        for r in pts.orderBy("id").limit(k).collect()
    ]

    def assign(cents: list[list[float]]):
        # squared L2 to each centroid as a flat fold; argmin with low-id ties
        dists = F.array(
            *[
                F.aggregate(
                    F.zip_with(
                        F.col("v"),
                        F.array(*[F.lit(c) for c in cent]),
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                for cent in cents
            ]
        )
        # Materialize the k-fold distance array as a named column before
        # argmin: array_position + array_min reference it twice, and
        # higher-order expressions get no codegen subexpression elimination
        # (CollapseProject keeps the boundary for non-cheap, multiply-
        # referenced aliases) — inlining would evaluate all k folds twice.
        return pts.select("id", "v", dists.alias("_d")).select(
            "id", "v", (F.array_position("_d", F.array_min("_d")) - 1).alias("cluster")
        )

    dim = len(centroids[0])
    for _ in range(iterations):
        assigned = assign(centroids)
        # Centroid update as ONE shuffle: dim codegen'd sum aggregates over
        # element_at (map-side partial aggregation reduces each partition to
        # k rows before the exchange) — replaces a posexplode (rows×dim) +
        # two groupBys + per-dim sort, which shuffled 64× more rows.
        sums = (
            assigned.groupBy("cluster")
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[
                    F.sum(F.element_at("v", i + 1)).alias(f"s{i}")
                    for i in range(dim)
                ],
            )
            .collect()
        )
        new = list(centroids)
        for r in sums:
            new[r["cluster"]] = [float(r[f"s{i}"]) / r["n"] for i in range(dim)]
        centroids = new

    out = assign(centroids).select("id", F.col("cluster").cast("long").alias("cluster"))
    pts.unpersist()
    return out, centroids
