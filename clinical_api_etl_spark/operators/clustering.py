"""Deterministic k-means over embedding columns. [EXT]

The second iterative algorithm in the engine (with connected components,
``operators/graph.py``): centroid TRAINING runs driver-side over a
deterministic bounded sample (the ``train_sample`` lowest-id vectors), and
only the final cluster ASSIGNMENT is a distributed pass —

    train:   Lloyd iterations in plain Python over ≤ ``train_sample`` rows
             (k×dim and sample×dim are both driver-trivial; this is the
             faiss/IVF convention — centroids are a model, models train on
             samples)
    assign:  argmin over literal centroids as a codegen'd score expression
             (one narrow projection over the full corpus, no shuffle)

Earlier revisions ran every Lloyd iteration as a distributed
assign+aggregate round trip; at 100 TB that is ``iterations`` extra full
scans of the corpus for a model that a 1-in-10⁵ sample trains just as well,
and on small inputs per-job overhead dominated (3 iterations ≈ 5s for 2k
rows). Sample-training does ONE bounded collect (``TakeOrderedAndProject``
— a top-N heap per partition, never a full sort) + ONE full-corpus
projection.

Determinism is the design constraint (results must reproduce across runs
and cluster sizes): training set = the ``train_sample`` lowest-id vectors,
init = the ``k`` lowest-id vectors, a FIXED iteration count (no
data-dependent convergence races), ties in argmin broken by the lower
centroid id, and fixed-shape numpy reductions driver-side (deterministic
for a given sample — no RNG, no data-dependent order).
MLlib's KMeans is the library alternative; this exists because
seeded-random init + early-stop make MLlib runs non-reproducible across
partitionings, which a data-pipeline dedup/bucketing stage can't tolerate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kmeans(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    iterations: int = 5,
    train_sample: int = 8192,
) -> DataFrame:
    """(id, cluster) after ``iterations`` Lloyd steps from deterministic
    init (the k lowest-id vectors, cluster ids 0..k-1 in that order)."""
    out, _ = kmeans_fit(
        df, id_col=id_col, vec_col=vec_col, k=k, iterations=iterations,
        train_sample=train_sample,
    )
    return out


def _lloyd(
    pts: list[list[float]], k: int, iterations: int
) -> list[list[float]]:
    """Driver-side Lloyd over the (already deterministic-ordered) sample.

    Vectorized numpy, deterministic: fixed-shape reductions are
    bit-reproducible run to run, ``argmin`` breaks ties on the lower
    index, empty clusters keep their previous centroid. (An earlier
    pure-Python version was the trainer bottleneck — ~5s of interpreter
    loops at an 8k×64 sample; numpy is <100 ms for the same model.)
    """
    import numpy as np

    P = np.asarray(pts, dtype=np.float64)
    cents = P[:k].copy()
    for _ in range(iterations):
        d = ((P[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        for c in range(k):
            mask = a == c
            if mask.any():
                cents[c] = P[mask].mean(axis=0)
    return [[float(x) for x in c] for c in cents]


def collect_sample(pts: DataFrame, n: int) -> list[list[float]]:
    """The ``n`` lowest-id vectors of a prepared ``(id, v)`` frame —
    ``TakeOrderedAndProject`` (per-partition top-N heap, never a full
    sort), the engine's deterministic training sample.

    Collected via ``toPandas`` (Arrow batches) — same wall-time as a
    plain ``collect()`` at 8k × 64 doubles, but the Arrow path's transfer
    cost stays flat as ``train_sample`` grows (row collect scales with
    rows × py4j object overhead).
    """
    pdf = pts.orderBy("id").limit(n).select("v").toPandas()
    return [[float(x) for x in v] for v in pdf["v"]]


def assign_cells(pts: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """Distributed argmin over literal centroids with low-index ties, as a
    persisted ``(id, cluster)`` frame — the shared assignment pass of
    k-means, IVF, and IVFPQ.

    argmin_c |v-c|² == argmin_c (|c|² - 2⟨v,c⟩) since |v|² is constant
    per row; centroid coordinates are literals, so each score is a plain
    multiply-add chain over element_at(v, d): whole-stage codegen, no
    higher-order function (an interpreted zip_with/aggregate fold pays a
    lambda eval per row × centroid × dim). repr(float) round-trips doubles
    exactly, so the generated SQL is bit-identical run to run.

    Shape constraint (learned at k=8 × dim=64): ONE array-of-k-chains
    expression is a single ~80 KB codegen node — janino's 64 KB method
    limit kills the whole stage and Spark silently falls back to
    interpreted Volcano AFTER paying the failed compile. k SEPARATE scalar
    score columns keep every expression small enough to compile and let
    codegen split them across methods; the argmin then reads the named
    columns in a second projection (the array there is referenced twice —
    array_position + array_min — so CollapseProject keeps the boundary
    and never re-inlines the chains).
    """
    cols = []
    for i, cent in enumerate(centroids):
        dot_terms = " + ".join(
            f"({c!r})*element_at(v,{d + 1})" for d, c in enumerate(cent)
        )
        cols.append(
            F.expr(f"({sum(c * c for c in cent)!r} - 2.0*({dot_terms}))").alias(
                f"_s{i}"
            )
        )
    arr = F.array(*[f"_s{i}" for i in range(len(centroids))])
    return (
        pts.select("id", *cols)
        .select(
            "id",
            (F.array_position(arr, F.array_min(arr)) - 1)
            .cast("long")
            .alias("cluster"),
        )
        # Persisted so consumers (IVF probe join, WCSS gates) read the
        # materialized (id, cluster) pairs — 16 bytes/row — instead of
        # re-fusing the k×dim-term score expression into each of their
        # whole-stage-codegen spans (every distinct downstream plan shape
        # paid a fresh ~1.5s janino compile of it).
        .persist()
    )


def kmeans_fit(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    iterations: int = 5,
    train_sample: int = 8192,
) -> tuple[DataFrame, list[list[float]]]:
    """As :func:`kmeans`, also returning the final centroids (the model —
    what IVF search probes against)."""
    from clinical_api_etl_spark.operators.similarity import _parallel

    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    pts = _parallel(df.select(F.col(id_col).alias("id"), v.alias("v")))

    sample = collect_sample(pts, train_sample)
    if len(sample) < k:
        raise ValueError(f"k={k} exceeds available vectors ({len(sample)})")
    centroids = _lloyd(sample, k, iterations)
    return assign_cells(pts, centroids), centroids
