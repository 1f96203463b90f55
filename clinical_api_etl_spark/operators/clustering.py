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
centroid id, and sequential left-to-right float summation driver-side.
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

    Pure Python, sequential fold order — bit-reproducible everywhere.
    Mirrors the distributed semantics exactly: init = first k points,
    squared-L2 argmin with lower-index tie-break, mean update, empty
    clusters keep their previous centroid.
    """
    cents = [list(p) for p in pts[:k]]
    dim = len(cents[0])
    for _ in range(iterations):
        sums = [[0.0] * dim for _ in range(k)]
        counts = [0] * k
        for p in pts:
            best, best_d = 0, None
            for ci, c in enumerate(cents):
                d = 0.0
                for a, b in zip(p, c):
                    d += (a - b) * (a - b)
                if best_d is None or d < best_d:
                    best, best_d = ci, d
            counts[best] += 1
            s = sums[best]
            for j, a in enumerate(p):
                s[j] += a
        cents = [
            [s[j] / counts[ci] for j in range(dim)] if counts[ci] else cents[ci]
            for ci, s in enumerate(sums)
        ]
    return cents


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

    sample = [
        [float(x) for x in r["v"]]
        for r in pts.orderBy("id").limit(train_sample).collect()
    ]
    if len(sample) < k:
        raise ValueError(f"k={k} exceeds available vectors ({len(sample)})")
    centroids = _lloyd(sample, k, iterations)

    # Final assignment: argmin over centroids with low-id ties, as a fully
    # codegen'd score — argmin_c |v-c|² == argmin_c (|c|² - 2⟨v,c⟩) since
    # |v|² is constant per row. Centroid coordinates are literals, so each
    # score is a plain multiply-add chain over element_at(v, d): whole-stage
    # codegen, no higher-order function (an interpreted zip_with/aggregate
    # fold pays a lambda eval per row × centroid × dim). repr(float)
    # round-trips doubles exactly, so the generated SQL is bit-identical
    # run to run (determinism contract).
    scores = []
    for cent in centroids:
        dot_terms = " + ".join(
            f"({c!r})*element_at(v,{d + 1})" for d, c in enumerate(cent)
        )
        scores.append(f"({sum(c * c for c in cent)!r} - 2.0*({dot_terms}))")
    dists = F.expr(f"array({', '.join(scores)})")
    out = (
        pts.select("id", dists.alias("_d"))
        .select(
            "id",
            (F.array_position("_d", F.array_min("_d")) - 1)
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
    return out, centroids
