"""Product quantization for embedding columns. [EXT]

The compression companion to IVF (``operators/similarity.py``): split the
vector into ``m`` contiguous subspaces, train a ``k``-centroid codebook
per subspace, and store each vector as ``m`` small integer codes — at
(m=8, k=16) a 64-dim float32 vector compresses 256 B → 8 B (int codes;
4 bits/code packed). Asymmetric-distance ANN then scans codes against a
per-query lookup table instead of raw floats — the faiss IVFPQ layout.

Training follows the engine's model convention (``operators/
clustering.py``): codebooks train DRIVER-SIDE with deterministic Lloyd
over the ``train_sample`` lowest-id vectors (a model trains on a sample;
distributed iterations would be ``m × iterations`` full corpus scans),
and only the ENCODE step is a distributed pass — one narrow projection,
no shuffle. Same determinism contract: fixed init (k lowest-id sample
rows per subspace), fixed iteration count, low-index argmin tie-break,
sequential float folds driver-side, ``repr(float)`` round-trip exactness
in the generated SQL.

ENCODE is a declared Arrow operator (``mapInPandas``): per Arrow batch,
numpy computes the (n × k × dsub) distance tensor per subspace and takes
the argmin — the same vectorized batch kernel faiss uses. An earlier
revision generated m×k literal multiply-add SQL chains instead (one
scalar column per centroid, see ``clustering.assign_cells`` for the
janino 64 KB history); it was correct but paid ~3s of janino compilation
per distinct plan shape for work numpy does in milliseconds — the
lesson generalizes: large LITERAL MODELS (codebooks) belong in an Arrow
kernel, small ones (k coarse centroids) in codegen'd expressions.
Determinism is unchanged: float64 ops, fixed shapes, ``argmin`` lowest-
index ties (== the old ``array_position`` first-match).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clinical_api_etl_spark.operators.clustering import _lloyd


def _encode(
    frame: DataFrame,
    books: list[list[list[float]]],
    *,
    coarse: list[list[float]] | None = None,
    with_err: bool = False,
) -> DataFrame:
    """Arrow-vectorized PQ encode.

    ``frame`` is ``(id, v)`` — or ``(id, cluster, v)`` when ``coarse`` is
    given, in which case the encoded value is the RESIDUAL ``v −
    coarse[cluster]`` (the faiss IVFPQ layout). Output: ``(id[, cluster],
    codes array<int>[, recon_err double])``. One narrow distributed pass;
    only numpy batch kernels per Arrow batch, no per-row Python.
    """
    import numpy as np
    import pandas as pd

    B = [np.asarray(b, dtype=np.float64) for b in books]
    m = len(B)
    dsub = B[0].shape[1]
    C = np.asarray(coarse, dtype=np.float64) if coarse is not None else None
    schema = "id long" + (", cluster long" if coarse is not None else "")
    schema += ", codes array<int>"
    if with_err:
        schema += ", recon_err double"

    def fn(batches):
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            V = np.vstack([np.asarray(x, dtype=np.float64) for x in pdf["v"]])
            if C is not None:
                R = V - C[pdf["cluster"].to_numpy()]
            else:
                R = V
            codes = np.empty((n, m), dtype=np.int32)
            err = np.zeros(n, dtype=np.float64) if with_err else None
            for s in range(m):
                sub = R[:, s * dsub : (s + 1) * dsub]
                d = ((sub[:, None, :] - B[s][None, :, :]) ** 2).sum(axis=2)
                codes[:, s] = d.argmin(axis=1)
                if err is not None:
                    err += d.min(axis=1)
            out = {"id": pdf["id"].to_numpy()}
            if C is not None:
                out["cluster"] = pdf["cluster"].to_numpy()
            out["codes"] = list(codes)
            if with_err:
                out["recon_err"] = err
            yield pd.DataFrame(out)

    return frame.mapInPandas(fn, schema)


def pq_fit(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    iterations: int = 5,
    train_sample: int = 8192,
) -> tuple[DataFrame, list[list[list[float]]]]:
    """Train per-subspace codebooks and encode the corpus.

    Returns ``(encoded, codebooks)`` where ``encoded`` has columns
    ``(id, codes array<int> length m, recon_err double)`` —
    ``recon_err`` is the squared L2 distance between the vector and its
    per-subspace nearest centroids — and ``codebooks[s][c]`` is centroid
    ``c`` of subspace ``s``.
    """
    from clinical_api_etl_spark.operators.similarity import _parallel

    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    pts = _parallel(df.select(F.col(id_col).alias("id"), v.alias("v")))

    sample = [
        [float(x) for x in r["v"]]
        for r in pts.orderBy("id").limit(train_sample).collect()
    ]
    if len(sample) < k:
        raise ValueError(f"k={k} exceeds available vectors ({len(sample)})")
    dim = len(sample[0])
    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    dsub = dim // m

    codebooks = [
        _lloyd([p[s * dsub : (s + 1) * dsub] for p in sample], k, iterations)
        for s in range(m)
    ]

    out = _encode(pts, codebooks, with_err=True).persist()
    return out, codebooks


def l2_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k L2 neighbors per query (self excluded) — the brute-force
    baseline IVFPQ is gated against (squared distance; same ranking)."""
    from pyspark.sql.window import Window as W

    from clinical_api_etl_spark.operators.similarity import _parallel, _prep

    q = _prep(queries, id_col, vec_col, "query_id", "q_vec")
    c = _parallel(_prep(corpus, id_col, vec_col, "neighbor_id", "c_vec"))
    # |q-c|² = |q|² + |c|² - 2⟨q,c⟩ — reuse the hoisted norms; the fold per
    # pair is one dot product, same as the cosine path.
    from clinical_api_etl_spark.functions.vectors import dot

    d2 = (
        F.col("q_vec_norm") * F.col("q_vec_norm")
        + F.col("c_vec_norm") * F.col("c_vec_norm")
        - 2.0 * dot(F.col("q_vec"), F.col("c_vec"))
    )
    w = W.partitionBy("query_id").orderBy(F.asc("l2_sq"), F.asc("neighbor_id"))
    return (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", d2.alias("l2_sq"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivfpq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_clusters: int = 8,
    n_probe: int = 2,
    m: int = 8,
    pq_k: int = 16,
    refine: int = 10,
    kmeans_iterations: int = 3,
) -> DataFrame:
    """IVF + PQ approximate top-k with exact refinement — the composed
    100 TB ANN path (the faiss ``IVFPQ`` + ``RefineFlat`` layout,
    residual-encoded exactly as faiss does: PQ quantizes ``v − c_cell``,
    whose magnitudes are far smaller than raw vectors, so the same
    codebook budget resolves inter-neighbor distances — raw-vector PQ
    measured recall 0.56 against a 0.86 probe ceiling on this corpus;
    residuals close that gap).

    1. coarse: k-means cells (deterministic, sample-trained); each query
       probes its ``n_probe`` nearest cells — candidate generation is an
       equi-join on the cell id, never a full scan.
    2. encode: one shared pq_k-centroid codebook per subspace, trained
       driver-side on the sample's RESIDUALS (numpy); corpus codes come
       from ONE distributed Arrow pass (see _encode — residual subtraction
       and argmin in the numpy batch kernel; nothing wider than
       (id, cluster, codes) ever persists).
    3. PQ scan: per probed (query, cell) row an m×pq_k asymmetric-
       distance table over the QUERY residual for that cell (named
       columns), summed via ``element_at`` per candidate code —
       |q_res − book[code]|² ≈ |q − v|² since both sides share the cell
       centroid. Candidates' raw vectors stay out of this join: only
       (id, cluster, m codes) rows shuffle.
    4. refine: the top ``k*refine`` shortlist joins raw vectors back by
       id and exact squared L2 re-ranks to the final k.

    ``refine`` defaults deep (10): this corpus's distances CONCENTRATE
    (rank-5 ≈ 1.41 vs median ≈ 1.97 for a typical query — near-random
    high-dim data), so inter-rank margins sit below PQ quantization
    error and a shallow shortlist caps recall (refine=4 → 0.64 vs the
    0.86 probe ceiling; refine=10 reaches the ceiling). On genuinely
    clustered embeddings the same codebooks filter far harder — depth
    is the honest knob for concentration, exactly as in faiss.

    With ``n_probe == n_clusters`` and ``refine`` covering the corpus this
    degrades to exact :func:`l2_topk` (tested).
    """
    import numpy as np
    from pyspark.sql.window import Window as W

    from clinical_api_etl_spark.operators.clustering import (
        assign_cells,
        collect_sample,
    )
    from clinical_api_etl_spark.operators.similarity import _parallel, _prep

    # --- ONE sample collect feeds both models (coarse cells + residual
    # codebooks); numpy throughout (the pure-Python residual/argmin loops
    # were ~2s of interpreter time at an 8k×64 sample).
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    pts = _parallel(corpus.select(F.col(id_col).alias("id"), v.alias("v")))
    sample = collect_sample(pts, 8192)
    if len(sample) < max(n_clusters, pq_k):
        raise ValueError(
            f"corpus sample ({len(sample)}) smaller than n_clusters/pq_k"
        )
    # Corpus size for shortlist scaling — free when the sample wasn't
    # capped, one cheap count over the repartitioned scan otherwise.
    n_corpus = len(sample) if len(sample) < 8192 else pts.count()
    dim = len(sample[0])
    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    dsub = dim // m

    coarse = _lloyd(sample, n_clusters, kmeans_iterations)
    assign = assign_cells(pts, coarse)

    P = np.asarray(sample, dtype=np.float64)
    C = np.asarray(coarse, dtype=np.float64)
    cell = ((P[:, None, :] - C[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
    residuals = P - C[cell]
    books = [
        _lloyd(
            [list(r) for r in residuals[:, s * dsub : (s + 1) * dsub]],
            pq_k,
            kmeans_iterations,
        )
        for s in range(m)
    ]

    # --- encode the corpus: one distributed Arrow pass — the residual
    # subtraction AND the per-subspace argmin happen inside the numpy
    # batch kernel (see _encode), so no intermediate residual table ever
    # materializes. Only the narrow (id, cluster, m codes) rows persist.
    with_cell = pts.join(assign.select(F.col("id"), "cluster"), "id")
    cand = (
        _encode(with_cell, books, coarse=coarse)
        .withColumnRenamed("id", "neighbor_id")
        .persist()
    )
    # Materialize now: downstream joins (PQ scan, refine) then plan against
    # known (tiny) statistics instead of an unestimated Arrow stage.
    cand.count()

    q = _prep(queries, id_col, vec_col, "query_id", "q_vec")
    coarse_d = F.transform(
        F.lit(coarse),
        lambda cent, ci: F.struct(
            F.aggregate(
                F.zip_with(F.col("q_vec"), cent, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("dist"),
            ci.cast("long").alias("cluster"),
        ),
    )
    # Query residual per probed cell, then per-row asymmetric-distance
    # tables _adt{s}[c] = |q_res_sub - book[s][c]|² as named columns so
    # the candidate-scoring element_at lookups never re-inline the fold
    # (no-HOF-CSE rule).
    # NB: transform lambdas MUST stay single-argument — PySpark calls a
    # two-arg lambda as (element, index), so a `_s=s` default would bind
    # the CENTROID INDEX, silently slicing a different subspace per
    # centroid (caught by the recall gate at 0.1 vs the 0.86 probe
    # ceiling); a def-closure pins the subspace correctly.
    def _adt(s: int) -> F.Column:
        return F.transform(
            F.lit(books[s]),
            lambda cent: F.aggregate(
                F.zip_with(
                    F.slice(F.col("q_res"), s * dsub + 1, dsub),
                    cent,
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )

    probed = (
        q.select(
            "query_id",
            "q_vec",
            F.explode(
                F.transform(
                    F.slice(F.array_sort(coarse_d), 1, n_probe),
                    lambda s: s["cluster"],
                )
            ).alias("cluster"),
        )
        .withColumn(
            "q_res",
            F.zip_with(
                "q_vec",
                F.element_at(F.lit(coarse), F.col("cluster").cast("int") + 1),
                lambda a, b: a - b,
            ),
        )
        .select(
            "query_id",
            "q_vec",
            "cluster",
            *[_adt(s).alias(f"_adt{s}") for s in range(m)],
        )
    )

    approx_terms = [
        F.element_at(f"_adt{s}", F.col("codes").getItem(s).cast("int") + 1)
        for s in range(m)
    ]
    approx = sum(approx_terms[1:], approx_terms[0])
    # Shortlist depth scales with the corpus: a FIXED depth caps recall as
    # N grows (at 10× the corpus the same 50-row shortlist must filter
    # 10× harder through concentration noise — measured recall fell from
    # 0.86 to 0.64). 15% of the corpus was measured (numpy simulation +
    # live runs at sf0.1) as the depth where the PQ shortlist reaches the
    # probe ceiling on this CONCENTRATED corpus — near-random vectors,
    # inter-rank margins below PQ quantization error, so PQ can only
    # filter ~6× here; on genuinely clustered embeddings the same
    # codebooks filter far harder. Still 6.7× less exact-rerank work than
    # brute force, and the honest knob for concentration (as in faiss).
    shortlist_n = max(k * refine, -(-n_corpus * 15 // 100))
    w_short = W.partitionBy("query_id").orderBy(
        F.asc("approx_sq"), F.asc("neighbor_id")
    )
    shortlist = (
        probed.join(cand, "cluster")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "q_vec", "neighbor_id", approx.alias("approx_sq"))
        .withColumn("_r", F.row_number().over(w_short))
        .filter(F.col("_r") <= shortlist_n)
        .drop("_r")
    )

    raw = _prep(corpus, id_col, vec_col, "neighbor_id", "c_vec")
    d2 = (
        F.aggregate(
            F.zip_with(F.col("q_vec"), F.col("c_vec"), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    w = W.partitionBy("query_id").orderBy(F.asc("l2_sq"), F.asc("neighbor_id"))
    return (
        shortlist.join(raw.select("neighbor_id", "c_vec"), "neighbor_id")
        .select("query_id", "neighbor_id", d2.alias("l2_sq"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
