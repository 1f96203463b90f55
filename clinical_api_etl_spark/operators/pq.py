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

Encode-expression shape (the no-HOF-CSE rule, CLAUDE.md): per subspace
the k distance scores are ONE named array column ``_d{s}``; the code
(``array_position``/``array_min``) and the reconstruction error both
reference that alias, never re-inline the k×dsub multiply-add chain.
The result is persisted — (id, m codes, err) rows — so downstream
consumers never re-fuse the generated expression (fresh janino compile
per distinct plan shape otherwise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clinical_api_etl_spark.operators.clustering import _lloyd


def _score_col_names(m: int, k: int) -> list[list[str]]:
    return [[f"_s{s}_{c}" for c in range(k)] for s in range(m)]


def _score_cols(
    books: list[list[list[float]]], vec: str, dsub: int
) -> list[F.Column]:
    """Per-(subspace, centroid) scalar score columns ``_s{s}_{c}`` =
    |vec_sub − c|² minus the shared |vec_sub|² term (argmin unchanged).

    ONE SCALAR COLUMN PER CENTROID is a codegen shape constraint, not
    style: packing a subspace's k scores into a single array expression
    (×m subspaces) built a >64 KB codegen node — janino's method limit
    killed the stage and Spark silently fell back to interpreted Volcano
    after paying the failed compile (ERROR CodeGenerator in the logs was
    the only symptom; results stayed correct). Small top-level scalar
    expressions let codegen split them across methods; the argmin then
    reads the named columns in a later projection.
    """
    cols = []
    for s, book in enumerate(books):
        lo = s * dsub
        for ci, cent in enumerate(book):
            dot_terms = " + ".join(
                f"({c!r})*element_at({vec},{lo + d + 1})"
                for d, c in enumerate(cent)
            )
            cols.append(
                F.expr(f"({sum(c * c for c in cent)!r} - 2.0*({dot_terms}))")
                .alias(f"_s{s}_{ci}")
            )
    return cols


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

    # Distance scores per subspace as literal multiply-add chains:
    # |v_sub - c|² == |c|² - 2⟨v_sub,c⟩ + |v_sub|².  The |v_sub|² term is
    # shared by all k scores of the subspace, so scores drop it (argmin
    # unchanged) and the error adds it back once per subspace. One scalar
    # column per centroid (see _score_cols — janino 64 KB constraint).
    vsub_sq = [
        F.expr(
            " + ".join(
                f"element_at(v,{s * dsub + d + 1})*element_at(v,{s * dsub + d + 1})"
                for d in range(dsub)
            )
        )
        for s in range(m)
    ]
    staged = pts.select(
        "id",
        *_score_cols(codebooks, "v", dsub),
        sum(vsub_sq[1:], vsub_sq[0]).alias("_vsq"),
    )
    names = _score_col_names(m, k)
    subs = [F.array(*names[s]) for s in range(m)]
    codes = F.array(
        *[
            (F.array_position(subs[s], F.array_min(subs[s])) - 1).cast("int")
            for s in range(m)
        ]
    )
    err_terms = [F.array_min(subs[s]) for s in range(m)]
    recon_err = sum(err_terms[1:], err_terms[0]) + F.col("_vsq")
    out = staged.select(
        "id", codes.alias("codes"), recon_err.alias("recon_err")
    ).persist()
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
       from one narrow projection over a briefly-persisted residual
       table, one scalar score column per centroid (see _score_cols —
       both are janino 64 KB codegen constraints, measured not guessed).
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

    # --- encode the corpus: residual as a PERSISTED table, then the same
    # literal-chain argmin as pq_fit (scores drop the shared |r_sub|²).
    # The persist is a codegen requirement, not a cache nicety: fused with
    # the join+zip_with, the m×pq_k score arrays blow janino's 64 KB
    # method limit and the whole encode stage fell back to interpreted
    # Volcano; scored over the materialized scan every expression
    # compiles. (Unpersisted right after `cand` materializes below.)
    with_cell = (
        pts.join(assign.select(F.col("id"), "cluster"), "id")
        .withColumn(
            "r",
            F.zip_with(
                "v",
                F.element_at(F.lit(coarse), F.col("cluster").cast("int") + 1),
                lambda a, b: a - b,
            ),
        )
        .select("id", "cluster", "r")
        .persist()
    )
    staged = with_cell.select("id", "cluster", *_score_cols(books, "r", dsub))
    names = _score_col_names(m, pq_k)
    subs = [F.array(*names[s]) for s in range(m)]
    codes = F.array(
        *[
            (F.array_position(subs[s], F.array_min(subs[s])) - 1).cast("int")
            for s in range(m)
        ]
    )
    cand = staged.select(
        F.col("id").alias("neighbor_id"), "cluster", codes.alias("codes")
    ).persist()
    cand.count()  # materialize codes now so the residual table can go
    with_cell.unpersist()

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
