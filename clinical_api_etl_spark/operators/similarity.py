"""Similarity search over embedding columns. [EXT]

Two paths:

* ``cosine_topk`` — exact brute-force: query⨯corpus join + per-query top-k
  window. Correctness baseline; O(Q·N) — fine when Q is small (the query
  set broadcasts) even at large N.
* ``lsh_topk`` — random-hyperplane LSH: sign-bit signatures, candidates
  from shared band buckets, exact cosine re-rank of candidates only. The
  scale path: candidate generation is a bucket equi-join (shuffle on the
  bucket key), never a cross join. Hyperplanes are derived deterministically
  from ``xxhash64`` so results are reproducible (no RNG state).

Everything is expression-level (zip_with/aggregate folds in DOUBLE); the
embedding arrays never leave the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from clinical_api_etl_spark.functions.vectors import as_double, dot, norm


def _prep(
    df: DataFrame, id_col: str, vec_col: str, id_alias: str, vec_alias: str
) -> DataFrame:
    """(id, vector-as-double, norm) — cast and norm hoisted to once per row.

    Computing the norm per *pair* inside the similarity join would redo the
    same fold |corpus| times per vector; hoisting it is bit-identical
    (same left fold over the same doubles) and turns the pair-level work
    into a single dot product + one multiply.
    """
    v = as_double(F.col(vec_col))
    return df.select(
        F.col(id_col).alias(id_alias),
        v.alias(vec_alias),
        norm(v).alias(f"{vec_alias}_norm"),
    )


def _parallel(df: DataFrame) -> DataFrame:
    """Spread the streamed side of a nested-loop/broadcast join: embedding
    tables often arrive as one file → one partition, which would serialize
    the entire similarity scan."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors per query (self excluded).

    Output: (query_id, neighbor_id, cos_sim, rank) — rank 1..k with vec-id
    tie-break, so results are totally ordered and oracle-comparable.
    """
    q = _prep(queries, id_col, vec_col, "query_id", "q_vec")
    c = _parallel(_prep(corpus, id_col, vec_col, "neighbor_id", "c_vec"))
    sim = dot(F.col("q_vec"), F.col("c_vec")) / (
        F.col("q_vec_norm") * F.col("c_vec_norm")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _signature(vec_col: str, num_planes: int, dim: int):
    """Sign-bit signature against ``num_planes`` pseudo-random hyperplanes.

    Plane p, dimension d has component ±1 chosen by bit 0 of
    ``xxhash64(p * dim + d)`` — deterministic, identical on every executor,
    and never materialized (folded into the projection).
    """
    v = as_double(F.col(vec_col))

    # NB: `lambda d, p=p:` would be an ARITY-2 lambda — pyspark passes
    # the element INDEX as `p`, so p*dim collapsed to d*dim and every
    # "plane" was the SAME plane (all signature bits equal; LSH became a
    # 2-bucket hash). Single-arity closure keeps the plane offset a real
    # python constant.
    def _comp(off: int):
        return lambda d: F.when(
            F.xxhash64(d + F.lit(off)).bitwiseAND(F.lit(1)) == 1, F.lit(1.0)
        ).otherwise(F.lit(-1.0))

    bits = []
    for p in range(num_planes):
        comp = F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)), _comp(p * dim)
        )
        proj = F.aggregate(
            F.zip_with(v, comp, lambda x, c: x * c), F.lit(0.0), lambda a, x: a + x
        )
        bits.append(F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0)).alias(f"b{p}"))
    return bits


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    num_planes: int = 16,
    bands: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: hyperplane-LSH candidates + exact cosine re-rank.

    A candidate must share at least one of ``bands`` signature bands with
    the query. Recall < 1 by design; the trade is candidate-set size vs the
    brute-force scan. This corpus's 64-dim distances concentrate, so the
    default banding is SHALLOW (8 bands × 2 bits — each band splits the
    corpus only 4 ways) to keep recall high; separable corpora should
    deepen the bands (bands=4 → 4-bit buckets) for smaller candidate
    sets. Same output shape as :func:`cosine_topk`.
    """
    rows = num_planes // bands
    bits = _signature(vec_col, num_planes, dim)

    def with_bands(df: DataFrame, idn: str, vecn: str) -> DataFrame:
        sig = df.select(
            F.col(id_col).alias(idn), F.col(vec_col).alias(vecn), *bits
        )
        band_arr = F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.concat_ws(
                        "", *[F.col(f"b{b * rows + r}") for r in range(rows)]
                    ).alias("bucket"),
                )
                for b in range(bands)
            ]
        )
        return sig.select(idn, vecn, F.explode(band_arr).alias("bb")).select(
            idn, vecn, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
        )

    qb = with_bands(queries, "query_id", "q_vec")
    cb = with_bands(_parallel(corpus), "neighbor_id", "c_vec")
    candidates = (
        cb.join(F.broadcast(qb), ["band", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    qv, cv = as_double(F.col("q_vec")), as_double(F.col("c_vec"))
    sim = dot(qv, cv) / (norm(qv) * norm(cv))
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        candidates.select("query_id", "neighbor_id", sim.alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def embedding_near_duplicates(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (id_a < id_b, cos ≥ threshold).

    Brute-force pair generation here (exact, oracle-comparable); the LSH
    bucket pre-filter above is the scale path for the same predicate.
    """
    a = _parallel(_prep(df, id_col, vec_col, "id_a", "v_a"))
    b = _prep(df, id_col, vec_col, "id_b", "v_b")
    sim = dot(F.col("v_a"), F.col("v_b")) / (F.col("v_a_norm") * F.col("v_b_norm"))
    return (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", sim.alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def semantic_near_duplicates(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_clusters: int = 8,
    kmeans_iterations: int = 3,
) -> DataFrame:
    """SemDeDup-style semantic near-dup pairs: pairwise cosine restricted to
    k-means cells (Abbas et al. 2023, "SemDeDup" — cluster, then compare
    only within clusters).

    Same predicate as :func:`embedding_near_duplicates` but the pair scan
    is an equi-join on the cluster id — O(Σ|cell|²) instead of O(N²). By
    construction the result is a SUBSET of the exact pairs (the similarity
    expression is identical; only cross-cell pairs can be missed — and
    near-dups land in the same cell, which is the premise of the method).
    At 100 TB: ``n_clusters`` scales with corpus size so cells stay
    bounded (√N cells keeps the per-cell quadratic term ≈ corpus-linear);
    the cell id is the shuffle key, so no all-pairs stage ever exists.
    """
    from clinical_api_etl_spark.operators.clustering import kmeans_fit

    assign, _ = kmeans_fit(
        df, id_col=id_col, vec_col=vec_col, k=n_clusters,
        iterations=kmeans_iterations,
    )
    a = (
        _parallel(_prep(df, id_col, vec_col, "id_a", "v_a"))
        .join(assign.select(F.col("id").alias("id_a"), "cluster"), "id_a")
    )
    b = a.select(
        F.col("id_a").alias("id_b"),
        F.col("v_a").alias("v_b"),
        F.col("v_a_norm").alias("v_b_norm"),
        "cluster",
    )
    sim = dot(F.col("v_a"), F.col("v_b")) / (F.col("v_a_norm") * F.col("v_b_norm"))
    return (
        a.join(b, "cluster")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", sim.alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_clusters: int = 8,
    n_probe: int = 2,
    kmeans_iterations: int = 3,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: k-means-partition the corpus,
    probe only each query's ``n_probe`` nearest cells, exact cosine re-rank
    inside them.

    The 100 TB ANN path alongside :func:`lsh_topk`: the corpus is scanned
    once to build cells (``operators/clustering.kmeans_fit`` — itself
    deterministic), and each query touches ~``n_probe/n_clusters`` of the
    corpus via an equi-join on the cell id — never a full scan, never a
    cross join. With ``n_probe == n_clusters`` the candidate set is the
    whole corpus and the result equals :func:`cosine_topk` exactly (the
    recall knob degrades gracefully to brute force — tested).
    """
    from clinical_api_etl_spark.operators.clustering import kmeans_fit

    assign, centroids = kmeans_fit(
        corpus, id_col=id_col, vec_col=vec_col, k=n_clusters,
        iterations=kmeans_iterations,
    )
    return ivf_probe(
        queries, corpus, assign, centroids,
        id_col=id_col, vec_col=vec_col, k=k, n_probe=n_probe,
    )


def ivf_probe(
    queries: DataFrame,
    corpus: DataFrame,
    assign: DataFrame,
    centroids: list[list[float]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_probe: int = 2,
) -> DataFrame:
    """The probe half of :func:`ivf_topk` over a PRE-ASSIGNED corpus:
    ``assign`` is an (id, cluster) frame and ``centroids`` the trained
    coarse model. Shared by the batch build and the streaming index MV
    (streaming/annindex.py), which maintains the assignment table
    incrementally under a once-trained model — the faiss posture, where
    the coarse quantizer is fixed and adds stream in."""
    c = _prep(corpus, id_col, vec_col, "neighbor_id", "c_vec").join(
        assign.select(F.col("id").alias("neighbor_id"), "cluster"), "neighbor_id"
    )

    q = _prep(queries, id_col, vec_col, "query_id", "q_vec")
    # n_probe nearest cells per query: distances to the centroid matrix
    # (ONE 2-D array literal — k×dim separate lit nodes made plan analysis
    # the dominant cost), sorted (dist, cluster) structs, slice, explode.
    dists = F.transform(
        F.lit(centroids),
        lambda cent, ci: F.struct(
            F.aggregate(
                F.zip_with(F.col("q_vec"), cent, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("dist"),
            ci.cast("long").alias("cluster"),
        ),
    )
    probed = q.withColumn(
        "cluster",
        F.explode(
            F.transform(
                F.slice(F.array_sort(dists), 1, n_probe), lambda s: s["cluster"]
            )
        ),
    )

    sim = dot(F.col("q_vec"), F.col("c_vec")) / (
        F.col("q_vec_norm") * F.col("c_vec_norm")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        probed.join(c, "cluster")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
