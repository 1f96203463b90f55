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
    # unchanged) and the error adds it back once per subspace.
    first = pts.select("id", "v")
    score_cols = {}
    vsub_sq = []
    for s, book in enumerate(codebooks):
        lo = s * dsub
        scores = []
        for cent in book:
            dot = " + ".join(
                f"({c!r})*element_at(v,{lo + d + 1})" for d, c in enumerate(cent)
            )
            scores.append(f"({sum(c * c for c in cent)!r} - 2.0*({dot}))")
        score_cols[f"_d{s}"] = F.expr(f"array({', '.join(scores)})")
        vsub_sq.append(
            F.expr(
                " + ".join(
                    f"element_at(v,{lo + d + 1})*element_at(v,{lo + d + 1})"
                    for d in range(dsub)
                )
            )
        )
    staged = first.select(
        "id",
        *[c.alias(n) for n, c in score_cols.items()],
        sum(vsub_sq[1:], vsub_sq[0]).alias("_vsq"),
    )
    codes = F.array(
        *[
            (F.array_position(f"_d{s}", F.array_min(f"_d{s}")) - 1).cast("int")
            for s in range(m)
        ]
    )
    err_terms = [F.array_min(f"_d{s}") for s in range(m)]
    recon_err = sum(err_terms[1:], err_terms[0]) + F.col("_vsq")
    out = staged.select(
        "id", codes.alias("codes"), recon_err.alias("recon_err")
    ).persist()
    return out, codebooks
