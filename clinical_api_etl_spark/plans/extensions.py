"""[EXT] LLM-data-pipeline operators as declared queries over
``documents`` / ``embeddings``: dedup (exact, n-gram Jaccard, MinHash+LSH,
SimHash, embedding-cosine), similarity search (brute-force + hyperplane
LSH), text analysis (language-ID, quality, token stats, fingerprints), and
multimodal binary plumbing.

Oracle discipline: algorithms that are exactly SQL-expressible carry a
DuckDB oracle (including bit-identical cosine via ``list_reduce`` —
DuckDB's ``sum()`` uses blocked summation and can NOT be used for float
folds). Sketch/LSH candidate generators are rows-only checks, but each is
verified *in tests* against its exact counterpart (LSH output ⊆ exact
output).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clinical_api_etl_spark.functions.text import EN_STOPWORDS
from clinical_api_etl_spark.plans.base import QuerySet
from clinical_api_etl_spark.sources.catalog import load

QS = QuerySet()

# ---------------------------------------------------------------------------
# Shared DuckDB fragments (must mirror functions/text.py + vectors.py).
# ---------------------------------------------------------------------------

_TOKS = r"regexp_split_to_array(lower(trim(text)), '\s+')"
_STOPS = ", ".join(f"'{w}'" for w in EN_STOPWORDS)


def _shingles_sql(n: int) -> str:
    return (
        f"list_distinct(list_transform(range(1, greatest(len(t)-{n - 1},1)+1),"
        f" i -> array_to_string(t[i:i+{n - 1}], ' ')))"
    )


#: Sequential left-fold dot/norm — matches Spark's aggregate() fold exactly.
def _fold_dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(range(1, len({a})+1), i -> {a}[i]*{b}[i]),"
        f" (x,y) -> x+y)"
    )


def _fold_norm(a: str) -> str:
    return f"sqrt(list_reduce(list_transform({a}, x -> x*x), (x,y) -> x+y))"


def _cosine_sql(a: str, b: str) -> str:
    return f"{_fold_dot(a, b)} / ({_fold_norm(a)} * {_fold_norm(b)})"


# ---------------------------------------------------------------------------
# Deduplication family.
# ---------------------------------------------------------------------------


@QS.add(
    "dedup_exact_groups",
    """
    SELECT md5(text) AS digest,
           MIN(doc_id) AS survivor_id,
           COUNT(*) AS n_members
    FROM documents GROUP BY md5(text)
    """,
    doc="[EXT] exact dedup: hash-groupBy on the content digest; survivor = "
    "min id per group. One shuffle on the digest — the O(N) baseline.",
    headline=True,
    tags=("dedup",),
)
def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.md5("text").alias("digest"))
        .groupBy("digest")
        .agg(
            F.min("doc_id").alias("survivor_id"),
            F.count(F.lit(1)).cast("long").alias("n_members"),
        )
    )


_JACCARD_ORACLE = f"""
    WITH sh AS (
      SELECT doc_id, {_shingles_sql(3)} AS shingles
      FROM (SELECT doc_id, {_TOKS} AS t FROM documents)
    ),
    e AS (SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS shingle FROM sh),
    p AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common,
             MIN(a.n_sh) AS n_a, MIN(b.n_sh) AS n_b
      FROM e a JOIN e b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b,
           CAST(n_common AS DOUBLE) / CAST(n_a + n_b - n_common AS DOUBLE) AS jaccard
    FROM p
    WHERE CAST(n_common AS DOUBLE) / CAST(n_a + n_b - n_common AS DOUBLE) >= 0.8
"""


@QS.add(
    "dedup_ngram_jaccard",
    _JACCARD_ORACLE,
    doc="[EXT] exact 3-gram Jaccard near-dup pairs (threshold 0.8): shingle "
    "explode + self-equi-join on the shingle — work scales with shared-"
    "shingle bucket sizes, never N².",
    headline=True,
    tags=("dedup",),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.dedup import ngram_jaccard_pairs

    docs = load(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.8)


@QS.add(
    "dedup_minhash_lsh",
    None,  # LSH candidate recall is probabilistic-by-design → rows-only;
    # tests verify output ⊆ exact ngram_jaccard result.
    doc="[EXT] MinHash(32)+LSH(8×4) near-dup pairs verified by exact "
    "Jaccard — the sub-quadratic scale path for the 0.8-threshold dedup.",
    headline=True,
    tags=("dedup", "approx"),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.dedup import minhash_lsh_pairs

    docs = load(spark, sf_dir, "documents")
    return minhash_lsh_pairs(docs, "doc_id", "text", n=3, threshold=0.8)


@QS.add(
    "dedup_simhash",
    None,  # 64-bit fingerprint is hash-family-specific → rows-only.
    doc="[EXT] SimHash-64 near-dup pairs (Hamming ≤ 3) via 4×16-bit band "
    "buckets + popcount verify.",
    headline=True,
    tags=("dedup", "approx"),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.dedup import simhash_pairs

    docs = load(spark, sf_dir, "documents")
    return simhash_pairs(docs, "doc_id", "text", max_hamming=3)


@QS.add(
    "dedup_minhash_gate",
    "SELECT TRUE AS subset_ok, 0.9 AS recall_floor, TRUE AS met",
    doc="[EXT] hash-checked invariants for dedup_minhash_lsh vs the exact "
    "ngram_jaccard result: the verified-candidate output must be a subset "
    "of the exact pairs (LSH can only miss, never invent) and recall must "
    "stay ≥ 0.9 (re-measured 1.0 at sf0.001/0.01/0.1 on 2026-08-15 — the "
    "corpus's dup clusters are near-identical, so every band agrees).",
    tags=("dedup", "approx", "gate"),
)
def dedup_minhash_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )

    docs = load(spark, sf_dir, "documents")
    exact = ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.8).select(
        "id_a", "id_b"
    )
    mh = minhash_lsh_pairs(docs, "doc_id", "text", n=3, threshold=0.8).select(
        "id_a", "id_b"
    )
    both = mh.withColumn("m", F.lit(1)).join(
        exact.withColumn("e", F.lit(1)), ["id_a", "id_b"], "full_outer"
    )
    return both.agg(
        F.sum(F.when(F.col("e").isNull(), 1).otherwise(0)).alias("_false_pos"),
        F.sum(F.coalesce("e", F.lit(0))).alias("_n_exact"),
        F.sum(F.when(F.col("e").isNotNull() & F.col("m").isNotNull(), 1).otherwise(0)).alias("_hits"),
    ).select(
        (F.col("_false_pos") == 0).alias("subset_ok"),
        F.lit(0.9).alias("recall_floor"),
        (F.col("_hits") / F.greatest(F.col("_n_exact"), F.lit(1)) >= 0.9).alias("met"),
    )


@QS.add(
    "dedup_embedding_cosine",
    f"""
    WITH v AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
               FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           {_cosine_sql('a.e', 'b.e')} AS cos_sim
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE {_cosine_sql('a.e', 'b.e')} >= 0.4
    """,
    doc="[EXT] embedding-cosine near-dup pairs (threshold calibrated to "
    "this corpus's similarity mass at 0.4). Exact pair scan as the "
    "correctness baseline; ann_lsh_topk is the bucketed scale path.",
    tags=("dedup", "similarity"),
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.similarity import embedding_near_duplicates

    emb = load(spark, sf_dir, "embeddings")
    return embedding_near_duplicates(emb, threshold=0.4)


# ---------------------------------------------------------------------------
# Similarity search.
# ---------------------------------------------------------------------------


@QS.add(
    "ann_cosine_topk",
    f"""
    WITH v AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
               FROM embeddings),
    q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < 10),
    s AS (
      SELECT query_id, b.vec_id AS neighbor_id, {_cosine_sql('qe', 'b.e')} AS cos_sim
      FROM q CROSS JOIN v b WHERE b.vec_id <> query_id
    ),
    r AS (SELECT query_id, neighbor_id, cos_sim,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY cos_sim DESC, neighbor_id) AS rank
          FROM s)
    SELECT query_id, neighbor_id, cos_sim, CAST(rank AS BIGINT) AS rank
    FROM r WHERE rank <= 5
    """,
    doc="[EXT] exact brute-force cosine top-k (k=5, 10 query vectors): "
    "broadcast queries ⨯ corpus scan + per-query top-k window. Cosine is "
    "bit-deterministic (sequential double fold on both engines).",
    headline=True,
    tags=("similarity",),
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.similarity import cosine_topk

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return cosine_topk(queries, emb, k=5).withColumn(
        "rank", F.col("rank").cast("long")
    )


@QS.add(
    "ann_lsh_topk",
    None,  # LSH recall < 1 by design → rows-only; tests measure recall vs exact.
    doc="[EXT] hyperplane-LSH approximate top-k: 16 deterministic sign "
    "bits, 8×2-bit band buckets, exact cosine re-rank of candidates only.",
    headline=True,
    tags=("similarity", "approx"),
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.similarity import lsh_topk

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return lsh_topk(queries, emb, k=5).withColumn("rank", F.col("rank").cast("long"))


def _recall_gate(approx: DataFrame, exact: DataFrame, floor: float) -> DataFrame:
    """Scalar recall-vs-exact gate: one row (n_exact, recall_floor, met).

    Both inputs carry (query_id, neighbor_id). The approximate method is
    deterministic (fixed hyperplanes / deterministic k-means), so ``met``
    is stable run-to-run — a hash-checked oracle row turns the rows-only
    approximate query into a driver-enforced recall invariant: if a code
    change drops recall below the floor, the hash mismatches.
    """
    hits = approx.select("query_id", "neighbor_id").withColumn("hit", F.lit(1))
    return (
        exact.select("query_id", "neighbor_id")
        .join(hits, ["query_id", "neighbor_id"], "left")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_exact"),
            (F.sum(F.coalesce(F.col("hit"), F.lit(0))) / F.count(F.lit(1))).alias("_r"),
        )
        .select(
            "n_exact",
            F.lit(floor).alias("recall_floor"),
            (F.col("_r") >= floor).alias("met"),
        )
    )


@QS.add(
    "ann_lsh_recall_gate",
    "SELECT CAST(50 AS BIGINT) AS n_exact, 0.9 AS recall_floor, TRUE AS met",
    doc="[EXT] hash-checked recall floor for ann_lsh_topk: recall vs the "
    "exact brute-force top-k must stay ≥ 0.9 (measured 0.98/0.96/0.96 at "
    "sf0.001/0.01/0.1 on 2026-08-15 with real 8×2-bit banding; "
    "hyperplanes are deterministic so the gate is stable). Floor raised "
    "0.5→0.9 per VERDICT r07 task 1 — the vacuous 0.5 floor is what let "
    "the arity-2 hyperplane collapse survive twelve rounds. "
    "Converts the approximate query's rows-only status into a driver-"
    "enforced invariant.",
    tags=("similarity", "approx", "gate"),
)
def ann_lsh_recall_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.similarity import cosine_topk, lsh_topk

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return _recall_gate(
        lsh_topk(queries, emb, k=5), cosine_topk(queries, emb, k=5), 0.9
    )


@QS.add(
    "ann_hnsw_topk",
    None,  # graph-search recall < 1 by design → rows-only; gated below.
    doc="[EXT] graph-structured ANN (deterministic three-layer HNSW/NSW, "
    "operators/hnsw.py — the quantizer ladder's missing industry-default "
    "family, VERDICT r10 task 2): md5-geometric layer promotion (p=1/16 "
    "per level), exact M-NN links on bounded layers, corpus-proportional "
    "LSH sign-bit cells (~64 members each — cell COUNT grows, size "
    "doesn't, so every layer's pair scan stays layer-linear) on large "
    "ones, md5-min entry point, and fixed-round beam search (beam 16) "
    "with every query advancing concurrently — the beam side "
    "broadcasts, never the corpus-sized adjacency. Reported "
    "similarities are exact (full re-rank of visited nodes); recall is "
    "the only approximation.",
    headline=True,
    tags=("similarity", "approx"),
)
def ann_hnsw_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.hnsw import hnsw_topk

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return hnsw_topk(queries, emb, k=5).withColumn(
        "rank", F.col("rank").cast("long")
    )


@QS.add(
    "ann_hnsw_recall_gate",
    "SELECT CAST(50 AS BIGINT) AS n_exact, 0.8 AS recall_floor, TRUE AS met",
    doc="[EXT] hash-checked recall floor for ann_hnsw_topk: recall vs the "
    "exact brute-force top-k must stay >= 0.8 (the index build and beam "
    "trajectory are fully deterministic, so the gate is stable; "
    "tools/measure_recalls.py records the per-round measurements). "
    "Converts the approximate query's rows-only status into a "
    "driver-enforced invariant — the ann_lsh_recall_gate pattern.",
    tags=("similarity", "approx", "gate"),
)
def ann_hnsw_recall_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.hnsw import hnsw_topk
    from clinical_api_etl_spark.operators.similarity import cosine_topk

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return _recall_gate(
        hnsw_topk(queries, emb, k=5), cosine_topk(queries, emb, k=5), 0.8
    )


@QS.add(
    "dedup_semantic_pairs",
    None,
    doc="[EXT] SemDeDup (Abbas et al. 2023): near-dup pairs restricted to "
    "k-means cells — the cell id turns the O(N²) pair scan into an "
    "equi-join. Approximate by construction (cross-cell pairs missed), "
    "hence rows-only here; dedup_semantic_gate hash-checks subset + "
    "recall against the exact scan.",
    headline=True,
    tags=("dedup", "similarity", "approx"),
)
def dedup_semantic_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.similarity import semantic_near_duplicates

    emb = load(spark, sf_dir, "embeddings")
    return semantic_near_duplicates(emb, threshold=0.4, n_clusters=4)


@QS.add(
    "dedup_semantic_gate",
    "SELECT TRUE AS subset_ok, 0.4 AS recall_floor, TRUE AS met",
    doc="[EXT] hash-checked invariants for dedup_semantic_pairs: every "
    "reported pair must appear in the exact pair scan at the same "
    "threshold (subset — holds by construction, the gate proves the "
    "implementation), and recall vs exact must stay ≥ 0.4 (re-measured "
    "0.515/0.475/0.441 at sf0.001/0.01/0.1 on 2026-08-15 — slack 0.041, "
    "floor kept; deterministic k-means makes it stable). The "
    "corpus's similarity mass sits at cos≈0.4, so the gate runs at the "
    "calibrated threshold rather than the 0.95 production default.",
    tags=("dedup", "similarity", "gate"),
)
def dedup_semantic_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.similarity import (
        embedding_near_duplicates,
        semantic_near_duplicates,
    )

    emb = load(spark, sf_dir, "embeddings")
    sem = (
        semantic_near_duplicates(emb, threshold=0.4, n_clusters=4)
        .select("id_a", "id_b")
        .withColumn("in_sem", F.lit(1))
    )
    exact = (
        embedding_near_duplicates(emb, threshold=0.4)
        .select("id_a", "id_b")
        .withColumn("in_exact", F.lit(1))
    )
    both = sem.join(exact, ["id_a", "id_b"], "full_outer")
    return both.agg(
        (
            F.sum(F.when(F.col("in_exact").isNull(), 1).otherwise(0)) == 0
        ).alias("subset_ok"),
        (
            F.sum(F.coalesce("in_sem", F.lit(0))) / F.sum(F.coalesce("in_exact", F.lit(0)))
        ).alias("_r"),
    ).select(
        "subset_ok",
        F.lit(0.4).alias("recall_floor"),
        (F.col("_r") >= 0.4).alias("met"),
    )


@QS.add(
    "ann_ivf_recall_gate",
    "SELECT CAST(50 AS BIGINT) AS n_exact, 0.75 AS recall_floor, TRUE AS met",
    doc="[EXT] hash-checked recall floor for ann_ivf_topk: recall vs the "
    "exact brute-force top-k must stay ≥ 0.75 (re-measured 0.86/0.86/0.80 "
    "at sf0.001/0.01/0.1 on 2026-08-15 — slack ≤ 0.11, floor kept; "
    "k-means init is deterministic so the gate is stable).",
    tags=("similarity", "approx", "gate"),
)
def ann_ivf_recall_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.similarity import cosine_topk, ivf_topk

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return _recall_gate(
        ivf_topk(queries, emb, k=5, n_clusters=8, n_probe=2),
        cosine_topk(queries, emb, k=5),
        0.75,
    )


# ---------------------------------------------------------------------------
# Text analysis.
# ---------------------------------------------------------------------------

_STOP_RATIO = (
    f"len(list_filter({_TOKS}, x -> x IN ({_STOPS})))::DOUBLE"
    f" / len({_TOKS})::DOUBLE"
)


@QS.add(
    "text_language_id",
    f"""
    SELECT lang,
           CASE WHEN {_STOP_RATIO} >= 0.05 THEN 'en' ELSE 'und' END AS predicted_lang,
           COUNT(*) AS cnt
    FROM documents
    GROUP BY lang, CASE WHEN {_STOP_RATIO} >= 0.05 THEN 'en' ELSE 'und' END
    """,
    doc="[EXT] language-ID heuristic (stopword density ≥ 0.05 → 'en') "
    "cross-tabulated against the labeled lang column.",
    tags=("text",),
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.textstats import language_id

    docs = load(spark, sf_dir, "documents")
    return (
        language_id(docs)
        .groupBy("lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@QS.add(
    "text_quality_scores",
    f"""
    SELECT doc_id,
           0.5 * ({_STOP_RATIO})
           + 0.3 * least(length(text)::DOUBLE / 400.0, 1.0)
           + 0.2 * (len(list_distinct({_TOKS}))::DOUBLE / len({_TOKS})::DOUBLE)
             AS quality
    FROM documents
    """,
    doc="[EXT] per-document quality score: 0.5·stopword-density + "
    "0.3·length-credit + 0.2·lexical-diversity, fixed evaluation order so "
    "both engines produce bit-identical doubles.",
    tags=("text",),
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.functions.text import quality_score

    docs = load(spark, sf_dir, "documents")
    return docs.select("doc_id", quality_score(F.col("text")).alias("quality"))


@QS.add(
    "text_token_stats",
    f"""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(len({_TOKS})) AS BIGINT) AS total_tokens,
           CAST(SUM(len(list_distinct({_TOKS}))) AS BIGINT) AS total_distinct_tokens,
           CAST(MAX(len({_TOKS})) AS BIGINT) AS max_tokens
    FROM documents GROUP BY source
    """,
    doc="[EXT] token counting (whitespace tokenizer) rolled up by source.",
    tags=("text",),
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.functions.text import distinct_token_count, token_count

    docs = load(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(F.col("text"))).cast("long").alias("total_tokens"),
        F.sum(distinct_token_count(F.col("text")))
        .cast("long")
        .alias("total_distinct_tokens"),
        F.max(token_count(F.col("text"))).cast("long").alias("max_tokens"),
    )


@QS.add(
    "text_fingerprints",
    f"""
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct({_TOKS})), ' ')) AS fingerprint
    FROM documents
    """,
    doc="[EXT] canonical-form fingerprint per document: md5 over the sorted "
    "distinct token set (order/duplication-insensitive identity).",
    tags=("text",),
)
def text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.textstats import fingerprints

    docs = load(spark, sf_dir, "documents")
    return fingerprints(docs)


# ---------------------------------------------------------------------------
# Multimodal plumbing.
# ---------------------------------------------------------------------------


@QS.add(
    "mm_binary_stats",
    """
    SELECT ['image','audio','video'][CAST(doc_id % 3 + 1 AS INTEGER)] AS kind,
           COUNT(*) AS n_items,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_distinct
    FROM documents
    GROUP BY ['image','audio','video'][CAST(doc_id % 3 + 1 AS INTEGER)]
    """,
    doc="[EXT] multimodal binary-column statistics: payload byte length + "
    "sha256 digest per media kind, entirely JVM-side (no decode).",
    tags=("multimodal",),
)
def mm_binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.multimodal import attach_media, binary_stats

    docs = load(spark, sf_dir, "documents")
    return binary_stats(attach_media(docs))


_SYNTH_IMG_HX = (
    "md5('im0:' || CAST(doc_id AS VARCHAR)) || md5('im1:' || CAST(doc_id AS VARCHAR))"
    " || md5('im2:' || CAST(doc_id AS VARCHAR)) || md5('im3:' || CAST(doc_id AS VARCHAR))"
)


@QS.add(
    "mm_decode_features",
    f"""
    WITH img AS (SELECT doc_id, {_SYNTH_IMG_HX} AS hx FROM documents),
    px AS (
      SELECT doc_id,
             CAST('0x' || substr(hx, CAST(i * 2 + 1 AS INTEGER), 2) AS INTEGER) AS v
      FROM img, range(64) t(i)
    )
    SELECT doc_id, CAST(v // 32 AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS cnt, CAST(SUM(v) AS BIGINT) AS px_sum
    FROM px GROUP BY doc_id, v // 32
    """,
    doc="[EXT] REAL image decode, fully value-hash-gated with no media "
    "library: synth_image's md5-derived 8x8 grayscale pixels are encoded "
    "into actual PNGs (zlib scanlines, all five filter types cycled, CRC'd "
    "chunks) and decoded back by a stdlib-zlib + unfilter Arrow kernel "
    "(operators/multimodal.py:png_decode_gray8); the intensity-histogram "
    "features (exact integer counts/sums per 32-wide bucket) are re-derived "
    "by DuckDB straight from the md5 bytes — any decode defect breaks the "
    "hash. Pillow, when present, stays the general-codec path "
    "(decode_media); the batch plumbing is identical.",
    tags=("multimodal", "udf"),
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.multimodal import (
        png_decode_images,
        png_encode_images,
        synth_image,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id")
    px = png_decode_images(png_encode_images(synth_image(docs)))
    vals = (
        px.select("doc_id", F.hex("pixels").alias("hx"))
        .select(
            "doc_id", "hx", F.explode(F.sequence(F.lit(0), F.lit(63))).alias("i")
        )
        .select(
            "doc_id",
            F.conv(F.expr("substring(hx, i*2+1, 2)"), 16, 10).cast("long").alias("v"),
        )
    )
    return vals.groupBy(
        "doc_id", F.expr("v div 32").cast("long").alias("bucket")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("v").cast("long").alias("px_sum"),
    )


@QS.add(
    "dedup_image_phash",
    f"""
    WITH img AS (
      SELECT doc_id,
             CASE WHEN doc_id % 16 <= 1 THEN doc_id - (doc_id % 16)
                  ELSE doc_id END AS bid,
             doc_id % 16 = 1 AS pert
      FROM documents
    ),
    hx AS (
      SELECT doc_id, pert,
             md5('im0:' || CAST(bid AS VARCHAR)) ||
             md5('im1:' || CAST(bid AS VARCHAR)) ||
             md5('im2:' || CAST(bid AS VARCHAR)) ||
             md5('im3:' || CAST(bid AS VARCHAR)) AS hx
      FROM img
    ),
    px AS (
      SELECT doc_id, i,
             CASE WHEN i = 0 AND pert
                  THEN (CAST('0x' || substr(hx, 1, 2) AS BIGINT) + 8) % 256
                  ELSE CAST('0x' || substr(hx, CAST(i * 2 + 1 AS INTEGER), 2)
                       AS BIGINT) END AS v
      FROM hx, range(64) t(i)
    ),
    sig AS (
      SELECT a.doc_id,
             CAST(COALESCE(SUM(
               CASE WHEN a.v < b.v
                    THEN CAST(1 AS BIGINT) << CAST((a.i // 8) * 7 + (a.i % 8)
                                                   AS INTEGER)
                    ELSE 0 END), 0) AS BIGINT) AS sig
      FROM px a JOIN px b ON b.doc_id = a.doc_id AND b.i = a.i + 1
      WHERE a.i % 8 < 7
      GROUP BY a.doc_id
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sig, b.sig)) <= 4
    """,
    doc="[EXT] cross-modal dedup: perceptual-hash (dHash) image "
    "near-duplicates, fully value-hash-gated through the REAL stdlib "
    "PNG codec (VERDICT r10 task 3). synth_image_planted plants a "
    "perturbed near-copy on every (16k, 16k+1) doc pair (pixel 0 +8 mod "
    "256; all other images md5-random at expected Hamming ~28/56); the "
    "Spark side PNG-encodes, PNG-decodes (zlib + all-five-filters "
    "unfilter), packs the 56-bit row-major difference hash into one "
    "BIGINT, generates candidates from 5 contiguous bit bands "
    "(pigeonhole-complete for Hamming ≤ 4 — the simhash machinery on a "
    "packed integer) and verifies with bit_count(xor). The oracle "
    "re-derives pixels straight from the md5 bytes and brute-forces the "
    "pair scan — any codec or banding defect breaks the hash.",
    tags=("multimodal", "dedup", "udf"),
    headline=True,
)
def dedup_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.multimodal import (
        image_dhash_pairs,
        png_decode_images,
        png_encode_images,
        synth_image_planted,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id")
    px = png_decode_images(png_encode_images(synth_image_planted(docs)))
    return image_dhash_pairs(px)


@QS.add(
    "mm_frame_sample",
    """
    SELECT doc_id, CAST(0 AS BIGINT) AS frame_ts_ms
    FROM documents WHERE doc_id % 3 = 2
    """,
    doc="[EXT] video frame-sampling lattice: one row per sampled frame "
    "timestamp from metadata (videos without duration → single frame 0).",
    tags=("multimodal",),
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.multimodal import attach_media, frame_sample

    docs = load(spark, sf_dir, "documents")
    return frame_sample(attach_media(docs))


_PAIRS_06_SQL = f"""
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM (SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS shingle
            FROM (SELECT doc_id, {_shingles_sql(3)} AS shingles
                  FROM (SELECT doc_id, {_TOKS} AS t FROM documents))) a
      JOIN (SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS shingle
            FROM (SELECT doc_id, {_shingles_sql(3)} AS shingles
                  FROM (SELECT doc_id, {_TOKS} AS t FROM documents))) b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id, a.n_sh, b.n_sh
      HAVING CAST(COUNT(*) AS DOUBLE) / CAST(a.n_sh + b.n_sh - COUNT(*) AS DOUBLE) >= 0.6
"""


@QS.add(
    "dedup_components",
    f"""
    WITH RECURSIVE pairs AS ({_PAIRS_06_SQL}),
    edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION ALL
      SELECT id_b, id_a FROM pairs
    ),
    verts AS (SELECT DISTINCT a AS id FROM edges),
    walk(id, label) AS (
      SELECT id, id FROM verts
      UNION
      SELECT e.a, w.label FROM walk w JOIN edges e ON w.id = e.b
      WHERE w.label < e.a
    )
    SELECT id AS doc_id, MIN(label) AS component FROM walk GROUP BY id
    """,
    doc="[EXT] duplicate-group formation: connected components over 0.6-"
    "threshold Jaccard pairs (A~B~C is one group even when A~C is below "
    "threshold). Spark: iterative min-label propagation with per-round "
    "localCheckpoint (operators/graph.py) — the one genuinely iterative "
    "algorithm in the engine; the oracle cross-checks it with a DuckDB "
    "recursive CTE, two completely different formulations of transitive "
    "closure.",
    tags=("dedup", "graph"),
)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.dedup import ngram_jaccard_pairs
    from clinical_api_etl_spark.operators.graph import connected_components

    docs = load(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.6)
    return connected_components(pairs).select(
        F.col("id").alias("doc_id"), "component"
    )


@QS.add(
    "text_tfidf_top_terms",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKS}) AS term FROM documents WHERE doc_id < 50
    ),
    tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
           FROM tok GROUP BY doc_id, term),
    df AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
           FROM tok GROUP BY term),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, df.df,
             ROUND(tf.tf * (LN(50.0 / df.df) + 1.0), 6) AS tfidf,
             ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                                ORDER BY tf.tf DESC, df.df ASC, tf.term) AS rank
      FROM tf JOIN df USING (term)
    )
    SELECT doc_id, term, tf, df, tfidf, CAST(rank AS BIGINT) AS rank
    FROM scored WHERE rank <= 3
    """,
    doc="[EXT] TF-IDF top-3 terms per document (first 50 docs): token "
    "explode → tf per (doc, term), df per term, smooth-idf score. Ranking "
    "is by the integer (tf, df, term) triple — float-free, so the two "
    "engines can't disagree on order even at 1-ulp libm differences; the "
    "tfidf column itself is rounded to 6 places for the same reason.",
    tags=("text",),
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from clinical_api_etl_spark.functions.text import tokens

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tok.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("tf"), F.asc("df"), F.asc("term"))
    return (
        tf.join(df_, "term")
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf") * (F.log(F.lit(50.0) / F.col("df")) + F.lit(1.0)), 6
            ).alias("tfidf"),
            F.row_number().over(w).cast("long").alias("rank"),
        )
        .filter(F.col("rank") <= 3)
    )


@QS.add(
    "mm_resize_images",
    f"""
    WITH img AS (SELECT doc_id, {_SYNTH_IMG_HX} AS hx FROM documents),
    rimg AS (
      SELECT doc_id,
             substr(hx,1,2)||substr(hx,5,2)||substr(hx,9,2)||substr(hx,13,2)||
             substr(hx,33,2)||substr(hx,37,2)||substr(hx,41,2)||substr(hx,45,2)||
             substr(hx,65,2)||substr(hx,69,2)||substr(hx,73,2)||substr(hx,77,2)||
             substr(hx,97,2)||substr(hx,101,2)||substr(hx,105,2)||substr(hx,109,2)
               AS rhex
      FROM img
    ),
    px AS (
      SELECT doc_id, rhex,
             CAST('0x' || substr(rhex, CAST(i * 2 + 1 AS INTEGER), 2) AS INTEGER) AS v
      FROM rimg, range(16) t(i)
    )
    SELECT doc_id, CAST(4 AS INTEGER) AS width, CAST(4 AS INTEGER) AS height,
           CAST(COUNT(*) AS BIGINT) AS n_px,
           CAST(SUM(v) AS BIGINT) AS px_sum,
           CAST(SUM(v * v) AS BIGINT) AS px_sumsq,
           md5(rhex) AS digest
    FROM px GROUP BY doc_id, rhex
    """,
    doc="[EXT] REAL resize over really-decoded pixels, value-hash-gated: "
    "synth PNGs are decoded (full zlib+unfilter path), nearest-neighbor "
    "resized 8x8→4x4 by the exact index map out[i,j]=in[2i,2j] "
    "(operators/multimodal.py:resize_gray8), and the output carries exact "
    "pixel sums plus an md5 digest of the resized bytes' lowercase hex — "
    "DuckDB re-derives the identical selected bytes straight from the md5 "
    "pixel source (byte b of row r', col c' is hex position 2*(16r'+2c')+1). "
    "Pillow's general resize_images remains for arbitrary codecs.",
    tags=("multimodal", "udf"),
)
def mm_resize_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.multimodal import (
        png_decode_images,
        png_encode_images,
        resize_gray8,
        synth_image,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id")
    px = png_decode_images(png_encode_images(synth_image(docs)))
    rz = resize_gray8(px, side=8, new_side=4)
    vals = (
        rz.select("doc_id", F.lower(F.hex("pixels")).alias("rhex"))
        .select(
            "doc_id", "rhex", F.explode(F.sequence(F.lit(0), F.lit(15))).alias("i")
        )
        .select(
            "doc_id",
            "rhex",
            F.conv(F.expr("substring(rhex, i*2+1, 2)"), 16, 10).cast("long").alias("v"),
        )
    )
    return (
        vals.groupBy("doc_id", "rhex")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_px"),
            F.sum("v").cast("long").alias("px_sum"),
            F.sum(F.expr("v * v")).cast("long").alias("px_sumsq"),
        )
        .select(
            "doc_id",
            F.lit(4).alias("width"),
            F.lit(4).alias("height"),
            "n_px",
            "px_sum",
            "px_sumsq",
            F.md5("rhex").alias("digest"),
        )
    )


@QS.add(
    "emb_kmeans_clusters",
    None,  # iterative (5 fixed Lloyd steps) → rows-only; pytest verifies
    # against a numpy re-implementation.
    doc="[EXT] deterministic k-means (k=4, 5 Lloyd iterations, lowest-id "
    "init, low-id tie-break) over the embeddings table — cluster "
    "assignment for bucketing/dedup stages where seeded-random MLlib "
    "init would break reproducibility (operators/clustering.py).",
    tags=("similarity", "iterative"),
)
def emb_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.clustering import kmeans

    emb = load(spark, sf_dir, "embeddings")
    return kmeans(emb, k=4, iterations=5)


@QS.add(
    "ann_ivf_topk",
    None,  # recall < 1 by design (n_probe < n_clusters) → rows-only;
    # pytest proves n_probe == n_clusters equals cosine_topk exactly.
    doc="[EXT] IVF approximate top-k: deterministic-k-means cells, probe "
    "the 2 nearest cells per query, exact cosine re-rank inside them — "
    "each query touches ~n_probe/n_clusters of the corpus via a cell-id "
    "equi-join (operators/similarity.py:ivf_topk).",
    headline=True,
    tags=("similarity", "approx"),
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.similarity import ivf_topk

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return ivf_topk(queries, emb, k=5, n_clusters=8, n_probe=2)


#: Shared by text_chunk_windows and the text_pack_sequences oracle.
_CHUNK_SQL = f"""
    WITH tok AS (
      SELECT doc_id, {_TOKS} AS t FROM documents WHERE doc_id < 100
    )
    SELECT doc_id,
           CAST((s.s - 1) / 24 AS BIGINT) AS chunk_idx,
           array_to_string(t[s.s : s.s + 31], ' ') AS chunk_text,
           CAST(LEAST(32, len(t) - s.s + 1) AS INTEGER) AS n_tokens
    FROM tok, UNNEST(generate_series(1, GREATEST(len(t), 1), 24)) AS s(s)
"""


@QS.add(
    "text_chunk_windows",
    _CHUNK_SQL,
    doc="[EXT] document chunking: overlapping 32-token windows, stride 24 "
    "(overlap 8) — the training-sample prep reshape, pure explode (one "
    "narrow pass, no shuffle before downstream grouping).",
    tags=("text", "reshape"),
)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.functions.text import chunk_spec

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return (
        docs.select(
            "doc_id",
            F.posexplode(chunk_spec(F.col("text"), chunk=32, stride=24)).alias(
                "chunk_idx", "ch"
            ),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.col("ch.text").alias("chunk_text"),
            F.col("ch.n").alias("n_tokens"),
        )
    )


@QS.add(
    "text_pack_sequences",
    f"""
    WITH RECURSIVE chunks AS ({_CHUNK_SQL}),
    ordered AS (
      SELECT doc_id, chunk_idx, n_tokens,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY chunk_idx) AS rn
      FROM chunks
    ),
    packed AS (
      SELECT doc_id, chunk_idx, n_tokens, rn, 0 AS bin, n_tokens AS used
      FROM ordered WHERE rn = 1
      UNION ALL
      SELECT o.doc_id, o.chunk_idx, o.n_tokens, o.rn,
             CASE WHEN p.used + o.n_tokens <= 64 THEN p.bin ELSE p.bin + 1 END,
             CASE WHEN p.used + o.n_tokens <= 64 THEN p.used + o.n_tokens
                  ELSE o.n_tokens END
      FROM packed p JOIN ordered o ON o.doc_id = p.doc_id AND o.rn = p.rn + 1
    )
    SELECT doc_id, chunk_idx, n_tokens, CAST(bin AS BIGINT) AS bin FROM packed
    """,
    doc="[EXT] sequence packing: greedy bin-assignment of each document's "
    "chunks to 64-token context windows as a JVM-side aggregate fold "
    "(operators/textstats.py:pack_chunks) — the chunking→batch-assembly "
    "step of a training-data pipeline. Oracle: the same greedy fold as a "
    "DuckDB recursive CTE over rank-ordered chunks.",
    tags=("text", "reshape", "iterative"),
)
def text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.textstats import pack_chunks
    from clinical_api_etl_spark.plans.extensions import text_chunk_windows

    chunks = text_chunk_windows(spark, sf_dir)
    return pack_chunks(chunks, max_tokens=64)


# ---------------------------------------------------------------------------
# Dataset assembly: deterministic splits, stratified sampling,
# decontamination, PII scrubbing. [EXT]
# ---------------------------------------------------------------------------


@QS.add(
    "split_train_val_test",
    """
    SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
    FROM (
      SELECT doc_id,
             CASE WHEN substr(md5(doc_id::VARCHAR), 1, 4) < 'cccc' THEN 'train'
                  WHEN substr(md5(doc_id::VARCHAR), 1, 4) < 'e666' THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    ) GROUP BY split
    """,
    doc="[EXT] deterministic 80/10/10 train/val/test assignment keyed on "
    "md5(doc_id) hex thresholds (operators/sampling.py:split_assign) — "
    "reproducible across engines, partitionings and appends; narrow "
    "projection, zero shuffles before the audit aggregate.",
    tags=("sampling", "split"),
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.sampling import split_assign

    docs = load(spark, sf_dir, "documents")
    return (
        split_assign(docs, "doc_id")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
    )


@QS.add(
    "sample_stratified_events",
    """
    WITH r AS (
      SELECT event_id, event_type,
             ROW_NUMBER() OVER (
               PARTITION BY event_type
               ORDER BY substr(md5(event_id::VARCHAR), 1, 4), event_id
             ) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    )
    SELECT event_id, event_type FROM r WHERE rn <= CEIL(0.1 * n)
    """,
    doc="[EXT] exact deterministic 10% stratified sample per event_type "
    "(operators/sampling.py:stratified_sample): md5-order prefix per "
    "stratum — exact per-stratum counts, no RNG, one window shuffle. The "
    "reproducible alternative to Bernoulli sampleBy for training-subset "
    "carving.",
    tags=("sampling",),
)
def sample_stratified_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.sampling import stratified_sample

    ev = load(spark, sf_dir, "events")
    return stratified_sample(
        ev.select("event_id", "event_type"), ["event_type"], "event_id", fraction=0.1
    )


@QS.add(
    "decontaminate_vs_benchmark",
    f"""
    WITH tok AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    sh AS (
      SELECT doc_id, unnest({_shingles_sql(5)}) AS shingle FROM tok
    ),
    t AS (SELECT * FROM sh WHERE doc_id % 97 <> 0),
    b AS (SELECT * FROM sh WHERE doc_id % 97 = 0)
    SELECT t.doc_id AS train_id,
           CAST(COUNT(DISTINCT t.shingle) AS BIGINT) AS n_shared,
           CAST(COUNT(DISTINCT b.doc_id) AS BIGINT) AS n_bench_docs
    FROM t JOIN b ON t.shingle = b.shingle
    GROUP BY t.doc_id
    """,
    doc="[EXT] eval-set decontamination: training docs sharing any verbatim "
    "5-gram with the benchmark slice (doc_id % 97 == 0 stands in for the "
    "eval set). Bucketed equi-join on hashed shingles with the benchmark "
    "side broadcast (operators/dedup.py:ngram_overlap) — work scales with "
    "shared-shingle mass, never |train|x|bench|.",
    tags=("dedup", "text", "decontamination"),
)
def decontaminate_vs_benchmark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.dedup import ngram_overlap

    docs = load(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    return ngram_overlap(train, bench, "doc_id", "text", n=5)


@QS.add(
    "text_pii_redaction",
    """
    WITH c AS (
      SELECT doc_id,
             text || ' reach me at user' || doc_id::VARCHAR
                  || '@mail.example.org or +1-555-0199 or 123-45-6789'
               AS contaminated
      FROM documents
    )
    SELECT doc_id,
           md5(regexp_replace(regexp_replace(regexp_replace(contaminated,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
                 '\\+?[0-9]{1,2}-[0-9]{3}-[0-9]{3,4}(-[0-9]{4})?', '[PHONE]', 'g'),
                 '[0-9]{3}-[0-9]{2}-[0-9]{4}', '[SSN]', 'g')) AS fp,
           CAST(len(regexp_extract_all(contaminated,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(contaminated,
                 '\\+?[0-9]{1,2}-[0-9]{3}-[0-9]{3,4}(-[0-9]{4})?')) AS BIGINT) AS n_phone,
           CAST(len(regexp_extract_all(contaminated,
                 '[0-9]{3}-[0-9]{2}-[0-9]{4}')) AS BIGINT) AS n_ssn
    FROM c
    """,
    doc="[EXT] PII scrubbing (functions/text.py:redact_pii): email/phone/"
    "SSN patterns from the Java-regex ∩ RE2 subset, applied as a "
    "regexp_replace chain over deterministically contaminated text; the "
    "oracle hash-checks the redacted output byte-for-byte plus per-kind "
    "match counts. Pure JVM expressions, zero UDF.",
    tags=("text", "pii"),
)
def text_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.functions.text import pii_counts, redact_pii

    docs = load(spark, sf_dir, "documents")
    contaminated = F.concat(
        F.col("text"),
        F.lit(" reach me at user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.org or +1-555-0199 or 123-45-6789"),
    )
    with_c = docs.select("doc_id", contaminated.alias("contaminated"))
    counts = pii_counts(F.col("contaminated"))
    return with_c.select(
        "doc_id",
        F.md5(redact_pii(F.col("contaminated"))).alias("fp"),
        counts["email"].alias("n_email"),
        counts["phone"].alias("n_phone"),
        counts["ssn"].alias("n_ssn"),
    )


@QS.add(
    "text_winnow_fingerprints",
    """
    WITH tok AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
      FROM documents WHERE doc_id < 200
    ),
    kg AS (
      SELECT doc_id,
             list_transform(range(1, greatest(len(t)-3, 1)+1),
                            i -> substr(md5(array_to_string(t[i:i+3], ' ')), 1, 8)) AS h
      FROM tok
    ),
    sel AS (
      SELECT doc_id,
             list_sort(list_distinct(
               list_transform(range(1, greatest(len(h)-4, 1)+1),
                              i -> list_aggregate(h[i:i+4], 'min')))) AS fps
      FROM kg
    )
    SELECT doc_id, unnest(fps) AS fingerprint FROM sel
    """,
    doc="[EXT] winnowing fingerprints (Schleimer/Wilkerson/Aiken, "
    "SIGMOD'03): per-window minimum over md5-hashed 4-gram sequences "
    "(w=5) — any ≥8-token shared run between documents is guaranteed a "
    "common fingerprint at ~1/3 the density of full shingling. The "
    "copy-detection primitive between exact dedup and MinHash; md5-hex "
    "prefixes keep the selection engine-portable. "
    "functions/text.py:winnow_fingerprints/winnow_select.",
    tags=("text", "dedup", "fingerprint"),
)
def text_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.functions.text import winnow_fingerprints, winnow_select

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    # Materialize the k-gram hash array before the window-min pass: the
    # select stage references it w times per output element (no-HOF-CSE).
    hashed = docs.select(
        "doc_id", winnow_fingerprints(F.col("text"), k=4).alias("h")
    )
    return hashed.select(
        "doc_id",
        F.explode(winnow_select(F.col("h"), w=5)).alias("fingerprint"),
    )


@QS.add(
    "text_bpe_token_stats",
    """
    SELECT doc_id,
           CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS BIGINT)
             AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
             AS BIGINT) AS n_bpe_tokens
    FROM documents
    """,
    doc="[EXT] token accounting both ways a data pipeline needs it: "
    "whitespace tokens (cost estimation vs word counts) and BPE-ish "
    "pre-tokenization (letter runs / digit runs / punctuation — the split "
    "a byte-pair tokenizer applies before merges; "
    "functions/text.py:BPE_SPLIT_PATTERN). Narrow projection, zero UDF.",
    tags=("text",),
)
def text_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.functions.text import BPE_SPLIT_PATTERN, token_count

    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count(F.col("text")).cast("long").alias("n_ws_tokens"),
        F.regexp_count("text", F.lit(BPE_SPLIT_PATTERN)).cast("long").alias(
            "n_bpe_tokens"
        ),
    )


@QS.add(
    "emb_int8_quantize",
    """
    WITH v AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
               FROM embeddings),
    s AS (SELECT vec_id, e,
                 127.0 / greatest(list_max(list_transform(e, x -> abs(x))), 1e-12)
                   AS scale
          FROM v)
    SELECT vec_id, scale,
           CAST(list_reduce(list_transform(e, x -> floor(x * scale + 0.5)),
                            (a, b) -> a + b) AS BIGINT) AS q_sum,
           CAST(list_max(list_transform(e, x -> abs(floor(x * scale + 0.5)))) AS BIGINT)
             AS q_max_abs
    FROM s
    """,
    doc="[EXT] symmetric int8 embedding quantization (per-vector scale = "
    "127/max|x|): the storage/serving compression step of an embedding "
    "pipeline at 100 TB (4x smaller vectors, SIMD-friendly dot products). "
    "Rounding is explicit floor(x+0.5) — identical in every engine, no "
    "HALF_UP/HALF_EVEN ambiguity; checks quantized checksum and max "
    "magnitude (≤127) per vector.",
    tags=("similarity", "compression"),
)
def emb_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.functions.vectors import as_double

    emb = load(spark, sf_dir, "embeddings")
    e = as_double(F.col("embedding"))
    # scale referenced per element in the quantize transform → materialize
    # both the double vector and the scale before that projection.
    s = emb.select(
        "vec_id",
        e.alias("e"),
        (
            F.lit(127.0)
            / F.greatest(
                F.array_max(F.transform(e, lambda x: F.abs(x))), F.lit(1e-12)
            )
        ).alias("scale"),
    )
    q = F.transform(F.col("e"), lambda x: F.floor(x * F.col("scale") + F.lit(0.5)))
    qm = s.select("vec_id", "scale", q.alias("q"))
    return qm.select(
        "vec_id",
        "scale",
        F.aggregate(F.col("q"), F.lit(0).cast("long"), lambda a, b: a + b).alias("q_sum"),
        F.array_max(F.transform(F.col("q"), lambda x: F.abs(x))).cast("long").alias("q_max_abs"),
    )


@QS.add(
    "corpus_clean_for_training",
    f"""
    WITH tok AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    sh AS (SELECT doc_id, unnest({_shingles_sql(5)}) AS shingle FROM tok),
    contaminated AS (
      SELECT DISTINCT t.doc_id
      FROM sh t JOIN sh b ON t.shingle = b.shingle
      WHERE t.doc_id % 97 <> 0 AND b.doc_id % 97 = 0
    )
    SELECT d.doc_id,
           CAST(len({_TOKS}) AS BIGINT) AS n_tokens
    FROM documents d
    WHERE d.doc_id % 97 <> 0
      AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)
      AND len({_TOKS}) >= 20
    """,
    doc="[EXT] end-to-end corpus curation: training docs (non-benchmark) "
    "minus decontamination hits (any shared 5-gram with the eval slice) "
    "minus too-short documents — the anti-join composition that turns the "
    "decontaminate_vs_benchmark scan into an actionable clean corpus. "
    "Flagged ids broadcast into the anti-join; the length predicate is a "
    "narrow projection.",
    tags=("dedup", "text", "decontamination", "pipeline"),
)
def corpus_clean_for_training(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.functions.text import token_count
    from clinical_api_etl_spark.operators.dedup import ngram_overlap

    docs = load(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    flagged = ngram_overlap(train, bench, "doc_id", "text", n=5).select(
        F.col("train_id").alias("doc_id")
    )
    return (
        # flagged ids scale with the corpus — unhinted anti-join
        train.join(flagged, "doc_id", "left_anti")
        .select("doc_id", token_count(F.col("text")).cast("long").alias("n_tokens"))
        .filter(F.col("n_tokens") >= 20)
    )


@QS.add(
    "corpus_quality_gate",
    f"""
    WITH scored AS (
      SELECT doc_id,
             len({_TOKS}) AS n_tokens,
             {_STOP_RATIO} AS stop_ratio
      FROM documents
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN n_tokens BETWEEN 20 AND 10000
                          AND stop_ratio >= 0.05 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_keep,
           CAST(SUM(CASE WHEN n_tokens < 20 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_too_short,
           CAST(SUM(CASE WHEN stop_ratio < 0.05 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_low_stopword
    FROM scored
    """,
    doc="[EXT] corpus quality gate summary: keep/drop accounting over the "
    "token-length band and stopword-density floor (the cheap-filter stage "
    "in front of dedup/decontamination in a training pipeline). Single "
    "narrow pass + one aggregate; every predicate is a column expression "
    "shared with functions/text.py.",
    tags=("text", "quality", "pipeline"),
)
def corpus_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.functions.text import stopword_ratio, token_count

    docs = load(spark, sf_dir, "documents")
    scored = docs.select(
        token_count(F.col("text")).alias("n_tokens"),
        stopword_ratio(F.col("text")).alias("stop_ratio"),
    )
    keep = (
        F.col("n_tokens").between(20, 10000) & (F.col("stop_ratio") >= 0.05)
    )
    return scored.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(keep, 1).otherwise(0)).cast("long").alias("n_keep"),
        F.sum(F.when(F.col("n_tokens") < 20, 1).otherwise(0)).cast("long").alias("n_too_short"),
        F.sum(F.when(F.col("stop_ratio") < 0.05, 1).otherwise(0)).cast("long").alias("n_low_stopword"),
    )


@QS.add(
    "sample_hash_bernoulli",
    """
    SELECT event_id, event_type
    FROM events
    WHERE substr(md5(event_id::VARCHAR), 1, 4) < '1999'
    """,
    doc="[EXT] deterministic Bernoulli-by-hash 10% sample "
    "(operators/sampling.py:hash_sample, threshold 0x1999 = "
    "floor(0.1*65536)): the 100 TB sampling path — a NARROW filter with "
    "no shuffle/window/per-stratum serialization, reproducible across "
    "engines and partitionings; per-stratum counts are binomial instead "
    "of exact (sample_stratified_events is the exact-count counterpart).",
    tags=("sampling",),
)
def sample_hash_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.sampling import hash_sample

    ev = load(spark, sf_dir, "events")
    return hash_sample(ev.select("event_id", "event_type"), "event_id", fraction=0.1)


@QS.add(
    "text_repetition_scores",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    uni AS (
      SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top_cnt,
             CAST(SUM(c) AS BIGINT) AS n_tokens
      FROM (
        SELECT doc_id, tok, COUNT(*) AS c
        FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
        GROUP BY doc_id, tok
      ) GROUP BY doc_id
    ),
    bi AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bi,
             CAST(COUNT(DISTINCT bg) AS BIGINT) AS n_bi_distinct
      FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(toks)),
                                     i -> toks[i] || ' ' || toks[i + 1])) AS bg
        FROM t
      ) GROUP BY doc_id
    )
    SELECT uni.doc_id, n_tokens,
           CAST(top_cnt AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS top_token_frac,
           CASE WHEN n_bi IS NULL OR n_bi = 0 THEN 0.0
                ELSE 1.0 - CAST(n_bi_distinct AS DOUBLE) / CAST(n_bi AS DOUBLE)
           END AS dup_bigram_frac
    FROM uni LEFT JOIN bi ON uni.doc_id = bi.doc_id
    """,
    doc="[EXT] Gopher-style repetition quality signals per document: "
    "top-token mass fraction and duplicate-bigram fraction — the "
    "standard degenerate-text filters of LLM corpus curation. ONE pass: "
    "unigrams and bigrams are tagged with a level and exploded from a "
    "single concatenated gram array, so the corpus is scanned and "
    "tokenized once and both signals come out of the same two-stage "
    "hash aggregate (map-side partials reduce each doc to one row per "
    "partition before each shuffle) via level-conditional aggregates — "
    "no branch join. The naive shape (separate unigram/bigram branches "
    "+ doc_id join) scans twice and joins; same row volume, double the "
    "I/O.",
    tags=("text",),
)
def text_repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.functions.text import tokens

    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    # Guard via a conditional empty array, not a row filter: a filter on
    # size(toks) is a predicate over a computed column — unpushable by
    # construction, and explode of the empty array drops the row anyway.
    # (sequence(1, 0) would count DOWN, so the guard is load-bearing.)
    bigrams = F.when(
        F.size("toks") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - 1),
            lambda i: F.concat_ws(
                " ", F.element_at("toks", i), F.element_at("toks", i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = F.concat(
        F.transform("toks", lambda t: F.struct(F.lit(0).alias("lvl"), t.alias("g"))),
        F.transform(bigrams, lambda b: F.struct(F.lit(1).alias("lvl"), b.alias("g"))),
    )
    per_gram = (
        toks.select("doc_id", F.explode(grams).alias("gr"))
        .groupBy("doc_id", F.col("gr.lvl").alias("lvl"), F.col("gr.g").alias("g"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    is_uni = F.col("lvl") == 0
    is_bi = F.col("lvl") == 1
    per_doc = per_gram.groupBy("doc_id").agg(
        F.max(F.when(is_uni, F.col("c"))).cast("long").alias("top_cnt"),
        F.sum(F.when(is_uni, F.col("c"))).cast("long").alias("n_tokens"),
        F.sum(F.when(is_bi, F.col("c"))).cast("long").alias("n_bi"),
        # Each (doc, lvl=1, g) group is one distinct bigram.
        F.count(F.when(is_bi, F.lit(1))).cast("long").alias("n_bi_distinct"),
    )
    dup_frac = F.when(
        F.col("n_bi").isNull() | (F.col("n_bi") == 0), F.lit(0.0)
    ).otherwise(
        F.lit(1.0) - F.col("n_bi_distinct").cast("double") / F.col("n_bi").cast("double")
    )
    return per_doc.select(
        "doc_id",
        "n_tokens",
        (F.col("top_cnt").cast("double") / F.col("n_tokens").cast("double")).alias(
            "top_token_frac"
        ),
        dup_frac.alias("dup_bigram_frac"),
    )


@QS.add(
    "text_rarity_scores",
    f"""
    WITH occ AS (
      SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c_doc
      FROM (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents)
      GROUP BY doc_id, tok
    ),
    lm AS (
      SELECT tok, CAST(SUM(c_doc) AS BIGINT) AS corpus_cnt
      FROM occ GROUP BY tok
    )
    SELECT doc_id,
           CAST(SUM(c_doc) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN corpus_cnt < 3 THEN c_doc ELSE 0 END) AS DOUBLE)
             / CAST(SUM(c_doc) AS DOUBLE) AS rare_frac,
           CAST(SUM(c_doc * corpus_cnt) AS DOUBLE)
             / CAST(SUM(c_doc) AS DOUBLE) AS avg_tok_count
    FROM occ JOIN lm USING (tok)
    GROUP BY doc_id
    """,
    doc="[EXT] Corpus-rarity quality signals per document — the "
    "exact-arithmetic stand-in for a CCNet-style LM perplexity filter: "
    "fraction of token occurrences whose corpus-wide count is < 3, and "
    "the average corpus count of the doc's tokens. The unigram LM is "
    "built FROM the per-(doc, token) reduced table (occurrences are "
    "collapsed before any join, so the zipf-head token skew never rides "
    "a shuffle as raw rows), then joined back on token and rolled up per "
    "doc. All sums are integer counts — order-independent across "
    "engines; the only float ops are two final divisions. A true "
    "log-prob sum would be fp-association-order-dependent and can never "
    "be oracle-hashed.",
    tags=("text",),
)
def text_rarity_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.functions.text import tokens

    docs = load(spark, sf_dir, "documents")
    # Both the LM build and the join probe consume occ: persist the reduced
    # (doc, tok, count) table so the corpus is scanned and tokenized ONCE
    # and the vocabulary is never broadcast (it is unbounded at scale —
    # the join on tok is a shuffle join whose zipf-head skew AQE splits).
    occ = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c_doc"))
    ).persist()
    lm = occ.groupBy("tok").agg(F.sum("c_doc").cast("long").alias("corpus_cnt"))
    joined = occ.join(lm, "tok")
    return joined.groupBy("doc_id").agg(
        F.sum("c_doc").cast("long").alias("n_tokens"),
        (
            F.sum(F.when(F.col("corpus_cnt") < 3, F.col("c_doc")).otherwise(F.lit(0)))
            .cast("double")
            / F.sum("c_doc").cast("double")
        ).alias("rare_frac"),
        (
            F.sum(F.col("c_doc") * F.col("corpus_cnt")).cast("double")
            / F.sum("c_doc").cast("double")
        ).alias("avg_tok_count"),
    )


@QS.add(
    "emb_pq_codes",
    None,  # codebooks are a trained model (deterministic, but k-means-
    # derived) → rows-only; emb_pq_gate hash-checks the invariants and
    # pytest verifies codes against a numpy re-implementation.
    doc="[EXT] product quantization encode (m=8 subspaces × k=16 "
    "centroids): each 64-dim vector becomes 8 int codes — 256 B float32 "
    "→ 8 B, the faiss-IVFPQ compression layout. Codebooks train "
    "driver-side on the deterministic lowest-id sample (model-on-sample "
    "convention, operators/pq.py); encode is one narrow shuffle-free "
    "Arrow pass (numpy per-subspace argmin — declared Arrow operator).",
    tags=("similarity", "approx", "iterative"),
)
def emb_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.pq import pq_fit

    emb = load(spark, sf_dir, "embeddings")
    out, _ = pq_fit(emb, m=8, k=16, iterations=5)
    return out


@QS.add(
    "emb_pq_gate",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs, TRUE AS codes_ok,
           TRUE AS recon_beats_mean
    FROM embeddings
    """,
    doc="[EXT] structural gate for emb_pq_codes: every vector is encoded "
    "(row-preserving), every code lies in [0, k) with exactly m codes "
    "per vector, and total squared reconstruction error beats the "
    "global-mean predictor (SST) — per-subspace Lloyd can only improve "
    "on the one-centroid baseline, so PQ must explain variance or the "
    "encode is wrong.",
    tags=("similarity", "approx", "gate"),
)
def emb_pq_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.functions.vectors import as_double
    from clinical_api_etl_spark.operators.pq import pq_fit

    emb = load(spark, sf_dir, "embeddings")
    encoded, books = pq_fit(emb, m=8, k=16, iterations=5)
    m, k = len(books), len(books[0])
    v = as_double(F.col("embedding"))
    dim = sum(len(b[0]) for b in books)
    gm = emb.select(
        *[F.avg(F.element_at(v, i + 1)).alias(f"m{i}") for i in range(dim)]
    ).collect()[0]
    sst = (
        emb.select(
            F.aggregate(
                F.zip_with(
                    v,
                    F.array(*[F.lit(float(gm[f"m{i}"])) for i in range(dim)]),
                    lambda a, b: (a - b) * (a - b),
                ).alias("_sq"),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("sq")
        )
        .agg(F.sum("sq").alias("sst"))
        .collect()[0]["sst"]
    )
    n_vecs = emb.count()
    stats = encoded.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min(
            (F.array_min("codes") >= 0)
            & (F.array_max("codes") < k)
            & (F.size("codes") == m)
        ).alias("codes_ok"),
        F.sum("recon_err").alias("total_err"),
    )
    return stats.select(
        F.lit(n_vecs).cast("long").alias("n_vecs"),
        ((F.col("n_rows") == n_vecs) & F.col("codes_ok")).alias("codes_ok"),
        (F.col("total_err") < F.lit(float(sst))).alias("recon_beats_mean"),
    )


@QS.add(
    "ann_ivfpq_topk",
    None,  # recall < 1 by design (n_probe < n_clusters, PQ shortlist)
    # → rows-only; ann_ivfpq_gate hash-checks the recall floor and
    # pytest proves full-probe + full-refine equals exact l2_topk.
    doc="[EXT] IVFPQ approximate top-k with exact refinement — the "
    "composed scale path: k-means cells probed per query, candidates "
    "ranked by residual-PQ asymmetric distance (per-(query,cell) lookup "
    "tables, only (id, cell, 8 codes) rows shuffle — raw vectors stay "
    "out of the candidate join), top k*refine re-ranked by exact L2 "
    "(operators/pq.py:ivfpq_topk).",
    headline=True,
    tags=("similarity", "approx", "iterative"),
)
def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.pq import ivfpq_topk

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return ivfpq_topk(queries, emb, k=5, n_clusters=8, n_probe=2, refine=10)


@QS.add(
    "ann_ivfpq_gate",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_queries, TRUE AS recall_ok
    FROM embeddings WHERE vec_id < 10
    """,
    doc="[EXT] recall gate for ann_ivfpq_topk against exact l2_topk: "
    "recall@5 over the 10-query set must hold ≥ 0.7 (re-measured "
    "0.86/0.86/0.80 at sf0.001/0.01/0.1 on 2026-08-15 — exactly the "
    "n_probe=2/8 cell-probe ceiling, i.e. the deep-refine shortlist "
    "loses nothing on top of IVF's own approximation; slack vs the "
    "sf0.1 minimum is 0.10, floor kept).",
    tags=("similarity", "approx", "gate"),
)
def ann_ivfpq_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.pq import ivfpq_topk, l2_topk

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = l2_topk(queries, emb, k=5).select("query_id", "neighbor_id")
    appr = ivfpq_topk(
        queries, emb, k=5, n_clusters=8, n_probe=2, refine=10
    ).select("query_id", "neighbor_id")
    hits = appr.join(exact, ["query_id", "neighbor_id"], "left_semi")
    n_q = queries.count()
    return hits.agg(F.count(F.lit(1)).alias("_n_hits")).select(
        F.lit(n_q).cast("long").alias("n_queries"),
        (F.col("_n_hits") >= 0.7 * 5 * n_q).alias("recall_ok"),
    )


_MIXTURE_WEIGHTS = {"src0": 0.5, "src1": 0.25, "src2": 0.15, "src3": 0.1}
_MIXTURE_BUDGET = 200


@QS.add(
    "mixture_upsample_epochs",
    """
    WITH ranked AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (PARTITION BY source
               ORDER BY substring(md5(CAST(doc_id AS VARCHAR)), 1, 4), doc_id)
               AS rn,
             COUNT(*) OVER (PARTITION BY source) AS n,
             CASE source WHEN 'src0' THEN 100 WHEN 'src1' THEN 50
                         WHEN 'src2' THEN 30 WHEN 'src3' THEN 20 END AS target
      FROM documents WHERE source IN ('src0', 'src1', 'src2', 'src3')
    )
    SELECT doc_id, source,
           CAST(unnest(generate_series(1, target // n
                + CASE WHEN rn <= target % n THEN 1 ELSE 0 END)) AS BIGINT)
             AS epoch
    FROM ranked
    """,
    doc="[EXT] domain-mixture resampling WITH repetition (the Pile/LLaMA "
    "data-recipe step): each domain gets floor(budget*w) docs; docs repeat "
    "for multiple epochs when the domain is smaller than its target, the "
    "md5-first-ranked docs taking the fractional extra epoch — exact "
    "per-domain counts, hash-deterministic across engines "
    "(operators/sampling.py:mixture_upsample).",
    tags=("sampling",),
)
def mixture_upsample_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.sampling import mixture_upsample

    docs = load(spark, sf_dir, "documents")
    return mixture_upsample(
        docs, "source", "doc_id",
        weights=_MIXTURE_WEIGHTS, budget=_MIXTURE_BUDGET,
    )


@QS.add(
    "dedup_resolve_canonical",
    f"""
    WITH RECURSIVE pairs AS ({_PAIRS_06_SQL}),
    edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION ALL
      SELECT id_b, id_a FROM pairs
    ),
    verts AS (SELECT DISTINCT a AS id FROM edges),
    walk(id, label) AS (
      SELECT id, id FROM verts
      UNION
      SELECT e.a, w.label FROM walk w JOIN edges e ON w.id = e.b
      WHERE w.label < e.a
    ),
    comp AS (SELECT id, MIN(label) AS component FROM walk GROUP BY id),
    grouped AS (
      SELECT d.doc_id AS id, COALESCE(c.component, d.doc_id) AS grp, d.n_chars
      FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
    ),
    rk AS (
      SELECT id, grp,
             ROW_NUMBER() OVER (PARTITION BY grp
                                ORDER BY n_chars DESC, id ASC) AS rk
      FROM grouped
    )
    SELECT id, CAST(grp AS BIGINT) AS "group",
           MIN(CASE WHEN rk = 1 THEN id END) OVER (PARTITION BY grp)
             AS canonical_id,
           rk = 1 AS is_canonical
    FROM rk
    """,
    doc="[EXT] dedup RESOLUTION: near-dup pairs (0.6 Jaccard) -> connected "
    "components -> one canonical survivor per group (longest n_chars, ties "
    "to lowest id); singletons survive as their own group. The full "
    "keep/drop map for corpus cleaning "
    "(operators/dedup.py:canonical_docs); oracle re-derives it with a "
    "DuckDB recursive CTE.",
    tags=("dedup", "graph"),
)
def dedup_resolve_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.dedup import (
        canonical_docs,
        ngram_jaccard_pairs,
    )

    docs = load(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.6)
    return canonical_docs(docs, pairs, id_col="doc_id", score_col="n_chars")


@QS.add(
    "text_vocab_coverage",
    f"""
    WITH tok AS (SELECT unnest({_TOKS}) AS term FROM documents),
    freq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS freq
             FROM tok GROUP BY term),
    tot AS (SELECT SUM(freq) AS total FROM freq),
    ranked AS (
      SELECT term, freq,
             ROW_NUMBER() OVER (ORDER BY freq DESC, term ASC) AS rank,
             SUM(freq) OVER (ORDER BY freq DESC, term ASC
                             ROWS UNBOUNDED PRECEDING) AS cum
      FROM freq
    )
    SELECT CAST(rank AS BIGINT) AS rank, term, freq,
           ROUND(CAST(cum AS DOUBLE) / CAST((SELECT total FROM tot) AS DOUBLE),
                 6) AS cum_coverage
    FROM ranked WHERE rank <= 50
    """,
    doc="[EXT] vocabulary coverage: top-50 corpus terms by frequency with "
    "cumulative token-mass coverage — the tokenizer-training precursor "
    "(what fraction of the corpus a V-term vocab explains). Integer "
    "cumsum, one double division rounded to 6 places; ranking by the "
    "(freq, term) pair is float-free. The global rank window runs over "
    "the VOCAB (post-aggregation), which is orders smaller than the "
    "corpus.",
    tags=("text",),
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from clinical_api_etl_spark.functions.text import tokens

    docs = load(spark, sf_dir, "documents")
    tok = docs.select(F.explode(tokens(F.col("text"))).alias("term"))
    freq = tok.groupBy("term").agg(F.count(F.lit(1)).alias("freq"))
    total = freq.agg(F.sum("freq").alias("_total"))
    w = W.orderBy(F.desc("freq"), F.asc("term"))
    ranked = freq.select(
        "term",
        "freq",
        F.row_number().over(w).cast("long").alias("rank"),
        F.sum("freq")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("_cum"),
    )
    return (
        ranked.filter(F.col("rank") <= 50)
        .crossJoin(F.broadcast(total))
        .select(
            "rank",
            "term",
            "freq",
            F.round(
                F.col("_cum").cast("double") / F.col("_total").cast("double"), 6
            ).alias("cum_coverage"),
        )
    )


@QS.add(
    "pipeline_training_corpus",
    f"""
    WITH RECURSIVE pairs AS ({_PAIRS_06_SQL}),
    edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION ALL
      SELECT id_b, id_a FROM pairs
    ),
    verts AS (SELECT DISTINCT a AS id FROM edges),
    walk(id, label) AS (
      SELECT id, id FROM verts
      UNION
      SELECT e.a, w.label FROM walk w JOIN edges e ON w.id = e.b
      WHERE w.label < e.a
    ),
    comp AS (SELECT id, MIN(label) AS component FROM walk GROUP BY id),
    grouped AS (
      SELECT d.doc_id AS id, COALESCE(c.component, d.doc_id) AS grp, d.n_chars
      FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
    ),
    rk AS (
      SELECT id, ROW_NUMBER() OVER (PARTITION BY grp
                                    ORDER BY n_chars DESC, id ASC) AS rk
      FROM grouped
    ),
    canon AS (SELECT id AS doc_id FROM rk WHERE rk = 1),
    tok AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    sh AS (SELECT doc_id, unnest({_shingles_sql(5)}) AS shingle FROM tok),
    contaminated AS (
      SELECT DISTINCT t.doc_id
      FROM sh t JOIN sh b ON t.shingle = b.shingle
      WHERE t.doc_id % 97 <> 0 AND b.doc_id % 97 = 0
    ),
    clean AS (
      SELECT c.doc_id, CAST(len(tok.t) AS BIGINT) AS n_tokens
      FROM canon c JOIN tok ON tok.doc_id = c.doc_id
      WHERE c.doc_id % 97 <> 0
        AND c.doc_id NOT IN (SELECT doc_id FROM contaminated)
        AND len(tok.t) >= 20
    )
    SELECT split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
    FROM (
      SELECT doc_id, n_tokens,
             CASE WHEN substr(md5(doc_id::VARCHAR), 1, 4) < 'cccc' THEN 'train'
                  WHEN substr(md5(doc_id::VARCHAR), 1, 4) < 'e666' THEN 'val'
                  ELSE 'test' END AS split
      FROM clean
    ) GROUP BY split
    """,
    doc="[EXT] the END-TO-END training-corpus pipeline as ONE hash-gated "
    "query — what a reference user actually runs nightly: near-dup "
    "resolution (0.6-Jaccard pairs -> connected components -> longest "
    "survivor), benchmark split-off, 5-gram decontamination anti-join, "
    "token-length floor, deterministic md5 train/val/test assignment, "
    "and per-split document/token accounting. Every stage is the "
    "already-audited operator (canonical_docs, ngram_overlap, "
    "split_assign); the oracle replays the whole chain in one DuckDB "
    "statement (recursive CTE + shingle joins + md5 thresholds). All "
    "counts integer-exact.",
    headline=True,
    tags=("pipeline", "dedup", "decontamination", "sampling", "text"),
)
def pipeline_training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.functions.text import token_count
    from clinical_api_etl_spark.operators.dedup import (
        canonical_docs,
        ngram_jaccard_pairs,
        ngram_overlap,
    )
    from clinical_api_etl_spark.operators.sampling import split_assign

    # NB: do NOT persist docs here even though five stages branch off it —
    # measured 13-17s vs ~10s unpersisted at sf0.1: the InMemoryRelation
    # boundary replaces per-branch pruned parquet scans (each reading only
    # its columns, with pushed filters and known stats for broadcast
    # decisions) with full-width cache scans. The ≥2-branch persist rule
    # applies to COMPUTED intermediates, not to cheap pruned base scans.
    docs = load(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.6)
    resolved = canonical_docs(docs, pairs, id_col="doc_id", score_col="n_chars")
    canon = resolved.filter(F.col("is_canonical")).select(
        F.col("id").alias("doc_id")
    )
    survivors = docs.join(canon, "doc_id").filter(F.col("doc_id") % 97 != 0)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    flagged = ngram_overlap(survivors, bench, "doc_id", "text", n=5).select(
        F.col("train_id").alias("doc_id")
    )
    clean = (
        # flagged ids scale with the corpus — unhinted anti-join
        survivors.join(flagged, "doc_id", "left_anti")
        .select(
            "doc_id", token_count(F.col("text")).cast("long").alias("n_tokens")
        )
        .filter(F.col("n_tokens") >= 20)
    )
    return (
        split_assign(clean, "doc_id")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
    )


# ---------------------------------------------------------------------------
# Matryoshka truncation recall: how much top-k recall do the first 16
# dims retain vs the full 64-dim embedding?
# ---------------------------------------------------------------------------

_MRL_DIMS = 16
_MRL_K = 5


def _mrl_oracle() -> str:
    def topk(vtab: str) -> str:
        return f"""(
      SELECT query_id, nid FROM (
        SELECT q.query_id, b.vec_id AS nid,
               ROW_NUMBER() OVER (
                 PARTITION BY q.query_id
                 ORDER BY {_cosine_sql("q.qe", "b.e")} DESC, b.vec_id
               ) AS rk
        FROM (SELECT vec_id AS query_id, e AS qe FROM {vtab}
              WHERE vec_id < 10) q
        CROSS JOIN {vtab} b WHERE b.vec_id <> q.query_id
      ) r WHERE rk <= {_MRL_K}
    )"""

    return f"""
    WITH v AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
               FROM embeddings),
    t AS (SELECT vec_id, e[1:{_MRL_DIMS}] AS e FROM v),
    ef AS MATERIALIZED {topk("v")},
    et AS MATERIALIZED {topk("t")}
    SELECT ef.query_id,
           CAST({_MRL_K} AS BIGINT) AS k,
           CAST(SUM(CASE WHEN et.nid IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hits,
           CAST(SUM(CASE WHEN et.nid IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / {_MRL_K}e0 AS recall
    FROM ef LEFT JOIN et ON ef.query_id = et.query_id AND ef.nid = et.nid
    GROUP BY ef.query_id
    """


@QS.add(
    "emb_matryoshka_recall",
    _mrl_oracle(),
    doc="[EXT] Matryoshka-representation evaluation (Kusupati et al., "
    f"public method): truncate embeddings to their first {_MRL_DIMS} of "
    "64 dims and measure exact top-k recall vs the full-dimension "
    "neighbors, per query — the decision metric for serving shorter "
    "prefixes of MRL-trained embeddings. Both top-k runs are exact "
    "brute-force cosine (bit-deterministic sequential folds, vec-id "
    "tie-break) so the whole evaluation carries a full value hash; "
    "recall = n_hits/k is exact (multiples of 1/k are representable). "
    "Scale: queries broadcast over the corpus scan twice; the IVF/LSH "
    "operators are the large-corpus path for each side.",
    tags=("embedding", "similarity"),
)
def emb_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.similarity import cosine_topk

    emb = load(spark, sf_dir, "embeddings")
    trunc = emb.select(
        "vec_id", F.slice("embedding", 1, _MRL_DIMS).alias("embedding")
    )
    full_k = cosine_topk(emb.filter(F.col("vec_id") < 10), emb, k=_MRL_K).select(
        "query_id", F.col("neighbor_id").alias("nid")
    )
    trunc_k = cosine_topk(
        trunc.filter(F.col("vec_id") < 10), trunc, k=_MRL_K
    ).select("query_id", F.col("neighbor_id").alias("nid"), F.lit(1).alias("hit"))
    return (
        full_k.join(trunc_k, ["query_id", "nid"], "left")
        .groupBy("query_id")
        .agg(
            F.lit(_MRL_K).cast("long").alias("k"),
            F.sum(F.coalesce("hit", F.lit(0))).cast("long").alias("n_hits"),
            (
                F.sum(F.coalesce("hit", F.lit(0))).cast("double") / F.lit(float(_MRL_K))
            ).alias("recall"),
        )
    )


# ---------------------------------------------------------------------------
# Multi-class character-trigram language ID with held-out evaluation.
# ---------------------------------------------------------------------------

_LID_PROFILE = 100  # trigrams kept per language profile


@QS.add(
    "text_langid_trigram_eval",
    f"""
    WITH d AS (
      SELECT doc_id, lang, lower(trim(text)) AS s,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS INTEGER)
               % 2 = 0 AS is_train
      FROM documents
    ),
    tg AS (
      SELECT doc_id, lang, is_train,
             unnest(list_transform(range(1, len(s) - 1),
                                   i -> substr(s, i, 3))) AS t
      FROM d WHERE len(s) >= 3
    ),
    prof AS (
      SELECT lang AS plang, t FROM (
        SELECT lang, t, ROW_NUMBER() OVER (
                 PARTITION BY lang ORDER BY COUNT(*) DESC, t) AS rk
        FROM tg WHERE is_train GROUP BY lang, t
      ) r WHERE rk <= {_LID_PROFILE}
    ),
    test_tg AS (
      SELECT DISTINCT doc_id, lang, t FROM tg WHERE NOT is_train
    ),
    scores AS (
      SELECT doc_id, lang, plang, CAST(COUNT(*) AS BIGINT) AS overlap
      FROM test_tg JOIN prof ON test_tg.t = prof.t
      GROUP BY doc_id, lang, plang
    ),
    pred AS (
      SELECT doc_id, lang, plang AS predicted, overlap FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                     ORDER BY overlap DESC, plang) AS pr
        FROM scores) p WHERE pr = 1
    )
    SELECT lang, predicted,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(MIN(overlap) AS BIGINT) AS min_overlap,
           CAST(MAX(overlap) AS BIGINT) AS max_overlap
    FROM pred GROUP BY lang, predicted
    """,
    doc="[EXT] multi-class language identification by character-trigram "
    "profile overlap (the classic Cavnar-Trenkle n-gram method, "
    f"integer form): per-language profiles = top-{_LID_PROFILE} "
    "trigrams of a hash-split train half (count-desc, trigram-asc — "
    "total order), prediction = argmax |doc's distinct trigrams ∩ "
    "profile| on the held-out half (exact BIGINT overlap, tie → "
    "smaller language) — upgrades the binary stopword heuristic "
    "(text_language_id) to the real multilingual classifier, and the "
    "output is its confusion matrix. Everything is integer counting: "
    "profiles are vocabulary-sized broadcasts, scoring is one "
    "posting-style equi-join — the fasttext-style langid shape at "
    "100 TB. Hash split via the portable md5-prefix arithmetic. NOTE: "
    "the synthetic corpus draws every lang from ONE shared vocabulary "
    "(lang is an independent label), so held-out accuracy is chance "
    "(~0.23 at sf0.01) BY CONSTRUCTION — the confusion matrix "
    "faithfully reports that data property; on real multilingual text "
    "the same plan separates scripts trivially.",
    tags=("text", "ml"),
)
def text_langid_trigram_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    docs = load(spark, sf_dir, "documents")
    d = docs.selectExpr(
        "doc_id",
        "lang",
        "lower(trim(text)) AS s",
        "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 4), 16, 10) AS BIGINT)"
        " % 2 = 0 AS is_train",
    )
    tg = d.filter(F.length("s") >= 3).select(
        "doc_id",
        "lang",
        "is_train",
        F.explode(
            F.expr("transform(sequence(1, length(s) - 2), i -> substring(s, i, 3))")
        ).alias("t"),
    )
    w_rk = W.partitionBy("lang").orderBy(F.desc("cnt"), F.asc("t"))
    prof = (
        tg.filter("is_train")
        .groupBy("lang", "t")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("rk", F.row_number().over(w_rk))
        .filter(F.col("rk") <= _LID_PROFILE)
        .select(F.col("lang").alias("plang"), "t")
    )
    test_tg = tg.filter(~F.col("is_train")).select("doc_id", "lang", "t").distinct()
    scores = (
        test_tg.join(F.broadcast(prof), "t")
        .groupBy("doc_id", "lang", "plang")
        .agg(F.count(F.lit(1)).cast("long").alias("overlap"))
    )
    w_p = W.partitionBy("doc_id").orderBy(F.desc("overlap"), F.asc("plang"))
    pred = (
        scores.withColumn("pr", F.row_number().over(w_p))
        .filter(F.col("pr") == 1)
        .select("doc_id", "lang", F.col("plang").alias("predicted"), "overlap")
    )
    return pred.groupBy("lang", "predicted").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.min("overlap").cast("long").alias("min_overlap"),
        F.max("overlap").cast("long").alias("max_overlap"),
    )


@QS.add(
    "text_vocab_chao1",
    f"""
    WITH w AS (
      SELECT tok AS word, CAST(COUNT(*) AS BIGINT) AS freq
      FROM (SELECT unnest({_TOKS}) AS tok FROM documents) GROUP BY tok
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS s_obs,
             CAST(SUM(freq) AS BIGINT) AS n_tokens,
             CAST(COUNT(*) FILTER (freq = 1) AS BIGINT) AS f1,
             CAST(COUNT(*) FILTER (freq = 2) AS BIGINT) AS f2
      FROM w
    )
    SELECT s_obs, n_tokens, f1, f2,
           CAST(s_obs AS DOUBLE)
             + CAST(f1 * (f1 - 1) AS DOUBLE)
               / CAST(2 * (f2 + 1) AS DOUBLE) AS chao1,
           CAST(1 AS DOUBLE)
             - CAST(f1 AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS good_coverage
    FROM s
    """,
    doc="[EXT] Chao1 vocabulary-richness estimate + Good's sample "
    "coverage — the 'how much vocabulary have we NOT seen yet' numbers "
    "a corpus scaling decision leans on (Chao 1984; bias-corrected form "
    "S_obs + f1(f1-1)/(2(f2+1)), so f2=0 never divides by zero): f1/f2 "
    "are the singleton/doubleton counts of the word-frequency table, "
    "coverage C = 1 - f1/N is the Good-Turing mass of unseen words. "
    "All exact BIGINT products; two single divisions + one add — "
    "hash-gated. One corpus scan, one tiny aggregate.",
    headline=True,
    tags=("text", "stats"),
)
def text_vocab_chao1(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.functions.text import tokens

    docs = load(spark, sf_dir, "documents")
    w = (
        docs.select(F.explode(tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    s = w.agg(
        F.count(F.lit(1)).cast("long").alias("s_obs"),
        F.sum("freq").cast("long").alias("n_tokens"),
        F.sum(F.when(F.col("freq") == 1, 1).otherwise(0))
        .cast("long")
        .alias("f1"),
        F.sum(F.when(F.col("freq") == 2, 1).otherwise(0))
        .cast("long")
        .alias("f2"),
    )
    return s.select(
        "s_obs",
        "n_tokens",
        "f1",
        "f2",
        (
            F.col("s_obs").cast("double")
            + (F.col("f1") * (F.col("f1") - 1)).cast("double")
            / (F.lit(2) * (F.col("f2") + 1)).cast("double")
        ).alias("chao1"),
        (
            F.lit(1.0)
            - F.col("f1").cast("double") / F.col("n_tokens").cast("double")
        ).alias("good_coverage"),
    )


_GT_MAX_R = 10


@QS.add(
    "text_good_turing_counts",
    f"""
    WITH w AS (
      SELECT tok AS word, CAST(COUNT(*) AS BIGINT) AS freq
      FROM (SELECT unnest({_TOKS}) AS tok FROM documents) GROUP BY tok
    ),
    h AS (
      SELECT freq AS r, CAST(COUNT(*) AS BIGINT) AS n_r FROM w
      WHERE freq <= {_GT_MAX_R + 1} GROUP BY freq
    ),
    grid AS (SELECT unnest(range(1, {_GT_MAX_R + 1})) AS r)
    SELECT g.r,
           CAST(COALESCE(a.n_r, 0) AS BIGINT) AS n_r,
           CAST(COALESCE(b.n_r, 0) AS BIGINT) AS n_r1,
           CASE WHEN COALESCE(a.n_r, 0) = 0 THEN CAST(0 AS DOUBLE)
                ELSE CAST((g.r + 1) * COALESCE(b.n_r, 0) AS DOUBLE)
                     / CAST(a.n_r AS DOUBLE) END AS r_star
    FROM grid g
    LEFT JOIN h a ON a.r = g.r
    LEFT JOIN h b ON b.r = g.r + 1
    """,
    doc="[EXT] Good-Turing adjusted counts r* = (r+1)·N_(r+1)/N_r for "
    f"r = 1..{_GT_MAX_R} over the word-frequency histogram — the "
    "count-smoothing table under Katz backoff and the unseen-mass "
    "companion to text_vocab_chao1's coverage. The frequency-of-"
    "frequencies histogram is one corpus scan + one |vocab|-row "
    "aggregate; the r grid is generated on both engines, missing "
    "N_r rows coalesce to 0 (r* = 0 sentinel, the NaT/NaN rule for "
    "undefined ratios). Each r* is one division over exact BIGINT "
    "products — hash-gated.",
    tags=("text", "stats"),
)
def text_good_turing_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.functions.text import tokens

    docs = load(spark, sf_dir, "documents")
    w = (
        docs.select(F.explode(tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    h = (
        w.filter(F.col("freq") <= _GT_MAX_R + 1)
        .groupBy(F.col("freq").alias("r"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_r"))
    )
    grid = spark.range(1, _GT_MAX_R + 1).select(F.col("id").alias("r"))
    a = h.select(F.col("r"), F.col("n_r"))
    b = h.select((F.col("r") - 1).alias("r"), F.col("n_r").alias("n_r1"))
    return (
        grid.join(F.broadcast(a), "r", "left")
        .join(F.broadcast(b), "r", "left")
        .select(
            "r",
            F.coalesce(F.col("n_r"), F.lit(0)).cast("long").alias("n_r"),
            F.coalesce(F.col("n_r1"), F.lit(0)).cast("long").alias("n_r1"),
            F.when(
                F.coalesce(F.col("n_r"), F.lit(0)) == 0, F.lit(0.0)
            )
            .otherwise(
                ((F.col("r") + 1) * F.coalesce(F.col("n_r1"), F.lit(0)))
                .cast("double")
                / F.col("n_r").cast("double")
            )
            .alias("r_star"),
        )
    )


@QS.add(
    "text_burstiness_topk",
    f"""
    WITH docw AS (
      SELECT doc_id, tok AS word, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents)
      GROUP BY doc_id, tok
    ),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
    w AS (
      SELECT word,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(c) AS BIGINT) AS total,
             CAST(SUM(c * c) AS BIGINT) AS sum_sq
      FROM docw GROUP BY word
    )
    SELECT word, n_docs, total, sum_sq,
           CAST((SELECT n FROM nn) * sum_sq - total * total AS DOUBLE)
             / CAST((SELECT n FROM nn) * total AS DOUBLE) AS vmr
    FROM w WHERE total >= 20
    ORDER BY vmr DESC, word LIMIT 20
    """,
    doc="[EXT] word BURSTINESS (Church & Gale 1995): content words "
    "clump — they recur within the documents that mention them — while "
    "function words spread Poisson-like, so the variance-to-mean ratio "
    "of per-document counts separates topical vocabulary from glue "
    "(VMR = 1 is the Poisson line; the curation signal behind "
    "tf normalization choices and stopword induction). Closed integer "
    "form over ALL N docs including zero-count ones: VMR = "
    "(N·Σc² − T²)/(N·T) — exact BIGINT numerator and denominator, ONE "
    "division, so the top-20 (vmr DESC, word) rows hash-gate exactly. "
    "One doc×word aggregate, one vocab-sized aggregate, TakeOrdered.",
    tags=("text", "stats"),
)
def text_burstiness_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.functions.text import tokens

    docs = load(spark, sf_dir, "documents")
    docw = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    nn = docs.agg(F.count(F.lit(1)).cast("long").alias("n"))
    w = docw.groupBy("word").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("c").cast("long").alias("total"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("sum_sq"),
    )
    return (
        w.filter(F.col("total") >= 20)
        .crossJoin(F.broadcast(nn))
        .select(
            "word",
            "n_docs",
            "total",
            "sum_sq",
            (
                (F.col("n") * F.col("sum_sq") - F.col("total") * F.col("total"))
                .cast("double")
                / (F.col("n") * F.col("total")).cast("double")
            ).alias("vmr"),
        )
        .orderBy(F.desc("vmr"), F.asc("word"))
        .limit(20)
    )


_VG_THRESH = [24, 50, 75, 101, 127, 152, 178, 203, 229, 255]


@QS.add(
    "text_vocab_growth_curve",
    f"""
    WITH db AS (
      SELECT doc_id, text,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                  AS BIGINT) AS bucket
      FROM documents
    ),
    wmin AS (
      SELECT tok AS word, CAST(MIN(bucket) AS BIGINT) AS min_bucket
      FROM (SELECT bucket, unnest({_TOKS}) AS tok FROM db)
      GROUP BY tok
    ),
    grid AS (SELECT unnest({_VG_THRESH}) AS t),
    curve AS (
      SELECT g.t,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM db
              WHERE bucket <= g.t) AS n_docs,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM wmin
              WHERE min_bucket <= g.t) AS vocab
      FROM grid g
    )
    SELECT CAST(t AS BIGINT) AS t, n_docs, vocab,
           CAST(vocab AS DOUBLE) / CAST(n_docs AS DOUBLE)
             AS vocab_per_doc
    FROM curve
    """,
    doc="[EXT] vocabulary GROWTH CURVE by nested random subsamples — the "
    "Heaps'-law estimation convention (vocabulary grows ~K·nᵝ; the "
    "curve says how much new vocabulary another 10x of corpus would "
    "buy, the scaling companion to text_vocab_chao1's asymptote): "
    "md5(doc_id) byte buckets give NESTED deterministic subsets at ten "
    "thresholds, each word carries its MINIMUM bucket (the first "
    "subset that contains it), and the curve is a 10-point walk over "
    "that tiny table — no corpus-scale sort, no global window, no RNG "
    "(the engine's hash-sampling convention; hex→BIGINT via the "
    "round-6 conv/CAST equivalence). All counts exact; vocab_per_doc "
    "one division — hash-gated.",
    tags=("text", "stats"),
)
def text_vocab_growth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.functions.text import tokens

    docs = load(spark, sf_dir, "documents")
    db = docs.select(
        "doc_id",
        "text",
        F.expr(
            "conv(substr(md5(CAST(doc_id AS STRING)), 1, 2), 16, 10)"
        )
        .cast("long")
        .alias("bucket"),
    ).persist()
    wmin = (
        db.select("bucket", F.explode(tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.min("bucket").cast("long").alias("min_bucket"))
    )
    grid = spark.createDataFrame(
        [(t,) for t in _VG_THRESH], "t long"
    )
    # broadcast the 10-row grid, stream the corpus-/vocab-scaled side
    dcounts = (
        db.select("bucket")
        .join(F.broadcast(grid), F.col("bucket") <= F.col("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    vcounts = (
        wmin.select("min_bucket")
        .join(F.broadcast(grid), F.col("min_bucket") <= F.col("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("long").alias("vocab"))
    )
    return (
        dcounts.join(vcounts, "t")
        .select(
            "t",
            "n_docs",
            "vocab",
            (
                F.col("vocab").cast("double") / F.col("n_docs").cast("double")
            ).alias("vocab_per_doc"),
        )
    )


@QS.add(
    "text_simpson_concentration",
    f"""
    WITH w AS (
      SELECT source, word, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT source, unnest({_TOKS}) AS word FROM documents)
      GROUP BY source, word
    ),
    agg AS (
      SELECT source,
             CAST(SUM(c) AS BIGINT) AS n_tokens,
             CAST(COUNT(*) AS BIGINT) AS n_vocab,
             CAST(SUM(c * (c - 1)) AS BIGINT) AS rep_pairs
      FROM w GROUP BY source
    )
    SELECT source, n_tokens, n_vocab, rep_pairs,
           CASE WHEN n_tokens < 2 THEN NULL
                ELSE CAST(rep_pairs AS DOUBLE)
                     / CAST(n_tokens * (n_tokens - 1) AS DOUBLE) END
             AS simpson,
           CASE WHEN rep_pairs = 0 THEN NULL
                ELSE CAST(n_tokens * (n_tokens - 1) AS DOUBLE)
                     / CAST(rep_pairs AS DOUBLE) END AS inv_simpson
    FROM agg
    """,
    doc="[EXT] Simpson lexical concentration per source: λ = Σc(c−1) / "
    "(T(T−1)) — the probability two random token draws are the SAME "
    "word — and its inverse (effective vocabulary size). The LOG-FREE "
    "diversity index (Shannon entropy is JVM-vs-libm unportable, the "
    "round-8 log rule; Simpson is exact BIGINT pair counting + ONE "
    "division), completing the vocabulary-statistics family next to "
    "Chao1 (unseen mass) and Heaps (growth): concentration flags "
    "boilerplate/templated sources a dedup pass should visit first. "
    "NULL guards: undefined below 2 tokens / with no repeated pair "
    "(never NaN/Inf — hash discipline).",
    tags=("text",),
)
def text_simpson_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.functions.text import tokens

    docs = load(spark, sf_dir, "documents")
    w = (
        docs.select("source", F.explode(tokens(F.col("text"))).alias("word"))
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    agg = w.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_vocab"),
        F.sum(F.col("c") * (F.col("c") - 1)).cast("long").alias("rep_pairs"),
    )
    tt = F.col("n_tokens") * (F.col("n_tokens") - 1)
    return agg.select(
        "source",
        "n_tokens",
        "n_vocab",
        "rep_pairs",
        F.when(F.col("n_tokens") < 2, F.lit(None).cast("double"))
        .otherwise(F.col("rep_pairs").cast("double") / tt.cast("double"))
        .alias("simpson"),
        F.when(F.col("rep_pairs") == 0, F.lit(None).cast("double"))
        .otherwise(tt.cast("double") / F.col("rep_pairs").cast("double"))
        .alias("inv_simpson"),
    )


@QS.add(
    "text_source_overlap",
    f"""
    WITH v AS (
      SELECT DISTINCT source, word
      FROM (SELECT source, unnest({_TOKS}) AS word FROM documents)
    ),
    sizes AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM v GROUP BY source
    ),
    inter AS (
      SELECT a.source AS src_a, b.source AS src_b,
             CAST(COUNT(*) AS BIGINT) AS n_common
      FROM v a JOIN v b ON a.word = b.word AND a.source < b.source
      GROUP BY a.source, b.source
    )
    SELECT i.src_a, i.src_b, sa.n AS n_a, sb.n AS n_b, i.n_common,
           CAST(i.n_common AS DOUBLE)
             / CAST(sa.n + sb.n - i.n_common AS DOUBLE) AS jaccard,
           CAST(i.n_common AS DOUBLE)
             / CAST(LEAST(sa.n, sb.n) AS DOUBLE) AS containment
    FROM inter i
    JOIN sizes sa ON sa.source = i.src_a
    JOIN sizes sb ON sb.source = i.src_b
    """,
    doc="[EXT] pairwise vocabulary overlap between sources: Jaccard and "
    "containment of the distinct-word sets for every source pair — the "
    "corpus-mixing diagnostic (two sources with near-identical "
    "vocabularies add redundancy, not coverage; a low-containment "
    "source is the one worth upsampling). Work is an equi-join on the "
    "word over the DISTINCT (source, word) table — vocabulary-scaled, "
    "never corpus-scaled, and pair counts are exact BIGINTs with two "
    "single divisions. Pairs with zero shared words are absent (inner "
    "join) — identical on both engines.",
    tags=("text",),
)
def text_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.functions.text import tokens

    docs = load(spark, sf_dir, "documents")
    v = (
        docs.select("source", F.explode(tokens(F.col("text"))).alias("word"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    sizes = v.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n"))
    a = v.select(F.col("source").alias("src_a"), "word")
    b = v.select(F.col("source").alias("src_b"), "word")
    inter = (
        a.join(b, "word")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    return (
        inter.join(
            F.broadcast(sizes.select(F.col("source").alias("src_a"), F.col("n").alias("n_a"))),
            "src_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("source").alias("src_b"), F.col("n").alias("n_b"))),
            "src_b",
        )
        .select(
            "src_a",
            "src_b",
            "n_a",
            "n_b",
            "n_common",
            (
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double")
            ).alias("jaccard"),
            (
                F.col("n_common").cast("double")
                / F.least("n_a", "n_b").cast("double")
            ).alias("containment"),
        )
    )


@QS.add(
    "text_source_tv_distance",
    f"""
    WITH w AS (
      SELECT source, word, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT source, unnest({_TOKS}) AS word FROM documents)
      GROUP BY source, word
    ),
    tot AS (
      SELECT source, CAST(SUM(c) AS BIGINT) AS t FROM w GROUP BY source
    ),
    pairs AS (
      -- SHARED words only; one-sided mass is closed-form (see miss)
      SELECT a.source AS src_a, b.source AS src_b, a.word,
             a.c AS ca, b.c AS cb
      FROM w a JOIN w b ON a.word = b.word AND a.source < b.source
    ),
    folded AS (
      SELECT p.src_a, p.src_b,
             CAST(SUM(abs(p.ca * tb.t - p.cb * ta.t)) AS BIGINT) AS num,
             MAX(ta.t) AS ta, MAX(tb.t) AS tb
      FROM pairs p
      JOIN tot ta ON ta.source = p.src_a
      JOIN tot tb ON tb.source = p.src_b
      GROUP BY p.src_a, p.src_b
    ),
    miss AS (
      -- words present in exactly one side still contribute |p - 0|:
      -- Σ_unshared ca·tb = (Ta − Σ_shared ca)·tb, likewise the other
      -- side, so the full numerator needs only the SHARED join plus
      -- per-pair shared-mass totals.
      SELECT a.source AS src_a, b.source AS src_b,
             CAST(SUM(a.c) AS BIGINT) AS sh_a,
             CAST(SUM(b.c) AS BIGINT) AS sh_b
      FROM w a JOIN w b ON a.word = b.word AND a.source < b.source
      GROUP BY a.source, b.source
    )
    SELECT f.src_a, f.src_b, f.ta AS t_a, f.tb AS t_b,
           CAST(f.num + (f.ta - m.sh_a) * f.tb + (f.tb - m.sh_b) * f.ta
                AS BIGINT) AS tv_num,
           CAST(f.num + (f.ta - m.sh_a) * f.tb + (f.tb - m.sh_b) * f.ta
                AS DOUBLE) / CAST(2 * f.ta * f.tb AS DOUBLE) AS tv_distance
    FROM folded f JOIN miss m ON m.src_a = f.src_a AND m.src_b = f.src_b
    """,
    doc="[EXT] pairwise TOTAL-VARIATION distance between source unigram "
    "distributions: TV = ½ Σ_w |p_a(w) − p_b(w)| — the distributional "
    "companion to text_source_overlap's set view (two sources can share "
    "every word yet weight them oppositely), and the log-free "
    "divergence (JS/KL need ln — unportable): the numerator is the "
    "exact BIGINT cross-multiplication Σ|c_a·T_b − c_b·T_a| over "
    "SHARED words plus closed-form one-sided mass (T−shared)·T_other, "
    "one final division by 2·T_a·T_b. Joins ride the (source, word) "
    "aggregate — vocabulary-scaled.",
    tags=("text",),
)
def text_source_tv_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.functions.text import tokens

    docs = load(spark, sf_dir, "documents")
    w = (
        docs.select("source", F.explode(tokens(F.col("text"))).alias("word"))
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=True)
    )
    tot = w.groupBy("source").agg(F.sum("c").cast("long").alias("t"))
    a = w.select(F.col("source").alias("src_a"), "word", F.col("c").alias("ca"))
    b = w.select(F.col("source").alias("src_b"), "word", F.col("c").alias("cb"))
    shared = a.join(b, "word").filter(F.col("src_a") < F.col("src_b"))
    ta = tot.select(F.col("source").alias("src_a"), F.col("t").alias("ta"))
    tb = tot.select(F.col("source").alias("src_b"), F.col("t").alias("tb"))
    agg = (
        shared.join(F.broadcast(ta), "src_a")
        .join(F.broadcast(tb), "src_b")
        .groupBy("src_a", "src_b")
        .agg(
            F.sum(F.abs(F.col("ca") * F.col("tb") - F.col("cb") * F.col("ta")))
            .cast("long")
            .alias("num"),
            F.max("ta").cast("long").alias("ta"),
            F.max("tb").cast("long").alias("tb"),
            F.sum("ca").cast("long").alias("sh_a"),
            F.sum("cb").cast("long").alias("sh_b"),
        )
    )
    tv_num = (
        F.col("num")
        + (F.col("ta") - F.col("sh_a")) * F.col("tb")
        + (F.col("tb") - F.col("sh_b")) * F.col("ta")
    )
    return agg.select(
        "src_a",
        "src_b",
        F.col("ta").alias("t_a"),
        F.col("tb").alias("t_b"),
        tv_num.cast("long").alias("tv_num"),
        (tv_num.cast("double") / (2 * F.col("ta") * F.col("tb")).cast("double")).alias(
            "tv_distance"
        ),
    )


# ---------------------------------------------------------------------------
# Gopher-style quality-filter funnel: cumulative attrition per rule.
# ---------------------------------------------------------------------------


@QS.add(
    "corpus_quality_funnel",
    f"""
    WITH flags AS MATERIALIZED (
      SELECT
        (text IS NOT NULL AND length(trim(text)) > 0) AS f1,
        n_chars >= 100 AS f2,
        len({_TOKS}) >= 20 AS f3,
        10 * len(list_distinct({_TOKS})) >= 3 * len({_TOKS}) AS f4,
        list_max(list_transform({_TOKS}, t -> length(t))) <= 40 AS f5,
        CAST(len({_TOKS}) AS BIGINT) AS toks
      FROM documents
    ),
    stages AS (
      SELECT 0 AS stage, 'all' AS stage_name,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(toks) AS BIGINT) AS n_tokens FROM flags
      UNION ALL
      SELECT 1, 'nonempty', COUNT(*), CAST(SUM(toks) AS BIGINT)
      FROM flags WHERE f1
      UNION ALL
      SELECT 2, 'min_chars_100', COUNT(*), CAST(SUM(toks) AS BIGINT)
      FROM flags WHERE f1 AND f2
      UNION ALL
      SELECT 3, 'min_tokens_20', COUNT(*), CAST(SUM(toks) AS BIGINT)
      FROM flags WHERE f1 AND f2 AND f3
      UNION ALL
      SELECT 4, 'diversity_30pct', COUNT(*), CAST(SUM(toks) AS BIGINT)
      FROM flags WHERE f1 AND f2 AND f3 AND f4
      UNION ALL
      SELECT 5, 'max_token_len_40', COUNT(*), CAST(SUM(toks) AS BIGINT)
      FROM flags WHERE f1 AND f2 AND f3 AND f4 AND f5
    ),
    base AS (SELECT n_docs AS n0 FROM stages WHERE stage = 0)
    SELECT s.stage, s.stage_name, s.n_docs, s.n_tokens,
           CAST(s.n_docs AS DOUBLE) / CAST(b.n0 AS DOUBLE) AS retained
    FROM stages s, base b
    """,
    doc="[EXT] quality-filter funnel (the Gopher/C4-style attrition "
    "report a training-corpus release documents): documents and tokens "
    "surviving each CUMULATIVE rule — nonempty, length floor, token "
    "floor, lexical-diversity floor (10*distinct >= 3*total, integer "
    "cross-multiplication), max-token-length cap (boilerplate/garbage "
    "screen). One corpus scan computes all per-doc flags; each stage is "
    "a conditional aggregate over the SAME flag table (no re-scan); "
    "retained-fraction is one division. Exact BIGINT counts; the "
    "false AND NULL = false law makes null-text rows drop identically "
    "on both engines.",
    tags=("text", "quality", "mlprep"),
    headline=True,
)
def corpus_quality_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return quality_funnel_from_docs(docs)


#: The cumulative funnel stages (index -> name); rules live in
#: funnel_stage_counts so batch and streaming twins can never drift.
FUNNEL_STAGES = (
    "all",
    "nonempty",
    "min_chars_100",
    "min_tokens_20",
    "diversity_30pct",
    "max_token_len_40",
)


def funnel_stage_counts(docs: DataFrame) -> DataFrame:
    """(stage, stage_name, n_docs, n_tokens) for one docs batch — the
    additive state the streaming monitor accumulates per trigger."""
    from clinical_api_etl_spark.functions.text import tokens as _tok

    t = _tok(F.col("text"))
    flags = docs.select(
        (F.col("text").isNotNull() & (F.length(F.trim("text")) > 0)).alias("f1"),
        (F.col("n_chars") >= 100).alias("f2"),
        (F.size(t) >= 20).alias("f3"),
        (10 * F.size(F.array_distinct(t)) >= 3 * F.size(t)).alias("f4"),
        (
            F.array_max(F.transform(t, lambda s: F.length(s))) <= 40
        ).alias("f5"),
        F.size(t).cast("long").alias("toks"),
    ).localCheckpoint(eager=True)
    conds = {
        0: F.lit(True),
        1: F.col("f1"),
        2: F.col("f1") & F.col("f2"),
        3: F.col("f1") & F.col("f2") & F.col("f3"),
        4: F.col("f1") & F.col("f2") & F.col("f3") & F.col("f4"),
        5: F.col("f1") & F.col("f2") & F.col("f3") & F.col("f4") & F.col("f5"),
    }
    aggs = []
    for i, cond in conds.items():
        aggs.append(
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(f"d{i}")
        )
        aggs.append(
            F.sum(F.when(cond, F.col("toks")).otherwise(0))
            .cast("long")
            .alias(f"t{i}")
        )
    wide = flags.agg(*aggs)
    stack_args = ", ".join(
        f"{i}, '{FUNNEL_STAGES[i]}', d{i}, t{i}" for i in conds
    )
    return wide.selectExpr(
        f"stack(6, {stack_args}) AS (stage, stage_name, n_docs, n_tokens)"
    ).select(
        F.col("stage").cast("int").alias("stage"),
        "stage_name",
        "n_docs",
        "n_tokens",
    )


def quality_funnel_from_docs(docs: DataFrame) -> DataFrame:
    """Full funnel report (counts + retained fraction) for a docs frame."""
    stages = funnel_stage_counts(docs)
    base = stages.filter(F.col("stage") == 0).select(
        F.col("n_docs").alias("n0")
    )
    return stages.crossJoin(F.broadcast(base)).select(
        "stage",
        "stage_name",
        "n_docs",
        "n_tokens",
        (F.col("n_docs").cast("double") / F.col("n0").cast("double")).alias(
            "retained"
        ),
    )


# ---------------------------------------------------------------------------
# Deduplication survivorship: kept/dropped per source after near-dup
# clustering (the release-notes table of a dedup run).
# ---------------------------------------------------------------------------


@QS.add(
    "dedup_survivorship_by_source",
    f"""
    WITH RECURSIVE pairs AS ({_PAIRS_06_SQL}),
    edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION ALL
      SELECT id_b, id_a FROM pairs
    ),
    verts AS (SELECT DISTINCT a AS id FROM edges),
    walk(id, label) AS (
      SELECT id, id FROM verts
      UNION
      SELECT e.a, w.label FROM walk w JOIN edges e ON w.id = e.b
      WHERE w.label < e.a
    ),
    comp AS MATERIALIZED (
      SELECT id AS doc_id, MIN(label) AS component FROM walk GROUP BY id
    ),
    keepers AS (
      SELECT component, MIN(doc_id) AS keep_id FROM comp GROUP BY component
    ),
    labeled AS (
      SELECT d.source,
             CASE WHEN c.doc_id IS NULL THEN TRUE
                  ELSE k.keep_id = d.doc_id END AS kept
      FROM documents d
      LEFT JOIN comp c ON c.doc_id = d.doc_id
      LEFT JOIN keepers k ON k.component = c.component
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN kept THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped,
           CAST(SUM(CASE WHEN kept THEN 0 ELSE 1 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS drop_rate
    FROM labeled GROUP BY source
    """,
    doc="[EXT] dedup survivorship report: after 0.6-Jaccard near-dup "
    "clustering (dedup_components' groups), keep the MIN-doc_id "
    "representative per cluster plus every singleton, and report "
    "kept/dropped counts and drop rate PER SOURCE — the release-notes "
    "table a corpus dedup run publishes, and the per-domain skew check "
    "(is one source contributing all the duplicates?). Spark reuses "
    "ngram_jaccard_pairs + min-label connected components; the keeper "
    "rule is canonical (min id), so the composed artifact hash-matches "
    "the recursive-CTE closure end to end. Counts exact BIGINT; drop "
    "rate one division.",
    tags=("dedup", "quality"),
)
def dedup_survivorship_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.dedup import ngram_jaccard_pairs
    from clinical_api_etl_spark.operators.graph import connected_components

    docs = load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.6)
    comp = connected_components(pairs).select(
        F.col("id").alias("doc_id"), "component"
    ).localCheckpoint(eager=True)
    keepers = comp.groupBy("component").agg(F.min("doc_id").alias("keep_id"))
    labeled = (
        docs.join(comp, "doc_id", "left")
        # keeper set is O(components) — scales with the corpus; unhinted
        .join(keepers, "component", "left")
        .select(
            "source",
            F.when(F.col("component").isNull(), F.lit(True))
            .otherwise(F.col("keep_id") == F.col("doc_id"))
            .alias("kept"),
        )
    )
    return labeled.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("kept"), 1).otherwise(0)).cast("long").alias("n_kept"),
        F.sum(F.when(F.col("kept"), 0).otherwise(1)).cast("long").alias("n_dropped"),
        (
            F.sum(F.when(F.col("kept"), 0).otherwise(1)).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("drop_rate"),
    )
