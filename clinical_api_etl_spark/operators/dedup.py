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


def _hashed_shingles(text: Column, n: int) -> Column:
    """Sorted distinct ``xxhash64`` longs of the word n-gram shingles.

    Hashes straight from the raw n-gram stream: a string-level
    ``array_distinct`` (as in :func:`word_shingles`) would cost an extra
    interpreted pass per row only to be subsumed by the distinct over
    sorted hashes (duplicate n-grams hash equal). Same semantics incl. the
    shorter-than-n whole-text shingle. Jaccard over the hashed sets equals
    Jaccard over the string sets unless two distinct shingles of the same
    doc pair collide in 64 bits (P ≈ |union|²/2⁶⁵ — negligible).
    """
    from clinical_api_etl_spark.functions.text import tokens as _toks

    toks = _toks(text)
    raw_ngrams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.array_distinct(
        F.array_sort(F.transform(raw_ngrams, lambda s: F.xxhash64(s)))
    )


def _prefix_filter_candidates(sh: DataFrame, threshold: float) -> DataFrame:
    """Prefix-filter candidate pairs over a (doc_id, shingles) table.

    PPJoin-style pruning at join-probe time (integer predicates — nearly
    free, applied before the dedup shuffle and the verify joins):

    * length filter: J ≥ t ⇒ min(|A|,|B|) ≥ t·max(|A|,|B|);
    * position filter: a match at 0-based prefix positions (p_a, p_b)
      bounds the overlap by min(p_a,p_b) possibly-common earlier
      elements + this one + min of the suffix lengths, which must reach
      α = ⌈t/(1+t)·(|A|+|B|)⌉ (the overlap any ≥t pair needs). The
      bound holds for every match row, so true pairs always survive.
    """
    pre_len = (
        F.size("shingles") - F.ceil(F.lit(threshold) * F.size("shingles")) + 1
    ).cast("int")
    prefix = sh.select(
        "doc_id",
        F.size("shingles").alias("n_sh"),
        F.posexplode(F.slice("shingles", F.lit(1), pre_len)).alias("pos", "shingle"),
    )
    n_a, n_b = F.col("a.n_sh"), F.col("b.n_sh")
    p_a, p_b = F.col("a.pos"), F.col("b.pos")
    alpha = F.ceil(F.lit(threshold / (1.0 + threshold)) * (n_a + n_b))
    overlap_ub = (
        F.lit(1) + F.least(p_a, p_b) + F.least(n_a - p_a - 1, n_b - p_b - 1)
    )
    return (
        prefix.alias("a")
        .join(
            prefix.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.least(n_a, n_b) >= F.lit(threshold) * F.greatest(n_a, n_b))
            & (overlap_ub >= alpha),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        # Candidate rows are tiny (two longs) so AQE would coalesce the
        # dedup exchange into ~one partition and serialize the verify
        # stage. An explicit hash repartition on the pair key both feeds
        # dropDuplicates (same required distribution — no extra exchange)
        # and pins the verify parallelism, since AQE leaves user-specified
        # repartitions alone.
        .repartition(
            sh.sparkSession.sparkContext.defaultParallelism, "id_a", "id_b"
        )
        .dropDuplicates(["id_a", "id_b"])
    )


def ngram_jaccard_candidates(
    df: DataFrame, id_col: str, text_col: str, *, n: int = 3, threshold: float = 0.8
) -> DataFrame:
    """The candidate-pair stage of :func:`ngram_jaccard_pairs` alone —
    scaling telemetry: the operator's cost driver is candidate count, so
    candidates-vs-output across scale factors is the evidence for the
    output-bound law (PERF.md)."""
    sh = df.repartition(df.sparkSession.sparkContext.defaultParallelism).select(
        F.col(id_col).alias("doc_id"),
        _hashed_shingles(F.col(text_col), n).alias("shingles"),
    )
    # Persist BEFORE the self-join (mirrors ngram_jaccard_pairs): the
    # expensive _hashed_shingles higher-order expression feeds BOTH join
    # sides, and HOF expressions get no codegen subexpression elimination
    # (CLAUDE.md round-1 finding) — unpersisted it would be recomputed
    # twice, overstating the candidate stage in the scaling telemetry.
    sh = sh.persist()
    return _prefix_filter_candidates(sh, threshold)


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, *, n: int = 3, threshold: float = 0.8
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs: |A∩B| / |A∪B| ≥ threshold.

    Uses **prefix filtering** so the self-join never touches most shingles:
    J(A,B) ≥ t implies |A∩B| ≥ t·|A| (the union contains A), so any subset
    of A with more than |A| − ⌈t·|A|⌉ elements must intersect A∩B. With a
    single global shingle order, the (n − ⌈t·n⌉ + 1)-prefix of each doc is
    therefore guaranteed to share an element with the prefix of any
    ≥t-similar doc. The global order here is ``(xxhash64(shingle),
    shingle)`` — computed *per row* with ``array_sort``, so prefix
    extraction is a narrow projection with zero shuffles (a
    document-frequency order would be marginally more selective but costs a
    full groupBy + join per run; hash order is unbiased and free).
    Candidates are verified exactly on the full shingle arrays, so the
    result is identical to the naive shingle self-join.

    Physical notes, in order of impact at 100 TB:

    * Shingles are hashed to ``xxhash64`` longs immediately; every
      downstream structure (prefix keys, join keys, verify arrays) is
      numeric — ~4× less shuffle/broadcast volume than shingle strings and
      cheaper set intersection. Jaccard over the hashed sets equals Jaccard
      over the string sets unless two distinct shingles of the same doc
      pair collide in 64 bits (P ≈ |union|²/2⁶⁵ — negligible).
    * The sorted hash array doubles as the prefix order (``array_sort`` of
      longs — a per-row narrow op; no groupBy/collect_list).
    * Shingling is used by both self-join sides and both verify sides, and
      higher-order functions don't participate in codegen subexpression
      elimination — so the shingle table is repartitioned to the session
      default parallelism (document files are often few/large) and
      persisted once, MLlib-style.
    * Verify joins the (small) candidate-pair table back to the shingle
      table on doc id; AQE broadcasts whichever side fits.
    """
    sh = (
        df.repartition(df.sparkSession.sparkContext.defaultParallelism)
        .select(
            F.col(id_col).alias("doc_id"),
            _hashed_shingles(F.col(text_col), n).alias("shingles"),
        )
        .persist()
    )
    cand = _prefix_filter_candidates(sh, threshold)
    # Exact verify on the full (hashed) shingle sets. |A∪B| is derived as
    # |A| + |B| − |A∩B| — array_union would allocate a merged array per
    # pair just to take its size.
    with_sets = cand.join(
        sh.select(F.col("doc_id").alias("id_a"), F.col("shingles").alias("sh_a")),
        "id_a",
    ).join(
        sh.select(F.col("doc_id").alias("id_b"), F.col("shingles").alias("sh_b")),
        "id_b",
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = inter.cast("double") / union.cast("double")
    return with_sets.select("id_a", "id_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= threshold
    )


def ngram_overlap(
    train: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 5,
) -> DataFrame:
    """Decontamination scan: for each training document, how many distinct
    word n-grams it shares with ANY benchmark document, and with how many
    benchmark documents it overlaps at all.

    The eval-set-leakage check of an LLM data pipeline: any training doc
    with ``n_shared > 0`` contains verbatim benchmark n-grams and is a
    removal candidate. Same physical shape as ``ngram_jaccard_pairs``
    candidate generation — shingles hash to longs, the join is a bucketed
    equi-join on the shingle hash (work scales with shared-shingle mass,
    never |train|×|bench|), and the benchmark side (inherently small)
    broadcasts.

    Output: (train_id, n_shared, n_bench_docs), overlapping docs only.
    """
    t = train.select(
        F.col(id_col).alias("train_id"),
        F.explode(_hashed_shingles(F.col(text_col), n)).alias("shingle"),
    )
    b = bench.select(
        F.col(id_col).alias("bench_id"),
        F.explode(_hashed_shingles(F.col(text_col), n)).alias("shingle"),
    )
    return (
        t.join(F.broadcast(b), "shingle")
        .groupBy("train_id")
        .agg(
            F.countDistinct("shingle").cast("long").alias("n_shared"),
            F.countDistinct("bench_id").cast("long").alias("n_bench_docs"),
        )
    )


def minhash_signature(shingles: Column, num_hashes: int) -> Column:
    """MinHash signature as array<long>: for hash i, min over shingles of
    xxhash64(shingle, "mh<i>"). Works on string shingles or pre-hashed
    longs (xxhash64 accepts either). Pure column expression — computed in
    one projection, no explode."""
    # NB: a `lambda s, i=i:` closure here would be an ARITY-2 lambda —
    # pyspark's transform() then passes the array INDEX as `i`, and the
    # f-string embeds str(Column) (auto-named x_N, global counter) into
    # the seed: signatures become build-dependent and irreproducible
    # across processes (broke streaming/neardup.py's persisted state).
    # Single-arity closures keep the seed a real per-i constant.
    def _mh(i: int):
        return lambda s: F.xxhash64(s, F.lit(f"mh{i}"))

    return F.array(
        *[F.array_min(F.transform(shingles, _mh(i))) for i in range(num_hashes)]
    )


def lsh_bands(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
) -> DataFrame:
    """LSH band table (doc_id, band, bucket) — the collision key shared
    by batch pair-mining and streaming admission (streaming/neardup.py).

    Docs with FEWER than ``n`` tokens produce an empty shingle set and are
    EXCLUDED here: their band hash would be the hash of an all-null
    signature, making every short doc collide with every other in every
    band. Batch pair-mining survives that via the exact-Jaccard verify;
    an admission path must instead treat no-content docs as non-colliding
    (always admissible), which this exclusion implements.
    """
    rows = num_hashes // bands
    sh = df.select(
        F.col(id_col).alias("doc_id"),
        _hashed_shingles(F.col(text_col), n).alias("shingles"),
    ).filter(F.size("shingles") >= 1)
    sigs = sh.select(
        "doc_id", minhash_signature(F.col("shingles"), num_hashes).alias("sig")
    )
    band_cols = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    F.concat_ws(
                        ",",
                        *[
                            F.element_at("sig", b * rows + r + 1)
                            for r in range(rows)
                        ],
                    )
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
    )
    return sigs.select("doc_id", F.explode(band_cols).alias("bb")).select(
        "doc_id",
        F.col("bb.band").alias("band"),
        F.col("bb.bucket").alias("bucket"),
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

    Physical shape mirrors ``ngram_jaccard_pairs``:

    * input repartitioned to default parallelism (single-file parquet would
      otherwise run the whole sketch on one task);
    * shingles hashed to ``xxhash64`` longs once and persisted — the
      signature and both verify sides read the same cached table;
    * the band self-join carries **ids only** (band, bucket, doc_id — three
      longs); shingle arrays re-join by doc id after candidate dedup, so
      the corpus is never shuffled ×bands;
    * candidate pairs explicitly repartitioned on the pair key to pin
      verify parallelism against AQE coalescing.
    """
    rows = num_hashes // bands
    sh = (
        df.repartition(df.sparkSession.sparkContext.defaultParallelism)
        .select(
            F.col(id_col).alias("doc_id"),
            _hashed_shingles(F.col(text_col), n).alias("shingles"),
        )
        .persist()
    )
    # sig MUST be materialized as a named column before element_at slices
    # it: higher-order expressions get no codegen subexpression elimination,
    # so inlining the 32-min-hash array into 32 element_at calls would
    # evaluate the whole signature 32× per row (CollapseProject keeps the
    # boundary because the alias is non-cheap and multiply referenced).
    sigs = sh.select(
        "doc_id", minhash_signature(F.col("shingles"), num_hashes).alias("sig")
    )
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
    buckets = sigs.select("doc_id", F.explode(band_cols).alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    a = buckets.select(F.col("doc_id").alias("id_a"), "band", "bucket")
    b = buckets.select(F.col("doc_id").alias("id_b"), "band", "bucket")
    candidates = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .repartition(
            df.sparkSession.sparkContext.defaultParallelism, "id_a", "id_b"
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    with_sets = candidates.join(
        sh.select(F.col("doc_id").alias("id_a"), F.col("shingles").alias("sh_a")),
        "id_a",
    ).join(
        sh.select(F.col("doc_id").alias("id_b"), F.col("shingles").alias("sh_b")),
        "id_b",
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = inter.cast("double") / union.cast("double")
    return with_sets.select("id_a", "id_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= threshold
    )


def simhash_bits(tokens_col: Column, bits: int = 64) -> Column:
    """SimHash signature as an array<int> of ``bits`` 0/1 entries.

    Per bit j: sign of Σ_tokens (±1 depending on bit j of xxhash64(token)).
    Folded with ``aggregate`` into a vote array — pure column expression,
    JVM-side, no UDF. Kept as a bit array (not packed into a BIGINT): band
    extraction and Hamming distance are then plain array ops, and ANSI-mode
    long-overflow concerns disappear.

    NOTE: the expression form costs ``bits`` interpreted lambda evals per
    token (higher-order functions don't codegen); prefer
    :func:`simhash_signatures` on whole tables — same signature values via
    explode + whole-stage-codegen'd sums.
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


def simhash_signatures(
    df: DataFrame, id_col: str, text_col: str, bits: int = 64
) -> DataFrame:
    """(doc_id, sig) with the same values as :func:`simhash_bits`, computed
    the codegen-friendly way: explode tokens, hash once per token, then
    ``bits`` integer ``sum(when(getbit...))`` aggregates — one shuffle of
    (doc_id, hash) pairs with map-side partial aggregation, every
    expression inside whole-stage codegen. Integer sums are exact, so the
    result is order-independent and identical to the interpreted fold.
    """
    from clinical_api_etl_spark.functions.text import tokens as _tokens

    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_tokens(F.col(text_col))).alias("tok"),
    ).select("doc_id", F.xxhash64("tok").alias("h"))
    # Branch-free per-bit tally: s_j = Σ ((h >> j) & 1) and one row count.
    # The ±1 vote sum is v_j = 2·s_j − n, so the sign bit is 2·s_j > n —
    # algebraically identical to summing when(getbit)=±1 votes, but each
    # of the 64 aggregate expressions is a shift+mask+add instead of a
    # conditional (measurably cheaper across rows×64 evals).
    votes = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tok"),
        *[
            F.sum(F.shiftright("h", j).bitwiseAND(F.lit(1))).alias(f"s{j}")
            for j in range(bits)
        ],
    )
    sig = F.array(
        *[
            F.when(2 * F.col(f"s{j}") > F.col("n_tok"), F.lit(1)).otherwise(F.lit(0))
            for j in range(bits)
        ]
    )
    return votes.select("doc_id", sig.alias("sig"))


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, *, max_hamming: int = 3
) -> DataFrame:
    """SimHash near-dup pairs: Hamming(sig_a, sig_b) ≤ max_hamming.

    Candidates come from ``max_hamming + 1`` contiguous bit bands (a pair
    within Hamming ≤ h differs in ≤ h bands, so by pigeonhole it agrees on
    at least one of h+1 — candidate generation is therefore *complete* for
    any ``max_hamming`` in [0, 63]), then exact Hamming verify.

    Physical shape mirrors ``ngram_jaccard_pairs``: input repartitioned to
    default parallelism and the signature table persisted; the band
    self-join carries ids only (signatures re-join by doc id after the
    candidate dedup), and candidate pairs are explicitly repartitioned on
    the pair key to pin verify parallelism against AQE coalescing.
    """
    if not 0 <= max_hamming <= 63:
        raise ValueError(f"max_hamming must be in [0, 63], got {max_hamming}")

    bits = 64
    n_bands = max_hamming + 1
    # Contiguous near-even band widths covering all 64 bits.
    base, rem = divmod(bits, n_bands)
    widths = [base + (1 if b < rem else 0) for b in range(n_bands)]
    starts = [sum(widths[:b]) for b in range(n_bands)]

    sh = simhash_signatures(
        df.repartition(df.sparkSession.sparkContext.defaultParallelism),
        id_col,
        text_col,
        bits,
    ).persist()
    band_arr = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    F.concat_ws("", F.slice(F.col("sig"), starts[b] + 1, widths[b]))
                ).alias("bucket"),
            )
            for b in range(n_bands)
        ]
    )
    buckets = sh.select("doc_id", F.explode(band_arr).alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    a = buckets.select(F.col("doc_id").alias("id_a"), "band", "bucket")
    b = buckets.select(F.col("doc_id").alias("id_b"), "band", "bucket")
    candidates = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .repartition(
            df.sparkSession.sparkContext.defaultParallelism, "id_a", "id_b"
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.aggregate(
        F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: F.abs(x - y)),
        F.lit(0),
        lambda acc, x: acc + x,
    ).cast("long")
    return (
        candidates.join(
            sh.select(F.col("doc_id").alias("id_a"), F.col("sig").alias("sig_a")),
            "id_a",
        )
        .join(
            sh.select(F.col("doc_id").alias("id_b"), F.col("sig").alias("sig_b")),
            "id_b",
        )
        .select("id_a", "id_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def canonical_docs(
    docs: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "doc_id",
    score_col: str = "n_chars",
) -> DataFrame:
    """Dedup RESOLUTION: collapse near-dup pairs into groups and pick one
    canonical survivor per group — the step that turns pair detection into
    an actionable keep/drop list for a training corpus.

    Group = connected component over the pairs (A~B~C is one group even if
    A~C never paired); survivor = the group's highest-``score_col`` doc
    (keep-the-longest is the common rule), ties to the LOWEST id —
    deterministic. Docs in no pair survive as their own singleton group.

    Output: (id, group, canonical_id, is_canonical) for every input doc —
    the full resolution map (filter ``is_canonical`` for the kept corpus,
    join ``canonical_id`` to re-point references at survivors).

    Scale: components over EDGES only (pair output is tiny next to the
    corpus), one broadcast-sized join back to docs, one window on the
    group key. Near-dup groups are small and dense, so the window never
    sees a hot key.
    """
    from pyspark.sql.window import Window as W

    from clinical_api_etl_spark.operators.graph import connected_components

    comp = connected_components(pairs)
    base = docs.select(
        F.col(id_col).alias("id"), F.col(score_col).alias("_score")
    ).join(comp, "id", "left")
    grouped = base.withColumn("group", F.coalesce("component", "id"))
    w = W.partitionBy("group").orderBy(F.desc("_score"), F.asc("id"))
    return (
        grouped.withColumn("_rk", F.row_number().over(w))
        .withColumn(
            "canonical_id",
            F.min(F.when(F.col("_rk") == 1, F.col("id"))).over(
                W.partitionBy("group")
            ),
        )
        .select(
            "id",
            "group",
            "canonical_id",
            (F.col("_rk") == 1).alias("is_canonical"),
        )
    )


def substring_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Substring-level exact dedup: remove VERBATIM k-token spans that
    repeat across (or within) the corpus — the distributed, hash-gatable
    form of the suffix-array method in "Deduplicating Training Data Makes
    Language Models Better" (Lee et al. 2022, public; reference uses a
    single-node suffix array over the concatenated corpus).

    Equivalence bound: the suffix array removes every repeated substring
    of length ≥ L characters; this operator removes every repeated
    **k-token window**, which covers exactly the repeated TOKEN substrings
    of length ≥ k (any such substring is a union of repeated k-windows,
    and every repeated k-window is a repeated substring). Tokens shorter
    than k that repeat are kept — the deliberate trade for a shuffle-only
    plan. Output grain: one row per document — merged cut spans (token
    offsets), removal counters, and the md5 of the cleaned text (kept
    tokens joined by single spaces; whitespace is normalized by the
    tokenizer on both engines).

    Pipeline (every step a shuffle-friendly relational op):

    1. per-doc rolling windows: position i → md5 of the k-token slice —
       32 hex chars shuffle per position instead of k tokens, and md5 is
       REPLAYABLE IN DUCKDB, so corpus-wide counts (incl. collisions)
       are identical in both engines (xxhash64 would be Spark-only);
    2. global window counts → repeated = count ≥ ``min_count``
       (one groupBy with map-side partials — the only corpus-wide
       shuffle, keyed on a uniform hash: no skew);
    3. covered token positions = explode of [i, i+k-1] per repeated
       window, distinct per doc;
    4. islands (merged spans) via the q - row_number() trick;
    5. cleaned text = anti-join of token positions against covered
       positions, re-assembled in pinned position order.

    At 100 TB the shingle count table is the corpus's repeated-phrase
    vocabulary — orders smaller than the corpus; steps 3-5 are per-doc
    and shuffle only (doc_id, position) pairs.
    """
    from pyspark.sql.window import Window as W

    from clinical_api_etl_spark.functions.text import tokens

    base = df.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("t")
    ).persist()  # feeds windows (twice via join) AND the rebuild

    sh = (
        base.filter(F.size("t") >= k)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(t) - {k} + 1), "
                    f"i -> struct(i AS pos, "
                    f"md5(concat_ws(' ', slice(t, i, {k}))) AS h))"
                )
            ).alias("s"),
        )
        .select("doc_id", "s.pos", "s.h")
    )
    rep = (
        sh.groupBy("h")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
        .select("h")
    )
    cov = (
        sh.join(rep, "h")
        .select("doc_id", F.explode(F.expr(f"sequence(pos, pos + {k} - 1)")).alias("q"))
        .distinct()
    )
    grp = F.col("q") - F.row_number().over(
        W.partitionBy("doc_id").orderBy("q")
    )
    spans = (
        cov.withColumn("grp", grp)
        .groupBy("doc_id", "grp")
        .agg(
            F.min("q").cast("long").alias("cut_start"),
            F.count(F.lit(1)).cast("long").alias("cut_len"),
        )
    )
    cuts = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_cuts"),
        F.sum("cut_len").cast("long").alias("removed_tokens"),
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("cut_start", "cut_len"))
                ),
                lambda s: F.concat_ws(
                    ":",
                    s["cut_start"].cast("string"),
                    s["cut_len"].cast("string"),
                ),
            ),
        ).alias("cuts_repr"),
    )
    toks = base.select(
        "doc_id", F.posexplode("t").alias("p0", "tok")
    ).select("doc_id", (F.col("p0") + 1).alias("q"), "tok")
    cleaned = (
        toks.join(cov, ["doc_id", "q"], "left_anti")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("kept_tokens"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("q", "tok"))),
                        lambda s: s["tok"],
                    ),
                )
            ).alias("cleaned_md5"),
        )
    )
    all_docs = base.select(
        "doc_id",
        F.size("t").cast("long").alias("total_tokens"),
        F.md5(F.concat_ws(" ", "t")).alias("_full_md5"),
    )
    out = (
        all_docs.join(cuts, "doc_id", "left")
        .join(cleaned, "doc_id", "left")
        .select(
            "doc_id",
            "total_tokens",
            F.coalesce("n_cuts", F.lit(0)).cast("long").alias("n_cuts"),
            F.coalesce("removed_tokens", F.lit(0)).cast("long").alias(
                "removed_tokens"
            ),
            F.coalesce("kept_tokens", F.lit(0)).cast("long").alias(
                "kept_tokens"
            ),
            F.coalesce("cuts_repr", F.lit("")).alias("cuts_repr"),
            # a fully-covered doc has NO kept tokens: md5('') sentinel
            # keeps the column non-null (NaT/NaN/null = hash mismatch);
            # an un-cut doc hashes its full normalized text.
            F.coalesce(
                "cleaned_md5",
                F.when(F.col("n_cuts").isNull(), F.col("_full_md5")).otherwise(
                    F.md5(F.lit(""))
                ),
            ).alias("cleaned_md5"),
        )
    )
    return out
