"""[EXT] Round-5 training-data-prep and aggregate surfaces.

Four oracle-gated families:

- argmax aggregates (``max_by``/``min_by`` over struct ordering — the
  deterministic-tie-break form of SQL ``arg_max``);
- Johnson-Lindenstrauss random projection of embeddings (the standard
  pre-ANN dimensionality reduction: narrow per-row projection, no
  shuffle, model = ±1 signs derived from md5 so both engines replay it);
- chunk-level exact dedup with document rebuild (RefinedWeb-style
  repeated-passage removal at sub-document granularity);
- Bloom-filter decontamination prefilter with a zero-false-negative
  containment gate (broadcast a KB-scale bitmap instead of the benchmark
  shingle set — the 100 TB posture for eval-set leakage scans).

Oracle discipline follows plans/base.py: every computed column aliased
identically on both sides; float folds in fixed left-to-right order so
IEEE results are bit-identical across engines; counts cast to BIGINT.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clinical_api_etl_spark.functions.text import tokens, word_shingles
from clinical_api_etl_spark.plans.base import QuerySet
from clinical_api_etl_spark.sources.catalog import load

QS = QuerySet()

_TOKS = r"regexp_split_to_array(lower(trim(text)), '\s+')"


# ---------------------------------------------------------------------------
# argmax family: max_by / min_by with deterministic ties.
# ---------------------------------------------------------------------------


@QS.add(
    "agg_argmax_per_type",
    """
    WITH t AS (
      SELECT event_type, user_id,
             CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                  AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, user_id
    )
    SELECT event_type,
           (max({'c': cents, 'u': user_id})).u AS top_user,
           MAX(cents) AS top_cents,
           (min({'c': cents, 'u': user_id})).u AS bottom_user,
           MIN(cents) AS bottom_cents
    FROM t GROUP BY event_type
    """,
    doc="[EXT] arg-max aggregates: per event type, the user with the "
    "largest / smallest exact-cents spend via max_by/min_by over a "
    "(metric, key) struct — struct ordering makes ties deterministic "
    "(highest key wins the max, lowest the min), which raw SQL arg_max "
    "does not guarantee. Two shuffles (pre-agg then per-type), both with "
    "map-side partials; integer cents keep both engines exact.",
    tags=("agg",),
)
def agg_argmax_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.sum(cents).cast("long").alias("cents")
    )
    return per_user.groupBy("event_type").agg(
        F.max_by("user_id", F.struct("cents", "user_id")).alias("top_user"),
        F.max("cents").alias("top_cents"),
        F.min_by("user_id", F.struct("cents", "user_id")).alias("bottom_user"),
        F.min("cents").alias("bottom_cents"),
    )


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss random projection.
# ---------------------------------------------------------------------------

_JL_OUT = 8
_JL_IN = 64


def _jl_sign(j: int, i: int) -> int:
    """Deterministic ±1 sign for output dim j, input dim i (md5-derived —
    no RNG at query time, replayable by any engine)."""
    return 1 if int(hashlib.md5(f"{j}_{i}".encode()).hexdigest()[:2], 16) < 128 else -1


_JL_SIGNS = [[_jl_sign(j, i) for i in range(_JL_IN)] for j in range(_JL_OUT)]


def _jl_oracle() -> str:
    cols = []
    for j in range(_JL_OUT):
        terms = " + ".join(
            f"CAST(embedding[{i + 1}] AS DOUBLE) * {s}"
            for i, s in enumerate(_JL_SIGNS[j])
        )
        cols.append(
            f"CAST(floor(({terms}) * 1000000.0 + 0.5) AS BIGINT) AS q{j}"
        )
    return "SELECT vec_id, " + ", ".join(cols) + " FROM embeddings"


@QS.add(
    "emb_random_projection",
    _jl_oracle(),
    doc="[EXT] Johnson-Lindenstrauss sparse sign projection 64→8: the "
    "standard pre-ANN dimensionality reduction (dot products preserved "
    "within (1±ε)). One narrow per-row projection — no shuffle, no UDF, "
    "embarrassingly parallel at 100 TB. Signs are md5-derived module "
    "constants; each output dim is its own scalar column (janino 64 KB "
    "discipline, see operators/clustering.py). Sums run in fixed "
    "left-to-right order so Spark and DuckDB produce bit-identical IEEE "
    "doubles; outputs are quantized to exact micro-units (BIGINT).",
    headline=True,
    tags=("embedding",),
)
def emb_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    cols = []
    for j in range(_JL_OUT):
        expr = None
        for i, s in enumerate(_JL_SIGNS[j]):
            term = F.element_at("embedding", i + 1).cast("double") * F.lit(s)
            expr = term if expr is None else expr + term
        cols.append(
            F.floor(expr * F.lit(1000000.0) + F.lit(0.5)).cast("long").alias(f"q{j}")
        )
    return emb.select("vec_id", *cols)


# ---------------------------------------------------------------------------
# Chunk-level exact dedup with document rebuild.
# ---------------------------------------------------------------------------

_CHUNK = 16


@QS.add(
    "text_chunk_dedup",
    f"""
    WITH tok AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    ch AS (
      SELECT doc_id,
             CAST(ceil(len(t) / {_CHUNK}.0) AS BIGINT) AS n_chunks,
             list_transform(
               range(0, greatest(CAST(ceil(len(t) / {_CHUNK}.0) AS BIGINT), 1)),
               c -> {{'idx': c,
                      'ch': array_to_string(t[c*{_CHUNK}+1:c*{_CHUNK}+{_CHUNK}], ' ')}})
               AS chunks
      FROM tok
    ),
    e2 AS (
      SELECT doc_id, u.idx AS chunk_idx, u.ch AS chunk
      FROM (SELECT doc_id, unnest(chunks) AS u FROM ch)
    ),
    kept AS (
      SELECT doc_id, chunk_idx, chunk,
             row_number() OVER (PARTITION BY chunk
                                ORDER BY doc_id, chunk_idx) AS rn
      FROM e2
    ),
    agg AS (
      SELECT doc_id, COUNT(*) AS n_kept,
             string_agg(chunk, ' ' ORDER BY chunk_idx) AS rebuilt
      FROM kept WHERE rn = 1 GROUP BY doc_id
    )
    SELECT c.doc_id, c.n_chunks,
           CAST(COALESCE(a.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(c.n_chunks - COALESCE(a.n_kept, 0) AS BIGINT) AS n_dropped,
           md5(COALESCE(a.rebuilt, '')) AS clean_fp
    FROM ch c LEFT JOIN agg a USING (doc_id)
    """,
    doc="[EXT] sub-document exact dedup (RefinedWeb-style repeated-passage "
    f"removal): split each doc into non-overlapping {_CHUNK}-token chunks, "
    "keep only the corpus-wide first occurrence of each chunk text "
    "(ordered by doc_id, chunk_idx), rebuild the deduplicated document in "
    "chunk order. One explode + one shuffle on the chunk text (at scale: "
    "on its hash) + one per-doc regroup; the rebuilt text is hash-checked "
    "byte-for-byte.",
    headline=True,
    tags=("dedup", "text"),
)
def text_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n_chunks = F.ceil(F.size(toks) / F.lit(float(_CHUNK))).cast("long")
    chunks = F.transform(
        F.sequence(F.lit(0), F.greatest(n_chunks, F.lit(1)).cast("int") - 1),
        lambda c: F.concat_ws(" ", F.slice(toks, c * _CHUNK + 1, _CHUNK)),
    )
    base = docs.select(
        "doc_id", n_chunks.alias("n_chunks"), chunks.alias("chunks")
    )
    # posexplode_outer, not posexplode: the inner form plants an implicit
    # size(chunks) > 0 Filter directly on the scan, which (a) can't push
    # into parquet and (b) re-evaluates the whole chunk-transform lambda a
    # second time per row (no-HOF-CSE). greatest(n_chunks, 1) already
    # guarantees a non-empty array, so outer is semantically identical.
    ex = base.select(
        "doc_id", F.posexplode_outer("chunks").alias("chunk_idx", "chunk")
    )
    w = Window.partitionBy("chunk").orderBy("doc_id", "chunk_idx")
    kept = ex.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    agg = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("chunk_idx", "chunk"))),
                lambda x: x["chunk"],
            ),
            " ",
        ).alias("rebuilt"),
    )
    return (
        base.select("doc_id", "n_chunks")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            "n_chunks",
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            (F.col("n_chunks") - F.coalesce("n_kept", F.lit(0)))
            .cast("long")
            .alias("n_dropped"),
            F.md5(F.coalesce("rebuilt", F.lit(""))).alias("clean_fp"),
        )
    )


# ---------------------------------------------------------------------------
# Bloom-filter decontamination prefilter + containment gate.
# ---------------------------------------------------------------------------

_BLOOM_SEEDS = 3


def _pos_sql(k: int, shingle: str) -> str:
    """Seeded 16-bit bloom slot as a hex-prefix key — engine-portable."""
    return f"'{k}:' || substr(md5('{k}|' || {shingle}), 1, 4)"


@QS.add(
    "decontaminate_bloom_gate",
    f"""
    WITH tok AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_distinct(list_transform(
               range(1, greatest(len(t) - 4, 1) + 1),
               i -> array_to_string(t[i:i+4], ' ')))) AS shingle
      FROM tok
    ),
    b AS (SELECT * FROM sh WHERE doc_id % 97 = 0),
    tr AS (SELECT * FROM sh WHERE doc_id % 97 <> 0),
    bkeys AS (
      SELECT DISTINCT k FROM (
        {" UNION ALL ".join(f"SELECT {_pos_sql(k, 'shingle')} AS k FROM b" for k in range(_BLOOM_SEEDS))}
      )
    ),
    tkeys AS (
      {" UNION ALL ".join(f"SELECT doc_id, shingle, {k} AS seed, {_pos_sql(k, 'shingle')} AS k FROM tr" for k in range(_BLOOM_SEEDS))}
    ),
    cand AS (
      SELECT DISTINCT doc_id FROM (
        SELECT t.doc_id, t.shingle
        FROM tkeys t JOIN bkeys USING (k)
        GROUP BY t.doc_id, t.shingle
        HAVING COUNT(DISTINCT t.seed) = {_BLOOM_SEEDS}
      )
    ),
    exact AS (
      SELECT DISTINCT tr.doc_id
      FROM tr JOIN (SELECT DISTINCT shingle FROM b) bs USING (shingle)
    )
    SELECT (SELECT COUNT(*) FROM exact) AS n_exact,
           (SELECT COUNT(*) FROM cand) AS n_candidates,
           (SELECT COUNT(*) FROM exact
             WHERE doc_id NOT IN (SELECT doc_id FROM cand)) AS n_missed
    """,
    doc="[EXT] Bloom-prefiltered decontamination: benchmark 5-gram "
    "shingles hash into a seeded 16-bit slot space (3 md5-derived slots "
    "per shingle ≈ a 24 KB bitmap at full occupancy); a training doc is a "
    "removal candidate iff some shingle has ALL its slots set. The gate "
    "proves the bloom guarantee: n_missed == 0 (no false negatives vs the "
    "exact shingle join) with n_candidates ≥ n_exact. 100 TB posture: "
    "broadcast the KB bitmap, not the benchmark shingle set — candidate "
    "docs then take the exact (expensive) verify, everything else is "
    "filtered by a narrow scan.",
    tags=("dedup", "text", "decontamination"),
)
def decontaminate_bloom_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id", F.explode(word_shingles(F.col("text"), 5)).alias("shingle")
    ).distinct()
    bench = sh.filter(F.col("doc_id") % 97 == 0)
    train = sh.filter(F.col("doc_id") % 97 != 0)

    def key(k: int) -> F.Column:
        return F.concat(
            F.lit(f"{k}:"),
            F.substring(F.md5(F.concat(F.lit(f"{k}|"), F.col("shingle"))), 1, 4),
        )

    bkeys = (
        bench.select(
            F.explode(F.array(*[key(k) for k in range(_BLOOM_SEEDS)])).alias("k")
        )
        .distinct()
    )
    tkeys = train.select(
        "doc_id",
        "shingle",
        F.posexplode(F.array(*[key(k) for k in range(_BLOOM_SEEDS)])).alias(
            "seed", "k"
        ),
    )
    cand = (
        tkeys.join(F.broadcast(bkeys), "k")
        .groupBy("doc_id", "shingle")
        .agg(F.countDistinct("seed").alias("n_seeds"))
        .filter(F.col("n_seeds") == _BLOOM_SEEDS)
        .select("doc_id")
        .distinct()
    )
    exact = (
        train.join(
            F.broadcast(bench.select("shingle").distinct()), "shingle", "left_semi"
        )
        .select("doc_id")
        .distinct()
    )
    n_exact = exact.agg(F.count("*").alias("n_exact"))
    n_cand = cand.agg(F.count("*").alias("n_candidates"))
    n_missed = exact.join(cand, "doc_id", "left_anti").agg(
        F.count("*").alias("n_missed")
    )
    return n_exact.crossJoin(n_cand).crossJoin(n_missed)
