"""[EXT] Round-5 training-data-prep and aggregate surfaces.

All oracle-gated (full DuckDB value-hash — no rows-only entries here):

- argmax aggregates (``max_by``/``min_by`` over struct ordering — the
  deterministic-tie-break form of SQL ``arg_max``);
- Johnson-Lindenstrauss random projection of embeddings (the standard
  pre-ANN dimensionality reduction: narrow per-row projection, no
  shuffle, model = ±1 signs derived from md5 so both engines replay it);
- chunk-level exact dedup with document rebuild (RefinedWeb-style
  repeated-passage removal at sub-document granularity);
- inverted-index build and bigram-PMI collocations (exact-integer lift,
  one final float division);
- exact-integer PageRank (BIGINT floor-div throughout — an iterative
  algorithm under a full value hash) plus its Spark 4 WITH RECURSIVE
  BFS sibling;
- mergeable distinct structures: exact bitmap aggregates and a
  DataSketches HLL union gate (the incremental-MV forms of distinct);
- quality-percentile curation (per-source keep-top-half);
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
    # Build each projection as ONE SQL string parsed JVM-side: composing
    # 8 x 64 Column objects through py4j costs ~2.5s of driver chatter
    # per build (measured), which dominated this query's bench time. The
    # parsed expressions are identical to the Column-composed ones (same
    # left-to-right fold, double literals via the D suffix).
    cols = []
    for j in range(_JL_OUT):
        terms = " + ".join(
            f"CAST(element_at(embedding, {i + 1}) AS DOUBLE) * CAST({s} AS DOUBLE)"
            for i, s in enumerate(_JL_SIGNS[j])
        )
        cols.append(f"CAST(FLOOR(({terms}) * 1000000.0D + 0.5D) AS BIGINT) AS q{j}")
    return emb.selectExpr("vec_id", *cols)


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
# Inverted index build.
# ---------------------------------------------------------------------------


@QS.add(
    "text_inverted_index",
    f"""
    WITH t AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
    g AS (SELECT tok, doc_id, COUNT(*) AS c FROM t GROUP BY tok, doc_id)
    SELECT tok,
           CAST(COUNT(*) AS BIGINT) AS df,
           CAST(SUM(c) AS BIGINT) AS cf,
           md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id))
             AS postings_fp
    FROM g GROUP BY tok
    """,
    doc="[EXT] inverted-index build (the search/retrieval side of a corpus "
    "pipeline): token → document frequency, collection frequency, and a "
    "byte-exact fingerprint of the doc_id-sorted posting list. Two-stage "
    "hash aggregate — explode shuffles once on (token, doc) with map-side "
    "partials, then once on token; postings order is imposed by an "
    "explicit array_sort, never by shuffle arrival. At 100 TB: partition "
    "terms by hash, delta-encode postings at the sink.",
    headline=True,
    tags=("text",),
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    per_doc = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("tok", "doc_id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return per_doc.groupBy("tok").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("c").cast("long").alias("cf"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("doc_id")),
                    lambda d: d.cast("string"),
                ),
                ",",
            )
        ).alias("postings_fp"),
    )


# ---------------------------------------------------------------------------
# Bigram PMI / lift (collocation statistics).
# ---------------------------------------------------------------------------

_PMI_MIN_COUNT = 5


@QS.add(
    "text_pmi_bigrams",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    uni AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT unnest(toks) AS tok FROM t) GROUP BY tok
    ),
    bi AS (
      SELECT p.x AS x, p.y AS y, CAST(COUNT(*) AS BIGINT) AS c_xy
      FROM (
        SELECT unnest(list_transform(range(1, len(toks)),
                 i -> {{'x': toks[i], 'y': toks[i + 1]}})) AS p
        FROM t
      )
      GROUP BY p.x, p.y
    ),
    tot AS (
      SELECT (SELECT CAST(SUM(c) AS BIGINT) FROM uni) AS n_tokens,
             (SELECT CAST(SUM(c_xy) AS BIGINT) FROM bi) AS n_bigrams
    )
    SELECT bi.x || ' ' || bi.y AS bigram,
           bi.c_xy, ux.c AS c_x, uy.c AS c_y,
           CAST(bi.c_xy * tot.n_tokens * tot.n_tokens AS DOUBLE)
             / CAST(tot.n_bigrams * ux.c * uy.c AS DOUBLE) AS lift
    FROM bi
    JOIN uni ux ON bi.x = ux.tok
    JOIN uni uy ON bi.y = uy.tok
    CROSS JOIN tot
    WHERE bi.c_xy >= {_PMI_MIN_COUNT}
    """,
    doc="[EXT] collocation statistics (word2vec/phrase-mining precursor): "
    "per adjacent bigram with count ≥ 5, the PMI lift "
    "p(x,y)/(p(x)p(y)) = c_xy·N² / (B·c_x·c_y). Numerator and denominator "
    "are exact BIGINT products; the only float op is ONE division of two "
    "exactly-representable integers — bit-identical across engines, no "
    "logarithms. Bigram counts broadcast-join the (small) vocabulary "
    "table; scalar totals ride a 1-row cross join.",
    tags=("text",),
)
def text_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks_df = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    # explode_outer throughout: inner explode plants an unpushable
    # size()>0 Filter directly on the scan AND re-evaluates the lambda
    # expression a second time per row (no-HOF-CSE). tokens() is never
    # empty, and the pairs branch drops its null rows explicitly.
    uni = (
        toks_df.select(F.explode_outer("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    pairs = F.when(
        F.size("toks") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - 1),
            lambda i: F.struct(
                F.element_at("toks", i).alias("x"),
                F.element_at("toks", i + 1).alias("y"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<x:string,y:string>>"))
    bi = (
        toks_df.select(F.explode_outer(pairs).alias("p"))
        .filter(F.col("p").isNotNull())
        .select("p.x", "p.y")
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("long").alias("c_xy"))
    )
    totals = (
        uni.agg(F.sum("c").cast("long").alias("n_tokens"))
        .crossJoin(bi.agg(F.sum("c_xy").cast("long").alias("n_bigrams")))
    )
    ux = uni.select(F.col("tok").alias("x"), F.col("c").alias("c_x"))
    uy = uni.select(F.col("tok").alias("y"), F.col("c").alias("c_y"))
    return (
        bi.filter(F.col("c_xy") >= _PMI_MIN_COUNT)
        .join(F.broadcast(ux), "x")
        .join(F.broadcast(uy), "y")
        .crossJoin(F.broadcast(totals))
        .select(
            F.concat_ws(" ", "x", "y").alias("bigram"),
            "c_xy",
            "c_x",
            "c_y",
            (
                (F.col("c_xy") * F.col("n_tokens") * F.col("n_tokens")).cast("double")
                / (F.col("n_bigrams") * F.col("c_x") * F.col("c_y")).cast("double")
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# Multiplicity-preserving set ops (ALL variants of §2.6's set-op family).
# ---------------------------------------------------------------------------


@QS.add(
    "setop_nations_intersect_all",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT ALL
    SELECT s_nationkey FROM supplier
    """,
    doc="[EXT] INTERSECT ALL: bag semantics — each nationkey appears "
    "min(customer multiplicity, supplier multiplicity) times. "
    "DataFrame.intersectAll; executes as a count-compare aggregate, "
    "one shuffle per side.",
    tags=("setop",),
)
def setop_nations_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust.intersectAll(supp)


@QS.add(
    "setop_nations_except_all",
    """
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT ALL
    SELECT s_nationkey FROM supplier
    """,
    doc="[EXT] EXCEPT ALL: bag difference — customer multiplicity minus "
    "supplier multiplicity per nationkey, floored at zero. "
    "DataFrame.exceptAll.",
    tags=("setop",),
)
def setop_nations_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust.exceptAll(supp)


# ---------------------------------------------------------------------------
# Mergeable-structure distinct counts: exact bitmaps + HLL sketch gate.
# ---------------------------------------------------------------------------


@QS.add(
    "a14_bitmap_distinct_users",
    """
    SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY event_type
    """,
    doc="[EXT] EXACT distinct via mergeable bitmaps (Spark 3.5 bitmap_* "
    "aggregates): users bucket by bitmap_bucket_number, each (type, "
    "bucket) folds to a 4 KB bitmap map-side, buckets OR-merge and their "
    "counts sum. Same answer as COUNT(DISTINCT) — the oracle — but the "
    "intermediate state is a mergeable bitmap, i.e. the incremental-MV / "
    "rollup-friendly form: daily partition bitmaps OR together into "
    "any-window exact distincts without re-scanning facts. At 100 TB "
    "that's the difference between a per-query distinct scan and a "
    "bitmap union over precomputed partials.",
    tags=("agg", "sketch"),
)
def a14_bitmap_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    per_bucket = (
        ev.select("event_type", "user_id")
        .groupBy("event_type", F.expr("bitmap_bucket_number(user_id)").alias("b"))
        .agg(
            F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias("bm")
        )
    )
    return per_bucket.groupBy("event_type").agg(
        F.expr("CAST(SUM(bitmap_count(bm)) AS BIGINT)").alias("n_users")
    )


@QS.add(
    "a15_hll_union_gate",
    """
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
           TRUE AS within_bound
    FROM events GROUP BY event_type
    """,
    doc="[EXT] Apache DataSketches HLL surface (Spark 3.5 hll_sketch_agg/"
    "hll_union_agg): per-(type, day) sketches union across days into a "
    "per-type estimate — the persistable, re-aggregatable form of "
    "approx_count_distinct (a sketch column in a daily MV answers any "
    "date-range distinct without touching facts). Gate: the merged "
    "estimate must land within 5% of exact (HLL lgK=12 standard error "
    "≈ 1.6%), hash-checked alongside the exact count.",
    tags=("agg", "sketch"),
)
def a15_hll_union_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.expr("hll_sketch_agg(user_id)").alias("sk"))
    merged = daily.groupBy("event_type").agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est")
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_exact")
    )
    return exact.join(merged, "event_type").select(
        "event_type",
        "n_exact",
        (
            F.abs(F.col("est") - F.col("n_exact"))
            <= F.lit(0.05) * F.col("n_exact")
        ).alias("within_bound"),
    )


# ---------------------------------------------------------------------------
# Recursive CTE (Spark 4): bounded BFS over the interaction graph.
# ---------------------------------------------------------------------------


@QS.add(
    "sql_recursive_reach",
    """
    WITH RECURSIVE e0 AS (
      SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                      's' || CAST(l_suppkey AS VARCHAR) AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    edges AS (SELECT src, dst FROM e0
              UNION ALL SELECT dst AS src, src AS dst FROM e0),
    reach(node, d) AS (
      SELECT 'c1' AS node, 0 AS d
      UNION ALL
      SELECT e.dst, r.d + 1 FROM reach r JOIN edges e ON e.src = r.node
      WHERE r.d < 2
    )
    SELECT node, CAST(MIN(d) AS BIGINT) AS min_hops
    FROM reach GROUP BY node
    """,
    doc="[EXT] recursive CTE (Spark 4 WITH RECURSIVE): 2-hop BFS from "
    "customer c1 over the symmetrized interaction graph, min-hop distance "
    "per reached node. Identical SQL text runs on both engines — the "
    "recursion is depth-bounded in the recursive term (UNION ALL "
    "path-enumeration semantics) and collapsed by the outer MIN. The "
    "DataFrame twin of this shape is operators/graph.py (iterative "
    "min-label propagation with checkpointing) — the CTE form is for "
    "SQL-surface parity.",
    tags=("graph", "sql"),
)
def sql_recursive_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li.createOrReplaceTempView("rcte_lineitem")
    orders.createOrReplaceTempView("rcte_orders")
    return spark.sql(
        """
        WITH RECURSIVE e0 AS (
          SELECT DISTINCT concat('c', CAST(o_custkey AS STRING)) AS src,
                          concat('s', CAST(l_suppkey AS STRING)) AS dst
          FROM rcte_lineitem JOIN rcte_orders ON l_orderkey = o_orderkey
        ),
        edges AS (SELECT src, dst FROM e0
                  UNION ALL SELECT dst AS src, src AS dst FROM e0),
        reach(node, d) AS (
          SELECT 'c1' AS node, 0 AS d
          UNION ALL
          SELECT e.dst, r.d + 1 FROM reach r JOIN edges e ON e.src = r.node
          WHERE r.d < 2
        )
        SELECT node, CAST(MIN(d) AS BIGINT) AS min_hops
        FROM reach GROUP BY node
        """
    )


# ---------------------------------------------------------------------------
# Quality-gated corpus curation: per-source top-half by score.
# ---------------------------------------------------------------------------

def _quality_sql() -> str:
    from clinical_api_etl_spark.functions.text import EN_STOPWORDS

    stops = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
    stop_ratio = (
        f"len(list_filter({_TOKS}, x -> x IN ({stops})))::DOUBLE"
        f" / len({_TOKS})::DOUBLE"
    )
    return (
        f"0.5 * ({stop_ratio})"
        " + 0.3 * least(length(text)::DOUBLE / 400.0, 1.0)"
        f" + 0.2 * (len(list_distinct({_TOKS}))::DOUBLE / len({_TOKS})::DOUBLE)"
    )


@QS.add(
    "corpus_quality_topp",
    f"""
    WITH scored AS (
      SELECT doc_id, source, {_quality_sql()} AS quality FROM documents
    ),
    r AS (
      SELECT *,
             CAST(row_number() OVER (PARTITION BY source
                                     ORDER BY quality DESC, doc_id) AS BIGINT) AS rk,
             COUNT(*) OVER (PARTITION BY source) AS n
      FROM scored
    )
    SELECT doc_id, source, quality, rk FROM r WHERE rk <= (n + 1) // 2
    """,
    doc="[EXT] quality-percentile curation (FineWeb-style keep-the-best): "
    "per source, keep the top half of documents by composite quality "
    "score, ties broken by doc_id so the cut is deterministic. One window "
    "over (source) — a single shuffle; the score reuses "
    "functions/text.py:quality_score whose fixed evaluation order makes "
    "the doubles bit-identical across engines.",
    tags=("text", "pipeline"),
)
def corpus_quality_topp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.functions.text import quality_score

    docs = load(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "source", quality_score(F.col("text")).alias("quality")
    )
    w = Window.partitionBy("source").orderBy(F.desc("quality"), F.asc("doc_id"))
    wc = Window.partitionBy("source")
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .withColumn("n", F.count(F.lit(1)).over(wc))
        .filter(F.col("rk") <= F.expr("(n + 1) div 2"))
        .select("doc_id", "source", "quality", "rk")
    )


# ---------------------------------------------------------------------------
# Exact-integer PageRank over the customer↔supplier interaction graph.
# ---------------------------------------------------------------------------

_PR_ITERS = 3


def _pagerank_oracle() -> str:
    """Unrolled-iteration DuckDB twin of operators/graph.py:pagerank_int
    (fixed iteration count ⇒ plain chained CTEs, no recursion). All
    arithmetic is BIGINT floor-division — `//` == Spark `div` for
    non-negative operands."""
    it = """
    it{k} AS (
      SELECT e.dst AS node,
             CAST(150000000000 // n.n + (85 * SUM(r.r // e.deg)) // 100
                  AS BIGINT) AS r
      FROM edeg e JOIN it{p} r ON e.src = r.node, n
      GROUP BY e.dst, n.n
    )"""
    its = ",".join(it.format(k=k, p=k - 1) for k in range(1, _PR_ITERS + 1))
    return f"""
    WITH e0 AS (
      SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                      's' || CAST(l_suppkey AS VARCHAR) AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0),
    deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY src),
    edeg AS (SELECT e.src, e.dst, d.deg FROM edges e JOIN deg d USING (src)),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
    it0 AS (SELECT node, CAST(1000000000000 // n.n AS BIGINT) AS r FROM nodes, n),
    {its}
    SELECT node, r AS rank_units FROM it{_PR_ITERS}
    """


@QS.add(
    "graph_pagerank_interactions",
    _pagerank_oracle(),
    doc="[EXT] PageRank over the symmetrized customer↔supplier interaction "
    "graph (edge = any lineitem between them), 3 iterations, damping "
    "0.85, in EXACT integer arithmetic: rank mass is 1e12 units and every "
    "step is BIGINT floor-division, so Spark and DuckDB agree "
    "bit-for-bit — an iterative algorithm under a full value-hash gate, "
    "not a rows-only check. Per iteration: rank vector equi-joined onto "
    "the edge list (no broadcast hint — AQE broadcasts while |V| is "
    "small, shuffles when it isn't; an O(|V|) forced broadcast would be "
    "wrong at billions of nodes), contributions shuffle once on dst "
    "with map-side partials. operators/graph.py:pagerank_int.",
    headline=True,
    tags=("graph",),
)
def graph_pagerank_interactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.graph import pagerank_int

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    e0 = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    from clinical_api_etl_spark.operators.graph import symmetrize

    edges = symmetrize(e0)
    return pagerank_int(edges, iters=_PR_ITERS)


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


# ---------------------------------------------------------------------------
# Round-5: personalized PageRank (random walk with restart).
# ---------------------------------------------------------------------------

_PPR_ITERS = 3


def _ppr_oracle() -> str:
    """Unrolled DuckDB twin of operators/graph.py:ppr_int. The contrib/
    restart combination is a FULL OUTER join per iteration; every it{k}
    is referenced once (linear chain) but srcs/restart are reused across
    iterations -> MATERIALIZED."""
    it = """
    it{k} AS MATERIALIZED (
      SELECT COALESCE(c.node, b.node) AS node,
             CAST(COALESCE(b.base, 0) + (85 * COALESCE(c.s, 0)) // 100
                  AS BIGINT) AS r
      FROM (
        SELECT e.dst AS node, SUM(r.r // e.deg) AS s
        FROM edeg e JOIN it{p} r ON e.src = r.node GROUP BY e.dst
      ) c FULL OUTER JOIN restart b ON c.node = b.node
    )"""
    its = ",".join(it.format(k=k, p=k - 1) for k in range(1, _PPR_ITERS + 1))
    return f"""
    WITH e0 AS MATERIALIZED (
      SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                      's' || CAST(l_suppkey AS VARCHAR) AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    edges AS MATERIALIZED (
      SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0
    ),
    deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY src),
    edeg AS MATERIALIZED (
      SELECT e.src, e.dst, d.deg FROM edges e JOIN deg d USING (src)
    ),
    srcs AS MATERIALIZED (
      SELECT 's' || CAST(s_suppkey AS VARCHAR) AS node
      FROM supplier WHERE s_suppkey % 5 = 0
    ),
    ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM srcs),
    it0 AS MATERIALIZED (
      SELECT node, CAST(1000000000000 // ns.n AS BIGINT) AS r FROM srcs, ns
    ),
    restart AS MATERIALIZED (
      SELECT node, CAST(150000000000 // ns.n AS BIGINT) AS base FROM srcs, ns
    ),
    {its}
    SELECT node, r AS rank_units FROM it{_PPR_ITERS}
    """


@QS.add(
    "graph_ppr_suppliers",
    _ppr_oracle(),
    doc="[EXT] personalized PageRank (random walk with 15% restart to the "
    "source set = every 5th supplier) over the customer<->supplier "
    f"interaction graph, {_PPR_ITERS} iterations in EXACT integer "
    "arithmetic (operators/graph.py:ppr_int) — the proximity/"
    "recommendation primitive, 9th fully value-hash-gated iterative "
    "algorithm. Per iteration: rank equi-join onto edges (AQE chooses "
    "the strategy), one dst shuffle with map-side partials, one full "
    "outer join with the small restart vector. Ranks measure closeness "
    "to the sources; untouched nodes stay absent (implicit zero).",
    tags=("graph", "iterative"),
    headline=True,
)
def graph_ppr_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.graph import ppr_int

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    e0 = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    from clinical_api_etl_spark.operators.graph import symmetrize

    edges = symmetrize(e0)
    sources = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") % 5 == 0)
        .select(F.concat(F.lit("s"), F.col("s_suppkey").cast("string")).alias("node"))
    )
    return ppr_int(edges, sources, iters=_PPR_ITERS)


# ---------------------------------------------------------------------------
# Round-6: substring-level exact dedup (VERDICT r05 task 4 — the last
# missing LLM-dedup family).
# ---------------------------------------------------------------------------

_SUBK = 8  # k-token window; Lee et al. 2022 use 50 BPE tokens at web scale


@QS.add(
    "text_substring_dedup",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    sh AS (
      SELECT doc_id, i AS pos,
             md5(array_to_string(t[i:i + {_SUBK - 1}], ' ')) AS h
      FROM t, unnest(range(1, greatest(len(t) - {_SUBK} + 2, 1))) AS u(i)
      WHERE len(t) >= {_SUBK}
    ),
    rep AS (SELECT h FROM sh GROUP BY h HAVING COUNT(*) >= 2),
    cov AS (
      SELECT DISTINCT j.doc_id, u.q
      FROM (SELECT s.doc_id, s.pos FROM sh s JOIN rep r ON s.h = r.h) j,
           unnest(range(j.pos, j.pos + {_SUBK})) AS u(q)
    ),
    spans AS (
      SELECT doc_id, grp, CAST(MIN(q) AS BIGINT) AS cut_start,
             CAST(COUNT(*) AS BIGINT) AS cut_len
      FROM (SELECT doc_id, q,
                   q - row_number() OVER (PARTITION BY doc_id ORDER BY q) AS grp
            FROM cov)
      GROUP BY doc_id, grp
    ),
    cuts AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_cuts,
             CAST(SUM(cut_len) AS BIGINT) AS removed_tokens,
             string_agg(cut_start || ':' || cut_len, ',' ORDER BY cut_start)
               AS cuts_repr
      FROM spans GROUP BY doc_id
    ),
    tks AS (
      SELECT doc_id, u.q, t[u.q] AS tok
      FROM t, unnest(range(1, len(t) + 1)) AS u(q)
    ),
    cl AS (
      SELECT tk.doc_id, CAST(COUNT(*) AS BIGINT) AS kept_tokens,
             md5(string_agg(tk.tok, ' ' ORDER BY tk.q)) AS cleaned_md5
      FROM tks tk LEFT JOIN cov c ON tk.doc_id = c.doc_id AND tk.q = c.q
      WHERE c.q IS NULL
      GROUP BY tk.doc_id
    )
    SELECT a.doc_id, CAST(len(a.t) AS BIGINT) AS total_tokens,
           COALESCE(c.n_cuts, 0) AS n_cuts,
           COALESCE(c.removed_tokens, 0) AS removed_tokens,
           COALESCE(cl.kept_tokens, 0) AS kept_tokens,
           COALESCE(c.cuts_repr, '') AS cuts_repr,
           COALESCE(cl.cleaned_md5,
                    CASE WHEN c.n_cuts IS NULL
                         THEN md5(array_to_string(a.t, ' '))
                         ELSE md5('') END) AS cleaned_md5
    FROM t a
    LEFT JOIN cuts c USING (doc_id)
    LEFT JOIN cl USING (doc_id)
    """,
    doc="[EXT] substring-level EXACT dedup (operators/dedup.py:"
    "substring_dedup): remove verbatim repeated k-token spans corpus-wide "
    "— the distributed form of the suffix-array method in 'Deduplicating "
    f"Training Data Makes Language Models Better' (Lee et al. 2022), k={_SUBK}. "
    "Repeated k-windows (md5-keyed, so counts replay identically in "
    "DuckDB) mark covered token positions; islands merge them into cut "
    "spans; the cleaned text is rebuilt in pinned position order and "
    "gated by md5. Covers exactly the repeated token substrings of "
    "length >= k (every such substring is a union of repeated k-windows). "
    "One corpus-wide shuffle (window counts, uniform md5 keys — no "
    "skew); spans/rebuild shuffle only (doc_id, position) pairs.",
    tags=("text", "dedup"),
    headline=True,
)
def text_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.dedup import substring_dedup

    docs = load(spark, sf_dir, "documents")
    return substring_dedup(docs, "doc_id", "text", k=_SUBK, min_count=2)


# ---------------------------------------------------------------------------
# Round-6: training-run assembly ops — sequence packing, temperature
# mixture allocation, tokenizer fertility. The three decisions between a
# curated corpus and an actual pretraining run.
# ---------------------------------------------------------------------------

_PACK_L = 128     # tokens per training sequence
_PACK_SHARD = 128  # docs per packing shard (doc_id div)


@QS.add(
    "corpus_sequence_packing",
    f"""
    WITH t AS (
      SELECT doc_id, doc_id // {_PACK_SHARD} AS shard_id,
             CAST(len({_TOKS}) AS BIGINT) AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT doc_id, shard_id, n_tokens,
             CAST(SUM(n_tokens) OVER (
               PARTITION BY shard_id ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS end_off
      FROM t
    )
    SELECT doc_id, shard_id, n_tokens,
           CAST(end_off - n_tokens AS BIGINT) AS start_off,
           end_off,
           CAST((end_off - n_tokens) // {_PACK_L} AS BIGINT) AS first_seq,
           CAST((end_off - 1) // {_PACK_L} AS BIGINT) AS last_seq
    FROM c
    """,
    doc="[EXT] GPT-style sequence packing: concatenate documents in "
    f"doc_id order and split at {_PACK_L}-token boundaries (docs straddle "
    "sequence boundaries — the standard pretraining packing; nothing is "
    "padded or dropped). Packing is PER SHARD "
    f"(doc_id div {_PACK_SHARD}), so the running offset is a partitioned "
    "window, never a global sort — shards pack independently on "
    "executors at 100 TB exactly as they do here. Output: per doc, its "
    "token span [start_off, end_off) in the shard stream and the "
    "first/last training sequence it lands in (floor-div on exact "
    "BIGINTs, non-negative — Spark div == DuckDB //).",
    tags=("text", "mlprep"),
)
def corpus_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.functions.text import token_count

    docs = load(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        F.expr(f"doc_id div {_PACK_SHARD}").alias("shard_id"),
        token_count(F.col("text")).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard_id")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = t.withColumn("end_off", F.sum("n_tokens").over(w).cast("long"))
    return c.select(
        "doc_id",
        "shard_id",
        "n_tokens",
        (F.col("end_off") - F.col("n_tokens")).cast("long").alias("start_off"),
        "end_off",
        F.expr(f"(end_off - n_tokens) div {_PACK_L}").cast("long").alias("first_seq"),
        F.expr(f"(end_off - 1) div {_PACK_L}").cast("long").alias("last_seq"),
    )


_MIX_BUDGET = 10_000  # documents to draw across languages


@QS.add(
    "mixture_temperature_sampling",
    f"""
    WITH g AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY lang
    ),
    tot AS (
      SELECT list_reduce(
               list_prepend(CAST(0 AS DOUBLE),
                            list(sqrt(CAST(n_docs AS DOUBLE)) ORDER BY lang)),
               (x, y) -> x + y) AS t
      FROM g
    ),
    raw AS (
      SELECT lang, n_docs,
             CAST({_MIX_BUDGET} AS DOUBLE) * sqrt(CAST(n_docs AS DOUBLE))
               / tot.t AS r
      FROM g CROSS JOIN tot
    ),
    base AS (
      SELECT lang, n_docs, CAST(floor(r) AS BIGINT) AS b,
             r - floor(r) AS rem
      FROM raw
    ),
    lv AS (SELECT CAST({_MIX_BUDGET} - SUM(b) AS BIGINT) AS leftover FROM base)
    SELECT lang, n_docs,
           CAST(b + CASE WHEN row_number() OVER (ORDER BY rem DESC, lang)
                              <= lv.leftover
                         THEN 1 ELSE 0 END AS BIGINT) AS alloc
    FROM base CROSS JOIN lv
    """,
    doc="[EXT] temperature-based mixture allocation (the multilingual "
    "pretraining rebalance of Conneau & Lample: sample language i "
    "proportionally to n_i^alpha) at alpha = 0.5, where the weight is "
    "sqrt(n) — CORRECTLY ROUNDED in IEEE, so both engines compute the "
    f"identical double. Splits a {_MIX_BUDGET}-doc budget: raw shares "
    "through one pinned-order fold (the chi-square technique) + one "
    "division each; integer floors + largest-remainder top-up make the "
    "allocation exact with nothing lost. The window runs over |langs| "
    "rows. Composes with sample_weighted_bernoulli to materialize the "
    "per-language draws.",
    tags=("sampling", "mlprep"),
)
def mixture_temperature_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    g = (
        docs.groupBy("lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .coalesce(1)
        .persist()
    )
    tot = g.agg(
        F.aggregate(
            F.sort_array(
                F.collect_list(
                    F.struct("lang", F.sqrt(F.col("n_docs").cast("double")).alias("w"))
                )
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["w"],
        ).alias("t")
    )
    raw = g.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        (
            F.lit(float(_MIX_BUDGET)) * F.sqrt(F.col("n_docs").cast("double"))
            / F.col("t")
        ).alias("r"),
    )
    base = raw.select(
        "lang",
        "n_docs",
        F.floor("r").cast("long").alias("b"),
        (F.col("r") - F.floor("r")).alias("rem"),
    )
    lv = base.agg((F.lit(_MIX_BUDGET) - F.sum("b")).cast("long").alias("leftover"))
    rk = F.row_number().over(Window.orderBy(F.desc("rem"), F.asc("lang")))
    return (
        base.crossJoin(F.broadcast(lv))
        .withColumn("rk", rk)
        .select(
            "lang",
            "n_docs",
            (
                F.col("b")
                + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
            ).cast("long").alias("alloc"),
        )
    )


# ---------------------------------------------------------------------------
# Scalar quantization (SQ8): per-dimension uniform int8 codes.
# ---------------------------------------------------------------------------

_SQ_DIM = 64


def _sq8_code_expr(j: int, vec: str) -> str:
    """Shared Spark/DuckDB text for dim j's code (identical IEEE tree:
    (v - mn) / (mx - mn) * 255.0, floored, clamped). ``vec`` is the
    1-based element access for the engine."""
    v = f"CAST({vec} AS DOUBLE)"
    return (
        f"CASE WHEN mx{j} > mn{j} THEN "
        f"CAST(LEAST(FLOOR((({v} - mn{j}) / (mx{j} - mn{j})) * 255.0), 255.0) "
        f"AS BIGINT) ELSE CAST(0 AS BIGINT) END AS c{j}"
    )


def _sq8_final_exprs() -> list[str]:
    cs = [f"c{j}" for j in range(_SQ_DIM)]
    return [
        "vec_id",
        " + ".join(cs) + " AS code_sum",
        "LEAST(" + ", ".join(cs) + ") AS code_min",
        "GREATEST(" + ", ".join(cs) + ") AS code_max",
        " + ".join(f"{j + 1} * c{j}" for j in range(_SQ_DIM)) + " AS code_checksum",
    ]


def _sq8_oracle() -> str:
    stats = ", ".join(
        f"min(CAST(embedding[{j + 1}] AS DOUBLE)) AS mn{j}, "
        f"max(CAST(embedding[{j + 1}] AS DOUBLE)) AS mx{j}"
        for j in range(_SQ_DIM)
    )
    codes = ", ".join(
        _sq8_code_expr(j, f"embedding[{j + 1}]") for j in range(_SQ_DIM)
    )
    return f"""
    WITH stats AS (SELECT {stats} FROM embeddings),
    codes AS (SELECT vec_id, {codes} FROM embeddings, stats)
    SELECT {", ".join(_sq8_final_exprs())} FROM codes
    """


@QS.add(
    "emb_sq8_quantization",
    _sq8_oracle(),
    doc="[EXT] int8 scalar quantization of the embedding corpus (faiss "
    "SQ8 analogue, completing the quantizer family next to IVF and PQ): "
    "per-dimension global min/max in ONE mergeable aggregate pass, then "
    "a map-only encode floor((v-mn)/(mx-mn)*255) clamped to [0,255]. "
    "The 128-double model rides a 1-row broadcast cross join (standard "
    "posture: the model is tiny, the encode embarrassingly parallel at "
    "100 TB). Codes are exact BIGINTs: the float ladder is the identical "
    "IEEE tree on both engines (each op correctly rounded over identical "
    "inputs), and CAST happens on exactly-integral doubles so the "
    "truncate-vs-round engine divergence never fires. Each code is its "
    "own named scalar column (janino 64 KB discipline) materialized once "
    "before the 4 summary aggregates reference it (the multi-reference "
    "CSE rule — sum/min/max/checksum would otherwise inline the "
    "division chain 4x64 times). Gate: per-row weighted checksum pins "
    "every code position exactly.",
    headline=True,
    tags=("embedding", "quantization"),
)
def emb_sq8_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    stats = emb.selectExpr(
        *[
            e
            for j in range(_SQ_DIM)
            for e in (
                f"min(CAST(element_at(embedding, {j + 1}) AS DOUBLE)) AS mn{j}",
                f"max(CAST(element_at(embedding, {j + 1}) AS DOUBLE)) AS mx{j}",
            )
        ]
    )
    codes = emb.crossJoin(F.broadcast(stats)).selectExpr(
        "vec_id",
        *[_sq8_code_expr(j, f"element_at(embedding, {j + 1})") for j in range(_SQ_DIM)],
    )
    return codes.selectExpr(*_sq8_final_exprs())


# ---------------------------------------------------------------------------
# DSIR-style importance weights (hashed-unigram target/raw likelihood ratio).
# ---------------------------------------------------------------------------

_DSIR_CAP = 32  # scored-token prefix: bounds the ratio product's magnitude


@QS.add(
    "corpus_dsir_importance",
    f"""
    WITH tgt_tok AS (
      SELECT unnest({_TOKS}) AS w FROM documents WHERE lang = 'en'
    ),
    raw_tok AS (
      SELECT unnest({_TOKS}) AS w FROM documents WHERE lang <> 'en'
    ),
    tc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c_t FROM tgt_tok GROUP BY w),
    rc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c_r FROM raw_tok GROUP BY w),
    scal AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM tgt_tok) AS t_total,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM raw_tok) AS r_total,
             (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) FROM
                (SELECT w FROM tgt_tok UNION ALL SELECT w FROM raw_tok)) AS v
    ),
    ratio AS (
      SELECT rc.w,
             CAST((COALESCE(tc.c_t, 0) + 1) * (scal.r_total + scal.v) AS DOUBLE)
               / CAST((rc.c_r + 1) * (scal.t_total + scal.v) AS DOUBLE) AS r
      FROM rc LEFT JOIN tc ON rc.w = tc.w CROSS JOIN scal
    ),
    scored AS (
      SELECT d.doc_id, s.w
      FROM (SELECT doc_id, ({_TOKS})[1:{_DSIR_CAP}] AS t
            FROM documents WHERE lang <> 'en') d,
           unnest(d.t) AS s(w)
    )
    SELECT sc.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_scored,
           list_reduce(
             list_prepend(CAST(1 AS DOUBLE), list(ratio.r ORDER BY sc.w)),
             (x, y) -> x * y) AS weight
    FROM scored sc JOIN ratio ON sc.w = ratio.w
    GROUP BY sc.doc_id
    """,
    doc="[EXT] DSIR-style data-selection importance weights (Xie et al., "
    "'Data Selection for Language Models via Importance Resampling', "
    "public method): weight(doc) = product over its tokens of the "
    "add-one-smoothed unigram likelihood ratio p_target/p_raw, with "
    "target = English docs and the non-English pool scored. Each ratio "
    "is ONE correctly-rounded division over exact BIGINT count products "
    "((c_t+1)(R+V)) / ((c_r+1)(T+V)) — no log anywhere (JVM log != libm "
    "log, round-8 rule); the per-doc product runs the PINNED-ORDER fold "
    "(token-sorted, duplicates adjacent with identical ratios) so the "
    "float weights hash-match bit-exactly. Scoring is capped at the "
    f"first {_DSIR_CAP} tokens to bound the product's magnitude "
    "(DSIR's own hashed-feature truncation posture); the unigram models "
    "train on the FULL pools. Scale: two count aggregates + one "
    "posting-style equi-join — mergeable everywhere, model size = "
    "vocabulary, never corpus.",
    headline=True,
    tags=("llm", "sampling"),
)
def corpus_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    tgt_tok = docs.filter(F.col("lang") == "en").select(
        F.explode(toks).alias("w")
    )
    raw_tok = docs.filter(F.col("lang") != "en").select(
        F.explode(toks).alias("w")
    )
    tc = tgt_tok.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("c_t"))
    rc = raw_tok.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("c_r"))
    scal = (
        tgt_tok.agg(F.count(F.lit(1)).cast("long").alias("t_total"))
        .crossJoin(raw_tok.agg(F.count(F.lit(1)).cast("long").alias("r_total")))
        .crossJoin(
            tgt_tok.unionAll(raw_tok)
            .agg(F.countDistinct("w").cast("long").alias("v"))
        )
    )
    ratio = (
        rc.join(tc, "w", "left")
        .crossJoin(F.broadcast(scal))
        .select(
            "w",
            (
                ((F.coalesce(F.col("c_t"), F.lit(0)) + 1) * (F.col("r_total") + F.col("v"))).cast(
                    "double"
                )
                / ((F.col("c_r") + 1) * (F.col("t_total") + F.col("v"))).cast("double")
            ).alias("r"),
        )
    )
    scored = (
        docs.filter(F.col("lang") != "en")
        .select("doc_id", F.explode(F.slice(toks, 1, _DSIR_CAP)).alias("w"))
        .join(ratio, "w")
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_scored"),
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("w", "r"))),
            F.lit(1.0),
            lambda acc, x: acc * x["r"],
        ).alias("weight"),
    )


# ---------------------------------------------------------------------------
# Curriculum phase assignment by exact-integer difficulty.
# ---------------------------------------------------------------------------


@QS.add(
    "corpus_curriculum_phases",
    f"""
    WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS w FROM documents),
    freq AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY w),
    scal AS (SELECT CAST(COUNT(*) AS BIGINT) AS total,
                    CAST(COUNT(DISTINCT w) AS BIGINT) AS nv FROM tok),
    ds AS (
      SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(SUM(CASE WHEN f.c * scal.nv < scal.total
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_rare
      FROM tok t JOIN freq f ON t.w = f.w CROSS JOIN scal
      GROUP BY t.doc_id
    )
    SELECT doc_id, n_tokens, n_rare,
           CAST((1000 * n_rare) // n_tokens AS BIGINT) AS difficulty_milli,
           CAST(CASE WHEN (1000 * n_rare) // n_tokens < 250 THEN 0
                     WHEN (1000 * n_rare) // n_tokens < 500 THEN 1
                     WHEN (1000 * n_rare) // n_tokens < 750 THEN 2
                     ELSE 3 END AS BIGINT) AS phase
    FROM ds
    """,
    doc="[EXT] curriculum-learning phase assignment: difficulty(doc) = "
    "permille of its tokens that are corpus-rare, where rare is the "
    "adaptive below-average-frequency rule c * |vocab| < |tokens| "
    "(exact integer comparison — no float quantile, works at any "
    "corpus scale). Docs bucket into 4 fixed phases (easy -> hard) so "
    "a training loader can stream phase 0 before phase 3 — the "
    "standard curriculum ordering for LLM pretraining. All arithmetic "
    "is BIGINT (floor-div on non-negative operands, round-6 rule); "
    "cost = one token explode + one count aggregate + one equi-join — "
    "mergeable map-side, model size = vocabulary.",
    tags=("llm", "sampling"),
)
def corpus_curriculum_phases(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    tok = docs.select("doc_id", F.explode(toks).alias("w"))
    freq = tok.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("c"))
    scal = tok.agg(
        F.count(F.lit(1)).cast("long").alias("total"),
        F.countDistinct("w").cast("long").alias("nv"),
    )
    ds = (
        tok.join(freq, "w")
        .crossJoin(F.broadcast(scal))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(
                F.when(F.col("c") * F.col("nv") < F.col("total"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_rare"),
        )
    )
    dm = F.expr("(1000 * n_rare) div n_tokens")
    return ds.select(
        "doc_id",
        "n_tokens",
        "n_rare",
        dm.cast("long").alias("difficulty_milli"),
        F.when(dm < 250, 0)
        .when(dm < 500, 1)
        .when(dm < 750, 2)
        .otherwise(3)
        .cast("long")
        .alias("phase"),
    )


# ---------------------------------------------------------------------------
# ANN search in SQ8-quantized space (asymmetric distance) — fully gated.
# ---------------------------------------------------------------------------

_SQ_K = 5


def _sq8_dequant_expr(j: int, vec: str) -> str:
    """Dequantized value for dim j: mn + (code + 0.5) * step. With a
    zero-range dim the step is exactly 0.0 and this collapses to mn —
    no special case. Same IEEE tree both engines."""
    code = _sq8_code_expr(j, vec).rsplit(" AS ", 1)[0]
    return (
        f"(mn{j} + (CAST(({code}) AS DOUBLE) + 0.5) * ((mx{j} - mn{j}) / 255.0)) "
        f"AS d{j}"
    )


def _sq8_adist(qpfx: str, dpfx: str) -> str:
    """Asymmetric L2^2: full-precision query vs dequantized code, fixed
    left-to-right 64-term sum (identical IEEE sequence both engines)."""
    return " + ".join(
        f"({qpfx}{j} - {dpfx}{j}) * ({qpfx}{j} - {dpfx}{j})" for j in range(_SQ_DIM)
    )


def _sq8_topk_oracle() -> str:
    stats = ", ".join(
        f"min(CAST(embedding[{j + 1}] AS DOUBLE)) AS mn{j}, "
        f"max(CAST(embedding[{j + 1}] AS DOUBLE)) AS mx{j}"
        for j in range(_SQ_DIM)
    )
    dq = ", ".join(
        _sq8_dequant_expr(j, f"embedding[{j + 1}]") for j in range(_SQ_DIM)
    )
    qcols = ", ".join(
        f"CAST(embedding[{j + 1}] AS DOUBLE) AS q{j}" for j in range(_SQ_DIM)
    )
    return f"""
    WITH stats AS (SELECT {stats} FROM embeddings),
    dq AS (SELECT vec_id, {dq} FROM embeddings, stats),
    q AS (SELECT vec_id AS query_id, {qcols} FROM embeddings WHERE vec_id < 10),
    s AS (
      SELECT query_id, dq.vec_id AS neighbor_id,
             {_sq8_adist("q", "d")} AS adist
      FROM q CROSS JOIN dq WHERE dq.vec_id <> query_id
    ),
    r AS (SELECT query_id, neighbor_id, adist,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY adist, neighbor_id) AS rank
          FROM s)
    SELECT query_id, neighbor_id, adist, CAST(rank AS BIGINT) AS rank
    FROM r WHERE rank <= {_SQ_K}
    """


@QS.add(
    "ann_sq8_topk",
    _sq8_topk_oracle(),
    doc="[EXT] ANN top-k in SQ8-quantized space via ASYMMETRIC distance "
    "(faiss SQ search posture: full-precision query against dequantized "
    "int8 codes, dq = mn + (code+0.5)*step) — unlike LSH/IVF this "
    "quantized search is fully DETERMINISTIC, so the whole search is "
    "value-hash-gated, completing the quantizer family's eval story "
    "(ivf/ivfpq carry recall gates; SQ8 carries an exact oracle). The "
    "64-term squared-distance sum runs in fixed left-to-right order "
    "(identical IEEE sequence both engines); dequantized dims are named "
    "scalar columns (janino 64 KB discipline; zero-range dims collapse "
    "to mn with step exactly 0.0 — no branch). Scale: encode is "
    "map-only; queries broadcast over the code scan; recall-vs-exact "
    "property is pinned in tests (SQ8 recall floor 0.6 on this corpus).",
    tags=("similarity", "quantization"),
)
def ann_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    emb = load(spark, sf_dir, "embeddings")
    stats = emb.selectExpr(
        *[
            e
            for j in range(_SQ_DIM)
            for e in (
                f"min(CAST(element_at(embedding, {j + 1}) AS DOUBLE)) AS mn{j}",
                f"max(CAST(element_at(embedding, {j + 1}) AS DOUBLE)) AS mx{j}",
            )
        ]
    )
    dq = (
        emb.crossJoin(F.broadcast(stats))
        .selectExpr(
            "vec_id",
            *[
                _sq8_dequant_expr(j, f"element_at(embedding, {j + 1})")
                for j in range(_SQ_DIM)
            ],
        )
        .repartition(emb.sparkSession.sparkContext.defaultParallelism)
    )
    q = emb.filter(F.col("vec_id") < 10).selectExpr(
        "vec_id AS query_id",
        *[
            f"CAST(element_at(embedding, {j + 1}) AS DOUBLE) AS q{j}"
            for j in range(_SQ_DIM)
        ],
    )
    s = (
        dq.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .selectExpr(
            "query_id",
            "vec_id AS neighbor_id",
            f"{_sq8_adist('q', 'd')} AS adist",
        )
    )
    w = W.partitionBy("query_id").orderBy("adist", "neighbor_id")
    return (
        s.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= _SQ_K)
        .select("query_id", "neighbor_id", "adist", "rank")
    )


# ---------------------------------------------------------------------------
# MLM corruption prep: deterministic 15% token masking (BERT-style).
# ---------------------------------------------------------------------------

_MLM_PCT = 15


def _mlm_mask_pred(duck: bool) -> str:
    """Token-position mask decision: md5(doc_id:pos) low 16 bits mod 100
    < 15 — the round-6 portable hash-arithmetic pattern (no RNG, stable
    across engines and reruns). ``i`` is the 1-based position."""
    h = "substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR)), 1, 4)"
    num = (
        f"CAST('0x' || {h} AS INTEGER)"
        if duck
        else f"CAST(conv({h}, 16, 10) AS BIGINT)"
    )
    return f"{num} % 100 < {_MLM_PCT}"


@QS.add(
    "corpus_mlm_corruption",
    f"""
    WITH tok AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    marked AS (
      SELECT doc_id, t,
             list_transform(t, (x, i) ->
               CASE WHEN {_mlm_mask_pred(True)} THEN '[MASK]' ELSE x END) AS ct,
             list_filter(
               list_transform(t, (x, i) ->
                 CASE WHEN {_mlm_mask_pred(True)}
                      THEN CAST(i AS VARCHAR) || ':' || x END),
               x -> x IS NOT NULL) AS mt
      FROM tok
    )
    SELECT doc_id,
           CAST(len(t) AS BIGINT) AS n_tokens,
           CAST(len(mt) AS BIGINT) AS n_masked,
           COALESCE(array_to_string(ct, ' '), '') AS corrupted_text,
           COALESCE(array_to_string(mt, ' '), '') AS mask_targets
    FROM marked
    """,
    doc="[EXT] deterministic MLM corruption prep (BERT-style 15% token "
    "masking): the mask decision per (doc, position) is md5-derived — "
    "no RNG, so the corrupted corpus is identical on every engine, "
    "executor, and rerun (the reproducibility property training-data "
    "pipelines need for resumable preprocessing). Emits the corrupted "
    "text and the position-tagged mask targets (the training labels). "
    "Pure per-row array expressions — zero shuffle, zero UDF, "
    "embarrassingly parallel at 100 TB. Spark's lambda index is 0-based "
    "vs DuckDB's 1-based; both sides address positions 1-based.",
    tags=("llm", "text"),
)
def corpus_mlm_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    # i is 0-based in Spark transform/filter lambdas -> hash over i+1
    pred = (
        _mlm_mask_pred(False)
        .replace("CAST(i AS VARCHAR)", "CAST(i + 1 AS STRING)")
        .replace("AS VARCHAR", "AS STRING")
    )
    tok = docs.selectExpr("doc_id", r"split(lower(trim(text)), '\\s+') AS t")
    marked = tok.selectExpr(
        "doc_id",
        "t",
        f"transform(t, (x, i) -> CASE WHEN {pred} THEN '[MASK]' ELSE x END) AS ct",
        "filter(transform(t, (x, i) -> CASE WHEN "
        + pred
        + " THEN CAST(i + 1 AS STRING) || ':' || x END), x -> x IS NOT NULL) AS mt",
    )
    return marked.selectExpr(
        "doc_id",
        "CAST(size(t) AS BIGINT) AS n_tokens",
        "CAST(size(mt) AS BIGINT) AS n_masked",
        "COALESCE(array_join(ct, ' '), '') AS corrupted_text",
        "COALESCE(array_join(mt, ' '), '') AS mask_targets",
    )


# ---------------------------------------------------------------------------
# n-gram novelty: the memorization/leakage proxy per document.
# ---------------------------------------------------------------------------

_NOV_K = 8


@QS.add(
    "text_ngram_novelty",
    f"""
    WITH tok AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    sh AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(t) - {_NOV_K} + 2),
                    i -> md5(array_to_string(t[i:i + {_NOV_K} - 1], ' ')))) AS h
      FROM tok WHERE len(t) >= {_NOV_K}
    ),
    rep AS (
      SELECT h FROM sh GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2
    )
    SELECT sh.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(SUM(CASE WHEN rep.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_shared,
           CAST(COUNT(*) - SUM(CASE WHEN rep.h IS NOT NULL THEN 1 ELSE 0 END)
                AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS novelty
    FROM sh LEFT JOIN rep ON sh.h = rep.h
    GROUP BY sh.doc_id
    """,
    doc="[EXT] per-document n-gram novelty — the memorization/leakage "
    f"proxy: share of a doc's rolling {_NOV_K}-token windows that appear "
    "in NO other document (cross-doc repetition, not within-doc — the "
    "same window convention as substring_dedup, which REMOVES what this "
    "query MEASURES). novelty = (n_windows - n_shared)/n_windows is one "
    "exact division; windows are md5-keyed so counts replay identically "
    "in DuckDB. Docs shorter than the window emit nothing (the "
    "descending-sequence ANSI guard). Scale: one explode + one "
    "count-distinct-by-hash shuffle — the same posting-list shape as "
    "decontamination.",
    tags=("llm", "text", "dedup"),
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    sh = (
        docs.select("doc_id", toks.alias("t"))
        .filter(F.size("t") >= _NOV_K)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(t) - {_NOV_K} + 1), "
                    f"i -> md5(concat_ws(' ', slice(t, i, {_NOV_K}))))"
                )
            ).alias("h"),
        )
    )
    rep = (
        sh.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    dup = F.sum(F.when(F.col("rep_hit").isNotNull(), 1).otherwise(0)).cast("long")
    return (
        sh.join(rep.withColumn("rep_hit", F.lit(1)), "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_windows"),
            dup.alias("n_shared"),
            (
                (F.count(F.lit(1)) - dup).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("novelty"),
        )
    )


# ---------------------------------------------------------------------------
# Binary (sign) quantization + exact Hamming ANN — the 1-bit quantizer.
# ---------------------------------------------------------------------------

_BQ_K = 5
#: Hamming-shortlist floor; the effective depth is max(this, n_corpus/10)
#: computed from the data on BOTH sides (round-8: a fixed 50 was 10% of
#: the sf0.01 corpus but 2.5% at sf0.1 and recall fell 0.68→0.48 — the
#: round-2 IVFPQ concentration lesson applies to the binary prefilter too).
_BQ_SHORTLIST = 50


def _bq_half(lo: int, vec_fmt: str) -> str:
    """32 sign bits packed into one BIGINT: bit j set iff dim lo+j > 0.
    Split into two 32-bit halves so no engine's left-shift can reach the
    sign bit (DuckDB raises on BIGINT shift overflow)."""
    return " + ".join(
        f"(CASE WHEN {vec_fmt.format(i=lo + j + 1)} > 0 "
        f"THEN CAST({1 << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for j in range(32)
    )


def _bq_codes_sql(vec_fmt: str) -> str:
    return (
        f"({_bq_half(0, vec_fmt)}) AS sig_lo, ({_bq_half(32, vec_fmt)}) AS sig_hi"
    )


@QS.add(
    "ann_binary_hamming_topk",
    f"""
    WITH codes AS (
      SELECT vec_id,
             {_bq_codes_sql("CAST(embedding[{i}] AS DOUBLE)")}
      FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, sig_lo AS q_lo, sig_hi AS q_hi
          FROM codes WHERE vec_id < 10),
    s AS (
      SELECT query_id, c.vec_id AS neighbor_id,
             CAST(bit_count(xor(q_lo, c.sig_lo))
                  + bit_count(xor(q_hi, c.sig_hi)) AS BIGINT) AS hamming
      FROM q CROSS JOIN codes c WHERE c.vec_id <> query_id
    ),
    short AS (
      SELECT query_id, neighbor_id, hamming FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY hamming, neighbor_id) AS hr
        FROM s) h
      WHERE hr <= GREATEST({_BQ_SHORTLIST},
                           (SELECT COUNT(*) FROM embeddings) // 10)
    ),
    v AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
          FROM embeddings),
    rer AS (
      SELECT sh.query_id, sh.neighbor_id, sh.hamming,
             list_reduce(list_transform(range(1, len(qv.e)+1),
                                        i -> qv.e[i]*cv.e[i]), (x,y) -> x+y)
             / (sqrt(list_reduce(list_transform(qv.e, x -> x*x), (x,y) -> x+y))
                * sqrt(list_reduce(list_transform(cv.e, x -> x*x), (x,y) -> x+y)))
               AS cos_sim
      FROM short sh JOIN v qv ON qv.vec_id = sh.query_id
      JOIN v cv ON cv.vec_id = sh.neighbor_id
    ),
    r AS (SELECT query_id, neighbor_id, hamming, cos_sim,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY cos_sim DESC, neighbor_id) AS rank
          FROM rer)
    SELECT query_id, neighbor_id, hamming, cos_sim, CAST(rank AS BIGINT) AS rank
    FROM r WHERE rank <= {_BQ_K}
    """,
    doc="[EXT] 1-bit (sign) quantization ANN with exact re-rank: each "
    "embedding collapses to 64 sign bits packed into two BIGINT halves "
    "(no shift can reach the sign bit — DuckDB raises on BIGINT shift "
    "overflow); stage 1 ranks the corpus by Hamming bit_count(xor) and "
    f"keeps a max({_BQ_SHORTLIST}, n/10)-deep shortlist (corpus-"
    "proportional, computed from the data on both sides — round-8 fix "
    "after the fixed 50 let recall fall to 0.48 at sf0.1), stage 2 "
    "re-ranks the shortlist by exact cosine — the faiss binary-"
    "prefilter posture (RaBitQ-style), completing the quantizer ladder "
    "SQ8 -> PQ -> 1-bit. Both stages are deterministic (integer "
    "Hamming ties by id; bit-identical cosine folds) so unlike LSH the "
    "WHOLE pipeline carries an exact value hash; "
    "ann_binary_recall_gate pins recall >= 0.6 vs exact cosine — "
    "measured 0.70/0.68/0.78 at sf0.001/0.01/0.1, 2026-08-15 (pure Hamming "
    "alone recalls ~0.2: this corpus's distances CONCENTRATE, the "
    "round-2 IVFPQ lesson, so 64 sign bits rank the bulk of the corpus "
    "nearly equal and the exact re-rank does the real separation). "
    "Scale: encode map-only, 16 bytes/vector; the cosine stage touches "
    "only shortlist x queries rows.",
    tags=("similarity", "quantization"),
)
def ann_binary_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    emb = load(spark, sf_dir, "embeddings")
    codes = emb.selectExpr(
        "vec_id",
        f"({_bq_half(0, 'CAST(element_at(embedding, {i}) AS DOUBLE)')}) AS sig_lo",
        f"({_bq_half(32, 'CAST(element_at(embedding, {i}) AS DOUBLE)')}) AS sig_hi",
    ).repartition(emb.sparkSession.sparkContext.defaultParallelism)
    q = codes.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("sig_lo").alias("q_lo"),
        F.col("sig_hi").alias("q_hi"),
    )
    s = codes.join(F.broadcast(q), F.col("vec_id") != F.col("query_id")).selectExpr(
        "query_id",
        "vec_id AS neighbor_id",
        "CAST(bit_count(q_lo ^ sig_lo) + bit_count(q_hi ^ sig_hi) AS BIGINT)"
        " AS hamming",
    )
    w_h = W.partitionBy("query_id").orderBy("hamming", "neighbor_id")
    # Depth = max(floor, n/10), exact-integer, matching the oracle's scalar
    # subquery (bounded 1-row collect — the kmeans sample-train convention).
    depth = max(_BQ_SHORTLIST, emb.count() // 10)
    short = (
        s.withColumn("hr", F.row_number().over(w_h))
        .filter(F.col("hr") <= F.lit(depth))
        .select("query_id", "neighbor_id", "hamming")
    )
    from clinical_api_etl_spark.functions.vectors import as_double, dot, norm

    v = emb.select(
        "vec_id",
        as_double(F.col("embedding")).alias("e"),
        norm(as_double(F.col("embedding"))).alias("nrm"),
    )
    qv = v.select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qe"),
        F.col("nrm").alias("qn"),
    )
    cv = v.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("e").alias("ce"),
        F.col("nrm").alias("cn"),
    )
    rer = (
        short.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            "hamming",
            (dot(F.col("qe"), F.col("ce")) / (F.col("qn") * F.col("cn"))).alias(
                "cos_sim"
            ),
        )
    )
    w_r = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        rer.withColumn("rank", F.row_number().over(w_r).cast("long"))
        .filter(F.col("rank") <= _BQ_K)
        .select("query_id", "neighbor_id", "hamming", "cos_sim", "rank")
    )


@QS.add(
    "ann_binary_recall_gate",
    "SELECT CAST(50 AS BIGINT) AS n_exact, 0.6 AS recall_floor, TRUE AS met",
    doc="[EXT] hash-checked recall floor for ann_binary_hamming_topk: "
    "recall vs the exact brute-force cosine top-k must stay >= 0.6 "
    "(measured 0.70/0.68/0.78 at sf0.001/0.01/0.1 on 2026-08-15, with "
    "the corpus-proportional shortlist). VERDICT r07 task 1: the "
    "binary query's own value hash compares Spark to a DuckDB replay "
    "of the SAME algorithm, so a recall regression would pass it — "
    "this gate pins the recall itself as a driver-enforced invariant.",
    tags=("similarity", "quantization", "gate"),
)
def ann_binary_recall_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.similarity import cosine_topk
    from clinical_api_etl_spark.plans.extensions import _recall_gate

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return _recall_gate(
        ann_binary_hamming_topk(spark, sf_dir),
        cosine_topk(queries, emb, k=_BQ_K),
        0.6,
    )


# ---------------------------------------------------------------------------
# Corpus data card: the per-language release artifact, one hash gate.
# ---------------------------------------------------------------------------


# Data-card tokenizer: null text coalesces to '' before splitting so a
# null-text doc still counts (1 empty token) — keeps the streaming twin's
# words-derived counters bit-identical (ADVICE r07; streaming/datacard.py
# applies the same coalesce). Testdata has no null text, hash unchanged.
_TOKS_NN = r"regexp_split_to_array(lower(trim(coalesce(text, ''))), '\s+')"


@QS.add(
    "corpus_data_card",
    f"""
    WITH tok AS (SELECT doc_id, lang, {_TOKS_NN} AS t FROM documents),
    base AS (
      SELECT lang,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len(t)) AS BIGINT) AS n_tokens
      FROM tok GROUP BY lang
    ),
    dup AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_dup_docs FROM (
        SELECT d.lang, d.doc_id FROM documents d
        JOIN (SELECT md5(text) AS h FROM documents
              GROUP BY md5(text) HAVING COUNT(*) >= 2) g
          ON md5(d.text) = g.h
      ) x GROUP BY lang
    ),
    win AS (
      SELECT doc_id, lang,
             unnest(list_transform(range(1, len(t) - {_NOV_K} + 2),
                    i -> md5(array_to_string(t[i:i + {_NOV_K} - 1], ' ')))) AS h
      FROM tok WHERE len(t) >= {_NOV_K}
    ),
    rep AS (SELECT h FROM win GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
    novel AS (
      SELECT lang,
             CAST(COUNT(*) AS BIGINT) AS n_windows,
             CAST(SUM(CASE WHEN rep.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_shared
      FROM win LEFT JOIN rep ON win.h = rep.h GROUP BY lang
    ),
    freq AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT unnest(t) AS w FROM tok) GROUP BY w
    ),
    scal AS (SELECT CAST(SUM(c) AS BIGINT) AS total,
                    CAST(COUNT(*) AS BIGINT) AS nv FROM freq),
    phases AS (
      SELECT lang,
             CAST(SUM(CASE WHEN dm < 500 THEN 1 ELSE 0 END) AS BIGINT) AS n_easy,
             CAST(SUM(CASE WHEN dm >= 500 THEN 1 ELSE 0 END) AS BIGINT) AS n_hard
      FROM (
        SELECT x.lang, (1000 * x.n_rare) // x.n_tok AS dm FROM (
          SELECT u.doc_id, u.lang, CAST(COUNT(*) AS BIGINT) AS n_tok,
                 CAST(SUM(CASE WHEN f.c * scal.nv < scal.total
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_rare
          FROM (SELECT doc_id, lang, unnest(t) AS w FROM tok) u
          JOIN freq f ON u.w = f.w CROSS JOIN scal
          GROUP BY u.doc_id, u.lang
        ) x
      ) y GROUP BY lang
    )
    SELECT base.lang, base.n_docs, base.n_tokens,
           COALESCE(dup.n_dup_docs, 0) AS n_dup_docs,
           novel.n_windows, novel.n_shared,
           CAST(novel.n_windows - novel.n_shared AS DOUBLE)
             / CAST(novel.n_windows AS DOUBLE) AS novelty,
           phases.n_easy, phases.n_hard
    FROM base
    LEFT JOIN dup ON dup.lang = base.lang
    JOIN novel ON novel.lang = base.lang
    JOIN phases ON phases.lang = base.lang
    """,
    doc="[EXT] corpus DATA CARD — the per-language release artifact a "
    "training run publishes, composed in ONE hash gate: doc/token "
    "counts, exact-duplicate membership, cross-doc 8-gram novelty "
    "(aggregated per language as an exact shared/total ratio — no "
    "float averaging), and the curriculum easy/hard split. Composing "
    "the separately-gated sub-pipelines into one oracle re-checks "
    "their edge conventions against each other (the round-7 curation-"
    "scorecard lesson: composition catches definition divergences "
    "that pass alone). All counting is BIGINT; novelty is the single "
    "division per language. The card's tokenizer-EQUITY section lives "
    "in its row-compatible companions: tokenizer_family_fertility "
    "(per-lang BPE vs unigram fertility + ratio, one composed hash "
    "gate) joins on this card's lang key; the streaming twin "
    "(streaming/datacard.py) keeps the counters current per "
    "micro-batch.",
    tags=("llm", "quality"),
)
def corpus_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    tok = docs.select("doc_id", "lang", toks.alias("t"))
    base = tok.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size("t")).cast("long").alias("n_tokens"),
    )
    g = (
        docs.groupBy(F.md5("text").alias("h"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("h")
    )
    dup = (
        docs.select("lang", "doc_id", F.md5("text").alias("h"))
        .join(g, "h")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n_dup_docs"))
    )
    win = (
        tok.filter(F.size("t") >= _NOV_K)
        .select(
            "doc_id",
            "lang",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(t) - {_NOV_K} + 1), "
                    f"i -> md5(concat_ws(' ', slice(t, i, {_NOV_K}))))"
                )
            ).alias("h"),
        )
    )
    rep = (
        win.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
        .withColumn("rep_hit", F.lit(1))
    )
    novel = (
        win.join(rep, "h", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_windows"),
            F.sum(F.when(F.col("rep_hit").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_shared"),
        )
    )
    u = tok.select("doc_id", "lang", F.explode("t").alias("w"))
    freq = u.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("c"))
    scal = freq.agg(
        F.sum("c").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("nv"),
    )
    per_doc = (
        u.join(freq, "w")
        .crossJoin(F.broadcast(scal))
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tok"),
            F.sum(
                F.when(F.col("c") * F.col("nv") < F.col("total"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_rare"),
        )
    )
    dm = F.expr("(1000 * n_rare) div n_tok")
    phases = per_doc.groupBy("lang").agg(
        F.sum(F.when(dm < 500, 1).otherwise(0)).cast("long").alias("n_easy"),
        F.sum(F.when(dm >= 500, 1).otherwise(0)).cast("long").alias("n_hard"),
    )
    return (
        base.join(dup, "lang", "left")
        .join(novel, "lang")
        .join(phases, "lang")
        .select(
            "lang",
            "n_docs",
            "n_tokens",
            F.coalesce("n_dup_docs", F.lit(0)).cast("long").alias("n_dup_docs"),
            "n_windows",
            "n_shared",
            (
                (F.col("n_windows") - F.col("n_shared")).cast("double")
                / F.col("n_windows").cast("double")
            ).alias("novelty"),
            "n_easy",
            "n_hard",
        )
    )


# ---------------------------------------------------------------------------
# Unigram-LM tokenizer (SentencePiece posture) — the second tokenizer
# family next to BPE (operators/unigram.py; VERDICT r06 task 3).
# ---------------------------------------------------------------------------

_UG_MAXP = 4
_UG_SEED_MULTI = 96
_UG_FINAL_MULTI = 48
_UG_ROUNDS = 2


def _ug_dp_duck() -> str:
    """DuckDB twin of operators/unigram.py:_dp_sql — the Viterbi DP as a
    list_reduce with a growing DOUBLE[] accumulator (round-10 LIST-fold
    template; position rides the reduced element)."""
    cands = ", ".join(
        f"CASE WHEN CAST(x[1] AS INTEGER) >= {k}"
        f" THEN acc[CAST(x[1] AS INTEGER) - {k} + 1]"
        f" * ss[(CAST(x[1] AS INTEGER) - {k}) * {_UG_MAXP} + {k}]"
        f" ELSE CAST(0 AS DOUBLE) END"
        for k in range(1, _UG_MAXP + 1)
    )
    return (
        "list_reduce(list_prepend([CAST(1 AS DOUBLE)],"
        " list_transform(range(1, wlen + 1), i -> [CAST(i AS DOUBLE)])),"
        f" (acc, x) -> list_append(acc, greatest({cands})))"
    )


def _ug_walk_duck() -> str:
    pos = "acc[len(acc)]"
    eqs = " ".join(
        f"WHEN ({pos} >= {k} AND dp[{pos} - {k} + 1]"
        f" * ss[({pos} - {k}) * {_UG_MAXP} + {k}] = dp[{pos} + 1]) THEN {k}"
        for k in range(1, _UG_MAXP + 1)
    )
    return (
        "list_reduce(list_prepend([CAST(wlen AS INTEGER)],"
        " list_transform(range(1, wlen + 1), j -> [CAST(j AS INTEGER)])),"
        f" (acc, x) -> list_append(acc, CAST(CASE WHEN {pos} <= 0 THEN 0"
        f" ELSE {pos} - (CASE {eqs} ELSE {pos} END) END AS INTEGER)))"
    )


_UG_PIECES_DUCK = (
    "list_reverse(list_filter(list_transform(range(1, len(walk)),"
    " j -> CASE WHEN walk[j] > walk[j + 1]"
    " THEN substr(word, walk[j + 1] + 1, walk[j] - walk[j + 1]) END),"
    " x -> x IS NOT NULL))"
)


def _ug_spans_cte(p: str, wt: str, keycols: str) -> str:
    """Spans CTE: one row per (word, start, len<=4) with the dense slot."""
    return (
        f"{p}spans AS MATERIALIZED ("
        f" SELECT {keycols} word, freq, wlen,"
        f" (ik[1] - 1) * {_UG_MAXP} + ik[2] AS slot,"
        " substr(word, ik[1], ik[2]) AS piece FROM ("
        f"  SELECT {keycols} word, freq, wlen,"
        "  unnest(flatten(list_transform(range(1, wlen + 1),"
        f"  i -> list_transform(range(1, {_UG_MAXP + 1}), k -> [i, k])))) AS ik"
        f"  FROM (SELECT {keycols} word, freq,"
        f"  CAST(length(word) AS INTEGER) AS wlen FROM {wt}))"
        " WHERE ik[1] + ik[2] - 1 <= wlen)"
    )


def _ug_viterbi_ctes(p: str, spans: str, vocab: str, keycols: str) -> list[str]:
    """Ladder + dp + walk + pieces CTE chain for one Viterbi pass."""
    slots = 12 * _UG_MAXP
    ladder = ", ".join(
        f"COALESCE(MAX(CASE WHEN slot = {s} THEN score END),"
        " CAST(0 AS DOUBLE))"
        for s in range(1, slots + 1)
    )
    return [
        f"{p}lad AS MATERIALIZED (SELECT {keycols} word, freq, wlen,"
        f" list_value({ladder}) AS ss"
        f" FROM {spans} JOIN {vocab} USING (piece)"
        f" GROUP BY {keycols} word, freq, wlen)",
        f"{p}dp AS MATERIALIZED (SELECT {keycols} word, freq, wlen, ss,"
        f" {_ug_dp_duck()} AS dp FROM {p}lad)",
        f"{p}wk AS MATERIALIZED (SELECT {keycols} word, freq,"
        f" {_ug_walk_duck()} AS walk FROM {p}dp)",
        f"{p}seg AS MATERIALIZED (SELECT {keycols} word, freq,"
        f" {_UG_PIECES_DUCK} AS pieces FROM {p}wk)",
    ]


def _ug_learn_ctes() -> list[str]:
    """Shared CTE chain: word table -> seed -> EM rounds -> pruned vocab
    ``ugkept`` (piece, cnt) with total in ``ugfin`` (piece, cnt, score)."""
    ctes = [
        "ugw AS MATERIALIZED (SELECT word, CAST(COUNT(*) AS BIGINT) AS freq"
        f" FROM (SELECT unnest({_TOKS}) AS word FROM documents)"
        " WHERE length(word) BETWEEN 1 AND 12 GROUP BY word)",
        _ug_spans_cte("ugw", "ugw", ""),
        "ugcnt0 AS MATERIALIZED (SELECT piece, CAST(SUM(freq) AS BIGINT)"
        " AS cnt FROM ugwspans GROUP BY piece)",
        "ugchars AS MATERIALIZED (SELECT piece, cnt FROM ugcnt0"
        " WHERE length(piece) = 1)",
        "ugseedm AS MATERIALIZED (SELECT piece, cnt FROM ugcnt0"
        f" WHERE length(piece) >= 2 ORDER BY cnt DESC, piece"
        f" LIMIT {_UG_SEED_MULTI})",
        "ugseedu AS MATERIALIZED (SELECT piece, cnt FROM ugchars"
        " UNION ALL SELECT piece, cnt FROM ugseedm)",
        "ugv0 AS MATERIALIZED (SELECT piece, cnt, CAST(cnt AS DOUBLE)"
        " / (SELECT CAST(SUM(cnt) AS DOUBLE) FROM ugseedu) AS score"
        " FROM ugseedu)",
    ]
    for r in range(1, _UG_ROUNDS + 1):
        ctes += _ug_viterbi_ctes(f"ugr{r}", "ugwspans", f"ugv{r - 1}", "")
        ctes += [
            f"uguse{r} AS MATERIALIZED (SELECT piece, CAST(SUM(c) AS BIGINT)"
            " AS cnt FROM ("
            f" SELECT unnest(pieces) AS piece, freq AS c FROM ugr{r}seg"
            " UNION ALL SELECT piece, CAST(1 AS BIGINT) AS c FROM ugchars)"
            " GROUP BY piece)",
            f"ugv{r} AS MATERIALIZED (SELECT piece, cnt, CAST(cnt AS DOUBLE)"
            f" / (SELECT CAST(SUM(cnt) AS DOUBLE) FROM uguse{r}) AS score"
            f" FROM uguse{r})",
        ]
    ctes += [
        f"ugkeptm AS MATERIALIZED (SELECT piece, cnt FROM ugv{_UG_ROUNDS}"
        f" WHERE length(piece) >= 2 ORDER BY cnt DESC, piece"
        f" LIMIT {_UG_FINAL_MULTI})",
        f"ugkept AS MATERIALIZED (SELECT piece, cnt FROM ugv{_UG_ROUNDS}"
        " WHERE length(piece) = 1 UNION ALL SELECT piece, cnt FROM ugkeptm)",
        "ugfin AS MATERIALIZED (SELECT piece, cnt, CAST(cnt AS DOUBLE)"
        " / (SELECT CAST(SUM(cnt) AS DOUBLE) FROM ugkept) AS score"
        " FROM ugkept)",
    ]
    return ctes


def _ug_learn_oracle() -> str:
    return (
        "WITH "
        + ",\n".join(_ug_learn_ctes())
        + "\nSELECT piece, CAST(length(piece) AS BIGINT) AS piece_len,"
        " cnt, score FROM ugfin"
    )


def _ug_fertility_oracle() -> str:
    ctes = _ug_learn_ctes()
    ctes += [
        "ugwl AS MATERIALIZED (SELECT lang, word,"
        " CAST(COUNT(*) AS BIGINT) AS freq FROM"
        f" (SELECT lang, unnest({_TOKS}) AS word FROM documents)"
        " WHERE length(word) BETWEEN 1 AND 12 GROUP BY lang, word)",
        _ug_spans_cte("ugl", "ugwl", "lang,"),
        *_ug_viterbi_ctes("ugf", "uglspans", "ugfin", "lang,"),
    ]
    return (
        "WITH "
        + ",\n".join(ctes)
        + "\nSELECT lang, CAST(SUM(freq) AS BIGINT) AS n_words,"
        " CAST(SUM(freq * len(pieces)) AS BIGINT) AS n_pieces,"
        " CAST(SUM(freq * len(pieces)) AS DOUBLE)"
        " / CAST(SUM(freq) AS DOUBLE) AS fertility"
        " FROM ugfseg GROUP BY lang"
    )


@QS.add(
    "unigram_learn_vocab",
    _ug_learn_oracle(),
    doc="[EXT] unigram-LM tokenizer training (Kudo'18 / SentencePiece "
    "posture), completing the tokenizer surface next to bpe_learn_merges "
    "the way SQ8/binary completed the quantizer ladder: seed vocab = all "
    f"chars + top-{_UG_SEED_MULTI} frequent substrings (len 2-4), "
    f"{_UG_ROUNDS} hard-EM rounds (Viterbi segmentation of the DISTINCT-"
    "WORD table -> frequency-weighted piece usage with a +1 char floor "
    "-> MLE re-score), prune to all chars + top-"
    f"{_UG_FINAL_MULTI} pieces. 15th hash-gated iterative, and the "
    "second FLOAT-state one: scores are single divisions over exact "
    "BIGINTs, the DP folds products in pinned position order (each "
    "candidate ONE multiply of bit-identical doubles, greatest over "
    "bit-identical doubles deterministic), and the backtrack re-derives "
    "choices by float EQUALITY on those bit-identical values — so vocab, "
    "counts, and scores all match DuckDB exactly. Piece lookup rides a "
    "dense 48-slot span-score ladder (12 pos x 4 len; k-means scalar-"
    "column discipline, identical CASE ladder both engines; 1-based "
    "element_at per the round-12 rule). Everything after tokenization is "
    "VOCABULARY-scaled (BPE-apply posture); the vocab broadcast is KBs. "
    "Oracle: the same seed/EM/prune chain as MATERIALIZED CTEs with "
    "list_reduce LIST-accumulator folds (round-10 template).",
    headline=True,
    tags=("text", "iterative"),
)
def unigram_learn_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.unigram import learn_unigram

    return learn_unigram(load(spark, sf_dir, "documents"))


@QS.add(
    "unigram_fertility_by_lang",
    _ug_fertility_oracle(),
    doc="[EXT] per-language fertility (pieces per word) of the unigram-LM "
    "tokenizer — the tokenizer-equity metric comparable row-for-row with "
    "bpe_fertility_by_lang, giving the data card a cross-FAMILY "
    "comparison (BPE vs unigram) instead of a single-tokenizer view. "
    "Trains the full unigram vocab (unigram_learn_vocab's exact "
    "pipeline), then Viterbi-segments the per-language word table under "
    "the pruned vocab's scores; fertility = n_pieces/n_words, one "
    "division over exact BIGINT sums. Fully hash-gated end to end "
    "(training AND apply inside one oracle).",
    tags=("text",),
)
def unigram_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.unigram import (
        learn_unigram,
        viterbi_pieces,
        word_table,
    )

    docs = load(spark, sf_dir, "documents")
    vocab = learn_unigram(docs).select("piece", "score")
    wl = word_table(docs, ("lang",))
    seg = viterbi_pieces(wl, vocab, keys=["lang"])
    return seg.groupBy("lang").agg(
        F.sum("freq").cast("long").alias("n_words"),
        F.sum(F.col("freq") * F.size("pieces")).cast("long").alias("n_pieces"),
        (
            F.sum(F.col("freq") * F.size("pieces")).cast("double")
            / F.sum("freq").cast("double")
        ).alias("fertility"),
    )


def _family_fertility_oracle() -> str:
    """Composed oracle: the BPE learn-then-apply fertility chain (from
    plans/inference.py, CTE names toks/w/s*/p*/m*) next to the unigram
    learn+apply chain (ug*-prefixed — namespaces are disjoint), joined
    per language. The ratio is ONE IEEE division of two bit-identical
    doubles, so the whole artifact stays hash-gated."""
    from clinical_api_etl_spark.plans.inference import (
        _BPE_MERGES,
        _bpe_artifact_ctes,
    )

    ug = _ug_learn_ctes()
    ug += [
        "ugwl AS MATERIALIZED (SELECT lang, word,"
        " CAST(COUNT(*) AS BIGINT) AS freq FROM"
        f" (SELECT lang, unnest({_TOKS}) AS word FROM documents)"
        " WHERE length(word) BETWEEN 1 AND 12 GROUP BY lang, word)",
        _ug_spans_cte("ugl", "ugwl", "lang,"),
        *_ug_viterbi_ctes("ugf", "uglspans", "ugfin", "lang,"),
        "ufert AS MATERIALIZED (SELECT lang,"
        " CAST(SUM(freq) AS BIGINT) AS n_words_ug,"
        " CAST(SUM(freq * len(pieces)) AS DOUBLE)"
        " / CAST(SUM(freq) AS DOUBLE) AS unigram_fertility"
        " FROM ugfseg GROUP BY lang)",
    ]
    return (
        "WITH "
        + _bpe_artifact_ctes(_BPE_MERGES)
        + f""",
    bseg AS MATERIALIZED (
      SELECT word, CAST(len(string_split(sym, ' ')) AS BIGINT) AS n_sub
      FROM s{_BPE_MERGES}),
    bdocw AS MATERIALIZED (
      SELECT d.lang, x.tok AS word, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT doc_id, unnest(t) AS tok FROM toks) x
      JOIN documents d USING (doc_id)
      GROUP BY d.lang, x.tok),
    bfert AS MATERIALIZED (
      SELECT lang, CAST(SUM(c) AS BIGINT) AS n_words_bpe,
             CAST(SUM(c * n_sub) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)
               AS bpe_fertility
      FROM bdocw JOIN bseg USING (word) GROUP BY lang),
    """
        + ",\n".join(ug)
        + "\nSELECT lang, n_words_bpe, bpe_fertility, n_words_ug,"
        " unigram_fertility,"
        " unigram_fertility / bpe_fertility AS fertility_ratio"
        " FROM bfert JOIN ufert USING (lang)"
    )


@QS.add(
    "tokenizer_family_fertility",
    _family_fertility_oracle(),
    doc="[EXT] cross-FAMILY tokenizer equity artifact: trains BOTH "
    "tokenizers (BPE merge chain + unigram-LM hard-EM) on the same "
    "corpus and emits per-language fertility side by side, plus the "
    "unigram/BPE ratio — the comparison a tokenizer bake-off (and the "
    "data card's equity section) actually gates on, rather than two "
    "disconnected single-family views. All counts are exact BIGINTs; "
    "each fertility is one division, the ratio one more IEEE division "
    "of bit-identical doubles — the composed artifact stays fully "
    "hash-gated (both trainings inside one oracle). Composition reuses "
    "the registered builders verbatim, so any divergence between this "
    "artifact and the standalone queries is itself a test signal.",
    tags=("text", "iterative"),
)
def tokenizer_family_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.plans.inference import bpe_fertility_by_lang

    bpe = bpe_fertility_by_lang(spark, sf_dir).select(
        "lang",
        F.col("n_words").alias("n_words_bpe"),
        "fertility",
    ).withColumnRenamed("fertility", "bpe_fertility")
    ug = unigram_fertility_by_lang(spark, sf_dir).select(
        "lang",
        F.col("n_words").alias("n_words_ug"),
        F.col("fertility").alias("unigram_fertility"),
    )
    return bpe.join(ug, "lang").select(
        "lang",
        "n_words_bpe",
        "bpe_fertility",
        "n_words_ug",
        "unigram_fertility",
        (F.col("unigram_fertility") / F.col("bpe_fertility")).alias(
            "fertility_ratio"
        ),
    )


_DR_ROUNDS = 5
_DR_TOPV = 256
_DR_ETA = "0.1e0"  # e0 suffix forces the correctly-rounded DOUBLE parse


def _doremi_ctes() -> list[str]:
    ctes = [
        f"drtok AS MATERIALIZED (SELECT source, unnest({_TOKS}) AS w"
        " FROM documents)",
        "drcnt AS MATERIALIZED (SELECT w, CAST(COUNT(*) AS BIGINT) AS c"
        " FROM drtok GROUP BY w)",
        f"drtop AS MATERIALIZED (SELECT w FROM drcnt"
        f" ORDER BY c DESC, w LIMIT {_DR_TOPV})",
        "drdom AS MATERIALIZED (SELECT t.source,"
        " CAST(COUNT(*) AS BIGINT) AS n_tokens,"
        " CAST(SUM(CASE WHEN p.w IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
        " AS n_rare FROM drtok t LEFT JOIN drtop p USING (w)"
        " GROUP BY t.source)",
        "drl AS MATERIALIZED (SELECT source, n_tokens, n_rare,"
        " CAST(n_rare AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS loss"
        " FROM drdom)",
        "drw0 AS MATERIALIZED (SELECT source, n_tokens, n_rare, loss,"
        " CAST(1 AS DOUBLE) / CAST((SELECT COUNT(*) FROM drl) AS DOUBLE)"
        " AS w FROM drl)",
    ]
    for i in range(1, _DR_ROUNDS + 1):
        ctes += [
            f"drr{i} AS MATERIALIZED (SELECT source, n_tokens, n_rare,"
            f" loss, w * (CAST(1 AS DOUBLE) + {_DR_ETA} * loss) AS t"
            f" FROM drw{i - 1})",
            f"drz{i} AS (SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE),"
            f" list(t ORDER BY source)), (x, y) -> x + y) AS z FROM drr{i})",
            f"drw{i} AS MATERIALIZED (SELECT source, n_tokens, n_rare,"
            f" loss, t / (SELECT z FROM drz{i}) AS w FROM drr{i})",
        ]
    return ctes


def _doremi_oracle() -> str:
    return (
        "WITH "
        + ",\n".join(_doremi_ctes())
        + f"\nSELECT source, n_tokens, n_rare, loss, w AS weight"
        f" FROM drw{_DR_ROUNDS}"
    )


@QS.add(
    "corpus_doremi_domain_weights",
    _doremi_oracle(),
    doc="[EXT] DoReMi-posture domain reweighting (Xie et al. 2023): "
    "instead of sampling pretraining domains by raw size, upweight the "
    "domains a proxy finds HARD. This is the deterministic static-loss "
    "variant: excess loss per source domain = its rare-token ratio "
    f"(tokens outside the corpus top-{_DR_TOPV} vocabulary — exact "
    "BIGINT counts, one division), then {n} rounds of LINEARIZED "
    "multiplicative weights w ← normalize(w · (1 + η·loss)) with "
    "η=0.1 (the 1+εm MWU form — exp() is JVM-vs-libm unportable, the "
    "linearized update is multiply/add of bit-identical doubles). Each "
    "round's normalizer is a pinned-order fold over the 20-row domain "
    "table; every weight trajectory value is bit-identical cross-engine "
    "— the 17th hash-gated iterative. Scale shape: ONE corpus-scan "
    "aggregation builds the loss table; the MWU itself runs on "
    "|domains| rows.".replace("{n}", str(_DR_ROUNDS)),
    headline=True,
    tags=("mlprep", "iterative"),
)
def corpus_doremi_domain_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(tokens(F.col("text"))).alias("w")
    ).persist()
    cnt = tok.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("c"))
    top = (
        cnt.orderBy(F.desc("c"), F.asc("w"))
        .limit(_DR_TOPV)
        .select("w", F.lit(1).alias("intop"))
    )
    dom = (
        tok.join(F.broadcast(top), "w", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("intop").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_rare"),
        )
    )
    lt = dom.select(
        "source",
        "n_tokens",
        "n_rare",
        (F.col("n_rare").cast("double") / F.col("n_tokens").cast("double")).alias(
            "loss"
        ),
    ).persist()
    n_dom = lt.count()  # bounded: |source domains|
    w = lt.select(
        "source",
        "n_tokens",
        "n_rare",
        "loss",
        (F.lit(1.0) / F.lit(float(n_dom))).alias("w"),
    )
    for _ in range(_DR_ROUNDS):
        terms = w.select(
            "source",
            "n_tokens",
            "n_rare",
            "loss",
            (F.col("w") * (F.lit(1.0) + F.lit(0.1) * F.col("loss"))).alias("t"),
        )
        z = terms.agg(
            F.aggregate(
                F.sort_array(F.collect_list(F.struct("source", "t"))),
                F.lit(0.0),
                lambda acc, x: acc + x["t"],
            ).alias("z")
        )
        w = terms.crossJoin(F.broadcast(z)).select(
            "source",
            "n_tokens",
            "n_rare",
            "loss",
            (F.col("t") / F.col("z")).alias("w"),
        )
    return w.select(
        "source", "n_tokens", "n_rare", "loss", F.col("w").alias("weight")
    )


_DRS_BUDGET = 200


@QS.add(
    "corpus_doremi_resample",
    "WITH "
    + ",\n".join(_doremi_ctes())
    + f""",
    drsw AS MATERIALIZED (SELECT source, w FROM drw{_DR_ROUNDS}),
    drsraw AS (
      SELECT source, CAST({_DRS_BUDGET} AS DOUBLE) * w AS r FROM drsw),
    drsbase AS MATERIALIZED (
      SELECT source, CAST(floor(r) AS BIGINT) AS b, r - floor(r) AS rem
      FROM drsraw),
    drslv AS (SELECT CAST({_DRS_BUDGET} - SUM(b) AS BIGINT) AS leftover
              FROM drsbase),
    drsalloc AS MATERIALIZED (
      SELECT source,
             CAST(b + CASE WHEN row_number() OVER (ORDER BY rem DESC, source)
                                <= drslv.leftover
                           THEN 1 ELSE 0 END AS BIGINT) AS alloc
      FROM drsbase CROSS JOIN drslv),
    drsranked AS (
      SELECT d.source, d.doc_id,
             CAST(row_number() OVER (
               PARTITION BY d.source
               ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id)
             AS BIGINT) AS sel_rank
      FROM documents d)
    SELECT r.source, r.doc_id, r.sel_rank, a.alloc
    FROM drsranked r JOIN drsalloc a USING (source)
    WHERE r.sel_rank <= a.alloc
    """,
    doc="[EXT] DoReMi loop CLOSED: the MWU domain weights become an "
    f"actual resampled-corpus manifest — a {_DRS_BUDGET}-doc budget is "
    "apportioned per source by the exact largest-remainder method "
    "(floor + remainder-ranked top-up, nothing lost; the "
    "mixture_temperature_sampling discipline, explicit floor() before "
    "the BIGINT cast per the round-6 rule), then each domain "
    "contributes its first alloc docs in md5(doc_id) order — the "
    "hash-deterministic sampling convention, so the manifest is "
    "reproducible on any engine with no RNG. Output = the manifest "
    "rows (source, doc_id, sel_rank, alloc), fully hash-gated through "
    "weights, apportionment AND selection. Scale shape: the weight "
    "chain is domain-scaled; selection is one per-source window over "
    "the documents scan.",
    tags=("mlprep", "sampling"),
)
def corpus_doremi_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = corpus_doremi_domain_weights(spark, sf_dir).select("source", "weight")
    raw = w.select(
        "source", (F.lit(float(_DRS_BUDGET)) * F.col("weight")).alias("r")
    )
    base = raw.select(
        "source",
        F.floor("r").cast("long").alias("b"),
        (F.col("r") - F.floor("r")).alias("rem"),
    ).coalesce(1).persist()
    lv = base.agg(
        (F.lit(_DRS_BUDGET) - F.sum("b")).cast("long").alias("leftover")
    )
    alloc = (
        base.crossJoin(F.broadcast(lv))
        .withColumn(
            "rk",
            F.row_number().over(Window.orderBy(F.desc("rem"), F.asc("source"))),
        )
        .select(
            "source",
            (
                F.col("b")
                + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
            )
            .cast("long")
            .alias("alloc"),
        )
    )
    docs = load(spark, sf_dir, "documents")
    ranked = docs.select(
        "source",
        "doc_id",
        F.row_number()
        .over(
            Window.partitionBy("source").orderBy(
                F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
            )
        )
        .cast("long")
        .alias("sel_rank"),
    )
    return ranked.join(F.broadcast(alloc), "source").filter(
        F.col("sel_rank") <= F.col("alloc")
    ).select("source", "doc_id", "sel_rank", "alloc")
