"""Retrieval + reranking family (split from the former plans/ranking.py,
VERDICT r07 task 8): sparse/impact MIPS, boolean retrieval, MMR rerank,
RBO rank overlap."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clinical_api_etl_spark.functions.text import tokens
from clinical_api_etl_spark.plans.base import QuerySet
from clinical_api_etl_spark.sources.catalog import load

from ._shared import _N_QUERY_DOCS, _TOKS, _TOP_K, _tf

QS = QuerySet()


# ---------------------------------------------------------------------------
# Sparse dot-product retrieval (exact MIPS over the inverted index).
# ---------------------------------------------------------------------------


@QS.add(
    "text_sparse_topk",
    f"""
    WITH t AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
    tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
           FROM t GROUP BY doc_id, tok),
    q AS (SELECT doc_id AS q_id, tok, c AS qc FROM tf
          WHERE doc_id < {_N_QUERY_DOCS}),
    s AS (SELECT q.q_id, tf.doc_id,
                 CAST(SUM(tf.c * q.qc) AS BIGINT) AS score
          FROM tf JOIN q USING (tok)
          WHERE tf.doc_id <> q.q_id
          GROUP BY q.q_id, tf.doc_id),
    r AS (SELECT q_id, doc_id, score,
                 CAST(ROW_NUMBER() OVER (
                   PARTITION BY q_id ORDER BY score DESC, doc_id) AS BIGINT)
                   AS rnk
          FROM s)
    SELECT q_id, doc_id, rnk, score FROM r WHERE rnk <= {_TOP_K}
    """,
    doc="[EXT] exact sparse maximum-inner-product retrieval: top-5 corpus "
    "documents per query document by integer term-frequency dot product, "
    "computed document-at-a-time over the inverted index — candidates "
    "come from a posting-list equi-join on token, NEVER an all-pairs "
    "loop, so cost is sum of df^2 over shared terms, not |Q|x|D|. The "
    "query side is a fixed small set and broadcasts; the corpus side "
    "streams through one explode + two hash aggregates. Ties break on "
    "doc_id so the ranking is a total order. At 100 TB: partition "
    "postings by token, cap df with champion lists / impact ordering "
    "(see text_impact_topk) — the join shape is unchanged. All-BIGINT "
    "scores hash-match DuckDB exactly.",
    headline=True,
    tags=("text", "retrieval"),
)
def text_sparse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # persist: the query side and the corpus side are two plan branches of
    # the same explode+aggregate; tf is vocabulary x docs sized (tiny).
    tf = _tf(spark, sf_dir).coalesce(8).persist()
    q = (
        tf.filter(F.col("doc_id") < _N_QUERY_DOCS)
        .select(
            F.col("doc_id").alias("q_id"),
            F.col("tok"),
            F.col("c").alias("qc"),
        )
    )
    s = (
        tf.join(F.broadcast(q), "tok")
        .filter(F.col("doc_id") != F.col("q_id"))
        .groupBy("q_id", "doc_id")
        .agg(F.sum(F.col("c") * F.col("qc")).cast("long").alias("score"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        s.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= _TOP_K)
        .select("q_id", "doc_id", "rnk", "score")
    )


# ---------------------------------------------------------------------------
# Quantized-impact retrieval (power-of-two idf, zero logarithms).
# ---------------------------------------------------------------------------


@QS.add(
    "text_impact_topk",
    f"""
    WITH t AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
    tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
           FROM t GROUP BY doc_id, tok),
    n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs FROM tf),
    idf AS (SELECT tok,
                   CAST(1 AS BIGINT) << (length(bin(n.n_docs // CAST(COUNT(*) AS BIGINT))) - 1)
                     AS impact
            FROM tf CROSS JOIN n GROUP BY tok, n.n_docs),
    q AS (SELECT doc_id AS q_id, tok FROM tf
          WHERE doc_id < {_N_QUERY_DOCS}),
    s AS (SELECT q.q_id, tf.doc_id,
                 CAST(SUM(tf.c * idf.impact) AS BIGINT) AS score
          FROM tf JOIN q USING (tok) JOIN idf ON tf.tok = idf.tok
          WHERE tf.doc_id <> q.q_id
          GROUP BY q.q_id, tf.doc_id),
    r AS (SELECT q_id, doc_id, score,
                 CAST(ROW_NUMBER() OVER (
                   PARTITION BY q_id ORDER BY score DESC, doc_id) AS BIGINT)
                   AS rnk
          FROM s)
    SELECT q_id, doc_id, rnk, score FROM r WHERE rnk <= {_TOP_K}
    """,
    doc="[EXT] impact-ordered retrieval: the idf weight per term is the "
    "largest power of two <= N/df — exactly the quantized-impact trick "
    "impact-ordered indexes (Anserini/JASS) use so scores become small "
    "integers that sort/accumulate cheaply. The exponent is "
    "floor(log2(N//df)) computed as binary-digit-count minus one "
    "(Spark conv(,10,2), DuckDB bin()) — NO floating log anywhere: "
    "JVM Math.log and libm disagree at 1 ulp (ln(3) already differs, "
    "measured), so a float idf could never hash-gate. Query terms act "
    "as a set; score = sum of tf_d x impact over shared terms. Same "
    "posting-join shape as text_sparse_topk; the idf table is "
    "vocabulary-sized and broadcasts. All-BIGINT, full hash.",
    tags=("text", "retrieval"),
)
def text_impact_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    tf = _tf(spark, sf_dir).coalesce(8).persist()
    n = tf.agg(F.count_distinct("doc_id").cast("long").alias("n_docs"))
    df_t = tf.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("df"))
    idf = (
        df_t.crossJoin(F.broadcast(n))
        .withColumn("m", F.expr("n_docs div df"))
        .withColumn(
            "e", F.length(F.conv(F.col("m").cast("string"), 10, 2)) - F.lit(1)
        )
        .select(
            "tok",
            F.expr("CAST(shiftleft(CAST(1 AS BIGINT), CAST(e AS INT)) AS BIGINT)")
            .alias("impact"),
        )
    )
    q = tf.filter(F.col("doc_id") < _N_QUERY_DOCS).select(
        F.col("doc_id").alias("q_id"), "tok"
    )
    s = (
        # q is the bounded probe set; idf is vocabulary-scale — unhinted
        tf.join(F.broadcast(q), "tok")
        .join(idf, "tok")
        .filter(F.col("doc_id") != F.col("q_id"))
        .groupBy("q_id", "doc_id")
        .agg(F.sum(F.col("c") * F.col("impact")).cast("long").alias("score"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        s.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= _TOP_K)
        .select("q_id", "doc_id", "rnk", "score")
    )


@QS.add(
    "retrieval_bm25_topk",
    f"""
    WITH t AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
    tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
           FROM t GROUP BY doc_id, tok),
    dl AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS dl
           FROM tf GROUP BY doc_id),
    scal AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
                    CAST(SUM(c) AS BIGINT) AS dlsum FROM tf),
    idf AS (SELECT tok,
                   CAST(1 AS BIGINT)
                     << (length(bin(scal.n_docs // CAST(COUNT(*) AS BIGINT))) - 1)
                     AS impact
            FROM tf CROSS JOIN scal GROUP BY tok, scal.n_docs),
    q AS (SELECT doc_id AS q_id, tok FROM tf
          WHERE doc_id < {_N_QUERY_DOCS}),
    terms AS (
      SELECT q.q_id, tf.doc_id, tf.tok,
             CAST(idf.impact AS DOUBLE)
               * (CAST(44 * tf.c * scal.dlsum AS DOUBLE)
                  / CAST(20 * tf.c * scal.dlsum + 6 * scal.dlsum
                         + 18 * dl.dl * scal.n_docs AS DOUBLE)) AS term
      FROM tf JOIN q USING (tok)
              JOIN idf ON tf.tok = idf.tok
              JOIN dl ON tf.doc_id = dl.doc_id
              CROSS JOIN scal
      WHERE tf.doc_id <> q.q_id),
    s AS (SELECT q_id, doc_id,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list(term ORDER BY tok)), (x, y) -> x + y) AS score
          FROM terms GROUP BY q_id, doc_id),
    r AS (SELECT q_id, doc_id, score,
                 CAST(ROW_NUMBER() OVER (
                   PARTITION BY q_id ORDER BY score DESC, doc_id) AS BIGINT)
                   AS rnk
          FROM s)
    SELECT q_id, doc_id, rnk, score FROM r WHERE rnk <= {_TOP_K}
    """,
    doc="[EXT] BM25 ranking (Robertson/Sparck-Jones), fully hash-gated. "
    "k1=1.2 and b=0.75 are the RATIONALS 6/5 and 3/4, so the whole "
    "per-term saturation collapses to ONE division of exact BIGINTs: "
    "tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl)) == 44*tf*dlsum / "
    "(20*tf*dlsum + 6*dlsum + 18*dl*n_docs) with avgdl = dlsum/n_docs "
    "multiplied through — no float literal parses, no intermediate "
    "rounding. The idf factor is the power-of-two quantized impact "
    "(binary-digit-count of N div df — the round-8 no-Math.log rule), "
    "and multiplying a correctly-rounded quotient by a power of two is "
    "EXACT, so each term is bit-identical across engines; the per-doc "
    "score is a tok-pinned-order float fold. Query terms are set "
    "semantics (standard BM25). Posting-list equi-join shape as "
    "text_sparse_topk: query side broadcasts, idf/doclen sides are "
    "corpus-scale and deliberately unhinted. Integer components stay "
    "under 2^63 while 44*tf*dlsum does (~10^14 tokens) — far past any "
    "single-index shard. Ties rank by doc_id (total order).",
    headline=True,
    tags=("text", "retrieval"),
)
def retrieval_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    tf = _tf(spark, sf_dir).coalesce(8).persist()
    q = tf.filter(F.col("doc_id") < _N_QUERY_DOCS).select(
        F.col("doc_id").alias("q_id"), "tok"
    )
    return bm25_topk_from_tf(tf, q, k=_TOP_K)


def bm25_topk_from_tf(tf: DataFrame, q: DataFrame, *, k: int) -> DataFrame:
    """BM25 top-k over a (doc_id, tok, c) term-frequency table for a
    (q_id, tok) query-token table — shared verbatim by the batch query
    above and the streaming inverted-index MV (`streaming/invindex.py`),
    so stream search == batch search is true by construction once the
    tf tables match."""
    dl = tf.groupBy("doc_id").agg(F.sum("c").cast("long").alias("dl"))
    scal = tf.agg(
        F.count_distinct("doc_id").cast("long").alias("n_docs"),
        F.sum("c").cast("long").alias("dlsum"),
    )
    df_t = tf.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("df"))
    idf = (
        df_t.crossJoin(F.broadcast(scal))
        .withColumn("m", F.expr("n_docs div df"))
        .withColumn(
            "e", F.length(F.conv(F.col("m").cast("string"), 10, 2)) - F.lit(1)
        )
        .select(
            "tok",
            F.expr("CAST(shiftleft(CAST(1 AS BIGINT), CAST(e AS INT)) AS BIGINT)")
            .alias("impact"),
        )
    )
    terms = (
        # q is the bounded probe set; idf/dl are corpus-scale — unhinted
        tf.join(F.broadcast(q), "tok")
        .filter(F.col("doc_id") != F.col("q_id"))
        .join(idf, "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(scal))
        .select(
            "q_id",
            "doc_id",
            "tok",
            F.expr(
                "CAST(impact AS DOUBLE)"
                " * (CAST(44 * c * dlsum AS DOUBLE)"
                "    / CAST(20 * c * dlsum + 6 * dlsum"
                "           + 18 * dl * n_docs AS DOUBLE))"
            ).alias("term"),
        )
    )
    s = terms.groupBy("q_id", "doc_id").agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("tok", "term"))),
            F.lit(0.0),
            lambda acc, x: acc + x["term"],
        ).alias("score")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        s.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("q_id", "doc_id", "rnk", "score")
    )


# ---------------------------------------------------------------------------
# MMR diversified reranking (greedy, exact, unrolled).
# ---------------------------------------------------------------------------

_MMR_QUERIES = 3     # queries (doc_id < 3) — bounds the unrolled oracle
_MMR_POOL = 10       # candidate pool per query (top-N by relevance)
_MMR_K = 5           # selections per query


def _mmr_oracle() -> str:
    """Unrolled greedy MMR: one (remaining, max-sim, argmax) CTE triple
    per step, every step MATERIALIZED (k-core rule)."""
    ctes = [
        f"t AS MATERIALIZED (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents)",
        "tf AS MATERIALIZED (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c"
        " FROM t GROUP BY doc_id, tok)",
        f"""q AS MATERIALIZED (SELECT doc_id AS q_id, tok, c AS qc FROM tf
          WHERE doc_id < {_MMR_QUERIES})""",
        f"""cand AS MATERIALIZED (
          SELECT q_id, doc_id, rel FROM (
            SELECT q.q_id, tf.doc_id,
                   CAST(SUM(tf.c * q.qc) AS BIGINT) AS rel,
                   ROW_NUMBER() OVER (
                     PARTITION BY q.q_id
                     ORDER BY SUM(tf.c * q.qc) DESC, tf.doc_id) AS rk
            FROM tf JOIN q USING (tok)
            WHERE tf.doc_id <> q.q_id
            GROUP BY q.q_id, tf.doc_id)
          WHERE rk <= {_MMR_POOL})""",
        """cd AS MATERIALIZED (
          SELECT c.q_id, tf.doc_id, tf.tok, tf.c
          FROM cand c JOIN tf ON c.doc_id = tf.doc_id)""",
        """sims AS MATERIALIZED (
          SELECT a.q_id, a.doc_id AS d1, b.doc_id AS d2,
                 CAST(SUM(a.c * b.c) AS BIGINT) AS sim
          FROM cd a JOIN cd b
            ON a.q_id = b.q_id AND a.tok = b.tok AND a.doc_id <> b.doc_id
          GROUP BY a.q_id, a.doc_id, b.doc_id)""",
        """p1 AS MATERIALIZED (
          SELECT q_id, 1 AS step, doc_id, rel, rel AS score FROM (
            SELECT q_id, doc_id, rel,
                   ROW_NUMBER() OVER (PARTITION BY q_id
                                      ORDER BY rel DESC, doc_id) AS rk
            FROM cand) WHERE rk = 1)""",
        "s1 AS MATERIALIZED (SELECT * FROM p1)",
    ]
    for i in range(2, _MMR_K + 1):
        prev = f"s{i - 1}"
        ctes.append(
            f"""ms{i} AS MATERIALIZED (
              SELECT r.q_id, r.doc_id, r.rel,
                     MAX(COALESCE(s.sim, 0)) AS msim
              FROM cand r
              JOIN {prev} p ON r.q_id = p.q_id
              LEFT JOIN sims s ON s.q_id = r.q_id AND s.d1 = r.doc_id
                               AND s.d2 = p.doc_id
              WHERE NOT EXISTS (SELECT 1 FROM {prev} x
                                WHERE x.q_id = r.q_id
                                  AND x.doc_id = r.doc_id)
              GROUP BY r.q_id, r.doc_id, r.rel)"""
        )
        ctes.append(
            f"""p{i} AS MATERIALIZED (
              SELECT q_id, {i} AS step, doc_id, rel,
                     CAST(rel - msim AS BIGINT) AS score FROM (
                SELECT q_id, doc_id, rel, msim,
                       ROW_NUMBER() OVER (
                         PARTITION BY q_id
                         ORDER BY rel - msim DESC, doc_id) AS rk
                FROM ms{i}) WHERE rk = 1)"""
        )
        ctes.append(
            f"s{i} AS MATERIALIZED"
            f" (SELECT * FROM {prev} UNION ALL SELECT * FROM p{i})"
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT q_id, CAST(step AS BIGINT) AS step, doc_id, rel, score"
        f" FROM s{_MMR_K}"
    )


@QS.add(
    "retrieval_mmr_rerank",
    _mmr_oracle(),
    doc="[EXT] maximal-marginal-relevance reranking: from each query's "
    "top-10 relevance pool, greedily pick 5 documents maximizing "
    "2*MMR(lambda=1/2) = relevance - max similarity to anything already "
    "picked — the diversity rerank search/RAG stacks apply so five "
    "near-duplicates don't fill the context window. With integer "
    "dot-product relevance AND inter-candidate similarity, every greedy "
    "score is an exact BIGINT and ties pin on doc_id, so the whole "
    "5-step greedy trajectory hash-matches an unrolled MATERIALIZED "
    "oracle (SIXTH iterative algorithm under a full value hash). "
    "Pairwise similarities only ever span the 10-candidate pools "
    "(<= 45 pairs/query), computed once via a posting self-join.",
    tags=("text", "retrieval", "iterative"),
    headline=True,
)
def retrieval_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    tf = _tf(spark, sf_dir).coalesce(8).persist()
    q = tf.filter(F.col("doc_id") < _MMR_QUERIES).select(
        F.col("doc_id").alias("q_id"), "tok", F.col("c").alias("qc")
    )
    rel_all = (
        tf.join(F.broadcast(q), "tok")
        .filter(F.col("doc_id") != F.col("q_id"))
        .groupBy("q_id", "doc_id")
        .agg(F.sum(F.col("c") * F.col("qc")).cast("long").alias("rel"))
    )
    wq = Window.partitionBy("q_id").orderBy(F.desc("rel"), F.asc("doc_id"))
    # localCheckpoint (EAGER), not lazy persist: every greedy round joins
    # cand/sims against the growing `selected` union and Spark rebuilds
    # BROADCAST inputs from unmaterialized lineage — by round 5 the plan
    # tree is deep enough to OOM a 1 GB vanilla driver (k-core finding:
    # lazy persists do not protect broadcast subtrees).
    cand = (
        rel_all.withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") <= _MMR_POOL)
        .drop("rk")
        .coalesce(1)
        .localCheckpoint(eager=True)
    )
    cd = cand.select("q_id", "doc_id").join(tf, "doc_id")
    a = cd.select(
        "q_id", F.col("doc_id").alias("d1"), "tok", F.col("c").alias("c1")
    )
    b = cd.select(
        "q_id", F.col("doc_id").alias("d2"), "tok", F.col("c").alias("c2")
    )
    sims = (
        a.join(b, ["q_id", "tok"])
        .filter(F.col("d1") != F.col("d2"))
        .groupBy("q_id", "d1", "d2")
        .agg(F.sum(F.col("c1") * F.col("c2")).cast("long").alias("sim"))
        .coalesce(1)
        .localCheckpoint(eager=True)
    )
    picked = (
        cand.withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") == 1)
        .select(
            "q_id",
            F.lit(1).alias("step"),
            "doc_id",
            "rel",
            F.col("rel").alias("score"),
        )
    )
    selected = picked
    for i in range(2, _MMR_K + 1):
        rem = cand.join(
            selected.select("q_id", "doc_id"), ["q_id", "doc_id"], "left_anti"
        )
        pairs = rem.join(
            selected.select("q_id", F.col("doc_id").alias("sel_doc")), "q_id"
        ).join(
            sims.select(
                "q_id",
                F.col("d1").alias("doc_id"),
                F.col("d2").alias("sel_doc"),
                "sim",
            ),
            ["q_id", "doc_id", "sel_doc"],
            "left",
        )
        ms = pairs.groupBy("q_id", "doc_id", "rel").agg(
            F.max(F.coalesce("sim", F.lit(0))).cast("long").alias("msim")
        )
        ws = Window.partitionBy("q_id").orderBy(
            F.desc(F.col("rel") - F.col("msim")), F.asc("doc_id")
        )
        pick = (
            ms.withColumn("rk", F.row_number().over(ws))
            .filter(F.col("rk") == 1)
            .select(
                "q_id",
                F.lit(i).alias("step"),
                "doc_id",
                "rel",
                (F.col("rel") - F.col("msim")).cast("long").alias("score"),
            )
        )
        selected = selected.unionByName(pick).coalesce(1).localCheckpoint(
            eager=True
        )
    return selected.select(
        "q_id", F.col("step").cast("long").alias("step"), "doc_id", "rel", "score"
    )


# ---------------------------------------------------------------------------
# Round-5: boolean conjunctive retrieval (posting-list intersection).
# ---------------------------------------------------------------------------

_BOOL_TERMS = 3


@QS.add(
    "text_boolean_and_retrieval",
    f"""
    WITH t AS (SELECT DISTINCT doc_id, unnest({_TOKS}) AS tok FROM documents),
    df AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM t GROUP BY tok),
    qt AS (
      SELECT doc_id AS q_id, tok FROM (
        SELECT t.doc_id, t.tok,
               row_number() OVER (PARTITION BY t.doc_id
                                  ORDER BY df.df ASC, t.tok ASC) AS rk
        FROM t JOIN df USING (tok)
        WHERE t.doc_id < {_N_QUERY_DOCS}
      ) WHERE rk <= {_BOOL_TERMS}
    ),
    nq AS (SELECT q_id, CAST(COUNT(*) AS BIGINT) AS n_q FROM qt GROUP BY q_id),
    hits AS (
      SELECT qt.q_id, t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hit
      FROM t JOIN qt USING (tok)
      WHERE t.doc_id <> qt.q_id
      GROUP BY qt.q_id, t.doc_id
    )
    SELECT h.q_id, h.doc_id, h.n_hit
    FROM hits h JOIN nq ON h.q_id = nq.q_id
    WHERE h.n_hit = nq.n_q
    """,
    doc="[EXT] boolean AND retrieval: each query doc's "
    f"{_BOOL_TERMS} RAREST terms (by document frequency, ties on token — "
    "the classic smallest-posting-first heuristic) form a conjunctive "
    "query; matches = documents whose distinct-token postings contain "
    "ALL of them, found by ONE posting-list equi-join + a count==arity "
    "filter — never a per-term loop or intersection of materialized "
    "lists. Cost is bounded by the rarest terms' posting sizes, exactly "
    "why engines order conjunctions by df. All-BIGINT: hash-gated.",
    tags=("text", "retrieval"),
)
def text_boolean_and_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.functions.text import tokens as tok_fn

    docs = load(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", F.explode(F.array_distinct(tok_fn(F.col("text")))).alias("tok")
    )
    df_ = t.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("df"))
    w = Window.partitionBy("doc_id").orderBy(F.asc("df"), F.asc("tok"))
    qt = (
        t.filter(F.col("doc_id") < _N_QUERY_DOCS)
        .join(df_, "tok")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _BOOL_TERMS)
        .select(F.col("doc_id").alias("q_id"), "tok")
    )
    nq = qt.groupBy("q_id").agg(F.count(F.lit(1)).cast("long").alias("n_q"))
    hits = (
        t.join(F.broadcast(qt), "tok")
        .filter(F.col("doc_id") != F.col("q_id"))
        .groupBy("q_id", "doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hit"))
    )
    return (
        hits.join(F.broadcast(nq), "q_id")
        .filter(F.col("n_hit") == F.col("n_q"))
        .select("q_id", "doc_id", "n_hit")
    )


_RBO_K = 20
_RBO_P = "0.9e0"  # e0 suffix = correctly-rounded DOUBLE parse both engines


@QS.add(
    "retrieval_rbo_rankings",
    f"""
    WITH m AS (
      SELECT l_partkey,
             CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)
                      * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100
                                    AS BIGINT))) AS BIGINT) AS rev_u,
             CAST(COUNT(*) AS BIGINT) AS n_li
      FROM lineitem GROUP BY l_partkey
    ),
    ra AS (SELECT l_partkey, ROW_NUMBER() OVER
             (ORDER BY rev_u DESC, l_partkey) AS r FROM m
           ORDER BY rev_u DESC, l_partkey LIMIT {_RBO_K}),
    rb AS (SELECT l_partkey, ROW_NUMBER() OVER
             (ORDER BY n_li DESC, l_partkey) AS r FROM m
           ORDER BY n_li DESC, l_partkey LIMIT {_RBO_K}),
    common AS (
      SELECT GREATEST(ra.r, rb.r) AS mx
      FROM ra JOIN rb USING (l_partkey)
    ),
    depths AS (
      SELECT d, CAST((SELECT COUNT(*) FROM common WHERE mx <= d) AS BIGINT)
               AS cnt,
             CAST((SELECT COUNT(*) FROM common WHERE mx <= d) AS DOUBLE)
               / CAST(d AS DOUBLE) AS a
      FROM (SELECT unnest(range(1, {_RBO_K + 1})) AS d)
    ),
    folded AS (
      SELECT list_reduce(
               list_prepend([CAST(1 AS DOUBLE), CAST(0 AS DOUBLE)],
                 list([a] ORDER BY d)),
               (acc, x) -> [acc[1] * {_RBO_P}, acc[2] + acc[1] * x[1]]
             ) AS st,
             CAST(MAX(CASE WHEN d = {_RBO_K} THEN cnt END) AS BIGINT)
               AS n_common
      FROM depths
    )
    SELECT n_common,
           (CAST(1 AS DOUBLE) - {_RBO_P}) * st[2] AS rbo_min
    FROM folded
    """,
    doc="[EXT] rank-biased overlap (Webber et al. 2010) between two "
    f"deterministic product rankings (top-{_RBO_K} by exact revenue "
    "units vs by lineitem count): RBO@k = (1-p)·Σ p^(d-1)·A_d with "
    "p=0.9, the top-weighted rank-agreement metric a retrieval A/B "
    "compares rankers with (truncated rbo_min form — the residual mass "
    "of unseen tails is excluded, documented convention). Prefix "
    "agreement A_d = |X_d|/d comes from ONE join of the two top-k "
    "tables (an item is in both depth-d prefixes iff max(rank_a, "
    "rank_b) <= d) — never a per-depth re-ranking; the (p-power, sum) "
    "pair rides a 2-slot LIST-accumulator pinned fold (the round-10 "
    "template: both engines evaluate lambda elements against the "
    "ORIGINAL accumulator), every term one multiply of bit-identical "
    "doubles over single-division prefix ratios — fully hash-gated. "
    "Both source rankings are exact-integer metrics (cent-hundredth "
    "revenue units, counts) with partkey tie-breaks, so the input "
    "rankings are themselves deterministic.",
    headline=True,
    tags=("retrieval", "stats"),
)
def retrieval_rbo_rankings(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    m = li.groupBy("l_partkey").agg(
        F.sum(
            (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
            * (
                F.lit(100)
                - (F.col("l_discount").cast("decimal(18,2)") * 100).cast("long")
            )
        )
        .cast("long")
        .alias("rev_u"),
        F.count(F.lit(1)).cast("long").alias("n_li"),
    ).persist()
    ra = (
        m.orderBy(F.desc("rev_u"), F.asc("l_partkey"))
        .limit(_RBO_K)
        .select(
            "l_partkey",
            F.row_number()
            .over(Window.orderBy(F.desc("rev_u"), F.asc("l_partkey")))
            .alias("r_a"),
        )
    )
    rb = (
        m.orderBy(F.desc("n_li"), F.asc("l_partkey"))
        .limit(_RBO_K)
        .select(
            "l_partkey",
            F.row_number()
            .over(Window.orderBy(F.desc("n_li"), F.asc("l_partkey")))
            .alias("r_b"),
        )
    )
    common = ra.join(rb, "l_partkey").select(
        F.greatest("r_a", "r_b").alias("mx")
    )
    grid = spark.range(1, _RBO_K + 1).select(F.col("id").alias("d"))
    depths = (
        grid.join(F.broadcast(common), F.col("mx") <= F.col("d"), "left")
        .groupBy("d")
        .agg(F.count(F.col("mx")).cast("long").alias("cnt"))
        .select(
            "d",
            "cnt",
            (F.col("cnt").cast("double") / F.col("d").cast("double")).alias("a"),
        )
    )
    folded = depths.agg(
        F.aggregate(
            F.transform(
                F.sort_array(F.collect_list(F.struct("d", "a"))),
                lambda s: s["a"],
            ),
            F.array(F.lit(1.0), F.lit(0.0)),
            lambda acc, x: F.array(
                F.element_at(acc, 1) * F.lit(0.9),
                F.element_at(acc, 2) + F.element_at(acc, 1) * x,
            ),
        ).alias("st"),
        F.max(F.when(F.col("d") == _RBO_K, F.col("cnt")))
        .cast("long")
        .alias("n_common"),
    )
    return folded.select(
        "n_common",
        ((F.lit(1.0) - F.lit(0.9)) * F.element_at("st", 2)).alias("rbo_min"),
    )


# ---------------------------------------------------------------------------
# Dirichlet-smoothed query-likelihood ranking (the LM-retrieval classic).
# ---------------------------------------------------------------------------

_QL_MU = 300  # Dirichlet pseudo-count, integer so every term stays rational
_QL_MAX_QTOKS = 32  # scored-query-token cap (DSIR rule): 32 terms of ~1e-4
#                     bottom out near 1e-128 — far inside double range, so
#                     the product fold can NEVER underflow to 0.0 and
#                     degenerate the ranking to doc_id order (ADVICE r09)


@QS.add(
    "retrieval_query_likelihood",
    f"""
    WITH t AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
    tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
           FROM t GROUP BY doc_id, tok),
    dl AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS dl
           FROM tf GROUP BY doc_id),
    coll AS (SELECT tok, CAST(SUM(c) AS BIGINT) AS cf FROM tf GROUP BY tok),
    scal AS (SELECT CAST(SUM(c) AS BIGINT) AS ctot FROM tf),
    q AS (SELECT q_id, tok FROM (
            SELECT doc_id AS q_id, tok,
                   ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tok) AS qrk
            FROM tf WHERE doc_id < {_N_QUERY_DOCS})
          WHERE qrk <= {_QL_MAX_QTOKS}),
    pairs AS (
      SELECT q.q_id, d.doc_id, q.tok
      FROM q CROSS JOIN dl d
      WHERE d.doc_id <> q.q_id
    ),
    terms AS (
      SELECT p.q_id, p.doc_id, p.tok,
             CAST(COALESCE(tf.c, 0) * s.ctot + {_QL_MU} * co.cf AS DOUBLE)
               / CAST((d.dl + {_QL_MU}) * s.ctot AS DOUBLE) AS term
      FROM pairs p
      JOIN coll co ON co.tok = p.tok
      JOIN dl d ON d.doc_id = p.doc_id
      LEFT JOIN tf ON tf.doc_id = p.doc_id AND tf.tok = p.tok
      CROSS JOIN scal s
    ),
    s AS (SELECT q_id, doc_id,
                 list_reduce(list_prepend(CAST(1 AS DOUBLE),
                   list(term ORDER BY tok)), (x, y) -> x * y) AS score
          FROM terms GROUP BY q_id, doc_id),
    r AS (SELECT q_id, doc_id, score,
                 CAST(ROW_NUMBER() OVER (
                   PARTITION BY q_id ORDER BY score DESC, doc_id) AS BIGINT)
                   AS rnk
          FROM s)
    SELECT q_id, doc_id, rnk, score FROM r WHERE rnk <= {_TOP_K}
    """,
    doc="[EXT] Dirichlet-smoothed query-likelihood ranking (Ponte-Croft "
    "LM retrieval, Zhai-Lafferty smoothing) — the probabilistic classic "
    f"next to BM25: score(q,d) = prod_t p(t|d) with p = (tf + mu*cf/C)"
    f"/(dl + mu), mu={_QL_MU}. Every factor is ONE division of exact "
    "BIGINTs — multiplied through by the collection length C, the "
    "numerator tf*C + mu*cf and denominator (dl+mu)*C are exact — and "
    "the per-doc likelihood is a tok-pinned-order float PRODUCT fold "
    "(log-free: products pin exactly like sums; the scored query-token "
    f"set is capped at the {_QL_MAX_QTOKS} lexicographically-smallest "
    "distinct tokens per query — the DSIR rule, enforced on BOTH engine "
    "sides — so the product is bounded away from double underflow by "
    "construction). Because unseen terms still contribute mass, the "
    "candidate set is the full (bounded probe) x doclen grid — query "
    "side and smoothing tables are the join keys, never all-pairs over "
    "queries. Ties rank by doc_id.",
    tags=("text", "retrieval"),
)
def retrieval_query_likelihood(spark: SparkSession, sf_dir: str) -> DataFrame:
    tf = _tf(spark, sf_dir).coalesce(8).persist()
    dl = tf.groupBy("doc_id").agg(F.sum("c").cast("long").alias("dl"))
    coll = tf.groupBy("tok").agg(F.sum("c").cast("long").alias("cf"))
    scal = tf.agg(F.sum("c").cast("long").alias("ctot"))
    wq = Window.partitionBy("doc_id").orderBy("tok")
    q = (
        tf.filter(F.col("doc_id") < _N_QUERY_DOCS)
        .withColumn("qrk", F.row_number().over(wq))
        .filter(F.col("qrk") <= _QL_MAX_QTOKS)
        .select(F.col("doc_id").alias("q_id"), "tok")
    )
    pairs = (
        F.broadcast(q)
        .crossJoin(dl)
        .filter(F.col("doc_id") != F.col("q_id"))
    )
    terms = (
        pairs.join(coll, "tok")
        .join(tf, ["doc_id", "tok"], "left")
        .crossJoin(F.broadcast(scal))
        .select(
            "q_id",
            "doc_id",
            "tok",
            F.expr(
                f"CAST(COALESCE(c, 0) * ctot + {_QL_MU} * cf AS DOUBLE)"
                f" / CAST((dl + {_QL_MU}) * ctot AS DOUBLE)"
            ).alias("term"),
        )
    )
    s = terms.groupBy("q_id", "doc_id").agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("tok", "term"))),
            F.lit(1.0),
            lambda acc, x: acc * x["term"],
        ).alias("score")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        s.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= _TOP_K)
        .select("q_id", "doc_id", "rnk", "score")
    )


# ---------------------------------------------------------------------------
# Pseudo-relevance feedback (Rocchio/RM-style two-pass expansion).
# ---------------------------------------------------------------------------

_PRF_FB_DOCS = 3   # feedback depth: top docs of the first pass
_PRF_FB_TERMS = 8  # expansion terms per query


@QS.add(
    "retrieval_prf_expansion",
    f"""
    WITH t AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
    tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
           FROM t GROUP BY doc_id, tok),
    q AS (SELECT doc_id AS q_id, tok, c AS qc FROM tf
          WHERE doc_id < {_N_QUERY_DOCS}),
    pass1 AS (
      SELECT q.q_id, tf.doc_id,
             CAST(SUM(tf.c * q.qc) AS BIGINT) AS score
      FROM tf JOIN q USING (tok)
      WHERE tf.doc_id <> q.q_id
      GROUP BY q.q_id, tf.doc_id
    ),
    fb AS (
      SELECT q_id, doc_id FROM (
        SELECT q_id, doc_id,
               ROW_NUMBER() OVER (PARTITION BY q_id
                                  ORDER BY score DESC, doc_id) AS rk
        FROM pass1) WHERE rk <= {_PRF_FB_DOCS}
    ),
    fbterms AS (
      SELECT q_id, tok, fw FROM (
        SELECT fb.q_id, tf.tok, CAST(SUM(tf.c) AS BIGINT) AS fw,
               ROW_NUMBER() OVER (PARTITION BY fb.q_id
                                  ORDER BY SUM(tf.c) DESC, tf.tok) AS rk
        FROM fb JOIN tf ON tf.doc_id = fb.doc_id
        GROUP BY fb.q_id, tf.tok) WHERE rk <= {_PRF_FB_TERMS}
    ),
    expanded AS (
      SELECT COALESCE(q.q_id, f.q_id) AS q_id,
             COALESCE(q.tok, f.tok) AS tok,
             CAST(2 * COALESCE(q.qc, 0) + COALESCE(f.fw, 0) AS BIGINT) AS w
      FROM q FULL OUTER JOIN fbterms f
        ON q.q_id = f.q_id AND q.tok = f.tok
    ),
    pass2 AS (
      SELECT e.q_id, tf.doc_id,
             CAST(SUM(tf.c * e.w) AS BIGINT) AS score
      FROM tf JOIN expanded e ON tf.tok = e.tok
      WHERE tf.doc_id <> e.q_id
      GROUP BY e.q_id, tf.doc_id
    ),
    r AS (SELECT q_id, doc_id, score,
                 CAST(ROW_NUMBER() OVER (
                   PARTITION BY q_id ORDER BY score DESC, doc_id) AS BIGINT)
                   AS rnk
          FROM pass2)
    SELECT q_id, doc_id, rnk, score FROM r WHERE rnk <= {_TOP_K}
    """,
    doc="[EXT] pseudo-relevance feedback retrieval (Rocchio/RM-style, "
    "fully integer): pass 1 ranks by the exact tf dot product; the top-"
    f"{_PRF_FB_DOCS} docs per query donate their top-{_PRF_FB_TERMS} "
    "terms by summed tf; the expanded query weights 2*qc + fw (the 2:1 "
    "original:feedback Rocchio mix as exact integers — no float alpha) "
    "rescore the corpus in pass 2. Every score is an exact BIGINT dot "
    "product, every selection a deterministic (value DESC, key ASC) "
    "ROW_NUMBER — the whole two-pass pipeline hash-gates as one query. "
    "Both passes are posting-list equi-joins (the expansion multiplies "
    "query terms by <= 1 + {_PRF_FB_TERMS}/|q|, never the corpus side); "
    "feedback depth and term count are literals, so the expanded query "
    "side stays a bounded broadcast.",
    tags=("text", "retrieval"),
)
def retrieval_prf_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    tf = _tf(spark, sf_dir).coalesce(8).persist()
    q = tf.filter(F.col("doc_id") < _N_QUERY_DOCS).select(
        F.col("doc_id").alias("q_id"), "tok", F.col("c").alias("qc")
    )
    pass1 = (
        tf.join(F.broadcast(q), "tok")
        .filter(F.col("doc_id") != F.col("q_id"))
        .groupBy("q_id", "doc_id")
        .agg(F.sum(F.col("c") * F.col("qc")).cast("long").alias("score"))
    )
    w1 = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("doc_id"))
    fb = (
        pass1.withColumn("rk", F.row_number().over(w1))
        .filter(F.col("rk") <= _PRF_FB_DOCS)
        .select("q_id", "doc_id")
    )
    w2 = Window.partitionBy("q_id").orderBy(F.desc("fw"), F.asc("tok"))
    fbterms = (
        fb.join(tf, "doc_id")
        .groupBy("q_id", "tok")
        .agg(F.sum("c").cast("long").alias("fw"))
        .withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= _PRF_FB_TERMS)
        .select("q_id", "tok", "fw")
    )
    expanded = (
        q.join(fbterms, ["q_id", "tok"], "full_outer")
        .select(
            "q_id",
            "tok",
            (
                2 * F.coalesce(F.col("qc"), F.lit(0))
                + F.coalesce(F.col("fw"), F.lit(0))
            )
            .cast("long")
            .alias("w"),
        )
    )
    pass2 = (
        tf.join(F.broadcast(expanded), "tok")
        .filter(F.col("doc_id") != F.col("q_id"))
        .groupBy("q_id", "doc_id")
        .agg(F.sum(F.col("c") * F.col("w")).cast("long").alias("score"))
    )
    wr = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        pass2.withColumn("rnk", F.row_number().over(wr).cast("long"))
        .filter(F.col("rnk") <= _TOP_K)
        .select("q_id", "doc_id", "rnk", "score")
    )
