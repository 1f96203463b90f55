"""Round-11+ modeling family, ML-eval slice: RRF fusion, kNN eval, decision stumps + CV + learning curve + McNemar, contrastive pairs, rank AUC, kNN calibration + Brier, conformal intervals, lift/gains, ROC/PR/KS curves.

Part of the ``plans.modeling`` package — the former 3,160-line
plans/modeling.py split along its families (VERDICT r09 task 8):
tsmisc (sequential-recurrence time series, bootstrap, DQ/CDC/sampling),
graphs (HITS, centralities, Brandes, Bellman-Ford, temporal reach),
mlevals (kNN/stump learners, calibration, ROC/PR/lift/learning-curve,
McNemar). Mechanical split, zero behavior change; the package __init__
merges the QuerySets and re-exports every top-level name.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clinical_api_etl_spark.plans.base import QuerySet
from clinical_api_etl_spark.sources.catalog import load

QS = QuerySet()

# ---------------------------------------------------------------------------
# Reciprocal-rank fusion of two retrieval rankers (cosine + dot/MIPS).
# ---------------------------------------------------------------------------

_FOLD_DOT = (
    "list_reduce(list_transform(range(1, len({a})+1), i -> {a}[i]*{b}[i]),"
    " (x,y) -> x+y)"
)
_FOLD_NORM = "sqrt(list_reduce(list_transform({a}, x -> x*x), (x,y) -> x+y))"


@QS.add(
    "retrieval_rrf_fusion",
    f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e,
             {_FOLD_NORM.format(a='list_transform(embedding, x -> x::DOUBLE)')} AS nrm
      FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, e AS qe, nrm AS qn FROM v WHERE vec_id < 10),
    pairs AS (
      SELECT query_id, b.vec_id AS neighbor_id,
             {_FOLD_DOT.format(a='qe', b='b.e')} AS dp, qn, b.nrm AS cn
      FROM q CROSS JOIN v b WHERE b.vec_id <> query_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY dp / (qn * cn) DESC, neighbor_id) AS r_cos,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY dp DESC, neighbor_id) AS r_dot
      FROM pairs
    ),
    fused AS (
      SELECT query_id, neighbor_id,
             (CASE WHEN r_cos <= 20 THEN 1e0 / (60e0 + r_cos) ELSE 0e0 END)
             + (CASE WHEN r_dot <= 20 THEN 1e0 / (60e0 + r_dot) ELSE 0e0 END)
               AS rrf_score
      FROM ranked WHERE r_cos <= 20 OR r_dot <= 20
    )
    SELECT query_id, neighbor_id, rrf_score, CAST(fused_rank AS BIGINT) AS fused_rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY rrf_score DESC, neighbor_id)
                    AS fused_rank
          FROM fused)
    WHERE fused_rank <= 10
    """,
    doc="[EXT] reciprocal-rank fusion (k=60) of two retrieval rankers over "
    "the same pair scan: exact cosine and exact dot-product (MIPS) "
    "rankings, top-20 each, fused score = sum of 1/(60+rank) "
    "contributions in a FIXED order (cosine term first) — each term is "
    "one correctly-rounded division, so the two-term sum is a fixed "
    "IEEE tree and the query carries a full value hash. ONE query-"
    "broadcast pair scan feeds both rankers (the dot product is shared; "
    "cosine divides by hoisted per-row norms), then three windows over "
    "the same query_id partitioning — no second scan, no extra "
    "shuffle. Standard RRF per Cormack et al.; rank ties broken by "
    "neighbor id on both engines.",
    headline=True,
    tags=("similarity", "retrieval"),
)
def retrieval_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from clinical_api_etl_spark.functions.vectors import as_double, dot, norm

    emb = load(spark, sf_dir, "embeddings")
    v = emb.select(
        "vec_id",
        as_double(F.col("embedding")).alias("e"),
        norm(as_double(F.col("embedding"))).alias("nrm"),
    )
    q = v.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qe"),
        F.col("nrm").alias("qn"),
    )
    c = v.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("e").alias("ce"),
        F.col("nrm").alias("cn"),
    )
    c = c.repartition(c.sparkSession.sparkContext.defaultParallelism)
    # dp named once; the cos ranking references it through the projection
    # boundary (CollapseProject keeps non-cheap aliases referenced >1x).
    pairs = c.join(
        F.broadcast(q), F.col("query_id") != F.col("neighbor_id")
    ).select(
        "query_id",
        "neighbor_id",
        dot(F.col("qe"), F.col("ce")).alias("dp"),
        "qn",
        "cn",
    )
    w_cos = W.partitionBy("query_id").orderBy(
        (F.col("dp") / (F.col("qn") * F.col("cn"))).desc(), F.asc("neighbor_id")
    )
    w_dot = W.partitionBy("query_id").orderBy(F.desc("dp"), F.asc("neighbor_id"))
    ranked = pairs.select(
        "query_id",
        "neighbor_id",
        F.row_number().over(w_cos).alias("r_cos"),
        F.row_number().over(w_dot).alias("r_dot"),
    )
    fused = ranked.filter((F.col("r_cos") <= 20) | (F.col("r_dot") <= 20)).select(
        "query_id",
        "neighbor_id",
        (
            F.when(F.col("r_cos") <= 20, F.lit(1.0) / (F.lit(60.0) + F.col("r_cos")))
            .otherwise(F.lit(0.0))
            + F.when(F.col("r_dot") <= 20, F.lit(1.0) / (F.lit(60.0) + F.col("r_dot")))
            .otherwise(F.lit(0.0))
        ).alias("rrf_score"),
    )
    w_f = W.partitionBy("query_id").orderBy(F.desc("rrf_score"), F.asc("neighbor_id"))
    return (
        fused.withColumn("fused_rank", F.row_number().over(w_f).cast("long"))
        .filter(F.col("fused_rank") <= 10)
    )


# ---------------------------------------------------------------------------
# kNN holdout classification eval over the embedding table.
# ---------------------------------------------------------------------------


@QS.add(
    "ml_knn_eval",
    f"""
    WITH v AS (
      SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS e,
             {_FOLD_NORM.format(a='list_transform(embedding, x -> x::DOUBLE)')} AS nrm
      FROM embeddings
    ),
    test AS (SELECT * FROM v WHERE vec_id % 10 = 0),
    train AS (SELECT * FROM v WHERE vec_id % 10 <> 0),
    pairs AS (
      SELECT t.vec_id AS test_id, t.label AS true_label,
             r.vec_id AS neighbor_id, r.label AS nlabel,
             {_FOLD_DOT.format(a='t.e', b='r.e')} / (t.nrm * r.nrm) AS cos_sim
      FROM test t CROSS JOIN train r
    ),
    top5 AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY test_id
                                     ORDER BY cos_sim DESC, neighbor_id) AS rk
        FROM pairs) WHERE rk <= 5
    ),
    votes AS (
      SELECT test_id, true_label, nlabel, COUNT(*) AS cnt
      FROM top5 GROUP BY test_id, true_label, nlabel
    ),
    pred AS (
      SELECT test_id, true_label, nlabel AS pred_label FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY test_id
                                     ORDER BY cnt DESC, nlabel) AS pr
        FROM votes) WHERE pr = 1
    )
    SELECT true_label AS label,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           CAST(SUM(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           CAST(SUM(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)
                AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS accuracy
    FROM pred GROUP BY true_label
    """,
    doc="[EXT] k-nearest-neighbor classifier holdout evaluation: every "
    "10th vec_id held out, k=5 exact-cosine neighbors from the rest, "
    "majority-label vote (ties -> higher count, then smaller label — "
    "total order, deterministic both engines), per-label accuracy as "
    "one exact-integer division. The neighbor scan broadcasts the "
    "small test side over the train corpus — the same output-bound "
    "posture as cosine_topk; at 100 TB the train side would go through "
    "the IVF/LSH bucketed candidate path instead of the brute scan.",
    tags=("ml", "similarity"),
)
def ml_knn_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from clinical_api_etl_spark.functions.vectors import as_double, dot, norm

    emb = load(spark, sf_dir, "embeddings")
    v = emb.select(
        "vec_id",
        "label",
        as_double(F.col("embedding")).alias("e"),
        norm(as_double(F.col("embedding"))).alias("nrm"),
    )
    test = v.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("test_id"),
        F.col("label").alias("true_label"),
        F.col("e").alias("te"),
        F.col("nrm").alias("tn"),
    )
    train = v.filter(F.col("vec_id") % 10 != 0).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("nlabel"),
        F.col("e").alias("ce"),
        F.col("nrm").alias("cn"),
    )
    train = train.repartition(train.sparkSession.sparkContext.defaultParallelism)
    pairs = train.join(F.broadcast(test)).select(
        "test_id",
        "true_label",
        "neighbor_id",
        "nlabel",
        (dot(F.col("te"), F.col("ce")) / (F.col("tn") * F.col("cn"))).alias("cos_sim"),
    )
    w_k = W.partitionBy("test_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    top5 = pairs.withColumn("rk", F.row_number().over(w_k)).filter(F.col("rk") <= 5)
    votes = top5.groupBy("test_id", "true_label", "nlabel").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w_p = W.partitionBy("test_id").orderBy(F.desc("cnt"), F.asc("nlabel"))
    pred = (
        votes.withColumn("pr", F.row_number().over(w_p))
        .filter(F.col("pr") == 1)
        .select("test_id", "true_label", F.col("nlabel").alias("pred_label"))
    )
    return pred.groupBy(F.col("true_label").alias("label")).agg(
        F.count(F.lit(1)).cast("long").alias("n_test"),
        F.sum(F.when(F.col("pred_label") == F.col("true_label"), 1).otherwise(0))
        .cast("long")
        .alias("n_correct"),
        (
            F.sum(
                F.when(F.col("pred_label") == F.col("true_label"), 1).otherwise(0)
            ).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("accuracy"),
    )


# ---------------------------------------------------------------------------
# Decision stump: best single-threshold split (Gini) via a histogram walk.
# ---------------------------------------------------------------------------


@QS.add(
    "ml_stump_nchars_lang",
    """
    WITH hist AS (
      SELECT n_chars AS v, CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS pos
      FROM documents GROUP BY n_chars
    ),
    walk AS (
      SELECT v,
             CAST(SUM(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS n_l,
             CAST(SUM(pos) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS pos_l,
             CAST(SUM(cnt) OVER () AS BIGINT) AS n,
             CAST(SUM(pos) OVER () AS BIGINT) AS p
      FROM hist
    ),
    scored AS (
      SELECT v AS threshold, n_l, pos_l, n - n_l AS n_r, p - pos_l AS pos_r, n, p,
             CAST(pos_l * pos_l + (n_l - pos_l) * (n_l - pos_l) AS DOUBLE)
               / CAST(n_l AS DOUBLE)
             + CAST((p - pos_l) * (p - pos_l)
                    + ((n - n_l) - (p - pos_l)) * ((n - n_l) - (p - pos_l))
                    AS DOUBLE) / CAST(n - n_l AS DOUBLE) AS purity
      FROM walk WHERE n - n_l > 0
    )
    SELECT threshold, purity, n_l AS n_left, pos_l AS pos_left,
           n_r AS n_right, pos_r AS pos_right,
           pos_l * 2 > n_l AS pred_left_en,
           pos_r * 2 > n_r AS pred_right_en,
           CAST(GREATEST(pos_l, n_l - pos_l) + GREATEST(pos_r, n_r - pos_r)
                AS DOUBLE) / CAST(n AS DOUBLE) AS train_accuracy
    FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY purity DESC, threshold) AS rk
          FROM scored)
    WHERE rk = 1
    """,
    doc="[EXT] CART-style decision stump: the best single threshold on "
    "n_chars for predicting lang='en', chosen by weighted Gini. "
    "Minimizing Gini == maximizing purity = (posL^2+negL^2)/nL + "
    "(posR^2+negR^2)/nR — two divisions over exact BIGINT counts, a "
    "fixed IEEE tree, so the argmax (rank-1 by purity desc, threshold "
    "asc) hash-matches. Candidate thresholds walk the (value -> count, "
    "positives) HISTOGRAM with running sums — the round-7 rank-"
    "statistic technique: cost |distinct values|, never |rows|; the "
    "global window is bounded by the value domain (GLOBAL_WINDOW_OK).",
    tags=("ml", "stats"),
)
def ml_stump_nchars_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    docs = load(spark, sf_dir, "documents")
    hist = docs.groupBy(F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).cast("long").alias("pos"),
    )
    w_run = W.orderBy("v").rowsBetween(W.unboundedPreceding, W.currentRow)
    w_all = W.partitionBy()
    walk = hist.select(
        "v",
        F.sum("cnt").over(w_run).cast("long").alias("n_l"),
        F.sum("pos").over(w_run).cast("long").alias("pos_l"),
        F.sum("cnt").over(w_all).cast("long").alias("n"),
        F.sum("pos").over(w_all).cast("long").alias("p"),
    )
    scored = walk.filter(F.col("n") > F.col("n_l")).selectExpr(
        "v AS threshold",
        "n_l",
        "pos_l",
        "n - n_l AS n_r",
        "p - pos_l AS pos_r",
        "n",
        "p",
        "CAST(pos_l * pos_l + (n_l - pos_l) * (n_l - pos_l) AS DOUBLE)"
        " / CAST(n_l AS DOUBLE)"
        " + CAST((p - pos_l) * (p - pos_l)"
        "        + ((n - n_l) - (p - pos_l)) * ((n - n_l) - (p - pos_l))"
        "        AS DOUBLE) / CAST(n - n_l AS DOUBLE) AS purity",
    )
    w_rk = W.orderBy(F.desc("purity"), F.asc("threshold"))
    return (
        scored.withColumn("rk", F.row_number().over(w_rk))
        .filter(F.col("rk") == 1)
        .selectExpr(
            "threshold",
            "purity",
            "n_l AS n_left",
            "pos_l AS pos_left",
            "n_r AS n_right",
            "pos_r AS pos_right",
            "pos_l * 2 > n_l AS pred_left_en",
            "pos_r * 2 > n_r AS pred_right_en",
            "CAST(GREATEST(pos_l, n_l - pos_l) + GREATEST(pos_r, n_r - pos_r)"
            " AS DOUBLE) / CAST(n AS DOUBLE) AS train_accuracy",
        )
    )


# ---------------------------------------------------------------------------
# Contrastive pair mining (anchor, positive, hard negative) on embeddings.
# ---------------------------------------------------------------------------


@QS.add(
    "corpus_contrastive_pairs",
    f"""
    WITH v AS (
      SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS e,
             {_FOLD_NORM.format(a='list_transform(embedding, x -> x::DOUBLE)')} AS nrm
      FROM embeddings
    ),
    anchors AS (SELECT vec_id AS anchor_id, label AS anchor_label,
                       e AS ae, nrm AS an FROM v WHERE vec_id % 10 = 0),
    pairs AS (
      SELECT anchor_id, anchor_label, b.vec_id AS cand_id,
             b.label = anchor_label AS same_label,
             {_FOLD_DOT.format(a='ae', b='b.e')} / (an * b.nrm) AS cos_sim
      FROM anchors CROSS JOIN v b WHERE b.vec_id <> anchor_id
    ),
    best AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id, same_label
                                     ORDER BY cos_sim DESC, cand_id) AS rk
        FROM pairs) WHERE rk = 1
    )
    SELECT anchor_id, anchor_label,
           MAX(CASE WHEN same_label THEN cand_id END) AS pos_id,
           MAX(CASE WHEN same_label THEN cos_sim END) AS pos_sim,
           MAX(CASE WHEN NOT same_label THEN cand_id END) AS neg_id,
           MAX(CASE WHEN NOT same_label THEN cos_sim END) AS neg_sim,
           MAX(CASE WHEN same_label THEN cos_sim END)
             - MAX(CASE WHEN NOT same_label THEN cos_sim END) AS margin,
           MAX(CASE WHEN same_label THEN cos_sim END)
             > MAX(CASE WHEN NOT same_label THEN cos_sim END) AS margin_pos
    FROM best GROUP BY anchor_id, anchor_label
    """,
    doc="[EXT] contrastive training-pair mining: for every 10th vector "
    "(anchor), the nearest SAME-label vector (positive) and the nearest "
    "DIFFERENT-label vector (hard negative) by exact cosine, with the "
    "triplet margin pos-neg and its sign. One anchor-broadcast pair "
    "scan, one (anchor, same_label) window, conditional-aggregate "
    "pivot to one row per anchor. Margin is a subtraction of two "
    "pinned-fold cosines — fixed IEEE tree, full value hash. The "
    "SimCSE/triplet-mining primitive; at 100 TB anchors come from the "
    "ANN bucketed path instead of the brute scan.",
    tags=("ml", "similarity"),
)
def corpus_contrastive_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from clinical_api_etl_spark.functions.vectors import as_double, dot, norm

    emb = load(spark, sf_dir, "embeddings")
    v = emb.select(
        "vec_id",
        "label",
        as_double(F.col("embedding")).alias("e"),
        norm(as_double(F.col("embedding"))).alias("nrm"),
    )
    anchors = v.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("anchor_label"),
        F.col("e").alias("ae"),
        F.col("nrm").alias("an"),
    )
    cands = v.select(
        F.col("vec_id").alias("cand_id"),
        F.col("label").alias("clabel"),
        F.col("e").alias("ce"),
        F.col("nrm").alias("cn"),
    )
    cands = cands.repartition(cands.sparkSession.sparkContext.defaultParallelism)
    pairs = cands.join(
        F.broadcast(anchors), F.col("anchor_id") != F.col("cand_id")
    ).select(
        "anchor_id",
        "anchor_label",
        "cand_id",
        (F.col("clabel") == F.col("anchor_label")).alias("same_label"),
        (dot(F.col("ae"), F.col("ce")) / (F.col("an") * F.col("cn"))).alias("cos_sim"),
    )
    w = W.partitionBy("anchor_id", "same_label").orderBy(
        F.desc("cos_sim"), F.asc("cand_id")
    )
    best = pairs.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1)
    return best.groupBy("anchor_id", "anchor_label").agg(
        F.max(F.when(F.col("same_label"), F.col("cand_id"))).alias("pos_id"),
        F.max(F.when(F.col("same_label"), F.col("cos_sim"))).alias("pos_sim"),
        F.max(F.when(~F.col("same_label"), F.col("cand_id"))).alias("neg_id"),
        F.max(F.when(~F.col("same_label"), F.col("cos_sim"))).alias("neg_sim"),
        (
            F.max(F.when(F.col("same_label"), F.col("cos_sim")))
            - F.max(F.when(~F.col("same_label"), F.col("cos_sim")))
        ).alias("margin"),
        (
            F.max(F.when(F.col("same_label"), F.col("cos_sim")))
            > F.max(F.when(~F.col("same_label"), F.col("cos_sim")))
        ).alias("margin_pos"),
    )


# ---------------------------------------------------------------------------
# Rank AUC (Mann-Whitney form, tie midranks) for a single feature.
# ---------------------------------------------------------------------------


@QS.add(
    "ml_auc_nchars_lang",
    """
    WITH hist AS (
      SELECT n_chars AS v, CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS pos
      FROM documents GROUP BY n_chars
    ),
    walk AS (
      SELECT v, cnt, pos,
             CAST(COALESCE(SUM(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                  PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_prev
      FROM hist
    ),
    agg AS (
      SELECT CAST(SUM(pos) AS BIGINT) AS p,
             CAST(SUM(cnt) - SUM(pos) AS BIGINT) AS n_neg,
             CAST(SUM(pos * (2 * cum_prev + cnt + 1)) AS BIGINT) AS sum2r_pos
      FROM walk
    )
    SELECT p AS n_pos, n_neg,
           sum2r_pos - p * (p + 1) AS u2_stat,
           CAST(sum2r_pos - p * (p + 1) AS DOUBLE)
             / CAST(2 * p * n_neg AS DOUBLE) AS auc,
           2e0 * (CAST(sum2r_pos - p * (p + 1) AS DOUBLE)
             / CAST(2 * p * n_neg AS DOUBLE)) - 1e0 AS gini_coef
    FROM agg
    """,
    doc="[EXT] single-feature ROC AUC of n_chars for lang='en' in the "
    "Mann-Whitney U form with tie MIDRANKS, computed entirely on the "
    "value histogram: doubled midrank 2r = 2*cum_prev + cnt + 1 stays "
    "integer (round-7 doubled-midrank rule), so U2 = sum_pos(2r) - "
    "P(P+1) is an exact BIGINT and AUC = U2 / (2*P*N) is one division "
    "— full value hash. Gini coefficient = 2*AUC - 1 as a fixed tree. "
    "Cost |distinct values|, never |rows|; the running window walks "
    "the bounded value domain (GLOBAL_WINDOW_OK).",
    tags=("ml", "stats"),
)
def ml_auc_nchars_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    docs = load(spark, sf_dir, "documents")
    hist = docs.groupBy(F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).cast("long").alias("pos"),
    )
    w_prev = W.orderBy("v").rowsBetween(W.unboundedPreceding, -1)
    walk = hist.select(
        "v",
        "cnt",
        "pos",
        F.coalesce(F.sum("cnt").over(w_prev), F.lit(0)).cast("long").alias("cum_prev"),
    )
    return walk.agg(
        F.sum("pos").cast("long").alias("p"),
        (F.sum("cnt") - F.sum("pos")).cast("long").alias("n_neg"),
        F.sum(F.col("pos") * (2 * F.col("cum_prev") + F.col("cnt") + 1))
        .cast("long")
        .alias("sum2r_pos"),
    ).selectExpr(
        "p AS n_pos",
        "n_neg",
        "sum2r_pos - p * (p + 1) AS u2_stat",
        "CAST(sum2r_pos - p * (p + 1) AS DOUBLE)"
        " / CAST(2 * p * n_neg AS DOUBLE) AS auc",
        "2D * (CAST(sum2r_pos - p * (p + 1) AS DOUBLE)"
        " / CAST(2 * p * n_neg AS DOUBLE)) - 1D AS gini_coef",
    )


# ---------------------------------------------------------------------------
# 5-fold cross-validated decision stump (hash folds, per-fold refit).
# ---------------------------------------------------------------------------

_CV_FOLDS = 5
_FOLD_DUCK = (
    "CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS INTEGER) % 5"
)
_FOLD_SPARK = (
    "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 2), 16, 10) AS INT) % 5"
)


@QS.add(
    "ml_stump_cv_accuracy",
    f"""
    WITH docs2 AS (
      SELECT doc_id, n_chars, lang, {_FOLD_DUCK} AS fold FROM documents
    ),
    hist AS (
      SELECT fold, n_chars AS v, CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS pos
      FROM docs2 GROUP BY fold, n_chars
    ),
    total AS (
      SELECT v, CAST(SUM(cnt) AS BIGINT) AS tcnt, CAST(SUM(pos) AS BIGINT) AS tpos
      FROM hist GROUP BY v
    ),
    folds AS (SELECT DISTINCT fold FROM docs2),
    train_hist AS (
      SELECT f.fold, t.v,
             t.tcnt - COALESCE(h.cnt, 0) AS cnt,
             t.tpos - COALESCE(h.pos, 0) AS pos
      FROM folds f CROSS JOIN total t
      LEFT JOIN hist h ON h.fold = f.fold AND h.v = t.v
    ),
    walk AS (
      SELECT fold, v,
             CAST(SUM(cnt) OVER (PARTITION BY fold ORDER BY v
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_l,
             CAST(SUM(pos) OVER (PARTITION BY fold ORDER BY v
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pos_l,
             CAST(SUM(cnt) OVER (PARTITION BY fold) AS BIGINT) AS n,
             CAST(SUM(pos) OVER (PARTITION BY fold) AS BIGINT) AS p
      FROM train_hist
    ),
    best AS (
      SELECT fold, v AS threshold,
             pos_l * 2 > n_l AS pred_left_en,
             (p - pos_l) * 2 > (n - n_l) AS pred_right_en
      FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY fold ORDER BY
               CAST(pos_l * pos_l + (n_l - pos_l) * (n_l - pos_l) AS DOUBLE)
                 / CAST(n_l AS DOUBLE)
               + CAST((p - pos_l) * (p - pos_l)
                      + ((n - n_l) - (p - pos_l)) * ((n - n_l) - (p - pos_l))
                      AS DOUBLE) / CAST(n - n_l AS DOUBLE) DESC, v) AS rk
        FROM walk WHERE n - n_l > 0 AND n_l > 0) WHERE rk = 1
    )
    SELECT d.fold, b.threshold,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           CAST(SUM(CASE WHEN (CASE WHEN d.n_chars <= b.threshold
                                    THEN b.pred_left_en ELSE b.pred_right_en END)
                              = (d.lang = 'en') THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           CAST(SUM(CASE WHEN (CASE WHEN d.n_chars <= b.threshold
                                    THEN b.pred_left_en ELSE b.pred_right_en END)
                              = (d.lang = 'en') THEN 1 ELSE 0 END)
                AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS cv_accuracy
    FROM docs2 d JOIN best b USING (fold)
    GROUP BY d.fold, b.threshold
    """,
    doc="[EXT] 5-fold cross-validated decision stump: folds are md5-hash "
    "assigned (portable integer slots), each held-out fold's stump "
    "refits on the OTHER four via the complement trick train_hist = "
    "total_hist - fold_hist (no 5x data replication — cost |folds| x "
    "|distinct values|), per-fold threshold argmax by the same exact-"
    "integer purity objective as ml_stump_nchars_lang, then held-out "
    "accuracy per fold as one exact division. The model-selection "
    "companion to the training-accuracy stump; windows partition BY "
    "FOLD so nothing is global.",
    tags=("ml", "stats"),
)
def ml_stump_cv_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    docs = load(spark, sf_dir, "documents").selectExpr(
        "doc_id", "n_chars", "lang", f"{_FOLD_SPARK} AS fold"
    )
    hist = docs.groupBy("fold", F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).cast("long").alias("pos"),
    )
    total = hist.groupBy("v").agg(
        F.sum("cnt").cast("long").alias("tcnt"),
        F.sum("pos").cast("long").alias("tpos"),
    )
    folds = docs.select("fold").distinct()
    train_hist = (
        folds.crossJoin(total)
        .join(hist, ["fold", "v"], "left")
        .select(
            "fold",
            "v",
            (F.col("tcnt") - F.coalesce(F.col("cnt"), F.lit(0))).alias("cnt"),
            (F.col("tpos") - F.coalesce(F.col("pos"), F.lit(0))).alias("pos"),
        )
    )
    w_run = W.partitionBy("fold").orderBy("v").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    w_all = W.partitionBy("fold")
    walk = train_hist.select(
        "fold",
        "v",
        F.sum("cnt").over(w_run).cast("long").alias("n_l"),
        F.sum("pos").over(w_run).cast("long").alias("pos_l"),
        F.sum("cnt").over(w_all).cast("long").alias("n"),
        F.sum("pos").over(w_all).cast("long").alias("p"),
    )
    purity = (
        "CAST(pos_l * pos_l + (n_l - pos_l) * (n_l - pos_l) AS DOUBLE)"
        " / CAST(n_l AS DOUBLE)"
        " + CAST((p - pos_l) * (p - pos_l)"
        "        + ((n - n_l) - (p - pos_l)) * ((n - n_l) - (p - pos_l))"
        "        AS DOUBLE) / CAST(n - n_l AS DOUBLE)"
    )
    w_rk = W.partitionBy("fold").orderBy(F.expr(purity).desc(), F.asc("v"))
    best = (
        walk.filter((F.col("n") > F.col("n_l")) & (F.col("n_l") > 0))
        .withColumn("rk", F.row_number().over(w_rk))
        .filter(F.col("rk") == 1)
        .selectExpr(
            "fold",
            "v AS threshold",
            "pos_l * 2 > n_l AS pred_left_en",
            "(p - pos_l) * 2 > (n - n_l) AS pred_right_en",
        )
    )
    joined = docs.join(best, "fold")
    correct = F.when(
        F.when(F.col("n_chars") <= F.col("threshold"), F.col("pred_left_en"))
        .otherwise(F.col("pred_right_en"))
        == (F.col("lang") == "en"),
        1,
    ).otherwise(0)
    return joined.groupBy("fold", "threshold").agg(
        F.count(F.lit(1)).cast("long").alias("n_test"),
        F.sum(correct).cast("long").alias("n_correct"),
        (F.sum(correct).cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "cv_accuracy"
        ),
    )


# ---------------------------------------------------------------------------
# kNN vote-confidence calibration (reliability table + exact ECE).
# ---------------------------------------------------------------------------


@QS.add(
    "eval_knn_calibration",
    f"""
    WITH v AS (
      SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS e,
             {_FOLD_NORM.format(a='list_transform(embedding, x -> x::DOUBLE)')} AS nrm
      FROM embeddings
    ),
    test AS (SELECT * FROM v WHERE vec_id % 10 = 0),
    train AS (SELECT * FROM v WHERE vec_id % 10 <> 0),
    pairs AS (
      SELECT t.vec_id AS test_id, t.label AS true_label,
             r.vec_id AS neighbor_id, r.label AS nlabel,
             {_FOLD_DOT.format(a='t.e', b='r.e')} / (t.nrm * r.nrm) AS cos_sim
      FROM test t CROSS JOIN train r
    ),
    top5 AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY test_id
                                     ORDER BY cos_sim DESC, neighbor_id) AS rk
        FROM pairs) WHERE rk <= 5
    ),
    votes AS (
      SELECT test_id, true_label, nlabel, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM top5 GROUP BY test_id, true_label, nlabel
    ),
    pred AS (
      SELECT test_id, true_label, nlabel AS pred_label, cnt AS conf_votes FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY test_id
                                     ORDER BY cnt DESC, nlabel) AS pr
        FROM votes) WHERE pr = 1
    ),
    bins AS (
      SELECT conf_votes,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_correct
      FROM pred GROUP BY conf_votes
    ),
    tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS n_total,
             CAST(SUM(abs(5 * n_correct - conf_votes * n)) AS BIGINT)
               AS gap_num_total
      FROM bins
    )
    SELECT b.conf_votes, b.n, b.n_correct,
           CAST(b.conf_votes AS DOUBLE) / 5e0 AS confidence,
           CAST(b.n_correct AS DOUBLE) / CAST(b.n AS DOUBLE) AS accuracy,
           CAST(abs(5 * b.n_correct - b.conf_votes * b.n) AS BIGINT) AS gap_num,
           CAST(t.gap_num_total AS DOUBLE) / CAST(5 * t.n_total AS DOUBLE) AS ece
    FROM bins b CROSS JOIN tot t
    """,
    doc="[EXT] calibration audit of the kNN classifier's vote confidence "
    "(reliability-diagram table + expected calibration error): bin test "
    "points by winning vote count (confidence = votes/5 — every member "
    "of a bin has the IDENTICAL confidence, so no float averaging "
    "exists anywhere), per-bin accuracy as one exact division, and ECE "
    "in closed integer form: sum_b n_b/N * |acc_b - conf_b| = "
    "(sum_b |5*correct_b - votes_b*n_b|) / (5N) — the numerator is an "
    "exact BIGINT and ECE is ONE division, fully portable. Shares the "
    "ml_knn_eval scan posture (broadcast test side over train corpus; "
    "IVF/LSH is the 100 TB candidate path).",
    tags=("ml", "stats"),
)
def eval_knn_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    bins = _knn_conf_bins(spark, sf_dir)
    tot = bins.agg(
        F.sum("n").cast("long").alias("n_total"),
        F.sum(F.abs(5 * F.col("n_correct") - F.col("conf_votes") * F.col("n")))
        .cast("long")
        .alias("gap_num_total"),
    )
    return bins.crossJoin(F.broadcast(tot)).select(
        "conf_votes",
        "n",
        "n_correct",
        (F.col("conf_votes").cast("double") / F.lit(5.0)).alias("confidence"),
        (F.col("n_correct").cast("double") / F.col("n").cast("double")).alias(
            "accuracy"
        ),
        F.abs(5 * F.col("n_correct") - F.col("conf_votes") * F.col("n"))
        .cast("long")
        .alias("gap_num"),
        (
            F.col("gap_num_total").cast("double")
            / (F.lit(5) * F.col("n_total")).cast("double")
        ).alias("ece"),
    )


def _knn_conf_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(conf_votes, n, n_correct) reliability bins of the kNN vote
    classifier — shared by eval_knn_calibration (ECE) and
    eval_brier_decomposition (Murphy terms)."""
    from pyspark.sql.window import Window as W

    from clinical_api_etl_spark.functions.vectors import as_double, dot, norm

    emb = load(spark, sf_dir, "embeddings")
    v = emb.select(
        "vec_id",
        "label",
        as_double(F.col("embedding")).alias("e"),
        norm(as_double(F.col("embedding"))).alias("nrm"),
    )
    test = v.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("test_id"),
        F.col("label").alias("true_label"),
        F.col("e").alias("te"),
        F.col("nrm").alias("tn"),
    )
    train = v.filter(F.col("vec_id") % 10 != 0).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("nlabel"),
        F.col("e").alias("ce"),
        F.col("nrm").alias("cn"),
    )
    train = train.repartition(train.sparkSession.sparkContext.defaultParallelism)
    pairs = train.join(F.broadcast(test)).select(
        "test_id",
        "true_label",
        "neighbor_id",
        "nlabel",
        (dot(F.col("te"), F.col("ce")) / (F.col("tn") * F.col("cn"))).alias("cos_sim"),
    )
    w_k = W.partitionBy("test_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    top5 = pairs.withColumn("rk", F.row_number().over(w_k)).filter(F.col("rk") <= 5)
    votes = top5.groupBy("test_id", "true_label", "nlabel").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    w_p = W.partitionBy("test_id").orderBy(F.desc("cnt"), F.asc("nlabel"))
    pred = (
        votes.withColumn("pr", F.row_number().over(w_p))
        .filter(F.col("pr") == 1)
        .select(
            "test_id",
            "true_label",
            F.col("nlabel").alias("pred_label"),
            F.col("cnt").alias("conf_votes"),
        )
    )
    return pred.groupBy("conf_votes").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("pred_label") == F.col("true_label"), 1).otherwise(0))
        .cast("long")
        .alias("n_correct"),
    )


#: The v..bins CTE chain of eval_knn_calibration's oracle, verbatim —
#: shared text so the two oracles can never drift apart.
_KNN_BINS_CTES = f"""
    v AS (
      SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS e,
             {{norm}} AS nrm
      FROM embeddings
    ),
    test AS (SELECT * FROM v WHERE vec_id % 10 = 0),
    train AS (SELECT * FROM v WHERE vec_id % 10 <> 0),
    pairs AS (
      SELECT t.vec_id AS test_id, t.label AS true_label,
             r.vec_id AS neighbor_id, r.label AS nlabel,
             {{dot}} / (t.nrm * r.nrm) AS cos_sim
      FROM test t CROSS JOIN train r
    ),
    top5 AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY test_id
                                     ORDER BY cos_sim DESC, neighbor_id) AS rk
        FROM pairs) WHERE rk <= 5
    ),
    votes AS (
      SELECT test_id, true_label, nlabel, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM top5 GROUP BY test_id, true_label, nlabel
    ),
    pred AS (
      SELECT test_id, true_label, nlabel AS pred_label, cnt AS conf_votes FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY test_id
                                     ORDER BY cnt DESC, nlabel) AS pr
        FROM votes) WHERE pr = 1
    ),
    bins AS (
      SELECT conf_votes,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_correct
      FROM pred GROUP BY conf_votes
    )"""


@QS.add(
    "eval_brier_decomposition",
    "WITH "
    + _KNN_BINS_CTES.format(
        norm=_FOLD_NORM.format(a="list_transform(embedding, x -> x::DOUBLE)"),
        dot=_FOLD_DOT.format(a="t.e", b="r.e"),
    )
    + """,
    tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS nt,
             CAST(SUM(n_correct) AS BIGINT) AS ct,
             CAST(SUM(n_correct * (5 - conf_votes) * (5 - conf_votes)
                      + (n - n_correct) * conf_votes * conf_votes)
                  AS BIGINT) AS brier_num
      FROM bins
    ),
    folds AS (
      SELECT
        list_reduce(list_prepend(CAST(0 AS DOUBLE),
          list(CAST((conf_votes * n - 5 * n_correct)
                    * (conf_votes * n - 5 * n_correct) AS DOUBLE)
               / CAST(25 * n AS DOUBLE) ORDER BY conf_votes)),
          (p, q) -> p + q) AS rel_sum,
        list_reduce(list_prepend(CAST(0 AS DOUBLE),
          list(CAST((n_correct * tot.nt - tot.ct * n)
                    * (n_correct * tot.nt - tot.ct * n) AS DOUBLE)
               / CAST(n * tot.nt * tot.nt AS DOUBLE) ORDER BY conf_votes)),
          (p, q) -> p + q) AS res_sum
      FROM bins, tot GROUP BY tot.nt, tot.ct
    )
    SELECT tot.nt AS n_total, tot.ct AS n_correct_total, tot.brier_num,
           CAST(tot.brier_num AS DOUBLE) / CAST(25 * tot.nt AS DOUBLE)
             AS brier,
           folds.rel_sum / CAST(tot.nt AS DOUBLE) AS reliability,
           folds.res_sum / CAST(tot.nt AS DOUBLE) AS resolution,
           CAST(tot.ct * (tot.nt - tot.ct) AS DOUBLE)
             / CAST(tot.nt * tot.nt AS DOUBLE) AS uncertainty
    FROM tot, folds
    """,
    doc="[EXT] Murphy decomposition of the kNN vote classifier's Brier "
    "score (Brier = reliability − resolution + uncertainty) over the "
    "same confidence bins as eval_knn_calibration: every member of a "
    "vote bin shares the identical forecast p = votes/5, so the whole "
    "decomposition collapses to exact bin counts — the Brier numerator "
    "Σ c(5−v)² + (n−c)v² is a BIGINT with ONE division by 25N; "
    "reliability and resolution are pinned bin-order folds whose terms "
    "are single divisions over exact BIGINT squares; uncertainty is "
    "ō(1−ō) as one fixed tree. The CALIBRATION-vs-DISCRIMINATION "
    "split ECE cannot give: high reliability (miscalibrated) vs low "
    "resolution (uninformative) point at different fixes.",
    tags=("ml", "stats"),
)
def eval_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    # <= 5 rows, but three plan branches (tot, joined, brier join) hang
    # off it — materialize once so the kNN scan never re-runs.
    bins = _knn_conf_bins(spark, sf_dir).localCheckpoint(eager=True)
    tot = bins.agg(
        F.sum("n").cast("long").alias("nt"),
        F.sum("n_correct").cast("long").alias("ct"),
        F.sum(
            F.col("n_correct") * (5 - F.col("conf_votes")) * (5 - F.col("conf_votes"))
            + (F.col("n") - F.col("n_correct"))
            * F.col("conf_votes")
            * F.col("conf_votes")
        )
        .cast("long")
        .alias("brier_num"),
    )
    joined = bins.crossJoin(F.broadcast(tot))
    rel_term = (
        (
            (F.col("conf_votes") * F.col("n") - 5 * F.col("n_correct"))
            * (F.col("conf_votes") * F.col("n") - 5 * F.col("n_correct"))
        ).cast("double")
        / (25 * F.col("n")).cast("double")
    )
    res_term = (
        (
            (F.col("n_correct") * F.col("nt") - F.col("ct") * F.col("n"))
            * (F.col("n_correct") * F.col("nt") - F.col("ct") * F.col("n"))
        ).cast("double")
        / (F.col("n") * F.col("nt") * F.col("nt")).cast("double")
    )
    folds = joined.groupBy("nt", "ct").agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("conf_votes", rel_term.alias("t")))),
            F.lit(0.0),
            lambda acc, s: acc + s["t"],
        ).alias("rel_sum"),
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("conf_votes", res_term.alias("t")))),
            F.lit(0.0),
            lambda acc, s: acc + s["t"],
        ).alias("res_sum"),
    )
    return folds.crossJoin(F.broadcast(tot.select("brier_num"))).select(
        F.col("nt").alias("n_total"),
        F.col("ct").alias("n_correct_total"),
        "brier_num",
        (F.col("brier_num").cast("double") / (25 * F.col("nt")).cast("double")).alias(
            "brier"
        ),
        (F.col("rel_sum") / F.col("nt").cast("double")).alias("reliability"),
        (F.col("res_sum") / F.col("nt").cast("double")).alias("resolution"),
        (
            (F.col("ct") * (F.col("nt") - F.col("ct"))).cast("double")
            / (F.col("nt") * F.col("nt")).cast("double")
        ).alias("uncertainty"),
    )


# Lift / cumulative-gains deciles for the n_chars score (campaign-targeting
# diagnostic for the same single-feature classifier ml_auc_nchars_lang
# evaluates globally).
# ---------------------------------------------------------------------------


@QS.add(
    "ml_lift_gains_deciles",
    """
    WITH hist AS (
      SELECT n_chars AS v, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM documents GROUP BY n_chars
    ),
    walk AS (
      SELECT v, CAST(COALESCE(SUM(cnt) OVER (ORDER BY v DESC ROWS BETWEEN
                 UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS cum_prev
      FROM hist
    ),
    scal AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
               AS p
      FROM documents
    ),
    rows_ AS (
      SELECT d.doc_id, d.lang,
             w.cum_prev + ROW_NUMBER() OVER (PARTITION BY d.n_chars
                                             ORDER BY d.doc_id) AS rnk
      FROM documents d JOIN walk w ON w.v = d.n_chars
    ),
    dec AS (
      SELECT ((rnk - 1) * 10) // scal.n AS decile,
             CAST(COUNT(*) AS BIGINT) AS n_d,
             CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
               AS pos_d
      FROM rows_, scal GROUP BY 1, scal.n
    )
    SELECT decile, n_d, pos_d,
           CAST(SUM(pos_d) OVER (ORDER BY decile) AS BIGINT) AS cum_pos,
           CAST(pos_d * scal.n AS DOUBLE)
             / CAST(n_d * scal.p AS DOUBLE) AS lift,
           CAST(SUM(pos_d) OVER (ORDER BY decile) AS DOUBLE)
             / CAST(scal.p AS DOUBLE) AS cum_gain
    FROM dec, scal
    """,
    doc="[EXT] lift and cumulative-gains table by score decile: rank "
    "documents by n_chars descending (ties pinned by doc_id), split "
    "into 10 equal-population deciles via ((rank-1)*10) div N (explicit "
    "floor-div, never NTILE -- identical bucketing both engines), and "
    "report per-decile positive capture. lift_d = (pos_d*N)/(n_d*P) "
    "and cum_gain = cum_pos/P are single divisions over exact BIGINT "
    "products. The global rank never materializes per row: the "
    "DESC-ordered cumulative walk runs on the n_chars VALUE HISTOGRAM "
    "(ml_auc_nchars_lang's bounded-domain law) and each row's rank is "
    "cum_prev(v) + row_number within its value block (partitioned "
    "window); the only other global window orders the 10 decile rows.",
    tags=("ml",),
)
def ml_lift_gains_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    hist = docs.groupBy(F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    w_prev = W.orderBy(F.desc("v")).rowsBetween(W.unboundedPreceding, -1)
    walk = hist.select(
        "v",
        F.coalesce(F.sum("cnt").over(w_prev), F.lit(0)).cast("long").alias("cum_prev"),
    )
    scal = docs.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).cast("long").alias("p"),
    )
    w_blk = W.partitionBy("n_chars").orderBy("doc_id")
    rows_ = (
        docs.join(F.broadcast(walk), docs["n_chars"] == walk["v"])
        .select(
            "doc_id",
            "lang",
            "n_chars",
            (F.col("cum_prev") + F.row_number().over(w_blk)).alias("rnk"),
        )
    )
    dec = (
        rows_.crossJoin(F.broadcast(scal))
        .select(
            F.expr("((rnk - 1) * 10) div n").alias("decile"),
            F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_d"),
            F.sum("pos").cast("long").alias("pos_d"),
        )
    )
    w_cum = W.orderBy("decile")
    return dec.crossJoin(F.broadcast(scal)).select(
        "decile",
        "n_d",
        "pos_d",
        F.sum("pos_d").over(w_cum).cast("long").alias("cum_pos"),
        (
            (F.col("pos_d") * F.col("n")).cast("double")
            / (F.col("n_d") * F.col("p")).cast("double")
        ).alias("lift"),
        (
            F.sum("pos_d").over(w_cum).cast("double") / F.col("p").cast("double")
        ).alias("cum_gain"),
    )


# ---------------------------------------------------------------------------
# ROC curve points + KS separation for the n_chars score (the curve and
# max-separation statistic behind ml_auc_nchars_lang's single number).
# ---------------------------------------------------------------------------

_ROC_WALK = """
    hist AS (
      SELECT n_chars AS v, CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
               AS pos
      FROM documents GROUP BY n_chars
    ),
    scal AS (
      SELECT CAST(SUM(pos) AS BIGINT) AS p,
             CAST(SUM(cnt) - SUM(pos) AS BIGINT) AS nn
      FROM hist
    ),
    walk AS (
      SELECT v,
             CAST(SUM(pos) OVER (ORDER BY v DESC) AS BIGINT) AS tp,
             CAST(SUM(cnt - pos) OVER (ORDER BY v DESC) AS BIGINT) AS fp
      FROM hist
    )"""


@QS.add(
    "ml_roc_points",
    f"""
    WITH {_ROC_WALK}
    SELECT w.v AS threshold, w.tp, w.fp,
           CAST(w.tp AS DOUBLE) / CAST(s.p AS DOUBLE) AS tpr,
           CAST(w.fp AS DOUBLE) / CAST(s.nn AS DOUBLE) AS fpr
    FROM walk w, scal s
    """,
    doc="[EXT] full ROC curve of the n_chars score for lang='en': one "
    "point per distinct threshold (predict positive when n_chars >= v), "
    "tp/fp as exact BIGINT cumulative counts from ONE descending walk "
    "over the value HISTOGRAM (the ml_auc_nchars_lang bounded-domain "
    "law — cost |distinct lengths|, never |docs|), tpr/fpr single "
    "divisions. The curve the AUC integrates; feeds threshold selection "
    "and the KS separation twin.",
    tags=("ml",),
)
def ml_roc_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    docs = load(spark, sf_dir, "documents")
    hist = docs.groupBy(F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).cast("long").alias("pos"),
    )
    scal = hist.agg(
        F.sum("pos").cast("long").alias("p"),
        (F.sum("cnt") - F.sum("pos")).cast("long").alias("nn"),
    )
    w_cum = W.orderBy(F.desc("v")).rowsBetween(W.unboundedPreceding, 0)
    walk = hist.select(
        "v",
        F.sum("pos").over(w_cum).cast("long").alias("tp"),
        F.sum(F.col("cnt") - F.col("pos")).over(w_cum).cast("long").alias("fp"),
    )
    return walk.crossJoin(F.broadcast(scal)).select(
        F.col("v").alias("threshold"),
        "tp",
        "fp",
        (F.col("tp").cast("double") / F.col("p").cast("double")).alias("tpr"),
        (F.col("fp").cast("double") / F.col("nn").cast("double")).alias("fpr"),
    )


@QS.add(
    "ml_pr_curve_points",
    f"""
    WITH {_ROC_WALK}
    SELECT w.v AS threshold, w.tp, w.fp,
           CAST(w.tp AS DOUBLE) / CAST(w.tp + w.fp AS DOUBLE) AS precision_,
           CAST(w.tp AS DOUBLE) / CAST(s.p AS DOUBLE) AS recall_,
           CAST(2 * w.tp AS DOUBLE)
             / CAST(w.tp + w.fp + s.p AS DOUBLE) AS f1
    FROM walk w, scal s
    """,
    doc="[EXT] full precision/recall curve of the n_chars score for "
    "lang='en' — the imbalanced-class companion to ml_roc_points (PR "
    "curves ignore true negatives, so they move when the negative class "
    "dwarfs the positive one and ROC barely does). Same single "
    "descending histogram walk (cost |distinct lengths|, never |docs|); "
    "precision tp/(tp+fp), recall tp/P, and F1 in the closed form "
    "2tp/(tp+fp+P) (denominator = tp+fp+tp+fn) — each ONE division of "
    "exact BIGINTs, no harmonic-mean float chain. tp+fp >= 1 on every "
    "walk row (each threshold row carries its own count), so no "
    "zero-denominator case exists by construction.",
    tags=("ml",),
)
def ml_pr_curve_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    docs = load(spark, sf_dir, "documents")
    hist = docs.groupBy(F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).cast("long").alias("pos"),
    )
    scal = hist.agg(F.sum("pos").cast("long").alias("p"))
    w_cum = W.orderBy(F.desc("v")).rowsBetween(W.unboundedPreceding, 0)
    walk = hist.select(
        "v",
        F.sum("pos").over(w_cum).cast("long").alias("tp"),
        F.sum(F.col("cnt") - F.col("pos")).over(w_cum).cast("long").alias("fp"),
    )
    return walk.crossJoin(F.broadcast(scal)).select(
        F.col("v").alias("threshold"),
        "tp",
        "fp",
        (
            F.col("tp").cast("double")
            / (F.col("tp") + F.col("fp")).cast("double")
        ).alias("precision_"),
        (F.col("tp").cast("double") / F.col("p").cast("double")).alias(
            "recall_"
        ),
        (
            (F.lit(2) * F.col("tp")).cast("double")
            / (F.col("tp") + F.col("fp") + F.col("p")).cast("double")
        ).alias("f1"),
    )


@QS.add(
    "ml_ks_separation",
    f"""
    WITH {_ROC_WALK},
    diffs AS (
      SELECT w.v, abs(w.tp * s.nn - w.fp * s.p) AS d
      FROM walk w, scal s
    ),
    best AS (SELECT CAST(MAX(d) AS BIGINT) AS ks_num FROM diffs)
    SELECT b.ks_num,
           CAST((SELECT MIN(v) FROM diffs WHERE d = b.ks_num) AS BIGINT)
             AS threshold,
           s.p AS n_pos, s.nn AS n_neg,
           CAST(b.ks_num AS DOUBLE) / CAST(s.p * s.nn AS DOUBLE) AS ks
    FROM best b, scal s
    """,
    doc="[EXT] Kolmogorov-Smirnov separation of the n_chars score "
    "between classes — the credit-scoring discrimination metric: "
    "KS = max over thresholds of |TPR - FPR|, computed as an exact "
    "BIGINT maximum of |tp*N - fp*P| over the same descending "
    "histogram walk as ml_roc_points (ties in the argmax pinned by "
    "MIN threshold), ONE division at the end. Identical cross-"
    "multiplication discipline as the z-score fences; cost |distinct "
    "lengths|.",
    tags=("ml", "stats"),
)
def ml_ks_separation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    docs = load(spark, sf_dir, "documents")
    hist = docs.groupBy(F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).cast("long").alias("pos"),
    )
    scal = hist.agg(
        F.sum("pos").cast("long").alias("p"),
        (F.sum("cnt") - F.sum("pos")).cast("long").alias("nn"),
    )
    w_cum = W.orderBy(F.desc("v")).rowsBetween(W.unboundedPreceding, 0)
    walk = hist.select(
        "v",
        F.sum("pos").over(w_cum).cast("long").alias("tp"),
        F.sum(F.col("cnt") - F.col("pos")).over(w_cum).cast("long").alias("fp"),
    )
    diffs = walk.crossJoin(F.broadcast(scal)).select(
        "v",
        F.abs(F.col("tp") * F.col("nn") - F.col("fp") * F.col("p")).alias("d"),
    )
    best = diffs.agg(F.max("d").cast("long").alias("ks_num"))
    arg = (
        diffs.join(F.broadcast(best), diffs["d"] == best["ks_num"])
        .agg(F.min("v").cast("long").alias("threshold"))
    )
    return (
        best.crossJoin(F.broadcast(arg))
        .crossJoin(F.broadcast(scal))
        .select(
            "ks_num",
            "threshold",
            F.col("p").alias("n_pos"),
            F.col("nn").alias("n_neg"),
            (
                F.col("ks_num").cast("double")
                / (F.col("p") * F.col("nn")).cast("double")
            ).alias("ks"),
        )
    )


# ---------------------------------------------------------------------------
# Stump learning curve: training-set size vs held-out accuracy.
# ---------------------------------------------------------------------------

_LC_BUCKET_DUCK = (
    "CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS INTEGER)"
)
_LC_BUCKET_SPARK = (
    "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 2), 16, 10) AS INT)"
)
#: Training-pool fractions: md5 bucket < limit out of the 0..127 pool
#: (128 = the full pool); holdout is fixed at bucket >= 128.
_LC_LIMITS = (16, 32, 64, 128)


@QS.add(
    "ml_learning_curve",
    f"""
    WITH docs2 AS MATERIALIZED (
      SELECT doc_id, n_chars, lang, {_LC_BUCKET_DUCK} AS b FROM documents
    ),
    fracs AS (SELECT unnest(ARRAY{list(_LC_LIMITS)}) AS f),
    hist AS (
      SELECT fr.f, d.n_chars AS v, CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(SUM(CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
               AS pos
      FROM docs2 d JOIN fracs fr ON d.b < fr.f
      GROUP BY fr.f, d.n_chars
    ),
    walk AS (
      SELECT f, v,
             CAST(SUM(cnt) OVER (PARTITION BY f ORDER BY v
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_l,
             CAST(SUM(pos) OVER (PARTITION BY f ORDER BY v
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pos_l,
             CAST(SUM(cnt) OVER (PARTITION BY f) AS BIGINT) AS n,
             CAST(SUM(pos) OVER (PARTITION BY f) AS BIGINT) AS p
      FROM hist
    ),
    scored AS (
      SELECT f, v AS threshold, n_l, pos_l, n - n_l AS n_r,
             p - pos_l AS pos_r, n, p,
             CAST(pos_l * pos_l + (n_l - pos_l) * (n_l - pos_l) AS DOUBLE)
               / CAST(n_l AS DOUBLE)
             + CAST((p - pos_l) * (p - pos_l)
                    + ((n - n_l) - (p - pos_l)) * ((n - n_l) - (p - pos_l))
                    AS DOUBLE) / CAST(n - n_l AS DOUBLE) AS purity
      FROM walk WHERE n - n_l > 0
    ),
    stumps AS MATERIALIZED (
      SELECT f, threshold, n, pos_l * 2 > n_l AS pl,
             pos_r * 2 > n_r AS pr,
             CAST(GREATEST(pos_l, n_l - pos_l)
                  + GREATEST(pos_r, n_r - pos_r) AS DOUBLE)
               / CAST(n AS DOUBLE) AS train_accuracy
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY f
                        ORDER BY purity DESC, threshold) AS rk
            FROM scored)
      WHERE rk = 1
    ),
    hh AS MATERIALIZED (
      SELECT n_chars AS v, CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
               AS pos
      FROM docs2 WHERE b >= 128 GROUP BY n_chars
    ),
    ev AS (
      SELECT s.f, CAST(SUM(hh.cnt) AS BIGINT) AS n_holdout,
             CAST(SUM(CASE WHEN hh.v <= s.threshold THEN
                        CASE WHEN s.pl THEN hh.pos ELSE hh.cnt - hh.pos END
                      ELSE
                        CASE WHEN s.pr THEN hh.pos ELSE hh.cnt - hh.pos END
                      END) AS BIGINT) AS n_correct
      FROM stumps s CROSS JOIN hh GROUP BY s.f
    )
    SELECT s.f AS bucket_limit, s.n AS n_train, s.threshold,
           s.pl AS pred_left_en, s.pr AS pred_right_en,
           s.train_accuracy, e.n_holdout, e.n_correct,
           CAST(e.n_correct AS DOUBLE) / CAST(e.n_holdout AS DOUBLE)
             AS holdout_accuracy
    FROM stumps s JOIN ev e ON s.f = e.f
    """,
    doc="[EXT] learning curve of the Gini stump: refit on nested "
    "hash-deterministic training fractions (md5 bucket < 16/32/64/128 "
    "of the 0..127 pool) and score every fit on the FIXED bucket>=128 "
    "holdout — the sample-efficiency artifact that says whether more "
    "data would still buy accuracy. Candidate thresholds walk "
    "per-fraction value HISTOGRAMS with f-PARTITIONED windows (no "
    "global window at all — the fraction key partitions the walk); "
    "holdout evaluation is a 4x|values| conditional aggregate over the "
    "holdout histogram. Exact BIGINT counts, fixed-tree purity, "
    "accuracy divisions; md5 bucketing is the engine-portable sampler "
    "(round-2 rule).",
    tags=("ml",),
)
def ml_learning_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    docs = load(spark, sf_dir, "documents").selectExpr(
        "doc_id", "n_chars", "lang", f"{_LC_BUCKET_SPARK} AS b"
    ).localCheckpoint(eager=True)
    fracs = docs.sparkSession.createDataFrame(
        [(f,) for f in _LC_LIMITS], "f int"
    )
    hist = (
        docs.join(F.broadcast(fracs), docs["b"] < fracs["f"])
        .groupBy("f", F.col("n_chars").alias("v"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
            .cast("long")
            .alias("pos"),
        )
    )
    w_run = W.partitionBy("f").orderBy("v").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    w_all = W.partitionBy("f")
    walk = hist.select(
        "f",
        "v",
        F.sum("cnt").over(w_run).cast("long").alias("n_l"),
        F.sum("pos").over(w_run).cast("long").alias("pos_l"),
        F.sum("cnt").over(w_all).cast("long").alias("n"),
        F.sum("pos").over(w_all).cast("long").alias("p"),
    )
    scored = walk.filter(F.col("n") > F.col("n_l")).selectExpr(
        "f",
        "v AS threshold",
        "n_l",
        "pos_l",
        "n - n_l AS n_r",
        "p - pos_l AS pos_r",
        "n",
        "p",
        "CAST(pos_l * pos_l + (n_l - pos_l) * (n_l - pos_l) AS DOUBLE)"
        " / CAST(n_l AS DOUBLE)"
        " + CAST((p - pos_l) * (p - pos_l)"
        "        + ((n - n_l) - (p - pos_l)) * ((n - n_l) - (p - pos_l))"
        "        AS DOUBLE) / CAST(n - n_l AS DOUBLE) AS purity",
    )
    w_rk = W.partitionBy("f").orderBy(F.desc("purity"), F.asc("threshold"))
    stumps = (
        scored.withColumn("rk", F.row_number().over(w_rk))
        .filter(F.col("rk") == 1)
        .selectExpr(
            "f",
            "threshold",
            "n",
            "pos_l * 2 > n_l AS pl",
            "pos_r * 2 > n_r AS pr",
            "CAST(GREATEST(pos_l, n_l - pos_l)"
            " + GREATEST(pos_r, n_r - pos_r) AS DOUBLE)"
            " / CAST(n AS DOUBLE) AS train_accuracy",
        )
        .localCheckpoint(eager=True)
    )
    hh = (
        docs.filter(F.col("b") >= 128)
        .groupBy(F.col("n_chars").alias("v"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
            .cast("long")
            .alias("pos"),
        )
    )
    correct = F.when(
        F.col("v") <= F.col("threshold"),
        F.when(F.col("pl"), F.col("pos")).otherwise(F.col("cnt") - F.col("pos")),
    ).otherwise(
        F.when(F.col("pr"), F.col("pos")).otherwise(F.col("cnt") - F.col("pos"))
    )
    ev = (
        stumps.crossJoin(hh)
        .groupBy("f")
        .agg(
            F.sum("cnt").cast("long").alias("n_holdout"),
            F.sum(correct).cast("long").alias("n_correct"),
        )
    )
    return stumps.join(ev, "f").select(
        F.col("f").cast("int").alias("bucket_limit"),
        F.col("n").alias("n_train"),
        "threshold",
        F.col("pl").alias("pred_left_en"),
        F.col("pr").alias("pred_right_en"),
        "train_accuracy",
        "n_holdout",
        "n_correct",
        (
            F.col("n_correct").cast("double") / F.col("n_holdout").cast("double")
        ).alias("holdout_accuracy"),
    )


# ---------------------------------------------------------------------------
# McNemar's paired test: do the n_chars and n_tokens stumps have
# different error rates on the SAME documents?
# ---------------------------------------------------------------------------

_MCN_TOKS = r"regexp_split_to_array(lower(trim(text)), '\s+')"


def _mcn_stump_sql(feat: str) -> str:
    """Gini-stump CTE chain over an arbitrary integer feature expr."""
    return f"""
    hist_{feat} AS (
      SELECT fv AS v, CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
               AS pos
      FROM feats GROUP BY fv
    ),
    walk_{feat} AS (
      SELECT v,
             CAST(SUM(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS n_l,
             CAST(SUM(pos) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS pos_l,
             CAST(SUM(cnt) OVER () AS BIGINT) AS n,
             CAST(SUM(pos) OVER () AS BIGINT) AS p
      FROM hist_{feat}
    ),
    stump_{feat} AS MATERIALIZED (
      SELECT v AS t, pos_l * 2 > n_l AS pl, (p - pos_l) * 2 > n - n_l AS pr
      FROM (
        SELECT *, ROW_NUMBER() OVER (ORDER BY
          CAST(pos_l * pos_l + (n_l - pos_l) * (n_l - pos_l) AS DOUBLE)
            / CAST(n_l AS DOUBLE)
          + CAST((p - pos_l) * (p - pos_l)
                 + ((n - n_l) - (p - pos_l)) * ((n - n_l) - (p - pos_l))
                 AS DOUBLE) / CAST(n - n_l AS DOUBLE) DESC, v) AS rk
        FROM walk_{feat} WHERE n - n_l > 0
      ) WHERE rk = 1
    )"""


@QS.add(
    "ml_mcnemar_stumps",
    f"""
    WITH docs2 AS MATERIALIZED (
      SELECT doc_id, n_chars, len({_MCN_TOKS}) AS n_toks,
             lang = 'en' AS y FROM documents WHERE text IS NOT NULL
    ),
    feats AS (SELECT n_chars AS fv, CASE WHEN y THEN 'en' ELSE 'x' END
                AS lang FROM docs2),
    {_mcn_stump_sql('a')},
    feats_b AS (SELECT n_toks AS fv, CASE WHEN y THEN 'en' ELSE 'x' END
                  AS lang FROM docs2),
    hist_b AS (
      SELECT fv AS v, CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
               AS pos
      FROM feats_b GROUP BY fv
    ),
    walk_b AS (
      SELECT v,
             CAST(SUM(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS n_l,
             CAST(SUM(pos) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS pos_l,
             CAST(SUM(cnt) OVER () AS BIGINT) AS n,
             CAST(SUM(pos) OVER () AS BIGINT) AS p
      FROM hist_b
    ),
    stump_b AS MATERIALIZED (
      SELECT v AS t, pos_l * 2 > n_l AS pl, (p - pos_l) * 2 > n - n_l AS pr
      FROM (
        SELECT *, ROW_NUMBER() OVER (ORDER BY
          CAST(pos_l * pos_l + (n_l - pos_l) * (n_l - pos_l) AS DOUBLE)
            / CAST(n_l AS DOUBLE)
          + CAST((p - pos_l) * (p - pos_l)
                 + ((n - n_l) - (p - pos_l)) * ((n - n_l) - (p - pos_l))
                 AS DOUBLE) / CAST(n - n_l AS DOUBLE) DESC, v) AS rk
        FROM walk_b WHERE n - n_l > 0
      ) WHERE rk = 1
    ),
    scored AS (
      SELECT d.y,
             (CASE WHEN d.n_chars <= sa.t THEN sa.pl ELSE sa.pr END) = d.y
               AS ok_a,
             (CASE WHEN d.n_toks <= sb.t THEN sb.pl ELSE sb.pr END) = d.y
               AS ok_b
      FROM docs2 d CROSS JOIN stump_a sa CROSS JOIN stump_b sb
    ),
    cells AS (
      SELECT CAST(SUM(CASE WHEN ok_a AND ok_b THEN 1 ELSE 0 END) AS BIGINT)
               AS both_right,
             CAST(SUM(CASE WHEN ok_a AND NOT ok_b THEN 1 ELSE 0 END)
                  AS BIGINT) AS b_,
             CAST(SUM(CASE WHEN NOT ok_a AND ok_b THEN 1 ELSE 0 END)
                  AS BIGINT) AS c_,
             CAST(SUM(CASE WHEN NOT ok_a AND NOT ok_b THEN 1 ELSE 0 END)
                  AS BIGINT) AS both_wrong
      FROM scored
    )
    SELECT both_right, b_ AS only_a_right, c_ AS only_b_right, both_wrong,
           CASE WHEN b_ + c_ = 0 THEN NULL
                ELSE CAST((abs(b_ - c_) - 1) * (abs(b_ - c_) - 1) AS DOUBLE)
                     / CAST(b_ + c_ AS DOUBLE)
           END AS mcnemar_chi2
    FROM cells
    """,
    doc="[EXT] McNemar's paired test comparing TWO Gini stumps (n_chars "
    "vs whitespace token count) on the SAME documents — the correct "
    "are-these-models-different test when predictions are paired "
    "(accuracy deltas ignore the pairing and overstate significance). "
    "Both stumps refit with the ml_stump_nchars_lang argmax (identical "
    "purity tree, ties by threshold); the discordant cells b/c are "
    "exact BIGINTs and the continuity-corrected statistic "
    "(|b-c|-1)^2/(b+c) is ONE division (NULL when no discordant pairs "
    "— never a 0/0). Histogram walks bounded by each feature's value "
    "domain (GLOBAL_WINDOW_OK class); the per-doc scoring pass is one "
    "scan against two broadcast 1-row stumps.",
    tags=("ml", "stats"),
)
def ml_mcnemar_stumps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .selectExpr(
            "doc_id",
            "n_chars",
            r"size(split(lower(trim(text)), '\\s+')) AS n_toks",
            "lang = 'en' AS y",
        )
        .localCheckpoint(eager=True)
    )

    def stump(feat: str):
        hist = docs.groupBy(F.col(feat).alias("v")).agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.sum(F.when(F.col("y"), 1).otherwise(0)).cast("long").alias("pos"),
        )
        w_run = W.orderBy("v").rowsBetween(W.unboundedPreceding, W.currentRow)
        w_all = W.partitionBy()
        walk = hist.select(
            "v",
            F.sum("cnt").over(w_run).cast("long").alias("n_l"),
            F.sum("pos").over(w_run).cast("long").alias("pos_l"),
            F.sum("cnt").over(w_all).cast("long").alias("n"),
            F.sum("pos").over(w_all).cast("long").alias("p"),
        )
        scored = walk.filter(F.col("n") > F.col("n_l")).selectExpr(
            "v",
            "pos_l * 2 > n_l AS pl",
            "(p - pos_l) * 2 > n - n_l AS pr",
            "CAST(pos_l * pos_l + (n_l - pos_l) * (n_l - pos_l) AS DOUBLE)"
            " / CAST(n_l AS DOUBLE)"
            " + CAST((p - pos_l) * (p - pos_l)"
            "        + ((n - n_l) - (p - pos_l)) * ((n - n_l) - (p - pos_l))"
            "        AS DOUBLE) / CAST(n - n_l AS DOUBLE) AS purity",
        )
        w_rk = W.orderBy(F.desc("purity"), F.asc("v"))
        return (
            scored.withColumn("rk", F.row_number().over(w_rk))
            .filter(F.col("rk") == 1)
            .select(F.col("v").alias("t"), "pl", "pr")
        )

    sa = stump("n_chars").selectExpr("t AS ta", "pl AS pla", "pr AS pra")
    sb = stump("n_toks").selectExpr("t AS tb", "pl AS plb", "pr AS prb")
    scored = docs.crossJoin(F.broadcast(sa)).crossJoin(F.broadcast(sb)).select(
        (
            F.when(F.col("n_chars") <= F.col("ta"), F.col("pla")).otherwise(
                F.col("pra")
            )
            == F.col("y")
        ).alias("ok_a"),
        (
            F.when(F.col("n_toks") <= F.col("tb"), F.col("plb")).otherwise(
                F.col("prb")
            )
            == F.col("y")
        ).alias("ok_b"),
    )
    cells = scored.agg(
        F.sum(F.when(F.col("ok_a") & F.col("ok_b"), 1).otherwise(0))
        .cast("long")
        .alias("both_right"),
        F.sum(F.when(F.col("ok_a") & ~F.col("ok_b"), 1).otherwise(0))
        .cast("long")
        .alias("b_"),
        F.sum(F.when(~F.col("ok_a") & F.col("ok_b"), 1).otherwise(0))
        .cast("long")
        .alias("c_"),
        F.sum(F.when(~F.col("ok_a") & ~F.col("ok_b"), 1).otherwise(0))
        .cast("long")
        .alias("both_wrong"),
    )
    diff = F.abs(F.col("b_") - F.col("c_")) - 1
    return cells.select(
        "both_right",
        F.col("b_").alias("only_a_right"),
        F.col("c_").alias("only_b_right"),
        "both_wrong",
        F.when(F.col("b_") + F.col("c_") == 0, F.lit(None).cast("double"))
        .otherwise(
            (diff * diff).cast("double") / (F.col("b_") + F.col("c_")).cast("double")
        )
        .alias("mcnemar_chi2"),
    )
