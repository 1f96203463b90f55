"""Round-11 modeling family: seasonal/recurrence time-series models,
deterministic resampling inference, rank fusion, instance-based and
split-based learners, HITS link analysis, and data-quality profiling.

Design notes
------------
* Sequential recurrences (Holt-Winters, Wilder RSI) follow the round-10
  pinned-fold template: both engines run the identical left-fold over the
  day-ordered series — Spark ``aggregate`` with an ``array<double>``
  accumulator == DuckDB ``list_reduce`` with a ``DOUBLE[]`` accumulator
  (LIST, never STRUCT: DuckDB mutates struct accumulators in place,
  CLAUDE.md round-10 hazard). Every fold term is a fixed IEEE tree over
  exact integers (daily counts / cents), so intermediates are
  bit-identical and the queries carry full value hashes.
* The bootstrap avoids RNG entirely: replica weights are md5-derived
  (``conv(substr(md5(id||':'||b),1,2),16,10) % 3`` ∈ {0,1,2}) — the
  round-6 portable-hash-arithmetic pattern — and each replica mean is
  one division over exact BIGINT sums, evaluated as 2·B conditional
  aggregates in a single pass (no row blow-up, mergeable partials).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clinical_api_etl_spark.plans.base import QuerySet
from clinical_api_etl_spark.sources.catalog import load

QS = QuerySet()


# ---------------------------------------------------------------------------
# Holt-Winters additive seasonal smoothing (m=7) — sequential recurrence.
# ---------------------------------------------------------------------------

# lnew inlined wherever referenced (both engines inline the identical
# expression tree, so intermediates stay bit-equal; fold lambdas are
# interpreted per element — no codegen CSE concern at |days| scale).
_HW_L_DUCK = "(0.5e0 * (e[1] - acc[4]) + 0.5e0 * (acc[1] + acc[2]))"
_HW_L_SPARK = (
    "(0.5D * (y - element_at(acc, 4)) + 0.5D * (element_at(acc, 1) + element_at(acc, 2)))"
)


@QS.add(
    "ts_holt_winters_daily",
    f"""
    WITH daily AS (
      SELECT event_type, epoch_ms(ts) // 86400000 AS d,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY event_type, d
    ),
    series AS (
      SELECT event_type, list(CAST(y AS DOUBLE) ORDER BY d) AS ys
      FROM daily GROUP BY event_type
    ),
    init AS (
      -- week-1/week-2 init: integer-count sums are exact in DOUBLE, so
      -- l0/b0/s_i are single correctly-rounded ops — portable.
      SELECT event_type, ys, len(ys) AS n_days,
             list_reduce(ys[1:7], (a, x) -> a + x) / 7e0 AS l0,
             (list_reduce(ys[8:14], (a, x) -> a + x)
              - list_reduce(ys[1:7], (a, x) -> a + x)) / 49e0 AS b0
      FROM series WHERE len(ys) >= 14
    ),
    folded AS (
      SELECT event_type, n_days,
        list_reduce(
          list_concat(
            [[l0, b0, CAST(0 AS DOUBLE),
              ys[1] - l0, ys[2] - l0, ys[3] - l0, ys[4] - l0,
              ys[5] - l0, ys[6] - l0, ys[7] - l0]],
            list_transform(ys[8:], y -> [y])),
          (acc, e) -> list_concat(list_concat(
            [{_HW_L_DUCK},
             0.25e0 * ({_HW_L_DUCK} - acc[1]) + 0.75e0 * acc[2],
             acc[3] + (e[1] - (acc[1] + acc[2] + acc[4]))
                    * (e[1] - (acc[1] + acc[2] + acc[4]))],
            acc[5:10]),
            [0.25e0 * (e[1] - {_HW_L_DUCK}) + 0.75e0 * acc[4]])
        ) AS st
      FROM init
    )
    SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
           st[1] AS level, st[2] AS trend, st[4] AS seasonal_next,
           st[1] + st[2] + st[4] AS forecast_1, st[3] AS sse
    FROM folded
    """,
    doc="[EXT] additive Holt-Winters (level + trend + weekly seasonality, "
    "m=7, alpha=0.5 beta=0.25 gamma=0.25 — exact binary fractions) over "
    "the daily event-count series. Init: l0 = mean(week1), b0 = "
    "(mean(week2)-mean(week1))/7 expressed as one /49 division, s_i = "
    "y_i - l0; the fold runs over days 8..n with a 10-slot DOUBLE "
    "accumulator [l, b, sse, s1..s7] that rotates the seasonal ring "
    "each step. Extends the round-10 sequential-recurrence class to "
    "VECTOR state: both engines rebuild the accumulator list per step "
    "(all element expressions read the ORIGINAL accumulator — the "
    "DuckDB in-place-struct hazard does not apply to lists), so level/"
    "trend/seasonal/SSE are bit-identical. One shuffle to the per-type "
    "daily pre-aggregate; fold cost |days| per type, never |events|.",
    headline=True,
    tags=("timeseries", "stats"),
)
def ts_holt_winters_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.selectExpr("event_type", "unix_millis(ts) div 86400000 AS d")
        .groupBy("event_type", "d")
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )
    series = daily.groupBy("event_type").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(d, CAST(y AS DOUBLE) AS yv))),"
            " s -> s.yv)"
        ).alias("ys")
    )
    init = series.filter(F.size("ys") >= 14).selectExpr(
        "event_type",
        "ys",
        "size(ys) AS n_days",
        "aggregate(slice(ys, 1, 7), 0D, (a, x) -> a + x) / 7D AS l0",
        "(aggregate(slice(ys, 8, 7), 0D, (a, x) -> a + x)"
        " - aggregate(slice(ys, 1, 7), 0D, (a, x) -> a + x)) / 49D AS b0",
    )
    fold = f"""aggregate(
        slice(ys, 8, size(ys) - 7),
        array(l0, b0, 0D,
              element_at(ys, 1) - l0, element_at(ys, 2) - l0,
              element_at(ys, 3) - l0, element_at(ys, 4) - l0,
              element_at(ys, 5) - l0, element_at(ys, 6) - l0,
              element_at(ys, 7) - l0),
        (acc, y) -> concat(
          array({_HW_L_SPARK},
                0.25D * ({_HW_L_SPARK} - element_at(acc, 1))
                  + 0.75D * element_at(acc, 2),
                element_at(acc, 3)
                  + (y - (element_at(acc, 1) + element_at(acc, 2) + element_at(acc, 4)))
                  * (y - (element_at(acc, 1) + element_at(acc, 2) + element_at(acc, 4)))),
          slice(acc, 5, 6),
          array(0.25D * (y - {_HW_L_SPARK}) + 0.75D * element_at(acc, 4)))
      ) AS st"""
    return (
        init.selectExpr("event_type", "CAST(n_days AS BIGINT) AS n_days", fold)
        .selectExpr(
            "event_type",
            "n_days",
            "element_at(st, 1) AS level",
            "element_at(st, 2) AS trend",
            "element_at(st, 4) AS seasonal_next",
            "element_at(st, 1) + element_at(st, 2) + element_at(st, 4) AS forecast_1",
            "element_at(st, 3) AS sse",
        )
    )


# ---------------------------------------------------------------------------
# Wilder RSI (alpha = 1/16, binary) — sequential recurrence on cents deltas.
# ---------------------------------------------------------------------------


@QS.add(
    "ts_rsi_wilder_daily",
    """
    WITH daily AS (
      SELECT event_type, epoch_ms(ts) // 86400000 AS d,
             CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                  AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, d
    ),
    series AS (
      SELECT event_type, list(CAST(cents AS DOUBLE) ORDER BY d) AS cs
      FROM daily GROUP BY event_type
    ),
    deltas AS (
      SELECT event_type, len(cs) AS n_days,
             list_transform(range(1, len(cs)), i -> cs[i + 1] - cs[i]) AS ds
      FROM series WHERE len(cs) >= 18
    ),
    init AS (
      -- first 16 deltas seed the averages: integer sums / 2^4 are EXACT.
      SELECT event_type, n_days, ds,
        list_reduce(list_transform(ds[1:16], x -> greatest(x, 0e0)),
                    (a, x) -> a + x) / 16e0 AS g0,
        list_reduce(list_transform(ds[1:16], x -> greatest(-x, 0e0)),
                    (a, x) -> a + x) / 16e0 AS l0
      FROM deltas
    ),
    folded AS (
      SELECT event_type, n_days,
        list_reduce(
          list_concat([[g0, l0]], list_transform(ds[17:], x -> [x, 0e0])),
          (acc, e) -> [
            acc[1] + (greatest(e[1], 0e0) - acc[1]) * 0.0625e0,
            acc[2] + (greatest(-e[1], 0e0) - acc[2]) * 0.0625e0]
        ) AS st
      FROM init
    )
    SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
           st[1] AS avg_gain, st[2] AS avg_loss,
           CASE WHEN st[1] + st[2] = 0e0 THEN 50e0
                ELSE 100e0 * st[1] / (st[1] + st[2]) END AS rsi
    FROM folded
    """,
    doc="[EXT] Wilder-smoothed RSI over the daily cents-total series per "
    "event type, alpha = 1/16 (binary fraction; Wilder's 1/14 is not "
    "representable — the power-of-two neighbor keeps every smoothing "
    "step a pair of exact-scale ops). Day-over-day deltas are exact "
    "integer cents; the first 16 deltas seed avg gain/loss (integer "
    "sum / 2^4 — EXACT), then a two-slot [g, l] pinned fold consumes "
    "the rest. Final RSI = 100·g/(g+l) is one multiply + one division — "
    "fixed IEEE tree, hash-portable. Gaps in the daily series follow "
    "the trading-day convention (consecutive PRESENT days), identical "
    "in both engines by construction.",
    tags=("timeseries", "stats"),
)
def ts_rsi_wilder_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("value").isNotNull())
        .selectExpr(
            "event_type",
            "unix_millis(ts) div 86400000 AS d",
            "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c",
        )
        .groupBy("event_type", "d")
        .agg(F.sum("c").cast("long").alias("cents"))
    )
    series = daily.groupBy("event_type").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(d, CAST(cents AS DOUBLE)"
            " AS cv))), s -> s.cv)"
        ).alias("cs")
    )
    return (
        series.filter(F.size("cs") >= 18)
        .selectExpr(
            "event_type",
            "CAST(size(cs) AS BIGINT) AS n_days",
            "transform(sequence(1, size(cs) - 1),"
            " i -> element_at(cs, i + 1) - element_at(cs, i)) AS ds",
        )
        .selectExpr(
            "event_type",
            "n_days",
            "ds",
            "aggregate(transform(slice(ds, 1, 16), x -> greatest(x, 0D)),"
            " 0D, (a, x) -> a + x) / 16D AS g0",
            "aggregate(transform(slice(ds, 1, 16), x -> greatest(-x, 0D)),"
            " 0D, (a, x) -> a + x) / 16D AS l0",
        )
        .selectExpr(
            "event_type",
            "n_days",
            """aggregate(
                 slice(ds, 17, size(ds) - 16),
                 array(g0, l0),
                 (acc, x) -> array(
                   element_at(acc, 1)
                     + (greatest(x, 0D) - element_at(acc, 1)) * 0.0625D,
                   element_at(acc, 2)
                     + (greatest(-x, 0D) - element_at(acc, 2)) * 0.0625D)
               ) AS st""",
        )
        .selectExpr(
            "event_type",
            "n_days",
            "element_at(st, 1) AS avg_gain",
            "element_at(st, 2) AS avg_loss",
            "CASE WHEN element_at(st, 1) + element_at(st, 2) = 0D THEN 50D"
            " ELSE 100D * element_at(st, 1)"
            " / (element_at(st, 1) + element_at(st, 2)) END AS rsi",
        )
    )


# ---------------------------------------------------------------------------
# Deterministic (hash-multinomial) bootstrap CI for the mean.
# ---------------------------------------------------------------------------

_BOOT_B = 20


def _boot_w_duck(b: int) -> str:
    return (
        f"CAST('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':{b}'), 1, 2)"
        f" AS INTEGER) % 3"
    )


def _boot_w_spark(b: int) -> str:
    return (
        f"CAST(conv(substring(md5(CAST(event_id AS STRING) || ':{b}'), 1, 2),"
        f" 16, 10) AS INT) % 3"
    )


def _bootstrap_oracle() -> str:
    reps = ",\n".join(
        f"      CAST(SUM(({_boot_w_duck(b)}) * cents) AS BIGINT) AS num{b},\n"
        f"      CAST(SUM({_boot_w_duck(b)}) AS BIGINT) AS den{b}"
        for b in range(_BOOT_B)
    )
    means = ", ".join(
        f"CASE WHEN den{b} = 0 THEN CAST(snum AS DOUBLE) / CAST(n AS DOUBLE)"
        f" ELSE CAST(num{b} AS DOUBLE) / CAST(den{b} AS DOUBLE) END"
        for b in range(_BOOT_B)
    )
    return f"""
    WITH base AS (
      SELECT event_type, event_id,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL
    ),
    agg AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS snum,
{reps}
      FROM base GROUP BY event_type
    ),
    m AS (
      SELECT event_type, n,
             CAST(snum AS DOUBLE) / CAST(100 * n AS DOUBLE) AS mean_value,
             list_sort([{means}]) AS ms
      FROM agg
    )
    SELECT event_type, n, mean_value,
           ms[2] / 100e0 AS boot_lo, ms[{_BOOT_B - 1}] / 100e0 AS boot_hi
    FROM m
    """


@QS.add(
    "stat_bootstrap_ci_mean",
    _bootstrap_oracle(),
    doc="[EXT] bootstrap confidence interval for the mean event value per "
    "type with ZERO RNG: replica b reweights row i by "
    "md5(event_id||':'||b) % 3 in {0,1,2} (a deterministic multinomial-"
    "style resample, mean weight ≈ 1), so both engines draw the SAME "
    f"{_BOOT_B} replicas. Each replica mean is one division over exact "
    "BIGINT cents sums; the CI is the 2nd-smallest / 2nd-largest replica "
    "mean (≈ 5th/95th percentile of B=20). Evaluated as 2·B conditional "
    "aggregates in ONE pass over events — no row blow-up, map-side "
    "partials, mergeable at any scale.",
    headline=True,
    tags=("stats",),
)
def stat_bootstrap_ci_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    base = ev.filter(F.col("value").isNotNull()).selectExpr(
        "event_type",
        "event_id",
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents",
    )
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("snum"),
    ]
    for b in range(_BOOT_B):
        w = F.expr(_boot_w_spark(b))
        aggs.append(F.sum(w * F.col("cents")).cast("long").alias(f"num{b}"))
        aggs.append(F.sum(w).cast("long").alias(f"den{b}"))
    means = ", ".join(
        f"CASE WHEN den{b} = 0 THEN CAST(snum AS DOUBLE) / CAST(n AS DOUBLE)"
        f" ELSE CAST(num{b} AS DOUBLE) / CAST(den{b} AS DOUBLE) END"
        for b in range(_BOOT_B)
    )
    return (
        base.groupBy("event_type")
        .agg(*aggs)
        .selectExpr(
            "event_type",
            "n",
            "CAST(snum AS DOUBLE) / CAST(100 * n AS DOUBLE) AS mean_value",
            f"array_sort(array({means})) AS ms",
        )
        .selectExpr(
            "event_type",
            "n",
            "mean_value",
            "element_at(ms, 2) / 100D AS boot_lo",
            f"element_at(ms, {_BOOT_B - 1}) / 100D AS boot_hi",
        )
    )


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
# Column-uniqueness / null-fraction DQ profile across the star schema.
# ---------------------------------------------------------------------------

_UNIQ_COLS: dict[str, tuple[str, ...]] = {
    "orders": ("o_orderkey", "o_custkey", "o_orderstatus"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey", "l_returnflag"),
    "customer": ("c_custkey", "c_nationkey"),
    "documents": ("doc_id", "lang", "source"),
}


def _uniqueness_oracle() -> str:
    parts = []
    for tbl, cols in _UNIQ_COLS.items():
        for c in cols:
            parts.append(
                f"SELECT '{tbl}' AS tbl, '{c}' AS col_name,"
                f" CAST(COUNT(*) AS BIGINT) AS n_rows,"
                f" CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,"
                f" CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,"
                f" CAST(COUNT(DISTINCT {c}) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)"
                f" AS uniqueness"
                f" FROM {tbl}"
            )
    return " UNION ALL ".join(parts)


@QS.add(
    "dq_uniqueness_profile",
    _uniqueness_oracle(),
    doc="[EXT] column uniqueness/null profile over a declared column set "
    "of the star schema: per (table, column) exact distinct count, null "
    "count, and uniqueness ratio (one division over exact BIGINTs). "
    "Spark runs ONE pass per table (multi-distinct aggregate -> Expand, "
    "map-side partials) and stacks to long format; the oracle is the "
    "equivalent per-column UNION ALL. Key columns profile at 1.0 "
    "uniqueness — the generalized form of the reference's unique-key "
    "constraints (database/05_processed_measurements.sql uq_pm_obs).",
    tags=("dq",),
)
def dq_uniqueness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for tbl, cols in _UNIQ_COLS.items():
        df = load(spark, sf_dir, tbl)
        aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
        for c in cols:
            aggs.append(F.countDistinct(c).cast("long").alias(f"d_{c}"))
            aggs.append(
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
                .cast("long")
                .alias(f"z_{c}")
            )
        wide = df.agg(*aggs)
        stack = ", ".join(f"'{c}', d_{c}, z_{c}" for c in cols)
        long = wide.selectExpr(
            f"'{tbl}' AS tbl",
            "n_rows",
            f"stack({len(cols)}, {stack}) AS (col_name, n_distinct, n_nulls)",
        ).selectExpr(
            "tbl",
            "col_name",
            "n_rows",
            "n_distinct",
            "n_nulls",
            "CAST(n_distinct AS DOUBLE) / CAST(n_rows AS DOUBLE) AS uniqueness",
        )
        out = long if out is None else out.unionByName(long)
    return out


# ---------------------------------------------------------------------------
# HITS hubs & authorities — 10th fully hash-gated iterative algorithm.
# ---------------------------------------------------------------------------

_HITS_ITERS = 3
_HITS_SCALE = 1_000_000


def _hits_oracle() -> str:
    its = []
    for k in range(1, _HITS_ITERS + 1):
        its.append(
            f"""
    a{k}raw AS MATERIALIZED (
      SELECT s, CAST(SUM(h) AS BIGINT) AS ar
      FROM e JOIN h{k - 1} USING (c) GROUP BY s),
    a{k} AS MATERIALIZED (
      SELECT s, CAST(ar * {_HITS_SCALE} // (SELECT SUM(ar) FROM a{k}raw)
                AS BIGINT) AS a
      FROM a{k}raw),
    h{k}raw AS MATERIALIZED (
      SELECT c, CAST(SUM(a) AS BIGINT) AS hr
      FROM e JOIN a{k} USING (s) GROUP BY c),
    h{k} AS MATERIALIZED (
      SELECT c, CAST(hr * {_HITS_SCALE} // (SELECT SUM(hr) FROM h{k}raw)
                AS BIGINT) AS h
      FROM h{k}raw)"""
        )
    return f"""
    WITH e AS MATERIALIZED (
      SELECT DISTINCT o_custkey AS c, l_suppkey AS s
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    h0 AS (SELECT DISTINCT c, CAST({_HITS_SCALE} AS BIGINT) AS h FROM e),
    {",".join(its)}
    SELECT 'c' || CAST(c AS VARCHAR) AS node, 'hub' AS kind,
           h AS score_units FROM h{_HITS_ITERS}
    UNION ALL
    SELECT 's' || CAST(s AS VARCHAR) AS node, 'auth' AS kind,
           a AS score_units FROM a{_HITS_ITERS}
    """


@QS.add(
    "graph_hits_scores",
    _hits_oracle(),
    doc="[EXT] HITS (Kleinberg) hubs & authorities over the directed "
    "customer->supplier purchase graph, 3 iterations in EXACT integer "
    "arithmetic: scores L1-normalize to 1e6 units per half-step via "
    "BIGINT floor-division, so both engines agree bit-for-bit — the "
    "10th iterative algorithm under a full value hash. Spark: each "
    "half-step is one score-vector equi-join + one key shuffle with "
    "map-side partials; the raw aggregate is referenced twice (total + "
    "normalization) so it eager-checkpoints per half-step (k-core "
    "rule), and the total rides a 1-row broadcast cross join. Oracle: "
    "unrolled CTE chain, every stage MATERIALIZED (the round-6 "
    "exponential-re-expansion rule). operators/graph.py:hits_int.",
    headline=True,
    tags=("graph",),
)
def graph_hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.graph import hits_int

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    e = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    return hits_int(e, iters=_HITS_ITERS, scale=_HITS_SCALE)


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
# Harmonic centrality of a supplier probe set — exact x12 integer units.
# (+ the classic closeness variant on the same BFS, one division.)
# ---------------------------------------------------------------------------

_HC_ITERS = 4


def _harmonic_oracle() -> str:
    """Unrolled per-source BFS; every it{k} referenced twice -> MATERIALIZED.
    Harmonic sum stays exact: with hop distances bounded by the iteration
    count (<= 4), 12/d is an exact integer (12 = lcm(1..4)), so the
    centrality numerator is a BIGINT and the final value one division."""
    it = """
    it{k} AS MATERIALIZED (
      SELECT s, node, CAST(MIN(dist) AS BIGINT) AS dist FROM (
        SELECT s, node, dist FROM it{p}
        UNION ALL
        SELECT r.s, e.dst AS node, r.dist + 1 AS dist
        FROM edges e JOIN it{p} r ON e.src = r.node
      ) u GROUP BY s, node
    )"""
    its = ",".join(it.format(k=k, p=k - 1) for k in range(1, _HC_ITERS + 1))
    return f"""
    WITH e0 AS MATERIALIZED (
      SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                      's' || CAST(l_suppkey AS VARCHAR) AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    edges AS MATERIALIZED (
      SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0
    ),
    it0 AS MATERIALIZED (
      SELECT 's' || CAST(s_suppkey AS VARCHAR) AS s,
             's' || CAST(s_suppkey AS VARCHAR) AS node, CAST(0 AS BIGINT) AS dist
      FROM supplier WHERE s_suppkey < 8
    ),
    {its}
    SELECT s AS source_node,
           CAST(COUNT(*) - 1 AS BIGINT) AS n_reached,
           CAST(SUM(CASE WHEN dist > 0 THEN 12 // dist ELSE 0 END)
                AS BIGINT) AS harmonic_x12,
           CAST(SUM(CASE WHEN dist > 0 THEN 12 // dist ELSE 0 END) AS DOUBLE)
             / 12e0 AS harmonic
    FROM it{_HC_ITERS} GROUP BY s
    """


@QS.add(
    "graph_harmonic_centrality",
    _harmonic_oracle(),
    doc="[EXT] harmonic centrality (sum of 1/d to every reachable node, "
    "the disconnect-safe closeness variant) for a supplier probe set "
    "(fixed 8-supplier probe — bounded at every SF; centrality probes "
    "are bounded sets by posture) over the symmetrized interaction graph, "
    f"within {_HC_ITERS} hops. EXACT arithmetic trick: hop distances "
    "are bounded by the iteration count, so multiplying by lcm(1..4)=12 "
    "makes the harmonic sum an exact BIGINT (12//d per term) and the "
    "final centrality ONE division — no float association anywhere. "
    "One tagged BFS run covers the whole probe set: state keyed "
    "(source, node), same Pregel join+min rounds as bfs_hops "
    "(operators/graph.py:bfs_hops_per_source), eager-checkpointed per "
    "round. 11th hash-gated iterative.",
    headline=True,
    tags=("graph", "iterative"),
)
def graph_harmonic_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.graph import bfs_hops_per_source

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
        .filter(F.col("s_suppkey") < 8)
        .select(F.concat(F.lit("s"), F.col("s_suppkey").cast("string")).alias("node"))
    )
    dist = bfs_hops_per_source(edges, sources, iters=_HC_ITERS)
    return dist.groupBy(F.col("s").alias("source_node")).agg(
        (F.count(F.lit(1)) - 1).cast("long").alias("n_reached"),
        F.sum(
            F.when(F.col("dist") > 0, F.expr("12 div dist")).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("harmonic_x12"),
        (
            F.sum(
                F.when(F.col("dist") > 0, F.expr("12 div dist")).otherwise(F.lit(0))
            ).cast("double")
            / F.lit(12.0)
        ).alias("harmonic"),
    )


def _closeness_oracle() -> str:
    """Same unrolled per-source BFS as harmonic; the aggregate is the
    classic closeness numerator/denominator instead of the x12 sum."""
    it = """
    it{k} AS MATERIALIZED (
      SELECT s, node, CAST(MIN(dist) AS BIGINT) AS dist FROM (
        SELECT s, node, dist FROM it{p}
        UNION ALL
        SELECT r.s, e.dst AS node, r.dist + 1 AS dist
        FROM edges e JOIN it{p} r ON e.src = r.node
      ) u GROUP BY s, node
    )"""
    its = ",".join(it.format(k=k, p=k - 1) for k in range(1, _HC_ITERS + 1))
    return f"""
    WITH e0 AS MATERIALIZED (
      SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                      's' || CAST(l_suppkey AS VARCHAR) AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    edges AS MATERIALIZED (
      SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0
    ),
    it0 AS MATERIALIZED (
      SELECT 's' || CAST(s_suppkey AS VARCHAR) AS s,
             's' || CAST(s_suppkey AS VARCHAR) AS node, CAST(0 AS BIGINT) AS dist
      FROM supplier WHERE s_suppkey < 8
    ),
    {its}
    SELECT s AS source_node,
           CAST(COUNT(*) - 1 AS BIGINT) AS n_reached,
           CAST(SUM(dist) AS BIGINT) AS sum_dist,
           CASE WHEN SUM(dist) = 0 THEN NULL
                ELSE CAST(COUNT(*) - 1 AS DOUBLE) / CAST(SUM(dist) AS DOUBLE)
           END AS closeness
    FROM it{_HC_ITERS} GROUP BY s
    """


@QS.add(
    "graph_closeness_probe",
    _closeness_oracle(),
    doc="[EXT] closeness centrality (reached-nodes count over summed hop "
    "distances — the Wasserman-Faust bounded-reach form) for the same "
    "8-supplier probe set and symmetrized interaction graph as "
    f"graph_harmonic_centrality, within {_HC_ITERS} hops. Components "
    "are exact BIGINTs off ONE tagged per-source BFS "
    "(bfs_hops_per_source — the run is shared work-shape-wise with "
    "harmonic, not plan-shared, so each query stays independently "
    "checkable); closeness = (n_reached-1)/sum_dist is ONE division, "
    "NULL on an isolated probe (ANSI-divide rule). Harmonic is the "
    "disconnect-safe variant; classic closeness is what most "
    "centrality consumers still ask for first.",
    tags=("graph", "iterative"),
)
def graph_closeness_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.graph import (
        bfs_hops_per_source,
        symmetrize,
    )

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
    edges = symmetrize(e0)
    sources = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") < 8)
        .select(F.concat(F.lit("s"), F.col("s_suppkey").cast("string")).alias("node"))
    )
    dist = bfs_hops_per_source(edges, sources, iters=_HC_ITERS)
    return dist.groupBy(F.col("s").alias("source_node")).agg(
        (F.count(F.lit(1)) - 1).cast("long").alias("n_reached"),
        F.sum("dist").cast("long").alias("sum_dist"),
        F.when(F.sum("dist") == 0, F.lit(None))
        .otherwise(
            (F.count(F.lit(1)) - 1).cast("double")
            / F.sum("dist").cast("double")
        )
        .alias("closeness"),
    )


# ---------------------------------------------------------------------------
# Bollinger-band breaches on the daily cents series — exact integer algebra.
# ---------------------------------------------------------------------------


@QS.add(
    "ts_bollinger_breaches",
    """
    WITH daily AS (
      SELECT event_type, epoch_ms(ts) // 86400000 AS d,
             CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                  AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, d
    ),
    win AS (
      SELECT event_type, d, cents,
             CAST(SUM(cents) OVER w AS BIGINT) AS s7,
             CAST(SUM(cents * cents) OVER w AS BIGINT) AS q7,
             CAST(COUNT(*) OVER w AS BIGINT) AS n7
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY d
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, d AS day_index, cents,
           CAST(s7 AS DOUBLE) / 7e0 AS mean7,
           7 * cents - s7 > 0
             AND (7 * cents - s7) * (7 * cents - s7) > 4 * (7 * q7 - s7 * s7)
             AS breach_upper,
           s7 - 7 * cents > 0
             AND (7 * cents - s7) * (7 * cents - s7) > 4 * (7 * q7 - s7 * s7)
             AS breach_lower
    FROM win WHERE n7 = 7
    """,
    doc="[EXT] Bollinger-band breach detection on the trailing-7-day "
    "window of the daily cents series: |x - mu| > 2*sigma decided "
    "ENTIRELY in exact integer algebra — (7x - S)^2 > 4(7Q - S^2) with "
    "S, Q the window sum and sum-of-squares (the anomaly_zscore "
    "population-variance identity moved into a moving frame; "
    "n*sigma^2*n = nQ - S^2). Only full windows emit. The band test "
    "never touches a float; mean7 is the single reporting division. "
    "One exchange per type, two running sums share one WindowExec.",
    tags=("timeseries", "stats"),
)
def ts_bollinger_breaches(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = load(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("value").isNotNull())
        .selectExpr(
            "event_type",
            "unix_millis(ts) div 86400000 AS d",
            "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c",
        )
        .groupBy("event_type", "d")
        .agg(F.sum("c").cast("long").alias("cents"))
    )
    w = W.partitionBy("event_type").orderBy("d").rowsBetween(-6, 0)
    win = daily.select(
        "event_type",
        "d",
        "cents",
        F.sum("cents").over(w).cast("long").alias("s7"),
        F.sum(F.col("cents") * F.col("cents")).over(w).cast("long").alias("q7"),
        F.count(F.lit(1)).over(w).cast("long").alias("n7"),
    )
    return win.filter(F.col("n7") == 7).selectExpr(
        "event_type",
        "d AS day_index",
        "cents",
        "CAST(s7 AS DOUBLE) / 7D AS mean7",
        "7 * cents - s7 > 0"
        " AND (7 * cents - s7) * (7 * cents - s7) > 4 * (7 * q7 - s7 * s7)"
        " AS breach_upper",
        "s7 - 7 * cents > 0"
        " AND (7 * cents - s7) * (7 * cents - s7) > 4 * (7 * q7 - s7 * s7)"
        " AS breach_lower",
    )


# ---------------------------------------------------------------------------
# Deterministic fixed-size per-group sample (hash-order "reservoir").
# ---------------------------------------------------------------------------


@QS.add(
    "sample_reservoir_hash",
    """
    WITH keyed AS (
      SELECT event_type, event_id, user_id,
             substr(md5(CAST(event_id AS VARCHAR)), 1, 8) AS hk
      FROM events
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                   ORDER BY hk, event_id) AS rk
      FROM keyed
    )
    SELECT event_type, CAST(rk AS BIGINT) AS rk, event_id, user_id
    FROM ranked WHERE rk <= 50
    """,
    doc="[EXT] fixed-size-per-group deterministic sample: the 50 events "
    "with the smallest md5(event_id) hex prefix per type — the "
    "distributed, rerun-stable equivalent of per-group reservoir "
    "sampling (uniform over any id distribution because md5 order is "
    "independent of insertion/value order; fixed-width lowercase hex "
    "compares lexicographically == numerically, round-2 rule). "
    "Complements hash-Bernoulli (fixed RATE) with fixed SIZE semantics. "
    "One window per group; at scale the rank-50 cut is a per-partition "
    "top-k before the final per-group merge (TakeOrdered-style partial "
    "aggregation inside WindowGroupLimit).",
    tags=("sampling",),
)
def sample_reservoir_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = load(spark, sf_dir, "events")
    keyed = ev.select(
        "event_type",
        "event_id",
        "user_id",
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 8).alias("hk"),
    )
    w = W.partitionBy("event_type").orderBy("hk", "event_id")
    return (
        keyed.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 50)
        .select("event_type", "rk", "event_id", "user_id")
    )


# ---------------------------------------------------------------------------
# CDC apply: last-writer-wins snapshot of an upsert/delete change log.
# ---------------------------------------------------------------------------


@QS.add(
    "cdc_last_writer_wins",
    """
    WITH log AS (
      SELECT user_id, ts, event_id, event_type,
             -- sentinel, not NULL: a null BIGINT turns into NaN through
             -- pandas and breaks the value hash (CLAUDE.md rule)
             COALESCE(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT),
                      -1) AS cents
      FROM events
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rk,
             CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_changes
      FROM log
    )
    SELECT user_id, epoch_ms(ts) AS last_ts_ms, event_type AS last_type,
           cents AS last_cents, n_changes,
           event_type = 'error' AS is_tombstone
    FROM ranked WHERE rk = 1
    """,
    doc="[EXT] CDC apply-changes: treat the event stream as an upsert "
    "change log keyed by user, ordered by (ts, event_id) — last writer "
    "wins, 'error' as the tombstone op (Debezium/Delta "
    "APPLY CHANGES INTO semantics: the snapshot keeps the tombstone "
    "row flagged so downstream merges can delete). One window per key "
    "computes the winner AND the change count; total order under ts "
    "ties via event_id. The deterministic-ordering requirement is "
    "exactly the reference's idempotent-upsert discipline "
    "(etl-service/src/etl.py ON CONFLICT upserts) generalized to "
    "change streams.",
    tags=("warehouse", "cdc"),
)
def cdc_last_writer_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = load(spark, sf_dir, "events")
    log = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.expr(
            "COALESCE(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT), -1)"
        ).alias("cents"),
    )
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    w_n = W.partitionBy("user_id")
    return (
        log.withColumn("rk", F.row_number().over(w))
        .withColumn("n_changes", F.count(F.lit(1)).over(w_n).cast("long"))
        .filter(F.col("rk") == 1)
        .select(
            "user_id",
            F.expr("unix_millis(ts)").alias("last_ts_ms"),
            F.col("event_type").alias("last_type"),
            F.col("cents").alias("last_cents"),
            "n_changes",
            (F.col("event_type") == "error").alias("is_tombstone"),
        )
    )


# ---------------------------------------------------------------------------
# Shortest-path counts (Brandes sigma) from a bounded probe set.
# ---------------------------------------------------------------------------

_SPC_ITERS = 4


def _path_counts_oracle() -> str:
    """Unrolled frontier BFS with path counting: lvl{k} holds the nodes
    FIRST reached at hop k with sigma = sum of level-(k-1) predecessor
    sigmas; set{k} accumulates the settled state used to reject
    re-discoveries. Every CTE is referenced more than once downstream ->
    all MATERIALIZED (the k-core exponential-re-expansion rule)."""
    step = """
    lvl{k} AS MATERIALIZED (
      SELECT c.s, c.node, CAST({k} AS BIGINT) AS dist, c.sigma FROM (
        SELECT r.s, e.dst AS node, CAST(SUM(r.sigma) AS BIGINT) AS sigma
        FROM edges e JOIN lvl{p} r ON e.src = r.node
        GROUP BY r.s, e.dst
      ) c LEFT JOIN set{p} st ON st.s = c.s AND st.node = c.node
      WHERE st.node IS NULL
    ),
    set{k} AS MATERIALIZED (
      SELECT s, node FROM set{p} UNION ALL SELECT s, node FROM lvl{k}
    )"""
    its = ",".join(step.format(k=k, p=k - 1) for k in range(1, _SPC_ITERS + 1))
    union_all = " UNION ALL ".join(
        f"SELECT s, node, dist, sigma FROM lvl{k}" for k in range(_SPC_ITERS + 1)
    )
    return f"""
    WITH e0 AS MATERIALIZED (
      SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                      's' || CAST(l_suppkey AS VARCHAR) AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    edges AS MATERIALIZED (
      SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0
    ),
    lvl0 AS MATERIALIZED (
      SELECT 's' || CAST(s_suppkey AS VARCHAR) AS s,
             's' || CAST(s_suppkey AS VARCHAR) AS node,
             CAST(0 AS BIGINT) AS dist, CAST(1 AS BIGINT) AS sigma
      FROM supplier WHERE s_suppkey < 8
    ),
    set0 AS MATERIALIZED (SELECT s, node FROM lvl0),
    {its}
    SELECT s AS source_node, node, dist, sigma FROM ({union_all}) u
    """


@QS.add(
    "graph_path_counts",
    _path_counts_oracle(),
    doc="[EXT] exact shortest-path COUNTS (Brandes sigma, the forward "
    "half of betweenness centrality) from the fixed 8-supplier probe "
    "set over the symmetrized interaction graph, within "
    f"{_SPC_ITERS} hops. sigma(v) at level k+1 = SUM of sigma over "
    "level-k predecessors — path counts are sums of exact BIGINTs, so "
    "the whole computation is integer arithmetic and carries a full "
    "value hash (12th hash-gated iterative). Frontier discipline: each "
    "(source, node) pair crosses the edge join exactly once over the "
    "run (operators/graph.py:bfs_path_counts); equal-level and backward "
    "edges die in the settled anti-join, matching the Brandes BFS DAG. "
    "Oracle: unrolled frontier levels + settled sets, all MATERIALIZED.",
    headline=True,
    tags=("graph", "iterative"),
)
def graph_path_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.graph import bfs_path_counts

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
        .filter(F.col("s_suppkey") < 8)
        .select(F.concat(F.lit("s"), F.col("s_suppkey").cast("string")).alias("node"))
    )
    st = bfs_path_counts(edges, sources, iters=_SPC_ITERS)
    return st.select(
        F.col("s").alias("source_node"), "node", "dist", "sigma"
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


# ---------------------------------------------------------------------------
# Brandes dependency accumulation — k-bounded betweenness (backward pass).
# ---------------------------------------------------------------------------


def _betweenness_oracle() -> str:
    """Forward unrolled frontier levels (as in _path_counts_oracle), then
    the backward dependency CTEs d{k}: each node's delta folds its
    successors' (sigma_v/sigma_w)(1+delta_w) in successor-id order —
    the pinned-order float fold, applied level by level downward."""
    fwd_step = """
    lvl{k} AS MATERIALIZED (
      SELECT c.s, c.node, CAST({k} AS BIGINT) AS dist, c.sigma FROM (
        SELECT r.s, e.dst AS node, CAST(SUM(r.sigma) AS BIGINT) AS sigma
        FROM edges e JOIN lvl{p} r ON e.src = r.node
        GROUP BY r.s, e.dst
      ) c LEFT JOIN set{p} st ON st.s = c.s AND st.node = c.node
      WHERE st.node IS NULL
    ),
    set{k} AS MATERIALIZED (
      SELECT s, node FROM set{p} UNION ALL SELECT s, node FROM lvl{k}
    )"""
    fwd = ",".join(fwd_step.format(k=k, p=k - 1) for k in range(1, _SPC_ITERS + 1))
    bwd_step = """
    f{k} AS MATERIALIZED (
      SELECT v.s, v.node,
             list_reduce(
               list_prepend(CAST(0 AS DOUBLE),
                 list((CAST(v.sigma AS DOUBLE) / CAST(w.sigma AS DOUBLE))
                      * (1e0 + w.delta) ORDER BY w.node)),
               (x, y) -> x + y) AS delta
      FROM lvl{k} v JOIN edges e ON e.src = v.node
      JOIN (SELECT l.s, l.node, l.sigma, dd.delta
            FROM lvl{n} l JOIN d{n} dd ON l.s = dd.s AND l.node = dd.node) w
        ON w.s = v.s AND w.node = e.dst
      GROUP BY v.s, v.node, v.sigma
    ),
    d{k} AS MATERIALIZED (
      SELECT l.s, l.node, COALESCE(f.delta, CAST(0 AS DOUBLE)) AS delta
      FROM lvl{k} l LEFT JOIN f{k} f ON f.s = l.s AND f.node = l.node
    )"""
    bwd = ",".join(
        bwd_step.format(k=k, n=k + 1) for k in range(_SPC_ITERS - 1, -1, -1)
    )
    finals = " UNION ALL ".join(
        f"SELECT l.s, l.node, l.dist, l.sigma, d.delta FROM lvl{k} l "
        f"JOIN d{k} d ON d.s = l.s AND d.node = l.node"
        for k in range(_SPC_ITERS + 1)
    )
    return f"""
    WITH e0 AS MATERIALIZED (
      SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                      's' || CAST(l_suppkey AS VARCHAR) AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    edges AS MATERIALIZED (
      SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0
    ),
    lvl0 AS MATERIALIZED (
      SELECT 's' || CAST(s_suppkey AS VARCHAR) AS s,
             's' || CAST(s_suppkey AS VARCHAR) AS node,
             CAST(0 AS BIGINT) AS dist, CAST(1 AS BIGINT) AS sigma
      FROM supplier WHERE s_suppkey < 8
    ),
    set0 AS MATERIALIZED (SELECT s, node FROM lvl0),
    {fwd},
    d{_SPC_ITERS} AS MATERIALIZED (
      SELECT s, node, CAST(0 AS DOUBLE) AS delta FROM lvl{_SPC_ITERS}
    ),
    {bwd}
    SELECT s AS source_node, node, dist, sigma, delta FROM ({finals}) u
    """


@QS.add(
    "graph_betweenness_probe",
    _betweenness_oracle(),
    doc="[EXT] Brandes dependency accumulation — the BACKWARD half of "
    "betweenness centrality, completing graph_path_counts' forward "
    "pass: delta(v) = sum over one-level-deeper successors of "
    "(sigma_v/sigma_w)(1+delta_w), run level-by-level from the horizon "
    f"down (k-bounded betweenness, horizon {_SPC_ITERS}: longer paths "
    "do not contribute — the standard truncation for probe-set "
    "centrality). 13th hash-gated iterative, and the first with FLOAT "
    "state: sigma ratios are single divisions over exact BIGINTs and "
    "every successor sum is a pinned-order fold (successor-id-sorted), "
    "so deltas are bit-identical level after level. Operator: "
    "operators/graph.py:brandes_dependencies (per-level equi-join + "
    "grouped fold, eager-checkpointed). Oracle: forward frontier CTEs + "
    "unrolled backward d{k} chain, all MATERIALIZED.",
    headline=True,
    tags=("graph", "iterative"),
)
def graph_betweenness_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.graph import brandes_dependencies

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
        .filter(F.col("s_suppkey") < 8)
        .select(F.concat(F.lit("s"), F.col("s_suppkey").cast("string")).alias("node"))
    )
    dep = brandes_dependencies(edges, sources, iters=_SPC_ITERS)
    return dep.select(
        F.col("s").alias("source_node"), "node", "dist", "sigma", "delta"
    )


# ---------------------------------------------------------------------------
# Bounded-hop weighted shortest paths (Bellman-Ford) — exact BIGINT costs.
# ---------------------------------------------------------------------------

_BF_ITERS = 4


def _bf_oracle() -> str:
    """Full-relaxation unrolled Bellman-Ford: it{k} = min total weight
    over paths of <= k edges — the same fixpoint the queue-optimized
    operator reaches after k rounds (every improvement propagates the
    following round). Every it{k} referenced twice -> MATERIALIZED."""
    it = """
    it{k} AS MATERIALIZED (
      SELECT s, node, CAST(MIN(dist) AS BIGINT) AS dist FROM (
        SELECT s, node, dist FROM it{p}
        UNION ALL
        SELECT r.s, e.dst AS node, r.dist + e.w AS dist
        FROM edges e JOIN it{p} r ON e.src = r.node
      ) u GROUP BY s, node
    )"""
    its = ",".join(it.format(k=k, p=k - 1) for k in range(1, _BF_ITERS + 1))
    return f"""
    WITH w0 AS MATERIALIZED (
      SELECT 'c' || CAST(o_custkey AS VARCHAR) AS src,
             's' || CAST(l_suppkey AS VARCHAR) AS dst,
             CAST(COUNT(*) AS BIGINT) AS w
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_custkey, l_suppkey
    ),
    edges AS MATERIALIZED (
      SELECT src, dst, w FROM w0 UNION ALL SELECT dst AS src, src AS dst, w FROM w0
    ),
    it0 AS MATERIALIZED (
      SELECT 's' || CAST(s_suppkey AS VARCHAR) AS s,
             's' || CAST(s_suppkey AS VARCHAR) AS node, CAST(0 AS BIGINT) AS dist
      FROM supplier WHERE s_suppkey < 8
    ),
    {its}
    SELECT s AS source_node, node, dist AS cost FROM it{_BF_ITERS}
    """


@QS.add(
    "graph_weighted_shortest_paths",
    _bf_oracle(),
    doc="[EXT] bounded-hop WEIGHTED shortest paths (Bellman-Ford, "
    f"{_BF_ITERS} relaxation rounds) from the 8-supplier probe set: "
    "edge weight = lineitem count per (customer, supplier) pair "
    "(symmetrized), costs exact BIGINT sums — 14th hash-gated "
    "iterative. The operator is queue-optimized (SPFA): only nodes "
    "whose distance improved re-enter the edge join, which preserves "
    "the <=k-edge minimum invariant because every improvement "
    "propagates the next round; the oracle runs the plain full "
    "relaxation and meets the same fixpoint — the test of the "
    "equivalence claim IS the hash gate. operators/graph.py:"
    "bellman_ford_bounded.",
    headline=True,
    tags=("graph", "iterative"),
)
def graph_weighted_shortest_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.graph import bellman_ford_bounded

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    w0 = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_custkey", "l_suppkey")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
            "w",
        )
    )
    edges = w0.union(
        w0.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    )
    sources = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") < 8)
        .select(F.concat(F.lit("s"), F.col("s_suppkey").cast("string")).alias("node"))
    )
    st = bellman_ford_bounded(edges, sources, iters=_BF_ITERS)
    return st.select(
        F.col("s").alias("source_node"), "node", F.col("dist").alias("cost")
    )


@QS.add(
    "ml_conformal_interval",
    """
    WITH e AS (
      SELECT event_type, event_id,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
             substr(md5(CAST(event_id AS VARCHAR)), 1, 1) AS h
      FROM events WHERE value IS NOT NULL
    ),
    tr AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_train,
                  CAST(SUM(cents) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                    AS mu
           FROM e WHERE h <= '7' GROUP BY event_type),
    ca AS (
      SELECT e.event_type, e.event_id,
             ABS(CAST(e.cents AS DOUBLE) - tr.mu) AS resid
      FROM e JOIN tr USING (event_type)
      WHERE e.h >= '8' AND e.h <= 'b'
    ),
    car AS (
      SELECT event_type, resid,
             ROW_NUMBER() OVER (PARTITION BY event_type
               ORDER BY resid, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n_calib
      FROM ca
    ),
    q AS (
      SELECT event_type, CAST(MAX(n_calib) AS BIGINT) AS n_calib,
             MAX(CASE WHEN rn = LEAST(
                   (9 * (n_calib + 1) + 9) // 10, n_calib)
                 THEN resid END) AS q_hat
      FROM car GROUP BY event_type
    ),
    te AS (
      SELECT e.event_type,
             CAST(COUNT(*) AS BIGINT) AS n_test,
             CAST(SUM(CASE WHEN ABS(CAST(e.cents AS DOUBLE) - tr.mu)
                                <= q.q_hat THEN 1 ELSE 0 END) AS BIGINT)
               AS n_covered
      FROM e JOIN tr USING (event_type) JOIN q USING (event_type)
      WHERE e.h >= 'c' GROUP BY e.event_type
    )
    SELECT tr.event_type, tr.n_train, tr.mu, q.n_calib, q.q_hat,
           te.n_test, te.n_covered,
           CAST(te.n_covered AS DOUBLE) / CAST(te.n_test AS DOUBLE)
             AS coverage
    FROM tr JOIN q USING (event_type) JOIN te USING (event_type)
    """,
    doc="[EXT] split conformal prediction intervals (Vovk; Lei et al. "
    "2018) — the distribution-free uncertainty wrapper every deployed "
    "regressor needs: md5-deterministic 3-way split (train/calibrate/"
    "test on the event_id hash — the engine's RNG-free convention), "
    "per-type mean predictor fit on train, q_hat = the "
    "ceil(0.9(n+1))-th order statistic of calibration |residuals| "
    "(rank arithmetic in exact integers, (event_id)-tie-broken "
    "selection of a bit-identical double), and held-out COVERAGE of "
    "the interval mu ± q_hat — the finite-sample >=90% guarantee made "
    "measurable. Residuals are single IEEE subtract/abs over exact "
    "cents and the bit-identical mu; coverage is one division — every "
    "column hash-gates. One scan + per-type windows over the "
    "calibration slice.",
    tags=("ml", "stats"),
)
def ml_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    e = ev.select(
        "event_type",
        "event_id",
        F.expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").alias(
            "cents"
        ),
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 1).alias("h"),
    ).persist()
    tr = (
        e.filter(F.col("h") <= "7")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_train"),
            (
                F.sum("cents").cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("mu"),
        )
    )
    ca = (
        e.filter((F.col("h") >= "8") & (F.col("h") <= "b"))
        .join(F.broadcast(tr), "event_type")
        .select(
            "event_type",
            "event_id",
            F.abs(F.col("cents").cast("double") - F.col("mu")).alias("resid"),
        )
    )
    wr = W.partitionBy("event_type").orderBy("resid", "event_id")
    wn = W.partitionBy("event_type")
    car = ca.select(
        "event_type",
        "resid",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n_calib"),
    )
    q = car.groupBy("event_type").agg(
        F.max("n_calib").cast("long").alias("n_calib"),
        F.max(
            F.when(
                F.col("rn")
                == F.least(
                    F.expr("(9 * (n_calib + 1) + 9) div 10"), F.col("n_calib")
                ),
                F.col("resid"),
            )
        ).alias("q_hat"),
    )
    te = (
        e.filter(F.col("h") >= "c")
        .join(F.broadcast(tr), "event_type")
        .join(F.broadcast(q), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.sum(
                F.when(
                    F.abs(F.col("cents").cast("double") - F.col("mu"))
                    <= F.col("q_hat"),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_covered"),
        )
    )
    return (
        tr.join(q, "event_type")
        .join(te, "event_type")
        .select(
            "event_type",
            "n_train",
            "mu",
            "n_calib",
            "q_hat",
            "n_test",
            "n_covered",
            (
                F.col("n_covered").cast("double")
                / F.col("n_test").cast("double")
            ).alias("coverage"),
        )
    )


# ---------------------------------------------------------------------------
# Time-respecting reachability over the timestamped contact network.
# ---------------------------------------------------------------------------

_TR_ITERS = 4


def _temporal_oracle() -> str:
    """Unrolled full-relaxation twin of
    operators/graph.py:temporal_earliest_arrival — each round admits an
    edge only when its contact day is >= the current arrival at its
    source. Every it{k} referenced twice -> MATERIALIZED."""
    it = """
    it{k} AS MATERIALIZED (
      SELECT s, node, CAST(MIN(arr) AS BIGINT) AS arr FROM (
        SELECT s, node, arr FROM it{p}
        UNION ALL
        SELECT r.s, e.dst AS node, e.t AS arr
        FROM edges e JOIN it{p} r ON e.src = r.node AND e.t >= r.arr
      ) u GROUP BY s, node
    )"""
    its = ",".join(it.format(k=k, p=k - 1) for k in range(1, _TR_ITERS + 1))
    return f"""
    WITH c0 AS MATERIALIZED (
      SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
             's' || CAST(l_suppkey AS VARCHAR) AS dst,
             CAST(epoch_ms(o_orderdate) // 86400000 AS BIGINT) AS t
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    edges AS MATERIALIZED (
      SELECT src, dst, t FROM c0 UNION ALL SELECT dst AS src, src AS dst, t FROM c0
    ),
    it0 AS MATERIALIZED (
      SELECT 's' || CAST(s_suppkey AS VARCHAR) AS s,
             's' || CAST(s_suppkey AS VARCHAR) AS node, CAST(0 AS BIGINT) AS arr
      FROM supplier WHERE s_suppkey < 8
    ),
    {its}
    SELECT s AS source_node, node, arr AS earliest_day FROM it{_TR_ITERS}
    """


@QS.add(
    "graph_temporal_reachability",
    _temporal_oracle(),
    doc="[EXT] TIME-RESPECTING reachability (temporal-graph earliest "
    "arrival) from the 8-supplier probe set over the timestamped "
    "contact network (each customer-supplier order is a contact on its "
    "order day, symmetrized): a path is valid only if contact days "
    "never decrease along it — the contagion / information-flow "
    "semantics static reachability OVERSTATES (it routes through "
    "contacts that happened before the node was reached). "
    f"{_TR_ITERS} relaxation rounds; arrivals exact BIGINT epoch days, "
    "so the 22nd hash-gated iterative. Operator is improved-frontier "
    "(an earlier arrival at u can unlock earlier paths THROUGH u, so "
    "improved rows re-enter the join and state rows are replaced — "
    "the SPFA discipline); the oracle runs plain full relaxation and "
    "meets the same fixpoint: the hash gate IS the equivalence proof, "
    "as with Bellman-Ford. operators/graph.py:temporal_earliest_arrival.",
    headline=True,
    tags=("graph", "iterative", "temporal"),
)
def graph_temporal_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.graph import temporal_earliest_arrival

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    c0 = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
            F.expr("unix_millis(o_orderdate) div 86400000").alias("t"),
        )
        .distinct()
    )
    edges = c0.union(
        c0.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "t")
    )
    sources = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") < 8)
        .select(F.concat(F.lit("s"), F.col("s_suppkey").cast("string")).alias("node"))
    )
    st = temporal_earliest_arrival(edges, sources, iters=_TR_ITERS)
    return st.select(
        F.col("s").alias("source_node"), "node", F.col("arr").alias("earliest_day")
    )


# ---------------------------------------------------------------------------
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
