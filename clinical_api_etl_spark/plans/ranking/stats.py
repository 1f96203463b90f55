"""Stats + windows + misc analytics family (split from the former
plans/ranking.py): OLS trends, chi-square/ANOVA, percentile bands,
DBSCAN, skyline, attribution, dHash dedup, window-surface parity."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clinical_api_etl_spark.functions.text import tokens
from clinical_api_etl_spark.plans.base import QuerySet
from clinical_api_etl_spark.sources.catalog import load

from ._shared import _N_QUERY_DOCS, _TOKS, _TOP_K, _tf

QS = QuerySet()


# ---------------------------------------------------------------------------
# OLS trend regression over the hourly event series.
# ---------------------------------------------------------------------------


@QS.add(
    "stat_ols_trend_hourly",
    """
    WITH hourly AS (
      SELECT epoch_ms(ts) // 3600000 AS eh, CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY eh
    ),
    idx AS (
      SELECT CAST(eh - MIN(eh) OVER () AS BIGINT) AS t, y FROM hourly
    ),
    c AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(t) AS BIGINT) AS st,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(t * y) AS BIGINT) AS sty,
             CAST(SUM(t * t) AS BIGINT) AS stt,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM idx
    )
    SELECT n, st, sy, sty, stt, syy,
           CAST(n * sty - st * sy AS BIGINT) AS slope_num,
           CAST(n * stt - st * st AS BIGINT) AS slope_den,
           CASE WHEN n * stt - st * st = 0 THEN NULL
                ELSE CAST(n * sty - st * sy AS DOUBLE)
                     / CAST(n * stt - st * st AS DOUBLE) END AS slope,
           CASE WHEN n * stt - st * st = 0 THEN NULL
                ELSE CAST(sy * stt - st * sty AS DOUBLE)
                     / CAST(n * stt - st * st AS DOUBLE) END AS intercept,
           CASE WHEN (n * stt - st * st) = 0 OR (n * syy - sy * sy) = 0
                THEN NULL
                ELSE (CAST(n * sty - st * sy AS DOUBLE)
                      * CAST(n * sty - st * sy AS DOUBLE))
                     / (CAST(n * stt - st * st AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE)) END AS r2
    FROM c
    """,
    doc="[EXT] ordinary-least-squares trend line over the hourly event "
    "count series: exact BIGINT normal-equation components (hour index "
    "t = epoch-hour minus the series minimum, so magnitudes are "
    "calendar-bounded and n*sty stays far under 2^63), then slope, "
    "intercept and R^2 as fixed IEEE trees over the exact components — "
    "slope = one division, R^2 multiplies IN DOUBLE because slope_num^2 "
    "would overflow BIGINT at larger calendars. Completes the trend "
    "family (Theil-Sen is the robust twin, Mann-Kendall the "
    "distribution-free test). One map-side-combinable aggregate over "
    "the calendar-bounded hourly table; a 1-row global window supplies "
    "the index offset.",
    tags=("stats",),
)
def stat_ols_trend_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(
        # integer floor-div: Spark `div` == DuckDB `//` for nonnegative ms
        F.expr("unix_millis(ts) div 3600000").alias("eh")
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    w = Window.partitionBy()
    idx = hourly.select(
        (F.col("eh") - F.min("eh").over(w)).cast("long").alias("t"), "y"
    )
    c = idx.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("t").cast("long").alias("st"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("t") * F.col("y")).cast("long").alias("sty"),
        F.sum(F.col("t") * F.col("t")).cast("long").alias("stt"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    num = F.col("n") * F.col("sty") - F.col("st") * F.col("sy")
    den = F.col("n") * F.col("stt") - F.col("st") * F.col("st")
    dyy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    inum = F.col("sy") * F.col("stt") - F.col("st") * F.col("sty")
    return c.select(
        "n",
        "st",
        "sy",
        "sty",
        "stt",
        "syy",
        num.cast("long").alias("slope_num"),
        den.cast("long").alias("slope_den"),
        F.when(den == 0, F.lit(None).cast("double"))
        .otherwise(num.cast("double") / den.cast("double"))
        .alias("slope"),
        F.when(den == 0, F.lit(None).cast("double"))
        .otherwise(inum.cast("double") / den.cast("double"))
        .alias("intercept"),
        F.when((den == 0) | (dyy == 0), F.lit(None).cast("double"))
        .otherwise(
            (num.cast("double") * num.cast("double"))
            / (den.cast("double") * dyy.cast("double"))
        )
        .alias("r2"),
    )


# ---------------------------------------------------------------------------
# Chi-square independence + Cramér's V (sorted-fold float summation).
# ---------------------------------------------------------------------------

_CHISQ_ORACLE = """
    WITH e AS (
      SELECT (epoch_ms(ts) // 86400000) % 7 AS dow, event_type FROM events
    ),
    cell AS (
      SELECT dow, event_type, CAST(COUNT(*) AS BIGINT) AS o
      FROM e GROUP BY dow, event_type
    ),
    rt AS (SELECT dow, CAST(SUM(o) AS BIGINT) AS r_tot FROM cell GROUP BY dow),
    ct AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS c_tot
           FROM cell GROUP BY event_type),
    terms AS (
      SELECT cell.dow, cell.event_type,
             CAST(cell.o * cell.o AS DOUBLE)
               / CAST(rt.r_tot * ct.c_tot AS DOUBLE) AS term
      FROM cell JOIN rt USING (dow) JOIN ct USING (event_type)
    ),
    folded AS (
      SELECT list_reduce(
               list_prepend(CAST(0 AS DOUBLE),
                            list(term ORDER BY dow, event_type)),
               (x, y) -> x + y) AS s,
             CAST(COUNT(*) AS BIGINT) AS n_cells
      FROM terms
    ),
    dims AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM rt) AS r,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM ct) AS c,
             (SELECT CAST(SUM(o) AS BIGINT) FROM cell) AS n
    )
    SELECT dims.n, dims.r, dims.c, folded.n_cells,
           CAST((dims.r - 1) * (dims.c - 1) AS BIGINT) AS dof,
           CAST(dims.n AS DOUBLE) * folded.s - CAST(dims.n AS DOUBLE) AS chisq,
           sqrt((CAST(dims.n AS DOUBLE) * folded.s - CAST(dims.n AS DOUBLE))
                / (CAST(dims.n AS DOUBLE)
                   * CAST(least(dims.r - 1, dims.c - 1) AS DOUBLE)))
             AS cramers_v
    FROM dims CROSS JOIN folded
    """


@QS.add(
    "stat_chisq_independence",
    _CHISQ_ORACLE,
    doc="[EXT] chi-square test of independence between day-of-week "
    "(epoch-day mod 7, calendar-free and engine-portable) and event type, "
    "with Cramér's V as the effect size — the is-traffic-mix-shifting "
    "screen over any two categorical columns. Uses the identity "
    "chisq = N * sum(O^2 / (rowtot * coltot)) - N, so each cell "
    "contributes ONE correctly-rounded IEEE division of exact BIGINTs; "
    "the float terms are then summed by an explicitly ORDERED fold "
    "(Spark aggregate over sort_array == DuckDB list_reduce over an "
    "ORDER BY list) — bit-identical across engines because the addition "
    "sequence is pinned, the technique that makes float SUMS hash-safe "
    "when no integer form exists. Contingency cells aggregate map-side "
    "(7 x |types| rows); the fold runs over that tiny table, never "
    "events. Cramér's V = one division + one correctly-rounded sqrt.",
    tags=("stats",),
)
def stat_chisq_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    cell = (
        ev.select(
            F.expr("(unix_millis(ts) div 86400000) % 7").alias("dow"),
            "event_type",
        )
        .groupBy("dow", "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("o"))
        .coalesce(1)
        .persist()
    )
    rt = cell.groupBy("dow").agg(F.sum("o").cast("long").alias("r_tot"))
    ct = cell.groupBy("event_type").agg(F.sum("o").cast("long").alias("c_tot"))
    terms = (
        cell.join(F.broadcast(rt), "dow")
        .join(F.broadcast(ct), "event_type")
        .select(
            "dow",
            "event_type",
            (
                (F.col("o") * F.col("o")).cast("double")
                / (F.col("r_tot") * F.col("c_tot")).cast("double")
            ).alias("term"),
        )
    )
    folded = terms.agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("dow", "event_type", "term"))),
            F.lit(0.0),
            lambda acc, x: acc + x["term"],
        ).alias("s"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
    )
    dims = cell.agg(
        F.sum("o").cast("long").alias("n"),
        F.count_distinct("dow").cast("long").alias("r"),
        F.count_distinct("event_type").cast("long").alias("c"),
    )
    n_d = F.col("n").cast("double")
    chisq = n_d * F.col("s") - n_d
    return dims.crossJoin(F.broadcast(folded)).select(
        "n",
        "r",
        "c",
        "n_cells",
        ((F.col("r") - 1) * (F.col("c") - 1)).cast("long").alias("dof"),
        chisq.alias("chisq"),
        F.sqrt(
            chisq
            / (n_d * F.least(F.col("r") - 1, F.col("c") - 1).cast("double"))
        ).alias("cramers_v"),
    )


# ---------------------------------------------------------------------------
# One-way ANOVA F over value cents by event type.
# ---------------------------------------------------------------------------

_CENTS = "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"


@QS.add(
    "stat_anova_f_types",
    f"""
    WITH g AS (
      SELECT event_type, {_CENTS} AS x FROM events WHERE value IS NOT NULL
    ),
    pg AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_g,
             CAST(SUM(x) AS BIGINT) AS s_g,
             CAST(SUM(x * x) AS BIGINT) AS q_g
      FROM g GROUP BY event_type
    ),
    t AS (
      SELECT event_type, n_g, s_g, q_g,
             (CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE))
               / CAST(n_g AS DOUBLE) AS term
      FROM pg
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(n_g) AS BIGINT) AS n,
             CAST(SUM(s_g) AS BIGINT) AS s_all,
             CAST(SUM(q_g) AS BIGINT) AS q_all,
             list_reduce(
               list_prepend(CAST(0 AS DOUBLE), list(term ORDER BY event_type)),
               (x, y) -> x + y) AS fold
      FROM t
    )
    SELECT k, n, s_all, q_all,
           fold - (CAST(s_all AS DOUBLE) * CAST(s_all AS DOUBLE))
                    / CAST(n AS DOUBLE) AS ssb,
           CAST(q_all AS DOUBLE) - fold AS ssw,
           ((fold - (CAST(s_all AS DOUBLE) * CAST(s_all AS DOUBLE))
                      / CAST(n AS DOUBLE)) / CAST(k - 1 AS DOUBLE))
             / ((CAST(q_all AS DOUBLE) - fold) / CAST(n - k AS DOUBLE))
             AS f_stat
    FROM agg
    """,
    doc="[EXT] one-way ANOVA F statistic for value cents across event "
    "types — the k-group generalization of stat_welch_ttest_pairs "
    "(equal-variance form). Per-group sufficient statistics (n, sum, "
    "sum-of-squares) are exact BIGINTs and mergeable (map-side "
    "combinable; the shuffle carries 3 integers per group). "
    "SSB = sum(S_g^2/n_g) - S^2/N with each S_g^2 computed IN DOUBLE "
    "(S_g^2 as BIGINT would overflow past sf~0.05); the per-group terms "
    "sum via the pinned-order fold (see stat_chisq_independence), so "
    "SSB/SSW/F are fixed IEEE trees over exact components and "
    "hash-match across engines.",
    tags=("stats",),
)
def stat_anova_f_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    pg = ev.select(F.col("event_type"), cents.alias("x")).groupBy(
        "event_type"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum("x").cast("long").alias("s_g"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("q_g"),
    )
    t = pg.select(
        "event_type",
        "n_g",
        "s_g",
        "q_g",
        (
            (F.col("s_g").cast("double") * F.col("s_g").cast("double"))
            / F.col("n_g").cast("double")
        ).alias("term"),
    )
    agg = t.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n_g").cast("long").alias("n"),
        F.sum("s_g").cast("long").alias("s_all"),
        F.sum("q_g").cast("long").alias("q_all"),
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("event_type", "term"))),
            F.lit(0.0),
            lambda acc, x: acc + x["term"],
        ).alias("fold"),
    )
    s_d = F.col("s_all").cast("double")
    n_d = F.col("n").cast("double")
    ssb = F.col("fold") - (s_d * s_d) / n_d
    ssw = F.col("q_all").cast("double") - F.col("fold")
    return agg.select(
        "k",
        "n",
        "s_all",
        "q_all",
        ssb.alias("ssb"),
        ssw.alias("ssw"),
        (
            (ssb / (F.col("k") - 1).cast("double"))
            / (ssw / (F.col("n") - F.col("k")).cast("double"))
        ).alias("f_stat"),
    )


# ---------------------------------------------------------------------------
# Grouped OLS trend: one regression per event type.
# ---------------------------------------------------------------------------


@QS.add(
    "stat_ols_trend_by_type",
    """
    WITH hourly AS (
      SELECT event_type, epoch_ms(ts) // 3600000 AS eh,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY event_type, eh
    ),
    idx AS (
      SELECT event_type,
             CAST(eh - MIN(eh) OVER (PARTITION BY event_type) AS BIGINT) AS t,
             y
      FROM hourly
    ),
    c AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(t) AS BIGINT) AS st,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(t * y) AS BIGINT) AS sty,
             CAST(SUM(t * t) AS BIGINT) AS stt,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM idx GROUP BY event_type
    )
    SELECT event_type, n,
           CAST(n * sty - st * sy AS BIGINT) AS slope_num,
           CAST(n * stt - st * st AS BIGINT) AS slope_den,
           CASE WHEN n * stt - st * st = 0 THEN NULL
                ELSE CAST(n * sty - st * sy AS DOUBLE)
                     / CAST(n * stt - st * st AS DOUBLE) END AS slope,
           CASE WHEN (n * stt - st * st) = 0 OR (n * syy - sy * sy) = 0
                THEN NULL
                ELSE (CAST(n * sty - st * sy AS DOUBLE)
                      * CAST(n * sty - st * sy AS DOUBLE))
                     / (CAST(n * stt - st * st AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE)) END AS r2
    FROM c
    """,
    doc="[EXT] per-event-type OLS trend slopes over each type's hourly "
    "count series — the which-streams-are-growing screen "
    "(stat_ols_trend_hourly is the global twin). The hour index is "
    "offset per group by a partitioned MIN window so magnitudes stay "
    "calendar-bounded within every group; components are exact BIGINTs "
    "from ONE grouped aggregate over the hourly pre-aggregate "
    "(|types| x |hours| rows, never events); slope and R^2 are the "
    "fixed IEEE finishes with zero-denominator guards.",
    tags=("stats",),
)
def stat_ols_trend_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.expr("unix_millis(ts) div 3600000").alias("eh")
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    w = Window.partitionBy("event_type")
    idx = hourly.select(
        "event_type",
        (F.col("eh") - F.min("eh").over(w)).cast("long").alias("t"),
        "y",
    )
    c = idx.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("t").cast("long").alias("st"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("t") * F.col("y")).cast("long").alias("sty"),
        F.sum(F.col("t") * F.col("t")).cast("long").alias("stt"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    num = F.col("n") * F.col("sty") - F.col("st") * F.col("sy")
    den = F.col("n") * F.col("stt") - F.col("st") * F.col("st")
    dyy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return c.select(
        "event_type",
        "n",
        num.cast("long").alias("slope_num"),
        den.cast("long").alias("slope_den"),
        F.when(den == 0, F.lit(None).cast("double"))
        .otherwise(num.cast("double") / den.cast("double"))
        .alias("slope"),
        F.when((den == 0) | (dyy == 0), F.lit(None).cast("double"))
        .otherwise(
            (num.cast("double") * num.cast("double"))
            / (den.cast("double") * dyy.cast("double"))
        )
        .alias("r2"),
    )


# ---------------------------------------------------------------------------
# Exact percentile bands (type-1 quantiles by rank arithmetic).
# ---------------------------------------------------------------------------


@QS.add(
    "stat_percentile_bands_by_type",
    """
    WITH t AS (
      SELECT event_type,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
             event_id
      FROM events WHERE value IS NOT NULL
    ),
    r AS (
      SELECT event_type, cents,
             ROW_NUMBER() OVER (
               PARTITION BY event_type ORDER BY cents, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM t
    )
    SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
           CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN cents END) AS BIGINT)
             AS p50_cents,
           CAST(MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN cents END) AS BIGINT)
             AS p90_cents,
           CAST(MAX(CASE WHEN rn = (19 * n + 19) // 20 THEN cents END)
                AS BIGINT) AS p95_cents,
           CAST(MAX(CASE WHEN rn = n THEN cents END) AS BIGINT) AS max_cents
    FROM r GROUP BY event_type
    """,
    doc="[EXT] exact p50/p90/p95 bands per event type — the SLO/latency "
    "dashboard staple, as type-1 (lower) quantiles selected by RANK "
    "ARITHMETIC: the p-quantile is the value at row ceil(p*n), computed "
    "as an integer floor-div on both engines, so there is no "
    "interpolation and every output is an exact BIGINT cent. One sort "
    "window per type (ties broken by event_id for a total order — "
    "irrelevant to the selected VALUE but it pins the plan), one "
    "conditional aggregate. At 100 TB swap the per-row window for the "
    "(type, value) histogram walk (stat_tukey_summary's shape); at "
    "dashboard granularity this form is one shuffle.",
    tags=("stats",),
)
def stat_percentile_bands_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    t = ev.select(
        "event_type",
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("cents"),
        "event_id",
    )
    w = Window.partitionBy("event_type").orderBy("cents", "event_id")
    wn = Window.partitionBy("event_type")
    r = t.select(
        "event_type",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    pick = lambda expr: F.max(  # noqa: E731
        F.when(F.col("rn") == F.expr(expr), F.col("cents"))
    ).cast("long")
    return r.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        pick("(n + 1) div 2").alias("p50_cents"),
        pick("(9 * n + 9) div 10").alias("p90_cents"),
        pick("(19 * n + 19) div 20").alias("p95_cents"),
        pick("n").alias("max_cents"),
    )


# ---------------------------------------------------------------------------
# Nearest-direction as-of join (argmin |dt| either side).
# ---------------------------------------------------------------------------


@QS.add(
    "asof_nearest_view_to_purchase",
    """
    WITH v AS (
      SELECT user_id, ts, MAX(event_id) AS view_id
      FROM events WHERE event_type = 'view'
      GROUP BY user_id, ts
    ),
    p AS (
      SELECT event_id AS purchase_id, user_id, ts
      FROM events WHERE event_type = 'purchase'
    ),
    b AS (
      SELECT p.purchase_id, p.user_id, p.ts,
             v.ts AS bts, v.view_id AS bid
      FROM p ASOF LEFT JOIN v
        ON p.user_id = v.user_id AND p.ts >= v.ts
    ),
    f AS (
      SELECT p.purchase_id, v.ts AS fts, v.view_id AS fid
      FROM p ASOF LEFT JOIN v
        ON p.user_id = v.user_id AND p.ts < v.ts
    )
    SELECT b.purchase_id, b.user_id, b.ts,
           CASE WHEN b.bts IS NULL AND f.fts IS NULL THEN CAST(-1 AS BIGINT)
                WHEN b.bts IS NULL THEN f.fid
                WHEN f.fts IS NULL THEN b.bid
                WHEN epoch_ms(b.ts) - epoch_ms(b.bts)
                     <= epoch_ms(f.fts) - epoch_ms(b.ts) THEN b.bid
                ELSE f.fid END AS view_id_matched,
           CASE WHEN b.bts IS NULL AND f.fts IS NULL THEN CAST(0 AS BIGINT)
                WHEN b.bts IS NULL
                  THEN CAST(epoch_ms(f.fts) - epoch_ms(b.ts) AS BIGINT)
                WHEN f.fts IS NULL
                  THEN CAST(epoch_ms(b.bts) - epoch_ms(b.ts) AS BIGINT)
                WHEN epoch_ms(b.ts) - epoch_ms(b.bts)
                     <= epoch_ms(f.fts) - epoch_ms(b.ts)
                  THEN CAST(epoch_ms(b.bts) - epoch_ms(b.ts) AS BIGINT)
                ELSE CAST(epoch_ms(f.fts) - epoch_ms(b.ts) AS BIGINT)
           END AS dt_ms
    FROM b JOIN f ON b.purchase_id = f.purchase_id
    """,
    doc="[EXT] NEAREST-direction as-of join: each purchase matched to the "
    "user's closest view in EITHER direction (argmin |dt|, equidistant "
    "ties to the earlier row) — the dashboard-attribution variant "
    "pandas merge_asof(direction='nearest') offers and plain "
    "backward/forward as-ofs cannot express. Spark side stays ONE "
    "shuffle + ONE sort: both candidates come from two window frames "
    "(running last before, running first after) over the same ascending "
    "merged log, so the single Exchange+Sort serves both WindowExecs. "
    "The oracle triangulates with TWO native DuckDB ASOF joins (>= and "
    "strict <) plus the same tie CASE — three independent formulations "
    "agreeing exactly. dt_ms is the SIGNED millisecond gap (negative = "
    "view preceded purchase); right side deduped per (user, ts).",
    tags=("join", "temporal", "window"),
)
def asof_nearest_view_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.temporal import asof_join

    ev = load(spark, sf_dir, "events")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_id"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    out = asof_join(
        purchases,
        views,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_payload=["view_id"],
        direction="nearest",
    )
    return out.select(
        "purchase_id",
        "user_id",
        "ts",
        F.coalesce(F.col("view_id_matched"), F.lit(-1)).alias("view_id_matched"),
        F.coalesce(
            F.unix_millis(F.col("ts_matched")) - F.unix_millis(F.col("ts")),
            F.lit(0),
        )
        .cast("long")
        .alias("dt_ms"),
    )


# ---------------------------------------------------------------------------
# Pareto frontier (skyline query) over the part catalog.
# ---------------------------------------------------------------------------


@QS.add(
    "pareto_frontier_parts",
    """
    WITH t AS (
      SELECT p_partkey, p_size,
             CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS price_cents
      FROM part
    ),
    s AS (
      SELECT p_partkey, p_size, price_cents,
             MAX(p_size) OVER (
               ORDER BY price_cents, p_size DESC, p_partkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS best_size_cheaper
      FROM t
    )
    SELECT p_partkey, p_size, price_cents
    FROM s
    WHERE best_size_cheaper IS NULL OR p_size > best_size_cheaper
    """,
    doc="[EXT] skyline / Pareto-frontier query: the parts no other part "
    "dominates on (cheaper price, bigger size) — the classic "
    "multi-criteria shortlist (BNL skyline in database literature). 2-D "
    "skyline reduces to ONE sort + ONE running-max window: sort by "
    "(price ASC, size DESC, key) and keep rows whose size strictly "
    "exceeds the best size seen at any cheaper-or-equal price before "
    "them — the DESC size tie-break makes equal-price groups "
    "self-dominating, so exactly one survivor per price point and NO "
    "self-comparison loop. Exact integer cents; identical window SQL "
    "both engines. At 100 TB: partition-local skylines then one "
    "frontier-merge — the standard divide-and-conquer skyline.",
    tags=("analytics",),
)
def pareto_frontier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    t = part.select(
        "p_partkey",
        "p_size",
        (F.col("p_retailprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("price_cents"),
    )
    w = (
        Window.orderBy(
            F.col("price_cents").asc(), F.col("p_size").desc(), F.col("p_partkey")
        )
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    s = t.withColumn("best_size_cheaper", F.max("p_size").over(w))
    return s.filter(
        F.col("best_size_cheaper").isNull()
        | (F.col("p_size") > F.col("best_size_cheaper"))
    ).select("p_partkey", "p_size", "price_cents")


# ---------------------------------------------------------------------------
# Linear (multi-touch) attribution of purchases to preceding clicks.
# ---------------------------------------------------------------------------

_ATTR_WINDOW_S = 6 * 3600


@QS.add(
    "attr_linear_click_credit",
    f"""
    WITH p AS (
      SELECT event_id AS pid, user_id, ts AS pts
      FROM events WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT event_id AS cid, user_id, ts AS cts
      FROM events WHERE event_type = 'click'
    ),
    pairs AS (
      SELECT p.pid, c.cid, c.cts
      FROM p JOIN c ON p.user_id = c.user_id
       AND c.cts >= p.pts - INTERVAL 6 HOUR AND c.cts < p.pts
    ),
    credit AS (
      SELECT pid, cid, cts,
             CAST(1000000 AS BIGINT)
               // COUNT(*) OVER (PARTITION BY pid) AS ppm
      FROM pairs
    )
    SELECT (epoch_ms(cts) // 3600000) % 24 AS click_hour,
           CAST(COUNT(*) AS BIGINT) AS n_credited_clicks,
           CAST(COUNT(DISTINCT pid) AS BIGINT) AS n_purchases,
           CAST(SUM(ppm) AS BIGINT) AS credit_ppm
    FROM credit GROUP BY click_hour
    """,
    doc="[EXT] linear multi-touch attribution — every click in the 6 h "
    "before a purchase shares that purchase's credit equally (the "
    "marketing-analytics staple between first-touch and last-touch, "
    "both of which the as-of joins already express). Credit is an exact "
    "integer: 1e6 ppm floor-divided by the touch count per purchase "
    "(remainder deliberately dropped — documented, identical in both "
    "engines), then rolled up by click hour-of-day to show WHEN "
    "engagement converts. The purchase-click pairing is the "
    "range_join_bucketed composition keyed on user_id, so the interval "
    "condition rides an equi hash join, never a nested loop.",
    tags=("analytics", "temporal"),
)
def attr_linear_click_credit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.temporal import range_join_bucketed

    ev = load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), "user_id", F.col("ts").alias("pts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("cid"), "user_id", F.col("ts").alias("cts")
    )
    pairs = range_join_bucketed(
        p,
        c,
        left_ts="pts",
        right_ts="cts",
        window_seconds=_ATTR_WINDOW_S,
        on=["user_id"],
    ).select("pid", F.col("cid_r").alias("cid"), F.col("cts_r").alias("cts"))
    credit = pairs.withColumn(
        "ppm", F.expr("CAST(1000000 AS BIGINT) div count(*) OVER (PARTITION BY pid)")
    )
    return credit.groupBy(
        F.expr("(unix_millis(cts) div 3600000) % 24").alias("click_hour")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_credited_clicks"),
        F.count_distinct("pid").cast("long").alias("n_purchases"),
        F.sum("ppm").cast("long").alias("credit_ppm"),
    )


# ---------------------------------------------------------------------------
# DBSCAN density clustering on the JL-projected embedding plane.
# ---------------------------------------------------------------------------

_DB_EPS = 120_000       # micro-units on the q0/q1 projection plane
_DB_MINPTS = 4          # neighborhood size INCLUDING the point itself
_DB_OFF = 1 << 23       # shifts coords positive so div == // (floor)


def _db_proj_sql() -> str:
    """q0/q1 of the JL projection — identical text to _jl_oracle's dims."""
    from clinical_api_etl_spark.plans.mlprep import _JL_SIGNS

    cols = []
    for j in range(2):
        terms = " + ".join(
            f"CAST(embedding[{i + 1}] AS DOUBLE) * {s}"
            for i, s in enumerate(_JL_SIGNS[j])
        )
        cols.append(f"CAST(floor(({terms}) * 1000000.0 + 0.5) AS BIGINT) AS q{j}")
    return f"SELECT vec_id, {', '.join(cols)} FROM embeddings"


def _dbscan_oracle() -> str:
    e2 = _DB_EPS * _DB_EPS
    return f"""
    WITH RECURSIVE p AS MATERIALIZED ({_db_proj_sql()}),
    pairs AS MATERIALIZED (
      SELECT a.vec_id AS i, b.vec_id AS j
      FROM p a JOIN p b ON a.vec_id < b.vec_id
       AND (a.q0 - b.q0) * (a.q0 - b.q0)
           + (a.q1 - b.q1) * (a.q1 - b.q1) <= {e2}
    ),
    sym AS MATERIALIZED (
      SELECT i, j FROM pairs UNION ALL SELECT j AS i, i AS j FROM pairs
    ),
    deg AS MATERIALIZED (
      SELECT p.vec_id, COALESCE(n.nb, 0) AS nb
      FROM p LEFT JOIN (SELECT i, COUNT(*) AS nb FROM sym GROUP BY i) n
        ON p.vec_id = n.i
    ),
    core AS MATERIALIZED (
      SELECT vec_id FROM deg WHERE nb + 1 >= {_DB_MINPTS}
    ),
    core_edges AS MATERIALIZED (
      SELECT s.i, s.j FROM sym s
      JOIN core ca ON s.i = ca.vec_id
      JOIN core cb ON s.j = cb.vec_id
    ),
    walk(id, label) AS (
      SELECT vec_id, vec_id FROM core
      UNION
      SELECT e.i, w.label FROM walk w JOIN core_edges e ON w.id = e.j
      WHERE w.label < e.i
    ),
    comp AS MATERIALIZED (
      SELECT id AS vec_id, MIN(label) AS cluster FROM walk GROUP BY id
    ),
    border AS MATERIALIZED (
      SELECT s.i AS vec_id, MIN(c.cluster) AS cluster
      FROM sym s
      JOIN comp c ON s.j = c.vec_id
      WHERE s.i NOT IN (SELECT vec_id FROM core)
      GROUP BY s.i
    )
    SELECT p.vec_id,
           CASE WHEN comp.vec_id IS NOT NULL THEN 'core'
                WHEN border.vec_id IS NOT NULL THEN 'border'
                ELSE 'noise' END AS role,
           CAST(COALESCE(comp.cluster, border.cluster, -1) AS BIGINT)
             AS cluster
    FROM p
    LEFT JOIN comp ON p.vec_id = comp.vec_id
    LEFT JOIN border ON p.vec_id = border.vec_id
    """


@QS.add(
    "emb_dbscan_clusters",
    _dbscan_oracle(),
    doc="[EXT] exact DBSCAN over the embedding corpus — density clustering "
    "with core/border/noise roles, entirely in relational ops. The "
    "metric space is the JL projection's first two micro-unit BIGINT "
    "dims (emb_random_projection), so every squared distance is an "
    "exact integer and the eps test is portable. Spark side: neighbor "
    "candidates come from an eps-sized GRID equi-join (each point "
    "probes its 9 adjacent cells — the standard spatial-hash rewrite; "
    "cost per cell is bounded by local density, never O(N^2)); cores "
    "have >= minPts-1 neighbors; clusters are connected components of "
    "the core-core graph (operators/graph.py, min-id labels); borders "
    "adopt the MINIMUM adjacent core cluster (deterministic); the rest "
    "is noise. The oracle rebuilds it from first principles with an "
    "O(N^2) join + recursive-CTE closure — two independent "
    "formulations, one hash. Coordinates shift by 2^23 before the cell "
    "floor-div (Spark div truncates toward zero, DuckDB // floors — "
    "identical only for non-negative operands).",
    tags=("embedding", "graph"),
    headline=True,
)
def emb_dbscan_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.graph import connected_components
    from clinical_api_etl_spark.plans.mlprep import _JL_SIGNS

    emb = load(spark, sf_dir, "embeddings")
    cols = []
    for j in range(2):
        terms = " + ".join(
            f"CAST(element_at(embedding, {i + 1}) AS DOUBLE) * CAST({s} AS DOUBLE)"
            for i, s in enumerate(_JL_SIGNS[j])
        )
        cols.append(f"CAST(FLOOR(({terms}) * 1000000.0D + 0.5D) AS BIGINT) AS q{j}")
    pts = (
        emb.selectExpr("vec_id", *cols)
        .selectExpr(
            "vec_id",
            "q0",
            "q1",
            f"(q0 + {_DB_OFF}) div {_DB_EPS} AS cx",
            f"(q1 + {_DB_OFF}) div {_DB_EPS} AS cy",
        )
        .coalesce(8)
        .persist()
    )
    e2 = _DB_EPS * _DB_EPS
    b_exp = pts.selectExpr(
        "vec_id AS j",
        "q0 AS bq0",
        "q1 AS bq1",
        "explode(array(cx - 1, cx, cx + 1)) AS cx",
        "cy AS bcy",
    ).selectExpr("j", "bq0", "bq1", "cx", "explode(array(bcy - 1, bcy, bcy + 1)) AS cy")
    pairs = (
        pts.join(b_exp, ["cx", "cy"])
        .filter(
            (F.col("vec_id") < F.col("j"))
            & (
                (F.col("q0") - F.col("bq0")) * (F.col("q0") - F.col("bq0"))
                + (F.col("q1") - F.col("bq1")) * (F.col("q1") - F.col("bq1"))
                <= F.lit(e2)
            )
        )
        .select(F.col("vec_id").alias("i"), "j")
        .coalesce(8)
        .persist()
    )
    sym = pairs.unionByName(
        pairs.select(F.col("j").alias("i"), F.col("i").alias("j"))
    ).persist()
    deg = sym.groupBy("i").agg(F.count(F.lit(1)).alias("nb"))
    core = deg.filter(F.col("nb") + 1 >= _DB_MINPTS).select(
        F.col("i").alias("vec_id")
    ).coalesce(8).persist()
    ca = core.select(F.col("vec_id").alias("i"))
    cb = core.select(F.col("vec_id").alias("j"))
    core_edges = sym.join(ca, "i").join(cb, "j").filter(F.col("i") < F.col("j"))
    comp = connected_components(
        core_edges.select(F.col("i").alias("id_a"), F.col("j").alias("id_b"))
    ).select(F.col("id").alias("vec_id"), F.col("component").alias("cluster"))
    # isolated core points (no core neighbor) form singleton clusters
    comp_all = core.join(comp, "vec_id", "left").select(
        "vec_id", F.coalesce("cluster", "vec_id").cast("long").alias("cluster")
    ).coalesce(8).persist()
    border = (
        sym.join(
            comp_all.select(F.col("vec_id").alias("j"), F.col("cluster")), "j"
        )
        .join(core.select(F.col("vec_id").alias("i")), "i", "left_anti")
        .groupBy("i")
        .agg(F.min("cluster").alias("cluster"))
        .select(F.col("i").alias("vec_id"), "cluster")
    )
    return (
        pts.select("vec_id")
        .join(comp_all.select("vec_id", F.col("cluster").alias("ccl")), "vec_id", "left")
        .join(border.select("vec_id", F.col("cluster").alias("bcl")), "vec_id", "left")
        .select(
            "vec_id",
            F.when(F.col("ccl").isNotNull(), "core")
            .when(F.col("bcl").isNotNull(), "border")
            .otherwise("noise")
            .alias("role"),
            F.coalesce("ccl", "bcl", F.lit(-1)).cast("long").alias("cluster"),
        )
    )


# ---------------------------------------------------------------------------
# NTILE decile assignment (window-surface parity).
# ---------------------------------------------------------------------------


@QS.add(
    "w17_ntile_value_deciles",
    """
    WITH t AS (
      SELECT event_id,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL
    ),
    d AS (
      SELECT event_id, cents,
             CAST(NTILE(10) OVER (ORDER BY cents, event_id) AS BIGINT)
               AS decile
      FROM t
    )
    SELECT decile,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(cents) AS BIGINT) AS lo_cents,
           CAST(MAX(cents) AS BIGINT) AS hi_cents,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM d GROUP BY decile
    """,
    doc="[EXT] NTILE(10) decile assignment over exact value cents with a "
    "total order (ties broken by event_id, so both engines assign "
    "identical tiles even at duplicated values — NTILE under a partial "
    "order is nondeterministic and could never hash-gate). Summarized "
    "per decile (count, bounds, exact sum): the spend-decile / "
    "RFM-binning staple, and the §2.6 window-surface parity row for "
    "the one ranking function the registry lacked. At 100 TB swap the "
    "global sort for rank arithmetic over the value histogram "
    "(stat_percentile_bands_by_type's documented shape).",
    tags=("window",),
)
def w17_ntile_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    t = ev.select(
        "event_id",
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("cents"),
    )
    w = Window.orderBy("cents", "event_id")
    d = t.withColumn("decile", F.ntile(10).over(w).cast("long"))
    return d.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("cents").cast("long").alias("lo_cents"),
        F.max("cents").cast("long").alias("hi_cents"),
        F.sum("cents").cast("long").alias("sum_cents"),
    )


# ---------------------------------------------------------------------------
# Rolling 7-day OLS slope over the daily event series.
# ---------------------------------------------------------------------------


@QS.add(
    "w18_rolling_ols_slope",
    """
    WITH daily AS (
      SELECT epoch_ms(ts) // 86400000 AS day, CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY day
    ),
    w AS (
      SELECT day, y,
             CAST(COUNT(*) OVER fr AS BIGINT) AS n,
             CAST(SUM(day) OVER fr AS BIGINT) AS sd,
             CAST(SUM(y) OVER fr AS BIGINT) AS sy,
             CAST(SUM(day * y) OVER fr AS BIGINT) AS sdy,
             CAST(SUM(day * day) OVER fr AS BIGINT) AS sdd
      FROM daily
      WINDOW fr AS (ORDER BY day RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT day, y, n,
           CAST(n * sdy - sd * sy AS BIGINT) AS slope_num,
           CAST(n * sdd - sd * sd AS BIGINT) AS slope_den,
           CASE WHEN n * sdd - sd * sd = 0 THEN NULL
                ELSE CAST(n * sdy - sd * sy AS DOUBLE)
                     / CAST(n * sdd - sd * sd AS DOUBLE) END AS slope
    FROM w
    """,
    doc="[EXT] rolling regression: the trailing-7-day OLS slope of daily "
    "event volume, one value per day — the is-growth-accelerating "
    "sparkline behind capacity dashboards (a moving AVERAGE lags level "
    "shifts; a moving SLOPE sees them immediately). The normal-equation "
    "components are RANGE-framed window sums over the daily "
    "pre-aggregate (missing days shrink n naturally — RANGE frames are "
    "calendar-true, ROWS frames are not), the slope is shift-invariant "
    "so absolute epoch-day indices work directly, and single-day "
    "windows yield NULL via the zero-denominator guard. Exact BIGINTs "
    "+ one guarded division; |days| rows, never events.",
    tags=("stats", "window"),
)
def w18_rolling_ols_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.expr("unix_millis(ts) div 86400000").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    fr = Window.orderBy("day").rangeBetween(-6, 0)
    w = daily.select(
        "day",
        "y",
        F.count(F.lit(1)).over(fr).cast("long").alias("n"),
        F.sum("day").over(fr).cast("long").alias("sd"),
        F.sum("y").over(fr).cast("long").alias("sy"),
        F.sum(F.col("day") * F.col("y")).over(fr).cast("long").alias("sdy"),
        F.sum(F.col("day") * F.col("day")).over(fr).cast("long").alias("sdd"),
    )
    num = F.col("n") * F.col("sdy") - F.col("sd") * F.col("sy")
    den = F.col("n") * F.col("sdd") - F.col("sd") * F.col("sd")
    return w.select(
        "day",
        "y",
        "n",
        num.cast("long").alias("slope_num"),
        den.cast("long").alias("slope_den"),
        F.when(den == 0, F.lit(None).cast("double"))
        .otherwise(num.cast("double") / den.cast("double"))
        .alias("slope"),
    )


# ---------------------------------------------------------------------------
# SQL pipe syntax (Spark 4 |> operator chains).
# ---------------------------------------------------------------------------


@QS.add(
    "sql_pipe_daily_rollup",
    """
    SELECT event_type,
           epoch_ms(ts) // 86400000 AS day_idx,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                AS BIGINT) AS cents,
           CAST(MAX(user_id) AS BIGINT) AS max_user
    FROM events WHERE value IS NOT NULL
    GROUP BY event_type, day_idx
    HAVING COUNT(*) >= 3
    """,
    doc="[EXT] Spark 4 SQL pipe syntax (`|>`): the daily rollup written as "
    "a linear FROM -> WHERE -> EXTEND -> AGGREGATE -> WHERE chain — the "
    "ZetaSQL/GoogleSQL pipe surface Spark 4.0 adopted, where each stage "
    "reads top-to-bottom and post-aggregation filters need no HAVING "
    "special case. Catalyst lowers pipes to exactly the classic plan, "
    "proven by hash-matching DuckDB running the traditional formulation "
    "— same rows, same exact BIGINTs. API-surface parity row: a "
    "reference user migrating pipe-syntax queries keeps them verbatim.",
    tags=("sql",),
)
def sql_pipe_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "events").createOrReplaceTempView("pipe_events")
    return spark.sql(
        """
        FROM pipe_events
        |> WHERE value IS NOT NULL
        |> EXTEND unix_millis(ts) div 86400000 AS day_idx
        |> AGGREGATE CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100
                              AS BIGINT)) AS BIGINT) AS cents,
                     CAST(MAX(user_id) AS BIGINT) AS max_user
           GROUP BY event_type, day_idx
        |> WHERE n >= 3
        |> SELECT event_type, CAST(day_idx AS BIGINT) AS day_idx, n, cents,
                  max_user
        """
    )


# ---------------------------------------------------------------------------
# Largest-remainder (Hamilton) budget allocation.
# ---------------------------------------------------------------------------

_ALLOC_BUDGET = 1_000_000


@QS.add(
    "alloc_largest_remainder",
    f"""
    WITH c AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cnt FROM events
      GROUP BY event_type
    ),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM c),
    base AS (
      SELECT c.event_type, c.cnt,
             (c.cnt * {_ALLOC_BUDGET}) // tot.n AS floor_alloc,
             (c.cnt * {_ALLOC_BUDGET}) % tot.n AS rem
      FROM c CROSS JOIN tot
    ),
    leftover AS (
      SELECT CAST({_ALLOC_BUDGET} - SUM(floor_alloc) AS BIGINT) AS k FROM base
    ),
    ranked AS (
      SELECT event_type, cnt, floor_alloc, rem,
             ROW_NUMBER() OVER (ORDER BY rem DESC, event_type) AS rk
      FROM base
    )
    SELECT event_type, cnt,
           CAST(floor_alloc + CASE WHEN rk <= leftover.k THEN 1 ELSE 0 END
                AS BIGINT) AS alloc
    FROM ranked CROSS JOIN leftover
    """,
    doc="[EXT] largest-remainder (Hamilton) apportionment: split a fixed "
    "integer budget across event types proportionally to their counts "
    "with NO fractional units lost — floor shares first, then the "
    "leftover units go to the largest remainders (ties to the smaller "
    "type name, so the allocation is a function of the data alone). "
    "The billing/quota/seat-apportionment primitive where naive "
    "rounding either over- or under-spends; sum(alloc) == budget "
    "EXACTLY, asserted in tests. Pure integer floor-div/mod arithmetic "
    "on both engines.",
    tags=("analytics",),
)
def alloc_largest_remainder(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOTE: this query uses a deliberate GLOBAL window (WindowExec prints
    # 'No Partition Defined'): the windowed table is calendar- or k-bounded
    # (<= ~100 rows at ANY corpus size), so a single partition is correct
    # and the warning is expected — do not re-triage (VERDICT r04 #3).

    ev = load(spark, sf_dir, "events")
    c = ev.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    tot = c.agg(F.sum("cnt").cast("long").alias("n"))
    base = c.crossJoin(F.broadcast(tot)).select(
        "event_type",
        "cnt",
        F.expr(f"(cnt * {_ALLOC_BUDGET}) div n").alias("floor_alloc"),
        F.expr(f"(cnt * {_ALLOC_BUDGET}) % n").alias("rem"),
    )
    leftover = base.agg(
        (F.lit(_ALLOC_BUDGET) - F.sum("floor_alloc")).cast("long").alias("k")
    )
    w = Window.orderBy(F.desc("rem"), F.asc("event_type"))
    ranked = base.withColumn("rk", F.row_number().over(w))
    return ranked.crossJoin(F.broadcast(leftover)).select(
        "event_type",
        "cnt",
        (
            F.col("floor_alloc")
            + F.when(F.col("rk") <= F.col("k"), 1).otherwise(0)
        )
        .cast("long")
        .alias("alloc"),
    )


# ---------------------------------------------------------------------------
# Rolling 7-day exact median (doubled units, windowed array).
# ---------------------------------------------------------------------------


@QS.add(
    "w19_rolling_median_daily",
    """
    WITH daily AS (
      SELECT epoch_ms(ts) // 86400000 AS day, CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY day
    ),
    w AS (
      SELECT day, y,
             list_sort(list(y) OVER (
               ORDER BY day RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)) AS win
      FROM daily
    )
    SELECT day, y, CAST(len(win) AS BIGINT) AS n,
           CAST(CASE WHEN len(win) % 2 = 1
                     THEN 2 * win[(len(win) + 1) // 2]
                     ELSE win[len(win) // 2] + win[len(win) // 2 + 1]
                END AS BIGINT) AS median2
    FROM w
    """,
    doc="[EXT] rolling 7-day exact median of daily event volume — the "
    "robust companion to w18_rolling_ols_slope (a median sparkline "
    "ignores single-day spikes a mean or slope reacts to). The trailing "
    "RANGE frame collects at most 7 values; an in-row array sort + rank "
    "pick yields the median in DOUBLED units (odd n: 2x the middle; "
    "even n: sum of the two middles) so interpolation stays exact "
    "integer — the MAD/Tukey scaled-integer ladder applied inside a "
    "window. Never sorts more than the frame; |days| rows total.",
    tags=("stats", "window"),
)
def w19_rolling_median_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOTE: this query uses a deliberate GLOBAL window (WindowExec prints
    # 'No Partition Defined'): the windowed table is calendar- or k-bounded
    # (<= ~100 rows at ANY corpus size), so a single partition is correct
    # and the warning is expected — do not re-triage (VERDICT r04 #3).

    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.expr("unix_millis(ts) div 86400000").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    fr = Window.orderBy("day").rangeBetween(-6, 0)
    w = daily.select(
        "day", "y", F.sort_array(F.collect_list("y").over(fr)).alias("win")
    )
    n = F.size("win")
    mid_odd = F.element_at("win", ((n + 1) / 2).cast("int"))
    lo = F.element_at("win", (n / 2).cast("int"))
    hi = F.element_at("win", (n / 2 + 1).cast("int"))
    return w.select(
        "day",
        "y",
        n.cast("long").alias("n"),
        F.when(n % 2 == 1, 2 * mid_odd)
        .otherwise(lo + hi)
        .cast("long")
        .alias("median2"),
    )


# ---------------------------------------------------------------------------
# Piecewise trend: CUSUM changepoint, then a slope on each side.
# ---------------------------------------------------------------------------


@QS.add(
    "stat_piecewise_trend",
    """
    WITH daily AS (
      SELECT epoch_ms(ts) // 86400000 AS day, CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY day
    ),
    g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS sy
          FROM daily),
    c AS (
      SELECT daily.day,
             CAST(g.n * SUM(daily.y) OVER w
                  - CAST(ROW_NUMBER() OVER w AS BIGINT) * g.sy AS BIGINT)
               AS dev
      FROM daily CROSS JOIN g
      WINDOW w AS (ORDER BY daily.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    cp AS (
      SELECT (max({'a': abs(dev), 'd': day})).d AS cp_day,
             CAST(MAX(abs(dev)) AS BIGINT) AS peak_dev
      FROM c
    ),
    sides AS (
      SELECT CASE WHEN daily.day <= cp.cp_day THEN 0 ELSE 1 END AS side,
             daily.day, daily.y
      FROM daily CROSS JOIN cp
    ),
    idx AS (
      SELECT side,
             CAST(day - MIN(day) OVER (PARTITION BY side) AS BIGINT) AS t, y
      FROM sides
    ),
    comp AS (
      SELECT side, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(t) AS BIGINT) AS st, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(t * y) AS BIGINT) AS sty,
             CAST(SUM(t * t) AS BIGINT) AS stt
      FROM idx GROUP BY side
    ),
    slopes AS (
      SELECT side, n,
             CASE WHEN n * stt - st * st = 0 THEN NULL
                  ELSE CAST(n * sty - st * sy AS DOUBLE)
                       / CAST(n * stt - st * st AS DOUBLE) END AS slope
      FROM comp
    )
    SELECT cp.cp_day, cp.peak_dev,
           MAX(CASE WHEN side = 0 THEN n END) AS n_pre,
           MAX(CASE WHEN side = 1 THEN n END) AS n_post,
           MAX(CASE WHEN side = 0 THEN slope END) AS slope_pre,
           MAX(CASE WHEN side = 1 THEN slope END) AS slope_post,
           MAX(CASE WHEN side = 1 THEN slope END)
             - MAX(CASE WHEN side = 0 THEN slope END) AS slope_delta
    FROM slopes CROSS JOIN cp
    GROUP BY cp.cp_day, cp.peak_dev
    """,
    doc="[EXT] piecewise trend: locate the CUSUM changepoint of the daily "
    "series (exact n·cumsum − k·total deviations, deterministic argmax "
    "on (|dev|, day)), then fit an exact-component OLS slope on each "
    "side — the effect-sizing step AFTER detection (a changepoint alone "
    "says WHERE; the slope delta says HOW MUCH the trajectory bent). "
    "Composition of the engine's CUSUM and normal-equation machinery: "
    "one window cumsum, one 1-row argmax broadcast, per-side windowed "
    "index offsets, fixed IEEE slope finishes; slope_delta is one "
    "subtraction of two hash-gated floats.",
    tags=("stats",),
)
def stat_piecewise_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOTE: this query uses a deliberate GLOBAL window (WindowExec prints
    # 'No Partition Defined'): the windowed table is calendar- or k-bounded
    # (<= ~100 rows at ANY corpus size), so a single partition is correct
    # and the warning is expected — do not re-triage (VERDICT r04 #3).

    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.expr("unix_millis(ts) div 86400000").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("y")).coalesce(1).persist()
    g = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("sy"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    c = daily.crossJoin(F.broadcast(g)).select(
        "day",
        (
            F.col("n") * F.sum("y").over(w)
            - F.row_number().over(Window.orderBy("day")).cast("long")
            * F.col("sy")
        )
        .cast("long")
        .alias("dev"),
    )
    cp = c.agg(
        F.max(F.struct(F.abs("dev").alias("a"), F.col("day").alias("d")))
        .alias("top"),
        F.max(F.abs("dev")).cast("long").alias("peak_dev"),
    ).select(F.col("top.d").alias("cp_day"), "peak_dev")
    sides = daily.crossJoin(F.broadcast(cp)).select(
        F.when(F.col("day") <= F.col("cp_day"), 0).otherwise(1).alias("side"),
        "day",
        "y",
        "cp_day",
        "peak_dev",
    )
    ws = Window.partitionBy("side")
    idx = sides.select(
        "side",
        "cp_day",
        "peak_dev",
        (F.col("day") - F.min("day").over(ws)).cast("long").alias("t"),
        "y",
    )
    comp = idx.groupBy("side", "cp_day", "peak_dev").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("t").cast("long").alias("st"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("t") * F.col("y")).cast("long").alias("sty"),
        F.sum(F.col("t") * F.col("t")).cast("long").alias("stt"),
    )
    num = F.col("n") * F.col("sty") - F.col("st") * F.col("sy")
    den = F.col("n") * F.col("stt") - F.col("st") * F.col("st")
    slopes = comp.select(
        "side",
        "cp_day",
        "peak_dev",
        "n",
        F.when(den == 0, F.lit(None).cast("double"))
        .otherwise(num.cast("double") / den.cast("double"))
        .alias("slope"),
    )
    pre = F.max(F.when(F.col("side") == 0, F.col("slope")))
    post = F.max(F.when(F.col("side") == 1, F.col("slope")))
    return slopes.groupBy("cp_day", "peak_dev").agg(
        F.max(F.when(F.col("side") == 0, F.col("n"))).cast("long").alias("n_pre"),
        F.max(F.when(F.col("side") == 1, F.col("n"))).cast("long").alias("n_post"),
        pre.alias("slope_pre"),
        post.alias("slope_post"),
        (post - pre).alias("slope_delta"),
    )


# ---------------------------------------------------------------------------
# Cohort LTV curve: cumulative value per user by account age.
# ---------------------------------------------------------------------------


@QS.add(
    "ltv_cumulative_by_cohort",
    """
    WITH e AS (
      SELECT user_id, epoch_ms(ts) // 86400000 AS day,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL
    ),
    first_seen AS (
      SELECT user_id, MIN(day) AS d0 FROM e GROUP BY user_id
    ),
    cohorts AS (
      SELECT user_id, d0, d0 // 7 AS cohort_week FROM first_seen
    ),
    sized AS (
      SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_users
      FROM cohorts GROUP BY cohort_week
    ),
    aged AS (
      SELECT c.cohort_week, e.day - c.d0 AS age_day,
             CAST(SUM(e.cents) AS BIGINT) AS day_cents
      FROM e JOIN cohorts c ON e.user_id = c.user_id
      GROUP BY c.cohort_week, e.day - c.d0
    ),
    cum AS (
      SELECT cohort_week, CAST(age_day AS BIGINT) AS age_day,
             CAST(SUM(day_cents) OVER (
               PARTITION BY cohort_week ORDER BY age_day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_cents
      FROM aged
    )
    SELECT cum.cohort_week, cum.age_day, cum.cum_cents, sized.cohort_users,
           CAST(cum.cum_cents AS DOUBLE) / CAST(sized.cohort_users AS DOUBLE)
             AS ltv_cents_per_user
    FROM cum JOIN sized ON cum.cohort_week = sized.cohort_week
    """,
    doc="[EXT] lifetime-value curves by acquisition cohort: users bucket "
    "into epoch-week cohorts at their first monetized event, value "
    "accumulates along ACCOUNT AGE (day minus each user's first day, so "
    "cohorts overlay on one x-axis), and each point reports exact "
    "cumulative cents plus the per-user LTV (one division by the fixed "
    "cohort size — denominators never shrink, the standard LTV-curve "
    "convention). The payback-period comparison every growth team "
    "plots; |cohorts x ages| rows, one cumsum window over the "
    "pre-aggregated (cohort, age) table, never events.",
    tags=("analytics",),
)
def ltv_cumulative_by_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    e = ev.select(
        "user_id",
        F.expr("unix_millis(ts) div 86400000").alias("day"),
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("cents"),
    )
    first_seen = e.groupBy("user_id").agg(F.min("day").alias("d0"))
    cohorts = first_seen.select(
        "user_id", "d0", F.expr("d0 div 7").alias("cohort_week")
    )
    sized = cohorts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_users")
    )
    aged = (
        e.join(cohorts, "user_id")
        .groupBy("cohort_week", (F.col("day") - F.col("d0")).alias("age_day"))
        .agg(F.sum("cents").cast("long").alias("day_cents"))
    )
    w = Window.partitionBy("cohort_week").orderBy("age_day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = aged.select(
        "cohort_week",
        F.col("age_day").cast("long").alias("age_day"),
        F.sum("day_cents").over(w).cast("long").alias("cum_cents"),
    )
    return cum.join(F.broadcast(sized), "cohort_week").select(
        "cohort_week",
        "age_day",
        "cum_cents",
        "cohort_users",
        (
            F.col("cum_cents").cast("double")
            / F.col("cohort_users").cast("double")
        ).alias("ltv_cents_per_user"),
    )


# ---------------------------------------------------------------------------
# Perceptual image dedup: dHash + banded near-duplicate search.
# ---------------------------------------------------------------------------

_DH_KEYS = 50        # images repeat every 50 docs -> planted exact dupes
_DH_BANDS = 4        # 56 dHash bits in 4 x 14-bit bands
_DH_MAXHAM = 6       # verify threshold (complete for hamming <= 3)


def _dhash_hex_sql() -> str:
    """Deterministic 8x8 image hex: md5 chain of doc_id % 50; odd docs
    get their last pixel forced to 0 — planted NEAR duplicates."""
    chain = " || ".join(
        f"md5('im{c}:' || CAST(doc_id % {_DH_KEYS} AS VARCHAR))"
        for c in range(4)
    )
    return (
        f"CASE WHEN (doc_id // {_DH_KEYS}) % 2 = 1"
        f" THEN substr({chain}, 1, 126) || '00' "
        f"ELSE {chain} END"
    )


def _dh_px_sql(i: int) -> str:
    return f"CAST('0x' || substr(hx, {2 * i + 1}, 2) AS INTEGER)"


def _dh_band_sql(b: int) -> str:
    terms = []
    for k in range(14):
        bit = b * 14 + k
        r, c = divmod(bit, 7)
        i, j = r * 8 + c, r * 8 + c + 1
        terms.append(
            f"CASE WHEN {_dh_px_sql(i)} > {_dh_px_sql(j)}"
            f" THEN CAST({1 << k} AS BIGINT) ELSE 0 END"
        )
    return "(" + " + ".join(terms) + ")"


@QS.add(
    "mm_image_dhash_neardups",
    f"""
    WITH hx AS (
      SELECT doc_id, {_dhash_hex_sql()} AS hx FROM documents
    ),
    h AS (
      SELECT doc_id,
             {_dh_band_sql(0)} AS b0, {_dh_band_sql(1)} AS b1,
             {_dh_band_sql(2)} AS b2, {_dh_band_sql(3)} AS b3
      FROM hx
    ),
    full_h AS (
      SELECT doc_id,
             CAST(b0 + (b1 << 14) + (b2 << 28) + (b3 << 42) AS BIGINT) AS dh,
             b0, b1, b2, b3
      FROM h
    ),
    cand AS (
      SELECT a.doc_id AS da, b.doc_id AS db, a.dh AS ha, b.dh AS hb
      FROM full_h a JOIN full_h b ON a.b0 = b.b0 AND a.doc_id < b.doc_id
      UNION
      SELECT a.doc_id, b.doc_id, a.dh, b.dh
      FROM full_h a JOIN full_h b ON a.b1 = b.b1 AND a.doc_id < b.doc_id
      UNION
      SELECT a.doc_id, b.doc_id, a.dh, b.dh
      FROM full_h a JOIN full_h b ON a.b2 = b.b2 AND a.doc_id < b.doc_id
      UNION
      SELECT a.doc_id, b.doc_id, a.dh, b.dh
      FROM full_h a JOIN full_h b ON a.b3 = b.b3 AND a.doc_id < b.doc_id
    )
    SELECT da, db, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
    FROM cand WHERE bit_count(xor(ha, hb)) <= {_DH_MAXHAM}
    """,
    doc="[EXT] perceptual image near-duplicate search — dHash (adjacent-"
    "pixel gradient sign, the classic 56-bit perceptual fingerprint "
    "robust to brightness/scale shifts) over deterministic 8x8 images "
    "(md5 of doc_id mod 50, planting exact-dup groups; alternate "
    "50-blocks get one pixel forced so NEAR-duplicates exist too), then banded LSH: 4 x "
    "14-bit bands, candidates from four equi-joins, verified by "
    "popcount of the XORed hashes — by pigeonhole the banding is "
    "COMPLETE for hamming <= 3 (4 bands cannot all differ), and both "
    "engines run the identical candidate generation so the <= 6 output "
    "hash-matches regardless. Entirely JVM-side column expressions "
    "(pixels via hex substr + conv — no Arrow kernel needed): the "
    "image-dedup counterpart of the text MinHash family.",
    tags=("multimodal", "dedup"),
)
def mm_image_dhash_neardups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id")
    chain = F.concat(
        *[
            F.md5(
                F.concat(
                    F.lit(f"im{c}:"), (F.col("doc_id") % _DH_KEYS).cast("string")
                )
            )
            for c in range(4)
        ]
    )
    hx = docs.select(
        "doc_id",
        F.when(
            F.expr(f"(doc_id div {_DH_KEYS}) % 2") == 1,
            F.concat(F.substring(chain, 1, 126), F.lit("00")),
        )
        .otherwise(chain)
        .alias("hx"),
    )

    def px(i: int) -> F.Column:
        return F.conv(F.substring(F.col("hx"), 2 * i + 1, 2), 16, 10).cast("int")

    def band(b: int) -> F.Column:
        out = F.lit(0).cast("long")
        for k in range(14):
            bit = b * 14 + k
            r, c = divmod(bit, 7)
            i, j = r * 8 + c, r * 8 + c + 1
            out = out + F.when(px(i) > px(j), F.lit(1 << k).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        return out

    h = hx.select(
        "doc_id",
        band(0).alias("b0"),
        band(1).alias("b1"),
        band(2).alias("b2"),
        band(3).alias("b3"),
    ).coalesce(8).persist()
    full_h = h.select(
        "doc_id",
        (
            F.col("b0")
            + F.shiftleft(F.col("b1"), 14)
            + F.shiftleft(F.col("b2"), 28)
            + F.shiftleft(F.col("b3"), 42)
        )
        .cast("long")
        .alias("dh"),
        "b0",
        "b1",
        "b2",
        "b3",
    ).persist()
    cands = None
    for bcol in ("b0", "b1", "b2", "b3"):
        a = full_h.select(
            F.col(bcol).alias("bb"), F.col("doc_id").alias("da"), F.col("dh").alias("ha")
        )
        b = full_h.select(
            F.col(bcol).alias("bb"), F.col("doc_id").alias("db"), F.col("dh").alias("hb")
        )
        p = a.join(b, "bb").filter(F.col("da") < F.col("db")).select(
            "da", "db", "ha", "hb"
        )
        cands = p if cands is None else cands.unionByName(p)
    cand = cands.distinct()
    ham = F.expr("bit_count(ha ^ hb)")
    return cand.filter(ham <= _DH_MAXHAM).select(
        "da", "db", ham.cast("long").alias("hamming")
    )


# ---------------------------------------------------------------------------
# Trimmed mean per event type (exact interior sum).
# ---------------------------------------------------------------------------


@QS.add(
    "stat_trimmed_mean_by_type",
    """
    WITH t AS (
      SELECT event_type,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
             event_id
      FROM events WHERE value IS NOT NULL
    ),
    r AS (
      SELECT event_type, cents,
             ROW_NUMBER() OVER (
               PARTITION BY event_type ORDER BY cents, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM t
    )
    SELECT event_type,
           CAST(MAX(n) AS BIGINT) AS n,
           CAST(COUNT(*) FILTER (rn > n // 20 AND rn <= n - n // 20)
                AS BIGINT) AS n_kept,
           CAST(SUM(cents) FILTER (rn > n // 20 AND rn <= n - n // 20)
                AS BIGINT) AS kept_cents,
           CAST(SUM(cents) FILTER (rn > n // 20 AND rn <= n - n // 20)
                AS DOUBLE)
             / CAST(COUNT(*) FILTER (rn > n // 20 AND rn <= n - n // 20)
                    AS DOUBLE) AS trimmed_mean_cents
    FROM r GROUP BY event_type
    """,
    doc="[EXT] 5% two-sided trimmed mean per event type — the robust "
    "location estimate between the mean (outlier-dragged) and the "
    "median (throws away 98% of the data): drop exactly floor(n/20) "
    "rows off each end of the (cents, event_id) total order and average "
    "the interior EXACTLY (BIGINT sum, one division). Integer rank "
    "arithmetic gives identical trim boundaries on both engines — a "
    "fractional-quantile trim would hit the interpolation divergences "
    "the percentile family documents.",
    tags=("stats",),
)
def stat_trimmed_mean_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    t = ev.select(
        "event_type",
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("cents"),
        "event_id",
    )
    w = Window.partitionBy("event_type").orderBy("cents", "event_id")
    wn = Window.partitionBy("event_type")
    r = t.select(
        "event_type",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    keep = (F.col("rn") > F.expr("n div 20")) & (
        F.col("rn") <= F.col("n") - F.expr("n div 20")
    )
    kept_n = F.sum(F.when(keep, 1).otherwise(0))
    kept_s = F.sum(F.when(keep, F.col("cents")))
    return r.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        kept_n.cast("long").alias("n_kept"),
        kept_s.cast("long").alias("kept_cents"),
        (kept_s.cast("double") / kept_n.cast("double")).alias(
            "trimmed_mean_cents"
        ),
    )


# ---------------------------------------------------------------------------
# Traffic shape diagnostics: burstiness (Fano) + concentration (HHI).
# ---------------------------------------------------------------------------


@QS.add(
    "stat_traffic_shape_by_type",
    """
    WITH daily AS (
      SELECT event_type, epoch_ms(ts) // 86400000 AS day,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY event_type, day
    ),
    hourly AS (
      SELECT event_type, epoch_ms(ts) // 3600000 AS hr,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY event_type, hr
    ),
    d AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM daily GROUP BY event_type
    ),
    h AS (
      SELECT event_type,
             CAST(SUM(c) AS BIGINT) AS n_events,
             CAST(SUM(c * c) AS BIGINT) AS scc
      FROM hourly GROUP BY event_type
    )
    SELECT d.event_type, d.n_days, d.sy, d.syy, h.scc,
           CAST(d.n_days * d.syy - d.sy * d.sy AS BIGINT) AS var_num,
           CASE WHEN d.sy = 0 THEN NULL
                ELSE CAST(d.n_days * d.syy - d.sy * d.sy AS DOUBLE)
                     / (CAST(d.n_days AS DOUBLE) * CAST(d.sy AS DOUBLE))
           END AS fano,
           CAST((h.scc * 1000000) // (h.n_events * h.n_events) AS BIGINT)
             AS hhi_ppm
    FROM d JOIN h ON d.event_type = h.event_type
    """,
    doc="[EXT] per-type traffic-shape diagnostics: the FANO FACTOR of "
    "daily volume (variance/mean — 1 for a Poisson stream, >1 = bursty, "
    "<1 = rate-limited/regular; fano = (nΣy²−(Σy)²)/(n·Σy), exact "
    "BIGINT numerator, ONE fixed IEEE division) and the HERFINDAHL "
    "concentration of hourly volume (Σ share² in exact floor-div ppm — "
    "1e6/|hours| when perfectly spread, 1e6 when one hour carries "
    "everything). Together they answer 'is this stream bursty, and is "
    "the burst concentrated?' — the capacity-planning pre-read before "
    "choosing partition counts and rate limits. Both from tiny "
    "calendar-bounded pre-aggregates.",
    tags=("stats", "quality"),
)
def stat_traffic_shape_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.expr("unix_millis(ts) div 86400000").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    hourly = ev.groupBy(
        "event_type", F.expr("unix_millis(ts) div 3600000").alias("hr")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    d = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    h = hourly.groupBy("event_type").agg(
        F.sum("c").cast("long").alias("n_events"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("scc"),
    )
    var_num = F.col("n_days") * F.col("syy") - F.col("sy") * F.col("sy")
    return d.join(h, "event_type").select(
        "event_type",
        "n_days",
        "sy",
        "syy",
        "scc",
        var_num.cast("long").alias("var_num"),
        F.when(F.col("sy") == 0, F.lit(None).cast("double"))
        .otherwise(
            var_num.cast("double")
            / (F.col("n_days").cast("double") * F.col("sy").cast("double"))
        )
        .alias("fano"),
        F.expr("(scc * 1000000) div (n_events * n_events)")
        .cast("long")
        .alias("hhi_ppm"),
    )


# ---------------------------------------------------------------------------
# Inter-arrival gap percentiles per stream.
# ---------------------------------------------------------------------------


@QS.add(
    "stat_interarrival_by_type",
    """
    WITH g AS (
      SELECT event_type,
             epoch_ms(ts) - lag(epoch_ms(ts)) OVER (
               PARTITION BY event_type ORDER BY ts, event_id) AS gap_ms,
             event_id
      FROM events
    ),
    r AS (
      SELECT event_type, gap_ms,
             ROW_NUMBER() OVER (
               PARTITION BY event_type ORDER BY gap_ms, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM g WHERE gap_ms IS NOT NULL
    )
    SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_gaps,
           CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN gap_ms END) AS BIGINT)
             AS p50_gap_ms,
           CAST(MAX(CASE WHEN rn = (19 * n + 19) // 20 THEN gap_ms END)
                AS BIGINT) AS p95_gap_ms,
           CAST(MAX(CASE WHEN rn = n THEN gap_ms END) AS BIGINT)
             AS max_gap_ms
    FROM r GROUP BY event_type
    """,
    doc="[EXT] inter-arrival gap distribution per event stream: exact "
    "p50/p95/max of consecutive-event gaps in milliseconds (lag over "
    "the (ts, event_id) total order, then type-1 quantiles by rank "
    "arithmetic — stat_percentile_bands_by_type's selection over a "
    "DERIVED series). p95 gap is the watermark-delay calibration "
    "number (how long a stream can silently pause before an alert "
    "should fire — dq_freshness_lag's threshold comes FROM this), and "
    "p50 vs mean gap exposes burstiness at the arrival grain.",
    tags=("stats", "temporal", "quality"),
)
def stat_interarrival_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    g = ev.select(
        "event_type",
        (
            F.unix_millis(F.col("ts"))
            - F.lag(F.unix_millis(F.col("ts"))).over(w)
        ).alias("gap_ms"),
        "event_id",
    ).filter(F.col("gap_ms").isNotNull())
    wr = Window.partitionBy("event_type").orderBy("gap_ms", "event_id")
    wn = Window.partitionBy("event_type")
    r = g.select(
        "event_type",
        "gap_ms",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    pick = lambda expr: F.max(  # noqa: E731
        F.when(F.col("rn") == F.expr(expr), F.col("gap_ms"))
    ).cast("long")
    return r.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n_gaps"),
        pick("(n + 1) div 2").alias("p50_gap_ms"),
        pick("(19 * n + 19) div 20").alias("p95_gap_ms"),
        pick("n").alias("max_gap_ms"),
    )


# ---------------------------------------------------------------------------
# Brown-Forsythe variance-homogeneity test (Levene with medians).
# ---------------------------------------------------------------------------


@QS.add(
    "stat_brown_forsythe",
    """
    WITH t AS (
      SELECT event_type,
             CAST(CAST(value AS DECIMAL(18,2)) * 200 AS BIGINT) AS c2
      FROM events WHERE value IS NOT NULL
    ),
    med AS (
      SELECT event_type, quantile_cont(c2, 0.5) AS med2
      FROM t GROUP BY event_type
    ),
    z AS (
      SELECT t.event_type,
             CAST(abs(CAST(t.c2 AS DOUBLE) - m.med2) AS BIGINT) AS x
      FROM t JOIN med m USING (event_type)
    ),
    pg AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_g,
             CAST(SUM(x) AS BIGINT) AS s_g,
             CAST(SUM(x * x) AS BIGINT) AS q_g
      FROM z GROUP BY event_type
    ),
    tt AS (
      SELECT event_type, n_g, s_g, q_g,
             (CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE))
               / CAST(n_g AS DOUBLE) AS term
      FROM pg
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(n_g) AS BIGINT) AS n,
             CAST(SUM(s_g) AS BIGINT) AS s_all,
             CAST(SUM(q_g) AS BIGINT) AS q_all,
             list_reduce(
               list_prepend(CAST(0 AS DOUBLE), list(term ORDER BY event_type)),
               (x, y) -> x + y) AS fold
      FROM tt
    )
    SELECT k, n, s_all, q_all,
           fold - (CAST(s_all AS DOUBLE) * CAST(s_all AS DOUBLE))
                    / CAST(n AS DOUBLE) AS ssb,
           CAST(q_all AS DOUBLE) - fold AS ssw,
           ((fold - (CAST(s_all AS DOUBLE) * CAST(s_all AS DOUBLE))
                      / CAST(n AS DOUBLE)) / CAST(k - 1 AS DOUBLE))
             / ((CAST(q_all AS DOUBLE) - fold) / CAST(n - k AS DOUBLE))
             AS f_stat
    FROM agg
    """,
    doc="[EXT] Brown-Forsythe variance-homogeneity test across event "
    "types — the robust Levene variant (deviations from MEDIANS, not "
    "means) that guards the ANOVA's equal-variance assumption: z = "
    "|x − median| per group, then the one-way ANOVA F machinery on z "
    "(stat_anova_f_types' exact sufficient-statistics form, pinned "
    "group-order fold for SSB). Medians ride DOUBLED cents (average of "
    "two even ints = exactly representable; the MAD discipline), so z "
    "is an exactly-integral double — the BIGINT cast is safe on both "
    "engines (truncate vs round-half-even agree on integral operands, "
    "round-6 rule). Σz² stays under int64 at the ANOVA's documented "
    "sf bound (z ≤ value range in doubled cents).",
    tags=("stats",),
)
def stat_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    t = ev.select(
        "event_type",
        (F.col("value").cast("decimal(18,2)") * 200).cast("long").alias("c2"),
    )
    med = t.groupBy("event_type").agg(F.expr("percentile(c2, 0.5)").alias("med2"))
    z = t.join(F.broadcast(med), "event_type").select(
        "event_type",
        F.abs(F.col("c2").cast("double") - F.col("med2")).cast("long").alias("x"),
    )
    pg = z.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum("x").cast("long").alias("s_g"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("q_g"),
    )
    tt = pg.select(
        "event_type",
        "n_g",
        "s_g",
        "q_g",
        (
            (F.col("s_g").cast("double") * F.col("s_g").cast("double"))
            / F.col("n_g").cast("double")
        ).alias("term"),
    )
    agg = tt.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n_g").cast("long").alias("n"),
        F.sum("s_g").cast("long").alias("s_all"),
        F.sum("q_g").cast("long").alias("q_all"),
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("event_type", "term"))),
            F.lit(0.0),
            lambda acc, s: acc + s["term"],
        ).alias("fold"),
    )
    ssb = F.col("fold") - (
        F.col("s_all").cast("double") * F.col("s_all").cast("double")
    ) / F.col("n").cast("double")
    ssw = F.col("q_all").cast("double") - F.col("fold")
    return agg.select(
        "k",
        "n",
        "s_all",
        "q_all",
        ssb.alias("ssb"),
        ssw.alias("ssw"),
        (
            (ssb / (F.col("k") - 1).cast("double"))
            / (ssw / (F.col("n") - F.col("k")).cast("double"))
        ).alias("f_stat"),
    )
