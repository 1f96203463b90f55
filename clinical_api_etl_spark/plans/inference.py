"""Statistical inference + sequence-LM prep + SQL-surface extensions. [EXT]

Round-7 family: hypothesis-test statistics under the exact-arithmetic
discipline (every component that CAN be an integer is a BIGINT; the final
test statistic is a fixed IEEE expression tree both engines evaluate
identically), an autocorrelation diagnostic, a dyadic-weight EWMA window,
a correlated LATERAL top-N, and trigram language-model counts.

Scale posture notes per query; shared rules:

- Rank statistics are computed from VALUE HISTOGRAMS, never per-row
  windows — the Mann-Whitney scan aggregates to (group, value) counts
  first, so the windowed cumulative walk touches |distinct values| rows,
  not |events|.
- Magnitude bound: cents ≤ ~5·10^4, so n·Σx² stays under 2^63 through
  sf≈0.3 per group; beyond that the components need a per-group mean
  offset (subtract a pivot before squaring) — documented, not needed at
  driver scales.

Reference parity: the reference has no inference surface (pandas means
only, ``etl.py:201-210``); this family is [EXT] toward the
training-data-pipeline mandate (corpus A/B comparisons, drift tests,
decay-weighted features, LM count tables).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clinical_api_etl_spark.functions.text import tokens
from clinical_api_etl_spark.plans.base import QuerySet
from clinical_api_etl_spark.sources.catalog import load

QS = QuerySet()

_HOUR_MS = 3600000

#: Exact cents view of ``events.value`` (both engines; value has 2 decimals).
_CENTS = "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"


def _cents() -> F.Column:
    return (F.col("value").cast("decimal(18,2)") * 100).cast("long")


# ---------------------------------------------------------------------------
# Mann-Whitney U (rank-sum) over all event-type pairs.
# ---------------------------------------------------------------------------


@QS.add(
    "stat_mannwhitney_pairs",
    f"""
    WITH t AS (
      SELECT event_type AS g, {_CENTS} AS x
      FROM events WHERE value IS NOT NULL
    ),
    hist AS (
      SELECT g, x, CAST(COUNT(*) AS BIGINT) AS c FROM t GROUP BY g, x
    ),
    types AS (SELECT DISTINCT g AS o FROM t),
    sides AS (
      SELECT least(h.g, ty.o) AS ga, greatest(h.g, ty.o) AS gb,
             h.g AS side, h.x AS x, h.c AS c
      FROM hist h JOIN types ty ON ty.o <> h.g
    ),
    merged AS (
      SELECT ga, gb, x,
             CAST(COALESCE(SUM(c) FILTER (WHERE side = ga), 0) AS BIGINT) AS ca,
             CAST(COALESCE(SUM(c) FILTER (WHERE side = gb), 0) AS BIGINT) AS cb
      FROM sides GROUP BY ga, gb, x
    ),
    walked AS (
      SELECT ga, gb, ca, cb, (ca + cb) AS tc,
             SUM(ca + cb) OVER (PARTITION BY ga, gb ORDER BY x
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) - (ca + cb) AS cum_before
      FROM merged
    )
    SELECT ga, gb,
           CAST(SUM(ca) AS BIGINT) AS n_a,
           CAST(SUM(cb) AS BIGINT) AS n_b,
           CAST(SUM(ca * (2 * cum_before + tc + 1))
                - SUM(ca) * (SUM(ca) + 1) AS BIGINT) AS u_a_x2,
           CAST(2 * SUM(ca) * SUM(cb)
                - (SUM(ca * (2 * cum_before + tc + 1))
                   - SUM(ca) * (SUM(ca) + 1)) AS BIGINT) AS u_b_x2,
           CAST(SUM(tc * tc * tc - tc) AS BIGINT) AS tie_adj
    FROM walked GROUP BY ga, gb
    """,
    doc="[EXT] Mann-Whitney U rank-sum test between every pair of event "
    "types over exact value cents — the nonparametric corpus-drift / A-B "
    "test. Tie handling is midrank, kept integer by DOUBLING: the doubled "
    "average rank of a tied block is 2·cum_before + t + 1 exactly, so "
    "U×2 and the tie-correction term Σ(t³−t) are exact BIGINTs (z-scores "
    "are one sqrt + division away and omitted to keep the output pure "
    "integer). Scale shape: ranks come from a (group, value) HISTOGRAM — "
    "the per-pair cumulative walk is a window over distinct values only, "
    "and the pair fan-out multiplies the histogram (×k−1), never the "
    "fact table. Sanity invariant u_a_x2 + u_b_x2 = 2·n_a·n_b is "
    "enforced by construction of u_b.",
    tags=("stats",),
)
def stat_mannwhitney_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    t = ev.select(F.col("event_type").alias("g"), _cents().alias("x"))
    return mannwhitney_from_samples(t)


def mannwhitney_from_samples(t: DataFrame) -> DataFrame:
    """Pairwise Mann-Whitney over any (g: string, x: long) sample frame —
    the histogram machinery the registry query and the hypothesis
    property gate share."""
    hist = t.groupBy("g", "x").agg(F.count(F.lit(1)).cast("long").alias("c"))
    types = t.select(F.col("g").alias("o")).distinct()
    sides = hist.join(F.broadcast(types), F.col("o") != F.col("g")).select(
        F.least("g", "o").alias("ga"),
        F.greatest("g", "o").alias("gb"),
        F.col("g").alias("side"),
        "x",
        "c",
    )
    merged = sides.groupBy("ga", "gb", "x").agg(
        F.coalesce(F.sum(F.when(F.col("side") == F.col("ga"), F.col("c"))), F.lit(0))
        .cast("long")
        .alias("ca"),
        F.coalesce(F.sum(F.when(F.col("side") == F.col("gb"), F.col("c"))), F.lit(0))
        .cast("long")
        .alias("cb"),
    )
    w = (
        Window.partitionBy("ga", "gb")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tc = F.col("ca") + F.col("cb")
    walked = merged.select(
        "ga",
        "gb",
        "ca",
        "cb",
        tc.alias("tc"),
        (F.sum(tc).over(w) - tc).alias("cum_before"),
    )
    agg = walked.groupBy("ga", "gb").agg(
        F.sum("ca").cast("long").alias("n_a"),
        F.sum("cb").cast("long").alias("n_b"),
        F.sum(F.col("ca") * (2 * F.col("cum_before") + F.col("tc") + 1)).alias("ra2"),
        F.sum(F.col("tc") * F.col("tc") * F.col("tc") - F.col("tc"))
        .cast("long")
        .alias("tie_adj"),
    )
    u_a = F.col("ra2") - F.col("n_a") * (F.col("n_a") + 1)
    return agg.select(
        "ga",
        "gb",
        "n_a",
        "n_b",
        u_a.cast("long").alias("u_a_x2"),
        (2 * F.col("n_a") * F.col("n_b") - u_a).cast("long").alias("u_b_x2"),
        "tie_adj",
    )


# ---------------------------------------------------------------------------
# Kolmogorov-Smirnov two-sample statistic over all event-type pairs.
# ---------------------------------------------------------------------------

#: The registry queries' (g, x) sample source; the EDF property gate
#: (tests/test_properties.py) formats the same oracle bodies over an
#: arbitrary generated sample table instead.
_EDF_SRC = f"""
      SELECT event_type AS g, {_CENTS} AS x
      FROM events WHERE value IS NOT NULL
    """


def _ks_oracle(src: str) -> str:
    """DuckDB KS SQL over any (g: VARCHAR, x: BIGINT) sample source —
    shared by the registry oracle and the EDF property gate."""
    return f"""
    WITH t AS ({src}),
    hist AS (
      SELECT g, x, CAST(COUNT(*) AS BIGINT) AS c FROM t GROUP BY g, x
    ),
    types AS (SELECT DISTINCT g AS o FROM t),
    sides AS (
      SELECT least(h.g, ty.o) AS ga, greatest(h.g, ty.o) AS gb,
             h.g AS side, h.x AS x, h.c AS c
      FROM hist h JOIN types ty ON ty.o <> h.g
    ),
    merged AS (
      SELECT ga, gb, x,
             CAST(COALESCE(SUM(c) FILTER (WHERE side = ga), 0) AS BIGINT) AS ca,
             CAST(COALESCE(SUM(c) FILTER (WHERE side = gb), 0) AS BIGINT) AS cb
      FROM sides GROUP BY ga, gb, x
    ),
    walked AS (
      SELECT ga, gb,
             SUM(ca) OVER w AS cum_a, SUM(cb) OVER w AS cum_b
      FROM merged
      WINDOW w AS (PARTITION BY ga, gb ORDER BY x
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    totals AS (
      SELECT ga, gb, MAX(cum_a) AS n_a, MAX(cum_b) AS n_b
      FROM walked GROUP BY ga, gb
    )
    SELECT w.ga, w.gb,
           CAST(MAX(t.n_a) AS BIGINT) AS n_a,
           CAST(MAX(t.n_b) AS BIGINT) AS n_b,
           CAST(MAX(abs(w.cum_a * t.n_b - w.cum_b * t.n_a)) AS BIGINT) AS d_num,
           CAST(MAX(abs(w.cum_a * t.n_b - w.cum_b * t.n_a)) AS DOUBLE)
             / CAST(MAX(t.n_a) * MAX(t.n_b) AS DOUBLE) AS d
    FROM walked w JOIN totals t ON w.ga = t.ga AND w.gb = t.gb
    GROUP BY w.ga, w.gb
    """


@QS.add(
    "stat_ks_pairs",
    _ks_oracle(_EDF_SRC),
    doc="[EXT] two-sample Kolmogorov-Smirnov statistic between every pair "
    "of event types: D = max_x |F_a(x) − F_b(x)|, computed EXACTLY as "
    "max |cum_a·n_b − cum_b·n_a| over the merged value histogram (the "
    "empirical CDFs only step at observed values, so the histogram walk "
    "sees every candidate maximum). Same scale shape as "
    "stat_mannwhitney_pairs — the windowed walk runs over (pair, "
    "distinct-value) rows, never events; d_num is a BIGINT and the "
    "reported D one IEEE division. The distribution-drift gate for "
    "corpus re-balancing (detects shape changes mean-based tests miss).",
    tags=("stats",),
)
def stat_ks_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    t = ev.select(F.col("event_type").alias("g"), _cents().alias("x"))
    return ks_from_samples(t)


def ks_from_samples(t: DataFrame) -> DataFrame:
    """Pairwise two-sample KS over any (g: string, x: long) sample frame
    (shared by the registry query and the property gate)."""
    hist = t.groupBy("g", "x").agg(F.count(F.lit(1)).cast("long").alias("c"))
    types = t.select(F.col("g").alias("o")).distinct()
    sides = hist.join(F.broadcast(types), F.col("o") != F.col("g")).select(
        F.least("g", "o").alias("ga"),
        F.greatest("g", "o").alias("gb"),
        F.col("g").alias("side"),
        "x",
        "c",
    )
    merged = sides.groupBy("ga", "gb", "x").agg(
        F.coalesce(F.sum(F.when(F.col("side") == F.col("ga"), F.col("c"))), F.lit(0))
        .cast("long")
        .alias("ca"),
        F.coalesce(F.sum(F.when(F.col("side") == F.col("gb"), F.col("c"))), F.lit(0))
        .cast("long")
        .alias("cb"),
    )
    w = (
        Window.partitionBy("ga", "gb")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    walked = merged.select(
        "ga",
        "gb",
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
    )
    # n_a/n_b are the final cumulative totals; D's numerator needs them per
    # row, so aggregate twice on the tiny walked table (still one shuffle
    # tree — the second agg groups the first's output).
    totals = walked.groupBy("ga", "gb").agg(
        F.max("cum_a").alias("n_a"), F.max("cum_b").alias("n_b")
    )
    joined = walked.join(F.broadcast(totals), ["ga", "gb"])
    agg = joined.groupBy("ga", "gb").agg(
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
        F.max(
            F.abs(F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a"))
        ).alias("d_num"),
    )
    return agg.select(
        "ga",
        "gb",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("d_num").cast("long").alias("d_num"),
        (
            F.col("d_num").cast("double")
            / (F.col("n_a") * F.col("n_b")).cast("double")
        ).alias("d"),
    )


# ---------------------------------------------------------------------------
# Welch's t-test over all event-type pairs.
# ---------------------------------------------------------------------------


@QS.add(
    "stat_welch_ttest_pairs",
    f"""
    WITH t AS (
      SELECT event_type AS g, {_CENTS} AS x
      FROM events WHERE value IS NOT NULL
    ),
    c AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM t GROUP BY g
    )
    SELECT a.g AS ga, b.g AS gb, a.n AS n_a, b.n AS n_b,
           CAST(a.n * a.sxx - a.sx * a.sx AS BIGINT) AS ssq_a,
           CAST(b.n * b.sxx - b.sx * b.sx AS BIGINT) AS ssq_b,
           (CAST(a.sx AS DOUBLE) / CAST(a.n AS DOUBLE)
            - CAST(b.sx AS DOUBLE) / CAST(b.n AS DOUBLE))
             / sqrt(CAST(a.n * a.sxx - a.sx * a.sx AS DOUBLE)
                      / CAST(a.n * a.n * (a.n - 1) AS DOUBLE)
                    + CAST(b.n * b.sxx - b.sx * b.sx AS DOUBLE)
                      / CAST(b.n * b.n * (b.n - 1) AS DOUBLE)) AS t_welch
    FROM c a JOIN c b ON a.g < b.g
    """,
    doc="[EXT] Welch's unequal-variance t statistic between every pair of "
    "event types on exact cents. The sufficient statistics (n, Σx, Σx²) "
    "are ONE map-side-combinable aggregate — the mergeable form a 100 TB "
    "scan ships per partition; the pair join runs on the k-row aggregate "
    "(k² never N²). The float t is a FIXED expression tree — two "
    "divisions of exact BIGINTs per side, one add, one correctly-rounded "
    "sqrt, one subtract, one divide — applied in the same order by both "
    "engines, so it hash-matches bit-identically (same discipline as "
    "stat_pearson_value_time). ssq components stay integer for "
    "downstream exact use.",
    tags=("stats",),
)
def stat_welch_ttest_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    t = ev.select(F.col("event_type").alias("g"), _cents().alias("x"))
    c = t.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    a = c.select(*[F.col(x).alias(f"{x}_a") for x in ("g", "n", "sx", "sxx")])
    b = c.select(*[F.col(x).alias(f"{x}_b") for x in ("g", "n", "sx", "sxx")])
    j = a.join(F.broadcast(b), F.col("g_a") < F.col("g_b"))

    def ssq(s: str) -> F.Column:
        return F.col(f"n_{s}") * F.col(f"sxx_{s}") - F.col(f"sx_{s}") * F.col(
            f"sx_{s}"
        )

    def s2n(s: str) -> F.Column:
        den = F.col(f"n_{s}") * F.col(f"n_{s}") * (F.col(f"n_{s}") - 1)
        return ssq(s).cast("double") / den.cast("double")

    mean_diff = F.col("sx_a").cast("double") / F.col("n_a").cast(
        "double"
    ) - F.col("sx_b").cast("double") / F.col("n_b").cast("double")
    return j.select(
        F.col("g_a").alias("ga"),
        F.col("g_b").alias("gb"),
        F.col("n_a"),
        F.col("n_b"),
        ssq("a").cast("long").alias("ssq_a"),
        ssq("b").cast("long").alias("ssq_b"),
        (mean_diff / F.sqrt(s2n("a") + s2n("b"))).alias("t_welch"),
    )


# ---------------------------------------------------------------------------
# Lag-1 autocorrelation of the hourly revenue series.
# ---------------------------------------------------------------------------


@QS.add(
    "stat_autocorr_lag1",
    f"""
    WITH hourly AS (
      SELECT event_type, epoch_ms(ts) // {_HOUR_MS} AS h,
             CAST(SUM({_CENTS}) AS BIGINT) AS s
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, h
    ),
    lagged AS (
      SELECT event_type, s AS y,
             lag(s) OVER (PARTITION BY event_type ORDER BY h) AS x,
             h - lag(h) OVER (PARTITION BY event_type ORDER BY h) AS dh
      FROM hourly
    ),
    pairs AS (SELECT event_type, x, y FROM lagged WHERE dh = 1),
    c AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM pairs GROUP BY event_type
    )
    SELECT event_type, n,
           CAST(n * sxy - sx * sy AS BIGINT) AS num,
           CAST(n * sxx - sx * sx AS BIGINT) AS den_x,
           CAST(n * syy - sy * sy AS BIGINT) AS den_y,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS r
    FROM c
    """,
    doc="[EXT] lag-1 autocorrelation of each event type's hourly revenue "
    "series (exact cents): the time-series persistence diagnostic that "
    "decides whether seasonal-naive (ts_seasonal_naive_eval) or "
    "last-value forecasting is defensible. Shape: the fact table "
    "collapses to an |hours|-sized pre-aggregate FIRST, the lag window "
    "walks that pre-aggregate (same cost law as ts_seasonal_naive_eval), "
    "gap hours pair with nothing (dh = 1 guard) rather than faking "
    "adjacency, and the Pearson machinery on the pairs is the exact "
    "integer component form with the one fixed-order float finish.",
    tags=("stats", "timeseries"),
)
def stat_autocorr_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    hourly = (
        ev.select(
            "event_type",
            F.expr(f"unix_millis(ts) div {_HOUR_MS}").alias("h"),
            _cents().alias("cents"),
        )
        .groupBy("event_type", "h")
        .agg(F.sum("cents").cast("long").alias("s"))
    )
    w = Window.partitionBy("event_type").orderBy("h")
    lagged = hourly.select(
        "event_type",
        F.col("s").alias("y"),
        F.lag("s").over(w).alias("x"),
        (F.col("h") - F.lag("h").over(w)).alias("dh"),
    )
    pairs = lagged.filter(F.col("dh") == 1)
    c = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den_x = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    den_y = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return c.select(
        "event_type",
        "n",
        num.cast("long").alias("num"),
        den_x.cast("long").alias("den_x"),
        den_y.cast("long").alias("den_y"),
        (
            num.cast("double")
            / (F.sqrt(den_x.cast("double")) * F.sqrt(den_y.cast("double")))
        ).alias("r"),
    )


# ---------------------------------------------------------------------------
# Dyadic-weight EWMA window (exact decay-weighted feature).
# ---------------------------------------------------------------------------

_EWMA_DEPTH = 8


def _ewma_sql() -> tuple[str, str]:
    """(num_expr, den_expr) over lag(x, i) with weights 2^(depth-1-i)."""
    num, den = [], []
    for i in range(_EWMA_DEPTH):
        w = 1 << (_EWMA_DEPTH - 1 - i)
        x = "x" if i == 0 else f"lag(x, {i}) OVER uw"
        num.append(f"COALESCE({x} * {w}, 0)")
        den.append(f"CASE WHEN {x} IS NOT NULL THEN {w} ELSE 0 END")
    return " + ".join(num), " + ".join(den)


@QS.add(
    "w15_ewma_dyadic",
    f"""
    WITH t AS (
      SELECT user_id, event_id, {_CENTS} AS x, ts
      FROM events WHERE value IS NOT NULL
    )
    SELECT user_id, event_id,
           CAST({_ewma_sql()[0]} AS BIGINT) AS num,
           CAST({_ewma_sql()[1]} AS BIGINT) AS den,
           CAST({_ewma_sql()[0]} AS DOUBLE)
             / CAST({_ewma_sql()[1]} AS DOUBLE) AS ewma
    FROM t
    WINDOW uw AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="[EXT] exponentially-decay-weighted moving average as an EXACT "
    "window: weights are the dyadic ladder 2^7..2^0 over the current + 7 "
    "preceding events per user, so numerator and normalizer are BIGINTs "
    "(no float powers, no fp accumulation drift) and the emitted ewma is "
    "ONE IEEE division — hash-matches across engines. Partial windows "
    "renormalize over the weights actually present (den tracks "
    "presence), matching pandas ewm(adjust=True) semantics restricted "
    "to a depth-8 horizon (weight below 2^-8 is under float ulp of the "
    "head anyway). One shuffle: all 8 lags share one window spec. The "
    "decayed-revenue feature for recsys/feature-store pipelines.",
    tags=("window", "timeseries"),
)
def w15_ewma_dyadic(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    t = ev.select("user_id", "event_id", _cents().alias("x"), "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    num = F.lit(0).cast("long")
    den = F.lit(0).cast("long")
    for i in range(_EWMA_DEPTH):
        wt = 1 << (_EWMA_DEPTH - 1 - i)
        x = F.col("x") if i == 0 else F.lag("x", i).over(w)
        num = num + F.coalesce(x * wt, F.lit(0))
        den = den + F.when(x.isNotNull(), F.lit(wt)).otherwise(F.lit(0))
    return t.select(
        "user_id",
        "event_id",
        num.cast("long").alias("num"),
        den.cast("long").alias("den"),
        (num.cast("double") / den.cast("double")).alias("ewma"),
    )


# ---------------------------------------------------------------------------
# Mann-Kendall monotonic-trend test on the hourly series.
# ---------------------------------------------------------------------------


@QS.add(
    "stat_mannkendall_trend",
    f"""
    WITH hourly AS (
      SELECT event_type, epoch_ms(ts) // {_HOUR_MS} AS h,
             CAST(SUM({_CENTS}) AS BIGINT) AS s
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, h
    ),
    pairs AS (
      SELECT a.event_type,
             CASE WHEN b.s > a.s THEN 1 WHEN b.s < a.s THEN -1 ELSE 0 END AS sg
      FROM hourly a JOIN hourly b
        ON a.event_type = b.event_type AND a.h < b.h
    ),
    counts AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM hourly GROUP BY event_type
    ),
    agg AS (
      SELECT event_type,
             CAST(SUM(sg) AS BIGINT) AS s_stat,
             CAST(SUM(CASE WHEN sg > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS concordant,
             CAST(SUM(CASE WHEN sg < 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS discordant
      FROM pairs GROUP BY event_type
    )
    SELECT agg.event_type, counts.n, agg.s_stat, agg.concordant, agg.discordant
    FROM agg JOIN counts ON agg.event_type = counts.event_type
    """,
    doc="[EXT] Mann-Kendall monotonic-trend statistic per event type: "
    "S = Σ_{{i<j}} sign(s_j − s_i) over the HOURLY pre-aggregate, plus "
    "the concordant/discordant pair counts (Kendall tau's numerator "
    "pieces) — all exact BIGINTs. The pairwise self-join is quadratic in "
    "the SERIES length, which is calendar-bounded (hours in the window), "
    "not data-bounded — the same cost law as trend_theil_sen's slope "
    "pairs, and the reason both run on the time-bucketed aggregate, "
    "never raw events. The nonparametric is-revenue-drifting gate that "
    "needs no distributional assumptions.",
    tags=("stats", "timeseries"),
)
def stat_mannkendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    hourly = (
        ev.select(
            "event_type",
            F.expr(f"unix_millis(ts) div {_HOUR_MS}").alias("h"),
            _cents().alias("cents"),
        )
        .groupBy("event_type", "h")
        .agg(F.sum("cents").cast("long").alias("s"))
    )
    a = hourly.select(
        F.col("event_type"), F.col("h").alias("ha"), F.col("s").alias("sa")
    )
    b = hourly.select(
        F.col("event_type").alias("et_b"), F.col("h").alias("hb"), F.col("s").alias("sb")
    )
    pairs = a.join(
        b, (F.col("event_type") == F.col("et_b")) & (F.col("ha") < F.col("hb"))
    ).select(
        "event_type",
        F.when(F.col("sb") > F.col("sa"), 1)
        .when(F.col("sb") < F.col("sa"), -1)
        .otherwise(0)
        .alias("sg"),
    )
    counts = hourly.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    agg = pairs.groupBy("event_type").agg(
        F.sum("sg").cast("long").alias("s_stat"),
        F.sum(F.when(F.col("sg") > 0, 1).otherwise(0)).cast("long").alias("concordant"),
        F.sum(F.when(F.col("sg") < 0, 1).otherwise(0)).cast("long").alias("discordant"),
    )
    return agg.join(F.broadcast(counts), "event_type").select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        "s_stat",
        "concordant",
        "discordant",
    )


# ---------------------------------------------------------------------------
# Correlated LATERAL top-N (SQL surface).
# ---------------------------------------------------------------------------

_LATERAL_SQL = """
    SELECT n_name, c_custkey AS custkey, c_name, c_acctbal
    FROM {nation}, LATERAL (
      SELECT c_custkey, c_name, c_acctbal
      FROM {customer}
      WHERE c_nationkey = n_nationkey
      ORDER BY c_acctbal DESC, c_custkey
      LIMIT 2
    )
"""


@QS.add(
    "sql_lateral_topn",
    _LATERAL_SQL.format(nation="nation", customer="customer"),
    doc="[EXT] correlated LATERAL subquery with ORDER BY + LIMIT: the "
    "top-2 customers by account balance per nation, written as the "
    "for-each-row join the SQL surface owes power users — identical "
    "query text runs on DuckDB as the oracle. Catalyst decorrelates the "
    "lateral into a rank window over ONE customer shuffle (no per-nation "
    "re-scan), applies WindowGroupLimit so each map task keeps only its "
    "local top-2 per nation BEFORE the exchange, and broadcast-joins "
    "nation back — strictly better than the naive per-group window "
    "rewrite, and free at 100 TB. LIMIT ties broken by c_custkey for a "
    "deterministic boundary.",
    tags=("join", "sql", "window"),
)
def sql_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "nation").createOrReplaceTempView("lat_nation")
    load(spark, sf_dir, "customer").createOrReplaceTempView("lat_customer")
    return spark.sql(_LATERAL_SQL.format(nation="lat_nation", customer="lat_customer"))


# ---------------------------------------------------------------------------
# Trigram language-model counts with exact conditional probabilities.
# ---------------------------------------------------------------------------

_TRI_MIN_COUNT = 2
_TOKS = r"regexp_split_to_array(lower(trim(text)), '\s+')"


@QS.add(
    "text_trigram_lm",
    f"""
    WITH t AS (SELECT {_TOKS} AS toks FROM documents),
    tri AS (
      SELECT g['w1'] AS w1, g['w2'] AS w2, g['w3'] AS w3,
             CAST(COUNT(*) AS BIGINT) AS c3
      FROM (
        SELECT unnest(list_transform(range(1, len(toks) - 1),
                 i -> {{'w1': toks[i], 'w2': toks[i + 1],
                        'w3': toks[i + 2]}})) AS g
        FROM t WHERE len(toks) >= 3
      )
      GROUP BY w1, w2, w3
    ),
    ctx AS (
      SELECT w1, w2, CAST(SUM(c3) AS BIGINT) AS c2
      FROM tri GROUP BY w1, w2
    )
    SELECT tri.w1, tri.w2, tri.w3, tri.c3, ctx.c2,
           tri.c3 * 1000000 // ctx.c2 AS cond_ppm
    FROM tri JOIN ctx ON tri.w1 = ctx.w1 AND tri.w2 = ctx.w2
    WHERE tri.c3 >= {_TRI_MIN_COUNT}
    """,
    doc="[EXT] trigram language-model count table (the KenLM/Kneser-Ney "
    "ingestion precursor and the classic perplexity-filter backbone): "
    "per trigram with count ≥ 2, its count, its context-bigram count, "
    "and the MLE conditional p(w3|w1,w2) in exact parts-per-million "
    "(scale-then-floor-div — Spark `div` == DuckDB `//` on "
    "non-negatives, zero fp risk). Context counts derive from the "
    "trigram aggregate itself (Σ_w3 c3 — an aggregate OF the aggregate), "
    "so the corpus is tokenized and exploded exactly ONCE; the "
    "ctx re-join is an equi-join on the reduced table. The min-count "
    "filter applies after context counting, so cond_ppm denominators "
    "are the true totals.",
    tags=("text",),
)
def text_trigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks_df = docs.select(tokens(F.col("text")).alias("toks"))
    grams = F.when(
        F.size("toks") >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - 2),
            lambda i: F.struct(
                F.element_at("toks", i).alias("w1"),
                F.element_at("toks", i + 1).alias("w2"),
                F.element_at("toks", i + 2).alias("w3"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string,w3:string>>"))
    tri = (
        toks_df.select(F.explode_outer(grams).alias("g"))
        .filter(F.col("g").isNotNull())
        .select("g.w1", "g.w2", "g.w3")
        .groupBy("w1", "w2", "w3")
        .agg(F.count(F.lit(1)).cast("long").alias("c3"))
    )
    ctx = tri.groupBy("w1", "w2").agg(F.sum("c3").cast("long").alias("c2"))
    return (
        tri.filter(F.col("c3") >= _TRI_MIN_COUNT)
        .join(ctx, ["w1", "w2"])
        .select(
            "w1",
            "w2",
            "w3",
            "c3",
            "c2",
            F.expr("c3 * 1000000 div c2").alias("cond_ppm"),
        )
    )


def _doc_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, w1, w2, w3) — one row per trigram occurrence."""
    docs = load(spark, sf_dir, "documents")
    toks_df = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    grams = F.when(
        F.size("toks") >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - 2),
            lambda i: F.struct(
                F.element_at("toks", i).alias("w1"),
                F.element_at("toks", i + 1).alias("w2"),
                F.element_at("toks", i + 2).alias("w3"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string,w3:string>>"))
    return (
        toks_df.select("doc_id", F.explode_outer(grams).alias("g"))
        .filter(F.col("g").isNotNull())
        .select("doc_id", "g.w1", "g.w2", "g.w3")
    )


@QS.add(
    "text_lm_familiarity",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    occ AS (
      SELECT doc_id, g['w1'] AS w1, g['w2'] AS w2, g['w3'] AS w3
      FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(toks) - 1),
                 i -> {{'w1': toks[i], 'w2': toks[i + 1],
                        'w3': toks[i + 2]}})) AS g
        FROM t WHERE len(toks) >= 3
      )
    ),
    tri AS (
      SELECT w1, w2, w3, CAST(COUNT(*) AS BIGINT) AS c3
      FROM occ GROUP BY w1, w2, w3
    ),
    ctx AS (
      SELECT w1, w2, CAST(SUM(c3) AS BIGINT) AS c2 FROM tri GROUP BY w1, w2
    ),
    scored AS (
      SELECT occ.doc_id, tri.c3 * 1000000 // ctx.c2 AS ppm
      FROM occ
      JOIN tri ON occ.w1 = tri.w1 AND occ.w2 = tri.w2 AND occ.w3 = tri.w3
      JOIN ctx ON occ.w1 = ctx.w1 AND occ.w2 = ctx.w2
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_trigrams,
           CAST(SUM(ppm) AS BIGINT) AS sum_ppm,
           SUM(ppm) // COUNT(*) AS mean_ppm
    FROM scored GROUP BY doc_id
    """,
    doc="[EXT] per-document language-model familiarity — the "
    "perplexity-filter proxy (CCNet/Gopher keep-well-modeled-text "
    "signal) with zero logarithms: every trigram occurrence is scored "
    "by its corpus MLE conditional probability in exact ppm "
    "(text_trigram_lm's table, self-trained on the same corpus), and "
    "each doc reports the exact integer mean. Low mean_ppm = the "
    "doc's word sequences are rare given their contexts = surprising "
    "text. Shape: ONE tokenize/explode pass feeds both the count "
    "tables and the per-doc re-join; the equi-joins run on hashed "
    "trigram keys. Arithmetic-mean-of-ppm replaces "
    "geometric-mean-perplexity so the score stays engine-portable "
    "(floor-div, no floats at all).",
    tags=("text",),
)
def text_lm_familiarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    occ = _doc_trigrams(spark, sf_dir)
    # Two aggregates + a re-join read `occ` three times; materialize the
    # narrow occurrence table once (it is the tokenization's only output).
    occ = occ.persist()
    tri = occ.groupBy("w1", "w2", "w3").agg(
        F.count(F.lit(1)).cast("long").alias("c3")
    )
    ctx = tri.groupBy("w1", "w2").agg(F.sum("c3").cast("long").alias("c2"))
    scored = (
        occ.join(tri, ["w1", "w2", "w3"])
        .join(ctx, ["w1", "w2"])
        .select("doc_id", F.expr("c3 * 1000000 div c2").alias("ppm"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_trigrams"),
        F.sum("ppm").cast("long").alias("sum_ppm"),
        F.expr("sum(ppm) div count(*)").alias("mean_ppm"),
    )




# ---------------------------------------------------------------------------
# BPE tokenizer merge learning (iterative, hash-gated end to end).
# ---------------------------------------------------------------------------

_BPE_MERGES = 6


def _bpe_oracle(n: int) -> str:
    """Unrolled DuckDB twin of operators/bpe.py:learn_bpe — every chained
    CTE MATERIALIZED (DuckDB inlines multiply-referenced CTEs otherwise
    and the iteration chain re-expands exponentially; see the k-core
    oracle)."""
    ctes = [
        f"toks AS (SELECT {_TOKS} AS t FROM documents)",
        "w AS MATERIALIZED (SELECT tok AS word, CAST(COUNT(*) AS BIGINT)"
        " AS freq FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY tok)",
        "s0 AS MATERIALIZED (SELECT freq,"
        " regexp_replace(word, '(.)', '\\1 ', 'g') || '</w>' AS sym FROM w)",
    ]
    for i in range(1, n + 1):
        ctes.append(
            f"p{i} AS ("
            " SELECT p['lhs'] AS lhs, p['rhs'] AS rhs,"
            " CAST(SUM(freq) AS BIGINT) AS pair_count"
            " FROM (SELECT freq, unnest(list_transform(range(1, len(tk)),"
            " j -> {'lhs': tk[j], 'rhs': tk[j + 1]})) AS p"
            f" FROM (SELECT freq, string_split(sym, ' ') AS tk FROM s{i - 1}))"
            " GROUP BY lhs, rhs)"
        )
        ctes.append(
            f"m{i} AS MATERIALIZED (SELECT lhs, rhs, pair_count FROM p{i}"
            " ORDER BY pair_count DESC, lhs, rhs LIMIT 1)"
        )
        ctes.append(
            f"s{i} AS MATERIALIZED (SELECT freq,"
            " trim(replace(replace(' ' || replace(sym, ' ', '  ') || ' ',"
            f" ' ' || (SELECT lhs FROM m{i}) || '  ' || (SELECT rhs FROM m{i}) || ' ',"
            f" ' ' || (SELECT lhs FROM m{i}) || (SELECT rhs FROM m{i}) || ' '),"
            f" '  ', ' ')) AS sym FROM s{i - 1})"
        )
    union = " UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS it, lhs, rhs, lhs || rhs AS merged,"
        f" pair_count FROM m{i}"
        for i in range(1, n + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + union


@QS.add(
    "bpe_learn_merges",
    _bpe_oracle(_BPE_MERGES),
    doc="[EXT] BPE tokenizer training (Sennrich'16; the GPT-2/LLaMA "
    "tokenizer family): learn the first 6 merge rules from the corpus "
    "word-frequency table. Iterative model training under a FULL "
    "cross-engine value hash — pair counting is a map-side-combinable "
    "explode/groupBy over the (word, freq) aggregate (millions of rows "
    "at 100 TB, never the corpus), the per-iteration argmax collects "
    "ONE row (freq DESC then lexicographic — deterministic ties), and "
    "merge application is a regex-free space-doubling replace chain "
    "with identical left-to-right non-overlapping semantics in the JVM, "
    "DuckDB, and python str.replace (operators/bpe.py). Oracle = "
    "unrolled MATERIALIZED CTE chain, one (pairs, argmax, rewrite) "
    "triple per iteration.",
    tags=("text", "iterative"),
    headline=True,
)
def bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.bpe import learn_bpe_distributed

    docs = load(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode_outer(tokens(F.col("text"))).alias("word"))
        .filter(F.col("word").isNotNull())
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    rows = learn_bpe_distributed(words, _BPE_MERGES)
    return spark.createDataFrame(
        rows, schema="it BIGINT, lhs STRING, rhs STRING, merged STRING, pair_count BIGINT"
    )


# ---------------------------------------------------------------------------
# Kendall tau-b between time and the hourly series (exact components).
# ---------------------------------------------------------------------------


@QS.add(
    "stat_kendall_tau_hourly",
    f"""
    WITH hourly AS (
      SELECT event_type, epoch_ms(ts) // {_HOUR_MS} AS h,
             CAST(SUM({_CENTS}) AS BIGINT) AS s
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, h
    ),
    pairs AS (
      SELECT a.event_type,
             CASE WHEN b.s > a.s THEN 1 WHEN b.s < a.s THEN -1 ELSE 0 END AS sg
      FROM hourly a JOIN hourly b
        ON a.event_type = b.event_type AND a.h < b.h
    ),
    sagg AS (
      SELECT event_type, CAST(SUM(sg) AS BIGINT) AS s_stat
      FROM pairs GROUP BY event_type
    ),
    counts AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM hourly GROUP BY event_type
    ),
    yties AS (
      SELECT event_type,
             CAST(COALESCE(SUM(t * (t - 1) // 2), 0) AS BIGINT) AS n2
      FROM (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS t
            FROM hourly GROUP BY event_type, s)
      GROUP BY event_type
    )
    SELECT c.event_type, c.n, sagg.s_stat,
           CAST(c.n * (c.n - 1) // 2 AS BIGINT) AS n0,
           yties.n2 AS n2,
           CAST(sagg.s_stat AS DOUBLE)
             / sqrt(CAST((c.n * (c.n - 1) // 2)
                         * (c.n * (c.n - 1) // 2 - yties.n2) AS DOUBLE))
             AS tau_b
    FROM counts c
    JOIN sagg ON c.event_type = sagg.event_type
    JOIN yties ON c.event_type = yties.event_type
    """,
    doc="[EXT] Kendall tau-b between time and hourly revenue per event "
    "type — completes the correlation family (Pearson: linear, Spearman: "
    "monotone-by-rank, Kendall: concordance). S reuses the Mann-Kendall "
    "pair machinery on the calendar-bounded hourly pre-aggregate; hours "
    "are strictly increasing so x-ties vanish and the y-tie correction "
    "n2 = Σt(t−1)/2 comes from the value histogram — S, n0, n2 all exact "
    "BIGINTs, tau = one division by one correctly-rounded sqrt of an "
    "exactly-representable product (n0·(n0−n2) < 2^53 through any "
    "calendar span worth testing), bit-identical across engines.",
    tags=("stats", "timeseries"),
)
def stat_kendall_tau_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    hourly = (
        ev.select(
            "event_type",
            F.expr(f"unix_millis(ts) div {_HOUR_MS}").alias("h"),
            _cents().alias("cents"),
        )
        .groupBy("event_type", "h")
        .agg(F.sum("cents").cast("long").alias("s"))
        .persist()
    )
    a = hourly.select("event_type", F.col("h").alias("ha"), F.col("s").alias("sa"))
    b = hourly.select(
        F.col("event_type").alias("et_b"), F.col("h").alias("hb"), F.col("s").alias("sb")
    )
    sagg = (
        a.join(b, (F.col("event_type") == F.col("et_b")) & (F.col("ha") < F.col("hb")))
        .select(
            "event_type",
            F.when(F.col("sb") > F.col("sa"), 1)
            .when(F.col("sb") < F.col("sa"), -1)
            .otherwise(0)
            .alias("sg"),
        )
        .groupBy("event_type")
        .agg(F.sum("sg").cast("long").alias("s_stat"))
    )
    counts = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    yties = (
        hourly.groupBy("event_type", "s")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .groupBy("event_type")
        .agg(
            F.coalesce(
                F.sum(F.expr("t * (t - 1) div 2")), F.lit(0)
            )
            .cast("long")
            .alias("n2")
        )
    )
    n0 = F.expr("n * (n - 1) div 2")
    out = (
        counts.join(sagg, "event_type")
        .join(yties, "event_type")
        .select(
            "event_type",
            "n",
            "s_stat",
            n0.cast("long").alias("n0"),
            "n2",
            (
                F.col("s_stat").cast("double")
                / F.sqrt(
                    (n0 * (n0 - F.col("n2"))).cast("double")
                )
            ).alias("tau_b"),
        )
    )
    return out


# ---------------------------------------------------------------------------
# GROUP BY ALL (SQL surface parity).
# ---------------------------------------------------------------------------

_GBALL_SQL = """
    SELECT event_type, CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day_idx,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                AS BIGINT) AS cents
    FROM events WHERE value IS NOT NULL
    GROUP BY ALL
"""


@QS.add(
    "sql_group_by_all",
    _GBALL_SQL,
    doc="[EXT] GROUP BY ALL (the 2023 SQL-surface convenience both Spark 4 "
    "and DuckDB implement): grouping keys inferred as every non-aggregate "
    "select item. Near-identical query text runs on both engines (only "
    "the epoch-ms spelling differs); the Spark side proves the inference "
    "resolves to the same (event_type, day_idx) grouping by hash-matching "
    "the DuckDB result, exact cents discipline as everywhere.",
    tags=("agg", "sql"),
)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "events").createOrReplaceTempView("gball_events")
    return spark.sql(
        """
        SELECT event_type, CAST(unix_millis(ts) div 86400000 AS BIGINT) AS day_idx,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                    AS BIGINT) AS cents
        FROM gball_events WHERE value IS NOT NULL
        GROUP BY ALL
        """
    )


# ---------------------------------------------------------------------------
# PCA top-component gate (exact axis variances + Rayleigh dominance).
# ---------------------------------------------------------------------------


@QS.add(
    "emb_pca_gate",
    """
    WITH u AS (
      SELECT vec_id, g.i AS i,
             CAST(floor(CAST(embedding[g.i + 1] AS DOUBLE) * 1000000.0 + 0.5)
                  AS BIGINT) AS x
      FROM embeddings, (SELECT UNNEST(range(0, 64)) AS i) g
    ),
    d AS (
      SELECT i, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM u GROUP BY i
    ),
    v AS (SELECT i, n, CAST(n * sxx - sx * sx AS BIGINT) AS var_units FROM d)
    SELECT CAST(MAX(n) AS BIGINT) AS n,
           CAST(MIN(CASE WHEN var_units = (SELECT MAX(var_units) FROM v)
                         THEN i END) AS BIGINT) AS best_axis,
           CAST(MAX(var_units) AS BIGINT) AS axis_var_units,
           TRUE AS pc1_ge_axis
    FROM v
    """,
    doc="[EXT] PCA readiness gate for the embedding corpus: per-axis "
    "variances n·Σx²−(Σx)² in exact micro-unit BIGINTs (hash-matched "
    "cross-engine, ties to the lowest axis index), plus the boolean "
    "pinned TRUE that the top principal component captures at least the "
    "best single axis's variance — guaranteed by the Rayleigh quotient "
    "(λ1 ≥ max_i C_ii for symmetric PSD C), so any FALSE flags a broken "
    "covariance assembly, the HLL/theta gate pattern for "
    "non-SQL-expressible math. Spark side: the exact Gram cells and dim "
    "sums reduce distributed (map-side-combinable aggs over the "
    "posexploded table), the 64x64 eigensolve runs driver-side on "
    "python ints -> numpy (covariance n·G−ssᵀ assembled in arbitrary "
    "precision, immune to the BIGINT n·G overflow past sf~0.03).",
    tags=("embedding", "stats"),
)
def emb_pca_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    emb = load(spark, sf_dir, "embeddings")
    u = emb.select(
        "vec_id",
        F.posexplode(
            F.transform(
                F.col("embedding"),
                lambda x: F.floor(x.cast("double") * 1000000.0 + 0.5).cast("long"),
            )
        ).alias("i", "x"),
    ).persist()
    gram = {
        (r.dim_i, r.dim_j): (r.n, r.sum_units)
        for r in (
            u.alias("a")
            .join(
                u.alias("b"),
                (F.col("a.vec_id") == F.col("b.vec_id"))
                & (F.col("a.i") <= F.col("b.i")),
            )
            .groupBy(F.col("a.i").alias("dim_i"), F.col("b.i").alias("dim_j"))
            .agg(
                F.count("*").cast("long").alias("n"),
                F.sum(F.col("a.x") * F.col("b.x")).cast("long").alias("sum_units"),
            )
            .collect()
        )
    }
    sums = {
        r.i: r.sx
        for r in u.groupBy("i").agg(F.sum("x").cast("long").alias("sx")).collect()
    }
    u.unpersist()
    dim = 64
    n = gram[(0, 0)][0]
    # Covariance in python ints (exact, overflow-free), then float eigh.
    cov = [
        [
            n * gram[(min(i, j), max(i, j))][1] - sums[i] * sums[j]
            for j in range(dim)
        ]
        for i in range(dim)
    ]
    axis_vars = [cov[i][i] for i in range(dim)]
    best_axis = min(range(dim), key=lambda i: (-axis_vars[i], i))
    lam1 = float(np.linalg.eigvalsh(np.array(cov, dtype=np.float64))[-1])
    ok = lam1 >= max(axis_vars) * (1.0 - 1e-9)
    return spark.createDataFrame(
        [(n, best_axis, axis_vars[best_axis], bool(ok))],
        schema="n BIGINT, best_axis BIGINT, axis_var_units BIGINT, "
        "pc1_ge_axis BOOLEAN",
    )


# ---------------------------------------------------------------------------
# Two-proportion z-test over all event-type pairs.
# ---------------------------------------------------------------------------

_DAY_MS_I = 86400000


@QS.add(
    "stat_proportion_ztest_pairs",
    f"""
    WITH t AS (
      SELECT event_type AS g,
             CASE WHEN (epoch_ms(ts) // {_DAY_MS_I}) % 7 IN (5, 6)
                  THEN 1 ELSE 0 END AS hit
      FROM events
    ),
    c AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(hit) AS BIGINT) AS k
      FROM t GROUP BY g
    )
    SELECT a.g AS ga, b.g AS gb, a.n AS n_a, a.k AS k_a, b.n AS n_b,
           b.k AS k_b,
           (CAST(a.k AS DOUBLE) / CAST(a.n AS DOUBLE)
            - CAST(b.k AS DOUBLE) / CAST(b.n AS DOUBLE))
             / sqrt(CAST((a.k + b.k) * (a.n + b.n - a.k - b.k) AS DOUBLE)
                    / CAST((a.n + b.n) * a.n * b.n AS DOUBLE)) AS z
    FROM c a JOIN c b ON a.g < b.g
    """,
    doc="[EXT] two-proportion z-test between every pair of event types on "
    "the weekend-share of events (epoch-day mod 7 — calendar-free on "
    "both engines): z = (p_a − p_b) / sqrt(p(1−p)(1/n_a + 1/n_b)) with "
    "the pooled term algebraically cleared to ONE ratio of exact BIGINT "
    "products — (k)(N−k)N / (n_a·n_b·N²) — so the float z is a fixed "
    "two-division + sqrt + divide tree, bit-identical across engines. "
    "Counts are a single map-side-combinable aggregate; the pair join "
    "runs on k rows. The conversion-rate A/B primitive next to the "
    "mean-shift (Welch) and shape-shift (KS) tests.",
    tags=("stats",),
)
def stat_proportion_ztest_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    t = ev.select(
        F.col("event_type").alias("g"),
        F.when(
            F.expr(f"(unix_millis(ts) div {_DAY_MS_I}) % 7").isin(5, 6), 1
        )
        .otherwise(0)
        .alias("hit"),
    )
    c = t.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("hit").cast("long").alias("k"),
    )
    a = c.select(*[F.col(x).alias(f"{x}_a") for x in ("g", "n", "k")])
    b = c.select(*[F.col(x).alias(f"{x}_b") for x in ("g", "n", "k")])
    j = a.join(F.broadcast(b), F.col("g_a") < F.col("g_b"))
    na, ka = F.col("n_a"), F.col("k_a")
    nb, kb = F.col("n_b"), F.col("k_b")
    big_n = na + nb
    big_k = ka + kb
    diff = ka.cast("double") / na.cast("double") - kb.cast("double") / nb.cast(
        "double"
    )
    num = (big_k * (big_n - big_k)).cast("double")
    den = (big_n * na * nb).cast("double")
    z = diff / F.sqrt(num / den)
    return j.select(
        F.col("g_a").alias("ga"),
        F.col("g_b").alias("gb"),
        "n_a",
        "k_a",
        "n_b",
        "k_b",
        z.alias("z"),
    )


# ---------------------------------------------------------------------------
# Benford first-digit conformance (data-quality forensics).
# ---------------------------------------------------------------------------

#: floor(log10(1 + 1/d) * 1e6) for d = 1..9 — shared integer literals, so
#: neither engine ever evaluates a logarithm.
_BENFORD_PPM = {
    1: 301029,
    2: 176091,
    3: 124938,
    4: 96910,
    5: 79181,
    6: 66946,
    7: 57991,
    8: 51152,
    9: 45757,
}

_BENFORD_CASE = " ".join(
    f"WHEN {d} THEN {p}" for d, p in _BENFORD_PPM.items()
)


@QS.add(
    "stat_benford_first_digit",
    f"""
    WITH t AS (
      SELECT CAST(substr(CAST({_CENTS} AS VARCHAR), 1, 1) AS BIGINT) AS d
      FROM events WHERE value IS NOT NULL AND value > 0
    ),
    c AS (
      SELECT d, CAST(COUNT(*) AS BIGINT) AS n FROM t GROUP BY d
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c)
    SELECT c.d, c.n,
           c.n * 1000000 // tot.total AS observed_ppm,
           CAST(CASE c.d {_BENFORD_CASE} END AS BIGINT) AS benford_ppm,
           abs(c.n * 1000000 // tot.total
               - CASE c.d {_BENFORD_CASE} END) AS abs_dev_ppm
    FROM c CROSS JOIN tot
    """,
    doc="[EXT] Benford first-digit conformance over positive value cents — "
    "the fraud/data-fabrication forensic screen. First digits come from "
    "the decimal string of the exact integer cents (no float log10 "
    "anywhere: the Benford expectation is a shared table of "
    "floor(log10(1+1/d)·1e6) INTEGER literals, observed shares are "
    "floor-div ppm), so every output column is an exact BIGINT and the "
    "whole screen hash-matches. One map-side-combinable aggregate; the "
    "1-row total rides a cross join. Uniform synthetic data is EXPECTED "
    "to deviate — the query reports deviations, it does not assert "
    "conformance.",
    tags=("stats", "quality"),
)
def stat_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & (F.col("value") > 0)
    )
    t = ev.select(
        F.substring(_cents().cast("string"), 1, 1).cast("long").alias("d")
    )
    c = t.groupBy("d").agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = c.agg(F.sum("n").cast("long").alias("total"))
    benford = F.create_map(
        *[F.lit(x) for kv in _BENFORD_PPM.items() for x in kv]
    )
    return (
        c.crossJoin(F.broadcast(tot))
        .select(
            "d",
            "n",
            F.expr("n * 1000000 div total").alias("observed_ppm"),
            benford[F.col("d")].cast("long").alias("benford_ppm"),
            F.abs(
                F.expr("n * 1000000 div total")
                - benford[F.col("d")].cast("long")
            ).alias("abs_dev_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Entity resolution end-to-end: fuzzy pairs -> components -> canonical.
# ---------------------------------------------------------------------------


@QS.add(
    "er_resolve_customers",
    """
    WITH RECURSIVE pairs AS (
      SELECT l.c_custkey AS id_l, r.c_custkey AS id_r
      FROM customer l JOIN customer r ON l.c_custkey < r.c_custkey
      WHERE levenshtein(l.c_name, r.c_name) <= 1
    ),
    edges AS (
      SELECT id_l AS a, id_r AS b FROM pairs
      UNION ALL
      SELECT id_r, id_l FROM pairs
    ),
    verts AS (SELECT DISTINCT a AS id FROM edges),
    walk(id, label) AS (
      SELECT id, id FROM verts
      UNION
      SELECT e.a, w.label FROM walk w JOIN edges e ON w.id = e.b
      WHERE w.label < e.a
    ),
    comp AS (SELECT id, MIN(label) AS component FROM walk GROUP BY id),
    resolved AS (
      SELECT c.c_custkey AS custkey,
             CAST(COALESCE(comp.component, c.c_custkey) AS BIGINT) AS canonical
      FROM customer c LEFT JOIN comp ON c.c_custkey = comp.id
    )
    SELECT custkey, canonical,
           CAST(COUNT(*) OVER (PARTITION BY canonical) AS BIGINT)
             AS cluster_size
    FROM resolved
    """,
    doc="[EXT] entity resolution end to end, hash-gated: SymSpell "
    "deletion-neighborhood blocking finds all name pairs within edit "
    "distance 1 (lossless on this shared-prefix corpus — the adversarial "
    "case for prefix filters), connected components merge transitive "
    "matches (A~B~C is one entity even when A≁C), and every customer "
    "resolves to the minimum custkey of its cluster (singletons to "
    "themselves) with the cluster size attached. The oracle rebuilds the "
    "whole pipeline from first principles — O(N²) levenshtein all-pairs "
    "+ a recursive-CTE transitive closure — so the hash check covers "
    "blocking losslessness AND closure correctness in one gate. Spark "
    "shape: bucketed candidate join, scale-adaptive components (driver "
    "union-find under 1M edges, min-label loop above), one window "
    "shuffle for sizes.",
    tags=("fuzzy", "graph", "dedup"),
    headline=True,
)
def er_resolve_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.fuzzy import edit_distance_self_join
    from clinical_api_etl_spark.operators.graph import connected_components

    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    pairs = edit_distance_self_join(cust, "c_custkey", "c_name", max_dist=1)
    comps = connected_components(pairs, src="id_l", dst="id_r")
    resolved = cust.join(
        comps, cust.c_custkey == comps.id, "left"
    ).select(
        F.col("c_custkey").alias("custkey"),
        F.coalesce(F.col("component"), F.col("c_custkey"))
        .cast("long")
        .alias("canonical"),
    )
    w = Window.partitionBy("canonical")
    return resolved.select(
        "custkey",
        "canonical",
        F.count(F.lit(1)).over(w).cast("long").alias("cluster_size"),
    )


# ---------------------------------------------------------------------------
# Frequent behavioral trigrams (sequential pattern mining, depth 3).
# ---------------------------------------------------------------------------

_SEQ_MIN_SUPPORT = 5


@QS.add(
    "seq_frequent_trigrams",
    f"""
    WITH seqs AS (
      SELECT user_id,
             list(event_type ORDER BY ts, event_id) AS seq
      FROM events GROUP BY user_id
    ),
    tri AS (
      SELECT g['e1'] AS e1, g['e2'] AS e2, g['e3'] AS e3
      FROM (
        SELECT unnest(list_transform(range(1, len(seq) - 1),
                 i -> {{'e1': seq[i], 'e2': seq[i + 1],
                        'e3': seq[i + 2]}})) AS g
        FROM seqs WHERE len(seq) >= 3
      )
    )
    SELECT e1, e2, e3, CAST(COUNT(*) AS BIGINT) AS n
    FROM tri GROUP BY e1, e2, e3
    HAVING COUNT(*) >= {_SEQ_MIN_SUPPORT}
    """,
    doc="[EXT] sequential pattern mining at depth 3: every consecutive "
    "event-type trigram in each user's (ts, event_id)-ordered behavior "
    "stream, counted corpus-wide with a min-support floor — the "
    "clickstream/funnel-discovery primitive (SPADE/PrefixSpan's "
    "contiguous-trigram slice) next to the first-order Markov matrix "
    "(seq_transition_matrix). Shape: ONE groupBy builds the ordered "
    "per-user sequence (sort inside the aggregate, event_id tie-break — "
    "deterministic), trigrams expand via an index transform (no window, "
    "no self-join), and the count is a map-side-combinable aggregate "
    "over at most |event-types|³ groups.",
    tags=("sequence", "mining"),
)
def seq_frequent_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    seqs = ev.groupBy("user_id").agg(
        F.transform(
            F.sort_array(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ),
            lambda s: s["event_type"],
        ).alias("seq")
    )
    grams = F.when(
        F.size("seq") >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size("seq") - 2),
            lambda i: F.struct(
                F.element_at("seq", i).alias("e1"),
                F.element_at("seq", i + 1).alias("e2"),
                F.element_at("seq", i + 2).alias("e3"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<e1:string,e2:string,e3:string>>"))
    return (
        seqs.select(F.explode_outer(grams).alias("g"))
        .filter(F.col("g").isNotNull())
        .groupBy("g.e1", "g.e2", "g.e3")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .filter(F.col("n") >= _SEQ_MIN_SUPPORT)
    )


# ---------------------------------------------------------------------------
# Wald-Wolfowitz runs test on the hourly direction sequence.
# ---------------------------------------------------------------------------


@QS.add(
    "stat_runs_test_hourly",
    f"""
    WITH hourly AS (
      SELECT event_type, epoch_ms(ts) // {_HOUR_MS} AS h,
             CAST(SUM({_CENTS}) AS BIGINT) AS s
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, h
    ),
    diffs AS (
      SELECT event_type, h,
             CASE WHEN s > lag(s) OVER w THEN 1
                  WHEN s < lag(s) OVER w THEN -1 END AS sg
      FROM hourly
      WINDOW w AS (PARTITION BY event_type ORDER BY h)
    ),
    signs AS (SELECT event_type, h, sg FROM diffs WHERE sg IS NOT NULL),
    runs AS (
      SELECT event_type, sg,
             CASE WHEN lag(sg) OVER w2 IS NULL
                       OR sg <> lag(sg) OVER w2 THEN 1 ELSE 0 END AS new_run
      FROM signs
      WINDOW w2 AS (PARTITION BY event_type ORDER BY h)
    ),
    c AS (
      SELECT event_type,
             CAST(SUM(CASE WHEN sg = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
             CAST(SUM(CASE WHEN sg = -1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_down,
             CAST(SUM(new_run) AS BIGINT) AS n_runs
      FROM runs GROUP BY event_type
    )
    SELECT event_type, n_up, n_down, n_runs,
           (CAST(n_runs AS DOUBLE)
            - (1.0 + CAST(2 * n_up * n_down AS DOUBLE)
                     / CAST(n_up + n_down AS DOUBLE)))
             / sqrt(CAST(2 * n_up * n_down
                         * (2 * n_up * n_down - n_up - n_down) AS DOUBLE)
                    / CAST((n_up + n_down) * (n_up + n_down)
                           * (n_up + n_down - 1) AS DOUBLE)) AS z
    FROM c
    """,
    doc="[EXT] Wald-Wolfowitz runs test per event type: is the hourly "
    "revenue direction sequence (up/down, ties dropped — the standard "
    "treatment) random, trending (too few runs), or oscillating (too "
    "many)? Counts n_up / n_down / n_runs are exact BIGINTs from two lag "
    "windows over the calendar-bounded hourly pre-aggregate (runs = "
    "Σ[sign ≠ previous sign]); z is the fixed IEEE tree over the exact "
    "moments 1+2·n1·n2/N and 2n1n2(2n1n2−N)/(N²(N−1)) — hash-matches "
    "including the float. Completes the time-series test bench: "
    "Mann-Kendall detects monotone trend, CUSUM locates a level shift, "
    "the runs test rejects serial randomness itself.",
    tags=("stats", "timeseries"),
)
def stat_runs_test_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    hourly = (
        ev.select(
            "event_type",
            F.expr(f"unix_millis(ts) div {_HOUR_MS}").alias("h"),
            _cents().alias("cents"),
        )
        .groupBy("event_type", "h")
        .agg(F.sum("cents").cast("long").alias("s"))
    )
    w = Window.partitionBy("event_type").orderBy("h")
    diffs = hourly.select(
        "event_type",
        "h",
        F.when(F.col("s") > F.lag("s").over(w), 1)
        .when(F.col("s") < F.lag("s").over(w), -1)
        .alias("sg"),
    )
    signs = diffs.filter(F.col("sg").isNotNull())
    prev = F.lag("sg").over(w)
    runs = signs.select(
        "event_type",
        "sg",
        F.when(prev.isNull() | (F.col("sg") != prev), 1).otherwise(0).alias("new_run"),
    )
    c = runs.groupBy("event_type").agg(
        F.sum(F.when(F.col("sg") == 1, 1).otherwise(0)).cast("long").alias("n_up"),
        F.sum(F.when(F.col("sg") == -1, 1).otherwise(0))
        .cast("long")
        .alias("n_down"),
        F.sum("new_run").cast("long").alias("n_runs"),
    )
    n1, n2, r = F.col("n_up"), F.col("n_down"), F.col("n_runs")
    big_n = n1 + n2
    mean = F.lit(1.0) + (2 * n1 * n2).cast("double") / big_n.cast("double")
    var = (2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)).cast("double") / (
        big_n * big_n * (big_n - 1)
    ).cast("double")
    return c.select(
        "event_type",
        "n_up",
        "n_down",
        "n_runs",
        ((r.cast("double") - mean) / F.sqrt(var)).alias("z"),
    )


# ---------------------------------------------------------------------------
# Kneser-Ney discounted trigram probabilities (exact quarter/ppm integers).
# ---------------------------------------------------------------------------


@QS.add(
    "text_trigram_kn",
    f"""
    WITH t AS (SELECT {_TOKS} AS toks FROM documents),
    tri AS (
      SELECT g['w1'] AS w1, g['w2'] AS w2, g['w3'] AS w3,
             CAST(COUNT(*) AS BIGINT) AS c3
      FROM (
        SELECT unnest(list_transform(range(1, len(toks) - 1),
                 i -> {{'w1': toks[i], 'w2': toks[i + 1],
                        'w3': toks[i + 2]}})) AS g
        FROM t WHERE len(toks) >= 3
      )
      GROUP BY w1, w2, w3
    ),
    ctx AS (
      SELECT w1, w2, CAST(SUM(c3) AS BIGINT) AS c2,
             CAST(COUNT(*) AS BIGINT) AS n1plus
      FROM tri GROUP BY w1, w2
    ),
    cont AS (
      SELECT w3, CAST(COUNT(*) AS BIGINT) AS cont_w3 FROM tri GROUP BY w3
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_types FROM tri)
    SELECT tri.w1, tri.w2, tri.w3, tri.c3, ctx.c2, ctx.n1plus, cont.cont_w3,
           (4 * tri.c3 - 3) * 1000000 // (4 * ctx.c2)
             + 3 * ctx.n1plus * (cont.cont_w3 * 1000000 // tot.n_types)
               // (4 * ctx.c2) AS p_kn_ppm
    FROM tri
    JOIN ctx ON tri.w1 = ctx.w1 AND tri.w2 = ctx.w2
    JOIN cont ON tri.w3 = cont.w3
    CROSS JOIN tot
    WHERE tri.c3 >= 2
    """,
    doc="[EXT] Kneser-Ney absolute discounting over the trigram table — "
    "the smoothing real n-gram LMs (KenLM) ship, in EXACT integers: "
    "discount D = 3/4 lives in quarter-scaled numerators ((4c3−3)/4c2), "
    "the back-off weight λ = D·n1plus/c2 multiplies the CONTINUATION "
    "probability cont(w3)/|trigram types| (how many contexts a word "
    "completes — KN's insight — not its raw frequency), and the two "
    "terms compose by documented floor-divs, so p_kn_ppm is a BIGINT "
    "both engines replay bit-for-bit. Every input (c3, c2, successor "
    "types n1plus, continuation counts, type total) is an aggregate of "
    "the ONE trigram table — four map-side-combinable aggs, equi-joins "
    "back, corpus tokenized once.",
    tags=("text",),
)
def text_trigram_kn(spark: SparkSession, sf_dir: str) -> DataFrame:
    occ = _doc_trigrams(spark, sf_dir)
    tri = occ.groupBy("w1", "w2", "w3").agg(
        F.count(F.lit(1)).cast("long").alias("c3")
    ).persist()
    ctx = tri.groupBy("w1", "w2").agg(
        F.sum("c3").cast("long").alias("c2"),
        F.count(F.lit(1)).cast("long").alias("n1plus"),
    )
    cont = tri.groupBy("w3").agg(F.count(F.lit(1)).cast("long").alias("cont_w3"))
    tot = tri.agg(F.count(F.lit(1)).cast("long").alias("n_types"))
    return (
        tri.filter(F.col("c3") >= 2)
        .join(ctx, ["w1", "w2"])
        .join(cont, ["w3"])
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "w3",
            "c3",
            "c2",
            "n1plus",
            "cont_w3",
            F.expr(
                "(4 * c3 - 3) * 1000000 div (4 * c2)"
                " + 3 * n1plus * (cont_w3 * 1000000 div n_types)"
                " div (4 * c2)"
            ).alias("p_kn_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Running COUNT(DISTINCT) as a first-occurrence cumsum.
# ---------------------------------------------------------------------------


@QS.add(
    "w16_cumulative_distinct_types",
    """
    WITH flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN row_number() OVER (
                    PARTITION BY user_id, event_type
                    ORDER BY ts, event_id) = 1
                  THEN 1 ELSE 0 END AS first_seen
      FROM events
    )
    SELECT user_id, event_id,
           CAST(SUM(first_seen) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS distinct_types_so_far
    FROM flagged
    """,
    doc="[EXT] running COUNT(DISTINCT) per user — how many distinct event "
    "types each user has touched as of each event (the engagement-breadth "
    "feature). COUNT(DISTINCT) is not a window function in any engine; "
    "the standard rewrite flags each (user, type)'s FIRST occurrence "
    "(row_number = 1) and takes a running sum of the flags — two window "
    "passes over |events|, exact, deterministic via the event_id "
    "tie-break. Cost law: an explicit repartition on user_id up front "
    "satisfies BOTH windows' clustering requirements (HashPartitioning "
    "on a subset of the window keys), so the plan carries exactly ONE "
    "exchange — left to EnsureRequirements, each window would shuffle "
    "separately ((user, type) then (user)).",
    tags=("window",),
)
def w16_cumulative_distinct_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").repartition("user_id")
    w_first = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.row_number().over(w_first) == 1, 1).otherwise(0).alias("first_seen"),
    )
    return flagged.select(
        "user_id",
        "event_id",
        F.sum("first_seen").over(w_run).cast("long").alias("distinct_types_so_far"),
    )


# ---------------------------------------------------------------------------
# Video scene cuts — second media byte-kernel under a full value hash.
# ---------------------------------------------------------------------------


@QS.add(
    "mm_video_scene_cuts",
    """
    WITH docs2 AS (SELECT doc_id, 4 + doc_id % 3 AS nf FROM documents),
    fb AS (
      SELECT d.doc_id, f.f, k.k,
             CAST('0x' || substr(
                    md5('vf' || CAST(f.f AS VARCHAR) || ':'
                        || CAST(d.doc_id AS VARCHAR)),
                    CAST(k.k * 2 + 1 AS INT), 2) AS INTEGER) AS b
      FROM docs2 d
      JOIN (SELECT UNNEST(range(0, 16)) AS f) f ON f.f < d.nf
      CROSS JOIN (SELECT UNNEST(range(0, 16)) AS k) k
    ),
    pairs AS (
      SELECT a.doc_id, a.f AS frame_idx,
             CAST(SUM(abs(b2.b - a.b)) AS BIGINT) AS l1_dist
      FROM fb a JOIN fb b2
        ON a.doc_id = b2.doc_id AND b2.f = a.f + 1 AND a.k = b2.k
      GROUP BY a.doc_id, a.f
    )
    SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx, l1_dist,
           l1_dist > 2000 AS is_cut
    FROM pairs
    """,
    doc="[EXT] video shot segmentation: per consecutive frame pair, the "
    "exact integer L1 pixel distance and a scene-cut flag, computed by a "
    "zero-copy numpy Arrow kernel over a packed-frames binary column "
    "(operators/multimodal.py:video_scene_cuts). Frames are synthesized "
    "deterministically from md5 (no codecs in the container), so like "
    "mm_audio_features — and unlike codec-gated decode paths — this "
    "media kernel is FULLY value-hash-gated: DuckDB re-derives every "
    "frame byte from the same hex and must reproduce the kernel's "
    "distances and cut flags exactly, ragged per-doc frame counts "
    "included. Declared Arrow op (plan_audit ARROW_OK).",
    tags=("multimodal",),
)
def mm_video_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.multimodal import (
        synth_frames,
        video_scene_cuts,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id")
    return video_scene_cuts(synth_frames(docs)).select(
        "doc_id", "frame_idx", "l1_dist", "is_cut"
    )


# ---------------------------------------------------------------------------
# Image tile statistics — third media byte-kernel under a full value hash.
# ---------------------------------------------------------------------------


@QS.add(
    "mm_image_tile_stats",
    """
    WITH px AS (
      SELECT d.doc_id, g.i,
             CAST('0x' || substr(
                    md5('im' || CAST(g.i // 16 AS VARCHAR) || ':'
                        || CAST(d.doc_id AS VARCHAR)),
                    CAST((g.i % 16) * 2 + 1 AS INT), 2) AS INTEGER) AS b
      FROM documents d, (SELECT UNNEST(range(0, 64)) AS i) g
    ),
    pos AS (
      SELECT doc_id, i, b, i % 8 AS c,
             (i // 8) // 4 * 2 + (i % 8) // 4 AS tile_idx
      FROM px
    ),
    edges AS (
      SELECT a.doc_id, a.tile_idx,
             CAST(SUM(CASE WHEN abs(b2.b - a.b) > 64 THEN 1 ELSE 0 END)
                  AS BIGINT) AS h_edges
      FROM pos a JOIN pos b2 ON a.doc_id = b2.doc_id AND b2.i = a.i + 1
      WHERE a.c % 4 < 3
      GROUP BY a.doc_id, a.tile_idx
    ),
    stats AS (
      SELECT doc_id, tile_idx, CAST(COUNT(*) AS BIGINT) AS n_px,
             CAST(SUM(b) AS BIGINT) AS sum_px,
             CAST(SUM(b * b) AS BIGINT) AS sum_sq
      FROM pos GROUP BY doc_id, tile_idx
    )
    SELECT s.doc_id, CAST(s.tile_idx AS BIGINT) AS tile_idx, s.n_px,
           s.sum_px, s.sum_sq, e.h_edges
    FROM stats s
    JOIN edges e ON s.doc_id = e.doc_id AND s.tile_idx = e.tile_idx
    """,
    doc="[EXT] image patch statistics — per 4x4 tile of an 8x8 grayscale "
    "binary column: pixel sum, sum of squares, and horizontal-edge count "
    "(|Δ| > 64), the patch-level screens (contrast, blur, flat-region) "
    "vision curation runs before embedding. Third media byte-kernel "
    "under a FULL value hash: images are md5-derived "
    "(operators/multimodal.py:synth_image), the numpy Arrow kernel "
    "computes exact integers, and DuckDB re-derives every pixel and "
    "every within-tile gradient pair from the same hex. Declared Arrow "
    "op (plan_audit ARROW_OK).",
    tags=("multimodal",),
)
def mm_image_tile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.multimodal import (
        image_tile_stats,
        synth_image,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id")
    return image_tile_stats(synth_image(docs)).select(
        "doc_id", "tile_idx", "n_px", "sum_px", "sum_sq", "h_edges"
    )


# ---------------------------------------------------------------------------
# Forward as-of join: time-to-next-event attribution.
# ---------------------------------------------------------------------------


@QS.add(
    "asof_next_error_after_purchase",
    """
    WITH e AS (
      SELECT user_id, ts, MAX(event_id) AS error_id
      FROM events WHERE event_type = 'error'
      GROUP BY user_id, ts
    ),
    p AS (
      SELECT event_id AS purchase_id, user_id, ts
      FROM events WHERE event_type = 'purchase'
    )
    SELECT p.purchase_id, p.user_id, p.ts,
           COALESCE(e.ts, TIMESTAMP '1970-01-01 00:00:00') AS ts_matched,
           COALESCE(e.error_id, -1) AS error_id_matched
    FROM p ASOF LEFT JOIN e ON p.user_id = e.user_id AND p.ts <= e.ts
    """,
    doc="[EXT] FORWARD as-of join: each purchase matched to the user's "
    "next error at-or-after it — the time-to-failure / "
    "did-the-conversion-precede-a-problem attribution that the backward "
    "as-of (asof_purchase_attribution) cannot express. Same union + "
    "keyed sort + running last_value log-merge, scanning the merged log "
    "in reverse (`__t` DESC) — identical one-shuffle cost law, "
    "skew-robust, no nested loop. The DuckDB oracle uses native ASOF "
    "LEFT JOIN with the <= inequality, so two independent formulations "
    "of nearest-following must agree exactly; right side deduped per "
    "(user, ts), NULLs coalesced to sentinels.",
    tags=("join", "temporal", "window"),
)
def asof_next_error_after_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.temporal import asof_join

    ev = load(spark, sf_dir, "events")
    errors = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("error_id"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    out = asof_join(
        purchases,
        errors,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_payload=["error_id"],
        direction="forward",
    )
    return out.select(
        "purchase_id",
        "user_id",
        "ts",
        F.coalesce(
            F.col("ts_matched"), F.lit("1970-01-01 00:00:00").cast("timestamp")
        ).alias("ts_matched"),
        F.coalesce(F.col("error_id_matched"), F.lit(-1)).alias("error_id_matched"),
    )


# ---------------------------------------------------------------------------
# Deterministic grouped mode (most frequent value, ties to smallest).
# ---------------------------------------------------------------------------


@QS.add(
    "agg_mode_per_type",
    f"""
    WITH t AS (
      SELECT event_type AS g, {_CENTS} AS x
      FROM events WHERE value IS NOT NULL
    ),
    c AS (
      SELECT g, x, CAST(COUNT(*) AS BIGINT) AS n FROM t GROUP BY g, x
    ),
    ranked AS (
      SELECT g, x, n,
             row_number() OVER (PARTITION BY g ORDER BY n DESC, x) AS rk
      FROM c
    )
    SELECT g AS event_type, x AS mode_cents, n AS mode_count
    FROM ranked WHERE rk = 1
    """,
    doc="[EXT] grouped mode with DETERMINISTIC ties: the most frequent "
    "value-cents per event type, ties resolved to the smallest value — "
    "built-in mode() in both engines leaves tie order unspecified, so "
    "the portable form is counts + a rank window with an explicit total "
    "order. Cost: the window runs over the (group, value) histogram, "
    "never events (the same collapse every rank statistic here uses).",
    tags=("agg", "stats"),
)
def agg_mode_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    t = ev.select(F.col("event_type").alias("g"), _cents().alias("x"))
    c = t.groupBy("g", "x").agg(F.count(F.lit(1)).cast("long").alias("n"))
    w = Window.partitionBy("g").orderBy(F.col("n").desc(), "x")
    return (
        c.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            F.col("g").alias("event_type"),
            F.col("x").alias("mode_cents"),
            F.col("n").alias("mode_count"),
        )
    )


# ---------------------------------------------------------------------------
# Multimodal curation scorecard — all three media kernels + text, one gate.
# ---------------------------------------------------------------------------


@QS.add(
    "mm_curation_scorecard",
    f"""
    WITH toks AS (
      SELECT doc_id,
             CAST(len({_TOKS}) AS BIGINT) AS n_tokens
      FROM documents
    ),
    au AS (
      SELECT d.doc_id,
             CAST(SUM(CAST(CASE WHEN us >= 32768 THEN us - 65536 ELSE us END
                           AS BIGINT)
                      * CAST(CASE WHEN us >= 32768 THEN us - 65536 ELSE us END
                             AS BIGINT)) AS BIGINT) AS audio_energy
      FROM documents d,
           (SELECT UNNEST(range(0, 32)) AS i) g,
           LATERAL (
             SELECT CAST('0x' || substr(
                      md5('au' || CAST(g.i // 8 AS VARCHAR) || ':'
                          || CAST(d.doc_id AS VARCHAR)),
                      CAST((g.i % 8) * 4 + 1 AS INT), 2) AS INTEGER)
                    + 256 * CAST('0x' || substr(
                      md5('au' || CAST(g.i // 8 AS VARCHAR) || ':'
                          || CAST(d.doc_id AS VARCHAR)),
                      CAST((g.i % 8) * 4 + 3 AS INT), 2) AS INTEGER) AS us
           ) uu
      GROUP BY d.doc_id
    ),
    vfb AS (
      SELECT d.doc_id, f.f, k.k,
             CAST('0x' || substr(
                    md5('vf' || CAST(f.f AS VARCHAR) || ':'
                        || CAST(d.doc_id AS VARCHAR)),
                    CAST(k.k * 2 + 1 AS INT), 2) AS INTEGER) AS b
      FROM (SELECT doc_id, 4 + doc_id % 3 AS nf FROM documents) d
      JOIN (SELECT UNNEST(range(0, 16)) AS f) f ON f.f < d.nf
      CROSS JOIN (SELECT UNNEST(range(0, 16)) AS k) k
    ),
    vc AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN l1 > 2000 THEN 1 ELSE 0 END) AS BIGINT)
               AS video_cuts
      FROM (
        SELECT a.doc_id, a.f, CAST(SUM(abs(b2.b - a.b)) AS BIGINT) AS l1
        FROM vfb a JOIN vfb b2
          ON a.doc_id = b2.doc_id AND b2.f = a.f + 1 AND a.k = b2.k
        GROUP BY a.doc_id, a.f
      ) GROUP BY doc_id
    ),
    ie AS (
      SELECT d.doc_id,
             CAST(SUM(CASE WHEN abs(b2 - b1) > 64 THEN 1 ELSE 0 END)
                  AS BIGINT) AS img_edges
      FROM documents d,
           (SELECT UNNEST(range(0, 64)) AS i) g,
           LATERAL (
             SELECT CAST('0x' || substr(
                      md5('im' || CAST(g.i // 16 AS VARCHAR) || ':'
                          || CAST(d.doc_id AS VARCHAR)),
                      CAST((g.i % 16) * 2 + 1 AS INT), 2) AS INTEGER) AS b1,
                    CAST('0x' || substr(
                      md5('im' || CAST((g.i + 1) // 16 AS VARCHAR) || ':'
                          || CAST(d.doc_id AS VARCHAR)),
                      CAST(((g.i + 1) % 16) * 2 + 1 AS INT), 2) AS INTEGER)
                      AS b2
           ) bb
      WHERE (g.i % 8) % 4 < 3
      GROUP BY d.doc_id
    )
    SELECT toks.doc_id, toks.n_tokens, au.audio_energy, vc.video_cuts,
           ie.img_edges,
           toks.n_tokens >= 10 AND au.audio_energy >= 10000000000
             AND vc.video_cuts = 0 AND ie.img_edges >= 20 AS keep
    FROM toks
    JOIN au ON toks.doc_id = au.doc_id
    JOIN vc ON toks.doc_id = vc.doc_id
    JOIN ie ON toks.doc_id = ie.doc_id
    """,
    doc="[EXT] multimodal curation scorecard: per document, token count, "
    "total audio energy, video scene-cut count, and image edge total — "
    "all four modalities' Arrow kernels composed in ONE query — plus the "
    "integer-threshold keep/drop verdict a multimodal training-data "
    "filter applies. Everything is exact BIGINTs, so the DuckDB oracle "
    "(which re-derives every sample, frame byte, and pixel from the md5 "
    "hex) hash-matches the whole scorecard including the boolean. NOTE "
    "the image edge definition here is per-IMAGE horizontal pairs "
    "(g.i%8<7 — row-interior), which equals the sum of per-tile counts "
    "only when tile boundaries are respected: the oracle uses the "
    "row-interior form and the Spark side re-aggregates the TILE kernel, "
    "so the cross-tile column (c=3->4) pairs are excluded on BOTH sides "
    "via the tile kernel's definition... (see test: the two definitions "
    "are reconciled by construction).",
    tags=("multimodal",),
)
def mm_curation_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.multimodal import (
        audio_frame_features,
        image_tile_stats,
        synth_frames,
        synth_image,
        synth_pcm,
        video_scene_cuts,
    )
    from clinical_api_etl_spark.functions.text import token_count

    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", token_count(F.col("text")).alias("n_tokens"))
    ids = docs.select("doc_id")
    au = (
        audio_frame_features(synth_pcm(ids))
        .groupBy("doc_id")
        .agg(F.sum("sum_sq").cast("long").alias("audio_energy"))
    )
    vc = (
        video_scene_cuts(synth_frames(ids))
        .groupBy("doc_id")
        .agg(
            F.sum(F.when(F.col("is_cut"), 1).otherwise(0))
            .cast("long")
            .alias("video_cuts")
        )
    )
    ie = (
        image_tile_stats(synth_image(ids))
        .groupBy("doc_id")
        .agg(F.sum("h_edges").cast("long").alias("img_edges"))
    )
    out = toks.join(au, "doc_id").join(vc, "doc_id").join(ie, "doc_id")
    keep = (
        (F.col("n_tokens") >= 10)
        & (F.col("audio_energy") >= 10000000000)
        & (F.col("video_cuts") == 0)
        & (F.col("img_edges") >= 20)
    )
    return out.select(
        "doc_id", "n_tokens", "audio_energy", "video_cuts", "img_edges",
        keep.alias("keep"),
    )


# ---------------------------------------------------------------------------
# Feature hashing (hashing-trick bag of words).
# ---------------------------------------------------------------------------

_FH_BUCKETS = 256


@QS.add(
    "text_hashed_features",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
    )
    SELECT doc_id,
           CAST(CAST('0x' || substr(md5(tok), 1, 4) AS INTEGER)
                % {_FH_BUCKETS} AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM tok
    GROUP BY doc_id, bucket
    """,
    doc="[EXT] the hashing trick (HashingVectorizer / Vowpal Wabbit "
    "feature hashing): sparse bag-of-words features with a FIXED "
    "{_FH_BUCKETS}-dim space and no vocabulary pass — the stateless "
    "featurizer streaming/online pipelines need (new tokens never "
    "resize anything, buckets merge across shards). Bucket = first 16 "
    "md5 bits mod buckets via the portable hex-to-int bridge "
    "(conv == CAST('0x'||hex)), so the sparse feature table hash-matches "
    "across engines. One explode + one map-side-combinable aggregate.",
    tags=("text", "mlprep"),
)
def text_hashed_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode_outer(tokens(F.col("text"))).alias("tok")
    ).filter(F.col("tok").isNotNull())
    bucket = (
        F.conv(F.substring(F.md5("tok"), 1, 4), 16, 10).cast("long")
        % _FH_BUCKETS
    )
    return (
        tok.select("doc_id", bucket.alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


# ---------------------------------------------------------------------------
# Session entry/exit paths (journey analysis over the sessionization).
# ---------------------------------------------------------------------------


@QS.add(
    "session_entry_exit_paths",
    """
    WITH o AS (
      SELECT user_id, event_id, ts, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 21600000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, event_id, ts, event_type,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM o
    ),
    paths AS (
      SELECT user_id, session_id,
             first_value(event_type) OVER ws AS entry_type,
             last_value(event_type) OVER
               (PARTITION BY user_id, session_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS exit_type,
             row_number() OVER ws AS rn
      FROM s
      WINDOW ws AS (PARTITION BY user_id, session_id ORDER BY ts, event_id)
    )
    SELECT entry_type, exit_type, CAST(COUNT(*) AS BIGINT) AS n_sessions
    FROM paths WHERE rn = 1 GROUP BY entry_type, exit_type
    """,
    doc="[EXT] session journey analysis: how do sessions BEGIN and END? "
    "Reuses the 6h-gap sessionization (w5's lag + running-sum ids), then "
    "one aggregate picks each session's entry and exit event types via "
    "min_by/max_by over the (ts, event_id) total order (the oracle's "
    "window first/last twin — DuckDB arg_min lacks struct keys) and a "
    "k²-bounded count gives the entry→exit matrix (the landing/bounce "
    "analysis next to the step-transition Markov matrix). Both engines' "
    "argmin/argmax compare the same struct order, so the path matrix "
    "hash-matches.",
    tags=("window", "sequence"),
)
def session_entry_exit_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    # w5's sessionize_batch returns per-session roll-ups; this needs
    # per-event session ids, so the id assignment (same gap, same
    # windows) is rebuilt inline.
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    new_session = F.when(
        F.lag("ts").over(w).isNull()
        | (
            F.unix_millis(F.col("ts")) - F.unix_millis(F.lag("ts").over(w))
            > 21600000
        ),
        1,
    ).otherwise(0)
    run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    s = ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.sum(new_session).over(run).alias("session_id"),
    )
    order = F.struct("ts", "event_id")
    paths = s.groupBy("user_id", "session_id").agg(
        F.min_by("event_type", order).alias("entry_type"),
        F.max_by("event_type", order).alias("exit_type"),
    )
    return paths.groupBy("entry_type", "exit_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions")
    )


# ---------------------------------------------------------------------------
# Tukey five-number summary + 1.5-IQR outlier fences (exact integers).
# ---------------------------------------------------------------------------


@QS.add(
    "stat_tukey_summary",
    f"""
    WITH t AS (
      SELECT event_type AS g, {_CENTS} AS x
      FROM events WHERE value IS NOT NULL
    ),
    ranked AS (
      SELECT g, x, row_number() OVER (PARTITION BY g ORDER BY x) AS rn,
             COUNT(*) OVER (PARTITION BY g) AS n
      FROM t
    ),
    pos AS (
      SELECT g, CAST(MAX(n) AS BIGINT) AS n,
             CAST(MIN(x) AS BIGINT) AS min_c,
             CAST(MAX(x) AS BIGINT) AS max_c,
             CAST(SUM((CASE WHEN rn = ((n + 1) // 2 + 1) // 2
                              OR rn = ((n + 1) // 2 + 2) // 2
                            THEN x ELSE 0 END)
                  * (CASE WHEN ((n + 1) // 2 + 1) // 2
                               = ((n + 1) // 2 + 2) // 2 THEN 2 ELSE 1 END))
                  AS BIGINT) AS q1_x2,
             CAST(SUM((CASE WHEN rn = (n + 1) // 2 OR rn = (n + 2) // 2
                            THEN x ELSE 0 END)
                  * (CASE WHEN (n + 1) // 2 = (n + 2) // 2
                          THEN 2 ELSE 1 END)) AS BIGINT) AS med_x2,
             CAST(SUM((CASE WHEN rn = n - (n + 1) // 2
                                      + ((n + 1) // 2 + 1) // 2
                              OR rn = n - (n + 1) // 2
                                      + ((n + 1) // 2 + 2) // 2
                            THEN x ELSE 0 END)
                  * (CASE WHEN ((n + 1) // 2 + 1) // 2
                               = ((n + 1) // 2 + 2) // 2 THEN 2 ELSE 1 END))
                  AS BIGINT) AS q3_x2
      FROM ranked GROUP BY g
    ),
    fenced AS (
      SELECT g, n, min_c, max_c, q1_x2, med_x2, q3_x2,
             2 * q1_x2 - 3 * (q3_x2 - q1_x2) AS lo4,
             2 * q3_x2 + 3 * (q3_x2 - q1_x2) AS hi4
      FROM pos
    )
    SELECT f.g AS event_type, f.n, f.min_c, f.max_c, f.q1_x2, f.med_x2,
           f.q3_x2,
           CAST(SUM(CASE WHEN 4 * t.x < f.lo4 OR 4 * t.x > f.hi4
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM fenced f JOIN t ON t.g = f.g
    GROUP BY f.g, f.n, f.min_c, f.max_c, f.q1_x2, f.med_x2, f.q3_x2
    """,
    doc="[EXT] Tukey five-number summary + 1.5-IQR outlier counts, EXACT: "
    "the boxplot/EDA primitive with zero fp boundary risk. Hinges "
    "include the median in both halves (Tukey's convention); every "
    "quantile is an average of at most two order statistics, kept "
    "integer by DOUBLING, and the 1.5-IQR fences go to QUADRUPLED units "
    "(2·q1_2 − 3·iqr_2) so the outlier comparison 4x < lo4 is pure "
    "integer — the same scaled-units ladder as MAD/winsorize, one step "
    "further. Shape: one rank window over the per-group sort, order "
    "statistics picked by rank arithmetic (no percentile interpolation "
    "anywhere), one broadcast-sized fence join back for the count.",
    tags=("stats",),
)
def stat_tukey_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    t = ev.select(F.col("event_type").alias("g"), _cents().alias("x"))
    wr = Window.partitionBy("g").orderBy("x")
    wn = Window.partitionBy("g")
    ranked = t.select(
        "g",
        "x",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    m = F.expr("(n + 1) div 2")
    q1a, q1b = F.expr("((n + 1) div 2 + 1) div 2"), F.expr(
        "((n + 1) div 2 + 2) div 2"
    )
    meda, medb = F.expr("(n + 1) div 2"), F.expr("(n + 2) div 2")
    q3a, q3b = (F.col("n") - m + q1a), (F.col("n") - m + q1b)

    def picked(a, b):
        hit = F.when((F.col("rn") == a) | (F.col("rn") == b), F.col("x")).otherwise(
            0
        )
        dbl = F.when(a == b, 2).otherwise(1)
        return (F.sum(hit * dbl)).cast("long")

    # a == b comparisons involve n (constant per group) — move the doubling
    # factor inside the sum so it stays row-local.
    pos = ranked.groupBy("g").agg(
        F.max("n").cast("long").alias("n"),
        F.min("x").cast("long").alias("min_c"),
        F.max("x").cast("long").alias("max_c"),
        picked(q1a, q1b).alias("q1_x2"),
        picked(meda, medb).alias("med_x2"),
        picked(q3a, q3b).alias("q3_x2"),
    )
    fenced = pos.select(
        "*",
        (2 * F.col("q1_x2") - 3 * (F.col("q3_x2") - F.col("q1_x2"))).alias("lo4"),
        (2 * F.col("q3_x2") + 3 * (F.col("q3_x2") - F.col("q1_x2"))).alias("hi4"),
    )
    fenced = fenced.withColumnRenamed("g", "fenced_g")
    joined = t.join(F.broadcast(fenced), F.col("g") == F.col("fenced_g"))
    out = joined.groupBy(
        "fenced_g", "n", "min_c", "max_c", "q1_x2", "med_x2", "q3_x2"
    ).agg(
        F.sum(
            F.when(
                (4 * F.col("x") < F.col("lo4")) | (4 * F.col("x") > F.col("hi4")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_outliers")
    )
    return out.select(
        F.col("fenced_g").alias("event_type"),
        "n",
        "min_c",
        "max_c",
        "q1_x2",
        "med_x2",
        "q3_x2",
        "n_outliers",
    )


# ---------------------------------------------------------------------------
# Cross-correlation function: click vs purchase hourly series at lags.
# ---------------------------------------------------------------------------


@QS.add(
    "stat_crosscorr_lags",
    f"""
    WITH hourly AS (
      SELECT event_type, epoch_ms(ts) // {_HOUR_MS} AS h,
             CAST(SUM({_CENTS}) AS BIGINT) AS s
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, h
    ),
    a AS (SELECT h, s AS x FROM hourly WHERE event_type = 'click'),
    b AS (SELECT h, s AS y FROM hourly WHERE event_type = 'purchase'),
    lagged AS (
      SELECT l.lag, a.x, b.y
      FROM (SELECT UNNEST(range(-3, 4)) AS lag) l
      JOIN a ON TRUE
      JOIN b ON b.h = a.h + l.lag
    ),
    c AS (
      SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM lagged GROUP BY lag
    )
    SELECT CAST(lag AS BIGINT) AS lag, n,
           CAST(n * sxy - sx * sy AS BIGINT) AS num,
           CAST(n * sxx - sx * sx AS BIGINT) AS den_x,
           CAST(n * syy - sy * sy AS BIGINT) AS den_y,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS r
    FROM c
    """,
    doc="[EXT] cross-correlation function: the click-hourly series against "
    "the purchase-hourly series at lags −3..+3 — which direction leads, "
    "and by how many hours (the lead-lag discovery step before any "
    "causal/forecast modeling; a peak at positive lag means clicks lead "
    "purchases). Per lag, the exact Pearson component form over the "
    "aligned hour pairs; the 7-lag fan-out multiplies the calendar-"
    "bounded HOURLY table, never events, and each lag's components are "
    "one map-side-combinable aggregate. Floats finish with the fixed "
    "sqrt·sqrt division tree — hash-matched.",
    tags=("stats", "timeseries"),
)
def stat_crosscorr_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    hourly = (
        ev.select(
            "event_type",
            F.expr(f"unix_millis(ts) div {_HOUR_MS}").alias("h"),
            _cents().alias("cents"),
        )
        .groupBy("event_type", "h")
        .agg(F.sum("cents").cast("long").alias("s"))
    )
    a = hourly.filter(F.col("event_type") == "click").select(
        "h", F.col("s").alias("x")
    )
    b = hourly.filter(F.col("event_type") == "purchase").select(
        F.col("h").alias("hb"), F.col("s").alias("y")
    )
    lags = a.select(
        "h", "x", F.explode(F.sequence(F.lit(-3), F.lit(3))).alias("lag")
    )
    lagged = lags.join(b, F.col("hb") == F.col("h") + F.col("lag"))
    c = lagged.groupBy("lag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den_x = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    den_y = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return c.select(
        F.col("lag").cast("long").alias("lag"),
        "n",
        num.cast("long").alias("num"),
        den_x.cast("long").alias("den_x"),
        den_y.cast("long").alias("den_y"),
        (
            num.cast("double")
            / (F.sqrt(den_x.cast("double")) * F.sqrt(den_y.cast("double")))
        ).alias("r"),
    )


# ---------------------------------------------------------------------------
# Data freshness lag (operational DQ).
# ---------------------------------------------------------------------------


@QS.add(
    "dq_freshness_lag",
    """
    WITH m AS (
      SELECT event_type, MAX(ts) AS last_ts,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY event_type
    ),
    gmax AS (SELECT MAX(ts) AS global_last FROM events)
    SELECT m.event_type, m.n, m.last_ts,
           CAST(epoch_ms(gmax.global_last) - epoch_ms(m.last_ts) AS BIGINT)
             AS lag_ms
    FROM m CROSS JOIN gmax
    """,
    doc="[EXT] per-stream freshness: how far each event type's latest "
    "event trails the table's watermark (global max ts) — THE first "
    "operational data-quality pager for multi-source ingestion (a stuck "
    "upstream shows as a growing lag long before volumes look wrong). "
    "Exact millisecond integers relative to the in-data watermark, so "
    "the check is reproducible (no now() — wall-clock freshness is this "
    "minus one constant). Two map-side-combinable MAX aggregates and a "
    "1-row cross join.",
    tags=("quality",),
)
def dq_freshness_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    m = ev.groupBy("event_type").agg(
        F.max("ts").alias("last_ts"), F.count(F.lit(1)).cast("long").alias("n")
    )
    gmax = ev.agg(F.max("ts").alias("global_last"))
    return m.crossJoin(F.broadcast(gmax)).select(
        "event_type",
        "n",
        "last_ts",
        (
            F.unix_millis(F.col("global_last")) - F.unix_millis(F.col("last_ts"))
        )
        .cast("long")
        .alias("lag_ms"),
    )


# ---------------------------------------------------------------------------
# Degree assortativity of the co-purchase graph (exact components).
# ---------------------------------------------------------------------------


@QS.add(
    "graph_assortativity",
    """
    WITH e0 AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
      HAVING COUNT(*) >= 2
    ),
    sym AS (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0),
    deg AS (
      SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS d FROM sym GROUP BY u
    ),
    xy AS (
      SELECT du.d AS x, dv.d AS y
      FROM sym
      JOIN deg du ON sym.u = du.node
      JOIN deg dv ON sym.v = dv.node
    ),
    c AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM xy
    )
    SELECT n,
           CAST(n * sxy - sx * sy AS BIGINT) AS num,
           CAST(n * sxx - sx * sx AS BIGINT) AS den_x,
           CAST(n * syy - sy * sy AS BIGINT) AS den_y,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS r
    FROM c
    """,
    doc="[EXT] degree assortativity of the part co-purchase graph "
    "(support ≥ 2, same edge definition as graph_triangle_count): the "
    "Pearson correlation of endpoint degrees over all directed edges — "
    "Newman's do-hubs-connect-to-hubs diagnostic that decides whether "
    "degree-based sampling or salting is needed before heavier graph "
    "algorithms. Degrees come from one aggregate over the symmetrized "
    "edge list, the (x, y) pairs from two broadcast-scale degree joins, "
    "and the statistic is the exact BIGINT Pearson component form with "
    "the fixed float finish — hash-matched end to end over a "
    "graph-valued input.",
    tags=("graph", "stats"),
)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    e0 = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .agg(F.count(F.lit(1)).alias("m"))
        .filter(F.col("m") >= 2)
        .select("u", "v")
    )
    sym = e0.unionByName(
        e0.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).persist()
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("d"))
    du = deg.select(F.col("u").alias("nu"), F.col("d").alias("x"))
    dv = deg.select(F.col("u").alias("nv"), F.col("d").alias("y"))
    xy = (
        sym.join(F.broadcast(du), F.col("u") == F.col("nu"))
        .join(F.broadcast(dv), F.col("v") == F.col("nv"))
        .select("x", "y")
    )
    c = xy.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den_x = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    den_y = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return c.select(
        "n",
        num.cast("long").alias("num"),
        den_x.cast("long").alias("den_x"),
        den_y.cast("long").alias("den_y"),
        (
            num.cast("double")
            / (F.sqrt(den_x.cast("double")) * F.sqrt(den_y.cast("double")))
        ).alias("r"),
    )


# ---------------------------------------------------------------------------
# BPE application: tokenize the whole corpus with the learned merges.
# ---------------------------------------------------------------------------


def _bpe_apply_oracle(n: int) -> str:
    """Unrolled learn-then-apply twin: the same MATERIALIZED merge chain
    as ``_bpe_oracle`` but with the word carried through every rewrite, so
    the final symbol table segments the vocabulary and a join against the
    per-doc word counts tokenizes the corpus."""
    ctes = [
        f"toks AS MATERIALIZED (SELECT doc_id, {_TOKS} AS t FROM documents)",
        "w AS MATERIALIZED (SELECT tok AS word, CAST(COUNT(*) AS BIGINT)"
        " AS freq FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY tok)",
        "s0 AS MATERIALIZED (SELECT word, freq,"
        " regexp_replace(word, '(.)', '\\1 ', 'g') || '</w>' AS sym FROM w)",
    ]
    for i in range(1, n + 1):
        ctes.append(
            f"p{i} AS ("
            " SELECT p['lhs'] AS lhs, p['rhs'] AS rhs,"
            " CAST(SUM(freq) AS BIGINT) AS pair_count"
            " FROM (SELECT freq, unnest(list_transform(range(1, len(tk)),"
            " j -> {'lhs': tk[j], 'rhs': tk[j + 1]})) AS p"
            f" FROM (SELECT freq, string_split(sym, ' ') AS tk FROM s{i - 1}))"
            " GROUP BY lhs, rhs)"
        )
        ctes.append(
            f"m{i} AS MATERIALIZED (SELECT lhs, rhs FROM p{i}"
            " ORDER BY pair_count DESC, lhs, rhs LIMIT 1)"
        )
        ctes.append(
            f"s{i} AS MATERIALIZED (SELECT word, freq,"
            " trim(replace(replace(' ' || replace(sym, ' ', '  ') || ' ',"
            f" ' ' || (SELECT lhs FROM m{i}) || '  ' || (SELECT rhs FROM m{i}) || ' ',"
            f" ' ' || (SELECT lhs FROM m{i}) || (SELECT rhs FROM m{i}) || ' '),"
            f" '  ', ' ')) AS sym FROM s{i - 1})"
        )
    tail = f"""
    seg AS (SELECT word, CAST(len(string_split(sym, ' ')) AS BIGINT) AS n_sub
            FROM s{n}),
    docw AS (SELECT doc_id, tok AS word, CAST(COUNT(*) AS BIGINT) AS c
             FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
             GROUP BY doc_id, tok)
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_words,
           CAST(SUM(c * n_sub) AS BIGINT) AS n_bpe_tokens
    FROM docw JOIN seg USING (word)
    GROUP BY doc_id
    """
    return "WITH " + ",\n".join(ctes) + ",\n" + tail


@QS.add(
    "bpe_apply_corpus",
    _bpe_apply_oracle(_BPE_MERGES),
    doc="[EXT] corpus tokenization under the learned BPE table — the "
    "apply half of bpe_learn_merges (train -> tokenize is THE "
    "pretraining-corpus sizing pass: per-document token counts decide "
    "packing, cost, and mixture budgets). The merge chain is applied "
    "ONCE per distinct word via the same space-doubling replace "
    "expressions (JVM-side, zero Python), so tokenization cost scales "
    "with the VOCABULARY, not the corpus; documents tokenize through a "
    "broadcast join of the (word, n_subtokens) segment table against "
    "per-doc word counts. Exact BIGINT counts per doc hash-match "
    "DuckDB's unrolled learn-then-apply twin end to end — the oracle "
    "re-learns every merge before re-applying it.",
    tags=("text", "iterative"),
    headline=True,
)
def bpe_apply_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.bpe import (
        _apply_merge,
        initial_symbols,
        learn_bpe_distributed,
    )

    docs = load(spark, sf_dir, "documents")
    tok = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("word"))
        .coalesce(8)
        .persist()
    )
    words = tok.groupBy("word").agg(F.count(F.lit(1)).cast("long").alias("freq"))
    merges = learn_bpe_distributed(words, _BPE_MERGES)
    sym = initial_symbols(F.col("word"))
    for m in merges:
        sym = _apply_merge(sym, F.lit(m.lhs), F.lit(m.rhs))
    seg = words.select(
        "word", F.size(F.split(sym, " ")).cast("long").alias("n_sub")
    )
    docw = tok.groupBy("doc_id", "word").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    return (
        docw.join(F.broadcast(seg), "word")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_words"),
            F.sum(F.col("c") * F.col("n_sub")).cast("long").alias("n_bpe_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic language rebalance (mixture downsampling by hash rank).
# ---------------------------------------------------------------------------


@QS.add(
    "corpus_lang_rebalance",
    """
    WITH ranked AS (
      SELECT lang, doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents
    ),
    m AS (SELECT MIN(cnt) AS m FROM
            (SELECT COUNT(*) AS cnt FROM documents GROUP BY lang)),
    kept AS (
      SELECT lang, doc_id FROM ranked CROSS JOIN m WHERE rk <= m.m
    )
    SELECT r.lang,
           CAST(COUNT(*) AS BIGINT) AS n_available,
           CAST(COUNT(*) FILTER (k.doc_id IS NOT NULL) AS BIGINT) AS n_kept,
           md5(string_agg(CAST(k.doc_id AS VARCHAR), ','
                          ORDER BY k.doc_id)) AS kept_fp
    FROM ranked r LEFT JOIN kept k
      ON r.lang = k.lang AND r.doc_id = k.doc_id
    GROUP BY r.lang
    """,
    doc="[EXT] deterministic multilingual rebalance — downsample every "
    "language to the size of the smallest one (the balanced-mixture "
    "step of multilingual pretraining-corpus assembly). Selection is by "
    "HASH RANK: docs sort within each language by md5 of their id and "
    "the lowest m survive — reproducible across engines and runs, "
    "uniformly random w.r.t. content, and incrementally stable (a doc's "
    "rank only moves if earlier-hashed docs arrive). One window over "
    "(lang, doc) and one broadcast-scale min; the kept set is "
    "fingerprinted (md5 of the ordered id list) so the GATE covers the "
    "exact sample, not just its size.",
    tags=("text", "sampling"),
)
def corpus_lang_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("lang", "doc_id")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    ranked = docs.withColumn("rk", F.row_number().over(w)).coalesce(8).persist()
    m = ranked.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).agg(
        F.min("cnt").alias("m")
    )
    kept = ranked.crossJoin(F.broadcast(m)).filter(F.col("rk") <= F.col("m"))
    return (
        ranked.alias("r")
        .join(
            kept.select(
                F.col("lang").alias("kl"), F.col("doc_id").alias("kd")
            ),
            (F.col("r.lang") == F.col("kl")) & (F.col("r.doc_id") == F.col("kd")),
            "left",
        )
        .groupBy(F.col("r.lang").alias("lang"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_available"),
            F.count("kd").cast("long").alias("n_kept"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list("kd")
                        ),
                        lambda d: d.cast("string"),
                    ),
                    ",",
                )
            ).alias("kept_fp"),
        )
    )


# ---------------------------------------------------------------------------
# Round-6: BPE tokenizer ARTIFACT — vocab table (token -> id) + id-level
# encode/decode round-trip (VERDICT r05 task 5). Turns the learn/apply
# pair into a usable tokenizer: ids by rank, decode back to byte-exact
# text through the id mapping.
# ---------------------------------------------------------------------------


def _bpe_artifact_ctes(n: int) -> str:
    """Word-carried merge chain (same as ``_bpe_apply_oracle``) extended
    with the vocab tables: base symbols = the s0 character inventory
    (incl. the </w> marker) id'd 0..B-1 in lexicographic order, merges
    id'd B+rank-1 in learned order — the GPT-2 vocab-file convention."""
    ctes = [
        f"toks AS MATERIALIZED (SELECT doc_id, {_TOKS} AS t FROM documents)",
        "w AS MATERIALIZED (SELECT tok AS word, CAST(COUNT(*) AS BIGINT)"
        " AS freq FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY tok)",
        "s0 AS MATERIALIZED (SELECT word, freq,"
        " regexp_replace(word, '(.)', '\\1 ', 'g') || '</w>' AS sym FROM w)",
    ]
    for i in range(1, n + 1):
        ctes.append(
            f"p{i} AS ("
            " SELECT p['lhs'] AS lhs, p['rhs'] AS rhs,"
            " CAST(SUM(freq) AS BIGINT) AS pair_count"
            " FROM (SELECT freq, unnest(list_transform(range(1, len(tk)),"
            " j -> {'lhs': tk[j], 'rhs': tk[j + 1]})) AS p"
            f" FROM (SELECT freq, string_split(sym, ' ') AS tk FROM s{i - 1}))"
            " GROUP BY lhs, rhs)"
        )
        ctes.append(
            f"m{i} AS MATERIALIZED (SELECT lhs, rhs FROM p{i}"
            " ORDER BY pair_count DESC, lhs, rhs LIMIT 1)"
        )
        ctes.append(
            f"s{i} AS MATERIALIZED (SELECT word, freq,"
            " trim(replace(replace(' ' || replace(sym, ' ', '  ') || ' ',"
            f" ' ' || (SELECT lhs FROM m{i}) || '  ' || (SELECT rhs FROM m{i}) || ' ',"
            f" ' ' || (SELECT lhs FROM m{i}) || (SELECT rhs FROM m{i}) || ' '),"
            f" '  ', ' ')) AS sym FROM s{i - 1})"
        )
    ctes.append(
        "base AS MATERIALIZED (SELECT DISTINCT unnest(string_split(sym, ' '))"
        " AS token FROM s0)"
    )
    ctes.append(
        "base_ids AS MATERIALIZED (SELECT token,"
        " CAST(row_number() OVER (ORDER BY token) - 1 AS BIGINT) AS token_id"
        " FROM base)"
    )
    ctes.append("nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM base)")
    merge_union = " UNION ALL ".join(
        f"SELECT (SELECT n FROM nb) + {i} - 1 AS token_id,"
        f" lhs || rhs AS token, 'merge' AS kind,"
        f" CAST({i} AS BIGINT) AS merge_rank FROM m{i}"
        for i in range(1, n + 1)
    )
    ctes.append(
        "vocab AS MATERIALIZED (SELECT token_id, token, 'base' AS kind,"
        " CAST(-1 AS BIGINT) AS merge_rank FROM base_ids"
        f" UNION ALL {merge_union})"
    )
    return ",\n".join(ctes)


def _bpe_vocab_df(spark, words, merges):
    """Spark twin of the vocab CTEs: (token_id, token, kind, merge_rank).

    The base-id row_number runs over the CHARACTER INVENTORY of the
    corpus (alphabet-bounded — dozens of rows), so the global window and
    the driver-side count are both bounded collects, never data-scaled.
    """
    from pyspark.sql.window import Window as W

    from clinical_api_etl_spark.operators.bpe import initial_symbols

    base = (
        words.select(
            F.explode(F.split(initial_symbols(F.col("word")), " ")).alias("token")
        )
        .distinct()
    )
    base_ids = base.select(
        (F.row_number().over(W.orderBy("token")) - 1).cast("long").alias("token_id"),
        "token",
        F.lit("base").alias("kind"),
        F.lit(-1).cast("long").alias("merge_rank"),
    )
    n_base = base.count()
    merge_rows = [
        (n_base + r.it - 1, r.merged, "merge", r.it) for r in merges
    ]
    merges_df = spark.createDataFrame(
        merge_rows, "token_id long, token string, kind string, merge_rank long"
    )
    return base_ids.unionByName(merges_df)


@QS.add(
    "bpe_vocab_table",
    "WITH "
    + _bpe_artifact_ctes(_BPE_MERGES)
    + "\nSELECT token_id, token, kind, merge_rank FROM vocab",
    doc="[EXT] the trained BPE tokenizer as a publishable ARTIFACT: "
    "token -> id table in the GPT-2 vocab-file convention (base symbols "
    "= the corpus character inventory + </w>, id'd lexicographically; "
    "merged tokens id'd base_count + rank - 1 in learned order). "
    "Hash-gated against the unrolled DuckDB merge chain — the id "
    "mapping itself is what the gate pins. Vocab size is alphabet + "
    "n_merges: every step after the learn loop is bounded by the "
    "MODEL, not the corpus.",
    tags=("text", "iterative"),
)
def bpe_vocab_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.bpe import learn_bpe_distributed

    docs = load(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    merges = learn_bpe_distributed(words, _BPE_MERGES)
    return _bpe_vocab_df(spark, words, merges)


@QS.add(
    "bpe_roundtrip_identity",
    "WITH "
    + _bpe_artifact_ctes(_BPE_MERGES)
    + f""",
    venc AS (SELECT token, MIN(token_id) AS token_id FROM vocab GROUP BY token),
    symtab AS (
      SELECT z.word, u.s AS spos, z.tk[u.s] AS symtok
      FROM (SELECT word, string_split(sym, ' ') AS tk FROM s{_BPE_MERGES}) z,
           unnest(range(1, len(z.tk) + 1)) AS u(s)
    ),
    enc AS (SELECT st.word, st.spos, venc.token_id
            FROM symtab st JOIN venc ON st.symtok = venc.token),
    dec AS (SELECT e.word, e.spos, v2.token AS dtok
            FROM enc e JOIN vocab v2 ON e.token_id = v2.token_id),
    dw AS (SELECT word,
                  regexp_replace(string_agg(dtok, '' ORDER BY spos),
                                 '</w>$', '') AS decoded
           FROM dec GROUP BY word),
    tp AS (SELECT doc_id, u.q AS pos, t[u.q] AS word
           FROM toks, unnest(range(1, len(t) + 1)) AS u(q))
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
           md5(string_agg(tp.word, ' ' ORDER BY pos)) AS orig_md5,
           md5(string_agg(dw.decoded, ' ' ORDER BY pos)) AS decoded_md5,
           CAST(SUM(CASE WHEN tp.word = dw.decoded THEN 1 ELSE 0 END)
                AS BIGINT) AS n_roundtrip_ok
    FROM tp JOIN dw USING (word)
    GROUP BY doc_id
    """,
    doc="[EXT] tokenizer round-trip gate THROUGH THE ID MAPPING: every "
    "word is segmented by the learned merges, encoded to vocab ids "
    "(ties to the smallest id), decoded BACK to token strings via the "
    "id join, re-assembled in pinned position order, and compared to "
    "the original — per doc, md5 of the re-decoded text must equal md5 "
    "of the input (normalized) text and n_roundtrip_ok == n_words. A "
    "misassigned or colliding id would break the equality. Encode/"
    "decode are broadcast-sized joins against the vocab artifact; the "
    "per-doc rebuild shuffles (doc_id, position) pairs only.",
    tags=("text", "iterative"),
)
def bpe_roundtrip_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.bpe import (
        _apply_merge,
        initial_symbols,
        learn_bpe_distributed,
    )

    docs = load(spark, sf_dir, "documents")
    tok = (
        docs.select("doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "word"))
        .coalesce(8)
        .persist()
    )
    words = tok.groupBy("word").agg(F.count(F.lit(1)).cast("long").alias("freq"))
    merges = learn_bpe_distributed(words, _BPE_MERGES)
    vocab = _bpe_vocab_df(spark, words, merges).persist()
    vocab.count()  # force-materialize before joins (AQE stats; CLAUDE.md r4)

    sym = initial_symbols(F.col("word"))
    for m in merges:
        sym = _apply_merge(sym, F.lit(m.lhs), F.lit(m.rhs))
    symtab = words.select(
        "word", F.posexplode(F.split(sym, " ")).alias("spos", "symtok")
    )
    venc = vocab.groupBy("token").agg(F.min("token_id").alias("token_id"))
    enc = symtab.join(
        F.broadcast(venc), symtab["symtok"] == venc["token"]
    ).select("word", "spos", "token_id")
    dec = enc.join(
        F.broadcast(vocab.select("token_id", F.col("token").alias("dtok"))),
        "token_id",
    )
    dw = dec.groupBy("word").agg(
        F.regexp_replace(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("spos", "dtok"))),
                    lambda s: s["dtok"],
                ),
            ),
            "</w>$",
            "",
        ).alias("decoded")
    )
    out = (
        tok.join(dw, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "word"))),
                        lambda s: s["word"],
                    ),
                )
            ).alias("orig_md5"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "decoded"))),
                        lambda s: s["decoded"],
                    ),
                )
            ).alias("decoded_md5"),
            F.sum(
                F.when(F.col("word") == F.col("decoded"), 1).otherwise(0)
            ).cast("long").alias("n_roundtrip_ok"),
        )
    )
    return out


@QS.add(
    "bpe_fertility_by_lang",
    "WITH "
    + _bpe_artifact_ctes(_BPE_MERGES)
    + f""",
    seg AS (SELECT word, CAST(len(string_split(sym, ' ')) AS BIGINT) AS n_sub
            FROM s{_BPE_MERGES}),
    docw AS (
      SELECT d.lang, x.tok AS word, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT doc_id, unnest(t) AS tok FROM toks) x
      JOIN documents d USING (doc_id)
      GROUP BY d.lang, x.tok
    )
    SELECT lang,
           CAST(SUM(c) AS BIGINT) AS n_words,
           CAST(SUM(c * n_sub) AS BIGINT) AS n_bpe_tokens,
           CAST(SUM(c * n_sub) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)
             AS fertility
    FROM docw JOIN seg USING (word)
    GROUP BY lang
    """,
    doc="[EXT] tokenizer FERTILITY by language (BPE tokens per word) — "
    "the standard multilingual-tokenizer equity metric: a vocab trained "
    "on an en-heavy corpus over-segments the other languages, and this "
    "is the query that shows it before a training run locks the vocab "
    "in. Reuses the learned merge chain over the distinct-word table "
    "(vocabulary-scaled); per-language counts are exact BIGINTs and "
    "fertility is one division — hash-gated end to end against the "
    "unrolled DuckDB learn-then-apply twin.",
    tags=("text", "iterative"),
)
def bpe_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.bpe import (
        _apply_merge,
        initial_symbols,
        learn_bpe_distributed,
    )

    docs = load(spark, sf_dir, "documents")
    tok = (
        docs.select(
            "lang", F.explode(tokens(F.col("text"))).alias("word")
        )
        .coalesce(8)
        .persist()
    )
    words = tok.groupBy("word").agg(F.count(F.lit(1)).cast("long").alias("freq"))
    merges = learn_bpe_distributed(words, _BPE_MERGES)
    sym = initial_symbols(F.col("word"))
    for m in merges:
        sym = _apply_merge(sym, F.lit(m.lhs), F.lit(m.rhs))
    seg = words.select(
        "word", F.size(F.split(sym, " ")).cast("long").alias("n_sub")
    )
    docw = tok.groupBy("lang", "word").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    return (
        docw.join(F.broadcast(seg), "word")
        .groupBy("lang")
        .agg(
            F.sum("c").cast("long").alias("n_words"),
            F.sum(F.col("c") * F.col("n_sub")).cast("long").alias("n_bpe_tokens"),
            (
                F.sum(F.col("c") * F.col("n_sub")).cast("double")
                / F.sum("c").cast("double")
            ).alias("fertility"),
        )
    )


def _cvm_oracle(src: str) -> str:
    """DuckDB CvM SQL over any (g: VARCHAR, x: BIGINT) sample source —
    shared by the registry oracle and the EDF property gate."""
    return f"""
    WITH t AS ({src}),
    hist AS (
      SELECT g, x, CAST(COUNT(*) AS BIGINT) AS c FROM t GROUP BY g, x
    ),
    types AS (SELECT DISTINCT g AS o FROM t),
    sides AS (
      SELECT least(h.g, ty.o) AS ga, greatest(h.g, ty.o) AS gb,
             h.g AS side, h.x AS x, h.c AS c
      FROM hist h JOIN types ty ON ty.o <> h.g
    ),
    merged AS (
      SELECT ga, gb, x,
             CAST(COALESCE(SUM(c) FILTER (WHERE side = ga), 0) AS BIGINT) AS ca,
             CAST(COALESCE(SUM(c) FILTER (WHERE side = gb), 0) AS BIGINT) AS cb
      FROM sides GROUP BY ga, gb, x
    ),
    walked AS (
      SELECT ga, gb, x, ca, cb,
             SUM(ca) OVER w AS cum_a, SUM(cb) OVER w AS cum_b
      FROM merged
      WINDOW w AS (PARTITION BY ga, gb ORDER BY x
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    totals AS (
      SELECT ga, gb, CAST(MAX(cum_a) AS BIGINT) AS n_a,
             CAST(MAX(cum_b) AS BIGINT) AS n_b
      FROM walked GROUP BY ga, gb
    ),
    terms AS (
      SELECT w.ga, w.gb, w.x, t.n_a, t.n_b,
             CAST(w.ca + w.cb AS DOUBLE)
             * (CAST(w.cum_a * t.n_b - w.cum_b * t.n_a AS DOUBLE)
                * CAST(w.cum_a * t.n_b - w.cum_b * t.n_a AS DOUBLE)) AS term
      FROM walked w JOIN totals t ON w.ga = t.ga AND w.gb = t.gb
    )
    SELECT ga, gb,
           CAST(MAX(n_a) AS BIGINT) AS n_a,
           CAST(MAX(n_b) AS BIGINT) AS n_b,
           list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list(term ORDER BY x)), (p, q) -> p + q)
           / (CAST(MAX(n_a) * MAX(n_b) AS DOUBLE)
              * CAST((MAX(n_a) + MAX(n_b)) * (MAX(n_a) + MAX(n_b))
                     AS DOUBLE)) AS t_cvm
    FROM terms GROUP BY ga, gb
    """


@QS.add(
    "stat_cvm_pairs",
    _cvm_oracle(_EDF_SRC),
    doc="[EXT] two-sample Cramér–von Mises statistic between every pair "
    "of event types — the body-sensitive companion to stat_ks_pairs "
    "(KS sees only the single largest CDF gap; CvM integrates the "
    "SQUARED gap over the combined distribution, catching spread/shape "
    "differences KS misses): T = nm/(n+m)² Σ_x w_x (F_a−F_b)², "
    "computed over the same merged value histogram as the KS walk. "
    "Each gap numerator cum_a·n_b − cum_b·n_a is an exact BIGINT, the "
    "per-value term one fixed IEEE tree (cast, square, weight "
    "multiply), the sum a pinned value-order fold, and the final "
    "normalization a single division by exact integer products — "
    "fully hash-gated. Cost: the histogram walk (|distinct values| "
    "rows per pair), never the event table.",
    tags=("stats",),
)
def stat_cvm_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    t = ev.select(
        F.col("event_type").alias("g"),
        F.expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").alias("x"),
    )
    return cvm_from_samples(t)


def cvm_from_samples(t: DataFrame) -> DataFrame:
    """Pairwise two-sample CvM over any (g: string, x: long) sample frame
    (shared by the registry query and the EDF property gate)."""
    from pyspark.sql.window import Window as W

    hist = t.groupBy("g", "x").agg(F.count(F.lit(1)).cast("long").alias("c"))
    types = t.select(F.col("g").alias("o")).distinct()
    sides = hist.join(F.broadcast(types), F.col("o") != F.col("g")).select(
        F.least("g", "o").alias("ga"),
        F.greatest("g", "o").alias("gb"),
        F.col("g").alias("side"),
        "x",
        "c",
    )
    merged = sides.groupBy("ga", "gb", "x").agg(
        F.coalesce(
            F.sum(F.when(F.col("side") == F.col("ga"), F.col("c"))), F.lit(0)
        )
        .cast("long")
        .alias("ca"),
        F.coalesce(
            F.sum(F.when(F.col("side") == F.col("gb"), F.col("c"))), F.lit(0)
        )
        .cast("long")
        .alias("cb"),
    )
    w = (
        W.partitionBy("ga", "gb")
        .orderBy("x")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    walked = merged.select(
        "ga",
        "gb",
        "x",
        "ca",
        "cb",
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
    )
    totals = walked.groupBy("ga", "gb").agg(
        F.max("cum_a").cast("long").alias("n_a"),
        F.max("cum_b").cast("long").alias("n_b"),
    )
    d = F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a")
    terms = walked.join(totals, ["ga", "gb"]).select(
        "ga",
        "gb",
        "x",
        "n_a",
        "n_b",
        (
            (F.col("ca") + F.col("cb")).cast("double")
            * (d.cast("double") * d.cast("double"))
        ).alias("term"),
    )
    return terms.groupBy("ga", "gb").agg(
        F.max("n_a").cast("long").alias("n_a"),
        F.max("n_b").cast("long").alias("n_b"),
        (
            F.aggregate(
                F.sort_array(F.collect_list(F.struct("x", "term"))),
                F.lit(0.0),
                lambda acc, s: acc + s["term"],
            )
            / (
                (F.max("n_a") * F.max("n_b")).cast("double")
                * (
                    (F.max("n_a") + F.max("n_b"))
                    * (F.max("n_a") + F.max("n_b"))
                ).cast("double")
            )
        ).alias("t_cvm"),
    )


def _ad_oracle(src: str) -> str:
    """DuckDB Anderson–Darling SQL over any (g: VARCHAR, x: BIGINT) sample
    source — shared by the registry oracle and the EDF property gate."""
    return f"""
    WITH t AS ({src}),
    hist AS (
      SELECT g, x, CAST(COUNT(*) AS BIGINT) AS c FROM t GROUP BY g, x
    ),
    types AS (SELECT DISTINCT g AS o FROM t),
    sides AS (
      SELECT least(h.g, ty.o) AS ga, greatest(h.g, ty.o) AS gb,
             h.g AS side, h.x AS x, h.c AS c
      FROM hist h JOIN types ty ON ty.o <> h.g
    ),
    merged AS (
      SELECT ga, gb, x,
             CAST(COALESCE(SUM(c) FILTER (WHERE side = ga), 0) AS BIGINT) AS ca,
             CAST(COALESCE(SUM(c) FILTER (WHERE side = gb), 0) AS BIGINT) AS cb
      FROM sides GROUP BY ga, gb, x
    ),
    walked AS (
      SELECT ga, gb, x, ca, cb,
             SUM(ca) OVER w AS cum_a, SUM(cb) OVER w AS cum_b
      FROM merged
      WINDOW w AS (PARTITION BY ga, gb ORDER BY x
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    totals AS (
      SELECT ga, gb, CAST(MAX(cum_a) AS BIGINT) AS n_a,
             CAST(MAX(cum_b) AS BIGINT) AS n_b
      FROM walked GROUP BY ga, gb
    ),
    terms AS (
      SELECT w.ga, w.gb, w.x, t.n_a, t.n_b,
             CAST(w.ca + w.cb AS DOUBLE)
             * (CAST((t.n_a + t.n_b) * w.cum_a - t.n_a * (w.cum_a + w.cum_b)
                     AS DOUBLE)
                * CAST((t.n_a + t.n_b) * w.cum_a - t.n_a * (w.cum_a + w.cum_b)
                       AS DOUBLE))
             / CAST((w.cum_a + w.cum_b)
                    * ((t.n_a + t.n_b) - (w.cum_a + w.cum_b)) AS DOUBLE)
               AS term
      FROM walked w JOIN totals t ON w.ga = t.ga AND w.gb = t.gb
      WHERE (w.cum_a + w.cum_b) < (t.n_a + t.n_b)
    )
    SELECT ga, gb,
           CAST(MAX(n_a) AS BIGINT) AS n_a,
           CAST(MAX(n_b) AS BIGINT) AS n_b,
           list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list(term ORDER BY x)), (p, q) -> p + q)
           / CAST(MAX(n_a) * MAX(n_b) AS DOUBLE) AS a2
    FROM terms GROUP BY ga, gb
    """


@QS.add(
    "stat_ad_pairs",
    _ad_oracle(_EDF_SRC),
    doc="[EXT] two-sample Anderson–Darling statistic for every "
    "event-type pair — completing the EDF-test trio: KS sees the single "
    "largest CDF gap, CvM the integrated squared gap, AD re-weights "
    "that integral by 1/(H(1−H)) so TAIL differences count (the test "
    "that catches a shifted p99 the other two wash out). Scholz–"
    "Stephens ties form: A² = (1/nm) Σ_x w_x (N·cum_a − n_a·cumN)² / "
    "(cumN·(N−cumN)), the all-mass top value excluded (0 denominator). "
    "Every numerator/denominator is an exact BIGINT from the same "
    "merged histogram walk as KS/CvM; each term is one division, the "
    "sum a pinned value-order fold, the normalization one more "
    "division — fully hash-gated; cost is the histogram, never the "
    "event table.",
    tags=("stats",),
)
def stat_ad_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    t = ev.select(
        F.col("event_type").alias("g"),
        F.expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").alias("x"),
    )
    return ad_from_samples(t)


def ad_from_samples(t: DataFrame) -> DataFrame:
    """Pairwise two-sample Anderson–Darling over any (g: string, x: long)
    sample frame (shared by the registry query and the EDF property gate)."""
    from pyspark.sql.window import Window as W

    hist = t.groupBy("g", "x").agg(F.count(F.lit(1)).cast("long").alias("c"))
    types = t.select(F.col("g").alias("o")).distinct()
    sides = hist.join(F.broadcast(types), F.col("o") != F.col("g")).select(
        F.least("g", "o").alias("ga"),
        F.greatest("g", "o").alias("gb"),
        F.col("g").alias("side"),
        "x",
        "c",
    )
    merged = sides.groupBy("ga", "gb", "x").agg(
        F.coalesce(
            F.sum(F.when(F.col("side") == F.col("ga"), F.col("c"))), F.lit(0)
        )
        .cast("long")
        .alias("ca"),
        F.coalesce(
            F.sum(F.when(F.col("side") == F.col("gb"), F.col("c"))), F.lit(0)
        )
        .cast("long")
        .alias("cb"),
    )
    w = (
        W.partitionBy("ga", "gb")
        .orderBy("x")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    walked = merged.select(
        "ga",
        "gb",
        "x",
        "ca",
        "cb",
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
    )
    totals = walked.groupBy("ga", "gb").agg(
        F.max("cum_a").cast("long").alias("n_a"),
        F.max("cum_b").cast("long").alias("n_b"),
    )
    nn = F.col("n_a") + F.col("n_b")
    cumn = F.col("cum_a") + F.col("cum_b")
    num = nn * F.col("cum_a") - F.col("n_a") * cumn
    terms = (
        walked.join(totals, ["ga", "gb"])
        .filter(cumn < nn)
        .select(
            "ga",
            "gb",
            "x",
            "n_a",
            "n_b",
            (
                (F.col("ca") + F.col("cb")).cast("double")
                * (num.cast("double") * num.cast("double"))
                / (cumn * (nn - cumn)).cast("double")
            ).alias("term"),
        )
    )
    return terms.groupBy("ga", "gb").agg(
        F.max("n_a").cast("long").alias("n_a"),
        F.max("n_b").cast("long").alias("n_b"),
        (
            F.aggregate(
                F.sort_array(F.collect_list(F.struct("x", "term"))),
                F.lit(0.0),
                lambda acc, s: acc + s["term"],
            )
            / (F.max("n_a") * F.max("n_b")).cast("double")
        ).alias("a2"),
    )


def _pairdist_cte(side: str, src: str) -> str:
    """Σ_{i<j} c_i c_j (x_j − x_i) over one side's sorted histogram, in
    the O(n) prefix form: for each value, x·c·cumw_prev − c·cumxw_prev
    (all exact BIGINTs)."""
    return (
        f"{side} AS (SELECT ga, gb,"
        " CAST(SUM(x * c * cw - c * cxw) AS BIGINT) AS s,"
        " CAST(SUM(c) AS BIGINT) AS n FROM ("
        "   SELECT ga, gb, x, c,"
        "   COALESCE(SUM(c) OVER w, 0) AS cw,"
        "   COALESCE(SUM(x * c) OVER w, 0) AS cxw"
        f"  FROM {src}"
        "   WINDOW w AS (PARTITION BY ga, gb ORDER BY x"
        "                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
        " ) GROUP BY ga, gb)"
    )


def _energy_oracle(src: str) -> str:
    """DuckDB energy-distance SQL over any (g: VARCHAR, x: BIGINT) sample
    source — shared by the registry oracle and the EDF property gate."""
    return f"""
    WITH t AS ({src}),
    hist AS (
      SELECT g, x, CAST(COUNT(*) AS BIGINT) AS c FROM t GROUP BY g, x
    ),
    types AS (SELECT DISTINCT g AS o FROM t),
    sides AS (
      SELECT least(h.g, ty.o) AS ga, greatest(h.g, ty.o) AS gb,
             h.g AS side, h.x AS x, h.c AS c
      FROM hist h JOIN types ty ON ty.o <> h.g
    ),
    ha AS (SELECT ga, gb, x, c FROM sides WHERE side = ga),
    hb AS (SELECT ga, gb, x, c FROM sides WHERE side = gb),
    hm AS (SELECT ga, gb, x, CAST(SUM(c) AS BIGINT) AS c
           FROM sides GROUP BY ga, gb, x),
    {_pairdist_cte("pa", "ha")},
    {_pairdist_cte("pb", "hb")},
    {_pairdist_cte("pm", "hm")}
    SELECT pa.ga, pa.gb, pa.n AS n_a, pb.n AS n_b,
           CAST(pm.s - pa.s - pb.s AS BIGINT) AS cross_sum,
           pa.s AS within_a, pb.s AS within_b,
           CAST(2 * (pm.s - pa.s - pb.s) AS DOUBLE)
             / CAST(pa.n * pb.n AS DOUBLE)
           - CAST(2 * pa.s AS DOUBLE) / CAST(pa.n * pa.n AS DOUBLE)
           - CAST(2 * pb.s AS DOUBLE) / CAST(pb.n * pb.n AS DOUBLE)
             AS energy_cents
    FROM pa JOIN pb ON pa.ga = pb.ga AND pa.gb = pb.gb
            JOIN pm ON pa.ga = pm.ga AND pa.gb = pm.gb
    """


@QS.add(
    "stat_energy_distance_pairs",
    _energy_oracle(_EDF_SRC),
    doc="[EXT] two-sample ENERGY DISTANCE (Székely & Rizzo) for every "
    "event-type pair — the metric member of the distribution-distance "
    "family (zero iff the distributions are equal; KS/CvM/AD are "
    "tests, energy is a DISTANCE usable as a drift magnitude in "
    "cents): E = 2·E|X−Y| − E|X−X'| − E|Y−Y'|. Each mean-absolute-"
    "difference is computed EXACTLY: Σ_{{i<j}} c_i c_j (x_j − x_i) in "
    "the O(|values|) prefix form x·c·cumw − c·cum(xw) over the sorted "
    "histogram — all BIGINT (cents × counts² stays far under int64 at "
    "audit scale), with the cross term as whole-minus-withins (one "
    "merged-histogram pass instead of an a×b product). Three exact "
    "sums, three divisions, a fixed subtract tree — fully hash-gated.",
    tags=("stats",),
)
def stat_energy_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    t = ev.select(
        F.col("event_type").alias("g"),
        F.expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").alias("x"),
    )
    return energy_from_samples(t)


def energy_from_samples(t: DataFrame) -> DataFrame:
    """Pairwise two-sample energy distance over any (g: string, x: long)
    sample frame (shared by the registry query and the EDF property gate)."""
    from pyspark.sql.window import Window as W

    hist = t.groupBy("g", "x").agg(F.count(F.lit(1)).cast("long").alias("c"))
    types = t.select(F.col("g").alias("o")).distinct()
    sides = hist.join(F.broadcast(types), F.col("o") != F.col("g")).select(
        F.least("g", "o").alias("ga"),
        F.greatest("g", "o").alias("gb"),
        F.col("g").alias("side"),
        "x",
        "c",
    ).persist()

    def pairdist(df):
        w = (
            W.partitionBy("ga", "gb")
            .orderBy("x")
            .rowsBetween(W.unboundedPreceding, -1)
        )
        pre = df.select(
            "ga",
            "gb",
            "x",
            "c",
            F.coalesce(F.sum("c").over(w), F.lit(0)).alias("cw"),
            F.coalesce(F.sum(F.col("x") * F.col("c")).over(w), F.lit(0)).alias(
                "cxw"
            ),
        )
        return pre.groupBy("ga", "gb").agg(
            F.sum(
                F.col("x") * F.col("c") * F.col("cw") - F.col("c") * F.col("cxw")
            )
            .cast("long")
            .alias("s"),
            F.sum("c").cast("long").alias("n"),
        )

    pa = pairdist(sides.filter(F.col("side") == F.col("ga")))
    pb = pairdist(sides.filter(F.col("side") == F.col("gb")))
    hm = sides.groupBy("ga", "gb", "x").agg(
        F.sum("c").cast("long").alias("c")
    )
    pm = pairdist(hm)
    j = (
        pa.select("ga", "gb", F.col("s").alias("sa"), F.col("n").alias("n_a"))
        .join(
            pb.select(
                "ga", "gb", F.col("s").alias("sb"), F.col("n").alias("n_b")
            ),
            ["ga", "gb"],
        )
        .join(pm.select("ga", "gb", F.col("s").alias("sm")), ["ga", "gb"])
    )
    return j.select(
        "ga",
        "gb",
        "n_a",
        "n_b",
        (F.col("sm") - F.col("sa") - F.col("sb")).cast("long").alias("cross_sum"),
        F.col("sa").cast("long").alias("within_a"),
        F.col("sb").cast("long").alias("within_b"),
        (
            (F.lit(2) * (F.col("sm") - F.col("sa") - F.col("sb"))).cast("double")
            / (F.col("n_a") * F.col("n_b")).cast("double")
            - (F.lit(2) * F.col("sa")).cast("double")
            / (F.col("n_a") * F.col("n_a")).cast("double")
            - (F.lit(2) * F.col("sb")).cast("double")
            / (F.col("n_b") * F.col("n_b")).cast("double")
        ).alias("energy_cents"),
    )


# ---------------------------------------------------------------------------
# Kruskal-Wallis k-group rank test over ALL event types at once.
# ---------------------------------------------------------------------------


def _kw_oracle(src: str) -> str:
    """DuckDB Kruskal-Wallis SQL over any (g: VARCHAR, x: BIGINT) sample
    source — shared by the registry oracle and the EDF property gate."""
    return f"""
    WITH t AS ({src}),
    hist AS (
      SELECT g, x, CAST(COUNT(*) AS BIGINT) AS c FROM t GROUP BY g, x
    ),
    pooled AS (
      SELECT x, CAST(SUM(c) AS BIGINT) AS cx FROM hist GROUP BY x
    ),
    walked AS (
      SELECT x, cx,
             CAST(COALESCE(SUM(cx) OVER (ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS cum_before
      FROM pooled
    ),
    per_group AS (
      SELECT h.g,
             CAST(SUM(h.c) AS BIGINT) AS n_g,
             CAST(SUM(h.c * (2 * w.cum_before + w.cx + 1)) AS BIGINT) AS r2_g
      FROM hist h JOIN walked w ON w.x = h.x
      GROUP BY h.g
    ),
    scal AS (
      SELECT CAST(SUM(n_g) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS k,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(CAST(r2_g AS DOUBLE) * CAST(r2_g AS DOUBLE)
                    / CAST(n_g AS DOUBLE) ORDER BY g)), (p, q) -> p + q) AS s
      FROM per_group
    ),
    ties AS (
      SELECT CAST(SUM(cx * cx * cx - cx) AS BIGINT) AS tie_cubes FROM pooled
    )
    SELECT scal.k AS n_groups, scal.n AS n_total, ties.tie_cubes,
           3.0e0 * scal.s / CAST(scal.n * (scal.n + 1) AS DOUBLE)
             - 3.0e0 * CAST(scal.n + 1 AS DOUBLE) AS h,
           -- all values identical => correction 0/0; NULL = undefined
           -- (scipy raises here), never NaN (hash discipline)
           CASE WHEN ties.tie_cubes = scal.n * scal.n * scal.n - scal.n
                THEN NULL
                ELSE (3.0e0 * scal.s / CAST(scal.n * (scal.n + 1) AS DOUBLE)
                      - 3.0e0 * CAST(scal.n + 1 AS DOUBLE))
                     / (1.0e0 - CAST(ties.tie_cubes AS DOUBLE)
                        / CAST(scal.n * scal.n * scal.n - scal.n AS DOUBLE))
           END AS h_tie_adj
    FROM scal, ties
    """


@QS.add(
    "stat_kruskal_wallis",
    _kw_oracle(_EDF_SRC),
    doc="[EXT] Kruskal-Wallis H over ALL event types at once — the "
    "k-group extension of stat_mannwhitney_pairs, riding the SAME "
    "(group, value) histogram machinery: pooled midranks come from one "
    "walk over DISTINCT values (doubled midrank 2R = 2·cum_before + "
    "tie_count + 1 stays BIGINT), per-group doubled rank sums are exact "
    "BIGINT dot products of the group histogram against the walk, and "
    "H = 3·Σ(2R_g)²/n_g / (N(N+1)) − 3(N+1) (the doubled form absorbs "
    "the classic 12/4) with the group fold PINNED in group order — "
    "(2R_g)² squares in DOUBLE because N²-scale BIGINTs would overflow "
    "when squared; int→double casts are correctly rounded on both "
    "engines so the tree is bit-portable. Tie correction "
    "H/(1−Σ(t³−t)/(N³−N)) from exact BIGINT tie cubes. Cost: the "
    "histogram walk — |distinct values| rows, never events.",
    tags=("stats",),
)
def stat_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    t = ev.select(F.col("event_type").alias("g"), _cents().alias("x"))
    return kruskal_from_samples(t)


def kruskal_from_samples(t: DataFrame) -> DataFrame:
    """Kruskal-Wallis over any (g: string, x: long) sample frame (shared
    by the registry query and the EDF property gate)."""
    from pyspark.sql.window import Window as W

    hist = t.groupBy("g", "x").agg(F.count(F.lit(1)).cast("long").alias("c"))
    pooled = hist.groupBy("x").agg(F.sum("c").cast("long").alias("cx"))
    w = W.orderBy("x").rowsBetween(W.unboundedPreceding, -1)
    walked = pooled.select(
        "x",
        "cx",
        F.coalesce(F.sum("cx").over(w), F.lit(0)).cast("long").alias("cum_before"),
    )
    per_group = (
        hist.join(walked, "x")
        .groupBy("g")
        .agg(
            F.sum("c").cast("long").alias("n_g"),
            F.sum(
                F.col("c") * (2 * F.col("cum_before") + F.col("cx") + 1)
            )
            .cast("long")
            .alias("r2_g"),
        )
    )
    scal = per_group.agg(
        F.sum("n_g").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.aggregate(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        "g",
                        (
                            F.col("r2_g").cast("double")
                            * F.col("r2_g").cast("double")
                            / F.col("n_g").cast("double")
                        ).alias("term"),
                    )
                )
            ),
            F.lit(0.0),
            lambda acc, s: acc + s["term"],
        ).alias("s"),
    )
    ties = pooled.agg(
        F.sum(F.col("cx") * F.col("cx") * F.col("cx") - F.col("cx"))
        .cast("long")
        .alias("tie_cubes")
    )
    h = (
        F.lit(3.0) * F.col("s") / (F.col("n") * (F.col("n") + 1)).cast("double")
        - F.lit(3.0) * (F.col("n") + 1).cast("double")
    )
    n3n = F.col("n") * F.col("n") * F.col("n") - F.col("n")
    return scal.crossJoin(F.broadcast(ties)).select(
        F.col("k").alias("n_groups"),
        F.col("n").alias("n_total"),
        "tie_cubes",
        h.alias("h"),
        # all values identical => correction 0/0; NULL = undefined
        # (scipy raises here), never NaN (hash discipline)
        F.when(
            F.col("tie_cubes") == n3n,
            F.lit(None).cast("double"),
        )
        .otherwise(
            h
            / (
                F.lit(1.0)
                - F.col("tie_cubes").cast("double") / n3n.cast("double")
            )
        )
        .alias("h_tie_adj"),
    )


# ---------------------------------------------------------------------------
# WordPiece tokenizer merge learning (likelihood objective, hash-gated).
# ---------------------------------------------------------------------------

_WP_MERGES = 6


def _wordpiece_oracle(n: int) -> str:
    """Unrolled DuckDB twin of operators/bpe.py:learn_wordpiece_distributed
    — the BPE chain with a symbol-count CTE per iteration and the argmax
    re-keyed to the likelihood score (one IEEE division of exact BIGINTs;
    bit-identical across engines, ties lexicographic)."""
    ctes = [
        f"toks AS (SELECT {_TOKS} AS t FROM documents)",
        "w AS MATERIALIZED (SELECT tok AS word, CAST(COUNT(*) AS BIGINT)"
        " AS freq FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY tok)",
        "s0 AS MATERIALIZED (SELECT freq,"
        " regexp_replace(word, '(.)', '\\1 ', 'g') || '</w>' AS sym FROM w)",
    ]
    for i in range(1, n + 1):
        ctes.append(
            f"u{i} AS MATERIALIZED (SELECT tok, CAST(SUM(freq) AS BIGINT) AS c"
            " FROM (SELECT freq, unnest(string_split(sym, ' ')) AS tok"
            f" FROM s{i - 1}) GROUP BY tok)"
        )
        ctes.append(
            f"p{i} AS ("
            " SELECT p['lhs'] AS lhs, p['rhs'] AS rhs,"
            " CAST(SUM(freq) AS BIGINT) AS pair_count"
            " FROM (SELECT freq, unnest(list_transform(range(1, len(tk)),"
            " j -> {'lhs': tk[j], 'rhs': tk[j + 1]})) AS p"
            f" FROM (SELECT freq, string_split(sym, ' ') AS tk FROM s{i - 1}))"
            " GROUP BY lhs, rhs)"
        )
        ctes.append(
            f"m{i} AS MATERIALIZED (SELECT p.lhs, p.rhs, p.pair_count,"
            " ul.c AS lhs_count, ur.c AS rhs_count,"
            " CAST(p.pair_count AS DOUBLE) / CAST(ul.c * ur.c AS DOUBLE)"
            " AS score"
            f" FROM p{i} p JOIN u{i} ul ON ul.tok = p.lhs"
            f" JOIN u{i} ur ON ur.tok = p.rhs"
            " ORDER BY score DESC, p.lhs, p.rhs LIMIT 1)"
        )
        ctes.append(
            f"s{i} AS MATERIALIZED (SELECT freq,"
            " trim(replace(replace(' ' || replace(sym, ' ', '  ') || ' ',"
            f" ' ' || (SELECT lhs FROM m{i}) || '  ' || (SELECT rhs FROM m{i}) || ' ',"
            f" ' ' || (SELECT lhs FROM m{i}) || (SELECT rhs FROM m{i}) || ' '),"
            f" '  ', ' ')) AS sym FROM s{i - 1})"
        )
    union = " UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS it, lhs, rhs, lhs || rhs AS merged,"
        f" pair_count, lhs_count, rhs_count, score FROM m{i}"
        for i in range(1, n + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + union


@QS.add(
    "wordpiece_learn_merges",
    _wordpiece_oracle(_WP_MERGES),
    doc="[EXT] WordPiece tokenizer training (Schuster & Nakajima 2012; "
    "the BERT family), completing the THREE production tokenizer "
    "families next to bpe_learn_merges (count objective) and "
    "unigram_learn_vocab (EM): identical pair-count/merge-apply "
    "machinery, but the argmax maximizes the likelihood ratio "
    "count(l,r)/(count(l)·count(r)) — frequent-but-independent pairs "
    "lose to genuinely associated ones, so the learned merges DIVERGE "
    "from BPE's on the same corpus (tested). The score is one "
    "correctly-rounded division of exact BIGINTs (bit-identical both "
    "engines; ties lexicographic on bit-identical doubles), so the "
    "21st iterative algorithm carries a full value hash including the "
    "float scores. Oracle = the BPE unrolled MATERIALIZED chain plus a "
    "per-iteration symbol-count CTE.",
    tags=("text", "iterative"),
    headline=True,
)
def wordpiece_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.bpe import learn_wordpiece_distributed

    docs = load(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode_outer(tokens(F.col("text"))).alias("word"))
        .filter(F.col("word").isNotNull())
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    rows = learn_wordpiece_distributed(words, _WP_MERGES)
    return spark.createDataFrame(
        rows,
        schema="it BIGINT, lhs STRING, rhs STRING, merged STRING,"
        " pair_count BIGINT, lhs_count BIGINT, rhs_count BIGINT,"
        " score DOUBLE",
    )


# ---------------------------------------------------------------------------
# Autocorrelation function (lags 1..7) of the daily revenue series.
# ---------------------------------------------------------------------------

_ACF_MAX_LAG = 7
_DAY_MS = 86_400_000


@QS.add(
    "ts_acf_daily",
    f"""
    WITH daily AS (
      SELECT event_type, epoch_ms(ts) // {_DAY_MS} AS d,
             CAST(SUM({_CENTS}) AS BIGINT) AS s
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, d
    ),
    scal AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(s) AS BIGINT) AS tot
      FROM daily GROUP BY event_type
    ),
    cent AS (
      SELECT d.event_type, d.d, sc.n,
             CAST(sc.n * d.s - sc.tot AS BIGINT) AS c
      FROM daily d JOIN scal sc ON sc.event_type = d.event_type
    ),
    den AS (
      SELECT event_type, MAX(n) AS n,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(CAST(c AS DOUBLE) * CAST(c AS DOUBLE) ORDER BY d)),
               (p, q) -> p + q) AS den
      FROM cent GROUP BY event_type
    ),
    lagged AS (
      SELECT event_type, d, c,
             {", ".join(
                 f"lead(c, {k}) OVER w AS y{k},"
                 f" lead(d, {k}) OVER w - d AS dd{k}"
                 for k in range(1, _ACF_MAX_LAG + 1)
             )}
      FROM cent
      WINDOW w AS (PARTITION BY event_type ORDER BY d)
    ),
    terms AS (
      {" UNION ALL ".join(
          f"SELECT event_type, CAST({k} AS BIGINT) AS lag, d,"
          f" CAST(c AS DOUBLE) * CAST(y{k} AS DOUBLE) AS t"
          f" FROM lagged WHERE dd{k} = {k}"
          for k in range(1, _ACF_MAX_LAG + 1)
      )}
    ),
    num AS (
      SELECT event_type, lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(t ORDER BY d)), (p, q) -> p + q) AS num
      FROM terms GROUP BY event_type, lag
    )
    SELECT n.event_type, n.lag, d.n AS n_days, n.n_pairs,
           n.num / d.den AS acf
    FROM num n JOIN den d ON d.event_type = n.event_type
    """,
    doc="[EXT] sample autocorrelation function (lags 1-7) of each event "
    "type's daily revenue series — the ARIMA-order / seasonality "
    "diagnostic beyond stat_autocorr_lag1's Pearson-of-pairs form: the "
    "standard single-mean estimator r_k = Σ(x_t−x̄)(x_{{t+k}}−x̄) / "
    "Σ(x_t−x̄)², computed on n-scaled centered values n·x−S (exact "
    "BIGINTs ≤ 2^53, so each product is ONE IEEE multiply of exactly-"
    "converted doubles) with numerator and denominator as PINNED "
    "day-order folds and one final division — bit-portable per the "
    "round-8 fold rule, where the naive all-BIGINT form overflows at "
    "Σ(n·x−S)². Gap days pair with nothing (lead-day check = k); all "
    "seven lag numerators ride ONE window pass (7 leads in one "
    "WindowExec) over the |days| pre-aggregate, never the event table.",
    tags=("stats", "timeseries"),
)
def ts_acf_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    daily = (
        ev.select(
            "event_type",
            F.expr(f"unix_millis(ts) div {_DAY_MS}").alias("d"),
            _cents().alias("cents"),
        )
        .groupBy("event_type", "d")
        .agg(F.sum("cents").cast("long").alias("s"))
    )
    scal = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("s").cast("long").alias("tot"),
    )
    cent = daily.join(F.broadcast(scal), "event_type").select(
        "event_type",
        "d",
        "n",
        (F.col("n") * F.col("s") - F.col("tot")).cast("long").alias("c"),
    )
    den = cent.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n_days"),
        F.aggregate(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        "d",
                        (F.col("c").cast("double") * F.col("c").cast("double")).alias(
                            "t"
                        ),
                    )
                )
            ),
            F.lit(0.0),
            lambda acc, s: acc + s["t"],
        ).alias("den"),
    )
    w = Window.partitionBy("event_type").orderBy("d")
    lag_cols = []
    for k in range(1, _ACF_MAX_LAG + 1):
        lag_cols.append(F.lead("c", k).over(w).alias(f"y{k}"))
        lag_cols.append((F.lead("d", k).over(w) - F.col("d")).alias(f"dd{k}"))
    lagged = cent.select("event_type", "d", "c", *lag_cols)
    stack = ", ".join(
        f"{k}L, CASE WHEN dd{k} = {k} THEN CAST(c AS DOUBLE) * CAST(y{k} AS DOUBLE) END"
        for k in range(1, _ACF_MAX_LAG + 1)
    )
    terms = lagged.selectExpr(
        "event_type",
        "d",
        f"stack({_ACF_MAX_LAG}, {stack}) AS (lag, t)",
    ).filter(F.col("t").isNotNull())
    num = terms.groupBy("event_type", "lag").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("d", "t"))),
            F.lit(0.0),
            lambda acc, s: acc + s["t"],
        ).alias("num"),
    )
    return num.join(F.broadcast(den), "event_type").select(
        "event_type",
        F.col("lag").cast("long").alias("lag"),
        "n_days",
        "n_pairs",
        (F.col("num") / F.col("den")).alias("acf"),
    )


# ---------------------------------------------------------------------------
# Cochran-Armitage trend test: return probability vs quantity dose.
# ---------------------------------------------------------------------------


@QS.add(
    "stat_cochran_armitage_trend",
    """
    WITH dose AS (
      SELECT LEAST(4, (CAST(l_quantity AS BIGINT) - 1) // 10) AS s,
             CAST(COUNT(*) AS BIGINT) AS n_i,
             CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                  AS BIGINT) AS r_i
      FROM lineitem GROUP BY 1
    ),
    agg AS (
      SELECT CAST(SUM(n_i) AS BIGINT) AS n,
             CAST(SUM(r_i) AS BIGINT) AS r,
             CAST(SUM(s * r_i) AS BIGINT) AS sr,
             CAST(SUM(s * n_i) AS BIGINT) AS sn,
             CAST(SUM(s * s * n_i) AS BIGINT) AS ssn,
             CAST(COUNT(*) AS BIGINT) AS k_doses
      FROM dose
    )
    SELECT n AS n_total, r AS n_returns, k_doses,
           CAST(n * sr - r * sn AS BIGINT) AS t_num,
           CAST(r * (n - r) AS BIGINT) AS d1,
           CAST(n * ssn - sn * sn AS BIGINT) AS d2,
           CASE WHEN r * (n - r) = 0 OR n * ssn - sn * sn = 0 THEN NULL
                ELSE CAST(n * sr - r * sn AS DOUBLE)
                     / sqrt(CAST(r * (n - r) AS DOUBLE)
                            * CAST(n * ssn - sn * sn AS DOUBLE)
                            / CAST(n AS DOUBLE))
           END AS z_trend
    FROM agg
    """,
    doc="[EXT] Cochran-Armitage trend test: does return probability "
    "trend monotonically with ordered quantity dose (l_quantity decile "
    "buckets 0..4, scores = bucket index)? Scaled statistic "
    "T' = N*Sum(s_i r_i) - R*Sum(s_i n_i) and its variance "
    "Var(T') = R(N-R)*(N*Sum(n_i s_i^2) - (Sum n_i s_i)^2)/N are exact "
    "BIGINT compositions; Z = T'/sqrt(d1*d2/N) is one fixed IEEE tree "
    "(each operand exactly double-convertible at bench scale -- "
    "magnitudes < 2^53 documented in the builder). One scan, one 5-row "
    "aggregate; the dose-trend screen an observational pipeline runs "
    "before modeling.",
    tags=("stats",),
)
def stat_cochran_armitage_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Magnitude audit for the exact-double conversions (sf0.1: |lineitem|
    # ~ 6e5): t_num <= N*4*N ~ 1.4e12, d1 <= N^2/4 ~ 9e10,
    # d2 <= N*16*N ~ 5.8e12 -- all far below 2^53, so CAST(... AS DOUBLE)
    # is exact and the z tree is bit-identical across engines.
    li = load(spark, sf_dir, "lineitem").select("l_quantity", "l_returnflag")
    dose = li.select(
        F.least(
            F.lit(4), F.expr("(CAST(l_quantity AS BIGINT) - 1) div 10")
        ).alias("s"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("ret"),
    ).groupBy("s").agg(
        F.count(F.lit(1)).cast("long").alias("n_i"),
        F.sum("ret").cast("long").alias("r_i"),
    )
    return cochran_armitage_from_dose(dose)


def cochran_armitage_from_dose(dose: DataFrame) -> DataFrame:
    """CA trend statistic from a (s, n_i, r_i) dose table (template shared
    with the property gate — the EDF *_from_samples discipline)."""
    agg = dose.agg(
        F.sum("n_i").cast("long").alias("n"),
        F.sum("r_i").cast("long").alias("r"),
        F.sum(F.col("s") * F.col("r_i")).cast("long").alias("sr"),
        F.sum(F.col("s") * F.col("n_i")).cast("long").alias("sn"),
        F.sum(F.col("s") * F.col("s") * F.col("n_i")).cast("long").alias("ssn"),
        F.count(F.lit(1)).cast("long").alias("k_doses"),
    )
    t_num = F.col("n") * F.col("sr") - F.col("r") * F.col("sn")
    d1 = F.col("r") * (F.col("n") - F.col("r"))
    d2 = F.col("n") * F.col("ssn") - F.col("sn") * F.col("sn")
    return agg.select(
        F.col("n").alias("n_total"),
        F.col("r").alias("n_returns"),
        "k_doses",
        t_num.cast("long").alias("t_num"),
        d1.cast("long").alias("d1"),
        d2.cast("long").alias("d2"),
        F.when((d1 == 0) | (d2 == 0), F.lit(None).cast("double"))
        .otherwise(
            t_num.cast("double")
            / F.sqrt(d1.cast("double") * d2.cast("double") / F.col("n").cast("double"))
        )
        .alias("z_trend"),
    )


# ---------------------------------------------------------------------------
# Mantel-Haenszel stratified odds ratio + CMH statistic.
# ---------------------------------------------------------------------------


@QS.add(
    "stat_mantel_haenszel",
    """
    WITH cells AS (
      SELECT o.o_orderpriority AS stratum,
             CAST(SUM(CASE WHEN l.l_discount > 0.05
                            AND l.l_returnflag = 'R' THEN 1 ELSE 0 END)
                  AS BIGINT) AS a,
             CAST(SUM(CASE WHEN l.l_discount > 0.05
                            AND l.l_returnflag <> 'R' THEN 1 ELSE 0 END)
                  AS BIGINT) AS b,
             CAST(SUM(CASE WHEN l.l_discount <= 0.05
                            AND l.l_returnflag = 'R' THEN 1 ELSE 0 END)
                  AS BIGINT) AS c,
             CAST(SUM(CASE WHEN l.l_discount <= 0.05
                            AND l.l_returnflag <> 'R' THEN 1 ELSE 0 END)
                  AS BIGINT) AS d
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1
    ),
    terms AS (
      SELECT stratum, a, b, c, d, a + b + c + d AS n,
             CAST(a * d AS DOUBLE) / CAST(a + b + c + d AS DOUBLE) AS ad_n,
             CAST(b * c AS DOUBLE) / CAST(a + b + c + d AS DOUBLE) AS bc_n,
             CAST((a + b) * (a + c) AS DOUBLE)
               / CAST(a + b + c + d AS DOUBLE) AS e_a,
             (CAST((a + b) * (c + d) AS DOUBLE)
                / CAST((a + b + c + d) * (a + b + c + d - 1) AS DOUBLE))
             * (CAST((a + c) * (b + d) AS DOUBLE)
                / CAST(a + b + c + d AS DOUBLE)) AS v_a
      FROM cells
    ),
    folded AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k_strata,
             CAST(SUM(a) AS BIGINT) AS sum_a,
             list_reduce(list_prepend(0.0e0,
               list(ad_n ORDER BY stratum)), (x, y) -> x + y) AS sum_ad_n,
             list_reduce(list_prepend(0.0e0,
               list(bc_n ORDER BY stratum)), (x, y) -> x + y) AS sum_bc_n,
             list_reduce(list_prepend(0.0e0,
               list(e_a ORDER BY stratum)), (x, y) -> x + y) AS sum_e_a,
             list_reduce(list_prepend(0.0e0,
               list(v_a ORDER BY stratum)), (x, y) -> x + y) AS sum_v_a
      FROM terms
    )
    SELECT k_strata, sum_a, sum_ad_n, sum_bc_n, sum_e_a, sum_v_a,
           CASE WHEN sum_bc_n = 0e0 THEN NULL
                ELSE sum_ad_n / sum_bc_n END AS or_mh,
           CASE WHEN sum_v_a = 0e0 THEN NULL
                ELSE (CAST(sum_a AS DOUBLE) - sum_e_a)
                     * (CAST(sum_a AS DOUBLE) - sum_e_a) / sum_v_a
           END AS cmh_chi2
    FROM folded
    """,
    doc="[EXT] Mantel-Haenszel stratified 2x2 analysis: exposure = "
    "deep discount (l_discount > 0.05), outcome = returned, strata = "
    "order priority. OR_MH = Sum(a_i d_i/n_i)/Sum(b_i c_i/n_i) and the "
    "CMH chi-square (Sum a - Sum E)^2/Sum V, with E_i=(a+b)(a+c)/n and "
    "V_i restructured as ((a+b)(c+d)/(n(n-1)))*((a+c)(b+d)/n) so every "
    "operand is an exact-double BIGINT product (< 2^53; the naive "
    "4-factor numerator overflows BIGINT). Per-stratum terms are single "
    "divisions over exact counts; the cross-stratum sums are pinned-"
    "order folds keyed by stratum -- bit-identical both engines. The "
    "confounding-aware effect estimate next to stat_stratified_ate.",
    tags=("stats", "causal"),
)
def stat_mantel_haenszel(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_discount", "l_returnflag"
    )
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    exp = F.col("l_discount") > 0.05
    ret = F.col("l_returnflag") == "R"
    cells = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy(F.col("o_orderpriority").alias("stratum"))
        .agg(
            F.sum(F.when(exp & ret, 1).otherwise(0)).cast("long").alias("a"),
            F.sum(F.when(exp & ~ret, 1).otherwise(0)).cast("long").alias("b"),
            F.sum(F.when(~exp & ret, 1).otherwise(0)).cast("long").alias("c"),
            F.sum(F.when(~exp & ~ret, 1).otherwise(0)).cast("long").alias("d"),
        )
    )
    return mantel_haenszel_from_cells(cells)


def mantel_haenszel_from_cells(cells: DataFrame) -> DataFrame:
    """MH estimator from a (stratum, a, b, c, d) 2x2 table (template
    shared with the Simpson's-paradox property test)."""
    n = F.col("a") + F.col("b") + F.col("c") + F.col("d")
    terms = cells.select(
        "stratum",
        "a",
        (F.col("a") * F.col("d")).cast("double").alias("adx"),
        (F.col("b") * F.col("c")).cast("double").alias("bcx"),
        n.cast("double").alias("nd"),
        ((F.col("a") + F.col("b")) * (F.col("a") + F.col("c")))
        .cast("double")
        .alias("e_num"),
        ((F.col("a") + F.col("b")) * (F.col("c") + F.col("d")))
        .cast("double")
        .alias("v1"),
        (n * (n - 1)).cast("double").alias("v2"),
        ((F.col("a") + F.col("c")) * (F.col("b") + F.col("d")))
        .cast("double")
        .alias("v3"),
    ).select(
        "stratum",
        "a",
        (F.col("adx") / F.col("nd")).alias("ad_n"),
        (F.col("bcx") / F.col("nd")).alias("bc_n"),
        (F.col("e_num") / F.col("nd")).alias("e_a"),
        ((F.col("v1") / F.col("v2")) * (F.col("v3") / F.col("nd"))).alias("v_a"),
    )

    def fold(col: str) -> F.Column:
        return F.aggregate(
            F.sort_array(F.collect_list(F.struct("stratum", F.col(col).alias("t")))),
            F.lit(0.0),
            lambda acc, s: acc + s["t"],
        )

    folded = terms.agg(
        F.count(F.lit(1)).cast("long").alias("k_strata"),
        F.sum("a").cast("long").alias("sum_a"),
        fold("ad_n").alias("sum_ad_n"),
        fold("bc_n").alias("sum_bc_n"),
        fold("e_a").alias("sum_e_a"),
        fold("v_a").alias("sum_v_a"),
    )
    diff = F.col("sum_a").cast("double") - F.col("sum_e_a")
    return folded.select(
        "k_strata",
        "sum_a",
        "sum_ad_n",
        "sum_bc_n",
        "sum_e_a",
        "sum_v_a",
        F.when(F.col("sum_bc_n") == 0.0, F.lit(None).cast("double"))
        .otherwise(F.col("sum_ad_n") / F.col("sum_bc_n"))
        .alias("or_mh"),
        F.when(F.col("sum_v_a") == 0.0, F.lit(None).cast("double"))
        .otherwise(diff * diff / F.col("sum_v_a"))
        .alias("cmh_chi2"),
    )


# ---------------------------------------------------------------------------
# Seasonal Mann-Kendall (Hirsch-Slack) on the daily revenue series.
# ---------------------------------------------------------------------------


@QS.add(
    "stat_seasonal_mannkendall",
    f"""
    WITH daily AS (
      SELECT event_type, epoch_ms(ts) // {_DAY_MS} AS d,
             (epoch_ms(ts) // {_DAY_MS}) % 7 AS season,
             CAST(SUM({_CENTS}) AS BIGINT) AS s
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, d
    ),
    pairs AS (
      SELECT a.event_type,
             CASE WHEN b.s > a.s THEN 1 WHEN b.s < a.s THEN -1 ELSE 0 END AS sg
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND a.season = b.season AND a.d < b.d
    ),
    svar AS (
      SELECT event_type, season, CAST(COUNT(*) AS BIGINT) AS n
      FROM daily GROUP BY event_type, season
    ),
    ties AS (
      SELECT event_type, season, s, CAST(COUNT(*) AS BIGINT) AS t
      FROM daily GROUP BY event_type, season, s
      HAVING COUNT(*) > 1
    ),
    v18 AS (
      SELECT sv.event_type,
             CAST(SUM(sv.n * (sv.n - 1) * (2 * sv.n + 5)) AS BIGINT)
               - CAST(COALESCE((SELECT SUM(t.t * (t.t - 1) * (2 * t.t + 5))
                                FROM ties t
                                WHERE t.event_type = sv.event_type), 0)
                      AS BIGINT) AS var18
      FROM svar sv GROUP BY sv.event_type
    ),
    stat AS (
      SELECT event_type, CAST(SUM(sg) AS BIGINT) AS s_stat
      FROM pairs GROUP BY event_type
    ),
    nd AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days
      FROM daily GROUP BY event_type
    )
    SELECT nd.event_type, nd.n_days, stat.s_stat, v18.var18,
           CASE WHEN v18.var18 = 0 THEN NULL
                WHEN stat.s_stat > 0 THEN
                  CAST(stat.s_stat - 1 AS DOUBLE)
                  / sqrt(CAST(v18.var18 AS DOUBLE) / 18e0)
                WHEN stat.s_stat < 0 THEN
                  CAST(stat.s_stat + 1 AS DOUBLE)
                  / sqrt(CAST(v18.var18 AS DOUBLE) / 18e0)
                ELSE 0e0 END AS z_sk
    FROM nd JOIN stat ON nd.event_type = stat.event_type
    JOIN v18 ON nd.event_type = v18.event_type
    """,
    doc="[EXT] seasonal Mann-Kendall trend test (Hirsch-Slack): the "
    "pairwise sign statistic computed WITHIN each weekday season of the "
    "daily revenue series and summed -- the trend screen that is immune "
    "to weekly seasonality, which inflates the plain MK statistic with "
    "spurious cross-weekday comparisons. S and the tie-corrected "
    "variance (x18 to stay integer: Sum n(n-1)(2n+5) - Sum_ties "
    "t(t-1)(2t+5)) are exact BIGINTs; Z applies the continuity "
    "correction through one fixed tree (division after sqrt(var18/18), "
    "identical on both engines). Pairs are quadratic in DAYS-PER-SEASON "
    "(calendar-bounded, ~52 per weekday-year), never in events -- the "
    "same cost law as stat_mannkendall_trend.",
    tags=("stats", "timeseries"),
)
def stat_seasonal_mannkendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    daily = (
        ev.select(
            "event_type",
            F.expr(f"unix_millis(ts) div {_DAY_MS}").alias("d"),
            _cents().alias("cents"),
        )
        .groupBy("event_type", "d")
        .agg(F.sum("cents").cast("long").alias("s"))
        .withColumn("season", F.col("d") % 7)
    )
    return seasonal_mk_from_daily(daily)


def seasonal_mk_from_daily(daily: DataFrame) -> DataFrame:
    """Seasonal MK from a (event_type, d, season, s) daily table
    (template shared with the planted-seasonality property test)."""
    daily = daily.coalesce(8).persist()
    a = daily.select(
        "event_type", F.col("season").alias("se_a"), F.col("d").alias("da"),
        F.col("s").alias("sa"),
    )
    b = daily.select(
        F.col("event_type").alias("et_b"), F.col("season").alias("se_b"),
        F.col("d").alias("db"), F.col("s").alias("sb"),
    )
    pairs = a.join(
        b,
        (F.col("event_type") == F.col("et_b"))
        & (F.col("se_a") == F.col("se_b"))
        & (F.col("da") < F.col("db")),
    ).select(
        "event_type",
        F.when(F.col("sb") > F.col("sa"), 1)
        .when(F.col("sb") < F.col("sa"), -1)
        .otherwise(0)
        .alias("sg"),
    )
    stat = pairs.groupBy("event_type").agg(F.sum("sg").cast("long").alias("s_stat"))
    svar = daily.groupBy("event_type", "season").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    nvar = svar.groupBy("event_type").agg(
        F.sum(F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5))
        .cast("long")
        .alias("v_n")
    )
    ties = (
        daily.groupBy("event_type", "season", "s")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .filter(F.col("t") > 1)
        .groupBy("event_type")
        .agg(
            F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5))
            .cast("long")
            .alias("v_t")
        )
    )
    nd = daily.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    j = (
        nd.join(stat, "event_type")
        .join(nvar, "event_type")
        .join(ties, "event_type", "left")
        .select(
            "event_type",
            "n_days",
            "s_stat",
            (F.col("v_n") - F.coalesce(F.col("v_t"), F.lit(0)))
            .cast("long")
            .alias("var18"),
        )
    )
    sd = F.sqrt(F.col("var18").cast("double") / F.lit(18.0))
    return j.select(
        "event_type",
        "n_days",
        "s_stat",
        "var18",
        F.when(F.col("var18") == 0, F.lit(None).cast("double"))
        .when(F.col("s_stat") > 0, (F.col("s_stat") - 1).cast("double") / sd)
        .when(F.col("s_stat") < 0, (F.col("s_stat") + 1).cast("double") / sd)
        .otherwise(F.lit(0.0))
        .alias("z_sk"),
    )


# ---------------------------------------------------------------------------
# Cohen's d / Hedges' g effect sizes for every event-type pair.
# ---------------------------------------------------------------------------


@QS.add(
    "stat_cohens_d_pairs",
    f"""
    WITH grp AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM({_CENTS}) AS BIGINT) AS s,
             CAST(SUM({_CENTS} * {_CENTS}) AS BIGINT) AS q
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type
    )
    SELECT a.event_type AS ga, b.event_type AS gb,
           a.n AS n_a, b.n AS n_b, a.s AS s_a, b.s AS s_b,
           a.q AS q_a, b.q AS q_b,
           CASE WHEN a.n + b.n <= 2 THEN NULL ELSE
             (CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE)
              - CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE))
             / sqrt(((CAST(a.q AS DOUBLE)
                      - CAST(a.s AS DOUBLE) * CAST(a.s AS DOUBLE)
                        / CAST(a.n AS DOUBLE))
                    + (CAST(b.q AS DOUBLE)
                       - CAST(b.s AS DOUBLE) * CAST(b.s AS DOUBLE)
                         / CAST(b.n AS DOUBLE)))
                    / CAST(a.n + b.n - 2 AS DOUBLE))
           END AS cohens_d,
           CASE WHEN a.n + b.n <= 2 THEN NULL ELSE
             (1e0 - 3e0 / CAST(4 * (a.n + b.n - 2) - 1 AS DOUBLE))
             * ((CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE)
                 - CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE))
                / sqrt(((CAST(a.q AS DOUBLE)
                         - CAST(a.s AS DOUBLE) * CAST(a.s AS DOUBLE)
                           / CAST(a.n AS DOUBLE))
                       + (CAST(b.q AS DOUBLE)
                          - CAST(b.s AS DOUBLE) * CAST(b.s AS DOUBLE)
                            / CAST(b.n AS DOUBLE)))
                       / CAST(a.n + b.n - 2 AS DOUBLE)))
           END AS hedges_g
    FROM grp a JOIN grp b ON a.event_type < b.event_type
    """,
    doc="[EXT] Cohen's d and Hedges' g for every event-type pair over "
    "the cents-exact value distribution -- the practical-significance "
    "companion to stat_welch_pairs' p-values: d = (mean_a - mean_b) / "
    "pooled SD, g = J*d with the small-sample factor J = 1 - 3/(4*df-1) "
    "(a fixed rational tree, no gamma function). Every input is an "
    "exact BIGINT (n, sum, sum-of-squares per group; q <= ~6e15 at "
    "sf0.1, within exact-double range -- documented magnitude audit), "
    "the statistic is one fixed IEEE tree over their exact double "
    "conversions: divisions, one correctly-rounded sqrt, one multiply. "
    "Group stats aggregate map-side; the pair join runs over |types| "
    "rows, never events.",
    tags=("stats",),
)
def stat_cohens_d_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    grp = (
        ev.select("event_type", _cents().alias("cents"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("s"),
            F.sum(F.col("cents") * F.col("cents")).cast("long").alias("q"),
        )
        .coalesce(1)
        .persist()
    )
    a = grp.select(
        F.col("event_type").alias("ga"),
        F.col("n").alias("n_a"),
        F.col("s").alias("s_a"),
        F.col("q").alias("q_a"),
    )
    b = grp.select(
        F.col("event_type").alias("gb"),
        F.col("n").alias("n_b"),
        F.col("s").alias("s_b"),
        F.col("q").alias("q_b"),
    )
    pairs = a.join(b, F.col("ga") < F.col("gb"))
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    sa, sb = F.col("s_a").cast("double"), F.col("s_b").cast("double")
    qa, qb = F.col("q_a").cast("double"), F.col("q_b").cast("double")
    df_d = (F.col("n_a") + F.col("n_b") - 2).cast("double")
    mean_diff = sa / na - sb / nb
    pooled = F.sqrt(((qa - sa * sa / na) + (qb - sb * sb / nb)) / df_d)
    d = mean_diff / pooled
    j = F.lit(1.0) - F.lit(3.0) / (4 * (F.col("n_a") + F.col("n_b") - 2) - 1).cast(
        "double"
    )
    degenerate = (F.col("n_a") + F.col("n_b")) <= 2
    return pairs.select(
        "ga",
        "gb",
        "n_a",
        "n_b",
        "s_a",
        "s_b",
        "q_a",
        "q_b",
        F.when(degenerate, F.lit(None).cast("double")).otherwise(d).alias("cohens_d"),
        F.when(degenerate, F.lit(None).cast("double"))
        .otherwise(j * d)
        .alias("hedges_g"),
    )


# ---------------------------------------------------------------------------
# Jonckheere-Terpstra ordered-alternative trend across quantity doses.
# ---------------------------------------------------------------------------

_JT_PRICE_CENTS = "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"


def _jt_contrib_sql() -> str:
    """Per-value J2 contribution: sum over h of c_h*(2*sum_{g<h} cumb_g
    + sum_{g<h} c_g) -- expanded literally for the 5 fixed doses."""
    terms = []
    for h in range(1, 5):
        cumb = " + ".join(f"cb{g}" for g in range(h))
        cs = " + ".join(f"c{g}" for g in range(h))
        terms.append(f"c{h} * (2 * ({cumb}) + ({cs}))")
    return " + ".join(terms)


@QS.add(
    "stat_jonckheere_trend",
    f"""
    WITH rows_ AS (
      SELECT LEAST(4, (CAST(l_quantity AS BIGINT) - 1) // 10) AS g,
             {_JT_PRICE_CENTS} AS v
      FROM lineitem
    ),
    hist AS (
      SELECT v,
             {", ".join(f"CAST(SUM(CASE WHEN g = {g} THEN 1 ELSE 0 END) AS BIGINT) AS c{g}" for g in range(5))}
      FROM rows_ GROUP BY v
    ),
    walk AS (
      SELECT v, {", ".join(f"c{g}" for g in range(5))},
             {", ".join(
               f"CAST(COALESCE(SUM(c{g}) OVER (ORDER BY v ROWS BETWEEN "
               f"UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb{g}"
               for g in range(5))}
      FROM hist
    ),
    jstat AS (
      SELECT CAST(SUM({_jt_contrib_sql()}) AS BIGINT) AS j2 FROM walk
    ),
    grps AS (
      SELECT {", ".join(f"CAST(SUM(c{g}) AS BIGINT) AS n{g}" for g in range(5))}
      FROM hist
    ),
    scal AS (
      SELECT n0 + n1 + n2 + n3 + n4 AS n,
             {" + ".join(f"n{g} * n{g}" for g in range(5))} AS sn2,
             {" + ".join(f"n{g} * (n{g} - 1) * (2 * n{g} + 5)" for g in range(5))}
               AS ag,
             {" + ".join(f"n{g} * (n{g} - 1) * (n{g} - 2)" for g in range(5))}
               AS bg,
             {" + ".join(f"n{g} * (n{g} - 1)" for g in range(5))} AS cg
      FROM grps
    ),
    ties AS (
      SELECT CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS at_,
             CAST(SUM(t * (t - 1) * (t - 2)) AS BIGINT) AS bt,
             CAST(SUM(t * (t - 1)) AS BIGINT) AS ct
      FROM (SELECT c0 + c1 + c2 + c3 + c4 AS t FROM hist)
    )
    ,
    vcalc AS (
      SELECT j.j2, s.n, s.sn2,
             CAST(s.n * (s.n - 1) * (2 * s.n + 5) - s.ag - t.at_ AS BIGINT)
               AS a_comp,
             CAST(s.bg AS BIGINT) AS bg, t.bt,
             CAST(s.cg AS BIGINT) AS cg, t.ct,
             CAST(s.n * (s.n - 1) * (2 * s.n + 5) - s.ag - t.at_ AS DOUBLE)
               / 72e0
             + (CAST(s.bg AS DOUBLE) * CAST(t.bt AS DOUBLE))
               / (36e0 * CAST(s.n * (s.n - 1) * (s.n - 2) AS DOUBLE))
             + (CAST(s.cg AS DOUBLE) * CAST(t.ct AS DOUBLE))
               / (8e0 * CAST(s.n * (s.n - 1) AS DOUBLE)) AS var_jt
      FROM jstat j, scal s, ties t
    )
    SELECT n AS n_total, j2,
           CAST(n * n - sn2 AS BIGINT) AS mean4,
           a_comp, bg, bt, cg, ct,
           CASE WHEN var_jt > 0e0 THEN
             CAST(2 * j2 - (n * n - sn2) AS DOUBLE) / (4e0 * sqrt(var_jt))
           END AS z_jt
    FROM vcalc
    """,
    doc="[EXT] Jonckheere-Terpstra test for an ORDERED alternative "
    "(does extendedprice shift stochastically upward across quantity "
    "doses 0..4?) -- the trend-aware completion of stat_kruskal_wallis, "
    "strictly more powerful when the alternative is monotone. "
    "J2 = 2J = sum over dose pairs g<h of (2*#{{x_g<x_h}} + #{{ties}}), "
    "computed from ONE pivoted value histogram: per distinct price, "
    "each dose's strictly-below cumulative (shared global walk over "
    "the VALUE domain -- the Mann-Whitney cost law) and the in-block "
    "counts expand the pair sum literally over the 5 fixed doses. "
    "Mean4 = N^2 - sum n_g^2 and the full Lehmann tie-corrected "
    "variance components (A/72 + B/(36 N(N-1)(N-2)) + C/(8 N(N-1))) "
    "are exact BIGINTs (A <= 2N^3 ~ 4e17 at sf0.1, within int64); the "
    "B and C cross-products would overflow int64, so the z tree "
    "multiplies their correctly-rounded DOUBLE casts -- deterministic "
    "on both engines (bit-identical casts), the documented relaxation "
    "of the exact-double-convertibility bonus.",
    tags=("stats",),
    headline=True,
)
def stat_jonckheere_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_quantity", "l_extendedprice")
    rows_ = li.select(
        F.least(
            F.lit(4), F.expr("(CAST(l_quantity AS BIGINT) - 1) div 10")
        ).alias("g"),
        F.expr(_JT_PRICE_CENTS).alias("v"),
    )
    return jonckheere_from_rows(rows_)


def jonckheere_from_rows(rows_: DataFrame) -> DataFrame:
    """JT statistic from a (g in 0..4, v BIGINT) sample table (template
    shared with the planted-trend property test)."""
    from pyspark.sql.window import Window as W

    hist = rows_.groupBy("v").agg(
        *[
            F.sum(F.when(F.col("g") == g, 1).otherwise(0))
            .cast("long")
            .alias(f"c{g}")
            for g in range(5)
        ]
    )
    w_prev = W.orderBy("v").rowsBetween(W.unboundedPreceding, -1)
    walk = hist.select(
        "v",
        *[F.col(f"c{g}") for g in range(5)],
        *[
            F.coalesce(F.sum(f"c{g}").over(w_prev), F.lit(0))
            .cast("long")
            .alias(f"cb{g}")
            for g in range(5)
        ],
    )
    jstat = walk.agg(F.expr(f"CAST(SUM({_jt_contrib_sql()}) AS BIGINT)").alias("j2"))
    grps = hist.agg(
        *[F.sum(f"c{g}").cast("long").alias(f"n{g}") for g in range(5)]
    )
    scal = grps.selectExpr(
        "n0 + n1 + n2 + n3 + n4 AS n",
        " + ".join(f"n{g} * n{g}" for g in range(5)) + " AS sn2",
        " + ".join(f"n{g} * (n{g} - 1) * (2 * n{g} + 5)" for g in range(5))
        + " AS ag",
        " + ".join(f"n{g} * (n{g} - 1) * (n{g} - 2)" for g in range(5)) + " AS bg",
        " + ".join(f"n{g} * (n{g} - 1)" for g in range(5)) + " AS cg",
    )
    ties = hist.select(
        (sum(F.col(f"c{g}") for g in range(1, 5)) + F.col("c0")).alias("t")
    ).agg(
        F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5))
        .cast("long")
        .alias("at_"),
        F.sum(F.col("t") * (F.col("t") - 1) * (F.col("t") - 2))
        .cast("long")
        .alias("bt"),
        F.sum(F.col("t") * (F.col("t") - 1)).cast("long").alias("ct"),
    )
    j = jstat.crossJoin(F.broadcast(scal)).crossJoin(F.broadcast(ties))
    mean4 = F.col("n") * F.col("n") - F.col("sn2")
    a_comp = (
        F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
        - F.col("ag")
        - F.col("at_")
    )
    var = (
        a_comp.cast("double") / F.lit(72.0)
        + (F.col("bg").cast("double") * F.col("bt").cast("double"))
        / (
            F.lit(36.0)
            * (F.col("n") * (F.col("n") - 1) * (F.col("n") - 2)).cast("double")
        )
        + (F.col("cg").cast("double") * F.col("ct").cast("double"))
        / (F.lit(8.0) * (F.col("n") * (F.col("n") - 1)).cast("double"))
    )
    return j.select(
        F.col("n").alias("n_total"),
        "j2",
        mean4.cast("long").alias("mean4"),
        a_comp.cast("long").alias("a_comp"),
        F.col("bg").cast("long").alias("bg"),
        "bt",
        F.col("cg").cast("long").alias("cg"),
        "ct",
        F.when(
            var > 0.0,
            (2 * F.col("j2") - mean4).cast("double") / (F.lit(4.0) * F.sqrt(var)),
        ).alias("z_jt"),
    )


# ---------------------------------------------------------------------------
# Friedman test over complete weekly blocks (blocked analogue of KW).
# ---------------------------------------------------------------------------


#: Complete-weekly-block doubled midranks — shared by the Friedman and
#: Page trend tests (one CTE prefix, two finishes).
_BLOCK_CELLS_SQL = f"""daily AS (
      SELECT event_type, epoch_ms(ts) // {_DAY_MS} AS d,
             (epoch_ms(ts) // {_DAY_MS}) // 7 AS wk,
             (epoch_ms(ts) // {_DAY_MS}) % 7 AS dow,
             CAST(SUM({_CENTS}) AS BIGINT) AS s
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, d
    ),
    complete AS (
      SELECT event_type, wk FROM daily
      GROUP BY event_type, wk HAVING COUNT(*) = 7
    ),
    cells AS MATERIALIZED (
      SELECT d.event_type, d.wk, d.dow, d.s,
             CAST(2 * RANK() OVER (PARTITION BY d.event_type, d.wk
                                   ORDER BY d.s)
                  + COUNT(*) OVER (PARTITION BY d.event_type, d.wk, d.s)
                  - 1 AS BIGINT) AS r2
      FROM daily d JOIN complete c
        ON d.event_type = c.event_type AND d.wk = c.wk
    )"""


@QS.add(
    "stat_friedman_weekday",
    f"""
    WITH {_BLOCK_CELLS_SQL},
    cols AS (
      SELECT event_type, dow, CAST(SUM(r2) AS BIGINT) AS r2j
      FROM cells GROUP BY event_type, dow
    ),
    scal AS (
      SELECT event_type,
             CAST(COUNT(DISTINCT wk) AS BIGINT) AS m,
             CAST(SUM(r2 * r2) AS BIGINT) AS a4
      FROM cells GROUP BY event_type
    )
    SELECT s.event_type, s.m, CAST(7 AS BIGINT) AS n_treat,
           CAST(SUM((c.r2j - s.m * 8) * (c.r2j - s.m * 8)) AS BIGINT)
             AS num4,
           CAST(s.a4 - s.m * 7 * 64 AS BIGINT) AS den4,
           CASE WHEN s.a4 - s.m * 7 * 64 = 0 THEN NULL
                ELSE 6e0 * CAST(SUM((c.r2j - s.m * 8)
                                    * (c.r2j - s.m * 8)) AS DOUBLE)
                     / CAST(s.a4 - s.m * 7 * 64 AS DOUBLE)
           END AS friedman_t1
    FROM scal s JOIN cols c ON s.event_type = c.event_type
    GROUP BY s.event_type, s.m, s.a4
    """,
    doc="[EXT] Friedman test on complete weekly blocks: does weekday "
    "systematically shift daily revenue, with week-to-week level "
    "differences blocked out? Conover's tie-robust T1 form in DOUBLED "
    "midranks (2*rank + tiecount - 1 stays integer, the round-7 rule): "
    "T1 = (n-1) * Sum_j (R2_j - m(n+1))^2 / (Sum r2^2 - m n (n+1)^2) "
    "with n = 7 weekdays, so (n-1) folds into the literal 6e0 and the "
    "centering/denominator constants become m*8 and m*7*64 -- exact "
    "BIGINTs end to end, ONE division (NULL when every value in every "
    "block ties). Incomplete weeks are excluded (classic complete-"
    "block design); ranks come from (event_type, week)-PARTITIONED "
    "windows over the DAILY pre-aggregate -- calendar-bounded cost. "
    "Completes the rank-test ladder: KW (unblocked), JT (ordered), "
    "Friedman (blocked).",
    tags=("stats", "timeseries"),
)
def stat_friedman_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    cells = _weekday_block_cells(spark, sf_dir)
    cols = cells.groupBy("event_type", "dow").agg(
        F.sum("r2").cast("long").alias("r2j")
    )
    scal = cells.groupBy("event_type").agg(
        F.count_distinct("wk").cast("long").alias("m"),
        F.sum(F.col("r2") * F.col("r2")).cast("long").alias("a4"),
    )
    j = cols.join(F.broadcast(scal), "event_type")
    dev = F.col("r2j") - F.col("m") * 8
    agg = j.groupBy("event_type", "m", "a4").agg(
        F.sum(dev * dev).cast("long").alias("num4")
    )
    den4 = F.col("a4") - F.col("m") * 7 * 64
    return agg.select(
        "event_type",
        "m",
        F.lit(7).cast("long").alias("n_treat"),
        "num4",
        den4.cast("long").alias("den4"),
        F.when(den4 == 0, F.lit(None).cast("double"))
        .otherwise(
            F.lit(6.0) * F.col("num4").cast("double") / den4.cast("double")
        )
        .alias("friedman_t1"),
    )


def _weekday_block_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, wk, dow, r2): doubled within-block midranks over
    complete weekly blocks — shared by Friedman and Page."""
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    daily = (
        ev.select(
            "event_type",
            F.expr(f"unix_millis(ts) div {_DAY_MS}").alias("d"),
            _cents().alias("cents"),
        )
        .groupBy("event_type", "d")
        .agg(F.sum("cents").cast("long").alias("s"))
        .select(
            "event_type",
            F.expr("d div 7").cast("long").alias("wk"),
            (F.col("d") % 7).alias("dow"),
            "s",
        )
    )
    complete = (
        daily.groupBy("event_type", "wk")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") == 7)
        .select("event_type", "wk")
    )
    blocked = daily.join(complete, ["event_type", "wk"])
    w_rank = Window.partitionBy("event_type", "wk").orderBy("s")
    w_tie = Window.partitionBy("event_type", "wk", "s")
    return blocked.select(
        "event_type",
        "wk",
        "dow",
        (2 * F.rank().over(w_rank) + F.count(F.lit(1)).over(w_tie) - 1)
        .cast("long")
        .alias("r2"),
    ).coalesce(8).persist()


# ---------------------------------------------------------------------------
# Page's L trend test over the same weekly blocks (ordered weekdays).
# ---------------------------------------------------------------------------


@QS.add(
    "stat_page_trend_weekday",
    f"""
    WITH {_BLOCK_CELLS_SQL},
    cols AS (
      SELECT event_type, dow, CAST(SUM(r2) AS BIGINT) AS r2j
      FROM cells GROUP BY event_type, dow
    ),
    m_ AS (
      SELECT event_type, CAST(COUNT(DISTINCT wk) AS BIGINT) AS m
      FROM cells GROUP BY event_type
    )
    SELECT c.event_type, m_.m,
           CAST(SUM((c.dow + 1) * c.r2j) AS BIGINT) AS l2,
           CAST(224 * m_.m AS BIGINT) AS mean_l2,
           CAST(18816 * m_.m AS BIGINT) AS var144,
           CASE WHEN m_.m = 0 THEN NULL ELSE
             CAST(SUM((c.dow + 1) * c.r2j) - 224 * m_.m AS DOUBLE)
             / (2e0 * sqrt(CAST(18816 * m_.m AS DOUBLE) / 144e0))
           END AS z_page
    FROM cols c JOIN m_ ON c.event_type = m_.event_type
    GROUP BY c.event_type, m_.m
    """,
    doc="[EXT] Page's L trend test on the SAME complete weekly blocks "
    "as stat_friedman_weekday (one shared doubled-midrank CTE prefix, "
    "two finishes): does daily revenue shift monotonically ACROSS the "
    "week (dow order 1..7), which Friedman's omnibus statistic cannot "
    "distinguish from arbitrary weekday differences? L2 = 2L = "
    "Sum_j j * R2_j is an exact BIGINT (ties enter through the "
    "midranks); the null mean 2E[L] = m*n(n+1)^2/2 = 224m and the "
    "classic variance Var(L) = m*n^2(n+1)(n^2-1)/144 = 18816m/144 fold "
    "to literal constants at n = 7. z uses the standard untied "
    "variance (the textbook approximation -- components are exact, the "
    "normalizer is the classic one); one division after one sqrt.",
    tags=("stats", "timeseries"),
)
def stat_page_trend_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    cells = _weekday_block_cells(spark, sf_dir)
    cols = cells.groupBy("event_type", "dow").agg(
        F.sum("r2").cast("long").alias("r2j")
    )
    m_ = cells.groupBy("event_type").agg(
        F.count_distinct("wk").cast("long").alias("m")
    )
    j = cols.join(F.broadcast(m_), "event_type")
    agg = j.groupBy("event_type", "m").agg(
        F.sum((F.col("dow") + 1) * F.col("r2j")).cast("long").alias("l2")
    )
    mean_l2 = 224 * F.col("m")
    var144 = 18816 * F.col("m")
    return agg.select(
        "event_type",
        "m",
        "l2",
        mean_l2.cast("long").alias("mean_l2"),
        var144.cast("long").alias("var144"),
        F.when(F.col("m") == 0, F.lit(None).cast("double"))
        .otherwise(
            (F.col("l2") - mean_l2).cast("double")
            / (F.lit(2.0) * F.sqrt(var144.cast("double") / F.lit(144.0)))
        )
        .alias("z_page"),
    )
