"""Rank-sum and EDF statistics: Mann-Whitney, KS/CvM/AD/energy, Kendall/Mann-Kendall (plain + seasonal), runs test, Kruskal-Wallis, Jonckheere-Terpstra, Friedman, Page's L.

Mechanical split of the former 4,878-line plans/inference.py (VERDICT r08 task 8); zero behavior change."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clinical_api_etl_spark.functions.text import tokens
from clinical_api_etl_spark.plans.base import QuerySet
from clinical_api_etl_spark.sources.catalog import load

from ._shared import _CENTS, _DAY_MS, _DAY_MS_I, _EDF_SRC, _HOUR_MS, _TOKS, _cents  # noqa: F401

QS = QuerySet()


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
    """(event_type, wk, dow, s, r2): raw cell values plus doubled
    within-block midranks over complete weekly blocks — shared by
    Friedman, Page and Quade (Quade needs ``s`` for the block ranges)."""
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
        "s",
        (2 * F.rank().over(w_rank) + F.count(F.lit(1)).over(w_tie) - 1)
        .cast("long")
        .alias("r2"),
    ).coalesce(8).persist()


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


# ---------------------------------------------------------------------------
# Quade test over the same complete weekly blocks (range-weighted Friedman).
# ---------------------------------------------------------------------------


@QS.add(
    "stat_quade_weekday",
    f"""
    WITH {_BLOCK_CELLS_SQL},
    ranges AS (
      SELECT event_type, wk, CAST(MAX(s) - MIN(s) AS BIGINT) AS rng
      FROM cells GROUP BY event_type, wk
    ),
    q AS (
      SELECT event_type, wk,
             CAST(2 * RANK() OVER (PARTITION BY event_type ORDER BY rng)
                  + COUNT(*) OVER (PARTITION BY event_type, rng)
                  - 1 AS BIGINT) AS q2
      FROM ranges
    ),
    u AS (
      SELECT c.event_type, c.dow, q.q2 * (c.r2 - 8) AS u
      FROM cells c JOIN q ON c.event_type = q.event_type AND c.wk = q.wk
    ),
    a AS (
      SELECT event_type, CAST(COUNT(*) // 7 AS BIGINT) AS b,
             CAST(SUM(u * u) AS BIGINT) AS a16
      FROM u GROUP BY event_type
    ),
    cols AS (
      SELECT event_type, dow, CAST(SUM(u) AS BIGINT) AS sj
      FROM u GROUP BY event_type, dow
    ),
    bs AS (
      SELECT event_type, CAST(SUM(sj * sj) AS BIGINT) AS b16b
      FROM cols GROUP BY event_type
    )
    SELECT a.event_type, a.b, a.a16, bs.b16b,
           CASE WHEN a.b * a.a16 - bs.b16b = 0 THEN NULL
                ELSE CAST((a.b - 1) * bs.b16b AS DOUBLE)
                     / CAST(a.b * a.a16 - bs.b16b AS DOUBLE)
           END AS quade_t3
    FROM a JOIN bs USING (event_type)
    """,
    doc="[EXT] Quade test per event type over the SAME complete weekly "
    "blocks as Friedman — the range-weighted blocked rank test: blocks "
    "with a larger within-block spread (daily-revenue range) carry more "
    "weight, so it beats Friedman exactly when treatment effects scale "
    "with block variability. All components in doubled-rank units: "
    "S_ij = Q_i(R_ij - 4) becomes U = q2*(r2 - 8) = 4*S_ij (q2/r2 are "
    "doubled midranks — ties stay exact), A' = SUM(U^2) = 16A and "
    "B' = SUM_j(SUM_i U)^2 = 16bB, so Conover's "
    "T3 = (b-1)B/(A-B) = (b-1)*B' / (b*A' - B') — ONE division of exact "
    "BIGINTs. Degenerate all-tied blocks give U = 0 (midrank 8 "
    "everywhere) -> 0/0 -> NULL via lazy CASE on both engines (the "
    "ANSI-divide rule). Cost: the Friedman histogram walk + one "
    "per-block range aggregate — bounded by the (type, week) domain, "
    "never |events|.",
    tags=("stats",),
)
def stat_quade_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    cells = _weekday_block_cells(spark, sf_dir)
    ranges = cells.groupBy("event_type", "wk").agg(
        (F.max("s") - F.min("s")).cast("long").alias("rng")
    )
    w_rank = Window.partitionBy("event_type").orderBy("rng")
    w_tie = Window.partitionBy("event_type", "rng")
    q = ranges.select(
        "event_type",
        "wk",
        (2 * F.rank().over(w_rank) + F.count(F.lit(1)).over(w_tie) - 1)
        .cast("long")
        .alias("q2"),
    )
    u = cells.join(q, ["event_type", "wk"]).select(
        "event_type", "dow", (F.col("q2") * (F.col("r2") - 8)).alias("u")
    )
    a = u.groupBy("event_type").agg(
        F.expr("CAST(COUNT(*) div 7 AS BIGINT)").alias("b"),
        F.sum(F.col("u") * F.col("u")).cast("long").alias("a16"),
    )
    cols = u.groupBy("event_type", "dow").agg(
        F.sum("u").cast("long").alias("sj")
    )
    bs = cols.groupBy("event_type").agg(
        F.sum(F.col("sj") * F.col("sj")).cast("long").alias("b16b")
    )
    return a.join(bs, "event_type").select(
        "event_type",
        "b",
        "a16",
        "b16b",
        F.when(
            F.col("b") * F.col("a16") - F.col("b16b") == 0, F.lit(None)
        )
        .otherwise(
            ((F.col("b") - 1) * F.col("b16b")).cast("double")
            / (F.col("b") * F.col("a16") - F.col("b16b")).cast("double")
        )
        .alias("quade_t3"),
    )


# ---------------------------------------------------------------------------
# Mood's median test (k-group location test on the grand-median split).
# ---------------------------------------------------------------------------


def _mood_oracle(src: str) -> str:
    """DuckDB Mood's-median SQL over any (g: VARCHAR, x: BIGINT) sample
    source — shared by the registry oracle and the degenerate-input gate."""
    return f"""
    WITH t AS ({src}),
    h AS (
      SELECT g AS event_type, x AS v, CAST(COUNT(*) AS BIGINT) AS c
      FROM t GROUP BY g, x
    ),
    pooled AS (SELECT v, CAST(SUM(c) AS BIGINT) AS c FROM h GROUP BY v),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM pooled),
    walk AS (
      SELECT v, CAST(SUM(c) OVER (ORDER BY v) AS BIGINT) AS cum FROM pooled
    ),
    med AS (
      SELECT CAST(MIN(v) AS BIGINT) AS m
      FROM walk CROSS JOIN tot WHERE cum * 2 >= n
    ),
    cells AS (
      SELECT h.event_type,
             CAST(SUM(CASE WHEN h.v > med.m THEN h.c ELSE 0 END) AS BIGINT)
               AS above,
             CAST(SUM(h.c) AS BIGINT) AS n_g
      FROM h CROSS JOIN med GROUP BY h.event_type
    ),
    marg AS (
      SELECT CAST(SUM(above) AS BIGINT) AS tot_above,
             CAST(SUM(n_g) AS BIGINT) AS n
      FROM cells
    ),
    oc AS (
      SELECT c.event_type, j.side,
             CAST(CASE WHEN j.side = 'a' THEN c.above
                       ELSE c.n_g - c.above END AS BIGINT) AS o,
             CAST(CASE WHEN j.side = 'a' THEN m.tot_above
                       ELSE m.n - m.tot_above END AS BIGINT) AS cj,
             m.n, c.n_g
      FROM cells c CROSS JOIN marg m
      CROSS JOIN (SELECT 'a' AS side UNION ALL SELECT 'b' AS side) j
    ),
    terms AS (
      SELECT event_type, side,
             CASE WHEN cj > 0 THEN
               CAST(o * n - n_g * cj AS DOUBLE)
                 * CAST(o * n - n_g * cj AS DOUBLE)
                 / CAST(n AS DOUBLE) / CAST(n_g AS DOUBLE)
                 / CAST(cj AS DOUBLE)
             ELSE NULL END AS t
      FROM oc
    ),
    folded AS (
      SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(t ORDER BY event_type, side)), (x, y) -> x + y) AS chi2
      FROM terms
    )
    SELECT med.m AS grand_median_cents, marg.n, marg.tot_above, folded.chi2
    FROM med CROSS JOIN marg CROSS JOIN folded
    """


@QS.add(
    "stat_mood_median",
    _mood_oracle(_EDF_SRC),
    doc="[EXT] Mood's median test across ALL event types at once: split "
    "every value at the pooled grand median (the lower order statistic "
    "— smallest v with 2*cum >= N off the VALUE-HISTOGRAM walk, exact "
    "cents), count above/not-above per group, and form the 2xk "
    "chi-square in the multiplied-through form "
    "(O*N - n_g*c_j)^2 / (N*n_g*c_j): the inner difference is an exact "
    "BIGINT, its square and the three chained divisions are a fixed "
    "IEEE tree, and the 2k cell terms sum via a pinned-order fold — "
    "fully hash-gated. The k-group companion to the runs/median "
    "family: robust to outliers where ANOVA is not, cruder than "
    "Kruskal-Wallis but defined under heavy ties (ties-below "
    "convention documented in the split predicate). Degenerate margins "
    "(tot_above = 0 when the max value carries >= half the mass, or its "
    "complement) emit chi2 = NULL via a lazy CASE on both engines — "
    "never NaN (ADVICE r09).",
    tags=("stats",),
)
def stat_mood_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    t = ev.select(F.col("event_type").alias("g"), _cents().alias("x"))
    return mood_from_samples(t)


def mood_from_samples(t: DataFrame) -> DataFrame:
    """Mood's median test over any (g: string, x: long) sample frame
    (shared by the registry query and the degenerate-input gate)."""
    h = t.select(F.col("g").alias("event_type"), F.col("x").alias("v")).groupBy(
        "event_type", "v"
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    h = h.coalesce(8).persist()
    pooled = h.groupBy("v").agg(F.sum("c").cast("long").alias("c"))
    tot = pooled.agg(F.sum("c").cast("long").alias("n"))
    w_cum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    walk = pooled.select("v", F.sum("c").over(w_cum).cast("long").alias("cum"))
    med = (
        walk.crossJoin(F.broadcast(tot))
        .filter(F.col("cum") * 2 >= F.col("n"))
        .agg(F.min("v").cast("long").alias("m"))
    )
    cells = (
        h.crossJoin(F.broadcast(med))
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("v") > F.col("m"), F.col("c")).otherwise(0))
            .cast("long")
            .alias("above"),
            F.sum("c").cast("long").alias("n_g"),
        )
    )
    marg = cells.agg(
        F.sum("above").cast("long").alias("tot_above"),
        F.sum("n_g").cast("long").alias("n"),
    )
    sides = t.sparkSession.createDataFrame([("a",), ("b",)], "side string")
    oc = (
        cells.crossJoin(F.broadcast(marg))
        .crossJoin(F.broadcast(sides))
        .select(
            "event_type",
            "side",
            F.when(F.col("side") == "a", F.col("above"))
            .otherwise(F.col("n_g") - F.col("above"))
            .alias("o"),
            F.when(F.col("side") == "a", F.col("tot_above"))
            .otherwise(F.col("n") - F.col("tot_above"))
            .alias("cj"),
            "n",
            "n_g",
        )
    )
    terms = oc.select(
        "event_type",
        "side",
        # cj == 0 (tot_above == 0 under heavy top-ties, or its complement)
        # makes the term 0.0/0.0 = NaN on both engines; the discipline is
        # NULL, never NaN (CASE is lazy both sides — KW/Quade/JT rule). A
        # NULL term propagates through the pinned fold, so the degenerate
        # statistic reads as chi2 = NULL on Spark, DuckDB and python alike.
        F.expr(
            "CASE WHEN cj > 0 THEN"
            " CAST(o * n - n_g * cj AS DOUBLE)"
            " * CAST(o * n - n_g * cj AS DOUBLE)"
            " / CAST(n AS DOUBLE) / CAST(n_g AS DOUBLE)"
            " / CAST(cj AS DOUBLE)"
            " ELSE NULL END"
        ).alias("t"),
    )
    folded = terms.agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("event_type", "side", "t"))),
            F.lit(0.0),
            lambda acc, x: acc + x["t"],
        ).alias("chi2")
    )
    return (
        med.crossJoin(F.broadcast(marg))
        .crossJoin(F.broadcast(folded))
        .select(
            F.col("m").alias("grand_median_cents"),
            "n",
            "tot_above",
            "chi2",
        )
    )
