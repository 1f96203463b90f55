"""Round-11+ modeling family, time-series/misc slice: Holt-Winters, Wilder RSI, deterministic bootstrap CI, DQ uniqueness profile, Bollinger breaches, hash reservoir sample, CDC last-writer-wins.

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


