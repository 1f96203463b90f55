"""Event-analytics query family. [EXT]

Product-analytics shapes every events-style deployment of the reference
would ask next (the reference's query surface stops at filtered slices —
``database.service.ts:94-150``): ordered funnels, cohort retention, native
session windows, hopping windows, and gap-filled (densified) time series,
plus a VARIANT-typed semi-structured path and a table-profiling operator.

All are pure DataFrame compositions — no UDFs, no driver-side loops — and
each carries a DuckDB oracle. Scale posture per query in its docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clinical_api_etl_spark.plans.base import DSUM, QuerySet
from clinical_api_etl_spark.sources.catalog import load
from clinical_api_etl_spark.functions.numeric import dsum

QS = QuerySet()


# ---------------------------------------------------------------------------
# Ordered funnel: view -> click -> purchase, strictly increasing timestamps.
# ---------------------------------------------------------------------------


@QS.add(
    "funnel_view_click_purchase",
    """
    WITH v AS (
        SELECT user_id, MIN(ts) AS vt FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, MIN(e.ts) AS ct
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.vt
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, MIN(e.ts) AS pt
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.ct
        GROUP BY e.user_id
    )
    SELECT stage, users FROM (
        SELECT 'view' AS stage, COUNT(*) AS users FROM v
        UNION ALL SELECT 'view>click', COUNT(*) FROM c
        UNION ALL SELECT 'view>click>purchase', COUNT(*) FROM p
    )
    """,
    doc="Ordered conversion funnel: earliest view, then earliest click "
    "strictly after it, then earliest purchase strictly after that; one "
    "user count per stage. Each stage is a per-user min-aggregate (one "
    "shuffle on user_id) joined to the previous stage on user_id — AQE "
    "picks broadcast once a stage's survivor set shrinks below threshold. "
    "No window over raw events, so no per-user sort of the full stream.",
    headline=True,
    tags=("analytics", "funnel"),
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("vt"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("vt"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("ct"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("ct"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("pt"))
    )

    def stage(df: DataFrame, label: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("users")).select(
            F.lit(label).alias("stage"), "users"
        )

    return (
        stage(v, "view")
        .unionAll(stage(c, "view>click"))
        .unionAll(stage(p, "view>click>purchase"))
    )


# ---------------------------------------------------------------------------
# Cohort retention: users grouped by first-seen week, counted per week offset.
# ---------------------------------------------------------------------------


@QS.add(
    "cohort_weekly_retention",
    """
    WITH f AS (
        SELECT user_id, date_trunc('week', MIN(ts)) AS cw
        FROM events GROUP BY user_id
    )
    SELECT
        f.cw AS cohort_week,
        CAST(date_diff('day', f.cw, date_trunc('week', e.ts)) / 7 AS BIGINT)
            AS week_offset,
        COUNT(DISTINCT e.user_id) AS users
    FROM events e JOIN f ON e.user_id = f.user_id
    GROUP BY 1, 2
    """,
    doc="Weekly cohort retention: cohort = ISO week of a user's first "
    "event; one row per (cohort_week, week_offset) with distinct users "
    "still active. Two shuffles (first-event agg on user_id, final agg on "
    "cohort key); the events⋈first-seen join is on user_id, co-partitioned "
    "with the agg that produced f, so AQE reuses the exchange. Week "
    "offsets are exact day-diffs/7 of Monday-truncated dates — identical "
    "in Spark and DuckDB (no engine-specific week-diff semantics).",
    headline=True,
    tags=("analytics", "cohort"),
)
def cohort_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("user_id", "ts")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cw")
    )
    return (
        ev.join(first, "user_id")
        .select(
            F.col("cw").alias("cohort_week"),
            (F.datediff(F.date_trunc("week", F.col("ts")), F.col("cw")) / 7)
            .cast("long")
            .alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("users"))
    )


# ---------------------------------------------------------------------------
# Native session windows (F.session_window) — the built-in twin of w5.
# ---------------------------------------------------------------------------


@QS.add(
    "w8_session_window_native",
    """
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                            >= 21600000000
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT user_id, ts,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 6 HOUR AS session_end,
           COUNT(*) AS n_events
    FROM sessions GROUP BY user_id, sid
    """,
    doc="Gap-based sessions via Spark's native session_window aggregation "
    "(the same expression runs under readStream with a watermark — "
    "merging session state is handled by the engine, not a custom "
    "stateful UDF). Semantics: events merge while the gap is < 6h; the "
    "window end is last event + gap. The oracle replays that exactly with "
    "a lag/cumsum rewrite (new session when diff >= gap — note >=, not >, "
    "matching session_window's half-open [ts, ts+gap) windows). One "
    "shuffle on user_id.",
    headline=True,
    tags=("analytics", "window", "session"),
)
def w8_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("user_id", "ts")
    return (
        ev.groupBy(F.session_window("ts", "6 hours"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


# ---------------------------------------------------------------------------
# Hopping (sliding) windows: 4h windows advancing every hour.
# ---------------------------------------------------------------------------


@QS.add(
    "w9_hopping_window_rates",
    f"""
    SELECT
        date_trunc('hour', ts) - k.k * INTERVAL 1 HOUR AS window_start,
        event_type,
        COUNT(*) AS cnt,
        {DSUM('value', 'total_value')}
    FROM events
    CROSS JOIN (VALUES (0), (1), (2), (3)) AS k(k)
    GROUP BY 1, 2
    """,
    doc="Hopping event-time windows (4h long, 1h slide) per event type — "
    "the smoothed-rate shape behind alerting dashboards. Spark's "
    "window(ts, '4 hours', '1 hour') expands each row into its 4 "
    "containing windows inside the aggregate's Expand node (no join); the "
    "oracle mirrors with an explicit 4-row cross join. Map-side partial "
    "aggregation tames the 4x expansion before the single shuffle; the "
    "same expression streams under a watermark.",
    headline=True,
    tags=("analytics", "window", "hopping"),
)
def w9_hopping_window_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("ts", "event_type", "value")
    return (
        ev.groupBy(F.window("ts", "4 hours", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), dsum("value", "total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "cnt",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# Gap-filled (densified) hourly series — zero rows for silent hours.
# ---------------------------------------------------------------------------


@QS.add(
    "w10_gapfill_hourly_series",
    """
    WITH b AS (
        SELECT date_trunc('hour', MIN(ts)) AS lo,
               date_trunc('hour', MAX(ts)) AS hi
        FROM events
    ),
    h AS (
        SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour_start
        FROM b
    ),
    t AS (SELECT DISTINCT event_type FROM events),
    c AS (
        SELECT date_trunc('hour', ts) AS hs, event_type, COUNT(*) AS n
        FROM events GROUP BY 1, 2
    )
    SELECT h.hour_start, t.event_type, COALESCE(c.n, 0) AS cnt
    FROM h CROSS JOIN t
    LEFT JOIN c ON c.hs = h.hour_start AND c.event_type = t.event_type
    """,
    doc="Dense hourly series per event type: every hour between the "
    "corpus min/max appears, zero-filled when silent — the densification "
    "step time-series models need before lag features. The hour spine is "
    "sequence() over a 1-row global bound (broadcast nested-loop against "
    "5 distinct types — trivially small build side by construction: "
    "#hours x #types, data-size independent); observed counts then LEFT "
    "join the spine on (hour, type). Three small shuffles; the spine "
    "never touches the fact table's row count.",
    headline=True,
    tags=("analytics", "timeseries", "gapfill"),
)
def w10_gapfill_hourly_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("ts", "event_type")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias(
            "hour_start"
        )
    )
    types = ev.select(F.col("event_type").alias("etype")).distinct()
    counts = ev.groupBy(
        F.date_trunc("hour", "ts").alias("hs"),
        F.col("event_type").alias("cet"),
    ).agg(F.count(F.lit(1)).alias("n"))
    return (
        hours.crossJoin(types)
        .join(
            counts,
            (F.col("hs") == F.col("hour_start")) & (F.col("cet") == F.col("etype")),
            "left",
        )
        .select(
            "hour_start",
            F.col("etype").alias("event_type"),
            F.coalesce("n", F.lit(0)).alias("cnt"),
        )
    )


# ---------------------------------------------------------------------------
# Per-entity resample + forward fill (LOCF).
# ---------------------------------------------------------------------------


@QS.add(
    "w11_locf_hourly_state",
    """
    WITH hourly AS (
        SELECT user_id, hour_start, value AS hv FROM (
            SELECT user_id, date_trunc('hour', ts) AS hour_start, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1
    ),
    bounds AS (
        SELECT user_id, MIN(hour_start) AS lo, MAX(hour_start) AS hi
        FROM hourly GROUP BY user_id
    ),
    spine AS (
        SELECT user_id,
               UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour_start
        FROM bounds
    )
    SELECT s.user_id, s.hour_start,
           last_value(h.hv IGNORE NULLS) OVER (
               PARTITION BY s.user_id ORDER BY s.hour_start
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS value_locf
    FROM spine s
    LEFT JOIN hourly h
      ON h.user_id = s.user_id AND h.hour_start = s.hour_start
    """,
    doc="Resample-and-forward-fill (LOCF): each user's event stream becomes "
    "a dense hourly state series — the latest observed value in an hour, "
    "carried forward through silent hours — the feature-engineering step "
    "before any time-series model. Last-per-hour is a row_number window "
    "(unique (ts, event_id) tie-break, engine-portable); the per-user "
    "spine is sequence()+explode between that user's own bounds (output "
    "grows with user-hours, not corpus rows); the fill is last(..., "
    "ignorenulls) over the hour order — one window, no self-join chain. "
    "Values are copied doubles, never aggregated, so no fp discipline "
    "needed. Shuffles: by (user,hour) for last-per-hour, by user for "
    "bounds + fill — all on the natural keys.",
    headline=True,
    tags=("analytics", "timeseries", "locf"),
)
def w11_locf_hourly_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    rn = F.row_number().over(
        W.partitionBy("user_id", F.date_trunc("hour", "ts")).orderBy(
            F.desc("ts"), F.desc("event_id")
        )
    )
    hourly = (
        ev.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.date_trunc("hour", "ts").alias("hour_start"),
            F.col("value").alias("hv"),
        )
    )
    spine = (
        hourly.groupBy("user_id")
        .agg(F.min("hour_start").alias("lo"), F.max("hour_start").alias("hi"))
        .select(
            "user_id",
            F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias(
                "hour_start"
            ),
        )
    )
    fill = W.partitionBy("user_id").orderBy("hour_start").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return (
        spine.join(hourly, ["user_id", "hour_start"], "left")
        .select(
            "user_id",
            "hour_start",
            F.last("hv", ignorenulls=True).over(fill).alias("value_locf"),
        )
    )


# ---------------------------------------------------------------------------
# VARIANT semi-structured path (Spark 4 VariantType over the props JSON).
# ---------------------------------------------------------------------------


@QS.add(
    "v1_variant_props_stats",
    """
    SELECT event_type,
           COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_k,
           MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
           SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS sum_k
    FROM events GROUP BY event_type
    """,
    doc="Semi-structured props via Spark 4's VARIANT type: parse_json once "
    "per row, variant_get typed extraction, then plain integer aggregates "
    "(exact — no float discipline needed). VARIANT's binary encoding "
    "makes repeated path extraction O(paths) per row without re-parsing "
    "text, the right posture when props widens to hundreds of keys; the "
    "oracle uses DuckDB's JSON extraction over the same strings.",
    headline=True,
    tags=("analytics", "variant", "json"),
)
def v1_variant_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("event_type", "props")
    k = F.expr("variant_get(parse_json(props), '$.k', 'bigint')")
    return ev.select("event_type", k.alias("k")).groupBy("event_type").agg(
        F.count("k").alias("n_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.sum("k").alias("sum_k"),
    )


# ---------------------------------------------------------------------------
# Event-sequence transition matrix (first-order Markov).
# ---------------------------------------------------------------------------


@QS.add(
    "seq_transition_matrix",
    """
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev
        FROM events
    )
    SELECT prev, event_type AS next, COUNT(*) AS cnt,
           CAST(COUNT(*) AS DOUBLE)
             / CAST(SUM(COUNT(*)) OVER (PARTITION BY prev) AS DOUBLE) AS p
    FROM seq WHERE prev IS NOT NULL
    GROUP BY prev, event_type
    """,
    doc="First-order Markov transition matrix over per-user event "
    "sequences: lag window pairs each event with its predecessor "
    "(deterministic (ts, event_id) order), grouped counts, and row-"
    "normalized probabilities via a window over the aggregate. One "
    "shuffle on user_id for the lag, one on the transition key; the "
    "probability is a single integer/integer division — identical in "
    "both engines. The behavioral-model shape behind next-event "
    "prediction baselines and anomaly scoring.",
    headline=True,
    tags=("analytics", "sequence", "markov"),
)
def seq_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("prev", F.lag("event_type").over(w)).filter(
        F.col("prev").isNotNull()
    )
    counts = seq.groupBy("prev", F.col("event_type").alias("next")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wp = W.partitionBy("prev")
    return counts.select(
        "prev",
        "next",
        "cnt",
        (F.col("cnt").cast("double") / F.sum("cnt").over(wp).cast("double")).alias(
            "p"
        ),
    )


# ---------------------------------------------------------------------------
# Z-score outliers in exact integer arithmetic.
# ---------------------------------------------------------------------------


@QS.add(
    "anomaly_zscore_outliers",
    """
    WITH c AS (
        SELECT event_type, CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS xc
        FROM events
    ),
    s AS (
        SELECT event_type, COUNT(*) AS n, SUM(xc) AS s1, SUM(xc * xc) AS s2
        FROM c GROUP BY event_type
    )
    SELECT c.event_type,
           COUNT(*) AS n_outliers,
           CAST(MIN(c.xc) AS DOUBLE) / 100.0 AS min_outlier,
           CAST(MAX(c.xc) AS DOUBLE) / 100.0 AS max_outlier
    FROM c JOIN s ON c.event_type = s.event_type
    WHERE (s.n * c.xc - s.s1) * (s.n * c.xc - s.s1)
          > 4 * (s.n * s.s2 - s.s1 * s.s1)
    GROUP BY c.event_type
    """,
    doc="Per-group z-score anomaly flags (|x − μ| > 2σ) computed ENTIRELY "
    "in exact integer arithmetic: on 2-decimal values, (n·x − Σx)² > "
    "4·(n·Σx² − (Σx)²) over integer cents is algebraically |x−μ| > 2σ "
    "with zero floating point — engine-portable where a naive "
    "stddev-based filter would diverge between engines at the boundary. "
    "Two passes over events (moments, then flags) joined on the group "
    "key; the moments side is group-cardinality rows, always broadcast. "
    "At larger magnitudes the same identity runs in DECIMAL(38,0).",
    headline=True,
    tags=("analytics", "anomaly"),
)
def anomaly_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("event_type", "value")
    c = ev.select(
        "event_type",
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("xc"),
    )
    s = c.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xc").alias("s1"),
        F.sum(F.col("xc") * F.col("xc")).alias("s2"),
    )
    dev = F.col("n") * F.col("xc") - F.col("s1")
    return (
        c.join(F.broadcast(s), "event_type")
        .filter(dev * dev > 4 * (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_outliers"),
            (F.min("xc").cast("double") / 100.0).alias("min_outlier"),
            (F.max("xc").cast("double") / 100.0).alias("max_outlier"),
        )
    )


# ---------------------------------------------------------------------------
# Rolling 7-day distinct users (sliding COUNT DISTINCT via contribution
# explode — window functions cannot express DISTINCT over a moving frame).
# ---------------------------------------------------------------------------


@QS.add(
    "w12_rolling_7d_distinct_users",
    """
    WITH du AS (
        SELECT DISTINCT date_trunc('day', ts) AS d, user_id FROM events
    ),
    contrib AS (
        SELECT du.d + k.k * INTERVAL 1 DAY AS window_day, du.user_id
        FROM du CROSS JOIN (VALUES (0),(1),(2),(3),(4),(5),(6)) AS k(k)
    ),
    days AS (SELECT DISTINCT date_trunc('day', ts) AS window_day FROM events)
    SELECT c.window_day, COUNT(DISTINCT c.user_id) AS users_7d
    FROM contrib c JOIN days USING (window_day)
    GROUP BY c.window_day
    """,
    doc="Trailing-7-day distinct active users per day — the DAU/WAU shape. "
    "A moving-frame COUNT(DISTINCT) is inexpressible as a window "
    "function; the scalable rewrite explodes each (user, active-day) "
    "pair into the 7 window-days it contributes to, then a plain "
    "distinct-count per window-day. Cost is 7x the DEDUPLICATED "
    "(user, day) pairs — bounded by users x days, independent of raw "
    "event volume; both shuffles are on the natural keys. Days with no "
    "events in the trailing week (none in this corpus) are simply absent; "
    "the spine join keeps only observed days, matching the oracle.",
    headline=True,
    tags=("analytics", "window", "distinct"),
)
def w12_rolling_7d_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").alias("d"), "user_id"
    )
    du = ev.distinct()
    contrib = du.select(
        F.explode(
            F.array(*[F.col("d") + F.expr(f"INTERVAL {k} DAYS") for k in range(7)])
        ).alias("window_day"),
        "user_id",
    )
    days = ev.select(F.col("d").alias("window_day")).distinct()
    return (
        contrib.join(days, "window_day")
        .groupBy("window_day")
        .agg(F.countDistinct("user_id").alias("users_7d"))
    )


# ---------------------------------------------------------------------------
# Histogram / binning over a measure column.
# ---------------------------------------------------------------------------


@QS.add(
    "hist_event_value",
    """
    SELECT
        CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) // 200 AS bucket,
        CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) // 200 * 2
             AS DOUBLE) AS bucket_lo,
        COUNT(*) AS cnt
    FROM events
    WHERE value >= 0
    GROUP BY 1, 2
    """,
    doc="Equi-width histogram of events.value (bucket width 2.0): the "
    "binning runs on exact integer cents (DECIMAL(18,2) x 100 -> BIGINT "
    "floor-div), so bucket edges are engine-portable — a double "
    "floor(value/width) would disagree between engines exactly at the "
    "edges fp can't represent. One scan, one shuffle on the bucket key; "
    "this is the width_bucket shape with the edge arithmetic made exact.",
    headline=True,
    tags=("analytics", "histogram"),
)
def hist_event_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("value")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    bucket = F.floor(cents / 200)
    return (
        ev.filter(F.col("value") >= 0)
        .select(
            bucket.alias("bucket"),
            (bucket * 2).cast("double").alias("bucket_lo"),
        )
        .groupBy("bucket", "bucket_lo")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# ---------------------------------------------------------------------------
# ORC source interop (write parquet-sourced dims to ORC, query them back).
# ---------------------------------------------------------------------------


@QS.add(
    "src_orc_nation_summary",
    """
    SELECT r.r_name AS region_name,
           COUNT(*) AS n_nations,
           MIN(n.n_name) AS first_nation,
           MAX(n.n_name) AS last_nation
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    doc="ORC source interop: nation and region are round-tripped through "
    "ORC files (sources/formats.py) and the summary join runs over the "
    "ORC scans — hash-matching the oracle on the original parquet proves "
    "schema and values survive the format seam. The ORC reader gets the "
    "same Catalyst pushdown/pruning treatment as parquet.",
    tags=("source", "orc"),
)
def src_orc_nation_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from clinical_api_etl_spark.sources.formats import orc_roundtrip

    base = os.path.join(
        tempfile.gettempdir(),
        "clinical_api_etl_spark_orc",
        os.path.basename(sf_dir.rstrip("/")),
    )
    nation = orc_roundtrip(
        spark, load(spark, sf_dir, "nation"), os.path.join(base, "nation")
    )
    region = orc_roundtrip(
        spark, load(spark, sf_dir, "region"), os.path.join(base, "region")
    )
    return (
        nation.join(
            F.broadcast(region),
            nation["n_regionkey"] == region["r_regionkey"],
        )
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.count(F.lit(1)).alias("n_nations"),
            F.min("n_name").alias("first_nation"),
            F.max("n_name").alias("last_nation"),
        )
    )


@QS.add(
    "src_avro_nation_summary",
    """
    SELECT r.r_name AS region_name,
           COUNT(*) AS n_nations,
           MIN(n.n_name) AS first_nation,
           MAX(n.n_name) AS last_nation
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    doc="Avro source interop (VERDICT r05 task 3): nation and region are "
    "round-tripped through Avro OCF files written and read by the "
    "pure-stdlib codec in sources/avro.py (public Avro spec: deflate "
    "codec = raw zlib, sync-marker block framing, Python DataSource "
    "API) — hash-matching the oracle on the original parquet proves "
    "schema and values survive the format seam, exactly like the ORC "
    "twin. Reads are split-parallel on sync markers (the Hadoop "
    "AvroInputFormat contract), so the scan scales with byte ranges, "
    "not file count.",
    tags=("source", "avro"),
)
def src_avro_nation_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from clinical_api_etl_spark.sources.avro import avro_roundtrip

    base = os.path.join(
        tempfile.gettempdir(),
        "clinical_api_etl_spark_avro",
        os.path.basename(sf_dir.rstrip("/")),
    )
    nation = avro_roundtrip(
        spark, load(spark, sf_dir, "nation"), os.path.join(base, "nation")
    )
    region = avro_roundtrip(
        spark, load(spark, sf_dir, "region"), os.path.join(base, "region")
    )
    return (
        nation.join(
            F.broadcast(region),
            nation["n_regionkey"] == region["r_regionkey"],
        )
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.count(F.lit(1)).alias("n_nations"),
            F.min("n_name").alias("first_nation"),
            F.max("n_name").alias("last_nation"),
        )
    )


# ---------------------------------------------------------------------------
# Table profiling: per-column stats in ONE scan (ANALYZE-style).
# ---------------------------------------------------------------------------

_PROFILE_COLS = ("l_orderkey", "l_suppkey", "l_returnflag", "l_linestatus")


@QS.add(
    "profile_lineitem_columns",
    " UNION ALL ".join(
        f"""
    SELECT '{c}' AS col_name, COUNT(*) AS n_rows,
           COUNT(*) - COUNT({c}) AS n_nulls,
           COUNT(DISTINCT {c}) AS n_distinct,
           CAST(MIN({c}) AS VARCHAR) AS min_val,
           CAST(MAX({c}) AS VARCHAR) AS max_val
    FROM lineitem
    """
        for c in _PROFILE_COLS
    ),
    doc="Data-profiling operator (ANALYZE-style): row count, null count, "
    "exact NDV, and min/max per profiled column — computed in ONE scan as "
    "a single multi-count-distinct aggregate (Catalyst's Expand handles "
    "the distinct streams) and unpivoted to a (column, stats) row per "
    "column. The profile feeds CBO-style size estimation and data-quality "
    "gates; at 100 TB swap exact NDV for approx_count_distinct (the "
    "a11 family shows the HLL error gate).",
    headline=True,
    tags=("analytics", "profiling"),
)
def profile_lineitem_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(*_PROFILE_COLS)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__ndv"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    one = li.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__ndv, {c}__min, {c}__max" for c in _PROFILE_COLS
    )
    return one.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args}) "
            "AS (col_name, n_nulls, n_distinct, min_val, max_val)"
        ),
        "n_rows",
    ).select("col_name", "n_rows", "n_nulls", "n_distinct", "min_val", "max_val")


# ---------------------------------------------------------------------------
# Round-5: OHLC downsampling, functional-dependency discovery, FK orphan
# profile.
# ---------------------------------------------------------------------------


@QS.add(
    "ts_ohlc_daily",
    f"""
    WITH r AS (
      SELECT event_type, date_trunc('day', ts) AS day, value,
             row_number() OVER (PARTITION BY event_type, date_trunc('day', ts)
                                ORDER BY ts ASC, event_id ASC) AS rn_open,
             row_number() OVER (PARTITION BY event_type, date_trunc('day', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn_close
      FROM events WHERE value IS NOT NULL
    )
    SELECT event_type, day,
           MIN(CASE WHEN rn_open = 1 THEN value END) AS open,
           MAX(value) AS high, MIN(value) AS low,
           MIN(CASE WHEN rn_close = 1 THEN value END) AS close,
           CAST(COUNT(*) AS BIGINT) AS volume,
           {DSUM('value', 'total')}
    FROM r GROUP BY event_type, day
    """,
    doc="[EXT] OHLC bar downsampling (the financial/telemetry resample "
    "primitive): per (event_type, day) the first value (open), max "
    "(high), min (low), last value (close), count and decimal-exact "
    "total. First/last are picked by row_number over (ts, event_id) — "
    "deterministic under timestamp ties, unlike naive first_value. "
    "Open/close/high/low are single SELECTED doubles (no float "
    "accumulation) so they hash-gate; the total goes through dsum. Two "
    "window passes + one aggregate over ONE (type, day) exchange — "
    "Spark compiles both orderings into one Exchange + two Sorts.",
    tags=("window", "analytics"),
    headline=True,
)
def ts_ohlc_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    day = F.date_trunc("day", "ts").alias("day")
    base = ev.select("event_type", day, "value", "ts", "event_id")
    wo = W.partitionBy("event_type", "day").orderBy(F.asc("ts"), F.asc("event_id"))
    wc = W.partitionBy("event_type", "day").orderBy(F.desc("ts"), F.desc("event_id"))
    r = base.select(
        "event_type",
        "day",
        "value",
        F.row_number().over(wo).alias("rn_open"),
        F.row_number().over(wc).alias("rn_close"),
    )
    return r.groupBy("event_type", "day").agg(
        F.min(F.when(F.col("rn_open") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.min(F.when(F.col("rn_close") == 1, F.col("value"))).alias("close"),
        F.count(F.lit(1)).cast("long").alias("volume"),
        dsum("value", "total"),
    )


#: Candidate FDs probed by dq_functional_dependencies: (table, lhs, rhs).
#: A mix of true dependencies (keys) and expected violations.
_FD_CANDIDATES = (
    ("customer", "c_custkey", "c_nationkey"),
    ("customer", "c_nationkey", "c_mktsegment"),
    ("orders", "o_orderkey", "o_custkey"),
    ("orders", "o_custkey", "o_orderstatus"),
    ("supplier", "s_suppkey", "s_nationkey"),
    ("part", "p_partkey", "p_brand"),
    ("part", "p_brand", "p_type"),
)


def _fd_oracle() -> str:
    parts = []
    for table, lhs, rhs in _FD_CANDIDATES:
        parts.append(f"""
    SELECT '{table}' AS tbl, '{lhs}' AS lhs, '{rhs}' AS rhs,
           CAST(COUNT(DISTINCT {lhs}) AS BIGINT) AS n_lhs,
           CAST(COUNT(DISTINCT ({lhs}, {rhs})) AS BIGINT) AS n_pairs,
           COUNT(DISTINCT {lhs}) = COUNT(DISTINCT ({lhs}, {rhs})) AS holds
    FROM {table}""")
    return " UNION ALL ".join(parts)


@QS.add(
    "dq_functional_dependencies",
    _fd_oracle(),
    doc="[EXT] functional-dependency discovery (profiling primitive behind "
    "key inference and normalization checks): A→B holds iff "
    "|distinct A| = |distinct (A,B)|. One two-distinct-count aggregate "
    "per candidate over a declared candidate set — each is a single "
    "shuffle with partial aggregation; candidates are independent so "
    "Spark runs the union branches concurrently. Exact integers.",
    tags=("agg", "profile"),
)
def dq_functional_dependencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    outs = []
    for table, lhs, rhs in _FD_CANDIDATES:
        t = load(spark, sf_dir, table)
        outs.append(
            t.agg(
                F.countDistinct(lhs).cast("long").alias("n_lhs"),
                F.countDistinct(lhs, rhs).cast("long").alias("n_pairs"),
            ).select(
                F.lit(table).alias("tbl"),
                F.lit(lhs).alias("lhs"),
                F.lit(rhs).alias("rhs"),
                "n_lhs",
                "n_pairs",
                (F.col("n_lhs") == F.col("n_pairs")).alias("holds"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


#: Referential relationships probed by dq_fk_orphans:
#: (child table, child key, parent table, parent key).
_FK_RELS = (
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
)


def _fk_oracle() -> str:
    parts = []
    for child, ckey, parent, pkey in _FK_RELS:
        parts.append(f"""
    SELECT '{child}.{ckey}' AS child, '{parent}.{pkey}' AS parent,
           CAST(COUNT(*) AS BIGINT) AS n_child,
           CAST(COUNT(*) FILTER (WHERE p.{pkey} IS NULL) AS BIGINT) AS n_orphans,
           CAST(COUNT(*) FILTER (WHERE p.{pkey} IS NULL) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS orphan_rate
    FROM {child} c LEFT JOIN (SELECT DISTINCT {pkey} FROM {parent}) p
      ON c.{ckey} = p.{pkey}""")
    return " UNION ALL ".join(parts)


@QS.add(
    "dq_fk_orphans",
    _fk_oracle(),
    doc="[EXT] referential-integrity profile: per declared FK "
    "relationship, child row count, orphan count (child keys absent "
    "from the parent) and orphan rate — the DQ dashboard behind the "
    "reference's FK constraints (02_staging_clinical_trials.sql), "
    "generalized to the whole star schema. Each relationship is a LEFT "
    "join against the DISTINCT parent keys (broadcast for dims); the "
    "rate is one IEEE division of exact counts (portable).",
    tags=("agg", "profile", "J3"),
)
def dq_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    outs = []
    for child, ckey, parent, pkey in _FK_RELS:
        c = load(spark, sf_dir, child)
        p = load(spark, sf_dir, parent).select(pkey).distinct()
        joined = c.join(p, c[ckey] == p[pkey], "left")
        outs.append(
            joined.agg(
                F.count(F.lit(1)).cast("long").alias("n_child"),
                F.sum(F.when(F.col(pkey).isNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_orphans"),
            ).select(
                F.lit(f"{child}.{ckey}").alias("child"),
                F.lit(f"{parent}.{pkey}").alias("parent"),
                "n_child",
                "n_orphans",
                (
                    F.col("n_orphans").cast("double")
                    / F.col("n_child").cast("double")
                ).alias("orphan_rate"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


@QS.add(
    "stat_seasonal_decomposition",
    """
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(isodow(date_trunc('day', ts)) - 1 AS BIGINT) AS dow,
             CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                  AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, date_trunc('day', ts)
    ),
    win AS (
      SELECT *,
             SUM(cents) OVER w AS trend_sum,
             COUNT(*) OVER w AS n_win
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY epoch(day)
                   RANGE BETWEEN 259200 PRECEDING AND 259200 FOLLOWING)
    ),
    interior AS (
      SELECT event_type, day, dow, cents,
             CAST(7 * cents - trend_sum AS BIGINT) AS detr_x7,
             CAST(trend_sum AS BIGINT) AS trend_sum
      FROM win WHERE n_win = 7
    ),
    season AS (
      SELECT event_type, dow,
             CAST(SUM(detr_x7) AS BIGINT) AS s_dow,
             CAST(COUNT(*) AS BIGINT) AS n_dow
      FROM interior GROUP BY event_type, dow
    )
    SELECT i.event_type, i.day, i.dow, i.cents,
           CAST(i.trend_sum AS DOUBLE) / 7.0e0 AS trend,
           CAST(s.s_dow AS DOUBLE) / (7.0e0 * CAST(s.n_dow AS DOUBLE)) AS seasonal,
           CAST(i.detr_x7 AS DOUBLE) / 7.0e0
             - CAST(s.s_dow AS DOUBLE) / (7.0e0 * CAST(s.n_dow AS DOUBLE))
             AS residual
    FROM interior i JOIN season s
      ON i.event_type = s.event_type AND i.dow = s.dow
    """,
    doc="[EXT] additive seasonal decomposition (classical STL-lite) of the "
    "per-type daily revenue series: trend = centered 7-day moving average "
    "(RANGE frame on epoch day, interior days only so every window holds "
    "exactly 7 points), seasonal = day-of-week mean of the detrended "
    "series, residual = remainder. The core stays EXACT: detrended x7 = "
    "7*cents - trend_sum is a BIGINT; the published floats are a fixed "
    "IEEE tree over exact ints (two correctly-rounded divisions + one "
    "subtraction) so every value hash-matches. Day-of-week via Spark "
    "weekday == DuckDB isodow-1 (both Monday-0). One window exchange per "
    "type + one broadcast-joined 7-row seasonal table.",
    tags=("window", "analytics", "stats"),
)
def stat_seasonal_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum(cents).cast("long").alias("cents"))
    daily = daily.withColumn("dow", F.weekday("day").cast("long"))
    w = (
        W.partitionBy("event_type")
        .orderBy(F.unix_timestamp("day"))
        .rangeBetween(-3 * 86400, 3 * 86400)
    )
    win = daily.select(
        "event_type",
        "day",
        "dow",
        "cents",
        F.sum("cents").over(w).alias("trend_sum"),
        F.count(F.lit(1)).over(w).alias("n_win"),
    )
    interior = win.filter(F.col("n_win") == 7).select(
        "event_type",
        "day",
        "dow",
        "cents",
        (F.lit(7) * F.col("cents") - F.col("trend_sum")).cast("long").alias("detr_x7"),
        F.col("trend_sum").cast("long").alias("trend_sum"),
    )
    season = interior.groupBy("event_type", "dow").agg(
        F.sum("detr_x7").cast("long").alias("s_dow"),
        F.count(F.lit(1)).cast("long").alias("n_dow"),
    )
    seasonal = F.col("s_dow").cast("double") / (
        F.lit(7.0) * F.col("n_dow").cast("double")
    )
    return interior.join(F.broadcast(season), ["event_type", "dow"]).select(
        "event_type",
        "day",
        "dow",
        "cents",
        (F.col("trend_sum").cast("double") / F.lit(7.0)).alias("trend"),
        seasonal.alias("seasonal"),
        (F.col("detr_x7").cast("double") / F.lit(7.0) - seasonal).alias("residual"),
    )


# ---------------------------------------------------------------------------
# Round-6: Holt double exponential smoothing — a SEQUENTIAL recurrence
# under a full value hash via pinned left-folds.
# ---------------------------------------------------------------------------


@QS.add(
    "ts_holt_smoothing_daily",
    """
    WITH daily AS (
      SELECT event_type, epoch_ms(ts) // 86400000 AS d,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY event_type, d
    ),
    series AS (
      SELECT event_type, list(CAST(y AS DOUBLE) ORDER BY d) AS ys
      FROM daily GROUP BY event_type
    ),
    folded AS (
      -- DOUBLE[] accumulator [l, b, sse], NOT a struct: DuckDB's
      -- list_reduce evaluates STRUCT-field expressions with the
      -- accumulator updated IN PLACE (field 2 sees field 1's new value
      -- — reproduced on 1.x), while list-element expressions all read
      -- the original accumulator. Spark's named_struct reads the
      -- original acc for every field, so the list form is the one that
      -- matches Spark and the python reference bit-for-bit.
      SELECT event_type, len(ys) AS n_days,
        list_reduce(
          list_concat(
            [[ys[1], ys[2] - ys[1], CAST(0 AS DOUBLE)]],
            list_transform(ys[2:], y -> [y, CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)])),
          (acc, e) -> [
            0.5e0 * e[1] + 0.5e0 * (acc[1] + acc[2]),
            0.25e0 * ((0.5e0 * e[1] + 0.5e0 * (acc[1] + acc[2])) - acc[1])
              + 0.75e0 * acc[2],
            acc[3] + (e[1] - (acc[1] + acc[2])) * (e[1] - (acc[1] + acc[2]))]
        ) AS st
      FROM series WHERE len(ys) >= 2
    )
    SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
           st[1] AS level, st[2] AS trend,
           st[1] + st[2] AS forecast_1, st[3] AS sse
    FROM folded
    """,
    doc="[EXT] Holt double exponential smoothing (level + trend) of the "
    "daily event-count series, alpha=0.5 beta=0.25 (exact binary "
    "fractions), init l1=y1, b1=y2-y1, recurrence over y2..yn with "
    "one-step-ahead SSE accumulated in the same pass — the first "
    "SEQUENTIAL-RECURRENCE query under a full value hash: both engines "
    "run the identical left-fold over the day-ordered series (Spark "
    "aggregate with a named_struct accumulator == DuckDB list_reduce "
    "with a DOUBLE[] accumulator — struct accumulators are NOT safe in "
    "DuckDB, see the oracle comment), so every intermediate IEEE value "
    "is bit-identical. The fold runs per event type over the "
    "calendar-bounded daily pre-aggregate — one shuffle, fold cost "
    "|days|, never events.",
    tags=("timeseries", "stats"),
)
def ts_holt_smoothing_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    return (
        series.filter(F.size("ys") >= 2)
        .selectExpr(
            "event_type",
            "CAST(size(ys) AS BIGINT) AS n_days",
            """aggregate(
                 slice(ys, 2, size(ys) - 1),
                 named_struct(
                   'l', element_at(ys, 1),
                   'b', element_at(ys, 2) - element_at(ys, 1),
                   'sse', CAST(0.0 AS DOUBLE)),
                 (acc, y) -> named_struct(
                   'l', 0.5D * y + 0.5D * (acc.l + acc.b),
                   'b', 0.25D * ((0.5D * y + 0.5D * (acc.l + acc.b)) - acc.l)
                        + 0.75D * acc.b,
                   'sse', acc.sse + (y - (acc.l + acc.b)) * (y - (acc.l + acc.b)))
               ) AS st""",
        )
        .selectExpr(
            "event_type",
            "n_days",
            "st.l AS level",
            "st.b AS trend",
            "st.l + st.b AS forecast_1",
            "st.sse AS sse",
        )
    )


@QS.add(
    "ts_max_drawdown_daily",
    """
    WITH daily AS (
      SELECT event_type, epoch_ms(ts) // 86400000 AS d,
             CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                  AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, d
    ),
    cum AS (
      SELECT event_type, d,
             CAST(SUM(cents) OVER (PARTITION BY event_type ORDER BY d
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c
      FROM daily
    ),
    dd AS (
      SELECT event_type, d, c,
             CAST(MAX(c) OVER (PARTITION BY event_type ORDER BY d
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS peak
      FROM cum
    ),
    dd2 AS (
      SELECT event_type, d, c, peak, peak - c AS draw,
             MAX(peak - c) OVER (PARTITION BY event_type) AS maxdraw
      FROM dd
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           MAX(peak) AS peak_cents,
           CAST(MAX(draw) AS BIGINT) AS max_drawdown_cents,
           CAST(MIN(CASE WHEN draw = maxdraw THEN d END) AS BIGINT)
             AS trough_day
    FROM dd2 GROUP BY event_type
    """,
    doc="[EXT] maximum drawdown of the cumulative daily revenue series "
    "per event type (the risk/ops metric: worst peak-to-trough drop), "
    "with the earliest trough day. Running sum + running max + one "
    "aggregate — three passes over ONE (type, day) exchange, all exact "
    "integer cents, zero float risk. The drawdown frame is the running "
    "PREFIX max, so the answer is order-deterministic by construction.",
    tags=("timeseries", "analytics"),
)
def ts_max_drawdown_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    daily = (
        ev.selectExpr("event_type", "unix_millis(ts) div 86400000 AS d", "value")
        .groupBy("event_type", "d")
        .agg(F.sum(cents).cast("long").alias("cents"))
    )
    run = W.partitionBy("event_type").orderBy("d").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    dd = (
        daily.withColumn("c", F.sum("cents").over(run).cast("long"))
        .withColumn("peak", F.max("c").over(run).cast("long"))
        .withColumn("draw", F.col("peak") - F.col("c"))
        .withColumn(
            "maxdraw", F.max(F.col("peak") - F.col("c")).over(W.partitionBy("event_type"))
        )
    )
    return dd.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.max("peak").alias("peak_cents"),
        F.max("draw").cast("long").alias("max_drawdown_cents"),
        F.min(F.when(F.col("draw") == F.col("maxdraw"), F.col("d")))
        .cast("long")
        .alias("trough_day"),
    )


@QS.add(
    "ts_kalman_local_level",
    """
    WITH daily AS (
      SELECT event_type, epoch_ms(ts) // 86400000 AS d,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY event_type, d
    ),
    series AS (
      SELECT event_type, list(CAST(y AS DOUBLE) ORDER BY d) AS ys
      FROM daily GROUP BY event_type
    ),
    folded AS (
      -- DOUBLE[] accumulator [x, p, ll2] (state, variance, sum of
      -- squared one-step innovations scaled by 1/S) — the struct
      -- in-place hazard rule (see ts_holt_smoothing_daily).
      SELECT event_type, len(ys) AS n_days,
        list_reduce(
          list_concat(
            [[ys[1], 100.0e0, CAST(0 AS DOUBLE)]],
            list_transform(ys[2:], y -> [y, CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)])),
          (acc, e) -> [
            acc[1] + ((acc[2] + 4.0e0) / (acc[2] + 4.0e0 + 25.0e0))
                     * (e[1] - acc[1]),
            (1.0e0 - (acc[2] + 4.0e0) / (acc[2] + 4.0e0 + 25.0e0))
              * (acc[2] + 4.0e0),
            acc[3] + (e[1] - acc[1]) * (e[1] - acc[1])
                     / (acc[2] + 4.0e0 + 25.0e0)]
        ) AS st
      FROM series WHERE len(ys) >= 2
    )
    SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
           st[1] AS level, st[2] AS variance, st[3] AS innovation_score
    FROM folded
    """,
    doc="[EXT] 1-D Kalman filter (local level model, Q=4, R=25, "
    "P0=100 — exact binary constants) over the daily count series: "
    "per step the prediction variance P+Q, gain K=(P+Q)/(P+Q+R), state "
    "update x+=K*innovation, posterior variance (1-K)(P+Q), plus the "
    "normalized innovation sum (the goodness-of-fit signal). Second "
    "instance of the sequential-recurrence fold template "
    "(ts_holt_smoothing_daily) — this one proves PER-STEP DIVISIONS "
    "stay bit-identical across engines (division is correctly rounded; "
    "the fold pins the order). Fold cost |days| per type, one shuffle.",
    tags=("timeseries", "stats"),
)
def ts_kalman_local_level(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    return (
        series.filter(F.size("ys") >= 2)
        .selectExpr(
            "event_type",
            "CAST(size(ys) AS BIGINT) AS n_days",
            """aggregate(
                 slice(ys, 2, size(ys) - 1),
                 named_struct('x', element_at(ys, 1), 'p', CAST(100.0 AS DOUBLE),
                              'll2', CAST(0.0 AS DOUBLE)),
                 (acc, y) -> named_struct(
                   'x', acc.x + ((acc.p + 4.0D) / (acc.p + 4.0D + 25.0D))
                                * (y - acc.x),
                   'p', (1.0D - (acc.p + 4.0D) / (acc.p + 4.0D + 25.0D))
                        * (acc.p + 4.0D),
                   'll2', acc.ll2 + (y - acc.x) * (y - acc.x)
                          / (acc.p + 4.0D + 25.0D))
               ) AS st""",
        )
        .selectExpr(
            "event_type",
            "n_days",
            "st.x AS level",
            "st.p AS variance",
            "st.ll2 AS innovation_score",
        )
    )


@QS.add(
    "ops_rate_limit_simulation",
    """
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS us, event_id FROM events
    ),
    series AS (
      SELECT user_id, list(us ORDER BY us, event_id) AS xs
      FROM e GROUP BY user_id
    ),
    folded AS (
      -- BIGINT[] accumulator [tokens_micro, last_us, admitted, rejected]
      -- (list, not struct — the in-place rule, ts_holt_smoothing_daily).
      -- Bucket: capacity 5 tokens, refill 1 token / 10 s; micro-token
      -- units (1 token = 1e6) make every step EXACT integer algebra.
      SELECT user_id, len(xs) AS n_events,
        list_reduce(
          list_concat(
            [[CAST(4000000 AS BIGINT), xs[1], CAST(1 AS BIGINT),
              CAST(0 AS BIGINT)]],
            list_transform(xs[2:], x -> [x, CAST(0 AS BIGINT),
                                         CAST(0 AS BIGINT), CAST(0 AS BIGINT)])),
          (acc, e) -> CASE
            WHEN least(acc[1] + (e[1] - acc[2]) // 10, 5000000) >= 1000000
            THEN [least(acc[1] + (e[1] - acc[2]) // 10, 5000000) - 1000000,
                  e[1], acc[3] + 1, acc[4]]
            ELSE [least(acc[1] + (e[1] - acc[2]) // 10, 5000000),
                  e[1], acc[3], acc[4] + 1] END
        ) AS st
      FROM series
    )
    SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
           st[3] AS admitted, st[4] AS rejected, st[1] AS tokens_left_micro
    FROM folded
    """,
    doc="[EXT] token-bucket rate-limiter replay per user (capacity 5, "
    "refill 1 token/10 s, bucket starts full): for each user's "
    "time-ordered event stream, how many requests a production edge "
    "limiter would have admitted vs rejected — the capacity-planning / "
    "abuse-analysis query. Third instance of the sequential-recurrence "
    "fold template, this one in PURE BIGINT micro-token algebra (floor "
    "div is non-negative — Spark div == DuckDB //), so the gate is "
    "exact with zero float surface. Fold cost = per-user event count; "
    "one shuffle on user_id.",
    tags=("analytics", "stateful"),
    headline=True,
)
def ops_rate_limit_simulation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    series = (
        ev.selectExpr("user_id", "unix_micros(ts) AS us", "event_id")
        .groupBy("user_id")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(us, event_id))),"
                " s -> s.us)"
            ).alias("xs")
        )
    )
    return series.selectExpr(
        "user_id",
        "CAST(size(xs) AS BIGINT) AS n_events",
        """aggregate(
             slice(xs, 2, size(xs) - 1),
             named_struct('t', CAST(4000000 AS BIGINT), 'last', element_at(xs, 1),
                          'a', CAST(1 AS BIGINT), 'r', CAST(0 AS BIGINT)),
             (acc, x) -> IF(
               least(acc.t + (x - acc.last) div 10, CAST(5000000 AS BIGINT))
                 >= 1000000,
               named_struct(
                 't', least(acc.t + (x - acc.last) div 10,
                            CAST(5000000 AS BIGINT)) - 1000000,
                 'last', x, 'a', acc.a + 1, 'r', acc.r),
               named_struct(
                 't', least(acc.t + (x - acc.last) div 10,
                            CAST(5000000 AS BIGINT)),
                 'last', x, 'a', acc.a, 'r', acc.r + 1))
           ) AS st""",
    ).selectExpr(
        "user_id",
        "n_events",
        "st.a AS admitted",
        "st.r AS rejected",
        "st.t AS tokens_left_micro",
    )


# ---------------------------------------------------------------------------
# MASE: Holt one-step forecast errors scaled by the naive lag-1 errors.
# ---------------------------------------------------------------------------


@QS.add(
    "ts_forecast_mase",
    """
    WITH daily AS (
      SELECT event_type, epoch_ms(ts) // 86400000 AS d,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY event_type, d
    ),
    series AS (
      SELECT event_type, list(CAST(y AS DOUBLE) ORDER BY d) AS ys
      FROM daily GROUP BY event_type
    ),
    folded AS (
      -- DOUBLE[] accumulator [l, b, sae_model, sae_naive, prev_y]
      -- (LIST, not STRUCT — the DuckDB in-place-struct hazard)
      SELECT event_type, len(ys) AS n_days,
        list_reduce(
          list_concat(
            [[ys[1], ys[2] - ys[1], CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), ys[1]]],
            list_transform(ys[2:], y -> [y, CAST(0 AS DOUBLE), CAST(0 AS DOUBLE),
                                         CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)])),
          (acc, e) -> [
            0.5e0 * e[1] + 0.5e0 * (acc[1] + acc[2]),
            0.25e0 * ((0.5e0 * e[1] + 0.5e0 * (acc[1] + acc[2])) - acc[1])
              + 0.75e0 * acc[2],
            acc[3] + abs(e[1] - (acc[1] + acc[2])),
            acc[4] + abs(e[1] - acc[5]),
            e[1]]
        ) AS st
      FROM series WHERE len(ys) >= 2
    )
    SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
           st[3] AS sae_model, st[4] AS sae_naive,
           CASE WHEN st[4] > 0 THEN st[3] / st[4] ELSE CAST(0 AS DOUBLE) END AS mase
    FROM folded
    """,
    doc="[EXT] MASE — mean absolute scaled error of the Holt one-step "
    "forecasts against the naive lag-1 forecast (Hyndman-Koehler, the "
    "scale-free forecast-quality metric; MASE < 1 = beats naive): both "
    "absolute-error sums accumulate inside the SAME pinned left-fold "
    "that runs the Holt recurrence (ts_holt_smoothing_daily's "
    "alpha/beta/init, one extra accumulator slot tracking prev_y), so "
    "the errors and the final ratio are bit-identical across engines. "
    "sae_naive sums |y_t - y_t-1| over exact integer counts (exact in "
    "DOUBLE); MASE is one division of two bit-identical values. "
    "Completes the forecasting family: smooth (Holt/HW/Kalman) -> "
    "predict (forecast_1) -> EVALUATE.",
    tags=("timeseries", "stats"),
)
def ts_forecast_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    return (
        series.filter(F.size("ys") >= 2)
        .selectExpr(
            "event_type",
            "CAST(size(ys) AS BIGINT) AS n_days",
            """aggregate(
                 slice(ys, 2, size(ys) - 1),
                 named_struct(
                   'l', element_at(ys, 1),
                   'b', element_at(ys, 2) - element_at(ys, 1),
                   'sae', CAST(0.0 AS DOUBLE),
                   'nv', CAST(0.0 AS DOUBLE),
                   'prev', element_at(ys, 1)),
                 (acc, y) -> named_struct(
                   'l', 0.5D * y + 0.5D * (acc.l + acc.b),
                   'b', 0.25D * ((0.5D * y + 0.5D * (acc.l + acc.b)) - acc.l)
                        + 0.75D * acc.b,
                   'sae', acc.sae + abs(y - (acc.l + acc.b)),
                   'nv', acc.nv + abs(y - acc.prev),
                   'prev', y)
               ) AS st""",
        )
        .selectExpr(
            "event_type",
            "n_days",
            "st.sae AS sae_model",
            "st.nv AS sae_naive",
            "CASE WHEN st.nv > 0D THEN st.sae / st.nv ELSE 0D END AS mase",
        )
    )


@QS.add(
    "ops_slo_burn_alerts",
    """
    WITH hourly AS (
      SELECT epoch_ms(ts) // 3600000 AS h,
             CAST(COUNT(*) AS BIGINT) AS tot,
             CAST(COUNT(*) FILTER (event_type = 'error') AS BIGINT) AS err
      FROM events GROUP BY h
    ),
    w AS (
      SELECT h, tot, err,
             CAST(SUM(tot) OVER (ORDER BY h
               ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS BIGINT) AS tot6,
             CAST(SUM(err) OVER (ORDER BY h
               ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS BIGINT) AS err6
      FROM hourly
    )
    SELECT h, tot, err, tot6, err6,
           CAST(100 * err AS DOUBLE) / CAST(tot AS DOUBLE) AS burn_1h,
           CAST(100 * err6 AS DOUBLE) / CAST(tot6 AS DOUBLE) AS burn_6h,
           (1000 * err >= 144 * tot AND 50 * err6 >= 3 * tot6) AS page
    FROM w
    """,
    doc="[EXT] multiwindow SLO burn-rate alerts (the Google SRE workbook "
    "policy): with a 99% success SLO the error budget is 1%, so burn = "
    "error_rate / 0.01 = 100·err/tot; PAGE when the fast window burns "
    ">= 14.4x budget AND the slow 6h window confirms >= 6x (the "
    "two-window AND kills both blips and slow-bleed false negatives). "
    "Both threshold tests are exact integer cross-multiplications "
    "(1000·err >= 144·tot; 50·err6 >= 3·tot6) — the booleans carry no "
    "float boundary risk — and the reported burn rates are single "
    "divisions over exact products, so every row hash-matches. Shape: "
    "one map-side-combinable hourly aggregate, one 6-row trailing "
    "frame over the HOURLY series (calendar-bounded window — the "
    "w18/w19 class).",
    tags=("ops", "temporal"),
)
def ops_slo_burn_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.expr("unix_millis(ts) div 3600000").alias("h")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("tot"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("long")
        .alias("err"),
    )
    frame = W.orderBy("h").rowsBetween(-5, 0)
    w = hourly.select(
        "h",
        "tot",
        "err",
        F.sum("tot").over(frame).cast("long").alias("tot6"),
        F.sum("err").over(frame).cast("long").alias("err6"),
    )
    return w.select(
        "h",
        "tot",
        "err",
        "tot6",
        "err6",
        ((F.lit(100) * F.col("err")).cast("double") / F.col("tot").cast("double")).alias(
            "burn_1h"
        ),
        (
            (F.lit(100) * F.col("err6")).cast("double")
            / F.col("tot6").cast("double")
        ).alias("burn_6h"),
        (
            (F.lit(1000) * F.col("err") >= F.lit(144) * F.col("tot"))
            & (F.lit(50) * F.col("err6") >= F.lit(3) * F.col("tot6"))
        ).alias("page"),
    )


@QS.add(
    "anomaly_hbos_events",
    """
    WITH e AS (
      SELECT event_id, event_type,
             LEAST(5, CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                      // 10000) AS vband,
             (epoch_ms(ts) // 3600000) % 24 AS hod,
             (epoch_ms(ts) // 86400000) % 7 AS dow
      FROM events WHERE value IS NOT NULL
    ),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM e),
    bv AS (SELECT vband, CAST(COUNT(*) AS BIGINT) AS c FROM e GROUP BY vband),
    bh AS (SELECT hod, CAST(COUNT(*) AS BIGINT) AS c FROM e GROUP BY hod),
    bd AS (SELECT dow, CAST(COUNT(*) AS BIGINT) AS c FROM e GROUP BY dow),
    scored AS (
      SELECT e.event_id, e.event_type, e.vband, e.hod, e.dow,
             bv.c AS c_vband, bh.c AS c_hod, bd.c AS c_dow,
             (CAST((SELECT n FROM nn) AS DOUBLE) / CAST(bv.c AS DOUBLE))
             * (CAST((SELECT n FROM nn) AS DOUBLE) / CAST(bh.c AS DOUBLE))
             * (CAST((SELECT n FROM nn) AS DOUBLE) / CAST(bd.c AS DOUBLE))
               AS hbos
      FROM e JOIN bv USING (vband) JOIN bh USING (hod) JOIN bd USING (dow)
    )
    SELECT event_id, event_type, vband, hod, dow,
           c_vband, c_hod, c_dow, hbos
    FROM scored ORDER BY hbos DESC, event_id LIMIT 20
    """,
    doc="[EXT] HBOS outlier screen (Goldstein & Dengel 2012 — the "
    "linear-time histogram-based detector that beats LOF/iForest on "
    "global anomalies): score = Π_features 1/p_f(x), here over three "
    "independent event histograms ($100 value band, hour-of-day, "
    "day-of-week), in the LOG-FREE product form (JVM log is "
    "unportable; the rank order is identical). Each term is ONE "
    "division of exact BIGINTs and the product a fixed 2-multiply "
    "tree, so the top-20 (score DESC, event_id) rows hash-gate "
    "bit-for-bit. Shape: one scan derives the bins, three tiny "
    "broadcast histograms join back, TakeOrdered 20 — no window, no "
    "data-scaled shuffle.",
    tags=("stats", "quality"),
)
def anomaly_hbos_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    e = ev.select(
        "event_id",
        "event_type",
        F.least(
            F.lit(5),
            F.expr(
                "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) div 10000"
            ),
        ).alias("vband"),
        F.expr("(unix_millis(ts) div 3600000) % 24").alias("hod"),
        F.expr("(unix_millis(ts) div 86400000) % 7").alias("dow"),
    ).persist()
    nn = e.agg(F.count(F.lit(1)).cast("long").alias("n"))
    bv = e.groupBy("vband").agg(F.count(F.lit(1)).cast("long").alias("c_vband"))
    bh = e.groupBy("hod").agg(F.count(F.lit(1)).cast("long").alias("c_hod"))
    bd = e.groupBy("dow").agg(F.count(F.lit(1)).cast("long").alias("c_dow"))
    scored = (
        e.join(F.broadcast(bv), "vband")
        .join(F.broadcast(bh), "hod")
        .join(F.broadcast(bd), "dow")
        .crossJoin(F.broadcast(nn))
        .select(
            "event_id",
            "event_type",
            "vband",
            "hod",
            "dow",
            "c_vband",
            "c_hod",
            "c_dow",
            (
                (F.col("n").cast("double") / F.col("c_vband").cast("double"))
                * (F.col("n").cast("double") / F.col("c_hod").cast("double"))
                * (F.col("n").cast("double") / F.col("c_dow").cast("double"))
            ).alias("hbos"),
        )
    )
    return scored.orderBy(F.desc("hbos"), F.asc("event_id")).limit(20)


_DECOMP_CTES = """daily AS (
      SELECT epoch_ms(ts) // 86400000 AS day,
             CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                  AS BIGINT) AS s,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL GROUP BY day
    ),
    ma AS (
      SELECT day, s, c,
             CAST(SUM(s) OVER w AS BIGINT) AS s7,
             CAST(SUM(c) OVER w AS BIGINT) AS c7,
             CAST(COUNT(*) OVER w AS BIGINT) AS k7
      FROM daily
      WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    det AS (
      SELECT day, day % 7 AS dow,
             CAST(s AS DOUBLE) / CAST(c AS DOUBLE) AS mean_cents,
             CAST(s7 AS DOUBLE) / CAST(c7 AS DOUBLE) AS trend_cents,
             CAST(s AS DOUBLE) / CAST(c AS DOUBLE)
               - CAST(s7 AS DOUBLE) / CAST(c7 AS DOUBLE) AS detrended
      FROM ma WHERE k7 = 7
    ),
    seas AS (
      SELECT dow,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(detrended ORDER BY day)), (a, b) -> a + b)
             / CAST(COUNT(*) AS DOUBLE) AS seasonal_cents
      FROM det GROUP BY dow
    )"""


@QS.add(
    "ts_classical_decomposition",
    """
    WITH daily AS (
      SELECT epoch_ms(ts) // 86400000 AS day,
             CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                  AS BIGINT) AS s,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL GROUP BY day
    ),
    ma AS (
      SELECT day, s, c,
             CAST(SUM(s) OVER w AS BIGINT) AS s7,
             CAST(SUM(c) OVER w AS BIGINT) AS c7,
             CAST(COUNT(*) OVER w AS BIGINT) AS k7
      FROM daily
      WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    det AS (
      SELECT day, day % 7 AS dow,
             CAST(s AS DOUBLE) / CAST(c AS DOUBLE) AS mean_cents,
             CAST(s7 AS DOUBLE) / CAST(c7 AS DOUBLE) AS trend_cents,
             CAST(s AS DOUBLE) / CAST(c AS DOUBLE)
               - CAST(s7 AS DOUBLE) / CAST(c7 AS DOUBLE) AS detrended
      FROM ma WHERE k7 = 7
    ),
    seas AS (
      SELECT dow,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(detrended ORDER BY day)), (a, b) -> a + b)
             / CAST(COUNT(*) AS DOUBLE) AS seasonal_cents
      FROM det GROUP BY dow
    )
    SELECT d.day, d.dow, d.mean_cents, d.trend_cents,
           s.seasonal_cents,
           d.detrended - s.seasonal_cents AS remainder_cents
    FROM det d JOIN seas s ON d.dow = s.dow
    """,
    doc="[EXT] classical additive seasonal decomposition of the daily "
    "value series (the statsmodels seasonal_decompose method): trend = "
    "centered 7-day moving average kept EXACT by averaging the window "
    "of BIGINT (sum, count) pairs — Σs/Σc is ONE division, never a "
    "float-window sum (fp association order differs between engines); "
    "detrended = mean − trend (fixed IEEE subtract of bit-identical "
    "doubles); seasonal = per-weekday mean of detrended via a pinned "
    "day-order fold + one division; remainder closes the identity "
    "y = trend + seasonal + remainder exactly in IEEE. Edge days "
    "without a full 7-day frame are excluded (k7 = 7, the standard "
    "centered-MA convention). Epoch-day mod 7 keeps the weekday "
    "calendar-free. One daily pre-aggregate, one 7-row frame, one "
    "|weekday|-row fold table.",
    tags=("temporal", "stats"),
)
def ts_classical_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    daily = ev.groupBy(
        F.expr("unix_millis(ts) div 86400000").alias("day")
    ).agg(
        F.sum(
            F.expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
        )
        .cast("long")
        .alias("s"),
        F.count(F.lit(1)).cast("long").alias("c"),
    )
    w = W.orderBy("day").rowsBetween(-3, 3)
    ma = daily.select(
        "day",
        "s",
        "c",
        F.sum("s").over(w).cast("long").alias("s7"),
        F.sum("c").over(w).cast("long").alias("c7"),
        F.count(F.lit(1)).over(w).cast("long").alias("k7"),
    )
    mean = F.col("s").cast("double") / F.col("c").cast("double")
    trend = F.col("s7").cast("double") / F.col("c7").cast("double")
    det = ma.filter(F.col("k7") == 7).select(
        "day",
        (F.col("day") % 7).alias("dow"),
        mean.alias("mean_cents"),
        trend.alias("trend_cents"),
        (mean - trend).alias("detrended"),
    )
    seas = det.groupBy("dow").agg(
        (
            F.aggregate(
                F.sort_array(F.collect_list(F.struct("day", "detrended"))),
                F.lit(0.0),
                lambda acc, x: acc + x["detrended"],
            )
            / F.count(F.lit(1)).cast("double")
        ).alias("seasonal_cents")
    )
    return det.join(F.broadcast(seas), "dow").select(
        "day",
        "dow",
        "mean_cents",
        "trend_cents",
        "seasonal_cents",
        (F.col("detrended") - F.col("seasonal_cents")).alias("remainder_cents"),
    )


@QS.add(
    "ts_page_hinkley_drift",
    """
    WITH daily AS (
      SELECT event_type, epoch_ms(ts) // 86400000 AS d,
             CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                  AS BIGINT) AS s,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL GROUP BY event_type, d
    ),
    series AS (
      SELECT event_type,
             list(CAST(s AS DOUBLE) / CAST(c AS DOUBLE) ORDER BY d) AS xs
      FROM daily GROUP BY event_type
    ),
    folded AS (
      -- DOUBLE[] accumulator [n, sum, m, mmin] (round-10 LIST rule:
      -- every element expression reads the ORIGINAL accumulator, so
      -- the running mean is recomputed inline from acc, and mmin
      -- repeats the new-m expression verbatim — identical operands,
      -- identical bits).
      SELECT event_type, len(xs) AS n_days,
        list_reduce(
          list_prepend(
            [CAST(0 AS DOUBLE), CAST(0 AS DOUBLE),
             CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)],
            list_transform(xs, x ->
              [x, CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)])),
          (acc, e) -> [
            acc[1] + 1,
            acc[2] + e[1],
            acc[3] + (e[1] - (acc[2] + e[1]) / (acc[1] + 1) - 5.0e0),
            least(acc[4],
              acc[3] + (e[1] - (acc[2] + e[1]) / (acc[1] + 1) - 5.0e0))]
        ) AS st
      FROM series
    )
    SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
           st[2] / st[1] AS mean_cents,
           st[3] AS m, st[4] AS m_min,
           st[3] - st[4] AS ph,
           (st[3] - st[4] > 500.0e0) AS drift
    FROM folded
    """,
    doc="[EXT] Page-Hinkley drift detector (Page 1954; the streaming-ML "
    "standard for mean shift) over each type's daily mean-cents series: "
    "m_t = m_(t-1) + (x_t − x̄_t − δ) with the RUNNING mean, M_t = min "
    "m_τ, alarm when m_t − M_t > λ (δ=5 cents tolerance, λ=500 "
    "threshold — exact e0 literals). Third sequential-recurrence fold "
    "after Holt/Kalman: the 4-slot DOUBLE[] accumulator [n, sum, m, "
    "mmin] recomputes the running mean inline from the ORIGINAL "
    "accumulator (the round-10 LIST-semantics rule) and repeats the "
    "new-m expression verbatim inside least() — identical operands, "
    "bit-identical on both engines, so m/M/PH and the alarm boolean "
    "all hash-gate. Fold cost |days| per type, never events.",
    tags=("temporal", "stats"),
)
def ts_page_hinkley_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    daily = ev.groupBy(
        "event_type", F.expr("unix_millis(ts) div 86400000").alias("d")
    ).agg(
        F.sum(
            F.expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
        )
        .cast("long")
        .alias("s"),
        F.count(F.lit(1)).cast("long").alias("c"),
    )
    series = daily.groupBy("event_type").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(d,"
            " CAST(s AS DOUBLE) / CAST(c AS DOUBLE) AS xv))), t -> t.xv)"
        ).alias("xs")
    )
    return series.selectExpr(
        "event_type",
        "CAST(size(xs) AS BIGINT) AS n_days",
        """aggregate(
             xs,
             named_struct('n', CAST(0.0 AS DOUBLE), 's', CAST(0.0 AS DOUBLE),
                          'm', CAST(0.0 AS DOUBLE), 'mm', CAST(0.0 AS DOUBLE)),
             (acc, x) -> named_struct(
               'n', acc.n + 1,
               's', acc.s + x,
               'm', acc.m + (x - (acc.s + x) / (acc.n + 1) - 5.0D),
               'mm', least(acc.mm,
                           acc.m + (x - (acc.s + x) / (acc.n + 1) - 5.0D)))
           ) AS st""",
    ).selectExpr(
        "event_type",
        "n_days",
        "st.s / st.n AS mean_cents",
        "st.m AS m",
        "st.mm AS m_min",
        "st.m - st.mm AS ph",
        "(st.m - st.mm > 500.0D) AS drift",
    )


@QS.add(
    "ts_decomposition_strength",
    "WITH "
    + _DECOMP_CTES
    + """,
    comp AS (
      SELECT d.day, d.trend_cents AS t, s.seasonal_cents AS se,
             d.detrended - s.seasonal_cents AS r
      FROM det d JOIN seas s ON d.dow = s.dow
    ),
    folds AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(r ORDER BY day)), (a, b) -> a + b) AS sr,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(r * r ORDER BY day)), (a, b) -> a + b) AS srr,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(se + r ORDER BY day)), (a, b) -> a + b) AS ssr,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list((se + r) * (se + r) ORDER BY day)), (a, b) -> a + b)
               AS ssrr,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(t + r ORDER BY day)), (a, b) -> a + b) AS str,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list((t + r) * (t + r) ORDER BY day)), (a, b) -> a + b)
               AS strr
      FROM comp
    )
    SELECT n,
           greatest(CAST(0 AS DOUBLE), CAST(1 AS DOUBLE)
             - (srr / CAST(n AS DOUBLE) - (sr / CAST(n AS DOUBLE))
                * (sr / CAST(n AS DOUBLE)))
             / (ssrr / CAST(n AS DOUBLE) - (ssr / CAST(n AS DOUBLE))
                * (ssr / CAST(n AS DOUBLE)))) AS f_seasonal,
           greatest(CAST(0 AS DOUBLE), CAST(1 AS DOUBLE)
             - (srr / CAST(n AS DOUBLE) - (sr / CAST(n AS DOUBLE))
                * (sr / CAST(n AS DOUBLE)))
             / (strr / CAST(n AS DOUBLE) - (str / CAST(n AS DOUBLE))
                * (str / CAST(n AS DOUBLE)))) AS f_trend
    FROM folds
    """,
    doc="[EXT] seasonal and trend STRENGTH of the classical "
    "decomposition (Hyndman & Athanasopoulos, FPP: F_S = max(0, 1 − "
    "Var(R)/Var(S+R)), F_T = max(0, 1 − Var(R)/Var(T+R))) — the two "
    "scalars that tell a forecasting pipeline whether to fit seasonal "
    "terms at all. Shares the decomposition CTE chain verbatim; each "
    "variance comes from a PAIR of pinned day-order folds (sum, "
    "sum-of-squares) finished by fixed divisions/multiplies, and "
    "greatest over bit-identical doubles is engine-portable — the "
    "whole row hash-gates.",
    tags=("temporal", "stats"),
)
def ts_decomposition_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    comp = ts_classical_decomposition(spark, sf_dir).select(
        "day",
        F.col("trend_cents").alias("t"),
        F.col("seasonal_cents").alias("se"),
        F.col("remainder_cents").alias("r"),
    )

    def fold(expr, alias):
        return F.aggregate(
            F.sort_array(F.collect_list(F.struct(F.col("day"), expr.alias("v")))),
            F.lit(0.0),
            lambda acc, x: acc + x["v"],
        ).alias(alias)

    folds = comp.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        fold(F.col("r"), "sr"),
        fold(F.col("r") * F.col("r"), "srr"),
        fold(F.col("se") + F.col("r"), "ssr"),
        fold((F.col("se") + F.col("r")) * (F.col("se") + F.col("r")), "ssrr"),
        fold(F.col("t") + F.col("r"), "str"),
        fold((F.col("t") + F.col("r")) * (F.col("t") + F.col("r")), "strr"),
    )
    nd = F.col("n").cast("double")
    var_r = F.col("srr") / nd - (F.col("sr") / nd) * (F.col("sr") / nd)
    var_sr = F.col("ssrr") / nd - (F.col("ssr") / nd) * (F.col("ssr") / nd)
    var_tr = F.col("strr") / nd - (F.col("str") / nd) * (F.col("str") / nd)
    return folds.select(
        "n",
        F.greatest(F.lit(0.0), F.lit(1.0) - var_r / var_sr).alias("f_seasonal"),
        F.greatest(F.lit(0.0), F.lit(1.0) - var_r / var_tr).alias("f_trend"),
    )
