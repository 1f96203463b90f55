"""Semantic invariants for the event-analytics family (plans/analytics.py).

The DuckDB oracle gate proves Spark==SQL; these tests pin the *meaning*:
funnel monotonicity, session-window disjointness, gap-fill density, hopping
multiplicity — properties a hash match alone wouldn't explain to a reader.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clinical_api_etl_spark.plans.registry import all_queries

SF = "/root/testdata/sf0.001"


def _run(spark, name):
    return all_queries()[name].builder(spark, SF)


@pytest.fixture(scope="module")
def events(spark):
    from clinical_api_etl_spark.sources.catalog import load

    return load(spark, SF, "events")


class TestFunnel:
    def test_stages_monotone_nonincreasing(self, spark):
        rows = {r["stage"]: r["users"] for r in _run(spark, "funnel_view_click_purchase").collect()}
        assert set(rows) == {"view", "view>click", "view>click>purchase"}
        assert rows["view"] >= rows["view>click"] >= rows["view>click>purchase"]
        assert rows["view"] > 0


class TestCohort:
    def test_offsets_nonnegative_and_cohort0_complete(self, spark, events):
        pdf = _run(spark, "cohort_weekly_retention").toPandas()
        assert (pdf["week_offset"] >= 0).all()
        # every user appears in their own cohort at offset 0
        per_cohort0 = pdf[pdf["week_offset"] == 0].set_index("cohort_week")["users"]
        n_users = events.select("user_id").distinct().count()
        assert per_cohort0.sum() == n_users


class TestSessionWindowNative:
    def test_sessions_disjoint_and_conserve_events(self, spark, events):
        pdf = (
            _run(spark, "w8_session_window_native")
            .orderBy("user_id", "session_start")
            .toPandas()
        )
        assert pdf["n_events"].sum() == events.count()
        for _, g in pdf.groupby("user_id"):
            starts = g["session_start"].tolist()
            ends = g["session_end"].tolist()
            # end = last event + gap; next session starts at or after the
            # previous window closed (otherwise they would have merged)
            for i in range(1, len(starts)):
                assert starts[i] >= ends[i - 1]

    def test_matches_lag_based_rewrite(self, spark, events):
        """session_window == lag/cumsum with new-session-at diff >= gap."""
        from pyspark.sql.window import Window as W

        w = W.partitionBy("user_id").orderBy("ts", "event_id")
        gap_us = 6 * 3600 * 1_000_000
        flag = F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
                >= gap_us
            ),
            1,
        ).otherwise(0)
        manual = (
            events.withColumn("f", flag)
            .withColumn(
                "sid",
                F.sum("f").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
            )
            .groupBy("user_id", "sid")
            .agg(
                F.min("ts").alias("session_start"),
                (F.max("ts") + F.expr("INTERVAL 6 HOURS")).alias("session_end"),
                F.count(F.lit(1)).alias("n_events"),
            )
            .drop("sid")
        )
        native = _run(spark, "w8_session_window_native").select(
            "user_id", "session_start", "session_end", "n_events"
        )
        assert native.exceptAll(manual).count() == 0
        assert manual.exceptAll(native).count() == 0


class TestHopping:
    def test_each_event_in_four_windows(self, spark, events):
        pdf = _run(spark, "w9_hopping_window_rates").toPandas()
        assert pdf["cnt"].sum() == 4 * events.count()


class TestGapfill:
    def test_dense_grid_and_count_conservation(self, spark, events):
        pdf = _run(spark, "w10_gapfill_hourly_series").toPandas()
        n_types = events.select("event_type").distinct().count()
        hours = sorted(pdf["hour_start"].unique())
        # contiguous hourly spine: every hour between min and max present
        assert len(pdf) == len(hours) * n_types
        for a, b in zip(hours, hours[1:]):
            assert (b - a).total_seconds() == 3600
        assert pdf["cnt"].sum() == events.count()


class TestLocf:
    def test_dense_per_user_and_fill_matches_pandas(self, spark, events):
        pdf = (
            _run(spark, "w11_locf_hourly_state")
            .orderBy("user_id", "hour_start")
            .toPandas()
        )
        # dense spine: per user, every hour between bounds exactly once
        for uid, g in pdf.groupby("user_id"):
            hrs = g["hour_start"].tolist()
            assert len(set(hrs)) == len(hrs)
            for a, b in zip(hrs, hrs[1:]):
                assert (b - a).total_seconds() == 3600
        # never null: spine starts at the user's first OBSERVED hour
        assert pdf["value_locf"].notna().all()
        # fill semantics vs a pandas replay for the busiest user
        import pandas as pd

        uid = pdf["user_id"].value_counts().idxmax()
        ev = (
            events.filter(F.col("user_id") == int(uid))
            .orderBy("ts", "event_id")
            .toPandas()
        )
        ev["hour"] = ev["ts"].dt.floor("h")
        last_per_hour = ev.groupby("hour")["value"].last()
        expected = (
            last_per_hour.reindex(
                pd.date_range(
                    last_per_hour.index.min(), last_per_hour.index.max(), freq="h"
                )
            )
            .ffill()
            .tolist()
        )
        got = pdf[pdf["user_id"] == uid]["value_locf"].tolist()
        assert got == expected


class TestVariant:
    def test_counts_cover_all_rows(self, spark, events):
        pdf = _run(spark, "v1_variant_props_stats").toPandas()
        assert pdf["n_k"].sum() == events.filter(F.col("props").isNotNull()).count()
        assert (pdf["min_k"] <= pdf["max_k"]).all()


class TestAnomaly:
    def test_outliers_match_float_zscore_off_boundary(self, spark, events):
        """Integer-exact flags == float z-score flags away from the exact
        boundary (the boundary is where float would be engine-dependent)."""
        pdf = _run(spark, "anomaly_zscore_outliers").toPandas().set_index("event_type")
        ev = events.select("event_type", "value").toPandas()
        for et, g in ev.groupby("event_type"):
            mu, sd = g["value"].mean(), g["value"].std(ddof=0)
            n_float = int((abs(g["value"] - mu) > 2 * sd).sum())
            n_exact = int(pdf.loc[et, "n_outliers"]) if et in pdf.index else 0
            assert abs(n_exact - n_float) <= 2  # only boundary rows may differ


class TestRollingDistinct:
    def test_window_equals_bruteforce(self, spark, events):
        import pandas as pd

        pdf = _run(spark, "w12_rolling_7d_distinct_users").toPandas()
        ev = events.select("ts", "user_id").toPandas()
        ev["d"] = ev["ts"].dt.floor("D")
        for _, row in pdf.sample(n=min(8, len(pdf)), random_state=0).iterrows():
            day = row["window_day"]
            lo = day - pd.Timedelta(days=6)
            expect = ev[(ev["d"] >= lo) & (ev["d"] <= day)]["user_id"].nunique()
            assert row["users_7d"] == expect


class TestProfile:
    def test_profile_matches_direct_aggregates(self, spark):
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        pdf = _run(spark, "profile_lineitem_columns").toPandas().set_index("col_name")
        assert (pdf["n_rows"] == li.count()).all()
        flag = pdf.loc["l_returnflag"]
        assert flag["n_distinct"] == li.select("l_returnflag").distinct().count()
        assert flag["n_nulls"] == li.filter(F.col("l_returnflag").isNull()).count()
        assert flag["min_val"] == li.agg(F.min("l_returnflag")).first()[0]


class TestHoltSmoothing:
    def test_matches_python_reference(self, spark):
        """The fold must replay the textbook recurrence exactly — pinned
        against an independent python implementation."""
        from clinical_api_etl_spark.plans.analytics import ts_holt_smoothing_daily

        sf = "/root/testdata/sf0.001"
        got = {r["event_type"]: r for r in ts_holt_smoothing_daily(spark, sf).collect()}

        ev = spark.read.parquet(f"{sf}/events.parquet")
        from clinical_api_etl_spark.sources.catalog import load as _load
        daily = (
            _load(spark, sf, "events")
            .selectExpr("event_type", "unix_millis(ts) div 86400000 AS d")
            .groupBy("event_type", "d")
            .count()
            .collect()
        )
        series: dict = {}
        for r in daily:
            series.setdefault(r["event_type"], []).append((r["d"], float(r["count"])))
        for et, pts in series.items():
            ys = [y for _, y in sorted(pts)]
            l, b, sse = ys[0], ys[1] - ys[0], 0.0
            for y in ys[1:]:
                err = y - (l + b)
                ln = 0.5 * y + 0.5 * (l + b)
                b = 0.25 * (ln - l) + 0.75 * b
                l = ln
                sse += err * err
            assert got[et]["level"] == l            # bit-exact, not approx
            assert got[et]["trend"] == b
            assert got[et]["sse"] == sse
            assert got[et]["n_days"] == len(ys)


class TestKalmanAndDrawdown:
    def test_kalman_matches_python_reference(self, spark):
        from clinical_api_etl_spark.plans.analytics import ts_kalman_local_level
        from clinical_api_etl_spark.sources.catalog import load as _load

        sf = "/root/testdata/sf0.001"
        got = {r["event_type"]: r for r in ts_kalman_local_level(spark, sf).collect()}
        daily = (
            _load(spark, sf, "events")
            .selectExpr("event_type", "unix_millis(ts) div 86400000 AS d")
            .groupBy("event_type", "d")
            .count()
            .collect()
        )
        series: dict = {}
        for r in daily:
            series.setdefault(r["event_type"], []).append((r["d"], float(r["count"])))
        Q, R = 4.0, 25.0
        for et, pts in series.items():
            ys = [y for _, y in sorted(pts)]
            x, p, ll2 = ys[0], 100.0, 0.0
            for y in ys[1:]:
                pq = p + Q
                k = pq / (pq + R)
                ll2 += (y - x) * (y - x) / (pq + R)
                x = x + k * (y - x)
                p = (1.0 - k) * pq
            assert got[et]["level"] == x
            assert got[et]["variance"] == p
            assert got[et]["innovation_score"] == ll2

    def test_drawdown_properties(self, spark):
        from clinical_api_etl_spark.plans.analytics import ts_max_drawdown_daily

        pdf = ts_max_drawdown_daily(spark, "/root/testdata/sf0.001").toPandas()
        assert (pdf["max_drawdown_cents"] >= 0).all()
        assert (pdf["peak_cents"] > 0).all()
        assert pdf["trough_day"].notna().all()


class TestRateLimitSimulation:
    def test_matches_python_reference(self, spark):
        from clinical_api_etl_spark.plans.analytics import ops_rate_limit_simulation
        from clinical_api_etl_spark.sources.catalog import load as _load

        sf = "/root/testdata/sf0.001"
        got = {r["user_id"]: r for r in ops_rate_limit_simulation(spark, sf).collect()}
        rows = (
            _load(spark, sf, "events")
            .selectExpr("user_id", "unix_micros(ts) AS us", "event_id")
            .collect()
        )
        per: dict = {}
        for r in rows:
            per.setdefault(r["user_id"], []).append((r["us"], r["event_id"]))
        CAP, COST = 5_000_000, 1_000_000
        for uid, evs in per.items():
            xs = [us for us, _ in sorted(evs)]
            t, last, a, rj = CAP - COST, xs[0], 1, 0
            for x in xs[1:]:
                t = min(t + (x - last) // 10, CAP)
                if t >= COST:
                    t -= COST
                    a += 1
                else:
                    rj += 1
                last = x
            g = got[uid]
            assert (g["admitted"], g["rejected"], g["tokens_left_micro"]) == (a, rj, t)
            assert g["admitted"] + g["rejected"] == g["n_events"]


class TestForecastMase:
    def test_matches_python_recurrence(self, spark):
        from clinical_api_etl_spark.plans.analytics import ts_forecast_mase
        from clinical_api_etl_spark.sources.catalog import load

        got = {r["event_type"]: r for r in ts_forecast_mase(spark, SF).collect()}
        daily = (
            load(spark, SF, "events")
            .selectExpr("event_type", "unix_millis(ts) div 86400000 AS d")
            .groupBy("event_type", "d")
            .count()
            .collect()
        )
        series: dict = {}
        for r in daily:
            series.setdefault(r["event_type"], []).append((r["d"], float(r["count"])))
        for et, pts in series.items():
            ys = [y for _, y in sorted(pts)]
            if len(ys) < 2:
                assert et not in got
                continue
            l, b = ys[0], ys[1] - ys[0]
            sae = nv = 0.0
            prev = ys[0]
            for y in ys[1:]:
                sae = sae + abs(y - (l + b))
                nv = nv + abs(y - prev)
                ln = 0.5 * y + 0.5 * (l + b)
                bn = 0.25 * (ln - l) + 0.75 * b
                l, b, prev = ln, bn, y
            g = got[et]
            assert g["n_days"] == len(ys)
            assert g["sae_model"] == sae
            assert g["sae_naive"] == nv
            assert g["mase"] == (sae / nv if nv > 0 else 0.0)
