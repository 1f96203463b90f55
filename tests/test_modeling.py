"""Round-11 modeling family: python-reference exact replays + invariants.

The sequential-recurrence queries (Holt-Winters, Wilder RSI) must replay
the textbook recurrence BIT-EXACTLY (same discipline as TestHoltSmoothing
in test_analytics.py); the bootstrap is checked for determinism and CI
ordering invariants.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from clinical_api_etl_spark.sources.catalog import load

SF = "/root/testdata/sf0.001"


def _daily_counts(spark, sf):
    daily = (
        load(spark, sf, "events")
        .selectExpr("event_type", "unix_millis(ts) div 86400000 AS d")
        .groupBy("event_type", "d")
        .count()
        .collect()
    )
    series: dict = {}
    for r in daily:
        series.setdefault(r["event_type"], []).append((r["d"], float(r["count"])))
    return {et: [y for _, y in sorted(pts)] for et, pts in series.items()}


def _daily_cents(spark, sf):
    daily = (
        load(spark, sf, "events")
        .filter(F.col("value").isNotNull())
        .selectExpr(
            "event_type",
            "unix_millis(ts) div 86400000 AS d",
            "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c",
        )
        .groupBy("event_type", "d")
        .agg(F.sum("c").alias("cents"))
        .collect()
    )
    series: dict = {}
    for r in daily:
        series.setdefault(r["event_type"], []).append((r["d"], float(r["cents"])))
    return {et: [y for _, y in sorted(pts)] for et, pts in series.items()}


class TestHoltWinters:
    def test_matches_python_reference(self, spark):
        from clinical_api_etl_spark.plans.modeling import ts_holt_winters_daily

        got = {r["event_type"]: r for r in ts_holt_winters_daily(spark, SF).collect()}
        for et, ys in _daily_counts(spark, SF).items():
            if len(ys) < 14:
                assert et not in got
                continue
            l = sum(ys[:7]) / 7.0
            b = (sum(ys[7:14]) - sum(ys[:7])) / 49.0
            s = [y - l for y in ys[:7]]
            sse = 0.0
            for y in ys[7:]:
                sc = s[0]
                err = y - (l + b + sc)
                ln = 0.5 * (y - sc) + 0.5 * (l + b)
                bn = 0.25 * (ln - l) + 0.75 * b
                sn = 0.25 * (y - ln) + 0.75 * sc
                sse += err * err
                l, b = ln, bn
                s = s[1:] + [sn]
            row = got[et]
            assert row["level"] == l  # bit-exact
            assert row["trend"] == b
            assert row["seasonal_next"] == s[0]
            assert row["forecast_1"] == l + b + s[0]
            assert row["sse"] == sse
            assert row["n_days"] == len(ys)

    def test_covers_all_types(self, spark):
        from clinical_api_etl_spark.plans.modeling import ts_holt_winters_daily

        n_types = load(spark, SF, "events").select("event_type").distinct().count()
        assert ts_holt_winters_daily(spark, SF).count() == n_types


class TestRsiWilder:
    def test_matches_python_reference(self, spark):
        from clinical_api_etl_spark.plans.modeling import ts_rsi_wilder_daily

        got = {r["event_type"]: r for r in ts_rsi_wilder_daily(spark, SF).collect()}
        for et, cs in _daily_cents(spark, SF).items():
            if len(cs) < 18:
                assert et not in got
                continue
            ds = [cs[i + 1] - cs[i] for i in range(len(cs) - 1)]
            g = sum(max(d, 0.0) for d in ds[:16]) / 16.0
            lo = sum(max(-d, 0.0) for d in ds[:16]) / 16.0
            for d in ds[16:]:
                g = g + (max(d, 0.0) - g) * 0.0625
                lo = lo + (max(-d, 0.0) - lo) * 0.0625
            row = got[et]
            assert row["avg_gain"] == g
            assert row["avg_loss"] == lo
            expect_rsi = 50.0 if g + lo == 0 else 100.0 * g / (g + lo)
            assert row["rsi"] == expect_rsi

    def test_rsi_bounded(self, spark):
        from clinical_api_etl_spark.plans.modeling import ts_rsi_wilder_daily

        for r in ts_rsi_wilder_daily(spark, SF).collect():
            assert 0.0 <= r["rsi"] <= 100.0
            assert r["avg_gain"] >= 0.0 and r["avg_loss"] >= 0.0


class TestBootstrapCi:
    def test_matches_python_reference(self, spark):
        from clinical_api_etl_spark.plans.modeling import (
            _BOOT_B,
            stat_bootstrap_ci_mean,
        )

        got = {r["event_type"]: r for r in stat_bootstrap_ci_mean(spark, SF).collect()}
        rows = (
            load(spark, SF, "events")
            .filter(F.col("value").isNotNull())
            .selectExpr(
                "event_type",
                "event_id",
                "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents",
            )
            .collect()
        )
        per: dict = {}
        for r in rows:
            per.setdefault(r["event_type"], []).append((r["event_id"], r["cents"]))
        for et, pts in per.items():
            n = len(pts)
            snum = sum(c for _, c in pts)
            means = []
            for b in range(_BOOT_B):
                num = den = 0
                for eid, c in pts:
                    w = int(hashlib.md5(f"{eid}:{b}".encode()).hexdigest()[:2], 16) % 3
                    num += w * c
                    den += w
                means.append(float(snum) / n if den == 0 else float(num) / den)
            means.sort()
            row = got[et]
            assert row["n"] == n
            assert row["mean_value"] == float(snum) / (100 * n)
            assert row["boot_lo"] == means[1] / 100.0
            assert row["boot_hi"] == means[_BOOT_B - 2] / 100.0

    def test_ci_brackets_mean(self, spark):
        from clinical_api_etl_spark.plans.modeling import stat_bootstrap_ci_mean

        for r in stat_bootstrap_ci_mean(spark, SF).collect():
            assert r["boot_lo"] <= r["boot_hi"]
            # multinomial-ish reweighting keeps replicas near the point
            # estimate; the CI must at least be in its neighborhood
            spread = max(abs(r["boot_hi"]), abs(r["boot_lo"]), 1.0)
            assert abs(r["mean_value"] - (r["boot_lo"] + r["boot_hi"]) / 2) <= spread
