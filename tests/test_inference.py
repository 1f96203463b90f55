"""Inference family: python replays of the exact-arithmetic statistics.

Every test recomputes the statistic from the raw sf0.001 parquet with
plain python/pandas (independent of both engines) and compares exactly —
the integer components must match to the bit, the float finishes to IEEE
equality.
"""

from __future__ import annotations

import math
import re

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_pdf():
    pdf = pd.read_parquet(f"{SF}/events.parquet")
    pdf = pdf[pdf["value"].notna()].copy()
    # Exact cents: value ships with 2 decimals.
    pdf["cents"] = (pdf["value"] * 100).round().astype("int64")
    return pdf


def _doubled_rank_sums(xs_a: list[int], xs_b: list[int]) -> tuple[int, int]:
    """(2*R_a, tie_adj) with midranks over the merged sample, exactly."""
    merged = sorted([(x, 0) for x in xs_a] + [(x, 1) for x in xs_b])
    r_a2 = 0
    tie = 0
    i = 0
    while i < len(merged):
        j = i
        while j < len(merged) and merged[j][0] == merged[i][0]:
            j += 1
        t = j - i
        dar = (i + 1) + (j)  # 2 * avg of ranks i+1..j
        r_a2 += dar * sum(1 for k in range(i, j) if merged[k][1] == 0)
        tie += t * t * t - t
        i = j
    return r_a2, tie


class TestMannWhitney:
    def test_matches_python_replay(self, spark, events_pdf):
        from clinical_api_etl_spark.plans.inference import stat_mannwhitney_pairs

        got = {
            (r.ga, r.gb): r for r in stat_mannwhitney_pairs(spark, SF).collect()
        }
        groups = {
            g: sorted(sub["cents"]) for g, sub in events_pdf.groupby("event_type")
        }
        names = sorted(groups)
        assert set(got) == {(a, b) for a in names for b in names if a < b}
        for (a, b), row in got.items():
            xa, xb = groups[a], groups[b]
            r_a2, tie = _doubled_rank_sums(xa, xb)
            u_a2 = r_a2 - len(xa) * (len(xa) + 1)
            assert row.n_a == len(xa) and row.n_b == len(xb)
            assert row.u_a_x2 == u_a2, (a, b)
            assert row.u_b_x2 == 2 * len(xa) * len(xb) - u_a2
            assert row.tie_adj == tie

    def test_u_sum_invariant(self, spark):
        from clinical_api_etl_spark.plans.inference import stat_mannwhitney_pairs

        for r in stat_mannwhitney_pairs(spark, SF).collect():
            assert r.u_a_x2 + r.u_b_x2 == 2 * r.n_a * r.n_b
            assert 0 <= r.u_a_x2 <= 2 * r.n_a * r.n_b


class TestKolmogorovSmirnov:
    def test_matches_python_replay(self, spark, events_pdf):
        from clinical_api_etl_spark.plans.inference import stat_ks_pairs

        got = {(r.ga, r.gb): r for r in stat_ks_pairs(spark, SF).collect()}
        groups = {
            g: sorted(sub["cents"]) for g, sub in events_pdf.groupby("event_type")
        }
        for (a, b), row in got.items():
            xa, xb = groups[a], groups[b]
            na, nb = len(xa), len(xb)
            values = sorted(set(xa) | set(xb))
            d_num = 0
            ca = cb = 0
            ia = ib = 0
            for v in values:
                while ia < na and xa[ia] <= v:
                    ia += 1
                while ib < nb and xb[ib] <= v:
                    ib += 1
                ca, cb = ia, ib
                d_num = max(d_num, abs(ca * nb - cb * na))
            assert (row.n_a, row.n_b) == (na, nb)
            assert row.d_num == d_num
            assert row.d == d_num / (na * nb)

    def test_d_bounds(self, spark):
        from clinical_api_etl_spark.plans.inference import stat_ks_pairs

        for r in stat_ks_pairs(spark, SF).collect():
            assert 0.0 <= r.d <= 1.0


class TestMannKendall:
    def test_matches_python_replay(self, spark, events_pdf):
        from clinical_api_etl_spark.plans.inference import stat_mannkendall_trend

        got = {
            r.event_type: r for r in stat_mannkendall_trend(spark, SF).collect()
        }
        pdf = events_pdf.copy()
        pdf["h"] = pdf["ts"].astype("datetime64[us]").astype("int64") // (
            3600 * 10**6
        )
        for g, sub in pdf.groupby("event_type"):
            series = sub.groupby("h")["cents"].sum().sort_index().tolist()
            n = len(series)
            conc = sum(
                1
                for i in range(n)
                for j in range(i + 1, n)
                if series[j] > series[i]
            )
            disc = sum(
                1
                for i in range(n)
                for j in range(i + 1, n)
                if series[j] < series[i]
            )
            row = got[g]
            assert row.n == n
            assert (row.concordant, row.discordant) == (conc, disc)
            assert row.s_stat == conc - disc


class TestLMFamiliarity:
    def test_matches_python_replay(self, spark):
        from clinical_api_etl_spark.plans.inference import text_lm_familiarity

        docs = pd.read_parquet(f"{SF}/documents.parquet")
        tri: dict[tuple[str, str, str], int] = {}
        occ: dict[int, list[tuple[str, str, str]]] = {}
        for doc_id, text in zip(docs["doc_id"], docs["text"]):
            toks = re.split(r"\s+", str(text).strip().lower())
            ks = [
                (toks[i], toks[i + 1], toks[i + 2]) for i in range(len(toks) - 2)
            ]
            occ[int(doc_id)] = ks
            for k in ks:
                tri[k] = tri.get(k, 0) + 1
        ctx: dict[tuple[str, str], int] = {}
        for (w1, w2, _), c in tri.items():
            ctx[(w1, w2)] = ctx.get((w1, w2), 0) + c
        got = {
            r.doc_id: (r.n_trigrams, r.sum_ppm, r.mean_ppm)
            for r in text_lm_familiarity(spark, SF).collect()
        }
        for doc_id, ks in occ.items():
            if not ks:
                assert doc_id not in got
                continue
            ppms = [tri[k] * 1000000 // ctx[k[:2]] for k in ks]
            assert got[doc_id] == (
                len(ppms),
                sum(ppms),
                sum(ppms) // len(ppms),
            )


class TestWelch:
    def test_matches_python_replay(self, spark, events_pdf):
        from clinical_api_etl_spark.plans.inference import stat_welch_ttest_pairs

        got = {(r.ga, r.gb): r for r in stat_welch_ttest_pairs(spark, SF).collect()}
        stats = {
            g: (len(s), int(s["cents"].sum()), int((s["cents"] ** 2).sum()))
            for g, s in events_pdf.groupby("event_type")
        }
        for (a, b), row in got.items():
            na, sxa, sxxa = stats[a]
            nb, sxb, sxxb = stats[b]
            ssq_a = na * sxxa - sxa * sxa
            ssq_b = nb * sxxb - sxb * sxb
            assert (row.ssq_a, row.ssq_b) == (ssq_a, ssq_b)
            t = (sxa / na - sxb / nb) / math.sqrt(
                ssq_a / (na * na * (na - 1)) + ssq_b / (nb * nb * (nb - 1))
            )
            # Same IEEE op sequence -> exact equality expected.
            assert row.t_welch == pytest.approx(t, rel=1e-12)


class TestAutocorr:
    def test_matches_python_replay(self, spark, events_pdf):
        from clinical_api_etl_spark.plans.inference import stat_autocorr_lag1

        got = {r.event_type: r for r in stat_autocorr_lag1(spark, SF).collect()}
        pdf = events_pdf.copy()
        pdf["h"] = pdf["ts"].astype("datetime64[us]").astype("int64") // (
            3600 * 10**6
        )
        for g, sub in pdf.groupby("event_type"):
            hourly = sub.groupby("h")["cents"].sum().sort_index()
            hs = hourly.index.tolist()
            pairs = [
                (int(hourly.iloc[i]), int(hourly.iloc[i + 1]))
                for i in range(len(hs) - 1)
                if hs[i + 1] - hs[i] == 1
            ]
            n = len(pairs)
            sx = sum(x for x, _ in pairs)
            sy = sum(y for _, y in pairs)
            sxy = sum(x * y for x, y in pairs)
            sxx = sum(x * x for x, _ in pairs)
            syy = sum(y * y for _, y in pairs)
            row = got[g]
            assert row.n == n
            assert row.num == n * sxy - sx * sy
            assert row.den_x == n * sxx - sx * sx
            assert row.den_y == n * syy - sy * sy
            assert -1.0 <= row.r <= 1.0


class TestEwma:
    def test_matches_python_replay(self, spark, events_pdf):
        from clinical_api_etl_spark.plans.inference import w15_ewma_dyadic

        out = w15_ewma_dyadic(spark, SF).toPandas().set_index("event_id")
        assert len(out) == len(events_pdf)
        for uid, sub in list(events_pdf.groupby("user_id"))[:20]:
            seq = sub.sort_values(["ts", "event_id"])
            xs = seq["cents"].tolist()
            ids = seq["event_id"].tolist()
            for pos, eid in enumerate(ids):
                num = den = 0
                for i in range(8):
                    if pos - i >= 0:
                        w = 1 << (7 - i)
                        num += xs[pos - i] * w
                        den += w
                row = out.loc[eid]
                assert (row["num"], row["den"]) == (num, den)
                assert row["ewma"] == num / den

    def test_full_window_den_is_255(self, spark):
        from clinical_api_etl_spark.plans.inference import w15_ewma_dyadic

        pdf = w15_ewma_dyadic(spark, SF).toPandas()
        assert set(pdf["den"]).issubset(
            {sum(1 << (7 - i) for i in range(k)) for k in range(1, 9)}
        )
        assert (pdf["den"] == 255).any()


class TestLateral:
    def test_equals_window_rewrite(self, spark):
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from clinical_api_etl_spark.plans.inference import sql_lateral_topn
        from clinical_api_etl_spark.sources.catalog import load

        got = {
            (r.n_name, r.custkey, r.c_name, r.c_acctbal)
            for r in sql_lateral_topn(spark, SF).collect()
        }
        cust = load(spark, SF, "customer")
        nation = load(spark, SF, "nation")
        w = Window.partitionBy("c_nationkey").orderBy(
            F.col("c_acctbal").desc(), F.col("c_custkey")
        )
        manual = {
            (r.n_name, r.custkey, r.c_name, r.c_acctbal)
            for r in cust.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 2)
            .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
            .select(
                "n_name", F.col("c_custkey").alias("custkey"), "c_name", "c_acctbal"
            )
            .collect()
        }
        assert got == manual and len(got) > 0


class TestTrigramLM:
    def test_matches_python_replay(self, spark):
        from clinical_api_etl_spark.plans.inference import text_trigram_lm

        docs = pd.read_parquet(f"{SF}/documents.parquet")
        tri: dict[tuple[str, str, str], int] = {}
        for text in docs["text"]:
            toks = re.split(r"\s+", str(text).strip().lower())
            for i in range(len(toks) - 2):
                k = (toks[i], toks[i + 1], toks[i + 2])
                tri[k] = tri.get(k, 0) + 1
        ctx: dict[tuple[str, str], int] = {}
        for (w1, w2, _), c in tri.items():
            ctx[(w1, w2)] = ctx.get((w1, w2), 0) + c
        expect = {
            k: (c, ctx[k[:2]], c * 1000000 // ctx[k[:2]])
            for k, c in tri.items()
            if c >= 2
        }
        got = {
            (r.w1, r.w2, r.w3): (r.c3, r.c2, r.cond_ppm)
            for r in text_trigram_lm(spark, SF).collect()
        }
        assert got == expect

    def test_conditional_probability_bounds(self, spark):
        from clinical_api_etl_spark.plans.inference import text_trigram_lm

        for r in text_trigram_lm(spark, SF).collect():
            assert 0 < r.cond_ppm <= 1000000
            assert r.c3 <= r.c2


class TestKendallTau:
    def test_matches_python_replay(self, spark, events_pdf):
        from clinical_api_etl_spark.plans.inference import stat_kendall_tau_hourly

        got = {
            r.event_type: r for r in stat_kendall_tau_hourly(spark, SF).collect()
        }
        pdf = events_pdf.copy()
        pdf["h"] = pdf["ts"].astype("datetime64[us]").astype("int64") // (
            3600 * 10**6
        )
        for g, sub in pdf.groupby("event_type"):
            series = sub.groupby("h")["cents"].sum().sort_index().tolist()
            n = len(series)
            s = sum(
                (1 if series[j] > series[i] else -1 if series[j] < series[i] else 0)
                for i in range(n)
                for j in range(i + 1, n)
            )
            n0 = n * (n - 1) // 2
            ties: dict[int, int] = {}
            for v in series:
                ties[v] = ties.get(v, 0) + 1
            n2 = sum(t * (t - 1) // 2 for t in ties.values())
            row = got[g]
            assert (row.n, row.s_stat, row.n0, row.n2) == (n, s, n0, n2)
            assert row.tau_b == s / math.sqrt(n0 * (n0 - n2))
            assert -1.0 <= row.tau_b <= 1.0


class TestGroupByAll:
    def test_inferred_keys_match_explicit(self, spark):
        from pyspark.sql import functions as F

        from clinical_api_etl_spark.plans.inference import sql_group_by_all
        from clinical_api_etl_spark.sources.catalog import load

        got = {
            (r.event_type, r.day_idx): (r.n, r.cents)
            for r in sql_group_by_all(spark, SF).collect()
        }
        ev = load(spark, SF, "events").filter(F.col("value").isNotNull())
        manual = {
            (r.event_type, r.day_idx): (r.n, r.cents)
            for r in ev.groupBy(
                "event_type",
                F.expr("CAST(unix_millis(ts) div 86400000 AS BIGINT)").alias(
                    "day_idx"
                ),
            )
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum((F.col("value").cast("decimal(18,2)") * 100).cast("long"))
                .cast("long")
                .alias("cents"),
            )
            .collect()
        }
        assert got == manual


class TestPcaGate:
    def test_matches_numpy_replay(self, spark):
        import numpy as np

        from clinical_api_etl_spark.plans.inference import emb_pca_gate

        row = emb_pca_gate(spark, SF).collect()[0]
        emb = pd.read_parquet(f"{SF}/embeddings.parquet")
        x = np.floor(
            np.stack(emb["embedding"].to_numpy()).astype(np.float64) * 1e6 + 0.5
        ).astype(np.int64)
        n = x.shape[0]
        sx = x.sum(axis=0)
        var_units = n * (x * x).sum(axis=0) - sx * sx
        assert row.n == n
        assert row.axis_var_units == int(var_units.max())
        assert row.best_axis == int(var_units.argmax())
        assert row.pc1_ge_axis is True


class TestProportionZ:
    def test_matches_python_replay(self, spark):
        from clinical_api_etl_spark.plans.inference import (
            stat_proportion_ztest_pairs,
        )

        pdf = pd.read_parquet(f"{SF}/events.parquet")
        pdf["day"] = pdf["ts"].astype("datetime64[us]").astype("int64") // (
            86400 * 10**6
        )
        pdf["hit"] = (pdf["day"] % 7).isin([5, 6]).astype(int)
        stats = {
            g: (len(s), int(s["hit"].sum()))
            for g, s in pdf.groupby("event_type")
        }
        got = {
            (r.ga, r.gb): r
            for r in stat_proportion_ztest_pairs(spark, SF).collect()
        }
        for (a, b), row in got.items():
            na, ka = stats[a]
            nb, kb = stats[b]
            assert (row.n_a, row.k_a, row.n_b, row.k_b) == (na, ka, nb, kb)
            big_n, big_k = na + nb, ka + kb
            z = (ka / na - kb / nb) / math.sqrt(
                (big_k * (big_n - big_k)) / (big_n * na * nb)
            )
            assert row.z == pytest.approx(z, rel=1e-12)


class TestBenford:
    def test_matches_python_replay(self, spark):
        from clinical_api_etl_spark.plans.inference import (
            _BENFORD_PPM,
            stat_benford_first_digit,
        )

        pdf = pd.read_parquet(f"{SF}/events.parquet")
        pdf = pdf[pdf["value"] > 0]
        cents = (pdf["value"] * 100).round().astype("int64")
        counts: dict[int, int] = {}
        for c in cents:
            d = int(str(c)[0])
            counts[d] = counts.get(d, 0) + 1
        total = sum(counts.values())
        got = {r.d: r for r in stat_benford_first_digit(spark, SF).collect()}
        assert set(got) == set(counts)
        for d, n in counts.items():
            row = got[d]
            obs = n * 1000000 // total
            assert (row.n, row.observed_ppm) == (n, obs)
            assert row.benford_ppm == _BENFORD_PPM[d]
            assert row.abs_dev_ppm == abs(obs - _BENFORD_PPM[d])

    def test_benford_table_is_log_table(self):
        import math

        from clinical_api_etl_spark.plans.inference import _BENFORD_PPM

        for d, p in _BENFORD_PPM.items():
            assert p == math.floor(math.log10(1 + 1 / d) * 1e6)
        assert abs(sum(_BENFORD_PPM.values()) - 1000000) < 10


class TestEntityResolution:
    def test_matches_python_union_find(self, spark):
        from clinical_api_etl_spark.plans.inference import er_resolve_customers

        cust = pd.read_parquet(f"{SF}/customer.parquet")
        names = dict(zip(cust["c_custkey"], cust["c_name"]))

        def lev1(a: str, b: str) -> bool:
            if a == b:
                return True
            la, lb = len(a), len(b)
            if abs(la - lb) > 1:
                return False
            if la == lb:
                return sum(x != y for x, y in zip(a, b)) <= 1
            if la > lb:
                a, b, la, lb = b, a, lb, la
            i = j = diff = 0
            while i < la and j < lb:
                if a[i] == b[j]:
                    i += 1
                    j += 1
                else:
                    diff += 1
                    if diff > 1:
                        return False
                    j += 1
            return True

        parent = {k: k for k in names}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        keys = sorted(names)
        for i, a in enumerate(keys):
            for b in keys[i + 1 :]:
                if lev1(names[a], names[b]):
                    ra, rb = find(a), find(b)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
        expect_cluster = {k: find(k) for k in keys}
        sizes: dict[int, int] = {}
        for c in expect_cluster.values():
            sizes[c] = sizes.get(c, 0) + 1
        got = {
            r.custkey: (r.canonical, r.cluster_size)
            for r in er_resolve_customers(spark, SF).collect()
        }
        assert got == {
            k: (c, sizes[c]) for k, c in expect_cluster.items()
        }

    def test_invariants(self, spark):
        from clinical_api_etl_spark.plans.inference import er_resolve_customers

        rows = er_resolve_customers(spark, SF).collect()
        by_cluster: dict[int, list[int]] = {}
        for r in rows:
            by_cluster.setdefault(r.canonical, []).append(r.custkey)
        for canon, members in by_cluster.items():
            assert canon == min(members)  # canonical = min member
        assert len(rows) == len({r.custkey for r in rows})  # total function


class TestFrequentTrigrams:
    def test_matches_python_replay(self, spark, events_pdf):
        from clinical_api_etl_spark.plans.inference import seq_frequent_trigrams

        pdf = pd.read_parquet(f"{SF}/events.parquet")
        counts: dict[tuple[str, str, str], int] = {}
        for _, sub in pdf.groupby("user_id"):
            seq = sub.sort_values(["ts", "event_id"])["event_type"].tolist()
            for i in range(len(seq) - 2):
                k = (seq[i], seq[i + 1], seq[i + 2])
                counts[k] = counts.get(k, 0) + 1
        expect = {k: n for k, n in counts.items() if n >= 5}
        got = {
            (r.e1, r.e2, r.e3): r.n
            for r in seq_frequent_trigrams(spark, SF).collect()
        }
        assert got == expect


# ---------------------------------------------------------------------------
# Hypothesis property gates: the histogram rank machinery equals the
# direct python definitions on arbitrary small samples (ties, skewed
# group sizes, negative values — shapes the fixed corpus can't cover).
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_samples = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),
        st.integers(min_value=-50, max_value=50),
    ),
    min_size=4,
    max_size=60,
).filter(lambda xs: len({g for g, _ in xs}) >= 2)


class TestRankStatProperties:
    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(xs=_samples)
    def test_mannwhitney_equals_definition(self, spark, xs):
        from clinical_api_etl_spark.plans.inference import (
            mannwhitney_from_samples,
        )

        t = spark.createDataFrame(xs, "g string, x long")
        got = {(r.ga, r.gb): r for r in mannwhitney_from_samples(t).collect()}
        groups: dict[str, list[int]] = {}
        for g, x in xs:
            groups.setdefault(g, []).append(x)
        names = sorted(groups)
        assert set(got) == {
            (a, b) for a in names for b in names if a < b
        }
        for (a, b), row in got.items():
            xa, xb = sorted(groups[a]), sorted(groups[b])
            r_a2, tie = _doubled_rank_sums(xa, xb)
            u_a2 = r_a2 - len(xa) * (len(xa) + 1)
            assert (row.n_a, row.n_b) == (len(xa), len(xb))
            assert row.u_a_x2 == u_a2
            assert row.u_b_x2 == 2 * len(xa) * len(xb) - u_a2
            assert row.tie_adj == tie

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(xs=_samples)
    def test_ks_equals_definition(self, spark, xs):
        from clinical_api_etl_spark.plans.inference import ks_from_samples

        t = spark.createDataFrame(xs, "g string, x long")
        got = {(r.ga, r.gb): r for r in ks_from_samples(t).collect()}
        groups: dict[str, list[int]] = {}
        for g, x in xs:
            groups.setdefault(g, []).append(x)
        for (a, b), row in got.items():
            xa, xb = sorted(groups[a]), sorted(groups[b])
            na, nb = len(xa), len(xb)
            d_num = 0
            for v in sorted(set(xa) | set(xb)):
                ca = sum(1 for x in xa if x <= v)
                cb = sum(1 for x in xb if x <= v)
                d_num = max(d_num, abs(ca * nb - cb * na))
            assert (row.n_a, row.n_b, row.d_num) == (na, nb, d_num)


class TestRunsTest:
    def test_matches_python_replay(self, spark, events_pdf):
        from clinical_api_etl_spark.plans.inference import stat_runs_test_hourly

        got = {
            r.event_type: r for r in stat_runs_test_hourly(spark, SF).collect()
        }
        pdf = events_pdf.copy()
        pdf["h"] = pdf["ts"].astype("datetime64[us]").astype("int64") // (
            3600 * 10**6
        )
        for g, sub in pdf.groupby("event_type"):
            series = sub.groupby("h")["cents"].sum().sort_index().tolist()
            signs = []
            for a, b in zip(series, series[1:]):
                if b > a:
                    signs.append(1)
                elif b < a:
                    signs.append(-1)
            n_up = signs.count(1)
            n_down = signs.count(-1)
            n_runs = sum(
                1
                for i, sgn in enumerate(signs)
                if i == 0 or sgn != signs[i - 1]
            )
            row = got[g]
            assert (row.n_up, row.n_down, row.n_runs) == (n_up, n_down, n_runs)
            big_n = n_up + n_down
            mean = 1.0 + (2 * n_up * n_down) / big_n
            var = (2 * n_up * n_down * (2 * n_up * n_down - big_n)) / (
                big_n * big_n * (big_n - 1)
            )
            assert row.z == pytest.approx(
                (n_runs - mean) / math.sqrt(var), rel=1e-12
            )


class TestKneserNey:
    def test_matches_python_replay(self, spark):
        from clinical_api_etl_spark.plans.inference import text_trigram_kn

        docs = pd.read_parquet(f"{SF}/documents.parquet")
        tri: dict[tuple[str, str, str], int] = {}
        for text in docs["text"]:
            toks = re.split(r"\s+", str(text).strip().lower())
            for i in range(len(toks) - 2):
                k = (toks[i], toks[i + 1], toks[i + 2])
                tri[k] = tri.get(k, 0) + 1
        ctx_c2: dict[tuple[str, str], int] = {}
        ctx_n1: dict[tuple[str, str], int] = {}
        cont: dict[str, int] = {}
        for (w1, w2, w3), c in tri.items():
            ctx_c2[(w1, w2)] = ctx_c2.get((w1, w2), 0) + c
            ctx_n1[(w1, w2)] = ctx_n1.get((w1, w2), 0) + 1
            cont[w3] = cont.get(w3, 0) + 1
        n_types = len(tri)
        got = {
            (r.w1, r.w2, r.w3): (
                r.c3,
                r.c2,
                r.n1plus,
                r.cont_w3,
                r.p_kn_ppm,
            )
            for r in text_trigram_kn(spark, SF).collect()
        }
        expect = {}
        for k, c3 in tri.items():
            if c3 < 2:
                continue
            c2 = ctx_c2[k[:2]]
            n1 = ctx_n1[k[:2]]
            cw = cont[k[2]]
            p = (4 * c3 - 3) * 1000000 // (4 * c2) + 3 * n1 * (
                cw * 1000000 // n_types
            ) // (4 * c2)
            expect[k] = (c3, c2, n1, cw, p)
        assert got == expect

    def test_probability_mass_sane(self, spark):
        from clinical_api_etl_spark.plans.inference import text_trigram_kn

        pdf = text_trigram_kn(spark, SF).toPandas()
        assert (pdf["p_kn_ppm"] > 0).all()
        assert (pdf["p_kn_ppm"] <= 1000000).all()
        # Discounting shifts mass to the back-off: a c3==c2 singleton
        # context would get < 1.0; per-context sums stay <= 1e6.
        sums = pdf.groupby(["w1", "w2"])["p_kn_ppm"].sum()
        assert (sums <= 1000000).all()


class TestCumulativeDistinct:
    def test_matches_python_replay(self, spark):
        from clinical_api_etl_spark.plans.inference import (
            w16_cumulative_distinct_types,
        )

        pdf = pd.read_parquet(f"{SF}/events.parquet")
        out = {
            r.event_id: r.distinct_types_so_far
            for r in w16_cumulative_distinct_types(spark, SF).collect()
        }
        for _, sub in pdf.groupby("user_id"):
            seen: set = set()
            for _, row in sub.sort_values(["ts", "event_id"]).iterrows():
                seen.add(row["event_type"])
                assert out[row["event_id"]] == len(seen)

    def test_single_exchange_plan(self, spark):
        from clinical_api_etl_spark.plans.inference import (
            w16_cumulative_distinct_types,
        )

        plan = (
            w16_cumulative_distinct_types(spark, SF)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Exchange") == 1


class TestVideoSceneCuts:
    def test_matches_python_replay(self, spark):
        import hashlib

        from clinical_api_etl_spark.plans.inference import mm_video_scene_cuts

        docs = pd.read_parquet(f"{SF}/documents.parquet")
        got = {
            (r.doc_id, r.frame_idx): (r.l1_dist, r.is_cut)
            for r in mm_video_scene_cuts(spark, SF).collect()
        }
        expect = {}
        for doc_id in docs["doc_id"]:
            nf = 4 + int(doc_id) % 3
            frames = [
                hashlib.md5(f"vf{f}:{int(doc_id)}".encode()).digest()
                for f in range(nf)
            ]
            for i in range(nf - 1):
                d = sum(
                    abs(frames[i + 1][k] - frames[i][k]) for k in range(16)
                )
                expect[(int(doc_id), i)] = (d, d > 2000)
        assert got == expect

    def test_ragged_frame_counts(self, spark):
        from clinical_api_etl_spark.plans.inference import mm_video_scene_cuts

        pdf = mm_video_scene_cuts(spark, SF).toPandas()
        per_doc = pdf.groupby("doc_id")["frame_idx"].count()
        # 4 + doc_id % 3 frames -> 3..5 pairs per doc.
        assert set(per_doc.unique()) == {3, 4, 5}
        assert pdf["is_cut"].any() and (~pdf["is_cut"]).any()


class TestImageTileStats:
    def test_matches_python_replay(self, spark):
        import hashlib

        from clinical_api_etl_spark.plans.inference import mm_image_tile_stats

        docs = pd.read_parquet(f"{SF}/documents.parquet")
        got = {
            (r.doc_id, r.tile_idx): (r.n_px, r.sum_px, r.sum_sq, r.h_edges)
            for r in mm_image_tile_stats(spark, SF).collect()
        }
        expect = {}
        for doc_id in docs["doc_id"]:
            raw = b"".join(
                hashlib.md5(f"im{c}:{int(doc_id)}".encode()).digest()
                for c in range(4)
            )
            img = [[raw[r * 8 + c] for c in range(8)] for r in range(8)]
            for tr in range(2):
                for tc in range(2):
                    px = [
                        img[r][c]
                        for r in range(tr * 4, tr * 4 + 4)
                        for c in range(tc * 4, tc * 4 + 4)
                    ]
                    edges = sum(
                        1
                        for r in range(tr * 4, tr * 4 + 4)
                        for c in range(tc * 4, tc * 4 + 3)
                        if abs(img[r][c + 1] - img[r][c]) > 64
                    )
                    expect[(int(doc_id), tr * 2 + tc)] = (
                        16,
                        sum(px),
                        sum(v * v for v in px),
                        edges,
                    )
        assert got == expect


class TestGroupedMode:
    def test_matches_python_replay(self, spark, events_pdf):
        from clinical_api_etl_spark.plans.inference import agg_mode_per_type

        got = {
            r.event_type: (r.mode_cents, r.mode_count)
            for r in agg_mode_per_type(spark, SF).collect()
        }
        for g, sub in events_pdf.groupby("event_type"):
            counts: dict[int, int] = {}
            for c in sub["cents"]:
                counts[int(c)] = counts.get(int(c), 0) + 1
            best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
            assert got[g] == best


class TestCurationScorecard:
    def test_verdict_consistent_with_components(self, spark):
        from clinical_api_etl_spark.plans.inference import mm_curation_scorecard

        rows = mm_curation_scorecard(spark, SF).collect()
        assert len(rows) == 500
        kept = sum(1 for r in rows if r.keep)
        assert 0 < kept < len(rows)  # thresholds split the corpus
        for r in rows:
            expect = (
                r.n_tokens >= 10
                and r.audio_energy >= 10_000_000_000
                and r.video_cuts == 0
                and r.img_edges >= 20
            )
            assert r.keep == expect

    def test_components_match_kernel_aggregates(self, spark):
        from pyspark.sql import functions as F

        from clinical_api_etl_spark.operators.multimodal import (
            image_tile_stats,
            synth_image,
        )
        from clinical_api_etl_spark.plans.inference import mm_curation_scorecard
        from clinical_api_etl_spark.sources.catalog import load

        card = {
            r.doc_id: r.img_edges
            for r in mm_curation_scorecard(spark, SF).collect()
        }
        direct = {
            r.doc_id: r.e
            for r in image_tile_stats(
                synth_image(load(spark, SF, "documents").select("doc_id"))
            )
            .groupBy("doc_id")
            .agg(F.sum("h_edges").alias("e"))
            .collect()
        }
        assert card == direct


class TestHashedFeatures:
    def test_matches_python_replay(self, spark):
        import hashlib

        from clinical_api_etl_spark.plans.inference import text_hashed_features

        docs = pd.read_parquet(f"{SF}/documents.parquet")
        expect: dict[tuple[int, int], int] = {}
        for doc_id, text in zip(docs["doc_id"], docs["text"]):
            for tok in re.split(r"\s+", str(text).strip().lower()):
                b = int(hashlib.md5(tok.encode()).hexdigest()[:4], 16) % 256
                expect[(int(doc_id), b)] = expect.get((int(doc_id), b), 0) + 1
        got = {
            (r.doc_id, r.bucket): r.n
            for r in text_hashed_features(spark, SF).collect()
        }
        assert got == expect

    def test_merge_across_shards(self, spark):
        # Stateless featurizer: features of a doc set == merged features of
        # its shards (bucket counts are additive).
        from pyspark.sql import functions as F

        from clinical_api_etl_spark.plans.inference import text_hashed_features

        full = text_hashed_features(spark, SF)
        total = full.agg(F.sum("n")).collect()[0][0]
        docs = pd.read_parquet(f"{SF}/documents.parquet")
        n_tokens = sum(
            len(re.split(r"\s+", str(t).strip().lower())) for t in docs["text"]
        )
        assert total == n_tokens


class TestSessionPaths:
    def test_matches_python_replay(self, spark):
        from clinical_api_etl_spark.plans.inference import (
            session_entry_exit_paths,
        )

        pdf = pd.read_parquet(f"{SF}/events.parquet")
        counts: dict[tuple[str, str], int] = {}
        for _, sub in pdf.groupby("user_id"):
            sub = sub.sort_values(["ts", "event_id"])
            ts_us = sub["ts"].astype("datetime64[us]").astype("int64").tolist()
            types = sub["event_type"].tolist()
            start = 0
            for i in range(1, len(ts_us) + 1):
                if (
                    i == len(ts_us)
                    or ts_us[i] - ts_us[i - 1] > 21600000 * 1000
                ):
                    key = (types[start], types[i - 1])
                    counts[key] = counts.get(key, 0) + 1
                    start = i
        got = {
            (r.entry_type, r.exit_type): r.n_sessions
            for r in session_entry_exit_paths(spark, SF).collect()
        }
        assert got == counts


class TestTukeySummary:
    def test_matches_python_replay(self, spark, events_pdf):
        from clinical_api_etl_spark.plans.inference import stat_tukey_summary

        got = {r.event_type: r for r in stat_tukey_summary(spark, SF).collect()}
        for g, sub in events_pdf.groupby("event_type"):
            xs = sorted(int(c) for c in sub["cents"])
            n = len(xs)

            def med2(vals):
                k = len(vals)
                return vals[(k + 1) // 2 - 1] + vals[(k + 2) // 2 - 1]

            m = (n + 1) // 2
            q1 = med2(xs[:m])
            med = med2(xs)
            q3 = med2(xs[n - m :])
            lo4 = 2 * q1 - 3 * (q3 - q1)
            hi4 = 2 * q3 + 3 * (q3 - q1)
            outliers = sum(1 for x in xs if 4 * x < lo4 or 4 * x > hi4)
            row = got[g]
            assert (row.n, row.min_c, row.max_c) == (n, xs[0], xs[-1])
            assert (row.q1_x2, row.med_x2, row.q3_x2) == (q1, med, q3)
            assert row.n_outliers == outliers

    def test_order_invariants(self, spark):
        from clinical_api_etl_spark.plans.inference import stat_tukey_summary

        for r in stat_tukey_summary(spark, SF).collect():
            assert 2 * r.min_c <= r.q1_x2 <= r.med_x2 <= r.q3_x2 <= 2 * r.max_c
            assert 0 <= r.n_outliers < r.n


class TestCrossCorrelation:
    def test_matches_python_replay(self, spark, events_pdf):
        from clinical_api_etl_spark.plans.inference import stat_crosscorr_lags

        pdf = events_pdf.copy()
        pdf["h"] = pdf["ts"].astype("datetime64[us]").astype("int64") // (
            3600 * 10**6
        )
        series = {
            g: dict(sub.groupby("h")["cents"].sum())
            for g, sub in pdf.groupby("event_type")
        }
        got = {r.lag: r for r in stat_crosscorr_lags(spark, SF).collect()}
        assert set(got) == set(range(-3, 4))
        for lag in range(-3, 4):
            pairs = [
                (int(x), int(series["purchase"][h + lag]))
                for h, x in series["click"].items()
                if h + lag in series["purchase"]
            ]
            n = len(pairs)
            sx = sum(x for x, _ in pairs)
            sy = sum(y for _, y in pairs)
            sxy = sum(x * y for x, y in pairs)
            sxx = sum(x * x for x, _ in pairs)
            syy = sum(y * y for _, y in pairs)
            row = got[lag]
            assert row.n == n
            assert row.num == n * sxy - sx * sy
            assert (row.den_x, row.den_y) == (
                n * sxx - sx * sx,
                n * syy - sy * sy,
            )
            assert -1.0 <= row.r <= 1.0


class TestFreshnessLag:
    def test_matches_python_replay(self, spark):
        from clinical_api_etl_spark.plans.inference import dq_freshness_lag

        pdf = pd.read_parquet(f"{SF}/events.parquet")
        gmax = pdf["ts"].max()
        got = {r.event_type: r for r in dq_freshness_lag(spark, SF).collect()}
        for g, sub in pdf.groupby("event_type"):
            last = sub["ts"].max()
            lag_ms = (
                gmax.to_datetime64().astype("datetime64[ms]").astype("int64")
                - last.to_datetime64().astype("datetime64[ms]").astype("int64")
            )
            row = got[g]
            assert row.n == len(sub)
            assert row.lag_ms == int(lag_ms)
        assert min(r.lag_ms for r in got.values()) == 0  # some type IS the watermark


class TestAssortativity:
    def test_matches_python_replay(self, spark):
        from clinical_api_etl_spark.plans.inference import graph_assortativity

        li = pd.read_parquet(f"{SF}/lineitem.parquet")[
            ["l_orderkey", "l_partkey"]
        ]
        pair_counts: dict[tuple[int, int], int] = {}
        for _, sub in li.groupby("l_orderkey"):
            # The query joins lineitem ROWS (u < v), so same-part repeats
            # within an order contribute multiplicity; replicate exactly.
            rows = sub["l_partkey"].tolist()
            for i in range(len(rows)):
                for j in range(len(rows)):
                    u, v = rows[i], rows[j]
                    if u < v:
                        pair_counts[(u, v)] = pair_counts.get((u, v), 0) + 1
        edges = [k for k, c in pair_counts.items() if c >= 2]
        sym = edges + [(v, u) for u, v in edges]
        deg: dict[int, int] = {}
        for u, _ in sym:
            deg[u] = deg.get(u, 0) + 1
        xy = [(deg[u], deg[v]) for u, v in sym]
        n = len(xy)
        sx = sum(x for x, _ in xy)
        sy = sum(y for _, y in xy)
        sxy = sum(x * y for x, y in xy)
        sxx = sum(x * x for x, _ in xy)
        syy = sum(y * y for _, y in xy)
        row = graph_assortativity(spark, SF).collect()[0]
        assert row.n == n
        assert row.num == n * sxy - sx * sy
        assert (row.den_x, row.den_y) == (n * sxx - sx * sx, n * syy - sy * sy)
        # Symmetrized edge list => x/y marginals identical.
        assert row.den_x == row.den_y
        assert -1.0 <= row.r <= 1.0


class TestAcfDaily:
    def test_matches_python_replay_on_synthetic_series(self, spark, tmp_path):
        """Bitwise replay of the declared op sequence: n-scaled centered
        values, pinned day-order folds, one division — incl. a gap day
        that must pair with nothing."""
        import datetime
        import struct

        from clinical_api_etl_spark.plans.inference import ts_acf_daily

        base = datetime.datetime(2024, 1, 1, 12, 0, 0)
        days = [0, 1, 2, 3, 5, 6, 7, 8, 9, 10]  # gap at day 4
        vals = [10.25, 11.50, 9.75, 12.00, 8.25, 13.10, 10.00, 9.90, 12.35, 11.05]
        rows = [
            (i, base + datetime.timedelta(days=d), 1, "t0", v, None)
            for i, (d, v) in enumerate(zip(days, vals))
        ]
        df = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        )
        d = tmp_path / "acf"
        df.write.parquet(str(d / "events.parquet"))
        got = {
            (r["event_type"], r["lag"]): r
            for r in ts_acf_daily(spark, str(d)).collect()
        }

        cents = [round(v * 100) for v in vals]
        epoch = [
            int((base + datetime.timedelta(days=dd)).timestamp() * 1000) // 86400000
            for dd in days
        ]
        n, tot = len(cents), sum(cents)
        c = [n * x - tot for x in cents]
        den = 0.0
        for ci in c:  # pinned day order
            den += float(ci) * float(ci)
        for k in range(1, 8):
            num, pairs = 0.0, 0
            for i in range(n - k):
                if epoch[i + k] - epoch[i] == k:
                    num += float(c[i]) * float(c[i + k])
                    pairs += 1
            if pairs == 0:
                assert ("t0", k) not in got
                continue
            r = got[("t0", k)]
            assert (r["n_days"], r["n_pairs"]) == (n, pairs)
            assert struct.pack("<d", r["acf"]) == struct.pack("<d", num / den)
