"""Round-15 additions: python replays + planted-structure tests for the
new stats (Cochran-Armitage, Mantel-Haenszel, seasonal Mann-Kendall),
ML evals (Cohen's kappa, average precision, lift/gains deciles), graph
topology (rich club, knn(k) curve, condensation DAG layers).

Same discipline as test_inference.py: integer components must match a
pure-python recomputation from the raw sf0.001 parquet to the bit; float
finishes to IEEE equality (they are single divisions / fixed trees over
exactly-converted ints)."""

from __future__ import annotations

import math

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
_DAY_MS = 86_400_000


@pytest.fixture(scope="module")
def li_pdf():
    return pd.read_parquet(f"{SF}/lineitem.parquet")


@pytest.fixture(scope="module")
def orders_pdf():
    return pd.read_parquet(f"{SF}/orders.parquet")


class TestCochranArmitage:
    def test_matches_python_replay(self, spark, li_pdf):
        from clinical_api_etl_spark.plans.inference import (
            stat_cochran_armitage_trend,
        )

        row = stat_cochran_armitage_trend(spark, SF).collect()[0]
        dose = {}
        for q, rf in zip(li_pdf["l_quantity"], li_pdf["l_returnflag"]):
            s = min(4, (int(q) - 1) // 10)
            n_i, r_i = dose.get(s, (0, 0))
            dose[s] = (n_i + 1, r_i + (1 if rf == "R" else 0))
        n = sum(v[0] for v in dose.values())
        r = sum(v[1] for v in dose.values())
        sr = sum(s * v[1] for s, v in dose.items())
        sn = sum(s * v[0] for s, v in dose.items())
        ssn = sum(s * s * v[0] for s, v in dose.items())
        t_num = n * sr - r * sn
        d1, d2 = r * (n - r), n * ssn - sn * sn
        assert row.n_total == n and row.n_returns == r
        assert row.k_doses == len(dose)
        assert row.t_num == t_num and row.d1 == d1 and row.d2 == d2
        z = float(t_num) / math.sqrt(float(d1) * float(d2) / float(n))
        assert row.z_trend == z

    def test_planted_trend_and_null(self, spark):
        from clinical_api_etl_spark.plans.inference import (
            cochran_armitage_from_dose,
        )

        # Monotone dose-response: success rate rises 10% -> 50%.
        rising = spark.createDataFrame(
            [(s, 1000, 100 + 100 * s) for s in range(5)],
            "s long, n_i long, r_i long",
        )
        z = cochran_armitage_from_dose(rising).collect()[0].z_trend
        assert z > 10
        # Exactly flat rates: T' = 0 by construction.
        flat = spark.createDataFrame(
            [(s, 1000, 300) for s in range(5)], "s long, n_i long, r_i long"
        )
        row = cochran_armitage_from_dose(flat).collect()[0]
        assert row.t_num == 0 and row.z_trend == 0.0


class TestMantelHaenszel:
    def test_matches_python_replay(self, spark, li_pdf, orders_pdf):
        from clinical_api_etl_spark.plans.inference import stat_mantel_haenszel

        row = stat_mantel_haenszel(spark, SF).collect()[0]
        j = li_pdf.merge(
            orders_pdf[["o_orderkey", "o_orderpriority"]],
            left_on="l_orderkey",
            right_on="o_orderkey",
        )
        cells = {}
        for strat, disc, rf in zip(
            j["o_orderpriority"], j["l_discount"], j["l_returnflag"]
        ):
            a, b, c, d = cells.get(strat, (0, 0, 0, 0))
            exp, ret = disc > 0.05, rf == "R"
            if exp and ret:
                a += 1
            elif exp:
                b += 1
            elif ret:
                c += 1
            else:
                d += 1
            cells[strat] = (a, b, c, d)
        assert row.k_strata == len(cells)
        assert row.sum_a == sum(v[0] for v in cells.values())
        s_ad = s_bc = s_e = s_v = 0.0
        for strat in sorted(cells):  # the pinned fold order
            a, b, c, d = cells[strat]
            n = a + b + c + d
            s_ad += float(a * d) / float(n)
            s_bc += float(b * c) / float(n)
            s_e += float((a + b) * (a + c)) / float(n)
            s_v += (float((a + b) * (c + d)) / float(n * (n - 1))) * (
                float((a + c) * (b + d)) / float(n)
            )
        assert row.sum_ad_n == s_ad and row.sum_bc_n == s_bc
        assert row.sum_e_a == s_e and row.sum_v_a == s_v
        assert row.or_mh == s_ad / s_bc
        diff = float(row.sum_a) - s_e
        assert row.cmh_chi2 == diff * diff / s_v

    def test_simpsons_paradox_planted(self, spark):
        from clinical_api_etl_spark.plans.inference import (
            mantel_haenszel_from_cells,
        )

        # Berkeley-style reversal: within each stratum the exposure is
        # protective (OR < 1), but exposure concentrates in the
        # high-outcome stratum, so the CRUDE pooled OR exceeds 1.
        cells = [
            ("dept_a", 480, 420, 60, 40),  # exposed mostly here, high rate
            ("dept_b", 20, 180, 150, 850),  # unexposed mostly here, low rate
        ]
        a = sum(r[1] for r in cells)
        b = sum(r[2] for r in cells)
        c = sum(r[3] for r in cells)
        d = sum(r[4] for r in cells)
        crude_or = (a * d) / (b * c)
        assert crude_or > 1  # the confounded estimate
        df = spark.createDataFrame(
            cells, "stratum string, a long, b long, c long, d long"
        )
        row = mantel_haenszel_from_cells(df).collect()[0]
        # Stratified estimate recovers the protective per-stratum truth.
        per_stratum_ors = [(r[1] * r[4]) / (r[2] * r[3]) for r in cells]
        assert all(o < 1 for o in per_stratum_ors)
        assert row.or_mh < 1 < crude_or


class TestSeasonalMannKendall:
    @staticmethod
    def _replay(daily: dict[tuple[str, int], tuple[int, int]]):
        """daily: (event_type, day) -> (season, s)."""
        out = {}
        by_et: dict[str, list[tuple[int, int, int]]] = {}
        for (et, d), (se, s) in daily.items():
            by_et.setdefault(et, []).append((d, se, s))
        for et, rows in by_et.items():
            s_stat = 0
            for i, (da, sa_se, sa) in enumerate(rows):
                for db, sb_se, sb in rows[i + 1 :]:
                    if sa_se != sb_se:
                        continue
                    lo, hi = (sa, sb) if da < db else (sb, sa)
                    s_stat += (hi > lo) - (hi < lo)
            var18 = 0
            for se in {r[1] for r in rows}:
                vals = [r[2] for r in rows if r[1] == se]
                n = len(vals)
                var18 += n * (n - 1) * (2 * n + 5)
                for v in set(vals):
                    t = vals.count(v)
                    if t > 1:
                        var18 -= t * (t - 1) * (2 * t + 5)
            out[et] = (len(rows), s_stat, var18)
        return out

    def test_matches_python_replay(self, spark):
        from clinical_api_etl_spark.plans.inference import (
            stat_seasonal_mannkendall,
        )

        pdf = pd.read_parquet(f"{SF}/events.parquet")
        pdf = pdf[pdf["value"].notna()].copy()
        pdf["cents"] = (pdf["value"] * 100).round().astype("int64")
        pdf["d"] = pdf["ts"].astype("datetime64[us]").astype("int64") // (
            _DAY_MS * 1000
        )
        daily = {}
        g = pdf.groupby(["event_type", "d"])["cents"].sum()
        for (et, d), s in g.items():
            daily[(et, int(d))] = (int(d) % 7, int(s))
        want = self._replay(daily)
        got = {r.event_type: r for r in stat_seasonal_mannkendall(spark, SF).collect()}
        assert set(got) == set(want)
        for et, (n_days, s_stat, var18) in want.items():
            row = got[et]
            assert row.n_days == n_days
            assert row.s_stat == s_stat
            assert row.var18 == var18
            if var18 == 0:
                assert row.z_sk is None
            elif s_stat > 0:
                assert row.z_sk == (s_stat - 1) / math.sqrt(var18 / 18.0)
            elif s_stat < 0:
                assert row.z_sk == (s_stat + 1) / math.sqrt(var18 / 18.0)
            else:
                assert row.z_sk == 0.0

    def test_pure_seasonality_is_null_trend(self, spark):
        from clinical_api_etl_spark.plans.inference import seasonal_mk_from_daily

        # Value depends ONLY on the weekday: every within-season pair
        # ties, so S = 0 — the statistic is immune to weekly cycles
        # that inflate plain MK.
        rows = [("a", d, d % 7, 100 * (d % 7)) for d in range(70)]
        df = spark.createDataFrame(rows, "event_type string, d long, season long, s long")
        row = seasonal_mk_from_daily(df).collect()[0]
        assert row.s_stat == 0
        # Tie correction zeroes the variance entirely (all values tie
        # within every season) -> degenerate NULL, never NaN.
        assert row.var18 == 0 and row.z_sk is None

    def test_monotone_trend_detected(self, spark):
        from clinical_api_etl_spark.plans.inference import seasonal_mk_from_daily

        rows = [("a", d, d % 7, d) for d in range(70)]
        df = spark.createDataFrame(rows, "event_type string, d long, season long, s long")
        row = seasonal_mk_from_daily(df).collect()[0]
        # Strictly rising: every within-season pair concordant.
        assert row.s_stat == 7 * (10 * 9 // 2)
        assert row.z_sk > 3


class TestCohenKappa:
    def test_matches_confusion_replay(self, spark):
        from clinical_api_etl_spark.plans.ranking.evals import (
            ml_cohen_kappa,
            ml_naive_bayes_lang,
        )

        conf = ml_naive_bayes_lang(spark, SF).collect()
        s = sum(r.n for r in conf)
        c = sum(r.n for r in conf if r.actual == r.predicted)
        t_k: dict[str, int] = {}
        p_k: dict[str, int] = {}
        for r in conf:
            t_k[r.actual] = t_k.get(r.actual, 0) + r.n
            p_k[r.predicted] = p_k.get(r.predicted, 0) + r.n
        ptsum = sum(p_k.get(k, 0) * t_k.get(k, 0) for k in set(t_k) | set(p_k))
        row = ml_cohen_kappa(spark, SF).collect()[0]
        assert row.n_total == s and row.n_correct == c
        assert row.kappa_num == s * c - ptsum
        assert row.kappa_den == s * s - ptsum
        assert row.kappa == (s * c - ptsum) / (s * s - ptsum)


class TestAveragePrecision:
    def test_bounds_and_perfect_iff_top5(self, spark):
        from clinical_api_etl_spark.plans.ranking.evals import (
            eval_average_precision,
        )

        rows = eval_average_precision(spark, SF).collect()
        assert rows  # every query doc has candidates
        for r in rows:
            assert 0.0 < r.ap <= 1.0
            assert r.last_rel_rank >= 5
            # AP == 1 exactly when all 5 relevant docs occupy the top 5.
            assert (r.ap == 1.0) == (r.last_rel_rank == 5)


class TestLiftGains:
    def test_invariants_and_replay(self, spark):
        from clinical_api_etl_spark.plans.modeling import ml_lift_gains_deciles

        docs = pd.read_parquet(f"{SF}/documents.parquet")
        n = len(docs)
        p = int((docs["lang"] == "en").sum())
        rows = sorted(
            ml_lift_gains_deciles(spark, SF).collect(), key=lambda r: r.decile
        )
        assert [r.decile for r in rows] == list(range(10))
        assert sum(r.n_d for r in rows) == n
        assert sum(r.pos_d for r in rows) == p
        assert rows[-1].cum_pos == p
        sizes = [r.n_d for r in rows]
        assert max(sizes) - min(sizes) <= 1  # floor-div decile law
        cum = 0
        for r in rows:
            cum += r.pos_d
            assert r.cum_pos == cum
            assert r.lift == float(r.pos_d * n) / float(r.n_d * p)
            assert r.cum_gain == float(cum) / float(p)


class TestRichClub:
    def test_monotone_and_replay(self, spark):
        from clinical_api_etl_spark.plans.ranking.graphrank import graph_rich_club

        rows = sorted(graph_rich_club(spark, SF).collect(), key=lambda r: r.k)
        assert [r.k for r in rows] == [1, 2, 4, 8, 16, 32]
        for prev, cur in zip(rows, rows[1:]):
            assert cur.n_k <= prev.n_k and cur.e_k <= prev.e_k
        for r in rows:
            if r.n_k < 2:
                assert r.phi is None
            else:
                assert r.phi == float(2 * r.e_k) / float(r.n_k * (r.n_k - 1))
                assert 0.0 <= r.phi <= 1.0


class TestAvgNeighborDegree:
    def test_identities(self, spark):
        from clinical_api_etl_spark.plans.ranking.graphrank import (
            graph_avg_neighbor_degree,
            graph_degree_assortativity,
        )

        rows = graph_avg_neighbor_degree(spark, SF).collect()
        asrt = graph_degree_assortativity(spark, SF).collect()[0]
        # Sum over degree classes of the neighbor-degree mass equals the
        # assortativity query's s1 = sum of j over the edge join (the two
        # queries share the sym x deg x deg join, transposed).
        assert sum(r.sum_nbr_deg for r in rows) == asrt.s1
        assert sum(r.degree * r.n_nodes for r in rows) == asrt.m
        for r in rows:
            assert r.knn == float(r.sum_nbr_deg) / float(r.degree * r.n_nodes)
            assert r.knn >= 1.0


class TestDagLayers:
    def test_planted_dag(self, spark):
        from clinical_api_etl_spark.operators.graph import dag_layers

        nodes = spark.createDataFrame(
            [(x,) for x in "abcdefg"], "scc_id string"
        )
        edges = spark.createDataFrame(
            [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("e", "f")],
            "a string, b string",
        )
        got = {r.scc_id: r.layer for r in dag_layers(nodes, edges).collect()}
        assert got == {"a": 0, "b": 1, "c": 1, "d": 2, "e": 0, "f": 1, "g": 0}

    def test_longest_path_not_shortest(self, spark):
        from clinical_api_etl_spark.operators.graph import dag_layers

        # d is reachable in 1 hop from a but its LONGEST chain is 3.
        nodes = spark.createDataFrame([(x,) for x in "abcd"], "scc_id string")
        edges = spark.createDataFrame(
            [("a", "d"), ("a", "b"), ("b", "c"), ("c", "d")],
            "a string, b string",
        )
        got = {r.scc_id: r.layer for r in dag_layers(nodes, edges).collect()}
        assert got == {"a": 0, "b": 1, "c": 2, "d": 3}

    def test_cycle_raises(self, spark):
        from clinical_api_etl_spark.operators.graph import dag_layers

        nodes = spark.createDataFrame([("a",), ("b",)], "scc_id string")
        edges = spark.createDataFrame(
            [("a", "b"), ("b", "a")], "a string, b string"
        )
        with pytest.raises(ValueError, match="cycle"):
            dag_layers(nodes, edges).collect()

    def test_condensation_layers_end_to_end(self, spark):
        from clinical_api_etl_spark.plans.mining import graph_condensation_layers

        rows = graph_condensation_layers(spark, SF).collect()
        assert rows
        layers = {r.layer for r in rows}
        assert 0 in layers  # at least one source layer
        # Every scc appears exactly once.
        ids = [r.scc_id for r in rows]
        assert len(ids) == len(set(ids))


class TestRocPoints:
    def test_monotone_endpoints_and_auc_identity(self, spark):
        from clinical_api_etl_spark.plans.modeling import (
            ml_auc_nchars_lang,
            ml_roc_points,
        )

        pts = sorted(
            ml_roc_points(spark, SF).collect(), key=lambda r: -r.threshold
        )
        docs = pd.read_parquet(f"{SF}/documents.parquet")
        p = int((docs["lang"] == "en").sum())
        nn = len(docs) - p
        # Cumulative counts are nondecreasing as the threshold drops and
        # end at the totals.
        for prev, cur in zip(pts, pts[1:]):
            assert cur.tp >= prev.tp and cur.fp >= prev.fp
        assert pts[-1].tp == p and pts[-1].fp == nn
        for r in pts:
            assert r.tpr == r.tp / p and r.fpr == r.fp / nn
        # EXACT identity: the midrank AUC's U2 statistic equals the
        # doubled trapezoidal area over these points, in integers:
        # u2 = sum_blocks (tp_prev + tp) * (fp - fp_prev).
        auc_row = ml_auc_nchars_lang(spark, SF).collect()[0]
        u2 = 0
        tp_prev = fp_prev = 0
        for r in pts:
            u2 += (tp_prev + r.tp) * (r.fp - fp_prev)
            tp_prev, fp_prev = r.tp, r.fp
        assert u2 == auc_row.u2_stat

    def test_ks_is_max_of_roc_gap(self, spark):
        from clinical_api_etl_spark.plans.modeling import (
            ml_ks_separation,
            ml_roc_points,
        )

        pts = ml_roc_points(spark, SF).collect()
        docs = pd.read_parquet(f"{SF}/documents.parquet")
        p = int((docs["lang"] == "en").sum())
        nn = len(docs) - p
        best = max(abs(r.tp * nn - r.fp * p) for r in pts)
        thr = min(r.threshold for r in pts if abs(r.tp * nn - r.fp * p) == best)
        row = ml_ks_separation(spark, SF).collect()[0]
        assert row.ks_num == best and row.threshold == thr
        assert row.n_pos == p and row.n_neg == nn
        assert row.ks == best / (p * nn)
        assert 0.0 <= row.ks <= 1.0


class TestQualityFunnel:
    def test_matches_python_replay(self, spark):
        import re as _re

        from clinical_api_etl_spark.plans.extensions import corpus_quality_funnel

        docs = pd.read_parquet(f"{SF}/documents.parquet")
        want_docs = [0] * 6
        want_toks = [0] * 6
        for text, n_chars in zip(docs["text"], docs["n_chars"]):
            if text is None or (isinstance(text, float) and pd.isna(text)):
                toks = None
                flags = [True, False, False, False, False, False]
            else:
                tl = _re.split(r"\s+", text.strip().lower())
                toks = len(tl)
                f1 = len(text.strip()) > 0
                f2 = n_chars >= 100
                f3 = toks >= 20
                f4 = 10 * len(set(tl)) >= 3 * toks
                f5 = max(len(t) for t in tl) <= 40
                flags = [
                    True,
                    f1,
                    f1 and f2,
                    f1 and f2 and f3,
                    f1 and f2 and f3 and f4,
                    f1 and f2 and f3 and f4 and f5,
                ]
            for i, ok in enumerate(flags):
                if ok:
                    want_docs[i] += 1
                    want_toks[i] += toks or 0
        rows = sorted(corpus_quality_funnel(spark, SF).collect(), key=lambda r: r.stage)
        assert [r.n_docs for r in rows] == want_docs
        assert [r.n_tokens for r in rows] == want_toks
        for prev, cur in zip(rows, rows[1:]):
            assert cur.n_docs <= prev.n_docs and cur.n_tokens <= prev.n_tokens
        for r in rows:
            assert r.retained == r.n_docs / want_docs[0]


class TestReachableSet:
    def test_planted_chain_and_seeds(self, spark):
        from clinical_api_etl_spark.operators.graph import reachable_set

        edges = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("d", "c")], "src string, dst string"
        )
        seeds = spark.createDataFrame([("a",)], "node string")
        got = {r.node for r in reachable_set(edges, seeds).collect()}
        assert got == {"a", "b", "c"}
        seeds_c = spark.createDataFrame([("c",)], "node string")
        assert {r.node for r in reachable_set(edges, seeds_c).collect()} == {"c"}


class TestBowtieRegions:
    def test_region_partition_and_core(self, spark):
        from clinical_api_etl_spark.plans.mining import (
            graph_bowtie_regions,
            graph_scc_components,
        )

        regions = graph_bowtie_regions(spark, SF).collect()
        sccs = graph_scc_components(spark, SF).collect()
        assert len(regions) == len(sccs)  # every node labeled once
        allowed = {"core", "out", "in", "other"}
        assert {r.region for r in regions} <= allowed
        # Core region == the largest SCC (min-id tiebreak).
        from collections import Counter

        comp_sizes = Counter(r.scc_id for r in sccs)
        giant_size = max(comp_sizes.values())
        giant_id = min(i for i, c in comp_sizes.items() if c == giant_size)
        core_nodes = {r.node for r in regions if r.region == "core"}
        want_core = {r.node for r in sccs if r.scc_id == giant_id}
        assert core_nodes == want_core


class TestCohensD:
    def test_matches_python_replay(self, spark):
        from clinical_api_etl_spark.plans.inference import stat_cohens_d_pairs

        pdf = pd.read_parquet(f"{SF}/events.parquet")
        pdf = pdf[pdf["value"].notna()].copy()
        pdf["cents"] = (pdf["value"] * 100).round().astype("int64")
        grp = {
            et: (
                len(sub),
                int(sub["cents"].sum()),
                int((sub["cents"].astype(object) ** 2).sum()),
            )
            for et, sub in pdf.groupby("event_type")
        }
        got = {(r.ga, r.gb): r for r in stat_cohens_d_pairs(spark, SF).collect()}
        names = sorted(grp)
        assert set(got) == {(a, b) for a in names for b in names if a < b}
        for (ga, gb), row in got.items():
            na, sa, qa = grp[ga]
            nb, sb, qb = grp[gb]
            assert (row.n_a, row.s_a, row.q_a) == (na, sa, qa)
            assert (row.n_b, row.s_b, row.q_b) == (nb, sb, qb)
            mean_diff = sa / na - sb / nb
            pooled = math.sqrt(
                ((qa - float(sa) * float(sa) / na) + (qb - float(sb) * float(sb) / nb))
                / (na + nb - 2)
            )
            d = mean_diff / pooled
            assert row.cohens_d == d
            j = 1.0 - 3.0 / float(4 * (na + nb - 2) - 1)
            assert row.hedges_g == j * d


class TestJonckheereTerpstra:
    def test_matches_python_replay(self, spark, li_pdf):
        import numpy as np

        from clinical_api_etl_spark.plans.inference import stat_jonckheere_trend

        row = stat_jonckheere_trend(spark, SF).collect()[0]
        cents = (li_pdf["l_extendedprice"] * 100).round().astype("int64")
        dose = np.minimum(4, (li_pdf["l_quantity"].astype("int64") - 1) // 10)
        groups = [np.sort(cents[dose == g].to_numpy()) for g in range(5)]
        j2 = 0
        for g in range(5):
            for h in range(g + 1, 5):
                lo = np.searchsorted(groups[g], groups[h], side="left")
                hi = np.searchsorted(groups[g], groups[h], side="right")
                j2 += int(2 * lo.sum() + (hi - lo).sum())
        assert row.j2 == j2
        ns = [len(g_) for g_ in groups]
        n = sum(ns)
        assert row.n_total == n
        assert row.mean4 == n * n - sum(x * x for x in ns)
        pooled = np.concatenate(groups)
        _, t_counts = np.unique(pooled, return_counts=True)
        at_ = sum(int(t) * (int(t) - 1) * (2 * int(t) + 5) for t in t_counts)
        bt = sum(int(t) * (int(t) - 1) * (int(t) - 2) for t in t_counts)
        ct = sum(int(t) * (int(t) - 1) for t in t_counts)
        ag = sum(x * (x - 1) * (2 * x + 5) for x in ns)
        assert row.a_comp == n * (n - 1) * (2 * n + 5) - ag - at_
        assert row.bg == sum(x * (x - 1) * (x - 2) for x in ns)
        assert row.bt == bt
        assert row.cg == sum(x * (x - 1) for x in ns)
        assert row.ct == ct
        var = (
            float(row.a_comp) / 72.0
            + (float(row.bg) * float(bt)) / (36.0 * float(n * (n - 1) * (n - 2)))
            + (float(row.cg) * float(ct)) / (8.0 * float(n * (n - 1)))
        )
        assert row.z_jt == float(2 * j2 - row.mean4) / (4.0 * math.sqrt(var))

    def test_planted_monotone_and_null(self, spark):
        from clinical_api_etl_spark.plans.inference import jonckheere_from_rows

        # Strictly separated groups: every cross-pair concordant, so
        # J2 = 2 * sum_{g<h} n_g n_h = mean4 * 2 -> z > 0 and maximal.
        rows = [(g, 1000 * g + i) for g in range(5) for i in range(30)]
        df = spark.createDataFrame(rows, "g long, v long")
        r = jonckheere_from_rows(df).collect()[0]
        n_pairs = sum(30 * 30 for g in range(5) for h in range(g + 1, 5))
        assert r.j2 == 2 * n_pairs
        assert r.z_jt > 5
        # Identical distributions across groups (all values equal):
        # every cross pair is a tie, J2 == mean4 exactly -> z == 0.
        flat = [(g, 7) for g in range(5) for _ in range(30)]
        df2 = spark.createDataFrame(flat, "g long, v long")
        r2 = jonckheere_from_rows(df2).collect()[0]
        assert 2 * r2.j2 == r2.mean4  # ties contribute exactly half weight
        # Fully degenerate: the tie-corrected variance is exactly 0, so
        # z is NULL (never NaN / no ANSI divide-by-zero).
        assert r2.z_jt is None


class TestLearningCurve:
    def test_monotone_train_size_and_consistency(self, spark):
        from clinical_api_etl_spark.plans.modeling import ml_learning_curve

        rows = sorted(
            ml_learning_curve(spark, SF).collect(), key=lambda r: r.bucket_limit
        )
        assert [r.bucket_limit for r in rows] == [16, 32, 64, 128]
        # Nested hash buckets: training sets grow monotonically.
        for prev, cur in zip(rows, rows[1:]):
            assert cur.n_train > prev.n_train
        # Same fixed holdout for every fraction.
        assert len({r.n_holdout for r in rows}) == 1
        for r in rows:
            assert 0.0 < r.train_accuracy <= 1.0
            assert r.holdout_accuracy == r.n_correct / r.n_holdout

    def test_full_pool_stump_matches_direct_refit(self, spark):
        """The bucket_limit=128 row must equal a stump trained directly
        on the b<128 half -- a python replay of threshold selection."""
        from clinical_api_etl_spark.plans.modeling import ml_learning_curve

        import hashlib

        docs = pd.read_parquet(f"{SF}/documents.parquet")
        b = docs["doc_id"].map(
            lambda i: int(hashlib.md5(str(i).encode()).hexdigest()[:2], 16)
        )
        train = docs[b < 128]
        hold = docs[b >= 128]
        hist = {}
        for v, en in zip(train["n_chars"], train["lang"] == "en"):
            c, p = hist.get(v, (0, 0))
            hist[v] = (c + 1, p + int(en))
        vs = sorted(hist)
        n = sum(c for c, _ in hist.values())
        p = sum(q for _, q in hist.values())
        best = None
        n_l = pos_l = 0
        for v in vs:
            c, q = hist[v]
            n_l += c
            pos_l += q
            if n - n_l <= 0:
                continue
            pur = (pos_l**2 + (n_l - pos_l) ** 2) / n_l + (
                (p - pos_l) ** 2 + ((n - n_l) - (p - pos_l)) ** 2
            ) / (n - n_l)
            key = (-pur, v)
            if best is None or key < best[0]:
                best = (key, v, n_l, pos_l)
        _, t, n_l, pos_l = best
        pl = pos_l * 2 > n_l
        pr = (p - pos_l) * 2 > (n - n_l)
        correct = sum(
            int(en) if (v <= t and pl) or (v > t and pr) else int(not en)
            for v, en in zip(hold["n_chars"], hold["lang"] == "en")
        )
        row = {r.bucket_limit: r for r in ml_learning_curve(spark, SF).collect()}[128]
        assert row.threshold == t
        assert row.n_train == n
        assert row.n_correct == correct


class TestDedupSurvivorship:
    def test_conservation_and_component_consistency(self, spark):
        from clinical_api_etl_spark.plans.extensions import (
            dedup_components,
            dedup_survivorship_by_source,
        )

        rows = dedup_survivorship_by_source(spark, SF).collect()
        docs = pd.read_parquet(f"{SF}/documents.parquet")
        assert sum(r.n_docs for r in rows) == len(docs)
        comp = dedup_components(spark, SF).collect()
        from collections import Counter

        comp_sizes = Counter(r.component for r in comp)
        # kept total = singletons (docs outside any component) + one per
        # component.
        want_kept = (len(docs) - len(comp)) + len(comp_sizes)
        assert sum(r.n_kept for r in rows) == want_kept
        for r in rows:
            assert r.n_kept + r.n_dropped == r.n_docs
            assert r.drop_rate == r.n_dropped / r.n_docs


class TestFriedman:
    def test_matches_python_replay(self, spark):
        from clinical_api_etl_spark.plans.inference import stat_friedman_weekday

        pdf = pd.read_parquet(f"{SF}/events.parquet")
        pdf = pdf[pdf["value"].notna()].copy()
        pdf["cents"] = (pdf["value"] * 100).round().astype("int64")
        pdf["d"] = pdf["ts"].astype("datetime64[us]").astype("int64") // (
            _DAY_MS * 1000
        )
        daily = pdf.groupby(["event_type", "d"])["cents"].sum().reset_index()
        daily["wk"] = daily["d"] // 7
        want = {}
        for et, sub in daily.groupby("event_type"):
            blocks = [
                list(b["cents"])
                for _, b in sub.groupby("wk")
                if len(b) == 7
            ]
            if not blocks:
                continue
            m = len(blocks)
            r2j = [0] * 7
            a4 = 0
            for b in blocks:
                order = sorted(b)
                for j, x in enumerate(b):
                    lo = order.index(x)  # min rank - 1
                    t = order.count(x)
                    r2 = 2 * (lo + 1) + t - 1
                    r2j[j] += r2
                    a4 += r2 * r2
            num4 = sum((r - 8 * m) ** 2 for r in r2j)
            den4 = a4 - m * 7 * 64
            want[et] = (m, num4, den4)
        got = {r.event_type: r for r in stat_friedman_weekday(spark, SF).collect()}
        assert set(got) == set(want)
        for et, (m, num4, den4) in want.items():
            row = got[et]
            assert row.m == m and row.num4 == num4 and row.den4 == den4
            if den4 == 0:
                assert row.friedman_t1 is None
            else:
                assert row.friedman_t1 == 6.0 * float(num4) / float(den4)


class TestEdgeEmbeddedness:
    def test_triangle_consistency(self, spark):
        from clinical_api_etl_spark.plans.mining import graph_triangle_count
        from clinical_api_etl_spark.plans.ranking.graphrank import (
            graph_edge_embeddedness,
        )

        rows = graph_edge_embeddedness(spark, SF).collect()
        # Sum of embeddedness over edges counts each triangle 3 times.
        total_emb = sum(r.embeddedness * r.n_edges for r in rows)
        tri = graph_triangle_count(spark, SF).collect()[0]
        n_tri = tri[0] if not hasattr(tri, "n_triangles") else tri.n_triangles
        assert total_emb == 3 * n_tri
        assert all(r.n_edges > 0 for r in rows)


class TestPageTrend:
    def test_consistency_with_friedman_cells(self, spark):
        from clinical_api_etl_spark.plans.inference import (
            stat_friedman_weekday,
            stat_page_trend_weekday,
        )

        fr = {r.event_type: r for r in stat_friedman_weekday(spark, SF).collect()}
        pg = {r.event_type: r for r in stat_page_trend_weekday(spark, SF).collect()}
        assert set(fr) == set(pg)
        for et, p in pg.items():
            assert p.m == fr[et].m  # identical complete-block sets
            assert p.mean_l2 == 224 * p.m
            assert p.var144 == 18816 * p.m
            # Identity: sum_j R2_j = m * n(n+1) = 56m, so L2 is bounded
            # by the extreme orderings m*[sum j*2j forms]:
            # min = 2m*(1*7+2*6+...+7*1) = 168m? compute directly:
            lo = 2 * sum((j + 1) * (7 - j) for j in range(7))
            hi = 2 * sum((j + 1) * (j + 1) for j in range(7))
            assert lo * p.m <= p.l2 <= hi * p.m
            if p.m > 0:
                import math as _m

                want_z = float(p.l2 - p.mean_l2) / (
                    2.0 * _m.sqrt(float(p.var144) / 144.0)
                )
                assert p.z_page == want_z

    def test_planted_monotone_week(self, spark):
        # Planted check of the L2 algebra on one perfectly rising week
        # replayed in python (no Spark needed for the formula pin).
        r2 = [2 * (k + 1) for k in range(7)]  # untied ranks, rising
        l2 = sum((j + 1) * r2[j] for j in range(7))
        assert l2 == 2 * sum((j + 1) * (j + 1) for j in range(7))  # max
        assert l2 > 224  # above the null mean for m=1


class TestMcNemar:
    def test_cell_conservation_and_statistic(self, spark):
        from clinical_api_etl_spark.plans.modeling import ml_mcnemar_stumps

        docs = pd.read_parquet(f"{SF}/documents.parquet")
        row = ml_mcnemar_stumps(spark, SF).collect()[0]
        total = (
            row.both_right
            + row.only_a_right
            + row.only_b_right
            + row.both_wrong
        )
        assert total == len(docs)
        b, c = row.only_a_right, row.only_b_right
        if b + c == 0:
            assert row.mcnemar_chi2 is None
        else:
            assert row.mcnemar_chi2 == float((abs(b - c) - 1) ** 2) / float(b + c)


class TestQuadeWeekday:
    def test_matches_python_replay(self, spark):
        """Recompute T3 from the registry's own block cells with plain
        python midranks/ranges — exact integer equality on components,
        bit equality on the one division."""
        from clinical_api_etl_spark.plans.inference import (
            _weekday_block_cells,
            stat_quade_weekday,
        )

        cells = _weekday_block_cells(spark, "/root/testdata/sf0.001").collect()
        got = {
            r.event_type: (r.b, r.a16, r.b16b, r.quade_t3)
            for r in stat_quade_weekday(spark, "/root/testdata/sf0.001").collect()
        }
        spark.catalog.clearCache()
        import collections

        by_et = collections.defaultdict(dict)
        svals = collections.defaultdict(dict)
        for c in cells:
            by_et[c.event_type].setdefault(c.wk, {})[c.dow] = c.r2
            svals[c.event_type].setdefault(c.wk, {})[c.dow] = c.s
        for et, weeks in by_et.items():
            rngs = {wk: max(sv.values()) - min(sv.values()) for wk, sv in svals[et].items()}
            ordered = sorted(rngs.values())
            q2 = {
                wk: 2 * (1 + sum(1 for x in ordered if x < rng))
                + sum(1 for x in ordered if x == rng)
                - 1
                for wk, rng in rngs.items()
            }
            u = {
                (wk, dow): q2[wk] * (r2 - 8)
                for wk, cells_w in weeks.items()
                for dow, r2 in cells_w.items()
            }
            b = len(weeks)
            a16 = sum(x * x for x in u.values())
            sj = collections.Counter()
            for (wk, dow), x in u.items():
                sj[dow] += x
            b16b = sum(x * x for x in sj.values())
            exp_b, exp_a, exp_bb, exp_t3 = got[et]
            assert (b, a16, b16b) == (exp_b, exp_a, exp_bb)
            den = b * a16 - b16b
            if den == 0:
                assert exp_t3 is None
            else:
                assert exp_t3 == float((b - 1) * b16b) / float(den)


class TestNelsonAalen:
    def test_increments_match_km_risk_sets(self, spark):
        """NA and KM share durations/risk sets: on identical (t, d, n)
        rows, each hazard INCREMENT is d/n and H is their prefix sum
        (python float replay, exact — same left fold)."""
        from clinical_api_etl_spark.plans.ranking import (
            stat_kaplan_meier_conversion,
            surv_nelson_aalen,
        )

        sf = "/root/testdata/sf0.001"
        na = sorted(surv_nelson_aalen(spark, sf).collect(), key=lambda r: r.t)
        km = sorted(
            stat_kaplan_meier_conversion(spark, sf).collect(), key=lambda r: r.t
        )
        spark.catalog.clearCache()
        assert [(r.t, r.d, r.n_risk) for r in na] == [
            (r.t, r.d, r.n_risk) for r in km
        ]
        acc = 0.0
        vacc = 0.0
        for r in na:
            acc += float(r.d) / float(r.n_risk)
            vacc += (
                float(r.d * (r.n_risk - r.d))
                / float(r.n_risk)
                / float(r.n_risk)
                / float(r.n_risk)
            )
            assert r.cum_hazard == acc and r.var_hazard == vacc


class TestClosenessProbe:
    def test_consistent_with_harmonic_reach(self, spark):
        """Closeness and harmonic run the same probe BFS — n_reached must
        agree, and closeness must replay from the BFS distances."""
        from clinical_api_etl_spark.operators.graph import (
            bfs_hops_per_source,
            symmetrize,
        )
        from clinical_api_etl_spark.plans.modeling import (
            graph_closeness_probe,
            graph_harmonic_centrality,
        )

        sf = "/root/testdata/sf0.001"
        close = {r.source_node: r for r in graph_closeness_probe(spark, sf).collect()}
        harm = {r.source_node: r for r in graph_harmonic_centrality(spark, sf).collect()}
        spark.catalog.clearCache()
        assert set(close) == set(harm)
        for k, r in close.items():
            assert r.n_reached == harm[k].n_reached
            if r.sum_dist == 0:
                assert r.closeness is None
            else:
                assert r.closeness == float(r.n_reached) / float(r.sum_dist)


class TestPrCurvePoints:
    def test_same_walk_as_roc(self, spark):
        """PR and ROC ride the same descending histogram walk: identical
        thresholds and tp/fp, and each PR row replays exactly."""
        from clinical_api_etl_spark.plans.modeling import (
            ml_pr_curve_points,
            ml_roc_points,
        )

        sf = "/root/testdata/sf0.001"
        pr = {r.threshold: r for r in ml_pr_curve_points(spark, sf).collect()}
        roc = {r.threshold: r for r in ml_roc_points(spark, sf).collect()}
        spark.catalog.clearCache()
        assert set(pr) == set(roc)
        p_total = max(r.tp for r in pr.values())
        for t, r in pr.items():
            assert (r.tp, r.fp) == (roc[t].tp, roc[t].fp)
            assert r.precision_ == float(r.tp) / float(r.tp + r.fp)
            assert r.recall_ == float(r.tp) / float(p_total)
            assert r.f1 == float(2 * r.tp) / float(r.tp + r.fp + p_total)


class TestMoodMedian:
    def test_matches_python_replay(self, spark):
        """Replay grand median + 2xk chi-square from the raw events with
        plain python — exact component equality, bit equality on chi2."""
        from clinical_api_etl_spark.plans.inference import stat_mood_median
        from clinical_api_etl_spark.sources.catalog import load
        from pyspark.sql import functions as F
        import collections
        import decimal

        sf = "/root/testdata/sf0.001"
        got = stat_mood_median(spark, sf).collect()[0]
        rows = (
            load(spark, sf, "events")
            .filter(F.col("value").isNotNull())
            .select("event_type", "value")
            .collect()
        )
        spark.catalog.clearCache()
        cents = [
            (r.event_type, int(decimal.Decimal(r.value).quantize(
                decimal.Decimal("0.01")) * 100))
            for r in rows
        ]
        vals = sorted(v for _, v in cents)
        n = len(vals)
        # lower median: smallest v with 2*cum >= n
        cum = 0
        m = None
        last = None
        for v in vals:
            cum += 1
            if last != v and 2 * cum >= n and m is None:
                m = v
            last = v
        # recompute exactly as the walk does (per distinct value)
        hist = collections.Counter(vals)
        cum = 0
        m = None
        for v in sorted(hist):
            cum += hist[v]
            if m is None and 2 * cum >= n:
                m = v
        above = collections.Counter()
        n_g = collections.Counter()
        for et, v in cents:
            n_g[et] += 1
            if v > m:
                above[et] += 1
        tot_above = sum(above.values())
        assert (got.grand_median_cents, got.n, got.tot_above) == (
            m,
            n,
            tot_above,
        )
        chi2 = 0.0
        for et in sorted(n_g):
            for side in ("a", "b"):
                o = above[et] if side == "a" else n_g[et] - above[et]
                cj = tot_above if side == "a" else n - tot_above
                if cj == 0:  # degenerate margin -> chi2 is NULL (never NaN)
                    chi2 = None
                    break
                d = float(o * n - n_g[et] * cj)
                chi2 += d * d / float(n) / float(n_g[et]) / float(cj)
            if chi2 is None:
                break
        assert got.chi2 == chi2

    def test_degenerate_margin_emits_null_both_engines(self, spark):
        """ADVICE r09 (medium): when no pooled value exceeds the grand
        median (max value carries >= half the mass — heavy top-ties, not
        only all-identical input), tot_above = 0 and the side-'a' terms
        were 0.0/0.0 = NaN. The CASE guard must emit chi2 = NULL on BOTH
        engines; the exact components stay populated."""
        import duckdb

        from clinical_api_etl_spark.plans.inference import (
            _mood_oracle,
            mood_from_samples,
        )

        # two groups, max value (=7) carries 3/4 of the mass -> the walk's
        # lower median is 7 itself, nothing is strictly above ->
        # tot_above = 0, cj('a') = 0
        samples = [("a", 1), ("a", 7), ("b", 7), ("b", 7)]
        t = spark.createDataFrame(samples, "g string, x long")
        got = mood_from_samples(t).collect()[0]
        assert got.tot_above == 0 and got.n == 4
        assert got.chi2 is None  # NULL, not NaN

        vals = ", ".join(f"('{g}', {x})" for g, x in samples)
        src = f"SELECT * FROM (VALUES {vals}) AS s(g, x)"
        drow = duckdb.sql(_mood_oracle(src)).fetchone()
        assert drow[2] == 0 and drow[3] is None  # tot_above, chi2

        # non-degenerate control: both engines agree and chi2 is finite
        samples2 = [("a", 1), ("a", 9), ("b", 3), ("b", 7), ("b", 8)]
        t2 = spark.createDataFrame(samples2, "g string, x long")
        got2 = mood_from_samples(t2).collect()[0]
        spark.catalog.clearCache()
        vals2 = ", ".join(f"('{g}', {x})" for g, x in samples2)
        drow2 = duckdb.sql(
            _mood_oracle(f"SELECT * FROM (VALUES {vals2}) AS s(g, x)")
        ).fetchone()
        assert (got2.grand_median_cents, got2.n, got2.tot_above) == drow2[:3]
        assert got2.chi2 == drow2[3] and got2.chi2 == got2.chi2  # not NaN


class TestJaccardSimilarity:
    def test_scores_in_unit_interval_and_replay(self, spark):
        from clinical_api_etl_spark.plans.ranking import (
            graph_jaccard_similarity_topk,
        )

        rows = graph_jaccard_similarity_topk(
            spark, "/root/testdata/sf0.001"
        ).collect()
        spark.catalog.clearCache()
        assert rows and len(rows) <= 20
        for r in rows:
            assert 0.0 < r.jaccard <= 1.0
            assert r.jaccard == float(r.cn) / float(r.deg_u + r.deg_v - r.cn)
            assert r.cn <= min(r.deg_u, r.deg_v)


class TestDegreeDistribution:
    def test_conservation_and_monotone_ccdf(self, spark):
        from clinical_api_etl_spark.plans.ranking import (
            graph_degree_distribution,
        )

        rows = sorted(
            graph_degree_distribution(spark, "/root/testdata/sf0.001").collect(),
            key=lambda r: r.degree,
        )
        spark.catalog.clearCache()
        n = sum(r.n_nodes for r in rows)
        assert rows[0].n_at_least <= n and max(r.n_at_least for r in rows) == n
        # ccdf non-increasing in degree; tail counts telescope exactly
        for a, b in zip(rows, rows[1:]):
            assert a.n_at_least == b.n_at_least + a.n_nodes
            assert a.ccdf >= b.ccdf
        for r in rows:
            assert r.pmf == float(r.n_nodes) / float(n)
            assert r.ccdf == float(r.n_at_least) / float(n)
