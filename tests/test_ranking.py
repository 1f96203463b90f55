"""Round-8 ranking family: python replays + planted-violation fixtures.

Replay tests recompute each result from the raw sf0.001 parquet with plain
python (independent of Spark and DuckDB) and compare exactly; the DQ suite
is additionally exercised against a tmp-dir corpus with planted key
duplicates and orphans.
"""

from __future__ import annotations

import collections
import itertools

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_pdf():
    return pd.read_parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def tf_py(docs_pdf):
    """{doc_id: Counter(token)} via the engine's whitespace tokenization."""
    out = {}
    for r in docs_pdf.itertuples():
        toks = r.text.strip().lower().split()
        out[r.doc_id] = collections.Counter(toks)
    return out


def _topk(scores, k=5):
    """[(q, doc, rnk, score)] with (score DESC, doc ASC) tie order."""
    rows = []
    for q, per in scores.items():
        ranked = sorted(per.items(), key=lambda t: (-t[1], t[0]))[:k]
        rows.extend((q, d, i + 1, s) for i, (d, s) in enumerate(ranked))
    return set(rows)


class TestSparseTopk:
    def test_matches_python_replay(self, spark, tf_py):
        from clinical_api_etl_spark.plans.ranking import text_sparse_topk

        got = {
            (r.q_id, r.doc_id, r.rnk, r.score)
            for r in text_sparse_topk(spark, SF).collect()
        }
        scores = {}
        for q in range(10):
            per = {}
            for d, c in tf_py.items():
                if d == q:
                    continue
                s = sum(n * tf_py[q][t] for t, n in c.items() if t in tf_py[q])
                if s:
                    per[d] = s
            scores[q] = per
        assert got == _topk(scores)


class TestImpactTopk:
    def test_matches_python_replay(self, spark, tf_py):
        from clinical_api_etl_spark.plans.ranking import text_impact_topk

        got = {
            (r.q_id, r.doc_id, r.rnk, r.score)
            for r in text_impact_topk(spark, SF).collect()
        }
        n_docs = len(tf_py)
        df = collections.Counter(
            t for c in tf_py.values() for t in c
        )
        impact = {t: 1 << ((n_docs // v).bit_length() - 1) for t, v in df.items()}
        scores = {}
        for q in range(10):
            per = {}
            qtoks = set(tf_py[q])
            for d, c in tf_py.items():
                if d == q:
                    continue
                s = sum(n * impact[t] for t, n in c.items() if t in qtoks)
                if s:
                    per[d] = s
            scores[q] = per
        assert got == _topk(scores)

    def test_impacts_are_powers_of_two(self, tf_py):
        n_docs = len(tf_py)
        df = collections.Counter(t for c in tf_py.values() for t in c)
        for t, v in df.items():
            w = 1 << ((n_docs // v).bit_length() - 1)
            assert w & (w - 1) == 0 and w <= n_docs // v and 2 * w > n_docs // v


def _copurchase_graph(support=2):
    li = pd.read_parquet(f"{SF}/lineitem.parquet")[["l_orderkey", "l_partkey"]]
    pair_count = collections.Counter()
    for _, grp in li.groupby("l_orderkey"):
        # NB: the engine counts lineitem ROW pairs, not distinct-part pairs
        parts_rows = sorted(grp["l_partkey"])
        for a, b in itertools.combinations(parts_rows, 2):
            if a != b:
                pair_count[(min(a, b), max(a, b))] += 1
    edges = {p for p, n in pair_count.items() if n >= support}
    adj = collections.defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    return edges, adj


@pytest.fixture(scope="module")
def graph():
    return _copurchase_graph()


class TestBm25Topk:
    def test_matches_python_replay(self, spark, tf_py):
        """Bit-exact python replay: same rational arithmetic (one BIGINT
        division per term, exact power-of-two idf scaling) and the same
        tok-sorted left fold, so float equality is exact, not approx."""
        from clinical_api_etl_spark.plans.ranking import retrieval_bm25_topk

        got = {
            (r.q_id, r.doc_id, r.rnk, r.score)
            for r in retrieval_bm25_topk(spark, SF).collect()
        }
        n_docs = len(tf_py)
        dl = {d: sum(c.values()) for d, c in tf_py.items()}
        dlsum = sum(dl.values())
        df = collections.Counter(t for c in tf_py.values() for t in c)
        impact = {t: 1 << ((n_docs // v).bit_length() - 1) for t, v in df.items()}
        scores = {}
        for q in range(10):
            per = {}
            qtoks = set(tf_py[q])
            for d, c in tf_py.items():
                if d == q:
                    continue
                acc = 0.0
                for t in sorted(c):
                    if t not in qtoks:
                        continue
                    tf = c[t]
                    num = float(44 * tf * dlsum)
                    den = float(20 * tf * dlsum + 6 * dlsum + 18 * dl[d] * n_docs)
                    acc += float(impact[t]) * (num / den)
                if acc:
                    per[d] = acc
            scores[q] = per
        assert got == _topk(scores)

    def test_length_normalization_direction(self, spark, tf_py):
        """BM25's b-term must penalize long documents: for two docs with
        the same tf on a query term, the shorter one scores higher on
        that term. Checked via the closed rational form."""
        n_docs, dlsum = 7, 700

        def term(tf, dl):
            return float(44 * tf * dlsum) / float(
                20 * tf * dlsum + 6 * dlsum + 18 * dl * n_docs
            )

        assert term(3, 50) > term(3, 200)
        # and saturation: doubling tf less than doubles the term
        assert term(2, 100) < 2 * term(1, 100)


class TestLinkPred:
    def test_matches_python_replay(self, spark, graph):
        from clinical_api_etl_spark.plans.ranking import graph_linkpred_topk

        edges, adj = graph
        cn = collections.Counter()
        for w, nbrs in adj.items():
            for a, b in itertools.combinations(sorted(nbrs), 2):
                cn[(a, b)] += 1
        cand = []
        for (a, b), c in cn.items():
            if (a, b) in edges:
                continue
            du, dv = len(adj[a]), len(adj[b])
            cand.append((a, b, c, du, dv, du + dv - c))
        cand.sort(key=lambda t: (-t[2], t[0], t[1]))
        expect = {
            (a, b, c, du, dv, un, c / un) for a, b, c, du, dv, un in cand[:20]
        }
        got = {
            (r.u, r.v, r.cn, r.deg_u, r.deg_v, r.union_size, r.jaccard)
            for r in graph_linkpred_topk(spark, SF).collect()
        }
        assert got == expect

    def test_pairs_are_nonadjacent(self, spark, graph):
        from clinical_api_etl_spark.plans.ranking import graph_linkpred_topk

        edges, _ = graph
        for r in graph_linkpred_topk(spark, SF).collect():
            assert (r.u, r.v) not in edges


class TestClusteringCoeff:
    def test_matches_python_replay(self, spark, graph):
        from clinical_api_etl_spark.plans.ranking import graph_clustering_coeff

        _, adj = graph
        expect = set()
        for v, nbrs in adj.items():
            d = len(nbrs)
            if d < 2:
                continue
            tri = sum(
                1
                for a, b in itertools.combinations(sorted(nbrs), 2)
                if b in adj[a]
            )
            expect.add((v, d, tri, (2 * tri) / (d * (d - 1))))
        got = {
            (r.node, r.degree, r.n_tri, r.coeff)
            for r in graph_clustering_coeff(spark, SF).collect()
        }
        assert got == expect


class TestOlsTrend:
    def test_matches_python_replay(self, spark):
        from clinical_api_etl_spark.plans.ranking import stat_ols_trend_hourly

        ev = pd.read_parquet(f"{SF}/events.parquet")
        # ts may be ns or µs resolution; floor to epoch hours exactly.
        ms = ev["ts"].astype("int64") // (
            1_000_000 if ev["ts"].dtype.str.endswith("[ns]") else 1_000
        )
        eh = ms // 3_600_000
        counts = collections.Counter(eh)
        t0 = min(counts)
        pts = [(int(h - t0), int(y)) for h, y in counts.items()]
        n = len(pts)
        st = sum(t for t, _ in pts)
        sy = sum(y for _, y in pts)
        sty = sum(t * y for t, y in pts)
        stt = sum(t * t for t, _ in pts)
        syy = sum(y * y for _, y in pts)
        num, den = n * sty - st * sy, n * stt - st * st
        dyy = n * syy - sy * sy
        inum = sy * stt - st * sty
        row = stat_ols_trend_hourly(spark, SF).collect()[0]
        assert (row.n, row.st, row.sy, row.sty, row.stt, row.syy) == (
            n, st, sy, sty, stt, syy,
        )
        assert (row.slope_num, row.slope_den) == (num, den)
        assert row.slope == float(num) / float(den)
        assert row.intercept == float(inum) / float(den)
        assert row.r2 == (float(num) * float(num)) / (float(den) * float(dyy))

    def test_r2_in_unit_interval(self, spark):
        from clinical_api_etl_spark.plans.ranking import stat_ols_trend_hourly

        row = stat_ols_trend_hourly(spark, SF).collect()[0]
        assert 0.0 <= row.r2 <= 1.0


class TestDqContractChecks:
    def test_clean_testdata_has_known_violations(self, spark):
        from clinical_api_etl_spark.plans.ranking import dq_contract_checks

        got = {r.check_name: r.n_violations for r in
               dq_contract_checks(spark, SF).collect()}
        assert set(got) == {
            "customer_pk_dup", "orders_pk_dup", "events_pk_dup",
            "orders_cust_orphans", "lineitem_order_orphans",
            "events_user_orphans",
        }
        # generator keys are unique and FKs intact except user_id=0
        assert got["customer_pk_dup"] == 0
        assert got["orders_pk_dup"] == 0
        assert got["events_pk_dup"] == 0
        assert got["lineitem_order_orphans"] == 0

    def test_planted_violations_detected(self, spark, tmp_path):
        from clinical_api_etl_spark.plans.ranking import dq_contract_checks

        d = str(tmp_path)
        pd.DataFrame({"c_custkey": [1, 2, 2]}).to_parquet(f"{d}/customer.parquet")
        pd.DataFrame(
            {"o_orderkey": [10, 11, 11, 11], "o_custkey": [1, 2, 2, 99]}
        ).to_parquet(f"{d}/orders.parquet")
        pd.DataFrame({"l_orderkey": [10, 11, 77]}).to_parquet(
            f"{d}/lineitem.parquet"
        )
        pd.DataFrame(
            {
                "event_id": [1, 1, 2],
                "ts": pd.to_datetime(["2024-01-01"] * 3),
                "user_id": [1, 2, 55],
            }
        ).to_parquet(f"{d}/events.parquet")
        got = {r.check_name: r.n_violations for r in
               dq_contract_checks(spark, d).collect()}
        assert got["customer_pk_dup"] == 1     # one excess row for key 2
        assert got["orders_pk_dup"] == 2       # two excess rows for key 11
        assert got["events_pk_dup"] == 1
        assert got["orders_cust_orphans"] == 1  # o_custkey 99
        assert got["lineitem_order_orphans"] == 1  # l_orderkey 77
        assert got["events_user_orphans"] == 1  # user_id 55


class TestChisqIndependence:
    def test_matches_python_replay(self, spark):
        from clinical_api_etl_spark.plans.ranking import stat_chisq_independence

        ev = pd.read_parquet(f"{SF}/events.parquet")
        ms = ev["ts"].astype("int64") // (
            1_000_000 if ev["ts"].dtype.str.endswith("[ns]") else 1_000
        )
        dow = (ms // 86_400_000) % 7
        cells = collections.Counter(zip(dow, ev["event_type"]))
        rt = collections.Counter()
        ct = collections.Counter()
        for (d, t), o in cells.items():
            rt[d] += o
            ct[t] += o
        n = sum(cells.values())
        s = 0.0
        for (d, t) in sorted(cells):
            o = cells[(d, t)]
            s += float(o * o) / float(rt[d] * ct[t])
        chisq = float(n) * s - float(n)
        r, c = len(rt), len(ct)
        import math
        v = math.sqrt(chisq / (float(n) * float(min(r - 1, c - 1))))
        row = stat_chisq_independence(spark, SF).collect()[0]
        assert (row.n, row.r, row.c, row.n_cells, row.dof) == (
            n, r, c, len(cells), (r - 1) * (c - 1),
        )
        assert row.chisq == chisq
        assert row.cramers_v == v

    def test_chisq_nonnegative(self, spark):
        from clinical_api_etl_spark.plans.ranking import stat_chisq_independence

        row = stat_chisq_independence(spark, SF).collect()[0]
        assert row.chisq >= 0.0
        assert 0.0 <= row.cramers_v <= 1.0


class TestAnovaF:
    def test_matches_python_replay(self, spark):
        from clinical_api_etl_spark.plans.ranking import stat_anova_f_types

        ev = pd.read_parquet(f"{SF}/events.parquet")
        ev = ev[ev["value"].notna()]
        cents = (ev["value"] * 100).round().astype("int64")
        groups = collections.defaultdict(list)
        for t, x in zip(ev["event_type"], cents):
            groups[t].append(int(x))
        k = len(groups)
        n = sum(len(v) for v in groups.values())
        s_all = sum(sum(v) for v in groups.values())
        q_all = sum(x * x for v in groups.values() for x in v)
        fold = 0.0
        for t in sorted(groups):
            sg = sum(groups[t])
            fold += (float(sg) * float(sg)) / float(len(groups[t]))
        ssb = fold - (float(s_all) * float(s_all)) / float(n)
        ssw = float(q_all) - fold
        f = (ssb / float(k - 1)) / (ssw / float(n - k))
        row = stat_anova_f_types(spark, SF).collect()[0]
        assert (row.k, row.n, row.s_all, row.q_all) == (k, n, s_all, q_all)
        assert row.ssb == ssb and row.ssw == ssw and row.f_stat == f

    def test_f_positive(self, spark):
        from clinical_api_etl_spark.plans.ranking import stat_anova_f_types

        row = stat_anova_f_types(spark, SF).collect()[0]
        assert row.ssb >= 0.0 and row.ssw > 0.0 and row.f_stat >= 0.0


class TestOlsByType:
    def test_matches_python_replay(self, spark):
        from clinical_api_etl_spark.plans.ranking import stat_ols_trend_by_type

        ev = pd.read_parquet(f"{SF}/events.parquet")
        ms = ev["ts"].astype("int64") // (
            1_000_000 if ev["ts"].dtype.str.endswith("[ns]") else 1_000
        )
        eh = ms // 3_600_000
        expect = {}
        for t in ev["event_type"].unique():
            counts = collections.Counter(eh[ev["event_type"] == t])
            t0 = min(counts)
            pts = [(int(h - t0), int(y)) for h, y in counts.items()]
            n = len(pts)
            st = sum(a for a, _ in pts)
            sy = sum(b for _, b in pts)
            sty = sum(a * b for a, b in pts)
            stt = sum(a * a for a, _ in pts)
            syy = sum(b * b for _, b in pts)
            num, den = n * sty - st * sy, n * stt - st * st
            dyy = n * syy - sy * sy
            slope = None if den == 0 else float(num) / float(den)
            r2 = (
                None
                if den == 0 or dyy == 0
                else (float(num) * float(num)) / (float(den) * float(dyy))
            )
            expect[t] = (n, num, den, slope, r2)
        got = {
            r.event_type: (r.n, r.slope_num, r.slope_den, r.slope, r.r2)
            for r in stat_ols_trend_by_type(spark, SF).collect()
        }
        assert got == expect


class TestBpeApplyCorpus:
    def test_matches_python_replay(self, spark, docs_pdf):
        from clinical_api_etl_spark.operators.bpe import apply_merges_py
        from clinical_api_etl_spark.plans.inference import bpe_apply_corpus

        # python learn replay: (count DESC, lex smallest pair) tie-break,
        # identical to learn_bpe_distributed
        freqs = collections.Counter()
        doc_words = {}
        for r in docs_pdf.itertuples():
            ws = r.text.strip().lower().split()
            doc_words[r.doc_id] = collections.Counter(ws)
            freqs.update(ws)
        syms = {w: " ".join(w) + " </w>" for w in freqs}
        merges = []
        for _ in range(6):
            pc = collections.Counter()
            for w, f in freqs.items():
                tk = syms[w].split(" ")
                for a, b in zip(tk, tk[1:]):
                    pc[(a, b)] += f
            if not pc:
                break
            (lhs, rhs), _n = min(
                pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            merges.append((lhs, rhs))
            for w in syms:
                doubled = " " + syms[w].replace(" ", "  ") + " "
                m = doubled.replace(f" {lhs}  {rhs} ", f" {lhs}{rhs} ")
                syms[w] = m.replace("  ", " ").strip()
        n_sub = {w: len(s.split(" ")) for w, s in syms.items()}
        expect = {}
        for d, wc in doc_words.items():
            expect[d] = (
                sum(wc.values()),
                sum(c * n_sub[w] for w, c in wc.items()),
            )
        got = {
            r.doc_id: (r.n_words, r.n_bpe_tokens)
            for r in bpe_apply_corpus(spark, SF).collect()
        }
        assert got == expect
        # merges applied: at least one doc compresses below chars+eow count
        # (sanity that the chain actually merged symbols)
        assert merges and any(
            s.count(" ") + 1 < len(w) + 1 for w, s in syms.items()
        )

    def test_apply_merges_py_agrees_with_replay_semantics(self):
        from clinical_api_etl_spark.operators.bpe import apply_merges_py

        # independent cross-check of the replace-chain semantics
        out = apply_merges_py("aaab", [("a", "a"), ("aa", "a")])
        assert out == "aaa b </w>"


class TestLangRebalance:
    def test_matches_python_replay(self, spark, docs_pdf):
        import hashlib

        from clinical_api_etl_spark.plans.inference import corpus_lang_rebalance

        by_lang = collections.defaultdict(list)
        for r in docs_pdf.itertuples():
            by_lang[r.lang].append(r.doc_id)
        m = min(len(v) for v in by_lang.values())
        expect = {}
        for lang, ids in by_lang.items():
            ranked = sorted(
                ids, key=lambda d: (hashlib.md5(str(d).encode()).hexdigest(), d)
            )
            kept = sorted(ranked[:m])
            fp = hashlib.md5(",".join(str(d) for d in kept).encode()).hexdigest()
            expect[lang] = (len(ids), m, fp)
        got = {
            r.lang: (r.n_available, r.n_kept, r.kept_fp)
            for r in corpus_lang_rebalance(spark, SF).collect()
        }
        assert got == expect

    def test_balanced_output(self, spark):
        from clinical_api_etl_spark.plans.inference import corpus_lang_rebalance

        rows = corpus_lang_rebalance(spark, SF).collect()
        kept = {r.n_kept for r in rows}
        assert len(kept) == 1  # every language contributes the same count
        assert min(r.n_available for r in rows) == kept.pop()


class TestPrivacyKAnonymity:
    def test_matches_python_replay(self, spark):
        from clinical_api_etl_spark.plans.ranking import privacy_k_anonymity

        ev = pd.read_parquet(f"{SF}/events.parquet")
        ms = ev["ts"].astype("int64") // (
            1_000_000 if ev["ts"].dtype.str.endswith("[ns]") else 1_000
        )
        dow = (ms // 86_400_000) % 7
        groups = collections.defaultdict(list)
        for t, d, u in zip(ev["event_type"], dow, ev["user_id"]):
            groups[(t, int(d))].append(u)
        ks = {g: len(v) for g, v in groups.items()}
        ls = {g: len(set(v)) for g, v in groups.items()}
        row = privacy_k_anonymity(spark, SF).collect()[0]
        assert row.n_groups == len(groups)
        assert row.n_rows == sum(ks.values())
        assert row.k_anonymity == min(ks.values())
        assert row.l_diversity == min(ls.values())
        assert row.groups_below_k5 == sum(1 for k in ks.values() if k < 5)
        assert row.rows_below_k5 == sum(k for k in ks.values() if k < 5)
        assert row.groups_below_l2 == sum(1 for l in ls.values() if l < 2)


class TestAudioVad:
    def test_matches_python_replay(self, spark):
        import hashlib

        import numpy as np

        from clinical_api_etl_spark.plans.mining import mm_audio_vad_segments

        T = 6_000_000_000
        expect = {}
        for doc_id in range(500):
            pcm = b"".join(
                bytes.fromhex(
                    hashlib.md5(f"au{c}:{doc_id}".encode()).hexdigest()
                )
                for c in range(4)
            )
            s = np.frombuffer(pcm, dtype="<i2").astype(np.int64)
            voiced = [
                int((s[f : f + 16] ** 2).sum() >= T)
                for f in range(0, len(s), 16)
            ]
            segs, longest, run = 0, 0, 0
            prev = 0
            for v in voiced:
                if v and not prev:
                    segs += 1
                run = run + 1 if v else 0
                longest = max(longest, run)
                prev = v
            expect[doc_id] = (len(voiced), sum(voiced), segs, longest)
        got = {
            r.doc_id: (r.n_frames, r.n_voiced, r.n_segments, r.longest_run)
            for r in mm_audio_vad_segments(spark, SF).collect()
        }
        assert got == expect
        # both classes populated somewhere in the corpus
        assert any(v[1] > 0 for v in expect.values())
        assert any(v[1] < v[0] for v in expect.values())


class TestPercentileBands:
    def test_matches_python_replay(self, spark):
        import math

        from clinical_api_etl_spark.plans.ranking import (
            stat_percentile_bands_by_type,
        )

        ev = pd.read_parquet(f"{SF}/events.parquet")
        ev = ev[ev["value"].notna()]
        cents = (ev["value"] * 100).round().astype("int64")
        per = collections.defaultdict(list)
        for t, c in zip(ev["event_type"], cents):
            per[t].append(int(c))
        expect = {}
        for t, xs in per.items():
            xs.sort()
            n = len(xs)
            q = lambda p: xs[math.ceil(p * n) - 1]  # noqa: E731
            expect[t] = (n, q(0.5), q(0.9), q(0.95), xs[-1])
        got = {
            r.event_type: (r.n, r.p50_cents, r.p90_cents, r.p95_cents, r.max_cents)
            for r in stat_percentile_bands_by_type(spark, SF).collect()
        }
        assert got == expect


class TestLpaCommunities:
    def test_matches_python_replay(self, spark, graph):
        from clinical_api_etl_spark.plans.ranking import graph_lpa_communities

        _, adj = graph
        labels = {v: v for v in adj}
        for _ in range(3):
            new = {}
            for v, nbrs in adj.items():
                cnt = collections.Counter(labels[n] for n in nbrs)
                # argmax by (count DESC, label ASC)
                new[v] = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            labels = new
        got = {
            (r.node, r.community)
            for r in graph_lpa_communities(spark, SF).collect()
        }
        assert got == set(labels.items())

    def test_communities_coarser_than_nodes(self, spark):
        from clinical_api_etl_spark.plans.ranking import graph_lpa_communities

        rows = graph_lpa_communities(spark, SF).collect()
        n_nodes = len(rows)
        n_comm = len({r.community for r in rows})
        assert 0 < n_comm < n_nodes  # propagation actually merged labels


class TestParetoFrontier:
    def test_matches_python_replay(self, spark):
        from clinical_api_etl_spark.plans.ranking import pareto_frontier_parts

        part = pd.read_parquet(f"{SF}/part.parquet")
        pts = [
            (int(r.p_partkey), int(r.p_size), int(round(r.p_retailprice * 100)))
            for r in part.itertuples()
        ]
        pts.sort(key=lambda t: (t[2], -t[1], t[0]))
        frontier = []
        best = None
        for key, size, price in pts:
            if best is None or size > best:
                frontier.append((key, size, price))
                best = size if best is None else max(best, size)
        got = {
            (r.p_partkey, r.p_size, r.price_cents)
            for r in pareto_frontier_parts(spark, SF).collect()
        }
        assert got == set(frontier)

    def test_no_row_dominates_a_frontier_row(self, spark):
        from clinical_api_etl_spark.plans.ranking import pareto_frontier_parts

        part = pd.read_parquet(f"{SF}/part.parquet")
        all_pts = [
            (int(r.p_size), int(round(r.p_retailprice * 100)))
            for r in part.itertuples()
        ]
        for r in pareto_frontier_parts(spark, SF).collect():
            assert not any(
                p < r.price_cents and s >= r.p_size for s, p in all_pts
            )


class TestLinearAttribution:
    def test_matches_python_replay(self, spark):
        from clinical_api_etl_spark.plans.ranking import attr_linear_click_credit

        ev = pd.read_parquet(f"{SF}/events.parquet")
        ms = ev["ts"].astype("int64") // (
            1_000_000 if ev["ts"].dtype.str.endswith("[ns]") else 1_000
        )
        ev = ev.assign(ms=ms)
        p = ev[ev["event_type"] == "purchase"]
        c = ev[ev["event_type"] == "click"]
        by_user = collections.defaultdict(list)
        for r in c.itertuples():
            by_user[r.user_id].append((r.ms, r.event_id))
        agg = collections.defaultdict(lambda: [0, set(), 0])
        W = 6 * 3600 * 1000
        for r in p.itertuples():
            touches = [
                (cms, cid)
                for cms, cid in by_user.get(r.user_id, [])
                if r.ms - W <= cms < r.ms
            ]
            if not touches:
                continue
            ppm = 1_000_000 // len(touches)
            for cms, cid in touches:
                h = (cms // 3_600_000) % 24
                agg[h][0] += 1
                agg[h][1].add(r.event_id)
                agg[h][2] += ppm
        expect = {h: (v[0], len(v[1]), v[2]) for h, v in agg.items()}
        got = {
            r.click_hour: (r.n_credited_clicks, r.n_purchases, r.credit_ppm)
            for r in attr_linear_click_credit(spark, SF).collect()
        }
        assert got == expect

    def test_credit_conserved_up_to_floor_remainder(self, spark):
        from clinical_api_etl_spark.plans.ranking import attr_linear_click_credit

        rows = attr_linear_click_credit(spark, SF).collect()
        total_ppm = sum(r.credit_ppm for r in rows)
        # every attributed purchase distributes <= 1e6 ppm, losing only
        # the floor-div remainder (< touch count per purchase)
        n_touches = sum(r.n_credited_clicks for r in rows)
        distinct_p = attr_linear_click_credit(spark, SF)
        assert total_ppm <= 1_000_000 * sum(r.n_purchases for r in rows)
        assert total_ppm > 0 and n_touches > 0


class TestDbscan:
    def _replay(self):
        import hashlib

        import numpy as np

        from clinical_api_etl_spark.plans.mlprep import _JL_SIGNS

        emb = pd.read_parquet(f"{SF}/embeddings.parquet")
        pts = {}
        for r in emb.itertuples():
            v = np.asarray(r.embedding, dtype=np.float64)
            q = []
            for j in range(2):
                s = 0.0
                for i in range(64):
                    s = s + float(v[i]) * _JL_SIGNS[j][i]
                q.append(int(np.floor(s * 1000000.0 + 0.5)))
            pts[r.vec_id] = tuple(q)
        eps2 = 120_000 ** 2
        ids = sorted(pts)
        nbrs = {i: set() for i in ids}
        for a in ids:
            for b in ids:
                if a < b:
                    dx = pts[a][0] - pts[b][0]
                    dy = pts[a][1] - pts[b][1]
                    if dx * dx + dy * dy <= eps2:
                        nbrs[a].add(b)
                        nbrs[b].add(a)
        core = {i for i in ids if len(nbrs[i]) + 1 >= 4}
        # components over core-core edges (union-find)
        parent = {i: i for i in core}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a in core:
            for b in nbrs[a]:
                if b in core:
                    ra, rb = find(a), find(b)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
        comp = {}
        for c in core:
            root = find(c)
            comp.setdefault(root, []).append(c)
        label = {}
        for root, members in comp.items():
            m = min(members)
            for c in members:
                label[c] = m
        out = {}
        for i in ids:
            if i in core:
                out[i] = ("core", label[i])
            else:
                adj = [label[j] for j in nbrs[i] if j in core]
                out[i] = ("border", min(adj)) if adj else ("noise", -1)
        return out

    def test_matches_python_replay(self, spark):
        from clinical_api_etl_spark.plans.ranking import emb_dbscan_clusters

        expect = self._replay()
        got = {
            r.vec_id: (r.role, r.cluster)
            for r in emb_dbscan_clusters(spark, SF).collect()
        }
        assert got == expect

    def test_role_mix_present(self, spark):
        from clinical_api_etl_spark.plans.ranking import emb_dbscan_clusters

        roles = collections.Counter(
            r.role for r in emb_dbscan_clusters(spark, SF).collect()
        )
        assert roles["core"] > 0 and roles["noise"] > 0 and roles["border"] > 0


class TestKaplanMeier:
    def test_matches_python_replay(self, spark):
        from clinical_api_etl_spark.plans.ranking import (
            stat_kaplan_meier_conversion,
        )

        ev = pd.read_parquet(f"{SF}/events.parquet")
        ms = ev["ts"].astype("int64") // (
            1_000_000 if ev["ts"].dtype.str.endswith("[ns]") else 1_000
        )
        ev = ev.assign(ms=ms)
        durs = []
        for uid, g in ev.groupby("user_id"):
            views = g[g["event_type"] == "view"]["ms"]
            if views.empty:
                continue
            t0 = int(views.min())
            purch = g[(g["event_type"] == "purchase") & (g["ms"] >= t0)]["ms"]
            if not purch.empty:
                durs.append(((int(purch.min()) - t0) // 86_400_000, 1))
            else:
                durs.append(((int(g["ms"].max()) - t0) // 86_400_000, 0))
        n_subjects = len(durs)
        times = sorted({t for t, e in durs if e == 1})
        expect = {}
        s = 1.0
        for t in times:
            d = sum(1 for x, e in durs if x == t and e == 1)
            c = sum(1 for x, e in durs if x == t and e == 0)
            n_risk = sum(1 for x, _ in durs if x >= t)
            s = s * (1.0 - float(d) / float(n_risk))
            expect[t] = (d, c, n_risk, n_subjects, s)
        got = {
            r.t: (r.d, r.c, r.n_risk, r.n_subjects, r.survival)
            for r in stat_kaplan_meier_conversion(spark, SF).collect()
        }
        assert got == expect

    def test_survival_monotone_nonincreasing(self, spark):
        from clinical_api_etl_spark.plans.ranking import (
            stat_kaplan_meier_conversion,
        )

        rows = sorted(
            stat_kaplan_meier_conversion(spark, SF).collect(),
            key=lambda r: r.t,
        )
        surv = [r.survival for r in rows]
        assert all(a >= b for a, b in zip(surv, surv[1:]))
        assert all(0.0 <= s <= 1.0 for s in surv)


class TestLogRank:
    def test_matches_python_replay(self, spark):
        import math

        from clinical_api_etl_spark.plans.ranking import stat_logrank_cohorts

        ev = pd.read_parquet(f"{SF}/events.parquet")
        ms = ev["ts"].astype("int64") // (
            1_000_000 if ev["ts"].dtype.str.endswith("[ns]") else 1_000
        )
        ev = ev.assign(ms=ms)
        durs = []
        for uid, g in ev.groupby("user_id"):
            views = g[g["event_type"] == "view"]["ms"]
            if views.empty:
                continue
            t0 = int(views.min())
            purch = g[(g["event_type"] == "purchase") & (g["ms"] >= t0)]["ms"]
            grp = int(uid) % 2
            if not purch.empty:
                durs.append((grp, (int(purch.min()) - t0) // 86_400_000, 1))
            else:
                durs.append((grp, (int(g["ms"].max()) - t0) // 86_400_000, 0))
        times = sorted({t for _, t, e in durs if e == 1})
        o1 = sum(e for g, t, e in durs if g == 1)
        e1_sum, v_sum, n_times = 0.0, 0.0, 0
        for t in times:
            d = sum(1 for _, x, e in durs if x == t and e == 1)
            d_grp1 = sum(1 for g, x, e in durs if g == 1 and x == t and e == 1)
            n = sum(1 for _, x, _e in durs if x >= t)
            n1 = sum(1 for g, x, _e in durs if g == 1 and x >= t)
            n_times += 1
            e1_sum = e1_sum + float(d) * float(n1) / float(n)
            p1 = float(n1) / float(n)
            v = (
                0.0
                if n <= 1
                else (float(d) * p1 * (1 - p1) * float(n - d)) / float(n - 1)
            )
            v_sum = v_sum + v
        z = (float(o1) - e1_sum) / math.sqrt(v_sum)
        row = stat_logrank_cohorts(spark, SF).collect()[0]
        assert (row.n_times, row.o1) == (n_times, o1)
        assert row.e1_sum == e1_sum and row.v_sum == v_sum and row.z == z


class TestDiffInDiff:
    def test_matches_python_replay(self, spark):
        from clinical_api_etl_spark.plans.ranking import stat_diff_in_diff

        ev = pd.read_parquet(f"{SF}/events.parquet")
        ev = ev[ev["value"].notna()]
        ms = ev["ts"].astype("int64") // (
            1_000_000 if ev["ts"].dtype.str.endswith("[ns]") else 1_000
        )
        day = ms // 86_400_000
        mid = (int(day.min()) + int(day.max()) + 1) // 2
        cents = (ev["value"] * 100).round().astype("int64")
        cells = collections.defaultdict(lambda: [0, 0])
        for u, d, c in zip(ev["user_id"], day, cents):
            key = (int(u) % 2, 1 if d >= mid else 0)
            cells[key][0] += 1
            cells[key][1] += int(c)
        m = {k: v[1] / v[0] for k, v in cells.items()}
        did = (m[(1, 1)] - m[(1, 0)]) - (m[(0, 1)] - m[(0, 0)])
        row = stat_diff_in_diff(spark, SF).collect()[0]
        for (g, p), (n, s) in cells.items():
            assert getattr(row, f"n{g}{p}") == n
            assert getattr(row, f"s{g}{p}") == s
        assert row.did_cents == did


class TestCuped:
    def test_matches_python_replay(self, spark):
        from clinical_api_etl_spark.plans.ranking import stat_cuped_adjusted_lift

        ev = pd.read_parquet(f"{SF}/events.parquet")
        ev = ev[ev["value"].notna()]
        ms = ev["ts"].astype("int64") // (
            1_000_000 if ev["ts"].dtype.str.endswith("[ns]") else 1_000
        )
        day = ms // 86_400_000
        mid = (int(day.min()) + int(day.max()) + 1) // 2
        cents = (ev["value"] * 100).round().astype("int64")
        per = collections.defaultdict(lambda: [0, 0, 0, 0])
        for u, d, c in zip(ev["user_id"], day, cents):
            s = per[int(u)]
            if d >= mid:
                s[2] += int(c)
                s[3] += 1
            else:
                s[0] += int(c)
                s[1] += 1
        users = sorted(u for u, s in per.items() if s[1] > 0 and s[3] > 0)
        x = {u: per[u][0] / per[u][1] for u in users}
        y = {u: per[u][2] / per[u][3] for u in users}
        n = len(users)
        sx = sy = sxy = sxx = 0.0
        for u in users:
            sx += x[u]
            sy += y[u]
            sxy += x[u] * y[u]
            sxx += x[u] * x[u]
        arms = {1: [u for u in users if u % 2 == 1],
                0: [u for u in users if u % 2 == 0]}
        def fold(vals):
            s = 0.0
            for v in vals:
                s += v
            return s
        sy1 = fold([y[u] for u in arms[1]])
        sx1 = fold([x[u] for u in arms[1]])
        sy0 = fold([y[u] for u in arms[0]])
        sx0 = fold([x[u] for u in arms[0]])
        theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        raw = sy1 / len(arms[1]) - sy0 / len(arms[0])
        xdiff = sx1 / len(arms[1]) - sx0 / len(arms[0])
        row = stat_cuped_adjusted_lift(spark, SF).collect()[0]
        assert (row.n, row.n1, row.n0) == (n, len(arms[1]), len(arms[0]))
        assert row.theta == theta
        assert row.raw_lift_cents == raw
        assert row.adj_lift_cents == raw - theta * xdiff


class TestNtileDeciles:
    def test_matches_python_replay(self, spark):
        from clinical_api_etl_spark.plans.ranking import w17_ntile_value_deciles

        ev = pd.read_parquet(f"{SF}/events.parquet")
        ev = ev[ev["value"].notna()]
        rows = sorted(
            zip((ev["value"] * 100).round().astype("int64"), ev["event_id"])
        , key=lambda t: (t[0], t[1]))
        n = len(rows)
        base, extra = divmod(n, 10)
        expect = {}
        idx = 0
        for dec in range(1, 11):
            size = base + (1 if dec <= extra else 0)
            chunk = rows[idx : idx + size]
            idx += size
            cs = [int(c) for c, _ in chunk]
            expect[dec] = (size, min(cs), max(cs), sum(cs))
        got = {
            r.decile: (r.n, r.lo_cents, r.hi_cents, r.sum_cents)
            for r in w17_ntile_value_deciles(spark, SF).collect()
        }
        assert got == expect


class TestRetrievalEval:
    def test_matches_python_replay(self, spark, tf_py):
        from clinical_api_etl_spark.plans.ranking import eval_retrieval_ndcg

        n_docs = len(tf_py)
        dfc = collections.Counter(t for c in tf_py.values() for t in c)
        impact = {t: 1 << ((n_docs // v).bit_length() - 1) for t, v in dfc.items()}
        W = [1.0, 0.6309297535714575, 0.5, 0.43067655807339306,
             0.38685280723454163]
        expect = {}
        for q in range(10):
            rel, isc = {}, {}
            qt = tf_py[q]
            for d, c in tf_py.items():
                if d == q:
                    continue
                r = sum(nn * qt[t] for t, nn in c.items() if t in qt)
                s = sum(nn * impact[t] for t, nn in c.items() if t in qt)
                if r or s:
                    rel[d], isc[d] = r, s
            sys_rank = sorted(rel, key=lambda d: (-isc[d], d))
            ideal_rank = sorted(rel, key=lambda d: (-rel[d], d))
            sys5, ideal5 = sys_rank[:5], set(ideal_rank[:5])
            dcg = 0.0
            for i, d in enumerate(sys5):
                dcg = dcg + float(rel[d]) * W[i]
            idcg = 0.0
            for i, d in enumerate(ideal_rank[:5]):
                idcg = idcg + float(rel[d]) * W[i]
            hits = sum(1 for d in sys5 if d in ideal5)
            first = next(
                (i + 1 for i, d in enumerate(sys5) if d in ideal5), None
            )
            expect[q] = (
                hits,
                hits / 5,
                0.0 if first is None else 1.0 / first,
                0.0 if idcg == 0 else dcg / idcg,
            )
        got = {
            r.q_id: (r.hits, r.recall5, r.mrr, r.ndcg5)
            for r in eval_retrieval_ndcg(spark, SF).collect()
        }
        assert got == expect

    def test_metric_ranges(self, spark):
        from clinical_api_etl_spark.plans.ranking import eval_retrieval_ndcg

        for r in eval_retrieval_ndcg(spark, SF).collect():
            assert 0 <= r.hits <= 5
            assert 0.0 <= r.recall5 <= 1.0
            assert 0.0 <= r.mrr <= 1.0
            assert 0.0 <= r.ndcg5 <= 1.0 + 1e-12


class TestRollingOlsSlope:
    def test_matches_python_replay(self, spark):
        from clinical_api_etl_spark.plans.ranking import w18_rolling_ols_slope

        ev = pd.read_parquet(f"{SF}/events.parquet")
        ms = ev["ts"].astype("int64") // (
            1_000_000 if ev["ts"].dtype.str.endswith("[ns]") else 1_000
        )
        daily = collections.Counter(ms // 86_400_000)
        days = sorted(daily)
        expect = {}
        for d in days:
            win = [(int(x), int(daily[x])) for x in days if d - 6 <= x <= d]
            n = len(win)
            sd = sum(x for x, _ in win)
            sy = sum(y for _, y in win)
            sdy = sum(x * y for x, y in win)
            sdd = sum(x * x for x, _ in win)
            num, den = n * sdy - sd * sy, n * sdd - sd * sd
            expect[int(d)] = (
                int(daily[d]), n, num, den,
                None if den == 0 else float(num) / float(den),
            )
        got = {
            r.day: (r.y, r.n, r.slope_num, r.slope_den, r.slope)
            for r in w18_rolling_ols_slope(spark, SF).collect()
        }
        assert got == expect


class TestPipeSyntax:
    def test_pipe_equals_classic_formulation(self, spark):
        from clinical_api_etl_spark.plans.ranking import sql_pipe_daily_rollup
        from clinical_api_etl_spark.sources.catalog import load

        load(spark, SF, "events").createOrReplaceTempView("pipe_events")
        classic = spark.sql(
            """
            SELECT event_type,
                   CAST(unix_millis(ts) div 86400000 AS BIGINT) AS day_idx,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100
                            AS BIGINT)) AS BIGINT) AS cents,
                   CAST(MAX(user_id) AS BIGINT) AS max_user
            FROM pipe_events WHERE value IS NOT NULL
            GROUP BY event_type, day_idx HAVING COUNT(*) >= 3
            """
        )
        got = {tuple(r) for r in sql_pipe_daily_rollup(spark, SF).collect()}
        assert got == {tuple(r) for r in classic.collect()}
        assert got  # non-empty


class TestMmrRerank:
    def test_matches_python_replay(self, spark, tf_py):
        from clinical_api_etl_spark.plans.ranking import retrieval_mmr_rerank

        def dot(a, b):
            return sum(n * b[t] for t, n in a.items() if t in b)

        expect = set()
        for q in range(3):
            rel = {}
            for d, c in tf_py.items():
                if d != q:
                    r = dot(c, tf_py[q])
                    if r:
                        rel[d] = r
            pool = sorted(rel, key=lambda d: (-rel[d], d))[:10]
            selected = []
            first = min(pool, key=lambda d: (-rel[d], d))
            selected.append(first)
            expect.add((q, 1, first, rel[first], rel[first]))
            for step in range(2, 6):
                best = None
                for d in pool:
                    if d in selected:
                        continue
                    msim = max(dot(tf_py[d], tf_py[s]) for s in selected)
                    sc = rel[d] - msim
                    key = (-sc, d)
                    if best is None or key < best[0]:
                        best = (key, d, sc)
                expect.add((q, step, best[1], rel[best[1]], best[2]))
                selected.append(best[1])
        got = {
            (r.q_id, r.step, r.doc_id, r.rel, r.score)
            for r in retrieval_mmr_rerank(spark, SF).collect()
        }
        assert got == expect

    def test_no_repeats_and_diversity_tradeoff(self, spark):
        from clinical_api_etl_spark.plans.ranking import retrieval_mmr_rerank

        rows = retrieval_mmr_rerank(spark, SF).collect()
        per_q = collections.defaultdict(list)
        for r in rows:
            per_q[r.q_id].append(r)
        for q, rs in per_q.items():
            assert len({r.doc_id for r in rs}) == 5
            rs.sort(key=lambda r: r.step)
            # step-1 pick is the pure-relevance argmax
            assert rs[0].score == rs[0].rel
            # later scores are penalized by similarity (<= relevance)
            assert all(r.score <= r.rel for r in rs[1:])


class TestNaiveBayes:
    def test_matches_python_replay(self, spark, docs_pdf, tf_py):
        from clinical_api_etl_spark.plans.ranking import ml_naive_bayes_lang

        labels = dict(zip(docs_pdf["doc_id"], docs_pdf["lang"]))
        classes = sorted(set(labels.values()))
        n_docs_c = collections.Counter(labels.values())
        total_docs = len(labels)
        cls_tok = collections.defaultdict(collections.Counter)
        for d, c in tf_py.items():
            cls_tok[labels[d]].update(c)
        vocab = sorted({t for c in tf_py.values() for t in c})
        v = len(vocab)
        tot_c = {cl: sum(cls_tok[cl].values()) for cl in classes}
        pr = {
            (cl, t): (cls_tok[cl][t] + 1) / (tot_c[cl] + v)
            for cl in classes
            for t in vocab
        }
        confusion = collections.Counter()
        for d, cnt in tf_py.items():
            toks = sorted(
                t for t, k in cnt.items() for _ in range(k)
            )
            best = None
            for cl in classes:
                s = 1.0
                for t in toks:
                    s = s * pr[(cl, t)]
                s = (n_docs_c[cl] / total_docs) * s
                key = (-s, cl)
                if best is None or key < best[0]:
                    best = (key, cl)
            confusion[(labels[d], best[1])] += 1
        got = {
            (r.actual, r.predicted): r.n
            for r in ml_naive_bayes_lang(spark, SF).collect()
        }
        assert got == dict(confusion)

    def test_diagonal_dominates_majority_class(self, spark):
        from clinical_api_etl_spark.plans.ranking import ml_naive_bayes_lang

        rows = ml_naive_bayes_lang(spark, SF).collect()
        total = sum(r.n for r in rows)
        correct = sum(r.n for r in rows if r.actual == r.predicted)
        # better than predicting the majority class for everything
        majority = max(
            sum(r.n for r in rows if r.actual == lang)
            for lang in {r.actual for r in rows}
        )
        assert total == 500
        assert correct > majority


class TestNaiveBayesHoldout:
    def test_matches_python_replay(self, spark, docs_pdf, tf_py):
        import hashlib

        from clinical_api_etl_spark.plans.ranking import ml_naive_bayes_holdout

        labels = dict(zip(docs_pdf["doc_id"], docs_pdf["lang"]))
        is_train = {
            d: hashlib.md5(str(d).encode()).hexdigest()[:4] < "8000"
            for d in labels
        }
        train = [d for d in labels if is_train[d]]
        test = [d for d in labels if not is_train[d]]
        classes = sorted({labels[d] for d in train})
        n_docs_c = collections.Counter(labels[d] for d in train)
        total_docs = len(train)
        cls_tok = collections.defaultdict(collections.Counter)
        for d in train:
            cls_tok[labels[d]].update(tf_py[d])
        vocab = {t for d in train for t in tf_py[d]}
        v = len(vocab)
        tot_c = {cl: sum(cls_tok[cl].values()) for cl in classes}
        preds = {}
        for d in test:
            toks = sorted(t for t, k in tf_py[d].items() for _ in range(k))
            best = None
            for cl in classes:
                s = 1.0
                for t in toks:
                    s = s * ((cls_tok[cl][t] + 1) / (tot_c[cl] + v))
                s = (n_docs_c[cl] / total_docs) * s
                key = (-s, cl)
                if best is None or key < best[0]:
                    best = (key, cl)
            preds[d] = best[1]
        expect = {}
        for cl in classes:
            tp = sum(1 for d in test if labels[d] == cl and preds[d] == cl)
            fp = sum(1 for d in test if labels[d] != cl and preds[d] == cl)
            fn = sum(1 for d in test if labels[d] == cl and preds[d] != cl)
            expect[cl] = (
                tp, fp, fn,
                None if tp + fp == 0 else tp / (tp + fp),
                None if tp + fn == 0 else tp / (tp + fn),
                None if 2 * tp + fp + fn == 0 else 2 * tp / (2 * tp + fp + fn),
            )
        got = {
            r.lang: (r.tp, r.fp, r.fn, r.precision_, r.recall_, r.f1)
            for r in ml_naive_bayes_holdout(spark, SF).collect()
        }
        assert got == expect

    def test_split_is_roughly_half(self, docs_pdf):
        import hashlib

        tr = sum(
            1
            for d in docs_pdf["doc_id"]
            if hashlib.md5(str(d).encode()).hexdigest()[:4] < "8000"
        )
        assert 0.35 < tr / len(docs_pdf) < 0.65


class TestOrderReconciliation:
    def test_matches_python_replay(self, spark):
        from clinical_api_etl_spark.plans.ranking import dq_order_reconciliation

        orders = pd.read_parquet(f"{SF}/orders.parquet")
        li = pd.read_parquet(f"{SF}/lineitem.parquet")
        ext_c = (li["l_extendedprice"] * 100).round().astype("int64")
        disc_h = (li["l_discount"] * 100).round().astype("int64")
        li = li.assign(e4=ext_c * (100 - disc_h))
        rolled = li.groupby("l_orderkey")["e4"].sum()
        agg = collections.defaultdict(lambda: [0, 0, 0, 0])
        for r in orders.itertuples():
            if r.o_orderkey not in rolled.index:
                continue
            head = int(round(r.o_totalprice * 100)) * 100
            line = int(rolled[r.o_orderkey])
            d = abs(head - line)
            s = agg[r.o_orderstatus]
            s[0] += 1
            s[1] += 1 if d == 0 else 0
            s[2] += d
            s[3] = max(s[3], d)
        expect = {k: tuple(v) for k, v in agg.items()}
        got = {
            r.o_orderstatus: (r.n_orders, r.n_exact, r.abs_diff_e4, r.max_diff_e4)
            for r in dq_order_reconciliation(spark, SF).collect()
        }
        assert got == expect


class TestLargestRemainder:
    def test_allocation_sums_to_budget_exactly(self, spark):
        from clinical_api_etl_spark.plans.ranking import alloc_largest_remainder

        rows = alloc_largest_remainder(spark, SF).collect()
        assert sum(r.alloc for r in rows) == 1_000_000

    def test_matches_python_replay(self, spark):
        from clinical_api_etl_spark.plans.ranking import alloc_largest_remainder

        ev = pd.read_parquet(f"{SF}/events.parquet")
        cnt = collections.Counter(ev["event_type"])
        n = sum(cnt.values())
        B = 1_000_000
        base = {t: (c * B) // n for t, c in cnt.items()}
        rem = {t: (c * B) % n for t, c in cnt.items()}
        k = B - sum(base.values())
        order = sorted(cnt, key=lambda t: (-rem[t], t))
        expect = {
            t: (cnt[t], base[t] + (1 if i < k else 0))
            for i, t in enumerate(order)
        }
        got = {
            r.event_type: (r.cnt, r.alloc)
            for r in alloc_largest_remainder(spark, SF).collect()
        }
        assert got == expect

    def test_proportionality_bound(self, spark):
        from clinical_api_etl_spark.plans.ranking import alloc_largest_remainder

        rows = alloc_largest_remainder(spark, SF).collect()
        n = sum(r.cnt for r in rows)
        for r in rows:
            exact = r.cnt * 1_000_000 / n
            assert exact - 1 < r.alloc < exact + 1  # Hamilton stays within 1


class TestRollingMedian:
    def test_matches_python_replay(self, spark):
        from clinical_api_etl_spark.plans.ranking import w19_rolling_median_daily

        ev = pd.read_parquet(f"{SF}/events.parquet")
        ms = ev["ts"].astype("int64") // (
            1_000_000 if ev["ts"].dtype.str.endswith("[ns]") else 1_000
        )
        daily = collections.Counter(ms // 86_400_000)
        days = sorted(daily)
        expect = {}
        for d in days:
            win = sorted(int(daily[x]) for x in days if d - 6 <= x <= d)
            n = len(win)
            m2 = 2 * win[(n - 1) // 2] if n % 2 == 1 else win[n // 2 - 1] + win[n // 2]
            expect[int(d)] = (int(daily[d]), n, m2)
        got = {
            r.day: (r.y, r.n, r.median2)
            for r in w19_rolling_median_daily(spark, SF).collect()
        }
        assert got == expect


class TestPiecewiseTrend:
    def test_matches_python_replay(self, spark):
        from clinical_api_etl_spark.plans.ranking import stat_piecewise_trend

        ev = pd.read_parquet(f"{SF}/events.parquet")
        ms = ev["ts"].astype("int64") // (
            1_000_000 if ev["ts"].dtype.str.endswith("[ns]") else 1_000
        )
        daily = collections.Counter(ms // 86_400_000)
        days = sorted(daily)
        n, sy = len(days), sum(daily.values())
        best = None
        cum = 0
        for k, d in enumerate(days, start=1):
            cum += daily[d]
            dev = n * cum - k * sy
            key = (abs(dev), int(d))
            if best is None or key > best[0]:
                best = (key, int(d), abs(dev))
        cp_day, peak = best[1], best[2]

        def ols(pts):
            if not pts:
                return None, 0
            t0 = min(p for p, _ in pts)
            xs = [(int(p - t0), int(y)) for p, y in pts]
            m = len(xs)
            st = sum(t for t, _ in xs)
            syy = sum(y for _, y in xs)
            sty = sum(t * y for t, y in xs)
            stt = sum(t * t for t, _ in xs)
            num, den = m * sty - st * syy, m * stt - st * st
            return (None if den == 0 else float(num) / float(den)), m

        pre = [(d, daily[d]) for d in days if d <= cp_day]
        post = [(d, daily[d]) for d in days if d > cp_day]
        s_pre, n_pre = ols(pre)
        s_post, n_post = ols(post)
        row = stat_piecewise_trend(spark, SF).collect()[0]
        assert (row.cp_day, row.peak_dev) == (cp_day, peak)
        assert (row.n_pre, row.n_post) == (n_pre, n_post)
        assert row.slope_pre == s_pre and row.slope_post == s_post
        assert row.slope_delta == s_post - s_pre


class TestLtvCurve:
    def test_matches_python_replay(self, spark):
        from clinical_api_etl_spark.plans.ranking import ltv_cumulative_by_cohort

        ev = pd.read_parquet(f"{SF}/events.parquet")
        ev = ev[ev["value"].notna()]
        ms = ev["ts"].astype("int64") // (
            1_000_000 if ev["ts"].dtype.str.endswith("[ns]") else 1_000
        )
        day = ms // 86_400_000
        cents = (ev["value"] * 100).round().astype("int64")
        d0 = {}
        for u, d in zip(ev["user_id"], day):
            d0[u] = min(d0.get(u, d), d)
        cohort = {u: int(d) // 7 for u, d in d0.items()}
        users_per = collections.Counter(cohort.values())
        per_age = collections.Counter()
        for u, d, c in zip(ev["user_id"], day, cents):
            per_age[(cohort[u], int(d - d0[u]))] += int(c)
        expect = {}
        for cw in users_per:
            ages = sorted(a for c, a in per_age if c == cw)
            cum = 0
            for a in ages:
                cum += per_age[(cw, a)]
                expect[(cw, a)] = (
                    cum, users_per[cw], cum / users_per[cw],
                )
        got = {
            (r.cohort_week, r.age_day): (
                r.cum_cents, r.cohort_users, r.ltv_cents_per_user,
            )
            for r in ltv_cumulative_by_cohort(spark, SF).collect()
        }
        assert got == expect

    def test_curves_monotone(self, spark):
        from clinical_api_etl_spark.plans.ranking import ltv_cumulative_by_cohort

        rows = ltv_cumulative_by_cohort(spark, SF).collect()
        per = collections.defaultdict(list)
        for r in rows:
            per[r.cohort_week].append((r.age_day, r.cum_cents))
        for cw, pts in per.items():
            pts.sort()
            vals = [v for _, v in pts]
            assert all(a <= b for a, b in zip(vals, vals[1:]))


class TestImageDhash:
    def _replay(self):
        import hashlib

        def hex_for(doc_id):
            chain = "".join(
                hashlib.md5(f"im{c}:{doc_id % 50}".encode()).hexdigest()
                for c in range(4)
            )
            return chain[:126] + "00" if (doc_id // 50) % 2 == 1 else chain

        def dhash(hx):
            px = [int(hx[2 * i : 2 * i + 2], 16) for i in range(64)]
            h = 0
            for bit in range(56):
                r, c = divmod(bit, 7)
                if px[r * 8 + c] > px[r * 8 + c + 1]:
                    h |= 1 << bit
            return h

        return {d: dhash(hex_for(d)) for d in range(500)}

    def test_matches_python_replay(self, spark):
        from clinical_api_etl_spark.plans.ranking import mm_image_dhash_neardups

        hashes = self._replay()
        bands = {
            d: [(h >> (14 * b)) & 0x3FFF for b in range(4)]
            for d, h in hashes.items()
        }
        expect = set()
        ids = sorted(hashes)
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                if any(bands[a][k] == bands[b][k] for k in range(4)):
                    ham = bin(hashes[a] ^ hashes[b]).count("1")
                    if ham <= 6:
                        expect.add((a, b, ham))
        got = {
            (r.da, r.db, r.hamming)
            for r in mm_image_dhash_neardups(spark, SF).collect()
        }
        assert got == expect

    def test_planted_structure_found(self, spark):
        from clinical_api_etl_spark.plans.ranking import mm_image_dhash_neardups

        rows = mm_image_dhash_neardups(spark, SF).collect()
        exact = [r for r in rows if r.hamming == 0]
        near = [r for r in rows if 0 < r.hamming <= 6]
        # same-key same-block-parity docs are exact dupes; cross-block
        # same-key pairs differ by the forced pixel -> near dupes
        assert exact and near
        for r in rows:
            assert r.da % 50 == r.db % 50  # only same-image-key pairs survive


class TestComponentSizeDist:
    def test_matches_python_replay(self, spark, graph):
        from clinical_api_etl_spark.plans.ranking import graph_component_size_dist

        edges, adj = graph
        seen = set()
        sizes = collections.Counter()
        for start in adj:
            if start in seen:
                continue
            stack, comp = [start], set()
            while stack:
                v = stack.pop()
                if v in comp:
                    continue
                comp.add(v)
                stack.extend(adj[v] - comp)
            seen |= comp
            sizes[len(comp)] += 1
        got = {
            r.size: r.n_components
            for r in graph_component_size_dist(spark, SF).collect()
        }
        assert got == dict(sizes)


class TestTrimmedMean:
    def test_matches_python_replay(self, spark):
        from clinical_api_etl_spark.plans.ranking import stat_trimmed_mean_by_type

        ev = pd.read_parquet(f"{SF}/events.parquet")
        ev = ev[ev["value"].notna()]
        cents = (ev["value"] * 100).round().astype("int64")
        per = collections.defaultdict(list)
        for t, c, e in zip(ev["event_type"], cents, ev["event_id"]):
            per[t].append((int(c), int(e)))
        expect = {}
        for t, xs in per.items():
            xs.sort()
            n = len(xs)
            k = n // 20
            kept = [c for c, _ in xs[k : n - k]]
            expect[t] = (n, len(kept), sum(kept), sum(kept) / len(kept))
        got = {
            r.event_type: (r.n, r.n_kept, r.kept_cents, r.trimmed_mean_cents)
            for r in stat_trimmed_mean_by_type(spark, SF).collect()
        }
        assert got == expect

    def test_between_min_and_max(self, spark):
        from clinical_api_etl_spark.plans.ranking import stat_trimmed_mean_by_type

        for r in stat_trimmed_mean_by_type(spark, SF).collect():
            assert 0 < r.n_kept <= r.n


class TestTrafficShape:
    def test_matches_python_replay(self, spark):
        from clinical_api_etl_spark.plans.ranking import stat_traffic_shape_by_type

        ev = pd.read_parquet(f"{SF}/events.parquet")
        ms = ev["ts"].astype("int64") // (
            1_000_000 if ev["ts"].dtype.str.endswith("[ns]") else 1_000
        )
        ev = ev.assign(day=ms // 86_400_000, hr=ms // 3_600_000)
        expect = {}
        for t in ev["event_type"].unique():
            sub = ev[ev["event_type"] == t]
            daily = collections.Counter(sub["day"])
            hourly = collections.Counter(sub["hr"])
            n = len(daily)
            sy = sum(daily.values())
            syy = sum(y * y for y in daily.values())
            scc = sum(c * c for c in hourly.values())
            ne = sum(hourly.values())
            var_num = n * syy - sy * sy
            fano = float(var_num) / (float(n) * float(sy))
            hhi = (scc * 1_000_000) // (ne * ne)
            expect[t] = (n, sy, syy, scc, var_num, fano, hhi)
        got = {
            r.event_type: (r.n_days, r.sy, r.syy, r.scc, r.var_num, r.fano,
                           r.hhi_ppm)
            for r in stat_traffic_shape_by_type(spark, SF).collect()
        }
        assert got == expect

    def test_sane_ranges(self, spark):
        from clinical_api_etl_spark.plans.ranking import stat_traffic_shape_by_type

        for r in stat_traffic_shape_by_type(spark, SF).collect():
            assert r.fano >= 0.0
            assert 0 < r.hhi_ppm <= 1_000_000


class TestInterarrival:
    def test_matches_python_replay(self, spark):
        import math

        from clinical_api_etl_spark.plans.ranking import stat_interarrival_by_type

        ev = pd.read_parquet(f"{SF}/events.parquet")
        ms = ev["ts"].astype("int64") // (
            1_000_000 if ev["ts"].dtype.str.endswith("[ns]") else 1_000
        )
        ev = ev.assign(ms=ms)
        expect = {}
        for t in ev["event_type"].unique():
            sub = sorted(
                zip(ev[ev["event_type"] == t]["ms"],
                    ev[ev["event_type"] == t]["event_id"])
            )
            gaps = sorted(
                int(b[0] - a[0]) for a, b in zip(sub, sub[1:])
            )
            n = len(gaps)
            q = lambda p: gaps[math.ceil(p * n) - 1]  # noqa: E731
            expect[t] = (n, q(0.5), q(0.95), gaps[-1])
        got = {
            r.event_type: (r.n_gaps, r.p50_gap_ms, r.p95_gap_ms, r.max_gap_ms)
            for r in stat_interarrival_by_type(spark, SF).collect()
        }
        assert got == expect


class TestLinkpredResourceAlloc:
    def test_matches_python_ra(self, spark):
        from clinical_api_etl_spark.plans.ranking import (
            _LP_SUPPORT,
            _LP_TOP,
            graph_linkpred_resource_alloc,
        )
        from clinical_api_etl_spark.sources.catalog import load

        SF = "/root/testdata/sf0.001"
        got = [
            (r["u"], r["v"], r["cn"], r["ra"])
            for r in graph_linkpred_resource_alloc(spark, SF).collect()
        ]
        li = load(spark, SF, "lineitem").select("l_orderkey", "l_partkey").collect()
        per_order: dict = {}
        for r in li:
            per_order.setdefault(r["l_orderkey"], []).append(r["l_partkey"])
        pair_count: dict = {}
        for parts in per_order.values():
            ps = sorted(set(parts))
            for i in range(len(ps)):
                for j in range(i + 1, len(ps)):
                    # count duplicate-part co-occurrences like the join does
                    ca, cb = parts.count(ps[i]), parts.count(ps[j])
                    pair_count[(ps[i], ps[j])] = (
                        pair_count.get((ps[i], ps[j]), 0) + ca * cb
                    )
        edges = {p for p, c in pair_count.items() if c >= _LP_SUPPORT}
        adj: dict = {}
        for u, v in edges:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        deg = {n: len(s) for n, s in adj.items()}
        cand: dict = {}
        for w, nbrs in adj.items():
            ns = sorted(nbrs)
            for i in range(len(ns)):
                for j in range(i + 1, len(ns)):
                    a_, b_ = ns[i], ns[j]
                    if (a_, b_) in edges:
                        continue
                    cand.setdefault((a_, b_), []).append(w)
        scored = []
        for (a_, b_), ws in cand.items():
            ra = 0.0
            for w in sorted(ws):
                ra = ra + 1.0 / deg[w]
            scored.append((a_, b_, len(ws), ra))
        scored.sort(key=lambda t: (-t[3], t[0], t[1]))
        assert got == scored[:_LP_TOP]


class TestTCloseness:
    """privacy_t_closeness: exact python replay of the TV-distance
    cross-multiplication from the raw events."""

    def test_python_replay(self, spark):
        from collections import Counter
        from decimal import Decimal

        from clinical_api_etl_spark.plans.ranking import privacy_t_closeness
        from clinical_api_etl_spark.sources.catalog import load

        sf = "/root/testdata/sf0.001"
        rows = {
            (r["event_type"], r["dow"]): r
            for r in privacy_t_closeness(spark, sf).collect()
        }
        ev = load(spark, sf, "events").filter("value is not null").collect()
        gb: Counter = Counter()
        for r in ev:
            cents = int(
                Decimal(str(r["value"])).quantize(Decimal("0.01")) * 100
            )
            dow = (int(r["ts"].timestamp() * 1000) // 86400000) % 7
            gb[(r["event_type"], dow, min(5, cents // 10000))] += 1
        n = sum(gb.values())
        groups = {(e, d) for (e, d, _b) in gb}
        bins = Counter()
        for (e, d, b), c in gb.items():
            bins[b] += c
        for (e, d) in groups:
            n_g = sum(c for (ee, dd, _b), c in gb.items() if (ee, dd) == (e, d))
            num = sum(
                abs(gb.get((e, d, b), 0) * n - cb * n_g)
                for b, cb in bins.items()
            )
            row = rows[(e, d)]
            assert row["n_g"] == n_g
            assert row["num"] == num
            assert row["t_closeness"] == num / (2 * n_g * n)
            assert 0.0 <= row["t_closeness"] <= 1.0
        assert set(rows) == groups


class TestSloBurnAlerts:
    """ops_slo_burn_alerts: replay from hourly counts; page iff both
    cross-multiplied thresholds hold."""

    def test_python_replay(self, spark):
        from collections import Counter

        from clinical_api_etl_spark.plans.analytics import ops_slo_burn_alerts
        from clinical_api_etl_spark.sources.catalog import load

        sf = "/root/testdata/sf0.001"
        rows = {r["h"]: r for r in ops_slo_burn_alerts(spark, sf).collect()}
        ev = load(spark, sf, "events").collect()
        tot: Counter = Counter()
        err: Counter = Counter()
        for r in ev:
            h = int(r["ts"].timestamp() * 1000) // 3600000
            tot[h] += 1
            if r["event_type"] == "error":
                err[h] += 1
        hours = sorted(tot)
        assert set(rows) == set(hours)
        for i, h in enumerate(hours):
            lo = max(0, i - 5)
            t6 = sum(tot[hh] for hh in hours[lo : i + 1])
            e6 = sum(err[hh] for hh in hours[lo : i + 1])
            row = rows[h]
            assert (row["tot"], row["err"]) == (tot[h], err[h])
            assert (row["tot6"], row["err6"]) == (t6, e6)
            assert row["burn_1h"] == 100 * err[h] / tot[h]
            assert row["burn_6h"] == 100 * e6 / t6
            assert row["page"] == (
                1000 * err[h] >= 144 * tot[h] and 50 * e6 >= 3 * t6
            )


class TestConformalInterval:
    """ml_conformal_interval: python replay of split/mu/q_hat/coverage
    plus the conformal coverage direction on held-out data."""

    def test_python_replay(self, spark):
        import hashlib
        from decimal import Decimal

        from clinical_api_etl_spark.plans.modeling import ml_conformal_interval
        from clinical_api_etl_spark.sources.catalog import load

        sf = "/root/testdata/sf0.001"
        rows = {
            r["event_type"]: r
            for r in ml_conformal_interval(spark, sf).collect()
        }
        ev = load(spark, sf, "events").filter("value is not null").collect()
        split: dict = {}
        for r in ev:
            h = hashlib.md5(str(r["event_id"]).encode()).hexdigest()[0]
            part = "tr" if h <= "7" else ("ca" if h <= "b" else "te")
            cents = int(
                Decimal(str(r["value"])).quantize(Decimal("0.01")) * 100
            )
            split.setdefault(r["event_type"], {"tr": [], "ca": [], "te": []})[
                part
            ].append((r["event_id"], cents))
        for et, parts in split.items():
            row = rows[et]
            n_tr = len(parts["tr"])
            mu = float(sum(c for _i, c in parts["tr"])) / float(n_tr)
            assert (row["n_train"], row["mu"]) == (n_tr, mu)
            resids = sorted(
                (abs(float(c) - mu), i) for i, c in parts["ca"]
            )
            n_ca = len(resids)
            rank = min((9 * (n_ca + 1) + 9) // 10, n_ca)
            q_hat = resids[rank - 1][0]
            assert (row["n_calib"], row["q_hat"]) == (n_ca, q_hat)
            cov = sum(
                1 for _i, c in parts["te"] if abs(float(c) - mu) <= q_hat
            )
            assert (row["n_test"], row["n_covered"]) == (len(parts["te"]), cov)
            assert row["coverage"] == cov / len(parts["te"])
            # conformal direction: held-out coverage near the 90% target
            assert row["coverage"] >= 0.8


class TestHbosOutliers:
    """anomaly_hbos_events: python replay of the log-free HBOS ranking."""

    def test_python_replay(self, spark):
        from collections import Counter
        from decimal import Decimal

        from clinical_api_etl_spark.plans.analytics import anomaly_hbos_events
        from clinical_api_etl_spark.sources.catalog import load

        sf = "/root/testdata/sf0.001"
        rows = anomaly_hbos_events(spark, sf).collect()
        assert len(rows) == 20
        ev = load(spark, sf, "events").filter("value is not null").collect()
        feats = {}
        cv: Counter = Counter(); ch: Counter = Counter(); cd: Counter = Counter()
        for r in ev:
            cents = int(Decimal(str(r["value"])).quantize(Decimal("0.01")) * 100)
            ms = int(r["ts"].timestamp() * 1000)
            f = (min(5, cents // 10000), (ms // 3600000) % 24,
                 (ms // 86400000) % 7)
            feats[r["event_id"]] = f
            cv[f[0]] += 1; ch[f[1]] += 1; cd[f[2]] += 1
        n = float(len(feats))
        scores = {
            i: (n / cv[f[0]]) * (n / ch[f[1]]) * (n / cd[f[2]])
            for i, f in feats.items()
        }
        want = sorted(scores, key=lambda i: (-scores[i], i))[:20]
        assert [r["event_id"] for r in rows] == sorted(
            (r["event_id"] for r in rows),
            key=lambda i: (-scores[i], i),
        )
        assert {r["event_id"] for r in rows} == set(want)
        for r in rows:
            assert r["hbos"] == scores[r["event_id"]]  # bit-exact products


class TestStratifiedAte:
    """causal_stratified_ate: python replay; the stratified estimator
    must remove the planted between-stratum confounding exactly."""

    def test_python_replay(self, spark):
        import hashlib
        from decimal import Decimal

        from clinical_api_etl_spark.plans.ranking import causal_stratified_ate
        from clinical_api_etl_spark.sources.catalog import load

        sf = "/root/testdata/sf0.001"
        row = causal_stratified_ate(spark, sf).collect()[0]
        ev = load(spark, sf, "events").filter("value is not null").collect()
        thr = {"view": "4", "click": "6", "purchase": "8", "signup": "a",
               "error": "c"}
        strata: dict = {}
        for r in ev:
            h = hashlib.md5(str(r["event_id"]).encode()).hexdigest()[0]
            t = h < thr[r["event_type"]]
            cents = int(
                Decimal(str(r["value"])).quantize(Decimal("0.01")) * 100
            )
            d = strata.setdefault(
                r["event_type"], {"n1": 0, "n0": 0, "y1": 0, "y0": 0}
            )
            if t:
                d["n1"] += 1; d["y1"] += cents
            else:
                d["n0"] += 1; d["y0"] += cents
        n = sum(d["n1"] + d["n0"] for d in strata.values())
        t1 = sum(d["n1"] for d in strata.values())
        t0 = sum(d["n0"] for d in strata.values())
        sy1 = sum(d["y1"] for d in strata.values())
        sy0 = sum(d["y0"] for d in strata.values())
        naive = sy1 / t1 - sy0 / t0
        ate = 0.0
        for et in sorted(strata):  # pinned fold order
            d = strata[et]
            if d["n1"] > 0 and d["n0"] > 0:
                ns = d["n1"] + d["n0"]
                ate = ate + (ns / n) * (d["y1"] / d["n1"] - d["y0"] / d["n0"])
        assert row["n"] == n
        assert row["naive_diff_cents"] == naive
        assert row["ate_cents"] == ate  # bit-exact fold
        # the planted confounding makes the naive diff differ from the
        # stratified estimate (treatment rate varies by type while the
        # outcome distribution also varies by type)
        assert row["naive_diff_cents"] != row["ate_cents"]


class TestCvmPairs:
    """stat_cvm_pairs: python replay of the weighted-squared-gap fold."""

    def test_python_replay(self, spark):
        from collections import Counter
        from decimal import Decimal

        from clinical_api_etl_spark.plans.inference import stat_cvm_pairs
        from clinical_api_etl_spark.sources.catalog import load

        sf = "/root/testdata/sf0.001"
        rows = {
            (r["ga"], r["gb"]): r for r in stat_cvm_pairs(spark, sf).collect()
        }
        ev = load(spark, sf, "events").filter("value is not null").collect()
        by_g: dict = {}
        for r in ev:
            cents = int(
                Decimal(str(r["value"])).quantize(Decimal("0.01")) * 100
            )
            by_g.setdefault(r["event_type"], Counter())[cents] += 1
        gs = sorted(by_g)
        assert set(rows) == {(a, b) for a in gs for b in gs if a < b}
        for (a, b), row in rows.items():
            ha, hb = by_g[a], by_g[b]
            na, nb = sum(ha.values()), sum(hb.values())
            assert (row["n_a"], row["n_b"]) == (na, nb)
            xs = sorted(set(ha) | set(hb))
            ca = cb = 0
            s = 0.0
            for x in xs:  # pinned value order
                ca += ha.get(x, 0)
                cb += hb.get(x, 0)
                d = float(ca * nb - cb * na)
                s = s + float(ha.get(x, 0) + hb.get(x, 0)) * (d * d)
            t = s / (float(na * nb) * float((na + nb) * (na + nb)))
            assert row["t_cvm"] == t  # bit-exact
            assert row["t_cvm"] >= 0.0


class TestAdPairs:
    """stat_ad_pairs: python replay of the Scholz-Stephens ties form."""

    def test_python_replay(self, spark):
        from collections import Counter
        from decimal import Decimal

        from clinical_api_etl_spark.plans.inference import stat_ad_pairs
        from clinical_api_etl_spark.sources.catalog import load

        sf = "/root/testdata/sf0.001"
        rows = {
            (r["ga"], r["gb"]): r for r in stat_ad_pairs(spark, sf).collect()
        }
        ev = load(spark, sf, "events").filter("value is not null").collect()
        by_g: dict = {}
        for r in ev:
            cents = int(
                Decimal(str(r["value"])).quantize(Decimal("0.01")) * 100
            )
            by_g.setdefault(r["event_type"], Counter())[cents] += 1
        gs = sorted(by_g)
        for (a, b), row in rows.items():
            ha, hb = by_g[a], by_g[b]
            na, nb = sum(ha.values()), sum(hb.values())
            nn = na + nb
            xs = sorted(set(ha) | set(hb))
            ca = cn = 0
            s = 0.0
            for x in xs:  # pinned value order
                wx = ha.get(x, 0) + hb.get(x, 0)
                ca += ha.get(x, 0)
                cn += wx
                if cn < nn:
                    num = float(nn * ca - na * cn)
                    s = s + float(wx) * (num * num) / float(cn * (nn - cn))
            a2 = s / float(na * nb)
            assert (row["n_a"], row["n_b"]) == (na, nb)
            assert row["a2"] == a2  # bit-exact
            assert row["a2"] >= 0.0


class TestEnergyDistance:
    """stat_energy_distance_pairs: brute-force O(n^2) python replay of
    the prefix-form pairwise-|diff| sums, plus metric properties."""

    def test_python_replay(self, spark):
        from decimal import Decimal

        from clinical_api_etl_spark.plans.inference import (
            stat_energy_distance_pairs,
        )
        from clinical_api_etl_spark.sources.catalog import load

        sf = "/root/testdata/sf0.001"
        rows = {
            (r["ga"], r["gb"]): r
            for r in stat_energy_distance_pairs(spark, sf).collect()
        }
        ev = load(spark, sf, "events").filter("value is not null").collect()
        by_g: dict = {}
        for r in ev:
            cents = int(
                Decimal(str(r["value"])).quantize(Decimal("0.01")) * 100
            )
            by_g.setdefault(r["event_type"], []).append(cents)

        def pair_sum(xs):  # brute force ground truth
            xs = sorted(xs)
            tot = cw = cxw = 0
            for x in xs:
                tot += x * cw - cxw
                cw += 1
                cxw += x
            return tot

        def cross_sum(a, b):
            return pair_sum(a + b) - pair_sum(a) - pair_sum(b)

        for (ga, gb), row in rows.items():
            a, b = by_g[ga], by_g[gb]
            na, nb = len(a), len(b)
            sa, sb = pair_sum(a), pair_sum(b)
            cx = cross_sum(a, b)
            assert (row["n_a"], row["n_b"]) == (na, nb)
            assert row["within_a"] == sa and row["within_b"] == sb
            assert row["cross_sum"] == cx
            e = (
                (2 * cx) / (na * nb)
                - (2 * sa) / (na * na)
                - (2 * sb) / (nb * nb)
            )
            assert row["energy_cents"] == e  # bit-exact
            assert row["energy_cents"] >= 0.0  # energy distance is >= 0


class TestClassicalDecomposition:
    """ts_classical_decomposition: python replay + the additive identity
    y = trend + seasonal + remainder holding exactly in IEEE."""

    def test_python_replay(self, spark):
        from collections import defaultdict
        from decimal import Decimal

        from clinical_api_etl_spark.plans.analytics import (
            ts_classical_decomposition,
        )
        from clinical_api_etl_spark.sources.catalog import load

        sf = "/root/testdata/sf0.001"
        rows = {
            r["day"]: r
            for r in ts_classical_decomposition(spark, sf).collect()
        }
        ev = load(spark, sf, "events").filter("value is not null").collect()
        sc: dict = defaultdict(lambda: [0, 0])
        for r in ev:
            day = int(r["ts"].timestamp() * 1000) // 86400000
            cents = int(
                Decimal(str(r["value"])).quantize(Decimal("0.01")) * 100
            )
            sc[day][0] += cents
            sc[day][1] += 1
        days = sorted(sc)
        det = {}
        for i, d in enumerate(days):
            if i < 3 or i >= len(days) - 3:
                continue
            s7 = sum(sc[days[j]][0] for j in range(i - 3, i + 4))
            c7 = sum(sc[days[j]][1] for j in range(i - 3, i + 4))
            mean = sc[d][0] / sc[d][1]
            trend = s7 / c7
            det[d] = (mean, trend, mean - trend)
        assert set(rows) == set(det)
        byw: dict = defaultdict(list)
        for d in sorted(det):
            byw[d % 7].append(det[d][2])
        seas = {}
        for wd, vals in byw.items():
            s = 0.0
            for v in vals:  # pinned day order
                s = s + v
            seas[wd] = s / len(vals)
        for d, row in rows.items():
            mean, trend, dtr = det[d]
            assert row["mean_cents"] == mean
            assert row["trend_cents"] == trend
            assert row["seasonal_cents"] == seas[d % 7]
            assert row["remainder_cents"] == dtr - seas[d % 7]
            # reconstruction: trend + seasonal + remainder recovers the
            # daily mean up to one reassociation rounding step
            recon = row["trend_cents"] + (
                row["seasonal_cents"] + row["remainder_cents"]
            )
            assert abs(recon - row["mean_cents"]) <= 1e-9 * max(
                1.0, abs(row["mean_cents"])
            )


class TestDecompositionStrength:
    """ts_decomposition_strength: replay from the decomposition rows."""

    def test_python_replay(self, spark):
        from clinical_api_etl_spark.plans.analytics import (
            ts_classical_decomposition,
            ts_decomposition_strength,
        )

        sf = "/root/testdata/sf0.001"
        row = ts_decomposition_strength(spark, sf).collect()[0]
        comp = sorted(
            ts_classical_decomposition(spark, sf).collect(),
            key=lambda r: r["day"],
        )
        n = len(comp)

        def var(vals):
            s = ss = 0.0
            for v in vals:  # pinned day order
                s = s + v
            for v in vals:
                ss = ss + v * v
            return ss / n - (s / n) * (s / n)

        r = [c["remainder_cents"] for c in comp]
        sr = [c["seasonal_cents"] + c["remainder_cents"] for c in comp]
        tr = [c["trend_cents"] + c["remainder_cents"] for c in comp]
        fs = max(0.0, 1.0 - var(r) / var(sr))
        ft = max(0.0, 1.0 - var(r) / var(tr))
        assert row["n"] == n
        assert row["f_seasonal"] == fs
        assert row["f_trend"] == ft
        assert 0.0 <= fs <= 1.0 and 0.0 <= ft <= 1.0


class TestPrfExpansion:
    def test_matches_python_replay(self, spark, tf_py):
        """Full two-pass replay in plain python: pass-1 dot products,
        top-3 feedback docs, top-8 feedback terms, 2:1 Rocchio mix,
        pass-2 rescoring — exact integer equality end to end."""
        from clinical_api_etl_spark.plans.ranking import (
            retrieval_prf_expansion,
        )

        got = {
            (r.q_id, r.doc_id, r.rnk, r.score)
            for r in retrieval_prf_expansion(spark, SF).collect()
        }
        scores = {}
        for q in range(10):
            qtf = tf_py[q]
            p1 = {}
            for d, c in tf_py.items():
                if d == q:
                    continue
                s = sum(n * qtf[t] for t, n in c.items() if t in qtf)
                if s:
                    p1[d] = s
            fb = [d for d, _ in sorted(p1.items(), key=lambda t: (-t[1], t[0]))[:3]]
            fw = collections.Counter()
            for d in fb:
                for t, n in tf_py[d].items():
                    fw[t] += n
            top_terms = sorted(fw.items(), key=lambda t: (-t[1], t[0]))[:8]
            w = {t: 2 * qtf.get(t, 0) for t in qtf}
            for t, n in top_terms:
                w[t] = w.get(t, 0) + n
            p2 = {}
            for d, c in tf_py.items():
                if d == q:
                    continue
                s = sum(n * w[t] for t, n in c.items() if t in w)
                if s:
                    p2[d] = s
            scores[q] = p2
        assert got == _topk(scores)
