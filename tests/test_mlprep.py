"""Tests for plans/mlprep.py: argmax determinism, JL projection linearity,
chunk-dedup passage removal, bloom-gate zero-false-negative guarantee."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from clinical_api_etl_spark.plans.mlprep import (
    _JL_SIGNS,
    agg_argmax_per_type,
    decontaminate_bloom_gate,
    emb_random_projection,
    text_chunk_dedup,
)
from clinical_api_etl_spark.sources.catalog import load

SF = "/root/testdata/sf0.001"


class TestArgmax:
    def test_tie_breaks_deterministic(self, spark):
        # Two users tied on the max total, two tied on the min: struct
        # ordering must pick the higher user for max_by, lower for min_by.
        df = spark.createDataFrame(
            [("a", 1, 5.0), ("a", 2, 5.0), ("a", 3, 1.0), ("a", 4, 1.0)],
            "event_type string, user_id long, value double",
        )
        per_user = df.groupBy("event_type", "user_id").agg(
            F.sum((F.col("value").cast("decimal(18,2)") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
        row = (
            per_user.groupBy("event_type")
            .agg(
                F.max_by("user_id", F.struct("cents", "user_id")).alias("top"),
                F.min_by("user_id", F.struct("cents", "user_id")).alias("bot"),
            )
            .collect()[0]
        )
        assert row["top"] == 2 and row["bot"] == 3

    def test_extrema_match_brute_force(self, spark):
        rows = agg_argmax_per_type(spark, SF).collect()
        ev = load(spark, SF, "events").filter(F.col("value").isNotNull())
        cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
        totals = (
            ev.groupBy("event_type", "user_id")
            .agg(F.sum(cents).alias("c"))
            .collect()
        )
        by_type: dict[str, list] = {}
        for r in totals:
            by_type.setdefault(r["event_type"], []).append((r["c"], r["user_id"]))
        for r in rows:
            pairs = by_type[r["event_type"]]
            assert (r["top_cents"], r["top_user"]) == max(pairs)
            assert (r["bottom_cents"], r["bottom_user"]) == min(pairs)


class TestRandomProjection:
    def test_matches_numpy_projection(self, spark):
        emb = load(spark, SF, "embeddings").orderBy("vec_id").limit(5).collect()
        got = {
            r["vec_id"]: [r[f"q{j}"] for j in range(8)]
            for r in emb_random_projection(spark, SF)
            .filter(F.col("vec_id").isin([r["vec_id"] for r in emb]))
            .collect()
        }
        S = np.array(_JL_SIGNS, dtype=np.float64)  # 8 x 64
        for r in emb:
            v = np.array(r["embedding"], dtype=np.float64)
            # replicate the exact left-to-right fold (numpy dot may differ
            # in the last ulp, so fold explicitly)
            want = []
            for j in range(8):
                acc = 0.0
                for i in range(64):
                    acc += v[i] * S[j, i]
                want.append(int(np.floor(acc * 1e6 + 0.5)))
            assert got[r["vec_id"]] == want

    def test_signs_are_stable_constants(self):
        # regenerating from md5 must reproduce the module table (model
        # determinism across sessions/engines)
        for j in range(8):
            for i in range(64):
                h = int(hashlib.md5(f"{j}_{i}".encode()).hexdigest()[:2], 16)
                assert _JL_SIGNS[j][i] == (1 if h < 128 else -1)


class TestChunkDedup:
    def test_planted_duplicate_chunk_removed(self, spark, tmp_path):
        # doc 1 and doc 2 share an identical 16-token passage; doc 2 keeps
        # its unique tail only.
        passage = " ".join(f"tok{i}" for i in range(16))
        tail = " ".join(f"uniq{i}" for i in range(16))
        spark.createDataFrame(
            [(1, passage), (2, passage + " " + tail)],
            "doc_id long, text string",
        ).write.parquet(str(tmp_path / "documents.parquet"))
        out = {
            r["doc_id"]: r
            for r in text_chunk_dedup(spark, str(tmp_path)).collect()
        }
        assert out[1]["n_kept"] == 1 and out[1]["n_dropped"] == 0
        assert out[2]["n_kept"] == 1 and out[2]["n_dropped"] == 1
        assert out[2]["clean_fp"] == hashlib.md5(tail.encode()).hexdigest()

    def test_chunk_accounting_conserves(self, spark):
        pdf = text_chunk_dedup(spark, SF).toPandas()
        assert (pdf["n_kept"] + pdf["n_dropped"] == pdf["n_chunks"]).all()
        assert (pdf["n_kept"] >= 0).all()


class TestBloomGate:
    def test_no_false_negatives(self, spark):
        row = decontaminate_bloom_gate(spark, SF).collect()[0]
        assert row["n_missed"] == 0
        assert row["n_candidates"] >= row["n_exact"]


class TestPagerank:
    def test_mass_conservation_and_numpy_parity(self, spark):
        from clinical_api_etl_spark.plans.mlprep import graph_pagerank_interactions

        rows = graph_pagerank_interactions(spark, SF).collect()
        total = sum(r["rank_units"] for r in rows)
        # floor-division truncation loses < |V| * (iters + 1) units
        assert 1_000_000_000_000 - total < len(rows) * 8 * 200
        assert total <= 1_000_000_000_000
        # integer pagerank should track float pagerank: replay in python
        from clinical_api_etl_spark.sources.catalog import load

        li = load(spark, SF, "lineitem").select("l_orderkey", "l_suppkey")
        o = load(spark, SF, "orders").select("o_orderkey", "o_custkey")
        e0 = {
            (f"c{r['o_custkey']}", f"s{r['l_suppkey']}")
            for r in li.join(o, li["l_orderkey"] == o["o_orderkey"]).collect()
        }
        edges = list(e0) + [(b, a) for a, b in e0]
        nodes = sorted({s for s, _ in edges})
        deg = {}
        for s, _ in edges:
            deg[s] = deg.get(s, 0) + 1
        n = len(nodes)
        r = {v: 1_000_000_000_000 // n for v in nodes}
        for _ in range(3):
            acc = {v: 0 for v in nodes}
            for s, d in edges:
                acc[d] += r[s] // deg[s]
            r = {v: 150_000_000_000 // n + 85 * acc[v] // 100 for v in nodes}
        got = {row["node"]: row["rank_units"] for row in rows}
        assert got == r


class TestSketchSurfaces:
    def test_bitmap_equals_count_distinct(self, spark):
        from clinical_api_etl_spark.plans.mlprep import a14_bitmap_distinct_users

        got = {
            r["event_type"]: r["n_users"]
            for r in a14_bitmap_distinct_users(spark, SF).collect()
        }
        want = {
            r["event_type"]: r["n"]
            for r in load(spark, SF, "events")
            .groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("n"))
            .collect()
        }
        assert got == want

    def test_hll_union_within_bound(self, spark):
        from clinical_api_etl_spark.plans.mlprep import a15_hll_union_gate

        rows = a15_hll_union_gate(spark, SF).collect()
        assert rows and all(r["within_bound"] for r in rows)


class TestRecursiveReach:
    def test_min_hops_structure(self, spark):
        from clinical_api_etl_spark.plans.mlprep import sql_recursive_reach

        rows = {r["node"]: r["min_hops"] for r in sql_recursive_reach(spark, SF).collect()}
        assert rows.get("c1") == 0
        # odd hops land on suppliers, even on customers (bipartite graph)
        for node, d in rows.items():
            assert (node[0] == "s") == (d % 2 == 1)
        assert max(rows.values()) <= 2


class TestSubstringDedup:
    """Round-6 substring-level exact dedup (operators/dedup.py:
    substring_dedup) — planted verbatim repeats must be cut, unique text
    must survive byte-exactly."""

    def _run(self, spark, tmp_path, rows, **kw):
        import hashlib as _h

        from clinical_api_etl_spark.operators.dedup import substring_dedup

        df = spark.createDataFrame(rows, "doc_id long, text string")
        return (
            {r["doc_id"]: r for r in substring_dedup(df, "doc_id", "text", **kw).collect()},
            _h,
        )

    def test_planted_repeat_cut_from_both_docs(self, spark, tmp_path):
        rep = " ".join(f"rep{i}" for i in range(8))   # exactly k tokens
        u1 = " ".join(f"one{i}" for i in range(8))
        u2 = " ".join(f"two{i}" for i in range(8))
        out, h = self._run(
            spark, tmp_path,
            [(1, u1 + " " + rep), (2, rep + " " + u2)], k=8,
        )
        # both docs lose exactly the 8-token repeated span
        for d, uniq, start in ((1, u1, 9), (2, u2, 1)):
            assert out[d]["n_cuts"] == 1
            assert out[d]["removed_tokens"] == 8
            assert out[d]["kept_tokens"] == 8
            assert out[d]["cuts_repr"] == f"{start}:8"
            assert out[d]["cleaned_md5"] == h.md5(uniq.encode()).hexdigest()

    def test_within_document_repeat_counts(self, spark, tmp_path):
        # the SAME doc repeating a k-window twice is a corpus repeat too
        rep = " ".join(f"r{i}" for i in range(8))
        mid = " ".join(f"m{i}" for i in range(8))
        out, h = self._run(spark, tmp_path, [(1, rep + " " + mid + " " + rep)], k=8)
        assert out[1]["n_cuts"] == 2
        assert out[1]["removed_tokens"] == 16
        assert out[1]["cleaned_md5"] == h.md5(mid.encode()).hexdigest()

    def test_overlapping_windows_merge_into_one_span(self, spark, tmp_path):
        # a 12-token repeated substring = 5 overlapping 8-windows -> ONE cut
        rep = " ".join(f"rep{i}" for i in range(12))
        u1 = " ".join(f"one{i}" for i in range(8))
        u2 = " ".join(f"two{i}" for i in range(8))
        out, _ = self._run(
            spark, tmp_path, [(1, rep + " " + u1), (2, u2 + " " + rep)], k=8,
        )
        assert out[1]["n_cuts"] == 1 and out[1]["removed_tokens"] == 12
        assert out[2]["cuts_repr"] == "9:12"

    def test_unique_docs_untouched(self, spark, tmp_path):
        t1 = " ".join(f"a{i}" for i in range(20))
        t2 = " ".join(f"b{i}" for i in range(20))
        out, h = self._run(spark, tmp_path, [(1, t1), (2, t2)], k=8)
        for d, t in ((1, t1), (2, t2)):
            assert out[d]["n_cuts"] == 0
            assert out[d]["kept_tokens"] == 0 or out[d]["removed_tokens"] == 0
            assert out[d]["cleaned_md5"] == h.md5(t.encode()).hexdigest()

    def test_fully_covered_doc_hashes_empty(self, spark, tmp_path):
        rep = " ".join(f"x{i}" for i in range(8))
        out, h = self._run(spark, tmp_path, [(1, rep), (2, rep)], k=8)
        for d in (1, 2):
            assert out[d]["kept_tokens"] == 0
            assert out[d]["removed_tokens"] == 8
            assert out[d]["cleaned_md5"] == h.md5(b"").hexdigest()

    def test_short_docs_survive(self, spark, tmp_path):
        out, h = self._run(
            spark, tmp_path, [(1, "tiny doc"), (2, "tiny doc")], k=8,
        )
        # shorter than k: no windows, never cut (the documented trade)
        for d in (1, 2):
            assert out[d]["n_cuts"] == 0
            assert out[d]["cleaned_md5"] == h.md5(b"tiny doc").hexdigest()

    def test_accounting_conserves_on_corpus(self, spark):
        from clinical_api_etl_spark.plans.mlprep import text_substring_dedup

        pdf = text_substring_dedup(spark, SF).toPandas()
        assert (pdf["kept_tokens"] + pdf["removed_tokens"] == pdf["total_tokens"]).all()
        assert (pdf["n_cuts"] > 0).any()  # testdata plants real repeats


class TestSequencePacking:
    def test_offsets_contiguous_within_shard(self, spark):
        from clinical_api_etl_spark.plans.mlprep import corpus_sequence_packing

        pdf = (
            corpus_sequence_packing(spark, SF)
            .toPandas()
            .sort_values(["shard_id", "doc_id"])
        )
        for _, g in pdf.groupby("shard_id"):
            assert g.iloc[0]["start_off"] == 0
            # each doc starts where the previous ended — nothing padded/lost
            assert (
                g["start_off"].iloc[1:].values == g["end_off"].iloc[:-1].values
            ).all()
            assert (g["end_off"] - g["start_off"] == g["n_tokens"]).all()

    def test_sequence_ids_match_offsets(self, spark):
        from clinical_api_etl_spark.plans.mlprep import corpus_sequence_packing

        pdf = corpus_sequence_packing(spark, SF).toPandas()
        L = 128
        assert (pdf["first_seq"] == pdf["start_off"] // L).all()
        assert (pdf["last_seq"] == (pdf["end_off"] - 1) // L).all()
        assert (pdf["first_seq"] <= pdf["last_seq"]).all()


class TestMixtureSampling:
    def test_budget_conserved_and_temperature_flattens(self, spark):
        import math

        from clinical_api_etl_spark.plans.mlprep import (
            mixture_temperature_sampling,
        )

        pdf = mixture_temperature_sampling(spark, SF).toPandas()
        assert pdf["alloc"].sum() == 10_000
        # alpha=0.5 flattens: the biggest language's share of the budget
        # must be strictly below its share of the corpus, smallest above.
        pdf = pdf.sort_values("n_docs")
        tot = pdf["n_docs"].sum()
        big, small = pdf.iloc[-1], pdf.iloc[0]
        assert big["alloc"] / 10_000 < big["n_docs"] / tot
        assert small["alloc"] / 10_000 > small["n_docs"] / tot
        # and each alloc is within 1 unit of its exact sqrt share
        ws = {r["lang"]: math.sqrt(r["n_docs"]) for _, r in pdf.iterrows()}
        s = sum(ws.values())
        for _, r in pdf.iterrows():
            assert abs(r["alloc"] - 10_000 * ws[r["lang"]] / s) < 1.0


class TestSq8Quantization:
    def test_matches_python_replay(self, spark):
        import math

        from clinical_api_etl_spark.plans.mlprep import (
            _SQ_DIM,
            emb_sq8_quantization,
        )

        got = {r["vec_id"]: r for r in emb_sq8_quantization(spark, SF).collect()}
        rows = load(spark, SF, "embeddings").select("vec_id", "embedding").collect()
        vecs = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in rows}
        mn = [min(v[j] for v in vecs.values()) for j in range(_SQ_DIM)]
        mx = [max(v[j] for v in vecs.values()) for j in range(_SQ_DIM)]
        assert len(got) == len(vecs)
        for vid, v in vecs.items():
            codes = []
            for j in range(_SQ_DIM):
                if mx[j] > mn[j]:
                    c = min(math.floor((v[j] - mn[j]) / (mx[j] - mn[j]) * 255.0), 255)
                else:
                    c = 0
                assert 0 <= c <= 255
                codes.append(int(c))
            g = got[vid]
            assert g["code_sum"] == sum(codes)
            assert g["code_min"] == min(codes)
            assert g["code_max"] == max(codes)
            assert g["code_checksum"] == sum((j + 1) * c for j, c in enumerate(codes))


class TestDsirImportance:
    def test_matches_python_replay(self, spark):
        from clinical_api_etl_spark.plans.mlprep import (
            _DSIR_CAP,
            corpus_dsir_importance,
        )

        got = {r["doc_id"]: r for r in corpus_dsir_importance(spark, SF).collect()}
        rows = load(spark, SF, "documents").select("doc_id", "text", "lang").collect()
        import re as _re

        def toks(t):
            return _re.split(r"\s+", t.strip().lower())

        tgt, raw = {}, {}
        t_total = r_total = 0
        vocab = set()
        raw_docs = {}
        for r in rows:
            ws = toks(r["text"])
            vocab.update(ws)
            if r["lang"] == "en":
                for w in ws:
                    tgt[w] = tgt.get(w, 0) + 1
                t_total += len(ws)
            else:
                for w in ws:
                    raw[w] = raw.get(w, 0) + 1
                r_total += len(ws)
                raw_docs[r["doc_id"]] = ws[:_DSIR_CAP]
        v = len(vocab)
        assert set(got) == set(raw_docs)
        for did, ws in raw_docs.items():
            ratios = sorted(
                (w, ((tgt.get(w, 0) + 1) * (r_total + v)) / ((raw[w] + 1) * (t_total + v)))
                for w in ws
            )
            weight = 1.0
            for _, rr in ratios:
                weight *= rr
            g = got[did]
            assert g["n_scored"] == len(ws)
            assert g["weight"] == weight  # bit-exact: same IEEE op sequence

    def test_en_pool_excluded_and_weights_positive(self, spark):
        from clinical_api_etl_spark.plans.mlprep import corpus_dsir_importance

        rows = corpus_dsir_importance(spark, SF).collect()
        en_ids = {
            r["doc_id"]
            for r in load(spark, SF, "documents")
            .filter(F.col("lang") == "en")
            .collect()
        }
        for r in rows:
            assert r["doc_id"] not in en_ids
            assert r["weight"] > 0


class TestCurriculumPhases:
    def test_matches_python_replay(self, spark):
        import re as _re

        from clinical_api_etl_spark.plans.mlprep import corpus_curriculum_phases

        got = {r["doc_id"]: r for r in corpus_curriculum_phases(spark, SF).collect()}
        rows = load(spark, SF, "documents").select("doc_id", "text").collect()
        freq: dict = {}
        docs = {}
        for r in rows:
            ws = _re.split(r"\s+", r["text"].strip().lower())
            docs[r["doc_id"]] = ws
            for w in ws:
                freq[w] = freq.get(w, 0) + 1
        total = sum(freq.values())
        nv = len(freq)
        assert len(got) == len(docs)
        for did, ws in docs.items():
            n_rare = sum(1 for w in ws if freq[w] * nv < total)
            dm = (1000 * n_rare) // len(ws)
            phase = 0 if dm < 250 else 1 if dm < 500 else 2 if dm < 750 else 3
            g = got[did]
            assert g["n_tokens"] == len(ws)
            assert g["n_rare"] == n_rare
            assert g["difficulty_milli"] == dm
            assert g["phase"] == phase


class TestSq8TopK:
    def test_recall_vs_exact_l2(self, spark):
        """SQ8 asymmetric search is near-lossless on this corpus
        (measured 0.98 at sf0.001 / 0.94 at sf0.01); 0.8 is the floor."""
        from clinical_api_etl_spark.operators.pq import l2_topk
        from clinical_api_etl_spark.plans.mlprep import ann_sq8_topk

        emb = load(spark, SF, "embeddings")
        exact = {
            (r["query_id"], r["neighbor_id"])
            for r in l2_topk(emb.filter(F.col("vec_id") < 10), emb, k=5)
            .select("query_id", "neighbor_id")
            .collect()
        }
        approx = {
            (r["query_id"], r["neighbor_id"])
            for r in ann_sq8_topk(spark, SF)
            .select("query_id", "neighbor_id")
            .collect()
        }
        assert len(exact & approx) / len(exact) >= 0.8

    def test_rank_total_order(self, spark):
        from clinical_api_etl_spark.plans.mlprep import _SQ_K, ann_sq8_topk

        rows = ann_sq8_topk(spark, SF).collect()
        per: dict = {}
        for r in rows:
            per.setdefault(r["query_id"], []).append(r)
        for q, rs in per.items():
            rs.sort(key=lambda r: r["rank"])
            assert [r["rank"] for r in rs] == list(range(1, _SQ_K + 1))
            for a, b in zip(rs, rs[1:]):
                assert (a["adist"], a["neighbor_id"]) < (b["adist"], b["neighbor_id"])


class TestMlmCorruption:
    def test_matches_python_replay(self, spark):
        import hashlib as _h
        import re as _re

        from clinical_api_etl_spark.plans.mlprep import (
            _MLM_PCT,
            corpus_mlm_corruption,
        )

        got = {r["doc_id"]: r for r in corpus_mlm_corruption(spark, SF).collect()}
        rows = load(spark, SF, "documents").select("doc_id", "text").collect()
        assert len(got) == len(rows)
        any_masked = False
        for r in rows:
            ws = _re.split(r"\s+", r["text"].strip().lower())
            ct, mt = [], []
            for i, w in enumerate(ws, start=1):
                hv = int(_h.md5(f"{r['doc_id']}:{i}".encode()).hexdigest()[:4], 16)
                if hv % 100 < _MLM_PCT:
                    ct.append("[MASK]")
                    mt.append(f"{i}:{w}")
                else:
                    ct.append(w)
            g = got[r["doc_id"]]
            assert g["n_tokens"] == len(ws)
            assert g["n_masked"] == len(mt)
            assert g["corrupted_text"] == " ".join(ct)
            assert g["mask_targets"] == " ".join(mt)
            any_masked = any_masked or bool(mt)
        assert any_masked


class TestNgramNovelty:
    def test_matches_python_replay(self, spark):
        import hashlib as _h
        import re as _re

        from clinical_api_etl_spark.plans.mlprep import _NOV_K, text_ngram_novelty

        got = {r["doc_id"]: r for r in text_ngram_novelty(spark, SF).collect()}
        rows = load(spark, SF, "documents").select("doc_id", "text").collect()
        wins: dict = {}
        owners: dict = {}
        for r in rows:
            ws = _re.split(r"\s+", r["text"].strip().lower())
            if len(ws) < _NOV_K:
                continue
            hs = [
                _h.md5(" ".join(ws[i : i + _NOV_K]).encode()).hexdigest()
                for i in range(len(ws) - _NOV_K + 1)
            ]
            wins[r["doc_id"]] = hs
            for h in hs:
                owners.setdefault(h, set()).add(r["doc_id"])
        assert set(got) == set(wins)
        for did, hs in wins.items():
            shared = sum(1 for h in hs if len(owners[h]) >= 2)
            g = got[did]
            assert g["n_windows"] == len(hs)
            assert g["n_shared"] == shared
            assert g["novelty"] == (len(hs) - shared) / len(hs)

    def test_planted_cross_doc_repeat_lowers_novelty(self, spark):
        from clinical_api_etl_spark.plans.mlprep import text_ngram_novelty

        base = load(spark, SF, "documents")
        # clone one doc's text under a new id: every window of the pair
        # becomes shared, novelty 0 for both
        victim = base.limit(1).selectExpr("doc_id + 1000000 AS doc_id", "text",
                                          "lang", "source", "n_chars")
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            base.unionByName(victim).write.parquet(f"{d}/documents.parquet")
            rows = {r["doc_id"]: r for r in text_ngram_novelty(spark, d).collect()}
        vid = victim.collect()[0]["doc_id"]
        assert rows[vid]["novelty"] == 0.0
        assert rows[vid - 1000000]["novelty"] == 0.0


class TestBinaryHammingTopK:
    def test_recall_floor_and_rerank_order(self, spark):
        from clinical_api_etl_spark.operators.similarity import cosine_topk
        from clinical_api_etl_spark.plans.mlprep import (
            _BQ_K,
            ann_binary_hamming_topk,
        )

        emb = load(spark, SF, "embeddings")
        exact = {
            (r["query_id"], r["neighbor_id"])
            for r in cosine_topk(emb.filter(F.col("vec_id") < 10), emb, k=_BQ_K)
            .select("query_id", "neighbor_id")
            .collect()
        }
        rows = ann_binary_hamming_topk(spark, SF).collect()
        approx = {(r["query_id"], r["neighbor_id"]) for r in rows}
        # Floor raised 0.5->0.6 (VERDICT r07 task 1); measured 0.70/0.68/0.78
        # at sf0.001/0.01/0.1 with the corpus-proportional shortlist.
        assert len(exact & approx) / len(exact) >= 0.6
        per: dict = {}
        for r in rows:
            per.setdefault(r["query_id"], []).append(r)
        for q, rs in per.items():
            rs.sort(key=lambda r: r["rank"])
            assert [r["rank"] for r in rs] == list(range(1, _BQ_K + 1))
            for a, b in zip(rs, rs[1:]):
                assert (-a["cos_sim"], a["neighbor_id"]) < (
                    -b["cos_sim"],
                    b["neighbor_id"],
                )

    def test_sign_bits_match_python(self, spark):
        from clinical_api_etl_spark.plans.mlprep import _bq_half

        emb = load(spark, SF, "embeddings")
        got = emb.selectExpr(
            "vec_id",
            f"({_bq_half(0, 'CAST(element_at(embedding, {i}) AS DOUBLE)')}) AS lo",
            f"({_bq_half(32, 'CAST(element_at(embedding, {i}) AS DOUBLE)')}) AS hi",
        ).collect()
        vecs = {r["vec_id"]: r for r in emb.collect()}
        for r in got:
            v = [float(x) for x in vecs[r["vec_id"]]["embedding"]]
            lo = sum((1 << j) for j in range(32) if v[j] > 0)
            hi = sum((1 << j) for j in range(32) if v[32 + j] > 0)
            assert (r["lo"], r["hi"]) == (lo, hi)


class TestCorpusDataCard:
    def test_consistent_with_component_queries(self, spark):
        """The card's numbers must agree with the standalone queries it
        composes — the composition-catches-divergence gate."""
        from clinical_api_etl_spark.plans.mlprep import (
            corpus_curriculum_phases,
            corpus_data_card,
            text_ngram_novelty,
        )

        card = {r["lang"]: r for r in corpus_data_card(spark, SF).collect()}
        docs = load(spark, SF, "documents").select("doc_id", "lang", "text").collect()
        lang_of = {r["doc_id"]: r["lang"] for r in docs}
        # doc/token counts
        import re as _re

        per: dict = {}
        for r in docs:
            ws = _re.split(r"\s+", r["text"].strip().lower())
            d = per.setdefault(r["lang"], [0, 0])
            d[0] += 1
            d[1] += len(ws)
        for lang, (nd, nt) in per.items():
            assert card[lang]["n_docs"] == nd
            assert card[lang]["n_tokens"] == nt
        # novelty composes text_ngram_novelty's per-doc counts
        nov = text_ngram_novelty(spark, SF).collect()
        agg: dict = {}
        for r in nov:
            a = agg.setdefault(lang_of[r["doc_id"]], [0, 0])
            a[0] += r["n_windows"]
            a[1] += r["n_shared"]
        for lang, (nw, ns) in agg.items():
            assert card[lang]["n_windows"] == nw
            assert card[lang]["n_shared"] == ns
            assert card[lang]["novelty"] == (nw - ns) / nw
        # phases compose corpus_curriculum_phases (easy = phase 0/1)
        ph = corpus_curriculum_phases(spark, SF).collect()
        pc: dict = {}
        for r in ph:
            p = pc.setdefault(lang_of[r["doc_id"]], [0, 0])
            p[0 if r["phase"] <= 1 else 1] += 1
        for lang, (ne, nh) in pc.items():
            assert card[lang]["n_easy"] == ne
            assert card[lang]["n_hard"] == nh
        # dup docs: members of exact-duplicate groups
        import hashlib as _h

        groups: dict = {}
        for r in docs:
            groups.setdefault(_h.md5(r["text"].encode()).hexdigest(), []).append(
                r["lang"]
            )
        dup: dict = {}
        for langs in groups.values():
            if len(langs) >= 2:
                for lg in langs:
                    dup[lg] = dup.get(lg, 0) + 1
        for lang in card:
            assert card[lang]["n_dup_docs"] == dup.get(lang, 0)


class TestDoremiDomainWeights:
    """corpus_doremi_domain_weights: bit-exact python replay of the
    linearized-MWU trajectory from the collected loss table, plus
    mixture invariants."""

    def test_python_replay_bit_exact(self, spark):
        from clinical_api_etl_spark.plans.mlprep import (
            _DR_ROUNDS,
            corpus_doremi_domain_weights,
        )

        rows = corpus_doremi_domain_weights(spark, SF).collect()
        assert len(rows) >= 2
        loss = {r["source"]: r["loss"] for r in rows}
        for r in rows:
            assert r["loss"] == r["n_rare"] / r["n_tokens"]  # one division
        w = {s: 1.0 / float(len(loss)) for s in loss}
        for _ in range(_DR_ROUNDS):
            t = {s: w[s] * (1.0 + 0.1 * loss[s]) for s in w}
            z = 0.0
            for s in sorted(t):  # pinned fold order
                z = z + t[s]
            w = {s: t[s] / z for s in t}
        for r in rows:
            assert r["weight"] == w[r["source"]]  # bit-exact trajectory
        # MWU direction: correctly-rounded multiply/divide are monotone,
        # so a larger loss can never end with a smaller weight. (No
        # comparison against exact uniform — with near-tied losses the
        # trajectory sits within ulps of 1/n on either side.)
        hardest = max(loss, key=lambda s: (loss[s], s))
        easiest = min(loss, key=lambda s: (loss[s], s))
        if loss[hardest] > loss[easiest]:
            assert w[hardest] >= w[easiest]
        assert abs(sum(w.values()) - 1.0) < 1e-12


class TestDoremiResample:
    """corpus_doremi_resample: exact budget conservation, largest-
    remainder replay from the (already replay-tested) weights, and
    md5-order selection replay."""

    def test_manifest_replay(self, spark):
        import hashlib

        from clinical_api_etl_spark.plans.mlprep import (
            _DRS_BUDGET,
            corpus_doremi_domain_weights,
            corpus_doremi_resample,
        )
        from clinical_api_etl_spark.sources.catalog import load

        rows = corpus_doremi_resample(spark, SF).collect()
        assert len(rows) == _DRS_BUDGET  # nothing lost, nothing extra
        w = {
            r["source"]: r["weight"]
            for r in corpus_doremi_domain_weights(spark, SF).collect()
        }
        import math

        raw = {s: _DRS_BUDGET * w[s] for s in w}
        base = {s: int(math.floor(raw[s])) for s in raw}
        rem = {s: raw[s] - math.floor(raw[s]) for s in raw}
        leftover = _DRS_BUDGET - sum(base.values())
        topped = sorted(rem, key=lambda s: (-rem[s], s))[:leftover]
        alloc = {s: base[s] + (1 if s in topped else 0) for s in base}
        got_alloc: dict = {}
        for r in rows:
            got_alloc[r["source"]] = max(
                got_alloc.get(r["source"], 0), r["sel_rank"]
            )
            assert r["alloc"] == alloc[r["source"]]
        assert got_alloc == {s: a for s, a in alloc.items() if a > 0}
        # md5-order selection replay per domain
        docs = load(spark, SF, "documents").select("source", "doc_id").collect()
        by_src: dict = {}
        for d in docs:
            by_src.setdefault(d["source"], []).append(d["doc_id"])
        selected = {(r["source"], r["doc_id"]) for r in rows}
        for s, ids in by_src.items():
            ordered = sorted(
                ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i)
            )
            want = set(ordered[: alloc.get(s, 0)])
            assert {i for (src, i) in selected if src == s} == want
