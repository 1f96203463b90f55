"""BPE tokenizer training (driver-side sample, deterministic) and
distributed Arrow apply."""

from __future__ import annotations

import hashlib

from clinical_api_etl_spark.operators.bpe import (
    EOW,
    bpe_encode,
    encode_word,
    learn_bpe_merges,
    merge_table_df,
)
from clinical_api_etl_spark.sources.catalog import load

SF = "/root/testdata/sf0.001"


class TestLearn:
    def test_textbook_corpus(self, spark):
        # Sennrich's canonical example shape: 'low' x5, 'lowest' x2 —
        # ('l','o') or ('o','w') tie at 7; lexicographic tie-break picks
        # ('o','w')... ('l','o') < ('o','w') so max picks ('o','w').
        df = spark.createDataFrame(
            [(1, "low low low low low lowest lowest")],
            "doc_id long, text string",
        )
        merges = learn_bpe_merges(df, num_merges=3, sample_docs=10)
        assert merges[0] == ("o", "w")
        assert len(merges) == 3

    def test_deterministic_across_calls(self, spark):
        docs = load(spark, SF, "documents")
        m1 = learn_bpe_merges(docs, num_merges=30, sample_docs=100)
        m2 = learn_bpe_merges(docs, num_merges=30, sample_docs=100)
        assert m1 == m2 and len(m1) == 30

    def test_merge_table_artifact(self, spark):
        docs = load(spark, SF, "documents")
        merges = learn_bpe_merges(docs, num_merges=10, sample_docs=50)
        tbl = merge_table_df(spark, merges).collect()
        assert [(r["left"], r["right"]) for r in sorted(tbl, key=lambda r: r["rank"])] == merges


class TestEncode:
    def test_encode_word_reaches_whole_word(self, spark):
        df = spark.createDataFrame(
            [(1, "aaaa aaaa aaaa")], "doc_id long, text string"
        )
        merges = learn_bpe_merges(df, num_merges=10, sample_docs=10)
        ranks = {p: i for i, p in enumerate(merges)}
        # enough merges: the whole word collapses to one token
        assert encode_word("aaaa", ranks) == ["aaaa" + EOW]

    def test_distributed_apply_matches_local_replay(self, spark):
        docs = load(spark, SF, "documents").limit(40)
        merges = learn_bpe_merges(docs, num_merges=25, sample_docs=40)
        got = {
            r["doc_id"]: (r["n_words"], r["n_bpe_tokens"], r["tokens_fp"])
            for r in bpe_encode(docs, merges).collect()
        }
        ranks = {p: i for i, p in enumerate(merges)}
        for row in docs.collect():
            words = row["text"].lower().split()
            toks = [t for w in words for t in encode_word(w, ranks)]
            fp = hashlib.md5(" ".join(toks).encode()).hexdigest()
            assert got[row["doc_id"]] == (len(words), len(toks), fp)

    def test_more_merges_never_increase_tokens(self, spark):
        docs = load(spark, SF, "documents").limit(40)
        m40 = learn_bpe_merges(docs, num_merges=40, sample_docs=40)
        short = sum(
            r["n_bpe_tokens"] for r in bpe_encode(docs, m40[:10]).collect()
        )
        full = sum(r["n_bpe_tokens"] for r in bpe_encode(docs, m40).collect())
        assert full <= short


# ---------------------------------------------------------------------------
# Full-corpus distributed learner (hash-gated registry twin).
# ---------------------------------------------------------------------------

import re

import pandas as pd

from clinical_api_etl_spark.operators.bpe import (  # noqa: E402
    apply_merges_py,
    learn_bpe_distributed,
)


def _learn_py(word_freq: dict[str, int], n: int) -> list[tuple]:
    """Reference replay: same counts, same (count DESC, lex MIN) ties,
    same leftmost-nonoverlapping merges as learn_bpe_distributed."""
    syms = {w: apply_merges_py(w, []) for w in word_freq}
    out = []
    for it in range(1, n + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, f in word_freq.items():
            toks = syms[w].split(" ")
            for a, b in zip(toks, toks[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (lhs, rhs), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        out.append((it, lhs, rhs, lhs + rhs, cnt))
        for w in syms:
            doubled = " " + syms[w].replace(" ", "  ") + " "
            merged = doubled.replace(f" {lhs}  {rhs} ", f" {lhs}{rhs} ")
            syms[w] = merged.replace("  ", " ").strip()
    return out


class TestDistributedLearner:
    def test_known_merges(self, spark):
        # 'low' x5, 'lower' x2: (l,o) and (o,w) tie at 7; lex-min tie
        # break picks (l,o) first (the sample-trained learner above picks
        # (o,w) -- conventions documented in the module).
        words = spark.createDataFrame([("low", 5), ("lower", 2)], ["word", "freq"])
        rows = learn_bpe_distributed(words, 3)
        assert (rows[0].lhs, rows[0].rhs, rows[0].pair_count) == ("l", "o", 7)
        assert rows[0].merged == "lo"
        got = [(r.it, r.lhs, r.rhs, r.merged, r.pair_count) for r in rows]
        assert got == _learn_py({"low": 5, "lower": 2}, 3)

    def test_overlapping_pairs_leftmost(self, spark):
        # 'aaa' -> a a a </w>: pair (a,a) counts both overlaps (2), merge
        # rewrites leftmost-nonoverlapping: 'aa a </w>'.
        words = spark.createDataFrame([("aaa", 1)], ["word", "freq"])
        rows = learn_bpe_distributed(words, 1)
        assert (rows[0].lhs, rows[0].rhs, rows[0].pair_count) == ("a", "a", 2)
        assert apply_merges_py("aaa", [("a", "a")]) == "aa a </w>"

    def test_multichar_symbol_boundary_safety(self, spark):
        words = spark.createDataFrame([("ab", 3), ("cab", 2)], ["word", "freq"])
        rows = learn_bpe_distributed(words, 2)
        got = [(r.it, r.lhs, r.rhs, r.merged, r.pair_count) for r in rows]
        assert got == _learn_py({"ab": 3, "cab": 2}, 2)

    def test_early_stop_when_fully_merged(self, spark):
        # 'x' -> 'x </w>' -> one merge leaves a single symbol -> stop.
        words = spark.createDataFrame([("x", 1)], ["word", "freq"])
        rows = learn_bpe_distributed(words, 5)
        assert len(rows) == 1
        assert rows[0].merged == "x</w>"

    def test_matches_python_replay_sf0001(self, spark):
        from clinical_api_etl_spark.plans.inference import bpe_learn_merges

        docs = pd.read_parquet(f"{SF}/documents.parquet")
        freq: dict[str, int] = {}
        for text in docs["text"]:
            for tok in re.split(r"\s+", str(text).strip().lower()):
                freq[tok] = freq.get(tok, 0) + 1
        expect = _learn_py(freq, 6)
        got = [
            (r.it, r.lhs, r.rhs, r.merged, r.pair_count)
            for r in bpe_learn_merges(spark, SF).collect()
        ]
        assert got == expect


class TestTokenizerArtifact:
    """Round-6: vocab table + id-level round-trip (VERDICT r05 task 5)."""

    def test_vocab_ids_contiguous_and_ranked(self, spark):
        from clinical_api_etl_spark.plans.inference import bpe_vocab_table

        rows = bpe_vocab_table(spark, "/root/testdata/sf0.001").collect()
        ids = sorted(r["token_id"] for r in rows)
        assert ids == list(range(len(rows)))  # dense 0..V-1
        base = [r for r in rows if r["kind"] == "base"]
        merged = sorted(
            (r for r in rows if r["kind"] == "merge"),
            key=lambda r: r["merge_rank"],
        )
        assert all(r["merge_rank"] == -1 for r in base)
        # merges occupy the top of the id space in learned order
        n_base = len(base)
        assert [r["token_id"] for r in merged] == [
            n_base + i for i in range(len(merged))
        ]
        # base ids follow lexicographic token order
        base_sorted = sorted(base, key=lambda r: r["token"])
        assert [r["token_id"] for r in base_sorted] == list(range(n_base))

    def test_roundtrip_is_identity_on_corpus(self, spark):
        from clinical_api_etl_spark.plans.inference import bpe_roundtrip_identity

        pdf = bpe_roundtrip_identity(spark, "/root/testdata/sf0.001").toPandas()
        assert (pdf["n_roundtrip_ok"] == pdf["n_words"]).all()
        assert (pdf["orig_md5"] == pdf["decoded_md5"]).all()


class TestFertility:
    def test_fertility_bounds_and_en_lowest(self, spark):
        from clinical_api_etl_spark.plans.inference import bpe_fertility_by_lang

        pdf = bpe_fertility_by_lang(spark, "/root/testdata/sf0.001").toPandas()
        # every word is at least 1 subtoken; fertility is tokens/words
        assert (pdf["fertility"] >= 1.0).all()
        assert (pdf["n_bpe_tokens"] >= pdf["n_words"]).all()
        assert abs(
            pdf["fertility"] - pdf["n_bpe_tokens"] / pdf["n_words"]
        ).max() < 1e-12


class TestWordPieceLearn:
    @staticmethod
    def _py_wordpiece(word_freqs, n):
        """Independent replay: likelihood-scored merges over python dicts,
        same space-separated symbol representation and replace semantics."""
        from collections import Counter

        sym = Counter()
        for w, f in word_freqs.items():
            sym[" ".join(list(w)) + " </w>"] += f
        out = []
        for it in range(1, n + 1):
            uni, pairs = Counter(), Counter()
            for s, f in sym.items():
                tk = s.split(" ")
                for t in tk:
                    uni[t] += f
                for a, b in zip(tk, tk[1:]):
                    pairs[(a, b)] += f
            if not pairs:
                break
            best = max(
                pairs,
                key=lambda p: (float(pairs[p]) / float(uni[p[0]] * uni[p[1]]),),
            )
            # deterministic tie-break: score DESC then (lhs, rhs) ASC
            bs = float(pairs[best]) / float(uni[best[0]] * uni[best[1]])
            cands = sorted(
                p for p in pairs
                if float(pairs[p]) / float(uni[p[0]] * uni[p[1]]) == bs
            )
            best = cands[0]
            out.append(
                (it, best[0], best[1], best[0] + best[1], pairs[best],
                 uni[best[0]], uni[best[1]], bs)
            )
            nxt = Counter()
            for s, f in sym.items():
                tk = s.split(" ")
                merged, i = [], 0
                while i < len(tk):
                    if i + 1 < len(tk) and (tk[i], tk[i + 1]) == best:
                        merged.append(tk[i] + tk[i + 1])
                        i += 2
                    else:
                        merged.append(tk[i])
                        i += 1
                nxt[" ".join(merged)] += f
            sym = nxt
        return out

    def test_matches_python_replay_and_diverges_from_bpe(self, spark):
        import struct

        from clinical_api_etl_spark.operators.bpe import (
            learn_bpe_distributed,
            learn_wordpiece_distributed,
        )

        # 'th' is the most FREQUENT pair, but 'q'+'u' is perfectly
        # associated (every q is followed by u) — WordPiece must pick the
        # likelihood winner where BPE picks the count winner.
        word_freqs = {"the": 20, "then": 10, "tea": 8, "quit": 3, "quo": 3}
        words = spark.createDataFrame(
            list(word_freqs.items()), "word string, freq long"
        )
        got = learn_wordpiece_distributed(words, 4)
        want = self._py_wordpiece(word_freqs, 4)
        assert len(got) == len(want)
        for g, w in zip(got, want):
            assert (g.it, g.lhs, g.rhs, g.merged, g.pair_count,
                    g.lhs_count, g.rhs_count) == w[:7]
            assert struct.pack("<d", g.score) == struct.pack("<d", w[7])
        bpe = learn_bpe_distributed(words, 4)
        assert [(r.lhs, r.rhs) for r in bpe] != [(r.lhs, r.rhs) for r in got]
        # the defining pick: q+u is perfectly associated (every q is
        # followed by u: 6/(6*6) beats the merely-frequent 'th')
        assert (got[0].lhs, got[0].rhs) == ("q", "u")
        assert got[0].score == 6 / (6 * 6)
        assert (bpe[0].lhs, bpe[0].rhs) != ("q", "u")


class TestMergeLearnDriverParity:
    """The round-11 driver-side merge learning must reproduce the
    distributed loops exactly: integer pair/symbol counts, the single
    BIGINT->double WordPiece division (bitwise), and the space-doubling
    leftmost-non-overlapping merge apply (the round-7 three-engine
    rule)."""

    def test_driver_equals_distributed(self, spark):
        import struct

        from pyspark.sql import functions as F

        import clinical_api_etl_spark.operators.bpe as B
        from clinical_api_etl_spark.functions.text import tokens
        from clinical_api_etl_spark.sources.catalog import load

        docs = load(spark, "/root/testdata/sf0.001", "documents")
        words = (
            docs.select(F.explode_outer(tokens(F.col("text"))).alias("word"))
            .filter(F.col("word").isNotNull())
            .groupBy("word")
            .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        )

        def norm(rows):
            return [
                tuple(
                    struct.pack("<d", x).hex() if isinstance(x, float) else x
                    for x in r
                )
                for r in rows
            ]

        fb = norm(B.learn_bpe_distributed(words, 6))
        fw = norm(B.learn_wordpiece_distributed(words, 6))
        orig = B.DRIVER_BPE_MAX_WORDS
        B.DRIVER_BPE_MAX_WORDS = -1
        try:
            sb = norm(B.learn_bpe_distributed(words, 6))
            sw = norm(B.learn_wordpiece_distributed(words, 6))
        finally:
            B.DRIVER_BPE_MAX_WORDS = orig
        assert fb == sb and len(fb) == 6
        assert fw == sw and len(fw) == 6
        spark.catalog.clearCache()
