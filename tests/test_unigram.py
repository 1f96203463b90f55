"""Unigram-LM tokenizer (operators/unigram.py) — round-trip, coverage,
bit-exact python replay, and fertility invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clinical_api_etl_spark.operators.unigram import (
    FINAL_MULTI,
    MAXP,
    MAXW,
    learn_unigram,
    viterbi_pieces,
    viterbi_py,
    word_table,
)
from clinical_api_etl_spark.sources.catalog import load

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def vocab(spark):
    v = learn_unigram(load(spark, SF, "documents"))
    v.persist().count()
    return v


@pytest.fixture(scope="module")
def segmented(spark, vocab):
    w = word_table(load(spark, SF, "documents"))
    seg = viterbi_pieces(w, vocab.select("piece", "score"))
    seg.persist().count()
    return seg


class TestVocabArtifact:
    def test_contains_every_corpus_char(self, spark, vocab):
        w = word_table(load(spark, SF, "documents"))
        corpus_chars = (
            w.select(F.explode(F.split("word", "")).alias("piece"))
            .filter(F.length("piece") == 1)
            .distinct()
        )
        vocab_chars = vocab.filter(F.col("piece_len") == 1).select("piece")
        missing = corpus_chars.join(vocab_chars, "piece", "left_anti").count()
        assert missing == 0

    def test_size_and_lengths(self, vocab):
        rows = vocab.collect()
        n_chars = sum(1 for r in rows if r["piece_len"] == 1)
        n_multi = sum(1 for r in rows if r["piece_len"] >= 2)
        assert n_multi <= FINAL_MULTI
        assert n_multi > 0  # EM actually kept multi-char pieces
        assert len(rows) == n_chars + n_multi
        assert all(1 <= len(r["piece"]) <= MAXP for r in rows)

    def test_scores_are_mle(self, vocab):
        rows = vocab.collect()
        total = sum(r["cnt"] for r in rows)
        for r in rows:
            assert r["score"] == r["cnt"] / total  # bit-exact single division
        assert abs(sum(r["score"] for r in rows) - 1.0) < 1e-9


class TestRoundTrip:
    def test_every_word_rebuilds_exactly(self, segmented):
        # Viterbi pieces tile the word: concatenation must rebuild it
        # byte-for-byte for EVERY distinct corpus word.
        bad = segmented.filter(
            F.array_join("pieces", "") != F.col("word")
        ).count()
        assert bad == 0

    def test_no_word_dead_ends(self, segmented):
        # the +1 char floor guarantees a positive-score path for any word
        assert segmented.filter(F.size("pieces") == 0).count() == 0

    def test_pieces_within_length_bound(self, segmented):
        over = segmented.filter(
            F.exists("pieces", lambda p: F.length(p) > MAXP)
        ).count()
        assert over == 0

    def test_all_pieces_in_vocab(self, spark, segmented, vocab):
        used = segmented.select(F.explode("pieces").alias("piece")).distinct()
        orphans = used.join(vocab.select("piece"), "piece", "left_anti").count()
        assert orphans == 0


class TestPythonReplay:
    def test_bit_exact_segmentations(self, spark, vocab, segmented):
        scores = {r["piece"]: r["score"] for r in vocab.collect()}
        sample = segmented.orderBy("word").limit(200).collect()
        for r in sample:
            assert viterbi_py(r["word"], scores) == list(r["pieces"]), r["word"]

    def test_viterbi_py_prefers_whole_pieces(self):
        scores = {"a": 0.05, "b": 0.05, "ab": 0.4, "abab": 0.5}
        assert viterbi_py("abab", scores) == ["abab"]
        assert viterbi_py("ababab", scores) == ["abab", "ab"]
        assert viterbi_py("ba", scores) == ["b", "a"]

    def test_viterbi_py_char_fallback(self):
        scores = {"x": 0.5, "y": 0.5}
        assert viterbi_py("xyx", scores) == ["x", "y", "x"]


class TestWordTable:
    def test_length_bounds_enforced(self, spark):
        docs = spark.createDataFrame(
            [(0, "ok " + "x" * (MAXW + 1) + " fine", "en", "s", 1)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        words = {r["word"] for r in word_table(docs).collect()}
        assert words == {"ok", "fine"}


class TestFertility:
    def test_fertility_invariants(self, spark):
        from clinical_api_etl_spark.plans.registry import all_queries

        q = all_queries()["unigram_fertility_by_lang"]
        rows = q.builder(spark, SF).collect()
        assert len(rows) >= 2  # corpus has multiple langs
        for r in rows:
            assert r["n_pieces"] >= r["n_words"] > 0
            assert r["fertility"] == r["n_pieces"] / r["n_words"]
            assert 1.0 <= r["fertility"] <= float(MAXW)


class TestFamilyFertilityComposition:
    """tokenizer_family_fertility must equal the join of the two
    standalone registered queries — composition divergence is a bug."""

    def test_matches_standalone_components(self, spark):
        from clinical_api_etl_spark.plans.inference import (
            bpe_fertility_by_lang,
        )
        from clinical_api_etl_spark.plans.mlprep import (
            tokenizer_family_fertility,
            unigram_fertility_by_lang,
        )

        fam = {
            r["lang"]: r
            for r in tokenizer_family_fertility(spark, SF).collect()
        }
        bpe = {r["lang"]: r for r in bpe_fertility_by_lang(spark, SF).collect()}
        ug = {
            r["lang"]: r
            for r in unigram_fertility_by_lang(spark, SF).collect()
        }
        assert set(fam) == set(bpe) == set(ug)
        for lang, row in fam.items():
            assert row["n_words_bpe"] == bpe[lang]["n_words"]
            assert row["bpe_fertility"] == bpe[lang]["fertility"]
            assert row["n_words_ug"] == ug[lang]["n_words"]
            assert row["unigram_fertility"] == ug[lang]["fertility"]
            assert row["fertility_ratio"] == (
                ug[lang]["fertility"] / bpe[lang]["fertility"]
            )
            assert row["fertility_ratio"] > 0


class TestDriverPathParity:
    """The round-11 driver-side EM fast path must be BIT-IDENTICAL to the
    distributed rounds it replaces (same seed, same Viterbi IEEE ops via
    viterbi_py, same usage counts and single-division scores)."""

    def test_driver_equals_distributed(self, spark):
        from clinical_api_etl_spark.operators import unigram as U

        docs = load(spark, SF, "documents")
        fast = {
            r["piece"]: (r["piece_len"], r["cnt"], r["score"])
            for r in learn_unigram(docs).collect()
        }
        # force the distributed path by dropping the driver bound
        orig = U.DRIVER_UNIGRAM_MAX_WORDS
        U.DRIVER_UNIGRAM_MAX_WORDS = -1
        try:
            slow = {
                r["piece"]: (r["piece_len"], r["cnt"], r["score"])
                for r in learn_unigram(docs).collect()
            }
        finally:
            U.DRIVER_UNIGRAM_MAX_WORDS = orig
        assert set(fast) == set(slow)
        for p, (ln, cnt, score) in fast.items():
            sln, scnt, sscore = slow[p]
            assert (ln, cnt) == (sln, scnt), p
            # floats must match BITWISE, not approximately
            import struct

            assert struct.pack("<d", score) == struct.pack("<d", sscore), p
