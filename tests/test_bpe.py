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
