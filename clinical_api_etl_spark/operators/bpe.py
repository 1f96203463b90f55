"""Byte-pair-encoding tokenizer training + distributed apply. [EXT]

The missing half of the tokenizer story: ``functions/text.py`` ships the
pre-tokenizer split (``BPE_SPLIT_PATTERN``) and vocab-coverage analysis;
this module LEARNS the merge table and applies it corpus-wide.

Posture (same as k-means / PQ, faiss convention — models train on
samples):

* **Training is driver-side on a bounded deterministic sample** — the
  lowest-N doc ids via ``TakeOrderedAndProject`` (one narrow job). Each
  BPE merge step is a full pass over the current pair counts; doing that
  distributed costs a shuffle per merge (hundreds of shuffles for a real
  vocab) for counts that fit in MBs. Sennrich et al. 2016 semantics:
  count adjacent symbol pairs over word frequencies, merge the most
  frequent, repeat; ties break lexicographically so the table is
  deterministic across runs and platforms.
* **Applying the merge table is distributed** via an Arrow-batched
  ``mapInPandas`` (a dict-driven loop per word — genuinely out of reach
  of column expressions; the merge table broadcasts in the closure).
  This is a DECLARED Arrow node like ``mm_decode_features`` — kept off
  the registry hot path, exercised by tests.

Reference scope note: the reference has no tokenizer at all (SURVEY
§2.8 — zero UDFs); this is part of the [EXT] LLM-pipeline surface.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: End-of-word marker (GPT-2 style uses a leading space; Sennrich uses a
#: suffix marker — we use the suffix form on whitespace-split words).
EOW = "</w>"


def _word_freqs(texts: list[str]) -> Counter:
    wf: Counter = Counter()
    for t in texts:
        for w in (t or "").lower().split():
            wf[w] += 1
    return wf


def learn_bpe_merges(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    num_merges: int = 50,
    sample_docs: int = 200,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the ``sample_docs`` documents
    with the lowest ids (deterministic sample; one TakeOrderedAndProject
    job). Returns the ordered merge table."""
    rows = (
        docs.select(id_col, text_col)
        .orderBy(id_col)
        .limit(sample_docs)
        .collect()
    )
    wf = _word_freqs([r[text_col] for r in rows])
    # word -> symbol tuple, seeded with characters + end-of-word marker
    words: dict[tuple[str, ...], int] = {
        (*list(w), EOW): c for w, c in wf.items()
    }
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for sym, c in words.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        # max by (count, lexicographic pair) — fully deterministic
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))[0]
        merges.append(best)
        merged: dict[tuple[str, ...], int] = {}
        ab = best[0] + best[1]
        for sym, c in words.items():
            out: list[str] = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == best[0] and sym[i + 1] == best[1]:
                    out.append(ab)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            merged[tuple(out)] = merged.get(tuple(out), 0) + c
        words = merged
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one word greedily by merge rank (the standard BPE
    inference loop)."""
    sym = [*list(word), EOW]
    while len(sym) > 1:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(sym, sym[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Distributed apply: (id, n_words, n_bpe_tokens, tokens_fp) per doc
    via Arrow-batched ``mapInPandas``; the merge table rides the task
    closure (KBs). tokens_fp fingerprints the full token stream so tests
    can pin exact output."""
    import hashlib

    ranks = {p: i for i, p in enumerate(merges)}
    schema = (
        f"{id_col} long, n_words long, n_bpe_tokens long, tokens_fp string"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                toks: list[str] = []
                wordlist = (row[text_col] or "").lower().split()
                for w in wordlist:
                    toks.extend(encode_word(w, ranks))
                fp = hashlib.md5(" ".join(toks).encode()).hexdigest()
                out.append((row[id_col], len(wordlist), len(toks), fp))
            yield pd.DataFrame(
                out, columns=[id_col, "n_words", "n_bpe_tokens", "tokens_fp"]
            )

    return docs.select(id_col, text_col).mapInPandas(run, schema)


def merge_table_df(spark, merges: list[tuple[str, str]]) -> DataFrame:
    """The learned merge table as a DataFrame (rank, left, right) — the
    persistable artifact a tokenizer service loads."""
    return spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank long, left string, right string",
    )
