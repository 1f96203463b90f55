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


# ---------------------------------------------------------------------------
# Full-corpus distributed merge learning (hash-gated twin of the
# sample-trained learner above; registry query `bpe_learn_merges`).
# ---------------------------------------------------------------------------
#
# Where ``learn_bpe_merges`` trains driver-side on a bounded sample (the
# faiss posture — right for hundreds of merges), ``learn_bpe_distributed``
# runs each iteration corpus-wide: pair counting is a map-side-combinable
# explode/groupBy over the (word, freq) aggregate, the argmax collects ONE
# row per iteration, and merge application is a regex-free narrow string
# rewrite. The space-doubling trick makes plain ``replace`` (left-to-right
# non-overlapping in the JVM, DuckDB, and python alike) token-boundary
# safe, so the learned table is value-hash-gated against an unrolled
# DuckDB oracle (plans/inference.py:_bpe_oracle). Tie-break here is
# (count DESC, lexicographically SMALLEST pair) — the convention the
# oracle's ORDER BY mirrors; the sample-trained learner above predates it
# and keeps (count, lexicographically largest) for compatibility with its
# pinned tests.


def initial_symbols(word) -> "F.Column":
    """'abc' -> 'a b c </w>' (space-separated symbol string)."""
    return F.concat(F.regexp_replace(word, "(.)", "$1 "), F.lit(EOW))


def _apply_merge(sym, left, right):
    """Leftmost non-overlapping merge of the (left, right) symbol pair.

    ``left``/``right`` may be literal Columns — string literals land in
    the codegen references array, not the generated source, so every
    iteration reuses one compiled class (verified: per-iteration cost
    after the first is ~1s of fixed job overhead, not compile time)."""
    doubled = F.concat(F.lit(" "), F.replace(sym, F.lit(" "), F.lit("  ")), F.lit(" "))
    pattern = F.concat(F.lit(" "), left, F.lit("  "), right, F.lit(" "))
    replacement = F.concat(F.lit(" "), left, right, F.lit(" "))
    merged = F.replace(doubled, pattern, replacement)
    return F.trim(F.replace(merged, F.lit("  "), F.lit(" ")))


def _pair_counts(symtab: DataFrame) -> DataFrame:
    toks = F.split(F.col("sym"), " ")
    pairs = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("lhs"),
                F.element_at(toks, i + 1).alias("rhs"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<lhs:string,rhs:string>>"))
    return (
        symtab.select("freq", F.explode_outer(pairs).alias("p"))
        .filter(F.col("p").isNotNull())
        .groupBy("p.lhs", "p.rhs")
        .agg(F.sum("freq").cast("long").alias("pair_count"))
    )


#: Distinct-word ceiling for the driver-side merge-learning fast path —
#: the unigram-EM bound's twin: the word table is VOCABULARY-scaled, and
#: at bench scale (31 distinct words) every distributed iteration is
#: pure job overhead. The python replay is exact by the round-7 rule the
#: apply side already relies on: space-doubling + plain str.replace is
#: leftmost-non-overlapping identically in JVM/DuckDB/python, counts are
#: exact ints, and the WordPiece score is the same single BIGINT->double
#: division. Above the bound: the distributed loops below.
DRIVER_BPE_MAX_WORDS = 200_000


def _collect_words(words: DataFrame):
    """list[(word, freq)] under DRIVER_BPE_MAX_WORDS, else None."""
    if (
        words.limit(DRIVER_BPE_MAX_WORDS + 1).count()
        > DRIVER_BPE_MAX_WORDS
    ):
        return None
    pdf = words.select("word", F.col("freq").cast("long").alias("freq")).toPandas()
    return list(zip(pdf["word"].tolist(), pdf["freq"].tolist()))


def _py_initial_symbols(word: str) -> str:
    return " ".join(word) + " " + EOW if word else EOW


def _py_apply_merge(sym: str, left: str, right: str) -> str:
    doubled = " " + sym.replace(" ", "  ") + " "
    merged = doubled.replace(
        " " + left + "  " + right + " ", " " + left + right + " "
    )
    return merged.replace("  ", " ").strip(" ")


def _py_pair_counts(symtab) -> dict:
    out: dict = {}
    for freq, sym in symtab:
        toks = sym.split(" ")
        for a, b in zip(toks, toks[1:]):
            out[(a, b)] = out.get((a, b), 0) + freq
    return out


def _learn_bpe_driver(wlist, n_merges: int) -> list:
    from pyspark.sql import Row

    symtab = [(freq, _py_initial_symbols(w)) for w, freq in wlist]
    out: list = []
    for it in range(1, n_merges + 1):
        pc = _py_pair_counts(symtab)
        if not pc:
            break
        (lhs, rhs), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        out.append(
            Row(it=it, lhs=lhs, rhs=rhs, merged=lhs + rhs, pair_count=cnt)
        )
        symtab = [(f, _py_apply_merge(s, lhs, rhs)) for f, s in symtab]
    return out


def _learn_wordpiece_driver(wlist, n_merges: int) -> list:
    from pyspark.sql import Row

    symtab = [(freq, _py_initial_symbols(w)) for w, freq in wlist]
    out: list = []
    for it in range(1, n_merges + 1):
        pc = _py_pair_counts(symtab)
        if not pc:
            break
        uc: dict = {}
        for freq, sym in symtab:
            for tok in sym.split(" "):
                uc[tok] = uc.get(tok, 0) + freq
        best = None
        for (lhs, rhs), cnt in pc.items():
            # ONE correctly-rounded division of exact ints — the same
            # IEEE op as the distributed projection
            score = float(cnt) / float(uc[lhs] * uc[rhs])
            key = (-score, lhs, rhs)
            if best is None or key < best[0]:
                best = (key, lhs, rhs, cnt, uc[lhs], uc[rhs], score)
        _, lhs, rhs, cnt, lc, rc, score = best
        out.append(
            Row(
                it=it,
                lhs=lhs,
                rhs=rhs,
                merged=lhs + rhs,
                pair_count=cnt,
                lhs_count=lc,
                rhs_count=rc,
                score=score,
            )
        )
        symtab = [(f, _py_apply_merge(s, lhs, rhs)) for f, s in symtab]
    return out


def learn_bpe_distributed(words: DataFrame, n_merges: int) -> list:
    """Learn ``n_merges`` BPE merges from a ``(word, freq)`` DataFrame,
    corpus-wide. Returns one Row per iteration:
    (it, lhs, rhs, merged, pair_count). Stops early if no pair remains;
    only ``n_merges`` single-row argmax collects ever reach the driver.
    Lineage growth per iteration is linear (one reference), so persists
    rotate without eager checkpoints (see the pagerank finding).

    Scale-adaptive: word tables under DRIVER_BPE_MAX_WORDS run the whole
    loop driver-side (bit-identical — see the bound's docstring)."""
    from pyspark.sql import Row

    wlist = _collect_words(words)
    if wlist is not None:
        return _learn_bpe_driver(wlist, n_merges)

    # coalesce(8) before persist: the word table is tiny relative to the
    # corpus, and 32 cached partitions would pay 32 task launches in every
    # one of the ~2 downstream stages per iteration (triangle-count
    # finding). Narrow rewrites inherit the 8 partitions.
    symtab = (
        words.select(
            F.col("freq").cast("long").alias("freq"),
            initial_symbols(F.col("word")).alias("sym"),
        )
        .coalesce(8)
        .persist()
    )
    out: list = []
    try:
        for it in range(1, n_merges + 1):
            top = (
                _pair_counts(symtab)
                .orderBy(F.col("pair_count").desc(), "lhs", "rhs")
                .limit(1)
                .collect()
            )
            if not top:
                break
            lhs, rhs, cnt = top[0].lhs, top[0].rhs, top[0].pair_count
            out.append(
                Row(it=it, lhs=lhs, rhs=rhs, merged=lhs + rhs, pair_count=cnt)
            )
            nxt = symtab.select(
                "freq",
                _apply_merge(F.col("sym"), F.lit(lhs), F.lit(rhs)).alias("sym"),
            ).persist()
            symtab.unpersist()
            symtab = nxt
    finally:
        symtab.unpersist()
    return out


def apply_merges_py(word: str, merges: list[tuple[str, str]]) -> str:
    """Python replay of the exact merge semantics (tests/oracles)."""
    sym = " ".join(word) + " " + EOW if word else EOW
    for lhs, rhs in merges:
        doubled = " " + sym.replace(" ", "  ") + " "
        merged = doubled.replace(f" {lhs}  {rhs} ", f" {lhs}{rhs} ")
        sym = merged.replace("  ", " ").strip()
    return sym


def _symbol_counts(symtab: DataFrame) -> DataFrame:
    """(tok, c): frequency-weighted symbol unigram counts of the current
    segmentation — the WordPiece score denominators."""
    return (
        symtab.select("freq", F.explode(F.split(F.col("sym"), " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.sum("freq").cast("long").alias("c"))
    )


def learn_wordpiece_distributed(words: DataFrame, n_merges: int) -> list:
    """Learn ``n_merges`` WordPiece merges from a ``(word, freq)``
    DataFrame. Identical machinery to :func:`learn_bpe_distributed` —
    pair counting, space-doubling merge application, one-row argmax
    collects — with the family-defining objective swapped in: WordPiece
    (Schuster & Nakajima 2012; the BERT tokenizer) merges the pair
    maximizing the LIKELIHOOD ratio

        score(l, r) = count(l r) / (count(l) * count(r))

    instead of raw pair count, so frequent-but-independent pairs lose to
    genuinely associated ones. The score is ONE correctly-rounded IEEE
    division of exact BIGINTs (count(l)*count(r) <= corpus-tokens², far
    under int64) — bit-identical across engines, ties broken (lhs, rhs)
    lexicographically on bit-identical doubles. Returns one Row per
    iteration: (it, lhs, rhs, merged, pair_count, lhs_count, rhs_count,
    score).

    Scale-adaptive: word tables under DRIVER_BPE_MAX_WORDS run the whole
    loop driver-side (bit-identical — see the bound's docstring)."""
    from pyspark.sql import Row

    wlist = _collect_words(words)
    if wlist is not None:
        return _learn_wordpiece_driver(wlist, n_merges)
    symtab = (
        words.select(
            F.col("freq").cast("long").alias("freq"),
            initial_symbols(F.col("word")).alias("sym"),
        )
        .coalesce(8)
        .persist()
    )
    out: list = []
    try:
        for it in range(1, n_merges + 1):
            # symbol counts are vocabulary-sized (KBs) but hang off the
            # lazily-persisted symtab, so AQE plans the joins stats-blind
            # (round-4 finding) — broadcast explicitly, and materialize u
            # ONCE so the two join branches don't re-derive it.
            u = _symbol_counts(symtab).localCheckpoint(eager=True)
            top = (
                _pair_counts(symtab)
                .join(F.broadcast(u.select(F.col("tok").alias("lhs"), F.col("c").alias("lc"))), "lhs")
                .join(F.broadcast(u.select(F.col("tok").alias("rhs"), F.col("c").alias("rc"))), "rhs")
                .select(
                    "lhs",
                    "rhs",
                    "pair_count",
                    F.col("lc").alias("lhs_count"),
                    F.col("rc").alias("rhs_count"),
                    (
                        F.col("pair_count").cast("double")
                        / (F.col("lc") * F.col("rc")).cast("double")
                    ).alias("score"),
                )
                .orderBy(F.col("score").desc(), "lhs", "rhs")
                .limit(1)
                .collect()
            )
            if not top:
                break
            t = top[0]
            out.append(
                Row(
                    it=it,
                    lhs=t.lhs,
                    rhs=t.rhs,
                    merged=t.lhs + t.rhs,
                    pair_count=t.pair_count,
                    lhs_count=t.lhs_count,
                    rhs_count=t.rhs_count,
                    score=t.score,
                )
            )
            nxt = symtab.select(
                "freq",
                _apply_merge(F.col("sym"), F.lit(t.lhs), F.lit(t.rhs)).alias("sym"),
            ).persist()
            symtab.unpersist()
            symtab = nxt
    finally:
        symtab.unpersist()
    return out
