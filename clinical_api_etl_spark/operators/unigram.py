"""Unigram-LM tokenizer (SentencePiece posture) — learn + apply. [EXT]

The second tokenizer family next to BPE (``operators/bpe.py``): modern
LLM pipelines choose between BPE and unigram-LM, and fertility
comparison across the two families is the standard tokenizer-equity
metric (VERDICT r06 task 3). Kudo 2018 semantics, simplified to the
hard-EM (Viterbi) variant so every float in the pipeline is
bit-reproducible across engines:

* **Seed vocabulary** = every single character plus the most frequent
  multi-character substrings (length 2..4) of the corpus words — the
  frequent-substring seed standing in for the suffix-array seed.
* **Scores** are maximum-likelihood unigram probabilities
  ``count/total`` — ONE correctly-rounded division over exact BIGINTs
  per piece, never a log (JVM ``Math.log`` != libm, CLAUDE.md round-8).
* **E-step** = Viterbi segmentation of every distinct word: a
  left-to-right DP where ``dp[i] = max_k dp[i-k] * score(word[i-k:i])``
  — each candidate is one multiply of already-bit-identical doubles, and
  ``greatest`` over bit-identical doubles is deterministic, so the whole
  DP (and its backtrack) matches DuckDB bit for bit. The fold runs over
  positions with a growing ARRAY accumulator (the round-10 LIST-fold
  template; never a struct accumulator).
* **M-step** = piece usage counts from the Viterbi segmentations,
  weighted by word frequency, with a +1 floor on every single character
  (coverage guarantee — a char with zero usage keeps a positive score,
  so no word's DP can dead-end; SentencePiece keeps chars for the same
  reason).
* **Prune** after the final round: all characters plus the top
  ``FINAL_MULTI`` multi-char pieces by usage — the vocab artifact.

Piece lookup inside the DP uses a DENSE span-score ladder: each word
carries a 48-slot array (12 positions x 4 lengths) built by 48 simple
conditional aggregates (the k-means scalar-column discipline — janino-
safe, identical CASE ladder on the DuckDB side), so the fold indexes an
array instead of probing a map (engine map semantics differ; arrays are
1-based on both sides per the round-12 rule).

Scale posture: everything after tokenization is VOCABULARY-scaled (the
distinct-word table, ~100k rows at 100 TB — the BPE-apply posture), the
vocab broadcast is KBs, and each EM round is one spans explode + one
broadcast join + one 48-agg shuffle. The corpus is scanned exactly once.

Reference scope note: the reference has no tokenizer at all (SURVEY
SS2.8 — zero UDFs); this is [EXT] LLM-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clinical_api_etl_spark.functions.text import tokens

#: Max word length entering training (longer words are excluded — the
#: unrolled DP is bounded; document corpora have sub-1% such words).
MAXW = 12
#: Max piece length.
MAXP = 4
SLOTS = MAXW * MAXP
#: Seed vocabulary: all chars + top SEED_MULTI multi-char spans.
SEED_MULTI = 96
#: Final vocabulary: all chars + top FINAL_MULTI multi-char pieces.
FINAL_MULTI = 48
#: Hard-EM re-estimation rounds before pruning.
EM_ROUNDS = 2


def word_table(docs: DataFrame, extra_keys: tuple[str, ...] = ()) -> DataFrame:
    """(extra_keys..., word, freq) for words of length 1..MAXW."""
    t = docs.select(
        *extra_keys, F.explode_outer(tokens(F.col("text"))).alias("word")
    )
    return (
        t.filter((F.length("word") >= 1) & (F.length("word") <= MAXW))
        .groupBy(*extra_keys, "word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )


def _spans(words: DataFrame, keys: list[str]) -> DataFrame:
    """One row per (word, start i, length k) span, slot = (i-1)*MAXP + k.
    1-based addressing throughout (element_at, never [] — round-12 rule)."""
    wl = words.withColumn("wlen", F.length("word").cast("int"))
    sp = wl.select(
        *keys,
        "word",
        "freq",
        "wlen",
        F.expr(
            f"explode(flatten(transform(sequence(1, wlen),"
            f" i -> transform(sequence(1, {MAXP}), k -> array(i, k)))))"
        ).alias("ik"),
    )
    return sp.filter(
        F.expr("element_at(ik, 1) + element_at(ik, 2) - 1 <= wlen")
    ).select(
        *keys,
        "word",
        "freq",
        "wlen",
        F.expr(f"(element_at(ik, 1) - 1) * {MAXP} + element_at(ik, 2)").alias(
            "slot"
        ),
        F.expr("substring(word, element_at(ik, 1), element_at(ik, 2))").alias(
            "piece"
        ),
    )


def span_counts(words: DataFrame) -> DataFrame:
    """(piece, cnt): frequency-weighted span occurrence counts."""
    return (
        _spans(words, [])
        .groupBy("piece")
        .agg(F.sum("freq").cast("long").alias("cnt"))
    )


def _with_scores(vocab_counts: DataFrame) -> DataFrame:
    """Attach score = cnt/total (one division over exact BIGINTs)."""
    tot = vocab_counts.agg(F.sum("cnt").cast("long").alias("_tot"))
    return vocab_counts.crossJoin(F.broadcast(tot)).select(
        "piece",
        "cnt",
        (F.col("cnt").cast("double") / F.col("_tot").cast("double")).alias(
            "score"
        ),
    )


def _dp_sql() -> str:
    cands = ", ".join(
        f"CASE WHEN i >= {k} THEN element_at(acc, i - {k} + 1)"
        f" * element_at(ss, (i - {k}) * {MAXP} + {k})"
        f" ELSE CAST(0 AS DOUBLE) END"
        for k in range(1, MAXP + 1)
    )
    return (
        "aggregate(sequence(1, wlen), array(CAST(1 AS DOUBLE)),"
        f" (acc, i) -> concat(acc, array(greatest({cands}))))"
    )


def _walk_sql() -> str:
    pos = "element_at(acc, size(acc))"
    eqs = " ".join(
        f"WHEN ({pos} >= {k}"
        f" AND element_at(dp, {pos} - {k} + 1)"
        f" * element_at(ss, ({pos} - {k}) * {MAXP} + {k})"
        f" = element_at(dp, {pos} + 1)) THEN {k}"
        for k in range(1, MAXP + 1)
    )
    return (
        "aggregate(sequence(1, wlen), array(CAST(wlen AS INT)),"
        f" (acc, j) -> concat(acc, array(CAST(CASE WHEN {pos} <= 0 THEN 0"
        f" ELSE {pos} - (CASE {eqs} ELSE {pos} END) END AS INT))))"
    )


_PIECES_SQL = (
    "reverse(filter(transform(sequence(1, size(walk) - 1),"
    " j -> CASE WHEN element_at(walk, j) > element_at(walk, j + 1)"
    " THEN substring(word, element_at(walk, j + 1) + 1,"
    " element_at(walk, j) - element_at(walk, j + 1)) END),"
    " x -> x IS NOT NULL))"
)


def viterbi_pieces(
    words: DataFrame, vocab: DataFrame, keys: list[str] | None = None
) -> DataFrame:
    """(keys..., word, freq, pieces): best unigram segmentation of each
    word under ``vocab`` (piece, score). The span-score ladder, the DP
    fold, and the backtrack fold are all named-column stages (no-HOF-CSE
    rule: each expensive array expression is materialized once and only
    referenced as an attribute downstream)."""
    keys = keys or []
    sp = _spans(words, keys)
    scored = sp.join(
        F.broadcast(vocab.select("piece", "score")), "piece"
    )
    aggs = [
        F.max(F.when(F.col("slot") == s, F.col("score"))).alias(f"ss{s}")
        for s in range(1, SLOTS + 1)
    ]
    ladder = scored.groupBy(*keys, "word", "freq", "wlen").agg(*aggs)
    ss = F.array(
        *[F.coalesce(F.col(f"ss{s}"), F.lit(0.0)) for s in range(1, SLOTS + 1)]
    )
    lw = ladder.select(*keys, "word", "freq", "wlen", ss.alias("ss"))
    dped = lw.select(
        *keys, "word", "freq", "wlen", "ss", F.expr(_dp_sql()).alias("dp")
    )
    walked = dped.select(
        *keys, "word", "freq", F.expr(_walk_sql()).alias("walk")
    )
    return walked.select(
        *keys, "word", "freq", F.expr(_PIECES_SQL).alias("pieces")
    )


def _usage_counts(segmented: DataFrame, chars: DataFrame) -> DataFrame:
    """Frequency-weighted piece usage + the +1 char floor."""
    use = (
        segmented.select("freq", F.explode("pieces").alias("piece"))
        .groupBy("piece")
        .agg(F.sum("freq").cast("long").alias("c"))
    )
    floor = chars.select("piece", F.lit(1).cast("long").alias("c"))
    return (
        use.unionByName(floor)
        .groupBy("piece")
        .agg(F.sum("c").cast("long").alias("cnt"))
    )


#: Distinct-word ceiling for the driver-side EM fast path. The word
#: table is VOCABULARY-scaled (distinct words ≤ MAXW chars — ~100k rows
#: even at 100 TB, the BPE-apply posture), so under this bound the whole
#: hard-EM runs as one bounded collect + python loops: the distributed
#: rounds' cost is NOT data (31 distinct words at sf0.1) but Catalyst +
#: codegen on the generated 48-slot DP/backtrack expressions — ~6-7 s
#: PER ROUND of pure plan overhead (round-11 profile). viterbi_py runs
#: the IDENTICAL IEEE float ops as the Spark/DuckDB DP (bitwise-asserted
#: by the existing replay tests), integer usage counts are exact, and
#: each score is the same single long->double division — so the fast
#: path is bit-identical by construction, same as the driver-CC /
#: kmeans sample-train precedent. Above the bound: the distributed EM.
DRIVER_UNIGRAM_MAX_WORDS = 200_000


def _learn_unigram_driver(w: DataFrame) -> DataFrame:
    """Driver-side hard-EM over a collected (word, freq) table — the
    exact trajectory of the distributed loop below (seed -> EM_ROUNDS x
    (Viterbi segment, usage re-count with the +1 char floor, re-score)
    -> prune), with every float op the same IEEE tree (see
    :data:`DRIVER_UNIGRAM_MAX_WORDS`)."""
    from collections import Counter

    import pandas as pd

    rows = w.select("word", "freq").toPandas()
    words = list(zip(rows["word"].tolist(), rows["freq"].tolist()))
    spark = w.sparkSession
    schema = "piece string, piece_len long, cnt long, score double"
    if not words:
        return spark.createDataFrame(
            pd.DataFrame({"piece": [], "piece_len": [], "cnt": [], "score": []}),
            schema,
        )
    span_cnt: Counter = Counter()
    for word, freq in words:
        wl = len(word)
        for i in range(wl):
            for k in range(1, MAXP + 1):
                if i + k <= wl:
                    span_cnt[word[i : i + k]] += freq
    chars = sorted(p for p in span_cnt if len(p) == 1)
    seed_multi = sorted(
        ((p, c) for p, c in span_cnt.items() if len(p) >= 2),
        key=lambda pc: (-pc[1], pc[0]),
    )[:SEED_MULTI]
    vocab_cnt = {p: span_cnt[p] for p in chars}
    vocab_cnt.update(dict(seed_multi))

    def _scores(vc: dict) -> dict:
        tot = float(sum(vc.values()))  # exact while Σcnt < 2^53 (both
        # engines cast the same BIGINT; the division is one IEEE op)
        return {p: c / tot for p, c in vc.items()}

    scores = _scores(vocab_cnt)
    for _ in range(EM_ROUNDS):
        use: Counter = Counter()
        for word, freq in words:
            for piece in viterbi_py(word, scores):
                use[piece] += freq
        # _usage_counts semantics: usage ∪ (+1 floor per char), summed —
        # unused multi-char pieces drop out, unused chars keep cnt 1
        vocab_cnt = {p: c for p, c in use.items()}
        for c in chars:
            vocab_cnt[c] = vocab_cnt.get(c, 0) + 1
        scores = _scores(vocab_cnt)
    kept_multi = sorted(
        ((p, c) for p, c in vocab_cnt.items() if len(p) >= 2),
        key=lambda pc: (-pc[1], pc[0]),
    )[:FINAL_MULTI]
    kept = {p: vocab_cnt[p] for p in chars}
    kept.update(dict(kept_multi))
    fscores = _scores(kept)
    out = pd.DataFrame(
        {
            "piece": list(kept),
            "piece_len": [len(p) for p in kept],
            "cnt": [kept[p] for p in kept],
            "score": [fscores[p] for p in kept],
        }
    )
    return spark.createDataFrame(out, schema)


def learn_unigram(docs: DataFrame) -> DataFrame:
    """Full unigram-LM training: returns the pruned vocab artifact
    (piece, piece_len, cnt, score) — every value hash-gated.

    Scale-adaptive: word tables under DRIVER_UNIGRAM_MAX_WORDS run the
    EM driver-side (bit-identical by construction — see
    :func:`_learn_unigram_driver`); larger corpora run the distributed
    rounds below."""
    w = word_table(docs).coalesce(8).persist()
    if w.limit(DRIVER_UNIGRAM_MAX_WORDS + 1).count() <= DRIVER_UNIGRAM_MAX_WORDS:
        out = _learn_unigram_driver(w).localCheckpoint(eager=True)
        w.unpersist(False)
        return out
    sc = span_counts(w).coalesce(8).persist()
    chars = sc.filter(F.length("piece") == 1).select("piece")
    seed_multi = (
        sc.filter(F.length("piece") >= 2)
        .orderBy(F.desc("cnt"), "piece")
        .limit(SEED_MULTI)
        .select("piece", "cnt")
    )
    seed = sc.filter(F.length("piece") == 1).select("piece", "cnt").unionByName(
        seed_multi
    )
    # Eager checkpoint per round: the vocab feeds a BROADCAST join and is
    # referenced by both branches of _with_scores (cnt + total) —
    # multiplicative lineage, and lazy persists do not protect broadcast
    # subtrees (k-core rule, round-6 finding). The vocab is ≤ ~1k rows,
    # so each checkpoint is a sub-second job that truncates the plan.
    vocab = _with_scores(seed).localCheckpoint(eager=True)
    for _ in range(EM_ROUNDS):
        seg = viterbi_pieces(w, vocab)
        vocab = _with_scores(_usage_counts(seg, chars)).localCheckpoint(
            eager=True
        )
    # prune: all chars + top FINAL_MULTI multi-char pieces by usage
    kept_multi = (
        vocab.filter(F.length("piece") >= 2)
        .orderBy(F.desc("cnt"), "piece")
        .limit(FINAL_MULTI)
        .select("piece", "cnt")
    )
    kept = (
        vocab.filter(F.length("piece") == 1)
        .select("piece", "cnt")
        .unionByName(kept_multi)
    )
    out = _with_scores(kept).select(
        "piece",
        F.length("piece").cast("long").alias("piece_len"),
        "cnt",
        "score",
    )
    out = out.localCheckpoint(eager=True)
    sc.unpersist(False)
    w.unpersist(False)
    return out


def final_vocab(docs: DataFrame) -> DataFrame:
    """The pruned vocab with scores, ready for :func:`viterbi_pieces`."""
    return learn_unigram(docs).select("piece", "score")


# ---------------------------------------------------------------------------
# Python replay (tests): the EXACT float ops of the Spark/DuckDB DP.
# ---------------------------------------------------------------------------


def viterbi_py(word: str, scores: dict[str, float]) -> list[str]:
    n = len(word)
    dp = [1.0]
    for i in range(1, n + 1):
        cands = []
        for k in range(1, MAXP + 1):
            if i >= k:
                cands.append(dp[i - k] * scores.get(word[i - k : i], 0.0))
            else:
                cands.append(0.0)
        dp.append(max(cands))
    pos, rev = n, []
    for _ in range(n):
        if pos <= 0:
            break
        nxt = None
        for k in range(1, MAXP + 1):
            if pos >= k and dp[pos - k] * scores.get(
                word[pos - k : pos], 0.0
            ) == dp[pos]:
                nxt = k
                break
        if nxt is None:
            break
        rev.append(word[pos - nxt : pos])
        pos -= nxt
    return list(reversed(rev))
