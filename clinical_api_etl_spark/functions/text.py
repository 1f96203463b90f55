"""Text column expressions: tokenization, shingles, fingerprints, language
and quality heuristics. All JVM-side higher-order functions — no UDFs —
so they whole-stage-codegen and scale linearly with the scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Minimal English stopword list for the language-ID / quality heuristics.
#: Deliberately small and frozen: it is part of the declared semantics
#: (the DuckDB oracle embeds the same list).
EN_STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are",
    "was", "for", "on", "with", "as", "by", "at", "it", "this", "that",
)


def tokens(c: Column) -> Column:
    """Whitespace tokenization of lowercased text."""
    return F.split(F.lower(F.trim(c)), r"\s+")


def token_count(c: Column) -> Column:
    return F.size(tokens(c)).cast("long")


def distinct_token_count(c: Column) -> Column:
    return F.size(F.array_distinct(tokens(c))).cast("long")


def stopword_ratio(c: Column) -> Column:
    """Fraction of tokens in EN_STOPWORDS (DOUBLE; deterministic division)."""
    toks = tokens(c)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*EN_STOPWORDS)))
    return n_stop.cast("double") / F.size(toks).cast("double")


def predict_lang(c: Column, threshold: float = 0.05) -> Column:
    """n-gram-free language-ID heuristic: stopword density ≥ threshold → 'en'
    else 'und'. (A real system adds per-language char-n-gram profiles; the
    declared contract here is the stopword-density rule.)"""
    return F.when(stopword_ratio(c) >= threshold, F.lit("en")).otherwise(F.lit("und"))


def quality_score(c: Column) -> Column:
    """Composite document-quality heuristic in [0,1]:

    0.5 * stopword_ratio  (fluency proxy)
    + 0.3 * min(len/400, 1) (length credit)
    + 0.2 * distinct/total  (repetition penalty)

    Fixed evaluation order so any engine computes bit-identical doubles.
    """
    len_score = F.least(F.length(c).cast("double") / F.lit(400.0), F.lit(1.0))
    rep = distinct_token_count(c).cast("double") / token_count(c).cast("double")
    return (
        F.lit(0.5) * stopword_ratio(c) + F.lit(0.3) * len_score + F.lit(0.2) * rep
    )


def word_shingles(c: Column, n: int) -> Column:
    """Distinct word n-gram shingles as an array<string> (the unit set for
    Jaccard / MinHash dedup). Documents shorter than n words yield their
    whole text as a single shingle."""
    toks = tokens(c)
    ngrams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.array_distinct(ngrams)


def fingerprint(c: Column) -> Column:
    """Canonical-form document fingerprint: md5 of the sorted distinct token
    set — token-order/whitespace/duplication-insensitive identity."""
    canonical = F.array_join(F.array_sort(F.array_distinct(tokens(c))), " ")
    return F.md5(canonical)


def chunk_spec(c: Column, chunk: int, stride: int) -> Column:
    """Overlapping token-window chunks as array<struct<start,text,n>>.

    start positions 1, 1+stride, ... (1-based); each chunk is ``chunk``
    tokens (shorter at the tail). The unit op of training-sample prep:
    documents → fixed-width sequences with overlap = chunk − stride.
    """
    toks = tokens(c)
    n = F.size(toks)
    starts = F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(stride))
    return F.transform(
        starts,
        lambda s: F.struct(
            s.alias("start"),
            F.concat_ws(" ", F.slice(toks, s, chunk)).alias("text"),
            F.least(F.lit(chunk), n - s + 1).alias("n"),
        ),
    )


#: PII patterns, restricted to the regex subset Java (Spark) and RE2
#: (DuckDB) interpret identically: character classes, +/{m,n} quantifiers,
#: no backreferences or lookaround.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("phone", r"\+?[0-9]{1,2}-[0-9]{3}-[0-9]{3,4}(-[0-9]{4})?", "[PHONE]"),
    ("ssn", r"[0-9]{3}-[0-9]{2}-[0-9]{4}", "[SSN]"),
)


def redact_pii(c: Column) -> Column:
    """Scrub emails / phone numbers / SSN-shaped tokens, in PII_PATTERNS
    order (SSN last so the more specific phone pattern wins on overlap).
    Pure ``regexp_replace`` chain — JVM-side, no UDF."""
    out = c
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_counts(c: Column) -> Column:
    """struct<email,phone,ssn> match counts per document (pre-redaction)."""
    return F.struct(
        *[
            F.regexp_count(c, F.lit(pat)).cast("long").alias(kind)
            for kind, pat, _ in PII_PATTERNS
        ]
    )


#: BPE-ish pre-tokenization pattern (Java-regex ∩ RE2): letter runs,
#: digit runs, single non-space punctuation — the coarse split a byte-pair
#: tokenizer applies before merges.
BPE_SPLIT_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def winnow_fingerprints(c: Column, *, k: int = 4, w: int = 5) -> Column:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD'03): hash every k-gram, slide a w-window over the hash
    sequence, keep each window's minimum — guarantees any shared run of
    ≥ w+k-1 tokens between two documents shares a fingerprint, with
    ~2/(w+1) selection density.

    Hashes are md5-hex prefixes (8 chars): lexicographic min == numeric
    min for fixed-width lowercase hex, and every engine computes the same
    md5 — so the fingerprint set is engine-portable (unlike xxhash64).
    Returns the sorted distinct selected hashes as array<string>. Pure
    column expression; the k-gram hash array must be materialized by the
    caller's projection boundary (no-HOF-CSE rule) — see
    ``operators/textstats.py:winnow``.
    """
    toks = tokens(c)
    kgrams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (k - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
    )
    return F.transform(kgrams, lambda g: F.substring(F.md5(g), 1, 8))


def winnow_select(hashes: Column, *, w: int = 5) -> Column:
    """Second stage of winnowing over a *materialized* hash-array column:
    min of each w-window, distinct, sorted."""
    n = F.size(hashes)
    wins = F.transform(
        F.sequence(F.lit(1), F.greatest(n - (w - 1), F.lit(1))),
        lambda i: F.array_min(F.slice(hashes, i, w)),
    )
    return F.array_sort(F.array_distinct(wins))
