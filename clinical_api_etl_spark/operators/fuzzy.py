"""[EXT] String similarity (edit-distance) self-join.

Entity-resolution primitive the reference has no analogue for (its only
string handling is exact normalization, ``etl.py:109-150``): find all pairs
of strings within a small edit distance WITHOUT the O(N²) all-pairs scan.

Algorithm: deletion-neighborhood signatures (FastSS / SymSpell — public
literature). Each string emits every variant obtainable by deleting up to
``max_dist`` characters; two strings within edit distance ``k`` ALWAYS
share at least one such variant (symmetric-delete property), so joining on
variant hashes generates a lossless candidate set, verified by one exact
``levenshtein``. False candidates (including any 64-bit hash collisions)
are filtered by the verify step; true pairs cannot be missed.

Why not q-gram prefix filtering (Ed-Join): frequency-ordered prefixes
collapse on corpora with long shared prefixes (``Customer#0000...``) — the
"rare" grams are shared by thousands of strings and the candidate join goes
quadratic (measured 38s at 15k rows). Deletion signatures key on the WHOLE
string minus k chars, so a bucket only holds genuine near-matches; the
candidate count tracks the true-pair count, not the corpus structure.

Scale posture: signature fan-out is ``1 + C(len, 1) + ... + C(len, k)``
rows per string (19×/row at len 18, k=1) — a narrow generate-explode; ONE
equi-join on a 64-bit signature hash (no string payload through the
shuffle); verify re-joins the two name columns by id. Skew is bounded by
duplicate-group sizes (inherent: those pairs are all in the output).
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _deletion_variants(s_col: str, max_dist: int, max_len: int = 1 << 20) -> F.Column:
    """Array of all variants of ``s_col`` with 0..max_dist chars deleted,
    as pure column expressions (no UDF); ``max_len`` caps the substring
    tail length. Variant count is C(len,1)+C(len,2)+... per row — strings
    here are id-like keys, not documents."""
    if max_dist == 0:
        return F.array(F.col(s_col))
    # k=1 is expressible for any length via transform(sequence...).
    one_del = F.expr(
        f"transform(sequence(1, length({s_col})), "
        f"i -> concat(substring({s_col}, 1, i - 1), substring({s_col}, i + 1, {max_len})))"
    )
    base = F.array_union(F.array(F.col(s_col)), one_del)
    if max_dist == 1:
        return base
    if max_dist == 2:
        # two deletions: delete i<j — expression-level nested transform,
        # flattened; fine for key-like strings (C(len,2) variants).
        two_del = F.flatten(
            F.expr(
                f"transform(sequence(1, length({s_col}) - 1), "
                f"i -> transform(sequence(i + 1, length({s_col})), "
                f"j -> concat(substring({s_col}, 1, i - 1), "
                f"substring({s_col}, i + 1, j - i - 1), "
                f"substring({s_col}, j + 1, {max_len}))))"
            )
        )
        return F.array_union(base, two_del)
    raise ValueError("max_dist > 2 not supported (signature fan-out C(len, k))")


def edit_distance_self_join(
    strings: DataFrame,
    id_col: str,
    s_col: str,
    max_dist: int = 1,
) -> DataFrame:
    """All pairs ``(id_l < id_r, dist)`` with ``levenshtein <= max_dist``.

    ``strings`` must have unique ``id_col``. Lossless: the symmetric-delete
    property guarantees every qualifying pair shares a signature; the exact
    verify removes everything else.
    """
    base = strings.select(F.col(id_col).alias("sid"), F.col(s_col).alias("s"))
    cands = edit_distance_candidates(strings, id_col, s_col, max_dist)
    left = base.select(F.col("sid").alias("id_l"), F.col("s").alias("s_l"))
    right = base.select(F.col("sid").alias("id_r"), F.col("s").alias("s_r"))
    return (
        cands.join(left, "id_l")
        .join(right, "id_r")
        .filter(F.abs(F.length("s_l") - F.length("s_r")) <= max_dist)
        .withColumn("dist", F.levenshtein("s_l", "s_r"))
        .filter(F.col("dist") <= max_dist)
        .select("id_l", "id_r", "dist")
    )


def edit_distance_candidates(
    strings: DataFrame,
    id_col: str,
    s_col: str,
    max_dist: int = 1,
) -> DataFrame:
    """The candidate-pair stage of :func:`edit_distance_self_join` alone
    (distinct signature-bucket co-occurrences, before the levenshtein
    verify) — exposed for scaling telemetry: candidate count is the cost
    driver of the whole operator, so measuring it against output size is
    how `output-bound, not super-linear` gets evidenced (PERF.md)."""
    base = strings.select(F.col(id_col).alias("sid"), F.col(s_col).alias("s"))
    sigs = base.select(
        "sid",
        F.explode(F.array_distinct(_deletion_variants("s", max_dist))).alias("v"),
    ).select("sid", F.xxhash64("v").alias("sig"))
    return (
        sigs.alias("l")
        .join(sigs.alias("r"), "sig")
        .filter(F.col("l.sid") < F.col("r.sid"))
        .select(F.col("l.sid").alias("id_l"), F.col("r.sid").alias("id_r"))
        .distinct()
    )


# Used by tests to cross-check the variant generator.
def deletion_variants_py(s: str, max_dist: int) -> set[str]:
    out = {s}
    for k in range(1, max_dist + 1):
        for pos in combinations(range(len(s)), k):
            keep = [c for i, c in enumerate(s) if i not in pos]
            out.add("".join(keep))
    return out
