"""[EXT] String similarity (edit-distance) self-join — Ed-Join style.

Entity-resolution primitive the reference has no analogue for (its only
string handling is exact normalization, ``etl.py:109-150``): find all pairs
of strings within a small edit distance WITHOUT the O(N²) all-pairs scan.

Algorithm (Ed-Join, Xiao et al., VLDB'08 — public literature):

1. Decompose each string into positional q-gram *occurrences* ``(gram,
   occ)`` where ``occ`` numbers repeats of the same gram within one string.
   Set intersection over these elements equals bag intersection over plain
   q-grams, so the count-filter bound applies: ``ed(s,t) <= k`` implies the
   two bags share at least ``max(|Gs|,|Gt|) - k*q`` grams.
2. Order all elements by global document frequency (rarest first; ties by
   value — deterministic). By the prefix-filter lemma, two qualifying
   strings must then share an element within their first ``k*q + 1``
   elements. Joining on PREFIX elements only is what makes this scale: the
   join fan-out is bounded by the df of the *rarest* grams of each string,
   not the corpus size.
3. Verify surviving candidate pairs with a length band (``||s|-|t|| <= k``)
   and an exact ``levenshtein`` (JVM codegen'd; same definition in DuckDB).

Scale posture: one agg for the df table (broadcast — |distinct grams| <<
corpus), one window for prefix selection, one equi-join on rare grams, one
narrow verify. No cartesian anywhere; skew is bounded because prefixes
take the globally *rarest* grams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def edit_distance_self_join(
    strings: DataFrame,
    id_col: str,
    s_col: str,
    max_dist: int = 1,
    q: int = 2,
) -> DataFrame:
    """All pairs ``(id_l < id_r, dist)`` with ``levenshtein <= max_dist``.

    ``strings`` must have unique ``id_col``; rows shorter than ``q`` chars
    are excluded (they have no q-grams; at q=2 a 1-char string can still be
    within distance 1 of another — callers needing that route those rows
    through the trivial short-string band separately).
    """
    prefix_len = max_dist * q + 1
    base = strings.select(
        F.col(id_col).alias("sid"), F.col(s_col).alias("s")
    ).filter(F.length("s") >= q)

    # (sid, gram, occ): q-gram occurrences, occ numbering repeats so that
    # set semantics over (gram, occ) == bag semantics over grams.
    grams = base.select(
        "sid",
        F.explode(
            F.expr(f"transform(sequence(1, length(s) - {q} + 1), i -> substring(s, i, {q}))")
        ).alias("gram"),
    )
    occ = Window.partitionBy("sid", "gram").orderBy("gram")  # arbitrary within equal grams
    elems = grams.withColumn("occ", F.row_number().over(occ))

    # Global rarity of each (gram, occ) element.
    df_tab = elems.groupBy("gram", "occ").agg(F.count("*").alias("df"))
    ranked = elems.join(F.broadcast(df_tab), ["gram", "occ"])
    order = Window.partitionBy("sid").orderBy("df", "gram", "occ")
    prefix = (
        ranked.withColumn("rk", F.row_number().over(order))
        .filter(F.col("rk") <= prefix_len)
        .select("sid", "gram", "occ")
    )

    cands = (
        prefix.alias("l")
        .join(prefix.alias("r"), ["gram", "occ"])
        .filter(F.col("l.sid") < F.col("r.sid"))
        .select(F.col("l.sid").alias("id_l"), F.col("r.sid").alias("id_r"))
        .distinct()
    )

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
