"""Skew-resilience utilities. [EXT]

AQE's skew-join splitting covers shuffle joins it can re-plan; these cover
the cases it can't:

* ``salted_join`` — left-skewed equi-join where the right side is too big
  to broadcast whole but small enough to replicate ``salt`` times: the left
  side gets a deterministic salt in [0, salt), the right side fans out to
  every salt value, and the join key becomes (key, salt) — a hot key's rows
  spread over ``salt`` reducers instead of one.
* ``count_distinct_spread`` — exact COUNT(DISTINCT x) per key without
  funneling a hot key into one reducer: dedup on the *wider* (key, x) key
  first (hot keys spread across x), then count. This is the classic
  two-shuffle rewrite; Spark plans single-pass distinct aggregates with an
  expand that keeps the hot key together.
* ``key_histogram`` — the diagnostic: per-key row counts + share of the
  table, for deciding whether any of this is needed.

All deterministic (xxhash64 salts), all pure DataFrame compositions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    *,
    salt: int = 8,
    salt_source: str | Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side salted and the right side replicated.

    Result equals ``left.join(right, on, how)`` for 'inner' and 'left'
    joins (each left row sees exactly one full copy of its key's right
    rows). Cost: right side shuffled ``salt``× — pay it only when a hot
    left key is the bottleneck. ``salt_source`` picks the column hashed for
    determinism (default: whole left row).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    src = (
        F.col(salt_source) if isinstance(salt_source, str) else salt_source
    ) if salt_source is not None else F.struct(*[F.col(c) for c in left.columns])
    l = left.withColumn("__salt", F.pmod(F.xxhash64(src), F.lit(salt)).cast("int"))
    r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return l.join(r, [*on, "__salt"], how).drop("__salt")


def count_distinct_spread(
    df: DataFrame, keys: list[str], col: str, alias: str = "n_distinct"
) -> DataFrame:
    """Exact per-key COUNT(DISTINCT col), hot-key-proof.

    Shuffle 1 partitions on (keys, col) — a hot key spreads over its value
    domain; shuffle 2 counts the already-distinct rows per key. Equivalent
    to ``groupBy(keys).agg(countDistinct(col))`` with different physical
    behavior under skew.
    """
    return (
        df.select(*keys, col)
        .distinct()
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).cast("long").alias(alias))
    )


def key_histogram(df: DataFrame, keys: list[str], top: int = 20) -> DataFrame:
    """Per-key row count + share of table, heaviest first — run this before
    reaching for salting."""
    total = df.count()
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("rows"))
        .withColumn("share", F.col("rows").cast("double") / F.lit(float(total)))
        .orderBy(F.desc("rows"))
        .limit(top)
    )
