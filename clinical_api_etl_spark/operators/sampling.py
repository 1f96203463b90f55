"""Deterministic sampling & splitting for training-data pipelines. [EXT]

The reference has no sampling surface (it is a point-lookup ETL API); these
are the dataset-assembly operators a 100 TB corpus pipeline needs in front
of training: reproducible train/val/test assignment and exact stratified
sampling. Both are *hash-deterministic* — no RNG state, no
``rand()``/seeds, identical output for any partitioning, executor count or
engine, which is what makes them auditable (the same doc always lands in
the same split) and oracle-checkable cross-engine.

Portability note: the hash is ``md5`` of the decimal string of the id —
NOT ``xxhash64`` — because the split must be reproducible *outside* Spark
(DuckDB, Python, SQL warehouses all agree on md5). Fixed-width lowercase
hex compares lexicographically == numerically, so thresholding the first 4
hex chars partitions the id space at 16-bit granularity with no
hex→integer conversion.

Scale posture: both operators are a narrow projection plus (for the
stratified case) one window shuffle on the strata key — no joins, no
collects, no skew sensitivity beyond the strata themselves.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def _hex_bucket(id_col: Column) -> Column:
    """First 4 hex chars of md5(id-as-string): a uniform 16-bit bucket in
    ['0000', 'ffff'], identical in any engine with md5."""
    return F.substring(F.md5(id_col.cast("string")), 1, 4)


#: 16-bit thresholds for an 80/10/10 split: floor(0.8·65536)=52428=0xcccc,
#: floor(0.9·65536)=58982=0xe666.
_TRAIN_MAX = "cccc"
_VAL_MAX = "e666"


def split_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    *,
    train: float = 0.8,
    val: float = 0.1,
) -> DataFrame:
    """Adds a ``split`` column ('train' | 'val' | 'test') keyed purely on
    the row id hash — stable under re-runs, appends, repartitioning and
    engine choice. Default 80/10/10; fractions are quantized to 1/65536.
    """
    t_max = format(int(train * 65536), "04x")
    v_max = format(int((train + val) * 65536), "04x")
    b = _hex_bucket(F.col(id_col))
    return df.withColumn(
        "split",
        F.when(b < t_max, "train").when(b < v_max, "val").otherwise("test"),
    )


def hash_sample(df: DataFrame, id_col: str, *, fraction: float = 0.1) -> DataFrame:
    """Deterministic Bernoulli-by-hash sample: keep rows whose 16-bit
    md5 bucket falls below ``fraction`` of the bucket space.

    The 100 TB sampling path: a NARROW filter — no shuffle, no window, no
    per-stratum serialization — with per-stratum counts binomial around
    ``fraction · n`` (hash uniformity) rather than exact. Reproducible
    across engines/partitionings like :func:`split_assign`; within any
    stratum the kept set is the same fixed pseudo-random subset. Use
    :func:`stratified_sample` when exact per-stratum counts matter more
    than scan-shape.
    """
    threshold = format(int(fraction * 65536), "04x")
    return df.filter(_hex_bucket(F.col(id_col)) < threshold)


def _hex_bucket_int(id_col: Column) -> Column:
    """The same 16-bit md5 bucket as :func:`_hex_bucket`, as an INTEGER
    (for per-row arithmetic thresholds; DuckDB twin:
    ``CAST('0x' || substr(md5(x), 1, 4) AS INTEGER)``)."""
    return F.conv(F.substring(F.md5(id_col.cast("string")), 1, 4), 16, 10).cast("int")


def weighted_hash_sample(
    df: DataFrame, id_col: str, weight_col: str, *, scale: int
) -> DataFrame:
    """Deterministic WEIGHTED Bernoulli sample: keep each row with
    probability ``min(1, weight/scale)`` — importance sampling by any
    integer weight (doc length, quality score, dup-cluster size) with the
    same no-RNG discipline as :func:`hash_sample`.

    Keep test is pure integer arithmetic — ``bucket16 · scale <
    weight · 65536`` — so Spark and DuckDB agree exactly; a NARROW filter
    (no shuffle), the 100 TB posture. Rows with ``weight >= scale`` always
    survive; weight <= 0 never does.
    """
    b = _hex_bucket_int(F.col(id_col)).cast("long")
    w = F.col(weight_col).cast("long")
    return df.filter(b * F.lit(int(scale)).cast("long") < w * F.lit(65536).cast("long"))


def group_holdout_split(
    df: DataFrame,
    group_col: str,
    *,
    train: float = 0.8,
    val: float = 0.1,
) -> DataFrame:
    """Leakage-safe split: assignment is keyed on the GROUP hash (author,
    user, source domain...), so every row of a group lands in the same
    split — the contamination guard for grouped data (near-duplicate docs
    by one author must not straddle train/test). Same narrow md5-threshold
    discipline as :func:`split_assign`; split shares are group-weighted,
    not row-weighted (a heavy group moves its whole mass with it)."""
    return split_assign(df, group_col, train=train, val=val)


def mixture_upsample(
    df: DataFrame,
    domain_col: str,
    id_col: str,
    *,
    weights: dict[str, float],
    budget: int,
) -> DataFrame:
    """Domain-mixture resampling WITH repetition — the training-mixture
    assembly step (the Pile / LLaMA data-recipe pattern: each domain gets
    a target share of the token/doc budget, and small high-quality domains
    repeat for multiple epochs to reach theirs).

    Deterministic and engine-portable: per domain ``target = floor(budget
    · w/Σw)`` (driver-side integer, weights are parameters), then each doc
    appears ``target div n`` times, and the ``target mod n`` docs ranked
    first by (md5-of-id, id) appear once more — EXACT per-domain output
    counts, the same docs chosen under any partitioning or engine, no RNG.
    Domains not in ``weights`` are dropped (they're not in the recipe).

    Output: one row per (doc, epoch) with ``epoch`` in 1..n_copies —
    downstream shuffling/packing treats epochs as independent rows.

    Scale: one window shuffle on the domain key (same posture as
    :func:`stratified_sample` — a hot domain serializes its rank; at 100 TB
    run the rank over doc METADATA (id, domain — a few bytes/row), join
    text back by id after the explode). The explode multiplies rows only
    by each domain's true epoch count — no cross join anywhere.
    """
    total_w = sum(weights.values())
    targets = {d: int(budget * w / total_w) for d, w in weights.items()}
    target = None
    for d, t in targets.items():
        cond = F.when(F.col(domain_col) == d, F.lit(t).cast("long"))
        target = cond if target is None else target.when(
            F.col(domain_col) == d, F.lit(t).cast("long")
        )

    w_rank = W.partitionBy(domain_col).orderBy(
        _hex_bucket(F.col(id_col)), F.col(id_col)
    )
    n = F.count(F.lit(1)).over(W.partitionBy(domain_col))
    return (
        df.filter(F.col(domain_col).isin(*weights))
        .select(
            id_col,
            domain_col,
            F.row_number().over(w_rank).alias("_rn"),
            n.alias("_n"),
            target.alias("_target"),
        )
        .withColumn(
            "_copies",
            (F.expr("_target div _n")
             + F.when(F.col("_rn") <= F.expr("_target % _n"), 1).otherwise(0)
             ).cast("long"),
        )
        .filter(F.col("_copies") > 0)
        .select(
            id_col,
            domain_col,
            F.explode(
                F.sequence(F.lit(1).cast("long"), F.col("_copies"))
            ).alias("epoch"),
        )
    )


def stratified_sample(
    df: DataFrame,
    strata: list[str],
    id_col: str,
    *,
    fraction: float = 0.1,
) -> DataFrame:
    """EXACT deterministic stratified sample: within each stratum, rank
    rows by (md5-of-id, id) and keep the first ``ceil(fraction · n)``.

    Unlike ``df.sampleBy`` (Bernoulli per row — approximate counts, RNG-
    seeded) this guarantees the per-stratum sample size exactly and
    reproducibly: the hash order is a fixed random-looking permutation of
    each stratum, so the prefix is an unbiased sample. One window shuffle
    on the strata key.

    Scale note: the window sorts each stratum inside ONE task, so a hot
    stratum (a key holding a large share of 100 TB) serializes. When the
    exact-count guarantee isn't required, :func:`hash_sample` keeps the
    same determinism with a narrow, shuffle-free scan.
    """
    w = W.partitionBy(*strata).orderBy(_hex_bucket(F.col(id_col)), F.col(id_col))
    n = F.count(F.lit(1)).over(W.partitionBy(*strata))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", n)
        .filter(F.col("_rn") <= F.ceil(F.lit(fraction) * F.col("_n")))
        .drop("_rn", "_n")
    )
