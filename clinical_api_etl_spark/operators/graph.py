"""Connected components — the transitive-closure step of dedup. [EXT]

Pair-level dedup (Jaccard / MinHash / SimHash / embedding) emits edges;
survivor selection needs *components*: if A~B and B~C, all three are one
duplicate group even when A~C is below threshold. This is the iterative
step a pure SQL pipeline can't express incrementally — implemented as
min-label propagation:

    label(v) ← min(label(v), min over neighbors' labels)

repeated to fixpoint. Each round is one join + one aggregate, so a round
costs two shuffles and converges in O(component diameter) rounds — for
near-dup graphs diameters are tiny (clusters are dense). Per-round
``localCheckpoint`` truncates the plan so lineage doesn't grow with the
iteration count (the standard Spark iterative-algorithm pattern; GraphX's
CC is the same algorithm on the RDD API).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    *,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """(id, component) for every vertex appearing in ``edges``; component =
    the minimum vertex id of the connected component (deterministic)."""
    sym = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
    sym = sym.distinct().localCheckpoint()

    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iterations):
        nbr = sym.join(labels, sym.b == labels.id).select(
            F.col("a").alias("id"), F.col("label")
        )
        new = (
            labels.unionByName(nbr)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new
        if changed == 0:
            break
    return labels.select(F.col("id"), F.col("label").alias("component"))
