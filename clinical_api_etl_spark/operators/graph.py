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

#: Edge-count ceiling for the driver-side union-find fast path. Near-dup
#: edge lists are SPARSE relative to the corpus (pairs above a high
#: similarity threshold); under this bound a single collect + union-find
#: replaces O(diameter) distributed rounds of ≥3 jobs each — the same
#: model-fits-on-driver reasoning as sample-trained k-means. Above it,
#: the distributed min-label loop below is the scale path.
DRIVER_CC_MAX_EDGES = 1_000_000


def _driver_union_find(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Union-find with path compression over a collected edge list;
    component label = min vertex id (identical to the distributed loop)."""
    import pandas as pd

    pdf = edges.select(src, dst).toPandas()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(pdf[src], pdf[dst]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-id labeling: roots are already the minimum of their component
    # (unions always point the larger root at the smaller one)
    rows = pd.DataFrame(
        {"id": list(parent), "component": [find(v) for v in parent]}
    )
    return edges.sparkSession.createDataFrame(
        rows, "id long, component long"
    )


def connected_components(
    edges: DataFrame,
    *,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 25,
    driver_max_edges: int = DRIVER_CC_MAX_EDGES,
) -> DataFrame:
    """(id, component) for every vertex appearing in ``edges``; component =
    the minimum vertex id of the connected component (deterministic).

    Scale-adaptive: edge lists under ``driver_max_edges`` resolve via one
    collect + union-find (near-dup graphs are sparse; each distributed
    round costs ≥3 jobs); larger graphs run the distributed min-label
    loop. Both produce identical (id, min-vertex-id) labelings.
    """
    if edges.limit(driver_max_edges + 1).count() <= driver_max_edges:
        return _driver_union_find(edges, src, dst)
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
