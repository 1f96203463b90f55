"""Graph-structured ANN: a deterministic HNSW/NSW-style index. [EXT]

The quantizer ladder (LSH / IVF / IVFPQ / SQ8 / 1-bit binary —
``operators/similarity.py``, ``operators/pq.py``) lacked the
industry-default GRAPH family (Malkov & Yashunin 2018, "HNSW"). This
module adds a deterministic three-layer navigable small-world index:

* **Layer assignment** — node v is promoted to layer 1 iff ``md5(v)``
  starts with '0', to layer 2 iff it starts with '00' (geometric
  p = 1/16 per level, the repo's md5-determinism convention — no RNG
  state, identical on every engine/executor). The ENTRY point is the
  md5-minimum member of the topmost non-empty layer.
* **Per-layer adjacency** — M-NN links. A layer with ≤ BRUTE_MAX
  members gets the exact pair scan; larger layers restrict pairs to
  deterministic LSH sign-bit cells sized for ~CELL_TARGET members —
  cell COUNT scales with the layer, cell SIZE stays constant, so every
  layer's pair scan is layer-linear (the round-14 fixed-parameter-decay
  lesson: the first cut used k=8 k-means cells, whose size grew
  linearly and made the 10x build quadratic). Upper layers carry the
  LONG-RANGE navigation links, layer 0 the LOCAL ones — the HNSW
  division of labor; corpora past ~10^6 vectors add layers (each layer
  is to the next what layer 0 is to layer 1).
* **Search** — beam search with ALL queries advancing concurrently:
  state is (query_id, node, cos_sim) bounded by Q × beam, each round
  is one adjacency equi-join (the small beam side broadcasts — never
  the corpus-sized adjacency, the r09 random-walks rule) + exact
  cosine scoring + a per-query top-beam window; fixed round counts
  per layer keep the trajectory deterministic. The final top-k
  re-ranks everything the search VISITED — so reported similarities
  are exact, recall is the only approximation (the ladder-wide
  contract, gated by ``ann_hnsw_recall_gate``).

Scale: the index is edge tables keyed by source node — at 100 TB it is
a materialized table; search cost is rounds × beam × M per query,
independent of corpus size. Reference scope note: the reference
(arthurmosley/clinical-api-etl) has no ANN surface at all
(etl-service/src/etl.py is a pandas validation loop); [EXT] per the
brief's similarity-search clause.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from clinical_api_etl_spark.functions.vectors import as_double, dot, norm

HNSW_M = 8  # out-degree per node per layer (pre-symmetrize)
HNSW_BEAM = 16  # beam width during search
HNSW_R1 = 2  # expansion rounds on layer 1
HNSW_R0 = 4  # expansion rounds on layer 0


def _prep(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    v = as_double(F.col(vec_col))
    return df.select(
        F.col(id_col).alias("nid"), v.alias("vec"), norm(v).alias("nrm")
    )


def _brute_knn_pairs_np(members: DataFrame, m: int) -> DataFrame:
    """Driver-side numpy M-NN for a BRUTE layer (≤ BRUTE_MAX members by
    construction, so the collect is a bounded constant — the kmeans/PQ
    sample-train posture). Replaces a |layer|² interpreted-HOF pair join
    (4M zip_with+fold evals at sf0.1's 2,000 vectors — ~6s of the build).

    Bit-parity with the Spark expression it replaces: the JVM path folds
    Σ aᵢ·bᵢ strictly left-to-right (functions/vectors.py:dot), so the
    kernel accumulates one DIMENSION at a time in index order
    (acc += a_d·b_d as 64 vectorized outer-product passes) — every
    intermediate is the identical IEEE double, the final /(n_a·n_b) is
    the identical two-operation tree, ties compare bit-identical doubles
    and break on neighbor id exactly like the row_number ordering."""
    import numpy as np
    import pandas as pd

    pdf = members.select("nid", "vec", "nrm").toPandas()
    n = len(pdf)
    id_type = members.schema["nid"].dataType
    from pyspark.sql.types import StructField, StructType

    schema = StructType(
        [StructField("id_a", id_type), StructField("id_b", id_type)]
    )
    if n < 2:
        return members.sparkSession.createDataFrame(
            pd.DataFrame({"id_a": [], "id_b": []}), schema
        )
    ids = pdf["nid"].to_numpy()
    A = np.asarray(pdf["vec"].tolist(), dtype=np.float64)
    nrm = pdf["nrm"].to_numpy(dtype=np.float64)
    acc = np.zeros((n, n))
    for d in range(A.shape[1]):  # dimension-ordered: the JVM left fold
        acc += np.outer(A[:, d], A[:, d])
    sim = acc / np.outer(nrm, nrm)
    # per-row order by (sim desc, neighbor id asc), self excluded;
    # np.argsort(kind="stable") over -sim with a pre-sort by id gives the
    # identical total order to the Spark window
    id_order = np.argsort(ids, kind="stable")
    out_a, out_b = [], []
    for i in range(n):
        row = sim[i, id_order]
        cand = np.argsort(-row, kind="stable")  # stable: id-asc within ties
        picked = 0
        for j in cand:
            orig = id_order[j]
            if orig == i:
                continue
            out_a.append(ids[i])
            out_b.append(ids[orig])
            picked += 1
            if picked >= m:
                break
    return members.sparkSession.createDataFrame(
        pd.DataFrame({"id_a": out_a, "id_b": out_b}), schema
    )


def _knn_edges(members: DataFrame, m: int, cell_key: str | None) -> DataFrame:
    """Symmetrized M-NN edges among ``members`` (nid, vec, nrm [, cell]).

    ``cell_key`` None → full pair scan (the bounded upper layer — runs as
    a driver-side numpy kernel, see :func:`_brute_knn_pairs_np`);
    otherwise pairs are restricted to equal ``cell_key`` (the SemDeDup
    equi-join bound). Ties break on neighbor id — deterministic."""
    if cell_key is None:
        knn = _brute_knn_pairs_np(members, m)
    else:
        a = members.select(
            F.col("nid").alias("id_a"),
            F.col("vec").alias("v_a"),
            F.col("nrm").alias("n_a"),
            F.col(cell_key).alias("ck"),
        )
        b = members.select(
            F.col("nid").alias("id_b"),
            F.col("vec").alias("v_b"),
            F.col("nrm").alias("n_b"),
            F.col(cell_key).alias("ck"),
        )
        pairs = a.join(b, "ck").filter(F.col("id_a") != F.col("id_b"))
        sim = dot(F.col("v_a"), F.col("v_b")) / (F.col("n_a") * F.col("n_b"))
        w = W.partitionBy("id_a").orderBy(F.desc("sim"), F.asc("id_b"))
        knn = (
            pairs.select("id_a", "id_b", sim.alias("sim"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= m)
            .select("id_a", "id_b")
        )
    # bidirectional links (the HNSW convention): a→b implies b→a
    return (
        knn.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(
            knn.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
        )
        .distinct()
    )


#: A layer with at most this many members gets exact brute-force M-NN
#: links; larger layers are cell-restricted (corpus-proportional LSH
#: sign-bit buckets targeting ~CELL_TARGET members per cell, so the
#: per-layer pair scan is N·CELL_TARGET — corpus-linear). The TOP layer
#: is 1/256-sampled, so the brute bound covers corpora to ~10^6 vectors;
#: beyond that, add layers (the HNSW log-layer recursion — each layer is
#: to the next what layer 0 is to layer 1).
BRUTE_MAX = 4096
CELL_TARGET = 64


def _layer_adj(members: DataFrame, n_members: int, m: int, dim: int) -> DataFrame:
    """M-NN adjacency for one layer: brute force when bounded, else
    restricted to deterministic LSH sign-bit cells sized for
    ~CELL_TARGET members (the fixed-parameter-decay lesson: cell COUNT
    scales with the layer, cell SIZE stays constant)."""
    import math

    from clinical_api_etl_spark.operators.similarity import _signature

    if n_members <= BRUTE_MAX:
        return _knn_edges(members, m, None)
    bits = max(1, math.ceil(math.log2(n_members / CELL_TARGET)))
    sig = _signature("vec", bits, dim)
    mb = members.select(
        "nid", "vec", "nrm", F.concat_ws("", *sig).alias("ck")
    )
    return _knn_edges(mb, m, "ck")


#: Corpus ceiling for the driver-side search kernel: under it the build
#: collects the per-layer adjacency + prep vectors into numpy artifacts
#: (the `_np` index key) and hnsw_topk runs the ENTIRE beam search
#: driver-side — bit-identical by construction: every cosine is the same
#: dimension-ordered left fold / (nrm·nrm) tree as functions/vectors.py
#: (the `_brute_knn_pairs_np` parity argument), beam/top-k ordering is
#: (cos DESC bitwise, node ASC), and candidate/dedup logic is set
#: algebra over exact (query, node) pairs. At bench scale the
#: distributed search is 7 rounds of joins/windows over KB-sized state —
#: pure overhead (20-31 s isolated vs ~2 s driver-side).
HNSW_DRIVER_MAX = 200_000


def _np_brute_adj(ids, vecs, nrms, member_idx, m):
    """Symmetrized distinct M-NN edge set (as a set of (i, j) index
    pairs) among ``member_idx``, exactly the _brute_knn_pairs_np
    trajectory: dimension-ordered dot fold, /(n·n) finish, per-row order
    (sim DESC, neighbor id ASC), self excluded, bidirectional."""
    import numpy as np

    mi = np.asarray(member_idx, dtype=np.int64)
    nn = len(mi)
    if nn < 2:
        return set()
    A = vecs[mi]
    acc = np.zeros((nn, nn))
    for d in range(A.shape[1]):
        acc += np.outer(A[:, d], A[:, d])
    sim = acc / np.outer(nrms[mi], nrms[mi])
    # members are already in global-id order (ids sorted ascending), so
    # column order == neighbor-id order; stable argsort on -sim gives
    # (sim DESC, id ASC)
    cand = np.argsort(-sim, axis=1, kind="stable")
    edges = set()
    for i in range(nn):
        picked = 0
        for j in cand[i]:
            if j == i:
                continue
            a, b = mi[i], mi[j]
            edges.add((a, b))
            edges.add((b, a))
            picked += 1
            if picked >= m:
                break
    return edges


def _np_cell_adj(spark, ids, vecs, nrms, member_idx, m, n_members, dim):
    """Cell-restricted M-NN for an over-BRUTE_MAX layer: the identical
    LSH sign-bit cells (the ±1 plane components come from ONE tiny Spark
    collect of the same xxhash64 expression the distributed _signature
    uses; the projection is the dimension-ordered fold), then per-cell
    brute M-NN."""
    import math

    import numpy as np
    from pyspark.sql import functions as F

    bits = max(1, math.ceil(math.log2(n_members / CELL_TARGET)))
    # the distributed _signature hashes INT-typed plane*dim+d — xxhash64
    # is TYPE-sensitive (int32 vs int64 hash differently), so collect the
    # components from the identical int-typed expression
    comp_row = (
        spark.range(1)
        .select(
            F.transform(
                F.sequence(F.lit(0), F.lit(bits * dim - 1)),
                lambda x: F.when(
                    F.xxhash64(x).bitwiseAND(F.lit(1)) == 1, F.lit(1.0)
                ).otherwise(F.lit(-1.0)),
            ).alias("c")
        )
        .collect()[0]["c"]
    )
    comp = np.asarray(comp_row, dtype=np.float64).reshape(bits, dim)
    mi = np.asarray(member_idx, dtype=np.int64)
    A = vecs[mi]
    keys = []
    for p in range(bits):
        acc = np.zeros(len(mi))
        for d in range(dim):
            acc = acc + A[:, d] * comp[p, d]
        keys.append((acc >= 0).astype(np.int64))
    cells: dict = {}
    for row_i in range(len(mi)):
        ck = tuple(k[row_i] for k in keys)
        cells.setdefault(ck, []).append(mi[row_i])
    edges = set()
    for members in cells.values():
        edges |= _np_brute_adj(ids, vecs, nrms, members, m)
    return edges


def hnsw_build(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = HNSW_M,
    dim: int = 64,
) -> dict:
    """Build the three-layer index; returns eagerly-materialized
    artifacts: ``layers`` (list of (adj, rounds) from top down), ``entry``
    (1-row nid), ``prep`` (nid, vec, nrm) — plus, under
    :data:`HNSW_DRIVER_MAX`, the ``_np`` numpy twin of all of it for the
    driver-side search kernel.

    Under the bound the whole build ALSO runs driver-side (one collect;
    norms are the identical dimension-ordered x² fold + sqrt, layer
    membership the identical md5-prefix rule, adjacency the proven
    _brute_knn_pairs_np trajectory per layer/cell) and the DataFrame
    artifacts are created FROM the numpy results — the distributed build
    below is the over-bound path."""
    import pandas as pd

    n = corpus.count()
    if 0 < n <= HNSW_DRIVER_MAX:
        import hashlib

        import numpy as np

        spark = corpus.sparkSession
        pdf = corpus.select(id_col, vec_col).toPandas()
        ids = pdf[id_col].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        vecs = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)[order]
        # norm: the identical left fold 0.0 + x0² + x1² + … then sqrt
        acc = np.zeros(n)
        for d in range(vecs.shape[1]):
            acc = acc + vecs[:, d] * vecs[:, d]
        nrms = np.sqrt(acc)
        md5s = np.asarray(
            [hashlib.md5(str(v).encode()).hexdigest() for v in ids],
            dtype=object,
        )
        l1_idx = np.nonzero(np.char.startswith(md5s.astype(str), "0"))[0]
        l2_idx = np.nonzero(np.char.startswith(md5s.astype(str), "00"))[0]
        n1, n2 = len(l1_idx), len(l2_idx)
        pool = l2_idx if n2 > 0 else (l1_idx if n1 > 0 else np.arange(n))
        entry_pos = min(pool, key=lambda i: (md5s[i], ids[i]))
        dimv = vecs.shape[1]

        def adj_for(member_idx, n_members):
            if n_members <= BRUTE_MAX:
                return _np_brute_adj(ids, vecs, nrms, member_idx, m)
            return _np_cell_adj(
                spark, ids, vecs, nrms, member_idx, m, n_members, dimv
            )

        layer_specs = []
        if n2 > 1:
            layer_specs.append((l2_idx, n2, 1))
        if n1 > 1:
            layer_specs.append((l1_idx, n1, HNSW_R1))
        layer_specs.append((np.arange(n), n, HNSW_R0))
        id_type = corpus.schema[id_col].dataType.simpleString()
        layers = []
        np_layers = []
        for member_idx, n_members, rounds in layer_specs:
            edges = adj_for(member_idx, n_members)
            if edges:
                es = np.array(sorted(edges), dtype=np.int64)
                s_arr, d_arr = es[:, 0], es[:, 1]
            else:
                s_arr = np.empty(0, dtype=np.int64)
                d_arr = np.empty(0, dtype=np.int64)
            adj_df = spark.createDataFrame(
                pd.DataFrame({"src": ids[s_arr], "dst": ids[d_arr]}),
                f"src {id_type}, dst {id_type}",
            ).localCheckpoint(eager=True)
            layers.append((adj_df, rounds))
            counts = np.bincount(s_arr, minlength=n)
            starts = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(counts, out=starts[1:])
            np_layers.append((starts, d_arr, rounds))
        entry_df = spark.createDataFrame(
            pd.DataFrame({"nid": [ids[entry_pos]]}), f"nid {id_type}"
        )
        prep_df = spark.createDataFrame(
            pd.DataFrame(
                {"nid": ids, "vec": vecs.tolist(), "nrm": nrms}
            ),
            f"nid {id_type}, vec array<double>, nrm double",
        )
        return {
            "layers": layers,
            "entry": entry_df,
            "prep": prep_df,
            "_np": {
                "ids": ids,
                "vecs": vecs,
                "nrms": nrms,
                "pos": {v: i for i, v in enumerate(ids)},
                "layers": np_layers,
                "entry": ids[entry_pos],
            },
        }
    # Distributed build (over-bound path). Partition count scales with
    # the corpus (~64k vectors / 32 MB per partition), floor 8: the
    # round-6 tiny-persisted-table rule — the old
    # repartition(defaultParallelism) spread sf0.1's 2,000 vectors over
    # 32 partitions and every downstream join/score stage paid 32 task
    # launches for microseconds of work each.
    parts = max(8, n // 65536)
    prep = (
        _prep(corpus, id_col, vec_col)
        .repartition(parts)
        .localCheckpoint(eager=True)
    )
    md5c = F.md5(F.col("nid").cast("string"))
    lvl1 = prep.filter(F.substring(md5c, 1, 1) == "0")
    lvl2 = prep.filter(F.substring(md5c, 1, 2) == "00")
    # ONE job for both layer counts (was two separate .count() jobs)
    lc = prep.agg(
        F.count(F.when(F.substring(md5c, 1, 1) == "0", 1)).alias("n1"),
        F.count(F.when(F.substring(md5c, 1, 2) == "00", 1)).alias("n2"),
    ).collect()[0]
    n1, n2 = lc["n1"], lc["n2"]
    entry_pool = lvl2 if n2 > 0 else (lvl1 if n1 > 0 else prep)
    entry = (
        entry_pool.select("nid")
        .orderBy(F.md5(F.col("nid").cast("string")), F.col("nid"))
        .limit(1)
        .localCheckpoint(eager=True)
    )
    layers: list[tuple[DataFrame, int]] = []
    if n2 > 1:
        layers.append(
            (_layer_adj(lvl2, n2, m, dim).localCheckpoint(eager=True), 1)
        )
    if n1 > 1:
        layers.append(
            (_layer_adj(lvl1, n1, m, dim).localCheckpoint(eager=True), HNSW_R1)
        )
    layers.append((_layer_adj(prep, n, m, dim).localCheckpoint(eager=True), HNSW_R0))
    return {"layers": layers, "entry": entry, "prep": prep}


def _hnsw_topk_np(
    queries: DataFrame, idx: dict, id_col: str, vec_col: str, k: int, beam: int
) -> DataFrame | None:
    """Driver-side beam search over the ``_np`` index twin — the exact
    trajectory of the distributed rounds below (see HNSW_DRIVER_MAX for
    the bitwise argument). Returns ``None`` for over-bound or duplicated
    query sets (the distributed path then runs)."""
    import numpy as np
    import pandas as pd

    npi = idx["_np"]
    qdf = (
        queries.select(
            F.col(id_col).alias("query_id"),
            as_double(F.col(vec_col)).alias("q_vec"),
            norm(as_double(F.col(vec_col))).alias("q_nrm"),
        )
        .limit(HNSW_DRIVER_MAX + 1)
        .toPandas()
    )
    if len(qdf) > HNSW_DRIVER_MAX:
        return None
    qids = qdf["query_id"].to_numpy()
    if len(np.unique(qids)) != len(qids):
        return None  # distributed state semantics differ on dup queries
    nq = len(qids)
    spark = queries.sparkSession
    out_schema = (
        f"query_id {queries.schema[id_col].dataType.simpleString()},"
        f" neighbor_id {queries.schema[id_col].dataType.simpleString()},"
        " cos_sim double, rank int"
    )
    if nq == 0:
        return spark.createDataFrame(
            pd.DataFrame(
                {"query_id": [], "neighbor_id": [], "cos_sim": [], "rank": []}
            ),
            out_schema,
        )
    qvecs = np.asarray(qdf["q_vec"].tolist(), dtype=np.float64)
    qnrms = qdf["q_nrm"].to_numpy(dtype=np.float64)
    ids, vecs, nrms = npi["ids"], npi["vecs"], npi["nrms"]
    n = len(ids)
    dim = vecs.shape[1]
    entry_pos = npi["pos"][npi["entry"]]

    def score(q_idx, node_idx):
        # dimension-ordered left fold == functions/vectors.py:dot, then
        # the identical /(q_nrm * nrm) two-op finish
        acc = np.zeros(len(q_idx), dtype=np.float64)
        qv = qvecs[q_idx]
        vv = vecs[node_idx]
        for d in range(dim):
            acc = acc + qv[:, d] * vv[:, d]
        return acc / (qnrms[q_idx] * nrms[node_idx])

    # state: encoded (q_idx * n + node_idx), kept SORTED for dedup probes
    q0 = np.arange(nq, dtype=np.int64)
    node0 = np.full(nq, entry_pos, dtype=np.int64)
    state_keys = q0 * n + node0
    state_cos = score(q0, node0)
    order = np.argsort(state_keys, kind="stable")
    state_keys, state_cos = state_keys[order], state_cos[order]
    beam_q, beam_node = q0, node0

    for starts, dsts, rounds in npi["layers"]:
        for _ in range(rounds):
            deg = starts[beam_node + 1] - starts[beam_node]
            if deg.sum() == 0:
                # no expansion → state unchanged → beam unchanged (the
                # distributed round recomputes an identical beam)
                continue
            rq = np.repeat(beam_q, deg)
            gather = np.concatenate(
                [dsts[starts[v]: starts[v + 1]] for v in beam_node]
            ) if len(beam_node) else np.empty(0, dtype=np.int64)
            cand = np.unique(rq * n + gather)
            cand = cand[
                state_keys[
                    np.clip(
                        np.searchsorted(state_keys, cand), 0, len(state_keys) - 1
                    )
                ]
                != cand
            ]
            if len(cand):
                cq, cnode = cand // n, cand % n
                ccos = score(cq, cnode)
                state_keys = np.concatenate([state_keys, cand])
                state_cos = np.concatenate([state_cos, ccos])
                order = np.argsort(state_keys, kind="stable")
                state_keys, state_cos = state_keys[order], state_cos[order]
            # beam = per-query top-`beam` of STATE by (cos DESC, node ASC)
            sq = state_keys // n
            snode = state_keys % n
            order = np.lexsort((snode, -state_cos, sq))
            gq = sq[order]
            grp_start = np.concatenate(([True], gq[1:] != gq[:-1]))
            gsi = np.nonzero(grp_start)[0]
            rank_in_grp = np.arange(len(gq)) - np.repeat(
                gsi, np.diff(np.append(gsi, len(gq)))
            )
            keep = order[rank_in_grp < beam]
            beam_q = sq[np.sort(keep)]
            beam_node = snode[np.sort(keep)]
    # final: drop self hits (by VALUE), per-query top-k by
    # (cos DESC, neighbor ASC), contiguous ranks from 1
    sq = state_keys // n
    snode = state_keys % n
    notself = qids[sq] != ids[snode]
    sq, snode, scos = sq[notself], snode[notself], state_cos[notself]
    order = np.lexsort((snode, -scos, sq))
    gq = sq[order]
    gsi = np.nonzero(np.concatenate(([True], gq[1:] != gq[:-1])))[0]
    rank_in_grp = np.arange(len(gq)) - np.repeat(
        gsi, np.diff(np.append(gsi, len(gq)))
    )
    sel = rank_in_grp < k
    out = pd.DataFrame(
        {
            "query_id": qids[gq[sel]],
            "neighbor_id": ids[snode[order][sel]],
            "cos_sim": scos[order][sel],
            "rank": (rank_in_grp[sel] + 1).astype(np.int32),
        }
    )
    return spark.createDataFrame(out, out_schema)


def hnsw_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    m: int = HNSW_M,
    beam: int = HNSW_BEAM,
    index: dict | None = None,
) -> DataFrame:
    """Approximate top-k via beam search over the navigable graph.

    Output shape matches :func:`similarity.cosine_topk`:
    (query_id, neighbor_id, cos_sim, rank) — similarities exact, the
    candidate set approximate."""
    idx = index if index is not None else hnsw_build(
        corpus, id_col=id_col, vec_col=vec_col, m=m
    )
    if "_np" in idx:
        fast = _hnsw_topk_np(queries, idx, id_col, vec_col, k, beam)
        if fast is not None:
            return fast
    prep, entry = idx["prep"], idx["entry"]
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    q = q.select(
        "query_id",
        as_double(F.col("qv")).alias("q_vec"),
        norm(as_double(F.col("qv"))).alias("q_nrm"),
    ).localCheckpoint(eager=True)

    def _score(cand: DataFrame) -> DataFrame:
        """(query_id, node) → + exact cos_sim via one corpus join."""
        sim = dot(F.col("q_vec"), F.col("vec")) / (F.col("q_nrm") * F.col("nrm"))
        return (
            prep.join(
                F.broadcast(cand.select(F.col("node").alias("nid"), "query_id")),
                "nid",
            )
            .join(F.broadcast(q), "query_id")
            .select("query_id", F.col("nid").alias("node"), sim.alias("cos_sim"))
        )

    seed = q.select("query_id").crossJoin(
        F.broadcast(entry.select(F.col("nid").alias("node")))
    )
    state = _score(seed).localCheckpoint(eager=True)  # beam ∪ visited seed
    beam_df = state
    topw = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("node"))
    for adj, rounds in idx["layers"]:
        for _ in range(rounds):
            cand = (
                adj.join(
                    F.broadcast(
                        beam_df.select(F.col("node").alias("src"), "query_id")
                    ),
                    "src",
                )
                .select("query_id", F.col("dst").alias("node"))
                .distinct()
                .join(
                    state.select("query_id", "node"),
                    ["query_id", "node"],
                    "left_anti",
                )
            )
            scored = _score(cand)
            state = state.unionByName(scored).localCheckpoint(eager=False)
            beam_df = (
                state.withColumn("rn", F.row_number().over(topw))
                .filter(F.col("rn") <= beam)
                .drop("rn")
                .localCheckpoint(eager=False)
            )
    return (
        state.filter(F.col("query_id") != F.col("node"))
        .select("query_id", F.col("node").alias("neighbor_id"), "cos_sim")
        .withColumn("rank", F.row_number().over(
            W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
        ))
        .filter(F.col("rank") <= k)
    )
