"""Driver-side kernels for the bounded-probe graph family. [EXT]

The per-source BFS operators (hop distances, Brandes sigma/delta,
Bellman-Ford, temporal earliest arrival) carry probe-set-bounded state:
|sources| x |V| rows, over an edge list that is DIMENSION-scaled on this
engine's graphs (customers x suppliers / parts). At bench scale the
distributed rounds' cost is per-level scheduler latency, not data — the
same finding that produced the driver-CC, kmeans-sample, unigram-EM and
Kosaraju-SCC fast paths. Under the bounds below, the whole computation
runs as ONE bounded collect + numpy passes, bit-identical to the
distributed loops by construction:

* integer state (dist / sigma / weights / arrival times) uses exact
  int64 scatter ops (``np.minimum.at`` / ``np.add.at``) — associative
  and order-free, so equality with the join/aggregate form is total;
* the ONLY float state — the Brandes delta — replays the pinned
  successor-id-sorted fold exactly: terms are elementwise IEEE ops over
  exactly-cast int64 sigmas (correctly rounded on every engine), the
  per-node sum runs ``_seq_segment_sum`` over terms lexsorted by
  (source, node, successor) — a strict one-position-at-a-time left
  fold, used precisely because ``np.add.reduceat`` sums PAIRWISE and
  would not be bit-identical to the distributed fold. The fold's 0.0
  seed is a bitwise no-op because every term is non-negative (sigma
  ratios > 0, 1 + delta >= 1). Node-id sort
  order: the kernels code nodes by rank of the node value (python str
  order == Spark UTF8 binary order — UTF-8 preserves code-point order),
  so integer code order IS the struct sort order the distributed fold
  uses.

Every kernel has the distributed loop as its >bound fallback — the
100-TB path — and a bitwise parity test (tests/test_graph_kernels.py).
"""

from __future__ import annotations


def factorize(src_vals, dst_vals):
    """(srcid, dstid, sorted_nodes): dense 0..n-1 codes ranked by node
    value order (hash-factorize all endpoints, sort only the |V|
    uniques)."""
    import numpy as np
    import pandas as pd

    allv = pd.concat(
        [pd.Series(src_vals), pd.Series(dst_vals)], ignore_index=True
    )
    codes, uniq = pd.factorize(allv)
    uniq = np.asarray(uniq)  # native dtype (object for strings, int for ids)
    order = np.argsort(uniq, kind="stable")
    rank = np.empty(len(uniq), dtype=np.int64)
    rank[order] = np.arange(len(uniq), dtype=np.int64)
    nids = rank[codes]
    m = len(src_vals)
    return nids[:m], nids[m:], uniq[order]


def _source_codes(sources, sorted_nodes):
    """Map source node values to codes; values absent from the edge list
    get fresh codes appended (they seed state but never expand)."""
    import numpy as np

    idx = {v: i for i, v in enumerate(sorted_nodes)}
    out = []
    extra = list(sorted_nodes)
    for s in sources:
        if s in idx:
            out.append(idx[s])
        else:
            idx[s] = len(extra)
            extra.append(s)
            out.append(idx[s])
    return np.asarray(out, dtype=np.int64), np.asarray(extra, dtype=object)


def _csr(srcid, dstid, n):
    """(starts, dst_sorted): adjacency in CSR form — built once per
    kernel call so per-level expansion is slice gathers instead of
    np.isin scans over the full edge array (the 10× probe's cost)."""
    import numpy as np

    order = np.argsort(srcid, kind="stable")
    ds = dstid[order]
    counts = np.bincount(srcid, minlength=n)
    starts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])
    return starts, ds


def _gather(starts, ds, frontier):
    import numpy as np

    if len(frontier) == 0:
        return np.empty(0, dtype=np.int64)
    return np.concatenate([ds[starts[v]: starts[v + 1]] for v in frontier])


def bfs_hops_per_source_kernel(srcid, dstid, n, source_codes, iters):
    """[(s_code, node_code, dist)] exact per-source hop distances within
    ``iters`` — integer BFS, one boolean/level array per source."""
    import numpy as np

    INF = np.iinfo(np.int64).max
    starts, ds = _csr(srcid, dstid, n)
    out_s, out_v, out_d = [], [], []
    for sc in source_codes:
        dist = np.full(n, INF, dtype=np.int64)
        if sc < n:
            dist[sc] = 0
            frontier = np.array([sc], dtype=np.int64)
        else:  # source absent from the edge list: seed only
            frontier = np.empty(0, dtype=np.int64)
        for k in range(iters):
            if len(frontier) == 0:
                break
            cand = np.unique(_gather(starts, ds, frontier))
            new = cand[dist[cand] == INF] if len(cand) else cand
            dist[new] = k + 1
            frontier = new
        reached = np.nonzero(dist != INF)[0]
        out_s.append(np.full(len(reached), sc, dtype=np.int64))
        out_v.append(reached)
        out_d.append(dist[reached])
        if sc >= n:  # seed-only source: its own 0-distance row
            out_s[-1] = np.concatenate([out_s[-1], [sc]])
            out_v[-1] = np.concatenate([out_v[-1], [sc]])
            out_d[-1] = np.concatenate([out_d[-1], [0]])
    return (
        np.concatenate(out_s) if out_s else np.empty(0, dtype=np.int64),
        np.concatenate(out_v) if out_v else np.empty(0, dtype=np.int64),
        np.concatenate(out_d) if out_d else np.empty(0, dtype=np.int64),
    )


def bfs_hops_kernel(srcid, dstid, n, source_codes, iters):
    """Multi-source BFS (shared frontier): [(node_code, dist)]."""
    import numpy as np

    INF = np.iinfo(np.int64).max
    starts, ds = _csr(srcid, dstid, n)
    dist = np.full(n, INF, dtype=np.int64)
    seeds_in = source_codes[source_codes < n]
    dist[seeds_in] = 0
    frontier = np.unique(seeds_in)
    for k in range(iters):
        if len(frontier) == 0:
            break
        cand = np.unique(_gather(starts, ds, frontier))
        new = cand[dist[cand] == INF] if len(cand) else cand
        dist[new] = k + 1
        frontier = new
    reached = np.nonzero(dist != INF)[0]
    extra = np.unique(source_codes[source_codes >= n])
    return (
        np.concatenate([reached, extra]),
        np.concatenate([dist[reached], np.zeros(len(extra), np.int64)]),
    )


def relax_min_kernel(srcid, dstid, payload, n, source_codes, iters, temporal):
    """Synchronous k-round min-relaxation, exact int64:

    - ``temporal=False`` (Bellman-Ford): cand = dist[src] + w
    - ``temporal=True`` (earliest arrival): cand = t where t >= arr[src]

    Returns [(s_code, node_code, value)] for settled pairs. Matches the
    SPFA/improved-frontier loops' round-k fixpoint exactly (every
    improvement propagates the following round on both forms)."""
    import numpy as np

    INF = np.iinfo(np.int64).max
    # one dst-sort up front: per-round relaxation is then two vectorized
    # gathers + a segment MIN via np.minimum.reduceat — min is
    # associative and order-free, so reduceat's pairwise evaluation is
    # EXACT (unlike float sums; the delta fold cannot use it)
    order = np.argsort(dstid, kind="stable")
    s_by_dst = srcid[order]
    p_by_dst = payload[order]
    d_sorted = dstid[order]
    seg_starts = (
        np.nonzero(np.concatenate(([True], d_sorted[1:] != d_sorted[:-1])))[0]
        if len(d_sorted)
        else np.empty(0, dtype=np.int64)
    )
    seg_dst = d_sorted[seg_starts] if len(d_sorted) else d_sorted
    out_s, out_v, out_d = [], [], []
    for sc in source_codes:
        dist = np.full(n, INF, dtype=np.int64)
        if sc < n:
            dist[sc] = 0
        for _ in range(iters):
            if len(d_sorted) == 0:
                break
            ds = dist[s_by_dst]
            live = ds != INF
            if temporal:
                cand = np.where(live & (p_by_dst >= ds), p_by_dst, INF)
            else:
                # mask the addend first so INF rows never overflow
                cand = np.where(live, ds + np.where(live, p_by_dst, 0), INF)
            segmin = np.minimum.reduceat(cand, seg_starts)
            upd = np.minimum(dist[seg_dst], segmin)
            if np.array_equal(upd, dist[seg_dst]):
                break
            new = dist.copy()
            new[seg_dst] = upd
            dist = new
        reached = np.nonzero(dist != INF)[0]
        out_s.append(np.full(len(reached), sc, dtype=np.int64))
        out_v.append(reached)
        out_d.append(dist[reached])
        if sc >= n:
            out_s[-1] = np.concatenate([out_s[-1], [sc]])
            out_v[-1] = np.concatenate([out_v[-1], [sc]])
            out_d[-1] = np.concatenate([out_d[-1], [0]])
    return (
        np.concatenate(out_s) if out_s else np.empty(0, dtype=np.int64),
        np.concatenate(out_v) if out_v else np.empty(0, dtype=np.int64),
        np.concatenate(out_d) if out_d else np.empty(0, dtype=np.int64),
    )


def _seq_segment_sum(terms, starts, total_len):
    """Strict LEFT-FOLD sum per segment (segments = starts[i]..starts[i+1]).

    ``np.add.reduceat``/``reduce`` use PAIRWISE summation (measurably
    different bits from a left fold at >8 elements), so this steps one
    POSITION at a time across all segments simultaneously: each step is
    one vectorized IEEE add per still-live segment, in segment order —
    exactly ``0.0 + t1 + t2 + ...``, the Spark/DuckDB pinned fold."""
    import numpy as np

    ends = np.append(starts[1:], total_len)
    lens = ends - starts
    acc = np.zeros(len(starts), dtype=np.float64)
    for i in range(int(lens.max()) if len(lens) else 0):
        m = lens > i
        acc[m] = acc[m] + terms[starts[m] + i]
    return acc


def brandes_kernel(srcid, dstid, n, source_codes, iters):
    """Per-source (dist, sigma, delta) over the iters-bounded BFS DAG —
    the exact Brandes forward + backward trajectory of
    ``operators/graph.py:brandes_dependencies`` (see module docstring
    for the bitwise argument). Returns arrays
    (s_code, node_code, dist, sigma, delta)."""
    import numpy as np

    INF = np.iinfo(np.int64).max
    starts, ds = _csr(srcid, dstid, n)
    OS, OV, OD, OG, OT = [], [], [], [], []
    for sc in source_codes:
        dist = np.full(n, INF, dtype=np.int64)
        sigma = np.zeros(n, dtype=np.int64)
        if sc < n:
            dist[sc] = 0
            sigma[sc] = 1
            frontier = np.array([sc], dtype=np.int64)
        else:
            frontier = np.empty(0, dtype=np.int64)
        deepest = 0
        for k in range(iters):
            if len(frontier) == 0:
                break
            deg = starts[frontier + 1] - starts[frontier]
            es = np.repeat(frontier, deg)
            ed = _gather(starts, ds, frontier)
            newmask = dist[ed] == INF
            new_nodes = np.unique(ed[newmask])
            if len(new_nodes) == 0:
                break
            # sigma over DAG edges into the new level: exact int64 sums
            dag = newmask  # edges from level-k frontier to unreached
            np.add.at(sigma, ed[dag], sigma[es[dag]])
            dist[new_nodes] = k + 1
            frontier = new_nodes
            deepest = k + 1
        # backward pass: delta = 0 at the deepest reached level
        delta = np.zeros(n, dtype=np.float64)
        # DAG edges (u -> w with dist[w] == dist[u] + 1), sorted ONCE by
        # (u, w): w-code order == w-node string order (rank coding)
        live = dist[srcid] != INF
        dagm = live & (dist[dstid] == dist[srcid] + 1)
        du, dw = srcid[dagm], dstid[dagm]
        order = np.lexsort((dw, du))
        du, dw = du[order], dw[order]
        for k in range(deepest - 1, -1, -1):
            sel = dist[du] == k
            if not sel.any():
                continue
            u, w = du[sel], dw[sel]
            # one term per (u, w): sigma_u/sigma_w * (1 + delta_w) —
            # elementwise IEEE, identical to the distributed projection
            terms = (
                sigma[u].astype(np.float64) / sigma[w].astype(np.float64)
            ) * (1.0 + delta[w])
            # pinned fold: terms already (u, w)-sorted; strict left fold
            # per u segment (see _seq_segment_sum — reduceat is pairwise)
            seg_starts = np.nonzero(
                np.concatenate(([True], u[1:] != u[:-1]))
            )[0]
            sums = _seq_segment_sum(terms, seg_starts, len(terms))
            delta[u[seg_starts]] = sums
        reached = np.nonzero(dist != INF)[0]
        OS.append(np.full(len(reached), sc, dtype=np.int64))
        OV.append(reached)
        OD.append(dist[reached])
        OG.append(sigma[reached])
        OT.append(delta[reached])
        if sc >= n:
            OS[-1] = np.concatenate([OS[-1], [sc]])
            OV[-1] = np.concatenate([OV[-1], [sc]])
            OD[-1] = np.concatenate([OD[-1], [0]])
            OG[-1] = np.concatenate([OG[-1], [1]])
            OT[-1] = np.concatenate([OT[-1], [0.0]])

    def cat(xs, dt):
        return np.concatenate(xs) if xs else np.empty(0, dtype=dt)

    return (
        cat(OS, np.int64),
        cat(OV, np.int64),
        cat(OD, np.int64),
        cat(OG, np.int64),
        cat(OT, np.float64),
    )
