"""Gorder — greedy window-locality ordering (SIGMOD'16, Wei et al.).

Re-derived from the algorithm the reference vendors
(/root/reference/Gorder/Graph.cpp:423-..., UnitHeap.h:50-117): place
vertices one at a time; the next vertex maximizes the locality score
sum_{u in last-w window} S(u, v) with S = #common in-neighbors +
adjacency. Keys change by +-1 only, so the reference uses a bucketed
unit heap; here a lazy max-heap with a authoritative key table gives the
same asymptotics in Python. Hub vertices with degree > sqrt(n) skip the
expensive common-neighbor propagation, as the vendored code does.

This host-side pass is inherently sequential; like the reference we run
it once offline and cache the permutation (io/graph_io.py).
"""

from __future__ import annotations

import heapq

import numpy as np

from spmm_denseblock_tpu.formats.csr import CSR
from spmm_denseblock_tpu import native as _native


def gorder(csr: CSR, window: int = 5) -> np.ndarray:
    """Returns old2new. window=5 matches the reference CLI default
    (/root/reference/Gorder/main.cpp, gorder.py:1-10).

    Practical envelope: the greedy window scan is inherently sequential
    (the reference ran it offline on arxiv-scale graphs); even with the
    hub-cap fast path, 100M+-nnz graphs take hours — use rcmk (~48 s at
    full ogbn-products) or rabbit (~165 s) there."""
    import ctypes

    out = _native.run("sdb_gorder", csr, ctypes.c_int64(window))
    if out is not None:
        return out
    n = csr.n_rows
    indptr = np.asarray(csr.indptr)
    indices = np.asarray(csr.indices, dtype=np.int64)
    deg = np.diff(indptr)
    hub_cut = max(1.0, np.sqrt(n))
    # size-gated fast path: the score updates cost ~sum(deg^2) under the
    # sqrt(n) hub cut, which goes superlinear on heavy-tailed graphs
    # (measured: 6.2M nnz 115 s, 12.3M nnz 380 s). Past 20M nnz, cap the
    # update fan-out near the average degree — hubs contribute little
    # window locality anyway (the same reasoning as the sqrt(n) skip).
    # MUST stay formula-identical with sdb_gorder (bit-equality tests).
    if csr.nnz > 20_000_000:
        hub_cut = min(hub_cut, max(64.0, 4.0 * csr.nnz / n))

    def out_neighbors(v):
        return indices[indptr[v] : indptr[v + 1]]

    # undirected adjacency: in-neighbors == out-neighbors. For directed
    # inputs callers should symmetrize first (the reference's graphs are
    # symmetrized edge dumps, download_ogb.py:23-27).
    key = np.zeros(n, dtype=np.int64)
    placed = np.zeros(n, dtype=bool)
    heap: list = []  # lazy entries (-key, v)

    def bump(v, delta):
        key[v] += delta
        if delta > 0 and not placed[v]:
            heapq.heappush(heap, (-key[v], v))

    def propagate(ve, delta):
        """ve enters (+1) or leaves (-1) the window."""
        for u in out_neighbors(ve):
            if not placed[u]:
                bump(u, delta)  # S_n adjacency term
        for w in out_neighbors(ve):
            if deg[w] > hub_cut:
                continue  # hub skip
            for u in out_neighbors(w):
                if not placed[u]:
                    bump(u, delta)  # S_s common-in-neighbor term via w
        if delta < 0:
            # decrements don't push; stale heap entries are filtered on pop
            pass

    start = int(np.argmax(deg)) if n else 0
    order = np.empty(n, dtype=np.int64)
    window_buf: list = []

    v = start
    for i in range(n):
        placed[v] = True
        order[i] = v
        window_buf.append(v)
        propagate(v, +1)
        if len(window_buf) > window:
            propagate(window_buf.pop(0), -1)
        if i == n - 1:
            break
        # pop the max-key unplaced vertex with a fresh key
        v = -1
        while heap:
            negk, cand = heapq.heappop(heap)
            if not placed[cand] and -negk == key[cand]:
                v = cand
                break
        if v == -1:
            # disconnected remainder: lowest unvisited id (reference
            # restarts the same way)
            v = int(np.nonzero(~placed)[0][0])

    old2new = np.empty(n, dtype=np.int64)
    old2new[order] = np.arange(n)
    return old2new
