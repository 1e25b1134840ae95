"""Gorder — greedy window-locality ordering (SIGMOD'16, Wei et al.).

Re-derived from the algorithm the reference vendors
(/root/reference/Gorder/Graph.cpp:423-..., UnitHeap.h:50-117): place
vertices one at a time; the next vertex maximizes the locality score
sum_{u in last-w window} S(u, v) with S = #common in-neighbors +
adjacency. Keys change by +-1 only, so the priority structure is a
bucket-list unit queue (doubly-linked list per key value, head
insertion): O(1) key moves, O(1) amortized extract-max — the same role
the reference's bucketed UnitHeap plays, structure re-derived. Hub
vertices with degree > sqrt(n) skip the expensive common-neighbor
propagation, as the vendored code does. Tie-break among equal keys:
most recently moved wins (bucket head). This Python body is the
executable specification; sdb_gorder (native/src/reorder.cc) matches it
bit-for-bit (tests/test_native.py) and is what production runs use.

This host-side pass is inherently sequential; like the reference we run
it once offline and cache the permutation (io/graph_io.py).
"""

from __future__ import annotations

import os

import numpy as np

from spmm_denseblock_tpu.formats.csr import CSR
from spmm_denseblock_tpu import native as _native


def gorder(csr: CSR, window: int = 5) -> np.ndarray:
    """Returns old2new. window=5 matches the reference CLI default
    (/root/reference/Gorder/main.cpp, gorder.py:1-10).

    Practical envelope: the greedy window scan is inherently sequential
    (the reference ran it offline on arxiv-scale graphs). The bucket
    unit queue + volume-budgeted hub cut keep it bounded everywhere:
    full ogbn-products (123M nnz) orders in ~2 minutes native (vs
    1327 s at the pure sqrt(n) cut, and vs rcmk ~48 s / rabbit ~165 s
    on the same graph)."""
    import ctypes

    out = _native.run("sdb_gorder", csr, ctypes.c_int64(window))
    if out is not None:
        return out
    n = csr.n_rows
    if n == 0:
        return np.empty(0, dtype=np.int64)
    indptr = np.asarray(csr.indptr)
    indices = np.asarray(csr.indices, dtype=np.int64)
    deg = np.diff(indptr)
    hub_cut = max(1.0, np.sqrt(n))
    # volume-budgeted hub cut (identical in sdb_gorder, bit-equality
    # tests): the propagation volume is 2*(nnz + sum_{deg_w<=cut}
    # deg_w^2) queue events at ~30-110 ns each (LLC-bound); pick the
    # largest cut under sqrt(n) that fits the budget, floored at 64 so
    # degree-dense graphs keep the common-neighbor signal even if they
    # overshoot.
    GORDER_TOUCH_BUDGET = 1_000_000_000
    s = np.sort(deg.astype(np.int64))
    s = s[s <= hub_cut]
    cum = 2 * (int(csr.nnz) + np.cumsum(s * s))
    fits = np.nonzero(cum <= GORDER_TOUCH_BUDGET)[0]
    cut_b = int(s[fits[-1]]) if fits.size else 0
    # floor overridable for quality/time A/Bs (mirrors the C++ engine's
    # SDB_GORDER_FLOOR so bit-equality holds under override)
    floor = float(os.environ.get("SDB_GORDER_FLOOR") or 64)
    hub_cut = min(hub_cut, max(floor, float(cut_b)))

    def out_neighbors(v):
        return indices[indptr[v] : indptr[v + 1]]

    # undirected adjacency: in-neighbors == out-neighbors. For directed
    # inputs callers should symmetrize first (the reference's graphs are
    # symmetrized edge dumps, download_ogb.py:23-27).
    #
    # Bucket-list unit queue (the spec sdb_gorder matches move for
    # move): key[v] buckets as doubly-linked lists with head insertion;
    # per-propagate deltas are batched to one list move per touched
    # vertex, in first-touch order.
    key = [0] * n
    prv = [-1] * n
    nxt = [-1] * n
    bhead = [-1]
    maxkey = 0
    placed = np.zeros(n, dtype=bool)

    def unlink(u):
        if prv[u] >= 0:
            nxt[prv[u]] = nxt[u]
        else:
            bhead[key[u]] = nxt[u]
        if nxt[u] >= 0:
            prv[nxt[u]] = prv[u]

    def push_front(u, k):
        nonlocal maxkey
        if len(bhead) <= k:
            bhead.extend([-1] * (k + 1 - len(bhead)))
        prv[u] = -1
        nxt[u] = bhead[k]
        if nxt[u] >= 0:
            prv[nxt[u]] = u
        bhead[k] = u
        key[u] = k
        if k > maxkey:
            maxkey = k

    # ids inserted descending so the initial bucket-0 head is id 0
    for u in range(n - 1, -1, -1):
        push_front(u, 0)

    delta = [0] * n
    touched: list = []

    def propagate(ve, d):
        """ve enters (+1) or leaves (-1) the window. Single adjacency
        scan, touch order interleaved (identical to sdb_gorder)."""
        touched.clear()
        for w in out_neighbors(ve):
            if not placed[w]:  # S_n adjacency term
                if delta[w] == 0:
                    touched.append(w)
                delta[w] += d
            if deg[w] > hub_cut:
                continue  # hub skip
            for u in out_neighbors(w):
                if not placed[u]:  # S_s common-in-neighbor term via w
                    if delta[u] == 0:
                        touched.append(u)
                    delta[u] += d
        for u in touched:  # one O(1) move per touched vertex
            nk = key[u] + delta[u]
            delta[u] = 0
            unlink(u)
            push_front(u, nk)

    start = int(np.argmax(deg)) if n else 0
    order = np.empty(n, dtype=np.int64)
    window_buf: list = []

    v = start
    scan = 0
    for i in range(n):
        unlink(v)  # v leaves the queue on placement
        placed[v] = True
        order[i] = v
        window_buf.append(v)
        propagate(v, +1)
        if len(window_buf) > window:
            propagate(window_buf.pop(0), -1)
        if i == n - 1:
            break
        # extract-max: highest non-empty bucket with key >= 1 (a key-0
        # candidate has no window affinity -> lowest-unvisited restart)
        while maxkey > 0 and bhead[maxkey] < 0:
            maxkey -= 1
        v = bhead[maxkey] if maxkey > 0 else -1
        if v < 0:
            while scan < n and placed[scan]:
                scan += 1
            v = scan

    old2new = np.empty(n, dtype=np.int64)
    old2new[order] = np.arange(n)
    return old2new
