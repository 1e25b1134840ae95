"""Greedy max-shared-neighbor ("closest") ordering.

Re-design of /root/reference/greedy_neighbor.cpp:39-53,96-127 (and the
per-molecule Python clone ogbg_molhiv.py:5-52): chain vertices so each
next vertex maximizes #common neighbors with the previous one. The
reference intersects sorted neighbor lists per candidate under OpenMP;
here one sparse mat-vec per step computes all candidate intersection
counts at once: counts = A @ A[x]^T restricted to unvisited.

O(n * nnz/n * deg) — like the reference, only practical for small/medium
graphs (it was built for ~25-node molecules).
"""

from __future__ import annotations

import numpy as np

from spmm_denseblock_tpu.formats.csr import CSR
from spmm_denseblock_tpu import native as _native


def greedy_closest(csr: CSR, start: int = 0) -> np.ndarray:
    import ctypes

    out = _native.run("sdb_greedy_closest", csr, ctypes.c_int64(start))
    if out is not None:
        return out
    n = csr.n_rows
    A = csr.to_scipy()
    A.data[:] = 1.0
    old2new = np.full(n, -1, dtype=np.int64)
    visited = np.zeros(n, dtype=bool)

    x = start
    for i in range(n):
        old2new[x] = i
        visited[x] = True
        if i == n - 1:
            break
        # counts[v] = |N(x) ∩ N(v)| for all v: one SpMV on the indicator
        row = A.getrow(x)
        counts = np.asarray((A @ row.T).todense()).ravel()
        counts[visited] = -1
        best = int(np.argmax(counts))
        if counts[best] <= 0:
            # no shared-neighbor candidate: lowest unvisited id, like the
            # reference's fallback scan (greedy_neighbor.cpp:119-126)
            best = int(np.nonzero(~visited)[0][0])
        x = best
    return old2new
