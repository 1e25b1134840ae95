"""Degree-sort, BFS, and RCM reorderings (vectorized numpy).

Algorithms re-derived from /root/reference/reorder_strategy.cc:41-98:
- max_degree_sort: vertices by descending degree (stable) — :41-55.
- bfs: multi-source FIFO BFS numbering, restarting at the lowest
  unvisited id — :68-98. Vectorized per level: the discovery order of a
  FIFO BFS is "for each frontier vertex in order, its unvisited
  neighbors in adjacency order", which is a stable first-occurrence
  dedupe of the concatenated frontier adjacency.
- rcm_variant: the repo's "rcmk" — adjacency lists pre-sorted by
  *descending* neighbor degree, then BFS (:57-66; note classic RCM uses
  ascending + reversal, provided here as rcm_classic via scipy).
"""

from __future__ import annotations

import numpy as np

from spmm_denseblock_tpu.formats.csr import CSR
from spmm_denseblock_tpu import native as _native


def max_degree_sort(csr: CSR) -> np.ndarray:
    out = _native.run("sdb_degree_sort", csr)
    if out is not None:
        return out
    deg = csr.degrees()
    order = np.argsort(-deg, kind="stable")  # new2old
    old2new = np.empty(csr.n_rows, dtype=np.int64)
    old2new[order] = np.arange(csr.n_rows)
    return old2new


def _bfs_order(indptr: np.ndarray, indices: np.ndarray, n: int) -> np.ndarray:
    """Returns old2new for multi-source FIFO BFS with lowest-unvisited
    restarts. O(levels) numpy passes instead of a per-vertex queue."""
    old2new = np.full(n, -1, dtype=np.int64)
    cnt = 0
    pos = 0
    while cnt < n:
        # restart at lowest unvisited id
        while pos < n and old2new[pos] != -1:
            pos += 1
        if pos == n:
            break
        frontier = np.array([pos], dtype=np.int64)
        old2new[pos] = cnt
        cnt += 1
        while frontier.size:
            # gather all neighbors of the frontier, in frontier order then
            # adjacency order (= FIFO discovery order)
            starts, ends = indptr[frontier], indptr[frontier + 1]
            total = int(np.sum(ends - starts))
            if total == 0:
                break
            idx = np.repeat(starts, ends - starts) + _ragged_arange(ends - starts)
            neigh = indices[idx].astype(np.int64)
            unvisited = old2new[neigh] == -1
            neigh = neigh[unvisited]
            # stable first-occurrence dedupe
            uniq, first = np.unique(neigh, return_index=True)
            order = np.argsort(first, kind="stable")
            discovered = uniq[order]
            old2new[discovered] = cnt + np.arange(discovered.size)
            cnt += discovered.size
            frontier = discovered
    return old2new


def _ragged_arange(lengths: np.ndarray) -> np.ndarray:
    """concatenate([arange(l) for l in lengths]) without the Python loop."""
    total = int(lengths.sum())
    starts = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    return np.arange(total, dtype=np.int64) - np.repeat(starts, lengths)


def bfs(csr: CSR) -> np.ndarray:
    out = _native.run("sdb_bfs", csr)
    if out is not None:
        return out
    return _bfs_order(np.asarray(csr.indptr), np.asarray(csr.indices), csr.n_rows)


def _sort_adjacency_by(csr: CSR, key: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Re-sort each row's neighbor list by key[neighbor] (stable)."""
    indptr = np.asarray(csr.indptr)
    indices = np.asarray(csr.indices, dtype=np.int64)
    rows = csr.row_ids().astype(np.int64)
    # lexsort: primary row, secondary key[neighbor], tertiary neighbor id
    order = np.lexsort((indices, key[indices], rows))
    return indptr, indices[order]


def rcm_variant(csr: CSR) -> np.ndarray:
    """The repo's 'rcmk': neighbors visited in descending-degree order."""
    out = _native.run("sdb_rcm_variant", csr)
    if out is not None:
        return out
    deg = csr.degrees()
    indptr, indices = _sort_adjacency_by(csr, -deg)
    return _bfs_order(indptr, indices, csr.n_rows)


def rcm_classic(csr: CSR) -> np.ndarray:
    """Textbook reverse Cuthill-McKee via scipy (ascending-degree BFS then
    reversal) — the variant ogbg_code_rcmk.py:5-41 implements by hand."""
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    order = reverse_cuthill_mckee(csr.to_scipy(), symmetric_mode=False)
    old2new = np.empty(csr.n_rows, dtype=np.int64)
    old2new[np.asarray(order, dtype=np.int64)] = np.arange(csr.n_rows)
    return old2new
