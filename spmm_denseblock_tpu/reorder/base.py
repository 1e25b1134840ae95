"""Reordering primitives.

``permutate`` is the universal primitive every strategy funnels through
(the re-design of /root/reference/reorder_strategy.cc:26-39, which
relabels neighbor ids, moves row i -> old2new[i], and re-sorts rows) —
here one vectorized pass over the COO view instead of per-row vectors.

A strategy is a function CSR -> old2new permutation (np.ndarray of shape
(n,), a bijection old index -> new index). Strategies are registered in
registry.py.
"""

from __future__ import annotations

import os

import numpy as np

from spmm_denseblock_tpu.formats.csr import CSR


def permutate(old2new: np.ndarray, csr: CSR) -> CSR:
    """Apply a vertex permutation to both axes of a (square) sparse matrix.

    For rectangular matrices, the permutation applies to rows only.
    Square matrices route through the native O(nnz) counting-layout pass
    (sdb_permutate: per-row copies + avg-degree-sized sorts, OpenMP) —
    ~10x the numpy global fused-key argsort at products scale; the numpy
    path remains the spec and the fallback.
    """
    old2new = np.asarray(old2new, dtype=np.int64)
    n_rows, n_cols = csr.shape
    if n_rows == n_cols and not os.environ.get("SDB_NO_NATIVE"):
        from spmm_denseblock_tpu import native as _native

        lib = _native.load()
        if lib is not None:
            indptr = np.ascontiguousarray(np.asarray(csr.indptr), np.int32)
            indices = np.ascontiguousarray(np.asarray(csr.indices), np.int32)
            o2n = np.ascontiguousarray(old2new)
            out_indptr = np.empty(n_rows + 1, np.int32)
            out_indices = np.empty(csr.nnz, np.int32)
            order = np.empty(csr.nnz, np.int64)
            lib.sdb_permutate(
                n_rows, indptr, indices, o2n, out_indptr, out_indices, order
            )
            data = None if csr.data is None else np.asarray(csr.data)[order]
            return CSR(
                indptr=out_indptr, indices=out_indices, data=data,
                shape=csr.shape,
            )
    rows = old2new[csr.row_ids().astype(np.int64)]
    cols = np.asarray(csr.indices, dtype=np.int64)
    if n_rows == n_cols:
        cols = old2new[cols]
    data = None if csr.data is None else np.asarray(csr.data)
    return CSR.from_coo(rows, cols, data, csr.shape)


def invert_permutation(perm: np.ndarray) -> np.ndarray:
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.shape[0], dtype=perm.dtype)
    return inv


def check_permutation(old2new: np.ndarray, n: int) -> None:
    """Permutation completeness assert — the reference sprinkles these
    (reorder_strategy.cc:96, greedy.cpp:114)."""
    old2new = np.asarray(old2new)
    if old2new.shape != (n,):
        raise ValueError(f"perm shape {old2new.shape} != ({n},)")
    seen = np.zeros(n, dtype=bool)
    seen[old2new] = True
    if not seen.all():
        raise ValueError("old2new is not a bijection")


def identity(csr: CSR) -> np.ndarray:
    return np.arange(csr.n_rows, dtype=np.int64)


def reorder_per_component(csr: CSR, strategy_fn) -> np.ndarray:
    """Apply a reorder strategy independently inside each connected
    component, keeping components contiguous in ascending order of their
    minimum original vertex id — the batched-small-graphs discipline of
    the reference's per-molecule reorder (/root/reference/ogbg_molhiv.py:
    5-52, which re-chains each molecule's vertices independently).

    For a block-diagonal adjacency of many small graphs this preserves
    the diagonal-block structure while densifying within each block.
    strategy_fn: CSR -> old2new (any entry of reorder.STRATEGIES).
    """
    import scipy.sparse as sp
    from scipy.sparse.csgraph import connected_components

    n = csr.n_rows
    n_comp, labels = connected_components(
        csr.to_scipy(), directed=True, connection="weak"
    )
    old2new = np.empty(n, dtype=np.int64)
    offset = 0
    # components ordered by first appearance (min original id)
    first_seen = np.full(n_comp, n, dtype=np.int64)
    for v in range(n - 1, -1, -1):
        first_seen[labels[v]] = v
    for comp in np.argsort(first_seen, kind="stable"):
        members = np.nonzero(labels == comp)[0]
        if members.size == 1:
            old2new[members[0]] = offset
            offset += 1
            continue
        sub = csr.to_scipy()[members][:, members].tocsr()
        sub_csr = CSR.from_scipy(sub, keep_data=False)
        sub_perm = strategy_fn(sub_csr)
        old2new[members] = offset + np.asarray(sub_perm)
        offset += members.size
    return old2new
