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

import numpy as np

from spmm_denseblock_tpu.formats.csr import CSR


def permutate(old2new: np.ndarray, csr: CSR) -> CSR:
    """Apply a vertex permutation to both axes of a (square) sparse matrix.

    For rectangular matrices, the permutation applies to rows only.
    """
    old2new = np.asarray(old2new, dtype=np.int64)
    n_rows, n_cols = csr.shape
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
