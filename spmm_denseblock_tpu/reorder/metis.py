"""METIS-based reorderings.

The reference drives external `ndmetis` / `gpmetis` binaries and applies
their output files (/root/reference/metis_reorder.cpp:116-141,
gpmetis_rcmk.cpp:119-199). This module keeps the same two adapters —
file-based, so permutations computed anywhere can be applied — plus an
optional in-process path via pymetis when it is installed (it is not
baked into this image; everything degrades gracefully).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from spmm_denseblock_tpu.formats.csr import CSR
from spmm_denseblock_tpu.reorder.base import invert_permutation
from spmm_denseblock_tpu.reorder.simple import _bfs_order, _sort_adjacency_by


def load_iperm(path: str, n: int) -> np.ndarray:
    """Read an ndmetis `.iperm` file (one integer per line: the inverse
    permutation, new2old... metis emits iperm[old]=new) and return
    old2new — metis_reorder.cpp:116-141 semantics."""
    vals = np.loadtxt(path, dtype=np.int64).reshape(-1)
    if vals.shape[0] != n:
        raise ValueError(f"iperm has {vals.shape[0]} entries, expected {n}")
    return vals


def load_partition(path: str, n: int) -> np.ndarray:
    """Read a gpmetis partition file (one part id per vertex line)."""
    parts = np.loadtxt(path, dtype=np.int64).reshape(-1)
    if parts.shape[0] != n:
        raise ValueError(f"partition has {parts.shape[0]} entries, expected {n}")
    return parts


def partition_rcm(csr: CSR, parts: np.ndarray) -> np.ndarray:
    """gpmetis_rcmk: number partitions contiguously; inside each
    partition, ascending-degree-sorted adjacency + BFS restricted to
    intra-partition edges (gpmetis_rcmk.cpp:119-178)."""
    n = csr.n_rows
    deg = csr.degrees()
    indptr, indices = _sort_adjacency_by(csr, deg)  # ascending degree

    # mask inter-partition edges: rebuild a CSR keeping only edges whose
    # endpoints share a partition
    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
    keep = parts[rows] == parts[indices]
    rows_k, cols_k = rows[keep], indices[keep]
    counts = np.bincount(rows_k, minlength=n)
    intra_indptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=intra_indptr[1:])

    # global numbering: partitions in ascending part id, vertices inside a
    # partition in intra-BFS order
    old2new = np.full(n, -1, dtype=np.int64)
    cnt = 0
    for p in np.unique(parts):
        members = np.nonzero(parts == p)[0]
        # local BFS over the intra-partition subgraph: reuse the global
        # BFS but seed/restrict to members via a relabeled subgraph
        local_id = np.full(n, -1, dtype=np.int64)
        local_id[members] = np.arange(members.size)
        sub_counts = counts[members]
        sub_indptr = np.zeros(members.size + 1, dtype=np.int64)
        np.cumsum(sub_counts, out=sub_indptr[1:])
        gather = np.concatenate(
            [
                cols_k[intra_indptr[m] : intra_indptr[m + 1]]
                for m in members
            ]
        ) if members.size else np.zeros(0, np.int64)
        sub_indices = local_id[gather]
        local_order = _bfs_order(sub_indptr, sub_indices, members.size)
        old2new[members] = cnt + local_order
        cnt += members.size
    assert cnt == n
    return old2new


def metis_nd(csr: CSR, iperm_path: Optional[str] = None) -> np.ndarray:
    """Nested-dissection ordering: from an `.iperm` file if given, else
    via pymetis if importable."""
    if iperm_path is not None:
        return load_iperm(iperm_path, csr.n_rows)
    try:
        import pymetis  # noqa: F401
    except ImportError as e:
        raise RuntimeError(
            "metis_nd needs either an iperm file (run `ndmetis` offline, "
            "like the reference) or the pymetis package"
        ) from e
    raise RuntimeError("pymetis nested dissection not wired yet")


def metis_partition_rcm(
    csr: CSR, n_parts: int = 8192, partition_path: Optional[str] = None
) -> np.ndarray:
    """gpmetis<k>_rcmk pipeline. With a partition file, applies it
    directly; otherwise falls back to a degree-bucketed pseudo-partition
    so the pipeline stays runnable without the external binary."""
    if partition_path is not None:
        parts = load_partition(partition_path, csr.n_rows)
    else:
        try:
            import pymetis

            indptr = np.asarray(csr.indptr)
            indices = np.asarray(csr.indices)
            _, membership = pymetis.part_graph(
                min(n_parts, max(2, csr.n_rows // 2)),
                xadj=indptr.tolist(),
                adjncy=indices.tolist(),
            )
            parts = np.asarray(membership, dtype=np.int64)
        except ImportError:
            # graceful degradation: BFS-order buckets of ~n/n_parts
            # vertices approximate a spatial partition
            from spmm_denseblock_tpu.reorder.simple import bfs

            order = invert_permutation(bfs(csr))
            size = max(1, csr.n_rows // max(1, n_parts))
            parts = np.empty(csr.n_rows, dtype=np.int64)
            parts[order] = np.arange(csr.n_rows) // size
    return partition_rcm(csr, parts)
