"""Strategy registry + the reorder driver.

The sweep names match the reference's benchmark grid
('original', 'rcmk', 'rabbit' in /root/reference/benchmark.py:39, plus
the offline tools from SURVEY.md §2.2).
"""

from __future__ import annotations

from typing import Callable, Dict

import numpy as np

from spmm_denseblock_tpu.formats.csr import CSR
from spmm_denseblock_tpu.reorder.base import permutate, check_permutation, identity
from spmm_denseblock_tpu.reorder.simple import (
    max_degree_sort,
    bfs,
    rcm_variant,
    rcm_classic,
)
from spmm_denseblock_tpu.reorder.gorder import gorder
from spmm_denseblock_tpu.reorder.rabbit import rabbit_order
from spmm_denseblock_tpu.reorder.greedy import greedy_closest
from spmm_denseblock_tpu.reorder.metis import metis_partition_rcm

STRATEGIES: Dict[str, Callable[[CSR], np.ndarray]] = {
    "original": identity,
    "degree": max_degree_sort,
    "bfs": bfs,
    "rcmk": rcm_variant,  # the repo's descending-degree BFS variant
    "rcm": rcm_classic,
    "gorder": gorder,
    "rabbit": rabbit_order,
    "closest": greedy_closest,
    "gpmetis_rcmk": metis_partition_rcm,
}


def reorder(csr: CSR, strategy: str = "rcmk", **kw):
    """Compute old2new for `strategy` and apply it. Returns
    (reordered_csr, old2new)."""
    if strategy not in STRATEGIES:
        raise KeyError(f"unknown strategy {strategy!r}; have {sorted(STRATEGIES)}")
    old2new = STRATEGIES[strategy](csr, **kw)
    check_permutation(old2new, csr.n_rows)
    return permutate(old2new, csr), old2new
