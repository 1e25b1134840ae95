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
from spmm_denseblock_tpu.reorder.metis import metis_partition_rcm, nested_dissection

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
    "ndmetis": nested_dissection,  # in-process ND (metis_reorder.cpp analog)
}


def reorder(csr: CSR, strategy: str = "rcmk", **kw):
    """Compute old2new for `strategy` and apply it. Returns
    (reordered_csr, old2new)."""
    if strategy not in STRATEGIES:
        raise KeyError(f"unknown strategy {strategy!r}; have {sorted(STRATEGIES)}")
    old2new = STRATEGIES[strategy](csr, **kw)
    check_permutation(old2new, csr.n_rows)
    return permutate(old2new, csr), old2new


def reorder_cached(
    csr: CSR, strategy: str, cache_dir: str = "tmp", tag: str = "graph", **kw
):
    """reorder() with the reference's permutation-cache discipline
    (rabbit_reorder.py writes tmp/<ds>_rabbit.txt and the apply step
    reloads it): the old2new permutation is persisted as a text file
    `<cache_dir>/<tag>_<strategy>.txt` and reused on the next run, so
    expensive orderings (gorder, rabbit, closest) are computed once per
    graph. Returns (reordered_csr, old2new)."""
    import os

    from spmm_denseblock_tpu.io.graph_io import dump_permutation, load_permutation

    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, f"{tag}_{strategy}.txt")
    if os.path.exists(path):
        old2new = load_permutation(path)
        check_permutation(old2new, csr.n_rows)
        return permutate(old2new, csr), old2new
    reordered, old2new = reorder(csr, strategy, **kw)
    dump_permutation(old2new, path)
    return reordered, old2new
