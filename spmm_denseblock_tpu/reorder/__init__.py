from spmm_denseblock_tpu.reorder.base import (
    permutate,
    invert_permutation,
    check_permutation,
    identity,
    reorder_per_component,
)
from spmm_denseblock_tpu.reorder.simple import (
    max_degree_sort,
    bfs,
    rcm_variant,
    rcm_classic,
)
from spmm_denseblock_tpu.reorder.gorder import gorder
from spmm_denseblock_tpu.reorder.rabbit import rabbit_order
from spmm_denseblock_tpu.reorder.greedy import greedy_closest
from spmm_denseblock_tpu.reorder.metis import (
    metis_nd,
    metis_partition_rcm,
    nested_dissection,
    partition_rcm,
    load_iperm,
    load_partition,
)
from spmm_denseblock_tpu.reorder.registry import STRATEGIES, reorder, reorder_cached

__all__ = [
    "permutate",
    "invert_permutation",
    "check_permutation",
    "identity",
    "reorder_per_component",
    "max_degree_sort",
    "bfs",
    "rcm_variant",
    "rcm_classic",
    "gorder",
    "rabbit_order",
    "greedy_closest",
    "metis_nd",
    "metis_partition_rcm",
    "nested_dissection",
    "partition_rcm",
    "load_iperm",
    "load_partition",
    "STRATEGIES",
    "reorder",
    "reorder_cached",
]
