from spmm_denseblock_tpu.io.graph_io import (
    dump_edge_list,
    load_edge_list,
    dump_csr,
    load_csr,
    dump_permutation,
    load_permutation,
    save_npz,
    load_npz,
    cached,
)
from spmm_denseblock_tpu.io.datasets import (
    load_dataset,
    synthetic_powerlaw,
    list_datasets,
    DATASET_SIZES,
)

__all__ = [
    "dump_edge_list",
    "load_edge_list",
    "dump_csr",
    "load_csr",
    "dump_permutation",
    "load_permutation",
    "save_npz",
    "load_npz",
    "cached",
    "load_dataset",
    "synthetic_powerlaw",
    "list_datasets",
    "DATASET_SIZES",
]
