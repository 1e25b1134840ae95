from spmm_denseblock_tpu.analyze.metrics import (
    calculate_nnzb,
    block_metrics,
    fill_histogram,
    bandwidth_profile,
    ell_compact_metrics,
    ell_metrics,
    DEFAULT_BLOCK_SIZES,
)
from spmm_denseblock_tpu.analyze.heatmap import (
    heatmap,
    dump_heatmap,
    load_heatmap,
    plot_heatmap,
)
from spmm_denseblock_tpu.analyze.molecules import (
    molecule_utilization_study,
    per_graph_reorder,
)

__all__ = [
    "molecule_utilization_study",
    "per_graph_reorder",
    "calculate_nnzb",
    "block_metrics",
    "fill_histogram",
    "bandwidth_profile",
    "ell_compact_metrics",
    "ell_metrics",
    "DEFAULT_BLOCK_SIZES",
    "heatmap",
    "dump_heatmap",
    "load_heatmap",
    "plot_heatmap",
]
