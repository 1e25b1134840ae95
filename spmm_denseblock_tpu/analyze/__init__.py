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

__all__ = [
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
