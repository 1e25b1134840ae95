"""Hybrid dense-block / remainder-CSR splitter.

The vectorized-numpy re-design of divide_matrix
(/root/reference/divide.cu:52-127): per candidate block, occupancy =
count/b^2; blocks with occupancy >= density go to the BSR part, every
other nonzero stays in a leftover CSR. One pass over the COO view instead
of the reference's per-block-row counts/flags scan.
"""

from __future__ import annotations

import numpy as np

from spmm_denseblock_tpu.formats.csr import CSR
from spmm_denseblock_tpu.formats.bsr import BSR
from spmm_denseblock_tpu.formats.hybrid import Hybrid


def divide(csr: CSR, block_size: int, density: float) -> Hybrid:
    b = block_size
    n_rows, n_cols = csr.shape
    nbc = -(-n_cols // b)

    rows = csr.row_ids().astype(np.int64)
    cols = np.asarray(csr.indices, dtype=np.int64)
    vals = csr.values()

    bkey = (rows // b) * nbc + (cols // b)
    uniq, inv, counts = np.unique(bkey, return_inverse=True, return_counts=True)

    # occupancy threshold — matches the reference's ">= density" gate
    # (divide.cu:93). Note: counts can exceed b^2 only if the input has
    # duplicate coordinates; CSR.from_coo keeps duplicates like the
    # reference's adjacency lists do.
    dense_mask_per_block = counts.astype(np.float64) / (b * b) >= density
    dense_mask = dense_mask_per_block[inv]

    # BSR part
    dense_keys = uniq[dense_mask_per_block]
    if dense_keys.shape[0] > 0:
        remap = np.searchsorted(dense_keys, bkey[dense_mask])
        blocks = np.zeros((dense_keys.shape[0], b, b), dtype=np.float32)
        np.add.at(
            blocks,
            (remap, rows[dense_mask] % b, cols[dense_mask] % b),
            vals[dense_mask],
        )
        bsr = BSR.from_parts(
            (dense_keys // nbc).astype(np.int32),
            (dense_keys % nbc).astype(np.int32),
            blocks,
            csr.shape,
            b,
        )
    else:
        bsr = BSR.from_parts(
            np.zeros(0, np.int32),
            np.zeros(0, np.int32),
            np.zeros((0, b, b), np.float32),
            csr.shape,
            b,
        )

    # remainder CSR part
    rem = ~dense_mask
    remainder = CSR.from_coo(rows[rem], cols[rem], vals[rem], csr.shape)
    return Hybrid(dense=bsr, remainder=remainder, shape=csr.shape)


def auto_threshold(csr: CSR, block_size: int, dense_speedup: float = 4.0) -> float:
    """Analytics-driven density threshold for divide() — the L3->L4 link
    the reference leaves to the human (the divide.cu density argv came
    from eyeballing block_density_dist output).

    Model: routing a block through the dense path costs b^2 cell-ops on
    the MXU but runs ~dense_speedup x faster per element than the
    gather-bound CSR path; a block with occupancy >= 1/dense_speedup is
    therefore cheaper dense. The returned threshold is that break-even
    clipped to the occupancy distribution actually present (10-bucket
    fill histogram), so a graph with no dense blocks yields a threshold
    that routes everything to CSR rather than creating a tiny BSR part.
    """
    import numpy as np

    from spmm_denseblock_tpu.analyze.metrics import fill_histogram

    breakeven = 1.0 / dense_speedup
    hist = fill_histogram(csr, block_size)
    # densest occupied bucket lower edge
    occupied = np.nonzero(hist)[0]
    if occupied.size == 0:
        return 1.0
    densest_edge = occupied[-1] / hist.shape[0]
    if densest_edge < breakeven:
        return 1.0  # nothing qualifies: pure CSR
    return float(breakeven)
