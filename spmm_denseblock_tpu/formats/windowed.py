"""Windowed dense-tile format: the TPU-shaped payoff of reordering.

Reordering (RCM/Rabbit/Gorder) concentrates each row's nonzeros into a
narrow column band. This format exploits that directly: rows are tiled
in groups of R; each row-tile picks its best W-aligned column window and
stores the submatrix restricted to (tile, window) as a DENSE (R, W)
tile; everything else falls into a remainder CSR. SpMM then becomes

    C[tile] = tiles[t] @ B[window_t]  (batched MXU matmul, contiguous
                                       window loads — no scattered
                                       row gathers)
  + remainder CSR segment-sum (the long tail)

This is the rectangular-supertile generalization of the reference's
square-block hybrid (divide.cu:52-127): where divide keeps b x b blocks
above a density threshold, windowed keeps R x W row-band tiles — a
shape the 128x128 MXU and HBM streaming actually want. Zero-fill FLOPs
are the price; the MXU has FLOPs to burn while the CSR gather path is
latency-bound (measured 12% of HBM peak on v5e).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import numpy as np

from spmm_denseblock_tpu.formats.csr import CSR


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Windowed:
    """tiles: (T, R, W) dense row-band tiles; win_idx[t] = which W-aligned
    column window tile t multiplies; remainder: CSR of all nonzeros not
    captured by a tile. Row-tile t covers rows [t*R, (t+1)*R)."""

    tiles: jax.Array  # (T, R, W)
    win_idx: jax.Array  # (T,) int32
    remainder: CSR
    shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    tile_rows: int = dataclasses.field(metadata=dict(static=True))
    window: int = dataclasses.field(metadata=dict(static=True))

    @property
    def n_tiles(self) -> int:
        return int(self.tiles.shape[0])

    def captured_nnz(self) -> int:
        return int(np.count_nonzero(np.asarray(self.tiles)))

    def to_dense(self) -> np.ndarray:
        R, W = self.tile_rows, self.window
        n_rows, n_cols = self.shape
        out = np.zeros((self.n_tiles * R, -(-n_cols // W) * W), np.float32)
        tiles = np.asarray(self.tiles, dtype=np.float32)
        wins = np.asarray(self.win_idx)
        for t in range(self.n_tiles):
            c0 = int(wins[t]) * W
            out[t * R : (t + 1) * R, c0 : c0 + W] += tiles[t]
        return out[:n_rows, :n_cols] + self.remainder.to_dense()


def divide_windowed(
    csr: CSR, tile_rows: int = 256, window: int = 1024, min_fill: float = 0.0
) -> Windowed:
    """Split into windowed dense tiles + remainder.

    Each row-tile's window is the W-aligned column block holding the MOST
    of its nonzeros (ties -> lowest window). Tiles whose captured-nnz
    fraction of R*W falls below min_fill are dropped to the remainder
    entirely (their tile stays all-zero and win 0)."""
    R, W = tile_rows, window
    n_rows, n_cols = csr.shape
    T = -(-n_rows // R)
    n_win = -(-n_cols // W)

    rows = csr.row_ids().astype(np.int64)
    cols = np.asarray(csr.indices, dtype=np.int64)
    vals = csr.values()

    tile_of = rows // R
    win_of = cols // W
    # best window per tile
    pair = tile_of * n_win + win_of
    counts = np.bincount(pair, minlength=T * n_win).reshape(T, n_win)
    best = np.argmax(counts, axis=1)
    captured = counts[np.arange(T), best]
    keep_tile = captured >= min_fill * R * W

    sel = (win_of == best[tile_of]) & keep_tile[tile_of]
    tiles = np.zeros((T, R, W), dtype=np.float32)
    np.add.at(
        tiles,
        (tile_of[sel], rows[sel] % R, cols[sel] % W),
        vals[sel],
    )
    remainder = CSR.from_coo(rows[~sel], cols[~sel], vals[~sel], csr.shape)
    return Windowed(
        tiles=tiles,
        win_idx=np.where(keep_tile, best, 0).astype(np.int32),
        remainder=remainder,
        shape=csr.shape,
        tile_rows=R,
        window=W,
    )
