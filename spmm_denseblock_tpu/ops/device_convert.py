"""On-device format conversion (jit-able, static shapes).

The reference converts CSR->BSR on the GPU with cuSPARSE's two-phase
protocol (cusparseXcsr2bsrNnz then cusparseScsr2bsr,
/root/reference/run_bsrmm.cu:121-142). The TPU version is one fused XLA
program over the COO view — but where cuSPARSE materializes a
data-dependent nnzb, XLA needs static shapes, so the caller passes a
capacity `nnzb_max` (n_rows*avg-degree bound, or exact from the host
phase-1 count) and gets back the padded flat-BSR layout
(formats/bsr.py): unused slots are zero blocks parked on the last
block-row.

Phase 1 (`count_nnzb_device`) is the jit-able nnzb counter — use it to
size capacity when converting many same-shaped matrices (the
benchmark-sweep case, where one compiled program serves every density).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from spmm_denseblock_tpu.formats.bsr import BSR
from spmm_denseblock_tpu.formats.csr import CSR


@functools.partial(jax.jit, static_argnames=("n_block_cols", "block_size"))
def count_nnzb_device(row_ids, col_ids, n_block_cols: int, block_size: int):
    """Phase 1: number of distinct nonzero blocks (device scalar)."""
    if row_ids.shape[0] == 0:  # static shape: empty matrix has 0 blocks
        return jnp.int32(0)
    key = (row_ids // block_size).astype(jnp.int64) * n_block_cols + (
        col_ids // block_size
    )
    sk = jnp.sort(key)
    fresh = jnp.concatenate(
        [jnp.ones((1,), jnp.int32), (sk[1:] != sk[:-1]).astype(jnp.int32)]
    )
    return jnp.sum(fresh)


@functools.partial(
    jax.jit,
    static_argnames=("n_block_rows", "n_block_cols", "block_size", "nnzb_max"),
)
def csr_to_bsr_device(
    row_ids,
    col_ids,
    vals,
    n_block_rows: int,
    n_block_cols: int,
    block_size: int,
    nnzb_max: int,
):
    """Phase 2: scatter element values into (nnzb_max, b, b) flat blocks.

    Returns (block_rows, block_cols, blocks, nnzb) with padding slots on
    the last block-row (col 0, zero block) — directly consumable by the
    BSR SpMM tiers. Overflow beyond nnzb_max drops blocks (caller sizes
    capacity via count_nnzb_device or a host bound).
    """
    b = block_size
    brow = (row_ids // b).astype(jnp.int64)
    bcol = (col_ids // b).astype(jnp.int64)
    key = brow * n_block_cols + bcol

    order = jnp.argsort(key)
    sk = key[order]
    fresh = jnp.concatenate(
        [jnp.ones((1,), jnp.int32), (sk[1:] != sk[:-1]).astype(jnp.int32)]
    )
    # dense rank of each sorted element's block, in block order
    rank = jnp.cumsum(fresh) - 1  # (nnz,) 0-based block index
    nnzb = rank[-1] + 1 if rank.shape[0] else jnp.int32(0)

    # unique keys -> slot tables. scatter-MIN with a high sentinel: all
    # writes to a real slot carry the same key; overflow writes (clamped
    # to the last slot) carry larger keys, so min preserves that slot's
    # real key; untouched slots keep the sentinel and become padding.
    sentinel = jnp.asarray(n_block_rows, sk.dtype) * n_block_cols
    slot_key = jnp.full((nnzb_max,), sentinel, sk.dtype)
    slot_key = slot_key.at[jnp.minimum(rank, nnzb_max - 1)].min(
        sk, indices_are_sorted=True
    )
    pad_key = jnp.asarray(n_block_rows - 1, sk.dtype) * n_block_cols
    slot_key = jnp.where(slot_key == sentinel, pad_key, slot_key)
    block_rows = (slot_key // n_block_cols).astype(jnp.int32)
    block_cols = (slot_key % n_block_cols).astype(jnp.int32)

    # scatter values into blocks
    r_in = (row_ids[order] % b).astype(jnp.int32)
    c_in = (col_ids[order] % b).astype(jnp.int32)
    v = vals[order] if vals is not None else jnp.ones_like(sk, jnp.float32)
    blocks = jnp.zeros((nnzb_max, b, b), jnp.float32)
    blocks = blocks.at[jnp.minimum(rank, nnzb_max - 1), r_in, c_in].add(
        jnp.where(rank < nnzb_max, v, 0.0)
    )
    return block_rows, block_cols, blocks, nnzb


def csr_to_bsr_on_device(csr: CSR, block_size: int, nnzb_max=None) -> BSR:
    """Convenience wrapper: device conversion, host BSR container."""
    import numpy as np

    nbr = -(-csr.shape[0] // block_size)
    nbc = -(-csr.shape[1] // block_size)
    row_ids = jnp.asarray(csr.row_ids())
    col_ids = jnp.asarray(np.asarray(csr.indices, dtype=np.int32))
    vals = None if csr.data is None else jnp.asarray(np.asarray(csr.data))
    if nnzb_max is None:
        nnzb_max = int(count_nnzb_device(row_ids, col_ids, nbc, block_size))
    brows, bcols, blocks, nnzb = csr_to_bsr_device(
        row_ids, col_ids, vals, nbr, nbc, block_size, int(nnzb_max)
    )
    return BSR(
        block_rows=brows,
        block_cols=bcols,
        blocks=blocks,
        shape=csr.shape,
        block_size=block_size,
        nnzb=int(nnzb),
    )
