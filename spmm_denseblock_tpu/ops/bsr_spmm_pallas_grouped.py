"""Grouped Pallas BSR SpMM — the speed-of-light tier.

The flat kernel (bsr_spmm_pallas.py) does one (b,b)@(b,F) MXU call per
grid step; at small F the per-step DMA is too small to hide pipeline
latency (measured 36 GB/s at dim=64 — far off roofline). This kernel
processes G blocks of one block-row per step:

- Host packs G consecutive same-row blocks side-by-side into a
  (n_chunks, b, G*b) array (zero-padding the last chunk of each row), so
  the step's compute is ONE (b, G*b) @ (G*b, F_tile) matmul — G times
  the arithmetic per step, still a single systolic pass.
- The G gathered B tiles cannot be expressed as one BlockSpec, so B
  stays in HBM (memory_space ANY) and the kernel hand-pipelines G
  parallel DMAs per chunk into a double-buffered VMEM scratch,
  prefetching chunk j+1's tiles while computing chunk j — the TPU analog
  of the rocSPARSE kernels' shared-memory staging
  (/root/reference/rocsparse_bsrmm_impl.h:348-377), with the MXU playing
  the wavefront and the DMA engines playing the LDS loads.
- Block-row ids and per-chunk column ids are scalar-prefetched; the
  output tile stays resident in VMEM while consecutive chunks share a
  block-row (zero-init on row change), flushed once per (row, F-tile).

Scalar-prefetch arrays live in SMEM: fine up to ~100k chunks; beyond
that use the flat kernel or shard first (dist layer).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spmm_denseblock_tpu.convert.pack import round_up
from spmm_denseblock_tpu.formats.bsr import BSR


def _pack_chunks(bsr: BSR, group: int):
    """(chunk_rows, chunk_cols, packed) with packed: (n_chunks, b, G*b).

    Chunks never span block-rows; empty block-rows get one zero chunk so
    every output tile is written. Padding lanes point at col 0 with zero
    blocks (contribute nothing).
    """
    b, g = bsr.b, group
    nbr = bsr.n_block_rows
    rows = np.asarray(bsr.block_rows[: bsr.nnzb])
    cols = np.asarray(bsr.block_cols[: bsr.nnzb])
    blocks = np.asarray(bsr.blocks[: bsr.nnzb])

    counts = np.bincount(rows, minlength=nbr)
    chunks_per_row = np.maximum(-(-counts // g), 1)
    n_chunks = int(chunks_per_row.sum())

    chunk_rows = np.repeat(np.arange(nbr, dtype=np.int32), chunks_per_row)
    chunk_cols = np.zeros((n_chunks, g), dtype=np.int32)
    packed = np.zeros((n_chunks, b, g * b), dtype=blocks.dtype)

    row_chunk_start = np.zeros(nbr + 1, dtype=np.int64)
    np.cumsum(chunks_per_row, out=row_chunk_start[1:])
    row_nnz_start = np.zeros(nbr + 1, dtype=np.int64)
    np.cumsum(counts, out=row_nnz_start[1:])

    # vectorized scatter of block k -> (chunk, lane)
    within = np.arange(rows.shape[0], dtype=np.int64) - row_nnz_start[rows]
    chunk_idx = row_chunk_start[rows] + within // g
    lane = within % g
    chunk_cols[chunk_idx, lane] = cols
    for k in range(rows.shape[0]):
        c, l = chunk_idx[k], lane[k]
        packed[c, :, l * b : (l + 1) * b] = blocks[k]
    return chunk_rows, chunk_cols, packed


def _kernel(
    rows_ref, cols_ref, packed_ref, b_hbm, out_ref, b_buf, sem, *, group, b, f_tile
):
    f = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    def start_fetch(chunk, slot):
        for g_i in range(group):
            pltpu.make_async_copy(
                b_hbm.at[
                    pl.ds(cols_ref[chunk, g_i] * b, b),
                    pl.ds(f * f_tile, f_tile),
                ],
                b_buf.at[slot, pl.ds(g_i * b, b), :],
                sem.at[slot, g_i],
            ).start()

    def wait(slot):
        for g_i in range(group):
            pltpu.make_async_copy(
                b_hbm.at[pl.ds(0, b), pl.ds(0, f_tile)],  # shape-only
                b_buf.at[slot, pl.ds(g_i * b, b), :],
                sem.at[slot, g_i],
            ).wait()

    slot = jax.lax.rem(j, 2)

    @pl.when(j == 0)
    def _first():
        start_fetch(j, slot)

    @pl.when(j + 1 < nj)
    def _next():
        start_fetch(j + 1, 1 - slot)

    wait(slot)

    prev_row = rows_ref[jnp.maximum(j - 1, 0)]

    @pl.when(jnp.logical_or(j == 0, rows_ref[j] != prev_row))
    def _zero():
        out_ref[:] = jnp.zeros_like(out_ref)

    # precision by dtype: HIGHEST for f32 exactness, DEFAULT for bf16
    # (fp32 contract on bf16 vectors fails Mosaic compile)
    prec = (
        jax.lax.Precision.HIGHEST
        if packed_ref.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    out_ref[:] += jnp.dot(
        packed_ref[0],
        b_buf[slot],
        preferred_element_type=jnp.float32,
        precision=prec,
    )


@functools.partial(
    jax.jit,
    static_argnames=("n_block_rows", "n_rows", "f_tile", "group", "interpret"),
)
def _grouped_spmm(
    chunk_rows,
    chunk_cols,
    packed,
    dense,
    n_block_rows: int,
    n_rows: int,
    f_tile: int,
    group: int,
    interpret: bool = False,
):
    n_chunks, b, gb = packed.shape
    f_padded = dense.shape[1]
    assert f_padded % f_tile == 0
    grid = (f_padded // f_tile, n_chunks)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, b, gb), lambda f, j, rows, cols: (j, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),  # B stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (b, f_tile), lambda f, j, rows, cols: (rows[j], f)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, gb, f_tile), dense.dtype),
            pltpu.SemaphoreType.DMA((2, group)),
        ],
    )
    flops = 2 * n_chunks * b * gb * f_padded
    bytes_accessed = (
        packed.size * packed.dtype.itemsize
        + n_chunks * gb * f_padded * dense.dtype.itemsize
        + n_block_rows * b * f_padded * 4
    )
    out = pl.pallas_call(
        functools.partial(_kernel, group=group, b=b, f_tile=f_tile),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_block_rows * b, f_padded), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")
        ),
        interpret=interpret,
    )(chunk_rows, chunk_cols, packed, dense)
    return out[:n_rows]


def bsr_spmm_pallas_grouped_plan(
    bsr: BSR,
    dtype=None,
    f_tile: Optional[int] = None,
    group: int = 8,
    interpret: Optional[bool] = None,
    grad: bool = True,
):
    """Host chunk-packing once -> jitted C = f(B); custom VJP like the
    flat plan (backward reuses the grouped kernel on A^T)."""
    if grad:
        fwd = bsr_spmm_pallas_grouped_plan(
            bsr, dtype=dtype, f_tile=f_tile, group=group,
            interpret=interpret, grad=False,
        )
        bwd = bsr_spmm_pallas_grouped_plan(
            bsr.transpose(), dtype=dtype, f_tile=f_tile, group=group,
            interpret=interpret, grad=False,
        )

        @jax.custom_vjp
        def f(dense):
            return fwd(dense)

        def f_fwd(dense):
            return fwd(dense), jnp.zeros((0,), jnp.asarray(dense).dtype)

        def f_bwd(res, g):
            return (bwd(g).astype(res.dtype),)

        f.defvjp(f_fwd, f_bwd)
        return f

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    chunk_rows, chunk_cols, packed = _pack_chunks(bsr, group)
    if dtype is not None:
        packed = packed.astype(dtype)
    chunk_rows_d = jnp.asarray(chunk_rows)
    chunk_cols_d = jnp.asarray(chunk_cols)
    packed_d = jnp.asarray(packed)
    b = bsr.b
    n_rows, n_cols = bsr.shape
    k_needed = bsr.n_block_cols * b

    def run(dense):
        dense = jnp.asarray(dense)
        assert dense.shape[0] == n_cols, (dense.shape, n_cols)
        ft = f_tile or min(512, round_up(dense.shape[1], 128))
        f_padded = round_up(dense.shape[1], ft)
        pad_r = k_needed - dense.shape[0]
        pad_c = f_padded - dense.shape[1]
        if pad_r or pad_c:
            dense = jnp.pad(dense, ((0, pad_r), (0, pad_c)))
        if dtype is not None:
            dense = dense.astype(dtype)
        out = _grouped_spmm(
            chunk_rows_d,
            chunk_cols_d,
            packed_d,
            dense,
            bsr.n_block_rows,
            n_rows,
            ft,
            group,
            interpret,
        )
        return out[:, : out.shape[1] - pad_c] if pad_c else out

    return run


def bsr_spmm_pallas_grouped(bsr: BSR, dense, **kw) -> jnp.ndarray:
    return bsr_spmm_pallas_grouped_plan(bsr, **kw)(dense)
