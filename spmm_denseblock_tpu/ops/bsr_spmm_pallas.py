"""BSR SpMM as a Pallas TPU kernel — the framework's hot path.

How it maps to the hardware (this is a re-design of the reference's
rocSPARSE BSR kernels, /root/reference/rocsparse_bsrmm_impl.h:315-389,
not a translation):

- The grid iterates over *nonzero blocks* (flat, sorted by block-row),
  not block-rows: per-step work is constant, so load balance is exact —
  the TPU answer to the reference's per-warp nnz-imbalance concern and
  the nnz-weighted scheduling called for in BASELINE.json.
- Block row/col index vectors are scalar-prefetched
  (pltpu.PrefetchScalarGridSpec): the BlockSpec index maps read them to
  decide which B tile and which output tile each step touches, so the
  Pallas pipeline DMAs exactly the needed (b x F_tile) slice of B from
  HBM, double-buffered against the MXU matmul. This replaces the GPU
  kernels' shared-memory staging of gathered B rows
  (rocsparse_bsrmm_impl.h:348-377).
- Each step is one (b x b) @ (b x F_tile) MXU matmul accumulated in the
  output VMEM block in f32. Consecutive steps with the same block-row
  keep the output tile resident; Pallas flushes it to HBM exactly once
  when the row advances (revisiting semantics). b defaults to 128: a
  nonzero block is a full systolic-array matmul.
- Layout prep guarantees every block-row owns >= 1 block (zero blocks are
  inserted for empty rows) so every output tile is written.

Correctness gate: matches the scipy oracle within eps 1e-4
(check_result.cu discipline) — see tests/test_ops.py.

Negative result (round 1, removed in round 2): a grouped variant that
hand-pipelined G parallel DMAs of gathered B tiles per step into a
double-buffered VMEM scratch (the literal TPU transcription of the
rocSPARSE shared-memory staging) measured SLOWER than this flat kernel
at every (b, dim, density) probed on v5e — Mosaic's BlockSpec pipeline
already overlaps the single-tile DMA with the MXU, and the manual
multi-DMA bookkeeping only added scalar work per step. Do not re-attempt
manual DMA staging here without new evidence; the measured step floor is
grid machinery, not gather latency (ROUND1_NOTES.md locality probe).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spmm_denseblock_tpu.formats.bsr import BSR
from spmm_denseblock_tpu.convert.pack import round_up


def _kernel(rows_ref, cols_ref, blocks_ref, dense_ref, out_ref, *, precision):
    j = pl.program_id(1)
    prev_row = rows_ref[jnp.maximum(j - 1, 0)]

    @pl.when(jnp.logical_or(j == 0, rows_ref[j] != prev_row))
    def _zero():
        out_ref[:] = jnp.zeros_like(out_ref)

    # f32 inputs: HIGHEST keeps the reference 1e-4 gate exact. bf16
    # inputs: DEFAULT is the native MXU mode (bf16 multiply, f32
    # accumulate via preferred_element_type) — HIGHEST would request an
    # fp32 contract on bf16 vectors, which Mosaic rejects ("Bad lhs
    # type", seen on v5e).
    out_ref[:] += jnp.dot(
        blocks_ref[0],
        dense_ref[:],
        preferred_element_type=jnp.float32,
        precision=precision,
    )


def _ensure_covering(bsr: BSR) -> BSR:
    """Insert an explicit zero block in every empty block-row so the kernel
    writes every output tile (Pallas outputs are uninitialized)."""
    rows = np.asarray(bsr.block_rows[: bsr.nnzb])
    present = np.zeros(bsr.n_block_rows, dtype=bool)
    present[rows] = True
    missing = np.nonzero(~present)[0]
    if missing.size == 0:
        return bsr
    from spmm_denseblock_tpu.formats.bsr import BSR as _BSR

    return _BSR.from_parts(
        np.concatenate([rows, missing.astype(np.int32)]),
        np.concatenate(
            [np.asarray(bsr.block_cols[: bsr.nnzb]), np.zeros(missing.size, np.int32)]
        ),
        np.concatenate(
            [
                np.asarray(bsr.blocks[: bsr.nnzb]),
                np.zeros((missing.size, bsr.b, bsr.b), np.asarray(bsr.blocks).dtype),
            ]
        ),
        bsr.shape,
        bsr.block_size,
    )


@functools.partial(
    jax.jit, static_argnames=("n_block_rows", "n_rows", "f_tile", "interpret")
)
def _pallas_spmm(
    block_rows,
    block_cols,
    blocks,
    dense,
    n_block_rows: int,
    n_rows: int,
    f_tile: int,
    interpret: bool = False,
):
    nnzb, b, _ = blocks.shape
    f_padded = dense.shape[1]
    assert f_padded % f_tile == 0
    grid = (f_padded // f_tile, nnzb)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, b, b), lambda f, j, rows, cols: (j, 0, 0)),
            pl.BlockSpec((b, f_tile), lambda f, j, rows, cols: (cols[j], f)),
        ],
        out_specs=pl.BlockSpec(
            (b, f_tile), lambda f, j, rows, cols: (rows[j], f)
        ),
    )
    flops = 2 * nnzb * b * b * f_padded
    bytes_accessed = (
        blocks.size * blocks.dtype.itemsize
        + nnzb * b * f_padded * dense.dtype.itemsize
        + n_block_rows * b * f_padded * 4
    )
    precision = (
        jax.lax.Precision.HIGHEST
        if blocks.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    out = pl.pallas_call(
        functools.partial(_kernel, precision=precision),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_block_rows * b, f_padded), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        # F tiles touch disjoint output columns (parallel); the nnzb dim
        # revisits/accumulates output tiles (arbitrary = keep order)
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        interpret=interpret,
    )(block_rows, block_cols, blocks, dense)
    return out[:n_rows]


CHUNK_NNZB = 65536  # scalar-prefetch SMEM ceiling guard (see plan docstring)


def bsr_spmm_pallas_plan(
    bsr: BSR,
    dtype=None,
    f_tile: Optional[int] = None,
    interpret: Optional[bool] = None,
    grad: bool = True,
    chunk_nnzb: Optional[int] = None,
):
    """Host layout prep once -> jitted C = f(B).

    dtype: optional cast for blocks/B (e.g. jnp.bfloat16); accumulation is
    always f32 (preferred_element_type), matching the reference's f32
    numerics gate. interpret=None auto-enables interpreter mode off-TPU so
    tests run on the CPU mesh.

    grad=True (default) attaches a custom VJP so models can train through
    the kernel: dB = A^T @ dC runs the same Pallas kernel on the
    transposed block layout (built once at plan time). Pass grad=False for
    inference/bench plans to skip the transpose copy in device memory.

    chunk_nnzb: the kernel scalar-prefetches the (nnzb,) index vectors
    into SMEM, which has a hard capacity; matrices with more blocks than
    this are executed as a sum of row-sorted chunks (each chunk covered
    so its partial output is fully written). Default CHUNK_NNZB measured
    on v5e.
    """
    if chunk_nnzb is None:
        chunk_nnzb = CHUNK_NNZB
    if bsr.nnzb > chunk_nnzb:
        return _chunked_plan(
            bsr, dtype=dtype, f_tile=f_tile, interpret=interpret,
            grad=grad, chunk_nnzb=chunk_nnzb,
        )
    if grad:
        fwd = bsr_spmm_pallas_plan(
            bsr, dtype=dtype, f_tile=f_tile, interpret=interpret, grad=False
        )
        bwd = bsr_spmm_pallas_plan(
            bsr.transpose(),
            dtype=dtype,
            f_tile=f_tile,
            interpret=interpret,
            grad=False,
        )

        @jax.custom_vjp
        def f(dense):
            return fwd(dense)

        def f_fwd(dense):
            # zero-size residual carries only the primal dtype
            return fwd(dense), jnp.zeros((0,), jnp.asarray(dense).dtype)

        def f_bwd(res, g):
            return (bwd(g).astype(res.dtype),)

        f.defvjp(f_fwd, f_bwd)
        return f

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    covered = _ensure_covering(bsr)
    dev = covered.device_put(dtype=dtype)
    b = dev.b
    n_rows, n_cols = bsr.shape
    k_needed = dev.n_block_cols * b

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
        out = _pallas_spmm(
            dev.block_rows,
            dev.block_cols,
            dev.blocks,
            dense,
            dev.n_block_rows,
            n_rows,
            ft,
            interpret,
        )
        return out[:, : out.shape[1] - pad_c] if pad_c else out

    return run


def bsr_spmm_pallas(bsr: BSR, dense, **kw) -> jnp.ndarray:
    return bsr_spmm_pallas_plan(bsr, **kw)(dense)


def _chunked_plan(bsr, dtype, f_tile, interpret, grad, chunk_nnzb):
    """Sum of per-chunk kernel launches for nnzb beyond the SMEM prefetch
    capacity. Blocks are row-sorted, so chunks are contiguous row bands
    (a row split across two chunks just contributes partial sums)."""
    from spmm_denseblock_tpu.formats.bsr import BSR as _BSR

    n_chunks = -(-bsr.nnzb // chunk_nnzb)
    rows = np.asarray(bsr.block_rows[: bsr.nnzb])
    cols = np.asarray(bsr.block_cols[: bsr.nnzb])
    blocks = np.asarray(bsr.blocks[: bsr.nnzb])
    plans = []
    for c in range(n_chunks):
        sl = slice(c * chunk_nnzb, min((c + 1) * chunk_nnzb, bsr.nnzb))
        frag = _BSR.from_parts(
            rows[sl], cols[sl], blocks[sl], bsr.shape, bsr.block_size
        )
        plans.append(
            bsr_spmm_pallas_plan(
                frag, dtype=dtype, f_tile=f_tile, interpret=interpret,
                grad=grad, chunk_nnzb=bsr.nnzb + 1,  # no recursion
            )
        )

    def run(dense):
        out = plans[0](dense)
        for p in plans[1:]:
            out = out + p(dense)
        return out

    return run
