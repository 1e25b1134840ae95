"""Hand-scheduled CSR SpMM: XLA gather + Pallas selector-matmul reduce.

Why this exists (the round-1 measurement): the csr_xla tier
(gather + jax.ops.segment_sum) ran the synthetic ogbn-arxiv dim=128 case
at 12.5 ms — and profiling on the v5e showed the GATHER is only 3.3 ms
of that; the segment_sum scatter-add is ~9 ms. The reference hit the
same wall on GPU and wrote five custom warp kernels
(/root/reference/gespmm_csrmm.h:96-377, shared-memory staging of
(colInd, val) chunks). The TPU-idiomatic answer is different: turn the
segmented reduction into MXU matmuls.

Layout (host, once per plan):
- Nonzeros are already row-sorted. Partition output rows into bands of
  R rows; each band's nonzeros are a contiguous slice. Pad every band's
  slice to a multiple of C (the chunk length) with dummy nonzeros
  (col 0, val 0) so chunks never straddle a band.
- Per chunk k: `local_rows[k]` (C int32, row - band_start) and
  `vals[k]` (C f32) become tensor inputs; `chunk_band[k]` (which output
  band) is scalar-prefetched for the output index map.

Kernel step (grid = F_tiles x n_chunks):
- G tile = gathered rows (C, F_tile), streamed contiguously via
  BlockSpec — the gather itself stays in XLA (B[cols] is a random
  access; XLA's dynamic-gather was measured within ~2x of the
  (8,128)-tile-amplified roofline and is not the bottleneck).
- S = where(iota_R == local_rows, vals, 0) — an (R, C) selector built
  on the VPU from VMEM-resident metadata, NO HBM traffic.
- out_tile += S @ G on the MXU. Consecutive chunks of one band keep the
  output tile VMEM-resident (revisiting semantics), flushed once.

The matmul costs R*F*2 flops per nonzero (R=256, F=128: 66 Kflop/nnz)
— cheap on a 197 TFLOP/s MXU, vs a scatter-add that XLA serializes.
Precision: S carries the CSR values; HIGHEST (the default) keeps the
reference's 1e-4 gate exact (Mosaic supports only DEFAULT/HIGHEST; pass
precision=DEFAULT for a ~2x faster single-pass-bf16 reduction when ~1e-2
relative error is acceptable).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spmm_denseblock_tpu.formats.csr import CSR
from spmm_denseblock_tpu.convert.pack import round_up
from spmm_denseblock_tpu.ops.plan import Plan, grad_plan


def _seg_kernel(band_ref, lrows_ref, vals_ref, g_ref, out_ref, *, R, precision):
    k = pl.program_id(1)
    prev = band_ref[jnp.maximum(k - 1, 0)]

    @pl.when(jnp.logical_or(k == 0, band_ref[k] != prev))
    def _zero():
        out_ref[:] = jnp.zeros_like(out_ref)

    # selector: S[r, c] = vals[c] if local_rows[c] == r. Metadata refs
    # are (1, 1, C) tiles (chunk along lanes — the only 2D/3D block
    # shape Mosaic allows for a lane-major vector) and broadcast against
    # an (R, C) iota on the VPU — no HBM traffic. Building S directly in
    # (R, C) keeps the dot in the standard orientation (contraction on
    # lhs lanes); the transposed form measured ~2x slower per step
    # (Mosaic inserts a real (C, R) transpose pass).
    C = lrows_ref.shape[-1]
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (R, C), 0)
    s = jnp.where(r_iota == lrows_ref[0], vals_ref[0], 0.0)
    out_ref[:] += jax.lax.dot(
        s,
        g_ref[:],
        preferred_element_type=jnp.float32,
        precision=precision,
    )


@functools.partial(
    jax.jit,
    static_argnames=("n_bands", "R", "f_tile", "precision", "interpret"),
)
def _pallas_segment_matmul(
    chunk_band,
    local_rows,
    vals,
    gathered,
    n_bands: int,
    R: int,
    f_tile: int,
    precision,
    interpret: bool,
):
    n_chunks, _, C = local_rows.shape
    f_padded = gathered.shape[1]
    assert gathered.shape[0] == n_chunks * C
    grid = (f_padded // f_tile, n_chunks)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, C), lambda f, k, band: (k, 0, 0)),
            pl.BlockSpec((1, 1, C), lambda f, k, band: (k, 0, 0)),
            pl.BlockSpec((C, f_tile), lambda f, k, band: (k, f)),
        ],
        out_specs=pl.BlockSpec((R, f_tile), lambda f, k, band: (band[k], f)),
    )
    flops = 2 * n_chunks * R * C * f_padded
    bytes_accessed = gathered.size * 4 + n_chunks * C * 8 + n_bands * R * f_padded * 4
    return pl.pallas_call(
        functools.partial(_seg_kernel, R=R, precision=precision),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_bands * R, f_padded), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        interpret=interpret,
    )(chunk_band, local_rows, vals, gathered)


def _band_layout(csr: CSR, R: int, C: int):
    """Pad each R-row band's nonzero slice to a multiple of C.

    Returns (cols_pad, local_rows (n_chunks, C), vals (n_chunks, C),
    chunk_band (n_chunks,)). Empty bands get one all-dummy chunk so every
    output tile is written."""
    n = csr.n_rows
    n_bands = -(-n // R)
    indptr = np.asarray(csr.indptr, dtype=np.int64)
    cols = np.asarray(csr.indices, dtype=np.int32)
    vals = csr.values().astype(np.float32)
    rows = csr.row_ids().astype(np.int32)

    band_start = indptr[np.minimum(np.arange(n_bands) * R, n)]
    band_end = indptr[np.minimum(np.arange(1, n_bands + 1) * R, n)]
    band_nnz = band_end - band_start
    chunks_per_band = np.maximum(1, -(-band_nnz // C))
    n_chunks = int(chunks_per_band.sum())

    cols_pad = np.zeros(n_chunks * C, dtype=np.int32)
    lrows_pad = np.zeros(n_chunks * C, dtype=np.int32)
    vals_pad = np.zeros(n_chunks * C, dtype=np.float32)
    chunk_band = np.repeat(
        np.arange(n_bands, dtype=np.int32), chunks_per_band
    )
    chunk_off = np.concatenate([[0], np.cumsum(chunks_per_band)[:-1]]) * C
    for b in range(n_bands):
        s, e = band_start[b], band_end[b]
        o = chunk_off[b]
        cols_pad[o : o + (e - s)] = cols[s:e]
        lrows_pad[o : o + (e - s)] = rows[s:e] - b * R
        vals_pad[o : o + (e - s)] = vals[s:e]
    return (
        cols_pad,
        lrows_pad.reshape(n_chunks, 1, C),
        vals_pad.reshape(n_chunks, 1, C),
        chunk_band,
    )


def csr_spmm_pallas_plan(
    csr: CSR,
    f_tile: Optional[int] = None,
    chunk: int = 1024,
    row_band: int = 256,
    precision=jax.lax.Precision.HIGHEST,
    interpret: Optional[bool] = None,
    grad: bool = True,
):
    """Host layout prep once -> jitted C = f(B).

    chunk (C) trades padding waste (<= C-1 dummies per band) against
    grid-step count; row_band (R) trades selector flops (R*F*2 per nnz)
    against padding. Defaults measured on v5e for graph workloads
    (avg degree ~5-600). grad=True attaches the A^T VJP (same kernel on
    the transposed layout)."""
    if grad:
        fwd = csr_spmm_pallas_plan(
            csr, f_tile=f_tile, chunk=chunk, row_band=row_band,
            precision=precision, interpret=interpret, grad=False,
        )
        bwd = csr_spmm_pallas_plan(
            csr.transpose(), f_tile=f_tile, chunk=chunk, row_band=row_band,
            precision=precision, interpret=interpret, grad=False,
        )
        return grad_plan(fwd, bwd)

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    R, C = row_band, chunk
    n_rows, n_cols = csr.shape
    n_bands = -(-n_rows // R)
    cols_pad_h, lrows_h, vals_h, band_h = _band_layout(csr, R, C)
    arrays = (
        jnp.asarray(cols_pad_h),
        jnp.asarray(lrows_h),
        jnp.asarray(vals_h),
        jnp.asarray(band_h),
    )
    statics = (n_rows, n_cols, n_bands, R, f_tile, precision, interpret)
    return Plan(arrays, _csr_pallas_apply, statics)


@functools.partial(jax.jit, static_argnames="statics")
def _csr_pallas_apply(statics, arrays, dense):
    # one fused program: pad + cast + gather + kernel (fuse-pass rule)
    n_rows, n_cols, n_bands, R, f_tile, precision, interpret = statics
    cols_pad, lrows, vals, band = arrays
    dense = jnp.asarray(dense)
    assert dense.shape[0] == n_cols, (dense.shape, n_cols)
    ft = f_tile or min(512, round_up(dense.shape[1], 128))
    f_padded = round_up(dense.shape[1], ft)
    pad_c = f_padded - dense.shape[1]
    if pad_c:
        dense = jnp.pad(dense, ((0, 0), (0, pad_c)))
    if dense.dtype != jnp.float32:
        dense = dense.astype(jnp.float32)
    gathered = jnp.take(dense, cols_pad, axis=0)
    out = _pallas_segment_matmul(
        band, lrows, vals, gathered, n_bands, R, ft, precision, interpret
    )
    out = out[:n_rows]
    return out[:, : out.shape[1] - pad_c] if pad_c else out


def csr_spmm_pallas(csr: CSR, dense, **kw) -> jnp.ndarray:
    return csr_spmm_pallas_plan(csr, **kw)(dense)
