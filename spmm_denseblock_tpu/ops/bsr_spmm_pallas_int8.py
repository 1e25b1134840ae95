"""int8 Pallas BSR SpMM — quantized serving on the hand-scheduled path.

Same schedule as the flat f32 kernel (ops/bsr_spmm_pallas.py: flat
block list GROUP-packed per step, scalar-prefetched indices,
VMEM-resident output accumulation) with int8 operands: the MXU runs
int8 x int8 -> int32 (double bf16 throughput on v5e-class chips) and
each slot rescales into the f32 accumulator with its block scale; the
per-column operand scale is applied once on the output epilogue
(separable factors).

Round-3 note: until this round the int8 kernel ran ONE block per grid
step while the f32/bf16 kernel had gained group packing — at the
headline shape that is ~20.7k steps of fixed grid cost for a kernel
whose int8 bandwidth SoL is ~2.4 ms, i.e. step-overhead-bound at
33.6 TF/s. The grouped schedule (G slots per step, per-slot scales in
SMEM, pad slots repeating the same buffer's previous col so their DMA
is skipped) is shared with the f32 kernel via _pack_groups.

Quantization contract matches ops/bsr_spmm_int8.py (per-block weight
scales, per-column dynamic operand scales, symmetric, ~1e-2 rel err).
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
from spmm_denseblock_tpu.ops.bsr_spmm_pallas import (
    _RESIDENT_VMEM_LIMIT,
    _resident_budget,
    _auto_group,
    _auto_group_pow2,
    _depth_sort_overheads,
    _depth_sort_policy,
    _ensure_covering,
    _pack_groups,
    _pack_rowgroups,
    _pack_rowgroups_sorted,
    _resident_f_tile,
    _rowgroup_overheads,
    _rowgroup_policy,
    _ROWGROUP_GH_CAP,
)
from spmm_denseblock_tpu.ops.bsr_spmm_int8 import quantize_blocks


def _kernel(rows_ref, cols_ref, scales_ref, blocks_ref, cs_ref, *rest, group):
    dense_refs, out_ref = rest[:-1], rest[-1]
    j = pl.program_id(1)
    prev_row = rows_ref[jnp.maximum(j - 1, 0)]

    @pl.when(jnp.logical_or(j == 0, rows_ref[j] != prev_row))
    def _zero():
        out_ref[:] = jnp.zeros_like(out_ref)

    # per-slot block scales force f32 accumulation across the group
    # (int32 accumulate would need a shared scale); the int8 MXU dot per
    # slot is still the full-rate path
    acc = scales_ref[j * group] * jnp.dot(
        blocks_ref[0], dense_refs[0][:], preferred_element_type=jnp.int32
    ).astype(jnp.float32)
    for g in range(1, group):
        acc += scales_ref[j * group + g] * jnp.dot(
            blocks_ref[g], dense_refs[g][:], preferred_element_type=jnp.int32
        ).astype(jnp.float32)
    # per-column operand scale fused into the accumulate (distributes
    # over the row sum): the old separate epilogue multiply re-read and
    # re-wrote the ENTIRE output from HBM — ~0.65 ms at the headline
    # shape (268 MB out), ~15% of the int8 call (round-4 session 2).
    out_ref[:] += acc * cs_ref[0, :]


def route_pallas_int8_spmm(
    step_rows, slot_cols, qblocks, scales, qdense, col_scale,
    n_block_rows, n_rows, f_tile, group=1, interpret=False, row_group=0,
):
    """int8 twin of ops.bsr_spmm_pallas.route_pallas_spmm — the dist
    stripe functions' kernel entry.

    row_group=R (R > 0): the layout was packed in the row-group
    resident form (pack_buckets_pallas rowgroup=R) — the measured-best
    int8 schedule (corrected int8_g32_p4/g16_p4 rows,
    resident_probe_r4.jsonl; the earlier "hardware garbage" record was
    a probe scales-layout bug, see _rowgroup_int8_kernel).

    row_group=0: SINGLE-ROW residency is a measured negative for int8
    (g8 3.63 vs 3.47 ms, g16 3.48 vs 3.31, g32 3.30 vs 3.20 — the
    kernel runs at ~25-32% of bandwidth SoL, so its gather DMAs are
    already fully hidden and residency only adds dynamic-index
    addressing): always the gather kernel."""
    if (isinstance(row_group, tuple) and row_group
            and row_group[0] in ("sorted", "sorted_gs")):
        # depth-sorted dist layout: step_rows = [win_ids | positions]
        # concatenated (see bsr_spmm_pallas.route_pallas_spmm);
        # "sorted_gs" = group-scale quantization (scales per lane-step,
        # int32 lane accumulation — put_blocks packed them)
        tag, R, gh, W = row_group
        b = qblocks.shape[1]
        K, Fp = qdense.shape
        rft = _resident_f_tile(
            K // b, b, Fp, 1, *_depth_sort_overheads(R, gh, b, 1, W)
        )
        if rft is None:
            raise ValueError(
                "int8 depth-sorted dist layout but no resident f_tile "
                f"fits (K={K} b={b} Fp={Fp} R={R} gh={gh} W={W})"
            )
        T = step_rows.shape[0] // (1 + R)
        n_win = -(-n_block_rows // W)
        return _pallas_int8_spmm_sorted(
            step_rows[:T], step_rows[T:], slot_cols, scales, qblocks,
            qdense.reshape(K // b, b, Fp), col_scale,
            n_win, W, n_rows, rft, gh, R, interpret,
            group_scale=(tag == "sorted_gs"),
        )
    if row_group:
        b = qblocks.shape[1]
        K, Fp = qdense.shape
        rft = _resident_f_tile(
            K // b, b, Fp, 1, *_rowgroup_overheads(row_group, group, b, 1)
        )
        if rft is None:
            raise ValueError(
                "int8 row-group dist layout but no resident f_tile fits "
                f"(K={K} b={b} Fp={Fp} R={row_group} gh={group}) — the "
                "plan builder's fit check and this route disagree (was "
                "SDB_RESIDENT_BUDGET_MB changed after plan build?)"
            )
        n_groups = -(-n_block_rows // row_group)
        return _pallas_int8_spmm_rowgroup(
            step_rows, slot_cols, scales, qblocks,
            qdense.reshape(K // b, b, Fp), col_scale,
            n_groups, n_rows, rft, group, row_group, interpret,
        )
    return _pallas_int8_spmm(
        step_rows, slot_cols, qblocks, scales, qdense, col_scale,
        n_block_rows, n_rows, f_tile, group, interpret,
    )


def _resident_int8_kernel(rows_ref, cols_ref, scales_ref, blocks_ref,
                          cs_ref, dense_ref, out_ref, *, group):
    """Resident-dense int8 kernel: dense is ONE (nbc, b, f_tile) int8
    VMEM block, slots index the untiled leading dim. See the f32/bf16
    twin (_resident_kernel in bsr_spmm_pallas.py) for why this layout
    and why not a 2D pl.ds form. int8 benefits most: the full-F=512
    slice at the headline shape is 67 MB, so residency costs ZERO extra
    f passes and the kernel drops from 52% of its bandwidth SoL to the
    step floor."""
    j = pl.program_id(1)
    prev_row = rows_ref[jnp.maximum(j - 1, 0)]

    @pl.when(jnp.logical_or(j == 0, rows_ref[j] != prev_row))
    def _zero():
        out_ref[:] = jnp.zeros_like(out_ref)

    acc = scales_ref[j * group] * jnp.dot(
        blocks_ref[0], dense_ref[cols_ref[j * group]],
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    for g in range(1, group):
        acc += scales_ref[j * group + g] * jnp.dot(
            blocks_ref[g], dense_ref[cols_ref[j * group + g]],
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
    # fused per-column scale (see _kernel)
    out_ref[:] += acc * cs_ref[0, :]


def _rowgroup_int8_kernel(groups_ref, cols_ref, scales_ref, blocks_ref,
                          cs_ref, dense_ref, out_ref, *, group_half, R):
    """int8 twin of the row-group resident schedule (_rowgroup_kernel in
    bsr_spmm_pallas.py): R block-rows share each grid step, slots split
    statically into R lanes of group_half, per-slot block scales ride
    SMEM and the per-column operand scale is fused into the accumulate.

    History: round 4 first recorded this schedule as a hardware-numerics
    NEGATIVE (rel ~24 while interpret-exact). The isolation diag
    (benchmarks/int8_rowgroup_diag_r4.jsonl) then showed the kernel
    exact at every (R, group_half) tried — the garbage was the PROBE
    passing the single-row layout's per-slot scales to the row-group
    layout (scales are per-slot; layouts assign slots differently).
    With matching scales the schedule is bitwise-exact on chip and
    1-2% faster than the gather kernel at the headline shape
    (resident_probe_r4.jsonl int8_g32_p4 corrected rows)."""
    b = blocks_ref.shape[1]
    G = R * group_half
    j = pl.program_id(1)
    prev = groups_ref[jnp.maximum(j - 1, 0)]

    @pl.when(jnp.logical_or(j == 0, groups_ref[j] != prev))
    def _zero():
        out_ref[:] = jnp.zeros_like(out_ref)

    for lane in range(R):
        acc = None
        for g in range(lane * group_half, (lane + 1) * group_half):
            d = scales_ref[j * G + g] * jnp.dot(
                blocks_ref[g], dense_ref[cols_ref[j * G + g]],
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            acc = d if acc is None else acc + d
        out_ref[lane * b:(lane + 1) * b, :] += acc * cs_ref[0, :]


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_groups", "n_rows", "f_tile", "group_half", "row_group",
        "interpret",
    ),
)
def _pallas_int8_spmm_rowgroup(
    step_groups, slot_cols, scales, qblocks, qdense, col_scale,
    n_groups: int, n_rows: int, f_tile: int, group_half: int,
    row_group: int = 4, interpret: bool = False,
):
    """Row-group resident int8 kernel; qdense: (nbc, b, f_padded) int8."""
    n_slots, b, _ = qblocks.shape
    G = row_group * group_half
    n_steps = n_slots // G
    nbc, b2, f_padded = qdense.shape
    assert b2 == b and f_padded % f_tile == 0
    grid = (f_padded // f_tile, n_steps)
    n_f = f_padded // f_tile
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=[
            pl.BlockSpec((G, b, b), lambda f, j, p, c, s: (j, 0, 0)),
            pl.BlockSpec((1, f_tile), lambda f, j, p, c, s: (0, f)),
            pl.BlockSpec(
                (nbc, b, f_tile),
                lambda f, j, p, c, s: (0, 0, f),
                pipeline_mode=(
                    pl.Buffered(buffer_count=1) if not interpret else None
                ),
            ),
        ],
        out_specs=pl.BlockSpec(
            (row_group * b, f_tile), lambda f, j, p, c, s: (p[j], f)
        ),
    )
    out = pl.pallas_call(
        functools.partial(
            _rowgroup_int8_kernel, group_half=group_half, R=row_group,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_groups * row_group * b, f_padded), jnp.float32
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_slots * b * b * f_padded,
            bytes_accessed=int(
                qblocks.size * n_f + qdense.size
                + n_groups * row_group * b * f_padded * 4
            ),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_RESIDENT_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(step_groups, slot_cols, scales, qblocks,
      col_scale.reshape(1, -1).astype(jnp.float32), qdense)
    return out[:n_rows]


def _sorted_int8_kernel(wins_ref, pos_ref, cols_ref, scales_ref,
                        blocks_ref, cs_ref, dense_ref, out_ref, *, gh, R,
                        group_scale=False):
    """int8 twin of the depth-sorted row-group kernel
    (bsr_spmm_pallas._rowgroup_sorted_kernel): the output tile spans a
    window of W block-rows (3D, dynamic store on the untiled leading
    dim) and each lane lands at its row's original in-window position;
    the per-column operand scale is fused into the accumulate.

    group_scale=False: per-SLOT block scales (scales_ref is (T*G,)),
    f32 accumulation across the lane. group_scale=True (round-5
    default for the single-chip plan): the gh slots of each lane-step
    share ONE scale (scales_ref is (T*R,)), the lane accumulates in
    int32 and applies one f32 scale multiply — the per-slot VPU scale
    work drops gh-fold. Measured (kernel_probe_r5.jsonl): 3.546 ->
    3.403 ms (+4.2%) at the same oracle error (1.60e-2 vs 1.61e-2 —
    lane groups are same-row blocks with similar magnitudes, so the
    shared-absmax quantization loss is noise-level)."""
    G = R * gh
    j = pl.program_id(1)
    prev = wins_ref[jnp.maximum(j - 1, 0)]

    @pl.when(jnp.logical_or(j == 0, wins_ref[j] != prev))
    def _zero():
        out_ref[:] = jnp.zeros_like(out_ref)

    for lane in range(R):
        acc = None
        for g in range(lane * gh, (lane + 1) * gh):
            d = jnp.dot(
                blocks_ref[g], dense_ref[cols_ref[j * G + g]],
                preferred_element_type=jnp.int32,
            )
            if not group_scale:
                d = scales_ref[j * G + g] * d.astype(jnp.float32)
            acc = d if acc is None else acc + d
        p = pos_ref[j * R + lane]
        if group_scale:
            acc = scales_ref[j * R + lane] * acc.astype(jnp.float32)
        out_ref[p] += acc * cs_ref[0, :]


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_windows", "window", "n_rows", "f_tile", "gh", "R", "interpret",
        "group_scale",
    ),
)
def _pallas_int8_spmm_sorted(
    win_ids, pos, slot_cols, scales, qblocks, qdense, col_scale,
    n_windows: int, window: int, n_rows: int, f_tile: int, gh: int,
    R: int, interpret: bool = False, group_scale: bool = False,
):
    """Depth-sorted row-group int8 kernel; qdense: (nbc, b, f_padded)."""
    n_slots, b, _ = qblocks.shape
    G = R * gh
    n_steps = n_slots // G
    nbc, b2, f_padded = qdense.shape
    assert b2 == b and f_padded % f_tile == 0
    grid = (f_padded // f_tile, n_steps)
    n_f = f_padded // f_tile
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=grid,
        in_specs=[
            pl.BlockSpec((G, b, b), lambda f, j, w, p, c, s: (j, 0, 0)),
            pl.BlockSpec((1, f_tile), lambda f, j, w, p, c, s: (0, f)),
            pl.BlockSpec(
                (nbc, b, f_tile),
                lambda f, j, w, p, c, s: (0, 0, f),
                pipeline_mode=(
                    pl.Buffered(buffer_count=1) if not interpret else None
                ),
            ),
        ],
        out_specs=pl.BlockSpec(
            (window, b, f_tile), lambda f, j, w, p, c, s: (w[j], 0, f)
        ),
    )
    out = pl.pallas_call(
        functools.partial(
            _sorted_int8_kernel, gh=gh, R=R, group_scale=group_scale
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_windows * window, b, f_padded), jnp.float32
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_slots * b * b * f_padded,
            bytes_accessed=int(
                qblocks.size * n_f + qdense.size
                + n_windows * window * b * f_padded * 4
            ),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_RESIDENT_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(win_ids, pos, slot_cols, scales, qblocks,
      col_scale.reshape(1, -1).astype(jnp.float32), qdense)
    return out.reshape(n_windows * window * b, f_padded)[:n_rows]


@functools.partial(
    jax.jit,
    static_argnames=("n_block_rows", "n_rows", "f_tile", "group", "interpret"),
)
def _pallas_int8_spmm_resident(
    step_rows,
    slot_cols,
    scales,
    qblocks,
    qdense,
    col_scale,
    n_block_rows: int,
    n_rows: int,
    f_tile: int,
    group: int = 1,
    interpret: bool = False,
):
    n_slots, b, _ = qblocks.shape
    n_steps = n_slots // group
    nbc, b2, f_padded = qdense.shape
    assert b2 == b and f_padded % f_tile == 0
    grid = (f_padded // f_tile, n_steps)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=[
            pl.BlockSpec((group, b, b), lambda f, j, r, c, s: (j, 0, 0)),
            pl.BlockSpec((1, f_tile), lambda f, j, r, c, s: (0, f)),
            pl.BlockSpec(
                (nbc, b, f_tile),
                lambda f, j, r, c, s: (0, 0, f),
                pipeline_mode=(
                    pl.Buffered(buffer_count=1) if not interpret else None
                ),
            ),
        ],
        out_specs=pl.BlockSpec(
            (b, f_tile), lambda f, j, r, c, s: (r[j], f)
        ),
    )
    n_f = f_padded // f_tile
    out = pl.pallas_call(
        functools.partial(_resident_int8_kernel, group=group),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_block_rows * b, f_padded), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_slots * b * b * f_padded,
            bytes_accessed=int(
                qblocks.size * n_f + qdense.size
                + n_block_rows * b * f_padded * 4
            ),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_RESIDENT_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(step_rows, slot_cols, scales, qblocks,
      col_scale.reshape(1, -1).astype(jnp.float32), qdense)
    return out[:n_rows]


@functools.partial(
    jax.jit,
    static_argnames=("n_block_rows", "n_rows", "f_tile", "group", "interpret"),
)
def _pallas_int8_spmm(
    step_rows,
    slot_cols,
    qblocks,
    scales,
    qdense,
    col_scale,
    n_block_rows: int,
    n_rows: int,
    f_tile: int,
    group: int = 1,
    interpret: bool = False,
):
    n_slots, b, _ = qblocks.shape
    n_steps = n_slots // group
    f_padded = qdense.shape[1]
    assert f_padded % f_tile == 0
    grid = (f_padded // f_tile, n_steps)

    def _b_spec(g):
        return pl.BlockSpec(
            (b, f_tile),
            lambda f, j, rows, cols, sc, g=g: (cols[j * group + g], f),
        )

    # scales ride the scalar-prefetch path (SMEM) next to the indices —
    # Mosaic rejects tiny (1,1) BlockSpec'd SMEM operands
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=[
            pl.BlockSpec((group, b, b), lambda f, j, rows, cols, sc: (j, 0, 0)),
            pl.BlockSpec((1, f_tile), lambda f, j, rows, cols, sc: (0, f)),
            *[_b_spec(g) for g in range(group)],
        ],
        out_specs=pl.BlockSpec(
            (b, f_tile), lambda f, j, rows, cols, sc: (rows[j], f)
        ),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, group=group),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_block_rows * b, f_padded), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_slots * b * b * f_padded,
            bytes_accessed=int(
                qblocks.size + n_slots * b * f_padded + n_block_rows * b * f_padded * 4
            ),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        interpret=interpret,
    )(step_rows, slot_cols, scales, qblocks,
      col_scale.reshape(1, -1).astype(jnp.float32), *([qdense] * group))
    # per-column operand scale is fused into the kernel accumulate
    return out[:n_rows]


@jax.jit
def _quantize_cols(dense):
    col_absmax = jnp.max(jnp.abs(dense), axis=0)
    col_scale = jnp.where(col_absmax > 0, col_absmax / 127.0, 1.0)
    q = jnp.clip(jnp.round(dense / col_scale[None, :]), -127, 127).astype(jnp.int8)
    return q, col_scale.astype(jnp.float32)


@jax.jit
def _quantize_cols_static(dense, col_scale):
    """Static-scale serving path: skips the absmax reduction (the cost
    that made dynamic int8 slower than f32 on small graphs, ogbl-ddi)."""
    q = jnp.clip(jnp.round(dense / col_scale[None, :]), -127, 127).astype(jnp.int8)
    return q, col_scale


def bsr_spmm_pallas_int8_plan(
    bsr: BSR,
    f_tile: Optional[int] = None,
    interpret: Optional[bool] = None,
    chunk_nnzb: Optional[int] = None,
    calibration=None,
    group: Optional[int] = None,
    resident: Optional[bool] = None,
    depth_sort: Optional[bool] = None,
    **_ignored,
):
    """Host quantization + layout prep once -> jitted C = f(B).
    Inference-only (no VJP). Chunks beyond the SMEM scalar-prefetch
    ceiling like the f32 plan (sum of covered row-sorted chunks).

    calibration: optional representative operand batch — per-column
    scales become plan constants (see bsr_spmm_int8.static_col_scale).
    group: blocks per grid step (None = _auto_group, shared with the
    f32 kernel)."""
    from spmm_denseblock_tpu.ops.bsr_spmm_int8 import reject_grad_request
    from spmm_denseblock_tpu.ops.bsr_spmm_pallas import CHUNK_NNZB

    reject_grad_request(_ignored, "bsr_int8_pallas")
    if chunk_nnzb is None:
        chunk_nnzb = CHUNK_NNZB
    if bsr.nnzb > chunk_nnzb:
        n_chunks = -(-bsr.nnzb // chunk_nnzb)
        rows = np.asarray(bsr.block_rows[: bsr.nnzb])
        cols = np.asarray(bsr.block_cols[: bsr.nnzb])
        blocks = np.asarray(bsr.blocks[: bsr.nnzb])
        plans = []
        for c in range(n_chunks):
            sl = slice(c * chunk_nnzb, min((c + 1) * chunk_nnzb, bsr.nnzb))
            frag = BSR.from_parts(
                rows[sl], cols[sl], blocks[sl], bsr.shape, bsr.block_size
            )
            plans.append(
                bsr_spmm_pallas_int8_plan(
                    frag, f_tile=f_tile, interpret=interpret,
                    chunk_nnzb=bsr.nnzb + 1, calibration=calibration,
                    group=group, resident=resident,
                )
            )

        from spmm_denseblock_tpu.ops.plan import sum_plan

        return sum_plan(plans)

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    covered = _ensure_covering(bsr)
    rows_h = np.asarray(covered.block_rows[: covered.nnzb])
    cols_h = np.asarray(covered.block_cols[: covered.nnzb])
    blocks_h = np.asarray(covered.blocks[: covered.nnzb], dtype=np.float32)
    group_was_auto = group is None
    if group is None:
        # gather int8 measured monotone-better up to G=32 at the
        # headline occupancy (3.47/3.31/3.20 ms at g8/16/32 —
        # resident_probe_r4.jsonl): use the pow2 rule
        group = _auto_group_pow2(covered.nnzb, np.unique(rows_h).size)
    # int8 plans whose K fits residency at ft=128 (F-independent) pack
    # the ROW-GROUP resident layout: measured 1-2% faster than the
    # gather kernel at the headline shape (corrected int8_g32_p4 /
    # int8_g16_p4 rows, resident_probe_r4.jsonl) and bitwise-exact —
    # the round-4 "hardware garbage" record was a probe scales-layout
    # bug (see _rowgroup_int8_kernel). Single-row residency remains a
    # recorded NEGATIVE (gather DMAs were already hidden); the win
    # comes from the R-fold step-count cut on top of residency.
    # (R, gh) choice and rationale: _rowgroup_policy (int8 R=8)
    R, gh_check = _rowgroup_policy(1, None if group_was_auto else group)
    ovh = _rowgroup_overheads(R, gh_check, covered.b, 1)
    rowgroup = None
    rowgroup_likely = (
        resident is not False
        and f_tile is None
        and _resident_f_tile(covered.n_block_cols, covered.b, 128, 1, *ovh)
        is not None
    )
    # pack f32 blocks, THEN quantize the packed list: pad slots are
    # zero blocks -> q = 0 regardless of scale, so pads contribute
    # exactly nothing and the per-slot scales array lines up with slots
    if depth_sort is None:
        import os as _os

        # occupancy gate (sorted_grid_r5.jsonl): int8 sorted wins only
        # at deep rows (+4.6% at 20 real blocks/row) and loses at 2
        # (-5.3%) and below (-14..-42% — covering zeros + window
        # machinery dominate sparse rows); gate at >= 8.
        avg_real = bsr.nnzb / max(covered.n_block_rows, 1)
        depth_sort = (
            _os.environ.get("SDB_DEPTH_SORT", "1") == "1"
            and avg_real >= 8.0
        )
    pos_h = None
    if rowgroup_likely and depth_sort:
        # depth-sorted twin (see bsr_spmm_pallas._depth_sort_policy):
        # int8 pad slots drop 61.6% -> 28.2% at (R=8, gh=8, W=32)
        Rs, ghs, W = _depth_sort_policy(1, None if group_was_auto else group)
        win_ids_h, pos_h, slot_cols_h, blocks_pad_h, n_win = (
            _pack_rowgroups_sorted(rows_h, cols_h, blocks_h, ghs, Rs, W)
        )
        group = ghs
        step_rows_h = win_ids_h
        import os as _os2

        if _os2.environ.get("SDB_INT8_GROUP_SCALE", "1") == "1":
            # GROUP-SCALE quantization (round 5, kernel_probe_r5.jsonl:
            # 3.546 -> 3.403 ms at the same oracle error): the gh slots
            # of each lane-step share one scale, so the kernel
            # accumulates the lane in int32 and pays ONE f32 scale
            # multiply per lane-step instead of per slot.
            T = win_ids_h.shape[0]
            b_ = covered.b
            lanes = blocks_pad_h.reshape(T, Rs, ghs, b_, b_)
            lane_absmax = np.abs(lanes).max(axis=(2, 3, 4))
            lane_scales = np.where(
                lane_absmax > 0, lane_absmax / 127.0, 1.0
            ).astype(np.float32)
            q = lanes * (
                np.float32(1.0) / lane_scales
            )[:, :, None, None, None]
            np.rint(q, out=q)
            np.clip(q, -127, 127, out=q)
            rowgroup = ("sorted_gs", Rs, ghs, W, n_win)
            # reuse the (qblocks, scales) slots of the arrays tuple:
            # scales carries the (T*R,) lane scales
            blocks_pad_h = None
            qblocks_pre = q.reshape(T * Rs * ghs, b_, b_).astype(np.int8)
            scales_pre = lane_scales.reshape(-1)
        else:
            rowgroup = ("sorted", Rs, ghs, W, n_win)
    elif rowgroup_likely:
        if group_was_auto:
            group = min(group, _ROWGROUP_GH_CAP)
        step_rows_h, slot_cols_h, blocks_pad_h, n_groups = _pack_rowgroups(
            rows_h, cols_h, blocks_h, group, R
        )
        rowgroup = (R, n_groups)
    else:
        step_rows_h, slot_cols_h, blocks_pad_h = _pack_groups(
            rows_h, cols_h, blocks_h, group
        )
    if blocks_pad_h is None:  # group-scale path pre-quantized above
        qblocks, scales = qblocks_pre, scales_pre
    else:
        qblocks, scales = quantize_blocks(blocks_pad_h)
    br = jnp.asarray(step_rows_h)
    bc = jnp.asarray(slot_cols_h)
    qb = jnp.asarray(qblocks)
    sc = jnp.asarray(scales)
    b = covered.b
    n_rows, n_cols = bsr.shape
    k_needed = covered.n_block_cols * b
    static_scale = None
    if calibration is not None:
        from spmm_denseblock_tpu.ops.bsr_spmm_int8 import static_col_scale

        static_scale = static_col_scale(calibration)

    from spmm_denseblock_tpu.ops.plan import Plan

    arrays = (br, bc, qb, sc)
    if pos_h is not None:
        arrays = arrays + (jnp.asarray(pos_h),)
    statics = (
        covered.n_block_rows, n_rows, n_cols, k_needed, f_tile, group,
        interpret,
        None if static_scale is None else tuple(float(v) for v in static_scale),
        resident, rowgroup,
    )
    return Plan(arrays, _int8_pallas_apply, statics)


@functools.partial(jax.jit, static_argnames="statics")
def _int8_pallas_apply(statics, arrays, dense):
    # Fused into ONE program (see _pallas_apply): the separate
    # quantize-then-kernel dispatches cost a relay round-trip each —
    # the dist-wrapped path (single jit) measured 22% faster than this
    # plan at the headline shape before this fuse
    # (benchmarks/dist_pallas_probe_r3.jsonl).
    (n_block_rows, n_rows, n_cols, k_needed,
     f_tile, group, interpret, static_scale, resident, rowgroup) = statics
    br, bc, qb, sc = arrays[:4]
    dense = jnp.asarray(dense, jnp.float32)
    assert dense.shape[0] == n_cols, (dense.shape, n_cols)
    b = qb.shape[1]
    nbc = k_needed // b

    if rowgroup is not None and rowgroup[0] in ("sorted", "sorted_gs"):
        # depth-sorted row-group layout: per-lane window positions ride
        # as a 5th array leaf; "sorted_gs" = group-scale quantization
        # (one shared scale per lane-step, int32 lane accumulation —
        # see _sorted_int8_kernel)
        _, R, gh, W, n_win = rowgroup
        pos = arrays[4]
        f_padded = round_up(dense.shape[1], 128)
        rft = _resident_f_tile(
            nbc, b, f_padded, 1, *_depth_sort_overheads(R, gh, b, 1, W)
        )
        if rft is None:
            raise ValueError(
                "int8 depth-sorted plan but the dense slice no longer "
                "fits the VMEM budget (was SDB_RESIDENT_BUDGET_MB "
                "changed between plan build and apply?)"
            )
        pad_r = k_needed - dense.shape[0]
        pad_c = f_padded - dense.shape[1]
        if pad_r or pad_c:
            dense = jnp.pad(dense, ((0, pad_r), (0, pad_c)))
        if static_scale is not None:
            cs = np.pad(
                np.asarray(static_scale, np.float32), (0, pad_c),
                constant_values=1.0,
            )
            qdense, col_scale = _quantize_cols_static(dense, jnp.asarray(cs))
        else:
            qdense, col_scale = _quantize_cols(dense)
        out = _pallas_int8_spmm_sorted(
            br, pos, bc, sc, qb, qdense.reshape(nbc, b, f_padded),
            col_scale, n_win, W, n_rows, rft, gh, R, interpret,
            group_scale=(rowgroup[0] == "sorted_gs"),
        )
        return out[:, : out.shape[1] - pad_c] if pad_c else out

    if rowgroup is not None:
        # plan packed the row-group resident layout (build-time
        # F-independent fit check); see _rowgroup_int8_kernel
        R, n_groups = rowgroup
        f_padded = round_up(dense.shape[1], 128)
        rft = _resident_f_tile(
            nbc, b, f_padded, 1, *_rowgroup_overheads(R, group, b, 1)
        )
        if rft is None:
            raise ValueError(
                "int8 row-group resident plan but the dense slice no "
                "longer fits the VMEM budget (was SDB_RESIDENT_BUDGET_MB "
                "changed between plan build and apply?)"
            )
        pad_r = k_needed - dense.shape[0]
        pad_c = f_padded - dense.shape[1]
        if pad_r or pad_c:
            dense = jnp.pad(dense, ((0, pad_r), (0, pad_c)))
        if static_scale is not None:
            cs = np.pad(
                np.asarray(static_scale, np.float32), (0, pad_c),
                constant_values=1.0,
            )
            qdense, col_scale = _quantize_cols_static(dense, jnp.asarray(cs))
        else:
            qdense, col_scale = _quantize_cols(dense)
        out = _pallas_int8_spmm_rowgroup(
            br, bc, sc, qb, qdense.reshape(nbc, b, f_padded), col_scale,
            n_groups, n_rows, rft, group, R, interpret,
        )
        return out[:, : out.shape[1] - pad_c] if pad_c else out

    # SINGLE-ROW int8 residency is a measured NEGATIVE at the headline
    # shape (the kernel is step-bound at ~25-32% of bandwidth SoL, so
    # the gather DMAs it would remove are already hidden —
    # resident_probe_r4.jsonl) -> when the row-group layout is
    # unavailable (explicit f_tile, or the overhead-aware fit failed at
    # build), auto (None) routes GATHER; resident=True in that case
    # forces the single-row resident twin (the only way to reach it —
    # resident=True WITH a row-group layout runs row-groups, which are
    # residency plus the step cut).
    rft = None
    if resident is True:
        f_padded128 = round_up(dense.shape[1], 128)
        rft = _resident_f_tile(nbc, b, f_padded128, 1)
        if f_tile is not None:
            rft = f_tile if (
                rft is not None and f_padded128 % f_tile == 0
                and nbc * b * f_tile <= _resident_budget()
            ) else None
        if rft is None:
            raise ValueError(
                f"resident=True but no f_tile fits the VMEM budget "
                f"(nbc={nbc} b={b})"
            )

    if rft is not None:
        ft = rft
        f_padded = round_up(dense.shape[1], 128)
    else:
        ft = f_tile or min(512, round_up(dense.shape[1], 128))
        f_padded = round_up(dense.shape[1], ft)
    pad_r = k_needed - dense.shape[0]
    pad_c = f_padded - dense.shape[1]
    if pad_r or pad_c:
        dense = jnp.pad(dense, ((0, pad_r), (0, pad_c)))
    if static_scale is not None:
        cs = np.pad(
            np.asarray(static_scale, np.float32), (0, pad_c),
            constant_values=1.0,
        )
        qdense, col_scale = _quantize_cols_static(dense, jnp.asarray(cs))
    else:
        qdense, col_scale = _quantize_cols(dense)
    if rft is not None:
        out = _pallas_int8_spmm_resident(
            br, bc, sc, qb, qdense.reshape(nbc, b, f_padded), col_scale,
            n_block_rows, n_rows, ft, group, interpret,
        )
    else:
        out = _pallas_int8_spmm(
            br, bc, qb, sc, qdense, col_scale, n_block_rows, n_rows, ft,
            group, interpret,
        )
    return out[:, : out.shape[1] - pad_c] if pad_c else out
