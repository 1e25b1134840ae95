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
from spmm_denseblock_tpu.ops.plan import Plan, grad_plan, sum_plan


def _dot3(lhs, rhs):
    """Manual bf16x3: split each f32 operand into bf16 hi + bf16 lo
    (the residual), run 3 native-bf16 MXU passes with f32 accumulation,
    drop the lo*lo term (~2^-16 relative — far under the 1e-4 gate).
    This is what Precision.HIGH means on TPU, hand-rolled because
    Mosaic has no HIGH lowering ("Unsupported dot precision: HIGH");
    HIGHEST's 6 passes halve the compute ceiling the dense regime is
    bound on (ROUND2_NOTES: 23.6 TF/s = 72% of the 6-pass 33 TF/s).

    Negative result (round 3, benchmarks/padfill_ab_r3.jsonl
    kind=packed_high_ab): a "packed" variant that pre-split blocks at
    plan time and the dense operand at entry, gathering 2G bf16 plane
    pipelines so the kernel ran pure MXU passes (no per-slot VPU
    casts), measured SLOWER on chip — 28.98 vs 31.42 TF/s at G=4
    (doubling the gather DMA count at half the size costs more than
    the ~1.8 ms of VPU split work saved) — AND returned bf16-grade
    error (1.57e-3) on hardware while interpret mode was exact,
    pointing at a lowering issue with two same-index-map block
    operands + 2G dense pipelines. Do not re-attempt without first
    reproducing the numerics gap in isolation."""
    lh = lhs.astype(jnp.bfloat16)
    ll = (lhs - lh.astype(jnp.float32)).astype(jnp.bfloat16)
    rh = rhs.astype(jnp.bfloat16)
    rl = (rhs - rh.astype(jnp.float32)).astype(jnp.bfloat16)
    acc = jnp.dot(lh, rh, preferred_element_type=jnp.float32)
    acc += jnp.dot(lh, rl, preferred_element_type=jnp.float32)
    acc += jnp.dot(ll, rh, preferred_element_type=jnp.float32)
    return acc


def _kernel(rows_ref, cols_ref, blocks_ref, *rest, precision, group, fuse_dot):
    dense_refs, out_ref = rest[:-1], rest[-1]
    j = pl.program_id(1)
    prev_row = rows_ref[jnp.maximum(j - 1, 0)]

    @pl.when(jnp.logical_or(j == 0, rows_ref[j] != prev_row))
    def _zero():
        out_ref[:] = jnp.zeros_like(out_ref)

    def mxu_dot(lhs, rhs):
        if precision == "bf16x3":
            return _dot3(lhs, rhs)
        return jnp.dot(
            lhs, rhs, preferred_element_type=jnp.float32, precision=precision
        )

    # f32 inputs: HIGHEST keeps the reference 1e-4 gate exact. bf16
    # inputs: DEFAULT is the native MXU mode (bf16 multiply, f32
    # accumulate via preferred_element_type) — HIGHEST would request an
    # fp32 contract on bf16 vectors, which Mosaic rejects ("Bad lhs
    # type", seen on v5e).
    # group > 1: G same-row blocks per grid step (each B tile its own
    # BlockSpec pipeline buffer), accumulated in registers and flushed
    # to the VMEM out tile once — amortizes the fixed per-step grid
    # cost over G MXU passes (the TPU analog of the per-wavefront
    # k-loop in rocsparse_bsrmm_impl.h:348-377).
    if fuse_dot and group > 1:
        # one (b, G*b) @ (G*b, F) systolic pass: amortizes MXU pipeline
        # ramp across the group at the cost of two VMEM concat copies.
        # Measured on chip (benchmarks/tpu_v5e_fusedot_ab.jsonl, G=4
        # headline config): parity with the unfused G-pass loop — f32
        # 24.79 vs 24.77 TF/s, bf16 49.05 vs 49.18. Mosaic already
        # pipelines the G accumulating dots, so fusing buys nothing;
        # kept (off by default) as the seed for K-dim packing work.
        lhs = jnp.concatenate([blocks_ref[g] for g in range(group)], axis=1)
        rhs = jnp.concatenate(
            [dense_refs[g][:] for g in range(group)], axis=0
        )
        out_ref[:] += mxu_dot(lhs, rhs)
        return
    acc = mxu_dot(blocks_ref[0], dense_refs[0][:])
    for g in range(1, group):
        acc += mxu_dot(blocks_ref[g], dense_refs[g][:])
    out_ref[:] += acc


def _resident_kernel(rows_ref, cols_ref, blocks_ref, dense_ref, out_ref,
                     *, precision, group):
    """Resident-dense variant: dense is ONE (nbc, b, f_tile) VMEM block
    (single-buffered, index constant across steps -> one HBM read per f
    pass) and each slot dynamically indexes its (b, f_tile) slice on the
    UNTILED leading dim. Kills the gather amplification of the flat
    kernel (each unique block-col tile was DMA'd once PER SLOT: 20x
    re-fetch = 1.99 ms of the 6.95 ms bf16 headline,
    benchmarks/bf16_gap_r4.jsonl) at the cost of re-reading the block
    list once per f pass.

    Formulation note: indexing the untiled leading dim is load-bearing.
    The 2D layout ((K, f_tile) block + pl.ds on the tiled sublane dim)
    sent the remote compiler into a ~28-minute spin ending in transport
    failure at K=131072; this 3D form compiles in ~0.5 s at every K
    (benchmarks/resident_compile_ladder_r4.jsonl)."""
    j = pl.program_id(1)
    prev_row = rows_ref[jnp.maximum(j - 1, 0)]

    @pl.when(jnp.logical_or(j == 0, rows_ref[j] != prev_row))
    def _zero():
        out_ref[:] = jnp.zeros_like(out_ref)

    def mxu_dot(lhs, rhs):
        if precision == "bf16x3":
            return _dot3(lhs, rhs)
        return jnp.dot(
            lhs, rhs, preferred_element_type=jnp.float32, precision=precision
        )

    acc = mxu_dot(blocks_ref[0], dense_ref[cols_ref[j * group]])
    for g in range(1, group):
        acc += mxu_dot(blocks_ref[g], dense_ref[cols_ref[j * group + g]])
    out_ref[:] += acc


# VMEM budget for the resident dense slice. v5e VMEM is 128 MiB; leave
# room for the double-buffered block groups, the out tile, and Mosaic's
# own scratch. The apply picks the largest f_tile whose slice fits.
# Override: SDB_RESIDENT_BUDGET_MB (same env-knob convention as
# SDB_GORDER_FLOOR / SDB_RABBIT_CAP).
import os as _os

RESIDENT_SLICE_BYTES = (
    int(_os.environ.get("SDB_RESIDENT_BUDGET_MB", "80")) * 1024 * 1024
)

# Mosaic VMEM ceiling passed to the resident pallas_calls. The ladder
# measured slices fine through 104 MB (resident_probe_r4.jsonl); the
# effective budget below is clamped under this so an oversized
# SDB_RESIDENT_BUDGET_MB can never turn auto-routing into a compile
# failure — it just stops raising the budget.
_RESIDENT_VMEM_LIMIT = 112 * 1024 * 1024


def _resident_budget() -> int:
    return min(RESIDENT_SLICE_BYTES, _RESIDENT_VMEM_LIMIT - 8 * 1024 * 1024)


def _resident_f_tile(nbc: int, b: int, f_padded: int, itemsize: int,
                     overhead_const: int = 0, overhead_per_ft: int = 0):
    """Largest f_tile (multiple of 128, divides f_padded) whose
    (nbc, b, f_tile) dense slice fits the resident VMEM budget; None if
    even 128 doesn't fit (fall back to the gather kernel).

    overhead_const/overhead_per_ft: other VMEM the same pallas_call
    holds alongside the slice — the double-buffered block groups
    (const) and the output tile (scales with f_tile). The row-group
    schedule at R=16/G=256 keeps 32 MB of bf16 block buffers, so
    slice-only accounting would let an 80 MB slice blow the Mosaic
    limit; the combined bound keeps auto-routing compile-safe while
    the user budget still caps the slice alone."""
    budget = _resident_budget()
    limit = _RESIDENT_VMEM_LIMIT - 8 * 1024 * 1024
    ft = (f_padded // 128) * 128
    while ft >= 128:
        slice_bytes = nbc * b * ft * itemsize
        if (
            f_padded % ft == 0
            and slice_bytes <= budget
            and slice_bytes + overhead_const + overhead_per_ft * ft <= limit
        ):
            return ft
        ft -= 128
    return None


def _rowgroup_overheads(R: int, gh: int, b: int, itemsize: int):
    """(overhead_const, overhead_per_ft) for the row-group resident
    pallas_call: double-buffered (R*gh, b, b) block groups + the
    (R*b, f_tile) f32 output tile (counted double to stay safe under
    Mosaic's accounting)."""
    return 2 * R * gh * b * b * itemsize, 2 * R * b * 4


_ROWGROUP_GH_CAP = 16


def _rowgroup_policy(itemsize: int, group=None):
    """Measured (R, gh) optimum for the row-group resident schedule
    (resident_probe_r4.jsonl sessions 2+8): keep the per-row group
    SMALL (gh <= 16 — finer pad granularity) and go deep in lanes,
    with the depth optimum dtype-specific — R = 16 for 2-byte
    operands (bf16 5.257 R=4 -> 5.145 R=8 -> 5.096 ms R=16; R=32
    regresses on VMEM pressure), R = 8 for int8 (3.338 R=4 -> 3.238
    R=8 -> 3.293 R=16). Returns (R, gh) honoring an explicit group as
    gh. ONE helper so the bf16 plan, the int8 plan, and the dist
    bucket packer cannot drift apart on a retune."""
    R = 8 if itemsize == 1 else 16
    gh = _ROWGROUP_GH_CAP if group in (None, "auto") else int(group)
    return R, gh


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_block_rows", "n_rows", "f_tile", "group", "interpret",
        "precision_name",
    ),
)
def _pallas_spmm_resident(
    step_rows,
    slot_cols,
    blocks,
    dense,
    n_block_rows: int,
    n_rows: int,
    f_tile: int,
    group: int = 1,
    interpret: bool = False,
    precision_name: str = None,
):
    """dense: (nbc, b, f_padded) — the operand reshaped to blocks on the
    leading dim. See _resident_kernel for the schedule."""
    n_slots, b, _ = blocks.shape
    n_steps = n_slots // group
    nbc, b2, f_padded = dense.shape
    assert b2 == b and f_padded % f_tile == 0
    grid = (f_padded // f_tile, n_steps)

    if precision_name == "high":
        precision = "bf16x3"
    elif precision_name is not None:
        precision = getattr(jax.lax.Precision, precision_name.upper())
    elif blocks.dtype == jnp.float32:
        precision = jax.lax.Precision.HIGHEST
    else:
        precision = jax.lax.Precision.DEFAULT

    n_f = f_padded // f_tile
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((group, b, b), lambda f, j, rows, cols: (j, 0, 0)),
            pl.BlockSpec(
                (nbc, b, f_tile),
                lambda f, j, rows, cols: (0, 0, f),
                # single-buffered: the slice only changes at f-pass
                # boundaries, and two slices would not fit VMEM
                pipeline_mode=(
                    pl.Buffered(buffer_count=1) if not interpret else None
                ),
            ),
        ],
        out_specs=pl.BlockSpec(
            (b, f_tile), lambda f, j, rows, cols: (rows[j], f)
        ),
    )
    out = pl.pallas_call(
        functools.partial(_resident_kernel, precision=precision, group=group),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_block_rows * b, f_padded), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_slots * b * b * f_padded,
            bytes_accessed=int(
                blocks.size * blocks.dtype.itemsize * n_f
                + dense.size * dense.dtype.itemsize
                + n_block_rows * b * f_padded * 4
            ),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_RESIDENT_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(step_rows, slot_cols, blocks, dense)
    return out[:n_rows]


def _rowgroup_kernel(groups_ref, cols_ref, blocks_ref, dense_ref, out_ref,
                     *, group_half, R, precision):
    """Row-GROUP resident kernel: R block-rows share each grid step,
    slots statically split into R lanes of group_half each — the step
    count shrinks ~R-fold at unchanged per-row padding, cutting the
    ~1.4 us/step grid/scalar residual that bounds the resident kernel
    once gathers are gone. Measured (resident_probe_r4.jsonl): bf16
    5.61 (R=1 g32) -> 5.29 (R=2) -> 5.18 ms (R=4), bitwise-exact vs
    the gather kernel.

    CORRECTION (late r4): the int8 twin's "hardware garbage" record
    (rel ~24, interpret-exact) was NOT a lowering anomaly — the probe
    passed the single-row layout's per-slot scales to the row-group
    layout (scales are per-slot; the two layouts assign slots
    differently). The isolation diag
    (benchmarks/int8_rowgroup_diag_r4.jsonl) shows the int8 schedule
    exact at every (R, group_half) tried, and the corrected A/B has it
    1-2% ahead of gather — int8 now ships this schedule too
    (bsr_spmm_pallas_int8._rowgroup_int8_kernel)."""
    b = blocks_ref.shape[1]
    G = R * group_half
    j = pl.program_id(1)
    prev = groups_ref[jnp.maximum(j - 1, 0)]

    @pl.when(jnp.logical_or(j == 0, groups_ref[j] != prev))
    def _zero():
        out_ref[:] = jnp.zeros_like(out_ref)

    def mxu_dot(lhs, rhs):
        if precision == "bf16x3":
            return _dot3(lhs, rhs)
        return jnp.dot(
            lhs, rhs, preferred_element_type=jnp.float32, precision=precision
        )

    for lane in range(R):
        acc = None
        for g in range(lane * group_half, (lane + 1) * group_half):
            d = mxu_dot(blocks_ref[g], dense_ref[cols_ref[j * G + g]])
            acc = d if acc is None else acc + d
        out_ref[lane * b:(lane + 1) * b, :] += acc


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_groups", "n_rows", "f_tile", "group_half", "row_group",
        "interpret", "precision_name",
    ),
)
def _pallas_spmm_rowgroup(
    step_groups, slot_cols, blocks, dense, n_groups, n_rows, f_tile,
    group_half, row_group=4, interpret=False, precision_name=None,
):
    """Resident row-group schedule; dense: (nbc, b, f_padded)."""
    n_slots, b, _ = blocks.shape
    G = row_group * group_half
    n_steps = n_slots // G
    nbc, b2, f_padded = dense.shape
    assert b2 == b and f_padded % f_tile == 0
    grid = (f_padded // f_tile, n_steps)

    if precision_name == "high":
        precision = "bf16x3"
    elif precision_name is not None:
        precision = getattr(jax.lax.Precision, precision_name.upper())
    elif blocks.dtype == jnp.float32:
        precision = jax.lax.Precision.HIGHEST
    else:
        precision = jax.lax.Precision.DEFAULT

    n_f = f_padded // f_tile
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((G, b, b), lambda f, j, p, c: (j, 0, 0)),
            pl.BlockSpec(
                (nbc, b, f_tile),
                lambda f, j, p, c: (0, 0, f),
                pipeline_mode=(
                    pl.Buffered(buffer_count=1) if not interpret else None
                ),
            ),
        ],
        out_specs=pl.BlockSpec(
            (row_group * b, f_tile), lambda f, j, p, c: (p[j], f)
        ),
    )
    out = pl.pallas_call(
        functools.partial(
            _rowgroup_kernel, group_half=group_half, R=row_group,
            precision=precision,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_groups * row_group * b, f_padded), jnp.float32
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_slots * b * b * f_padded,
            bytes_accessed=int(
                blocks.size * blocks.dtype.itemsize * n_f
                + dense.size * dense.dtype.itemsize
                + n_groups * row_group * b * f_padded * 4
            ),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_RESIDENT_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(step_groups, slot_cols, blocks, dense)
    return out[:n_rows]


def _pack_rowgroups(rows, cols, blocks, group_half: int, R: int):
    """Row-group packing with block values (plan-time host path; the
    layout math is shared with the value-free probe packer,
    scripts/r4_resident_probe_lite.pack_rowgroups). rows must cover
    every block-row (see _ensure_covering). Returns (step_groups (T,),
    slot_cols (T*G,), blocks_padded (T*G, b, b), n_groups)."""
    nnzb, b, _ = blocks.shape
    order = np.argsort(rows, kind="stable")
    rows_s = np.asarray(rows)[order]
    uniq, first = np.unique(rows_s, return_index=True)
    # Covering contract: output rows land at uniq's RANK, so a gap in
    # uniq silently row-compresses the result. Fail loudly instead
    # (callers run _ensure_covering / pack covering buckets first).
    assert uniq.size and uniq[0] == 0 and uniq[-1] == uniq.size - 1, (
        "_pack_rowgroups requires a covering rows list "
        "(every block-row present at least once)"
    )
    counts = np.diff(np.append(first, rows_s.size))
    n_rows_cov = uniq.size
    pad_rows = (-n_rows_cov) % R
    counts_p = np.append(counts, np.zeros(pad_rows, counts.dtype))
    groups = (n_rows_cov + pad_rows) // R
    per_row_steps = -(-counts_p // group_half)
    steps_per_group = np.maximum(
        per_row_steps.reshape(groups, R).max(axis=1), 1
    )
    T = int(steps_per_group.sum())
    G = R * group_half
    step_base = np.concatenate([[0], np.cumsum(steps_per_group)[:-1]])
    rank = np.arange(rows_s.size) - np.repeat(first, counts)
    krank = np.searchsorted(uniq, rows_s)
    grp = krank // R
    lane = krank % R
    dest_s = ((step_base[grp] + rank // group_half) * G
              + lane * group_half + rank % group_half)
    dest = np.empty(rows_s.size, np.int64)
    dest[order] = dest_s
    blocks_pad = np.zeros((T * G, b, b), np.asarray(blocks).dtype)
    blocks_pad[dest] = np.asarray(blocks)
    cols_pad = np.full(T * G, -1, np.int64)
    cols_pad[dest] = np.asarray(cols)
    c2 = cols_pad.reshape(T, G)
    cols_filled = per_buffer_col_fill(c2, c2 >= 0, np.zeros_like(c2))
    step_groups = np.repeat(
        np.arange(groups), steps_per_group
    ).astype(np.int32)
    return (step_groups, cols_filled.reshape(-1).astype(np.int32),
            blocks_pad, int(groups))


def _depth_sort_policy(itemsize: int, group=None):
    """(R, gh, W) for the DEPTH-SORTED row-group schedule (round-5,
    VERDICT r4 #5): rows are sorted by block count within windows of W
    consecutive block-rows before grouping, so each group's R lanes
    have near-equal depth and the per-group max-step padding collapses;
    gh drops because sorted groups make fine granularity cheap (the
    consecutive-grouping optimum was gh=16 only because group-max
    padding dominated). Pad slots multiply the dominant blocks-restream
    HBM term AND the MXU dots. W is VMEM-bounded: the kernel's output
    tile spans the whole window ((W, b, f_tile) f32, lanes store at
    dynamic in-window positions), so W*b*f_tile*4 rides in VMEM next
    to the resident slice.

    Measured on chip at the headline shape
    (benchmarks/depthsort_ab_r5.jsonl, 3 repeats each):
      bf16: consec 5.451 ms -> gh8/W64 4.863 -> gh4/W64 4.789 ->
            **gh4/W128 4.666 ms (74.3 TF/s, +16.8%)**; gh2/W128
            regresses (4.813 — the 715-step count costs more than the
            last 5% of pad saves).
      int8: consec 3.638 -> **gh8/W32 3.546 (97.8 TF/s, +2.6%)**;
            gh4/{W32,W64} flat at ~3.56. The int8 pad cut
            (61.6% -> 28.2%) buys far less than bf16's because the
            kernel runs at only ~30% of its schedule SoL — its bound
            is not bytes (sol_reconcile_r5.jsonl)."""
    if itemsize == 1:
        R, gh, W = 8, 8, 32
    else:
        R, gh, W = 16, 4, 128
    if group not in (None, "auto"):
        gh = int(group)
    return R, gh, W


def _depth_sort_overheads(R: int, gh: int, b: int, itemsize: int, W: int):
    """(overhead_const, overhead_per_ft) for the depth-sorted row-group
    pallas_call: double-buffered (R*gh, b, b) block groups + the
    (W, b, f_tile) f32 window output tile (double-counted, same safety
    rule as _rowgroup_overheads)."""
    return 2 * R * gh * b * b * itemsize, 2 * W * b * 4


def _pack_rowgroups_sorted(rows, cols, blocks, gh: int, R: int, W: int):
    """Depth-sorted row-group packing (see _depth_sort_policy).

    rows must cover every block-row. Within each window of W
    consecutive block-rows, rows are ordered by ascending block count
    (stable) and grouped R at a time, so a group's steps_g =
    max_lane ceil(count/gh) tracks each row's own need instead of the
    worst of R arbitrary neighbors. Output stays window-local: every
    lane carries its row's ORIGINAL position within the window
    (pos = row - window*W) and the kernel stores at that dynamic
    position inside the (W, b, f_tile) window tile — no global
    unpermute pass.

    Returns (win_ids (T,) int32, pos (T*R,) int32, slot_cols (T*G,)
    int32, blocks_padded (T*G, b, b), n_windows)."""
    assert W % R == 0, (W, R)
    nnzb, b, _ = blocks.shape
    order0 = np.argsort(rows, kind="stable")
    rows_s = np.asarray(rows)[order0]
    uniq, first = np.unique(rows_s, return_index=True)
    assert uniq.size and uniq[0] == 0 and uniq[-1] == uniq.size - 1, (
        "_pack_rowgroups_sorted requires a covering rows list"
    )
    counts = np.diff(np.append(first, rows_s.size))
    nbr = uniq.size
    n_win = -(-nbr // W)

    lane_rows = []  # (n_groups_tot, R) row ids, -1 = absent lane
    for w in range(n_win):
        lo, hi = w * W, min((w + 1) * W, nbr)
        ids = lo + np.argsort(counts[lo:hi], kind="stable")
        padn = (-ids.size) % R
        if padn:
            ids = np.concatenate([ids, np.full(padn, -1, np.int64)])
        lane_rows.append(ids.reshape(-1, R))
    lane_rows = np.concatenate(lane_rows)  # (n_groups, R)
    n_groups = lane_rows.shape[0]
    cnt_g = np.where(lane_rows >= 0, counts[np.maximum(lane_rows, 0)], 0)
    steps_per_group = np.maximum(
        (-(-cnt_g // gh)).max(axis=1), 1
    ).astype(np.int64)
    T = int(steps_per_group.sum())
    G = R * gh
    win_of_group = lane_rows.max(axis=1) // W
    pos_g = np.where(
        lane_rows >= 0, lane_rows - win_of_group[:, None] * W, 0
    ).astype(np.int32)
    step_base = np.concatenate([[0], np.cumsum(steps_per_group)[:-1]])

    grp_of_row = np.empty(nbr, np.int64)
    lane_of_row = np.empty(nbr, np.int64)
    gi, li = np.nonzero(lane_rows >= 0)
    grp_of_row[lane_rows[gi, li]] = gi
    lane_of_row[lane_rows[gi, li]] = li

    rank = np.arange(rows_s.size) - np.repeat(first, counts)
    g_of = grp_of_row[rows_s]
    dest_s = (
        (step_base[g_of] + rank // gh) * G
        + lane_of_row[rows_s] * gh
        + rank % gh
    )
    dest = np.empty(rows_s.size, np.int64)
    dest[order0] = dest_s
    blocks_pad = np.zeros((T * G, b, b), np.asarray(blocks).dtype)
    blocks_pad[dest] = np.asarray(blocks)
    cols_pad = np.full(T * G, -1, np.int64)
    cols_pad[dest] = np.asarray(cols)
    c2 = cols_pad.reshape(T, G)
    cols_filled = per_buffer_col_fill(c2, c2 >= 0, np.zeros_like(c2))
    win_ids = np.repeat(win_of_group, steps_per_group).astype(np.int32)
    pos = np.repeat(
        pos_g, steps_per_group, axis=0
    ).reshape(-1).astype(np.int32)
    return (win_ids, pos, cols_filled.reshape(-1).astype(np.int32),
            blocks_pad, n_win)


def _rowgroup_sorted_kernel(wins_ref, pos_ref, cols_ref, blocks_ref,
                            dense_ref, out_ref, *, gh, R, precision):
    """Depth-sorted row-group kernel: like _rowgroup_kernel, but the
    output tile spans a WINDOW of W block-rows ((W, b, f_tile), 3D so
    the dynamic store rides the untiled leading dim) and each lane
    accumulates into its row's original position within the window —
    the sort that collapses pad slots never leaves the kernel."""
    G = R * gh
    j = pl.program_id(1)
    prev = wins_ref[jnp.maximum(j - 1, 0)]

    @pl.when(jnp.logical_or(j == 0, wins_ref[j] != prev))
    def _zero():
        out_ref[:] = jnp.zeros_like(out_ref)

    def mxu_dot(lhs, rhs):
        if precision == "bf16x3":
            return _dot3(lhs, rhs)
        return jnp.dot(
            lhs, rhs, preferred_element_type=jnp.float32, precision=precision
        )

    for lane in range(R):
        acc = None
        for g in range(lane * gh, (lane + 1) * gh):
            d = mxu_dot(blocks_ref[g], dense_ref[cols_ref[j * G + g]])
            acc = d if acc is None else acc + d
        p = pos_ref[j * R + lane]
        out_ref[p] += acc


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_windows", "window", "n_rows", "f_tile", "gh", "R",
        "interpret", "precision_name",
    ),
)
def _pallas_spmm_rowgroup_sorted(
    win_ids, pos, slot_cols, blocks, dense, n_windows, window, n_rows,
    f_tile, gh, R, interpret=False, precision_name=None,
):
    """Depth-sorted resident row-group schedule; dense: (nbc, b,
    f_padded)."""
    n_slots, b, _ = blocks.shape
    G = R * gh
    n_steps = n_slots // G
    nbc, b2, f_padded = dense.shape
    assert b2 == b and f_padded % f_tile == 0
    grid = (f_padded // f_tile, n_steps)

    if precision_name == "high":
        precision = "bf16x3"
    elif precision_name is not None:
        precision = getattr(jax.lax.Precision, precision_name.upper())
    elif blocks.dtype == jnp.float32:
        precision = jax.lax.Precision.HIGHEST
    else:
        precision = jax.lax.Precision.DEFAULT

    n_f = f_padded // f_tile
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=[
            pl.BlockSpec((G, b, b), lambda f, j, w, p, c: (j, 0, 0)),
            pl.BlockSpec(
                (nbc, b, f_tile),
                lambda f, j, w, p, c: (0, 0, f),
                pipeline_mode=(
                    pl.Buffered(buffer_count=1) if not interpret else None
                ),
            ),
        ],
        out_specs=pl.BlockSpec(
            (window, b, f_tile), lambda f, j, w, p, c: (w[j], 0, f)
        ),
    )
    out = pl.pallas_call(
        functools.partial(
            _rowgroup_sorted_kernel, gh=gh, R=R, precision=precision
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_windows * window, b, f_padded), jnp.float32
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_slots * b * b * f_padded,
            bytes_accessed=int(
                blocks.size * blocks.dtype.itemsize * n_f
                + dense.size * dense.dtype.itemsize
                + n_windows * window * b * f_padded * 4
            ),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_RESIDENT_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(win_ids, pos, slot_cols, blocks, dense)
    return out.reshape(n_windows * window * b, f_padded)[:n_rows]


def route_pallas_spmm(
    step_rows, slot_cols, blocks, dense, n_block_rows, n_rows, f_tile,
    group=1, interpret=False, precision_name=None, row_group=0,
):
    """Gather/resident router on an already-packed layout + 2D local
    dense (K_local, F_local) — the dist stripe functions' entry
    (parallel/spmm.py). Shapes are static at trace time (shard_map /
    fori_loop bodies trace once), so the branch resolves at compile
    time per local geometry: resident when the (nbc, b, rft) slice fits
    the VMEM budget (per-shard K is n-fold smaller, so dist hits
    residency even more often than single-chip), else the flat gather
    kernel.

    row_group=R (R > 0) declares the layout was packed in the
    ROW-GROUP resident form (pack_buckets_pallas rowgroup=R: step_rows
    holds group ids, slots split into R lanes of `group`) — the plan
    builder only packs it after an F-independent VMEM fit check, so
    the resident f_tile must exist here.

    row_group=("sorted", R, gh, W) declares the DEPTH-SORTED layout
    (pack_buckets_pallas sorted_geom=...): step_rows carries
    [win_ids (T,) | lane positions (T*R,)] concatenated (so dist
    arities never changed), split back here."""
    b = blocks.shape[1]
    K, Fp = dense.shape
    if isinstance(row_group, tuple) and row_group and row_group[0] == "sorted":
        _, R, gh, W = row_group
        rft = _resident_f_tile(
            K // b, b, Fp, dense.dtype.itemsize,
            *_depth_sort_overheads(R, gh, b, dense.dtype.itemsize, W),
        )
        if rft is None:
            raise ValueError(
                "depth-sorted dist layout but no resident f_tile fits "
                f"(K={K} b={b} Fp={Fp} R={R} gh={gh} W={W}) — the plan "
                "builder's fit check and this route disagree (was "
                "SDB_RESIDENT_BUDGET_MB changed after plan build?)"
            )
        T = step_rows.shape[0] // (1 + R)
        win_ids = step_rows[:T]
        pos = step_rows[T:]
        n_win = -(-n_block_rows // W)
        return _pallas_spmm_rowgroup_sorted(
            win_ids, pos, slot_cols, blocks, dense.reshape(K // b, b, Fp),
            n_win, W, n_rows, rft, gh, R, interpret, precision_name,
        )
    if row_group:
        rft = _resident_f_tile(
            K // b, b, Fp, dense.dtype.itemsize,
            *_rowgroup_overheads(row_group, group, b, dense.dtype.itemsize),
        )
        if rft is None:
            raise ValueError(
                "row-group dist layout but no resident f_tile fits "
                f"(K={K} b={b} Fp={Fp} R={row_group} gh={group}) — the "
                "plan builder's fit check and this route disagree (was "
                "SDB_RESIDENT_BUDGET_MB changed after plan build?)"
            )
        n_groups = -(-n_block_rows // row_group)
        return _pallas_spmm_rowgroup(
            step_rows, slot_cols, blocks, dense.reshape(K // b, b, Fp),
            n_groups, n_rows, rft, group, row_group, interpret,
            precision_name,
        )
    rft = None
    # same auto policy as _pallas_apply: residency only pays for 2-byte
    # operands (measured, resident_probe_r4.jsonl)
    if K % b == 0 and dense.dtype.itemsize == 2 and precision_name is None:
        rft = _resident_f_tile(K // b, b, Fp, dense.dtype.itemsize)
    if rft is not None:
        return _pallas_spmm_resident(
            step_rows, slot_cols, blocks, dense.reshape(K // b, b, Fp),
            n_block_rows, n_rows, rft, group, interpret, precision_name,
        )
    return _pallas_spmm(
        step_rows, slot_cols, blocks, dense, n_block_rows, n_rows, f_tile,
        group, False, interpret, precision_name, 0,
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
    jax.jit,
    static_argnames=(
        "n_block_rows", "n_rows", "f_tile", "group", "fuse_dot", "interpret",
        "precision_name", "lookahead",
    ),
)
def _pallas_spmm(
    step_rows,
    slot_cols,
    blocks,
    dense,
    n_block_rows: int,
    n_rows: int,
    f_tile: int,
    group: int = 1,
    fuse_dot: bool = False,
    interpret: bool = False,
    precision_name: str = None,
    lookahead: int = 0,
):
    """step_rows: (n_steps,) block-row per grid step; slot_cols:
    (n_steps * group,) block-col per slot; blocks: (n_steps * group, b, b)
    group-padded flat blocks (zero blocks in pad slots).

    lookahead > 0: multi-buffer the gathered B tiles (pl.Buffered) so
    the pipeline issues DMAs up to lookahead-1 steps ahead. MEASURED
    NEGATIVE in this environment (benchmarks/lookahead_ab_r3.jsonl):
    the lowering rejects both use_lookahead ("not supported for XLA
    pipeline emitter lowering") and buffer_count > 2 ("Only single (1)
    and double (2) buffering are supported"). Kept as an opt-in for
    toolchains that lower deeper pipelines; on this one the default
    double buffer IS the supported maximum, which closes the floor
    proof: the bf16 kernel's measured 63-70% of bandwidth SoL cannot
    be improved through pipeline depth here."""
    n_slots, b, _ = blocks.shape
    n_steps = n_slots // group
    f_padded = dense.shape[1]
    assert f_padded % f_tile == 0
    grid = (f_padded // f_tile, n_steps)

    # use_lookahead=True is rejected by this environment's lowering
    # ("Lookahead is not supported for XLA pipeline emitter lowering",
    # benchmarks/lookahead_ab_r3.jsonl) — plain multi-buffering still
    # issues DMAs up to (buffer_count - 1) steps ahead, which is the
    # latency-hiding half of the idea.
    b_mode = (
        pl.Buffered(buffer_count=lookahead, use_lookahead=False)
        if lookahead and not interpret
        else None
    )

    def _b_spec(g):
        return pl.BlockSpec(
            (b, f_tile),
            lambda f, j, rows, cols, g=g: (cols[j * group + g], f),
            pipeline_mode=b_mode,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((group, b, b), lambda f, j, rows, cols: (j, 0, 0)),
            *[_b_spec(g) for g in range(group)],
        ],
        out_specs=pl.BlockSpec(
            (b, f_tile), lambda f, j, rows, cols: (rows[j], f)
        ),
    )
    flops = 2 * n_slots * b * b * f_padded
    bytes_accessed = (
        blocks.size * blocks.dtype.itemsize
        + n_slots * b * f_padded * dense.dtype.itemsize
        + n_block_rows * b * f_padded * 4
    )
    if precision_name == "high":
        # opt-in override: bf16x3 (3 MXU passes, ~f32-grade error) where
        # the dtype default would pick HIGHEST's 6 passes — the measured
        # f32 ceiling is compute-bound on those passes (ROUND2_NOTES:
        # 23.6 TF/s = 72% of HIGHEST's 33 TF/s effective peak). Mosaic
        # has no Precision.HIGH lowering, so the kernel decomposes the
        # operands itself (_dot3).
        precision = "bf16x3"
    elif precision_name is not None:
        precision = getattr(jax.lax.Precision, precision_name.upper())
    elif blocks.dtype == jnp.float32:
        precision = jax.lax.Precision.HIGHEST
    else:
        precision = jax.lax.Precision.DEFAULT
    out = pl.pallas_call(
        functools.partial(
            _kernel, precision=precision, group=group, fuse_dot=fuse_dot
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_block_rows * b, f_padded), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        # F tiles touch disjoint output columns (parallel); the step dim
        # revisits/accumulates output tiles (arbitrary = keep order)
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        interpret=interpret,
    )(step_rows, slot_cols, blocks, *([dense] * group))
    return out[:n_rows]


def per_buffer_col_fill(cols2d, real_mask, fallback=None):
    """Per-(step, buffer) pad-slot col fill, shared by _pack_groups and
    parallel/shard.pack_buckets_pallas (so the two packers cannot
    drift): a pad slot at (step j, buffer g) repeats buffer g's most
    recent REAL col — Mosaic only issues a BlockSpec buffer's B-tile
    DMA when its block index changes between consecutive grid steps, so
    the repeated index skips the copy entirely. What counts as "real"
    is the caller's mask (group pads for _pack_groups; any all-zero
    slot, including covering blocks, for pack_buckets_pallas). Leading
    pads (no earlier real col in the buffer) take `fallback` when
    given, else keep their col. cols2d: (T, G); real_mask: (T, G) bool."""
    step_idx = np.where(real_mask, np.arange(cols2d.shape[0])[:, None], -1)
    src = np.maximum.accumulate(step_idx, axis=0)
    filled = np.take_along_axis(cols2d, np.maximum(src, 0), axis=0)
    lead = cols2d if fallback is None else fallback
    return np.where(src >= 0, filled, lead)


def _pack_groups(rows, cols, blocks, group: int):
    """Group-pad a row-sorted flat block list: every block-row's blocks
    are padded to a multiple of `group` with zero blocks.

    Pad-slot col choice matters for bandwidth, not correctness (the pad
    block is zero): each group slot g owns its own BlockSpec pipeline
    buffer, and Mosaic only issues the B-tile DMA when that buffer's
    block index CHANGES between consecutive grid steps. So a pad slot
    repeats the SAME buffer's previous-step col — the copy is skipped
    entirely (7% of slots at G=4, 15% at G=8 on the headline shape
    are pads; the earlier row-last-col fill paid a full gather DMA for
    every one of them). Leading pads (before a buffer's first real
    block) fall back to the row's last real col.

    Returns (step_rows (n_steps,), slot_cols (n_steps*group,),
    blocks_padded (n_steps*group, b, b))."""
    nnzb, b, _ = blocks.shape
    uniq, first = np.unique(rows, return_index=True)  # rows sorted
    counts = np.diff(np.append(first, nnzb))
    steps_per_row = -(-counts // group)
    n_steps = int(steps_per_row.sum())
    slot_base = np.concatenate([[0], np.cumsum(steps_per_row * group)[:-1]])
    rank = np.arange(nnzb) - np.repeat(first, counts)
    dest = np.repeat(slot_base, counts) + rank

    n_slots = n_steps * group
    blocks_pad = np.zeros((n_slots, b, b), blocks.dtype)
    blocks_pad[dest] = blocks
    cols_pad = np.full(n_slots, -1, np.int64)
    cols_pad[dest] = cols
    # fallback fill: the row's last real block (flat forward fill —
    # every row has >= 1 block and pads follow reals within a row)
    ffill = np.maximum.accumulate(
        np.where(cols_pad >= 0, np.arange(n_slots), 0)
    )
    flat_fill = cols_pad[ffill]
    if group > 1:
        # per-buffer fill: pad at (step j, buffer g) repeats this
        # buffer's most recent real col -> Mosaic skips the DMA
        c2 = cols_pad.reshape(n_steps, group)
        cols_pad = per_buffer_col_fill(
            c2, c2 >= 0, flat_fill.reshape(n_steps, group)
        ).reshape(-1)
    else:
        cols_pad = flat_fill
    cols_pad = cols_pad.astype(np.int32)
    step_rows = np.repeat(uniq, steps_per_row).astype(np.int32)
    return step_rows, cols_pad, blocks_pad


CHUNK_NNZB = 65536  # scalar-prefetch SMEM ceiling guard (see plan docstring)


def _auto_group(nnzb: int, n_rows_with_blocks: int) -> int:
    """Blocks per grid step: amortize the fixed per-step grid cost when
    rows are block-dense; keep G small when rows are sparse (padding
    costs G/2 extra zero-block slots per row on average)."""
    avg = nnzb / max(1, n_rows_with_blocks)
    if avg < 4:
        return 1
    if avg < 8:
        return 2
    if avg < 16:
        return 4
    return 8


def _auto_group_pow2(nnzb: int, n_rows_with_blocks: int, cap: int = 32) -> int:
    """Group rule for the paths that LIKE deep groups — resident bf16
    and gather int8, both measured monotone-better up to G=32 at the
    headline avg ~20 blocks/row (resident bf16 6.05/5.83/5.61 ms and
    gather int8 3.47/3.31/3.20 ms at g8/16/32,
    benchmarks/resident_probe_r4.jsonl) while gather bf16 prefers G=8
    (7.01 vs 7.45/7.18). Smallest power of two >= the average row
    occupancy, capped: pad waste stays < 50% of a row's last step and
    the step count reaches ~1 per row as density allows."""
    avg = nnzb / max(1, n_rows_with_blocks)
    g = 1
    while g < avg and g < cap:
        g *= 2
    return g


def bsr_spmm_pallas_plan(
    bsr: BSR,
    dtype=None,
    f_tile: Optional[int] = None,
    interpret: Optional[bool] = None,
    grad: bool = True,
    chunk_nnzb: Optional[int] = None,
    group: Optional[int] = None,
    fuse_dot: bool = False,
    precision: Optional[str] = None,
    lookahead: int = 0,
    resident: Optional[bool] = None,
    depth_sort: Optional[bool] = None,
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

    precision: optional MXU pass-count override ("default" | "high" |
    "highest"). f32 inputs default to HIGHEST (6 passes — exact f32,
    the reference 1e-4 gate); "high" runs bf16x3 (3 passes, ~2x the
    compute ceiling) with near-f32 error — opt-in for f32 serving where
    the kernel is compute-bound (the measured dense-regime state at
    group >= 4).

    resident: None (auto) routes each apply shape to the resident-dense
    kernel (_pallas_spmm_resident) when the full (nbc, b, f_tile) dense
    slice fits the VMEM budget — eliminating per-slot gather DMAs (20x
    re-fetch at the headline shape). True forces it (raises if the
    slice cannot fit); False keeps the flat gather kernel. fuse_dot /
    lookahead are gather-kernel-only knobs and disable auto-residency.
    """
    from spmm_denseblock_tpu.ops.bsr_spmm_int8 import reject_int8_cast

    reject_int8_cast(dtype, "bsr_pallas (use bsr_int8_pallas)")
    if chunk_nnzb is None:
        chunk_nnzb = CHUNK_NNZB
    if bsr.nnzb > chunk_nnzb:
        return _chunked_plan(
            bsr, dtype=dtype, f_tile=f_tile, interpret=interpret,
            grad=grad, chunk_nnzb=chunk_nnzb, group=group, fuse_dot=fuse_dot,
            precision=precision, lookahead=lookahead, resident=resident,
            depth_sort=depth_sort,
        )
    if grad:
        fwd = bsr_spmm_pallas_plan(
            bsr, dtype=dtype, f_tile=f_tile, interpret=interpret,
            grad=False, group=group, fuse_dot=fuse_dot, precision=precision,
            lookahead=lookahead, resident=resident, depth_sort=depth_sort,
        )
        bwd = bsr_spmm_pallas_plan(
            bsr.transpose(),
            dtype=dtype,
            f_tile=f_tile,
            interpret=interpret,
            grad=False,
            group=group,
            fuse_dot=fuse_dot,
            precision=precision,
            lookahead=lookahead,
            resident=resident,
            depth_sort=depth_sort,
        )
        return grad_plan(fwd, bwd)

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    covered = _ensure_covering(bsr)
    b = covered.b
    n_rows, n_cols = bsr.shape
    k_needed = covered.n_block_cols * b

    rows_h = np.asarray(covered.block_rows[: covered.nnzb])
    cols_h = np.asarray(covered.block_cols[: covered.nnzb])
    blocks_h = np.asarray(covered.blocks[: covered.nnzb])
    # bf16 plans whose K fits residency at ft=128 (an F-independent,
    # overhead-aware check) will route the resident kernel, which likes
    # deep groups AND the row-group schedule; everything else keeps the
    # gather rule (G=8 cap). fuse_dot/lookahead are gather-only knobs.
    #
    # (R, gh) choice and rationale: _rowgroup_policy
    group_was_auto = group is None
    R, gh_check = _rowgroup_policy(2, group)
    ovh = _rowgroup_overheads(R, gh_check, b, 2)
    resident_likely = (
        resident is not False
        and not fuse_dot and not lookahead
        and dtype is not None and jnp.dtype(dtype).itemsize == 2
        and precision is None
        and f_tile is None
        and _resident_f_tile(covered.n_block_cols, b, 128, 2, *ovh)
        is not None
    )
    if group is None:
        if resident_likely:
            group = _auto_group_pow2(covered.nnzb, np.unique(rows_h).size)
        else:
            group = _auto_group(covered.nnzb, np.unique(rows_h).size)
    # depth_sort=None follows the env default (SDB_DEPTH_SORT,
    # DEFAULT ON since the chip A/B: bf16 5.451 -> 4.666 ms (+16.8%),
    # int8 3.638 -> 3.546 (+2.6%), depthsort_ab_r5.jsonl) — the
    # window-sorted row-group schedule collapses the 64.7% pad-slot
    # overhead (see _depth_sort_policy); resident regime only.
    if depth_sort is None:
        import os as _os

        # occupancy gate (sorted_grid_r5.jsonl): the sorted schedule
        # wins at >= ~2 real blocks per block-row (+8.8..+14.2% bf16)
        # and LOSES below it (-7..-12% — mostly-empty rows make the
        # covering zeros dominate and the window machinery pure cost).
        avg_real = bsr.nnzb / max(covered.n_block_rows, 1)
        depth_sort = (
            _os.environ.get("SDB_DEPTH_SORT", "1") == "1"
            and avg_real >= 2.0
        )
    # 4-byte tiers (f32 HIGHEST via dtype=None, bf16x3 via
    # precision="high") join the sorted-resident regime too — the r4
    # "f32/bf16x3 residency loses" negative FLIPPED once the sorted
    # pack cut the pad slots 64.7% -> 15.5% (kernel_probe_r5.jsonl:
    # bf16x3 gather 11.2 -> sorted-resident 10.29 ms (+9%), f32 15.04
    # -> 14.46 (+4%), identical error grades). Conservatively gated at
    # >= 8 real blocks/row (the probe's regime is ~20; the 4-pass block
    # re-stream at ft=128 punishes sparse rows harder than bf16's 2).
    wide_sorted_ok = (
        resident is not False
        and not fuse_dot and not lookahead
        and f_tile is None
        and (dtype is None or jnp.dtype(dtype).itemsize == 4)
        and precision in (None, "high")
        and depth_sort
        and bsr.nnzb / max(covered.n_block_rows, 1) >= 8.0
    )
    if wide_sorted_ok:
        ovh4 = _depth_sort_overheads(*_depth_sort_policy(4)[:2], b, 4,
                                     _depth_sort_policy(4)[2])
        wide_sorted_ok = (
            _resident_f_tile(covered.n_block_cols, b, 128, 4,
                             ovh4[0], ovh4[1]) is not None
        )
    rowgroup = None
    pos_h = None
    if (resident_likely or wide_sorted_ok) and depth_sort:
        Rs, ghs, W = _depth_sort_policy(
            2 if resident_likely else 4,
            None if group_was_auto else group,
        )
        win_ids_h, pos_h, slot_cols_h, blocks_pad_h, n_win = (
            _pack_rowgroups_sorted(rows_h, cols_h, blocks_h, ghs, Rs, W)
        )
        group = ghs
        step_rows_h = win_ids_h
        rowgroup = ("sorted", Rs, ghs, W, n_win)
    elif resident_likely:
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
    if dtype is not None:
        blocks_pad_h = blocks_pad_h.astype(dtype)
    arrays = (
        jnp.asarray(step_rows_h),
        jnp.asarray(slot_cols_h),
        jnp.asarray(blocks_pad_h),
    )
    if pos_h is not None:
        arrays = arrays + (jnp.asarray(pos_h),)
    dtype_key = None if dtype is None else jnp.dtype(dtype).name
    statics = (
        covered.n_block_rows, n_rows, n_cols, k_needed,
        f_tile, group, fuse_dot, interpret, dtype_key, precision, lookahead,
        resident, rowgroup,
    )
    return Plan(arrays, _pallas_apply, statics)


@functools.partial(jax.jit, static_argnames="statics")
def _pallas_apply(statics, arrays, dense):
    # One fused program per (statics, shapes): the eager pre-ops this
    # apply used to dispatch separately (pad, astype) each cost ~1.3 ms
    # of relay round-trip at the headline shape — the round-3 dist
    # probe found the shard_map-wrapped path (everything in one jit)
    # beating this plan by exactly that margin on the int8 tier
    # (benchmarks/int8_dist_anomaly_r3.jsonl). arrays stay runtime
    # parameters (jit ARGS, not closure constants — the ops/plan.py
    # HLO-constant rule).
    (n_block_rows, n_rows, n_cols, k_needed,
     f_tile, group, fuse_dot, interpret, dtype_key, precision,
     lookahead, resident, rowgroup) = statics
    step_rows, slot_cols, blocks_dev = arrays[:3]
    dense = jnp.asarray(dense)
    assert dense.shape[0] == n_cols, (dense.shape, n_cols)
    b = blocks_dev.shape[1]
    nbc = k_needed // b
    itemsize = jnp.dtype(dtype_key or dense.dtype).itemsize

    if rowgroup is not None and rowgroup[0] == "sorted":
        # depth-sorted row-group resident layout (VERDICT r4 #5):
        # arrays carry the per-lane window positions as a 4th leaf
        _, R, gh, W, n_win = rowgroup
        pos = arrays[3]
        f_padded = round_up(dense.shape[1], 128)
        rft = _resident_f_tile(
            nbc, b, f_padded, itemsize,
            *_depth_sort_overheads(R, gh, b, itemsize, W),
        )
        if rft is None:
            raise ValueError(
                "depth-sorted row-group plan but the dense slice no "
                "longer fits the VMEM budget (was SDB_RESIDENT_BUDGET_MB "
                "changed between plan build and apply?)"
            )
        pad_r = k_needed - dense.shape[0]
        pad_c = f_padded - dense.shape[1]
        if pad_r or pad_c:
            dense = jnp.pad(dense, ((0, pad_r), (0, pad_c)))
        if dtype_key is not None:
            dense = dense.astype(dtype_key)
        out = _pallas_spmm_rowgroup_sorted(
            step_rows, pos, slot_cols, blocks_dev,
            dense.reshape(nbc, b, f_padded),
            n_win, W, n_rows, rft, gh, R, interpret, precision,
        )
        return out[:, : out.shape[1] - pad_c] if pad_c else out

    if rowgroup is not None:
        # the plan was packed in the row-group layout (resident-only);
        # feasibility was established F-independently at build time
        # with the same overhead accounting
        R, n_groups = rowgroup
        f_padded = round_up(dense.shape[1], 128)
        rft = _resident_f_tile(
            nbc, b, f_padded, itemsize,
            *_rowgroup_overheads(R, group, b, itemsize),
        )
        if rft is None:
            raise ValueError(
                "row-group resident plan but the dense slice no longer "
                "fits the VMEM budget (was SDB_RESIDENT_BUDGET_MB "
                "changed between plan build and apply?)"
            )
        pad_r = k_needed - dense.shape[0]
        pad_c = f_padded - dense.shape[1]
        if pad_r or pad_c:
            dense = jnp.pad(dense, ((0, pad_r), (0, pad_c)))
        if dtype_key is not None:
            dense = dense.astype(dtype_key)
        out = _pallas_spmm_rowgroup(
            step_rows, slot_cols, blocks_dev,
            dense.reshape(nbc, b, f_padded),
            n_groups, n_rows, rft, group, R, interpret, precision,
        )
        return out[:, : out.shape[1] - pad_c] if pad_c else out

    # resident routing is a per-apply-shape decision (shapes are static
    # at trace time): largest f_tile whose (nbc, b, f_tile) slice fits
    # the VMEM budget, honoring an explicit f_tile if given.
    #
    # Auto (None) policy from the headline-shape A/B
    # (benchmarks/resident_probe_r4.jsonl): residency wins ONLY for
    # 2-byte operands (bf16: 7.01 -> 6.05/5.83/5.61 ms at g8/16/32 —
    # the gather path is bandwidth-bound there). f32-HIGHEST (0.90x)
    # and bf16x3 (0.88x) LOSE: their 4-byte slices force f_tile=128 =
    # 4 f-passes, and the 4x block-list re-read outweighs the gather
    # savings. int8 loses too (see bsr_spmm_pallas_int8). resident=True
    # still forces any dtype (and raises if nothing fits).
    if resident is True and (fuse_dot or lookahead):
        raise ValueError(
            "resident=True is incompatible with fuse_dot/lookahead "
            "(gather-kernel-only knobs)"
        )
    rft = None
    want_resident = (
        resident is True
        or (resident is None and itemsize == 2 and precision is None)
    )
    if want_resident and not fuse_dot and not lookahead:
        f_padded128 = round_up(dense.shape[1], 128)
        rft = _resident_f_tile(nbc, b, f_padded128, itemsize)
        if f_tile is not None:
            rft = f_tile if (
                rft is not None and f_padded128 % f_tile == 0
                and nbc * b * f_tile * itemsize <= _resident_budget()
            ) else None
    if resident is True and rft is None:
        raise ValueError(
            f"resident=True but no f_tile fits the VMEM budget: "
            f"nbc={nbc} b={b} itemsize={itemsize} "
            f"(slice at f_tile=128 is {nbc * b * 128 * itemsize} bytes, "
            f"budget {_resident_budget()})"
        )

    if rft is not None:
        f_padded = round_up(dense.shape[1], 128)
        ft = rft
    else:
        ft = f_tile or min(512, round_up(dense.shape[1], 128))
        f_padded = round_up(dense.shape[1], ft)
    pad_r = k_needed - dense.shape[0]
    pad_c = f_padded - dense.shape[1]
    if pad_r or pad_c:
        dense = jnp.pad(dense, ((0, pad_r), (0, pad_c)))
    if dtype_key is not None:
        dense = dense.astype(dtype_key)
    if rft is not None:
        out = _pallas_spmm_resident(
            step_rows,
            slot_cols,
            blocks_dev,
            dense.reshape(nbc, b, f_padded),
            n_block_rows,
            n_rows,
            ft,
            group,
            interpret,
            precision,
        )
    else:
        out = _pallas_spmm(
            step_rows,
            slot_cols,
            blocks_dev,
            dense,
            n_block_rows,
            n_rows,
            ft,
            group,
            fuse_dot,
            interpret,
            precision,
            lookahead,
        )
    return out[:, : out.shape[1] - pad_c] if pad_c else out


def bsr_spmm_pallas(bsr: BSR, dense, **kw) -> jnp.ndarray:
    return bsr_spmm_pallas_plan(bsr, **kw)(dense)


def _chunked_plan(bsr, dtype, f_tile, interpret, grad, chunk_nnzb, group=None,
                  fuse_dot=False, precision=None, lookahead=0, resident=None,
                  depth_sort=None):
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
                group=group, fuse_dot=fuse_dot, precision=precision,
                lookahead=lookahead, resident=resident,
                depth_sort=depth_sort,
            )
        )
    return sum_plan(plans)
