"""Relay-light resident-vs-gather A/B at the headline shape.

The first resident probe (r4_resident_probe.py) ships ~5 GB of packed
block lists host->device; during the round-4 relay-backpressure episode
that path collapsed to ~50 kB/s and the probe could not finish. This
version generates EVERYTHING on device (jax.random blocks + operand,
device scatter into the group-packed layout, device quantization) and
reads back only scalars: host->device traffic is ~100 kB of int32
layout indices per variant. The pattern is worth keeping — it is the
relay-robust way to benchmark synthetic shapes here.

A/B discipline: the gather kernel (the shipped flat kernel,
ops/bsr_spmm_pallas._pallas_spmm) is re-timed IN THE SAME PROCESS as
each resident variant, same device inputs, same square timing chain.
Correctness: resident output vs gather output on device (identical
slot order and MXU ops -> agreement should be ~exact), plus a scalar
magnitude sanity readback.

Headline shape: 2^17 square, b=128 grid 1024x1024, p=2e-2 (structure
from the same seeded generator as bench.py/random_bsr), F=512.
JSONL -> benchmarks/resident_probe_r4.jsonl (labels *_lite).
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/sdb_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from spmm_denseblock_tpu.bench.timing import time_repeats
from spmm_denseblock_tpu.ops.bsr_spmm_pallas import (
    _pack_groups,
    _pallas_spmm,
    _pallas_spmm_resident,
)
from spmm_denseblock_tpu.ops.bsr_spmm_pallas_int8 import (
    _pallas_int8_spmm,
    _pallas_int8_spmm_resident,
)

OUT = "benchmarks/resident_probe_r4.jsonl"


def headline_structure(nb=1024, b=128, p=2e-2, seed=1234):
    """Block (rows, cols) with the same generator discipline as
    formats/bsr.random_bsr (seeded mt19937 Bernoulli over the block
    grid) — values are NOT materialized host-side."""
    rng = np.random.default_rng(seed)
    mask = rng.random((nb, nb)) < p
    # kernel contract: every block-row owns >= 1 slot (covering)
    empty = ~mask.any(axis=1)
    mask[empty, 0] = True
    rows, cols = np.nonzero(mask)
    return rows.astype(np.int32), cols.astype(np.int32), nb, b


def pack_indices(rows, cols, group):
    """_pack_groups on a value-free dummy: returns (step_rows,
    slot_cols, dest) where dest[i] is block i's slot in the padded
    list. Reuses the production packer (1-byte dummy blocks) so the
    layout under test IS the shipped layout."""
    dummy = np.zeros((rows.size, 1, 1), np.int8)
    step_rows, slot_cols, dummy_pad = _pack_groups(rows, cols, dummy, group)
    # recover dest exactly as _pack_groups computes it
    nnzb = rows.size
    uniq, first = np.unique(rows, return_index=True)
    counts = np.diff(np.append(first, nnzb))
    steps_per_row = -(-counts // group)
    slot_base = np.concatenate([[0], np.cumsum(steps_per_row * group)[:-1]])
    rank = np.arange(nnzb) - np.repeat(first, counts)
    dest = (np.repeat(slot_base, counts) + rank).astype(np.int32)
    return step_rows, slot_cols, dest


def pack_rowgroups(rows, cols, group_half, R=2):
    """Row-GROUP packing: R adjacent covered block-rows share each grid
    step; slots [i*Gh, (i+1)*Gh) belong to the group's i-th row (static
    split — no in-kernel selects). Steps per group = max over its rows
    of ceil(count/Gh), so total steps shrink ~R-fold vs one-row-per-step
    at the same per-row group. Returns (step_groups (T,), slot_cols
    (T*G,), dest (nnzb,), n_groups) with G = R*Gh and per-buffer pad
    col fill (DMA-skip discipline of _pack_groups)."""
    from spmm_denseblock_tpu.ops.bsr_spmm_pallas import per_buffer_col_fill

    order = np.argsort(rows, kind="stable")
    rows_s = rows[order]
    uniq, first = np.unique(rows_s, return_index=True)
    counts = np.diff(np.append(first, rows_s.size))
    n_rows_cov = uniq.size
    pad_rows = (-n_rows_cov) % R  # phantom empty rows to fill the last group
    counts_p = np.append(counts, np.zeros(pad_rows, counts.dtype))
    groups = (n_rows_cov + pad_rows) // R
    per_row_steps = -(-counts_p // group_half)
    steps_per_group = np.maximum(
        per_row_steps.reshape(groups, R).max(axis=1), 1
    )
    T = int(steps_per_group.sum())
    G = R * group_half
    step_base = np.concatenate([[0], np.cumsum(steps_per_group)[:-1]])
    # dest for block of covered-rank k row: group k//R, lane k%R;
    # slot = (step_base[grp] + rank//Gh)*G + lane*Gh + rank%Gh
    rank = np.arange(rows_s.size) - np.repeat(first, counts)
    krank = np.searchsorted(uniq, rows_s)
    grp = krank // R
    lane = krank % R
    dest_s = ((step_base[grp] + rank // group_half) * G
              + lane * group_half + rank % group_half)
    dest = np.empty(rows.size, np.int64)
    dest[order] = dest_s
    cols_pad = np.full(T * G, -1, np.int64)
    cols_pad[dest] = cols
    c2 = cols_pad.reshape(T, G)
    filled = per_buffer_col_fill(c2, c2 >= 0, np.zeros_like(c2))
    step_groups = np.repeat(np.arange(groups), steps_per_group).astype(np.int32)
    return (step_groups, filled.reshape(-1).astype(np.int32),
            dest.astype(np.int32), groups)


def _rowgroup_kernel(groups_ref, cols_ref, blocks_ref, dense_ref, out_ref,
                     *, group_half, R, precision, scales_ref=None,
                     cs_ref=None):
    b = blocks_ref.shape[1]
    G = R * group_half
    j = pl.program_id(1)
    prev = groups_ref[jnp.maximum(j - 1, 0)]

    @pl.when(jnp.logical_or(j == 0, groups_ref[j] != prev))
    def _zero():
        out_ref[:] = jnp.zeros_like(out_ref)

    def mxu_dot(lhs, rhs):
        if lhs.dtype == jnp.int8:
            return jnp.dot(
                lhs, rhs, preferred_element_type=jnp.int32
            ).astype(jnp.float32)
        return jnp.dot(
            lhs, rhs, preferred_element_type=jnp.float32, precision=precision
        )

    for lane in range(R):
        acc = None
        for g in range(lane * group_half, (lane + 1) * group_half):
            d = mxu_dot(blocks_ref[g], dense_ref[cols_ref[j * G + g]])
            if scales_ref is not None:
                d = scales_ref[j * G + g] * d
            acc = d if acc is None else acc + d
        if cs_ref is not None:
            acc = acc * cs_ref[0, :]
        out_ref[lane * b:(lane + 1) * b, :] += acc


@functools.partial(
    jax.jit,
    static_argnames=("n_groups", "n_rows", "f_tile", "group_half", "R",
                     "interpret"),
)
def _rowgroup_spmm(step_groups, slot_cols, blocks, dense3, n_groups, n_rows,
                   f_tile, group_half, R=2, interpret=False):
    n_slots, b, _ = blocks.shape
    G = R * group_half
    n_steps = n_slots // G
    nbc, b2, f_padded = dense3.shape
    grid = (f_padded // f_tile, n_steps)
    precision = (
        jax.lax.Precision.HIGHEST if blocks.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
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
            (R * b, f_tile), lambda f, j, p, c: (p[j], f)
        ),
    )
    return pl.pallas_call(
        functools.partial(
            _rowgroup_kernel, group_half=group_half, R=R,
            precision=precision,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_groups * R * b, f_padded),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=112 * 1024 * 1024,
        ),
        interpret=interpret,
    )(step_groups, slot_cols, blocks, dense3)[:n_rows]


def _rowgroup_int8_kernel(groups_ref, cols_ref, scales_ref, blocks_ref,
                          cs_ref, dense_ref, out_ref, *, group_half, R):
    _rowgroup_kernel(
        groups_ref, cols_ref, blocks_ref, dense_ref, out_ref,
        group_half=group_half, R=R, precision=None,
        scales_ref=scales_ref, cs_ref=cs_ref,
    )


@functools.partial(
    jax.jit,
    static_argnames=("n_groups", "n_rows", "f_tile", "group_half", "R",
                     "interpret"),
)
def _rowgroup_int8_spmm(step_groups, slot_cols, scales, qblocks, qdense3,
                        col_scale, n_groups, n_rows, f_tile, group_half,
                        R=2, interpret=False):
    n_slots, b, _ = qblocks.shape
    G = R * group_half
    n_steps = n_slots // G
    nbc, b2, f_padded = qdense3.shape
    grid = (f_padded // f_tile, n_steps)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=[
            pl.BlockSpec((G, b, b), lambda f, j, p, c, sc_: (j, 0, 0)),
            pl.BlockSpec((1, f_tile), lambda f, j, p, c, sc_: (0, f)),
            pl.BlockSpec(
                (nbc, b, f_tile),
                lambda f, j, p, c, sc_: (0, 0, f),
                pipeline_mode=(
                    pl.Buffered(buffer_count=1) if not interpret else None
                ),
            ),
        ],
        out_specs=pl.BlockSpec(
            (R * b, f_tile), lambda f, j, p, c, sc_: (p[j], f)
        ),
    )

    def kern(p_ref, c_ref, sc_ref, blocks_ref, cs_ref, dense_ref, out_ref):
        _rowgroup_kernel(
            p_ref, c_ref, blocks_ref, dense_ref, out_ref,
            group_half=group_half, R=R, precision=None,
            scales_ref=sc_ref, cs_ref=cs_ref,
        )

    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_groups * R * b, f_padded),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=112 * 1024 * 1024,
        ),
        interpret=interpret,
    )(step_groups, slot_cols, scales, qblocks,
      col_scale.reshape(1, -1).astype(jnp.float32), qdense3)
    return out[:n_rows]


def _scratch_kernel(rows_ref, cols_ref, blocks_ref, dense_hbm, out_ref,
                    scratch, sem, *, group, ft, precision):
    """Scratch-resident variant: the dense f-slice is DMA'd ONCE per f
    pass into persistent VMEM scratch (grid steps share scratch on
    TPU), so the BlockSpec pipeline contains only the double-buffered
    block groups — testing whether the single-buffered dense operand in
    _pallas_spmm_resident is what serializes blocks-DMA against MXU
    (measured per-step 2.74 us ~= MXU 1.36 + blocks-DMA 1.28 ADDED)."""
    f = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _load():
        cp = pltpu.make_async_copy(
            dense_hbm.at[:, :, pl.ds(f * ft, ft)], scratch, sem
        )
        cp.start()
        cp.wait()

    prev = rows_ref[jnp.maximum(j - 1, 0)]

    @pl.when(jnp.logical_or(j == 0, rows_ref[j] != prev))
    def _zero():
        out_ref[:] = jnp.zeros_like(out_ref)

    def mxu_dot(lhs, rhs):
        if lhs.dtype == jnp.int8:
            return jnp.dot(
                lhs, rhs, preferred_element_type=jnp.int32
            ).astype(jnp.float32)
        return jnp.dot(
            lhs, rhs, preferred_element_type=jnp.float32, precision=precision
        )

    acc = mxu_dot(blocks_ref[0], scratch[cols_ref[j * group]])
    for g in range(1, group):
        acc += mxu_dot(blocks_ref[g], scratch[cols_ref[j * group + g]])
    out_ref[:] += acc


@functools.partial(
    jax.jit,
    static_argnames=("n_block_rows", "n_rows", "f_tile", "group", "interpret"),
)
def _scratch_spmm(step_rows, slot_cols, blocks, dense3, n_block_rows,
                  n_rows, f_tile, group, interpret=False):
    n_slots, b, _ = blocks.shape
    n_steps = n_slots // group
    nbc, b2, f_padded = dense3.shape
    grid = (f_padded // f_tile, n_steps)
    precision = (
        jax.lax.Precision.HIGHEST if blocks.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((group, b, b), lambda f, j, r, c: (j, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),  # dense stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (b, f_tile), lambda f, j, r, c: (r[j], f)
        ),
        scratch_shapes=[
            pltpu.VMEM((nbc, b, f_tile), dense3.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _scratch_kernel, group=group, ft=f_tile, precision=precision
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_block_rows * b, f_padded),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=112 * 1024 * 1024,
        ),
        interpret=interpret,
    )(step_rows, slot_cols, blocks, dense3)[:n_rows]


def capacity_ladder():
    """How big can the resident dense slice get? bf16 (b=128, ft=256)
    nbc ladder with a minimal block population; each rung compiles +
    runs once. Failure mode expected: Mosaic VMEM-exceeded at compile.
    Calibrates ops.bsr_spmm_pallas.RESIDENT_SLICE_BYTES (80 MB as
    shipped)."""
    b, ft, group = 128, 256, 8
    key = jax.random.PRNGKey(0)
    for slice_mb in (64, 72, 80, 88, 96, 104):
        nbc = slice_mb * 2**20 // (b * ft * 2)
        K = nbc * b
        rows = np.zeros((group,), np.int32)
        cols = np.arange(group, dtype=np.int32) % nbc
        sr = jnp.asarray(rows[:1])
        sc = jnp.asarray(cols)
        try:
            t0 = time.time()
            blocks = jax.random.normal(key, (group, b, b), jnp.bfloat16)
            dense = jax.random.normal(key, (nbc, b, ft), jnp.bfloat16)
            out = _pallas_spmm_resident(
                sr, sc, blocks, dense, 1, b, ft, group, False, None,
            )
            mag = float(jnp.max(jnp.abs(out)))
            rec = dict(kind="resident_capacity", slice_mb=slice_mb,
                       nbc=int(nbc), ok=True, wall_s=round(time.time() - t0, 1),
                       out_absmax=mag, ts=time.time())
        except Exception as e:
            rec = dict(kind="resident_capacity", slice_mb=slice_mb,
                       nbc=int(nbc), ok=False, error=str(e)[:300],
                       ts=time.time())
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec)[:200], flush=True)
        if not rec["ok"]:
            break


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="int8_g8,int8_g16,bf16_g8,bf16_g16,"
                    "bf16x3_g8,f32_g8")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shape, interpret off-TPU")
    ap.add_argument("--capacity", action="store_true",
                    help="VMEM slice-size ladder: find where the resident "
                         "compile/exec stops fitting (calibrates "
                         "RESIDENT_SLICE_BYTES)")
    args = ap.parse_args()

    if args.capacity:
        capacity_ladder()
        return
    run_ab(args.variants, args.repeats, smoke=args.smoke)


def run_ab(variants: str, repeats: int = 3, smoke: bool = False):
    """The A/B body, callable in-process (see r4_chip_session.py: the
    chip lease is per-process, so chained chip work must share one)."""

    interp = jax.default_backend() != "tpu"
    if smoke:
        rows, cols, nb, b = headline_structure(nb=8, b=32, p=0.2)
    else:
        rows, cols, nb, b = headline_structure()
    nnzb = rows.size
    F = 128 if smoke else 512
    K = nb * b
    flops = 2.0 * nnzb * b * b * F
    print(f"nnzb={nnzb}", flush=True)

    key = jax.random.PRNGKey(1234)
    kb, kd = jax.random.split(key)

    def record(**kw):
        kw["ts"] = time.time()
        if not smoke:  # smoke runs don't pollute the artifact
            with open(OUT, "a") as f:
                f.write(json.dumps(kw) + "\n")
        print(json.dumps(kw), flush=True)

    @jax.jit
    def gen_dense():
        return jax.random.normal(kd, (K, F), jnp.float32)

    dense = gen_dense()
    float(jnp.sum(dense))  # materialize

    for variant in variants.split(","):
        parts = variant.split("_")
        dt_name, g_name = parts[0], parts[1]
        scratch_mode = len(parts) > 2 and parts[2] == "s"
        pair_mode = len(parts) > 2 and parts[2].startswith("p")
        R = int(parts[2][1:]) if pair_mode and len(parts[2]) > 1 else 2
        group = int(g_name[1:])
        t_plan0 = time.time()
        step_rows_h, slot_cols_h, dest_h = pack_indices(rows, cols, group)
        n_slots = slot_cols_h.size
        sr = jnp.asarray(step_rows_h)
        sc = jnp.asarray(slot_cols_h)
        # slot->block map computed HOST-side (a device .at[dest].set
        # scatter of ~21k (b, b) slices lowered pathologically slowly on
        # the TPU); block VALUES are generated per BLOCK ID and placed
        # with a take, so alternative packings of the same structure see
        # the same matrix (bitwise A/B across layouts).
        def slot_map(dest, ns):
            s2b = np.full(ns, nnzb, np.int32)  # pads -> zero block
            s2b[dest] = np.arange(nnzb, dtype=np.int32)
            return jnp.asarray(s2b)

        s2b = slot_map(dest_h, n_slots)
        if pair_mode:
            (pair_steps_h, pair_cols_h, pair_dest_h,
             n_pairs) = pack_rowgroups(rows, cols, group, R)
            sp_pair = jnp.asarray(pair_steps_h)
            sc_pair = jnp.asarray(pair_cols_h)
            s2b_pair = slot_map(pair_dest_h, pair_cols_h.size)
            # NOTE: scales are per-SLOT; the pair layout MUST use its
            # own (r4 bug: int8_g32_p4's "rel 24 garbage" was this
            # probe passing the single-row layout's scales to the
            # row-group kernel — int8_rowgroup_diag_r4.jsonl shows the
            # kernel itself exact at every (R, gh) tried)
        plan_s = time.time() - t_plan0

        blocks_dt = {"int8": jnp.float32, "bf16": jnp.bfloat16,
                     "bf16x3": jnp.float32, "f32": jnp.float32}[dt_name]

        @jax.jit
        def build_blocks(s2b):
            flat = jax.random.normal(kb, (nnzb + 1, b, b), jnp.float32)
            flat = flat.at[nnzb].set(0.0)
            pad = jnp.take(flat, s2b, axis=0)
            if dt_name == "int8":
                absmax = jnp.max(jnp.abs(pad), axis=(1, 2))
                scales = jnp.where(absmax > 0, absmax / 127.0, 1.0)
                q = jnp.clip(
                    jnp.round(pad / scales[:, None, None]), -127, 127
                ).astype(jnp.int8)
                return q, scales.astype(jnp.float32)
            return pad.astype(blocks_dt), jnp.ones((pad.shape[0],), jnp.float32)

        blocks_dev, scales_dev = build_blocks(s2b)
        float(jnp.sum(scales_dev))
        if pair_mode:
            blocks_pair, scales_pair = build_blocks(s2b_pair)
            float(jnp.sum(jnp.abs(blocks_pair[:1]).astype(jnp.float32)))

        precision_name = "high" if dt_name == "bf16x3" else None
        ft_resident = {"int8": 512, "bf16": 256, "bf16x3": 128,
                       "f32": 128}[dt_name]
        ft_gather = 512
        if smoke:
            ft_resident = ft_gather = F

        # CRITICAL: the device arrays (sr/sc/blocks/scales) must be jit
        # ARGUMENTS bound via functools.partial, NOT closure captures —
        # a closed-over concrete array becomes an HLO CONSTANT and the
        # whole 350-680 MB block list streams through the relay inside
        # the compile payload (this, not relay weather, was every
        # "throughput collapse" this session — the ops/plan.py
        # HLO-constant rule applied to benchmarks).
        if dt_name == "int8":
            ones_cs = jnp.ones((F,), jnp.float32)

            @jax.jit
            def _gat(sr_, sc_, blocks_, scales_, x):
                q = jnp.clip(jnp.round(x), -127, 127).astype(jnp.int8)
                return _pallas_int8_spmm(
                    sr_, sc_, blocks_, scales_, q, ones_cs,
                    nb, K, ft_gather, group, interp,
                )

            if pair_mode:
                @jax.jit
                def _res(sp_, sc_, blocks_, scales_, x):
                    q = jnp.clip(jnp.round(x), -127, 127).astype(jnp.int8)
                    return _rowgroup_int8_spmm(
                        sp_, sc_, scales_, blocks_, q.reshape(nb, b, F),
                        ones_cs, n_pairs, K, ft_resident, group, R, interp,
                    )
            else:
                @jax.jit
                def _res(sr_, sc_, blocks_, scales_, x):
                    q = jnp.clip(jnp.round(x), -127, 127).astype(jnp.int8)
                    return _pallas_int8_spmm_resident(
                        sr_, sc_, scales_, blocks_,
                        q.reshape(nb, b, F), ones_cs,
                        nb, K, ft_resident, group, interp,
                    )

        else:
            cast = {"bf16": jnp.bfloat16}.get(dt_name)

            @jax.jit
            def _gat(sr_, sc_, blocks_, scales_, x):
                xc = x.astype(cast) if cast else x
                return _pallas_spmm(
                    sr_, sc_, blocks_, xc, nb, K, ft_gather, group,
                    False, interp, precision_name, 0,
                )

            if pair_mode:
                @jax.jit
                def _res(sp_, sc_, blocks_, scales_, x):
                    xc = x.astype(cast) if cast else x
                    return _rowgroup_spmm(
                        sp_, sc_, blocks_, xc.reshape(nb, b, F),
                        n_pairs, K, ft_resident, group, R, interp,
                    )
            elif scratch_mode:
                @jax.jit
                def _res(sr_, sc_, blocks_, scales_, x):
                    xc = x.astype(cast) if cast else x
                    return _scratch_spmm(
                        sr_, sc_, blocks_, xc.reshape(nb, b, F), nb, K,
                        ft_resident, group, interp,
                    )
            else:
                @jax.jit
                def _res(sr_, sc_, blocks_, scales_, x):
                    xc = x.astype(cast) if cast else x
                    return _pallas_spmm_resident(
                        sr_, sc_, blocks_, xc.reshape(nb, b, F), nb, K,
                        ft_resident, group, interp, precision_name,
                    )

        apply_gather = functools.partial(_gat, sr, sc, blocks_dev, scales_dev)
        if pair_mode:
            apply_resident = functools.partial(
                _res, sp_pair, sc_pair, blocks_pair, scales_pair
            )
        else:
            apply_resident = functools.partial(
                _res, sr, sc, blocks_dev, scales_dev
            )

        # bandwidth SoL models (v5e HBM 819 GB/s). gather: blocks once +
        # per-slot (b, F) tiles + out. resident: blocks x f-passes +
        # dense once + out.
        HBM = 819e9
        itemsize = {"int8": 1, "bf16": 2, "bf16x3": 4, "f32": 4}[dt_name]
        out_bytes = nb * b * F * 4
        gather_bytes = (n_slots * b * b * itemsize
                        + n_slots * b * F * itemsize + out_bytes)
        n_f = F // ft_resident
        resident_bytes = (n_slots * b * b * itemsize * n_f
                          + K * F * itemsize + out_bytes)
        try:
            out_g = apply_gather(dense)
            out_r = apply_resident(dense)
            mag = float(jnp.max(jnp.abs(out_g)))
            diff = float(jnp.max(jnp.abs(out_r - out_g))) / max(1e-30, mag)
            t_g = time_repeats(apply_gather, dense, repeats=repeats,
                               iters=10, square=True)
            t_r = time_repeats(apply_resident, dense, repeats=repeats,
                               iters=10, square=True)
            record(
                gather_sol_ms=gather_bytes / HBM * 1e3,
                gather_sol_frac=(gather_bytes / HBM) / t_g["secs"],
                resident_sol_ms=resident_bytes / HBM * 1e3,
                resident_sol_frac=(resident_bytes / HBM) / t_r["secs"],
                kind="resident_lite", variant=variant, nnzb=int(nnzb),
                group=group, f_tile_resident=ft_resident,
                gather_ms=t_g["secs"] * 1e3,
                gather_ms_spread=[t_g["secs_min"] * 1e3, t_g["secs_max"] * 1e3],
                resident_ms=t_r["secs"] * 1e3,
                resident_ms_spread=[t_r["secs_min"] * 1e3,
                                    t_r["secs_max"] * 1e3],
                gather_tflops=flops / t_g["secs"] / 1e12,
                resident_tflops=flops / t_r["secs"] / 1e12,
                speedup=t_g["secs"] / t_r["secs"],
                resident_vs_gather_rel=diff, out_absmax=mag,
                plan_s=round(plan_s, 3), repeats=repeats,
            )
        except Exception as e:
            record(kind="resident_lite_fail", variant=variant,
                   error=str(e)[:400])


if __name__ == "__main__":
    main()
