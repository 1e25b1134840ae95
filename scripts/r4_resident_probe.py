"""Resident-dense BSR kernel probe (round 4, session 2).

The r4 bf16-gap apportionment (benchmarks/bf16_gap_r4.jsonl) pinned
1.99 ms of the 6.95 ms bf16 headline on gather VOLUME: each of the
20,668 slots DMAs its own (b, f_tile) tile of the dense operand, so
every unique block-col tile is fetched ~20x (2.71 GB moved for 0.134 GB
of unique bytes). This probe tests the structural fix: make the WHOLE
dense f-slice a single VMEM-resident operand (single-buffered, block
index constant across steps -> one DMA per f pass) and have the kernel
dynamically slice it per slot (dense_ref[pl.ds(col*b, b), :]).

What changes per dtype at the headline shape (nb=1024, b=128, F=512,
p=2e-2, nnzb=20,668):

  tier   f_tile  dense slice  f passes  blocks re-read  new HBM total
  int8     512     67 MB int8    1        0.34 GB x1      0.67 GB (SoL 0.82 ms vs measured 4.6)
  bf16     256     67 MB bf16    2        0.68 GB x2      1.76 GB (SoL 2.15 ms vs measured 6.95)
  f32      128     67 MB f32     4        1.35 GB x4      5.9  GB (MXU-bound at HIGHEST anyway)

The trade: multiple f passes re-read the block list (the dense slice at
f_tile=512 only fits VMEM for int8), but that is far cheaper than the
20x gather amplification. Whether VMEM actually holds a 67 MB operand
on this v5e (+ out tile + double-buffered blocks) is exactly what the
probe measures first — compile failure is a recorded negative.

Secondary question: with no per-slot gather DMAs, pad slots cost only a
zero MXU dot, so G can rise to cut the per-step scalar residual
(~0.78 us/step at G=8, 2584 steps = the bf16 non-gather floor's
unexplained 2.0 ms). Sweep G in {8, 16, 32}.

Method: time_repeats square chain (the canonical bench.py discipline),
correctness vs the XLA batched-matmul oracle on the same input,
per-dtype tolerance fields. JSONL -> benchmarks/resident_probe_r4.jsonl.
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/sdb_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spmm_denseblock_tpu.convert.pack import round_up
from spmm_denseblock_tpu.ops.bsr_spmm_pallas import (
    _auto_group,
    _dot3,
    _ensure_covering,
    _pack_groups,
)

OUT = "benchmarks/resident_probe_r4.jsonl"


def _resident_kernel(rows_ref, cols_ref, blocks_ref, dense_ref, out_ref,
                     *, precision, group, b):
    j = pl.program_id(1)
    prev_row = rows_ref[jnp.maximum(j - 1, 0)]

    @pl.when(jnp.logical_or(j == 0, rows_ref[j] != prev_row))
    def _zero():
        out_ref[:] = jnp.zeros_like(out_ref)

    def mxu_dot(lhs, rhs):
        if precision == "bf16x3":
            return _dot3(lhs, rhs)
        if lhs.dtype == jnp.int8:
            return jnp.dot(
                lhs, rhs, preferred_element_type=jnp.int32
            ).astype(jnp.float32)
        return jnp.dot(
            lhs, rhs, preferred_element_type=jnp.float32, precision=precision
        )

    # dense_ref is (nbc, b, f_tile): dynamic index on the UNTILED leading
    # dim. The 2D (K, f_tile) formulation with pl.ds on the tiled sublane
    # dim compiles pathologically (28 min then remote-compile Broken pipe
    # at K=131072); this one is flat 0.5 s at every K measured
    # (benchmarks/resident_compile_ladder_r4.jsonl).
    acc = mxu_dot(blocks_ref[0], dense_ref[cols_ref[j * group]])
    for g in range(1, group):
        acc += mxu_dot(blocks_ref[g], dense_ref[cols_ref[j * group + g]])
    out_ref[:] += acc


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_block_rows", "n_rows", "f_tile", "group", "interpret",
        "precision_name",
    ),
)
def _resident_spmm(step_rows, slot_cols, blocks, dense, n_block_rows, n_rows,
                   f_tile, group=8, interpret=False, precision_name=None):
    n_slots, b, _ = blocks.shape
    n_steps = n_slots // group
    nbc, b2, f_padded = dense.shape
    assert b2 == b and f_padded % f_tile == 0
    grid = (f_padded // f_tile, n_steps)

    if precision_name == "bf16x3":
        precision = "bf16x3"
    elif blocks.dtype == jnp.float32:
        precision = jax.lax.Precision.HIGHEST
    else:
        precision = jax.lax.Precision.DEFAULT

    dense_spec = pl.BlockSpec(
        (nbc, b, f_tile),
        lambda f, j, rows, cols: (0, 0, f),
        pipeline_mode=pl.Buffered(buffer_count=1) if not interpret else None,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((group, b, b), lambda f, j, rows, cols: (j, 0, 0)),
            dense_spec,
        ],
        out_specs=pl.BlockSpec(
            (b, f_tile), lambda f, j, rows, cols: (rows[j], f)
        ),
    )
    out_dtype = jnp.float32
    n_f = f_padded // f_tile
    bytes_accessed = int(
        blocks.size * blocks.dtype.itemsize * n_f
        + dense.size * dense.dtype.itemsize
        + n_block_rows * b * f_padded * 4
    )
    return pl.pallas_call(
        functools.partial(
            _resident_kernel, precision=precision, group=group, b=b
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_block_rows * b, f_padded), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_slots * b * b * f_padded,
            bytes_accessed=bytes_accessed,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=112 * 1024 * 1024,
        ),
        interpret=interpret,
    )(step_rows, slot_cols, blocks, dense)[:n_rows]


def build_layout(bsr, group, dtype=None):
    covered = _ensure_covering(bsr)
    rows_h = np.asarray(covered.block_rows[: covered.nnzb])
    cols_h = np.asarray(covered.block_cols[: covered.nnzb])
    blocks_h = np.asarray(covered.blocks[: covered.nnzb])
    if group is None:
        group = _auto_group(covered.nnzb, np.unique(rows_h).size)
    sr, sc, bp = _pack_groups(rows_h, cols_h, blocks_h, group)
    if dtype is not None:
        bp = bp.astype(dtype)
    return (jnp.asarray(sr), jnp.asarray(sc), jnp.asarray(bp),
            covered.n_block_rows, covered.n_block_cols, group)


def _numpy_oracle(bsr, dense):
    out = np.zeros((bsr.shape[0], dense.shape[1]), np.float64)
    b = bsr.b
    for r, c, blk in zip(
        np.asarray(bsr.block_rows[: bsr.nnzb]),
        np.asarray(bsr.block_cols[: bsr.nnzb]),
        np.asarray(bsr.blocks[: bsr.nnzb]),
    ):
        seg = dense[c * b : (c + 1) * b]
        out[r * b : (r + 1) * b, : seg.shape[1]] += blk[:, : seg.shape[0]].astype(
            np.float64
        ) @ seg.astype(np.float64)
    return out[: bsr.shape[0]].astype(np.float32)


def quick_check(interpret=True):
    """Tiny-shape correctness in interpret mode (runs on CPU)."""
    from spmm_denseblock_tpu.formats.bsr import random_bsr

    bsr = random_bsr(0.2, 8, 8, block_size=32, seed=7)
    rng = np.random.default_rng(0)
    dense = rng.standard_normal((bsr.shape[1], 96)).astype(np.float32)
    want = _numpy_oracle(bsr, dense)
    for group in (1, 2, 4):
        sr, sc, bp, nbr, nbc, g = build_layout(bsr, group)
        ft = 128
        fp = round_up(dense.shape[1], ft)
        kp = nbc * 32
        dpad = np.zeros((kp, fp), np.float32)
        dpad[: dense.shape[0], : dense.shape[1]] = dense
        got = np.asarray(
            _resident_spmm(sr, sc, bp, jnp.asarray(dpad.reshape(nbc, 32, fp)),
                           nbr, bsr.shape[0], ft, g, interpret)
        )[:, : dense.shape[1]]
        err = np.max(np.abs(got - want)) / max(1e-30, np.abs(want).max())
        print(f"group={g} interpret={interpret} max_rel_err={err:.3e}")
        assert err < 1e-4, err
    print("quick_check OK")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="CPU interpret check")
    ap.add_argument("--on-chip-check", action="store_true",
                    help="tiny-shape compiled check on the TPU")
    ap.add_argument("--skip-baselines", action="store_true",
                    help="baselines already recorded in the jsonl")
    args = ap.parse_args()

    if args.quick:
        quick_check(interpret=True)
        return
    if args.on_chip_check:
        quick_check(interpret=False)
        return

    from spmm_denseblock_tpu.formats.bsr import random_bsr
    from spmm_denseblock_tpu.ops.bsr_spmm_pallas import bsr_spmm_pallas_plan
    from spmm_denseblock_tpu.ops.bsr_spmm_pallas_int8 import (
        _quantize_cols_static,
    )
    from spmm_denseblock_tpu.ops.bsr_spmm_int8 import (
        quantize_blocks, static_col_scale,
    )
    from spmm_denseblock_tpu.ops.bsr_spmm_xla import bsr_spmm_xla_plan
    from spmm_denseblock_tpu.bench.timing import time_repeats

    nb, b, F, p = 1024, 128, 512, 2e-2
    bsr = random_bsr(p, nb, nb, block_size=b, seed=1234)
    rng = np.random.default_rng(1234)
    dense = rng.standard_normal((bsr.shape[1], F)).astype(np.float32)
    dense_dev = jax.device_put(dense)
    flops = 2.0 * bsr.nnzb * b * b * F
    want = np.asarray(bsr_spmm_xla_plan(bsr)(dense))
    wmax = float(np.abs(want).max())

    rows = []

    def record(**kw):
        kw["ts"] = time.time()
        rows.append(kw)
        with open(OUT, "a") as f:
            f.write(json.dumps(kw) + "\n")
        print(json.dumps(kw))

    def run_variant(label, dtype_name, ft, group, precision_name=None):
        """Build a fused apply for the resident kernel and time it."""
        dtype = {"f32": None, "bf16": jnp.bfloat16, "int8": "int8"}[dtype_name]
        kp = None
        try:
            if dtype_name == "int8":
                covered = _ensure_covering(bsr)
                rows_h = np.asarray(covered.block_rows[: covered.nnzb])
                cols_h = np.asarray(covered.block_cols[: covered.nnzb])
                blocks_h = np.asarray(
                    covered.blocks[: covered.nnzb], np.float32
                )
                sr_h, sc_h, bp_h = _pack_groups(rows_h, cols_h, blocks_h, group)
                qb, scales = quantize_blocks(bp_h)
                sr, sc = jnp.asarray(sr_h), jnp.asarray(sc_h)
                qb, scales = jnp.asarray(qb), jnp.asarray(scales)
                nbr, nbc = covered.n_block_rows, covered.n_block_cols
                kp = nbc * b
                cal = static_col_scale(dense[:4096])
                cs = jnp.asarray(np.asarray(cal, np.float32))

                @jax.jit
                def apply(x):
                    xp = jnp.pad(x, ((0, kp - x.shape[0]), (0, 0)))
                    q, col_scale = _quantize_cols_static(xp, cs)
                    out = _resident_int8_spmm(
                        sr, sc, scales, qb, q.reshape(nbc, b, -1), nbr,
                        bsr.shape[0], ft, group,
                    )
                    return out * col_scale[None, :]

            else:
                sr, sc, bp, nbr, nbc, group = build_layout(bsr, group, dtype)
                kp = nbc * b

                @jax.jit
                def apply(x):
                    xp = jnp.pad(x, ((0, kp - x.shape[0]), (0, 0)))
                    if dtype is not None:
                        xp = xp.astype(dtype)
                    return _resident_spmm(
                        sr, sc, bp, xp.reshape(nbc, b, -1), nbr,
                        bsr.shape[0], ft, group, False, precision_name,
                    )

            got = np.asarray(apply(dense_dev))
            err = float(np.max(np.abs(got - want)) / max(1e-30, wmax))
            t = time_repeats(apply, dense_dev, repeats=3, iters=10, square=True)
            record(
                kind="resident_probe", label=label, dtype=dtype_name,
                f_tile=ft, group=group, nnzb=int(bsr.nnzb),
                ms=t["secs"] * 1e3, ms_min=t["secs_min"] * 1e3,
                ms_max=t["secs_max"] * 1e3, repeats=3,
                tflops=flops / t["secs"] / 1e12, max_rel_err=err,
                dense_slice_mb=round(
                    kp * ft * {"f32": 4, "bf16": 2, "int8": 1}[dtype_name]
                    / 2**20, 1,
                ),
            )
        except Exception as e:  # compile rejection = recorded negative
            record(
                kind="resident_probe_fail", label=label, dtype=dtype_name,
                f_tile=ft, group=group,
                error=str(e)[:500],
            )

    # --- baselines re-timed in this same session (fair A/B) ---
    for label, kw in [] if args.skip_baselines else [
        ("base_bf16_g8", dict(dtype="bfloat16")),
        ("base_f32_highest", dict()),
    ]:
        plan = bsr_spmm_pallas_plan(bsr, grad=False, **kw)
        got = np.asarray(plan(dense_dev))
        err = float(np.max(np.abs(got - want)) / max(1e-30, wmax))
        t = time_repeats(plan, dense_dev, repeats=3, iters=10, square=True)
        record(kind="resident_probe_baseline", label=label,
               ms=t["secs"] * 1e3, ms_min=t["secs_min"] * 1e3,
               ms_max=t["secs_max"] * 1e3,
               tflops=flops / t["secs"] / 1e12, max_rel_err=err)

    if not args.skip_baselines:
        from spmm_denseblock_tpu.ops.bsr_spmm_pallas_int8 import (
            bsr_spmm_pallas_int8_plan,
        )
        i8 = bsr_spmm_pallas_int8_plan(bsr, calibration=dense[:4096])
        got = np.asarray(i8(dense_dev))
        err = float(np.max(np.abs(got - want)) / max(1e-30, wmax))
        t = time_repeats(i8, dense_dev, repeats=3, iters=10, square=True)
        record(kind="resident_probe_baseline", label="base_int8_cal",
               ms=t["secs"] * 1e3, ms_min=t["secs_min"] * 1e3,
               ms_max=t["secs_max"] * 1e3,
               tflops=flops / t["secs"] / 1e12, max_rel_err=err)

    # --- resident variants (trimmed: the relay backpressure episode
    # showed each variant re-transfers its packed block list, so probe
    # the decisive cells first; g32/ft128 axes can follow once the
    # primary A/B lands) ---
    # int8: full-F residency (67 MB int8, single pass) — biggest headroom
    for g in (8, 16):
        run_variant(f"resident_int8_ft512_g{g}", "int8", 512, g)
    # bf16: dense slice 67 MB at ft=256 (2 f passes)
    for g in (8, 16):
        run_variant(f"resident_bf16_ft256_g{g}", "bf16", 256, g)
    # f32-grade bf16x3 on resident f32 slice (ft=128: 4 passes)
    run_variant("resident_bf16x3_ft128_g8", "f32", 128, 8, "bf16x3")
    # f32 HIGHEST (MXU-bound expectation — parity check)
    run_variant("resident_f32_ft128_g8", "f32", 128, 8)

    print("\n=== summary ===")
    for r in rows:
        if "tflops" in r:
            print(f"{r['label']:32s} {r['ms']:.3f} ms  {r['tflops']:.1f} TF/s"
                  f"  err={r['max_rel_err']:.2e}")


# int8 resident needs per-slot scales in SMEM like the existing kernel
def _resident_int8_kernel(rows_ref, cols_ref, scales_ref, blocks_ref,
                          dense_ref, out_ref, *, group, b):
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
    out_ref[:] += acc


@functools.partial(
    jax.jit,
    static_argnames=("n_block_rows", "n_rows", "f_tile", "group"),
)
def _resident_int8_spmm(step_rows, slot_cols, scales, qblocks, qdense,
                        n_block_rows, n_rows, f_tile, group):
    n_slots, b, _ = qblocks.shape
    n_steps = n_slots // group
    nbc, b2, f_padded = qdense.shape
    grid = (f_padded // f_tile, n_steps)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=[
            pl.BlockSpec((group, b, b), lambda f, j, r, c, s: (j, 0, 0)),
            pl.BlockSpec(
                (nbc, b, f_tile),
                lambda f, j, r, c, s: (0, 0, f),
                pipeline_mode=pl.Buffered(buffer_count=1),
            ),
        ],
        out_specs=pl.BlockSpec(
            (b, f_tile), lambda f, j, r, c, s: (r[j], f)
        ),
    )
    out = pl.pallas_call(
        functools.partial(_resident_int8_kernel, group=group, b=b),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_block_rows * b, f_padded),
                                       jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_slots * b * b * f_padded,
            bytes_accessed=int(qblocks.size + qdense.size
                               + n_block_rows * b * f_padded * 4),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=112 * 1024 * 1024,
        ),
    )(step_rows, slot_cols, scales, qblocks, qdense)
    return out[:n_rows]


if __name__ == "__main__":
    main()
