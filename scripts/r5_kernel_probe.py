"""Round-5 kernel probes, pass 3: two bounded hypotheses from the
sol_reconcile/depthsort numbers.

H1 (int8 group-scale): the int8 tier runs at ~30% of its own schedule
SoL (sol_reconcile_r5.jsonl) — not bytes-bound. Suspect: the per-SLOT
f32 scale multiply (a (b, f_tile) VPU op per slot; ~26k slots). Probe:
quantize each lane-step GROUP of gh slots to a SHARED scale, accumulate
the gh dots in int32, and apply ONE scale multiply per lane-step —
VPU scale work drops gh-fold. Numerics: blocks whose absmax is far
under their group max lose quanta; gate vs oracle at the tier's 5e-2
and record the delta vs per-slot quantization.

H2 (bf16 buffering): measured 4.67 ms ~= serial sum of the block-stream
DMA (2.4 ms over 2 f-passes) and the MXU time (2.0 ms) — the pipeline
may not be double-buffering the (G, b, b) block stream because VMEM is
tight at W=128 (dense slice 67 MB + out tile 33.6 MB double-buffered).
Probe cells: single-buffer the OUT tile (frees 16.8 MB), W=96 (smaller
out tile, slightly more pad), explicit Buffered(2) on blocks.

Appends benchmarks/kernel_probe_r5.jsonl.
"""

import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/sdb_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

OUT = "/root/repo/benchmarks/kernel_probe_r5.jsonl"
ERR_COLS = 128


def record(**kw):
    kw["ts"] = time.time()
    with open(OUT, "a") as fh:
        fh.write(json.dumps(kw) + "\n")
    print(json.dumps({k: v for k, v in kw.items() if k != "ts"}),
          flush=True)


def _gs_kernel(wins_ref, pos_ref, cols_ref, scales_ref, blocks_ref,
               cs_ref, dense_ref, out_ref, *, gh, R):
    """Group-scale int8 depth-sorted kernel: ONE f32 scale per
    lane-step (scales_ref is (T*R,)), int32 accumulation across the
    lane's gh dots."""
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
            acc = d if acc is None else acc + d
        p = pos_ref[j * R + lane]
        s = scales_ref[j * R + lane]
        out_ref[p] += (s * acc.astype(jnp.float32)) * cs_ref[0, :]


@functools.partial(
    jax.jit,
    static_argnames=("n_windows", "window", "n_rows", "f_tile", "gh", "R"),
)
def _gs_call(win_ids, pos, slot_cols, lane_scales, qblocks, qdense,
             col_scale, n_windows, window, n_rows, f_tile, gh, R):
    n_slots, b, _ = qblocks.shape
    G = R * gh
    n_steps = n_slots // G
    nbc, b2, f_padded = qdense.shape
    grid = (f_padded // f_tile, n_steps)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=grid,
        in_specs=[
            pl.BlockSpec((G, b, b), lambda f, j, w, p, c, s: (j, 0, 0)),
            pl.BlockSpec((1, f_tile), lambda f, j, w, p, c, s: (0, f)),
            pl.BlockSpec(
                (nbc, b, f_tile),
                lambda f, j, w, p, c, s: (0, 0, f),
                pipeline_mode=pl.Buffered(buffer_count=1),
            ),
        ],
        out_specs=pl.BlockSpec(
            (window, b, f_tile), lambda f, j, w, p, c, s: (w[j], 0, f)
        ),
    )
    out = pl.pallas_call(
        functools.partial(_gs_kernel, gh=gh, R=R),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_windows * window, b, f_padded), jnp.float32
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=121 * 1024 * 1024,
        ),
    )(win_ids, pos, slot_cols, lane_scales, qblocks,
      col_scale.reshape(1, -1).astype(jnp.float32), qdense)
    return out.reshape(n_windows * window * b, f_padded)[:n_rows]


def probe_int8_groupscale(bsr, dense, want, scale):
    from spmm_denseblock_tpu.bench.timing import time_repeats
    from spmm_denseblock_tpu.ops.bsr_spmm_int8 import static_col_scale
    from spmm_denseblock_tpu.ops.bsr_spmm_pallas import (
        _ensure_covering,
        _pack_rowgroups_sorted,
    )
    from spmm_denseblock_tpu.ops.bsr_spmm_int8 import quantize_per_column

    R, gh, W = 8, 8, 32
    b = bsr.b
    covered = _ensure_covering(bsr)
    rows_h = np.asarray(covered.block_rows[: covered.nnzb])
    cols_h = np.asarray(covered.block_cols[: covered.nnzb])
    blocks_h = np.asarray(covered.blocks[: covered.nnzb], np.float32)
    win, pos, cols, bpad, n_win = _pack_rowgroups_sorted(
        rows_h, cols_h, blocks_h, gh, R, W
    )
    T = win.shape[0]
    # shared scale per (step, lane): absmax over the lane's gh slots
    lanes = bpad.reshape(T, R, gh, b, b)
    lane_absmax = np.abs(lanes).max(axis=(2, 3, 4))  # (T, R)
    lane_scales = np.where(
        lane_absmax > 0, lane_absmax / 127.0, 1.0
    ).astype(np.float32)
    q = lanes * (np.float32(1.0) / lane_scales)[:, :, None, None, None]
    np.rint(q, out=q)
    np.clip(q, -127, 127, out=q)
    qblocks = q.reshape(T * R * gh, b, b).astype(np.int8)

    K = covered.n_block_cols * b
    n_rows = bsr.shape[0]
    cs = static_col_scale(dense[:4096])
    f_padded = dense.shape[1]
    dense_dev = jax.device_put(dense)

    @jax.jit
    def apply(win_d, pos_d, cols_d, ls_d, qb_d, cs_d, x):
        xq, col_scale = quantize_per_column(x, cs_d)
        return _gs_call(
            win_d, pos_d, cols_d, ls_d, qb_d,
            xq.reshape(K // b, b, f_padded), col_scale,
            n_win, W, n_rows, 512, gh, R,
        )

    args = (jnp.asarray(win), jnp.asarray(pos), jnp.asarray(cols),
            jnp.asarray(lane_scales.reshape(-1)), jnp.asarray(qblocks),
            jnp.asarray(cs))
    got = np.asarray(apply(*args, dense_dev), np.float32)[:, :ERR_COLS]
    rel = float(np.abs(got - want).max() / scale)
    fn = lambda x: apply(*args, x)
    t = time_repeats(fn, dense_dev, repeats=3)
    flops = 2.0 * bsr.nnzb * b * b * dense.shape[1]
    record(
        kind="kernel_probe", label="int8_groupscale_gh8_W32",
        ms=t["secs"] * 1e3,
        ms_spread=[t["secs_min"] * 1e3, t["secs_max"] * 1e3],
        spread_warn=bool(t.get("spread_warn", False)),
        tflops=flops / t["secs"] / 1e12, max_rel_err=rel,
        gate_ok=rel < 5e-2, repeats=3,
        note="shared scale per lane-step, int32 accumulate over gh dots",
    )


def probe_bf16_buffering(bsr, dense, want, scale):
    import sys as _sys

    from spmm_denseblock_tpu.bench.timing import time_repeats
    from spmm_denseblock_tpu.ops import bsr_spmm_pallas_plan

    bp = _sys.modules["spmm_denseblock_tpu.ops.bsr_spmm_pallas"]
    dense_dev = jax.device_put(dense)
    flops = 2.0 * bsr.nnzb * bsr.b * bsr.b * dense.shape[1]
    orig = bp._depth_sort_policy
    try:
        for gh, W in ((4, 96), (4, 64), (6, 96)):
            bp._depth_sort_policy = (
                lambda itemsize, group=None, _gh=gh, _W=W: (16, _gh, _W)
            )
            t0 = time.time()
            plan = bsr_spmm_pallas_plan(
                bsr, grad=False, dtype=jnp.bfloat16, depth_sort=True
            )
            plan_s = time.time() - t0
            got = np.asarray(plan(dense_dev), np.float32)[:, :ERR_COLS]
            rel = float(np.abs(got - want).max() / scale)
            t = time_repeats(plan, dense_dev, repeats=3)
            record(
                kind="kernel_probe", label=f"bf16_sorted_gh{gh}_W{W}",
                ms=t["secs"] * 1e3,
                ms_spread=[t["secs_min"] * 1e3, t["secs_max"] * 1e3],
                spread_warn=bool(t.get("spread_warn", False)),
                tflops=flops / t["secs"] / 1e12, max_rel_err=rel,
                gate_ok=rel < 5e-3, plan_s=round(plan_s, 2), repeats=3,
            )
            del plan
    finally:
        bp._depth_sort_policy = orig


def main():
    from spmm_denseblock_tpu.formats.bsr import random_bsr
    from spmm_denseblock_tpu.ops import bsr_spmm_xla_plan

    nb, b, F, p = 1024, 128, 512, 2e-2
    bsr = random_bsr(p, nb, nb, block_size=b, seed=1234)
    rng = np.random.default_rng(1234)
    dense = rng.standard_normal((bsr.shape[1], F)).astype(np.float32)
    want = np.asarray(bsr_spmm_xla_plan(bsr)(jax.device_put(dense)))[:, :ERR_COLS]
    scale = float(np.abs(want).max())
    probe_int8_groupscale(bsr, dense, want, scale)
    probe_bf16_buffering(bsr, dense, want, scale)


if __name__ == "__main__":
    import traceback

    try:
        main()
    except Exception:
        print(f"[kprobe] FAILED: {traceback.format_exc(limit=8)}", flush=True)
        sys.exit(1)
