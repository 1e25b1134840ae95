"""Round-5 depth-sort A/B on chip (VERDICT r4 #5).

The window-sorted row-group layout cuts pad slots 64.7% -> 30.7% (bf16
R=16 gh=8 W=64) — pad slots multiply BOTH the dominant blocks-restream
HBM term (x n_f passes) and the MXU dots. Model estimate at the
headline shape: bf16 5.44 -> ~4.3 ms if the kernel keeps its measured
fraction-of-schedule. This driver measures, same process, 3 repeats:

  1. bf16 consecutive row-group (ships today) vs depth-sorted at the
     policy point (R=16, gh=8, W=64);
  2. a small (gh, W) grid around the policy point — gh in {8, 16},
     W in {32, 64} (W=128's output tile would eat the f_tile budget);
  3. numerics: max rel err vs the XLA oracle for every cell (bf16
     tolerance 5e-3; accumulation order differs from the consecutive
     layout by design, so the gate is the oracle, not bitwise).

Decision rule: sorted ships as default (SDB_DEPTH_SORT default flips
to on) if the best sorted cell beats consecutive by more than the
recorded spread; otherwise the negative is recorded with the measured
margin. Appends benchmarks/depthsort_ab_r5.jsonl.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/sdb_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

OUT = "/root/repo/benchmarks/depthsort_ab_r5.jsonl"
ERR_COLS = 128


def record(**kw):
    kw["ts"] = time.time()
    with open(OUT, "a") as fh:
        fh.write(json.dumps(kw) + "\n")
    print(json.dumps({k: v for k, v in kw.items() if k != "ts"}),
          flush=True)


def main():
    from spmm_denseblock_tpu.bench.timing import time_repeats
    from spmm_denseblock_tpu.formats.bsr import random_bsr
    from spmm_denseblock_tpu.ops import bsr_spmm_pallas_plan, bsr_spmm_xla_plan
    import sys as _sys

    bp = _sys.modules["spmm_denseblock_tpu.ops.bsr_spmm_pallas"]
    import spmm_denseblock_tpu.ops.bsr_spmm_pallas_int8  # noqa: F401
    bp8 = _sys.modules["spmm_denseblock_tpu.ops.bsr_spmm_pallas_int8"]

    nb, b, F, p = 1024, 128, 512, 2e-2
    bsr = random_bsr(p, nb, nb, block_size=b, seed=1234)
    rng = np.random.default_rng(1234)
    dense = rng.standard_normal((bsr.shape[1], F)).astype(np.float32)
    dense_dev = jax.device_put(dense)
    nnzb = int(bsr.nnzb)
    flops = 2.0 * nnzb * b * b * F
    want = np.asarray(bsr_spmm_xla_plan(bsr)(dense_dev))[:, :ERR_COLS]
    scale = float(np.abs(want).max())

    def measure(label, plan_builder, err_tol=5e-3, **extra):
        t0 = time.time()
        plan = plan_builder()
        plan_s = time.time() - t0
        got = np.asarray(plan(dense_dev), np.float32)[:, :ERR_COLS]
        rel = float(np.abs(got - want).max() / scale)
        t = time_repeats(plan, dense_dev, repeats=3)
        slots = int(max(
            jax.tree_util.tree_leaves(plan.arrays),
            key=lambda a: a.size,
        ).shape[0])
        record(
            kind="depthsort_ab", label=label, ms=t["secs"] * 1e3,
            ms_spread=[t["secs_min"] * 1e3, t["secs_max"] * 1e3],
            spread_warn=bool(t.get("spread_warn", False)),
            tflops=flops / t["secs"] / 1e12, max_rel_err=rel,
            gate_ok=rel < err_tol, plan_s=round(plan_s, 2),
            padded_slots=slots, pad_frac=slots / nnzb - 1.0,
            repeats=3, **extra,
        )
        del plan
        return t["secs"]

    # baseline: the shipping consecutive row-group layout
    measure("bf16_rowgroup_consec",
            lambda: bsr_spmm_pallas_plan(
                bsr, grad=False, dtype=jnp.bfloat16, depth_sort=False))

    # policy point + mini-grid: patch the policy for each cell
    from spmm_denseblock_tpu.ops.bsr_spmm_pallas_int8 import (
        bsr_spmm_pallas_int8_plan,
    )

    orig_policy = bp._depth_sort_policy
    try:
        for gh, W in ((8, 64), (8, 32), (16, 64), (4, 64)):
            bp._depth_sort_policy = bp8._depth_sort_policy = (
                lambda itemsize, group=None, _gh=gh, _W=W:
                (16, _gh, _W)
            )
            measure(
                f"bf16_sorted_gh{gh}_W{W}",
                lambda: bsr_spmm_pallas_plan(
                    bsr, grad=False, dtype=jnp.bfloat16, depth_sort=True),
                gh=gh, W=W, R=16,
            )
    finally:
        bp._depth_sort_policy = bp8._depth_sort_policy = orig_policy

    # int8: baseline consecutive row-group vs the sorted policy point
    # (R=8, gh=8, W=32) and one alternate cell
    measure("int8_rowgroup_consec",
            lambda: bsr_spmm_pallas_int8_plan(
                bsr, calibration=dense[:4096], depth_sort=False),
            err_tol=5e-2)
    try:
        for gh, W in ((8, 32), (16, 32)):
            bp._depth_sort_policy = bp8._depth_sort_policy = (
                lambda itemsize, group=None, _gh=gh, _W=W:
                (8, _gh, _W)
            )
            measure(
                f"int8_sorted_gh{gh}_W{W}",
                lambda: bsr_spmm_pallas_int8_plan(
                    bsr, calibration=dense[:4096], depth_sort=True),
                gh=gh, W=W, R=8, err_tol=5e-2,
            )
    finally:
        bp._depth_sort_policy = bp8._depth_sort_policy = orig_policy


if __name__ == "__main__":
    import traceback

    try:
        main()
    except Exception:
        print(f"[dsab] FAILED: {traceback.format_exc(limit=8)}", flush=True)
        sys.exit(1)
