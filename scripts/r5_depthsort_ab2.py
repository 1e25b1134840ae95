"""Round-5 depth-sort A/B, second grid: edge cells the first pass
suggested (host pad analysis): bf16 gh4/W128 (pad 15.5%, fewer steps
than gh4/W64) and gh2/W128 (pad 10.7% but 2x steps); int8 gh4/{W32,W64}
(the int8 cost structure is only ~30% of its schedule SoL, so slot
count may matter via the per-slot VPU scale multiply, not bytes).

Appends benchmarks/depthsort_ab_r5.jsonl (same kind/fields as pass 1).
"""

import json
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
    import sys as _sys

    from spmm_denseblock_tpu.bench.timing import time_repeats
    from spmm_denseblock_tpu.formats.bsr import random_bsr
    from spmm_denseblock_tpu.ops import bsr_spmm_pallas_plan, bsr_spmm_xla_plan
    from spmm_denseblock_tpu.ops.bsr_spmm_pallas_int8 import (
        bsr_spmm_pallas_int8_plan,
    )

    bp = _sys.modules["spmm_denseblock_tpu.ops.bsr_spmm_pallas"]
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

    orig = bp._depth_sort_policy
    try:
        for R, gh, W, builder, tol in (
            (16, 4, 128,
             lambda: bsr_spmm_pallas_plan(
                 bsr, grad=False, dtype=jnp.bfloat16, depth_sort=True),
             5e-3),
            (16, 2, 128,
             lambda: bsr_spmm_pallas_plan(
                 bsr, grad=False, dtype=jnp.bfloat16, depth_sort=True),
             5e-3),
            (8, 4, 64,
             lambda: bsr_spmm_pallas_int8_plan(
                 bsr, calibration=dense[:4096], depth_sort=True),
             5e-2),
            (8, 4, 32,
             lambda: bsr_spmm_pallas_int8_plan(
                 bsr, calibration=dense[:4096], depth_sort=True),
             5e-2),
        ):
            bp._depth_sort_policy = bp8._depth_sort_policy = (
                lambda itemsize, group=None, _R=R, _gh=gh, _W=W:
                (_R, _gh, _W)
            )
            fam = "int8" if tol == 5e-2 else "bf16"
            measure(f"{fam}_sorted_gh{gh}_W{W}", builder,
                    err_tol=tol, gh=gh, W=W, R=R)
    finally:
        bp._depth_sort_policy = bp8._depth_sort_policy = orig


if __name__ == "__main__":
    import traceback

    try:
        main()
    except Exception:
        print(f"[dsab2] FAILED: {traceback.format_exc(limit=8)}", flush=True)
        sys.exit(1)
