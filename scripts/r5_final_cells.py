"""Round-5 closing micro-grid: the two untested neighbor cells of the
shipped geometry. bf16 gh3/W128 (pad between gh4's 15.5% and gh2's
10.7%; gh2 lost on step count, gh3 may split the difference) and
int8 group-scale gh8/W64 (halves the window count; W64's int8 out tile
fits at ft=512). 3 repeats, oracle-gated; ship only if the win clears
the spread. Appends benchmarks/kernel_probe_r5.jsonl.
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

OUT = "/root/repo/benchmarks/kernel_probe_r5.jsonl"
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
    flops = 2.0 * bsr.nnzb * b * b * F
    want = np.asarray(bsr_spmm_xla_plan(bsr)(dense_dev))[:, :ERR_COLS]
    scale = float(np.abs(want).max())

    def measure(label, builder, tol):
        plan = builder()
        got = np.asarray(plan(dense_dev), np.float32)[:, :ERR_COLS]
        rel = float(np.abs(got - want).max() / scale)
        t = time_repeats(plan, dense_dev, repeats=3)
        record(kind="kernel_probe", label=label, ms=t["secs"] * 1e3,
               ms_spread=[t["secs_min"] * 1e3, t["secs_max"] * 1e3],
               spread_warn=bool(t.get("spread_warn", False)),
               tflops=flops / t["secs"] / 1e12, max_rel_err=rel,
               gate_ok=rel < tol, repeats=3)
        del plan

    # controls at the shipped policy
    measure("bf16_ship_control",
            lambda: bsr_spmm_pallas_plan(bsr, grad=False,
                                         dtype=jnp.bfloat16), 5e-3)
    measure("int8_ship_control",
            lambda: bsr_spmm_pallas_int8_plan(
                bsr, calibration=dense[:4096]), 5e-2)

    orig = bp._depth_sort_policy
    try:
        bp._depth_sort_policy = bp8._depth_sort_policy = (
            lambda itemsize, group=None: (16, 3, 128)
        )
        measure("bf16_sorted_gh3_W128",
                lambda: bsr_spmm_pallas_plan(
                    bsr, grad=False, dtype=jnp.bfloat16, depth_sort=True),
                5e-3)
        bp._depth_sort_policy = bp8._depth_sort_policy = (
            lambda itemsize, group=None: (8, 8, 64)
        )
        measure("int8_gs_gh8_W64",
                lambda: bsr_spmm_pallas_int8_plan(
                    bsr, calibration=dense[:4096], depth_sort=True),
                5e-2)
    finally:
        bp._depth_sort_policy = bp8._depth_sort_policy = orig


if __name__ == "__main__":
    import traceback

    try:
        main()
    except Exception:
        print(f"[fcells] FAILED: {traceback.format_exc(limit=8)}", flush=True)
        sys.exit(1)
