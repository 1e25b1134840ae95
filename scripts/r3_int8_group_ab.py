"""Grouped int8 Pallas kernel A/B (round 3: the int8 kernel gains the
f32 kernel's group packing + pad-DMA skip).

Pre-fix the int8 kernel ran ONE block per grid step: at the headline
shape that is ~20.7k steps of fixed grid cost against an int8
bandwidth SoL of ~2.4 ms — step-overhead-bound at 33.6 TF/s (round-1
record) while the byte accounting allows ~145 TF/s. Measures G in
{1, 4, 8} at the headline shape plus the f32-entry quantization cost
split (static vs dynamic col scales).

Also: transb timing-method control — the dim=128 transb A/B crossed
timing methods (square chain for transb=0, mix chain for transb=1);
this re-times transb=0 with the mix chain for an apples-to-apples
row. Appends benchmarks/int8_group_ab_r3.jsonl.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/sdb_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

OUT = "/root/repo/benchmarks/int8_group_ab_r3.jsonl"
ERR_COLS = 128


def main():
    from spmm_denseblock_tpu.bench.timing import time_chained
    from spmm_denseblock_tpu.formats.bsr import random_bsr
    from spmm_denseblock_tpu.ops.bsr_spmm_pallas_int8 import (
        bsr_spmm_pallas_int8_plan,
    )

    nb, b, f, p = 1024, 128, 512, 2e-2
    bsr = random_bsr(p, nb, nb, block_size=b, seed=1234)
    rng = np.random.default_rng(1234)
    dense = rng.standard_normal((bsr.shape[1], f)).astype(np.float32)
    dense_dev = jax.device_put(dense)
    flops = 2.0 * bsr.nnzb * b * b * f
    want = (bsr.to_scipy() @ dense[:, :ERR_COLS]).astype(np.float32)
    scale = np.abs(want).max()

    for group in (1, 4, 8):
        for cal in (False, True):
            kw = dict(group=group)
            if cal:
                kw["calibration"] = dense[:4096]
            plan = bsr_spmm_pallas_int8_plan(bsr, **kw)
            got = np.asarray(plan(dense_dev), np.float32)[:, :ERR_COLS]
            rel = float(np.abs(got - want).max() / scale)
            secs = time_chained(plan, dense_dev, iters=10)
            rec = {
                "kind": "int8_group_ab", "group": group,
                "calibrated": cal, "nnzb": int(bsr.nnzb),
                "ms": secs * 1e3, "tflops": flops / secs / 1e12,
                "max_rel_err": rel, "ts": time.time(),
            }
            with open(OUT, "a") as fh:
                fh.write(json.dumps(rec) + "\n")
            print(json.dumps(rec), flush=True)
            del plan

    # transb method control: same plan, same mix-chain timing for both
    # operand layouts at dim=128 (the square-chain row in
    # tpu_v5e_bsrmm_transb.jsonl is NOT comparable across methods)
    import functools

    from spmm_denseblock_tpu.bench.harness import _transb_apply
    from spmm_denseblock_tpu.ops import spmm_plan

    plan = spmm_plan(bsr, impl="bsr_pallas")
    x128 = rng.standard_normal((bsr.shape[1], 128)).astype(np.float32)
    for transb in (0, 1):
        fn = functools.partial(_transb_apply, plan) if transb else plan
        x = np.ascontiguousarray(x128.T) if transb else x128
        xd = jax.device_put(x)
        secs = time_chained(fn, xd, iters=10)
        rec = {
            "kind": "transb_method_control", "impl": "bsr_pallas",
            "dim": 128, "transb": transb, "timing": "mix_chain",
            "ms": secs * 1e3, "ts": time.time(),
        }
        with open(OUT, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    import traceback

    try:
        main()
    except Exception:
        print(f"[int8-group-ab] FAILED: {traceback.format_exc(limit=5)}",
              flush=True)
        sys.exit(1)
