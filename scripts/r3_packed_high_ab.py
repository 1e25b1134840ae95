"""Packed bf16x3 A/B: plan-time block split + entry-time dense split +
2G bf16 gather pipelines (pure-MXU kernel) vs the recorded in-kernel
_dot3 numbers (31.42 TF/s at G=4 / bench auto-G8 30.8, padfill_ab).

The in-kernel variant spends ~1.8 ms/call of VPU casts/subtracts on
the headline shape; packed removes that for ~1 ms of entry split
passes and doubled (half-size) gather DMAs. Gate: 1e-4 vs the scipy
oracle. Appends benchmarks/padfill_ab_r3.jsonl (kind=packed_high_ab).
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/sdb_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

OUT = "/root/repo/benchmarks/padfill_ab_r3.jsonl"
ERR_COLS = 128


def main():
    from spmm_denseblock_tpu.bench.timing import time_chained_square
    from spmm_denseblock_tpu.formats.bsr import random_bsr
    from spmm_denseblock_tpu.ops import bsr_spmm_pallas_plan

    nb, b, f, p = 1024, 128, 512, 2e-2
    bsr = random_bsr(p, nb, nb, block_size=b, seed=1234)
    rng = np.random.default_rng(1234)
    dense = rng.standard_normal((bsr.shape[1], f)).astype(np.float32)
    dense_dev = jax.device_put(dense)
    flops = 2.0 * bsr.nnzb * b * b * f
    want = (bsr.to_scipy() @ dense[:, :ERR_COLS]).astype(np.float32)
    scale = np.abs(want).max()

    for name, kw, prefix_tf in (
        ("packed_high_g4", dict(precision="high", group=4, f_tile=512), 31.42),
        ("packed_high_g8", dict(precision="high", group=8, f_tile=512), 30.81),
    ):
        plan = bsr_spmm_pallas_plan(bsr, grad=False, **kw)
        got = np.asarray(plan(dense_dev), np.float32)[:, :ERR_COLS]
        rel = float(np.abs(got - want).max() / scale)
        secs = time_chained_square(plan, dense_dev, iters=10)
        tf = flops / secs / 1e12
        rec = {
            "kind": "packed_high_ab", "variant": name, "nnzb": int(bsr.nnzb),
            "ms": secs * 1e3, "tflops": tf, "prefix_tflops": prefix_tf,
            "speedup_vs_prefix": tf / prefix_tf, "max_rel_err": rel,
            "gate_1e-4": rel <= 1e-4, "ts": time.time(),
        }
        with open(OUT, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)
        del plan


if __name__ == "__main__":
    import traceback

    try:
        main()
    except Exception:
        print(f"[packed-high-ab] FAILED: {traceback.format_exc(limit=5)}",
              flush=True)
        sys.exit(1)
