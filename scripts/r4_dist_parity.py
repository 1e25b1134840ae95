"""Dist-wrapper parity probe, round-4 session 2 (post resident/epilogue).

The round-3 probe (dist_pallas_probe_r3.jsonl) pinned the dist wrapper
at parity with the single-chip kernel on a trivial 1-device mesh. This
round changed both sides: bf16 local kernels now route the resident
variant (deep pow2 groups), int8 fuses the per-column scale into the
kernel and the dist paths ship the scale INTO the stripes instead of a
full-output epilogue multiply. Re-pin parity: single-chip plan vs
dist allgather vs dist ring, bf16 + int8-calibrated, headline shape.

Writes benchmarks/dist_parity_r4.jsonl.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/sdb_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

OUT = "/root/repo/benchmarks/dist_parity_r4.jsonl"


def main():
    from spmm_denseblock_tpu.bench.timing import time_repeats
    from spmm_denseblock_tpu.formats.bsr import random_bsr
    from spmm_denseblock_tpu.ops import bsr_spmm_pallas_plan
    from spmm_denseblock_tpu.ops.bsr_spmm_pallas_int8 import (
        bsr_spmm_pallas_int8_plan,
    )
    from spmm_denseblock_tpu.parallel.spmm import dist_bsr_spmm_plan
    from spmm_denseblock_tpu.parallel.mesh import make_mesh_1d

    nb, b, F, p = 1024, 128, 512, 2e-2
    bsr = random_bsr(p, nb, nb, block_size=b, seed=1234)
    rng = np.random.default_rng(1234)
    dense = rng.standard_normal((bsr.shape[1], F)).astype(np.float32)
    dense_dev = jax.device_put(dense)
    flops = 2.0 * bsr.nnzb * b * b * F
    mesh = make_mesh_1d(1)

    def record(**kw):
        kw["ts"] = time.time()
        with open(OUT, "a") as f:
            f.write(json.dumps(kw) + "\n")
        print(json.dumps(kw), flush=True)

    plans = {
        "single_bf16": lambda: bsr_spmm_pallas_plan(
            bsr, grad=False, dtype=jnp.bfloat16
        ),
        "dist_ag_bf16": lambda: dist_bsr_spmm_plan(
            bsr, mesh=mesh, strategy="allgather", dtype=jnp.bfloat16,
            local_impl="pallas",
        ),
        "dist_ring_bf16": lambda: dist_bsr_spmm_plan(
            bsr, mesh=mesh, strategy="ring", dtype=jnp.bfloat16,
            local_impl="pallas",
        ),
        "single_int8": lambda: bsr_spmm_pallas_int8_plan(
            bsr, calibration=dense[:4096]
        ),
        "dist_ag_int8": lambda: dist_bsr_spmm_plan(
            bsr, mesh=mesh, strategy="allgather", dtype="int8",
            local_impl="pallas", calibration=dense[:4096],
        ),
        "dist_ring_int8": lambda: dist_bsr_spmm_plan(
            bsr, mesh=mesh, strategy="ring", dtype="int8",
            local_impl="pallas", calibration=dense[:4096],
        ),
    }
    ref = {}
    for label, build in plans.items():
        try:
            t0 = time.time()
            plan = build()
            plan_s = time.time() - t0
            out = np.asarray(plan(dense_dev))
            key = label.split("_")[-1]
            if key not in ref:
                ref[key] = out
            rel = float(
                np.abs(out - ref[key]).max()
                / max(1e-30, np.abs(ref[key]).max())
            )
            t = time_repeats(plan, dense_dev, repeats=3, iters=10, square=True)
            record(kind="dist_parity", label=label,
                   ms=t["secs"] * 1e3,
                   ms_spread=[t["secs_min"] * 1e3, t["secs_max"] * 1e3],
                   tflops=flops / t["secs"] / 1e12,
                   vs_single_rel=rel, plan_s=round(plan_s, 2), repeats=3)
            del plan
        except Exception as e:
            record(kind="dist_parity_fail", label=label, error=str(e)[:300])


if __name__ == "__main__":
    main()
