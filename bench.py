"""Headline benchmark: BSR SpMM GFLOP/s on the flagship Pallas kernel.

Config mirrors the reference's synthetic sweep point scaled to MXU tiles
(test_bsrmm.cu:46-182 at m=2^17 with GFLOP/s = nnzb*b^2*dim/1e6/ms,
/root/reference/test_bsrmm.cu:168): a 2^17 x 2^17 matrix as a 1024x1024
grid of 128x128 blocks at block density 2e-3, dense operand dim 512.

The reference publishes no numbers (BASELINE.md), so `vs_baseline` is the
speedup of the hand-scheduled Pallas kernel over the XLA-compiled
batched-matmul formulation of the SAME computation on the SAME chip —
the compiler-baseline discipline of the reference's cusparse-vs-custom
comparisons (run_bsrmm.cu rocsparse vs cusparse).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import os

import jax
import numpy as np

# The axon site hook pins JAX_PLATFORMS=axon at the env level, so the
# env var alone cannot select CPU — honor an explicit JAX_PLATFORMS=cpu
# via the in-process config (which wins), enabling the CPU smoke path.
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: repeated bench runs skip the slow
# (30-180s) remote kernel compiles. Harmless if the backend ignores it.
jax.config.update("jax_compilation_cache_dir", "/tmp/sdb_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


from spmm_denseblock_tpu.bench.timing import time_chained_square


def _time_fn(fn, x0, iters=10):
    """Chained marginal-cost timing with readback barriers — shared with
    the sweep harness (spmm_denseblock_tpu/bench/timing.py)."""
    return time_chained_square(fn, x0, iters=iters)


def main():
    from spmm_denseblock_tpu.formats.bsr import random_bsr
    from spmm_denseblock_tpu.ops import bsr_spmm_pallas_plan, bsr_spmm_xla_plan

    try:
        on_tpu = jax.default_backend() == "tpu"
    except RuntimeError:
        # axon relay unreachable (backend registered but init fails):
        # fall back to the CPU smoke config rather than crashing the
        # driver's bench run
        jax.config.update("jax_platforms", "cpu")
        on_tpu = False
    if on_tpu:
        # 2^17 x 2^17 at the densest point of the reference's sweep grid
        # (benchmark.py:4-8 sweeps p in {2e-4, 2e-3, 2e-2}); measured
        # v5e sweep (benchmarks/tpu_v5e_sweep.jsonl): 20.5 TFLOP/s here,
        # 3.5x the XLA-compiled baseline.
        nb, b, f, p = 1024, 128, 512, 2e-2
    else:  # CPU smoke config (interpret-mode Pallas is slow)
        nb, b, f, p = 32, 32, 64, 2e-2

    bsr = random_bsr(p, nb, nb, block_size=b, seed=1234)
    rng = np.random.default_rng(1234)
    dense = rng.standard_normal((bsr.shape[1], f)).astype(np.float32)
    dense_dev = jax.device_put(dense)

    flops = 2.0 * bsr.nnzb * b * b * f

    pallas = bsr_spmm_pallas_plan(bsr, grad=False)
    xla = bsr_spmm_xla_plan(bsr)

    t_pallas = _time_fn(pallas, dense_dev, iters=10 if on_tpu else 2)
    t_xla = _time_fn(xla, dense_dev, iters=10 if on_tpu else 2)

    gflops = flops / t_pallas / 1e9
    vs = t_xla / t_pallas  # >1 means Pallas beats the compiler baseline
    print(
        json.dumps(
            {
                "metric": "bsr_spmm_pallas_gflops",
                "value": round(gflops, 2),
                "unit": "GFLOP/s",
                "vs_baseline": round(vs, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
