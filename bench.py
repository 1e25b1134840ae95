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


from spmm_denseblock_tpu.bench.timing import time_chained_square, time_repeats

_SPREADS = {}


def _time_fn(fn, x0, iters=10, label=None):
    """Chained marginal-cost timing with readback barriers — shared with
    the sweep harness (spmm_denseblock_tpu/bench/timing.py). On TPU,
    median of 3 repeats (round-4 variance discipline: relay-day
    cross-run variance is ~10%; the round-3 int8 headline 81.4 TF/s was
    a favorable single run, reconciled to 75.4 median); the spread is
    recorded per tier in the output line."""
    if iters < 10:  # CPU smoke path: keep it quick
        return time_chained_square(fn, x0, iters=iters)
    t = time_repeats(fn, x0, repeats=3, iters=iters, square=True)
    if label:
        _SPREADS[label] = [round(t["secs_min"] * 1e3, 3),
                           round(t["secs_max"] * 1e3, 3)]
    return t["secs"]


V5E_BF16_PEAK_GFLOPS = 197.4e3  # one consistent MFU denominator
V5E_HBM_GBPS = 819.0


def _warm_claim(max_tries: int = 10, patience_s: int = 120) -> None:
    """Alarm-guarded first device op. The axon chip lease binds on the
    first op of a process and can hang for tens of minutes when a prior
    client died mid-lease (round-4 session 2 ops finding). Retrying the
    op inside SIGALRM windows rides out the poisoned-lease period
    instead of hanging the whole bench run."""
    import signal
    import sys
    import time as _time

    if jax.default_backend() != "tpu":
        return

    def _raise(sig, frame):
        raise TimeoutError()

    old = signal.signal(signal.SIGALRM, _raise)
    try:
        import jax.numpy as jnp

        for i in range(max_tries):
            signal.alarm(patience_s)
            try:
                float(jnp.sum(jnp.ones((256, 256)) @ jnp.ones((256, 256))))
                return
            except TimeoutError:
                print(f"[bench] claim attempt {i + 1} hung >{patience_s}s; "
                      "retrying", file=sys.stderr, flush=True)
            finally:
                signal.alarm(0)
            _time.sleep(10)
    finally:
        signal.signal(signal.SIGALRM, old)


def main():
    from spmm_denseblock_tpu.formats.bsr import random_bsr
    from spmm_denseblock_tpu.ops import bsr_spmm_pallas_plan, bsr_spmm_xla_plan

    try:
        on_tpu = jax.default_backend() == "tpu"
        if on_tpu:
            _warm_claim()
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
    iters = 10 if on_tpu else 2

    xla = bsr_spmm_xla_plan(bsr)
    t_xla = _time_fn(xla, dense_dev, iters=iters, label="xla")

    pallas = bsr_spmm_pallas_plan(bsr, grad=False)
    t_f32 = _time_fn(pallas, dense_dev, iters=iters, label="f32_highest")
    t_best, dtype_label = t_f32, "f32"

    tiers = {"f32_highest": round(flops / t_f32 / 1e9, 1)}
    if on_tpu:
        # bf16x3 (precision="high", 3 MXU passes vs HIGHEST's 6): promote
        # to the f32-grade headline ONLY if it passes the check_result
        # 1e-4 elementwise gate against the exact-f32 oracle on this very
        # input (self-validating flip; ROUND2_NOTES session-4 design).
        high = bsr_spmm_pallas_plan(bsr, grad=False, precision="high")
        want = np.asarray(xla(dense_dev))
        got = np.asarray(high(dense_dev))
        err = float(
            np.max(np.abs(got - want)) / max(1e-30, float(np.max(np.abs(want))))
        )
        t_high = _time_fn(high, dense_dev, iters=iters, label="f32_bf16x3")
        tiers["f32_bf16x3"] = round(flops / t_high / 1e9, 1)
        tiers["bf16x3_rel_err"] = err
        if err < 1e-4 and t_high < t_best:
            t_best, dtype_label = t_high, "f32(bf16x3)"

        # reduced-precision serving tiers, reported alongside (opt-in
        # for users; the headline stays f32-grade per the 1e-4
        # discipline). int8: grouped kernel + static calibration (the
        # serving deployment shape), ~1e-2 rel err.
        bf16 = bsr_spmm_pallas_plan(bsr, grad=False, dtype="bfloat16")
        t_bf16 = _time_fn(bf16, dense_dev, iters=iters, label="bf16")
        tiers["bf16"] = round(flops / t_bf16 / 1e9, 1)

        from spmm_denseblock_tpu.ops.bsr_spmm_pallas_int8 import (
            bsr_spmm_pallas_int8_plan,
        )

        i8 = bsr_spmm_pallas_int8_plan(bsr, calibration=dense[:4096])
        t_i8 = _time_fn(i8, dense_dev, iters=iters, label="int8_calibrated")
        tiers["int8_calibrated"] = round(flops / t_i8 / 1e9, 1)

    gflops = flops / t_best / 1e9
    vs = t_xla / t_best  # >1 means Pallas beats the compiler baseline
    # roofline estimate: blocks + gathered B tiles + output, f32 bytes
    bytes_moved = (
        bsr.nnzb * b * b * 4 + bsr.nnzb * b * f * 4 + bsr.shape[0] * f * 4
    )
    print(
        json.dumps(
            {
                "metric": "bsr_spmm_pallas_gflops",
                "value": round(gflops, 2),
                "unit": "GFLOP/s",
                "vs_baseline": round(vs, 3),
                "dtype": dtype_label,
                "mfu_vs_bf16_peak": round(gflops / V5E_BF16_PEAK_GFLOPS, 4),
                "achieved_gbps": round(bytes_moved / t_best / 1e9, 1),
                "tiers_gflops": tiers,
                "tier_ms_spread": _SPREADS,
                "repeats": 3 if _SPREADS else 1,
            }
        )
    )


if __name__ == "__main__":
    main()
