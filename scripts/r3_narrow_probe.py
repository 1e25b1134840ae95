"""Narrow-operand anomaly probe: the transb control measured the
column-major entry FASTER at dim=128 (4.13 vs 5.13 ms, same mix-chain
timing) for the same Pallas plan. Isolate the mechanism:

  a) plan(x)                      — the incumbent call path
  b) jit(p(x)) outer jit, no op   — outer-jit boundary only
  c) jit(p(x + 0))                — operand copy/re-layout inside jit
  d) jit(p(xt.T)) col-major entry — the measured-fast case

If (c)/(d) beat (a)/(b), the win is operand re-layout before the
gather-heavy kernel, and narrow plans should insert it.
Appends benchmarks/int8_group_ab_r3.jsonl (kind=narrow_probe).
"""

import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/sdb_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

OUT = "/root/repo/benchmarks/int8_group_ab_r3.jsonl"


@jax.jit
def _ident(plan, x):
    return plan(x)


@jax.jit
def _copy(plan, x):
    return plan(x + 0.0)


@jax.jit
def _transb(plan, xt):
    return plan(xt.T)


def main():
    from spmm_denseblock_tpu.bench.timing import time_chained
    from spmm_denseblock_tpu.formats.bsr import random_bsr
    from spmm_denseblock_tpu.ops import spmm_plan

    nb, b, p = 1024, 128, 2e-2
    bsr = random_bsr(p, nb, nb, block_size=b, seed=1234)
    rng = np.random.default_rng(1234)
    for dim in (128, 512):
        plan = spmm_plan(bsr, impl="bsr_pallas")
        x = rng.standard_normal((bsr.shape[1], dim)).astype(np.float32)
        cases = (
            ("plain", plan, x),
            ("outer_jit", functools.partial(_ident, plan), x),
            ("copy_jit", functools.partial(_copy, plan), x),
            ("transb_jit", functools.partial(_transb, plan),
             np.ascontiguousarray(x.T)),
        )
        for name, fn, xin in cases:
            xd = jax.device_put(xin)
            secs = time_chained(fn, xd, iters=10)
            rec = {"kind": "narrow_probe", "dim": dim, "variant": name,
                   "ms": secs * 1e3, "ts": time.time()}
            with open(OUT, "a") as fh:
                fh.write(json.dumps(rec) + "\n")
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    import traceback

    try:
        if "--phase2" not in sys.argv:
            main()
    except Exception:
        print(f"[narrow-probe] FAILED: {traceback.format_exc(limit=5)}",
              flush=True)
        sys.exit(1)


# --- phase 2 (appended): can a row-major caller BUY the fast layout?
# "transb_jit" was 4.11 vs 5.17 ms plain at dim=128: the kernel runs
# faster when its operand is produced by an on-device transpose. A
# row-major caller could pay transpose+barrier+transpose (~0.3 ms of
# layout passes) to get the same kernel speedup (~1.06 ms) — IF the
# double transpose with a barrier reproduces the layout effect.
def phase2():
    import functools

    import jax.numpy as jnp

    from spmm_denseblock_tpu.bench.timing import time_chained
    from spmm_denseblock_tpu.formats.bsr import random_bsr
    from spmm_denseblock_tpu.ops import spmm_plan

    @jax.jit
    def _dt_barrier(plan, x):
        xt = jax.lax.optimization_barrier(x.T)
        return plan(xt.T)

    rng = np.random.default_rng(1234)
    bsr = random_bsr(2e-2, 1024, 1024, block_size=128, seed=1234)
    plan = spmm_plan(bsr, impl="bsr_pallas", grad=False)
    for dim in (128, 512):
        x = rng.standard_normal((bsr.shape[1], dim)).astype(np.float32)
        xd = jax.device_put(x)
        fn = functools.partial(_dt_barrier, plan)
        secs = time_chained(fn, xd, iters=10)
        rec = {"kind": "narrow_probe", "dim": dim,
               "variant": "double_transpose_barrier", "ms": secs * 1e3,
               "ts": time.time()}
        with open(OUT, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)


if __name__ == "__main__" and "--phase2" in sys.argv:
    phase2()
