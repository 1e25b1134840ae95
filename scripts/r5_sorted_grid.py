"""Round-5 generalization grid: does the depth-sorted schedule help
BEYOND the headline cell (p=2e-2, b=128)?

The A/B that shipped the layout ran at one shape. This sweeps the
reference's density x block grid (test_bsrmm axes, benchmark.py:4-8)
at dim=512 for bf16 and int8, sorted on vs off, 3 repeats each — so
the policy's win is either shown general or bounded to a regime.
n = 2^17 square (nb = 131072/b block rows).

Appends benchmarks/sorted_grid_r5.jsonl.
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

OUT = "/root/repo/benchmarks/sorted_grid_r5.jsonl"
ERR_COLS = 64
F = 512


def record(**kw):
    kw["ts"] = time.time()
    with open(OUT, "a") as fh:
        fh.write(json.dumps(kw) + "\n")
    print(json.dumps({k: v for k, v in kw.items() if k != "ts"}),
          flush=True)


def main():
    from spmm_denseblock_tpu.bench.timing import time_repeats
    from spmm_denseblock_tpu.formats.bsr import random_bsr
    from spmm_denseblock_tpu.ops import bsr_spmm_pallas_plan
    from spmm_denseblock_tpu.ops.bsr_spmm_pallas_int8 import (
        bsr_spmm_pallas_int8_plan,
    )

    done = set()
    if os.path.exists(OUT):
        for line in open(OUT):
            try:
                r = json.loads(line)
            except ValueError:
                continue
            if r.get("kind") == "sorted_grid" and "ms" in r:
                done.add((r["p"], r["b"], r["dtype"], r["depth_sort"]))

    for b in (64, 128):
        nb = 131072 // b
        for p in (2e-4, 2e-3, 2e-2):
            bsr = random_bsr(p, nb, nb, block_size=b, seed=1234)
            if bsr.nnzb == 0:
                continue
            rng = np.random.default_rng(1234)
            dense = rng.standard_normal((bsr.shape[1], F)).astype(np.float32)
            dense_dev = jax.device_put(dense)
            flops = 2.0 * bsr.nnzb * b * b * F
            # host oracle: the XLA-plan oracle OOMs HBM at the dense
            # b=64 cell ((nnzb, 64, 512) f32 temp = 10.15 GB)
            want = (bsr.to_scipy() @ dense[:, :ERR_COLS]).astype(np.float32)
            scale = max(float(np.abs(want).max()), 1e-30)
            for dt in ("bf16", "int8"):
                for ds in (False, True):
                    if (p, b, dt, ds) in done:
                        print(f"[sgrid] skip p={p} b={b} {dt} ds={ds}",
                              flush=True)
                        continue
                    try:
                        if dt == "bf16":
                            plan = bsr_spmm_pallas_plan(
                                bsr, grad=False, dtype=jnp.bfloat16,
                                depth_sort=ds,
                            )
                            tol = 5e-3
                        else:
                            plan = bsr_spmm_pallas_int8_plan(
                                bsr, calibration=dense[:4096],
                                depth_sort=ds,
                            )
                            tol = 5e-2
                        got = np.asarray(
                            plan(dense_dev), np.float32
                        )[:, :ERR_COLS]
                        rel = float(np.abs(got - want).max() / scale)
                        t = time_repeats(plan, dense_dev, repeats=3)
                        record(
                            kind="sorted_grid", p=p, b=b, dim=F, dtype=dt,
                            depth_sort=ds, nnzb=int(bsr.nnzb),
                            layout=(str(plan.statics[-1])
                                    if plan.statics else "chunked"),
                            ms=t["secs"] * 1e3,
                            ms_spread=[t["secs_min"] * 1e3,
                                       t["secs_max"] * 1e3],
                            spread_warn=bool(t.get("spread_warn", False)),
                            tflops=flops / t["secs"] / 1e12,
                            max_rel_err=rel, gate_ok=rel < tol, repeats=3,
                        )
                        del plan
                    except Exception as e:
                        record(kind="sorted_grid", p=p, b=b, dtype=dt,
                               depth_sort=ds,
                               error=f"{type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    import traceback

    try:
        main()
    except Exception:
        print(f"[sgrid] FAILED: {traceback.format_exc(limit=6)}", flush=True)
        sys.exit(1)
