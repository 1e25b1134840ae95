"""Gather-pipeline lookahead A/B (pl.Buffered multi-buffering on the
B-tile specs of the flat BSR kernel).

The measured bf16 kernel sits at ~64% of its bandwidth SoL; the model
says the residual is random-gather DMA latency the default double
buffer can't hide. pl.Buffered(buffer_count=L, use_lookahead=True)
lets the pipeline fetch future CHANGED tiles as soon as a buffer slot
frees (pads repeat indices, so they cost no slot — synergy with the
pad-skip fill). Measures the headline shape across L in {0, 3, 4},
bf16 G in {4, 8} + bf16x3 G=4 + f32 G=4.

Appends benchmarks/lookahead_ab_r3.jsonl.
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

OUT = "/root/repo/benchmarks/lookahead_ab_r3.jsonl"
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

    cases = []
    for la in (0, 3, 4):
        cases.append((f"bf16_g4_la{la}", dict(dtype=jnp.bfloat16, group=4,
                                              f_tile=512, lookahead=la)))
        cases.append((f"bf16_g8_la{la}", dict(dtype=jnp.bfloat16, group=8,
                                              f_tile=512, lookahead=la)))
    for la in (3, 4):
        cases.append((f"bf16x3_g4_la{la}", dict(precision="high", group=4,
                                                f_tile=512, lookahead=la)))
        cases.append((f"f32_g4_la{la}", dict(group=4, f_tile=512,
                                             lookahead=la)))

    for name, kw in cases:
        try:
            plan = bsr_spmm_pallas_plan(bsr, grad=False, **kw)
            got = np.asarray(plan(dense_dev), np.float32)[:, :ERR_COLS]
            rel = float(np.abs(got - want).max() / scale)
            secs = time_chained_square(plan, dense_dev, iters=10)
        except Exception as e:  # lookahead may be unsupported on v5e
            rec = {"kind": "lookahead_ab", "variant": name,
                   "error": repr(e)[:300], "ts": time.time()}
            with open(OUT, "a") as fh:
                fh.write(json.dumps(rec) + "\n")
            print(json.dumps(rec), flush=True)
            continue
        rec = {
            "kind": "lookahead_ab", "variant": name, "nnzb": int(bsr.nnzb),
            "ms": secs * 1e3, "tflops": flops / secs / 1e12,
            "max_rel_err": rel, "ts": time.time(),
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
        print(f"[lookahead-ab] FAILED: {traceback.format_exc(limit=5)}",
              flush=True)
        sys.exit(1)
