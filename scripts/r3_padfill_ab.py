"""Pad-slot DMA-skip A/B (per-buffer forward fill in _pack_groups).

Pre-fix, every pad slot's col pointed at the ROW's last real block —
a different index than that buffer's previous step, so Mosaic issued a
full (b, f_tile) B-tile DMA for a zero block (7% of slots at G=4, 15%
at G=8 on the headline shape). Post-fix the pad repeats the SAME
buffer's previous-step col and the copy is skipped.

Measures the headline shape (2^17 square, b=128, block-p 2e-2, F=512)
across the tiers whose pre-fix numbers are on record:

  bf16 G=4 f512 (pre-fix 49.07 TF/s, mfu_breakdown_r3.jsonl)
  bf16 G=8 f512 (pre-fix 48.42 — G=8 pays 2x the pad DMAs, so the fix
                 may flip the G optimum)
  f32-HIGHEST   (pre-fix 23.6, precision_ab)
  bf16x3        (pre-fix 29.48 — the bench.py headline; gathers are
                 f32 here so pad DMAs are 2x the bytes)

Appends benchmarks/padfill_ab_r3.jsonl.
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

    cases = (
        ("bf16_g4", dict(dtype=jnp.bfloat16, group=4, f_tile=512), 49.07),
        ("bf16_g8", dict(dtype=jnp.bfloat16, group=8, f_tile=512), 48.42),
        ("f32_highest_g4", dict(group=4, f_tile=512), 23.6),
        ("bf16x3_g4", dict(precision="high", group=4, f_tile=512), 29.48),
    )
    for name, kw, prefix_tf in cases:
        plan = bsr_spmm_pallas_plan(bsr, grad=False, **kw)
        got = np.asarray(plan(dense_dev), np.float32)[:, :ERR_COLS]
        rel = float(np.abs(got - want).max() / scale)
        secs = time_chained_square(plan, dense_dev, iters=10)
        tf = flops / secs / 1e12
        rec = {
            "kind": "padfill_ab", "variant": name, "nnzb": int(bsr.nnzb),
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
        print(f"[padfill-ab] FAILED: {traceback.format_exc(limit=5)}",
              flush=True)
        sys.exit(1)
