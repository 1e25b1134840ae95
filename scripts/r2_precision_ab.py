"""precision="high" (bf16x3) A/B on the flat BSR Pallas kernel.

The f32 path at group>=4 is compute-bound on HIGHEST's 6 MXU passes
(ROUND2_NOTES: 23.6 TF/s = 72% of the 33 TF/s 6-pass effective peak).
Precision.HIGH decomposes each f32 operand into 3 bf16 terms (3 passes)
— a ~2x compute ceiling — with near-f32 error. This measures, at the
bench.py headline config (2^17 square, b=128, block-p 2e-2, dim=512):

  - TF/s for HIGHEST vs HIGH vs bf16 DEFAULT (context)
  - max relative error vs the scipy f32 oracle for each

Gate: if HIGH's rel err <= 1e-4 (the reference check_result gate) AND
it beats HIGHEST, it becomes a documented serving mode (and a bench.py
candidate for the f32 headline, reported honestly as bf16x3).
Appends to benchmarks/tpu_v5e_precision_ab.jsonl.
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

from spmm_denseblock_tpu.bench.timing import time_chained_square
from spmm_denseblock_tpu.formats.bsr import random_bsr
from spmm_denseblock_tpu.ops import bsr_spmm_pallas_plan

OUT = "/root/repo/benchmarks/tpu_v5e_precision_ab.jsonl"
ERR_COLS = 128  # oracle error check on a column slice (cheap on host)


def main():
    nb, b, f, p = 1024, 128, 512, 2e-2
    bsr = random_bsr(p, nb, nb, block_size=b, seed=1234)
    rng = np.random.default_rng(1234)
    dense = rng.standard_normal((bsr.shape[1], f)).astype(np.float32)
    dense_dev = jax.device_put(dense)
    flops = 2.0 * bsr.nnzb * b * b * f

    want = (bsr.to_scipy() @ dense[:, :ERR_COLS]).astype(np.float32)
    scale = np.abs(want).max()

    for name, kw in (
        ("f32_highest", dict()),
        ("f32_high", dict(precision="high")),
        ("bf16_default", dict(dtype=jnp.bfloat16)),
    ):
        plan = bsr_spmm_pallas_plan(bsr, grad=False, **kw)
        got = np.asarray(plan(dense_dev), np.float32)[:, :ERR_COLS]
        rel = float(np.abs(got - want).max() / scale)
        secs = time_chained_square(plan, dense_dev, iters=10)
        rec = {
            "kind": "precision_ab", "variant": name, "nb": nb, "b": b,
            "dim": f, "block_p": p, "nnzb": int(bsr.nnzb),
            "ms": secs * 1e3, "tflops": flops / secs / 1e12,
            "max_rel_err": rel, "gate_1e-4": rel <= 1e-4,
            "ts": time.time(),
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
        print(f"[precision-ab] FAILED: {traceback.format_exc(limit=5)}",
              flush=True)
        sys.exit(1)
