"""Control probe: WHY is the dist-wrapped int8 kernel 22% faster than
the single-chip int8 plan on one chip? (round 3, session 3)

First probe (dist_pallas_probe_r3.jsonl): identical packed layout,
identical kernel, bf16 at parity (1.001x) — only int8 shows the gap
(4.65 vs 5.93 ms at the headline shape). Candidate mechanisms:
  (a) static-vs-dynamic operand quantization interplay — control:
      run both plans with dynamic per-call scales too;
  (b) the shard_map/all_gather boundary gives the quantized int8
      operand a different XLA layout/alignment feeding the kernel's
      gather DMAs (the transb narrow-operand mechanism,
      ROUND3_NOTES) — control: repeats must reproduce ~22% in both
      calibration modes if structural;
  (c) relay-day variance (~10%) — control: interleaved repeats.

Writes benchmarks/int8_dist_anomaly_r3.jsonl.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "benchmarks", "int8_dist_anomaly_r3.jsonl",
)


def main():
    from spmm_denseblock_tpu.bench.timing import time_chained
    from spmm_denseblock_tpu.formats.bsr import random_bsr
    from spmm_denseblock_tpu.ops import bsr_spmm_pallas_int8_plan
    from spmm_denseblock_tpu.parallel import dist_bsr_spmm_plan, make_mesh_1d

    on_tpu = jax.default_backend() == "tpu"
    nb, b, f, p = (1024, 128, 512, 2e-2) if on_tpu else (32, 32, 64, 2e-2)
    iters = 8 if on_tpu else 2

    bsr = random_bsr(p, nb, nb, block_size=b, seed=1234)
    rng = np.random.default_rng(1234)
    dense = rng.standard_normal((bsr.shape[1], f)).astype(np.float32)
    dense_dev = jax.device_put(dense)
    mesh = make_mesh_1d(1)
    flops = 2.0 * bsr.nnzb * b * b * f

    plans = [
        ("single_static", bsr_spmm_pallas_int8_plan(bsr, calibration=dense)),
        ("dist_static", dist_bsr_spmm_plan(
            bsr, mesh=mesh, strategy="allgather", local_impl="pallas",
            dtype=jnp.int8, calibration=dense)),
        ("single_dynamic", bsr_spmm_pallas_int8_plan(bsr)),
        ("dist_dynamic", dist_bsr_spmm_plan(
            bsr, mesh=mesh, strategy="allgather", local_impl="pallas",
            dtype=jnp.int8)),
    ]

    with open(OUT, "a") as fh:
        for rep in range(3):  # interleaved repeats bound relay variance
            for label, plan in plans:
                secs = time_chained(plan, dense_dev, iters=iters)
                rec = {
                    "kind": "int8_dist_anomaly", "rep": rep, "label": label,
                    "nb": nb, "b": b, "f": f, "nnzb": int(bsr.nnzb),
                    "ms": round(secs * 1e3, 3),
                    "tflops": round(flops / secs / 1e12, 2),
                    "backend": jax.default_backend(),
                }
                fh.write(json.dumps(rec) + "\n")
                fh.flush()
                print(json.dumps(rec))


if __name__ == "__main__":
    main()
