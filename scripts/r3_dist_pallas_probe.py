"""Dist-Pallas overhead probe (round 3, session 3).

Question: does the distributed wrapper (shard_map + pack_buckets_pallas
layouts + the ring fori_loop) cost anything over the single-chip
grouped Pallas kernel when the mesh is trivial? On the one real chip a
1-device mesh runs the exact dist code path (allgather is a no-op
collective, ring is a 1-step fori_loop with a self-ppermute), so any
gap is pure wrapper overhead — the part of the multi-chip deployment
we CAN measure without a pod slice. Comms scaling remains modeled
(parallel/comms.py); kernel-side parity is what this pins.

Headline shape (bench.py): 1024x1024 grid of 128x128 blocks at block
density 2e-2, F=512. Tiers: bf16 (the fastest float serving tier) and
int8 calibrated (the fastest serving tier overall).

Writes benchmarks/dist_pallas_probe_r3.jsonl.
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
    "benchmarks", "dist_pallas_probe_r3.jsonl",
)


def main():
    from spmm_denseblock_tpu.bench.timing import time_chained
    from spmm_denseblock_tpu.formats.bsr import random_bsr
    from spmm_denseblock_tpu.ops import (
        bsr_spmm_pallas_int8_plan,
        bsr_spmm_pallas_plan,
    )
    from spmm_denseblock_tpu.parallel import dist_bsr_spmm_plan, make_mesh_1d

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        nb, b, f, p = 1024, 128, 512, 2e-2
        iters = 8
    else:
        nb, b, f, p = 32, 32, 64, 2e-2
        iters = 2

    bsr = random_bsr(p, nb, nb, block_size=b, seed=1234)
    rng = np.random.default_rng(1234)
    dense = rng.standard_normal((bsr.shape[1], f)).astype(np.float32)
    dense_dev = jax.device_put(dense)
    mesh = make_mesh_1d(1)
    flops = 2.0 * bsr.nnzb * b * b * f

    plans = [
        ("single_bf16", bsr_spmm_pallas_plan(
            bsr, grad=False, dtype=jnp.bfloat16)),
        ("dist_ag_bf16", dist_bsr_spmm_plan(
            bsr, mesh=mesh, strategy="allgather", local_impl="pallas",
            dtype=jnp.bfloat16)),
        ("dist_ring_bf16", dist_bsr_spmm_plan(
            bsr, mesh=mesh, strategy="ring", local_impl="pallas",
            dtype=jnp.bfloat16)),
        ("single_int8_cal", bsr_spmm_pallas_int8_plan(
            bsr, calibration=dense)),
        ("dist_ag_int8_cal", dist_bsr_spmm_plan(
            bsr, mesh=mesh, strategy="allgather", local_impl="pallas",
            dtype=jnp.int8, calibration=dense)),
        ("dist_ring_int8_cal", dist_bsr_spmm_plan(
            bsr, mesh=mesh, strategy="ring", local_impl="pallas",
            dtype=jnp.int8, calibration=dense)),
    ]

    recs = []
    with open(OUT, "a") as fh:
        for label, plan in plans:
            secs = time_chained(plan, dense_dev, iters=iters)
            rec = {
                "kind": "dist_pallas_probe",
                "label": label,
                "nb": nb, "b": b, "f": f, "p": p,
                "nnzb": int(bsr.nnzb),
                "ms": round(secs * 1e3, 3),
                "tflops": round(flops / secs / 1e12, 2),
                "backend": jax.default_backend(),
            }
            recs.append(rec)
            fh.write(json.dumps(rec) + "\n")
            fh.flush()
            print(json.dumps(rec))

    base = {r["label"]: r["ms"] for r in recs}
    for pair in (("dist_ag_bf16", "single_bf16"),
                 ("dist_ring_bf16", "single_bf16"),
                 ("dist_ag_int8_cal", "single_int8_cal"),
                 ("dist_ring_int8_cal", "single_int8_cal")):
        d, s = pair
        print(f"{d} vs {s}: {base[d] / base[s]:.3f}x")


if __name__ == "__main__":
    main()
