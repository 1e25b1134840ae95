"""Round-5 dist parity + plan-budget closure (VERDICT r4 #4, Done
condition): dist_parity plan_s <= 10 s (was 47-89 s) at UNCHANGED
kernel ms, on the real chip at the headline shape.

Round 5 rebuilt the dist plan path metadata-only (parallel/shard.py
block_index_payload: the shard/bucket/pack pipeline runs on 8-byte
index tokens and the block values are gathered once at the end;
int8 quantizes the unpadded source list and gathers int8). Host-side
timing already shows 1.5-6 s; this driver pins the claim where it
counts — on the chip, where plan time also includes the relay
device_put — and re-pins kernel parity vs the single-chip plans.

Reference match: the reference's whole-pipeline restart cost is one
text-file load (/root/reference/load_data.cc:143-165); plan cost is
our analog.

Appends benchmarks/dist_parity_r5.jsonl.
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

OUT = "/root/repo/benchmarks/dist_parity_r5.jsonl"
PLAN_BUDGET_S = 10.0


def main():
    from spmm_denseblock_tpu.bench.timing import time_repeats
    from spmm_denseblock_tpu.formats.bsr import random_bsr
    from spmm_denseblock_tpu.ops import bsr_spmm_pallas_plan
    from spmm_denseblock_tpu.ops.bsr_spmm_pallas_int8 import (
        bsr_spmm_pallas_int8_plan,
    )
    from spmm_denseblock_tpu.parallel.mesh import make_mesh_1d
    from spmm_denseblock_tpu.parallel.spmm import dist_bsr_spmm_plan

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
        print(json.dumps({k: v for k, v in kw.items() if k != "ts"}),
              flush=True)

    plans = {
        "single_f32": lambda: bsr_spmm_pallas_plan(bsr, grad=False),
        "dist_ag_f32": lambda: dist_bsr_spmm_plan(
            bsr, mesh=mesh, strategy="allgather", local_impl="pallas",
        ),
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
    # relay-put control: plan_s through the tunnel is dominated by the
    # device_put of the packed blocks, not plan compute (host packing is
    # 1.5-6 s, see the r5 metadata-only pipeline). Time a pure put of
    # the same byte volumes so the artifact separates the two.
    import time as _t

    for label, mb in (("put_control_700MB_bf16", 700),
                      ("put_control_350MB_int8", 350)):
        arr = np.zeros((mb * 1024 * 1024 // 4,), np.float32)
        t0 = _t.time()
        d = jax.device_put(arr)
        d.block_until_ready()
        record(kind="dist_parity_r5", label=label,
               put_s=round(_t.time() - t0, 2), bytes=arr.nbytes)
        del d, arr

    ref = {}
    for label, build in plans.items():
        t0 = time.time()
        plan = build()
        plan_s = time.time() - t0
        t = time_repeats(plan, dense_dev, repeats=3)
        ms = t["secs"] * 1e3
        fam = ("f32" if "f32" in label
               else "bf16" if "bf16" in label else "int8")
        if label.startswith("single"):
            ref[fam] = ms
        is_dist = label.startswith("dist")
        rec = {
            "kind": "dist_parity_r5", "label": label, "ms": ms,
            "ms_spread": [t["secs_min"] * 1e3, t["secs_max"] * 1e3],
            "tflops": flops / t["secs"] / 1e12,
            "vs_single_rel": (ms - ref[fam]) / ref[fam] if fam in ref else None,
            "plan_s": round(plan_s, 2),
            "plan_budget_s": PLAN_BUDGET_S if is_dist else None,
            "plan_ok": (plan_s <= PLAN_BUDGET_S) if is_dist else None,
            "repeats": 3,
        }
        if t.get("spread_warn"):
            rec["spread_warn"] = True
        record(**rec)
        del plan


if __name__ == "__main__":
    import traceback

    try:
        main()
    except Exception:
        print(f"[distparity5] FAILED: {traceback.format_exc(limit=5)}",
              flush=True)
        sys.exit(1)
