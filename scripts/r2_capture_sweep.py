"""Round-2 capture sweep (background TPU job).

Chases the dense/remainder crossover on the full-scale graphs: the
remainder gather is per-index bound (ROUND2_NOTES), so the lever is
capturing MORE nnz into the MXU dense tier — lower density thresholds
and better-clustering reorders (rabbit). Appends bench_graph-schema
records to benchmarks/tpu_v5e_fullscale_r2.jsonl as each run lands.
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

from spmm_denseblock_tpu.analyze.metrics import block_metrics
from spmm_denseblock_tpu.bench.harness import _dense_operand, _time
from spmm_denseblock_tpu.convert.divide import divide
from spmm_denseblock_tpu.io.datasets import (
    dataset_provenance,
    graph_stats,
    load_dataset,
)
from spmm_denseblock_tpu.ops import spmm_plan
from spmm_denseblock_tpu.reorder.registry import reorder_cached

OUT = "/root/repo/benchmarks/tpu_v5e_fullscale_r2.jsonl"
B, DIM = 128, 128


def run(dataset, strategy, impl, thr, dtype):
    t0 = time.time()
    csr = load_dataset(dataset, scale=1.0)
    rcsr, _ = reorder_cached(csr, strategy, cache_dir="/root/repo/tmp",
                             tag=dataset.replace("-", "_"))
    metrics = block_metrics(rcsr, [B])[B]
    kw = dict(dtype=dtype, grad=False) if dtype else dict(grad=False)
    if impl == "hybrid":
        hyb = divide(rcsr, B, thr)
        plan = spmm_plan(hyb, impl="hybrid", **kw)
        extra = {
            "dense_nnzb": hyb.dense.nnzb,
            "remainder_nnz": hyb.remainder.nnz,
            "density_threshold": thr,
        }
    else:
        plan = spmm_plan(rcsr, impl=impl, **kw)
        extra = {}
    x = _dense_operand(rcsr.n_cols, DIM)
    secs = _time(plan, x)
    flops = 2.0 * csr.nnz * DIM
    rec = {
        "kind": "graph", "dataset": dataset, "strategy": strategy,
        "b": B, "dim": DIM, "impl": impl, "scale": 1.0,
        "dtype": jnp.dtype(dtype).name if dtype else "float32",
        "n": csr.n_rows, "nnz": csr.nnz, "ms": secs * 1e3,
        "gflops": flops / secs / 1e9, "nnz_per_s": csr.nnz / secs,
        "block_density": metrics["density"],
        "block_utilization": metrics["utilization"],
        "source": dataset_provenance(dataset),
        "graph_stats": graph_stats(csr, sample=500),
    }
    rec.update(extra)
    rec["wall_s"] = round(time.time() - t0, 1)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
        f.flush()
    print(f"[sweep] {dataset} {strategy} {impl} thr={thr} {rec['dtype']}: "
          f"{rec['ms']:.1f} ms (wall {rec['wall_s']}s)", flush=True)
    del plan
    return rec


JOBS = [
    # proteins: push the crossover below thr=0.03 (288.7 ms incumbent)
    ("ogbn-proteins", "rabbit", "hybrid", 0.03, jnp.bfloat16),
    ("ogbn-proteins", "rabbit", "hybrid", 0.02, jnp.bfloat16),
    ("ogbn-proteins", "rcmk", "hybrid", 0.02, jnp.bfloat16),
    # products: rabbit clustering — does a dense tier start paying?
    ("ogbn-products", "rabbit", "csr_ell", None, jnp.bfloat16),
    ("ogbn-products", "rabbit", "hybrid", 0.05, jnp.bfloat16),
]

if __name__ == "__main__":
    os.makedirs("/root/repo/tmp", exist_ok=True)
    for job in JOBS:
        try:
            run(*job)
        except Exception as e:  # keep the sweep going; record the failure
            with open(OUT + ".errors", "a") as f:
                f.write(f"{job}: {type(e).__name__}: {e}\n")
            print(f"[sweep] FAILED {job}: {e}", flush=True)
    print("[sweep] done", flush=True)
