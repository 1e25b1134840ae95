"""Quarter-step ELL bucket A/B at full scale (background TPU job).

Host-side accounting says bucket="quarter" cuts padded gather slots
18% on full products (179.8M -> 147.4M) and the remainder gather is
per-index bound, so the end-to-end win should track the slot count.
Runs (appending to benchmarks/tpu_v5e_fullscale_r2.jsonl, with a
"bucket" field):
  1. products rabbit csr_ell quarter bf16  (incumbent pow2: 2412.7 ms)
  2. proteins rabbit hybrid thr=0.03 quarter bf16 (incumbent: 222.0 ms)
  3. products auto(scored) bf16 with the OOM fixes (4M-slot chunks,
     quarter dense budget) — expects hybrid thr=0.05 or csr_ell.
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


def run(dataset, strategy, impl, thr=None, bucket="pow2", impl_label=None,
        reduce="auto", **plan_kw):
    t0 = time.time()
    csr = load_dataset(dataset, scale=1.0)
    rcsr, _ = reorder_cached(csr, strategy, cache_dir="/root/repo/tmp",
                             tag=dataset.replace("-", "_"))
    metrics = block_metrics(rcsr, [B])[B]
    kw = dict(dtype=jnp.bfloat16, grad=False)
    extra = {"bucket": bucket, "reduce": reduce, **plan_kw}
    if impl == "hybrid":
        hyb = divide(rcsr, B, thr)
        plan = spmm_plan(hyb, impl="hybrid", bucket=bucket, reduce=reduce,
                         **plan_kw, **kw)
        extra.update(dense_nnzb=hyb.dense.nnzb,
                     remainder_nnz=hyb.remainder.nnz,
                     density_threshold=thr)
    elif impl == "csr_ell":
        plan = spmm_plan(rcsr, impl="csr_ell", bucket=bucket, reduce=reduce,
                         **plan_kw, **kw)
    else:  # auto — router picks its own bucket/threshold
        plan = spmm_plan(rcsr, impl=impl, block_size=B, **kw)
        extra.pop("bucket")
    x = _dense_operand(rcsr.n_cols, DIM)
    secs = _time(plan, x)
    rec = {
        "kind": "graph", "dataset": dataset, "strategy": strategy,
        "b": B, "dim": DIM, "impl": impl_label or impl, "scale": 1.0,
        "dtype": "bfloat16", "n": csr.n_rows, "nnz": csr.nnz,
        "ms": secs * 1e3, "gflops": 2.0 * csr.nnz * DIM / secs / 1e9,
        "nnz_per_s": csr.nnz / secs,
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
    print(f"[quarter-ab] {dataset} {strategy} {rec['impl']} thr={thr} "
          f"bucket={bucket}: {rec['ms']:.1f} ms (wall {rec['wall_s']}s)",
          flush=True)
    del plan


if __name__ == "__main__":
    t0 = time.time()
    run("ogbn-products", "rabbit", "csr_ell", bucket="quarter",
        impl_label="csr_ell")          # reduce=auto -> scan chunks
    run("ogbn-products", "rabbit", "csr_ell", bucket="quarter",
        reduce="matsum", impl_label="csr_ell")  # isolate the scan effect
    run("ogbn-proteins", "rabbit", "hybrid", thr=0.03, bucket="quarter")
    run("ogbn-products", "rabbit", "auto", impl_label="auto(scored)")
    print(f"[quarter-ab] done in {time.time()-t0:.0f}s", flush=True)
