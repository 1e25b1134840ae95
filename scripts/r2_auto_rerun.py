"""Re-run impl='auto' at full scale with the scored-threshold router
(convert/divide.score_thresholds) — records whether auto now lands on
the measured winners: proteins+rabbit -> hybrid thr~0.03 (222 ms
incumbent), products -> csr_ell fallback. Appends to
benchmarks/tpu_v5e_fullscale_r2.jsonl."""

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
from spmm_denseblock_tpu.io.datasets import (
    dataset_provenance,
    graph_stats,
    load_dataset,
)
from spmm_denseblock_tpu.ops import spmm_plan
from spmm_denseblock_tpu.reorder.registry import reorder_cached

OUT = "/root/repo/benchmarks/tpu_v5e_fullscale_r2.jsonl"
B, DIM = 128, 128

TARGETS = {"ogbn-proteins": "rabbit", "ogbn-products": "rabbit"}
names = sys.argv[1:] or list(TARGETS)
for dataset, strategy in ((d, TARGETS[d]) for d in names):
    t0 = time.time()
    csr = load_dataset(dataset, scale=1.0)
    rcsr, _ = reorder_cached(csr, strategy, cache_dir="/root/repo/tmp",
                             tag=dataset.replace("-", "_"))
    metrics = block_metrics(rcsr, [B])[B]
    plan = spmm_plan(rcsr, impl="auto", block_size=B, dtype=jnp.bfloat16,
                     grad=False)
    # which tier did the router choose?
    from spmm_denseblock_tpu.ops.plan import Plan
    chosen = plan.statics[-1] if not isinstance(plan, Plan) else "plan"
    x = _dense_operand(rcsr.n_cols, DIM)
    secs = _time(plan, x)
    rec = {
        "kind": "graph", "dataset": dataset, "strategy": strategy,
        "b": B, "dim": DIM, "impl": "auto(scored)", "scale": 1.0,
        "dtype": "bfloat16", "n": csr.n_rows, "nnz": csr.nnz,
        "ms": secs * 1e3, "gflops": 2.0 * csr.nnz * DIM / secs / 1e9,
        "nnz_per_s": csr.nnz / secs,
        "block_density": metrics["density"],
        "block_utilization": metrics["utilization"],
        "source": dataset_provenance(dataset),
        "graph_stats": graph_stats(csr, sample=500),
        "wall_s": round(time.time() - t0, 1),
    }
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
        f.flush()
    print(f"[auto-rerun] {dataset} {strategy}: {rec['ms']:.1f} ms "
          f"(wall {rec['wall_s']}s)", flush=True)
    del plan
print("[auto-rerun] done", flush=True)
