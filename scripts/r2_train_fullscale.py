"""Full-scale GCN training-step artifacts (background TPU job).

The GB-scale plan API (ops/plan.py) exists so that full-graph training
works: the jitted step takes the SpMM plan as an ARGUMENT, so the
products-scale layout arrays are runtime parameters, not HLO constants.
This job proves it end-to-end on the real chip — a 2-layer GCN
(dims 128 -> 128 -> n_classes) training step (forward + backward +
adam) over the FULL normalized adjacency of ogbn-proteins and
ogbn-products, rabbit-reordered, bf16 ELL gathers.

Timing: each step is O(100 ms - seconds); a per-step host readback of
the scalar loss is a true sync barrier (axon relay rule) and its
overhead is noise at this scale. Records ms/step over 5 steps after a
1-step warmup into benchmarks/tpu_v5e_train_fullscale.jsonl.

Reference analog: the reference benchmarks A @ X in isolation
(run_csrmm.cu); a full training step is the north-star workload those
SpMMs exist to serve (forward A@(XW) per layer + A^T-gathers backward).
"""

import json
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/sdb_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
import optax

from spmm_denseblock_tpu.io.datasets import (
    dataset_provenance,
    graph_stats,
    load_dataset,
)
from spmm_denseblock_tpu.models import (
    gcn_apply,
    init_gcn,
    make_train_step,
    sym_norm_adjacency,
)
from spmm_denseblock_tpu.ops import spmm_plan
from spmm_denseblock_tpu.reorder.registry import reorder_cached

OUT = "/root/repo/benchmarks/tpu_v5e_train_fullscale.jsonl"

CASES = [
    # (dataset, n_classes) — class counts from the published tasks
    ("ogbn-proteins", 112),   # 112 binary protein functions -> 112-way here
    ("ogbn-products", 47),
]
DIM, STEPS = 128, 5


def run(dataset, n_cls):
    t0 = time.time()
    csr = load_dataset(dataset, scale=1.0)
    rcsr, _ = reorder_cached(csr, "rabbit", cache_dir="/root/repo/tmp",
                             tag=dataset.replace("-", "_"))
    adj = sym_norm_adjacency(rcsr)
    plan = spmm_plan(adj, impl="csr_ell", bucket="quarter", reduce="auto",
                     dtype=jnp.bfloat16, grad=True)
    rng = np.random.default_rng(0)
    n = csr.n_rows
    x = jax.device_put(rng.standard_normal((n, DIM)).astype(np.float32))
    y = jax.device_put(rng.integers(0, n_cls, size=n).astype(np.int32))
    mask = jax.device_put((rng.random(n) < 0.6).astype(np.float32))

    params = init_gcn(jax.random.PRNGKey(0), [DIM, DIM, n_cls])
    step, init_state = make_train_step(gcn_apply, plan, optax.adam(1e-2))
    opt_state = init_state(params)

    # warmup (compile) + sync via loss readback
    params, opt_state, m = step(params, opt_state, x, y, mask)
    _ = float(m["loss"])
    compile_s = time.time() - t0

    losses = []
    t1 = time.time()
    for _ in range(STEPS):
        params, opt_state, m = step(params, opt_state, x, y, mask)
        losses.append(float(m["loss"]))  # readback = sync barrier
    ms_per_step = (time.time() - t1) / STEPS * 1e3

    rec = {
        "kind": "train_step", "dataset": dataset, "strategy": "rabbit",
        "model": "gcn2", "dims": [DIM, DIM, n_cls], "impl": "csr_ell",
        "bucket": "quarter", "dtype": "bfloat16", "scale": 1.0,
        "n": csr.n_rows, "nnz": csr.nnz, "adj_nnz": adj.nnz,
        "ms_per_step": round(ms_per_step, 1), "steps": STEPS,
        "loss_first": losses[0], "loss_last": losses[-1],
        "loss_decreasing": losses[-1] < losses[0],
        "compile_plus_layout_s": round(compile_s, 1),
        "source": dataset_provenance(dataset),
        "graph_stats": graph_stats(csr, sample=500),
        "wall_s": round(time.time() - t0, 1),
    }
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(f"[train] {dataset}: {ms_per_step:.1f} ms/step "
          f"(loss {losses[0]:.4f} -> {losses[-1]:.4f}, "
          f"wall {rec['wall_s']}s)", flush=True)


if __name__ == "__main__":
    for ds, ncls in CASES:
        try:
            run(ds, ncls)
        except Exception:
            msg = traceback.format_exc(limit=4)
            print(f"[train] {ds} FAILED: {msg}", flush=True)
            with open(OUT, "a") as f:
                f.write(json.dumps({"kind": "train_error", "dataset": ds,
                                    "error": msg}) + "\n")
