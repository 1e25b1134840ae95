"""Full-scale GCN training steps on the round-3 serving layout:
two-level compacted gathers (compact="auto") in BOTH directions of the
custom VJP (grad_plan composes two compact plans — A and A^T each get
their own compaction spans).

Round-2 baselines (tpu_v5e_train_fullscale.jsonl, compact=off):
proteins 1310.9 ms/step, products 4306.9. The chip-validated serving
win was 1.38x on the products forward SpMM; the train step is
2 spmms (fwd A, bwd A^T) + dense layers + adam, so the expected
step-level gain is smaller but real. Appends the same artifact with
compact="auto" marked.
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
    ("ogbn-proteins", 112, 1310.9),
    ("ogbn-products", 47, 4306.9),
]
DIM, STEPS = 128, 5


def run(dataset, n_cls, baseline_ms):
    t0 = time.time()
    csr = load_dataset(dataset, scale=1.0)
    rcsr, _ = reorder_cached(csr, "rabbit", cache_dir="/root/repo/tmp",
                             tag=dataset.replace("-", "_"))
    adj = sym_norm_adjacency(rcsr)
    plan = spmm_plan(adj, impl="csr_ell", bucket="quarter", reduce="auto",
                     dtype=jnp.bfloat16, grad=True, compact="auto",
                     feat_dim=DIM)
    rng = np.random.default_rng(0)
    n = csr.n_rows
    x = jax.device_put(rng.standard_normal((n, DIM)).astype(np.float32))
    y = jax.device_put(rng.integers(0, n_cls, size=n).astype(np.int32))
    mask = jax.device_put((rng.random(n) < 0.6).astype(np.float32))

    params = init_gcn(jax.random.PRNGKey(0), [DIM, DIM, n_cls])
    step, init_state = make_train_step(gcn_apply, plan, optax.adam(1e-2))
    opt_state = init_state(params)

    params, opt_state, m = step(params, opt_state, x, y, mask)
    _ = float(m["loss"])
    compile_s = time.time() - t0

    losses = []
    t1 = time.time()
    for _ in range(STEPS):
        params, opt_state, m = step(params, opt_state, x, y, mask)
        losses.append(float(m["loss"]))
    ms_per_step = (time.time() - t1) / STEPS * 1e3

    rec = {
        "kind": "train_step", "dataset": dataset, "strategy": "rabbit",
        "model": "gcn2", "dims": [DIM, DIM, n_cls], "impl": "csr_ell",
        "bucket": "quarter", "dtype": "bfloat16", "compact": "auto",
        "scale": 1.0, "n": csr.n_rows, "nnz": csr.nnz, "adj_nnz": adj.nnz,
        "ms_per_step": round(ms_per_step, 1), "steps": STEPS,
        "baseline_ms_per_step": baseline_ms,
        "speedup_vs_compact_off": round(baseline_ms / ms_per_step, 3),
        "loss_first": losses[0], "loss_last": losses[-1],
        "loss_decreasing": losses[-1] < losses[0],
        "compile_plus_layout_s": round(compile_s, 1),
        "source": dataset_provenance(dataset),
        "graph_stats": graph_stats(csr, sample=500),
        "wall_s": round(time.time() - t0, 1),
    }
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(f"[train-compact] {dataset}: {ms_per_step:.1f} ms/step "
          f"({rec['speedup_vs_compact_off']}x vs compact=off, "
          f"loss {losses[0]:.4f} -> {losses[-1]:.4f})", flush=True)


if __name__ == "__main__":
    for ds, ncls, base in CASES:
        try:
            run(ds, ncls, base)
        except Exception:
            msg = traceback.format_exc(limit=4)
            print(f"[train-compact] {ds} FAILED: {msg}", flush=True)
            with open(OUT, "a") as f:
                f.write(json.dumps({"kind": "train_error", "dataset": ds,
                                    "compact": "auto", "error": msg}) + "\n")
