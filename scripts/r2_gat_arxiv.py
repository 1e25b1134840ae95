"""Full-arxiv GAT training-step artifact (background TPU job).

GAT exercises the ops the GCN artifact does not: per-edge SDDMM-style
attention scoring + segment softmax + value-weighted aggregation, all
recomputed every forward pass inside one jitted step. Full synthetic
ogbn-arxiv (169k nodes / 1.17M nnz), rabbit-reordered (sorted row_ids
make the segment ops indices_are_sorted fast paths real).

Writes benchmarks/tpu_v5e_train_fullscale.jsonl (kind="train_step",
model="gat2").
"""

import json
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/sdb_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import optax

from spmm_denseblock_tpu.io.datasets import (
    dataset_provenance,
    graph_stats,
    load_dataset,
)
from spmm_denseblock_tpu.models import init_gat, make_gat_apply
from spmm_denseblock_tpu.models.train import accuracy, masked_cross_entropy
from spmm_denseblock_tpu.reorder.registry import reorder_cached

OUT = "/root/repo/benchmarks/tpu_v5e_train_fullscale.jsonl"
DIMS, HEADS, N_CLS, STEPS = [128, 128, 40], 2, 40, 5


def main():
    t0 = time.time()
    csr = load_dataset("ogbn-arxiv", scale=1.0)
    rcsr, _ = reorder_cached(csr, "rabbit", cache_dir="/root/repo/tmp",
                             tag="ogbn-arxiv_s1.0")
    apply = make_gat_apply(rcsr, heads=HEADS)
    params = init_gat(jax.random.PRNGKey(0), DIMS, heads=HEADS)
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    rng = np.random.default_rng(0)
    n = csr.n_rows
    x = jax.device_put(rng.standard_normal((n, DIMS[0])).astype(np.float32))
    y = jax.device_put(rng.integers(0, N_CLS, size=n).astype(np.int32))
    mask = jax.device_put((rng.random(n) < 0.6).astype(np.float32))

    @jax.jit
    def step(params, opt_state, x, y, mask):
        def loss_fn(p):
            logits = apply(p, x)
            return masked_cross_entropy(logits, y, mask), logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        updates, opt_state2 = opt.update(grads, opt_state, params)
        params2 = optax.apply_updates(params, updates)
        return params2, opt_state2, {
            "loss": loss, "acc": accuracy(logits, y, mask)
        }

    params, opt_state, m = step(params, opt_state, x, y, mask)
    _ = float(m["loss"])  # compile + sync
    compile_s = time.time() - t0

    losses = []
    t1 = time.time()
    for _ in range(STEPS):
        params, opt_state, m = step(params, opt_state, x, y, mask)
        losses.append(float(m["loss"]))  # readback = sync barrier
    ms_per_step = (time.time() - t1) / STEPS * 1e3

    rec = {
        "kind": "train_step", "dataset": "ogbn-arxiv", "strategy": "rabbit",
        "model": "gat2", "heads": HEADS, "dims": DIMS, "scale": 1.0,
        "n": csr.n_rows, "nnz": csr.nnz,
        "ms_per_step": round(ms_per_step, 2), "steps": STEPS,
        "loss_first": losses[0], "loss_last": losses[-1],
        "loss_decreasing": losses[-1] < losses[0],
        "compile_plus_layout_s": round(compile_s, 1),
        "source": dataset_provenance("ogbn-arxiv"),
        "graph_stats": graph_stats(csr, sample=500),
        "wall_s": round(time.time() - t0, 1),
    }
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(f"[gat] arxiv: {ms_per_step:.1f} ms/step "
          f"(loss {losses[0]:.4f} -> {losses[-1]:.4f})", flush=True)


if __name__ == "__main__":
    try:
        main()
    except Exception:
        msg = traceback.format_exc(limit=4)
        print(f"[gat] FAILED: {msg}", flush=True)
        with open(OUT, "a") as f:
            f.write(json.dumps({"kind": "train_error", "dataset":
                                "ogbn-arxiv", "model": "gat2",
                                "error": msg}) + "\n")
