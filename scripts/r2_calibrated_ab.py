"""Calibrated-profile stand-in A/B at full scale (background TPU job).

VERDICT round-1 item 10: the synthetic stand-ins must carry realistic
clustering for the reordering/routing results to mean anything. The
calibrated profiles (io/datasets.DATASET_PROFILES, fitted by
scripts/calibrate_synthetic.py to the OGB-published clustering
coefficients) change the graph's community structure — this job
re-measures the headline auto routes on the calibrated graphs so the
legacy-profile numbers can be compared honestly.

Appends to benchmarks/tpu_v5e_fullscale_r2.jsonl with
profile="calibrated"; reorder + layout caches are keyed separately
(_cal tags) so legacy caches stay valid.
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

from spmm_denseblock_tpu.analyze.metrics import block_metrics
from spmm_denseblock_tpu.bench.harness import _dense_operand, _time
from spmm_denseblock_tpu.io.datasets import (
    DATASET_PROFILES,
    dataset_provenance,
    graph_stats,
    load_dataset,
)
from spmm_denseblock_tpu.ops import spmm_plan
from spmm_denseblock_tpu.reorder.registry import reorder_cached

OUT = "/root/repo/benchmarks/tpu_v5e_fullscale_r2.jsonl"
B, DIM = 128, 128


def run(dataset):
    t0 = time.time()
    csr = load_dataset(dataset, scale=1.0, profile="calibrated")
    rcsr, _ = reorder_cached(
        csr, "rabbit", cache_dir="/root/repo/tmp",
        tag=dataset.replace("-", "_") + "_cal",
    )
    metrics = block_metrics(rcsr, [B])[B]
    plan = spmm_plan(rcsr, impl="auto", block_size=B,
                     dtype=jnp.bfloat16, grad=False)
    x = _dense_operand(rcsr.n_cols, DIM)
    secs = _time(plan, x)
    rec = {
        "kind": "graph", "dataset": dataset, "strategy": "rabbit",
        "b": B, "dim": DIM, "impl": "auto(scored)", "scale": 1.0,
        "profile": "calibrated",
        "profile_knobs": DATASET_PROFILES.get(dataset, {}),
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
    print(f"[cal-ab] {dataset}: {rec['ms']:.1f} ms "
          f"(cc={rec['graph_stats']['clustering_sampled']}, "
          f"wall {rec['wall_s']}s)", flush=True)


if __name__ == "__main__":
    for ds in ("ogbn-proteins", "ogbn-products"):
        try:
            run(ds)
        except Exception:
            print(f"[cal-ab] {ds} FAILED: "
                  f"{traceback.format_exc(limit=3)}", flush=True)
