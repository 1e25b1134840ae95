"""Round-3 dataset matrix: all 7 OGB datasets x {original, rcmk,
rabbit} x auto router, full scale, with MFU / roofline fields per
record (VERDICT r2 #4 — completes the missing ogbl-citation coverage
and re-bases collab/ddi/arxiv on the round-3 tiers: quarter buckets,
scan reduce, two-level compaction in `auto`).

Reference match: the run_csrmm sweep grid benchmark.py:36-46 sweeps
datasets x reorder {original, rcmk, rabbit} — this is that matrix on
the TPU tiers, serving dtype bf16 (the validated reduced-precision
tier), dim=128.

Appends to benchmarks/dataset_matrix_r3.jsonl. Chip-sequential: run
via the r3 chip queue only.
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
from spmm_denseblock_tpu.io.datasets import (
    dataset_provenance,
    graph_stats,
    load_dataset,
)
from spmm_denseblock_tpu.ops import spmm_plan
from spmm_denseblock_tpu.reorder.registry import reorder_cached

OUT = "/root/repo/benchmarks/dataset_matrix_r3.jsonl"
B, DIM = 128, 128
V5E_BF16_PEAK = 197.4e12
V5E_HBM_GBPS = 819.0

DATASETS = [
    "ogbn-arxiv",
    "ogbl-collab",
    "ogbl-ddi",
    "ogbl-ppa",
    "ogbn-proteins",
    "ogbn-products",
    "ogbl-citation",
]


def run(dataset, strategy, dtype=jnp.bfloat16, label="auto"):
    t0 = time.time()
    csr = load_dataset(dataset, scale=1.0)
    if strategy == "original":
        rcsr = csr
    else:
        rcsr, _ = reorder_cached(csr, strategy, cache_dir="/root/repo/tmp",
                                 tag=dataset.replace("-", "_"))
    metrics = block_metrics(rcsr, [B])[B]
    kw = dict(grad=False)
    if dtype is not None:
        kw["dtype"] = dtype
    plan = spmm_plan(rcsr, impl="auto", block_size=B, feat_dim=DIM, **kw)
    x = _dense_operand(rcsr.n_cols, DIM)
    secs = _time(plan, x)
    flops = 2.0 * csr.nnz * DIM
    # roofline estimate: index reads + gathered rows + output (bf16
    # table, f32 out); gather-tier lower bound, honest for comparisons
    itemsize = 2 if dtype == jnp.bfloat16 else (1 if dtype == "int8" else 4)
    bytes_est = csr.nnz * (4 + DIM * itemsize) + csr.n_rows * DIM * 4
    rec = {
        "kind": "dataset_matrix", "dataset": dataset, "strategy": strategy,
        "b": B, "dim": DIM, "impl": label, "scale": 1.0,
        "dtype": str(np.dtype(dtype)) if dtype is not None else "float32",
        "n": csr.n_rows, "nnz": csr.nnz,
        "ms": secs * 1e3,
        "gflops": flops / secs / 1e9,
        "nnz_per_s": csr.nnz / secs,
        "mfu_vs_bf16_peak": flops / secs / V5E_BF16_PEAK,
        "achieved_gbps_est": bytes_est / secs / 1e9,
        "hbm_frac_est": bytes_est / secs / 1e9 / V5E_HBM_GBPS,
        "block_density": metrics["density"],
        "block_utilization": metrics["utilization"],
        "source": dataset_provenance(dataset),
        "graph_stats": graph_stats(csr, sample=500),
        "wall_s": round(time.time() - t0, 1),
    }
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
        f.flush()
    print(f"[matrix] {dataset} {strategy} {label}: {rec['ms']:.1f} ms "
          f"({rec['nnz_per_s']/1e6:.1f}M nnz/s, hbm~{rec['hbm_frac_est']:.2f})"
          f" wall {rec['wall_s']}s", flush=True)
    del plan
    return rec


if __name__ == "__main__":
    t_start = time.time()
    only = sys.argv[1] if len(sys.argv) > 1 else None
    for ds in DATASETS:
        if only and ds != only:
            continue
        for strat in ("original", "rcmk", "rabbit"):
            try:
                run(ds, strat)
            except Exception as e:
                print(f"[matrix] {ds} {strat} FAILED: "
                      f"{type(e).__name__}: {e}", flush=True)
    # best-manual companions (the known chip-validated winners, for the
    # auto-within-10% check): int8+compact on the big gather-bound
    # graphs
    for ds in ("ogbn-products", "ogbl-ppa", "ogbn-proteins"):
        if only and ds != only:
            continue
        try:
            run(ds, "rabbit", dtype="int8", label="auto(int8)")
        except Exception as e:
            print(f"[matrix] {ds} int8 FAILED: {type(e).__name__}: {e}",
                  flush=True)
    print(f"[matrix] done in {time.time()-t_start:.0f}s", flush=True)
