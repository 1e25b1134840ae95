"""int8-table ELL A/B at full scale (background TPU job).

The full-scale gather cost is per-index and cliffs with table size
(tpu_v5e_gather_floor.jsonl). An int8 table halves the gathered bytes
vs bf16 AND halves the table on the rate curve (products 628 -> 314 MB
at F=128), so the serving tier could beat the bf16 incumbents:
products quarter+scan bf16 1297.8 ms, proteins hybrid-remainder era.
Calibrated static scales (serving mode). Appends to
benchmarks/tpu_v5e_fullscale_r2.jsonl with impl="csr_ell_int8".
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/sdb_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

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


def run(dataset, impl, **plan_kw):
    t0 = time.time()
    csr = load_dataset(dataset, scale=1.0)
    rcsr, _ = reorder_cached(csr, "rabbit", cache_dir="/root/repo/tmp",
                             tag=dataset.replace("-", "_"))
    metrics = block_metrics(rcsr, [B])[B]
    cal = _dense_operand(rcsr.n_cols, DIM, seed=999)  # calibration batch
    plan = spmm_plan(rcsr, impl=impl, calibration=cal, block_size=B,
                     bucket="quarter", reduce="auto", **plan_kw)
    x = _dense_operand(rcsr.n_cols, DIM)
    secs = _time(plan, x)
    rec = {
        "kind": "graph", "dataset": dataset, "strategy": "rabbit",
        "b": B, "dim": DIM, "impl": impl, "scale": 1.0,
        "dtype": "int8-static", "n": csr.n_rows, "nnz": csr.nnz,
        "ms": secs * 1e3, "gflops": 2.0 * csr.nnz * DIM / secs / 1e9,
        "nnz_per_s": csr.nnz / secs,
        "block_density": metrics["density"],
        "block_utilization": metrics["utilization"],
        "bucket": "quarter", "reduce": "auto", **{
            k: str(v) for k, v in plan_kw.items()},
        "source": dataset_provenance(dataset),
        "graph_stats": graph_stats(csr, sample=500),
        "wall_s": round(time.time() - t0, 1),
    }
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(f"[int8-ell] {dataset} {impl}: {rec['ms']:.1f} ms "
          f"(wall {rec['wall_s']}s)", flush=True)
    del plan


if __name__ == "__main__":
    import traceback

    for ds, impl, kw in (
        ("ogbn-products", "csr_ell_int8", {}),
        ("ogbn-proteins", "csr_ell_int8", {}),
        # proteins serving: int8 dense MXU + int8 remainder (incumbent
        # bf16 hybrid thr=0.02: 91.5 ms)
        ("ogbn-proteins", "hybrid_int8", {"density_threshold": 0.02}),
    ):
        try:
            run(ds, impl, **kw)
        except Exception:
            print(f"[int8-ell] {ds} {impl} FAILED: "
                  f"{traceback.format_exc(limit=3)}", flush=True)
