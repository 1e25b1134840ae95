"""Round-4 dataset matrix re-base: post-fuse, WITH repeats + spread
(VERDICT r3 #1 "re-measured dataset matrix" + #3 "re-adjudicate the
close calls with intervals").

Same grid as round 3 (7 datasets x {original, rcmk, rabbit} x auto
router, bf16 serving, dim 128 — the run_csrmm sweep analog,
/root/reference/benchmark.py:36-46) plus:
  - n=3 repeats, median + min/max per row (relay-day variance ~10%);
  - plan_s on every record (VERDICT r3 #5: plan time is a first-class
    metric now);
  - per-dtype tolerance fields via bench.harness.conformance_fields
    on a 64-column oracle slice (replaces the misleading bf16
    "gate_1e-4": false);
  - the round-3 close calls re-run with intervals: gorder-vs-rabbit
    serving on ogbn-products, int8 best-manual rows on the three
    gather-bound graphs.

Appends benchmarks/dataset_matrix_r4.jsonl.
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
from spmm_denseblock_tpu.bench.harness import (
    _dense_operand,
    conformance_fields,
)
from spmm_denseblock_tpu.bench.timing import time_repeats
from spmm_denseblock_tpu.io.datasets import (
    dataset_provenance,
    graph_stats,
    load_dataset,
)
from spmm_denseblock_tpu.ops import spmm_plan
from spmm_denseblock_tpu.ops.reference import spmm_scipy
from spmm_denseblock_tpu.reorder.registry import reorder_cached

OUT = "/root/repo/benchmarks/dataset_matrix_r4.jsonl"
B, DIM = 128, 128
V5E_BF16_PEAK = 197.4e12
V5E_HBM_GBPS = 819.0
ERR_COLS = 64

DATASETS = [
    "ogbn-arxiv",
    "ogbl-collab",
    "ogbl-ddi",
    "ogbl-ppa",
    "ogbn-proteins",
    "ogbn-products",
    "ogbl-citation",
]


def run(dataset, strategy, dtype=jnp.bfloat16, label="auto", impl="auto",
        **impl_kw):
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
    t_plan0 = time.time()
    plan = spmm_plan(rcsr, impl=impl, block_size=B, feat_dim=DIM, **kw,
                     **impl_kw)
    plan_s = time.time() - t_plan0
    x = _dense_operand(rcsr.n_cols, DIM)
    # per-dtype conformance on a column slice (full-width oracle at
    # products scale is host-minutes; the slice catches routing errors)
    got = np.asarray(plan(jax.device_put(x)), np.float32)[:, :ERR_COLS]
    want = spmm_scipy(rcsr, x[:, :ERR_COLS])
    dt_name = (
        "int8" if dtype == "int8"
        else (str(np.dtype(dtype)) if dtype is not None else "float32")
    )
    conf = conformance_fields(got, want, dt_name)
    t = time_repeats(plan, jax.device_put(x), repeats=3)
    secs = t["secs"]
    flops = 2.0 * csr.nnz * DIM
    itemsize = 2 if dtype == jnp.bfloat16 else (1 if dtype == "int8" else 4)
    bytes_est = csr.nnz * (4 + DIM * itemsize) + csr.n_rows * DIM * 4
    rec = {
        "kind": "dataset_matrix", "round": 4, "dataset": dataset,
        "strategy": strategy, "b": B, "dim": DIM, "impl": label,
        "scale": 1.0, "dtype": dt_name,
        "n": csr.n_rows, "nnz": csr.nnz,
        "ms": secs * 1e3, "ms_min": t["secs_min"] * 1e3,
        "ms_max": t["secs_max"] * 1e3, "repeats": 3,
        "plan_s": round(plan_s, 2),
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
    rec.update(conf)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
        f.flush()
    print(f"[matrix4] {dataset} {strategy} {label}: {rec['ms']:.1f} ms "
          f"[{rec['ms_min']:.1f},{rec['ms_max']:.1f}] plan {plan_s:.0f}s "
          f"gate={'ok' if rec['gate_ok'] else 'FAIL'}", flush=True)
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
                print(f"[matrix4] {ds} {strat} FAILED: "
                      f"{type(e).__name__}: {e}", flush=True)
    # close-call re-adjudication rows (VERDICT r3 #3): gorder-vs-rabbit
    # serving at products scale, with intervals this time
    for strat in ("gorder", "rabbit"):
        if only and only != "ogbn-products":
            break
        try:
            run("ogbn-products", strat)
        except Exception as e:
            print(f"[matrix4] products {strat} FAILED: "
                  f"{type(e).__name__}: {e}", flush=True)
    # best-manual companions: int8+compact on the gather-bound graphs
    for ds in ("ogbn-products", "ogbl-ppa", "ogbn-proteins"):
        if only and ds != only:
            continue
        try:
            run(ds, "rabbit", dtype="int8", label="auto(int8)")
        except Exception as e:
            print(f"[matrix4] {ds} int8 FAILED: {type(e).__name__}: {e}",
                  flush=True)
    # manual comparator on EVERY dataset (VERDICT r3 weak #7: auto's
    # within-10% acceptance had no manual run on record for 4 of 7
    # datasets): the strongest general manual route, quarter-ELL bf16
    # with two-level compaction
    for ds in DATASETS:
        if only and ds != only:
            continue
        try:
            run(ds, "rabbit", label="manual(csr_ell)", impl="csr_ell",
                compact="auto")
        except Exception as e:
            print(f"[matrix4] {ds} manual FAILED: {type(e).__name__}: {e}",
                  flush=True)
    print(f"[matrix4] done in {time.time()-t_start:.0f}s", flush=True)
