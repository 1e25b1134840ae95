"""Reorder quality audit at full scale (host-only, CPU).

VERDICT r2 items:
  #3 gorder (bucket-list unit heap, volume-budgeted hub cut) must hold
     block_metrics >= rcmk on >= 2 full-scale graphs;
  #6 the rabbit kRabbitCap=1024 prune perturbs merge choices on
     hub-rich graphs — A/B its effect on block density/utilization and
     hybrid capture efficiency instead of assuming it harmless.

Appends one JSONL record per (graph, strategy, variant) to
benchmarks/reorder_quality_r3.jsonl. Synthetic calibrated stand-ins at
the reference's published sizes (no network), same loader as the
fullscale chip runs.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")  # host-only pass, never the chip

import numpy as np  # noqa: E402

OUT = "/root/repo/benchmarks/reorder_quality_r3.jsonl"
BLOCK_SIZES = [32, 128]


def capture_at(rcsr, b, thr):
    """Hybrid capture efficiency: nnz captured into dense blocks per
    block at `thr` — the serving-relevant quality figure (ROUND2_NOTES
    proteins capture sweep)."""
    from spmm_denseblock_tpu.convert.divide import divide

    hyb = divide(rcsr, b, thr)
    cap = int(hyb.dense.nnzb)
    return {
        "dense_nnzb": cap,
        "captured_nnz": int(rcsr.nnz - hyb.remainder.nnz),
        "capture_per_block": (
            float((rcsr.nnz - hyb.remainder.nnz) / cap) if cap else None
        ),
    }


def audit(dataset, strategy, env=None, variant=None, thr=0.05):
    from spmm_denseblock_tpu.analyze.metrics import block_metrics
    from spmm_denseblock_tpu.io.datasets import load_dataset
    from spmm_denseblock_tpu.reorder import check_permutation, permutate
    from spmm_denseblock_tpu.reorder.registry import STRATEGIES

    csr = load_dataset(dataset, scale=1.0)
    old_env = {}
    if env:
        for k, v in env.items():
            old_env[k] = os.environ.get(k)
            os.environ[k] = v
    try:
        t0 = time.perf_counter()
        perm = STRATEGIES[strategy](csr)
        t_order = time.perf_counter() - t0
    finally:
        for k, v in old_env.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    check_permutation(perm, csr.n_rows)
    rcsr = permutate(perm, csr)
    rec = {
        "kind": "reorder_quality",
        "dataset": dataset,
        "n": int(csr.shape[0]),
        "nnz": int(csr.nnz),
        "strategy": strategy,
        "variant": variant or strategy,
        "order_s": round(t_order, 1),
        "blocks": {},
    }
    for b in BLOCK_SIZES:
        m = block_metrics(rcsr, [b])[b]
        rec["blocks"][str(b)] = {
            "density": m["density"],
            "utilization": m["utilization"],
            "average": m["average"],
        }
    rec["capture_thr%.2f" % thr] = capture_at(rcsr, 128, thr)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(
        f"[{dataset} {rec['variant']}] order {t_order:.0f}s "
        f"d128={rec['blocks']['128']['density']:.4g} "
        f"u128={rec['blocks']['128']['utilization']:.4g} "
        f"cap/blk={rec['capture_thr%.2f' % thr]['capture_per_block']}",
        flush=True,
    )
    return rec


def main():
    # gorder vs rcmk: the reference's gorder targets (arxiv, collab) +
    # the scale case (products)
    for ds in ("ogbn-arxiv", "ogbl-collab", "ogbn-products"):
        for strat in ("rcmk", "gorder"):
            try:
                audit(ds, strat)
            except Exception as e:
                print(f"[{ds} {strat}] FAILED {type(e).__name__}: {e}",
                      flush=True)

    # rabbit cap A/B: unlimited on the mid-size graphs, 1024 vs 8192 on
    # products (unlimited aggregation at 123M nnz is the non-terminating
    # regime the cap was built for)
    for ds, caps in (
        ("ogbn-arxiv", ["1024", "0"]),
        ("ogbl-collab", ["1024", "0"]),
        ("ogbn-products", ["1024", "8192"]),
    ):
        for cap in caps:
            try:
                audit(ds, "rabbit", env={"SDB_RABBIT_CAP": cap},
                      variant=f"rabbit_cap{cap}")
            except Exception as e:
                print(f"[{ds} rabbit cap={cap}] FAILED "
                      f"{type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
