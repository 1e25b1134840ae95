"""Round-5 VERDICT #3: a measured route where reordering pays (or an
honest negative).

The r4 dataset matrix showed identical serving ms across orderings
because `auto` routes unstructured graphs to degree-bucketed ELL,
where row order is irrelevant — while block utilization moved 1.7x.
The reference's central question ("can reordering make block-sparse
beat element-sparse", /root/reference/benchmark.py:36-46) needs the
ordering axis swept through the ORDER-SENSITIVE routes:

  windowed — dense (128, 128) tile capture + CSR remainder; orderings
             that cluster nonzeros raise captured_nnz and shrink the
             remainder;
  hybrid   — per-block-row dense-block split at a density threshold
             (the reference's divide.cu:52-127 analog);
  csr_ell  — control: ordering-insensitive by construction.

Per (dataset, ordering, route): serving ms (3 repeats + spread),
capture/split sizes, and the oracle gate. Decision recorded per
dataset: does ANY route separate orderings by more than the spread —
and if the best order-sensitive cell beats the ELL control, that's
the routing change to ship; if not, the negative goes to BASELINE.md.

Appends benchmarks/order_routes_r5.jsonl.
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

OUT = "/root/repo/benchmarks/order_routes_r5.jsonl"
DIM = 128
ERR_COLS = 64

DATASETS = ["ogbl-collab", "ogbl-ddi"]
ORDERINGS = ["original", "rcmk", "rabbit"]
ROUTES = ["csr_ell", "windowed", "hybrid"]


def record(**kw):
    kw["ts"] = time.time()
    with open(OUT, "a") as fh:
        fh.write(json.dumps(kw) + "\n")
    print(json.dumps({k: v for k, v in kw.items() if k != "ts"}),
          flush=True)


def main():
    from spmm_denseblock_tpu.analyze.metrics import block_metrics
    from spmm_denseblock_tpu.bench.timing import time_repeats
    from spmm_denseblock_tpu.io.datasets import load_dataset
    from spmm_denseblock_tpu.ops import spmm_plan, spmm_scipy
    from spmm_denseblock_tpu.reorder.registry import reorder_cached

    for ds in DATASETS:
        csr = load_dataset(ds, scale=1.0)
        rng = np.random.default_rng(1234)
        x = rng.standard_normal((csr.n_cols, DIM)).astype(np.float32)
        x_dev = jax.device_put(x)
        for ordering in ORDERINGS:
            if ordering == "original":
                rcsr = csr
            else:
                rcsr, _ = reorder_cached(
                    csr, ordering, cache_dir="/root/repo/tmp",
                    tag=ds.replace("-", "_"),
                )
            m = block_metrics(rcsr, [128])[128]
            want = spmm_scipy(rcsr, x)[:, :ERR_COLS]
            scale = max(float(np.abs(want).max()), 1e-30)
            for route in ROUTES:
                t0 = time.time()
                try:
                    kw = dict(dtype=jnp.bfloat16, grad=False,
                              feat_dim=DIM)
                    if route == "csr_ell":
                        kw.update(bucket="quarter", compact="auto")
                    plan = spmm_plan(rcsr, impl=route, **kw)
                except Exception as e:
                    record(kind="order_route", dataset=ds,
                           ordering=ordering, route=route,
                           error=f"{type(e).__name__}: {e}")
                    continue
                plan_s = time.time() - t0
                got = np.asarray(plan(x_dev), np.float32)[:, :ERR_COLS]
                rel = float(np.abs(got - want).max() / scale)
                t = time_repeats(plan, x_dev, repeats=3)
                extra = {}
                record(
                    kind="order_route", dataset=ds, ordering=ordering,
                    route=route, n=csr.n_rows, nnz=csr.nnz, dim=DIM,
                    dtype="bfloat16", ms=t["secs"] * 1e3,
                    ms_spread=[t["secs_min"] * 1e3, t["secs_max"] * 1e3],
                    spread_warn=bool(t.get("spread_warn", False)),
                    nnz_per_s=csr.nnz / t["secs"],
                    max_rel_err=rel, gate_ok=rel < 5e-3,
                    plan_s=round(plan_s, 2),
                    block_density_b128=m["density"],
                    block_utilization_b128=m["utilization"],
                    repeats=3, **extra,
                )
                del plan


if __name__ == "__main__":
    import traceback

    try:
        main()
    except Exception:
        print(f"[routes] FAILED: {traceback.format_exc(limit=8)}",
              flush=True)
        sys.exit(1)
