"""Round-5 full-scale training re-base (VERDICT r4 #1).

Every end-to-end training artifact predates the round-4 kernel stack
(fuse pass, resident layout, row-group schedule): the flagship rows
still say products GCN2 3136.7 ms/step from two rounds ago. This
driver re-runs the full-scale training workloads on TODAY'S stack and
adds the per-step breakdown the verdict asked for:

  step_ms       — full jitted train step (fwd + bwd + adam), loss
                  readback as the sync barrier (axon relay rule);
  spmm_fwd_ms   — one forward SpMM plan call in isolation;
  spmm_bwd_ms   — one backward (A^T) plan call in isolation;
  dense_opt_ms  — the same train step with spmm = identity (dense
                  layers + loss + optimizer only);
  spmm_share    — (step - dense_opt) / step, the fraction the sparse
                  path owns. A 2-layer GCN runs 2 fwd + 2 bwd SpMMs,
                  so step ≈ dense_opt + 2*(fwd + bwd) is the
                  consistency check recorded as breakdown_residual.

Reference analog: run_csrmm.cu:120-159 / ogbg_molhiv_csr.cu benchmark
the A @ X in isolation; the training step is the workload those SpMMs
serve. Supersedes: benchmarks/tpu_v5e_train_fullscale.jsonl rows.

Appends benchmarks/train_fullscale_r5.jsonl.
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

OUT = "/root/repo/benchmarks/train_fullscale_r5.jsonl"

CASES = [
    ("ogbn-proteins", 112),
    ("ogbn-products", 47),
]
DIM, STEPS = 128, 5


def record(**kw):
    kw["ts"] = time.time()
    with open(OUT, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps({k: v for k, v in kw.items() if k != "ts"}),
          flush=True)


def _sync_ms(fn, x, iters=3):
    """Per-call ms for an O(100ms+) callable: readback after each call
    (dispatch overhead is noise at this scale)."""
    out = fn(x)
    _ = float(jnp.sum(out))  # warm + sync
    t0 = time.time()
    for _ in range(iters):
        out = fn(x)
        _ = float(jnp.sum(out))
    return (time.time() - t0) / iters * 1e3


def run(dataset, n_cls):
    t0 = time.time()
    csr = load_dataset(dataset, scale=1.0)
    rcsr, _ = reorder_cached(csr, "rabbit", cache_dir="/root/repo/tmp",
                             tag=dataset.replace("-", "_"))
    adj = sym_norm_adjacency(rcsr)
    t_plan0 = time.time()
    plan = spmm_plan(adj, impl="csr_ell", bucket="quarter", reduce="auto",
                     dtype=jnp.bfloat16, grad=True, compact="auto")
    plan_s = time.time() - t_plan0
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

    # breakdown: isolated fwd / bwd plan calls + identity-spmm step
    from spmm_denseblock_tpu.ops.plan import Plan as _Plan

    spmm_fwd_ms = spmm_bwd_ms = None
    if (isinstance(plan.arrays, tuple) and len(plan.arrays) == 2
            and all(isinstance(p, _Plan) for p in plan.arrays)):
        fwd_plan, bwd_plan = plan.arrays  # grad_plan (ops/plan.py)
        spmm_fwd_ms = _sync_ms(fwd_plan, x)
        spmm_bwd_ms = _sync_ms(bwd_plan, x)
    dense_step, dense_init = make_train_step(
        gcn_apply, lambda h: h, optax.adam(1e-2)
    )
    dparams = init_gcn(jax.random.PRNGKey(0), [DIM, DIM, n_cls])
    dstate = dense_init(dparams)
    dparams, dstate, dm = dense_step(dparams, dstate, x, y, mask)
    _ = float(dm["loss"])
    t2 = time.time()
    for _ in range(3):
        dparams, dstate, dm = dense_step(dparams, dstate, x, y, mask)
        _ = float(dm["loss"])
    dense_opt_ms = (time.time() - t2) / 3 * 1e3

    model_sum = dense_opt_ms + 2 * (spmm_fwd_ms + spmm_bwd_ms)
    record(
        kind="train_fullscale_r5", dataset=dataset, strategy="rabbit",
        model="gcn2", dims=[DIM, DIM, n_cls], impl="csr_ell",
        bucket="quarter", compact="auto", dtype="bfloat16", scale=1.0,
        n=csr.n_rows, nnz=csr.nnz, adj_nnz=adj.nnz,
        ms_per_step=round(ms_per_step, 1), steps=STEPS,
        spmm_fwd_ms=round(spmm_fwd_ms, 1),
        spmm_bwd_ms=round(spmm_bwd_ms, 1),
        dense_opt_ms=round(dense_opt_ms, 1),
        spmm_share=round(1.0 - dense_opt_ms / ms_per_step, 3),
        breakdown_residual=round((ms_per_step - model_sum) / ms_per_step, 3),
        supersedes="tpu_v5e_train_fullscale.jsonl (r2/r3 stack)",
        prev_ms_per_step={"ogbn-proteins": 1315.1,
                          "ogbn-products": 3136.7}.get(dataset),
        loss_first=losses[0], loss_last=losses[-1],
        loss_decreasing=losses[-1] < losses[0],
        plan_s=round(plan_s, 1),
        compile_plus_layout_s=round(compile_s, 1),
        source=dataset_provenance(dataset),
        wall_s=round(time.time() - t0, 1),
    )


def main():
    for ds, ncls in CASES:
        try:
            run(ds, ncls)
        except Exception:
            msg = traceback.format_exc(limit=6)
            print(f"[train5] {ds} FAILED: {msg}", flush=True)
            record(kind="train_error", dataset=ds, error=msg)


if __name__ == "__main__":
    main()
