"""Multi-chip readiness harness (VERDICT r3 #7).

One command that, pointed at a pod slice (or today's single-host CPU
mesh), produces the FULL scaling matrix the >=80% BASELINE target needs:
strategy {halo, ring, allgather} x dtype {f32, bf16, int8} x device
counts, each row carrying measured nnz/s, total-throughput retention,
per-device efficiency, AND the analytic ICI model for the same shape
(parallel/comms.py) — so when real multi-chip hardware appears, the 80%
answer is:

    python scripts/readiness_matrix.py --devices 1,2,4,8

On a single-host CPU mesh (today's only option) the honest metric is
RETENTION (rate(n)/rate(1); all virtual devices share the same cores)
and the run validates correctness + partitioning overhead + that every
(strategy, dtype, n) combination compiles and executes; `ici_model_*`
columns carry the v5e prediction. On a real slice the same rows'
`efficiency` column becomes the measurement the target refers to.

The default graph is BANDED synthetic (halo-eligible, the north-star
deployment structure); --graph powerlaw exercises the balanced-
contiguous + allgather fallback path on an unstructured graph.

Appends benchmarks/readiness_matrix.jsonl (or --out).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/sdb_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# The axon site hook pins jax_platforms=axon at interpreter start, so
# JAX_PLATFORMS=cpu in the environment is NOT enough to keep this run
# off the chip — the in-process update below wins (verify-skill note).
# Default to the CPU mesh unless explicitly asked for the chip: a
# readiness run must never contend a concurrent chip session's claim.
if os.environ.get("SDB_READINESS_TPU", "0") != "1":
    jax.config.update("jax_platforms", "cpu")


def build_graph(kind: str, n_block_rows: int, b: int, seed: int = 1234):
    """Banded (halo-eligible) or powerlaw-unstructured BSR test matrix."""
    import numpy as np

    from spmm_denseblock_tpu.formats.bsr import BSR, random_bsr

    if kind == "powerlaw":
        from spmm_denseblock_tpu.convert.csr2bsr import csr_to_bsr
        from spmm_denseblock_tpu.io.datasets import synthetic_powerlaw
        from spmm_denseblock_tpu.reorder import permutate
        from spmm_denseblock_tpu.reorder.registry import STRATEGIES

        n = n_block_rows * b
        csr = synthetic_powerlaw(n, n * 16, seed=seed)
        perm = STRATEGIES["rabbit"](csr)
        return csr_to_bsr(permutate(perm, csr), b)
    if kind == "banded":
        # block-tridiagonal-ish band: every block col within +-1 block
        # stripe of its row at 8-device granularity (halo=1 eligible)
        rng = np.random.default_rng(seed)
        rows, cols = [], []
        width = max(2, n_block_rows // 16)
        for r in range(n_block_rows):
            lo = max(0, r - width)
            hi = min(n_block_rows, r + width + 1)
            k = min(hi - lo, 1 + rng.poisson(6))
            cs = rng.choice(np.arange(lo, hi), size=k, replace=False)
            rows.extend([r] * k)
            cols.extend(cs.tolist())
        rows = np.asarray(rows, np.int32)
        cols = np.asarray(cols, np.int32)
        order = np.lexsort((cols, rows))
        blocks = rng.standard_normal((rows.size, b, b)).astype(np.float32)
        return BSR.from_parts(rows[order], cols[order], blocks[order],
                              (n_block_rows * b, n_block_rows * b), b)
    if kind == "random":
        return random_bsr(1.6e-2, n_block_rows, block_size=b, seed=seed)
    raise ValueError(kind)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--strategies", default="halo,ring,allgather")
    ap.add_argument("--dtypes", default="f32,bf16,int8")
    ap.add_argument("--graph", default="banded",
                    choices=["banded", "powerlaw", "random"])
    ap.add_argument("--n-block-rows", type=int, default=512)
    ap.add_argument("--block-size", type=int, default=64)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--local-impl", default="xla",
                    choices=["xla", "pallas"])
    ap.add_argument("--plan-budget-s", type=float, default=10.0,
                    help="plan-build budget gate (round-4 verdict #4: "
                    "dist plan cost is the analog of the reference's "
                    "one-text-file restart, load_data.cc:143-165)")
    ap.add_argument("--out", default="/root/repo/benchmarks/readiness_matrix.jsonl")
    args = ap.parse_args(argv)

    import numpy as np

    from spmm_denseblock_tpu.bench.timing import time_chained, time_synced
    from spmm_denseblock_tpu.ops.reference import spmm_scipy
    from spmm_denseblock_tpu.parallel import dist_bsr_spmm_plan, make_mesh_1d
    from spmm_denseblock_tpu.parallel.comms import efficiency_model

    on_tpu = jax.default_backend() == "tpu"
    backend = "tpu" if on_tpu else "cpu-mesh"
    devices = [int(d) for d in args.devices.split(",")]
    if max(devices) > len(jax.devices()):
        devices = [d for d in devices if d <= len(jax.devices())]
        print(f"[readiness] clamped device list to {devices} "
              f"({len(jax.devices())} visible)", flush=True)

    bsr = build_graph(args.graph, args.n_block_rows, args.block_size)
    b, nnzb = bsr.b, int(bsr.nnzb)
    nnz = bsr.nnz_inside()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((bsr.shape[1], args.dim)).astype(np.float32)
    want = spmm_scipy(bsr, x[:, :64])
    wscale = max(float(np.abs(want).max()), 1e-30)
    dt_map = {"f32": None, "bf16": jax.numpy.bfloat16,
              "int8": jax.numpy.int8}
    tol = {"f32": 1e-4, "bf16": 5e-3, "int8": 5e-2}

    print(f"[readiness] graph={args.graph} n={bsr.shape[0]} b={b} "
          f"nnzb={nnzb} dim={args.dim} backend={backend}", flush=True)

    for strat in args.strategies.split(","):
        for dt_name in args.dtypes.split(","):
            rate1 = None
            for nd in devices:
                t0 = time.time()
                mesh = make_mesh_1d(nd)
                try:
                    kw = dict(mesh=mesh, strategy=strat,
                              local_impl=args.local_impl,
                              dtype=dt_map[dt_name])
                    if dt_name == "int8":
                        kw["calibration"] = x[:2048]
                    t_plan0 = time.time()
                    plan = dist_bsr_spmm_plan(bsr, **kw)
                    plan_s = time.time() - t_plan0
                    got = np.asarray(plan(x), np.float32)[:, :64]
                    rel = float(np.abs(got - want).max() / wscale)
                    ok = rel <= tol[dt_name]
                    secs = (time_chained(plan, jax.device_put(x), iters=8)
                            if on_tpu else
                            time_synced(plan, jax.device_put(x), iters=6))
                except Exception as e:
                    print(f"[readiness] {strat} {dt_name} n={nd} FAILED: "
                          f"{type(e).__name__}: {e}", flush=True)
                    continue
                rate = nnz / secs
                if rate1 is None:
                    rate1, nd1 = rate, nd
                model = efficiency_model(
                    strat if strat != "auto" else "allgather", nd, nnzb, b,
                    bsr.shape[1], args.dim,
                    itemsize={"f32": 4, "bf16": 2, "int8": 1}[dt_name],
                    dtype_flops="bf16" if dt_name != "f32" else "f32",
                )
                rec = {
                    "kind": "readiness_matrix", "backend": backend,
                    "graph": args.graph, "strategy": strat,
                    "dtype": dt_name, "devices": nd,
                    "local_impl": args.local_impl,
                    "n": int(bsr.shape[0]), "b": b, "nnzb": nnzb,
                    "dim": args.dim, "ms": secs * 1e3,
                    "nnz_per_s": rate,
                    "retention": rate / rate1,
                    "efficiency": (rate / nd) / (rate1 / nd1),
                    "max_rel_err": rel, "tol": tol[dt_name],
                    "gate_ok": ok,
                    "plan_s": round(plan_s, 2),
                    "plan_budget_s": args.plan_budget_s,
                    "plan_ok": plan_s <= args.plan_budget_s,
                    "ici_model_efficiency": model["efficiency"],
                    "ici_model_t_comp_us": model["t_comp_us"],
                    "ici_model_t_comm_us": model["t_comm_us"],
                    "wall_s": round(time.time() - t0, 1),
                    "ts": time.time(),
                }
                with open(args.out, "a") as fh:
                    fh.write(json.dumps(rec) + "\n")
                print(f"[readiness] {strat:9s} {dt_name:4s} n={nd}: "
                      f"{rec['ms']:8.2f} ms retention={rec['retention']:.2f} "
                      f"model_eff={model['efficiency']:.2f} "
                      f"plan={plan_s:.1f}s"
                      f"{'' if rec['plan_ok'] else ' OVER-BUDGET'} "
                      f"rel={rel:.1e} {'ok' if ok else 'FAIL'}", flush=True)
                del plan
    print("[readiness] done", flush=True)


if __name__ == "__main__":
    main()
