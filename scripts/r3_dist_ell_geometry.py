"""Dist-ELL compaction at the realistic stripe geometry (round-3 item).

VERDICT r2 #5: the per-stripe-chunk two-level gathers
(parallel/spmm._ell_layout_stripes, compact=) were oracle-tested only on
toy shapes; validate them on the 8-device CPU mesh at the deployment
geometry from BASELINE.md — 98,304 rows PER STRIPE (786k rows total on
8 stripes), products-like degree, rabbit-reordered so chunk spans have
real community locality.

CPU-mesh rules (BASELINE.md): this validates correctness, layout
invariants, and that the program compiles/executes at production stripe
sizes — never ICI efficiency. Appends one JSONL record to
benchmarks/dist_ell_geometry_r3.jsonl.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")  # NEVER touch the chip (relay rule)

import numpy as np  # noqa: E402

OUT = "/root/repo/benchmarks/dist_ell_geometry_r3.jsonl"


def main():
    from spmm_denseblock_tpu.io.datasets import synthetic_powerlaw
    from spmm_denseblock_tpu.ops.reference import spmm_scipy
    from spmm_denseblock_tpu.parallel import make_mesh_1d
    from spmm_denseblock_tpu.parallel.spmm import (
        _ell_layout_stripes,
        dist_csr_spmm_plan,
    )
    from spmm_denseblock_tpu.reorder import permutate
    from spmm_denseblock_tpu.reorder.registry import STRATEGIES

    n_dev = 8
    rows_per = 98_304
    n = n_dev * rows_per  # 786,432
    avg_deg = 25
    t0 = time.perf_counter()
    csr = synthetic_powerlaw(n, n * avg_deg, seed=7)
    perm = STRATEGIES["rabbit"](csr)
    csr = permutate(perm, csr)
    t_build = time.perf_counter() - t0
    print(f"graph: n={n} nnz={csr.nnz} build+rabbit {t_build:.0f}s", flush=True)

    mesh = make_mesh_1d(n_dev)
    rec = {
        "kind": "dist_ell_geometry",
        "n_devices": n_dev,
        "rows_per_stripe": rows_per,
        "n_rows": int(csr.shape[0]),
        "nnz": int(csr.nnz),
        "reorder": "rabbit",
        "backend": "cpu-mesh",
    }

    # 1) layout-only at the deployment shape (bf16, F=128): what does
    # compact="auto" choose with the real byte-rate model?
    t0 = time.perf_counter()
    idx, _, _, layout, _, uniq = _ell_layout_stripes(
        csr, n_dev, compact="auto", itemsize=2, feat_dim=128
    )
    t_layout = time.perf_counter() - t0
    S_comp = sum(m * K for m, K, u in layout if u)
    U_comp = sum(u for _, _, u in layout if u)
    rec["auto_bf16_f128"] = {
        "chunks": len(layout),
        "compacted_chunks": sum(1 for _, _, u in layout if u),
        "slots": int(sum(m * K for m, K, _ in layout)),
        "compacted_slots": int(S_comp),
        "uniq_capacity": int(U_comp),
        "u_over_s": float(U_comp / S_comp) if S_comp else None,
        "layout_s": round(t_layout, 1),
    }
    print("auto layout (bf16,F=128):", rec["auto_bf16_f128"], flush=True)

    # 2) executable oracle check at stripe geometry, compact=force so the
    # two-level path runs even where the CPU-host table is already small
    f_dim = 32
    rng = np.random.default_rng(0)
    dense = rng.standard_normal((csr.shape[1], f_dim)).astype(np.float32)
    t0 = time.perf_counter()
    plan = dist_csr_spmm_plan(
        csr, mesh=mesh, compact="force", feat_dim=f_dim
    )
    t_plan = time.perf_counter() - t0
    t0 = time.perf_counter()
    got = np.asarray(plan(dense))
    t_run = time.perf_counter() - t0
    want = spmm_scipy(csr, dense)
    rel = float(
        np.linalg.norm(got - want) / max(np.linalg.norm(want), 1e-30)
    )
    rec["force_f32_exec"] = {
        "feat_dim": f_dim,
        "plan_s": round(t_plan, 1),
        "first_run_s": round(t_run, 1),
        "rel_err": rel,
    }
    print("force exec:", rec["force_f32_exec"], flush=True)
    assert rel < 1e-5, rel

    # 3) int8 + compact end to end (the serving stack on the same mesh)
    t0 = time.perf_counter()
    plan8 = dist_csr_spmm_plan(
        csr, mesh=mesh, compact="force", feat_dim=f_dim, dtype="int8",
        calibration=dense,
    )
    got8 = np.asarray(plan8(dense))
    rel8 = float(
        np.linalg.norm(got8 - want) / max(np.linalg.norm(want), 1e-30)
    )
    rec["force_int8_exec"] = {
        "plan_plus_run_s": round(time.perf_counter() - t0, 1),
        "rel_err": rel8,
    }
    print("int8 exec:", rec["force_int8_exec"], flush=True)
    assert rel8 < 5e-2, rel8

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    main()
