"""On-chip conformance pass: every planner tier vs the scipy oracle on
REAL TPU hardware (the test suite runs Pallas in interpreter mode on
the CPU mesh — and the round-3 packed-bf16x3 incident proved interpret
mode can hide chip-lowering numerics bugs: exact in interpret, 1.57e-3
on silicon). This is the reference's check_result discipline
(/root/reference/check_result.cu:233-246) executed on the deployment
hardware for every tier.

Gates: f32 tiers 1e-4 (the reference eps), bf16 2e-2, bf16x3 1e-4,
int8 5e-2 (quantization envelope). Appends
benchmarks/chip_conformance_r3.jsonl; exits 1 on any gate failure.
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
import scipy.sparse as sp

OUT = "/root/repo/benchmarks/chip_conformance_r3.jsonl"


def main():
    from spmm_denseblock_tpu.formats.csr import CSR
    from spmm_denseblock_tpu.ops import spmm_plan, spmm_scipy

    rng = np.random.default_rng(7)
    a = sp.random(2048, 2048, density=0.01, random_state=7, format="csr")
    a.data[:] = rng.standard_normal(a.nnz).astype(np.float32)
    csr = CSR.from_scipy(a)
    x = rng.standard_normal((2048, 136)).astype(np.float32)  # ragged F
    want = spmm_scipy(csr, x)
    cal = rng.standard_normal((4096, 136)).astype(np.float32)
    scale = np.abs(want).max()

    cases = [
        ("csr_xla", dict(), 1e-4),
        ("csr_pallas", dict(), 1e-4),
        ("csr_ell", dict(), 1e-4),
        ("csr_ell", dict(compact="force", compact_slots=4096), 1e-4),
        ("csr_ell", dict(dtype=jnp.bfloat16), 2e-2),
        ("csr_ell_int8", dict(calibration=cal), 5e-2),
        ("bcoo", dict(), 1e-4),
        ("bsr_xla", dict(), 1e-4),
        ("bsr_pallas", dict(), 1e-4),
        ("bsr_pallas", dict(precision="high"), 1e-4),
        ("bsr_pallas", dict(dtype=jnp.bfloat16), 2e-2),
        ("bsr_pallas", dict(group=8), 1e-4),
        ("bsr_int8", dict(calibration=cal), 5e-2),
        ("bsr_int8_pallas", dict(calibration=cal), 5e-2),
        ("bsr_int8_pallas", dict(calibration=cal, group=8), 5e-2),
        ("hybrid", dict(), 1e-4),
        ("hybrid_int8", dict(calibration=cal), 5e-2),
        ("windowed", dict(), 1e-4),
        ("windowed_int8", dict(calibration=cal), 5e-2),
        ("dense", dict(), 1e-4),
        ("auto", dict(), 1e-4),
        ("auto", dict(dtype=jnp.int8, calibration=cal), 5e-2),
    ]
    failures = []
    for impl, kw, eps in cases:
        label = impl + ("" if not kw else ":" + ",".join(sorted(
            k if not hasattr(v, "dtype") and not isinstance(v, np.ndarray)
            else k for k, v in kw.items())))
        try:
            kw2 = dict(kw)
            if impl.startswith("bsr") or impl in ("hybrid", "hybrid_int8",
                                                  "windowed", "windowed_int8",
                                                  "auto", "dense"):
                plan = spmm_plan(csr, impl=impl, block_size=128, **kw2)
            else:
                plan = spmm_plan(csr, impl=impl, **kw2)
            got = np.asarray(plan(x), np.float32)
            rel = float(np.abs(got - want).max() / scale)
            ok = rel <= eps
        except Exception as e:
            rel, ok = None, False
            label += f" ERROR {type(e).__name__}: {e}"
        rec = {"kind": "chip_conformance", "impl": impl,
               "kwargs": sorted(kw), "eps": eps, "max_rel_err": rel,
               "pass": ok, "ts": time.time()}
        with open(OUT, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        print(f"[conf] {label}: rel={rel} "
              f"{'OK' if ok else 'FAIL'}", flush=True)
        if not ok:
            failures.append(label)
    if failures:
        print(f"[conf] FAILURES: {failures}", flush=True)
        sys.exit(1)
    print("[conf] all tiers pass on chip", flush=True)


if __name__ == "__main__":
    main()
