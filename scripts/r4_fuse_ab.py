"""Round-4 per-family eager-vs-fused dispatch A/B (VERDICT r3 #1).

Round 3 proved eager pre-ops (pad/astype dispatched outside the kernel
jit) cost ~1.3 ms of relay round-trip each — 22% on the int8 BSR tier
(benchmarks/int8_dist_anomaly_r3.jsonl) — and fused 2 of ~12 plan
families. Round 4 fused ALL of them (every module-level apply is now
jitted with static statics). This driver measures, per family, the
plan as shipped (fused) against the pre-fuse form reconstructed
generically via apply_fn.__wrapped__ (the unjitted apply body calling
the same inner jitted device fns — exactly the old dispatch pattern).

n=3 repeats with median + min/max per row (VERDICT r3 #3: ~10%
relay-day variance; single-run conclusions at <=10% margins are not
conclusions). Appends benchmarks/fuse_ab_r4.jsonl.

Reference match: the reference times pure kernel inside its hot loop
(/root/reference/run_csrmm.cu:120-159) — post-fuse, so do we.
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

OUT = "/root/repo/benchmarks/fuse_ab_r4.jsonl"


def eager_fn(plan):
    """Pre-fuse dispatch reconstruction: the apply body runs eagerly
    (per-pre-op dispatches + one inner jit dispatch), arrays/statics
    identical. Inner sub-plans (hybrid/chunked) stay fused — this
    isolates the marginal dispatch cost of THIS level, which is what
    the fuse pass removed."""
    base = plan.apply_fn.__wrapped__
    statics, arrays = plan.statics, plan.arrays
    return lambda x: base(statics, arrays, x)


def ab_row(name, plan, x, extra=None, flops=None):
    from spmm_denseblock_tpu.bench.timing import time_repeats

    xd = jax.device_put(x)
    rows = []
    for form, fn in (("fused", plan), ("eager", eager_fn(plan))):
        t = time_repeats(fn, xd, repeats=3)
        rec = {
            "kind": "fuse_ab", "family": name, "form": form,
            "ms": t["secs"] * 1e3, "ms_min": t["secs_min"] * 1e3,
            "ms_max": t["secs_max"] * 1e3, "repeats": t["repeats"],
            "ts": time.time(),
        }
        if flops:
            rec["tflops"] = flops / t["secs"] / 1e12
        if extra:
            rec.update(extra)
        rows.append(rec)
        with open(OUT, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
    f_ms, e_ms = rows[0]["ms"], rows[1]["ms"]
    print(f"[fuse-ab] {name}: fused {f_ms:.3f} ms vs eager {e_ms:.3f} ms "
          f"({(e_ms - f_ms) / e_ms * 100:+.1f}% saved)", flush=True)
    return rows


def main():
    from spmm_denseblock_tpu.formats.bsr import random_bsr
    from spmm_denseblock_tpu.io.datasets import load_dataset
    from spmm_denseblock_tpu.ops import spmm_plan
    from spmm_denseblock_tpu.reorder.registry import reorder_cached

    rng = np.random.default_rng(1234)

    # --- headline synthetic BSR shapes (test_bsrmm grid densest point) --
    nb, b, f, p = 1024, 128, 512, 2e-2
    bsr = random_bsr(p, nb, nb, block_size=b, seed=1234)
    xw = rng.standard_normal((bsr.shape[1], f)).astype(np.float32)
    flops = 2.0 * bsr.nnzb * b * b * f
    shape_tag = {"n": bsr.shape[0], "b": b, "dim": f, "nnzb": int(bsr.nnzb)}

    for impl, kw in [
        ("bsr_pallas", {}),                      # fused in r3 — control
        ("bsr_pallas", {"dtype": jnp.bfloat16}),
        ("bsr_xla", {}),
        ("bsr_int8", {"calibration": xw[:4096]}),
        ("bsr_int8_pallas", {"calibration": xw[:4096]}),  # r3 control
    ]:
        name = impl + ("_bf16" if kw.get("dtype") is not None else "")
        plan = spmm_plan(bsr, impl=impl, grad=False, **kw)
        ab_row(name, plan, xw, extra=shape_tag, flops=flops)
        del plan

    # transb combinator (fused transpose vs eager .T + plan)
    from spmm_denseblock_tpu.ops.plan import transb_plan

    for dim in (128, 512):
        xt = np.ascontiguousarray(
            rng.standard_normal((bsr.shape[1], dim)).astype(np.float32).T
        )
        pt = transb_plan(spmm_plan(bsr, impl="bsr_pallas", grad=False))
        ab_row(f"transb_dim{dim}", pt, xt,
               extra={**shape_tag, "dim": dim},
               flops=2.0 * bsr.nnzb * b * b * dim)
        del pt

    # --- real-graph families on synthetic ogbn-arxiv + rabbit ----------
    csr = load_dataset("ogbn-arxiv", scale=1.0)
    rcsr, _ = reorder_cached(csr, "rabbit", cache_dir="/root/repo/tmp",
                             tag="ogbn_arxiv")
    dim = 128
    xg = rng.standard_normal((rcsr.n_cols, dim)).astype(np.float32)
    gflops = 2.0 * csr.nnz * dim
    gtag = {"dataset": "ogbn-arxiv", "strategy": "rabbit", "dim": dim,
            "nnz": int(csr.nnz)}

    for name, impl, kw in [
        ("csr_ell", "csr_ell", {}),
        ("csr_ell_bf16", "csr_ell", {"dtype": jnp.bfloat16}),
        ("csr_ell_int8", "csr_ell_int8", {"calibration": xg[:4096]}),
        ("csr_xla", "csr_xla", {}),
        ("csr_pallas", "csr_pallas", {}),
        ("windowed", "windowed", {}),
        ("windowed_int8", "windowed_int8", {"calibration": xg[:4096]}),
        ("hybrid", "hybrid", {"block_size": 128}),
        ("banded", "csr_ell_banded", {"band_rows": 1 << 16}),
    ]:
        try:
            plan = spmm_plan(rcsr, impl=impl, grad=False, **kw)
            ab_row(name, plan, xg, extra=gtag, flops=gflops)
            del plan
        except Exception as e:
            print(f"[fuse-ab] {name} FAILED: {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    import traceback

    try:
        main()
    except Exception:
        print(f"[fuse-ab] FAILED: {traceback.format_exc(limit=5)}",
              flush=True)
        sys.exit(1)
