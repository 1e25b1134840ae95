"""Two-level (unique-compacted) ELL gather: chip probe + full A/B.

The open hardware question (ROUND2_NOTES banded post-mortem): does a
gather from a freshly MATERIALIZED compact temp run at the measured
small-table rate, or only gathers from standalone input buffers? The
pre-harness-fix optimization_barrier probe suggested temps stay slow,
but that probe is suspect (the `_mix` underflow let the relay dedupe
chains). This script settles it:

  --probe  synthetic microbench at exact products geometry
           (2.45M x 128 bf16 table):
             control   flat gather+sum of 1.05M slots  (~8.4 ns/slot)
             two-level sub=take(table, uniq 360k); gather 1.05M local
                       slots from sub (+ sum)
             barrier   same with optimization_barrier(sub) — isolates
                       whether XLA folds vs the temp genuinely being
                       fast to gather from
  --full   full synthetic ogbn-products csr_ell bf16 compact=auto vs
           the 1297.8 ms quarter+scan incumbent (appends to
           benchmarks/tpu_v5e_fullscale_r2.jsonl)

Model says two-level wins ~1.40x at compact_slots=1M (modeled
scripts/r2_twolevel_predict.py, U/S=0.36).
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

OUT = "/root/repo/benchmarks/tpu_v5e_twolevel.jsonl"
N_ROWS, F = 2_449_029, 128
M, K = 21_845, 48  # 1.048M slots — the products mid-class chunk shape
U = 360_000


def emit(rec):
    rec["ts"] = time.time()
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def _time_carry(fn, table, iters=8, k=6):
    """Chained marginal-cost timing with a scalar carry: the big bf16
    table stays one fixed device buffer (re-mixing it per call would
    either underflow in bf16 — the relay-dedupe hazard — or add a
    1.9 GB cast per call), while a varying f32 scalar derived from the
    previous output makes every call a distinct, data-dependent node.
    Ends with a scalar readback (the only true barrier via the relay)."""
    s = jnp.float32(1.0)
    float(jnp.sum(fn(table, s)[:1], dtype=jnp.float32))  # warm

    def chain(n):
        sc = jnp.float32(1.0)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(table, sc)
            sc = 1e-6 * jnp.sum(out[:4], dtype=jnp.float32)
        float(sc)
        return time.perf_counter() - t0

    t1, t2 = chain(iters), chain(k * iters)
    return max(t2 - t1, 1e-9) / ((k - 1) * iters)


def probe():
    rng = np.random.default_rng(7)
    table = jnp.asarray(
        rng.standard_normal((N_ROWS, F)).astype(np.float32),
        dtype=jnp.bfloat16,
    )
    uniq = np.sort(rng.choice(N_ROWS, U, replace=False)).astype(np.int32)
    local = rng.integers(0, U, size=(M, K)).astype(np.int32)
    flat_idx = uniq[local]  # control gathers the same physical rows
    # global control: indices over the WHOLE table — the incumbent's
    # true rate anchor, in case the per-index cost tracks the working
    # set rather than the table size (the "clustered" probe said table
    # size, but it predates the _mix fix)
    glob_idx = rng.integers(0, N_ROWS, size=M * K).astype(np.int32)
    uniq_d, local_d, flat_d, glob_d = map(
        jnp.asarray, (uniq, local, flat_idx, glob_idx)
    )

    @jax.jit
    def control_global(x, s):
        g = jnp.take(x, glob_d, axis=0)
        return g.reshape(M, K, F).sum(axis=1, dtype=jnp.float32) + s

    @jax.jit
    def control(x, s):
        g = jnp.take(x, flat_d.reshape(-1), axis=0)
        return g.reshape(M, K, F).sum(axis=1, dtype=jnp.float32) + s

    @jax.jit
    def twolevel(x, s):
        sub = jnp.take(x, uniq_d, axis=0)
        g = jnp.take(sub, local_d.reshape(-1), axis=0)
        return g.reshape(M, K, F).sum(axis=1, dtype=jnp.float32) + s

    @jax.jit
    def twolevel_barrier(x, s):
        sub = jax.lax.optimization_barrier(jnp.take(x, uniq_d, axis=0))
        g = jnp.take(sub, local_d.reshape(-1), axis=0)
        return g.reshape(M, K, F).sum(axis=1, dtype=jnp.float32) + s

    # correctness cross-check once
    z = jnp.float32(0.0)
    a = np.asarray(control(table, z), np.float32)
    b = np.asarray(twolevel(table, z), np.float32)
    assert np.allclose(a, b, atol=1e-2), np.abs(a - b).max()

    for name, fn in (("control_global", control_global),
                     ("control_flat", control), ("twolevel", twolevel),
                     ("twolevel_barrier", twolevel_barrier)):
        secs = _time_carry(fn, table)
        emit({
            "kind": "twolevel_probe", "variant": name, "slots": M * K,
            "uniq": U, "ms": secs * 1e3,
            "ns_per_slot": secs * 1e9 / (M * K),
        })


def full():
    from spmm_denseblock_tpu.bench.harness import _dense_operand, _time
    from spmm_denseblock_tpu.io.datasets import (
        dataset_provenance,
        graph_stats,
        load_dataset,
    )
    from spmm_denseblock_tpu.ops import spmm_plan
    from spmm_denseblock_tpu.reorder.registry import reorder_cached

    if "--int8" in sys.argv:
        # int8 sub-tables sit deep in the fast regime (360k rows x 128
        # x 1 B = 46 MB) even when the full int8 table (314 MB) does not
        jobs = [("ogbn-products", "csr_ell_int8", "int8", 1 << 20)]
    else:
        jobs = [
            # incumbent 1297.8 ms (quarter+scan bf16); modeled 1.40x
            ("ogbn-products", "csr_ell", "bf16", 1 << 20),
            # ppa incumbent 457.5 ms (auto); f32 compaction restores
            # the fast rate AND the 1e-4 gate (U/S 0.21 at 2M spans ->
            # modeled ratio U/S + 2.6/11.5 = 0.44)
            ("ogbl-ppa", "csr_ell", "f32", 1 << 21),
            ("ogbl-ppa", "csr_ell", "bf16", 1 << 21),
        ]
    for dataset, impl, dt, compact_slots in jobs:
        t0 = time.time()
        csr = load_dataset(dataset, scale=1.0)
        rcsr, _ = reorder_cached(csr, "rabbit", cache_dir="/root/repo/tmp",
                                 tag=dataset.replace("-", "_"))
        x = _dense_operand(rcsr.n_cols, F)
        kw = {}
        if impl == "csr_ell_int8":
            kw["calibration"] = _dense_operand(rcsr.n_cols, F, seed=999)
        else:
            kw["grad"] = False
            if dt == "bf16":
                kw["dtype"] = jnp.bfloat16
        plan = spmm_plan(rcsr, impl=impl, bucket="quarter", reduce="auto",
                         compact="auto", compact_slots=compact_slots, **kw)
        secs = _time(plan, x)
        rec = {
            "kind": "graph", "dataset": dataset,
            "strategy": "rabbit", "dim": F, "impl": impl,
            "compact": "auto", "compact_slots": compact_slots,
            "dtype": dt, "scale": 1.0, "n": csr.n_rows,
            "nnz": csr.nnz, "ms": secs * 1e3,
            "nnz_per_s": csr.nnz / secs,
            "source": dataset_provenance(dataset),
            "graph_stats": graph_stats(csr, sample=500),
            "wall_s": round(time.time() - t0, 1),
        }
        with open("/root/repo/benchmarks/tpu_v5e_fullscale_r2.jsonl", "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"[twolevel-full] {dataset} {impl} {dt} compact=auto"
              f"@{compact_slots}: {rec['ms']:.1f} ms", flush=True)
        del plan, x, rcsr, csr


if __name__ == "__main__":
    import traceback

    try:
        if "--full" in sys.argv:
            full()
        else:
            probe()
    except Exception:
        print(f"[twolevel] FAILED: {traceback.format_exc(limit=5)}",
              flush=True)
        sys.exit(1)
