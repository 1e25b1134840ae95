"""Microbenchmark: XLA TPU gather per-index rate vs source-table size.

Round-2 full-scale runs put full-products csr_ell at 2355 ms f32 =
~13 ns/slot, 2.3x the 5.7 ns/index rate measured on proteins-sized
tables (ROUND2_NOTES "gather-floor answer"). Hypothesis: the per-index
rate of XLA's TPU row-gather degrades with source-table size (HBM page
locality), so the products number may already be near its real floor.

Measures: random row-gather + K-axis sum (the exact ELL inner shape) at
fixed slot count, sweeping the source-table row count 128k -> 2.45M,
f32 and bf16, plus a clustered-index variant (indices sorted in windows,
modeling rabbit locality). One JSONL per point ->
benchmarks/tpu_v5e_gather_floor.jsonl.
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

from spmm_denseblock_tpu.bench.timing import time_chained

OUT = "/root/repo/benchmarks/tpu_v5e_gather_floor.jsonl"
F = 128
SLOTS = 4 << 20   # one csr_ell CHUNK_SLOTS worth of gather per call —
                  # the (slots, F) f32 intermediate stays ~2 GB; 32M
                  # slots OOM'd the chip at compile (16 GB HLO temp)
K = 64            # products' dominant class


def run(n_rows, dtype, clustered, variant):
    rng = np.random.default_rng(0)
    idx = rng.integers(0, n_rows, size=SLOTS, dtype=np.int32)
    if clustered:
        # model rabbit locality: sort indices within 64k-slot windows
        w = min(1 << 16, idx.size)
        idx = idx[: (SLOTS // w) * w].reshape(-1, w)
        idx = np.sort(idx, axis=1).reshape(-1)
    m = idx.size // K
    idx = idx[: m * K]
    table = jnp.asarray(
        rng.standard_normal((n_rows, F)).astype(np.float32)
    ).astype(dtype)

    if variant == "matsum":  # the shipping csr_ell formulation
        idx_d = jnp.asarray(idx)

        @jax.jit
        def step(idx_d, table):
            g = jnp.take(table, idx_d, axis=0)
            return g.reshape(m, K, F).sum(axis=1, dtype=jnp.float32)

    elif variant.startswith("banded"):
        # variant forms: banded / banded_copy / banded@18 (W=2^18) —
        # probing whether the fast/slow boundary is the band's BYTE
        # size (~128 vs 256 MB) rather than its row count
        # the banded-ELL hypothesis: per-index cost tracks the SOURCE
        # RANGE, not the logical table — slice a 2^19-row band out of
        # the big table, gather inside it. If this runs at the 524288-row
        # rate (2.5-4 ns vs 8.4-11.5 full-table), a banded-ELL layout
        # (rows bucketed by home band under rabbit locality) is worth
        # ~3x on products-scale remainders.
        wbits = int(variant.split("@")[1]) if "@" in variant else 19
        W = min(n_rows, 1 << wbits)
        idx = idx % W  # in-band offsets
        m = idx.size // K
        idx_d = jnp.asarray(idx[: m * K])
        start = (n_rows - W) // 2

        copy = "copy" in variant

        @jax.jit
        def step(idx_d, table):
            band = jax.lax.dynamic_slice_in_dim(table, start, W, axis=0)
            if copy:
                # force a real (W, F) copy — otherwise XLA folds the
                # slice into the gather and the operand is still the
                # full table (banded-view measured 11.74 ns/idx, no
                # better than unbanded)
                band = jax.lax.optimization_barrier(band)
            g = jnp.take(band, idx_d, axis=0)
            return g.reshape(m, K, F).sum(axis=1, dtype=jnp.float32)

    elif variant == "banded5":
        # diagnosis for the banded-ELL miss (full plan 1488 ms vs the
        # single-band probe's 2.8-4.5 ns/idx): cycle FIVE different
        # 2^19-row bands inside one program, one matsum chunk each —
        # does the fast rate survive multi-band cycling?
        W = min(n_rows, 1 << 19)
        idx = idx % W
        m = idx.size // K
        idx_d = jnp.asarray(idx[: m * K])
        starts = tuple(
            int(s) for s in np.linspace(0, max(0, n_rows - W), 5).astype(int)
        )
        mc = m // 5

        @jax.jit
        def step(idx_d, table):
            outs = []
            for i, s in enumerate(starts):
                band = jax.lax.dynamic_slice_in_dim(table, s, W, axis=0)
                part = jax.lax.dynamic_slice_in_dim(
                    idx_d, i * mc * K, mc * K
                )
                g = jnp.take(band, part, axis=0)
                outs.append(
                    g.reshape(mc, K, F).sum(axis=1, dtype=jnp.float32)
                )
            return jnp.concatenate(outs, axis=0)

    elif variant == "scan":  # K fused gather+add passes, no (m,K,F)
        idx_km = jnp.asarray(idx.reshape(m, K).T.copy())  # (K, m)

        @jax.jit
        def step(idx_d, table):
            def body(acc, ik):
                return acc + jnp.take(table, ik, axis=0).astype(
                    jnp.float32
                ), None
            acc0 = jnp.zeros((m, F), jnp.float32)
            return jax.lax.scan(body, acc0, idx_d)[0]

        idx_d = idx_km
    else:
        raise ValueError(variant)

    secs = time_chained(lambda t: step(idx_d, t), table, iters=5)
    ns_per_idx = secs * 1e9 / idx.size
    rec = {
        "kind": "gather_floor", "variant": variant, "n_rows": int(n_rows),
        "table_mb": round(n_rows * F * table.dtype.itemsize / 2**20, 1),
        "dtype": str(table.dtype), "clustered": bool(clustered),
        "slots": int(idx.size), "K": K, "F": F,
        "ms": secs * 1e3, "ns_per_idx": round(ns_per_idx, 3),
        "idx_per_s": idx.size / secs,
    }
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(f"[gather-floor] {variant:>6} rows={n_rows:>8} "
          f"{str(table.dtype):>9} clustered={clustered}: "
          f"{ns_per_idx:6.2f} ns/idx ({secs*1e3:7.1f} ms)", flush=True)


if __name__ == "__main__":
    t0 = time.time()
    if len(sys.argv) > 1 and sys.argv[1] == "banded":
        for variant in ("banded", "banded_copy"):
            for dtype in (jnp.float32, jnp.bfloat16):
                run(2449029, dtype, False, variant)
    elif len(sys.argv) > 1 and sys.argv[1] == "banded5":
        run(2449029, jnp.bfloat16, False, "banded5")
        run(2449029, jnp.bfloat16, False, "banded")  # same-session control
    elif len(sys.argv) > 1 and sys.argv[1] == "bandwidth":
        # byte-boundary probe: f32 at 2^17/2^18 bands (64/128 MB),
        # bf16 at 2^20 (256 MB) — is the boundary bytes or rows?
        run(2449029, jnp.float32, False, "banded@18")
        run(2449029, jnp.float32, False, "banded@17")
        run(2449029, jnp.bfloat16, False, "banded@20")
        run(2449029, jnp.bfloat16, False, "banded@18")
    else:
        for n_rows in (1 << 17, 1 << 19, 2449029):
            for dtype in (jnp.float32, jnp.bfloat16):
                for clustered in (False, True):
                    for variant in ("matsum", "scan"):
                        run(n_rows, dtype, clustered, variant)
    print(f"[gather-floor] done in {time.time()-t0:.0f}s", flush=True)
