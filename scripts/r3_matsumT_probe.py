"""matsum-vs-matsumT orientation probe (the proteins hybrid wrinkle).

Round-3 revalidation measured proteins hybrid thr=0.02 at 103.6-103.7
ms vs round 2's 91.5 (three consistent runs). The storage change
between: c5b1809 stores matsum chunks with m > K TRANSPOSED ((K, m),
reduce axis 0 — "matsumT") to dodge the R1-relayout compile hazard.
products (scan mode, always transposed) did NOT regress, pointing at
the matsum orientation specifically.

Times, at proteins-remainder-like shapes on the real chip:
  matsum   gather (m, K, F) from idx (m, K), sum axis 1
  matsumT  gather (K, m, F) from idx (K, m), sum axis 0
  matsumT+devT  param stored (K, m), transposed ON DEVICE back to
  (m, K) before the gather (keeps the compile-safe param layout,
  pays one int32 transpose whose lane pad is ceil(K/128)*128/K)

Appends benchmarks/matsumT_probe_r3.jsonl.
"""

import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/sdb_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

OUT = "/root/repo/benchmarks/matsumT_probe_r3.jsonl"


@functools.partial(jax.jit, static_argnames=("variant",))
def _run(idx, dense, variant):
    # NO internal bf16 cast: the chain's 1e-12 perturbation underflows
    # in bf16 and the relay dedupes the bit-identical calls (first run
    # of this probe measured the 1e-9 floor everywhere — the _mix trap
    # re-materialized through the cast). f32 gathers keep the same
    # small-table regime (68 MB < 96 MB) and the comparison is
    # orientation-relative anyway.
    if variant == "matsum":
        g = jnp.take(dense, idx, axis=0)  # (m, K, F)
        return g.sum(axis=1, dtype=jnp.float32)
    if variant == "matsumT":
        g = jnp.take(dense, idx, axis=0)  # (K, m, F)
        return g.sum(axis=0, dtype=jnp.float32)
    # matsumT_devT: param arrives (K, m), gather in the fast orientation
    g = jnp.take(dense, idx.T, axis=0)  # (m, K, F)
    return g.sum(axis=1, dtype=jnp.float32)


def main():
    from spmm_denseblock_tpu.bench.timing import time_chained

    rng = np.random.default_rng(0)
    n_src, F = 132544, 128  # proteins-scale source table (f32: 68 MB)
    dense = jax.device_put(
        rng.standard_normal((n_src, F)).astype(np.float32)
    )
    # m*K = 4M slots, the production CHUNK_SLOTS bound (the gather
    # intermediate is (m, K, F) — 1 GB at bf16 F=128)
    for m, K in ((1 << 16, 64), (1 << 14, 256), (1 << 18, 16)):
        idx_mk = rng.integers(0, n_src, size=(m, K), dtype=np.int32)
        for variant in ("matsum", "matsumT", "matsumT_devT"):
            arr = idx_mk if variant == "matsum" else np.ascontiguousarray(
                idx_mk.T
            )
            idx = jax.device_put(jnp.asarray(arr))
            fn = functools.partial(_run, variant=variant)
            # chain on dense? dense is positional arg 2; chain on idx is
            # meaningless. Wrap so the timed callable takes dense.
            f = functools.partial(
                lambda d, i, v: _run(i, d, variant=v), i=idx, v=variant
            )
            secs = time_chained(f, dense, iters=8)
            ns_per_slot = secs / (m * K) * 1e9
            rec = {"kind": "matsumT_probe", "m": m, "K": K,
                   "variant": variant, "ms": secs * 1e3,
                   "ns_per_slot": ns_per_slot, "ts": time.time()}
            with open(OUT, "a") as fh:
                fh.write(json.dumps(rec) + "\n")
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    import traceback

    try:
        main()
    except Exception:
        print(f"[matsumT-probe] FAILED: {traceback.format_exc(limit=5)}",
              flush=True)
        sys.exit(1)
