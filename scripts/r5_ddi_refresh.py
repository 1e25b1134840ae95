"""Round-5 ddi serving refresh: the r4 dataset-matrix ddi rows
(auto 0.29-0.42 ms) predate the depth-sorted schedule; ddi's 34x34
block grid is fully occupied (34 real blocks/row — deep rows, the
sorted schedule's best regime), so the end-user auto route should
show the gain. 3 orderings x auto, 3 repeats. Appends
benchmarks/dataset_matrix_r5.jsonl."""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/sdb_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

OUT = "/root/repo/benchmarks/dataset_matrix_r5.jsonl"


def main():
    from spmm_denseblock_tpu.bench.timing import time_repeats
    from spmm_denseblock_tpu.io.datasets import dataset_provenance, load_dataset
    from spmm_denseblock_tpu.ops import spmm_plan, spmm_scipy
    from spmm_denseblock_tpu.reorder.registry import reorder_cached

    csr = load_dataset("ogbl-ddi", scale=1.0)
    rng = np.random.default_rng(1234)
    x = rng.standard_normal((csr.n_cols, 128)).astype(np.float32)
    x_dev = jax.device_put(x)
    for ordering in ("original", "rcmk", "rabbit"):
        rcsr = csr if ordering == "original" else reorder_cached(
            csr, ordering, cache_dir="/root/repo/tmp", tag="ogbl_ddi"
        )[0]
        want = spmm_scipy(rcsr, x)[:, :64]
        scale = max(float(np.abs(want).max()), 1e-30)
        t0 = time.time()
        plan = spmm_plan(rcsr, impl="auto", dtype=jnp.bfloat16,
                         grad=False, feat_dim=128)
        plan_s = time.time() - t0
        got = np.asarray(plan(x_dev), np.float32)[:, :64]
        rel = float(np.abs(got - want).max() / scale)
        t = time_repeats(plan, x_dev, repeats=3)
        rec = {
            "kind": "dataset_matrix", "dataset": "ogbl-ddi",
            "strategy": ordering, "impl": "auto", "dim": 128,
            "dtype": "bfloat16", "n": csr.n_rows, "nnz": csr.nnz,
            "ms": t["secs"] * 1e3,
            "ms_spread": [t["secs_min"] * 1e3, t["secs_max"] * 1e3],
            "spread_warn": bool(t.get("spread_warn", False)),
            "max_rel_err": rel, "gate_ok": rel < 5e-3,
            "plan_s": round(plan_s, 2), "repeats": 3,
            "prev_r4_ms": {"original": 0.329, "rcmk": 0.312,
                           "rabbit": 0.293}[ordering],
            "source": dataset_provenance("ogbl-ddi"),
            "ts": time.time(),
        }
        with open(OUT, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        print(json.dumps({k: v for k, v in rec.items() if k != "ts"}),
              flush=True)
        del plan


if __name__ == "__main__":
    import traceback

    try:
        main()
    except Exception:
        print(f"[ddi5] FAILED: {traceback.format_exc(limit=6)}", flush=True)
        sys.exit(1)
