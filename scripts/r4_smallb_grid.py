"""Round-4 small-blockDim axis (VERDICT r3 #1 in "What's missing").

The reference's core sweep runs blockDim {2,4,8,16,32,64}
(/root/reference/benchmark.py:4-8) and its small-blockdim kernels are a
third of the rocSPARSE suite (rocsparse_bsrmm.h:192-224,
rocsparse_bsrmm_impl.h:14-313). Our design answer — repack_bsr small-b
grids into 128x128 MXU supertiles (convert/pack.py) — was implemented
and unit-tested but never chip-measured below b=32.

Grid: b in {2,4,8,16} x block-density {2e-4, 2e-3, 2e-2} x dim
{64, 512} (the reference grid's corners), two execution paths per cell:

  direct   — bsr_xla at the source b (batched small matmul + segment
             sum; the XLA analog of rocSPARSE's small-blockdim kernels)
  repack   — repack_bsr to 128-supertiles -> the auto BSR tier
             (pallas for wide operands, xla for narrow)

Matrix rows are sized PER CELL from two HBM budgets (recorded in the
artifact): the direct path's materialized gather intermediate
(nnzb*b*dim*4 bytes) and the repacked supertile array (occupied
supertiles * 128^2 * 4) — the reference's fixed 2^17 rows would need a
4.3e9-cell Bernoulli draw at b=2 and ~50 GB of supertiles at b=16 /
p=2e-2. Comparisons are within-cell (paths share the matrix), so
effective GFLOP/s uses the SOURCE nnzb*b^2*dim formula
(test_bsrmm.cu:168) for both paths: repack's zero-fill FLOPs are its
cost to amortize, not credit.

n=3 repeats, median + min/max. Appends benchmarks/smallb_grid_r4.jsonl;
the crossover feeds the auto router's small-b rule (ops/dispatch.py).
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/sdb_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

OUT = "/root/repo/benchmarks/smallb_grid_r4.jsonl"
ROWS_MAX = 32768
GATHER_SLOTS_BUDGET = 8e5   # nnzb*b <= this (gather intermediate @ F=512)
SUPERTILE_BUDGET = 8192     # occupied supertiles (x 65536 x 4 B = 2 GB)


def cell_rows(b: int, p: float) -> int:
    """Largest rows (multiple of 128) meeting both HBM budgets."""
    r1 = b * (GATHER_SLOTS_BUDGET / (p * b)) ** 0.5
    occ = 1.0 - (1.0 - p) ** ((128 // b) ** 2)  # P(supertile nonzero)
    r2 = 128.0 * (SUPERTILE_BUDGET / max(occ, 1e-9)) ** 0.5
    return max(128, int(min(ROWS_MAX, r1, r2)) // 128 * 128)


def main():
    from spmm_denseblock_tpu.bench.timing import time_repeats
    from spmm_denseblock_tpu.convert.pack import repack_bsr
    from spmm_denseblock_tpu.formats.bsr import random_bsr
    from spmm_denseblock_tpu.ops import spmm_plan

    rng = np.random.default_rng(1234)
    for b in (2, 4, 8, 16):
        for p in (2e-4, 2e-3, 2e-2):
            nb = cell_rows(b, p) // b
            bsr = random_bsr(p, nb, nb, block_size=b, seed=1234)
            rep = repack_bsr(bsr, 128)
            rep_density = rep.nnzb / (rep.n_block_rows * rep.n_block_cols)
            for dim in (64, 512):
                x = rng.standard_normal((bsr.shape[1], dim)).astype(np.float32)
                xd = jax.device_put(x)
                flops = 2.0 * bsr.nnzb * b * b * dim
                rows = {}
                for path, mat, kw in (
                    ("direct", bsr, {"impl": "bsr_xla"}),
                    ("repack128", rep, {"impl": "auto", "feat_dim": dim}),
                ):
                    t0 = time.time()
                    try:
                        plan = spmm_plan(mat, grad=False, **kw)
                        t = time_repeats(plan, xd, repeats=3, square=False)
                    except Exception as e:
                        print(f"[smallb] b={b} p={p} dim={dim} {path} "
                              f"FAILED: {type(e).__name__}: {e}", flush=True)
                        continue
                    rec = {
                        "kind": "smallb_grid", "b": b, "p": p, "dim": dim,
                        "path": path, "n": int(bsr.shape[0]),
                        "nnzb_src": int(bsr.nnzb),
                        "nnzb_repacked": int(rep.nnzb),
                        "repacked_density": rep_density,
                        "fill_amp": rep.nnzb * 128 * 128 / max(
                            bsr.nnzb * b * b, 1),
                        "ms": t["secs"] * 1e3,
                        "ms_min": t["secs_min"] * 1e3,
                        "ms_max": t["secs_max"] * 1e3, "repeats": 3,
                        "gflops_src": flops / t["secs"] / 1e9,
                        "wall_s": round(time.time() - t0, 1),
                        "ts": time.time(),
                    }
                    rows[path] = rec
                    with open(OUT, "a") as fh:
                        fh.write(json.dumps(rec) + "\n")
                    del plan
                if len(rows) == 2:
                    d, r = rows["direct"]["ms"], rows["repack128"]["ms"]
                    win = "repack128" if r < d else "direct"
                    print(f"[smallb] b={b} p={p:g} dim={dim}: direct "
                          f"{d:.2f} ms vs repack {r:.2f} ms -> {win} "
                          f"(fill_amp {rows['direct']['fill_amp']:.1f}x)",
                          flush=True)
            del bsr, rep


if __name__ == "__main__":
    import traceback

    try:
        main()
    except Exception:
        print(f"[smallb] FAILED: {traceback.format_exc(limit=5)}",
              flush=True)
        sys.exit(1)
