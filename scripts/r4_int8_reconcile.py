"""Round-4 int8 story reconciliation (VERDICT r3 #2).

Round 3 left four int8 numbers coexisting — 58.6 (G=8 calibrated,
pre-fuse group AB), 62.2 (ROUND3_NOTES), 75.4 (dist-wrapped, pre-fuse),
81.4 TF/s (BENCH_r03 headline, post-fuse) — with no artifact confirming
the fuse explains the spread, and no SoL row saying what fraction of
the int8 bandwidth ceiling any of them is. This driver measures, in ONE
process, post-fuse, with 3 repeats each (median + min/max):

  1. headline tiers exactly as bench.py builds them: f32 HIGHEST,
     bf16x3 (precision="high"), bf16, int8 calibrated (G auto/4/8) and
     int8 dynamic;
  2. the dist-allgather-wrapped int8 plan on the 1-device mesh (the
     round-3 anomaly config) — recorded to completion this time
     (ADVICE r3: the r3 jsonl kept only rep 0 of 3);
  3. a dtype-specific SoL model per tier: HBM bytes with the real
     itemsize per term (int8 blocks/table 1B, bf16 2B, bf16x3 reads
     hi+lo bf16 = 4B per operand element across its 3 passes, f32 4B;
     output f32 4B always), so each row carries frac_of_sol — the
     MFU/SoL fields VERDICT r3 found missing for int8/bf16x3.

Appends benchmarks/int8_reconcile_r4.jsonl. Reference match: the tier
being out-engineered is the rocSPARSE BSR suite
(/root/reference/rocsparse_bsrmm.h:102-256).
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

OUT = "/root/repo/benchmarks/int8_reconcile_r4.jsonl"
PEAK_BF16 = 197.4e12
PEAK_INT8 = 394.8e12  # v5e int8 MXU = 2x bf16
HBM = 819e9
ERR_COLS = 128


def sol_ms(nnzb, nb, b, f, blk_bytes, tbl_bytes):
    """Bandwidth speed-of-light for the flat kernel's three HBM terms:
    blocks + gathered B tiles (nnzb-amplified) + f32 output."""
    total = nnzb * b * b * blk_bytes + nnzb * b * f * tbl_bytes + nb * b * f * 4
    return total / HBM * 1e3, total


def main():
    from spmm_denseblock_tpu.bench.timing import time_repeats
    from spmm_denseblock_tpu.formats.bsr import random_bsr
    from spmm_denseblock_tpu.ops import (
        bsr_spmm_pallas_plan,
        bsr_spmm_xla_plan,
    )
    from spmm_denseblock_tpu.ops.bsr_spmm_pallas_int8 import (
        bsr_spmm_pallas_int8_plan,
    )
    from spmm_denseblock_tpu.parallel import dist_bsr_spmm_plan, make_mesh_1d

    nb, b, f, p = 1024, 128, 512, 2e-2
    bsr = random_bsr(p, nb, nb, block_size=b, seed=1234)
    rng = np.random.default_rng(1234)
    dense = rng.standard_normal((bsr.shape[1], f)).astype(np.float32)
    dense_dev = jax.device_put(dense)
    nnzb = int(bsr.nnzb)
    flops = 2.0 * nnzb * b * b * f
    oracle = bsr_spmm_xla_plan(bsr)
    want = np.asarray(oracle(dense_dev))[:, :ERR_COLS]
    scale = float(np.abs(want).max())
    mesh = make_mesh_1d(1)

    # (tier, plan builder, blocks/table itemsize for SoL, MXU peak)
    tiers = [
        ("f32_highest",
         lambda: bsr_spmm_pallas_plan(bsr, grad=False), 4, 4, PEAK_BF16),
        ("bf16x3",
         lambda: bsr_spmm_pallas_plan(bsr, grad=False, precision="high"),
         4, 4, PEAK_BF16),  # hi+lo bf16 = 4B/elem over the 3 passes
        ("bf16",
         lambda: bsr_spmm_pallas_plan(bsr, grad=False, dtype="bfloat16"),
         2, 2, PEAK_BF16),
        ("int8_cal_gauto",
         lambda: bsr_spmm_pallas_int8_plan(bsr, calibration=dense[:4096]),
         1, 1, PEAK_INT8),
        ("int8_cal_g4",
         lambda: bsr_spmm_pallas_int8_plan(bsr, calibration=dense[:4096],
                                           group=4), 1, 1, PEAK_INT8),
        ("int8_cal_g8",
         lambda: bsr_spmm_pallas_int8_plan(bsr, calibration=dense[:4096],
                                           group=8), 1, 1, PEAK_INT8),
        ("int8_dynamic",
         lambda: bsr_spmm_pallas_int8_plan(bsr), 1, 1, PEAK_INT8),
        ("int8_dist_allgather",
         lambda: dist_bsr_spmm_plan(
             bsr, mesh=mesh, strategy="allgather", local_impl="pallas",
             dtype=jnp.int8, calibration=dense[:4096]), 1, 1, PEAK_INT8),
    ]

    for name, build, blk_B, tbl_B, peak in tiers:
        t0 = time.time()
        plan = build()
        got = np.asarray(plan(dense_dev), np.float32)[:, :ERR_COLS]
        rel = float(np.abs(got - want).max() / scale)
        t = time_repeats(plan, dense_dev, repeats=3, square=False)
        s_ms, s_bytes = sol_ms(nnzb, nb, b, f, blk_B, tbl_B)
        tf = flops / t["secs"] / 1e12
        rec = {
            "kind": "int8_reconcile", "tier": name, "nnzb": nnzb,
            "ms": t["secs"] * 1e3, "ms_min": t["secs_min"] * 1e3,
            "ms_max": t["secs_max"] * 1e3, "repeats": 3,
            "tflops": tf, "max_rel_err": rel,
            "mfu_vs_peak": tf * 1e12 / peak,
            "sol_ms": s_ms, "sol_bytes": s_bytes,
            "frac_of_sol": s_ms / (t["secs"] * 1e3),
            "achieved_gbps": s_bytes / t["secs"] / 1e9,
            "wall_s": round(time.time() - t0, 1), "ts": time.time(),
        }
        with open(OUT, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        print(f"[i8rec] {name}: {rec['ms']:.2f} ms "
              f"[{rec['ms_min']:.2f},{rec['ms_max']:.2f}] {tf:.1f} TF/s "
              f"({rec['frac_of_sol']*100:.0f}% of SoL, rel {rel:.1e})",
              flush=True)
        del plan


if __name__ == "__main__":
    import traceback

    try:
        main()
    except Exception:
        print(f"[i8rec] FAILED: {traceback.format_exc(limit=5)}",
              flush=True)
        sys.exit(1)
