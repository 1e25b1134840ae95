"""bf16 MFU step-cost breakdown on the headline shape (VERDICT r2 #2).

Either push past 35% MFU or prove the floor. The accounting (done
host-side here, printed with each measurement):

  headline shape: 2^17 square, b=128, block-p 2e-2 (nnzb ~20.7k), F=512
  flops           = 2 * nnzb * b^2 * F                  = 0.347 PF
  HBM bytes/call  = blocks (nnzb*b^2*2, bf16)
                  + gathered B tiles (nnzb*b*F*2)  <- 20x amplification:
                    every block fetches its (b,F) B tile; the unique
                    table is only n_bc*b*F*2
                  + output (n_br*b*F*4, one flush per row tile)
  SoL(ms)         = bytes / 819 GB/s; MXU time = flops / 197 TF/s.

If SoL_bandwidth >> MXU time, the kernel is gather-amplification-bound
and the MFU ceiling is flops/SoL — no schedule change inside the flat
design can pass it; only column-reuse tiling (which pays output
revisits) could, and the arithmetic for that is printed too.

Measures: bf16 x G {2,4,8} x f_tile {256, 512}; appends
benchmarks/mfu_breakdown_r3.jsonl.
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

OUT = "/root/repo/benchmarks/mfu_breakdown_r3.jsonl"
PEAK_BF16 = 197.4e12
HBM = 819e9


def main():
    from spmm_denseblock_tpu.bench.timing import time_chained_square
    from spmm_denseblock_tpu.formats.bsr import random_bsr
    from spmm_denseblock_tpu.ops import bsr_spmm_pallas_plan

    nb, b, f, p = 1024, 128, 512, 2e-2
    bsr = random_bsr(p, nb, nb, block_size=b, seed=1234)
    rng = np.random.default_rng(1234)
    dense = jax.device_put(
        rng.standard_normal((bsr.shape[1], f)).astype(np.float32)
    )
    nnzb = bsr.nnzb
    flops = 2.0 * nnzb * b * b * f

    # the three HBM terms (bf16 blocks/table, f32 out)
    bytes_blocks = nnzb * b * b * 2
    bytes_gather = nnzb * b * f * 2
    bytes_unique = nb * b * f * 2
    bytes_out = nb * b * f * 4
    total = bytes_blocks + bytes_gather + bytes_out
    sol_ms = total / HBM * 1e3
    mxu_ms = flops / PEAK_BF16 * 1e3
    print(f"[model] flops={flops/1e12:.3f} TF  bytes={total/1e9:.2f} GB "
          f"(blocks {bytes_blocks/1e9:.2f} + gather {bytes_gather/1e9:.2f} "
          f"[unique {bytes_unique/1e9:.2f}, amp "
          f"{bytes_gather/bytes_unique:.1f}x] + out {bytes_out/1e9:.2f})",
          flush=True)
    print(f"[model] SoL(bandwidth)={sol_ms:.2f} ms -> "
          f"{flops/(sol_ms/1e3)/1e12:.1f} TF/s ceiling "
          f"({flops/(sol_ms/1e3)/PEAK_BF16*100:.1f}% MFU); "
          f"MXU-only={mxu_ms:.2f} ms", flush=True)

    best = None
    for f_tile in (256, 512):
        for group in (2, 4, 8):
            t0 = time.time()
            plan = bsr_spmm_pallas_plan(
                bsr, dtype=jnp.bfloat16, grad=False, group=group,
                f_tile=f_tile,
            )
            secs = time_chained_square(plan, dense, iters=10)
            tflops = flops / secs / 1e12
            rec = {
                "kind": "mfu_breakdown", "dtype": "bf16",
                "group": group, "f_tile": f_tile, "nnzb": int(nnzb),
                "ms": secs * 1e3, "tflops": tflops,
                "mfu": tflops * 1e12 / PEAK_BF16,
                "frac_of_bandwidth_sol": (secs * 1e3) and sol_ms / (secs * 1e3),
                "model_sol_ms": sol_ms,
                "wall_s": round(time.time() - t0, 1),
            }
            with open(OUT, "a") as fh:
                fh.write(json.dumps(rec) + "\n")
            print(f"[mfu] G={group} f_tile={f_tile}: {rec['ms']:.2f} ms "
                  f"{tflops:.1f} TF/s ({rec['mfu']*100:.1f}% MFU, "
                  f"{rec['frac_of_bandwidth_sol']*100:.0f}% of SoL)",
                  flush=True)
            if best is None or rec["ms"] < best["ms"]:
                best = rec
            del plan
    print(f"[mfu] best: G={best['group']} f_tile={best['f_tile']} "
          f"{best['tflops']:.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
