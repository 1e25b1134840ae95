"""Round-4 bf16 kernel-gap apportionment (VERDICT r3 #6).

Round 3 measured the headline bf16 flat kernel at 50.1 TF/s = 64% of
its modeled 3.65 GB/call bandwidth SoL and ATTRIBUTED the missing 36%
to "DMA latency on random gathers" with no evidence. This driver
replaces the conjecture with measurements:

  1. attempts a real jax.profiler trace at the headline shape (the
     relay may not support device tracing — if no trace files appear
     that is recorded as the negative);
  2. surgically apportions the gap with shape-identical kernel
     ablations — same grid, same block count, same f_tile, only the
     gather INDEX STREAM changes:
       random   — the headline matrix (baseline);
       sorted   — block cols sorted within each row (ascending DMA
                  addresses; kills randomness, keeps uniqueness);
       same-col — every slot points at block-col 0 (Mosaic re-issues a
                  buffer's B-tile DMA only on index change, so gather
                  traffic collapses to ~one tile per buffer): the
                  kernel's non-gather floor.
     gap(random vs sorted)  = DMA randomness cost;
     gap(sorted vs same-col) = gather volume cost;
     same-col ms            = grid/scalar/MXU+output floor.
  3. the f_tile x group interaction hinted by mfu_breakdown_r3
     (g8/f256 = 40.3 TF/s): f_tile {256, 512} x G {4, 8, 16}.

n=3 repeats everywhere. Appends benchmarks/bf16_gap_r4.jsonl.
"""

import glob
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/sdb_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

OUT = "/root/repo/benchmarks/bf16_gap_r4.jsonl"
TRACE_DIR = "/root/repo/benchmarks/traces/bf16_headline"
PEAK_BF16 = 197.4e12
HBM = 819e9


def emit(rec):
    rec["ts"] = time.time()
    with open(OUT, "a") as fh:
        fh.write(json.dumps(rec) + "\n")
    print(f"[bf16gap] {json.dumps(rec)[:220]}", flush=True)


def main():
    from spmm_denseblock_tpu.bench.timing import time_repeats
    from spmm_denseblock_tpu.formats.bsr import BSR, random_bsr
    from spmm_denseblock_tpu.ops import bsr_spmm_pallas_plan

    nb, b, f, p = 1024, 128, 512, 2e-2
    bsr = random_bsr(p, nb, nb, block_size=b, seed=1234)
    rng = np.random.default_rng(1234)
    dense = jax.device_put(
        rng.standard_normal((bsr.shape[1], f)).astype(np.float32)
    )
    nnzb = int(bsr.nnzb)
    flops = 2.0 * nnzb * b * b * f
    bytes_total = nnzb * b * b * 2 + nnzb * b * f * 2 + nb * b * f * 4
    sol_ms = bytes_total / HBM * 1e3

    rows = np.asarray(bsr.block_rows[:nnzb])
    cols = np.asarray(bsr.block_cols[:nnzb])
    blocks = np.asarray(bsr.blocks[:nnzb])

    def variant(name, cols_v):
        m = BSR.from_parts(rows, cols_v.astype(np.int32), blocks,
                           bsr.shape, b)
        plan = bsr_spmm_pallas_plan(m, dtype=jnp.bfloat16, grad=False,
                                    group=8)
        t = time_repeats(plan, dense, repeats=3, square=True)
        tf = flops / t["secs"] / 1e12
        emit({
            "kind": "bf16_gap_ablation", "variant": name, "nnzb": nnzb,
            "group": 8, "f_tile": 512, "ms": t["secs"] * 1e3,
            "ms_min": t["secs_min"] * 1e3, "ms_max": t["secs_max"] * 1e3,
            "repeats": 3, "tflops": tf, "mfu": tf * 1e12 / PEAK_BF16,
            "model_sol_ms": sol_ms,
            "frac_of_sol": sol_ms / (t["secs"] * 1e3),
        })
        del plan, m
        return t["secs"] * 1e3

    # 1) trace attempt (record the outcome either way)
    try:
        plan = bsr_spmm_pallas_plan(bsr, dtype=jnp.bfloat16, grad=False,
                                    group=8)
        x = plan(dense)  # warm
        float(jnp.sum(x))
        with jax.profiler.trace(TRACE_DIR):
            y = plan(dense)
            for _ in range(4):
                y = plan(y * jnp.float32(1e-2))
            float(jnp.sum(y))
        files = glob.glob(TRACE_DIR + "/**/*", recursive=True)
        has_device = any("xplane" in fn or fn.endswith(".pb")
                         for fn in files)
        emit({"kind": "bf16_gap_trace", "trace_dir": TRACE_DIR,
              "n_files": len(files), "device_plane": bool(has_device),
              "note": ("trace captured" if has_device else
                       "profiler produced no device plane through the "
                       "axon relay — recorded negative; ablations below "
                       "carry the apportionment")})
        del plan
    except Exception as e:
        emit({"kind": "bf16_gap_trace", "error": f"{type(e).__name__}: {e}",
              "note": "jax.profiler unsupported through the relay "
                      "(recorded negative)"})

    # 2) index-stream ablations (shape-identical)
    ms_rand = variant("random", cols)
    order = np.lexsort((cols, rows))
    ms_sort = variant("sorted_cols", cols[order])  # rows already sorted
    ms_same = variant("same_col", np.zeros_like(cols))
    emit({
        "kind": "bf16_gap_apportionment",
        "ms_random": ms_rand, "ms_sorted": ms_sort, "ms_samecol": ms_same,
        "model_sol_ms": sol_ms,
        "dma_randomness_ms": ms_rand - ms_sort,
        "gather_volume_ms": ms_sort - ms_same,
        "non_gather_floor_ms": ms_same,
        "note": ("random-sorted = DMA randomness; sorted-samecol = "
                 "gather volume (unique-tile DMAs); same_col = grid/"
                 "scalar/MXU/output floor (gather traffic ~one tile "
                 "per buffer)"),
    })

    # 3) f_tile x group interaction
    for ft in (256, 512):
        for g in (4, 8, 16):
            plan = bsr_spmm_pallas_plan(bsr, dtype=jnp.bfloat16,
                                        grad=False, group=g, f_tile=ft)
            t = time_repeats(plan, dense, repeats=3, square=True)
            tf = flops / t["secs"] / 1e12
            emit({"kind": "bf16_gap_ftile", "f_tile": ft, "group": g,
                  "ms": t["secs"] * 1e3, "ms_min": t["secs_min"] * 1e3,
                  "ms_max": t["secs_max"] * 1e3, "repeats": 3,
                  "tflops": tf, "mfu": tf * 1e12 / PEAK_BF16,
                  "frac_of_sol": sol_ms / (t["secs"] * 1e3)})
            del plan


if __name__ == "__main__":
    import traceback

    try:
        main()
    except Exception:
        print(f"[bf16gap] FAILED: {traceback.format_exc(limit=5)}",
              flush=True)
        sys.exit(1)
