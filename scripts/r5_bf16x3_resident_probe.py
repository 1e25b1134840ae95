"""Round-5: does the depth-sorted layout flip the bf16x3-residency
negative?

The r4 negative ("f32/bf16x3 residency loses: 4-byte slices force
ft=128 = 4 f-passes, and the 4x block re-read outweighs the gather
savings") was measured on the 64.7%-padded consecutive layout:
34048 slots x 16 KB x 4 passes ~= 8.9 GB of block stream — a wash vs
the 8.6 ms gather schedule. The depth-sorted pack cut slots to 23872
(15.5% pad): 6.26 GB — if the kernel holds its usual
fraction-of-schedule, sorted-resident bf16x3 should land ~8-9 ms vs
the 11.2 ms gather tier, improving the HEADLINE metric (bench.py's
vs_baseline is the bf16x3 tier).

Cells: bf16x3 sorted-resident (ft=128, precision_name="high") vs the
shipping gather tier, plus f32-HIGHEST sorted-resident for
completeness. Oracle-gated. Appends benchmarks/kernel_probe_r5.jsonl.
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

OUT = "/root/repo/benchmarks/kernel_probe_r5.jsonl"
ERR_COLS = 128


def record(**kw):
    kw["ts"] = time.time()
    with open(OUT, "a") as fh:
        fh.write(json.dumps(kw) + "\n")
    print(json.dumps({k: v for k, v in kw.items() if k != "ts"}),
          flush=True)


def main():
    from spmm_denseblock_tpu.bench.timing import time_repeats
    from spmm_denseblock_tpu.formats.bsr import random_bsr
    from spmm_denseblock_tpu.ops import bsr_spmm_pallas_plan, bsr_spmm_xla_plan
    from spmm_denseblock_tpu.ops.bsr_spmm_pallas import (
        _ensure_covering,
        _pack_rowgroups_sorted,
        _pallas_spmm_rowgroup_sorted,
    )

    nb, b, F, p = 1024, 128, 512, 2e-2
    R, gh, W = 16, 4, 128
    bsr = random_bsr(p, nb, nb, block_size=b, seed=1234)
    rng = np.random.default_rng(1234)
    dense = rng.standard_normal((bsr.shape[1], F)).astype(np.float32)
    dense_dev = jax.device_put(dense)
    want = np.asarray(
        bsr_spmm_xla_plan(bsr)(dense_dev)
    )[:, :ERR_COLS]
    scale = float(np.abs(want).max())
    flops = 2.0 * bsr.nnzb * b * b * F

    covered = _ensure_covering(bsr)
    rows_h = np.asarray(covered.block_rows[: covered.nnzb])
    cols_h = np.asarray(covered.block_cols[: covered.nnzb])
    blocks_h = np.asarray(covered.blocks[: covered.nnzb], np.float32)
    win, pos, cols, bpad, n_win = _pack_rowgroups_sorted(
        rows_h, cols_h, blocks_h, gh, R, W
    )
    K = covered.n_block_cols * b
    n_rows = bsr.shape[0]
    args = (jnp.asarray(win), jnp.asarray(pos), jnp.asarray(cols),
            jnp.asarray(bpad))

    # baselines: the shipping gather tiers (same session)
    for label, kw, tol in (
        ("bf16x3_gather_ship",
         dict(grad=False, precision="high"), 1e-4),
        ("f32_highest_gather_ship", dict(grad=False), 1e-4),
    ):
        plan = bsr_spmm_pallas_plan(bsr, **kw)
        got = np.asarray(plan(dense_dev), np.float32)[:, :ERR_COLS]
        rel = float(np.abs(got - want).max() / scale)
        t = time_repeats(plan, dense_dev, repeats=3)
        record(kind="kernel_probe", label=label, ms=t["secs"] * 1e3,
               ms_spread=[t["secs_min"] * 1e3, t["secs_max"] * 1e3],
               spread_warn=bool(t.get("spread_warn", False)),
               tflops=flops / t["secs"] / 1e12, max_rel_err=rel,
               gate_ok=rel < tol, repeats=3)
        del plan

    for label, prec, tol in (
        ("bf16x3_sorted_resident_ft128", "high", 1e-4),
        ("f32_highest_sorted_resident_ft128", None, 1e-4),
    ):
        try:
            @jax.jit
            def apply(w, po, c, bl, x, _prec=prec):
                return _pallas_spmm_rowgroup_sorted(
                    w, po, c, bl, x.reshape(K // b, b, F),
                    n_win, W, n_rows, 128, gh, R, False, _prec,
                )

            got = np.asarray(
                apply(*args, dense_dev), np.float32
            )[:, :ERR_COLS]
            rel = float(np.abs(got - want).max() / scale)
            fn = lambda x: apply(*args, x)
            t = time_repeats(fn, dense_dev, repeats=3)
            record(kind="kernel_probe", label=label, ms=t["secs"] * 1e3,
                   ms_spread=[t["secs_min"] * 1e3, t["secs_max"] * 1e3],
                   spread_warn=bool(t.get("spread_warn", False)),
                   tflops=flops / t["secs"] / 1e12, max_rel_err=rel,
                   gate_ok=rel < tol, repeats=3)
        except Exception as e:
            record(kind="kernel_probe", label=label,
                   error=f"{type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    import traceback

    try:
        main()
    except Exception:
        print(f"[x3res] FAILED: {traceback.format_exc(limit=8)}", flush=True)
        sys.exit(1)
