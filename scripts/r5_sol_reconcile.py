"""Round-5 SoL re-derivation for the SHIPPED tiers (VERDICT r4 #7).

The r4 SoL rows (int8_reconcile_r4.jsonl) predate the row-group layout
that now ships (bf16 R=16 / int8 R=8, resident-dense slices); the
"70% of SoL" statements in ROUND4_NOTES were derived arithmetic. This
driver measures every headline tier at the final geometry and computes
TWO speed-of-light models per tier in the same session:

  ideal_sol_ms  — every byte moved once: real nnzb blocks + the dense
                  operand + the f32 output. The physics bound for ANY
                  schedule of this matmul on this chip.
  sched_sol_ms  — what the SHIPPED schedule actually moves, from the
                  plan's own arrays: padded slots x n_f passes of
                  blocks (the resident kernel re-streams the block list
                  per feature pass), dense once, output once per pass.

frac_of_ideal = how far from physics; frac_of_sched = how well the
kernel executes its own schedule (the gap between the two IS the
pad/multi-pass overhead VERDICT #5 targets).

Gather-kernel tiers (f32 HIGHEST, bf16x3) use the gather model the r4
reconcile used (nnzb-amplified B tiles).

Appends benchmarks/sol_reconcile_r5.jsonl.
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

OUT = "/root/repo/benchmarks/sol_reconcile_r5.jsonl"
PEAK_BF16 = 197.4e12
PEAK_INT8 = 394.8e12
HBM = 819e9
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
        _resident_f_tile,
        _rowgroup_overheads,
        _rowgroup_policy,
    )
    from spmm_denseblock_tpu.ops.bsr_spmm_pallas_int8 import (
        bsr_spmm_pallas_int8_plan,
    )

    nb, b, F, p = 1024, 128, 512, 2e-2
    bsr = random_bsr(p, nb, nb, block_size=b, seed=1234)
    rng = np.random.default_rng(1234)
    dense = rng.standard_normal((bsr.shape[1], F)).astype(np.float32)
    dense_dev = jax.device_put(dense)
    nnzb = int(bsr.nnzb)
    flops = 2.0 * nnzb * b * b * F
    oracle = bsr_spmm_xla_plan(bsr)
    want = np.asarray(oracle(dense_dev))[:, :ERR_COLS]
    scale = float(np.abs(want).max())

    def n_f_for(itemsize, plan):
        # mirror _pallas_apply's resident geometry at apply time; the
        # plan statics carry the layout (sorted tuple since r5)
        from spmm_denseblock_tpu.ops.bsr_spmm_pallas import (
            _depth_sort_overheads,
        )

        rgs = plan.statics[-1]
        f_padded = -(-F // 128) * 128
        if isinstance(rgs, tuple) and str(rgs[0]).startswith("sorted"):
            _, R, gh, W, _n_win = rgs
            ovh = _depth_sort_overheads(R, gh, b, itemsize, W)
        else:
            R, gh = _rowgroup_policy(itemsize)
            ovh = _rowgroup_overheads(R, gh, b, itemsize)
        ft = _resident_f_tile(nb, b, f_padded, itemsize, *ovh)
        return f_padded // ft, ft

    def find_blocks_leaf(plan):
        """Largest array leaf = the padded block list."""
        leaves = jax.tree_util.tree_leaves(plan.arrays)
        return max(leaves, key=lambda a: a.size)

    tiers = [
        # (name, build, kind, blk_B, dense_B, peak)
        ("f32_highest",
         lambda: bsr_spmm_pallas_plan(bsr, grad=False), "gather",
         4, 4, PEAK_BF16),
        ("bf16x3",
         lambda: bsr_spmm_pallas_plan(bsr, grad=False, precision="high"),
         "gather", 4, 4, PEAK_BF16),
        ("bf16_rowgroup",
         lambda: bsr_spmm_pallas_plan(bsr, grad=False, dtype="bfloat16"),
         "resident", 2, 2, PEAK_BF16),
        ("int8_rowgroup",
         lambda: bsr_spmm_pallas_int8_plan(bsr, calibration=dense[:4096]),
         "resident", 1, 1, PEAK_INT8),
    ]
    for name, build, kind, blk_B, dense_B, peak in tiers:
        t0 = time.time()
        plan = build()
        plan_s = time.time() - t0
        got = np.asarray(plan(dense_dev), np.float32)[:, :ERR_COLS]
        rel = float(np.abs(got - want).max() / scale)
        t = time_repeats(plan, dense_dev, repeats=3)
        ms = t["secs"] * 1e3

        out_bytes = nb * b * F * 4
        dense_bytes = nb * b * F * dense_B
        ideal = (nnzb * b * b * blk_B + dense_bytes + out_bytes) / HBM * 1e3
        if kind == "resident":
            n_f, ft = n_f_for(blk_B, plan)
            slots = int(find_blocks_leaf(plan).shape[0])
            sched_bytes = (
                slots * b * b * blk_B * n_f + dense_bytes + out_bytes * 1
            )
            extra = {"n_f": n_f, "f_tile": ft, "padded_slots": slots,
                     "pad_frac": slots / nnzb - 1.0}
        else:
            # gather model: every block's B tile fetched individually
            sched_bytes = (
                nnzb * b * b * blk_B + nnzb * b * F * dense_B + out_bytes
            )
            extra = {}
        sched = sched_bytes / HBM * 1e3
        tf = flops / t["secs"] / 1e12
        record(
            kind="sol_reconcile_r5", tier=name, layout=kind,
            layout_static=str(plan.statics[-1]), nnzb=nnzb,
            ms=ms, ms_spread=[t["secs_min"] * 1e3, t["secs_max"] * 1e3],
            spread_warn=bool(t.get("spread_warn", False)),
            tflops=tf, mfu_vs_peak=tf * 1e12 / peak,
            max_rel_err=rel, plan_s=round(plan_s, 2),
            ideal_sol_ms=ideal, frac_of_ideal=ideal / ms,
            sched_sol_ms=sched, frac_of_sched=sched / ms,
            repeats=3, **extra,
        )
        del plan


if __name__ == "__main__":
    import traceback

    try:
        main()
    except Exception:
        print(f"[sol5] FAILED: {traceback.format_exc(limit=5)}", flush=True)
        sys.exit(1)
