"""Round-5 overlap probe: is the depth-sorted bf16 kernel serializing
its block-stream DMA against the MXU?

Arithmetic at the shipped geometry (gh4/W128, ft=256, n_f=2): block
stream 1.56 GB -> 1.9 ms of DMA; MXU 2.03 ms. Perfect overlap would
run at max(~2.4 ms incl dense/out, 2.03) ~= 2.4 ms; measured is
4.31-4.67 ms ~= the SUM — suggesting the (G, b, b) block pipeline is
not double-buffering against the dots (VMEM pressure, or Mosaic
serializing the revisited-output accumulation).

Cells (same kernel, same layout, one knob each):
  blocks_buf2 / blocks_buf4 — explicit pl.Buffered counts on the block
      stream (default pipelining is implementation-defined);
  ft128 — diagnostic: n_f=4 doubles block-stream bytes vs ft=256; if
      DMA overlaps, time should barely move (MXU-bound); if serial,
      time grows by the extra ~1.9 ms of DMA.

Appends benchmarks/kernel_probe_r5.jsonl.
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

OUT = "/root/repo/benchmarks/kernel_probe_r5.jsonl"
ERR_COLS = 128


def record(**kw):
    kw["ts"] = time.time()
    with open(OUT, "a") as fh:
        fh.write(json.dumps(kw) + "\n")
    print(json.dumps({k: v for k, v in kw.items() if k != "ts"}),
          flush=True)


@functools.partial(
    jax.jit,
    static_argnames=("n_windows", "window", "n_rows", "f_tile", "gh", "R",
                     "blocks_buf"),
)
def _probe_call(win_ids, pos, slot_cols, blocks, dense, n_windows, window,
                n_rows, f_tile, gh, R, blocks_buf):
    from spmm_denseblock_tpu.ops.bsr_spmm_pallas import (
        _rowgroup_sorted_kernel,
    )

    n_slots, b, _ = blocks.shape
    G = R * gh
    n_steps = n_slots // G
    nbc, b2, f_padded = dense.shape
    grid = (f_padded // f_tile, n_steps)
    blocks_spec = pl.BlockSpec(
        (G, b, b), lambda f, j, w, p, c: (j, 0, 0),
        pipeline_mode=(
            pl.Buffered(buffer_count=blocks_buf) if blocks_buf else None
        ),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=[
            blocks_spec,
            pl.BlockSpec(
                (nbc, b, f_tile), lambda f, j, w, p, c: (0, 0, f),
                pipeline_mode=pl.Buffered(buffer_count=1),
            ),
        ],
        out_specs=pl.BlockSpec(
            (window, b, f_tile), lambda f, j, w, p, c: (w[j], 0, f)
        ),
    )
    out = pl.pallas_call(
        functools.partial(
            _rowgroup_sorted_kernel, gh=gh, R=R,
            precision=jax.lax.Precision.DEFAULT,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_windows * window, b, f_padded), jnp.float32
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=121 * 1024 * 1024,
        ),
    )(win_ids, pos, slot_cols, blocks, dense)
    return out.reshape(n_windows * window * b, f_padded)[:n_rows]


def main():
    from spmm_denseblock_tpu.bench.timing import time_repeats
    from spmm_denseblock_tpu.formats.bsr import random_bsr
    from spmm_denseblock_tpu.ops import bsr_spmm_xla_plan
    from spmm_denseblock_tpu.ops.bsr_spmm_pallas import (
        _ensure_covering,
        _pack_rowgroups_sorted,
    )

    nb, b, F, p = 1024, 128, 512, 2e-2
    R, gh, W = 16, 4, 128
    bsr = random_bsr(p, nb, nb, block_size=b, seed=1234)
    rng = np.random.default_rng(1234)
    dense = rng.standard_normal((bsr.shape[1], F)).astype(np.float32)
    dense_dev = jax.device_put(dense.astype(jnp.bfloat16))
    want = np.asarray(
        bsr_spmm_xla_plan(bsr)(jax.device_put(dense))
    )[:, :ERR_COLS]
    scale = float(np.abs(want).max())
    flops = 2.0 * bsr.nnzb * b * b * F

    covered = _ensure_covering(bsr)
    rows_h = np.asarray(covered.block_rows[: covered.nnzb])
    cols_h = np.asarray(covered.block_cols[: covered.nnzb])
    blocks_h = np.asarray(covered.blocks[: covered.nnzb])
    win, pos, cols, bpad, n_win = _pack_rowgroups_sorted(
        rows_h, cols_h, blocks_h, gh, R, W
    )
    args_base = (jnp.asarray(win), jnp.asarray(pos), jnp.asarray(cols),
                 jnp.asarray(bpad.astype(jnp.bfloat16)))
    K = covered.n_block_cols * b
    n_rows = bsr.shape[0]

    for label, ft, buf in (
        ("bf16_blocks_bufdefault_ft256", 256, 0),
        ("bf16_blocks_buf2_ft256", 256, 2),
        ("bf16_blocks_buf4_ft256", 256, 4),
        ("bf16_blocks_bufdefault_ft128", 128, 0),
    ):
        try:
            fn = lambda x, _ft=ft, _buf=buf: _probe_call(
                *args_base, x.reshape(K // b, b, F), n_win, W, n_rows,
                _ft, gh, R, _buf,
            )
            got = np.asarray(fn(dense_dev), np.float32)[:, :ERR_COLS]
            rel = float(np.abs(got - want).max() / scale)
            t = time_repeats(fn, dense_dev, repeats=3)
            record(
                kind="kernel_probe", label=label, ms=t["secs"] * 1e3,
                ms_spread=[t["secs_min"] * 1e3, t["secs_max"] * 1e3],
                spread_warn=bool(t.get("spread_warn", False)),
                tflops=flops / t["secs"] / 1e12, max_rel_err=rel,
                gate_ok=rel < 5e-3, repeats=3,
            )
        except Exception as e:
            record(kind="kernel_probe", label=label,
                   error=f"{type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    import traceback

    try:
        main()
    except Exception:
        print(f"[oprobe] FAILED: {traceback.format_exc(limit=8)}", flush=True)
        sys.exit(1)
