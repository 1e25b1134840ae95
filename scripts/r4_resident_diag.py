"""Staged diagnostic for the resident-dense kernel compile hang."""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/sdb_jax_cache")
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

stage = sys.argv[1] if len(sys.argv) > 1 else "all"


def log(msg):
    print(f"[{time.strftime('%T')}] {msg}", flush=True)


log(f"backend={jax.default_backend()} devices={jax.devices()}")

if stage in ("health", "all"):
    t0 = time.time()
    x = jnp.ones((256, 256))
    y = float(jnp.sum(jax.jit(lambda a: a @ a)(x)))
    log(f"health: trivial jit matmul ok in {time.time()-t0:.1f}s sum={y}")

b, nbc, ft = 32, 8, 128
kp = nbc * b
rng = np.random.default_rng(0)
dense = rng.standard_normal((kp, ft)).astype(np.float32)
blocks = rng.standard_normal((4, b, b)).astype(np.float32)
cols = np.array([1, 3, 0, 7], np.int32)
rows = np.array([0, 0, 1, 2], np.int32)
want = np.zeros((3 * b, ft), np.float32)
for r, c, blk in zip(rows, cols, blocks):
    want[r * b : (r + 1) * b] += blk @ dense[c * b : (c + 1) * b]


def run(label, pipeline_mode, dynamic):
    def kernel(rows_ref, cols_ref, blocks_ref, dense_ref, out_ref):
        j = pl.program_id(0)
        prev = rows_ref[jnp.maximum(j - 1, 0)]

        @pl.when(jnp.logical_or(j == 0, rows_ref[j] != prev))
        def _z():
            out_ref[:] = jnp.zeros_like(out_ref)

        if dynamic:
            seg = dense_ref[pl.ds(cols_ref[j] * b, b), :]
        else:
            seg = dense_ref[0:b, :]
        out_ref[:] += jnp.dot(
            blocks_ref[0], seg, preferred_element_type=jnp.float32
        )

    spec = pl.BlockSpec(
        (kp, ft), lambda j, r, c: (0, 0), pipeline_mode=pipeline_mode
    )
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(4,),
        in_specs=[pl.BlockSpec((1, b, b), lambda j, r, c: (j, 0, 0)), spec],
        out_specs=pl.BlockSpec((b, ft), lambda j, r, c: (r[j], 0)),
    )
    t0 = time.time()
    out = pl.pallas_call(
        kernel,
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((3 * b, ft), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(blocks),
      jnp.asarray(dense))
    out = np.asarray(out)
    if dynamic:
        err = np.abs(out - want).max()
    else:
        err = -1.0
    log(f"{label}: ok in {time.time()-t0:.1f}s err={err:.2e}")


if stage in ("static", "all"):
    run("static-slice, no buffered", None, dynamic=False)
if stage in ("dynamic", "all"):
    run("dynamic-slice, no buffered", None, dynamic=True)
if stage in ("buffered", "all"):
    run("dynamic-slice, Buffered(1)", pl.Buffered(buffer_count=1), dynamic=True)
log("done")
