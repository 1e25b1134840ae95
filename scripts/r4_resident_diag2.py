"""Isolate the on-chip dynamic-slice error: copy-only kernel."""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/sdb_jax_cache")
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(m):
    print(f"[{time.strftime('%T')}] {m}", flush=True)


b, nbc, ft = 32, 8, 128
kp = nbc * b
rng = np.random.default_rng(0)
dense = rng.standard_normal((kp, ft)).astype(np.float32)
cols = np.array([1, 3, 0, 7], np.int32)


def copy_kernel(cols_ref, dense_ref, out_ref):
    j = pl.program_id(0)
    out_ref[:] = dense_ref[pl.ds(cols_ref[j] * b, b), :]


gs = pltpu.PrefetchScalarGridSpec(
    num_scalar_prefetch=1,
    grid=(4,),
    in_specs=[pl.BlockSpec((kp, ft), lambda j, c: (0, 0))],
    out_specs=pl.BlockSpec((b, ft), lambda j, c: (j, 0)),
)
out = pl.pallas_call(
    copy_kernel,
    grid_spec=gs,
    out_shape=jax.ShapeDtypeStruct((4 * b, ft), jnp.float32),
)(jnp.asarray(cols), jnp.asarray(dense))
out = np.asarray(out)
for i, c in enumerate(cols):
    err = np.abs(out[i * b : (i + 1) * b] - dense[c * b : (c + 1) * b]).max()
    # where does the data actually come from?
    src = None
    for cand in range(nbc):
        if np.array_equal(out[i * b : (i + 1) * b], dense[cand * b : (cand + 1) * b]):
            src = cand
            break
    log(f"step {i}: want col {c}, err={err:.3e}, actual-matches-col={src}")
