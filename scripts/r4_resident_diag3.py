"""Compile-time ladder for the resident-dense kernel formulations.

The 2D formulation (dense as one (K, ft) VMEM block, kernel does
pl.ds on the TILED sublane dim) hit a remote-compile wall at
K=131072: ~28 min of compiler time then `remote_compile: Broken pipe`
(benchmarks/resident_probe_r4.jsonl, resident_probe_fail row). This
ladder measures where compile time blows up and whether the 3D
formulation (dense as (nbc, b, ft), kernel indexes the UNTILED leading
dim — same contiguous memory, simpler addressing) avoids it.

Usage: one (form, nbc) cell per invocation (subprocess-safe so a hung
compile can be timeout-killed without losing the ladder):
    python r4_resident_diag3.py 3d 256
Driver mode runs the ladder with per-cell timeouts:
    python r4_resident_diag3.py ladder
"""
import functools
import json
import os
import subprocess
import sys
import time

OUT = "benchmarks/resident_compile_ladder_r4.jsonl"


def run_cell(form: str, nbc: int, ft: int = 256, group: int = 8,
             dtype_name: str = "bf16"):
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/sdb_jax_cache")
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = 128
    kp = nbc * b
    dt = {"bf16": jnp.bfloat16, "f32": jnp.float32, "int8": jnp.int8}[dtype_name]
    # tiny but real block population: 2 block-rows, `group` blocks each
    rng = np.random.default_rng(0)
    n_steps = 4
    rows = np.repeat(np.arange(2, dtype=np.int32), n_steps // 2)
    cols = rng.integers(0, nbc, size=(n_steps * group,)).astype(np.int32)
    if dtype_name == "int8":
        blocks = rng.integers(-3, 3, size=(n_steps * group, b, b)).astype(np.int8)
        dense = rng.integers(-3, 3, size=(kp, ft)).astype(np.int8)
    else:
        blocks = rng.standard_normal((n_steps * group, b, b)).astype(dt)
        dense = rng.standard_normal((kp, ft)).astype(dt)

    def kernel2d(rows_ref, cols_ref, blocks_ref, dense_ref, out_ref):
        j = pl.program_id(1)
        prev = rows_ref[jnp.maximum(j - 1, 0)]

        @pl.when(jnp.logical_or(j == 0, rows_ref[j] != prev))
        def _z():
            out_ref[:] = jnp.zeros_like(out_ref)

        acc = None
        for g in range(group):
            seg = dense_ref[pl.ds(cols_ref[j * group + g] * b, b), :]
            d = jnp.dot(
                blocks_ref[g], seg,
                preferred_element_type=jnp.int32 if dt == jnp.int8
                else jnp.float32,
            )
            acc = d if acc is None else acc + d
        out_ref[:] += acc.astype(jnp.float32)

    def kernel3d(rows_ref, cols_ref, blocks_ref, dense_ref, out_ref):
        j = pl.program_id(1)
        prev = rows_ref[jnp.maximum(j - 1, 0)]

        @pl.when(jnp.logical_or(j == 0, rows_ref[j] != prev))
        def _z():
            out_ref[:] = jnp.zeros_like(out_ref)

        acc = None
        for g in range(group):
            seg = dense_ref[cols_ref[j * group + g]]
            d = jnp.dot(
                blocks_ref[g], seg,
                preferred_element_type=jnp.int32 if dt == jnp.int8
                else jnp.float32,
            )
            acc = d if acc is None else acc + d
        out_ref[:] += acc.astype(jnp.float32)

    if form == "2d":
        dspec = pl.BlockSpec(
            (kp, ft), lambda f, j, r, c: (0, f),
            pipeline_mode=pl.Buffered(buffer_count=1),
        )
        kern, darr = kernel2d, dense
    else:
        dspec = pl.BlockSpec(
            (nbc, b, ft), lambda f, j, r, c: (0, 0, f),
            pipeline_mode=pl.Buffered(buffer_count=1),
        )
        kern, darr = kernel3d, dense.reshape(nbc, b, ft)

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1, n_steps),
        in_specs=[
            pl.BlockSpec((group, b, b), lambda f, j, r, c: (j, 0, 0)),
            dspec,
        ],
        out_specs=pl.BlockSpec((b, ft), lambda f, j, r, c: (r[j], f)),
    )
    call = pl.pallas_call(
        kern,
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((2 * b, ft), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=112 * 1024 * 1024,
        ),
    )
    t0 = time.time()
    lowered = jax.jit(call).lower(
        jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(blocks),
        jnp.asarray(darr),
    )
    t_lower = time.time() - t0
    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0
    t0 = time.time()
    out = np.asarray(compiled(
        jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(blocks),
        jnp.asarray(darr),
    ))
    t_exec = time.time() - t0
    # numpy oracle
    want = np.zeros((2 * b, ft), np.float64)
    for j in range(n_steps):
        for g in range(group):
            s = j * group + g
            want[rows[j] * b : (rows[j] + 1) * b] += (
                blocks[s].astype(np.float64)
                @ dense[cols[s] * b : (cols[s] + 1) * b].astype(np.float64)
            )
    denom = max(1e-30, np.abs(want).max())
    err = float(np.abs(out - want).max() / denom)
    rec = dict(kind="resident_compile_cell", form=form, nbc=nbc, ft=ft,
               group=group, dtype=dtype_name, lower_s=round(t_lower, 2),
               compile_s=round(t_compile, 2), exec_s=round(t_exec, 3),
               max_rel_err=err, ts=time.time())
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def ladder():
    cells = []
    for form in ("3d", "2d"):
        for nbc in (64, 256, 512, 1024):
            cells.append((form, nbc))
    for form, nbc in cells:
        # generous but bounded: compile blow-ups get killed, recorded
        tmo = 300 if nbc <= 256 else 900
        print(f"--- {form} nbc={nbc} (timeout {tmo}s)", flush=True)
        try:
            r = subprocess.run(
                [sys.executable, "-u", __file__, form, str(nbc)],
                timeout=tmo,
                env={**os.environ,
                     "PYTHONPATH": "/root/repo:/root/.axon_site"},
                capture_output=True, text=True,
            )
            tail = (r.stdout + r.stderr).strip().splitlines()
            print("\n".join(tail[-2:]), flush=True)
            ok = r.returncode == 0
        except subprocess.TimeoutExpired:
            ok = False
            rec = dict(kind="resident_compile_cell", form=form, nbc=nbc,
                       error=f"timeout>{tmo}s", ts=time.time())
            with open(OUT, "a") as f:
                f.write(json.dumps(rec) + "\n")
            print(json.dumps(rec), flush=True)
        if not ok and nbc >= 256:
            print(f"--- {form}: stopping ladder (cell failed)", flush=True)
            break


if __name__ == "__main__":
    if sys.argv[1] == "ladder":
        ladder()
    else:
        run_cell(sys.argv[1], int(sys.argv[2]),
                 *(int(x) for x in sys.argv[3:5]),
                 *(sys.argv[5:6]))
