"""Isolate the int8 row-group hardware numerics anomaly.

Known: bf16 row-groups are bitwise-exact on chip INCLUDING R=4
(resident_probe_r4.jsonl: bf16_g32_p4 rel 0.0); the int8 row-group
twin at R=4/gh=32 (variant int8_g32_p4) returns rel ~24 garbage on
chip while interpret-exact. First diag pass (R=2, gh=32): v_full /
v_nocs / v_noscales_nocs / v_noscales_cs ALL exact — so neither the
SMEM scales nor the cs operand is toxic at G=64. Second pass pins the
axis: R=4 repro + two discriminators:

  r4g32_*   — the failing shape (G=128), toggles
  r2g64     — SAME G=128 but two lanes (slots/step vs lane structure)
  r4g16     — R=4 at G=64 (lane count at the known-good slot count)

Reference: the known-good single-row resident int8 kernel on the SAME
inputs (exact on chip, resident_probe_r4.jsonl). All comparisons are
on-device scalars. One process, one claim.
"""

import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/sdb_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from claim_guard import claim_or_exit
from r4_resident_probe_lite import (
    headline_structure, pack_indices, pack_rowgroups,
)
from spmm_denseblock_tpu.ops.bsr_spmm_pallas_int8 import (
    _pallas_int8_spmm_resident,
)

OUT = "/root/repo/benchmarks/int8_rowgroup_diag_r4.jsonl"


def _kernel(groups_ref, cols_ref, scales_ref, blocks_ref, *rest,
            group_half, R, use_scales, use_cs):
    if use_cs:
        cs_ref, dense_ref, out_ref = rest
    else:
        dense_ref, out_ref = rest
        cs_ref = None
    b = blocks_ref.shape[1]
    G = R * group_half
    j = pl.program_id(1)
    prev = groups_ref[jnp.maximum(j - 1, 0)]

    @pl.when(jnp.logical_or(j == 0, groups_ref[j] != prev))
    def _zero():
        out_ref[:] = jnp.zeros_like(out_ref)

    for lane in range(R):
        acc = None
        for g in range(lane * group_half, (lane + 1) * group_half):
            d = jnp.dot(
                blocks_ref[g], dense_ref[cols_ref[j * G + g]],
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            if use_scales:
                d = scales_ref[j * G + g] * d
            acc = d if acc is None else acc + d
        if cs_ref is not None:
            acc = acc * cs_ref[0, :]
        out_ref[lane * b:(lane + 1) * b, :] += acc


@functools.partial(
    jax.jit,
    static_argnames=("n_groups", "n_rows", "ft", "gh", "R",
                     "use_scales", "use_cs"),
)
def _rg_int8(sp, sc, scales, qb, qd3, cs, n_groups, n_rows, ft, gh, R,
             use_scales, use_cs):
    n_slots, b, _ = qb.shape
    G = R * gh
    n_steps = n_slots // G
    nbc, _, f_padded = qd3.shape
    in_specs = [pl.BlockSpec((G, b, b), lambda f, j, p, c, s: (j, 0, 0))]
    args = [sp, sc, scales, qb]
    if use_cs:
        in_specs.append(
            pl.BlockSpec((1, ft), lambda f, j, p, c, s: (0, f))
        )
        args.append(cs.reshape(1, -1))
    in_specs.append(pl.BlockSpec(
        (nbc, b, ft), lambda f, j, p, c, s: (0, 0, f),
        pipeline_mode=pl.Buffered(buffer_count=1),
    ))
    args.append(qd3)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(f_padded // ft, n_steps),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (R * b, ft), lambda f, j, p, c, s: (p[j], f)
        ),
    )
    return pl.pallas_call(
        functools.partial(_kernel, group_half=gh, R=R,
                          use_scales=use_scales, use_cs=use_cs),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_groups * R * b, f_padded),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=112 * 1024 * 1024,
        ),
    )(*args)[:n_rows]


def main():
    claim_or_exit(lambda m: print(f"[i8diag] {m}", flush=True))
    rows, cols, nb, b = headline_structure()
    nnzb = rows.size
    F = 512
    K = nb * b
    key = jax.random.PRNGKey(1234)
    kb, kd = jax.random.split(key)

    def slot_map(dest, ns):
        s2b = np.full(ns, nnzb, np.int32)
        s2b[dest] = np.arange(nnzb, dtype=np.int32)
        return jnp.asarray(s2b)

    @jax.jit
    def build(s2b):
        flat = jax.random.normal(kb, (nnzb + 1, b, b), jnp.float32)
        flat = flat.at[nnzb].set(0.0)
        pad = jnp.take(flat, s2b, axis=0)
        absmax = jnp.max(jnp.abs(pad), axis=(1, 2))
        scales = jnp.where(absmax > 0, absmax / 127.0, 1.0)
        q = jnp.clip(jnp.round(pad / scales[:, None, None]), -127, 127
                     ).astype(jnp.int8)
        return q, scales.astype(jnp.float32)

    # single-row layout gh=32 (reference), block values by block ID so
    # every layout sees the same matrix
    sr_h, sc_h, dest_h = pack_indices(rows, cols, 32)
    qb1, scales1 = build(slot_map(dest_h, sc_h.size))
    dense = jax.random.normal(kd, (K, F), jnp.float32)
    q = jnp.clip(jnp.round(dense), -127, 127).astype(jnp.int8)
    qd3 = q.reshape(nb, b, F)
    ones = jnp.ones((F,), jnp.float32)

    sr, sc1 = jnp.asarray(sr_h), jnp.asarray(sc_h)
    want = _pallas_int8_spmm_resident(
        sr, sc1, scales1, qb1, qd3, ones, nb, K, 512, 32, False,
    )
    wmax = float(jnp.max(jnp.abs(want)))
    want_ns = None  # lazy: reference with scales == 1

    def rec(**kw):
        kw["ts"] = time.time()
        with open(OUT, "a") as f:
            f.write(json.dumps(kw) + "\n")
        print(json.dumps(kw), flush=True)

    layouts = {}

    def layout(gh, R):
        if (gh, R) not in layouts:
            sp_h, sc2_h, dest2_h, n_groups = pack_rowgroups(rows, cols, gh, R)
            qb2, scales2 = build(slot_map(dest2_h, sc2_h.size))
            layouts[(gh, R)] = (jnp.asarray(sp_h), jnp.asarray(sc2_h),
                                scales2, qb2, n_groups)
        return layouts[(gh, R)]

    for label, gh, R, use_scales, use_cs in (
        ("r4g32_full", 32, 4, True, True),      # the failing shape
        ("r4g32_nocs", 32, 4, True, False),
        ("r4g32_noscales_nocs", 32, 4, False, False),
        ("r2g64_full", 64, 2, True, True),      # G=128, two lanes
        ("r4g16_full", 16, 4, True, True),      # G=64, four lanes
        ("r2g32_full", 32, 2, True, True),      # known-good control
    ):
        try:
            sp, sc2, scales2, qb2, n_groups = layout(gh, R)
            out = _rg_int8(sp, sc2, scales2, qb2, qd3, ones, n_groups, K,
                           512, gh, R, use_scales, use_cs)
            if not use_scales:
                if want_ns is None:
                    want_ns = _pallas_int8_spmm_resident(
                        sr, sc1, jnp.ones_like(scales1), qb1, qd3, ones,
                        nb, K, 512, 32, False,
                    )
                want_v = want_ns
                wm = float(jnp.max(jnp.abs(want_ns)))
            else:
                want_v, wm = want, wmax
            rel = float(jnp.max(jnp.abs(out - want_v))) / max(1e-30, wm)
            rec(kind="i8_rowgroup_diag", label=label, gh=gh, R=R, rel=rel)
        except Exception as e:
            rec(kind="i8_rowgroup_diag_fail", label=label, gh=gh, R=R,
                error=str(e)[:300])


if __name__ == "__main__":
    main()
