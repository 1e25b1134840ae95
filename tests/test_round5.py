"""Round-5 features: depth-sorted row-group layout (VERDICT r4 #5)."""

import jax
import jax.numpy as jnp
import numpy as np

from spmm_denseblock_tpu.formats.bsr import random_bsr
from spmm_denseblock_tpu.ops import bsr_spmm_pallas_plan


def test_depth_sorted_rowgroup_matches_oracle():
    """The window-sorted resident schedule matches the oracle at bf16
    tolerance on shapes exercising window padding (nbr % W != 0) and
    lane padding (nbr % R != 0); accumulation-order differences vs the
    consecutive row-group layout stay inside bf16 rounding."""
    for nb, b, F, p, seed in ((48, 16, 96, 0.05, 0), (33, 16, 130, 0.1, 2)):
        bsr = random_bsr(p, nb, nb, block_size=b, seed=seed)
        X = np.random.default_rng(seed).standard_normal(
            (bsr.shape[1], F)
        ).astype(np.float32)
        want = bsr.to_scipy() @ X
        plan = bsr_spmm_pallas_plan(
            bsr, grad=False, dtype=jnp.bfloat16, depth_sort=True
        )
        assert plan.statics[-1][0] == "sorted"
        got = np.asarray(plan(X), np.float32)
        rel = np.abs(got - want).max() / max(np.abs(want).max(), 1e-9)
        assert rel < 5e-3, rel


def test_depth_sorted_pad_reduction():
    """The sorted pack's reason to exist: fewer padded slots than the
    consecutive row-group pack at the same (R, gh)."""
    from spmm_denseblock_tpu.ops.bsr_spmm_pallas import (
        _ensure_covering,
        _pack_rowgroups,
        _pack_rowgroups_sorted,
    )

    bsr = random_bsr(0.05, 128, 128, block_size=8, seed=7)
    cov = _ensure_covering(bsr)
    rows = np.asarray(cov.block_rows[: cov.nnzb])
    cols = np.asarray(cov.block_cols[: cov.nnzb])
    blocks = np.asarray(cov.blocks[: cov.nnzb])
    _, _, bp_cons, _ = _pack_rowgroups(rows, cols, blocks, 8, 16)
    _, _, _, bp_sort, _ = _pack_rowgroups_sorted(rows, cols, blocks, 8, 16, 64)
    assert bp_sort.shape[0] <= bp_cons.shape[0]
    # every real block lands exactly once (mass conservation)
    assert np.isclose(np.abs(bp_sort).sum(), np.abs(blocks).sum())


def test_depth_sorted_grad_roundtrip():
    """grad=True composes: forward + VJP both run the sorted layout."""
    bsr = random_bsr(0.08, 32, 32, block_size=8, seed=3)
    X = np.random.default_rng(0).standard_normal(
        (bsr.shape[1], 32)
    ).astype(np.float32)
    plan = bsr_spmm_pallas_plan(bsr, dtype=jnp.bfloat16, depth_sort=True)

    def loss(x):
        return jnp.sum(plan(x) ** 2)

    g = jax.grad(loss)(jnp.asarray(X))
    ref = bsr.to_scipy() @ X
    g_ref = 2.0 * (bsr.to_scipy().T @ ref)
    rel = np.abs(np.asarray(g) - g_ref).max() / max(np.abs(g_ref).max(), 1e-9)
    assert rel < 2e-2, rel


def test_int8_group_scale_matches_oracle():
    """Group-scale int8 (one shared scale per lane-step, int32 lane
    accumulation — the round-5 default for the depth-sorted single-chip
    plan) stays inside the int8 tier tolerance, and SDB_INT8_GROUP_SCALE=0
    falls back to per-slot scales."""
    import os

    from spmm_denseblock_tpu.ops.bsr_spmm_pallas_int8 import (
        bsr_spmm_pallas_int8_plan,
    )

    bsr = random_bsr(0.05, 48, 48, block_size=16, seed=0)
    X = np.random.default_rng(0).standard_normal(
        (bsr.shape[1], 96)
    ).astype(np.float32)
    want = bsr.to_scipy() @ X
    plan = bsr_spmm_pallas_int8_plan(bsr, calibration=X, depth_sort=True)
    assert plan.statics[-1][0] == "sorted_gs"
    rel = np.abs(np.asarray(plan(X), np.float32) - want).max() / np.abs(
        want
    ).max()
    assert rel < 5e-2, rel
    os.environ["SDB_INT8_GROUP_SCALE"] = "0"
    try:
        plan_ps = bsr_spmm_pallas_int8_plan(
            bsr, calibration=X, depth_sort=True
        )
        assert plan_ps.statics[-1][0] == "sorted"
        rel2 = np.abs(
            np.asarray(plan_ps(X), np.float32) - want
        ).max() / np.abs(want).max()
        assert rel2 < 5e-2, rel2
    finally:
        os.environ.pop("SDB_INT8_GROUP_SCALE", None)


def test_depth_sort_occupancy_gate():
    """Auto depth-sort engages only above the measured occupancy
    thresholds (sorted_grid_r5.jsonl: bf16 wins at >= ~2 real blocks
    per block-row, int8 at >= ~8; both LOSE below). Explicit
    depth_sort=True still forces it."""
    from spmm_denseblock_tpu.ops.bsr_spmm_pallas_int8 import (
        bsr_spmm_pallas_int8_plan,
    )

    sparse = random_bsr(0.05, 24, 24, block_size=16, seed=0)  # ~1.2/row
    dense = random_bsr(0.5, 24, 24, block_size=16, seed=0)    # ~12/row
    X = np.random.default_rng(0).standard_normal(
        (sparse.shape[1], 64)
    ).astype(np.float32)

    p_sparse = bsr_spmm_pallas_plan(sparse, grad=False, dtype=jnp.bfloat16)
    assert not (isinstance(p_sparse.statics[-1], tuple)
                and str(p_sparse.statics[-1][0]).startswith("sorted"))
    p_dense = bsr_spmm_pallas_plan(dense, grad=False, dtype=jnp.bfloat16)
    assert p_dense.statics[-1][0] == "sorted"
    p_forced = bsr_spmm_pallas_plan(
        sparse, grad=False, dtype=jnp.bfloat16, depth_sort=True
    )
    assert p_forced.statics[-1][0] == "sorted"

    i_sparse = bsr_spmm_pallas_int8_plan(sparse, calibration=X)
    assert not (isinstance(i_sparse.statics[-1], tuple)
                and str(i_sparse.statics[-1][0]).startswith("sorted"))
    i_dense = bsr_spmm_pallas_int8_plan(dense, calibration=X)
    assert i_dense.statics[-1][0] == "sorted_gs"


def test_wide_sorted_residency_routing():
    """f32 / bf16x3 (4-byte) plans join the sorted-resident regime at
    deep occupancy (the r4 negative flipped on the sorted pack,
    kernel_probe_r5.jsonl) and keep the gather layout below the gate
    or when fuse_dot/lookahead are requested."""
    deep = random_bsr(0.5, 24, 24, block_size=16, seed=0)  # ~12/row
    X = np.random.default_rng(0).standard_normal(
        (deep.shape[1], 64)
    ).astype(np.float32)
    want = deep.to_scipy() @ X
    for kw, tol in (({}, 1e-4), ({"precision": "high"}, 1e-3)):
        p = bsr_spmm_pallas_plan(deep, grad=False, **kw)
        assert p.statics[-1][0] == "sorted", p.statics[-1]
        rel = np.abs(np.asarray(p(X), np.float32) - want).max() / np.abs(
            want
        ).max()
        assert rel < tol, rel
    # gather-only knobs keep the gather layout
    p = bsr_spmm_pallas_plan(deep, grad=False, fuse_dot=True, group=4)
    assert p.statics[-1] is None
