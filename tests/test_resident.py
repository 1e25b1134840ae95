"""Resident-dense BSR kernel: correctness of both routing outcomes.

The plan's apply routes per dense-shape: the (nbc, b, f_tile) slice
either fits the VMEM budget (resident kernel — one dense HBM read per
f pass, dynamic leading-dim indexing) or not (flat gather kernel).
These tests pin: bit-level agreement between the two paths, the routing
rule itself, explicit overrides, grad, chunking, and the int8 twin.
On CPU both run in interpret mode (tests/conftest.py forces cpu).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from spmm_denseblock_tpu.formats.bsr import random_bsr
from spmm_denseblock_tpu.ops.bsr_spmm_pallas import (
    RESIDENT_SLICE_BYTES,
    _resident_f_tile,
    bsr_spmm_pallas_plan,
)
from spmm_denseblock_tpu.ops.bsr_spmm_pallas_int8 import (
    bsr_spmm_pallas_int8_plan,
)
from spmm_denseblock_tpu.ops.reference import spmm_scipy


@pytest.fixture(scope="module")
def case():
    bsr = random_bsr(0.15, 12, 12, block_size=32, seed=3)
    rng = np.random.default_rng(0)
    dense = rng.standard_normal((bsr.shape[1], 96)).astype(np.float32)
    want = spmm_scipy(bsr, dense)
    return bsr, dense, want


def _rel(got, want):
    return np.abs(np.asarray(got) - want).max() / max(1e-30, np.abs(want).max())


def test_resident_matches_gather_f32(case):
    bsr, dense, want = case
    out_res = bsr_spmm_pallas_plan(bsr, grad=False, resident=True)(dense)
    out_gat = bsr_spmm_pallas_plan(bsr, grad=False, resident=False)(dense)
    assert _rel(out_res, want) < 1e-4
    assert _rel(out_gat, want) < 1e-4


def test_resident_grouped(case):
    bsr, dense, want = case
    for g in (2, 4):
        out = bsr_spmm_pallas_plan(bsr, grad=False, resident=True, group=g)(
            dense
        )
        assert _rel(out, want) < 1e-4


def test_resident_bf16(case):
    bsr, dense, want = case
    out = bsr_spmm_pallas_plan(
        bsr, grad=False, resident=True, dtype=jnp.bfloat16
    )(dense)
    assert _rel(out, want) < 3e-2  # bf16 being bf16


def test_resident_grad(case):
    import jax

    bsr, dense, want = case
    plan = bsr_spmm_pallas_plan(bsr, grad=True, resident=True)
    g = jax.grad(lambda x: jnp.sum(plan(x) ** 2))(jnp.asarray(dense))
    # oracle: dL/dX = 2 A^T (A X)
    a = bsr.to_scipy()
    want_g = 2.0 * np.asarray(a.T @ (a @ dense))
    assert _rel(g, want_g) < 1e-3


def test_resident_chunked(case):
    bsr, dense, want = case
    out = bsr_spmm_pallas_plan(
        bsr, grad=False, resident=True, chunk_nnzb=max(4, bsr.nnzb // 3)
    )(dense)
    assert _rel(out, want) < 1e-4


def test_resident_int8(case):
    bsr, dense, want = case
    # resident=True with no f_tile -> the (depth-sorted) row-group
    # resident layout; default group-scale re-quantizes per lane-step,
    # so the DEFAULT plan is oracle-gated while the bit-compat
    # comparison against the gather kernel pins depth_sort=False
    out_default = bsr_spmm_pallas_int8_plan(bsr, resident=True)(dense)
    assert _rel(out_default, want) < 5e-2  # int8 quantization grade
    out = bsr_spmm_pallas_int8_plan(
        bsr, resident=True, depth_sort=False
    )(dense)
    assert _rel(out, want) < 5e-2
    out_g = bsr_spmm_pallas_int8_plan(bsr, resident=False)(dense)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(out_g), rtol=1e-4, atol=1e-5
    )
    # resident=True + explicit f_tile -> the SINGLE-ROW resident twin
    # (row-group packing requires f_tile=None), keeping that kernel
    # covered now that auto prefers row-groups
    out_sr = bsr_spmm_pallas_int8_plan(bsr, resident=True, f_tile=128)(dense)
    np.testing.assert_allclose(
        np.asarray(out_sr), np.asarray(out_g), rtol=1e-4, atol=1e-5
    )


def test_int8_auto_routes_rowgroup(case, monkeypatch):
    """int8 auto now packs the row-group resident layout when the slice
    fits (the r4 'hardware garbage' record was a probe scales-layout
    bug — benchmarks/int8_rowgroup_diag_r4.jsonl); pin the routing by
    spying the kernel entries, and pin resident=False -> gather."""
    import importlib

    bsr, dense, want = case
    mod = importlib.import_module(
        "spmm_denseblock_tpu.ops.bsr_spmm_pallas_int8"
    )
    # r5: auto packs the row-group family — depth-SORTED when the
    # occupancy gate passes (>= 8 real blocks/row for int8,
    # sorted_grid_r5.jsonl), consecutive below it. Spy BOTH.
    calls = {"rowgroup": 0, "gather": 0}
    orig_srt = mod._pallas_int8_spmm_sorted
    orig_con = mod._pallas_int8_spmm_rowgroup
    orig_gat = mod._pallas_int8_spmm

    def spy_srt(*a, **k):
        calls["rowgroup"] += 1
        return orig_srt(*a, **k)

    def spy_con(*a, **k):
        calls["rowgroup"] += 1
        return orig_con(*a, **k)

    def spy_gat(*a, **k):
        calls["gather"] += 1
        return orig_gat(*a, **k)

    monkeypatch.setattr(mod, "_pallas_int8_spmm_sorted", spy_srt)
    monkeypatch.setattr(mod, "_pallas_int8_spmm_rowgroup", spy_con)
    monkeypatch.setattr(mod, "_pallas_int8_spmm", spy_gat)
    out = bsr_spmm_pallas_int8_plan(bsr)(dense)
    assert _rel(out, want) < 5e-2
    assert calls["rowgroup"] == 1 and calls["gather"] == 0
    # fresh F (no other test uses 88) so the resident=False apply can't
    # hit _int8_pallas_apply's jit cache and bypass the spy
    narrow = np.ascontiguousarray(dense[:, :88])
    out_g = bsr_spmm_pallas_int8_plan(bsr, resident=False)(narrow)
    assert calls["gather"] == 1
    out_rg = bsr_spmm_pallas_int8_plan(bsr)(narrow)
    # r5 default re-quantizes per lane-step (group-scale), so the two
    # layouts agree at quantization grade, not reassociation grade
    assert _rel(out_rg, spmm_scipy(bsr, narrow)) < 5e-2


def test_int8_rowgroup_phantom_rows():
    """Covered-row count not divisible by R (phantom pad rows) on the
    int8 row-group layout + a chunked int8 plan through it."""
    bsr = random_bsr(0.3, 7, 7, block_size=32, seed=9)
    rng = np.random.default_rng(2)
    dense = rng.standard_normal((bsr.shape[1], 64)).astype(np.float32)
    want = spmm_scipy(bsr, dense)
    out = bsr_spmm_pallas_int8_plan(bsr)(dense)
    assert _rel(out, want) < 5e-2
    out_c = bsr_spmm_pallas_int8_plan(bsr, chunk_nnzb=7)(dense)
    assert _rel(out_c, want) < 5e-2


def test_rowgroup_phantom_rows_and_grad():
    """Row count not divisible by R (phantom pad rows) + training
    through the row-group layout."""
    import jax

    bsr = random_bsr(0.3, 7, 7, block_size=32, seed=9)
    rng = np.random.default_rng(2)
    dense = rng.standard_normal((bsr.shape[1], 64)).astype(np.float32)
    want = spmm_scipy(bsr, dense)
    out = bsr_spmm_pallas_plan(bsr, grad=False, dtype=jnp.bfloat16)(dense)
    assert _rel(out, want) < 3e-2

    plan = bsr_spmm_pallas_plan(bsr, grad=True, dtype=jnp.bfloat16)
    g = jax.grad(lambda x: jnp.sum(plan(x) ** 2))(jnp.asarray(dense))
    a = bsr.to_scipy()
    want_g = 2.0 * np.asarray(a.T @ (a @ dense))
    assert _rel(g, want_g) < 5e-2  # bf16 fwd+bwd grade


def test_resident_f_tile_budget():
    # slice fits at the full width
    assert _resident_f_tile(16, 32, 512, 4) == 512
    # budget forces a narrower tile that still divides f_padded
    nbc = RESIDENT_SLICE_BYTES // (128 * 256 * 4) + 1
    ft = _resident_f_tile(nbc, 128, 512, 4)
    assert ft in (128, 256) or ft is None
    if ft is not None:
        assert 512 % ft == 0
        assert nbc * 128 * ft * 4 <= RESIDENT_SLICE_BYTES
    # impossible: even 128 blows the budget
    assert _resident_f_tile(10**7, 128, 512, 4) is None


def test_auto_routes_to_resident_when_fitting(monkeypatch):
    """The None (auto) default must actually pick the resident kernel
    when the slice fits — pin it by counting kernel entries. Uses
    shapes no other test touches: _pallas_apply's jit cache is keyed on
    (statics, shapes), and a cache hit would bypass the spies."""
    import importlib

    mod = importlib.import_module("spmm_denseblock_tpu.ops.bsr_spmm_pallas")
    bsr = random_bsr(0.2, 10, 10, block_size=32, seed=11)
    rng = np.random.default_rng(5)
    dense = rng.standard_normal((bsr.shape[1], 80)).astype(np.float32)
    want = spmm_scipy(bsr, dense)
    calls = {"resident": 0, "gather": 0, "rowgroup": 0}
    orig_res = mod._pallas_spmm_resident
    orig_gat = mod._pallas_spmm
    orig_rg = mod._pallas_spmm_rowgroup_sorted  # r5 layout (gate >= 2/row)
    orig_rgc = mod._pallas_spmm_rowgroup

    def spy_res(*a, **k):
        calls["resident"] += 1
        return orig_res(*a, **k)

    def spy_gat(*a, **k):
        calls["gather"] += 1
        return orig_gat(*a, **k)

    def spy_rg(*a, **k):
        calls["rowgroup"] += 1
        return orig_rg(*a, **k)

    monkeypatch.setattr(mod, "_pallas_spmm_resident", spy_res)
    monkeypatch.setattr(mod, "_pallas_spmm", spy_gat)
    def spy_rgc(*a, **k):
        calls["rowgroup"] += 1
        return orig_rgc(*a, **k)

    monkeypatch.setattr(mod, "_pallas_spmm_rowgroup_sorted", spy_rg)
    monkeypatch.setattr(mod, "_pallas_spmm_rowgroup", spy_rgc)
    # auto policy: residency only pays for 2-byte operands (measured —
    # resident_probe_r4.jsonl), and bf16 plans pack the ROW-GROUP
    # resident layout (R from _rowgroup_policy, the measured best
    # schedule)...
    out = bsr_spmm_pallas_plan(bsr, grad=False, dtype=jnp.bfloat16)(dense)
    assert _rel(out, want) < 3e-2  # bf16 grade
    assert calls["rowgroup"] == 1 and calls["gather"] == 0

    # ...an f32 plan routes gather (4-byte slices lose to the 4x
    # block re-read)...
    out = bsr_spmm_pallas_plan(bsr, grad=False)(dense)
    assert _rel(out, want) < 1e-4
    assert calls["gather"] == 1 and calls["resident"] == 0

    # ...forcing resident=True on f32 uses the single-row resident
    # kernel...
    out = bsr_spmm_pallas_plan(bsr, grad=False, resident=True)(dense)
    assert _rel(out, want) < 1e-4
    assert calls["resident"] == 1

    # ...and a bf16 plan whose slice cannot fit at BUILD time packs the
    # standard layout and routes gather
    calls["gather"] = 0
    monkeypatch.setattr(mod, "RESIDENT_SLICE_BYTES", 64)
    narrow = np.ascontiguousarray(dense[:, :48])  # new shape -> fresh trace
    out = bsr_spmm_pallas_plan(bsr, grad=False, dtype=jnp.bfloat16)(narrow)
    assert _rel(out, spmm_scipy(bsr, narrow)) < 3e-2
    assert calls["gather"] == 1 and calls["rowgroup"] == 1  # unchanged


def test_resident_force_impossible_raises():
    bsr = random_bsr(0.15, 4, 4, block_size=32, seed=1)
    dense = np.zeros((bsr.shape[1], 64), np.float32)
    plan = bsr_spmm_pallas_plan(bsr, grad=False, resident=True)
    import importlib

    # the ops package re-exports a same-named FUNCTION; go via importlib
    mod = importlib.import_module("spmm_denseblock_tpu.ops.bsr_spmm_pallas")
    orig = mod.RESIDENT_SLICE_BYTES
    mod.RESIDENT_SLICE_BYTES = 64  # nothing fits
    try:
        with pytest.raises(ValueError, match="resident=True"):
            plan(dense)
    finally:
        mod.RESIDENT_SLICE_BYTES = orig
