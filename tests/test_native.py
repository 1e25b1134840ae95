"""Native (C++) reorder engine vs the pure-Python specification.

Deterministic strategies (degree, bfs, rcmk, gorder, greedy-closest) must
produce bit-identical permutations; rabbit's tie behavior depends on hash
iteration order in intermediate maps, so it is checked for validity +
equivalent clustering quality instead.
"""

import os
import subprocess

import numpy as np
import pytest

from spmm_denseblock_tpu import native
from spmm_denseblock_tpu.analyze.metrics import block_metrics
from spmm_denseblock_tpu.formats.csr import CSR, random_csr
from spmm_denseblock_tpu.io.datasets import synthetic_powerlaw
from spmm_denseblock_tpu.reorder import check_permutation, permutate


def _python_impl(name):
    """Call the pure-Python fallback by masking the native lib."""
    import importlib

    simple = importlib.import_module("spmm_denseblock_tpu.reorder.simple")
    gorder = importlib.import_module("spmm_denseblock_tpu.reorder.gorder")
    rabbit = importlib.import_module("spmm_denseblock_tpu.reorder.rabbit")
    greedy = importlib.import_module("spmm_denseblock_tpu.reorder.greedy")

    table = {
        "degree": simple.max_degree_sort,
        "bfs": simple.bfs,
        "rcmk": simple.rcm_variant,
        "gorder": gorder.gorder,
        "rabbit": rabbit.rabbit_order,
        "closest": greedy.greedy_closest,
    }

    def run(csr, **kw):
        os.environ["SDB_NO_NATIVE"] = "1"
        try:
            return table[name](csr, **kw)
        finally:
            del os.environ["SDB_NO_NATIVE"]

    return run


def _native_impl(name):
    table = {
        "degree": "sdb_degree_sort",
        "bfs": "sdb_bfs",
        "rcmk": "sdb_rcm_variant",
    }

    def run(csr, **kw):
        import ctypes

        if name == "gorder":
            return native.run(
                "sdb_gorder", csr, ctypes.c_int64(kw.get("window", 5))
            )
        if name == "closest":
            return native.run(
                "sdb_greedy_closest", csr, ctypes.c_int64(kw.get("start", 0))
            )
        if name == "rabbit":
            return native.run("sdb_rabbit", csr)
        return native.run(table[name], csr)

    return run


@pytest.fixture(scope="module")
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


GRAPHS = [
    lambda: random_csr(0.05, 80, seed=3, values="ones"),
    lambda: synthetic_powerlaw(300, 3000, seed=5),
    lambda: CSR.from_edges(np.array([[0, 1], [1, 0], [2, 3], [3, 2]]), 6),
]


@pytest.mark.parametrize("name", ["degree", "bfs", "rcmk", "gorder", "closest"])
@pytest.mark.parametrize("gi", range(len(GRAPHS)))
def test_native_matches_python_exactly(lib, name, gi):
    csr = GRAPHS[gi]()
    got = _native_impl(name)(csr)
    want = _python_impl(name)(csr)
    check_permutation(got, csr.n_rows)
    np.testing.assert_array_equal(got, want)


def test_gorder_floor_override_bit_equal(lib, monkeypatch):
    """SDB_GORDER_FLOOR (the round-3 speed/quality knob): both engines
    read it at call time and bit-equality holds under override. The
    floor only BINDS when the volume budget binds (>=~8M-nnz graphs —
    too heavy for a unit test); the binding case is covered by the
    measured full-products A/B (reorder_quality_r3.jsonl,
    kind=gorder_floor_ab: 110.7 s at floor=48 vs 168.7 at 64)."""
    monkeypatch.setenv("SDB_GORDER_FLOOR", "8")
    csr = synthetic_powerlaw(4096, 4096 * 16, seed=7)
    got = _native_impl("gorder")(csr)
    want = _python_impl("gorder")(csr)
    check_permutation(got, csr.n_rows)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("gi", range(len(GRAPHS)))
def test_native_rabbit_valid_and_comparable(lib, gi):
    csr = GRAPHS[gi]()
    got = _native_impl("rabbit")(csr)
    check_permutation(got, csr.n_rows)
    want = _python_impl("rabbit")(csr)
    b = 16
    d_native = block_metrics(permutate(got, csr), [b])[b]["density"]
    d_python = block_metrics(permutate(want, csr), [b])[b]["density"]
    # same clustering quality (exact tie order may differ)
    assert d_native <= d_python * 1.3 + 1e-9


def test_native_scales_to_reference_size(lib):
    """ogbn-arxiv-scale rcmk + gorder in seconds, not hours — the reason
    the native engine exists (reference runs these as compiled C++)."""
    import time

    csr = synthetic_powerlaw(169_343 // 4, 1_166_243 // 4, seed=1)
    t0 = time.perf_counter()
    perm = _native_impl("rcmk")(csr)
    t_rcmk = time.perf_counter() - t0
    check_permutation(perm, csr.n_rows)
    t0 = time.perf_counter()
    perm = _native_impl("gorder")(csr)
    t_gorder = time.perf_counter() - t0
    check_permutation(perm, csr.n_rows)
    assert t_rcmk < 10 and t_gorder < 60, (t_rcmk, t_gorder)


def test_native_permutate_bit_equal():
    """sdb_permutate vs the numpy spec: identical indptr/indices/data on
    valued and unvalued square matrices (stable duplicate handling)."""
    import os

    import numpy as np

    from spmm_denseblock_tpu import native
    from spmm_denseblock_tpu.formats.csr import CSR, random_csr
    from spmm_denseblock_tpu.reorder.base import permutate

    if native.load() is None:
        import pytest

        pytest.skip("no native lib")

    rng = np.random.default_rng(0)
    for seed, valued in ((1, True), (2, False)):
        csr = random_csr(0.07, 150, 150, seed=seed,
                         values=None if valued else "ones")
        # duplicate edges exercise stable ordering
        dup = CSR.from_coo(
            np.concatenate([csr.row_ids(), [3, 3]]),
            np.concatenate([np.asarray(csr.indices), [7, 7]]),
            None if csr.data is None
            else np.concatenate([np.asarray(csr.data), [0.5, 0.25]]),
            csr.shape,
        )
        perm = rng.permutation(150).astype(np.int64)
        got = permutate(perm, dup)
        os.environ["SDB_NO_NATIVE"] = "1"
        try:
            want = permutate(perm, dup)
        finally:
            del os.environ["SDB_NO_NATIVE"]
        np.testing.assert_array_equal(
            np.asarray(got.indptr), np.asarray(want.indptr)
        )
        np.testing.assert_array_equal(
            np.asarray(got.indices), np.asarray(want.indices)
        )
        if dup.data is not None:
            np.testing.assert_array_equal(
                np.asarray(got.data), np.asarray(want.data)
            )


def test_native_products_scale_rate_gates(lib):
    """Products-scale throughput gates at 10% size (full 123M-nnz
    numbers, measured round 2: permutate ~22 s, degree ~22 s total,
    rcmk ~48 s, rabbit ~165 s after the O(1)-erase + capped-map fixes —
    before them rabbit did not terminate). The 10% gates here catch
    complexity regressions without a 4-minute fixture build."""
    import time

    import numpy as np

    from spmm_denseblock_tpu.reorder.base import permutate

    csr = synthetic_powerlaw(2_449_029 // 10, 123_718_280 // 10, seed=2)

    t0 = time.perf_counter()
    out = permutate(
        np.random.default_rng(0).permutation(csr.n_rows).astype(np.int64), csr
    )
    t_perm = time.perf_counter() - t0
    assert out.nnz == csr.nnz

    t0 = time.perf_counter()
    perm = _native_impl("rabbit")(csr)
    t_rabbit = time.perf_counter() - t0
    check_permutation(perm, csr.n_rows)

    # linear-ish scaling: 10% of products must stay well under 1/5 of
    # the full-scale budgets (quadratic regressions blow these out)
    assert t_perm < 15 and t_rabbit < 60, (t_perm, t_rabbit)


def test_native_unique_inverse_matches_numpy():
    """sdb_unique_inverse (dense-mark O(n + n_vals)) must match
    np.unique(seg, return_inverse=True) exactly: sorted unique values
    and the same inverse mapping — the ELL compaction layout builder's
    hot host pass."""
    from spmm_denseblock_tpu import native

    if native.load() is None:
        import pytest

        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(41)
    for n, n_vals in ((1, 5), (1000, 37), (100_000, 1 << 20), (64, 1)):
        seg = rng.integers(0, n_vals, size=n).astype(np.int32)
        uniq, inv = native.unique_inverse(seg, n_vals)
        w_uniq, w_inv = np.unique(seg, return_inverse=True)
        np.testing.assert_array_equal(uniq, w_uniq.astype(np.int32))
        np.testing.assert_array_equal(inv.astype(np.int64), w_inv)
        assert uniq.dtype == np.int32 and inv.dtype == np.int32
