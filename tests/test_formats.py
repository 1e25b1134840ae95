import numpy as np
import scipy.sparse as sp

from spmm_denseblock_tpu.formats import CSR, BSR, random_csr, random_bsr


def test_csr_from_scipy_roundtrip(rng):
    m = sp.random(100, 80, density=0.05, random_state=42, format="csr")
    csr = CSR.from_scipy(m)
    np.testing.assert_allclose(csr.to_dense(), m.toarray(), rtol=1e-6)
    assert csr.nnz == m.nnz
    assert csr.shape == (100, 80)


def test_csr_from_edges_matches_adjacency():
    edges = np.array([[0, 1], [1, 0], [1, 2], [2, 1], [0, 0]])
    csr = CSR.from_edges(edges, n_rows=3)
    dense = csr.to_dense()
    want = np.zeros((3, 3), np.float32)
    for s, d in edges:
        want[s, d] += 1
    np.testing.assert_array_equal(dense, want)
    assert csr.data is None  # implicit 1.0, run_csrmm.cu:66 convention


def test_csr_row_ids():
    csr = CSR.from_edges(np.array([[0, 1], [0, 2], [2, 0]]), n_rows=4)
    np.testing.assert_array_equal(csr.row_ids(), [0, 0, 2])


def test_random_csr_seeded_deterministic():
    a = random_csr(0.01, 256, seed=7)
    b = random_csr(0.01, 256, seed=7)
    np.testing.assert_array_equal(np.asarray(a.indices), np.asarray(b.indices))
    np.testing.assert_array_equal(a.values(), b.values())
    # density in the right ballpark
    assert 0.005 < a.nnz / 256**2 < 0.02


def test_bsr_to_dense_and_metrics():
    # 2x2 block grid, b=2, two nonzero blocks
    blocks = np.zeros((2, 2, 2), np.float32)
    blocks[0] = [[1, 2], [3, 4]]
    blocks[1, 0, 0] = 5
    bsr = BSR.from_parts(
        np.array([0, 1], np.int32),
        np.array([0, 1], np.int32),
        blocks,
        (4, 4),
        2,
    )
    dense = bsr.to_dense()
    assert dense[0, 0] == 1 and dense[1, 1] == 4 and dense[2, 2] == 5
    assert bsr.block_density() == 2 / 4
    assert bsr.nnz_inside() == 5
    assert abs(bsr.utilization() - 5 / 8) < 1e-9
    np.testing.assert_array_equal(bsr.block_indptr(), [0, 1, 2])


def test_bsr_pad_keeps_dense():
    bsr = random_bsr(0.1, 8, block_size=4, seed=3)
    padded = bsr.pad_to(bsr.nnzb + 7)
    np.testing.assert_allclose(padded.to_dense(), bsr.to_dense())
    assert padded.nnzb == bsr.nnzb
    assert padded.nnzb_padded == bsr.nnzb + 7


def test_random_bsr_shape():
    bsr = random_bsr(0.05, 16, 12, block_size=8, seed=5)
    assert bsr.shape == (128, 96)
    assert bsr.blocks.shape[1:] == (8, 8)


def test_csr_transpose():
    import numpy as np
    from spmm_denseblock_tpu.formats.csr import random_csr

    csr = random_csr(0.1, 20, 12, seed=4)
    t = csr.transpose()
    assert t.shape == (12, 20)
    np.testing.assert_allclose(t.to_dense(), csr.to_dense().T, atol=1e-6)


def test_bsr_to_scipy():
    import numpy as np
    from spmm_denseblock_tpu.formats.bsr import random_bsr

    bsr = random_bsr(0.2, 6, 5, block_size=8, seed=3)
    sp_m = bsr.to_scipy()
    n, m = bsr.shape
    np.testing.assert_allclose(
        np.asarray(sp_m.todense())[:n, :m], bsr.to_dense(), atol=1e-6
    )
