import numpy as np
import scipy.sparse as sp

from spmm_denseblock_tpu.formats import CSR, random_csr
from spmm_denseblock_tpu.convert import csr_to_bsr, bsr_to_csr, divide, repack_bsr


def _rand_csr(n=200, m=160, density=0.03, seed=0):
    mat = sp.random(n, m, density=density, random_state=seed, format="csr")
    return CSR.from_scipy(mat)


def test_csr_to_bsr_exact():
    csr = _rand_csr()
    for b in (4, 16, 32):
        bsr = csr_to_bsr(csr, b)
        np.testing.assert_allclose(bsr.to_dense(), csr.to_dense(), rtol=1e-6)


def test_csr_to_bsr_nnzb_matches_scipy():
    csr = _rand_csr(seed=1)
    b = 8
    bsr = csr_to_bsr(csr, b)
    ref = csr.to_scipy().tobsr(blocksize=(b, b))
    ref.eliminate_zeros()
    # scipy keeps zero-filled blocks unless eliminated; compare counts of
    # truly-nonzero blocks (the cusparseXcsr2bsrNnz semantic).
    ref_nnzb = sum(1 for k in range(ref.indptr[-1]) if np.any(ref.data[k]))
    assert bsr.nnzb == ref_nnzb


def test_bsr_csr_roundtrip_nnz_accounting():
    csr = _rand_csr(seed=2)
    b = 4
    bsr = csr_to_bsr(csr, b)
    back = bsr_to_csr(bsr)
    # cusparseSbsr2csr keeps nnz = nnzb*b^2 including zero fill
    # (/root/reference/bsr2csr.cu round-trip driver)
    assert back.nnz == bsr.nnzb * b * b - _clipped(bsr)
    np.testing.assert_allclose(back.to_dense(), csr.to_dense(), atol=1e-6)


def _clipped(bsr):
    """cells of edge blocks that padded past the logical shape"""
    b = bsr.b
    rows = np.asarray(bsr.block_rows[: bsr.nnzb])
    cols = np.asarray(bsr.block_cols[: bsr.nnzb])
    r_over = np.maximum(0, (rows + 1) * b - bsr.shape[0])
    c_over = np.maximum(0, (cols + 1) * b - bsr.shape[1])
    return int(np.sum(b * b - (b - r_over) * (b - c_over)))


def test_divide_partition_is_exact():
    csr = random_csr(0.02, 256, seed=11)
    for density in (0.0, 0.1, 0.5, 1.1):
        hyb = divide(csr, 16, density)
        np.testing.assert_allclose(hyb.to_dense(), csr.to_dense(), atol=1e-6)
    # threshold 0.0 -> everything dense; > 1 -> everything remainder
    assert divide(csr, 16, 0.0).remainder.nnz == 0
    assert divide(csr, 16, 1.1).dense.nnzb == 0


def test_divide_threshold_semantics():
    # one fully dense 4x4 block + one single-entry block
    dense = np.zeros((8, 8), np.float32)
    dense[:4, :4] = 1.0
    dense[5, 5] = 1.0
    csr = CSR.from_scipy(sp.csr_matrix(dense))
    hyb = divide(csr, 4, density=0.5)
    assert hyb.dense.nnzb == 1  # only the full block passes >= 0.5
    assert hyb.remainder.nnz == 1


def test_repack_bsr_exact():
    csr = _rand_csr(seed=3)
    small = csr_to_bsr(csr, 8)
    big = repack_bsr(small, 32)
    assert big.b == 32
    np.testing.assert_allclose(big.to_dense(), csr.to_dense(), rtol=1e-6)
    assert big.nnzb <= small.nnzb
