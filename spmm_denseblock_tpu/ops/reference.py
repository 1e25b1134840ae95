"""Correctness oracles.

The reference's cross-oracle discipline (SURVEY.md §4): every kernel is
checked elementwise against an independent implementation on identical
seeded inputs with eps 1e-4 (/root/reference/check_result.cu:233-246).
Here the oracle tiers are scipy (host, plays the role of the reference's
OpenMP CPU SpMM, /root/reference/spmm.cc:7-25) and a jnp dense matmul.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from spmm_denseblock_tpu.formats.csr import CSR
from spmm_denseblock_tpu.formats.bsr import BSR

CHECK_EPS = 1e-4  # check_result.cu:116 hard gate


def spmm_scipy(mat, dense: np.ndarray) -> np.ndarray:
    """Host oracle: works for CSR, BSR, Hybrid (anything with to_scipy or
    to_dense)."""
    if isinstance(mat, CSR):
        return np.asarray(mat.to_scipy() @ dense, dtype=np.float32)
    return np.asarray(mat.to_dense() @ dense, dtype=np.float32)


def spmm_dense_jnp(mat, dense) -> jnp.ndarray:
    """Device oracle: densify then one big MXU matmul."""
    a = jnp.asarray(mat.to_dense() if hasattr(mat, "to_dense") else mat)
    return jnp.dot(
        a,
        jnp.asarray(dense),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def assert_allclose(got, want, eps: float = CHECK_EPS, msg: str = ""):
    got = np.asarray(got, dtype=np.float64)
    want = np.asarray(want, dtype=np.float64)
    # relative-or-absolute elementwise gate, like check_result's |a-b|<eps
    # but robust to large-magnitude accumulations on big graphs.
    denom = np.maximum(1.0, np.abs(want))
    err = np.max(np.abs(got - want) / denom) if got.size else 0.0
    if err >= eps:
        raise AssertionError(f"{msg} max rel-err {err:.3e} >= {eps:.1e}")
