"""ctypes loader for the native reorder engine (src/reorder.cc).

Builds libsdbnative.so on first use (one g++ invocation, cached next to
the sources); every caller in reorder/ falls back to the pure-Python
implementation when the toolchain or library is unavailable, so the
package never hard-depends on a compiler. Set SDB_NO_NATIVE=1 to force
the Python paths (tests use this to cross-check both).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libsdbnative.so")
_SRC = os.path.join(_HERE, "src", "reorder.cc")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

_I64 = ctypes.c_int64
_PI32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_PI64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")

_SIGNATURES = {
    "sdb_degree_sort": [_I64, _PI32, _PI32, _PI64],
    "sdb_bfs": [_I64, _PI32, _PI32, _PI64],
    "sdb_rcm_variant": [_I64, _PI32, _PI32, _PI64],
    "sdb_gorder": [_I64, _PI32, _PI32, _I64, _PI64],
    "sdb_rabbit": [_I64, _PI32, _PI32, _PI64],
    "sdb_greedy_closest": [_I64, _PI32, _PI32, _I64, _PI64],
    "sdb_permutate": [_I64, _PI32, _PI32, _PI64, _PI32, _PI32, _PI64],
}
# functions with a non-void return (set after CDLL load)
_RETURNING = {
    "sdb_unique_inverse": ([_I64, _PI32, _I64, _PI32, _PI32], _I64),
}


def _build() -> bool:
    if os.path.exists(_LIB_PATH) and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(
        _SRC
    ):
        return True
    # Compile to a process-unique temp name and os.replace() into place:
    # the atomic rename means a concurrent process (parallel pytest,
    # multi-host replicas on one VM) can never dlopen a half-written .so.
    tmp_path = f"{_LIB_PATH}.{os.getpid()}.tmp"
    try:
        subprocess.run(
            [
                os.environ.get("CXX", "g++"),
                "-std=c++17",
                "-O3",
                "-fPIC",
                "-march=native",
                "-fopenmp",
                "-shared",
                "-o",
                tmp_path,
                _SRC,
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        os.replace(tmp_path, _LIB_PATH)
        return True
    except Exception:
        return False
    finally:
        if os.path.exists(tmp_path):
            try:
                os.remove(tmp_path)
            except OSError:
                pass


def load() -> Optional[ctypes.CDLL]:
    """The native library, or None (no toolchain / SDB_NO_NATIVE=1)."""
    global _lib, _tried
    if os.environ.get("SDB_NO_NATIVE"):
        return None
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            for name, argtypes in _SIGNATURES.items():
                fn = getattr(lib, name)
                fn.argtypes = argtypes
                fn.restype = None
            for name, (argtypes, restype) in _RETURNING.items():
                fn = getattr(lib, name)
                fn.argtypes = argtypes
                fn.restype = restype
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def _csr_args(csr):
    indptr = np.ascontiguousarray(np.asarray(csr.indptr), dtype=np.int32)
    indices = np.ascontiguousarray(np.asarray(csr.indices), dtype=np.int32)
    return indptr, indices


def run(name: str, csr, *extra) -> Optional[np.ndarray]:
    """Run a native strategy; None means 'use the Python fallback'."""
    lib = load()
    if lib is None:
        return None
    indptr, indices = _csr_args(csr)
    out = np.empty(csr.n_rows, dtype=np.int64)
    getattr(lib, name)(csr.n_rows, indptr, indices, *extra, out)
    return out


def unique_inverse(seg: np.ndarray, n_vals: int):
    """np.unique(seg, return_inverse=True) for a bounded-value int32
    stream via the native dense-mark pass (O(n + n_vals) vs the numpy
    comparison sort) — the ELL compaction layout builder's hot host
    pass. Returns (uniq, inv) or None for 'use numpy'."""
    lib = load()
    if lib is None:
        return None
    seg = np.ascontiguousarray(seg, dtype=np.int32)
    cap = int(min(seg.size, n_vals))
    uniq = np.empty(cap, dtype=np.int32)
    inv = np.empty(seg.size, dtype=np.int32)
    u = lib.sdb_unique_inverse(seg.size, seg, int(n_vals), uniq, inv)
    return uniq[:u].copy(), inv
