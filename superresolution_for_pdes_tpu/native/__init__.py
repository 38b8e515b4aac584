"""ctypes bindings for the native (C++) Poisson oracle.

Builds ``libpoisson_oracle.so`` on first use (g++ -O3 -fopenmp) and exposes:

* :func:`apply_operator` — ``diag(theta) @ L @ u``, batched;
* :func:`solve_cg` — batched CG solve of the reference system.

Used by the test-suite as a scipy-independent parity oracle and available as
a host-side datagen fallback. See ``poisson_oracle.cpp`` for provenance.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).parent
_LIB_PATH = _DIR / "libpoisson_oracle.so"
_lib = None


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    src = _DIR / "poisson_oracle.cpp"
    if not _LIB_PATH.exists() or _LIB_PATH.stat().st_mtime < src.stat().st_mtime:
        subprocess.run(["make", "-C", str(_DIR)], check=True, capture_output=True)
    lib = ctypes.CDLL(str(_LIB_PATH))
    dp = ctypes.POINTER(ctypes.c_double)
    lib.poisson_apply_operator.argtypes = [dp, dp, dp, ctypes.c_int64, ctypes.c_int64]
    lib.poisson_apply_operator.restype = None
    lib.poisson_solve_cg.argtypes = [
        dp, dp, dp, ctypes.c_int64, ctypes.c_int64, ctypes.c_double, ctypes.c_int64,
    ]
    lib.poisson_solve_cg.restype = ctypes.c_int64
    _lib = lib
    return lib


def _as_batch(x: np.ndarray) -> np.ndarray:
    x = np.ascontiguousarray(np.asarray(x, dtype=np.float64))
    return x[None] if x.ndim == 2 else x


def _ptr(x: np.ndarray):
    return x.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def apply_operator(theta: np.ndarray, u: np.ndarray) -> np.ndarray:
    """Native ``diag(theta) @ L @ u`` over the last two axes."""
    lib = _load()
    squeeze = np.asarray(u).ndim == 2
    theta_b, u_b = _as_batch(theta), _as_batch(u)
    out = np.empty_like(u_b)
    lib.poisson_apply_operator(_ptr(theta_b), _ptr(u_b), _ptr(out),
                               u_b.shape[0], u_b.shape[-1])
    return out[0] if squeeze else out


def solve_cg(f: np.ndarray, theta: np.ndarray, tol: float = 1e-12,
             max_iters: int = 100_000) -> np.ndarray:
    """Native batched CG solve of ``diag(theta) L u = f``."""
    lib = _load()
    squeeze = np.asarray(f).ndim == 2
    f_b, theta_b = _as_batch(f), _as_batch(theta)
    u = np.empty_like(f_b)
    iters = lib.poisson_solve_cg(_ptr(f_b), _ptr(theta_b), _ptr(u),
                                 f_b.shape[0], f_b.shape[-1], tol, max_iters)
    if iters < 0:
        raise RuntimeError("native CG failed to converge")
    return u[0] if squeeze else u
