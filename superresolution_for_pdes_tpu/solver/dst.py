"""Exact fast-diagonalization Poisson solver via discrete sine transforms.

The reference solves ``diag(theta) @ L @ u = f`` with scipy's SuperLU, one
sparse factorization per sample (``/root/reference/src/data_generation.py:99-102``)
— the hot loop of dataset generation (1000+ serial native solves, up to
409,600 unknowns at 640^2 in ``src/resolution_comparison.py:61-73``).

TPU-first replacement: ``diag(theta) L u = f  <=>  L u = f / theta`` and
``L = (T (x) I + I (x) T) / h^2`` where ``T = tridiag(1, -2, 1)`` is the 1-D
Dirichlet Laplacian (the truncated boundary rows of the reference assembly,
``data_generation.py:49-56``, are exactly the Dirichlet truncation). ``T`` is
diagonalized by the type-I discrete sine basis

    S[j, k] = sqrt(2/(n+1)) * sin(pi (j+1)(k+1) / (n+1)),   S = S^T = S^{-1}
    lambda_k = -4 sin^2( pi (k+1) / (2 (n+1)) )

so the full solve is four dense ``n x n`` matmuls plus one elementwise divide:

    g     = f / theta
    ghat  = S g S
    uhat  = ghat * h^2 / (lambda_i + lambda_j)
    u     = S uhat S

This is *exact* (a direct solver, parity with scipy up to float rounding),
batches over arbitrary leading axes for free, and is pure MXU work — the ideal
TPU kernel shape. ``iters`` rounds of iterative refinement recover near-full
precision when running in float32/bfloat16 on-device.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from superresolution_for_pdes_tpu.ops.grid import grid_spacing
from superresolution_for_pdes_tpu.ops.stencil import apply_operator


@functools.lru_cache(maxsize=None)
def _sine_basis_np(n: int) -> np.ndarray:
    j = np.arange(1, n + 1, dtype=np.float64)
    S = np.sin(np.pi * np.outer(j, j) / (n + 1)) * np.sqrt(2.0 / (n + 1))
    return S


@functools.lru_cache(maxsize=None)
def _eigenvalues_np(n: int) -> np.ndarray:
    k = np.arange(1, n + 1, dtype=np.float64)
    return -4.0 * np.sin(np.pi * k / (2.0 * (n + 1))) ** 2


def sine_basis(n: int, dtype=jnp.float32) -> jnp.ndarray:
    """Orthogonal DST-I basis; constant under jit (built at trace time)."""
    return jnp.asarray(_sine_basis_np(n), dtype=dtype)


def laplacian_eigenvalues(n: int, dtype=jnp.float32) -> jnp.ndarray:
    """Eigenvalues of the 1-D Dirichlet Laplacian ``tridiag(1,-2,1)``."""
    return jnp.asarray(_eigenvalues_np(n), dtype=dtype)


def _dst_solve_scaled(g: jnp.ndarray, n: int) -> jnp.ndarray:
    """Solve ``L u = g`` for the n x n grid (g has shape (..., n, n))."""
    dtype = g.dtype
    S = sine_basis(n, dtype)
    lam = _eigenvalues_np(n)
    h = grid_spacing(n)
    denom = (lam[:, None] + lam[None, :]) / (h * h)
    denom = jnp.asarray(denom, dtype=dtype)
    # HIGHEST precision: the sine transforms set the solver parity floor
    # (<= 1e-6 vs scipy, BASELINE.md). On TPU this uses fp32-accurate passes
    # on the MXU instead of one-pass bf16.
    hi = jax.lax.Precision.HIGHEST
    ghat = jnp.einsum("ij,...jk,kl->...il", S, g, S, precision=hi)
    uhat = ghat / denom
    return jnp.einsum("ij,...jk,kl->...il", S, uhat, S, precision=hi)


def solve_poisson_dst(
    f: jnp.ndarray,
    theta: jnp.ndarray,
    refine_iters: int = 0,
) -> jnp.ndarray:
    """Direct solve of ``diag(theta) L u = f`` on the last two axes.

    Parity target: scipy ``spsolve(diags(theta) @ L, f)`` at reference
    ``data_generation.py:99-102`` (<= 1e-6 in float64; float32 benefits from
    ``refine_iters`` rounds of iterative refinement).
    """
    n = f.shape[-1]
    g = f / theta
    u = _dst_solve_scaled(g, n)
    for _ in range(refine_iters):
        r = g - (apply_operator(jnp.ones_like(theta), u))
        u = u + _dst_solve_scaled(r, n)
    return u
