"""Galerkin geometric multigrid (V-cycle) for the reference Poisson system.

Complements the exact fast-diagonalization solver
(:mod:`~superresolution_for_pdes_tpu.solver.dst`) with an O(N)-ish iterative
path that also serves as a CG preconditioner.  Solves the SPD system
``A u = b`` with ``A = -L``, ``b = -f/theta`` (the reference operator
``diag(theta) @ L`` of ``/root/reference/src/data_generation.py:99`` reduces to
a constant-coefficient solve; see the package docstring).

TPU-first design — everything is a small dense matmul:

* ``-L = B (x) I + I (x) B`` with ``B = -tridiag(1,-2,1)/h^2`` (the truncated
  boundary rows of the reference assembly, ``data_generation.py:49-56``, are
  the Dirichlet truncation).  We keep each level's operator in the separable
  form ``A_l U = B_l U D_l^T + D_l U B_l^T`` — two matmuls per application;
* coarse operators are **Galerkin**: with separable transfers
  ``P = Px (x) Px``, ``R = P^T``, the Galerkin product preserves the separable
  form exactly: ``B_{l+1} = Px^T B_l Px``, ``D_{l+1} = Px^T D_l Px``.  Galerkin
  + SPD guarantees V-cycle convergence (a plain rediscretized hierarchy is
  unstable on the reference's non-nested ``linspace`` vertex grids);
* ``Px`` is the align-corners linear interpolation matrix from
  :mod:`~superresolution_for_pdes_tpu.ops.resize`;
* smoothing is pointwise weighted Jacobi with the exact Galerkin diagonal
  ``diag(A_l)[i,j] = B[i,i] D[j,j] + D[i,i] B[j,j]`` — pure VPU work, batched
  over leading axes for free;
* the coarsest level (<= 10 x 10) is solved exactly by a precomputed dense
  inverse — one matmul.

The whole hierarchy is static numpy built at trace time, so a V-cycle traces
into one XLA program with no dynamic shapes.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from superresolution_for_pdes_tpu.ops.resize import _resize_matrix_np


@functools.lru_cache(maxsize=None)
def _level_sizes(n: int, coarsest: int = 10) -> tuple[int, ...]:
    sizes = [n]
    while sizes[-1] > coarsest:
        sizes.append((sizes[-1] + 1) // 2)
    return tuple(sizes)


@functools.lru_cache(maxsize=None)
def _hierarchy_np(n: int, coarsest: int = 10):
    """Per-level (B, D, diagA, P) + coarsest dense inverse, all float64 numpy."""
    sizes = _level_sizes(n, coarsest)
    h = 1.0 / (n - 1)
    T = np.diag(-2.0 * np.ones(n)) + np.diag(np.ones(n - 1), 1) + np.diag(np.ones(n - 1), -1)
    B = -T / (h * h)
    D = np.eye(n)
    levels = []
    for lvl, nl in enumerate(sizes):
        diagA = np.outer(np.diag(B), np.diag(D)) + np.outer(np.diag(D), np.diag(B))
        if lvl < len(sizes) - 1:
            P = _resize_matrix_np(sizes[lvl + 1], nl, "bilinear")  # (n_fine, n_coarse)
            levels.append((B, D, diagA, P))
            B = P.T @ B @ P
            D = P.T @ D @ P
        else:
            levels.append((B, D, diagA, None))
    nC = sizes[-1]
    A_coarse = np.kron(B, D) + np.kron(D, B)
    A_inv = np.linalg.inv(A_coarse)
    return sizes, levels, A_inv


def _as_jnp(x, dtype):
    return jnp.asarray(x, dtype=dtype)


_HI = jax.lax.Precision.HIGHEST


def _apply_A(B, D, u):
    """``A u = B u D^T + D u B^T`` on the last two axes (batched)."""
    t1 = jnp.einsum("ij,...jk,lk->...il", B, u, D, precision=_HI)
    t2 = jnp.einsum("ij,...jk,lk->...il", D, u, B, precision=_HI)
    return t1 + t2


def _vcycle(u, b, sizes, levels, A_inv, level, pre, post, omega, use_pallas=False):
    B_np, D_np, diagA_np, P_np = levels[level]
    dtype = b.dtype
    B, D = _as_jnp(B_np, dtype), _as_jnp(D_np, dtype)
    inv_diag = _as_jnp(omega / diagA_np, dtype)
    if level == len(sizes) - 1:
        nC = sizes[-1]
        Ai = _as_jnp(A_inv, dtype)
        flat = b.reshape(b.shape[:-2] + (nC * nC,))
        return jnp.einsum("ij,...j->...i", Ai, flat, precision=_HI).reshape(b.shape)
    # Finest level: B is exactly the -tridiag(1,-2,1)/h^2 stencil and D = I, so
    # smoothing and the residual are 5-point stencil work where the fused
    # VMEM-resident Pallas kernels apply; coarser Galerkin operators are dense
    # and stay on the einsum path.
    if use_pallas and level == 0:
        from superresolution_for_pdes_tpu.ops.pallas_stencil import (
            pallas_jacobi_smooth,
            pallas_residual,
        )

        h = 1.0 / (sizes[0] - 1)
        neg_one = jnp.full_like(u, -1.0)
        u = pallas_jacobi_smooth(u, b, h=h, omega=omega, iters=pre)
        r = pallas_residual(neg_one, u, b, h=h)  # b - (-L) u
    else:
        for _ in range(pre):
            u = u + inv_diag * (b - _apply_A(B, D, u))
        r = b - _apply_A(B, D, u)
    P = _as_jnp(P_np, dtype)
    rc = jnp.einsum("fi,...fg,gj->...ij", P, r, P, precision=_HI)  # P^T r P
    ec = _vcycle(jnp.zeros_like(rc), rc, sizes, levels, A_inv, level + 1, pre, post, omega)
    u = u + jnp.einsum("fi,...ij,gj->...fg", P, ec, P, precision=_HI)  # P ec P^T
    if use_pallas and level == 0:
        from superresolution_for_pdes_tpu.ops.pallas_stencil import pallas_jacobi_smooth

        u = pallas_jacobi_smooth(u, b, h=1.0 / (sizes[0] - 1), omega=omega, iters=post)
    else:
        for _ in range(post):
            u = u + inv_diag * (b - _apply_A(B, D, u))
    return u


def vcycle(u: jnp.ndarray, b: jnp.ndarray, pre: int = 2, post: int = 2,
           omega: float = 0.8, use_pallas: bool | None = None) -> jnp.ndarray:
    """One Galerkin V-cycle for ``(-L) u = b`` on the last two axes (batched).

    ``use_pallas`` swaps the finest-level smoother + residual for the fused
    VMEM-resident Pallas kernels. Default (``None``) follows the measured A/B
    (``reports/kernels_tpu.md``, regenerated by ``benchmarks/bench_kernels.py``):
    the Pallas path wins 1.06-1.33x on TPU at n >= 160 and is auto-enabled
    there; smaller grids and CPU/GPU backends keep the einsum path.
    """
    n = b.shape[-1]
    sizes, levels, A_inv = _hierarchy_np(n)
    if use_pallas is None:
        use_pallas = n >= 160 and jax.default_backend() not in ("cpu", "gpu")
    return _vcycle(u, b, sizes, levels, A_inv, 0, pre, post, omega, use_pallas)


def mg_preconditioner(r: jnp.ndarray, use_pallas: bool | None = None) -> jnp.ndarray:
    """One zero-initialized V-cycle — usable as a CG preconditioner."""
    return vcycle(jnp.zeros_like(r), r, use_pallas=use_pallas)


def solve_poisson_mg(
    f: jnp.ndarray,
    theta: jnp.ndarray,
    n_cycles: int = 12,
    pre: int = 2,
    post: int = 2,
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """V-cycle iteration for ``diag(theta) L u = f`` on the last two axes."""
    b = -(f / theta)
    u = jnp.zeros_like(b)
    for _ in range(n_cycles):
        u = vcycle(u, b, pre=pre, post=post, use_pallas=use_pallas)
    return u
