"""Batched conjugate-gradient solver for the reference Poisson system.

Solves ``diag(theta) L u = f`` matrix-free by rewriting it as the SPD system
``A u = b`` with ``A = -L`` and ``b = -f / theta`` (see
:mod:`superresolution_for_pdes_tpu.solver` for why this is exact).

Design notes (TPU):

* the whole batch advances in lock-step inside one ``lax.while_loop`` — no
  per-sample Python control flow; convergence is tracked per batch element and
  converged elements simply stop updating (their step size is zeroed), so the
  loop exits when the *slowest* element converges or at ``max_iters``;
* all reductions are over the trailing two axes, batched over leading axes —
  under ``pjit`` a data-parallel layout keeps these reductions local to a chip;
* optionally preconditioned by one multigrid V-cycle (see
  :mod:`~superresolution_for_pdes_tpu.solver.multigrid`).

Replaces the serial scipy solves of reference ``data_generation.py:102``.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from superresolution_for_pdes_tpu.ops.stencil import apply_laplacian


class _CGState(NamedTuple):
    u: jnp.ndarray
    r: jnp.ndarray
    z: jnp.ndarray
    p: jnp.ndarray
    rz: jnp.ndarray
    it: jnp.ndarray


def _dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched inner product over the trailing two (grid) axes."""
    return jnp.sum(a * b, axis=(-2, -1))


def cg_solve(
    matvec: Callable[[jnp.ndarray], jnp.ndarray],
    b: jnp.ndarray,
    x0: jnp.ndarray | None = None,
    tol: float = 1e-10,
    max_iters: int = 5000,
    precond: Callable[[jnp.ndarray], jnp.ndarray] | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Preconditioned CG on an SPD operator, batched over leading axes.

    Returns ``(u, iterations_used)``. ``tol`` is on the relative residual
    ``||b - A u|| / ||b||`` per batch element.
    """
    if x0 is None:
        x0 = jnp.zeros_like(b)
    if precond is None:
        precond = lambda r: r  # noqa: E731

    b_norm2 = jnp.maximum(_dot(b, b), jnp.finfo(b.dtype).tiny)
    tol2 = (tol * tol) * b_norm2

    r0 = b - matvec(x0)
    z0 = precond(r0)
    state = _CGState(
        u=x0, r=r0, z=z0, p=z0, rz=_dot(r0, z0), it=jnp.zeros((), jnp.int32)
    )

    def cond(s: _CGState) -> jnp.ndarray:
        unconverged = jnp.any(_dot(s.r, s.r) > tol2)
        return jnp.logical_and(unconverged, s.it < max_iters)

    def body(s: _CGState) -> _CGState:
        Ap = matvec(s.p)
        pAp = _dot(s.p, Ap)
        converged = _dot(s.r, s.r) <= tol2
        alpha = jnp.where(converged, 0.0, s.rz / jnp.where(pAp == 0, 1.0, pAp))
        a = alpha[..., None, None]
        u = s.u + a * s.p
        r = s.r - a * Ap
        z = precond(r)
        rz_new = _dot(r, z)
        beta = jnp.where(converged, 0.0, rz_new / jnp.where(s.rz == 0, 1.0, s.rz))
        p = z + beta[..., None, None] * s.p
        return _CGState(u=u, r=r, z=z, p=p, rz=rz_new, it=s.it + 1)

    final = jax.lax.while_loop(cond, body, state)
    return final.u, final.it


def solve_poisson_cg(
    f: jnp.ndarray,
    theta: jnp.ndarray,
    tol: float = 1e-10,
    max_iters: int = 5000,
    precond: Callable[[jnp.ndarray], jnp.ndarray] | None = None,
    x0: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """CG solve of ``diag(theta) L u = f`` on the last two axes (batched)."""
    b = -(f / theta)
    matvec = lambda u: -apply_laplacian(u)  # noqa: E731
    u, _ = cg_solve(matvec, b, x0=x0, tol=tol, max_iters=max_iters, precond=precond)
    return u
