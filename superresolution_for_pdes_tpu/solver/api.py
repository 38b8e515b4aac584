"""Unified facade over the Poisson solver backends.

Replaces ``PoissonSolver.solve_poisson`` (reference
``/root/reference/src/data_generation.py:79-104``) with a batched, jittable
function. All backends solve the *exact* reference system
``diag(theta) L u = f`` (pointwise theta scaling, truncated 5-point Laplacian,
``h = 1/(n-1)`` vertex grids).
"""

from __future__ import annotations

import jax.numpy as jnp

from superresolution_for_pdes_tpu.solver.cg import solve_poisson_cg
from superresolution_for_pdes_tpu.solver.dst import solve_poisson_dst
from superresolution_for_pdes_tpu.solver.multigrid import mg_preconditioner, solve_poisson_mg


def solve_poisson(
    f: jnp.ndarray,
    theta: jnp.ndarray,
    method: str = "dst",
    **kwargs,
) -> jnp.ndarray:
    """Solve ``diag(theta) L u = f`` on the last two axes (batched).

    Args:
        f: forcing term, shape ``(..., n, n)``.
        theta: diffusion coefficient, same shape (or broadcastable).
        method: ``"dst"`` (exact fast diagonalization — the default and the
            datagen hot path), ``"cg"``, ``"mgcg"`` (multigrid-preconditioned
            CG) or ``"mg"`` (V-cycle iteration).
        **kwargs: backend-specific options (``refine_iters``, ``tol``,
            ``max_iters``, ``n_cycles``, ...).

    Returns:
        Solution ``u`` with the same shape as ``f``.
    """
    theta = jnp.broadcast_to(jnp.asarray(theta, dtype=f.dtype), f.shape)
    if method == "dst":
        return solve_poisson_dst(f, theta, **kwargs)
    if method == "cg":
        return solve_poisson_cg(f, theta, **kwargs)
    if method == "mgcg":
        kwargs.setdefault("precond", mg_preconditioner)
        return solve_poisson_cg(f, theta, **kwargs)
    if method == "mg":
        return solve_poisson_mg(f, theta, **kwargs)
    raise ValueError(f"unknown solver method: {method!r}")
