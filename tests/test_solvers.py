"""Solver parity vs the scipy reference path (gate: <= 1e-6, BASELINE.md)."""

import numpy as np
import jax.numpy as jnp
import pytest

from superresolution_for_pdes_tpu.ops.grid import forcing_term
from superresolution_for_pdes_tpu.solver import (
    solve_poisson,
    solve_poisson_cg,
    solve_poisson_dst,
    solve_poisson_mg,
)


def _problem(n, rng, varying_theta=True):
    f = np.asarray(forcing_term(1.7, 2.3, n, dtype=jnp.float64))
    if varying_theta:
        theta = rng.uniform(0.5, 2.0, size=(n, n))
    else:
        theta = np.ones((n, n))
    return f, theta


@pytest.mark.parametrize("n", [20, 40, 80])
@pytest.mark.parametrize("varying_theta", [False, True])
def test_dst_parity_vs_scipy(n, varying_theta, rng, reference_solve):
    f, theta = _problem(n, rng, varying_theta)
    ref = reference_solve(f, theta)
    ours = np.asarray(solve_poisson_dst(jnp.asarray(f), jnp.asarray(theta)))
    assert np.max(np.abs(ours - ref)) <= 1e-6


def test_dst_batched(rng, reference_solve):
    n, b = 40, 4
    fs, thetas, refs = [], [], []
    for i in range(b):
        f, theta = _problem(n, rng)
        fs.append(f)
        thetas.append(theta)
        refs.append(reference_solve(f, theta))
    u = np.asarray(solve_poisson_dst(jnp.asarray(np.stack(fs)), jnp.asarray(np.stack(thetas))))
    assert np.max(np.abs(u - np.stack(refs))) <= 1e-6


@pytest.mark.parametrize("n", [20, 40])
def test_cg_parity_vs_scipy(n, rng, reference_solve):
    f, theta = _problem(n, rng)
    ref = reference_solve(f, theta)
    ours = np.asarray(solve_poisson_cg(jnp.asarray(f), jnp.asarray(theta), tol=1e-12))
    assert np.max(np.abs(ours - ref)) <= 1e-6


def test_mgcg_parity_vs_scipy(rng, reference_solve):
    n = 40
    f, theta = _problem(n, rng)
    ref = reference_solve(f, theta)
    ours = np.asarray(solve_poisson(jnp.asarray(f), jnp.asarray(theta), method="mgcg", tol=1e-12))
    assert np.max(np.abs(ours - ref)) <= 1e-6


def test_mg_converges(rng, reference_solve):
    n = 40
    f, theta = _problem(n, rng)
    ref = reference_solve(f, theta)
    ours = np.asarray(solve_poisson_mg(jnp.asarray(f), jnp.asarray(theta), n_cycles=25))
    assert np.max(np.abs(ours - ref)) <= 1e-6


def test_float32_with_refinement(rng, reference_solve):
    """On-device dtype path: float32 + iterative refinement stays accurate."""
    n = 40
    f, theta = _problem(n, rng)
    ref = reference_solve(f, theta)
    u32 = np.asarray(
        solve_poisson_dst(
            jnp.asarray(f, dtype=jnp.float32), jnp.asarray(theta, dtype=jnp.float32),
            refine_iters=2,
        )
    )
    # float32 storage limits absolute accuracy; solutions are O(1e-2).
    assert np.max(np.abs(u32 - ref)) <= 5e-6


def test_mgcg_at_scale_640(rng):
    """Iterative path at the reference's largest problem: 640^2 = 409,600
    unknowns (the spsolve of ``resolution_comparison.py:61-73``). f64 MGCG vs
    the exact DST solve; also checks the V-cycle contracts the residual enough
    that MGCG converges in few iterations (the point of the MG hierarchy)."""
    n = 640
    f, theta = _problem(n, rng)
    fj, tj = jnp.asarray(f), jnp.asarray(theta)
    exact = np.asarray(solve_poisson_dst(fj, tj))

    from superresolution_for_pdes_tpu.solver.cg import cg_solve
    from superresolution_for_pdes_tpu.solver.multigrid import mg_preconditioner
    from superresolution_for_pdes_tpu.ops.stencil import apply_laplacian

    b = -(fj / tj)
    u, iters = cg_solve(lambda v: -apply_laplacian(v), b, tol=1e-10,
                        max_iters=60, precond=mg_preconditioner)
    iters = int(iters)
    err = np.max(np.abs(np.asarray(u) - exact))
    assert err <= 1e-6, (err, iters)
    assert iters <= 40, iters  # MG preconditioning must keep CG iteration-flat


def test_vcycle_pallas_smoother_matches_einsum(rng):
    """The fused Pallas finest-level smoother (interpreter mode on CPU) must
    reproduce the einsum Jacobi V-cycle bitwise-closely."""
    from superresolution_for_pdes_tpu.solver.multigrid import vcycle

    n = 40
    f, theta = _problem(n, rng)
    b = jnp.asarray(-(f / theta), jnp.float32)
    u0 = jnp.zeros_like(b)
    ref = np.asarray(vcycle(u0, b, use_pallas=False))
    pal = np.asarray(vcycle(u0, b, use_pallas=True))
    np.testing.assert_allclose(pal, ref, rtol=1e-5, atol=1e-7)
