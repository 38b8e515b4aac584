"""Native C++ oracle: builds, matches scipy and the JAX solvers."""

import numpy as np
import jax.numpy as jnp
import pytest

from superresolution_for_pdes_tpu.ops.grid import forcing_term
from superresolution_for_pdes_tpu.solver import solve_poisson_dst

native = pytest.importorskip("superresolution_for_pdes_tpu.native")


def test_native_apply_matches_reference(rng, reference_laplacian):
    from scipy.sparse import diags

    n = 24
    u = rng.standard_normal((n, n))
    theta = rng.uniform(0.5, 2.0, size=(n, n))
    ref = (diags(theta.reshape(-1)) @ reference_laplacian(n) @ u.reshape(-1)).reshape(n, n)
    out = native.apply_operator(theta, u)
    np.testing.assert_allclose(out, ref, rtol=1e-12, atol=1e-9)


def test_native_cg_matches_scipy_and_dst(rng, reference_solve):
    n = 40
    f = np.asarray(forcing_term(2.2, 3.1, n, dtype=jnp.float64))
    theta = rng.uniform(0.5, 2.0, size=(n, n))
    ref = reference_solve(f, theta)
    u_native = native.solve_cg(f, theta)
    assert np.max(np.abs(u_native - ref)) <= 1e-8
    u_dst = np.asarray(solve_poisson_dst(jnp.asarray(f), jnp.asarray(theta)))
    assert np.max(np.abs(u_native - u_dst)) <= 1e-8


def test_native_batched(rng):
    n, b = 20, 6
    f = rng.standard_normal((b, n, n))
    theta = np.ones((b, n, n))
    u = native.solve_cg(f, theta)
    assert u.shape == (b, n, n)
    resid = native.apply_operator(theta, u) - f
    assert np.max(np.abs(resid)) <= 1e-6
