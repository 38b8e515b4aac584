"""Parity of the matrix-free stencil with the reference sparse operator."""

import numpy as np
import jax.numpy as jnp
import pytest

from superresolution_for_pdes_tpu.ops.stencil import (
    apply_laplacian,
    apply_operator,
    laplacian_dense,
    residual,
)


@pytest.mark.parametrize("n", [5, 8, 20, 40])
def test_dense_assembly_matches_reference_formula(n, reference_laplacian):
    ours = np.asarray(laplacian_dense(n))
    ref = reference_laplacian(n).toarray()
    np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-12)


@pytest.mark.parametrize("n", [5, 20, 40])
def test_matrix_free_matvec_matches_dense(n, rng, reference_laplacian):
    u = rng.standard_normal((n, n))
    ref = (reference_laplacian(n) @ u.reshape(-1)).reshape(n, n)
    ours = np.asarray(apply_laplacian(jnp.asarray(u)))
    np.testing.assert_allclose(ours, ref, rtol=1e-12, atol=1e-9)


@pytest.mark.parametrize("n", [20, 40])
def test_operator_with_theta_matches_reference(n, rng, reference_laplacian):
    from scipy.sparse import diags

    u = rng.standard_normal((n, n))
    theta = rng.uniform(0.5, 2.0, size=(n, n))
    L = reference_laplacian(n)
    ref = (diags(theta.reshape(-1)) @ L @ u.reshape(-1)).reshape(n, n)
    ours = np.asarray(apply_operator(jnp.asarray(theta), jnp.asarray(u)))
    np.testing.assert_allclose(ours, ref, rtol=1e-12, atol=1e-9)


def test_batched_and_residual(rng):
    n, b = 16, 7
    u = rng.standard_normal((b, n, n))
    theta = rng.uniform(0.5, 2.0, size=(b, n, n))
    f = rng.standard_normal((b, n, n))
    out = apply_operator(jnp.asarray(theta), jnp.asarray(u))
    assert out.shape == (b, n, n)
    singles = np.stack(
        [np.asarray(apply_operator(jnp.asarray(theta[i]), jnp.asarray(u[i]))) for i in range(b)]
    )
    np.testing.assert_allclose(np.asarray(out), singles, rtol=1e-12, atol=1e-12)
    r = residual(jnp.asarray(theta), jnp.asarray(u), jnp.asarray(f))
    np.testing.assert_allclose(np.asarray(r), f - np.asarray(out), rtol=1e-12, atol=1e-12)
