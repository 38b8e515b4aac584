"""Pallas stencil kernels match the XLA reference implementations.

Runs in interpreter mode on the CPU test mesh; the same kernels compile to
Mosaic on TPU.
"""

import numpy as np
import jax.numpy as jnp

from superresolution_for_pdes_tpu.ops.grid import grid_spacing
from superresolution_for_pdes_tpu.ops.pallas_stencil import (
    pallas_apply_operator,
    pallas_jacobi_smooth,
    pallas_residual,
)
from superresolution_for_pdes_tpu.ops.stencil import apply_laplacian, apply_operator, residual


def test_pallas_apply_operator(rng):
    n, b = 40, 3
    u = jnp.asarray(rng.standard_normal((b, n, n)), dtype=jnp.float32)
    theta = jnp.asarray(rng.uniform(0.5, 2.0, size=(b, n, n)), dtype=jnp.float32)
    ref = apply_operator(theta, u)
    out = pallas_apply_operator(theta, u, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-2)


def test_pallas_residual(rng):
    n, b = 20, 2
    u = jnp.asarray(rng.standard_normal((b, n, n)), dtype=jnp.float32)
    theta = jnp.asarray(rng.uniform(0.5, 2.0, size=(b, n, n)), dtype=jnp.float32)
    f = jnp.asarray(rng.standard_normal((b, n, n)), dtype=jnp.float32)
    ref = residual(theta, u, f)
    out = pallas_residual(theta, u, f, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-2)


def test_pallas_jacobi_smooth(rng):
    n, b = 20, 2
    h = grid_spacing(n)
    u = jnp.asarray(rng.standard_normal((b, n, n)), dtype=jnp.float32)
    bb = jnp.asarray(rng.standard_normal((b, n, n)), dtype=jnp.float32)

    def ref_smooth(u, b_, iters=3, omega=0.8):
        scale = omega * h * h / 4.0
        for _ in range(iters):
            r = b_ + apply_laplacian(u, h)
            u = u + scale * r
        return u

    ref = ref_smooth(u, bb)
    out = pallas_jacobi_smooth(u, bb, iters=3, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-4)
