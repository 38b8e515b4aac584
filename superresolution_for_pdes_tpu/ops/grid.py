"""Grids and analytic forcing terms for the 2-D Poisson problem on [0, 1]^2.

Reference semantics (``/root/reference/src/data_generation.py``):

* grids are vertex-centered ``linspace(0, 1, n)`` in each dimension
  (``data_generation.py:22-25``), so the mesh spacing is ``h = 1/(n-1)``;
* the forcing term is ``f(x, y) = sin(2*pi*k1*x) * sin(2*pi*k2*y)`` evaluated on
  ``meshgrid(x, y)`` (``data_generation.py:60-77``); with numpy's default
  ``indexing='xy'`` this means ``f[i, j] = sin(2*pi*k1*x[j]) * sin(2*pi*k2*y[i])``
  (row index = y, column index = x).

Everything here is pure JAX and shape-static so it fuses under ``jit`` and
``vmap`` (batched k1/k2 for on-device dataset generation).
"""

from __future__ import annotations

import jax.numpy as jnp


def make_grid(n: int, dtype=jnp.float32) -> jnp.ndarray:
    """1-D vertex grid ``linspace(0, 1, n)`` (reference ``data_generation.py:22``)."""
    return jnp.linspace(0.0, 1.0, n, dtype=dtype)


def make_meshgrid(n: int, dtype=jnp.float32):
    """``(X, Y) = meshgrid(x, y)`` with numpy 'xy' indexing.

    ``X[i, j] = x[j]`` and ``Y[i, j] = y[i]`` — matches
    ``np.meshgrid(self.x, self.y)`` at reference ``data_generation.py:28-29``.
    """
    g = make_grid(n, dtype)
    X, Y = jnp.meshgrid(g, g, indexing="xy")
    return X, Y


def grid_spacing(n: int) -> float:
    """Mesh spacing ``h = 1/(n-1)`` (reference ``data_generation.py:45``)."""
    return 1.0 / (n - 1)


def forcing_term(k1, k2, n: int, dtype=jnp.float32) -> jnp.ndarray:
    """Forcing ``f = sin(2*pi*k1*X) * sin(2*pi*k2*Y)`` on the n x n vertex grid.

    Matches reference ``data_generation.py:77``. ``k1``/``k2`` may be traced
    scalars, so this vmaps cleanly over a batch of wave numbers.
    """
    X, Y = make_meshgrid(n, dtype)
    two_pi = 2.0 * jnp.pi
    return jnp.sin(two_pi * k1 * X) * jnp.sin(two_pi * k2 * Y)
