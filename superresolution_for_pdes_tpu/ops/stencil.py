"""Matrix-free 5-point stencil application for the reference Poisson operator.

The reference assembles a sparse matrix ``L`` with main diagonal ``-4/h^2``,
x-neighbor diagonals ``+1/h^2`` with connections cut across row boundaries, and
y-neighbor diagonals ``+1/h^2`` (``/root/reference/src/data_generation.py:35-58``),
then solves ``diag(theta) @ L @ u = f`` (``data_generation.py:99-102``).

Crucially this is *not* a conservative ``div(theta grad u)`` discretization
despite the reference docstring (``data_generation.py:81``): it is the plain
truncated 5-point Laplacian with a pointwise row scaling by theta.  Boundary
rows are simply truncated stencils, i.e. the grid values immediately outside
the n x n vertex grid are implicitly zero.  That makes the matrix-free form a
zero-padded shift stencil:

    (L u)[i, j] = (u[i, j-1] + u[i, j+1] + u[i-1, j] + u[i+1, j] - 4 u[i, j]) / h^2

with out-of-range terms dropped, and ``(A u) = theta * (L u)``.

These functions are pure XLA (pad + slice fuses into a single elementwise
kernel); the Pallas VMEM-resident variant lives in
``superresolution_for_pdes_tpu.ops.pallas_stencil``.  All functions accept
arbitrary leading batch dimensions.
"""

from __future__ import annotations

import jax.numpy as jnp

from superresolution_for_pdes_tpu.ops.grid import grid_spacing


def shift_sum(u: jnp.ndarray) -> jnp.ndarray:
    """Sum of the four zero-padded neighbor shifts over the last two axes."""
    z = jnp.pad(u, [(0, 0)] * (u.ndim - 2) + [(1, 1), (1, 1)])
    core = (slice(None),) * (u.ndim - 2)
    return (
        z[core + (slice(0, -2), slice(1, -1))]
        + z[core + (slice(2, None), slice(1, -1))]
        + z[core + (slice(1, -1), slice(0, -2))]
        + z[core + (slice(1, -1), slice(2, None))]
    )


def apply_laplacian(u: jnp.ndarray, h: float | None = None) -> jnp.ndarray:
    """Matrix-free ``L u`` for the reference's truncated 5-point Laplacian.

    ``u`` has shape ``(..., n, n)``; ``h`` defaults to ``1/(n-1)``
    (reference ``data_generation.py:45``).
    """
    n = u.shape[-1]
    if h is None:
        h = grid_spacing(n)
    inv_h2 = 1.0 / (h * h)
    return (shift_sum(u) - 4.0 * u) * jnp.asarray(inv_h2, dtype=u.dtype)


def apply_operator(theta: jnp.ndarray, u: jnp.ndarray, h: float | None = None) -> jnp.ndarray:
    """``A u = diag(theta) L u`` — the exact reference operator
    (``data_generation.py:99``), matrix-free and batched."""
    return theta * apply_laplacian(u, h)


def residual(theta: jnp.ndarray, u: jnp.ndarray, f: jnp.ndarray, h: float | None = None) -> jnp.ndarray:
    """PDE residual ``f - A u`` on the grid (used by iterative solvers and the
    physics-informed loss; the latter is the feature promised at reference
    ``README.md:152`` but never implemented)."""
    return f - apply_operator(theta, u, h)


def laplacian_dense(n: int, dtype=jnp.float64) -> jnp.ndarray:
    """Dense ``n^2 x n^2`` assembly of the reference Laplacian, for parity tests.

    Row-major flattening ``idx = i*n + j`` (i = row = y, j = col = x), matching
    ``f.reshape(-1)`` at reference ``data_generation.py:95`` and the diagonal
    offsets ``[0, +-1, +-n]`` at ``data_generation.py:54-56`` (x-connections cut
    at row boundaries via ``off_diag[arange(n-1, n2-1, n)] = 0``, ``:51``).
    """
    import numpy as np

    h = grid_spacing(n)
    n2 = n * n
    L = np.zeros((n2, n2), dtype=np.float64)
    for i in range(n):
        for j in range(n):
            r = i * n + j
            L[r, r] = -4.0
            if j > 0:
                L[r, r - 1] = 1.0
            if j < n - 1:
                L[r, r + 1] = 1.0
            if i > 0:
                L[r, r - n] = 1.0
            if i < n - 1:
                L[r, r + n] = 1.0
    return jnp.asarray(L / (h * h), dtype=dtype)
