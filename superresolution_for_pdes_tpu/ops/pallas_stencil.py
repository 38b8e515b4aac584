"""Pallas TPU kernels for the 5-point stencil hot ops.

The XLA versions in :mod:`~superresolution_for_pdes_tpu.ops.stencil` already
fuse well; these Pallas kernels keep the *whole* smoothing / residual pipeline
resident in VMEM for the multigrid and physics-loss hot paths, avoiding one
HBM round-trip per op:

* :func:`pallas_apply_operator` — fused ``theta * (L u)`` (the reference
  operator ``diag(theta) @ L`` of ``/root/reference/src/data_generation.py:99``);
* :func:`pallas_residual` — fused ``f - theta * (L u)``;
* :func:`pallas_jacobi_smooth` — ``iters`` fused weighted-Jacobi sweeps for
  ``(-L) u = b`` without leaving VMEM.

Grid layout: one program per batch element; each program holds the full
``(n, n)`` slab in VMEM (640^2 float32 = 1.6 MB « 16 MB VMEM). Neighbor shifts
use ``pltpu.roll`` + iota masks (no unaligned concatenations). Falls back to
interpreter mode off-TPU so the CPU test mesh exercises identical code.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _shift_sum_vmem(u: jnp.ndarray) -> jnp.ndarray:
    """Sum of the four zero-padded neighbor shifts of a 2-D VMEM block.

    Accumulates shift-by-shift (rather than materializing all four shifted
    copies at once) to keep peak VMEM pressure low — at 640^2 float32 the
    four-live-temporaries version exceeds the 16 MB scoped-vmem limit.
    """
    n_rows, n_cols = u.shape
    row = jax.lax.broadcasted_iota(jnp.int32, u.shape, 0)
    col = jax.lax.broadcasted_iota(jnp.int32, u.shape, 1)
    # pltpu.roll requires non-negative shifts: shift by size-1 == shift by -1.
    acc = jnp.where(row < n_rows - 1, pltpu.roll(u, n_rows - 1, 0), 0.0)      # u[i+1, j]
    acc = acc + jnp.where(row > 0, pltpu.roll(u, 1, 0), 0.0)                  # u[i-1, j]
    acc = acc + jnp.where(col < n_cols - 1, pltpu.roll(u, n_cols - 1, 1), 0.0)  # u[i, j+1]
    acc = acc + jnp.where(col > 0, pltpu.roll(u, 1, 1), 0.0)                  # u[i, j-1]
    return acc


def _apply_op_kernel(theta_ref, u_ref, h2_ref, out_ref):
    u = u_ref[0]
    lap = (_shift_sum_vmem(u) - 4.0 * u) / h2_ref[0]
    out_ref[0] = theta_ref[0] * lap


def _residual_kernel(theta_ref, u_ref, f_ref, h2_ref, out_ref):
    u = u_ref[0]
    lap = (_shift_sum_vmem(u) - 4.0 * u) / h2_ref[0]
    out_ref[0] = f_ref[0] - theta_ref[0] * lap


def _jacobi_kernel(u_ref, b_ref, h2_ref, omega_ref, out_ref, *, iters: int):
    u = u_ref[0]
    b = b_ref[0]
    h2 = h2_ref[0]
    scale = omega_ref[0] * h2 / 4.0
    for _ in range(iters):
        lap = (_shift_sum_vmem(u) - 4.0 * u) / h2
        r = b + lap  # b - (-L) u
        u = u + scale * r
    out_ref[0] = u


def _run(kernel, n_tensors, n, *args, interpret):
    """Invoke ``kernel`` over a (batch,) grid: ``n_tensors`` VMEM slab inputs
    followed by scalar SMEM inputs, one VMEM slab output."""
    batch = args[0].shape[0]
    slab = pl.BlockSpec((1, n, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    scalar = pl.BlockSpec(memory_space=pltpu.SMEM)
    in_specs = [slab] * n_tensors + [scalar] * (len(args) - n_tensors)
    return pl.pallas_call(
        kernel,
        grid=(batch,),
        in_specs=in_specs,
        out_specs=slab,
        out_shape=jax.ShapeDtypeStruct((batch, n, n), args[0].dtype),
        interpret=interpret,
    )(*args)


def _prep(x: jnp.ndarray) -> tuple[jnp.ndarray, tuple[int, ...]]:
    """Flatten leading axes into one batch axis."""
    n = x.shape[-1]
    lead = x.shape[:-2]
    return x.reshape((-1, n, n)), lead


def pallas_apply_operator(theta: jnp.ndarray, u: jnp.ndarray, h: float | None = None,
                          interpret: bool | None = None) -> jnp.ndarray:
    """Fused ``diag(theta) L u`` as a Pallas kernel (batched)."""
    n = u.shape[-1]
    if h is None:
        h = 1.0 / (n - 1)
    if interpret is None:
        interpret = not _on_tpu()
    uf, lead = _prep(u)
    tf = jnp.broadcast_to(theta, u.shape).reshape(uf.shape)
    h2 = jnp.asarray([h * h], dtype=u.dtype)
    out = _run(_apply_op_kernel, 2, n, tf, uf, h2, interpret=interpret)
    return out.reshape(lead + (n, n))


def pallas_residual(theta: jnp.ndarray, u: jnp.ndarray, f: jnp.ndarray,
                    h: float | None = None, interpret: bool | None = None) -> jnp.ndarray:
    """Fused ``f - diag(theta) L u`` as a Pallas kernel (batched)."""
    n = u.shape[-1]
    if h is None:
        h = 1.0 / (n - 1)
    if interpret is None:
        interpret = not _on_tpu()
    uf, lead = _prep(u)
    tf = jnp.broadcast_to(theta, u.shape).reshape(uf.shape)
    ff = jnp.broadcast_to(f, u.shape).reshape(uf.shape)
    h2 = jnp.asarray([h * h], dtype=u.dtype)
    out = _run(_residual_kernel, 3, n, tf, uf, ff, h2, interpret=interpret)
    return out.reshape(lead + (n, n))


def pallas_jacobi_smooth(u: jnp.ndarray, b: jnp.ndarray, h: float | None = None,
                         omega: float = 0.8, iters: int = 2,
                         interpret: bool | None = None) -> jnp.ndarray:
    """``iters`` fused weighted-Jacobi sweeps for ``(-L) u = b``, VMEM-resident."""
    n = u.shape[-1]
    if h is None:
        h = 1.0 / (n - 1)
    if interpret is None:
        interpret = not _on_tpu()
    uf, lead = _prep(u)
    bf = jnp.broadcast_to(b, u.shape).reshape(uf.shape)
    h2 = jnp.asarray([h * h], dtype=u.dtype)
    om = jnp.asarray([omega], dtype=u.dtype)
    kernel = functools.partial(_jacobi_kernel, iters=iters)
    out = _run(kernel, 2, n, uf, bf, h2, om, interpret=interpret)
    return out.reshape(lead + (n, n))
