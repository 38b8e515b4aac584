"""Align-corners bilinear/bicubic resizing as dense interpolation matmuls.

The reference leans on ``torch.nn.functional.interpolate(..., mode='bilinear'|
'bicubic', align_corners=True)`` in ~10 call sites (input upsampling at
``src/models.py:182-187``, in-model 2x upsampling at ``src/models.py:70``,
attention-gate resizing at ``src/models.py:126``, the cascade hot path at
``src/resolution_comparison.py:101-106`` and the direct baselines at
``src/resolution_comparison.py:415-420``).

``jax.image.resize`` implements half-pixel sampling, *not* align-corners, so we
implement align-corners semantics exactly — but TPU-first: separable
interpolation is a pair of small dense matmuls ``out = M @ u @ M^T`` that XLA
maps straight onto the MXU and batches for free.  The matrices are built with
numpy at trace time (static shapes), so under ``jit`` they are constants.

Bicubic uses the Keys cubic-convolution kernel with ``a = -0.75`` and clamped
(border-replicated) source indices — bit-for-bit the algorithm of torch's
``upsample_bicubic2d`` with ``align_corners=True``.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


def _cubic_kernel(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Keys cubic convolution kernel (torch uses a = -0.75)."""
    t = np.abs(t)
    out = np.where(
        t <= 1.0,
        (a + 2.0) * t**3 - (a + 3.0) * t**2 + 1.0,
        np.where(t < 2.0, a * t**3 - 5.0 * a * t**2 + 8.0 * a * t - 4.0 * a, 0.0),
    )
    return out


@functools.lru_cache(maxsize=None)
def _resize_matrix_np(in_size: int, out_size: int, method: str) -> np.ndarray:
    """(out_size, in_size) 1-D align-corners interpolation matrix."""
    if in_size == out_size:
        return np.eye(out_size, dtype=np.float64)
    if out_size == 1:
        scale = 0.0
    else:
        scale = (in_size - 1) / (out_size - 1)
    src = np.arange(out_size, dtype=np.float64) * scale
    M = np.zeros((out_size, in_size), dtype=np.float64)
    if method in ("bilinear", "linear"):
        lo = np.clip(np.floor(src).astype(np.int64), 0, in_size - 1)
        hi = np.minimum(lo + 1, in_size - 1)
        w = src - lo
        for i in range(out_size):
            M[i, lo[i]] += 1.0 - w[i]
            M[i, hi[i]] += w[i]
    elif method in ("bicubic", "cubic"):
        base = np.floor(src).astype(np.int64)
        frac = src - base
        for i in range(out_size):
            for tap in range(-1, 3):
                j = int(np.clip(base[i] + tap, 0, in_size - 1))
                M[i, j] += float(_cubic_kernel(np.array(tap - frac[i])))
    else:
        raise ValueError(f"unknown resize method: {method!r}")
    return M


def resize_matrix(in_size: int, out_size: int, method: str = "bilinear", dtype=jnp.float32) -> jnp.ndarray:
    """Return the (out_size, in_size) align-corners interpolation matrix."""
    return jnp.asarray(_resize_matrix_np(in_size, out_size, method), dtype=dtype)


def resize_align_corners(
    u: jnp.ndarray,
    out_shape: tuple[int, int],
    method: str = "bilinear",
) -> jnp.ndarray:
    """Resize the last two axes of ``u`` to ``out_shape`` with align-corners.

    Matches ``F.interpolate(u, size=out_shape, mode=method, align_corners=True)``
    (reference call sites listed in the module docstring).  Any leading batch /
    channel axes are preserved; the two contractions compile to MXU matmuls.
    """
    in_h, in_w = u.shape[-2], u.shape[-1]
    out_h, out_w = out_shape
    My = resize_matrix(in_h, out_h, method, dtype=u.dtype)
    Mx = resize_matrix(in_w, out_w, method, dtype=u.dtype)
    # Full-precision matmuls: interpolation is accuracy-critical (parity gates)
    # and these matrices are tiny, so HIGHEST costs nothing at scale.
    hi = jax.lax.Precision.HIGHEST
    # rows: (..., in_h, in_w) -> (..., out_h, in_w)
    t = jnp.einsum("oi,...iw->...ow", My, u, precision=hi)
    # cols: (..., out_h, in_w) -> (..., out_h, out_w)
    return jnp.einsum("...hw,ow->...ho", t, Mx, precision=hi)


def upsample2x(u: jnp.ndarray, method: str = "bilinear") -> jnp.ndarray:
    """Double the spatial size of the last two axes (align-corners), matching
    ``nn.Upsample(scale_factor=2, mode='bilinear', align_corners=True)`` at
    reference ``src/models.py:70``."""
    h, w = u.shape[-2], u.shape[-1]
    return resize_align_corners(u, (2 * h, 2 * w), method)


def downsample_stride(u: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Strided ``[::factor, ::factor]`` downsampling of the last two axes
    (reference ``src/enhanced_data_generation.py:85-96`` and
    ``src/resolution_comparison.py:57-58``).  Note this drops trailing
    rows/cols and is *not* the same point set as ``linspace(0,1,n/factor)`` —
    a documented reference quirk that we replicate exactly."""
    core = (slice(None),) * (u.ndim - 2)
    return u[core + (slice(None, None, factor), slice(None, None, factor))]
