"""Normalization statistics and model-input assembly (PDEDataset semantics).

Replicates the reference ``PDEDataset`` pipeline
(``/root/reference/src/models.py:132-207``) as pure functions over a stats
pytree:

* stats are mean/std of ``u`` (computed from the *fine* solutions), ``f`` and
  ``theta`` over the whole split (``models.py:154-168``); ``std`` is torch's
  default **unbiased** estimator;
* theta-constant detection: ``std(theta) < 1e-6`` disables theta normalization
  by pinning ``(mean, std) = (0, 1)`` (``models.py:161-165``) — the channel
  passes through untouched;
* ``u_coarse`` is normalized with ``u_fine``'s statistics (``models.py:171-172``)
  and bilinearly upsampled to the fine grid with ``align_corners=True``
  (``models.py:182-187``);
* the model input stacks ``[upsampled u_coarse, theta, f]``
  (``models.py:192-203``) — NHWC here (TPU conv layout) instead of NCHW.

TPU-build extensions beyond the reference:

* :func:`per_sample_stats` — self-normalization from each sample's *own* known
  fields (coarse input, forcing, coefficient), giving cascade inference a
  fully local ``stats_mode="tile"`` that needs no oracle/scene statistics;
* ``scale_channels`` — appends ``log(u_std)/10`` and ``log(f_std)/10`` as
  constant input channels so per-sample normalization stops destroying
  amplitude information (scale-aware self-normalization, round-1 VERDICT #1).

Everything is a registered pytree and traced-code safe (the cascade computes
scene stats *inside* one fused XLA program), so constancy detection uses
``jnp.where``-style selects, never Python branches.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from superresolution_for_pdes_tpu.ops.resize import resize_align_corners

# Reference ``models.py:161``: theta is treated as constant when the split-wide
# std is below 1e-6 (and normalization is skipped for that channel).
THETA_CONSTANT_TOL = 1e-6

# Guard for degenerate per-sample scales (an all-zero tile would otherwise
# produce 0/0 in normalization); dataset-level stats never hit this.
_STD_FLOOR = 1e-20

# Offset inside the log so a (guarded) zero scale stays finite; /10 keeps the
# channel in a CNN-friendly O(1) range for scales between 1e-30 and 1e+10.
_LOG_EPS = 1e-30


class NormStats(struct.PyTreeNode):
    """Normalization statistics pytree.

    Fields are scalars for split-level stats (reference parity) or
    ``(B, 1, 1)`` arrays for per-sample/per-tile self-normalization — all
    downstream math broadcasts over either shape.
    """

    u_mean: jnp.ndarray
    u_std: jnp.ndarray
    f_mean: jnp.ndarray
    f_std: jnp.ndarray
    theta_mean: jnp.ndarray
    theta_std: jnp.ndarray
    theta_is_constant: jnp.ndarray

    # --- u (solution) ---
    def normalize_u(self, u: jnp.ndarray) -> jnp.ndarray:
        return (u - self.u_mean) / self.u_std

    def denormalize_u(self, u_norm: jnp.ndarray) -> jnp.ndarray:
        """Inverse of :meth:`normalize_u` (reference ``models.py:205-207``)."""
        return u_norm * self.u_std + self.u_mean

    # --- f (forcing) ---
    def normalize_f(self, f: jnp.ndarray) -> jnp.ndarray:
        return (f - self.f_mean) / self.f_std

    # --- theta (coefficient) ---
    def normalize_theta(self, theta: jnp.ndarray) -> jnp.ndarray:
        """No-op when constant: (mean, std) are pinned to (0, 1) then."""
        return (theta - self.theta_mean) / self.theta_std

    @classmethod
    def from_fields(
        cls, u: jnp.ndarray, f: jnp.ndarray, theta: jnp.ndarray
    ) -> "NormStats":
        """Split-level stats from raw fields (traced-code safe).

        ``u`` should be the fine-grid solutions — the reference normalizes
        the coarse inputs with the fine stats (``models.py:171-172``).
        """
        is_const = jnp.std(theta, ddof=1) < THETA_CONSTANT_TOL
        return cls(
            u_mean=jnp.mean(u),
            u_std=jnp.std(u, ddof=1),
            f_mean=jnp.mean(f),
            f_std=jnp.std(f, ddof=1),
            theta_mean=jnp.where(is_const, 0.0, jnp.mean(theta)),
            theta_std=jnp.where(is_const, 1.0, jnp.std(theta, ddof=1)),
            theta_is_constant=is_const,
        )

    @classmethod
    def from_dataset(cls, dataset: Dict[str, jnp.ndarray]) -> "NormStats":
        """Stats from a dataset dict (u from ``u_fine``; ``models.py:154-168``)."""
        return cls.from_fields(
            dataset["u_fine"], dataset["f_fine"], dataset["theta_fine"]
        )


def per_sample_stats(
    u_coarse: jnp.ndarray,  # (B, h, w)
    f_fine: jnp.ndarray,    # (B, H, W)
    theta_fine: jnp.ndarray,
) -> NormStats:
    """Self-normalization stats from each sample's own KNOWN fields.

    Unlike the reference's oracle ``GlobalNormalization`` (which reads the
    ground-truth fine solution at inference,
    ``/root/reference/src/resolution_comparison.py:196-201``), every statistic
    here is computable at deployment: the u-scale comes from the *coarse
    input*, f/theta from the given fine-grid fields. Shapes are ``(B, 1, 1)``
    so normalization broadcasts per sample (or per cascade tile).
    """

    def _ms(x):
        mean = jnp.mean(x, axis=(-2, -1), keepdims=True)
        std = jnp.std(x, axis=(-2, -1), ddof=1, keepdims=True)
        return mean, jnp.maximum(std, _STD_FLOOR)

    u_mean, u_std = _ms(u_coarse)
    f_mean, f_std = _ms(f_fine)
    t_mean, t_std = _ms(theta_fine)
    is_const = jnp.std(theta_fine, axis=(-2, -1), ddof=1, keepdims=True) < THETA_CONSTANT_TOL
    return NormStats(
        u_mean=u_mean,
        u_std=u_std,
        f_mean=f_mean,
        f_std=f_std,
        theta_mean=jnp.where(is_const, 0.0, t_mean),
        theta_std=jnp.where(is_const, 1.0, t_std),
        theta_is_constant=is_const,
    )


def make_model_inputs(
    u_coarse: jnp.ndarray,   # (..., h, w)
    f_fine: jnp.ndarray,     # (..., H, W)
    theta_fine: jnp.ndarray,
    stats: NormStats,
    fine_shape: Optional[Tuple[int, int]] = None,
    scale_channels: bool = False,
) -> jnp.ndarray:
    """NHWC model input ``[u_up, theta, f]`` (+ optional log-scale channels).

    The coarse solution is normalized with the u statistics, bilinearly
    upsampled to the fine grid with align-corners (reference
    ``models.py:171-187``), then stacked with the (conditionally) normalized
    coefficient and forcing channels (``models.py:192-203``).

    ``scale_channels=True`` appends ``log(u_std + eps)/10`` and
    ``log(f_std + eps)/10`` broadcast across the grid — constant per sample —
    so a per-sample-normalized model still sees absolute amplitude (the
    scale-aware self-normalization recipe).
    """
    if fine_shape is None:
        fine_shape = (f_fine.shape[-2], f_fine.shape[-1])
    u_up = resize_align_corners(stats.normalize_u(u_coarse), tuple(fine_shape), "bilinear")
    channels = [u_up, stats.normalize_theta(theta_fine), stats.normalize_f(f_fine)]
    if scale_channels:
        log_u = jnp.log(stats.u_std + _LOG_EPS) / 10.0
        log_f = jnp.log(stats.f_std + _LOG_EPS) / 10.0
        channels.append(jnp.broadcast_to(log_u, f_fine.shape).astype(f_fine.dtype))
        channels.append(jnp.broadcast_to(log_f, f_fine.shape).astype(f_fine.dtype))
    return jnp.stack(channels, axis=-1)


def make_targets(u_fine: jnp.ndarray, stats: NormStats) -> jnp.ndarray:
    """Normalized NHWC training target (single channel)."""
    return stats.normalize_u(u_fine)[..., None]
