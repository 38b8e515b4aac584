"""Regime expert routing (TPU-build extension).

The reference trains one model on theta == 1 data and evaluates it on both
theta regimes (``/root/reference/src/compare_test_cases.py:585-616``); a
mixed-theta model trades theta-robustness for theta==1 accuracy (round-1
finding). Deployment answer: experts routed by the *input* fields only —

* **theta regime**: the same theta-constant detector the normalization layer
  already uses (``std(theta) < 1e-6``, reference ``models.py:161-165``);
* **wavenumber regime** (optional third expert): the dominant forcing
  frequency estimated by an FFT peak over the known ``f`` channel — the
  reference's out-of-sample sets (k in (6, 8), ``compare_test_cases.py:599``)
  are exactly a high-k shift a single low-k-trained model handles poorly.

Both detectors see only known inputs (never the fine solution), so routing is
an honest inference-time decision.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp

from superresolution_for_pdes_tpu.data.normalization import THETA_CONSTANT_TOL


def _subbin_offset(slice_mag: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """Fractional-bin refinement of a spectral peak at integer bin ``m``.

    Two-bin estimator: for a truncated sinusoid the leakage magnitude falls
    off ~1/|k - bin|, so with the larger neighbor ``|X(m±1)|`` the offset is
    ``delta = |X(m±1)| / (|X(m)| + |X(m±1)|)`` toward that neighbor — exact
    under the 1/offset kernel, and ~±0.1 bins in practice on the generators'
    ``sin(2 pi k x)`` forcings. Grid-aligned integer k has no leakage and
    refines to delta ≈ 0.
    """
    n = slice_mag.shape[-1]
    left = jnp.take_along_axis(slice_mag, jnp.maximum(m - 1, 0)[..., None], -1)[..., 0]
    cent = jnp.take_along_axis(slice_mag, m[..., None], -1)[..., 0]
    right = jnp.take_along_axis(slice_mag, jnp.minimum(m + 1, n - 1)[..., None], -1)[..., 0]
    use_right = right >= left
    nb = jnp.where(use_right, right, left)
    delta = nb / jnp.maximum(cent + nb, 1e-30)
    return jnp.where(use_right, delta, -delta)


def estimate_wavenumbers(f: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(k1, k2) per sample from the dominant 2-D FFT peak of the forcing
    field, refined to fractional bins.

    The generators build ``f = sin(2 pi k1 x) sin(2 pi k2 y)`` on the unit
    square (``/root/reference/src/data_generation.py:60-77``), so the
    magnitude spectrum peaks at bin ``(round(k2), round(k1))`` (row frequency
    is y). Non-integer k leaks into neighboring bins; a two-bin sub-bin
    estimator (:func:`_subbin_offset`) recovers the fractional part to ~±0.1,
    so regime thresholds can sit exactly at a distribution boundary (e.g. the
    in/out-of-sample split at k = 6, ``compare_test_cases.py:599``) without
    integer-bin ambiguity. Honest: ``f`` is a known model input.
    """
    spec = jnp.abs(jnp.fft.rfft2(f))
    # zero the DC row/column so constant offsets never win the argmax
    spec = spec.at[..., 0, :].set(0.0).at[..., :, 0].set(0.0)
    h = spec.shape[-2]
    flat = spec.reshape(spec.shape[:-2] + (-1,))
    idx = jnp.argmax(flat, axis=-1)
    row = idx // spec.shape[-1]
    col = idx % spec.shape[-1]
    col_slice = jnp.take_along_axis(spec, col[..., None, None], axis=-1)[..., 0]
    row_slice = jnp.take_along_axis(spec, row[..., None, None], axis=-2)[..., 0, :]
    d_col = _subbin_offset(row_slice, col)
    d_row = _subbin_offset(col_slice, row)
    # rows above Nyquist alias to negative frequencies (offset flips sign)
    aliased = row > h // 2
    k2 = jnp.where(aliased, (h - row) - d_row, row + d_row)
    k1 = col + d_col
    # the generators sample on linspace(0, 1, n) — spacing 1/(n-1) — so DFT
    # bin m sits at physical frequency m (n-1)/n, not m
    scale = (h - 1) / h
    return (k1 * scale).astype(jnp.float32), (k2 * scale).astype(jnp.float32)


@dataclasses.dataclass
class RegimeRouter:
    """Routes each sample to a theta==1 expert or a varying-theta expert.

    Each expert is ``(model, variables, normalization)`` where
    ``normalization`` matches how the expert was trained (``"dataset"`` or
    ``"per_sample"``). Predictions are computed with both experts on the
    batch and combined with a per-sample mask — static shapes, jit-friendly,
    and 2x the model FLOPs (negligible for 40^2 eval batches).
    """

    const_model: Any
    const_variables: Dict
    varying_model: Any
    varying_variables: Dict
    const_normalization: str = "dataset"
    varying_normalization: str = "dataset"
    tol: float = THETA_CONSTANT_TOL
    # Optional third expert for constant-theta high-wavenumber inputs (the
    # reference's out-of-sample k regime); routed by estimate_wavenumbers.
    const_high_model: Any = None
    const_high_variables: Optional[Dict] = None
    const_high_normalization: str = "dataset"
    k_threshold: float = 6.0
    # Optional fourth expert: varying-theta high-wavenumber arm with its own
    # threshold (the in/out-of-sample varying cells favor different experts —
    # measured round 3; the const and varying arms need not split at the
    # same k).
    varying_high_model: Any = None
    varying_high_variables: Optional[Dict] = None
    varying_high_normalization: str = "dataset"
    k_threshold_varying: float = 6.0

    def regime_mask(self, theta_fine: jnp.ndarray) -> jnp.ndarray:
        """True where the sample's coefficient field is constant."""
        return jnp.std(theta_fine, axis=(-2, -1)) < self.tol

    def highk_mask(self, f_fine: jnp.ndarray, threshold: Optional[float] = None) -> jnp.ndarray:
        """True where the forcing's dominant wavenumber exceeds the threshold."""
        k1, k2 = estimate_wavenumbers(f_fine)
        return jnp.maximum(k1, k2) >= (self.k_threshold if threshold is None else threshold)

    def predict(self, data: Dict, stats: Optional[Any] = None,
                symmetrize: bool = False) -> jnp.ndarray:
        """Denormalized per-sample predictions with per-sample expert choice.

        All experts run on the full batch and a per-sample mask selects —
        static shapes, jit-friendly, and 2-3x the model FLOPs (negligible for
        40^2 eval batches).
        """
        from superresolution_for_pdes_tpu.eval.single_level import predict_dataset

        pred_const = predict_dataset(
            self.const_model, self.const_variables, data, stats,
            normalization=self.const_normalization, symmetrize=symmetrize,
        )
        pred_var = predict_dataset(
            self.varying_model, self.varying_variables, data, stats,
            normalization=self.varying_normalization, symmetrize=symmetrize,
        )
        const = self.regime_mask(data["theta_fine"])[..., None, None]
        if self.const_high_model is not None:
            pred_hi = predict_dataset(
                self.const_high_model, self.const_high_variables, data, stats,
                normalization=self.const_high_normalization, symmetrize=symmetrize,
            )
            hi = self.highk_mask(data["f_fine"])[..., None, None]
            pred_const = jnp.where(hi, pred_hi, pred_const)
        if self.varying_high_model is not None:
            pred_var_hi = predict_dataset(
                self.varying_high_model, self.varying_high_variables, data, stats,
                normalization=self.varying_high_normalization, symmetrize=symmetrize,
            )
            hi_v = self.highk_mask(data["f_fine"], self.k_threshold_varying)[..., None, None]
            pred_var = jnp.where(hi_v, pred_var_hi, pred_var)
        return jnp.where(const, pred_const, pred_var)
