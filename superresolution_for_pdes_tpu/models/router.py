"""Theta-regime expert routing (TPU-build extension).

The reference trains one model on theta == 1 data and evaluates it on both
theta regimes (``/root/reference/src/compare_test_cases.py:585-616``); a
mixed-theta model trades theta-robustness for theta==1 accuracy (round-1
finding). Deployment answer: two experts routed by the *input* coefficient
field — the same theta-constant detector the normalization layer already uses
(``std(theta) < 1e-6``, reference ``models.py:161-165``). The detector sees
only known inputs (never the fine solution), so routing is an honest
inference-time decision.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax.numpy as jnp

from superresolution_for_pdes_tpu.data.normalization import THETA_CONSTANT_TOL


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

    def regime_mask(self, theta_fine: jnp.ndarray) -> jnp.ndarray:
        """True where the sample's coefficient field is constant."""
        return jnp.std(theta_fine, axis=(-2, -1)) < self.tol

    def predict(self, data: Dict, stats: Optional[Any] = None) -> jnp.ndarray:
        """Denormalized per-sample predictions with per-sample expert choice."""
        from superresolution_for_pdes_tpu.eval.single_level import predict_dataset

        pred_const = predict_dataset(
            self.const_model, self.const_variables, data, stats,
            normalization=self.const_normalization,
        )
        pred_var = predict_dataset(
            self.varying_model, self.varying_variables, data, stats,
            normalization=self.varying_normalization,
        )
        mask = self.regime_mask(data["theta_fine"])[..., None, None]
        return jnp.where(mask, pred_const, pred_var)
