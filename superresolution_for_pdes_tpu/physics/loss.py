"""Discrete PDE-residual loss on the predicted fine grid.

The reference README promises a physics-informed loss
(``/root/reference/README.md:152`` — "Implementation of physics-informed
loss functions") that was never implemented. Here it is, TPU-native:

    L_pde = mean( ((diag(theta) L u_pred - f) / f_std)^2 )

evaluated matrix-free with the fused 5-point stencil on the *denormalized*
prediction. Dividing by ``f_std`` puts the residual on the same O(1) scale as
the normalized-MSE data term, so ``physics_weight`` is a dimensionless mix-in.

Note the residual uses the exact training operator ``diag(theta) @ L``
(reference ``data_generation.py:99``) — penalizing the same equations the data
was generated from, including the truncated boundary rows.
"""

from __future__ import annotations

import jax.numpy as jnp

from superresolution_for_pdes_tpu.data.normalization import NormStats
from superresolution_for_pdes_tpu.ops.stencil import apply_operator


def pde_residual_loss(
    pred_norm: jnp.ndarray,
    theta_fine: jnp.ndarray,
    f_fine: jnp.ndarray,
    stats: NormStats,
) -> jnp.ndarray:
    """Mean squared normalized PDE residual of a normalized NHWC prediction.

    Args:
        pred_norm: model output, shape ``(..., H, W, 1)`` in normalized space.
        theta_fine / f_fine: physical-scale coefficient and forcing,
            shape ``(..., H, W)``.
        stats: normalization statistics (for denormalizing the prediction and
            scaling the residual).
    """
    u_pred = stats.denormalize_u(pred_norm[..., 0])
    resid = (apply_operator(theta_fine, u_pred) - f_fine) / stats.f_std
    return jnp.mean(resid**2)
