"""Error metrics shared by every harness.

The reference computes MAE / RMSE / max abs error inline at each call site
(e.g. ``compare_test_cases.py:130-136``, ``resolution_comparison.py:423-427``,
``visualization.py:77-95``) and relative L2 in ``utils.py:36-54``; here they
are one vocabulary, batched over leading axes.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp


def mae(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - target), axis=(-2, -1))

def rmse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.mean((pred - target) ** 2, axis=(-2, -1)))

def max_error(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.max(jnp.abs(pred - target), axis=(-2, -1))

def relative_l2(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    num = jnp.sqrt(jnp.sum((pred - target) ** 2, axis=(-2, -1)))
    den = jnp.sqrt(jnp.sum(target**2, axis=(-2, -1)))
    return num / jnp.maximum(den, jnp.finfo(target.dtype).tiny)


def compute_metrics(pred: jnp.ndarray, target: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Per-sample metric dict over the last two (grid) axes."""
    return {
        "mae": mae(pred, target),
        "rmse": rmse(pred, target),
        "max_error": max_error(pred, target),
        "relative_l2": relative_l2(pred, target),
    }
