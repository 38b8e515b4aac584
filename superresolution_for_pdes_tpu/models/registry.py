"""Model registry: name -> architecture builder."""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax.numpy as jnp

from superresolution_for_pdes_tpu.models.resnet import PDEResNet
from superresolution_for_pdes_tpu.models.unet import AttentionUNet

_REGISTRY: Dict[str, Callable[..., Any]] = {
    "attention_unet": AttentionUNet,
    "resnet": PDEResNet,
}


def available_models() -> tuple[str, ...]:
    return tuple(_REGISTRY)


def build_model(name: str, dtype=jnp.float32, **overrides):
    try:
        cls = _REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"unknown model {name!r}; available: {', '.join(_REGISTRY)}"
        ) from None
    return cls(dtype=dtype, **overrides)
