"""Model registry: name -> architecture builder."""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax.numpy as jnp

from superresolution_for_pdes_tpu.models.resnet import PDEResNet
from superresolution_for_pdes_tpu.models.unet import AttentionUNet

def _wide_unet(dtype=jnp.float32, **kw):
    """1.5x-width attention U-Net (~17M params): same architecture family as
    the reference parity model, more capacity for the hardest cascade level
    (40->80 at near-Nyquist wavenumbers, where the per-level error is born)."""
    kw.setdefault("enc_features", (96, 192, 384))
    kw.setdefault("bridge_features", 768)
    kw.setdefault("head_features", (48, 24))
    return AttentionUNet(dtype=dtype, **kw)


_REGISTRY: Dict[str, Callable[..., Any]] = {
    "attention_unet": AttentionUNet,
    "attention_unet_wide": _wide_unet,
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
