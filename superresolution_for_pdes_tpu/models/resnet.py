"""Residual CNN baseline — a second model family for the zoo.

The reference ships exactly one architecture (the attention U-Net). A plain
residual CNN at constant 40x40 resolution is the natural ablation baseline:
no pooling, no attention, no multi-scale head — just stacked 3x3 conv blocks
with identity skips and the same coarse-solution residual output
(reference semantics of ``models.py:101``). Useful for quantifying what the
U-Net's attention/multi-scale structure actually buys.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from superresolution_for_pdes_tpu.models.unet import kaiming_fan_out


class ResBlock(nn.Module):
    features: int
    dtype: Any = jnp.float32
    norm: str = "batch"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        from superresolution_for_pdes_tpu.models.unet import make_norm

        h = x
        for i in range(2):
            h = nn.Conv(self.features, (3, 3), padding=1, kernel_init=kaiming_fan_out,
                        dtype=self.dtype, name=f"conv{i + 1}")(h)
            h = make_norm(self.norm, self.dtype, f"bn{i + 1}", train, self.features)(h)
            if i == 0:
                h = nn.relu(h)
        return nn.relu(x + h)


class PDEResNet(nn.Module):
    """Constant-resolution residual CNN with the coarse-solution skip."""

    in_channels: int = 3
    features: int = 64
    num_blocks: int = 8
    dtype: Any = jnp.float32
    norm: str = "batch"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        coarse = x[..., 0:1]
        h = nn.Conv(self.features, (3, 3), padding=1, kernel_init=kaiming_fan_out,
                    dtype=self.dtype, name="stem")(x)
        h = nn.relu(h)
        for i in range(self.num_blocks):
            h = ResBlock(self.features, self.dtype, self.norm, name=f"block{i + 1}")(h, train)
        h = nn.Conv(1, (1, 1), kernel_init=kaiming_fan_out, dtype=self.dtype, name="head")(h)
        return h + coarse
