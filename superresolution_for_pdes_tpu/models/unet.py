"""Flax attention U-Net for PDE solution super-resolution.

Architecture parity with the reference model (``/root/reference/src/models.py``):

* ``ConvBlock``: Conv3x3 -> BatchNorm -> ReLU, twice (``models.py:6-24``);
* encoder 64/128/256 channels with 2x max-pooling (``models.py:37-39, 78-80``);
* dilated bridge: two Conv3x3 (dilation 2, padding 2) to 512 channels
  (``models.py:42-49``);
* decoder with attention-gated skip connections and align-corners bilinear 2x
  upsampling (``models.py:52-54, 70, 85-93``);
* attention gates: squeeze-excite channel attention (reduction 8) x spatial
  attention from the gating signal (``models.py:103-130``);
* multi-scale head 64->32->16->1 (``models.py:57-61, 96-98``);
* residual connection adding the upsampled coarse solution (input channel 0)
  to the output (``models.py:74, 101``).

TPU-first differences (semantics preserved, layout re-designed):

* NHWC layout throughout (TPU conv-friendly); channel order of the input is
  (u_coarse_upsampled, theta, f) as produced by
  :func:`superresolution_for_pdes_tpu.data.normalization.make_model_inputs`;
* 2x upsampling is the align-corners interpolation-matrix matmul from
  :mod:`~superresolution_for_pdes_tpu.ops.resize` (MXU) rather than a
  gather-based resampler;
* BatchNorm statistics are batch means/vars computed under GSPMD — with the
  batch axis sharded over the mesh, XLA inserts the cross-chip all-reduce
  automatically (the torch equivalent would need SyncBatchNorm);
* parameters initialize with Kaiming-normal fan_out (ReLU gain), biases zero,
  BatchNorm scale 1 / bias 0 — the reference's ``init_weights``
  (``models.py:209-222``).

Total parameter count matches the reference: 7,834,588.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from superresolution_for_pdes_tpu.ops.resize import resize_align_corners, upsample2x

# torch's nn.init.kaiming_normal_(mode='fan_out', nonlinearity='relu'):
# std = sqrt(2 / fan_out), full (untruncated) normal.
kaiming_fan_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def make_norm(kind: str, dtype, name: str, train: bool, features: int):
    """Normalization layer factory: ``"batch"`` replicates the reference's
    BatchNorm (``models.py:6-24``) with the original parameter paths (so
    round-1 checkpoints and the torch importer keep working); ``"group"`` is
    the TPU-build alternative — no train/eval statistics mismatch and no
    cross-replica reductions under data parallelism (SURVEY.md section 7,
    hard part d)."""
    if kind == "batch":
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, dtype=dtype, name=name)
    if kind == "group":
        group_size = 8 if features % 8 == 0 else 1
        return nn.GroupNorm(num_groups=None, group_size=group_size,
                            epsilon=1e-5, dtype=dtype, name=name)
    raise ValueError(f"unknown norm kind: {kind!r}")


class ConvBlock(nn.Module):
    """Conv3x3 -> norm -> ReLU, twice (reference ``models.py:6-24``)."""

    features: int
    dtype: Any = jnp.float32
    norm: str = "batch"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        for i in range(2):
            x = nn.Conv(
                self.features, (3, 3), padding=1, kernel_init=kaiming_fan_out,
                dtype=self.dtype, name=f"conv{i + 1}",
            )(x)
            x = make_norm(self.norm, self.dtype, f"bn{i + 1}", train, self.features)(x)
            x = nn.relu(x)
        return x


class AttentionGate(nn.Module):
    """Channel (squeeze-excite, r=8) x spatial attention
    (reference ``models.py:103-130``)."""

    features: int  # channels of x
    reduction: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, gating: jnp.ndarray) -> jnp.ndarray:
        # Channel attention: global average pool -> 1x1 squeeze/excite -> sigmoid
        ca = jnp.mean(x, axis=(-3, -2), keepdims=True)
        ca = nn.Conv(
            self.features // self.reduction, (1, 1), kernel_init=kaiming_fan_out,
            dtype=self.dtype, name="ca_squeeze",
        )(ca)
        ca = nn.relu(ca)
        ca = nn.Conv(
            self.features, (1, 1), kernel_init=kaiming_fan_out,
            dtype=self.dtype, name="ca_excite",
        )(ca)
        x = x * nn.sigmoid(ca)

        # Spatial attention from the gating signal (align-corners bilinear
        # resize if spatial shapes differ — reference models.py:125-127; with
        # the standard forward the shapes always match, but parity demands it).
        if gating.shape[-3:-1] != x.shape[-3:-1]:
            gating = jnp.moveaxis(
                resize_align_corners(jnp.moveaxis(gating, -1, -3), x.shape[-3:-1]),
                -3, -1,
            )
        sa = nn.Conv(
            1, (1, 1), kernel_init=kaiming_fan_out, dtype=self.dtype, name="sa_conv"
        )(gating)
        return x * nn.sigmoid(sa)


def _up2x_nhwc(x: jnp.ndarray) -> jnp.ndarray:
    """Align-corners bilinear 2x on NHWC (reference ``models.py:70``)."""
    return jnp.moveaxis(upsample2x(jnp.moveaxis(x, -1, -3)), -3, -1)


class AttentionUNet(nn.Module):
    """The reference attention U-Net (``models.py:26-101``), NHWC/Flax."""

    in_channels: int = 3
    enc_features: Sequence[int] = (64, 128, 256)
    bridge_features: int = 512
    head_features: Sequence[int] = (32, 16)
    dtype: Any = jnp.float32
    norm: str = "batch"  # "batch" (reference parity) or "group"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        coarse = x[..., 0:1]  # upsampled coarse solution (residual branch)

        f1, f2, f3 = self.enc_features
        e1 = ConvBlock(f1, self.dtype, self.norm, name="enc1")(x, train)                    # 40x40
        e2 = ConvBlock(f2, self.dtype, self.norm, name="enc2")(nn.max_pool(e1, (2, 2), (2, 2)), train)  # 20x20
        e3 = ConvBlock(f3, self.dtype, self.norm, name="enc3")(nn.max_pool(e2, (2, 2), (2, 2)), train)  # 10x10

        # Dilated bridge (dilation 2, padding 2)
        b = e3
        for i in range(2):
            b = nn.Conv(
                self.bridge_features, (3, 3), padding=2, kernel_dilation=(2, 2),
                kernel_init=kaiming_fan_out, dtype=self.dtype, name=f"bridge_conv{i + 1}",
            )(b)
            b = make_norm(self.norm, self.dtype, f"bridge_bn{i + 1}", train, self.bridge_features)(b)
            b = nn.relu(b)

        # Decoder with attention-gated skips (concat order [gating, skip] as in
        # reference models.py:87-93)
        e3_att = AttentionGate(f3, dtype=self.dtype, name="att3")(e3, b)
        d3 = ConvBlock(f3, self.dtype, self.norm, name="dec3")(jnp.concatenate([b, e3_att], -1), train)

        up3 = _up2x_nhwc(d3)
        e2_att = AttentionGate(f2, dtype=self.dtype, name="att2")(e2, up3)
        d2 = ConvBlock(f2, self.dtype, self.norm, name="dec2")(jnp.concatenate([up3, e2_att], -1), train)

        up2 = _up2x_nhwc(d2)
        e1_att = AttentionGate(f1, dtype=self.dtype, name="att1")(e1, up2)
        d1 = ConvBlock(f1, self.dtype, self.norm, name="dec1")(jnp.concatenate([up2, e1_att], -1), train)

        # Multi-scale head 64 -> 32 -> 16 -> 1
        h = d1
        for i, feat in enumerate(self.head_features):
            h = nn.Conv(
                feat, (3, 3), padding=1, kernel_init=kaiming_fan_out,
                dtype=self.dtype, name=f"out_conv{i + 1}",
            )(h)
            h = make_norm(self.norm, self.dtype, f"out_bn{i + 1}", train, feat)(h)
            h = nn.relu(h)
        h = nn.Conv(1, (1, 1), kernel_init=kaiming_fan_out, dtype=self.dtype, name="final")(h)

        # Residual connection from the coarse solution (reference models.py:101)
        return h + coarse


def init_unet(
    rng: jax.Array,
    model: AttentionUNet | None = None,
    input_shape: tuple[int, ...] | None = None,
):
    """Initialize (params, batch_stats) for the U-Net (or any registry model).

    ``input_shape`` defaults to ``(1, 40, 40, model.in_channels)`` so models
    with scale-aware extra input channels initialize correctly.
    """
    if model is None:
        model = AttentionUNet()
    if input_shape is None:
        input_shape = (1, 40, 40, model.in_channels)
    variables = dict(model.init(rng, jnp.zeros(input_shape, model.dtype), train=False))
    # Normless models (GroupNorm) have no batch_stats collection; keep the
    # variables pytree shape uniform so the train loop / checkpoints don't
    # need per-norm special cases.
    variables.setdefault("batch_stats", {})
    return model, variables


def count_parameters(params) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))
