"""Import PyTorch attention-U-Net checkpoints into Flax variables.

The reference persists ``torch.save`` dicts with a ``model_state_dict`` entry
(checkpoint format C11, ``/root/reference/src/train.py:107-115``); its key
namespace follows the module attributes of ``src/models.py:26-130``:
``enc{1..3}.conv{1,2}/.bn{1,2}``, ``bridge.{0,1,3,4}``, ``dec{1..3}``,
``att{1..3}.channel_attention.{1,3}`` / ``.spatial_attention.0``,
``out_conv{1,2}`` / ``out_bn{1,2}``, ``final``.

This module converts that state_dict into the NHWC Flax parameter tree of
:class:`~superresolution_for_pdes_tpu.models.unet.AttentionUNet`
(conv kernels transpose OIHW -> HWIO; BatchNorm weight/bias -> scale/bias and
running stats -> batch_stats), enabling numerical cross-validation of trained
reference models on TPU. Pure numpy — torch is only needed to *load* ``.pth``
files (see :func:`load_torch_checkpoint`).
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _conv(sd: Mapping[str, np.ndarray], torch_name: str) -> Dict[str, np.ndarray]:
    kernel = np.asarray(sd[f"{torch_name}.weight"])  # (O, I, kh, kw)
    out = {"kernel": kernel.transpose(2, 3, 1, 0)}  # -> (kh, kw, I, O)
    bias_key = f"{torch_name}.bias"
    if bias_key in sd:
        out["bias"] = np.asarray(sd[bias_key])
    return out


def _bn_params(sd: Mapping[str, np.ndarray], torch_name: str) -> Dict[str, np.ndarray]:
    return {
        "scale": np.asarray(sd[f"{torch_name}.weight"]),
        "bias": np.asarray(sd[f"{torch_name}.bias"]),
    }


def _bn_stats(sd: Mapping[str, np.ndarray], torch_name: str) -> Dict[str, np.ndarray]:
    return {
        "mean": np.asarray(sd[f"{torch_name}.running_mean"]),
        "var": np.asarray(sd[f"{torch_name}.running_var"]),
    }


def _conv_block(sd, torch_name):
    params = {}
    stats = {}
    for i in (1, 2):
        params[f"conv{i}"] = _conv(sd, f"{torch_name}.conv{i}")
        params[f"bn{i}"] = _bn_params(sd, f"{torch_name}.bn{i}")
        stats[f"bn{i}"] = _bn_stats(sd, f"{torch_name}.bn{i}")
    return params, stats


def _attention_gate(sd, torch_name):
    return {
        "ca_squeeze": _conv(sd, f"{torch_name}.channel_attention.1"),
        "ca_excite": _conv(sd, f"{torch_name}.channel_attention.3"),
        "sa_conv": _conv(sd, f"{torch_name}.spatial_attention.0"),
    }


def torch_state_dict_to_variables(state_dict: Mapping[str, np.ndarray]) -> Dict:
    """Convert a reference-format state_dict to Flax ``{params, batch_stats}``."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: Dict = {}
    batch_stats: Dict = {}

    for name in ("enc1", "enc2", "enc3", "dec1", "dec2", "dec3"):
        params[name], batch_stats[name] = _conv_block(sd, name)

    # bridge: Sequential indices 0/3 convs, 1/4 batchnorms (models.py:42-49)
    for i, (conv_idx, bn_idx) in enumerate(((0, 1), (3, 4)), start=1):
        params[f"bridge_conv{i}"] = _conv(sd, f"bridge.{conv_idx}")
        params[f"bridge_bn{i}"] = _bn_params(sd, f"bridge.{bn_idx}")
        batch_stats[f"bridge_bn{i}"] = _bn_stats(sd, f"bridge.{bn_idx}")

    for k in (1, 2, 3):
        params[f"att{k}"] = _attention_gate(sd, f"att{k}")

    for i in (1, 2):
        params[f"out_conv{i}"] = _conv(sd, f"out_conv{i}")
        params[f"out_bn{i}"] = _bn_params(sd, f"out_bn{i}")
        batch_stats[f"out_bn{i}"] = _bn_stats(sd, f"out_bn{i}")
    params["final"] = _conv(sd, "final")

    return {"params": params, "batch_stats": batch_stats}


def load_torch_checkpoint(path) -> Dict:
    """Load a reference ``.pth`` checkpoint and return Flax variables.

    Accepts both the raw state_dict and the training checkpoint wrapper with a
    ``model_state_dict`` entry (reference ``compare_methods.py:11-17``).
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model_state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    sd = {k: v.detach().cpu().numpy() for k, v in sd.items()}
    return torch_state_dict_to_variables(sd)
