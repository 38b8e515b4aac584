"""Split and batching utilities for the jitted training loop.

The reference shuffles indices on the host and iterates a torch DataLoader
per batch (``/root/reference/src/train_enhanced.py:238-300``); here an epoch
is a single device-resident index matrix consumed by ``lax.scan``
(see ``train/loop.py``), so batching never touches the host.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp


def stratified_split(
    seed: int, is_subdomain: np.ndarray, val_split: float = 0.2
) -> Tuple[np.ndarray, np.ndarray]:
    """(train_idx, val_idx): per-stratum shuffled split, preserving the
    standard/subdomain mix in both splits (reference
    ``train_enhanced.py:238-264``). ``int(n_stratum * val_split)`` samples of
    each stratum go to validation.

    Strata of 2-4 samples still contribute one validation sample (the
    reference floor of ``int(n * 0.2) == 0`` only occurs below its real
    dataset sizes): an empty validation split would divide by zero in the
    chunked ``eval_loss`` (train/loop.py).
    """
    rng = np.random.default_rng(seed)
    flags = np.asarray(is_subdomain, bool)
    train_parts, val_parts = [], []
    for value in (False, True):
        idx = np.nonzero(flags == value)[0]
        if idx.size == 0:
            continue
        perm = rng.permutation(idx)
        n_val = int(idx.size * val_split)
        if n_val == 0 and idx.size >= 2:
            n_val = 1
        val_parts.append(perm[:n_val])
        train_parts.append(perm[n_val:])
    return np.concatenate(train_parts), np.concatenate(val_parts)


def epoch_batch_indices(key: jax.Array, n_samples: int, batch_size: int) -> jnp.ndarray:
    """(steps, batch_size) shuffled index matrix for one epoch.

    A fresh permutation per epoch, reshaped to full batches (the trailing
    partial batch is dropped — ``lax.scan`` needs static shapes; with the
    published 1600-train/batch-32 configuration nothing is dropped).
    """
    if n_samples < batch_size:
        raise ValueError(
            f"batch_size={batch_size} exceeds the train split "
            f"({n_samples} samples): every epoch would run zero steps "
            "(and report a nan train loss). Shrink --batch_size or grow "
            "the dataset.")
    perm = jax.random.permutation(key, n_samples)
    steps = n_samples // batch_size
    return perm[: steps * batch_size].reshape(steps, batch_size).astype(jnp.int32)
