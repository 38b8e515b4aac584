"""Training with on-the-fly, on-device dataset generation fused into the step.

North-star configuration 4 (BASELINE.json): instead of a pre-generated
``.npz`` (the reference's only mode — host loop of scipy solves,
``/root/reference/src/enhanced_data_generation.py:246-286``), every training
step *solves fresh PDEs on the TPU*: sample (k1, k2) -> batched
fast-diagonalization solve -> normalize -> forward/backward. The model never
sees a sample twice, which removes the train/val split entirely (every batch
is out-of-sample).

Under a mesh the whole step shards on the batch axis: each chip generates and
solves its shard of the batch locally (PRNG is key-split per sample, so
sharding the vmapped solve is embarrassingly parallel), and only the gradient
all-reduce crosses ICI.

Normalization stats must be *frozen* (computed once from a calibration batch)
so the input scaling is stationary — matching how a pre-generated dataset
behaves.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from superresolution_for_pdes_tpu.data.generate import (
    generate_standard_dataset,
    generate_subdomain_dataset,
)
from superresolution_for_pdes_tpu.data.normalization import (
    NormStats,
    make_model_inputs,
    make_targets,
)
from superresolution_for_pdes_tpu.models.unet import AttentionUNet
from superresolution_for_pdes_tpu.train.loop import TrainState


def calibration_stats(key: jax.Array, n_samples: int = 512, subdomain_fraction: float = 0.5) -> NormStats:
    """Freeze normalization stats from a calibration mix (standard+subdomain)."""
    ks, kb = jax.random.split(key)
    n_sub = int(n_samples * subdomain_fraction)
    std = generate_standard_dataset(ks, n_samples - n_sub)
    sub = generate_subdomain_dataset(kb, n_sub)
    u = jnp.concatenate([std["u_fine"], sub["u_fine"]])
    f = jnp.concatenate([std["f_fine"], sub["f_fine"]])
    t = jnp.concatenate([std["theta_fine"], sub["theta_fine"]])
    return NormStats.from_fields(u, f, t)


def make_online_train_step(
    model: AttentionUNet,
    tx: optax.GradientTransformation,
    stats: NormStats,
    batch_size: int,
    subdomain_fraction: float = 0.5,
    standard_k_range: Tuple[float, float] = (0.5, 5.0),
    subdomain_k_range: Tuple[float, float] = (0.5, 12.0),
    batch_sharding: Optional[jax.sharding.NamedSharding] = None,
) -> Callable[[TrainState, jax.Array], Tuple[TrainState, jnp.ndarray]]:
    """Build ``step(state, key) -> (state, loss)`` with fused datagen.

    The generated batch mixes standard and subdomain samples in the published
    1:1 ratio by default (reference ``enhanced_data_generation.py:272-277``).
    """
    n_sub = int(batch_size * subdomain_fraction)
    n_std = batch_size - n_sub

    def constrain(tree):
        if batch_sharding is None:
            return tree
        return jax.tree.map(lambda a: jax.lax.with_sharding_constraint(a, batch_sharding), tree)

    @jax.jit
    def step(state: TrainState, key: jax.Array):
        ks, kb = jax.random.split(key)
        std = generate_standard_dataset(ks, n_std, standard_k_range)
        sub = generate_subdomain_dataset(kb, n_sub, subdomain_k_range)
        u_coarse = jnp.concatenate([std["u_coarse"], sub["u_coarse"]])
        u_fine = jnp.concatenate([std["u_fine"], sub["u_fine"]])
        f_fine = jnp.concatenate([std["f_fine"], sub["f_fine"]])
        theta_fine = jnp.concatenate([std["theta_fine"], sub["theta_fine"]])

        batch = constrain(
            {
                "x": make_model_inputs(u_coarse, f_fine, theta_fine, stats),
                "y": make_targets(u_fine, stats),
            }
        )

        def loss_fn(params, batch_stats):
            pred, mutated = model.apply(
                {"params": params, "batch_stats": batch_stats},
                batch["x"],
                train=True,
                mutable=["batch_stats"],
            )
            return jnp.mean((pred - batch["y"]) ** 2), mutated["batch_stats"]

        (loss, new_batch_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats
        )
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(
                params=new_params,
                batch_stats=new_batch_stats,
                opt_state=new_opt_state,
                step=state.step + 1,
            ),
            loss,
        )

    return step
