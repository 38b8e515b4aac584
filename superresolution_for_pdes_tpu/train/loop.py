"""Jitted training loops for the attention U-Net.

Functional re-design of the reference trainers (``/root/reference/src/train.py:15-117``,
``src/train_enhanced.py:15-139``): MSE on normalized targets, AdamW
(lr 2e-4, wd 1e-4 on *all* parameters, matching torch ``AdamW(model.parameters())``),
global-norm gradient clipping at 1.0, plateau LR halving, best-val
checkpointing, early stopping after 20 stale epochs — plus the optional
physics-informed PDE-residual term the reference never shipped.

TPU-first execution model:

* the full dataset lives in HBM; **one jitted program per epoch** runs a
  ``lax.scan`` over shuffled batch-index rows (gather -> forward/backward ->
  optimizer update), so there is no per-step Python or host->device traffic
  (the reference pays a ``.to(device)`` per batch, ``train_enhanced.py:66``);
* under a device mesh the batch axis of each gathered mini-batch is sharded
  with ``with_sharding_constraint`` — XLA inserts the gradient all-reduce and
  cross-chip BatchNorm statistics automatically (GSPMD data parallelism);
* the learning rate is an ``optax.inject_hyperparams`` value mutated
  functionally between epochs by the host-side plateau scheduler — no
  recompilation when the LR drops.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from superresolution_for_pdes_tpu.data.normalization import (
    NormStats,
    make_model_inputs,
    make_targets,
)
from superresolution_for_pdes_tpu.data.pipeline import epoch_batch_indices, stratified_split
from superresolution_for_pdes_tpu.models.unet import AttentionUNet, init_unet
from superresolution_for_pdes_tpu.physics.loss import pde_residual_loss
from superresolution_for_pdes_tpu.train.checkpoint import save_checkpoint
from superresolution_for_pdes_tpu.train.config import TrainConfig
from superresolution_for_pdes_tpu.train.metrics import MetricsLogger, plot_history
from superresolution_for_pdes_tpu.train.schedule import EarlyStopping, ReduceLROnPlateau


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(config: TrainConfig) -> optax.GradientTransformation:
    """clip_by_global_norm(1.0) -> AdamW, with an injectable learning rate.

    torch semantics replicated: betas (0.9, 0.999), eps 1e-8, decoupled weight
    decay applied to every parameter (the reference does not exempt
    BatchNorm/bias parameters; ``train_enhanced.py:308``).
    """
    return optax.chain(
        optax.clip_by_global_norm(config.grad_clip),
        optax.inject_hyperparams(optax.adamw)(
            learning_rate=config.learning_rate, weight_decay=config.weight_decay
        ),
    )


def set_learning_rate(opt_state, lr: float):
    """Functionally replace the injected learning rate (no retrace)."""
    clip_state, inject_state = opt_state
    hp = dict(inject_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, jnp.asarray(hp["learning_rate"]).dtype)
    return (clip_state, inject_state._replace(hyperparams=hp))


def get_learning_rate(opt_state) -> float:
    return float(opt_state[1].hyperparams["learning_rate"])


def make_train_fns(
    model: AttentionUNet,
    tx: optax.GradientTransformation,
    stats: NormStats,
    physics_weight: float = 0.0,
    batch_sharding: Optional[jax.sharding.NamedSharding] = None,
    coarse_noise_std: float = 0.0,
    eval_chunk: int = 1024,
) -> Tuple[Callable, Callable]:
    """Build (train_epoch, eval_loss) jitted functions.

    ``train_epoch(state, arrays, idx_matrix, noise_key) -> (state, mean_loss)``
    scans the whole epoch on device. ``arrays`` is the dict of device-resident
    tensors ``{x, y, theta, f}`` (NHWC inputs/targets + physical fields for
    the physics term).

    ``coarse_noise_std`` (TPU-build extension): Gaussian noise of that std (in
    normalized units) added to the upsampled-coarse input channel during
    training — the cascade feeds the model its *own previous prediction* as
    the coarse input at deeper levels (``resolution_comparison.py:226``), so
    training on exact solutions only underestimates inference-time input
    error; this augmentation closes that gap.
    """

    def constrain(tree):
        if batch_sharding is None:
            return tree
        return jax.tree.map(lambda a: jax.lax.with_sharding_constraint(a, batch_sharding), tree)

    def loss_fn(params, batch_stats, batch, train: bool):
        outputs = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["x"],
            train=train,
            mutable=["batch_stats"] if train else False,
        )
        if train:
            pred, mutated = outputs
            new_stats = mutated.get("batch_stats", batch_stats)
        else:
            pred, new_stats = outputs, batch_stats
        mse = jnp.mean((pred - batch["y"]) ** 2)
        loss = mse
        if physics_weight > 0.0:
            # Per-sample normalization carries its stats in the batch arrays;
            # dataset normalization uses the fixed closed-over stats.
            if "u_std" in batch:
                phys_stats = NormStats(
                    u_mean=batch["u_mean"], u_std=batch["u_std"],
                    f_mean=batch["f_mean"], f_std=batch["f_std"],
                    theta_mean=jnp.zeros_like(batch["u_mean"]),
                    theta_std=jnp.ones_like(batch["u_std"]),
                    theta_is_constant=jnp.asarray(True),
                )
            else:
                phys_stats = stats
            loss = loss + physics_weight * pde_residual_loss(
                pred, batch["theta"], batch["f"], phys_stats
            )
        return loss, (mse, new_stats)

    def train_step(state: TrainState, batch) -> Tuple[TrainState, jnp.ndarray]:
        (loss, (_, new_batch_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, True
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

    # NOTE: no buffer donation — the training loop keeps the best epoch's
    # state alive as an on-device snapshot, which donation would invalidate.
    @jax.jit
    def train_epoch(
        state: TrainState,
        arrays: Dict[str, jnp.ndarray],
        idx_matrix: jnp.ndarray,
        noise_key: Optional[jax.Array] = None,
    ):
        def body(carry, scan_in):
            step_idx, idx = scan_in
            batch = constrain({k: v[idx] for k, v in arrays.items()})
            if coarse_noise_std > 0.0 and noise_key is not None:
                key = jax.random.fold_in(noise_key, step_idx)
                noise = coarse_noise_std * jax.random.normal(
                    key, batch["x"].shape[:-1], batch["x"].dtype
                )
                batch = dict(batch)
                batch["x"] = batch["x"].at[..., 0].add(noise)
            new_carry, loss = train_step(carry, batch)
            return new_carry, loss

        steps = jnp.arange(idx_matrix.shape[0], dtype=jnp.int32)
        state, losses = jax.lax.scan(body, state, (steps, idx_matrix))
        return state, jnp.mean(losses)

    @jax.jit
    def eval_loss(state: TrainState, arrays: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        # Chunked validation: a whole-split forward allocates activations
        # proportional to the split (an 18 GB spike at ~22k samples on the
        # 16 GB chip), so scan fixed-size chunks and take the exact
        # sample-weighted mean instead. Shapes are static at trace time.
        # ``eval_chunk`` is an activation-memory budget expressed in 40x40
        # samples: big-window experts (80/160/320-point inputs) carry 4-64x
        # the activations per sample, so the sample count per chunk scales
        # down by the spatial area ratio (a fixed 1024-sample chunk of
        # 160x160 inputs is a 10 GB activation spike — the round-4 sfl34g
        # compile OOM).
        n = next(iter(arrays.values())).shape[0]
        h, w = arrays["x"].shape[1:3]
        area_scaled = max(1, (eval_chunk * 40 * 40) // (h * w))
        chunk = min(area_scaled, n)
        n_full = n // chunk

        def chunk_loss(batch):
            loss, _ = loss_fn(state.params, state.batch_stats, constrain(batch), False)
            return loss

        total = jnp.zeros((), jnp.float32)
        if n_full:
            head = {k: v[: n_full * chunk].reshape((n_full, chunk) + v.shape[1:])
                    for k, v in arrays.items()}
            total, _ = jax.lax.scan(
                lambda acc, batch: (acc + chunk_loss(batch), None), total, head)
            total = total * chunk
        if n % chunk:
            tail = {k: v[n_full * chunk:] for k, v in arrays.items()}
            total = total + chunk_loss(tail) * (n % chunk)
        return total / n

    return train_epoch, eval_loss


def prepare_arrays(
    dataset: Dict[str, jnp.ndarray],
    stats: NormStats,
    dtype=jnp.float32,
    per_sample: bool = False,
    scale_channels: bool = False,
):
    """Normalized NHWC tensors + physical fields, device-resident.

    ``per_sample=True`` self-normalizes every sample with stats computed from
    its own coarse input / forcing / coefficient (see
    :func:`~superresolution_for_pdes_tpu.data.normalization.per_sample_stats`)
    and carries those stats in the arrays for the physics loss.
    ``scale_channels=True`` appends the log-scale input channels (pair with a
    ``in_channels=5`` model — the scale-aware self-normalization recipe).
    """
    if per_sample:
        from superresolution_for_pdes_tpu.data.normalization import per_sample_stats

        stats = per_sample_stats(
            dataset["u_coarse"], dataset["f_fine"], dataset["theta_fine"]
        )
    arrays = {
        "x": make_model_inputs(
            dataset["u_coarse"], dataset["f_fine"], dataset["theta_fine"], stats,
            scale_channels=scale_channels,
        ).astype(dtype),
        "y": make_targets(dataset["u_fine"], stats).astype(dtype),
        "theta": dataset["theta_fine"].astype(dtype),
        "f": dataset["f_fine"].astype(dtype),
    }
    if per_sample:
        arrays.update(
            u_mean=stats.u_mean.astype(dtype), u_std=stats.u_std.astype(dtype),
            f_mean=stats.f_mean.astype(dtype), f_std=stats.f_std.astype(dtype),
        )
    return arrays


def _save_best(run_dir, snapshot, stats) -> None:
    state = snapshot["state"]
    save_checkpoint(
        run_dir / "best_model",
        {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "epoch": snapshot["epoch"],
            "train_loss": snapshot["train_loss"],
            "val_loss": snapshot["val_loss"],
            "plateau": snapshot["plateau"],
            "early": snapshot["early"],
            "norm_stats": jax.device_get(stats),
        },
    )


def train_model(
    dataset: Dict[str, jnp.ndarray],
    config: TrainConfig,
    run_dir,
    mesh: Optional[jax.sharding.Mesh] = None,
    model: Optional[AttentionUNet] = None,
    verbose: bool = True,
    resume_from: Optional[str] = None,
    dataset_generator: Optional[Callable[[jax.Array], Dict[str, jnp.ndarray]]] = None,
) -> Dict[str, Any]:
    """Full training job: split -> normalize -> epochs -> checkpoints.

    Replicates the reference main loops (``train_enhanced.py:185-360``):
    stratified 80/20 split, normalization stats from the *train* split,
    per-epoch train/val losses, plateau LR, early stopping, best + final
    checkpoints, config.json and metrics logging in ``run_dir``.

    ``resume_from`` restores the complete training state (params, batch stats,
    optimizer, scheduler/early-stop counters, epoch) from a checkpoint
    directory and continues — the resume path the reference never had
    (SURVEY.md section 5, checkpoint/resume).

    ``dataset_generator`` (TPU-build extension; north-star "fused datagen"
    configuration): when given, the *training split* is regenerated on-device
    with a fresh key at the start of every epoch — the model never sees a
    sample twice, eliminating overfitting entirely. The generator must return
    a fixed-size dataset dict (same shapes every call, so the compiled epoch
    program is reused). Validation stays on the fixed split of ``dataset`` so
    early stopping and the plateau scheduler see a stationary metric.
    Normalization stats also stay frozen from the initial dataset (matching
    how a pre-generated dataset behaves); with ``normalization='per_sample'``
    they are per-sample anyway.
    """
    from pathlib import Path

    run_dir = Path(run_dir)
    run_dir.mkdir(parents=True, exist_ok=True)
    config.to_json(run_dir / "config.json")
    logger = MetricsLogger(run_dir, tensorboard=config.log_tensorboard)

    dtype = jnp.dtype(config.dtype)
    n_samples = int(dataset["u_fine"].shape[0])
    is_subdomain = jax.device_get(dataset.get("is_subdomain", jnp.zeros(n_samples, bool)))
    if config.stratify_by_subdomain and is_subdomain.any():
        train_idx, val_idx = stratified_split(config.seed, is_subdomain, config.val_split)
    else:
        import numpy as np

        rng = np.random.default_rng(config.seed)
        perm = rng.permutation(n_samples)
        n_val = int(n_samples * config.val_split)
        val_idx, train_idx = perm[:n_val], perm[n_val:]

    train_ds = {k: v[jnp.asarray(train_idx)] for k, v in dataset.items()}
    val_ds = {k: v[jnp.asarray(val_idx)] for k, v in dataset.items()}

    # Stats from the training split (the reference computes separate stats for
    # each split, models.py:154-168 — we use train stats for both, the
    # principled choice; cascade inference recomputes scene stats anyway).
    stats = NormStats.from_dataset(train_ds)
    per_sample = config.normalization == "per_sample"

    if model is None:
        from superresolution_for_pdes_tpu.models.registry import build_model

        overrides = {"in_channels": 5} if config.scale_channels else {}
        if config.model_norm != "batch":
            overrides["norm"] = config.model_norm
        model = build_model(config.model, dtype=dtype, **overrides)
    scale_channels = model.in_channels > 3
    train_arrays = prepare_arrays(train_ds, stats, dtype, per_sample=per_sample,
                                  scale_channels=scale_channels)
    val_arrays = prepare_arrays(val_ds, stats, dtype, per_sample=per_sample,
                                scale_channels=scale_channels)
    model, variables = init_unet(jax.random.key(config.seed), model)
    tx = make_optimizer(config)
    state = TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )

    batch_sharding = None
    if mesh is not None:
        batch_sharding = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("data")
        )
        replicate = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
        state = jax.device_put(state, replicate)
        train_arrays = jax.device_put(train_arrays, replicate)
        val_arrays = jax.device_put(val_arrays, replicate)

    train_epoch, eval_loss = make_train_fns(
        model, tx, stats, config.physics_weight, batch_sharding,
        coarse_noise_std=config.coarse_noise_std,
    )

    plateau = ReduceLROnPlateau(
        lr=config.learning_rate,
        factor=config.plateau_factor,
        patience=config.plateau_patience,
        min_lr=config.min_lr,
    )
    early = EarlyStopping(patience=config.early_stopping_patience)

    start_epoch = 0
    if resume_from is not None:
        from superresolution_for_pdes_tpu.train.checkpoint import restore_checkpoint

        restored = restore_checkpoint(resume_from)
        state = state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=jax.tree.unflatten(
                jax.tree.structure(state.opt_state),
                jax.tree.leaves(restored["opt_state"]),
            ),
        )
        # Counters/best come from the checkpoint; hyperparameters come from
        # the *current* config (so a resume can e.g. raise the early-stopping
        # patience of a run that stopped on a noisy plateau).
        plateau = ReduceLROnPlateau.from_state_dict(restored["plateau"])
        plateau.factor = config.plateau_factor
        plateau.patience = config.plateau_patience
        plateau.min_lr = config.min_lr
        early = EarlyStopping.from_state_dict(restored["early"])
        early.patience = config.early_stopping_patience
        start_epoch = int(restored["epoch"]) + 1
        if mesh is not None:
            state = jax.device_put(state, replicate)
        if verbose:
            print(f"resumed from {resume_from} at epoch {start_epoch + 1}")

    history = {"train_loss": [], "val_loss": [], "lr": []}
    shuffle_key = jax.random.key(config.seed + 1)
    for _ in range(start_epoch):
        shuffle_key, _ = jax.random.split(shuffle_key)
    n_train = len(train_idx)
    best_snapshot = None
    last_ckpt_epoch = -(10**9)

    stream_key = jax.random.key(config.seed + 2)

    fused = int(getattr(config, "fused_epochs", 0) or 0)
    if fused > 1 and dataset_generator is not None:
        # Fused streaming (SURVEY north-star "datagen fused into the step"):
        # regenerate -> prepare -> train-epoch -> validate for `fused` epochs
        # inside ONE jitted scan. Streamed training pays a handful of host
        # dispatches and tunnel round-trips per epoch (measured: they, not
        # the train step, dominate the ~6 s champion epoch); one program per
        # chunk amortizes them K-fold. Semantics deltas vs the standard loop,
        # both documented on TrainConfig.fused_epochs: plateau-LR changes
        # take effect at chunk boundaries, and the best snapshot holds the
        # state at the END of the chunk containing the best epoch.
        if mesh is not None or config.coarse_noise_std > 0.0:
            raise ValueError("fused_epochs does not compose with mesh "
                             "replication or coarse_noise_std")
        probe = dataset_generator(jax.random.fold_in(stream_key, 2**31 - 1))
        n_stream = int(probe["u_fine"].shape[0])
        del probe

        @functools.partial(jax.jit, static_argnames=("n_epochs",))
        def run_chunk(state: TrainState, epoch0: jnp.ndarray, n_epochs: int):
            def body(carry, e):
                key = jax.random.fold_in(stream_key, epoch0 + e)
                fresh = dataset_generator(key)
                arrs = prepare_arrays(fresh, stats, dtype, per_sample=per_sample,
                                      scale_channels=scale_channels)
                idx = epoch_batch_indices(
                    jax.random.fold_in(key, 1), n_stream, config.batch_size)
                carry, tr = train_epoch(carry, arrs, idx)
                return carry, (tr, eval_loss(carry, val_arrays))

            state, (trs, vls) = jax.lax.scan(
                body, state, jnp.arange(n_epochs, dtype=jnp.int32))
            return state, trs, vls

        epoch = start_epoch
        stopped = False
        while epoch < config.num_epochs and not stopped:
            k = min(fused, config.num_epochs - epoch)
            state, trs, vls = run_chunk(state, jnp.asarray(epoch, jnp.int32), k)
            trs, vls = jax.device_get((trs, vls))
            chunk_improved = False
            for j in range(k):
                train_loss, val_loss = float(trs[j]), float(vls[j])
                new_lr = plateau.step(val_loss)
                history["train_loss"].append(train_loss)
                history["val_loss"].append(val_loss)
                history["lr"].append(new_lr)
                logger.log(epoch + j, {"train_loss": train_loss,
                                       "val_loss": val_loss,
                                       "learning_rate": new_lr})
                if verbose:
                    print(f"epoch {epoch + j + 1}/{config.num_epochs}: "
                          f"train {train_loss:.6f} val {val_loss:.6f} "
                          f"lr {new_lr:.2e}")
                if early.step(val_loss, epoch + j):
                    stopped = True
                if early.improved:
                    chunk_improved = True
                if stopped:
                    break
            if plateau.lr != get_learning_rate(state.opt_state):
                state = state.replace(
                    opt_state=set_learning_rate(state.opt_state, plateau.lr))
            if chunk_improved:
                best_snapshot = {
                    "state": state,          # chunk-end state (see docstring)
                    "epoch": early.best_epoch,
                    "train_loss": float(trs[min(k, len(trs)) - 1]),
                    "val_loss": early.best,
                    "plateau": plateau.state_dict(),
                    "early": early.state_dict(),
                }
                last = epoch + k - 1
                if (config.checkpoint_every_best
                        and last - last_ckpt_epoch >= config.checkpoint_interval):
                    _save_best(run_dir, best_snapshot, stats)
                    last_ckpt_epoch = last
            epoch += k
            if stopped and verbose:
                print(f"early stopping after {len(history['val_loss']) + start_epoch} epochs")
        return _finalize(run_dir, config, state, stats, history, early, plateau,
                         best_snapshot, start_epoch, logger, model)

    gen_every = max(1, int(getattr(config, "gen_every", 1) or 1))
    last_gen_epoch = None
    for epoch in range(start_epoch, config.num_epochs):
        shuffle_key, epoch_key = jax.random.split(shuffle_key)
        if dataset_generator is not None and (
                last_gen_epoch is None or epoch - last_gen_epoch >= gen_every):
            # Regen keys stay a pure function of the epoch index, so
            # gen_every=1 reproduces the original streaming byte-for-byte and
            # a resumed run regenerates the same sets it would have seen.
            fresh = dataset_generator(jax.random.fold_in(stream_key, epoch))
            train_arrays = prepare_arrays(
                fresh, stats, dtype, per_sample=per_sample,
                scale_channels=scale_channels,
            )
            if mesh is not None:
                train_arrays = jax.device_put(train_arrays, replicate)
            n_train = int(fresh["u_fine"].shape[0])
            last_gen_epoch = epoch
        idx_matrix = epoch_batch_indices(epoch_key, n_train, config.batch_size)
        noise_key = (
            jax.random.fold_in(epoch_key, 1) if config.coarse_noise_std > 0.0 else None
        )
        state, train_loss = train_epoch(state, train_arrays, idx_matrix, noise_key)
        val_loss = float(eval_loss(state, val_arrays))
        train_loss = float(train_loss)

        new_lr = plateau.step(val_loss)
        if new_lr != get_learning_rate(state.opt_state):
            state = state.replace(opt_state=set_learning_rate(state.opt_state, new_lr))

        history["train_loss"].append(train_loss)
        history["val_loss"].append(val_loss)
        history["lr"].append(new_lr)
        logger.log(epoch, {"train_loss": train_loss, "val_loss": val_loss, "learning_rate": new_lr})
        if verbose:
            print(
                f"epoch {epoch + 1}/{config.num_epochs}: "
                f"train {train_loss:.6f} val {val_loss:.6f} lr {new_lr:.2e}"
            )

        stop = early.step(val_loss, epoch)
        if early.improved:
            # Free on-device snapshot (pytrees are immutable); host writes are
            # throttled to every `checkpoint_interval` epochs because a full
            # train-state transfer is expensive over remote-TPU tunnels.
            best_snapshot = {
                "state": state,
                "epoch": epoch,
                "train_loss": train_loss,
                "val_loss": val_loss,
                "plateau": plateau.state_dict(),
                "early": early.state_dict(),
            }
            due = epoch - last_ckpt_epoch >= config.checkpoint_interval
            if config.checkpoint_every_best and due:
                _save_best(run_dir, best_snapshot, stats)
                last_ckpt_epoch = epoch
        if stop:
            if verbose:
                print(f"early stopping after {epoch + 1} epochs")
            break

    return _finalize(run_dir, config, state, stats, history, early, plateau,
                     best_snapshot, start_epoch, logger, model)


def _finalize(run_dir, config, state, stats, history, early, plateau,
              best_snapshot, start_epoch, logger, model):
    """Shared tail of both training loops: final/best checkpoints, history
    plot, logger close, and the returned history dict."""
    if best_snapshot is not None and config.checkpoint_every_best:
        _save_best(run_dir, best_snapshot, stats)
    save_checkpoint(
        run_dir / "final_model",
        {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "epoch": len(history["train_loss"]) + start_epoch - 1,
            "train_loss": history["train_loss"][-1],
            "val_loss": history["val_loss"][-1],
            "best_val_loss": early.best,
            "best_epoch": early.best_epoch,
            "plateau": plateau.state_dict(),
            "early": early.state_dict(),
            "norm_stats": jax.device_get(stats),
        },
    )
    plot_history(run_dir)
    logger.close()
    history["best_val_loss"] = early.best
    history["best_epoch"] = early.best_epoch
    history["num_epochs"] = len(history["train_loss"])
    history["state"] = state
    history["best_state"] = best_snapshot["state"] if best_snapshot is not None else state
    history["stats"] = stats
    history["model"] = model
    return history
