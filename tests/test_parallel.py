"""Multi-device sharding on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from superresolution_for_pdes_tpu.data import generate_standard_dataset
from superresolution_for_pdes_tpu.models import AttentionUNet, init_unet
from superresolution_for_pdes_tpu.parallel import data_mesh, make_online_train_step
from superresolution_for_pdes_tpu.parallel.online import calibration_stats
from superresolution_for_pdes_tpu.train import TrainConfig, train_model
from superresolution_for_pdes_tpu.train.loop import TrainState, make_optimizer


def test_eight_virtual_devices():
    assert jax.device_count() == 8


def test_sharded_training_matches_config(tmp_path):
    mesh = data_mesh()
    ds = generate_standard_dataset(jax.random.key(0), 64)
    config = TrainConfig(batch_size=16, num_epochs=2, stratify_by_subdomain=False,
                         checkpoint_every_best=False)
    model = AttentionUNet(enc_features=(8, 16, 32), bridge_features=64, head_features=(8, 4))
    history = train_model(ds, config, tmp_path / "dp", mesh=mesh, model=model, verbose=False)
    assert np.isfinite(history["train_loss"]).all()
    assert history["train_loss"][-1] < history["train_loss"][0] * 2  # sane magnitude


def test_sharded_equals_single_device(tmp_path):
    """DP over 8 chips must be numerically equivalent to single-device
    (same seeds, same batches -> same losses up to float reassociation)."""
    ds = generate_standard_dataset(jax.random.key(1), 64)
    config = TrainConfig(batch_size=32, num_epochs=2, stratify_by_subdomain=False,
                         checkpoint_every_best=False)
    model = AttentionUNet(enc_features=(8, 16, 32), bridge_features=64, head_features=(8, 4))
    h1 = train_model(ds, config, tmp_path / "single", model=model, verbose=False)
    h8 = train_model(ds, config, tmp_path / "multi", mesh=data_mesh(), model=model, verbose=False)
    np.testing.assert_allclose(h1["train_loss"], h8["train_loss"], rtol=2e-3)
    np.testing.assert_allclose(h1["val_loss"], h8["val_loss"], rtol=2e-3)


def test_online_fused_datagen_step():
    mesh = data_mesh()
    stats = calibration_stats(jax.random.key(0), n_samples=64)
    model = AttentionUNet(enc_features=(8, 16, 32), bridge_features=64, head_features=(8, 4))
    model, variables = init_unet(jax.random.key(0), model)
    config = TrainConfig()
    tx = make_optimizer(config)
    sharding = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data"))
    replicated = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    state = TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )
    state = jax.device_put(state, replicated)
    step = make_online_train_step(model, tx, stats, batch_size=32, batch_sharding=sharding)
    losses = []
    key = jax.random.key(7)
    for i in range(3):
        key, sub = jax.random.split(key)
        state, loss = step(state, sub)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert int(state.step) == 3


def test_grid_mesh_2d_scene_tile_sharding():
    """2-D ('scene', 'tile') mesh: a batched tile tensor shards over both axes
    and a sharded computation matches the unsharded one."""
    from superresolution_for_pdes_tpu.parallel import grid_mesh

    mesh = grid_mesh((4, 2), ("scene", "tile"))
    assert mesh.devices.shape == (4, 2) and mesh.axis_names == ("scene", "tile")
    sharding = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("scene", "tile")
    )
    x = jnp.arange(8 * 4 * 5 * 5, dtype=jnp.float32).reshape(8, 4, 5, 5)
    xs = jax.device_put(x, sharding)

    @jax.jit
    def norms(t):
        return jnp.sqrt(jnp.sum(t * t, axis=(-2, -1)))

    np.testing.assert_allclose(np.asarray(norms(xs)), np.asarray(norms(x)), rtol=1e-6)


def test_multihost_initialize_single_process_fallback():
    """initialize_multihost degrades to the local runtime in single-process
    environments and reports the topology."""
    from superresolution_for_pdes_tpu.parallel import initialize_multihost

    topo = initialize_multihost()
    assert topo["process_count"] >= 1
    assert topo["global_devices"] >= topo["local_devices"] >= 1
