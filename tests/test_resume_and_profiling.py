"""Training resume from a full-state checkpoint + profiling utilities."""

import numpy as np
import jax
import jax.numpy as jnp

from superresolution_for_pdes_tpu.data import generate_standard_dataset
from superresolution_for_pdes_tpu.models import AttentionUNet
from superresolution_for_pdes_tpu.train import TrainConfig, train_model
from superresolution_for_pdes_tpu.utils.profiling import ThroughputCounter, time_fn, timed


def test_resume_continues_training(tmp_path):
    ds = generate_standard_dataset(jax.random.key(0), 48)
    model = AttentionUNet(enc_features=(8, 16, 32), bridge_features=32, head_features=(4, 4))
    cfg = TrainConfig(batch_size=16, num_epochs=3, stratify_by_subdomain=False)
    h1 = train_model(ds, cfg, tmp_path / "a", model=model, verbose=False)

    cfg2 = TrainConfig(batch_size=16, num_epochs=5, stratify_by_subdomain=False)
    h2 = train_model(
        ds, cfg2, tmp_path / "b", model=model, verbose=False,
        resume_from=str(tmp_path / "a" / "final_model"),
    )
    # resumed run trains only the remaining epochs
    assert h2["num_epochs"] == 2
    assert np.isfinite(h2["train_loss"]).all()
    # parameters actually moved on from the checkpoint
    assert h2["train_loss"][0] < h1["train_loss"][0]


def test_timers_and_counter():
    f = jax.jit(lambda x: x * 2 + 1)
    x = jnp.ones((128, 128))
    dt = time_fn(f, x, reps=3)
    assert dt > 0
    out = {}
    with timed(out, "block"):
        jax.block_until_ready(f(x))
    assert out["block"] > 0
    c = ThroughputCounter()
    c.start()
    jax.block_until_ready(f(x))
    c.stop(128)
    assert c.per_second > 0
