"""End-to-end quickstart: datagen -> train -> cascade, in ~40 lines.

Run on any backend (TPU chip, CPU, or the virtual mesh):

    python examples/quickstart.py          # small demo sizes
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo checkout

import jax
import jax.numpy as jnp

from superresolution_for_pdes_tpu import solve_poisson
from superresolution_for_pdes_tpu.cascade import (
    interpolation_upscale,
    ml_multi_level_upscale,
    solve_multi_resolution,
)
from superresolution_for_pdes_tpu.data import generate_enhanced_dataset
from superresolution_for_pdes_tpu.ops import forcing_term
from superresolution_for_pdes_tpu.train import TrainConfig, train_model


def main():
    print(f"backend: {jax.default_backend()} ({jax.device_count()} devices)")

    # 1. Solve a batch of Poisson problems directly (the datagen hot path).
    f = jnp.stack([forcing_term(k, k + 0.7, 40) for k in (1.0, 2.0, 3.0)])
    u = solve_poisson(f, jnp.ones_like(f))
    print(f"batched direct solve: {u.shape}, |u|max={float(jnp.abs(u).max()):.2e}")

    # 2. Generate a small training mix on-device and train briefly (a
    #    reduced-width model keeps this demo fast even on CPU; drop the
    #    `model=` argument to train the full 7.8M-parameter flagship).
    from superresolution_for_pdes_tpu.models import AttentionUNet

    dataset = generate_enhanced_dataset(jax.random.key(0), 64, 64)
    config = TrainConfig(num_epochs=5, physics_weight=0.1)
    demo_model = AttentionUNet(enc_features=(16, 32, 64), bridge_features=128,
                               head_features=(16, 8))
    history = train_model(dataset, config, "results/quickstart_run",
                          model=demo_model, verbose=True)

    # 3. Multi-level cascade inference vs the bilinear baseline.
    model, state = history["model"], history["best_state"]
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    scene = solve_multi_resolution(jax.random.key(1), resolutions=(80, 160))
    ml = ml_multi_level_upscale(model, variables, scene, 160, overlap=True)
    bl = interpolation_upscale(scene["u"][40], 160)
    truth = scene["u"][160]
    print(
        f"cascade to 160x160: ML MAE {float(jnp.abs(ml - truth).mean()):.3e} | "
        f"bilinear MAE {float(jnp.abs(bl - truth).mean()):.3e} "
        f"(5 epochs only — see README for converged numbers)"
    )

    # 4. Freeze the configuration as ONE deployment artifact and serve it
    #    (see `python -m superresolution_for_pdes_tpu upscale --help`).
    from superresolution_for_pdes_tpu.deploy import run_bundle, save_bundle

    cfg = dict(name="attention_unet", enc_features=(16, 32, 64),
               bridge_features=128, head_features=(16, 8))
    save_bundle("results/quickstart_bundle", cfg, variables, stats_mode="tile")
    data = {"u": {40: scene["u"][40]}, "f": scene["f"], "theta": scene["theta"]}
    served = run_bundle("results/quickstart_bundle", data, 160)
    print(f"served from bundle: {served[160].shape} "
          f"(MAE {float(jnp.abs(served[160] - truth).mean()):.3e})")


if __name__ == "__main__":
    main()
