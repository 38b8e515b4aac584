"""Break the STREAMED champion epoch into its parts on the real chip.

The round-3 bf16 runs showed wallclock is not train-step-bound: the champion
recipe's ~6 s epoch contains per-epoch on-device regeneration (solves +
tiling), normalization/prepare, the scanned train epoch, the val pass, and a
handful of host scalar fetches that each pay a tunnel round-trip. This prints
one JSON line per component (bench.py pattern: block on a scalar, not
block_until_ready) for the flagship_r7 streamed configuration.

Usage: python benchmarks/profile_epoch.py
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/superres_pde_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main() -> None:
    from superresolution_for_pdes_tpu.data.generate import generate_mixed_dataset
    from superresolution_for_pdes_tpu.data.normalization import NormStats
    from superresolution_for_pdes_tpu.data.pipeline import epoch_batch_indices
    from superresolution_for_pdes_tpu.models import AttentionUNet, init_unet
    from superresolution_for_pdes_tpu.train import TrainConfig
    from superresolution_for_pdes_tpu.train.loop import (
        TrainState, make_optimizer, make_train_fns, prepare_arrays,
    )

    def gen(key):
        # flagship_r7 recipe: mixed theta, 384 cascade scenes x 12 tiles,
        # 1000 standard + 1000 subdomain
        return generate_mixed_dataset(
            key, n_standard=1000, n_subdomain=1000, theta="mixed",
            n_cascade_scenes=384, cascade_tiles_per_level=12,
            cascade_k_range=(6.0, 12.0),
        )

    def timed(label, fn, reps=3):
        fn()  # compile + warm
        t0 = time.perf_counter()
        for _ in range(reps):
            fn()
        dt = (time.perf_counter() - t0) / reps
        print(json.dumps({"component": label, "seconds": round(dt, 4)}), flush=True)
        return dt

    key = jax.random.key(0)
    ds0 = gen(key)
    n = int(ds0["u_fine"].shape[0])
    stats = NormStats.from_dataset(ds0)

    total = 0.0
    total += timed("regen_ondevice", lambda: float(gen(key)["u_fine"][0, 0, 0]))
    arrays = prepare_arrays(ds0, stats, per_sample=True, scale_channels=True)
    total += timed("prepare_arrays", lambda: float(
        prepare_arrays(ds0, stats, per_sample=True, scale_channels=True)["x"][0, 0, 0, 0]))

    # scale-aware per-sample inputs carry 5 channels (flagship_r7 recipe)
    model, variables = init_unet(jax.random.key(0), AttentionUNet(in_channels=5))
    config = TrainConfig(batch_size=32, physics_weight=0.3,
                         normalization="per_sample", scale_channels=True)
    tx = make_optimizer(config)
    state = TrainState(params=variables["params"], batch_stats=variables["batch_stats"],
                       opt_state=tx.init(variables["params"]),
                       step=jnp.zeros((), jnp.int32))
    train_epoch, eval_loss = make_train_fns(model, tx, stats, physics_weight=0.3)
    idx = epoch_batch_indices(jax.random.key(1), n, config.batch_size)

    def one_epoch():
        nonlocal state
        state, loss = train_epoch(state, arrays, idx)
        return float(loss)

    total += timed("train_epoch_scan", one_epoch)
    # the real loop evaluates the ~20% val split, not the full set — a full-set
    # eval is one giant program whose activations exceed 16 GB HBM at this n
    n_val = max(1, n // 5)
    val_arrays = {k: v[:n_val] for k, v in arrays.items()}
    total += timed("val_pass", lambda: float(eval_loss(state, val_arrays)))
    rtt = timed("scalar_fetch_rtt", lambda: float(state.step))
    print(json.dumps({"component": "epoch_total_estimate",
                      "seconds": round(total, 4),
                      "n_samples": n,
                      "scalar_fetch_rtt": round(rtt, 4)}), flush=True)


if __name__ == "__main__":
    main()
