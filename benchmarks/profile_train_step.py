"""Diagnose the training-step wall clock on the real chip (VERDICT r1 item 3).

Round 1 measured ~35 s/epoch (50 steps of batch 32) for the published config —
<1% MFU. This script isolates where the time goes: forward-only vs
forward+backward+update, f32 vs bf16, batch 32 vs 256, physics term on/off,
BatchNorm vs GroupNorm — each measured with the bench.py pattern (rep loop
inside one jitted program, scalar fetch).

Usage: python benchmarks/profile_train_step.py [--trace /tmp/trace]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/superres_pde_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timed_scan(step_fn, state, args, reps=20):
    """Seconds per step: `reps` steps inside one jitted scan, scalar fetch."""

    @jax.jit
    def run(state, args):
        def body(carry, _):
            new_carry, loss = step_fn(carry, args)
            return new_carry, loss

        state2, losses = jax.lax.scan(body, state, jnp.arange(reps))
        return jnp.sum(losses), state2

    out, _ = run(state, args)
    float(out)  # compile + warm
    t0 = time.perf_counter()
    out, _ = run(state, args)
    float(out)
    return (time.perf_counter() - t0) / reps


def build(batch, dtype, physics, norm, n_data=1600):
    from superresolution_for_pdes_tpu.data import generate_enhanced_dataset
    from superresolution_for_pdes_tpu.data.normalization import NormStats
    from superresolution_for_pdes_tpu.models import AttentionUNet, init_unet
    from superresolution_for_pdes_tpu.train import TrainConfig
    from superresolution_for_pdes_tpu.train.loop import (
        TrainState, make_optimizer, make_train_fns, prepare_arrays,
    )

    ds = generate_enhanced_dataset(jax.random.key(0), n_data, 0)
    stats = NormStats.from_dataset(ds)
    arrays = prepare_arrays(ds, stats, dtype=jnp.dtype(dtype))
    model, variables = init_unet(
        jax.random.key(0), AttentionUNet(dtype=jnp.dtype(dtype), norm=norm))
    tx = make_optimizer(TrainConfig())
    state = TrainState(params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(variables["params"]),
                       step=jnp.zeros((), jnp.int32))
    train_epoch, eval_loss = make_train_fns(model, tx, stats,
                                            physics_weight=physics)
    return model, state, arrays, stats, train_epoch, eval_loss, tx


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--trace", type=str, default=None)
    args = parser.parse_args()

    from superresolution_for_pdes_tpu.train.loop import make_train_fns  # noqa

    print(f"device: {jax.devices()[0].device_kind}")
    rows = []
    for label, batch, dtype, physics, norm in [
        ("published f32+phys bn", 32, "float32", 0.1, "batch"),
        ("f32 no-phys bn", 32, "float32", 0.0, "batch"),
        ("bf16+phys bn", 32, "bfloat16", 0.1, "batch"),
        ("f32+phys gn", 32, "float32", 0.1, "group"),
        ("b256 f32+phys bn", 256, "float32", 0.1, "batch"),
        ("b256 bf16+phys bn", 256, "bfloat16", 0.1, "batch"),
    ]:
        model, state, arrays, stats, train_epoch, eval_loss, tx = build(
            batch, dtype, physics, norm)
        import numpy as np

        idx = jnp.asarray(
            np.random.default_rng(0).permutation(1600)[: (1600 // batch) * batch]
            .reshape(-1, batch), jnp.int32)

        # one full epoch program (the production path)
        state2, loss = train_epoch(state, arrays, idx)
        float(loss)
        t0 = time.perf_counter()
        state2, loss = train_epoch(state, arrays, idx)
        float(loss)
        per_epoch = time.perf_counter() - t0
        per_step = per_epoch / idx.shape[0]
        sps = 1600 // batch * batch / per_epoch
        rows.append((label, per_epoch, per_step * 1e3, sps))
        print(f"{label:24s} epoch {per_epoch:6.2f}s  step {per_step*1e3:7.1f}ms  "
              f"{sps:9.0f} samples/s", flush=True)

    if args.trace:
        model, state, arrays, stats, train_epoch, eval_loss, tx = build(
            32, "float32", 0.1, "batch")
        idx = jnp.arange(320, dtype=jnp.int32).reshape(10, 32)
        state2, loss = train_epoch(state, arrays, idx)
        float(loss)
        with jax.profiler.trace(args.trace):
            state2, loss = train_epoch(state, arrays, idx)
            float(loss)
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
