"""Training-throughput benchmark + train-to-convergence wall-clock.

Two numbers the round-1 review asked for (VERDICT items 3):

1. steady-state training samples/sec for the published configuration
   (7.8M-param attention U-Net, batch 32, 40x40 inputs, physics loss on),
   measured with the bench.py pattern (epoch program scanned on device,
   scalar fetch forces completion);
2. wall-clock from cold start to a checkpoint matching the reference's
   published best val loss (5.96e-3 normalized MSE,
   ``/root/reference/results/enhanced_run_20250227_142049`` event file) —
   the <10-minute north-star in BASELINE.md. Includes datagen + compile +
   training + the final checkpoint write.

Prints one JSON line per metric and optionally writes reports/train_bench.json.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/superres_pde_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REFERENCE_BEST_VAL = 5.96e-3  # BASELINE.md, published run event file


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", type=str, default=None)
    parser.add_argument("--epochs", type=int, default=60)
    args = parser.parse_args()

    t_start = time.perf_counter()

    from superresolution_for_pdes_tpu.data import generate_enhanced_dataset
    from superresolution_for_pdes_tpu.data.normalization import NormStats
    from superresolution_for_pdes_tpu.data.pipeline import epoch_batch_indices
    from superresolution_for_pdes_tpu.models import AttentionUNet, init_unet
    from superresolution_for_pdes_tpu.train import TrainConfig, train_model
    from superresolution_for_pdes_tpu.train.loop import (
        TrainState,
        make_optimizer,
        make_train_fns,
        prepare_arrays,
    )

    # --- 1) steady-state throughput (published config shapes) ---
    dataset = generate_enhanced_dataset(jax.random.key(0), 1600, 0)
    stats = NormStats.from_dataset(dataset)
    arrays = prepare_arrays(dataset, stats)
    model, variables = init_unet(jax.random.key(0), AttentionUNet())
    config = TrainConfig()
    tx = make_optimizer(config)
    state = TrainState(
        params=variables["params"], batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]), step=jnp.zeros((), jnp.int32),
    )
    train_epoch, _ = make_train_fns(model, tx, stats, physics_weight=0.1)
    idx = epoch_batch_indices(jax.random.key(1), 1600, config.batch_size)
    state, loss = train_epoch(state, arrays, idx)
    float(loss)  # compile + warm
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        state, loss = train_epoch(state, arrays, idx)
        float(loss)
    per_epoch = (time.perf_counter() - t0) / reps
    samples_per_sec = 1600 / per_epoch
    print(json.dumps({
        "metric": "train_samples_per_sec_b32_unet7p8M_physics",
        "value": round(samples_per_sec, 1), "unit": "samples/sec",
    }))

    # MFU estimate: XLA's own FLOP count for the compiled epoch program over
    # the measured wall-clock, against the v5e bf16 MXU peak (197 TFLOP/s;
    # TPU matmuls at DEFAULT precision execute on the bf16 MXU datapath, so
    # the bf16 peak is the relevant roofline for this f32-stored model).
    #
    # cost_analysis() counts a scan/while BODY ONCE, not per trip (verified:
    # a 1-step and a 2-step epoch program report identical flops) — the
    # round-1..3 numbers in reports/train_bench.json divided by the full
    # epoch wall-clock and so under-reported MFU by the steps-per-epoch
    # factor (50x at b32, 6x at b256). Multiply by the trip count.
    mfu = None
    try:
        ca = train_epoch.lower(state, arrays, idx).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops_per_epoch = float(ca.get("flops", 0.0)) * len(idx)
        if flops_per_epoch > 0:
            peak = 197e12
            mfu = flops_per_epoch / per_epoch / peak
            print(json.dumps({
                "metric": "train_mfu_vs_v5e_bf16_peak",
                "value": round(mfu, 4), "unit": "fraction",
                "flops_per_epoch": flops_per_epoch,
            }))
    except Exception as exc:  # cost_analysis availability is backend-dependent
        print(json.dumps({"metric": "train_mfu_vs_v5e_bf16_peak",
                          "value": None, "note": repr(exc)}))

    # --- 1b) bf16/b256 variant (round-3 validated recipe: accuracy within
    # +-5% of f32 on the honest cascade, reports/statistical_bf16.txt) ---
    model16, variables16 = init_unet(
        jax.random.key(0), AttentionUNet(dtype=jnp.bfloat16))
    cfg16 = TrainConfig(batch_size=256, dtype="bfloat16", learning_rate=6e-4)
    tx16 = make_optimizer(cfg16)
    state16 = TrainState(
        params=variables16["params"], batch_stats=variables16["batch_stats"],
        opt_state=tx16.init(variables16["params"]), step=jnp.zeros((), jnp.int32),
    )
    arrays16 = prepare_arrays(dataset, stats, jnp.bfloat16)
    train_epoch16, _ = make_train_fns(model16, tx16, stats, physics_weight=0.1)
    idx16 = epoch_batch_indices(jax.random.key(1), 1600, cfg16.batch_size)
    state16, loss16 = train_epoch16(state16, arrays16, idx16)
    float(loss16)
    t0 = time.perf_counter()
    for _ in range(reps):
        state16, loss16 = train_epoch16(state16, arrays16, idx16)
        float(loss16)
    per_epoch16 = (time.perf_counter() - t0) / reps
    samples_per_sec16 = 1600 / per_epoch16
    mfu16 = None
    try:
        ca = train_epoch16.lower(state16, arrays16, idx16).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops16 = float(ca.get("flops", 0.0)) * len(idx16)  # body counted once
        if flops16 > 0:
            mfu16 = flops16 / per_epoch16 / 197e12
    except Exception:
        pass
    print(json.dumps({
        "metric": "train_samples_per_sec_b256_bf16",
        "value": round(samples_per_sec16, 1), "unit": "samples/sec",
        "mfu_vs_v5e_bf16_peak": round(mfu16, 4) if mfu16 else None,
    }))

    # --- 2) cold-start wall-clock to reference-quality val ---
    dataset = generate_enhanced_dataset(jax.random.key(42), 1000, 1000)
    cfg = TrainConfig(num_epochs=args.epochs, checkpoint_interval=10**9)
    hist = train_model(dataset, cfg, "/tmp/bench_train_run", verbose=False)
    elapsed = time.perf_counter() - t_start
    vals = hist["val_loss"]
    hit = next((i for i, v in enumerate(vals) if v <= REFERENCE_BEST_VAL), None)
    print(json.dumps({
        "metric": "train_to_reference_val_wallclock",
        "value": round(elapsed, 1), "unit": "sec (total incl datagen+compile)",
        "best_val": hist["best_val_loss"],
        "reference_best_val": REFERENCE_BEST_VAL,
        "epochs_run": len(vals),
        "first_epoch_at_reference_val": hit if hit is not None else -1,
        "under_10min": elapsed < 600,
    }))

    if args.out:
        from pathlib import Path

        Path(args.out).parent.mkdir(parents=True, exist_ok=True)
        Path(args.out).write_text(json.dumps({
            "train_samples_per_sec": samples_per_sec,
            "train_mfu_vs_v5e_bf16_peak": mfu,
            "train_samples_per_sec_b256_bf16": samples_per_sec16,
            "train_mfu_b256_bf16": mfu16,
            "bf16_accuracy": "cascade ratios within +-5% of f32 "
                             "(reports/statistical_bf16.txt)",
            "epoch_seconds_published_config": per_epoch,
            "wallclock_to_convergence_sec": elapsed,
            "best_val": hist["best_val_loss"],
            "reference_best_val": REFERENCE_BEST_VAL,
            "epochs_run": len(vals),
            "first_epoch_at_reference_val": hit,
        }, indent=2))


if __name__ == "__main__":
    main()
