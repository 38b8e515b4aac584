"""A/B the fused streaming epoch against the standard streamed loop on-chip.

``TrainConfig.fused_epochs`` scans K epochs of regenerate -> prepare -> train
-> validate inside ONE jitted program, amortizing the per-epoch host
dispatches and tunnel round-trips that dominate streamed champion epochs
(``benchmarks/profile_epoch.py`` breaks a single epoch down). This benchmark
times both modes on the flagship_r7 streamed recipe and prints one JSON line
per mode plus a final speedup line.

Protocol: per mode, one throwaway run compiles every program shape, then a
short and a long run (long = short + MEASURE epochs, with the short length a
whole number of fused chunks so both runs execute identical programs);
steady-state epoch time = (t_long - t_short) / MEASURE. Early stopping and
best-checkpoint writes are disabled so both modes do identical work.

Measured on v5e (2026-08-18): standard 5.6 s/epoch, fused8 >= 11 s/epoch —
fusing K streamed epochs into one program is ~2x SLOWER on the real chip (the
chunk program holds datagen + train + val live at once and loses the
overlap/fusion XLA finds per stage), so ``fused_epochs`` stays opt-in.

Usage: python benchmarks/bench_fused.py  (real chip; single-holder)
"""

from __future__ import annotations

import json
import shutil
import tempfile
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/superres_pde_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

WARM = 4
MEASURE = 16


def main() -> None:
    from superresolution_for_pdes_tpu.data.generate import generate_mixed_dataset
    from superresolution_for_pdes_tpu.train import TrainConfig
    from superresolution_for_pdes_tpu.train.loop import train_model

    def gen(key):
        # flagship_r7 streamed recipe (reports/RECIPES.md)
        return generate_mixed_dataset(
            key, n_standard=1000, n_subdomain=1000, theta="mixed",
            n_cascade_scenes=384, cascade_tiles_per_level=12,
            cascade_k_range=(6.0, 12.0),
        )

    ds0 = gen(jax.random.key(0))

    def run(fused: int, epochs: int) -> float:
        cfg = TrainConfig(
            num_epochs=epochs, fused_epochs=fused, physics_weight=0.3,
            normalization="per_sample", scale_channels=True,
            early_stopping_patience=10**6, plateau_patience=10**6,
            checkpoint_every_best=False,
        )
        run_dir = tempfile.mkdtemp(prefix="bench_fused_")
        t0 = time.perf_counter()
        train_model(ds0, cfg, run_dir, verbose=False, dataset_generator=gen)
        dt = time.perf_counter() - t0
        shutil.rmtree(run_dir, ignore_errors=True)
        return dt

    results = {}
    for label, fused, short in (("standard", 0, WARM), ("fused8", 8, 8)):
        # Epoch lengths are chosen so the long run executes the SAME programs
        # as the short one (for fused mode: whole chunks of 8), and a throwaway
        # run pays all compilation first — the first timed run must not.
        long = short + MEASURE
        run(fused, short)  # throwaway: compile every program shape
        t_short = run(fused, short)
        t_long = run(fused, long)
        per_epoch = (t_long - t_short) / MEASURE
        results[label] = per_epoch
        print(json.dumps({"mode": label, "epoch_seconds": round(per_epoch, 3),
                          "short_total": round(t_short, 1),
                          "long_total": round(t_long, 1)}), flush=True)
    print(json.dumps({"metric": "fused_epoch_speedup",
                      "value": round(results["standard"] / results["fused8"], 2),
                      "unit": "x vs standard streamed epoch"}), flush=True)


if __name__ == "__main__":
    main()
