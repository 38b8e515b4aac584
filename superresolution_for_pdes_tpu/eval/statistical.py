"""Statistical benchmark: N independent scenes with accuracy + wall-clock stats.

Replicates the reference harness (``/root/reference/src/
resolution_comparison_statistical.py:98-540``): N examples (default 10,
k ~ U(8, 12), ``:40-41``), per-example MAE/RMSE for ML cascade vs bilinear at
every resolution, wall-clock timings of the direct solver / ML cascade /
bilinear upscaling, aggregated into CSV + summary text + box/timing plots.
The reference's plotting crash (5 args to a 7-arg function, ``:200-203``) is
of course not replicated.

Timings use ``block_until_ready`` around jitted calls; the first (compile)
call per shape is excluded by a warm-up scene.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Dict, Optional, Sequence, Tuple

import jax
import numpy as np

from superresolution_for_pdes_tpu.cascade.multires import solve_multi_resolution
from superresolution_for_pdes_tpu.cascade.upscale import (
    interpolation_upscale,
    ml_multi_level_upscale,
)
from superresolution_for_pdes_tpu.eval.metrics import compute_metrics


def run_single_example(model, variables, key, resolutions, k_range, stats_mode,
                       timings=True, train_stats=None):
    scene = solve_multi_resolution(
        key, resolutions=tuple(resolutions), k_range=k_range, time_solves=timings
    )
    record: Dict = {"k1": scene["k1"], "k2": scene["k2"],
                    "solve_times": scene.get("solve_times", {})}
    for res in resolutions:
        t0 = time.perf_counter()
        ml = ml_multi_level_upscale(model, variables, scene, res, stats_mode=stats_mode,
                                    train_stats=train_stats)
        ml.block_until_ready()
        ml_time = time.perf_counter() - t0

        t0 = time.perf_counter()
        bl = interpolation_upscale(scene["u"][40], res, "bilinear")
        bl.block_until_ready()
        bl_time = time.perf_counter() - t0

        truth = scene["u"][res]
        record[res] = {
            "ml": {k: float(v) for k, v in compute_metrics(ml, truth).items()},
            "bilinear": {k: float(v) for k, v in compute_metrics(bl, truth).items()},
            "ml_time": ml_time,
            "bilinear_time": bl_time,
        }
    return record


def run_statistical_benchmark(
    model,
    variables,
    key: jax.Array,
    n_examples: int = 10,
    resolutions: Sequence[int] = (80, 160, 320, 640),
    k_range: Tuple[float, float] = (8.0, 12.0),
    stats_mode: str = "oracle",
    save_dir: Optional[Path] = None,
    train_stats=None,
) -> Dict:
    # Warm-up scene compiles every per-resolution program so timings below
    # measure steady-state execution.
    key, warm = jax.random.split(key)
    run_single_example(model, variables, warm, resolutions, k_range, stats_mode,
                       timings=False, train_stats=train_stats)

    records = []
    for _ in range(n_examples):
        key, sub = jax.random.split(key)
        records.append(
            run_single_example(model, variables, sub, resolutions, k_range, stats_mode,
                               train_stats=train_stats)
        )

    aggregate: Dict = {}
    for res in resolutions:
        ml_mae = np.array([r[res]["ml"]["mae"] for r in records])
        bl_mae = np.array([r[res]["bilinear"]["mae"] for r in records])
        aggregate[res] = {
            "ml_mae_mean": float(ml_mae.mean()), "ml_mae_std": float(ml_mae.std()),
            "bilinear_mae_mean": float(bl_mae.mean()), "bilinear_mae_std": float(bl_mae.std()),
            "ml_advantage": float(bl_mae.mean() / max(ml_mae.mean(), 1e-30)),
            "ml_time_mean": float(np.mean([r[res]["ml_time"] for r in records])),
            "bilinear_time_mean": float(np.mean([r[res]["bilinear_time"] for r in records])),
            "solve_time_mean": float(np.mean([r["solve_times"].get(res, np.nan) for r in records])),
        }

    result = {"records": records, "aggregate": aggregate, "n_examples": n_examples,
              "k_range": list(k_range), "stats_mode": stats_mode}

    if save_dir is not None:
        save_dir = Path(save_dir)
        save_dir.mkdir(parents=True, exist_ok=True)
        (save_dir / "statistical_results.json").write_text(json.dumps(
            {k: v for k, v in result.items() if k != "records"}
            | {"records": [{str(kk): vv for kk, vv in r.items()} for r in records]},
            indent=2, default=float))
        _write_csv_and_plots(records, aggregate, resolutions, save_dir)
    return result


def _write_csv_and_plots(records, aggregate, resolutions, save_dir: Path):
    try:
        import pandas as pd

        rows = []
        for i, r in enumerate(records):
            for res in resolutions:
                rows.append({
                    "example": i, "resolution": res, "k1": r["k1"], "k2": r["k2"],
                    "ml_mae": r[res]["ml"]["mae"], "ml_rmse": r[res]["ml"]["rmse"],
                    "bilinear_mae": r[res]["bilinear"]["mae"],
                    "bilinear_rmse": r[res]["bilinear"]["rmse"],
                    "ml_time": r[res]["ml_time"], "bilinear_time": r[res]["bilinear_time"],
                    "solve_time": r["solve_times"].get(res, float("nan")),
                })
        pd.DataFrame(rows).to_csv(save_dir / "statistical_results.csv", index=False)
    except Exception:
        pass

    lines = ["Statistical benchmark summary", "=" * 34]
    for res in resolutions:
        a = aggregate[res]
        lines += [
            f"{res}x{res}: ML MAE {a['ml_mae_mean']:.3e} +/- {a['ml_mae_std']:.1e} | "
            f"bilinear MAE {a['bilinear_mae_mean']:.3e} +/- {a['bilinear_mae_std']:.1e} | "
            f"advantage {a['ml_advantage']:.1f}x",
            f"    times: ml {a['ml_time_mean']*1e3:.2f} ms, bilinear "
            f"{a['bilinear_time_mean']*1e3:.2f} ms, direct solve {a['solve_time_mean']*1e3:.2f} ms",
        ]
    (save_dir / "summary.txt").write_text("\n".join(lines) + "\n")

    from superresolution_for_pdes_tpu.eval.plots import plot_box

    for res in resolutions:
        plot_box(
            {
                "ML": np.array([r[res]["ml"]["mae"] for r in records]),
                "Bilinear": np.array([r[res]["bilinear"]["mae"] for r in records]),
            },
            ylabel=f"MAE at {res}x{res}",
            out_path=save_dir / f"mae_box_{res}x{res}.png",
            log=True,
        )
