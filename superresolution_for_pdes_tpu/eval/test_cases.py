"""Generalization grid: in/out-of-sample x constant/varying theta.

Replicates the reference's comprehensive comparison
(``/root/reference/src/compare_test_cases.py:560-676``): five test sets —
"training-like" (k in the training range 0.5-5.0, ``:249-264``), in-sample
k U(1, 6) and out-of-sample k U(6, 8), each with theta == 1 and with
theta ~ U(0.5, 2.0) (``:585-616``) — evaluated single-level with grouped bar
charts (linear + log) and one comprehensive JSON.

The reference has a latent bug here — out-of-sample varying-theta "ml_rmse"
copies the bilinear RMSE (``compare_test_cases.py:466``). Not replicated.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional

import jax

from superresolution_for_pdes_tpu.data.generate import generate_test_dataset
from superresolution_for_pdes_tpu.eval.single_level import evaluate_dataset

GRID = (
    ("training_like", (0.5, 5.0), True),
    ("in_sample_const_theta", (1.0, 6.0), True),
    ("in_sample_varying_theta", (1.0, 6.0), False),
    ("out_of_sample_const_theta", (6.0, 8.0), True),
    ("out_of_sample_varying_theta", (6.0, 8.0), False),
)


def run_generalization_grid(
    model,
    variables,
    key: jax.Array,
    n_samples: int = 10,
    save_dir: Optional[Path] = None,
    n_plot: int = 2,
    symmetrize: bool = False,
) -> Dict[str, Dict]:
    results: Dict[str, Dict] = {}
    for label, k_range, const_theta in GRID:
        key, sub = jax.random.split(key)
        data = generate_test_dataset(sub, n_samples, k_range, constant_theta=const_theta)
        results[label] = evaluate_dataset(
            model, variables, data, label=label, save_dir=save_dir, n_plot=n_plot,
            symmetrize=symmetrize,
        )

    if save_dir is not None:
        save_dir = Path(save_dir)
        save_dir.mkdir(parents=True, exist_ok=True)
        comprehensive = {
            label: result["summary"] for label, result in results.items()
        }
        (save_dir / "comprehensive_test_results.json").write_text(
            json.dumps(comprehensive, indent=2)
        )
        from superresolution_for_pdes_tpu.eval.plots import plot_grouped_bars

        labels = list(results)
        for metric in ("mae", "rmse"):
            series = {
                method: [results[lbl]["summary"][method][metric] for lbl in labels]
                for method in ("ml", "bilinear", "bicubic")
            }
            plot_grouped_bars(labels, series, metric.upper(),
                              save_dir / f"comparison_{metric}.png")
            plot_grouped_bars(labels, series, metric.upper() + " (log)",
                              save_dir / f"comparison_{metric}_log.png", log=True)
    return results
