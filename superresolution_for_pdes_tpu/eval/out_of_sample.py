"""Out-of-sample evaluation on fresh high-frequency data.

Replicates ``evaluate_out_of_sample`` (reference
``/root/reference/src/test_out_of_sample.py:125-238``): generate fresh samples
with k outside the training range (default U(5, 8), reference ``:21``), run the
single-level comparison, write average-metrics JSON and detailed per-sample
plots (comparison grid, error distribution, mid-row cross-section).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional, Tuple

import jax
import numpy as np

from superresolution_for_pdes_tpu.data.generate import generate_test_dataset
from superresolution_for_pdes_tpu.eval.single_level import evaluate_dataset, predict_dataset
from superresolution_for_pdes_tpu.ops.resize import resize_align_corners


def evaluate_out_of_sample(
    model,
    variables,
    key: jax.Array,
    n_samples: int = 5,
    k_range: Tuple[float, float] = (5.0, 8.0),
    save_dir: Optional[Path] = None,
    n_plot: int = 3,
    constant_theta: bool = True,
    normalization: str = "dataset",
    symmetrize: bool = False,
) -> Dict:
    data = generate_test_dataset(key, n_samples, k_range, constant_theta=constant_theta)
    result = evaluate_dataset(
        model, variables, data, label="out_of_sample", save_dir=save_dir, n_plot=n_plot,
        normalization=normalization, symmetrize=symmetrize,
    )
    if save_dir is not None:
        save_dir = Path(save_dir)
        avg = {
            f"avg_{method}_{metric}": value
            for method, ms in result["summary"].items()
            for metric, value in ms.items()
        }
        (save_dir / "average_metrics.json").write_text(json.dumps(avg, indent=2))

        from superresolution_for_pdes_tpu.eval.plots import (
            plot_cross_section,
            plot_error_distribution,
        )

        if hasattr(model, "predict"):  # a RegimeRouter (expert ensemble)
            from superresolution_for_pdes_tpu.data.normalization import NormStats

            ml = model.predict(data, NormStats.from_dataset(data), symmetrize=symmetrize)
        else:
            ml = predict_dataset(model, variables, data,
                                 normalization=normalization, symmetrize=symmetrize)
        fine_shape = tuple(int(s) for s in data["u_fine"].shape[-2:])
        bilinear = resize_align_corners(data["u_coarse"], fine_shape, "bilinear")
        for idx in range(min(n_plot, n_samples)):
            truth = np.asarray(data["u_fine"][idx])
            plot_error_distribution(
                {
                    "ML": np.abs(np.asarray(ml[idx]) - truth),
                    "Bilinear": np.abs(np.asarray(bilinear[idx]) - truth),
                },
                f"Out-of-sample error distribution (sample {idx + 1})",
                save_dir / f"error_distribution_{idx + 1}.png",
            )
            plot_cross_section(
                {
                    "Ground truth": truth,
                    "ML": np.asarray(ml[idx]),
                    "Bilinear": np.asarray(bilinear[idx]),
                },
                row=truth.shape[0] // 2,
                title=f"Mid-row cross-section (sample {idx + 1})",
                out_path=save_dir / f"cross_section_{idx + 1}.png",
            )
    return result
