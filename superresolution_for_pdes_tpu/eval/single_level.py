"""Single-level (20 -> 40) evaluation: ML vs interpolation baselines.

Batched re-design of the reference's per-sample loops
(``/root/reference/src/compare_methods.py:19-216``,
``compare_test_cases.py:81-247``, ``visualization.py:97-151``): the whole test
set is one model batch; the bilinear/bicubic baselines interpolate the
physical-space coarse solution; ML predictions are denormalized with the
*evaluated dataset's own* statistics (the reference constructs a
``PDEDataset`` per test set, ``compare_test_cases.py:86`` — self-normalization
semantics preserved).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from superresolution_for_pdes_tpu.data.normalization import NormStats, make_model_inputs
from superresolution_for_pdes_tpu.eval.metrics import compute_metrics
from superresolution_for_pdes_tpu.ops.resize import resize_align_corners


def predict_dataset(
    model, variables, data: Dict, stats: Optional[NormStats] = None,
    normalization: str = "dataset",
    symmetrize: bool = False,
) -> jnp.ndarray:
    """Denormalized ML predictions for every sample of a dataset dict.

    ``normalization="per_sample"`` self-normalizes each sample from its own
    coarse input / forcing / coefficient (for models trained with
    ``TrainConfig.normalization='per_sample'``). ``symmetrize`` averages the
    model over the square's 8 symmetries (honest test-time ensembling; see
    ``cascade.upscale._dihedral_apply``).
    """
    if normalization == "per_sample":
        from superresolution_for_pdes_tpu.data.normalization import per_sample_stats

        stats = per_sample_stats(data["u_coarse"], data["f_fine"], data["theta_fine"])
    elif stats is None:
        stats = NormStats.from_dataset(data)
    x = make_model_inputs(data["u_coarse"], data["f_fine"], data["theta_fine"], stats,
                          scale_channels=getattr(model, "in_channels", 3) > 3)
    if symmetrize:
        from superresolution_for_pdes_tpu.cascade.upscale import _dihedral_apply

        pred = _dihedral_apply(model, variables, x)
    else:
        pred = model.apply(variables, x, train=False)
    return stats.denormalize_u(pred[..., 0])


def evaluate_dataset(
    model,
    variables,
    data: Dict,
    label: str = "test",
    save_dir: Optional[Path] = None,
    stats: Optional[NormStats] = None,
    n_plot: int = 3,
    space: str = "physical",
    normalization: str = "dataset",
    symmetrize: bool = False,
) -> Dict:
    """Per-sample + summary metrics for ML vs bilinear vs bicubic at 40^2.

    ``space="physical"`` (default) compares denormalized fields like
    ``compare_methods.py``/``compare_test_cases.py``; ``space="normalized"``
    reproduces the reference visualizer's quirk of scoring in normalized
    space without denormalizing (``visualization.py:117-128``).
    """
    if stats is None:
        stats = NormStats.from_dataset(data)
    target = data["u_fine"]
    fine_shape = tuple(int(s) for s in target.shape[-2:])

    if hasattr(model, "predict"):  # a RegimeRouter (or any expert ensemble)
        ml = model.predict(data, stats, symmetrize=symmetrize)
    else:
        ml = predict_dataset(model, variables, data, stats,
                             normalization=normalization, symmetrize=symmetrize)
    bilinear = resize_align_corners(data["u_coarse"], fine_shape, "bilinear")
    bicubic = resize_align_corners(data["u_coarse"], fine_shape, "bicubic")
    if space == "normalized":
        target = stats.normalize_u(target)
        ml = stats.normalize_u(ml)
        bilinear = stats.normalize_u(bilinear)
        bicubic = stats.normalize_u(bicubic)
    elif space != "physical":
        raise ValueError(f"unknown metric space: {space!r}")

    per_sample = {
        "ml": {k: np.asarray(v) for k, v in compute_metrics(ml, target).items()},
        "bilinear": {k: np.asarray(v) for k, v in compute_metrics(bilinear, target).items()},
        "bicubic": {k: np.asarray(v) for k, v in compute_metrics(bicubic, target).items()},
    }
    summary = {
        method: {k: float(v.mean()) for k, v in ms.items()}
        for method, ms in per_sample.items()
    }
    result = {
        "label": label,
        "n_samples": int(target.shape[0]),
        "k1": np.asarray(data["k1"]).tolist(),
        "k2": np.asarray(data["k2"]).tolist(),
        "per_sample": per_sample,
        "summary": summary,
    }
    if save_dir is not None:
        save_dir = Path(save_dir)
        save_dir.mkdir(parents=True, exist_ok=True)
        _write_artifacts(result, data, ml, bilinear, save_dir, label, n_plot)
    return result


def _write_artifacts(result, data, ml, bilinear, save_dir: Path, label: str, n_plot: int):
    import json

    serializable = {
        **{k: result[k] for k in ("label", "n_samples", "k1", "k2", "summary")},
        "per_sample": {
            m: {k: v.tolist() for k, v in ms.items()} for m, ms in result["per_sample"].items()
        },
    }
    (save_dir / f"{label}_metrics.json").write_text(json.dumps(serializable, indent=2))

    from superresolution_for_pdes_tpu.eval.plots import plot_sample_comparison

    for idx in range(min(n_plot, int(data["u_fine"].shape[0]))):
        plot_sample_comparison(
            coarse=np.asarray(data["u_coarse"][idx]),
            truth=np.asarray(data["u_fine"][idx]),
            ml=np.asarray(ml[idx]),
            bilinear=np.asarray(bilinear[idx]),
            theta=np.asarray(data["theta_fine"][idx]),
            forcing=np.asarray(data["f_fine"][idx]),
            k1=float(np.asarray(data["k1"][idx])),
            k2=float(np.asarray(data["k2"][idx])),
            out_path=save_dir / f"{label}_sample_{idx + 1}.png",
        )
