"""Shared matplotlib plotting (Agg backend, best-effort).

Plot vocabularies mirror the reference's artifacts: per-sample comparison
grids with error panels (``compare_methods.py:19-120``), error-vs-resolution
log-log charts (``resolution_comparison.py:231-285``), error distributions
(``resolution_comparison.py:340-369``), grouped metric bars
(``compare_test_cases.py:415-558``), cross-sections
(``test_out_of_sample.py:99-119``) and statistical box/timing plots
(``resolution_comparison_statistical.py:378-499``).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Sequence

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_sample_comparison(coarse, truth, ml, bilinear, theta, forcing, k1, k2, out_path: Path):
    plt = _plt()
    fig, axes = plt.subplots(3, 3, figsize=(15, 13))
    fig.suptitle(f"k1={k1:.2f}, k2={k2:.2f}")
    vmin = min(truth.min(), ml.min(), bilinear.min())
    vmax = max(truth.max(), ml.max(), bilinear.max())
    panels = [
        ("Coarse input", coarse, None),
        ("Ground truth", truth, (vmin, vmax)),
        ("Forcing f", forcing, None),
        ("ML prediction", ml, (vmin, vmax)),
        ("Bilinear", bilinear, (vmin, vmax)),
        ("theta", theta, None),
        ("ML |error|", np.abs(ml - truth), None),
        ("Bilinear |error|", np.abs(bilinear - truth), None),
        ("Error diff (ML - BL)", np.abs(ml - truth) - np.abs(bilinear - truth), None),
    ]
    for ax, (title, field, clim) in zip(axes.ravel(), panels):
        im = ax.imshow(field, cmap="RdBu_r" if "diff" in title else "viridis")
        if clim:
            im.set_clim(*clim)
        ax.set_title(title)
        ax.set_xticks([])
        ax.set_yticks([])
        fig.colorbar(im, ax=ax, fraction=0.046)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)


def plot_resolution_metrics(resolutions: Sequence[int], metrics: Dict[str, Dict[int, float]], out_path: Path):
    """Log-log error-vs-resolution chart (reference resolution_comparison.py:231-285)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(10, 7))
    for method, by_res in metrics.items():
        ys = [by_res[r] for r in resolutions]
        ax.plot(resolutions, ys, "o-", label=method)
    ax.set_xscale("log", base=2)
    ax.set_yscale("log")
    ax.set_xticks(list(resolutions), [f"{r}x{r}" for r in resolutions])
    ax.set_xlabel("Resolution")
    ax.set_ylabel("MAE")
    ax.grid(True, alpha=0.3)
    ax.legend()
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)


def plot_error_distribution(errors: Dict[str, np.ndarray], title: str, out_path: Path):
    """Error-distribution comparison (KDE when seaborn is present, else hist)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(10, 7))
    try:
        import seaborn as sns

        for label, err in errors.items():
            sns.kdeplot(data=err.ravel(), label=label, fill=True, alpha=0.5, ax=ax)
    except Exception:
        for label, err in errors.items():
            ax.hist(err.ravel(), bins=100, alpha=0.5, label=label, density=True)
    ax.set_xlabel("Absolute error")
    ax.set_ylabel("Density")
    ax.set_title(title)
    ax.grid(True, alpha=0.3)
    ax.legend()
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)


def plot_grouped_bars(group_labels: Sequence[str], series: Dict[str, Sequence[float]],
                      ylabel: str, out_path: Path, log: bool = False):
    """Grouped metric bars, linear + log variants (compare_test_cases.py:415-558)."""
    plt = _plt()
    x = np.arange(len(group_labels))
    width = 0.8 / max(len(series), 1)
    fig, ax = plt.subplots(figsize=(max(8, 2 * len(group_labels)), 6))
    for i, (name, values) in enumerate(series.items()):
        ax.bar(x + (i - (len(series) - 1) / 2) * width, values, width, label=name)
    ax.set_xticks(x, group_labels, rotation=20, ha="right")
    ax.set_ylabel(ylabel)
    if log:
        ax.set_yscale("log")
    ax.grid(True, axis="y", alpha=0.3)
    ax.legend()
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)


def plot_cross_section(fields: Dict[str, np.ndarray], row: int, title: str, out_path: Path):
    """Mid-row cross-section overlay (test_out_of_sample.py:99-119)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(10, 6))
    for label, field in fields.items():
        x = np.linspace(0, 1, field.shape[-1])
        ax.plot(x, field[row], label=label)
    ax.set_xlabel("x")
    ax.set_ylabel("u")
    ax.set_title(title)
    ax.grid(True, alpha=0.3)
    ax.legend()
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)


def plot_box(series: Dict[str, np.ndarray], ylabel: str, out_path: Path, log: bool = False):
    plt = _plt()
    fig, ax = plt.subplots(figsize=(8, 6))
    ax.boxplot(list(series.values()), tick_labels=list(series.keys()))
    ax.set_ylabel(ylabel)
    if log:
        ax.set_yscale("log")
    ax.grid(True, axis="y", alpha=0.3)
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)


def plot_mean_std_bands(resolutions: Sequence[int],
                        series: Dict[str, tuple],
                        ylabel: str, out_path: Path, log: bool = True):
    """Mean +/- std bands per resolution (reference
    ``resolution_comparison_statistical.py:299-340``): one line per method
    with a shaded +/-1 sigma band over the N independent examples."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(10, 7))
    for name, (mean, std) in series.items():
        mean = np.asarray(mean, dtype=float)
        std = np.asarray(std, dtype=float)
        ax.plot(resolutions, mean, "o-", label=name)
        ax.fill_between(resolutions, np.maximum(mean - std, 1e-30), mean + std, alpha=0.25)
    ax.set_xscale("log", base=2)
    if log:
        ax.set_yscale("log")
    ax.set_xticks(list(resolutions), [f"{r}x{r}" for r in resolutions])
    ax.set_xlabel("Resolution")
    ax.set_ylabel(ylabel)
    ax.grid(True, alpha=0.3)
    ax.legend()
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)


def plot_scatter_vs_k(k_sum: np.ndarray, series: Dict[str, np.ndarray],
                      ylabel: str, out_path: Path):
    """Error vs wave-number-sum scatter (reference
    ``resolution_comparison_statistical.py:341-376``): MAE of each method
    against k1+k2 of the example, one marker per example."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(10, 7))
    for name, values in series.items():
        ax.scatter(k_sum, values, label=name, alpha=0.8)
    ax.set_yscale("log")
    ax.set_xlabel("k1 + k2")
    ax.set_ylabel(ylabel)
    ax.grid(True, alpha=0.3)
    ax.legend()
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)


def plot_computation_times(resolutions: Sequence[int],
                           times: Dict[str, Sequence[float]], out_path: Path):
    """Computation-time comparison per resolution (reference
    ``resolution_comparison_statistical.py:378-440``,
    ``computation_times.png``)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(10, 7))
    for name, values in times.items():
        ax.plot(resolutions, np.asarray(values, dtype=float) * 1e3, "o-", label=name)
    ax.set_xscale("log", base=2)
    ax.set_yscale("log")
    ax.set_xticks(list(resolutions), [f"{r}x{r}" for r in resolutions])
    ax.set_xlabel("Resolution")
    ax.set_ylabel("Wall-clock time (ms)")
    ax.grid(True, alpha=0.3)
    ax.legend()
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)


def plot_dataset_samples(dataset, n_samples: int = 20, seed: int = 0,
                         out_dir: str | Path = "results/dataset_samples") -> Path:
    """Visual datagen check: n random samples as (coarse u, fine u, theta, f)
    rows (reference ``enhanced_data_generation.py:193-244``,
    ``results/random_samples.png``)."""
    plt = _plt()
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    n_total = int(np.asarray(dataset["u_fine"]).shape[0])
    n_samples = min(n_samples, n_total)
    rng = np.random.default_rng(seed)
    indices = rng.choice(n_total, size=n_samples, replace=False)
    is_sub = np.asarray(dataset.get("is_subdomain", np.zeros(n_total, bool)))

    fig, axes = plt.subplots(n_samples, 4, figsize=(16, 3 * n_samples), squeeze=False)
    for i, idx in enumerate(indices):
        panels = [
            (f"Coarse u {idx}" + (" (subdomain)" if is_sub[idx] else ""),
             dataset["u_coarse"][idx]),
            (f"Fine u {idx}", dataset["u_fine"][idx]),
            (f"Theta {idx}", dataset["theta_fine"][idx]),
            (f"Forcing {idx}", dataset["f_fine"][idx]),
        ]
        for ax, (title, field) in zip(axes[i], panels):
            im = ax.imshow(np.asarray(field))
            ax.set_title(title)
            ax.set_xticks([])
            ax.set_yticks([])
            fig.colorbar(im, ax=ax, fraction=0.046)
    fig.tight_layout()
    path = out_dir / "random_samples.png"
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return path
