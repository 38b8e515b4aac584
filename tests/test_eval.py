"""Evaluation harnesses: metrics, single-level, grid, sweep, statistical."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from superresolution_for_pdes_tpu.data.generate import generate_test_dataset
from superresolution_for_pdes_tpu.eval import (
    compute_metrics,
    evaluate_dataset,
    evaluate_out_of_sample,
    run_generalization_grid,
    run_resolution_sweep,
    run_statistical_benchmark,
)
from superresolution_for_pdes_tpu.models import AttentionUNet, init_unet


@pytest.fixture(scope="module")
def tiny_model():
    return init_unet(
        jax.random.key(0),
        AttentionUNet(enc_features=(8, 16, 32), bridge_features=64, head_features=(8, 4)),
    )


def test_compute_metrics(rng):
    pred = jnp.asarray(rng.standard_normal((4, 10, 10)))
    target = jnp.asarray(rng.standard_normal((4, 10, 10)))
    m = compute_metrics(pred, target)
    diff = np.asarray(pred) - np.asarray(target)
    np.testing.assert_allclose(np.asarray(m["mae"]), np.abs(diff).mean(axis=(1, 2)), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(m["rmse"]), np.sqrt((diff**2).mean(axis=(1, 2))), rtol=1e-12
    )
    np.testing.assert_allclose(np.asarray(m["max_error"]), np.abs(diff).max(axis=(1, 2)), rtol=1e-12)


def test_test_dataset_varying_theta_resolved(reference_solve):
    ds = generate_test_dataset(
        jax.random.key(3), 2, (1.0, 6.0), constant_theta=False, dtype=jnp.float64
    )
    theta = np.asarray(ds["theta_fine"][0])
    assert theta.min() >= 0.5 and theta.max() <= 2.0
    np.testing.assert_array_equal(np.asarray(ds["theta_coarse"][0]), theta[::2, ::2])
    ref = reference_solve(np.asarray(ds["f_fine"][0]), theta)
    assert np.max(np.abs(np.asarray(ds["u_fine"][0]) - ref)) <= 1e-6


def test_evaluate_dataset_and_artifacts(tiny_model, tmp_path):
    model, variables = tiny_model
    ds = generate_test_dataset(jax.random.key(1), 4, (0.5, 5.0))
    result = evaluate_dataset(model, variables, ds, label="t", save_dir=tmp_path, n_plot=1)
    assert set(result["summary"]) == {"ml", "bilinear", "bicubic"}
    assert len(result["per_sample"]["ml"]["mae"]) == 4
    assert (tmp_path / "t_metrics.json").exists()
    assert (tmp_path / "t_sample_1.png").exists()
    loaded = json.loads((tmp_path / "t_metrics.json").read_text())
    assert loaded["summary"]["bilinear"]["mae"] == pytest.approx(
        result["summary"]["bilinear"]["mae"]
    )


def test_out_of_sample_harness(tiny_model, tmp_path):
    model, variables = tiny_model
    result = evaluate_out_of_sample(
        model, variables, jax.random.key(2), n_samples=3, save_dir=tmp_path, n_plot=1
    )
    ks = np.asarray(result["k1"])
    assert ((ks >= 5.0) & (ks <= 8.0)).all()
    assert (tmp_path / "average_metrics.json").exists()
    assert (tmp_path / "cross_section_1.png").exists()


def test_generalization_grid(tiny_model, tmp_path):
    model, variables = tiny_model
    results = run_generalization_grid(
        model, variables, jax.random.key(0), n_samples=3, save_dir=tmp_path, n_plot=0
    )
    assert set(results) == {
        "training_like",
        "in_sample_const_theta",
        "in_sample_varying_theta",
        "out_of_sample_const_theta",
        "out_of_sample_varying_theta",
    }
    assert (tmp_path / "comprehensive_test_results.json").exists()
    assert (tmp_path / "comparison_mae.png").exists()
    # the varying-theta ml_rmse is a real number, not a copy of bilinear
    # (the reference's latent bug at compare_test_cases.py:466)
    r = results["out_of_sample_varying_theta"]["summary"]
    assert r["ml"]["rmse"] != r["bilinear"]["rmse"]


def test_resolution_sweep(tiny_model, tmp_path):
    model, variables = tiny_model
    result = run_resolution_sweep(
        model, variables, jax.random.key(0), resolutions=(80, 160), save_dir=tmp_path
    )
    m = result["metrics"]
    assert set(m) == {
        "ml_multi_level", "bilinear_direct", "bicubic_direct",
        "bilinear_multi_level", "bicubic_multi_level",
    }
    assert (tmp_path / "resolution_metrics.json").exists()
    assert (tmp_path / "resolution_comparison_metrics.png").exists()
    # untrained tiny model: just finiteness
    assert np.isfinite(m["ml_multi_level"][160]["mae"])


def test_statistical_benchmark(tiny_model, tmp_path):
    model, variables = tiny_model
    result = run_statistical_benchmark(
        model, variables, jax.random.key(0), n_examples=2, resolutions=(80,),
        save_dir=tmp_path,
    )
    a = result["aggregate"][80]
    assert np.isfinite(a["ml_mae_mean"]) and a["ml_time_mean"] > 0
    assert (tmp_path / "summary.txt").exists()
    assert (tmp_path / "statistical_results.csv").exists()
    assert (tmp_path / "mae_box_80x80.png").exists()


def test_statistical_benchmark_theta_range(tiny_model):
    """--theta_range 1 1 runs the constant-theta regime end to end (the
    router-in-cascade sanity protocol, round-4 VERDICT item 9)."""
    model, variables = tiny_model
    result = run_statistical_benchmark(
        model, variables, jax.random.key(0), n_examples=2, resolutions=(80,),
        theta_range=(1.0, 1.0),
    )
    a = result["aggregate"][80]
    assert np.isfinite(a["ml_mae_mean"])


def test_statistical_benchmark_deep_only_resolutions(tiny_model):
    """Deep-only --resolutions (e.g. 160 alone) must still cascade through the
    unreported intermediate levels: the harness solves the full doubling
    ladder internally and reports only what was asked (round-4 regression —
    the AOT warmup used to KeyError on the missing 80 entry)."""
    model, variables = tiny_model
    result = run_statistical_benchmark(
        model, variables, jax.random.key(0), n_examples=2, resolutions=(160,),
    )
    assert set(result["aggregate"]) == {160}
    assert np.isfinite(result["aggregate"][160]["ml_mae_mean"])
