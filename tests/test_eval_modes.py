"""Cascade stats modes and evaluation metric spaces."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from superresolution_for_pdes_tpu.cascade import ml_multi_level_upscale, solve_multi_resolution
from superresolution_for_pdes_tpu.data.generate import generate_test_dataset
from superresolution_for_pdes_tpu.data.normalization import NormStats
from superresolution_for_pdes_tpu.eval.single_level import evaluate_dataset
from superresolution_for_pdes_tpu.models import AttentionUNet, init_unet


@pytest.fixture(scope="module")
def tiny():
    return init_unet(
        jax.random.key(0),
        AttentionUNet(enc_features=(8, 16, 32), bridge_features=32, head_features=(4, 4)),
    )


def test_stats_modes_differ_and_train_mode_requires_stats(tiny):
    model, variables = tiny
    scene = solve_multi_resolution(jax.random.key(2), resolutions=(80,))
    a = ml_multi_level_upscale(model, variables, scene, 80, stats_mode="oracle")
    b = ml_multi_level_upscale(model, variables, scene, 80, stats_mode="scene")
    assert a.shape == b.shape == (80, 80)
    assert np.any(np.asarray(a) != np.asarray(b))
    with pytest.raises(ValueError, match="train_stats"):
        ml_multi_level_upscale(model, variables, scene, 80, stats_mode="train")
    stats = NormStats.from_fields(scene["u"][40], scene["f"][80], scene["theta"][80])
    c = ml_multi_level_upscale(model, variables, scene, 80, stats_mode="train", train_stats=stats)
    assert np.isfinite(np.asarray(c)).all()
    with pytest.raises(ValueError, match="stats_mode"):
        ml_multi_level_upscale(model, variables, scene, 80, stats_mode="bogus")


def test_normalized_vs_physical_space(tiny):
    model, variables = tiny
    ds = generate_test_dataset(jax.random.key(1), 3, (0.5, 5.0))
    phys = evaluate_dataset(model, variables, ds, space="physical")
    norm = evaluate_dataset(model, variables, ds, space="normalized")
    stats = NormStats.from_dataset(ds)
    # normalized-space MAE == physical MAE / u_std (pure affine rescale)
    ratio = phys["summary"]["bilinear"]["mae"] / norm["summary"]["bilinear"]["mae"]
    assert ratio == pytest.approx(float(stats.u_std), rel=1e-4)
    with pytest.raises(ValueError, match="metric space"):
        evaluate_dataset(model, variables, ds, space="log")


def test_single_level_symmetrize_option(tiny):
    """evaluate_dataset(symmetrize=True): finite, differs from the plain pass.

    Note (round-2 finding): symmetrization HELPS the cascade (phase-rich tile
    windows) but can hurt standard-sample evals, whose forcing sines are
    phase-locked at zero — flips map them off the training manifold. It is
    therefore an option, not a default, on the single-level path."""
    model, variables = tiny
    ds = generate_test_dataset(jax.random.key(4), 3, (1.0, 5.0))
    plain = evaluate_dataset(model, variables, ds)
    sym = evaluate_dataset(model, variables, ds, symmetrize=True)
    assert np.isfinite(sym["summary"]["ml"]["mae"])
    assert sym["summary"]["ml"]["mae"] != plain["summary"]["ml"]["mae"]
    # baselines are model-free and unchanged
    assert sym["summary"]["bilinear"]["mae"] == plain["summary"]["bilinear"]["mae"]
