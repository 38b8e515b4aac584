"""Overlapping tiling + feathered blending."""

import numpy as np
import jax
import jax.numpy as jnp

from superresolution_for_pdes_tpu.cascade.tiles import (
    split_tiles_overlapping,
    stitch_tiles_overlapping,
)
from superresolution_for_pdes_tpu.cascade import ml_multi_level_upscale, solve_multi_resolution
from superresolution_for_pdes_tpu.models import AttentionUNet, init_unet


def test_split_overlapping_windows(rng):
    field = jnp.asarray(rng.standard_normal((80, 80)))
    tiles = split_tiles_overlapping(field, 40, 20)
    assert tiles.shape == (9, 40, 40)
    np.testing.assert_array_equal(np.asarray(tiles[0]), np.asarray(field)[:40, :40])
    np.testing.assert_array_equal(np.asarray(tiles[4]), np.asarray(field)[20:60, 20:60])
    np.testing.assert_array_equal(np.asarray(tiles[8]), np.asarray(field)[40:, 40:])


def test_overlap_roundtrip_is_exact_for_consistent_tiles(rng):
    """Stitching windows extracted from one field reproduces that field
    exactly (the blend is a weighted average of identical values)."""
    field = jnp.asarray(rng.standard_normal((160, 160)), jnp.float64)
    tiles = split_tiles_overlapping(field, 40, 20)
    out = stitch_tiles_overlapping(tiles, 160, 20)
    np.testing.assert_allclose(np.asarray(out), np.asarray(field), rtol=1e-12, atol=1e-12)


def test_overlap_blends_disagreeing_tiles():
    """Where overlapping tiles disagree, the result is a feathered average
    strictly between the two values."""
    tiles = split_tiles_overlapping(jnp.zeros((60, 60)), 40, 20)  # 2x2 windows
    tiles = tiles.at[0].set(0.0).at[1].set(0.0).at[2].set(1.0).at[3].set(1.0)
    out = np.asarray(stitch_tiles_overlapping(tiles, 60, 20))
    assert np.allclose(out[:20], 0.0)
    assert np.allclose(out[40:], 1.0)
    mid = out[20:40]
    assert (mid > 0.0).all() and (mid < 1.0).all()
    assert (np.diff(out[:, 0]) >= -1e-6).all()  # monotone feather


def test_cascade_overlap_mode_runs(rng):
    model, variables = init_unet(
        jax.random.key(0),
        AttentionUNet(enc_features=(8, 16, 32), bridge_features=64, head_features=(8, 4)),
    )
    scene = solve_multi_resolution(jax.random.key(1), resolutions=(80, 160))
    out = ml_multi_level_upscale(model, variables, scene, 160, overlap=True)
    assert out.shape == (160, 160)
    assert np.isfinite(np.asarray(out)).all()


def test_cascade_per_level_overlap_schedule():
    """A per-level overlap tuple applies each level's own mode: the mixed
    schedule's level-1 output matches the all-overlap cascade at 80 and its
    level-2 step matches the no-overlap cascade fed the same 80 input."""
    from superresolution_for_pdes_tpu.cascade.upscale import ml_cascade

    model, variables = init_unet(
        jax.random.key(0),
        AttentionUNet(enc_features=(8, 16, 32), bridge_features=64, head_features=(8, 4)),
    )
    scene = solve_multi_resolution(jax.random.key(1), resolutions=(80, 160))
    mixed = ml_cascade(model, variables, scene, 160, stats_mode="tile",
                       overlap=(True, False))
    ovl = ml_cascade(model, variables, scene, 160, stats_mode="tile", overlap=True)
    np.testing.assert_allclose(np.asarray(mixed[80]), np.asarray(ovl[80]),
                               rtol=0, atol=0)
    assert np.abs(np.asarray(mixed[160]) - np.asarray(ovl[160])).max() > 0
    # level 2 without overlap, fed the mixed cascade's own 80 field
    flat = ml_cascade(model, variables,
                      {"u": {80: mixed[80]}, "f": {160: scene["f"][160]},
                       "theta": {160: scene["theta"][160]}},
                      160, stats_mode="tile", start_resolution=80, overlap=False)
    np.testing.assert_allclose(np.asarray(mixed[160]), np.asarray(flat[160]),
                               rtol=0, atol=0)
