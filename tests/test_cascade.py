"""Cascade: tile/stitch roundtrips, multi-res ground truth, ML multi-level upscale."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from superresolution_for_pdes_tpu.cascade import (
    interpolation_upscale,
    ml_multi_level_upscale,
    multi_level_interpolation_upscale,
    solve_multi_resolution,
    split_tiles,
    stitch_tiles,
)
from superresolution_for_pdes_tpu.models import AttentionUNet, init_unet
from superresolution_for_pdes_tpu.parallel import data_mesh


def test_tile_roundtrip(rng):
    field = jnp.asarray(rng.standard_normal((3, 160, 160)))
    tiles = split_tiles(field, 40)
    assert tiles.shape == (3, 16, 40, 40)
    np.testing.assert_array_equal(np.asarray(stitch_tiles(tiles)), np.asarray(field))


def test_tile_order_matches_reference_loops(rng):
    """Row-major [i][j] order like reference resolution_comparison.py:123-139."""
    field = rng.standard_normal((80, 80))
    tiles = np.asarray(split_tiles(jnp.asarray(field), 20))
    k = 0
    for i in range(4):
        for j in range(4):
            np.testing.assert_array_equal(
                tiles[k], field[i * 20 : (i + 1) * 20, j * 20 : (j + 1) * 20]
            )
            k += 1


@pytest.fixture(scope="module")
def scene():
    return solve_multi_resolution(
        jax.random.key(0), resolutions=(80, 160), dtype=jnp.float64, refine_iters=0
    )


def test_multires_ground_truth(scene, reference_solve):
    assert set(scene["u"]) == {40, 80, 160}
    # each level solves the reference system on the strided fields
    for res in (40, 80):
        ref = reference_solve(
            np.asarray(scene["f"][res]), np.asarray(scene["theta"][res])
        )
        assert np.max(np.abs(np.asarray(scene["u"][res]) - ref)) <= 1e-6
    # strided downsampling consistency
    np.testing.assert_array_equal(
        np.asarray(scene["f"][80]), np.asarray(scene["f"][160])[::2, ::2]
    )
    assert 10.0 <= scene["k1"] <= 11.0


def test_ml_cascade_shapes_and_finiteness(scene):
    model, variables = init_unet(
        jax.random.key(0),
        AttentionUNet(enc_features=(8, 16, 32), bridge_features=64, head_features=(8, 4)),
    )
    scene32 = {
        "u": {k: v.astype(jnp.float32) for k, v in scene["u"].items()},
        "f": {k: v.astype(jnp.float32) for k, v in scene["f"].items()},
        "theta": {k: v.astype(jnp.float32) for k, v in scene["theta"].items()},
    }
    out = ml_multi_level_upscale(model, variables, scene32, 160)
    assert out.shape == (160, 160)
    assert np.isfinite(np.asarray(out)).all()
    # scene (honest) stats mode also works
    out2 = ml_multi_level_upscale(model, variables, scene32, 80, stats_mode="scene")
    assert out2.shape == (80, 80)

    # sharded over the tile axis on the 8-device mesh
    mesh = data_mesh(axis_name="tile")
    sharding = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("tile"))
    out3 = ml_multi_level_upscale(model, variables, scene32, 160, tile_sharding=sharding)
    np.testing.assert_allclose(np.asarray(out3), np.asarray(out), rtol=2e-4, atol=1e-6)


def test_interpolation_baselines_match_torch(scene):
    import torch
    import torch.nn.functional as F

    u40 = np.asarray(scene["u"][40])
    t = torch.from_numpy(u40)[None, None]
    for method, mode in (("bilinear", "bilinear"), ("bicubic", "bicubic")):
        direct = np.asarray(interpolation_upscale(jnp.asarray(u40), 160, method))
        ref = F.interpolate(t, size=(160, 160), mode=mode, align_corners=True)[0, 0].numpy()
        np.testing.assert_allclose(direct, ref, rtol=1e-8, atol=1e-10)
    stepped = np.asarray(multi_level_interpolation_upscale(jnp.asarray(u40), 160))
    ref_stepped = F.interpolate(
        F.interpolate(t, scale_factor=2, mode="bilinear", align_corners=True),
        scale_factor=2, mode="bilinear", align_corners=True,
    )[0, 0].numpy()
    np.testing.assert_allclose(stepped, ref_stepped, rtol=1e-8, atol=1e-10)


def test_fused_batched_cascade_matches_per_target(scene):
    """ml_cascade: one program for all scenes/levels; intermediates equal the
    per-target results; batched scenes equal per-scene runs; scale-aware
    (5-channel) models get log-scale input channels automatically."""
    from superresolution_for_pdes_tpu.cascade.multires import solve_multi_resolution_batch
    from superresolution_for_pdes_tpu.cascade.upscale import ml_cascade

    model, variables = init_unet(
        jax.random.key(0),
        AttentionUNet(enc_features=(8, 16, 32), bridge_features=64, head_features=(8, 4)),
    )
    scenes = solve_multi_resolution_batch(jax.random.key(3), 2, resolutions=(80, 160))
    outs = ml_cascade(model, variables, scenes, 160, stats_mode="scene")
    assert outs[80].shape == (2, 80, 80) and outs[160].shape == (2, 160, 160)
    for i in range(2):
        single = {
            fld: {r: scenes[fld][r][i] for r in scenes[fld]}
            for fld in ("u", "f", "theta")
        }
        per_scene = ml_cascade(model, variables, single, 160, stats_mode="scene")
        np.testing.assert_allclose(
            np.asarray(outs[160][i]), np.asarray(per_scene[160]), rtol=1e-5, atol=1e-7
        )
        # the 80 intermediate equals a cascade targeted at 80
        np.testing.assert_allclose(
            np.asarray(outs[80][i]),
            np.asarray(ml_multi_level_upscale(model, variables, single, 80, stats_mode="scene")),
            rtol=1e-5, atol=1e-7,
        )

    # oracle + tile modes on batched scenes
    for mode in ("oracle", "tile"):
        o = ml_cascade(model, variables, scenes, 160, stats_mode=mode)
        assert np.isfinite(np.asarray(o[160])).all()

    # scale-aware model: 5 input channels, per-tile stats
    model5, variables5 = init_unet(
        jax.random.key(0),
        AttentionUNet(in_channels=5, enc_features=(8, 16, 32), bridge_features=64,
                      head_features=(8, 4)),
    )
    o5 = ml_cascade(model5, variables5, scenes, 160, stats_mode="tile")
    assert np.isfinite(np.asarray(o5[160])).all()


def test_scale_channels_inputs():
    """Scale channels are log(std)/10 constants broadcast over the tile."""
    from superresolution_for_pdes_tpu.data.normalization import (
        make_model_inputs,
        per_sample_stats,
    )

    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((3, 20, 20)) * 1e-4)
    f = jnp.asarray(rng.standard_normal((3, 40, 40)))
    theta = jnp.ones((3, 40, 40))
    stats = per_sample_stats(u, f, theta)
    x = make_model_inputs(u, f, theta, stats, scale_channels=True)
    assert x.shape == (3, 40, 40, 5)
    su = np.asarray(stats.u_std)[:, 0, 0]
    np.testing.assert_allclose(
        np.asarray(x[..., 3])[:, 0, 0], np.log(su + 1e-30) / 10.0, rtol=1e-5
    )
    # constant across the grid (up to f64 rounding in the x64 test mode)
    assert float(jnp.std(x[..., 3], axis=(1, 2)).max()) < 1e-12


def test_dihedral_symmetrize_preserves_symmetry(scene):
    """Symmetrized cascade output of a 90-degree-rotated scene equals the
    rotated output of the original scene (the orbit average is equivariant
    by construction)."""
    from superresolution_for_pdes_tpu.cascade.upscale import ml_cascade

    model, variables = init_unet(
        jax.random.key(0),
        AttentionUNet(enc_features=(8, 16, 32), bridge_features=64, head_features=(8, 4)),
    )
    scene32 = {
        fld: {r: jnp.asarray(v, jnp.float32) for r, v in scene[fld].items()}
        for fld in ("u", "f", "theta")
    }
    out = ml_cascade(model, variables, scene32, 80, stats_mode="tile", symmetrize=True)[80]
    rotated = {
        fld: {r: jnp.rot90(v) for r, v in scene32[fld].items()}
        for fld in ("u", "f", "theta")
    }
    out_rot = ml_cascade(model, variables, rotated, 80, stats_mode="tile", symmetrize=True)[80]
    np.testing.assert_allclose(
        np.asarray(out_rot), np.asarray(jnp.rot90(out)), rtol=1e-4, atol=1e-7
    )
    # and differs from the single-orientation prediction
    plain = ml_cascade(model, variables, scene32, 80, stats_mode="tile")[80]
    assert np.abs(np.asarray(plain) - np.asarray(out)).max() > 0


def test_per_level_expert_variables(scene):
    """ml_cascade accepts a tuple of per-level variables (level specialists);
    level 1 with expert A + level 2 with expert B differs from all-A and the
    first level matches all-A exactly."""
    from superresolution_for_pdes_tpu.cascade.upscale import ml_cascade

    arch = dict(enc_features=(8, 16, 32), bridge_features=64, head_features=(8, 4))
    model, va = init_unet(jax.random.key(0), AttentionUNet(**arch))
    _, vb = init_unet(jax.random.key(1), AttentionUNet(**arch))
    scene32 = {
        fld: {r: jnp.asarray(v, jnp.float32) for r, v in scene[fld].items()}
        for fld in ("u", "f", "theta")
    }
    all_a = ml_cascade(model, va, scene32, 160, stats_mode="tile")
    mixed = ml_cascade(model, (va, vb), scene32, 160, stats_mode="tile")
    np.testing.assert_allclose(np.asarray(mixed[80]), np.asarray(all_a[80]), rtol=1e-6)
    assert np.abs(np.asarray(mixed[160]) - np.asarray(all_a[160])).max() > 0


def test_stepwise_cascade_matches_fused(scene):
    """ml_cascade_stepwise returns the same fields as the fused program plus
    per-level wall times (one pass, no per-target re-runs)."""
    from superresolution_for_pdes_tpu.cascade.multires import solve_multi_resolution_batch
    from superresolution_for_pdes_tpu.cascade.upscale import ml_cascade, ml_cascade_stepwise

    model, variables = init_unet(
        jax.random.key(0),
        AttentionUNet(enc_features=(8, 16, 32), bridge_features=64, head_features=(8, 4)),
    )
    scenes = solve_multi_resolution_batch(jax.random.key(3), 2, resolutions=(80, 160))
    fused = ml_cascade(model, variables, scenes, 160, stats_mode="tile")
    stepped, times = ml_cascade_stepwise(model, variables, scenes, 160, stats_mode="tile")
    assert set(times) == {80, 160} and all(t > 0 for t in times.values())
    for res in (80, 160):
        np.testing.assert_allclose(
            np.asarray(stepped[res]), np.asarray(fused[res]), rtol=1e-5, atol=1e-7
        )
    # scene mode (stats from the current field) agrees too
    fused_s = ml_cascade(model, variables, scenes, 160, stats_mode="scene")
    stepped_s, _ = ml_cascade_stepwise(model, variables, scenes, 160, stats_mode="scene")
    np.testing.assert_allclose(
        np.asarray(stepped_s[160]), np.asarray(fused_s[160]), rtol=1e-5, atol=1e-7
    )


def test_refine_cycles_improve_accuracy(scene):
    """Physics refinement (honest V-cycles of the known PDE on the stitched
    field) strictly improves cascade accuracy against the exact solution."""
    from superresolution_for_pdes_tpu.cascade.upscale import ml_cascade

    model, variables = init_unet(
        jax.random.key(0),
        AttentionUNet(enc_features=(8, 16, 32), bridge_features=64, head_features=(8, 4)),
    )
    scene32 = {
        fld: {r: jnp.asarray(v, jnp.float32) for r, v in scene[fld].items()}
        for fld in ("u", "f", "theta")
    }
    plain = ml_cascade(model, variables, scene32, 160, stats_mode="tile")
    refined = ml_cascade(model, variables, scene32, 160, stats_mode="tile", refine_cycles=2)
    for res in (80, 160):
        truth = np.asarray(scene["u"][res], np.float64)
        err_plain = np.abs(np.asarray(plain[res], np.float64) - truth).mean()
        err_ref = np.abs(np.asarray(refined[res], np.float64) - truth).mean()
        assert err_ref < 0.5 * err_plain, (res, err_plain, err_ref)


def test_batched_dihedral_matches_sequential(scene):
    """The one-batch dihedral fold equals applying the 8 transforms one at a
    time (eval-mode BatchNorm has fixed stats, so the fold is exact)."""
    from superresolution_for_pdes_tpu.cascade.upscale import _dihedral_apply

    model, variables = init_unet(
        jax.random.key(0),
        AttentionUNet(enc_features=(8, 16, 32), bridge_features=64, head_features=(8, 4)),
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((3, 40, 40, 3)), jnp.float32)
    batched = _dihedral_apply(model, variables, x)
    preds = []
    for flip in (False, True):
        xf = jnp.flip(x, axis=-3) if flip else x
        for k in range(4):
            xr = jnp.rot90(xf, k=k, axes=(-3, -2))
            p = model.apply(variables, xr, train=False)
            p = jnp.rot90(p, k=-k, axes=(-3, -2))
            preds.append(jnp.flip(p, axis=-3) if flip else p)
    sequential = sum(preds) / len(preds)
    np.testing.assert_allclose(
        np.asarray(batched), np.asarray(sequential), rtol=1e-5, atol=5e-6
    )


def test_amplitude_calibration(scene):
    """amp_levels rescales each level's stitched output (level 1: exact 2x
    check); calibrate_amplitude returns finite positive per-level factors and
    the fused/stepwise paths agree under them."""
    from superresolution_for_pdes_tpu.cascade.upscale import (
        calibrate_amplitude,
        ml_cascade,
        ml_cascade_stepwise,
    )

    model, variables = init_unet(
        jax.random.key(0),
        AttentionUNet(enc_features=(8, 16, 32), bridge_features=64, head_features=(8, 4)),
    )
    scene32 = {
        fld: {r: jnp.asarray(v, jnp.float32) for r, v in scene[fld].items()}
        for fld in ("u", "f", "theta")
    }
    base = ml_cascade(model, variables, scene32, 80, stats_mode="tile")
    amped = ml_cascade(model, variables, scene32, 80, stats_mode="tile",
                       amp_levels=jnp.array([2.0]))
    np.testing.assert_allclose(
        np.asarray(amped[80]), 2.0 * np.asarray(base[80]), rtol=1e-6
    )

    amps = calibrate_amplitude(model, variables, jax.random.key(7), n_scenes=2,
                               target_resolution=160, k_range=(6.0, 12.0),
                               stats_mode="tile")
    amps = np.asarray(amps)
    assert amps.shape == (2,) and np.all(np.isfinite(amps)) and np.all(amps > 0)

    fused = ml_cascade(model, variables, scene32, 160, stats_mode="tile",
                       amp_levels=jnp.asarray(amps))
    stepped, _ = ml_cascade_stepwise(model, variables, scene32, 160,
                                     stats_mode="tile", amp_levels=jnp.asarray(amps))
    np.testing.assert_allclose(
        np.asarray(stepped[160]), np.asarray(fused[160]), rtol=1e-5, atol=1e-7
    )


def test_modal_calibration(scene):
    """Modal band gains: band_gains/apply_level_correction invert a known
    band-diagonal distortion; calibrate_modal returns per-level gain vectors
    the fused/stepwise cascades accept (and agree under); a scalar entry in
    amp_levels still means plain amplitude."""
    from superresolution_for_pdes_tpu.cascade.modal import (
        apply_level_correction,
        band_gains,
        calibrate_modal,
        radial_band_index,
    )
    from superresolution_for_pdes_tpu.cascade.upscale import (
        ml_cascade,
        ml_cascade_stepwise,
    )

    # synthetic: distort truth by a known per-band filter; the LS gains must
    # recover its inverse on occupied bands and the correction restore truth
    rng = np.random.default_rng(0)
    truth = jnp.asarray(rng.normal(size=(3, 40, 40)), jnp.float32)
    bpo = 4
    g0 = jnp.asarray(0.5 + 0.1 * np.arange(12 * bpo), jnp.float32)
    pred = apply_level_correction(truth, 1.0 / g0)
    g = band_gains(pred, truth, bands_per_octave=bpo)
    occupied = np.unique(np.asarray(radial_band_index(40, bpo)))
    np.testing.assert_allclose(np.asarray(g)[occupied], np.asarray(g0)[occupied],
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(apply_level_correction(pred, g)),
                               np.asarray(truth), rtol=1e-3, atol=1e-5)

    model, variables = init_unet(
        jax.random.key(0),
        AttentionUNet(enc_features=(8, 16, 32), bridge_features=64, head_features=(8, 4)),
    )
    scene32 = {
        fld: {r: jnp.asarray(v, jnp.float32) for r, v in scene[fld].items()}
        for fld in ("u", "f", "theta")
    }
    gains = calibrate_modal(model, variables, jax.random.key(7), n_scenes=2,
                            target_resolution=160, k_range=(6.0, 12.0),
                            stats_mode="tile", bands_per_octave=bpo)
    assert len(gains) == 2
    assert all(np.isfinite(np.asarray(g)).all() for g in gains)

    fused = ml_cascade(model, variables, scene32, 160, stats_mode="tile",
                       amp_levels=gains)
    stepped, _ = ml_cascade_stepwise(model, variables, scene32, 160,
                                     stats_mode="tile", amp_levels=gains)
    np.testing.assert_allclose(
        np.asarray(stepped[160]), np.asarray(fused[160]), rtol=1e-5, atol=1e-7
    )

    # mixed entries: scalar at level 1, band gains at level 2
    mixed = (jnp.asarray(1.5), gains[1])
    out = ml_cascade(model, variables, scene32, 160, stats_mode="tile",
                     amp_levels=mixed)
    assert np.isfinite(np.asarray(out[160])).all()


def test_per_level_tile_schedule(scene):
    """``coarse_tile`` may be a per-level schedule (trailing levels reuse the
    last entry): a 40-point level-2 tile runs 40^2->80^2 windows — bigger
    spatial context, 4 tiles at 80->160 instead of 16 (round-4 attack on the
    160^2 systematic floor). Fused == stepwise under the schedule, the
    level-1 field (same 20-tile config) is unchanged, and the level-2 field
    genuinely differs from the all-20 cascade."""
    from superresolution_for_pdes_tpu.cascade.upscale import (
        ml_cascade,
        ml_cascade_stepwise,
    )

    model, variables = init_unet(
        jax.random.key(0),
        AttentionUNet(enc_features=(8, 16, 32), bridge_features=64, head_features=(8, 4)),
    )
    scene32 = {
        fld: {r: jnp.asarray(v, jnp.float32) for r, v in scene[fld].items()}
        for fld in ("u", "f", "theta")
    }
    base = ml_cascade(model, variables, scene32, 160, stats_mode="tile")
    sched = ml_cascade(model, variables, scene32, 160, stats_mode="tile",
                       coarse_tile=(20, 40))
    np.testing.assert_allclose(np.asarray(sched[80]), np.asarray(base[80]),
                               rtol=1e-6, atol=1e-8)
    assert np.abs(np.asarray(sched[160]) - np.asarray(base[160])).max() > 0
    assert np.isfinite(np.asarray(sched[160])).all()

    stepped, times = ml_cascade_stepwise(model, variables, scene32, 160,
                                         stats_mode="tile", coarse_tile=(20, 40))
    assert set(times) == {80, 160}
    for res in (80, 160):
        np.testing.assert_allclose(np.asarray(stepped[res]), np.asarray(sched[res]),
                                   rtol=1e-5, atol=1e-7)
    # full-field level 1: one 40^2 window over the whole 40^2 input
    full = ml_cascade(model, variables, scene32, 80, stats_mode="tile",
                      coarse_tile=40)
    assert full[80].shape == (80, 80)
    assert np.isfinite(np.asarray(full[80])).all()


def test_warmup_cascade_stepwise_primes_compilation(scene):
    """The AOT warmup compiles every per-level program without executing any
    device work; the subsequent timed stepwise pass returns identical fields
    to a cold run (round-4 hygiene: replaces the run-and-discard warm pass
    that doubled the statistical benchmark's device work)."""
    from superresolution_for_pdes_tpu.cascade.multires import solve_multi_resolution_batch
    from superresolution_for_pdes_tpu.cascade.upscale import (
        ml_cascade_stepwise,
        warmup_cascade_stepwise,
    )

    model, variables = init_unet(
        jax.random.key(0),
        AttentionUNet(enc_features=(8, 16, 32), bridge_features=64, head_features=(8, 4)),
    )
    scenes = solve_multi_resolution_batch(jax.random.key(5), 2, resolutions=(80, 160))
    cold, _ = ml_cascade_stepwise(model, variables, scenes, 160, stats_mode="tile",
                                  coarse_tile=(20, 40))
    warmup_cascade_stepwise(model, variables, scenes, 160, stats_mode="tile",
                            coarse_tile=(20, 40))
    warm, times = ml_cascade_stepwise(model, variables, scenes, 160, stats_mode="tile",
                                      coarse_tile=(20, 40))
    assert all(t > 0 for t in times.values())
    for res in (80, 160):
        np.testing.assert_allclose(np.asarray(warm[res]), np.asarray(cold[res]),
                                   rtol=0, atol=0)
    # oracle mode lowers with truth-stats fields too
    warmup_cascade_stepwise(model, variables, scenes, 160, stats_mode="oracle")
    oracle, _ = ml_cascade_stepwise(model, variables, scenes, 160, stats_mode="oracle")
    assert np.isfinite(np.asarray(oracle[160])).all()
