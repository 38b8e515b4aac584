"""Data layer: generation semantics, normalization parity vs torch, io, splits."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from superresolution_for_pdes_tpu.data import (
    NormStats,
    combine_datasets,
    generate_standard_dataset,
    generate_subdomain_dataset,
    load_dataset,
    save_dataset,
    stratified_split,
)
from superresolution_for_pdes_tpu.data.normalization import make_model_inputs, make_targets
from superresolution_for_pdes_tpu.data.pipeline import epoch_batch_indices


@pytest.fixture(scope="module")
def std_ds():
    return generate_standard_dataset(jax.random.key(0), 16, dtype=jnp.float64)


@pytest.fixture(scope="module")
def sub_ds():
    return generate_subdomain_dataset(jax.random.key(1), 16, dtype=jnp.float64)


def test_standard_dataset_schema_and_solution(std_ds, reference_solve):
    assert std_ds["u_fine"].shape == (16, 40, 40)
    assert std_ds["u_coarse"].shape == (16, 20, 20)
    assert not bool(std_ds["is_subdomain"].any())
    assert np.all((np.asarray(std_ds["k1"]) >= 0.5) & (np.asarray(std_ds["k1"]) <= 5.0))
    # Each sample solves the reference system on both grids.
    for grid in ("fine", "coarse"):
        f = np.asarray(std_ds[f"f_{grid}"][3])
        theta = np.asarray(std_ds[f"theta_{grid}"][3])
        ref = reference_solve(f, theta)
        assert np.max(np.abs(np.asarray(std_ds[f"u_{grid}"][3]) - ref)) <= 1e-6


def test_subdomain_dataset_semantics(sub_ds):
    assert sub_ds["u_fine"].shape == (16, 40, 40)
    assert bool(sub_ds["is_subdomain"].all())
    # coarse fields are the [::2, ::2] stride of the fine window
    np.testing.assert_array_equal(
        np.asarray(sub_ds["u_coarse"]), np.asarray(sub_ds["u_fine"])[:, ::2, ::2]
    )
    # k range is the wider subdomain range
    ks = np.concatenate([np.asarray(sub_ds["k1"]), np.asarray(sub_ds["k2"])])
    assert ks.min() >= 0.5 and ks.max() <= 12.0 and ks.max() > 5.0


def test_subdomain_window_is_from_superfine_solve(reference_solve):
    """The fine field must be a contiguous window of the 80^2 solve."""
    ds = generate_subdomain_dataset(jax.random.key(7), 2, dtype=jnp.float64)
    k1 = float(ds["k1"][0])
    k2 = float(ds["k2"][0])
    x = np.linspace(0, 1, 80)
    X, Y = np.meshgrid(x, x)
    f_sf = np.sin(2 * np.pi * k1 * X) * np.sin(2 * np.pi * k2 * Y)
    u_sf = reference_solve(f_sf, np.ones((80, 80)))
    window = np.asarray(ds["u_fine"][0])
    # find the window offset by matching the first element row/col
    best = np.inf
    for sy in range(41):
        for sx in range(41):
            d = np.max(np.abs(u_sf[sy : sy + 40, sx : sx + 40] - window))
            best = min(best, d)
    assert best <= 1e-6


def test_combine_datasets(std_ds, sub_ds):
    both = combine_datasets(std_ds, sub_ds)
    assert both["u_fine"].shape[0] == 32
    flags = np.asarray(both["is_subdomain"])
    assert flags[:16].sum() == 0 and flags[16:].sum() == 16


def test_normstats_match_torch_pde_dataset_semantics(std_ds):
    """Oracle: recompute the PDEDataset stats pipeline in torch."""
    u_fine = torch.from_numpy(np.asarray(std_ds["u_fine"]))
    f_fine = torch.from_numpy(np.asarray(std_ds["f_fine"]))
    theta_fine = torch.from_numpy(np.asarray(std_ds["theta_fine"]))
    u_coarse = torch.from_numpy(np.asarray(std_ds["u_coarse"]))

    stats = NormStats.from_dataset(std_ds)
    assert float(stats.u_mean) == pytest.approx(float(u_fine.mean()), rel=1e-10)
    assert float(stats.u_std) == pytest.approx(float(u_fine.std()), rel=1e-10)
    assert float(stats.f_mean) == pytest.approx(float(f_fine.mean()), rel=1e-10)
    assert float(stats.f_std) == pytest.approx(float(f_fine.std()), rel=1e-10)
    # theta is constant 1.0 -> detection kicks in (mean 0, std 1)
    assert bool(stats.theta_is_constant)
    assert float(stats.theta_mean) == 0.0 and float(stats.theta_std) == 1.0

    # full input pipeline vs torch
    u_coarse_norm = (u_coarse - u_fine.mean()) / u_fine.std()
    u_up_ref = F.interpolate(
        u_coarse_norm.unsqueeze(1), size=(40, 40), mode="bilinear", align_corners=True
    )[:, 0]
    f_norm_ref = (f_fine - f_fine.mean()) / f_fine.std()
    inputs = make_model_inputs(std_ds["u_coarse"], std_ds["f_fine"], std_ds["theta_fine"], stats)
    assert inputs.shape == (16, 40, 40, 3)
    np.testing.assert_allclose(np.asarray(inputs[..., 0]), u_up_ref.numpy(), rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(inputs[..., 1]), theta_fine.numpy(), rtol=1e-12, atol=0)
    np.testing.assert_allclose(np.asarray(inputs[..., 2]), f_norm_ref.numpy(), rtol=1e-9, atol=1e-9)

    targets = make_targets(std_ds["u_fine"], stats)
    assert targets.shape == (16, 40, 40, 1)
    # denormalize roundtrip
    np.testing.assert_allclose(
        np.asarray(stats.denormalize_u(targets[..., 0])), np.asarray(std_ds["u_fine"]),
        rtol=1e-9, atol=1e-12,
    )


def test_varying_theta_normalization(rng):
    theta = jnp.asarray(rng.uniform(0.5, 2.0, size=(4, 40, 40)))
    u = jnp.asarray(rng.standard_normal((4, 40, 40)))
    f = jnp.asarray(rng.standard_normal((4, 40, 40)))
    stats = NormStats.from_fields(u, f, theta)
    assert not bool(stats.theta_is_constant)
    t = torch.from_numpy(np.asarray(theta))
    assert float(stats.theta_mean) == pytest.approx(float(t.mean()), rel=1e-10)
    assert float(stats.theta_std) == pytest.approx(float(t.std()), rel=1e-10)


def test_npz_roundtrip(tmp_path, std_ds):
    p = save_dataset(std_ds, tmp_path / "ds.npz")
    loaded = load_dataset(p, dtype=jnp.float64)
    for key in std_ds:
        np.testing.assert_array_equal(np.asarray(loaded[key]), np.asarray(std_ds[key]))


def test_stratified_split():
    flags = np.array([False] * 100 + [True] * 60)
    train, val = stratified_split(42, flags, val_split=0.2)
    assert len(train) + len(val) == 160
    assert len(np.intersect1d(train, val)) == 0
    assert (flags[val]).sum() == 12 and (~flags[val]).sum() == 20
    assert (flags[train]).sum() == 48 and (~flags[train]).sum() == 80


def test_stratified_split_tiny_stratum_keeps_one_val_sample():
    """A 2-4 sample stratum still yields one validation sample: an empty val
    split divides by zero in the chunked eval_loss (train/loop.py) — hit by
    the round-5 full-field L3 verify drive (4 selffeed samples/epoch)."""
    flags = np.array([True] * 4)
    train, val = stratified_split(0, flags, val_split=0.2)
    assert len(val) == 1 and len(train) == 3
    # both strata tiny
    flags = np.array([False] * 2 + [True] * 3)
    train, val = stratified_split(0, flags, val_split=0.2)
    assert (flags[val]).sum() == 1 and (~flags[val]).sum() == 1
    # a single-sample stratum cannot afford a val sample
    flags = np.array([False])
    train, val = stratified_split(0, flags, val_split=0.2)
    assert len(train) == 1 and len(val) == 0


def test_epoch_batch_indices():
    idx = epoch_batch_indices(jax.random.key(0), 1600, 32)
    assert idx.shape == (50, 32)
    assert len(np.unique(np.asarray(idx))) == 1600


def test_epoch_batch_indices_rejects_batch_larger_than_split():
    """batch > train split would silently run zero steps per epoch and
    report nan train loss (round-5 verify drive); it must fail loudly."""
    import pytest

    with pytest.raises(ValueError, match="zero steps"):
        epoch_batch_indices(jax.random.key(0), 3, 4)


def test_cascade_dataset_window_alignment():
    """Cascade-consistent tiles: the coarse window on the r-grid must be the
    stride-2 subset of the fine window on the 2r-grid positionally — verified
    through the forcing field, which is a pure function of grid position."""
    import jax

    from superresolution_for_pdes_tpu.data.generate import generate_cascade_dataset

    ds = generate_cascade_dataset(jax.random.key(7), 2, tiles_per_level=4, finest=160)
    # 2 scenes x 4 tiles x 2 levels (40->80, 80->160)
    assert ds["u_fine"].shape == (16, 40, 40)
    np.testing.assert_allclose(
        np.asarray(ds["f_coarse"]), np.asarray(ds["f_fine"])[:, ::2, ::2],
        rtol=0, atol=0,
    )
    # u_coarse is a window of an independent coarse-grid solve: same physical
    # positions as the fine window's stride subset, but a *different* discrete
    # solution (that difference is exactly what the model must learn).
    assert np.isfinite(np.asarray(ds["u_coarse"])).all()
    diff = np.abs(np.asarray(ds["u_coarse"]) -
                  np.asarray(ds["u_fine"])[:, ::2, ::2]).max()
    assert diff > 0  # distinct discretizations
    assert bool(np.asarray(ds["is_subdomain"]).all())


def test_generate_mixed_dataset_strata():
    from superresolution_for_pdes_tpu.data.generate import generate_mixed_dataset

    ds = generate_mixed_dataset(
        jax.random.key(0), n_standard=4, n_subdomain=4, theta="mixed",
        n_cascade_scenes=1, cascade_tiles_per_level=2, cascade_finest=80,
    )
    # 2x(4+4) mixed strata + 1 scene x 2 tiles x 1 level
    assert ds["u_fine"].shape[0] == 18
    theta_std = np.asarray(jnp.std(ds["theta_fine"], axis=(1, 2)))
    assert (theta_std[:8] < 1e-6).all()        # constant stratum
    assert (theta_std[8:16] > 1e-3).all()      # varying stratum


def test_selffeed_cascade_dataset_uses_model_predictions():
    from superresolution_for_pdes_tpu.data.generate import (
        generate_cascade_dataset,
        selffeed_cascade_dataset,
    )
    from superresolution_for_pdes_tpu.models import AttentionUNet, init_unet

    model, variables = init_unet(
        jax.random.key(0),
        AttentionUNet(enc_features=(8, 16, 32), bridge_features=32, head_features=(4, 4)),
    )
    ds = selffeed_cascade_dataset(
        model, variables, jax.random.key(5), 2, tiles_per_level=2, finest=160,
        stats_mode="scene",
    )
    # 2 scenes x 2 tiles x 2 levels
    assert ds["u_fine"].shape == (8, 40, 40)
    assert np.isfinite(np.asarray(ds["u_coarse"])).all()
    # the deep-level coarse inputs are model predictions, not exact solves:
    # regenerate the exact-cascade tiles with the same key and compare
    exact = generate_cascade_dataset(
        jax.random.key(5), 2, tiles_per_level=2, finest=160, constant_theta=False,
    )
    # identical targets (same scenes, same windows)...
    np.testing.assert_allclose(
        np.asarray(ds["u_fine"]), np.asarray(exact["u_fine"]), rtol=0, atol=0
    )
    # ...but the second level's inputs differ (prediction vs exact solve)
    assert np.abs(np.asarray(ds["u_coarse"][4:]) - np.asarray(exact["u_coarse"][4:])).max() > 0


def test_selffeed_harvest_filter_experts_and_modal_teacher():
    """Matched-level training data: harvest_from keeps only the deep pair,
    the teacher accepts per-level expert variables and modal gains, and the
    harvested inputs reflect the modal correction."""
    from superresolution_for_pdes_tpu.cascade.modal import N_OCTAVES
    from superresolution_for_pdes_tpu.data.generate import selffeed_cascade_dataset
    from superresolution_for_pdes_tpu.models import AttentionUNet, init_unet

    model, variables = init_unet(
        jax.random.key(0),
        AttentionUNet(enc_features=(8, 16, 32), bridge_features=32, head_features=(4, 4)),
    )
    _, variables_b = init_unet(
        jax.random.key(1),
        AttentionUNet(enc_features=(8, 16, 32), bridge_features=32, head_features=(4, 4)),
    )
    gains = (jnp.full((N_OCTAVES * 4, N_OCTAVES * 4), 0.9, jnp.float32),)
    ds = selffeed_cascade_dataset(
        model, (variables, variables_b), jax.random.key(5), 2, tiles_per_level=2,
        finest=160, stats_mode="tile", amp_levels=gains, harvest_from=80,
    )
    # 2 scenes x 2 tiles x ONE level (the 80->160 pair only)
    assert ds["u_fine"].shape == (4, 40, 40)
    assert ds["u_coarse"].shape == (4, 20, 20)
    assert np.isfinite(np.asarray(ds["u_coarse"])).all()
    # the modal gains change the harvested inputs
    ds_nogain = selffeed_cascade_dataset(
        model, (variables, variables_b), jax.random.key(5), 2, tiles_per_level=2,
        finest=160, stats_mode="tile", harvest_from=80,
    )
    assert np.abs(np.asarray(ds["u_coarse"]) - np.asarray(ds_nogain["u_coarse"])).max() > 0
    # identical exact targets either way
    np.testing.assert_array_equal(np.asarray(ds["u_fine"]), np.asarray(ds_nogain["u_fine"]))
    # an overlap-tiling teacher produces different (finite) inputs again
    ds_ovl = selffeed_cascade_dataset(
        model, (variables, variables_b), jax.random.key(5), 2, tiles_per_level=2,
        finest=160, stats_mode="tile", harvest_from=80, overlap=(True,),
    )
    assert np.isfinite(np.asarray(ds_ovl["u_coarse"])).all()
    assert np.abs(np.asarray(ds_ovl["u_coarse"]) - np.asarray(ds_nogain["u_coarse"])).max() > 0
    np.testing.assert_array_equal(np.asarray(ds_ovl["u_fine"]), np.asarray(ds_nogain["u_fine"]))


def test_cascade_coarsest_selects_levels():
    """coarsest/finest restrict generated cascade tiles to chosen levels: with
    coarsest=80, finest=160 every tile comes from the 80->160 pair only."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from superresolution_for_pdes_tpu.data.generate import generate_cascade_dataset

    ds = generate_cascade_dataset(
        jax.random.key(0), n_scenes=2, tiles_per_level=3, k_range=(6.0, 12.0),
        finest=160, coarsest=80, constant_theta=True,
    )
    # one level pair x 2 scenes x 3 tiles
    assert ds["u_fine"].shape == (6, 40, 40)
    assert ds["u_coarse"].shape == (6, 20, 20)
    # f coarse tiles are the [::2, ::2] stride of the fine tiles (windows of
    # strides of the same finest field)
    np.testing.assert_allclose(
        np.asarray(ds["f_coarse"]), np.asarray(ds["f_fine"])[:, ::2, ::2],
        rtol=1e-6, atol=1e-8,
    )
    assert bool(jnp.isfinite(ds["u_fine"]).all())


def test_cascade_dataset_tile_size_40():
    """``tile_size=40`` harvests 40^2->80^2 window pairs (the bigger-context
    expert's training geometry) with the same stride-2 positional alignment
    as the default 20-point tiles."""
    import jax

    from superresolution_for_pdes_tpu.data.generate import generate_cascade_dataset

    ds = generate_cascade_dataset(jax.random.key(7), 2, tiles_per_level=3,
                                  finest=160, tile_size=40)
    # 2 scenes x 3 tiles x 2 levels (40->80, 80->160)
    assert ds["u_coarse"].shape == (12, 40, 40)
    assert ds["u_fine"].shape == (12, 80, 80)
    np.testing.assert_array_equal(
        np.asarray(ds["f_coarse"]), np.asarray(ds["f_fine"])[:, ::2, ::2])
    assert np.isfinite(np.asarray(ds["u_coarse"])).all()


def test_mixed_dataset_rejects_tile_size_with_standard_samples():
    import pytest

    from superresolution_for_pdes_tpu.data.generate import generate_mixed_dataset

    with pytest.raises(ValueError, match="cascade_tile_size"):
        generate_mixed_dataset(
            jax.random.key(0), n_standard=2, n_subdomain=0,
            n_cascade_scenes=1, cascade_finest=80, cascade_tile_size=40,
        )


def test_combine_datasets_skips_empty_sides():
    """An empty side may carry placeholder spatial dims that differ from the
    other side's (e.g. empty 20->40 standard part + 40->80 selffeed tiles) —
    combine must pass the non-empty side through unchanged."""
    from superresolution_for_pdes_tpu.data.generate import combine_datasets

    keys = ("u_fine", "u_coarse", "f_fine", "f_coarse", "theta_fine",
            "theta_coarse", "k1", "k2", "is_subdomain")

    def make(n, fine):
        coarse = fine // 2
        ds = {}
        for k in keys:
            if k in ("k1", "k2"):
                ds[k] = jnp.zeros((n,))
            elif k == "is_subdomain":
                ds[k] = jnp.zeros((n,), bool)
            else:
                r = fine if k.endswith("_fine") else coarse
                ds[k] = jnp.zeros((n, r, r))
        return ds

    big = make(3, 80)
    empty = make(0, 40)  # mismatched spatial dims, but empty
    out = combine_datasets(empty, big)
    assert out["u_fine"].shape == (3, 80, 80)
    out = combine_datasets(big, empty)
    assert out["u_fine"].shape == (3, 80, 80)


def test_mixed_dataset_pure_cascade_tile_40():
    """std = sub = 0 with a 40-point cascade tile is the bigger-tile expert
    recipe — the mixed generator must not try to build (or concat) an empty
    20->40 part."""
    from superresolution_for_pdes_tpu.data.generate import generate_mixed_dataset

    ds = generate_mixed_dataset(
        jax.random.key(0), n_standard=0, n_subdomain=0,
        n_cascade_scenes=2, cascade_tiles_per_level=3, cascade_finest=160,
        cascade_tile_size=40,
    )
    assert ds["u_coarse"].shape == (12, 40, 40)
    assert ds["u_fine"].shape == (12, 80, 80)


def test_selffeed_full_field_windows():
    """The round-4 full-field expert recipe: ``tile_size`` equal to the
    coarse resolution harvests the WHOLE field as one window (sfl2e:
    80^2->160^2, ``--gen_tile_size 80 --gen_tiles_per_level 1``), and the
    teacher accepts a per-level full-field tile schedule."""
    from superresolution_for_pdes_tpu.data.generate import selffeed_cascade_dataset
    from superresolution_for_pdes_tpu.models import AttentionUNet, init_unet

    model, variables = init_unet(
        jax.random.key(0),
        AttentionUNet(enc_features=(8, 16, 32), bridge_features=32, head_features=(4, 4)),
    )
    ds = selffeed_cascade_dataset(
        model, variables, jax.random.key(5), 2, tiles_per_level=1,
        finest=160, stats_mode="tile", harvest_from=80,
        tile_size=80, teacher_tile=(40,),
    )
    # 2 scenes x 1 window x one level: the full 80^2 predicted field in,
    # the full 160^2 exact solve out
    assert ds["u_coarse"].shape == (2, 80, 80)
    assert ds["u_fine"].shape == (2, 160, 160)
    assert ds["f_fine"].shape == (2, 160, 160)
    assert np.isfinite(np.asarray(ds["u_coarse"])).all()
    assert np.isfinite(np.asarray(ds["u_fine"])).all()


def test_selffeed_scene_chunking():
    """``scene_chunk`` generates the scene batch in bounded-memory chunks and
    concatenates the harvested tiles: same shapes/dtypes/finiteness as the
    single-program path, scene count must divide evenly, and a chunk >= the
    batch is the identity configuration (same key path, bitwise-equal)."""
    import pytest

    from superresolution_for_pdes_tpu.data.generate import selffeed_cascade_dataset
    from superresolution_for_pdes_tpu.models import AttentionUNet, init_unet

    model, variables = init_unet(
        jax.random.key(0),
        AttentionUNet(enc_features=(8, 16, 32), bridge_features=32, head_features=(4, 4)),
    )
    kw = dict(tiles_per_level=2, finest=160, stats_mode="tile", tile_size=20)
    whole = selffeed_cascade_dataset(model, variables, jax.random.key(7), 4, **kw)
    chunked = selffeed_cascade_dataset(
        model, variables, jax.random.key(7), 4, scene_chunk=2, **kw)
    for k in whole:
        assert chunked[k].shape == whole[k].shape
        assert chunked[k].dtype == whole[k].dtype
        assert np.isfinite(np.asarray(chunked[k], float)).all()
    # chunk >= n_scenes falls through to the single-program path unchanged
    same = selffeed_cascade_dataset(
        model, variables, jax.random.key(7), 4, scene_chunk=4, **kw)
    np.testing.assert_array_equal(np.asarray(same["u_fine"]), np.asarray(whole["u_fine"]))
    with pytest.raises(ValueError, match="multiple of"):
        selffeed_cascade_dataset(
            model, variables, jax.random.key(7), 4, scene_chunk=3, **kw)
