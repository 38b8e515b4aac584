"""Multi-level ML upscaling 40 -> 80 -> 160 -> 320 -> 640, fully vectorized.

The reference's flagship inference path (``/root/reference/src/
resolution_comparison.py:183-229``) loops Python-sequentially over
``(res/20)^2`` tiles per level with batch-1 model calls. Here each level is
ONE batched model application over all tiles (vmap-free — the model is already
batched), optionally sharded across the device mesh on the tile axis — the
TPU answer to the reference's spatial domain decomposition.

Per level (matching ``ml_multi_level_upscale`` semantics):

1. normalization stats for the level (oracle mode reproduces the reference's
   use of ground-truth fine stats, ``resolution_comparison.py:196-201``;
   scene mode is the honest variant using only known quantities);
2. split current solution into 20^2 tiles and next-res f/theta into 40^2 tiles;
3. normalize, align-corners bilinear 20->40, stack channels, model forward,
   denormalize (= ``upscale_subdomain``, ``resolution_comparison.py:80-121``);
4. stitch and double the resolution.

The Python loop over levels is static (4 iterations, shapes double), so each
level jit-compiles once and is reused across scenes.
"""

from __future__ import annotations

import functools
import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from superresolution_for_pdes_tpu.cascade.modal import apply_level_correction
from superresolution_for_pdes_tpu.cascade.tiles import (
    split_tiles,
    split_tiles_overlapping,
    stitch_tiles,
    stitch_tiles_overlapping,
)
from superresolution_for_pdes_tpu.data.normalization import (
    NormStats,
    make_model_inputs,
    per_sample_stats,
)
from superresolution_for_pdes_tpu.ops.resize import resize_align_corners


@functools.partial(jax.jit, static_argnames=("model", "tile_sharding"))
def upscale_tile_batch(
    model,
    variables: Dict,
    u_coarse_tiles: jnp.ndarray,  # (T, 20, 20)
    f_fine_tiles: jnp.ndarray,    # (T, 40, 40)
    theta_fine_tiles: jnp.ndarray,
    stats: NormStats,
    tile_sharding: Optional[jax.sharding.NamedSharding] = None,
) -> jnp.ndarray:
    """One batched tile upscale: normalize -> model -> denormalize."""
    x = make_model_inputs(u_coarse_tiles, f_fine_tiles, theta_fine_tiles, stats,
                          fine_shape=f_fine_tiles.shape[-2:],
                          scale_channels=model.in_channels > 3)
    if tile_sharding is not None:
        x = jax.lax.with_sharding_constraint(x, tile_sharding)
    pred = model.apply(variables, x, train=False)
    return stats.denormalize_u(pred[..., 0])


def _dihedral_apply(model, variables, x: jnp.ndarray,
                    tile_sharding=None) -> jnp.ndarray:
    """Average the model over the 8-element dihedral group (honest test-time
    ensembling).

    The continuous problem is invariant under the square's symmetries (the
    Laplacian is isotropic, ``theta``/``f`` transform with the grid) and so is
    the reference discretization (the truncated 5-point stencil commutes with
    rotations/flips of the vertex grid, ``data_generation.py:35-58``) — so for
    any grid symmetry ``g``, ``g^-1(model(g(x)))`` is an equally valid
    prediction and the orbit average cancels the model's non-equivariant error
    component. Pure test-time: no retraining, no ground-truth access.

    The whole orbit runs as ONE model application over an 8x-larger tile batch
    (concatenated on the leading axis) — on the MXU a single large batch is
    far cheaper than 8 sequential applies, and eval-mode BatchNorm uses fixed
    running stats so the fold is bit-equivalent to the sequential loop.

    Under a tile sharding every rotated/flipped tensor is re-pinned to the
    tile axis: the transforms touch only the (replicated) spatial dims, but
    without explicit constraints GSPMD's cost model used to re-shard the
    ``reverse`` ops spatially and fall back to involuntary full
    rematerialization (round-3 dryrun warning); the constraints keep the
    orbit fold tile-parallel end to end.
    """
    pin = ((lambda t: jax.lax.with_sharding_constraint(t, tile_sharding))
           if tile_sharding is not None else (lambda t: t))
    xs = []
    for flip in (False, True):
        xf = pin(jnp.flip(x, axis=-3)) if flip else x
        for k in range(4):
            xs.append(pin(jnp.rot90(xf, k=k, axes=(-3, -2))))
    preds = model.apply(variables, pin(jnp.concatenate(xs, axis=0)), train=False)
    preds = [pin(p) for p in jnp.split(preds, 8, axis=0)]
    out = []
    for i, flip in enumerate((False, True)):
        for k in range(4):
            p = pin(jnp.rot90(preds[4 * i + k], k=-k, axes=(-3, -2)))
            out.append(pin(jnp.flip(p, axis=-3)) if flip else p)
    return sum(out) / len(out)


def _refine(u: jnp.ndarray, f: jnp.ndarray, theta: jnp.ndarray,
            cycles: int) -> jnp.ndarray:
    """Physics refinement: ``cycles`` Galerkin V-cycles of the KNOWN PDE
    ``diag(theta) L u = f`` (reference operator, ``data_generation.py:99``)
    with the ML prediction as the initial iterate.

    Honest by construction — f and theta are the cascade's inputs at every
    level and no ground-truth field is touched; the ML cascade supplies a
    high-quality initial guess so a couple of O(N) cycles recover most of the
    remaining field energy (the train-time physics loss penalizes the same
    residual; this applies it at inference). This is the ML-preconditioned
    multigrid hybrid the TPU build adds over the reference's pure-ML cascade.
    """
    from superresolution_for_pdes_tpu.solver.multigrid import vcycle

    b = -(f / theta)
    for _ in range(cycles):
        u = vcycle(u, b)
    return u


def _level_overlap(overlap, i: int) -> bool:
    """Per-level overlap selection: ``overlap`` may be one bool for every
    level or a tuple with one bool per level (trailing levels reuse the last
    entry, mirroring the per-level ``variables`` convention).  Measured
    (round 3): feathered overlap wins at the near-Nyquist shallow levels but
    loses at depth once a matched level-2 expert is in the chain, so the
    champion runs a mixed schedule."""
    if isinstance(overlap, (list, tuple)):
        return bool(overlap[min(i, len(overlap) - 1)])
    return bool(overlap)


def _level_tile(coarse_tile, i: int) -> int:
    """Per-level coarse tile size: ``coarse_tile`` may be one int for every
    level or a tuple with one int per level (trailing levels reuse the last
    entry).  Bigger windows at deeper levels give the model more spatial
    context per tile — e.g. ``(20, 40)`` runs level 1 on the trained 20->40
    geometry but level 2+ on 40^2->80^2 windows (4 tiles at 80->160 instead
    of 16), so near-Nyquist structure is not chopped at 20-point tile
    boundaries.  Each level's tile must divide its input resolution; pair a
    non-20 entry with an expert trained on that window size
    (``--gen_tile_size`` in the train CLI)."""
    if isinstance(coarse_tile, (list, tuple)):
        return int(coarse_tile[min(i, len(coarse_tile) - 1)])
    return int(coarse_tile)


def _level_body(
    model,
    variables: Dict,
    current: jnp.ndarray,
    f_next: jnp.ndarray,
    theta_next: jnp.ndarray,
    stats_source,
    coarse_tile: int,
    overlap: bool,
    tile_sharding,
    stats_kind: str,
    symmetrize: bool = False,
    refine_cycles: int = 0,
) -> jnp.ndarray:
    """One cascade level — stats, tiling, normalization, model forward,
    denormalization, stitching and optional physics refinement — as
    straight-line traced code (callers jit)."""
    fine_tile = 2 * coarse_tile
    next_res = f_next.shape[-1]
    if stats_kind == "per_tile":
        stats = None  # computed per tile batch below
    elif stats_kind == "precomputed":
        stats = stats_source  # a NormStats pytree
    else:  # "field": u-stats field + f/theta of this level
        stats = NormStats.from_fields(stats_source, f_next, theta_next)

    def run_tiles(u_tiles, f_tiles, theta_tiles):
        nonlocal stats
        if stats_kind == "per_tile":
            # Fully local self-normalization: each tile's stats come from its
            # own coarse input and known f/theta windows — no scene-level or
            # oracle statistics, and zero cross-tile reductions.
            stats = per_sample_stats(u_tiles, f_tiles, theta_tiles)
        x = make_model_inputs(u_tiles, f_tiles, theta_tiles, stats,
                              fine_shape=(fine_tile, fine_tile),
                              scale_channels=model.in_channels > 3)
        if tile_sharding is not None:
            x = jax.lax.with_sharding_constraint(x, tile_sharding)
        if symmetrize:
            pred = _dihedral_apply(model, variables, x, tile_sharding)
        else:
            pred = model.apply(variables, x, train=False)
        return stats.denormalize_u(pred[..., 0])

    if overlap:
        c_stride = coarse_tile // 2
        up_tiles = run_tiles(
            split_tiles_overlapping(current, coarse_tile, c_stride),
            split_tiles_overlapping(f_next, fine_tile, 2 * c_stride),
            split_tiles_overlapping(theta_next, fine_tile, 2 * c_stride),
        )
        out = stitch_tiles_overlapping(up_tiles, next_res, 2 * c_stride)
    else:
        up_tiles = run_tiles(
            split_tiles(current, coarse_tile),
            split_tiles(f_next, fine_tile),
            split_tiles(theta_next, fine_tile),
        )
        out = stitch_tiles(up_tiles)
    if refine_cycles > 0:
        out = _refine(out, f_next, theta_next, refine_cycles)
    return out


@functools.partial(
    jax.jit,
    static_argnames=("model", "coarse_tile", "overlap", "tile_sharding", "stats_kind",
                     "symmetrize", "refine_cycles"),
)
def _fused_level(
    model,
    variables: Dict,
    current: jnp.ndarray,
    f_next: jnp.ndarray,
    theta_next: jnp.ndarray,
    stats_source,
    coarse_tile: int,
    overlap: bool,
    tile_sharding,
    stats_kind: str,
    symmetrize: bool = False,
    refine_cycles: int = 0,
) -> jnp.ndarray:
    """One whole cascade level as a single XLA program.

    The naive per-level pipeline costs ~10 separate dispatches; over a remote
    TPU link each dispatch pays tens of ms of latency, so fusing the level
    into one program cuts most of the cascade's wall-clock.
    """
    return _level_body(model, variables, current, f_next, theta_next,
                       stats_source, coarse_tile, overlap, tile_sharding, stats_kind,
                       symmetrize, refine_cycles)


def _stats_source_kind(stats_mode: str, truth, current, train_stats):
    if stats_mode == "oracle":
        return truth, "field"
    if stats_mode == "scene":
        return current, "field"
    if stats_mode == "train":
        return train_stats, "precomputed"
    return None, "per_tile"  # "tile": fully local self-normalization


@functools.partial(
    jax.jit,
    static_argnames=(
        "model", "resolutions", "coarse_tile", "overlap", "tile_sharding", "stats_mode",
        "symmetrize", "refine_cycles",
    ),
)
def _cascade_program(
    model,
    variables: Dict,
    u_start: jnp.ndarray,           # (B?, r0, r0)
    f_levels: Tuple[jnp.ndarray, ...],      # per level, (B?, res, res)
    theta_levels: Tuple[jnp.ndarray, ...],
    u_truth_levels,                 # tuple like f_levels (oracle) or None
    train_stats,                    # NormStats or None
    resolutions: Tuple[int, ...],
    coarse_tile: int,
    overlap: bool,
    tile_sharding,
    stats_mode: str,
    symmetrize: bool = False,
    refine_cycles: int = 0,
    amp_levels=None,                # (n_levels,) array or None
):
    """The ENTIRE cascade (all levels, all scenes) as one XLA program.

    Levels are a static unrolled chain (shapes double each level, so this is a
    straight-line graph); an optional leading scene axis is mapped with
    ``lax.map`` — scenes run back-to-back on device with zero per-scene or
    per-level dispatch overhead (the reference pays a Python loop of
    ``(res/20)^2`` batch-1 model calls per level per scene,
    ``resolution_comparison.py:183-229``). Returns one output field per level.
    """

    def one_scene(args):
        current, fs, thetas, u_truths = args
        outs = []
        for i in range(len(resolutions)):
            truth = u_truths[i] if u_truths is not None else None
            stats_source, kind = _stats_source_kind(stats_mode, truth, current, train_stats)
            # per-level experts: ``variables`` may be a tuple with one
            # variables pytree per level (same architecture), e.g. a
            # level-1 specialist for the hardest 40->80 step.
            level_vars = (
                variables[min(i, len(variables) - 1)]
                if isinstance(variables, (list, tuple)) else variables
            )
            current = _level_body(
                model, level_vars, current, fs[i], thetas[i], stats_source,
                coarse_tile=_level_tile(coarse_tile, i),
                overlap=_level_overlap(overlap, i),
                tile_sharding=tile_sharding, stats_kind=kind,
                symmetrize=symmetrize, refine_cycles=refine_cycles,
            )
            if amp_levels is not None:
                current = apply_level_correction(current, amp_levels[i])
            outs.append(current)
        return tuple(outs)

    batched = u_start.ndim == 3
    if not batched:
        return one_scene((u_start, f_levels, theta_levels, u_truth_levels))
    return jax.lax.map(one_scene, (u_start, f_levels, theta_levels, u_truth_levels))


@functools.partial(
    jax.jit,
    static_argnames=("model", "coarse_tile", "overlap", "tile_sharding", "stats_kind",
                     "symmetrize", "refine_cycles"),
)
def _level_program(
    model,
    variables: Dict,
    current: jnp.ndarray,
    f_next: jnp.ndarray,
    theta_next: jnp.ndarray,
    stats_field,                    # per-scene stats source field, or None
    train_stats,                    # NormStats for stats_kind='precomputed', or None
    coarse_tile: int,
    overlap: bool,
    tile_sharding,
    stats_kind: str,
    symmetrize: bool = False,
    refine_cycles: int = 0,
    amp=None,                       # scalar amplitude correction or None
) -> jnp.ndarray:
    """ONE cascade level over a batch of scenes as one XLA program.

    Used by :func:`ml_cascade_stepwise` to execute the cascade level-by-level
    (4 programs instead of 1) so each level's wall-clock is observable while
    total device work stays exactly one cascade pass."""
    if current.ndim == 2:
        src = stats_field if stats_kind == "field" else (
            train_stats if stats_kind == "precomputed" else None)
        out = _level_body(model, variables, current, f_next, theta_next, src,
                          coarse_tile, overlap, tile_sharding, stats_kind, symmetrize,
                          refine_cycles)
        return out if amp is None else apply_level_correction(out, amp)
    if stats_kind == "field":
        def one(args):
            cur, f, th, sf = args
            return _level_body(model, variables, cur, f, th, sf,
                               coarse_tile, overlap, tile_sharding, "field", symmetrize,
                               refine_cycles)
        out = jax.lax.map(one, (current, f_next, theta_next, stats_field))
        return out if amp is None else apply_level_correction(out, amp)

    def one(args):
        cur, f, th = args
        src = train_stats if stats_kind == "precomputed" else None
        return _level_body(model, variables, cur, f, th, src,
                           coarse_tile, overlap, tile_sharding, stats_kind, symmetrize,
                           refine_cycles)
    out = jax.lax.map(one, (current, f_next, theta_next))
    return out if amp is None else apply_level_correction(out, amp)


def ml_cascade_stepwise(
    model,
    variables: Dict,
    data: Dict,
    target_resolution: int,
    stats_mode: str = "scene",
    train_stats: Optional[NormStats] = None,
    tile_sharding: Optional[jax.sharding.NamedSharding] = None,
    start_resolution: int = 40,
    coarse_tile: int = 20,
    overlap: bool = False,
    symmetrize: bool = False,
    refine_cycles: int = 0,
    amp_levels=None,
) -> Tuple[Dict[int, jnp.ndarray], Dict[int, float]]:
    """The cascade executed one level-program at a time, returning
    ``(fields_by_resolution, level_wall_seconds_by_resolution)``.

    Values are identical to :func:`ml_cascade` (each level depends only on the
    chain below it), but per-level wall-clock is observable: the cumulative sum
    of level times gives the time-to-reach every target resolution from a
    SINGLE cascade pass — no per-target re-runs (the reference harness times
    each target with a fresh full run, ``resolution_comparison_statistical.py:
    143-168``; so did round 2 of this build). Each level forces completion
    with a scalar fetch (remote-TPU ``block_until_ready`` can return early).
    """
    if stats_mode not in ("oracle", "scene", "train", "tile"):
        raise ValueError(f"unknown stats_mode: {stats_mode!r}")
    kind = {"oracle": "field", "scene": "field", "train": "precomputed",
            "tile": "per_tile"}[stats_mode]

    resolutions = []
    res = start_resolution
    while res < target_resolution:
        res *= 2
        resolutions.append(res)

    current = data["u"][start_resolution]
    outs: Dict[int, jnp.ndarray] = {}
    times: Dict[int, float] = {}
    for i, res in enumerate(resolutions):
        if stats_mode == "oracle":
            stats_field = data["u"][res]
        elif stats_mode == "scene":
            stats_field = current
        else:
            stats_field = None
        level_vars = (
            variables[min(i, len(variables) - 1)]
            if isinstance(variables, (list, tuple)) else variables
        )
        amp = None if amp_levels is None else amp_levels[i]
        t0 = time.perf_counter()
        current = _level_program(
            model, level_vars, current, data["f"][res], data["theta"][res],
            stats_field, train_stats if kind == "precomputed" else None,
            _level_tile(coarse_tile, i), _level_overlap(overlap, i),
            tile_sharding, kind, symmetrize, refine_cycles, amp,
        )
        float(jnp.sum(current))
        times[res] = time.perf_counter() - t0
        outs[res] = current
    return outs, times


def warmup_cascade_stepwise(
    model,
    variables: Dict,
    data: Dict,
    target_resolution: int,
    stats_mode: str = "scene",
    train_stats: Optional[NormStats] = None,
    tile_sharding: Optional[jax.sharding.NamedSharding] = None,
    start_resolution: int = 40,
    coarse_tile: int = 20,
    overlap: bool = False,
    symmetrize: bool = False,
    refine_cycles: int = 0,
    amp_levels=None,
) -> None:
    """AOT-compile every per-level program :func:`ml_cascade_stepwise` will
    run, WITHOUT executing any device work.

    ``jit.lower(...).compile()`` populates the same executable cache the
    ordinary call path hits, so a timed :func:`ml_cascade_stepwise` pass after
    this warmup measures pure execution — at zero device-work cost, unlike the
    run-and-discard warm pass it replaces (which doubled the benchmark's
    device work; round-3 verdict hygiene item).  The evolving ``current``
    field is represented by shape/dtype structs; all other arguments are the
    real ones so the lowered signatures match the timed pass exactly.
    """
    if stats_mode not in ("oracle", "scene", "train", "tile"):
        raise ValueError(f"unknown stats_mode: {stats_mode!r}")
    kind = {"oracle": "field", "scene": "field", "train": "precomputed",
            "tile": "per_tile"}[stats_mode]

    resolutions = []
    res = start_resolution
    while res < target_resolution:
        res *= 2
        resolutions.append(res)

    u0 = data["u"][start_resolution]
    dtype = u0.dtype
    batch = u0.shape[:-2]
    current = jax.ShapeDtypeStruct(batch + (start_resolution, start_resolution), dtype)
    for i, res in enumerate(resolutions):
        if stats_mode == "oracle":
            stats_field = data["u"][res]
        elif stats_mode == "scene":
            stats_field = current
        else:
            stats_field = None
        level_vars = (
            variables[min(i, len(variables) - 1)]
            if isinstance(variables, (list, tuple)) else variables
        )
        amp = None if amp_levels is None else amp_levels[i]
        _level_program.lower(
            model, level_vars, current, data["f"][res], data["theta"][res],
            stats_field, train_stats if kind == "precomputed" else None,
            _level_tile(coarse_tile, i), _level_overlap(overlap, i),
            tile_sharding, kind, symmetrize, refine_cycles, amp,
        ).compile()
        current = jax.ShapeDtypeStruct(batch + (res, res), dtype)


def ml_cascade(
    model,
    variables: Dict,
    data: Dict,
    target_resolution: int,
    stats_mode: str = "scene",
    train_stats: Optional[NormStats] = None,
    tile_sharding: Optional[jax.sharding.NamedSharding] = None,
    start_resolution: int = 40,
    coarse_tile: int = 20,
    overlap: bool = False,
    symmetrize: bool = False,
    refine_cycles: int = 0,
    amp_levels=None,
) -> Dict[int, jnp.ndarray]:
    """Fused multi-scene cascade: ONE device program for all levels (and all
    scenes when the ``data`` fields carry a leading batch axis), returning the
    ML field at *every* intermediate resolution.

    ``amp_levels`` (optional, one scalar per level) rescales each level's
    stitched output — see :func:`calibrate_amplitude` for the honest
    training-distribution calibration that produces it.

    This supersedes per-target re-runs: one pass to 640 produces the
    80/160/320 fields for free (they are the cascade's own intermediates —
    identical values to what per-target calls compute, since each level's
    computation depends only on the level chain below it).
    """
    if stats_mode not in ("oracle", "scene", "train", "tile"):
        raise ValueError(f"unknown stats_mode: {stats_mode!r}")
    if stats_mode == "train" and train_stats is None:
        raise ValueError("stats_mode='train' requires train_stats")

    resolutions = []
    res = start_resolution
    while res < target_resolution:
        res *= 2
        resolutions.append(res)
    resolutions = tuple(resolutions)

    f_levels = tuple(data["f"][r] for r in resolutions)
    theta_levels = tuple(data["theta"][r] for r in resolutions)
    u_truths = (
        tuple(data["u"][r] for r in resolutions) if stats_mode == "oracle" else None
    )
    if amp_levels is not None:
        amp_levels = tuple(jnp.asarray(a) for a in amp_levels)
    if isinstance(overlap, list):
        overlap = tuple(overlap)  # static jit arg must be hashable
    if isinstance(coarse_tile, list):
        coarse_tile = tuple(coarse_tile)
    outs = _cascade_program(
        model, variables, data["u"][start_resolution], f_levels, theta_levels,
        u_truths, train_stats, resolutions, coarse_tile, overlap,
        tile_sharding, stats_mode, symmetrize, refine_cycles, amp_levels,
    )
    return dict(zip(resolutions, outs))


def ml_multi_level_upscale(
    model,
    variables: Dict,
    data: Dict,
    target_resolution: int,
    stats_mode: str = "oracle",
    train_stats: Optional[NormStats] = None,
    tile_sharding: Optional[jax.sharding.NamedSharding] = None,
    start_resolution: int = 40,
    coarse_tile: int = 20,
    overlap: bool = False,
    symmetrize: bool = False,
    refine_cycles: int = 0,
    amp_levels=None,
) -> jnp.ndarray:
    """Cascade from ``start_resolution`` to ``target_resolution``.

    Args:
        data: ``{f: {res}, theta: {res}, u: {res}}`` scene dict from
            :func:`~superresolution_for_pdes_tpu.cascade.multires.solve_multi_resolution`.
        stats_mode: ``"oracle"`` — stats from the ground-truth fine solution
            of each level (reference parity, ``resolution_comparison.py:196-201``);
            ``"scene"`` — honest stats from the *current* solution and the
            known f/theta fields; ``"train"`` — fixed training-set stats
            (requires ``train_stats``); ``"tile"`` — fully local per-tile
            self-normalization (pair with a model trained with
            ``normalization='per_sample'``).
        overlap: half-tile-overlapping windows with feathered blending — a
            TPU-build improvement removing the seam artifacts of the
            reference's non-overlapping tiling (still one batched model call
            per level).
    """
    outs = ml_cascade(
        model, variables, data, target_resolution, stats_mode=stats_mode,
        train_stats=train_stats, tile_sharding=tile_sharding,
        start_resolution=start_resolution, coarse_tile=coarse_tile,
        overlap=overlap, symmetrize=symmetrize, refine_cycles=refine_cycles,
        amp_levels=amp_levels,
    )
    return outs[target_resolution]


def calibrate_amplitude(
    model,
    variables,
    key: jax.Array,
    n_scenes: int = 8,
    target_resolution: int = 640,
    k_range: Tuple[float, float] = (6.0, 12.0),
    stats_mode: str = "tile",
    train_stats: Optional[NormStats] = None,
    start_resolution: int = 40,
    coarse_tile: int = 20,
    overlap: bool = False,
    symmetrize: bool = False,
    theta_range: Tuple[float, float] = (0.5, 2.0),
) -> jnp.ndarray:
    """Honest per-level amplitude calibration from TRAINING-distribution scenes.

    The deployed cascade's dominant deep-level error is amplitude, not shape
    (round-3 analysis, ``reports/ROUND3.md`` section 0): under per-tile
    self-normalization each level's output inherits its input's scale, so the
    coarse grid's dispersion-inflated amplitude compounds down the chain
    (2x overshoot by 640^2 at k~10.5 while shape correlation stays ~0.85).
    Per-level specialists cannot learn the fix — they train on true-amplitude
    coarse inputs and never see the cascade's own drifted outputs (exposure
    bias; measured: a level-3/4 specialist is neutral at 640^2).

    This computes one scalar per level on ``n_scenes`` SELF-GENERATED scenes
    drawn from the training distribution (a seed, the training k-range, the
    exact solver — exactly the information training itself uses; the eval
    scenes' ground truth is never touched): run the cascade level by level,
    after each level set ``amp_i = mean_scenes(std(truth_i) / std(pred_i))``
    and apply it before continuing, so deeper factors are calibrated in the
    corrected regime they will deploy in. Pass the result as ``amp_levels=``
    to :func:`ml_cascade` / :func:`ml_cascade_stepwise`.

    The reference has no analogue (its oracle normalization,
    ``resolution_comparison.py:196-201``, reads each eval scene's fine-solution
    stats — a per-scene amplitude oracle; this is the honest replacement).
    """
    from superresolution_for_pdes_tpu.cascade.multires import (
        solve_multi_resolution_batch,
    )

    resolutions = []
    res = start_resolution
    while res < target_resolution:
        res *= 2
        resolutions.append(res)

    scenes = solve_multi_resolution_batch(
        key, n_scenes, resolutions=tuple(resolutions), k_range=k_range,
        theta_range=theta_range,
    )
    kind = {"oracle": "field", "scene": "field", "train": "precomputed",
            "tile": "per_tile"}[stats_mode]
    current = scenes["u"][start_resolution]
    amps = []
    for i, res in enumerate(resolutions):
        if stats_mode == "oracle":
            stats_field = scenes["u"][res]
        elif stats_mode == "scene":
            stats_field = current
        else:
            stats_field = None
        level_vars = (
            variables[min(i, len(variables) - 1)]
            if isinstance(variables, (list, tuple)) else variables
        )
        pred = _level_program(
            model, level_vars, current, scenes["f"][res], scenes["theta"][res],
            stats_field, train_stats if kind == "precomputed" else None,
            _level_tile(coarse_tile, i), _level_overlap(overlap, i), None, kind,
            symmetrize, 0, None,
        )
        truth = scenes["u"][res]
        ratio = jnp.std(truth, axis=(-2, -1)) / jnp.maximum(
            jnp.std(pred, axis=(-2, -1)), 1e-30)
        amp = jnp.mean(ratio)
        amps.append(amp)
        current = pred * amp
    return jnp.stack(amps)


def interpolation_upscale(
    u: jnp.ndarray, target_resolution: int, method: str = "bilinear"
) -> jnp.ndarray:
    """Direct align-corners interpolation baseline (reference
    ``resolution_comparison.py:415-420``, ``resolution_comparison_enhanced.py:372-392``)."""
    return resize_align_corners(u, (target_resolution, target_resolution), method)


def multi_level_interpolation_upscale(
    u: jnp.ndarray, target_resolution: int, method: str = "bilinear"
) -> jnp.ndarray:
    """2x-stepped interpolation baseline (reference
    ``resolution_comparison_enhanced.py:19-65``)."""
    res = u.shape[-1]
    while res < target_resolution:
        res *= 2
        u = resize_align_corners(u, (res, res), method)
    return u
