"""On-device dataset generation (standard, subdomain, test, cascade, self-feed).

Replicates the reference generators' *semantics* with a TPU-first execution
model: everything is batched over the sample axis and solved with the exact
fast-diagonalization DST solver in one fused program — no per-sample Python
loop and no host/native round-trip (the reference runs 1000+ serial scipy
``spsolve`` calls, ``/root/reference/src/data_generation.py:106-159`` and
``src/enhanced_data_generation.py:98-165``).

Semantics preserved exactly (SURVEY.md C2/C3 + quirks):

* standard samples: ``k1, k2 ~ U(k_range)``, ``f = sin(2 pi k1 X) sin(2 pi k2 Y)``
  evaluated on *separate* ``linspace(0, 1, n)`` grids at 20^2 and 40^2 (the
  grids are non-nested, ``data_generation.py:22-29``), theta == 1, and the
  PDE ``diag(theta) L u = f`` solved independently on both grids
  (``data_generation.py:130-145``);
* subdomain samples: solve at 80^2, extract a random 40^2 window with origin
  ``randint(0, 40)`` (``enhanced_data_generation.py:135-138``), and
  stride-downsample ``[::2, ::2]`` to 20^2 (``:85-96``) — so ``u_coarse`` is
  exactly the strided fine window, and f/theta windows come from the superfine
  fields, not a fresh coarse-grid evaluation;
* test sets: the ``compare_test_cases.py:12-79`` recipe — constant theta
  re-solves with theta == 1; varying theta draws ``theta ~ U(0.5, 2)`` on the
  fine grid, strided ``[::2, ::2]`` to the coarse grid, and re-solves both.

TPU-build extensions (not in the reference):

* ``constant_theta=False`` for the *training* generators (mixed-theta
  training data — the reference trains theta==1 only, then evaluates on
  theta ~ U(0.5, 2), a documented distribution shift);
* :func:`generate_cascade_dataset` — training tiles whose coarse input is an
  *independent coarse-grid solve* at every cascade resolution pair
  (40->80 ... 320->640), exactly the input distribution the multi-level
  cascade sees at inference (the reference trains only on 20->40 fields);
* :func:`selffeed_cascade_dataset` — tiles whose coarse inputs are an existing
  model's own cascade predictions (scheduled-sampling analogue), closing the
  train/inference input mismatch at depth.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from superresolution_for_pdes_tpu.ops.grid import forcing_term
from superresolution_for_pdes_tpu.solver.dst import solve_poisson_dst

THETA_RANGE = (0.5, 2.0)  # varying-theta draw (reference compare_test_cases.py:57)


def _batched_forcing(k1: jnp.ndarray, k2: jnp.ndarray, n: int, dtype) -> jnp.ndarray:
    """(B,) wave numbers -> (B, n, n) forcing fields, evaluated in one fused op."""
    return jax.vmap(lambda a, b: forcing_term(a, b, n, dtype))(k1, k2)


def _solve(f: jnp.ndarray, theta: jnp.ndarray, refine_iters: int) -> jnp.ndarray:
    return solve_poisson_dst(f, theta, refine_iters=refine_iters)


def _theta_fields(
    key: jax.Array,
    n_samples: int,
    n_fine: int,
    constant_theta: bool,
    dtype,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(theta_fine, theta_coarse): ones (reference parity) or U(0.5, 2) with the
    coarse field as the ``[::2, ::2]`` stride of the fine field
    (``compare_test_cases.py:57-58``)."""
    if constant_theta:
        theta_fine = jnp.ones((n_samples, n_fine, n_fine), dtype)
        theta_coarse = jnp.ones((n_samples, n_fine // 2, n_fine // 2), dtype)
    else:
        theta_fine = jax.random.uniform(
            key, (n_samples, n_fine, n_fine), dtype, *THETA_RANGE
        )
        theta_coarse = theta_fine[:, ::2, ::2]
    return theta_fine, theta_coarse


def generate_standard_dataset(
    key: jax.Array,
    n_samples: int,
    k_range: Tuple[float, float] = (0.5, 5.0),
    dtype=jnp.float32,
    constant_theta: bool = True,
    n_coarse: int = 20,
    n_fine: int = 40,
    refine_iters: int = 1,
) -> Dict[str, jnp.ndarray]:
    """Batched standard samples (reference ``data_generation.py:106-159``).

    Solves the reference system independently on the coarse and fine grids
    (both plain ``linspace(0, 1, n)`` vertex grids — deliberately non-nested).
    Published defaults: 1000 samples, k in (0.5, 5.0), theta == 1
    (``data_generation.py:183-185``).
    """
    k1_key, k2_key, t_key = jax.random.split(key, 3)
    lo, hi = k_range
    k1 = jax.random.uniform(k1_key, (n_samples,), dtype, lo, hi)
    k2 = jax.random.uniform(k2_key, (n_samples,), dtype, lo, hi)

    f_fine = _batched_forcing(k1, k2, n_fine, dtype)
    f_coarse = _batched_forcing(k1, k2, n_coarse, dtype)
    theta_fine, theta_coarse = _theta_fields(t_key, n_samples, n_fine, constant_theta, dtype)

    return {
        "u_fine": _solve(f_fine, theta_fine, refine_iters),
        "u_coarse": _solve(f_coarse, theta_coarse, refine_iters),
        "f_fine": f_fine,
        "f_coarse": f_coarse,
        "theta_fine": theta_fine,
        "theta_coarse": theta_coarse,
        "k1": k1,
        "k2": k2,
        "is_subdomain": jnp.zeros((n_samples,), bool),
    }


def generate_test_dataset(
    key: jax.Array,
    n_samples: int,
    k_range: Tuple[float, float],
    constant_theta: bool = True,
    dtype=jnp.float32,
    refine_iters: int = 1,
) -> Dict[str, jnp.ndarray]:
    """Evaluation sets a la ``compare_test_cases.generate_test_data``
    (``/root/reference/src/compare_test_cases.py:12-79``): standard-sample
    geometry, with theta either re-pinned to 1.0 or drawn ``U(0.5, 2)``
    pointwise (coarse = fine ``[::2, ::2]``) and the PDE re-solved."""
    return generate_standard_dataset(
        key, n_samples, k_range, dtype=dtype, constant_theta=constant_theta,
        refine_iters=refine_iters,
    )


def _extract_windows(fields: Tuple[jnp.ndarray, ...], oy: jnp.ndarray,
                     ox: jnp.ndarray, size: int) -> Tuple[jnp.ndarray, ...]:
    """Per-sample ``(size, size)`` windows at per-sample origins.

    ``dynamic_slice`` under ``vmap`` lowers to an efficient batched gather —
    no full-field one-hot matmuls and no host loop (the reference slices in
    Python per sample, ``enhanced_data_generation.py:70-83``).
    """

    def one(field, y, x):
        return jax.lax.dynamic_slice(field, (y, x), (size, size))

    return tuple(jax.vmap(one)(f, oy, ox) for f in fields)


def generate_subdomain_dataset(
    key: jax.Array,
    n_samples: int,
    k_range: Tuple[float, float] = (0.5, 12.0),
    dtype=jnp.float32,
    constant_theta: bool = True,
    n_superfine: int = 80,
    n_fine: int = 40,
    refine_iters: int = 1,
) -> Dict[str, jnp.ndarray]:
    """Batched subdomain samples (reference ``enhanced_data_generation.py:98-165``).

    One 80^2 solve per sample; the 40^2 fine fields are random contiguous
    windows of the superfine fields (origin ``randint(0, 40)`` exclusive,
    ``:135-138``) and the 20^2 coarse fields are their ``[::2, ::2]`` stride
    (``:85-96``) — so coarse and fine describe the *same* physical window,
    unlike standard samples. Published default k range (0.5, 12.0) (``:98``).
    """
    k1_key, k2_key, t_key, o_key = jax.random.split(key, 4)
    lo, hi = k_range
    k1 = jax.random.uniform(k1_key, (n_samples,), dtype, lo, hi)
    k2 = jax.random.uniform(k2_key, (n_samples,), dtype, lo, hi)

    f_sf = _batched_forcing(k1, k2, n_superfine, dtype)
    if constant_theta:
        theta_sf = jnp.ones((n_samples, n_superfine, n_superfine), dtype)
    else:
        theta_sf = jax.random.uniform(
            t_key, (n_samples, n_superfine, n_superfine), dtype, *THETA_RANGE
        )
    u_sf = _solve(f_sf, theta_sf, refine_iters)

    # origin ~ randint(0, n_superfine - n_fine): matches np.random.randint's
    # exclusive upper bound at reference :135-138.
    origins = jax.random.randint(o_key, (n_samples, 2), 0, n_superfine - n_fine)
    oy, ox = origins[:, 0], origins[:, 1]
    u_fine, f_fine, theta_fine = _extract_windows((u_sf, f_sf, theta_sf), oy, ox, n_fine)

    return {
        "u_fine": u_fine,
        "u_coarse": u_fine[:, ::2, ::2],
        "f_fine": f_fine,
        "f_coarse": f_fine[:, ::2, ::2],
        "theta_fine": theta_fine,
        "theta_coarse": theta_fine[:, ::2, ::2],
        "k1": k1,
        "k2": k2,
        "is_subdomain": jnp.ones((n_samples,), bool),
    }


def combine_datasets(
    a: Dict[str, jnp.ndarray], b: Dict[str, jnp.ndarray]
) -> Dict[str, jnp.ndarray]:
    """Concatenate two dataset dicts sample-wise (reference
    ``enhanced_data_generation.py:167-191``; the ``is_subdomain`` flags are
    already present on both sides here)."""
    if set(a) != set(b):
        raise ValueError(f"dataset key mismatch: {sorted(set(a) ^ set(b))}")
    # An empty side contributes nothing — and may carry placeholder spatial
    # dims that differ from the other side's (e.g. an empty 20->40 standard
    # part combined with 40->80 bigger-tile selffeed samples), so skip the
    # concatenate instead of shape-erroring on it.
    if int(a["u_fine"].shape[0]) == 0:
        return b
    if int(b["u_fine"].shape[0]) == 0:
        return a
    return {k: jnp.concatenate([a[k], b[k]], axis=0) for k in a}


def generate_enhanced_dataset(
    key: jax.Array,
    n_standard: int,
    n_subdomain: int,
    standard_k_range: Tuple[float, float] = (0.5, 5.0),
    subdomain_k_range: Tuple[float, float] = (0.5, 12.0),
    constant_theta: bool = True,
    dtype=jnp.float32,
    refine_iters: int = 1,
) -> Dict[str, jnp.ndarray]:
    """The published training mix: standard + subdomain samples
    (reference ``enhanced_data_generation.py:260-286``: 1000 + 1000)."""
    ks, kb = jax.random.split(key)
    parts = []
    if n_standard > 0:
        parts.append(generate_standard_dataset(
            ks, n_standard, standard_k_range, dtype=dtype,
            constant_theta=constant_theta, refine_iters=refine_iters,
        ))
    if n_subdomain > 0:
        parts.append(generate_subdomain_dataset(
            kb, n_subdomain, subdomain_k_range, dtype=dtype,
            constant_theta=constant_theta, refine_iters=refine_iters,
        ))
    if not parts:
        raise ValueError("n_standard + n_subdomain must be > 0")
    return functools.reduce(combine_datasets, parts)


def generate_mixed_dataset(
    key: jax.Array,
    n_standard: int = 1000,
    n_subdomain: int = 1000,
    theta: str = "constant",
    standard_k_range: Tuple[float, float] = (0.5, 5.0),
    subdomain_k_range: Tuple[float, float] = (0.5, 12.0),
    n_cascade_scenes: int = 0,
    cascade_tiles_per_level: int = 8,
    cascade_k_range: Tuple[float, float] = (0.5, 12.0),
    cascade_finest: int = 640,
    cascade_coarsest: int = 40,
    cascade_tile_size: int = 20,
    dtype=jnp.float32,
) -> Dict[str, jnp.ndarray]:
    """One-call training-set recipe (shared by the generate_data and train
    CLIs).

    ``theta``: ``"constant"`` = reference parity; ``"varying"`` = pointwise
    U(0.5, 2); ``"mixed"`` = both strata concatenated. Generating on-device in
    the *training* process matters operationally: pushing a saved ``.npz``
    host->device over a remote-TPU tunnel measured ~275 s for a 2000-sample
    set, while regenerating it on-chip takes ~2 s at 6M solves/sec — so
    training jobs prefer a (seeded, reproducible) generate step over a load.
    """
    if (cascade_tile_size != 20 and n_cascade_scenes > 0
            and (n_standard > 0 or n_subdomain > 0)):
        raise ValueError(
            "cascade_tile_size != 20 cannot be mixed with standard/subdomain "
            "samples (their 20^2->40^2 geometry has different sample shapes); "
            "set n_standard = n_subdomain = 0 for a bigger-window expert")
    if theta not in ("mixed", "constant", "varying"):
        raise ValueError(f"unknown theta mode: {theta!r}")
    if n_standard + n_subdomain == 0:
        # pure-cascade (or, via the train CLI, pure-selffeed) recipe — the
        # bigger-tile experts (tile_size != 20) can't mix in 20->40 geometry
        dataset = None
    elif theta == "mixed":
        k1, k2 = jax.random.split(key)
        dataset = combine_datasets(
            generate_enhanced_dataset(
                k1, n_standard, n_subdomain, standard_k_range, subdomain_k_range,
                constant_theta=True, dtype=dtype,
            ),
            generate_enhanced_dataset(
                k2, n_standard, n_subdomain, standard_k_range, subdomain_k_range,
                constant_theta=False, dtype=dtype,
            ),
        )
    else:
        dataset = generate_enhanced_dataset(
            key, n_standard, n_subdomain, standard_k_range, subdomain_k_range,
            constant_theta=theta == "constant", dtype=dtype,
        )
    if n_cascade_scenes > 0:
        cascade = generate_cascade_dataset(
            jax.random.fold_in(key, 99), n_cascade_scenes,
            tiles_per_level=cascade_tiles_per_level, k_range=cascade_k_range,
            finest=cascade_finest, coarsest=cascade_coarsest,
            constant_theta=theta == "constant", dtype=dtype,
            tile_size=cascade_tile_size,
        )
        dataset = cascade if dataset is None else combine_datasets(dataset, cascade)
    if dataset is None:
        raise ValueError(
            "empty dataset recipe: set n_standard, n_subdomain or "
            "n_cascade_scenes > 0 (the train CLI additionally allows a "
            "pure --gen_selffeed_scenes recipe)")
    return dataset


# ---------------------------------------------------------------------------
# Cascade-consistent training tiles (TPU-build extension)
# ---------------------------------------------------------------------------


def _cascade_scene_fields(
    key: jax.Array,
    n_scenes: int,
    finest: int,
    k_range: Tuple[float, float],
    constant_theta: bool,
    dtype,
    refine_iters: int,
    coarsest: int = 40,
):
    """Batched multi-resolution scenes: exact solves at coarsest, ..., finest
    of the same strided f/theta fields (the ``solve_multi_resolution`` recipe,
    reference ``resolution_comparison.py:13-78``, with a scene batch axis).
    ``coarsest > 40`` restricts the hierarchy to the deeper levels — the
    level-specialist training recipe (e.g. coarsest=80, finest=160 yields only
    the 80->160 level's tile distribution)."""
    k1_key, k2_key, t_key = jax.random.split(key, 3)
    lo, hi = k_range
    k1 = jax.random.uniform(k1_key, (n_scenes,), dtype, lo, hi)
    k2 = jax.random.uniform(k2_key, (n_scenes,), dtype, lo, hi)

    f_finest = _batched_forcing(k1, k2, finest, dtype)
    if constant_theta:
        theta_finest = jnp.ones((n_scenes, finest, finest), dtype)
    else:
        theta_finest = jax.random.uniform(
            t_key, (n_scenes, finest, finest), dtype, *THETA_RANGE
        )

    resolutions = []
    r = coarsest
    while r <= finest:
        resolutions.append(r)
        r *= 2

    fields = {"f": {}, "theta": {}, "u": {}}
    for res in resolutions:
        step = finest // res
        f_r = f_finest[:, ::step, ::step]
        t_r = theta_finest[:, ::step, ::step]
        fields["f"][res] = f_r
        fields["theta"][res] = t_r
        fields["u"][res] = _solve(f_r, t_r, refine_iters)
    return fields, resolutions, k1, k2


def _tile_pairs_from_levels(
    key: jax.Array,
    fields_coarse: Dict[int, jnp.ndarray],  # u at each coarse res (input source)
    fields_exact: Dict[int, jnp.ndarray],   # exact u at each res (target source)
    f: Dict[int, jnp.ndarray],
    theta: Dict[int, jnp.ndarray],
    resolutions,
    tiles_per_level: int,
    k1: jnp.ndarray,
    k2: jnp.ndarray,
    coarse_tile: int = 20,
) -> Dict[str, jnp.ndarray]:
    """Sample matched (20^2 @ r, 40^2 @ 2r) window pairs per level per scene.

    The coarse grid at resolution r is positionally the ``[::2, ::2]`` subset
    of the 2r grid (both are strides of the same finest grid), so a coarse
    window at origin (oy, ox) corresponds exactly to the fine window at
    (2 oy, 2 ox) — f/theta coarse tiles are *identical arrays* to the strided
    fine tiles, while u_coarse comes from the independent r-grid solve (or a
    model's own prediction, for self-feeding data).
    """
    fine_tile = 2 * coarse_tile
    n_scenes = k1.shape[0]
    out = {k: [] for k in (
        "u_fine", "u_coarse", "f_fine", "f_coarse", "theta_fine", "theta_coarse",
        "k1", "k2",
    )}
    for i, res in enumerate(resolutions[:-1]):
        next_res = resolutions[i + 1]
        key, o_key = jax.random.split(key)
        # origin on the r grid: window of coarse_tile needs oy + 20 <= res
        origins = jax.random.randint(
            o_key, (n_scenes, tiles_per_level, 2), 0, res - coarse_tile + 1
        )

        def windows(field_r, field_2r, origins):
            def per_scene(fr, f2r, org):
                def per_tile(o):
                    c = jax.lax.dynamic_slice(
                        fr, (o[0], o[1]), (coarse_tile, coarse_tile))
                    fi = jax.lax.dynamic_slice(
                        f2r, (2 * o[0], 2 * o[1]), (fine_tile, fine_tile))
                    return c, fi

                return jax.vmap(per_tile)(org)

            return jax.vmap(per_scene)(field_r, field_2r, origins)

        u_c, u_f = windows(fields_coarse[res], fields_exact[next_res], origins)
        f_c, f_f = windows(f[res], f[next_res], origins)
        t_c, t_f = windows(theta[res], theta[next_res], origins)
        flat = lambda x: x.reshape((-1,) + x.shape[2:])
        out["u_coarse"].append(flat(u_c))
        out["u_fine"].append(flat(u_f))
        out["f_coarse"].append(flat(f_c))
        out["f_fine"].append(flat(f_f))
        out["theta_coarse"].append(flat(t_c))
        out["theta_fine"].append(flat(t_f))
        out["k1"].append(jnp.repeat(k1, tiles_per_level))
        out["k2"].append(jnp.repeat(k2, tiles_per_level))

    ds = {k: jnp.concatenate(v, axis=0) for k, v in out.items()}
    n = ds["u_fine"].shape[0]
    ds["is_subdomain"] = jnp.ones((n,), bool)
    return ds


def generate_cascade_dataset(
    key: jax.Array,
    n_scenes: int,
    tiles_per_level: int = 8,
    k_range: Tuple[float, float] = (0.5, 12.0),
    finest: int = 640,
    coarsest: int = 40,
    constant_theta: bool = True,
    dtype=jnp.float32,
    refine_iters: int = 1,
    tile_size: int = 20,
) -> Dict[str, jnp.ndarray]:
    """Cascade-consistent training tiles (TPU-build extension).

    For every resolution pair (r -> 2r) of a multi-resolution scene, sample
    ``tiles_per_level`` window pairs whose coarse input is a window of the
    *independent r-grid solve* — exactly what the inference cascade feeds the
    model at that level (modulo the model's own prediction error; see
    :func:`selffeed_cascade_dataset` for that part). The reference trains only
    on 20->40 geometry (SURVEY.md C3) and relies on distributional luck at
    80+; these tiles make the deeper levels in-distribution.

    ``tile_size`` is the coarse window size (fine windows are 2x): 20 matches
    the reference tiling; 40 trains a bigger-context expert for cascade
    levels run with a 40-point tile schedule (``_level_tile``).
    """
    scene_key, tile_key = jax.random.split(key)
    fields, resolutions, k1, k2 = _cascade_scene_fields(
        scene_key, n_scenes, finest, k_range, constant_theta, dtype, refine_iters,
        coarsest=coarsest,
    )
    return _tile_pairs_from_levels(
        tile_key, fields["u"], fields["u"], fields["f"], fields["theta"],
        resolutions, tiles_per_level, k1, k2, coarse_tile=tile_size,
    )


def selffeed_cascade_dataset(
    model,
    variables: Dict,
    key: jax.Array,
    n_scenes: int,
    tiles_per_level: int = 8,
    k_range: Tuple[float, float] = (0.5, 12.0),
    finest: int = 640,
    constant_theta: bool = False,
    stats_mode: str = "scene",
    dtype=jnp.float32,
    refine_iters: int = 1,
    amp_levels=None,
    harvest_from: int | None = None,
    overlap=False,
    tile_size: int = 20,
    teacher_tile=20,
    scene_chunk: int | None = None,
) -> Dict[str, jnp.ndarray]:
    """Self-feeding cascade tiles: coarse inputs are the given model's OWN
    cascade predictions (scheduled-sampling analogue).

    At inference the cascade feeds each level the previous level's *prediction*
    (``resolution_comparison.py:226``), but normally-generated training data
    only ever shows exact solves. Here we run the model's full cascade over
    fresh scenes and harvest (prediction @ r, exact @ 2r) window pairs, so a
    fine-tuned model learns to correct its own error distribution at depth.
    Targets stay exact; only inputs are self-fed.

    ``variables`` may be a per-level expert tuple and ``amp_levels`` the
    per-level (scalar or modal) corrections — pass the FROZEN deployment
    cascade here to train a deeper-level specialist on exactly the corrected
    prediction distribution it will see at inference (the round-3 matched-
    level training recipe); ``overlap`` (bool or per-level schedule) makes the
    teacher tile with feathered overlap, matching an overlap deployment.
    ``harvest_from`` restricts harvesting to pairs
    whose coarse resolution is >= that value (e.g. ``finest=160,
    harvest_from=80`` yields only 80->160 tiles with predicted-80 inputs).
    ``tile_size`` is the HARVESTED coarse window size (20 = reference tiling;
    40 trains a bigger-context expert) while ``teacher_tile`` is the frozen
    teacher cascade's own tile schedule (int or per-level tuple) — the two
    are independent: a 40-window student can learn from a 20-tiled teacher.

    ``scene_chunk`` bounds device memory: the scene batch is generated in
    independent chunks of that many scenes (each chunk is one XLA program —
    all chunks share one compilation since shapes are static) and the tile
    datasets are concatenated. The peak live footprint of scene solves +
    teacher cascade then scales with the chunk, not with ``n_scenes`` — this
    is what keeps big-window deep-level datagen (fine windows at 320²+) under
    the 16 GB HBM ceiling documented in ``reports/RECIPES.md``.
    """
    if scene_chunk is not None and scene_chunk < n_scenes:
        if n_scenes % scene_chunk:
            raise ValueError(
                f"n_scenes={n_scenes} must be a multiple of "
                f"scene_chunk={scene_chunk}")
        parts = []
        for chunk_key in jax.random.split(key, n_scenes // scene_chunk):
            parts.append(selffeed_cascade_dataset(
                model, variables, chunk_key, scene_chunk,
                tiles_per_level=tiles_per_level, k_range=k_range,
                finest=finest, constant_theta=constant_theta,
                stats_mode=stats_mode, dtype=dtype, refine_iters=refine_iters,
                amp_levels=amp_levels, harvest_from=harvest_from,
                overlap=overlap, tile_size=tile_size,
                teacher_tile=teacher_tile))
        return {k: jnp.concatenate([p[k] for p in parts], axis=0)
                for k in parts[0]}

    from superresolution_for_pdes_tpu.cascade.upscale import ml_cascade

    scene_key, tile_key = jax.random.split(key)
    fields, resolutions, k1, k2 = _cascade_scene_fields(
        scene_key, n_scenes, finest, k_range, constant_theta, dtype, refine_iters
    )
    scene = {
        # oracle stats need the truth fields at every level; honest modes only
        # ever read the cascade's start field.
        "u": fields["u"] if stats_mode == "oracle"
        else {resolutions[0]: fields["u"][resolutions[0]]},
        "f": fields["f"],
        "theta": fields["theta"],
    }
    # the deepest coarse INPUT needed is one level above the finest target —
    # never run the teacher cascade past it (and not at all for a single pair,
    # whose coarse input is the exact start-resolution solve)
    u_inputs = {resolutions[0]: fields["u"][resolutions[0]]}
    if resolutions[-2] > resolutions[0]:
        preds = ml_cascade(model, variables, scene, resolutions[-2],
                           stats_mode=stats_mode, amp_levels=amp_levels,
                           overlap=tuple(overlap) if isinstance(overlap, list)
                           else overlap,
                           coarse_tile=tuple(teacher_tile)
                           if isinstance(teacher_tile, list) else teacher_tile)
        for res in resolutions[1:-1]:
            u_inputs[res] = preds[res]
    if harvest_from is not None:
        harvested = [r for r in resolutions if r >= harvest_from]
        if len(harvested) < 2:
            raise ValueError(
                f"harvest_from={harvest_from} leaves no (coarse, fine) pair "
                f"in resolutions {resolutions}")
        resolutions = harvested
    return _tile_pairs_from_levels(
        tile_key, u_inputs, fields["u"], fields["f"], fields["theta"],
        resolutions, tiles_per_level, k1, k2, coarse_tile=tile_size,
    )
