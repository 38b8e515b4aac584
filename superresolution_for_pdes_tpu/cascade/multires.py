"""Multi-resolution ground-truth generation for cascade evaluation.

Replicates ``solve_multi_resolution`` (reference
``/root/reference/src/resolution_comparison.py:13-78``; timed variant
``resolution_comparison_statistical.py:25-96``): build f and theta on the
finest grid (640^2), stride-downsample ``[::step, ::step]`` to every coarser
resolution, and direct-solve the reference system at each resolution.

Reference quirks preserved: theta ~ U(0.5, 2.0) *here* even though training
used theta == 1 (``resolution_comparison.py:37`` vs ``data_generation.py:133``)
— the published cascade numbers include that distribution shift; wave numbers
k ~ U(10, 11) (``:27-28``; the statistical harness uses U(8, 12),
``resolution_comparison_statistical.py:40-41``).

TPU-first: the 640^2 direct solve is the fast-diagonalization solver (one
sine-basis matmul pair; the reference pays a 409,600-unknown SuperLU
factorization on the host). All resolutions solve on-device; per-resolution
wall-clock timings are measured with ``block_until_ready`` for the statistical
harness.
"""

from __future__ import annotations

import time
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from superresolution_for_pdes_tpu.ops.grid import make_grid
from superresolution_for_pdes_tpu.solver.dst import solve_poisson_dst


def solve_multi_resolution(
    key: jax.Array,
    n_coarse: int = 40,
    resolutions: Sequence[int] = (80, 160, 320, 640),
    k_range: Tuple[float, float] = (10.0, 11.0),
    theta_range: Tuple[float, float] = (0.5, 2.0),
    dtype=jnp.float32,
    refine_iters: int = 1,
    time_solves: bool = False,
) -> Dict:
    """Ground truth at ``[n_coarse] + resolutions``; returns the reference's
    data-dict schema ``{k1, k2, f: {res}, theta: {res}, u: {res}}`` plus
    optional per-resolution solve times."""
    k1_key, k2_key, theta_key = jax.random.split(key, 3)
    lo, hi = k_range
    k1 = jax.random.uniform(k1_key, (), dtype, lo, hi)
    k2 = jax.random.uniform(k2_key, (), dtype, lo, hi)

    n_finest = max(resolutions)
    g = make_grid(n_finest, dtype)
    X, Y = jnp.meshgrid(g, g, indexing="xy")
    f_finest = jnp.sin(2.0 * jnp.pi * k1 * X) * jnp.sin(2.0 * jnp.pi * k2 * Y)
    theta_finest = jax.random.uniform(
        theta_key, (n_finest, n_finest), dtype, theta_range[0], theta_range[1]
    )

    data: Dict = {"k1": float(k1), "k2": float(k2), "f": {}, "theta": {}, "u": {}}
    solve_times: Dict[int, float] = {}
    all_res: List[int] = [n_coarse] + list(resolutions)
    solve = jax.jit(
        lambda f, t: solve_poisson_dst(f, t, refine_iters=refine_iters)
    )
    for res in all_res:
        if res == n_finest:
            f_res, theta_res = f_finest, theta_finest
        else:
            step = n_finest // res
            f_res = f_finest[::step, ::step]
            theta_res = theta_finest[::step, ::step]
        data["f"][res] = f_res
        data["theta"][res] = theta_res
        if time_solves:
            solve(f_res, theta_res).block_until_ready()  # compile outside timing
            t0 = time.perf_counter()
            u = solve(f_res, theta_res)
            u.block_until_ready()
            solve_times[res] = time.perf_counter() - t0
        else:
            u = solve(f_res, theta_res)
        data["u"][res] = u
    if time_solves:
        data["solve_times"] = solve_times
    return data


def solve_multi_resolution_batch(
    key: jax.Array,
    n_scenes: int,
    n_coarse: int = 40,
    resolutions: Sequence[int] = (80, 160, 320, 640),
    k_range: Tuple[float, float] = (8.0, 12.0),
    theta_range: Tuple[float, float] = (0.5, 2.0),
    dtype=jnp.float32,
    refine_iters: int = 1,
    time_solves: bool = False,
) -> Dict:
    """Batched scenes: every field gains a leading ``(n_scenes,)`` axis.

    The statistical harness's scene loop (reference
    ``resolution_comparison_statistical.py:501-540`` runs N fully serial
    examples) becomes one batched program per resolution — the per-scene
    direct-solve cost is the batched solve time divided by N.
    """
    keys = jax.random.split(key, n_scenes)
    k1_key, k2_key, theta_key = jax.vmap(lambda k: jax.random.split(k, 3))(keys).swapaxes(0, 1)
    lo, hi = k_range
    k1 = jax.vmap(lambda k: jax.random.uniform(k, (), dtype, lo, hi))(k1_key)
    k2 = jax.vmap(lambda k: jax.random.uniform(k, (), dtype, lo, hi))(k2_key)

    n_finest = max(resolutions)
    g = make_grid(n_finest, dtype)
    X, Y = jnp.meshgrid(g, g, indexing="xy")
    f_finest = jnp.sin(2.0 * jnp.pi * k1[:, None, None] * X) * jnp.sin(
        2.0 * jnp.pi * k2[:, None, None] * Y
    )
    theta_finest = jax.vmap(
        lambda k: jax.random.uniform(
            k, (n_finest, n_finest), dtype, theta_range[0], theta_range[1]
        )
    )(theta_key)

    data: Dict = {
        "k1": jax.device_get(k1), "k2": jax.device_get(k2),
        "f": {}, "theta": {}, "u": {},
    }
    solve_times: Dict[int, float] = {}
    solve = jax.jit(lambda f, t: solve_poisson_dst(f, t, refine_iters=refine_iters))
    for res in [n_coarse] + list(resolutions):
        step = n_finest // res
        f_res = f_finest[:, ::step, ::step]
        theta_res = theta_finest[:, ::step, ::step]
        data["f"][res] = f_res
        data["theta"][res] = theta_res
        if time_solves:
            # Warm (compile) call first; then timed via a forced scalar fetch
            # (block_until_ready over remote-TPU tunnels can return early).
            float(jnp.sum(solve(f_res, theta_res)))
            t0 = time.perf_counter()
            u = solve(f_res, theta_res)
            float(jnp.sum(u))
            solve_times[res] = (time.perf_counter() - t0) / n_scenes
        else:
            u = solve(f_res, theta_res)
        data["u"][res] = u
    if time_solves:
        data["solve_times"] = solve_times
    return data
