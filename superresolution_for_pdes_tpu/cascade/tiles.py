"""Non-overlapping tiling of 2-D fields as pure reshape/transpose.

The reference splits/stitches with nested Python loops and numpy copies
(``/root/reference/src/resolution_comparison.py:123-158``, duplicated in
``src/subdomain_upscaling.py:62-102``) and then feeds tiles through the model
*one at a time* (``resolution_comparison.py:211-223`` — up to 1,024 batch-1
model calls at 640^2). Here tiling is a zero-copy layout change and the whole
tile set is one model batch, shardable over the device mesh.

Seam behavior is identical to the reference: tiles are processed independently
with no halo/blending — boundary consistency comes from the shared f/theta
context and the residual connection.
"""

from __future__ import annotations

import jax.numpy as jnp


def split_tiles(field: jnp.ndarray, tile: int) -> jnp.ndarray:
    """(..., H, W) -> (..., ny*nx, tile, tile), row-major tile order.

    Tile [i][j] covers rows ``i*tile:(i+1)*tile`` and cols
    ``j*tile:(j+1)*tile``, matching ``split_into_subdomains``
    (reference ``resolution_comparison.py:123-139``).
    """
    *lead, H, W = field.shape
    ny, nx = H // tile, W // tile
    if ny * tile != H or nx * tile != W:
        raise ValueError(f"field {H}x{W} not divisible into {tile}x{tile} tiles")
    t = field.reshape(*lead, ny, tile, nx, tile)
    t = jnp.swapaxes(t, -3, -2)  # (..., ny, nx, tile, tile)
    return t.reshape(*lead, ny * nx, tile, tile)


def _window_origins(size: int, tile: int, stride: int):
    import numpy as np

    if (size - tile) % stride != 0:
        raise ValueError(f"(size-tile)={size - tile} not divisible by stride {stride}")
    return np.arange(0, size - tile + 1, stride)


def split_tiles_overlapping(field: jnp.ndarray, tile: int, stride: int) -> jnp.ndarray:
    """(..., H, W) -> (..., ny*nx, tile, tile) with overlapping windows at the
    given stride (one gather — no Python window loop).

    An improvement over the reference's non-overlapping tiling: overlapping
    windows + feathered blending remove the tile-seam artifacts visible in the
    reference's committed ML outputs (cross patterns at x,y = multiples of the
    tile size in ``comparison_enhanced_80x80.png``).
    """
    import numpy as np

    *_, H, W = field.shape
    oy = _window_origins(H, tile, stride)
    ox = _window_origins(W, tile, stride)
    iy = jnp.asarray(oy[:, None] + np.arange(tile)[None, :])  # (ny, tile)
    ix = jnp.asarray(ox[:, None] + np.arange(tile)[None, :])  # (nx, tile)
    tiles = field[..., iy[:, None, :, None], ix[None, :, None, :]]  # (..., ny, nx, t, t)
    ny, nx = len(oy), len(ox)
    return tiles.reshape(*field.shape[:-2], ny * nx, tile, tile)


def blend_weights(tile: int, dtype=jnp.float32) -> jnp.ndarray:
    """Separable tent (feathering) window, strictly positive."""
    import numpy as np

    ramp = np.minimum(np.arange(tile) + 1, tile - np.arange(tile)).astype(np.float64)
    w = np.outer(ramp, ramp)
    return jnp.asarray(w / w.max(), dtype=dtype)


def stitch_tiles_overlapping(
    tiles: jnp.ndarray, out_size: int, stride: int
) -> jnp.ndarray:
    """Weighted overlap-add of (..., ny*nx, tile, tile) windows back to
    (..., out_size, out_size); the exact inverse of
    :func:`split_tiles_overlapping` for consistent tiles, and a feathered
    average where overlapping predictions disagree."""
    import numpy as np

    tile = tiles.shape[-1]
    oy = _window_origins(out_size, tile, stride)
    ny = len(oy)
    nx = tiles.shape[-3] // ny
    iy = jnp.asarray(oy[:, None] + np.arange(tile)[None, :])
    ix = jnp.asarray(_window_origins(out_size, tile, stride)[:, None] + np.arange(tile)[None, :])
    w = blend_weights(tile, tiles.dtype)
    t = tiles.reshape(*tiles.shape[:-3], ny, nx, tile, tile) * w
    lead = tiles.shape[:-3]
    acc = jnp.zeros(lead + (out_size, out_size), tiles.dtype)
    acc = acc.at[..., iy[:, None, :, None], ix[None, :, None, :]].add(t)
    wsum = jnp.zeros((out_size, out_size), tiles.dtype)
    wsum = wsum.at[iy[:, None, :, None], ix[None, :, None, :]].add(
        jnp.broadcast_to(w, (ny, nx, tile, tile))
    )
    return acc / wsum


def stitch_tiles(tiles: jnp.ndarray, ny: int | None = None) -> jnp.ndarray:
    """(..., ny*nx, tile, tile) -> (..., ny*tile, nx*tile); exact inverse of
    :func:`split_tiles` (reference ``stitch_subdomains``,
    ``resolution_comparison.py:141-158``)."""
    *lead, n_tiles, tile, tile2 = tiles.shape
    if ny is None:
        ny = int(round(n_tiles**0.5))
    nx = n_tiles // ny
    if ny * nx != n_tiles:
        raise ValueError(f"cannot stitch {n_tiles} tiles into {ny} rows")
    t = tiles.reshape(*lead, ny, nx, tile, tile2)
    t = jnp.swapaxes(t, -3, -2)  # (..., ny, tile, nx, tile)
    return t.reshape(*lead, ny * tile, nx * tile2)
