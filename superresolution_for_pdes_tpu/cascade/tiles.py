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
