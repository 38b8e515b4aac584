"""Multi-level subdomain cascade: the flagship large-scale inference path."""

from superresolution_for_pdes_tpu.cascade.tiles import split_tiles, stitch_tiles  # noqa: F401
from superresolution_for_pdes_tpu.cascade.upscale import (  # noqa: F401
    interpolation_upscale,
    ml_multi_level_upscale,
    multi_level_interpolation_upscale,
    upscale_tile_batch,
)
from superresolution_for_pdes_tpu.cascade.multires import solve_multi_resolution  # noqa: F401
