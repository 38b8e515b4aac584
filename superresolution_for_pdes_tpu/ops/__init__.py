"""Core array ops: grids/forcing terms, 5-point stencils, align-corners resizing."""

from superresolution_for_pdes_tpu.ops.grid import (  # noqa: F401
    forcing_term,
    make_grid,
    make_meshgrid,
)
from superresolution_for_pdes_tpu.ops.stencil import (  # noqa: F401
    apply_laplacian,
    apply_operator,
    residual,
)
from superresolution_for_pdes_tpu.ops.resize import (  # noqa: F401
    resize_align_corners,
    resize_matrix,
    upsample2x,
)
