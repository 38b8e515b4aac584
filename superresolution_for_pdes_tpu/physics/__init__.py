"""Physics-informed losses (the reference promised these but never shipped them)."""

from superresolution_for_pdes_tpu.physics.loss import pde_residual_loss  # noqa: F401
