"""superresolution_for_pdes_tpu — TPU-native physics-informed super-resolution for PDEs.

A brand-new JAX/XLA/Pallas/pjit framework with the capabilities of the reference
``tahmidawal/Superresolution_for_PDEs`` (PyTorch/scipy, single-device):

* batched, matrix-free 2-D Poisson solvers (fast-diagonalization via sine
  transforms on the MXU, CG, geometric multigrid, Pallas stencil kernels)
  replacing per-sample ``scipy.sparse.linalg.spsolve``
  (reference: ``src/data_generation.py:79-104``),
* fully on-device dataset generation (standard + subdomain samples,
  reference: ``src/data_generation.py:106-159``,
  ``src/enhanced_data_generation.py:98-165``),
* a Flax attention U-Net (dilated bridge, attention gates, multi-scale head,
  residual coarse connection; reference: ``src/models.py:26-130``),
* jit/pjit training loops with AdamW, plateau LR scheduling, early stopping and
  Orbax checkpointing (reference: ``src/train.py``, ``src/train_enhanced.py``),
* a vectorized multi-level subdomain cascade (40->80->160->320->640) sharded
  over a device mesh (reference: ``src/resolution_comparison.py:183-229``),
* evaluation harnesses (single-level, out-of-sample, generalization grid,
  resolution sweep, statistical timing suite) and the physics-informed
  PDE-residual loss the reference promised but never implemented
  (reference: ``README.md:152``).
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("JAX_PLATFORMS") == "cpu":
    # Some PJRT plugins (e.g. remote-TPU tunnels) register regardless of the
    # JAX_PLATFORMS environment variable and will dial the (single-holder)
    # device at import time; pin the platform through the config API so
    # CPU-only subprocesses (tests, tooling) never contend for the chip.
    # Only the CPU case is pinned: plugin platform names (e.g. 'axon'
    # registering as 'tpu') must stay under JAX's own resolution.
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

from superresolution_for_pdes_tpu.ops import grid, resize, stencil  # noqa: F401
from superresolution_for_pdes_tpu.solver.api import solve_poisson  # noqa: F401
