"""Batched, matrix-free 2-D Poisson solvers for ``diag(theta) L u = f``.

TPU-native replacements for the reference's per-sample scipy SuperLU direct
solves (``/root/reference/src/data_generation.py:102``,
``src/enhanced_data_generation.py:66``):

* :mod:`~superresolution_for_pdes_tpu.solver.dst` — exact fast-diagonalization
  direct solver (sine-transform matmuls on the MXU); the datagen hot path.
* :mod:`~superresolution_for_pdes_tpu.solver.cg` — batched conjugate gradients
  on the (symmetrized) system.
* :mod:`~superresolution_for_pdes_tpu.solver.multigrid` — geometric V-cycle
  with weighted-Jacobi smoothing.
* :mod:`~superresolution_for_pdes_tpu.solver.api` — ``solve_poisson`` facade.

Key identity exploited everywhere: the reference operator is
``diag(theta) @ L`` (pointwise row scaling, ``data_generation.py:99``), so the
system ``diag(theta) L u = f`` is exactly ``L u = f / theta`` with ``L`` the
symmetric negative-definite truncated 5-point Laplacian. The variable-theta
problem therefore reduces to a constant-coefficient solve with a scaled RHS.
"""

from superresolution_for_pdes_tpu.solver.api import solve_poisson  # noqa: F401
from superresolution_for_pdes_tpu.solver.dst import solve_poisson_dst  # noqa: F401
from superresolution_for_pdes_tpu.solver.cg import solve_poisson_cg  # noqa: F401
from superresolution_for_pdes_tpu.solver.multigrid import solve_poisson_mg  # noqa: F401
