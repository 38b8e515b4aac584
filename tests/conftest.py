"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware via
``--xla_force_host_platform_device_count=8`` (the TPU answer to "test
multi-node without a cluster"; see SURVEY.md section 4). float64 is enabled so
solver parity against scipy can be asserted at <= 1e-6; library code uses
explicit dtypes throughout, so this only affects test-side literals.
"""

import os

# Force CPU even if the host environment pins JAX_PLATFORMS to a TPU plugin
# (e.g. the axon tunnel): the test suite must run hermetically on a virtual
# 8-device host mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


def build_reference_laplacian(n: int):
    """Independently assemble the reference's sparse Laplacian from its
    documented formula (SURVEY.md C1; /root/reference/src/data_generation.py:35-58)
    using scipy, as the parity oracle."""
    from scipy.sparse import diags

    h = 1.0 / (n - 1)
    n2 = n * n
    main_diag = -4 * np.ones(n2)
    off_diag = np.ones(n2 - 1)
    off_diag[np.arange(n - 1, n2 - 1, n)] = 0
    L = diags(
        [main_diag, off_diag, off_diag, np.ones(n * (n - 1)), np.ones(n * (n - 1))],
        [0, 1, -1, n, -n],
        shape=(n2, n2),
    )
    return L / (h * h)


def scipy_solve_reference(f: np.ndarray, theta: np.ndarray) -> np.ndarray:
    """The reference solve path: spsolve(diags(theta) @ L, f)
    (/root/reference/src/data_generation.py:99-102)."""
    from scipy.sparse import diags
    from scipy.sparse.linalg import spsolve

    n = f.shape[-1]
    L = build_reference_laplacian(n)
    L_theta = diags(theta.reshape(-1)) @ L
    return spsolve(L_theta.tocsr(), f.reshape(-1)).reshape(n, n)


@pytest.fixture(scope="session")
def reference_laplacian():
    return build_reference_laplacian


@pytest.fixture(scope="session")
def reference_solve():
    return scipy_solve_reference
