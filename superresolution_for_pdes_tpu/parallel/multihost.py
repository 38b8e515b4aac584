"""Multi-host (DCN) bootstrap.

The reference is strictly single-process (SURVEY.md section 2: no
``torch.distributed`` anywhere). The TPU-native multi-host story needs no
custom transport either: every host runs the *same* program, and a single
``jax.distributed.initialize`` call wires the hosts into one JAX runtime —
``jax.devices()`` then spans all slices, the standard ``Mesh``/GSPMD code in
:mod:`~superresolution_for_pdes_tpu.parallel.mesh` and
:mod:`~superresolution_for_pdes_tpu.train.loop` works unchanged, and XLA
routes collectives over ICI within a slice and DCN across slices.

On Cloud TPU pods the coordinator address / process count / process id are
discovered from the environment automatically, so :func:`initialize_multihost`
with no arguments is the whole bootstrap.
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> dict:
    """Join this process to the multi-host JAX runtime and report topology.

    A no-op (with a warning-free return) when the runtime is already
    initialized — safe to call unconditionally at CLI startup via
    ``--multihost``. Returns ``{process_index, process_count, local_devices,
    global_devices}`` for logging.
    """
    already = jax.process_count() > 1
    if not already:
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        except (RuntimeError, ValueError) as e:
            # Single-process environments (no coordinator discoverable) fall
            # back to the local runtime — the mesh code downstream is
            # identical, just smaller.
            if "already initialized" not in str(e) and num_processes not in (None, 1):
                raise
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
