"""Orbax checkpointing with full train-state restore.

The reference only *saves* (``torch.save`` of model/optimizer/scheduler state,
``/root/reference/src/train.py:107-115``); no resume path exists — loads
restore the model weights for eval only (``compare_methods.py:11-17``).
Here checkpoints round-trip the complete training state (params, batch stats,
optimizer state, scheduler/early-stop state, epoch and losses), enabling
preemption-safe resume — table stakes for TPU pools.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict

import jax
import orbax.checkpoint as ocp


def save_checkpoint(path: str | Path, payload: Dict[str, Any]) -> None:
    """Atomically save a pytree checkpoint (overwrites existing)."""
    path = Path(path).absolute()
    if path.exists():
        import shutil

        shutil.rmtree(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(payload))


def restore_checkpoint(path: str | Path, like: Dict[str, Any] | None = None) -> Dict[str, Any]:
    """Restore a pytree checkpoint; ``like`` provides structure/dtypes."""
    path = Path(path).absolute()
    with ocp.PyTreeCheckpointer() as ckptr:
        if like is not None:
            restored = ckptr.restore(path, item=jax.device_get(like))
        else:
            restored = ckptr.restore(path)
    return restored


def load_model_variables(run_dir: str | Path, which: str = "best_model") -> Dict[str, Any]:
    """Load ``{params, batch_stats}`` from a run directory for evaluation.

    Mirrors the reference's ``load_model`` (``compare_methods.py:11-17``),
    which restores only the model weights. Also accepts a direct checkpoint
    path. Falls back to torch ``.pth`` import for reference checkpoints.
    """
    p = Path(run_dir)
    if p.suffix == ".pth":
        from superresolution_for_pdes_tpu.models.torch_import import load_torch_checkpoint

        return load_torch_checkpoint(p)
    ckpt_path = p if (p / "_CHECKPOINT_METADATA").exists() or (p / "manifest.ocdbt").exists() else p / which
    restored = restore_checkpoint(ckpt_path)
    return {"params": restored["params"], "batch_stats": restored["batch_stats"]}


# Latest-run discovery lives in utils/runs.py (find_latest_run_dir) — the
# single implementation of the reference's idiom (compare_methods.py:130-142).
