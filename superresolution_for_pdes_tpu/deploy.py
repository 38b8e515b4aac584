"""Deployment bundles: the champion cascade as ONE self-contained artifact.

The reference has no deployment story — reproducing its results means
rediscovering which checkpoint, normalization and tiling flags go together
(``/root/reference/src/resolution_comparison.py:371-437`` re-asks for all of
them every run). A bundle freezes the full inference configuration of this
framework's richer model space — per-level expert checkpoints, the modal
band-gain corrections (honest, pre-calibrated), the per-level overlap
schedule, stats mode — into one directory:

    bundle/
      manifest.json      # schedule, stats mode, level -> variables dir
      level0/ …          # per-level variables (orbax; deduplicated)
      amp.npz            # per-level modal gain arrays (optional)

``save_bundle`` writes it from live objects, ``load_bundle`` restores
``(model, variables, amp_levels, config)``, and ``run_bundle`` upscales a
scene dict with zero further decisions — the programmatic core of the
``upscale`` CLI.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from superresolution_for_pdes_tpu.models import build_model
from superresolution_for_pdes_tpu.train.checkpoint import (
    load_model_variables,
    save_checkpoint,
)

_MANIFEST = "manifest.json"


def save_bundle(
    path: str | Path,
    model_config: Dict,
    variables,
    amp_levels=None,
    overlap=False,
    stats_mode: str = "tile",
    extra: Optional[Dict] = None,
    coarse_tile=20,
) -> Path:
    """Write a deployment bundle. ``variables`` may be one variables pytree or
    the per-level tuple; duplicate levels (same object) are stored once."""
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    seq = list(variables) if isinstance(variables, (list, tuple)) else [variables]
    files, seen = [], {}
    for v in seq:
        key = id(v)
        if key not in seen:
            seen[key] = f"level{len(seen)}"
            save_checkpoint(path / seen[key],
                            {"params": v["params"], "batch_stats": v["batch_stats"]})
        files.append(seen[key])
    if amp_levels is not None:
        np.savez(path / "amp.npz",
                 **{f"level{i}": np.asarray(a) for i, a in enumerate(amp_levels)})
    manifest = {
        "model_config": model_config,
        "variables_files": files,
        "per_level": isinstance(variables, (list, tuple)),
        "amp": amp_levels is not None,
        "overlap": list(overlap) if isinstance(overlap, (list, tuple)) else bool(overlap),
        "stats_mode": stats_mode,
        "coarse_tile": (list(coarse_tile)
                        if isinstance(coarse_tile, (list, tuple))
                        else int(coarse_tile)),
        "extra": extra or {},
    }
    (path / _MANIFEST).write_text(json.dumps(manifest, indent=2))
    return path


def load_bundle(path: str | Path):
    """(model, variables, amp_levels, manifest) from a bundle directory."""
    path = Path(path)
    manifest = json.loads((path / _MANIFEST).read_text())
    # JSON turns tuples into lists; flax modules must stay hashable (they are
    # static jit arguments), so restore sequence-valued config entries to tuples
    cfg = {k: tuple(v) if isinstance(v, list) else v
           for k, v in manifest["model_config"].items()}
    model = build_model(**cfg)
    cache: Dict[str, Dict] = {}
    seq = []
    for fname in manifest["variables_files"]:
        if fname not in cache:
            cache[fname] = load_model_variables(path / fname)
        seq.append(cache[fname])
    variables = tuple(seq) if manifest["per_level"] else seq[0]
    amp_levels = None
    if manifest["amp"]:
        with np.load(path / "amp.npz") as z:
            amp_levels = tuple(jnp.asarray(z[f"level{i}"]) for i in range(len(z.files)))
    overlap = manifest["overlap"]
    if isinstance(overlap, list):
        manifest["overlap"] = tuple(bool(v) for v in overlap)
    tile = manifest.get("coarse_tile", 20)  # pre-round-4 bundles lack the key
    manifest["coarse_tile"] = (tuple(int(v) for v in tile)
                               if isinstance(tile, list) else int(tile))
    return model, variables, amp_levels, manifest


def run_bundle(
    bundle_path: str | Path,
    scene: Dict,
    target_resolution: int,
    start_resolution: int = 40,
) -> Dict[int, jnp.ndarray]:
    """Upscale a scene dict (``{u: {r0}, f: {r...}, theta: {r...}}``) with a
    saved bundle — every inference decision comes from the manifest."""
    from superresolution_for_pdes_tpu.cascade.upscale import ml_cascade

    model, variables, amp_levels, manifest = load_bundle(bundle_path)
    return ml_cascade(
        model, variables, scene, target_resolution,
        stats_mode=manifest["stats_mode"],
        start_resolution=start_resolution,
        overlap=manifest["overlap"],
        amp_levels=amp_levels,
        coarse_tile=manifest["coarse_tile"],
    )
