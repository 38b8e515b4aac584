"""One-command deployment CLI: upscale a scene with the champion cascade.

The user-facing serving entry point the reference lacks (its inference lives
inside evaluation scripts only, ``resolution_comparison.py:371-437``): load a
saved :mod:`~superresolution_for_pdes_tpu.deploy` bundle — or assemble one
from expert checkpoints, calibrate it, and optionally save it — then upscale
a scene to the target resolution and write the fields.

    # freeze the champion once
    python -m superresolution_for_pdes_tpu upscale \\
        --model_path results/flagship_r7_run_* --model_path_level1 results/level1b_run_* \\
        --model_path_level 2 results/sfl2_run_* \\
        --amp_calibrate 32 --amp_k 8 12 --save_bundle results/champion_bundle \\
        --target 640 --out results/upscaled

    # serve from the frozen bundle (no flags to remember)
    python -m superresolution_for_pdes_tpu upscale --bundle results/champion_bundle \\
        --k 10 11 --target 640 --out results/upscaled
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax
import numpy as np


def main(argv=None) -> None:
    from superresolution_for_pdes_tpu.cli import (
        add_level_expert_flags,
        enable_compilation_cache,
        resolve_level_experts,
    )

    enable_compilation_cache()
    parser = argparse.ArgumentParser(
        description="Upscale a scene with a (saved or assembled) cascade bundle")
    parser.add_argument("--bundle", type=str, default=None,
                        help="run a saved deployment bundle (ignores the "
                        "model/calibration flags below)")
    parser.add_argument("--model_path", type=str, default=None)
    add_level_expert_flags(parser)
    parser.add_argument("--stats_mode", choices=["scene", "tile"], default="tile",
                        help="honest stats modes only — deployment has no oracle")
    parser.add_argument("--overlap_levels", type=int, nargs="+", default=None,
                        metavar="0/1")
    parser.add_argument("--tile_levels", type=int, nargs="+", default=None,
                        metavar="T", help="per-level coarse tile size "
                        "(trailing levels reuse the last; default 20)")
    parser.add_argument("--amp_calibrate", type=int, default=0,
                        help="modal-calibrate (grid kind) on N self-generated "
                        "scenes before running/saving")
    parser.add_argument("--amp_k", type=float, nargs=2, default=(8.0, 12.0))
    parser.add_argument("--amp_bpo", type=int, default=4)
    parser.add_argument("--amp_seed", type=int, default=100)
    parser.add_argument("--save_bundle", type=str, default=None,
                        help="freeze the assembled configuration to this dir")
    parser.add_argument("--scene", type=str, default=None,
                        help="npz with u40 (coarse solve), f<r>/theta<r> per "
                        "target level; default: self-generate from --k/--seed")
    parser.add_argument("--k", type=float, nargs=2, default=(10.0, 11.0))
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--target", type=int, default=640)
    parser.add_argument("--out", type=str, default="results/upscaled")
    args = parser.parse_args(argv)

    # --- scene ---
    truth = None
    if args.scene is not None:
        with np.load(args.scene) as z:
            resolutions, r = [], 40
            while r < args.target:
                r *= 2
                resolutions.append(r)
            scene = {
                "u": {40: jax.numpy.asarray(z["u40"])},
                "f": {r: jax.numpy.asarray(z[f"f{r}"]) for r in resolutions},
                "theta": {r: jax.numpy.asarray(z[f"theta{r}"]) for r in resolutions},
            }
    else:
        from superresolution_for_pdes_tpu.cascade.multires import solve_multi_resolution

        resolutions, r = [], 40
        while r < args.target:
            r *= 2
            resolutions.append(r)
        full = solve_multi_resolution(
            jax.random.key(args.seed), resolutions=tuple(resolutions),
            k_range=tuple(args.k))
        scene = {"u": {40: full["u"][40]}, "f": full["f"], "theta": full["theta"]}
        truth = full["u"]

    # --- cascade configuration ---
    if args.bundle is not None:
        from superresolution_for_pdes_tpu.deploy import run_bundle

        outs = run_bundle(args.bundle, scene, args.target)
    else:
        from superresolution_for_pdes_tpu.cascade.upscale import ml_cascade

        model, variables, _ = resolve_level_experts(args.model_path, args)
        overlap = (tuple(bool(v) for v in args.overlap_levels)
                   if args.overlap_levels is not None else False)
        coarse_tile = (tuple(int(v) for v in args.tile_levels)
                       if args.tile_levels is not None else 20)
        amp_levels = None
        if args.amp_calibrate > 0:
            from superresolution_for_pdes_tpu.cascade.modal import calibrate_modal

            amp_levels = calibrate_modal(
                model, variables, jax.random.key(args.amp_seed),
                n_scenes=args.amp_calibrate, target_resolution=args.target,
                k_range=tuple(args.amp_k), stats_mode=args.stats_mode,
                overlap=overlap, bands_per_octave=args.amp_bpo, kind="grid",
                coarse_tile=coarse_tile)
        if args.save_bundle is not None:
            from superresolution_for_pdes_tpu.deploy import save_bundle

            cfg = {"name": "attention_unet"}
            if model.in_channels > 3:
                cfg["in_channels"] = model.in_channels
            save_bundle(
                args.save_bundle, cfg, variables, amp_levels=amp_levels,
                overlap=overlap, stats_mode=args.stats_mode,
                coarse_tile=coarse_tile,
                extra={"amp_k": list(args.amp_k), "amp_calibrate": args.amp_calibrate})
            print(f"bundle saved to {args.save_bundle}")
        outs = ml_cascade(model, variables, scene, args.target,
                          stats_mode=args.stats_mode, overlap=overlap,
                          amp_levels=amp_levels, coarse_tile=coarse_tile)

    # --- write + report ---
    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    report = {}
    for res, field in outs.items():
        np.save(out_dir / f"ml_{res}x{res}.npy", np.asarray(field))
        if truth is not None:
            from superresolution_for_pdes_tpu.eval.metrics import compute_metrics

            m = compute_metrics(field, truth[res])
            report[res] = {"mae": float(m["mae"]),
                           "relative_l2": float(m["relative_l2"])}
            print(f"{res}x{res}: MAE {m['mae']:.3e} rel-L2 {m['relative_l2']:.3f}")
    (out_dir / "metrics.json").write_text(json.dumps(report, indent=2))
    print(f"fields written to {out_dir}")


if __name__ == "__main__":
    main()
