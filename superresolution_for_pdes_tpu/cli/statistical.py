"""Statistical benchmark CLI (reference ``resolution_comparison_statistical.py:501-540``)."""

from __future__ import annotations

import argparse

import jax

from superresolution_for_pdes_tpu.cli import add_level_expert_flags, resolve_level_experts


def main(argv=None) -> None:
    from superresolution_for_pdes_tpu.cli import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser(description="N-example statistical benchmark with timings")
    parser.add_argument("--model_path", type=str, default=None)
    parser.add_argument("--bundle", type=str, default=None,
                        help="run a saved deployment bundle: model, per-level "
                        "experts, modal gains, overlap schedule and stats "
                        "mode all come from its manifest")
    add_level_expert_flags(parser)
    parser.add_argument("--n_examples", type=int, default=10)
    parser.add_argument("--resolutions", type=int, nargs="+", default=[80, 160, 320, 640])
    parser.add_argument("--k", type=float, nargs=2, default=(8.0, 12.0))
    parser.add_argument("--stats_mode", choices=["oracle", "scene", "train", "tile"], default="oracle")
    parser.add_argument("--overlap", action="store_true",
                        help="half-tile-overlapping windows with feathered blending")
    parser.add_argument("--overlap_levels", type=int, nargs="+", default=None,
                        metavar="0/1", help="per-level overlap schedule "
                        "(one 0/1 per level, trailing levels reuse the last; "
                        "overrides --overlap)")
    parser.add_argument("--tile_levels", type=int, nargs="+", default=None,
                        metavar="T", help="per-level coarse tile size (one "
                        "per level, trailing levels reuse the last; default "
                        "20 everywhere). 40 at a level runs 40^2->80^2 "
                        "windows — pair with an expert trained at "
                        "--gen_tile_size 40")
    parser.add_argument("--symmetrize", action="store_true",
                        help="average the model over the 8 square symmetries "
                        "(honest test-time ensembling; 8x model FLOPs)")
    parser.add_argument("--refine_cycles", type=int, default=0,
                        help="physics refinement: N multigrid V-cycles of the "
                        "known PDE per level with the ML field as initial "
                        "iterate (honest — no ground truth touched)")
    parser.add_argument("--amp_calibrate", type=int, default=0,
                        help="per-level amplitude calibration from N "
                        "self-generated training-distribution scenes (honest; "
                        "see cascade.upscale.calibrate_amplitude)")
    parser.add_argument("--amp_k", type=float, nargs=2, default=(6.0, 12.0),
                        help="k-range of the calibration scenes (the training "
                        "cascade range by default)")
    parser.add_argument("--amp_seed", type=int, default=100)
    parser.add_argument("--amp_mode", choices=("scalar", "modal"), default="scalar",
                        help="scalar: one amplitude per level; modal: "
                        "log-band gains per level (cascade.modal)")
    parser.add_argument("--amp_kind", choices=("radial", "grid"), default="radial",
                        help="modal band structure: radial log-bands or a "
                        "separable log-grid over (i, j) octaves")
    parser.add_argument("--amp_bpo", type=int, default=4,
                        help="modal bands per octave")
    parser.add_argument("--theta_range", type=float, nargs=2, default=(0.5, 2.0),
                        help="scene theta ~ U(lo, hi); 1 1 gives the constant-"
                        "theta regime (reference default is U(0.5, 2), "
                        "resolution_comparison.py:37)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--out", type=str, default="results/statistical")
    args = parser.parse_args(argv)

    amp_levels = None
    if args.bundle is not None:
        from superresolution_for_pdes_tpu.deploy import load_bundle

        model, variables, amp_levels, manifest = load_bundle(args.bundle)
        train_stats = None
        overlap = manifest["overlap"]
        coarse_tile = manifest["coarse_tile"]
        args.stats_mode = manifest["stats_mode"]
        args.amp_calibrate = 0
    else:
        model, variables, train_stats = resolve_level_experts(args.model_path, args)
        overlap = (tuple(bool(v) for v in args.overlap_levels)
                   if args.overlap_levels is not None else args.overlap)
        coarse_tile = (tuple(int(v) for v in args.tile_levels)
                       if args.tile_levels is not None else 20)
    if args.stats_mode == "train" and train_stats is None:
        raise SystemExit("--stats_mode train requires a checkpoint with saved norm_stats")

    from superresolution_for_pdes_tpu.eval.statistical import run_statistical_benchmark

    result = run_statistical_benchmark(
        model, variables, jax.random.key(args.seed),
        n_examples=args.n_examples, resolutions=tuple(args.resolutions),
        k_range=tuple(args.k), stats_mode=args.stats_mode, save_dir=args.out,
        train_stats=train_stats, overlap=overlap, symmetrize=args.symmetrize,
        refine_cycles=args.refine_cycles, amp_calibrate=args.amp_calibrate,
        amp_k=tuple(args.amp_k), amp_seed=args.amp_seed, amp_mode=args.amp_mode,
        amp_kind=args.amp_kind, amp_bpo=args.amp_bpo, amp_levels=amp_levels,
        coarse_tile=coarse_tile, theta_range=tuple(args.theta_range),
    )
    if result.get("amp_levels"):
        print("amp_levels:", [(round(a, 4) if isinstance(a, float) else
                               f"<{len(a)} band gains>")
                              for a in result["amp_levels"]])
    for res, a in result["aggregate"].items():
        print(
            f"{res}x{res}: ML MAE {a['ml_mae_mean']:.3e}+/-{a['ml_mae_std']:.1e} | "
            f"bilinear {a['bilinear_mae_mean']:.3e} | advantage {a['ml_advantage']:.1f}x | "
            f"rel-L2 ml {a['ml_rel_l2_mean']:.3f} bl {a['bilinear_rel_l2_mean']:.3f} | "
            f"ml {a['ml_time_mean']*1e3:.2f} ms, solve {a['solve_time_mean']*1e3:.2f} ms"
        )


if __name__ == "__main__":
    main()
