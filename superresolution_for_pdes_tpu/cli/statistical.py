"""Statistical benchmark CLI (reference ``resolution_comparison_statistical.py:501-540``)."""

from __future__ import annotations

import argparse

import jax

from superresolution_for_pdes_tpu.cli import resolve_model


def main(argv=None) -> None:
    from superresolution_for_pdes_tpu.cli import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser(description="N-example statistical benchmark with timings")
    parser.add_argument("--model_path", type=str, default=None)
    parser.add_argument("--model_path_level1", type=str, default=None,
                        help="optional level-1 specialist checkpoint (same "
                        "architecture): used for the 40->80 step, with "
                        "--model_path serving the deeper levels")
    parser.add_argument("--n_examples", type=int, default=10)
    parser.add_argument("--resolutions", type=int, nargs="+", default=[80, 160, 320, 640])
    parser.add_argument("--k", type=float, nargs=2, default=(8.0, 12.0))
    parser.add_argument("--stats_mode", choices=["oracle", "scene", "train", "tile"], default="oracle")
    parser.add_argument("--overlap", action="store_true",
                        help="half-tile-overlapping windows with feathered blending")
    parser.add_argument("--symmetrize", action="store_true",
                        help="average the model over the 8 square symmetries "
                        "(honest test-time ensembling; 8x model FLOPs)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--out", type=str, default="results/statistical")
    args = parser.parse_args(argv)

    model, variables, train_stats = resolve_model(args.model_path)
    if args.model_path_level1 is not None:
        _, l1_variables, _ = resolve_model(args.model_path_level1)
        variables = (l1_variables, variables)
    if args.stats_mode == "train" and train_stats is None:
        raise SystemExit("--stats_mode train requires a checkpoint with saved norm_stats")

    from superresolution_for_pdes_tpu.eval.statistical import run_statistical_benchmark

    result = run_statistical_benchmark(
        model, variables, jax.random.key(args.seed),
        n_examples=args.n_examples, resolutions=tuple(args.resolutions),
        k_range=tuple(args.k), stats_mode=args.stats_mode, save_dir=args.out,
        train_stats=train_stats, overlap=args.overlap, symmetrize=args.symmetrize,
    )
    for res, a in result["aggregate"].items():
        print(
            f"{res}x{res}: ML MAE {a['ml_mae_mean']:.3e}+/-{a['ml_mae_std']:.1e} | "
            f"bilinear {a['bilinear_mae_mean']:.3e} | advantage {a['ml_advantage']:.1f}x | "
            f"ml {a['ml_time_mean']*1e3:.2f} ms, solve {a['solve_time_mean']*1e3:.2f} ms"
        )


if __name__ == "__main__":
    main()
