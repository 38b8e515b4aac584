"""Resolution-sweep CLI (reference ``resolution_comparison.py:371-437`` /
``resolution_comparison_enhanced.py:319-425``)."""

from __future__ import annotations

import argparse

import jax

from superresolution_for_pdes_tpu.cli import resolve_model


def main(argv=None) -> None:
    from superresolution_for_pdes_tpu.cli import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser(description="Multi-level cascade resolution sweep")
    parser.add_argument("--model_path", type=str, default=None)
    parser.add_argument("--resolutions", type=int, nargs="+", default=[80, 160, 320, 640])
    parser.add_argument("--k", type=float, nargs=2, default=(10.0, 11.0))
    parser.add_argument("--stats_mode", choices=["oracle", "scene", "train", "tile"], default="oracle")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--shard_tiles", action="store_true",
                        help="shard the tile axis over all available devices")
    parser.add_argument("--overlap", action="store_true",
                        help="half-tile overlapping windows with feathered blending")
    parser.add_argument("--out", type=str, default="results/resolution_comparison")
    args = parser.parse_args(argv)

    model, variables, train_stats = resolve_model(args.model_path)
    if args.stats_mode == "train" and train_stats is None:
        raise SystemExit("--stats_mode train requires a checkpoint with saved norm_stats")
    tile_sharding = None
    if args.shard_tiles:
        from superresolution_for_pdes_tpu.parallel import data_mesh

        mesh = data_mesh(axis_name="tile")
        tile_sharding = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("tile"))

    from superresolution_for_pdes_tpu.eval.resolution import run_resolution_sweep

    result = run_resolution_sweep(
        model, variables, jax.random.key(args.seed),
        resolutions=tuple(args.resolutions), k_range=tuple(args.k),
        stats_mode=args.stats_mode, save_dir=args.out, tile_sharding=tile_sharding,
        overlap=args.overlap, train_stats=train_stats,
    )
    for res in args.resolutions:
        m = result["metrics"]
        print(
            f"{res}x{res}: ML MAE {m['ml_multi_level'][res]['mae']:.6e} | "
            f"bilinear {m['bilinear_direct'][res]['mae']:.6e} | "
            f"bicubic {m['bicubic_direct'][res]['mae']:.6e}"
        )


if __name__ == "__main__":
    main()
