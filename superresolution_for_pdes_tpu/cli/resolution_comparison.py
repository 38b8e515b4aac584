"""Resolution-sweep CLI (reference ``resolution_comparison.py:371-437`` /
``resolution_comparison_enhanced.py:319-425``)."""

from __future__ import annotations

import argparse

import jax

from superresolution_for_pdes_tpu.cli import add_level_expert_flags, resolve_level_experts


def main(argv=None) -> None:
    from superresolution_for_pdes_tpu.cli import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser(description="Multi-level cascade resolution sweep")
    parser.add_argument("--model_path", type=str, default=None)
    parser.add_argument("--bundle", type=str, default=None,
                        help="run a saved deployment bundle: model, per-level "
                        "experts, modal gains, overlap schedule and stats "
                        "mode all come from its manifest")
    add_level_expert_flags(parser)
    parser.add_argument("--resolutions", type=int, nargs="+", default=[80, 160, 320, 640])
    parser.add_argument("--k", type=float, nargs=2, default=(10.0, 11.0))
    parser.add_argument("--stats_mode", choices=["oracle", "scene", "train", "tile"], default="oracle")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--shard_tiles", action="store_true",
                        help="shard the tile axis over all available devices")
    parser.add_argument("--overlap", action="store_true",
                        help="half-tile overlapping windows with feathered blending")
    parser.add_argument("--overlap_levels", type=int, nargs="+", default=None,
                        metavar="0/1", help="per-level overlap schedule "
                        "(one 0/1 per level, trailing levels reuse the last; "
                        "overrides --overlap)")
    parser.add_argument("--tile_levels", type=int, nargs="+", default=None,
                        metavar="T", help="per-level coarse tile size (one "
                        "per level, trailing levels reuse the last; default "
                        "20 everywhere)")
    parser.add_argument("--symmetrize", action="store_true",
                        help="average the model over the 8 square symmetries "
                        "(honest test-time ensembling; one 8x-larger batch)")
    parser.add_argument("--refine_cycles", type=int, default=0,
                        help="also report ml_physics: the cascade with N "
                        "honest V-cycles of the known PDE per level")
    parser.add_argument("--amp_calibrate", type=int, default=0,
                        help="per-level amplitude calibration from N "
                        "self-generated training-distribution scenes (honest)")
    parser.add_argument("--amp_k", type=float, nargs=2, default=(6.0, 12.0))
    parser.add_argument("--amp_seed", type=int, default=100)
    parser.add_argument("--amp_mode", choices=("scalar", "modal"), default="scalar",
                        help="scalar: one amplitude per level; modal: "
                        "log-band gains per level (cascade.modal)")
    parser.add_argument("--amp_kind", choices=("radial", "grid"), default="radial",
                        help="modal band structure: radial log-bands or a "
                        "separable log-grid over (i, j) octaves")
    parser.add_argument("--amp_bpo", type=int, default=4,
                        help="modal bands per octave")
    parser.add_argument("--out", type=str, default="results/resolution_comparison")
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
        overlap=overlap, train_stats=train_stats, symmetrize=args.symmetrize,
        refine_cycles=args.refine_cycles, amp_calibrate=args.amp_calibrate,
        amp_k=tuple(args.amp_k), amp_seed=args.amp_seed, amp_mode=args.amp_mode,
        amp_kind=args.amp_kind, amp_bpo=args.amp_bpo, amp_levels=amp_levels,
        coarse_tile=coarse_tile,
    )
    for res in args.resolutions:
        m = result["metrics"]
        line = (
            f"{res}x{res}: ML MAE {m['ml_multi_level'][res]['mae']:.6e} "
            f"(rel-L2 {m['ml_multi_level'][res]['relative_l2']:.3f}) | "
            f"bilinear {m['bilinear_direct'][res]['mae']:.6e} "
            f"(rel-L2 {m['bilinear_direct'][res]['relative_l2']:.3f}) | "
            f"bicubic {m['bicubic_direct'][res]['mae']:.6e}"
        )
        if "ml_physics" in m:
            line += (
                f" | ml+physics MAE {m['ml_physics'][res]['mae']:.6e} "
                f"(rel-L2 {m['ml_physics'][res]['relative_l2']:.3f})"
            )
        print(line)


if __name__ == "__main__":
    main()
