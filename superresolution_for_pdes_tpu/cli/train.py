"""Training CLI (reference ``train.py:138-251`` / ``train_enhanced.py:185-360``)."""

from __future__ import annotations

import argparse


def _make_selffeed(args):
    """Closure ``key -> selffeed tiles`` over the FROZEN teacher cascade.

    Resolves the teacher once (optionally with a level-1 expert and a modal
    calibration pass — the full deployment configuration) so per-epoch
    streaming regeneration only pays the scene solves + one teacher cascade.
    """
    import types

    import jax

    from superresolution_for_pdes_tpu.cli import resolve_level_experts
    from superresolution_for_pdes_tpu.data.generate import selffeed_cascade_dataset

    if args.gen_selffeed_model is None:
        raise SystemExit("--gen_selffeed_scenes requires --gen_selffeed_model")
    ns = types.SimpleNamespace(
        model_path_level1=args.gen_selffeed_model_level1,
        model_path_level=args.gen_selffeed_model_level)
    sf_model, sf_vars, _ = resolve_level_experts(args.gen_selffeed_model, ns)
    overlap = (tuple(bool(v) for v in args.gen_selffeed_overlap_levels)
               if args.gen_selffeed_overlap_levels is not None else False)
    teacher_tile = (tuple(int(v) for v in args.gen_selffeed_teacher_tile)
                    if getattr(args, "gen_selffeed_teacher_tile", None) is not None
                    else 20)
    amp_levels = None
    if args.gen_selffeed_amp > 0:
        from superresolution_for_pdes_tpu.cascade.modal import calibrate_modal

        amp_levels = calibrate_modal(
            sf_model, sf_vars, jax.random.key(100),
            n_scenes=args.gen_selffeed_amp,
            target_resolution=args.gen_selffeed_finest,
            k_range=tuple(args.gen_selffeed_k),
            stats_mode=args.gen_selffeed_stats,
            kind="grid",
            overlap=overlap,
            coarse_tile=teacher_tile,
        )

    def gen(key):
        return selffeed_cascade_dataset(
            sf_model, sf_vars, key, args.gen_selffeed_scenes,
            tiles_per_level=args.gen_tiles_per_level,
            k_range=tuple(args.gen_selffeed_k),
            finest=args.gen_selffeed_finest,
            stats_mode=args.gen_selffeed_stats,
            amp_levels=amp_levels,
            harvest_from=args.gen_selffeed_harvest_from,
            overlap=overlap,
            tile_size=args.gen_tile_size,
            teacher_tile=teacher_tile,
            scene_chunk=args.gen_selffeed_chunk,
        )

    return gen


def main(argv=None) -> None:
    from superresolution_for_pdes_tpu.cli import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser(description="Train the attention U-Net")
    parser.add_argument("--data", type=str, default="data/pde_dataset.npz")
    parser.add_argument(
        "--generate", action="store_true",
        help="generate the training set on-device instead of loading --data "
        "(seeded by --gen_seed, so runs are reproducible; avoids the "
        "host->device transfer of a saved npz, which costs minutes over "
        "remote-TPU tunnels vs seconds of on-chip solves)",
    )
    parser.add_argument("--gen_seed", type=int, default=42)
    parser.add_argument("--gen_standard", type=int, default=1000)
    parser.add_argument("--gen_subdomain", type=int, default=1000)
    parser.add_argument("--gen_theta", choices=["constant", "varying", "mixed"],
                        default="constant")
    parser.add_argument("--gen_standard_k", type=float, nargs=2, default=(0.5, 5.0))
    parser.add_argument("--gen_subdomain_k", type=float, nargs=2, default=(0.5, 12.0))
    parser.add_argument("--gen_cascade_scenes", type=int, default=0)
    parser.add_argument("--gen_tiles_per_level", type=int, default=8)
    parser.add_argument("--gen_cascade_k", type=float, nargs=2, default=(0.5, 12.0))
    parser.add_argument("--gen_cascade_finest", type=int, default=640,
                        help="finest cascade resolution for generated tiles; "
                        "80 restricts to level-1 (40->80) pairs — the "
                        "level-specialist recipe")
    parser.add_argument("--gen_cascade_coarsest", type=int, default=40,
                        help="coarsest cascade resolution for generated tiles; "
                        "with --gen_cascade_finest this selects one level's "
                        "tile distribution (e.g. 80/160 = the 80->160 level)")
    parser.add_argument(
        "--gen_selffeed_scenes", type=int, default=0,
        help="mix in self-feeding cascade tiles whose coarse inputs are an "
        "existing model's own cascade predictions (closes the train/inference "
        "input mismatch at depth); requires --gen_selffeed_model",
    )
    parser.add_argument("--gen_selffeed_model", type=str, default=None)
    parser.add_argument("--gen_selffeed_model_level1", type=str, default=None,
                        help="optional level-1 expert for the frozen teacher "
                        "cascade (deploy-matched selffeed inputs)")
    parser.add_argument("--gen_selffeed_model_level", nargs=2, action="append",
                        metavar=("LEVEL", "PATH"), default=None,
                        help="general per-level teacher expert (repeatable), "
                        "mirroring the eval harnesses' --model_path_level")
    parser.add_argument("--gen_selffeed_k", type=float, nargs=2, default=(8.0, 12.0))
    parser.add_argument("--gen_selffeed_stats", default="tile",
                        choices=["oracle", "scene", "train", "tile"],
                        help="stats mode the self-feeding cascade runs with — "
                        "match the deployment configuration")
    parser.add_argument("--gen_selffeed_finest", type=int, default=640,
                        help="finest resolution of the selffeed scenes")
    parser.add_argument("--gen_selffeed_harvest_from", type=int, default=None,
                        help="only harvest pairs whose coarse resolution is "
                        ">= this (e.g. 80 with finest 160 = level-2 tiles "
                        "with predicted-80 inputs only)")
    parser.add_argument("--gen_selffeed_overlap_levels", type=int, nargs="+",
                        default=None, metavar="0/1",
                        help="per-level overlap schedule for the frozen "
                        "teacher cascade (match the deployment schedule)")
    parser.add_argument("--gen_selffeed_amp", type=int, default=0,
                        help="modal-calibrate the frozen teacher on N self-"
                        "generated scenes first (grid kind, 4 bands/octave, "
                        "the deployment correction) so selffeed inputs match "
                        "the corrected deployment cascade")
    parser.add_argument("--gen_tile_size", type=int, default=20,
                        help="coarse window size of generated cascade/selffeed "
                        "tiles (fine windows are 2x). 40 trains a bigger-"
                        "context expert for levels run with --tile_levels 40; "
                        "requires --gen_standard 0 --gen_subdomain 0 (those "
                        "samples are fixed 20->40 geometry)")
    parser.add_argument("--gen_selffeed_teacher_tile", type=int, nargs="+",
                        default=None, metavar="T",
                        help="per-level tile schedule the FROZEN teacher "
                        "cascade runs with (match the deployment schedule); "
                        "default 20 everywhere")
    parser.add_argument("--gen_selffeed_chunk", type=int, default=None,
                        help="generate the selffeed scene batch in chunks of "
                        "this many scenes (must divide the scene count): peak "
                        "datagen HBM scales with the chunk, not the batch — "
                        "required for big-window deep-level recipes on 16 GB "
                        "chips")
    parser.add_argument("--fused_epochs", type=int, default=0,
                        help="with --gen_stream: scan this many epochs "
                        "(regen + train + validate) inside ONE device "
                        "program — amortizes the per-epoch host dispatches "
                        "over remote-TPU tunnels (LR changes then apply at "
                        "chunk boundaries)")
    parser.add_argument("--gen_every", type=int, default=1,
                        help="with --gen_stream: regenerate the training set "
                        "every K epochs instead of every epoch (shuffling "
                        "stays per-epoch). The streamed epoch is regen-bound, "
                        "so 2-3 cuts wall-clock ~30-40%% at a small data-"
                        "freshness cost; 1 = original behavior")
    parser.add_argument(
        "--gen_stream", action="store_true",
        help="regenerate the training split on-device with a fresh key every "
        "epoch (the model never sees a sample twice — overfitting-free; "
        "requires --generate; validation stays on a fixed held-out set)",
    )
    parser.add_argument("--epochs", type=int, default=500)
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--lr", type=float, default=2e-4)
    parser.add_argument("--physics_weight", type=float, default=0.0)
    parser.add_argument("--coarse_noise_std", type=float, default=0.0,
                        help="train-time Gaussian noise on the coarse input channel")
    parser.add_argument("--dtype", type=str, default="float32")
    parser.add_argument("--model", type=str, default="attention_unet",
                        help="model family (see models.registry.available_models())")
    parser.add_argument("--normalization", choices=["dataset", "per_sample"],
                        default="dataset",
                        help="dataset-level stats (reference parity) or self-normalization")
    parser.add_argument("--model_norm", choices=["batch", "group"], default="batch",
                        help="batch: reference parity; group: no train/eval "
                        "stats mismatch, DP-reduction-free")
    parser.add_argument("--scale_channels", action="store_true",
                        help="append log-scale input channels (scale-aware "
                        "self-normalization; pair with --normalization per_sample)")
    parser.add_argument("--multihost", action="store_true",
                        help="join the multi-host JAX runtime "
                        "(jax.distributed.initialize) before building the mesh")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--early_stopping_patience", type=int, default=20,
                        help="epochs without val improvement before stopping "
                        "(published config: 20; streaming runs benefit from "
                        "more since every epoch sees fresh data)")
    parser.add_argument("--plateau_patience", type=int, default=10)
    parser.add_argument("--results", type=str, default="results")
    parser.add_argument("--prefix", type=str, default="enhanced_")
    parser.add_argument("--tensorboard", action="store_true")
    parser.add_argument(
        "--data_parallel", action="store_true",
        help="shard batches over all available devices (GSPMD DP)",
    )
    parser.add_argument(
        "--resume_from", type=str, default=None,
        help="checkpoint directory to resume full training state from",
    )
    args = parser.parse_args(argv)
    if (args.gen_tile_size != 20 and args.gen_selffeed_scenes > 0
            and (args.gen_standard > 0 or args.gen_subdomain > 0)):
        raise SystemExit(
            "--gen_tile_size != 20 cannot be mixed with standard/subdomain "
            "samples; set --gen_standard 0 --gen_subdomain 0")

    from superresolution_for_pdes_tpu.data.io import load_dataset
    from superresolution_for_pdes_tpu.parallel import data_mesh
    from superresolution_for_pdes_tpu.train import TrainConfig, train_model
    from superresolution_for_pdes_tpu.utils.runs import create_run_dir

    config = TrainConfig(
        batch_size=args.batch_size,
        num_epochs=args.epochs,
        learning_rate=args.lr,
        physics_weight=args.physics_weight,
        coarse_noise_std=args.coarse_noise_std,
        dtype=args.dtype,
        model=args.model,
        normalization=args.normalization,
        scale_channels=args.scale_channels,
        model_norm=args.model_norm,
        seed=args.seed,
        early_stopping_patience=args.early_stopping_patience,
        plateau_patience=args.plateau_patience,
        log_tensorboard=args.tensorboard,
        fused_epochs=args.fused_epochs,
        gen_every=args.gen_every,
    )
    if args.multihost:
        from superresolution_for_pdes_tpu.parallel import initialize_multihost

        topo = initialize_multihost()
        print(f"multihost: process {topo['process_index']}/{topo['process_count']}, "
              f"{topo['global_devices']} global devices")
    if args.generate:
        import jax

        from superresolution_for_pdes_tpu.data.generate import generate_mixed_dataset

        def _gen_mixed(key):
            """The mixed recipe, or None for a pure-selffeed job (std = sub =
            cascade = 0 — the bigger-tile experts can't mix 20->40 geometry)."""
            if (args.gen_standard + args.gen_subdomain
                    + args.gen_cascade_scenes == 0):
                if args.gen_selffeed_scenes <= 0:
                    raise SystemExit("--generate with every sample count at 0")
                return None
            return generate_mixed_dataset(
                key,
                n_standard=args.gen_standard,
                n_subdomain=args.gen_subdomain,
                theta=args.gen_theta,
                standard_k_range=tuple(args.gen_standard_k),
                subdomain_k_range=tuple(args.gen_subdomain_k),
                n_cascade_scenes=args.gen_cascade_scenes,
                cascade_tiles_per_level=args.gen_tiles_per_level,
                cascade_k_range=tuple(args.gen_cascade_k),
                cascade_finest=args.gen_cascade_finest,
                cascade_coarsest=args.gen_cascade_coarsest,
                cascade_tile_size=args.gen_tile_size,
            )

        dataset = _gen_mixed(jax.random.key(args.gen_seed))
        if args.gen_selffeed_scenes > 0:
            selffeed = _make_selffeed(args)(
                jax.random.fold_in(jax.random.key(args.gen_seed), 7))
            from superresolution_for_pdes_tpu.data.generate import combine_datasets

            print(f"  + {int(selffeed['u_fine'].shape[0])} self-feeding cascade tiles "
                  f"(model {args.gen_selffeed_model}, stats {args.gen_selffeed_stats})")
            dataset = selffeed if dataset is None else combine_datasets(dataset, selffeed)
        print(f"generated {int(dataset['u_fine'].shape[0])} samples on-device "
              f"(theta={args.gen_theta}, seed={args.gen_seed})")
    else:
        if args.gen_stream:
            raise SystemExit("--gen_stream requires --generate")
        dataset = load_dataset(args.data)

    dataset_generator = None
    if args.gen_stream:
        import jax

        from superresolution_for_pdes_tpu.data.generate import combine_datasets

        selffeed_gen = (
            _make_selffeed(args) if args.gen_selffeed_scenes > 0 else None
        )

        def dataset_generator(key):
            ds = _gen_mixed(key)
            if selffeed_gen is not None:
                sf = selffeed_gen(jax.random.fold_in(key, 7))
                ds = sf if ds is None else combine_datasets(ds, sf)
            return ds

    run_dir = create_run_dir(args.results, args.prefix)
    mesh = data_mesh() if args.data_parallel else None
    history = train_model(dataset, config, run_dir, mesh=mesh, resume_from=args.resume_from,
                          dataset_generator=dataset_generator)
    print(
        f"best val loss {history['best_val_loss']:.6f} at epoch "
        f"{history['best_epoch'] + 1} ({history['num_epochs']} epochs); run dir {run_dir}"
    )


if __name__ == "__main__":
    main()
