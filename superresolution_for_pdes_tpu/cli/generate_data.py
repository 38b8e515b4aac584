"""Dataset generation CLI (reference ``data_generation.py:178-216`` and
``enhanced_data_generation.py:246-293`` __main__ blocks)."""

from __future__ import annotations

import argparse

import jax


def main(argv=None) -> None:
    from superresolution_for_pdes_tpu.cli import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser(description="Generate PDE training data on-device")
    parser.add_argument("--n_standard", type=int, default=1000)
    parser.add_argument("--n_subdomain", type=int, default=1000)
    parser.add_argument("--standard_k", type=float, nargs=2, default=(0.5, 5.0))
    parser.add_argument("--subdomain_k", type=float, nargs=2, default=(0.5, 12.0))
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--out", type=str, default="data")
    parser.add_argument(
        "--theta", choices=["constant", "varying", "mixed"], default="constant",
        help="constant: reference parity (theta==1); varying: theta~U(0.5,2) "
        "pointwise; mixed: both strata (TPU-build extension)",
    )
    parser.add_argument(
        "--n_cascade_scenes", type=int, default=0,
        help="additionally mix in cascade-consistent tiles from this many "
        "multi-resolution scenes (TPU-build extension; see "
        "data.generate.generate_cascade_dataset)",
    )
    parser.add_argument("--cascade_tiles_per_level", type=int, default=8)
    parser.add_argument("--cascade_k", type=float, nargs=2, default=(0.5, 12.0))
    parser.add_argument("--cascade_finest", type=int, default=640)
    parser.add_argument(
        "--n_selffeed_scenes", type=int, default=0,
        help="mix in self-feeding cascade tiles (coarse inputs = an existing "
        "model's own cascade predictions; scheduled-sampling analogue); "
        "requires --selffeed_model",
    )
    parser.add_argument("--selffeed_model", type=str, default=None,
                        help="checkpoint whose cascade generates the "
                        "self-feeding coarse inputs")
    parser.add_argument("--selffeed_k", type=float, nargs=2, default=(0.5, 12.0))
    parser.add_argument(
        "--plot_samples", type=int, default=20,
        help="plot this many random samples as a visual check (reference "
        "enhanced_data_generation.py:193-244); 0 disables",
    )
    args = parser.parse_args(argv)

    from superresolution_for_pdes_tpu.data.generate import (
        combine_datasets,
        generate_mixed_dataset,
    )
    from superresolution_for_pdes_tpu.data.io import save_dataset

    print(
        f"generating {args.n_standard} standard + {args.n_subdomain} subdomain "
        f"samples (theta={args.theta})..."
    )
    key = jax.random.key(args.seed)
    dataset = generate_mixed_dataset(
        key,
        n_standard=args.n_standard,
        n_subdomain=args.n_subdomain,
        theta=args.theta,
        standard_k_range=tuple(args.standard_k),
        subdomain_k_range=tuple(args.subdomain_k),
        n_cascade_scenes=args.n_cascade_scenes,
        cascade_tiles_per_level=args.cascade_tiles_per_level,
        cascade_k_range=tuple(args.cascade_k),
        cascade_finest=args.cascade_finest,
    )
    if args.n_cascade_scenes > 0:
        n_tiles = args.n_cascade_scenes * args.cascade_tiles_per_level * max(
            0, (args.cascade_finest // 40).bit_length() - 1)
        print(f"  + {n_tiles} cascade-consistent tiles")
    if args.n_selffeed_scenes > 0:
        if args.selffeed_model is None:
            raise SystemExit("--n_selffeed_scenes requires --selffeed_model")
        from superresolution_for_pdes_tpu.cli import resolve_model
        from superresolution_for_pdes_tpu.data.generate import selffeed_cascade_dataset

        sf_model, sf_vars, _ = resolve_model(args.selffeed_model)
        sk = jax.random.fold_in(key, 7)
        selffeed = selffeed_cascade_dataset(
            sf_model, sf_vars, sk, args.n_selffeed_scenes,
            tiles_per_level=args.cascade_tiles_per_level,
            k_range=tuple(args.selffeed_k), finest=args.cascade_finest,
        )
        print(f"  + {int(selffeed['u_fine'].shape[0])} self-feeding cascade tiles")
        dataset = combine_datasets(dataset, selffeed)
    path = save_dataset(dataset, args.out)
    print(f"saved {int(dataset['u_fine'].shape[0])} samples -> {path}")

    if args.plot_samples > 0:
        from pathlib import Path

        from superresolution_for_pdes_tpu.eval.plots import plot_dataset_samples

        out = plot_dataset_samples(
            dataset, n_samples=args.plot_samples, seed=args.seed,
            out_dir=Path(path).parent / "dataset_samples",
        )
        print(f"sample plots -> {out}")


if __name__ == "__main__":
    main()
