"""Single-level comparison CLI (reference ``compare_methods.py:122-216``)."""

from __future__ import annotations

import argparse

import jax

from superresolution_for_pdes_tpu.cli import resolve_model


def main(argv=None) -> None:
    from superresolution_for_pdes_tpu.cli import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser(description="ML vs interpolation at 40x40")
    parser.add_argument("--model_path", type=str, default=None)
    parser.add_argument("--data", type=str, default=None,
                        help="npz dataset; fresh training-like data when omitted")
    parser.add_argument("--n_samples", type=int, default=10)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--out", type=str, default="results/compare_methods")
    args = parser.parse_args(argv)

    model, variables, _ = resolve_model(args.model_path)
    if args.data:
        from superresolution_for_pdes_tpu.data.io import load_dataset

        data = load_dataset(args.data)
        data = {k: v[: args.n_samples] for k, v in data.items()}
    else:
        from superresolution_for_pdes_tpu.data.generate import generate_test_dataset

        data = generate_test_dataset(
            jax.random.key(args.seed), args.n_samples, (0.5, 5.0), constant_theta=True
        )

    from superresolution_for_pdes_tpu.eval.single_level import evaluate_dataset

    result = evaluate_dataset(model, variables, data, label="compare", save_dir=args.out)
    for method, ms in result["summary"].items():
        print(f"{method}: MAE {ms['mae']:.6e} RMSE {ms['rmse']:.6e} max {ms['max_error']:.6e}")


if __name__ == "__main__":
    main()
