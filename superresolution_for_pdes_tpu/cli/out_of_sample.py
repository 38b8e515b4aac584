"""Out-of-sample evaluation CLI (reference ``test_out_of_sample.py:240-272``)."""

from __future__ import annotations

import argparse

import jax

from superresolution_for_pdes_tpu.cli import resolve_model


def main(argv=None) -> None:
    from superresolution_for_pdes_tpu.cli import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser(description="Out-of-sample (k in U(5,8)) evaluation")
    parser.add_argument("--model_path", type=str, default=None)
    parser.add_argument("--n_samples", type=int, default=5)
    parser.add_argument("--k", type=float, nargs=2, default=(5.0, 8.0))
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--out", type=str, default="results/out_of_sample")
    args = parser.parse_args(argv)

    model, variables, _ = resolve_model(args.model_path)

    from superresolution_for_pdes_tpu.eval.out_of_sample import evaluate_out_of_sample

    result = evaluate_out_of_sample(
        model, variables, jax.random.key(args.seed),
        n_samples=args.n_samples, k_range=tuple(args.k), save_dir=args.out,
    )
    for method, ms in result["summary"].items():
        print(f"{method}: MAE {ms['mae']:.6e} RMSE {ms['rmse']:.6e}")


if __name__ == "__main__":
    main()
