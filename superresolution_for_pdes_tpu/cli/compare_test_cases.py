"""Generalization-grid CLI (reference ``compare_test_cases.py:560-676``)."""

from __future__ import annotations

import argparse

import jax

from superresolution_for_pdes_tpu.cli import resolve_model


def main(argv=None) -> None:
    from superresolution_for_pdes_tpu.cli import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser(
        description="in/out-of-sample x const/varying-theta generalization grid"
    )
    parser.add_argument("--model_path", type=str, default=None)
    parser.add_argument("--n_samples", type=int, default=10)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--out", type=str, default="results/test_cases")
    args = parser.parse_args(argv)

    model, variables, _ = resolve_model(args.model_path)

    from superresolution_for_pdes_tpu.eval.test_cases import run_generalization_grid

    results = run_generalization_grid(
        model, variables, jax.random.key(args.seed),
        n_samples=args.n_samples, save_dir=args.out,
    )
    for label, result in results.items():
        s = result["summary"]
        print(f"{label}: ML MAE {s['ml']['mae']:.6e} | bilinear MAE {s['bilinear']['mae']:.6e}")


if __name__ == "__main__":
    main()
