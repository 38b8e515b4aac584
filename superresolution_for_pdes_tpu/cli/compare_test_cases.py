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
    parser.add_argument("--expert_const", type=str, default=None,
                        help="theta==1 expert checkpoint; with --expert_varying, "
                        "evaluate a theta-regime-routed deployment instead of "
                        "a single checkpoint (see models.router.RegimeRouter)")
    parser.add_argument("--expert_varying", type=str, default=None)
    parser.add_argument("--expert_const_highk", type=str, default=None,
                        help="optional third expert for constant-theta "
                        "high-wavenumber inputs, routed by the FFT peak of "
                        "the known forcing field")
    parser.add_argument("--k_threshold", type=float, default=6.0)
    parser.add_argument("--expert_varying_highk", type=str, default=None,
                        help="optional fourth expert for varying-theta "
                        "high-wavenumber inputs (own threshold below)")
    parser.add_argument("--k_threshold_varying", type=float, default=6.0)
    parser.add_argument("--symmetrize", action="store_true",
                        help="average each expert over the 8 square symmetries "
                        "(honest test-time ensembling)")
    parser.add_argument("--n_samples", type=int, default=10)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--out", type=str, default="results/test_cases")
    args = parser.parse_args(argv)

    if (args.expert_const is None) != (args.expert_varying is None):
        raise SystemExit("--expert_const and --expert_varying must be given together")
    if args.expert_const is not None:
        from superresolution_for_pdes_tpu.cli import resolve_expert
        from superresolution_for_pdes_tpu.models.router import RegimeRouter

        cm, cv, cn = resolve_expert(args.expert_const)
        vm, vv, vn = resolve_expert(args.expert_varying)
        extra = {}
        if args.expert_const_highk is not None:
            hm, hv, hn = resolve_expert(args.expert_const_highk)
            extra = dict(const_high_model=hm, const_high_variables=hv,
                         const_high_normalization=hn, k_threshold=args.k_threshold)
        if args.expert_varying_highk is not None:
            vhm, vhv, vhn = resolve_expert(args.expert_varying_highk)
            extra.update(varying_high_model=vhm, varying_high_variables=vhv,
                         varying_high_normalization=vhn,
                         k_threshold_varying=args.k_threshold_varying)
        model = RegimeRouter(
            const_model=cm, const_variables=cv,
            varying_model=vm, varying_variables=vv,
            const_normalization=cn, varying_normalization=vn,
            **extra,
        )
        variables = None
    else:
        model, variables, _ = resolve_model(args.model_path)

    from superresolution_for_pdes_tpu.eval.test_cases import run_generalization_grid

    results = run_generalization_grid(
        model, variables, jax.random.key(args.seed),
        n_samples=args.n_samples, save_dir=args.out, symmetrize=args.symmetrize,
    )
    for label, result in results.items():
        s = result["summary"]
        print(f"{label}: ML MAE {s['ml']['mae']:.6e} | bilinear MAE {s['bilinear']['mae']:.6e}")


if __name__ == "__main__":
    main()
