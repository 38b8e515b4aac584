"""Out-of-sample evaluation CLI (reference ``test_out_of_sample.py:240-272``)."""

from __future__ import annotations

import argparse

import jax


def main(argv=None) -> None:
    from superresolution_for_pdes_tpu.cli import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser(description="Out-of-sample (k in U(5,8)) evaluation")
    parser.add_argument("--model_path", type=str, default=None)
    parser.add_argument("--expert_const", type=str, default=None,
                        help="with --expert_varying, evaluate the theta-regime-"
                        "routed expert deployment instead of one checkpoint")
    parser.add_argument("--expert_varying", type=str, default=None)
    parser.add_argument("--expert_const_highk", type=str, default=None)
    parser.add_argument("--k_threshold", type=float, default=6.0)
    parser.add_argument("--expert_varying_highk", type=str, default=None)
    parser.add_argument("--k_threshold_varying", type=float, default=6.0)
    parser.add_argument("--n_samples", type=int, default=5)
    parser.add_argument("--k", type=float, nargs=2, default=(5.0, 8.0))
    parser.add_argument("--varying_theta", action="store_true",
                        help="draw theta ~ U(0.5, 2) instead of theta == 1")
    parser.add_argument("--symmetrize", action="store_true",
                        help="average over the 8 square symmetries")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--out", type=str, default="results/out_of_sample")
    args = parser.parse_args(argv)

    normalization = "dataset"
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
            wm, wv, wn = resolve_expert(args.expert_varying_highk)
            extra.update(varying_high_model=wm, varying_high_variables=wv,
                         varying_high_normalization=wn,
                         k_threshold_varying=args.k_threshold_varying)
        model = RegimeRouter(
            const_model=cm, const_variables=cv,
            varying_model=vm, varying_variables=vv,
            const_normalization=cn, varying_normalization=vn,
            **extra,
        )
        variables = None
    else:
        from superresolution_for_pdes_tpu.cli import resolve_expert

        model, variables, normalization = resolve_expert(args.model_path)

    from superresolution_for_pdes_tpu.eval.out_of_sample import evaluate_out_of_sample

    result = evaluate_out_of_sample(
        model, variables, jax.random.key(args.seed),
        n_samples=args.n_samples, k_range=tuple(args.k), save_dir=args.out,
        constant_theta=not args.varying_theta, normalization=normalization,
        symmetrize=args.symmetrize,
    )
    for method, ms in result["summary"].items():
        print(f"{method}: MAE {ms['mae']:.6e} RMSE {ms['rmse']:.6e}")


if __name__ == "__main__":
    main()
