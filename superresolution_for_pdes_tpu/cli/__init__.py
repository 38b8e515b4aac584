"""Command-line entry points.

The reference exposes its workflows as ``if __name__ == '__main__'`` scripts
with argparse flags (``--model_path``, ``--n_samples``, ``--n_examples``; see
SURVEY.md layer map, "CLI" row). Here each workflow is a proper subcommand:

    python -m superresolution_for_pdes_tpu generate_data ...
    python -m superresolution_for_pdes_tpu train ...
    python -m superresolution_for_pdes_tpu compare_methods ...
    python -m superresolution_for_pdes_tpu out_of_sample ...
    python -m superresolution_for_pdes_tpu compare_test_cases ...
    python -m superresolution_for_pdes_tpu resolution_comparison ...
    python -m superresolution_for_pdes_tpu statistical ...

or equivalently ``python -m superresolution_for_pdes_tpu.cli.<name>``.
"""

from __future__ import annotations

from pathlib import Path


def enable_compilation_cache(path: str = "/tmp/superres_pde_xla_cache") -> None:
    """Persistent XLA compilation cache: the U-Net train/cascade programs cost
    ~30-160 s to compile but are stable across runs, so every CLI entry point
    enables the on-disk cache — reruns skip straight to execution (a large
    share of the <10-min train-to-convergence budget)."""
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def resolve_model(model_path: str | None, results_dir: str = "results"):
    """Load (model, variables, train_stats) from an explicit checkpoint path,
    a run dir, a reference ``.pth``, or the newest run under ``results_dir``
    (the reference's discovery idiom, ``compare_methods.py:130-142``)."""
    import jax.numpy as jnp

    import json

    from superresolution_for_pdes_tpu.data.normalization import NormStats
    from superresolution_for_pdes_tpu.models import build_model
    from superresolution_for_pdes_tpu.train.checkpoint import (
        load_model_variables,
        restore_checkpoint,
    )
    from superresolution_for_pdes_tpu.utils.runs import find_latest_run_dir

    if model_path is None:
        model_path = find_latest_run_dir(results_dir)
        print(f"using latest run: {model_path}")
    path = Path(model_path)
    if not path.exists():
        raise FileNotFoundError(f"model not found at path: {path}")
    variables = load_model_variables(path)

    train_stats = None
    try:
        ckpt_dir = path if path.is_dir() and not (path / "best_model").exists() else path / "best_model"
        restored = restore_checkpoint(ckpt_dir)
        ns = restored.get("norm_stats")
        if ns is not None:
            train_stats = NormStats(**{k: jnp.asarray(v) for k, v in ns.items()})
    except Exception:
        pass
    model_name = "attention_unet"
    overrides = {}
    cfg_path = path / "config.json" if path.is_dir() else path.parent / "config.json"
    if cfg_path.exists():
        cfg = json.loads(cfg_path.read_text())
        model_name = cfg.get("model", model_name)
        if cfg.get("scale_channels"):
            overrides["in_channels"] = 5
        if cfg.get("model_norm", "batch") != "batch":
            overrides["norm"] = cfg["model_norm"]
    return build_model(model_name, **overrides), variables, train_stats


def add_level_expert_flags(parser) -> None:
    """The per-level-expert CLI vocabulary, shared by every cascade harness
    (statistical, resolution_comparison): the champion deployment is a
    two-expert cascade, so each harness must be able to run it (the reference
    has a single ``--model_path`` flag, ``resolution_comparison.py:371-375``;
    this build's model space is richer and its harnesses must cover it)."""
    parser.add_argument("--model_path_level1", type=str, default=None,
                        help="optional level-1 specialist checkpoint (same "
                        "architecture): used for the 40->80 step, with "
                        "--model_path serving the deeper levels")
    parser.add_argument("--model_path_level", nargs=2, action="append",
                        metavar=("LEVEL", "PATH"), default=None,
                        help="general per-level expert: e.g. --model_path_level 2 "
                        "results/level2_run_x (repeatable); unlisted levels fall "
                        "back to --model_path")


def resolve_level_experts(model_path, args, results_dir: str = "results"):
    """(model, variables_or_tuple, train_stats) honoring the per-level expert
    flags. The tuple follows the fused-cascade convention (level ``i`` uses
    ``variables[min(i, len - 1)]``): expert checkpoints fill their 1-based
    level slots and every deeper level falls back to the ``--model_path``
    generalist."""
    model, variables, train_stats = resolve_model(model_path, results_dir)
    experts = {}
    if getattr(args, "model_path_level1", None) is not None:
        experts[1] = args.model_path_level1
    for lvl, path in (getattr(args, "model_path_level", None) or []):
        experts[int(lvl)] = path
    if not experts:
        return model, variables, train_stats
    if min(experts) < 1:
        raise SystemExit("--model_path_level levels are 1-based")
    top = max(experts)
    seq = [variables] * (top + 1)
    for lvl, path in experts.items():
        _, v, _ = resolve_model(path, results_dir)
        seq[lvl - 1] = v
    return model, tuple(seq), train_stats


def resolve_expert(model_path: str | None, results_dir: str = "results"):
    """(model, variables, normalization) for one routed expert — the
    normalization mode comes from the run's config.json so eval-time input
    construction matches how the expert was trained."""
    import json

    if model_path is None:
        from superresolution_for_pdes_tpu.utils.runs import find_latest_run_dir

        model_path = find_latest_run_dir(results_dir)
        print(f"using latest run: {model_path}")
    model, variables, _ = resolve_model(model_path, results_dir)
    normalization = "dataset"
    cfg_path = Path(model_path) / "config.json"
    if cfg_path.exists():
        normalization = json.loads(cfg_path.read_text()).get("normalization", "dataset")
    return model, variables, normalization
