"""Kernel + solver A/B benchmark on the real chip.

Measures (bench.py pattern: rep loop inside one jitted program, scalar
checksum fetch — immune to async dispatch and tunnel latency):

1. XLA vs Pallas for the 5-point stencil hot ops (apply-operator, residual,
   2-sweep Jacobi) at 40^2..640^2;
2. the multigrid V-cycle with einsum vs Pallas finest-level smoothing;
3. the solver suite end-to-end: DST (exact) vs MG vs MGCG vs plain CG at
   160/320/640 — the data that justifies the iterative path's existence
   (VERDICT round 1, items 5-6; reference's 409,600-unknown spsolve at
   ``resolution_comparison.py:61-73`` is the machine being beaten).

Usage:  python benchmarks/bench_kernels.py [--out reports/kernels_tpu.md]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/superres_pde_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timed(fn, *args, reps=30):
    """Mean seconds per call: rep loop inside one jit, forced scalar fetch."""

    @jax.jit
    def run(*a):
        def body(acc, _):
            out = fn(*a)
            return acc + jnp.sum(out), None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), jnp.arange(reps))
        return acc

    float(run(*args))  # compile + warm
    t0 = time.perf_counter()
    float(run(*args))
    return (time.perf_counter() - t0) / reps


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", type=str, default=None)
    args = parser.parse_args()

    from superresolution_for_pdes_tpu.ops.grid import forcing_term
    from superresolution_for_pdes_tpu.ops.pallas_stencil import (
        pallas_apply_operator,
        pallas_jacobi_smooth,
        pallas_residual,
    )
    from superresolution_for_pdes_tpu.ops.stencil import apply_laplacian, apply_operator, residual
    from superresolution_for_pdes_tpu.solver import (
        solve_poisson_cg,
        solve_poisson_dst,
        solve_poisson_mg,
    )
    from superresolution_for_pdes_tpu.solver.cg import cg_solve
    from superresolution_for_pdes_tpu.solver.multigrid import mg_preconditioner, vcycle

    lines = [f"# Kernel/solver A/B on {jax.devices()[0].device_kind}", ""]

    def emit(s):
        print(s, flush=True)
        lines.append(s)

    def xla_jacobi(u, b, h, omega=0.8, iters=2):
        scale = omega * h * h / 4.0
        for _ in range(iters):
            u = u + scale * (b + apply_laplacian(u, h))
        return u

    emit("## Stencil ops: XLA vs Pallas (ms per call, batch x n x n)")
    emit("| n | batch | op | XLA | Pallas | speedup |")
    emit("|---|---|---|---|---|---|")
    for n in (40, 80, 160, 320, 640):
        batch = max(1, (640 // n) ** 2)  # ~constant total points
        key = jax.random.key(0)
        u = jax.random.normal(key, (batch, n, n), jnp.float32)
        th = jax.random.uniform(jax.random.key(1), (batch, n, n), jnp.float32, 0.5, 2.0)
        f = jax.random.normal(jax.random.key(2), (batch, n, n), jnp.float32)
        h = 1.0 / (n - 1)
        pairs = [
            ("apply", lambda: timed(apply_operator, th, u),
             lambda: timed(lambda a, b_: pallas_apply_operator(a, b_, interpret=False), th, u)),
            ("residual", lambda: timed(residual, th, u, f),
             lambda: timed(lambda a, b_, c: pallas_residual(a, b_, c, interpret=False), th, u, f)),
            ("jacobi2", lambda: timed(lambda a, b_: xla_jacobi(a, b_, h), u, f),
             lambda: timed(lambda a, b_: pallas_jacobi_smooth(a, b_, interpret=False), u, f)),
        ]
        for name, fx, fp in pairs:
            tx, tp = fx(), fp()
            emit(f"| {n} | {batch} | {name} | {tx*1e3:.3f} | {tp*1e3:.3f} | {tx/tp:.2f}x |")

    emit("")
    emit("## Multigrid V-cycle: einsum vs Pallas finest-level smoother (ms)")
    emit("| n | batch | einsum | pallas | speedup |")
    emit("|---|---|---|---|---|")
    for n in (160, 320, 640):
        batch = max(1, (640 // n) ** 2)
        b = jax.random.normal(jax.random.key(3), (batch, n, n), jnp.float32)
        u0 = jnp.zeros_like(b)
        te = timed(lambda a, c: vcycle(a, c, use_pallas=False), u0, b, reps=10)
        tp = timed(lambda a, c: vcycle(a, c, use_pallas=True), u0, b, reps=10)
        emit(f"| {n} | {batch} | {te*1e3:.2f} | {tp*1e3:.2f} | {te/tp:.2f}x |")

    emit("")
    emit("## Solver suite end-to-end (single field, ms; f32 + 1 refine for DST)")
    emit("| n | DST exact | MG (12 cycles) | MGCG tol 1e-7 | CG tol 1e-7 | CG iters |")
    emit("|---|---|---|---|---|---|")
    for n in (160, 320, 640):
        f = forcing_term(10.3, 10.7, n)[None]
        th = jax.random.uniform(jax.random.key(4), (1, n, n), jnp.float32, 0.5, 2.0)
        t_dst = timed(lambda a, b_: solve_poisson_dst(a, b_, refine_iters=1), f, th)
        t_mg = timed(lambda a, b_: solve_poisson_mg(a, b_), f, th, reps=5)
        t_mgcg = timed(
            lambda a, b_: solve_poisson_cg(a, b_, tol=1e-7, max_iters=60,
                                           precond=mg_preconditioner),
            f, th, reps=5)
        t_cg = timed(lambda a, b_: solve_poisson_cg(a, b_, tol=1e-7, max_iters=3000),
                     f, th, reps=3)
        _, iters = cg_solve(lambda v: -apply_laplacian(v), -(f / th), tol=1e-7,
                            max_iters=3000)
        emit(f"| {n} | {t_dst*1e3:.2f} | {t_mg*1e3:.2f} | {t_mgcg*1e3:.2f} "
             f"| {t_cg*1e3:.2f} | {int(iters)} |")

    if args.out:
        from pathlib import Path

        Path(args.out).parent.mkdir(parents=True, exist_ok=True)
        Path(args.out).write_text("\n".join(lines) + "\n")
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
