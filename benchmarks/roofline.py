"""Roofline analysis of the 7.8M-param attention U-Net train step on TPU v5e.

Round-3 review asked why training MFU sits at ~6% (bf16, b256;
``reports/train_bench.json``) and whether that is a fixable inefficiency or
the small-model ceiling. This script answers it two ways:

1. **Analytic op-by-op roofline** of the conv stack (shapes are static, so
   every conv's implicit-GEMM mapping onto the 128x128 MXU is known exactly):
   per-op FLOPs, ideal HBM bytes, arithmetic intensity, and the MXU *tiling*
   efficiency — the fraction of the systolic array doing useful work once the
   GEMM K (=9*Cin) and N (=Cout) dims are padded to the native 128 lanes.
   The FLOP-weighted mean of ``min(tiling_eff, AI/ridge)`` is the model's
   speed-of-light MFU: no software change reaches above it at these shapes.
2. **XLA cost analysis** of the actually-compiled train-epoch program
   (flops + bytes accessed) and, on TPU, the measured step time against the
   analytic light-speed estimate.

v5e numbers (public spec): 197 TFLOP/s bf16 MXU peak, 819 GB/s HBM ->
ridge point ~240 FLOP/byte.

Reference match: this quantifies the rebuild's own north-star perf targets
(BASELINE.md section TPU); the reference has no throughput instrumentation.
"""

from __future__ import annotations

import argparse
import json
import math
import time

PEAK_BF16 = 197e12  # v5e MXU peak, FLOP/s
HBM_BW = 819e9      # v5e HBM bandwidth, B/s
RIDGE = PEAK_BF16 / HBM_BW  # ~240 FLOP/byte


def _pad(n: int, to: int = 128) -> int:
    return math.ceil(n / to) * to


def conv_ops(batch: int, hw: int = 40, in_ch: int = 3, acc_bytes: int = 2):
    """Enumerate the U-Net's conv layers as (name, H, W, Cin, Cout, k).

    Mirrors ``models/unet.py`` AttentionUNet at 40x40 inputs (the published
    tile geometry). Attention SE convs act on 1x1 pooled tensors (negligible
    FLOPs) and are folded into the elementwise byte estimate instead.
    """
    e = [64, 128, 256]
    br = 512
    L = []
    # encoder
    L.append(("enc1.conv1", hw, hw, in_ch, e[0], 3))
    L.append(("enc1.conv2", hw, hw, e[0], e[0], 3))
    L.append(("enc2.conv1", hw // 2, hw // 2, e[0], e[1], 3))
    L.append(("enc2.conv2", hw // 2, hw // 2, e[1], e[1], 3))
    L.append(("enc3.conv1", hw // 4, hw // 4, e[1], e[2], 3))
    L.append(("enc3.conv2", hw // 4, hw // 4, e[2], e[2], 3))
    # dilated bridge
    L.append(("bridge.conv1", hw // 4, hw // 4, e[2], br, 3))
    L.append(("bridge.conv2", hw // 4, hw // 4, br, br, 3))
    # spatial-attention 1x1 convs on the gating signals
    L.append(("att3.sa", hw // 4, hw // 4, br, 1, 1))
    L.append(("att2.sa", hw // 2, hw // 2, e[2], 1, 1))
    L.append(("att1.sa", hw, hw, e[1], 1, 1))
    # decoder (concat inputs)
    L.append(("dec3.conv1", hw // 4, hw // 4, br + e[2], e[2], 3))
    L.append(("dec3.conv2", hw // 4, hw // 4, e[2], e[2], 3))
    L.append(("dec2.conv1", hw // 2, hw // 2, e[2] + e[1], e[1], 3))
    L.append(("dec2.conv2", hw // 2, hw // 2, e[1], e[1], 3))
    L.append(("dec1.conv1", hw, hw, e[1] + e[0], e[0], 3))
    L.append(("dec1.conv2", hw, hw, e[0], e[0], 3))
    # head
    L.append(("head.conv1", hw, hw, e[0], 32, 3))
    L.append(("head.conv2", hw, hw, 32, 16, 3))
    L.append(("head.final", hw, hw, 16, 1, 1))
    return L


def analytic_roofline(batch: int, hw: int = 40, in_ch: int = 3,
                      dtype_bytes: int = 2, train: bool = True):
    """Per-op roofline; returns (rows, summary).

    Training counts fwd + grad-wrt-input + grad-wrt-weights (~3x fwd FLOPs,
    the standard estimate). MXU tiling efficiency per GEMM: the systolic
    array streams K(=k*k*Cin, padded to 128) x N(=Cout, padded to 128);
    M = batch*H*W is large at b>=32 so M-padding is negligible. The three
    training GEMMs have different (K, N): fwd (9Cin, Cout), dgrad
    (9Cout, Cin), wgrad (M-contraction, KxN output = 9Cin x Cout) — wgrad's
    contraction dim is huge, so its efficiency is set by the 9Cin x Cout
    output tile.
    """
    rows = []
    tot_flops = 0.0
    tot_bytes = 0.0
    tot_sol_time = 0.0  # speed-of-light seconds, sum over ops
    for name, H, W, Cin, Cout, k in conv_ops(batch, hw, in_ch):
        M = batch * H * W
        fwd_flops = 2.0 * M * (k * k * Cin) * Cout
        gemms = [(k * k * Cin, Cout)]  # fwd
        if train:
            gemms += [(k * k * Cout, Cin),       # dgrad
                      (k * k * Cin, Cout)]       # wgrad output tile
        flops = fwd_flops * (3.0 if train else 1.0)
        # tiling efficiency, FLOP-weighted over the (equal-FLOP) GEMMs
        effs = []
        for (K, N) in gemms:
            eff_k = K / _pad(K)
            eff_n = N / _pad(N)
            eff_m = M / _pad(M, 8)  # 8-sublane granularity
            effs.append(eff_k * eff_n * eff_m)
        eff = sum(effs) / len(effs)
        # ideal bytes: read input + write output (+ gradient passes double
        # both) + weights once per pass; norm+relu assumed fused (free).
        act_in = M * Cin * dtype_bytes
        act_out = M * Cout * dtype_bytes
        wbytes = k * k * Cin * Cout * dtype_bytes
        passes = 3 if train else 1
        bytes_ = (act_in + act_out + wbytes) * passes
        ai = flops / bytes_
        # speed of light for this op: max of compute time at *tiled* peak
        # and memory time at full bandwidth
        t_comp = flops / (PEAK_BF16 * eff)
        t_mem = bytes_ / HBM_BW
        sol = max(t_comp, t_mem)
        bound = "compute" if t_comp >= t_mem else "memory"
        rows.append({
            "op": name, "M": M, "K": k * k * Cin, "N": Cout,
            "gflops": flops / 1e9, "mbytes": bytes_ / 1e6,
            "ai": round(ai, 1), "mxu_tiling_eff": round(eff, 3),
            "bound": bound, "sol_us": round(sol * 1e6, 1),
        })
        tot_flops += flops
        tot_bytes += bytes_
        tot_sol_time += sol
    # non-conv elementwise/norm/attention/pool/upsample traffic: every
    # activation tensor is touched ~4 extra times across norm, relu, gate
    # multiplies, pools/upsamples and their gradients (measured HLO puts the
    # fused elementwise bytes at 3-5x the conv activation bytes).
    ew_bytes = 4.0 * sum(
        batch * H * W * Cout * dtype_bytes * (3 if train else 1)
        for _, H, W, _, Cout, _ in conv_ops(batch, hw, in_ch))
    tot_bytes += ew_bytes
    tot_sol_time += ew_bytes / HBM_BW
    sol_mfu = tot_flops / (tot_sol_time * PEAK_BF16)
    summary = {
        "batch": batch, "hw": hw, "train": train,
        "total_gflops": round(tot_flops / 1e9, 2),
        "total_mbytes": round(tot_bytes / 1e6, 1),
        "arith_intensity": round(tot_flops / tot_bytes, 1),
        "ridge_flop_per_byte": round(RIDGE, 1),
        "speed_of_light_us": round(tot_sol_time * 1e6, 1),
        "speed_of_light_mfu": round(sol_mfu, 4),
        "flop_weighted_mxu_tiling_eff": round(
            sum(r["gflops"] * r["mxu_tiling_eff"] for r in rows)
            / sum(r["gflops"] for r in rows), 3),
    }
    return rows, summary


def measured(batch: int, dtype: str, n_samples: int = 1600):
    """Compile + time one epoch of the real train step; return metrics."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/superres_pde_xla_cache")
    from superresolution_for_pdes_tpu.data import generate_enhanced_dataset
    from superresolution_for_pdes_tpu.data.normalization import NormStats
    from superresolution_for_pdes_tpu.data.pipeline import epoch_batch_indices
    from superresolution_for_pdes_tpu.models import AttentionUNet, init_unet
    from superresolution_for_pdes_tpu.train import TrainConfig
    from superresolution_for_pdes_tpu.train.loop import (
        TrainState, make_optimizer, make_train_fns, prepare_arrays)

    jdt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    dataset = generate_enhanced_dataset(jax.random.key(0), n_samples, 0)
    stats = NormStats.from_dataset(dataset)
    arrays = prepare_arrays(dataset, stats, jdt)
    model, variables = init_unet(jax.random.key(0), AttentionUNet(dtype=jdt))
    config = TrainConfig(batch_size=batch, dtype=dtype)
    tx = make_optimizer(config)
    state = TrainState(params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=tx.init(variables["params"]),
                       step=jnp.zeros((), jnp.int32))
    train_epoch, _ = make_train_fns(model, tx, stats, physics_weight=0.1)
    idx = epoch_batch_indices(jax.random.key(1), n_samples, batch)
    state, loss = train_epoch(state, arrays, idx)
    float(loss)
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        state, loss = train_epoch(state, arrays, idx)
        float(loss)
    per_epoch = (time.perf_counter() - t0) / reps
    out = {"samples_per_sec": round(n_samples / per_epoch, 1),
           "steps_per_epoch": len(idx),
           "step_us": round(per_epoch / len(idx) * 1e6, 1)}
    try:
        ca = train_epoch.lower(state, arrays, idx).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        # cost_analysis counts the epoch-scan body ONCE; scale by trip count
        flops = float(ca.get("flops", 0.0)) * len(idx)
        nbytes = float(ca.get("bytes accessed", 0.0)) * len(idx)
        if flops > 0:
            out["xla_flops_per_epoch"] = flops
            out["measured_mfu"] = round(flops / per_epoch / PEAK_BF16, 4)
        if nbytes > 0:
            out["xla_bytes_per_epoch"] = nbytes
            out["xla_arith_intensity"] = round(flops / nbytes, 1)
            out["hbm_bw_utilization"] = round(nbytes / per_epoch / HBM_BW, 3)
    except Exception as exc:
        out["cost_analysis"] = repr(exc)
    return out


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, nargs="+", default=[32, 256, 512])
    parser.add_argument("--dtype", type=str, default="bfloat16")
    parser.add_argument("--measure", action="store_true",
                        help="also compile+time the real step (needs a TPU "
                        "for meaningful numbers)")
    parser.add_argument("--per_op", action="store_true",
                        help="print the per-op table for the first batch size")
    parser.add_argument("--out", type=str, default=None)
    args = parser.parse_args()

    report = {"peak_bf16_tflops": PEAK_BF16 / 1e12, "hbm_gbps": HBM_BW / 1e9,
              "ridge_flop_per_byte": round(RIDGE, 1), "configs": {}}
    for b in args.batch:
        rows, summary = analytic_roofline(
            b, dtype_bytes=2 if args.dtype == "bfloat16" else 4)
        entry = {"analytic": summary}
        if args.per_op and b == args.batch[0]:
            entry["per_op"] = rows
        if args.measure:
            entry["measured"] = measured(b, args.dtype)
        report["configs"][f"b{b}"] = entry
        print(json.dumps({f"b{b}": entry}, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
