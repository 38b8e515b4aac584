#!/usr/bin/env bash
# Run EVERY headline protocol from a single frozen champion bundle
# (default results/champion_bundle — see scripts/rebuild_champion.sh). One
# frozen calibration (modal grid, k 8-12), all protocols — the reference's
# one-checkpoint-for-every-eval discipline (compare_methods.py:11-17).
#
# Usage: eval_champion_bundle.sh [BUNDLE_DIR] [TAG]
#   BUNDLE_DIR  bundle to evaluate   (default results/champion_bundle)
#   TAG         artifact name suffix (default "bundle"; e.g. "bundle_r5"
#               writes reports/statistical_bundle_r5_n20_seed3.txt etc.)
#
# Serial TPU, ~30-40 min (dominated by cascade compiles; cached after first).
set -euo pipefail
cd "$(dirname "$0")/.."
PY="python -m superresolution_for_pdes_tpu"
B=${1:-results/champion_bundle}
TAG=${2:-bundle}

# 1. statistical protocol, N=20 fresh seed 3 (the headline table)
$PY statistical --bundle $B --n_examples 20 --seed 3 \
    --out results/statistical_${TAG}_n20_seed3

# 2-3. statistical protocol, seeds 0 and 7 (the 640^2 <=0.25 gate is
#      per-seed; N=10 matches the round-3 artifacts)
$PY statistical --bundle $B --n_examples 10 --seed 0 \
    --out results/statistical_${TAG}_seed0
$PY statistical --bundle $B --n_examples 10 --seed 7 \
    --out results/statistical_${TAG}_seed7

# 4. committed-artifact protocol (k ~ U(10,11)) from the SAME frozen
#    calibration — the honest cross-protocol number (round 3 recalibrated
#    per protocol; the delta is reported, not hidden)
$PY statistical --bundle $B --k 10 11 --n_examples 10 --seed 0 \
    --out results/statistical_${TAG}_k1011

# 5. resolution sweep protocol (single scene, k ~ U(10,11), per-level plots)
$PY resolution_comparison --bundle $B --k 10 11 --seed 0 \
    --out results/resolution_${TAG}

# The evals above ran under set -e, so every artifact must exist; a missing
# copy source is a real failure, not something to paper over (ADVICE r4).
for d in statistical_${TAG}_n20_seed3 statistical_${TAG}_seed0 \
         statistical_${TAG}_seed7 statistical_${TAG}_k1011; do
    cp results/$d/summary.txt reports/$d.txt
done
cp results/resolution_${TAG}/resolution_metrics.json reports/resolution_metrics_${TAG}.json
echo "bundle evals done (${B} -> reports/*_${TAG}_*)"
