#!/usr/bin/env bash
# Run EVERY headline protocol from the single frozen champion bundle
# (results/champion_bundle — see scripts/rebuild_champion.sh). One frozen
# calibration (modal grid, k 8-12), all protocols — the reference's
# one-checkpoint-for-every-eval discipline (compare_methods.py:11-17).
#
# Serial TPU, ~30-40 min (dominated by cascade compiles; cached after first).
set -euo pipefail
cd "$(dirname "$0")/.."
PY="python -m superresolution_for_pdes_tpu"
B=results/champion_bundle

# 1. statistical protocol, N=20 fresh seed 3 (the headline table)
$PY statistical --bundle $B --n_examples 20 --seed 3 \
    --out results/statistical_bundle_n20_seed3

# 2-3. statistical protocol, seeds 0 and 7 (the 640^2 <=0.25 gate is
#      per-seed; N=10 matches the round-3 artifacts)
$PY statistical --bundle $B --n_examples 10 --seed 0 \
    --out results/statistical_bundle_seed0
$PY statistical --bundle $B --n_examples 10 --seed 7 \
    --out results/statistical_bundle_seed7

# 4. committed-artifact protocol (k ~ U(10,11)) from the SAME frozen
#    calibration — the honest cross-protocol number (round 3 recalibrated
#    per protocol; the delta is reported, not hidden)
$PY statistical --bundle $B --k 10 11 --n_examples 10 --seed 0 \
    --out results/statistical_bundle_k1011

# 5. resolution sweep protocol (single scene, k ~ U(10,11), per-level plots)
$PY resolution_comparison --bundle $B --k 10 11 --seed 0 \
    --out results/resolution_bundle

# The evals above ran under set -e, so every artifact must exist; a missing
# copy source is a real failure, not something to paper over (ADVICE r4).
for d in statistical_bundle_n20_seed3 statistical_bundle_seed0 \
         statistical_bundle_seed7 statistical_bundle_k1011; do
    cp results/$d/summary.txt reports/$d.txt
done
cp results/resolution_bundle/resolution_metrics.json reports/resolution_metrics_bundle.json
echo "bundle evals done"
