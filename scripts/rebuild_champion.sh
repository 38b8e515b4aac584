#!/usr/bin/env bash
# One-command rebuild of the champion chain + frozen bundle.
#
# Serial TPU wall-clock ~2.5 h (vs the round-3 chain's 5-6 h): this chain
# drops level1b entirely and trains the L2 expert (sfl2f) on the matched
# r7+sfl1e teacher instead. Measured delta of that swap (reports/RECIPES.md
# round-4 dead-ends): sfl2f is neutral-to-slightly-worse at the shallow
# levels — 80²/160² rel-L2 0.106/0.167 vs the level1b-taught sfl2e chain's
# 0.091/0.161. That ~0.01 rel-L2 is the stated time-for-accuracy tradeoff of
# a level1b-free rebuild; a rebuild landing at ~0.106/0.167 is on-recipe,
# not a regression. The deep expert trains tile-80 windows with chunked
# datagen (--gen_selffeed_chunk) inside the 16 GB HBM envelope.
#
# Every stage is seeded and regenerates its data on-device; no npz downloads
# (the tunnel moves 0.2 MB/s — see CLAUDE.md). Run on the real chip, one
# process at a time (the TPU is single-holder).
#
# Stages (each skipped iff its run dir holds a best_model checkpoint —
# a crashed stage leaves no best_model and is retrained on rerun):
#   1. flagship_r7 — generalist teacher            (~35 min)
#   2. sfl1e      — full-field L1 expert           (~25 min)
#   3. sfl2f      — full-field L2 expert, matched  (~30 min)
#   4. sfl34g     — tile-80 deep expert, chunked   (~60 min)
#   5. freeze the bundle (modal grid cal k 8-12) to results/champion_bundle
#
# Each training stage logs to results/rebuild_<stage>.log; on failure the
# log is copied to reports/rebuild_<stage>_FAILED.log so a dead stage leaves
# a visible artifact (SURVEY §5: failure detection the reference lacks).
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p results reports
PY="python -m superresolution_for_pdes_tpu"

# A stage is complete only if its best_model checkpoint exists (cli/train.py
# creates the run dir before training starts, so the dir alone proves
# nothing — ADVICE r4).
have() { compgen -G "results/${1}_run_*/best_model" > /dev/null; }

# Resolve a completed stage's run dir uniquely: newest run that has a
# best_model. Fails loudly if none exists.
rundir() {
    local d
    d=$(ls -dt results/${1}_run_*/best_model 2>/dev/null | head -1) || true
    if [ -z "${d:-}" ]; then
        echo "ERROR: no completed ${1} run (results/${1}_run_*/best_model missing)" >&2
        return 1
    fi
    echo "${d%/best_model}"
}

# run_stage <name> <train args...>: train with a per-stage log, verify the
# checkpoint landed, and leave a committed failure artifact if not.
run_stage() {
    local name=$1; shift
    local log="results/rebuild_${name}.log"
    echo "=== stage ${name}: training (log: ${log}) ==="
    if ! $PY train "$@" --prefix "${name}_" > "$log" 2>&1; then
        # The axon tunnel client leaks host RSS (~0.3 GB/epoch measured round
        # 5); a long run can be OOM-killed AFTER the loop has persisted its
        # best checkpoint (sfl34g, round 5: killed at epoch 360, best @323
        # already on disk). If the run logged >=150 epochs and best_model
        # exists, continue loudly with the persisted best.
        local epochs=0
        if compgen -G "results/${name}_run_*/metrics.jsonl" > /dev/null; then
            epochs=$(cat results/${name}_run_*/metrics.jsonl | wc -l)
        fi
        if have "$name" && [ "$epochs" -ge 150 ]; then
            cp "$log" "reports/rebuild_${name}_KILLED_CONTINUED.log"
            echo "WARNING: stage ${name} exited nonzero after ${epochs} logged epochs" \
                 "but best_model was persisted — continuing with it" \
                 "(log: reports/rebuild_${name}_KILLED_CONTINUED.log)" >&2
            echo "=== stage ${name}: done-after-crash ($(rundir "$name")) ==="
            return 0
        fi
        cp "$log" "reports/rebuild_${name}_FAILED.log"
        echo "ERROR: stage ${name} exited nonzero — log at reports/rebuild_${name}_FAILED.log" >&2
        exit 1
    fi
    if ! have "$name"; then
        cp "$log" "reports/rebuild_${name}_FAILED.log"
        echo "ERROR: stage ${name} finished but wrote no best_model — log at reports/rebuild_${name}_FAILED.log" >&2
        exit 1
    fi
    echo "=== stage ${name}: done ($(rundir "$name")) ==="
}

have flagship_r7 || run_stage flagship_r7 --generate --gen_stream --gen_theta mixed \
    --gen_cascade_scenes 384 --gen_tiles_per_level 12 --gen_cascade_k 6 12 \
    --normalization per_sample --scale_channels --physics_weight 0.3 \
    --epochs 1000 --early_stopping_patience 50 --plateau_patience 25
R7=$(rundir flagship_r7)

have sfl1e || run_stage sfl1e --generate --gen_stream --gen_theta mixed \
    --gen_standard 0 --gen_subdomain 0 \
    --gen_cascade_scenes 2048 --gen_cascade_coarsest 40 --gen_cascade_finest 80 \
    --gen_cascade_k 6 12 --gen_tile_size 40 --gen_tiles_per_level 1 --gen_every 2 \
    --normalization per_sample --scale_channels --physics_weight 0.3 \
    --epochs 1200 --early_stopping_patience 60 --plateau_patience 30
SFL1E=$(rundir sfl1e)

have sfl2f || run_stage sfl2f --generate --gen_stream --gen_theta mixed \
    --gen_standard 0 --gen_subdomain 0 --gen_cascade_scenes 0 \
    --gen_selffeed_scenes 768 --gen_selffeed_model "$R7" \
    --gen_selffeed_model_level1 "$SFL1E" \
    --gen_selffeed_finest 160 --gen_selffeed_harvest_from 80 \
    --gen_selffeed_amp 32 --gen_selffeed_k 6 12 --gen_selffeed_teacher_tile 40 \
    --gen_tile_size 80 --gen_tiles_per_level 1 --gen_every 2 \
    --normalization per_sample --scale_channels --physics_weight 0.3 \
    --epochs 1200 --early_stopping_patience 60 --plateau_patience 30
SFL2F=$(rundir sfl2f)

# 128 scenes, not 256: at 256 the on-device residency (3.3 GB tile set +
# the b32 160x160-input train program) exhausts the 16 GB chip at the first
# validation pass (reports/rebuild_sfl34g_FAILED.log, round 5). 128 scenes x
# 8 tiles x 2 levels = 2048 samples/epoch — still above the 1536 the
# round-4 sfl34f screen showed is enough for this expert — and --gen_stream
# regenerates fresh scenes every 2 epochs, so total unique data is unchanged.
have sfl34g || run_stage sfl34g --generate --gen_stream --gen_theta mixed \
    --gen_standard 0 --gen_subdomain 0 --gen_cascade_scenes 0 \
    --gen_selffeed_scenes 128 --gen_selffeed_chunk 32 \
    --gen_selffeed_model "$R7" \
    --gen_selffeed_model_level1 "$SFL1E" \
    --gen_selffeed_model_level 2 "$SFL2F" \
    --gen_selffeed_finest 640 --gen_selffeed_harvest_from 160 \
    --gen_selffeed_amp 32 --gen_selffeed_k 6 12 \
    --gen_selffeed_teacher_tile 40 80 20 \
    --gen_tile_size 80 --gen_tiles_per_level 8 --gen_every 2 \
    --normalization per_sample --scale_channels --physics_weight 0.3 \
    --epochs 1200 --early_stopping_patience 60 --plateau_patience 30
SFL34G=$(rundir sfl34g)

# Freeze the single champion bundle every protocol quotes from.
$PY upscale --model_path "$R7" \
    --model_path_level1 "$SFL1E" \
    --model_path_level 2 "$SFL2F" \
    --model_path_level 3 "$SFL34G" \
    --model_path_level 4 "$SFL34G" \
    --stats_mode tile --tile_levels 40 80 80 \
    --amp_calibrate 32 --amp_k 8 12 --amp_bpo 4 \
    --save_bundle results/champion_bundle --target 640 --out results/upscaled_champion

echo "=== rebuild summary ==="
for s in flagship_r7 sfl1e sfl2f sfl34g; do
    if have "$s"; then echo "  $s: OK ($(rundir $s))"; else echo "  $s: MISSING"; fi
done
[ -d results/champion_bundle ] && echo "  bundle: frozen at results/champion_bundle" \
    || { echo "  bundle: MISSING" >&2; exit 1; }
