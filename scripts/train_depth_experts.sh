#!/usr/bin/env bash
# Round-5 context-at-depth experts (reports/ROUND5.md §2), run AFTER
# scripts/rebuild_champion.sh has left flagship_r7 + sfl1e + sfl2f complete.
#
# Round 4 proved training-time context is the whole game at the shallow
# levels (full-field experts cut rel-L2 ~4x at L1/L2) but stopped at level 2:
# the deep expert still sees 80^2 windows. These two stages apply the same
# move at depth, inside the 16 GB HBM envelope via chunked selffeed datagen:
#
#   sfl3e — FULL-FIELD L3 expert: pure-selffeed 160^2->320^2 whole-field
#           pairs (one window per scene) from the frozen r7+sfl1e+sfl2f
#           teacher (teacher runs full-field through L2, tiles 40/80).
#           320^2-input U-Net => --batch_size 8 (activation parity with the
#           b32 160^2-input programs that fit the chip).
#   sfl4h — matched L4 expert taught on the UPDATED chain (teacher runs
#           full-field through L3 with sfl3e): 160^2 windows of the
#           320^2->640^2 stage — 4x the context of sfl34g's 80^2 windows.
#
# Then freeze results/champion_bundle_r5 with the per-level schedule
# --tile_levels 40 80 160 160 (full-field L1/L2/L3 + 160^2 windows at L4).
# Fallback if a stage dies (RECIPES round-4 kernel-fault note): sfl34g
# remains the banked deep expert for both levels (tile_levels 40 80 80).
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p results reports
PY="python -m superresolution_for_pdes_tpu"

have() { compgen -G "results/${1}_run_*/best_model" > /dev/null; }
rundir() {
    local d
    d=$(ls -dt results/${1}_run_*/best_model 2>/dev/null | head -1) || true
    if [ -z "${d:-}" ]; then
        echo "ERROR: no completed ${1} run (results/${1}_run_*/best_model missing)" >&2
        return 1
    fi
    echo "${d%/best_model}"
}
run_stage() {
    local name=$1; shift
    local log="results/rebuild_${name}.log"
    echo "=== stage ${name}: training (log: ${log}) ==="
    if ! $PY train "$@" --prefix "${name}_" > "$log" 2>&1; then
        # The axon tunnel client leaks host RSS (~0.3 GB/epoch measured round
        # 5); a long run can be OOM-killed AFTER the loop has persisted its
        # best checkpoint. If the run logged >=150 epochs and best_model
        # exists, the persisted best is a converged (or near-converged)
        # expert — continue loudly instead of aborting the chain.
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

R7=$(rundir flagship_r7)
SFL1E=$(rundir sfl1e)
SFL2F=$(rundir sfl2f)

# Full-field L3: scenes only reach 320^2 (finest=320) so the multires solve
# is cheap; the teacher runs 40->80->160 full-field. 256 scenes x 1 window
# = 256 samples/epoch, regenerated fresh every 2 epochs (--gen_stream).
have sfl3e || run_stage sfl3e --generate --gen_stream --gen_theta mixed \
    --gen_standard 0 --gen_subdomain 0 --gen_cascade_scenes 0 \
    --gen_selffeed_scenes 256 --gen_selffeed_chunk 32 \
    --gen_selffeed_model "$R7" \
    --gen_selffeed_model_level1 "$SFL1E" \
    --gen_selffeed_model_level 2 "$SFL2F" \
    --gen_selffeed_finest 320 --gen_selffeed_harvest_from 160 \
    --gen_selffeed_amp 16 --gen_selffeed_k 6 12 \
    --gen_selffeed_teacher_tile 40 80 \
    --gen_tile_size 160 --gen_tiles_per_level 1 --gen_every 2 \
    --batch_size 8 \
    --normalization per_sample --scale_channels --physics_weight 0.3 \
    --epochs 1200 --early_stopping_patience 60 --plateau_patience 30
SFL3E=$(rundir sfl3e)

# L4 on the UPDATED teacher (full-field through L3 with sfl3e): 128 scenes
# x 4 windows of the 320^2->640^2 stage = 512 samples/epoch. finest=640
# scenes are the expensive part — chunk 16 keeps the solve + teacher
# residency bounded.
have sfl4h || run_stage sfl4h --generate --gen_stream --gen_theta mixed \
    --gen_standard 0 --gen_subdomain 0 --gen_cascade_scenes 0 \
    --gen_selffeed_scenes 128 --gen_selffeed_chunk 16 \
    --gen_selffeed_model "$R7" \
    --gen_selffeed_model_level1 "$SFL1E" \
    --gen_selffeed_model_level 2 "$SFL2F" \
    --gen_selffeed_model_level 3 "$SFL3E" \
    --gen_selffeed_finest 640 --gen_selffeed_harvest_from 320 \
    --gen_selffeed_amp 16 --gen_selffeed_k 6 12 \
    --gen_selffeed_teacher_tile 40 80 160 \
    --gen_tile_size 160 --gen_tiles_per_level 4 --gen_every 2 \
    --batch_size 8 \
    --normalization per_sample --scale_channels --physics_weight 0.3 \
    --epochs 1200 --early_stopping_patience 60 --plateau_patience 30
SFL4H=$(rundir sfl4h)

# Freeze the round-5 bundle: full-field L1/L2/L3, 160^2-window L4.
$PY upscale --model_path "$R7" \
    --model_path_level1 "$SFL1E" \
    --model_path_level 2 "$SFL2F" \
    --model_path_level 3 "$SFL3E" \
    --model_path_level 4 "$SFL4H" \
    --stats_mode tile --tile_levels 40 80 160 160 \
    --amp_calibrate 32 --amp_k 8 12 --amp_bpo 4 \
    --save_bundle results/champion_bundle_r5 --target 640 --out results/upscaled_r5

echo "=== depth-expert summary ==="
for s in sfl3e sfl4h; do
    if have "$s"; then echo "  $s: OK ($(rundir $s))"; else echo "  $s: MISSING"; fi
done
[ -d results/champion_bundle_r5 ] && echo "  bundle: frozen at results/champion_bundle_r5" \
    || { echo "  bundle: MISSING" >&2; exit 1; }
