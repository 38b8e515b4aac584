#!/usr/bin/env bash
# One-command rebuild of the round-4 champion chain + frozen bundle.
#
# Serial TPU wall-clock ~2.5 h (vs the round-3 chain's 5-6 h): the round-4
# chain drops level1b entirely (the sfl2f teacher-matching screen,
# reports/RECIPES.md dead-ends, showed the r7+sfl1e teacher is equivalent)
# and the deep expert trains tile-80 windows with chunked datagen
# (--gen_selffeed_chunk) inside the 16 GB HBM envelope.
#
# Every stage is seeded and regenerates its data on-device; no npz downloads
# (the tunnel moves 0.2 MB/s — see CLAUDE.md). Run on the real chip, one
# process at a time (the TPU is single-holder).
#
# Stages (each skippable if its run dir already exists):
#   1. flagship_r7 — generalist teacher            (~35 min)
#   2. sfl1e      — full-field L1 expert           (~25 min)
#   3. sfl2f      — full-field L2 expert, matched  (~30 min)
#   4. sfl34g     — tile-80 deep expert, chunked   (~60 min)
#   5. freeze the bundle (modal grid cal k 8-12) to results/champion_bundle
set -euo pipefail
cd "$(dirname "$0")/.."
PY="python -m superresolution_for_pdes_tpu"

have() { compgen -G "results/${1}_run_*" > /dev/null; }

have flagship_r7 || $PY train --generate --gen_stream --gen_theta mixed \
    --gen_cascade_scenes 384 --gen_tiles_per_level 12 --gen_cascade_k 6 12 \
    --normalization per_sample --scale_channels --physics_weight 0.3 \
    --epochs 1000 --early_stopping_patience 50 --plateau_patience 25 \
    --prefix flagship_r7_

have sfl1e || $PY train --generate --gen_stream --gen_theta mixed \
    --gen_standard 0 --gen_subdomain 0 \
    --gen_cascade_scenes 2048 --gen_cascade_coarsest 40 --gen_cascade_finest 80 \
    --gen_cascade_k 6 12 --gen_tile_size 40 --gen_tiles_per_level 1 --gen_every 2 \
    --normalization per_sample --scale_channels --physics_weight 0.3 \
    --epochs 1200 --early_stopping_patience 60 --plateau_patience 30 \
    --prefix sfl1e_

have sfl2f || $PY train --generate --gen_stream --gen_theta mixed \
    --gen_standard 0 --gen_subdomain 0 --gen_cascade_scenes 0 \
    --gen_selffeed_scenes 768 --gen_selffeed_model results/flagship_r7_run_* \
    --gen_selffeed_model_level1 results/sfl1e_run_* \
    --gen_selffeed_finest 160 --gen_selffeed_harvest_from 80 \
    --gen_selffeed_amp 32 --gen_selffeed_k 6 12 --gen_selffeed_teacher_tile 40 \
    --gen_tile_size 80 --gen_tiles_per_level 1 --gen_every 2 \
    --normalization per_sample --scale_channels --physics_weight 0.3 \
    --epochs 1200 --early_stopping_patience 60 --plateau_patience 30 \
    --prefix sfl2f_

have sfl34g || $PY train --generate --gen_stream --gen_theta mixed \
    --gen_standard 0 --gen_subdomain 0 --gen_cascade_scenes 0 \
    --gen_selffeed_scenes 256 --gen_selffeed_chunk 32 \
    --gen_selffeed_model results/flagship_r7_run_* \
    --gen_selffeed_model_level1 results/sfl1e_run_* \
    --gen_selffeed_model_level 2 results/sfl2f_run_* \
    --gen_selffeed_finest 640 --gen_selffeed_harvest_from 160 \
    --gen_selffeed_amp 32 --gen_selffeed_k 6 12 \
    --gen_selffeed_teacher_tile 40 80 20 \
    --gen_tile_size 80 --gen_tiles_per_level 8 --gen_every 2 \
    --normalization per_sample --scale_channels --physics_weight 0.3 \
    --epochs 1200 --early_stopping_patience 60 --plateau_patience 30 \
    --prefix sfl34g_

# Freeze the single champion bundle every protocol quotes from.
$PY upscale --model_path results/flagship_r7_run_* \
    --model_path_level1 results/sfl1e_run_* \
    --model_path_level 2 results/sfl2f_run_* \
    --model_path_level 3 results/sfl34g_run_* \
    --model_path_level 4 results/sfl34g_run_* \
    --stats_mode tile --tile_levels 40 80 80 \
    --amp_calibrate 32 --amp_k 8 12 --amp_bpo 4 \
    --save_bundle results/champion_bundle --target 640 --out results/upscaled_champion
echo "champion bundle frozen at results/champion_bundle"
