#!/bin/bash
# Multi-class (Car/Pedestrian/Cyclist) rehearsal on the synthetic KITTI
# clone — VERDICT r4 item 5: train all.fhd to a per-class AP table
# through the devkit path.  Same supervised pattern as the car run.
set -u
cd /root/repo
export LOG=${LOG:-/root/repo/artifacts/kitti_rehearsal_r5_mc.log}
export DATA=${DATA:-/tmp/synth_kitti_mc}
export RUN=${RUN:-/tmp/kitti_mc_r5}
export STEPS=${STEPS:-2400}
export CHUNK=${CHUNK:-800}
export EVAL_AT=${EVAL_AT:-}
export MULTICLASS="--multiclass"
# site caps measured through the REAL augmented prep (75 examples,
# tools/measure_caps_prepped.py, safety 1.2) — raw-scan measurement
# underestimates ~60% at block 0 once gt-db paste-in lands (the r5
# saturation fail-fast lesson)
exec bash tools/run_rehearsal_r5.sh --config second/all.fhd.config \
    --lr_max 0.0025 --out_caps 52352,53888,30464,29184 "$@"
