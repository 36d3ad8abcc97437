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
# site caps measured over 40 mc train scans (measure_site_caps, safety
# 1.15) -- the heuristic default risks the saturation fail-fast
exec bash tools/run_rehearsal_r5.sh --config second/all.fhd.config \
    --lr_max 0.0025 --out_caps 47232,49920,31616,30336 "$@"
