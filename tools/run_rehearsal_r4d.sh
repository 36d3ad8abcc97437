#!/bin/bash
# Round-4 continuation: full-length synthetic-KITTI dress rehearsal.
# Regenerates the heading-asymmetric data (hood/windshield profile on
# cars -> direction classifier has signal), then trains car.fhd for
# 10k one-cycle steps in key-match mode (no host rulebooks) and
# evaluates through the devkit-protocol path.
set -u
cd /root/repo
LOG=/root/repo/artifacts/kitti_rehearsal_r4d.log
DATA=/tmp/synth_kitti
RUN=/tmp/kitti_fhd_r4d

if [ ! -f "$DATA/kitti_infos_train.pkl" ]; then
  echo "=== generating synthetic KITTI ===" >> "$LOG"
  python tools/make_synth_kitti.py --root "$DATA" \
      --num_train 400 --num_val 100 >> "$LOG" 2>&1 || exit 1
fi

python tools/kitti_rehearsal.py --data_root "$DATA" --model_dir "$RUN" \
    --steps 10000 --chunk 400 --batch_size 3 --keymatch \
    >> "$LOG" 2>&1
echo "rehearsal rc=$?" >> "$LOG"
