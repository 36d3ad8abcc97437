#!/bin/bash
# Supervised full-length rehearsal: retries the chunk-ladder driver
# across TPU relay crashes (each retry resumes from the newest orbax
# checkpoint).  Aborts only if three consecutive retries make no
# checkpoint progress — that means a deterministic failure, not relay
# flake.
#
# Usage: tools/run_rehearsal_supervised.sh [extra kitti_rehearsal.py args]
set -u
cd /root/repo
LOG=${LOG:-/root/repo/artifacts/kitti_rehearsal_r4d.log}
DATA=${DATA:-/tmp/synth_kitti}
RUN=${RUN:-/tmp/kitti_fhd_r4d}
STEPS=${STEPS:-10000}

if [ ! -f "$DATA/kitti_infos_train.pkl" ]; then
  echo "=== generating synthetic KITTI ===" >> "$LOG"
  python tools/make_synth_kitti.py --root "$DATA" \
      --num_train 400 --num_val 100 >> "$LOG" 2>&1 || exit 1
fi

ckpt_step() {
  ls "$RUN/checkpoints" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1
}

stale=0
for attempt in $(seq 1 40); do
  before=$(ckpt_step); before=${before:-0}
  echo "=== supervisor attempt $attempt (ckpt at step $before) ===" >> "$LOG"
  python tools/kitti_rehearsal.py --data_root "$DATA" --model_dir "$RUN" \
      --steps "$STEPS" --chunk 400 --batch_size 3 "$@" >> "$LOG" 2>&1
  rc=$?
  if [ "$rc" -eq 0 ]; then
    echo "supervisor: rehearsal complete rc=0" >> "$LOG"
    exit 0
  fi
  after=$(ckpt_step); after=${after:-0}
  if [ "$after" -le "$before" ]; then
    stale=$((stale + 1))
    if [ "$stale" -ge 3 ]; then
      echo "supervisor: no progress after $stale consecutive retries" \
           "(stuck at step $after) — aborting" >> "$LOG"
      exit 1
    fi
  else
    stale=0
  fi
  echo "supervisor: rc=$rc at step $after; retrying in 90s" >> "$LOG"
  sleep 90
done
echo "supervisor: retry budget exhausted" >> "$LOG"
exit 1
