#!/bin/bash
# Round-5 supervised rehearsal driver: key-match training (no host
# rulebooks — the r4c 140 MB/step relay leak is gone by construction),
# retries across TPU relay crashes, milestone evals, and a WALL-CLOCK
# DEADLINE so the run always vacates the chip before the driver's
# end-of-round bench.
#
# Usage:
#   DEADLINE_UNIX=<epoch> tools/run_rehearsal_r5.sh [extra args]
set -u
cd /root/repo
LOG=${LOG:-/root/repo/artifacts/kitti_rehearsal_r5.log}
DATA=${DATA:-/tmp/synth_kitti}
RUN=${RUN:-/tmp/kitti_fhd_r5}
STEPS=${STEPS:-9000}
CHUNK=${CHUNK:-400}
EVAL_AT=${EVAL_AT:-6000,9000}
DEADLINE_UNIX=${DEADLINE_UNIX:-0}
MULTICLASS=${MULTICLASS:-}

if [ ! -f "$DATA/kitti_infos_train.pkl" ]; then
  echo "=== generating synthetic KITTI ($DATA) ===" >> "$LOG"
  python tools/make_synth_kitti.py --root "$DATA" \
      --num_train 400 --num_val 100 $MULTICLASS >> "$LOG" 2>&1 || exit 1
fi

ckpt_step() {
  ls "$RUN/checkpoints" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1
}

stale=0
for attempt in $(seq 1 60); do
  if [ "$DEADLINE_UNIX" -gt 0 ] && [ "$(date +%s)" -ge "$DEADLINE_UNIX" ]; then
    echo "supervisor: deadline reached at step $(ckpt_step) — vacating" \
         "the chip (resume later from the checkpoint)" >> "$LOG"
    exit 3
  fi
  before=$(ckpt_step); before=${before:-0}
  echo "=== supervisor attempt $attempt (ckpt at step $before, $(date +%H:%M:%S)) ===" >> "$LOG"
  python tools/kitti_rehearsal.py --data_root "$DATA" --model_dir "$RUN" \
      --steps "$STEPS" --chunk "$CHUNK" --batch_size 3 \
      --keymatch --dense_tail 1 --eval_at "$EVAL_AT" "$@" >> "$LOG" 2>&1
  rc=$?
  if [ "$rc" -eq 0 ]; then
    echo "supervisor: rehearsal complete rc=0" >> "$LOG"
    exit 0
  fi
  after=$(ckpt_step); after=${after:-0}
  if [ "$after" -le "$before" ]; then
    stale=$((stale + 1))
    if [ "$stale" -ge 4 ]; then
      echo "supervisor: no progress after $stale consecutive retries" \
           "(stuck at step $after) — aborting" >> "$LOG"
      exit 1
    fi
  else
    stale=0
  fi
  echo "supervisor: rc=$rc at step $after; retrying in 120s" >> "$LOG"
  sleep 120
done
echo "supervisor: retry budget exhausted" >> "$LOG"
exit 1
