#!/bin/bash
# Round-5 endgame sequence — run when the rehearsal has vacated the
# chip: (1) PFN/segment-scan probe, (2) tile-128/192 grouped key-match
# probe, (3) training-throughput report from the rehearsal metrics,
# (4) a full default bench to refresh the live-headline sidecar the
# driver's end-of-round run replays.  Each step bounded; logs under
# artifacts/.
set -u
cd /root/repo
echo "=== endgame $(date +%H:%M:%S) ==="
timeout 1500 python tools/rpn_profile_probe.py \
    > artifacts/rpn_profile_r5b.log 2>&1
echo "rpn/pfn probe rc=$? ($(date +%H:%M:%S))"
timeout 1500 python tools/fhd_perf_probe.py --modes 128,192 \
    > artifacts/fhd_modes_r5.log 2>&1
echo "modes probe rc=$? ($(date +%H:%M:%S))"
python tools/train_throughput_report.py /tmp/kitti_fhd_r5 --batch 3 \
    > artifacts/train_throughput_r5.log 2>&1
echo "throughput report rc=$?"
timeout 2100 python bench.py > artifacts/bench_r5_final.log 2>&1
echo "final bench rc=$? ($(date +%H:%M:%S))"
grep "^{" artifacts/fhd_modes_r5.log | tail -3
grep "^{" artifacts/rpn_profile_r5b.log | tail -4
tail -1 artifacts/train_throughput_r5.log
