#!/usr/bin/env python
"""Training-throughput report from a run dir's metrics.jsonl.

Summarizes the steps_per_sec samples the trainer logs every
display_step window: per-chunk curve (decay check — the r4b rehearsal
decayed 0.50 -> 0.27 steps/s from the relay RSS leak; key-match mode
must hold flat), overall mean, and scans/s at the config's batch size.

  python tools/train_throughput_report.py /tmp/kitti_fhd_r5 [--batch 3]

Prints one JSON line (commit it into the bench artifacts) plus a
human-readable curve.
"""
from __future__ import annotations

import argparse
import json
import pathlib


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--batch", type=int, default=3)
    args = ap.parse_args()

    path = pathlib.Path(args.run_dir) / "metrics.jsonl"
    samples = []   # (step, steps_per_sec)
    for line in path.read_text().splitlines():
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            continue
        if rec.get("prefix") == "train" and "steps_per_sec" in rec:
            samples.append((int(rec["step"]), float(rec["steps_per_sec"])))
    if not samples:
        print(json.dumps({"error": "no steps_per_sec samples"}))
        return 1
    samples.sort()
    # drop each chunk's first window (it amortizes the chunk's
    # compile/warm overhead) — detected ONLY by the step gap, never by
    # a low rate: a genuinely collapsed-throughput window is exactly
    # what the decay_ratio must keep, not filter out
    steady = []
    prev_step = None
    for step, sps in samples:
        fresh_chunk = prev_step is None or step - prev_step > 200
        if not fresh_chunk:
            steady.append((step, sps))
        prev_step = step
    use = steady or samples
    rates = [s for _, s in use]
    n = len(rates)
    first_q = sum(rates[:max(n // 4, 1)]) / max(n // 4, 1)
    last_q = sum(rates[-max(n // 4, 1):]) / max(n // 4, 1)
    mean = sum(rates) / n
    out = {
        "train_steps_per_sec_mean": round(mean, 3),
        "train_scans_per_sec": round(mean * args.batch, 3),
        "first_quartile_mean": round(first_q, 3),
        "last_quartile_mean": round(last_q, 3),
        "decay_ratio": round(last_q / max(first_q, 1e-9), 3),
        "n_windows": n,
        "step_range": [use[0][0], use[-1][0]],
    }
    for step, sps in use[:: max(n // 20, 1)]:
        print(f"  step {step:>6}  {sps:.3f} steps/s")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
