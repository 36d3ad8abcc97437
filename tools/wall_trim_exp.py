#!/usr/bin/env python
"""Offline wall length-trim experiment (VERDICT r4 item 7).

The as-built v5 checkpoint's laggard is the wall class (BEV 0.868 vs
door 0.926 / column 0.968) and its 0.25-IoU failures are dominated by
LENGTH/slide regression error, which the yaw-only refinement cannot
touch.  With the r5 checkpoints wiped from /tmp, this experiment
isolates the trim's effect through the REAL eval path: simulate
detections = gt boxes + a realistic regression-noise model, then score
refine(recenter) vs refine(recenter + trim_length) with
utils.eval.evaluate_lidar_ap on synthetic building scenes.

Noise model per class (calibrated to the v5 eval failure modes):
  - walls: length x N(1.0, 0.18) + slide along the element N(0, 0.35 m),
    thin-axis offset N(0, 0.06), yaw N(0, 4 deg)
  - doors: yaw N(0, 8 deg) with 20% +-pi/2 flips (the v5 ranking bug),
    slide N(0, 0.12)
  - columns: center N(0, 0.05) only (refinement never touches them)

CPU-only (numpy + the host eval), safe to run beside a TPU training.
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys

REPO = pathlib.Path(__file__).parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402

from automatic_as_built_reconstruction_tpu.core import point_refine  # noqa: E402
from automatic_as_built_reconstruction_tpu.data import building  # noqa: E402
from automatic_as_built_reconstruction_tpu.utils import eval as eval_mod  # noqa: E402

CLASSES = list(building.CLASSES)          # ("wall", "column", "door")


def noisy_detections(scene, rng):
    boxes = np.asarray(scene["gt_boxes"], np.float64).copy()
    names = np.asarray(scene["gt_names"])
    labels = np.array([CLASSES.index(n) for n in names])
    scores = rng.uniform(0.5, 0.95, len(boxes))
    for i, (b, n) in enumerate(zip(boxes, names)):
        ldir = np.array([-np.sin(b[6]), np.cos(b[6])])
        ndir = np.array([np.cos(b[6]), np.sin(b[6])])
        if n == "wall":
            b[4] *= rng.normal(1.0, 0.18)
            b[:2] += ldir * rng.normal(0, 0.35) + ndir * rng.normal(0, 0.06)
            b[6] += rng.normal(0, np.deg2rad(4))
        elif n == "door":
            b[6] += rng.normal(0, np.deg2rad(8))
            if rng.random() < 0.2:
                b[6] += np.pi / 2 * rng.choice([-1, 1])
            b[:2] += ldir * rng.normal(0, 0.12)
        else:
            b[:2] += rng.normal(0, 0.05, 2)
    return {"box3d_lidar": boxes, "scores": scores, "label_preds": labels}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=96)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    rng = np.random.default_rng(args.seed)

    gt_annos, raw, refined, trimmed = [], [], [], []
    refine_cls = (0, 2)                   # wall + door (the config's list)
    for i in range(args.scenes):
        scene = building.generate_building_scene(args.seed * 100003 + i)
        det = noisy_detections(scene, rng)
        pts = scene["points"][:, :3]
        gt_annos.append({"boxes": scene["gt_boxes"],
                        "names": scene["gt_names"]})
        raw.append(det)
        refined.append(point_refine.refine_detections(
            det, pts, classes=refine_cls, recenter=True))
        trimmed.append(point_refine.refine_detections(
            det, pts, classes=refine_cls, recenter=True, trim_length=True))

    # 0.25 is the detection gate; 0.5/0.7 measure the DIMENSIONAL
    # accuracy an as-built model exists to deliver — length errors only
    # show up there
    for thr in (0.25, 0.5, 0.7):
        iou = {c: thr for c in CLASSES}
        for tag, dets in (("raw", raw), ("refined", refined),
                          ("refined+trim", trimmed)):
            r = eval_mod.evaluate_lidar_ap(gt_annos, dets, CLASSES, iou)
            out = {"variant": tag, "iou": thr,
                   **{k: round(v, 4) for k, v in r.items()
                      if k.endswith(".ap") or k.startswith("mAP")}}
            print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
