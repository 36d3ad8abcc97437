"""Structural-consistency filter experiment (CPU, no TPU needed).

Hypothesis: the v3 door-AP regression is precision — gt-db pasting
teaches context-free doors, so the detector fires "door" in open space.
An as-built model knows a door must live IN a wall; this script measures
door AP with detections post-filtered by proximity to detected wall
segments (the same geometry `utils/asbuilt_export` uses).

Usage: python tools/door_filter_exp.py --config /tmp/asbuilt_v3/asbuilt_v3.config \
           --model_dir /tmp/asbuilt_v3 [--dets /tmp/v3_dets.pkl]
"""
from __future__ import annotations

import argparse
import pathlib
import pickle
import sys

import numpy as np

REPO = pathlib.Path(__file__).parent.parent
sys.path.insert(0, str(REPO))


def collect_detections(config, model_dir, out_pkl):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from automatic_as_built_reconstruction_tpu.data import batching
    from automatic_as_built_reconstruction_tpu.train import (
        checkpoint as ckpt_mod)
    from automatic_as_built_reconstruction_tpu.train import train as tm

    bundle = tm.Bundle(config)
    prep_ds, loader = bundle.input_reader(training=False)
    state, _ = tm.init_state(bundle)
    restored, step = ckpt_mod.try_restore_latest(model_dir, state)
    assert restored is not None
    state = restored
    print(f"checkpoint step {step}; {len(prep_ds.dataset)} val scenes")
    predict_fn = tm.make_predict_fn(bundle)
    dets, gts = [], []
    for i in range(len(prep_ds.dataset)):
        ex = prep_ds.example(i, seed=0)
        batch = batching.merge_batch([ex])
        dev = {k: jnp.asarray(v)
               for k, v in batching.device_example(batch).items()}
        out = jax.device_get(predict_fn(state["params"],
                                        state["batch_stats"], dev))
        v = out["valid"][0]
        dets.append({"box3d_lidar": out["box3d_lidar"][0][v],
                     "scores": out["scores"][0][v],
                     "label_preds": out["label_preds"][0][v]})
        sd = prep_ds.dataset.get_sensor_data(i)
        gts.append({"boxes": np.asarray(sd["annotations"]["boxes"],
                                        np.float64),
                    "names": sd["annotations"]["names"]})
        print(f"  scene {i}: {int(v.sum())} dets")
    with open(out_pkl, "wb") as f:
        pickle.dump({"dets": dets, "gts": gts,
                     "classes": prep_ds.dataset._class_names,
                     "iou": prep_ds.dataset._eval_iou}, f)
    return dets, gts


def door_wall_distance(det, wall_score=0.3):
    """Per-detection distance from each door center to the nearest
    detected wall SEGMENT (not merged runs — raw boxes suffice)."""
    boxes = np.asarray(det["box3d_lidar"], np.float64)
    labels = np.asarray(det["label_preds"])
    scores = np.asarray(det["scores"])
    walls = boxes[(labels == 0) & (scores >= wall_score)]
    doors = np.where(labels == 2)[0]
    dist = np.full(len(boxes), np.inf)
    if len(walls) == 0:
        return dist
    axes = np.stack([-np.sin(walls[:, 6]), np.cos(walls[:, 6])], 1)
    a = walls[:, :2] - axes * walls[:, 4:5] / 2
    b = walls[:, :2] + axes * walls[:, 4:5] / 2
    ab = b - a
    ln2 = np.maximum((ab ** 2).sum(1), 1e-9)
    for i in doors:
        c = boxes[i, :2]
        t = np.clip(((c - a) * ab).sum(1) / ln2, 0, 1)
        p = a + t[:, None] * ab
        dist[i] = np.sqrt(((p - c) ** 2).sum(1)).min()
    return dist


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--model_dir", required=True)
    ap.add_argument("--dets", default="/tmp/v3_dets.pkl")
    args = ap.parse_args()

    p = pathlib.Path(args.dets)
    if p.exists():
        with open(p, "rb") as f:
            d = pickle.load(f)
        dets, gts = d["dets"], d["gts"]
        classes, iou = d["classes"], d["iou"]
    else:
        dets, gts = collect_detections(args.config, args.model_dir, p)
        with open(p, "rb") as f:
            d = pickle.load(f)
        classes, iou = d["classes"], d["iou"]

    from automatic_as_built_reconstruction_tpu.utils import eval as ev

    base = ev.evaluate_lidar_ap(gts, dets, classes, iou)
    print(f"baseline: door.bev {base['door.bev.ap']:.4f} "
          f"mAP.bev {base['mAP.bev']:.4f}")

    for tol in (0.3, 0.5, 0.8):
        for ws in (0.2, 0.35):
            filt = []
            for det in dets:
                dist = door_wall_distance(det, wall_score=ws)
                labels = np.asarray(det["label_preds"])
                keep = (labels != 2) | (dist <= tol)
                filt.append({k: np.asarray(v)[keep]
                             for k, v in det.items()})
            r = ev.evaluate_lidar_ap(gts, filt, classes, iou)
            print(f"filter tol={tol} wall_score={ws}: "
                  f"door.bev {r['door.bev.ap']:.4f} "
                  f"wall.bev {r['wall.bev.ap']:.4f} "
                  f"mAP.bev {r['mAP.bev']:.4f}")


if __name__ == "__main__":
    main()
