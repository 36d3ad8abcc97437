"""Predict-time ranking experiments on a trained as-built checkpoint.

The door plateau (~0.6 3D AP) is a RANKING failure: a wrong-yaw
duplicate of a thin box has near-zero IoU with the correct detection,
so rotated NMS keeps both and the duplicate sometimes outscores the
right one (tools/door_filter_exp.py).  The v5 yaw-quality head fixes
part of it (0.589 -> 0.623).  This tool sweeps the two remaining
predict-time knobs OFFLINE on CPU — no retraining, no TPU client:

  1. yaw_quality_predict_power: score *= sigmoid(q)**power (sharpens
     the quality discrimination),
  2. center-distance suppression: after NMS, greedily drop a detection
     whose BEV center lies within R meters of a higher-scored same-class
     detection — exactly the wrong-yaw-duplicate geometry that rotated
     IoU cannot see.

Usage:
  python tools/door_rank_exp.py --model_dir /tmp/asbuilt_v5 \
      [--powers 1,2,3] [--radii 0,0.3,0.5]
"""
from __future__ import annotations

import argparse
import dataclasses
import pathlib
import sys

import numpy as np

REPO = pathlib.Path(__file__).parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")   # never touch the TPU relay


def center_suppress(det: dict, radius: float) -> dict:
    """Greedy same-class BEV center-distance suppression (score order)."""
    boxes = np.asarray(det["box3d_lidar"])
    scores = np.asarray(det["scores"])
    labels = np.asarray(det["label_preds"])
    order = np.argsort(-scores)
    keep = []
    for i in order:
        ok = True
        for j in keep:
            if labels[j] == labels[i] and np.hypot(
                    boxes[i, 0] - boxes[j, 0],
                    boxes[i, 1] - boxes[j, 1]) < radius:
                ok = False
                break
        if ok:
            keep.append(i)
    keep = np.sort(np.asarray(keep, np.int64))
    return {"box3d_lidar": boxes[keep], "scores": scores[keep],
            "label_preds": labels[keep]}


def collect(bundle, state, loader, predict_fn):
    from automatic_as_built_reconstruction_tpu.data import batching
    from automatic_as_built_reconstruction_tpu.train.train import _to_device
    dets = []
    for batch in loader:
        example = _to_device(batching.device_example(batch), None)
        out = jax.device_get(
            predict_fn(state["params"], state["batch_stats"], example))
        for b in range(out["box3d_lidar"].shape[0]):
            valid = out["valid"][b]
            dets.append({"box3d_lidar": out["box3d_lidar"][b][valid],
                         "scores": out["scores"][b][valid],
                         "label_preds": out["label_preds"][b][valid]})
    return dets


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_dir", required=True)
    ap.add_argument("--powers", default="1,2,3")
    ap.add_argument("--radii", default="0,0.3,0.5")
    args = ap.parse_args()

    from automatic_as_built_reconstruction_tpu.train import checkpoint as ck
    from automatic_as_built_reconstruction_tpu.train.train import (
        Bundle, init_state, make_predict_fn)

    model_dir = pathlib.Path(args.model_dir)
    bundle = Bundle(str(model_dir / "pipeline.config"))
    prep_ds, loader_fn = bundle.input_reader(training=False)
    state, _ = init_state(bundle)
    state, step = ck.try_restore_latest(str(model_dir), state)
    assert state is not None
    print(f"checkpoint step {step}")

    powers = [float(p) for p in args.powers.split(",")]
    radii = [float(r) for r in args.radii.split(",")]
    for power in powers:
        bundle.model_cfg = dataclasses.replace(
            bundle.model_cfg, yaw_quality_predict_power=power)
        predict_fn = make_predict_fn(bundle, mesh=None)
        _, loader = bundle.input_reader(training=False)
        dets = collect(bundle, state, loader, predict_fn)
        for radius in radii:
            d = ([center_suppress(x, radius) for x in dets]
                 if radius > 0 else dets)
            r = prep_ds.dataset.evaluation(d)
            keys = [k for k in sorted(r) if k.endswith(".ap")] + \
                   ["mAP.bev", "mAP.3d"]
            line = " ".join(f"{k}={r[k]:.4f}" for k in keys)
            print(f"power={power} radius={radius}: {line}", flush=True)


if __name__ == "__main__":
    main()
