"""Offline point-evidence yaw-refinement sweep on a trained as-built
checkpoint.

Extends tools/door_rank_exp.py: after score ranking + center-distance
suppression, snap thin-class boxes' yaw (and optionally centre) to the
orientation that captures the most scene points
(core.point_refine.refine_yaw_by_points).  Wrong-yaw door duplicates
survive ranking with near-zero IoU against GT; point evidence fixes the
kept box itself, which ranking never can.  Runs entirely on CPU — no
TPU client, no retraining.  Detections are collected once per model_dir
and cached to a pickle so parameter sweeps are instant.

Usage:
  python tools/door_yaw_exp.py --model_dir /tmp/asbuilt_v5 \
      [--dets_cache /tmp/v5_dets.pkl] [--radius 0.3]
"""
from __future__ import annotations

import argparse
import pathlib
import pickle
import sys

import numpy as np

REPO = pathlib.Path(__file__).parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")   # never touch the TPU relay

from tools.door_rank_exp import center_suppress, collect  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_dir", required=True)
    ap.add_argument("--dets_cache", default="")
    ap.add_argument("--radius", type=float, default=0.3)
    args = ap.parse_args()

    from automatic_as_built_reconstruction_tpu.core import point_refine
    from automatic_as_built_reconstruction_tpu.train import checkpoint as ck
    from automatic_as_built_reconstruction_tpu.train.train import (
        Bundle, init_state, make_predict_fn)

    model_dir = pathlib.Path(args.model_dir)
    bundle = Bundle(str(model_dir / "pipeline.config"))
    prep_ds, _ = bundle.input_reader(training=False)
    dataset = prep_ds.dataset

    cache = pathlib.Path(args.dets_cache) if args.dets_cache else None
    if cache is not None and cache.exists():
        with open(cache, "rb") as f:
            dets, step = pickle.load(f)
        print(f"loaded {len(dets)} cached detections (step {step})")
    else:
        state, _ = init_state(bundle)
        state, step = ck.try_restore_latest(str(model_dir), state)
        assert state is not None
        print(f"checkpoint step {step}")
        predict_fn = make_predict_fn(bundle, mesh=None)
        _, loader = bundle.input_reader(training=False)
        dets = collect(bundle, state, loader, predict_fn)
        if cache is not None:
            with open(cache, "wb") as f:
                pickle.dump((dets, step), f)

    scene_points = [
        np.asarray(dataset.get_sensor_data(i)["lidar"]["points"])
        for i in range(min(len(dets), len(dataset)))]

    def run(tag, det_list):
        r = dataset.evaluation(det_list[:len(scene_points)])
        keys = [k for k in sorted(r) if k.endswith(".ap")] + \
               ["mAP.bev", "mAP.3d"]
        print(f"{tag}: " + " ".join(f"{k}={r[k]:.4f}" for k in keys),
              flush=True)

    sup = [center_suppress(d, args.radius) for d in dets]
    run("baseline(suppress only)", sup)

    for classes, cname in (((2,), "door"), ((0, 2), "wall+door")):
        for recenter in (False, True):
            ref = [point_refine.refine_detections(
                       d, p, classes=classes, recenter=recenter)
                   for d, p in zip(sup, scene_points)]
            run(f"refine[{cname},recenter={recenter}]", ref)

    # refinement before suppression: duplicates collapse onto the same
    # pose, so the survivor is right-yaw regardless of which one wins
    ref_first = [center_suppress(point_refine.refine_detections(
                     d, p, classes=(0, 2), recenter=True), args.radius)
                 for d, p in zip(dets, scene_points)]
    run("refine[wall+door,recenter]->suppress", ref_first)


if __name__ == "__main__":
    main()
